from pgmpy_tpu.sampling.core import CompiledAncestralSampler
from pgmpy_tpu.sampling.forward import BayesianModelSampling
from pgmpy_tpu.sampling.gibbs import GibbsSampling
from pgmpy_tpu.sampling.checkpoint import save_sampler_state, load_sampler_state

# API-parity alias: the reference's BayesianModelInference base (CPT gather
# tables) corresponds to the compiled ancestral sampler here
BayesianModelInference = CompiledAncestralSampler

__all__ = [
    "CompiledAncestralSampler",
    "BayesianModelInference",
    "BayesianModelSampling",
    "GibbsSampling",
    "save_sampler_state",
    "load_sampler_state",
]


def __getattr__(name):
    if name == "VectorizedNUTS":
        from pgmpy_tpu.sampling.nuts_jax import VectorizedNUTS

        return VectorizedNUTS
    if name in ("HamiltonianMC", "HamiltonianMCDA", "NoUTurnSampler", "NoUTurnSamplerDA"):
        from pgmpy_tpu.sampling import hmc

        return getattr(hmc, name)
    if name in ("LeapFrog", "ModifiedEuler", "BaseGradLogPDF", "GradLogPDFGaussian", "BaseSimulateHamiltonianDynamics"):
        from pgmpy_tpu.sampling import hmc

        return getattr(hmc, name)
    raise AttributeError(name)
