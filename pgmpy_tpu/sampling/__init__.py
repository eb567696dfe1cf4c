from pgmpy_tpu.sampling.core import CompiledAncestralSampler
from pgmpy_tpu.sampling.forward import BayesianModelSampling
from pgmpy_tpu.sampling.gibbs import GibbsSampling

__all__ = [
    "CompiledAncestralSampler",
    "BayesianModelSampling",
    "GibbsSampling",
]


def __getattr__(name):
    if name in ("HamiltonianMC", "HamiltonianMCDA", "NoUTurnSampler", "NoUTurnSamplerDA"):
        from pgmpy_tpu.sampling import hmc

        return getattr(hmc, name)
    if name in ("LeapFrog", "ModifiedEuler", "BaseGradLogPDF", "GradLogPDFGaussian", "BaseSimulateHamiltonianDynamics"):
        from pgmpy_tpu.sampling import hmc

        return getattr(hmc, name)
    raise AttributeError(name)
