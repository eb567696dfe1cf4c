"""FunctionalBayesianNetwork: BN whose CPDs are arbitrary distribution
functions.

Parity target: ``/root/reference/pgmpy/models/FunctionalBayesianNetwork.py``
(pyro SVI/NUTS there).  TPU-native redesign: CPD functions return
jax-native distributions; ``simulate`` is topological ancestral sampling;
``fit`` does maximum-likelihood over a user-supplied parameter pytree with
optax (the CPD factory receives the params), and ``fit_mcmc`` runs NUTS
over the parameter posterior with jax.grad.
"""

import networkx as nx
import numpy as np
import pandas as pd

import jax
import jax.numpy as jnp

from pgmpy_tpu.factors.hybrid import FunctionalCPD
from pgmpy_tpu.models.discrete_bn import DiscreteBayesianNetwork


class FunctionalBayesianNetwork(DiscreteBayesianNetwork):
    # Inherits the DiscreteBayesianNetwork surface (predict, to_junction_tree,
    # save/load, ...) exactly as the reference does
    # (FunctionalBayesianNetwork.py:17); methods that require tabular CPDs
    # fail on functional CPDs there too.
    def __init__(self, ebunch=None, latents=[], lavaan_str=None, dagitty_str=None):
        super().__init__(ebunch, latents, lavaan_str, dagitty_str)

    def add_cpds(self, *cpds):
        self._bump_version()
        for cpd in cpds:
            if not isinstance(cpd, FunctionalCPD):
                raise ValueError(f"Only FunctionalCPD can be added. Got: {type(cpd)}")
            if cpd.variable not in self.nodes():
                raise ValueError(f"CPD defined on variable not in the model: {cpd.variable}")
            for prev in list(self.cpds):
                if prev.variable == cpd.variable:
                    self.cpds.remove(prev)
            self.cpds.append(cpd)

    def get_cpds(self, node=None):
        if node is not None:
            for cpd in self.cpds:
                if cpd.variable == node:
                    return cpd
            return None
        return self.cpds

    def remove_cpds(self, *cpds):
        self._bump_version()
        for cpd in cpds:
            if isinstance(cpd, (str, int)):
                cpd = self.get_cpds(cpd)
            self.cpds.remove(cpd)

    def check_model(self):
        for node in self.nodes():
            cpd = self.get_cpds(node)
            if cpd is None:
                raise ValueError(f"No CPD associated with {node}")
            if set(cpd.parents) != set(self.get_parents(node)):
                raise ValueError(
                    f"CPD associated with {node} doesn't have proper parents associated with it."
                )
        return True

    def simulate(self, n_samples=100, seed=None):
        """Topological ancestral sampling through the functional CPDs."""
        self.check_model()
        rng = np.random.default_rng(seed)
        samples = pd.DataFrame()
        for node in nx.topological_sort(self):
            cpd = self.get_cpds(node)
            if cpd.parents:
                samples[node] = cpd.sample(
                    n_samples,
                    parent_sample=samples.loc[:, cpd.parents],
                    seed=int(rng.integers(2**31)),
                )
            else:
                samples[node] = cpd.sample(n_samples, seed=int(rng.integers(2**31)))
        return samples

    def log_likelihood(self, data):
        self.check_model()
        total = 0.0
        for node in self.nodes():
            cpd = self.get_cpds(node)
            parent_values = {p: data[p].to_numpy() for p in cpd.parents}
            total += float(
                np.sum(cpd.log_prob(data[node].to_numpy(), parent_values))
            )
        return total

    def fit(self, data, make_cpds, init_params, lr=0.05, max_iter=2000, exit_delta=1e-6):
        """Maximum-likelihood fit of a parameterized model.

        make_cpds(params) -> {node: fn(parents_dict) -> Distribution} where
        fn uses entries of the ``params`` pytree; after optimization the
        fitted CPDs are installed on the model.  Returns the params.
        """
        from pgmpy_tpu.utils.optimizer import optimize

        arrays = {
            node: jnp.asarray(data[node].to_numpy(dtype=np.float64))
            for node in self.nodes()
        }
        parents = {node: self.get_parents(node) for node in self.nodes()}

        def loss_fn(params, _):
            fns = make_cpds(params)
            total = 0.0
            for node in self.nodes():
                parent_vals = {p: arrays[p] for p in parents[node]}
                dist = fns[node](parent_vals)
                total = total - jnp.sum(dist.log_prob(arrays[node]))
            return total / data.shape[0]

        params = optimize(
            loss_fn, params=init_params, loss_args={}, lr=lr,
            max_iter=max_iter, exit_delta=exit_delta,
        )
        fns = make_cpds(params)
        self.add_cpds(
            *[
                FunctionalCPD(node, (lambda f: (lambda pv: f({k: jnp.asarray(v) for k, v in pv.items()})))(fns[node]), parents[node])
                for node in self.nodes()
            ]
        )
        return params

    def fit_mcmc(self, data, make_cpds, init_params, log_prior=None, num_samples=500, num_adapt=200, seed=0):
        """NUTS posterior over the parameter vector (flattened pytree)."""
        from pgmpy_tpu.sampling.hmc import NoUTurnSamplerDA

        arrays = {
            node: jnp.asarray(data[node].to_numpy(dtype=np.float64))
            for node in self.nodes()
        }
        parents = {node: self.get_parents(node) for node in self.nodes()}
        flat0, unravel = jax.flatten_util.ravel_pytree(init_params)

        def log_pdf(flat):
            params = unravel(flat)
            fns = make_cpds(params)
            total = 0.0
            for node in self.nodes():
                parent_vals = {p: arrays[p] for p in parents[node]}
                dist = fns[node](parent_vals)
                total = total + jnp.sum(dist.log_prob(arrays[node]))
            if log_prior is not None:
                total = total + log_prior(params)
            return total

        nuts = NoUTurnSamplerDA(log_pdf)
        samples = nuts.sample(
            np.asarray(flat0), num_adapt=num_adapt, num_samples=num_samples,
            seed=seed, return_type="array",
        )
        return samples, unravel

    def copy(self):
        model = FunctionalBayesianNetwork()
        model.add_nodes_from(self.nodes())
        model.add_edges_from(self.edges())
        for cpd in self.cpds:
            model.add_cpds(FunctionalCPD(cpd.variable, cpd.fn, cpd.parents))
        model.latents = set(self.latents)
        return model
