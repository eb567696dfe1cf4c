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

    def simulate(self, n_samples=100, do=None, virtual_intervention=None, seed=None):
        """Topological ancestral sampling through the functional CPDs.

        ``do`` pins variables to constants (incoming edges severed by
        construction of the topological sweep); ``virtual_intervention`` is a
        list of unconditional FunctionalCPDs replacing nodes' mechanisms.
        Reference contract ``FunctionalBayesianNetwork.py:204-322``.
        """
        do = do or {}
        virtual_intervention = virtual_intervention or []
        extra_do = set(do) - set(self.nodes())
        if extra_do:
            raise ValueError(
                f"`do` contains nodes not in the model: {sorted(map(str, extra_do))}"
            )
        vi_map = {}
        for cpd in virtual_intervention:
            if not isinstance(cpd, FunctionalCPD):
                raise ValueError(
                    "`virtual_intervention` must be a list of FunctionalCPD "
                    f"objects. Got {type(cpd)}"
                )
            if cpd.variable not in self.nodes():
                raise ValueError(
                    f"Virtual intervention CPD variable not in the model: {cpd.variable}"
                )
            if cpd.parents:
                raise ValueError(
                    f"Virtual intervention CPD for {cpd.variable} must be "
                    "unconditional (no parents)."
                )
            vi_map[cpd.variable] = cpd
        overlap = set(do) & set(vi_map)
        if overlap:
            raise ValueError(
                "Cannot specify both `do` and `virtual_intervention` for the "
                f"same node(s): {sorted(map(str, overlap))}"
            )

        self.check_model()
        rng = np.random.default_rng(seed)
        samples = pd.DataFrame()
        for node in nx.topological_sort(self):
            if node in do:
                samples[node] = np.full(int(n_samples), do[node])
                continue
            if node in vi_map:
                samples[node] = vi_map[node].sample(
                    n_samples, seed=int(rng.integers(2**31))
                )
                continue
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

    def fit(
        self,
        data,
        estimator="SVI",
        optimizer=None,
        prior_fn=None,
        num_steps=1000,
        seed=None,
        nuts_kwargs=None,
        mcmc_kwargs=None,
        init_params=None,
        lr=0.05,
        max_iter=None,
        exit_delta=1e-6,
    ):
        """Fit the model's FunctionalCPDs to data.

        Reference contract (``FunctionalBayesianNetwork.py:323-528``):

        - ``estimator="SVI"``: the CPD functions declare learnable sites via
          :func:`pgmpy_tpu.factors.hybrid.param` (pyro.param shape, with
          positivity constraints honored through a softplus
          parametrization); the empty-guide ELBO reduces to the negative
          log-likelihood, optimized with optax for ``num_steps`` steps.
          Returns {param_name: fitted value} and leaves the fitted values in
          the global param store so subsequent ``simulate()`` uses them.
        - ``estimator="MCMC"``: CPD functions take ``(priors, parents)``;
          ``prior_fn()`` returns {param_name: Distribution}; NUTS draws
          ``num_steps`` posterior samples (reparametrized per the priors'
          ``support`` tags).  Returns {param_name: sample array}.
        - legacy shape: ``fit(data, make_cpds, init_params=...)`` with a
          callable second argument does point-MLE over a user pytree.
        """
        if callable(estimator):
            return self._fit_make_cpds(
                data, estimator, init_params, lr, max_iter or 2000, exit_delta
            )
        if not isinstance(data, pd.DataFrame):
            raise ValueError(
                f"data should be a pandas.DataFrame object. Got: {type(data)}."
            )
        if not isinstance(num_steps, int):
            raise ValueError(
                f"num_steps should be an integer. Got: {type(num_steps)}."
            )
        if estimator.lower() not in ("svi", "mcmc"):
            raise ValueError(
                "`estimator` argument needs to be either 'SVI' or 'MCMC'. "
                f"Got: {estimator}."
            )
        missing = [n for n in self.nodes() if n not in data.columns]
        if missing:
            raise ValueError(
                f"data doesn't contain column for the node: {missing[0]}."
            )
        self.check_model()
        arrays = {
            node: jnp.asarray(data[node].to_numpy(dtype=np.float64))
            for node in self.nodes()
        }
        sort_nodes = list(nx.topological_sort(self))
        if estimator.lower() == "svi":
            return self._fit_svi(arrays, sort_nodes, optimizer, num_steps, seed)
        return self._fit_mcmc_reference(
            arrays, sort_nodes, prior_fn, num_steps, seed,
            nuts_kwargs or {}, mcmc_kwargs or {},
        )

    @staticmethod
    def _is_positive_constraint(constraint):
        return constraint is not None and "positive" in str(constraint).lower()

    def _fit_svi(self, arrays, sort_nodes, optimizer, num_steps, seed):
        import optax

        from pgmpy_tpu.factors import hybrid

        st = hybrid._PARAM_STORE
        cpds = {node: self.get_cpds(node) for node in sort_nodes}

        # pass 1: trace each CPD once to collect param names/inits/constraints
        st.mode, st.inits, st.constraints = "collect", {}, {}
        try:
            for node in sort_nodes:
                cpds[node].fn({p: arrays[p] for p in cpds[node].parents})
        finally:
            st.mode = None
        names = list(st.inits)
        if not names:
            raise ValueError(
                "No learnable parameters found: CPD functions must declare "
                "them with pgmpy_tpu.factors.hybrid.param(name, init, ...)"
            )
        positive = {n: self._is_positive_constraint(st.constraints[n]) for n in names}

        def constrain(u):
            return {
                n: jax.nn.softplus(u[n]) if positive[n] else u[n] for n in names
            }

        def unconstrain_init(n, v):
            if positive[n]:
                v = jnp.maximum(v, 1e-6)
                return jnp.log(jnp.expm1(v))  # softplus inverse
            return v

        u0 = {n: unconstrain_init(n, st.inits[n]) for n in names}

        def nll(u):
            st.mode, st.values = "apply", constrain(u)
            try:
                total = 0.0
                for node in sort_nodes:
                    dist = cpds[node].fn(
                        {p: arrays[p] for p in cpds[node].parents}
                    )
                    total = total - jnp.sum(dist.log_prob(arrays[node]))
            finally:
                st.mode, st.values = None, {}
            return total

        if optimizer is None:
            tx = optax.adam(1e-2)
        elif isinstance(optimizer, dict):
            tx = optax.adam(optimizer.get("lr", 1e-2))
        else:
            tx = optimizer  # any optax GradientTransformation

        @jax.jit
        def step(u, opt_state):
            loss, grads = jax.value_and_grad(nll)(u)
            updates, opt_state = tx.update(grads, opt_state, u)
            return optax.apply_updates(u, updates), opt_state, loss

        u, opt_state = u0, tx.init(u0)
        for i in range(int(num_steps)):
            u, opt_state, loss = step(u, opt_state)
            if i % 50 == 0:
                from pgmpy_tpu.config import logger

                logger.info(f"Step {i} | Loss: {float(loss):.4f}")
        fitted = {n: jnp.asarray(v) for n, v in constrain(u).items()}
        st.values = dict(fitted)  # simulate() after fit uses these
        return fitted

    def _fit_mcmc_reference(
        self, arrays, sort_nodes, prior_fn, num_steps, seed, nuts_kwargs, mcmc_kwargs
    ):
        from pgmpy_tpu.sampling.hmc import NoUTurnSamplerDA

        if prior_fn is None:
            raise ValueError("estimator='MCMC' requires prior_fn")
        priors = prior_fn()
        names = list(priors)
        cpds = {node: self.get_cpds(node) for node in sort_nodes}

        # shapes from one prior draw; reparametrize by support tag
        key = jax.random.PRNGKey(0 if seed is None else seed)
        shapes, sizes, supports = {}, {}, {}
        for n in names:
            draw = np.asarray(priors[n].sample(key))
            shapes[n] = draw.shape
            sizes[n] = int(np.prod(draw.shape)) if draw.shape else 1
            supports[n] = getattr(priors[n], "support", "real")

        def unpack(flat):
            out, i = {}, 0
            for n in names:
                seg = flat[i : i + sizes[n]].reshape(shapes[n])
                if sizes[n] == 1 and shapes[n] == ():
                    seg = seg.reshape(())
                out[n] = seg
                i += sizes[n]
            return out

        def constrain_with_logdet(u):
            vals, logdet = {}, 0.0
            for n in names:
                sup = supports[n]
                if sup == "positive":
                    vals[n] = jnp.exp(u[n])
                    logdet = logdet + jnp.sum(u[n])
                elif isinstance(sup, tuple) and sup[0] == "interval":
                    low, high = sup[1], sup[2]
                    s = jax.nn.sigmoid(u[n])
                    vals[n] = low + (high - low) * s
                    logdet = logdet + jnp.sum(
                        jnp.log(high - low) + jnp.log(s) + jnp.log1p(-s)
                    )
                else:
                    vals[n] = u[n]
            return vals, logdet

        def log_post(flat):
            u = unpack(flat)
            vals, logdet = constrain_with_logdet(u)
            total = logdet
            for n in names:
                total = total + jnp.sum(priors[n].log_prob(vals[n]))
            for node in sort_nodes:
                dist = cpds[node].fn(
                    vals, {p: arrays[p] for p in cpds[node].parents}
                )
                total = total + jnp.sum(dist.log_prob(arrays[node]))
            return total

        # unconstrained init at the transform of the prior draws' location
        flat0 = []
        k = key
        for n in names:
            k, sub = jax.random.split(k)
            draw = jnp.asarray(priors[n].sample(sub)).reshape(-1)
            sup = supports[n]
            if sup == "positive":
                draw = jnp.log(jnp.maximum(draw, 1e-6))
            elif isinstance(sup, tuple) and sup[0] == "interval":
                low, high = sup[1], sup[2]
                p = jnp.clip((draw - low) / (high - low), 1e-4, 1 - 1e-4)
                draw = jnp.log(p) - jnp.log1p(-p)
            flat0.append(draw)
        flat0 = np.asarray(jnp.concatenate(flat0))

        num_adapt = int(mcmc_kwargs.get("warmup_steps", max(200, num_steps // 2)))
        nuts = NoUTurnSamplerDA(log_post)
        samples = nuts.sample(
            flat0, num_adapt=num_adapt, num_samples=int(num_steps),
            seed=0 if seed is None else seed, return_type="array",
        )
        samples = np.asarray(samples)
        out, i = {}, 0
        for n in names:
            seg = samples[:, i : i + sizes[n]]
            u = jnp.asarray(seg)
            sup = supports[n]
            if sup == "positive":
                seg = np.asarray(jnp.exp(u))
            elif isinstance(sup, tuple) and sup[0] == "interval":
                low, high = sup[1], sup[2]
                seg = np.asarray(low + (high - low) * jax.nn.sigmoid(u))
            if shapes[n] == ():
                seg = seg.reshape(-1)
            else:
                seg = seg.reshape((samples.shape[0],) + shapes[n])
            out[n] = seg
            i += sizes[n]
        return out

    def _fit_make_cpds(self, data, make_cpds, init_params, lr, max_iter, exit_delta):
        """Legacy point-MLE over a user-supplied parameter pytree."""
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
            return total / next(iter(arrays.values())).shape[0]

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
