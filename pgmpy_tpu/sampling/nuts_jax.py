"""VectorizedNUTS: fully-compiled multinomial No-U-Turn sampler.

The host-recursive NUTS in ``hmc.py`` keeps reference-style semantics but
cannot vmap over chains.  This implementation unrolls the tree doubling
STATICALLY at trace time (every one of the 2^max_depth leapfrog steps is
traced; stopped subtrees are masked out), which makes the whole sampler —
dual-averaging warmup included — one ``lax.scan`` program that ``vmap``s
over thousands of chains.  Wasted leapfrog work relative to adaptive
recursion is bounded by 2^max_depth / E[tree size]; with 10k vmapped
chains the TPU throughput dwarfs it.

Algorithm: multinomial NUTS (Betancourt 2017) with progressive biased
proposal sampling, joint-tree U-turn checks, divergence cap 1000, and
Hoffman-Gelman dual averaging on the mean leaf acceptance statistic.
"""

import numpy as np

import jax
import jax.numpy as jnp

from pgmpy_tpu.sampling.hmc import _resolve_log_pdf

_DELTA_MAX = 1000.0


class VectorizedNUTS:
    def __init__(self, model, max_depth=6, delta=0.8):
        self.log_pdf, self.variables = _resolve_log_pdf(model)
        self._grad = jax.grad(self.log_pdf)
        self.max_depth = int(max_depth)
        self.delta = float(delta)

    # ------------------------------------------------------------------ #
    def _leaf(self, z, r, g, direction, eps, energy0):
        """One leapfrog step in ``direction``; returns a tree dict."""
        r_half = r + 0.5 * direction * eps * g
        z_new = z + direction * eps * r_half
        g_new = self._grad(z_new)
        r_new = r_half + 0.5 * direction * eps * g_new
        energy = self.log_pdf(z_new) - 0.5 * jnp.sum(r_new**2)
        delta_energy = energy - energy0
        diverging = delta_energy < -_DELTA_MAX
        logw = jnp.where(diverging, -jnp.inf, delta_energy)
        accept_stat = jnp.minimum(1.0, jnp.exp(delta_energy))
        return {
            "z_minus": z_new, "r_minus": r_new, "g_minus": g_new,
            "z_plus": z_new, "r_plus": r_new, "g_plus": g_new,
            "z_prop": z_new, "logw": logw,
            "turning": jnp.asarray(False), "diverging": diverging,
            "sum_accept": accept_stat, "n_leaf": jnp.asarray(1.0),
        }

    def _uturn(self, z_minus, r_minus, z_plus, r_plus):
        dz = z_plus - z_minus
        return (jnp.dot(dz, r_minus) < 0) | (jnp.dot(dz, r_plus) < 0)

    def _combine(self, first, second, direction, key):
        """Merge two same-direction subtrees (first grown before second)."""
        # proposal: multinomial between the two subtrees
        logw_total = jnp.logaddexp(first["logw"], second["logw"])
        p_second = jnp.exp(second["logw"] - logw_total)
        take_second = jax.random.uniform(key) < p_second
        z_prop = jnp.where(take_second, second["z_prop"], first["z_prop"])

        # spatial ends: with direction=+1 first holds the minus end;
        # with direction=-1 the roles flip
        def pick(a, b):
            return jax.tree_util.tree_map(
                lambda x, y: jnp.where(direction > 0, x, y), a, b
            )

        z_minus = pick(first["z_minus"], second["z_minus"])
        r_minus = pick(first["r_minus"], second["r_minus"])
        g_minus = pick(first["g_minus"], second["g_minus"])
        z_plus = pick(second["z_plus"], first["z_plus"])
        r_plus = pick(second["r_plus"], first["r_plus"])
        g_plus = pick(second["g_plus"], first["g_plus"])

        turning = (
            first["turning"]
            | second["turning"]
            | self._uturn(z_minus, r_minus, z_plus, r_plus)
        )
        return {
            "z_minus": z_minus, "r_minus": r_minus, "g_minus": g_minus,
            "z_plus": z_plus, "r_plus": r_plus, "g_plus": g_plus,
            "z_prop": z_prop, "logw": logw_total,
            "turning": turning,
            "diverging": first["diverging"] | second["diverging"],
            "sum_accept": first["sum_accept"] + second["sum_accept"],
            "n_leaf": first["n_leaf"] + second["n_leaf"],
        }

    def _build_tree(self, depth, z, r, g, direction, eps, energy0, key):
        """Static recursion: exactly 2^depth traced leapfrog steps."""
        if depth == 0:
            return self._leaf(z, r, g, direction, eps, energy0)
        key1, key2, key_mix = jax.random.split(key, 3)
        first = self._build_tree(depth - 1, z, r, g, direction, eps, energy0, key1)
        # grow from first's far end (direction-dependent)
        z2 = jnp.where(direction > 0, first["z_plus"], first["z_minus"])
        r2 = jnp.where(direction > 0, first["r_plus"], first["r_minus"])
        g2 = jnp.where(direction > 0, first["g_plus"], first["g_minus"])
        second = self._build_tree(depth - 1, z2, r2, g2, direction, eps, energy0, key2)
        return self._combine(first, second, direction, key_mix)

    # ------------------------------------------------------------------ #
    def _nuts_step(self, key, z, eps):
        dim = z.shape[0]
        key_r, key_dirs, key_trees, key_bias = jax.random.split(key, 4)
        r0 = jax.random.normal(key_r, (dim,))
        g0 = self._grad(z)
        energy0 = self.log_pdf(z) - 0.5 * jnp.sum(r0**2)

        state = {
            "z_minus": z, "r_minus": r0, "g_minus": g0,
            "z_plus": z, "r_plus": r0, "g_plus": g0,
            "z_prop": z, "logw": jnp.asarray(0.0),
            "stopped": jnp.asarray(False),
            "sum_accept": jnp.asarray(0.0), "n_leaf": jnp.asarray(0.0),
        }
        dirs = jax.random.rademacher(key_dirs, (self.max_depth,)) if hasattr(
            jax.random, "rademacher"
        ) else jnp.where(
            jax.random.bernoulli(key_dirs, 0.5, (self.max_depth,)), 1, -1
        )
        tree_keys = jax.random.split(key_trees, self.max_depth)
        bias_keys = jax.random.split(key_bias, self.max_depth)

        for j in range(self.max_depth):
            direction = dirs[j].astype(z.dtype)
            z_from = jnp.where(direction > 0, state["z_plus"], state["z_minus"])
            r_from = jnp.where(direction > 0, state["r_plus"], state["r_minus"])
            g_from = jnp.where(direction > 0, state["g_plus"], state["g_minus"])
            subtree = self._build_tree(
                j, z_from, r_from, g_from, direction, eps, energy0, tree_keys[j]
            )
            valid = (~state["stopped"]) & (~subtree["turning"]) & (~subtree["diverging"])
            # biased progressive sampling: accept the new subtree's proposal
            # w.p. min(1, W_new / W_old)
            accept_p = jnp.exp(jnp.minimum(0.0, subtree["logw"] - state["logw"]))
            take = valid & (jax.random.uniform(bias_keys[j]) < accept_p)
            state["z_prop"] = jnp.where(take, subtree["z_prop"], state["z_prop"])
            state["logw"] = jnp.where(
                valid, jnp.logaddexp(state["logw"], subtree["logw"]), state["logw"]
            )

            # extend the grown end only
            for end in ["z", "r", "g"]:
                plus_new = jnp.where(valid & (direction > 0), subtree[f"{end}_plus"], state[f"{end}_plus"])
                minus_new = jnp.where(valid & (direction < 0), subtree[f"{end}_minus"], state[f"{end}_minus"])
                state[f"{end}_plus"] = plus_new
                state[f"{end}_minus"] = minus_new

            state["sum_accept"] = state["sum_accept"] + jnp.where(
                state["stopped"], 0.0, subtree["sum_accept"]
            )
            state["n_leaf"] = state["n_leaf"] + jnp.where(
                state["stopped"], 0.0, subtree["n_leaf"]
            )
            whole_turn = self._uturn(
                state["z_minus"], state["r_minus"], state["z_plus"], state["r_plus"]
            )
            state["stopped"] = (
                state["stopped"] | subtree["turning"] | subtree["diverging"] | whole_turn
            )
        accept_stat = state["sum_accept"] / jnp.maximum(state["n_leaf"], 1.0)
        return state["z_prop"], accept_stat

    # ------------------------------------------------------------------ #
    def sample(
        self,
        initial_pos,
        num_samples,
        num_adapt=0,
        stepsize=0.1,
        n_chains=1,
        seed=0,
        return_type="array",
        axis_name=None,
    ):
        """Run ``n_chains`` NUTS chains fully compiled.

        Warmup (``num_adapt`` steps of dual averaging on the pooled mean
        acceptance) and sampling run inside one scan.  Returns
        (num_samples, n_chains, dim) array (or a chain-0 DataFrame).
        """
        initial_pos = np.asarray(initial_pos, dtype=np.float64)
        if initial_pos.ndim == 1:
            init = jnp.tile(jnp.asarray(initial_pos), (n_chains, 1))
        else:
            init = jnp.asarray(initial_pos)

        mu = jnp.log(10.0 * stepsize)
        gamma, t0, kappa = 0.05, 10.0, 0.75
        delta = self.delta
        num_adapt = int(num_adapt)

        def one_step(carry, inputs):
            positions, log_eps, log_eps_bar, h_bar = carry
            key_t, m = inputs
            eps = jnp.exp(log_eps)
            chain_keys = jax.random.split(key_t, positions.shape[0])
            positions, accept_stats = jax.vmap(
                lambda k, q: self._nuts_step(k, q, eps)
            )(chain_keys, positions)
            mean_accept = jnp.mean(accept_stats)
            if axis_name is not None:
                # under shard_map: adapt on the GLOBAL mean acceptance so
                # every device converges to the same stepsize
                mean_accept = jax.lax.pmean(mean_accept, axis_name)

            adapting = m < num_adapt
            m_adapt = jnp.minimum(m, num_adapt - 1).astype(jnp.float32) + 1.0
            h_bar_new = (1 - 1 / (m_adapt + t0)) * h_bar + (delta - mean_accept) / (
                m_adapt + t0
            )
            log_eps_new = mu - jnp.sqrt(m_adapt) / gamma * h_bar_new
            eta = m_adapt**-kappa
            log_eps_bar_new = eta * log_eps_new + (1 - eta) * log_eps_bar

            log_eps = jnp.where(adapting, log_eps_new, log_eps_bar)
            log_eps_bar = jnp.where(adapting, log_eps_bar_new, log_eps_bar)
            h_bar = jnp.where(adapting, h_bar_new, h_bar)
            return (positions, log_eps, log_eps_bar, h_bar), (positions, mean_accept)

        total = num_adapt + int(num_samples)
        key = jax.random.PRNGKey(seed)
        keys = jax.random.split(key, total)
        ms = jnp.arange(total)
        carry = (init, jnp.log(stepsize), jnp.log(stepsize), jnp.asarray(0.0))
        (final, log_eps, _, _), (trajectory, accepts) = jax.lax.scan(
            one_step, carry, (keys, ms)
        )
        self.acceptance_rate = float(jnp.mean(accepts[num_adapt:]))
        self.final_stepsize = float(jnp.exp(log_eps))
        samples = trajectory[num_adapt:]
        if return_type == "dataframe":
            import pandas as pd

            cols = self.variables or [f"x{i}" for i in range(samples.shape[-1])]
            return pd.DataFrame(np.asarray(samples[:, 0, :]), columns=cols)
        return np.asarray(samples)
