"""VectorizedNUTS: fully-compiled multinomial No-U-Turn sampler.

The host-recursive NUTS in ``hmc.py`` keeps reference-style semantics but
cannot vmap over chains.  This implementation builds the trajectory tree
ITERATIVELY (two nested ``lax.while_loop``s: progressive doublings outside,
leaf-at-a-time subtree growth inside) so the compiled program contains
exactly ONE leapfrog step regardless of ``max_depth`` — no 2^depth trace
unroll, no compile-time cliff at deep trees.  Within-subtree U-turn checks
use the O(log n)-memory momentum-checkpoint scheme (store a checkpoint at
every even leaf, check each completed power-of-two subtree at every odd
leaf).  The whole sampler — dual-averaging warmup included — is one
``lax.scan`` program that ``vmap``s over thousands of chains.

Algorithm: multinomial NUTS (Betancourt 2017) with progressive biased
proposal sampling, the generalized momentum-sum no-U-turn criterion,
divergence cap 1000, and Hoffman-Gelman dual averaging on the mean leaf
acceptance statistic.  (The reference ships only HMC scaffolding,
``/root/reference/pgmpy/sampling/base.py:162-616`` — no NUTS to match.)
"""

import numpy as np

import jax
import jax.numpy as jnp

from pgmpy_tpu.sampling.hmc import _resolve_log_pdf

_DELTA_MAX = 1000.0


def _is_turning(r_first, r_last, rho):
    """Generalized no-U-turn criterion on the momentum sum ``rho``."""
    return (jnp.dot(rho, r_first) <= 0) | (jnp.dot(rho, r_last) <= 0)


def _popcount(n):
    return jax.lax.population_count(n.astype(jnp.uint32)).astype(jnp.int32)


def _vary(tree, axis_name):
    """Mark while_loop init carries as device-varying under shard_map.

    Loop bodies mix the carry with per-device data, so constant inits must
    be pcast to the varying type; leaves that are already varying pass
    through untouched."""
    if axis_name is None:
        return tree

    def mark(x):
        try:
            if axis_name in jax.typeof(x).vma:
                return x
        except (AttributeError, TypeError):
            pass
        return jax.lax.pcast(x, axis_name, to="varying")

    return jax.tree_util.tree_map(mark, tree)


def _ckpt_range(n):
    """Checkpoint indices whose subtrees END at odd leaf ``n``.

    A checkpoint is stored at every even leaf (index ``popcount(n >> 1)``);
    leaf ``n`` with ``t`` trailing one-bits closes ``t`` nested power-of-two
    subtrees, checked against checkpoints ``idx_max - t + 1 .. idx_max``.
    """
    idx_max = _popcount(n >> 1)
    trailing_ones = _popcount(n ^ (n + 1)) - 1
    return idx_max - trailing_ones + 1, idx_max


class VectorizedNUTS:
    def __init__(self, model, max_depth=6, delta=0.8):
        self.log_pdf, self.variables = _resolve_log_pdf(model)
        self._grad = jax.grad(self.log_pdf)
        self.max_depth = int(max_depth)
        self.delta = float(delta)

    # ------------------------------------------------------------------ #
    def _leapfrog(self, z, r, g, eps):
        """One forward leapfrog step (momenta already time-oriented)."""
        r_half = r + 0.5 * eps * g
        z_new = z + eps * r_half
        g_new = self._grad(z_new)
        r_new = r_half + 0.5 * eps * g_new
        return z_new, r_new, g_new

    def _build_subtree(self, n_leaves, z, r, g, eps, energy0, key, axis_name=None):
        """Grow a subtree of up to ``n_leaves`` leapfrog steps from (z, r, g)
        (momenta in forward-time orientation; the caller flips signs for
        backward growth).  Early-exits on internal U-turn or divergence."""
        dim = z.shape[0]
        md = self.max_depth

        dt = z.dtype
        init = {
            "key": key,
            "n": jnp.asarray(0, dtype=jnp.int32),
            "z": z, "r": r, "g": g,
            "z_prop": z,
            "logw": jnp.asarray(-jnp.inf, dtype=dt),
            "rho": jnp.zeros(dim, dtype=dt),
            "r_first": r,
            "r_ckpts": jnp.zeros((md, dim), dtype=dt),
            "rho_ckpts": jnp.zeros((md, dim), dtype=dt),
            "turning": jnp.asarray(False),
            "diverging": jnp.asarray(False),
            "sum_accept": jnp.asarray(0.0, dtype=dt),
            "n_leaf": jnp.asarray(0.0, dtype=dt),
        }
        init = _vary(init, axis_name)

        def cond(s):
            return (s["n"] < n_leaves) & ~s["turning"] & ~s["diverging"]

        def body(s):
            key, key_take = jax.random.split(s["key"])
            n = s["n"]
            z_new, r_new, g_new = self._leapfrog(s["z"], s["r"], s["g"], eps)
            energy = self.log_pdf(z_new) - 0.5 * jnp.sum(r_new**2)
            delta_energy = energy - energy0
            diverging = delta_energy < -_DELTA_MAX
            logw_leaf = jnp.where(diverging, -jnp.inf, delta_energy)
            accept_stat = jnp.minimum(1.0, jnp.exp(delta_energy))

            # progressive multinomial proposal within the subtree
            logw_new = jnp.logaddexp(s["logw"], logw_leaf)
            p_leaf = jnp.where(
                jnp.isneginf(logw_new), 0.0, jnp.exp(logw_leaf - logw_new)
            )
            take = jax.random.uniform(key_take) < p_leaf
            z_prop = jnp.where(take, z_new, s["z_prop"])

            rho_new = s["rho"] + r_new
            r_first = jnp.where(n == 0, r_new, s["r_first"])

            idx_min, idx_max = _ckpt_range(n)
            is_even = (n % 2) == 0
            r_ckpts = jnp.where(
                is_even, s["r_ckpts"].at[idx_max].set(r_new), s["r_ckpts"]
            )
            rho_ckpts = jnp.where(
                is_even, s["rho_ckpts"].at[idx_max].set(rho_new), s["rho_ckpts"]
            )

            def check_turning(_):
                def t_cond(it):
                    i, turning = it
                    return (i >= idx_min) & ~turning
                def t_body(it):
                    i, _ = it
                    rho_sub = rho_new - rho_ckpts[i] + r_ckpts[i]
                    return i - 1, _is_turning(r_ckpts[i], r_new, rho_sub)
                _, turning = jax.lax.while_loop(
                    t_cond, t_body, (idx_max, _vary(jnp.asarray(False), axis_name))
                )
                return turning

            turning = jax.lax.cond(
                is_even,
                lambda _: _vary(jnp.asarray(False), axis_name),
                check_turning,
                None,
            )

            return {
                "key": key,
                "n": n + 1,
                "z": z_new, "r": r_new, "g": g_new,
                "z_prop": z_prop,
                "logw": logw_new,
                "rho": rho_new,
                "r_first": r_first,
                "r_ckpts": r_ckpts,
                "rho_ckpts": rho_ckpts,
                "turning": s["turning"] | turning,
                "diverging": s["diverging"] | diverging,
                "sum_accept": s["sum_accept"] + accept_stat,
                "n_leaf": s["n_leaf"] + 1.0,
            }

        return jax.lax.while_loop(cond, body, init)

    # ------------------------------------------------------------------ #
    def _nuts_step(self, key, z, eps, axis_name=None):
        dim = z.shape[0]
        key, key_r = jax.random.split(key)
        r0 = jax.random.normal(key_r, (dim,))
        g0 = self._grad(z)
        energy0 = self.log_pdf(z) - 0.5 * jnp.sum(r0**2)

        dt = z.dtype
        init = {
            "key": key,
            "depth": jnp.asarray(0, dtype=jnp.int32),
            "z_left": z, "r_left": r0, "g_left": g0,
            "z_right": z, "r_right": r0, "g_right": g0,
            "rho": r0,
            "z_prop": z,
            "logw": jnp.asarray(0.0, dtype=dt),
            "stopped": jnp.asarray(False),
            "sum_accept": jnp.asarray(0.0, dtype=dt),
            "n_leaf": jnp.asarray(0.0, dtype=dt),
        }
        init = _vary(init, axis_name)

        def cond(s):
            return (s["depth"] < self.max_depth) & ~s["stopped"]

        def body(s):
            key, key_dir, key_tree, key_bias = jax.random.split(s["key"], 4)
            go_right = jax.random.bernoulli(key_dir)
            d = jnp.where(go_right, 1.0, -1.0)

            z_e = jnp.where(go_right, s["z_right"], s["z_left"])
            r_e = jnp.where(go_right, s["r_right"], s["r_left"])
            g_e = jnp.where(go_right, s["g_right"], s["g_left"])

            # backward growth = forward integration with negated momentum
            sub = self._build_subtree(
                jnp.asarray(2, jnp.int32) ** s["depth"],
                z_e, d * r_e, g_e, eps, energy0, key_tree,
                axis_name=axis_name,
            )
            valid = ~sub["turning"] & ~sub["diverging"]

            # biased progressive coupling: take the new half's proposal
            # w.p. min(1, W_new / W_old)
            accept_p = jnp.exp(jnp.minimum(0.0, sub["logw"] - s["logw"]))
            take = valid & (jax.random.uniform(key_bias) < accept_p)
            z_prop = jnp.where(take, sub["z_prop"], s["z_prop"])
            logw = jnp.where(valid, jnp.logaddexp(s["logw"], sub["logw"]), s["logw"])

            # update the grown end (forward-time momentum = d * signed)
            upd = valid & go_right
            z_right = jnp.where(upd, sub["z"], s["z_right"])
            r_right = jnp.where(upd, d * sub["r"], s["r_right"])
            g_right = jnp.where(upd, sub["g"], s["g_right"])
            upd = valid & ~go_right
            z_left = jnp.where(upd, sub["z"], s["z_left"])
            r_left = jnp.where(upd, d * sub["r"], s["r_left"])
            g_left = jnp.where(upd, sub["g"], s["g_left"])

            rho = jnp.where(valid, s["rho"] + d * sub["rho"], s["rho"])
            whole_turn = _is_turning(r_left, r_right, rho)
            stopped = ~valid | whole_turn

            return {
                "key": key,
                "depth": s["depth"] + 1,
                "z_left": z_left, "r_left": r_left, "g_left": g_left,
                "z_right": z_right, "r_right": r_right, "g_right": g_right,
                "rho": rho,
                "z_prop": z_prop,
                "logw": logw,
                "stopped": stopped,
                "sum_accept": s["sum_accept"] + sub["sum_accept"],
                "n_leaf": s["n_leaf"] + sub["n_leaf"],
            }

        final = jax.lax.while_loop(cond, body, init)
        accept_stat = final["sum_accept"] / jnp.maximum(final["n_leaf"], 1.0)
        return final["z_prop"], accept_stat

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
                lambda k, q: self._nuts_step(k, q, eps, axis_name=axis_name)
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
