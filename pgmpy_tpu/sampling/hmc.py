"""Hamiltonian Monte Carlo and NUTS kernels.

The reference ships only integrator scaffolding with no public sampler
(``/root/reference/pgmpy/sampling/base.py:162-616``).  Here the samplers are
first-class:

* ``HamiltonianMC`` / ``HamiltonianMCDA``: leapfrog trajectories fully
  compiled — ``lax.scan`` over samples, ``vmap`` over chains, gradients via
  ``jax.grad`` of the model log-density; dual-averaging step-size
  adaptation (Hoffman & Gelman 2014, Alg. 5).
* ``NoUTurnSampler`` / ``NoUTurnSamplerDA``: recursive tree doubling
  (Alg. 3/6) on host, with the leapfrog + gradient inner step jitted.

``model`` may be a LinearGaussianBayesianNetwork (log-density from its
closed-form joint), any object with a ``log_pdf(x) -> scalar`` jax
callable, or a raw callable.
"""

import numpy as np

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------- #
# log-density adapters + reference-parity scaffolding classes
# ---------------------------------------------------------------------- #
def _resolve_log_pdf(model):
    from pgmpy_tpu.models.linear_gaussian_bn import LinearGaussianBayesianNetwork

    if callable(model) and not hasattr(model, "to_joint_gaussian"):
        return model, None
    if isinstance(model, LinearGaussianBayesianNetwork) or hasattr(
        model, "to_joint_gaussian"
    ):
        variables, mean, cov = model.joint_gaussian()
        prec = jnp.asarray(np.linalg.inv(cov))
        mu = jnp.asarray(mean)

        def log_pdf(x):
            diff = x - mu
            return -0.5 * diff @ prec @ diff

        return log_pdf, variables
    if hasattr(model, "log_pdf"):
        return model.log_pdf, getattr(model, "variables", None)
    raise ValueError(f"Cannot extract a log-density from {type(model)}")


class BaseGradLogPDF:
    """Parity shim for the reference gradient-provider API: subclasses
    provide ``get_gradient_log_pdf``; here autodiff does the work."""

    def __init__(self, variable_assignments, model):
        self.variable_assignments = jnp.asarray(variable_assignments)
        self.model = model
        log_pdf, _ = _resolve_log_pdf(model)
        self._log_pdf = log_pdf

    def get_gradient_log_pdf(self):
        x = self.variable_assignments
        return jax.grad(self._log_pdf)(x), self._log_pdf(x)


class GradLogPDFGaussian(BaseGradLogPDF):
    pass


class BaseSimulateHamiltonianDynamics:
    """One integrator step: subclasses implement ``get_proposed_values``."""

    def __init__(self, model, position, momentum, stepsize, grad_log_pdf=None, grad_log_position=None):
        self.model = model
        self.position = jnp.asarray(position)
        self.momentum = jnp.asarray(momentum)
        self.stepsize = stepsize
        log_pdf, _ = _resolve_log_pdf(model)
        self._log_pdf = log_pdf
        if grad_log_position is None:
            grad_log_position = jax.grad(log_pdf)(self.position)
        self.grad_log_position = grad_log_position

    def get_proposed_values(self):
        raise NotImplementedError


class LeapFrog(BaseSimulateHamiltonianDynamics):
    def get_proposed_values(self):
        grad_fn = jax.grad(self._log_pdf)
        momentum_half = self.momentum + 0.5 * self.stepsize * self.grad_log_position
        position = self.position + self.stepsize * momentum_half
        grad = grad_fn(position)
        momentum = momentum_half + 0.5 * self.stepsize * grad
        self.new_position, self.new_momentum, self.new_grad_logp = position, momentum, grad
        return self


class ModifiedEuler(BaseSimulateHamiltonianDynamics):
    def get_proposed_values(self):
        grad_fn = jax.grad(self._log_pdf)
        momentum = self.momentum + self.stepsize * self.grad_log_position
        position = self.position + self.stepsize * momentum
        self.new_position, self.new_momentum = position, momentum
        self.new_grad_logp = grad_fn(position)
        return self


# ---------------------------------------------------------------------- #
# compiled HMC
# ---------------------------------------------------------------------- #
class HamiltonianMC:
    """Fixed-stepsize HMC; trajectories compiled, chains vmapped."""

    def __init__(self, model, grad_log_pdf=None, simulate_dynamics=None):
        self.model = model
        self.log_pdf, self.variables = _resolve_log_pdf(model)
        self._grad = jax.grad(self.log_pdf)
        self.accepted_proposals = 0.0
        self.acceptance_rate = 0.0

    def _leapfrog(self, position, momentum, grad, stepsize, n_steps):
        def step(carry, _):
            q, p, g = carry
            p_half = p + 0.5 * stepsize * g
            q_new = q + stepsize * p_half
            g_new = self._grad(q_new)
            p_new = p_half + 0.5 * stepsize * g_new
            return (q_new, p_new, g_new), None

        (q, p, g), _ = jax.lax.scan(
            step, (position, momentum, grad), None, length=n_steps
        )
        return q, p, g

    def _kernel(self, key, position, stepsize, n_steps):
        key_mom, key_acc = jax.random.split(key)
        momentum = jax.random.normal(key_mom, position.shape)
        grad = self._grad(position)
        q_new, p_new, _ = self._leapfrog(position, momentum, grad, stepsize, n_steps)
        current_h = self.log_pdf(position) - 0.5 * jnp.sum(momentum**2)
        new_h = self.log_pdf(q_new) - 0.5 * jnp.sum(p_new**2)
        log_accept = jnp.minimum(0.0, new_h - current_h)
        accept = jnp.log(jax.random.uniform(key_acc)) < log_accept
        position = jnp.where(accept, q_new, position)
        return position, accept, jnp.exp(log_accept)

    def sample(
        self,
        initial_pos,
        num_samples,
        trajectory_length=10.0,
        stepsize=None,
        n_chains=1,
        seed=None,
        return_type="dataframe",
    ):
        """Draw ``num_samples`` per chain.  Returns a DataFrame (chain 0)
        or the raw (num_samples, n_chains, dim) array."""
        initial_pos = np.asarray(initial_pos, dtype=np.float64)
        if stepsize is None:
            stepsize = self._find_reasonable_stepsize(initial_pos)
        n_steps = max(1, int(trajectory_length / stepsize))
        key = jax.random.PRNGKey(
            np.random.randint(0, 2**31) if seed is None else seed
        )

        if initial_pos.ndim == 1:
            init = jnp.tile(initial_pos, (n_chains, 1))
        else:
            init = jnp.asarray(initial_pos)

        def one_step(carry, key_t):
            positions = carry
            chain_keys = jax.random.split(key_t, positions.shape[0])
            positions, accepts, rates = jax.vmap(
                lambda k, q: self._kernel(k, q, stepsize, n_steps)
            )(chain_keys, positions)
            return positions, (positions, accepts)

        keys = jax.random.split(key, int(num_samples))
        _, (trajectory, accepts) = jax.lax.scan(one_step, init, keys)
        self.acceptance_rate = float(jnp.mean(accepts))
        self.accepted_proposals = float(jnp.sum(accepts))

        if return_type == "dataframe":
            import pandas as pd

            cols = self.variables or [f"x{i}" for i in range(trajectory.shape[-1])]
            return pd.DataFrame(np.asarray(trajectory[:, 0, :]), columns=cols)
        return np.asarray(trajectory)

    def _find_reasonable_stepsize(self, position):
        """Heuristic from Hoffman & Gelman Alg. 4."""
        position = jnp.asarray(position).reshape(-1)
        key = jax.random.PRNGKey(0)
        momentum = jax.random.normal(key, position.shape)
        stepsize = 1.0
        grad = self._grad(position)

        def h(q, p):
            return self.log_pdf(q) - 0.5 * jnp.sum(p**2)

        def ratio_at(eps):
            # probe with a few steps: single-step probes miss the leapfrog
            # instability threshold on ill-conditioned targets
            q_new, p_new, _ = self._leapfrog(position, momentum, grad, eps, 3)
            return float(h(q_new, p_new) - h(position, momentum))

        ratio = ratio_at(stepsize)
        a = 1.0 if (np.isfinite(ratio) and ratio > np.log(0.5)) else -1.0
        for _ in range(50):
            new_stepsize = stepsize * 2.0**a
            ratio = ratio_at(new_stepsize)
            # stop BEFORE accepting a step that crosses the 0.5 threshold,
            # so the returned stepsize sits on the acceptable side
            if not np.isfinite(ratio) or a * ratio <= a * np.log(0.5):
                break
            stepsize = new_stepsize
        # safety margin: sit clearly inside the stable region
        return float(stepsize) / 2.0


class HamiltonianMCDA(HamiltonianMC):
    """HMC with dual-averaging stepsize adaptation during warmup."""

    def __init__(self, model, grad_log_pdf=None, simulate_dynamics=None, delta=0.65):
        super().__init__(model, grad_log_pdf, simulate_dynamics)
        self.delta = delta

    def sample(
        self,
        initial_pos,
        num_adapt,
        num_samples,
        trajectory_length=10.0,
        stepsize=None,
        n_chains=1,
        seed=None,
        return_type="dataframe",
    ):
        initial_pos = np.asarray(initial_pos, dtype=np.float64)
        if stepsize is None:
            stepsize = self._find_reasonable_stepsize(initial_pos)

        # dual averaging on chain 0 (host loop over warmup only)
        mu = np.log(10 * stepsize)
        log_eps_bar, h_bar = 0.0, 0.0
        gamma, t0, kappa = 0.05, 10.0, 0.75
        position = jnp.asarray(
            initial_pos if initial_pos.ndim == 1 else initial_pos[0]
        )
        key = jax.random.PRNGKey(
            np.random.randint(0, 2**31) if seed is None else seed
        )
        kernel = jax.jit(self._kernel, static_argnums=(3,))
        for m in range(1, int(num_adapt) + 1):
            key, sub = jax.random.split(key)
            n_steps = max(1, int(trajectory_length / stepsize))
            position, accept, rate = kernel(sub, position, stepsize, n_steps)
            h_bar = (1 - 1 / (m + t0)) * h_bar + (self.delta - float(rate)) / (m + t0)
            log_eps = mu - np.sqrt(m) / gamma * h_bar
            eta = m**-kappa
            log_eps_bar = eta * log_eps + (1 - eta) * log_eps_bar
            stepsize = float(np.exp(log_eps))
        stepsize = float(np.exp(log_eps_bar)) if num_adapt > 0 else stepsize

        return super().sample(
            np.asarray(position),
            num_samples,
            trajectory_length=trajectory_length,
            stepsize=stepsize,
            n_chains=n_chains,
            seed=None if seed is None else seed + 1,
            return_type=return_type,
        )


# ---------------------------------------------------------------------- #
# NUTS (recursive tree on host; jitted leapfrog inner step)
# ---------------------------------------------------------------------- #
class NoUTurnSampler(HamiltonianMC):
    """Hoffman & Gelman Algorithm 3 (efficient NUTS, slice variant)."""

    def __init__(self, model, grad_log_pdf=None, simulate_dynamics=None, max_depth=10):
        super().__init__(model, grad_log_pdf, simulate_dynamics)
        self.max_depth = max_depth

        @jax.jit
        def _leap(q, p, g, eps):
            p_half = p + 0.5 * eps * g
            q_new = q + eps * p_half
            g_new = self._grad(q_new)
            p_new = p_half + 0.5 * eps * g_new
            return q_new, p_new, g_new, self.log_pdf(q_new)

        self._leap = _leap

    def _build_tree(self, q, p, g, log_u, v, depth, eps, rng, joint0=0.0):
        """Returns (q-, p-, g-, q+, p+, g+, q', n', s', alpha', n_alpha').

        alpha'/n_alpha' are the Hoffman & Gelman Alg. 6 acceptance
        statistics consumed by dual averaging — the per-leaf
        ``min(1, exp(joint - joint0))`` sum and leaf count.
        """
        if depth == 0:
            q1, p1, g1, logp1 = self._leap(q, p, g, v * eps)
            joint = float(logp1) - 0.5 * float(jnp.sum(p1**2))
            n1 = int(log_u <= joint)
            s1 = int(log_u < joint + 1000.0)
            alpha1 = min(1.0, np.exp(min(joint - joint0, 0.0))) if np.isfinite(joint) else 0.0
            return q1, p1, g1, q1, p1, g1, q1, n1, s1, alpha1, 1
        (qm, pm, gm, qp, pp, gp, q1, n1, s1, a1, na1) = self._build_tree(
            q, p, g, log_u, v, depth - 1, eps, rng, joint0
        )
        if s1 == 1:
            if v == -1:
                qm, pm, gm, _, _, _, q2, n2, s2, a2, na2 = self._build_tree(
                    qm, pm, gm, log_u, v, depth - 1, eps, rng, joint0
                )
            else:
                _, _, _, qp, pp, gp, q2, n2, s2, a2, na2 = self._build_tree(
                    qp, pp, gp, log_u, v, depth - 1, eps, rng, joint0
                )
            if n1 + n2 > 0 and rng.random() < n2 / (n1 + n2):
                q1 = q2
            diff = qp - qm
            s1 = (
                s2
                * int(float(diff @ pm) >= 0)
                * int(float(diff @ pp) >= 0)
            )
            n1 = n1 + n2
            a1, na1 = a1 + a2, na1 + na2
        return qm, pm, gm, qp, pp, gp, q1, n1, s1, a1, na1

    def _nuts_step_stats(self, position, eps, rng):
        """One NUTS transition; returns (new_position, alpha, n_alpha)."""
        p0 = rng.normal(size=position.shape)
        g0 = np.asarray(self._grad(jnp.asarray(position)))
        joint0 = float(self.log_pdf(jnp.asarray(position))) - 0.5 * float(p0 @ p0)
        log_u = joint0 + np.log(rng.random() + 1e-300)

        qm = qp = jnp.asarray(position)
        pm = pp = jnp.asarray(p0)
        gm = gp = jnp.asarray(g0)
        q_out = jnp.asarray(position)
        n, s, depth = 1, 1, 0
        alpha, n_alpha = 0.0, 1
        while s == 1 and depth < self.max_depth:
            v = -1 if rng.random() < 0.5 else 1
            if v == -1:
                qm, pm, gm, _, _, _, q1, n1, s1, a1, na1 = self._build_tree(
                    qm, pm, gm, log_u, v, depth, eps, rng, joint0
                )
            else:
                _, _, _, qp, pp, gp, q1, n1, s1, a1, na1 = self._build_tree(
                    qp, pp, gp, log_u, v, depth, eps, rng, joint0
                )
            if s1 == 1 and rng.random() < min(1.0, n1 / max(n, 1)):
                q_out = q1
            n += n1
            alpha, n_alpha = a1, na1  # stats from the LAST doubling (Alg. 6)
            diff = qp - qm
            s = s1 * int(float(diff @ pm) >= 0) * int(float(diff @ pp) >= 0)
            depth += 1
        return np.asarray(q_out), alpha, max(n_alpha, 1)

    def _nuts_step(self, position, eps, rng):
        q, _, _ = self._nuts_step_stats(position, eps, rng)
        return q

    def sample(self, initial_pos, num_samples, stepsize=None, seed=None, return_type="dataframe"):
        position = np.asarray(initial_pos, dtype=np.float64)
        if stepsize is None:
            stepsize = self._find_reasonable_stepsize(position)
        rng = np.random.default_rng(seed)
        out = np.empty((int(num_samples), position.size))
        for i in range(int(num_samples)):
            position = self._nuts_step(position, stepsize, rng)
            out[i] = position
        if return_type == "dataframe":
            import pandas as pd

            cols = self.variables or [f"x{i}" for i in range(position.size)]
            return pd.DataFrame(out, columns=cols)
        return out

    def generate_sample(self, initial_pos, num_samples, stepsize=None, seed=None):
        position = np.asarray(initial_pos, dtype=np.float64)
        if stepsize is None:
            stepsize = self._find_reasonable_stepsize(position)
        rng = np.random.default_rng(seed)
        for _ in range(int(num_samples)):
            position = self._nuts_step(position, stepsize, rng)
            yield position.copy()


class NoUTurnSamplerDA(NoUTurnSampler):
    """NUTS with dual-averaging stepsize adaptation (Alg. 6)."""

    def __init__(self, model, grad_log_pdf=None, simulate_dynamics=None, delta=0.65, max_depth=10):
        super().__init__(model, grad_log_pdf, simulate_dynamics, max_depth=max_depth)
        self.delta = delta

    def sample(self, initial_pos, num_adapt, num_samples, stepsize=None, seed=None, return_type="dataframe"):
        position = np.asarray(initial_pos, dtype=np.float64)
        if stepsize is None:
            stepsize = self._find_reasonable_stepsize(position)
        rng = np.random.default_rng(seed)

        mu = np.log(10 * stepsize)
        log_eps_bar, h_bar = 0.0, 0.0
        gamma, t0, kappa = 0.05, 10.0, 0.75
        for m in range(1, int(num_adapt) + 1):
            # Alg. 6 acceptance statistic: mean leaf MH ratio from the tree
            # (the old end-to-end log-prob proxy saturated at 1.0 once in
            # the typical set, driving the stepsize to infinity)
            position, alpha, n_alpha = self._nuts_step_stats(position, stepsize, rng)
            rate = alpha / n_alpha
            h_bar = (1 - 1 / (m + t0)) * h_bar + (self.delta - rate) / (m + t0)
            log_eps = mu - np.sqrt(m) / gamma * h_bar
            eta = m**-kappa
            log_eps_bar = eta * log_eps + (1 - eta) * log_eps_bar
            stepsize = float(np.exp(log_eps))
        stepsize = float(np.exp(log_eps_bar)) if num_adapt > 0 else stepsize

        out = np.empty((int(num_samples), position.size))
        for i in range(int(num_samples)):
            position = self._nuts_step(position, stepsize, rng)
            out[i] = position
        if return_type == "dataframe":
            import pandas as pd

            cols = self.variables or [f"x{i}" for i in range(position.size)]
            return pd.DataFrame(out, columns=cols)
        return out
