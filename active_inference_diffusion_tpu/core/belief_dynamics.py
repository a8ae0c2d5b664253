"""Fokker-Planck belief dynamics under a Gaussian approximation.

TPU-native counterpart of the reference's ``BeliefDynamics``
(reference: active_inference_diffusion/core/belief_dynamics.py:12-408).

The belief q(z) evolves as
    dmu/dt    = -lr * grad_z F(mu)          (+ injected exploration noise)
    dSigma/dt = -Sigma H - H Sigma + 2 D I  (full covariance)
solved with the matrix-exponential update
    Sigma' = exp((-H - H^T + 2 D I) dt) Sigma exp(...)^T  (reference :268-294)
or the diagonal exponential update var' = var * exp((-2 H_ii + 2 D) dt)
(reference :154-167). Gradients/Hessians come from jax.grad / jax.hessian
(exact, replacing the reference's per-row autograd loops, :212-266).

NOTE: the reference's ``update()`` is uncallable as written — it invokes a
missing ``_record_state_enhanced`` method (:170 vs :344). This implementation
is callable, pure, jittable, and tested. History tracking lives in the
host-side ``BeliefDynamics`` wrapper.
"""

from __future__ import annotations

import math
from typing import Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct


class BeliefState(struct.PyTreeNode):
    mean: jnp.ndarray  # (D,)
    second_moment: jnp.ndarray  # (D, D) covariance or (D,) variance


class FPConfig(NamedTuple):
    """Static subset of BeliefDynamicsConfig used by the pure functions."""

    diffusion_coefficient: float = 0.1
    learning_rate: float = 0.1
    dt: float = 0.01
    min_variance: float = 1e-6
    max_variance: float = 10.0
    use_full_covariance: bool = False
    noise_scale: float = 0.01

    @classmethod
    def from_config(cls, config) -> "FPConfig":
        return cls(
            diffusion_coefficient=config.diffusion_coefficient,
            learning_rate=config.learning_rate,
            dt=config.dt,
            min_variance=config.min_variance,
            max_variance=config.max_variance,
            use_full_covariance=config.use_full_covariance,
            noise_scale=config.noise_scale,
        )


def belief_init(latent_dim: int, cfg: FPConfig) -> BeliefState:
    """Standard-normal initial belief (reference :41-50)."""
    if cfg.use_full_covariance:
        return BeliefState(jnp.zeros(latent_dim), jnp.eye(latent_dim))
    return BeliefState(jnp.zeros(latent_dim), jnp.ones(latent_dim))


def total_log_prob(
    z: jnp.ndarray,
    observation: jnp.ndarray,
    score: jnp.ndarray,
    cfg: FPConfig,
    observation_model: Optional[Callable] = None,
) -> jnp.ndarray:
    """Log-probability surrogate whose gradient drives the mean update
    (reference :174-210): Gaussian observation term + standard-normal prior +
    linear score term."""
    if observation_model is not None:
        obs_log_prob = observation_model(z[None], observation[None])[0]
    else:
        obs_log_prob = -0.5 * jnp.sum((z - observation) ** 2) / (cfg.noise_scale**2)
    prior_log_prob = -0.5 * jnp.sum(z**2)
    score_term = jnp.sum(z * score)
    return obs_log_prob + prior_log_prob + score_term


def _stabilize_spd(matrix: jnp.ndarray, min_eig: float, max_cond: float = 1e6):
    """Eigenvalue clamp + condition-number regularization (reference :296-332).
    Returns (stabilized matrix, condition number)."""
    eigvals, eigvecs = jnp.linalg.eigh(matrix)
    eigvals = jnp.clip(eigvals, min_eig, None)
    cond = eigvals[-1] / eigvals[0]
    reg = jnp.where(cond > max_cond, jnp.mean(eigvals) * 1e-6, 0.0)
    eigvals = eigvals + reg
    return (eigvecs * eigvals[None, :]) @ eigvecs.T, cond


def belief_update(
    state: BeliefState,
    observation: jnp.ndarray,
    score: jnp.ndarray,
    key: jax.Array,
    cfg: FPConfig,
    observation_model: Optional[Callable] = None,
) -> Tuple[BeliefState, Dict[str, jnp.ndarray]]:
    """One Fokker-Planck step (reference :97-172). Pure and jittable."""
    d = state.mean.shape[0]
    dt, diff_coef, lr = cfg.dt, cfg.diffusion_coefficient, cfg.learning_rate

    # Free energy F(z) = -log p(z, o); its gradient drives the mean and its
    # Hessian (positive definite near a mode) drives the covariance. The
    # reference plugs the Hessian of log p directly into the FP drift
    # (belief_dynamics.py:280), which flips the sign: with its own default
    # noise_scale=0.01 the matrix exponential is exp(+2e4*dt) -> overflow.
    # Since the reference's update() is uncallable anyway (missing method,
    # :170), we implement the well-posed free-energy form.
    free_energy = lambda z: -total_log_prob(z, observation, score, cfg, observation_model)
    grad_fn = jax.grad(free_energy)
    f_gradient = grad_fn(state.mean)

    # Adaptive step + noise injection (reference :129-137)
    grad_norm = jnp.sqrt(jnp.sum(f_gradient**2) + 1e-12)
    adaptive_dt = dt / (1.0 + 0.1 * grad_norm)
    noise = (
        math.sqrt(2.0 * diff_coef * dt)
        * cfg.noise_scale
        * jax.random.normal(key, state.mean.shape)
    )
    new_mean = state.mean + (-lr * f_gradient) * adaptive_dt + noise

    if cfg.use_full_covariance:
        # Hessian of F via exact autodiff (reference loops rows, :212-242)
        h = jax.hessian(free_energy)(new_mean)
        h = 0.5 * (h + h.T)
        drift = -h - h.T + 2.0 * diff_coef * jnp.eye(d)
        exp_drift = jax.scipy.linalg.expm(drift * dt)
        cov = exp_drift @ state.second_moment @ exp_drift.T
        cov, cond = _stabilize_spd(cov, cfg.min_variance)
        new_state = BeliefState(new_mean, cov)
        diag = {
            "condition_number": cond,
            "min_eigenvalue": jnp.linalg.eigvalsh(cov)[0],
        }
    else:
        # Diagonal Hessian = diag of jacobian of grad (reference :244-266)
        h_diag = jnp.diagonal(jax.jacfwd(grad_fn)(new_mean))
        var = state.second_moment * jnp.exp((-2.0 * h_diag + 2.0 * diff_coef) * dt)
        var = jnp.clip(var, cfg.min_variance, cfg.max_variance)
        new_state = BeliefState(new_mean, var)
        diag = {"min_variance": var.min(), "max_variance": var.max()}

    diag["grad_norm"] = grad_norm
    diag["entropy"] = belief_entropy(new_state, cfg)
    return new_state, diag


def fp_refine_mean(
    latent: jnp.ndarray,
    key: jax.Array,
    cfg: FPConfig,
    free_energy_fn: Callable[[jnp.ndarray], jnp.ndarray],
    num_steps: int = 1,
) -> jnp.ndarray:
    """Batched Fokker-Planck mean refinement of belief latents.

    The mean-drift half of ``belief_update`` (reference :118-137: adaptive
    step on -lr * grad F plus injected diffusion noise), vmapped over a batch
    of point beliefs and scanned ``num_steps`` times — the act-time wiring of
    C-4a behind ``BeliefDynamicsConfig.use_belief_dynamics`` (the reference
    declares that flag but nothing consumes it; see DEVIATIONS.md). The
    covariance update stays in ``belief_update`` (the standalone API): at act
    time only the latent point estimate feeds the policy, and the diagonal
    Hessian would cost D extra decoder passes per step.

    ``free_energy_fn(z_batch) -> (B,) free energy`` — typically the decoder
    negative log-likelihood plus the standard-normal prior (the
    ``observation_model`` form of ``total_log_prob``).
    """
    lr, dt, diff_coef = cfg.learning_rate, cfg.dt, cfg.diffusion_coefficient

    def one_step(z, step_key):
        g = jax.grad(lambda zz: jnp.sum(free_energy_fn(zz)))(z)  # (B, D)
        grad_norm = jnp.sqrt(jnp.sum(g**2, axis=-1, keepdims=True) + 1e-12)
        adaptive_dt = dt / (1.0 + 0.1 * grad_norm)
        noise = (
            math.sqrt(2.0 * diff_coef * dt)
            * cfg.noise_scale
            * jax.random.normal(step_key, z.shape, z.dtype)
        )
        return z - lr * g * adaptive_dt + noise, None

    refined, _ = jax.lax.scan(
        one_step, latent, jax.random.split(key, num_steps)
    )
    return refined


def belief_entropy(state: BeliefState, cfg: FPConfig) -> jnp.ndarray:
    """Gaussian entropy (reference :368-389)."""
    k = state.mean.shape[0]
    const = k * math.log(2.0 * math.pi * math.e)
    if cfg.use_full_covariance:
        sign, logdet = jnp.linalg.slogdet(state.second_moment)
        logdet = jnp.where(sign > 0, logdet, k * math.log(cfg.min_variance))
        return 0.5 * (const + logdet)
    log_vars = jnp.log(jnp.clip(state.second_moment, cfg.min_variance, None))
    return 0.5 * (const + jnp.sum(log_vars))


class BeliefDynamics:
    """Host-side stateful wrapper with history tracking, mirroring the
    reference class surface (reset/update/get_parameters/entropy/
    get_diagnostics, reference :66-408)."""

    def __init__(self, latent_dim: int, config):
        self.latent_dim = latent_dim
        self.cfg = FPConfig.from_config(config)
        self.state = belief_init(latent_dim, self.cfg)
        self._update = jax.jit(
            lambda s, o, sc, k: belief_update(s, o, sc, k, self.cfg)
        )
        self.history: Dict[str, list] = {
            "means": [], "covariances": [], "entropies": [],
            "free_energies": [], "condition_numbers": [], "numerical_warnings": [],
        }

    def reset(self, initial_mean=None, initial_cov=None):
        self.state = belief_init(self.latent_dim, self.cfg)
        if initial_mean is not None:
            self.state = self.state.replace(mean=jnp.asarray(initial_mean))
        if initial_cov is not None:
            cov = jnp.asarray(initial_cov)
            if not self.cfg.use_full_covariance:
                cov = jnp.diagonal(cov) if cov.ndim == 2 else cov
                cov = jnp.clip(cov, self.cfg.min_variance, None)
            self.state = self.state.replace(second_moment=cov)
        self.history = {k: [] for k in self.history}

    def update(self, observation, score_function, action=None, observation_model=None,
               key: Optional[jax.Array] = None):
        del action  # unused, kept for reference API parity (:97-103)
        key = key if key is not None else jax.random.PRNGKey(len(self.history["means"]))
        obs = jnp.asarray(observation).reshape(-1)
        score = jnp.asarray(score_function).reshape(-1)
        self.state, diag = self._update(self.state, obs, score, key)
        self._record_state(obs, diag)
        return self.get_parameters()

    def _record_state(self, observation, diag):
        import numpy as np

        self.history["means"].append(np.asarray(self.state.mean))
        if self.cfg.use_full_covariance:
            self.history["covariances"].append(np.asarray(self.state.second_moment))
            self.history["condition_numbers"].append(
                float(diag.get("condition_number", 1.0))
            )
        else:
            self.history["covariances"].append(
                np.diag(np.asarray(self.state.second_moment))
            )
        entropy = float(diag["entropy"])
        self.history["entropies"].append(entropy)
        obs_error = float(jnp.sum((self.state.mean - observation) ** 2))
        free_energy = -entropy - 0.5 * obs_error / (self.cfg.noise_scale**2)
        self.history["free_energies"].append(free_energy)

    def get_parameters(self):
        if self.cfg.use_full_covariance:
            return self.state.mean, self.state.second_moment
        return self.state.mean, jnp.diag(self.state.second_moment)

    def entropy(self):
        return belief_entropy(self.state, self.cfg)

    def get_diagnostics(self) -> Dict[str, float]:
        import numpy as np

        d: Dict[str, float] = {}
        if self.cfg.use_full_covariance:
            eigvals = np.linalg.eigvalsh(np.asarray(self.state.second_moment))
            d["min_eigenvalue"] = float(eigvals.min())
            d["max_eigenvalue"] = float(eigvals.max())
            d["condition_number"] = float(eigvals.max() / eigvals.min())
            d["determinant"] = float(np.prod(eigvals))
        else:
            var = np.asarray(self.state.second_moment)
            d["min_variance"] = float(var.min())
            d["max_variance"] = float(var.max())
            d["mean_variance"] = float(var.mean())
        d["mean_norm"] = float(jnp.linalg.norm(self.state.mean))
        d["entropy"] = float(self.entropy())
        return d
