"""Latent diffusion process: forward/reverse sampling as pure JAX functions.

TPU-native counterpart of the reference's ``LatentDiffusionProcess``
(reference: active_inference_diffusion/core/diffusion.py:14-255). Differences by
design, not translation:

- The reverse denoising sweep is a single ``lax.scan`` compiled into the
  surrounding XLA program (the reference runs a Python loop of K separate
  kernel launches per sweep, core/diffusion.py:196-205).
- Learnable quantities (latent prior mean/log-std, log-SNR interpolation
  bounds) live in a small parameter pytree (``init_diffusion_params``) so they
  compose with optax/pjit; there is no module object.
- RNG is explicit: every stochastic op takes a PRNG key.
"""

from __future__ import annotations

from typing import Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .schedules import DiffusionSchedule, extract


def init_diffusion_params(latent_dim: int, dtype: jnp.dtype = jnp.float32) -> Dict[str, jnp.ndarray]:
    """Learnable diffusion parameters (reference: core/diffusion.py:34-50)."""
    return {
        "latent_prior_mean": jnp.zeros((latent_dim,), dtype),
        "latent_prior_log_std": jnp.zeros((latent_dim,), dtype),
        "log_snr_min": jnp.asarray(-10.0, dtype),
        "log_snr_max": jnp.asarray(10.0, dtype),
    }


def compute_log_snr(params: Dict[str, jnp.ndarray], t: jnp.ndarray) -> jnp.ndarray:
    """Log signal-to-noise ratio interpolated over continuous time t in [0, 1]
    (reference: core/diffusion.py:56-60)."""
    return params["log_snr_min"] + (params["log_snr_max"] - params["log_snr_min"]) * (1.0 - t)


def continuous_q_sample(
    params: Dict[str, jnp.ndarray],
    z_start: jnp.ndarray,
    t: jnp.ndarray,
    noise: jnp.ndarray,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Continuous-time forward diffusion (reference: core/diffusion.py:62-91).

    alpha = sigmoid(log_snr), sigma = sigmoid(-log_snr);
    z_t = sqrt(alpha) z_0 + sqrt(sigma) eps.
    """
    log_snr = compute_log_snr(params, t)
    alpha = jax.nn.sigmoid(log_snr)[:, None]
    sigma = jax.nn.sigmoid(-log_snr)[:, None]
    z_noisy = jnp.sqrt(alpha) * z_start + jnp.sqrt(sigma) * noise
    return z_noisy, {"log_snr": log_snr, "alpha": alpha, "sigma": sigma}


def compute_loss_weight(params: Dict[str, jnp.ndarray], t: jnp.ndarray) -> jnp.ndarray:
    """Annealed score-matching loss weight emphasizing middle timesteps
    (reference: core/diffusion.py:93-104)."""
    log_snr = compute_log_snr(params, t)
    weight = jnp.exp(-0.5 * (log_snr**2) / 4.0)
    time_weight = jnp.sin(t * jnp.pi) + 0.1
    return weight * time_weight


def sample_latent_prior(
    params: Dict[str, jnp.ndarray], key: jax.Array, batch_size: int
) -> jnp.ndarray:
    """Sample from the learned Gaussian latent prior (reference: core/diffusion.py:146-152)."""
    mean = params["latent_prior_mean"]
    std = jnp.exp(params["latent_prior_log_std"])
    eps = jax.random.normal(key, (batch_size, mean.shape[-1]), dtype=mean.dtype)
    return mean[None, :] + std[None, :] * eps


def q_sample(
    schedule: DiffusionSchedule,
    z_start: jnp.ndarray,
    t: jnp.ndarray,
    noise: jnp.ndarray,
) -> jnp.ndarray:
    """Discrete forward diffusion q(z_t | z_0) (reference: core/diffusion.py:154-174)."""
    a = extract(schedule.sqrt_alphas_cumprod, t, z_start.ndim)
    b = extract(schedule.sqrt_one_minus_alphas_cumprod, t, z_start.ndim)
    return a * z_start + b * noise


def posterior_mean(
    schedule: DiffusionSchedule,
    z_start: jnp.ndarray,
    z_t: jnp.ndarray,
    t: jnp.ndarray,
) -> jnp.ndarray:
    """Posterior mean of q(z_{t-1} | z_t, z_0) (reference: core/diffusion.py:239-255)."""
    c1 = extract(schedule.posterior_mean_coef1, t, z_start.ndim)
    c2 = extract(schedule.posterior_mean_coef2, t, z_t.ndim)
    return c1 * z_start + c2 * z_t


def p_sample(
    schedule: DiffusionSchedule,
    z_t: jnp.ndarray,
    t: jnp.ndarray,
    score: jnp.ndarray,
    noise: jnp.ndarray,
    deterministic: bool = False,
) -> jnp.ndarray:
    """One reverse-diffusion step using the score-based update rule
    (reference: core/diffusion.py:208-237).

    Predicts z_0 from the score, then samples the posterior. ``noise`` must be
    provided explicitly (standard normal, same shape as ``z_t``); it is ignored
    at t == 0 or when ``deterministic``.
    """
    sqrt_one_minus_acp = extract(schedule.sqrt_one_minus_alphas_cumprod, t, z_t.ndim)
    sqrt_recip_alpha = extract(schedule.sqrt_recip_alphas, t, z_t.ndim)

    predicted_z_start = (z_t + sqrt_one_minus_acp * score) * sqrt_recip_alpha
    mean = posterior_mean(schedule, predicted_z_start, z_t, t)

    if deterministic:
        return mean

    var = extract(schedule.posterior_variance, t, z_t.ndim)
    nonzero = (t > 0).reshape((-1,) + (1,) * (z_t.ndim - 1)).astype(z_t.dtype)
    return mean + nonzero * jnp.sqrt(var) * noise


class DenoiseResult(NamedTuple):
    latent: jnp.ndarray  # (B, D) final latent z_0
    trajectory: Optional[jnp.ndarray]  # (K+1, B, D) if requested, else None


def generate_latents(
    schedule: DiffusionSchedule,
    score_fn: Callable[[jnp.ndarray, jnp.ndarray, Optional[jnp.ndarray]], jnp.ndarray],
    key: jax.Array,
    batch_size: int,
    latent_dim: int,
    observation: Optional[jnp.ndarray] = None,
    num_steps: Optional[int] = None,
    deterministic: bool = False,
    return_trajectory: bool = False,
    dtype: jnp.dtype = jnp.float32,
) -> DenoiseResult:
    """Reverse-diffusion belief generation as a single ``lax.scan``
    (reference: core/diffusion.py:176-206 runs this as a Python loop of K
    separate score-net launches; here the full sweep is one XLA program).

    ``score_fn(z, t_float, observation) -> score`` is typically the score
    network applied with fixed parameters. ``num_steps`` defaults to the
    schedule length; passing fewer steps runs the tail of the schedule
    (matching the reference collector's clamped-timestep sweep,
    utils/async_collector.py:554-572).
    """
    k = schedule.num_steps if num_steps is None else num_steps
    if k > schedule.num_steps:
        raise ValueError(f"num_steps={k} exceeds schedule length {schedule.num_steps}")

    init_key, scan_key = jax.random.split(key)
    z_init = jax.random.normal(init_key, (batch_size, latent_dim), dtype=dtype)

    timesteps = jnp.arange(k - 1, -1, -1, dtype=jnp.int32)  # K-1 .. 0
    step_keys = jax.random.split(scan_key, k)

    def body(z, inputs):
        t_scalar, step_key = inputs
        t_batch = jnp.full((batch_size,), t_scalar, dtype=jnp.int32)
        score = score_fn(z, t_batch.astype(dtype), observation)
        noise = jax.random.normal(step_key, z.shape, dtype=dtype)
        z_next = p_sample(schedule, z, t_batch, score, noise, deterministic=deterministic)
        return z_next, (z_next if return_trajectory else None)

    z_final, traj = jax.lax.scan(body, z_init, (timesteps, step_keys))

    if return_trajectory:
        trajectory = jnp.concatenate([z_init[None], traj], axis=0)
    else:
        trajectory = None
    return DenoiseResult(latent=z_final, trajectory=trajectory)
