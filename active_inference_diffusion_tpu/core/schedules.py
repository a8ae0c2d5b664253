"""Discrete DDPM noise schedules, precomputed as static coefficient arrays.

TPU-native counterpart of the reference's schedule setup
(reference: active_inference_diffusion/core/diffusion.py:106-144). All
coefficients are computed once at trace time in float64-ish stable numpy-space,
stored as jnp arrays, and gathered per-timestep inside jitted samplers.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class DiffusionSchedule(NamedTuple):
    """Per-timestep coefficients of a discrete DDPM schedule (length K arrays)."""

    betas: jnp.ndarray
    alphas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    alphas_cumprod_prev: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    sqrt_recip_alphas: jnp.ndarray
    posterior_variance: jnp.ndarray
    posterior_log_variance_clipped: jnp.ndarray
    posterior_mean_coef1: jnp.ndarray
    posterior_mean_coef2: jnp.ndarray

    @property
    def num_steps(self) -> int:
        return self.betas.shape[0]


def make_betas(num_steps: int, schedule: str, beta_start: float, beta_end: float) -> np.ndarray:
    """Beta schedule. Cosine follows Nichol & Dhariwal's alpha-bar construction
    (reference: core/diffusion.py:110-123)."""
    if schedule == "cosine":
        s = 0.008
        x = np.linspace(0.0, num_steps, num_steps + 1, dtype=np.float64)
        alphas_cumprod = np.cos(((x / num_steps) + s) / (1 + s) * math.pi * 0.5) ** 2
        alphas_cumprod = alphas_cumprod / alphas_cumprod[0]
        betas = 1.0 - (alphas_cumprod[1:] / alphas_cumprod[:-1])
        betas = np.clip(betas, 1e-4, 0.999)
    elif schedule == "linear":
        betas = np.linspace(beta_start, beta_end, num_steps, dtype=np.float64)
    else:
        raise ValueError(f"Unknown schedule: {schedule}")
    return betas


def make_schedule(
    num_steps: int,
    schedule: str = "cosine",
    beta_start: float = 1e-4,
    beta_end: float = 0.02,
    dtype: jnp.dtype = jnp.float32,
) -> DiffusionSchedule:
    """Build the full set of DDPM coefficients (reference: core/diffusion.py:106-144,
    posterior coefficients :239-255)."""
    betas = make_betas(num_steps, schedule, beta_start, beta_end)
    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas)
    alphas_cumprod_prev = np.concatenate([[1.0], alphas_cumprod[:-1]])

    posterior_variance = betas * (1.0 - alphas_cumprod_prev) / (1.0 - alphas_cumprod)
    posterior_mean_coef1 = betas * np.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod)
    posterior_mean_coef2 = (
        (1.0 - alphas_cumprod_prev) * np.sqrt(alphas) / (1.0 - alphas_cumprod)
    )

    def arr(x):
        return jnp.asarray(x, dtype=dtype)

    return DiffusionSchedule(
        betas=arr(betas),
        alphas=arr(alphas),
        alphas_cumprod=arr(alphas_cumprod),
        alphas_cumprod_prev=arr(alphas_cumprod_prev),
        sqrt_alphas_cumprod=arr(np.sqrt(alphas_cumprod)),
        sqrt_one_minus_alphas_cumprod=arr(np.sqrt(1.0 - alphas_cumprod)),
        sqrt_recip_alphas=arr(1.0 / np.sqrt(alphas)),
        posterior_variance=arr(posterior_variance),
        posterior_log_variance_clipped=arr(np.log(np.clip(posterior_variance, 1e-20, None))),
        posterior_mean_coef1=arr(posterior_mean_coef1),
        posterior_mean_coef2=arr(posterior_mean_coef2),
    )


def schedule_from_config(config, dtype: jnp.dtype = jnp.float32) -> DiffusionSchedule:
    """Build a schedule from a ``DiffusionConfig``."""
    return make_schedule(
        num_steps=config.num_diffusion_steps,
        schedule=config.beta_schedule,
        beta_start=config.beta_start,
        beta_end=config.beta_end,
        dtype=dtype,
    )


def extract(coeffs: jnp.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Gather per-timestep coefficients and reshape for broadcasting against a
    rank-``ndim`` batch tensor (reference: core/diffusion.py:258-262)."""
    out = jnp.take(coeffs, t, axis=-1)
    return out.reshape(out.shape + (1,) * (ndim - 1))
