"""Exponential moving average of parameter pytrees.

TPU-native counterpart of the reference's ``EMAModel``
(reference: active_inference_diffusion/core/active_inference.py:779-813), as
pure pytree transforms instead of in-place module surgery.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def init_ema(params):
    """Initialize shadow parameters as a true copy of ``params`` (distinct
    buffers, so donated train states never alias params and shadow)."""
    return jax.tree_util.tree_map(jnp.copy, params)


def update_ema(ema_params, params, decay: float = 0.9999):
    """shadow <- decay * shadow + (1 - decay) * params."""
    return jax.tree_util.tree_map(
        lambda s, p: decay * s + (1.0 - decay) * p, ema_params, params
    )
