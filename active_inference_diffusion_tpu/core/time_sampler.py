"""Loss-aware importance sampling of diffusion time.

TPU-native counterpart of the reference's time importance machinery
(reference: active_inference_diffusion/core/active_inference.py:731-771), which
updates 100 bins one Python iteration at a time. Here both sampling and the
EMA update are vectorized (segment-mean scatter), usable inside jit.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

NUM_BINS = 100


def init_time_importance(dtype=jnp.float32) -> jnp.ndarray:
    """Uniform initial importance weights over 100 time bins."""
    return jnp.ones((NUM_BINS,), dtype)


def importance_sample_time(
    weights: jnp.ndarray, key: jax.Array, batch_size: int
) -> jnp.ndarray:
    """Sample continuous t in [0, 1) from the softmax of bin weights, jittered
    uniformly within each bin (reference: core/active_inference.py:731-748)."""
    cat_key, jitter_key = jax.random.split(key)
    logits = weights  # softmax(weights) as in the reference
    indices = jax.random.categorical(cat_key, logits, shape=(batch_size,))
    jitter = jax.random.uniform(jitter_key, (batch_size,), dtype=weights.dtype)
    return (indices.astype(weights.dtype) + jitter) / float(NUM_BINS)


def update_time_importance(
    weights: jnp.ndarray, t: jnp.ndarray, losses: jnp.ndarray, ema: float = 0.99
) -> jnp.ndarray:
    """EMA-update bin weights toward observed per-sample losses.

    The reference iterates samples sequentially (so several samples hitting the
    same bin compound the EMA); here each touched bin takes one EMA step toward
    the mean loss of its samples — the natural batched semantics.
    """
    bins = jnp.clip((t * (NUM_BINS - 1)).astype(jnp.int32), 0, NUM_BINS - 1)
    sums = jax.ops.segment_sum(losses, bins, num_segments=NUM_BINS)
    counts = jax.ops.segment_sum(jnp.ones_like(losses), bins, num_segments=NUM_BINS)
    touched = counts > 0
    mean_loss = jnp.where(touched, sums / jnp.maximum(counts, 1.0), 0.0)
    updated = ema * weights + (1.0 - ema) * mean_loss
    return jnp.where(touched, updated, weights)


def sample_and_update(
    weights: jnp.ndarray,
    key: jax.Array,
    batch_size: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Convenience wrapper returning sampled times and the (unchanged) weights;
    callers update with :func:`update_time_importance` after computing losses."""
    return importance_sample_time(weights, key, batch_size), weights
