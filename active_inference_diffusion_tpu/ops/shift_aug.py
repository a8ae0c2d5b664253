"""Random-shift augmentation (DrQ), fully vectorized.

TPU-native counterpart of the reference's ``RandomShiftAugmentation``
(reference: active_inference_diffusion/encoder/visual_encoders.py:462-492),
which reflect-pads then crops each image in a *Python loop over the batch*.
Here the per-image crop is a batched gather (two ``take_along_axis`` calls) —
one fused XLA op sequence, no loop, NHWC layout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def random_shift(x: jnp.ndarray, key: jax.Array, pad: int = 4) -> jnp.ndarray:
    """Reflect-pad by ``pad`` and crop each image at an independent random
    offset. x: (B, H, W, C) in any float dtype. Returns same shape."""
    b, h, w, c = x.shape
    h_key, w_key = jax.random.split(key)
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")

    h_off = jax.random.randint(h_key, (b,), 0, 2 * pad + 1)
    w_off = jax.random.randint(w_key, (b,), 0, 2 * pad + 1)

    rows = h_off[:, None] + jnp.arange(h)[None, :]  # (B, H)
    cols = w_off[:, None] + jnp.arange(w)[None, :]  # (B, W)

    x1 = jnp.take_along_axis(xp, rows[:, :, None, None], axis=1)  # (B,H,W+2p,C)
    return jnp.take_along_axis(x1, cols[:, None, :, None], axis=2)  # (B,H,W,C)


def random_shift_nchw(x: jnp.ndarray, key: jax.Array, pad: int = 4) -> jnp.ndarray:
    """NCHW adapter for reference-layout tensors."""
    return jnp.moveaxis(random_shift(jnp.moveaxis(x, -3, -1), key, pad), -1, -3)
