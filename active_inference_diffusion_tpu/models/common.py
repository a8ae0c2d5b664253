"""Shared neural-net building blocks (Flax linen).

Counterparts of the reference's embedding/normalization helpers
(reference: active_inference_diffusion/models/score_networks.py:238-291).
"""

from __future__ import annotations

import math
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def mish(x: jnp.ndarray) -> jnp.ndarray:
    """Mish activation: x * tanh(softplus(x))."""
    return x * jnp.tanh(jax.nn.softplus(x))


class SinusoidalPositionEmbeddings(nn.Module):
    """Sinusoidal time embeddings with a learnable frequency scale
    (reference: models/score_networks.py:273-291)."""

    dim: int

    @nn.compact
    def __call__(self, time: jnp.ndarray) -> jnp.ndarray:
        freq_scale = self.param("freq_scale", nn.initializers.ones, (1,))
        half_dim = self.dim // 2
        exponent = math.log(10000.0) / (half_dim - 1)
        freqs = jnp.exp(jnp.arange(half_dim, dtype=time.dtype) * -exponent)
        freqs = freqs * freq_scale
        args = time[:, None] * freqs[None, :]
        return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


class AdaptiveLayerNorm(nn.Module):
    """AdaLN: LayerNorm without affine params, modulated by conditioning
    (reference: models/score_networks.py:238-270). Modulation projection is
    zero-initialized so the block starts as a plain LayerNorm."""

    hidden_dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, conditioning: jnp.ndarray) -> jnp.ndarray:
        scale_shift = nn.Dense(
            2 * self.hidden_dim,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="adaLN_modulation",
        )(jax.nn.silu(conditioning))
        scale, shift = jnp.split(scale_shift, 2, axis=-1)
        normed = nn.LayerNorm(use_bias=False, use_scale=False)(x)
        return normed * (1.0 + scale) + shift


class MLP(nn.Module):
    """Simple MLP with configurable activation and optional LayerNorm per layer."""

    features: Sequence[int]
    activation: Callable[[jnp.ndarray], jnp.ndarray] = nn.relu
    use_layer_norm: bool = False
    activate_final: bool = False
    kernel_init: Callable = nn.initializers.xavier_uniform()

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i, feat in enumerate(self.features):
            x = nn.Dense(feat, kernel_init=self.kernel_init)(x)
            is_last = i == len(self.features) - 1
            if not is_last or self.activate_final:
                if self.use_layer_norm:
                    x = nn.LayerNorm()(x)
                x = self.activation(x)
        return x


def orthogonal_init(gain: float = 1.0):
    return nn.initializers.orthogonal(scale=gain)


def small_uniform_init(scale: float = 1e-3):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-scale, maxval=scale)

    return init
