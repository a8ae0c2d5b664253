"""Observation decoders: state-space MLP decoder, pixel feature decoder, and
the reward predictor head.

TPU-native counterparts of the decoders built inside the reference's
``DiffusionActiveInference._build_models``
(reference: active_inference_diffusion/core/active_inference.py:111-171).
The pixel ConvDecoder lives in models/encoders.py alongside the conv encoder.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class StateDecoder(nn.Module):
    """Latent -> state-observation decoder with a skip connection
    (reference: core/active_inference.py:111-131, decode path :236-242)."""

    observation_dim: int
    hidden_dim: int = 512
    dropout_rate: float = 0.2

    @nn.compact
    def __call__(self, latent: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        def block(x, features, name):
            x = nn.Dense(features, name=f"{name}_fc")(x)
            x = nn.LayerNorm(name=f"{name}_ln")(x)
            x = jax.nn.silu(x)
            return nn.Dropout(self.dropout_rate, deterministic=not train)(x)

        h1 = block(latent, self.hidden_dim * 2, "b0")
        h2 = block(h1, self.hidden_dim * 2, "b1")
        h2 = h2 + h1  # skip connection (reference :240)
        h3 = block(h2, self.hidden_dim, "b2")
        return nn.Dense(self.observation_dim, name="out")(h3)


class FeatureDecoder(nn.Module):
    """Latent -> encoded-feature decoder for pixel observations
    (reference: core/active_inference.py:142-149)."""

    latent_dim: int
    hidden_dim: int = 512
    dropout_rate: float = 0.2

    @nn.compact
    def __call__(self, latent: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        h = nn.Dense(self.hidden_dim, name="fc1")(latent)
        h = nn.LayerNorm(name="ln")(h)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout_rate, deterministic=not train)(h)
        h = nn.Dense(self.latent_dim, name="fc2")(h)
        return jnp.tanh(h)


class RewardPredictor(nn.Module):
    """Latent -> (reward mean, reward std) head
    (reference: core/active_inference.py:164-171, :245-253)."""

    hidden_dim: int = 512

    @nn.compact
    def __call__(self, latent: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        h = nn.Dense(self.hidden_dim, name="fc1")(latent)
        h = nn.LayerNorm(name="ln")(h)
        h = nn.relu(h)
        h = nn.Dense(self.hidden_dim // 2, name="fc2")(h)
        h = nn.relu(h)
        params = nn.Dense(2, name="out")(h)
        mean = params[:, 0]
        std = jnp.exp(jnp.clip(params[:, 1], -5.0, 2.0))
        return mean, std


class ContinuationPredictor(nn.Module):
    """Latent -> continuation logit c(z) (Dreamer-style discount head; no
    reference counterpart — the reference's imagination ignores episode
    termination entirely, core/active_inference.py:314-396). Trained by BCE
    on replay dones; sigmoid(logit) multiplies the imagined discount."""

    hidden_dim: int = 256

    @nn.compact
    def __call__(self, latent: jnp.ndarray) -> jnp.ndarray:
        h = nn.Dense(self.hidden_dim, name="fc1")(latent)
        h = nn.LayerNorm(name="ln")(h)
        h = nn.relu(h)
        return nn.Dense(1, name="out")(h)[:, 0]


def reward_log_prob(mean: jnp.ndarray, std: jnp.ndarray, rewards: jnp.ndarray) -> jnp.ndarray:
    """Gaussian log-likelihood of rewards under the predictor
    (reference: core/active_inference.py:617-618)."""
    var = std**2
    return -0.5 * ((rewards - mean) ** 2 / var + jnp.log(2.0 * jnp.pi * var))
