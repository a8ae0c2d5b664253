"""Latent dynamics model f(s, a) -> delta s (residual).

TPU-native counterpart of the reference's ``LatentDynamicsModel``
(reference: active_inference_diffusion/models/dynamics_models.py:9-68).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from .common import small_uniform_init


class LatentDynamicsModel(nn.Module):
    state_dim: int
    action_dim: int
    hidden_dim: int = 256
    num_layers: int = 3
    residual: bool = True

    @nn.compact
    def __call__(self, state: jnp.ndarray, action: jnp.ndarray) -> jnp.ndarray:
        h = jnp.concatenate([state, action], axis=-1)
        for i in range(self.num_layers):
            h = nn.Dense(self.hidden_dim, name=f"fc{i}")(h)
            h = nn.LayerNorm(name=f"ln{i}")(h)
            h = nn.relu(h)
        # Small-init output so the residual connection dominates at init
        # (reference: dynamics_models.py:43-45).
        out = nn.Dense(
            self.state_dim,
            kernel_init=small_uniform_init(1e-3),
            bias_init=nn.initializers.zeros,
            name="out",
        )(h)
        if self.residual:
            return state + out
        return out
