"""Time-conditioned value network V(s, t).

TPU-native counterpart of the reference's ``ValueNetwork``
(reference: active_inference_diffusion/models/value_networks.py:9-60).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from .common import SinusoidalPositionEmbeddings


class ValueNetwork(nn.Module):
    state_dim: int
    hidden_dim: int = 256
    time_embed_dim: int = 128
    num_layers: int = 3

    @nn.compact
    def __call__(self, state: jnp.ndarray, time: jnp.ndarray) -> jnp.ndarray:
        t_emb = SinusoidalPositionEmbeddings(self.time_embed_dim, name="time_sin")(time)
        t_emb = nn.Dense(self.time_embed_dim, name="time_fc")(t_emb)
        t_emb = nn.relu(t_emb)

        h = jnp.concatenate([state, t_emb], axis=-1)
        for i in range(self.num_layers):
            h = nn.Dense(self.hidden_dim, name=f"fc{i}")(h)
            h = nn.LayerNorm(name=f"ln{i}")(h)
            h = nn.relu(h)
        return nn.Dense(1, name="out")(h)
