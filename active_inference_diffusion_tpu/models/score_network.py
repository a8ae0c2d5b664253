"""DiT-style latent score network s_theta(z_t, t, o).

TPU-native counterpart of the reference's ``LatentScoreNetwork``
(reference: active_inference_diffusion/models/score_networks.py:12-235).

Design notes (TPU-first, not a translation):

- The reference runs multi-head self-attention over a *single token*
  (models/score_networks.py:225: ``norm_x.unsqueeze(1)`` then MHA). At
  sequence length 1 the softmax over one key is identically 1, so MHA
  degenerates to ``out_proj(v_proj(x))`` — two plain matmuls.
  ``SingleTokenAttention`` implements exactly that.
- Continuous-vs-discrete time is a *static* flag (``continuous=...``) rather
  than the reference's data-dependent ``time.max() <= 1`` check
  (models/score_networks.py:121), which would break XLA tracing.
- The network is factored into ``obs_embedding`` / ``time_embedding`` /
  ``trunk`` methods so the reverse-diffusion sweep can hoist the
  observation conditioning OUT of the K-step scan and precompute all K time
  embeddings in one shot (the reference — and a naive port — recomputes the
  full obs encoder every denoising step). ``__call__`` composes them and is
  semantically identical to the reference's forward.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .common import AdaptiveLayerNorm, SinusoidalPositionEmbeddings


class SingleTokenAttention(nn.Module):
    """Self-attention specialized to sequence length 1: out_proj(v_proj(x))."""

    hidden_dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        v = nn.Dense(self.hidden_dim, name="v_proj")(x)
        return nn.Dense(self.hidden_dim, name="out_proj")(v)


class DiTBlock(nn.Module):
    """Diffusion-Transformer block with adaptive layer norm
    (reference: models/score_networks.py:174-235)."""

    hidden_dim: int
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, conditioning: jnp.ndarray) -> jnp.ndarray:
        h = AdaptiveLayerNorm(self.hidden_dim, name="norm1")(x, conditioning)
        x = x + SingleTokenAttention(self.hidden_dim, name="attention")(h)

        h = AdaptiveLayerNorm(self.hidden_dim, name="norm2")(x, conditioning)
        mlp_hidden = int(self.hidden_dim * self.mlp_ratio)
        h = nn.Dense(mlp_hidden, kernel_init=nn.initializers.xavier_uniform(), name="mlp_fc1")(h)
        h = nn.gelu(h)
        h = nn.Dense(
            self.hidden_dim, kernel_init=nn.initializers.xavier_uniform(), name="mlp_fc2"
        )(h)
        return x + h


class LatentScoreNetwork(nn.Module):
    """Score network s_theta(z_t, t, o) = grad_z log p_t(z|o)
    (reference: models/score_networks.py:12-171)."""

    latent_dim: int
    observation_dim: int
    hidden_dim: int = 256
    time_embed_dim: int = 128
    num_layers: int = 6
    use_attention: bool = True
    output_scale: float = 1e-3
    dropout_rate: float = 0.1

    def setup(self):
        h = self.hidden_dim
        # sinusoidal time path (reference :40-46)
        self.time_embed_sin = SinusoidalPositionEmbeddings(self.time_embed_dim)
        self.time_embed_fc1 = nn.Dense(h * 2)
        self.time_embed_fc2 = nn.Dense(h)
        # continuous-time MLP path (reference :60-66)
        self.cont_time_fc1 = nn.Dense(self.time_embed_dim)
        self.cont_time_fc2 = nn.Dense(self.time_embed_dim)
        self.cont_time_fc3 = nn.Dense(h)
        self.time_scale = self.param("time_scale", nn.initializers.ones, (1,))
        # observation encoder (reference :49-59)
        self.obs_fc1 = nn.Dense(h)
        self.obs_ln1 = nn.LayerNorm()
        self.obs_drop = nn.Dropout(self.dropout_rate)
        self.obs_fc2 = nn.Dense(h)
        self.obs_ln2 = nn.LayerNorm()
        self.obs_fc3 = nn.Dense(h)
        self.obs_ln3 = nn.LayerNorm()
        # latent trunk
        self.latent_proj = nn.Dense(h)
        if self.use_attention:
            self.blocks = [
                DiTBlock(h, name=f"block_{i}") for i in range(self.num_layers)
            ]
        self.norm_final = AdaptiveLayerNorm(h)
        self.out_fc1 = nn.Dense(h // 2)
        self.out_fc2 = nn.Dense(
            self.latent_dim, use_bias=False, kernel_init=nn.initializers.zeros
        )
        self.output_multiplier = self.param(
            "output_multiplier",
            lambda key, shape: jnp.full(shape, self.output_scale, jnp.float32),
            (1,),
        )

    # -- conditioning pieces (hoistable out of the denoise scan) ---------

    def obs_embedding(self, observation: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = self.obs_fc1(observation)
        x = self.obs_ln1(x)
        x = jax.nn.silu(x)
        x = self.obs_drop(x, deterministic=not train)
        x = self.obs_fc2(x)
        x = self.obs_ln2(x)
        x = jax.nn.silu(x)
        x = self.obs_fc3(x)
        return self.obs_ln3(x)

    def time_embedding(self, time: jnp.ndarray, continuous: bool = True) -> jnp.ndarray:
        """Embed times (any batch shape). Continuous path combines sinusoidal
        and learned-MLP embeddings (reference :119-141)."""

        def sin_path(t):
            emb = self.time_embed_sin(t)
            emb = self.time_embed_fc1(emb)
            emb = jax.nn.silu(emb)
            return self.time_embed_fc2(emb)

        if not continuous:
            return sin_path(time)
        t_sin = sin_path(time * 999.0)
        t_cont = (2.0 * time - 1.0)[:, None]
        t_cont = jax.nn.silu(self.cont_time_fc1(t_cont))
        t_cont = jax.nn.silu(self.cont_time_fc2(t_cont))
        t_cont = self.cont_time_fc3(t_cont)
        return t_sin + self.time_scale * t_cont

    # -- per-step trunk ---------------------------------------------------

    def trunk(
        self,
        z_t: jnp.ndarray,
        conditioning: jnp.ndarray,
        time_weight: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """Score head given precomputed conditioning (t_emb + obs_emb)."""
        h = self.latent_proj(z_t)
        if self.use_attention:
            for block in self.blocks:
                h = block(h, conditioning)
        h = self.norm_final(h, conditioning)
        h = self.out_fc1(h)
        h = jax.nn.silu(h)
        score = self.out_fc2(h)
        score = jnp.clip(score, -10.0, 10.0)
        score = score * self.output_multiplier
        if time_weight is not None:
            score = score * time_weight
        return score

    def __call__(
        self,
        z_t: jnp.ndarray,
        time: jnp.ndarray,
        observation: Optional[jnp.ndarray] = None,
        *,
        continuous: bool = True,
        train: bool = False,
    ) -> jnp.ndarray:
        batch_size = z_t.shape[0]
        t_emb = self.time_embedding(time, continuous=continuous)
        if observation is not None:
            obs_emb = self.obs_embedding(observation, train=train)
        else:
            obs_emb = jnp.zeros((batch_size, self.hidden_dim), dtype=z_t.dtype)
        conditioning = t_emb + obs_emb
        # Annealed output scaling 1/sqrt(t) on the continuous path (:137)
        time_weight = (
            jnp.sqrt(1.0 / (1e-5 + time))[:, None] if continuous else None
        )
        return self.trunk(z_t, conditioning, time_weight)
