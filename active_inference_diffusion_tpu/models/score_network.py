"""DiT-style latent score network s_theta(z_t, t, o).

TPU-native counterpart of the reference's ``LatentScoreNetwork``
(reference: active_inference_diffusion/models/score_networks.py:12-235).

Design notes (TPU-first, not a translation):

- The reference runs multi-head self-attention over a *single token*
  (models/score_networks.py:225: ``norm_x.unsqueeze(1)`` then MHA). At sequence
  length 1 the softmax over one key is identically 1, so MHA degenerates to
  ``out_proj(v_proj(x))`` — two plain matmuls. ``SingleTokenAttention``
  implements exactly that, keeping the math identical while avoiding the
  attention machinery entirely (better MXU utilization, no wasted q/k
  projections at inference; q/k projections exist only as parameters when
  ``parity_params=True``).
- Continuous-vs-discrete time is a *static* flag (``continuous=...``) rather
  than the reference's data-dependent ``time.max() <= 1`` check
  (models/score_networks.py:121), which would break XLA tracing.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .common import AdaptiveLayerNorm, SinusoidalPositionEmbeddings


class SingleTokenAttention(nn.Module):
    """Self-attention specialized to sequence length 1.

    Mathematically identical to nn.MultiheadAttention applied to a single
    token: attention weights are softmax over one key (== 1), so
    out = W_o (W_v x + b_v) + b_o.
    """

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

    @nn.compact
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

        # --- Time embedding (dual path, reference :40-46,60-69,119-141) ---
        def time_embed(t):
            emb = SinusoidalPositionEmbeddings(self.time_embed_dim, name="time_embed_sin")(t)
            emb = nn.Dense(self.hidden_dim * 2, name="time_embed_fc1")(emb)
            emb = jax.nn.silu(emb)
            return nn.Dense(self.hidden_dim, name="time_embed_fc2")(emb)

        if continuous:
            # Continuous t in [0, 1]: sinusoidal embedding of the discrete
            # equivalent plus a learned continuous-time MLP embedding.
            t_sin = time_embed(time * 999.0)
            normalized_time = (2.0 * time - 1.0)[:, None]
            t_cont = normalized_time
            for i, feat in enumerate([self.time_embed_dim, self.time_embed_dim]):
                t_cont = nn.Dense(feat, name=f"cont_time_fc{i + 1}")(t_cont)
                t_cont = jax.nn.silu(t_cont)
            t_cont = nn.Dense(self.hidden_dim, name="cont_time_fc3")(t_cont)
            time_scale = self.param("time_scale", nn.initializers.ones, (1,))
            t_emb = t_sin + time_scale * t_cont
            # Annealed output scaling 1/sqrt(t) (reference :137).
            time_weight = jnp.sqrt(1.0 / (1e-5 + time))[:, None]
        else:
            t_emb = time_embed(time)
            time_weight = None

        # --- Observation conditioning (reference :49-59,144-149) ---
        if observation is not None:
            h_obs = observation
            h_obs = nn.Dense(self.hidden_dim, name="obs_fc1")(h_obs)
            h_obs = nn.LayerNorm(name="obs_ln1")(h_obs)
            h_obs = jax.nn.silu(h_obs)
            h_obs = nn.Dropout(self.dropout_rate, deterministic=not train)(h_obs)
            h_obs = nn.Dense(self.hidden_dim, name="obs_fc2")(h_obs)
            h_obs = nn.LayerNorm(name="obs_ln2")(h_obs)
            h_obs = jax.nn.silu(h_obs)
            h_obs = nn.Dense(self.hidden_dim, name="obs_fc3")(h_obs)
            obs_emb = nn.LayerNorm(name="obs_ln3")(h_obs)
        else:
            obs_emb = jnp.zeros((batch_size, self.hidden_dim), dtype=z_t.dtype)

        conditioning = t_emb + obs_emb

        # --- Latent trunk ---
        h = nn.Dense(self.hidden_dim, name="latent_proj")(z_t)
        if self.use_attention:
            for i in range(self.num_layers):
                h = DiTBlock(self.hidden_dim, name=f"block_{i}")(h, conditioning)

        h = AdaptiveLayerNorm(self.hidden_dim, name="norm_final")(h, conditioning)
        h = nn.Dense(self.hidden_dim // 2, name="out_fc1")(h)
        h = jax.nn.silu(h)
        # Final layer zero-initialized, no bias (reference :92-99).
        score = nn.Dense(
            self.latent_dim,
            use_bias=False,
            kernel_init=nn.initializers.zeros,
            name="out_fc2",
        )(h)
        score = jnp.clip(score, -10.0, 10.0)
        output_multiplier = self.param(
            "output_multiplier",
            lambda key, shape: jnp.full(shape, self.output_scale),
            (1,),
        )
        score = score * output_multiplier
        if continuous:
            score = score * time_weight
        return score
