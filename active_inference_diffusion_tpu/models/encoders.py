"""Visual and state encoders, conv decoder, and attention aggregators.

TPU-native counterparts of the reference's encoder stack
(reference: active_inference_diffusion/encoder/visual_encoders.py,
encoder/state_encoders.py, utils/util.py:7-75).

Design notes:

- All image tensors use **NHWC** layout internally (TPU-native; XLA convs are
  fastest channels-last). ``nchw_to_nhwc`` / ``nhwc_to_nchw`` adapt external
  NCHW data (the reference is NCHW throughout).
- PixelShuffle upsampling is expressed as a depth-to-space reshape
  (reference: visual_encoders.py:399 uses nn.PixelShuffle).
- Spectral normalization (the reference wraps convs in
  nn.utils.spectral_norm, visual_encoders.py:70-71) is implemented
  STATELESSLY (``spectral_normalize``/``SNConv``): power iteration restarts
  from a fixed vector each forward instead of carrying torch-style u/v
  buffers, so params stay a plain pytree and apply stays pure. Defaults off
  (deviation, DEVIATIONS.md); enable via
  ``ActiveInferenceConfig.use_spectral_norm``.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .common import mish


def spectral_normalize(
    kernel: jnp.ndarray, num_iters: int = 5, eps: float = 1e-6
) -> jnp.ndarray:
    """Divide a weight tensor by its leading singular value.

    TPU-native form of torch's ``nn.utils.spectral_norm`` (reference:
    encoder/visual_encoders.py:70-71): instead of mutable u/v buffers updated
    once per forward, run ``num_iters`` power-iteration steps from a fixed
    deterministic start each call. The matvecs are tiny relative to the conv
    itself, and the result is a pure function of the kernel — jit/grad/vmap
    compose with no state threading.
    """
    w = kernel.reshape(-1, kernel.shape[-1])  # (fan_in, out)
    v0 = jnp.full((w.shape[0],), 1.0 / jnp.sqrt(jnp.float32(w.shape[0])), w.dtype)

    def body(v, _):
        u = w.T @ v
        u = u / (jnp.linalg.norm(u) + eps)
        v = w @ u
        v = v / (jnp.linalg.norm(v) + eps)
        return v, u

    v, us = jax.lax.scan(body, v0, None, length=num_iters)
    sigma = v @ (w @ us[-1])
    return kernel / jnp.maximum(sigma, eps)


class SNConv(nn.Module):
    """2D conv with stateless spectral normalization of the kernel.

    Drop-in for the ``nn.Conv`` call sites in this file (same param names
    ``kernel``/``bias``, same int-padding convention), used when
    ``use_spectral_norm`` is set. NHWC only.
    """

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Any = 0
    use_bias: bool = True
    kernel_init: Callable = nn.initializers.lecun_normal()
    sn_iters: int = 5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel", self.kernel_init, (kh, kw, x.shape[-1], self.features)
        )
        kernel = spectral_normalize(kernel, self.sn_iters)
        pad = self.padding
        if isinstance(pad, int):
            pad = ((pad, pad), (pad, pad))
        y = jax.lax.conv_general_dilated(
            x,
            kernel,
            window_strides=tuple(self.strides),
            padding=pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias
        return y


def conv_cls(use_spectral_norm: bool):
    """nn.Conv, or its spectrally-normalized drop-in."""
    return SNConv if use_spectral_norm else nn.Conv


def nchw_to_nhwc(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.moveaxis(x, -3, -1)


def nhwc_to_nchw(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.moveaxis(x, -1, -3)


def depth_to_space(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """PixelShuffle: (B, H, W, C*r*r) -> (B, H*r, W*r, C)."""
    b, h, w, c = x.shape
    c_out = c // (r * r)
    x = x.reshape(b, h, w, r, r, c_out)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h * r, w * r, c_out)


class SpatialAttention(nn.Module):
    """Avg+max pooled spatial attention with learnable temperature and residual
    (reference: encoder/visual_encoders.py:192-225). NHWC."""

    channels: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        avg_pool = jnp.mean(x, axis=-1, keepdims=True)
        max_pool = jnp.max(x, axis=-1, keepdims=True)
        pooled = jnp.concatenate([avg_pool, max_pool], axis=-1)
        attn = nn.Conv(1, (7, 7), padding=3, name="spatial_conv")(pooled)
        temperature = self.param("temperature", nn.initializers.ones, (1,))
        attn = jax.nn.sigmoid(attn / temperature)
        return x + x * attn  # residual (reference :224-225)


class DrQV2Encoder(nn.Module):
    """DrQ-v2-style conv encoder with GroupNorm, Mish, progressive channel
    dropout, optional spatial attention, and a tanh-projected feature head
    (reference: encoder/visual_encoders.py:13-189). Input NHWC in [0, 1]."""

    obs_shape: Tuple[int, int, int]  # (C, H, W) as in the reference config
    feature_dim: int = 50
    frame_stack: int = 1
    num_layers: int = 4
    num_filters: int = 32
    use_attention: bool = True
    use_spectral_norm: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        c, _, _ = self.obs_shape
        input_channels = c * self.frame_stack
        if x.ndim == 3:
            x = x[None]
        if x.shape[-1] != input_channels and x.shape[-3] == input_channels:
            # Accept NCHW input for reference-API compatibility.
            x = nchw_to_nhwc(x)
        if x.dtype == jnp.uint8:
            x = x.astype(jnp.float32) / 255.0

        conv = conv_cls(self.use_spectral_norm)
        channels = [self.num_filters * (2 ** min(i, 3)) for i in range(self.num_layers)]
        for i, ch in enumerate(channels):
            stride = 2 if i == 0 else 1
            x = conv(
                ch,
                (3, 3),
                strides=(stride, stride),
                padding=1,
                use_bias=False,
                kernel_init=nn.initializers.he_normal(),
                name=f"conv{i}",
            )(x)
            x = nn.GroupNorm(num_groups=min(32, ch // 4), name=f"gn{i}")(x)
            x = mish(x)
            if i < self.num_layers - 1:
                # Channel dropout (Dropout2d): zero whole feature maps.
                rate = 0.1 * (i / self.num_layers)
                x = nn.Dropout(
                    rate, broadcast_dims=(1, 2), deterministic=not train
                )(x)

        if self.use_attention:
            x = SpatialAttention(channels[-1], name="attention")(x)

        x = x.reshape(x.shape[0], -1)
        x = nn.LayerNorm(name="flat_ln")(x)
        x = nn.Dense(
            self.feature_dim * 2, kernel_init=nn.initializers.xavier_uniform(), name="proj_fc1"
        )(x)
        x = nn.LayerNorm(name="proj_ln")(x)
        x = mish(x)
        x = nn.Dropout(0.1, deterministic=not train)(x)
        x = nn.Dense(
            self.feature_dim, kernel_init=nn.initializers.xavier_uniform(), name="proj_fc2"
        )(x)
        x = nn.LayerNorm(name="out_ln")(x)
        return jnp.tanh(x)


class DecoderBlock(nn.Module):
    """Decoder block with optional sub-pixel upsampling, InstanceNorm, Mish,
    and a residual path (reference: encoder/visual_encoders.py:370-459). NHWC."""

    out_channels: int
    upsample: bool = False
    dropout_rate: float = 0.1
    use_spectral_norm: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        conv = conv_cls(self.use_spectral_norm)

        def instance_norm(h, name):
            return nn.GroupNorm(num_groups=h.shape[-1], name=name)(h)

        # Main path
        if self.upsample:
            h = conv(self.out_channels * 4, (3, 3), padding=1, name="main_conv1")(x)
            h = depth_to_space(h, 2)
        else:
            h = conv(self.out_channels, (3, 3), padding=1, name="main_conv1")(x)
        h = instance_norm(h, "main_in1")
        h = mish(h)
        h = nn.Dropout(self.dropout_rate, broadcast_dims=(1, 2), deterministic=not train)(h)
        h = conv(self.out_channels, (3, 3), padding=1, name="main_conv2")(h)
        h = instance_norm(h, "main_in2")

        # Residual path
        if x.shape[-1] != self.out_channels or self.upsample:
            if self.upsample:
                r = conv(self.out_channels * 4, (1, 1), name="res_conv")(x)
                r = depth_to_space(r, 2)
            else:
                r = conv(self.out_channels, (1, 1), name="res_conv")(x)
            r = instance_norm(r, "res_in")
        else:
            r = x
        return mish(h + r)


class ConvDecoder(nn.Module):
    """Latent -> image decoder with progressive sub-pixel upsampling
    (reference: encoder/visual_encoders.py:228-367). Output NHWC in [0, 1],
    spatial size = spatial_size * 4 (21 -> 84)."""

    latent_dim: int
    img_channels: int = 3
    hidden_dim: int = 256
    spatial_size: int = 21
    dropout_rate: float = 0.2
    use_spectral_norm: bool = False

    @nn.compact
    def __call__(self, latent: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        b = latent.shape[0]
        s = self.spatial_size
        h = nn.Dense(self.hidden_dim * 4, name="proj_fc1")(latent)
        h = nn.LayerNorm(name="proj_ln1")(h)
        h = mish(h)
        h = nn.Dropout(self.dropout_rate, deterministic=not train)(h)
        h = nn.Dense(self.hidden_dim * s * s, name="proj_fc2")(h)
        h = nn.LayerNorm(name="proj_ln2")(h)
        h = mish(h)
        h = h.reshape(b, s, s, self.hidden_dim)

        block = functools.partial(DecoderBlock, use_spectral_norm=self.use_spectral_norm)
        h = block(self.hidden_dim, upsample=False, name="block0")(h, train=train)
        h = block(self.hidden_dim // 2, upsample=True, name="block1")(h, train=train)
        h = block(self.hidden_dim // 4, upsample=True, name="block2")(h, train=train)
        h = block(self.hidden_dim // 8, upsample=False, name="block3")(h, train=train)

        h = nn.Conv(32, (3, 3), padding=1, name="out_conv1")(h)
        h = nn.GroupNorm(num_groups=32, name="out_in1")(h)
        h = mish(h)
        h = nn.Conv(32, (3, 3), padding=1, name="out_conv2")(h)
        h = nn.GroupNorm(num_groups=32, name="out_in2")(h)
        h = mish(h)
        h = nn.Conv(self.img_channels, (3, 3), padding=1, name="out_conv3")(h)
        return jax.nn.sigmoid(h)


class SpatialAttentionAggregator(nn.Module):
    """Learnable-query cross-attention over spatial conv features
    (reference: utils/util.py:7-75). Input NHWC; returns ((B, output_dim),
    attention weights)."""

    feature_dim: int = 128
    num_heads: int = 8
    spatial_dim: int = 21
    num_queries: int = 16
    output_dim: int = 256

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, *, train: bool = False
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        b, h, w, c = x.shape
        seq = x.reshape(b, h * w, c)

        pos = self.param(
            "pos_encoding",
            nn.initializers.normal(0.02),
            (1, self.spatial_dim * self.spatial_dim, self.feature_dim),
        )
        seq = seq + pos[:, : h * w, :]

        queries = self.param(
            "epistemic_queries",
            nn.initializers.normal(0.02),
            (1, self.num_queries, self.feature_dim),
        )
        queries = jnp.broadcast_to(queries, (b, self.num_queries, self.feature_dim))

        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads,
            dropout_rate=0.1,
            deterministic=not train,
            name="attention",
        )
        attended = attn(inputs_q=queries, inputs_k=seq, inputs_v=seq)

        flat = attended.reshape(b, -1)
        out = nn.Dense(512, name="out_fc1")(flat)
        out = nn.LayerNorm(name="out_ln")(out)
        out = nn.gelu(out)
        out = nn.Dense(self.output_dim, name="out_fc2")(out)
        return out, attended


class StateEncoder(nn.Module):
    """MLP state encoder with optional projection
    (reference: encoder/state_encoders.py:15-65)."""

    state_dim: int
    latent_dim: int
    hidden_dim: int = 256
    num_layers: int = 2
    use_projection: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if not (self.use_projection and self.state_dim != self.latent_dim):
            return x
        h = x
        for i in range(self.num_layers):
            h = nn.Dense(self.hidden_dim, name=f"fc{i}")(h)
            h = nn.LayerNorm(name=f"ln{i}")(h)
            h = nn.relu(h)
        h = nn.Dense(self.latent_dim, name="out")(h)
        return jnp.tanh(h)


class LatentPosteriorEncoder(nn.Module):
    """Amortized Gaussian posterior q(z|o) over the belief latent.

    No reference counterpart (extension; see DEVIATIONS.md "posterior-grounded
    beliefs"): the reference's score-matching target is the sweep's own output
    (self-referential — nothing grounds belief latents to observations,
    reference agents/state_agent.py:134-140 generates them under no_grad).
    This head gives the diffusion model an independently grounded target:
    z_post ~ N(mu(o), sigma(o)) is trained by reconstruction/reward/KL, and
    the score network learns to *sample* it, so the reverse sweep becomes an
    iterative approximation of a grounded posterior instead of of itself.
    """

    latent_dim: int
    hidden_dim: int = 256
    num_layers: int = 2
    logstd_min: float = -6.0
    logstd_max: float = 2.0

    @nn.compact
    def __call__(self, obs: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        h = obs
        for i in range(self.num_layers):
            h = nn.Dense(self.hidden_dim, name=f"fc{i}")(h)
            h = nn.LayerNorm(name=f"ln{i}")(h)
            h = jax.nn.silu(h)
        out = nn.Dense(2 * self.latent_dim, name="out")(h)
        mu, logstd = jnp.split(out, 2, axis=-1)
        logstd = jnp.clip(logstd, self.logstd_min, self.logstd_max)
        return mu, logstd


class MultiViewEncoder(nn.Module):
    """Per-camera DrQ-v2 encoders fused by concat/sum/attention
    (reference: encoder/state_encoders.py:68-153)."""

    camera_configs: Dict[str, Dict]
    feature_dim: int = 128
    frame_stack: int = 1
    fusion: str = "attention"  # concat | sum | attention

    @nn.compact
    def __call__(self, views: Dict[str, jnp.ndarray], *, train: bool = False) -> jnp.ndarray:
        features = []
        for cam_name, cfg in sorted(self.camera_configs.items()):
            if cam_name not in views:
                continue
            feat = DrQV2Encoder(
                obs_shape=(3, cfg["height"], cfg["width"]),
                feature_dim=self.feature_dim,
                frame_stack=self.frame_stack,
                name=f"enc_{cam_name}",
            )(views[cam_name], train=train)
            features.append(feat)
        if not features:
            raise ValueError("No valid camera observations provided")

        if self.fusion == "concat":
            fused = jnp.concatenate(features, axis=-1)
            h = nn.Dense(self.feature_dim * 2, name="fuse_fc1")(fused)
            h = nn.relu(h)
            h = nn.Dropout(0.2, deterministic=not train)(h)
            h = nn.Dense(self.feature_dim, name="fuse_fc2")(h)
            return jnp.tanh(h)
        if self.fusion == "sum":
            return sum(features) / len(features)
        # attention fusion
        stacked = jnp.stack(features, axis=1)  # (B, V, D)
        attended = nn.MultiHeadDotProductAttention(
            num_heads=4, deterministic=not train, name="fuse_attn"
        )(inputs_q=stacked, inputs_k=stacked, inputs_v=stacked)
        pooled = jnp.mean(attended, axis=1)
        return nn.LayerNorm(name="fuse_ln")(pooled)


class EncoderFactory:
    """Encoder dispatch (reference: encoder/state_encoders.py:156-200)."""

    @staticmethod
    def create_encoder(
        encoder_type: str,
        obs_shape: Tuple[int, ...],
        feature_dim: int,
        frame_stack: int = 1,
        **kwargs,
    ) -> nn.Module:
        if encoder_type == "drqv2":
            return DrQV2Encoder(
                obs_shape=obs_shape,
                feature_dim=feature_dim,
                frame_stack=frame_stack,
                **kwargs,
            )
        if encoder_type == "state":
            return StateEncoder(
                state_dim=obs_shape[0], latent_dim=feature_dim, **kwargs
            )
        if encoder_type == "multiview":
            return MultiViewEncoder(
                feature_dim=feature_dim, frame_stack=frame_stack, **kwargs
            )
        raise ValueError(f"Unknown encoder type: {encoder_type}")
