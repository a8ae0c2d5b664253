"""Pixel-based diffusion active-inference agent.

TPU-native counterpart of the reference's ``DiffusionPixelAgent``
(reference: active_inference_diffusion/agents/pixel_agent.py:25-470).
Pipeline: uint8 frames -> random-shift augmentation (ops/shift_aug.py, one
batched gather instead of the reference's Python loop) -> DrQ-v2 conv encoder
(NHWC) -> diffusion latents -> policy; plus an uncertainty-weighted InfoNCE
contrastive loss aligning predicted next latents with next encoded features
(reference: pixel_agent.py:413-437).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..configs.config import (
    ActiveInferenceConfig,
    PixelObservationConfig,
    TrainingConfig,
)
from ..models.encoders import DrQV2Encoder
from ..ops.shift_aug import random_shift
from .state_agent import DiffusionStateAgent

Params = Dict[str, Any]


class DiffusionPixelAgent(DiffusionStateAgent):
    """Agent over stacked-frame pixel observations."""

    PARTITIONS = {
        # encoder + feature decoder live in the score optimizer
        # (reference: agents/pixel_agent.py:439-449)
        "score": ["score", "diffusion", "encoder", "feature_decoder"],
        "policy": ["policy"],
        "value": ["value"],
        "model": ["dynamics", "decoder", "reward", "continuation", "posterior"],
        "epistemic": ["epistemic"],
    }

    def __init__(
        self,
        obs_shape: Tuple[int, ...],
        action_dim: int,
        config: ActiveInferenceConfig,
        training_config: TrainingConfig,
        pixel_config: PixelObservationConfig,
    ):
        # obs_shape: (T, C, H, W) frame-stacked or (C, H, W)
        self.pixel_config = pixel_config
        # The reference's pixel agent hardcodes DrQV2 regardless of
        # encoder_type (reference agents/pixel_agent.py:85-91 vs the unused
        # EncoderFactory dispatch); we keep that behavior but fail loudly on
        # other values instead of silently ignoring the field. MultiView /
        # state encoders remain available standalone via
        # models.encoders.EncoderFactory for custom pipelines.
        if pixel_config.encoder_type != "drqv2":
            raise NotImplementedError(
                f"encoder_type={pixel_config.encoder_type!r}: the pixel agent "
                "drives the DrQV2 encoder (as the reference does); build "
                "other encoders via models.encoders.EncoderFactory"
            )
        if len(obs_shape) == 4:
            self.frame_stack, c, h, w = obs_shape
        else:
            c, h, w = obs_shape
            self.frame_stack = 1
        self.pixel_shape = (c, h, w)
        config.pixel_observation = True
        # Encoded features live in latent space; the score net conditions on
        # them (reference: pixel_agent.py:77-79).
        config.observation_dim = config.latent_dim

        self.encoder = DrQV2Encoder(
            obs_shape=self.pixel_shape,
            feature_dim=config.latent_dim,
            frame_stack=self.frame_stack,
            num_layers=4,
            num_filters=32,
            use_spectral_norm=config.use_spectral_norm,
        )

        # BaseAgent.__init__ builds the core (with pixel decoders) and
        # optimizers, then jits act/train_step via DiffusionStateAgent.
        super().__init__(
            observation_dim=config.latent_dim,
            action_dim=action_dim,
            config=config,
            training_config=training_config,
            pixel_shape=self.pixel_shape,
        )

    # -- construction ----------------------------------------------------

    def init_params(self, param_key: jax.Array, extra_key: jax.Array) -> Params:
        params = self.core.init_params(param_key)
        t, c = self.frame_stack, self.pixel_shape[0]
        h, w = self.pixel_shape[1], self.pixel_shape[2]
        dummy = jnp.zeros((1, h, w, t * c), jnp.float32)
        params["encoder"] = self.encoder.init(extra_key, dummy, train=False)["params"]
        return params

    # -- observation processing ------------------------------------------

    def _to_nhwc_float(self, obs: jnp.ndarray) -> jnp.ndarray:
        """(B,T,C,H,W) | (B,C',H,W) uint8/float -> (B,H,W,T*C) float in [0,1]
        (reference layout handling: pixel_agent.py:166-199, 216-254)."""
        if obs.ndim == 5:
            b, t, c, h, w = obs.shape
            obs = obs.reshape(b, t * c, h, w)
        elif obs.ndim == 4:
            pass
        elif obs.ndim == 3:
            obs = obs[None]
        else:
            raise ValueError(f"Unexpected observation shape: {obs.shape}")
        obs = jnp.moveaxis(obs, 1, -1)  # NCHW -> NHWC
        if obs.dtype == jnp.uint8:
            obs = obs.astype(jnp.float32) / 255.0
        return obs

    def _apply_encoder(
        self,
        params: Params,
        obs: jnp.ndarray,
        key: Optional[jax.Array],
        augment: bool,
        train: bool,
    ) -> jnp.ndarray:
        x = self._to_nhwc_float(obs)
        if augment and self.pixel_config.augmentation and key is not None:
            x = random_shift(x, key, pad=self.pixel_config.random_shift_pad)
        rngs = {"dropout": key} if (train and key is not None) else {}
        return self.encoder.apply(
            {"params": params["encoder"]}, x, train=train, rngs=rngs
        )

    def _epistemic_probe_chunk(self, batch_rows: int):
        # Sequentialize the MINE Jacobian probes through the ConvDecoder in
        # batch-size blocks: the fused vmap materializes ntk x samples x
        # batch x 84x84x64 conv activations (>4 GB/layer at batch 128),
        # which OOMs the 16 GB v5e; per-block jvp peaks at one decode.
        return batch_rows

    def _encode_batch(
        self,
        params: Params,
        batch: Dict[str, jnp.ndarray],
        key: jax.Array,
        train: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        k1, k2 = jax.random.split(key)
        enc_obs = self._apply_encoder(
            params, batch["observations"], k1, augment=train, train=train
        )
        enc_next = self._apply_encoder(
            params, batch["next_observations"], k2, augment=train, train=train
        )
        return enc_obs, enc_next

    # -- contrastive representation loss ---------------------------------

    def _extra_score_loss(
        self,
        params: Params,
        batch: Dict[str, jnp.ndarray],
        enc_obs: jnp.ndarray,
        enc_next_obs: jnp.ndarray,
        latents: jnp.ndarray,
        next_latents: jnp.ndarray,
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        """Temporal representation losses on the pixel latent.

        1. Uncertainty-weighted InfoNCE aligning predicted next latents with
           next encoded features (reference: pixel_agent.py:413-437).
        2. SPR-style forward regression ``||dyn(z_t, a) - sg(z_{t+1})||^2``
           with gradients into the encoder/posterior through ``z_t`` — the
           velocity pressure the round-5 probe showed was missing (the main
           dynamics loss stop-gradients both sides, and InfoNCE is winnable
           on position alone; docs/runs/pixel_probe_r5.json).
        """
        cfg = self.config
        pred_next, pred_logvar = self.core.predict_next_latent(
            params["dynamics"], latents, batch["actions"]
        )
        total = jnp.zeros(())
        info: Dict[str, jnp.ndarray] = {}
        if cfg.contrastive_weight:
            pred_std = jnp.exp(0.5 * pred_logvar)
            pred_norm = pred_next / (
                jnp.linalg.norm(pred_next, axis=-1, keepdims=True) + 1e-8
            )
            target_norm = enc_next_obs / (
                jnp.linalg.norm(enc_next_obs, axis=-1, keepdims=True) + 1e-8
            )
            uncertainty = 1.0 / (1.0 + jnp.mean(pred_std, axis=-1, keepdims=True))
            logits = (pred_norm @ target_norm.T) / 0.1
            weighted = logits * uncertainty
            labels = jnp.arange(latents.shape[0])
            log_probs = jax.nn.log_softmax(weighted, axis=-1)
            loss = -jnp.mean(log_probs[labels, labels])
            total = total + cfg.contrastive_weight * loss
            info["contrastive_loss"] = loss
        if cfg.latent_forward_weight:
            # Target: the next acting latent, stop-gradiented (it is anchored
            # to the observation by recon/KL, so no collapse route). Input
            # side carries gradients: z_t (posterior(enc(o_t))) must encode
            # everything that determines z_{t+1} — i.e. velocity.
            fwd = jnp.mean(
                (pred_next - jax.lax.stop_gradient(next_latents)) ** 2
            )
            total = total + cfg.latent_forward_weight * fwd
            info["latent_forward_loss"] = fwd
        return total, info

    # -- action selection -------------------------------------------------

    def _act_features(self, params, observation, key):
        """Acting featurization hook (used by _act_impl and the warm-start
        path): conv-encode pixels, no augmentation. The base
        state_agent._act_impl handles planning/noise/clipping."""
        return self._apply_encoder(params, observation, key, augment=False, train=False)

    def act(
        self,
        state,
        observation: np.ndarray,
        key: jax.Array,
        deterministic: bool = False,
        collect: bool = True,
    ) -> np.ndarray:
        obs = jnp.asarray(observation)
        if obs.ndim == len(self.pixel_shape) + (1 if self.frame_stack > 1 else 0):
            obs = obs[None]  # add batch dim
        num_steps = (
            self.training_config.collect_diffusion_steps if collect else None
        )
        return np.asarray(
            self._act(
                self._acting_params(state),
                key,
                obs,
                jnp.asarray(self.exploration_noise, jnp.float32),
                deterministic=deterministic,
                num_steps=num_steps,
            )
        )
