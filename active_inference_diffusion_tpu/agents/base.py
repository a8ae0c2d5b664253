"""Agent base: train state pytree, optimizer partitions, reward normalization.

TPU-native counterpart of the reference's ``BaseActiveInferenceAgent``
(reference: active_inference_diffusion/agents/base_agent.py:24-185). The agent
object is a thin host-side shell; all training state is an explicit pytree
(``AgentTrainState``) and every update is a pure jitted function.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..configs.config import ActiveInferenceConfig, TrainingConfig
from ..core.active_inference import DiffusionActiveInference
from ..core.time_sampler import init_time_importance
from ..models.ema import init_ema

Params = Dict[str, Any]


class RewardNormState(struct.PyTreeNode):
    """Welford-merged running mean/variance of rewards
    (reference: agents/base_agent.py:24-52, RunningMeanStd)."""

    mean: jnp.ndarray
    var: jnp.ndarray
    count: jnp.ndarray

    @classmethod
    def create(cls, epsilon: float = 1e-4) -> "RewardNormState":
        return cls(
            # explicit dtypes: weak-typed scalars would change avals after the
            # first update and force a one-off recompile of the train step
            mean=jnp.zeros((), jnp.float32),
            var=jnp.ones((), jnp.float32),
            count=jnp.asarray(epsilon, jnp.float32),
        )

    def update(self, x: jnp.ndarray) -> "RewardNormState":
        batch_mean = jnp.mean(x)
        batch_var = jnp.var(x)
        batch_count = jnp.asarray(x.shape[0], self.count.dtype)
        delta = batch_mean - self.mean
        tot = self.count + batch_count
        new_mean = self.mean + delta * batch_count / tot
        m_a = self.var * self.count
        m_b = batch_var * batch_count
        m2 = m_a + m_b + delta**2 * self.count * batch_count / tot
        return RewardNormState(mean=new_mean, var=m2 / tot, count=tot)

    def normalize(self, x: jnp.ndarray) -> jnp.ndarray:
        return (x - self.mean) / jnp.sqrt(self.var + 1e-8)


class AgentTrainState(struct.PyTreeNode):
    """All mutable agent state as one pytree (checkpointable, donat-able)."""

    step: jnp.ndarray  # scalar int32
    params: Params
    opt_states: Dict[str, Any]
    ema_score: Any  # EMA shadow of params['score'] (reference base_agent.py:73-77)
    # EMA shadow of params['value'] ("slow critic", Dreamer-style): the
    # imagined-lambda bootstrap reads this instead of the live critic so the
    # actor cannot chase its own critic updates (extension; the reference
    # bootstraps from the live value net, agents/state_agent.py:195-204).
    target_value: Any
    # EMA of the imagined-return 5th-95th percentile range (Dreamer-v3
    # return normalization; advances only with imagined_value_targets).
    return_scale: jnp.ndarray
    # log of the SAC-style auto-tuned entropy coefficient (used only with
    # auto_entropy; init log(imagined_entropy_scale)).
    log_alpha: jnp.ndarray
    time_importance: jnp.ndarray  # (100,) loss-aware time-sampling weights
    epistemic_running_mean: jnp.ndarray  # MINE EMA state
    reward_norm: RewardNormState
    preference_temperature: jnp.ndarray
    rng: jax.Array
    # Polyak average of params['policy'] (late-run drift stabilizer; see
    # ActiveInferenceConfig.policy_anchor_weight). None when both anchor
    # and act_with_policy_ema are off — the empty pytree keeps old
    # checkpoints structurally compatible.
    ema_policy: Any = None


def make_optimizers(
    config: ActiveInferenceConfig, partitions: Dict[str, List[str]]
) -> Dict[str, optax.GradientTransformation]:
    """Build one optimizer per parameter-group partition, mirroring the
    reference's four AdamW optimizers + epistemic Adam
    (reference: agents/state_agent.py:245-274, base_agent.py:134-139)."""
    lr = config.learning_rate
    clip = config.gradient_clip
    opts: Dict[str, optax.GradientTransformation] = {}
    for name in partitions:
        if name == "score":
            opts[name] = optax.chain(
                optax.clip_by_global_norm(clip),
                optax.adamw(lr, weight_decay=1e-5),
            )
        elif name == "policy":
            # policy_lr_scale < 1 lets the world model out-pace the actor —
            # a standard guard against the actor racing ahead of (and then
            # exploiting) a still-moving model. policy_lr_decay_steps
            # additionally anneals the actor (cosine) so late-run
            # actor-dynamics limit cycles settle into a plateau.
            plr = lr * config.policy_lr_scale
            if config.policy_lr_decay_steps:
                plr = optax.cosine_decay_schedule(
                    init_value=plr,
                    decay_steps=config.policy_lr_decay_steps,
                    alpha=config.policy_lr_final_scale,
                )
            opts[name] = optax.chain(
                optax.clip_by_global_norm(clip),
                optax.adamw(plr, weight_decay=1e-5),
            )
        elif name == "epistemic":
            opts[name] = optax.chain(
                optax.clip_by_global_norm(clip),
                optax.adamw(lr * 0.1, weight_decay=1e-5),
            )
        else:  # value, model
            opts[name] = optax.chain(
                optax.clip_by_global_norm(clip),
                optax.adamw(lr, weight_decay=0.0),
            )
    return opts


def subset(params: Params, keys: List[str]) -> Params:
    return {k: params[k] for k in keys}


def merged(params: Params, sub: Params) -> Params:
    out = dict(params)
    out.update(sub)
    return out


class BaseAgent:
    """Host-side shell shared by state and pixel agents."""

    # Parameter groups per optimizer; subclasses override.
    PARTITIONS: Dict[str, List[str]] = {}

    def __init__(
        self,
        observation_dim: int,
        action_dim: int,
        config: ActiveInferenceConfig,
        training_config: TrainingConfig,
        pixel_shape: Optional[Tuple[int, int, int]] = None,
    ):
        self.config = config
        self.training_config = training_config
        self.observation_dim = observation_dim
        self.action_dim = action_dim

        self.core = DiffusionActiveInference(
            observation_dim=observation_dim,
            action_dim=action_dim,
            latent_dim=config.latent_dim,
            config=config,
            pixel_shape=pixel_shape,
        )
        self.optimizers = make_optimizers(config, self.PARTITIONS)

        # Host-side exploration schedule (reference base_agent.py:173-179)
        self.exploration_noise = training_config.exploration_noise
        self.total_steps = 0
        self.episode_count = 0

        # Fused sample+train epoch: ONE device dispatch for a whole block of
        # updates (the reference's loop pays a host round trip per update;
        # through a remote TPU that round trip dominates wall-clock).
        self._train_epoch = jax.jit(
            self._train_epoch_impl,
            static_argnums=(3,),
            donate_argnums=(0,) if config.tpu.donate_buffers else (),
        )

    def _train_epoch_impl(self, state, replay_state, key, num_updates: int):
        from ..data.replay import replay_sample

        batch_size = self.config.batch_size

        def body(st, k):
            sample_key = jax.random.fold_in(k, 0)
            batch = replay_sample(replay_state, sample_key, batch_size)
            st, metrics = self._train_step_impl(st, batch)
            return st, metrics

        keys = jax.random.split(key, num_updates)
        state, metrics = jax.lax.scan(body, state, keys)
        return state, jax.tree_util.tree_map(jnp.mean, metrics)

    def train_epoch(self, state, replay_state, key, num_updates: int):
        """Run ``num_updates`` (sample -> train_step) updates as jitted
        ``lax.scan`` dispatches over an HBM-resident replay state. Returns
        (new_state, mean-metrics). Only valid for device replay buffers.

        The block is split into near-equal chunks of at most
        ``training_config.epoch_chunk_updates`` so that no single device
        execution runs for minutes: a 1008-update pixel epoch in one scan is
        a multi-minute blocking program, which the remote TPU worker kills
        ("TPU worker process crashed or restarted"). Chunks are equal-sized
        whenever ``num_updates`` divides evenly, so at most two scan lengths
        ever compile. Metrics stay on device (weighted mean across chunks);
        no host sync happens here.
        """
        max_chunk = getattr(self.training_config, "epoch_chunk_updates", 0)
        if not max_chunk or num_updates <= max_chunk:
            sizes = [num_updates]
        else:
            n_chunks = -(-num_updates // max_chunk)
            base = num_updates // n_chunks
            rem = num_updates - base * n_chunks
            sizes = [base + 1] * rem + [base] * (n_chunks - rem)
        metrics_sum = None
        for sz in sizes:
            key, sub = jax.random.split(key)
            state, metrics = self._train_epoch(state, replay_state, sub, sz)
            weighted = jax.tree_util.tree_map(lambda m: m * sz, metrics)
            metrics_sum = (
                weighted
                if metrics_sum is None
                else jax.tree_util.tree_map(jnp.add, metrics_sum, weighted)
            )
        self.total_steps += num_updates
        return state, jax.tree_util.tree_map(
            lambda m: m / num_updates, metrics_sum
        )

    # -- state ----------------------------------------------------------

    def init_train_state(self, key: jax.Array) -> AgentTrainState:
        param_key, extra_key, state_rng = jax.random.split(key, 3)
        params = self.init_params(param_key, extra_key)
        opt_states = {
            name: self.optimizers[name].init(subset(params, self.PARTITIONS[name]))
            for name in self.optimizers
        }
        return AgentTrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_states=opt_states,
            ema_score=init_ema(params["score"]),
            target_value=init_ema(params["value"]),
            return_scale=jnp.ones((), jnp.float32),
            log_alpha=jnp.log(
                jnp.asarray(self.config.imagined_entropy_scale, jnp.float32)
            ),
            time_importance=init_time_importance(),
            epistemic_running_mean=jnp.zeros((), jnp.float32),
            reward_norm=RewardNormState.create(),
            preference_temperature=jnp.asarray(
                self.config.preference_temperature, jnp.float32
            ),
            rng=state_rng,
            ema_policy=(
                init_ema(params["policy"])
                if (
                    self.config.policy_anchor_weight > 0
                    or self.config.act_with_policy_ema
                )
                else None
            ),
        )

    def init_params(self, param_key: jax.Array, extra_key: jax.Array) -> Params:
        return self.core.init_params(param_key)

    # -- exploration (reference base_agent.py:173-179) -------------------

    def update_exploration(self):
        self.exploration_noise = max(
            self.exploration_noise * self.training_config.exploration_decay,
            self.training_config.min_exploration,
        )
