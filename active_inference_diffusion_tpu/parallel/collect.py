"""Batched data collection: host vec-envs stepped against jitted TPU inference.

TPU-native counterpart of the reference's ``GPUCentralizedCollector`` /
``AsyncGPUInference`` / ``ParallelDataCollector``
(reference: active_inference_diffusion/utils/async_collector.py:25-786,
envs/parallel_wrapper.py:262-508). The reference needs a daemon inference
thread, queues, hand-rolled futures, CUDA streams and timeout fallbacks
because env processes and the GPU compete; here the batched reverse-diffusion
+ policy program is a single jitted call whose dispatch is already
asynchronous (JAX returns control to the host while the device computes), so
the collector is a plain loop: act (device) -> step (host threads) -> replay
add (device, donated). Collection-time action selection is diffusion + policy
only, exactly like the reference collector (async_collector.py:508-528 skips
the EFE), with a truncated denoise sweep (num_steps=collect_diffusion_steps).
"""

from __future__ import annotations

import time
from collections import deque
from typing import Any, Callable, Dict, Optional

import jax
import numpy as np


class BatchedCollector:
    """Collect transitions from a vec env with batched device inference."""

    def __init__(
        self,
        vec_env,
        agent,
        replay_buffer,
        seed: int = 0,
        log_every: int = 100,
        random_until: int = 0,
        warm_start: bool = False,
    ):
        self.vec_env = vec_env
        self.agent = agent
        self.replay_buffer = replay_buffer
        self.num_envs = vec_env.num_envs
        self.log_every = log_every
        self.random_until = random_until
        # Warm-start partial denoising: thread each env's belief latent to the
        # next control step (reset to fresh noise on episode end); see
        # DiffusionStateAgent.act_warm.
        self.warm_start = warm_start
        self._belief_latents = None
        self._reset_mask = np.ones(self.num_envs, dtype=bool)

        self._rng = np.random.default_rng(seed)
        self._key = jax.random.PRNGKey(seed)
        self._obs, _ = vec_env.reset(seed=seed)
        self._episode_rewards = np.zeros(self.num_envs)
        self._episode_lengths = np.zeros(self.num_envs, dtype=np.int64)
        self.completed_episodes: deque = deque(maxlen=100)
        self.total_steps = 0
        self._step_times: deque = deque(maxlen=100)
        self._infer_times: deque = deque(maxlen=100)

    def _next_key(self) -> jax.Array:
        self._key, sub = jax.random.split(self._key)
        return sub

    def collect(
        self,
        state,
        num_steps: int,
        deterministic: bool = False,
        progress_callback: Optional[Callable[[Dict[str, float]], None]] = None,
    ) -> Dict[str, float]:
        """Collect ``num_steps`` vec-env steps (num_steps * num_envs
        transitions). ``state`` is the agent train state (used read-only)."""
        collected = 0
        t_start = time.perf_counter()
        while collected < num_steps:
            t0 = time.perf_counter()
            if self.total_steps < self.random_until:
                actions = self._rng.uniform(
                    -1.0, 1.0, size=(self.num_envs,) + self.vec_env.action_space.shape
                ).astype(np.float32)
            elif self.warm_start:
                import jax.numpy as jnp

                if self._belief_latents is None:
                    self._belief_latents = jnp.zeros(
                        (self.num_envs, self.agent.config.latent_dim), jnp.float32
                    )
                    self._reset_mask[:] = True
                actions, self._belief_latents = self.agent.act_warm(
                    state, self._obs, self._next_key(),
                    self._belief_latents, self._reset_mask,
                    deterministic=deterministic,
                )
                self._reset_mask[:] = False
                if not np.isfinite(actions).all():
                    actions = self._rng.uniform(
                        -1.0, 1.0, size=actions.shape
                    ).astype(np.float32)
            else:
                actions = self.agent.act(
                    state, self._obs, self._next_key(),
                    deterministic=deterministic, collect=True,
                )
                if not np.isfinite(actions).all():
                    # Random-action fallback (reference async_collector.py:181-184)
                    actions = self._rng.uniform(
                        -1.0, 1.0, size=actions.shape
                    ).astype(np.float32)
            t1 = time.perf_counter()

            next_obs, rewards, terminated, truncated, infos = self.vec_env.step(actions)
            dones = np.logical_or(terminated, truncated)
            if self.warm_start:
                # finished envs restart their belief from fresh noise
                self._reset_mask |= dones

            # The stored next_obs for finished episodes is the terminal
            # observation, not the auto-reset one.
            stored_next = next_obs.copy()
            for i, info in enumerate(infos):
                if dones[i] and "final_observation" in info:
                    stored_next[i] = info["final_observation"]

            self.replay_buffer.add_batch(
                self._obs, actions, rewards, stored_next, terminated
            )

            self._episode_rewards += rewards
            self._episode_lengths += 1
            for i in range(self.num_envs):
                if dones[i]:
                    self.completed_episodes.append(
                        (float(self._episode_rewards[i]), int(self._episode_lengths[i]))
                    )
                    self._episode_rewards[i] = 0.0
                    self._episode_lengths[i] = 0

            self._obs = next_obs
            collected += 1
            self.total_steps += self.num_envs
            t2 = time.perf_counter()
            self._infer_times.append(t1 - t0)
            self._step_times.append(t2 - t1)

            if progress_callback and collected % self.log_every == 0:
                progress_callback(self.performance_stats())

        elapsed = time.perf_counter() - t_start
        stats = self.performance_stats()
        stats["collect/steps_per_sec"] = num_steps * self.num_envs / max(elapsed, 1e-9)
        return stats

    def performance_stats(self) -> Dict[str, float]:
        """FPS/timing statistics (reference: async_collector.py:272-305)."""
        stats: Dict[str, float] = {
            "collect/total_env_steps": float(self.total_steps),
        }
        if self._infer_times:
            mean_infer = float(np.mean(self._infer_times))
            stats["collect/inference_time"] = mean_infer
            stats["collect/inference_fps"] = self.num_envs / max(mean_infer, 1e-9)
        if self._step_times:
            stats["collect/env_step_time"] = float(np.mean(self._step_times))
        if self.completed_episodes:
            rewards = [r for r, _ in self.completed_episodes]
            lengths = [l for _, l in self.completed_episodes]
            stats["collect/episode_reward_mean"] = float(np.mean(rewards))
            stats["collect/episode_reward_std"] = float(np.std(rewards))
            stats["collect/episode_length_mean"] = float(np.mean(lengths))
            stats["collect/num_episodes"] = float(len(self.completed_episodes))
        return stats


def create_collector(
    env_fn: Callable[[int], Callable[[], Any]],
    num_envs: int,
    agent,
    replay_buffer,
    backend: str = "thread",
    seed: int = 0,
    random_until: int = 0,
    warm_start: bool = False,
) -> BatchedCollector:
    """Factory mirroring the reference's ``create_gpu_collector`` /
    ``create_parallel_collector``
    (reference: utils/async_collector.py:690-739, envs/parallel_wrapper.py:530-572)."""
    from ..envs.vec_env import make_vec_env

    vec_env = make_vec_env(env_fn, num_envs, backend=backend)
    return BatchedCollector(
        vec_env, agent, replay_buffer, seed=seed, random_until=random_until,
        warm_start=warm_start,
    )
