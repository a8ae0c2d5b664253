"""Host-side Gymnasium wrappers.

Counterparts of the reference's wrappers
(reference: active_inference_diffusion/envs/wrappers.py:11-66). These are thin
host-side adapters; the equivalent pure functions for on-device envs live in
``jax_envs.py``.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import gymnasium as gym
import numpy as np
from gymnasium.spaces import Box


class NormalizeObservation(gym.ObservationWrapper):
    """Affine-normalize bounded observations to [-1, 1]
    (reference: envs/wrappers.py:11-45)."""

    def __init__(self, env: gym.Env):
        super().__init__(env)
        low = self.observation_space.low
        high = self.observation_space.high
        bounded = np.isfinite(low).all() and np.isfinite(high).all()
        if bounded:
            self.loc = (low + high) / 2.0
            self.scale = (high - low) / 2.0
        else:
            self.loc = np.zeros(self.observation_space.shape)
            self.scale = np.ones(self.observation_space.shape)
        self.observation_space = Box(
            low=-1.0, high=1.0, shape=self.observation_space.shape, dtype=np.float32
        )

    def observation(self, obs: np.ndarray) -> np.ndarray:
        return ((obs - self.loc) / (self.scale + 1e-8)).astype(np.float32)


class ActionRepeat(gym.Wrapper):
    """Frame-skip with reward summation (reference: envs/wrappers.py:48-66)."""

    def __init__(self, env: gym.Env, repeat: int = 1):
        super().__init__(env)
        self.repeat = repeat

    def step(self, action: np.ndarray) -> Tuple[Any, float, bool, bool, Dict]:
        total_reward = 0.0
        obs, reward, terminated, truncated, info = None, 0.0, False, False, {}
        for _ in range(self.repeat):
            obs, reward, terminated, truncated, info = self.env.step(action)
            total_reward += reward
            if terminated or truncated:
                break
        return obs, total_reward, terminated, truncated, info


def make_state_env(
    env_name: str,
    seed: int | None = None,
    action_repeat: int = 2,
    normalize_obs: bool = True,
) -> gym.Env:
    """State-observation env factory matching the reference entry point's
    setup (reference: examples/train_mujoco.py:41-70)."""
    env = gym.make(env_name)
    if seed is not None:
        env.reset(seed=seed)
        env.action_space.seed(seed)
    if normalize_obs:
        env = NormalizeObservation(env)
    if action_repeat > 1:
        env = ActionRepeat(env, repeat=action_repeat)
    return env
