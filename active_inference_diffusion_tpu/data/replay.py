"""Replay buffers: HBM-resident ring buffer (device) and host uint8 buffer.

TPU-native counterpart of the reference's ``ReplayBuffer``
(reference: active_inference_diffusion/utils/buffers.py:12-142). Differences:

- ``DeviceReplayBuffer`` keeps all storage in HBM as a pytree; ``add_batch``
  is a jitted donated update (in-place on device) and ``sample`` draws indices
  on device — the training step never round-trips transitions through the host
  (the reference moves every batch host->device per step).
- Pixels are stored as uint8 in HBM (4x smaller than the reference's float32
  path for states; the reference's lz4-compressed pixel path has a crashing
  ``sample()``, buffers.py:92-97 — here uint8 storage + on-device /255 decode
  implements the intended behavior).
- ``HostReplayBuffer`` is the fallback for capacities that do not fit in HBM.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


class ReplayState(struct.PyTreeNode):
    observations: jnp.ndarray  # (N, *obs_shape)
    actions: jnp.ndarray  # (N, A)
    rewards: jnp.ndarray  # (N,)
    next_observations: jnp.ndarray  # (N, *obs_shape)
    dones: jnp.ndarray  # (N,)
    pos: jnp.ndarray  # scalar int32, next write index
    size: jnp.ndarray  # scalar int32, current fill


def replay_init(
    capacity: int,
    obs_shape: Tuple[int, ...],
    action_dim: int,
    obs_dtype=jnp.float32,
) -> ReplayState:
    return ReplayState(
        observations=jnp.zeros((capacity,) + tuple(obs_shape), obs_dtype),
        actions=jnp.zeros((capacity, action_dim), jnp.float32),
        rewards=jnp.zeros((capacity,), jnp.float32),
        next_observations=jnp.zeros((capacity,) + tuple(obs_shape), obs_dtype),
        dones=jnp.zeros((capacity,), jnp.bool_),
        pos=jnp.zeros((), jnp.int32),
        size=jnp.zeros((), jnp.int32),
    )


@functools.partial(jax.jit, donate_argnums=(0,))
def replay_add_batch(
    state: ReplayState,
    obs: jnp.ndarray,
    actions: jnp.ndarray,
    rewards: jnp.ndarray,
    next_obs: jnp.ndarray,
    dones: jnp.ndarray,
) -> ReplayState:
    """Insert a batch of transitions at the ring position (donated, in-place)."""
    n = obs.shape[0]
    capacity = state.observations.shape[0]
    idx = (state.pos + jnp.arange(n, dtype=jnp.int32)) % capacity
    return state.replace(
        observations=state.observations.at[idx].set(obs),
        actions=state.actions.at[idx].set(actions),
        rewards=state.rewards.at[idx].set(rewards),
        next_observations=state.next_observations.at[idx].set(next_obs),
        dones=state.dones.at[idx].set(dones),
        pos=(state.pos + n) % capacity,
        size=jnp.minimum(state.size + n, capacity),
    )


def replay_sample(
    state: ReplayState, key: jax.Array, batch_size: int
) -> Dict[str, jnp.ndarray]:
    """Uniform sample of ``batch_size`` transitions; decodes uint8 pixels to
    float in [0, 1] on device (reference buffers.py:83-111 intended behavior).
    Callable inside jit."""
    indices = jax.random.randint(key, (batch_size,), 0, jnp.maximum(state.size, 1))
    obs = state.observations[indices]
    next_obs = state.next_observations[indices]
    if obs.dtype == jnp.uint8:
        obs = obs.astype(jnp.float32) / 255.0
        next_obs = next_obs.astype(jnp.float32) / 255.0
    return {
        "observations": obs,
        "actions": state.actions[indices],
        "rewards": state.rewards[indices],
        "next_observations": next_obs,
        "dones": state.dones[indices],
    }


class DeviceReplayBuffer:
    """Thin stateful wrapper over the pure ReplayState transforms, matching the
    reference's ReplayBuffer API (add / sample / __len__)."""

    def __init__(
        self,
        capacity: int,
        obs_shape: Tuple[int, ...],
        action_dim: int,
        obs_dtype=jnp.float32,
    ):
        self.capacity = capacity
        self.state = replay_init(capacity, obs_shape, action_dim, obs_dtype)

    def add(self, obs, action, reward, next_obs, done):
        self.add_batch(
            np.asarray(obs)[None],
            np.asarray(action)[None],
            np.asarray([reward]),
            np.asarray(next_obs)[None],
            np.asarray([done]),
        )

    def add_batch(self, obs, actions, rewards, next_obs, dones):
        self.state = replay_add_batch(
            self.state,
            jnp.asarray(obs, self.state.observations.dtype),
            jnp.asarray(actions, jnp.float32),
            jnp.asarray(rewards, jnp.float32),
            jnp.asarray(next_obs, self.state.observations.dtype),
            jnp.asarray(dones, jnp.bool_),
        )

    def sample(self, key: jax.Array, batch_size: int) -> Dict[str, jnp.ndarray]:
        return replay_sample(self.state, key, batch_size)

    def __len__(self) -> int:
        return int(self.state.size)


def _sample_indices(
    rng: np.random.Generator, key, size: int, batch_size: int
) -> np.ndarray:
    """Uniform sample indices for host buffers, honoring the ``key`` argument
    with the same key discipline as ``DeviceReplayBuffer`` (same key -> same
    sample). Falls back to the buffer's own generator when ``key`` is None.

    ``key`` may be a host integer seed — the cheap path for per-update loops
    (a JAX key here costs a device->host readback per call, which dominates
    through a remote-TPU tunnel; cli.py derives one block of host seeds per
    training iteration instead)."""
    if key is None:
        return rng.integers(0, max(size, 1), batch_size)
    if isinstance(key, (int, np.integer)):
        rng = np.random.default_rng(int(key))
    else:
        data = np.asarray(
            jax.random.key_data(key)
            if jnp.issubdtype(jnp.asarray(key).dtype, jax.dtypes.prng_key)
            else key
        )
        rng = np.random.default_rng(data.astype(np.uint64).ravel())
    return rng.integers(0, max(size, 1), batch_size)


class HostReplayBuffer:
    """NumPy ring buffer for capacities beyond HBM (e.g. long pixel runs).

    Stores pixels as uint8 (the intended behavior of the reference's
    compressed path, buffers.py:33-42); ``sample`` returns device arrays.
    """

    def __init__(
        self,
        capacity: int,
        obs_shape: Tuple[int, ...],
        action_dim: int,
        obs_dtype=np.float32,
    ):
        self.capacity = capacity
        self.observations = np.zeros((capacity,) + tuple(obs_shape), obs_dtype)
        self.next_observations = np.zeros((capacity,) + tuple(obs_shape), obs_dtype)
        self.actions = np.zeros((capacity, action_dim), np.float32)
        self.rewards = np.zeros((capacity,), np.float32)
        self.dones = np.zeros((capacity,), bool)
        self.pos = 0
        self.size = 0
        # key=None fallback only; seeded from OS entropy so two buffers
        # don't replay identical index sequences. Deterministic sampling
        # comes from passing a key (see _sample_indices).
        self._rng = np.random.default_rng()

    def add(self, obs, action, reward, next_obs, done):
        self.add_batch(
            np.asarray(obs)[None], np.asarray(action)[None],
            np.asarray([reward]), np.asarray(next_obs)[None], np.asarray([done]),
        )

    def add_batch(self, obs, actions, rewards, next_obs, dones):
        n = len(obs)
        idx = (self.pos + np.arange(n)) % self.capacity
        self.observations[idx] = obs
        self.next_observations[idx] = next_obs
        self.actions[idx] = actions
        self.rewards[idx] = rewards
        self.dones[idx] = dones
        self.pos = int((self.pos + n) % self.capacity)
        self.size = int(min(self.size + n, self.capacity))

    def sample(self, key, batch_size: int) -> Dict[str, jnp.ndarray]:
        indices = _sample_indices(self._rng, key, self.size, batch_size)
        obs = self.observations[indices]
        next_obs = self.next_observations[indices]
        if obs.dtype == np.uint8:
            obs = obs.astype(np.float32) / 255.0
            next_obs = next_obs.astype(np.float32) / 255.0
        return {
            "observations": jnp.asarray(obs),
            "actions": jnp.asarray(self.actions[indices]),
            "rewards": jnp.asarray(self.rewards[indices]),
            "next_observations": jnp.asarray(next_obs),
            "dones": jnp.asarray(self.dones[indices]),
        }

    def __len__(self) -> int:
        return self.size


class CompressedReplayBuffer:
    """Pixel replay with per-item compressed storage (the reference's
    ``optimize_memory=True`` intent, utils/buffers.py:33-42,113-138 — whose
    ``sample()`` crashes as written). Uses the native LZ4-block codec
    (active_inference_diffusion_tpu/native) with zlib fallback."""

    def __init__(self, capacity: int, obs_shape: Tuple[int, ...], action_dim: int):
        self.capacity = capacity
        self.obs_shape = tuple(obs_shape)
        self.observations: list = [None] * capacity
        self.next_observations: list = [None] * capacity
        self.actions = np.zeros((capacity, action_dim), np.float32)
        self.rewards = np.zeros((capacity,), np.float32)
        self.dones = np.zeros((capacity,), bool)
        self.pos = 0
        self.size = 0
        self._rng = np.random.default_rng()  # key=None fallback only

        try:
            from ..native import (
                compress,
                decompress,
                decompress_batch,
                native_available,
            )

            if native_available():
                self._compress = compress
                self._decompress = lambda blob: decompress(blob, self.obs_shape)
                self._decompress_batch = lambda blobs: decompress_batch(
                    blobs, self.obs_shape
                )
            else:
                raise ImportError
        except Exception:
            import zlib

            self._compress = lambda a: zlib.compress(
                np.ascontiguousarray(a).tobytes(), 1
            )
            self._decompress = lambda blob: np.frombuffer(
                zlib.decompress(blob), np.uint8
            ).reshape(self.obs_shape)
            self._decompress_batch = lambda blobs: np.stack(
                [self._decompress(b) for b in blobs]
            )

    @staticmethod
    def _to_uint8(obs: np.ndarray) -> np.ndarray:
        obs = np.asarray(obs)
        if obs.dtype != np.uint8:
            if obs.max() <= 1.0:
                obs = (obs * 255).astype(np.uint8)
            else:
                obs = obs.astype(np.uint8)
        return obs

    def add(self, obs, action, reward, next_obs, done):
        i = self.pos
        self.observations[i] = self._compress(self._to_uint8(obs))
        self.next_observations[i] = self._compress(self._to_uint8(next_obs))
        self.actions[i] = action
        self.rewards[i] = reward
        self.dones[i] = bool(done)
        self.pos = (self.pos + 1) % self.capacity
        self.size = min(self.size + 1, self.capacity)

    def add_batch(self, obs, actions, rewards, next_obs, dones):
        for i in range(len(obs)):
            self.add(obs[i], actions[i], rewards[i], next_obs[i], dones[i])

    def sample(self, key, batch_size: int) -> Dict[str, jnp.ndarray]:
        indices = _sample_indices(self._rng, key, self.size, batch_size)
        # One native call decodes the whole batch into a contiguous array
        # (native.decompress_batch) — no per-item ctypes round trips/stack.
        obs = self._decompress_batch(
            [self.observations[i] for i in indices]
        ).astype(np.float32) / 255.0
        next_obs = self._decompress_batch(
            [self.next_observations[i] for i in indices]
        ).astype(np.float32) / 255.0
        return {
            "observations": jnp.asarray(obs),
            "actions": jnp.asarray(self.actions[indices]),
            "rewards": jnp.asarray(self.rewards[indices]),
            "next_observations": jnp.asarray(next_obs),
            "dones": jnp.asarray(self.dones[indices]),
        }

    def __len__(self) -> int:
        return self.size
