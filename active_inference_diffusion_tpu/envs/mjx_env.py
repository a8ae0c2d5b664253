"""MJX (MuJoCo-in-JAX) environment adapter for the fused rollout path.

No reference counterpart (the reference steps host Gymnasium MuJoCo in worker
processes). When the ``mujoco-mjx`` package is installed, this adapter exposes
MuJoCo tasks through the same ``JaxEnv`` interface as ``jax_envs.py`` so
physics runs on-device under vmap/jit/scan via ``fused_collect``.

This container image has mujoco but not mujoco-mjx; the adapter raises a
clear error at construction when MJX is unavailable and is exercised by a
skipif-guarded test. The observation/reward construction below follows the
Gymnasium ``-v4`` state tasks (qpos[1:] ++ qvel observations for the
2D runners, forward-progress + ctrl-cost rewards).
"""

from __future__ import annotations

import importlib.util
from typing import Optional

import jax
import jax.numpy as jnp

from .jax_envs import EnvState, JaxEnv


def mjx_available() -> bool:
    return importlib.util.find_spec("mujoco.mjx") is not None or (
        importlib.util.find_spec("mujoco_mjx") is not None
    )


# Gymnasium -v4 task metadata: (xml asset, frame_skip, ctrl cost weight,
# forward reward weight, exclude-root-x from obs)
_TASKS = {
    "HalfCheetah-v4": ("half_cheetah.xml", 5, 0.1, 1.0, True),
    "Hopper-v4": ("hopper.xml", 4, 1e-3, 1.0, True),
    "Walker2d-v4": ("walker2d.xml", 4, 1e-3, 1.0, True),
    "Ant-v4": ("ant.xml", 5, 0.5, 1.0, True),
    "Humanoid-v4": ("humanoid.xml", 5, 0.1, 1.25, True),
}


class MJXEnv(JaxEnv):
    """Batched MuJoCo physics on TPU via MJX, matching Gymnasium -v4 obs and
    reward structure for the locomotion tasks."""

    def __init__(self, env_name: str, reset_noise_scale: float = 0.1):
        if not mjx_available():
            raise ImportError(
                "mujoco-mjx is not installed; MJXEnv needs the 'mujoco-mjx' "
                "package. Use envs.jax_envs for analytic on-device envs or "
                "the host vec-env path (envs/vec_env.py) for Gymnasium MuJoCo."
            )
        if env_name not in _TASKS:
            raise ValueError(f"Unsupported MJX task {env_name}; have {sorted(_TASKS)}")

        import mujoco
        from mujoco import mjx

        xml, frame_skip, ctrl_cost, fwd_weight, exclude_x = _TASKS[env_name]
        import gymnasium.envs.mujoco as gym_mujoco
        import os

        asset_path = os.path.join(os.path.dirname(gym_mujoco.__file__), "assets", xml)
        self.model = mujoco.MjModel.from_xml_path(asset_path)
        self.mjx_model = mjx.put_model(self.model)
        self._mjx = mjx
        self.frame_skip = frame_skip
        self.ctrl_cost_weight = ctrl_cost
        self.forward_reward_weight = fwd_weight
        self.exclude_root_x = exclude_x
        self.reset_noise_scale = reset_noise_scale
        self.dt = self.model.opt.timestep * frame_skip

        nq, nv = self.model.nq, self.model.nv
        self.observation_dim = (nq - 1 if exclude_x else nq) + nv
        self.action_dim = self.model.nu
        self.max_episode_steps = 1000

    def _obs_from_data(self, data):
        qpos = data.qpos[1:] if self.exclude_root_x else data.qpos
        return jnp.concatenate([qpos, data.qvel])

    def reset(self, key: jax.Array) -> EnvState:
        k1, k2, carry_key = jax.random.split(key, 3)
        data = self._mjx.make_data(self.mjx_model)
        noise = self.reset_noise_scale
        qpos = self.model.qpos0 + jax.random.uniform(
            k1, (self.model.nq,), minval=-noise, maxval=noise
        )
        qvel = noise * jax.random.normal(k2, (self.model.nv,))
        data = data.replace(qpos=qpos, qvel=qvel)
        data = self._mjx.forward(self.mjx_model, data)
        obs = self._obs_from_data(data)
        return EnvState(
            physics=data,  # MJX data pytree
            obs=obs,
            reward=jnp.zeros(()),
            done=jnp.zeros((), bool),
            step_count=jnp.zeros((), jnp.int32),
            key=carry_key,
        )

    def step(self, state: EnvState, action: jnp.ndarray) -> EnvState:
        data = state.physics
        x_before = data.qpos[0]
        data = data.replace(ctrl=jnp.clip(action, -1.0, 1.0))

        def physics_step(d, _):
            return self._mjx.step(self.mjx_model, d), None

        data, _ = jax.lax.scan(physics_step, data, None, length=self.frame_skip)
        x_after = data.qpos[0]

        forward_reward = (
            self.forward_reward_weight * (x_after - x_before) / self.dt
        )
        ctrl_cost = self.ctrl_cost_weight * jnp.sum(jnp.square(action))
        reward = forward_reward - ctrl_cost

        step_count = state.step_count + 1
        done = step_count >= self.max_episode_steps
        return state.replace(
            physics=data,
            obs=self._obs_from_data(data),
            reward=reward,
            done=done,
            step_count=step_count,
        )
