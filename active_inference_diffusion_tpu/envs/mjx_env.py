"""MJX (MuJoCo-in-JAX) environment adapter for the fused rollout path.

No reference counterpart (the reference steps host Gymnasium MuJoCo in worker
processes, examples/train_mujoco.py:41-70). When the ``mujoco-mjx`` package
is installed, this adapter exposes the MuJoCo locomotion tasks through the
same ``JaxEnv`` interface as ``jax_envs.py`` so physics runs on-device under
vmap/jit/scan via ``fused_collect``.

All Gymnasium ``-v4`` semantics — observation layout (including Humanoid's
376-dim full-body observation), reward terms (forward progress, healthy
bonus, control/contact costs), unhealthy-state termination, and per-task
reset noise — live in ``envs/mujoco_tasks.py`` as pure functions of physics
fields, cross-validated bit-for-bit against host Gymnasium on identical
``(qpos, qvel)`` states (tests/test_mujoco_tasks.py). This file only binds
them to MJX's data structures.

This container image has mujoco 3.10 but not the separate ``mujoco-mjx``
distribution, so the adapter raises a clear error at construction when MJX
is unavailable; the semantics layer itself is fully exercised by the host
cross-validation tests either way.
"""

from __future__ import annotations

import importlib.util
import os
from typing import Optional

import jax
import jax.numpy as jnp

from .jax_envs import EnvState, JaxEnv
from .mujoco_tasks import (
    MjPhysicsFields,
    MjTaskSpec,
    TASK_SPECS,
    observation_dim,
    reset_qpos_qvel,
    task_observation,
    task_reward,
    task_terminated,
)


def mjx_available() -> bool:
    return importlib.util.find_spec("mujoco.mjx") is not None or (
        importlib.util.find_spec("mujoco_mjx") is not None
    )


def gym_asset_path(xml_file: str) -> str:
    """Resolve a task XML from the installed Gymnasium assets (the exact
    models ``gym.make("<Task>-v4")`` loads)."""
    import gymnasium.envs.mujoco as gym_mujoco

    return os.path.join(os.path.dirname(gym_mujoco.__file__), "assets", xml_file)


class MJXEnv(JaxEnv):
    """Batched MuJoCo physics on TPU via MJX with exact Gymnasium -v4
    observation/reward/termination/reset semantics."""

    def __init__(self, env_name: str, spec: Optional[MjTaskSpec] = None):
        if not mjx_available():
            raise ImportError(
                "mujoco-mjx is not installed; MJXEnv needs the 'mujoco-mjx' "
                "package. Use envs.jax_envs for analytic on-device envs or "
                "the host vec-env path (envs/vec_env.py) for Gymnasium MuJoCo."
            )
        spec = spec or TASK_SPECS.get(env_name)
        if spec is None:
            raise ValueError(
                f"Unsupported MJX task {env_name}; have {sorted(TASK_SPECS)}"
            )

        import mujoco
        from mujoco import mjx

        self.spec = spec
        self.model = mujoco.MjModel.from_xml_path(gym_asset_path(spec.xml_file))
        self.mjx_model = mjx.put_model(self.model)
        self._mjx = mjx
        self.dt = float(self.model.opt.timestep * spec.frame_skip)
        self.model_timestep = float(self.model.opt.timestep)
        # gym MujocoEnv captures init state after the initial forward();
        # for these models that is (qpos0, zeros).
        self._init_qpos = jnp.asarray(self.model.qpos0, jnp.float32)
        self._init_qvel = jnp.zeros((self.model.nv,), jnp.float32)
        self._body_mass = jnp.asarray(self.model.body_mass, jnp.float32)
        self._torso_id = (
            int(mujoco.mj_name2id(self.model, mujoco.mjtObj.mjOBJ_BODY, "torso"))
            if spec.forward_from == "torso"
            else None
        )

        self.observation_dim = observation_dim(
            spec, self.model.nq, self.model.nv, self.model.nbody
        )
        self.action_dim = self.model.nu
        self.max_episode_steps = spec.max_episode_steps
        # Gymnasium's action space is Box(ctrlrange): Humanoid's is ±0.4,
        # not ±1 — leaving JaxEnv's ±1 default would pay ctrl_cost on the
        # unclamped action and present a different MDP than gym.make. Kept
        # PER-ACTUATOR (shape (nu,)): collapsing heterogeneous ranges to a
        # scalar would command narrow actuators outside their range (MuJoCo
        # clamps ctrl internally but task_reward's ctrl_cost is computed on
        # the unclamped action) — consumers map normalized actions through
        # ``scale_action``, which also honors asymmetric (low != -high)
        # ranges.
        ctrlrange = self.model.actuator_ctrlrange
        if ctrlrange.size and (ctrlrange[:, 1] > ctrlrange[:, 0]).all():
            self.action_low = jnp.asarray(ctrlrange[:, 0], jnp.float32)
            self.action_high = jnp.asarray(ctrlrange[:, 1], jnp.float32)

    # -- field extraction ------------------------------------------------

    def _fields(self, data) -> MjPhysicsFields:
        spec = self.spec
        need_body = spec.full_body_obs or spec.use_contact_forces or spec.standup
        return MjPhysicsFields(
            qpos=data.qpos,
            qvel=data.qvel,
            cinert=data.cinert if spec.full_body_obs else None,
            cvel=data.cvel if spec.full_body_obs else None,
            qfrc_actuator=data.qfrc_actuator if spec.full_body_obs else None,
            cfrc_ext=data.cfrc_ext if need_body else None,
            xipos=data.xipos if spec.forward_from == "com" else None,
            torso_xpos=(
                data.xpos[self._torso_id] if self._torso_id is not None else None
            ),
        )

    # -- JaxEnv interface ------------------------------------------------

    def reset(self, key: jax.Array) -> EnvState:
        noise_key, carry_key = jax.random.split(key)
        qpos, qvel = reset_qpos_qvel(
            self.spec, noise_key, self._init_qpos, self._init_qvel
        )
        data = self._mjx.make_data(self.mjx_model)
        data = data.replace(qpos=qpos, qvel=qvel)
        data = self._mjx.forward(self.mjx_model, data)
        obs = task_observation(self.spec, self._fields(data))
        return EnvState(
            physics=data,
            obs=obs,
            reward=jnp.zeros(()),
            done=jnp.zeros((), bool),
            step_count=jnp.zeros((), jnp.int32),
            key=carry_key,
            terminated=jnp.zeros((), bool),
        )

    def step(self, state: EnvState, action: jnp.ndarray) -> EnvState:
        data = state.physics
        fields_before = self._fields(data)
        # gym's do_simulation sets data.ctrl = action unclipped; MuJoCo clamps
        # to the actuator ctrlrange internally during the step.
        data = data.replace(ctrl=action)

        def physics_step(d, _):
            return self._mjx.step(self.mjx_model, d), None

        data, _ = jax.lax.scan(
            physics_step, data, None, length=self.spec.frame_skip
        )
        fields_after = self._fields(data)

        reward = task_reward(
            self.spec,
            fields_before,
            fields_after,
            action,
            self.dt,
            body_mass=self._body_mass,
            model_timestep=self.model_timestep,
        )
        terminated = task_terminated(self.spec, data.qpos, data.qvel)

        step_count = state.step_count + 1
        truncated = step_count >= self.max_episode_steps
        return state.replace(
            physics=data,
            obs=task_observation(self.spec, fields_after),
            reward=reward,
            done=terminated | truncated,
            terminated=terminated,
            step_count=step_count,
        )
