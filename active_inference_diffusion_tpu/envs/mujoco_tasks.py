"""Gymnasium MuJoCo ``-v4`` task semantics as pure JAX functions.

The reference trains on ``gym.make("<Task>-v4")`` environments
(reference examples/train_mujoco.py:41-70), whose semantics — observation
layout, reward terms (forward progress, healthy/alive bonus, control and
contact costs), termination (unhealthy-state ranges), and per-task reset
noise — live inside Gymnasium's host-side env classes. For the fused
on-device rollout path those semantics must be pure, batched, jittable
functions of the physics state; this module provides exactly that layer,
separated from any particular physics backend:

- ``MJXEnv`` (envs/mjx_env.py) applies them to MJX data on-device when
  ``mujoco-mjx`` is installed.
- The cross-validation tests (tests/test_mujoco_tasks.py) apply them to
  fields extracted from *host* MuJoCo on identical ``(qpos, qvel)`` states
  and assert exact agreement with Gymnasium's own obs/reward/terminated
  outputs — validating the semantics independently of the physics engine.

Semantics were derived from the installed ``gymnasium`` 1.2 sources
(``gymnasium/envs/mujoco/{half_cheetah,hopper,walker2d,ant,humanoid,
humanoidstandup}_v4.py``) — the exact classes ``gym.make`` hands the
reference — not from the reference repo.

Per-task facts captured here (all ``-v4``):

========================  =====================================================
HalfCheetah               obs qpos[1:]+qvel (17); fwd 1.0; ctrl 0.1; no
                          termination; reset qpos ~U(±0.1), qvel ~0.1·N
Hopper                    obs qpos[1:]+clip(qvel,±10) (11); fwd 1.0; ctrl 1e-3;
                          healthy +1.0/step; terminate unless z∈(0.7,∞),
                          angle∈(−0.2,0.2), state[2:]∈(−100,100);
                          reset qpos,qvel ~U(±5e-3)
Walker2d                  obs qpos[1:]+clip(qvel,±10) (17); fwd 1.0; ctrl 1e-3;
                          healthy +1.0; terminate unless z∈(0.8,2.0),
                          angle∈(−1,1); reset qpos,qvel ~U(±5e-3)
Ant                       obs qpos[2:]+qvel (27; +84 clipped cfrc_ext when
                          ``use_contact_forces``); fwd = x-velocity of torso
                          body CoM; ctrl 0.5; contact 5e-4 (gated); healthy
                          +1.0; terminate unless all finite and z∈[0.2,1.0];
                          reset qpos ~U(±0.1), qvel ~0.1·N
Humanoid                  obs qpos[2:]+qvel+cinert+cvel+qfrc_actuator+cfrc_ext
                          (376); fwd 1.25 × mass-center x-velocity; ctrl 0.1;
                          healthy +5.0; terminate unless z∈(1.0,2.0); reset
                          qpos,qvel ~U(±1e-2); NO contact cost in v4
HumanoidStandup           same obs (376); reward = z/model-timestep
                          − 0.1·Σctrl² − min(0.5e-6·Σcfrc_ext², 10) + 1;
                          never terminates; reset ~U(±1e-2)
========================  =====================================================
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


class MjPhysicsFields(NamedTuple):
    """The physics-engine outputs the -v4 semantics consume.

    All arrays are per-instance (unbatched); vmap handles batching. The
    humanoid-family fields default to None for tasks that never read them,
    so pytree structure stays minimal for the 2D runners. Works identically
    on MJX device arrays and on numpy arrays pulled from host ``mujoco``
    (the cross-validation path).
    """

    qpos: jnp.ndarray
    qvel: jnp.ndarray
    cinert: Optional[jnp.ndarray] = None  # (nbody, 10) COM-frame inertia
    cvel: Optional[jnp.ndarray] = None  # (nbody, 6) COM-frame velocity
    qfrc_actuator: Optional[jnp.ndarray] = None  # (nv,) actuator force
    cfrc_ext: Optional[jnp.ndarray] = None  # (nbody, 6) external contact force
    xipos: Optional[jnp.ndarray] = None  # (nbody, 3) body COM positions
    torso_xpos: Optional[jnp.ndarray] = None  # (3,) torso frame origin (Ant fwd)


@dataclass(frozen=True)
class MjTaskSpec:
    """Static -v4 task description. Frozen/hashable so it can ride through
    jit as a closure constant."""

    name: str
    xml_file: str
    frame_skip: int
    forward_reward_weight: float = 1.0
    ctrl_cost_weight: float = 0.0
    healthy_reward: float = 0.0
    terminate_when_unhealthy: bool = False
    healthy_z_range: Optional[Tuple[float, float]] = None
    healthy_angle_range: Optional[Tuple[float, float]] = None
    healthy_state_range: Optional[Tuple[float, float]] = None
    check_finite_healthy: bool = False  # Ant: isfinite(state).all()
    # z-range comparison inclusivity: Ant uses <=, the rest use < (irrelevant
    # for continuous states but kept for exactness).
    inclusive_z: bool = False
    exclude_positions: int = 1  # leading qpos entries dropped from obs
    clip_qvel_obs: Optional[float] = None  # Hopper/Walker clip to ±10
    full_body_obs: bool = False  # humanoid family: cinert/cvel/qfrc/cfrc_ext
    use_contact_forces: bool = False  # Ant optional 84-dim obs + contact cost
    contact_cost_weight: float = 5e-4
    contact_force_range: Tuple[float, float] = (-1.0, 1.0)
    # "x": root-joint x progress; "com": mass-center x progress (Humanoid);
    # "torso": torso body frame x progress (Ant); None: standup (no progress)
    forward_from: Optional[str] = "x"
    standup: bool = False
    reset_noise_scale: float = 0.0
    qvel_noise: str = "uniform"  # "uniform" | "normal" (scaled standard normal)
    max_episode_steps: int = 1000


# (exclude_positions + obs layout fully determined by the spec + model dims)
TASK_SPECS = {
    "HalfCheetah-v4": MjTaskSpec(
        name="HalfCheetah-v4", xml_file="half_cheetah.xml", frame_skip=5,
        ctrl_cost_weight=0.1, reset_noise_scale=0.1, qvel_noise="normal",
    ),
    "Hopper-v4": MjTaskSpec(
        name="Hopper-v4", xml_file="hopper.xml", frame_skip=4,
        ctrl_cost_weight=1e-3, healthy_reward=1.0,
        terminate_when_unhealthy=True,
        healthy_z_range=(0.7, float("inf")),
        healthy_angle_range=(-0.2, 0.2),
        healthy_state_range=(-100.0, 100.0),
        clip_qvel_obs=10.0, reset_noise_scale=5e-3,
    ),
    "Walker2d-v4": MjTaskSpec(
        name="Walker2d-v4", xml_file="walker2d.xml", frame_skip=4,
        ctrl_cost_weight=1e-3, healthy_reward=1.0,
        terminate_when_unhealthy=True,
        healthy_z_range=(0.8, 2.0),
        healthy_angle_range=(-1.0, 1.0),
        clip_qvel_obs=10.0, reset_noise_scale=5e-3,
    ),
    "Ant-v4": MjTaskSpec(
        name="Ant-v4", xml_file="ant.xml", frame_skip=5,
        ctrl_cost_weight=0.5, healthy_reward=1.0,
        terminate_when_unhealthy=True,
        healthy_z_range=(0.2, 1.0), check_finite_healthy=True,
        inclusive_z=True, exclude_positions=2,
        forward_from="torso",
        reset_noise_scale=0.1, qvel_noise="normal",
    ),
    "Humanoid-v4": MjTaskSpec(
        name="Humanoid-v4", xml_file="humanoid.xml", frame_skip=5,
        forward_reward_weight=1.25, ctrl_cost_weight=0.1,
        healthy_reward=5.0, terminate_when_unhealthy=True,
        healthy_z_range=(1.0, 2.0), exclude_positions=2,
        full_body_obs=True, forward_from="com",
        reset_noise_scale=1e-2,
    ),
    "HumanoidStandup-v4": MjTaskSpec(
        name="HumanoidStandup-v4", xml_file="humanoidstandup.xml",
        frame_skip=5, exclude_positions=2, full_body_obs=True,
        forward_from=None, standup=True, reset_noise_scale=1e-2,
    ),
}


def observation_dim(spec: MjTaskSpec, nq: int, nv: int, nbody: int) -> int:
    dim = (nq - spec.exclude_positions) + nv
    if spec.full_body_obs:
        dim += nbody * 10 + nbody * 6 + nv + nbody * 6
    if spec.use_contact_forces:
        dim += nbody * 6
    return dim


def task_observation(spec: MjTaskSpec, f: MjPhysicsFields) -> jnp.ndarray:
    """Gymnasium -v4 observation for one env instance (vmap over a batch)."""
    position = f.qpos[spec.exclude_positions:]
    velocity = f.qvel
    if spec.clip_qvel_obs is not None:
        velocity = jnp.clip(velocity, -spec.clip_qvel_obs, spec.clip_qvel_obs)
    parts = [position, velocity]
    if spec.full_body_obs:
        parts += [
            f.cinert.reshape(-1),
            f.cvel.reshape(-1),
            f.qfrc_actuator.reshape(-1),
            f.cfrc_ext.reshape(-1),
        ]
    if spec.use_contact_forces:
        lo, hi = spec.contact_force_range
        parts.append(jnp.clip(f.cfrc_ext, lo, hi).reshape(-1))
    return jnp.concatenate(parts)


def is_healthy(spec: MjTaskSpec, qpos: jnp.ndarray, qvel: jnp.ndarray) -> jnp.ndarray:
    """Bool scalar: the -v4 healthy-state predicate (True when no range set)."""
    healthy = jnp.asarray(True)
    if spec.healthy_z_range is not None:
        z = qpos[2] if spec.exclude_positions == 2 else qpos[1]
        lo, hi = spec.healthy_z_range
        if spec.inclusive_z:
            healthy &= (lo <= z) & (z <= hi)
        else:
            healthy &= (lo < z) & (z < hi)
    if spec.healthy_angle_range is not None:
        angle = qpos[2]
        lo, hi = spec.healthy_angle_range
        healthy &= (lo < angle) & (angle < hi)
    if spec.healthy_state_range is not None:
        state = jnp.concatenate([qpos, qvel])[2:]
        lo, hi = spec.healthy_state_range
        healthy &= jnp.all((lo < state) & (state < hi))
    if spec.check_finite_healthy:
        healthy &= jnp.all(jnp.isfinite(jnp.concatenate([qpos, qvel])))
    return healthy


def task_terminated(
    spec: MjTaskSpec, qpos: jnp.ndarray, qvel: jnp.ndarray
) -> jnp.ndarray:
    if not spec.terminate_when_unhealthy:
        return jnp.asarray(False)
    return ~is_healthy(spec, qpos, qvel)


def forward_position(
    spec: MjTaskSpec, f: MjPhysicsFields, body_mass: Optional[jnp.ndarray]
) -> jnp.ndarray:
    """The scalar x-coordinate whose per-step delta defines forward progress."""
    if spec.forward_from == "x":
        return f.qpos[0]
    if spec.forward_from == "torso":
        # gym Ant: get_body_com("torso")[0]; body 1 is the torso in ant.xml
        return f.torso_xpos[0]
    if spec.forward_from == "com":
        # mass_center: body-mass-weighted mean of COM positions (humanoid_v4)
        num = jnp.einsum("b,bj->j", body_mass, f.xipos)
        return (num / jnp.sum(body_mass))[0]
    raise ValueError(f"{spec.name} has no forward-progress term")


def task_reward(
    spec: MjTaskSpec,
    f_before: MjPhysicsFields,
    f_after: MjPhysicsFields,
    action: jnp.ndarray,
    dt: float,
    body_mass: Optional[jnp.ndarray] = None,
    model_timestep: Optional[float] = None,
) -> jnp.ndarray:
    """The -v4 scalar reward. ``dt`` is timestep*frame_skip; the standup task
    additionally needs the raw ``model_timestep`` (its uph_cost divides by
    the model timestep, NOT dt — humanoidstandup_v4.py)."""
    ctrl_cost = spec.ctrl_cost_weight * jnp.sum(jnp.square(action))

    if spec.standup:
        uph_cost = f_after.qpos[2] / model_timestep
        quad_ctrl_cost = 0.1 * jnp.sum(jnp.square(action))
        quad_impact_cost = jnp.minimum(
            0.5e-6 * jnp.sum(jnp.square(f_after.cfrc_ext)), 10.0
        )
        return uph_cost - quad_ctrl_cost - quad_impact_cost + 1.0

    x_before = forward_position(spec, f_before, body_mass)
    x_after = forward_position(spec, f_after, body_mass)
    forward_reward = spec.forward_reward_weight * (x_after - x_before) / dt

    # healthy_reward is paid every step while terminate_when_unhealthy (the
    # episode ends before an unhealthy step could be paid), else only when
    # actually healthy (hopper_v4.py healthy_reward property).
    if spec.terminate_when_unhealthy:
        healthy = jnp.asarray(1.0)
    else:
        healthy = is_healthy(spec, f_after.qpos, f_after.qvel).astype(jnp.float32)
    reward = forward_reward + spec.healthy_reward * healthy - ctrl_cost

    if spec.use_contact_forces:
        lo, hi = spec.contact_force_range
        clipped = jnp.clip(f_after.cfrc_ext, lo, hi)
        reward = reward - spec.contact_cost_weight * jnp.sum(jnp.square(clipped))
    return reward


def reset_qpos_qvel(
    spec: MjTaskSpec,
    key: jax.Array,
    init_qpos: jnp.ndarray,
    init_qvel: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-task -v4 reset noise around the model keyframe state."""
    kq, kv = jax.random.split(key)
    s = spec.reset_noise_scale
    qpos = init_qpos + jax.random.uniform(
        kq, init_qpos.shape, minval=-s, maxval=s, dtype=init_qpos.dtype
    )
    if spec.qvel_noise == "normal":
        qvel = init_qvel + s * jax.random.normal(kv, init_qvel.shape, init_qvel.dtype)
    else:
        qvel = init_qvel + jax.random.uniform(
            kv, init_qvel.shape, minval=-s, maxval=s, dtype=init_qvel.dtype
        )
    return qpos, qvel
