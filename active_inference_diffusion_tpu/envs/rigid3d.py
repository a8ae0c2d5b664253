"""From-scratch 3D rigid-body physics in JAX for Ant-v4 (free joint + hinges).

The 3D sibling of ``envs/planar.py`` (same philosophy, same validation
discipline): model parameters come from the installed Gymnasium XML via host
``mujoco`` at construction; smooth dynamics are derived by autodiff and
validated against MuJoCo's own ``mj_kinematics`` / ``mj_fullM`` / ``mj_rne``
on random states; ground contact is a smooth penalty approximation
(distinct env name, returns not claimed gym-comparable).

The quaternion configuration manifold is handled with a LOCAL CHART: around
the current configuration q, ``phi(q, u)`` maps tangent coordinates
u ∈ R^nv to a perturbed configuration using MuJoCo's velocity conventions
(free joint: world-frame linear velocity, body-frame angular velocity
applied as a local quaternion exponential — the same map
``mj_integratePos`` uses). Because u is a genuine coordinate chart with
u̇ = qvel at u = 0, the Lagrangian machinery of the planar engine transfers
verbatim:

- M(u) = Σ_b m_b J_comᵀ J_com + J_ωᵀ I_b J_ω (+armature), with J_ω the
  body-frame angular-velocity Jacobian extracted from
  skew⁻¹(R_b(0)ᵀ R_b(u)) at u = 0;
- bias c_i = (∂M_ij/∂u_k − ½ ∂M_jk/∂u_i) v_j v_k + ∂V/∂u_i (Christoffel
  identity, valid in any chart);
- contacts/limits map through point Jacobians in the chart.

Integration: manifold RK4 (stage positions via the same exponential map,
matching the model's mjINT_RK4).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .jax_envs import EnvState, JaxEnv
from .mujoco_tasks import (
    MjPhysicsFields,
    TASK_SPECS,
    reset_qpos_qvel,
    task_observation,
    task_reward,
    task_terminated,
)

_FREE = 0
_HINGE = 3
_CAPSULE = 3
_SPHERE = 2


class Rigid3DModel(NamedTuple):
    """Static description of a 3D kinematic tree (free root + hinges)."""

    parent: tuple  # python ints, length nbody
    body_pos: jnp.ndarray  # (nbody, 3) offset in parent frame
    body_ipos: jnp.ndarray  # (nbody, 3) CoM offset in body frame
    mass: jnp.ndarray  # (nbody,)
    inertia: jnp.ndarray  # (nbody, 3, 3) body-frame rotational inertia
    # joints in model order; free joint must be joint 0 on body 1
    jnt_body: tuple  # python ints
    jnt_type: tuple  # python ints: _FREE | _HINGE
    jnt_axis: jnp.ndarray  # (nj, 3) hinge axis in body frame
    jnt_anchor: jnp.ndarray  # (nj, 3) hinge anchor in body frame
    jnt_qposadr: tuple  # python ints
    jnt_dofadr: tuple  # python ints
    qpos0: jnp.ndarray  # (nq,)
    jnt_range: jnp.ndarray  # (nj, 2) (free row unused)
    jnt_limited: jnp.ndarray  # (nj,)
    damping: jnp.ndarray  # (nv,)
    armature: jnp.ndarray  # (nv,)
    act_dof: jnp.ndarray  # (nu,)
    gear: jnp.ndarray  # (nu,)
    ctrlrange: jnp.ndarray  # (nu, 2)
    # contact candidate points vs the z=0 plane
    cp_body: jnp.ndarray  # (ncp,)
    cp_offset: jnp.ndarray  # (ncp, 3) in body frame
    cp_radius: jnp.ndarray  # (ncp,)
    cp_friction: jnp.ndarray  # (ncp,)
    nq: int
    nv: int
    dt: float
    gravity: float
    n_substeps: int
    contact_stiffness: float
    contact_damping: float
    slip_velocity: float
    limit_stiffness: float
    limit_damping: float


def _quat_to_mat_np(q) -> np.ndarray:
    w, x, y, z = (float(v) for v in q)
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )


def extract_rigid3d_model(
    env_name: str,
    contact_stiffness: float = None,
    contact_damping: float = None,
    slip_velocity: float = 0.05,
    limit_stiffness: float = 3.0e3,
    limit_damping: float = 30.0,
) -> Rigid3DModel:
    """Contact-penalty constants default to weight-scaled values:
    k = M_total*g / 0.015 (full weight on one point penetrates 1.5 cm) and
    c = 1.5*sqrt(k*M_total) (ζ≈0.75 critical damping) — the same formula
    reproduces the planar engine's Hopper-calibrated constants (16 kg ->
    k≈1e4, c≈600) and keeps the spring stable for the 0.9 kg Ant, where a
    fixed 1e4 launches the body off the floor."""
    import os

    import gymnasium.envs.mujoco as gym_mujoco
    import mujoco

    spec = TASK_SPECS[env_name]
    xml = os.path.join(
        os.path.dirname(gym_mujoco.__file__), "assets", spec.xml_file
    )
    m = mujoco.MjModel.from_xml_path(xml)

    parent = tuple(int(p) for p in m.body_parentid)
    for b in range(m.nbody):
        if abs(_quat_to_mat_np(m.body_quat[b]) - np.eye(3)).max() > 1e-9:
            raise ValueError(f"{env_name}: non-identity body quat on body {b}")

    inertia = np.zeros((m.nbody, 3, 3))
    for b in range(m.nbody):
        R = _quat_to_mat_np(m.body_iquat[b])
        inertia[b] = R @ np.diag(np.asarray(m.body_inertia[b])) @ R.T

    jnt_body, jnt_type, jnt_axis, jnt_anchor = [], [], [], []
    jnt_qposadr, jnt_dofadr = [], []
    for j in range(m.njnt):
        t = int(m.jnt_type[j])
        if t == _FREE:
            if j != 0 or int(m.jnt_bodyid[j]) != 1:
                raise ValueError(f"{env_name}: free joint must be root")
        elif t != _HINGE:
            raise ValueError(f"{env_name}: unsupported joint type {t}")
        jnt_body.append(int(m.jnt_bodyid[j]))
        jnt_type.append(t)
        jnt_axis.append(np.asarray(m.jnt_axis[j]))
        jnt_anchor.append(np.asarray(m.jnt_pos[j]))
        jnt_qposadr.append(int(m.jnt_qposadr[j]))
        jnt_dofadr.append(int(m.jnt_dofadr[j]))

    act_dof, gear = [], []
    for a in range(m.nu):
        j = int(m.actuator_trnid[a, 0])
        act_dof.append(int(m.jnt_dofadr[j]))
        gear.append(float(m.actuator_gear[a, 0]))

    floor_mu = 0.0
    for g in range(m.ngeom):
        if int(m.geom_bodyid[g]) == 0:
            floor_mu = max(floor_mu, float(m.geom_friction[g][0]))

    cp_body, cp_offset, cp_radius, cp_friction = [], [], [], []
    for g in range(m.ngeom):
        b = int(m.geom_bodyid[g])
        if b == 0:
            continue
        gtype = int(m.geom_type[g])
        pos = np.asarray(m.geom_pos[g])
        mu = max(float(m.geom_friction[g][0]), floor_mu)
        if gtype == _CAPSULE:
            half = float(m.geom_size[g][1])
            r = float(m.geom_size[g][0])
            axis = _quat_to_mat_np(m.geom_quat[g]) @ np.array([0.0, 0.0, 1.0])
            for s in (-1.0, 0.0, 1.0):
                cp_body.append(b)
                cp_offset.append(pos + s * half * axis)
                cp_radius.append(r)
                cp_friction.append(mu)
        elif gtype == _SPHERE:
            cp_body.append(b)
            cp_offset.append(pos)
            cp_radius.append(float(m.geom_size[g][0]))
            cp_friction.append(mu)

    damping = np.asarray(m.dof_damping, np.float64)
    armature = np.asarray(m.dof_armature, np.float64)

    total_mass = float(np.sum(m.body_mass))
    g = float(-m.opt.gravity[2])
    if contact_stiffness is None:
        contact_stiffness = total_mass * g / 0.015
    if contact_damping is None:
        contact_damping = 1.5 * float(np.sqrt(contact_stiffness * total_mass))

    f32 = lambda x: jnp.asarray(np.asarray(x), jnp.float32)
    return Rigid3DModel(
        parent=parent,
        body_pos=f32(m.body_pos),
        body_ipos=f32(m.body_ipos),
        mass=f32(m.body_mass),
        inertia=f32(inertia),
        jnt_body=tuple(jnt_body),
        jnt_type=tuple(jnt_type),
        jnt_axis=f32(np.asarray(jnt_axis)),
        jnt_anchor=f32(np.asarray(jnt_anchor)),
        jnt_qposadr=tuple(jnt_qposadr),
        jnt_dofadr=tuple(jnt_dofadr),
        qpos0=f32(m.qpos0),
        jnt_range=f32(m.jnt_range),
        jnt_limited=f32(np.asarray(m.jnt_limited, np.float32)),
        damping=f32(damping),
        armature=f32(armature),
        act_dof=jnp.asarray(np.asarray(act_dof), jnp.int32),
        gear=f32(np.asarray(gear)),
        ctrlrange=f32(m.actuator_ctrlrange),
        cp_body=jnp.asarray(np.asarray(cp_body), jnp.int32),
        cp_offset=f32(np.asarray(cp_offset)),
        cp_radius=f32(np.asarray(cp_radius)),
        cp_friction=f32(np.asarray(cp_friction)),
        nq=int(m.nq),
        nv=int(m.nv),
        dt=float(m.opt.timestep),
        gravity=float(-m.opt.gravity[2]),
        n_substeps=1,
        contact_stiffness=contact_stiffness,
        contact_damping=contact_damping,
        slip_velocity=slip_velocity,
        limit_stiffness=limit_stiffness,
        limit_damping=limit_damping,
    )


# ---------------------------------------------------------------------------
# Quaternion helpers (w, x, y, z)
# ---------------------------------------------------------------------------


def quat_to_mat(q: jnp.ndarray) -> jnp.ndarray:
    w, x, y, z = q[0], q[1], q[2], q[3]
    return jnp.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )


def quat_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    aw, ax, ay, az = a[0], a[1], a[2], a[3]
    bw, bx, by, bz = b[0], b[1], b[2], b[3]
    return jnp.array(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ]
    )


def quat_exp(v: jnp.ndarray) -> jnp.ndarray:
    """exp of a rotation vector (angle = |v|) as a quaternion; smooth at 0."""
    angle_sq = jnp.sum(v * v)
    angle = jnp.sqrt(angle_sq + 1e-24)
    half = 0.5 * angle
    # sin(half)/angle, series-safe near zero
    s = jnp.where(angle_sq > 1e-16, jnp.sin(half) / angle, 0.5 - angle_sq / 48.0)
    return jnp.concatenate([jnp.cos(half)[None], s * v])


def quat_normalize(q: jnp.ndarray) -> jnp.ndarray:
    return q / jnp.sqrt(jnp.sum(q * q) + 1e-24)


def integrate_pos(
    model: Rigid3DModel, qpos: jnp.ndarray, qvel: jnp.ndarray, dt
) -> jnp.ndarray:
    """MuJoCo mj_integratePos: free-joint linear velocity in the WORLD frame,
    angular velocity applied as a LOCAL quaternion exponential; hinges add.
    (This map IS the local chart the dynamics are differentiated in.)"""
    pos = qpos[0:3] + dt * qvel[0:3]
    quat = quat_mul(qpos[3:7], quat_exp(dt * qvel[3:6]))
    rest = qpos[7:] + dt * qvel[6:]
    return jnp.concatenate([pos, quat_normalize(quat), rest])


# ---------------------------------------------------------------------------
# Kinematics & chart-based Lagrangian dynamics
# ---------------------------------------------------------------------------


def forward_kinematics(
    model: Rigid3DModel, qpos: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Body poses: positions (nbody, 3) and rotations (nbody, 3, 3)."""
    nbody = len(model.parent)
    dtype = qpos.dtype
    pos = [jnp.zeros(3, dtype)]
    rot = [jnp.eye(3, dtype=dtype)]
    for b in range(1, nbody):
        p = model.parent[b]
        P = pos[p] + rot[p] @ model.body_pos[b].astype(dtype)
        R = rot[p]
        for j in range(len(model.jnt_body)):
            if model.jnt_body[j] != b:
                continue
            if model.jnt_type[j] == _FREE:
                # free joint: qpos holds the ABSOLUTE world pose
                P = qpos[0:3]
                R = quat_to_mat(quat_normalize(qpos[3:7]))
            else:
                qadr = model.jnt_qposadr[j]
                ang = qpos[qadr] - model.qpos0[qadr]
                axis = model.jnt_axis[j].astype(dtype)
                anchor = model.jnt_anchor[j].astype(dtype)
                A = P + R @ anchor
                R = R @ quat_to_mat(quat_exp(axis * ang))
                P = A - R @ anchor
        pos.append(P)
        rot.append(R)
    return jnp.stack(pos), jnp.stack(rot)


def chart(model: Rigid3DModel, qpos: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    """phi(q, u): tangent coordinates -> configuration (u̇ = qvel at u=0)."""
    return integrate_pos(model, qpos, u, 1.0)


def mass_matrix(model: Rigid3DModel, qpos: jnp.ndarray) -> jnp.ndarray:
    return _mass_matrix_at(model, qpos, jnp.zeros((model.nv,), qpos.dtype))


def _mass_matrix_at(
    model: Rigid3DModel, qpos: jnp.ndarray, u: jnp.ndarray
) -> jnp.ndarray:
    """True chart mass matrix at ANY u (not just u=0): KE = ½u̇ᵀM(u)u̇ with
    the EXACT body-frame angular velocity map ω_b = vee(R_bᵀ ∂R_b/∂u · u̇).
    R(u)ᵀ∂R/∂u_k is exactly antisymmetric, so the vee is exact at every u —
    a linearization around u=0 would make the Christoffel ∂M/∂u in
    ``bias_forces`` wrong (measured: ~1% bias error vs mj_rne)."""

    def fk_u(uu):
        pos, rot = forward_kinematics(model, chart(model, qpos, uu))
        coms = pos + jnp.einsum(
            "bij,bj->bi", rot, model.body_ipos.astype(uu.dtype)
        )
        return coms, rot

    Jc, Jr = jax.jacfwd(fk_u)(u)  # (nbody,3,nv), (nbody,3,3,nv)
    _, rot = fk_u(u)
    W = jnp.einsum("bji,bjkv->bikv", rot, Jr)  # Rᵀ ∂R/∂u_v (antisymmetric)
    W = 0.5 * (W - jnp.swapaxes(W, 1, 2))
    Jw = jnp.stack(
        [W[:, 2, 1, :], W[:, 0, 2, :], W[:, 1, 0, :]], axis=1
    )  # (nbody, 3, nv)
    M = jnp.einsum("b,bij,bik->jk", model.mass.astype(qpos.dtype), Jc, Jc)
    M = M + jnp.einsum(
        "bpq,bpj,bqk->jk", model.inertia.astype(qpos.dtype), Jw, Jw
    )
    return M + jnp.diag(model.armature.astype(qpos.dtype))


def bias_forces(
    model: Rigid3DModel, qpos: jnp.ndarray, qvel: jnp.ndarray
) -> jnp.ndarray:
    """Christoffel identity in the local chart (valid in any coordinate
    chart; u̇ = qvel at u = 0):
    c_i = (∂M_ij/∂u_k − ½ ∂M_jk/∂u_i) v_j v_k + ∂V/∂u_i."""
    zero = jnp.zeros((model.nv,), qpos.dtype)
    dM = jax.jacfwd(lambda u: _mass_matrix_at(model, qpos, u))(zero)

    def potential(u):
        pos, rot = forward_kinematics(model, chart(model, qpos, u))
        coms = pos + jnp.einsum(
            "bij,bj->bi", rot, model.body_ipos.astype(u.dtype)
        )
        return model.gravity * jnp.sum(
            model.mass.astype(u.dtype) * coms[:, 2]
        )

    coriolis = jnp.einsum("ijk,j,k->i", dM, qvel, qvel) - 0.5 * jnp.einsum(
        "jki,j,k->i", dM, qvel, qvel
    )
    return coriolis + jax.grad(potential)(zero)


def contact_forces(
    model: Rigid3DModel, qpos: jnp.ndarray, qvel: jnp.ndarray
) -> jnp.ndarray:
    def points(u):
        pos, rot = forward_kinematics(model, chart(model, qpos, u))
        return pos[model.cp_body] + jnp.einsum(
            "pij,pj->pi", rot[model.cp_body], model.cp_offset.astype(u.dtype)
        )

    zero = jnp.zeros((model.nv,), qpos.dtype)
    P = points(zero)
    J = jax.jacfwd(points)(zero)  # (ncp, 3, nv)
    V = jnp.einsum("pij,j->pi", J, qvel)

    pen = model.cp_radius.astype(qpos.dtype) - P[:, 2]
    active = pen > 0.0
    fn = jnp.where(
        active,
        model.contact_stiffness * pen - model.contact_damping * V[:, 2],
        0.0,
    )
    fn = jnp.maximum(fn, 0.0)
    mu = model.cp_friction.astype(qpos.dtype)
    ftx = -mu * fn * jnp.tanh(V[:, 0] / model.slip_velocity)
    fty = -mu * fn * jnp.tanh(V[:, 1] / model.slip_velocity)
    F = jnp.stack([ftx, fty, fn], axis=-1)
    return jnp.einsum("pij,pi->j", J, F)


def passive_and_limit_forces(
    model: Rigid3DModel, qpos: jnp.ndarray, qvel: jnp.ndarray
) -> jnp.ndarray:
    dtype = qpos.dtype
    out = -model.damping.astype(dtype) * qvel
    # one-sided limit springs on limited hinges
    for j in range(len(model.jnt_body)):
        if model.jnt_type[j] != _HINGE:
            continue
        qadr, dadr = model.jnt_qposadr[j], model.jnt_dofadr[j]
        lo, hi = model.jnt_range[j, 0], model.jnt_range[j, 1]
        q = qpos[qadr]
        below = jnp.maximum(lo.astype(dtype) - q, 0.0)
        above = jnp.maximum(q - hi.astype(dtype), 0.0)
        viol = below - above
        in_violation = ((below > 0) | (above > 0)).astype(dtype)
        f = model.jnt_limited[j].astype(dtype) * (
            model.limit_stiffness * viol
            - model.limit_damping * in_violation * qvel[dadr]
        )
        out = out.at[dadr].add(f)
    return out


def applied_torques(model: Rigid3DModel, ctrl: jnp.ndarray) -> jnp.ndarray:
    ctrl = jnp.clip(
        ctrl,
        model.ctrlrange[:, 0].astype(ctrl.dtype),
        model.ctrlrange[:, 1].astype(ctrl.dtype),
    )
    tau = jnp.zeros((model.nv,), ctrl.dtype)
    return tau.at[model.act_dof].add(model.gear.astype(ctrl.dtype) * ctrl)


def qacc(
    model: Rigid3DModel,
    qpos: jnp.ndarray,
    qvel: jnp.ndarray,
    ctrl: jnp.ndarray,
) -> jnp.ndarray:
    M = mass_matrix(model, qpos)
    rhs = (
        applied_torques(model, ctrl)
        + passive_and_limit_forces(model, qpos, qvel)
        + contact_forces(model, qpos, qvel)
        - bias_forces(model, qpos, qvel)
    )
    return jnp.linalg.solve(M, rhs)


def step_physics(
    model: Rigid3DModel,
    qpos: jnp.ndarray,
    qvel: jnp.ndarray,
    ctrl: jnp.ndarray,
    frame_skip: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Manifold RK4 (stage positions via integrate_pos) matching the Ant
    model's mjINT_RK4, ``model.n_substeps`` substeps per model timestep."""
    h = jnp.asarray(model.dt / model.n_substeps, qpos.dtype)
    ctrl = ctrl.astype(qpos.dtype)

    def substep(carry, _):
        q, qd = carry
        k1 = qacc(model, q, qd, ctrl)
        q2 = integrate_pos(model, q, qd, 0.5 * h)
        k2 = qacc(model, q2, qd + 0.5 * h * k1, ctrl)
        q3 = integrate_pos(model, q, qd + 0.5 * h * k1, 0.5 * h)
        k3 = qacc(model, q3, qd + 0.5 * h * k2, ctrl)
        q4 = integrate_pos(model, q, qd + 0.5 * h * k2, h)
        k4 = qacc(model, q4, qd + h * k3, ctrl)
        # classic RK4 on (q, v) with q̇ = v: position advances by the
        # RK4-weighted average VELOCITY (through the exponential map),
        # velocity by the weighted average acceleration
        vel_mean = (
            qd
            + 2.0 * (qd + 0.5 * h * k1)
            + 2.0 * (qd + 0.5 * h * k2)
            + (qd + h * k3)
        ) / 6.0
        q_new = integrate_pos(model, q, vel_mean, h)
        qd_new = qd + (h / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)
        return (q_new, qd_new), None

    (qpos, qvel), _ = jax.lax.scan(
        substep, (qpos, qvel), None, length=frame_skip * model.n_substeps
    )
    return qpos, qvel


# ---------------------------------------------------------------------------
# JaxEnv binding
# ---------------------------------------------------------------------------


class Rigid3DEnv(JaxEnv):
    """On-device Ant-v4 with exact Gymnasium task semantics on approximate
    (penalty) contacts — the 3D sibling of ``planar.PlanarMJCEnv``."""

    TASKS = ("Ant-v4",)

    def __init__(self, env_name: str, **penalty_overrides):
        if env_name not in self.TASKS:
            raise ValueError(f"{env_name} not supported; have {self.TASKS}")
        self.env_name = env_name
        self.spec = TASK_SPECS[env_name]
        self.model = extract_rigid3d_model(env_name, **penalty_overrides)
        self.nq, self.nv = self.model.nq, self.model.nv
        self.observation_dim = int(
            task_observation(
                self.spec,
                MjPhysicsFields(
                    qpos=jnp.zeros(self.nq), qvel=jnp.zeros(self.nv),
                    torso_xpos=jnp.zeros(3),
                ),
            ).shape[0]
        )
        self.action_dim = int(self.model.act_dof.shape[0])
        self.action_low = self.model.ctrlrange[:, 0]
        self.action_high = self.model.ctrlrange[:, 1]
        self.max_episode_steps = self.spec.max_episode_steps
        self.dt = float(self.model.dt * self.spec.frame_skip)
        self.model_timestep = float(self.model.dt)

    def _fields(self, qpos, qvel) -> MjPhysicsFields:
        pos, _ = forward_kinematics(self.model, qpos)
        return MjPhysicsFields(qpos=qpos, qvel=qvel, torso_xpos=pos[1])

    def reset(self, key: jax.Array) -> EnvState:
        noise_key, carry_key = jax.random.split(key)
        qpos, qvel = reset_qpos_qvel(
            self.spec, noise_key, self.model.qpos0, jnp.zeros((self.nv,)),
        )
        # gym's reset adds noise to the raw qpos INCLUDING the quaternion and
        # relies on MuJoCo's normalization; normalize here too.
        qpos = jnp.concatenate(
            [qpos[0:3], quat_normalize(qpos[3:7]), qpos[7:]]
        )
        physics = jnp.concatenate([qpos, qvel])
        obs = task_observation(self.spec, self._fields(qpos, qvel))
        return EnvState(
            physics=physics,
            obs=obs,
            reward=jnp.zeros(()),
            done=jnp.zeros((), bool),
            step_count=jnp.zeros((), jnp.int32),
            key=carry_key,
            terminated=jnp.zeros((), bool),
        )

    def step(self, state: EnvState, action: jnp.ndarray) -> EnvState:
        qpos, qvel = state.physics[: self.nq], state.physics[self.nq :]
        fields_before = self._fields(qpos, qvel)
        qpos, qvel = step_physics(
            self.model, qpos, qvel, action, self.spec.frame_skip
        )
        fields_after = self._fields(qpos, qvel)
        reward = task_reward(
            self.spec, fields_before, fields_after, action, self.dt,
            model_timestep=self.model_timestep,
        )
        terminated = task_terminated(self.spec, qpos, qvel)
        step_count = state.step_count + 1
        truncated = step_count >= self.max_episode_steps
        return state.replace(
            physics=jnp.concatenate([qpos, qvel]),
            obs=task_observation(self.spec, fields_after),
            reward=reward,
            done=terminated | truncated,
            terminated=terminated,
            step_count=step_count,
        )
