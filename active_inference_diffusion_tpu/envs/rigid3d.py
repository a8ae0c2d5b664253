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
    observation_dim,
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
    body_rot: jnp.ndarray  # (nbody, 3, 3) fixed frame rotation (body_quat)
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
    stiffness: jnp.ndarray  # (nj,) joint spring constants
    springref: jnp.ndarray  # (nq,) qpos_spring
    act_dof: jnp.ndarray  # (nu,)
    gear: jnp.ndarray  # (nu,)
    ctrlrange: jnp.ndarray  # (nu, 2)
    # contact candidate points vs the z=0 plane
    cp_body: jnp.ndarray  # (ncp,)
    cp_offset: jnp.ndarray  # (ncp, 3) in body frame
    cp_radius: jnp.ndarray  # (ncp,)
    cp_friction: jnp.ndarray  # (ncp,)
    # render geoms (capsule segments; spheres have a == b) for the
    # on-device pixel variants (pixel_render.make_rigid3d_pixels)
    rg_body: jnp.ndarray  # (ng,)
    rg_a: jnp.ndarray  # (ng, 3) body-frame endpoint
    rg_b: jnp.ndarray  # (ng, 3) body-frame endpoint
    rg_radius: jnp.ndarray  # (ng,)
    cp_k: jnp.ndarray  # (ncp,) per-point normal stiffness (m_eff-scaled)
    cp_c: jnp.ndarray  # (ncp,) per-point normal damping
    limit_k: jnp.ndarray  # (nj,) per-joint limit spring (inertia-scaled)
    limit_c: jnp.ndarray  # (nj,) per-joint limit damping
    nq: int
    nv: int
    dt: float
    gravity: float
    n_substeps: int
    slip_velocity: float
    # Hard velocity clamp applied after every integration substep. The
    # penalty limit springs can be driven into energy-injecting limit cycles
    # by sustained max-gear torques (humanoid: gear 300 vs spring limits —
    # MuJoCo needs no such guard because its joint limits are CONSTRAINTS,
    # not springs); the clamp bounds that failure to already-nonphysical
    # trajectories instead of letting them overflow to NaN.
    max_qvel: float
    # "constraint": joint limits as velocity-level unilateral constraints
    # solved by projected Gauss-Seidel impulses after each substep (the way
    # MuJoCo treats them — solver constraints, not forces). "spring": the
    # one-sided inertia-scaled penalty springs (legacy; unstable under the
    # humanoid's gear-300 torques).
    limit_model: str


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
    contact_omega: float = None,
    contact_zeta: float = 1.0,
    slip_velocity: float = 0.05,
    n_substeps: int = 1,
    max_qvel: float = 100.0,
    limit_model: str = "constraint",
) -> Rigid3DModel:
    """Contact-penalty constants are PER POINT, scaled by each point's
    constraint-space effective mass m_eff = 1/(J_z M⁻¹ J_zᵀ) (computed at
    qpos0 with MuJoCo's own mj_jac / mass matrix): k_p = m_eff ω², c_p =
    2ζ m_eff ω with ω = contact_omega (default 0.25/dt_sub — inside the RK4
    stability region by construction) and ζ = contact_zeta. A single global
    stiffness/damping cannot work across bodies: what holds a 35 kg humanoid
    torso is violently stiff for its 0.3 kg-effective hand dofs (measured:
    velocities grow ~e^{t/dt} into overflow within 7 control steps)."""
    import os

    import gymnasium.envs.mujoco as gym_mujoco
    import mujoco

    spec = TASK_SPECS[env_name]
    xml = os.path.join(
        os.path.dirname(gym_mujoco.__file__), "assets", spec.xml_file
    )
    m = mujoco.MjModel.from_xml_path(xml)

    parent = tuple(int(p) for p in m.body_parentid)
    body_rot = np.stack([_quat_to_mat_np(m.body_quat[b]) for b in range(m.nbody)])

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
    rg_body, rg_a, rg_b, rg_radius = [], [], [], []
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
            rg_body.append(b)
            rg_a.append(pos - half * axis)
            rg_b.append(pos + half * axis)
            rg_radius.append(r)
        elif gtype == _SPHERE:
            cp_body.append(b)
            cp_offset.append(pos)
            cp_radius.append(float(m.geom_size[g][0]))
            cp_friction.append(mu)
            rg_body.append(b)
            rg_a.append(pos)
            rg_b.append(pos)
            rg_radius.append(float(m.geom_size[g][0]))

    damping = np.asarray(m.dof_damping, np.float64)
    armature = np.asarray(m.dof_armature, np.float64)

    g = float(-m.opt.gravity[2])
    dt_sub = float(m.opt.timestep) / n_substeps
    if contact_omega is None:
        contact_omega = 0.25 / dt_sub

    # Joint-limit springs scaled to each dof's inertia (diagonal of M at
    # qpos0, from MuJoCo itself): a FIXED stiffness explodes light dofs
    # (humanoid forearm inertia ~0.01 -> omega ~550 rad/s >> RK4 stability
    # at dt=0.003) and under-constrains heavy ones. omega_lim = 60 rad/s,
    # critical damping.
    d0 = mujoco.MjData(m)
    d0.qpos[:] = m.qpos0
    mujoco.mj_forward(m, d0)
    M0 = np.zeros((m.nv, m.nv))
    mujoco.mj_fullM(m, d0, M0)
    omega_lim = 60.0
    limit_k = np.zeros(m.njnt)
    limit_c = np.zeros(m.njnt)
    for j in range(m.njnt):
        if int(m.jnt_type[j]) == _HINGE:
            mjj = float(M0[m.jnt_dofadr[j], m.jnt_dofadr[j]])
            limit_k[j] = omega_lim**2 * mjj
            limit_c[j] = 2.0 * np.sqrt(limit_k[j] * mjj)

    # per-contact-point effective mass along z at qpos0
    Minv0 = np.linalg.inv(M0)
    cp_k, cp_c = [], []
    for b, off in zip(cp_body, cp_offset):
        world_pt = d0.xpos[b] + d0.xmat[b].reshape(3, 3) @ np.asarray(off)
        jacp = np.zeros((3, m.nv))
        jacr = np.zeros((3, m.nv))
        mujoco.mj_jac(m, d0, jacp, jacr, world_pt, b)
        jz = jacp[2]
        denom = float(jz @ Minv0 @ jz)
        m_eff = 1.0 / max(denom, 1e-9)
        kp = m_eff * contact_omega**2
        cp_k.append(kp)
        cp_c.append(2.0 * contact_zeta * np.sqrt(kp * m_eff))

    f32 = lambda x: jnp.asarray(np.asarray(x), jnp.float32)
    return Rigid3DModel(
        parent=parent,
        body_pos=f32(m.body_pos),
        body_rot=f32(body_rot),
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
        stiffness=f32(m.jnt_stiffness),
        springref=f32(m.qpos_spring),
        act_dof=jnp.asarray(np.asarray(act_dof), jnp.int32),
        gear=f32(np.asarray(gear)),
        ctrlrange=f32(m.actuator_ctrlrange),
        cp_body=jnp.asarray(np.asarray(cp_body), jnp.int32),
        cp_offset=f32(np.asarray(cp_offset)),
        cp_radius=f32(np.asarray(cp_radius)),
        cp_friction=f32(np.asarray(cp_friction)),
        cp_k=f32(np.asarray(cp_k)),
        cp_c=f32(np.asarray(cp_c)),
        rg_body=jnp.asarray(np.asarray(rg_body), jnp.int32),
        rg_a=f32(np.asarray(rg_a)),
        rg_b=f32(np.asarray(rg_b)),
        rg_radius=f32(np.asarray(rg_radius)),
        limit_k=f32(limit_k),
        limit_c=f32(limit_c),
        nq=int(m.nq),
        nv=int(m.nv),
        dt=float(m.opt.timestep),
        gravity=g,
        n_substeps=n_substeps,
        slip_velocity=slip_velocity,
        max_qvel=max_qvel,
        limit_model=limit_model,
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
        R = rot[p] @ model.body_rot[b].astype(dtype)
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
    c_i = (∂M_ij/∂u_k − ½ ∂M_jk/∂u_i) v_j v_k + ∂V/∂u_i.

    Both contractions are single directional derivatives, so the full
    (nv, nv, nv) ∂M/∂u tensor is never built:
    - ∂M_ij/∂u_k v_j v_k = d/dε [M(εv) v]_i — ONE jvp of u ↦ M(u)v along v
      (vs. jacfwd's nv forward passes of the whole mass matrix);
    - ½ ∂M_jk/∂u_i v_j v_k = ∇_u [½ vᵀM(u)v]_i — one reverse pass of a
      scalar. Values are identical (gated by the mj_rne tests); compile and
      runtime shrink by ~nv on the humanoid's 23-dof chart."""
    zero = jnp.zeros((model.nv,), qpos.dtype)

    _, mdot_v = jax.jvp(
        lambda u: _mass_matrix_at(model, qpos, u) @ qvel, (zero,), (qvel,)
    )
    kinetic_grad = jax.grad(
        lambda u: 0.5 * qvel @ _mass_matrix_at(model, qpos, u) @ qvel
    )(zero)

    def potential(u):
        pos, rot = forward_kinematics(model, chart(model, qpos, u))
        coms = pos + jnp.einsum(
            "bij,bj->bi", rot, model.body_ipos.astype(u.dtype)
        )
        return model.gravity * jnp.sum(
            model.mass.astype(u.dtype) * coms[:, 2]
        )

    return mdot_v - kinetic_grad + jax.grad(potential)(zero)


def _contact_point_forces(
    model: Rigid3DModel, qpos: jnp.ndarray, qvel: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-point world contact forces: returns (P (ncp,3) world points,
    F (ncp,3) forces, J (ncp,3,nv) point Jacobians)."""

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
        model.cp_k.astype(qpos.dtype) * pen
        - model.cp_c.astype(qpos.dtype) * V[:, 2],
        0.0,
    )
    fn = jnp.maximum(fn, 0.0)
    mu = model.cp_friction.astype(qpos.dtype)
    ftx = -mu * fn * jnp.tanh(V[:, 0] / model.slip_velocity)
    fty = -mu * fn * jnp.tanh(V[:, 1] / model.slip_velocity)
    F = jnp.stack([ftx, fty, fn], axis=-1)
    return P, F, J


def contact_forces(
    model: Rigid3DModel, qpos: jnp.ndarray, qvel: jnp.ndarray
) -> jnp.ndarray:
    P, F, J = _contact_point_forces(model, qpos, qvel)
    return jnp.einsum("pij,pi->j", J, F)


def contact_wrenches(
    model: Rigid3DModel,
    qpos: jnp.ndarray,
    qvel: jnp.ndarray,
    origin: jnp.ndarray,
) -> jnp.ndarray:
    """Per-body external contact wrench about ``origin`` in world axes —
    the penalty-model approximation of MuJoCo's cfrc_ext (rotation (3) then
    translation (3) per body; constraint forces other than ground contact
    are not modeled)."""
    P, F, J = _contact_point_forces(model, qpos, qvel)
    nbody = len(model.parent)
    torque = jnp.cross(P - origin[None, :], F)
    wrench = jnp.concatenate([torque, F], axis=-1)  # (ncp, 6)
    return jax.ops.segment_sum(wrench, model.cp_body, num_segments=nbody)


def passive_and_limit_forces(
    model: Rigid3DModel, qpos: jnp.ndarray, qvel: jnp.ndarray
) -> jnp.ndarray:
    dtype = qpos.dtype
    out = -model.damping.astype(dtype) * qvel
    # joint spring stiffness (humanoid: 14 sprung joints), vectorized over
    # the hinge joints (static index lists; zero-stiffness joints add zero)
    hinges = [j for j in range(len(model.jnt_body)) if model.jnt_type[j] == _HINGE]
    if hinges:
        qadr = jnp.asarray([model.jnt_qposadr[j] for j in hinges])
        dadr = jnp.asarray([model.jnt_dofadr[j] for j in hinges])
        k_spring = model.stiffness[jnp.asarray(hinges)].astype(dtype)
        out = out.at[dadr].add(
            -k_spring * (qpos[qadr] - model.springref[qadr].astype(dtype))
        )
    # one-sided limit springs on limited hinges (inertia-scaled constants);
    # in "constraint" mode limits are impulses, not forces (_limit_projection)
    if model.limit_model == "constraint":
        return out
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
            model.limit_k[j].astype(dtype) * viol
            - model.limit_c[j].astype(dtype) * in_violation * qvel[dadr]
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


def body_velocities(
    model: Rigid3DModel, qpos: jnp.ndarray, qvel: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(coms, rot, w_world, v_com): per-body CoM positions, rotations,
    world-frame angular velocities, and CoM linear velocities — via the same
    chart Jacobians the mass matrix uses."""

    def fk_u(u):
        pos, rot = forward_kinematics(model, chart(model, qpos, u))
        coms = pos + jnp.einsum(
            "bij,bj->bi", rot, model.body_ipos.astype(u.dtype)
        )
        return coms, rot

    zero = jnp.zeros((model.nv,), qpos.dtype)
    Jc, Jr = jax.jacfwd(fk_u)(zero)
    coms, rot = fk_u(zero)
    W = jnp.einsum("bji,bjkv->bikv", rot, Jr)
    W = 0.5 * (W - jnp.swapaxes(W, 1, 2))
    Jw = jnp.stack([W[:, 2, 1, :], W[:, 0, 2, :], W[:, 1, 0, :]], axis=1)
    w_body = jnp.einsum("biv,v->bi", Jw, qvel)
    w_world = jnp.einsum("bij,bj->bi", rot, w_body)
    v_com = jnp.einsum("biv,v->bi", Jc, qvel)
    return coms, rot, w_world, v_com


def com_frame_fields(
    model: Rigid3DModel,
    qpos: jnp.ndarray,
    qvel: jnp.ndarray,
    ctrl: jnp.ndarray,
) -> dict:
    """The c-frame quantities Humanoid-v4's 376-dim observation consumes,
    in MuJoCo's exact layouts (validated against mj_forward's
    d.cinert/d.cvel in tests):

    - cinert (nbody, 10): [Ic_xx, Ic_yy, Ic_zz, Ic_xy, Ic_xz, Ic_yz,
      m*r (3), m] with Ic = R I_body Rᵀ + m(|r|²E − rrᵀ),
      r = body CoM − root subtree CoM;
    - cvel (nbody, 6): [ω_world, v_com + r × ω] (spatial velocity at the
      subtree-CoM origin);
    - qfrc_actuator (nv,): gear-scaled clamped controls;
    - cfrc_ext (nbody, 6): penalty ground-contact wrench about the subtree
      CoM (approximation — MuJoCo's includes all constraint forces);
    - xipos (nbody, 3): body CoM positions (mass_center for forward_from
      'com').
    """
    coms, rot, w_world, v_com = body_velocities(model, qpos, qvel)
    mass = model.mass.astype(qpos.dtype)
    subtree_com = jnp.einsum("b,bi->i", mass, coms) / jnp.sum(mass)
    r = coms - subtree_com[None, :]

    Iw = jnp.einsum(
        "bij,bjk,blk->bil", rot, model.inertia.astype(qpos.dtype), rot
    )
    r2 = jnp.sum(r * r, axis=-1)
    Ic = (
        Iw
        + mass[:, None, None]
        * (r2[:, None, None] * jnp.eye(3, dtype=qpos.dtype)[None]
           - jnp.einsum("bi,bj->bij", r, r))
    )
    cinert = jnp.concatenate(
        [
            Ic[:, 0, 0:1], Ic[:, 1, 1:2], Ic[:, 2, 2:3],
            Ic[:, 0, 1:2], Ic[:, 0, 2:3], Ic[:, 1, 2:3],
            mass[:, None] * r,
            mass[:, None],
        ],
        axis=-1,
    )  # (nbody, 10)

    cvel = jnp.concatenate(
        [w_world, v_com + jnp.cross(r, w_world)], axis=-1
    )  # (nbody, 6)

    qfrc_actuator = applied_torques(model, ctrl)
    cfrc_ext = contact_wrenches(model, qpos, qvel, subtree_com)
    return {
        "cinert": cinert,
        "cvel": cvel,
        "qfrc_actuator": qfrc_actuator,
        "cfrc_ext": cfrc_ext,
        "xipos": coms,
    }


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


def _limited_hinges(model: Rigid3DModel) -> list:
    """Static list of limited-hinge joint indices (model arrays are concrete
    at trace time — the env closes over them)."""
    limited = np.asarray(model.jnt_limited)
    return [
        j
        for j in range(len(model.jnt_body))
        if model.jnt_type[j] == _HINGE and float(limited[j]) > 0.0
    ]


def limit_projection(
    model: Rigid3DModel,
    qpos: jnp.ndarray,
    qvel: jnp.ndarray,
    h: float,
    n_iters: int = 8,
    beta: float = 0.2,
    max_bias_vel: float = 2.0,
) -> jnp.ndarray:
    """Joint limits as velocity-level unilateral constraints, the way MuJoCo
    treats them (solver constraints — reference trains on gym.make MuJoCo
    envs whose limits come from the mjCONSTRAINT solver, not springs).

    For each limited hinge in violation, an impulse λ ≥ 0 along the outward
    normal n_j (±e_j in dof space) enforces n_j·v' ≥ bias_j, where
    bias_j = min(β·C_j/h, max_bias_vel) is a Baumgarte term that removes the
    position error C_j over a few substeps. Impulses couple through M⁻¹
    (Δv = M⁻¹ N λ), solved by projected Gauss-Seidel over the (static) set
    of limited hinges. Unlike the spring model this cannot inject energy
    into limit cycles: sustained max-gear torque against a limit just pins
    the joint at the limit (the instability that kept Humanoid gated —
    springs at gear-300 torques pump energy faster than any explicit-stable
    stiffness can dissipate at dt=0.003)."""
    lim = _limited_hinges(model)
    if not lim:
        return qvel
    dtype = qpos.dtype
    qadr = jnp.asarray([model.jnt_qposadr[j] for j in lim])
    dadr = jnp.asarray([model.jnt_dofadr[j] for j in lim])
    lim_idx = jnp.asarray(lim)
    lo = model.jnt_range[lim_idx, 0].astype(dtype)
    hi = model.jnt_range[lim_idx, 1].astype(dtype)

    q = qpos[qadr]
    c_lo = lo - q  # > 0 when below the lower limit
    c_hi = q - hi  # > 0 when above the upper limit
    n = jnp.where(c_lo > c_hi, 1.0, -1.0).astype(dtype)  # outward normal sign
    viol = jnp.maximum(jnp.maximum(c_lo, c_hi), 0.0)
    active = (viol > 0.0).astype(dtype)
    bias = jnp.minimum(beta * viol / jnp.asarray(h, dtype), max_bias_vel)

    minv = jnp.linalg.inv(mass_matrix(model, qpos))
    cols = minv[:, dadr] * n[None, :]  # Δv per unit λ, (nv, nl)
    a_diag = jnp.diagonal(minv[dadr][:, dadr])  # n_j² = 1

    def gs_sweep(carry):
        v, lam = carry
        for i in range(len(lim)):  # static unroll over limited hinges
            dl = (bias[i] - n[i] * v[dadr[i]]) / a_diag[i]
            new = jnp.maximum(lam[i] + dl, 0.0) * active[i]
            v = v + cols[:, i] * (new - lam[i])
            lam = lam.at[i].set(new)
        return v, lam

    v, _ = jax.lax.fori_loop(
        0,
        n_iters,
        lambda _, c: gs_sweep(c),
        (qvel, jnp.zeros((len(lim),), dtype)),
    )
    return v


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
        if model.limit_model == "constraint":
            qd_new = limit_projection(model, q_new, qd_new, h)
        qd_new = jnp.clip(qd_new, -model.max_qvel, model.max_qvel)
        return (q_new, qd_new), None

    (qpos, qvel), _ = jax.lax.scan(
        substep, (qpos, qvel), None, length=frame_skip * model.n_substeps
    )
    return qpos, qvel


# ---------------------------------------------------------------------------
# JaxEnv binding
# ---------------------------------------------------------------------------


class Rigid3DEnv(JaxEnv):
    """On-device Ant / Humanoid / HumanoidStandup with exact Gymnasium task
    semantics on approximate (penalty) contacts — the 3D sibling of
    ``planar.PlanarMJCEnv``. Humanoid's 376-dim full-body observation
    (cinert/cvel/qfrc_actuator/cfrc_ext) is built by ``com_frame_fields``
    (layouts validated against mj_forward; cfrc_ext is the penalty
    approximation). Joint limits are velocity-level constraints solved by
    PGS impulses (``limit_projection``) — the spring model that kept the
    humanoid family gated is retained only behind ``limit_model='spring'``."""

    TASKS = ("Ant-v4", "Humanoid-v4", "HumanoidStandup-v4")

    def __init__(self, env_name: str, **penalty_overrides):
        if env_name not in self.TASKS:
            raise ValueError(f"{env_name} not supported; have {self.TASKS}")
        self.env_name = env_name
        self.spec = TASK_SPECS[env_name]
        if (
            (self.spec.full_body_obs or self.spec.standup)
            and penalty_overrides.get("limit_model") == "spring"
            and "n_substeps" not in penalty_overrides
        ):
            # legacy spring limits: gear-300 torques against penalty limit
            # springs need finer integration (and still eventually diverge —
            # constraint mode, the default, is stable at n_substeps=1)
            penalty_overrides = dict(penalty_overrides, n_substeps=3,
                                     contact_omega=83.0)
        self.model = extract_rigid3d_model(env_name, **penalty_overrides)
        self.nq, self.nv = self.model.nq, self.model.nv
        self.nbody = len(self.model.parent)
        self.observation_dim = observation_dim(
            self.spec, self.model.nq, self.model.nv, self.nbody
        )
        self.action_dim = int(self.model.act_dof.shape[0])
        self.action_low = self.model.ctrlrange[:, 0]
        self.action_high = self.model.ctrlrange[:, 1]
        self.max_episode_steps = self.spec.max_episode_steps
        self.dt = float(self.model.dt * self.spec.frame_skip)
        self.model_timestep = float(self.model.dt)

    def _fields(self, qpos, qvel, ctrl) -> MjPhysicsFields:
        pos, _ = forward_kinematics(self.model, qpos)
        if self.spec.full_body_obs or self.spec.standup:
            cf = com_frame_fields(self.model, qpos, qvel, ctrl)
            return MjPhysicsFields(
                qpos=qpos, qvel=qvel, torso_xpos=pos[1], **cf
            )
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
        obs = task_observation(
            self.spec,
            self._fields(qpos, qvel, jnp.zeros(self.action_dim)),
        )
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
        fields_before = self._fields(qpos, qvel, action)
        qpos, qvel = step_physics(
            self.model, qpos, qvel, action, self.spec.frame_skip
        )
        fields_after = self._fields(qpos, qvel, action)
        reward = task_reward(
            self.spec, fields_before, fields_after, action, self.dt,
            body_mass=self.model.mass,
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
