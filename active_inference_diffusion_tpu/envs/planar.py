"""From-scratch planar rigid-body physics in JAX for the 2D MuJoCo tasks.

No reference counterpart (the reference steps host MuJoCo in worker
processes, reference examples/train_mujoco.py:41-70). Purpose: make the
fused on-device rollout (`envs/jax_envs.fused_collect`) runnable on the
MuJoCo locomotion tasks on THIS image, where `mujoco-mjx` is not installed
(`envs/mjx_env.py` stays the exact-physics adapter for deployments that have
it). Hopper-v4 / Walker2d-v4 / HalfCheetah-v4 are all planar kinematic trees
(slide-x, slide-z, hinge-y root + hinge-±y joints), so their smooth dynamics
are implementable exactly:

- Model parameters (masses, inertias, joint anchors/axes/limits, capsule
  geoms, gears, damping/armature/stiffness, integrator, timestep) are
  extracted at construction from the *installed Gymnasium MuJoCo XML* via the
  host `mujoco` binding — the exact models `gym.make("<Task>-v4")` loads —
  then frozen into static JAX arrays.
- Forward kinematics follows MuJoCo's joint composition (sequential in-body
  transforms, coordinates relative to ``qpos0``); validated against
  ``mj_kinematics`` (tests/test_planar_physics.py).
- The mass matrix and bias forces are derived from the Lagrangian by
  autodiff: M(q) = Σ_b m_b J_pᵀJ_p + I_yy J_θᵀJ_θ (+armature), bias from
  d/dt(∂T/∂q̇) − ∂T/∂q + ∂V/∂q via ``jax.jacfwd``/``jax.grad``; validated
  against MuJoCo's own ``mj_fullM`` and ``mj_rne``.
- Integrators match MuJoCo per model: RK4 (Hopper/Walker2d) and
  implicit-damping semi-implicit Euler (HalfCheetah). Contact-free
  trajectories therefore track ``mj_step`` closely (tested).
- Ground contact is the one APPROXIMATION. Default (round 4+): velocity-
  level unilateral constraints — contact normals, Coulomb friction boxes,
  and joint limits solved together by projected Gauss–Seidel impulses
  (``contact_projection``), MuJoCo's own solver family. A smooth penalty
  model (spring–damper normal + tanh Coulomb + limit springs) survives
  behind ``contact_model="penalty"``. Either way trained behaviors transfer
  in kind, not bit-for-bit — returns on these "*Planar" envs are NOT
  directly comparable to `gym.make` returns. Task semantics on top of the
  physics state (observation layout, reward terms, termination, reset
  noise) reuse `envs/mujoco_tasks.py`, the layer cross-validated
  bit-for-bit against Gymnasium.
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

_SLIDE = 2  # mujoco mjtJoint values
_HINGE = 3
_CAPSULE = 3
_SPHERE = 2


class PlanarModel(NamedTuple):
    """Static description of a planar kinematic tree (all jnp arrays)."""

    # tree: for body b (1..nbody-1): parent index, frame offset in parent
    parent: tuple  # python ints, length nbody
    body_pos: jnp.ndarray  # (nbody, 2) x,z offset in parent frame
    body_ipos: jnp.ndarray  # (nbody, 2) CoM offset in body frame
    mass: jnp.ndarray  # (nbody,)
    iyy: jnp.ndarray  # (nbody,)
    # joints, in model order (= qpos order; one dof each)
    jnt_body: tuple  # python ints: owning body
    jnt_type: tuple  # python ints: _SLIDE | _HINGE
    jnt_axis: jnp.ndarray  # (nj, 2) slide axis in body frame (x,z) — slides
    jnt_sign: jnp.ndarray  # (nj,) hinge sign (axis·ŷ) — hinges
    jnt_anchor: jnp.ndarray  # (nj, 2) hinge anchor in body frame
    qpos0: jnp.ndarray  # (nj,) reference coordinates
    jnt_range: jnp.ndarray  # (nj, 2)
    jnt_limited: jnp.ndarray  # (nj,) float 0/1
    damping: jnp.ndarray  # (nj,)
    armature: jnp.ndarray  # (nj,)
    stiffness: jnp.ndarray  # (nj,)
    springref: jnp.ndarray  # (nj,) qpos_spring
    # actuators: direct joint torques
    act_dof: jnp.ndarray  # (nu,) int dof index
    gear: jnp.ndarray  # (nu,)
    ctrlrange: jnp.ndarray  # (nu, 2) — MuJoCo clamps data.ctrl to this
    # capsule geom segments on movable bodies (body-frame endpoints) —
    # source of both the contact points below and the pixel rasterizer
    geom_body: tuple  # python ints
    geom_a: jnp.ndarray  # (ng, 2)
    geom_b: jnp.ndarray  # (ng, 2)
    geom_radius: jnp.ndarray  # (ng,)
    # contact points (on movable bodies) vs the z=0 floor plane
    cp_body: jnp.ndarray  # (ncp,) int body index
    cp_offset: jnp.ndarray  # (ncp, 2) point in body frame
    cp_radius: jnp.ndarray  # (ncp,)
    cp_friction: jnp.ndarray  # (ncp,) tangential mu (max with the floor's)
    # integration
    dt: float
    gravity: float  # positive magnitude, acts along -z
    use_rk4: bool  # else implicit-damping semi-implicit Euler (MuJoCo Euler)
    # Sub-divide each model timestep for stability of the penalty-contact
    # spring (HalfCheetah's Euler dt=0.01 gives dt*omega_contact ~ 1.7 —
    # unstable for an explicit spring; MuJoCo's implicit solver doesn't
    # care). 1 keeps mj_step-exact smooth integration (the validation mode).
    n_substeps: int
    # penalty-contact constants (approximation knobs)
    contact_stiffness: float
    contact_damping: float
    slip_velocity: float
    limit_stiffness: float
    limit_damping: float
    # "constraint": ground contact + joint limits as velocity-level
    # unilateral constraints solved by projected Gauss-Seidel impulses after
    # each substep (MuJoCo's solver family — the reference trains on
    # gym.make envs whose contacts come from the mjCONSTRAINT solver, not
    # springs). "penalty": the legacy smooth spring-damper model.
    contact_model: str


def _quat_to_mat(q) -> np.ndarray:
    w, x, y, z = (float(v) for v in q)
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )


def _quat_y_angle(q) -> float:
    """Rotation angle about +y of a (w,x,y,z) quaternion that is a pure
    y-rotation (all orientations in these planar models are)."""
    return 2.0 * float(np.arctan2(q[2], q[0]))


def extract_planar_model(
    env_name: str,
    contact_stiffness: float = 1.0e4,
    contact_damping: float = 6.0e2,
    slip_velocity: float = 0.05,
    limit_stiffness: float = 3.0e3,
    limit_damping: float = 30.0,
    contact_model: str = "constraint",
) -> PlanarModel:
    """Build a PlanarModel from the installed Gymnasium MuJoCo XML (host
    `mujoco` binding; construction-time only — nothing here is traced).

    ``contact_model="constraint"`` (default since round 4) handles ground
    contact and joint limits as velocity-level unilateral impulses
    (``contact_projection``) — MuJoCo's own solver family. The legacy
    penalty model stays behind ``contact_model="penalty"``; its defaults
    were grid-calibrated against full-contact ``mj_step`` Hopper
    trajectories (zero-action settling, scripted hops, random actions, 100
    control steps each): k=1e4 dominated 3e4/1e5 in every regime (lower k
    also de-stiffens HalfCheetah's substepped Euler); damping 600 balances
    rest accuracy (0.011 qpos RMSE settling) against dynamic-bounce
    matching. Hopping-contact trajectories are chaotic, so any approximate
    model diverges from MuJoCo's solver within a few bounces — behavior
    class transfers, trajectories do not. Measured consequence of the
    penalty model (round 3): fused HopperPlanar pinned at eval ~30 while
    the identical agent stack reaches 255-322 on host MuJoCo Hopper."""
    import os

    import gymnasium.envs.mujoco as gym_mujoco
    import mujoco

    spec = TASK_SPECS[env_name]
    xml = os.path.join(
        os.path.dirname(gym_mujoco.__file__), "assets", spec.xml_file
    )
    m = mujoco.MjModel.from_xml_path(xml)

    parent = tuple(int(p) for p in m.body_parentid)
    body_pos = np.asarray(m.body_pos)[:, [0, 2]]
    body_ipos = np.asarray(m.body_ipos)[:, [0, 2]]
    for b in range(m.nbody):
        ang = _quat_y_angle(m.body_quat[b])
        if abs(ang) > 1e-9:
            raise ValueError(f"{env_name}: non-identity body quat on body {b}")

    jnt_body, jnt_type = [], []
    jnt_axis, jnt_sign, jnt_anchor = [], [], []
    for j in range(m.njnt):
        t = int(m.jnt_type[j])
        ax = np.asarray(m.jnt_axis[j])
        if t == _SLIDE:
            if abs(ax[1]) > 1e-9:
                raise ValueError(f"{env_name}: out-of-plane slide joint {j}")
            jnt_axis.append(ax[[0, 2]])
            jnt_sign.append(0.0)
        elif t == _HINGE:
            if abs(ax[0]) > 1e-9 or abs(ax[2]) > 1e-9:
                raise ValueError(f"{env_name}: non-y hinge joint {j}")
            jnt_axis.append(np.zeros(2))
            jnt_sign.append(float(ax[1]))
        else:
            raise ValueError(f"{env_name}: unsupported joint type {t}")
        jnt_body.append(int(m.jnt_bodyid[j]))
        jnt_type.append(t)
        jnt_anchor.append(np.asarray(m.jnt_pos[j])[[0, 2]])

    # actuators must be direct joint-torque transmissions
    act_dof, gear = [], []
    for a in range(m.nu):
        j = int(m.actuator_trnid[a, 0])
        act_dof.append(int(m.jnt_dofadr[j]))
        gear.append(float(m.actuator_gear[a, 0]))

    # floor friction: MuJoCo combines contact friction as the element-wise
    # MAX of the two geoms' vectors (equal priorities) — hopper's floor
    # defaults to mu=1.0 while its torso/thigh/leg capsules set 0.9.
    floor_mu = 0.0
    for g in range(m.ngeom):
        if int(m.geom_bodyid[g]) == 0:
            floor_mu = max(floor_mu, float(m.geom_friction[g][0]))

    # capsule segments on movable bodies (also the rasterizer's geometry),
    # then contact candidate points from endpoints+center / sphere centers
    geom_body, geom_a, geom_b, geom_radius = [], [], [], []
    cp_body, cp_offset, cp_radius, cp_friction = [], [], [], []
    for g in range(m.ngeom):
        b = int(m.geom_bodyid[g])
        if b == 0:
            continue  # the floor plane itself
        gtype = int(m.geom_type[g])
        pos = np.asarray(m.geom_pos[g])[[0, 2]]
        mu = max(float(m.geom_friction[g][0]), floor_mu)
        if gtype == _CAPSULE:
            half = float(m.geom_size[g][1])
            r = float(m.geom_size[g][0])
            ang = _quat_y_angle(m.geom_quat[g])
            # capsule axis = local +z rotated about +y by ang: (sin, cos)
            axis = np.array([np.sin(ang), np.cos(ang)])
            geom_body.append(b)
            geom_a.append(pos - half * axis)
            geom_b.append(pos + half * axis)
            geom_radius.append(r)
            for s in (-1.0, 0.0, 1.0):
                cp_body.append(b)
                cp_offset.append(pos + s * half * axis)
                cp_radius.append(r)
                cp_friction.append(mu)
        elif gtype == _SPHERE:
            r = float(m.geom_size[g][0])
            geom_body.append(b)
            geom_a.append(pos)
            geom_b.append(pos)
            geom_radius.append(r)
            cp_body.append(b)
            cp_offset.append(pos)
            cp_radius.append(r)
            cp_friction.append(mu)
        # other geom types (plane handled above) unsupported -> skip

    use_rk4 = int(m.opt.integrator) == 1  # mjINT_RK4
    # RK4 models (hopper/walker2d, dt=0.002) are contact-stable as-is;
    # Euler models (halfcheetah, dt=0.01) need substeps (see PlanarModel).
    n_substeps = 1 if use_rk4 else 5

    dof_damping = np.zeros(m.njnt)
    dof_armature = np.zeros(m.njnt)
    for j in range(m.njnt):
        dof_damping[j] = m.dof_damping[m.jnt_dofadr[j]]
        dof_armature[j] = m.dof_armature[m.jnt_dofadr[j]]

    f32 = lambda x: jnp.asarray(np.asarray(x), jnp.float32)
    return PlanarModel(
        parent=parent,
        body_pos=f32(body_pos),
        body_ipos=f32(body_ipos),
        mass=f32(m.body_mass),
        # Body-frame yy inertia: MuJoCo stores principal inertia in the
        # iframe (body_iquat), which need not be a pure y-rotation (the
        # halfcheetah torso's head capsule tilts its principal axes); rotate
        # the tensor back: I_yy = Σ_k I_k R[1,k]² with R = mat(iquat).
        iyy=f32(
            np.array(
                [
                    float(
                        np.sum(
                            np.asarray(m.body_inertia[b])
                            * _quat_to_mat(m.body_iquat[b])[1, :] ** 2
                        )
                    )
                    for b in range(m.nbody)
                ]
            )
        ),
        jnt_body=tuple(jnt_body),
        jnt_type=tuple(jnt_type),
        jnt_axis=f32(np.asarray(jnt_axis)),
        jnt_sign=f32(np.asarray(jnt_sign)),
        jnt_anchor=f32(np.asarray(jnt_anchor)),
        qpos0=f32(m.qpos0),
        jnt_range=f32(m.jnt_range),
        jnt_limited=f32(np.asarray(m.jnt_limited, np.float32)),
        damping=f32(dof_damping),
        armature=f32(dof_armature),
        stiffness=f32(m.jnt_stiffness),
        springref=f32(m.qpos_spring),
        act_dof=jnp.asarray(np.asarray(act_dof), jnp.int32),
        gear=f32(np.asarray(gear)),
        ctrlrange=f32(m.actuator_ctrlrange),
        geom_body=tuple(geom_body),
        geom_a=f32(np.asarray(geom_a)),
        geom_b=f32(np.asarray(geom_b)),
        geom_radius=f32(np.asarray(geom_radius)),
        cp_body=jnp.asarray(np.asarray(cp_body), jnp.int32),
        cp_offset=f32(np.asarray(cp_offset)),
        cp_radius=f32(np.asarray(cp_radius)),
        cp_friction=f32(np.asarray(cp_friction)),
        dt=float(m.opt.timestep),
        gravity=float(-m.opt.gravity[2]),
        use_rk4=use_rk4,
        n_substeps=n_substeps,
        contact_stiffness=contact_stiffness,
        contact_damping=contact_damping,
        slip_velocity=slip_velocity,
        limit_stiffness=limit_stiffness,
        limit_damping=limit_damping,
        contact_model=contact_model,
    )


# ---------------------------------------------------------------------------
# Kinematics & Lagrangian dynamics (pure JAX)
# ---------------------------------------------------------------------------


def _rot(theta):
    """Rotation about +y acting on (x, z): x' = c x + s z, z' = -s x + c z."""
    c, s = jnp.cos(theta), jnp.sin(theta)
    return jnp.array([[c, s], [-s, c]])


def forward_kinematics(
    model: PlanarModel, qpos: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Body frame poses: positions (nbody, 2) and angles (nbody,).

    MuJoCo composition: within a body, joints apply sequentially; slide
    translations use the frame-so-far; hinges rotate the frame about their
    anchor. Coordinates are relative to ``qpos0`` (the XML ``ref``), which is
    how MuJoCo interprets qpos (validated vs mj_kinematics)."""
    nbody = len(model.parent)
    q = qpos - model.qpos0
    pos = [jnp.zeros(2, qpos.dtype)]
    th = [jnp.zeros((), qpos.dtype)]
    # joints grouped by owning body, in model order
    for b in range(1, nbody):
        p = model.parent[b]
        P = pos[p] + _rot(th[p]) @ model.body_pos[b].astype(qpos.dtype)
        T = th[p]
        for j in range(len(model.jnt_body)):
            if model.jnt_body[j] != b:
                continue
            if model.jnt_type[j] == _SLIDE:
                P = P + _rot(T) @ (model.jnt_axis[j].astype(qpos.dtype) * q[j])
            else:
                anchor = model.jnt_anchor[j].astype(qpos.dtype)
                A = P + _rot(T) @ anchor
                T = T + model.jnt_sign[j] * q[j]
                P = A - _rot(T) @ anchor
        pos.append(P)
        th.append(T)
    return jnp.stack(pos), jnp.stack(th)


def com_positions(model: PlanarModel, qpos: jnp.ndarray) -> jnp.ndarray:
    pos, th = forward_kinematics(model, qpos)
    offsets = jax.vmap(lambda t, o: _rot(t) @ o)(
        th, model.body_ipos.astype(qpos.dtype)
    )
    return pos + offsets


def mass_matrix(model: PlanarModel, qpos: jnp.ndarray) -> jnp.ndarray:
    """M(q) = Σ_b m_b J_comᵀ J_com + I_yy J_θᵀ J_θ + diag(armature)."""

    def kin(q):
        coms = com_positions(model, q)
        _, th = forward_kinematics(model, q)
        return coms, th

    (Jc, Jt) = jax.jacfwd(kin)(qpos)  # (nbody,2,nj), (nbody,nj)
    M = (
        jnp.einsum("b,bij,bik->jk", model.mass.astype(qpos.dtype), Jc, Jc)
        + jnp.einsum("b,bj,bk->jk", model.iyy.astype(qpos.dtype), Jt, Jt)
    )
    return M + jnp.diag(model.armature.astype(qpos.dtype))


def bias_forces(
    model: PlanarModel, qpos: jnp.ndarray, qvel: jnp.ndarray
) -> jnp.ndarray:
    """c(q, q̇) with gravity, such that M q̈ + c = τ_applied (matches
    MuJoCo's mj_rne with flg_acc=0). Lagrangian identity in terms of one
    mass-matrix Jacobian: c_i = (∂M_ij/∂q_k − ½ ∂M_jk/∂q_i) q̇_j q̇_k
    + ∂V/∂q_i — a single jacfwd over M instead of separate ∂(Mq̇)/∂q and
    ∇T passes."""
    dM = jax.jacfwd(lambda q: mass_matrix(model, q))(qpos)  # dM_ij/dq_k

    def potential(q):
        coms = com_positions(model, q)
        return model.gravity * jnp.sum(
            model.mass.astype(q.dtype) * coms[:, 1]
        )

    coriolis = jnp.einsum("ijk,j,k->i", dM, qvel, qvel) - 0.5 * jnp.einsum(
        "jki,j,k->i", dM, qvel, qvel
    )
    return coriolis + jax.grad(potential)(qpos)


def _contact_points(model: PlanarModel, qpos: jnp.ndarray) -> jnp.ndarray:
    """World positions of the contact candidate points, (ncp, 2) = (x, z)."""
    pos, th = forward_kinematics(model, qpos)
    body_pos = pos[model.cp_body]
    body_th = th[model.cp_body]
    offs = jax.vmap(lambda t, o: _rot(t) @ o)(
        body_th, model.cp_offset.astype(qpos.dtype)
    )
    return body_pos + offs


def contact_forces(
    model: PlanarModel, qpos: jnp.ndarray, qvel: jnp.ndarray
) -> jnp.ndarray:
    """Generalized forces from penalty ground contact at the candidate
    points: spring-damper normal (one-sided) + tanh-regularized Coulomb
    friction, mapped through point Jacobians (Jᵀ f)."""
    P = _contact_points(model, qpos)  # (ncp, 2)
    J = jax.jacfwd(lambda q: _contact_points(model, q))(qpos)  # (ncp, 2, nj)
    V = jnp.einsum("pij,j->pi", J, qvel)  # point velocities

    pen = model.cp_radius.astype(qpos.dtype) - P[:, 1]  # > 0 when penetrating
    active = pen > 0.0
    fn = jnp.where(
        active,
        model.contact_stiffness * pen - model.contact_damping * V[:, 1],
        0.0,
    )
    fn = jnp.maximum(fn, 0.0)  # unilateral
    ft = (
        -model.cp_friction.astype(qpos.dtype)
        * fn
        * jnp.tanh(V[:, 0] / model.slip_velocity)
    )
    F = jnp.stack([ft, fn], axis=-1)  # (ncp, 2)
    return jnp.einsum("pij,pi->j", J, F)


def passive_and_limit_forces(
    model: PlanarModel, qpos: jnp.ndarray, qvel: jnp.ndarray
) -> jnp.ndarray:
    """Joint damping + spring stiffness (MuJoCo qfrc_passive) and one-sided
    joint-limit penalty springs (approximating the limit constraints).
    In "constraint" mode limits are impulses (``contact_projection``),
    not forces."""
    passive = -model.damping.astype(qpos.dtype) * qvel - model.stiffness.astype(
        qpos.dtype
    ) * (qpos - model.springref.astype(qpos.dtype))
    if model.contact_model == "constraint":
        return passive
    lo, hi = model.jnt_range[:, 0], model.jnt_range[:, 1]
    below = jnp.maximum(lo.astype(qpos.dtype) - qpos, 0.0)
    above = jnp.maximum(qpos - hi.astype(qpos.dtype), 0.0)
    viol = below - above  # signed restoring direction
    in_violation = ((below > 0) | (above > 0)).astype(qpos.dtype)
    limit = model.jnt_limited.astype(qpos.dtype) * (
        model.limit_stiffness * viol
        - model.limit_damping * in_violation * qvel
    )
    return passive + limit


def applied_torques(model: PlanarModel, ctrl: jnp.ndarray) -> jnp.ndarray:
    # MuJoCo clamps data.ctrl to the actuator ctrlrange (ctrllimited in all
    # three task XMLs) — without this, out-of-range actions would apply
    # torques gym.make can never produce.
    ctrl = jnp.clip(
        ctrl,
        model.ctrlrange[:, 0].astype(ctrl.dtype),
        model.ctrlrange[:, 1].astype(ctrl.dtype),
    )
    nj = len(model.jnt_body)
    tau = jnp.zeros((nj,), ctrl.dtype)
    return tau.at[model.act_dof].add(model.gear.astype(ctrl.dtype) * ctrl)


def qacc(
    model: PlanarModel,
    qpos: jnp.ndarray,
    qvel: jnp.ndarray,
    ctrl: jnp.ndarray,
    implicit_damping_dt: float = 0.0,
) -> jnp.ndarray:
    """Smooth + contact forward dynamics. ``implicit_damping_dt`` > 0 adds
    h·diag(damping) to M — MuJoCo's Euler integrator integrates joint
    damping implicitly (mj_Euler); RK4 does not."""
    M = mass_matrix(model, qpos)
    if implicit_damping_dt:
        M = M + implicit_damping_dt * jnp.diag(model.damping.astype(qpos.dtype))
    rhs = (
        applied_torques(model, ctrl)
        + passive_and_limit_forces(model, qpos, qvel)
        - bias_forces(model, qpos, qvel)
    )
    if model.contact_model != "constraint":
        rhs = rhs + contact_forces(model, qpos, qvel)
    return jnp.linalg.solve(M, rhs)


def _limited_joints(model: PlanarModel) -> list:
    """Static list of limited joint indices (planar models have one dof per
    joint in model order, so joint index == dof index == qpos index)."""
    limited = np.asarray(model.jnt_limited)
    return [j for j in range(len(model.jnt_body)) if float(limited[j]) > 0.0]


def contact_projection(
    model: PlanarModel,
    qpos: jnp.ndarray,
    qvel: jnp.ndarray,
    h: float,
    n_iters: int = 8,
    beta: float = 0.2,
    max_bias_vel: float = 2.0,
) -> jnp.ndarray:
    """Ground contact + joint limits as velocity-level unilateral constraints
    solved by projected Gauss–Seidel impulses — MuJoCo's own solver family
    (the reference trains on gym.make envs whose contacts come from the
    mjCONSTRAINT solver, reference examples/train_mujoco.py:41-70; this is
    the port of envs/rigid3d.py::limit_projection extended with contact
    normals and a friction-cone box clamp).

    Rows, swept in order each PGS iteration:
    - joint limits: for each limited joint in violation, λ ≥ 0 along the
      outward normal ±e_j enforcing n_j·v' ≥ bias_j;
    - contact normals: for each penetrating candidate point, λ_n ≥ 0 along
      the world +z row of the point Jacobian enforcing separation velocity
      ≥ bias (Baumgarte: removes the position error over a few substeps,
      capped at ``max_bias_vel`` so deep penetrations don't pop);
    - contact friction: tangential impulse driving the slip velocity to 0,
      clamped to the Coulomb box |λ_t| ≤ μ·λ_n (re-read every sweep, so the
      cone tracks the converging normal impulse).

    Impulses couple through M⁻¹ (Δv = M⁻¹ Jᵀ λ). Unlike the penalty model
    this cannot inject energy into contact cycles, and stance friction is
    exactly sticking below the cone — the measured failure of the penalty
    model was fused HopperPlanar pinned at eval ~30 (never leaves stance)
    vs 255-322 for the identical agent stack on host MuJoCo Hopper."""
    dtype = qpos.dtype
    ncp = int(model.cp_offset.shape[0])

    # contact rows at the current configuration
    P = _contact_points(model, qpos)  # (ncp, 2)
    J = jax.jacfwd(lambda q: _contact_points(model, q))(qpos)  # (ncp, 2, nj)
    pen = model.cp_radius.astype(dtype) - P[:, 1]  # > 0 when penetrating
    c_active = (pen > 0.0).astype(dtype)
    c_bias = jnp.minimum(
        beta * jnp.maximum(pen, 0.0) / jnp.asarray(h, dtype), max_bias_vel
    )
    Jn = J[:, 1, :]  # (ncp, nj) world-z rows
    Jt = J[:, 0, :]  # (ncp, nj) world-x rows
    mu = model.cp_friction.astype(dtype)

    # limit rows (static set; planar joint index == dof index)
    lim = _limited_joints(model)
    nl = len(lim)
    lim_idx = jnp.asarray(lim) if nl else jnp.zeros((0,), jnp.int32)
    lo = model.jnt_range[lim_idx, 0].astype(dtype)
    hi = model.jnt_range[lim_idx, 1].astype(dtype)
    q_l = qpos[lim_idx]
    c_lo = lo - q_l
    c_hi = q_l - hi
    n_l = jnp.where(c_lo > c_hi, 1.0, -1.0).astype(dtype)
    viol = jnp.maximum(jnp.maximum(c_lo, c_hi), 0.0)
    l_active = (viol > 0.0).astype(dtype)
    l_bias = jnp.minimum(beta * viol / jnp.asarray(h, dtype), max_bias_vel)

    minv = jnp.linalg.inv(mass_matrix(model, qpos))
    eps = jnp.asarray(1e-9, dtype)
    cols_n = minv @ Jn.T  # (nj, ncp): Δv per unit normal impulse
    a_n = jnp.einsum("pi,ip->p", Jn, cols_n) + eps
    cols_t = minv @ Jt.T
    a_t = jnp.einsum("pi,ip->p", Jt, cols_t) + eps
    cols_l = minv[:, lim_idx] * n_l[None, :]  # (nj, nl)
    a_l = jnp.diagonal(minv[lim_idx][:, lim_idx]) + eps if nl else None

    def gs_sweep(carry):
        v, lam_l, lam_n, lam_t = carry
        for i in range(nl):  # static unroll
            dl = (l_bias[i] - n_l[i] * v[lim_idx[i]]) / a_l[i]
            new = jnp.maximum(lam_l[i] + dl, 0.0) * l_active[i]
            v = v + cols_l[:, i] * (new - lam_l[i])
            lam_l = lam_l.at[i].set(new)
        for p in range(ncp):  # static unroll
            dl = (c_bias[p] - Jn[p] @ v) / a_n[p]
            new = jnp.maximum(lam_n[p] + dl, 0.0) * c_active[p]
            v = v + cols_n[:, p] * (new - lam_n[p])
            lam_n = lam_n.at[p].set(new)
            dl = -(Jt[p] @ v) / a_t[p]
            cone = mu[p] * lam_n[p]
            new = jnp.clip(lam_t[p] + dl, -cone, cone) * c_active[p]
            v = v + cols_t[:, p] * (new - lam_t[p])
            lam_t = lam_t.at[p].set(new)
        return v, lam_l, lam_n, lam_t

    v, _, _, _ = jax.lax.fori_loop(
        0,
        n_iters,
        lambda _, c: gs_sweep(c),
        (
            qvel,
            jnp.zeros((nl,), dtype),
            jnp.zeros((ncp,), dtype),
            jnp.zeros((ncp,), dtype),
        ),
    )
    return v


def step_physics(
    model: PlanarModel,
    qpos: jnp.ndarray,
    qvel: jnp.ndarray,
    ctrl: jnp.ndarray,
    frame_skip: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Advance ``frame_skip`` model timesteps with MuJoCo's integrator for
    this model (RK4 or implicit-damping semi-implicit Euler), each split into
    ``model.n_substeps`` integration substeps."""
    h = jnp.asarray(model.dt / model.n_substeps, qpos.dtype)
    h_f = float(model.dt / model.n_substeps)
    constraint = model.contact_model == "constraint"
    # the physics state dtype is authoritative (an f64 action under x64 must
    # not promote the integration carry)
    ctrl = ctrl.astype(qpos.dtype)

    if model.use_rk4:

        def deriv(q, qd):
            return qd, qacc(model, q, qd, ctrl)

        def substep(carry, _):
            q, qd = carry
            k1q, k1v = deriv(q, qd)
            k2q, k2v = deriv(q + 0.5 * h * k1q, qd + 0.5 * h * k1v)
            k3q, k3v = deriv(q + 0.5 * h * k2q, qd + 0.5 * h * k2v)
            k4q, k4v = deriv(q + h * k3q, qd + h * k3v)
            q = q + (h / 6.0) * (k1q + 2 * k2q + 2 * k3q + k4q)
            qd = qd + (h / 6.0) * (k1v + 2 * k2v + 2 * k3v + k4v)
            if constraint:
                # impulses at the post-step configuration (the pattern
                # validated in rigid3d; Baumgarte removes the one-substep
                # penetration next substep)
                qd = contact_projection(model, q, qd, h_f)
            return (q, qd), None

    else:

        def substep(carry, _):
            q, qd = carry
            a = qacc(model, q, qd, ctrl, implicit_damping_dt=h_f)
            qd = qd + h * a
            if constraint:
                # project BEFORE the position update (semi-implicit): the
                # position then advances with the constrained velocity, so
                # penetration cannot grow within a substep
                qd = contact_projection(model, q, qd, h_f)
            q = q + h * qd
            return (q, qd), None

    (qpos, qvel), _ = jax.lax.scan(
        substep, (qpos, qvel), None, length=frame_skip * model.n_substeps
    )
    return qpos, qvel


# ---------------------------------------------------------------------------
# JaxEnv binding (exact Gymnasium task semantics on approximate contacts)
# ---------------------------------------------------------------------------


class PlanarMJCEnv(JaxEnv):
    """On-device planar-physics env for Hopper/Walker2d/HalfCheetah with the
    exact Gymnasium ``-v4`` task semantics layer (envs/mujoco_tasks.py) on
    top. Physics is this module's engine with PGS constraint contacts by
    default (``contact_model="penalty"`` selects the legacy spring model) —
    honest labeling: returns are NOT directly comparable to gym.make returns
    (the contact solve is approximate); use MJXEnv where mujoco-mjx is
    available."""

    PLANAR_TASKS = ("Hopper-v4", "Walker2d-v4", "HalfCheetah-v4")

    def __init__(self, env_name: str, **penalty_overrides):
        if env_name not in self.PLANAR_TASKS:
            raise ValueError(
                f"{env_name} is not a planar task; have {self.PLANAR_TASKS}"
            )
        self.env_name = env_name
        self.spec = TASK_SPECS[env_name]
        self.model = extract_planar_model(env_name, **penalty_overrides)
        self.nq = len(self.model.jnt_body)
        self.observation_dim = int(
            task_observation(
                self.spec,
                MjPhysicsFields(
                    qpos=jnp.zeros(self.nq), qvel=jnp.zeros(self.nq)
                ),
            ).shape[0]
        )
        self.action_dim = int(self.model.act_dof.shape[0])
        # Gymnasium's action space is Box(ctrlrange); per-actuator arrays so
        # scale_action honors heterogeneous/asymmetric ranges (same contract
        # as MJXEnv). All three planar tasks use +-1.
        self.action_low = self.model.ctrlrange[:, 0]
        self.action_high = self.model.ctrlrange[:, 1]
        self.max_episode_steps = self.spec.max_episode_steps
        self.dt = float(self.model.dt * self.spec.frame_skip)
        self.model_timestep = float(self.model.dt)

    def _fields(self, qpos, qvel) -> MjPhysicsFields:
        return MjPhysicsFields(qpos=qpos, qvel=qvel)

    def reset(self, key: jax.Array) -> EnvState:
        noise_key, carry_key = jax.random.split(key)
        qpos, qvel = reset_qpos_qvel(
            self.spec, noise_key, self.model.qpos0,
            jnp.zeros_like(self.model.qpos0),
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
