"""Validation of the 3D rigid-body engine (envs/rigid3d.py, Ant-v4) against
host MuJoCo's own computations — the same gates as the planar engine
(tests/test_planar_physics.py) plus the quaternion-manifold specifics:

- 3D forward kinematics (free joint + arbitrary-axis hinges) vs
  ``mj_kinematics`` (positions AND rotation matrices)
- mass matrix in qvel space (local-chart Jacobians, iframe-rotated full
  inertia tensors, armature) vs ``mj_fullM`` — this pins MuJoCo's free-joint
  velocity convention (world-frame linear, body-frame angular)
- bias forces via the Christoffel identity in the EXACT chart vs
  ``mj_rne(flg_acc=0)`` (a u=0-linearized angular Jacobian fails this at
  ~1e-2 — the gate that caught it)
- whole contact-free trajectories (manifold RK4 through the quaternion
  exponential) vs ``mj_step``
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

mujoco = pytest.importorskip("mujoco")
import gymnasium.envs.mujoco as gym_mujoco

from active_inference_diffusion_tpu.envs import rigid3d


@pytest.fixture(autouse=True, scope="module")
def _no_persistent_compile_cache():
    """Serializing this module's giant CPU executables (humanoid physics,
    perspective rasterizer) for the persistent compile cache crashes jaxlib
    — observed twice on 2026-08-19 as a Fatal abort / segfault inside
    compilation_cache.put_executable_and_time once host contention pushed
    their compile times over the cache threshold. Disable the cache for
    this module only; the rest of the suite keeps the warm-start benefit."""
    old = jax.config.jax_compilation_cache_dir
    jax.config.update("jax_compilation_cache_dir", None)
    yield
    jax.config.update("jax_compilation_cache_dir", old)

_F64_FIELDS = [
    "body_pos", "body_ipos", "mass", "inertia", "jnt_axis", "jnt_anchor",
    "qpos0", "jnt_range", "jnt_limited", "damping", "armature", "gear",
    "ctrlrange", "cp_offset", "cp_radius", "cp_friction",
]


def host_model(disable_constraints=False):
    xml = os.path.join(
        os.path.dirname(gym_mujoco.__file__), "assets", "ant.xml"
    )
    m = mujoco.MjModel.from_xml_path(xml)
    if disable_constraints:
        m.opt.disableflags |= (
            mujoco.mjtDisableBit.mjDSBL_CONTACT
            | mujoco.mjtDisableBit.mjDSBL_LIMIT
        )
    return m


def f64_model():
    pm = rigid3d.extract_rigid3d_model("Ant-v4")
    return pm._replace(
        **{k: jnp.asarray(getattr(pm, k), jnp.float64) for k in _F64_FIELDS}
    )


def random_state(m, rng):
    qpos = np.array(m.qpos0)
    qpos[0:3] += rng.uniform(-0.5, 0.5, 3)
    q = rng.normal(size=4)
    qpos[3:7] = q / np.linalg.norm(q)
    qpos[7:] = rng.uniform(-0.5, 0.5, m.nq - 7)
    qvel = rng.uniform(-1.0, 1.0, m.nv)
    return qpos, qvel


@pytest.fixture(scope="module", autouse=True)
def _x64():
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


def test_kinematics_match_mujoco():
    m = host_model()
    d = mujoco.MjData(m)
    pm = f64_model()
    rng = np.random.default_rng(0)
    for _ in range(4):
        qpos, _ = random_state(m, rng)
        d.qpos[:] = qpos
        mujoco.mj_kinematics(m, d)
        pos, rot = rigid3d.forward_kinematics(pm, jnp.asarray(qpos))
        np.testing.assert_allclose(np.asarray(pos), d.xpos, atol=1e-7)
        for b in range(m.nbody):
            Rm = np.zeros(9)
            mujoco.mju_quat2Mat(Rm, d.xquat[b])
            np.testing.assert_allclose(
                np.asarray(rot[b]), Rm.reshape(3, 3), atol=1e-7
            )


def test_mass_matrix_and_bias_match_mujoco():
    m = host_model()
    d = mujoco.MjData(m)
    pm = f64_model()
    rng = np.random.default_rng(1)
    for _ in range(4):
        qpos, qvel = random_state(m, rng)
        d.qpos[:] = qpos
        d.qvel[:] = qvel
        mujoco.mj_forward(m, d)
        M = np.zeros((m.nv, m.nv))
        mujoco.mj_fullM(m, d, M)
        np.testing.assert_allclose(
            np.asarray(rigid3d.mass_matrix(pm, jnp.asarray(qpos))),
            M, atol=1e-6,
        )
        bias = np.zeros(m.nv)
        mujoco.mj_rne(m, d, 0, bias)
        np.testing.assert_allclose(
            np.asarray(
                rigid3d.bias_forces(pm, jnp.asarray(qpos), jnp.asarray(qvel))
            ),
            bias, atol=1e-5,
        )


def test_contact_free_trajectory_matches_mj_step():
    m = host_model(disable_constraints=True)
    d = mujoco.MjData(m)
    pm = f64_model()
    pm = pm._replace(jnt_limited=jnp.zeros_like(pm.jnt_limited), n_substeps=1)
    rng = np.random.default_rng(2)
    qpos = np.array(m.qpos0)
    qpos[2] += 2.0  # well above the floor
    qvel = rng.uniform(-0.5, 0.5, m.nv)
    ctrl = rng.uniform(-0.3, 0.3, m.nu)
    d.qpos[:] = qpos
    d.qvel[:] = qvel
    d.ctrl[:] = ctrl
    for _ in range(50):
        mujoco.mj_step(m, d)
    q, qd = rigid3d.step_physics(
        pm, jnp.asarray(qpos), jnp.asarray(qvel), jnp.asarray(ctrl), 50
    )
    np.testing.assert_allclose(np.asarray(q), d.qpos, atol=1e-6)
    np.testing.assert_allclose(np.asarray(qd), d.qvel, atol=1e-5)


def test_env_contact_stability_and_semantics():
    env = rigid3d.Rigid3DEnv("Ant-v4")
    assert env.observation_dim == 27  # Ant-v4 default (no contact forces)
    assert env.action_dim == 8

    step = jax.jit(env.step)
    state = env.reset(jax.random.PRNGKey(0))
    # zero-action: settles on the floor within the healthy z range
    for _ in range(120):
        state = step(state, jnp.zeros(env.action_dim))
    z = float(state.physics[2])
    assert 0.1 < z < 1.0 and bool(jnp.isfinite(state.physics).all())

    state = env.reset(jax.random.PRNGKey(1))
    key = jax.random.PRNGKey(2)
    for _ in range(150):
        key, k = jax.random.split(key)
        a = jax.random.uniform(k, (8,), minval=-1.0, maxval=1.0)
        state = step(state, a)
        assert bool(jnp.isfinite(state.obs).all())
        assert bool(jnp.isfinite(state.reward))

    # termination predicate: drive the torso above the healthy z range
    high = state.replace(
        physics=state.physics.at[2].set(1.5), step_count=jnp.asarray(1, jnp.int32)
    )
    after = step(high, jnp.zeros(env.action_dim))
    # one step of free fall from z=1.5 stays > 1.0 -> unhealthy -> terminated
    assert bool(after.terminated)


def test_fused_collect_on_ant3d():
    from active_inference_diffusion_tpu.envs.jax_envs import (
        fused_collect,
        make_jax_env,
    )

    env = make_jax_env("Ant3D-v0")

    def random_policy(obs, key):
        return jax.random.uniform(
            key, (obs.shape[0], env.action_dim), minval=-1.0, maxval=1.0
        )

    transitions, _ = jax.jit(
        lambda k: fused_collect(env, random_policy, k, 3, 6)
    )(jax.random.PRNGKey(0))
    assert transitions.observations.shape == (6, 3, 27)
    assert np.isfinite(np.asarray(transitions.rewards)).all()
    assert transitions.terminateds.dtype == bool


# ---------------------------------------------------------------------------
# Humanoid: physics + c-frame observation layers validated against MuJoCo;
# the env runs on constraint-based joint limits (limit_projection).
# ---------------------------------------------------------------------------


def humanoid_host():
    xml = os.path.join(
        os.path.dirname(gym_mujoco.__file__), "assets", "humanoid.xml"
    )
    return mujoco.MjModel.from_xml_path(xml)


def humanoid_f64():
    pm = rigid3d.extract_rigid3d_model("Humanoid-v4")
    return pm._replace(
        **{k: jnp.asarray(getattr(pm, k), jnp.float64) for k in _F64_FIELDS}
    )


def test_humanoid_physics_matches_mujoco():
    """Free joint + 17 hinges + body quats + joint springs: FK, mass matrix,
    bias, and a 50-step contact-free trajectory all match MuJoCo."""
    m = humanoid_host()
    d = mujoco.MjData(m)
    pm = humanoid_f64()
    rng = np.random.default_rng(5)
    qpos, qvel = random_state(m, rng)
    d.qpos[:] = qpos
    d.qvel[:] = qvel
    mujoco.mj_forward(m, d)
    pos, _ = rigid3d.forward_kinematics(pm, jnp.asarray(qpos))
    np.testing.assert_allclose(np.asarray(pos), d.xpos, atol=1e-7)
    M = np.zeros((m.nv, m.nv))
    mujoco.mj_fullM(m, d, M)
    np.testing.assert_allclose(
        np.asarray(rigid3d.mass_matrix(pm, jnp.asarray(qpos))), M, atol=1e-6
    )
    bias = np.zeros(m.nv)
    mujoco.mj_rne(m, d, 0, bias)
    np.testing.assert_allclose(
        np.asarray(rigid3d.bias_forces(pm, jnp.asarray(qpos), jnp.asarray(qvel))),
        bias, atol=1e-4,
    )

    m2 = humanoid_host()
    m2.opt.disableflags |= (
        mujoco.mjtDisableBit.mjDSBL_CONTACT | mujoco.mjtDisableBit.mjDSBL_LIMIT
    )
    d2 = mujoco.MjData(m2)
    qpos = np.array(m2.qpos0)
    qpos[2] += 2.0
    qvel = rng.uniform(-0.5, 0.5, m2.nv)
    ctrl = rng.uniform(-0.3, 0.3, m2.nu)
    d2.qpos[:] = qpos
    d2.qvel[:] = qvel
    d2.ctrl[:] = ctrl
    for _ in range(50):
        mujoco.mj_step(m2, d2)
    pmt = pm._replace(jnt_limited=jnp.zeros_like(pm.jnt_limited), n_substeps=1)
    q, qd = rigid3d.step_physics(
        pmt, jnp.asarray(qpos), jnp.asarray(qvel), jnp.asarray(ctrl), 50
    )
    np.testing.assert_allclose(np.asarray(q), d2.qpos, atol=1e-6)
    np.testing.assert_allclose(np.asarray(qd), d2.qvel, atol=1e-4)


def test_humanoid_com_frame_fields_match_mujoco():
    """cinert and cvel (Humanoid's 376-dim obs building blocks) match
    mj_forward's own d.cinert / d.cvel exactly."""
    m = humanoid_host()
    d = mujoco.MjData(m)
    pm = humanoid_f64()
    rng = np.random.default_rng(6)
    qpos, qvel = random_state(m, rng)
    d.qpos[:] = qpos
    d.qvel[:] = qvel
    mujoco.mj_forward(m, d)
    cf = rigid3d.com_frame_fields(
        pm, jnp.asarray(qpos), jnp.asarray(qvel), jnp.zeros(17)
    )
    np.testing.assert_allclose(np.asarray(cf["cinert"]), d.cinert, atol=1e-5)
    np.testing.assert_allclose(np.asarray(cf["cvel"]), d.cvel, atol=1e-6)
    # qfrc_actuator layout: gear-scaled controls at the actuated dofs
    ctrl = rng.uniform(-1, 1, 17)
    d.ctrl[:] = ctrl
    mujoco.mj_forward(m, d)
    qa = np.asarray(
        rigid3d.applied_torques(pm, jnp.asarray(ctrl))
    )
    np.testing.assert_allclose(qa, d.qfrc_actuator, atol=1e-9)


def test_limit_projection_stops_outward_motion():
    """A hinge past its limit moving further out gets its outward velocity
    removed (plus a small Baumgarte push-back), coupled through M⁻¹."""
    pm = f64_model()
    lim = rigid3d._limited_hinges(pm)
    j = lim[0]
    qadr, dadr = pm.jnt_qposadr[j], pm.jnt_dofadr[j]
    hi = float(pm.jnt_range[j, 1])
    qpos = jnp.asarray(np.array(pm.qpos0)).at[2].add(2.0)
    qpos = qpos.at[qadr].set(hi + 0.05)  # beyond the upper limit
    qvel = jnp.zeros(pm.nv, jnp.float64).at[dadr].set(3.0)  # moving outward
    v = rigid3d.limit_projection(pm, qpos, qvel, h=1e-3)
    # outward velocity gone; Baumgarte bias pushes back toward the range
    assert float(v[dadr]) <= 1e-9
    # with every limited joint strictly in-range, any motion is untouched
    # (note Ant's qpos0 itself VIOLATES its ankle ranges [30deg, 70deg] —
    # in MuJoCo the limit constraint snaps them in-range at t=0, and
    # limit_projection correctly engages there too)
    qpos_mid = np.array(pm.qpos0)
    for jj in lim:
        qpos_mid[pm.jnt_qposadr[jj]] = float(
            0.5 * (pm.jnt_range[jj, 0] + pm.jnt_range[jj, 1])
        )
    free_j = lim[1]
    qvel2 = jnp.zeros(pm.nv, jnp.float64).at[pm.jnt_dofadr[free_j]].set(1.0)
    v2 = rigid3d.limit_projection(pm, jnp.asarray(qpos_mid), qvel2, h=1e-3)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(qvel2), atol=1e-12)


def test_humanoid_env_stable_under_max_torque():
    """The configuration that kept the env gated under limit springs:
    sustained max-gear torques. Constraint-based limits keep the state
    finite, velocities bounded, and joints pinned near their ranges."""
    env = rigid3d.Rigid3DEnv("Humanoid-v4")
    assert env.observation_dim == 376
    assert env.action_dim == 17

    step = jax.jit(env.step)
    state = env.reset(jax.random.PRNGKey(1))
    ones = jnp.ones(env.action_dim) * 0.4  # full ctrlrange
    for i in range(60):
        state = step(state, ones if i % 2 == 0 else -ones)
    assert bool(jnp.isfinite(state.physics).all())
    assert float(jnp.max(jnp.abs(state.physics[env.nq:]))) < 60.0

    lim = rigid3d._limited_hinges(env.model)
    qadr = np.asarray([env.model.jnt_qposadr[j] for j in lim])
    lo = np.asarray(env.model.jnt_range)[lim, 0]
    hi = np.asarray(env.model.jnt_range)[lim, 1]
    q = np.asarray(state.physics[: env.nq])[qadr]
    viol = np.maximum(np.maximum(lo - q, q - hi), 0.0)
    assert float(viol.max()) < 0.15  # radians; springs overflowed to NaN here

    # unhealthy-z termination (Humanoid healthy range is z in (1.0, 2.0))
    low = state.replace(
        physics=state.physics.at[2].set(0.5),
        step_count=jnp.asarray(1, jnp.int32),
    )
    after = step(low, jnp.zeros(env.action_dim))
    assert bool(after.terminated)


def test_rigid3d_pixels_render_and_rollout():
    """On-device rendered 3D pixels: perspective tracking camera, uint8
    stacked frames with body + checker floor visible, advancing with
    physics (the planar rasterizer's 3D sibling)."""
    from active_inference_diffusion_tpu.envs.jax_envs import (
        fused_collect,
        make_jax_env,
    )
    from active_inference_diffusion_tpu.envs.pixel_render import (
        make_rigid3d_pixels,
    )

    env = make_rigid3d_pixels("Ant-v4", size=32, frame_stack=2)
    state = env.reset(jax.random.PRNGKey(0))
    assert state.obs.shape == (6, 32, 32) and state.obs.dtype == jnp.uint8
    f0 = np.asarray(state.obs[-3:])
    # the ant + the checker floor give the frame real structure
    assert float(f0.std()) > 10.0

    step = jax.jit(env.step)
    for i in range(6):
        state = step(state, jnp.ones(env.action_dim) * (-1.0) ** i)
    assert not np.array_equal(np.asarray(state.obs[-3:]), f0)
    assert not np.array_equal(
        np.asarray(state.obs[:3]), np.asarray(state.obs[-3:])
    )

    # registry name + fused rollout
    env2 = make_jax_env("Ant3DPixels-v0")
    assert env2.obs_shape == (9, 84, 84)

    def random_policy(obs, key):
        return jax.random.uniform(
            key, (obs.shape[0], env.action_dim), minval=-1.0, maxval=1.0
        )

    transitions, _ = jax.jit(
        lambda k: fused_collect(env, random_policy, k, 2, 4)
    )(jax.random.PRNGKey(1))
    assert transitions.observations.shape == (4, 2, 6, 32, 32)
    assert transitions.observations.dtype == jnp.uint8
    assert np.isfinite(np.asarray(transitions.rewards)).all()


def test_humanoid_standup_env_smoke():
    env = rigid3d.Rigid3DEnv("HumanoidStandup-v4")
    assert env.observation_dim == 376
    step = jax.jit(env.step)
    state = env.reset(jax.random.PRNGKey(0))
    for _ in range(20):
        state = step(state, jnp.zeros(env.action_dim))
    assert bool(jnp.isfinite(state.obs).all())
    assert bool(jnp.isfinite(state.reward))
    # standup never terminates early (no healthy gate)
    assert not bool(state.terminated)
