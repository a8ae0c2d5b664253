"""Validation of the from-scratch planar physics engine (envs/planar.py)
against host MuJoCo's OWN computations on the exact Gymnasium XMLs:

- forward kinematics vs ``mj_kinematics``
- mass matrix (incl. armature, iframe-rotated inertias) vs ``mj_fullM``
- bias forces (Coriolis + gravity) vs ``mj_rne(flg_acc=0)``
- whole contact-free trajectories vs ``mj_step`` (contacts+limits disabled),
  per-model integrator (RK4 for Hopper/Walker2d, implicit-damping Euler for
  HalfCheetah)

plus behavioral sanity of the penalty-contact approximation and the
fused-rollout integration. Run in float64 for the exactness checks (the
engine itself runs f32 in training).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

mujoco = pytest.importorskip("mujoco")
import gymnasium.envs.mujoco as gym_mujoco

from active_inference_diffusion_tpu.envs import planar
from active_inference_diffusion_tpu.envs.mujoco_tasks import TASK_SPECS

TASKS = ["Hopper-v4", "Walker2d-v4", "HalfCheetah-v4"]

_F64_FIELDS = [
    "body_pos", "body_ipos", "mass", "iyy", "jnt_axis", "jnt_sign",
    "jnt_anchor", "qpos0", "jnt_range", "jnt_limited", "damping", "armature",
    "stiffness", "springref", "gear", "cp_offset", "cp_radius", "cp_friction",
]


def host_model(name):
    spec = TASK_SPECS[name]
    xml = os.path.join(
        os.path.dirname(gym_mujoco.__file__), "assets", spec.xml_file
    )
    return mujoco.MjModel.from_xml_path(xml)


def f64_model(name, **kw):
    pm = planar.extract_planar_model(name, **kw)
    return pm._replace(
        **{k: jnp.asarray(getattr(pm, k), jnp.float64) for k in _F64_FIELDS}
    )


@pytest.fixture(scope="module", autouse=True)
def _x64():
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


@pytest.mark.parametrize("name", TASKS)
def test_kinematics_mass_matrix_bias_match_mujoco(name):
    m = host_model(name)
    d = mujoco.MjData(m)
    pm = f64_model(name)
    rng = np.random.default_rng(1)
    for _ in range(4):
        qpos = rng.uniform(-0.6, 0.6, m.nq)
        qvel = rng.uniform(-1.0, 1.0, m.nv)
        d.qpos[:] = qpos
        d.qvel[:] = qvel
        mujoco.mj_forward(m, d)

        pos, th = planar.forward_kinematics(pm, jnp.asarray(qpos))
        np.testing.assert_allclose(
            np.asarray(pos), d.xpos[:, [0, 2]], atol=1e-7
        )
        np.testing.assert_allclose(
            np.asarray(th),
            2 * np.arctan2(d.xquat[:, 2], d.xquat[:, 0]),
            atol=1e-7,
        )

        M = np.zeros((m.nv, m.nv))
        mujoco.mj_fullM(m, d, M)
        np.testing.assert_allclose(
            np.asarray(planar.mass_matrix(pm, jnp.asarray(qpos))), M, atol=1e-6
        )

        bias = np.zeros(m.nv)
        mujoco.mj_rne(m, d, 0, bias)
        np.testing.assert_allclose(
            np.asarray(
                planar.bias_forces(pm, jnp.asarray(qpos), jnp.asarray(qvel))
            ),
            bias,
            atol=1e-5,
        )


@pytest.mark.parametrize("name", TASKS)
def test_contact_free_trajectory_matches_mj_step(name):
    """50 model steps of actuated flight match mj_step with contacts and
    limit constraints disabled — integrator-for-integrator (RK4 or
    implicit-damping Euler)."""
    m = host_model(name)
    m.opt.disableflags |= (
        mujoco.mjtDisableBit.mjDSBL_CONTACT | mujoco.mjtDisableBit.mjDSBL_LIMIT
    )
    d = mujoco.MjData(m)
    rng = np.random.default_rng(2)
    qpos = np.array(m.qpos0)
    qpos[1] += 2.0  # well above the floor
    qvel = rng.uniform(-0.5, 0.5, m.nv)
    ctrl = rng.uniform(-0.3, 0.3, m.nu)
    d.qpos[:] = qpos
    d.qvel[:] = qvel
    d.ctrl[:] = ctrl
    for _ in range(50):
        mujoco.mj_step(m, d)

    pm = f64_model(name)
    # exact-integration mode: no substepping, limits off
    pm = pm._replace(
        n_substeps=1, jnt_limited=jnp.zeros_like(pm.jnt_limited)
    )
    q, qd = planar.step_physics(
        pm, jnp.asarray(qpos), jnp.asarray(qvel), jnp.asarray(ctrl), 50
    )
    np.testing.assert_allclose(np.asarray(q), d.qpos, atol=1e-6)
    np.testing.assert_allclose(np.asarray(qd), d.qvel, atol=1e-5)


@pytest.mark.parametrize("name", TASKS)
def test_env_contact_stability_and_semantics(name):
    """Penalty contacts keep the rollout finite; the env exposes the exact
    -v4 observation dims and terminates on unhealthy states where the task
    does."""
    env = planar.PlanarMJCEnv(name)
    g = host_model(name)
    assert env.observation_dim == {
        "Hopper-v4": 11, "Walker2d-v4": 17, "HalfCheetah-v4": 17
    }[name]
    assert env.action_dim == g.nu

    step = jax.jit(env.step)
    state = env.reset(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    terminated_seen = False
    for _ in range(150):
        key, k = jax.random.split(key)
        a = jax.random.uniform(k, (env.action_dim,), minval=-1.0, maxval=1.0)
        state = step(state, a)
        assert bool(jnp.isfinite(state.obs).all())
        assert bool(jnp.isfinite(state.reward))
        terminated_seen |= bool(state.terminated)
    if TASK_SPECS[name].terminate_when_unhealthy:
        # a random policy falls over well within 150 steps
        assert terminated_seen


def test_floor_is_impenetrable_at_rest():
    """Zero-action Hopper settles with its foot resting ON the floor (small
    penalty penetration), never falling through."""
    env = planar.PlanarMJCEnv("Hopper-v4")
    state = env.reset(jax.random.PRNGKey(3))
    step = jax.jit(env.step)
    for _ in range(120):
        state = step(state, jnp.zeros(env.action_dim))
    qpos = state.physics[: env.nq]
    pos, th = planar.forward_kinematics(env.model, qpos)
    pts = jax.vmap(lambda b, o: pos[b] + planar._rot(th[b]) @ o)(
        env.model.cp_body, env.model.cp_offset
    )
    lowest = float(jnp.min(pts[:, 1] - env.model.cp_radius))
    assert lowest > -0.02  # <= 2 cm penalty penetration
    assert bool(jnp.isfinite(qpos).all())


def test_constraint_contacts_track_mj_step_hopping():
    """The PGS constraint solver (contact_model='constraint', the default)
    tracks full-contact mj_step on a scripted Hopper hopping trajectory to
    within a few cm of torso height — the regime where the penalty model
    measured ~2x worse (h RMSE 0.096 vs 0.047 over 100 control steps) and
    where fused training was pinned at eval ~30."""
    m = host_model("Hopper-v4")
    spec = TASK_SPECS["Hopper-v4"]
    d = mujoco.MjData(m)
    qpos0 = np.array(m.qpos0)
    d.qpos[:] = qpos0

    def ctrl_fn(t):
        return np.array([0.0, 0.0, -1.0 if (t % 20) < 8 else 1.0])

    heights_mj = []
    for t in range(100):
        d.ctrl[:] = ctrl_fn(t)
        for _ in range(spec.frame_skip):
            mujoco.mj_step(m, d)
        heights_mj.append(float(d.qpos[1]))

    pm = f64_model("Hopper-v4", contact_model="constraint")
    step = jax.jit(
        lambda q, qd, c: planar.step_physics(pm, q, qd, c, spec.frame_skip)
    )
    q = jnp.asarray(qpos0)
    qd = jnp.zeros(m.nv, jnp.float64)
    heights = []
    for t in range(100):
        q, qd = step(q, qd, jnp.asarray(ctrl_fn(t), jnp.float64))
        heights.append(float(q[1]))
    rmse = float(
        np.sqrt(np.mean((np.asarray(heights) - np.asarray(heights_mj)) ** 2))
    )
    assert rmse < 0.08, f"hopping torso-height RMSE vs mj_step: {rmse}"
    # it actually leaves the ground (flight phase) like mj_step does
    assert max(heights) > 1.28 and max(heights_mj) > 1.28
    assert np.isfinite(np.asarray(qd)).all()


def test_constraint_rest_clearance_is_tight():
    """At rest under the constraint solver, penetration is Baumgarte-bounded
    (~0.1 mm), vs up to 2 cm for the penalty spring."""
    env = planar.PlanarMJCEnv("Hopper-v4")  # default = constraint
    assert env.model.contact_model == "constraint"
    state = env.reset(jax.random.PRNGKey(3))
    step = jax.jit(env.step)
    for _ in range(120):
        state = step(state, jnp.zeros(env.action_dim))
    qpos = state.physics[: env.nq]
    pts = planar._contact_points(env.model, qpos)
    lowest = float(jnp.min(pts[:, 1] - env.model.cp_radius))
    assert lowest > -0.005
    assert bool(jnp.isfinite(state.physics).all())


def test_fused_collect_on_planar_env():
    from active_inference_diffusion_tpu.envs.jax_envs import (
        fused_collect,
        make_jax_env,
    )

    env = make_jax_env("HopperPlanar-v0")

    def random_policy(obs, key):
        return jax.random.uniform(
            key, (obs.shape[0], env.action_dim), minval=-1.0, maxval=1.0
        )

    transitions, states = jax.jit(
        lambda k: fused_collect(env, random_policy, k, 4, 10)
    )(jax.random.PRNGKey(0))
    assert transitions.observations.shape == (10, 4, env.observation_dim)
    assert np.isfinite(np.asarray(transitions.rewards)).all()
    # terminated is real MDP termination (hopper falls eventually, but not
    # necessarily in 10 steps) and stays boolean
    assert transitions.terminateds.dtype == bool


def test_planar_pixels_render_and_rollout():
    """On-device rendered pixel MuJoCo tasks: uint8 stacked frames with the
    body and floor visible, advancing with physics."""
    from active_inference_diffusion_tpu.envs.jax_envs import (
        fused_collect,
        make_jax_env,
    )
    from active_inference_diffusion_tpu.envs.pixel_render import (
        make_planar_pixels,
    )

    env = make_planar_pixels("Hopper-v4", size=32, frame_stack=2)
    state = env.reset(jax.random.PRNGKey(0))
    assert state.obs.shape == (6, 32, 32) and state.obs.dtype == jnp.uint8
    f0 = np.asarray(state.obs[-3:])
    # body + floor occupy a nontrivial fraction of the frame
    assert 0.05 < float((f0 < 250).any(axis=0).mean()) < 0.9

    step = jax.jit(env.step)
    for i in range(6):
        state = step(state, jnp.ones(env.action_dim) * (-1.0) ** i)
    assert not np.array_equal(np.asarray(state.obs[-3:]), f0)
    # frame stack advanced: oldest channel block != newest
    assert not np.array_equal(
        np.asarray(state.obs[:3]), np.asarray(state.obs[-3:])
    )

    # registry name + fused rollout
    env2 = make_jax_env("HalfCheetahPlanarPixels-v0")
    assert env2.obs_shape[0] == 9

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
