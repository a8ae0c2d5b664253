"""Cross-validation of the pure-JAX Gymnasium -v4 task semantics
(envs/mujoco_tasks.py) against the installed host Gymnasium MuJoCo envs.

The semantics layer must reproduce gym's observation/reward/termination
bit-for-bit (up to float32) on IDENTICAL physics states: we step the host
env, extract the physics fields before/after each step, feed them to the
pure functions, and compare with what gym itself returned. This validates
the layer the MJX adapter binds on-device (envs/mjx_env.py) independently
of the physics engine — the SURVEY hard-part-#1 parity evidence
(reference trains via gym.make, examples/train_mujoco.py:41-70).
"""

import warnings

import numpy as np
import pytest

from active_inference_diffusion_tpu.envs.mujoco_tasks import (
    MjPhysicsFields,
    TASK_SPECS,
    is_healthy,
    observation_dim,
    reset_qpos_qvel,
    task_observation,
    task_reward,
    task_terminated,
)

gym = pytest.importorskip("gymnasium")

TASKS = sorted(TASK_SPECS)


def make_env(name):
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        return gym.make(name)


def extract_fields(env, spec):
    data = env.unwrapped.data
    model = env.unwrapped.model
    torso_xpos = None
    if spec.forward_from == "torso":
        import mujoco

        tid = mujoco.mj_name2id(model, mujoco.mjtObj.mjOBJ_BODY, "torso")
        torso_xpos = data.xpos[tid].copy()
    return MjPhysicsFields(
        qpos=data.qpos.copy(),
        qvel=data.qvel.copy(),
        cinert=data.cinert.copy(),
        cvel=data.cvel.copy(),
        qfrc_actuator=data.qfrc_actuator.copy(),
        cfrc_ext=data.cfrc_ext.copy(),
        xipos=data.xipos.copy(),
        torso_xpos=torso_xpos,
    )


@pytest.mark.parametrize("task", TASKS)
def test_observation_dim_matches_gym(task):
    spec = TASK_SPECS[task]
    env = make_env(task)
    model = env.unwrapped.model
    assert observation_dim(spec, model.nq, model.nv, model.nbody) == (
        env.observation_space.shape[0]
    )
    env.close()


@pytest.mark.parametrize("task", TASKS)
def test_obs_reward_termination_match_gym(task):
    """Step host MuJoCo; our pure functions on the same states must
    reproduce gym's obs, reward, and terminated exactly (float32 tol)."""
    spec = TASK_SPECS[task]
    env = make_env(task)
    u = env.unwrapped
    body_mass = u.model.body_mass.copy()
    dt = u.dt
    model_timestep = u.model.opt.timestep

    rng = np.random.default_rng(0)
    env.reset(seed=0)
    steps = 0
    episodes = 0
    while steps < 60:
        f_before = extract_fields(env, spec)
        action = rng.uniform(
            u.action_space.low, u.action_space.high
        ).astype(np.float64)
        gym_obs, gym_reward, gym_terminated, gym_truncated, _ = env.step(action)
        f_after = extract_fields(env, spec)

        ours_obs = np.asarray(task_observation(spec, f_after))
        ours_reward = float(
            task_reward(
                spec, f_before, f_after, action, dt,
                body_mass=body_mass, model_timestep=model_timestep,
            )
        )
        ours_terminated = bool(task_terminated(spec, f_after.qpos, f_after.qvel))

        np.testing.assert_allclose(
            ours_obs, gym_obs, rtol=2e-5, atol=1e-5,
            err_msg=f"{task} obs mismatch at step {steps}",
        )
        assert ours_reward == pytest.approx(gym_reward, rel=2e-4, abs=2e-4), (
            f"{task} reward mismatch at step {steps}: {ours_reward} vs {gym_reward}"
        )
        assert ours_terminated == gym_terminated, f"{task} terminated mismatch"

        steps += 1
        if gym_terminated or gym_truncated:
            episodes += 1
            env.reset(seed=episodes)
    env.close()


@pytest.mark.parametrize(
    "task,qpos_edit,expect_terminated",
    [
        # Hopper: unhealthy z (torso too low)
        ("Hopper-v4", {1: 0.5}, True),
        # Hopper: unhealthy angle
        ("Hopper-v4", {2: 0.5}, True),
        # Hopper: healthy nominal stance
        ("Hopper-v4", {}, False),
        # Walker2d: z below healthy range
        ("Walker2d-v4", {1: 0.5}, True),
        # Walker2d: angle outside (-1, 1)
        ("Walker2d-v4", {2: 1.5}, True),
        ("Walker2d-v4", {}, False),
        # Ant: torso z below 0.2 (fallen)
        ("Ant-v4", {2: 0.1}, True),
        ("Ant-v4", {}, False),
        # Humanoid: z outside (1.0, 2.0)
        ("Humanoid-v4", {2: 0.8}, True),
        ("Humanoid-v4", {}, False),
        # HalfCheetah / HumanoidStandup never terminate
        ("HalfCheetah-v4", {}, False),
        ("HumanoidStandup-v4", {2: 0.0}, False),
    ],
)
def test_termination_conditions_match_gym(task, qpos_edit, expect_terminated):
    """Synthetic unhealthy states: set_state on the host env and compare
    gym's terminated predicate with ours on the same (qpos, qvel)."""
    spec = TASK_SPECS[task]
    env = make_env(task)
    u = env.unwrapped
    env.reset(seed=0)
    qpos = u.init_qpos.copy()
    qvel = u.init_qvel.copy()
    for idx, val in qpos_edit.items():
        qpos[idx] = val
    u.set_state(qpos, qvel)

    gym_terminated = bool(getattr(u, "terminated", False))
    ours = bool(task_terminated(spec, qpos, qvel))
    assert ours == gym_terminated == expect_terminated, (
        f"{task} {qpos_edit}: ours={ours} gym={gym_terminated} "
        f"expected={expect_terminated}"
    )
    env.close()


def test_hopper_healthy_state_range_uses_unclipped_qvel():
    """The healthy-state check reads the raw state vector, not the ±10
    clipped obs (hopper_v4.py state_vector): qvel 200 must terminate."""
    spec = TASK_SPECS["Hopper-v4"]
    qpos = np.array([0.0, 1.25, 0.0, 0.0, 0.0, 0.0])
    qvel = np.zeros(6)
    assert not bool(task_terminated(spec, qpos, qvel))
    qvel_bad = qvel.copy()
    qvel_bad[3] = 200.0
    assert bool(task_terminated(spec, qpos, qvel_bad))


@pytest.mark.parametrize("task", TASKS)
def test_reset_noise_ranges(task):
    """Reset noise honors the per-task Gymnasium scale and family:
    uniform stays within ±scale; the normal-qvel tasks (HalfCheetah, Ant)
    exceed it with enough samples."""
    import jax
    import jax.numpy as jnp

    spec = TASK_SPECS[task]
    env = make_env(task)
    u = env.unwrapped
    init_qpos = jnp.asarray(u.init_qpos)
    init_qvel = jnp.asarray(u.init_qvel)

    keys = jax.random.split(jax.random.PRNGKey(0), 256)
    qpos, qvel = jax.vmap(
        lambda k: reset_qpos_qvel(spec, k, init_qpos, init_qvel)
    )(keys)
    dq = np.asarray(qpos) - np.asarray(init_qpos)
    dv = np.asarray(qvel) - np.asarray(init_qvel)

    s = spec.reset_noise_scale
    assert np.abs(dq).max() <= s + 1e-6, f"{task} qpos noise exceeds scale"
    assert np.abs(dq).max() > 0.5 * s  # actually noisy
    if spec.qvel_noise == "normal":
        assert np.abs(dv).max() > s, f"{task} qvel should be normal-distributed"
        assert abs(np.std(dv) / s - 1.0) < 0.15
    else:
        assert np.abs(dv).max() <= s + 1e-6
    env.close()


def test_healthy_reward_paid_while_alive():
    """Hopper pays +1 healthy reward every non-terminated step (gym pays it
    even on the final unhealthy step when terminate_when_unhealthy)."""
    spec = TASK_SPECS["Hopper-v4"]
    qpos = np.array([0.0, 1.25, 0.0, 0.0, 0.0, 0.0])
    qvel = np.zeros(6)
    f = MjPhysicsFields(qpos=qpos, qvel=qvel)
    r = float(task_reward(spec, f, f, np.zeros(3), dt=0.008))
    assert r == pytest.approx(1.0)  # zero progress, zero ctrl => healthy only


def test_is_healthy_vector_api():
    spec = TASK_SPECS["Walker2d-v4"]
    qpos = np.array([0.0, 1.2, 0.0, 0, 0, 0, 0, 0, 0])
    qvel = np.zeros(9)
    assert bool(is_healthy(spec, qpos, qvel))


def test_mjx_env_errors_clearly_without_mjx():
    from active_inference_diffusion_tpu.envs.mjx_env import MJXEnv, mjx_available

    if mjx_available():
        pytest.skip("mjx installed; the executable path is covered below")
    with pytest.raises(ImportError, match="mujoco-mjx"):
        MJXEnv("HalfCheetah-v4")


@pytest.mark.skipif(
    not __import__(
        "active_inference_diffusion_tpu.envs.mjx_env", fromlist=["mjx_available"]
    ).mjx_available(),
    reason="mujoco-mjx not installed",
)
def test_mjx_env_runs_and_matches_host_reward():
    """When MJX is present: fused steps must produce finite obs/reward and
    per-task termination must fire from unhealthy states."""
    import jax
    import jax.numpy as jnp

    from active_inference_diffusion_tpu.envs.mjx_env import MJXEnv

    env = MJXEnv("Hopper-v4")
    state = env.reset(jax.random.PRNGKey(0))
    nxt = env.step(state, jnp.zeros(env.action_dim))
    assert np.isfinite(np.asarray(nxt.obs)).all()
    assert np.isfinite(float(nxt.reward))
    assert nxt.terminated.dtype == bool


def test_make_jax_env_routes_mujoco_names():
    from active_inference_diffusion_tpu.envs.jax_envs import make_jax_env
    from active_inference_diffusion_tpu.envs.mjx_env import mjx_available

    if mjx_available():
        env = make_jax_env("HalfCheetah-v4")
        assert env.observation_dim == 17
    else:
        with pytest.raises(ImportError, match="mujoco-mjx"):
            make_jax_env("HalfCheetah-v4")
    with pytest.raises(ValueError, match="Unknown JAX env"):
        make_jax_env("NoSuchEnv-v0")
