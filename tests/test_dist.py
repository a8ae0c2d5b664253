"""Multi-device tests on the simulated 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from active_inference_diffusion_tpu.agents.state_agent import DiffusionStateAgent
from active_inference_diffusion_tpu.configs.config import (
    ActiveInferenceConfig,
    DiffusionConfig,
    TrainingConfig,
)
from active_inference_diffusion_tpu.parallel.dist_train import (
    make_dp_train_step,
    make_sharded_act,
)
from active_inference_diffusion_tpu.parallel.mesh import (
    make_mesh,
    param_pspecs,
    shard_batch,
)


def tiny_agent():
    cfg = ActiveInferenceConfig(
        observation_dim=5, action_dim=2, latent_dim=8, hidden_dim=64,
        score_num_layers=1, batch_size=16, efe_horizon=2, num_efe_trajectories=2,
        diffusion=DiffusionConfig(num_diffusion_steps=3, beta_schedule="linear"),
    )
    cfg.tpu.donate_buffers = False
    tcfg = TrainingConfig(buffer_size=64)
    return DiffusionStateAgent(5, 2, cfg, tcfg)


def make_batch(key, b=16):
    k = jax.random.split(key, 5)
    return {
        "observations": jax.random.normal(k[0], (b, 5)),
        "actions": jax.random.normal(k[1], (b, 2)),
        "rewards": jax.random.normal(k[2], (b,)),
        "next_observations": jax.random.normal(k[3], (b, 5)),
        "dones": jax.random.bernoulli(k[4], 0.1, (b,)),
    }


def test_eight_virtual_devices():
    assert jax.device_count() == 8


def test_mesh_construction():
    mesh = make_mesh()
    assert mesh.shape == {"dp": 8, "tp": 1}
    mesh2 = make_mesh(shape=(4, 2))
    assert mesh2.shape == {"dp": 4, "tp": 2}


def test_dp_train_step_matches_single_device():
    """GSPMD data-parallel step produces the same result as single-device."""
    agent = tiny_agent()
    state = agent.init_train_state(jax.random.PRNGKey(0))
    batch = make_batch(jax.random.PRNGKey(1))

    # single-device result
    s_single, m_single = agent._train_step(state, batch)

    # 8-way dp result
    mesh = make_mesh()
    train_step, place_state, place_batch = make_dp_train_step(
        agent, mesh, donate=False
    )
    s_dp, m_dp = train_step(place_state(state), place_batch(batch))

    np.testing.assert_allclose(
        float(m_single["policy_loss"]), float(m_dp["policy_loss"]), rtol=2e-4, atol=1e-5
    )
    # parameters agree across the two compilations
    for group in ("policy", "value", "dynamics"):
        a = jax.tree_util.tree_leaves(s_single.params[group])
        b = jax.tree_util.tree_leaves(s_dp.params[group])
        for x, y in zip(a, b):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=5e-3, atol=1e-4)


def test_tp_param_specs():
    agent = tiny_agent()
    state = agent.init_train_state(jax.random.PRNGKey(0))
    specs = param_pspecs(state.params, tp_size=2)
    leaves = jax.tree_util.tree_leaves(
        specs, is_leaf=lambda x: isinstance(x, jax.sharding.PartitionSpec)
    )
    # at least one kernel is tensor-sharded
    assert any(s != jax.sharding.PartitionSpec() for s in leaves)


def test_dp_tp_train_step_runs():
    """2-way tensor parallel x 4-way data parallel compiles and executes."""
    agent = tiny_agent()
    state = agent.init_train_state(jax.random.PRNGKey(0))
    batch = make_batch(jax.random.PRNGKey(1))
    mesh = make_mesh(shape=(4, 2))
    train_step, place_state, place_batch = make_dp_train_step(
        agent, mesh, tp_size=2, donate=False
    )
    s2, metrics = train_step(place_state(state), place_batch(batch))
    assert np.isfinite(float(metrics["policy_loss"]))
    assert np.isfinite(float(metrics["score_matching_loss"]))


def test_sharded_act():
    agent = tiny_agent()
    state = agent.init_train_state(jax.random.PRNGKey(0))
    mesh = make_mesh(shape=(8, 1))
    act = make_sharded_act(agent, mesh, num_steps=2)
    obs = jax.random.normal(jax.random.PRNGKey(2), (16, 5))
    obs = jax.device_put(
        obs, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("dp"))
    )
    actions = act(state.params, jax.random.PRNGKey(3), obs, jnp.asarray(0.1))
    assert actions.shape == (16, 2)
    assert np.isfinite(np.asarray(actions)).all()
    # shards used distinct fold_in keys -> actions differ across shards
    a = np.asarray(actions)
    assert not np.allclose(a[:2], a[2:4])


def test_sharded_fused_collect():
    """Envs-over-devices fused rollout: transitions come back dp-sharded on
    the env axis, shards draw decorrelated randomness, and the carried env
    states round-trip through a second collect."""
    from active_inference_diffusion_tpu.envs.jax_envs import (
        Pendulum,
        make_rollout_policy,
    )
    from active_inference_diffusion_tpu.parallel.dist_train import (
        make_sharded_fused_collect,
    )

    env = Pendulum()
    cfg = ActiveInferenceConfig(
        observation_dim=3, action_dim=1, latent_dim=8, hidden_dim=32,
        score_num_layers=1, batch_size=8,
        diffusion=DiffusionConfig(num_diffusion_steps=2, beta_schedule="linear"),
    )
    cfg.tpu.donate_buffers = False
    agent = DiffusionStateAgent(3, 1, cfg, TrainingConfig(buffer_size=64))
    params = agent.core.init_params(jax.random.PRNGKey(0))
    mesh = make_mesh(shape=(8, 1))
    n_envs, n_steps = 16, 5

    policy_fn = make_rollout_policy(agent.core, env)

    collect = make_sharded_fused_collect(env, policy_fn, mesh, n_envs, n_steps)
    transitions, states = collect(params, jax.random.PRNGKey(1))
    assert transitions.observations.shape == (n_steps, n_envs, 3)
    assert states.obs.shape == (n_envs, 3)
    r = np.asarray(transitions.rewards)
    assert np.isfinite(r).all()
    # env axis is sharded over dp
    spec = transitions.observations.sharding.spec
    assert spec[1] == "dp"
    # decorrelated shards: per-shard reward trajectories differ
    assert not np.allclose(r[:, :2], r[:, 2:4])

    # continue from carried states
    transitions2, _ = collect(params, jax.random.PRNGKey(2), states)
    assert transitions2.observations.shape == (n_steps, n_envs, 3)
    assert np.isfinite(np.asarray(transitions2.rewards)).all()
    # the two collects disagree (fresh keys, advanced states)
    assert not np.allclose(r, np.asarray(transitions2.rewards))


def test_multihost_mesh_single_process():
    """Single-process degenerate case of the (host, dp, tp) multi-host mesh."""
    from active_inference_diffusion_tpu.parallel.multihost import (
        initialize,
        make_multihost_mesh,
    )

    initialize()  # no-op single process
    mesh = make_multihost_mesh(tp=2)
    assert dict(mesh.shape) == {"host": 1, "dp": 4, "tp": 2}
    mesh2 = make_multihost_mesh()
    assert dict(mesh2.shape) == {"host": 1, "dp": 8, "tp": 1}


def test_sharded_fused_collect_steps_per_dispatch():
    """Chunked dispatches concatenate to the full rollout length and carry
    env state across chunks (step counts keep advancing)."""
    from active_inference_diffusion_tpu.envs.jax_envs import Pendulum
    from active_inference_diffusion_tpu.parallel.dist_train import (
        make_sharded_fused_collect,
    )

    env = Pendulum()
    mesh = make_mesh(shape=(8, 1))

    def random_policy(params, obs, key):
        return jax.random.uniform(
            key, (obs.shape[0], env.action_dim), minval=-2.0, maxval=2.0
        )

    collect = make_sharded_fused_collect(
        env, random_policy, mesh, num_envs=16, num_steps=12,
        steps_per_dispatch=4,
    )
    transitions, states = collect({}, jax.random.PRNGKey(0))
    assert transitions.observations.shape == (12, 16, 3)
    assert transitions.observations.sharding.spec[1] == "dp"
    assert np.isfinite(np.asarray(transitions.rewards)).all()
    # state carried through all three dispatches
    assert (np.asarray(states.step_count) == 12).all()

    with pytest.raises(ValueError, match="multiple"):
        make_sharded_fused_collect(
            env, random_policy, mesh, num_envs=16, num_steps=10,
            steps_per_dispatch=4,
        )


def test_sharded_fused_collect_stateful_warm():
    """Warm-start belief carry composes with the dp-sharded rollout: the
    per-env policy state shards over dp and round-trips through chunked
    dispatches."""
    from active_inference_diffusion_tpu.envs.jax_envs import (
        Pendulum,
        init_warm_state,
        make_warm_rollout_policy,
    )
    from active_inference_diffusion_tpu.parallel.dist_train import (
        make_sharded_fused_collect,
    )

    env = Pendulum()
    cfg = ActiveInferenceConfig(
        observation_dim=3, action_dim=1, latent_dim=8, hidden_dim=32,
        score_num_layers=1, batch_size=8,
        diffusion=DiffusionConfig(num_diffusion_steps=4, beta_schedule="linear"),
    )
    cfg.tpu.donate_buffers = False
    agent = DiffusionStateAgent(3, 1, cfg, TrainingConfig(buffer_size=64))
    params = agent.core.init_params(jax.random.PRNGKey(0))
    mesh = make_mesh(shape=(8, 1))
    n_envs, n_steps = 16, 6

    warm = make_warm_rollout_policy(agent.core, env, num_steps=2)
    collect = make_sharded_fused_collect(
        env, warm, mesh, n_envs, n_steps, stateful=True,
        steps_per_dispatch=3,
    )
    w0 = init_warm_state(jax.random.PRNGKey(1), n_envs, cfg.latent_dim)
    transitions, states, w1 = collect(params, jax.random.PRNGKey(2), w0)
    assert transitions.observations.shape == (n_steps, n_envs, 3)
    assert transitions.observations.sharding.spec[1] == "dp"
    assert w1.shape == w0.shape
    assert w1.sharding.spec[0] == "dp"
    assert np.isfinite(np.asarray(w1)).all()
    assert not np.allclose(np.asarray(w1), np.asarray(w0))
    # continue with carried env + warm state
    t2, _, w2 = collect(params, jax.random.PRNGKey(3), w1, env_states=states)
    assert np.isfinite(np.asarray(t2.rewards)).all()
    assert not np.allclose(np.asarray(w2), np.asarray(w1))
