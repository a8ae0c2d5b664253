"""EFE-based action selection (``core.act_planned``).

The reference computes the EFE inside ``act`` but never uses it to pick the
action (reference core/active_inference.py:501-510); ``act_planned``
implements the decision rule that computation implies. These tests pin down
the candidate-scoring semantics (``first_action`` injection into the EFE
rollout) and the selection rule (argmin / Boltzmann over candidates).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from active_inference_diffusion_tpu.agents.state_agent import DiffusionStateAgent

from tests.test_agent_train import tiny_config


@pytest.fixture(scope="module")
def plan_agent_and_state():
    cfg, tcfg = tiny_config()
    cfg.plan_candidates = 4
    cfg.plan_temperature = 0.0
    agent = DiffusionStateAgent(5, 2, cfg, tcfg)
    state = agent.init_train_state(jax.random.PRNGKey(0))
    return agent, state


def test_first_action_changes_efe(plan_agent_and_state):
    """EFE with a committed first action differs across actions but is
    deterministic given the same key (same imagination noise)."""
    agent, state = plan_agent_and_state
    latent = jax.random.normal(jax.random.PRNGKey(1), (3, 8))
    key = jax.random.PRNGKey(2)
    temp = jnp.asarray(1.0)
    a1 = jnp.ones((3, 2)) * 0.5
    a2 = -jnp.ones((3, 2)) * 0.5
    efe_a1, _ = agent.core.compute_expected_free_energy(
        state.params, latent, key, temp, first_action=a1
    )
    efe_a1_again, _ = agent.core.compute_expected_free_energy(
        state.params, latent, key, temp, first_action=a1
    )
    efe_a2, _ = agent.core.compute_expected_free_energy(
        state.params, latent, key, temp, first_action=a2
    )
    assert efe_a1.shape == (3,)
    np.testing.assert_allclose(np.asarray(efe_a1), np.asarray(efe_a1_again))
    assert not np.allclose(np.asarray(efe_a1), np.asarray(efe_a2))
    assert np.isfinite(np.asarray(efe_a1)).all()


def test_first_action_only_replaces_step_zero(plan_agent_and_state):
    """With horizon=1 the whole rollout is the committed action, so the EFE
    must match a hand rollout: z' ~ dynamics(z, a), pragmatic from reward +
    value at z', consistency = -entropy(pi(z)). Keys inside the scan are
    split identically, so we replicate the step's RNG derivation."""
    agent, state = plan_agent_and_state
    core = agent.core
    cfg = agent.config
    latent = jax.random.normal(jax.random.PRNGKey(5), (2, 8))
    key = jax.random.PRNGKey(6)
    a = jnp.full((2, 2), 0.3)
    n_traj = 3
    efe, _ = core.compute_expected_free_energy(
        state.params, latent, key, jnp.asarray(1.0),
        horizon=1, num_trajectories=n_traj, first_action=a,
    )

    # Hand rollout replicating the scan body's key structure.
    step_key = jax.random.split(key, 1)[0]
    pol_key, dyn_key, epi_key = jax.random.split(step_key, 3)
    z0 = jnp.tile(latent, (n_traj, 1))
    a_tiled = jnp.tile(a, (n_traj, 1))
    dist = core.apply_policy(state.params["policy"], z0)
    next_mean, next_logvar = core.predict_next_latent(
        state.params["dynamics"], z0, a_tiled
    )
    eps = jax.random.normal(dyn_key, next_mean.shape, dtype=next_mean.dtype)
    next_z = next_mean + eps * jnp.exp(0.5 * next_logvar)
    reward_mean, _ = core.predict_reward(state.params["reward"], next_z)
    pragmatic = cfg.pragmatic_weight * reward_mean
    t_batch = jnp.zeros((next_z.shape[0],), dtype=z0.dtype)
    pragmatic = pragmatic + cfg.efe_value_weight * core.apply_value(
        state.params["value"], next_z, t_batch
    )
    consistency = -dist.entropy()
    step_efe = (
        cfg.semantics.pragmatic_sign * pragmatic
        + cfg.consistency_weight * consistency
    )
    expected = jnp.mean(step_efe.reshape(n_traj, 2), axis=0)
    np.testing.assert_allclose(np.asarray(efe), np.asarray(expected), rtol=1e-5)


def test_imagine_deterministic_matches_mean_rollout():
    """imagine_deterministic: the EFE rollout steps on the dynamics MEAN
    (no fixed-variance noise), so a horizon-1 committed-action EFE matches
    the noise-free hand rollout exactly."""
    from tests.test_agent_train import tiny_config

    cfg, tcfg = tiny_config()
    cfg.imagine_deterministic = True
    agent = DiffusionStateAgent(5, 2, cfg, tcfg)
    state = agent.init_train_state(jax.random.PRNGKey(0))
    core = agent.core
    latent = jax.random.normal(jax.random.PRNGKey(1), (2, 8))
    a = jnp.full((2, 2), -0.4)
    n_traj = 2
    efe, _ = core.compute_expected_free_energy(
        state.params, latent, jax.random.PRNGKey(2), jnp.asarray(1.0),
        horizon=1, num_trajectories=n_traj, first_action=a,
    )
    z0 = jnp.tile(latent, (n_traj, 1))
    a_t = jnp.tile(a, (n_traj, 1))
    dist = core.apply_policy(state.params["policy"], z0)
    next_z, _ = core.predict_next_latent(state.params["dynamics"], z0, a_t)
    reward_mean, _ = core.predict_reward(state.params["reward"], next_z)
    t0 = jnp.zeros((next_z.shape[0],), z0.dtype)
    pragmatic = reward_mean + cfg.efe_value_weight * core.apply_value(
        state.params["value"], next_z, t0
    )
    step_efe = (
        cfg.semantics.pragmatic_sign * pragmatic
        + cfg.consistency_weight * (-dist.entropy())
    )
    expected = jnp.mean(step_efe.reshape(n_traj, 2), axis=0)
    np.testing.assert_allclose(np.asarray(efe), np.asarray(expected), rtol=1e-5)


def test_act_planned_argmin_property(plan_agent_and_state):
    """At temperature 0 the chosen EFE is the per-element minimum, hence
    <= the candidate mean; spread is nonnegative; repeat calls agree."""
    agent, state = plan_agent_and_state
    obs = jax.random.normal(jax.random.PRNGKey(7), (4, 5))
    key = jax.random.PRNGKey(8)
    action, info = agent.core.act_planned(
        state.params, key, obs, num_candidates=5, plan_temperature=0.0,
        num_steps=3,
    )
    action2, _ = agent.core.act_planned(
        state.params, key, obs, num_candidates=5, plan_temperature=0.0,
        num_steps=3,
    )
    assert action.shape == (4, 2)
    np.testing.assert_allclose(np.asarray(action), np.asarray(action2))
    assert float(info["plan/efe_chosen"]) <= float(info["plan/candidate_efe_mean"]) + 1e-6
    assert float(info["plan/efe_spread"]) >= 0.0
    assert np.isfinite(np.asarray(action)).all()


def test_act_planned_boltzmann_samples(plan_agent_and_state):
    """Positive temperature: selection is stochastic over candidates but
    every chosen action is one of the candidates (finite, right shape)."""
    agent, state = plan_agent_and_state
    obs = jax.random.normal(jax.random.PRNGKey(9), (4, 5))
    action, info = agent.core.act_planned(
        state.params, jax.random.PRNGKey(10), obs,
        num_candidates=5, plan_temperature=1.0, num_steps=3,
    )
    assert action.shape == (4, 2)
    assert np.isfinite(np.asarray(action)).all()
    assert np.isfinite(float(info["plan/efe_chosen"]))


def test_agent_act_uses_planning(plan_agent_and_state):
    """Agent-level gate: plan_candidates > 0 routes the jitted act through
    act_planned; deterministic acting is reproducible and clipped."""
    agent, state = plan_agent_and_state
    obs = np.random.RandomState(0).randn(3, 5).astype(np.float32)
    a1 = agent.act(state, obs, jax.random.PRNGKey(11), deterministic=True)
    a2 = agent.act(state, obs, jax.random.PRNGKey(11), deterministic=True)
    np.testing.assert_allclose(a1, a2)
    assert a1.shape == (3, 2)
    assert (np.abs(a1) <= 1.0 + 1e-6).all()

    # Stochastic path (exploration noise on top of Boltzmann selection).
    a3 = agent.act(state, obs, jax.random.PRNGKey(12), deterministic=False)
    assert np.isfinite(a3).all()
