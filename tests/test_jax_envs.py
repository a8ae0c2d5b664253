"""Pure-JAX env tests including cross-validation against Gymnasium Pendulum."""

import gymnasium as gym
import jax
import jax.numpy as jnp
import numpy as np

from active_inference_diffusion_tpu.envs.jax_envs import (
    Pendulum,
    PointMass2D,
    Reacher2Link,
    flatten_transitions,
    fused_collect,
    make_jax_env,
)


def test_pendulum_matches_gymnasium():
    """Same initial physics + same actions -> identical obs/reward sequences."""
    genv = gym.make("Pendulum-v1").unwrapped
    genv.reset(seed=0)
    theta0, thetadot0 = 0.7, -0.3
    genv.state = np.array([theta0, thetadot0])

    jenv = Pendulum()
    state = jenv.reset(jax.random.PRNGKey(0))
    state = state.replace(
        physics=jnp.array([theta0, thetadot0]),
        obs=jnp.array([np.cos(theta0), np.sin(theta0), thetadot0]),
    )

    rng = np.random.default_rng(0)
    for _ in range(50):
        action = rng.uniform(-2, 2, size=1).astype(np.float32)
        gobs, greward, *_ = genv.step(action)
        state = jenv.step(state, jnp.asarray(action))
        np.testing.assert_allclose(np.asarray(state.obs), gobs, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(float(state.reward), greward, rtol=1e-4, atol=1e-5)
    genv.close()


def test_pendulum_time_limit_autoreset():
    env = Pendulum()
    state = env.reset(jax.random.PRNGKey(0))
    action = jnp.zeros(1)
    for i in range(env.max_episode_steps):
        state = env.step_autoreset(state, action)
    # the 200th step ended the episode; the carried state is freshly reset
    assert bool(state.done)
    assert int(state.step_count) == 0  # reset happened


def test_pointmass_improves_with_greedy_policy():
    env = PointMass2D()
    state = env.reset(jax.random.PRNGKey(1))
    first_reward = None
    for _ in range(100):
        pos, target = state.physics[:2], state.physics[4:6]
        action = jnp.clip(5.0 * (target - pos), -1, 1)
        state = env.step(state, action)
        if first_reward is None:
            first_reward = float(state.reward)
    assert float(state.reward) > first_reward  # moved toward the target


def test_reacher_shapes():
    env = Reacher2Link()
    state = env.reset(jax.random.PRNGKey(2))
    assert state.obs.shape == (env.observation_dim,)
    state = env.step(state, jnp.ones(2))
    assert np.isfinite(np.asarray(state.obs)).all()
    assert float(state.reward) <= 0.0


def test_registry():
    for name in ["Pendulum-v1", "PointMass2D-v0", "Reacher2Link-v0"]:
        env = make_jax_env(name)
        state = env.reset(jax.random.PRNGKey(0))
        assert state.obs.shape == (env.observation_dim,)


def test_fused_collect_shapes_and_autoreset():
    env = Pendulum()
    n_envs, n_steps = 4, 10

    def random_policy(obs, key):
        return jax.random.uniform(key, (obs.shape[0], env.action_dim),
                                  minval=-2.0, maxval=2.0)

    collect = jax.jit(
        lambda key: fused_collect(env, random_policy, key, n_envs, n_steps)
    )
    transitions, final_states = collect(jax.random.PRNGKey(0))
    assert transitions.observations.shape == (n_steps, n_envs, 3)
    assert transitions.actions.shape == (n_steps, n_envs, 1)
    assert transitions.rewards.shape == (n_steps, n_envs)
    assert final_states.obs.shape == (n_envs, 3)

    flat = flatten_transitions(transitions)
    assert flat.observations.shape == (n_steps * n_envs, 3)

    # continue collection from carried states
    transitions2, _ = fused_collect(
        env, random_policy, jax.random.PRNGKey(1), n_envs, n_steps,
        env_states=final_states,
    )
    assert transitions2.observations.shape == (n_steps, n_envs, 3)


def test_fused_collect_with_agent_policy():
    """End-to-end: diffusion-belief + policy as the fused rollout policy."""
    from active_inference_diffusion_tpu.agents.state_agent import DiffusionStateAgent
    from active_inference_diffusion_tpu.configs.config import (
        ActiveInferenceConfig,
        DiffusionConfig,
        TrainingConfig,
    )

    env = Pendulum()
    cfg = ActiveInferenceConfig(
        observation_dim=3, action_dim=1, latent_dim=4, hidden_dim=16,
        score_num_layers=1, batch_size=4,
        diffusion=DiffusionConfig(num_diffusion_steps=2, beta_schedule="linear"),
    )
    cfg.tpu.donate_buffers = False
    agent = DiffusionStateAgent(3, 1, cfg, TrainingConfig())
    params = agent.core.init_params(jax.random.PRNGKey(0))

    def policy_fn(obs, key):
        belief = agent.core.generate_beliefs(
            params, key, obs, compute_reconstruction=False
        )
        dist = agent.core.apply_policy(params["policy"], belief.latent)
        return jnp.clip(dist.mean, -2.0, 2.0)

    collect = jax.jit(
        lambda key: fused_collect(env, policy_fn, key, 3, 5)
    )
    transitions, _ = collect(jax.random.PRNGKey(0))
    assert transitions.actions.shape == (5, 3, 1)
    assert np.isfinite(np.asarray(transitions.rewards)).all()


def test_mjx_adapter_gating():
    """MJX adapter raises a clear error when mujoco-mjx is absent, and
    constructs when present."""
    import pytest

    from active_inference_diffusion_tpu.envs.mjx_env import MJXEnv, mjx_available

    if not mjx_available():
        with pytest.raises(ImportError, match="mujoco-mjx"):
            MJXEnv("HalfCheetah-v4")
    else:  # pragma: no cover - exercised only where mjx is installed
        env = MJXEnv("HalfCheetah-v4")
        state = env.reset(jax.random.PRNGKey(0))
        assert state.obs.shape == (env.observation_dim,)
        state = env.step(state, jnp.zeros(env.action_dim))
        assert np.isfinite(np.asarray(state.obs)).all()


def test_fused_eval_masks_after_done():
    """fused_eval: mean episodic return is finite, within Pendulum's reward
    bounds, and rewards after an env's done are masked out — rolling past
    max_episode_steps does not change the return."""
    from active_inference_diffusion_tpu.envs.jax_envs import fused_eval, make_jax_env

    env = make_jax_env("Pendulum-v1")

    def zero_policy(obs, key):
        return jnp.zeros((obs.shape[0], env.action_dim))

    ev = jax.jit(
        lambda key, n: fused_eval(env, zero_policy, key, 4, num_steps=n),
        static_argnums=(1,),
    )
    r_full = float(ev(jax.random.PRNGKey(0), env.max_episode_steps))
    r_over = float(ev(jax.random.PRNGKey(0), env.max_episode_steps + 37))
    assert np.isfinite(r_full)
    # Pendulum per-step reward is in [-16.28, 0]
    assert -16.28 * env.max_episode_steps <= r_full <= 0.0
    np.testing.assert_allclose(r_full, r_over, rtol=1e-6)
