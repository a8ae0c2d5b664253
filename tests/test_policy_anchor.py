"""Policy-EMA anchor (late-run drift stabilizer): KL anchoring of the live
actor to its Polyak average, and acting from the EMA policy."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from active_inference_diffusion_tpu.configs.config import (
    ActiveInferenceConfig,
    DiffusionConfig,
    TrainingConfig,
)


def make_agent(**overrides):
    from active_inference_diffusion_tpu.agents.state_agent import DiffusionStateAgent

    kwargs = dict(
        observation_dim=5,
        action_dim=2,
        latent_dim=8,
        hidden_dim=32,
        score_num_layers=1,
        batch_size=8,
        efe_horizon=2,
        num_efe_trajectories=2,
        num_ambiguity_samples=2,
        diffusion=DiffusionConfig(num_diffusion_steps=3, beta_schedule="linear"),
    )
    kwargs.update(overrides)
    cfg = ActiveInferenceConfig(**kwargs)
    cfg.tpu.donate_buffers = False
    return DiffusionStateAgent(5, 2, cfg, TrainingConfig(buffer_size=64))


def make_batch(key):
    keys = jax.random.split(key, 5)
    return {
        "observations": jax.random.normal(keys[0], (8, 5)),
        "actions": jax.random.normal(keys[1], (8, 2)),
        "rewards": jax.random.normal(keys[2], (8,)),
        "next_observations": jax.random.normal(keys[3], (8, 5)),
        "dones": jax.random.bernoulli(keys[4], 0.1, (8,)),
    }


def test_gaussian_kl_basics():
    from active_inference_diffusion_tpu.models.policy import PolicyDist, gaussian_kl

    p = PolicyDist(mean=jnp.zeros((4, 3)), log_std=jnp.zeros((4, 3)))
    assert np.allclose(np.asarray(gaussian_kl(p, p)), 0.0, atol=1e-7)
    q = PolicyDist(mean=jnp.ones((4, 3)), log_std=jnp.zeros((4, 3)))
    # KL(N(0,1)||N(1,1)) = 0.5 per dim, 3 dims
    assert np.allclose(np.asarray(gaussian_kl(p, q)), 1.5, atol=1e-6)
    assert (np.asarray(gaussian_kl(q, p)) > 0).all()


def test_ema_policy_absent_by_default():
    agent = make_agent()
    state = agent.init_train_state(jax.random.PRNGKey(0))
    assert state.ema_policy is None
    # and training carries the None through
    state2, metrics = agent.train_step(state, make_batch(jax.random.PRNGKey(1)))
    assert state2.ema_policy is None
    assert "policy_anchor_kl" not in metrics or float(
        metrics["policy_anchor_kl"]
    ) == 0.0


def test_anchor_restrains_policy_movement():
    """With a huge anchor weight the policy must move far less than without
    (same seeds, same batches)."""

    def run(anchor_weight):
        agent = make_agent(policy_anchor_weight=anchor_weight)
        state = agent.init_train_state(jax.random.PRNGKey(0))
        init_policy = jax.tree_util.tree_map(
            lambda x: np.asarray(x).copy(), state.params["policy"]
        )
        for i in range(4):
            state, metrics = agent.train_step(
                state, make_batch(jax.random.PRNGKey(100 + i))
            )
        moved = sum(
            float(np.abs(np.asarray(a) - b).sum())
            for a, b in zip(
                jax.tree_util.tree_leaves(state.params["policy"]),
                jax.tree_util.tree_leaves(init_policy),
            )
        )
        return moved, metrics

    moved_free, m_free = run(0.0)
    moved_anchored, m_anchored = run(1e4)
    assert state_is_finite(m_anchored)
    assert moved_anchored < 0.5 * moved_free, (moved_anchored, moved_free)
    assert float(m_anchored["policy_anchor_kl"]) >= 0.0


def state_is_finite(metrics):
    return all(bool(jnp.isfinite(v).all()) for v in metrics.values())


def test_anchor_metric_reported_in_imagined_mode():
    agent = make_agent(
        policy_anchor_weight=0.1,
        imagined_value_targets=True,
        imagine_deterministic=True,
    )
    state = agent.init_train_state(jax.random.PRNGKey(0))
    assert state.ema_policy is not None
    state2, metrics = agent.train_step(state, make_batch(jax.random.PRNGKey(1)))
    assert "policy_anchor_kl" in metrics
    assert bool(jnp.isfinite(metrics["policy_anchor_kl"]))
    # EMA actually tracked (changed from init toward the updated policy)
    diffs = [
        float(np.abs(np.asarray(a) - np.asarray(b)).max())
        for a, b in zip(
            jax.tree_util.tree_leaves(state2.ema_policy),
            jax.tree_util.tree_leaves(state.ema_policy),
        )
    ]
    assert max(diffs) > 0.0


def test_anchor_warmup_gates_the_anchor():
    """Before policy_anchor_warmup_steps the anchor term must not restrain
    the policy; after the gate step it must (same seeds/batches). The gate
    is traced on state.step, so one compiled program serves both regimes."""

    def run(warmup):
        agent = make_agent(
            policy_anchor_weight=1e4, policy_anchor_warmup_steps=warmup
        )
        state = agent.init_train_state(jax.random.PRNGKey(0))
        init_policy = jax.tree_util.tree_map(
            lambda x: np.asarray(x).copy(), state.params["policy"]
        )
        for i in range(4):
            state, metrics = agent.train_step(
                state, make_batch(jax.random.PRNGKey(100 + i))
            )
        moved = sum(
            float(np.abs(np.asarray(a) - b).sum())
            for a, b in zip(
                jax.tree_util.tree_leaves(state.params["policy"]),
                jax.tree_util.tree_leaves(init_policy),
            )
        )
        return moved

    moved_gated_off = run(warmup=100)   # gate never reached in 4 steps
    moved_active = run(warmup=0)        # anchor live from step 0
    assert moved_active < 0.5 * moved_gated_off, (
        moved_active, moved_gated_off,
    )


def test_act_with_policy_ema_uses_ema_params():
    agent = make_agent(act_with_policy_ema=True)
    state = agent.init_train_state(jax.random.PRNGKey(0))
    # Force the EMA away from the live policy; acting must change.
    obs = np.random.default_rng(0).normal(size=(3, 5)).astype(np.float32)
    a_live = agent.act(state, obs, jax.random.PRNGKey(7), deterministic=True)
    shifted = jax.tree_util.tree_map(lambda x: x + 0.5, state.ema_policy)
    state_shifted = state.replace(ema_policy=shifted)
    a_ema = agent.act(state_shifted, obs, jax.random.PRNGKey(7), deterministic=True)
    assert not np.allclose(a_live, a_ema)
