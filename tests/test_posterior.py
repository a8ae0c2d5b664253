"""Posterior-grounded beliefs (``posterior_beliefs`` / ``act_from_posterior``).

Extension fixing the reference's self-referential score-matching target (the
sweep is trained toward its own no_grad samples, reference
agents/state_agent.py:134-140): an amortized q(z|o) supplies grounded latents,
the score network learns to sample it. See DEVIATIONS.md.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from active_inference_diffusion_tpu.agents.state_agent import DiffusionStateAgent

from tests.test_agent_train import make_batch, tiny_config


def posterior_agent(**flags):
    cfg, tcfg = tiny_config()
    cfg.posterior_beliefs = True
    for k, v in flags.items():
        setattr(cfg, k, v)
    agent = DiffusionStateAgent(5, 2, cfg, tcfg)
    state = agent.init_train_state(jax.random.PRNGKey(0))
    return agent, state


@pytest.fixture(scope="module")
def post_agent_and_state():
    return posterior_agent()


def tree_l1(a, b):
    return sum(
        float(jnp.sum(jnp.abs(x - y)))
        for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b))
    )


def test_posterior_group_exists_and_trains(post_agent_and_state):
    agent, state = post_agent_and_state
    assert "posterior" in state.params
    assert "posterior" in agent.PARTITIONS["model"]
    batch = make_batch(jax.random.PRNGKey(1))
    new_state, metrics = agent.train_step(state, batch)
    assert tree_l1(state.params["posterior"], new_state.params["posterior"]) > 0
    for k, v in metrics.items():
        assert np.isfinite(float(v)), f"{k} not finite"


def test_score_matching_does_not_reach_encoder(post_agent_and_state):
    """The diffusion target is stop_gradient(z_post): the score-matching term
    must contribute ZERO gradient to the posterior encoder (grounding flows
    only through reconstruction/reward/KL)."""
    agent, state = post_agent_and_state
    core = agent.core
    obs = jax.random.normal(jax.random.PRNGKey(2), (8, 5))
    rewards = jax.random.normal(jax.random.PRNGKey(3), (8,))

    def score_term(post_params):
        z = core.sample_posterior(post_params, jax.random.PRNGKey(4), obs)
        terms = core.elbo_terms(
            state.params, jax.random.PRNGKey(5), obs, rewards, z,
            state.time_importance, train=False,
        )
        return terms["score_matching_loss"]

    g = jax.grad(score_term)(state.params["posterior"])
    assert all(
        float(jnp.max(jnp.abs(x))) == 0.0 for x in jax.tree_util.tree_leaves(g)
    )

    def recon_term(post_params):
        z = core.sample_posterior(post_params, jax.random.PRNGKey(4), obs)
        terms = core.elbo_terms(
            state.params, jax.random.PRNGKey(5), obs, rewards, z,
            state.time_importance, train=False,
        )
        return terms["reconstruction_loss"]

    g2 = jax.grad(recon_term)(state.params["posterior"])
    assert any(
        float(jnp.max(jnp.abs(x))) > 0.0 for x in jax.tree_util.tree_leaves(g2)
    )


def test_posterior_grounding_fits_reconstruction():
    """Overfitting one batch: the posterior+decoder autoencoder must drive
    reconstruction loss well below its initial value within a few dozen
    steps (this is exactly the grounding the sweep-target design lacks)."""
    agent, state = posterior_agent(deterministic_beliefs=True, learning_rate=3e-4)
    batch = make_batch(jax.random.PRNGKey(10))
    first = None
    for _ in range(75):
        state, metrics = agent.train_step(state, batch)
        if first is None:
            first = float(metrics["reconstruction_loss"])
    last = float(metrics["reconstruction_loss"])
    assert np.isfinite(last)
    assert last < 0.5 * first, f"reconstruction did not improve: {first} -> {last}"


def test_act_from_posterior_paths():
    agent, state = posterior_agent(
        act_from_posterior=True, deterministic_beliefs=True
    )
    obs = np.random.RandomState(0).randn(3, 5).astype(np.float32)
    a1 = agent.act(state, obs, jax.random.PRNGKey(1), deterministic=True)
    a2 = agent.act(state, obs, jax.random.PRNGKey(1), deterministic=True)
    np.testing.assert_allclose(a1, a2)
    assert a1.shape == (3, 2) and np.isfinite(a1).all()

    # Warm path: interface preserved, latent comes from the posterior head.
    prev = jnp.zeros((3, 8))
    reset = np.array([True, False, True])
    actions, latents = agent.act_warm(
        state, obs, jax.random.PRNGKey(2), prev, reset, deterministic=True
    )
    mu, _ = agent.core.apply_posterior(
        state.params["posterior"], jnp.asarray(obs)
    )
    np.testing.assert_allclose(
        np.asarray(latents), np.asarray(mu), rtol=1e-5, atol=1e-6
    )


def test_posterior_with_imagined_targets_composes():
    agent, state = posterior_agent(
        imagined_value_targets=True, deterministic_beliefs=True
    )
    batch = make_batch(jax.random.PRNGKey(20))
    state, metrics = agent.train_step(state, batch)
    assert "imagined/lambda_return_mean" in metrics
    for k, v in metrics.items():
        assert np.isfinite(float(v)), f"{k} not finite"
