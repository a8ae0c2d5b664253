"""Shape/semantics tests for the Flax model stack."""

import jax
import jax.numpy as jnp
import numpy as np

from active_inference_diffusion_tpu.models.common import mish
from active_inference_diffusion_tpu.models.decoders import (
    FeatureDecoder,
    RewardPredictor,
    StateDecoder,
)
from active_inference_diffusion_tpu.models.dynamics import LatentDynamicsModel
from active_inference_diffusion_tpu.models.policy import (
    DiffusionConditionedPolicy,
    HierarchicalDiffusionPolicy,
    sample_action,
)
from active_inference_diffusion_tpu.models.score_network import LatentScoreNetwork
from active_inference_diffusion_tpu.models.value import ValueNetwork

KEY = jax.random.PRNGKey(0)
B, D, A, H = 4, 16, 6, 64


def test_score_network_shapes_and_zero_init():
    net = LatentScoreNetwork(latent_dim=D, observation_dim=17, hidden_dim=H, num_layers=2)
    z = jax.random.normal(KEY, (B, D))
    t = jnp.linspace(0.1, 0.9, B)
    obs = jax.random.normal(jax.random.PRNGKey(1), (B, 17))
    params = net.init(KEY, z, t, obs, continuous=True, train=False)
    score = net.apply(params, z, t, obs, continuous=True, train=False)
    assert score.shape == (B, D)
    # Final projection is zero-initialized -> score exactly zero at init
    np.testing.assert_allclose(np.asarray(score), 0.0, atol=1e-8)


def test_score_network_discrete_path():
    net = LatentScoreNetwork(latent_dim=D, observation_dim=17, hidden_dim=H, num_layers=2)
    z = jax.random.normal(KEY, (B, D))
    t_disc = jnp.array([0.0, 3.0, 7.0, 24.0])
    obs = jax.random.normal(jax.random.PRNGKey(1), (B, 17))
    params = net.init(KEY, z, t_disc, obs, continuous=False, train=False)
    score = net.apply(params, z, t_disc, obs, continuous=False, train=False)
    assert score.shape == (B, D)
    assert np.isfinite(np.asarray(score)).all()


def test_score_network_without_observation():
    net = LatentScoreNetwork(latent_dim=D, observation_dim=17, hidden_dim=H, num_layers=1)
    z = jax.random.normal(KEY, (B, D))
    t = jnp.full((B,), 0.5)
    params = net.init(KEY, z, t, None, continuous=True, train=False)
    score = net.apply(params, z, t, None, continuous=True, train=False)
    assert score.shape == (B, D)


def test_policy_distribution_and_sampling():
    net = DiffusionConditionedPolicy(latent_dim=D, action_dim=A, hidden_dim=H)
    z = jax.random.normal(KEY, (B, D))
    params = net.init(KEY, z)
    dist = net.apply(params, z)
    assert dist.mean.shape == (B, A)
    assert (np.asarray(dist.log_std) <= 2.0).all()
    assert (np.asarray(dist.log_std) >= -20.0).all()

    action, log_prob = sample_action(dist, jax.random.PRNGKey(2))
    assert action.shape == (B, A) and log_prob.shape == (B,)
    det_action, _ = sample_action(dist, jax.random.PRNGKey(2), deterministic=True)
    np.testing.assert_allclose(np.asarray(det_action), np.asarray(dist.mean))

    # log_prob consistency against scipy-style formula
    lp = dist.log_prob(action)
    var = np.exp(2 * np.asarray(dist.log_std))
    expected = (
        -0.5
        * (
            (np.asarray(action) - np.asarray(dist.mean)) ** 2 / var
            + 2 * np.asarray(dist.log_std)
            + np.log(2 * np.pi)
        )
    ).sum(-1)
    np.testing.assert_allclose(np.asarray(lp), expected, rtol=1e-4)


def test_policy_entropy_positive_relation():
    net = DiffusionConditionedPolicy(latent_dim=D, action_dim=A, hidden_dim=H)
    z = jnp.zeros((B, D))
    params = net.init(KEY, z)
    dist = net.apply(params, z)
    ent = np.asarray(dist.entropy())
    expected = (0.5 * (1 + np.log(2 * np.pi)) + np.asarray(dist.log_std)).sum(-1)
    np.testing.assert_allclose(ent, expected, rtol=1e-5)


def test_squashed_action_in_bounds():
    net = DiffusionConditionedPolicy(latent_dim=D, action_dim=A, hidden_dim=H)
    z = jax.random.normal(KEY, (B, D)) * 5
    params = net.init(KEY, z)
    dist = net.apply(params, z)
    action, log_prob = sample_action(dist, jax.random.PRNGKey(3), squash=True)
    assert (np.abs(np.asarray(action)) <= 1.0).all()
    assert np.isfinite(np.asarray(log_prob)).all()


def test_value_network():
    net = ValueNetwork(state_dim=D, hidden_dim=H)
    z = jax.random.normal(KEY, (B, D))
    t = jnp.zeros((B,))
    params = net.init(KEY, z, t)
    v = net.apply(params, z, t)
    assert v.shape == (B, 1)
    # time conditioning changes the value
    v2 = net.apply(params, z, jnp.ones((B,)))
    assert not np.allclose(np.asarray(v), np.asarray(v2))


def test_dynamics_residual_small_at_init():
    net = LatentDynamicsModel(state_dim=D, action_dim=A, hidden_dim=H)
    z = jax.random.normal(KEY, (B, D))
    a = jax.random.normal(jax.random.PRNGKey(1), (B, A))
    params = net.init(KEY, z, a)
    nxt = net.apply(params, z, a)
    assert nxt.shape == (B, D)
    # residual + small output init -> next approximately equals current
    np.testing.assert_allclose(np.asarray(nxt), np.asarray(z), atol=0.05)


def test_state_decoder_and_reward_predictor():
    dec = StateDecoder(observation_dim=17, hidden_dim=H)
    z = jax.random.normal(KEY, (B, D))
    dparams = dec.init(KEY, z, train=False)
    obs = dec.apply(dparams, z, train=False)
    assert obs.shape == (B, 17)

    rp = RewardPredictor(hidden_dim=H)
    rparams = rp.init(KEY, z)
    mean, std = rp.apply(rparams, z)
    assert mean.shape == (B,) and std.shape == (B,)
    assert (np.asarray(std) > 0).all()
    assert (np.asarray(std) <= np.exp(2.0) + 1e-5).all()


def test_feature_decoder_tanh_range():
    fd = FeatureDecoder(latent_dim=D, hidden_dim=H)
    z = jax.random.normal(KEY, (B, D)) * 10
    params = fd.init(KEY, z, train=False)
    out = fd.apply(params, z, train=False)
    assert out.shape == (B, D)
    assert (np.abs(np.asarray(out)) <= 1.0).all()


def test_hierarchical_policy():
    net = HierarchicalDiffusionPolicy(latent_dim=D, action_dim=A, num_levels=3, hidden_dim=H)
    z = jax.random.normal(KEY, (B, D))
    params = net.init(KEY, z, jax.random.PRNGKey(1))
    action, log_prob, carry = net.apply(params, z, jax.random.PRNGKey(2))
    assert action.shape == (B, A)
    assert log_prob.shape == (B,)
    assert len(carry) == 2
    # carry feeds back
    action2, _, _ = net.apply(params, z, jax.random.PRNGKey(3), carry)
    assert action2.shape == (B, A)


def test_mish_matches_definition():
    x = jnp.linspace(-3, 3, 13)
    np.testing.assert_allclose(
        np.asarray(mish(x)),
        np.asarray(x) * np.tanh(np.log1p(np.exp(np.asarray(x)))),
        rtol=1e-5,
    )
