"""Fokker-Planck belief dynamics + free energy tests (the reference's
versions are unwired/uncallable; these pin down the intended behavior)."""

import jax
import jax.numpy as jnp
import numpy as np

from active_inference_diffusion_tpu.configs.config import BeliefDynamicsConfig
from active_inference_diffusion_tpu.core.belief_dynamics import (
    BeliefDynamics,
    BeliefState,
    FPConfig,
    belief_entropy,
    belief_init,
    belief_update,
)
from active_inference_diffusion_tpu.core.free_energy import (
    compute_free_energy,
    init_free_energy_state,
    update_precision,
)

D = 6


def test_diagonal_update_moves_mean_and_keeps_bounds():
    cfg = FPConfig(use_full_covariance=False)
    state = belief_init(D, cfg)
    obs = jnp.ones(D)
    score = jnp.zeros(D)
    for i in range(20):
        state, diag = belief_update(state, obs, score, jax.random.PRNGKey(i), cfg)
    assert np.isfinite(np.asarray(state.mean)).all()
    var = np.asarray(state.second_moment)
    assert (var >= cfg.min_variance - 1e-12).all()
    assert (var <= cfg.max_variance + 1e-12).all()
    assert np.isfinite(float(diag["entropy"]))


def test_mean_drifts_toward_observation():
    """Mean descends the free energy -> moves toward the observation."""
    cfg = FPConfig(use_full_covariance=False)
    state = belief_init(D, cfg)
    obs = jnp.ones(D)
    score = jnp.zeros(D)
    new_state, _ = belief_update(state, obs, score, jax.random.PRNGKey(0), cfg)
    assert float(new_state.mean.mean()) > 0.0  # moved from 0 toward 1


def test_variance_contracts_under_sharp_observations():
    """A sharp observation model (positive-definite free-energy Hessian)
    contracts the belief variance."""
    cfg = FPConfig(use_full_covariance=False)
    state = belief_init(D, cfg)
    obs = jnp.zeros(D)
    score = jnp.zeros(D)
    new_state, _ = belief_update(state, obs, score, jax.random.PRNGKey(0), cfg)
    assert float(new_state.second_moment.max()) < 1.0


def test_full_covariance_update_spd():
    cfg = FPConfig(use_full_covariance=True)
    state = belief_init(D, cfg)
    obs = 0.5 * jnp.ones(D)
    score = 0.1 * jnp.ones(D)
    for i in range(5):
        state, diag = belief_update(state, obs, score, jax.random.PRNGKey(i), cfg)
    cov = np.asarray(state.second_moment)
    np.testing.assert_allclose(cov, cov.T, atol=1e-6)
    eig = np.linalg.eigvalsh(cov)
    assert (eig > 0).all()
    assert float(diag["condition_number"]) >= 1.0


def test_entropy_formula_diagonal():
    cfg = FPConfig(use_full_covariance=False)
    state = BeliefState(jnp.zeros(2), jnp.array([1.0, 4.0]))
    h = float(belief_entropy(state, cfg))
    expected = 0.5 * (2 * np.log(2 * np.pi * np.e) + np.log(1.0) + np.log(4.0))
    np.testing.assert_allclose(h, expected, rtol=1e-5)


def test_host_wrapper_history_and_api():
    config = BeliefDynamicsConfig(use_full_covariance=False)
    bd = BeliefDynamics(latent_dim=D, config=config)
    obs = np.ones(D, np.float32)
    score = np.zeros(D, np.float32)
    mean, cov = bd.update(obs, score)
    assert mean.shape == (D,) and cov.shape == (D, D)
    assert len(bd.history["means"]) == 1
    assert len(bd.history["entropies"]) == 1
    bd.update(obs, score)
    assert len(bd.history["means"]) == 2
    diags = bd.get_diagnostics()
    assert "entropy" in diags and "mean_norm" in diags
    bd.reset()
    assert len(bd.history["means"]) == 0


def test_host_wrapper_full_covariance():
    config = BeliefDynamicsConfig(use_full_covariance=True)
    bd = BeliefDynamics(latent_dim=4, config=config)
    mean, cov = bd.update(np.ones(4, np.float32), np.zeros(4, np.float32))
    assert cov.shape == (4, 4)
    d = bd.get_diagnostics()
    assert d["condition_number"] >= 1.0


def test_free_energy_components():
    log_prec = init_free_energy_state(2.0)

    def score_fn(states, t, obs):
        return 0.1 * states

    states = jnp.ones((8, D))
    obs = jnp.zeros((8, D))
    fe, info = compute_free_energy(log_prec, states, obs, score_fn)
    # complexity = 0.5 * D (unit prior, states at 1)
    np.testing.assert_allclose(float(info["complexity"]), 0.5 * D, rtol=1e-5)
    np.testing.assert_allclose(float(info["precision"]), 2.0, rtol=1e-5)
    # accuracy reported positive = 0.5 * precision * error
    np.testing.assert_allclose(float(info["observation_error"]), D, rtol=1e-5)
    assert np.isfinite(float(fe))


def test_precision_update_clamps():
    log_prec = init_free_energy_state(1.0)
    for _ in range(1000):
        log_prec = update_precision(log_prec, jnp.asarray(10.0), jnp.asarray(0.0))
    assert float(log_prec) <= 3.0 + 1e-6
