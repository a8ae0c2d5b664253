"""Golden tests for noise schedules and forward/reverse diffusion steps."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from active_inference_diffusion_tpu.core import diffusion as dproc
from active_inference_diffusion_tpu.core.schedules import extract, make_schedule


def test_linear_schedule_values():
    sched = make_schedule(10, "linear", beta_start=1e-4, beta_end=0.02)
    betas = np.asarray(sched.betas)
    np.testing.assert_allclose(betas, np.linspace(1e-4, 0.02, 10), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(sched.alphas_cumprod), np.cumprod(1 - betas), rtol=1e-5
    )
    # alphas_cumprod_prev is alphas_cumprod shifted with leading 1.0
    np.testing.assert_allclose(
        np.asarray(sched.alphas_cumprod_prev)[1:],
        np.asarray(sched.alphas_cumprod)[:-1],
        rtol=1e-6,
    )
    assert sched.alphas_cumprod_prev[0] == 1.0


def test_cosine_schedule_properties():
    sched = make_schedule(50, "cosine")
    betas = np.asarray(sched.betas)
    assert (betas >= 1e-4 - 1e-12).all() and (betas <= 0.999).all()
    acp = np.asarray(sched.alphas_cumprod)
    assert (np.diff(acp) < 0).all()  # monotonically decreasing signal


def test_posterior_coefficients_consistency():
    """Posterior mean coefficients must satisfy the DDPM identity
    c1 + c2 * sqrt(alpha_bar_t)/sqrt(alpha_bar_{t-1}) ... basic sanity: at
    z_start == z_t == x the posterior mean interpolates toward x."""
    sched = make_schedule(20, "linear")
    x = jnp.ones((4, 8))
    t = jnp.array([5, 5, 5, 5])
    pm = dproc.posterior_mean(sched, x, x, t)
    c1 = extract(sched.posterior_mean_coef1, t, 2)
    c2 = extract(sched.posterior_mean_coef2, t, 2)
    np.testing.assert_allclose(
        np.asarray(pm), np.broadcast_to(np.asarray(c1 + c2), pm.shape), rtol=1e-5
    )


def test_q_sample_matches_formula():
    sched = make_schedule(30, "cosine")
    key = jax.random.PRNGKey(0)
    z0 = jax.random.normal(key, (6, 16))
    noise = jax.random.normal(jax.random.PRNGKey(1), (6, 16))
    t = jnp.array([0, 3, 7, 15, 22, 29])
    zt = dproc.q_sample(sched, z0, t, noise)
    a = np.sqrt(np.asarray(sched.alphas_cumprod))[np.asarray(t)][:, None]
    b = np.sqrt(1 - np.asarray(sched.alphas_cumprod))[np.asarray(t)][:, None]
    np.testing.assert_allclose(np.asarray(zt), a * np.asarray(z0) + b * np.asarray(noise), rtol=1e-5)


def test_continuous_q_sample_interpolation():
    params = dproc.init_diffusion_params(8)
    z0 = jnp.ones((3, 8))
    noise = jnp.zeros((3, 8))
    # t = 0 -> log_snr = log_snr_max = 10 -> alpha ~ 1: z_noisy ~ z0
    z_noisy, info = dproc.continuous_q_sample(params, z0, jnp.zeros((3,)), noise)
    np.testing.assert_allclose(np.asarray(z_noisy), np.asarray(z0), atol=1e-2)
    # t = 1 -> log_snr = log_snr_min = -10 -> alpha ~ 0
    z_noisy, info = dproc.continuous_q_sample(params, z0, jnp.ones((3,)), noise)
    assert np.abs(np.asarray(z_noisy)).max() < 0.05
    assert info["sigma"].shape == (3, 1)


def test_loss_weight_positive_and_peaked():
    params = dproc.init_diffusion_params(4)
    t = jnp.linspace(0.0, 1.0, 101)
    w = np.asarray(dproc.compute_loss_weight(params, t))
    assert (w > 0).all()
    assert w[50] > w[0] and w[50] > w[100]  # peaked in the middle


def test_p_sample_deterministic_at_t0():
    sched = make_schedule(10, "linear")
    key = jax.random.PRNGKey(0)
    z = jax.random.normal(key, (5, 8))
    score = jnp.zeros_like(z)
    noise = jax.random.normal(jax.random.PRNGKey(1), z.shape)
    t0 = jnp.zeros((5,), jnp.int32)
    out_stoch = dproc.p_sample(sched, z, t0, score, noise, deterministic=False)
    out_det = dproc.p_sample(sched, z, t0, score, noise, deterministic=True)
    # at t == 0 no noise is injected even in stochastic mode
    np.testing.assert_allclose(np.asarray(out_stoch), np.asarray(out_det), rtol=1e-6)


def test_generate_latents_shapes_and_trajectory():
    sched = make_schedule(8, "cosine")

    def score_fn(z, t, obs):
        return -0.1 * z

    res = dproc.generate_latents(
        sched, score_fn, jax.random.PRNGKey(0), 4, 16, return_trajectory=True
    )
    assert res.latent.shape == (4, 16)
    assert res.trajectory.shape == (9, 4, 16)
    assert np.isfinite(np.asarray(res.latent)).all()
    # final latent equals last trajectory entry
    np.testing.assert_allclose(
        np.asarray(res.trajectory[-1]), np.asarray(res.latent)
    )


def test_generate_latents_partial_sweep():
    sched = make_schedule(25, "cosine")

    def score_fn(z, t, obs):
        return jnp.zeros_like(z)

    res = dproc.generate_latents(
        sched, score_fn, jax.random.PRNGKey(0), 2, 8, num_steps=20
    )
    assert res.latent.shape == (2, 8)
    with pytest.raises(ValueError):
        dproc.generate_latents(sched, score_fn, jax.random.PRNGKey(0), 2, 8, num_steps=30)


def test_prior_sampling_statistics():
    params = dproc.init_diffusion_params(4)
    params["latent_prior_mean"] = jnp.full((4,), 2.0)
    params["latent_prior_log_std"] = jnp.log(jnp.full((4,), 0.5))
    samples = dproc.sample_latent_prior(params, jax.random.PRNGKey(0), 10_000)
    np.testing.assert_allclose(np.asarray(samples.mean(0)), 2.0, atol=0.05)
    np.testing.assert_allclose(np.asarray(samples.std(0)), 0.5, atol=0.05)
