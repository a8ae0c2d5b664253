"""Fused Pallas denoiser kernel vs the XLA trunk sweep (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from active_inference_diffusion_tpu.agents.state_agent import DiffusionStateAgent
from active_inference_diffusion_tpu.configs.config import (
    ActiveInferenceConfig,
    DiffusionConfig,
    TrainingConfig,
)
from active_inference_diffusion_tpu.core import diffusion as dproc
from active_inference_diffusion_tpu.ops.denoise import (
    fused_denoise_sweep,
    fused_sweep_supported,
    sweep_coefficients,
    trunk_weight_bytes,
)

B, D, H, K, L = 8, 8, 32, 5, 2


def make_core():
    cfg = ActiveInferenceConfig(
        observation_dim=5, action_dim=2, latent_dim=D, hidden_dim=H,
        score_num_layers=L,
        diffusion=DiffusionConfig(num_diffusion_steps=K, beta_schedule="cosine"),
    )
    cfg.tpu.donate_buffers = False
    agent = DiffusionStateAgent(5, 2, cfg, TrainingConfig())
    params = agent.core.init_params(jax.random.PRNGKey(0))
    return agent.core, params


def xla_reference_sweep(core, params, z0, obs, num_steps, deterministic=True):
    """Plain-XLA loop of trunk + p_sample, sharing z0."""
    variables = {"params": params["score"]}
    obs_emb = core.score_network.apply(variables, obs, method="obs_embedding")
    timesteps = jnp.arange(num_steps - 1, -1, -1, dtype=jnp.int32)
    t_embs = core.score_network.apply(
        variables, timesteps.astype(jnp.float32), continuous=False,
        method="time_embedding",
    )
    z = z0
    for i in range(num_steps):
        cond = obs_emb + t_embs[i][None, :]
        score = core.score_network.apply(variables, z, cond, None, method="trunk")
        t_batch = jnp.full((z.shape[0],), timesteps[i], dtype=jnp.int32)
        z = dproc.p_sample(
            core.schedule, z, t_batch, score, jnp.zeros_like(z),
            deterministic=deterministic,
        )
    return z, obs_emb, t_embs


def test_supported_predicate():
    assert fused_sweep_supported(128, 32, 6)
    assert not fused_sweep_supported(512, 128, 6)
    assert trunk_weight_bytes(128, 32, 6) < 8 * 2**20


def test_sweep_coefficients_order():
    from active_inference_diffusion_tpu.core.schedules import make_schedule

    sched = make_schedule(K, "cosine")
    coeffs = sweep_coefficients(sched, K, deterministic=False)
    assert coeffs.shape == (K, 8)
    # first sweep step is t=K-1, last is t=0 with zero noise mask
    np.testing.assert_allclose(
        float(coeffs[0, 0]), float(sched.sqrt_one_minus_alphas_cumprod[K - 1])
    )
    assert float(coeffs[-1, 5]) == 0.0  # no noise at t=0
    assert float(coeffs[0, 5]) == 1.0


def test_fused_kernel_matches_xla_deterministic():
    core, params = make_core()
    z0 = jax.random.normal(jax.random.PRNGKey(1), (B, D))
    obs = jax.random.normal(jax.random.PRNGKey(2), (B, 5))

    expected, obs_emb, t_embs = xla_reference_sweep(core, params, z0, obs, K)

    actual = fused_denoise_sweep(
        core.schedule, params["score"], z0, obs_emb, t_embs,
        seed=jnp.asarray(0), num_steps=K, num_layers=L,
        deterministic=True, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(actual), np.asarray(expected), rtol=2e-4, atol=2e-5
    )


def test_fused_kernel_partial_sweep():
    core, params = make_core()
    z0 = jax.random.normal(jax.random.PRNGKey(1), (B, D))
    obs = jax.random.normal(jax.random.PRNGKey(2), (B, 5))
    expected, obs_emb, t_embs = xla_reference_sweep(core, params, z0, obs, 3)
    actual = fused_denoise_sweep(
        core.schedule, params["score"], z0, obs_emb, t_embs[:3],
        seed=jnp.asarray(0), num_steps=3, num_layers=L,
        deterministic=True, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(actual), np.asarray(expected), rtol=2e-4, atol=2e-5
    )


def test_fused_kernel_bfloat16_close_to_f32():
    """bf16 matmul kernels (TpuConfig.compute_dtype) track the f32 sweep."""
    core, params = make_core()
    z0 = jax.random.normal(jax.random.PRNGKey(1), (B, D))
    obs = jax.random.normal(jax.random.PRNGKey(2), (B, 5))
    expected, obs_emb, t_embs = xla_reference_sweep(core, params, z0, obs, K)
    actual = fused_denoise_sweep(
        core.schedule, params["score"], z0, obs_emb, t_embs,
        seed=jnp.asarray(0), num_steps=K, num_layers=L,
        deterministic=True, interpret=True, compute_dtype=jnp.bfloat16,
    )
    assert actual.dtype == expected.dtype  # state update stays f32
    # bf16 has ~3 decimal digits; the K-step recursion compounds the error
    np.testing.assert_allclose(
        np.asarray(actual), np.asarray(expected), rtol=0.1, atol=0.05
    )


def test_fused_kernel_batch_tiling():
    core, params = make_core()
    z0 = jax.random.normal(jax.random.PRNGKey(1), (B, D))
    obs = jax.random.normal(jax.random.PRNGKey(2), (B, 5))
    expected, obs_emb, t_embs = xla_reference_sweep(core, params, z0, obs, K)
    actual = fused_denoise_sweep(
        core.schedule, params["score"], z0, obs_emb, t_embs,
        seed=jnp.asarray(0), num_steps=K, num_layers=L,
        deterministic=True, batch_tile=4, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(actual), np.asarray(expected), rtol=2e-4, atol=2e-5
    )


def test_bits_to_normal_signed_bits_finite_and_standard():
    """Regression: TPU prng_random_bits is signed int32; the Box-Muller
    conversion must stay finite for negative bit patterns (a sign-preserving
    shift once produced log(negative) = NaN on every stochastic sweep step)."""
    from active_inference_diffusion_tpu.ops.denoise import bits_to_normal

    rng = np.random.default_rng(0)
    # full signed int32 range, including guaranteed negatives
    bits1 = jnp.asarray(
        rng.integers(-(2**31), 2**31, size=(4096,), dtype=np.int64).astype(np.int32)
    )
    bits2 = jnp.asarray(
        rng.integers(-(2**31), 2**31, size=(4096,), dtype=np.int64).astype(np.int32)
    )
    z = np.asarray(bits_to_normal(bits1, bits2))
    assert np.isfinite(z).all()
    assert abs(z.mean()) < 0.1
    assert abs(z.std() - 1.0) < 0.1


# ----------------------------- v2 kernel -----------------------------------
# Fused-linear variant (VERDICT r4 #8): v_proj@out_proj combined (exact at
# sequence length 1 — attention of one token to itself is the identity mix)
# and all adaLN modulation products batched into one wide matmul per step.


def test_fused_kernel_v2_matches_xla_deterministic():
    from active_inference_diffusion_tpu.ops.denoise import fused_denoise_sweep_v2

    core, params = make_core()
    z0 = jax.random.normal(jax.random.PRNGKey(1), (B, D))
    obs = jax.random.normal(jax.random.PRNGKey(2), (B, 5))
    expected, obs_emb, t_embs = xla_reference_sweep(core, params, z0, obs, K)
    actual = fused_denoise_sweep_v2(
        core.schedule, params["score"], z0, obs_emb, t_embs,
        seed=jnp.asarray(0), num_steps=K, num_layers=L,
        deterministic=True, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(actual), np.asarray(expected), rtol=2e-4, atol=2e-5
    )


def test_fused_kernel_v2_matches_v1_and_tiling():
    from active_inference_diffusion_tpu.ops.denoise import (
        fused_denoise_sweep_v2,
    )

    core, params = make_core()
    z0 = jax.random.normal(jax.random.PRNGKey(1), (B, D))
    obs = jax.random.normal(jax.random.PRNGKey(2), (B, 5))
    _, obs_emb, t_embs = xla_reference_sweep(core, params, z0, obs, K)
    v1 = fused_denoise_sweep(
        core.schedule, params["score"], z0, obs_emb, t_embs,
        seed=jnp.asarray(0), num_steps=K, num_layers=L,
        deterministic=True, interpret=True,
    )
    v2 = fused_denoise_sweep_v2(
        core.schedule, params["score"], z0, obs_emb, t_embs,
        seed=jnp.asarray(0), num_steps=K, num_layers=L,
        deterministic=True, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(v2), np.asarray(v1), rtol=2e-4, atol=2e-5
    )
    tiled = fused_denoise_sweep_v2(
        core.schedule, params["score"], z0, obs_emb, t_embs,
        seed=jnp.asarray(0), num_steps=K, num_layers=L,
        deterministic=True, batch_tile=4, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(tiled), np.asarray(v2), rtol=2e-4, atol=2e-5
    )


def test_fused_kernel_v2_bfloat16_close_to_f32():
    from active_inference_diffusion_tpu.ops.denoise import (
        fused_denoise_sweep_v2,
    )

    core, params = make_core()
    z0 = jax.random.normal(jax.random.PRNGKey(1), (B, D))
    obs = jax.random.normal(jax.random.PRNGKey(2), (B, 5))
    expected, obs_emb, t_embs = xla_reference_sweep(core, params, z0, obs, K)
    actual = fused_denoise_sweep_v2(
        core.schedule, params["score"], z0, obs_emb, t_embs,
        seed=jnp.asarray(0), num_steps=K, num_layers=L,
        deterministic=True, interpret=True, compute_dtype=jnp.bfloat16,
    )
    np.testing.assert_allclose(
        np.asarray(actual), np.asarray(expected), rtol=0.1, atol=0.05
    )
