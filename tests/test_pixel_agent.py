"""Pixel pipeline tests: augmentation, encoders/decoder, pixel agent train step.

Uses tiny 16x16 images to keep CPU compile times reasonable; shapes scale to
84x84 by construction (conv stacks are size-polymorphic at trace time).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from active_inference_diffusion_tpu.agents.pixel_agent import DiffusionPixelAgent
from active_inference_diffusion_tpu.configs.config import (
    ActiveInferenceConfig,
    DiffusionConfig,
    PixelObservationConfig,
    TrainingConfig,
)
from active_inference_diffusion_tpu.models.encoders import (
    ConvDecoder,
    DrQV2Encoder,
    SpatialAttentionAggregator,
    depth_to_space,
)
from active_inference_diffusion_tpu.ops.shift_aug import random_shift

H = W = 16
FRAME_STACK = 2
C = 3


def test_random_shift_preserves_shape_and_content_distribution():
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (8, H, W, C))
    out = random_shift(x, jax.random.PRNGKey(1), pad=4)
    assert out.shape == x.shape
    # shifts are crops of the padded image: values drawn from the original set
    assert float(out.min()) >= float(x.min()) - 1e-6
    assert float(out.max()) <= float(x.max()) + 1e-6
    # different keys give different shifts
    out2 = random_shift(x, jax.random.PRNGKey(2), pad=4)
    assert not np.allclose(np.asarray(out), np.asarray(out2))


def test_random_shift_zero_offset_identity():
    # with pad=0 the transform is identity
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, H, W, C))
    out = random_shift(x, jax.random.PRNGKey(1), pad=0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x))


def test_drqv2_encoder_shapes():
    enc = DrQV2Encoder(
        obs_shape=(C, H, W), feature_dim=12, frame_stack=FRAME_STACK,
        num_layers=2, num_filters=8,
    )
    x = jax.random.uniform(jax.random.PRNGKey(0), (4, H, W, C * FRAME_STACK))
    params = enc.init(jax.random.PRNGKey(1), x, train=False)
    feats = enc.apply(params, x, train=False)
    assert feats.shape == (4, 12)
    assert (np.abs(np.asarray(feats)) <= 1.0).all()  # tanh output

    # accepts NCHW layout too
    x_nchw = jnp.moveaxis(x, -1, 1)
    feats2 = enc.apply(params, x_nchw, train=False)
    np.testing.assert_allclose(np.asarray(feats), np.asarray(feats2), rtol=1e-5)


def test_depth_to_space_roundtrip():
    x = jnp.arange(2 * 3 * 3 * 8, dtype=jnp.float32).reshape(2, 3, 3, 8)
    y = depth_to_space(x, 2)
    assert y.shape == (2, 6, 6, 2)
    # block (0,0) of the output comes from pixel (0,0)'s channels
    np.testing.assert_allclose(np.asarray(y[0, 0, 0]), np.asarray(x[0, 0, 0, 0:2]))


def test_conv_decoder_output_range():
    dec = ConvDecoder(latent_dim=8, img_channels=C, hidden_dim=32, spatial_size=4)
    z = jax.random.normal(jax.random.PRNGKey(0), (2, 8))
    params = dec.init(jax.random.PRNGKey(1), z, train=False)
    img = dec.apply(params, z, train=False)
    assert img.shape == (2, 16, 16, C)  # spatial_size * 4
    assert float(img.min()) >= 0.0 and float(img.max()) <= 1.0


def test_spatial_attention_aggregator():
    agg = SpatialAttentionAggregator(feature_dim=16, num_heads=4, spatial_dim=5,
                                     output_dim=32)
    x = jax.random.normal(jax.random.PRNGKey(0), (3, 5, 5, 16))
    params = agg.init(jax.random.PRNGKey(1), x, train=False)
    out, attn = agg.apply(params, x, train=False)
    assert out.shape == (3, 32)
    assert np.isfinite(np.asarray(out)).all()


@pytest.fixture(scope="module")
def pixel_agent_and_state():
    cfg = ActiveInferenceConfig(
        action_dim=2, latent_dim=8, hidden_dim=32, score_num_layers=1,
        batch_size=4, efe_horizon=2, num_efe_trajectories=2,
        num_ambiguity_samples=2, epistemic_update_every=2,
        pixel_observation=True,
        diffusion=DiffusionConfig(num_diffusion_steps=3, beta_schedule="linear"),
    )
    cfg.tpu.donate_buffers = False
    pcfg = PixelObservationConfig(
        image_shape=(C, H, W), frame_stack=FRAME_STACK, random_shift_pad=2
    )
    tcfg = TrainingConfig(buffer_size=32, collect_diffusion_steps=2)
    agent = DiffusionPixelAgent(
        obs_shape=(FRAME_STACK, C, H, W), action_dim=2,
        config=cfg, training_config=tcfg, pixel_config=pcfg,
    )
    state = agent.init_train_state(jax.random.PRNGKey(0))
    return agent, state


def _pixel_batch(key, b=4):
    k = jax.random.split(key, 5)
    obs_shape = (b, FRAME_STACK, C, H, W)
    return {
        "observations": jax.random.randint(k[0], obs_shape, 0, 256, jnp.int32).astype(jnp.uint8),
        "actions": jax.random.normal(k[1], (b, 2)),
        "rewards": jax.random.normal(k[2], (b,)),
        "next_observations": jax.random.randint(k[3], obs_shape, 0, 256, jnp.int32).astype(jnp.uint8),
        "dones": jax.random.bernoulli(k[4], 0.1, (b,)),
    }


def test_pixel_agent_param_groups(pixel_agent_and_state):
    agent, state = pixel_agent_and_state
    assert "encoder" in state.params
    assert "feature_decoder" in state.params
    assert "encoder" in agent.PARTITIONS["score"]


def test_pixel_agent_train_step(pixel_agent_and_state):
    agent, state = pixel_agent_and_state
    batch = _pixel_batch(jax.random.PRNGKey(1))
    new_state, metrics = agent.train_step(state, batch)

    assert "contrastive_loss" in metrics
    for name in ["reconstruction_loss", "score_matching_loss", "policy_loss",
                 "value_loss", "dynamics_loss", "contrastive_loss"]:
        assert np.isfinite(float(metrics[name])), name

    def tree_diff(a, b):
        return sum(
            float(jnp.sum(jnp.abs(x - y)))
            for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b))
        )

    # encoder receives gradients through the fused score loss
    assert tree_diff(state.params["encoder"], new_state.params["encoder"]) > 0
    assert tree_diff(state.params["feature_decoder"], new_state.params["feature_decoder"]) > 0


def test_pixel_agent_act(pixel_agent_and_state):
    agent, state = pixel_agent_and_state
    obs = np.random.default_rng(0).integers(
        0, 256, size=(FRAME_STACK, C, H, W), dtype=np.uint8
    )
    action = agent.act(state, obs, jax.random.PRNGKey(2))
    assert action.shape == (1, 2)
    assert (np.abs(action) <= 1.0).all()

    batch_obs = np.random.default_rng(1).integers(
        0, 256, size=(3, FRAME_STACK, C, H, W), dtype=np.uint8
    )
    actions = agent.act(state, batch_obs, jax.random.PRNGKey(3))
    assert actions.shape == (3, 2)


def test_pixel_agent_act_planned_chunked_probes():
    """plan_candidates > 0 with epistemic_weight != 0 on a PIXEL agent routes
    the planning EFE's epistemic decoder probes through the chunked path
    (the fused vmap expansion OOMs real HBM; regression for the threading of
    probe_chunk_rows into core.act_planned)."""
    cfg = ActiveInferenceConfig(
        action_dim=2, latent_dim=8, hidden_dim=32, score_num_layers=1,
        batch_size=4, efe_horizon=2, num_efe_trajectories=2,
        num_ambiguity_samples=2, epistemic_weight=0.1, plan_candidates=3,
        pixel_observation=True,
        diffusion=DiffusionConfig(num_diffusion_steps=3, beta_schedule="linear"),
    )
    cfg.tpu.donate_buffers = False
    pcfg = PixelObservationConfig(
        image_shape=(C, H, W), frame_stack=FRAME_STACK, random_shift_pad=2
    )
    agent = DiffusionPixelAgent(
        obs_shape=(FRAME_STACK, C, H, W), action_dim=2,
        config=cfg, training_config=TrainingConfig(buffer_size=32),
        pixel_config=pcfg,
    )
    state = agent.init_train_state(jax.random.PRNGKey(4))
    obs = np.random.default_rng(5).integers(
        0, 256, size=(3, FRAME_STACK, C, H, W), dtype=np.uint8
    )
    actions = agent.act(state, obs, jax.random.PRNGKey(6))
    assert actions.shape == (3, 2)
    assert np.isfinite(np.asarray(actions)).all()


def test_pixel_warm_start_act():
    """Pixel agents route warm-start acting through the conv encoder hook."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from active_inference_diffusion_tpu.agents.pixel_agent import DiffusionPixelAgent
    from active_inference_diffusion_tpu.configs.config import (
        ActiveInferenceConfig,
        DiffusionConfig,
        PixelObservationConfig,
        TrainingConfig,
    )

    cfg = ActiveInferenceConfig(
        action_dim=2, latent_dim=8, hidden_dim=32, score_num_layers=1,
        efe_horizon=2, num_efe_trajectories=2,
        diffusion=DiffusionConfig(num_diffusion_steps=3, beta_schedule="linear"),
    )
    cfg.tpu.donate_buffers = False
    pcfg = PixelObservationConfig(image_shape=(3, 32, 32), frame_stack=2)
    agent = DiffusionPixelAgent(
        obs_shape=(2, 3, 32, 32), action_dim=2, config=cfg,
        training_config=TrainingConfig(collect_diffusion_steps=2),
        pixel_config=pcfg,
    )
    state = agent.init_train_state(jax.random.PRNGKey(0))
    obs = np.random.default_rng(0).integers(0, 255, (3, 2, 3, 32, 32), dtype=np.uint8)
    prev = jnp.zeros((3, 8))
    actions, latents = agent.act_warm(
        state, obs, jax.random.PRNGKey(1), prev, np.ones(3, bool)
    )
    assert actions.shape == (3, 2) and latents.shape == (3, 8)
    assert np.isfinite(actions).all() and (np.abs(actions) <= 1).all()


def test_pixel_agent_imagined_mode_with_stabilizers():
    """The pixel agent shares the imagined actor-critic path (train step is
    inherited): a train step with the full stabilizer stack runs on pixel
    batches, produces finite metrics, and advances log_alpha/return_scale."""
    cfg = ActiveInferenceConfig(
        action_dim=2, latent_dim=8, hidden_dim=32, score_num_layers=1,
        batch_size=4, efe_horizon=2, num_efe_trajectories=2,
        num_ambiguity_samples=2, epistemic_update_every=2,
        pixel_observation=True,
        imagined_value_targets=True, imagine_deterministic=True,
        auto_entropy=True, imagined_reward_pessimism=0.5,
        diffusion=DiffusionConfig(num_diffusion_steps=3, beta_schedule="linear"),
    )
    cfg.tpu.donate_buffers = False
    pcfg = PixelObservationConfig(
        image_shape=(C, H, W), frame_stack=FRAME_STACK, random_shift_pad=2
    )
    tcfg = TrainingConfig(buffer_size=32, collect_diffusion_steps=2)
    agent = DiffusionPixelAgent(
        obs_shape=(FRAME_STACK, C, H, W), action_dim=2,
        config=cfg, training_config=tcfg, pixel_config=pcfg,
    )
    state = agent.init_train_state(jax.random.PRNGKey(0))
    batch = _pixel_batch(jax.random.PRNGKey(1))
    new_state, metrics = agent.train_step(state, batch)
    for name in ["imagined/lambda_return_mean", "imagined/entropy_scale",
                 "value_loss", "policy_loss", "contrastive_loss"]:
        assert np.isfinite(float(metrics[name])), name
    assert float(new_state.log_alpha) != float(state.log_alpha)
    assert float(new_state.return_scale) != float(state.return_scale)


def test_pixel_recon_target_stopgrad_semantics(pixel_agent_and_state):
    """Corrected mode stop-gradients the pixel ELBO reconstruction TARGET:
    the recon term alone must carry NO encoder gradient (the collapse
    incentive — constant features give recon=0 and chance-level InfoNCE —
    observed at the reference pixel config). Faithful mode keeps the
    reference's through-the-target gradient (pixel_agent.py:317-333)."""
    agent, state = pixel_agent_and_state
    batch = _pixel_batch(jax.random.PRNGKey(7))
    latents = jax.random.normal(jax.random.PRNGKey(8), (4, 8))
    rewards = batch["rewards"]

    def recon_term(enc_params, stopgrad_target: bool):
        p = dict(state.params)
        p["encoder"] = enc_params
        enc_obs = agent._apply_encoder(
            p, batch["observations"], None, augment=False, train=False
        )
        terms = agent.core.elbo_terms(
            p, jax.random.PRNGKey(9), enc_obs, rewards, latents,
            state.time_importance, train=False,
            recon_target=(
                jax.lax.stop_gradient(enc_obs) if stopgrad_target else None
            ),
        )
        return terms["reconstruction_loss"]

    g_corrected = jax.grad(recon_term)(state.params["encoder"], True)
    g_faithful = jax.grad(recon_term)(state.params["encoder"], False)
    norm = lambda t: sum(
        float(jnp.sum(jnp.abs(x))) for x in jax.tree_util.tree_leaves(t)
    )
    assert norm(g_corrected) == 0.0
    assert norm(g_faithful) > 0.0

    # and the semantics property resolves as documented
    from active_inference_diffusion_tpu.configs.config import SemanticsConfig

    assert SemanticsConfig(mode="corrected").pixel_recon_target_stopgrad
    assert not SemanticsConfig(mode="faithful").pixel_recon_target_stopgrad


@pytest.fixture(scope="module")
def forward_pixel_agent_and_state():
    """Arm-F stack: contrastive off, SPR-style latent forward regression on,
    posterior beliefs (the acting-latent path the round-5 probe measured)."""
    cfg = ActiveInferenceConfig(
        action_dim=2, latent_dim=8, hidden_dim=32, score_num_layers=1,
        batch_size=4, efe_horizon=2, num_efe_trajectories=2,
        num_ambiguity_samples=2, epistemic_update_every=2,
        pixel_observation=True, posterior_beliefs=True,
        contrastive_weight=0.0, latent_forward_weight=1.0,
        diffusion=DiffusionConfig(num_diffusion_steps=3, beta_schedule="linear"),
    )
    cfg.tpu.donate_buffers = False
    pcfg = PixelObservationConfig(
        image_shape=(C, H, W), frame_stack=FRAME_STACK, random_shift_pad=2
    )
    tcfg = TrainingConfig(buffer_size=32, collect_diffusion_steps=2)
    agent = DiffusionPixelAgent(
        obs_shape=(FRAME_STACK, C, H, W), action_dim=2,
        config=cfg, training_config=tcfg, pixel_config=pcfg,
    )
    state = agent.init_train_state(jax.random.PRNGKey(0))
    return agent, state


def test_latent_forward_loss_reported(forward_pixel_agent_and_state):
    agent, state = forward_pixel_agent_and_state
    batch = _pixel_batch(jax.random.PRNGKey(3))
    _, metrics = agent.train_step(state, batch)
    assert "latent_forward_loss" in metrics
    assert "contrastive_loss" not in metrics  # weight 0 -> term skipped
    assert np.isfinite(float(metrics["latent_forward_loss"]))


def test_latent_forward_grads_reach_encoder(forward_pixel_agent_and_state):
    """The point of the fix: the forward-regression term alone must push
    gradient into the encoder+posterior through z_t (the main dynamics loss
    stop-gradients both sides, so without this term the acting latent gets
    zero predict-the-future pressure — round-5 velocity-blindness)."""
    agent, state = forward_pixel_agent_and_state
    batch = _pixel_batch(jax.random.PRNGKey(4))
    key = jax.random.PRNGKey(5)

    def fwd_only(sub):
        p = dict(state.params)
        p.update(sub)
        enc_obs, enc_next = agent._encode_batch(p, batch, key, train=False)
        z = agent.core.sample_posterior(
            p["posterior"], key, jnp.concatenate([enc_obs, enc_next], 0),
            deterministic=True,
        )
        lat, next_lat = jnp.split(z, 2, axis=0)
        loss, info = agent._extra_score_loss(
            p, batch, enc_obs, enc_next, lat, next_lat
        )
        assert "latent_forward_loss" in info
        return loss

    grads = jax.grad(fwd_only)(
        {k: state.params[k] for k in ("encoder", "posterior")}
    )
    norm = lambda t: sum(
        float(jnp.sum(jnp.abs(x))) for x in jax.tree_util.tree_leaves(t)
    )
    assert norm(grads["encoder"]) > 0.0
    assert norm(grads["posterior"]) > 0.0
