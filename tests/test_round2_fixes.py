"""Round-2 correctness fixes: epistemic sign in planning, Fokker-Planck
belief refinement wiring (C-4a), stateless spectral norm, terminated vs
truncated in the fused path, and host-replay key discipline."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from active_inference_diffusion_tpu.configs.config import (
    ActiveInferenceConfig,
    DiffusionConfig,
    SemanticsConfig,
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


# ---------------------------------------------------------------------------
# Epistemic sign (ADVICE round 1, medium): corrected mode must PREFER
# information gain when comparing EFE values.
# ---------------------------------------------------------------------------


def test_epistemic_sign_properties():
    assert SemanticsConfig(mode="corrected").epistemic_sign == -1.0
    assert SemanticsConfig(mode="faithful").epistemic_sign == 1.0


def test_planned_efe_prefers_info_gain_when_pragmatics_tie(monkeypatch):
    """With only the epistemic term active, corrected-mode argmin-EFE picks
    the candidate the faithful (reference-sign) assembly would AVOID —
    i.e. the highest-information-gain action (p(a) ∝ exp(-G))."""
    # Zero out pragmatic/consistency so candidates tie on everything but info
    # gain; policy_squash pinned so both modes sample identical candidates.
    common = dict(
        pragmatic_weight=0.0,
        efe_value_weight=0.0,
        consistency_weight=0.0,
        epistemic_weight=1.0,
        policy_squash=True,
    )
    agent_c = make_agent(**common)
    agent_f = make_agent(**common)
    agent_f.config.semantics.mode = "faithful"

    # The real MINE estimate is relu-floored at 0 and exactly 0 under the
    # zero-initialized statistics head, so the init landscape is degenerate.
    # Substitute a deterministic candidate-dependent info-gain surrogate (a
    # pure function of the imagined next-state mean) — the unit under test is
    # the SIGN the EFE assembly applies, not the MINE estimator itself.
    from active_inference_diffusion_tpu.core import active_inference as ai_mod
    from active_inference_diffusion_tpu.core.epistemic import EpistemicResult

    def fake_estimate(estimator, eparams, decoder_fn, next_mean, next_logvar,
                      key, running_mean, num_samples, train,
                      probe_chunk_rows=None):
        value = jnp.sum(next_mean**2, axis=-1)  # (B,) >= 0, candidate-dependent
        return EpistemicResult(value, jnp.mean(value), running_mean, {})

    monkeypatch.setattr(ai_mod, "estimate_epistemic_value", fake_estimate)

    params = agent_c.core.init_params(jax.random.PRNGKey(0))
    latent = jax.random.normal(jax.random.PRNGKey(1), (3, 8))
    key = jax.random.PRNGKey(2)
    candidates = jax.random.uniform(
        jax.random.PRNGKey(3), (4, 3, 2), minval=-1.0, maxval=1.0
    )
    temp = jnp.asarray(1.0)

    def efes(agent):
        def score(a):
            efe, _ = agent.core.compute_expected_free_energy(
                params, latent, key, temp, first_action=a,
                include_epistemic=True,
            )
            return efe

        return jax.vmap(score)(candidates)  # (C, B)

    efe_c = np.asarray(efes(agent_c))
    efe_f = np.asarray(efes(agent_f))

    # Same magnitude, opposite sign: G_corrected = -(info gain), G_faithful = +.
    np.testing.assert_allclose(efe_c, -efe_f, rtol=1e-5, atol=1e-6)
    # Corrected argmin picks exactly the candidate faithful argmin avoids.
    assert (np.argmin(efe_c, axis=0) == np.argmax(efe_f, axis=0)).all()
    # And the epistemic values actually differ across candidates (the test
    # would be vacuous on a constant-epistemic landscape).
    assert np.std(efe_c, axis=0).min() > 0.0


# ---------------------------------------------------------------------------
# Fokker-Planck belief refinement (C-4a wired, VERDICT missing #4)
# ---------------------------------------------------------------------------


def test_fp_refine_mean_descends_quadratic():
    """Mean refinement is gradient descent on F: on F(z) = ||z - target||^2/2
    it contracts toward the target."""
    from active_inference_diffusion_tpu.core.belief_dynamics import (
        FPConfig,
        fp_refine_mean,
    )

    target = jnp.asarray([[2.0, -1.0, 0.5]])
    z0 = jnp.zeros((1, 3))
    cfg = FPConfig(learning_rate=1.0, dt=0.5, noise_scale=0.0, diffusion_coefficient=0.0)

    fe = lambda z: 0.5 * jnp.sum((z - target) ** 2, axis=-1)
    z = fp_refine_mean(z0, jax.random.PRNGKey(0), cfg, fe, num_steps=25)
    d0 = float(jnp.linalg.norm(z0 - target))
    d1 = float(jnp.linalg.norm(z - target))
    assert d1 < 0.25 * d0


def test_use_belief_dynamics_has_observable_effect():
    """The flag must change acting (it was inert in round 1 and is declared
    but never consumed by the reference)."""
    agent_off = make_agent()
    agent_on = make_agent()
    agent_on.config.belief_dynamics.use_belief_dynamics = True
    agent_on.config.belief_dynamics.refine_steps = 3

    assert agent_off.config.belief_dynamics.use_belief_dynamics is False

    state = agent_off.init_train_state(jax.random.PRNGKey(0))
    obs = np.random.default_rng(0).normal(size=(4, 5)).astype(np.float32)
    key = jax.random.PRNGKey(5)

    a_off = agent_off.act(state, obs, key, deterministic=True)
    a_on = agent_on.act(state, obs, key, deterministic=True)
    assert np.isfinite(a_on).all()
    assert not np.allclose(a_off, a_on)


def test_refine_beliefs_reduces_decoder_free_energy():
    agent = make_agent()
    agent.config.belief_dynamics.refine_steps = 10
    agent.config.belief_dynamics.noise_scale = 1.0  # mild likelihood precision
    agent.config.belief_dynamics.learning_rate = 0.5
    core = agent.core
    params = core.init_params(jax.random.PRNGKey(0))
    obs = jax.random.normal(jax.random.PRNGKey(1), (6, 5))
    latent = jax.random.normal(jax.random.PRNGKey(2), (6, 8))

    def free_energy(z):
        decoded = core.decode_observation(params, z, train=False)
        return (
            0.5 * jnp.sum((decoded - obs) ** 2, axis=-1)
            + 0.5 * jnp.sum(z**2, axis=-1)
        )

    refined = core.refine_beliefs(params, jax.random.PRNGKey(3), latent, obs)
    assert float(jnp.mean(free_energy(refined))) < float(
        jnp.mean(free_energy(latent))
    )


# ---------------------------------------------------------------------------
# Spectral normalization (VERDICT missing #5)
# ---------------------------------------------------------------------------


def test_spectral_normalize_unit_norm():
    from active_inference_diffusion_tpu.models.encoders import spectral_normalize

    w = jax.random.normal(jax.random.PRNGKey(0), (3, 3, 16, 32))
    wn = spectral_normalize(w, num_iters=30)
    sigma = np.linalg.svd(
        np.asarray(wn).reshape(-1, 32), compute_uv=False
    ).max()
    assert abs(sigma - 1.0) < 1e-3


def test_drqv2_spectral_norm_flag():
    from active_inference_diffusion_tpu.models.encoders import DrQV2Encoder

    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 21, 21, 3))
    for flag in (False, True):
        enc = DrQV2Encoder(
            obs_shape=(3, 21, 21), feature_dim=16, num_layers=2,
            num_filters=8, use_spectral_norm=flag,
        )
        params = enc.init(jax.random.PRNGKey(1), x, train=False)["params"]
        out = enc.apply({"params": params}, x, train=False)
        assert out.shape == (2, 16)
        assert np.isfinite(np.asarray(out)).all()
        # param tree structure is flag-independent (SNConv is a drop-in)
        assert "conv0" in params and "kernel" in params["conv0"]


def test_conv_decoder_spectral_norm_flag():
    from active_inference_diffusion_tpu.models.encoders import ConvDecoder

    z = jax.random.normal(jax.random.PRNGKey(0), (2, 8))
    dec = ConvDecoder(
        latent_dim=8, img_channels=3, hidden_dim=32, spatial_size=4,
        use_spectral_norm=True,
    )
    params = dec.init(jax.random.PRNGKey(1), z, train=False)["params"]
    out = dec.apply({"params": params}, z, train=False)
    assert out.shape == (2, 16, 16, 3)
    assert np.isfinite(np.asarray(out)).all()


# ---------------------------------------------------------------------------
# terminated vs truncated in the fused path (ADVICE round 1, low)
# ---------------------------------------------------------------------------


def test_fused_collect_separates_termination_from_truncation():
    from active_inference_diffusion_tpu.envs.jax_envs import (
        fused_collect,
        make_jax_env,
    )

    env = make_jax_env("Pendulum-v1")  # 200-step time limit, never terminates

    def random_policy(obs, key):
        return jax.random.uniform(key, (obs.shape[0], 1), minval=-2.0, maxval=2.0)

    transitions, _ = fused_collect(
        env, random_policy, jax.random.PRNGKey(0), num_envs=2, num_steps=205
    )
    dones = np.asarray(transitions.dones)
    terms = np.asarray(transitions.terminateds)
    assert dones.any(), "time limit must set done"
    assert not terms.any(), "pure time-limit envs must never report terminated"
    assert terms.dtype == bool


def test_autoreset_preserves_terminated_of_finishing_step():
    from active_inference_diffusion_tpu.envs.jax_envs import make_jax_env

    env = make_jax_env("PointMass2D-v0")
    state = env.reset(jax.random.PRNGKey(0))
    # Fast-forward to the last step so the next step truncates.
    state = state.replace(step_count=jnp.asarray(env.max_episode_steps - 1, jnp.int32))
    nxt, true_next_obs = env.step_autoreset(state, jnp.zeros(2))
    assert bool(nxt.done)
    assert not bool(nxt.terminated)
    assert int(nxt.step_count) == 0  # fresh episode carried
    # the TRUE successor obs, not the fresh episode's first obs
    assert not jnp.allclose(true_next_obs, nxt.obs)


# ---------------------------------------------------------------------------
# Chunked Jacobian probes (pixel HBM fix) match the fused vmap exactly
# ---------------------------------------------------------------------------


def test_chunked_jacobian_probes_match_vmap():
    from active_inference_diffusion_tpu.core.epistemic import (
        compute_jacobian_probes,
    )

    w = jax.random.normal(jax.random.PRNGKey(0), (6, 9))

    def decoder(z):
        return jnp.tanh(z @ w)

    z = jax.random.normal(jax.random.PRNGKey(1), (12, 6))
    key = jax.random.PRNGKey(2)
    full = compute_jacobian_probes(decoder, z, key, 4, jnp.asarray(0.1))
    chunked = compute_jacobian_probes(
        decoder, z, key, 4, jnp.asarray(0.1), chunk_rows=4
    )
    np.testing.assert_allclose(np.asarray(full), np.asarray(chunked), rtol=1e-6)
    # non-divisible chunk falls back to the fused path
    fallback = compute_jacobian_probes(
        decoder, z, key, 4, jnp.asarray(0.1), chunk_rows=5
    )
    np.testing.assert_allclose(np.asarray(full), np.asarray(fallback), rtol=1e-6)


# ---------------------------------------------------------------------------
# Host replay buffers honor their key argument (VERDICT weak #6)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("cls_name", ["HostReplayBuffer", "CompressedReplayBuffer"])
def test_host_replay_key_discipline(cls_name):
    from active_inference_diffusion_tpu.data import replay as replay_mod

    if cls_name == "HostReplayBuffer":
        buf = replay_mod.HostReplayBuffer(64, (4,), 2)
        obs = np.random.default_rng(0).normal(size=(32, 4)).astype(np.float32)
    else:
        buf = replay_mod.CompressedReplayBuffer(64, (8, 8, 3), 2)
        obs = np.random.default_rng(0).integers(
            0, 255, size=(32, 8, 8, 3)
        ).astype(np.uint8)
    acts = np.zeros((32, 2), np.float32)
    rews = np.arange(32, dtype=np.float32)
    buf.add_batch(obs, acts, rews, obs, np.zeros(32, bool))

    k1, k2 = jax.random.split(jax.random.PRNGKey(7))
    b1 = buf.sample(k1, 16)
    b1_again = buf.sample(k1, 16)
    b2 = buf.sample(k2, 16)
    np.testing.assert_array_equal(
        np.asarray(b1["rewards"]), np.asarray(b1_again["rewards"])
    )
    assert not np.array_equal(np.asarray(b1["rewards"]), np.asarray(b2["rewards"]))
    # None key still works (falls back to the internal generator)
    assert buf.sample(None, 4)["rewards"].shape == (4,)


# ---------------------------------------------------------------------------
# Actor learning-rate decay (drift stabilizer)
# ---------------------------------------------------------------------------


def test_policy_lr_decay_anneals_actor_updates():
    """With policy_lr_decay_steps set, the policy group's update magnitude
    decays toward policy_lr_final_scale x the initial step size; all other
    groups are untouched."""
    from active_inference_diffusion_tpu.agents.base import make_optimizers
    from active_inference_diffusion_tpu.configs.config import (
        ActiveInferenceConfig,
    )

    cfg = ActiveInferenceConfig(
        observation_dim=3, action_dim=1,
        policy_lr_scale=1.0, policy_lr_decay_steps=100,
        policy_lr_final_scale=0.1,
    )
    opts = make_optimizers(cfg, {"policy": [], "value": []})
    params = {"w": jnp.ones((4,))}
    grads = {"w": jnp.ones((4,))}

    def run(opt, n):
        state = opt.init(params)
        sizes = []
        for _ in range(n):
            upd, state = opt.update(grads, state, params)
            sizes.append(float(jnp.abs(upd["w"]).mean()))
        return sizes

    psizes = run(opts["policy"], 100)
    # Adam with constant unit grads steps ~lr each update: the cosine decay
    # shows up directly in the update magnitude.
    assert psizes[-1] < 0.2 * psizes[0]
    vsizes = run(opts["value"], 100)
    assert vsizes[-1] > 0.9 * vsizes[0]  # non-policy groups undecayed


# ---------------------------------------------------------------------------
# No silently-ignored config fields (round-1 VERDICT weak-flag class)
# ---------------------------------------------------------------------------


def test_reference_schema_aliases_fold_into_real_knobs():
    cfg = ActiveInferenceConfig(
        observation_dim=3, action_dim=1, expected_free_energy_horizon=7,
        extrinsic_weight=0.5,
    )
    assert cfg.efe_horizon == 7
    assert cfg.pragmatic_weight == 0.5
    # both names set consistently is fine
    cfg2 = ActiveInferenceConfig(
        observation_dim=3, action_dim=1, efe_horizon=9,
        expected_free_energy_horizon=9,
    )
    assert cfg2.efe_horizon == 9
    with pytest.raises(ValueError, match="alias"):
        ActiveInferenceConfig(
            observation_dim=3, action_dim=1, efe_horizon=3,
            expected_free_energy_horizon=7,
        )


def test_unimplemented_diffusion_modes_fail_loudly():
    with pytest.raises(ValueError, match="prediction_type"):
        DiffusionConfig(prediction_type="epsilon")
    with pytest.raises(ValueError, match="continuous"):
        DiffusionConfig(use_continuous_time=False)


def test_pixel_agent_rejects_unimplemented_encoder_type():
    from active_inference_diffusion_tpu.agents.pixel_agent import (
        DiffusionPixelAgent,
    )
    from active_inference_diffusion_tpu.configs.config import (
        PixelObservationConfig,
    )

    cfg = ActiveInferenceConfig(
        observation_dim=4, action_dim=1, latent_dim=4, hidden_dim=16,
        score_num_layers=1,
        diffusion=DiffusionConfig(num_diffusion_steps=2, beta_schedule="linear"),
    )
    cfg.tpu.donate_buffers = False
    with pytest.raises(NotImplementedError, match="encoder_type"):
        DiffusionPixelAgent(
            (3, 16, 16), 1, cfg, TrainingConfig(),
            PixelObservationConfig(encoder_type="multiview"),
        )


def test_precision_init_reaches_free_energy_state():
    agent = make_agent(precision_init=2.5)
    state = agent.core.init_free_energy_state()
    np.testing.assert_allclose(float(jnp.exp(state)), 2.5, rtol=1e-6)


# ---------------------------------------------------------------------------
# Score-target convention gate (DEVIATIONS row 11)
# ---------------------------------------------------------------------------


def test_score_target_convention_gate():
    from active_inference_diffusion_tpu.configs.config import SemanticsConfig

    # Round-4 default flip (two preset-scale A/Bs: HalfCheetahPlanar row-11
    # + Walker2dPlanar std run): corrected mode now trains the TRUE score.
    assert SemanticsConfig().score_target_uses_std is True
    assert SemanticsConfig(
        score_target_convention="reference"
    ).score_target_uses_std is False
    assert SemanticsConfig(mode="faithful").score_target_uses_std is False
    with pytest.raises(ValueError, match="faithful"):
        SemanticsConfig(mode="faithful", score_target_convention="standard")

    # The convention changes the training objective's value.
    agent_ref = make_agent()
    agent_ref.config.semantics.score_target_convention = "reference"
    agent_std = make_agent()
    agent_std.config.semantics.score_target_convention = "standard"
    params = agent_ref.core.init_params(jax.random.PRNGKey(0))
    obs = jax.random.normal(jax.random.PRNGKey(1), (6, 5))
    latents = jax.random.normal(jax.random.PRNGKey(2), (6, 8))
    key = jax.random.PRNGKey(3)

    ti = jnp.zeros((100,))  # uniform time-importance bins

    def score_loss(agent):
        terms = agent.core.elbo_terms(
            params, key, obs, jnp.zeros((6,)), latents, ti, train=False,
        )
        return float(terms["score_matching_loss"])

    assert score_loss(agent_ref) != score_loss(agent_std)


def test_yaml_loading_validates_and_folds_aliases(tmp_path):
    """The YAML path must get the same __post_init__ validation/alias
    folding as constructor args (review finding: setattr alone silently
    bypassed all of it)."""
    from active_inference_diffusion_tpu.configs.config import load_yaml_config

    good = tmp_path / "good.yaml"
    good.write_text(
        """
active_inference:
  observation_dim: 3
  action_dim: 1
  expected_free_energy_horizon: 7
  extrinsic_weight: 0.5
training:
  total_timesteps: 100
"""
    )
    cfg, _, _ = load_yaml_config(str(good))
    assert cfg.efe_horizon == 7
    assert cfg.pragmatic_weight == 0.5

    bad = tmp_path / "bad.yaml"
    bad.write_text(
        """
active_inference:
  observation_dim: 3
  action_dim: 1
  diffusion:
    prediction_type: epsilon
training:
  total_timesteps: 100
"""
    )
    with pytest.raises(ValueError, match="prediction_type"):
        load_yaml_config(str(bad))

    typo = tmp_path / "typo.yaml"
    typo.write_text(
        """
active_inference:
  observation_dim: 3
  action_dim: 1
  semantics:
    mode: faithfull
training:
  total_timesteps: 100
"""
    )
    with pytest.raises(ValueError, match="mode"):
        load_yaml_config(str(typo))
