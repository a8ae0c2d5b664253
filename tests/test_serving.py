"""AOT policy serving (utils/serving.py): export -> bytes -> load -> act.

The artifact must reproduce the live agent's deterministic actions exactly,
carry a readable header, and serve arbitrary batch sizes from one
(shape-polymorphic) export — all without touching the model-building stack
at load time."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from active_inference_diffusion_tpu.agents.state_agent import DiffusionStateAgent
from active_inference_diffusion_tpu.configs.config import (
    ActiveInferenceConfig,
    DiffusionConfig,
    TrainingConfig,
)
from active_inference_diffusion_tpu.utils.serving import (
    ServedPolicy,
    export_policy,
    load_policy,
    save_policy,
)


def tiny_agent(**overrides):
    cfg = ActiveInferenceConfig(
        observation_dim=5, action_dim=2, latent_dim=8, hidden_dim=32,
        score_num_layers=1, batch_size=8,
        efe_horizon=2, num_efe_trajectories=2,
        diffusion=DiffusionConfig(num_diffusion_steps=3, beta_schedule="linear"),
        **overrides,
    )
    cfg.tpu.donate_buffers = False
    return DiffusionStateAgent(5, 2, cfg, TrainingConfig(buffer_size=32))


@pytest.fixture(scope="module")
def agent_state():
    agent = tiny_agent()
    state = agent.init_train_state(jax.random.PRNGKey(0))
    return agent, state


def test_export_load_roundtrip_matches_live_agent(agent_state):
    agent, state = agent_state
    blob = export_policy(agent, state, deterministic=True)
    policy = load_policy(blob)

    obs = np.asarray(
        jax.random.normal(jax.random.PRNGKey(1), (4, 5)), np.float32
    )
    served = policy(obs, seed=7)

    # Live-agent action under the exact exported semantics (deterministic,
    # full sweep, zero exploration noise, same folded key).
    key = jax.random.fold_in(jax.random.PRNGKey(0), jnp.uint32(7))
    live = np.asarray(
        agent._act_impl(
            agent._acting_params(state), key, jnp.asarray(obs),
            jnp.zeros(()), deterministic=True, num_steps=None,
        )
    )
    np.testing.assert_allclose(served, live, rtol=1e-5, atol=1e-6)
    assert served.shape == (4, 2)
    assert np.all(np.abs(served) <= 1.0)


def test_polymorphic_batch_serves_any_size(agent_state):
    agent, state = agent_state
    policy = load_policy(export_policy(agent, state))
    for b in (1, 3, 16):
        out = policy(np.zeros((b, 5), np.float32))
        assert out.shape == (b, 2)
    # unbatched convenience: (obs_dim,) -> (action_dim,)
    single = policy(np.zeros(5, np.float32))
    assert single.shape == (2,)


def test_header_metadata(agent_state, tmp_path):
    agent, state = agent_state
    p = tmp_path / "policy.aidpol"
    header = save_policy(
        str(p), agent, state, num_steps=2, meta={"run": "unit"}
    )
    assert header["action_dim"] == 2
    assert header["obs_shape"] == [5]
    assert header["obs_dtype"] == "float32"
    assert header["batch"] == "polymorphic"
    assert header["num_steps"] == 2
    assert header["deterministic"] is True
    assert header["agent_class"] == "DiffusionStateAgent"
    assert header["run"] == "unit"

    policy = load_policy(str(p))
    assert isinstance(policy, ServedPolicy)
    assert policy.meta == header


def test_stochastic_export_varies_with_seed(agent_state):
    agent, state = agent_state
    policy = load_policy(
        export_policy(agent, state, deterministic=False, num_steps=2)
    )
    obs = np.zeros((2, 5), np.float32)
    a0, a1 = policy(obs, seed=0), policy(obs, seed=1)
    assert not np.allclose(a0, a1), "different seeds must sample different actions"
    np.testing.assert_allclose(policy(obs, seed=0), a0)  # same seed -> same action


def test_bad_magic_and_shape_errors(agent_state):
    agent, state = agent_state
    with pytest.raises(ValueError, match="bad magic"):
        load_policy(b"not-a-policy-artifact")
    policy = load_policy(export_policy(agent, state))
    with pytest.raises(ValueError, match="artifact spec"):
        policy(np.zeros((2, 7), np.float32))


def test_pixel_agent_export_roundtrip():
    """Pixel policies export too: the conv featurization rides inside the
    artifact and the obs spec is the uint8 frame stack."""
    from active_inference_diffusion_tpu.agents.pixel_agent import DiffusionPixelAgent
    from active_inference_diffusion_tpu.configs.config import PixelObservationConfig

    C, H, W, FS = 3, 16, 16, 2
    cfg = ActiveInferenceConfig(
        latent_dim=8, hidden_dim=32, score_num_layers=1,
        batch_size=4, efe_horizon=2, num_efe_trajectories=2,
        num_ambiguity_samples=2, pixel_observation=True,
        diffusion=DiffusionConfig(num_diffusion_steps=2, beta_schedule="linear"),
    )
    cfg.tpu.donate_buffers = False
    pcfg = PixelObservationConfig(image_shape=(C, H, W), frame_stack=FS)
    agent = DiffusionPixelAgent(
        obs_shape=(FS, C, H, W), action_dim=2,
        config=cfg,
        training_config=TrainingConfig(buffer_size=16, collect_diffusion_steps=2),
        pixel_config=pcfg,
    )
    state = agent.init_train_state(jax.random.PRNGKey(0))
    blob = export_policy(agent, state, num_steps=2)
    policy = load_policy(blob)
    assert policy.meta["obs_shape"] == [FS, C, H, W]
    assert policy.meta["obs_dtype"] == "uint8"

    obs = np.random.default_rng(0).integers(
        0, 256, size=(2, FS, C, H, W), dtype=np.uint8
    )
    served = policy(obs, seed=3)
    key = jax.random.fold_in(jax.random.PRNGKey(0), jnp.uint32(3))
    live = np.asarray(
        agent._act_impl(
            agent._acting_params(state), key, jnp.asarray(obs),
            jnp.zeros(()), deterministic=True, num_steps=2,
        )
    )
    np.testing.assert_allclose(served, live, rtol=1e-5, atol=1e-6)


def test_ema_substitution_respected():
    """use_ema_for_act agents must bake the EMA shadow, not the raw params."""
    agent = tiny_agent(use_ema_for_act=True)
    state = agent.init_train_state(jax.random.PRNGKey(0))
    # Make the EMA shadow differ measurably from the live score params.
    bent = jax.tree_util.tree_map(lambda x: x + 0.3, state.ema_score)
    state = state.replace(ema_score=bent)

    policy = load_policy(export_policy(agent, state))
    obs = np.asarray(jax.random.normal(jax.random.PRNGKey(2), (3, 5)), np.float32)

    key = jax.random.fold_in(jax.random.PRNGKey(0), jnp.uint32(0))
    expected = np.asarray(
        agent._act_impl(
            agent._acting_params(state), key, jnp.asarray(obs),
            jnp.zeros(()), deterministic=True, num_steps=None,
        )
    )
    np.testing.assert_allclose(policy(obs), expected, rtol=1e-5, atol=1e-6)
