"""Score-target-convention persistence + reconciliation on resume (ADVICE r4).

The round-4 default flip (b01ac4b) changed the corrected-mode score target
from -eps/variance to -eps/std; a pre-flip checkpoint resumed under an
unpinned config would silently switch objectives mid-run. save_checkpoint
now records the RESOLVED convention and adopt_checkpoint_semantics
reconciles it before the agent is built.
"""

import json

import jax
import jax.numpy as jnp
import pytest

from active_inference_diffusion_tpu.agents.state_agent import DiffusionStateAgent
from active_inference_diffusion_tpu.configs.config import (
    ActiveInferenceConfig,
    DiffusionConfig,
    TrainingConfig,
)
from active_inference_diffusion_tpu.utils.checkpoints import (
    adopt_checkpoint_semantics,
    load_checkpoint,
    save_checkpoint,
)


def tiny_agent(convention=None):
    cfg = ActiveInferenceConfig(
        observation_dim=4, action_dim=2, latent_dim=4, hidden_dim=16,
        score_num_layers=1, batch_size=4,
        diffusion=DiffusionConfig(num_diffusion_steps=2, beta_schedule="linear"),
    )
    cfg.tpu.donate_buffers = False
    cfg.semantics.score_target_convention = convention
    return DiffusionStateAgent(4, 2, cfg, TrainingConfig(buffer_size=16)), cfg


def test_resolved_convention_persisted(tmp_path):
    agent, cfg = tiny_agent("reference")
    state = agent.init_train_state(jax.random.PRNGKey(0))
    path = save_checkpoint(str(tmp_path), state, step=7, config=cfg, name="best")
    meta = json.loads((tmp_path / "best" / "meta.json").read_text())
    assert meta["score_target_convention_resolved"] == "reference"

    # Default (None) resolves to the current default ("standard").
    agent2, cfg2 = tiny_agent(None)
    state2 = agent2.init_train_state(jax.random.PRNGKey(1))
    save_checkpoint(str(tmp_path / "b"), state2, step=1, config=cfg2, name="best")
    meta2 = json.loads((tmp_path / "b" / "best" / "meta.json").read_text())
    assert meta2["score_target_convention_resolved"] == "standard"


def test_adopt_unpinned_config_takes_checkpoint_convention(tmp_path):
    agent, cfg = tiny_agent("reference")
    state = agent.init_train_state(jax.random.PRNGKey(0))
    save_checkpoint(str(tmp_path), state, step=7, config=cfg, name="best")

    _, fresh_cfg = tiny_agent(None)  # unpinned: default would be standard
    adopt_checkpoint_semantics(str(tmp_path / "best"), fresh_cfg)
    assert fresh_cfg.semantics.score_target_convention == "reference"
    assert not fresh_cfg.semantics.score_target_uses_std


def test_adopt_explicit_pin_wins_with_warning(tmp_path):
    agent, cfg = tiny_agent("reference")
    state = agent.init_train_state(jax.random.PRNGKey(0))
    save_checkpoint(str(tmp_path), state, step=7, config=cfg, name="best")

    _, pinned = tiny_agent("standard")
    with pytest.warns(UserWarning, match="score target scale will CHANGE"):
        adopt_checkpoint_semantics(str(tmp_path / "best"), pinned)
    assert pinned.semantics.score_target_convention == "standard"


def test_adopt_legacy_meta_warns_and_keeps_current(tmp_path):
    agent, cfg = tiny_agent("reference")
    state = agent.init_train_state(jax.random.PRNGKey(0))
    save_checkpoint(str(tmp_path), state, step=7, config=cfg, name="best")
    # Simulate a pre-persistence checkpoint: strip the resolved key and the
    # raw pin from meta.json.
    mf = tmp_path / "best" / "meta.json"
    meta = json.loads(mf.read_text())
    meta.pop("score_target_convention_resolved")
    meta["config"]["semantics"]["score_target_convention"] = None
    mf.write_text(json.dumps(meta))

    _, fresh_cfg = tiny_agent(None)
    with pytest.warns(UserWarning, match="predates score-target-convention"):
        adopt_checkpoint_semantics(str(tmp_path / "best"), fresh_cfg)
    assert fresh_cfg.semantics.score_target_convention is None


def test_roundtrip_restores_state(tmp_path):
    agent, cfg = tiny_agent("reference")
    state = agent.init_train_state(jax.random.PRNGKey(0))
    save_checkpoint(str(tmp_path), state, step=7, config=cfg, name="best")
    template = agent.init_train_state(jax.random.PRNGKey(9))
    restored, meta = load_checkpoint(str(tmp_path / "best"), template)
    for a, b in zip(
        jax.tree_util.tree_leaves(state.params),
        jax.tree_util.tree_leaves(restored.params),
    ):
        assert jnp.allclose(a, b)
    assert meta["total_steps"] == 7
