"""Config-precedence rules of examples/train_fused.py (review regression).

Round-2 review found --config silently training the wrong env (the env was
built from the --env default before the YAML was read) and the YAML's
training.buffer_size being clobbered by the flag default. These pin the
fixed precedence: YAML env_name/buffer_size are honored, explicit flags win.
"""

from __future__ import annotations

import argparse
import importlib.util
from pathlib import Path

ROOT = Path(__file__).parent.parent

_spec = importlib.util.spec_from_file_location(
    "train_fused_module", ROOT / "examples" / "train_fused.py"
)
train_fused = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(train_fused)


def _args(**over):
    """Namespace with the parser's defaults, overridden by kwargs."""
    defaults = dict(
        env=None, config=None, buffer_size=None, latent_dim=16, hidden_dim=64,
        score_layers=2, batch_size=128, efe_horizon=3, efe_trajectories=4,
        diffusion_steps=10, kl_weight=0.1, learning_rate=3e-4,
        lambda_n_steps=5, ground_beliefs=False, efe_value_weight=1.0,
        imagined_value_targets=False, deterministic_beliefs=False,
        pragmatic_weight=1.0, posterior_beliefs=False,
        act_from_posterior=False, entropy_scale=3e-4,
        imagine_deterministic=False, no_return_norm=False, value_ema_reg=1.0,
        auto_entropy=False, entropy_target=None, reward_pessimism=0.0,
        imagined_reward_clip=0.0, policy_lr_scale=1.0,
        policy_anchor_weight=0.0, policy_anchor_warmup=0,
        dynamics_ensemble=1, ensemble_pessimism=0.0,
        predict_continuation=False, score_target=None,
    )
    defaults.update(over)
    return argparse.Namespace(**defaults)


def _write_yaml(tmp_path):
    p = tmp_path / "cfg.yaml"
    p.write_text(
        "active_inference:\n"
        "  env_name: PointMass2D-v0\n"
        "  latent_dim: 8\n"
        "  hidden_dim: 32\n"
        "training:\n"
        "  buffer_size: 12345\n"
    )
    return str(p)


def test_yaml_env_name_honored(tmp_path):
    env, env_name, config, tcfg = train_fused.build_run_config(
        _args(config=_write_yaml(tmp_path))
    )
    assert env_name == "PointMass2D-v0"
    assert config.env_name == "PointMass2D-v0"
    assert config.observation_dim == env.observation_dim
    assert config.latent_dim == 8 and config.hidden_dim == 32
    assert tcfg.buffer_size == 12345  # YAML training section is live


def test_explicit_env_flag_wins_over_yaml(tmp_path):
    _, env_name, config, _ = train_fused.build_run_config(
        _args(config=_write_yaml(tmp_path), env="Pendulum-v1")
    )
    assert env_name == "Pendulum-v1"
    assert config.env_name == "Pendulum-v1"


def test_explicit_buffer_size_wins_over_yaml(tmp_path):
    _, _, _, tcfg = train_fused.build_run_config(
        _args(config=_write_yaml(tmp_path), buffer_size=777)
    )
    assert tcfg.buffer_size == 777


def test_flags_path_defaults():
    env, env_name, config, tcfg = train_fused.build_run_config(
        _args(latent_dim=8, hidden_dim=32)
    )
    assert env_name == "Pendulum-v1"
    assert config.latent_dim == 8 and config.hidden_dim == 32
    assert tcfg.buffer_size == 50_000


def test_anchor_warmup_flag_flows_into_config():
    _, _, config, _ = train_fused.build_run_config(
        _args(policy_anchor_weight=0.5, policy_anchor_warmup=1234)
    )
    assert config.policy_anchor_weight == 0.5
    assert config.policy_anchor_warmup_steps == 1234


# ---- train_fused_pixels.build_pixel_run_config (same precedence rules) ----

_pspec = importlib.util.spec_from_file_location(
    "train_fused_pixels_module", ROOT / "examples" / "train_fused_pixels.py"
)
train_fused_pixels = importlib.util.module_from_spec(_pspec)
_pspec.loader.exec_module(train_fused_pixels)


def _pixel_args(**over):
    defaults = dict(
        env=None, config=None, buffer_size=None, latent_dim=16, hidden_dim=64,
        batch_size=128, size=32, frame_stack=2,
    )
    defaults.update(over)
    return argparse.Namespace(**defaults)


def _write_pixel_yaml(tmp_path):
    p = tmp_path / "pix.yaml"
    p.write_text(
        "active_inference:\n"
        "  env_name: PendulumPixels-v0\n"
        "  latent_dim: 8\n"
        "  hidden_dim: 32\n"
        "  auto_entropy: false\n"
        "pixel:\n"
        "  encoder_feature_dim: 12\n"
        "training:\n"
        "  buffer_size: 2222\n"
    )
    return str(p)


def test_pixel_yaml_is_base(tmp_path):
    env, env_name, config, pix, tcfg = (
        train_fused_pixels.build_pixel_run_config(
            _pixel_args(config=_write_pixel_yaml(tmp_path))
        )
    )
    assert env_name == "PendulumPixels-v0"
    assert config.latent_dim == 8 and config.hidden_dim == 32
    assert config.auto_entropy is False
    assert config.pixel_observation is True
    assert pix.encoder_feature_dim == 12  # pixel section honored
    assert pix.frame_stack == 2  # render shape still from the CLI
    assert tcfg.buffer_size == 2222


def test_pixel_flags_path_defaults():
    env, env_name, config, pix, tcfg = (
        train_fused_pixels.build_pixel_run_config(_pixel_args(latent_dim=8))
    )
    assert env_name == "PendulumPixels-v0"
    assert config.latent_dim == 8
    assert config.auto_entropy is True  # flags-path default stack
    assert pix.encoder_feature_dim == 8  # defaults to latent_dim
    assert tcfg.buffer_size == 15_000


def test_pixel_explicit_buffer_size_wins(tmp_path):
    *_, tcfg = train_fused_pixels.build_pixel_run_config(
        _pixel_args(config=_write_pixel_yaml(tmp_path), buffer_size=333)
    )
    assert tcfg.buffer_size == 333
