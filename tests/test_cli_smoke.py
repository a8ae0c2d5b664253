"""End-to-end CLI smoke: train.py --config <tiny yaml> on host envs.

Covers the reference's primary entry point surface (reference
examples/train_mujoco.py:118-440): config loading, collector, train loop,
eval, best-eval + periodic checkpointing, JSONL logging — in ~1-2 min on the
CPU test mesh (tiny nets, 2 envs, ~128 steps).
"""

import json
import runpy
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).parent.parent


@pytest.mark.slow
def test_cli_end_to_end(tmp_path, monkeypatch):
    cfg = tmp_path / "smoke.yaml"
    cfg.write_text(
        f"""
active_inference:
  env_name: HalfCheetah-v4
  latent_dim: 8
  hidden_dim: 32
  score_num_layers: 1
  batch_size: 16
  efe_horizon: 2
  num_efe_trajectories: 2
  num_ambiguity_samples: 2
  diffusion:
    num_diffusion_steps: 3
    beta_schedule: linear
training:
  total_timesteps: 128
  learning_starts: 32
  eval_frequency: 64
  save_frequency: 64
  log_frequency: 16
  buffer_size: 512
  gradient_steps: 1
  num_parallel_envs: 2
  num_eval_episodes: 1
  collect_diffusion_steps: 2
  use_wandb: false
  experiment_name: cli_smoke
  checkpoint_dir: {tmp_path / "ckpt"}
  log_dir: {tmp_path / "logs"}
"""
    )
    monkeypatch.setattr(
        sys, "argv",
        ["train.py", "--config", str(cfg), "--no-wandb", "--seed", "0"],
    )
    runpy.run_path(str(REPO / "train.py"), run_name="__main__")

    # JSONL log exists with finite train metrics
    log = tmp_path / "logs" / "cli_smoke.jsonl"
    assert log.exists()
    rows = [json.loads(l) for l in log.read_text().splitlines()]
    train_rows = [r for r in rows if "score_matching_loss" in r]
    assert train_rows, "no train metrics logged"
    import math

    for r in train_rows:
        for k, v in r.items():
            if isinstance(v, float):
                assert math.isfinite(v), f"non-finite {k}={v}"
    # checkpoints written (periodic latest + final)
    assert (tmp_path / "ckpt").exists()
    names = {p.name for p in (tmp_path / "ckpt").iterdir()}
    assert "latest" in names or len(names) > 0
