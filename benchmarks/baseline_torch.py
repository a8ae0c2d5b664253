#!/usr/bin/env python
"""Measure the PyTorch reference's denoising-sweep throughput as the baseline
denominator for bench.py.

The reference publishes no benchmark numbers (BASELINE.md), so the baseline is
self-measured: we import the reference package from /root/reference (read-only)
and time its reverse-diffusion belief generation — the hot loop of both its
collection and training paths (reference: core/diffusion.py:176-206,
utils/async_collector.py:530-595) — on the hardware available to torch here
(CPU; the reference's CUDA path needs a GPU this host lacks).

Writes benchmarks/baseline_results.json. Run once; bench.py reads the cache.
"""

import json
import sys
import time
from pathlib import Path

REFERENCE_PATH = "/root/reference"
RESULTS_FILE = Path(__file__).parent / "baseline_results.json"

# Flagship config (reference examples/train_mujoco.py:150-186)
BATCH = 256
LATENT_DIM = 32
HIDDEN_DIM = 128
NUM_STEPS = 25


def _stub_missing_modules():
    """The reference package imports lz4 and wandb at package-import time;
    neither is needed for the denoise sweep. Stub them if absent."""
    import types

    for name in ["lz4", "lz4.frame", "wandb"]:
        if name not in sys.modules:
            try:
                __import__(name)
            except ImportError:
                mod = types.ModuleType(name)
                if name == "wandb":
                    mod.init = lambda *a, **k: None
                    mod.log = lambda *a, **k: None
                    mod.Settings = lambda *a, **k: None
                sys.modules[name] = mod


def measure(num_sweeps: int = 5, warmup: int = 1) -> dict:
    sys.path.insert(0, REFERENCE_PATH)
    _stub_missing_modules()
    import torch

    from active_inference_diffusion.configs.config import DiffusionConfig
    from active_inference_diffusion.core.diffusion import LatentDiffusionProcess
    from active_inference_diffusion.models.score_networks import LatentScoreNetwork

    torch.manual_seed(0)
    device = torch.device("cuda" if torch.cuda.is_available() else "cpu")

    config = DiffusionConfig(num_diffusion_steps=NUM_STEPS, beta_schedule="cosine")
    diffusion = LatentDiffusionProcess(config, latent_dim=LATENT_DIM).to(device)
    # The reference constructs the score net with observation_dim=latent_dim
    # (core/active_inference.py:75-80).
    score_net = LatentScoreNetwork(
        latent_dim=LATENT_DIM,
        observation_dim=LATENT_DIM,
        hidden_dim=HIDDEN_DIM,
        use_attention=True,
    ).to(device)
    score_net.eval()

    obs = torch.randn(BATCH, LATENT_DIM, device=device)

    def sweep():
        with torch.no_grad():
            traj = diffusion.generate_latent_trajectory(
                score_net, batch_size=BATCH, observation=obs
            )
        if device.type == "cuda":
            torch.cuda.synchronize()
        return traj[-1]

    for _ in range(warmup):
        sweep()
    t0 = time.perf_counter()
    for _ in range(num_sweeps):
        sweep()
    elapsed = time.perf_counter() - t0

    sweeps_per_sec = num_sweeps / elapsed
    return {
        "framework": "torch-reference",
        "device": str(device),
        "batch": BATCH,
        "latent_dim": LATENT_DIM,
        "hidden_dim": HIDDEN_DIM,
        "num_diffusion_steps": NUM_STEPS,
        "sweeps_per_sec": sweeps_per_sec,
        "denoiser_steps_per_sec": sweeps_per_sec * NUM_STEPS,
        "latents_per_sec": sweeps_per_sec * BATCH,
        "measured_at": time.time(),
    }


def main():
    results = measure()
    RESULTS_FILE.write_text(json.dumps(results, indent=2))
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
