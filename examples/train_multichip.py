#!/usr/bin/env python
"""Multi-chip data/tensor-parallel training demo.

Runs the full 5-optimizer train step GSPMD-sharded over a (dp, tp) mesh.
On a real TPU slice the same code scales across chips over ICI; here it
demonstrates on 8 virtual CPU devices so it is runnable anywhere:

    python examples/train_multichip.py --dp 4 --tp 2 --steps 5

(The virtual-device setup mirrors tests/conftest.py; on a pod slice drop the
CPU forcing and build the mesh from jax.devices().)
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dp", type=int, default=4)
    parser.add_argument("--tp", type=int, default=2)
    parser.add_argument("--steps", type=int, default=5)
    parser.add_argument("--batch-size", type=int, default=64)
    parser.add_argument("--virtual-cpu", action="store_true", default=True,
                        help="force an n-device virtual CPU platform")
    args = parser.parse_args()

    n_devices = args.dp * args.tp
    if args.virtual_cpu:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={n_devices}"
            ).strip()

    import jax

    if args.virtual_cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from active_inference_diffusion_tpu.agents.state_agent import DiffusionStateAgent
    from active_inference_diffusion_tpu.configs.config import (
        ActiveInferenceConfig,
        DiffusionConfig,
        TrainingConfig,
    )
    from active_inference_diffusion_tpu.parallel.dist_train import make_dp_train_step
    from active_inference_diffusion_tpu.parallel.mesh import make_mesh

    devices = jax.devices()[:n_devices]
    assert len(devices) == n_devices, f"need {n_devices} devices, have {len(devices)}"
    mesh = make_mesh(shape=(args.dp, args.tp), devices=devices)
    print(f"mesh: {dict(mesh.shape)} on {devices[0].platform}")

    config = ActiveInferenceConfig(
        observation_dim=17, action_dim=6, latent_dim=16, hidden_dim=64,
        score_num_layers=2, batch_size=args.batch_size,
        efe_horizon=3, num_efe_trajectories=4,
        diffusion=DiffusionConfig(num_diffusion_steps=8, beta_schedule="cosine"),
    )
    config.tpu.donate_buffers = False
    agent = DiffusionStateAgent(17, 6, config, TrainingConfig(buffer_size=1024))
    state = agent.init_train_state(jax.random.PRNGKey(0))

    train_step, place_state, place_batch = make_dp_train_step(
        agent, mesh, tp_size=args.tp, donate=False
    )
    state = place_state(state)

    key = jax.random.PRNGKey(1)
    for step in range(args.steps):
        key, *ks = jax.random.split(key, 6)
        batch = place_batch({
            "observations": jax.random.normal(ks[0], (args.batch_size, 17)),
            "actions": jax.random.normal(ks[1], (args.batch_size, 6)),
            "rewards": jax.random.normal(ks[2], (args.batch_size,)),
            "next_observations": jax.random.normal(ks[3], (args.batch_size, 17)),
            "dones": jax.random.bernoulli(ks[4], 0.1, (args.batch_size,)),
        })
        t0 = time.perf_counter()
        state, metrics = train_step(state, batch)
        jax.block_until_ready(state.params)
        print(
            f"[step {step}] policy_loss={float(metrics['policy_loss']):+.4f} "
            f"score_loss={float(metrics['score_matching_loss']):.2f} "
            f"({1e3 * (time.perf_counter() - t0):.0f} ms)"
        )
    print("done")


if __name__ == "__main__":
    main()
