"""4096-env sharded fused-collect scaling evidence (VERDICT r4 #7).

BASELINE config #5 names a 4096-env Humanoid pipeline; the reference tops
out at 6-8 worker processes (reference configs/config.py:119,
envs/parallel_wrapper.py). Here the same scale is ONE program: envs sharded
over the mesh's dp axis via shard_map (zero collectives during rollout,
parallel/dist_train.make_sharded_fused_collect), diffusion-belief policy in
the loop.

Two modes, auto-selected by the live platform:
- CPU (forced 8-virtual-device host mesh): runs the 4096-env Humanoid3D
  collect at each --dp-sizes and records wall-clock per dp size. On this
  ONE-CORE host the virtual devices share the core, so absolute steps/s is
  meaningless and dp "speedup" is bounded by 1 — what the artifact shows is
  that the 4096-env program compiles, executes, and stays dp-sharded at
  every mesh shape (the real-scaling claim rides the per-chip TPU number
  plus the zero-collective construction).
- TPU (one real chip): dp=1 mesh, measures real env steps/s at 4096 envs —
  the per-chip throughput the multi-chip story multiplies.

Writes docs/runs/sharded_scaling_<platform>.json and prints one JSON line.

Usage:
  python benchmarks/sharded_scaling.py                    # TPU single chip
  JAX_PLATFORMS=cpu python benchmarks/sharded_scaling.py  # via force-cpu path
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


import argparse
import json
import time
from pathlib import Path


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--env", default="Humanoid3D-v0")
    p.add_argument("--envs", type=int, default=4096)
    p.add_argument("--steps", type=int, default=4, help="control steps per collect")
    p.add_argument("--collect-k", type=int, default=2, help="belief-sweep steps")
    p.add_argument("--dp-sizes", default=None,
                   help="comma list of dp sizes (CPU mesh mode), e.g. 1,2,4,8")
    p.add_argument("--force-cpu", action="store_true",
                   help="8-virtual-device CPU host mesh (sitecustomize forces "
                        "TPU, so JAX_PLATFORMS=cpu alone does not work)")
    p.add_argument("--reps", type=int, default=3)
    args = p.parse_args()

    import os

    if args.force_cpu:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8"
            ).strip()

    import jax

    if args.force_cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from active_inference_diffusion_tpu.agents.state_agent import DiffusionStateAgent
    from active_inference_diffusion_tpu.configs.config import (
        ActiveInferenceConfig,
        DiffusionConfig,
        TrainingConfig,
    )
    from active_inference_diffusion_tpu.envs.jax_envs import (
        make_jax_env,
        make_rollout_policy,
    )
    from active_inference_diffusion_tpu.parallel.dist_train import (
        make_sharded_fused_collect,
    )
    from active_inference_diffusion_tpu.parallel.mesh import make_mesh

    platform = jax.devices()[0].platform
    env = make_jax_env(args.env)
    config = ActiveInferenceConfig(
        observation_dim=env.observation_dim,
        action_dim=env.action_dim,
        latent_dim=16, hidden_dim=64, score_num_layers=2,
        diffusion=DiffusionConfig(
            num_diffusion_steps=max(args.collect_k, 2), beta_schedule="cosine"
        ),
    )
    config.tpu.donate_buffers = False
    agent = DiffusionStateAgent(
        env.observation_dim, env.action_dim, config, TrainingConfig()
    )
    params = agent.core.init_params(jax.random.PRNGKey(0))
    policy = make_rollout_policy(agent.core, env, num_steps=args.collect_k)

    n_dev = len(jax.devices())
    if args.dp_sizes:
        dp_sizes = [int(x) for x in args.dp_sizes.split(",")]
    else:
        dp_sizes = [1] if platform == "tpu" else [1, 2, 4, 8]
    dp_sizes = [d for d in dp_sizes if d <= n_dev]

    result = {
        "platform": platform,
        "env": args.env,
        "num_envs": args.envs,
        "steps_per_collect": args.steps,
        "collect_k": args.collect_k,
        "note": (
            "one-core host: virtual devices share the core, absolute rate "
            "meaningless, artifact shows 4096-env program compiles/executes "
            "dp-sharded at every mesh shape"
            if platform == "cpu"
            else "one real chip; multi-chip scaling is zero-collective "
            "(envs independent, shard_map)"
        ),
        "dp": {},
    }

    for dp in dp_sizes:
        mesh = make_mesh(shape=(dp, 1), devices=jax.devices()[:dp])
        collect = make_sharded_fused_collect(
            env, policy, mesh, num_envs=args.envs, num_steps=args.steps,
        )
        key = jax.random.PRNGKey(1 + dp)
        print(f"[dp={dp}] compiling {args.envs}-env collect...", flush=True)
        t0 = time.time()
        transitions, states = collect(params, key)
        jax.block_until_ready(transitions.rewards)
        compile_s = time.time() - t0
        assert bool(jnp.isfinite(transitions.rewards).all()), "non-finite rewards"
        spec = transitions.observations.sharding.spec
        assert dp == 1 or spec[1] == "dp", f"not dp-sharded: {spec}"

        best = float("inf")
        for r in range(args.reps):
            key, sub = jax.random.split(key)
            t0 = time.time()
            transitions, states = collect(params, sub, env_states=states)
            jax.block_until_ready(transitions.rewards)
            best = min(best, time.time() - t0)
        sps = args.envs * args.steps / best
        result["dp"][str(dp)] = {
            "compile_seconds": round(compile_s, 1),
            "best_wall_seconds": round(best, 3),
            "env_steps_per_sec": round(sps),
        }
        print(
            f"[dp={dp}] {args.envs} envs x {args.steps} steps: "
            f"{sps:,.0f} env steps/s (compile {compile_s:.0f}s)",
            flush=True,
        )

    out = Path(__file__).resolve().parent.parent / "docs" / "runs" / (
        f"sharded_scaling_{platform}.json"
    )
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(result, indent=1) + "\n")
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
