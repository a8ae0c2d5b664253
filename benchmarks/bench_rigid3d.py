"""Throughput of the from-scratch 3D physics engine on the chip.

Measures fused on-device collection rate (env steps/s) for the
`envs/rigid3d.py` engine — Ant-v4 and the humanoid family that the
constraint-based joint-limit solver (`limit_projection`) unlocked — plus
the planar engine for comparison. Random actions isolate engine cost
(agent-in-the-loop rates come from `examples/train_fused.py` logs).

The reference's MuJoCo throughput ceiling on this host is ~8 env-steps/s
per env process (host `gym.make` stepping; reference
`examples/train_mujoco.py:212` collector); these rows are the on-device
replacement's numbers.

Usage: python benchmarks/bench_rigid3d.py [--num-envs 1024] [--steps 64]
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp

from active_inference_diffusion_tpu.envs.jax_envs import (
    fused_collect,
    make_jax_env,
)

ENVS = ("Ant3D-v0", "Humanoid3D-v0", "HumanoidStandup3D-v0",
        "HopperPlanar-v0", "Ant3DPixels-v0")


def bench_env(name: str, num_envs: int, steps: int, chunk_steps: int) -> dict:
    env = make_jax_env(name)
    if hasattr(env, "obs_shape"):
        # pixel rows: (T, N, 9, 84, 84) uint8 obs+next_obs at 1024x64 is
        # ~8 GB — cap the materialized rollout
        num_envs, steps = min(num_envs, 256), min(steps, 32)
    # Keep each device dispatch well under the axon ~1-2 min kill bound
    # (CLAUDE.md): the rollout is chunked, env states carried across
    # dispatches, timing summed over chunks.
    chunk_steps = min(chunk_steps, steps)
    num_chunks = steps // chunk_steps
    steps = num_chunks * chunk_steps

    def random_policy(obs, key):
        return jax.random.uniform(
            key, (obs.shape[0], env.action_dim), minval=-1.0, maxval=1.0
        )

    run_first = jax.jit(
        lambda k: fused_collect(env, random_policy, k, num_envs, chunk_steps)
    )
    run_cont = jax.jit(
        lambda k, st: fused_collect(
            env, random_policy, k, num_envs, chunk_steps, env_states=st
        )
    )

    def rollout(seed: int):
        keys = jax.random.split(jax.random.PRNGKey(seed), num_chunks)
        transitions, states = run_first(keys[0])
        jax.block_until_ready(transitions.rewards)
        for c in range(1, num_chunks):
            transitions, states = run_cont(keys[c], states)
            jax.block_until_ready(transitions.rewards)
        return transitions

    t0 = time.time()
    transitions = rollout(0)
    compile_s = time.time() - t0
    assert bool(jnp.isfinite(transitions.rewards).all()), f"{name}: NaN rewards"

    best = float("inf")
    for i in range(3):
        t0 = time.time()
        transitions = rollout(i + 1)
        jax.block_until_ready(transitions.rewards)
        best = min(best, time.time() - t0)
    total = num_envs * steps
    return {
        "env": name,
        "num_envs": num_envs,
        "steps": steps,
        "chunk_steps": chunk_steps,
        "compile_seconds": round(compile_s, 1),
        "env_steps_per_sec": round(total / best, 1),
        "obs": (list(env.obs_shape) if hasattr(env, "obs_shape")
                else [env.observation_dim]),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--num-envs", type=int, default=1024)
    p.add_argument("--steps", type=int, default=64)
    p.add_argument("--chunk-steps", type=int, default=16,
                   help="rollout steps per device dispatch (axon kill bound)")
    p.add_argument("--envs", nargs="*", default=list(ENVS))
    args = p.parse_args()

    print(f"devices: {jax.devices()}")
    for name in args.envs:
        row = bench_env(name, args.num_envs, args.steps, args.chunk_steps)
        print(json.dumps(row))


if __name__ == "__main__":
    main()
