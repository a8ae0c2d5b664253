#!/usr/bin/env python
"""Multi-chip data/tensor-parallel training demo.

End-to-end on a (dp, tp) mesh: env rollout sharded over dp
(``make_sharded_fused_collect`` — each device rolls its own fused Pendulum
instances, zero collectives), transitions consumed by the full 5-optimizer
GSPMD train step (gradient all-reduces over ICI) without leaving the device
or resharding. On a real TPU slice the same code scales across chips; here
it demonstrates on 8 virtual CPU devices so it is runnable anywhere:

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
    from active_inference_diffusion_tpu.envs.jax_envs import (
        Pendulum,
        make_rollout_policy,
    )
    from active_inference_diffusion_tpu.parallel.dist_train import (
        make_dp_train_step,
        make_sharded_fused_collect,
    )
    from active_inference_diffusion_tpu.parallel.mesh import make_mesh

    devices = jax.devices()[:n_devices]
    assert len(devices) == n_devices, f"need {n_devices} devices, have {len(devices)}"
    mesh = make_mesh(shape=(args.dp, args.tp), devices=devices)
    print(f"mesh: {dict(mesh.shape)} on {devices[0].platform}")

    env = Pendulum()
    # dp-sharded fused rollout: num_envs spread over the dp axis. The train
    # batch is exactly one collect's transitions (num_envs * steps), so round
    # the requested batch size to that grid and say so — silently training on
    # a different batch than --batch-size would misreport the experiment.
    num_envs = args.dp * 4
    steps_per_collect = max(args.batch_size // num_envs, 1)
    actual_batch = num_envs * steps_per_collect
    if actual_batch != args.batch_size:
        print(
            f"note: --batch-size {args.batch_size} rounded to {actual_batch} "
            f"(= {num_envs} envs x {steps_per_collect} steps per collect)"
        )
    config = ActiveInferenceConfig(
        observation_dim=env.observation_dim, action_dim=env.action_dim,
        latent_dim=16, hidden_dim=64,
        score_num_layers=2, batch_size=actual_batch,
        efe_horizon=3, num_efe_trajectories=4,
        diffusion=DiffusionConfig(num_diffusion_steps=8, beta_schedule="cosine"),
    )
    config.tpu.donate_buffers = False
    agent = DiffusionStateAgent(
        env.observation_dim, env.action_dim, config, TrainingConfig(buffer_size=1024)
    )
    state = agent.init_train_state(jax.random.PRNGKey(0))

    train_step, place_state, place_batch = make_dp_train_step(
        agent, mesh, tp_size=args.tp, donate=False
    )
    state = place_state(state)

    policy_fn = make_rollout_policy(agent.core, env)

    collect = make_sharded_fused_collect(
        env, policy_fn, mesh, num_envs, steps_per_collect
    )

    def to_batch(transitions):
        # (T, N@dp, ...) -> (N@dp * T, ...): swap first so the dp-contiguous
        # env blocks survive the flatten and the batch stays dp-sharded.
        def flat(x):
            return x.swapaxes(0, 1).reshape((-1,) + x.shape[2:])

        return {
            "observations": flat(transitions.observations),
            "actions": flat(transitions.actions),
            "rewards": flat(transitions.rewards),
            "next_observations": flat(transitions.next_observations),
            "dones": flat(transitions.terminateds),
        }

    key = jax.random.PRNGKey(1)
    env_states = None
    for step in range(args.steps):
        key, ck = jax.random.split(key)
        t0 = time.perf_counter()
        transitions, env_states = collect(state.params, ck, env_states)
        batch = place_batch(to_batch(transitions))
        state, metrics = train_step(state, batch)
        jax.block_until_ready(state.params)
        print(
            f"[step {step}] policy_loss={float(metrics['policy_loss']):+.4f} "
            f"score_loss={float(metrics['score_matching_loss']):.2f} "
            f"mean_reward={float(jnp.mean(transitions.rewards)):+.2f} "
            f"({1e3 * (time.perf_counter() - t0):.0f} ms collect+train, "
            f"{num_envs} envs over dp={args.dp})"
        )
    print("done")


if __name__ == "__main__":
    main()
