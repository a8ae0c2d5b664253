"""Eval-time A/B of the EFE action-selection rule (``act_planned``).

VERDICT r4 #6: ``act_planned`` — the framework's flagship conceptual
extension (the reference computes an EFE inside ``act`` but never uses it to
pick the action, reference core/active_inference.py:501-510) — had unit
tests but zero empirical validation. This script takes a TRAINED fused
checkpoint and evaluates the same parameters two ways on the on-device env:

  A. plain deterministic policy (the shipped eval path: policy mode)
  B. argmin-EFE over ``--candidates`` candidate first actions
     (core.act_planned, plan_temperature 0)

Both arms share eval keys rep-for-rep (common random numbers), so the
reported delta is a paired comparison. Output: one JSON line per arm pair.

Usage:
  python examples/eval_planned_ab.py \
      --config examples/configs/hopper_planar_fused_utd1_explore.yaml \
      --checkpoint checkpoints/hopper_arm3/best --candidates 8 --reps 5
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


import argparse
import json
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--candidates", type=int, default=8)
    p.add_argument("--eval-envs", type=int, default=64)
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from active_inference_diffusion_tpu.agents.state_agent import DiffusionStateAgent
    from active_inference_diffusion_tpu.configs.config import load_yaml_config
    from active_inference_diffusion_tpu.envs.jax_envs import (
        fused_eval,
        make_jax_env,
        make_rollout_policy,
    )
    from active_inference_diffusion_tpu.utils.checkpoints import (
        adopt_checkpoint_semantics,
        load_checkpoint,
    )

    config, training_config, _pixel = load_yaml_config(args.config)
    env = make_jax_env(config.env_name)
    config.observation_dim = env.observation_dim
    config.action_dim = env.action_dim
    adopt_checkpoint_semantics(args.checkpoint, config)

    print(
        f"planned-eval A/B: env={config.env_name} ckpt={args.checkpoint} "
        f"candidates={args.candidates} reps={args.reps} — compiling",
        flush=True,
    )
    agent = DiffusionStateAgent(
        env.observation_dim, env.action_dim, config, training_config
    )
    state = agent.init_train_state(jax.random.PRNGKey(args.seed))
    state, meta = load_checkpoint(args.checkpoint, state)
    params = agent._acting_params(state)
    print(
        f"loaded step={meta.get('total_steps')} "
        f"train-best={meta.get('eval_return')}",
        flush=True,
    )

    plain_policy = make_rollout_policy(
        agent.core, env, deterministic=True,
        act_from_posterior=config.act_from_posterior,
        deterministic_beliefs=config.deterministic_beliefs,
    )

    def planned_policy(obs, key):
        action, _ = agent.core.act_planned(
            params, key, obs,
            num_candidates=args.candidates,
            plan_temperature=0.0,
        )
        return env.scale_action(jnp.clip(action, -1.0, 1.0))

    @jax.jit
    def eval_plain(key):
        return fused_eval(
            env, lambda o, k: plain_policy(params, o, k), key, args.eval_envs
        )

    @jax.jit
    def eval_planned(key):
        return fused_eval(env, planned_policy, key, args.eval_envs)

    results = {"plain": [], "planned": []}
    key = jax.random.PRNGKey(args.seed + 1)
    for rep in range(args.reps):
        key, sub = jax.random.split(key)
        t0 = time.time()
        r_plain = float(eval_plain(sub))  # same sub key for both arms (CRN)
        t1 = time.time()
        r_planned = float(eval_planned(sub))
        t2 = time.time()
        results["plain"].append(r_plain)
        results["planned"].append(r_planned)
        print(
            f"[rep {rep}] plain={r_plain:.1f} ({t1 - t0:.0f}s) "
            f"planned={r_planned:.1f} ({t2 - t1:.0f}s)",
            flush=True,
        )

    import statistics as st

    summary = {
        "env": config.env_name,
        "checkpoint": args.checkpoint,
        "candidates": args.candidates,
        "eval_envs": args.eval_envs,
        "reps": args.reps,
        "plain_mean": round(st.mean(results["plain"]), 2),
        "plain_std": round(st.stdev(results["plain"]), 2) if args.reps > 1 else 0.0,
        "planned_mean": round(st.mean(results["planned"]), 2),
        "planned_std": round(st.stdev(results["planned"]), 2) if args.reps > 1 else 0.0,
        "paired_deltas": [
            round(b - a, 2)
            for a, b in zip(results["plain"], results["planned"])
        ],
    }
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
