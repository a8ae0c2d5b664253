"""Export a trained checkpoint's acting path as a deployable policy artifact.

The artifact (``utils/serving.py``) is one serialized StableHLO program with
the trained parameters baked in — the serving fleet needs only ``jax``, not
this repo. The reference framework has no deployment path at all (its
checkpoints require the full model-building stack to act).

Usage::

    python examples/export_policy.py \
        --config examples/configs/halfcheetah_planar_fused.yaml \
        --checkpoint checkpoints/best --out policy.aidpol

    python examples/export_policy.py --env Pendulum-v0 \
        --checkpoint checkpoints/pendulum/latest --out pendulum.aidpol \
        --num-steps 5 --platforms tpu,cpu

After export the script reloads the artifact and round-trips one batch as a
self-check, printing the header JSON and serve latency.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def env_dims(env_name: str):
    """(obs_dim, act_dim) for a fused JAX env name or a Gymnasium id."""
    try:
        from active_inference_diffusion_tpu.envs.jax_envs import make_jax_env

        env = make_jax_env(env_name)
        return env.observation_dim, env.action_dim
    except (KeyError, ValueError):
        import gymnasium as gym

        env = gym.make(env_name)
        obs_dim = int(np.prod(env.observation_space.shape))
        act_dim = int(np.prod(env.action_space.shape))
        env.close()
        return obs_dim, act_dim


def main():
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--config", help="YAML config the agent was trained with")
    p.add_argument("--env", help="env name (overrides the config's env_name)")
    p.add_argument("--checkpoint", required=True,
                   help="checkpoint dir (or its parent with latest/best)")
    p.add_argument("--out", required=True, help="output .aidpol path")
    p.add_argument("--stochastic", action="store_true",
                   help="export the collect-mode (seed-driven) stochastic path")
    p.add_argument("--num-steps", type=int, default=None,
                   help="belief-sweep length (default: full eval sweep)")
    p.add_argument("--batch-size", type=int, default=None,
                   help="fix the batch axis (default: shape-polymorphic)")
    p.add_argument("--platforms", default=None,
                   help="comma-separated lowering platforms, e.g. tpu,cpu")
    args = p.parse_args()

    import jax

    from active_inference_diffusion_tpu.agents.state_agent import DiffusionStateAgent
    from active_inference_diffusion_tpu.configs.config import (
        ActiveInferenceConfig, TrainingConfig, load_yaml_config)
    from active_inference_diffusion_tpu.utils.checkpoints import load_checkpoint
    from active_inference_diffusion_tpu.utils.serving import load_policy, save_policy

    if args.config:
        config, training_config, _ = load_yaml_config(args.config)
    else:
        config, training_config = ActiveInferenceConfig(), TrainingConfig()
    env_name = args.env or config.env_name
    config.env_name = env_name
    obs_dim, act_dim = env_dims(env_name)
    config.observation_dim, config.action_dim = obs_dim, act_dim

    agent = DiffusionStateAgent(obs_dim, act_dim, config, training_config)
    template = agent.init_train_state(jax.random.PRNGKey(0))
    state, meta = load_checkpoint(args.checkpoint, template)
    print(f"loaded checkpoint: {json.dumps({k: v for k, v in meta.items() if not hasattr(v, 'shape')}, default=str)}")

    header = save_policy(
        args.out, agent, state,
        deterministic=not args.stochastic,
        num_steps=args.num_steps,
        batch_size=args.batch_size,
        platforms=tuple(args.platforms.split(",")) if args.platforms else None,
        meta={"checkpoint": args.checkpoint},
    )
    print(json.dumps(header, indent=2, sort_keys=True))

    policy = load_policy(args.out)
    obs = np.zeros((args.batch_size or 4, obs_dim), np.float32)
    policy(obs)  # compile
    t0 = time.perf_counter()
    actions = policy(obs, seed=1)
    dt = (time.perf_counter() - t0) * 1e3
    print(f"self-check OK: {obs.shape[0]} obs -> {actions.shape} actions "
          f"in {dt:.2f} ms (|a|max={np.abs(actions).max():.3f})")


if __name__ == "__main__":
    main()
