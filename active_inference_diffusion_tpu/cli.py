#!/usr/bin/env python
"""Training entry point for the TPU-native active-inference-diffusion framework.

Counterpart of the reference CLI (reference: examples/train_mujoco.py:118-473)
with the same flags plus ``--config`` (YAML) and ``--resume``, which the
reference README advertises but its entry point lacks (README.md:69-81).
"""

from __future__ import annotations

import argparse
import json
import os
import time
from pathlib import Path

import numpy as np


def build_configs(args):
    from active_inference_diffusion_tpu.configs.config import (
        ActiveInferenceConfig,
        DiffusionConfig,
        PixelObservationConfig,
        TrainingConfig,
        load_yaml_config,
    )

    if args.config:
        config, training_config, pixel_config = load_yaml_config(args.config)
        config.env_name = args.env or config.env_name
        if args.total_timesteps:
            training_config.total_timesteps = args.total_timesteps
    else:
        # Reference entry-point values (examples/train_mujoco.py:150-186)
        config = ActiveInferenceConfig(
            env_name=args.env or "HalfCheetah-v4",
            latent_dim=32,
            hidden_dim=128,
            learning_rate=5e-5,
            batch_size=64,
            efe_horizon=5,
            epistemic_weight=0.1,
            pragmatic_weight=1.0,
            consistency_weight=0.1,
            kl_weight=0.5,
            diffusion_weight=1.0,
            pixel_observation=args.pixels,
            diffusion=DiffusionConfig(
                num_diffusion_steps=25,
                beta_schedule="cosine",
                beta_start=1e-4,
                beta_end=0.02,
            ),
        )
        training_config = TrainingConfig(
            total_timesteps=args.total_timesteps or 1_000_000,
            eval_frequency=10_000,
            save_frequency=50_000,
            log_frequency=1_000,
            buffer_size=100_000 if not args.pixels else 15_000,
            learning_starts=5_000,
            gradient_steps=2,
            exploration_noise=0.1,
            exploration_decay=0.999,
            num_parallel_envs=args.num_parallel_envs,
            collect_diffusion_steps=20,
            use_wandb=not args.no_wandb,
        )
        pixel_config = PixelObservationConfig() if args.pixels else None

    if args.semantics:
        config.semantics.mode = args.semantics
    training_config.seed = args.seed
    training_config.resume = args.resume
    return config, training_config, pixel_config


def main():
    parser = argparse.ArgumentParser(
        description="Train diffusion active inference on MuJoCo (TPU-native)"
    )
    parser.add_argument(
        "--env",
        # None so a YAML --config's env_name is honored when --env is not
        # passed explicitly (resolved to HalfCheetah-v4 in build_configs).
        default=None,
        choices=[
            "HalfCheetah-v4", "Hopper-v4", "Walker2d-v4",
            "Ant-v4", "Humanoid-v4", "HumanoidStandup-v4",
            "HalfCheetah-v5", "Hopper-v5", "Walker2d-v5",
            "Ant-v5", "Humanoid-v5", "HumanoidStandup-v5",
        ],
    )
    parser.add_argument("--pixels", action="store_true", help="Use pixel observations")
    parser.add_argument(
        "--optimize-memory", action="store_true",
        help="pixel replay with per-item LZ4 compression on the native C++ "
             "codec (the reference's optimize_memory=True intent, reference "
             "agents/pixel_agent.py:213 + utils/buffers.py:33-42 — whose "
             "sample() crashes as written). Host-resident; use when the "
             "uint8 stack does not fit HBM or host RAM uncompressed.")
    parser.add_argument(
        "--total-timesteps", type=int, default=None,
        help="Default 1,000,000; a YAML --config value is NOT overridden "
        "unless this flag is passed explicitly",
    )
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--num-parallel-envs", type=int, default=8)
    parser.add_argument(
        "--env-backend", default="thread", choices=["thread", "subproc", "shmem"]
    )
    parser.add_argument("--config", default=None, help="YAML config file")
    parser.add_argument("--resume", default=None, help="Checkpoint dir or path")
    parser.add_argument("--no-wandb", action="store_true")
    parser.add_argument(
        "--semantics", default=None, choices=["corrected", "faithful"],
        help="Override semantics mode (see DEVIATIONS.md)",
    )
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from active_inference_diffusion_tpu.configs.config import config_to_dict
    from active_inference_diffusion_tpu.parallel.collect import create_collector
    from active_inference_diffusion_tpu.utils.checkpoints import (
        load_checkpoint,
        save_checkpoint,
    )
    from active_inference_diffusion_tpu.utils.logger import Logger
    from active_inference_diffusion_tpu.utils.training import (
        evaluate_agent_batched,
        plot_training_curves,
    )

    config, training_config, pixel_config = build_configs(args)
    np.random.seed(args.seed)

    # --- environments -------------------------------------------------
    if args.pixels:
        # Headless MuJoCo rendering needs an offscreen GL backend; EGL works
        # in this image (the reference hardcodes the same,
        # examples/train_mujoco.py:38).
        os.environ.setdefault("MUJOCO_GL", "egl")
        from active_inference_diffusion_tpu.envs.pixel_wrappers import make_pixel_mujoco

        def env_fn(i):
            return lambda: make_pixel_mujoco(
                config.env_name,
                width=pixel_config.image_shape[2],
                height=pixel_config.image_shape[1],
                frame_stack=pixel_config.frame_stack,
                action_repeat=2,
                seed=args.seed + i,
            )

        eval_env = env_fn(100)()
        obs_space = eval_env.observation_space
    else:
        from active_inference_diffusion_tpu.envs.wrappers import make_state_env

        def env_fn(i):
            return lambda: make_state_env(config.env_name, seed=args.seed + i)

        eval_env = env_fn(100)()
        obs_space = eval_env.observation_space

    action_dim = int(np.prod(eval_env.action_space.shape))

    if args.resume:
        # Must run BEFORE the agent is built: the jitted train step bakes in
        # the score-target convention (ADVICE r4 / DEVIATIONS row 11).
        from active_inference_diffusion_tpu.utils.checkpoints import (
            adopt_checkpoint_semantics,
        )

        adopt_checkpoint_semantics(args.resume, config)

    # --- agent ---------------------------------------------------------
    if args.pixels:
        from active_inference_diffusion_tpu.agents.pixel_agent import DiffusionPixelAgent

        agent = DiffusionPixelAgent(
            obs_shape=obs_space.shape,
            action_dim=action_dim,
            config=config,
            training_config=training_config,
            pixel_config=pixel_config,
        )
        obs_shape = obs_space.shape
        obs_dtype = np.uint8
    else:
        from active_inference_diffusion_tpu.agents.state_agent import DiffusionStateAgent

        observation_dim = int(np.prod(obs_space.shape))
        agent = DiffusionStateAgent(
            observation_dim, action_dim, config, training_config
        )
        obs_shape = (observation_dim,)
        obs_dtype = np.float32

    state = agent.init_train_state(jax.random.PRNGKey(args.seed))
    steps_collected = 0
    # Carry the best-eval bar across resumes so a worse resumed run cannot
    # clobber the saved best checkpoint. Only on --resume: a FRESH run in a
    # reused checkpoint_dir must not inherit a stale bar from an unrelated
    # previous run (it would then never write its own best).
    best_eval_reward = float("-inf")
    if args.resume:
        _best_meta = Path(training_config.checkpoint_dir) / "best" / "meta.json"
        if _best_meta.exists():
            try:
                best_eval_reward = float(
                    json.loads(_best_meta.read_text())["eval_reward"]
                )
            except (KeyError, ValueError, json.JSONDecodeError):
                pass

    # --- replay + collector -------------------------------------------
    from active_inference_diffusion_tpu.data.replay import (
        DeviceReplayBuffer,
        HostReplayBuffer,
    )

    if args.pixels and args.optimize_memory:
        from active_inference_diffusion_tpu.data.replay import (
            CompressedReplayBuffer,
        )

        replay = CompressedReplayBuffer(
            training_config.buffer_size, obs_shape, action_dim
        )
    elif args.pixels:
        # uint8 pixel storage: keep it in HBM when it fits (enables the fused
        # sample+train epoch; decode /255 happens on device in replay_sample),
        # else fall back to the host buffer.
        obs_bytes = 2 * training_config.buffer_size * int(np.prod(obs_shape))
        if obs_bytes <= 4 * 2**30:
            replay = DeviceReplayBuffer(
                training_config.buffer_size, obs_shape, action_dim,
                obs_dtype=jnp.uint8,
            )
        else:
            replay = HostReplayBuffer(
                training_config.buffer_size, obs_shape, action_dim,
                obs_dtype=np.uint8,
            )
    else:
        replay = DeviceReplayBuffer(
            training_config.buffer_size, obs_shape, action_dim
        )

    if args.resume:
        replay_template = replay.state if isinstance(replay, DeviceReplayBuffer) else None
        state, meta = load_checkpoint(args.resume, state, replay_template=replay_template)
        steps_collected = int(meta.get("total_steps", 0))
        agent.exploration_noise = float(
            meta.get("exploration_noise", agent.exploration_noise)
        )
        if meta.get("replay_state") is not None:
            replay.state = meta["replay_state"]
            print(f"Restored replay buffer ({len(replay)} transitions)")
        print(f"Resumed from {args.resume} at step {steps_collected}")

    collector = create_collector(
        env_fn,
        training_config.num_parallel_envs,
        agent,
        replay,
        backend=args.env_backend,
        seed=args.seed,
        random_until=training_config.learning_starts,
        warm_start=training_config.collect_warm_start,
    )
    collector.total_steps = steps_collected

    logger = Logger(
        use_wandb=training_config.use_wandb,
        project_name=training_config.project_name,
        experiment_name=training_config.experiment_name
        or f"{config.env_name}_{'pixels' if args.pixels else 'states'}_seed{args.seed}",
        config={
            "active_inference": config_to_dict(config),
            "training": config_to_dict(training_config),
        },
        log_dir=training_config.log_dir,
    )
    Path("plots").mkdir(exist_ok=True)

    sample_key = jax.random.PRNGKey(args.seed + 1)

    # --- main loop (reference examples/train_mujoco.py:264-394) --------
    try:
        while steps_collected < training_config.total_timesteps:
            collection_transitions = min(
                training_config.train_frequency * config.batch_size,
                training_config.total_timesteps - steps_collected,
            )
            vec_steps = max(
                1, collection_transitions // training_config.num_parallel_envs
            )

            t0 = time.time()
            stats = collector.collect(state, vec_steps)
            collect_time = time.time() - t0
            n_collected = vec_steps * training_config.num_parallel_envs
            steps_collected += n_collected

            log_data = {
                "parallel/collection_rate": n_collected / max(collect_time, 1e-9),
                "parallel/collection_time": collect_time,
                "exploration_noise": agent.exploration_noise,
                **stats,
            }
            logger.log(log_data, steps_collected)

            if (
                steps_collected > training_config.learning_starts
                and len(replay) >= config.batch_size
            ):
                t0 = time.time()
                num_updates = int(training_config.gradient_steps * n_collected)
                if isinstance(replay, DeviceReplayBuffer):
                    # Whole update block as ONE jitted lax.scan dispatch
                    # (per-update host round trips dominate on remote TPUs).
                    sample_key, sub = jax.random.split(sample_key)
                    state, mean_metrics = agent.train_epoch(
                        state, replay.state, sub, num_updates
                    )
                else:
                    # ONE device->host key readback for the whole block; the
                    # per-update sample seeds are host integers (a JAX key per
                    # update would sync through the tunnel every iteration).
                    sample_key, sub = jax.random.split(sample_key)
                    block = np.asarray(jax.random.key_data(sub))
                    seeds = np.random.SeedSequence(
                        block.astype(np.uint64).ravel().tolist()
                    ).generate_state(num_updates)
                    metrics_acc = []
                    for i in range(num_updates):
                        batch = replay.sample(int(seeds[i]), config.batch_size)
                        state, metrics = agent.train_step(state, batch)
                        metrics_acc.append(metrics)
                    mean_metrics = jax.tree_util.tree_map(
                        lambda *xs: jnp.mean(jnp.stack(xs)), *metrics_acc
                    )
                # ONE device->host transfer for the whole iteration: per-update
                # float() conversions would block on the device each time.
                avg = {k: float(v) for k, v in jax.device_get(mean_metrics).items()}
                train_time = time.time() - t0
                avg["training/time"] = train_time
                avg["training/updates_per_second"] = num_updates / max(train_time, 1e-9)
                if steps_collected % training_config.log_frequency < n_collected:
                    logger.log(avg, steps_collected)

            agent.update_exploration()

            # reconstruction visualization every 5k steps
            # (reference examples/train_mujoco.py:357-366)
            if (
                steps_collected > training_config.learning_starts
                and steps_collected % 5000 < n_collected
                and len(replay) > 4
            ):
                from active_inference_diffusion_tpu.utils.viz import (
                    visualize_reconstruction,
                )

                sample_key, sub = jax.random.split(sample_key)
                sample = replay.sample(sub, 4)
                recon_error = visualize_reconstruction(
                    agent, state, sample["observations"],
                    save_path=f"plots/reconstruction_step_{steps_collected}.png",
                )
                logger.log({"reconstruction_error": recon_error}, steps_collected)

            if steps_collected % training_config.eval_frequency < n_collected:
                eval_metrics = evaluate_agent_batched(
                    agent, state, env_fn,
                    num_episodes=training_config.num_eval_episodes,
                )
                logger.log(eval_metrics, steps_collected)
                print(
                    f"[{steps_collected}] eval reward: "
                    f"{eval_metrics['eval/episode_reward_mean']:.2f} "
                    f"± {eval_metrics['eval/episode_reward_std']:.2f}"
                )
                # Best-eval checkpoint: model-based RL policies can drift
                # after their peak (observed on Pendulum/HalfCheetah,
                # DEVIATIONS.md) — keep the best-scoring state around.
                # Resume with --resume <checkpoint_dir>/best.
                if eval_metrics["eval/episode_reward_mean"] > best_eval_reward:
                    best_eval_reward = eval_metrics["eval/episode_reward_mean"]
                    save_checkpoint(
                        training_config.checkpoint_dir, state, steps_collected,
                        exploration_noise=agent.exploration_noise,
                        config=config, training_config=training_config,
                        name="best", keep_latest_alias=False,
                        extra_meta={"eval_reward": float(best_eval_reward)},
                        # Include the replay buffer so --resume .../best does
                        # not restart with an empty buffer (the documented
                        # resume degradation, utils/checkpoints.py docstring);
                        # worth the extra write cost at eval frequency.
                        replay_state=(
                            replay.state
                            if isinstance(replay, DeviceReplayBuffer)
                            else None
                        ),
                    )
                    print(f"  new best eval -> {training_config.checkpoint_dir}/best")

            if steps_collected % training_config.save_frequency < n_collected:
                path = save_checkpoint(
                    training_config.checkpoint_dir, state, steps_collected,
                    exploration_noise=agent.exploration_noise,
                    config=config, training_config=training_config,
                    replay_state=(
                        replay.state if isinstance(replay, DeviceReplayBuffer) else None
                    ),
                )
                print(f"Saved checkpoint: {path}")

        # final evaluation while envs are still alive
        final_eval = evaluate_agent_batched(agent, state, env_fn, num_episodes=20)
        logger.log(final_eval, steps_collected)
        print(f"Final eval reward: {final_eval['eval/episode_reward_mean']:.2f}")
    finally:
        collector.vec_env.close()
        eval_env.close()

    save_checkpoint(
        training_config.checkpoint_dir, state, steps_collected,
        exploration_noise=agent.exploration_noise,
        config=config, training_config=training_config,
        replay_state=(
            replay.state if isinstance(replay, DeviceReplayBuffer) else None
        ),
    )
    plot_training_curves(
        str(logger.log_file), save_path=f"plots/{config.env_name}_training.png"
    )
    logger.finish()


if __name__ == "__main__":
    main()
