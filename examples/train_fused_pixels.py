"""Fully fused on-device PIXEL training: rasterized env + conv encoder +
diffusion beliefs + policy, all inside jitted programs.

The reference's pixel pipeline is bottlenecked by host MuJoCo rendering
(~8-17 env-steps/s for 6 envs here; reference envs/pixel_wrappers.py renders
per step on CPU workers). With the observation rasterized on device
(envs/pixel_render.PendulumPixels), collection is a single scan program —
pixel env steps at device rate, not render rate.

Usage:
  python examples/train_fused_pixels.py --num-envs 32 --iterations 40
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))
import time


def build_pixel_run_config(args):
    """Assemble (env, env_name, config, pixel_config, training_config) from
    parsed args. Precedence mirrors train_fused.build_run_config (tested in
    tests/test_train_fused_config.py): with --config the YAML is the base —
    an explicit --env wins over its env_name, model/stack flags are ignored;
    without it the flags build the config. --buffer-size applies in both
    modes only when explicitly passed."""
    from active_inference_diffusion_tpu.configs.config import (
        ActiveInferenceConfig,
        DiffusionConfig,
        PixelObservationConfig,
        TrainingConfig,
        load_yaml_config,
    )
    from active_inference_diffusion_tpu.envs.pixel_render import (
        PendulumPixels,
        ReacherPixels,
        make_planar_pixels,
        make_rigid3d_pixels,
    )

    if args.config:
        config, training_config, yaml_pixel = load_yaml_config(args.config)
        env_name = args.env or config.env_name or "PendulumPixels-v0"
        config.pixel_observation = True
    else:
        env_name = args.env or "PendulumPixels-v0"
        yaml_pixel = None
        config = ActiveInferenceConfig(
            latent_dim=args.latent_dim,
            hidden_dim=args.hidden_dim,
            score_num_layers=2,
            batch_size=args.batch_size,
            efe_horizon=3,
            num_efe_trajectories=4,
            pixel_observation=True,
            posterior_beliefs=True,
            act_from_posterior=True,
            imagined_value_targets=True,
            imagine_deterministic=True,
            auto_entropy=True,
            diffusion=DiffusionConfig(num_diffusion_steps=10, beta_schedule="cosine"),
        )
        training_config = TrainingConfig(
            buffer_size=args.buffer_size or 15_000, collect_diffusion_steps=5
        )

    if env_name.endswith("PlanarPixels-v0"):
        env = make_planar_pixels(
            env_name.replace("PlanarPixels-v0", "-v4"),
            size=args.size, frame_stack=args.frame_stack,
        )
    elif env_name.endswith("3DPixels-v0"):
        env = make_rigid3d_pixels(
            env_name.replace("3DPixels-v0", "-v4"),
            size=args.size, frame_stack=args.frame_stack,
        )
    else:
        env_cls = (
            PendulumPixels if env_name == "PendulumPixels-v0" else ReacherPixels
        )
        env = env_cls(size=args.size, frame_stack=args.frame_stack)
    config.action_dim = env.action_dim
    config.env_name = env_name
    pixel_config = PixelObservationConfig(
        image_shape=(3, env.size, env.size),
        frame_stack=env.frame_stack,
        encoder_feature_dim=(
            yaml_pixel.encoder_feature_dim if yaml_pixel is not None
            else config.latent_dim
        ),
    )
    if args.config and args.buffer_size is not None:
        training_config.buffer_size = args.buffer_size
    return env, env_name, config, pixel_config, training_config


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--env", default=None,
        help="defaults to the YAML's env_name with --config, else "
             "PendulumPixels-v0",
        choices=["PendulumPixels-v0", "ReacherPixels-v0",
                 # on-device rendered planar MuJoCo tasks (envs/planar.py
                 # physics + envs/pixel_render.make_planar_pixels raster)
                 "HopperPlanarPixels-v0", "Walker2dPlanarPixels-v0",
                 "HalfCheetahPlanarPixels-v0",
                 # on-device rendered 3D tasks (envs/rigid3d.py physics +
                 # perspective tracking camera)
                 "Ant3DPixels-v0", "Humanoid3DPixels-v0"],
    )
    parser.add_argument("--num-envs", type=int, default=32)
    parser.add_argument("--steps-per-iter", type=int, default=16)
    parser.add_argument("--updates-per-iter", type=int, default=32)
    parser.add_argument("--iterations", type=int, default=40)
    parser.add_argument("--buffer-size", type=int, default=None,
                        help="replay capacity (default: the YAML's "
                             "training.buffer_size with --config, else 15k)")
    parser.add_argument("--eval-envs", type=int, default=16)
    parser.add_argument("--eval-every", type=int, default=10)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--latent-dim", type=int, default=16)
    parser.add_argument("--hidden-dim", type=int, default=64)
    parser.add_argument("--learning-starts", type=int, default=1_000)
    parser.add_argument("--size", type=int, default=84, help="render resolution")
    parser.add_argument("--frame-stack", type=int, default=3)
    parser.add_argument("--batch-size", type=int, default=128)
    parser.add_argument("--checkpoint-dir", default=None,
                        help="save an Orbax 'best' checkpoint whenever "
                             "fused_eval improves (requires --eval-every)")
    parser.add_argument("--resume", default=None,
                        help="Orbax checkpoint (dir, or dir/best) to restore "
                             "the train state from; best_eval and the step "
                             "counter continue from the checkpoint meta. A "
                             "replay saved with --save-replay is restored "
                             "too; otherwise the buffer refills for "
                             "--resume-refill-steps env steps (no updates) "
                             "with the resumed policy before training.")
    parser.add_argument("--save-replay", action="store_true",
                        help="checkpoint the replay buffer alongside the "
                             "train state in 'best' saves. NOTE: a pixel "
                             "replay is large (30k cap at 84x84 stack-3 "
                             "uint8 is ~3.8 GB) — each improved-eval save "
                             "pays that device->disk transfer.")
    parser.add_argument("--resume-refill-steps", type=int, default=8192,
                        help="on --resume without a saved replay, collect "
                             "this many env steps (no updates) before "
                             "training so the first updates do not overfit "
                             "a near-empty buffer (round-3 Standup3D resume "
                             "forensics, DEVIATIONS.md)")
    parser.add_argument("--config", default=None,
                        help="YAML config (same schema as train.py / "
                             "train_fused.py). When given it is the base for "
                             "the agent config — the model/stack flags above "
                             "(--latent-dim/--hidden-dim/--batch-size) are "
                             "IGNORED; loop-shape flags (--num-envs/"
                             "--steps-per-iter/--updates-per-iter/"
                             "--iterations/--eval-*/--buffer-size/--size/"
                             "--frame-stack) still apply. An explicit --env "
                             "wins over the YAML's env_name.")
    args = parser.parse_args()
    if args.checkpoint_dir and not args.eval_every:
        parser.error("--checkpoint-dir requires --eval-every (best-eval saves)")
    best_eval = float("-inf")

    import jax
    import jax.numpy as jnp

    from active_inference_diffusion_tpu.agents.pixel_agent import DiffusionPixelAgent
    from active_inference_diffusion_tpu.data.replay import DeviceReplayBuffer
    from active_inference_diffusion_tpu.envs.jax_envs import (
        flatten_transitions,
        fused_collect,
        fused_eval,
        make_rollout_policy,
    )
    from active_inference_diffusion_tpu.utils.logger import Logger

    env, env_name, config, pixel_config, training_config = (
        build_pixel_run_config(args)
    )
    if args.resume:
        # Must run BEFORE the agent is built: the jitted train step bakes in
        # the score-target convention (ADVICE r4 / DEVIATIONS row 11).
        from active_inference_diffusion_tpu.utils.checkpoints import (
            adopt_checkpoint_semantics,
        )

        adopt_checkpoint_semantics(args.resume, config)
    print(
        f"fused pixel training: env={env_name} size={env.size} "
        f"stack={env.frame_stack} latent={config.latent_dim} "
        f"hidden={config.hidden_dim} feature="
        f"{pixel_config.encoder_feature_dim} — first iteration compiles "
        "the fused programs (minutes through a remote chip)",
        flush=True,
    )
    agent = DiffusionPixelAgent(
        obs_shape=env.obs_shape, action_dim=env.action_dim,
        config=config, training_config=training_config,
        pixel_config=pixel_config,
    )
    state = agent.init_train_state(jax.random.PRNGKey(args.seed))
    replay = DeviceReplayBuffer(
        training_config.buffer_size, env.obs_shape, env.action_dim,
        obs_dtype=jnp.uint8,
    )
    resume_meta = {}
    restored_replay = False
    if args.resume:
        from active_inference_diffusion_tpu.utils.checkpoints import load_checkpoint

        state, resume_meta = load_checkpoint(
            args.resume, state, replay_template=replay.state
        )
        saved_replay = resume_meta.pop("replay_state", None)
        if saved_replay is not None:
            replay.state = saved_replay
            restored_replay = True
        _prev_eval = resume_meta.get("eval_return")
        if _prev_eval is not None:
            best_eval = float(_prev_eval)
        print(
            f"resumed from {args.resume}: total_steps="
            f"{resume_meta.get('total_steps')} eval_return={_prev_eval} "
            f"replay="
            f"{'restored (size %d)' % int(replay.state.size) if restored_replay else 'fresh'}"
        )


    def encode(params, obs, key):
        return agent._apply_encoder(params, obs, key, augment=False, train=False)

    rollout_policy = make_rollout_policy(
        agent.core, env, encode_fn=encode,
        act_from_posterior=config.act_from_posterior,
        deterministic_beliefs=config.deterministic_beliefs,
    )
    eval_rollout = make_rollout_policy(
        agent.core, env, encode_fn=encode, deterministic=True,
        act_from_posterior=config.act_from_posterior,
    )

    def policy_fn_builder(params):
        return lambda obs, key: rollout_policy(params, obs, key)

    # Same exploration-noise support as train_fused.py (host eps schedule;
    # see jax_envs.with_exploration_noise): honored when the YAML sets
    # ``training: exploration_noise`` > 0, exact no-op otherwise.
    explore_enabled = training_config.exploration_noise > 0.0

    def exploration_eps(steps: int) -> float:
        tc = training_config
        if not explore_enabled:
            return 0.0
        unit = max(1, tc.num_parallel_envs)
        return max(
            tc.min_exploration,
            tc.exploration_noise * tc.exploration_decay ** (steps / unit),
        )

    @jax.jit
    def collect_and_store(params, replay_state, env_states, key, explore_eps):
        pol = policy_fn_builder(params)
        if explore_enabled:
            from active_inference_diffusion_tpu.envs.jax_envs import (
                with_exploration_noise,
            )
            pol = with_exploration_noise(pol, env, explore_eps)
        transitions, env_states = fused_collect(
            env, pol, key,
            args.num_envs, args.steps_per_iter, env_states=env_states,
        )
        flat = flatten_transitions(transitions)
        from active_inference_diffusion_tpu.data.replay import replay_add_batch

        replay_state = replay_add_batch(
            replay_state, flat.observations, flat.actions, flat.rewards,
            flat.next_observations, flat.terminateds,
        )
        return replay_state, env_states, jnp.mean(flat.rewards)

    @jax.jit
    def eval_return(params, key):
        return fused_eval(
            env, lambda obs, k: eval_rollout(params, obs, k), key,
            args.eval_envs,
        )

    logger = Logger(
        use_wandb=False, experiment_name=f"fused_pixels_{env_name.split('-')[0]}"
    )
    key = jax.random.PRNGKey(args.seed + 1)
    env_states = None
    total_steps = int(resume_meta.get("total_steps", 0))

    if args.resume and not restored_replay and args.resume_refill_steps:
        # Same rationale as train_fused.py: refill with the RESUMED policy
        # (no updates) so the first updates after resume train on-distribution
        # instead of overfitting a near-empty buffer.
        target = min(args.resume_refill_steps, training_config.buffer_size)
        print(f"resume refill: collecting ~{target} env steps (no updates)",
              flush=True)
        while int(replay.state.size) < target:
            key, ckey = jax.random.split(key)
            replay.state, env_states, _ = collect_and_store(
                state.params, replay.state, env_states, ckey,
                jnp.float32(exploration_eps(total_steps)),
            )
            total_steps += args.num_envs * args.steps_per_iter

    for it in range(args.iterations):
        t0 = time.perf_counter()
        key, ckey = jax.random.split(key)
        eps_now = exploration_eps(total_steps)
        replay.state, env_states, mean_reward = collect_and_store(
            state.params, replay.state, env_states, ckey, jnp.float32(eps_now)
        )
        total_steps += args.num_envs * args.steps_per_iter

        train_str = ""
        if total_steps >= args.learning_starts:
            key, ekey = jax.random.split(key)
            state, metrics = agent.train_epoch(
                state, replay.state, ekey, args.updates_per_iter
            )
            train_str = f" recon={float(metrics['reconstruction_loss']):.4f}"
            for tag, k in (("contr", "contrastive_loss"),
                           ("fwd", "latent_forward_loss")):
                if k in metrics:
                    train_str += f" {tag}={float(metrics[k]):.4f}"

        dt = time.perf_counter() - t0
        steps_s = args.num_envs * args.steps_per_iter / dt
        logger.log(
            {
                "fused/mean_step_reward": float(mean_reward),
                **({"fused/exploration_eps": eps_now} if explore_enabled else {}),
                "fused/env_steps_per_sec": steps_s,
                # full per-loss metrics (the state trainer logs these too;
                # without them a flat eval curve cannot be diagnosed post hoc)
                **({k: float(v) for k, v in metrics.items()} if train_str else {}),
            },
            total_steps,
        )

        eval_str = ""
        if args.eval_every and (
            it % args.eval_every == 0 or it == args.iterations - 1
        ):
            key, evkey = jax.random.split(key)
            ret = float(eval_return(state.params, evkey))
            logger.log({"eval/episode_reward_mean": ret}, total_steps)
            eval_str = f" eval={ret:.1f}"
            if args.checkpoint_dir and ret > best_eval:
                best_eval = ret
                from active_inference_diffusion_tpu.utils.checkpoints import (
                    save_checkpoint,
                )

                save_checkpoint(
                    args.checkpoint_dir, state, step=total_steps,
                    config=config, training_config=training_config,
                    keep_latest_alias=False, name="best",
                    replay_state=replay.state if args.save_replay else None,
                    extra_meta={"eval_return": best_eval, "env": env_name},
                )
                eval_str += " [best saved]"

        if it % 5 == 0 or it == args.iterations - 1 or eval_str:
            print(
                f"[iter {it}] steps={total_steps} "
                f"mean_step_reward={float(mean_reward):.3f} "
                f"steps/s={steps_s:.0f}{train_str}{eval_str}",
                flush=True,
            )

    if args.checkpoint_dir:
        # End-of-run checkpoint regardless of eval: a run whose evals never
        # beat the restored best (e.g. a pixel arm still at random) would
        # otherwise leave NOTHING to continue from — 'best' stays the old
        # params and the whole run's training is unresumable (bit round 5:
        # pixel arm D's 278k-step run left only its 45k-step 'best').
        from active_inference_diffusion_tpu.utils.checkpoints import (
            save_checkpoint,
        )

        save_checkpoint(
            args.checkpoint_dir, state, step=total_steps,
            config=config, training_config=training_config,
            keep_latest_alias=False, name="final",
            replay_state=replay.state if args.save_replay else None,
            extra_meta={"eval_return": best_eval, "env": env_name},
        )
        print(f"final checkpoint saved at step {total_steps}", flush=True)

    print("done", flush=True)


if __name__ == "__main__":
    main()
