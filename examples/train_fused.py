#!/usr/bin/env python
"""Fully-fused on-device training: JAX-native env rollouts + diffusion active
inference, no host env processes.

This is the architecture the reference cannot express: its collectors exist
because env stepping (CPU MuJoCo) and inference (GPU) live on different
devices (reference: utils/async_collector.py, envs/parallel_wrapper.py).
With a JAX-native env (envs/jax_envs.py; MJX when installed), rollout,
denoising, and learning are all XLA programs — the host only logs.

Usage: python examples/train_fused.py --env Pendulum-v1 --iterations 50
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def build_run_config(args):
    """Assemble (env, env_name, config, training_config) from parsed args.

    Precedence (tested in tests/test_train_fused_config.py): with --config
    the YAML is the base — an explicit --env wins over its env_name, the
    agent-level flags are ignored; without it the flags build the config.
    --buffer-size overrides in both modes only when explicitly passed."""
    from active_inference_diffusion_tpu.configs.config import (
        ActiveInferenceConfig,
        DiffusionConfig,
        TrainingConfig,
        load_yaml_config,
    )
    from active_inference_diffusion_tpu.envs.jax_envs import make_jax_env

    if args.config:
        config, training_config, _ = load_yaml_config(args.config)
        # Same precedence as cli.py:85-87: an explicit --env wins, else the
        # YAML's env_name (ant3d_fused.yaml names its own env).
        env_name = args.env or config.env_name
        env = make_jax_env(env_name)
        config.observation_dim = env.observation_dim
        config.action_dim = env.action_dim
        config.env_name = env_name
    else:
        env_name = args.env or "Pendulum-v1"
        env = make_jax_env(env_name)
        config = ActiveInferenceConfig(
            env_name=env_name,
            observation_dim=env.observation_dim,
            action_dim=env.action_dim,
            latent_dim=args.latent_dim,
            hidden_dim=args.hidden_dim,
            score_num_layers=args.score_layers,
            batch_size=args.batch_size,
            efe_horizon=args.efe_horizon,
            num_efe_trajectories=args.efe_trajectories,
            kl_weight=args.kl_weight,
            learning_rate=args.learning_rate,
            lambda_n_steps=args.lambda_n_steps,
            ground_beliefs=args.ground_beliefs,
            efe_value_weight=args.efe_value_weight,
            imagined_value_targets=args.imagined_value_targets,
            deterministic_beliefs=args.deterministic_beliefs,
            pragmatic_weight=args.pragmatic_weight,
            posterior_beliefs=args.posterior_beliefs,
            act_from_posterior=args.act_from_posterior,
            imagined_entropy_scale=args.entropy_scale,
            imagine_deterministic=args.imagine_deterministic,
            imagined_return_norm=not args.no_return_norm,
            value_ema_regularizer=args.value_ema_reg,
            auto_entropy=args.auto_entropy,
            entropy_target=args.entropy_target,
            imagined_reward_pessimism=args.reward_pessimism,
            imagined_reward_clip=args.imagined_reward_clip,
            policy_lr_scale=args.policy_lr_scale,
            policy_anchor_weight=args.policy_anchor_weight,
            policy_anchor_warmup_steps=args.policy_anchor_warmup,
            num_dynamics_ensemble=args.dynamics_ensemble,
            ensemble_pessimism=args.ensemble_pessimism,
            predict_continuation=args.predict_continuation,
            diffusion=DiffusionConfig(
                num_diffusion_steps=args.diffusion_steps, beta_schedule="cosine"
            ),
        )
        config.semantics.score_target_convention = args.score_target
        training_config = TrainingConfig(buffer_size=50_000)
    if args.buffer_size is not None:
        training_config.buffer_size = args.buffer_size
    return env, env_name, config, training_config


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--env", default=None,
                        help="defaults to the YAML's env_name with --config, "
                             "else Pendulum-v1 (same precedence as cli.py)",
                        choices=["Pendulum-v1", "PointMass2D-v0", "Reacher2Link-v0",
                                 # MJX MuJoCo tasks (exact Gymnasium -v4
                                 # semantics, envs/mujoco_tasks.py); need the
                                 # mujoco-mjx package for on-device physics.
                                 "HalfCheetah-v4", "Hopper-v4", "Walker2d-v4",
                                 "Ant-v4", "Humanoid-v4", "HumanoidStandup-v4",
                                 # From-scratch on-device planar physics
                                 # (envs/planar.py): exact smooth dynamics +
                                 # -v4 semantics, penalty-approximate
                                 # contacts; runs WITHOUT mujoco-mjx.
                                 "HopperPlanar-v0", "Walker2dPlanar-v0",
                                 "HalfCheetahPlanar-v0",
                                 # 3D sibling (free joint + hinges,
                                 # envs/rigid3d.py): Ant/Humanoid family on
                                 # device, constraint-based joint limits.
                                 "Ant3D-v0", "Humanoid3D-v0",
                                 "HumanoidStandup3D-v0"])
    parser.add_argument("--num-envs", type=int, default=64)
    parser.add_argument("--steps-per-iter", type=int, default=32)
    parser.add_argument("--updates-per-iter", type=int, default=8)
    parser.add_argument("--iterations", type=int, default=50)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--ground-beliefs", action="store_true",
                        help="differentiable belief sweep (see DEVIATIONS.md)")
    parser.add_argument("--lambda-n-steps", type=int, default=5,
                        help="1 = pure TD(0), statistically sound for i.i.d. replay")
    parser.add_argument("--learning-rate", type=float, default=3e-4)
    parser.add_argument("--efe-value-weight", type=float, default=1.0)
    parser.add_argument("--imagined-value-targets", action="store_true",
                        help="Dreamer-style imagined lambda actor-critic")
    parser.add_argument("--deterministic-beliefs", action="store_true",
                        help="noise-free belief sweeps (posterior-mean analogue)")
    parser.add_argument("--pragmatic-weight", type=float, default=1.0)
    parser.add_argument("--posterior-beliefs", action="store_true",
                        help="amortized q(z|o) grounds the score target (DEVIATIONS.md)")
    parser.add_argument("--act-from-posterior", action="store_true",
                        help="act from the posterior head instead of the sweep")
    parser.add_argument("--entropy-scale", type=float, default=3e-4,
                        help="imagined-actor entropy bonus scale")
    parser.add_argument("--imagine-deterministic", action="store_true",
                        help="roll imagination on the dynamics mean (no "
                             "fixed-variance noise; DEVIATIONS.md)")
    parser.add_argument("--train-epoch", action="store_true",
                        help="run each iteration's updates as ONE jitted "
                             "lax.scan (agent.train_epoch) — essential "
                             "through a remote chip")
    parser.add_argument("--buffer-size", type=int, default=None,
                        help="replay capacity (default: the YAML's "
                             "training.buffer_size with --config, else 50k)")
    parser.add_argument("--score-target", default=None,
                        choices=["reference", "standard"],
                        help="score-matching target convention "
                             "(SemanticsConfig.score_target_convention; "
                             "DEVIATIONS.md row 11)")
    parser.add_argument("--warm-start-steps", type=int, default=0,
                        help="collect with warm-start partial denoising: "
                             "carry each env's belief across control steps "
                             "and run only N reverse steps per act (0 = full "
                             "K sweep every step)")
    parser.add_argument("--eval-every", type=int, default=0,
                        help="every N iterations, roll full deterministic "
                             "episodes on device and log mean return")
    parser.add_argument("--eval-envs", type=int, default=64)
    parser.add_argument("--no-return-norm", action="store_true",
                        help="ablate Dreamer-v3 return normalization")
    parser.add_argument("--value-ema-reg", type=float, default=1.0,
                        help="slow-critic regularizer weight (0 = ablate)")
    parser.add_argument("--auto-entropy", action="store_true",
                        help="SAC-style auto-tuned entropy coefficient")
    parser.add_argument("--entropy-target", type=float, default=None,
                        help="entropy target for --auto-entropy "
                             "(default -action_dim)")
    parser.add_argument("--reward-pessimism", type=float, default=0.0,
                        help="imagined reward penalty w * predicted std")
    parser.add_argument("--dynamics-ensemble", type=int, default=1,
                        help="dynamics ensemble size (TS1 member sampling)")
    parser.add_argument("--ensemble-pessimism", type=float, default=0.0,
                        help="imagined reward penalty w * member disagreement")
    parser.add_argument("--predict-continuation", action="store_true",
                        help="continuation head gates the imagined bootstrap")
    # Model scale (the defaults are Pendulum-scale; Ant3D/Humanoid3D need
    # bigger trunks) and the remaining Dreamer-stack knobs.
    parser.add_argument("--latent-dim", type=int, default=16)
    parser.add_argument("--hidden-dim", type=int, default=64)
    parser.add_argument("--score-layers", type=int, default=2)
    parser.add_argument("--batch-size", type=int, default=128)
    parser.add_argument("--efe-horizon", type=int, default=3)
    parser.add_argument("--efe-trajectories", type=int, default=4)
    parser.add_argument("--diffusion-steps", type=int, default=10)
    parser.add_argument("--kl-weight", type=float, default=0.1)
    parser.add_argument("--policy-lr-scale", type=float, default=1.0)
    parser.add_argument("--imagined-reward-clip", type=float, default=0.0,
                        help="clip |imagined reward| at w * running reward "
                             "scale (0 = off)")
    parser.add_argument("--policy-anchor-weight", type=float, default=0.0,
                        help="KL(live || EMA-policy) drift anchor weight")
    parser.add_argument("--policy-anchor-warmup", type=int, default=0,
                        help="train steps before the anchor activates (lets "
                             "from-scratch runs learn freely, then locks the "
                             "plateau; see DEVIATIONS.md anchor forensics)")
    parser.add_argument("--config", default=None,
                        help="YAML config (same schema as train.py). When "
                             "given, it is the base for the agent config and "
                             "agent-level flags above are IGNORED; loop-shape "
                             "flags (--num-envs/--steps-per-iter/"
                             "--updates-per-iter/--iterations/--eval-every/"
                             "--warm-start-steps/--buffer-size) still apply.")
    parser.add_argument("--checkpoint-dir", default=None,
                        help="save an Orbax 'best' checkpoint whenever "
                             "fused_eval improves (requires --eval-every)")
    parser.add_argument("--resume", default=None,
                        help="Orbax checkpoint (dir, or dir/best) to restore "
                             "the train state from before training; best_eval "
                             "and the step counter continue from the "
                             "checkpoint meta. A replay buffer saved with "
                             "--save-replay is restored too; otherwise the "
                             "buffer refills for --resume-refill-steps env "
                             "steps (no updates) before training continues.")
    parser.add_argument("--save-replay", action="store_true",
                        help="checkpoint the device replay buffer alongside "
                             "'best' so --resume continues from the exact "
                             "data distribution (round-3 forensics: resumes "
                             "with a fresh buffer never re-attained the "
                             "checkpointed eval). Costs a device->host copy "
                             "of the whole buffer per improvement — size it "
                             "via --buffer-size.")
    parser.add_argument("--resume-refill-steps", type=int, default=8192,
                        help="on --resume without a saved replay buffer, "
                             "collect this many env steps with the resumed "
                             "policy (no updates) before training, so the "
                             "first updates don't overfit a near-empty "
                             "buffer (0 = off)")
    parser.add_argument("--video-every", type=int, default=0,
                        help="every N iterations, roll one deterministic "
                             "eval episode and rasterize it ON DEVICE into "
                             "a GIF (utils/viz.make_episode_renderer; "
                             "compiles once). 0 = off.")
    parser.add_argument("--video-dir", default="videos",
                        help="where --video-every GIFs land")
    args = parser.parse_args()
    if args.checkpoint_dir and not args.eval_every:
        parser.error("--checkpoint-dir requires --eval-every (best-eval saves)")

    import jax
    import jax.numpy as jnp

    from active_inference_diffusion_tpu.agents.state_agent import DiffusionStateAgent
    from active_inference_diffusion_tpu.configs.config import (
        ActiveInferenceConfig,
        DiffusionConfig,
        TrainingConfig,
    )
    from active_inference_diffusion_tpu.data.replay import (
        replay_add_batch,
        replay_init,
        replay_sample,
    )
    from active_inference_diffusion_tpu.envs.jax_envs import (
        add_action_noise,
        flatten_transitions,
        fused_collect,
        fused_collect_stateful,
        fused_eval,
        init_warm_state,
        make_jax_env,
        make_rollout_policy,
        make_warm_rollout_policy,
        with_exploration_noise,
    )
    from active_inference_diffusion_tpu.utils.logger import Logger

    env, env_name, config, training_config = build_run_config(args)
    if args.resume:
        # Must run BEFORE the agent is built: the jitted train step bakes in
        # the score-target convention (ADVICE r4 / DEVIATIONS row 11).
        from active_inference_diffusion_tpu.utils.checkpoints import (
            adopt_checkpoint_semantics,
        )

        adopt_checkpoint_semantics(args.resume, config)
    # Print BEFORE the first dispatch: through the axon tunnel the first
    # fused-collect compile can take tens of minutes at humanoid scale, and
    # a silent log reads as a hung job to any stale-log watchdog.
    print(
        f"fused training: env={env_name} obs={env.observation_dim} "
        f"act={env.action_dim} latent={config.latent_dim} "
        f"hidden={config.hidden_dim} ensemble={config.num_dynamics_ensemble} "
        f"anchor={config.policy_anchor_weight}"
        f"@{config.policy_anchor_warmup_steps} — first iteration compiles "
        "the fused programs (minutes through a remote chip)",
        flush=True,
    )
    agent = DiffusionStateAgent(
        env.observation_dim, env.action_dim, config, training_config
    )
    state = agent.init_train_state(jax.random.PRNGKey(args.seed))
    replay = replay_init(
        training_config.buffer_size, (env.observation_dim,), env.action_dim
    )
    resume_meta = {}
    restored_replay = False
    if args.resume:
        from active_inference_diffusion_tpu.utils.checkpoints import load_checkpoint

        state, resume_meta = load_checkpoint(
            args.resume, state, replay_template=replay
        )
        saved_replay = resume_meta.pop("replay_state", None)
        if saved_replay is not None:
            replay = saved_replay
            restored_replay = True
        print(
            f"resumed from {args.resume}: total_steps="
            f"{resume_meta.get('total_steps')} "
            f"eval_return={resume_meta.get('eval_return')} "
            f"replay={'restored (size %d)' % int(replay.size) if restored_replay else 'fresh'}",
            flush=True,
        )

    rollout_policy = make_rollout_policy(
        agent.core, env,
        act_from_posterior=config.act_from_posterior,
        deterministic_beliefs=config.deterministic_beliefs,
    )
    eval_rollout = make_rollout_policy(
        agent.core, env, deterministic=True,
        act_from_posterior=config.act_from_posterior,
    )
    warm_policy = None
    if args.warm_start_steps:
        if config.act_from_posterior:
            parser.error(
                "--warm-start-steps is meaningless with --act-from-posterior "
                "(posterior acting is a single encoder forward, no sweep to "
                "truncate)"
            )
        warm_policy = make_warm_rollout_policy(
            agent.core, env, num_steps=args.warm_start_steps,
            deterministic_beliefs=config.deterministic_beliefs,
        )

    @jax.jit
    def eval_return(params, key):
        return fused_eval(
            env, lambda obs, k: eval_rollout(params, obs, k), key,
            args.eval_envs,
        )

    video_render = None
    if args.video_every:
        from active_inference_diffusion_tpu.utils.viz import make_episode_renderer

        video_render = make_episode_renderer(env_name, eval_rollout)
        os.makedirs(args.video_dir, exist_ok=True)

    # Exploration: the policy's own stochastic sampling, PLUS (when the
    # YAML's ``training: exploration_noise`` is > 0) host-collector-style
    # Gaussian action noise with the host's decay profile. The fused path
    # previously had no such noise; round-4 Hopper forensics measured the
    # consequence (auto_entropy anneals the policy's own stochasticity to
    # ~1e-6 and hop discovery stops — DEVIATIONS.md). ``explore_eps`` is a
    # traced scalar so the decay schedule reuses one compiled program.
    explore_enabled = training_config.exploration_noise > 0.0

    def exploration_eps(steps: int) -> float:
        """Host-equivalent eps(t): the host loop decays once per collect
        iteration of ``num_parallel_envs`` env steps (cli.py:348), so the
        same YAML gives the same schedule in env-step terms."""
        tc = training_config
        if not explore_enabled:
            return 0.0
        unit = max(1, tc.num_parallel_envs)
        return max(
            tc.min_exploration,
            tc.exploration_noise * tc.exploration_decay ** (steps / unit),
        )

    @jax.jit
    def collect_and_store(params, replay, env_states, warm_state, key,
                          explore_eps):
        if warm_policy is not None:
            def warm_fn(obs, k, ps, rm):
                if explore_enabled:
                    k, nk = jax.random.split(k)
                a, ps = warm_policy(params, obs, k, ps, rm)
                if explore_enabled:
                    a = add_action_noise(env, a, nk, explore_eps)
                return a, ps

            transitions, env_states, warm_state = fused_collect_stateful(
                env, warm_fn,
                key, args.num_envs, args.steps_per_iter,
                warm_state, env_states=env_states,
            )
        else:
            pol = lambda obs, k: rollout_policy(params, obs, k)
            if explore_enabled:
                pol = with_exploration_noise(pol, env, explore_eps)
            transitions, env_states = fused_collect(
                env,
                pol,
                key,
                args.num_envs,
                args.steps_per_iter,
                env_states=env_states,
            )
        flat = flatten_transitions(transitions)
        # Replay ``dones`` carries TERMINATED only (no time-limit truncation):
        # the value bootstrap and the continuation head must see time-limit
        # states as continuing. Matches the host collector, which stores
        # `terminated` (parallel/collect.py:128).
        replay = replay_add_batch(
            replay, flat.observations, flat.actions, flat.rewards,
            flat.next_observations, flat.terminateds,
        )
        mean_reward = jnp.mean(flat.rewards)
        return replay, env_states, warm_state, mean_reward

    logger = Logger(use_wandb=False, experiment_name=f"fused_{env_name}")
    # Resumed runs keep raising the bar from the checkpoint's best eval (so a
    # continuation never overwrites 'best' with a worse policy) and keep the
    # env-step axis continuous in the logs.
    _prev_eval = resume_meta.get("eval_return")
    best_eval = float(_prev_eval) if _prev_eval is not None else float("-inf")
    key = jax.random.PRNGKey(args.seed + 1)
    env_states = None
    warm_state = ()
    if warm_policy is not None:
        key, wkey = jax.random.split(key)
        warm_state = init_warm_state(wkey, args.num_envs, config.latent_dim)
    total_steps = int(resume_meta.get("total_steps", 0))

    if args.resume and not restored_replay and args.resume_refill_steps:
        # Round-3 forensics: the Standup3D resume from its 95k checkpoint
        # oscillated 38-75k for 307k steps and never re-touched the peak —
        # params resumed but the first updates overfit a near-empty buffer.
        # Refill with the RESUMED policy (no updates) so training continues
        # on-distribution; a --save-replay checkpoint skips this entirely.
        target = min(args.resume_refill_steps, training_config.buffer_size)
        print(f"resume refill: collecting ~{target} env steps (no updates)",
              flush=True)
        while int(replay.size) < target:
            key, ckey = jax.random.split(key)
            replay, env_states, warm_state, _ = collect_and_store(
                agent._acting_params(state), replay, env_states, warm_state,
                ckey, jnp.float32(exploration_eps(total_steps)),
            )
            total_steps += args.num_envs * args.steps_per_iter

    for it in range(args.iterations):
        t0 = time.perf_counter()
        key, ckey = jax.random.split(key)
        eps_now = exploration_eps(total_steps)
        replay, env_states, warm_state, mean_reward = collect_and_store(
            agent._acting_params(state), replay, env_states, warm_state, ckey,
            jnp.float32(eps_now),
        )
        total_steps += args.num_envs * args.steps_per_iter

        metrics = {}
        if int(replay.size) >= config.batch_size:
            if args.train_epoch:
                key, ekey = jax.random.split(key)
                state, metrics = agent.train_epoch(
                    state, replay, ekey, args.updates_per_iter
                )
            else:
                for _ in range(args.updates_per_iter):
                    key, skey = jax.random.split(key)
                    batch = replay_sample(replay, skey, config.batch_size)
                    state, metrics = agent.train_step(state, batch)
        dt = time.perf_counter() - t0

        log = {
            "fused/mean_step_reward": float(mean_reward),
            **({"fused/exploration_eps": eps_now} if explore_enabled else {}),
            "fused/env_steps_per_sec": args.num_envs * args.steps_per_iter / dt,
            **{k: float(v) for k, v in metrics.items()},
        }
        eval_str = ""
        if args.eval_every and (it % args.eval_every == 0 or it == args.iterations - 1):
            key, evkey = jax.random.split(key)
            log["fused/eval_return"] = float(
                eval_return(agent._acting_params(state), evkey)
            )
            eval_str = f" eval_return={log['fused/eval_return']:.1f}"
            if args.checkpoint_dir and log["fused/eval_return"] > best_eval:
                best_eval = log["fused/eval_return"]
                from active_inference_diffusion_tpu.utils.checkpoints import (
                    save_checkpoint,
                )

                save_checkpoint(
                    args.checkpoint_dir, state, step=total_steps,
                    config=config, training_config=training_config,
                    keep_latest_alias=False, name="best",
                    replay_state=replay if args.save_replay else None,
                    extra_meta={"eval_return": best_eval, "env": env_name},
                )
                eval_str += " [best saved]"
        if video_render is not None and (
            it % args.video_every == 0 or it == args.iterations - 1
        ):
            from active_inference_diffusion_tpu.utils.viz import save_gif

            key, vkey = jax.random.split(key)
            frames, vret, _ = video_render(agent._acting_params(state), vkey)
            vpath = os.path.join(
                args.video_dir, f"fused_{env_name}_step{total_steps}.gif"
            )
            save_gif(frames, vpath)
            log["fused/video_return"] = vret
            eval_str += f" [video {vpath} ret={vret:.1f}]"
        logger.log(log, total_steps)
        if it % 10 == 0 or it == args.iterations - 1 or eval_str:
            print(
                f"[iter {it}] steps={total_steps} "
                f"mean_step_reward={float(mean_reward):.3f} "
                f"steps/s={log['fused/env_steps_per_sec']:.0f}" + eval_str,
                # flush so a redirected log's mtime tracks real progress —
                # a fully-buffered ~100-byte/10-iter stream can look stale
                # to the tpu_job.sh watchdog and get a healthy run killed
                # mid-dispatch (ADVICE r4).
                flush=True,
            )

    if args.checkpoint_dir:
        # End-of-run checkpoint regardless of eval (same rationale as
        # train_fused_pixels.py: a run whose evals never beat the restored
        # best would otherwise be unresumable).
        from active_inference_diffusion_tpu.utils.checkpoints import (
            save_checkpoint,
        )

        save_checkpoint(
            args.checkpoint_dir, state, step=total_steps,
            config=config, training_config=training_config,
            keep_latest_alias=False, name="final",
            replay_state=replay if args.save_replay else None,
            extra_meta={"eval_return": best_eval, "env": env_name},
        )
        print(f"final checkpoint saved at step {total_steps}", flush=True)

    print("done", flush=True)


if __name__ == "__main__":
    main()
