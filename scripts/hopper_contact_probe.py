"""Isolate the fused-hopper host-parity gap: engine fidelity vs recipe.

VERDICT r4 #4: fused HopperPlanar plateaus below the host agent's 255-322.
Two candidate explanations:
  (a) the planar engine's contacts differ enough from MuJoCo that the
      learned policy is fitted to wrong physics;
  (b) the training recipe/data differs (collection noise profile, UTD,
      replay composition), engine fidelity is fine.

Decisive test A — POLICY TRANSFER: run the planar-trained policy (same
obs/action/-v4 semantics, envs/mujoco_tasks.py) directly in host MuJoCo
Hopper-v4. If its real-physics return ~= its planar eval, the engine is
faithful where the policy actually lives, and the parity gap is (b). If the
return craters, the policy exploits planar-specific contact behavior -> (a).

Test B — TRAJECTORY DIVERGENCE under the trained policy's own actions:
step both engines from the same state with the same action sequence and
report torso-height divergence through hop/contact events.

CPU-only (forces the cpu platform; runs under the TPU job queue to respect
the one-heavy-job rule). Usage:
  python scripts/hopper_contact_probe.py --checkpoint checkpoints/hopper_arm3/best
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


import argparse
import json


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", default="checkpoints/hopper_arm3/best")
    p.add_argument("--config",
                   default="examples/configs/hopper_planar_fused_utd1_explore.yaml")
    p.add_argument("--episodes", type=int, default=10)
    p.add_argument("--divergence-steps", type=int, default=100)
    args = p.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    import gymnasium as gym
    import jax.numpy as jnp
    import numpy as np

    from active_inference_diffusion_tpu.agents.state_agent import DiffusionStateAgent
    from active_inference_diffusion_tpu.configs.config import load_yaml_config
    from active_inference_diffusion_tpu.envs.jax_envs import (
        make_jax_env,
        make_rollout_policy,
    )
    from active_inference_diffusion_tpu.utils.checkpoints import (
        adopt_checkpoint_semantics,
        load_checkpoint,
    )

    config, training_config, _ = load_yaml_config(args.config)
    penv = make_jax_env("HopperPlanar-v0")
    config.observation_dim = penv.observation_dim
    config.action_dim = penv.action_dim
    adopt_checkpoint_semantics(args.checkpoint, config)
    agent = DiffusionStateAgent(
        penv.observation_dim, penv.action_dim, config, training_config
    )
    state = agent.init_train_state(jax.random.PRNGKey(0))
    state, meta = load_checkpoint(args.checkpoint, state)
    params = agent._acting_params(state)
    print(f"loaded {args.checkpoint}: step={meta.get('total_steps')} "
          f"planar-best={meta.get('eval_return')}", flush=True)

    policy = make_rollout_policy(
        agent.core, penv, deterministic=True,
        act_from_posterior=config.act_from_posterior,
        deterministic_beliefs=config.deterministic_beliefs,
    )
    act = jax.jit(lambda k, o: policy(params, o[None], k)[0])

    # ---- Test A: real-MuJoCo return of the planar-trained policy --------
    env = gym.make("Hopper-v4")
    key = jax.random.PRNGKey(1)
    returns, lengths = [], []
    for ep in range(args.episodes):
        obs, _ = env.reset(seed=100 + ep)
        done, total, t = False, 0.0, 0
        while not done:
            key, sub = jax.random.split(key)
            a = np.asarray(act(sub, jnp.asarray(obs, jnp.float32)))
            obs, r, term, trunc, _ = env.step(a)
            total += float(r)
            t += 1
            done = term or trunc
        returns.append(total)
        lengths.append(t)
        print(f"[mujoco ep {ep}] return={total:.1f} len={t}", flush=True)

    # Same policy in its own engine (sanity anchor for the comparison).
    planar_returns = []
    pkey = jax.random.PRNGKey(2)
    step_j = jax.jit(penv.step)
    for ep in range(args.episodes):
        pkey, rkey = jax.random.split(pkey)
        s = penv.reset(rkey)
        total = 0.0
        while not bool(s.done):
            pkey, sub = jax.random.split(pkey)
            a = act(sub, s.obs)
            s = step_j(s, a)
            total += float(s.reward)
        planar_returns.append(total)
        print(f"[planar ep {ep}] return={total:.1f}", flush=True)

    # ---- Test B: trajectory divergence under the policy's actions -------
    import mujoco
    import gymnasium.envs.mujoco as gym_mujoco
    import os

    from active_inference_diffusion_tpu.envs.mujoco_tasks import TASK_SPECS

    spec = TASK_SPECS["Hopper-v4"]
    xml = os.path.join(
        os.path.dirname(gym_mujoco.__file__), "assets", spec.xml_file
    )
    m = mujoco.MjModel.from_xml_path(xml)
    d = mujoco.MjData(m)

    dkey = jax.random.PRNGKey(3)
    s = penv.reset(dkey)
    nq = penv.nq
    d.qpos[:] = np.asarray(s.physics[:nq], np.float64)
    d.qvel[:] = np.asarray(s.physics[nq:], np.float64)
    mujoco.mj_forward(m, d)

    h_planar, h_mj, div = [], [], []
    for t in range(args.divergence_steps):
        dkey, sub = jax.random.split(dkey)
        a = np.asarray(act(sub, s.obs), np.float64)
        # planar step
        s = step_j(s, jnp.asarray(a, jnp.float32))
        # mujoco step with the SAME action
        d.ctrl[:] = a
        for _ in range(spec.frame_skip):
            mujoco.mj_step(m, d)
        h_p = float(s.physics[1])
        h_m = float(d.qpos[1])
        h_planar.append(h_p)
        h_mj.append(h_m)
        div.append(abs(h_p - h_m))

    rmse = float(np.sqrt(np.mean((np.array(h_planar) - np.array(h_mj)) ** 2)))
    first_1cm = next((t for t, x in enumerate(div) if x > 0.01), None)

    out = {
        "checkpoint": args.checkpoint,
        "planar_best_train_eval": meta.get("eval_return"),
        "planar_return_mean": round(float(np.mean(planar_returns)), 1),
        "planar_return_std": round(float(np.std(planar_returns)), 1),
        "mujoco_return_mean": round(float(np.mean(returns)), 1),
        "mujoco_return_std": round(float(np.std(returns)), 1),
        "mujoco_ep_len_mean": round(float(np.mean(lengths)), 1),
        "divergence_h_rmse_openloop_policy": round(rmse, 4),
        "divergence_first_1cm_step": first_1cm,
        "n_episodes": args.episodes,
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
