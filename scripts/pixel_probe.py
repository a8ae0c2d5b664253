"""Linear-decodability probe: is ACTION-RELEVANT state in the pixel latents?

Pixel-control forensics (DEVIATIONS.md C-21 thread) exonerated the
representation via reconstruction/contrastive losses — but recon can be
sharp while the 50-d feature bottleneck still scrambles the two numbers the
POLICY actually needs (theta, theta_dot). This probe settles it: ridge-
regress [cos th, sin th, th_dot] from the acting latent (deterministic
posterior over encoder features) on random-policy rollouts, against a
random-init encoder baseline.

Readout:
- high R^2 (th AND th_dot) for trained >> random  -> representation truly
  fine; the failure is policy/imagination-side grounding (value/reward in
  latent space), full stop.
- th decodable but th_dot not -> found it: motion information (the frame
  stack's reason to exist) is lost in the latent; fix the encoder/feature
  path, not the policy.

Usage: python scripts/pixel_probe.py --checkpoint checkpoints/pixel_e/final
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


import argparse
import json


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", default="checkpoints/pixel_e/final")
    p.add_argument("--config",
                   default="examples/configs/pendulum_pixels_fused_d.yaml")
    p.add_argument("--envs", type=int, default=128)
    p.add_argument("--steps", type=int, default=48)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from active_inference_diffusion_tpu.agents.pixel_agent import DiffusionPixelAgent
    from active_inference_diffusion_tpu.configs.config import load_yaml_config
    from active_inference_diffusion_tpu.envs.pixel_render import PendulumPixels
    from active_inference_diffusion_tpu.utils.checkpoints import (
        adopt_checkpoint_semantics,
        load_checkpoint,
    )

    config, training_config, pixel_config = load_yaml_config(args.config)
    env = PendulumPixels(size=84, frame_stack=3)
    config.pixel_observation = True
    config.action_dim = env.action_dim
    adopt_checkpoint_semantics(args.checkpoint, config)
    agent = DiffusionPixelAgent(
        obs_shape=env.obs_shape, action_dim=env.action_dim,
        config=config, training_config=training_config,
        pixel_config=pixel_config,
    )
    state = agent.init_train_state(jax.random.PRNGKey(0))
    random_params = state.params  # random-init baseline (pre-restore)
    state, meta = load_checkpoint(args.checkpoint, state)
    print(f"loaded {args.checkpoint}: step={meta.get('total_steps')}", flush=True)

    # ---- random-policy rollout, collecting (obs, physics) ----------------
    @jax.jit
    def collect(key):
        rkeys = jax.random.split(key, args.envs)
        states = jax.vmap(env.reset)(rkeys)
        step_env = jax.vmap(env.step)

        def body(carry, k):
            states = carry
            a = jax.random.uniform(
                k, (args.envs, env.action_dim), minval=-1.0, maxval=1.0
            )
            nxt = step_env(states, env.scale_action(a))
            return nxt, (nxt.obs, nxt.physics[:, :2])

        _, (obs, phys) = jax.lax.scan(
            body, states, jax.random.split(key, args.steps)
        )
        return (
            obs.reshape((-1,) + env.obs_shape),
            phys.reshape((-1, 2)),
        )

    obs, phys = collect(jax.random.PRNGKey(1))
    obs, phys = np.asarray(obs), np.asarray(phys)
    n = obs.shape[0]
    print(f"collected {n} (obs, state) pairs", flush=True)

    def latents_for(params):
        @jax.jit
        def enc(o, k):
            feats = agent._apply_encoder(params, o, k, augment=False, train=False)
            return agent.core.sample_posterior(
                params["posterior"], k, feats, deterministic=True
            )
        outs = []
        key = jax.random.PRNGKey(2)
        for i in range(0, n, 512):
            key, sub = jax.random.split(key)
            outs.append(np.asarray(enc(jnp.asarray(obs[i:i + 512]), sub)))
        return np.concatenate(outs)

    targets = np.stack(
        [np.cos(phys[:, 0]), np.sin(phys[:, 0]), phys[:, 1]], axis=1
    )
    names = ["cos_theta", "sin_theta", "theta_dot"]

    def ridge_r2(z):
        ztr, zte = z[: int(0.8 * n)], z[int(0.8 * n):]
        ytr, yte = targets[: int(0.8 * n)], targets[int(0.8 * n):]
        zm, ym = ztr.mean(0), ytr.mean(0)
        zc, yc = ztr - zm, ytr - ym
        w = np.linalg.solve(
            zc.T @ zc + 1e-3 * np.eye(z.shape[1]), zc.T @ yc
        )
        pred = (zte - zm) @ w + ym
        ss_res = ((yte - pred) ** 2).sum(0)
        ss_tot = ((yte - yte.mean(0)) ** 2).sum(0) + 1e-12
        return 1.0 - ss_res / ss_tot

    out = {"checkpoint": args.checkpoint, "n": int(n)}
    for tag, params in (("trained", state.params), ("random_init", random_params)):
        r2 = ridge_r2(latents_for(params))
        out[tag] = {k: round(float(v), 4) for k, v in zip(names, r2)}
        print(tag, out[tag], flush=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
