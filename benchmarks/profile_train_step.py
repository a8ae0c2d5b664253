#!/usr/bin/env python
"""Piecewise timing of the train step's phases on the current default device.

Isolates: belief sweep, fused score+model grad, policy EFE grad, value update,
epistemic MINE update — each separately jitted — to find the train_step
bottleneck seen in bench.py.
"""

import sys
import time

import jax
import jax.numpy as jnp


def timeit(name, fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:30s} {dt * 1e3:10.2f} ms", flush=True)
    return out


def main():
    from active_inference_diffusion_tpu.agents.state_agent import DiffusionStateAgent
    from active_inference_diffusion_tpu.agents.base import merged, subset
    from active_inference_diffusion_tpu.configs.config import (
        ActiveInferenceConfig,
        DiffusionConfig,
        TrainingConfig,
    )
    from active_inference_diffusion_tpu.core.epistemic import estimate_epistemic_value

    BATCH = 256
    config = ActiveInferenceConfig(
        observation_dim=17, action_dim=6, latent_dim=32, hidden_dim=128,
        batch_size=BATCH, kl_weight=0.5,
        diffusion=DiffusionConfig(num_diffusion_steps=25, beta_schedule="cosine"),
    )
    config.tpu.donate_buffers = False
    agent = DiffusionStateAgent(17, 6, config, TrainingConfig())
    core = agent.core
    state = agent.init_train_state(jax.random.PRNGKey(0))
    params = state.params

    keys = jax.random.split(jax.random.PRNGKey(1), 8)
    obs = jax.random.normal(keys[0], (BATCH, 17))
    next_obs = jax.random.normal(keys[1], (BATCH, 17))
    actions = jax.random.normal(keys[2], (BATCH, 6))
    rewards = jax.random.normal(keys[3], (BATCH,))
    dones = jax.random.bernoulli(keys[4], 0.05, (BATCH,))
    latents = jax.random.normal(keys[5], (BATCH, 32))
    next_latents = jax.random.normal(keys[6], (BATCH, 32))

    print(f"device: {jax.devices()[0].platform}", flush=True)

    # 1. belief sweep (2B batch)
    @jax.jit
    def sweep(params, key):
        both = jnp.concatenate([obs, next_obs], 0)
        return core.generate_beliefs(params, key, both, compute_reconstruction=False).latent

    timeit("belief sweep (2x256, K=25)", sweep, params, keys[7])

    # 2. fused score+model grads
    fused_groups = agent.PARTITIONS["score"] + agent.PARTITIONS["model"]

    @jax.jit
    def fused_grads(params, key):
        def loss_fn(sub):
            p = merged(params, sub)
            terms = core.elbo_terms(p, key, obs, rewards, latents,
                                    state.time_importance, train=True)
            score_loss = core.assemble_score_loss(terms)
            pred_next, _ = core.predict_next_latent(p["dynamics"], latents, actions)
            dyn = jnp.mean((pred_next - next_latents) ** 2)
            return score_loss + core.assemble_model_loss(terms, dyn)

        return jax.grad(loss_fn)(subset(params, fused_groups))

    timeit("fused score+model grad", fused_grads, params, keys[7])

    # 2b. elbo grad WITHOUT the gradient penalty (second-order term)
    @jax.jit
    def fused_grads_no_gp(params, key):
        def loss_fn(sub):
            p = merged(params, sub)
            t = jax.random.uniform(key, (BATCH,))
            noise = jax.random.normal(key, latents.shape)
            from active_inference_diffusion_tpu.core import diffusion as dproc
            noisy, qinfo = dproc.continuous_q_sample(p["diffusion"], latents, t, noise)
            score = core.apply_score(p["score"], noisy, t, obs, continuous=True)
            true_score = -noise / (qinfo["sigma"] + 1e-8)
            w = dproc.compute_loss_weight(p["diffusion"], t)
            return jnp.mean(w * jnp.sum((score - true_score) ** 2, 1))

        return jax.grad(loss_fn)(subset(params, ["score", "diffusion"]))

    timeit("score-matching grad only", fused_grads_no_gp, params, keys[7])

    # 3. policy EFE grad
    @jax.jit
    def policy_grads(params, key):
        def loss_fn(sub):
            p = merged(params, sub)
            efe, _ = core.compute_expected_free_energy(
                p, latents, key, jnp.asarray(1.0))
            return jnp.mean(efe)

        return jax.grad(loss_fn)(subset(params, ["policy"]))

    timeit("policy EFE grad (T=10,H=5)", policy_grads, params, keys[7])

    # 4. value update
    @jax.jit
    def value_grads(params):
        t0v = jnp.zeros((BATCH,))

        def loss_fn(sub):
            v = core.apply_value(sub["value"], latents, t0v)
            return jnp.mean((v - rewards) ** 2)

        return jax.grad(loss_fn)(subset(params, ["value"]))

    timeit("value grad", value_grads, params)

    # 5. epistemic MINE update
    @jax.jit
    def epi_grads(params, key):
        def decoder_fn(z):
            return core.decode_observation(params, z, decode_to_pixels=True)

        next_mean, next_logvar = core.predict_next_latent(
            params["dynamics"], latents, actions)

        def loss_fn(ep):
            res = estimate_epistemic_value(
                core.epistemic_estimator, ep, decoder_fn,
                next_mean, next_logvar, key, jnp.zeros(()),
                num_samples=5, train=True)
            return -res.mi_lower_bound

        return jax.grad(loss_fn)(params["epistemic"])

    timeit("epistemic MINE grad", epi_grads, params, keys[7])

    # 6. lambda returns
    @jax.jit
    def lam(params):
        v = core.apply_value(params["value"], latents, jnp.zeros((BATCH,)))
        nv = core.apply_value(params["value"], next_latents, jnp.ones((BATCH,)))
        return core.lambda_returns(rewards, v, nv, dones)

    timeit("lambda returns", lam, params)

    # 7. full train step for comparison
    batch = {
        "observations": obs, "actions": actions, "rewards": rewards,
        "next_observations": next_obs, "dones": dones,
    }
    timeit("FULL train step", lambda b: agent._train_step(state, b)[0].params, batch, n=3)


if __name__ == "__main__":
    main()
