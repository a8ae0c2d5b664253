"""The hoisted-conditioning sweep must match the naive per-step score net."""

import jax
import jax.numpy as jnp
import numpy as np

from active_inference_diffusion_tpu.agents.state_agent import DiffusionStateAgent
from active_inference_diffusion_tpu.configs.config import (
    ActiveInferenceConfig,
    DiffusionConfig,
    TrainingConfig,
)
from active_inference_diffusion_tpu.core import diffusion as dproc


def make_agent():
    cfg = ActiveInferenceConfig(
        observation_dim=5, action_dim=2, latent_dim=8, hidden_dim=32,
        score_num_layers=2, batch_size=4,
        diffusion=DiffusionConfig(num_diffusion_steps=6, beta_schedule="cosine"),
    )
    cfg.tpu.donate_buffers = False
    return DiffusionStateAgent(5, 2, cfg, TrainingConfig())


def test_trunk_composition_matches_call():
    """obs_embedding + time_embedding + trunk == __call__ (both time paths)."""
    agent = make_agent()
    params = agent.core.init_params(jax.random.PRNGKey(0))
    net = agent.core.score_network
    variables = {"params": params["score"]}

    z = jax.random.normal(jax.random.PRNGKey(1), (4, 8))
    obs = jax.random.normal(jax.random.PRNGKey(2), (4, 5))

    for continuous, t in [
        (True, jnp.array([0.1, 0.5, 0.7, 0.9])),
        (False, jnp.array([0.0, 2.0, 3.0, 5.0])),
    ]:
        direct = net.apply(variables, z, t, obs, continuous=continuous, train=False)
        t_emb = net.apply(variables, t, continuous=continuous, method="time_embedding")
        obs_emb = net.apply(variables, obs, method="obs_embedding")
        tw = jnp.sqrt(1.0 / (1e-5 + t))[:, None] if continuous else None
        composed = net.apply(variables, z, t_emb + obs_emb, tw, method="trunk")
        np.testing.assert_allclose(
            np.asarray(direct), np.asarray(composed), rtol=1e-6, atol=1e-7
        )


def test_hoisted_sweep_matches_generic_sampler():
    """generate_beliefs (hoisted) == dproc.generate_latents (per-step score
    net) given the same key."""
    agent = make_agent()
    params = agent.core.init_params(jax.random.PRNGKey(0))
    obs = jax.random.normal(jax.random.PRNGKey(3), (4, 5))
    key = jax.random.PRNGKey(4)

    belief = agent.core.generate_beliefs(
        params, key, obs, compute_reconstruction=False, return_trajectory=True
    )

    def score_fn(z, t, o):
        return agent.core.apply_score(
            params["score"], z, t, o, continuous=False, train=False
        )

    generic = dproc.generate_latents(
        agent.core.schedule, score_fn, key, 4, 8,
        observation=obs, return_trajectory=True,
    )

    np.testing.assert_allclose(
        np.asarray(belief.latent), np.asarray(generic.latent), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(belief.trajectory), np.asarray(generic.trajectory),
        rtol=1e-5, atol=1e-6,
    )
