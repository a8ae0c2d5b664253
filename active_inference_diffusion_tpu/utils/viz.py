"""Reconstruction and belief-evolution visualization.

Counterparts of the reference's viz utilities
(reference: active_inference_diffusion/utils/util.py:76-195,
utils/training.py:339-419).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def visualize_reconstruction(
    agent,
    state,
    observations,
    save_path: Optional[str] = None,
    max_samples: int = 4,
    key: Optional[jax.Array] = None,
) -> float:
    """Observation -> diffusion belief -> decode roundtrip; plots original vs
    reconstruction and returns the MSE (reference: utils/util.py:76-195)."""
    key = key if key is not None else jax.random.PRNGKey(0)
    obs = jnp.asarray(observations)[:max_samples]
    params = state.params
    core = agent.core

    is_pixel = agent.config.pixel_observation
    if is_pixel:
        enc_key, belief_key = jax.random.split(key)
        features = agent._apply_encoder(params, obs, enc_key, augment=False, train=False)
        belief = core.generate_beliefs(
            params, belief_key, features, compute_reconstruction=False
        )
        decoded_pixels = core.decode_observation(
            params, belief.latent, decode_to_pixels=True
        )  # (B, H, W, C)
        decoded_features = core.decode_observation(
            params, belief.latent, decode_to_pixels=False
        )
        recon_error = float(jnp.mean((decoded_features - features) ** 2))
    else:
        belief = core.generate_beliefs(params, key, obs, compute_reconstruction=False)
        decoded = core.decode_observation(params, belief.latent)
        recon_error = float(jnp.mean((decoded - obs) ** 2))

    if save_path:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        n = int(obs.shape[0])
        if is_pixel:
            fig, axes = plt.subplots(2, n, figsize=(3 * n, 6), squeeze=False)
            orig_np = np.asarray(obs, np.float32)
            for i in range(n):
                img = orig_np[i]
                # (T, C, H, W) or (C, H, W) -> last frame HWC
                if img.ndim == 4:
                    img = img[-1]
                if img.shape[0] in (1, 3):
                    img = np.transpose(img, (1, 2, 0))
                if img.max() > 1.5:
                    img = img / 255.0
                axes[0][i].imshow(np.clip(img, 0, 1))
                axes[0][i].set_title(f"Original {i}")
                axes[0][i].axis("off")
                recon = np.clip(np.asarray(decoded_pixels[i]), 0, 1)
                axes[1][i].imshow(recon)
                axes[1][i].set_title(f"Reconstructed {i}")
                axes[1][i].axis("off")
        else:
            fig, ax = plt.subplots(1, 1, figsize=(10, 6))
            dims = min(5, obs.shape[1])
            x = np.arange(dims)
            for i in range(n):
                offset = i * 0.2
                ax.plot(x, np.asarray(obs[i, :dims]) + offset, "o-",
                        label=f"Original {i}", alpha=0.7)
                ax.plot(x, np.asarray(decoded[i, :dims]) + offset, "s--",
                        label=f"Recon {i}", alpha=0.7)
            ax.set_xlabel("State dimension")
            ax.set_ylabel("Value (offset)")
            ax.set_title("State reconstruction quality")
            ax.legend(bbox_to_anchor=(1.05, 1), loc="upper left")
            ax.grid(alpha=0.3)
        fig.tight_layout()
        fig.savefig(save_path, dpi=120, bbox_inches="tight")
        plt.close(fig)

    return recon_error


def plot_belief_evolution(
    belief_dynamics, save_path: Optional[str] = None, max_dims: int = 5
):
    """Plot mean/variance/entropy/free-energy trajectories from a
    BeliefDynamics history (reference: utils/training.py:339-419)."""
    history = belief_dynamics.history
    if not history["means"]:
        return None

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    means = np.stack(history["means"])  # (T, D)
    covs = np.stack(history["covariances"])  # (T, D, D)
    entropies = np.asarray(history["entropies"])
    free_energies = np.asarray(history["free_energies"])
    t = np.arange(len(means))
    dims = min(max_dims, means.shape[1])

    fig, axes = plt.subplots(2, 2, figsize=(12, 8))
    for d in range(dims):
        std = np.sqrt(np.clip(covs[:, d, d], 0, None))
        axes[0][0].plot(t, means[:, d], label=f"dim {d}")
        axes[0][0].fill_between(t, means[:, d] - std, means[:, d] + std, alpha=0.15)
    axes[0][0].set_title("Belief mean ± std")
    axes[0][0].legend(fontsize=7)

    for d in range(dims):
        axes[0][1].semilogy(t, np.clip(covs[:, d, d], 1e-12, None), label=f"dim {d}")
    axes[0][1].set_title("Belief variance")

    axes[1][0].plot(t, entropies)
    axes[1][0].set_title("Belief entropy")
    axes[1][1].plot(t, free_energies)
    axes[1][1].set_title("Free energy")
    for ax in axes.flat:
        ax.grid(alpha=0.3)
        ax.set_xlabel("update")
    fig.tight_layout()
    if save_path:
        fig.savefig(save_path, dpi=120, bbox_inches="tight")
        plt.close(fig)
        return save_path
    return fig


# ---------------------------------------------------------------------------
# Eval video for fused (JAX-native) envs
# ---------------------------------------------------------------------------

def _fused_pixel_renderer(env_name: str, size: int):
    """A single-frame on-device rasterizer matching a fused STATE env.

    The pixel mixins subclass their state env and add no state fields, so
    ``pixel_env._render_state`` renders the state env's own ``EnvState``
    directly (envs/pixel_render.py)."""
    from ..envs import pixel_render as pr

    if env_name.endswith("Planar-v0"):
        return pr.make_planar_pixels(
            env_name.replace("Planar-v0", "-v4"), size=size, frame_stack=1
        )
    if env_name.endswith("3D-v0"):
        return pr.make_rigid3d_pixels(
            env_name.replace("3D-v0", "-v4"), size=size, frame_stack=1
        )
    if env_name.startswith("Pendulum"):
        return pr.PendulumPixels(size=size, frame_stack=1)
    if env_name.startswith("Reacher"):
        return pr.ReacherPixels(size=size, frame_stack=1)
    raise ValueError(f"no on-device renderer for fused env {env_name!r}")


def make_episode_renderer(
    env_name: str,
    policy_fn,
    size: int = 168,
    max_steps: Optional[int] = None,
):
    """Build a reusable on-device episode renderer for a fused JAX env.

    ``policy_fn(params, obs, key) -> actions`` takes the acting params as an
    explicit argument so the returned ``render(params, key)`` compiles ONCE
    and serves every later call (periodic eval videos during training would
    otherwise re-trace per video — a minutes-scale cold compile through the
    axon tunnel). Returns ``(frames, episode_return, length)`` with
    ``frames`` a host ``(length, H, W, 3) uint8`` array.
    """
    from ..envs.jax_envs import make_jax_env

    env = make_jax_env(env_name)
    renderer = _fused_pixel_renderer(env_name, size)
    num_steps = env.max_episode_steps if max_steps is None else max_steps

    @jax.jit
    def roll(params, key):
        def body(carry, step_key):
            state, ret, alive = carry
            action = policy_fn(params, state.obs[None], step_key)[0]
            nxt = env.step(state, action)
            ret = ret + alive * nxt.reward
            alive = alive * (1.0 - nxt.done.astype(ret.dtype))
            return (nxt, ret, alive), (nxt, alive)

        reset_key, scan_key = jax.random.split(key)
        state0 = env.reset(reset_key)
        (_, ret, _), (states, alives) = jax.lax.scan(
            body, (state0, jnp.zeros(()), jnp.ones(())),
            jax.random.split(scan_key, num_steps),
        )
        frames = jax.vmap(renderer._render_state)(states)  # (T, 3, H, W)
        first = renderer._render_state(state0)
        frames = jnp.concatenate([first[None], frames], axis=0)
        return frames, ret, alives

    def render(params, key):
        frames, ret, alives = roll(params, key)
        # steps-before-terminal + initial frame + terminal-state frame
        length = min(int(np.asarray(alives).sum()) + 2, int(frames.shape[0]))
        frames = np.moveaxis(np.asarray(frames[:length]), 1, -1)
        return frames, float(ret), length

    return render


def render_fused_episode(
    env_name: str,
    policy_fn,
    key: jax.Array,
    size: int = 168,
    max_steps: Optional[int] = None,
):
    """Roll ONE episode of a fused JAX env and rasterize every step on
    device (counterpart of the reference's host ``RecordVideo`` eval videos,
    reference utils/training.py:178-245 — which need a host MuJoCo renderer;
    here the whole episode AND its frames are one XLA program + one vmapped
    render).

    ``policy_fn(obs, key) -> action`` should be deterministic for eval
    semantics (e.g. ``make_rollout_policy(core, env, deterministic=True)``
    closed over params). One-shot convenience over
    :func:`make_episode_renderer` (use the factory for repeated renders).
    Returns ``(frames, episode_return, length)``.
    """
    render = make_episode_renderer(
        env_name, lambda params, obs, k: policy_fn(obs, k),
        size=size, max_steps=max_steps,
    )
    return render((), key)


def save_gif(frames: np.ndarray, path: str, fps: int = 25) -> str:
    """Write (T, H, W, 3) uint8 frames as an animated GIF (Pillow)."""
    from PIL import Image

    imgs = [Image.fromarray(f) for f in np.asarray(frames, np.uint8)]
    imgs[0].save(
        path, save_all=True, append_images=imgs[1:],
        duration=max(1, int(1000 / fps)), loop=0,
    )
    return path
