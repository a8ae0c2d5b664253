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
