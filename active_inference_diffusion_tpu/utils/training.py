"""Evaluation, video, and plotting utilities.

Counterparts of the reference's training helpers
(reference: active_inference_diffusion/utils/training.py:15-69, 178-336).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np


def evaluate_agent(
    agent,
    state,
    env,
    num_episodes: int = 10,
    deterministic: Optional[bool] = None,
    key: Optional[jax.Array] = None,
    max_steps: int = 10_000,
) -> Dict[str, float]:
    """Run evaluation episodes (reference: utils/training.py:15-69).

    The reference passes deterministic=False despite intending deterministic
    eval (utils/training.py:47); here the default follows
    ``config.semantics.deterministic_eval``.
    """
    if deterministic is None:
        deterministic = agent.config.semantics.deterministic_eval
    key = key if key is not None else jax.random.PRNGKey(0)

    rewards, lengths = [], []
    for ep in range(num_episodes):
        obs, _ = env.reset(seed=10_000 + ep)
        total, steps, done = 0.0, 0, False
        while not done and steps < max_steps:
            key, sub = jax.random.split(key)
            action = agent.act(
                state, obs[None] if obs.ndim == 1 else obs, sub,
                deterministic=deterministic, collect=False,
            )
            action = np.asarray(action)[0]
            obs, reward, terminated, truncated, _ = env.step(action)
            total += float(reward)
            steps += 1
            done = terminated or truncated
        rewards.append(total)
        lengths.append(steps)

    return {
        "eval/episode_reward_mean": float(np.mean(rewards)),
        "eval/episode_reward_std": float(np.std(rewards)),
        "eval/episode_reward_min": float(np.min(rewards)),
        "eval/episode_reward_max": float(np.max(rewards)),
        "eval/episode_length_mean": float(np.mean(lengths)),
    }


def evaluate_agent_batched(
    agent,
    state,
    env_fn,
    num_episodes: int = 10,
    deterministic: Optional[bool] = None,
    key: Optional[jax.Array] = None,
    max_steps: int = 10_000,
) -> Dict[str, float]:
    """All evaluation episodes in lockstep: one env per episode, one batched
    act per step. The serial ``evaluate_agent`` pays a device round trip per
    (episode, step) — prohibitive through a remote accelerator; this pays one
    per step total. ``env_fn(i) -> callable`` as used by the collectors.
    """
    from ..envs.vec_env import ThreadedVectorEnv

    if deterministic is None:
        deterministic = agent.config.semantics.deterministic_eval
    key = key if key is not None else jax.random.PRNGKey(0)

    vec = ThreadedVectorEnv([env_fn(100 + i) for i in range(num_episodes)])
    try:
        n = vec.num_envs
        obs, _ = vec.reset(seed=10_000)
        totals = np.zeros(n)
        lengths = np.zeros(n, dtype=np.int64)
        alive = np.ones(n, dtype=bool)
        steps = 0
        while alive.any() and steps < max_steps:
            key, sub = jax.random.split(key)
            actions = agent.act(
                state, obs, sub, deterministic=deterministic, collect=False
            )
            obs, rewards, terminated, truncated, _ = vec.step(np.asarray(actions))
            done = np.logical_or(terminated, truncated)
            totals += np.asarray(rewards) * alive
            lengths += alive
            alive &= ~done  # autoreset: post-done rewards belong to new episodes
            steps += 1
    finally:
        vec.close()

    return {
        "eval/episode_reward_mean": float(np.mean(totals)),
        "eval/episode_reward_std": float(np.std(totals)),
        "eval/episode_reward_min": float(np.min(totals)),
        "eval/episode_reward_max": float(np.max(totals)),
        "eval/episode_length_mean": float(np.mean(lengths)),
    }


def create_video(
    agent, state, env_name: str, video_dir: str = "videos",
    num_episodes: int = 1, key: Optional[jax.Array] = None,
    pixel: bool = False, max_steps: int = 1000, fps: int = 30,
):
    """Record evaluation videos (reference: utils/training.py:178-245).

    Frames are rendered directly and written with imageio — mp4 when an
    ffmpeg writer is available, GIF otherwise (gym.wrappers.RecordVideo
    requires moviepy, which this container lacks)."""
    import os

    import gymnasium as gym
    import imageio

    key = key if key is not None else jax.random.PRNGKey(0)
    os.makedirs(video_dir, exist_ok=True)
    env = gym.make(env_name, render_mode="rgb_array")
    paths = []
    try:
        for ep in range(num_episodes):
            obs, _ = env.reset(seed=20_000 + ep)
            frames = [env.render()]
            done, steps = False, 0
            while not done and steps < max_steps:
                key, sub = jax.random.split(key)
                action = np.asarray(
                    agent.act(state, obs[None], sub, deterministic=True, collect=False)
                )[0]
                obs, _, terminated, truncated, _ = env.step(action)
                frames.append(env.render())
                done = terminated or truncated
                steps += 1
            base = os.path.join(video_dir, f"{env_name}-episode-{ep}")
            try:
                path = base + ".mp4"
                imageio.mimsave(path, frames, fps=fps)
            except Exception:
                path = base + ".gif"
                imageio.mimsave(path, frames, fps=min(fps, 25))
            paths.append(path)
    finally:
        env.close()
    return paths[0] if len(paths) == 1 else video_dir


def plot_training_curves(
    log_file: str,
    save_path: Optional[str] = None,
    metrics: Optional[list] = None,
    smoothing_window: int = 10,
):
    """Plot training curves from the JSONL log
    (reference: utils/training.py:248-336)."""
    import json

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    rows = []
    with open(log_file) as f:
        for line in f:
            try:
                rows.append(json.loads(line))
            except json.JSONDecodeError:
                continue
    if not rows:
        return None

    if metrics is None:
        metrics = [
            "collect/episode_reward_mean", "eval/episode_reward_mean",
            "policy_loss", "value_loss", "score_matching_loss", "dynamics_loss",
        ]
    metrics = [m for m in metrics if any(m in r for r in rows)]
    if not metrics:
        return None

    ncols = 2
    nrows = (len(metrics) + 1) // 2
    fig, axes = plt.subplots(nrows, ncols, figsize=(12, 4 * nrows), squeeze=False)
    for i, metric in enumerate(metrics):
        ax = axes[i // ncols][i % ncols]
        steps = [r["step"] for r in rows if metric in r]
        vals = [r[metric] for r in rows if metric in r]
        ax.plot(steps, vals, alpha=0.3, label="raw")
        if len(vals) > smoothing_window:
            kernel = np.ones(smoothing_window) / smoothing_window
            smooth = np.convolve(vals, kernel, mode="valid")
            ax.plot(steps[smoothing_window - 1:], smooth, label="smoothed")
        ax.set_title(metric)
        ax.set_xlabel("step")
        ax.grid(alpha=0.3)
        ax.legend()
    for j in range(len(metrics), nrows * ncols):
        axes[j // ncols][j % ncols].axis("off")
    fig.tight_layout()
    if save_path:
        fig.savefig(save_path, dpi=120, bbox_inches="tight")
        plt.close(fig)
        return save_path
    return fig
