"""Golden test: vectorized lambda-returns vs a direct transcription of the
reference's nested-loop computation
(reference: active_inference_diffusion/core/active_inference.py:638-707)."""

import jax.numpy as jnp
import numpy as np

from active_inference_diffusion_tpu.core.returns import compute_lambda_returns


def reference_lambda_returns(
    rewards, values, next_values, dones, discount, lambda_, n_steps,
    exclude_immediate_rewards=False,
):
    """Direct numpy transcription of the reference loop semantics."""
    b = len(rewards)
    out = np.zeros_like(rewards)
    for idx in range(b):
        returns = []
        for n in range(1, min(n_steps + 1, b - idx)):
            acc = 0.0
            disc = 1.0
            for k in range(n):
                if idx + k < b:
                    if not (exclude_immediate_rewards and k == 0):
                        acc += disc * rewards[idx + k]
                    disc *= discount * (1.0 - float(dones[idx + k]))
            if idx + n < b and not dones[idx + n - 1]:
                acc += disc * next_values[idx + n]
            returns.append(acc)
        if returns:
            weighted = 0.0
            lambda_sum = 0.0
            for i, ret in enumerate(returns[:-1]):
                w = (1 - lambda_) * lambda_**i
                weighted += w * ret
                lambda_sum += w
            last_w = lambda_ ** (len(returns) - 1)
            weighted += last_w * returns[-1]
            lambda_sum += last_w
            out[idx] = weighted / (lambda_sum + 1e-8)
        else:
            cont = discount * (1.0 - float(dones[idx]))
            if exclude_immediate_rewards:
                out[idx] = cont * next_values[idx]
            else:
                out[idx] = rewards[idx] + cont * next_values[idx]
    return out


def _compare(b, n_steps, seed, exclude=False, done_prob=0.2):
    rng = np.random.default_rng(seed)
    rewards = rng.normal(size=b).astype(np.float32)
    values = rng.normal(size=b).astype(np.float32)
    next_values = rng.normal(size=b).astype(np.float32)
    dones = (rng.random(b) < done_prob).astype(np.float32)
    expected = reference_lambda_returns(
        rewards, values, next_values, dones, 0.99, 0.95, n_steps, exclude
    )
    actual = compute_lambda_returns(
        jnp.asarray(rewards),
        jnp.asarray(values),
        jnp.asarray(next_values),
        jnp.asarray(dones, jnp.bool_),
        discount=0.99,
        lambda_=0.95,
        n_steps=n_steps,
        exclude_immediate_rewards=exclude,
    )
    np.testing.assert_allclose(np.asarray(actual), expected, rtol=2e-4, atol=2e-5)


def test_matches_reference_basic():
    _compare(b=32, n_steps=5, seed=0)


def test_matches_reference_no_dones():
    _compare(b=16, n_steps=5, seed=1, done_prob=0.0)


def test_matches_reference_all_dones():
    _compare(b=12, n_steps=5, seed=2, done_prob=1.0)


def test_matches_reference_exclude_immediate():
    _compare(b=24, n_steps=5, seed=3, exclude=True)


def test_matches_reference_small_batch():
    # batch smaller than n_steps exercises the truncated-window edge cases
    _compare(b=3, n_steps=5, seed=4)
    _compare(b=1, n_steps=5, seed=5)
    _compare(b=2, n_steps=5, seed=6, done_prob=0.5)


def test_matches_reference_long_window():
    _compare(b=64, n_steps=10, seed=7)
