"""Standalone variational free energy with learnable sensory precision.

TPU-native counterpart of the reference's ``FreeEnergyComputation``
(reference: active_inference_diffusion/core/free_energy.py:11-101):
F = Complexity - Accuracy + score regularizer. The precision parameter and
its heuristic update rule are explicit state (log_precision scalar) rather
than a module buffer.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax.numpy as jnp


def init_free_energy_state(precision_init: float = 1.0) -> jnp.ndarray:
    """Returns the learnable log-precision scalar (reference :20-24)."""
    return jnp.log(jnp.asarray(precision_init, jnp.float32))


def compute_free_energy(
    log_precision: jnp.ndarray,
    states: jnp.ndarray,
    observations: jnp.ndarray,
    score_fn: Callable[[jnp.ndarray, jnp.ndarray, jnp.ndarray], jnp.ndarray],
    current_time: float = 0.0,
    prior_mean: Optional[jnp.ndarray] = None,
    prior_std: float = 1.0,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """F = complexity - accuracy + score regularizer (reference :30-91)."""
    batch_size = states.shape[0]
    precision = jnp.exp(log_precision)
    if prior_mean is None:
        prior_mean = jnp.zeros_like(states)

    complexity = jnp.mean(
        0.5 * jnp.sum((states - prior_mean) ** 2 / (prior_std**2), axis=-1)
    )
    observation_error = jnp.sum((observations - states) ** 2, axis=-1)
    accuracy = -0.5 * precision * jnp.mean(observation_error)

    t = jnp.full((batch_size,), current_time, dtype=states.dtype)
    score = score_fn(states, t, observations)
    score_reg = 0.01 * jnp.mean(jnp.sum(score**2, axis=-1))

    free_energy = complexity - accuracy + score_reg
    info = {
        "complexity": complexity,
        "accuracy": -accuracy,
        "observation_error": jnp.mean(observation_error),
        "score_regularization": score_reg,
        "precision": precision,
    }
    return free_energy, info


def update_precision(
    log_precision: jnp.ndarray,
    complexity: jnp.ndarray,
    accuracy: jnp.ndarray,
) -> jnp.ndarray:
    """Heuristic precision adaptation (reference :93-101)."""
    precision_error = jnp.clip(complexity - accuracy, -1.0, 1.0)
    return jnp.clip(log_precision + 0.01 * precision_error, -3.0, 3.0)
