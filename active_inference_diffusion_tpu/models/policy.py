"""Gaussian policy conditioned on diffusion latents, plus hierarchical variant.

TPU-native counterpart of the reference's policy networks
(reference: active_inference_diffusion/models/policy_networks.py:12-248).
Sampling takes explicit PRNG keys; distributions are returned as (mean, log_std)
pairs with pure helper functions rather than distribution objects.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .common import orthogonal_init


class PolicyDist(NamedTuple):
    """Diagonal Gaussian policy distribution parameters."""

    mean: jnp.ndarray  # (B, A)
    log_std: jnp.ndarray  # (B, A)

    @property
    def std(self) -> jnp.ndarray:
        return jnp.exp(self.log_std)

    def sample(self, key: jax.Array) -> jnp.ndarray:
        """Reparameterized sample (reference: policy_networks.py:135)."""
        eps = jax.random.normal(key, self.mean.shape, dtype=self.mean.dtype)
        return self.mean + self.std * eps

    def log_prob(self, action: jnp.ndarray) -> jnp.ndarray:
        """Summed per-dimension Gaussian log-prob (reference: :144)."""
        var = jnp.exp(2.0 * self.log_std)
        logp = -0.5 * ((action - self.mean) ** 2 / var + 2.0 * self.log_std + math.log(2 * math.pi))
        return jnp.sum(logp, axis=-1)

    def entropy(self) -> jnp.ndarray:
        """Summed per-dimension entropy (reference: :148-151 sums entropy over dims)."""
        per_dim = 0.5 * (1.0 + math.log(2 * math.pi)) + self.log_std
        return jnp.sum(per_dim, axis=-1)


def gaussian_kl(p: PolicyDist, q: PolicyDist) -> jnp.ndarray:
    """KL(p || q) of two diagonal Gaussians, summed over action dims -> (B,).

    Used by the policy-EMA anchor (ActiveInferenceConfig.policy_anchor_weight)
    on the pre-tanh distributions: tanh is a fixed bijection, so the KL of
    the squashed policies equals the KL of the base Gaussians."""
    var_p = jnp.exp(2.0 * p.log_std)
    var_q = jnp.exp(2.0 * q.log_std)
    kl = (
        q.log_std
        - p.log_std
        + (var_p + (p.mean - q.mean) ** 2) / (2.0 * var_q)
        - 0.5
    )
    return jnp.sum(kl, axis=-1)


def tanh_squash_log_prob(log_prob: jnp.ndarray, pre_tanh_action: jnp.ndarray) -> jnp.ndarray:
    """Tanh-squashing log-prob correction (reference: policy_networks.py:140-142)."""
    correction = 2.0 * (math.log(2.0) - pre_tanh_action - jax.nn.softplus(-2.0 * pre_tanh_action))
    return log_prob - jnp.sum(correction, axis=-1)


class DiffusionConditionedPolicy(nn.Module):
    """Gaussian policy p(a|z) (reference: models/policy_networks.py:12-151)."""

    latent_dim: int
    action_dim: int
    hidden_dim: int = 256
    num_layers: int = 3
    log_std_min: float = -20.0
    log_std_max: float = 2.0
    use_state_dependent_std: bool = True
    squash_output: bool = False

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> PolicyDist:
        xavier = nn.initializers.xavier_uniform()

        # Latent encoder (reference :42-47)
        h = nn.Dense(self.hidden_dim, kernel_init=xavier, name="enc_fc1")(z)
        h = nn.LayerNorm(name="enc_ln")(h)
        h = nn.relu(h)
        h = nn.Dense(self.hidden_dim, kernel_init=xavier, name="enc_fc2")(h)

        # Residual trunk (reference :50-57, 112-114)
        t = h
        for i in range(self.num_layers):
            t = nn.Dense(self.hidden_dim, kernel_init=xavier, name=f"trunk_fc{i}")(t)
            t = nn.LayerNorm(name=f"trunk_ln{i}")(t)
            t = nn.relu(t)
        h = h + t

        # Mean head (reference :60-64, orthogonal final init :79)
        m = nn.Dense(self.hidden_dim // 2, kernel_init=xavier, name="mean_fc1")(h)
        m = nn.relu(m)
        mean = nn.Dense(self.action_dim, kernel_init=orthogonal_init(1.0), name="mean_fc2")(m)

        # Std head (reference :66-74)
        if self.use_state_dependent_std:
            s = nn.Dense(self.hidden_dim // 2, kernel_init=xavier, name="std_fc1")(h)
            s = nn.relu(s)
            log_std = nn.Dense(
                self.action_dim, kernel_init=orthogonal_init(1.0), name="std_fc2"
            )(s)
        else:
            log_std_param = self.param(
                "log_std", nn.initializers.zeros, (self.action_dim,)
            )
            log_std = jnp.broadcast_to(log_std_param, mean.shape)

        log_std = jnp.clip(log_std, self.log_std_min, self.log_std_max)
        return PolicyDist(mean=mean, log_std=log_std)


def sample_action(
    dist: PolicyDist,
    key: Optional[jax.Array],
    deterministic: bool = False,
    squash: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sample an action and compute its log-prob (reference: policy_networks.py:129-146)."""
    if deterministic or key is None:
        pre_action = dist.mean
    else:
        pre_action = dist.sample(key)
    log_prob = dist.log_prob(pre_action)
    if squash:
        action = jnp.tanh(pre_action)
        log_prob = tanh_squash_log_prob(log_prob, pre_action)
    else:
        action = pre_action
    return action, log_prob


class HierarchicalDiffusionPolicy(nn.Module):
    """Hierarchical policy with latent subgoals and GRU temporal abstraction
    (reference: models/policy_networks.py:154-248; the reference uses an LSTM,
    unused by any agent — here a GRU cell for the same role, scan-friendly).
    """

    latent_dim: int
    action_dim: int
    num_levels: int = 3
    hidden_dim: int = 256

    def setup(self):
        self.policies = [
            DiffusionConditionedPolicy(
                latent_dim=self.latent_dim,
                action_dim=self.action_dim if i == 0 else self.latent_dim,
                hidden_dim=self.hidden_dim,
                use_state_dependent_std=True,
                name=f"level_{i}",
            )
            for i in range(self.num_levels)
        ]
        self.temporal_cells = [
            nn.GRUCell(features=self.latent_dim, name=f"gru_{i}")
            for i in range(self.num_levels - 1)
        ]

    def initial_carry(self, batch_size: int) -> Tuple[jnp.ndarray, ...]:
        return tuple(
            jnp.zeros((batch_size, self.latent_dim)) for _ in range(self.num_levels - 1)
        )

    def __call__(
        self,
        z: jnp.ndarray,
        key: jax.Array,
        carry: Optional[Tuple[jnp.ndarray, ...]] = None,
        level: int = 0,
    ):
        if carry is None:
            carry = self.initial_carry(z.shape[0])
        new_carry = list(carry)
        current = z
        action, log_prob = None, None
        for i in range(self.num_levels - 1, level - 1, -1):
            if i < self.num_levels - 1:
                new_c, current = self.temporal_cells[i](carry[i], current)
                new_carry[i] = new_c
            key, sub = jax.random.split(key)
            dist = self.policies[i](current)
            action, log_prob = sample_action(dist, sub)
            if i > level:
                current = action
        return action, log_prob, tuple(new_carry)
