"""Multi-chip training: GSPMD data/tensor parallel train step and an explicit
shard_map + psum path for batched inference.

No reference counterpart (the reference is single-GPU; SURVEY.md section 2.6).

Two styles, both idiomatic JAX:

1. ``make_dp_train_step``: the agent's full jitted train step compiled with
   NamedShardings — train-state replicated (or TP-sharded for the big MLP
   kernels), batch sharded over ``dp``. GSPMD inserts the gradient
   all-reduces over ICI automatically; this is mathematically exact data
   parallelism of the single-chip step.

2. ``make_sharded_act``: collection-time batched inference under
   ``shard_map`` — each device runs the full reverse-diffusion + policy
   program on its batch shard; no collectives needed (embarrassingly
   parallel), demonstrating the explicit-SPMD style.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from .mesh import batch_sharding, param_shardings, replicated


def make_dp_train_step(
    agent,
    mesh: Mesh,
    tp_size: int = 1,
    donate: bool = True,
) -> Callable:
    """Compile the agent's train step for a (dp, tp) mesh.

    Returns ``train_step(state, batch) -> (state, metrics)`` where ``state``
    lives replicated/TP-sharded and ``batch`` is dp-sharded. Call
    ``place_state``/``place_batch`` (also returned) to install shardings.
    """
    rep = replicated(mesh)
    bsh = batch_sharding(mesh, "dp")

    def state_shardings(state):
        # params (and their EMA mirrors) may be TP-sharded; every other
        # train-state field is replicated — resolved generically over the
        # dataclass fields so new AgentTrainState fields need no edit here.
        def spec_like_params(tree):
            return param_shardings(mesh, tree, tp_size)

        special = {
            "params": spec_like_params(state.params),
            "ema_score": spec_like_params(state.ema_score),
            "target_value": spec_like_params(state.target_value),
        }
        kwargs = {
            f.name: (
                special[f.name]
                if f.name in special
                else jax.tree_util.tree_map(lambda _: rep, getattr(state, f.name))
            )
            for f in dataclasses.fields(state)
        }
        return state.replace(**kwargs)

    def place_state(state):
        sh = state_shardings(state)
        return jax.tree_util.tree_map(jax.device_put, state, sh)

    def place_batch(batch):
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, bsh), batch)

    compiled: Dict[str, Any] = {}

    def train_step(state, batch):
        if "fn" not in compiled:
            sh = state_shardings(state)
            batch_sh = jax.tree_util.tree_map(lambda _: bsh, batch)
            compiled["fn"] = jax.jit(
                agent._train_step_impl,
                in_shardings=(sh, batch_sh),
                out_shardings=(sh, None),
                donate_argnums=(0,) if donate else (),
            )
        return compiled["fn"](state, batch)

    return train_step, place_state, place_batch


def make_sharded_act(agent, mesh: Mesh, num_steps: Optional[int] = None) -> Callable:
    """shard_map batched action selection: each device denoises its batch
    shard independently (collection is embarrassingly parallel across envs)."""
    from jax import shard_map

    def local_act(params, key, obs, noise_scale):
        # fold in the device index so shards draw independent randomness
        idx = jax.lax.axis_index("dp")
        key = jax.random.fold_in(key, idx)
        return agent._act_impl(
            params, key, obs, noise_scale, deterministic=False, num_steps=num_steps
        )

    sharded = shard_map(
        local_act,
        mesh=mesh,
        in_specs=(P(), P(), P("dp"), P()),
        out_specs=P("dp"),
        check_vma=False,
    )
    return jax.jit(sharded)


def make_sharded_fused_collect(
    env,
    policy_fn: Callable,
    mesh: Mesh,
    num_envs: int,
    num_steps: int,
    axis: str = "dp",
    steps_per_dispatch: Optional[int] = None,
    stateful: bool = False,
) -> Callable:
    """Fused on-device rollout sharded over the mesh.

    Each device rolls ``num_envs / mesh.shape[axis]`` env instances through
    ``envs/jax_envs.fused_collect`` — embarrassingly parallel, zero
    collectives during the rollout (env instances are independent; the ICI
    stays free for the train step's gradient reductions). The returned
    ``Transitions`` arrive sharded over ``axis`` on their env dimension —
    the dp layout ``make_dp_train_step``'s ``place_batch`` produces, so
    collect -> train crosses no resharding boundary.

    ``policy_fn(params, obs, key) -> actions`` (params are replicated).
    Returns ``collect(params, key, env_states=None) -> (transitions,
    env_states)``; per-device randomness is decorrelated by folding the
    device index into the key (same pattern as ``make_sharded_act``).

    ``steps_per_dispatch`` bounds how many rollout steps run as ONE device
    dispatch: longer rollouts are split into that many-step dispatches whose
    transitions are concatenated on the time axis (still device-resident,
    still sharded). Single multi-minute dispatches get the remote TPU worker
    killed on this deployment (same rule as
    ``TrainingConfig.epoch_chunk_updates`` for the train path) — set this
    whenever ``num_steps`` × per-step cost can exceed ~1 min.

    ``stateful=True`` switches to the warm-start protocol of
    ``envs/jax_envs.fused_collect_stateful``: ``policy_fn(params, obs, key,
    policy_state, reset_mask) -> (actions, policy_state)``, with the per-env
    policy state (e.g. the carried belief of ``make_warm_rollout_policy``)
    sharded over ``axis`` alongside the envs. The returned ``collect`` then
    takes and returns ``(transitions, env_states, policy_state)``.
    """
    from jax import shard_map

    from ..envs.jax_envs import Transitions, fused_collect, fused_collect_stateful

    n = int(mesh.shape[axis])
    if num_envs % n != 0:
        raise ValueError(
            f"num_envs {num_envs} must divide over mesh axis {axis}={n}"
        )
    local = num_envs // n
    chunk = num_steps if steps_per_dispatch is None else int(steps_per_dispatch)
    if num_steps % chunk != 0:
        raise ValueError(
            f"num_steps {num_steps} must be a multiple of "
            f"steps_per_dispatch {chunk}"
        )
    num_dispatches = num_steps // chunk

    if stateful:
        inner_policy = policy_fn
    else:
        # Lift the stateless policy into the stateful protocol with an empty
        # (leafless) carry — it threads through shard_map/scan for free.
        def inner_policy(params, obs, k, ps, rm):
            return policy_fn(params, obs, k), ps

    def _local(params, key, env_states, pstate):
        key = jax.random.fold_in(key, jax.lax.axis_index(axis))
        return fused_collect_stateful(
            env,
            lambda obs, k, ps, rm: inner_policy(params, obs, k, ps, rm),
            key, local, chunk, pstate, env_states=env_states,
        )

    out_specs = (P(None, axis), P(axis), P(axis))
    with_states = jax.jit(
        shard_map(
            _local, mesh=mesh,
            in_specs=(P(), P(), P(axis), P(axis)), out_specs=out_specs,
            check_vma=False,
        )
    )
    fresh = jax.jit(
        shard_map(
            lambda params, key, pstate: _local(params, key, None, pstate),
            mesh=mesh,
            in_specs=(P(), P(), P(axis)), out_specs=out_specs,
            check_vma=False,
        )
    )

    def collect_stateful(params, key, policy_state, env_states=None):
        chunks = []
        for i in range(num_dispatches):
            ckey = jax.random.fold_in(key, i)
            if env_states is None:
                transitions, env_states, policy_state = fresh(
                    params, ckey, policy_state
                )
            else:
                transitions, env_states, policy_state = with_states(
                    params, ckey, env_states, policy_state
                )
            chunks.append(transitions)
        if num_dispatches > 1:
            transitions = Transitions(
                *[jnp.concatenate(parts, axis=0) for parts in zip(*chunks)]
            )
        else:
            transitions = chunks[0]
        return transitions, env_states, policy_state

    if stateful:
        return collect_stateful

    def collect(params, key, env_states=None):
        transitions, env_states, _ = collect_stateful(
            params, key, (), env_states=env_states
        )
        return transitions, env_states

    return collect
