"""Pure-JAX on-device environments and the fused rollout path.

No reference counterpart: the reference steps Gymnasium MuJoCo on CPU worker
processes (SURVEY.md section 2.3). Here environments whose physics is
expressible in JAX run *inside* the jitted program — thousands of vmapped env
instances, zero host<->device transfer, with action selection fused into the
same XLA program (``fused_collect``). This is the architecture MJX envs plug
into (envs/mjx_env.py) when mujoco-mjx is installed.

Included analytic envs:
- ``Pendulum``: exact port of Gymnasium Pendulum-v1 dynamics/reward
  (cross-validated against gymnasium in tests).
- ``PointMass2D``: force-controlled point mass reaching a target.
- ``Reacher2Link``: torque-controlled two-link arm (simplified inertia).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct


class EnvState(struct.PyTreeNode):
    physics: jnp.ndarray  # env-specific physical state vector
    obs: jnp.ndarray
    reward: jnp.ndarray  # scalar
    done: jnp.ndarray  # bool scalar: terminated OR truncated (episode over)
    step_count: jnp.ndarray  # int32 scalar
    key: jax.Array
    # True only for real MDP termination (unhealthy state etc.), False for
    # pure time-limit truncation — the Gymnasium terminated/truncated split.
    # Value bootstrapping and the continuation head must use THIS, not
    # ``done`` (training c(z) on time-limit dones wrongly zeroes the imagined
    # bootstrap near episode end). Analytic envs never terminate.
    terminated: jnp.ndarray = None


class JaxEnv:
    """Static env spec; ``reset``/``step`` are pure functions of EnvState."""

    observation_dim: int
    action_dim: int
    max_episode_steps: int = 1000
    # Scalars for symmetric analytic envs; adapters with heterogeneous or
    # asymmetric actuator ranges (MJXEnv) store per-dimension arrays here —
    # consumers must map normalized actions through ``scale_action``, not
    # multiply by ``action_high``.
    action_low = -1.0
    action_high = 1.0

    def scale_action(self, action: jnp.ndarray) -> jnp.ndarray:
        """Affine-map a normalized action in [-1, 1] to the env's action
        space. Supports per-dimension and asymmetric (low != -high) bounds;
        for the symmetric case this is exactly ``action * action_high``."""
        low = jnp.asarray(self.action_low, jnp.float32)
        high = jnp.asarray(self.action_high, jnp.float32)
        return low + (action + 1.0) * 0.5 * (high - low)

    def reset(self, key: jax.Array) -> EnvState:
        raise NotImplementedError

    def step(self, state: EnvState, action: jnp.ndarray) -> EnvState:
        raise NotImplementedError

    def step_autoreset(
        self, state: EnvState, action: jnp.ndarray
    ) -> Tuple[EnvState, jnp.ndarray]:
        """Step; if the episode ended, start a fresh one (pure autoreset).

        Returns ``(state, true_next_obs)``: the carried state's obs is the
        FRESH episode's first obs wherever done, but the transition's
        next_observation must be the TRUE successor — bootstrapping value
        targets from an unrelated reset state at every time-limit boundary
        corrupts them (the host collector stores info['final_observation']
        for exactly this reason, parallel/collect.py:122-128)."""
        next_state = self.step(state, action)
        reset_key, carry_key = jax.random.split(next_state.key)
        fresh = self.reset(reset_key)
        done = next_state.done
        merged = jax.tree_util.tree_map(
            lambda a, b: jnp.where(done, a, b), fresh, next_state
        )
        # keep the reward/done/terminated of the finishing step, and a fresh
        # key (the merged tree took the fresh env's fields wherever done)
        merged = merged.replace(
            reward=next_state.reward,
            done=next_state.done,
            terminated=next_state.terminated,
            key=carry_key,
        )
        return merged, next_state.obs


class Pendulum(JaxEnv):
    """Gymnasium Pendulum-v1 dynamics, exactly
    (gymnasium/envs/classic_control/pendulum.py semantics)."""

    observation_dim = 3
    action_dim = 1
    max_episode_steps = 200
    action_low = -2.0
    action_high = 2.0

    max_speed = 8.0
    max_torque = 2.0
    dt = 0.05
    g = 10.0
    m = 1.0
    length = 1.0

    def _obs(self, theta, thetadot):
        return jnp.stack([jnp.cos(theta), jnp.sin(theta), thetadot])

    def reset(self, key: jax.Array) -> EnvState:
        state_key, carry_key = jax.random.split(key)
        high = jnp.array([jnp.pi, 1.0])
        physics = jax.random.uniform(state_key, (2,), minval=-high, maxval=high)
        return EnvState(
            physics=physics,
            obs=self._obs(physics[0], physics[1]),
            reward=jnp.zeros(()),
            done=jnp.zeros((), bool),
            step_count=jnp.zeros((), jnp.int32),
            key=carry_key,
            terminated=jnp.zeros((), bool),
        )

    def step(self, state: EnvState, action: jnp.ndarray) -> EnvState:
        theta, thetadot = state.physics[0], state.physics[1]
        u = jnp.clip(action[0], -self.max_torque, self.max_torque)

        angle_norm = ((theta + jnp.pi) % (2 * jnp.pi)) - jnp.pi
        costs = angle_norm**2 + 0.1 * thetadot**2 + 0.001 * u**2

        newthetadot = (
            thetadot
            + (
                3.0 * self.g / (2.0 * self.length) * jnp.sin(theta)
                + 3.0 / (self.m * self.length**2) * u
            )
            * self.dt
        )
        newthetadot = jnp.clip(newthetadot, -self.max_speed, self.max_speed)
        newtheta = theta + newthetadot * self.dt

        step_count = state.step_count + 1
        done = step_count >= self.max_episode_steps
        physics = jnp.stack([newtheta, newthetadot])
        return state.replace(
            physics=physics,
            obs=self._obs(newtheta, newthetadot),
            reward=-costs,
            done=done,
            step_count=step_count,
        )


class PointMass2D(JaxEnv):
    """Force-controlled point mass; reward = -distance to target - ctrl cost."""

    observation_dim = 6  # pos(2) vel(2) target(2)
    action_dim = 2
    max_episode_steps = 200
    dt = 0.05
    damping = 0.95

    def reset(self, key: jax.Array) -> EnvState:
        k1, k2, carry_key = jax.random.split(key, 3)
        pos = jax.random.uniform(k1, (2,), minval=-1.0, maxval=1.0)
        target = jax.random.uniform(k2, (2,), minval=-1.0, maxval=1.0)
        physics = jnp.concatenate([pos, jnp.zeros(2), target])
        return EnvState(
            physics=physics,
            obs=physics,
            reward=jnp.zeros(()),
            done=jnp.zeros((), bool),
            step_count=jnp.zeros((), jnp.int32),
            key=carry_key,
            terminated=jnp.zeros((), bool),
        )

    def step(self, state: EnvState, action: jnp.ndarray) -> EnvState:
        pos, vel, target = state.physics[:2], state.physics[2:4], state.physics[4:6]
        force = jnp.clip(action, -1.0, 1.0)
        vel = self.damping * vel + force * self.dt
        pos = jnp.clip(pos + vel * self.dt, -2.0, 2.0)
        dist = jnp.sqrt(jnp.sum((pos - target) ** 2) + 1e-12)
        reward = -dist - 0.01 * jnp.sum(force**2)
        step_count = state.step_count + 1
        done = step_count >= self.max_episode_steps
        physics = jnp.concatenate([pos, vel, target])
        return state.replace(
            physics=physics, obs=physics, reward=reward,
            done=done, step_count=step_count,
        )


class Reacher2Link(JaxEnv):
    """Torque-controlled planar 2-link arm (unit links, simplified diagonal
    inertia), reaching a random target. obs = [cos q, sin q, qdot, target]."""

    observation_dim = 8
    action_dim = 2
    max_episode_steps = 200
    dt = 0.05
    damping = 0.9

    def _obs(self, q, qdot, target):
        return jnp.concatenate([jnp.cos(q), jnp.sin(q), qdot, target])

    def _fingertip(self, q):
        x = jnp.cos(q[0]) * 0.5 + jnp.cos(q[0] + q[1]) * 0.5
        y = jnp.sin(q[0]) * 0.5 + jnp.sin(q[0] + q[1]) * 0.5
        return jnp.stack([x, y])

    def reset(self, key: jax.Array) -> EnvState:
        k1, k2, carry_key = jax.random.split(key, 3)
        q = jax.random.uniform(k1, (2,), minval=-jnp.pi, maxval=jnp.pi)
        r = jax.random.uniform(k2, (2,), minval=-0.8, maxval=0.8)
        physics = jnp.concatenate([q, jnp.zeros(2), r])
        return EnvState(
            physics=physics,
            obs=self._obs(q, jnp.zeros(2), r),
            reward=jnp.zeros(()),
            done=jnp.zeros((), bool),
            step_count=jnp.zeros((), jnp.int32),
            key=carry_key,
            terminated=jnp.zeros((), bool),
        )

    def step(self, state: EnvState, action: jnp.ndarray) -> EnvState:
        q, qdot, target = state.physics[:2], state.physics[2:4], state.physics[4:6]
        torque = jnp.clip(action, -1.0, 1.0)
        qdot = self.damping * qdot + torque * self.dt * 10.0
        q = q + qdot * self.dt
        tip = self._fingertip(q)
        dist = jnp.sqrt(jnp.sum((tip - target) ** 2) + 1e-12)
        reward = -dist - 0.01 * jnp.sum(torque**2)
        step_count = state.step_count + 1
        done = step_count >= self.max_episode_steps
        physics = jnp.concatenate([q, qdot, target])
        return state.replace(
            physics=physics, obs=self._obs(q, qdot, target), reward=reward,
            done=done, step_count=step_count,
        )


ENV_REGISTRY = {
    "Pendulum-v1": Pendulum,
    "PointMass2D-v0": PointMass2D,
    "Reacher2Link-v0": Reacher2Link,
}


def make_jax_env(name: str) -> JaxEnv:
    if name in ENV_REGISTRY:
        return ENV_REGISTRY[name]()
    if name in ("PendulumPixels-v0", "ReacherPixels-v0"):
        # lazy import (pixel_render imports this module)
        from .pixel_render import PendulumPixels, ReacherPixels

        cls = PendulumPixels if name == "PendulumPixels-v0" else ReacherPixels
        return cls()
    if name.endswith("PlanarPixels-v0"):
        # On-device rendered pixel variant of the planar MuJoCo tasks
        # (tracking camera, rasterized capsules; envs/pixel_render.py).
        from .pixel_render import make_planar_pixels

        return make_planar_pixels(name.replace("PlanarPixels-v0", "-v4"))
    if name.endswith("3DPixels-v0"):
        # On-device rendered pixel variant of the 3D Ant/Humanoid family
        # (perspective tracking camera; envs/pixel_render.py).
        from .pixel_render import make_rigid3d_pixels

        return make_rigid3d_pixels(name.replace("3DPixels-v0", "-v4"))
    if name.endswith("Planar-v0"):
        # From-scratch planar physics for the 2D MuJoCo tasks: exact smooth
        # dynamics + exact -v4 task semantics, penalty-approximate contacts
        # (envs/planar.py). Distinct names keep the approximation explicit —
        # returns are not directly comparable to gym.make.
        from .planar import PlanarMJCEnv

        return PlanarMJCEnv(name.replace("Planar-v0", "-v4"))
    if name in ("Ant3D-v0", "Humanoid3D-v0", "HumanoidStandup3D-v0"):
        # 3D sibling (free joint + hinges, envs/rigid3d.py): exact smooth
        # dynamics on the quaternion manifold, penalty contacts,
        # constraint-based joint limits.
        from .rigid3d import Rigid3DEnv

        return Rigid3DEnv(name.replace("3D-v0", "-v4"))
    # MuJoCo tasks route to the MJX adapter (exact Gymnasium -v4 semantics,
    # envs/mujoco_tasks.py); raises a clear ImportError when mujoco-mjx is
    # not installed.
    from .mujoco_tasks import TASK_SPECS

    if name in TASK_SPECS:
        from .mjx_env import MJXEnv

        return MJXEnv(name)
    raise ValueError(
        f"Unknown JAX env {name}; have "
        f"{sorted(ENV_REGISTRY) + ['PendulumPixels-v0', 'ReacherPixels-v0'] + sorted(TASK_SPECS)} "
        "plus HopperPlanar-v0/Walker2dPlanar-v0/HalfCheetahPlanar-v0 "
        "(on-device planar physics, envs/planar.py)"
    )


class Transitions(NamedTuple):
    """(T, N, ...) batched transition arrays from a fused rollout."""

    observations: jnp.ndarray
    actions: jnp.ndarray
    rewards: jnp.ndarray
    next_observations: jnp.ndarray
    dones: jnp.ndarray  # terminated | truncated (episode boundaries)
    # Real MDP termination only (False at pure time limits). This is what
    # belongs in replay ``dones``: the value bootstrap and the continuation
    # head must see time-limit states as continuing (the host collector
    # already stores terminated-only, parallel/collect.py:128).
    terminateds: jnp.ndarray


def fused_collect_stateful(
    env: JaxEnv,
    policy_fn: Callable,
    key: jax.Array,
    num_envs: int,
    num_steps: int,
    policy_state,
    env_states: Optional[EnvState] = None,
) -> Tuple[Transitions, EnvState, object]:
    """``fused_collect`` with a policy that carries state across env steps.

    ``policy_fn(obs_batch, key, policy_state, reset_mask) ->
    (action_batch, policy_state)``; ``reset_mask`` is (N,) bool, True for
    envs whose previous step ended an episode (the policy decides how to
    reinitialize its per-env state — e.g. a fresh prior draw for warm-start
    beliefs). The canonical use is warm-start partial denoising
    (``make_warm_rollout_policy``): carrying the previous control step's
    belief lets each step run a short truncated sweep instead of the full
    K-step reverse diffusion — the fused analogue of the host path's
    ``DiffusionStateAgent.act_warm`` / ``collect_warm_start``.

    Returns ``(transitions, env_states, policy_state)``.
    """
    reset_key, scan_key = jax.random.split(key)
    if env_states is None:
        env_states = jax.vmap(env.reset)(jax.random.split(reset_key, num_envs))

    step_env = jax.vmap(env.step_autoreset)

    def body(carry, step_key):
        states, pstate = carry
        obs = states.obs
        act_key, _ = jax.random.split(step_key)
        # states.done marks envs that were autoreset into a fresh episode at
        # the END of the previous step — exactly the envs whose carried
        # policy state refers to a dead episode.
        actions, pstate = policy_fn(obs, act_key, pstate, states.done)
        next_states, true_next_obs = step_env(states, actions)
        transition = Transitions(
            observations=obs,
            actions=actions,
            rewards=next_states.reward,
            next_observations=true_next_obs,
            dones=next_states.done,
            terminateds=next_states.terminated,
        )
        return (next_states, pstate), transition

    (final_states, policy_state), transitions = jax.lax.scan(
        body, (env_states, policy_state), jax.random.split(scan_key, num_steps)
    )
    return transitions, final_states, policy_state


def fused_collect(
    env: JaxEnv,
    policy_fn: Callable[[jnp.ndarray, jax.Array], jnp.ndarray],
    key: jax.Array,
    num_envs: int,
    num_steps: int,
    env_states: Optional[EnvState] = None,
) -> Tuple[Transitions, EnvState]:
    """Fully-fused on-device rollout: ``num_envs`` vmapped env instances
    stepped ``num_steps`` times inside one scan, with batched action
    selection fused in. This single function replaces the reference's
    SubprocVectorEnv/ShmemVectorEnv/GPUCentralizedCollector process machinery
    (reference: envs/vec_env.py, utils/async_collector.py) for JAX-native
    envs — there is no process boundary left to cross.

    ``policy_fn(obs_batch, key) -> action_batch`` is typically the agent's
    diffusion-belief + policy program.
    """

    def stateless(obs, key_, _pstate, _reset_mask):
        return policy_fn(obs, key_), ()

    transitions, final_states, _ = fused_collect_stateful(
        env, stateless, key, num_envs, num_steps, (), env_states=env_states
    )
    return transitions, final_states


def fused_eval(
    env: JaxEnv,
    policy_fn: Callable[[jnp.ndarray, jax.Array], jnp.ndarray],
    key: jax.Array,
    num_envs: int,
    num_steps: Optional[int] = None,
) -> jnp.ndarray:
    """Mean episodic return of ``policy_fn`` over ``num_envs`` fresh
    episodes, rolled entirely on device (counterpart of
    utils/training.evaluate_agent_batched for JAX-native envs; the
    reference evaluates host episodes serially, utils/training.py:15-69).

    Rolls exactly one episode per env (``num_steps`` defaults to
    ``env.max_episode_steps``, no autoreset); rewards after an env's
    ``done`` are masked out, so shorter-than-max episodes score correctly.
    Pass a deterministic ``policy_fn`` for eval semantics.
    """
    num_steps = env.max_episode_steps if num_steps is None else num_steps
    reset_key, scan_key = jax.random.split(key)
    states = jax.vmap(env.reset)(jax.random.split(reset_key, num_envs))
    step_env = jax.vmap(env.step)

    def body(carry, step_key):
        states, total, alive = carry
        actions = policy_fn(states.obs, step_key)
        next_states = step_env(states, actions)
        total = total + alive * next_states.reward
        alive = alive * (1.0 - next_states.done.astype(total.dtype))
        return (next_states, total, alive), None

    init = (states, jnp.zeros((num_envs,)), jnp.ones((num_envs,)))
    (_, total, _), _ = jax.lax.scan(
        body, init, jax.random.split(scan_key, num_steps)
    )
    return jnp.mean(total)


def add_action_noise(
    env: JaxEnv, action: jnp.ndarray, key: jax.Array, eps
) -> jnp.ndarray:
    """Host-collector exploration-noise semantics on a fused-rollout action:
    ``action + N(0,1) * eps * half_range``, clipped to the env bounds
    (``DiffusionStateAgent._act_impl``, agents/state_agent.py:109-118; the
    reference only ever collects through this noisy path,
    reference base_agent.py:173-179). ``eps`` is in [-1,1]-action units —
    scaled by the env's half-range so asymmetric actuator ranges get
    proportional noise. ``eps`` may be a traced scalar, so one compiled
    collect program serves an entire decay schedule."""
    low = jnp.asarray(env.action_low, jnp.float32)
    high = jnp.asarray(env.action_high, jnp.float32)
    half = (high - low) * 0.5
    noise = jax.random.normal(key, action.shape, action.dtype)
    return jnp.clip(action + noise * (eps * half), low, high)


def with_exploration_noise(
    policy_fn: Callable[[jnp.ndarray, jax.Array], jnp.ndarray],
    env: JaxEnv,
    eps,
) -> Callable[[jnp.ndarray, jax.Array], jnp.ndarray]:
    """Wrap a stateless rollout policy with exploration noise for
    ``fused_collect``. Round-4 forensics motivated this: the fused path
    previously explored ONLY through the policy's own stochasticity, which
    ``auto_entropy`` anneals toward zero (entropy_scale reached 1e-6 in the
    512k fused Hopper run) — while every host-path success (Hopper 255-322)
    collected with eps=0.2 Gaussian action noise. Hop-class behaviors that
    need sustained non-greedy action sequences are undiscoverable without
    it."""

    def noisy(obs, key):
        pk, nk = jax.random.split(key)
        return add_action_noise(env, policy_fn(obs, pk), nk, eps)

    return noisy


def flatten_transitions(t: Transitions) -> Transitions:
    """(T, N, ...) -> (T*N, ...)."""
    return Transitions(
        *[x.reshape((-1,) + x.shape[2:]) for x in t]
    )


def _policy_head(core, env, params, latent, act_key, deterministic):
    """Shared tail of every rollout policy: policy dist -> (squashed) sample
    -> env action scaling."""
    from ..models.policy import sample_action

    dist = core.apply_policy(params["policy"], latent)
    action, _ = sample_action(
        dist, act_key, deterministic=deterministic, squash=core.policy_squash
    )
    return env.scale_action(jnp.clip(action, -1.0, 1.0))


def make_rollout_policy(
    core,
    env: JaxEnv,
    *,
    deterministic: bool = False,
    act_from_posterior: bool = False,
    deterministic_beliefs: bool = False,
    num_steps: Optional[int] = None,
    encode_fn: Optional[Callable] = None,
):
    """The canonical fused-rollout policy: belief (diffusion sweep or
    amortized posterior) -> policy head -> squash -> env action scaling.

    Returns ``policy_fn(params, obs_batch, key) -> action_batch`` — the
    signature ``parallel/dist_train.make_sharded_fused_collect`` expects;
    close over params (``lambda obs, k: policy_fn(params, obs, k)``) for
    ``fused_collect``. The key is split between the belief sweep and the
    action sample (correlating them biases exploration — same discipline as
    ``agents/state_agent._act_impl``), squashing matches training/imagination
    (collect-train action-distribution mismatch otherwise), and actions map
    through ``env.scale_action`` so asymmetric/heterogeneous actuator ranges
    (MJX tasks) are respected.

    ``encode_fn(params, obs, key) -> features`` prepends an observation
    encoder (pixel agents: ``lambda p, o, k: agent._apply_encoder(p, o, k,
    augment=False, train=False)``).
    """

    def policy_fn(params, obs, key):
        enc_key, belief_key, act_key = jax.random.split(key, 3)
        if encode_fn is not None:
            obs = encode_fn(params, obs, enc_key)
        if act_from_posterior:
            latent = core.sample_posterior(
                params["posterior"], belief_key, obs,
                deterministic=deterministic or deterministic_beliefs,
            )
        else:
            belief = core.generate_beliefs(
                params, belief_key, obs,
                num_steps=num_steps,
                compute_reconstruction=False,
                deterministic=deterministic or deterministic_beliefs,
            )
            latent = belief.latent
        return _policy_head(core, env, params, latent, act_key, deterministic)

    return policy_fn


def make_warm_rollout_policy(
    core,
    env: JaxEnv,
    *,
    num_steps: int,
    deterministic: bool = False,
    deterministic_beliefs: bool = False,
    encode_fn: Optional[Callable] = None,
):
    """Warm-start variant of ``make_rollout_policy`` for
    ``fused_collect_stateful``: each control step's reverse sweep starts from
    the PREVIOUS step's belief (forward-noised to the truncation timestep)
    instead of pure noise, so ``num_steps`` can be far below the training K
    (measured K=20 -> 5 on the host path; cf. Falcon, arXiv:2503.00339).
    Envs flagged in ``reset_mask`` restart from a fresh standard-normal draw
    (q_sample maps N(0, I) to an exactly standard-normal sweep start) — the
    same discipline as ``DiffusionStateAgent._act_warm_impl``.

    Returns ``policy_fn(params, obs, key, prev_latent, reset_mask) ->
    (actions, latent)``; seed the scan carry with
    ``init_warm_state(key, num_envs, latent_dim)``.
    """

    def policy_fn(params, obs, key, prev_latent, reset_mask):
        enc_key, belief_key, act_key, reset_key = jax.random.split(key, 4)
        if encode_fn is not None:
            obs = encode_fn(params, obs, enc_key)
        fresh = jax.random.normal(reset_key, prev_latent.shape, prev_latent.dtype)
        z_prev = jnp.where(reset_mask[:, None], fresh, prev_latent)
        belief = core.generate_beliefs(
            params, belief_key, obs, num_steps=num_steps,
            compute_reconstruction=False, z_init=z_prev,
            deterministic=deterministic or deterministic_beliefs,
        )
        actions = _policy_head(
            core, env, params, belief.latent, act_key, deterministic
        )
        return actions, belief.latent

    return policy_fn


def init_warm_state(key: jax.Array, num_envs: int, latent_dim: int) -> jnp.ndarray:
    """Initial warm-start belief carry: standard-normal, i.e. every env's
    first sweep behaves exactly like a reset env's."""
    return jax.random.normal(key, (num_envs, latent_dim))
