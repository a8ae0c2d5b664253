"""Vectorized environments: threaded (primary), subprocess, and shared-memory.

Counterparts of the reference's vec-env stack
(reference: active_inference_diffusion/envs/vec_env.py:21-690). The reference
parallelizes env stepping across *processes* because PyTorch inference and
MuJoCo physics contend for the GIL. MuJoCo's ``mj_step`` releases the GIL, so
the TPU-native primary is ``ThreadedVectorEnv`` — same lock-step semantics,
zero serialization, shared address space. ``SubprocVectorEnv`` and
``ShmemVectorEnv`` are provided for API parity and for envs that do not
release the GIL.

All vec envs auto-reset a sub-env when its episode ends and report the final
observation in ``infos[i]['final_observation']``.
"""

from __future__ import annotations

import enum
import multiprocessing as mp
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable, List, Optional, Sequence

import cloudpickle
import numpy as np


class Commands(enum.Enum):
    """Worker command protocol (reference: envs/vec_env.py:21-29)."""

    RESET = 0
    STEP = 1
    CLOSE = 2
    GET_ATTR = 3
    SET_ATTR = 4
    SEED = 5
    RENDER = 6


class CloudpickleWrapper:
    """Ship env factories through spawn pickling
    (reference: envs/vec_env.py:32-45)."""

    def __init__(self, fn: Callable):
        self.fn = fn

    def __getstate__(self):
        return cloudpickle.dumps(self.fn)

    def __setstate__(self, data):
        self.fn = cloudpickle.loads(data)

    def __call__(self):
        return self.fn()


class BaseVectorEnv:
    """Shared surface: spaces, seeding, attribute fan-out
    (reference: envs/vec_env.py:267-418)."""

    def __init__(self, num_envs: int):
        self.num_envs = num_envs
        self.observation_space = None
        self.action_space = None
        self.closed = False

    def reset(self, seed: Optional[int] = None):
        raise NotImplementedError

    def step(self, actions: np.ndarray):
        raise NotImplementedError

    def close(self):
        raise NotImplementedError

    def __len__(self):
        return self.num_envs

    def __del__(self):
        if not self.closed:
            try:
                self.close()
            except Exception:
                pass


def _step_with_autoreset(env, action):
    obs, reward, terminated, truncated, info = env.step(action)
    done = terminated or truncated
    if done:
        info = dict(info)
        info["final_observation"] = obs
        obs, reset_info = env.reset()
        info["reset_info"] = reset_info
    return obs, reward, terminated, truncated, info


class ThreadedVectorEnv(BaseVectorEnv):
    """N envs stepped by a thread pool in lock-step.

    MuJoCo releases the GIL inside mj_step, so threads parallelize physics
    without the reference's pipe/pickle overhead (envs/vec_env.py:48-151)."""

    def __init__(self, env_fns: Sequence[Callable], num_threads: Optional[int] = None):
        super().__init__(len(env_fns))
        self.envs = [fn() for fn in env_fns]
        self.observation_space = self.envs[0].observation_space
        self.action_space = self.envs[0].action_space
        self._pool = ThreadPoolExecutor(max_workers=num_threads or len(env_fns))

    def reset(self, seed: Optional[int] = None):
        def do_reset(i_env):
            i, env = i_env
            kwargs = {"seed": seed + i} if seed is not None else {}
            return env.reset(**kwargs)

        results = list(self._pool.map(do_reset, enumerate(self.envs)))
        obs = np.stack([r[0] for r in results])
        infos = [r[1] for r in results]
        return obs, infos

    def step(self, actions: np.ndarray):
        assert len(actions) == self.num_envs, (
            f"expected {self.num_envs} actions, got {len(actions)}"
        )
        results = list(
            self._pool.map(
                lambda pair: _step_with_autoreset(pair[0], pair[1]),
                zip(self.envs, actions),
            )
        )
        obs = np.stack([r[0] for r in results])
        rewards = np.asarray([r[1] for r in results], dtype=np.float32)
        terminated = np.asarray([r[2] for r in results], dtype=bool)
        truncated = np.asarray([r[3] for r in results], dtype=bool)
        infos = [r[4] for r in results]
        return obs, rewards, terminated, truncated, infos

    def get_attr(self, name: str) -> List[Any]:
        return [getattr(env, name) for env in self.envs]

    def set_attr(self, name: str, value: Any):
        for env in self.envs:
            setattr(env, name, value)

    def render(self, **kwargs):
        return [env.render(**kwargs) for env in self.envs]

    def close(self):
        if self.closed:
            return
        for env in self.envs:
            env.close()
        self._pool.shutdown(wait=False)
        self.closed = True


def _subproc_worker(remote, parent_remote, env_fn_wrapper, shm_spec=None):
    """Worker loop (reference: envs/vec_env.py:48-151; shared-memory variant
    :154-264). ``shm_spec`` = (name, shape, dtype, index) writes observations
    into a shared block instead of the pipe."""
    import signal

    signal.signal(signal.SIGTERM, lambda *_: remote.close())
    parent_remote.close()
    env = env_fn_wrapper()

    shm_view = None
    shm = None
    if shm_spec is not None:
        from multiprocessing import shared_memory

        name, shape, dtype, index = shm_spec
        shm = shared_memory.SharedMemory(name=name)
        arr = np.ndarray(shape, dtype=dtype, buffer=shm.buf)
        shm_view = arr[index]

    def send_obs(obs, payload):
        if shm_view is not None:
            shm_view[...] = obs
            remote.send((None,) + payload)
        else:
            remote.send((obs,) + payload)

    try:
        while True:
            cmd, data = remote.recv()
            if cmd == Commands.RESET:
                obs, info = env.reset(**(data or {}))
                send_obs(obs, (info,))
            elif cmd == Commands.STEP:
                obs, reward, terminated, truncated, info = _step_with_autoreset(env, data)
                send_obs(obs, (reward, terminated, truncated, info))
            elif cmd == Commands.SEED:
                obs, info = env.reset(seed=data)
                send_obs(obs, (info,))
            elif cmd == Commands.GET_ATTR:
                remote.send(getattr(env, data, None))
            elif cmd == Commands.SET_ATTR:
                name, value = data
                setattr(env, name, value)
                remote.send(True)
            elif cmd == Commands.RENDER:
                remote.send(env.render())
            elif cmd == Commands.CLOSE:
                env.close()
                remote.send(True)
                break
    except (KeyboardInterrupt, EOFError):
        pass
    finally:
        if shm is not None:
            shm.close()
        remote.close()


class SubprocVectorEnv(BaseVectorEnv):
    """N envs in N spawned worker processes over pipes
    (reference: envs/vec_env.py:488-580)."""

    def __init__(self, env_fns: Sequence[Callable], context: str = "spawn"):
        super().__init__(len(env_fns))
        ctx = mp.get_context(context)
        self.remotes, work_remotes = zip(*[ctx.Pipe() for _ in env_fns])
        self.processes = []
        for work_remote, remote, fn in zip(work_remotes, self.remotes, env_fns):
            p = ctx.Process(
                target=_subproc_worker,
                args=(work_remote, remote, CloudpickleWrapper(fn), self._shm_spec_for(len(self.processes))),
                daemon=True,
            )
            p.start()
            self.processes.append(p)
            work_remote.close()
        self.remotes[0].send((Commands.GET_ATTR, "observation_space"))
        self.observation_space = self.remotes[0].recv()
        self.remotes[0].send((Commands.GET_ATTR, "action_space"))
        self.action_space = self.remotes[0].recv()

    def _shm_spec_for(self, index: int):
        return None

    def _recv_obs(self, payloads):
        return np.stack([p[0] for p in payloads])

    def reset(self, seed: Optional[int] = None):
        for i, remote in enumerate(self.remotes):
            kwargs = {"seed": seed + i} if seed is not None else {}
            remote.send((Commands.RESET, kwargs))
        payloads = [remote.recv() for remote in self.remotes]
        return self._recv_obs(payloads), [p[-1] for p in payloads]

    def step(self, actions: np.ndarray):
        assert len(actions) == self.num_envs
        for remote, action in zip(self.remotes, actions):
            remote.send((Commands.STEP, action))
        payloads = [remote.recv() for remote in self.remotes]
        obs = self._recv_obs(payloads)
        rewards = np.asarray([p[1] for p in payloads], dtype=np.float32)
        terminated = np.asarray([p[2] for p in payloads], dtype=bool)
        truncated = np.asarray([p[3] for p in payloads], dtype=bool)
        infos = [p[4] for p in payloads]
        return obs, rewards, terminated, truncated, infos

    def get_attr(self, name: str) -> List[Any]:
        for remote in self.remotes:
            remote.send((Commands.GET_ATTR, name))
        return [remote.recv() for remote in self.remotes]

    def set_attr(self, name: str, value: Any):
        for remote in self.remotes:
            remote.send((Commands.SET_ATTR, (name, value)))
        for remote in self.remotes:
            remote.recv()

    def close(self):
        if self.closed:
            return
        try:
            for remote in self.remotes:
                remote.send((Commands.CLOSE, None))
            for remote in self.remotes:
                try:
                    remote.recv()
                except EOFError:
                    pass
        except BrokenPipeError:
            pass
        for p in self.processes:
            p.join(timeout=2)
            if p.is_alive():
                p.terminate()
        self.closed = True


class ShmemVectorEnv(SubprocVectorEnv):
    """Subprocess vec env whose observations travel via POSIX shared memory
    instead of pipe pickling (reference: envs/vec_env.py:421-486, 583-690).
    One writer slot per worker; the parent reads the whole block after all
    workers have acked their step, so there is no read race."""

    def __init__(self, env_fns: Sequence[Callable], context: str = "spawn"):
        from multiprocessing import shared_memory

        probe_env = env_fns[0]()
        obs_space = probe_env.observation_space
        probe_env.close()
        self._obs_shape = obs_space.shape
        self._obs_dtype = np.dtype(obs_space.dtype)
        n = len(env_fns)
        block_shape = (n,) + tuple(self._obs_shape)
        nbytes = int(np.prod(block_shape)) * self._obs_dtype.itemsize
        self._shm = shared_memory.SharedMemory(create=True, size=max(nbytes, 1))
        self._shm_block = np.ndarray(
            block_shape, dtype=self._obs_dtype, buffer=self._shm.buf
        )
        self._block_shape = block_shape
        super().__init__(env_fns, context=context)

    def _shm_spec_for(self, index: int):
        return (self._shm.name, self._block_shape, self._obs_dtype, index)

    def _recv_obs(self, payloads):
        # All workers have acked by the time we read — copy out the block.
        return self._shm_block.copy()

    def close(self):
        if self.closed:
            return
        super().close()
        try:
            self._shm.close()
            self._shm.unlink()
        except FileNotFoundError:
            pass


def make_vec_env(
    env_fn: Callable[[int], Callable[[], Any]],
    num_envs: int,
    backend: str = "thread",
) -> BaseVectorEnv:
    """Vec-env factory. ``env_fn(i)`` returns a zero-arg env constructor for
    worker i. backend: thread | subproc | shmem."""
    fns = [env_fn(i) for i in range(num_envs)]
    if backend == "thread":
        return ThreadedVectorEnv(fns)
    if backend == "subproc":
        return SubprocVectorEnv(fns)
    if backend == "shmem":
        return ShmemVectorEnv(fns)
    raise ValueError(f"Unknown vec env backend: {backend}")
