"""Vec env + collector + replay integration tests."""

import gymnasium as gym
import jax
import numpy as np
import pytest

from active_inference_diffusion_tpu.data.replay import (
    DeviceReplayBuffer,
    HostReplayBuffer,
)
from active_inference_diffusion_tpu.envs.vec_env import (
    ShmemVectorEnv,
    SubprocVectorEnv,
    ThreadedVectorEnv,
)
from active_inference_diffusion_tpu.envs.wrappers import (
    ActionRepeat,
    NormalizeObservation,
)


def make_pendulum():
    return gym.make("Pendulum-v1")


def test_normalize_observation_bounds():
    env = NormalizeObservation(gym.make("Pendulum-v1"))
    obs, _ = env.reset(seed=0)
    assert np.abs(obs).max() <= 1.0 + 1e-6
    for _ in range(20):
        obs, *_ = env.step(env.action_space.sample())
        assert np.abs(obs).max() <= 1.0 + 1e-6
    env.close()


def test_action_repeat_accumulates_reward():
    env = gym.make("Pendulum-v1")
    env.reset(seed=0)
    wrapped = ActionRepeat(gym.make("Pendulum-v1"), repeat=3)
    wrapped.reset(seed=0)
    action = np.zeros(1, dtype=np.float32)
    _, r3, *_ = wrapped.step(action)
    # reward over 3 steps should differ from single-step reward
    env2 = gym.make("Pendulum-v1")
    env2.reset(seed=0)
    _, r1, *_ = env2.step(action)
    assert abs(r3) > abs(r1) * 0.9  # accumulated magnitude
    env.close(); wrapped.close(); env2.close()


def test_threaded_vec_env_lockstep_and_autoreset():
    vec = ThreadedVectorEnv([make_pendulum for _ in range(4)])
    obs, infos = vec.reset(seed=0)
    assert obs.shape == (4, 3)
    for _ in range(5):
        actions = np.stack([vec.action_space.sample() for _ in range(4)])
        obs, rewards, term, trunc, infos = vec.step(actions)
        assert obs.shape == (4, 3) and rewards.shape == (4,)
    assert vec.get_attr("spec")[0] is not None
    vec.close()


def test_threaded_vec_env_final_observation():
    # TimeLimit on Pendulum truncates at 200 steps; check autoreset info
    vec = ThreadedVectorEnv([make_pendulum for _ in range(2)])
    vec.reset(seed=0)
    saw_final = False
    for _ in range(201):
        actions = np.zeros((2, 1), dtype=np.float32)
        obs, rewards, term, trunc, infos = vec.step(actions)
        for i, info in enumerate(infos):
            if (term[i] or trunc[i]):
                assert "final_observation" in info
                saw_final = True
    assert saw_final
    vec.close()


@pytest.mark.parametrize("cls", [SubprocVectorEnv, ShmemVectorEnv])
def test_subproc_vec_envs(cls):
    vec = cls([make_pendulum for _ in range(2)])
    try:
        obs, infos = vec.reset(seed=0)
        assert obs.shape == (2, 3)
        for _ in range(3):
            actions = np.stack([vec.action_space.sample() for _ in range(2)])
            obs, rewards, term, trunc, infos = vec.step(actions)
            assert obs.shape == (2, 3)
            assert np.isfinite(obs).all()
        attrs = vec.get_attr("spec")
        assert len(attrs) == 2
    finally:
        vec.close()


def test_device_replay_ring_semantics():
    buf = DeviceReplayBuffer(capacity=10, obs_shape=(3,), action_dim=2)
    for i in range(15):
        buf.add(np.full(3, i, np.float32), np.zeros(2, np.float32), float(i),
                np.full(3, i + 1, np.float32), i % 4 == 0)
    assert len(buf) == 10
    batch = buf.sample(jax.random.PRNGKey(0), 32)
    assert batch["observations"].shape == (32, 3)
    # ring wrapped: oldest entries (0..4) were overwritten
    assert float(batch["rewards"].min()) >= 5.0


def test_device_replay_uint8_pixels_decode():
    import jax.numpy as jnp

    buf = DeviceReplayBuffer(capacity=8, obs_shape=(2, 4, 4), action_dim=1,
                             obs_dtype=jnp.uint8)
    obs = np.full((2, 4, 4), 255, np.uint8)
    buf.add(obs, np.zeros(1, np.float32), 1.0, obs, False)
    batch = buf.sample(jax.random.PRNGKey(0), 4)
    assert batch["observations"].dtype == jnp.float32
    assert float(batch["observations"].max()) <= 1.0


def test_host_replay_buffer():
    buf = HostReplayBuffer(capacity=16, obs_shape=(5,), action_dim=2)
    for i in range(20):
        buf.add(np.zeros(5), np.zeros(2), 0.5, np.zeros(5), False)
    assert len(buf) == 16
    batch = buf.sample(None, 8)
    assert batch["observations"].shape == (8, 5)


def test_collector_with_tiny_agent():
    from active_inference_diffusion_tpu.agents.state_agent import DiffusionStateAgent
    from active_inference_diffusion_tpu.configs.config import (
        ActiveInferenceConfig,
        DiffusionConfig,
        TrainingConfig,
    )
    from active_inference_diffusion_tpu.parallel.collect import BatchedCollector

    cfg = ActiveInferenceConfig(
        observation_dim=3, action_dim=1, latent_dim=4, hidden_dim=16,
        score_num_layers=1, batch_size=4,
        efe_horizon=2, num_efe_trajectories=2,
        diffusion=DiffusionConfig(num_diffusion_steps=3, beta_schedule="linear"),
    )
    cfg.tpu.donate_buffers = False
    tcfg = TrainingConfig(buffer_size=64, collect_diffusion_steps=2)
    agent = DiffusionStateAgent(3, 1, cfg, tcfg)
    state = agent.init_train_state(jax.random.PRNGKey(0))

    vec = ThreadedVectorEnv([make_pendulum for _ in range(2)])
    replay = DeviceReplayBuffer(capacity=64, obs_shape=(3,), action_dim=1)
    collector = BatchedCollector(vec, agent, replay, seed=0)
    stats = collector.collect(state, num_steps=5)
    assert len(replay) == 10  # 5 vec steps x 2 envs
    assert stats["collect/total_env_steps"] == 10.0
    assert "collect/steps_per_sec" in stats
    vec.close()


def test_native_codec_roundtrip():
    import pytest

    from active_inference_diffusion_tpu.native import (
        compress,
        decompress,
        native_available,
    )

    if not native_available():
        pytest.skip("g++ unavailable; native codec not built")
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (3, 16, 16), dtype=np.uint8)
    # make it compressible
    img[:, ::2] = img[:, 1::2]
    blob = compress(img)
    out = decompress(blob, img.shape)
    assert (out == img).all()


def test_native_batch_decompress():
    """decompress_batch must equal per-item decompress and reject corrupt
    blobs with the failing index."""
    import pytest

    from active_inference_diffusion_tpu.native import (
        compress,
        decompress,
        decompress_batch,
        native_available,
    )

    if not native_available():
        pytest.skip("g++ unavailable; native codec not built")
    rng = np.random.default_rng(1)
    shape = (3, 8, 8)
    frames = [rng.integers(0, 64, shape, dtype=np.uint8) for _ in range(16)]
    blobs = [compress(f) for f in frames]
    batch = decompress_batch(blobs, shape)
    assert batch.shape == (16,) + shape
    for i in range(16):
        assert (batch[i] == decompress(blobs[i], shape)).all()
        assert (batch[i] == frames[i]).all()
    assert decompress_batch([], shape).shape == (0,) + shape
    with pytest.raises(RuntimeError, match="item 1"):
        decompress_batch([blobs[0], b"\xff\xff\x00", blobs[2]], shape)


def test_compressed_replay_buffer():
    from active_inference_diffusion_tpu.data.replay import CompressedReplayBuffer

    buf = CompressedReplayBuffer(capacity=8, obs_shape=(2, 3, 4, 4), action_dim=2)
    rng = np.random.default_rng(0)
    for i in range(12):
        obs = rng.integers(0, 256, (2, 3, 4, 4), dtype=np.uint8)
        buf.add(obs, np.zeros(2, np.float32), float(i), obs, False)
    assert len(buf) == 8
    batch = buf.sample(None, 4)
    assert batch["observations"].shape == (4, 2, 3, 4, 4)
    assert float(batch["observations"].max()) <= 1.0
    assert batch["observations"].dtype == np.float32 or str(batch["observations"].dtype) == "float32"
