"""Checkpoint/logger/viz/time-sampler/epistemic utility tests."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from active_inference_diffusion_tpu.agents.state_agent import DiffusionStateAgent
from active_inference_diffusion_tpu.configs.config import (
    ActiveInferenceConfig,
    DiffusionConfig,
    TrainingConfig,
    config_to_dict,
    load_yaml_config,
)


def tiny_agent():
    cfg = ActiveInferenceConfig(
        observation_dim=5, action_dim=2, latent_dim=8, hidden_dim=32,
        score_num_layers=1, batch_size=8,
        efe_horizon=2, num_efe_trajectories=2,
        diffusion=DiffusionConfig(num_diffusion_steps=3, beta_schedule="linear"),
    )
    cfg.tpu.donate_buffers = False
    return DiffusionStateAgent(5, 2, cfg, TrainingConfig(buffer_size=32))


def test_checkpoint_roundtrip(tmp_path):
    from active_inference_diffusion_tpu.utils.checkpoints import (
        load_checkpoint,
        save_checkpoint,
    )

    agent = tiny_agent()
    state = agent.init_train_state(jax.random.PRNGKey(0))
    path = save_checkpoint(
        str(tmp_path / "ckpts"), state, step=123, exploration_noise=0.07,
        config=agent.config, training_config=agent.training_config,
    )
    template = agent.init_train_state(jax.random.PRNGKey(1))
    restored, meta = load_checkpoint(path, template)
    assert meta["total_steps"] == 123
    assert meta["exploration_noise"] == 0.07

    for a, b in zip(
        jax.tree_util.tree_leaves(state.params),
        jax.tree_util.tree_leaves(restored.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    # latest alias resolves
    restored2, _ = load_checkpoint(str(tmp_path / "ckpts"), template)
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(restored2.params)[0]),
        np.asarray(jax.tree_util.tree_leaves(state.params)[0]),
    )


def test_checkpoint_lenient_migration(tmp_path):
    """A checkpoint written before a pytree-structure change (here: the old
    layout without the 'posterior' param group or the target_value field)
    still restores: matching subtrees keep their saved values, new ones come
    from the template, target_value starts at the restored live critic."""
    import dataclasses

    import orbax.checkpoint as ocp

    from active_inference_diffusion_tpu.utils.checkpoints import load_checkpoint

    agent = tiny_agent()
    state = agent.init_train_state(jax.random.PRNGKey(0))

    old = dataclasses.asdict(state)  # nested dicts, like a raw orbax restore
    del old["target_value"]
    old["params"] = {k: v for k, v in old["params"].items() if k != "posterior"}
    # Old model-group opt state lacked the posterior leaf -> structure drift.
    path = tmp_path / "old" / "checkpoint_7"
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path / "state", old, force=True)
    (path / "meta.json").write_text('{"total_steps": 7}')

    template = agent.init_train_state(jax.random.PRNGKey(1))
    restored, meta = load_checkpoint(str(path), template)
    assert meta["total_steps"] == 7

    # Saved groups survive...
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(restored.params["score"])[0]),
        np.asarray(jax.tree_util.tree_leaves(state.params["score"])[0]),
    )
    # ...the missing group comes from the template...
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(restored.params["posterior"])[0]),
        np.asarray(jax.tree_util.tree_leaves(template.params["posterior"])[0]),
    )
    # ...and the slow critic starts at the restored live critic.
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(restored.target_value)[0]),
        np.asarray(jax.tree_util.tree_leaves(restored.params["value"])[0]),
    )
    assert int(restored.step) == int(state.step)


def test_logger_jsonl(tmp_path):
    from active_inference_diffusion_tpu.utils.logger import Logger

    logger = Logger(use_wandb=False, experiment_name="t", log_dir=str(tmp_path))
    logger.log({"a": 1.5, "b": jnp.asarray(2.0), "c": np.float32(3.0)}, step=10)
    logger.log({"a": 2.5}, step=20)
    rows = [json.loads(l) for l in open(tmp_path / "t.jsonl")]
    assert rows[0]["a"] == 1.5 and rows[0]["b"] == 2.0 and rows[0]["step"] == 10
    assert rows[1]["step"] == 20


def test_yaml_config_loading(tmp_path):
    yaml_text = """
active_inference:
  latent_dim: 50
  hidden_dim: 256
  kl_weight: 0.05
  diffusion:
    num_diffusion_steps: 100
    beta_schedule: linear
training:
  total_timesteps: 500000
  buffer_size: 50000
pixel:
  frame_stack: 2
  image_shape: [3, 64, 64]
"""
    p = tmp_path / "cfg.yaml"
    p.write_text(yaml_text)
    cfg, tcfg, pcfg = load_yaml_config(str(p))
    assert cfg.latent_dim == 50
    assert cfg.diffusion.num_diffusion_steps == 100
    assert cfg.diffusion.beta_schedule == "linear"
    assert tcfg.total_timesteps == 500_000
    assert pcfg.frame_stack == 2
    assert pcfg.image_shape == (3, 64, 64)
    assert cfg.pixel_observation is True

    d = config_to_dict(cfg)
    assert d["diffusion"]["num_diffusion_steps"] == 100


def test_yaml_unknown_key_raises(tmp_path):
    p = tmp_path / "bad.yaml"
    p.write_text("active_inference:\n  not_a_field: 3\n")
    with pytest.raises(KeyError):
        load_yaml_config(str(p))


def test_all_shipped_presets_load():
    """Every examples/configs/*.yaml must parse against the strict loader
    (unknown fields raise), so presets can't silently drift from the
    config schema."""
    import glob
    from pathlib import Path

    root = Path(__file__).parent.parent
    presets = sorted(glob.glob(str(root / "examples" / "configs" / "*.yaml")))
    assert len(presets) >= 8
    for p in presets:
        cfg, tcfg, pcfg = load_yaml_config(p)
        assert cfg.latent_dim > 0 and tcfg.total_timesteps > 0


def test_visualize_reconstruction_state(tmp_path):
    from active_inference_diffusion_tpu.utils.viz import visualize_reconstruction

    agent = tiny_agent()
    state = agent.init_train_state(jax.random.PRNGKey(0))
    obs = np.random.default_rng(0).normal(size=(4, 5)).astype(np.float32)
    err = visualize_reconstruction(
        agent, state, obs, save_path=str(tmp_path / "recon.png")
    )
    assert np.isfinite(err)
    assert (tmp_path / "recon.png").exists()


def test_plot_belief_evolution(tmp_path):
    from active_inference_diffusion_tpu.configs.config import BeliefDynamicsConfig
    from active_inference_diffusion_tpu.core.belief_dynamics import BeliefDynamics
    from active_inference_diffusion_tpu.utils.viz import plot_belief_evolution

    bd = BeliefDynamics(4, BeliefDynamicsConfig())
    for _ in range(5):
        bd.update(np.ones(4, np.float32), np.zeros(4, np.float32))
    out = plot_belief_evolution(bd, save_path=str(tmp_path / "belief.png"))
    assert out is not None
    assert (tmp_path / "belief.png").exists()


def test_time_sampler_distribution():
    from active_inference_diffusion_tpu.core.time_sampler import (
        importance_sample_time,
        init_time_importance,
        update_time_importance,
    )

    w = init_time_importance()
    t = importance_sample_time(w, jax.random.PRNGKey(0), 10_000)
    assert float(t.min()) >= 0.0 and float(t.max()) < 1.0
    # uniform at init
    hist, _ = np.histogram(np.asarray(t), bins=10, range=(0, 1))
    assert hist.min() > 700

    # after boosting weight of bin ~50, samples concentrate there
    w2 = w.at[50].set(10.0)
    t2 = importance_sample_time(w2, jax.random.PRNGKey(1), 10_000)
    frac_in_bin = float(jnp.mean((t2 >= 0.50) & (t2 < 0.52)))
    assert frac_in_bin > 0.5

    # EMA update moves touched bins toward losses (bin = floor(t * 99),
    # matching the reference discretization, core/active_inference.py:760)
    losses = jnp.full((128,), 3.0)
    t3 = jnp.full((128,), 0.505)
    touched_bin = int(0.505 * 99)  # = 49
    w3 = update_time_importance(w, t3, losses)
    assert float(w3[touched_bin]) > float(w[touched_bin])
    np.testing.assert_allclose(
        np.asarray(w3[:touched_bin]), np.asarray(w[:touched_bin])
    )


def test_ema_loss_gradient():
    from active_inference_diffusion_tpu.core.epistemic import ema_loss

    x = jnp.array([0.5, 1.0, -0.2])
    rm = jnp.asarray(0.0)

    def f(x):
        val, _ = ema_loss(x, rm)
        return val

    val = f(x)
    expected = float(jnp.log(jnp.mean(jnp.exp(x))))
    np.testing.assert_allclose(float(val), expected, rtol=1e-5)

    g = jax.grad(f)(x)
    # custom vjp: grad = exp(x) / (running_mean_after_update * N)
    t_exp = float(jnp.mean(jnp.exp(x)))
    expected_grad = np.exp(np.asarray(x)) / ((t_exp + 1e-6) * 3)
    np.testing.assert_allclose(np.asarray(g), expected_grad, rtol=1e-4)


def test_cli_total_timesteps_does_not_clobber_yaml(tmp_path):
    """Regression: the --total-timesteps CLI default must not override a
    YAML-provided training.total_timesteps (it once forced 1M onto every
    --config run)."""
    import argparse
    import importlib.util
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "aid_train_cli", Path(__file__).resolve().parents[1] / "train.py"
    )
    train_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(train_mod)

    cfg_file = tmp_path / "cfg.yaml"
    cfg_file.write_text(
        "active_inference:\n  env_name: Hopper-v4\n"
        "training:\n  total_timesteps: 450\n"
    )

    def ns(**kw):
        base = dict(
            config=str(cfg_file), env=None, total_timesteps=None, pixels=False,
            semantics=None, seed=0, resume=None, num_parallel_envs=8,
            no_wandb=True,
        )
        base.update(kw)
        return argparse.Namespace(**base)

    _, tcfg, _ = train_mod.build_configs(ns())
    assert tcfg.total_timesteps == 450

    _, tcfg, _ = train_mod.build_configs(ns(total_timesteps=777))
    assert tcfg.total_timesteps == 777

    # no-config path falls back to the reference default
    _, tcfg, _ = train_mod.build_configs(
        ns(config=None, env="HalfCheetah-v4")
    )
    assert tcfg.total_timesteps == 1_000_000


def test_evaluate_agent_batched_lockstep():
    """Batched eval: one act per step for all episodes, episode accounting
    must ignore post-done (autoreset) rewards."""
    import gymnasium as gym

    from active_inference_diffusion_tpu.agents.state_agent import DiffusionStateAgent
    from active_inference_diffusion_tpu.configs.config import (
        ActiveInferenceConfig, DiffusionConfig, TrainingConfig)
    from active_inference_diffusion_tpu.utils.training import evaluate_agent_batched

    cfg = ActiveInferenceConfig(
        observation_dim=3, action_dim=1, latent_dim=4, hidden_dim=16,
        score_num_layers=1, efe_horizon=2, num_efe_trajectories=2,
        diffusion=DiffusionConfig(num_diffusion_steps=3, beta_schedule="linear"),
    )
    cfg.tpu.donate_buffers = False
    agent = DiffusionStateAgent(3, 1, cfg, TrainingConfig(collect_diffusion_steps=2))
    state = agent.init_train_state(jax.random.PRNGKey(0))

    def env_fn(i):
        return lambda: gym.make("Pendulum-v1")

    m = evaluate_agent_batched(
        agent, state, env_fn, num_episodes=3, max_steps=20,
        key=jax.random.PRNGKey(1),
    )
    assert m["eval/episode_length_mean"] == 20.0  # capped, none terminated
    assert np.isfinite(m["eval/episode_reward_mean"])
    assert m["eval/episode_reward_min"] <= m["eval/episode_reward_mean"] <= m["eval/episode_reward_max"]


def test_all_shipped_yaml_configs_load():
    """Every YAML under examples/configs must parse into valid configs."""
    from pathlib import Path

    cfg_dir = Path(__file__).resolve().parents[1] / "examples" / "configs"
    files = sorted(cfg_dir.glob("*.yaml"))
    assert files, "no shipped configs found"
    for f in files:
        cfg, tcfg, pcfg = load_yaml_config(str(f))
        assert cfg.latent_dim > 0 and tcfg.total_timesteps > 0
        if "pixel" in f.name:
            assert pcfg is not None and cfg.pixel_observation


def test_checkpoint_replay_roundtrip(tmp_path):
    """Replay buffer checkpointing (the reference never saves its buffer,
    so resumed runs regress while it refills; we observed -402 -> -600)."""
    from active_inference_diffusion_tpu.data.replay import DeviceReplayBuffer
    from active_inference_diffusion_tpu.utils.checkpoints import (
        load_checkpoint,
        save_checkpoint,
    )

    agent = tiny_agent()
    state = agent.init_train_state(jax.random.PRNGKey(0))
    replay = DeviceReplayBuffer(16, (5,), 2)
    k = jax.random.split(jax.random.PRNGKey(1), 5)
    replay.add_batch(
        jax.random.normal(k[0], (10, 5)), jax.random.normal(k[1], (10, 2)),
        jax.random.normal(k[2], (10,)), jax.random.normal(k[3], (10, 5)),
        jax.random.bernoulli(k[4], 0.1, (10,)),
    )

    path = save_checkpoint(
        str(tmp_path / "ck"), state, step=7, replay_state=replay.state
    )
    template = agent.init_train_state(jax.random.PRNGKey(2))
    fresh_replay = DeviceReplayBuffer(16, (5,), 2)
    restored, meta = load_checkpoint(path, template, replay_template=fresh_replay.state)
    assert "replay_state" in meta
    fresh_replay.state = meta["replay_state"]
    assert len(fresh_replay) == 10
    np.testing.assert_allclose(
        np.asarray(fresh_replay.state.observations),
        np.asarray(replay.state.observations),
    )

    # a template sized differently (a --buffer-size change between runs)
    # degrades to a fresh buffer with a warning, not a failed resume
    import warnings as _warnings

    other = DeviceReplayBuffer(32, (5,), 2)
    with _warnings.catch_warnings(record=True) as w:
        _warnings.simplefilter("always")
        _, meta2 = load_checkpoint(path, template, replay_template=other.state)
    assert "replay_state" not in meta2
    assert any("replay" in str(x.message) for x in w)

    # checkpoints without a replay restore cleanly too
    path2 = save_checkpoint(str(tmp_path / "ck2"), state, step=8)
    _, meta2 = load_checkpoint(path2, template, replay_template=fresh_replay.state)
    assert "replay_state" not in meta2


def test_epistemic_estimator_direct():
    """estimate_epistemic_value: finite MINE bound, non-negative clipped
    value, running-mean update, and jvp-vs-finite-difference probe agreement
    (the FD mode replicates the reference; jvp is its eps->0 limit)."""
    from active_inference_diffusion_tpu.core.epistemic import (
        compute_jacobian_probes,
        estimate_epistemic_value,
    )

    agent = tiny_agent()
    state = agent.init_train_state(jax.random.PRNGKey(0))
    core = agent.core
    params = state.params

    def decoder_fn(z):
        return core.decode_observation(params, z)

    mean = jax.random.normal(jax.random.PRNGKey(1), (6, 8))
    logvar = jnp.full((6, 8), -2.0)

    result = estimate_epistemic_value(
        core.epistemic_estimator, params["epistemic"], decoder_fn,
        mean, logvar, jax.random.PRNGKey(2), jnp.zeros(()),
        num_samples=3, train=False,
    )
    assert np.isfinite(float(result.mi_lower_bound))
    assert result.value.shape == (6,)
    assert (np.asarray(result.value) >= 0).all()
    assert float(result.running_mean) != 0.0  # EMA state updated

    # jvp probes ~= finite-difference probes for a smooth decoder
    z = jax.random.normal(jax.random.PRNGKey(3), (4, 8))
    jvp = compute_jacobian_probes(
        decoder_fn, z, jax.random.PRNGKey(4), 2, jnp.asarray(0.01),
        use_finite_differences=False,
    )
    fd = compute_jacobian_probes(
        decoder_fn, z, jax.random.PRNGKey(4), 2, jnp.asarray(0.01),
        use_finite_differences=True,
    )
    np.testing.assert_allclose(np.asarray(jvp), np.asarray(fd), rtol=0.2, atol=0.05)


def test_best_checkpoint_name_and_meta(tmp_path):
    """save_checkpoint(name='best'): saves under <dir>/best (overwritten in
    place), records extra_meta, resolves for load, does not move 'latest'."""
    from active_inference_diffusion_tpu.utils.checkpoints import (
        load_checkpoint,
        save_checkpoint,
    )

    agent = tiny_agent()
    state = agent.init_train_state(jax.random.PRNGKey(0))
    p1 = save_checkpoint(str(tmp_path), state, 10)
    best = save_checkpoint(
        str(tmp_path), state, 10, name="best", keep_latest_alias=False,
        extra_meta={"eval_reward": -123.5},
    )
    assert best.endswith("/best")
    assert (tmp_path / "latest.txt").read_text().strip() == p1

    # overwrite in place at a later step
    state2 = agent.init_train_state(jax.random.PRNGKey(1))
    save_checkpoint(
        str(tmp_path), state2, 20, name="best", keep_latest_alias=False,
        extra_meta={"eval_reward": -50.0},
    )
    template = agent.init_train_state(jax.random.PRNGKey(2))
    restored, meta = load_checkpoint(str(tmp_path / "best"), template)
    assert meta["eval_reward"] == -50.0
    assert meta["total_steps"] == 20
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(restored.params["score"])[0]),
        np.asarray(jax.tree_util.tree_leaves(state2.params["score"])[0]),
    )


def test_render_fused_episode_and_gif(tmp_path):
    """On-device eval video: roll a fused env episode and rasterize it in
    one XLA program; frames must be real uint8 images and the GIF must
    round-trip through Pillow."""
    import numpy as np

    from active_inference_diffusion_tpu.utils.viz import (
        render_fused_episode,
        save_gif,
    )

    def random_policy(obs, key):
        import jax

        return jax.random.uniform(key, (obs.shape[0], 1), minval=-1.0, maxval=1.0)

    frames, ret, length = render_fused_episode(
        "Pendulum-v1", random_policy, jax.random.PRNGKey(0),
        size=32, max_steps=4,
    )
    assert frames.dtype == np.uint8
    assert frames.shape[1:] == (32, 32, 3)
    assert 1 <= frames.shape[0] <= 5 and frames.shape[0] == length
    assert np.isfinite(ret)
    # frames must not be blank, and the rod must move across the episode
    assert frames.min() < 200
    assert not np.array_equal(frames[0], frames[-1])

    p = save_gif(frames, str(tmp_path / "ep.gif"), fps=10)
    from PIL import Image

    with Image.open(p) as im:
        assert im.n_frames == frames.shape[0]
