"""REAL multi-process multihost test: 2 OS processes x 2 virtual devices,
gloo collectives — validates parallel/multihost.py beyond the degenerate
single-process case (cross-process mesh construction + a gradient psum
crossing the process boundary, the DCN analogue)."""

import socket
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).parent.parent


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_multihost_psum():
    port = _free_port()
    worker = str(REPO / "tests" / "multihost_worker.py")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost worker timed out")
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert "MULTIHOST_OK" in out, out


@pytest.mark.slow
def test_two_process_dp_train_step():
    """The agent's full GSPMD train step over a mesh spanning 2 processes:
    gradient all-reduces cross the process boundary; the loss must match the
    single-device result on the identical (seed-deterministic) batch."""
    port = _free_port()
    worker = str(REPO / "tests" / "multihost_worker.py")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), "2", str(port), "trainstep"],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=560)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost trainstep worker timed out")
        outs.append(out)
    losses = []
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        line = next(l for l in out.splitlines() if "TRAINSTEP_OK" in l)
        losses.append(float(line.split("policy_loss=")[1].split()[0]))
    # identical loss on both processes (replicated metrics)
    assert abs(losses[0] - losses[1]) < 1e-5

    # single-device reference on the same seeds
    import numpy as np

    ref = subprocess.run(
        [sys.executable, "-c", (
            "import jax; jax.config.update('jax_platforms','cpu');\n"
            "import sys; sys.path.insert(0, %r)\n"
            "import numpy as np\n"
            "from active_inference_diffusion_tpu.agents.state_agent import DiffusionStateAgent\n"
            "from active_inference_diffusion_tpu.configs.config import ActiveInferenceConfig, DiffusionConfig, TrainingConfig\n"
            "cfg = ActiveInferenceConfig(observation_dim=5, action_dim=2, latent_dim=8, hidden_dim=32,"
            " score_num_layers=1, batch_size=16, efe_horizon=2, num_efe_trajectories=2, num_ambiguity_samples=2,"
            " diffusion=DiffusionConfig(num_diffusion_steps=3, beta_schedule='linear'))\n"
            "cfg.tpu.donate_buffers = False\n"
            "agent = DiffusionStateAgent(5, 2, cfg, TrainingConfig(buffer_size=64))\n"
            "state = agent.init_train_state(jax.random.PRNGKey(0))\n"
            "ks = jax.random.split(jax.random.PRNGKey(1), 5)\n"
            "batch = {'observations': jax.random.normal(ks[0], (16, 5)),"
            " 'actions': jax.random.normal(ks[1], (16, 2)),"
            " 'rewards': jax.random.normal(ks[2], (16,)),"
            " 'next_observations': jax.random.normal(ks[3], (16, 5)),"
            " 'dones': jax.random.bernoulli(ks[4], 0.1, (16,))}\n"
            "_, metrics = agent._train_step(state, batch)\n"
            "print('REF policy_loss=%%.6f' %% float(metrics['policy_loss']))\n"
        ) % str(REPO)],
        capture_output=True, text=True, timeout=560,
    )
    assert ref.returncode == 0, ref.stdout + ref.stderr
    ref_loss = float(ref.stdout.split("policy_loss=")[1].split()[0])
    np.testing.assert_allclose(losses[0], ref_loss, rtol=2e-4, atol=1e-5)
