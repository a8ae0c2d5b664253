"""Worker for the real two-process multihost test (not a pytest file).

Launched by tests/test_multihost_mp.py as 2 OS processes, each with 2
virtual CPU devices, collectives over gloo — the CPU stand-in for a 2-host
TPU pod with DCN between hosts. Exercises parallel/multihost.py's actual
cross-process path (initialize + (host, dp, tp) mesh + a gradient psum over
both data axes), which the in-suite test can only cover degenerately
(single process).
"""

import os
import sys
from pathlib import Path

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from active_inference_diffusion_tpu.parallel.multihost import (
    initialize,
    make_multihost_mesh,
)

initialize(f"127.0.0.1:{port}", nproc, pid)
assert jax.process_count() == nproc, jax.process_count()
assert jax.device_count() == 2 * nproc

mesh = make_multihost_mesh(tp=1)
assert dict(mesh.shape) == {"host": nproc, "dp": 2, "tp": 1}, mesh.shape

# Data-parallel gradient of sum((w*x - 1)^2) over a global batch sharded
# across (host, dp): the psum crosses processes (DCN analogue).
xs_global = np.arange(8.0, dtype=np.float32)
sharding = NamedSharding(mesh, P(("host", "dp")))
xs = jax.make_array_from_callback(
    (8,), sharding, lambda idx: xs_global[idx]
)


def local_grad(w, x):
    g = jax.grad(lambda w_: jnp.sum((w_ * x - 1.0) ** 2))(w)
    return jax.lax.psum(g, ("host", "dp"))


f = jax.jit(
    shard_map(
        local_grad, mesh=mesh, in_specs=(P(), P(("host", "dp"))),
        out_specs=P(), check_vma=False,
    )
)
g = f(jnp.asarray(3.0, jnp.float32), xs)
got = float(np.asarray(g.addressable_shards[0].data))
expected = float(sum(2 * (3 * x - 1) * x for x in xs_global))
assert abs(got - expected) < 1e-3, (got, expected)
print(f"MULTIHOST_OK p{pid} grad={got}", flush=True)


# Mode 2 (argv[4] == "trainstep"): the agent's FULL 5-group train step as a
# GSPMD program over a ("dp", "tp") mesh spanning both processes — params
# replicated, batch dp-sharded, gradient all-reduces crossing the process
# boundary. Prints the policy loss for cross-process / vs-single-device
# comparison by the pytest driver.
if len(sys.argv) > 4 and sys.argv[4] == "trainstep":
    from jax.sharding import Mesh

    from active_inference_diffusion_tpu.agents.state_agent import (
        DiffusionStateAgent,
    )
    from active_inference_diffusion_tpu.configs.config import (
        ActiveInferenceConfig,
        DiffusionConfig,
        TrainingConfig,
    )
    from active_inference_diffusion_tpu.parallel.dist_train import (
        make_dp_train_step,
    )

    cfg = ActiveInferenceConfig(
        observation_dim=5, action_dim=2, latent_dim=8, hidden_dim=32,
        score_num_layers=1, batch_size=16, efe_horizon=2,
        num_efe_trajectories=2, num_ambiguity_samples=2,
        diffusion=DiffusionConfig(num_diffusion_steps=3, beta_schedule="linear"),
    )
    cfg.tpu.donate_buffers = False
    agent = DiffusionStateAgent(5, 2, cfg, TrainingConfig(buffer_size=64))
    # Same seed on every process -> identical host-side state/batch; global
    # arrays are assembled from those identical copies.
    state = agent.init_train_state(jax.random.PRNGKey(0))

    ks = jax.random.split(jax.random.PRNGKey(1), 5)
    batch_host = {
        "observations": np.asarray(jax.random.normal(ks[0], (16, 5))),
        "actions": np.asarray(jax.random.normal(ks[1], (16, 2))),
        "rewards": np.asarray(jax.random.normal(ks[2], (16,))),
        "next_observations": np.asarray(jax.random.normal(ks[3], (16, 5))),
        "dones": np.asarray(jax.random.bernoulli(ks[4], 0.1, (16,))),
    }

    tp_mesh = Mesh(
        np.asarray(jax.devices()).reshape(2 * nproc, 1), ("dp", "tp")
    )
    train_step, _, _ = make_dp_train_step(agent, tp_mesh, donate=False)

    def to_global(tree, spec):
        def put(x):
            x = np.asarray(x)
            sh = NamedSharding(tp_mesh, spec)
            return jax.make_array_from_callback(x.shape, sh, lambda i: x[i])
        return jax.tree_util.tree_map(put, tree)

    gstate = to_global(state, P())          # replicated
    gbatch = to_global(batch_host, P("dp"))  # dp-sharded across processes
    new_state, metrics = train_step(gstate, gbatch)
    loss = float(np.asarray(metrics["policy_loss"].addressable_shards[0].data))
    score = float(
        np.asarray(metrics["score_matching_loss"].addressable_shards[0].data)
    )
    assert np.isfinite(loss) and np.isfinite(score)
    print(f"TRAINSTEP_OK p{pid} policy_loss={loss:.6f} score={score:.3f}",
          flush=True)
