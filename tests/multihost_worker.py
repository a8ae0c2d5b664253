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
