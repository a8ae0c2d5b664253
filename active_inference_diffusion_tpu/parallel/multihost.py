"""Multi-host (DCN) initialization and mesh construction.

No reference counterpart — the reference is single-process, single-GPU
(SURVEY.md section 2.6). This is the cross-host extension of ``mesh.py``:
data parallelism spans hosts over DCN while tensor parallelism stays inside
a host's ICI domain, following the standard TPU-pod recipe (outer mesh axes
over DCN, inner axes over ICI).

Single-host processes can use everything here unchanged — ``initialize`` is
a no-op when JAX already sees its devices, and ``make_multihost_mesh``
degenerates to ``mesh.make_mesh``.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh

from .mesh import make_mesh


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize cross-host JAX. On TPU pods all arguments are discovered
    from the environment; pass them explicitly for CPU/GPU clusters. No-op if
    the distributed runtime is already initialized or unneeded (1 process).

    Must run before ANY backend-touching JAX call — including
    ``jax.process_count()``/``jax.devices()`` — so the already-initialized
    check reads the distributed client state directly instead of asking the
    backend (calling process_count() here would itself initialize XLA and
    make the real multi-process path always fail; caught by
    tests/test_multihost_mp.py's two-process run).
    """
    is_init = getattr(jax.distributed, "is_initialized", None)
    if is_init is not None:
        if is_init():
            return  # distributed runtime already initialized
    else:  # older jax without the public accessor
        from jax._src import distributed as _dist

        if getattr(_dist.global_state, "client", None) is not None:
            return
    if coordinator_address is None and num_processes in (None, 1):
        return  # single process, nothing to do
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_multihost_mesh(
    dp_per_host: Optional[int] = None,
    tp: int = 1,
    axis_names: Tuple[str, str, str] = ("host", "dp", "tp"),
) -> Mesh:
    """(host, dp, tp) mesh: the ``host`` axis maps across processes (DCN),
    ``dp``/``tp`` partition each host's local devices (ICI).

    Shard batches over ``("host", "dp")`` and parameters over ``tp`` (see
    ``mesh.param_pspecs``); GSPMD then reduces gradients host-locally over
    ICI first and across hosts over DCN — the bandwidth-correct order.
    """
    n_hosts = jax.process_count()
    local = jax.local_device_count()
    if dp_per_host is None:
        dp_per_host = local // tp
    if dp_per_host * tp != local:
        raise ValueError(
            f"dp_per_host ({dp_per_host}) x tp ({tp}) != local devices ({local})"
        )
    if n_hosts == 1:
        return make_mesh(shape=(1, dp_per_host, tp), axis_names=axis_names)
    # jax.devices() orders devices by process; reshape (hosts, dp, tp)
    dev_array = np.asarray(jax.devices()).reshape(n_hosts, dp_per_host, tp)
    return Mesh(dev_array, axis_names)
