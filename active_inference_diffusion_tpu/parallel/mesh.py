"""Device mesh construction and sharding rules.

No reference counterpart exists — the reference is single-GPU with Python
multiprocessing for env stepping only (SURVEY.md section 2.6). This module is
the TPU-native scale-out path: a (dp, tp) mesh, batch sharding over ``dp``
(gradient all-reduce rides ICI via GSPMD-inserted psums), and tensor-parallel
sharding of the large MLP kernels over ``tp``.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    shape: Optional[Tuple[int, ...]] = None,
    axis_names: Tuple[str, ...] = ("dp", "tp"),
    devices=None,
) -> Mesh:
    """Create a device mesh. Default: all devices on the ``dp`` axis, tp=1."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if shape is None:
        shape = (n,) + (1,) * (len(axis_names) - 1)
    if int(np.prod(shape)) != n:
        raise ValueError(f"mesh shape {shape} does not cover {n} devices")
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    """Shard the leading (batch) dimension over the data-parallel axis."""
    return NamedSharding(mesh, P(axis))


def shard_batch(mesh: Mesh, batch: Dict[str, Any], axis: str = "dp") -> Dict[str, Any]:
    sh = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def _tp_spec_for_leaf(path: str, leaf, tp_size: int, min_dim: int = 64):
    """Tensor-parallel PartitionSpec for one parameter leaf.

    Large 2D kernels get their output dim sharded over ``tp`` when the layer
    is a fan-out (fc1-style) and their input dim when it is a fan-in
    (fc2-style), mirroring Megatron-style column/row parallel MLPs. Everything
    else is replicated.
    """
    if tp_size <= 1 or leaf.ndim != 2:
        return P()
    rows, cols = leaf.shape
    if "mlp_fc1" in path or "fc1" in path:
        if cols >= min_dim and cols % tp_size == 0:
            return P(None, "tp")
    if "mlp_fc2" in path or "fc2" in path:
        if rows >= min_dim and rows % tp_size == 0:
            return P("tp", None)
    return P()


def param_pspecs(params, tp_size: int = 1):
    """PartitionSpec pytree for a parameter tree: replicated except the large
    MLP kernels, which are Megatron-sharded over ``tp``."""

    def spec(path, leaf):
        path_str = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        return _tp_spec_for_leaf(path_str, leaf, tp_size)

    return jax.tree_util.tree_map_with_path(spec, params)


def param_shardings(mesh: Mesh, params, tp_size: int = 1):
    specs = param_pspecs(params, tp_size)
    return jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s),
        specs,
        is_leaf=lambda x: isinstance(x, P),
    )


def shard_params(mesh: Mesh, params, tp_size: int = 1):
    sh = param_shardings(mesh, params, tp_size)
    return jax.tree_util.tree_map(jax.device_put, params, sh)
