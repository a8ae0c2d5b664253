"""AOT policy serving: the acting path as a self-contained deployable artifact.

The reference has no serving story at all (SURVEY.md §1: "no serving path");
deployment there means carrying the full PyTorch model-building stack plus a
``torch.save`` checkpoint. Here the acting path — featurize -> belief sweep ->
policy head -> clip, exactly what ``agent.act(deterministic=...)`` runs — is
exported with :mod:`jax.export` into ONE serialized StableHLO program with the
trained parameters baked in as constants. The artifact:

- needs **no** model-building code, config objects, or checkpoint layout to
  run — only ``jax`` on a compatible backend (TPU serving binary, CPU canary);
- is shape-polymorphic over the batch axis by default, so one artifact serves
  any request batch;
- pins the acting semantics at export time (deterministic flag, sweep length,
  EMA substitution) instead of re-deriving them from config at load time;
- carries a JSON header (env, dims, dtype, export metadata) for the serving
  fleet's routing/validation.

Format (``.aidpol`` file)::

    b"AIDTPU-POLICY1\\n" | u32le header_len | header JSON (utf-8) | payload

where payload is ``jax.export.Exported.serialize()`` bytes. The loader
returns a :class:`ServedPolicy`: ``policy(obs, seed) -> actions``.

Randomness crosses the boundary as a uint32 seed scalar (folded into a PRNG
key inside the exported program) so callers never touch JAX key types.
"""

from __future__ import annotations

import dataclasses
import io
import json
import struct
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

MAGIC = b"AIDTPU-POLICY1\n"
FORMAT_VERSION = 1


def _policy_spec(agent) -> Tuple[Tuple[Any, ...], Any]:
    """(observation shape sans batch, dtype) the acting path expects."""
    pixel_shape = getattr(agent, "pixel_shape", None)
    if getattr(agent, "frame_stack", 1) > 1:
        return (agent.frame_stack, *pixel_shape), jnp.uint8
    if pixel_shape is not None and getattr(agent.config, "pixel_observation", False):
        return tuple(pixel_shape), jnp.uint8
    return (agent.observation_dim,), jnp.float32


def export_policy(
    agent,
    state,
    *,
    deterministic: bool = True,
    num_steps: Optional[int] = None,
    batch_size: Optional[int] = None,
    platforms: Optional[Tuple[str, ...]] = None,
    obs_dtype=None,
    meta: Optional[Dict[str, Any]] = None,
) -> bytes:
    """Export the agent's acting path with ``state``'s parameters baked in.

    Args:
      agent: a ``DiffusionStateAgent``/``DiffusionPixelAgent``.
      state: the ``AgentTrainState`` whose (EMA-substituted, see
        ``_acting_params``) parameters to bake into the program.
      deterministic: export the eval-mode action (mean policy head, no
        exploration noise). ``False`` exports the stochastic collect-mode
        path driven by the caller's seed.
      num_steps: belief-sweep length; ``None`` = the agent's full
        ``num_diffusion_steps`` (eval semantics). Pass
        ``training_config.collect_diffusion_steps`` for collect semantics.
      batch_size: fix the batch dimension; ``None`` exports a
        shape-polymorphic batch axis (one artifact, any request size).
      platforms: lowering platforms for the artifact (e.g. ``("tpu", "cpu")``)
        — ``None`` exports for the current default backend only.
      obs_dtype: override the observation dtype (e.g. ``jnp.float32`` for a
        pixel policy fed pre-normalized frames).
      meta: extra key/values merged into the artifact header.

    Returns the serialized artifact bytes (see module docstring for format).
    """
    params = jax.device_get(agent._acting_params(state))
    noise = np.zeros((), np.float32)  # serving never adds exploration noise

    def serve(observation, seed):
        key = jax.random.fold_in(jax.random.PRNGKey(0), seed)
        return agent._act_impl(
            params, key, observation, noise,
            deterministic=deterministic, num_steps=num_steps,
        )

    obs_shape, default_dtype = _policy_spec(agent)
    dtype = obs_dtype if obs_dtype is not None else default_dtype
    if batch_size is None:
        (b,) = jax_export.symbolic_shape("b")
    else:
        b = batch_size
    obs_spec = jax.ShapeDtypeStruct((b, *obs_shape), dtype)
    seed_spec = jax.ShapeDtypeStruct((), jnp.uint32)

    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = list(platforms)
    exported = jax_export.export(jax.jit(serve), **kwargs)(obs_spec, seed_spec)

    header = {
        "format_version": FORMAT_VERSION,
        "deterministic": deterministic,
        "num_steps": num_steps,
        "obs_shape": list(obs_shape),
        "obs_dtype": np.dtype(dtype).name,
        "batch": "polymorphic" if batch_size is None else batch_size,
        "action_dim": agent.action_dim,
        "env_name": getattr(agent.config, "env_name", None),
        "platforms": list(exported.platforms),
        "agent_class": type(agent).__name__,
        "jax_version": jax.__version__,
    }
    if meta:
        header.update(meta)

    payload = exported.serialize()
    head = json.dumps(header, sort_keys=True).encode()
    out = io.BytesIO()
    out.write(MAGIC)
    out.write(struct.pack("<I", len(head)))
    out.write(head)
    out.write(payload)
    return out.getvalue()


def save_policy(path: str, agent, state, **kwargs) -> Dict[str, Any]:
    """``export_policy`` straight to ``path``; returns the artifact header."""
    blob = export_policy(agent, state, **kwargs)
    with open(path, "wb") as f:
        f.write(blob)
    return _parse(blob)[0]


def _parse(blob: bytes) -> Tuple[Dict[str, Any], bytes]:
    if not blob.startswith(MAGIC):
        raise ValueError("not an AIDTPU policy artifact (bad magic)")
    off = len(MAGIC)
    (hlen,) = struct.unpack_from("<I", blob, off)
    off += 4
    header = json.loads(blob[off:off + hlen].decode())
    if header.get("format_version") != FORMAT_VERSION:
        raise ValueError(
            f"unsupported policy artifact version {header.get('format_version')}"
        )
    return header, blob[off + hlen:]


@dataclasses.dataclass
class ServedPolicy:
    """A loaded policy artifact: ``policy(obs, seed=0) -> actions``.

    ``meta`` is the artifact header. The call jit-compiles per concrete batch
    shape (cached by XLA); inputs/outputs are host numpy, suitable for a
    request/response serving loop.
    """

    meta: Dict[str, Any]
    _call: Any

    def __call__(self, observation: np.ndarray, seed: int = 0) -> np.ndarray:
        obs = np.asarray(observation)
        expected = tuple(self.meta["obs_shape"])
        squeeze = obs.ndim == len(expected)
        if squeeze:
            obs = obs[None]
        if obs.shape[1:] != expected:
            raise ValueError(
                f"observation shape {obs.shape[1:]} != artifact spec {expected}"
            )
        obs = obs.astype(self.meta["obs_dtype"], copy=False)
        act = np.asarray(self._call(obs, np.uint32(seed)))
        return act[0] if squeeze else act


def load_policy(path_or_bytes) -> ServedPolicy:
    """Load an artifact from a path or raw bytes. No model code required."""
    if isinstance(path_or_bytes, (bytes, bytearray)):
        blob = bytes(path_or_bytes)
    else:
        with open(path_or_bytes, "rb") as f:
            blob = f.read()
    header, payload = _parse(blob)
    exported = jax_export.deserialize(payload)
    call = jax.jit(exported.call)
    return ServedPolicy(meta=header, _call=call)
