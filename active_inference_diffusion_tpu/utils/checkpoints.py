"""Orbax checkpointing: params, optimizer states, EMA, RNG, step, configs.

Counterpart of the reference's checkpoint utilities
(reference: active_inference_diffusion/utils/training.py:72-172). Improvements
over the reference: EMA shadow weights and the PRNG key ARE checkpointed (the
reference drops them, training.py:87-103), and a real ``--resume`` path exists
(the reference README advertises one that its entry point lacks,
README.md:77 vs examples/train_mujoco.py:443-456).
"""

from __future__ import annotations

import dataclasses
import json
import warnings
from pathlib import Path
from typing import Any, Dict, Tuple

import jax
import orbax.checkpoint as ocp

from ..agents.base import AgentTrainState
from ..configs.config import config_to_dict


def save_checkpoint(
    checkpoint_dir: str,
    state: AgentTrainState,
    step: int,
    episode_count: int = 0,
    exploration_noise: float = 0.0,
    config=None,
    training_config=None,
    keep_latest_alias: bool = True,
    replay_state=None,
    name: str | None = None,
    extra_meta: Dict[str, Any] | None = None,
) -> str:
    """Save the full train state plus host metadata. Writes
    ``checkpoint_<step>`` and refreshes a ``latest`` alias
    (reference: utils/training.py:72-122). ``name`` overrides the directory
    name (e.g. ``"best"`` for best-eval checkpointing, overwritten in
    place); ``extra_meta`` merges into meta.json.

    ``replay_state``: optionally checkpoint the device replay buffer too —
    the reference never does (utils/training.py:87-103), which makes resumed
    runs regress while the empty buffer refills with off-distribution data
    (observed: HalfCheetah eval -402 -> -600 right after resume)."""
    ckpt_dir = Path(checkpoint_dir).absolute()
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    path = ckpt_dir / (name if name is not None else f"checkpoint_{step}")

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path / "state", state, force=True)
        if replay_state is not None:
            ckptr.save(path / "replay", replay_state, force=True)

    meta = {
        "total_steps": step,
        "episode_count": episode_count,
        "exploration_noise": exploration_noise,
    }
    if config is not None:
        meta["config"] = config_to_dict(config)
        sem = getattr(config, "semantics", None)
        if sem is not None:
            # Persist the RESOLVED convention, not the raw (possibly-None)
            # field: a None saved before the round-4 default flip (b01ac4b)
            # meant "-eps/variance", afterwards "-eps/std" — ambiguous on
            # resume. See adopt_checkpoint_semantics().
            meta["score_target_convention_resolved"] = (
                "standard" if sem.score_target_uses_std else "reference"
            )
    if training_config is not None:
        meta["training_config"] = config_to_dict(training_config)
    if extra_meta:
        meta.update(extra_meta)
    with open(path / "meta.json", "w") as f:
        json.dump(meta, f, indent=2, default=str)

    if keep_latest_alias:
        latest = ckpt_dir / "latest"
        with open(ckpt_dir / "latest.txt", "w") as f:
            f.write(str(path))
        try:
            if latest.is_symlink() or latest.exists():
                latest.unlink()
            latest.symlink_to(path)
        except OSError:
            pass
    return str(path)


def resolve_checkpoint_path(path_or_dir: str) -> Path:
    """Accept a specific checkpoint dir, a checkpoints root (picks latest), or
    a ``latest`` alias."""
    p = Path(path_or_dir).absolute()
    if (p / "state").exists():
        return p
    if (p / "latest.txt").exists():
        return Path((p / "latest.txt").read_text().strip())
    candidates = sorted(
        p.glob("checkpoint_*"), key=lambda c: int(c.name.split("_")[-1])
    )
    if candidates:
        return candidates[-1]
    raise FileNotFoundError(f"No checkpoint found under {path_or_dir}")


def _same_structure(saved, template) -> bool:
    """True when the pytrees match in structure AND leaf shapes — a leaf
    whose shape changed (e.g. the dynamics group after resizing
    num_dynamics_ensemble) must be re-initialized, not restored."""
    if jax.tree_util.tree_structure(saved) != jax.tree_util.tree_structure(template):
        return False
    return all(
        getattr(s, "shape", None) == getattr(t, "shape", None)
        for s, t in zip(
            jax.tree_util.tree_leaves(saved), jax.tree_util.tree_leaves(template)
        )
    )


def _lenient_restore(ckptr, state_path, template_state: AgentTrainState):
    """Best-effort restore of a checkpoint whose pytree predates the current
    ``AgentTrainState`` (e.g. missing the ``posterior`` param group or the
    ``target_value`` field added later). Per top-level field / per param
    group: use the saved subtree when its structure matches the template,
    else keep the template's (fresh) value. Optimizer states whose structure
    changed restart fresh (a resumed run re-warms Adam moments in a few
    hundred steps; losing trained params would be far worse)."""
    raw = ckptr.restore(state_path)  # saved structure, nested dicts
    if not isinstance(raw, dict):
        raise TypeError(f"unexpected checkpoint payload: {type(raw)}")
    dropped = []

    def merge_groups(saved_groups, template_groups, label):
        out = {}
        for k, tv in template_groups.items():
            sv = saved_groups.get(k) if isinstance(saved_groups, dict) else None
            if sv is not None and _same_structure(sv, tv):
                out[k] = sv
            else:
                out[k] = tv
                dropped.append(f"{label}.{k}")
        return out

    new_params = merge_groups(raw.get("params", {}), template_state.params, "params")
    new_opt = merge_groups(
        raw.get("opt_states", {}), template_state.opt_states, "opt_states"
    )

    def field(name):
        sv = raw.get(name)
        tv = getattr(template_state, name)
        if sv is not None and _same_structure(sv, tv):
            return sv
        dropped.append(name)
        return tv

    ema_score = raw.get("ema_score")
    if ema_score is None or not _same_structure(ema_score, new_params["score"]):
        ema_score = jax.tree_util.tree_map(lambda x: x, new_params["score"])
        dropped.append("ema_score")
    target_value = raw.get("target_value")
    if target_value is None or not _same_structure(target_value, new_params["value"]):
        # Slow critic starts at the restored live critic, not at init.
        target_value = jax.tree_util.tree_map(lambda x: x, new_params["value"])
        dropped.append("target_value")

    reward_norm = template_state.reward_norm
    saved_norm = raw.get("reward_norm")
    if isinstance(saved_norm, dict):
        try:
            reward_norm = reward_norm.replace(**saved_norm)
        except TypeError:
            dropped.append("reward_norm")

    special = {
        "params": new_params,
        "opt_states": new_opt,
        "ema_score": ema_score,
        "target_value": target_value,
        "reward_norm": reward_norm,
    }
    # Every other train-state field migrates generically (saved value if the
    # structure matches, template value otherwise) — new fields added to
    # AgentTrainState need no checkpoint-migration code.
    kwargs = {
        f.name: special.get(f.name, ...) for f in dataclasses.fields(template_state)
    }
    kwargs = {
        name: (field(name) if value is ... else value)
        for name, value in kwargs.items()
    }
    state = template_state.replace(**kwargs)
    if dropped:
        print(
            "load_checkpoint: structure drift — reinitialized from template: "
            + ", ".join(dropped)
        )
    return state, dropped


def adopt_checkpoint_semantics(path_or_dir: str, config) -> None:
    """Reconcile the score-target convention between a checkpoint and the
    run config BEFORE any train function is built (ADVICE r4: the round-4
    default flip b01ac4b silently switches the training objective of
    pre-flip checkpoints resumed under unpinned presets).

    Reads only meta.json — safe to call before building the agent. If the
    run config does not pin ``score_target_convention``, the checkpoint's
    recorded convention is adopted in place; if the config pins a different
    convention than the checkpoint was trained under, the pin wins but a
    loud warning is emitted (that mismatch changes the objective mid-run).
    """
    try:
        path = resolve_checkpoint_path(path_or_dir)
    except FileNotFoundError:
        return
    meta_file = path / "meta.json"
    if not meta_file.exists():
        return
    meta = json.loads(meta_file.read_text())
    saved = meta.get("score_target_convention_resolved")
    if saved is None:
        raw = (meta.get("config") or {}).get("semantics", {}).get(
            "score_target_convention"
        )
        saved = raw  # may still be None for legacy unpinned checkpoints
    sem = getattr(config, "semantics", None)
    if sem is None:
        return
    current = "standard" if sem.score_target_uses_std else "reference"
    if saved is None:
        warnings.warn(
            f"checkpoint {path} predates score-target-convention persistence "
            f"and its config did not pin one; resuming under the current "
            f"convention ({current!r}). If the checkpoint was trained before "
            f"the round-4 default flip, pass score_target_convention: "
            f"reference explicitly."
        )
        return
    if saved == current:
        return
    if sem.score_target_convention is None:
        sem.score_target_convention = saved
        print(
            f"resume: adopting the checkpoint's score-target convention "
            f"{saved!r} (run config left it unpinned; current default is "
            f"{current!r}) so the training objective is unchanged across "
            f"the resume",
            flush=True,
        )
    else:
        warnings.warn(
            f"checkpoint {path} was trained under score_target_convention="
            f"{saved!r} but the run config pins {current!r} — the score "
            f"target scale will CHANGE at resume (config pin wins)."
        )


def load_checkpoint(
    path_or_dir: str, template_state: AgentTrainState, replay_template=None
) -> Tuple[AgentTrainState, Dict[str, Any]]:
    """Restore a train state (using ``template_state`` for structure/shapes)
    plus the host metadata dict (reference: utils/training.py:125-172).

    Checkpoints written before a pytree-structure change (new param group /
    train-state field) restore leniently: matching subtrees are kept, new
    ones start from the template (see ``_lenient_restore``).

    With ``replay_template`` (a ReplayState matching the saved shapes), a
    checkpointed replay buffer is restored too and returned in the metadata
    dict under ``"replay_state"`` (absent if the checkpoint has none)."""
    path = resolve_checkpoint_path(path_or_dir)
    with ocp.StandardCheckpointer() as ckptr:
        abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, template_state)
        try:
            state = ckptr.restore(path / "state", abstract)
        except Exception as strict_err:
            state, dropped = _lenient_restore(ckptr, path / "state", template_state)
            # Optimizer states ALWAYS drop under lenient restore (optax
            # namedtuples restore as raw dicts), so they don't indicate
            # drift. If nothing ELSE was dropped the checkpoint structure
            # matches the template — the strict failure was corruption or
            # an IO error, not format drift, and hiding it behind a
            # silently-degraded migration would be worse than failing.
            if not any(not d.startswith("opt_states") for d in dropped):
                raise strict_err
        replay_state = None
        if replay_template is not None and (path / "replay").exists():
            replay_abstract = jax.tree_util.tree_map(
                ocp.utils.to_shape_dtype_struct, replay_template
            )
            try:
                replay_state = ckptr.restore(path / "replay", replay_abstract)
            except Exception as e:
                # A buffer saved under a different --buffer-size / obs shape
                # is not worth failing the whole resume over — the caller
                # falls back to its replay-refill warmup.
                warnings.warn(
                    f"checkpointed replay buffer does not match the current "
                    f"template ({type(e).__name__}); resuming with a fresh "
                    f"buffer"
                )
    meta: Dict[str, Any] = {}
    meta_file = path / "meta.json"
    if meta_file.exists():
        meta = json.loads(meta_file.read_text())
    if replay_state is not None:
        meta["replay_state"] = replay_state
    return state, meta
