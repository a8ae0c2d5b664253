"""Driver-contract smoke tests for __graft_entry__ (no heavy compiles)."""

import importlib.util
from pathlib import Path

import jax
import jax.numpy as jnp


def _load():
    spec = importlib.util.spec_from_file_location(
        "graft_entry", Path(__file__).resolve().parents[1] / "__graft_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_entry_traces():
    """entry() must return (jittable fn, example args); eval_shape traces the
    whole flagship forward without compiling."""
    mod = _load()
    fn, args = mod.entry()
    out = jax.eval_shape(fn, *args)
    assert out.shape == (256, 6)
    assert out.dtype == jnp.float32


def test_flagship_tiny_builds():
    mod = _load()
    agent, config = mod._flagship_agent(tiny=True)
    state = agent.init_train_state(jax.random.PRNGKey(0))
    assert set(state.params) >= {"score", "policy", "value", "dynamics"}
