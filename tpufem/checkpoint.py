"""Checkpoint / resume.

The reference has no persistence (SURVEY.md §5 — the closest artifact is
in-memory frame lists).  Here simulation state is a pytree of arrays, and
the steppers are pure functions of state, so checkpointing is exact:
save every K steps, reload, continue — the resumed trajectory is
bit-identical to an uninterrupted run (tested in tests/test_aux.py).

Format: ``.npz`` with flattened key paths (portable, no extra deps);
:func:`save_orbax`/:func:`load_orbax` wrap orbax-checkpoint for users who
want its async/versioned machinery.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np


def _flatten(state: dict, prefix: str = "") -> dict:
    out = {}
    for k, v in state.items():
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            out.update(_flatten(v, key + "/"))
        else:
            out[key] = np.asarray(v)
    return out


def save_state(path: str, state: dict, step: int | None = None) -> str:
    """Serialize a state pytree (dict of arrays / nested dicts) to .npz."""
    flat = _flatten(state)
    if step is not None:
        flat["__step__"] = np.asarray(step)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, **flat)
    return path


def load_state(path: str, dtype=None):
    """→ (state dict, step or None).  Nested keys ('a/b') are re-nested."""
    data = np.load(path)
    state: dict = {}
    step = None
    for key in data.files:
        if key == "__step__":
            step = int(data[key])
            continue
        parts = key.split("/")
        d = state
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        arr = data[key]
        if dtype is not None and np.issubdtype(arr.dtype, np.floating):
            arr = arr.astype(dtype)
        d[parts[-1]] = jnp.asarray(arr)
    return state, step


def save_orbax(directory: str, state: dict) -> str:
    """Checkpoint via orbax (versioned / async-capable backend)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(directory)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()
    return path


def load_orbax(directory: str, template: dict | None = None) -> dict:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(directory), template)


def checkpointed_run(problem, total_steps: int, every: int, directory: str,
                     state: dict | None = None):
    """Run a Stokes problem, writing a checkpoint every ``every`` steps.

    Returns (final_state, [checkpoint paths]).  Resume with
    ``load_state(path)`` → ``stokes.run(problem, steps, state=state)``.
    """
    from tpufem.workloads import stokes

    if state is None:
        state = stokes.initial_state(problem)
    paths = []
    done = 0
    while done < total_steps:
        chunk = min(every, total_steps - done)
        state, _ = stokes.run(problem, steps=chunk, state=state)
        done += chunk
        path = os.path.join(directory, f"ckpt_{done:08d}.npz")
        paths.append(save_state(path, state, step=done))
    return state, paths
