"""Checkpoint / resume for inverse-rendering state.

The reference has no checkpointing (SURVEY.md §5); the closest artifact
is its per-frame PPM dump.  The new framework optimizes scene parameters
(vertices, materials) over many steps on pod slices, so checkpointing is
a first-class design requirement.

Uses Orbax when available (the standard JAX checkpointing stack —
multi-host safe, async-capable), with a plain .npz fallback so the
capability never silently disappears.
"""

from __future__ import annotations

import os

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp
    _HAS_ORBAX = True
except Exception:  # pragma: no cover - environment without orbax
    _HAS_ORBAX = False


def save_checkpoint(path: str, state: dict, step: int,
                    use_orbax: bool | None = None) -> str:
    """Save a pytree-of-arrays state dict.  Returns the written path."""
    use_orbax = _HAS_ORBAX if use_orbax is None else use_orbax
    path = os.path.abspath(path)
    if use_orbax and _HAS_ORBAX:
        ckpt_dir = os.path.join(path, f"step_{step}")
        with ocp.PyTreeCheckpointer() as ckptr:
            ckptr.save(ckpt_dir, jax.device_get(state), force=True)
        return ckpt_dir
    os.makedirs(path, exist_ok=True)
    fn = os.path.join(path, f"step_{step}.npz")
    flat = {}
    leaves, treedef = jax.tree_util.tree_flatten_with_path(state)
    for keypath, leaf in leaves:
        key = "/".join(
            str(getattr(k, "key", getattr(k, "name", getattr(k, "idx", k))))
            for k in keypath)
        flat[key] = np.asarray(leaf)
    np.savez(fn, **flat)
    return fn


def load_checkpoint(path: str, step: int | None = None,
                    use_orbax: bool | None = None) -> dict:
    """Load the given (or latest) step.  Returns a flat {name: array}
    dict for .npz checkpoints or the saved pytree for Orbax ones."""
    use_orbax = _HAS_ORBAX if use_orbax is None else use_orbax
    path = os.path.abspath(path)
    if use_orbax and _HAS_ORBAX and not str(path).endswith(".npz"):
        steps = sorted(
            int(d.split("_")[1]) for d in os.listdir(path)
            if d.startswith("step_") and not d.endswith(".npz"))
        if steps:
            step = steps[-1] if step is None else step
            with ocp.PyTreeCheckpointer() as ckptr:
                return ckptr.restore(os.path.join(path, f"step_{step}"))
    # npz fallback
    if os.path.isdir(path):
        files = sorted(f for f in os.listdir(path) if f.endswith(".npz"))
        assert files, f"no checkpoints under {path}"
        if step is not None:
            fn = os.path.join(path, f"step_{step}.npz")
        else:
            fn = os.path.join(
                path, max(files, key=lambda f: int(f[5:-4])))
    else:
        fn = path
    with np.load(fn) as data:
        return {k: data[k] for k in data.files}


def latest_step(path: str) -> int | None:
    """Highest checkpointed step under path, or None."""
    path = os.path.abspath(path)
    if not os.path.isdir(path):
        return None
    steps = []
    for d in os.listdir(path):
        if d.startswith("step_"):
            tail = d[5:-4] if d.endswith(".npz") else d[5:]
            try:
                steps.append(int(tail))
            except ValueError:
                pass
    return max(steps) if steps else None
