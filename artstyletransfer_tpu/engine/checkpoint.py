"""Checkpoint / resume of an in-flight optimization.

The reference has NO persistence: a crash loses the job; the only
observable state is the latest streamed image (reference
task_executor.py:82-86, SURVEY §5). Here the full optimization state —
image buffer, optimizer state (Adam moments or the L-BFGS history), and the
step counter — round-trips through a single .npz file, so a job can resume
exactly where it stopped (bitwise: the state is the entire dynamic input of
the jitted chunk).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Tuple

import jax
import numpy as np

_MAGIC = "astt-checkpoint-v1"


def _flatten_state(tree: Any) -> Dict[str, np.ndarray]:
    leaves, treedef = jax.tree.flatten(tree)
    out = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    out["treedef_repr"] = np.array(str(treedef))
    return out


def save_checkpoint(path: str, x: jax.Array, opt_state: Any,
                    step: int) -> None:
    arrays = {"magic": np.array(_MAGIC), "x": np.asarray(x),
              "step": np.array(step)}
    for k, v in _flatten_state(opt_state).items():
        arrays[f"opt_{k}"] = v
    tmp = path + ".tmp"
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, path)  # atomic: a crash never leaves a torn checkpoint


def load_checkpoint(path: str, opt_state_template: Any
                    ) -> Tuple[np.ndarray, Any, int]:
    """Returns (x, opt_state, step). The template provides the pytree
    structure (build it with the job's init_fn)."""
    data = np.load(path, allow_pickle=False)
    if str(data["magic"]) != _MAGIC:
        raise ValueError(f"not an astt checkpoint: {path}")
    leaves, treedef = jax.tree.flatten(opt_state_template)
    new_leaves = []
    for i, leaf in enumerate(leaves):
        arr = data[f"opt_leaf_{i}"]
        if arr.shape != np.shape(leaf):
            raise ValueError(
                f"checkpoint leaf {i} shape {arr.shape} != expected "
                f"{np.shape(leaf)} (different config/shape?)")
        new_leaves.append(arr)
    opt_state = jax.tree.unflatten(treedef, new_leaves)
    return data["x"], opt_state, int(data["step"])
