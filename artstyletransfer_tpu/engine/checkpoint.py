"""Checkpoint / resume of an in-flight optimization.

The reference has NO persistence: a crash loses the job; the only
observable state is the latest streamed image (reference
task_executor.py:82-86, SURVEY §5). Here the full optimization state —
image buffer, optimizer state (Adam moments or the L-BFGS history), and the
step counter — round-trips through a single .npz file, so a job can resume
exactly where it stopped (bitwise: the state is the entire dynamic input of
the jitted chunk).

Checkpoints carry a CONFIG FINGERPRINT (the engine's graph cache key) and
per-leaf dtypes: resuming under a changed graph config (different
optimizer flags, compute dtype, loss weights, ...) fails loudly instead of
silently loading shape-compatible state into a different numerics graph.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np

_MAGIC = "astt-checkpoint-v1"

# np.savez writes ml_dtypes extended dtypes (bfloat16 — the only one we
# produce, via lbfgs_state_dtype='bfloat16') as raw void ('|V2'), which
# np.load cannot map back to a real dtype: the resume-side dtype check then
# rejects every bf16-history checkpoint with a misleading "different compute
# dtype" error. Store such arrays as a same-width integer view plus the real
# dtype name, and view back on load.
_EXT_DTYPE_STORAGE = {"bfloat16": np.uint16}


def _encode_array(v: np.ndarray):
    """-> (storable array, real dtype name or None if natively storable)."""
    name = v.dtype.name
    store_as = _EXT_DTYPE_STORAGE.get(name)
    if store_as is None:
        return v, None
    return v.view(store_as), name


def _decode_array(v: np.ndarray, dtype_name: Optional[str]) -> np.ndarray:
    if dtype_name is None:
        return v
    import ml_dtypes

    return v.view(np.dtype(getattr(ml_dtypes, dtype_name)))


def _flatten_state(tree: Any) -> Dict[str, np.ndarray]:
    leaves, treedef = jax.tree.flatten(tree)
    out = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    out["treedef_repr"] = np.array(str(treedef))
    return out


def save_checkpoint(path: str, x: jax.Array, opt_state: Any,
                    step: int, fingerprint: Optional[str] = None,
                    extra: Optional[Dict[str, Any]] = None,
                    aux: Optional[Dict[str, np.ndarray]] = None) -> None:
    """extra: small JSON-serializable host-side state saved alongside the
    device state — e.g. the convergence early-stop's latched/previous-loss
    bookkeeping (stop_tol), which must survive a resume or the resumed
    run would re-derive convergence later than the uninterrupted one.

    aux: named host-side ARRAYS saved alongside (keys must be valid npz
    names); e.g. the frozen result rows of batch lanes that already left
    a shrinking batched run. Loaded back with with_aux=True."""
    import json

    ext_dtypes: Dict[str, str] = {}

    def put(key: str, v: np.ndarray) -> None:
        stored, name = _encode_array(np.asarray(v))
        arrays[key] = stored
        if name is not None:
            ext_dtypes[key] = name

    arrays: Dict[str, np.ndarray] = {"magic": np.array(_MAGIC),
                                     "step": np.array(step)}
    put("x", x)
    if fingerprint is not None:
        arrays["fingerprint"] = np.array(fingerprint)
    if extra:
        arrays["extra_json"] = np.array(json.dumps(extra))
    for k, v in _flatten_state(opt_state).items():
        put(f"opt_{k}", v)
    if aux:
        for k, v in aux.items():
            put(f"aux_{k}", v)
    if ext_dtypes:
        arrays["ext_dtypes_json"] = np.array(json.dumps(ext_dtypes))
    tmp = path + ".tmp"
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, path)  # atomic: a crash never leaves a torn checkpoint


def peek_checkpoint_meta(path: str) -> tuple:
    """(step, extra) of a checkpoint WITHOUT a state template — npz
    archives load members lazily, so this touches only the small entries.
    A shrinking batched run needs the extra (its lane composition, hence
    the current batch size) BEFORE it can build the right-sized template
    for load_checkpoint."""
    import json

    data = np.load(path, allow_pickle=False)
    if str(data["magic"]) != _MAGIC:
        raise ValueError(f"not an astt checkpoint: {path}")
    extra = (json.loads(str(data["extra_json"]))
             if "extra_json" in data else {})
    return int(data["step"]), extra


def load_checkpoint(path: str, opt_state_template: Any,
                    fingerprint: Optional[str] = None,
                    with_extra: bool = False,
                    with_aux: bool = False):
    """Returns (x, opt_state, step) — plus extra with with_extra=True
    (the dict passed to save_checkpoint, {} when the file carries none),
    plus aux with with_aux=True (the named arrays passed to
    save_checkpoint). The template provides the pytree structure (build
    it with the job's init_fn).

    If both the caller and the file carry a fingerprint, they must match:
    a checkpoint written under one graph config (optimizer, dtype, loss
    weights, shapes) must not silently resume a different one. Files
    written before fingerprints existed load as before."""
    import json

    data = np.load(path, allow_pickle=False)
    if str(data["magic"]) != _MAGIC:
        raise ValueError(f"not an astt checkpoint: {path}")
    ext_dtypes: Dict[str, str] = {}
    if "ext_dtypes_json" in data:
        ext_dtypes = json.loads(str(data["ext_dtypes_json"]))
    if fingerprint is not None and "fingerprint" in data:
        saved = str(data["fingerprint"])
        if saved != fingerprint:
            raise ValueError(
                f"checkpoint {path} was written under a different engine "
                f"config and cannot resume this job.\n  saved:   {saved}\n"
                f"  current: {fingerprint}\nDelete the checkpoint (or "
                f"restore the original flags) to proceed.")
    leaves, treedef = jax.tree.flatten(opt_state_template)
    new_leaves = []
    for i, leaf in enumerate(leaves):
        key = f"opt_leaf_{i}"
        arr = _decode_array(data[key], ext_dtypes.get(key))
        if arr.shape != np.shape(leaf):
            raise ValueError(
                f"checkpoint leaf {i} shape {arr.shape} != expected "
                f"{np.shape(leaf)} (different config/shape?)")
        # metadata-only dtype read: np.asarray(leaf) would materialize the
        # leaf device-to-host (an L-BFGS history template is GBs, and this
        # host's tunnel moves ~4.5 MB/s — a resume must not fetch it)
        want_dtype = (leaf.dtype if hasattr(leaf, "dtype")
                      else np.asarray(leaf).dtype)
        if arr.dtype != want_dtype:
            raise ValueError(
                f"checkpoint leaf {i} dtype {arr.dtype} != expected "
                f"{want_dtype} (different compute dtype/config?)")
        new_leaves.append(arr)
    opt_state = jax.tree.unflatten(treedef, new_leaves)
    x_out = _decode_array(data["x"], ext_dtypes.get("x"))
    out = [x_out, opt_state, int(data["step"])]
    if with_extra:
        extra = {}
        if "extra_json" in data:
            extra = json.loads(str(data["extra_json"]))
        out.append(extra)
    if with_aux:
        out.append({k[len("aux_"):]: _decode_array(data[k],
                                                   ext_dtypes.get(k))
                    for k in data.files if k.startswith("aux_")})
    return tuple(out)
