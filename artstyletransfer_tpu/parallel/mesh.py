"""Device-mesh helpers.

The reference has no distributed execution at all — its only "parallelism"
is two asyncio jobs sharing one GPU behind a semaphore plus a commented-out
2-GPU round-robin (reference config.py:1, task_executor.py:9,
neural_style_transfer.py:238-243). The TPU-native equivalents:

- a 1-D 'jobs' mesh: independent style-transfer jobs sharded across chips
  (each job's whole pyramid on one chip, zero inter-chip traffic)
- a 2-D ('jobs', 'space') mesh: job batch across one axis, each job's
  pixel dimension sharded across the other so a single huge job (2K+,
  4-level) can span several chips' HBM; XLA inserts the halo exchanges
  and reductions over ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def jobs_mesh(n_devices: Optional[int] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """1-D mesh over independent jobs."""
    if devices is None:
        devices = jax.devices()[:n_devices] if n_devices else jax.devices()
    return Mesh(np.array(devices), axis_names=("jobs",))


def jobs_space_mesh(n_jobs: int, n_space: int,
                    devices: Optional[Sequence] = None) -> Mesh:
    """2-D mesh: job data-parallel axis x intra-job spatial axis."""
    if devices is None:
        devices = jax.devices()
    need = n_jobs * n_space
    if len(devices) < need:
        raise ValueError(f"need {need} devices, have {len(devices)}")
    arr = np.array(devices[:need]).reshape(n_jobs, n_space)
    return Mesh(arr, axis_names=("jobs", "space"))


def multislice_jobs_space_mesh(n_space: int = 1,
                               slice_devices: Optional[
                                   Sequence[Sequence]] = None) -> Mesh:
    """('jobs', 'space') mesh spanning multiple TPU slices (DCN scale-out).

    Style-transfer jobs are fully independent — the batched graph is a
    vmap whose only sharded axis is the batch (spmd_axis_name='jobs'), so
    the 'jobs' axis carries ZERO collectives and may safely cross the slow
    DCN boundary between slices. The 'space' axis DOES carry collectives
    (halo exchanges for pools/convs, psums for the losses), so every space
    group must stay inside one slice and ride ICI. This helper encodes that
    placement rule: each slice's devices form whole (job-row x n_space)
    blocks, and rows from successive slices are stacked along 'jobs'.

    slice_devices: explicit per-slice device lists (mainly for tests /
    virtual devices). By default, jax.devices() are grouped by their
    `slice_index` attribute; platforms that do not report one (CPU,
    single-slice TPU) collapse to a single group, making this a drop-in
    superset of jobs_space_mesh for any n_jobs = n_devices / n_space.
    """
    if slice_devices is None:
        groups: dict = {}
        for d in jax.devices():
            groups.setdefault(getattr(d, "slice_index", 0) or 0,
                              []).append(d)
        slice_devices = [groups[k] for k in sorted(groups)]
    if n_space < 1:
        raise ValueError(f"n_space must be >= 1, got {n_space}")
    rows = []
    for i, devs in enumerate(slice_devices):
        if not len(devs) or len(devs) % n_space:
            raise ValueError(
                f"slice {i} has {len(devs)} devices, not a non-zero "
                f"multiple of n_space={n_space}; a space group must not "
                f"straddle the DCN boundary")
        rows.append(np.array(devs).reshape(-1, n_space))
    arr = np.concatenate(rows, axis=0)
    return Mesh(arr, axis_names=("jobs", "space"))


def default_serving_mesh(n_space: int = 1) -> Optional[Mesh]:
    """The mesh the serving frontends (astt-queue, lab, bot) use when no
    explicit mesh is given: every visible device, as a multislice-aware
    ('jobs', 'space') mesh — so a reference user on a multi-chip host gets
    all chips without flags. Returns None on a single device (the
    mesh-free single-chip graphs compile leaner than a trivial 1-device
    mesh). n_space > 1 must divide each slice's device count
    (multislice_jobs_space_mesh validates).

    Gated by ASTT_SERVING_MESH: 'auto' (default) as above; 'none'
    disables frontend meshing entirely (the test suite forces 'none' so
    its 8 virtual devices don't shard every frontend graph 8 ways).
    """
    import os

    mode = os.environ.get("ASTT_SERVING_MESH", "auto").lower()
    if mode in ("none", "off", "0"):
        return None
    if mode != "auto":
        raise ValueError(
            f"ASTT_SERVING_MESH must be 'auto' or 'none', got {mode!r}")
    if len(jax.devices()) <= 1:
        return None
    return multislice_jobs_space_mesh(n_space)
