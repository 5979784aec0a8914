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
