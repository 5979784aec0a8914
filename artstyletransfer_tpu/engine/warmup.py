"""Precompilation warmup for serving.

XLA compiles one executable per (pyramid shape, config); a cold compile of
the full optimization step takes minutes on TPU. Serving frontends that
canonicalize incoming images to the standard aspect buckets
(parallel/batch.py) therefore only ever need len(DEFAULT_ASPECT_BUCKETS)
graphs — this module compiles them ahead of time so the first user request
is fast. (The reference framework is eager torch and has no analogue.)
"""

from __future__ import annotations

import sys
import time
from typing import Optional, Sequence

import numpy as np

from ..config import Config
from ..parallel.batch import (DEFAULT_ASPECT_BUCKETS,  # noqa: F401
                              bucket_content_shape)


def warmup_serving(cfg: Config, online: bool,
                   aspects: Optional[Sequence[float]] = None) -> int:
    """The frontends' shared --warmup entry point: precompile every
    serving aspect bucket; with online batching, the exact (batch sizes,
    mesh) combination online rounds dispatch (online_warmup_plan).
    Returns the number of executables warmed. `aspects` narrows the
    bucket list (tests)."""
    sizes = None
    mesh = None
    if online:
        from ..parallel.mesh import default_serving_mesh

        sizes, mesh = online_warmup_plan(cfg, default_serving_mesh())
    kwargs = {} if aspects is None else {"aspects": aspects}
    return warmup_aspect_buckets(cfg, batch_sizes=sizes, mesh=mesh,
                                 **kwargs)


def online_warmup_plan(cfg: Config, mesh,
                       batch_policy: str = "auto",
                       max_batch: int = 8):
    """(batch_sizes, mesh) covering exactly the executables online-batching
    rounds dispatch, mirroring run_job_queue's routing rules:

    - a 'batched'-routed config compiles the padded power-of-two ladder
      {1, 2, ..., max_batch} on the serving mesh (runtime/online.py
      pad_batches);
    - a 'sequential'-routed config (full-Wolfe L-BFGS by measured policy)
      compiles single-job batches, and on a multi-job mesh run_job_queue
      dispatches those WITHOUT the mesh (parallel/batch.py group_mesh:
      single-job groups are never padded across a jobs axis) — so the
      warm executable must drop the mesh too, or the first live user
      still hits the cold compile warmup exists to prevent.
    """
    from ..parallel.batch import planned_round_sizes, resolve_batch_policy

    policy = resolve_batch_policy(cfg, batch_policy)
    jobs_axis = (mesh.shape["jobs"]
                 if mesh is not None and "jobs" in mesh.axis_names else 1)
    if policy != "batched":
        return (1,), (mesh if jobs_axis == 1 else None)
    # live round sizes are unknown ahead of time: warm the union of the
    # sizes every possible round 1..max_batch dispatches (the shape arg
    # only matters when max_batch is implicit, which it never is here)
    shape = (cfg.base_diameter, cfg.base_diameter, 3)
    n_devices = 1 if mesh is None else int(mesh.devices.size)
    sizes = sorted({s for n in range(1, max_batch + 1)
                    for s in planned_round_sizes(
                        cfg, shape, n, jobs_axis=jobs_axis,
                        max_batch=max_batch, mesh_devices=n_devices)})
    return tuple(sizes), mesh


def warmup_aspect_buckets(cfg: Config, params=None,
                          aspects: Sequence[float] = DEFAULT_ASPECT_BUCKETS,
                          verbose: bool = True,
                          steps: Optional[int] = None,
                          batch_sizes: Optional[Sequence[int]] = None,
                          mesh=None) -> int:
    """Compile and run one chunk of the engine for every aspect bucket.

    Returns the number of executables warmed. Uses dummy images; the
    compiled executables are keyed only by shape + config, so subsequent
    real jobs (canonicalized to these buckets) reuse them.

    batch_sizes warms the VMAPPED batched runners instead (one executable
    per (bucket, size)) — the graphs online batching actually dispatches
    when its policy routes a round batched. Pass the same power-of-two
    sizes the online executor pads to (runtime/online.py pad_batches), so
    no coalesced round ever hits a cold compile mid-serve.

    mesh must match the mesh the serving path will dispatch with (the
    executable is keyed on the sharding too): pass the same
    default_serving_mesh() the online executor holds on multi-chip hosts.
    Sizes that pad to the same jobs-axis multiple dedup via the compile
    cache.
    """
    from .transfer import TransferJob

    n = 0
    for aspect in aspects:
        h, w = bucket_content_shape(aspect, cfg)
        content = np.full((h, w, 3), 0.5, np.float32)
        style = np.full((cfg.base_diameter, cfg.base_diameter, 3), 0.5,
                        np.float32)
        k = steps if steps is not None else cfg.stream_every
        for size in (batch_sizes or (None,)):
            t0 = time.time()
            if size is None:
                job = TransferJob(content, style, cfg, params=params)
            else:
                from ..parallel.batch import BatchedTransferJob

                job = BatchedTransferJob([content] * size, [style] * size,
                                         cfg, params=params, mesh=mesh)
            for _ in job.run(iters_num=k, stream_every=k,
                             yield_images=False):
                pass
            n += 1
            if size is not None:
                # shrink-gather executables for every (size -> pow2) pair
                # convergence shrinking can dispatch from this batch
                # (no-op unless cfg.stop_tol/stop_shrink enable it)
                n += job.warm_shrink_gathers()
                # the per-lane-step chunk variant live serving dispatches
                # (runtime/online.py batch_join — the r5 default)
                n += job.warm_live_chunk(k)
            if verbose:
                tag = "" if size is None else f" batch={size}"
                print(f"warmup: aspect {aspect:.3f} ({h}x{w}){tag} ready "
                      f"in {time.time() - t0:.1f}s", file=sys.stderr)
    return n
