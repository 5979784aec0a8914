"""Live batching: jobs join and leave an in-flight batch at chunk
boundaries.

The round-based online executor (runtime/online.py) bounds a NEWCOMER's
wait by the whole in-flight round: tasks arriving mid-round accumulate
for the next one, which at the standard preset is minutes away — worse
than the reference's semaphore, which admits a newcomer the moment a
slot frees (reference task_executor.py:30). This module is the TPU-native
fix: one `LiveBatchRunner` per shape bucket owns an in-flight vmapped
batch whose composition changes at chunk boundaries —

- JOIN: pending jobs enter by rebuilding the batch at the next
  power-of-two ladder size (the serving warmup's compile set) and
  transplanting the surviving lanes' state rows (one fused scatter);
  the newcomer's wait is bounded by one chunk (~seconds).
- LEAVE: a lane that finished its budget (or latched a stop_tol
  convergence) freezes its result and is dropped at the next boundary —
  the per-job exit semantics of stop_shrink, generalized to budgets.
- PER-LANE STEP OFFSETS: the chunk dispatch vmaps over an (B,) int32
  start-step vector (parallel/batch._build_batched_runners'
  batched_chunk_steps), so a lane joined at global chunk 7 still runs
  ITS steps 0..k with its own lr-decay schedule. With a uniform vector
  the per-lane math is exactly the scalar variant's.

Each (cfg, shape, ladder-size) pair compiles once and is reused across
joins/leaves — the same executable set `engine.warmup` precompiles.
"""

from __future__ import annotations

import threading
from functools import partial
from typing import Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..engine.init_pipeline import build_init_image
from ..models.weights import load_vgg19_params
from ..utils.image import unprepare_img
from .batch import _gather_rows, resolve_group_cap

# NOTE: BatchedTransferJob is looked up through its module at call time
# (not imported at module load) so test spies patching
# parallel.batch.BatchedTransferJob see the live path too.


@partial(jax.jit, donate_argnums=(0,))
def _scatter_head(dst_tree, src_tree):
    """Overwrite rows [0:n_src] of every leaf's leading (batch) axis — the
    state transplant of a batch rebuild, fused into ONE executable per
    (structure, shape) pair like _gather_rows."""
    return jax.tree_util.tree_map(
        lambda d, s: d.at[: s.shape[0]].set(s), dst_tree, src_tree)


class StepReport(NamedTuple):
    """What one chunk dispatch produced, for the executor to report."""

    progress: List[tuple]          # (tid, percent, image|None, loss)
    finished: Dict[str, tuple]     # tid -> (final image, loss)
    joined: List[str]              # tids that entered at this boundary
    batch: int                     # dispatched (padded) batch size


class LiveBatchRunner:
    """One shape bucket's in-flight batch with boundary joins/leaves.

    Thread contract: submit() may be called from any thread (the
    executor's event loop); step() must be called from ONE worker thread
    at a time. Pending submissions are drained at the next boundary.
    """

    def __init__(self, cfg: Config, params=None, mesh=None,
                 max_batch: Optional[int] = 8,
                 stream_images: bool = True,
                 chunk: Optional[int] = None):
        self.cfg = cfg
        self.params = (params if params is not None
                       else load_vgg19_params(seed=cfg.seed))
        self.mesh = mesh
        self.max_batch = max_batch
        self.stream_images = stream_images
        self.chunk = max(1, chunk or cfg.stream_every)
        self.iters = cfg.iters_num
        self._lock = threading.Lock()
        self._pending: List[Tuple[str, np.ndarray, np.ndarray]] = []
        self._specs: Dict[str, tuple] = {}   # tid -> (content, style, init)
        self._arrivals = 0                   # seeds the per-job init noise
        self._bj: Optional[BatchedTransferJob] = None
        self._x = None
        self._opt = None
        self._lane_tid: List[Optional[str]] = []
        self._lane_steps: Optional[np.ndarray] = None
        self._exited: set = set()            # lanes to drop at the boundary
        self._f_prev: Dict[str, float] = {}
        self._latched: set = set()

    # -- intake ------------------------------------------------------------

    def submit(self, task_id: str, content: np.ndarray,
               style: np.ndarray) -> None:
        with self._lock:
            self._pending.append((task_id, content, style))

    @property
    def active(self) -> bool:
        with self._lock:
            if self._pending:
                return True
        return self._bj is not None

    @property
    def live_tids(self) -> List[str]:
        return [t for t in self._lane_tid if t is not None]

    @property
    def all_tids(self) -> List[str]:
        """Live + queued-for-join task ids (what a progress table must
        consider alive)."""
        with self._lock:
            pending = [t for t, _c, _s in self._pending]
        return self.live_tids + pending

    @property
    def lanes_reserved(self) -> int:
        """Padded lanes this runner's batch occupies (or will occupy at
        its next boundary, once queued joins enter) — the HBM accounting
        unit for the executor's GLOBAL lane budget. Every resident lane
        (padding replicas included) carries full optimizer state."""
        with self._lock:
            pend = len(self._pending)
        live = len([ln for ln, t in enumerate(self._lane_tid)
                    if t is not None and ln not in self._exited])
        n = live + pend
        want = (1 << (n - 1).bit_length()) if n else 0
        cur = len(self._lane_tid) if self._bj is not None else 0
        return max(cur, want)

    # -- boundary maintenance ----------------------------------------------

    def _capacity(self, content_shape) -> int:
        jobs_axis = (dict(self.mesh.shape).get("jobs", 1)
                     if self.mesh is not None else 1)
        return resolve_group_cap(self.cfg, content_shape, jobs_axis,
                                 "batched", self.max_batch)

    def _rebuild(self, joins) -> List[str]:
        """Re-form the batch: surviving lanes first, then `joins`, padded
        to the next power of two; transplant survivors' state rows."""
        survivors = [lane for lane, tid in enumerate(self._lane_tid)
                     if tid is not None and lane not in self._exited]
        live_tids = [self._lane_tid[lane] for lane in survivors]
        for tid, content, style in joins:
            rng = np.random.default_rng(self.cfg.seed + self._arrivals)
            self._arrivals += 1
            init_img, _ = build_init_image(self.cfg.init_method, content,
                                           style, self.cfg, rng=rng)
            self._specs[tid] = (content, style, init_img)
        new_tids = [tid for tid, _c, _s in joins]
        tids = live_tids + new_tids
        if not tids:
            self._bj = None
            self._x = self._opt = None
            self._lane_tid, self._lane_steps = [], None
            self._exited = set()
            return []
        n = len(tids)
        pad_to = 1 << (n - 1).bit_length()

        old_state = None
        if survivors and self._bj is not None:
            # pull the surviving rows out BEFORE the old buffers go away
            idx = jnp.asarray(survivors, dtype=jnp.int32)
            old_state = _gather_rows((self._x, self._opt), idx)
        old_steps = ([int(self._lane_steps[lane]) for lane in survivors]
                     if self._lane_steps is not None else [])
        # release the FULL old batch now (the gather holds the survivor
        # rows): constructing the new batch + its init eval below would
        # otherwise double-book HBM against the old buffers — at
        # production L-BFGS state sizes that transient is the difference
        # between a rebuild and a RESOURCE_EXHAUSTED
        self._bj = None
        self._x = self._opt = None

        from . import batch as batch_mod

        contents = [self._specs[t][0] for t in tids]
        styles = [self._specs[t][1] for t in tids]
        inits = [self._specs[t][2] for t in tids]
        self._bj = batch_mod.BatchedTransferJob(
            contents, styles, self.cfg, params=self.params, mesh=self.mesh,
            init_overrides=inits, pad_batch_to=pad_to)
        self._x = jnp.array(self._bj._x0, copy=True)
        self._opt = self._bj._init_fn(self._bj.params, self._bj.targets,
                                      self._x)
        if old_state is not None:
            # one fused scatter: survivors keep their exact trajectory
            self._x, self._opt = _scatter_head((self._x, self._opt),
                                               old_state)
        self._lane_tid = (tids
                          + [None] * (self._bj.batch - n))
        self._lane_steps = np.zeros((self._bj.batch,), dtype=np.int64)
        self._lane_steps[: len(old_steps)] = old_steps
        self._exited = set()
        # drop specs of jobs no longer in the batch (memory hygiene)
        gone = set(self._specs) - set(tids)
        for tid in gone:
            del self._specs[tid]
        return new_tids

    # -- one chunk ---------------------------------------------------------

    def step(self) -> StepReport:
        """Boundary maintenance (leave + join + rebuild), then ONE chunk.

        Returns the chunk's per-task progress and any finished tasks.
        Raises on device failure — the caller owns isolation/retries."""
        with self._lock:
            joins, self._pending = self._pending, []
        joined: List[str] = []
        composition_changes = bool(self._exited) or bool(joins)
        if self._bj is None or composition_changes:
            if joins:
                # honor the HBM/saturation capacity: overflow joins wait
                # for lanes to free up at a later boundary
                cap = self._capacity(joins[0][1].shape)
                live_now = len([ln for ln, t in enumerate(self._lane_tid)
                                if t is not None
                                and ln not in self._exited])
                room = max(0, cap - live_now)
                if room < len(joins):
                    keep, overflow = joins[:room], joins[room:]
                    with self._lock:
                        self._pending = overflow + self._pending
                    joins = keep
            joined = self._rebuild(joins)
        if self._bj is None:
            return StepReport([], {}, [], 0)

        bj = self._bj
        k = self.chunk
        batch_dispatched = len(self._lane_tid)
        steps_dev = jnp.asarray(self._lane_steps, dtype=jnp.int32)
        if self.mesh is not None and self.mesh.devices.size > 1:
            from jax.sharding import NamedSharding, PartitionSpec as P

            steps_dev = jax.device_put(steps_dev,
                                       NamedSharding(self.mesh, P()))
        self._x, self._opt, f = bj._chunk_steps_fn(
            bj.params, bj.targets, self._x, self._opt, steps_dev, int(k))
        self._lane_steps = self._lane_steps + k

        f_np = np.asarray(f)
        top = bj.level_shapes[0]
        rows = None
        if self.stream_images:
            rows = np.asarray(self._x).reshape((len(self._lane_tid),)
                                               + top[1:])
        check_stop = self.cfg.stop_tol > 0.0
        progress: List[tuple] = []
        finished: Dict[str, tuple] = {}
        for lane, tid in enumerate(self._lane_tid):
            if tid is None:
                continue
            loss = float(f_np[lane])
            if self.cfg.nan_checks and not np.isfinite(loss):
                raise FloatingPointError(
                    f"non-finite loss for live task {tid} at lane step "
                    f"{int(self._lane_steps[lane])}")
            steps = int(self._lane_steps[lane])
            done_budget = steps >= self.iters
            if check_stop and not done_budget:
                prev = self._f_prev.get(tid)
                if (tid in self._latched
                        or (prev is not None
                            and abs(prev - loss)
                            <= self.cfg.stop_tol * max(1.0, abs(loss)))):
                    self._latched.add(tid)
                    done_budget = True  # converged: leave at this boundary
                self._f_prev[tid] = loss
            if done_budget:
                if rows is not None:
                    img = unprepare_img(rows[lane])
                else:
                    img = unprepare_img(
                        np.asarray(self._x[lane]).reshape(top[1:]))
                finished[tid] = (img, loss)
                self._exited.add(lane)
                self._f_prev.pop(tid, None)
                self._latched.discard(tid)
                progress.append((tid, 100.0, img, loss))
            else:
                pct = steps / self.iters * 100.0
                progress.append((tid, pct,
                                 unprepare_img(rows[lane])
                                 if rows is not None else None,
                                 loss))
        if all(tid is None or lane in self._exited
               for lane, tid in enumerate(self._lane_tid)):
            # every live lane left this boundary: release the batch state
            # now instead of burning one no-op step() on an empty rebuild
            with self._lock:
                drained = not self._pending
            if drained:
                self._rebuild([])
        return StepReport(progress, finished, joined, batch_dispatched)

    def fail_all(self) -> List[str]:
        """Drop every live + pending task (device failure): returns their
        ids so the caller can record the failures."""
        with self._lock:
            pending, self._pending = self._pending, []
        tids = self.live_tids + [t for t, _c, _s in pending]
        self._bj = None
        self._x = self._opt = None
        self._lane_tid, self._lane_steps = [], None
        self._exited = set()
        self._specs.clear()
        self._f_prev.clear()
        self._latched.clear()
        return tids
