"""Online batching executor: live serving through the vmapped TPU path.

The reference's serving model runs N jobs "2 at a time" behind a global
semaphore (reference task_executor.py:9, config.py:1) — each concurrent
request owns the whole accelerator alternately. This executor is the
TPU-native replacement for LIVE traffic (Telegram bot, lab): concurrent
`add_task`s are canonicalized onto the serving shape buckets
(parallel/batch.py), held for a short coalescing window, and dispatched as
ONE vmapped, mesh-sharded batch per bucket instead of interleaved
single-job runs — measured 3-8x aggregate job-steps/s for Adam and
reference-semantics L-BFGS queues (PARITY.md).

Scheduling semantics (batch_join=True, the default — r5):
- LIVE JOINS: per-bucket `parallel.live.LiveBatchRunner`s own the
  in-flight batches; a task arriving while its bucket is optimizing
  enters the batch at the next CHUNK boundary (state transplant + the
  per-lane step-offset chunk), so time-to-first-progress is bounded by
  ~one chunk rather than a whole round — the TPU answer to the
  reference's semaphore admitting a newcomer the moment a slot frees
  (reference task_executor.py:30). Active buckets run round-robin, one
  chunk each. The policy routing still applies: sequential-policy
  configs (lr-opening full-Wolfe) fall back to the round mode below.
- ROUND mode (batch_join=False, injected queue_runners, or
  sequential-policy configs): everything pending when the chip frees up
  (plus a `batch_window_s` coalescing window) forms the next dispatch
  round through `parallel.run_job_queue` — 'auto' vmaps Adam,
  ref-semantics L-BFGS, and unit-opening full-Wolfe buckets
  (resolve_batch_policy), buckets split HBM-aware (max_jobs_per_batch),
  and a poisoned bucket fails in isolation; tasks arriving mid-round
  accumulate for the following round.
- The API is a drop-in for runtime.executor.Executor (add_task /
  get_progress / task_ids / run / failures / report_progress callback),
  so the frontends swap executors behind a flag.
"""

from __future__ import annotations

import asyncio
from functools import partial
from typing import Any, Callable, Dict, List, Optional, Tuple

import numpy as np

from .executor import call_in_loop, prune_progress, record_failure


class OnlineBatchingExecutor:
    """Drop-in Executor that coalesces live same-bucket jobs into vmapped
    batches (the reference's 2-at-a-time semaphore, re-imagined for a
    device that prefers one big batch over interleaved small jobs)."""

    def __init__(self, config, report_progress=None, engine=None,
                 verbose: bool = True, metrics=None, params=None,
                 mesh=None, max_batch: Optional[int] = 8,
                 report_failure=None,
                 batch_window_s: float = 0.25,
                 canonicalize: bool = True,
                 batch_policy: str = "auto",
                 pad_batches: bool = True,
                 retries: int = 0,
                 stream_images: bool = True,
                 queue_runner: Optional[Callable] = None,
                 batch_join: bool = True):
        # `engine` is accepted for signature parity with Executor but the
        # unit of execution here is the batched queue; tests inject
        # `queue_runner` instead.
        del engine
        self.__config = config
        self.__report_progress = report_progress
        self.__report_failure = report_failure
        self.__verbose = verbose
        self.metrics = metrics
        self.params = params
        self.mesh = mesh
        # default 8: bounds BOTH the padded-size ladder {1,2,4,8} (one
        # compiled executable each — what --warmup precompiles) and the
        # worst-case warmup time; bursts beyond 8 split into size-8 rounds.
        # None = the HBM/saturation cap (up to 32), at the cost of cold
        # compiles at sizes warmup never saw.
        self.max_batch = max_batch
        self.batch_window_s = batch_window_s
        self.canonicalize = canonicalize
        self.batch_policy = batch_policy
        # serving default ON: compile set bounded to power-of-two batch
        # sizes so --warmup can cover every executable a coalescing window
        # can produce (a novel size = a minutes-long cold compile mid-serve)
        self.pad_batches = pad_batches
        # re-run a failed round's jobs (transient TPU-worker crashes
        # recover in ~20s; see run_job_queue retries)
        self.retries = retries
        # stream_images=False: progress callbacks receive images=None on
        # intermediate chunks (final images still delivered) — skips the
        # per-chunk device->host image fetch for headless/latency-bound
        # serving (same knob as run_job_queue)
        self.stream_images = stream_images
        self.queue_runner = queue_runner  # injectable (tests)
        # chunk-boundary joins (parallel/live.LiveBatchRunner): a task
        # arriving while its bucket is optimizing enters the in-flight
        # batch at the next chunk boundary instead of waiting out the
        # whole round — time-to-first-progress is bounded by one chunk.
        # Buckets run round-robin, one chunk each, so a NEW bucket's
        # first chunk is also at most (active buckets) chunks away.
        # Injected queue_runners (tests) keep the round semantics.
        self.batch_join = batch_join
        self._runners: Dict[tuple, Any] = {}  # bucket -> LiveBatchRunner
        self.__progress: Dict[str, tuple] = {}
        self.__progress_lock = asyncio.Lock()
        self.__pending: List[Tuple[str, np.ndarray, np.ndarray]] = []
        self.__pending_lock = asyncio.Lock()
        self.__wake: Optional[asyncio.Event] = None
        self.__idle: Optional[asyncio.Event] = None
        self.__dispatcher: Optional[asyncio.Task] = None
        self.__busy = False
        self.__round_ids: frozenset = frozenset()  # tasks in flight
        self.failures: Dict[str, BaseException] = {}
        self.dispatch_rounds = 0  # observability: rounds actually run

    # -- progress table (same copy-on-read contract as Executor) ----------

    async def get_progress(self, key):
        async with self.__progress_lock:
            value = self.__progress[key]
            return (value[0],
                    value[1].copy() if value[1] is not None else None)

    async def progress(self):
        async with self.__progress_lock:
            for pr in self.__progress.items():
                yield pr

    async def task_ids(self):
        async with self.__progress_lock:
            return list(self.__progress.keys())

    async def set_progress(self, key, value):
        async with self.__progress_lock:
            self.__progress[key] = (
                value[0], value[1].copy() if value[1] is not None else None)
            # live = queued + in-flight tasks, plus the entry being
            # written (add_task seeds progress before queuing). Plain
            # reads without the pending lock: safe in asyncio (no await
            # between read and use) and only an eviction heuristic.
            live = {tid for tid, _c, _s in self.__pending}
            live.update(self.__round_ids)
            live.add(key)
            prune_progress(self.__progress, self.failures, live)

    # -- task intake -------------------------------------------------------

    async def add_task(self, task_id: str, content_n_style):
        """Queue a job; same-bucket jobs pending at dispatch time run as
        one vmapped batch. Canonicalization (aspect-bucket crop + resize)
        happens here so bucketing and the warmup shapes agree."""
        content = np.asarray(content_n_style.content[1])
        style = np.asarray(content_n_style.style[1])
        if self.canonicalize:
            from ..parallel.batch import (canonicalize_content,
                                          canonicalize_style)

            # bicubic resize of multi-megapixel photos is CPU-bound; keep
            # it off the event loop so polling/HTTP stay responsive while
            # a user's upload is being canonicalized
            loop = asyncio.get_running_loop()
            content, style = await loop.run_in_executor(
                None, lambda: (canonicalize_content(content, self.__config),
                               canonicalize_style(style, self.__config)))
        await self.set_progress(task_id, (-1, None))
        if self.metrics is not None:
            self.metrics.log("task_added", task=task_id)
        async with self.__pending_lock:
            self.__pending.append((task_id, content, style))
        self._ensure_dispatcher()
        self.__idle.clear()
        self.__wake.set()
        if self.__verbose:
            print(f"Task {task_id} queued (online batching)")

    # -- dispatch ----------------------------------------------------------

    def _ensure_dispatcher(self):
        loop = asyncio.get_running_loop()
        if self.__dispatcher is None or self.__dispatcher.done() \
                or getattr(self, "_loop", None) is not loop:
            # (re)create per event loop, like Executor's semaphore re-bind.
            # A round interrupted by the previous loop's teardown never ran
            # its `finally` (the dispatcher task died with the loop), so
            # clear the busy flag too — otherwise run(forever=False) on the
            # new loop waits on it forever.
            self._loop = loop
            self.__busy = False
            self.__wake = asyncio.Event()
            # set while the executor is drained (nothing pending, nothing
            # in flight): run() waits on this instead of busy-polling
            self.__idle = asyncio.Event()
            self.__idle.set()
            self.__dispatcher = loop.create_task(self._dispatch_loop())
            if self.__pending:
                # jobs queued under the previous loop would otherwise wait
                # on a fresh never-set event forever (benign unlocked read:
                # a concurrent add_task sets the event itself)
                self.__idle.clear()
                self.__wake.set()

    async def _dispatch_loop(self):
        while True:
            await self.__wake.wait()
            self.__wake.clear()
            # coalescing window: let near-simultaneous requests (album
            # uploads, demo-batch enqueue loops) join this round
            if self.batch_window_s > 0:
                await asyncio.sleep(self.batch_window_s)
            async with self.__pending_lock:
                jobs, self.__pending = self.__pending, []
            if not jobs:
                # spurious wake (e.g. two add_tasks drained by one round):
                # still drained — signal, or run() would wait forever
                if not self.__wake.is_set():
                    self.__idle.set()
                continue
            self.__busy = True
            self.__round_ids = frozenset(tid for tid, _c, _s in jobs)
            try:
                if self._use_live():
                    await self._run_live(jobs)
                else:
                    await self._run_round(jobs)
            except Exception as e:  # noqa: BLE001 — keep serving
                for tid, _c, _s in jobs:
                    await self._record_failure(tid, e)
            finally:
                self.__busy = False
                self.__round_ids = frozenset()
                # signal drained-ness to run(): nothing pending and no
                # wake queued. The check-and-set is synchronous after the
                # lock, so an interleaved add_task either set __wake first
                # (seen here) or clears __idle right after — run()
                # re-verifies under the lock before returning either way.
                async with self.__pending_lock:
                    empty = not self.__pending
                if empty and not self.__wake.is_set():
                    self.__idle.set()

    async def _run_round(self, jobs):
        from ..parallel.batch import run_job_queue

        runner = self.queue_runner or run_job_queue
        loop = asyncio.get_running_loop()
        self.dispatch_rounds += 1
        if self.__verbose:
            print(f"online batch round: {len(jobs)} job(s)")

        def progress_cb(tid, pct, img, loss):
            # called from the worker thread: hop back into the loop
            # (call_in_loop drops the update when the server is shutting
            # down mid-round instead of failing every in-flight job)
            try:
                call_in_loop(loop, self._report(tid, pct, img, loss))
            except Exception:  # noqa: BLE001
                # a frontend's report hook failing (e.g. one user's
                # Telegram send hitting a network blip) must not fail the
                # whole coalesced batch — log and keep optimizing
                import traceback

                traceback.print_exc()
                return

        results, failures = await loop.run_in_executor(
            None, partial(
                runner, jobs, self.__config, params=self.params,
                mesh=self.mesh, progress=progress_cb,
                batch_policy=self.batch_policy, max_batch=self.max_batch,
                pad_batches=self.pad_batches, retries=self.retries,
                stream_images=self.stream_images,
                # shapes were canonicalized at add_task; re-canonicalizing
                # inside the queue would be a no-op either way
                canonicalize_styles=False, canonicalize_contents=False))
        for tid in results:
            if self.metrics is not None:
                self.metrics.log("task_done", task=tid)
            if self.__verbose:
                print(f"Task {tid} done")
        for tid, exc in failures.items():
            await self._record_failure(tid, exc)

    def _use_live(self):
        """Chunk-boundary joins engage only where vmapping is the measured
        win: the 'auto'/'batched' policy routes (resolve_batch_policy).
        Sequential-policy configs (lr-opening full-Wolfe: vmapping is a
        ~2x lockstep loss) and injected queue_runners (tests) keep the
        round path."""
        if not self.batch_join or self.queue_runner is not None:
            return False
        from ..parallel.batch import resolve_batch_policy

        return resolve_batch_policy(self.__config,
                                    self.batch_policy) == "batched"

    async def _run_live(self, jobs):
        """Serve through per-bucket LiveBatchRunners until drained.

        One chunk per active runner per cycle (round-robin over buckets —
        one device, sequential dispatch). BETWEEN chunks the pending list
        is re-drained, so tasks that arrived while a chunk was computing
        join their bucket's batch at the very next boundary (or start a
        new bucket's runner next cycle) — the wait the round-based path
        imposed (the whole in-flight round) is gone. A runner whose step
        raises fails ONLY its own bucket's tasks (same isolation contract
        as run_job_queue's buckets).

        GLOBAL lane budget: unlike the round path (one bucket's batch
        resident at a time), concurrent runners hold their batch states
        on the chip SIMULTANEOUSLY — an unbudgeted 20-job flood across 4
        buckets put ~4 full production L-BFGS batches in 16 GB of HBM and
        RESOURCE_EXHAUSTED every one of them (r5 drive). Jobs therefore
        enter runners FIFO only while the total reserved (padded) lanes
        stay within `max_batch`; the overflow waits in the executor's
        pending list and flows in as lanes free up."""
        from ..parallel.live import LiveBatchRunner

        loop = asyncio.get_running_loop()
        self.dispatch_rounds += 1
        lane_budget = max(1, self.max_batch or 8)

        def feed(batch_jobs):
            """Admit jobs up to the global lane budget; returns deferred."""
            used = sum(r.lanes_reserved for r in self._runners.values())
            deferred = []
            for i, (tid, content, style) in enumerate(batch_jobs):
                if used >= lane_budget:
                    deferred = batch_jobs[i:]
                    break
                key = (content.shape, style.shape)
                runner = self._runners.get(key)
                if runner is None:
                    runner = self._runners[key] = LiveBatchRunner(
                        self.__config, params=self.params, mesh=self.mesh,
                        max_batch=self.max_batch,
                        stream_images=self.stream_images)
                before = runner.lanes_reserved
                runner.submit(tid, content, style)
                used += runner.lanes_reserved - before
            return deferred

        async def requeue(deferred):
            if deferred:
                async with self.__pending_lock:
                    self.__pending = deferred + self.__pending

        await requeue(feed(jobs))
        rr = 0  # round-robin cursor over buckets
        while True:
            # mid-flight arrivals + budget-deferred jobs: drain and feed
            # at every chunk boundary
            async with self.__pending_lock:
                fresh, self.__pending = self.__pending, []
            if fresh:
                # the wake these jobs set stays set: one spurious outer-
                # loop spin after we drain is cheaper than the lost-job
                # race of clearing a wake a concurrent add_task just set
                await requeue(feed(fresh))
            active = [(key, r) for key, r in self._runners.items()
                      if r.active]
            if not active:
                async with self.__pending_lock:
                    drained = not self.__pending
                if drained:
                    break
                continue
            self.__round_ids = frozenset(
                tid for _k, r in active for tid in r.all_tids)
            key, runner = active[rr % len(active)]
            rr += 1
            try:
                report = await loop.run_in_executor(None, runner.step)
            except Exception as e:  # noqa: BLE001 — bucket isolation
                for tid in runner.fail_all():
                    await self._record_failure(tid, e)
                del self._runners[key]
                continue
            for tid in report.joined:
                if self.metrics is not None:
                    self.metrics.log("task_joined", task=tid,
                                     batch=report.batch)
                if self.__verbose:
                    print(f"Task {tid} joined live batch "
                          f"(size {report.batch})")
            for tid, pct, img, loss in report.progress:
                await self._report(tid, pct, img, loss)
            for tid in report.finished:
                if self.metrics is not None:
                    self.metrics.log("task_done", task=tid)
                if self.__verbose:
                    print(f"Task {tid} done")

    async def _report(self, tid, pct, img, loss):
        await self.set_progress(tid, (pct, img))
        if self.metrics is not None:
            self.metrics.log("progress", task=tid, percent=pct, loss=loss)
        if self.__report_progress is not None:
            await self.__report_progress(tid, (pct, img))

    async def _record_failure(self, tid, exc):
        record_failure(
            self.failures, tid, exc,
            (lambda event, task_id: self.metrics.log(event, task=task_id))
            if self.metrics is not None else None)
        if self.__report_failure is not None:
            try:
                await self.__report_failure(tid, exc)
            except Exception:  # noqa: BLE001 — best-effort notification
                import traceback

                traceback.print_exc()

    # -- lifecycle ---------------------------------------------------------

    async def aclose(self):
        """Cancel the dispatcher task cleanly (harnesses/short-lived
        embedders; the serving frontends keep dispatching for the process
        lifetime). Queued-but-unstarted jobs are dropped; call run()
        first to drain."""
        if self.__dispatcher is not None and not self.__dispatcher.done():
            self.__dispatcher.cancel()
            try:
                await self.__dispatcher
            except (asyncio.CancelledError, Exception):  # noqa: BLE001
                pass
        self.__dispatcher = None

    async def run(self, forever: bool = False):
        """Wait until every queued job has been dispatched and finished;
        with forever=True keep serving (Executor.run contract).

        Event-driven: waits on the dispatcher's drained signal instead of
        busy-polling (r4 review). forever mode keeps a slow keep-alive
        tick only — new work is driven entirely by add_task's wake."""
        self._ensure_dispatcher()
        while True:
            await self.__idle.wait()
            # re-verify synchronously: the signal may be stale across an
            # interleaved add_task or an event-loop re-bind
            async with self.__pending_lock:
                drained = not self.__pending
            if drained and not self.__busy and not self.__wake.is_set():
                if not forever:
                    return
                await asyncio.sleep(1.0)  # keep-alive; not a latency path
            else:
                # woken stale: the dispatcher will re-signal when drained
                self.__idle.clear()
