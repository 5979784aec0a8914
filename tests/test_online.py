"""Online batching executor: live same-bucket jobs coalesce into one
vmapped batch (VERDICT r3 #1 — the serving path's TPU-native upgrade over
the reference's 2-at-a-time semaphore, reference task_executor.py:9)."""

import asyncio
import time

import numpy as np
import pytest

from artstyletransfer_tpu.config import Config
from artstyletransfer_tpu.engine.transfer import ContentStylePair
from artstyletransfer_tpu.runtime.online import OnlineBatchingExecutor


def _pair(seed=0, shape=(16, 16, 3)):
    rng = np.random.default_rng(seed)
    return ContentStylePair(
        ("c.jpg", rng.random(shape).astype(np.float32)),
        ("s.jpg", rng.random(shape).astype(np.float32)))


class FakeQueueRunner:
    """Records every run_job_queue call; completes all jobs instantly."""

    def __init__(self, delay_s=0.0, fail_ids=()):
        self.calls = []
        self.delay_s = delay_s
        self.fail_ids = set(fail_ids)

    def __call__(self, jobs, cfg, params=None, mesh=None, progress=None,
                 batch_policy="auto", max_batch=None, pad_batches=False,
                 retries=0, stream_images=True,
                 canonicalize_styles=False, canonicalize_contents=False):
        self.calls.append([j[0] for j in jobs])
        self.pad_batches = pad_batches
        self.stream_images = stream_images
        self.mesh = mesh
        if self.delay_s:
            time.sleep(self.delay_s)
        results, failures = {}, {}
        for tid, content, _style in jobs:
            if tid in self.fail_ids:
                failures[tid] = RuntimeError("poisoned")
                continue
            img = np.full_like(content, 0.5)
            if progress is not None:
                progress(tid, 50.0, img, 2.0)
                progress(tid, 100.0, img, 1.0)
            results[tid] = img
        return results, failures


def test_online_coalesces_concurrent_tasks_into_one_round():
    """4 concurrent same-bucket add_tasks -> ONE queue-runner call with all
    4 jobs (vs the reference running them 2-at-a-time)."""
    runner = FakeQueueRunner()
    ex = OnlineBatchingExecutor(Config(iters_num=2), verbose=False,
                                canonicalize=False, queue_runner=runner,
                                batch_window_s=0.05)

    async def go():
        for i in range(4):
            await ex.add_task(f"t{i}", _pair(i))
        await ex.run()

    asyncio.run(go())
    assert runner.calls == [["t0", "t1", "t2", "t3"]]
    assert ex.dispatch_rounds == 1
    # serving default: batch sizes pad to powers of two so the compile set
    # is bounded (and warmable) regardless of what the window coalesces
    assert runner.pad_batches is True

    async def check():
        for i in range(4):
            pct, img = await ex.get_progress(f"t{i}")
            assert pct == 100.0 and img is not None

    asyncio.run(check())


def test_online_forwards_mesh_to_queue():
    """The executor's mesh (default_serving_mesh in the frontends) reaches
    every dispatched round — on a multi-chip host the live path batches
    across all chips, not one."""
    from artstyletransfer_tpu.parallel import jobs_mesh

    runner = FakeQueueRunner()
    mesh = jobs_mesh(2)
    ex = OnlineBatchingExecutor(Config(iters_num=2), verbose=False,
                                canonicalize=False, queue_runner=runner,
                                mesh=mesh, batch_window_s=0.02)

    async def go():
        await ex.add_task("t0", _pair(0))
        await ex.run()

    asyncio.run(go())
    assert runner.mesh is mesh and runner.calls == [["t0"]]


def test_online_forwards_stream_images_to_queue():
    """stream_images=False reaches every dispatched round: headless serving
    can skip the per-chunk image D2H (run_job_queue still delivers final
    images on the last chunk)."""
    runner = FakeQueueRunner()
    ex = OnlineBatchingExecutor(Config(iters_num=2), verbose=False,
                                canonicalize=False, queue_runner=runner,
                                stream_images=False, batch_window_s=0.02)

    async def go():
        await ex.add_task("t0", _pair(0))
        await ex.run()

    asyncio.run(go())
    assert runner.stream_images is False and runner.calls == [["t0"]]
    # default stays on: serving frontends stream previews
    ex2 = OnlineBatchingExecutor(Config(iters_num=2), verbose=False,
                                 canonicalize=False, queue_runner=runner,
                                 batch_window_s=0.02)

    async def go2():
        await ex2.add_task("t1", _pair(1))
        await ex2.run()

    asyncio.run(go2())
    assert runner.stream_images is True


def test_online_arrivals_during_run_join_next_round():
    """Tasks arriving while a batch is optimizing accumulate and run as
    the NEXT vmapped round (join-at-creation semantics)."""
    runner = FakeQueueRunner(delay_s=0.3)
    ex = OnlineBatchingExecutor(Config(iters_num=2), verbose=False,
                                canonicalize=False, queue_runner=runner,
                                batch_window_s=0.02)

    async def go():
        await ex.add_task("a0", _pair(0))
        await ex.add_task("a1", _pair(1))
        await asyncio.sleep(0.15)  # round 1 is now inside the runner
        await ex.add_task("b0", _pair(2))
        await ex.add_task("b1", _pair(3))
        await ex.run()

    asyncio.run(go())
    assert runner.calls == [["a0", "a1"], ["b0", "b1"]]
    assert ex.dispatch_rounds == 2


def test_online_failures_isolated_and_reported():
    runner = FakeQueueRunner(fail_ids={"bad"})
    ex = OnlineBatchingExecutor(Config(iters_num=2), verbose=False,
                                canonicalize=False, queue_runner=runner,
                                batch_window_s=0.02)

    async def go():
        await ex.add_task("ok", _pair(0))
        await ex.add_task("bad", _pair(1))
        await ex.run()

    asyncio.run(go())
    assert set(ex.failures) == {"bad"}
    assert isinstance(ex.failures["bad"], RuntimeError)

    async def check():
        pct, _ = await ex.get_progress("ok")
        assert pct == 100.0

    asyncio.run(check())


def test_online_real_engine_runs_one_vmapped_batch(vgg_params, monkeypatch):
    """End-to-end with the REAL engine: 4 concurrent same-shape jobs run
    as ONE BatchedTransferJob of batch 4 (spied), every task completes
    with a real image."""
    import artstyletransfer_tpu.parallel.batch as batch_mod

    built = []
    real_cls = batch_mod.BatchedTransferJob

    class SpyBatch(real_cls):
        def __init__(self, contents, styles, *a, **kw):
            built.append(len(contents))
            super().__init__(contents, styles, *a, **kw)

    monkeypatch.setattr(batch_mod, "BatchedTransferJob", SpyBatch)

    cfg = Config(levels_num=1, iters_num=2, base_diameter=16,
                 optimizer="adam", stream_every=2)
    ex = OnlineBatchingExecutor(cfg, verbose=False, params=vgg_params,
                                canonicalize=True, batch_window_s=0.05)

    async def go():
        # same 16x16 source shape -> same canonical bucket
        for i in range(4):
            await ex.add_task(f"job{i}", _pair(i))
        await ex.run()

    asyncio.run(go())
    assert built == [4]  # one vmapped batch of 4, not 4 single jobs
    assert ex.failures == {}

    async def check():
        for i in range(4):
            pct, img = await ex.get_progress(f"job{i}")
            assert pct == 100.0
            assert img is not None and img.ndim == 3

    asyncio.run(check())


def test_online_aclose_cancels_dispatcher():
    """aclose() cancels the dispatcher task cleanly (idempotent) so
    short-lived embedders/harnesses exit without 'Task was destroyed but
    it is pending' teardown warnings."""
    runner = FakeQueueRunner()
    ex = OnlineBatchingExecutor(Config(iters_num=2), verbose=False,
                                canonicalize=False, queue_runner=runner,
                                batch_window_s=0.0)

    async def go():
        await ex.add_task("t", _pair(0))
        await ex.run()
        await ex.aclose()
        await ex.aclose()  # idempotent

    asyncio.run(go())
    assert ex.failures == {} and runner.calls == [["t"]]


def test_live_runner_join_budget_and_exit(vgg_params):
    """parallel.live.LiveBatchRunner: a task submitted mid-flight joins at
    the next chunk boundary (batch 1 -> 2), runs its FULL budget offset
    from the first task's, and each lane exits at its own 100%."""
    from artstyletransfer_tpu.parallel.live import LiveBatchRunner

    rng = np.random.default_rng(7)
    c1 = rng.random((48, 64, 3)).astype(np.float32)
    c2 = np.random.default_rng(123).random((48, 64, 3)).astype(np.float32)
    s = rng.random((40, 40, 3)).astype(np.float32)
    cfg = Config(levels_num=1, iters_num=20, base_diameter=16,
                 optimizer="adam", stream_every=5)
    r = LiveBatchRunner(cfg, params=vgg_params, chunk=5)
    r.submit("A", c1, s)
    rep = r.step()
    assert rep.joined == ["A"] and rep.batch == 1
    assert [(t, p) for t, p, _i, _l in rep.progress] == [("A", 25.0)]
    r.submit("B", c2, s)
    rep = r.step()
    assert rep.joined == ["B"] and rep.batch == 2
    assert [(t, p) for t, p, _i, _l in rep.progress] == [("A", 50.0),
                                                         ("B", 25.0)]
    finished = {}
    sizes = [1, 2]
    while r.active:
        rep = r.step()
        sizes.append(rep.batch)
        finished.update(rep.finished)
    # A exits at its 100% while B (3 chunks behind... 1 chunk behind)
    # finishes alone in a shrunken batch
    assert sizes == [1, 2, 2, 2, 1]
    assert sorted(finished) == ["A", "B"]
    for tid, (img, loss) in finished.items():
        assert img.ndim == 3 and np.isfinite(loss)


def test_live_runner_joined_job_matches_solo(vgg_params):
    """Joining must not change a job's math: the same job (same init
    noise seed) run joined-mid-flight vs alone lands on the same image up
    to cross-batch-size reduction-order noise (~1e-7; the per-lane
    step-offset chunk keeps its lr schedule aligned)."""
    from artstyletransfer_tpu.parallel.live import LiveBatchRunner

    rng = np.random.default_rng(7)
    c1 = rng.random((48, 64, 3)).astype(np.float32)
    c2 = np.random.default_rng(123).random((48, 64, 3)).astype(np.float32)
    s = rng.random((40, 40, 3)).astype(np.float32)
    cfg = Config(levels_num=1, iters_num=20, base_diameter=16,
                 optimizer="adam", stream_every=5)

    r = LiveBatchRunner(cfg, params=vgg_params, chunk=5)
    r.submit("A", c1, s)
    r.step()
    r.submit("B", c2, s)
    res = {}
    while r.active:
        res.update(r.step().finished)

    solo = LiveBatchRunner(cfg, params=vgg_params, chunk=5)
    solo._arrivals = 1  # align B's init-noise seed with its joined run
    solo.submit("B", c2, s)
    res2 = {}
    while solo.active:
        res2.update(solo.step().finished)
    np.testing.assert_allclose(res["B"][0], res2["B"][0],
                               rtol=1e-4, atol=1e-5)


def test_live_runner_stop_tol_exits_converged_lane(vgg_params):
    """stop_tol in live mode: a lane whose chunk change latches under tol
    leaves at the boundary with percent=100 while others keep going."""
    from artstyletransfer_tpu.parallel.live import LiveBatchRunner

    rng = np.random.default_rng(7)
    c1 = rng.random((48, 64, 3)).astype(np.float32)
    s = rng.random((40, 40, 3)).astype(np.float32)
    # tol so loose every chunk-to-chunk change satisfies it: the lane
    # exits at its SECOND chunk (first chunk has no previous loss)
    cfg = Config(levels_num=1, iters_num=100, base_diameter=16,
                 optimizer="adam", stream_every=5, stop_tol=1e9)
    r = LiveBatchRunner(cfg, params=vgg_params, chunk=5)
    r.submit("A", c1, s)
    rep1 = r.step()
    assert rep1.finished == {} and rep1.progress[0][1] == 5.0
    rep2 = r.step()
    assert "A" in rep2.finished
    assert rep2.progress[0][1] == 100.0
    assert not r.active


def test_online_live_bucket_failure_isolated(vgg_params, monkeypatch):
    """A runner whose step raises fails ONLY its own bucket's tasks
    (run_job_queue's bucket-isolation contract carried into live mode);
    the other bucket completes."""
    from artstyletransfer_tpu.parallel import live as live_mod

    real_step = live_mod.LiveBatchRunner.step

    def poisoned_step(self):
        if any(t.startswith("bad") for t in self.all_tids):
            raise RuntimeError("injected device failure")
        return real_step(self)

    monkeypatch.setattr(live_mod.LiveBatchRunner, "step", poisoned_step)

    cfg = Config(levels_num=1, iters_num=4, base_diameter=16,
                 optimizer="adam", stream_every=2)
    ex = OnlineBatchingExecutor(cfg, verbose=False, params=vgg_params,
                                canonicalize=False, batch_window_s=0.0)

    async def go():
        await ex.add_task("bad0", _pair(0))                    # 16x16
        await ex.add_task("good0", _pair(1, shape=(24, 16, 3)))
        await ex.run()

    asyncio.run(go())
    assert set(ex.failures) == {"bad0"}
    assert "injected device failure" in str(ex.failures["bad0"])

    async def check():
        pct, img = await ex.get_progress("good0")
        assert pct == 100.0 and img is not None

    asyncio.run(check())


def test_online_executor_live_join_bounds_newcomer_wait(vgg_params):
    """End-to-end through OnlineBatchingExecutor (batch_join default): a
    task added while a round is in flight gets its first progress BEFORE
    the in-flight task completes — the round-based path made it wait out
    the entire round (r4 VERDICT missing #1)."""
    events = []

    async def report(tid, value):
        events.append((tid, value[0]))

    cfg = Config(levels_num=1, iters_num=8, base_diameter=16,
                 optimizer="adam", stream_every=2)
    ex = OnlineBatchingExecutor(cfg, verbose=False, params=vgg_params,
                                canonicalize=False, batch_window_s=0.0,
                                report_progress=report)
    assert ex._use_live()

    async def go():
        await ex.add_task("A", _pair(0))
        waited = 0.0
        while not events and waited < 60:  # A's first chunk reported
            await asyncio.sleep(0.05)
            waited += 0.05
        await ex.add_task("B", _pair(1))
        await ex.run()

    asyncio.run(go())
    b_first = next(i for i, (t, p) in enumerate(events) if t == "B")
    a_done = next(i for i, (t, p) in enumerate(events)
                  if t == "A" and p >= 100.0)
    assert b_first < a_done, events
    assert events and ex.failures == {}

    async def check():
        for tid in ("A", "B"):
            pct, img = await ex.get_progress(tid)
            assert pct == 100.0 and img is not None

    asyncio.run(check())


def test_online_live_global_lane_budget(vgg_params):
    """Concurrent runners hold their batch states on the chip
    SIMULTANEOUSLY, so the live executor admits jobs FIFO only within a
    global padded-lane budget (max_batch) — an unbudgeted 20-job flood
    across 4 buckets RESOURCE_EXHAUSTED a real 16 GB chip (r5 drive).
    With budget 2, a 4-task flood across two shape buckets must still
    complete 4/4, never holding more than 2 reserved lanes."""
    from artstyletransfer_tpu.parallel import live as live_mod

    max_seen = 0
    real_step = live_mod.LiveBatchRunner.step

    def spy_step(self):
        nonlocal max_seen
        # reserved lanes across every runner in existence at dispatch time
        total = sum(r.lanes_reserved for r in runners_seen)
        max_seen = max(max_seen, total)
        return real_step(self)

    runners_seen = []
    real_init = live_mod.LiveBatchRunner.__init__

    def spy_init(self, *a, **kw):
        runners_seen.append(self)
        real_init(self, *a, **kw)

    live_mod.LiveBatchRunner.step = spy_step
    live_mod.LiveBatchRunner.__init__ = spy_init
    try:
        cfg = Config(levels_num=1, iters_num=4, base_diameter=16,
                     optimizer="adam", stream_every=2)
        ex = OnlineBatchingExecutor(cfg, verbose=False, params=vgg_params,
                                    canonicalize=False, batch_window_s=0.0,
                                    max_batch=2)

        async def go():
            for i in range(2):
                await ex.add_task(f"a{i}", _pair(i))                 # 16x16
            for i in range(2):
                await ex.add_task(f"b{i}", _pair(i, shape=(24, 16, 3)))
            await ex.run()

        asyncio.run(go())
    finally:
        live_mod.LiveBatchRunner.step = real_step
        live_mod.LiveBatchRunner.__init__ = real_init
    assert ex.failures == {}
    assert len(runners_seen) == 2  # two shape buckets
    assert max_seen <= 2, max_seen

    async def check():
        for tid in ("a0", "a1", "b0", "b1"):
            pct, _img = await ex.get_progress(tid)
            assert pct == 100.0

    asyncio.run(check())


def test_online_report_progress_callback_streams():
    """The report_progress coroutine (the bot's contract) fires per chunk
    with (task_id, (percent, image))."""
    seen = []

    async def report(tid, result):
        seen.append((tid, result[0], result[1] is not None))

    runner = FakeQueueRunner()
    ex = OnlineBatchingExecutor(Config(iters_num=2), verbose=False,
                                canonicalize=False, queue_runner=runner,
                                report_progress=report,
                                batch_window_s=0.02)

    async def go():
        await ex.add_task("t", _pair(0))
        await ex.run()

    asyncio.run(go())
    assert seen == [("t", 50.0, True), ("t", 100.0, True)]


def test_lab_online_mode(tmp_path):
    """The lab's --online path serves the demo pairs through the online
    batching executor: same routes, coalesced execution."""
    aiohttp = pytest.importorskip("aiohttp")  # noqa: F841
    from aiohttp.test_utils import TestClient, TestServer

    from artstyletransfer_tpu.frontends.lab import create_app

    from astt_fakes import _write_demo_images

    _write_demo_images(tmp_path)

    runner = FakeQueueRunner()
    executor = OnlineBatchingExecutor(Config(iters_num=2), verbose=False,
                                      canonicalize=False,
                                      queue_runner=runner,
                                      batch_window_s=0.05)
    app = create_app(config=Config(iters_num=2), data_dir=str(tmp_path),
                     pairs=[("c.jpg", "s.jpg"), ("c.jpg", "s.jpg")],
                     executor=executor, online=True)

    async def go():
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            for _ in range(100):
                await asyncio.sleep(0.05)
                ids = await executor.task_ids()
                if len(ids) == 2 and runner.calls:
                    done = [
                        (await executor.get_progress(i))[0] >= 100
                        for i in ids]
                    if all(done):
                        break
            assert len(runner.calls) == 1 and len(runner.calls[0]) == 2
            ids = await executor.task_ids()
            resp = await client.get(f"/generated/{ids[0]}")
            assert resp.status == 200
            assert (await resp.read())[:2] == b"\xff\xd8"
        finally:
            await client.close()

    asyncio.run(go())


def test_bot_online_mode_album_batches():
    """The bot's --online-batching path: two albums arriving together run
    as one coalesced round and both chats get their 'Done!' photo."""
    from test_frontends import FakeTelegramClient, _photo_message, \
        _jpeg_bytes
    from artstyletransfer_tpu.frontends.tlbot import StyleTransferBot

    client = FakeTelegramClient()
    for fid in ("c1", "s1", "c2", "s2"):
        client.files[fid] = _jpeg_bytes()

    async def go():
        b = StyleTransferBot(client, Config(iters_num=2), online=True)
        # swap the real queue runner for the fake (no engine compile in CI)
        b.executor.canonicalize = False
        b.executor.batch_window_s = 0.05
        ex_runner = FakeQueueRunner()
        b.executor.queue_runner = ex_runner
        await b.album_handler([
            _photo_message(100, "c1", "g1"), _photo_message(100, "s1", "g1")])
        await b.album_handler([
            _photo_message(200, "c2", "g2"), _photo_message(200, "s2", "g2")])
        await b.executor.run()
        await asyncio.sleep(0.05)
        return b, ex_runner

    bot, ex_runner = asyncio.run(go())
    assert len(ex_runner.calls) == 1 and len(ex_runner.calls[0]) == 2
    captions = [c for _, c in client.photos]
    assert captions.count("Done!") == 2
    assert bot.tasks_table == {}  # cleaned up at 100%
