"""Round-4 hardening: per-job load-failure isolation (queue CLI + lab),
bounded executor failure table, and the explicit max_batch/jobs-axis cap."""

import asyncio
import json

import numpy as np
import pytest

from artstyletransfer_tpu.config import Config
from artstyletransfer_tpu.parallel.batch import resolve_group_cap
from artstyletransfer_tpu.runtime import executor as executor_mod
from artstyletransfer_tpu.runtime.executor import Executor


@pytest.fixture(autouse=True)
def fresh_semaphore():
    # exception-safe (the hand-rolled trailing reset_semaphore() calls
    # this replaces were skipped whenever an assertion failed mid-test)
    executor_mod.reset_semaphore()
    yield
    executor_mod.reset_semaphore()


# ---------------------------------------------------------------------------
# Per-job load-failure isolation
# ---------------------------------------------------------------------------

from astt_fakes import _write_demo_images  # noqa: E402


def test_queue_cli_load_jobs_isolates_bad_images(tmp_path):
    """A missing/corrupt image fails only its job; the rest load."""
    from artstyletransfer_tpu.frontends import queue_cli

    _write_demo_images(tmp_path)
    c = str(tmp_path / "content-images" / "c.jpg")
    s = str(tmp_path / "style-images" / "s.jpg")
    corrupt = tmp_path / "corrupt.jpg"
    corrupt.write_bytes(b"not a jpeg")
    manifest = tmp_path / "jobs.jsonl"
    manifest.write_text(
        json.dumps({"id": "good", "content": c, "style": s}) + "\n"
        + json.dumps({"id": "missing", "content": str(tmp_path / "no.jpg"),
                      "style": s}) + "\n"
        + json.dumps({"id": "corrupt", "content": str(corrupt),
                      "style": s}) + "\n")
    ns = queue_cli.build_parser().parse_args(
        ["--manifest", str(manifest), "--output-dir", str(tmp_path)])
    jobs, load_failures = queue_cli.load_jobs(ns)
    assert [j[0] for j in jobs] == ["good"]
    assert sorted(load_failures) == ["corrupt", "missing"]
    for exc in load_failures.values():
        assert isinstance(exc, Exception)


def test_queue_cli_load_failure_exit_code_and_completion(tmp_path, capsys):
    """End-to-end: one bad image path -> that job fails (exit code 1,
    stderr, metrics) while the good job completes and is written."""
    from artstyletransfer_tpu.frontends import queue_cli

    _write_demo_images(tmp_path)
    c = str(tmp_path / "content-images" / "c.jpg")
    s = str(tmp_path / "style-images" / "s.jpg")
    manifest = tmp_path / "jobs.jsonl"
    manifest.write_text(
        json.dumps({"id": "good", "content": c, "style": s}) + "\n"
        + json.dumps({"id": "bad", "content": str(tmp_path / "no.jpg"),
                      "style": s}) + "\n")
    out = tmp_path / "out"
    metrics = tmp_path / "m.jsonl"
    rc = queue_cli.main([
        "--manifest", str(manifest), "--output-dir", str(out),
        "--metrics", str(metrics), "--optimizer", "adam", "--levels", "1",
        "--iters", "2", "--base-diameter", "16", "--stream-every", "2",
        "--compute-dtype", "float32", "--quiet"])
    assert rc == 1
    assert [p.name for p in out.glob("*.jpg")] == ["good.jpg"]
    assert "FAILED bad" in capsys.readouterr().err
    events = [json.loads(l) for l in metrics.read_text().splitlines()]
    assert {"event": "task_failed", "task": "bad"} == \
        {k: v for k, v in events[-1].items() if k in ("event", "task")}


def test_lab_load_failure_renders_failed_card(tmp_path):
    """A pair whose image is missing renders a FAILED card; the other
    pairs still run (the reference raises on the first missing file,
    reference lab.py:117-118)."""
    aiohttp = pytest.importorskip("aiohttp")  # noqa: F841
    from aiohttp.test_utils import TestClient, TestServer

    from artstyletransfer_tpu.frontends.lab import create_app

    _write_demo_images(tmp_path)

    async def fake_engine(pair, *args, **kwargs):
        yield 100.0, np.full((8, 8, 3), 0.5, np.float32)

    app = create_app(config=Config(iters_num=2), data_dir=str(tmp_path),
                     pairs=[("c.jpg", "s.jpg"), ("missing.jpg", "s.jpg")],
                     engine=fake_engine)

    async def go():
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            for _ in range(100):
                await asyncio.sleep(0.05)
                ids = await app["executor"].task_ids()
                if len(ids) == 2 and app["executor"].failures:
                    break
            ids = await app["executor"].task_ids()
            assert len(ids) == 2
            assert len(app["executor"].failures) == 1
            resp = await client.get("/")
            assert resp.status == 200
            html = await resp.text()
            assert "FAILED" in html
        finally:
            await client.close()

    asyncio.run(go())


# ---------------------------------------------------------------------------
# Bounded failure table
# ---------------------------------------------------------------------------

def test_executor_failures_bounded(monkeypatch):
    """A long-lived serving process must not grow .failures forever;
    the oldest entries age out past MAX_RECORDED_FAILURES."""
    monkeypatch.setattr(executor_mod, "MAX_RECORDED_FAILURES", 5)

    async def failing_engine(pair, *args, **kwargs):
        raise RuntimeError("boom")
        yield  # pragma: no cover — makes this an async generator

    async def go():
        ex = Executor(Config(iters_num=1), engine=failing_engine,
                      verbose=False)
        for i in range(8):
            await ex.add_task(f"t{i}", object())
        await ex.run()
        return ex

    ex = asyncio.run(go())
    assert len(ex.failures) == 5
    # insertion order: the oldest three aged out
    assert sorted(ex.failures) == ["t3", "t4", "t5", "t6", "t7"]


# ---------------------------------------------------------------------------
# Reshape pool (the space-sharding-clean lowering)
# ---------------------------------------------------------------------------

def test_pool_impls_identical_forward():
    """'reshape' (the space-sharded default since round 4) must match
    'reduce_window' and 'slices' exactly, including odd-dim flooring."""
    import jax.numpy as jnp

    from artstyletransfer_tpu.models.vgg19 import _maxpool2

    rng = np.random.default_rng(3)
    for shape in ((1, 8, 12, 4), (1, 7, 9, 4), (2, 16, 16, 3)):
        x = jnp.asarray(rng.random(shape).astype(np.float32))
        ref = np.asarray(_maxpool2(x, "reduce_window"))
        np.testing.assert_array_equal(np.asarray(_maxpool2(x, "slices")), ref)
        np.testing.assert_array_equal(np.asarray(_maxpool2(x, "reshape")), ref)


def test_constrained_space_gate_and_numerics(vgg_params):
    """The constrained sharded graph's safety gate: shapes below
    32*space at the lowest pyramid level are excluded (one such shape
    measurably MISCOMPUTED relu5_1 by 16x in the value_and_grad graph —
    round-4 finding), and at a gate-passing shape the constrained batch
    loss must equal the single-chip batch loss."""
    import jax.numpy as jnp

    from artstyletransfer_tpu.config import Config as Cfg
    from artstyletransfer_tpu.parallel.batch import (BatchedTransferJob,
                                                     constrained_space_ok)
    from artstyletransfer_tpu.parallel.mesh import jobs_space_mesh

    # gate arithmetic: lowest level shortest side >= 32 * space
    assert not constrained_space_ok([(1, 64, 64, 3), (1, 32, 32, 3)], 2)
    assert constrained_space_ok([(1, 128, 128, 3), (1, 64, 64, 3)], 2)
    assert constrained_space_ok([(1, 2048, 3072, 3), (1, 1024, 1536, 3),
                                 (1, 512, 768, 3), (1, 256, 384, 3)], 8)
    assert not constrained_space_ok([(1, 256, 384, 3)], 16)

    # numeric agreement at a gate-passing shape (1 level, 64px, space=2)
    cfg = Cfg(levels_num=1, iters_num=1, base_diameter=64,
              optimizer="adam", stream_every=1)
    rng = np.random.default_rng(7)
    contents = [rng.random((64, 64, 3)).astype(np.float32)
                for _ in range(4)]
    styles = [rng.random((32, 32, 3)).astype(np.float32) for _ in range(4)]
    mesh = jobs_space_mesh(4, 2)
    cons = BatchedTransferJob(contents, styles, cfg, params=vgg_params,
                              mesh=mesh, shard_space=True)
    assert cons.cfg.pool_impl == "reshape"  # the constrained path engaged
    single = BatchedTransferJob(contents, styles, cfg, params=vgg_params)
    x = jnp.array(cons._x0, copy=True)
    st = cons._init_fn(cons.params, cons.targets, x)
    _x, _st, f_cons = cons._chunk_fn(cons.params, cons.targets, x, st,
                                     jnp.int32(0), 1)
    x1 = jnp.array(single._x0, copy=True)
    st1 = single._init_fn(single.params, single.targets, x1)
    _x1, _st1, f_one = single._chunk_fn(single.params, single.targets, x1,
                                        st1, jnp.int32(0), 1)
    np.testing.assert_allclose(np.asarray(f_cons), np.asarray(f_one),
                               rtol=1e-4)

    # a below-gate shape must fall back to the legacy (un-constrained)
    # path rather than compute on the degenerate sharded graph
    cfg_small = Cfg(levels_num=2, iters_num=1, base_diameter=32,
                    optimizer="adam", stream_every=1)
    small = BatchedTransferJob(contents, styles, cfg_small,
                               params=vgg_params, mesh=mesh,
                               shard_space=True)
    assert small.cfg.pool_impl == "slices"  # legacy SPMD pool, no constraints


def test_extract_features_pool_impls_agree(vgg_params):
    from artstyletransfer_tpu.models.vgg19 import extract_features

    rng = np.random.default_rng(4)
    x = rng.random((1, 32, 48, 3)).astype(np.float32)
    feats = {impl: extract_features(vgg_params, x, pool_impl=impl)
             for impl in ("reduce_window", "slices", "reshape")}
    for a, b in zip(feats["reduce_window"], feats["reshape"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)
    for a, b in zip(feats["slices"], feats["reshape"]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


# ---------------------------------------------------------------------------
# Explicit max_batch vs the mesh jobs axis
# ---------------------------------------------------------------------------

def test_resolve_group_cap_respects_jobs_axis():
    cfg = Config(optimizer="adam", levels_num=1, base_diameter=16)
    shape = (16, 24, 3)
    # explicit cap rounds DOWN to a multiple of the jobs axis so padding
    # cannot exceed it (6 jobs on a 4-way axis would pad a group of 6 to 8)
    assert resolve_group_cap(cfg, shape, 4, "batched", 6) == 4
    assert resolve_group_cap(cfg, shape, 4, "batched", 8) == 8
    assert resolve_group_cap(cfg, shape, 1, "batched", 6) == 6
    # a cap below one axis-width is kept (padding to the axis is the
    # smallest physically runnable batch) and never rounds to zero
    assert resolve_group_cap(cfg, shape, 4, "batched", 3) == 3
    # sequential policy always runs one at a time
    assert resolve_group_cap(cfg, shape, 4, "sequential", 6) == 1
    # default path: HBM-aware per-device cap x jobs axis
    assert resolve_group_cap(cfg, shape, 2, "batched", None) == \
        2 * resolve_group_cap(cfg, shape, 1, "batched", None)


# ---------------------------------------------------------------------------
# Round-4 self-review fixes
# ---------------------------------------------------------------------------

def test_bench_align_steps_closes_timed_window():
    """The timed window closes on a `done == total_timed` chunk boundary;
    a step count the chunk does not divide must be aligned UP, not left
    to silently never sync (single-job) or crash on a None rate (batched)."""
    import sys as _sys

    _sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent.parent))
    import bench

    assert bench.align_steps(120, 50) == 150
    assert bench.align_steps(100, 50) == 100
    assert bench.align_steps(10, 50) == 50
    assert bench.align_steps(101, 100) == 200
    assert bench.align_steps(1, 1) == 1


def test_planned_round_sizes_mirrors_dispatch():
    from artstyletransfer_tpu.parallel.batch import planned_round_sizes

    cfg = Config(optimizer="adam", levels_num=1, base_diameter=16)
    shape = (16, 24, 3)
    # 6 jobs pad up the power-of-two ladder to one batch-8 round
    assert planned_round_sizes(cfg, shape, 6, max_batch=8) == [8]
    # 9 jobs split into a full batch-8 round plus a batch-1 remainder
    assert planned_round_sizes(cfg, shape, 9, max_batch=8) == [1, 8]
    assert planned_round_sizes(cfg, shape, 8, max_batch=8) == [8]
    assert planned_round_sizes(cfg, shape, 3, max_batch=8) == [4]
    # exact batches without padding
    assert planned_round_sizes(cfg, shape, 6, max_batch=8,
                               pad_batches=False) == [6]
    # a jobs axis pads every batched size to a multiple of the axis
    assert planned_round_sizes(cfg, shape, 1, jobs_axis=4,
                               max_batch=8) == [4]
    # sequential routing (full-Wolfe L-BFGS) always dispatches batch 1
    seq = Config(optimizer="lbfgs", levels_num=1, base_diameter=16)
    assert planned_round_sizes(seq, shape, 6, jobs_axis=4,
                               max_batch=8) == [1]


def test_online_warmup_plan_matches_queue_routing():
    """--warmup must compile the same (size, mesh) executables
    run_job_queue dispatches — including the sequential path's mesh-drop
    on a multi-job mesh (parallel/batch.py group_mesh)."""
    from artstyletransfer_tpu.engine.warmup import online_warmup_plan
    from artstyletransfer_tpu.parallel.mesh import jobs_space_mesh

    adam = Config(optimizer="adam", levels_num=1, base_diameter=16)
    wolfe = Config(optimizer="lbfgs", levels_num=1, base_diameter=16)

    mesh = jobs_space_mesh(4, 2)
    sizes, warm_mesh = online_warmup_plan(adam, mesh)
    assert warm_mesh is mesh
    assert sizes == (4, 8)  # every size padded to the 4-way jobs axis
    sizes, warm_mesh = online_warmup_plan(adam, None)
    assert warm_mesh is None
    assert sizes == (1, 2, 4, 8)
    # sequential-routed configs dispatch single-job batches WITHOUT the
    # mesh when it has a multi-job axis: warming with the mesh would
    # compile an executable the live path never uses
    sizes, warm_mesh = online_warmup_plan(wolfe, mesh)
    assert (sizes, warm_mesh) == ((1,), None)
    space_only = jobs_space_mesh(1, 8)
    sizes, warm_mesh = online_warmup_plan(wolfe, space_only)
    assert (sizes, warm_mesh) == ((1,), space_only)


def test_prune_progress_evicts_aged_out_failures():
    """A failed task whose failure record aged out of the failure cap
    must still be evictable from the progress table (it is no longer
    live), or a forever-serving bot leaks one image per failed task."""
    import unittest.mock as mock

    progress = {}
    for i in range(6):
        # failed mid-run: percent < 100, failure record already aged out
        progress[f"dead{i}"] = (40.0, None)
    progress["running"] = (50.0, None)
    progress["queued"] = (-1, None)

    with mock.patch.object(executor_mod, "MAX_PROGRESS_ENTRIES", 3):
        # without liveness info the dead entries are indistinguishable
        # from running tasks: nothing is evicted
        snapshot = dict(progress)
        executor_mod.prune_progress(progress, {})
        assert progress == snapshot
        # with the caller's live set they age out oldest-first
        executor_mod.prune_progress(progress, {},
                                    live={"running", "queued"})
    assert "running" in progress and "queued" in progress
    assert len(progress) == 3


def test_online_executor_prunes_dead_progress():
    """End-to-end: the online executor's progress table stays bounded
    even when every failure record has aged out of the failure cap."""
    from artstyletransfer_tpu.runtime.online import OnlineBatchingExecutor

    async def go():
        ex = OnlineBatchingExecutor(Config(iters_num=1), verbose=False)
        # simulate many finished-and-forgotten tasks: entries land in the
        # progress table, nothing is pending or in flight
        import unittest.mock as mock

        with mock.patch.object(executor_mod, "MAX_PROGRESS_ENTRIES", 4):
            for i in range(8):
                await ex.set_progress(f"t{i}", (40.0, None))
        return await ex.task_ids()

    ids = asyncio.run(go())
    # the latest write is live by definition; older dead entries evicted
    assert len(ids) <= 5


def test_env_weights_path_fails_loudly(monkeypatch, tmp_path):
    """A typo'd ASTT_VGG19_WEIGHTS must abort, not silently fall through
    to random seeded weights (a server stylizing with those is far worse
    than refusing to start)."""
    from artstyletransfer_tpu.models import weights as weights_mod

    monkeypatch.setenv("ASTT_VGG19_WEIGHTS",
                       str(tmp_path / "no_such_weights.npz"))
    with pytest.raises(FileNotFoundError):
        weights_mod.load_vgg19_params(cache=False)


def test_call_in_loop_shutdown_semantics():
    """The shared thread->loop hop drops updates once the loop is gone
    (and suppresses the never-awaited warning) instead of raising."""
    import threading

    from artstyletransfer_tpu.runtime.executor import call_in_loop

    ran = []

    async def update():
        ran.append(True)

    # live loop in another thread: the update goes through
    loop = asyncio.new_event_loop()
    t = threading.Thread(target=loop.run_forever, daemon=True)
    t.start()
    try:
        assert call_in_loop(loop, update(), timeout_s=10) is True
        assert ran == [True]
    finally:
        loop.call_soon_threadsafe(loop.stop)
        t.join(timeout=10)
        loop.close()
    # closed loop: dropped, not raised
    assert call_in_loop(loop, update(), timeout_s=10) is False
    assert ran == [True]


# ---------------------------------------------------------------------------
# Transient-failure retry in run_job_queue
# ---------------------------------------------------------------------------

def _tiny_queue_cfg():
    return Config(levels_num=1, base_diameter=16, iters_num=2,
                  stream_every=2, init_method="content+noise")


def _one_job(rng):
    content = rng.random((16, 24, 3)).astype(np.float32)
    style = rng.random((16, 16, 3)).astype(np.float32)
    return [("a", content, style)]


def test_run_job_queue_retries_transient_failure(monkeypatch, rng):
    """A group that fails once (e.g. a crashed TPU worker) succeeds on the
    retry instead of failing every job in it."""
    from artstyletransfer_tpu.parallel import batch as batch_mod

    calls = {"fail": 0}
    real = batch_mod.BatchedTransferJob

    class Flaky(real):
        def run(self, *a, **kw):
            if calls["fail"] == 0:
                calls["fail"] += 1
                raise RuntimeError("TPU worker crashed or restarted")
            return real.run(self, *a, **kw)

    monkeypatch.setattr(batch_mod, "BatchedTransferJob", Flaky)
    results, failures = batch_mod.run_job_queue(
        _one_job(rng), _tiny_queue_cfg(), retries=1, retry_delay_s=0.0)
    assert not failures
    assert "a" in results
    assert calls["fail"] == 1


def test_run_job_queue_retry_exhausted(monkeypatch, rng):
    """A deterministic failure still fails after the retry budget, with
    the last exception recorded for every job in the group."""
    from artstyletransfer_tpu.parallel import batch as batch_mod

    calls = {"n": 0}
    real = batch_mod.BatchedTransferJob

    class AlwaysFails(real):
        def run(self, *a, **kw):
            calls["n"] += 1
            raise RuntimeError("genuine OOM")

    monkeypatch.setattr(batch_mod, "BatchedTransferJob", AlwaysFails)
    results, failures = batch_mod.run_job_queue(
        _one_job(rng), _tiny_queue_cfg(), retries=1, retry_delay_s=0.0)
    assert not results
    assert calls["n"] == 2  # first attempt + one retry
    assert isinstance(failures["a"], RuntimeError)


def test_run_job_queue_retry_resumes_from_checkpoint(monkeypatch, rng,
                                                     tmp_path):
    """A mid-run crash with checkpointing enabled retries FROM the last
    saved chunk (resume is forced on retry attempts), not from step 0."""
    from artstyletransfer_tpu.parallel import batch as batch_mod

    calls = {"crash": 0}
    seen_dones = []
    real = batch_mod.BatchedTransferJob

    class CrashesMidRun(real):
        def run(self, *a, **kw):
            gen = real.run(self, *a, **kw)
            if calls["crash"] == 0:
                calls["crash"] += 1
                first = next(gen)
                seen_dones.append(first[0])
                yield first
                raise RuntimeError("worker crashed mid-run")
            for item in gen:
                seen_dones.append(item[0])
                yield item

    monkeypatch.setattr(batch_mod, "BatchedTransferJob", CrashesMidRun)
    cfg = Config(levels_num=1, base_diameter=16, iters_num=4,
                 stream_every=2, init_method="content+noise")
    results, failures = batch_mod.run_job_queue(
        _one_job(rng), cfg, retries=1, retry_delay_s=0.0,
        checkpoint_dir=str(tmp_path), checkpoint_every=2)
    assert not failures
    assert "a" in results
    # crash after the first chunk (step 2); the retry resumed at the
    # checkpoint instead of restarting: no second step-2 chunk
    assert seen_dones == [2, 4]


def test_run_job_queue_fresh_run_removes_stale_checkpoint(monkeypatch, rng,
                                                          tmp_path):
    """Without resume, a checkpoint left by a PREVIOUS run of the same
    task ids is deleted up front — a transient-failure retry forces
    resume=True and must never silently load the stale state (observed
    failure mode: attempt 0 crashes before its first save, attempt 1
    resumes the old run's trajectory)."""
    import hashlib

    from artstyletransfer_tpu.parallel import batch as batch_mod

    jobs = _one_job(rng)
    cfg = Config(levels_num=1, base_diameter=16, iters_num=4,
                 stream_every=2, init_method="content+noise")
    # a first run leaves its (completed) checkpoint behind
    r1, f1 = batch_mod.run_job_queue(jobs, cfg, checkpoint_dir=str(tmp_path),
                                     checkpoint_every=2)
    tag = hashlib.sha1(b"a").hexdigest()[:16]
    ckpt = tmp_path / f"queue_{tag}.ckpt"
    assert not f1 and ckpt.exists()
    stale_mtime = ckpt.stat().st_mtime

    # second fresh run, crashing BEFORE the first save: the retry must
    # re-run this run's steps, not resume the old file
    calls = {"fail": 0}
    real = batch_mod.BatchedTransferJob

    class FlakyOnce(real):
        def run(self, *a, **kw):
            if calls["fail"] == 0:
                calls["fail"] += 1
                raise RuntimeError("worker crashed before first save")
            assert not kw.get("resume") or not ckpt.exists() or \
                ckpt.stat().st_mtime != stale_mtime
            return real.run(self, *a, **kw)

    monkeypatch.setattr(batch_mod, "BatchedTransferJob", FlakyOnce)
    import time as time_mod
    time_mod.sleep(0.05)  # ensure a new save gets a distinct mtime
    r2, f2 = batch_mod.run_job_queue(jobs, cfg, retries=1, retry_delay_s=0.0,
                                     checkpoint_dir=str(tmp_path),
                                     checkpoint_every=2)
    assert not f2 and "a" in r2
    assert calls["fail"] == 1
    # the two fresh runs are bit-identical (seeded): the retry really
    # re-ran from step 0 instead of resuming the stale checkpoint
    np.testing.assert_array_equal(r1["a"], r2["a"])


def test_warmup_serving_shared_entry(vgg_params, monkeypatch):
    """Both frontends' --warmup goes through one warmup_serving entry:
    single-job graphs without online batching, the online (sizes, mesh)
    plan with it."""
    from artstyletransfer_tpu.engine import warmup as warmup_mod

    cfg = Config(levels_num=1, base_diameter=16, iters_num=2,
                 stream_every=2, optimizer="adam")
    calls = {}

    def fake_buckets(c, params=None, aspects=None, batch_sizes=None,
                     mesh=None, **kw):
        calls["sizes"] = batch_sizes
        calls["mesh"] = mesh
        return 1

    # the real compile path runs end-to-end at a tiny shape (before the
    # fake is patched in): per padded batch size, the scalar-chunk
    # executable PLUS (r5) the per-lane-step variant live joins dispatch
    n = warmup_mod.warmup_serving(cfg, online=True, aspects=(1.0,))
    assert n == 8

    monkeypatch.setattr(warmup_mod, "warmup_aspect_buckets", fake_buckets)
    assert warmup_mod.warmup_serving(cfg, online=False) == 1
    assert calls == {"sizes": None, "mesh": None}
    # online: the plan's padded power-of-two ladder (no mesh in tests —
    # conftest pins ASTT_SERVING_MESH=none)
    assert warmup_mod.warmup_serving(cfg, online=True) == 1
    assert calls["sizes"] == (1, 2, 4, 8)
    assert calls["mesh"] is None


def test_planned_round_sizes_covers_shrink_ladder():
    """With stop_tol + stop_shrink, convergence shrinking re-forms batches
    down the power-of-two ladder — the warmup plan must cover those
    executables too (a cold compile mid-serve is exactly what warmup
    exists to prevent)."""
    import dataclasses

    from artstyletransfer_tpu.parallel.batch import planned_round_sizes

    cfg = Config(optimizer="adam", levels_num=1, base_diameter=16,
                 stop_tol=1e-4)
    shape = (16, 24, 3)
    assert planned_round_sizes(cfg, shape, 8, max_batch=8) == [1, 2, 4, 8]
    assert planned_round_sizes(cfg, shape, 3, max_batch=8) == [1, 2, 4]
    # on a multi-device jobs axis the ladder is rounded up to jobs-axis
    # multiples (run()'s shrink_target rule)
    assert planned_round_sizes(cfg, shape, 8, jobs_axis=4,
                               max_batch=8) == [4, 8]
    assert planned_round_sizes(cfg, shape, 8, max_batch=8,
                               mesh_devices=2) == [1, 2, 4, 8]
    no_shrink = dataclasses.replace(cfg, stop_shrink=False)
    assert planned_round_sizes(no_shrink, shape, 8, max_batch=8) == [8]
    # r5: shrinking coexists with checkpointing (the checkpoint persists
    # the lane composition), so the ladder is dispatched there too
    assert planned_round_sizes(cfg, shape, 8, max_batch=8,
                               checkpointing=True) == [1, 2, 4, 8]
