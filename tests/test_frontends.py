"""Frontend tests: web lab routes (aiohttp test client) and the Telegram bot
handler logic (fake transport), both with an instant fake engine."""

import asyncio
import io

import numpy as np
import pytest

from artstyletransfer_tpu.config import Config
from artstyletransfer_tpu.runtime import executor as executor_mod

aiohttp = pytest.importorskip("aiohttp")
from aiohttp.test_utils import TestClient, TestServer  # noqa: E402

from artstyletransfer_tpu.frontends.lab import create_app  # noqa: E402
from artstyletransfer_tpu.frontends import tlbot as tlbot_mod  # noqa: E402
from artstyletransfer_tpu.frontends.tlbot import StyleTransferBot  # noqa: E402
from artstyletransfer_tpu.utils.image import encode_jpeg  # noqa: E402


@pytest.fixture(autouse=True)
def fresh_semaphore():
    executor_mod.reset_semaphore()
    yield
    executor_mod.reset_semaphore()


# shared fakes (aiohttp-free, see astt_fakes.py); re-exported here because
# sibling modules historically do `from test_frontends import ...`
from astt_fakes import (FakeTelegramClient, _jpeg_bytes,  # noqa: E402,F401
                        _photo_message, _write_demo_images, fake_engine)


def test_lab_routes(tmp_path):
    _write_demo_images(tmp_path)
    app = create_app(config=Config(iters_num=2), data_dir=str(tmp_path),
                     pairs=[("c.jpg", "s.jpg")], engine=fake_engine)

    async def go():
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            # poll until the backend task enqueued AND the job completed
            # (a fixed sleep flakes on a loaded 1-core host)
            for _ in range(200):
                await asyncio.sleep(0.05)
                ids = await app["executor"].task_ids()
                if ids and (await app["executor"].get_progress(ids[0]))[0] \
                        >= 100:
                    break
            resp = await client.get("/")
            assert resp.status == 200
            html = await resp.text()
            assert "job(s)" in html

            ids = await app["executor"].task_ids()
            assert len(ids) == 1
            resp = await client.get(f"/generated/{ids[0]}")
            assert resp.status == 200
            body = await resp.read()
            assert body[:2] == b"\xff\xd8"  # JPEG magic

            resp = await client.get("/generated/nonexistent")
            assert resp.status == 404

            resp = await client.get("/gallery")
            assert resp.status == 200
            body = await resp.text()
            assert "completed transfer" in body
        finally:
            await client.close()

    asyncio.run(go())


def test_lab_batched_mode(tmp_path):
    """The --batched lab path runs the queue through the mesh executor."""
    _write_demo_images(tmp_path)
    from artstyletransfer_tpu.config import Config as Cfg

    cfg = Cfg(levels_num=1, iters_num=2, base_diameter=16,
              optimizer="adam", stream_every=2)
    app = create_app(config=cfg, data_dir=str(tmp_path),
                     pairs=[("c.jpg", "s.jpg"), ("c.jpg", "s.jpg")],
                     batched=True)

    async def go():
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            for _ in range(120):  # wait for the batch to complete
                await asyncio.sleep(0.5)
                ids = await app["executor"].task_ids()
                done = []
                for i in ids:
                    pct, _ = await app["executor"].get_progress(i)
                    done.append(pct >= 100.0)
                if ids and all(done):
                    break
            ids = await app["executor"].task_ids()
            assert len(ids) == 2
            for i in ids:
                pct, img = await app["executor"].get_progress(i)
                assert pct == 100.0 and img is not None
            resp = await client.get(f"/generated/{ids[0]}")
            assert resp.status == 200
            assert (await resp.read())[:2] == b"\xff\xd8"
        finally:
            await client.close()

    asyncio.run(go())


def test_bot_start_and_fallback():
    client = FakeTelegramClient()
    bot = StyleTransferBot(client, Config(iters_num=2), engine=fake_engine)

    async def go():
        await bot.handle_message({"chat": {"id": 7}, "text": "/start",
                                  "from": {"first_name": "Ada"}})
        await bot.handle_message({"chat": {"id": 7}, "text": "hello"})

    asyncio.run(go())
    assert "Ada" in client.messages[0][1]
    assert "content" in client.messages[1][1]


def test_bot_album_runs_job_and_reports():
    client = FakeTelegramClient()
    client.files["f1"] = _jpeg_bytes()
    client.files["f2"] = _jpeg_bytes()
    bot = StyleTransferBot(client, Config(iters_num=2), engine=fake_engine)

    async def go():
        await bot.album_handler([
            _photo_message(42, "f1", "g1"),
            _photo_message(42, "f2", "g1"),
        ])
        await bot.executor.run()
        await asyncio.sleep(0.05)

    asyncio.run(go())
    assert any("Processing has started" in t for _, t in client.messages)
    captions = [c for _, c in client.photos]
    assert "Done!" in captions
    assert all(chat == 42 for chat, _ in client.photos)
    assert bot.tasks_table == {}  # cleaned up at 100%


def test_bot_rejects_wrong_album_size():
    client = FakeTelegramClient()
    client.files["f1"] = _jpeg_bytes()
    bot = StyleTransferBot(client, Config(iters_num=2), engine=fake_engine)

    async def go():
        await bot.album_handler([_photo_message(9, "f1", "g2")])

    asyncio.run(go())
    assert any("two pictures" in t for _, t in client.messages)
    assert client.photos == []


def test_bot_polling_loop_dispatches_updates():
    """run_polling: getUpdates -> handler dispatch -> offset advance."""

    class ScriptedClient(FakeTelegramClient):
        def __init__(self):
            super().__init__()
            self.offsets = []
            self.batches = [
                [{"update_id": 5,
                  "message": {"chat": {"id": 1}, "text": "/start",
                              "from": {"first_name": "Bo"}}}],
                [{"update_id": 6,
                  "message": {"chat": {"id": 1}, "text": "hi"}}],
            ]

        async def get_updates(self, offset, timeout=30):
            self.offsets.append(offset)
            if self.batches:
                return self.batches.pop(0)
            raise asyncio.CancelledError  # end the loop

    client = ScriptedClient()
    bot = StyleTransferBot(client, Config(iters_num=2), engine=fake_engine)

    async def go():
        try:
            await bot.run_polling()
        except asyncio.CancelledError:
            pass

    asyncio.run(go())
    assert client.offsets == [None, 6, 7]  # offset advances past each update
    assert any("Bo" in t for _, t in client.messages)
    assert any("two pictures" in t for _, t in client.messages)


def test_bot_media_group_debounce():
    client = FakeTelegramClient()
    client.files["f1"] = _jpeg_bytes()
    client.files["f2"] = _jpeg_bytes()
    bot = StyleTransferBot(client, Config(iters_num=2), engine=fake_engine)

    async def go():
        tlbot_mod.MEDIA_GROUP_DEBOUNCE_S = 0.05
        await bot.handle_message(_photo_message(11, "f1", "album9"))
        await bot.handle_message(_photo_message(11, "f2", "album9"))
        await asyncio.sleep(0.15)  # debounce fires -> album handled
        await bot.executor.run()
        await asyncio.sleep(0.05)

    asyncio.run(go())
    assert any("Processing has started" in t for _, t in client.messages)
    assert any(c == "Done!" for _, c in client.photos)


def test_lab_batched_failure_renders_error_state(tmp_path):
    """A failed batched job renders a FAILED card, not a stuck progress bar."""
    _write_demo_images(tmp_path)
    from artstyletransfer_tpu.config import Config as Cfg
    from artstyletransfer_tpu.frontends import lab as lab_mod

    cfg = Cfg(levels_num=1, iters_num=2, base_diameter=16,
              optimizer="adam", stream_every=2)
    app = create_app(config=cfg, data_dir=str(tmp_path),
                     pairs=[("c.jpg", "s.jpg")], batched=True)

    async def go():
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            # wait for the batch to run, then poison the record as if the
            # bucket had failed (run_job_queue's failure contract)
            for _ in range(120):
                await asyncio.sleep(0.5)
                ids = await app["executor"].task_ids()
                if ids:
                    pct, _ = await app["executor"].get_progress(ids[0])
                    if pct >= 100:
                        break
            ids = await app["executor"].task_ids()
            app["executor"].failures[ids[0]] = RuntimeError("boom at 2K")
            resp = await client.get("/")
            assert resp.status == 200
            html = await resp.text()
            assert "FAILED" in html
            assert "RuntimeError: boom at 2K" in html
        finally:
            await client.close()

    asyncio.run(go())


def test_lab_showcase_routes(tmp_path):
    """/showcase and /showcase/levels — routed equivalents of the
    reference's static img_table*.html pages (which its app never served)."""
    _write_demo_images(tmp_path)
    import cv2

    results = tmp_path / "results"
    results.mkdir()
    img = (np.random.default_rng(1).random((8, 8, 3)) * 255).astype("uint8")
    for k in (1, 2):
        cv2.imwrite(str(results / f"bird_vg_lvl{k}.jpg"), img)

    app = create_app(config=Config(iters_num=2), data_dir=str(tmp_path),
                     pairs=[], engine=fake_engine, autostart=False,
                     results_dir=str(results))

    async def go():
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            resp = await client.get("/showcase")
            assert resp.status == 200
            html = await resp.text()
            assert "c.jpg" in html and "s.jpg" in html

            resp = await client.get("/data/content-images/c.jpg")
            assert resp.status == 200
            assert (await resp.read())[:2] == b"\xff\xd8"

            resp = await client.get("/showcase/levels")
            assert resp.status == 200
            html = await resp.text()
            assert "bird_vg" in html and "bird_vg_lvl2.jpg" in html

            resp = await client.get("/results/bird_vg_lvl1.jpg")
            assert resp.status == 200

            # traversal attempts are rejected
            resp = await client.get("/data/content-images/..%2F..%2Fetc")
            assert resp.status == 404
            resp = await client.get("/results/nonexistent.jpg")
            assert resp.status == 404
        finally:
            await client.close()

    asyncio.run(go())


def test_bot_canonicalize_buckets_album_shapes():
    """--canonicalize collapses arbitrary photo shapes onto the canonical
    bucket shape before the job is enqueued (bounded XLA compile count)."""
    from artstyletransfer_tpu.engine.warmup import bucket_content_shape

    client = FakeTelegramClient()
    client.files["f1"] = encode_jpeg(
        np.random.default_rng(2).random((37, 55, 3)).astype(np.float32))
    client.files["f2"] = encode_jpeg(
        np.random.default_rng(3).random((41, 29, 3)).astype(np.float32))
    seen = {}

    async def shape_probe_engine(pair, *args, **kwargs):
        seen["content"] = pair.content[1].shape
        seen["style"] = pair.style[1].shape
        yield 100.0, np.full((8, 8, 3), 0.5, np.float32)

    from artstyletransfer_tpu.config import Config as Cfg
    cfg = Cfg(levels_num=1, base_diameter=16, iters_num=2)
    bot = StyleTransferBot(client, cfg, engine=shape_probe_engine,
                           canonicalize=True)

    async def go():
        await bot.album_handler([
            _photo_message(5, "f1", "g7"),
            _photo_message(5, "f2", "g7"),
        ])
        await bot.executor.run()
        await asyncio.sleep(0.05)

    asyncio.run(go())
    from artstyletransfer_tpu.parallel.batch import DEFAULT_ASPECT_BUCKETS
    buckets = {bucket_content_shape(a, cfg) + (3,)
               for a in DEFAULT_ASPECT_BUCKETS}
    assert seen["content"] in buckets
    assert seen["style"] == (16, 16, 3)


def test_cli_metrics_jsonl(tmp_path):
    """`astt --metrics PATH` emits per-chunk JSONL (step, loss, steps/s) —
    the wired replacement for the reference's per-iteration prints
    (reference neural_style_transfer.py:159,189,196)."""
    import json

    from artstyletransfer_tpu.frontends.cli import main as cli_main

    _write_demo_images(tmp_path)
    mpath = tmp_path / "metrics.jsonl"
    rc = cli_main([
        "--content", str(tmp_path / "content-images" / "c.jpg"),
        "--style", str(tmp_path / "style-images" / "s.jpg"),
        "--output", str(tmp_path / "out.jpg"),
        "--levels", "1", "--iters", "4", "--base-diameter", "16",
        "--stream-every", "2", "--optimizer", "adam", "--quiet",
        "--metrics", str(mpath)])
    assert rc == 0 and mpath.exists()
    events = [json.loads(line) for line in mpath.read_text().splitlines()]
    kinds = [e["event"] for e in events]
    assert "task_added" in kinds and "task_done" in kinds
    progress = [e for e in events if e["event"] == "progress"]
    assert len(progress) == 2  # 4 iters / stream_every 2
    assert progress[-1]["percent"] == 100.0
    assert all("t" in e and "task" in e for e in progress)
    # the second chunk's interval is measured (first is compile-bearing)
    assert "steps_per_sec" in progress[-1]


def test_cli_metrics_checkpointed_path(tmp_path):
    """The direct TransferJob CLI path (--verbose-losses) logs chunk events
    with losses."""
    import json

    from artstyletransfer_tpu.frontends.cli import main as cli_main

    _write_demo_images(tmp_path)
    mpath = tmp_path / "metrics.jsonl"
    rc = cli_main([
        "--content", str(tmp_path / "content-images" / "c.jpg"),
        "--style", str(tmp_path / "style-images" / "s.jpg"),
        "--output", str(tmp_path / "out.jpg"),
        "--levels", "1", "--iters", "4", "--base-diameter", "16",
        "--stream-every", "2", "--optimizer", "adam", "--quiet",
        "--verbose-losses", "--metrics", str(mpath)])
    assert rc == 0
    events = [json.loads(line) for line in mpath.read_text().splitlines()]
    chunks = [e for e in events if e["event"] == "chunk"]
    assert [e["step"] for e in chunks] == [2, 4]
    assert all(np.isfinite(e["loss"]) for e in chunks)


def test_lab_metrics_jsonl(tmp_path):
    """The lab writes structured progress events when metrics_path is set."""
    import json

    _write_demo_images(tmp_path)
    mpath = tmp_path / "lab_metrics.jsonl"
    app = create_app(config=Config(iters_num=2), data_dir=str(tmp_path),
                     pairs=[("c.jpg", "s.jpg")], engine=fake_engine,
                     metrics_path=str(mpath))

    async def go():
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            for _ in range(100):
                await asyncio.sleep(0.05)
                ids = await app["executor"].task_ids()
                if ids and (await app["executor"].get_progress(ids[0]))[0] >= 100:
                    break
        finally:
            await client.close()

    asyncio.run(go())
    events = [json.loads(line) for line in mpath.read_text().splitlines()]
    assert any(e["event"] == "progress" and e["percent"] == 100.0
               for e in events)


# ---------------------------------------------------------------------------
# astt-queue (headless batch frontend)
# ---------------------------------------------------------------------------

def test_queue_cli_manifest_and_pairs(tmp_path):
    """astt-queue: manifest + --pair jobs run through run_job_queue and
    land as <id>.jpg; per-chunk metrics JSONL is written; ids uniquify."""
    import json as json_mod

    from artstyletransfer_tpu.frontends import queue_cli

    _write_demo_images(tmp_path)
    c = str(tmp_path / "content-images" / "c.jpg")
    s = str(tmp_path / "style-images" / "s.jpg")
    manifest = tmp_path / "jobs.jsonl"
    manifest.write_text(
        json_mod.dumps({"id": "first", "content": c, "style": s}) + "\n"
        + json_mod.dumps({"content": c, "style": s}) + "\n")
    out = tmp_path / "out"
    metrics = tmp_path / "metrics.jsonl"

    rc = queue_cli.main([
        "--manifest", str(manifest), "--pair", c, s,
        "--output-dir", str(out), "--metrics", str(metrics),
        "--optimizer", "adam", "--levels", "1", "--iters", "4",
        "--base-diameter", "16", "--stream-every", "2",
        "--compute-dtype", "float32", "--quiet"])
    assert rc == 0
    # manifest id, derived id, and the uniquified --pair duplicate
    assert sorted(p.name for p in out.glob("*.jpg")) == [
        "c__s.jpg", "c__s_2.jpg", "first.jpg"]
    events = [json_mod.loads(l) for l in metrics.read_text().splitlines()]
    assert {e["event"] for e in events} == {"progress"}
    assert {e["task"] for e in events} == {"first", "c__s", "c__s_2"}
    assert all(np.isfinite(e["loss"]) for e in events)


def test_queue_cli_failure_exit_code(tmp_path, monkeypatch):
    """Failed jobs flip the exit code, completed ones are still written,
    and the failure lands in the metrics log (bucket isolation itself is
    pinned by tests/test_parallel.py)."""
    import json as json_mod

    import artstyletransfer_tpu.parallel as parallel_mod
    from artstyletransfer_tpu.frontends import queue_cli

    _write_demo_images(tmp_path)
    c = str(tmp_path / "content-images" / "c.jpg")
    s = str(tmp_path / "style-images" / "s.jpg")

    def fake_queue(jobs, cfg, **kw):
        by_id = dict.fromkeys(j[0] for j in jobs)
        assert sorted(by_id) == ["c__s", "poison"]
        return ({"c__s": np.full((8, 8, 3), 0.5, np.float32)},
                {"poison": RuntimeError("poisoned bucket")})

    monkeypatch.setattr(parallel_mod, "run_job_queue", fake_queue)
    out = tmp_path / "out"
    metrics = tmp_path / "m.jsonl"
    rc = queue_cli.main([
        "--pair", c, s, "--manifest", str(_write_manifest(tmp_path, c, s)),
        "--output-dir", str(out), "--metrics", str(metrics), "--quiet"])
    assert rc == 1
    assert [p.name for p in out.glob("*.jpg")] == ["c__s.jpg"]
    events = [json_mod.loads(l) for l in metrics.read_text().splitlines()]
    assert {"event": "task_failed", "task": "poison"} == \
        {k: v for k, v in events[-1].items() if k in ("event", "task")}


def _write_manifest(tmp_path, c, s):
    import json as json_mod

    manifest = tmp_path / "poison.jsonl"
    manifest.write_text(
        json_mod.dumps({"id": "poison", "content": c, "style": s}) + "\n")
    return manifest


def test_queue_cli_manifest_validation(tmp_path):
    from artstyletransfer_tpu.frontends import queue_cli

    bad = tmp_path / "bad.jsonl"
    bad.write_text('{"content": "x.jpg"}\n')
    ns = queue_cli.build_parser().parse_args(
        ["--manifest", str(bad), "--output-dir", str(tmp_path)])
    with pytest.raises(ValueError, match="style"):
        queue_cli.load_jobs(ns)
    ns2 = queue_cli.build_parser().parse_args(
        ["--output-dir", str(tmp_path)])
    with pytest.raises(ValueError, match="no jobs"):
        queue_cli.load_jobs(ns2)


def test_bot_apologizes_and_cleans_up_on_engine_failure():
    """A failed job notifies the chat and releases its tasks_table entry
    (r4 fix — the reference leaves the user waiting forever)."""
    async def broken_engine(pair, *args, **kwargs):
        await asyncio.sleep(0)
        raise RuntimeError("engine exploded")
        yield  # pragma: no cover — async generator

    client = FakeTelegramClient()
    client.files["f1"] = _jpeg_bytes()
    client.files["f2"] = _jpeg_bytes()
    bot = StyleTransferBot(client, Config(iters_num=2),
                           engine=broken_engine)

    async def go():
        await bot.album_handler([
            _photo_message(42, "f1", "g1"),
            _photo_message(42, "f2", "g1"),
        ])
        await bot.executor.run()
        await asyncio.sleep(0.05)

    asyncio.run(go())
    assert any("went wrong" in t for chat, t in client.messages if chat == 42)
    assert bot.tasks_table == {}


def test_bot_survives_transient_send_failure():
    """One failed send_photo (network blip / user blocked the bot) skips
    that update instead of killing the job; the run still completes and
    the final photo is delivered (r4 fix)."""
    class FlakyClient(FakeTelegramClient):
        def __init__(self):
            super().__init__()
            self.failures_left = 1

        async def send_photo(self, chat_id, jpeg_bytes, caption,
                             filename=None):
            if self.failures_left > 0:
                self.failures_left -= 1
                raise ConnectionError("telegram hiccup")
            await super().send_photo(chat_id, jpeg_bytes, caption,
                                     filename=filename)

    client = FlakyClient()
    client.files["f1"] = _jpeg_bytes()
    client.files["f2"] = _jpeg_bytes()
    bot = StyleTransferBot(client, Config(iters_num=2), engine=fake_engine)

    async def go():
        await bot.album_handler([
            _photo_message(42, "f1", "g1"),
            _photo_message(42, "f2", "g1"),
        ])
        await bot.executor.run()
        await asyncio.sleep(0.05)

    asyncio.run(go())
    assert bot.executor.failures == {}
    assert "Done!" in [c for _, c in client.photos]
    assert bot.tasks_table == {}


def test_queue_cli_mesh_auto_wiring(tmp_path, monkeypatch):
    """--mesh auto (the default) hands run_job_queue an all-device serving
    mesh, and --space N turns on space sharding; the suite-wide
    ASTT_SERVING_MESH=none gate is lifted for this test only."""
    import artstyletransfer_tpu.parallel as parallel_mod
    from artstyletransfer_tpu.frontends import queue_cli

    _write_demo_images(tmp_path)
    c = str(tmp_path / "content-images" / "c.jpg")
    s = str(tmp_path / "style-images" / "s.jpg")
    out = tmp_path / "out"

    seen = {}

    def fake_queue(jobs, cfg, **kw):
        seen["mesh"] = kw["mesh"]
        seen["shard_space"] = kw["shard_space"]
        return ({j[0]: np.full((8, 8, 3), 0.5, np.float32) for j in jobs},
                {})

    monkeypatch.setattr(parallel_mod, "run_job_queue", fake_queue)
    monkeypatch.setenv("ASTT_SERVING_MESH", "auto")
    rc = queue_cli.main(["--pair", c, s, "--output-dir", str(out),
                         "--space", "2", "--quiet"])
    assert rc == 0
    assert dict(seen["mesh"].shape) == {"jobs": 4, "space": 2}
    assert seen["shard_space"] is True

    # suite default: the env gate keeps frontends single-device
    monkeypatch.setenv("ASTT_SERVING_MESH", "none")
    rc = queue_cli.main(["--pair", c, s, "--output-dir", str(out),
                         "--quiet"])
    assert rc == 0
    assert seen["mesh"] is None and seen["shard_space"] is False
