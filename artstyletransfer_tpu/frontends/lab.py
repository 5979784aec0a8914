"""Web lab frontend: live progress grid for a batch of style-transfer jobs.

Reference parity (reference lab.py): on startup a background task enqueues
the demo content x style pairs (reference lab.py:79-107); route `/` renders
a progress-card page (reference lab.py:125-142); route `/generated/<id>`
serves the latest intermediate image JPEG-encoded at quality 75 (reference
lab.py:145-164); server binds 0.0.0.0:8080 (reference lab.py:167-168).

Built on aiohttp + jinja2 (the reference used Quart, which is not a
dependency of this framework). The demo pair list and preset selection
match reference lab.py:17-100.
"""

from __future__ import annotations

import argparse
import asyncio
import dataclasses
import os
import uuid

from aiohttp import web
import jinja2

from ..config import PRESETS, STANDARD_GAUSS_NOISE_CONFIG, production_config
from ..engine.transfer import ContentStylePair
from ..runtime.executor import Executor
from ..utils.image import encode_jpeg, load_image

# The demo batch (reference lab.py:79-100).
CONTENT_STYLE_FILENAME_PAIRS = [
    ("bird.jpg", "cubism2.jpg"),
    ("bird.jpg", "matisse2.jpg"),
    ("bird.jpg", "expressive.jpg"),
    ("bird.jpg", "starry_night.jpg"),
    ("car.jpg", "mosaic.jpg"),
    ("car.jpg", "expressive.jpg"),
    ("car.jpg", "matisse2.jpg"),
    ("car.jpg", "cubism2.jpg"),
    ("columns.jpg", "cubism1.jpg"),
    ("columns.jpg", "cubism2.jpg"),
    ("columns.jpg", "cubism3.jpg"),
    ("columns.jpg", "matisse2.jpg"),
    ("girl_with_gun.jpg", "mona_lisa.jpg"),
    ("girl_with_gun.jpg", "mosaic.jpg"),
    ("girl_with_gun.jpg", "starry_night.jpg"),
    ("girl_with_gun.jpg", "cubism1.jpg"),
    ("lion.jpg", "mona_lisa.jpg"),
    ("lion.jpg", "mosaic.jpg"),
    ("lion.jpg", "starry_night.jpg"),
    ("lion.jpg", "cubism1.jpg"),
]

_TEMPLATE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "templates")


def default_data_dir() -> str:
    return os.environ.get(
        "ASTT_DATA_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "..", "..", "data"))


def create_app(config=None, data_dir: str = None, pairs=None,
               autostart: bool = True, engine=None,
               batched: bool = False,
               online: bool = False,
               executor=None,
               results_dir: str = None,
               metrics_path: str = None,
               queue_retries: int = 0) -> web.Application:
    """Build the lab application. `engine`/`pairs`/`executor` are
    injectable for tests.

    queue_retries re-runs a failed batched/online group (transient
    TPU-worker crashes recover in ~20s; see run_job_queue).

    batched=True replaces the reference's 2-at-a-time semaphore scheduling
    with the TPU-native path: the whole demo queue runs through
    parallel.run_job_queue (shape-bucketed, vmapped, mesh-sharded), with
    progress streamed back into the same progress table the routes read.

    online=True serves LIVE tasks through the online batching executor
    (runtime/online.py): tasks added while the chip is busy coalesce into
    the next vmapped batch round instead of running 2-at-a-time — same
    routes, same progress table. Online serving canonicalizes inputs onto
    the aspect-bucket shapes (crop + resize, like the bot's
    --canonicalize) so concurrent jobs can share compiled graphs; output
    geometry therefore follows the serving buckets, not the exact source
    aspect (use the default or --batched paths for native-shape outputs).
    """
    if engine is not None and online and executor is None:
        raise ValueError("engine injection is not supported with "
                         "online=True (the online executor's unit of "
                         "execution is the batched queue; inject "
                         "executor= or queue_runner instead)")
    config = config or STANDARD_GAUSS_NOISE_CONFIG
    data_dir = data_dir or default_data_dir()
    results_dir = results_dir or os.environ.get(
        "ASTT_RESULTS_DIR", os.path.join(data_dir, "..", "results"))
    pairs = pairs if pairs is not None else CONTENT_STYLE_FILENAME_PAIRS

    metrics = None
    if metrics_path:
        from ..utils.metrics import MetricsLogger

        metrics = MetricsLogger(metrics_path)
    if executor is None:
        if online:
            from ..parallel import default_serving_mesh
            from ..runtime.online import OnlineBatchingExecutor

            executor = OnlineBatchingExecutor(config, verbose=False,
                                              metrics=metrics,
                                              mesh=default_serving_mesh(),
                                              retries=queue_retries)
        else:
            executor = Executor(config, engine=engine, verbose=False,
                                metrics=metrics)
    env = jinja2.Environment(
        loader=jinja2.FileSystemLoader(_TEMPLATE_DIR), autoescape=True)

    def _load_pairs():
        """[(c_name, content, s_name, style, error|None)] — a missing or
        corrupt image fails ONLY its pair (the task renders as a failed
        card) instead of killing the whole demo batch. The reference raises
        on the first missing file (reference lab.py:117-118)."""
        content_dir = os.path.join(data_dir, "content-images")
        style_dir = os.path.join(data_dir, "style-images")
        out = []
        for c_name, s_name in pairs:
            try:
                content = load_image(os.path.join(content_dir, c_name))
                style = load_image(os.path.join(style_dir, s_name))
                out.append((c_name, content, s_name, style, None))
            except Exception as e:  # noqa: BLE001 — per-pair isolation
                out.append((c_name, None, s_name, None, e))
        return out

    async def _record_load_failure(task_id, error):
        from ..runtime.executor import record_failure

        # seed the progress table so the card exists, then mark it failed
        await executor.set_progress(task_id, (-1, None))
        record_failure(executor.failures, task_id, error)

    async def backend_task(app):
        for c_name, content, s_name, style, err in _load_pairs():
            if err is not None:
                await _record_load_failure(str(uuid.uuid4()), err)
                continue
            await executor.add_task(
                str(uuid.uuid4()),
                ContentStylePair((c_name, content), (s_name, style)))

    async def backend_task_batched(app):
        from ..parallel import default_serving_mesh, run_job_queue

        loaded = []
        for c_name, content, s_name, style, err in _load_pairs():
            if err is not None:
                await _record_load_failure(str(uuid.uuid4()), err)
                continue
            loaded.append((c_name, content, s_name, style))
        jobs = [(str(uuid.uuid4()), content, style)
                for _c, content, _s, style in loaded]
        loop = asyncio.get_running_loop()
        for tid, _c, _s in jobs:
            await executor.set_progress(tid, (-1, None))

        def report(tid, pct, img, loss):
            from ..runtime.executor import call_in_loop

            # shared thread->loop hop: drops the update when the server is
            # shutting down mid-batch instead of failing the whole bucket
            if not call_in_loop(loop, executor.set_progress(tid, (pct, img))):
                return
            if metrics is not None:
                # the batched queue bypasses Executor.__report, so emit the
                # structured progress event here (with the real loss)
                metrics.log("progress", task=tid, percent=pct, loss=loss)

        _results, failures = await loop.run_in_executor(
            None, lambda: run_job_queue(jobs, config, progress=report,
                                        mesh=default_serving_mesh(),
                                        canonicalize_styles=True,
                                        retries=queue_retries))
        from ..runtime.executor import record_failure

        # surface failed jobs: record the exception and mark the card so
        # it renders as an error instead of a forever-stuck progress bar
        for tid, exc in failures.items():
            record_failure(executor.failures, tid, exc)

    async def index(request: web.Request) -> web.Response:
        cards = []
        for image_id in await executor.task_ids():
            percent, _img = await executor.get_progress(image_id)
            percent = percent if percent > 0 else 0
            failure = executor.failures.get(image_id)
            cards.append({
                "image_id": image_id,
                "percent": percent,
                "cur_iter": percent / 100.0 * config.iters_num,
                "iters_num": config.iters_num,
                "failed": failure is not None,
                "error": (f"{type(failure).__name__}: {failure}"
                          if failure is not None else ""),
            })
        html = env.get_template("index.html").render(cards=cards)
        return web.Response(text=html, content_type="text/html")

    async def gallery(request: web.Request) -> web.Response:
        """Completed results at full size — the counterpart of the
        reference's static showcase pages (reference templates/
        img_table.html, img_table_lvls.html, which its app never routed)."""
        cards = []
        for image_id in await executor.task_ids():
            percent, _img = await executor.get_progress(image_id)
            if percent >= 100:
                cards.append({"image_id": image_id})
        html = env.get_template("gallery.html").render(cards=cards)
        return web.Response(text=html, content_type="text/html")

    async def showcase(request: web.Request) -> web.Response:
        """Corpus grid — the functional equivalent of the reference's static
        showcase page (reference templates/img_table.html, which its app
        never routed; here it is routed and driven by the live corpus)."""
        def listing(sub):
            d = os.path.join(data_dir, sub)
            if not os.path.isdir(d):
                return []
            return sorted(f for f in os.listdir(d)
                          if f.lower().endswith((".jpg", ".jpeg", ".png")))

        html = env.get_template("showcase.html").render(
            contents=listing("content-images"), styles=listing("style-images"))
        return web.Response(text=html, content_type="text/html")

    async def showcase_levels(request: web.Request) -> web.Response:
        """Per-level result progressions — equivalent of the reference's
        templates/img_table_lvls.html (pre-rendered <name>_lvl<k>.jpg
        files, reference img/bird_vg_lvl{1,2,3}.jpg)."""
        import re

        groups = {}
        if os.path.isdir(results_dir):
            for f in sorted(os.listdir(results_dir)):
                m = re.match(r"(.+)_lvl(\d+)\.(jpg|jpeg|png)$", f)
                if m:
                    groups.setdefault(m.group(1), []).append(
                        (int(m.group(2)), f))
        ordered = [{"name": k, "files": [f for _n, f in sorted(v)]}
                   for k, v in sorted(groups.items())]
        html = env.get_template("showcase_levels.html").render(groups=ordered)
        return web.Response(text=html, content_type="text/html")

    def _safe_file(root, name):
        path = os.path.realpath(os.path.join(root, name))
        if not path.startswith(os.path.realpath(root) + os.sep) \
                or not os.path.isfile(path):
            raise web.HTTPNotFound(text="No such file")
        return path

    async def serve_data(request: web.Request) -> web.FileResponse:
        sub = request.match_info["sub"]
        if sub not in ("content-images", "style-images"):
            raise web.HTTPNotFound(text="No such collection")
        return web.FileResponse(_safe_file(os.path.join(data_dir, sub),
                                           request.match_info["name"]))

    async def serve_result(request: web.Request) -> web.FileResponse:
        return web.FileResponse(_safe_file(results_dir,
                                           request.match_info["name"]))

    async def serve_image(request: web.Request) -> web.Response:
        image_id = request.match_info["image_id"]
        try:
            _percent, img = await executor.get_progress(image_id)
        except KeyError:
            raise web.HTTPNotFound(text="No such task")
        if img is None:
            return web.Response(text="No image yet")
        return web.Response(body=encode_jpeg(img, quality=75),
                            content_type="image/jpg")

    async def on_startup(app):
        if autostart:
            task_fn = backend_task_batched if batched else backend_task
            app["backend"] = asyncio.create_task(task_fn(app))
        app["runner"] = asyncio.create_task(executor.run(forever=True))

    async def on_cleanup(app):
        for key in ("backend", "runner"):
            task = app.get(key)
            if task is not None:
                task.cancel()
        if metrics is not None:
            metrics.close()

    app = web.Application()
    app["executor"] = executor
    app.router.add_get("/", index)
    app.router.add_get("/gallery", gallery)
    app.router.add_get("/showcase", showcase)
    app.router.add_get("/showcase/levels", showcase_levels)
    app.router.add_get("/data/{sub}/{name}", serve_data)
    app.router.add_get("/results/{name}", serve_result)
    app.router.add_get("/generated/{image_id}", serve_image)
    app.on_startup.append(on_startup)
    app.on_cleanup.append(on_cleanup)
    return app


def main(argv=None) -> int:
    from ..utils.cache import enable_compilation_cache

    enable_compilation_cache()

    parser = argparse.ArgumentParser(prog="astt-lab")
    parser.add_argument("--host", default="0.0.0.0")
    parser.add_argument("--port", type=int, default=8080)
    parser.add_argument("--preset", choices=sorted(PRESETS),
                        default="standard")
    parser.add_argument("--data-dir", default=None)
    parser.add_argument("--no-autostart", action="store_true",
                        help="do not enqueue the demo batch on startup")
    parser.add_argument("--max-pairs", type=int, default=None,
                        help="truncate the demo batch to the first N pairs "
                             "(rehearsals/smoke drives; default: all 20)")
    parser.add_argument("--batched", action=argparse.BooleanOptionalAction,
                        default=False,
                        help="run the demo queue through the offline "
                             "mesh-batched queue path (one run_job_queue "
                             "over the whole demo; overrides --online for "
                             "the demo enqueue)")
    parser.add_argument("--online", action=argparse.BooleanOptionalAction,
                        default=True,
                        help="serve live tasks through the online batching "
                             "executor: concurrent same-bucket jobs run as "
                             "one vmapped batch, and mid-flight arrivals "
                             "JOIN the in-flight batch at the next chunk "
                             "boundary (parallel/live.py). Default ON "
                             "since r5 — measured 2.46-5.43x end-to-end "
                             "over the 2-at-a-time executor with newcomer "
                             "wait bounded by one chunk; --no-online "
                             "restores the reference-style semaphore")
    parser.add_argument("--compute-dtype", choices=["float32", "bfloat16"],
                        default=None,
                        help="conv compute dtype; default: production "
                             "precision for the platform (bfloat16 on TPU)")
    parser.add_argument("--stop-tol", type=float, default=None,
                        help="convergence early-stop for every served job: "
                             "end a run once the relative loss change over "
                             "a chunk is <= this (e.g. 1e-4; default: run "
                             "the preset's full iteration budget like the "
                             "reference)")
    parser.add_argument("--stop-shrink",
                        action=argparse.BooleanOptionalAction, default=None,
                        help="with --stop-tol: converged jobs leave their "
                             "batch individually (default on); "
                             "--no-stop-shrink stops a batch only when "
                             "every job in it converged")
    parser.add_argument("--metrics", default=None, metavar="PATH",
                        help="append structured per-progress JSONL metrics "
                             "to PATH")
    parser.add_argument("--retries", type=int, default=0, metavar="N",
                        help="re-run a failed batched/online group up to N "
                             "extra times (transient TPU-worker crashes "
                             "recover in ~20s)")
    parser.add_argument("--warmup", action="store_true",
                        help="precompile every serving aspect bucket before "
                             "binding the port (with --online: the vmapped "
                             "batched executables at exactly the sizes and "
                             "mesh online rounds dispatch) so the first "
                             "request never hits a minutes-long cold "
                             "compile")
    args = parser.parse_args(argv)
    cfg = production_config(PRESETS[args.preset])
    if args.compute_dtype is not None:
        # explicit dtype opts out of the precision flip only; the other
        # production settings (e.g. the unit line-search opening) stand
        cfg = dataclasses.replace(cfg, compute_dtype=args.compute_dtype)
    if args.stop_tol is not None:
        cfg = dataclasses.replace(cfg, stop_tol=args.stop_tol)
    if args.stop_shrink is not None:
        cfg = dataclasses.replace(cfg, stop_shrink=args.stop_shrink)
    pairs = (CONTENT_STYLE_FILENAME_PAIRS[:args.max_pairs]
             if args.max_pairs else None)
    if args.batched:
        # the two modes are exclusive: --batched is the offline queue
        # path; with --online defaulting ON since r5 it must not ALSO
        # construct the live executor
        args.online = False
    if args.warmup:
        from ..engine.warmup import warmup_serving

        warmup_serving(cfg, online=args.online)
    app = create_app(config=cfg, data_dir=args.data_dir, pairs=pairs,
                     autostart=not args.no_autostart, batched=args.batched,
                     online=args.online, metrics_path=args.metrics,
                     queue_retries=args.retries)
    web.run_app(app, host=args.host, port=args.port)
    return 0


if __name__ == "__main__":
    main()
