"""Real-chip A/B: online batching executor vs the reference-style
semaphore executor for concurrent live jobs (VERDICT r3 #1 done-criterion:
>= 3x aggregate job-steps/s for 4 concurrent 1level256 Adam jobs).

Both paths run in one process (shared weights; separate compile cache
entries: single-job graph vs batch-4 vmapped graph). Each path is warmed
up first so XLA compiles are excluded, then timed end-to-end from task
submission to all-done — the serving metric a user actually experiences.

Usage (on the real chip):
  python scripts/exp_online_serving.py [--jobs 4] [--iters 200]
Prints one JSON summary line.
"""

import argparse
import asyncio
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from artstyletransfer_tpu import config as config_mod  # noqa: E402
from artstyletransfer_tpu.config import Config, production_config  # noqa: E402
from artstyletransfer_tpu.engine.transfer import (ContentStylePair,  # noqa: E402
                                                  TransferJob)
from artstyletransfer_tpu.models.weights import load_vgg19_params  # noqa: E402
from artstyletransfer_tpu.parallel.batch import (BatchedTransferJob,  # noqa: E402
                                                 canonicalize_content,
                                                 canonicalize_style)
from artstyletransfer_tpu.runtime import executor as executor_mod  # noqa: E402
from artstyletransfer_tpu.runtime.executor import Executor  # noqa: E402
from artstyletransfer_tpu.runtime.online import OnlineBatchingExecutor  # noqa: E402
from artstyletransfer_tpu.utils.image import load_image  # noqa: E402

CONTENT = "/root/reference/data/content-images/bird.jpg"
STYLE = "/root/reference/data/style-images/vg_starry_night.jpg"


def make_pairs(n, cfg):
    content = canonicalize_content(load_image(CONTENT), cfg)
    style = canonicalize_style(load_image(STYLE), cfg)
    return [ContentStylePair((f"c{i}.jpg", content.copy()),
                             (f"s{i}.jpg", style.copy()))
            for i in range(n)]


async def run_semaphore(pairs, cfg, params, stream_images=True):
    executor_mod.reset_semaphore()

    async def engine(pair, *a, **kw):
        # the production single-job engine with shared weights/config
        from artstyletransfer_tpu.engine.transfer import (
            neural_style_transfer)
        kw.pop("params", None)
        kw.pop("config", None)  # Task forwards it; we bind our own below
        async for out in neural_style_transfer(
                pair, *a, params=params, config=cfg,
                stream_images=stream_images, **kw):
            yield out

    ex = Executor(cfg, engine=engine, verbose=False)
    t0 = time.perf_counter()
    for i, p in enumerate(pairs):
        await ex.add_task(f"sem{i}", p)
    await ex.run()
    wall = time.perf_counter() - t0
    assert not ex.failures, ex.failures
    return wall


async def run_online(pairs, cfg, params, stream_images=True):
    ex = OnlineBatchingExecutor(cfg, verbose=False, params=params,
                                canonicalize=False,  # already canonical
                                stream_images=stream_images,
                                batch_window_s=0.1)
    t0 = time.perf_counter()
    for i, p in enumerate(pairs):
        await ex.add_task(f"onl{i}", p)
    await ex.run()
    wall = time.perf_counter() - t0
    assert not ex.failures, ex.failures
    assert ex.dispatch_rounds == 1, ex.dispatch_rounds
    return wall


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--jobs", type=int, default=4)
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--stream-every", type=int, default=50)
    ap.add_argument("--base-diameter", type=int, default=256,
                    help="level-0 shortest side (16 for a CPU smoke run)")
    ap.add_argument("--no-images", action="store_true",
                    help="skip per-chunk image D2H in BOTH timed paths "
                         "(final images still produced). The fetch is ~2 ms"
                         " on a real TPU host NIC but 0.2-1 s/chunk through"
                         " this host's tunnel (CLAUDE.md) — this flag "
                         "removes that equal-on-both-sides tunnel artifact"
                         " from the serving comparison")
    ap.add_argument("--optimizer", choices=["adam", "lbfgs"],
                    default="adam",
                    help="lbfgs = the production default optimizer "
                         "(full-Wolfe + unit opening trial via "
                         "production_config; since the r4 policy change "
                         "the online executor vmaps these rounds too)")
    ap.add_argument("--stop-tol", type=float, default=0.0,
                    help="convergence early-stop for BOTH timed paths "
                         "(config.stop_tol); job-steps/s is then "
                         "meaningless — compare the wall times")
    args = ap.parse_args()
    stream_images = not args.no_images

    cfg = production_config(Config(
        levels_num=1, optimizer=args.optimizer, iters_num=args.iters,
        stream_every=args.stream_every, base_diameter=args.base_diameter,
        stop_tol=args.stop_tol))
    params = load_vgg19_params(seed=cfg.seed)
    pairs = make_pairs(args.jobs, cfg)
    total_steps = args.jobs * args.iters

    # ---- warmup: compile both graphs outside the timed regions ---------
    print("[warmup] single-job graph ...", file=sys.stderr)
    wj = TransferJob(pairs[0].content[1], pairs[0].style[1], cfg,
                     params=params)
    for _ in wj.run(iters_num=args.stream_every,
                    stream_every=args.stream_every, yield_images=False):
        pass
    # warm the EXACT padded batch sizes the online executor will dispatch
    # (planned_round_sizes mirrors run_job_queue's grouping + pad policy;
    # max_batch=8 is OnlineBatchingExecutor's default) — warming args.jobs
    # verbatim would leave e.g. --jobs 6 hitting a cold batch-8 compile
    # INSIDE the timed online region
    from artstyletransfer_tpu.parallel.batch import planned_round_sizes
    sizes = planned_round_sizes(cfg, pairs[0].content[1].shape, args.jobs,
                                max_batch=8)
    for size in sizes:
        print(f"[warmup] batch-{size} graph ...", file=sys.stderr)
        wb = BatchedTransferJob([pairs[0].content[1]] * size,
                                [pairs[0].style[1]] * size, cfg,
                                params=params)
        for _ in wb.run(iters_num=args.stream_every,
                        stream_every=args.stream_every, yield_images=False):
            pass
        # with --stop-tol: the fused shrink-gather executables too (no-op
        # otherwise), mirroring warmup_serving
        wb.warm_shrink_gathers()

    print("[run] semaphore executor (reference scheduling) ...",
          file=sys.stderr)
    wall_sem = asyncio.run(run_semaphore(pairs, cfg, params,
                                         stream_images=stream_images))
    print(f"  {wall_sem:.1f}s = {total_steps / wall_sem:.1f} job-steps/s",
          file=sys.stderr)

    print("[run] online batching executor ...", file=sys.stderr)
    wall_onl = asyncio.run(run_online(pairs, cfg, params,
                                      stream_images=stream_images))
    print(f"  {wall_onl:.1f}s = {total_steps / wall_onl:.1f} job-steps/s",
          file=sys.stderr)

    out = {
        "jobs": args.jobs, "iters": args.iters,
        "stop_tol": args.stop_tol,
        "stream_images": stream_images,
        "config": (f"1level{args.base_diameter}_{args.optimizer}_"
                   f"{cfg.compute_dtype}"),
        "semaphore_wall_s": round(wall_sem, 2),
        "semaphore_job_steps_per_s": round(total_steps / wall_sem, 2),
        "online_wall_s": round(wall_onl, 2),
        "online_job_steps_per_s": round(total_steps / wall_onl, 2),
        "speedup": round(wall_sem / wall_onl, 2),
        "simultaneous_tasks_count": config_mod.simultaneous_tasks_count,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
