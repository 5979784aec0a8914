"""Time-to-first-progress under live arrivals: round mode vs live joins.

The r4 round-based online executor made a task arriving mid-round wait
for the WHOLE in-flight round before its first optimizer step; the r5
live-join executor (parallel/live.py) admits it into the in-flight batch
at the next chunk boundary. This harness measures what a newly arriving
user actually experiences on the real chip:

  per task: t_first  = first progress callback - add_task time
            t_done   = completion - add_task time

Protocol: one executor per mode (same process, shared XLA compile
caches), the full serving warmup ladder precompiled first —
warmup_aspect_buckets at batch sizes {1, 2, 4} warms the scalar-chunk
executables (round mode), the per-lane-step variants (join mode,
warm_live_chunk) and the shrink gathers, exactly what `astt-lab
--warmup` runs — so neither measurement carries a cold compile. (A first
run of this harness warmed only batch 1: every join then stalled on a
mid-serve compile, burying the latency signal — the exact failure mode
the production warmup exists to prevent.) Then a staggered arrival
trace: task A at t=0, B at +3 s, C at +6 s — same bucket (canonicalized),
the exact pattern where round mode forces B and C to wait out A's round.

Config: 1level256 Adam bf16 (fast compiles; the arrival-latency
property under test is EXECUTOR-level — the production L-BFGS path rides
the same join machinery, tested in tests/test_online.py).

Usage: python scripts/exp_join_latency.py [iters=500] [chunk=50] [stagger=3]
Output: JSON on stdout, human log on stderr.
"""

from __future__ import annotations

import asyncio
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from artstyletransfer_tpu.config import Config, production_config
from artstyletransfer_tpu.engine.transfer import ContentStylePair
from artstyletransfer_tpu.models.weights import load_vgg19_params
from artstyletransfer_tpu.runtime.online import OnlineBatchingExecutor
from artstyletransfer_tpu.utils.image import load_image

DATA = "/root/reference/data"


def log(*a):
    print(*a, file=sys.stderr, flush=True)


async def drive(cfg, params, batch_join, pairs, stagger_s, tag):
    t_add = {}
    t_first = {}
    t_done = {}

    async def report(tid, value):
        now = time.time()
        pct = value[0]
        if tid not in t_first and pct >= 0:
            t_first[tid] = now - t_add[tid]
        if pct >= 100.0 and tid not in t_done:
            t_done[tid] = now - t_add[tid]

    ex = OnlineBatchingExecutor(cfg, params=params, verbose=False,
                                canonicalize=True, batch_window_s=0.25,
                                batch_join=batch_join,
                                report_progress=report)

    async def feeder():
        for i, pair in enumerate(pairs):
            if i:
                await asyncio.sleep(stagger_s)
            t_add[f"{tag}{i}"] = time.time()
            await ex.add_task(f"{tag}{i}", pair)

    t0 = time.time()
    feed = asyncio.create_task(feeder())
    await feed
    await ex.run()
    wall = time.time() - t0
    await ex.aclose()
    assert ex.failures == {}, ex.failures
    order = sorted(t_add)
    return {
        "first_progress_s": [round(t_first[t], 2) for t in order],
        "done_s": [round(t_done[t], 2) for t in order],
        "wall_s": round(wall, 2),
    }


async def main_async():
    import jax

    log(f"platform: {jax.devices()[0].platform} "
        f"({jax.devices()[0].device_kind})")
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    stagger = float(sys.argv[3]) if len(sys.argv) > 3 else 3.0

    cfg = production_config(Config(levels_num=1, base_diameter=256,
                                   optimizer="adam", iters_num=iters,
                                   stream_every=chunk))
    params = load_vgg19_params(seed=cfg.seed)
    content = load_image(f"{DATA}/content-images/bird.jpg")
    styles = [load_image(f"{DATA}/style-images/{s}.jpg")
              for s in ("cubism2", "mosaic", "starry_night")]
    pairs = [ContentStylePair(("c.jpg", content), (f"s{i}.jpg", s))
             for i, s in enumerate(styles)]

    # the production warmup ladder: every executable either mode can
    # dispatch at <= 3 concurrent tasks (sizes 1, 2, 4; scalar +
    # per-lane-step chunk variants + shrink gathers)
    from artstyletransfer_tpu.engine.warmup import warmup_aspect_buckets
    from artstyletransfer_tpu.parallel.batch import DEFAULT_ASPECT_BUCKETS

    h, w = content.shape[:2]
    aspect = min(DEFAULT_ASPECT_BUCKETS, key=lambda a: abs(a - w / h))
    t0 = time.time()
    n = warmup_aspect_buckets(cfg, params=params, aspects=(aspect,),
                              batch_sizes=(1, 2, 4))
    log(f"warmup ladder: {n} executables in {time.time() - t0:.0f}s")

    out = {"iters": iters, "chunk": chunk, "stagger_s": stagger}
    for batch_join, mode in ((False, "round"), (True, "join")):
        log(f"== warm {mode} executor path (throwaway task) ==")
        t0 = time.time()
        await drive(cfg, params, batch_join, pairs[:1], 0.0, f"warm_{mode}")
        log(f"   warmed in {time.time() - t0:.0f}s")
        log(f"== measure {mode} mode: A at 0s, B at +{stagger}s, C at +{2*stagger}s ==")
        res = await drive(cfg, params, batch_join, pairs, stagger, mode)
        log(f"   {mode}: first-progress {res['first_progress_s']} "
            f"done {res['done_s']} wall {res['wall_s']}s")
        out[mode] = res
    # the headline: the LAST arrival's wait for its first progress
    out["newcomer_first_progress_round_s"] = out["round"][
        "first_progress_s"][-1]
    out["newcomer_first_progress_join_s"] = out["join"][
        "first_progress_s"][-1]
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(asyncio.run(main_async()))
