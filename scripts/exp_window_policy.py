"""Coalescing-window policy study for the online batching executor.

The online executor holds arriving tasks for `batch_window_s` so
near-simultaneous requests join one vmapped round (runtime/online.py).
The default (0.25s) was chosen by intuition; this harness characterizes
the trade-off with data: Poisson arrivals are driven through the REAL
OnlineBatchingExecutor scheduling (intake, coalescing, round
serialization, padded batch sizes) with a fake queue runner whose
duration models the measured chip-time law — a batched round costs
roughly base + incr*ceil(batch/pow2) (vmapped steps are nearly
batch-size-free until saturation; PARITY batch rows) — so the QUEUING
dynamics are real even though no chip is used.

Outputs, per window setting: mean/p95 task completion latency, rounds
dispatched, mean batch size, and makespan. The interesting regime is
arrival bursts (albums, demo enqueues): window=0 dispatches a 1-job
round immediately and the followers wait a full service time; a short
window coalesces them for ~one service time total.

Usage: python scripts/exp_window_policy.py [--rate 2.0] [--tasks 24]
       [--service-base 6.0] [--service-incr 0.5] [--windows 0,0.25,1,2]
Pure CPU, deterministic (seeded arrivals), ~1 min. Prints one JSON line.
"""

import argparse
import asyncio
import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from artstyletransfer_tpu.config import Config  # noqa: E402
from artstyletransfer_tpu.engine.transfer import ContentStylePair  # noqa: E402
from artstyletransfer_tpu.runtime.online import OnlineBatchingExecutor  # noqa: E402


class ModelRunner:
    """Fake run_job_queue with the measured service-time shape: a round
    of B jobs costs base + incr * B (vmapped step cost is nearly flat in
    batch size; the residual linear term covers per-job image fetches).
    Sleeps REAL wall time so the executor's scheduling is exercised
    unmodified."""

    def __init__(self, base_s: float, incr_s: float, speedup: float):
        self.base_s = base_s
        self.incr_s = incr_s
        self.speedup = speedup  # divide modeled times for a fast study
        self.rounds = []

    def __call__(self, jobs, cfg, progress=None, **kw):
        self.rounds.append(len(jobs))
        # run_job_queue splits a round into groups of <= max_batch (8,
        # the online default) and serializes them: price each group
        n, cost = len(jobs), 0.0
        while n > 0:
            g = min(n, 8)
            cost += self.base_s + self.incr_s * g
            n -= g
        time.sleep(cost / self.speedup)
        results = {}
        for tid, content, _style in jobs:
            if progress is not None:
                progress(tid, 100.0, None, 1.0)
            results[tid] = content
        return results, {}


async def drive(window_s, arrivals, runner):
    ex = OnlineBatchingExecutor(Config(iters_num=100), verbose=False,
                                canonicalize=False, queue_runner=runner,
                                batch_window_s=window_s)
    t0 = time.perf_counter()
    done_t = {}

    orig_report = ex._report

    async def report(tid, pct, img, loss):
        if pct >= 100.0:
            done_t[tid] = time.perf_counter() - t0
        await orig_report(tid, pct, img, loss)

    ex._report = report

    img = np.zeros((4, 4, 3), np.float32)
    submit_t = {}
    for i, delay in enumerate(arrivals):
        target = t0 + delay
        now = time.perf_counter()
        if target > now:
            await asyncio.sleep(target - now)
        tid = f"t{i}"
        submit_t[tid] = time.perf_counter() - t0
        await ex.add_task(tid, ContentStylePair(("c", img), ("s", img)))
    await ex.run()
    makespan = time.perf_counter() - t0
    lat = sorted(done_t[t] - submit_t[t] for t in done_t)
    return {
        "window_s": window_s,
        "mean_latency_s": round(float(np.mean(lat)), 2),
        "p95_latency_s": round(float(lat[int(0.95 * (len(lat) - 1))]), 2),
        "makespan_s": round(makespan, 2),
        "rounds": len(runner.rounds),
        "mean_batch": round(float(np.mean(runner.rounds)), 2),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rate", type=float, default=2.0,
                    help="Poisson arrival rate, tasks/s of MODELED time")
    ap.add_argument("--tasks", type=int, default=24)
    ap.add_argument("--service-base", type=float, default=6.0,
                    help="round cost at batch 1, modeled seconds (a "
                         "1level256 Adam job: 200 steps / 45 steps/s)")
    ap.add_argument("--service-incr", type=float, default=0.5,
                    help="per-extra-job round cost, modeled seconds")
    ap.add_argument("--speedup", type=float, default=10.0,
                    help="time compression for the study (all modeled "
                         "durations divided by this; results reported "
                         "in MODELED seconds)")
    ap.add_argument("--windows", default="0,0.25,1,2")
    ap.add_argument("--pattern", choices=("poisson", "pairs"),
                    default="poisson",
                    help="'pairs': tasks arrive in near-simultaneous "
                         "2-task bursts (the Telegram album shape, 40ms "
                         "apart) separated by exponential gaps — the "
                         "case the coalescing window exists for")
    args = ap.parse_args()

    rng = np.random.default_rng(7)
    if args.pattern == "pairs":
        gaps = rng.exponential(2.0 / args.rate, args.tasks // 2)
        starts = np.cumsum(gaps)
        arrivals = np.sort(np.concatenate([starts, starts + 0.04]))
    else:
        gaps = rng.exponential(1.0 / args.rate, args.tasks)
        arrivals = np.cumsum(gaps)
    arrivals = arrivals / args.speedup  # compressed wall time

    rows = []
    for w in (float(x) for x in args.windows.split(",")):
        runner = ModelRunner(args.service_base, args.service_incr,
                             args.speedup)
        row = asyncio.run(drive(w / args.speedup, arrivals, runner))
        # report in modeled seconds
        for k in ("mean_latency_s", "p95_latency_s", "makespan_s"):
            row[k] = round(row[k] * args.speedup, 2)
        row["window_s"] = w
        rows.append(row)
        print(json.dumps(row), file=sys.stderr)
    print(json.dumps({"rate": args.rate, "tasks": args.tasks,
                      "service": [args.service_base, args.service_incr],
                      "rows": rows}))


if __name__ == "__main__":
    main()
