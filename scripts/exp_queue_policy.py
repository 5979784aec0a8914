"""Measure the job-queue batching policy end-to-end (VERDICT r2 #1).

Round 2 measured vmapped full-Wolfe L-BFGS at 6.6 job-steps/s vs ~14
sequential (lockstep line-search while_loops) and run_job_queue now
auto-routes full-Wolfe queues sequentially (parallel/batch.py
resolve_batch_policy). This script closes the loop: it drives the REAL
run_job_queue with a full-Wolfe L-BFGS queue and reports aggregate
job-steps/s under the auto policy, proving the queue now delivers ~the
sequential rate instead of the 2x-regressed vmapped rate.

Protocol: N identical-shape jobs (one bucket) at 2level512, the r2
measurement shape. Sequential routing compiles once (in-process compile
cache shared across same-config jobs) and runs the jobs back to back;
job-steps/s = N * steps / wall-after-first-chunk. The first job's first
chunk carries the compile; it is excluded by timing from the moment the
first chunk of job 1 lands (same warmup discipline as bench.py).

Usage: python scripts/exp_queue_policy.py [--jobs 2] [--steps 150]
       [--policy auto|batched|sequential] [--max-ls 25]
Output: one JSON dict on stdout, logs on stderr.
"""

from __future__ import annotations

import argparse

import json
import sys
import time



sys.path.insert(0, "/root/repo")

CONTENT = "/root/reference/data/content-images/bird.jpg"
STYLE = "/root/reference/data/style-images/cubism2.jpg"


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--jobs", type=int, default=2)
    p.add_argument("--steps", type=int, default=150)
    p.add_argument("--chunk", type=int, default=50)
    p.add_argument("--policy", default="auto")
    p.add_argument("--max-ls", type=int, default=25)
    p.add_argument("--history", type=int, default=100)
    args = p.parse_args(argv)

    from artstyletransfer_tpu.config import Config
    from artstyletransfer_tpu.parallel.batch import (resolve_batch_policy,
                                                     run_job_queue)
    from artstyletransfer_tpu.utils.image import load_image

    cfg = Config(levels_num=2, base_diameter=256, optimizer="lbfgs",
                 lbfgs_max_ls_steps=args.max_ls,
                 lbfgs_history=args.history,
                 iters_num=args.steps + args.chunk,
                 stream_every=args.chunk)
    resolved = resolve_batch_policy(cfg, args.policy)
    log(f"policy {args.policy} -> {resolved}; jobs={args.jobs} "
        f"steps={args.steps}+{args.chunk} warmup, max_ls={args.max_ls}")

    content = load_image(CONTENT)
    style = load_image(STYLE)
    jobs = [(f"job{i}", content, style) for i in range(args.jobs)]

    # Timing: total job-steps delivered after the first progress callback
    # (the compile-bearing chunk), over the wall time from that callback to
    # completion. stream_images=False: a per-chunk image D2H costs ~2 ms on
    # a real TPU host but ~1-2 s through this host's tunnel (CLAUDE.md),
    # which would swamp the policy comparison (the r2 batched-vs-sequential
    # numbers were measured without image streaming). run_job_queue floats
    # the loss per chunk, which is the scalar sync.
    state = {"t0": None, "chunks": 0}
    done_steps = {}

    def progress(tid, pct, img, loss):
        done_steps[tid] = pct / 100.0 * cfg.iters_num
        state["chunks"] += 1
        if state["t0"] is None:
            state["t0"] = time.time()
            state["warm_steps"] = sum(done_steps.values())
        log(f"  {tid} {pct:5.1f}% loss {loss:.3e}")

    t_start = time.time()
    results, failures = run_job_queue(jobs, cfg, batch_policy=args.policy,
                                      progress=progress,
                                      stream_images=False)
    wall = time.time() - state["t0"]
    total_steps = sum(done_steps.values()) - state["warm_steps"]
    jsps = total_steps / wall
    log(f"queue wall {time.time() - t_start:.1f}s "
        f"(timed {wall:.1f}s), failures={list(failures)}")
    assert len(results) == args.jobs and not failures
    print(json.dumps({
        "policy": args.policy, "resolved": resolved, "jobs": args.jobs,
        "steps_per_job": cfg.iters_num, "timed_job_steps": total_steps,
        "job_steps_per_sec": round(jsps, 2)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
