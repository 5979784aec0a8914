"""Batched convergence early-stop + shrink at a COMPUTE-BOUND shape.

The 1level256 serving matrix (PARITY) showed shrink is a wall wash
through this tunnel because its per-chunk cost is dispatch-latency-bound
— batch width barely moves chunk wall. At 2level512 batch-4 the vmapped
chunk is compute-dominated (26.3 job-steps/s product shape), so dropping
lanes should cut the remaining chunks' wall proportionally. This harness
measures that directly: per-chunk walls + shrink trace + total wall for
(a) stop_tol + shrink (default) vs (b) no stop (the reference budget).

All sizes the shrink ladder can touch (4, 2, 1) are warmed first, so the
timed arms are compile-free.

Usage: exp_stoptol_batch.py [iters] [stop_tol] [chunk] [batch] [diameter]
(diameter 16 + ASTT_PLATFORM=cpu = the pre-chip smoke setting)
"""
import dataclasses
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np  # noqa: E402

from artstyletransfer_tpu.config import Config, production_config  # noqa: E402
from artstyletransfer_tpu.parallel.batch import BatchedTransferJob  # noqa: E402
from artstyletransfer_tpu.utils.image import load_image  # noqa: E402

CONTENT = "/root/reference/data/content-images/bird.jpg"
STYLE = "/root/reference/data/style-images/cubism2.jpg"


def timed_run(label, contents, styles, cfg, iters):
    batch = BatchedTransferJob(contents, styles, cfg)
    t0 = time.perf_counter()
    done = losses = None
    for done, _imgs, losses in batch.run(iters_num=iters,
                                         yield_images=False):
        tc = time.perf_counter()
        print(f"  [{label}] step {done}: "
              f"losses {np.array2string(np.asarray(losses), precision=3)} "
              f"t={tc - t0:.1f}s", flush=True)
    wall = time.perf_counter() - t0
    print(f"{label}: stopped at {done}/{iters}, wall {wall:.1f}s (warm)",
          flush=True)
    return wall, done


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 1500
    tol = float(sys.argv[2]) if len(sys.argv) > 2 else 1e-4
    chunk = int(sys.argv[3]) if len(sys.argv) > 3 else 50
    n_jobs = int(sys.argv[4]) if len(sys.argv) > 4 else 4
    diameter = int(sys.argv[5]) if len(sys.argv) > 5 else 256
    content, style = load_image(CONTENT), load_image(STYLE)
    contents, styles = [content] * n_jobs, [style] * n_jobs

    base = production_config(Config(levels_num=2, base_diameter=diameter,
                                    optimizer="lbfgs", stream_every=chunk,
                                    iters_num=iters))
    stop = dataclasses.replace(base, stop_tol=tol)

    # warm every size the shrink ladder can touch (compile-free arms).
    # Sizes come from this harness's own dispatch — timed_run always
    # vmaps batch n_jobs — not from the queue policy (on CPU, where
    # production_config keeps lbfgs_t_init='lr', planned_round_sizes
    # routes full-Wolfe sequential and would warm only batch-1, leaving
    # the smoke's timed arms compiling).
    ladder = sorted({n_jobs} | {1 << p
                                for p in range((n_jobs - 1).bit_length())})
    for size in ladder:
        t0 = time.perf_counter()
        # warm with the STOP config (same graph key — stop knobs are
        # host-side) so warm_shrink_gathers engages and the timed arms
        # never compile a shrink-gather executable
        wb = BatchedTransferJob([content] * size, [style] * size, stop)
        for _ in wb.run(iters_num=chunk, yield_images=False):
            pass
        n_gathers = wb.warm_shrink_gathers()
        print(f"warmup batch-{size}: {time.perf_counter() - t0:.1f}s "
              f"(+{n_gathers} shrink-gather executables)", flush=True)

    timed_run("no-stop", contents, styles, base, iters)
    timed_run(f"stop_tol={tol:g}+shrink", contents, styles, stop, iters)


if __name__ == "__main__":
    main()
