"""Measure the convergence early-stop (config.stop_tol) on the chip.

Motivation (measurements/r4/followup/evals_perchunk_unit_bf16_500.log):
once a bf16 full-Wolfe L-BFGS run converges, every further step burns ~9
line-search evals making zero progress — at the reference's max-quality
budget (iters_num=1500, reference config.py:13) most of the run can be
that tail. stop_tol ends the run at the chunk where the relative loss
change drops below tolerance.

Both arms share ONE compiled graph (stop_tol is host-side control flow,
not part of _config_key), so this is a compile-free same-session A/B:
run the full-budget arm first, then the early-stop arm.

Usage: exp_stoptol.py [iters] [stop_tol] [chunk] [base_diameter]
(base_diameter 16 + ASTT_PLATFORM=cpu = the pre-chip smoke setting)
"""
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from artstyletransfer_tpu.config import Config, production_config  # noqa: E402
from artstyletransfer_tpu.engine.transfer import TransferJob
from artstyletransfer_tpu.utils.image import load_image

CONTENT = "/root/reference/data/content-images/bird.jpg"
STYLE = "/root/reference/data/style-images/cubism2.jpg"


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 1500
    tol = float(sys.argv[2]) if len(sys.argv) > 2 else 1e-4
    chunk = int(sys.argv[3]) if len(sys.argv) > 3 else 50
    diameter = int(sys.argv[4]) if len(sys.argv) > 4 else 256
    content, style = load_image(CONTENT), load_image(STYLE)

    import dataclasses
    base = production_config(Config(levels_num=2, base_diameter=diameter,
                                    optimizer="lbfgs", stream_every=chunk,
                                    iters_num=iters))
    # Warmup: both arms share ONE executable (stop_tol is host-side only),
    # so one untimed chunk compiles everything both timed arms run.
    warm = TransferJob(content, style, base, params=None)
    for _ in warm.run(iters_num=chunk, yield_images=False):
        pass
    print("warmup done (compile excluded from both arms)", flush=True)

    for label, cfg in (("full", base),
                       (f"stop_tol={tol:g}",
                        dataclasses.replace(base, stop_tol=tol))):
        job = TransferJob(content, style, cfg, params=None)
        t0 = time.perf_counter()
        done = f = None
        for done, _img, f in job.run(yield_images=False):
            pass
        # sync by fetching a scalar (block_until_ready is unreliable
        # through the axon tunnel, CLAUDE.md)
        wall = time.perf_counter() - t0
        print(f"{label}: stopped at {done}/{iters} steps, final loss "
              f"{f:.6e}, wall {wall:.1f}s (warm)", flush=True)


if __name__ == "__main__":
    main()
