"""End-to-end demo: one transfer, then a batched queue.

Run:  python examples/demo.py CONTENT.jpg STYLE.jpg [STYLE2.jpg ...]

Writes out_single.jpg and out_<i>.jpg next to the inputs. Uses seeded VGG19
weights unless real ones are installed (see README "VGG19 weights").
"""

import sys

import numpy as np

from artstyletransfer_tpu import Config, TransferJob, load_image, run_job_queue
from artstyletransfer_tpu.utils.image import save_image


def main():
    if len(sys.argv) < 3:
        print(__doc__)
        return 1
    content = load_image(sys.argv[1])
    styles = [load_image(p) for p in sys.argv[2:]]

    # --- single job, streaming progress + checkpointing ---
    cfg = Config(levels_num=2, iters_num=200, optimizer="lbfgs",
                 stream_every=25)
    job = TransferJob(content, styles[0], cfg)
    for done, img, loss in job.run(checkpoint_path="demo.ckpt.npz",
                                   checkpoint_every=50):
        print(f"single: {done}/{cfg.iters_num}  loss {loss:.3e}")
    save_image(np.clip(img, 0, 1), "out_single.jpg")

    # --- batched queue: all styles at once, sharded over available chips ---
    if len(styles) > 1:
        jobs = [(f"job{i}", content, s) for i, s in enumerate(styles)]
        results, failures = run_job_queue(
            jobs, Config(levels_num=2, iters_num=200, optimizer="adam"),
            canonicalize_styles=True,
            progress=lambda tid, pct, img, loss:
                print(f"batch: {tid} {pct:.0f}%  loss {loss:.3e}"))
        for tid, img in results.items():
            save_image(np.clip(img, 0, 1), f"out_{tid}.jpg")
        for tid, exc in failures.items():
            print(f"batch: {tid} FAILED: {exc}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
