"""Time-to-first-chunk for the L-BFGS engine with/without fused_style_bwd.

Usage: python scripts/exp_lbfgs_compile.py {on|off} [max_ls_steps]
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from artstyletransfer_tpu.config import Config
from artstyletransfer_tpu.engine.transfer import TransferJob
from artstyletransfer_tpu.utils.image import load_image

CONTENT = "/root/reference/data/content-images/bird.jpg"
STYLE = "/root/reference/data/style-images/cubism2.jpg"


def main():
    fused = sys.argv[1] == "on"
    max_ls = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    cfg = Config(levels_num=2, base_diameter=256, optimizer="lbfgs",
                 iters_num=100, stream_every=50, fused_style_bwd=fused,
                 lbfgs_max_ls_steps=max_ls)
    content, style = load_image(CONTENT), load_image(STYLE)
    t0 = time.perf_counter()
    job = TransferJob(content, style, cfg)
    setup = time.perf_counter() - t0
    t0 = time.perf_counter()
    for done, img, loss in job.run(yield_images=False):
        loss = float(np.asarray(loss).ravel()[0])
        break
    first = time.perf_counter() - t0
    print(f"fused={fused} max_ls={max_ls}: setup {setup:.1f}s, "
          f"first chunk (compile+50 steps) {first:.1f}s, loss {loss:.4g}",
          flush=True)


if __name__ == "__main__":
    main()
