"""On-device rate of the batched 1level256 step, fused_style_bwd on vs off.

Times chunks with the pipelined iterator like bench.py but uses LONG runs
(500 steps) to dilute RPC noise, and prints per-config wall rates.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from artstyletransfer_tpu.config import Config
from artstyletransfer_tpu.parallel import BatchedTransferJob
from artstyletransfer_tpu.utils.image import load_image

CONTENT = "/root/reference/data/content-images/bird.jpg"
STYLE = "/root/reference/data/style-images/cubism2.jpg"


def measure(fused: bool, batch=8, n_steps=500, chunk=100) -> float:
    cfg = Config(levels_num=1, base_diameter=256, optimizer="adam",
                 iters_num=n_steps + chunk, stream_every=chunk,
                 fused_style_bwd=fused)
    content, style = load_image(CONTENT), load_image(STYLE)
    job = BatchedTransferJob([content] * batch, [style] * batch, cfg)
    it = job.run(iters_num=n_steps + chunk, stream_every=chunk,
                 yield_images=False)
    _done, _imgs, f0 = next(it)
    np.asarray(f0)
    t0 = time.time()
    for done, _imgs, f in it:
        pass
    np.asarray(f)
    dt = time.time() - t0
    rate = batch * n_steps / dt
    print(f"fused={fused}: {n_steps} steps x {batch} jobs in {dt:.2f}s "
          f"-> {rate:.1f} job-steps/s", flush=True)
    return rate


def main():
    order = sys.argv[1:] or ["on", "off", "on", "off"]
    for o in order:
        measure(o == "on")


if __name__ == "__main__":
    main()
