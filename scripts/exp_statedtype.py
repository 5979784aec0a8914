"""bf16-stored L-BFGS history study (config.lbfgs_state_dtype; real chip).

Question: can the (m, n) s/y pair buffers be stored in bfloat16 — halving
both their HBM footprint (the capacity limit that forces history=10 at
2K, engine/transfer.py::lbfgs_history_gb) and the matrix direction's
streamed bandwidth — without hurting the optimization?

Method (the precision_study.py protocol): at the full L-BFGS production
stack (full-Wolfe + unit opening trial + carried Grams, bf16 compute,
history=100) run
  A. f32-stored history (current default)
  B. bf16-stored history
  C. f32-stored history with the init image perturbed by +1e-5 on one
     pixel (control: the divergence pure CHAOS produces between two runs
     of identical quality)
and compare final losses under ONE shared f32 metric graph plus
PSNR(A,B) vs PSNR(A,C). bf16 history is declared equivalent if its loss
delta sits inside the chaos band and PSNR(A,B) is in the chaos regime.

Speed is measured separately by the bench rows lbfgs3level1024unitgrams
(f32 history) vs lbfgs3level1024unitsd16 (bf16 history), and the 2K
capability by lbfgs4level2kh100sd16.

Usage: python scripts/exp_statedtype.py [iters=300] [size=512]
Output: JSON dict on stdout, human log on stderr.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from artstyletransfer_tpu.config import Config
from artstyletransfer_tpu.engine.transfer import TransferJob
from artstyletransfer_tpu.utils.image import load_image

CONTENT = "/root/reference/data/content-images/bird.jpg"
STYLE = "/root/reference/data/style-images/cubism2.jpg"


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def psnr(a, b):
    a = np.clip(a, 0.0, 1.0)
    b = np.clip(b, 0.0, 1.0)
    mse = float(np.mean((a - b) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(1.0 / mse)


def run_variant(tag, content, style, cfg, iters, init_override=None):
    t0 = time.time()
    job = TransferJob(content, style, cfg, init_override=init_override)
    img = None
    loss = None
    for done, img, loss in job.run(iters_num=iters, stream_every=50,
                                   yield_images=False):
        pass
    log(f"  {tag}: {iters} steps in {time.time() - t0:.0f}s "
        f"(incl compile), final loss {loss:.6e}")
    return np.asarray(img), float(loss)


def main():
    import jax

    log(f"platform: {jax.devices()[0].platform} "
        f"({jax.devices()[0].device_kind})")
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    levels = {256: 1, 512: 2, 1024: 3}[size]

    content, style = load_image(CONTENT), load_image(STYLE)
    base = Config(levels_num=levels, base_diameter=256, optimizer="lbfgs",
                  lbfgs_t_init="unit", lbfgs_grams="incremental",
                  compute_dtype="bfloat16", stream_every=50)
    cfg_b = Config(**{**base.__dict__, "lbfgs_state_dtype": "bfloat16"})
    # the shared f32 metric graph (default-dtype Config at this shape)
    eval_job = TransferJob(content, style,
                           Config(levels_num=levels, base_diameter=256))

    log(f"== {levels}level{size} full-Wolfe unit h={base.lbfgs_history} "
        f"bf16-compute: f32 vs bf16 history storage ==")
    img_a, _ = run_variant("A f32-history", content, style, base, iters)

    from artstyletransfer_tpu.engine.init_pipeline import build_init_image
    init_img, _ = build_init_image(base.init_method, content, style, base,
                                   rng=np.random.default_rng(base.seed))
    init_p = init_img.copy()
    init_p[0, 0, 0] += 1e-5
    img_c, _ = run_variant("C chaos-control", content, style, base, iters,
                           init_override=init_p)

    img_b, _ = run_variant("B bf16-history", content, style, cfg_b, iters)

    l_a = eval_job.loss_report(img_a)[0]
    l_b = eval_job.loss_report(img_b)[0]
    l_c = eval_job.loss_report(img_c)[0]
    out = {
        "iters": iters, "size": size,
        "loss_f32_state": l_a,
        "loss_bf16_state_f32eval": l_b,
        "loss_f32_perturbed": l_c,
        "bf16_state_loss_delta_pct": (l_b - l_a) / l_a * 100.0,
        "chaos_loss_delta_pct": (l_c - l_a) / l_a * 100.0,
        "psnr_f32_vs_bf16_state": psnr(img_a, img_b),
        "psnr_f32_vs_perturbed": psnr(img_a, img_c),
    }
    log(f"  f32-eval losses: f32-state {l_a:.6e}  bf16-state {l_b:.6e}  "
        f"perturbed {l_c:.6e}")
    log(f"  PSNR f32-vs-bf16-state {out['psnr_f32_vs_bf16_state']:.1f} dB, "
        f"chaos control {out['psnr_f32_vs_perturbed']:.1f} dB")
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
