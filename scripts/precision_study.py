"""bf16-vs-f32 production-precision study (run on the real chip).

Question: can compute_dtype=bfloat16 be the TPU production default (like
torch's TF32-by-default conv path on Ampere GPUs the reference inherits)?

Method: the optimization at lr_start=10 is chaotic, so pixel-level
divergence between two runs says nothing by itself. For each config we run:
  A. f32, the current default
  B. bf16
  C. f32 with the init image perturbed by +1e-5 on one pixel (control:
     how far does CHAOS alone take two "identical-quality" runs?)
and compare (1) final losses, all evaluated under the same f32 metric
graph, and (2) PSNR(A,B) vs PSNR(A,C). bf16 is declared equivalent if its
final f32-evaluated loss sits inside the A-vs-C band and PSNR(A,B) is in
the same regime as PSNR(A,C).

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


def run_variant(content, style, cfg, iters, init_override=None):
    t0 = time.time()
    job = TransferJob(content, style, cfg, init_override=init_override)
    img = None
    loss = None
    for done, img, loss in job.run(iters_num=iters, stream_every=50,
                                   yield_images=False):
        pass
    log(f"  {cfg.compute_dtype} {cfg.optimizer}: {iters} steps in "
        f"{time.time() - t0:.0f}s (incl compile), final loss {loss:.6e}")
    return np.asarray(img), float(loss)


def study(content, style, base_cfg, iters, f32_eval_job):
    out = {}
    cfg_f32 = base_cfg
    cfg_bf16 = Config(**{**base_cfg.__dict__, "compute_dtype": "bfloat16"})

    img_a, loss_a = run_variant(content, style, cfg_f32, iters)

    # control: perturb the init image by 1e-5 on one pixel
    from artstyletransfer_tpu.engine.init_pipeline import build_init_image
    init_img, _ = build_init_image(cfg_f32.init_method, content, style,
                                   cfg_f32, rng=np.random.default_rng(
                                       cfg_f32.seed))
    init_p = init_img.copy()
    init_p[0, 0, 0] += 1e-5
    img_c, loss_c = run_variant(content, style, cfg_f32, iters,
                                init_override=init_p)

    img_b, loss_b = run_variant(content, style, cfg_bf16, iters)

    # evaluate everything under ONE f32 metric graph
    l_a = f32_eval_job.loss_report(img_a)[0]
    l_b = f32_eval_job.loss_report(img_b)[0]
    l_c = f32_eval_job.loss_report(img_c)[0]

    out["loss_f32"] = l_a
    out["loss_bf16_f32eval"] = l_b
    out["loss_f32_perturbed"] = l_c
    out["psnr_f32_vs_bf16"] = psnr(img_a, img_b)
    out["psnr_f32_vs_perturbed"] = psnr(img_a, img_c)
    out["bf16_loss_delta_pct"] = (l_b - l_a) / l_a * 100.0
    out["chaos_loss_delta_pct"] = (l_c - l_a) / l_a * 100.0
    log(f"  f32-eval losses: f32 {l_a:.6e}  bf16 {l_b:.6e}  "
        f"perturbed-f32 {l_c:.6e}")
    log(f"  PSNR f32-vs-bf16 {out['psnr_f32_vs_bf16']:.1f} dB, "
        f"f32-vs-perturbed(chaos control) "
        f"{out['psnr_f32_vs_perturbed']:.1f} dB")
    return out


def main():
    import jax
    log(f"platform: {jax.devices()[0].platform} "
        f"({jax.devices()[0].device_kind})")
    content, style = load_image(CONTENT), load_image(STYLE)
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 500

    results = {}

    log("== 3level1024 Adam ==")
    cfg = Config(levels_num=3, base_diameter=256, optimizer="adam",
                 stream_every=50)
    eval_job = TransferJob(content, style, cfg)
    results["3level1024_adam"] = study(content, style, cfg, iters, eval_job)

    log("== 2level512 L-BFGS (reference default optimizer/semantics) ==")
    cfg = Config(levels_num=2, base_diameter=256, optimizer="lbfgs",
                 lbfgs_max_ls_steps=0, stream_every=50)
    eval_job = TransferJob(content, style, cfg)
    results["lbfgs2level512ref"] = study(content, style, cfg, iters,
                                         eval_job)

    print(json.dumps(results, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
