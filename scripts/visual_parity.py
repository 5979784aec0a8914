"""Visual-identity harness: regenerate the reference README's per-level
figures and score them against the bundled goldens.

The reference's published claim is its figures (reference README.md:35-60;
goldens reference img/bird_<style>_lvl{1,2,3}.jpg, pretrained weights
download at reference neural_nets.py:19). A zero-egress host cannot fetch
the weights, so this is the one-command last mile once a weights file is
available:

    export ASTT_VGG19_WEIGHTS=/path/to/vgg19.{npz,pth,h5}
    python scripts/visual_parity.py --out /tmp/parity
    # or a subset:
    python scripts/visual_parity.py --pairs bird_vg --levels 1 2

For every (pair, level) it runs the full standard-config optimization
(reference defaults: L-BFGS in exact reference semantics, 500 iterations,
content+noise init) at levels_num=level, writes the regenerated figure
next to a copy of the golden, and reports SSIM/PSNR between them.

Reading the scores: the optimization is chaotic at lr_start=10 (PARITY.md
"Production precision": two f32 runs differing by one 1e-5 pixel land at
~29 dB PSNR / high-but-not-unity SSIM after 500 steps), so parity with a
figure produced by a different framework build means SSIM in the same band
as the chaos control, NOT bitwise identity. Style/structure agreement
(SSIM >= ~0.4 at these sizes) indicates the same visual identity;
SSIM < ~0.2 indicates a real divergence (wrong taps, wrong loss, wrong
init).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np  # noqa: E402

# (golden stem, content file, style file) — mapping from the reference's
# golden filenames to its bundled data corpus (reference img/*.jpg,
# reference lab.py:79-100 demo pairs)
PAIRS = {
    "bird_vg": ("bird.jpg", "starry_night.jpg"),
    "bird_cubism": ("bird.jpg", "cubism2.jpg"),
    "bird_matisse": ("bird.jpg", "matisse2.jpg"),
    "bird_expr": ("bird.jpg", "expressive.jpg"),
}

REF_DATA = "/root/reference/data"
REF_IMG = "/root/reference/img"


def main(argv=None) -> int:
    from artstyletransfer_tpu.config import Config
    from artstyletransfer_tpu.engine.transfer import TransferJob
    from artstyletransfer_tpu.models.weights import load_vgg19_params
    from artstyletransfer_tpu.ops.resize import bicubic_resize_np
    from artstyletransfer_tpu.utils.image import load_image, save_image
    from artstyletransfer_tpu.utils.perceptual import psnr, ssim

    p = argparse.ArgumentParser(
        description="Regenerate the reference README figures and score "
                    "them against the bundled goldens")
    p.add_argument("--weights", default=None,
                   help="VGG19 weights (.npz/.pth/.h5); default: "
                        "ASTT_VGG19_WEIGHTS / cache")
    p.add_argument("--pairs", nargs="+", choices=sorted(PAIRS),
                   default=["bird_vg"])
    p.add_argument("--levels", nargs="+", type=int, default=[1, 2, 3])
    p.add_argument("--iters", type=int, default=500,
                   help="optimization steps per figure (reference default "
                        "500)")
    p.add_argument("--out", default="/tmp/visual_parity")
    p.add_argument("--full-wolfe", action="store_true",
                   help="use the full strong-Wolfe line search instead of "
                        "the exact reference semantics (max_ls=0) the "
                        "goldens were produced with")
    p.add_argument("--compute-dtype", choices=["float32", "bfloat16"],
                   default="float32")
    p.add_argument("--data-dir", default=REF_DATA)
    p.add_argument("--golden-dir", default=REF_IMG)
    args = p.parse_args(argv)

    params = load_vgg19_params(args.weights)
    # refuse to score seeded weights against pretrained-weight goldens
    from artstyletransfer_tpu.models.weights import init_vgg19_params

    if np.allclose(params["conv1_1"]["w"],
                   init_vgg19_params(seed=0)["conv1_1"]["w"]):
        print("ERROR: no real weights found (loader fell back to the "
              "seeded init); set ASTT_VGG19_WEIGHTS or pass --weights",
              file=sys.stderr)
        return 2

    os.makedirs(args.out, exist_ok=True)
    report = []
    for pair in args.pairs:
        c_name, s_name = PAIRS[pair]
        content = load_image(os.path.join(args.data_dir, "content-images",
                                          c_name))
        style = load_image(os.path.join(args.data_dir, "style-images",
                                        s_name))
        for level in args.levels:
            golden_path = os.path.join(args.golden_dir,
                                       f"{pair}_lvl{level}.jpg")
            if not os.path.exists(golden_path):
                print(f"skip {pair} lvl{level}: no golden at {golden_path}",
                      file=sys.stderr)
                continue
            cfg = dataclasses.replace(
                Config(),  # reference defaults (lbfgs, content+noise, ...)
                levels_num=level, iters_num=args.iters,
                compute_dtype=args.compute_dtype,
                lbfgs_max_ls_steps=(25 if args.full_wolfe else 0),
                stream_every=min(50, args.iters))
            t0 = time.time()
            job = TransferJob(content, style, cfg, params=params)
            img = None
            for _done, img, _loss in job.run(yield_images=False):
                pass
            dt = time.time() - t0
            img = np.clip(img, 0.0, 1.0)

            golden = load_image(golden_path)
            ours = img
            if ours.shape != golden.shape:
                ours = bicubic_resize_np(ours, golden.shape[0],
                                         golden.shape[1])
                ours = np.clip(ours, 0.0, 1.0)
            s = ssim(ours, golden)
            pn = psnr(ours, golden)
            out_path = os.path.join(args.out, f"{pair}_lvl{level}_ours.jpg")
            save_image(img, out_path)
            save_image(golden, os.path.join(
                args.out, f"{pair}_lvl{level}_golden.jpg"))
            row = {"pair": pair, "level": level, "ssim": round(s, 4),
                   "psnr_db": round(pn, 2), "seconds": round(dt, 1),
                   "ours": out_path, "golden": golden_path}
            report.append(row)
            print(json.dumps(row), flush=True)

    report_path = os.path.join(args.out, "report.json")
    with open(report_path, "w") as f:
        json.dump(report, f, indent=1)
    print(f"report -> {report_path}", file=sys.stderr)
    if report:
        worst = min(r["ssim"] for r in report)
        print(f"worst SSIM {worst:.3f} "
              f"({'visual identity matches' if worst >= 0.4 else 'check the figures side by side'} "
              "— see module docstring for how to read chaotic-trajectory "
              "scores)", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
