"""Command-line frontend: headless style-transfer runs.

Supersedes the reference's start_nn.py smoke runner (reference
start_nn.py:11-38, a hard-coded 1-level/10-iteration bird+cubism run) with a
real CLI. The reference has no argument parsing at all ("All the
configuration is done in the code itself", reference README.md:183); every
Config field is exposed here as a flag, plus the named presets of
reference lab.py:17-69.

Examples:
  astt --content bird.jpg --style cubism2.jpg --output out.jpg
  astt --preset smoke --content bird.jpg --style cubism2.jpg --output out.jpg
  python -m artstyletransfer_tpu.frontends.cli --levels 3 --iters 1000 ...
"""

from __future__ import annotations

import argparse
import asyncio
import dataclasses
import sys
import time
import uuid

import numpy as np

from ..config import PRESETS, Config
from ..engine.transfer import ContentStylePair
from ..runtime.executor import Executor
from ..utils.image import load_image, save_image


def add_engine_flags(p: argparse.ArgumentParser) -> None:
    """Engine/Config flags shared by every frontend parser (astt,
    astt-queue). config_from_args consumes the resulting namespace."""
    p.add_argument("--preset", choices=sorted(PRESETS), default=None,
                   help="named config preset (overridden by explicit flags)")
    d = Config()
    p.add_argument("--optimizer", choices=["lbfgs", "adam"], default=None)
    p.add_argument("--init-method",
                   choices=["random", "content+noise", "style"], default=None)
    p.add_argument("--use-relu", action=argparse.BooleanOptionalAction,
                   default=None,
                   help="post-ReLU feature taps (reference default); "
                        "--no-use-relu selects the pre-ReLU conv taps 'as in "
                        "the original paper' (reference neural_nets.py:10)")
    p.add_argument("--levels", type=int, default=None,
                   help=f"pyramid levels (default {d.levels_num})")
    p.add_argument("--iters", type=int, default=None,
                   help=f"iterations (default {d.iters_num})")
    p.add_argument("--content-weight", type=float, default=None)
    p.add_argument("--style-weight", type=float, default=None)
    p.add_argument("--tv-weight", type=float, default=None)
    p.add_argument("--noise-factor", type=float, default=None)
    p.add_argument("--base-diameter", type=int, default=None,
                   help="shortest side at pyramid level 0 (default 256)")
    p.add_argument("--stream-every", type=int, default=None,
                   help="steps per progress update (default 10)")
    p.add_argument("--compute-dtype", choices=["float32", "bfloat16"],
                   default=None,
                   help="conv compute dtype; default: production precision "
                        "for the platform (bfloat16 on TPU, float32 "
                        "elsewhere — see config.production_config)")
    p.add_argument("--conv-precision", choices=["default", "high", "highest"],
                   default=None, help="MXU pass count for float32 convs")
    p.add_argument("--pool-impl",
                   choices=["reduce_window", "slices", "reshape"],
                   default=None,
                   help="VGG maxpool lowering (reduce_window = fastest "
                        "single-chip; reshape = partitions under space "
                        "sharding; slices = legacy SPMD variant)")
    p.add_argument("--fused-style-bwd",
                   action=argparse.BooleanOptionalAction, default=None,
                   help="style loss with the 1x1-conv custom-VJP backward "
                        "(same math, ~23%% faster step on TPU; default on)")
    p.add_argument("--use-pallas", action=argparse.BooleanOptionalAction,
                   default=None,
                   help="route Gram/TV through the Pallas kernels "
                        "(measured slower end-to-end; default off)")
    p.add_argument("--remat-levels", action=argparse.BooleanOptionalAction,
                   default=None,
                   help="jax.checkpoint each pyramid level's VGG pass "
                        "(for 4-level / 2K outputs)")
    p.add_argument("--nan-checks", action=argparse.BooleanOptionalAction,
                   default=None,
                   help="raise on non-finite loss at chunk boundaries "
                        "(default on)")
    p.add_argument("--pipeline-streaming",
                   action=argparse.BooleanOptionalAction, default=None,
                   help="overlap each chunk's progress-image fetch with "
                        "the next chunk's device compute (default on; "
                        "numerically identical)")
    p.add_argument("--stop-tol", type=float, default=None,
                   help="convergence early-stop: end the run once the "
                        "relative loss change over a chunk is <= this "
                        "(e.g. 1e-4; default 0 = run all iterations like "
                        "the reference). A converged bf16 L-BFGS run "
                        "otherwise burns ~9 line-search evals/step making "
                        "no progress")
    p.add_argument("--stop-shrink", action=argparse.BooleanOptionalAction,
                   default=None,
                   help="with --stop-tol on batched runs: a converged job "
                        "leaves the batch at the chunk boundary and the "
                        "rest re-form at the next power-of-two size "
                        "(default on; group-stop alone waits for the "
                        "slowest job)")
    p.add_argument("--lbfgs-history", type=int, default=None,
                   help=f"L-BFGS memory pairs (default {d.lbfgs_history})")
    p.add_argument("--lbfgs-max-ls-steps", type=int, default=None,
                   help="strong-Wolfe line-search eval budget per step "
                        f"(default {d.lbfgs_max_ls_steps})")
    p.add_argument("--lbfgs-direction", choices=["matrix", "loop"],
                   default=None,
                   help="two-loop recursion lowering (matrix = MXU-batched "
                        "Gram contractions, ~6x faster at history=100; "
                        "loop = textbook form; identical math)")
    p.add_argument("--lbfgs-t-init", choices=["lr", "unit"], default=None,
                   help="line search's first trial step: lr = torch parity "
                        "(search opens at the decayed lr); unit = "
                        "quasi-Newton t=1 once history exists (fewer "
                        "line-search evals, same strong-Wolfe guarantees, "
                        "not torch's trajectory)")
    p.add_argument("--lbfgs-grams", choices=["recompute", "incremental"],
                   default=None,
                   help="matrix direction's Gram matrices: recompute every "
                        "step (bitwise r3 behavior) or carry them in the "
                        "optimizer state and refresh one row+column per "
                        "step (same matrices up to dot-order ulps; wins "
                        "at large history)")
    p.add_argument("--lbfgs-state-dtype", choices=["float32", "bfloat16"],
                   default=None,
                   help="storage dtype of the (m, n) L-BFGS history "
                        "buffers: float32 (default) or bfloat16 (pairs "
                        "quantized at store time, f32 accumulation — "
                        "halves the history's HBM footprint and streamed "
                        "bandwidth; enables history=100 at sizes where "
                        "f32 history exceeds a chip's HBM)")
    p.add_argument("--lr-start", type=float, default=None,
                   help=f"initial learning rate (default {d.lr_start})")
    p.add_argument("--lr-decay", type=float, default=None,
                   help=f"per-step lr decay factor (default {d.lr_decay})")
    p.add_argument("--lr-decay-per-eval",
                   action=argparse.BooleanOptionalAction, default=None,
                   help="decay lr per closure evaluation like the reference "
                        "(default on); --no-lr-decay-per-eval decays once "
                        "per step")
    p.add_argument("--seed", type=int, default=None)
    # default=None (not store_true's False) so an unpassed flag is
    # recognized as "not explicit" and cannot clobber a preset's ablation
    # setting (the config_from_args `val is not None` convention)
    p.add_argument("--demo-normal-noise", action="store_true", default=None,
                   help="ablation: normal noise instead of style-pixel noise")
    p.add_argument("--demo-no-gaussian-mask", action="store_true",
                   default=None,
                   help="ablation: skip the Gaussian noise envelopes")
    p.add_argument("--demo-ignore-gradient-map", action="store_true",
                   default=None,
                   help="ablation: constant noise weight (no Sobel map)")
    p.add_argument("--dump-masks", default=None, metavar="DIR",
                   help="dump noise/gradient mask JPEGs for inspection")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="astt",
        description="TPU-native neural style transfer (pyramid Gatys + "
                    "structured noise init)")
    p.add_argument("--content", required=True, help="content image path")
    p.add_argument("--style", required=True, help="style image path")
    p.add_argument("--output", required=True, help="output JPEG path")
    add_engine_flags(p)
    p.add_argument("--checkpoint", default=None,
                   help="checkpoint file; combine with --checkpoint-every "
                        "and --resume")
    p.add_argument("--checkpoint-every", type=int, default=None)
    p.add_argument("--resume", action="store_true",
                   help="resume from --checkpoint if it exists")
    p.add_argument("--weights", default=None,
                   help="VGG19 weights path (.npz/.pth/.h5); default: "
                        "env ASTT_VGG19_WEIGHTS, cache, or seeded init")
    p.add_argument("--save-progress", action="store_true",
                   help="also save intermediate images next to the output")
    p.add_argument("--verbose-losses", action="store_true",
                   help="print per-level loss components at each progress "
                        "update (reference-style loss table)")
    p.add_argument("--metrics", default=None, metavar="PATH",
                   help="append per-chunk JSONL metrics (step, loss, "
                        "steps/s) to PATH — the structured replacement for "
                        "the reference's per-iteration prints")
    p.add_argument("--profile-trace", default=None, metavar="DIR",
                   help="write a jax.profiler (TensorBoard XPlane) trace "
                        "of the optimization to DIR")
    p.add_argument("--quiet", action="store_true")
    return p


def config_from_args(args: argparse.Namespace) -> Config:
    cfg = PRESETS[args.preset] if args.preset else Config()
    overrides = {}
    mapping = {
        "optimizer": "optimizer", "init_method": "init_method",
        "use_relu": "use_relu",
        "levels": "levels_num", "iters": "iters_num",
        "content_weight": "content_weight", "style_weight": "style_weight",
        "tv_weight": "tv_weight", "noise_factor": "noise_factor",
        "base_diameter": "base_diameter", "stream_every": "stream_every",
        "compute_dtype": "compute_dtype", "conv_precision": "conv_precision",
        "pool_impl": "pool_impl", "fused_style_bwd": "fused_style_bwd",
        "use_pallas": "use_pallas", "remat_levels": "remat_levels",
        "nan_checks": "nan_checks",
        "pipeline_streaming": "pipeline_streaming",
        "stop_tol": "stop_tol",
        "stop_shrink": "stop_shrink",
        "lbfgs_history": "lbfgs_history",
        "lbfgs_max_ls_steps": "lbfgs_max_ls_steps",
        "lbfgs_direction": "lbfgs_direction",
        "lbfgs_t_init": "lbfgs_t_init",
        "lbfgs_grams": "lbfgs_grams",
        "lbfgs_state_dtype": "lbfgs_state_dtype",
        "lr_start": "lr_start", "lr_decay": "lr_decay",
        "lr_decay_per_eval": "lr_decay_per_eval",
        "seed": "seed", "demo_normal_noise": "demo_normal_noise",
        "demo_no_gaussian_mask": "demo_no_gaussian_mask",
        "demo_ignore_gradient_map": "demo_ignore_gradient_map",
        "dump_masks": "dump_masks_dir",
    }
    for arg_name, field in mapping.items():
        val = getattr(args, arg_name)
        if val is not None:
            overrides[field] = val
    cfg = dataclasses.replace(cfg, **overrides)
    # Resolve the platform's production settings (bfloat16 + the unit
    # line-search opening on TPU; see config.production_config for the
    # studies), then re-apply any production-managed field the user set
    # explicitly — an explicit --compute-dtype float32 / --lbfgs-t-init lr
    # opts out even on TPU.
    from ..config import production_config

    explicit = {f: overrides[f]
                for f in ("compute_dtype", "lbfgs_t_init", "lbfgs_grams",
                          "lbfgs_state_dtype")
                if f in overrides}
    cfg = dataclasses.replace(production_config(cfg), **explicit)
    return cfg


def run_job_checkpointed(args: argparse.Namespace, cfg: Config) -> np.ndarray:
    """Direct TransferJob path used when checkpointing is requested."""
    from ..engine.transfer import TransferJob

    params = None
    if args.weights:
        from ..models.weights import load_vgg19_params
        params = load_vgg19_params(args.weights)
    job = TransferJob(load_image(args.content), load_image(args.style),
                      cfg, params=params)
    img = None
    from ..utils.metrics import MetricsLogger, Throughput

    with MetricsLogger(args.metrics) as metrics:
        tp = Throughput()
        tp.tick(0)  # baseline: the 0 -> first-chunk interval carries the
        # compile and is the one Throughput skips (same as bench.py)
        for done, img, loss in job.run(
                checkpoint_path=args.checkpoint,
                checkpoint_every=args.checkpoint_every or cfg.stream_every,
                resume=args.resume,
                report_level_losses=args.verbose_losses):
            sps = tp.tick(done)
            metrics.log("chunk", step=done, loss=float(loss),
                        steps_per_sec=round(sps, 4) if sps else None,
                        percent=done / cfg.iters_num * 100.0)
            if not args.quiet:
                print(f"step {done}/{cfg.iters_num} loss {loss:.4e}")
                if args.verbose_losses and job.last_level_losses:
                    for i, (lt, lc, ls, ltv) in enumerate(
                            job.last_level_losses):
                        print(f" - level {i} | level loss={lt:.3e}, "
                              f"content_loss={cfg.content_weight * lc:.3e}, "
                              f"style loss={cfg.style_weight * ls:.3e}, "
                              f"tv loss={cfg.tv_weight * ltv:.3e}")
    return img


async def run_job(args: argparse.Namespace, cfg: Config) -> np.ndarray:
    content = load_image(args.content)
    style = load_image(args.style)

    params = None
    if args.weights:
        from ..models.weights import load_vgg19_params
        params = load_vgg19_params(args.weights)

    latest = {}

    async def report(task_id, result):
        percent, img = result
        latest["img"] = img
        if not args.quiet:
            print(f"[{task_id[:8]}] {percent:5.1f}%")
        if args.save_progress and img is not None:
            save_image(np.clip(img, 0, 1),
                       f"{args.output}.{percent:05.1f}.jpg")

    from functools import partial

    from ..engine.transfer import neural_style_transfer
    from ..utils.metrics import MetricsLogger

    # config is forwarded by Executor's Task itself; only params needs
    # binding here
    engine = partial(neural_style_transfer, params=params)
    with MetricsLogger(args.metrics) as metrics:
        executor = Executor(cfg, report_progress=report, engine=engine,
                            verbose=not args.quiet,
                            metrics=metrics if args.metrics else None)
        pair = ContentStylePair((args.content, content), (args.style, style))
        await executor.add_task(str(uuid.uuid4()), pair)
        await executor.run()
    return latest.get("img")


def main(argv=None) -> int:
    from ..utils.cache import enable_compilation_cache

    enable_compilation_cache()

    args = build_parser().parse_args(argv)
    cfg = config_from_args(args)
    if not args.quiet:
        print(f"config: optimizer={cfg.optimizer} levels={cfg.levels_num} "
              f"iters={cfg.iters_num} init={cfg.init_method} "
              f"base={cfg.base_diameter}")
    from ..utils.metrics import profile_trace

    t0 = time.time()
    with profile_trace(args.profile_trace):
        if args.checkpoint or args.verbose_losses:
            img = run_job_checkpointed(args, cfg)
        else:
            img = asyncio.run(run_job(args, cfg))
    if img is None:
        print("No output produced", file=sys.stderr)
        return 1
    save_image(np.clip(img, 0, 1), args.output)
    if not args.quiet:
        print(f"Done in {time.time() - t0:.1f}s -> {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
