"""Headless batch frontend: run an arbitrary job queue through the
sharded, policy-routed TPU queue.

The reference's only batch surface is the web lab's hard-coded 20-pair
demo run through the sequential semaphore executor (reference
lab.py:79-100, task_executor.py). This frontend exposes the real serving
path — `parallel.run_job_queue`: shape bucketing, the measured
per-optimizer batching policy ('auto' vmaps Adam / reference-semantics
L-BFGS queues, runs full-Wolfe L-BFGS sequentially), HBM-aware sub-batch
splitting, and failure isolation — as a one-command batch runner:

  astt-queue --manifest jobs.jsonl --output-dir out/
  astt-queue --pair bird.jpg vg.jpg --pair bird.jpg cubism.jpg \
             --output-dir out/ --preset standard

Manifest: JSONL, one job per line:
  {"id": "bird_vg", "content": "path/bird.jpg", "style": "path/vg.jpg"}
("id" optional — derived from the file stems and uniquified.)

Every engine/config flag of `astt` is accepted (same parser block).
Failed jobs are isolated per bucket, reported on stderr, and reflected
in the exit code; completed images land in --output-dir/<id>.jpg.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

from ..utils.image import load_image, save_image
from .cli import add_engine_flags, config_from_args


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="astt-queue",
        description="Batch style transfer: a job queue through the "
                    "policy-routed, shape-bucketed TPU serving path")
    p.add_argument("--manifest", default=None,
                   help="JSONL file: {'id'?, 'content', 'style'} per line")
    p.add_argument("--pair", nargs=2, action="append", default=[],
                   metavar=("CONTENT", "STYLE"),
                   help="content/style image pair (repeatable)")
    p.add_argument("--output-dir", required=True,
                   help="directory for <id>.jpg results")
    add_engine_flags(p)
    p.add_argument("--batch-policy", default="auto",
                   choices=["auto", "batched", "sequential"],
                   help="'auto' (default) applies the measured "
                        "per-optimizer routing; see parallel/batch.py")
    p.add_argument("--max-batch", type=int, default=None,
                   help="cap jobs per compiled batch (default: HBM-aware)")
    p.add_argument("--mesh", default="auto", choices=["auto", "none"],
                   help="'auto' (default) batches jobs across every "
                        "visible chip (multislice-aware; no-op on one "
                        "chip); 'none' stays single-device. The "
                        "ASTT_SERVING_MESH env var can force 'none'.")
    p.add_argument("--space", type=int, default=1, metavar="N",
                   help="shard each job's pixels over N chips within a "
                        "slice (HBM relief for 2K/4-level jobs); needs "
                        "--mesh auto and N | chips-per-slice")
    p.add_argument("--canonicalize-styles", action="store_true",
                   help="square styles to the base diameter so mixed "
                        "aspect ratios share one compiled batch")
    p.add_argument("--canonicalize-contents", action="store_true",
                   help="crop contents to canonical aspect buckets "
                        "(bounds the number of compiled shapes)")
    p.add_argument("--weights", default=None,
                   help="VGG19 weights path (.npz/.pth/.h5); default: "
                        "env ASTT_VGG19_WEIGHTS, cache, or seeded init")
    p.add_argument("--checkpoint-dir", default=None, metavar="DIR",
                   help="crash recovery: checkpoint each compiled group's "
                        "batch state here every --checkpoint-every steps")
    p.add_argument("--checkpoint-every", type=int, default=None,
                   help="steps between checkpoints (default: stream_every)")
    p.add_argument("--resume", action="store_true",
                   help="resume the same queue from --checkpoint-dir")
    p.add_argument("--retries", type=int, default=0, metavar="N",
                   help="re-run a failed group up to N extra times "
                        "(transient TPU-worker crashes recover in ~20s; "
                        "with --checkpoint-dir a retry resumes from the "
                        "last saved chunk)")
    p.add_argument("--metrics", default=None, metavar="PATH",
                   help="append per-chunk JSONL metrics to PATH")
    p.add_argument("--quiet", action="store_true")
    return p


def load_jobs(args: argparse.Namespace):
    """Returns (jobs, load_failures): (task_id, content, style) triples from
    --manifest + --pair, plus {task_id: exception} for jobs whose images
    failed to load.

    A missing or corrupt image file fails ONLY that job (it lands in the
    failures dict → stderr + exit code, like a failed bucket) instead of
    killing the whole queue before run_job_queue's per-bucket isolation can
    help. Malformed manifest STRUCTURE (invalid JSON, missing keys) still
    raises — that is a broken manifest, not a bad job. The reference
    raises on the first missing file (reference lab.py:117-118)."""
    specs = []
    if args.manifest:
        with open(args.manifest) as f:
            for line_no, line in enumerate(f, 1):
                line = line.strip()
                if not line:
                    continue
                try:
                    row = json.loads(line)
                except json.JSONDecodeError as e:
                    raise ValueError(
                        f"{args.manifest}:{line_no}: invalid JSON: {e}"
                    ) from e
                if "content" not in row or "style" not in row:
                    raise ValueError(
                        f"{args.manifest}:{line_no}: need 'content' and "
                        f"'style' keys, got {sorted(row)}")
                specs.append((row.get("id"), row["content"], row["style"]))
    for content, style in args.pair:
        specs.append((None, content, style))
    if not specs:
        raise ValueError("no jobs: pass --manifest and/or --pair")

    jobs, load_failures, used = [], {}, set()
    for tid, c_path, s_path in specs:
        if tid is None:
            stem = lambda p: os.path.splitext(os.path.basename(p))[0]
            tid = f"{stem(c_path)}__{stem(s_path)}"
        base, k = tid, 1
        while tid in used:
            k += 1
            tid = f"{base}_{k}"
        used.add(tid)
        try:
            jobs.append((tid, load_image(c_path), load_image(s_path)))
        except Exception as e:  # noqa: BLE001 — per-job isolation
            load_failures[tid] = e
    return jobs, load_failures


def main(argv=None) -> int:
    from ..utils.cache import enable_compilation_cache

    enable_compilation_cache()
    parser = build_parser()
    args = parser.parse_args(argv)
    if args.resume and not args.checkpoint_dir:
        parser.error("--resume requires --checkpoint-dir")
    cfg = config_from_args(args)

    jobs, load_failures = load_jobs(args)
    os.makedirs(args.output_dir, exist_ok=True)

    params = None
    if args.weights:
        from ..models.weights import load_vgg19_params
        params = load_vgg19_params(args.weights)

    from ..parallel import run_job_queue
    from ..utils.metrics import MetricsLogger

    mesh = None
    if args.mesh == "auto":
        from ..parallel import default_serving_mesh

        mesh = default_serving_mesh(args.space)
    elif args.space > 1:
        parser.error("--space > 1 requires --mesh auto")

    if not args.quiet:
        mesh_desc = (f"mesh={dict(mesh.shape)}" if mesh is not None
                     else "single-device")
        print(f"queue: {len(jobs)} jobs, policy={args.batch_policy}, "
              f"optimizer={cfg.optimizer}, levels={cfg.levels_num}, "
              f"iters={cfg.iters_num}, {mesh_desc}")

    t0 = time.time()
    with MetricsLogger(args.metrics) as metrics:
        def report(tid, pct, img, loss):
            metrics.log("progress", task=tid, percent=pct, loss=loss)
            if not args.quiet:
                print(f"[{tid}] {pct:5.1f}% loss {loss:.3e}")

        results, failures = run_job_queue(
            jobs, cfg, params=params, progress=report,
            mesh=mesh, shard_space=args.space > 1 and mesh is not None,
            batch_policy=args.batch_policy, max_batch=args.max_batch,
            canonicalize_styles=args.canonicalize_styles,
            canonicalize_contents=args.canonicalize_contents,
            stream_images=False,  # final images only — no per-chunk D2H
            checkpoint_dir=args.checkpoint_dir,
            checkpoint_every=args.checkpoint_every,
            resume=args.resume, retries=args.retries)
        failures = {**load_failures, **failures}

        for tid, img in results.items():
            save_image(np.clip(img, 0, 1),
                       os.path.join(args.output_dir, f"{tid}.jpg"))
        for tid, exc in failures.items():
            print(f"FAILED {tid}: {type(exc).__name__}: {exc}",
                  file=sys.stderr)
            metrics.log("task_failed", task=tid)

    if not args.quiet:
        print(f"queue: {len(results)} done, {len(failures)} failed "
              f"in {time.time() - t0:.1f}s -> {args.output_dir}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
