"""AOT per-device memory proof for 'space' sharding at production shapes.

SURVEY §5 / VERDICT r3 #3: the 'space' mesh axis exists so a single huge
job (2K output, 4 pyramid levels, L-BFGS history) can spread across
several chips' HBM. This CLI proves that property without multi-chip
hardware via parallel/memory.py: it AOT-compiles the real batched chunk
step on a virtual 8-device CPU mesh twice — space axis replicated and
sharded — using ShapeDtypeStruct inputs only (nothing is materialized or
executed at 2K), and compares XLA's per-device memory analysis.
Done-criterion: argument + temp bytes per device scale ~1/space.

Usage:
  python scripts/space_memory.py                      # 4level2k Adam
  python scripts/space_memory.py --config lbfgs100    # 4level2k L-BFGS h=100
  python scripts/space_memory.py --space 4 --jobs 2   # mesh geometry

Prints one JSON line per compile plus a summary with the sharded/replicated
per-device ratio. Measured results live in PARITY.md.
"""

import argparse
import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    # the virtual device count must cover the REQUESTED mesh geometry
    # (jobs x space), and it must be pinned before jax imports — peek at
    # the mesh args pre-argparse
    _n = 1
    for _name in ("--jobs", "--space"):
        # accept both argparse spellings: "--jobs 4" and "--jobs=4"
        _val = None
        for _i, _arg in enumerate(sys.argv):
            if _arg == _name and _i + 1 < len(sys.argv):
                _val = sys.argv[_i + 1]
            elif _arg.startswith(_name + "="):
                _val = _arg.split("=", 1)[1]
        try:
            _n *= max(1, int(_val))
        except (TypeError, ValueError):
            _n *= 8 if _name == "--space" else 1  # the argparse defaults
    os.environ["XLA_FLAGS"] = (
        _flags + f" --xla_force_host_platform_device_count={max(_n, 8)}"
    ).strip()
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from artstyletransfer_tpu.config import Config  # noqa: E402
from artstyletransfer_tpu.engine.pyramid import level_shape  # noqa: E402
from artstyletransfer_tpu.parallel.memory import aot_memory_stats  # noqa: E402
from artstyletransfer_tpu.parallel.mesh import jobs_space_mesh  # noqa: E402

CONFIGS = {
    # the reference's "maximum resolution" setting (reference config.py:12)
    "4level2k": Config(levels_num=4, optimizer="adam", iters_num=500),
    # its default optimizer at torch-default history (reference config.py:9;
    # torch history_size=100) — the combination VERDICT r3 flagged as not
    # runnable on one 16 GB chip (~15 GB of s/y history alone)
    "lbfgs100": Config(levels_num=4, optimizer="lbfgs", lbfgs_history=100,
                       lbfgs_max_ls_steps=0, iters_num=500),
    # small variant for quick script validation (fast CPU compile)
    "test2level": Config(levels_num=2, optimizer="adam", iters_num=10),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="4level2k", choices=sorted(CONFIGS))
    ap.add_argument("--jobs", type=int, default=1)
    ap.add_argument("--space", type=int, default=8)
    ap.add_argument("--aspect", type=float, default=1.5,
                    help="content aspect ratio (w/h)")
    args = ap.parse_args()

    cfg = CONFIGS[args.config]
    content_hw = (1024, int(1024 * args.aspect))
    mesh = jobs_space_mesh(args.jobs, args.space)

    top = level_shape(content_hw[0], content_hw[1], cfg.levels_num - 1,
                      cfg.base_diameter)
    print(f"config={args.config} top-level={top} batch={args.jobs} "
          f"mesh=(jobs={args.jobs}, space={args.space})", file=sys.stderr)

    out = {}
    for name, shard in (("replicated", False), ("sharded", True)):
        print(f"compiling {name} ...", file=sys.stderr)
        out[name] = aot_memory_stats(cfg, content_hw, mesh, args.jobs, shard)
        print(json.dumps({name: out[name]}))
    ratio = {k: (out["sharded"][k] / out["replicated"][k]
                 if out["replicated"][k] else None)
             for k in out["replicated"]}
    summary = {"config": args.config, "top_level": list(top),
               "space": args.space, "ratio": ratio}
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
