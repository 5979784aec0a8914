"""Regenerate the golden test fixtures UNDER THE EXACT TEST ENV
(CPU + 8 virtual devices, like tests/conftest.py). Per CLAUDE.md, only run
this for intentional numerics changes and say so in the commit message.

Usage: python scripts/gen_goldens.py [--only SUBSTRING]
  --only filters by spec-name substring, e.g. --only adam, --only lbfgs,
  --only 1step. Exits with an error if nothing matches.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from artstyletransfer_tpu.config import Config  # noqa: E402
from artstyletransfer_tpu.engine.transfer import TransferJob  # noqa: E402
from artstyletransfer_tpu.models.weights import init_vgg19_params  # noqa: E402

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "..", "tests", "goldens")


def main():
    only = None
    if "--only" in sys.argv:
        only = sys.argv[sys.argv.index("--only") + 1]
    rng = np.random.default_rng(11)
    content = rng.random((36, 52, 3)).astype(np.float32)
    style = rng.random((28, 28, 3)).astype(np.float32)
    params = init_vgg19_params(seed=0)

    # (name, iters, config overrides). The L-BFGS goldens are the torch-free
    # safety net for the production-default optimizer (VERDICT r3 weak #5):
    # - lbfgsref_1step: one REFERENCE-SEMANTICS step (max_ls=0 — direction,
    #   single trial kept-if-better, history update) at bit level;
    # - lbfgs_wrapped: 5 full-Wolfe steps with history=2, so the circular
    #   s/y buffers WRAP and the bracket+zoom search and the matrix
    #   two-loop direction all execute on wrapped state.
    specs = (
        ("transfer_2lvl_adam", 10, {}),
        ("transfer_2lvl_adam_1step", 1, {}),
        ("transfer_2lvl_lbfgsref_1step", 1,
         dict(optimizer="lbfgs", lbfgs_max_ls_steps=0, lbfgs_history=10)),
        ("transfer_2lvl_lbfgs_wrapped", 5,
         dict(optimizer="lbfgs", lbfgs_history=2)),
    )
    wrote = 0
    for name, iters, overrides in specs:
        if only and only not in name:
            continue
        # NOTE: the 10-step golden's images were fixed at first generation;
        # reuse them from the existing file so the fixture content is stable
        path = os.path.join(GOLDEN_DIR, f"{name}.npz")
        base = os.path.join(GOLDEN_DIR, "transfer_2lvl_adam.npz")
        if os.path.exists(base):
            data = np.load(base)
            content = np.asarray(data["content"])
            style = np.asarray(data["style"])
        cfg = Config(levels_num=2, iters_num=iters, base_diameter=16,
                     stream_every=iters, seed=7,
                     **{"optimizer": "adam", **overrides})
        job = TransferJob(content, style, cfg, params=params)
        done, img, loss = list(job.run())[-1]
        assert done == iters
        np.savez(path, content=content, style=style, image=img,
                 loss=np.float32(loss))
        print(f"wrote {path} (loss {loss:.6e})")
        wrote += 1
    if only and not wrote:
        sys.exit(f"--only {only!r} matched no golden spec "
                 f"(names: {', '.join(n for n, _i, _o in specs)})")


if __name__ == "__main__":
    main()
