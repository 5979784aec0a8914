"""4level2k L-BFGS history ladder with bf16-stored pairs (real chip).

The reference's max-quality combination is its default L-BFGS optimizer at
levels_num=4 (reference config.py:9,12) and torch's history_size=100
default; f32 pair buffers need ~15.1 GB at 2K — more than a v5e-1's
16 GB — which is why the r3/r4 rows ran history=10. bf16 storage
(config.lbfgs_state_dtype, quality closed by scripts/exp_statedtype.py)
halves that to ~7.6 GB. This sweep walks the ladder h = 10/25/50/100 at
bf16 state to map the single-chip throughput/capacity curve of the
reference's own max-quality setting.

Protocol: bench.py's timed-window chunk protocol at _chunk=10 (a 50-step
2K chunk is ~100 s of device time, which crashes the axon tunnel worker —
CLAUDE.md), 50 timed steps per point.

Usage: python scripts/exp_2kladder.py [steps=50]
Output: JSON list on stdout, human log on stderr.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from artstyletransfer_tpu.config import Config
from artstyletransfer_tpu.utils.image import load_image

CONTENT = "/root/reference/data/content-images/bird.jpg"
STYLE = "/root/reference/data/style-images/cubism2.jpg"


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax

    from bench import measure_ours

    log(f"platform: {jax.devices()[0].platform} "
        f"({jax.devices()[0].device_kind})")
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    content, style = load_image(CONTENT), load_image(STYLE)
    rows = []
    for h in (10, 25, 50, 100):
        cfg = Config(levels_num=4, base_diameter=256, optimizer="lbfgs",
                     lbfgs_history=h, lbfgs_t_init="unit",
                     lbfgs_grams="incremental",
                     lbfgs_state_dtype="bfloat16",
                     compute_dtype="bfloat16", stream_every=10,
                     init_method="content+noise")
        log(f"== h={h} (bf16 state, ~{2 * h * 9.5e6 * 2 / 1e9:.1f} GB "
            f"pairs) ==")
        t0 = time.time()
        try:
            sps = measure_ours(content, style, cfg, n_steps=steps, chunk=10)
            rows.append({"history": h, "steps_per_s": round(sps, 3),
                         "wall_s": round(time.time() - t0, 1)})
        except Exception as e:  # noqa: BLE001 — map the capacity cliff
            rows.append({"history": h, "error": f"{type(e).__name__}: {e}"})
            log(f"   h={h} FAILED: {e}")
        log(f"   {rows[-1]}")
    print(json.dumps(rows, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
