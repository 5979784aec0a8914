"""Ablate the DEFAULT optimizer (L-BFGS) at the headline resolution.

VERDICT r2 #2: lbfgs3level1024 measured 3.63 steps/s while the naive
bound (~2.14 evals/step x the f32 eval rate) predicts ~4.9 — this script
itemizes where the gap goes, component by component, with the same
differential-timing protocol as scripts/ablate_step.py (two trip counts,
delta cancels the ~0.5-1s remote-dispatch RPC).

Components timed at the 3level1024 shapes (top level ~1024x1536, flat
parameter vector n ~= 4.7M):

  eval        one loss+grad of the full 3-level pyramid (the line search's
              single inlined evaluation site)
  twoloop     _two_loop_direction with a full circular history (m rows)
  histupd     the history-update block of lbfgs_step, masked-full-buffer
              (production as of r2) vs row-wise select
  step_*      a full lbfgs_step (direction + strong-Wolfe + update)

Variants: history 100 (torch/reference default) vs 10, f32 vs bf16 taps,
full-Wolfe (max_ls=25) vs reference semantics (max_ls=0).

All big buffers (VGG params, targets, histories) are passed as arguments,
not closure constants, mirroring the production runners (constants change
XLA layout assignment — PARITY.md round-2 analysis).

Usage:  python scripts/exp_lbfgs1024.py [component ...]
        (default: eval twoloop histupd; 'step' variants are expensive
        remote compiles, request explicitly: step_f32h100loop
        step_f32h100mat step_f32h10 step_bf16h100 step_bf16h10 step_ref
        — all matrix direction except step_f32h100loop)
Output: per-component ms on stderr + one JSON dict on stdout.
"""

from __future__ import annotations

import json
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

sys.path.insert(0, "/root/repo")

from artstyletransfer_tpu.config import Config
from artstyletransfer_tpu.engine import lbfgs as L
from artstyletransfer_tpu.engine.pyramid import build_input_pyramids
from artstyletransfer_tpu.engine.transfer import (_compute_targets,
                                                  _make_pyramid_loss)
from artstyletransfer_tpu.models.weights import load_vgg19_params
from artstyletransfer_tpu.utils.image import load_image, prepare_img

CONTENT = "/root/reference/data/content-images/bird.jpg"
STYLE = "/root/reference/data/style-images/cubism2.jpg"

N_LO, N_HI = 5, 25


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def sync(out):
    jax.block_until_ready(out)
    leaf = jax.tree.leaves(out)[0]
    float(np.asarray(leaf).ravel()[0])


def time_loop(name, body, carry0, n_lo=None, n_hi=None):
    """body(carry) -> carry. Differential ms per iteration.

    Reads the trip-count globals at CALL time (default-arg binding would
    freeze them at def time and silently ignore a --trips override —
    the exp_gramupd.py bug class)."""
    n_lo = N_LO if n_lo is None else n_lo
    n_hi = N_HI if n_hi is None else n_hi

    def run(c, n):
        return lax.fori_loop(0, n, lambda i, cc: body(cc), c)

    fn = jax.jit(run, static_argnums=1)

    def run_sync(n):
        # exactly one live output at a time: a kept previous output stacks
        # another full (m, n) state copy next to carry0 and the execution
        # working set, which OOMs the 16 GB chip at m=100/n=4.7M
        out = fn(carry0, n)
        sync(out)
        return out

    t0 = time.time()
    out = run_sync(n_lo)
    log(f"  {name}: compiled+warm lo in {time.time() - t0:.0f}s")
    del out
    t0 = time.time()
    out = run_sync(n_lo)
    t_lo = time.time() - t0
    del out
    t0 = time.time()
    out = run_sync(n_hi)
    log(f"  {name}: compiled+warm hi in {time.time() - t0:.0f}s")
    del out
    t0 = time.time()
    out_hi = run_sync(n_hi)
    t_hi = time.time() - t0
    ms = (t_hi - t_lo) / (n_hi - n_lo) * 1e3
    log(f"  {name}: {ms:.2f} ms/iter  (lo {t_lo:.2f}s, hi {t_hi:.2f}s)")
    return ms, out_hi


def setup(compute_dtype="float32", history=100, max_ls=25):
    cfg = Config(levels_num=3, base_diameter=256, optimizer="lbfgs",
                 compute_dtype=compute_dtype, lbfgs_history=history,
                 lbfgs_max_ls_steps=max_ls)
    content, style = load_image(CONTENT), load_image(STYLE)
    c_lvls, s_lvls = build_input_pyramids(content, style, cfg.levels_num,
                                          cfg.base_diameter)
    params = load_vgg19_params(seed=cfg.seed)
    loss_fn = _make_pyramid_loss(
        [tuple(prepare_img(c).shape) for c in c_lvls], cfg)

    c_pre = [jnp.asarray(prepare_img(c)) for c in c_lvls]
    s_pre = [jnp.asarray(prepare_img(s)) for s in s_lvls]
    targets = jax.jit(partial(_compute_targets, cfg=cfg))(
        params, c_pre, s_pre)

    def scalar_loss(params, targets, x):
        total, _ = loss_fn(params, targets, x)
        return total

    loss_grad = jax.value_and_grad(scalar_loss, argnums=2)
    x0 = jnp.asarray(prepare_img(c_lvls[0]).ravel())
    return cfg, loss_grad, params, targets, x0


def full_history(x0, history, key=0):
    """Realistic fully-populated history buffers (count=m)."""
    n = x0.shape[0]
    rng = jax.random.PRNGKey(key)
    ks, ky, kg = jax.random.split(rng, 3)
    s_hist = jax.random.normal(ks, (history, n), x0.dtype) * 1e-3
    y_hist = jax.random.normal(ky, (history, n), x0.dtype) * 1e-3
    rho = 1.0 / jnp.maximum(jnp.einsum("mn,mn->m", s_hist, y_hist), 1e-8)
    g = jax.random.normal(kg, (n,), x0.dtype)
    return s_hist, y_hist, rho, g


def main(argv):
    global N_LO, N_HI
    argv = list(argv)
    if "--trips" in argv:
        i = argv.index("--trips")
        N_LO, N_HI = int(argv[i + 1]), int(argv[i + 2])
        del argv[i:i + 3]
    want = set(argv) or {"eval", "twoloop", "histupd"}
    results = {}
    dev = jax.devices()[0]
    log(f"platform {dev.platform} ({dev.device_kind})")

    cfg, loss_grad, params, targets, x0 = setup()
    n = x0.shape[0]
    log(f"flat parameter vector n={n} ({n * 4 / 1e6:.0f} MB f32); "
        f"history buffers at m=100: {2 * 100 * n * 4 / 1e9:.1f} GB")

    if "eval" in want:
        log("eval: one full 3-level pyramid loss+grad (f32)")

        def body(carry):
            params, targets, x = carry
            f, g = loss_grad(params, targets, x)
            return (params, targets, x - 1e-7 * g)  # consume g: no CSE

        ms, _ = time_loop("eval_f32", body, (params, targets, x0))
        results["eval_f32_ms"] = ms

    if "twoloop" in want:
        for m in (100, 10):
            for impl in ("loop", "matrix"):
                s_hist, y_hist, rho, g = full_history(x0, m)

                def body(carry, m=m, impl=impl):
                    g, s_hist, y_hist, rho = carry
                    st = L.LbfgsState(
                        s_hist=s_hist, y_hist=y_hist, rho=rho,
                        count=jnp.int32(m), f=jnp.float32(1.0), g=g,
                        n_evals=jnp.int32(m), n_iter=jnp.int32(m))
                    d = L._two_loop_direction(g, st, impl=impl)
                    # NOTE: s/y_hist are loop-invariant here, so XLA hoists
                    # the matrix form's Gram contractions out of the timing
                    # loop — the matrix row therefore measures only the
                    # per-g work (GEMVs + recurrences + recombination).
                    # Perturbing the buffers to defeat hoisting doubles the
                    # live history copies and OOMs at m=100; the step_*
                    # variants are the authoritative comparison (real steps
                    # update the history, nothing is hoistable).
                    return (g + 1e-7 * d, s_hist, y_hist, rho)

                # matrix per-iter cost can sit below the tunnel's ~±0.3s
                # dispatch noise at 25 trips; use longer loops for it
                n_hi = 125 if impl == "matrix" else N_HI
                ms, _ = time_loop(f"twoloop_{impl}_h{m}", body,
                                  (g, s_hist, y_hist, rho), n_hi=n_hi)
                results[f"twoloop_{impl}_h{m}_ms"] = ms
                del s_hist, y_hist, rho, g

    if "histupd" in want:
        m = 100
        s_hist, y_hist, rho, g = full_history(x0, m)

        def upd_where(carry):
            x, s_hist, y_hist, rho, count = carry
            s = x * 1e-3
            y = x * 2e-3
            ys = jnp.dot(y, s)
            store = ys > 1e-10
            idx = jnp.mod(count, m)
            # production pattern as of round 2: select over the FULL
            # (m, n) buffer
            s_hist = jnp.where(store, s_hist.at[idx].set(s), s_hist)
            y_hist = jnp.where(store, y_hist.at[idx].set(y), y_hist)
            rho = jnp.where(
                store, rho.at[idx].set(1.0 / jnp.maximum(ys, 1e-20)), rho)
            return (x + 1e-9 * s_hist[idx], s_hist, y_hist, rho,
                    count + store.astype(jnp.int32))

        carry0 = (g, s_hist, y_hist, rho, jnp.int32(0))
        ms, _ = time_loop("histupd_where_h100", upd_where, carry0)
        results["histupd_where_h100_ms"] = ms

        def upd_row(carry):
            x, s_hist, y_hist, rho, count = carry
            s = x * 1e-3
            y = x * 2e-3
            ys = jnp.dot(y, s)
            store = ys > 1e-10
            idx = jnp.mod(count, m)
            # row-wise: only the touched row is read+selected+written
            s_hist = s_hist.at[idx].set(jnp.where(store, s, s_hist[idx]))
            y_hist = y_hist.at[idx].set(jnp.where(store, y, y_hist[idx]))
            rho = rho.at[idx].set(jnp.where(
                store, 1.0 / jnp.maximum(ys, 1e-20), rho[idx]))
            return (x + 1e-9 * s_hist[idx], s_hist, y_hist, rho,
                    count + store.astype(jnp.int32))

        ms, _ = time_loop("histupd_row_h100", upd_row, carry0)
        results["histupd_row_h100_ms"] = ms
        del s_hist, y_hist, rho, g, carry0

    # full-step variants (expensive compiles; request explicitly)
    # production (matrix direction) unless the name says loop
    step_variants = {
        "step_f32h100loop": dict(impl="loop"),
        "step_f32h100mat": dict(impl="matrix"),
        "step_f32h10": dict(history=10, impl="matrix"),
        "step_bf16h100": dict(compute_dtype="bfloat16", impl="matrix"),
        "step_bf16h10": dict(compute_dtype="bfloat16", history=10,
                             impl="matrix"),
        "step_ref": dict(max_ls=0, impl="matrix"),
        # the r4 TPU production combo (unit opening trial + carried
        # Grams) and its recompute control — the same two graphs the
        # lbfgs3level1024unit{grams,bf16} bench configs run end-to-end
        "step_prod": dict(compute_dtype="bfloat16", impl="matrix",
                          t_init="unit", grams=True),
        "step_produnit": dict(compute_dtype="bfloat16", impl="matrix",
                              t_init="unit"),
    }
    for name, kw in step_variants.items():
        if name not in want:
            continue
        kw = dict(kw)
        impl = kw.pop("impl", "loop")
        t_init = kw.pop("t_init", "lr")
        grams = kw.pop("grams", False)
        cfg_v, lg, params_v, targets_v, x0v = setup(**kw)
        lr = jnp.float32(cfg_v.lr_start)
        max_ls = cfg_v.lbfgs_max_ls_steps

        def body(carry, lg=lg, lr=lr, max_ls=max_ls, impl=impl,
                 t_init=t_init):
            params, targets, x, st = carry
            x, st = L.lbfgs_step(partial(lg, params, targets), x, st, lr,
                                 max_ls_steps=max_ls, direction_impl=impl,
                                 t_init=t_init)
            return (params, targets, x, st)

        st0 = jax.jit(
            lambda p, t, x, h, tg: L.init_state(partial(lg, p, t), x, h,
                                                track_grams=tg),
            static_argnums=(3, 4))(params_v, targets_v, x0v,
                                   cfg_v.lbfgs_history, grams)
        ms, out_hi = time_loop(name, body,
                               (params_v, targets_v, x0v, st0))
        results[f"{name}_ms"] = ms
        n_evals = int(np.asarray(out_hi[3].n_evals)) - 1
        results[f"{name}_evals_per_step"] = round(n_evals / N_HI, 3)
        log(f"  {name}: {n_evals / N_HI:.2f} evals/step")
        del cfg_v, lg, params_v, targets_v, x0v, st0, out_hi

    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
