"""Probe: recompute vs incrementally-maintained Gram matrices in the
matrix-form L-BFGS direction (config.lbfgs_grams).

Round 3's matrix two-loop (`engine/lbfgs.py:_two_loop_direction_matrix`)
recomputes P = S Yᵀ and Q = Y Yᵀ from scratch every step — 4·m²·n FLOPs
(~188 GFLOP at m=100, n=4.7M) at precision=HIGHEST, ~6 ms of MXU time —
although a step replaces at most ONE history row, which only changes one
row+column of each Gram. The incremental mode carries P and Q
((m, m) f32, 80 KB) in the optimizer state and refreshes the touched
row/column with three GEMVs (`lbfgs._update_grams`, 2·3·m·n FLOPs):
mathematically the same matrices (every entry is an exact dot of current
rows — nothing accumulates, so there is no drift), bitwise identical for
all untouched rows.

Both variants run the REAL production code (`lbfgs._two_loop_direction`
on an `LbfgsState` with / without carried Grams) inside a loop body that
also performs the store-gated circular history update, exactly like a
real L-BFGS step — so nothing is loop-invariant and the Grams cannot
hoist (the r3 harness's twoloop rows measured only per-g work for that
reason; this probe is the honest recompute-vs-incremental comparison).
A correctness gate compares the two variants' directions step-for-step
before timing (the unit-test twin is
tests/test_engine.py::test_lbfgs_incremental_grams_track_recompute).

Shapes mirror the production headline config: m=100 (torch's default
history_size), n=4.7M (3level1024's flat image vector), f32.
Differential timing (trip counts 20/220, ±1.5 ms/iter through this
tunnel) cancels the remote-dispatch RPC.

Usage:  python scripts/exp_gramupd.py [m [n [n_lo n_hi]]]
Output: per-variant ms/step on stderr + one JSON dict on stdout.

The default 20/220 trip counts leave ±1.5 ms/iter of tunnel noise —
enough to rank 10 ms effects, not 2 ms ones; 100/1100 (±0.3 ms/iter,
hi run ~22 s of device time, still under the ~30 s tunnel safety bound)
is the decisive setting for this comparison.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

sys.path.insert(0, "/root/repo")

from artstyletransfer_tpu.engine import lbfgs as L  # noqa: E402

N_LO, N_HI = 20, 220
HI = jax.lax.Precision.HIGHEST


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def sync(out):
    jax.block_until_ready(out)
    leaf = jax.tree.leaves(out)[0]
    float(np.asarray(leaf).ravel()[0])


def time_loop(name, body, carry0, n_lo=None, n_hi=None):
    # read the globals at CALL time — default-arg binding would freeze
    # the module constants and silently ignore the CLI trip-count override
    n_lo = N_LO if n_lo is None else n_lo
    n_hi = N_HI if n_hi is None else n_hi
    def run(c, n):
        return lax.fori_loop(0, n, lambda i, cc: body(cc), c)

    fn = jax.jit(run, static_argnums=1)

    def run_sync(n):
        out = fn(carry0, n)
        sync(out)
        return out

    t0 = time.time()
    out = run_sync(n_lo)
    log(f"  {name}: compiled+warm lo in {time.time() - t0:.0f}s")
    del out
    out = run_sync(n_lo)
    del out
    t0 = time.time()
    out = run_sync(n_lo)
    t_lo = time.time() - t0
    del out
    out = run_sync(n_hi)
    del out
    t0 = time.time()
    out_hi = run_sync(n_hi)
    t_hi = time.time() - t0
    del out_hi
    ms = (t_hi - t_lo) / (n_hi - n_lo) * 1e3
    log(f"  {name}: {ms:.2f} ms/iter  (lo {t_lo:.2f}s, hi {t_hi:.2f}s)")
    return ms


def make_state(m, n, key=0):
    """Synthetic state with REALISTIC conditioning: curvature pairs have
    y correlated with s (ys > 0, rho ~ O(1)) like the store guard
    guarantees in production, and random Gaussian rows at large n are
    near-orthogonal, so the alpha/beta recursions stay bounded. (A first
    cut used uncorrelated random s/y: rho ~ 1/(near-zero dots) made both
    variants' recursions blow up to NaN within two steps — a harness
    conditioning problem, not a production one.)"""
    kx, ks, ky, kg, kc = jax.random.split(jax.random.PRNGKey(key), 5)
    scale = 1.0 / np.sqrt(n)   # unit-norm-ish rows/vectors
    x = jax.random.normal(kx, (n,), jnp.float32) * scale
    S = jax.random.normal(ks, (m, n), jnp.float32) * scale
    noise = jax.random.normal(ky, (m, n), jnp.float32) * (scale * 1e-2)
    c = jax.random.uniform(kc, (m, 1), jnp.float32, 0.5, 2.0)
    Y = S * c + noise
    rho = 1.0 / jnp.maximum(jnp.einsum("mn,mn->m", S, Y, precision=HI),
                            1e-20)
    g = jax.random.normal(kg, (n,), jnp.float32) * scale
    P = jnp.einsum("mn,kn->mk", S, Y, precision=HI)
    Q = jnp.einsum("mn,kn->mk", Y, Y, precision=HI)
    return x, g, S, Y, rho, P, Q


def _unit(v):
    return v / jnp.sqrt(jnp.maximum(jnp.dot(v, v), 1e-30))


def _sy(key, count, n):
    # a fresh store-worthy (s, y) pair per iteration: random rows are
    # near-orthogonal at large n (diagonal-dominant Grams, bounded
    # recursions) and y is correlated with s so ys > 0 and rho ~ O(1) —
    # the regime the production store guard guarantees. fold_in(count)
    # keeps the pair iteration-dependent so nothing hoists; the PRNG cost
    # is identical in both variants (differential comparison unaffected).
    k1 = jax.random.fold_in(key, count * 2)
    k2 = jax.random.fold_in(key, count * 2 + 1)
    s = _unit(jax.random.normal(k1, (n,), jnp.float32))
    y = s * 1.3 + _unit(jax.random.normal(k2, (n,), jnp.float32)) * 1e-2
    ys = jnp.dot(y, s)
    return s, y, ys


def _upd_buffers(S, Y, rho, s, y, ys, idx, store):
    # the production history update (lbfgs_step's masked circular write)
    S = jnp.where(store, S.at[idx].set(s), S)
    Y = jnp.where(store, Y.at[idx].set(y), Y)
    rho = jnp.where(store, rho.at[idx].set(1.0 / jnp.maximum(ys, 1e-20)),
                    rho)
    return S, Y, rho


def _state(S, Y, rho, count, g, P=None, Q=None):
    return L.LbfgsState(s_hist=S, y_hist=Y, rho=rho, count=count,
                        f=jnp.float32(1.0), g=g, n_evals=count,
                        n_iter=count, sy_gram=P, yy_gram=Q)


def body_recompute(carry):
    g, S, Y, rho, count, key = carry
    s, y, ys = _sy(key, count, g.shape[0])
    store = ys > 1e-10
    idx = jnp.mod(count, S.shape[0])
    S, Y, rho = _upd_buffers(S, Y, rho, s, y, ys, idx, store)
    count = count + store.astype(jnp.int32)
    d = L._two_loop_direction(g, _state(S, Y, rho, count, g),
                              impl="matrix")
    # renormalized feedback: consumes d (defeats hoisting/CSE) while
    # keeping the carry O(1) forever
    return (_unit(g + d), S, Y, rho, count, key)


def body_incremental(carry):
    g, S, Y, rho, count, key, P, Q = carry
    s, y, ys = _sy(key, count, g.shape[0])
    store = ys > 1e-10
    idx = jnp.mod(count, S.shape[0])
    S, Y, rho = _upd_buffers(S, Y, rho, s, y, ys, idx, store)
    P, Q = L._update_grams(P, Q, S, Y, s, y, ys, idx, store)
    count = count + store.astype(jnp.int32)
    d = L._two_loop_direction(g, _state(S, Y, rho, count, g, P, Q),
                              impl="matrix")
    return (_unit(g + d), S, Y, rho, count, key, P, Q)


def check_equivalence(m=8, n=4096, steps=12):
    """Run both variants step-for-step from a shared init (count starts
    below m so the probe exercises partial AND wrapped histories) and
    compare the evolved parameter vectors."""
    x, g, S, Y, rho, P, Q = make_state(m, n, key=7)
    del x
    count0 = jnp.int32(m - 3)
    rng = jax.random.PRNGKey(99)
    ca = (g, S, Y, rho, count0, rng)
    cb = (g, S, Y, rho, count0, rng, P, Q)
    worst = 0.0
    step_a = jax.jit(body_recompute)
    step_b = jax.jit(body_incremental)
    for _ in range(steps):
        ca = step_a(ca)
        cb = step_b(cb)
        da = np.asarray(ca[0])
        db = np.asarray(cb[0])
        scale = max(float(np.max(np.abs(da))), 1e-30)
        worst = max(worst, float(np.max(np.abs(da - db))) / scale)
        # keep the trajectories paired: feed a's evolved g into b
        cb = (ca[0],) + cb[1:]
    log(f"  equivalence over {steps} steps (m={m}, partial->wrapped): "
        f"worst rel diff {worst:.2e}")
    return worst


def main(argv):
    m = int(argv[0]) if len(argv) > 0 else 100
    n = int(argv[1]) if len(argv) > 1 else 4_718_592
    global N_LO, N_HI
    if len(argv) > 3:
        N_LO, N_HI = int(argv[2]), int(argv[3])
    log(f"devices: {jax.devices()}")
    log(f"m={m} n={n}: history {2 * m * n * 4 / 1e9:.2f} GB; Gram "
        f"recompute {4 * m * m * n / 1e9:.0f} GFLOP/step vs incremental "
        f"{6 * m * n / 1e9:.1f} GFLOP/step")

    worst = check_equivalence()
    results = {"equiv_worst_rel": worst}
    if worst > 1e-4:
        log("  EQUIVALENCE FAILED — not timing")
        print(json.dumps(results), flush=True)
        return 1

    x, g, S, Y, rho, P, Q = make_state(m, n)
    del x
    count0 = jnp.int32(m)  # steady state: full history
    rng = jax.random.PRNGKey(42)
    results["recompute_ms"] = round(
        time_loop("recompute", body_recompute,
                  (g, S, Y, rho, count0, rng)), 3)
    results["incremental_ms"] = round(
        time_loop("incremental", body_incremental,
                  (g, S, Y, rho, count0, rng, P, Q)), 3)
    print(json.dumps(results), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
