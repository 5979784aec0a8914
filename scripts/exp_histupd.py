"""Probe the L-BFGS history-update HBM cost (the last known ~10 ms).

Round-3's ablation (scripts/exp_lbfgs1024.py histupd) measured the
production masked-full-buffer update at 9.7 ms/step and a row-wise-select
variant EQUAL at 10.3 ms — i.e. the cost is not the select itself. The
pure-bandwidth cost of what the update semantically does (write one
(n,)-row into each of two (m, n) buffers) is ~0.04 ms at n=4.7M, so the
measured ~10 ms means XLA materializes a fresh copy of both history
buffers every step instead of updating them in place.

Hypothesis probed here: the conditional read (the `where(store, ...)`
select or the old-row gather) fuses INTO the dynamic-update-slice, and a
fusion that both reads and writes the same buffer cannot share it —
forcing the full copy. Variants (all produce bit-identical buffer values
for the same inputs):

  where_full   production as of r4: jnp.where(store, buf.at[i].set(row), buf)
  row_select   buf.at[i].set(where(store, row, buf[i]))  (r3's equal-cost row)
  dus_plain    unconditional buf.at[i].set(row) — no read, no select;
               measures whether in-place DUS engages in this loop AT ALL
               (not a production candidate: drops the store-gate)
  row_barrier  row_select with lax.optimization_barrier between the row
               value and the DUS, so the old-row read cannot fuse into
               the write
  cond_dus     lax.cond(store, <unconditional DUS>, identity) — the
               no-store branch returns its operands, which XLA can alias

Shapes mirror the production headline config: m=100 (torch's
history_size default), n=4.7M (3level1024's flat parameter vector), f32
buffers, the update inside a lax.fori_loop chunk like the real step.
Differential timing (two trip counts) cancels the remote-dispatch RPC.

Usage:  python scripts/exp_histupd.py [variant ...]   (default: all)
Output: per-variant ms/step on stderr + one JSON dict on stdout.
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

M = 100
N = 4_718_592  # ~3level1024's flat parameter count (1024x1536x3)
N_LO, N_HI = 5, 25


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def sync(out):
    jax.block_until_ready(out)
    leaf = jax.tree.leaves(out)[0]
    float(np.asarray(leaf).ravel()[0])


def time_loop(name, body, carry0, n_lo=N_LO, n_hi=N_HI):
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


def make_carry():
    kx, ks, ky = jax.random.split(jax.random.PRNGKey(0), 3)
    x = jax.random.normal(kx, (N,), jnp.float32)
    s_hist = jax.random.normal(ks, (M, N), jnp.float32) * 1e-3
    y_hist = jax.random.normal(ky, (M, N), jnp.float32) * 1e-3
    rho = 1.0 / jnp.maximum(jnp.einsum("mn,mn->m", s_hist, y_hist), 1e-8)
    return (x, s_hist, y_hist, rho, jnp.int32(0))


def _sy(x):
    # a store-worthy (s, y) pair derived from the carry, like the real step
    s = x * 1e-3
    y = x * 2e-3
    ys = jnp.dot(y, s)
    return s, y, ys


def _next(x, s_hist, y_hist, rho, count, store, idx):
    # consume the updated buffers like the real step's next-iteration
    # direction read, and advance count only on store
    return (x + 1e-9 * s_hist[idx] + 1e-9 * y_hist[idx] + 1e-12 * rho[idx],
            s_hist, y_hist, rho, count + store.astype(jnp.int32))


def where_full(carry):
    x, s_hist, y_hist, rho, count = carry
    s, y, ys = _sy(x)
    store = ys > 1e-10
    idx = jnp.mod(count, M)
    s_hist = jnp.where(store, s_hist.at[idx].set(s), s_hist)
    y_hist = jnp.where(store, y_hist.at[idx].set(y), y_hist)
    rho = jnp.where(store, rho.at[idx].set(1.0 / jnp.maximum(ys, 1e-20)), rho)
    return _next(x, s_hist, y_hist, rho, count, store, idx)


def row_select(carry):
    x, s_hist, y_hist, rho, count = carry
    s, y, ys = _sy(x)
    store = ys > 1e-10
    idx = jnp.mod(count, M)
    s_hist = s_hist.at[idx].set(jnp.where(store, s, s_hist[idx]))
    y_hist = y_hist.at[idx].set(jnp.where(store, y, y_hist[idx]))
    rho = rho.at[idx].set(
        jnp.where(store, 1.0 / jnp.maximum(ys, 1e-20), rho[idx]))
    return _next(x, s_hist, y_hist, rho, count, store, idx)


def dus_plain(carry):
    x, s_hist, y_hist, rho, count = carry
    s, y, ys = _sy(x)
    store = ys > 1e-10
    idx = jnp.mod(count, M)
    s_hist = s_hist.at[idx].set(s)
    y_hist = y_hist.at[idx].set(y)
    rho = rho.at[idx].set(1.0 / jnp.maximum(ys, 1e-20))
    return _next(x, s_hist, y_hist, rho, count, store, idx)


def row_barrier(carry):
    x, s_hist, y_hist, rho, count = carry
    s, y, ys = _sy(x)
    store = ys > 1e-10
    idx = jnp.mod(count, M)
    s_row = jnp.where(store, s, s_hist[idx])
    y_row = jnp.where(store, y, y_hist[idx])
    r_row = jnp.where(store, 1.0 / jnp.maximum(ys, 1e-20), rho[idx])
    s_row, y_row, r_row = lax.optimization_barrier((s_row, y_row, r_row))
    s_hist = s_hist.at[idx].set(s_row)
    y_hist = y_hist.at[idx].set(y_row)
    rho = rho.at[idx].set(r_row)
    return _next(x, s_hist, y_hist, rho, count, store, idx)


def cond_dus(carry):
    x, s_hist, y_hist, rho, count = carry
    s, y, ys = _sy(x)
    store = ys > 1e-10
    idx = jnp.mod(count, M)

    def do_store(bufs):
        sh, yh, rh = bufs
        return (sh.at[idx].set(s), yh.at[idx].set(y),
                rh.at[idx].set(1.0 / jnp.maximum(ys, 1e-20)))

    s_hist, y_hist, rho = lax.cond(
        store, do_store, lambda bufs: bufs, (s_hist, y_hist, rho))
    return _next(x, s_hist, y_hist, rho, count, store, idx)


VARIANTS = {
    "where_full": where_full,
    "row_select": row_select,
    "dus_plain": dus_plain,
    "row_barrier": row_barrier,
    "cond_dus": cond_dus,
}


def main(argv):
    want = list(argv) or list(VARIANTS)
    log(f"devices: {jax.devices()}")
    log(f"m={M} n={N}: each history buffer "
        f"{M * N * 4 / 1e9:.2f} GB; semantic write per step "
        f"{2 * N * 4 / 1e6:.1f} MB")
    results = {}
    for name in want:
        carry0 = make_carry()
        results[f"{name}_ms"] = round(time_loop(name, VARIANTS[name],
                                                carry0), 3)
        del carry0
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
