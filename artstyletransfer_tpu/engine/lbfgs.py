"""L-BFGS with strong-Wolfe line search, compiled fully on-device.

The reference's default optimizer is torch.optim.LBFGS(max_iter=1,
line_search_fn='strong_wolfe', lr=10.0 decayed x0.999 per closure call)
(reference neural_style_transfer.py:136, :154-158, :367; config.py:9).
Torch runs the closure loop in Python on the host; here the entire
iteration — two-loop recursion over a circular history buffer, the
bracket+zoom strong-Wolfe line search, and the parameter update — is a
single XLA graph built from lax.while_loop / lax.fori_loop, so an L-BFGS
step never leaves the TPU.

The line search follows torch's strong-Wolfe algorithm decision-for-decision
(same cubic-interpolation bounds, the same ls_iter>1 re-bracketing quirk,
the same insufficient-progress boundary nudging and lowest-f bracket
bookkeeping in the zoom phase), so a step here tracks
torch.optim.LBFGS(max_iter=1, strong_wolfe) through the full pyramid loss —
see tests/test_trajectory_parity.py. One deliberate difference: torch
re-invokes the closure at the top of every step() even though the line
search already evaluated loss/grad at the accepted point; this
implementation carries (f, g) in the state instead, saving one full
forward+backward per step at identical numerics. The lr bookkeeping for the
reference's per-closure-call decay accounts for those skipped calls
(engine/transfer.py).

Algorithm background: Nocedal & Wright, Numerical Optimization,
Alg. 7.4 (two-loop) / 3.5-3.6 (Wolfe bracket+zoom). History pairs are kept
in fixed-size (m, n) buffers indexed modulo m — static shapes, no dynamic
allocation.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax

# Wolfe constants and tolerances (torch's values).
_C1 = 1e-4
_C2 = 0.9
_TOL_CHANGE = 1e-9


class LbfgsState(NamedTuple):
    s_hist: jax.Array   # (m, n) parameter-difference history
    y_hist: jax.Array   # (m, n) gradient-difference history
    rho: jax.Array      # (m,)   1 / (y . s)
    count: jax.Array    # int32  number of pairs ever stored
    f: jax.Array        # scalar loss at the current point
    g: jax.Array        # (n,)   gradient at the current point
    n_evals: jax.Array  # int32  cumulative loss/grad evaluations
    n_iter: jax.Array   # int32  completed lbfgs_step calls (torch n_iter)


LossGradFn = Callable[[jax.Array], Tuple[jax.Array, jax.Array]]


def init_state(loss_grad: LossGradFn, x: jax.Array, history: int) -> LbfgsState:
    """Initial state; performs the first loss/grad evaluation."""
    f, g = loss_grad(x)
    n = x.shape[0]
    return LbfgsState(
        s_hist=jnp.zeros((history, n), x.dtype),
        y_hist=jnp.zeros((history, n), x.dtype),
        rho=jnp.zeros((history,), x.dtype),
        count=jnp.int32(0),
        f=f,
        g=g,
        n_evals=jnp.int32(1),
        n_iter=jnp.int32(0),
    )


def _two_loop_direction(g: jax.Array, state: LbfgsState) -> jax.Array:
    """d = -H_k g via the two-loop recursion over the circular history."""
    m = state.s_hist.shape[0]
    k = jnp.minimum(state.count, m)

    def first_loop(j, carry):
        q, alphas = carry
        idx = jnp.mod(state.count - 1 - j, m)
        valid = (j < k).astype(q.dtype)
        s = state.s_hist[idx]
        y = state.y_hist[idx]
        a = state.rho[idx] * jnp.dot(s, q) * valid
        return q - a * y, alphas.at[idx].set(a)

    q, alphas = lax.fori_loop(0, m, first_loop, (g, jnp.zeros((m,), g.dtype)))

    newest = jnp.mod(state.count - 1, m)
    sy = jnp.dot(state.s_hist[newest], state.y_hist[newest])
    yy = jnp.dot(state.y_hist[newest], state.y_hist[newest])
    gamma = jnp.where(state.count > 0, sy / jnp.maximum(yy, 1e-20), 1.0)
    r = gamma * q

    def second_loop(j, r):
        idx = jnp.mod(state.count - k + j, m)
        valid = (j < k).astype(r.dtype)
        y = state.y_hist[idx]
        s = state.s_hist[idx]
        b = state.rho[idx] * jnp.dot(y, r)
        return r + s * (alphas[idx] - b) * valid

    r = lax.fori_loop(0, m, second_loop, r)
    return -r


def _cubic_interpolate(x1, f1, g1, x2, f2, g2, bmin, bmax):
    """Minimizer of the cubic through (x1,f1,g1)/(x2,f2,g2) clipped to
    [bmin, bmax]; bisection fallback (torch's _cubic_interpolate)."""
    d1 = g1 + g2 - 3.0 * (f1 - f2) / (x1 - x2)
    d2_square = d1 * d1 - g1 * g2
    d2 = jnp.sqrt(jnp.maximum(d2_square, 0.0))
    min_pos_le = x2 - (x2 - x1) * ((g2 + d2 - d1) / (g2 - g1 + 2.0 * d2))
    min_pos_gt = x1 - (x1 - x2) * ((g1 + d2 - d1) / (g1 - g2 + 2.0 * d2))
    min_pos = jnp.where(x1 <= x2, min_pos_le, min_pos_gt)
    ok = (d2_square >= 0.0) & jnp.isfinite(min_pos)
    return jnp.where(ok, jnp.clip(min_pos, bmin, bmax), 0.5 * (bmin + bmax))


class _BracketState(NamedTuple):
    status: jax.Array   # 0 = searching, 1 = bracketed, 2 = done (accept t)
    ls_iter: jax.Array
    n_evals: jax.Array
    t: jax.Array
    f_t: jax.Array
    gtd_t: jax.Array
    g_t: jax.Array
    t_prev: jax.Array
    f_prev: jax.Array
    gtd_prev: jax.Array
    g_prev: jax.Array


class _ZoomState(NamedTuple):
    done: jax.Array
    insuf: jax.Array    # insufficient-progress flag
    low: jax.Array      # index (0/1) of the lower-f bracket end
    ls_iter: jax.Array
    n_evals: jax.Array
    b_t: jax.Array      # (2,)
    b_f: jax.Array      # (2,)
    b_gtd: jax.Array    # (2,)
    b_g: jax.Array      # (2, n)


def _strong_wolfe(loss_grad: LossGradFn, x: jax.Array, d: jax.Array,
                  f0: jax.Array, g0: jax.Array, t_init: jax.Array,
                  max_iter: int):
    """Strong-Wolfe line search along d from x, tracking torch's
    _strong_wolfe decision-for-decision.

    Returns (t, f_t, g_t, n_evals). On a failed search returns the
    lowest-f bracket end, like torch.
    """
    gtd0 = jnp.dot(g0, d)
    d_norm = jnp.max(jnp.abs(d))

    def eval_at(t):
        f, g = loss_grad(x + t * d)
        return f, g, jnp.dot(g, d)

    def armijo_fail(t, f):
        return f > f0 + _C1 * t * gtd0

    def curv_ok(gtd):
        return jnp.abs(gtd) <= -_C2 * gtd0

    # ---- phase 1: bracketing --------------------------------------------
    f1, g1, gtd1 = eval_at(t_init)
    init = _BracketState(
        status=jnp.int32(0), ls_iter=jnp.int32(0), n_evals=jnp.int32(1),
        t=t_init, f_t=f1, gtd_t=gtd1, g_t=g1,
        t_prev=jnp.zeros_like(t_init), f_prev=f0, gtd_prev=gtd0, g_prev=g0,
    )

    def b_cond(s: _BracketState):
        return (s.status == 0) & (s.ls_iter < max_iter)

    def b_body(s: _BracketState) -> _BracketState:
        # torch's quirk: the f_prev re-bracket check only arms from the
        # third condition evaluation (ls_iter > 1)
        fail = armijo_fail(s.t, s.f_t) | ((s.ls_iter > 1) & (s.f_t >= s.f_prev))
        accept = curv_ok(s.gtd_t)
        going_up = s.gtd_t >= 0.0

        def settle(s):
            st = jnp.where(fail, 1, jnp.where(accept, 2, 1))
            return s._replace(status=jnp.int32(0) + st)

        def extrapolate(s):
            # torch bounds: [t + 0.01*(t - t_prev), 10*t]
            min_step = s.t + 0.01 * (s.t - s.t_prev)
            max_step = s.t * 10.0
            t_new = _cubic_interpolate(s.t_prev, s.f_prev, s.gtd_prev,
                                       s.t, s.f_t, s.gtd_t,
                                       min_step, max_step)
            f_new, g_new, gtd_new = eval_at(t_new)
            return s._replace(
                t_prev=s.t, f_prev=s.f_t, gtd_prev=s.gtd_t, g_prev=s.g_t,
                t=t_new, f_t=f_new, gtd_t=gtd_new, g_t=g_new,
                n_evals=s.n_evals + 1, ls_iter=s.ls_iter + 1)

        return lax.cond(fail | accept | going_up, settle, extrapolate, s)

    br = lax.while_loop(b_cond, b_body, init)

    exhausted = br.status == 0   # ls_iter hit max_iter while bracketing
    accepted = br.status == 2

    # bracket contents:
    #   exhausted      -> [0, t]        with (f0, g0) and the last trial
    #   bracketed      -> [t_prev, t]
    #   accepted(done) -> [t, t] (zoom is skipped)
    e0_t = jnp.where(exhausted, jnp.zeros_like(br.t),
                     jnp.where(accepted, br.t, br.t_prev))
    e0_f = jnp.where(exhausted, f0, jnp.where(accepted, br.f_t, br.f_prev))
    e0_gtd = jnp.where(exhausted, gtd0,
                       jnp.where(accepted, br.gtd_t, br.gtd_prev))
    e0_g = jnp.where(exhausted, g0, jnp.where(accepted, br.g_t, br.g_prev))
    b_t = jnp.stack([e0_t, br.t])
    b_f = jnp.stack([e0_f, br.f_t])
    b_gtd = jnp.stack([e0_gtd, br.gtd_t])
    b_g = jnp.stack([e0_g, br.g_t])

    # ---- phase 2: zoom ----------------------------------------------------
    zinit = _ZoomState(
        done=accepted, insuf=jnp.bool_(False),
        low=jnp.where(b_f[0] <= b_f[1], jnp.int32(0), jnp.int32(1)),
        ls_iter=br.ls_iter, n_evals=br.n_evals,
        b_t=b_t, b_f=b_f, b_gtd=b_gtd, b_g=b_g,
    )

    def z_cond(s: _ZoomState):
        wide = jnp.abs(s.b_t[1] - s.b_t[0]) * d_norm >= _TOL_CHANGE
        return (~s.done) & (s.ls_iter < max_iter) & wide

    def z_body(s: _ZoomState) -> _ZoomState:
        lo = s.low
        hi = 1 - lo
        bmin = jnp.minimum(s.b_t[0], s.b_t[1])
        bmax = jnp.maximum(s.b_t[0], s.b_t[1])
        t = _cubic_interpolate(s.b_t[0], s.b_f[0], s.b_gtd[0],
                               s.b_t[1], s.b_f[1], s.b_gtd[1], bmin, bmax)
        # torch's insufficient-progress guard: a trial within 10% of a
        # boundary is tolerated once, then nudged to boundary - eps
        eps = 0.1 * (bmax - bmin)
        close = jnp.minimum(bmax - t, t - bmin) < eps
        nudge = s.insuf | (t >= bmax) | (t <= bmin)
        t_nudged = jnp.where(jnp.abs(t - bmax) < jnp.abs(t - bmin),
                             bmax - eps, bmin + eps)
        t = jnp.where(close & nudge, t_nudged, t)
        insuf_new = close & ~nudge

        f_t, g_t, gtd_t = eval_at(t)
        fail = armijo_fail(t, f_t) | (f_t >= s.b_f[lo])

        # fail branch: new point becomes the high end; relabel low by f
        ft_t = s.b_t.at[hi].set(t)
        ft_f = s.b_f.at[hi].set(f_t)
        ft_gtd = s.b_gtd.at[hi].set(gtd_t)
        ft_g = s.b_g.at[hi].set(g_t)
        low_fail = jnp.where(ft_f[0] <= ft_f[1], jnp.int32(0), jnp.int32(1))

        # success branch: maybe flip high<-low, then new point becomes low
        done_new = curv_ok(gtd_t)
        flip = gtd_t * (s.b_t[hi] - s.b_t[lo]) >= 0.0
        el_t = jnp.where(flip, s.b_t.at[hi].set(s.b_t[lo]), s.b_t)
        el_f = jnp.where(flip, s.b_f.at[hi].set(s.b_f[lo]), s.b_f)
        el_gtd = jnp.where(flip, s.b_gtd.at[hi].set(s.b_gtd[lo]), s.b_gtd)
        el_g = jnp.where(flip, s.b_g.at[hi].set(s.b_g[lo]), s.b_g)
        el_t = el_t.at[lo].set(t)
        el_f = el_f.at[lo].set(f_t)
        el_gtd = el_gtd.at[lo].set(gtd_t)
        el_g = el_g.at[lo].set(g_t)

        return _ZoomState(
            done=jnp.where(fail, s.done, done_new),
            insuf=insuf_new,
            low=jnp.where(fail, low_fail, lo),
            ls_iter=s.ls_iter + 1,
            n_evals=s.n_evals + 1,
            b_t=jnp.where(fail, ft_t, el_t),
            b_f=jnp.where(fail, ft_f, el_f),
            b_gtd=jnp.where(fail, ft_gtd, el_gtd),
            b_g=jnp.where(fail, ft_g, el_g),
        )

    out = lax.while_loop(z_cond, z_body, zinit)
    lo = out.low
    return out.b_t[lo], out.b_f[lo], out.b_g[lo], out.n_evals


def lbfgs_step(loss_grad: LossGradFn, x: jax.Array, state: LbfgsState,
               lr: jax.Array, max_ls_steps: int = 25
               ) -> Tuple[jax.Array, LbfgsState]:
    """One L-BFGS iteration (direction + strong-Wolfe search + history update).

    x: flattened parameter vector. state.f/state.g must hold the loss and
    gradient at x (maintained across calls). Equivalent to one
    torch LBFGS(max_iter=1, strong_wolfe).step() of the reference.
    """
    m = state.s_hist.shape[0]
    g0 = state.g
    f0 = state.f

    d = _two_loop_direction(g0, state)
    dphi0 = jnp.dot(g0, d)
    # fall back to steepest descent on a non-descent direction
    bad = dphi0 >= 0.0
    d = jnp.where(bad, -g0, d)

    # initial trial step: torch scales the very first step by min(1, 1/|g|_1)
    g_l1 = jnp.sum(jnp.abs(g0))
    t0 = jnp.where(state.n_iter == 0,
                   lr * jnp.minimum(1.0, 1.0 / jnp.maximum(g_l1, 1e-20)),
                   lr)

    t, f_new, g_new, ls_evals = _strong_wolfe(
        loss_grad, x, d, f0, g0, t0, max_iter=max_ls_steps)

    x_new = x + t * d
    s = t * d
    y = g_new - g0
    ys = jnp.dot(y, s)
    store = ys > 1e-10   # torch's curvature guard for the history update

    idx = jnp.mod(state.count, m)
    s_hist = jnp.where(store, state.s_hist.at[idx].set(s), state.s_hist)
    y_hist = jnp.where(store, state.y_hist.at[idx].set(y), state.y_hist)
    rho = jnp.where(store, state.rho.at[idx].set(1.0 / jnp.maximum(ys, 1e-20)),
                    state.rho)
    count = state.count + store.astype(jnp.int32)

    new_state = LbfgsState(
        s_hist=s_hist, y_hist=y_hist, rho=rho, count=count,
        f=f_new, g=g_new, n_evals=state.n_evals + ls_evals,
        n_iter=state.n_iter + 1,
    )
    return x_new, new_state
