"""L-BFGS with strong-Wolfe line search, compiled fully on-device.

The reference's default optimizer is torch.optim.LBFGS(max_iter=1,
line_search_fn='strong_wolfe', lr=10.0 decayed x0.999 per closure call)
(reference neural_style_transfer.py:136, :154-158, :367; config.py:9).
Torch runs the closure loop in Python on the host; here the entire
iteration — two-loop recursion over a circular history buffer, the
bracket+zoom strong-Wolfe line search, and the parameter update — is a
single XLA graph built from lax.while_loop / lax.fori_loop, so an L-BFGS
step never leaves the TPU.

Algorithms: standard two-loop recursion and the bracket/zoom strong-Wolfe
line search with cubic interpolation (Nocedal & Wright, Numerical
Optimization, Alg. 7.4 / 3.5-3.6). History pairs are kept in fixed-size
(m, n) buffers indexed modulo m — static shapes, no dynamic allocation.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax

# Wolfe constants (the customary values, also used by torch's line search).
_C1 = 1e-4
_C2 = 0.9


class LbfgsState(NamedTuple):
    s_hist: jax.Array   # (m, n) parameter-difference history
    y_hist: jax.Array   # (m, n) gradient-difference history
    rho: jax.Array      # (m,)   1 / (y . s)
    count: jax.Array    # int32  number of pairs ever stored
    f: jax.Array        # scalar loss at the current point
    g: jax.Array        # (n,)   gradient at the current point
    n_evals: jax.Array  # int32  cumulative loss/grad evaluations


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


def _cubic_min(t0, f0, g0, t1, f1, g1):
    """Minimizer of the cubic through (t0,f0,g0)/(t1,f1,g1), clipped inside."""
    lo = jnp.minimum(t0, t1)
    hi = jnp.maximum(t0, t1)
    d1 = g0 + g1 - 3.0 * (f0 - f1) / (t0 - t1)
    disc = d1 * d1 - g0 * g1
    ok = disc >= 0.0
    d2 = jnp.sqrt(jnp.maximum(disc, 0.0)) * jnp.sign(t1 - t0)
    denom = g1 - g0 + 2.0 * d2
    t = t1 - (t1 - t0) * (g1 + d2 - d1) / denom
    t = jnp.where(ok & jnp.isfinite(t), t, 0.5 * (t0 + t1))
    return jnp.clip(t, lo, hi)


class _LsState(NamedTuple):
    phase: jax.Array    # 0 = bracketing, 1 = zoom, 2 = done
    it: jax.Array
    n_evals: jax.Array
    # current trial point
    t: jax.Array
    f_t: jax.Array
    dphi_t: jax.Array
    g_t: jax.Array
    # previous trial (bracketing phase)
    t_prev: jax.Array
    f_prev: jax.Array
    dphi_prev: jax.Array
    g_prev: jax.Array
    # bracket [lo, hi] (zoom phase); lo carries its gradient for the result
    t_lo: jax.Array
    f_lo: jax.Array
    dphi_lo: jax.Array
    g_lo: jax.Array
    t_hi: jax.Array
    f_hi: jax.Array
    dphi_hi: jax.Array


def _strong_wolfe(loss_grad: LossGradFn, x: jax.Array, d: jax.Array,
                  f0: jax.Array, g0: jax.Array, t_init: jax.Array,
                  max_iter: int):
    """Strong-Wolfe line search along d from x.

    Returns (t, f_t, g_t, n_evals). On failure returns the best (lowest-f)
    point seen, mirroring torch's fallback behavior.
    """
    dphi0 = jnp.dot(g0, d)

    def eval_at(t):
        f, g = loss_grad(x + t * d)
        return f, g, jnp.dot(g, d)

    f1, g1, dphi1 = eval_at(t_init)

    init = _LsState(
        phase=jnp.int32(0), it=jnp.int32(1), n_evals=jnp.int32(1),
        t=t_init, f_t=f1, dphi_t=dphi1, g_t=g1,
        t_prev=jnp.zeros_like(t_init), f_prev=f0, dphi_prev=dphi0, g_prev=g0,
        t_lo=jnp.zeros_like(t_init), f_lo=f0, dphi_lo=dphi0, g_lo=g0,
        t_hi=t_init, f_hi=f1, dphi_hi=dphi1,
    )

    armijo = lambda t, f: f <= f0 + _C1 * t * dphi0  # noqa: E731
    curv = lambda dphi: jnp.abs(dphi) <= -_C2 * dphi0  # noqa: E731

    def cond(s: _LsState):
        return (s.phase != 2) & (s.it < max_iter)

    def body(s: _LsState) -> _LsState:
        def bracket_phase(s: _LsState) -> _LsState:
            fail_armijo = (~armijo(s.t, s.f_t)) | ((s.it > 1) & (s.f_t >= s.f_prev))
            ok_curv = curv(s.dphi_t)
            going_up = s.dphi_t >= 0.0

            # enter zoom with bracket (prev, t)
            def to_zoom_prev_t(s):
                return s._replace(phase=jnp.int32(1),
                                  t_lo=s.t_prev, f_lo=s.f_prev,
                                  dphi_lo=s.dphi_prev, g_lo=s.g_prev,
                                  t_hi=s.t, f_hi=s.f_t, dphi_hi=s.dphi_t)

            # enter zoom with bracket (t, prev)
            def to_zoom_t_prev(s):
                return s._replace(phase=jnp.int32(1),
                                  t_lo=s.t, f_lo=s.f_t,
                                  dphi_lo=s.dphi_t, g_lo=s.g_t,
                                  t_hi=s.t_prev, f_hi=s.f_prev,
                                  dphi_hi=s.dphi_prev)

            def accept(s):
                return s._replace(phase=jnp.int32(2),
                                  t_lo=s.t, f_lo=s.f_t,
                                  dphi_lo=s.dphi_t, g_lo=s.g_t)

            def extrapolate(s):
                # widen: cubic extrapolation bounded to [2t, 10t]
                t_new = _cubic_min(s.t_prev, s.f_prev, s.dphi_prev,
                                   s.t, s.f_t, s.dphi_t)
                t_new = jnp.clip(t_new, 2.0 * s.t, 10.0 * s.t)
                f_new, g_new, dphi_new = eval_at(t_new)
                return s._replace(
                    t_prev=s.t, f_prev=s.f_t, dphi_prev=s.dphi_t, g_prev=s.g_t,
                    t=t_new, f_t=f_new, dphi_t=dphi_new, g_t=g_new,
                    n_evals=s.n_evals + 1)

            return lax.cond(
                fail_armijo, to_zoom_prev_t,
                lambda s: lax.cond(
                    ok_curv, accept,
                    lambda s: lax.cond(going_up, to_zoom_t_prev, extrapolate, s),
                    s),
                s)

        def zoom_phase(s: _LsState) -> _LsState:
            span = jnp.abs(s.t_hi - s.t_lo)
            t_new = _cubic_min(s.t_lo, s.f_lo, s.dphi_lo,
                               s.t_hi, s.f_hi, s.dphi_hi)
            # keep the trial strictly interior (bisect if it sticks to an end)
            margin = 0.1 * span
            t_new = jnp.clip(t_new,
                             jnp.minimum(s.t_lo, s.t_hi) + margin,
                             jnp.maximum(s.t_lo, s.t_hi) - margin)
            f_new, g_new, dphi_new = eval_at(t_new)
            s = s._replace(n_evals=s.n_evals + 1)

            fail = (~armijo(t_new, f_new)) | (f_new >= s.f_lo)

            def shrink_hi(s):
                return s._replace(t_hi=t_new, f_hi=f_new, dphi_hi=dphi_new)

            def progress(s):
                def accept(s):
                    return s._replace(phase=jnp.int32(2), t_lo=t_new,
                                      f_lo=f_new, dphi_lo=dphi_new, g_lo=g_new)

                def move_lo(s):
                    flip = dphi_new * (s.t_hi - s.t_lo) >= 0.0
                    s = lax.cond(
                        flip,
                        lambda s: s._replace(t_hi=s.t_lo, f_hi=s.f_lo,
                                             dphi_hi=s.dphi_lo),
                        lambda s: s, s)
                    return s._replace(t_lo=t_new, f_lo=f_new,
                                      dphi_lo=dphi_new, g_lo=g_new)

                return lax.cond(curv(dphi_new), accept, move_lo, s)

            s = lax.cond(fail, shrink_hi, progress, s)
            # give up on a vanishing bracket: accept lo
            tiny = span <= 1e-9 * jnp.maximum(jnp.abs(s.t_hi), 1.0)
            return lax.cond(tiny,
                            lambda s: s._replace(phase=jnp.int32(2)),
                            lambda s: s, s)

        s = lax.cond(s.phase == 0, bracket_phase, zoom_phase, s)
        return s._replace(it=s.it + 1)

    out = lax.while_loop(cond, body, init)

    # Result: the accepted point lives in (t_lo, f_lo, g_lo). If the search
    # timed out while bracketing, fall back to the better of (t, prev).
    timed_out_bracketing = (out.phase == 0)
    t_res = jnp.where(timed_out_bracketing,
                      jnp.where(out.f_t < out.f_prev, out.t, out.t_prev),
                      out.t_lo)
    f_res = jnp.where(timed_out_bracketing,
                      jnp.minimum(out.f_t, out.f_prev),
                      out.f_lo)
    g_res = jnp.where(timed_out_bracketing,
                      jnp.where(out.f_t < out.f_prev, out.g_t, out.g_prev),
                      out.g_lo)
    return t_res, f_res, g_res, out.n_evals


def lbfgs_step(loss_grad: LossGradFn, x: jax.Array, state: LbfgsState,
               lr: jax.Array, max_ls_steps: int = 20
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
    dphi0 = jnp.where(bad, -jnp.dot(g0, g0), dphi0)

    # initial trial step: torch scales the very first step by min(1, 1/|g|_1)
    g_l1 = jnp.sum(jnp.abs(g0))
    t0 = jnp.where(state.count == 0,
                   lr * jnp.minimum(1.0, 1.0 / jnp.maximum(g_l1, 1e-20)),
                   lr)

    t, f_new, g_new, ls_evals = _strong_wolfe(
        loss_grad, x, d, f0, g0, t0, max_iter=max_ls_steps)

    x_new = x + t * d
    s = t * d
    y = g_new - g0
    ys = jnp.dot(y, s)
    store = ys > 1e-10

    idx = jnp.mod(state.count, m)
    s_hist = jnp.where(store, state.s_hist.at[idx].set(s), state.s_hist)
    y_hist = jnp.where(store, state.y_hist.at[idx].set(y), state.y_hist)
    rho = jnp.where(store, state.rho.at[idx].set(1.0 / jnp.maximum(ys, 1e-20)),
                    state.rho)
    count = state.count + store.astype(jnp.int32)

    new_state = LbfgsState(
        s_hist=s_hist, y_hist=y_hist, rho=rho, count=count,
        f=f_new, g=g_new, n_evals=state.n_evals + ls_evals + 0,
    )
    return x_new, new_state
