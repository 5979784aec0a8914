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
see tests/test_trajectory_parity.py. That includes torch's pre-line-search
break: a direction whose slope is not below -tolerance_change makes the
step a no-op (and, since y=0 then skips the history update, freezes the
trajectory — torch's exact near-converged behavior). One deliberate
difference: torch
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

from typing import Callable, NamedTuple, Optional, Tuple

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
    # Carried Gram matrices for the matrix-form direction
    # (config.lbfgs_grams='incremental'): S Yᵀ and Y Yᵀ, (m, m), refreshed
    # one row+column per accepted step instead of recomputed at 4·m²·n
    # FLOPs. None (no pytree leaves — old checkpoints keep their
    # structure) in the default 'recompute' mode.
    sy_gram: Optional[jax.Array] = None
    yy_gram: Optional[jax.Array] = None


LossGradFn = Callable[[jax.Array], Tuple[jax.Array, jax.Array]]


def init_state(loss_grad: LossGradFn, x: jax.Array, history: int,
               track_grams: bool = False,
               state_dtype: Optional[jnp.dtype] = None) -> LbfgsState:
    """Initial state; performs the first loss/grad evaluation.

    track_grams: carry the (m, m) S Yᵀ / Y Yᵀ Gram matrices in the state
    (zeros-initialized — every entry is masked by the validity of its
    history rows until the rows are stored) for the incremental
    matrix-direction mode.

    state_dtype: storage dtype of the big (m, n) s/y history buffers
    (default: x.dtype). bfloat16 halves both their HBM footprint (the
    capacity limit on 3level+/history=100 configs — config.lbfgs_history)
    and the direction's streamed bandwidth; the m-sized rho and the
    (m, m) Grams stay in x.dtype (they are tiny and carry the
    curvature scalars). The stored pairs are quantized once at store
    time; every contraction accumulates in f32
    (preferred_element_type) so no further precision is lost."""
    f, g = loss_grad(x)
    n = x.shape[0]
    hdt = x.dtype if state_dtype is None else state_dtype
    grams = jnp.zeros((history, history), x.dtype) if track_grams else None
    return LbfgsState(
        s_hist=jnp.zeros((history, n), hdt),
        y_hist=jnp.zeros((history, n), hdt),
        rho=jnp.zeros((history,), x.dtype),
        count=jnp.int32(0),
        f=f,
        g=g,
        n_evals=jnp.int32(1),
        n_iter=jnp.int32(0),
        sy_gram=grams,
        yy_gram=grams,
    )


def _two_loop_direction_loop(g: jax.Array, state: LbfgsState) -> jax.Array:
    """d = -H_k g via the textbook two-loop recursion over the history.

    2m sequential GEMV/axpy iterations over the (m, n) buffers — measured
    LATENCY-bound on TPU at production sizes (83.7 ms at m=100,
    n=4.7M where the pure-bandwidth cost is ~8 ms; scripts/exp_lbfgs1024.py,
    PARITY.md). Kept as the reference implementation and for tiny
    histories; production uses the matrix form below.

    bf16-history asymmetry (config.lbfgs_state_dtype='bfloat16'): this
    form contracts the bf16 rows against the FULL f32 g/q (type
    promotion), while the matrix form quantizes g to the buffers' dtype
    (g_h) before its projections to stay MXU-native. The two therefore
    differ slightly beyond the shared quantization of the stored pairs —
    an intentional trade (this form is the accuracy reference, that one
    the fast path), not a bug to chase during parity debugging; see
    tests/test_engine.py::test_lbfgs_state_dtype_bf16_direction_close_to_f32
    for the measured envelope."""
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
    # f32 accumulation for the gamma dots when the history is stored
    # bf16 (no-op for f32 buffers)
    sy = jnp.dot(state.s_hist[newest], state.y_hist[newest],
                 preferred_element_type=g.dtype)
    yy = jnp.dot(state.y_hist[newest], state.y_hist[newest],
                 preferred_element_type=g.dtype)
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


def _two_loop_direction_matrix(g: jax.Array, state: LbfgsState) -> jax.Array:
    """d = -H_k g via the matrix form of the two-loop recursion.

    Mathematically identical to the textbook recursion, reorganized for the
    MXU (the compact-representation idea of Byrd, Nocedal & Schnabel 1994):
    every contraction against the big (m, n) history buffers becomes one
    batched matmul, and the inherently sequential part of the recursion
    runs over m-sized scalars only.

      P = S [Yᵀ | g]  -> the m x m Gram S Yᵀ and u = S g   (one matmul)
      Q = Y [Yᵀ | g]  -> the m x m Gram Y Yᵀ and v = Y g   (one matmul)
      alpha recursion (newest->oldest):
        a_j = rho_j (u_j - sum_{i newer} a_i (S Yᵀ)[j,i])
      beta recursion (oldest->newest), using Yᵀ q = v - (Y Yᵀ) a:
        b_j = rho_j (gamma (v - B a)_j + sum_{i older processed} (a_i - b_i)
              (S Yᵀ)[i,j])
      r = gamma (g - aᵀ Y) + (a - b)ᵀ S                     (one matmul)

    Cost at m=100, n=4.7M: three ~(m, n) matmuls = ~9.5 GB of HBM traffic
    (~10 ms at the chip's streamed bandwidth) + an O(m^2) on-chip
    recurrence, vs 2m round-trip-latency-bound iterations for the loop
    form (measured 83.7 -> ~13 ms, scripts/exp_lbfgs1024.py). All
    contractions run at precision=HIGHEST to match the f32 vector dots of
    the loop form."""
    m = state.s_hist.shape[0]
    S, Y = state.s_hist, state.y_hist
    cnt = state.count
    k = jnp.minimum(cnt, m)
    dtype = g.dtype

    # age order: position 0 = newest stored pair
    ages = jnp.arange(m, dtype=jnp.int32)
    ix = jnp.mod(cnt - 1 - ages, m)            # age -> buffer index
    valid = (ages < k).astype(dtype)           # (m,)

    hi = jax.lax.Precision.HIGHEST
    # Gram matrices + projections of g. NO concatenation with the (m, n)
    # buffers: a concat materializes a fresh multi-GB copy of the history
    # (measured RESOURCE_EXHAUSTED at m=100, n=4.7M on a 16 GB chip);
    # separate contractions stream the buffers without copying them.
    # In the incremental mode (lbfgs_grams='incremental') the Grams are
    # carried in the state and refreshed one row+column per step
    # (_update_grams), skipping the 4·m²·n-FLOP recompute here.
    # With bf16-stored history (config.lbfgs_state_dtype) the non-buffer
    # operand is quantized to the buffers' dtype so the contraction runs
    # MXU-native bf16×bf16 (no f32 promotion re-materializing the
    # buffers) and accumulates in f32 via preferred_element_type; in the
    # f32 case astype/preferred_element_type are no-ops and the lowering
    # is bitwise the r3/r4 graph.
    acc = dict(precision=hi, preferred_element_type=dtype)
    g_h = g.astype(S.dtype)
    if state.sy_gram is not None:
        P, Q = state.sy_gram, state.yy_gram
    else:
        P = jnp.einsum("mn,kn->mk", S, Y, **acc)           # S Yᵀ
        Q = jnp.einsum("mn,kn->mk", Y, Y, **acc)           # Y Yᵀ
    A_sy = P[ix][:, ix]                        # (m, m) age-ordered S Yᵀ
    B_yy = Q[ix][:, ix]                        # (m, m) age-ordered Y Yᵀ
    u = jnp.einsum("mn,n->m", S, g_h, **acc)[ix] * valid   # s̃_jᵀ g
    v = jnp.einsum("mn,n->m", Y, g_h, **acc)[ix] * valid   # ỹ_jᵀ g
    rho_t = state.rho[ix] * valid

    # alpha recursion: a_j depends on strictly newer (smaller-age) a_i
    def alpha_body(j, a):
        aj = rho_t[j] * (u[j] - jnp.dot(A_sy[j] * (ages < j), a))
        return a.at[j].set(aj)

    alpha = lax.fori_loop(0, m, alpha_body, jnp.zeros((m,), dtype))

    # gamma = (s_newᵀ y_new) / (y_newᵀ y_new), diag entries of the Grams
    gamma = jnp.where(cnt > 0,
                      A_sy[0, 0] / jnp.maximum(B_yy[0, 0], 1e-20), 1.0)

    # beta recursion, oldest -> newest; ỹ_jᵀ q = (v - B a)_j
    yq = (v - jnp.einsum("mk,k->m", B_yy, alpha, precision=hi)) * valid

    def beta_body(i, b):
        j = m - 1 - i                          # age j from oldest to newest
        older = ages > j                       # already-processed entries
        bj = rho_t[j] * (gamma * yq[j]
                         + jnp.dot(A_sy[:, j] * older, alpha - b))
        return b.at[j].set(bj)

    beta = lax.fori_loop(0, m, beta_body, jnp.zeros((m,), dtype))

    # r = gamma (g - alphaᵀ Y) + (alpha - beta)ᵀ S; alpha/beta live in age
    # order — scatter the coefficients back to the buffers' storage order
    # (m-sized scatter; the (m, n) rows stay put, no concat/copy)
    coef_s = jnp.zeros((m,), dtype).at[ix].set((alpha - beta) * valid)
    coef_y = jnp.zeros((m,), dtype).at[ix].set(-gamma * alpha * valid)
    r = (gamma * g
         + jnp.einsum("m,mn->n", coef_s.astype(S.dtype), S, **acc)
         + jnp.einsum("m,mn->n", coef_y.astype(Y.dtype), Y, **acc))
    return -r


def _update_grams(sy_gram: jax.Array, yy_gram: jax.Array,
                  s_hist: jax.Array, y_hist: jax.Array,
                  s: jax.Array, y: jax.Array, ys: jax.Array,
                  idx: jax.Array, store: jax.Array
                  ) -> Tuple[jax.Array, jax.Array]:
    """Refresh row+column idx of the carried Grams P = S Yᵀ, Q = Y Yᵀ
    after the history update wrote s/y into row idx of the buffers.

    Three (m, n)·(n,) GEMVs (2·3·m·n FLOPs) replace the direction's full
    4·m²·n-FLOP Gram recompute; every entry remains an exact dot of the
    CURRENT buffer rows (entries are replaced, never accumulated, so
    there is no drift across steps), and untouched entries are bitwise
    unchanged. The diagonal entry P[idx, idx] is set to the step's own
    `ys` dot so gamma and rho read the identical value. Store-gated like
    the buffer update itself. precision=HIGHEST for the same reason as
    the direction's contractions (bf16 MXU truncation of f32 operands);
    with bf16-stored history (config.lbfgs_state_dtype) the fresh s/y
    operands are quantized to the buffers' dtype first (= exactly the
    values the buffer update stores, so every entry still equals a dot
    of the CURRENT buffer rows) and the contraction accumulates in f32
    via preferred_element_type — both no-ops in the f32 case.
    """
    hi = jax.lax.Precision.HIGHEST
    acc = dict(precision=hi, preferred_element_type=sy_gram.dtype)
    s_q, y_q = s.astype(s_hist.dtype), y.astype(y_hist.dtype)
    p_row = jnp.einsum("n,kn->k", s_q, y_hist, **acc)   # s · y_k
    p_col = jnp.einsum("mn,n->m", s_hist, y_q, **acc)   # s_m · y
    q_row = jnp.einsum("n,kn->k", y_q, y_hist, **acc)   # y · y_k
    new_p = sy_gram.at[idx, :].set(p_row).at[:, idx].set(p_col)
    new_p = new_p.at[idx, idx].set(ys)
    new_q = yy_gram.at[idx, :].set(q_row).at[:, idx].set(q_row)
    return (jnp.where(store, new_p, sy_gram),
            jnp.where(store, new_q, yy_gram))


def _two_loop_direction(g: jax.Array, state: LbfgsState,
                        impl: str = "matrix") -> jax.Array:
    """d = -H_k g over the circular history; impl selects the lowering
    ('matrix' = MXU-batched contractions, 'loop' = textbook recursion —
    identical math, see the per-impl docstrings)."""
    if impl == "loop":
        return _two_loop_direction_loop(g, state)
    if impl != "matrix":
        raise ValueError(f"unknown lbfgs direction impl {impl!r}; "
                         "expected 'matrix' or 'loop'")
    return _two_loop_direction_matrix(g, state)


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


class _SearchState(NamedTuple):
    """Unified bracket+zoom line-search state.

    The whole search runs as ONE lax.while_loop whose body contains the
    ONLY loss/grad evaluation site. The previous two-loop formulation
    (bracket while_loop + zoom while_loop + a standalone initial eval)
    inlined the full VGG-pyramid gradient graph three times, tripling
    XLA compile time of the default optimizer (~6-7 min for 2level512
    through the remote tunnel); a phase flag + masked updates keep the
    exact torch decision sequence with a single inlined gradient.
    """
    done: jax.Array
    phase: jax.Array    # 0 = bracketing, 1 = zooming
    t_pend: jax.Array   # next trial step to evaluate
    ls_iter: jax.Array
    n_evals: jax.Array
    # previous bracket-phase point
    t_prev: jax.Array
    f_prev: jax.Array
    gtd_prev: jax.Array
    g_prev: jax.Array
    # zoom bracket
    insuf: jax.Array    # insufficient-progress flag
    low: jax.Array      # index (0/1) of the lower-f bracket end
    b_t: jax.Array      # (2,)
    b_f: jax.Array      # (2,)
    b_gtd: jax.Array    # (2,)
    b_g: jax.Array      # (2, n)
    # result (valid when done)
    t_res: jax.Array
    f_res: jax.Array
    g_res: jax.Array


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
    n = x.shape[0]

    def eval_at(t):
        f, g = loss_grad(x + t * d)
        return f, g, jnp.dot(g, d)

    def armijo_fail(t, f):
        return f > f0 + _C1 * t * gtd0

    def curv_ok(gtd):
        return jnp.abs(gtd) <= -_C2 * gtd0

    init = _SearchState(
        done=jnp.bool_(False), phase=jnp.int32(0), t_pend=t_init,
        ls_iter=jnp.int32(0), n_evals=jnp.int32(0),
        t_prev=jnp.zeros_like(t_init), f_prev=f0, gtd_prev=gtd0, g_prev=g0,
        insuf=jnp.bool_(False), low=jnp.int32(0),
        b_t=jnp.zeros((2,), t_init.dtype), b_f=jnp.zeros((2,), f0.dtype),
        b_gtd=jnp.zeros((2,), f0.dtype), b_g=jnp.zeros((2, n), g0.dtype),
        t_res=jnp.zeros_like(t_init), f_res=f0, g_res=g0,
    )

    def body(s: _SearchState) -> _SearchState:
        t = s.t_pend
        f, g, gtd = eval_at(t)                       # the ONE eval site
        n_evals = s.n_evals + 1
        in_br = s.phase == 0
        in_zoom = s.phase == 1

        # ---- bracket incorporate (torch's top-of-loop checks) -----------
        # the eval that pushes ls_iter to max_iter is bracketed into
        # [0, t] without being condition-checked, exactly like torch's
        # bottom-of-loop eval + failed while re-check
        exhausted = in_br & (s.ls_iter >= max_iter)
        # torch's quirk: the f_prev re-bracket check only arms from the
        # third condition evaluation (ls_iter > 1)
        fail = armijo_fail(t, f) | ((s.ls_iter > 1) & (f >= s.f_prev))
        accept = curv_ok(gtd) & ~fail
        going_up = (gtd >= 0.0) & ~fail & ~accept
        checked = in_br & ~exhausted
        to_zoom = checked & (fail | going_up)
        br_accept = checked & accept
        extrap = checked & ~fail & ~accept & ~going_up

        # extrapolation trial, torch bounds [t + 0.01*(t - t_prev), 10*t]
        t_ext = _cubic_interpolate(s.t_prev, s.f_prev, s.gtd_prev,
                                   t, f, gtd,
                                   t + 0.01 * (t - s.t_prev), t * 10.0)

        # bracket built at the zoom transition: [prev point, current trial]
        nb_t = jnp.stack([s.t_prev, t])
        nb_f = jnp.stack([s.f_prev, f])
        nb_gtd = jnp.stack([s.gtd_prev, gtd])
        nb_g = jnp.stack([s.g_prev, g])
        nb_low = jnp.where(nb_f[0] <= nb_f[1], jnp.int32(0), jnp.int32(1))

        # ---- zoom incorporate -------------------------------------------
        lo = s.low
        hi = 1 - lo
        zfail = armijo_fail(t, f) | (f >= s.b_f[lo])
        # fail: new point becomes the high end; relabel low by f
        ft_t = s.b_t.at[hi].set(t)
        ft_f = s.b_f.at[hi].set(f)
        ft_gtd = s.b_gtd.at[hi].set(gtd)
        ft_g = s.b_g.at[hi].set(g)
        low_fail = jnp.where(ft_f[0] <= ft_f[1], jnp.int32(0), jnp.int32(1))
        # success: maybe flip high<-low, then new point becomes low
        zsucc_done = curv_ok(gtd)
        flip = gtd * (s.b_t[hi] - s.b_t[lo]) >= 0.0
        el_t = jnp.where(flip, s.b_t.at[hi].set(s.b_t[lo]), s.b_t)
        el_f = jnp.where(flip, s.b_f.at[hi].set(s.b_f[lo]), s.b_f)
        el_gtd = jnp.where(flip, s.b_gtd.at[hi].set(s.b_gtd[lo]), s.b_gtd)
        el_g = jnp.where(flip, s.b_g.at[hi].set(s.b_g[lo]), s.b_g)
        zb_t = jnp.where(zfail, ft_t, el_t.at[lo].set(t))
        zb_f = jnp.where(zfail, ft_f, el_f.at[lo].set(f))
        zb_gtd = jnp.where(zfail, ft_gtd, el_gtd.at[lo].set(gtd))
        zb_g = jnp.where(zfail, ft_g, el_g.at[lo].set(g))
        zlow = jnp.where(zfail, low_fail, lo)
        zoom_success = in_zoom & ~zfail & zsucc_done

        # ---- merged post-incorporate bracket ----------------------------
        ub_t = jnp.where(to_zoom, nb_t, jnp.where(in_zoom, zb_t, s.b_t))
        ub_f = jnp.where(to_zoom, nb_f, jnp.where(in_zoom, zb_f, s.b_f))
        ub_gtd = jnp.where(to_zoom, nb_gtd,
                           jnp.where(in_zoom, zb_gtd, s.b_gtd))
        ub_g = jnp.where(to_zoom, nb_g, jnp.where(in_zoom, zb_g, s.b_g))
        ulow = jnp.where(to_zoom, nb_low, jnp.where(in_zoom, zlow, s.low))
        uls = s.ls_iter + (extrap | in_zoom).astype(jnp.int32)

        # ---- decide the next zoom trial (or stop) -----------------------
        zooming = (to_zoom | in_zoom) & ~zoom_success
        wide = jnp.abs(ub_t[1] - ub_t[0]) * d_norm >= _TOL_CHANGE
        zstop = zooming & ((~wide) | (uls >= max_iter))
        bmin = jnp.minimum(ub_t[0], ub_t[1])
        bmax = jnp.maximum(ub_t[0], ub_t[1])
        tz = _cubic_interpolate(ub_t[0], ub_f[0], ub_gtd[0],
                                ub_t[1], ub_f[1], ub_gtd[1], bmin, bmax)
        # torch's insufficient-progress guard: a trial within 10% of a
        # boundary is tolerated once, then nudged to boundary - eps
        eps = 0.1 * (bmax - bmin)
        close = jnp.minimum(bmax - tz, tz - bmin) < eps
        nudge = jnp.where(to_zoom, jnp.bool_(False), s.insuf) \
            | (tz >= bmax) | (tz <= bmin)
        tz = jnp.where(close & nudge,
                       jnp.where(jnp.abs(tz - bmax) < jnp.abs(tz - bmin),
                                 bmax - eps, bmin + eps), tz)
        insuf_next = close & ~nudge

        # ---- results ----------------------------------------------------
        zoom_done = zoom_success | zstop
        done = exhausted | br_accept | zoom_done
        # exhausted: lowest-f of the [0, t] bracket, like torch
        ex_zero = f0 <= f
        res_t = jnp.where(
            exhausted, jnp.where(ex_zero, jnp.zeros_like(t), t),
            jnp.where(br_accept, t,
                      jnp.where(zoom_done, ub_t[ulow], s.t_res)))
        res_f = jnp.where(exhausted, jnp.where(ex_zero, f0, f),
                          jnp.where(br_accept, f,
                                    jnp.where(zoom_done, ub_f[ulow],
                                              s.f_res)))
        res_g = jnp.where(exhausted, jnp.where(ex_zero, g0, g),
                          jnp.where(br_accept, g,
                                    jnp.where(zoom_done, ub_g[ulow],
                                              s.g_res)))

        return _SearchState(
            done=done,
            phase=jnp.where(to_zoom | in_zoom, jnp.int32(1), jnp.int32(0)),
            t_pend=jnp.where(extrap, t_ext, jnp.where(zooming, tz,
                                                      s.t_pend)),
            ls_iter=uls, n_evals=n_evals,
            t_prev=jnp.where(extrap, t, s.t_prev),
            f_prev=jnp.where(extrap, f, s.f_prev),
            gtd_prev=jnp.where(extrap, gtd, s.gtd_prev),
            g_prev=jnp.where(extrap, g, s.g_prev),
            insuf=jnp.where(zooming, insuf_next, jnp.bool_(False)),
            low=ulow, b_t=ub_t, b_f=ub_f, b_gtd=ub_gtd, b_g=ub_g,
            t_res=res_t, f_res=res_f, g_res=res_g,
        )

    out = lax.while_loop(lambda s: ~s.done, body, init)
    return out.t_res, out.f_res, out.g_res, out.n_evals


def lbfgs_step(loss_grad: LossGradFn, x: jax.Array, state: LbfgsState,
               lr: jax.Array, max_ls_steps: int = 25,
               direction_impl: str = "matrix", t_init: str = "lr"
               ) -> Tuple[jax.Array, LbfgsState]:
    """One L-BFGS iteration (direction + strong-Wolfe search + history update).

    x: flattened parameter vector. state.f/state.g must hold the loss and
    gradient at x (maintained across calls). Equivalent to one
    torch LBFGS(max_iter=1, strong_wolfe).step() of the reference.
    direction_impl: 'matrix' (MXU-batched two-loop, production) or 'loop'
    (textbook recursion) — identical math, see _two_loop_direction.
    t_init selects the line search's first trial step:
      'lr'   — torch parity: every search starts at lr (the reference's
               10.0 x 0.999-decay schedule), except torch's
               min(1, 1/|g|_1) scaling of the very first step.
      'unit' — quasi-Newton natural step: once a curvature pair is stored
               the gamma-scaled two-loop direction is well-scaled, so the
               first trial is t=1 (Nocedal & Wright's recommendation for
               quasi-Newton searches); before any pair exists it falls
               back to the 'lr' rule. Typically accepted immediately by
               the Wolfe conditions, cutting line-search evals on the
               eval-bound full-Wolfe path. Identical convergence theory —
               every accepted point still satisfies strong Wolfe — but a
               different trajectory than torch's.
    """
    m = state.s_hist.shape[0]
    g0 = state.g
    f0 = state.f

    d = _two_loop_direction(g0, state, impl=direction_impl)
    dphi0 = jnp.dot(g0, d)
    # torch parity: when the directional derivative is not meaningfully
    # negative, torch breaks BEFORE the line search (lbfgs.py `if gtd >
    # -tolerance_change: break`) and the whole step is a no-op — x, loss,
    # grad, and history all stay put (y would be 0, so even the next
    # step's history update self-skips; torch stays frozen from then on).
    # Substituting a steepest-descent step here would diverge from the
    # reference trajectory exactly in the near-converged regime.
    skip = dphi0 > -_TOL_CHANGE

    # initial trial step: torch scales the very first step by min(1, 1/|g|_1)
    g_l1 = jnp.sum(jnp.abs(g0))
    t0 = jnp.where(state.n_iter == 0,
                   lr * jnp.minimum(1.0, 1.0 / jnp.maximum(g_l1, 1e-20)),
                   lr)
    if t_init == "unit":
        # natural quasi-Newton trial once the direction is gamma-scaled;
        # history-less steps (count==0: steepest descent, unscaled) keep
        # the 'lr' rule above
        t0 = jnp.where(state.count > 0, jnp.ones_like(t0), t0)
    elif t_init != "lr":
        raise ValueError(f"unknown lbfgs t_init {t_init!r}; "
                         "expected 'lr' or 'unit'")

    t, f_new, g_new, ls_evals = _strong_wolfe(
        loss_grad, x, d, f0, g0, t0, max_iter=max_ls_steps)
    t = jnp.where(skip, jnp.zeros_like(t), t)
    f_new = jnp.where(skip, f0, f_new)
    g_new = jnp.where(skip, g0, g_new)
    ls_evals = jnp.where(skip, jnp.zeros_like(ls_evals), ls_evals)

    x_new = x + t * d
    s = t * d
    y = g_new - g0
    ys = jnp.dot(y, s)
    # torch's curvature guard for the history update (skip makes ys=0,
    # which the guard already rejects; & ~skip keeps the intent explicit)
    store = (ys > 1e-10) & ~skip

    idx = jnp.mod(state.count, m)
    # quantize once at store time when the history is kept in a narrower
    # dtype (config.lbfgs_state_dtype); a no-op astype for f32 buffers
    s_hist = jnp.where(store,
                       state.s_hist.at[idx].set(s.astype(state.s_hist.dtype)),
                       state.s_hist)
    y_hist = jnp.where(store,
                       state.y_hist.at[idx].set(y.astype(state.y_hist.dtype)),
                       state.y_hist)
    rho = jnp.where(store, state.rho.at[idx].set(1.0 / jnp.maximum(ys, 1e-20)),
                    state.rho)
    count = state.count + store.astype(jnp.int32)

    if state.sy_gram is not None:
        sy_gram, yy_gram = _update_grams(
            state.sy_gram, state.yy_gram, s_hist, y_hist, s, y, ys, idx,
            store)
    else:
        sy_gram = yy_gram = None

    new_state = LbfgsState(
        s_hist=s_hist, y_hist=y_hist, rho=rho, count=count,
        f=f_new, g=g_new, n_evals=state.n_evals + ls_evals,
        n_iter=state.n_iter + 1, sy_gram=sy_gram, yy_gram=yy_gram,
    )
    return x_new, new_state
