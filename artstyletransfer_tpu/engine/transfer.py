"""The style-transfer engine: jit-compiled pyramid-loss optimization.

Reference behavior being reproduced (architecture is new):
- one LossBuilder per pyramid level with precomputed targets (reference
  neural_style_transfer.py:141-147, :78-82)
- per step: build the optimizing-image pyramid by repeated bicubic /2
  downscale, accumulate per-level totals, backprop, optimizer step with
  lr *= 0.999 per iteration (reference neural_style_transfer.py:152-206)
- an async generator yielding (percent, image_float_rgb_hwc) as it goes
  (reference neural_style_transfer.py:229-372)

TPU-native design:
- The ENTIRE optimization step — L VGG19 forwards, Gram losses, TV,
  autodiff backward, pyramid downscale chain, and the Adam or
  strong-Wolfe L-BFGS update — is one XLA graph. Steps run in jitted
  chunks of `stream_every` iterations via lax.fori_loop with donated
  buffers: there are ZERO host round-trips per step, vs. the reference's
  full-image device->host copy every iteration (reference
  neural_style_transfer.py:207-208).
- Compiled executables are cached per (pyramid shape, config) so repeated
  jobs with the same shape bucket pay compilation once.
- Optional jax.checkpoint (remat) around each pyramid level's feature pass
  for 4-level/2K jobs where activations would exceed HBM.
"""

from __future__ import annotations

import asyncio
import os
from functools import partial
from typing import Any, Dict, Iterator, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import lax

from ..config import Config
from ..models.vgg19 import (CONTENT_INDEX, STYLE_INDICES, _PRECISIONS,
                            extract_features)
from ..models.weights import load_vgg19_params
from ..ops.gram import gram_matrix
from ..ops.losses import level_loss
from ..ops.resize import downscale2x
from ..utils.image import prepare_img, unprepare_img
from . import lbfgs as lbfgs_mod
from .init_pipeline import build_init_image
from .pyramid import build_input_pyramids


class ContentStylePair:
    """Pairs content image - style image (reference neural_style_transfer.py:32-36)."""

    def __init__(self, content, style):
        self.content = content  # (content_img_name, content_img)
        self.style = style      # (style_img_name, style_img)


# --------------------------------------------------------------------------
# Loss graph
# --------------------------------------------------------------------------


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:
        return False


def _raise_nonfinite(f: float, done: int, cfg: Config) -> None:
    """One message for every single-job non-finite-loss guard site."""
    raise FloatingPointError(
        f"non-finite loss {f} at step {done} (optimizer={cfg.optimizer}, "
        f"lr_start={cfg.lr_start}); the TPU analogue of the reference's "
        f"autograd-anomaly guard tripped")


def _make_pyramid_loss(level_shapes: List[Tuple[int, int, int, int]],
                       cfg: Config, space_mesh=None):
    """Returns loss_fn(params, targets, x_flat) -> (total, LevelLoss list).

    targets: tuple per level of (content_tap, tuple(grams)).
    x_flat: flattened top-level preprocessed image.

    space_mesh: a Mesh with a 'space' axis — the image at EVERY pyramid
    level is then explicitly constrained to shard its H dimension over
    'space'. Without the constraints only level 0 partitions: the bicubic
    downscale between levels contracts the sharded H axis (a matmul), so
    GSPMD all-reduces it and every lower level comes out REPLICATED,
    wasting the memory the space axis exists to save (measured by
    scripts/space_memory.py: per-device temp ratio 0.82 unconstrained vs
    ~1/space constrained at a 2K/4-level shape). The constrained builds
    are cached separately (_config_key gains the mesh entry).
    """
    top_shape = level_shapes[0]

    def constrain(t):
        # (1, h, w, 3) per-job image -> h sharded over 'space'. Under the
        # batched runners' vmap(spmd_axis_name='jobs') the leading batch
        # dim is prefixed automatically.
        if space_mesh is None:
            return t
        n_space = space_mesh.shape["space"]
        if t.shape[1] % n_space != 0:
            return t
        from jax.sharding import NamedSharding, PartitionSpec as P

        return jax.lax.with_sharding_constraint(
            t, NamedSharding(space_mesh, P(None, "space", None, None)))

    # one Precision for every MXU contraction in the graph (convs, Grams,
    # style backward, pyramid resizes): at 'highest' a user gets true f32
    # everywhere, not just in the convs (the MXU truncates f32 operands to
    # bf16 passes at DEFAULT — the CLAUDE.md r3 GEMV lesson generalized)
    mxu_precision = _PRECISIONS[cfg.conv_precision]

    def loss_fn(params, targets, x_flat):
        img = constrain(x_flat.reshape(top_shape))
        total = jnp.float32(0.0)
        metrics = []
        cur = img
        for lvl in range(len(level_shapes)):
            if lvl > 0:
                cur = constrain(downscale2x(cur, precision=mxu_precision))

            def level_pass(params, cur, lvl=lvl):
                feats = extract_features(params, cur, cfg.compute_dtype,
                                          cfg.conv_precision,
                                          use_relu=cfg.use_relu,
                                          pool_impl=cfg.pool_impl)
                t_content, t_grams = targets[lvl]
                return level_loss(
                    feats, t_content, t_grams, cur,
                    cfg.content_weight, cfg.style_weight, cfg.tv_weight,
                    CONTENT_INDEX, STYLE_INDICES,
                    use_pallas=cfg.use_pallas and _on_tpu(),
                    fused_style_bwd=cfg.fused_style_bwd,
                    precision=mxu_precision)

            if cfg.remat_levels:
                level_pass = jax.checkpoint(level_pass)
            ll = level_pass(params, cur)
            # accumulate level totals (previous_loss_importance = 1.0,
            # reference neural_style_transfer.py:180-186)
            total = total + ll.total
            metrics.append(ll)
        return total, metrics

    return loss_fn


def _compute_targets(params, content_levels_pre: List[jax.Array],
                     style_levels_pre: List[jax.Array], cfg: Config):
    """Per-level target content tap + style Grams (reference
    neural_style_transfer.py:78-82)."""
    targets = []
    for c_img, s_img in zip(content_levels_pre, style_levels_pre):
        c_feats = extract_features(params, c_img, cfg.compute_dtype,
                                   cfg.conv_precision,
                                   use_relu=cfg.use_relu,
                                   pool_impl=cfg.pool_impl)
        s_feats = extract_features(params, s_img, cfg.compute_dtype,
                                   cfg.conv_precision,
                                   use_relu=cfg.use_relu,
                                   pool_impl=cfg.pool_impl)
        # targets are computed once and kept f32 regardless of compute dtype
        t_content = c_feats[CONTENT_INDEX].astype(jnp.float32)
        t_grams = tuple(
            gram_matrix(s_feats[i],
                        precision=_PRECISIONS[cfg.conv_precision])
            for i in STYLE_INDICES)
        targets.append((t_content, t_grams))
    return tuple(targets)


# --------------------------------------------------------------------------
# Compiled chunk runners (cached per shape+config)
# --------------------------------------------------------------------------

from ..utils.cache import BoundedCache

# LRU-bounded (ASTT_RUNNER_CACHE_SIZE, default 32): unbounded growth
# accretes hundreds of live XLA executables in long-lived processes (the
# test suite tripped an XLA-CPU segfault at that scale — see
# utils/cache.BoundedCache)
_COMPILE_CACHE = BoundedCache()


class Runners(NamedTuple):
    """Compiled (and raw, for vmapping) step functions for one shape bucket."""

    init: Any
    chunk: Any
    metrics: Any
    targets: Any
    raw_init: Any
    raw_chunk: Any
    raw_metrics: Any
    raw_targets: Any


def _config_key(cfg: Config, level_shapes, space_mesh=None) -> tuple:
    return (tuple(level_shapes), cfg.content_weight, cfg.style_weight,
            cfg.tv_weight, cfg.optimizer, cfg.compute_dtype,
            cfg.conv_precision, cfg.use_relu,
            cfg.stream_every, cfg.lr_start, cfg.lr_decay,
            cfg.lr_decay_per_eval,
            cfg.lbfgs_history, cfg.lbfgs_max_ls_steps, cfg.lbfgs_direction,
            cfg.lbfgs_t_init, cfg.lbfgs_grams, cfg.lbfgs_state_dtype,
            cfg.remat_levels,
            cfg.pool_impl, cfg.use_pallas and _on_tpu(),
            cfg.fused_style_bwd,
            None if space_mesh is None else space_mesh)


def lbfgs_history_gb(cfg: Config, level_shapes, batch: int = 1,
                     space: int = 1) -> float:
    """PER-DEVICE HBM the L-BFGS s/y history buffers need, in GB.
    `space` = size of the mesh's space axis the pixel dim is sharded
    over (the history rows shard with it — proven per-device by
    scripts/space_memory.py). Respects cfg.lbfgs_state_dtype (bf16
    storage halves the footprint)."""
    n_pixels = int(np.prod(level_shapes[0]))
    bytes_per = 2 if cfg.lbfgs_state_dtype == "bfloat16" else 4
    return (2 * cfg.lbfgs_history * n_pixels * bytes_per * batch
            / space / 1e9)


def warn_lbfgs_hbm(cfg: Config, level_shapes, batch: int = 1,
                   space: int = 1) -> bool:
    """Print a stderr warning when the (possibly batched/sharded) L-BFGS
    history approaches a chip's HBM; returns whether it fired. One
    formula / threshold for the single-job and batched sites."""
    hist_gb = lbfgs_history_gb(cfg, level_shapes, batch, space)
    if hist_gb <= 8.0:
        return False
    import sys

    jobs = f"{batch} jobs x " if batch > 1 else ""
    shard = f" over {space} chips" if space > 1 else ""
    dt_hint = ("" if cfg.lbfgs_state_dtype == "bfloat16"
               else "--lbfgs-state-dtype bfloat16 (halves it), ")
    print(f"warning: L-BFGS history buffers need ~{hist_gb:.1f} GB per "
          f"device{shard} ({jobs}history={cfg.lbfgs_history}); consider "
          f"{dt_hint}--lbfgs-history 10, sharding the pixels over more "
          f"chips (astt-queue --space N), or a smaller batch/resolution",
          file=sys.stderr)
    return True


def _build_runners(cfg: Config, level_shapes, warn_hbm: bool = True,
                   space_mesh=None):
    """Build (init_fn, chunk_fn, metrics_fn) for one shape bucket.

    warn_hbm=False suppresses the per-job L-BFGS HBM warning (the batched
    builder emits its own batch-aggregate warning, which subsumes it).
    space_mesh: build the loss graph with explicit 'space'-axis sharding
    constraints (see _make_pyramid_loss) — used by the batched executor
    when shard_space is on; cached separately."""
    key = _config_key(cfg, level_shapes, space_mesh)
    if key in _COMPILE_CACHE:
        return _COMPILE_CACHE[key]

    loss_fn = _make_pyramid_loss(list(level_shapes), cfg,
                                 space_mesh=space_mesh)

    def scalar_loss(params, targets, x):
        total, _ = loss_fn(params, targets, x)
        return total

    loss_grad = jax.value_and_grad(scalar_loss, argnums=2)

    def lr_at(step):  # step is 0-based; reference decays BEFORE each use
        return cfg.lr_start * jnp.power(jnp.float32(cfg.lr_decay),
                                        step.astype(jnp.float32) + 1.0)

    if cfg.optimizer == "adam":
        # torch Adam defaults (reference neural_style_transfer.py:134)
        opt = optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)

        def init_fn(params, targets, x):
            return opt.init(x)

        def one_step(params, targets, x, opt_state, step):
            f, g = loss_grad(params, targets, x)
            updates, new_state = opt.update(g, opt_state)
            x = x - lr_at(step) * updates
            return x, new_state, f

    elif cfg.optimizer == "lbfgs":
        # torch-default history_size=100 needs 2 * history * n floats; warn
        # when that approaches the chip's HBM (e.g. 4-level/2K jobs) instead
        # of letting the allocator fail cryptically mid-run
        if warn_hbm:
            warn_lbfgs_hbm(cfg, level_shapes)

        if cfg.lbfgs_grams not in ("recompute", "incremental"):
            raise ValueError(f"unknown lbfgs_grams {cfg.lbfgs_grams!r}; "
                             "expected 'recompute' or 'incremental'")
        if cfg.lbfgs_state_dtype not in ("float32", "bfloat16"):
            raise ValueError(
                f"unknown lbfgs_state_dtype {cfg.lbfgs_state_dtype!r}; "
                "expected 'float32' or 'bfloat16'")
        state_dtype = (jnp.bfloat16 if cfg.lbfgs_state_dtype == "bfloat16"
                       else None)
        # Gram carrying only pays on the matrix direction (the loop form
        # never builds the Grams); 'incremental' with direction='loop'
        # would compute GEMV updates nothing reads.
        track_grams = (cfg.lbfgs_grams == "incremental"
                       and cfg.lbfgs_direction == "matrix")

        def init_fn(params, targets, x):
            lg = partial(loss_grad, params, targets)
            return lbfgs_mod.init_state(lg, x, cfg.lbfgs_history,
                                        track_grams=track_grams,
                                        state_dtype=state_dtype)

        def one_step(params, targets, x, opt_state, step):
            lg = partial(loss_grad, params, targets)
            if cfg.lr_decay_per_eval:
                # Reference semantics: the closure decays lr x0.999 on EVERY
                # invocation (reference neural_style_transfer.py:154-158) and
                # torch's strong-Wolfe calls it (1 top call + ls_evals) times
                # per step, while step() reads group['lr'] before its own top
                # call. Closure calls before step k's read =
                # (k-1 top calls) + (line-search evals so far); our
                # init_state eval stands in for step 1's top call, so the
                # exponent is step + (n_evals - 1).
                expo = (opt_state.n_evals.astype(jnp.float32)
                        + step.astype(jnp.float32) - 1.0)
                lr = cfg.lr_start * jnp.power(jnp.float32(cfg.lr_decay), expo)
            else:
                lr = lr_at(step)
            x, opt_state = lbfgs_mod.lbfgs_step(
                lg, x, opt_state, lr,
                max_ls_steps=cfg.lbfgs_max_ls_steps,
                direction_impl=cfg.lbfgs_direction,
                t_init=cfg.lbfgs_t_init)
            return x, opt_state, opt_state.f

    else:
        raise RuntimeError("Unknown optimizer")  # reference parity (:138)

    def chunk_fn(params, targets, x, opt_state, start_step, n_steps):
        # n_steps is STATIC (one executable per chunk size): a dynamic
        # trip count was measured on v5e-1 at -5% step rate and 7.7x
        # compile time (12.55 vs 13.16 steps/s, 270 vs 35 s) — XLA loses
        # its known-trip-count loop optimizations
        def body(i, carry):
            x, opt_state, _ = carry
            x, opt_state, f = one_step(params, targets, x, opt_state,
                                       start_step + i)
            return x, opt_state, f
        return lax.fori_loop(0, n_steps, body,
                             (x, opt_state, jnp.float32(0.0)))

    def metrics_fn(params, targets, x):
        total, per_level = loss_fn(params, targets, x)
        return total, [(l.total, l.content, l.style, l.tv) for l in per_level]

    targets_fn = partial(_compute_targets, cfg=cfg)
    runners = Runners(
        init=jax.jit(init_fn),
        chunk=jax.jit(chunk_fn, static_argnums=(5,), donate_argnums=(2, 3)),
        metrics=jax.jit(metrics_fn),
        targets=jax.jit(targets_fn),
        raw_init=init_fn,
        raw_chunk=chunk_fn,
        raw_metrics=metrics_fn,
        raw_targets=targets_fn,
    )
    _COMPILE_CACHE[key] = runners
    return runners


# --------------------------------------------------------------------------
# Job API
# --------------------------------------------------------------------------


class TransferJob:
    """A compiled style-transfer job for one content/style pair."""

    def __init__(self, content: np.ndarray, style: np.ndarray, cfg: Config,
                 params=None, init_override: Optional[np.ndarray] = None):
        self.cfg = cfg
        self.params = params if params is not None else load_vgg19_params(
            seed=cfg.seed)
        if cfg.model != "vgg19":
            raise ValueError(f"{cfg.model} not supported.")

        content_levels, style_levels = build_input_pyramids(
            content, style, cfg.levels_num, cfg.base_diameter)
        self.level_shapes = [tuple(prepare_img(c).shape)
                             for c in content_levels]

        c_pre = [jnp.asarray(prepare_img(c)) for c in content_levels]
        s_pre = [jnp.asarray(prepare_img(s)) for s in style_levels]

        runners = _build_runners(cfg, tuple(self.level_shapes))
        self._init_fn = runners.init
        self._chunk_fn = runners.chunk
        self._metrics_fn = runners.metrics
        self.targets = runners.targets(self.params, c_pre, s_pre)

        self.last_level_losses = None  # set by run(report_level_losses=True)
        if init_override is not None:
            init_img = init_override
            self.init_name = "override"
        else:
            init_img, self.init_name = build_init_image(
                cfg.init_method, content, style, cfg,
                rng=np.random.default_rng(cfg.seed))
        self._x0 = jnp.asarray(prepare_img(init_img).reshape(-1))

    def run(self, iters_num: Optional[int] = None,
            stream_every: Optional[int] = None,
            checkpoint_path: Optional[str] = None,
            checkpoint_every: Optional[int] = None,
            resume: bool = False,
            yield_images: bool = True,
            report_level_losses: bool = False,
            ) -> Iterator[Tuple[int, np.ndarray, float]]:
        """Run the optimization; yields (steps_done, image_hwc_rgb, loss).

        iters_num counts OPTIMIZER STEPS (one compiled graph execution per
        step). The reference counts closure evaluations instead (reference
        neural_style_transfer.py:198,205) — identical for Adam, but its
        L-BFGS settings consume 2 evaluations per step, so a reference
        iters_num=500 L-BFGS run equals 250 steps here; use
        config.reference_equivalent_steps to reproduce a reference budget.

        The image is un-preprocessed ([0,1]-domain, unclipped) like the
        reference's unprepare_img (reference neural_style_transfer.py:386-393).

        checkpoint_path/checkpoint_every persist the full optimization state
        every k steps; resume=True restarts from checkpoint_path if present
        (the reference has no persistence at all — SURVEY §5).

        yield_images=False skips the device->host image fetch on
        intermediate chunks (the final chunk always carries the image):
        one D2H image copy per chunk is the entire host-side cost of
        progress streaming, so latency-critical callers can trade preview
        frames for throughput. When images ARE streamed,
        config.pipeline_streaming (default on) dispatches each next chunk
        before materializing the previous one, overlapping that fetch with
        device compute — same yielded values, same order.

        report_level_losses=True computes per-level (total, content, style,
        tv) components at every synced chunk boundary (one extra forward
        per chunk) and stores them in self.last_level_losses — the TPU
        analogue of the reference's per-iteration loss prints (reference
        neural_style_transfer.py:189).

        cfg.stop_tol > 0 ends the run early once the relative loss change
        over a chunk is <= stop_tol (the final yield then carries the
        image and a float loss like a normal completion, with steps_done
        < iters). The reference always runs its full budget — see
        config.stop_tol for why that burns ~9 no-progress line-search
        evals/step once a bf16 L-BFGS run converges.
        """
        from .checkpoint import load_checkpoint, save_checkpoint

        cfg = self.cfg
        iters = iters_num if iters_num is not None else cfg.iters_num
        chunk = stream_every if stream_every is not None else cfg.stream_every
        chunk = max(1, min(chunk, iters))
        # graph-config fingerprint stored in (and checked against) the
        # checkpoint: resuming under changed optimizer/dtype/shape flags
        # fails loudly instead of silently mixing numerics
        fp = str(_config_key(cfg, tuple(self.level_shapes)))

        # fresh copy: the chunk runner donates its image buffer, and _x0
        # must survive so the job can be re-run
        x = jnp.array(self._x0, copy=True)
        opt_state = None
        done = 0
        ck_extra: dict = {}
        if resume and checkpoint_path and os.path.exists(checkpoint_path):
            # abstract template: eval_shape gives the same pytree (shapes +
            # dtypes) with ZERO device work — running _init_fn here would
            # burn a full loss+gradient evaluation whose result is wholly
            # replaced by the checkpoint leaves
            template = jax.eval_shape(self._init_fn, self.params,
                                      self.targets, x)
            x_np, opt_state, done, ck_extra = load_checkpoint(
                checkpoint_path, template, fingerprint=fp, with_extra=True)
            x = jnp.asarray(x_np)
            if done >= iters or ck_extra.get("converged"):
                # completed by budget OR by a convergence early-stop —
                # either way the run is done; yield its final state
                # the checkpoint already holds a completed run — yield its
                # final state so callers always receive the result
                img = unprepare_img(
                    np.asarray(x).reshape(self.level_shapes[0]))
                total, per_level = self._metrics_fn(self.params,
                                                    self.targets, x)
                if report_level_losses:
                    self.last_level_losses = [
                        tuple(float(v) for v in lvl) for lvl in per_level]
                yield done, img, float(total)
                return
        if opt_state is None:
            opt_state = self._init_fn(self.params, self.targets, x)
        last_saved = done
        # Lookahead streaming (config.pipeline_streaming): dispatch chunk
        # k+1 BEFORE materializing chunk k's image, so the per-chunk D2H
        # fetch and the consumer's progress/report hooks overlap the next
        # chunk's device compute instead of stalling the chip. The chunk
        # runner donates its x buffer, so the handle kept for fetching is
        # an on-device copy (cheap: one HBM image copy per chunk). Yielded
        # values and their order are identical to the sequential path.
        # report_level_losses re-reads x AFTER the yield, which the next
        # dispatch would have donated — that diagnostics mode stays
        # sequential.
        # Convergence early-stop (cfg.stop_tol > 0): comparing losses
        # across chunks needs a per-chunk device sync, so the stop check
        # runs on the sequential path (lookahead off) — the sync it needs
        # is the same one lookahead exists to hide, and a run that stops
        # early more than repays one hidden fetch per chunk.
        check_stop = cfg.stop_tol > 0.0
        lookahead = (yield_images and cfg.pipeline_streaming
                     and not report_level_losses and not check_stop)
        pending = None  # (done, x_fetch, f) dispatched, not yet yielded
        # last synced loss for the stop check; restored from the
        # checkpoint so a resumed run makes the same chunk-k vs chunk-k+1
        # comparison the uninterrupted run would have made
        f_prev = ck_extra.get("f_prev")

        def stop_extra(converged):
            # host-side stop bookkeeping persisted with the device state
            return ({"f_prev": f_prev, "converged": converged}
                    if check_stop else None)

        def materialize(done_k, x_fetch, f_k):
            f_k = float(f_k)
            if cfg.nan_checks and not np.isfinite(f_k):
                _raise_nonfinite(f_k, done_k, cfg)
            img_k = unprepare_img(
                np.asarray(x_fetch).reshape(self.level_shapes[0]))
            return done_k, img_k, f_k

        while done < iters:
            k = min(chunk, iters - done)
            x, opt_state, f = self._chunk_fn(
                self.params, self.targets, x, opt_state,
                jnp.int32(done), int(k))
            done += k
            if lookahead:
                if (checkpoint_path and checkpoint_every
                        and (done - last_saved >= checkpoint_every
                             or done >= iters)):
                    # save_checkpoint materializes x (a device sync), so
                    # checkpoint-bearing chunks simply don't overlap
                    save_checkpoint(checkpoint_path, x, opt_state, done,
                                    fingerprint=fp)
                    last_saved = done
                # non-donated handle for the D2H fetch; the final chunk
                # needs no copy (nothing dispatches after it)
                x_fetch = x if done >= iters else jnp.copy(x)
                if pending is not None:
                    yield materialize(*pending)
                pending = (done, x_fetch, f)
                continue
            converged = False
            if check_stop:
                # the float() here is the per-chunk sync the stop check
                # pays for; relative threshold so one tolerance works
                # across loss scales (reference losses span 1e6-1e9)
                f = float(f)
                if cfg.nan_checks and not np.isfinite(f):
                    # the loss is on the host anyway and a NaN can never
                    # satisfy the convergence test — surface it now
                    # instead of burning the remaining budget
                    _raise_nonfinite(f, done, cfg)
                if (f_prev is not None
                        and abs(f_prev - f) <= cfg.stop_tol * max(1.0,
                                                                  abs(f))):
                    converged = True
                f_prev = f
            sync = yield_images or done >= iters or converged
            if sync:
                # the float() conversion is the device sync point; in
                # no-image mode intermediate chunks stay fully pipelined
                # (the loss is yielded as a lazy device scalar), so the
                # nan guard below fires opportunistically: every chunk
                # when streaming, only the final chunk when pipelined —
                # forcing a per-chunk fetch would serialize the chunk
                # pipeline the no-image mode exists to provide
                f = float(f)
                if cfg.nan_checks and not np.isfinite(f):
                    _raise_nonfinite(f, done, cfg)
            if (checkpoint_path and checkpoint_every
                    and (done - last_saved >= checkpoint_every
                         or done >= iters or converged)):
                save_checkpoint(checkpoint_path, x, opt_state, done,
                                fingerprint=fp, extra=stop_extra(converged))
                last_saved = done
            if sync:
                img = unprepare_img(
                    np.asarray(x).reshape(self.level_shapes[0]))
                if report_level_losses:
                    _total, per_level = self._metrics_fn(
                        self.params, self.targets, x)
                    self.last_level_losses = [
                        tuple(float(v) for v in lvl) for lvl in per_level]
            else:
                img = None
            yield done, img, f
            if converged:
                return
        if pending is not None:
            yield materialize(*pending)

    def initial_loss(self) -> float:
        """Total loss at the init image (before any optimization)."""
        total, _ = self._metrics_fn(self.params, self.targets, self._x0)
        return float(total)

    def loss_report(self, image_hwc: np.ndarray):
        """Per-level loss components of a [0,1]-domain image (diagnostics)."""
        x = jnp.asarray(prepare_img(image_hwc).reshape(-1))
        total, per_level = self._metrics_fn(self.params, self.targets, x)
        return float(total), [
            tuple(float(v) for v in lvl) for lvl in per_level]


# --------------------------------------------------------------------------
# Reference-parity async generator
# --------------------------------------------------------------------------


async def neural_style_transfer(content_n_style: ContentStylePair,
                                content_weight, style_weight, tv_weight,
                                optimizer, model, init_method,
                                iters_num, levels_num, noise_factor,
                                noise_levels, noise_levels_central_amplitude,
                                noise_levels_peripheral_amplitude,
                                noise_levels_dispersion,
                                params=None, stream_every: int = 10,
                                seed: int = 0, base_diameter: int = 256,
                                config: Optional[Config] = None,
                                stream_images: bool = True):
    """Async generator yielding (percent, image) — the reference engine API
    (reference neural_style_transfer.py:229-372).

    Heavy jitted chunks are dispatched via the default thread pool so the
    asyncio event loop stays responsive (the reference does the same for
    optimizer.step, reference neural_style_transfer.py:206).

    stream_images=False yields (percent, None) on intermediate chunks
    (the final chunk always carries the image) — the single-job twin of
    run_job_queue's knob: it skips the per-chunk device->host image fetch
    and keeps the chunk pipeline unsynced for headless/latency-bound
    callers.
    """
    cfg = config if config is not None else Config(
        content_weight=content_weight, style_weight=style_weight,
        tv_weight=tv_weight, optimizer=optimizer, model=model,
        init_method=init_method, iters_num=iters_num, levels_num=levels_num,
        noise_factor=noise_factor, noise_levels=tuple(noise_levels),
        noise_levels_central_amplitude=tuple(noise_levels_central_amplitude),
        noise_levels_peripheral_amplitude=tuple(noise_levels_peripheral_amplitude),
        noise_levels_dispersion=tuple(noise_levels_dispersion),
        stream_every=stream_every, seed=seed, base_diameter=base_diameter,
    )
    loop = asyncio.get_running_loop()

    job = await loop.run_in_executor(
        None, lambda: TransferJob(content_n_style.content[1],
                                  content_n_style.style[1], cfg, params))

    it = job.run(yield_images=stream_images)

    def next_chunk():
        try:
            return next(it)
        except StopIteration:
            return None

    last_percent, last_img = 0.0, None
    while True:
        res = await loop.run_in_executor(None, next_chunk)
        if res is None:
            break
        done, img, _f = res
        percent = done / cfg.iters_num * 100.0
        last_percent, last_img = percent, img
        yield percent, img
    if cfg.stop_tol > 0.0 and last_percent < 100.0 and last_img is not None:
        # convergence early-stop ended the run below the full budget; the
        # job is COMPLETE, and every consumer (Executor.wait, the lab's
        # result page, the bot's "Done!") keys completion on percent >=
        # 100 — re-emit the final image at 100%
        yield 100.0, last_img
