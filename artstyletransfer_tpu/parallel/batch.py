"""Batched multi-job style transfer over a TPU device mesh.

The reference's throughput model is "N independent jobs, at most 2 at a time
on one GPU" (reference config.py:1, task_executor.py:9,30). The TPU-native
upgrade: same-shape jobs are STACKED into one batch, the whole optimization
step is vmapped over the job axis, and the batch is sharded across a device
mesh — `jobs` axis for job data-parallelism, optional `space` axis sharding
each job's flattened pixel vector so very large jobs spread across chips'
HBM. There is no inter-job communication; per-job reductions (loss dots,
Gram contractions) cross the `space` axis only, and XLA inserts the psums
over ICI automatically from the input shardings.

Shape bucketing: a batch requires identical content shapes and identical
style shapes across jobs. `bucket_jobs` groups an arbitrary job queue into
such buckets (aspect-ratio buckets recompile once each and then stream).
"""

from __future__ import annotations

from collections import defaultdict
from typing import Any, Dict, Iterator, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import Config
from ..engine.transfer import (_build_runners, _config_key,
                               lbfgs_history_gb, warn_lbfgs_hbm)
from ..engine.init_pipeline import build_init_image
from ..engine.pyramid import build_input_pyramids, level_shape
from ..models.weights import load_vgg19_params
from ..utils.image import prepare_img, unprepare_img

from ..utils.cache import BoundedCache

# LRU-bounded like engine/transfer._COMPILE_CACHE (see utils/cache)
_BATCH_CACHE = BoundedCache()


def _raise_nonfinite_batch(bad, done, real_batch, cfg) -> None:
    """One message for every batched non-finite-loss guard site."""
    raise FloatingPointError(
        f"non-finite loss at step {done} for batch element(s) {bad} of "
        f"{real_batch} (optimizer={cfg.optimizer}, "
        f"lr_start={cfg.lr_start})")


@jax.jit
def _gather_rows(tree, idx):
    """Gather rows idx from the leading (batch) axis of every leaf, as ONE
    executable. Convergence shrinking re-forms (x, f, opt_state, targets)
    at a smaller batch; done leaf-by-leaf outside jit that is ~23 separate
    op dispatches — each paying the remote tunnel's per-dispatch/compile
    latency (~75s measured for one 4→2 shrink at 2level512/history=100,
    PARITY.md). One jitted call fuses them: one dispatch, one executable
    per (structure, old→new shape) pair."""
    return jax.tree_util.tree_map(lambda leaf: leaf[idx], tree)


def shrink_target(n_still: int, jobs_axis: int = 1) -> int:
    """The batch size convergence shrinking re-forms `n_still` live jobs
    at: the next power of two (the serving warmup's padded-size ladder),
    rounded up to a jobs-axis multiple so a mesh-sharded batch stays
    evenly divisible across the 'jobs' axis."""
    tgt = 1 << (n_still - 1).bit_length()
    return -(-tgt // jobs_axis) * jobs_axis


def shrink_ladder(size: int, jobs_axis: int = 1) -> List[int]:
    """Every batch size reachable from `size` by convergence shrinking
    (ascending) — exactly the sizes whose gather/chunk executables a
    warmup must cover. Derived from shrink_target so the run() dispatch
    rule and the warmed ladder cannot desynchronize."""
    return sorted({t for t in (shrink_target(n, jobs_axis)
                               for n in range(1, size))
                   if t < size})

# Gate for the fully-constrained space-sharded graph: the LOWEST pyramid
# level's shortest side must be >= 32 * space. Below it, two observed
# failure modes (round 4, CPU virtual mesh):
# - taps whose H collapses to 1 trigger GSPMD "involuntary full
#   rematerialization" warnings (16px dryrun);
# - a genuine partitioner MISCOMPUTE at degenerate tap shardings: with the
#   lowest level at 32px on a 2-way space axis, relu5_1 (2x2 spatial,
#   sharded 2-way) summed exactly 16x too large in the value_and_grad
#   graph while the forward-only graph was correct. The gate excludes
#   every shape that measured wrong and keeps the production target
#   (4level2k, lowest level 256px, space=8 -> 256 >= 256) which measures
#   CORRECT; tests/test_round4_fixes.py pins both sides.
MIN_LOWEST_LEVEL_PER_SHARD = 32


def constrained_space_ok(level_shapes, n_space: int) -> bool:
    """Whether the constrained sharded graph (per-level sharding
    constraints + reshape pool) is safe/worthwhile at these shapes."""
    lowest = level_shapes[-1]
    return (n_space > 1
            and min(lowest[1], lowest[2])
            >= MIN_LOWEST_LEVEL_PER_SHARD * n_space)


def _build_batched_runners(cfg: Config, level_shapes: tuple,
                           warn_hbm: bool = True, space_mesh=None):
    """vmapped (init_fn, chunk_fn) over the leading job axis.

    space_mesh: build the per-job loss graph with explicit 'space'
    sharding constraints (every pyramid level's H dim stays sharded —
    see transfer._make_pyramid_loss); the vmaps then carry
    spmd_axis_name='jobs' so the constraints compose with the job axis."""
    # derived from the single-job cache key so every graph-changing knob
    # (conv_precision, use_pallas, ...) is covered exactly once
    key = ("batched",) + _config_key(cfg, tuple(level_shapes), space_mesh)
    if key in _BATCH_CACHE:
        return _BATCH_CACHE[key]

    runners = _build_runners(cfg, tuple(level_shapes), warn_hbm=warn_hbm,
                             space_mesh=space_mesh)
    spmd = {} if space_mesh is None else {"spmd_axis_name": "jobs"}

    # vmap over (targets, x, opt_state); params and the step counter are
    # shared across jobs.
    def batched_init(params, targets, x):
        return jax.vmap(lambda t, xx: runners.raw_init(params, t, xx),
                        **spmd)(targets, x)

    def batched_chunk(params, targets, x, opt_state, start_step, n_steps):
        return jax.vmap(
            lambda t, xx, st: runners.raw_chunk(params, t, xx, st,
                                                start_step, n_steps),
            **spmd,
        )(targets, x, opt_state)

    def batched_chunk_steps(params, targets, x, opt_state, start_steps,
                            n_steps):
        # per-LANE start steps (an (B,) int32 vector): lanes at different
        # points of their budget share one dispatch — the primitive that
        # lets a live-serving newcomer join an in-flight batch at a chunk
        # boundary while every lane keeps its own lr-decay schedule
        # (lr_at/lr_decay_per_eval read the traced per-lane step). With a
        # uniform vector the per-lane math is the scalar variant's.
        return jax.vmap(
            lambda t, xx, st, ss: runners.raw_chunk(params, t, xx, st,
                                                    ss, n_steps),
            **spmd,
        )(targets, x, opt_state, start_steps)

    def batched_targets(params, c_levels, s_levels):
        return jax.vmap(lambda c, s: runners.raw_targets(params, c, s))(
            c_levels, s_levels)

    def batched_metrics(params, targets, x):
        def one(t, xx):
            total, _ = runners.raw_metrics(params, t, xx)
            return total
        return jax.vmap(one, **spmd)(targets, x)

    compiled = (jax.jit(batched_init),
                jax.jit(batched_chunk, static_argnums=(5,),
                        donate_argnums=(2, 3)),
                jax.jit(batched_targets),
                jax.jit(batched_metrics),
                jax.jit(batched_chunk_steps, static_argnums=(5,),
                        donate_argnums=(2, 3)))
    _BATCH_CACHE[key] = compiled
    return compiled


class BatchedTransferJob:
    """N same-shape style-transfer jobs as one sharded batch."""

    def __init__(self, contents: Sequence[np.ndarray],
                 styles: Sequence[np.ndarray], cfg: Config, params=None,
                 mesh: Optional[Mesh] = None,
                 shard_space: bool = False,
                 init_overrides: Optional[Sequence[np.ndarray]] = None,
                 pad_batch_to: Optional[int] = None):
        assert len(contents) == len(styles) and contents
        self.cfg = cfg
        self.batch = len(contents)
        self.mesh = mesh
        self.params = params if params is not None else load_vgg19_params(
            seed=cfg.seed)
        if cfg.model != "vgg19":
            raise ValueError(f"{cfg.model} not supported.")

        c0 = contents[0].shape
        s0 = styles[0].shape
        for c, s in zip(contents, styles):
            if c.shape != c0 or s.shape != s0:
                raise ValueError("all jobs in a batch must share shapes; "
                                 "use bucket_jobs() to group them")

        # Pad the batch to a multiple of the mesh's jobs axis by replicating
        # the last job; padded results are dropped in run().
        self.real_batch = self.batch
        contents = list(contents)
        styles = list(styles)
        init_overrides = list(init_overrides) if init_overrides else None
        if pad_batch_to is not None:
            # explicit size padding: XLA compiles one executable per batch
            # size (minutes each through a remote tunnel), so serving pads
            # rounds up to a small set of sizes (powers of two — see
            # run_job_queue pad_batches) instead of compiling every size a
            # coalescing window happens to produce
            while len(contents) < pad_batch_to:
                contents.append(contents[-1])
                styles.append(styles[-1])
                if init_overrides:
                    init_overrides.append(init_overrides[-1])
            self.batch = len(contents)
        if mesh is not None and "jobs" in mesh.axis_names:
            n_jobs_axis = mesh.shape["jobs"]
            while len(contents) % n_jobs_axis != 0:
                contents.append(contents[-1])
                styles.append(styles[-1])
                if init_overrides:
                    init_overrides.append(init_overrides[-1])
            self.batch = len(contents)

        # per-job pyramids, stacked along a new leading axis
        c_stack: List[List[np.ndarray]] = []
        s_stack: List[List[np.ndarray]] = []
        x0 = []
        for i, (c, s) in enumerate(zip(contents, styles)):
            c_lvls, s_lvls = build_input_pyramids(
                c, s, cfg.levels_num, cfg.base_diameter)
            c_stack.append([prepare_img(im) for im in c_lvls])
            s_stack.append([prepare_img(im) for im in s_lvls])
            if init_overrides is not None:
                init_img = init_overrides[i]
            else:
                init_img, _ = build_init_image(
                    cfg.init_method, c, s, cfg,
                    rng=np.random.default_rng(cfg.seed + i))
            x0.append(prepare_img(init_img).reshape(-1))

        self.level_shapes = [tuple(arr.shape) for arr in c_stack[0]]
        n_levels = len(self.level_shapes)
        c_batched = [np.stack([c_stack[b][l] for b in range(self.batch)])
                     for l in range(n_levels)]
        s_batched = [np.stack([s_stack[b][l] for b in range(self.batch)])
                     for l in range(n_levels)]
        x0 = np.stack(x0)  # (B, n)

        # space sharding engages only if the per-job pixel vector divides
        # the mesh's space axis; the pool swap must share that condition
        # (the slice pool is ~22% slower in-graph — don't pay it when the
        # batch ends up replicated anyway)
        use_space = (shard_space and mesh is not None
                     and "space" in mesh.axis_names
                     and x0.shape[1] % mesh.shape["space"] == 0)
        # The fully-constrained sharded graph (per-level sharding
        # constraints + reshape pool — engine/transfer._make_pyramid_loss)
        # engages only above the safety gate (see constrained_space_ok:
        # degenerate tap shardings below it produce partitioner warnings
        # AND one measured miscompute). Tiny jobs keep the legacy behavior
        # (inputs sharded, graph unconstrained) — space sharding exists
        # for jobs too BIG for one chip, not 16px dryruns.
        constrained = (use_space
                       and constrained_space_ok(self.level_shapes,
                                                mesh.shape["space"]))
        if constrained and cfg.pool_impl in ("reduce_window", "slices"):
            # reduce_window's select-and-scatter triggers SPMD involuntary
            # rematerialization fallbacks under space sharding, and a
            # stride-2 slice along the sharded H axis makes GSPMD
            # replicate everything after the first pool; the reshape pool
            # partitions cleanly (identical forward semantics)
            import dataclasses
            cfg = dataclasses.replace(cfg, pool_impl="reshape")
            self.cfg = cfg
        elif (not constrained and use_space and mesh.shape["space"] > 1
                and cfg.pool_impl == "reduce_window"):
            import dataclasses
            cfg = dataclasses.replace(cfg, pool_impl="slices")
            self.cfg = cfg

        if (mesh is not None and mesh.devices.size > 1
                and cfg.fused_style_bwd):
            # GSPMD MISPARTITIONS the vmapped fused style backward: vmap's
            # conv batching rule turns the per-job 1x1 backward conv
            # (ops/losses.py::_style_layer_bwd) into a feature-grouped
            # conv, and partitioning it with ANY input sharding — even
            # plain batch sharding on 'jobs' — returned a ~98.5%-wrong
            # style gradient (r5 minimal reproducer; finite differences
            # side with the unsharded graph, and the divergence does not
            # decay with tap size, so it is not the degenerate-tap class
            # the constrained_space_ok gate fences). Autodiff's generated
            # backward partitions exactly (rel 1e-8), so multi-device
            # batched graphs fall back to it; the fused path (a
            # single-chip MXU layout optimization, -23% step time at
            # 1024px) stays on for single-device runs, where it is pinned
            # exact by tests/test_ops.py.
            import dataclasses
            cfg = dataclasses.replace(cfg, fused_style_bwd=False)
            self.cfg = cfg

        self._use_space = use_space
        n_space = (mesh.shape["space"] if use_space else 1)
        batch_warning = cfg.optimizer == "lbfgs" and (self.batch > 1
                                                      or n_space > 1)
        if batch_warning:
            # the single-job warning in _build_runners only sees one job's
            # un-sharded history; surface the batch-aggregate PER-DEVICE
            # requirement instead (it subsumes the per-job figure, and
            # space sharding divides it — proven per-device by
            # scripts/space_memory.py), and suppress the per-job one so a
            # single condition prints a single warning
            warn_lbfgs_hbm(cfg, self.level_shapes, batch=self.batch,
                           space=n_space)

        space_mesh = mesh if constrained else None
        (jit_init, jit_chunk, jit_targets, jit_metrics,
         jit_chunk_steps) = _build_batched_runners(
            cfg, tuple(self.level_shapes), warn_hbm=not batch_warning,
            space_mesh=space_mesh)
        self._init_fn, self._chunk_fn = jit_init, jit_chunk
        self._metrics_fn = jit_metrics
        self._chunk_steps_fn = jit_chunk_steps  # live-serving joins

        # Place data on the mesh; shardings then propagate through every
        # jitted computation (params replicated, batch on 'jobs', pixels
        # optionally on 'space').
        if mesh is not None:
            job_axes = P("jobs")
            x_axes = P("jobs", "space" if use_space else None)
            self.params = jax.device_put(
                self.params, NamedSharding(mesh, P()))
            c_batched = [jax.device_put(a, NamedSharding(mesh, job_axes))
                         for a in c_batched]
            s_batched = [jax.device_put(a, NamedSharding(mesh, job_axes))
                         for a in s_batched]
            x0 = jax.device_put(x0, NamedSharding(mesh, x_axes))

        self.targets = jit_targets(self.params, c_batched, s_batched)
        self._x0 = jnp.asarray(x0)

    def warm_shrink_gathers(self) -> int:
        """Precompile the fused `_gather_rows` executable for every
        (this batch → smaller ladder size) pair convergence shrinking
        can dispatch (run()'s shrink gate permitting); returns how many
        were compiled. Pure AOT lower+compile on abstract shapes — zero
        device work, and it feeds the same dispatch cache the live jit
        call hits (measured: first real call ~3 ms after an AOT warm).
        On a multi-device mesh the executable is keyed on the input
        SHARDINGS too, so the warm attaches the shardings the live gather
        sees — the CHUNK's output shardings, since run() only ever
        gathers chunk outputs. GSPMD's propagation rule for them is
        stable and verified against live chunk dispatches (Adam on a
        jobs mesh, L-BFGS on a jobs×space mesh): leading batch axis on
        'jobs', the pixel axis on 'space' iff space sharding engaged,
        trailing None components stripped (XLA's normalized form);
        targets keep their placement shardings (they are non-donated
        inputs, so run() gathers self.targets itself) and sel is
        replicated, matching run()'s device_put. Without the warm, a
        live serving batch stalls on `_gather_rows`' cold compile at its
        FIRST shrink (~20s through a remote tunnel) — the exact
        mid-serve stall warmup exists to prevent."""
        if not (self.cfg.stop_tol > 0.0 and self.cfg.stop_shrink
                and self.batch > 1):
            return 0
        multi = self.mesh is not None and self.mesh.devices.size > 1
        jobs_axis = (dict(self.mesh.shape).get("jobs", 1)
                     if self.mesh is not None else 1)
        n_pix = self._x0.shape[-1]

        def chunk_out_sharding(shape):
            parts = ["jobs"] + [None] * (len(shape) - 1)
            if self._use_space and len(shape) >= 2 and shape[-1] == n_pix:
                parts[-1] = "space"
            while parts and parts[-1] is None:
                parts.pop()
            return NamedSharding(self.mesh, P(*parts))

        def sds(a):
            if multi:
                return jax.ShapeDtypeStruct(
                    a.shape, a.dtype, sharding=chunk_out_sharding(a.shape))
            return jax.ShapeDtypeStruct(a.shape, a.dtype)

        x_sds = sds(self._x0)
        opt_sds = jax.tree_util.tree_map(
            sds, jax.eval_shape(self._init_fn, self.params, self.targets,
                                jax.ShapeDtypeStruct(self._x0.shape,
                                                     self._x0.dtype)))
        f_sds = sds(jax.ShapeDtypeStruct((self.batch,), jnp.float32))
        if multi:
            tgt_sds = jax.tree_util.tree_map(
                lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype,
                                               sharding=a.sharding),
                self.targets)
            sel_sharding = {"sharding": NamedSharding(self.mesh, P())}
        else:
            tgt_sds = jax.tree_util.tree_map(
                lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype),
                self.targets)
            sel_sharding = {}
        n = 0
        for t in shrink_ladder(self.batch, jobs_axis):
            sel_sds = jax.ShapeDtypeStruct((t,), jnp.int32, **sel_sharding)
            _gather_rows.lower((x_sds, f_sds, opt_sds, tgt_sds),
                               sel_sds).compile()
            n += 1
        return n

    def warm_live_chunk(self, n_steps: int) -> int:
        """AOT-compile the per-lane-step chunk variant at this batch size
        — the executable live serving (parallel/live.LiveBatchRunner)
        dispatches instead of run()'s scalar-step chunk. Zero device
        work (abstract lower+compile, like warm_shrink_gathers). On a
        multi-device mesh the live dispatch's input shardings may still
        differ from this warm's (the live path re-places state after
        transplants); single-device serving — the production chip — is
        exact."""
        x_sds = jax.ShapeDtypeStruct(self._x0.shape, self._x0.dtype)
        opt_sds = jax.eval_shape(self._init_fn, self.params, self.targets,
                                 x_sds)
        steps_sds = jax.ShapeDtypeStruct((self.batch,), jnp.int32)
        self._chunk_steps_fn.lower(self.params, self.targets, x_sds,
                                   opt_sds, steps_sds,
                                   int(n_steps)).compile()
        return 1

    def run(self, iters_num: Optional[int] = None,
            stream_every: Optional[int] = None,
            checkpoint_path: Optional[str] = None,
            checkpoint_every: Optional[int] = None,
            resume: bool = False,
            yield_images: bool = True,
            ) -> Iterator[Tuple[int, np.ndarray, np.ndarray]]:
        """Yields (steps_done, images (B,H,W,3) [0,1]-domain, losses (B,)).

        checkpoint_path persists the whole batch's state (all jobs resume
        together, bit-exactly) every checkpoint_every steps.
        yield_images=False pipelines intermediate chunks without any
        device->host traffic (images None, losses lazy device arrays); the
        final chunk always materializes.
        """
        import os

        from ..engine.checkpoint import (load_checkpoint,
                                         peek_checkpoint_meta,
                                         save_checkpoint)

        cfg = self.cfg
        iters = iters_num if iters_num is not None else cfg.iters_num
        chunk = stream_every if stream_every is not None else cfg.stream_every
        chunk = max(1, min(chunk, iters))
        # graph-config fingerprint (includes the CONSTRUCTION batch size —
        # stable across resumes even when convergence shrinking has since
        # reduced the in-file state, whose own size rides in the extra's
        # lane composition): resuming a queue checkpoint under changed
        # optimizer/dtype/batch flags fails loudly instead of silently
        # mixing states
        fp = str(("batched", self.batch)
                 + _config_key(cfg, tuple(self.level_shapes)))

        # fresh copy: the chunk runner donates its image buffer, and _x0
        # must survive so the batch can be re-run
        x = jnp.array(self._x0, copy=True)
        opt_state = None
        done = 0
        ck_extra: Dict[str, Any] = {}
        top = self.level_shapes[0]  # (1, H, W, 3) per job
        n_pix = self._x0.shape[-1]
        check_stop = cfg.stop_tol > 0.0
        shrink = check_stop and cfg.stop_shrink
        reshard = self.mesh is not None and self.mesh.devices.size > 1
        jobs_axis = (dict(self.mesh.shape).get("jobs", 1)
                     if self.mesh is not None else 1)
        # lane -> original job index; None = padding replica (initial
        # mesh/pad_batch_to padding, or re-padding after a shrink)
        lane_orig: List[Optional[int]] = (
            list(range(self.real_batch))
            + [None] * (self.batch - self.real_batch))
        # lane -> the original job whose TARGETS the lane carries (initial
        # padding replicates the last real job's inputs; shrink re-padding
        # replicates a surviving lane) — what a resume needs to re-gather
        # self.targets into a shrunken batch's lane order
        lane_src: List[int] = (
            list(range(self.real_batch))
            + [self.real_batch - 1] * (self.batch - self.real_batch))
        finished: Dict[int, Tuple[np.ndarray, float]] = {}  # orig -> row, loss
        f_prev: Dict[int, float] = {}  # orig -> last chunk's loss
        # convergence LATCHES per job: once a job's chunk change dips
        # under tol it is done, even if later chunks (it keeps optimizing
        # until it can actually leave the batch) oscillate back over tol
        # — otherwise a group with staggered convergence would need every
        # job to re-converge in the SAME chunk and could silently never
        # stop
        latched: set = set()
        targets = self.targets  # local: shrinking gathers it per-lane
        if resume and checkpoint_path and os.path.exists(checkpoint_path):
            # the checkpoint may hold a SHRUNKEN batch (stop_shrink); its
            # lane composition — hence the template's batch size — is only
            # known from the file, so peek the metadata first (lazy npz:
            # the big state arrays stay untouched)
            _pk_step, peek = peek_checkpoint_meta(checkpoint_path)
            if peek.get("lane_orig") is not None:
                lane_orig = [None if v is None else int(v)
                             for v in peek["lane_orig"]]
                lane_src = [int(v) for v in peek["lane_src"]]
            cur = len(lane_orig)
            # abstract template (zero device work) — see TransferJob.run
            tgt_tpl = jax.tree_util.tree_map(
                lambda a: jax.ShapeDtypeStruct((cur,) + a.shape[1:],
                                               a.dtype), self.targets)
            template = jax.eval_shape(
                self._init_fn, self.params, tgt_tpl,
                jax.ShapeDtypeStruct((cur, n_pix), self._x0.dtype))
            x_np, opt_state, done, ck_extra, ck_aux = load_checkpoint(
                checkpoint_path, template, fingerprint=fp,
                with_extra=True, with_aux=True)
            x = jnp.asarray(x_np)
            # stop bookkeeping, restored so a resumed stop_tol run makes
            # the same comparisons (and keeps its latches) the
            # uninterrupted run would have
            f_prev = {int(k): v
                      for k, v in ck_extra.get("f_prev", {}).items()}
            latched = set(ck_extra.get("latched", ()))
            # frozen results of jobs that already left the batch (sorted
            # orig order matches the aux row stacking in stop_aux)
            for i, (orig, loss) in enumerate(ck_extra.get("finished", [])):
                finished[int(orig)] = (
                    np.asarray(ck_aux["finished_rows"][i]), float(loss))
            if cur != self.batch:
                # re-gather the targets into the shrunken lane order (one
                # fused call; bitwise what the original run carried, since
                # self.targets is a deterministic recompute)
                targets = _gather_rows(
                    self.targets, jnp.asarray(lane_src, dtype=jnp.int32))
            if done >= iters or ck_extra.get("converged"):
                # completed checkpoint (by budget or by a convergence
                # early-stop) — yield its final state once, with real
                # per-job losses, composing frozen rows with live lanes
                # (mirrors the single-job resume path)
                lanes = {orig: lane for lane, orig in enumerate(lane_orig)
                         if orig is not None}
                rows = np.asarray(x).reshape((cur,) + top[1:])
                imgs = np.stack([
                    unprepare_img(finished[orig][0] if orig in finished
                                  else rows[lanes[orig]])
                    for orig in range(self.real_batch)])
                f_live = np.asarray(
                    self._metrics_fn(self.params, targets, x))
                losses = np.asarray(
                    [finished[orig][1] if orig in finished
                     else f_live[lanes[orig]]
                     for orig in range(self.real_batch)], dtype=np.float32)
                yield done, imgs, losses
                return
        if opt_state is None:
            opt_state = self._init_fn(self.params, targets, x)
        last_saved = done
        # Lookahead streaming, same contract as TransferJob.run: dispatch
        # chunk k+1 before materializing chunk k, so the whole batch's
        # image fetch + every job's progress hooks overlap the next
        # chunk's compute. x is donated by the next dispatch, so the
        # fetch handle is an on-device copy.
        # Convergence early-stop (cfg.stop_tol > 0): a job whose relative
        # loss change over a chunk is <= tol is DONE. With cfg.stop_shrink
        # a done job leaves the batch at the chunk boundary — its result
        # freezes there, exactly like a single-job stop — and the
        # remaining jobs re-form at the next power-of-two batch size
        # rounded up to a jobs-axis multiple (the serving warmup set; XLA
        # compiles one executable per size, the vmapped jit itself is
        # size-agnostic). On a multi-device mesh the gathered state is
        # re-placed with its pre-gather shardings so the shrunken batch
        # keeps riding the mesh. Checkpoints taken after a shrink persist
        # the lane composition + frozen rows (stop_extra/stop_aux), so a
        # crash mid-ladder resumes bit-exactly at the shrunken size (r4's
        # checkpoint-XOR-shrink exclusion is gone). Without shrinking the
        # whole group stops once EVERY job has converged at least once —
        # latched (the slowest lane gates — measured -10% wall vs -41%
        # for per-job scheduling at the 8-job serving shape, PARITY.md).
        # Needs a per-chunk loss fetch, so lookahead is off — same trade
        # as TransferJob.run.
        lookahead = yield_images and cfg.pipeline_streaming and not check_stop
        pending = None  # (done, x_fetch, f) dispatched, not yet yielded

        def stop_extra(converged):
            # JSON keys are strings; f_prev's int keys restore above
            if not check_stop:
                return None
            extra: Dict[str, Any] = {
                "f_prev": {str(k): v for k, v in f_prev.items()},
                "latched": sorted(latched), "converged": converged}
            if shrink:
                # lane composition so a resume can rebuild a shrunken
                # batch; frozen losses pair with stop_aux's rows by
                # sorted-orig position
                extra["lane_orig"] = lane_orig
                extra["lane_src"] = lane_src
                extra["finished"] = [[orig, float(loss)] for orig, (_r, loss)
                                     in sorted(finished.items())]
            return extra

        def stop_aux():
            if shrink and finished:
                return {"finished_rows": np.stack(
                    [row for _orig, (row, _l) in sorted(finished.items())])}
            return None

        def lane_of():
            # orig job index -> live lane, rebuilt per call (lane_orig
            # shrinks); dict lookup keeps compose/materialize O(B)
            return {orig: lane for lane, orig in enumerate(lane_orig)
                    if orig is not None}

        def compose_losses(f_np):
            # original-order (real_batch,) losses: live lanes from the
            # batch, dropped jobs from their frozen value
            lanes = lane_of()
            out = np.empty((self.real_batch,), dtype=np.float32)
            for orig in range(self.real_batch):
                if orig in finished:
                    out[orig] = finished[orig][1]
                else:
                    out[orig] = f_np[lanes[orig]]
            return out

        def materialize(done_k, x_fetch, f_k):
            rows = np.asarray(x_fetch).reshape((len(lane_orig),) + top[1:])
            f_np = np.asarray(f_k)
            lanes = lane_of()
            imgs_k = np.stack([
                unprepare_img(finished[orig][0] if orig in finished
                              else rows[lanes[orig]])
                for orig in range(self.real_batch)])
            losses_k = compose_losses(f_np)
            # same opportunistic guard as TransferJob.run: the losses
            # are already fetched here, so the check is free; it names
            # the offending jobs so a poisoned batch is diagnosable
            if cfg.nan_checks and not np.isfinite(losses_k).all():
                bad = np.flatnonzero(~np.isfinite(losses_k)).tolist()
                _raise_nonfinite_batch(bad, done_k, self.real_batch, cfg)
            return done_k, imgs_k, losses_k

        while done < iters:
            k = min(chunk, iters - done)
            x, opt_state, f = self._chunk_fn(
                self.params, targets, x, opt_state,
                jnp.int32(done), int(k))
            done += k
            converged = False
            f_np = None
            if check_stop:
                f_np = np.asarray(f)
                # early NaN surfacing: the losses are on the host anyway,
                # and a NaN can never satisfy the convergence test — do
                # not let a poisoned batch burn the remaining budget
                # before materialize()'s guard fires at the end
                if cfg.nan_checks:
                    bad = [orig for lane, orig in enumerate(lane_orig)
                           if orig is not None
                           and not np.isfinite(f_np[lane])]
                    if bad:
                        _raise_nonfinite_batch(bad, done, self.real_batch,
                                               cfg)
                ready = []   # (lane, orig, loss): latched, still in batch
                still = []   # lanes of real jobs not yet converged
                for lane, orig in enumerate(lane_orig):
                    if orig is None:
                        continue
                    cur = float(f_np[lane])
                    prev = f_prev.get(orig)
                    if (orig in latched
                            or (prev is not None
                                and abs(prev - cur)
                                <= cfg.stop_tol * max(1.0, abs(cur)))):
                        latched.add(orig)
                        ready.append((lane, orig, cur))
                    else:
                        still.append(lane)
                    f_prev[orig] = cur
                if ready and not still:
                    converged = True  # every remaining job is done
                elif ready and still and shrink and done < iters:
                    tgt = shrink_target(len(still), jobs_axis)
                    if tgt < len(lane_orig):
                        # freeze the converged jobs' results NOW (the next
                        # dispatch donates x), then gather the remaining
                        # lanes and re-pad to the power-of-two size
                        drop = np.asarray([ln for ln, _, _ in ready])
                        rows = np.asarray(x[drop]).reshape(
                            (len(ready),) + top[1:])
                        for r, (_ln, orig, cur) in enumerate(ready):
                            finished[orig] = (rows[r].copy(), cur)
                        sel = np.asarray(
                            still + [still[-1]] * (tgt - len(still)))
                        import sys
                        print(f"stop_tol: {len(ready)} job(s) converged "
                              f"at step {done}; batch {len(lane_orig)} -> "
                              f"{tgt}", file=sys.stderr)
                        # one fused gather for the whole carried state
                        # (f included: the yield below needs this chunk's
                        # loss vector lane-aligned with the shrunken batch)
                        sel_dev = jnp.asarray(sel, dtype=jnp.int32)
                        if reshard:
                            # pre-gather shardings, re-applied below: the
                            # ladder keeps tgt a jobs-axis multiple, so
                            # every spec divides the smaller batch; a
                            # replicated sel keeps the gather executable
                            # deterministic (= what the warmup compiled)
                            shards = jax.tree_util.tree_map(
                                lambda a: a.sharding,
                                (x, f, opt_state, targets))
                            sel_dev = jax.device_put(
                                sel_dev, NamedSharding(self.mesh, P()))
                        x, f, opt_state, targets = _gather_rows(
                            (x, f, opt_state, targets), sel_dev)
                        if reshard:
                            # the jit-chosen gather output shardings need
                            # not match what the next chunk's (warmed)
                            # executable expects — one device-to-device
                            # re-placement restores them
                            x, f, opt_state, targets = jax.device_put(
                                (x, f, opt_state, targets), shards)
                        f_np = f_np[sel]
                        lane_orig = ([lane_orig[ln] for ln in still]
                                     + [None] * (tgt - len(still)))
                        # padding lanes carry the replicated survivor's
                        # targets (sel pads with still[-1])
                        lane_src = [lane_src[ln] for ln in sel]
            if (checkpoint_path and checkpoint_every
                    and (done - last_saved >= checkpoint_every
                         or done >= iters or converged)):
                # materializes x (a device sync): checkpoint-bearing
                # chunks simply don't overlap. After a shrink the state
                # spans only the live lanes; the extra/aux carry the lane
                # composition and the frozen rows so resume rebuilds the
                # rest.
                save_checkpoint(checkpoint_path, x, opt_state, done,
                                fingerprint=fp, extra=stop_extra(converged),
                                aux=stop_aux())
                last_saved = done
            if lookahead:
                x_fetch = x if done >= iters else jnp.copy(x)
                if pending is not None:
                    yield materialize(*pending)
                pending = (done, x_fetch, f)
            elif yield_images or done >= iters or converged:
                yield materialize(done, x, f)
            elif f_np is not None:
                # check_stop already fetched the losses; recompose so
                # consumers keep original-order (real_batch,) losses
                # across shrinks
                yield done, None, compose_losses(f_np)
            else:
                yield done, None, f
            if converged:
                return
        if pending is not None:
            yield materialize(*pending)


def bucket_jobs(jobs: Sequence[Tuple[str, np.ndarray, np.ndarray]]
                ) -> Dict[tuple, List[Tuple[str, np.ndarray, np.ndarray]]]:
    """Group (task_id, content, style) jobs by (content.shape, style.shape)."""
    buckets: Dict[tuple, list] = defaultdict(list)
    for job in jobs:
        buckets[(job[1].shape, job[2].shape)].append(job)
    return dict(buckets)


# Canonical aspect ratios (w/h) for content bucketing in serving mode.
DEFAULT_ASPECT_BUCKETS = (1.0, 4 / 3, 3 / 4, 16 / 9, 9 / 16, 3 / 2, 2 / 3)


def bucket_content_shape(aspect: float, cfg: Config) -> tuple:
    """(h, w) of the canonical content shape for an aspect bucket (w/h):
    shortest side = base_diameter * 2^(levels-1).

    The single source of truth for bucket shapes: canonicalize_content
    resizes to it and engine.warmup precompiles it, so warmed and served
    shapes are equal by construction."""
    side = cfg.base_diameter * 2 ** (cfg.levels_num - 1)
    if aspect >= 1.0:
        return side, int(round(side * aspect))
    return int(round(side / aspect)), side


def crop_to_aspect_bucket(img: np.ndarray,
                          aspects: Sequence[float] = DEFAULT_ASPECT_BUCKETS
                          ) -> np.ndarray:
    """Center-crop an HWC image to the nearest canonical aspect ratio.

    Jobs whose contents land in the same aspect bucket produce identical
    pyramid shapes (level-0 shortest side is fixed), so an arbitrary
    serving queue collapses into at most len(aspects) compiled batch
    shapes. The crop loses at most the sliver between neighboring aspect
    buckets (<~12% of one dimension with the defaults).
    """
    h, w = img.shape[:2]
    target = min(aspects, key=lambda a: abs(a - w / h))
    if w / h > target:
        new_w = int(round(h * target))
        off = (w - new_w) // 2
        img = img[:, off:off + new_w]
    else:
        new_h = int(round(w / target))
        off = (h - new_h) // 2
        img = img[off:off + new_h, :]
    return np.ascontiguousarray(img)


def canonicalize_content(content: np.ndarray, cfg: Config) -> np.ndarray:
    """Center-crop to the nearest canonical aspect bucket and resize to that
    bucket's exact top-pyramid-level shape.

    Lossless for the pipeline (resolution above the top pyramid level is
    never used) and collapses arbitrary input shapes into at most
    len(DEFAULT_ASPECT_BUCKETS) compiled graph shapes — the difference
    between a 1-6 min XLA compile per request and a warm cache hit when
    serving (Telegram bot, lab queue)."""
    from ..ops.resize import bicubic_resize_np

    h, w = content.shape[:2]
    target = min(DEFAULT_ASPECT_BUCKETS, key=lambda a: abs(a - w / h))
    # pass the chosen bucket down so crop and resize can never disagree
    c = crop_to_aspect_bucket(content, aspects=(target,))
    # the target shape must come from the BUCKET's exact ratio, not the
    # cropped image's (integer-rounded) one: recomputing it from the crop
    # lands 1-5 px off the precompiled bucket shape for ~half of real
    # inputs, turning every such request into a fresh multi-minute compile
    th, tw = bucket_content_shape(target, cfg)
    return bicubic_resize_np(c, th, tw)


def canonicalize_style(style: np.ndarray, cfg: Config) -> np.ndarray:
    """Resize a style image to a square of the level-0 base diameter.

    Style images only contribute Gram statistics, so the distortion is
    mild; jobs sharing a content bucket then share one compiled graph
    regardless of style aspect ratio."""
    from ..ops.resize import bicubic_resize_np

    side = cfg.base_diameter
    return bicubic_resize_np(style, side, side)


def resolve_batch_policy(cfg: Config, batch_policy: str = "auto") -> str:
    """Resolve 'auto' to 'batched' | 'sequential' for a job queue.

    Measured policy (PARITY.md): vmapping FULL-WOLFE L-BFGS at torch's
    t=lr opening is a ~2x LOSS — the vmapped bracket/zoom while_loops run
    in lockstep at the max line-search length across jobs (6.6
    job-steps/s batched vs ~14 sequential at 2level512, and torch-default
    history at batch 8 blows HBM) — while Adam and reference-semantics
    L-BFGS (max_ls=0, fixed-length search) gain 3-8x from batching. r4:
    the unit opening trial (lbfgs_t_init='unit', the TPU production
    default) removes the lockstep tax — most jobs accept the first trial
    every step, so the max search length across the batch collapses to
    ~1: measured 50.1 job-steps/s vmapped at batch 8 vs the 33.8
    sequential single-job ceiling (bench row batch8x2level512lbfgsunit)
    — so unit-mode full-Wolfe queues vmap. The reference encodes its
    scheduling guidance in code the same way (reference config.py:1:
    concurrency "1 if the levels_num > 2"); 'auto' encodes ours.
    """
    if batch_policy != "auto":
        if batch_policy not in ("batched", "sequential"):
            raise ValueError(f"unknown batch_policy {batch_policy!r}; "
                             "expected 'auto', 'batched' or 'sequential'")
        return batch_policy
    if (cfg.optimizer == "lbfgs" and cfg.lbfgs_max_ls_steps > 0
            and cfg.lbfgs_t_init != "unit"):
        return "sequential"
    return "batched"


# Measured one-chip saturation: job-steps/s stops improving by batch 32
# (406.7 job-steps/s at batch32x1level256, PARITY.md) — beyond it a bigger
# batch only adds latency and HBM pressure.
_SATURATION_BATCH = 32
# HBM budget for the L-BFGS s/y history across a batch (v5e-1 has 16 GB;
# the other half stays for activations, taps and targets). Same threshold
# as warn_lbfgs_hbm.
_LBFGS_HISTORY_BUDGET_GB = 8.0


def max_jobs_per_batch(cfg: Config, content_shape: tuple) -> int:
    """HBM-aware cap on jobs per compiled batch for one bucket.

    The reference's own memory-aware cap is hard-coded scheduling guidance
    (reference config.py:1, "1 if the levels_num > 2"); here the cap is
    computed from the actual dominant state — the L-BFGS history pairs
    (2 * history * n_pixels f32 per job) against an 8 GB budget — and the
    measured batch-size saturation curve.
    """
    cap = _SATURATION_BATCH
    if cfg.optimizer == "lbfgs":
        h, w = level_shape(content_shape[0], content_shape[1],
                           cfg.levels_num - 1, cfg.base_diameter)
        per_job_gb = lbfgs_history_gb(cfg, [(1, h, w, 3)])
        if per_job_gb > 0:
            cap = min(cap, max(1, int(_LBFGS_HISTORY_BUDGET_GB / per_job_gb)))
    return cap


def resolve_group_cap(cfg: Config, content_shape: tuple, jobs_axis: int,
                      policy: str, max_batch: Optional[int]) -> int:
    """Jobs per compiled group for one bucket (see run_job_queue).

    An explicit max_batch is a literal total cap: it is rounded DOWN to a
    multiple of the mesh's jobs axis so BatchedTransferJob's replication
    padding can never exceed it. A cap below one axis-width still pads up
    to the axis — the smallest batch a jobs mesh can physically run."""
    if policy == "sequential":
        return 1
    if max_batch is not None:
        cap = max_batch
        if jobs_axis > 1 and cap >= jobs_axis:
            cap -= cap % jobs_axis
        return max(1, cap)
    # per-device measured cap x devices on the jobs axis
    return max_jobs_per_batch(cfg, content_shape) * jobs_axis


def planned_round_sizes(cfg: Config, content_shape: tuple, n_jobs: int,
                        jobs_axis: int = 1, policy: str = "auto",
                        max_batch: Optional[int] = None,
                        pad_batches: bool = True,
                        mesh_devices: int = 1,
                        checkpointing: bool = False) -> list:
    """The compiled batch sizes run_job_queue dispatches for a
    single-bucket queue of n_jobs same-shape jobs — exactly the sizes a
    warmup must precompile so no round hits a cold XLA compile mid-serve.

    Mirrors the dispatch path in one place: the policy routing
    (resolve_batch_policy), the grouping cap (resolve_group_cap), the
    power-of-two pad rule, and BatchedTransferJob's padding up to a
    jobs-axis multiple. Harnesses and frontends must use THIS instead of
    re-deriving the ladder, so a policy change cannot silently
    desynchronize their warmed sizes from what gets dispatched."""
    policy = resolve_batch_policy(cfg, policy)
    cap = resolve_group_cap(cfg, content_shape, jobs_axis, policy, max_batch)
    sizes = set()
    remaining = n_jobs
    while remaining > 0:
        g = min(remaining, cap)
        remaining -= g
        size = g
        if pad_batches and policy != "sequential":
            pad_to = min(cap, 1 << (g - 1).bit_length())
            if pad_to > g:
                size = pad_to
        if policy != "sequential" and jobs_axis > 1:
            # BatchedTransferJob pads a mesh-sharded batch up to a
            # multiple of the jobs axis
            size = -(-size // jobs_axis) * jobs_axis
        sizes.add(size)
    del checkpointing  # r5: shrinking and checkpointing coexist (the
    # checkpoint persists the lane composition), so the ladder is part of
    # what a checkpointed queue dispatches too; the parameter stays for
    # caller compatibility
    if cfg.stop_tol > 0.0 and cfg.stop_shrink and policy != "sequential":
        # convergence shrinking (BatchedTransferJob.run) re-forms a batch
        # down the power-of-two ladder (rounded up to jobs-axis multiples
        # on a mesh) as jobs exit; those executables are part of what a
        # round can dispatch, so a warmup must cover them.
        for size in list(sizes):
            sizes.update(shrink_ladder(size, jobs_axis))
    return sorted(sizes)


def run_job_queue(jobs: Sequence[Tuple[str, np.ndarray, np.ndarray]],
                  cfg: Config, params=None, mesh: Optional[Mesh] = None,
                  shard_space: bool = False, progress=None,
                  canonicalize_styles: bool = False,
                  canonicalize_contents: bool = False,
                  batch_policy: str = "auto",
                  max_batch: Optional[int] = None,
                  pad_batches: bool = False,
                  stream_images: bool = True,
                  checkpoint_dir: Optional[str] = None,
                  checkpoint_every: Optional[int] = None,
                  resume: bool = False,
                  retries: int = 0,
                  retry_delay_s: float = 25.0
                  ) -> Tuple[Dict[str, np.ndarray], Dict[str, Exception]]:
    """Run an arbitrary job queue: bucket by shape, batch each bucket across
    the mesh, stream progress.

    Returns ({task_id: final image}, {task_id: exception}): a failed bucket
    (e.g. OOM at an extreme shape) is isolated — its task_ids land in the
    failures dict instead of killing the rest of the queue, and callers can
    surface the error state to users (the lab renders a failed card).

    This is the TPU replacement for the reference's semaphore-throttled
    sequential queue (reference task_executor.py): a full 20-pair lab run
    becomes a handful of sharded batches instead of 10 serialized rounds.

    batch_policy ('auto' default) encodes the measured optimizer routing
    (see resolve_batch_policy): 'auto' vmaps Adam, reference-semantics
    L-BFGS, and unit-opening full-Wolfe (the r4 TPU production default —
    its first trial is accepted most steps, so the batch never pays a
    lockstep search) but runs lr-opening FULL-WOLFE jobs one at a time
    (vmapping those is a measured ~2x loss — lockstep line-search
    while_loops). 'batched'/'sequential' override explicitly.

    Oversized buckets are split into sub-batches of max_batch jobs
    (default: the HBM-aware cap from max_jobs_per_batch — L-BFGS history
    budget + the measured batch-size saturation curve) instead of
    compiling one arbitrarily large batch.

    canonicalize_styles resizes every style image to a square of the
    level-0 base diameter, so jobs sharing a content shape land in one
    batch regardless of style aspect ratio. Style images only contribute
    Gram statistics, so the distortion is mild — it trades exact reference
    aspect handling for much larger batches.

    stream_images=False skips the per-chunk device->host image transfer
    (progress receives images=None except for the final chunk) — for
    headless queue runs where only losses/percent matter. The transfer is
    ~2 ms on a real TPU host NIC; leaving it on is correct for serving.

    checkpoint_dir enables crash recovery for long queues: each compiled
    group checkpoints its whole batch state (images + optimizer state,
    bit-exact incl. L-BFGS history — engine/checkpoint.py) every
    checkpoint_every steps to
    `<dir>/queue_<sha1-of-group-task-ids>.ckpt`; with resume=True a
    re-run of the SAME queue (same task ids, same grouping knobs) picks
    every group up from its last checkpoint — completed groups return
    their final images without recomputing. The file name keys on the
    group's task ids, so resuming with different ids/splits starts fresh.

    canonicalize_contents center-crops each content image to the nearest
    canonical aspect bucket and resizes it to that bucket's exact
    top-pyramid-level shape (lossless for the pipeline — resolution above
    the top level is never used). An arbitrary queue then compiles at most
    len(DEFAULT_ASPECT_BUCKETS) batch shapes.

    pad_batches=True pads every vmapped group up to the next power of two
    (capped by the group cap) by replicating jobs whose results are
    dropped. XLA compiles one executable per batch SIZE; for online
    serving, where the coalescing window can produce any size, padding
    bounds the compile set to {1, 2, 4, ...} — warmable ahead of time —
    at the cost of up to ~2x padded compute on odd-sized rounds. Offline
    queues know their sizes upfront and default to exact batches.

    retries re-runs a FAILED group up to that many extra times after
    retry_delay_s (default sized to the observed TPU-worker crash
    recovery, ~20s): transient device-runtime failures (a crashed or
    restarted worker, a dropped tunnel dispatch) otherwise fail every
    job in the group. With checkpointing enabled a retry resumes from
    the group's last saved chunk instead of restarting at step 0.
    Deterministic failures (e.g. a genuine OOM) simply fail again, so
    the default stays 0; long product drives opt in.
    """
    if checkpoint_dir is not None and checkpoint_every is None:
        checkpoint_every = cfg.stream_every  # same default as the CLI path
    if checkpoint_dir is not None and cfg.optimizer == "lbfgs":
        # a checkpoint save materializes the WHOLE opt state device-to-
        # host: at 2K/history=100 the s/y pairs alone are ~7.6 GB (bf16),
        # and the stream_every-matched default cadence would fetch that
        # every ~3 s of compute. Loud guidance instead of a silent stall
        # (observed: one save ~28 min through this host's tunnel; even a
        # real TPU host NIC pays seconds per save).
        from ..engine.pyramid import level_shape

        h0, w0 = level_shape(jobs[0][1].shape[0], jobs[0][1].shape[1],
                             cfg.levels_num - 1,
                             cfg.base_diameter) if jobs else (0, 0)
        state_gb = lbfgs_history_gb(cfg, [(1, h0, w0, 3)])
        if state_gb > 1.0 and checkpoint_every <= 5 * cfg.stream_every:
            import sys

            print(f"warning: each checkpoint save fetches ~{state_gb:.1f} "
                  f"GB of L-BFGS state per job; at --checkpoint-every "
                  f"{checkpoint_every} that dominates the run. Consider "
                  f"--checkpoint-every {max(200, 20 * cfg.stream_every)} "
                  f"or --lbfgs-history 10.", file=sys.stderr)
    if canonicalize_contents:
        jobs = [(tid, canonicalize_content(c, cfg), s) for tid, c, s in jobs]

    if canonicalize_styles:
        jobs = [(tid, c, canonicalize_style(s, cfg)) for tid, c, s in jobs]

    params = params if params is not None else load_vgg19_params(seed=cfg.seed)
    policy = resolve_batch_policy(cfg, batch_policy)
    results: Dict[str, np.ndarray] = {}
    failures: Dict[str, Exception] = {}
    # BatchedTransferJob pads every batch up to a multiple of the mesh's
    # jobs axis by replicating jobs, so the split size must account for
    # it: the HBM/saturation cap from max_jobs_per_batch is PER DEVICE
    # (one-chip measurements), a jobs axis of size A distributes the
    # history A ways, and a group must be a multiple of A or the padding
    # replicas blow the very budget the cap enforces.
    jobs_axis = (mesh.shape["jobs"]
                 if mesh is not None and "jobs" in mesh.axis_names else 1)
    for bucket in bucket_jobs(jobs).values():
        cap = resolve_group_cap(cfg, bucket[0][1].shape, jobs_axis,
                                policy, max_batch)
        groups = [bucket[i:i + cap] for i in range(0, len(bucket), cap)]
        for group in groups:
            ids = [j[0] for j in group]
            # sequential single-job groups must not be padded/replicated
            # across a jobs axis (A-1 wasted replicas + the lockstep tax
            # the sequential routing exists to avoid)
            group_mesh = mesh if (policy != "sequential"
                                  or jobs_axis == 1) else None
            ckpt_path = None
            if checkpoint_dir is not None:
                import hashlib
                import os

                os.makedirs(checkpoint_dir, exist_ok=True)
                tag = hashlib.sha1(",".join(ids).encode()).hexdigest()[:16]
                ckpt_path = os.path.join(checkpoint_dir, f"queue_{tag}.ckpt")
                if not resume and os.path.exists(ckpt_path):
                    # the caller explicitly declined to resume, so a file
                    # left by a previous run of the same task ids is
                    # garbage by definition — remove it NOW rather than
                    # ignore it, because a transient-failure retry below
                    # forces resume=True and would otherwise silently
                    # load the stale state (or a stale-config fingerprint
                    # mismatch would burn the whole retry budget)
                    os.remove(ckpt_path)
            pad_to = None
            if pad_batches and policy != "sequential":
                pad_to = min(cap, 1 << (len(group) - 1).bit_length())
                if pad_to <= len(group):
                    pad_to = None
            last_exc: Optional[Exception] = None
            for attempt in range(retries + 1):
                if attempt:
                    import sys
                    import time

                    print(f"run_job_queue: group of {len(ids)} job(s) "
                          f"failed ({type(last_exc).__name__}: {last_exc});"
                          f" retry {attempt}/{retries} in "
                          f"{retry_delay_s:.0f}s", file=sys.stderr)
                    time.sleep(retry_delay_s)
                try:
                    batch = BatchedTransferJob(
                        [j[1] for j in group], [j[2] for j in group], cfg,
                        params=params, mesh=group_mesh,
                        shard_space=shard_space and group_mesh is not None,
                        pad_batch_to=pad_to)
                    imgs = None
                    for done, imgs, losses in batch.run(
                            yield_images=stream_images,
                            checkpoint_path=ckpt_path,
                            checkpoint_every=checkpoint_every,
                            # a retry resumes from the last saved chunk
                            # (no-op without a checkpoint path)
                            resume=resume or attempt > 0):
                        if progress is not None:
                            pct = done / cfg.iters_num * 100.0
                            # one D2H fetch for the whole batch: on the
                            # stream_images=False path losses is a lazy
                            # device array, and per-job float(losses[i])
                            # would issue B separate dispatch+fetch round
                            # trips per chunk
                            losses = np.asarray(losses)
                            for i, tid in enumerate(ids):
                                progress(tid, pct,
                                         imgs[i] if imgs is not None
                                         else None,
                                         float(losses[i]))
                    if imgs is None:
                        raise RuntimeError(
                            f"batch of {len(ids)} job(s) yielded no chunks "
                            f"(iters_num={cfg.iters_num})")
                    if (progress is not None and cfg.stop_tol > 0.0
                            and done < cfg.iters_num):
                        # convergence early-stop ended the group below the
                        # full budget; consumers key completion on percent
                        # >= 100 — re-emit the final images at 100%
                        for i, tid in enumerate(ids):
                            progress(tid, 100.0, imgs[i], float(losses[i]))
                    for i, tid in enumerate(ids):
                        results[tid] = imgs[i]
                    last_exc = None
                    break
                except Exception as e:  # noqa: BLE001 — bucket isolation
                    # one bad group (e.g. OOM at an extreme shape) must
                    # not kill the rest of the queue
                    last_exc = e
            if last_exc is not None:
                for tid in ids:
                    failures[tid] = last_exc
    if failures:
        import sys

        print(f"run_job_queue: {len(failures)} job(s) failed: "
              + ", ".join(f"{tid}: {type(e).__name__}: {e}"
                          for tid, e in sorted(failures.items())),
              file=sys.stderr)
    return results, failures
