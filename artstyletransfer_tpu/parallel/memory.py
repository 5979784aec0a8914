"""AOT per-device memory analysis of the batched step (no execution).

SURVEY §5's long-context analogue: a single huge job (2K output, 4 pyramid
levels, L-BFGS history) must be able to spread across several chips' HBM
via the 'space' mesh axis. This module proves the property without
hardware: it lowers the PRODUCTION vmapped chunk with ShapeDtypeStruct
inputs only (nothing is materialized at 2K), compiles it for the mesh, and
reads XLA's per-device memory analysis. scripts/space_memory.py is the CLI;
tests/test_parallel.py pins the sharded/replicated ratio.

Measured history (round 4): with sharding constraints only at the pyramid
images, GSPMD replicated everything downstream of each level's first pool
(per-device temp ratio 0.82 at 8-way space); the in-graph per-level
constraints (engine/transfer._make_pyramid_loss) plus the 'reshape' pool
(models/vgg19._maxpool2) brought it to ~1/space (0.104 measured at
2level/512px, 8-way).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..config import Config
from ..engine.pyramid import level_shape
from ..models.weights import init_vgg19_params
from .batch import _build_batched_runners


def _batched_sds(cfg: Config, content_hw: Tuple[int, int], mesh,
                 batch: int, shard_space: bool):
    """ShapeDtypeStruct inputs (params, targets, x, opt_state, start) for
    the production vmapped chunk, with the same shardings
    BatchedTransferJob uses (params replicated, batch on 'jobs', pixels on
    'space')."""
    n_space = mesh.shape["space"]
    shapes = [
        (1,) + level_shape(content_hw[0], content_hw[1], lvl,
                           cfg.base_diameter) + (3,)
        for lvl in range(cfg.levels_num - 1, -1, -1)]
    n = int(np.prod(shapes[0]))

    jit_init, jit_chunk, jit_targets, _metrics, _chunk_steps = \
        _build_batched_runners(cfg, tuple(shapes), warn_hbm=False,
                               space_mesh=mesh if shard_space else None)

    def sds(shape, dtype, spec):
        return jax.ShapeDtypeStruct(shape, dtype,
                                    sharding=NamedSharding(mesh, spec))

    params = init_vgg19_params(seed=0)
    params_sds = jax.tree.map(
        lambda a: sds(np.shape(a), np.asarray(a).dtype, P()), params)
    c_sds = [sds((batch,) + s, jnp.float32, P("jobs")) for s in shapes]
    # style shape barely matters for memory — reuse the content shapes
    targets_shape = jax.eval_shape(jit_targets, params_sds, c_sds, c_sds)
    targets_sds = jax.tree.map(
        lambda l: sds(l.shape, l.dtype, P("jobs")), targets_shape)

    x_spec = P("jobs", "space") if shard_space else P("jobs", None)
    x_sds = sds((batch, n), jnp.float32, x_spec)

    def opt_spec(leaf):
        shape = leaf.shape
        if not shape or shape[0] != batch:
            return P()
        axes = ["jobs"] + [None] * (len(shape) - 1)
        if shard_space:
            for i in range(1, len(shape)):
                # the flattened pixel axis (x, gradients, Adam moments,
                # L-BFGS s/y history rows) shards over 'space'
                if shape[i] == n and n % n_space == 0:
                    axes[i] = "space"
                    break
        return P(*axes)

    opt_shape = jax.eval_shape(jit_init, params_sds, targets_sds, x_sds)
    opt_sds = jax.tree.map(lambda l: sds(l.shape, l.dtype, opt_spec(l)),
                           opt_shape)
    start_sds = sds((), jnp.int32, P())
    return jit_chunk, (params_sds, targets_sds, x_sds, opt_sds, start_sds)


def aot_memory_stats(cfg: Config, content_hw: Tuple[int, int], mesh,
                     batch: int = 1, shard_space: bool = True,
                     n_steps: int = 2) -> dict:
    """Compile the batched chunk for the mesh (AOT, nothing executed) and
    return XLA's PER-DEVICE memory analysis in bytes. Mirrors
    BatchedTransferJob's constrained-graph gating
    (batch.MIN_LOWEST_LEVEL_PER_SHARD via constrained_space_ok)."""
    from .batch import constrained_space_ok

    shapes = [
        (1,) + level_shape(content_hw[0], content_hw[1], lvl,
                           cfg.base_diameter) + (3,)
        for lvl in range(cfg.levels_num - 1, -1, -1)]
    if shard_space and not constrained_space_ok(shapes,
                                                mesh.shape["space"]):
        raise ValueError(
            f"lowest pyramid level {shapes[-1]} is below the constrained "
            f"sharded graph's safety gate on a {mesh.shape['space']}-way "
            f"space axis (BatchedTransferJob falls back to input-only "
            f"sharding at this size — see batch.constrained_space_ok)")
    if shard_space and mesh.shape["space"] > 1 \
            and cfg.pool_impl in ("reduce_window", "slices"):
        # mirror BatchedTransferJob's auto-switch: the reshape pool
        # partitions cleanly under space sharding
        cfg = dataclasses.replace(cfg, pool_impl="reshape")
    jitted, args = _batched_sds(cfg, content_hw, mesh, batch, shard_space)
    compiled = jitted.lower(*args, n_steps).compile()
    ma = compiled.memory_analysis()
    if ma is None:
        raise RuntimeError("memory_analysis() unavailable on this backend")
    return {
        "argument_bytes": int(ma.argument_size_in_bytes),
        "output_bytes": int(ma.output_size_in_bytes),
        "temp_bytes": int(ma.temp_size_in_bytes),
        "alias_bytes": int(ma.alias_size_in_bytes),
        "live_bytes": int(ma.argument_size_in_bytes
                          + ma.output_size_in_bytes
                          + ma.temp_size_in_bytes
                          - ma.alias_size_in_bytes),
    }
