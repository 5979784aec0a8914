"""Round-5 hardening: the GSPMD fused-style-backward miscompute fence.

Round-5 finding (minimal reproducer in the commit message / PARITY.md):
GSPMD mispartitions the VMAPPED fused style backward — vmap's conv
batching rule turns the per-job 1x1 backward conv
(ops/losses.py::_style_layer_bwd) into a feature-grouped conv, and
partitioning it under ANY input sharding (even plain batch sharding on
'jobs') returns a ~98.5%-wrong style gradient. Finite differences side
with the unsharded graph; autodiff's generated backward partitions
exactly. BatchedTransferJob therefore falls back to autodiff on
multi-device meshes; these tests pin both the fence and the numerics.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from artstyletransfer_tpu.config import Config
from artstyletransfer_tpu.parallel import BatchedTransferJob
from artstyletransfer_tpu.parallel.mesh import jobs_mesh, jobs_space_mesh


@pytest.fixture
def jobs_data():
    rng = np.random.default_rng(11)
    contents = [rng.random((32, 48, 3)).astype(np.float32) for _ in range(4)]
    styles = [rng.random((24, 24, 3)).astype(np.float32) for _ in range(4)]
    return contents, styles


def test_multi_device_mesh_disables_fused_style_bwd(jobs_data, vgg_params):
    """Any multi-device mesh must drop to the autodiff style backward;
    single-device batches keep the fused (single-chip layout) path."""
    contents, styles = jobs_data
    cfg = Config(levels_num=1, iters_num=1, base_diameter=16,
                 optimizer="adam", stream_every=1)
    assert cfg.fused_style_bwd  # the default this fence guards

    meshed = BatchedTransferJob(contents, styles, cfg, params=vgg_params,
                                mesh=jobs_mesh(4))
    assert meshed.cfg.fused_style_bwd is False

    spaced = BatchedTransferJob(contents[:2], styles[:2], cfg,
                                params=vgg_params, mesh=jobs_space_mesh(2, 2),
                                shard_space=True)
    assert spaced.cfg.fused_style_bwd is False

    plain = BatchedTransferJob(contents, styles, cfg, params=vgg_params)
    assert plain.cfg.fused_style_bwd is True


def test_meshed_gradient_matches_single_chip(jobs_data, vgg_params):
    """The regression this fence exists for: with the DEFAULT config
    (fused_style_bwd on), the jobs-mesh batched gradient must match the
    single-chip batched gradient to reduction-order noise. Before the
    fence this diverged ~2% in L2 (the style component ~98.5%)."""
    contents, styles = jobs_data
    cfg = Config(levels_num=1, iters_num=1, base_diameter=16,
                 optimizer="lbfgs", lbfgs_history=2, stream_every=1)

    meshed = BatchedTransferJob(contents, styles, cfg, params=vgg_params,
                                mesh=jobs_mesh(4))
    single = BatchedTransferJob(contents, styles, cfg, params=vgg_params)
    g_m = np.asarray(meshed._init_fn(
        meshed.params, meshed.targets,
        jnp.array(meshed._x0, copy=True)).g)
    g_s = np.asarray(single._init_fn(
        single.params, single.targets,
        jnp.array(single._x0, copy=True)).g)
    rel = (np.linalg.norm(g_m - g_s, axis=-1)
           / np.linalg.norm(g_s, axis=-1))
    assert (rel < 1e-5).all(), rel


def test_vmapped_fused_bwd_sharded_is_wrong_upstream():
    """Documents the upstream GSPMD behavior the fence works around: the
    vmapped custom-VJP gradient diverges under batch sharding while the
    vmapped autodiff gradient does not. If this test ever FAILS on the
    fused side (i.e. the sharded gradient matches), the toolchain fixed
    the mispartitioning and the fence in BatchedTransferJob can be
    retired — re-measure before removing it."""
    from artstyletransfer_tpu.ops.gram import gram_matrix
    from artstyletransfer_tpu.ops.losses import _style_layer_mse_convbwd

    rng = np.random.default_rng(0)
    B, h, w, c = 2, 16, 16, 8
    f = jnp.asarray(rng.standard_normal((B, 1, h, w, c)), jnp.float32)
    gt = jnp.asarray(rng.standard_normal((B, c, c)), jnp.float32)
    mesh = Mesh(np.array(jax.devices()[:2]).reshape(2), ("jobs",))
    sh_f = NamedSharding(mesh, P("jobs"))
    sh_gt = NamedSharding(mesh, P("jobs"))

    def fused(f, gt):
        return _style_layer_mse_convbwd(f, gt, None)

    def auto(f, gt):
        g = gram_matrix(f, precision=None)[0]
        return jnp.mean(jnp.square(g - gt))

    rels = {}
    for name, fn in (("fused", fused), ("auto", auto)):
        gfn = jax.jit(jax.vmap(jax.grad(fn)))
        g_rep = np.asarray(gfn(f, gt))
        g_sh = np.asarray(gfn(jax.device_put(f, sh_f),
                              jax.device_put(gt, sh_gt)))
        rels[name] = float(np.linalg.norm(g_sh - g_rep)
                           / np.linalg.norm(g_rep))
    assert rels["auto"] < 1e-6, rels
    assert rels["fused"] > 1e-3, (
        f"upstream GSPMD now partitions the vmapped fused backward "
        f"correctly ({rels}) — the BatchedTransferJob fence can likely "
        f"be retired (re-measure first)")


@pytest.fixture
def shrink_pair():
    # the canonical-env calibration of test_stop_shrink_per_job_early_exit
    # (test_engine.py): 16px adam, stream 5, tol=1.3 -> job0 exits at step
    # 10 (batch 2 -> 1), job1 converges at 15
    rng = np.random.default_rng(7)
    content = rng.random((48, 64, 3)).astype(np.float32)
    style = rng.random((40, 40, 3)).astype(np.float32)
    content2 = np.random.default_rng(123).random(
        content.shape).astype(np.float32)
    return [content, content2], [style, style]


def test_checkpoint_resumes_mid_shrink_bit_exact(shrink_pair, vgg_params,
                                                 tmp_path):
    """r4's checkpoint-XOR-shrink exclusion is lifted: a checkpoint taken
    AFTER a convergence shrink persists the lane composition and frozen
    rows, and a crash-resume continues at the shrunken batch size,
    landing bit-exactly on the uninterrupted run's results."""
    contents, styles = shrink_pair
    cfg = Config(levels_num=1, iters_num=30, base_diameter=16,
                 optimizer="adam", stream_every=5, stop_tol=1.3)
    full = list(BatchedTransferJob(contents, styles, cfg,
                                   params=vgg_params).run())
    assert [d for d, _, _ in full] == [5, 10, 15]

    # checkpointed run, "crashing" right after the post-shrink chunk
    ckpt = str(tmp_path / "shrink.ckpt")
    it = BatchedTransferJob(contents, styles, cfg, params=vgg_params).run(
        checkpoint_path=ckpt, checkpoint_every=5)
    for done, _imgs, _losses in it:
        if done == 10:  # shrink to batch 1 happened at this boundary
            break
    it.close()

    # the file holds a SHRUNKEN batch: one live lane + one frozen row
    from artstyletransfer_tpu.engine.checkpoint import peek_checkpoint_meta
    step, extra = peek_checkpoint_meta(ckpt)
    assert step == 10 and extra["lane_orig"] == [1]
    assert extra["finished"] == [[0, pytest.approx(full[1][2][0])]]

    resumed = list(BatchedTransferJob(contents, styles, cfg,
                                      params=vgg_params).run(
        checkpoint_path=ckpt, checkpoint_every=5, resume=True))
    assert [d for d, _, _ in resumed] == [15]
    np.testing.assert_array_equal(resumed[-1][1], full[-1][1])
    np.testing.assert_array_equal(resumed[-1][2], full[-1][2])

    # the converged final checkpoint short-circuits a further resume,
    # composing frozen rows with the live lane
    again = list(BatchedTransferJob(contents, styles, cfg,
                                    params=vgg_params).run(
        checkpoint_path=ckpt, checkpoint_every=5, resume=True))
    assert [d for d, _, _ in again] == [15]
    np.testing.assert_array_equal(again[-1][1], full[-1][1])
    # frozen lanes return their trajectory loss bit-exactly; live lanes
    # are REevaluated at the final image (the long-standing
    # resume-of-completed contract — the in-flight `f` is the loss before
    # the chunk's last update and is not persisted), which at this toy
    # tol=1.3 calibration differs by ~11%: same order, not bitwise
    assert again[-1][2][0] == full[-1][2][0]
    np.testing.assert_allclose(again[-1][2][1], full[-1][2][1], rtol=0.2)


def test_fused_style_bwd_exact_unsharded():
    """The fused custom VJP itself is exact where production uses it
    (single device, vmapped or not) — the fence is about GSPMD only."""
    from artstyletransfer_tpu.ops.gram import gram_matrix
    from artstyletransfer_tpu.ops.losses import _style_layer_mse_convbwd

    rng = np.random.default_rng(3)
    f = jnp.asarray(rng.standard_normal((2, 1, 12, 12, 8)), jnp.float32)
    gt = jnp.asarray(rng.standard_normal((2, 8, 8)), jnp.float32)

    def fused(f, gt):
        return _style_layer_mse_convbwd(f, gt, None)

    def auto(f, gt):
        g = gram_matrix(f, precision=None)[0]
        return jnp.mean(jnp.square(g - gt))

    g_f = np.asarray(jax.jit(jax.vmap(jax.grad(fused)))(f, gt))
    g_a = np.asarray(jax.jit(jax.vmap(jax.grad(auto)))(f, gt))
    np.testing.assert_allclose(g_f, g_a, rtol=1e-5, atol=1e-7)
