"""Batched multi-job execution on a virtual 8-device mesh (CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from artstyletransfer_tpu.config import Config
from artstyletransfer_tpu.engine.transfer import TransferJob
from artstyletransfer_tpu.parallel import (
    BatchedTransferJob,
    bucket_jobs,
    jobs_mesh,
    jobs_space_mesh,
    run_job_queue,
)


@pytest.fixture(scope="module")
def jobs_data():
    rng = np.random.default_rng(11)
    contents = [rng.random((32, 48, 3)).astype(np.float32) for _ in range(4)]
    styles = [rng.random((24, 24, 3)).astype(np.float32) for _ in range(4)]
    return contents, styles


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_batched_matches_single_job(jobs_data, vgg_params):
    """A batched run must produce the same result as per-job runs."""
    contents, styles = jobs_data
    cfg = Config(levels_num=2, iters_num=6, base_diameter=16,
                 optimizer="adam", stream_every=6, init_method="content+noise")

    batch = BatchedTransferJob(contents[:2], styles[:2], cfg,
                               params=vgg_params)
    _, imgs, losses = list(batch.run())[-1]
    assert imgs.shape[0] == 2 and losses.shape == (2,)

    for i in range(2):
        # per-job RNG seed matches batch convention (seed + index)
        import dataclasses

        cfg_i = dataclasses.replace(cfg, seed=cfg.seed + i)
        single = TransferJob(contents[i], styles[i], cfg_i,
                             params=vgg_params)
        _, img_i, loss_i = list(single.run())[-1]
        np.testing.assert_allclose(losses[i], loss_i, rtol=1e-3)
        np.testing.assert_allclose(imgs[i], img_i, rtol=1e-3, atol=1e-3)


def test_batched_on_jobs_mesh(jobs_data, vgg_params):
    contents, styles = jobs_data
    cfg = Config(levels_num=1, iters_num=4, base_diameter=16,
                 optimizer="adam", stream_every=2)
    mesh = jobs_mesh(4)
    batch = BatchedTransferJob(contents, styles, cfg, params=vgg_params,
                               mesh=mesh)
    outs = list(batch.run())
    assert len(outs) == 2
    done, imgs, losses = outs[-1]
    assert done == 4 and imgs.shape[0] == 4
    assert np.isfinite(losses).all()


def test_batched_jobs_space_mesh_lbfgs(jobs_data, vgg_params):
    """dp (jobs) x sp (flattened pixels) sharding with the L-BFGS path.

    Deliberately minimal (1 step, 2 jobs, 2x2 mesh, history 2): the
    vmapped strong-Wolfe while-loop under SPMD is the most expensive graph
    in the suite to compile. Runs the r4 production lbfgs_grams=
    'incremental' (carried S Yᵀ/Y Yᵀ in the vmapped, sharded state) so
    the TPU serving combination is what CI compiles.
    """
    contents, styles = jobs_data
    cfg = Config(levels_num=1, iters_num=1, base_diameter=16,
                 optimizer="lbfgs", stream_every=1, lbfgs_history=2,
                 lbfgs_max_ls_steps=3, lbfgs_grams="incremental")
    mesh = jobs_space_mesh(2, 2)
    batch = BatchedTransferJob(contents[:2], styles[:2], cfg,
                               params=vgg_params, mesh=mesh,
                               shard_space=True)
    done, imgs, losses = list(batch.run())[-1]
    assert done == 1 and imgs.shape[0] == 2
    assert np.isfinite(losses).all()


def test_sharding_actually_spans_devices(jobs_data, vgg_params):
    contents, styles = jobs_data
    cfg = Config(levels_num=1, iters_num=1, base_diameter=16,
                 optimizer="adam", stream_every=1)
    mesh = jobs_mesh(4)
    batch = BatchedTransferJob(contents, styles, cfg, params=vgg_params,
                               mesh=mesh)
    assert len(batch._x0.sharding.device_set) == 4


def test_bucket_jobs_groups_by_shape(rng):
    a = rng.random((8, 8, 3)).astype(np.float32)
    b = rng.random((8, 12, 3)).astype(np.float32)
    s = rng.random((6, 6, 3)).astype(np.float32)
    jobs = [("t1", a, s), ("t2", a.copy(), s.copy()), ("t3", b, s)]
    buckets = bucket_jobs(jobs)
    assert len(buckets) == 2
    sizes = sorted(len(v) for v in buckets.values())
    assert sizes == [1, 2]


def test_run_job_queue_mixed_shapes(jobs_data, vgg_params, rng):
    contents, styles = jobs_data
    other_content = rng.random((40, 40, 3)).astype(np.float32)
    cfg = Config(levels_num=1, iters_num=2, base_diameter=16,
                 optimizer="adam", stream_every=2)
    jobs = [("a", contents[0], styles[0]),
            ("b", contents[1], styles[1]),
            ("c", other_content, styles[2])]
    seen = []
    results, failures = run_job_queue(jobs, cfg, params=vgg_params,
                                      mesh=jobs_mesh(2),
                                      progress=lambda tid, pct, img, loss:
                                      seen.append((tid, pct)))
    assert set(results) == {"a", "b", "c"} and failures == {}
    assert results["a"].shape[-1] == 3
    assert {t for t, _ in seen} == {"a", "b", "c"}
    assert all(p == 100.0 for _, p in seen)


def test_canonicalized_queue_collapses_buckets(vgg_params, rng):
    """Mixed aspect ratios collapse into one batch with canonicalization."""
    from artstyletransfer_tpu.parallel.batch import crop_to_aspect_bucket

    # near-square contents of different sizes, mixed-shape styles
    contents = [rng.random((33, 32, 3)).astype(np.float32),
                rng.random((50, 48, 3)).astype(np.float32),
                rng.random((64, 66, 3)).astype(np.float32)]
    styles = [rng.random((20, 30, 3)).astype(np.float32),
              rng.random((40, 24, 3)).astype(np.float32),
              rng.random((32, 32, 3)).astype(np.float32)]
    cfg = Config(levels_num=2, iters_num=2, base_diameter=16,
                 optimizer="adam", stream_every=2)
    seen = []
    results, _failures = run_job_queue(
        [(f"t{i}", c, s) for i, (c, s) in enumerate(zip(contents, styles))],
        cfg, params=vgg_params, canonicalize_styles=True,
        canonicalize_contents=True,
        progress=lambda tid, pct, img, loss: seen.append(tid))
    assert set(results) == {"t0", "t1", "t2"}
    # all three imgs share the canonical square top-level shape
    shapes = {results[t].shape for t in results}
    assert shapes == {(32, 32, 3)}

    crop = crop_to_aspect_bucket(rng.random((100, 160, 3)).astype(np.float32))
    assert abs(crop.shape[1] / crop.shape[0] - 3 / 2) < 0.02


def test_batch_rejects_mixed_shapes(jobs_data, vgg_params, rng):
    contents, styles = jobs_data
    bad = rng.random((10, 10, 3)).astype(np.float32)
    cfg = Config(levels_num=1, base_diameter=16)
    with pytest.raises(ValueError, match="bucket_jobs"):
        BatchedTransferJob([contents[0], bad], styles[:2], cfg,
                           params=vgg_params)


def test_batched_checkpoint_resume(jobs_data, vgg_params, tmp_path):
    contents, styles = jobs_data
    cfg = Config(levels_num=1, iters_num=4, base_diameter=16,
                 optimizer="adam", stream_every=2)
    ckpt = str(tmp_path / "batch.npz")

    full = BatchedTransferJob(contents[:2], styles[:2], cfg,
                              params=vgg_params)
    _, imgs_full, losses_full = list(full.run())[-1]

    half = BatchedTransferJob(contents[:2], styles[:2], cfg,
                              params=vgg_params)
    list(half.run(iters_num=2, checkpoint_path=ckpt, checkpoint_every=2))

    resumed = BatchedTransferJob(contents[:2], styles[:2], cfg,
                                 params=vgg_params)
    _, imgs_res, losses_res = list(
        resumed.run(iters_num=4, checkpoint_path=ckpt,
                    checkpoint_every=100, resume=True))[-1]
    np.testing.assert_allclose(losses_res, losses_full, rtol=1e-6)
    np.testing.assert_allclose(imgs_res, imgs_full, rtol=1e-5, atol=1e-6)

    # resuming a COMPLETED checkpoint must yield the final images with
    # real finite per-job losses, not NaN placeholders (regression)
    done = BatchedTransferJob(contents[:2], styles[:2], cfg,
                              params=vgg_params)
    steps, imgs_done, losses_done = list(
        done.run(iters_num=2, checkpoint_path=ckpt, resume=True))[-1]
    assert steps >= 2 and imgs_done is not None
    # real loss values (the chunk's in-flight loss is evaluated pre-update,
    # so only finiteness and the images are bit-comparable)
    assert np.all(np.isfinite(losses_done))
    np.testing.assert_allclose(imgs_done, imgs_res, rtol=1e-6, atol=1e-7)


def test_batched_checkpoint_config_mismatch_rejected(jobs_data, vgg_params,
                                                     tmp_path):
    """A queue checkpoint keys on task ids but the STATE must also match
    the graph config: editing optimizer/dtype flags between --resume runs
    fails loudly instead of silently mixing states (round-4 fix)."""
    import dataclasses

    contents, styles = jobs_data
    cfg = Config(levels_num=1, iters_num=4, base_diameter=16,
                 optimizer="adam", stream_every=2)
    ckpt = str(tmp_path / "batch.npz")
    half = BatchedTransferJob(contents[:2], styles[:2], cfg,
                              params=vgg_params)
    list(half.run(iters_num=2, checkpoint_path=ckpt, checkpoint_every=2))

    cfg2 = dataclasses.replace(cfg, lr_start=cfg.lr_start * 2)
    other = BatchedTransferJob(contents[:2], styles[:2], cfg2,
                               params=vgg_params)
    with pytest.raises(ValueError, match="different engine config"):
        list(other.run(iters_num=4, checkpoint_path=ckpt,
                       checkpoint_every=100, resume=True))


def test_space_sharding_memory_ratio():
    """Space sharding must deliver its stated purpose — per-device HBM
    relief (SURVEY §5): AOT-compile the production batched chunk on the
    8-device virtual mesh replicated vs space-sharded and pin that
    per-device temp memory drops by >2x (measured ~1/space at production
    shapes — scripts/space_memory.py / PARITY.md; this small shape keeps
    the CPU compile fast, and deep VGG taps stop sharding once their H
    collapses below the axis, so the bound here is looser than 1/space)."""
    from artstyletransfer_tpu.parallel.memory import aot_memory_stats
    from artstyletransfer_tpu.parallel.mesh import jobs_space_mesh

    cfg = Config(levels_num=2, optimizer="adam", base_diameter=64,
                 iters_num=4)
    mesh = jobs_space_mesh(1, 2)
    rep = aot_memory_stats(cfg, (128, 192), mesh, batch=1,
                           shard_space=False, n_steps=2)
    shd = aot_memory_stats(cfg, (128, 192), mesh, batch=1,
                           shard_space=True, n_steps=2)
    assert shd["temp_bytes"] < 0.75 * rep["temp_bytes"], (shd, rep)
    # the optimizer/image state (outputs) shards fully: ~1/2 per device
    assert shd["output_bytes"] < 0.6 * rep["output_bytes"], (shd, rep)


def test_tiny_base_diameter_rejected(jobs_data, vgg_params):
    """base_diameter < 16 would give empty VGG taps (NaN losses)."""
    contents, styles = jobs_data
    cfg = Config(levels_num=1, base_diameter=8)
    with pytest.raises(ValueError, match="base_diameter"):
        TransferJob(contents[0], styles[0], cfg, params=vgg_params)


def test_batch_padding_to_mesh(jobs_data, vgg_params):
    """3 jobs on a 2-wide jobs mesh: padded internally, 3 results out."""
    contents, styles = jobs_data
    cfg = Config(levels_num=1, iters_num=2, base_diameter=16,
                 optimizer="adam", stream_every=2)
    batch = BatchedTransferJob(contents[:3], styles[:3], cfg,
                               params=vgg_params, mesh=jobs_mesh(2))
    assert batch.batch == 4 and batch.real_batch == 3
    done, imgs, losses = list(batch.run())[-1]
    assert imgs.shape[0] == 3 and losses.shape == (3,)


def test_run_job_queue_poisoned_bucket_isolated(vgg_params, rng):
    """A bucket that raises must not kill the queue: its task_ids land in
    the failures dict while other buckets complete (round-1 gap: failures
    were only printed and returned as absence)."""
    cfg = Config(levels_num=1, iters_num=2, base_diameter=16,
                 optimizer="adam", stream_every=2)
    good_c = rng.random((32, 48, 3)).astype(np.float32)
    good_s = rng.random((24, 24, 3)).astype(np.float32)
    bad_c = np.zeros((0, 0, 3), np.float32)  # empty image -> pyramid raises
    jobs = [("ok", good_c, good_s), ("poison", bad_c, good_s)]
    results, failures = run_job_queue(jobs, cfg, params=vgg_params)
    assert set(results) == {"ok"}
    assert set(failures) == {"poison"}
    assert isinstance(failures["poison"], Exception)


def test_canonicalize_helpers_collapse_shapes(rng):
    """canonicalize_content/style map arbitrary inputs onto the canonical
    bucket shapes (the serving anti-recompile path)."""
    from artstyletransfer_tpu.parallel.batch import (DEFAULT_ASPECT_BUCKETS,
                                                     canonicalize_content,
                                                     canonicalize_style)
    from artstyletransfer_tpu.engine.warmup import bucket_content_shape

    cfg = Config(levels_num=2, base_diameter=16)
    shapes = set()
    for hw in ((33, 32), (50, 48), (64, 66), (100, 177), (40, 61)):
        c = rng.random(hw + (3,)).astype(np.float32)
        shapes.add(canonicalize_content(c, cfg).shape)
    buckets = {bucket_content_shape(a, cfg) + (3,)
               for a in DEFAULT_ASPECT_BUCKETS}
    assert shapes <= buckets
    s = canonicalize_style(rng.random((37, 90, 3)).astype(np.float32), cfg)
    assert s.shape == (16, 16, 3)


def test_canonicalize_content_hits_bucket_at_production_size(rng):
    """Regression: the target shape must derive from the bucket's exact
    ratio. Recomputing it from the crop's integer-rounded ratio put ~half
    of real inputs 1-5 px off the precompiled bucket shape (e.g. 500x700
    at 3level1024 resized to 1024x1366 instead of the warmed 1024x1365),
    defeating the serving anti-recompile path."""
    from artstyletransfer_tpu.parallel.batch import (DEFAULT_ASPECT_BUCKETS,
                                                     bucket_content_shape,
                                                     canonicalize_content)

    cfg = Config(levels_num=3, base_diameter=256)
    buckets = {bucket_content_shape(a, cfg) + (3,)
               for a in DEFAULT_ASPECT_BUCKETS}
    for hw in ((500, 700), (467, 701), (723, 480), (1080, 1919),
               (333, 500), (512, 768)):
        c = rng.random(hw + (3,)).astype(np.float32)
        out = canonicalize_content(c, cfg)
        assert out.shape in buckets, (hw, out.shape)


def test_warmup_compiles_buckets(vgg_params):
    """warmup_aspect_buckets runs one chunk per bucket without error and
    the shapes it warms match what canonicalization produces."""
    from artstyletransfer_tpu.engine.warmup import warmup_aspect_buckets

    cfg = Config(levels_num=1, base_diameter=16, optimizer="adam",
                 iters_num=2, stream_every=2)
    n = warmup_aspect_buckets(cfg, params=vgg_params, aspects=(1.0, 1.5),
                              verbose=False)
    assert n == 2

    # online-serving warmup: the vmapped batched runners, one per
    # (bucket, padded size), each with its scalar-chunk executable PLUS
    # (r5) the per-lane-step variant live joins dispatch
    n = warmup_aspect_buckets(cfg, params=vgg_params, aspects=(1.0,),
                              verbose=False, batch_sizes=(1, 2))
    assert n == 4


def test_batch_policy_routing():
    """'auto' encodes the measured routing: lr-opening full-Wolfe L-BFGS
    runs sequentially (lockstep line-search tax); unit-opening full-Wolfe
    (the r4 TPU production default), Adam, and ref-semantics vmap."""
    from artstyletransfer_tpu.parallel import resolve_batch_policy

    assert resolve_batch_policy(Config()) == "sequential"  # lbfgs, max_ls=25
    assert resolve_batch_policy(Config(optimizer="adam")) == "batched"
    assert resolve_batch_policy(Config(lbfgs_max_ls_steps=0)) == "batched"
    # r4: the unit opening trial collapses the batch's lockstep search
    # length to ~1 — measured 50.1 vmapped vs 33.8 sequential job-steps/s
    assert resolve_batch_policy(Config(lbfgs_t_init="unit")) == "batched"
    # explicit overrides win
    assert resolve_batch_policy(Config(), "batched") == "batched"
    assert resolve_batch_policy(Config(optimizer="adam"),
                                "sequential") == "sequential"
    with pytest.raises(ValueError):
        resolve_batch_policy(Config(), "bogus")


def test_max_jobs_per_batch_hbm_cap():
    import dataclasses

    from artstyletransfer_tpu.parallel import max_jobs_per_batch
    from artstyletransfer_tpu.parallel.batch import _SATURATION_BATCH

    # small jobs: capped by the measured saturation curve only
    adam = Config(optimizer="adam")
    assert max_jobs_per_batch(adam, (256, 256, 3)) == _SATURATION_BATCH

    # headline L-BFGS shape (3 levels @ 1024, history=100): the s/y history
    # is ~3.8 GB/job, so only ~2 jobs fit the 8 GB budget
    big = Config(optimizer="lbfgs", levels_num=3)
    cap = max_jobs_per_batch(big, (1024, 1536, 3))
    assert 1 <= cap <= 4
    # a smaller history relaxes the cap
    cap10 = max_jobs_per_batch(dataclasses.replace(big, lbfgs_history=10),
                               (1024, 1536, 3))
    assert cap10 > cap


def test_job_queue_splits_and_routes(vgg_params, rng, monkeypatch):
    """A 5-job bucket splits into max_batch sub-batches; 'auto' routes
    full-Wolfe L-BFGS to per-job batches of 1 (round-2 VERDICT items 1+7)."""
    from artstyletransfer_tpu.parallel import batch as batch_mod

    sizes = []
    orig = batch_mod.BatchedTransferJob

    class Recorder(orig):
        def __init__(self, contents, styles, *a, **kw):
            sizes.append(len(contents))
            super().__init__(contents, styles, *a, **kw)

    monkeypatch.setattr(batch_mod, "BatchedTransferJob", Recorder)

    content = rng.random((24, 24, 3)).astype(np.float32)
    style = rng.random((16, 16, 3)).astype(np.float32)
    jobs = [(f"t{i}", content.copy(), style.copy()) for i in range(5)]

    cfg = Config(levels_num=1, iters_num=2, base_diameter=16,
                 optimizer="adam", stream_every=2)
    results, failures = batch_mod.run_job_queue(jobs, cfg, params=vgg_params,
                                                max_batch=2)
    assert failures == {} and set(results) == {f"t{i}" for i in range(5)}
    assert sizes == [2, 2, 1]

    # auto policy: the default-config optimizer (full-Wolfe L-BFGS) must
    # never be vmapped
    sizes.clear()
    cfg_fw = Config(levels_num=1, iters_num=1, base_diameter=16,
                    optimizer="lbfgs", stream_every=1, lbfgs_history=2,
                    lbfgs_max_ls_steps=2)
    results, failures = batch_mod.run_job_queue(jobs[:2], cfg_fw,
                                                params=vgg_params)
    assert failures == {} and len(results) == 2
    assert sizes == [1, 1]


def test_run_job_queue_stream_images_off(jobs_data, vgg_params):
    """stream_images=False: intermediate progress gets images=None (no
    per-chunk D2H), the final chunk still materializes, and results hold
    real images."""
    contents, styles = jobs_data
    cfg = Config(levels_num=1, iters_num=4, base_diameter=16,
                 optimizer="adam", stream_every=2)
    seen = []
    results, failures = run_job_queue(
        [("a", contents[0], styles[0])], cfg, params=vgg_params,
        progress=lambda tid, pct, img, loss:
        seen.append((pct, img is None, loss)),
        stream_images=False)
    assert failures == {} and results["a"].shape[-1] == 3
    assert [p for p, _, _ in seen] == [50.0, 100.0]
    assert seen[0][1] is True          # intermediate chunk: no image
    assert seen[-1][1] is False        # final chunk materializes
    assert all(np.isfinite(l) for _, _, l in seen)


def test_job_queue_split_is_mesh_aware(vgg_params, rng, monkeypatch):
    """With a jobs-axis mesh, the auto split cap is per-DEVICE x axis size
    (BatchedTransferJob pads each batch to a multiple of the axis, so
    smaller groups would replicate jobs and blow the per-device budget),
    and sequential groups of 1 drop the mesh instead of being padded."""
    from artstyletransfer_tpu.parallel import batch as batch_mod

    calls = []
    orig = batch_mod.BatchedTransferJob

    class Recorder(orig):
        def __init__(self, contents, styles, *a, **kw):
            calls.append((len(contents), kw.get("mesh")))
            super().__init__(contents, styles, *a, **kw)

    monkeypatch.setattr(batch_mod, "BatchedTransferJob", Recorder)
    monkeypatch.setattr(batch_mod, "max_jobs_per_batch",
                        lambda cfg, shape: 2)  # per-device cap of 2

    content = rng.random((24, 24, 3)).astype(np.float32)
    style = rng.random((16, 16, 3)).astype(np.float32)
    jobs = [(f"t{i}", content.copy(), style.copy()) for i in range(5)]
    mesh = jobs_mesh(2)

    cfg = Config(levels_num=1, iters_num=2, base_diameter=16,
                 optimizer="adam", stream_every=2)
    results, failures = batch_mod.run_job_queue(jobs, cfg,
                                                params=vgg_params, mesh=mesh)
    assert failures == {} and len(results) == 5
    # cap = 2/device x 2 devices = 4 -> groups [4, 1], mesh kept
    assert [c[0] for c in calls] == [4, 1]
    assert all(c[1] is mesh for c in calls)

    # sequential policy: per-job groups run WITHOUT the jobs mesh (no
    # padding replicas, no lockstep)
    calls.clear()
    cfg_fw = Config(levels_num=1, iters_num=1, base_diameter=16,
                    optimizer="lbfgs", stream_every=1, lbfgs_history=2,
                    lbfgs_max_ls_steps=2)
    results, failures = batch_mod.run_job_queue(jobs[:2], cfg_fw,
                                                params=vgg_params, mesh=mesh)
    assert failures == {} and len(results) == 2
    assert calls == [(1, None), (1, None)]


def test_run_job_queue_checkpoint_resume(jobs_data, vgg_params, tmp_path):
    """Queue-level crash recovery: a partial run leaves per-group
    checkpoints; re-running the SAME queue with resume=True continues
    from them and lands bit-exactly on the uninterrupted result."""
    contents, styles = jobs_data
    jobs = [("a", contents[0], styles[0]), ("b", contents[1], styles[1])]
    ck = str(tmp_path / "ck")

    def run(iters, resume):
        cfg = Config(levels_num=1, iters_num=iters, base_diameter=16,
                     optimizer="adam", stream_every=2)
        return run_job_queue(jobs, cfg, params=vgg_params,
                             checkpoint_dir=ck, resume=resume)

    # "crash" after 2 of 4 steps (run a short queue with checkpointing)
    partial, failures = run(2, resume=False)
    assert failures == {}
    ckpts = sorted(p.name for p in (tmp_path / "ck").glob("queue_*.ckpt"))
    assert len(ckpts) == 1  # both jobs share one shape bucket -> one group

    # resume to the full length; must equal an uninterrupted 4-step run
    resumed, failures = run(4, resume=True)
    assert failures == {}
    straight, failures = run_job_queue(
        jobs, Config(levels_num=1, iters_num=4, base_diameter=16,
                     optimizer="adam", stream_every=2), params=vgg_params)
    assert failures == {}
    for tid in ("a", "b"):
        np.testing.assert_array_equal(resumed[tid], straight[tid])

    # resuming an already-completed queue returns final images, no rerun
    again, failures = run(4, resume=True)
    assert failures == {}
    for tid in ("a", "b"):
        np.testing.assert_array_equal(again[tid], straight[tid])


def test_pad_batch_to_replicates_and_drops(jobs_data, vgg_params):
    """Explicit size padding (serving compile-set bounding): 3 jobs padded
    to 4 compile as a batch of 4 but yield exactly 3 results."""
    contents, styles = jobs_data
    cfg = Config(levels_num=1, iters_num=2, base_diameter=16,
                 optimizer="adam", stream_every=2)
    b = BatchedTransferJob(contents[:3], styles[:3], cfg, params=vgg_params,
                           pad_batch_to=4)
    assert b.batch == 4 and b.real_batch == 3
    _done, imgs, losses = list(b.run())[-1]
    assert imgs.shape[0] == 3 and losses.shape == (3,)


def test_run_job_queue_pad_batches_pow2(vgg_params, rng, monkeypatch):
    """pad_batches=True pads odd-sized groups up to the next power of two
    (3 -> 4) and leaves exact sizes alone (2 -> no pad); results come back
    for the real ids only and match the unpadded run per job."""
    from artstyletransfer_tpu.parallel import batch as batch_mod

    pads = []
    orig = batch_mod.BatchedTransferJob

    class Recorder(orig):
        def __init__(self, contents, styles, *a, pad_batch_to=None, **kw):
            pads.append((len(contents), pad_batch_to))
            super().__init__(contents, styles, *a,
                             pad_batch_to=pad_batch_to, **kw)

    monkeypatch.setattr(batch_mod, "BatchedTransferJob", Recorder)

    content = rng.random((24, 24, 3)).astype(np.float32)
    style = rng.random((16, 16, 3)).astype(np.float32)
    jobs = [(f"t{i}", content.copy(), style.copy()) for i in range(3)]
    cfg = Config(levels_num=1, iters_num=2, base_diameter=16,
                 optimizer="adam", stream_every=2)

    res_pad, fail = batch_mod.run_job_queue(jobs, cfg, params=vgg_params,
                                            pad_batches=True)
    assert fail == {} and set(res_pad) == {"t0", "t1", "t2"}
    assert pads == [(3, 4)]

    pads.clear()
    res_exact, fail = batch_mod.run_job_queue(jobs[:2], cfg,
                                              params=vgg_params,
                                              pad_batches=True)
    assert fail == {} and pads == [(2, None)]
    np.testing.assert_allclose(res_pad["t0"], res_exact["t0"],
                               rtol=1e-3, atol=1e-3)


# ---- multi-slice (DCN) mesh construction -------------------------------
# Jobs are independent (no cross-job collectives), so the 'jobs' axis may
# span slices over DCN; the 'space' axis carries halo/psum collectives and
# must stay inside one slice (ICI). multislice_jobs_space_mesh encodes
# that placement rule; no multi-slice hardware exists here, so the tests
# drive it with explicit per-slice device lists on the virtual mesh.


def test_multislice_mesh_keeps_space_within_slice():
    from artstyletransfer_tpu.parallel import multislice_jobs_space_mesh

    devs = jax.devices()
    # two pretend 4-device slices, deliberately NOT in jax.devices() order
    slices = [devs[4:], devs[:4]]
    mesh = multislice_jobs_space_mesh(2, slice_devices=slices)
    assert mesh.axis_names == ("jobs", "space")
    assert mesh.devices.shape == (4, 2)
    owner = {d: i for i, s in enumerate(slices) for d in s}
    for row in mesh.devices:
        assert len({owner[d] for d in row}) == 1, (
            "a space group straddles the DCN boundary")
    # job rows stack slice-major in the declared order
    assert all(owner[d] == 0 for d in mesh.devices[:2].ravel())
    assert all(owner[d] == 1 for d in mesh.devices[2:].ravel())


def test_multislice_mesh_default_grouping_and_validation():
    from artstyletransfer_tpu.parallel import multislice_jobs_space_mesh

    # CPU devices report no slice_index -> one group = all 8 devices
    mesh = multislice_jobs_space_mesh(2)
    assert mesh.devices.shape == (4, 2)
    with pytest.raises(ValueError):
        multislice_jobs_space_mesh(3)  # 8 devices not divisible by 3
    with pytest.raises(ValueError):  # a 3-device slice can't host space=2
        multislice_jobs_space_mesh(
            2, slice_devices=[jax.devices()[:3], jax.devices()[3:6]])
    with pytest.raises(ValueError):
        multislice_jobs_space_mesh(0)


def test_batched_runs_on_multislice_mesh(jobs_data, vgg_params):
    """One tiny step over a nontrivially-permuted 2-slice mesh executes."""
    from artstyletransfer_tpu.parallel import multislice_jobs_space_mesh

    contents, styles = jobs_data
    cfg = Config(levels_num=1, iters_num=1, base_diameter=16,
                 optimizer="adam", stream_every=1)
    devs = jax.devices()
    mesh = multislice_jobs_space_mesh(
        2, slice_devices=[devs[6:8], devs[2:4]])
    batch = BatchedTransferJob(contents[:2], styles[:2], cfg,
                               params=vgg_params, mesh=mesh,
                               shard_space=True)
    done, imgs, losses = list(batch.run())[-1]
    assert done == 1 and imgs.shape[0] == 2
    assert np.isfinite(losses).all()


def test_default_serving_mesh_env_gate(monkeypatch):
    from artstyletransfer_tpu.parallel import default_serving_mesh

    # conftest forces ASTT_SERVING_MESH=none for the whole suite
    assert default_serving_mesh() is None
    monkeypatch.setenv("ASTT_SERVING_MESH", "auto")
    mesh = default_serving_mesh()
    assert dict(mesh.shape) == {"jobs": 8, "space": 1}
    mesh2 = default_serving_mesh(2)
    assert dict(mesh2.shape) == {"jobs": 4, "space": 2}
    monkeypatch.setenv("ASTT_SERVING_MESH", "bogus")
    with pytest.raises(ValueError):
        default_serving_mesh()


def test_canonicalize_content_fuzz(rng):
    """ANY input shape lands exactly on a warmed bucket shape — the
    no-recompile invariant online serving depends on (fixed-list cases
    above; this sweeps 200 random shapes incl. extreme aspects)."""
    from artstyletransfer_tpu.parallel.batch import (DEFAULT_ASPECT_BUCKETS,
                                                     bucket_content_shape,
                                                     canonicalize_content)

    cfg = Config(levels_num=2, base_diameter=16)
    buckets = {bucket_content_shape(a, cfg) + (3,)
               for a in DEFAULT_ASPECT_BUCKETS}
    for _ in range(200):
        h = int(rng.integers(16, 220))
        w = int(rng.integers(16, 220))
        out = canonicalize_content(np.zeros((h, w, 3), np.float32), cfg)
        assert out.shape in buckets, (h, w, out.shape)


def test_run_job_queue_stop_tol_reports_completion(jobs_data, vgg_params):
    """A converged early-stopped group (config.stop_tol) must still report
    percent=100 for every job — all frontends key completion on it."""
    contents, styles = jobs_data
    cfg = Config(levels_num=1, iters_num=20, base_diameter=16,
                 optimizer="adam", stream_every=5, lr_start=0.0,
                 stop_tol=1e-6)
    jobs = [("a", contents[0], styles[0]), ("b", contents[1], styles[1])]
    seen = []
    results, failures = run_job_queue(
        jobs, cfg, params=vgg_params,
        progress=lambda tid, pct, img, loss: seen.append((tid, pct, img)))
    assert set(results) == {"a", "b"} and failures == {}
    # stopped after chunk 2 of 4 (frozen lr=0 trajectory)...
    assert max(p for _, p, _ in seen if p < 100.0) == 50.0
    # ...and each job's LAST report is (100, final image)
    for tid in ("a", "b"):
        last = [s for s in seen if s[0] == tid][-1]
        assert last[1] == 100.0 and last[2] is not None


def test_stop_shrink_on_jobs_mesh(jobs_data, vgg_params, capsys):
    """Convergence shrinking on a multi-device jobs mesh: the shrink
    target is rounded up to a jobs-axis multiple, the fused gather's
    output is re-placed with its pre-gather shardings (run()'s reshard
    path), frozen jobs stay bit-stable and survivors keep optimizing on
    the mesh. No cross-comparison against the unmeshed run: SPMD
    partitioning legitimately changes rounding, and over 20+ Adam steps
    the trajectories diverge by percents (enough to flip borderline
    latches). Calibration (canonical test env, MESH trajectory, probed
    like the goldens): at tol=0.20 the step-20 relative changes are
    0.252 / 0.377 / 0.044 / 0.114, so jobs 2-3 latch at step 20 and
    jobs 0-1 run to the 30-step budget."""
    contents, styles = jobs_data
    cfg = Config(levels_num=1, iters_num=30, base_diameter=16,
                 optimizer="adam", stream_every=5, stop_tol=0.20)
    mesh = jobs_mesh(2)
    b = BatchedTransferJob(contents, styles, cfg, params=vgg_params,
                           mesh=mesh)
    # mesh ladder for batch 4 on jobs=2 is {2}: one gather to warm, and
    # the warm attaches the mesh shardings (it must not be a no-op)
    assert b.warm_shrink_gathers() == 1
    out = list(b.run(yield_images=False))
    assert "batch 4 -> 2" in capsys.readouterr().err

    assert [d for d, _, _ in out] == [5, 10, 15, 20, 25, 30]
    losses = {d: np.asarray(l) for d, _i, l in out}
    assert all(l.shape == (4,) and np.isfinite(l).all()
               for l in losses.values())
    # jobs 2-3 left the batch at step 20: their results froze there,
    # bit-exactly, while jobs 0-1 kept improving in the shrunken batch
    for j in (2, 3):
        assert losses[30][j] == losses[20][j]
    for j in (0, 1):
        assert losses[30][j] < losses[20][j]
    # the final materialize composes all four jobs' images
    assert out[-1][1].shape[0] == 4


def test_stop_shrink_on_space_mesh_lbfgs(jobs_data, vgg_params, capsys):
    """Convergence shrinking with SPACE-sharded state: the fused gather
    carries the L-BFGS history buffers (P('jobs', None, 'space')) and the
    reshard device_put restores their specs on the smaller batch.
    Deliberately minimal (3 steps, 2x2 mesh, history 2) per the SPMD
    compile-cost convention above. Calibration (canonical test env, MESH
    trajectory — recalibrated in r5 after the GSPMD fused-style-backward
    fence corrected mesh gradients, test_round5_fixes.py): L-BFGS
    flatlines at this shape — the step-2 relative changes are
    0.0 / 0.0 / 0.0 / 2.08, so any positive tol latches jobs 0-2 at
    step 2 (one survivor -> a 4 -> 2 shrink after jobs-axis rounding)
    while job 3 (change 0.37 at step 3) runs out the budget."""
    contents, styles = jobs_data
    cfg = Config(levels_num=1, iters_num=3, base_diameter=16,
                 optimizer="lbfgs", stream_every=1, lbfgs_history=2,
                 lbfgs_max_ls_steps=3, lbfgs_grams="incremental",
                 stop_tol=1e-8)
    mesh = jobs_space_mesh(2, 2)
    b = BatchedTransferJob(contents, styles, cfg, params=vgg_params,
                           mesh=mesh, shard_space=True)
    assert b.warm_shrink_gathers() == 1
    out = list(b.run(yield_images=False))
    assert "batch 4 -> 2" in capsys.readouterr().err
    assert [d for d, _, _ in out] == [1, 2, 3]
    done, imgs, losses = out[-1]
    assert imgs.shape[0] == 4 and losses.shape == (4,)
    assert np.isfinite(np.asarray(losses)).all()
    # jobs 0-2 froze at their step-2 values; job 3 kept optimizing
    at2 = np.asarray([o for o in out if o[0] == 2][0][2])
    assert (losses[0] == at2[0] and losses[1] == at2[1]
            and losses[2] == at2[2])
    assert losses[3] != at2[3]
