"""Auxiliary subsystems: checkpoint/resume, NaN guard, metrics, builders."""

import dataclasses
import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from artstyletransfer_tpu.config import Config
from artstyletransfer_tpu.engine.builders import LossBuilder, RepresentationBuilder
from artstyletransfer_tpu.engine.transfer import TransferJob
from artstyletransfer_tpu.models.vgg19 import CONTENT_INDEX, STYLE_INDICES
from artstyletransfer_tpu.utils.image import prepare_img
from artstyletransfer_tpu.utils.metrics import MetricsLogger, Throughput


@pytest.fixture(scope="module")
def images():
    rng = np.random.default_rng(13)
    return (rng.random((40, 48, 3)).astype(np.float32),
            rng.random((32, 32, 3)).astype(np.float32))


def test_checkpoint_resume_exact(images, vgg_params, tmp_path):
    """Resume must continue bit-exactly from where the run stopped."""
    content, style = images
    cfg = Config(levels_num=1, iters_num=8, base_diameter=16,
                 optimizer="adam", stream_every=4)
    ckpt = str(tmp_path / "job.npz")

    job = TransferJob(content, style, cfg, params=vgg_params)
    full = [(d, img.copy(), f) for d, img, f in job.run()]

    # run only the first half, checkpointing
    job2 = TransferJob(content, style, cfg, params=vgg_params)
    half = list(job2.run(iters_num=4, checkpoint_path=ckpt,
                         checkpoint_every=4))
    assert half[-1][0] == 4

    # resume the second half from the checkpoint
    job3 = TransferJob(content, style, cfg, params=vgg_params)
    resumed = list(job3.run(iters_num=8, checkpoint_path=ckpt,
                            checkpoint_every=100, resume=True))
    assert resumed[-1][0] == 8
    np.testing.assert_allclose(resumed[-1][2], full[-1][2], rtol=1e-6)
    np.testing.assert_allclose(resumed[-1][1], full[-1][1],
                               rtol=1e-5, atol=1e-6)


def test_checkpoint_resume_exact_lbfgs_incremental_grams(images, vgg_params,
                                                         tmp_path):
    """The r4 TPU production default (matrix L-BFGS + carried Grams)
    checkpoints two extra LbfgsState leaves (sy_gram/yy_gram); resume
    must continue bit-exactly through them."""
    content, style = images
    cfg = Config(levels_num=1, iters_num=8, base_diameter=16,
                 optimizer="lbfgs", lbfgs_history=4,
                 lbfgs_grams="incremental", stream_every=4)
    ckpt = str(tmp_path / "job.npz")

    job = TransferJob(content, style, cfg, params=vgg_params)
    full = [(d, img.copy(), f) for d, img, f in job.run()]

    job2 = TransferJob(content, style, cfg, params=vgg_params)
    half = list(job2.run(iters_num=4, checkpoint_path=ckpt,
                         checkpoint_every=4))
    assert half[-1][0] == 4

    job3 = TransferJob(content, style, cfg, params=vgg_params)
    resumed = list(job3.run(iters_num=8, checkpoint_path=ckpt,
                            checkpoint_every=100, resume=True))
    assert resumed[-1][0] == 8
    np.testing.assert_array_equal(resumed[-1][1], full[-1][1])
    np.testing.assert_array_equal(resumed[-1][2], full[-1][2])

    # and a grams-mode checkpoint cannot silently resume a recompute run
    cfg_re = dataclasses.replace(cfg, lbfgs_grams="recompute")
    other = TransferJob(content, style, cfg_re, params=vgg_params)
    with pytest.raises(ValueError, match="config"):
        list(other.run(checkpoint_path=ckpt, checkpoint_every=100,
                       resume=True))


def test_checkpoint_bf16_leaves_roundtrip(tmp_path):
    """np.savez stores ml_dtypes bfloat16 as raw '|V2'; the checkpoint
    layer must view-encode such leaves (uint16 + recorded dtype name) so a
    bf16-history run (config.lbfgs_state_dtype='bfloat16') can actually be
    resumed instead of failing the dtype check on every load."""
    from artstyletransfer_tpu.engine.checkpoint import (load_checkpoint,
                                                        save_checkpoint)

    rng = np.random.default_rng(7)
    s = jnp.asarray(rng.standard_normal((4, 16)), dtype=jnp.bfloat16)
    y = jnp.asarray(rng.standard_normal((4, 16)), dtype=jnp.bfloat16)
    rho = jnp.asarray(rng.standard_normal(4), dtype=jnp.float32)
    state = {"s": s, "y": y, "rho": rho}
    x = jnp.asarray(rng.standard_normal(16), dtype=jnp.float32)
    path = str(tmp_path / "bf16.npz")
    save_checkpoint(path, x, state, step=3, fingerprint="fp",
                    extra={"k": 1})

    template = jax.eval_shape(lambda: state)
    x2, state2, step, extra = load_checkpoint(path, template,
                                              fingerprint="fp",
                                              with_extra=True)
    assert step == 3 and extra == {"k": 1}
    assert state2["s"].dtype == jnp.bfloat16
    np.testing.assert_array_equal(np.asarray(state2["s"]), np.asarray(s))
    np.testing.assert_array_equal(np.asarray(state2["y"]), np.asarray(y))
    np.testing.assert_array_equal(np.asarray(state2["rho"]),
                                  np.asarray(rho))
    np.testing.assert_array_equal(np.asarray(x2), np.asarray(x))


def test_checkpoint_resume_exact_lbfgs_bf16_state(images, vgg_params,
                                                  tmp_path):
    """End-to-end resume with bf16-stored history: the uint16 view encode
    is lossless, so the resumed half must match the uninterrupted run
    bit-exactly (same contract as the f32-state resume tests)."""
    content, style = images
    cfg = Config(levels_num=1, iters_num=8, base_diameter=16,
                 optimizer="lbfgs", lbfgs_history=4,
                 lbfgs_state_dtype="bfloat16", stream_every=4)
    ckpt = str(tmp_path / "job.npz")

    job = TransferJob(content, style, cfg, params=vgg_params)
    full = [(d, img.copy(), f) for d, img, f in job.run()]

    job2 = TransferJob(content, style, cfg, params=vgg_params)
    half = list(job2.run(iters_num=4, checkpoint_path=ckpt,
                         checkpoint_every=4))
    assert half[-1][0] == 4

    job3 = TransferJob(content, style, cfg, params=vgg_params)
    resumed = list(job3.run(iters_num=8, checkpoint_path=ckpt,
                            checkpoint_every=100, resume=True))
    assert resumed[-1][0] == 8
    np.testing.assert_array_equal(resumed[-1][1], full[-1][1])
    np.testing.assert_array_equal(resumed[-1][2], full[-1][2])

    # a bf16-state checkpoint must not silently resume an f32-state run
    cfg_f32 = dataclasses.replace(cfg, lbfgs_state_dtype="float32")
    other = TransferJob(content, style, cfg_f32, params=vgg_params)
    with pytest.raises(ValueError, match="config"):
        list(other.run(checkpoint_path=ckpt, checkpoint_every=100,
                       resume=True))


def test_checkpoint_wrong_shape_rejected(images, vgg_params, tmp_path):
    content, style = images
    cfg = Config(levels_num=1, iters_num=4, base_diameter=16,
                 optimizer="adam", stream_every=2)
    ckpt = str(tmp_path / "job.npz")
    job = TransferJob(content, style, cfg, params=vgg_params)
    list(job.run(checkpoint_path=ckpt, checkpoint_every=2))

    other = TransferJob(style, content, cfg, params=vgg_params)  # swapped
    with pytest.raises(ValueError, match="shape"):
        list(other.run(checkpoint_path=ckpt, checkpoint_every=100,
                       resume=True))


def test_checkpoint_config_mismatch_rejected(images, vgg_params, tmp_path):
    """Resuming under a changed GRAPH config (same shapes!) fails loudly:
    e.g. an Adam-f32 checkpoint must not silently seed a run whose flags
    changed the traced graph (loss weights, dtype, optimizer knobs)."""
    content, style = images
    cfg = Config(levels_num=1, iters_num=4, base_diameter=16,
                 optimizer="adam", stream_every=2)
    ckpt = str(tmp_path / "job.npz")
    job = TransferJob(content, style, cfg, params=vgg_params)
    list(job.run(checkpoint_path=ckpt, checkpoint_every=2))

    # identical shapes, different graph: changed loss weight
    cfg2 = dataclasses.replace(cfg, style_weight=cfg.style_weight * 2)
    other = TransferJob(content, style, cfg2, params=vgg_params)
    with pytest.raises(ValueError, match="different engine config"):
        list(other.run(checkpoint_path=ckpt, checkpoint_every=100,
                       resume=True))

    # the unchanged config still resumes fine
    same = TransferJob(content, style, cfg, params=vgg_params)
    out = list(same.run(iters_num=4, checkpoint_path=ckpt,
                        checkpoint_every=100, resume=True))
    assert out[-1][0] == 4


def test_nan_guard_trips(images, vgg_params):
    content, style = images
    # absurd lr drives Adam to overflow quickly at tiny resolution
    cfg = Config(levels_num=1, iters_num=40, base_diameter=16,
                 optimizer="adam", stream_every=10, lr_start=1e30,
                 nan_checks=True)
    job = TransferJob(content, style, cfg, params=vgg_params)
    with pytest.raises(FloatingPointError, match="non-finite"):
        list(job.run())


def test_metrics_logger(tmp_path):
    path = str(tmp_path / "m.jsonl")
    with MetricsLogger(path) as m:
        m.log("step", loss=1.5, step=10)
        m.log("done", steps=10)
    lines = [json.loads(line) for line in open(path)]
    assert lines[0]["event"] == "step" and lines[0]["loss"] == 1.5
    assert lines[1]["event"] == "done"


def test_throughput_excludes_compile_interval():
    tp = Throughput()
    import time as _t

    tp.tick(0)
    _t.sleep(0.05)
    tp.tick(10)   # compile-bearing interval: excluded
    _t.sleep(0.01)
    tp.tick(20)
    assert tp.steps_per_sec is not None
    assert tp.steps_per_sec > 50  # 10 steps in ~0.01s, not 20 in 0.06


def test_builders_match_fused_loss(images, vgg_params):
    """The reference-API LossBuilder must agree with the jitted engine loss."""
    content, style = images
    cfg = Config(levels_num=1, base_diameter=16)
    job = TransferJob(content, style, cfg, params=vgg_params)

    from artstyletransfer_tpu.engine.pyramid import build_input_pyramids

    c_lvls, s_lvls = build_input_pyramids(content, style, 1, 16)
    lb = LossBuilder(CONTENT_INDEX, list(STYLE_INDICES),
                     jnp.asarray(prepare_img(c_lvls[0])),
                     jnp.asarray(prepare_img(s_lvls[0])),
                     vgg_params, cfg.content_weight, cfg.style_weight,
                     cfg.tv_weight)
    probe = c_lvls[0] * 0.7 + 0.1
    total, c_l, s_l, tv_l = lb.build(jnp.asarray(prepare_img(probe)))
    ref_total, _ = job.loss_report(probe)
    np.testing.assert_allclose(float(total), ref_total, rtol=1e-4)


def test_representation_builder_polymorphism(images, vgg_params):
    content, _ = images
    x = jnp.asarray(prepare_img(content))
    rb = RepresentationBuilder(x, vgg_params)
    single = rb.build_content(CONTENT_INDEX)
    multi = rb.build_content([CONTENT_INDEX])
    assert isinstance(multi, list) and len(multi) == 1
    np.testing.assert_array_equal(np.asarray(single), np.asarray(multi[0]))
    grams = rb.build_style(list(STYLE_INDICES))
    assert len(grams) == 5


def test_perceptual_psnr_ssim():
    """SSIM/PSNR sanity: identity -> 1.0/inf; noise degrades both; SSIM
    penalizes structural change more than a constant luminance shift."""
    from artstyletransfer_tpu.utils.perceptual import psnr, ssim

    rng = np.random.default_rng(0)
    img = rng.random((32, 48, 3)).astype(np.float64)
    assert ssim(img, img) == pytest.approx(1.0, abs=1e-9)
    assert psnr(img, img) == float("inf")

    noisy = np.clip(img + rng.normal(0, 0.2, img.shape), 0, 1)
    s_noise = ssim(img, noisy)
    assert 0.0 < s_noise < 0.9
    assert 5.0 < psnr(img, noisy) < 25.0

    shifted = np.clip(img + 0.05, 0, 1)
    assert ssim(img, shifted) > s_noise  # structure preserved

    with pytest.raises(ValueError):
        ssim(img, img[:16])
    with pytest.raises(ValueError):
        ssim(img[:8, :8], img[:8, :8])  # smaller than the window


def test_drive_lab_demo_steady_state_throughput(tmp_path):
    """The compile-excluded drive metric: union-merged progress spans,
    steps weighted by the percent range each span covers."""
    import json
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "..", "scripts"))
    from drive_lab_demo import steady_state_throughput

    path = tmp_path / "m.jsonl"
    rows = [
        # bucket 1: two tasks running together, 10s span, 50% covered each
        {"t": 100.0, "event": "progress", "task": "a", "percent": 50.0},
        {"t": 110.0, "event": "progress", "task": "a", "percent": 100.0},
        {"t": 101.0, "event": "progress", "task": "b", "percent": 50.0},
        {"t": 110.0, "event": "progress", "task": "b", "percent": 100.0},
        # compile gap 110 -> 200 (no events) must be EXCLUDED
        # bucket 2: one task, 20s span, 80% covered
        {"t": 200.0, "event": "progress", "task": "c", "percent": 20.0},
        {"t": 220.0, "event": "progress", "task": "c", "percent": 100.0},
        # a task with a single event contributes nothing
        {"t": 300.0, "event": "progress", "task": "d", "percent": 100.0},
    ]
    path.write_text("".join(json.dumps(r) + "\n" for r in rows))
    sps, active_s, covered = steady_state_throughput(str(path), iters=100)
    # active = (100..110) U (101..110) U (200..220) = 10 + 20 = 30s
    assert active_s == 30.0
    # covered = 50 + 50 + 80 steps at iters=100
    assert covered == 180.0
    assert abs(sps - 6.0) < 1e-9

    # all-single-event stream -> None (no spans)
    path.write_text(json.dumps(rows[-1]) + "\n")
    assert steady_state_throughput(str(path), iters=100) is None


def test_steady_state_throughput_splits_retry_segments(tmp_path):
    """A --retries re-run restarts a bucket from step 0 (percent
    regresses): each attempt counts as its own monotone segment, and the
    crash + retry-delay gap between them is excluded like a compile."""
    import json
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "..", "scripts"))
    from drive_lab_demo import steady_state_throughput

    path = tmp_path / "m.jsonl"
    rows = [
        # attempt 0: 10..40% over 10s, then the worker crashes
        {"t": 100.0, "event": "progress", "task": "a", "percent": 10.0},
        {"t": 110.0, "event": "progress", "task": "a", "percent": 40.0},
        # 30s crash + retry-delay gap (must be excluded)
        # attempt 1: restart from 10%, runs to 100% over 30s
        {"t": 140.0, "event": "progress", "task": "a", "percent": 10.0},
        {"t": 170.0, "event": "progress", "task": "a", "percent": 100.0},
    ]
    path.write_text("".join(json.dumps(r) + "\n" for r in rows))
    sps, active_s, covered = steady_state_throughput(str(path), iters=100)
    # active = (100..110) U (140..170) = 40s; the 30s gap excluded
    assert active_s == 40.0
    # covered = 30 (attempt 0) + 90 (attempt 1): repeated steps count
    # once per attempt they actually ran
    assert covered == 120.0
    assert abs(sps - 3.0) < 1e-9


def test_throughput_ignores_synthetic_instant_ticks(monkeypatch):
    """The early-stop completion re-emit lands microseconds after the
    real final chunk; Throughput must not fold that zero-time interval
    into its running average (it would record an absurd steps/s spike)."""
    from artstyletransfer_tpu.utils import metrics as m

    t = {"now": 1000.0}
    monkeypatch.setattr(m.time, "time", lambda: t["now"])
    tp = m.Throughput()
    tp.tick(0)            # baseline
    t["now"] += 10.0
    tp.tick(100)          # compile-bearing interval (skipped by design)
    t["now"] += 10.0
    sps = tp.tick(200)    # first counted interval: 10 steps/s
    assert sps == pytest.approx(10.0)
    t["now"] += 1e-5
    sps = tp.tick(400)    # synthetic re-emit: +200 steps in 10us
    assert sps == pytest.approx(10.0)  # unchanged, not ~2e7
    # the re-emit can also land after a dozen ms of image copies and
    # frontend hooks — the rate-ratio filter catches what the dt floor
    # cannot (phantom steps at ~1000x the measured running rate)
    t["now"] += 0.012
    sps = tp.tick(1400)   # +1000 phantom steps in 12ms
    assert sps == pytest.approx(10.0)
    # a real next chunk still counts
    t["now"] += 10.0
    sps = tp.tick(1500)
    assert sps == pytest.approx((100 + 100) / 20.0)
