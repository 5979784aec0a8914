"""Regression tests for the round-2 fixes: batched compile-cache key,
checkpoint cadence, resume-from-completed-checkpoint, bot hardening,
new CLI flags."""

import asyncio
import dataclasses

import numpy as np
import pytest

from artstyletransfer_tpu.config import Config
from artstyletransfer_tpu.engine.transfer import TransferJob
from artstyletransfer_tpu.frontends.cli import build_parser, config_from_args
from artstyletransfer_tpu.parallel.batch import _build_batched_runners


@pytest.fixture(scope="module")
def images():
    rng = np.random.default_rng(5)
    return (rng.random((24, 32, 3)).astype(np.float32),
            rng.random((20, 20, 3)).astype(np.float32))


def test_batch_cache_distinguishes_conv_precision():
    """Graph-changing knobs must key the batched compile cache
    (round-1 bug: conv_precision/use_pallas were omitted, so two different
    configs silently shared one compiled executable)."""
    shapes = ((1, 16, 16, 3),)
    base = Config(levels_num=1, base_diameter=16, optimizer="adam")
    a = _build_batched_runners(base, shapes)
    b = _build_batched_runners(
        dataclasses.replace(base, conv_precision="highest"), shapes)
    c = _build_batched_runners(base, shapes)
    assert a is not b  # different graphs -> different cache entries
    assert a is c      # same config -> cache hit


def test_checkpoint_cadence_not_chunk_aligned(images, vgg_params,
                                              tmp_path, monkeypatch):
    """checkpoint_every not aligned to stream_every must still save at the
    requested cadence (round-1 bug: done % checkpoint_every == 0 skipped
    every unaligned boundary)."""
    from artstyletransfer_tpu.engine import checkpoint as ckpt_mod

    saves = []
    real_save = ckpt_mod.save_checkpoint

    def counting_save(path, x, opt_state, step, **kw):
        saves.append(step)
        return real_save(path, x, opt_state, step, **kw)

    monkeypatch.setattr(ckpt_mod, "save_checkpoint", counting_save)

    content, style = images
    cfg = Config(levels_num=1, iters_num=6, base_diameter=16,
                 optimizer="adam", stream_every=2)
    job = TransferJob(content, style, cfg, params=vgg_params)
    list(job.run(checkpoint_path=str(tmp_path / "c.ckpt"),
                 checkpoint_every=3))
    # chunks end at 2,4,6; cadence-3 saves fire at 4 (>=3 since 0) and 6
    # (final). The old modulo logic saved only at 6.
    assert saves == [4, 6]


def test_resume_from_completed_checkpoint(images, vgg_params, tmp_path):
    """Resuming a checkpoint whose step >= iters must yield the final image
    once instead of producing an empty generator (round-1 bug)."""
    content, style = images
    cfg = Config(levels_num=1, iters_num=4, base_diameter=16,
                 optimizer="adam", stream_every=2)
    path = str(tmp_path / "done.ckpt")
    job = TransferJob(content, style, cfg, params=vgg_params)
    final = list(job.run(checkpoint_path=path, checkpoint_every=2))[-1]

    resumed = list(job.run(checkpoint_path=path, resume=True))
    assert len(resumed) == 1
    done, img, loss = resumed[0]
    assert done == 4 and img is not None and np.isfinite(loss)
    np.testing.assert_allclose(img, final[1], rtol=1e-5, atol=1e-6)


def test_batched_resume_from_completed_checkpoint(images, vgg_params,
                                                  tmp_path):
    from artstyletransfer_tpu.parallel import BatchedTransferJob

    content, style = images
    cfg = Config(levels_num=1, iters_num=2, base_diameter=16,
                 optimizer="adam", stream_every=2)
    path = str(tmp_path / "batch.ckpt")
    batch = BatchedTransferJob([content, content], [style, style], cfg,
                               params=vgg_params)
    final = list(batch.run(checkpoint_path=path, checkpoint_every=2))[-1]

    resumed = list(batch.run(checkpoint_path=path, resume=True))
    assert len(resumed) == 1
    done, imgs, _ = resumed[0]
    assert done == 2 and imgs.shape[0] == 2
    np.testing.assert_allclose(imgs, final[1], rtol=1e-5, atol=1e-6)


def test_cli_tpu_knob_flags():
    parser = build_parser()
    args = parser.parse_args([
        "--content", "c.jpg", "--style", "s.jpg", "--output", "o.jpg",
        "--use-pallas", "--remat-levels", "--no-nan-checks",
        "--lbfgs-history", "25", "--lbfgs-max-ls-steps", "30",
        "--lr-start", "5.0", "--lr-decay", "0.99"])
    cfg = config_from_args(args)
    assert cfg.use_pallas and cfg.remat_levels and not cfg.nan_checks
    assert cfg.lbfgs_history == 25 and cfg.lbfgs_max_ls_steps == 30
    assert cfg.lr_start == 5.0 and cfg.lr_decay == 0.99
    # unset flags leave defaults untouched
    args2 = parser.parse_args(["--content", "c", "--style", "s",
                               "--output", "o"])
    cfg2 = config_from_args(args2)
    assert cfg2 == Config()


def test_bot_escapes_html_in_first_name():
    from astt_fakes import FakeTelegramClient, fake_engine
    from artstyletransfer_tpu.frontends.tlbot import StyleTransferBot

    client = FakeTelegramClient()
    bot = StyleTransferBot(client, Config(iters_num=2), engine=fake_engine)
    asyncio.run(bot.handle_start(
        {"chat": {"id": 1}, "from": {"first_name": "<Mallory&Co>"}}))
    text = client.messages[0][1]
    assert "&lt;Mallory&amp;Co&gt;" in text
    assert "<Mallory" not in text


def test_bot_polling_survives_handler_exception():
    """One malformed update must not kill the polling loop (round-1 bug:
    an exception in handle_message escaped run_polling)."""
    from astt_fakes import FakeTelegramClient, fake_engine
    from artstyletransfer_tpu.frontends.tlbot import StyleTransferBot

    class ScriptedClient(FakeTelegramClient):
        def __init__(self):
            super().__init__()
            self.batches = [
                [{"update_id": 1, "message": {"text": "boom"}}],  # no chat
                [{"update_id": 2,
                  "message": {"chat": {"id": 3}, "text": "/start",
                              "from": {"first_name": "Eve"}}}],
            ]

        async def get_updates(self, offset, timeout=30):
            if self.batches:
                return self.batches.pop(0)
            raise asyncio.CancelledError

    client = ScriptedClient()
    bot = StyleTransferBot(client, Config(iters_num=2), engine=fake_engine)

    async def go():
        try:
            await bot.run_polling()
        except asyncio.CancelledError:
            pass

    asyncio.run(go())
    # the bad update was logged and skipped; the good one was handled
    assert any("Eve" in t for _, t in client.messages)
