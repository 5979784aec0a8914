"""Engine tests: optimization progress, loss parity with the torch twin,
L-BFGS correctness, and the reference-parity async generator."""

import asyncio

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch

from artstyletransfer_tpu.config import Config
from artstyletransfer_tpu.engine import lbfgs as lbfgs_mod
from artstyletransfer_tpu.engine.pyramid import build_input_pyramids
from artstyletransfer_tpu.engine.transfer import (
    ContentStylePair,
    TransferJob,
    neural_style_transfer,
)
from artstyletransfer_tpu.utils.image import prepare_img
from artstyletransfer_tpu.baselines.torch_ref import TorchPyramidLoss, TorchVgg19


@pytest.fixture(scope="module")
def images():
    rng = np.random.default_rng(7)
    content = rng.random((48, 64, 3)).astype(np.float32)
    style = rng.random((40, 40, 3)).astype(np.float32)
    return content, style


def test_adam_reduces_loss(images, vgg_params):
    content, style = images
    cfg = Config(levels_num=2, iters_num=20, base_diameter=16,
                 optimizer="adam", stream_every=10)
    job = TransferJob(content, style, cfg, params=vgg_params)
    start = job.initial_loss()
    losses = [f for _, _, f in job.run()]
    # Adam at lr~10 oscillates near its floor; require a big drop vs start
    assert min(losses) < 0.5 * start


def test_lbfgs_reduces_loss(images, vgg_params):
    content, style = images
    cfg = Config(levels_num=1, iters_num=10, base_diameter=16,
                 optimizer="lbfgs", stream_every=5)
    job = TransferJob(content, style, cfg, params=vgg_params)
    losses = [f for _, _, f in job.run()]
    assert losses[-1] < losses[0]


def test_loss_parity_with_torch_twin(images, vgg_params):
    """The jitted pyramid loss must match the torch twin on the same data."""
    content, style = images
    cfg = Config(levels_num=2, base_diameter=16)
    job = TransferJob(content, style, cfg, params=vgg_params)

    c_lvls, s_lvls = build_input_pyramids(content, style, 2, 16)
    to_nchw = lambda a: np.transpose(prepare_img(a), (0, 3, 1, 2))  # noqa
    tw = TorchPyramidLoss(TorchVgg19(vgg_params),
                          [to_nchw(c) for c in c_lvls],
                          [to_nchw(s) for s in s_lvls],
                          cfg.content_weight, cfg.style_weight, cfg.tv_weight)

    probe = c_lvls[0] * 0.5 + 0.25  # arbitrary image at top-level shape
    ours_total, ours_levels = job.loss_report(probe)
    theirs = float(tw.total_loss(torch.from_numpy(to_nchw(probe))))
    np.testing.assert_allclose(ours_total, theirs, rtol=2e-3)
    assert len(ours_levels) == 2


def test_loss_parity_pre_relu_taps(images, vgg_params):
    """use_relu=False (pre-ReLU conv taps, reference neural_nets.py:10) must
    match the torch twin end-to-end through the pyramid loss, and differ
    from the post-ReLU loss."""
    content, style = images
    cfg = Config(levels_num=2, base_diameter=16, use_relu=False)
    job = TransferJob(content, style, cfg, params=vgg_params)

    c_lvls, s_lvls = build_input_pyramids(content, style, 2, 16)
    to_nchw = lambda a: np.transpose(prepare_img(a), (0, 3, 1, 2))  # noqa
    tw = TorchPyramidLoss(TorchVgg19(vgg_params, use_relu=False),
                          [to_nchw(c) for c in c_lvls],
                          [to_nchw(s) for s in s_lvls],
                          cfg.content_weight, cfg.style_weight, cfg.tv_weight)

    probe = c_lvls[0] * 0.5 + 0.25
    ours_total, _ = job.loss_report(probe)
    theirs = float(tw.total_loss(torch.from_numpy(to_nchw(probe))))
    np.testing.assert_allclose(ours_total, theirs, rtol=2e-3)

    relu_job = TransferJob(content, style,
                           Config(levels_num=2, base_diameter=16),
                           params=vgg_params)
    relu_total, _ = relu_job.loss_report(probe)
    assert not np.isclose(ours_total, relu_total, rtol=1e-3)


def test_lbfgs_tracks_torch_on_quadratic():
    """Loss trajectory comparable to torch LBFGS(max_iter=1, strong_wolfe)."""
    rng = np.random.default_rng(5)
    n = 12
    a = rng.standard_normal((n, n)).astype(np.float32)
    A = a @ a.T + np.eye(n, dtype=np.float32)
    b = rng.standard_normal(n).astype(np.float32)

    # torch
    xt = torch.zeros(n, requires_grad=True)
    At, bt = torch.from_numpy(A), torch.from_numpy(b)
    opt = torch.optim.LBFGS((xt,), max_iter=1, line_search_fn="strong_wolfe",
                            lr=1.0)

    def closure():
        opt.zero_grad()
        f = 0.5 * xt @ At @ xt - bt @ xt
        f.backward()
        return f

    torch_losses = [float(opt.step(closure)) for _ in range(10)]

    # ours
    A_j, b_j = jnp.asarray(A), jnp.asarray(b)

    def loss_grad(x):
        return 0.5 * x @ A_j @ x - b_j @ x, A_j @ x - b_j

    x = jnp.zeros(n)
    state = lbfgs_mod.init_state(loss_grad, x, history=100)
    our_losses = []
    for _ in range(10):
        our_losses.append(float(state.f))
        x, state = lbfgs_mod.lbfgs_step(loss_grad, x, state, jnp.float32(1.0))

    # both should converge to the same (negative) optimum
    np.testing.assert_allclose(our_losses[-1], torch_losses[-1], rtol=1e-3)


def test_async_generator_reference_api(images, vgg_params):
    content, style = images
    pair = ContentStylePair(("c.jpg", content), ("s.jpg", style))
    cfg = Config()

    async def collect():
        out = []
        async for percent, img in neural_style_transfer(
                pair, cfg.content_weight, cfg.style_weight, cfg.tv_weight,
                "adam", "vgg19", "content+noise", iters_num=6, levels_num=1,
                noise_factor=cfg.noise_factor, noise_levels=cfg.noise_levels,
                noise_levels_central_amplitude=cfg.noise_levels_central_amplitude,
                noise_levels_peripheral_amplitude=cfg.noise_levels_peripheral_amplitude,
                noise_levels_dispersion=cfg.noise_levels_dispersion,
                params=vgg_params, stream_every=2, base_diameter=16):
            out.append((percent, img.shape))
        return out

    out = asyncio.run(collect())
    percents = [p for p, _ in out]
    assert percents == sorted(percents)
    assert percents[-1] == 100.0
    assert all(s[2] == 3 for _, s in out)


def test_async_generator_no_image_streaming(images, vgg_params):
    """stream_images=False: intermediate chunks yield (percent, None) —
    no per-chunk device->host image fetch — while the final chunk always
    carries the image (the single-job twin of run_job_queue's knob)."""
    content, style = images
    pair = ContentStylePair(("c.jpg", content), ("s.jpg", style))
    cfg = Config()

    async def collect():
        out = []
        async for percent, img in neural_style_transfer(
                pair, cfg.content_weight, cfg.style_weight, cfg.tv_weight,
                "adam", "vgg19", "content+noise", iters_num=6, levels_num=1,
                noise_factor=cfg.noise_factor, noise_levels=cfg.noise_levels,
                noise_levels_central_amplitude=cfg.noise_levels_central_amplitude,
                noise_levels_peripheral_amplitude=cfg.noise_levels_peripheral_amplitude,
                noise_levels_dispersion=cfg.noise_levels_dispersion,
                params=vgg_params, stream_every=2, base_diameter=16,
                stream_images=False):
            out.append((percent, img))
        return out

    out = asyncio.run(collect())
    assert [p for p, _ in out] == [pytest.approx(100 * k / 3) for k in
                                   (1, 2, 3)]
    assert all(img is None for _, img in out[:-1])
    assert out[-1][1] is not None and out[-1][1].shape[2] == 3


def test_pipeline_streaming_yields_identical_sequence(images, vgg_params):
    """config.pipeline_streaming is host-side scheduling only: the
    lookahead path must yield bit-identical (steps, image, loss) tuples in
    the same order as the sequential path — single-job and batched."""
    import dataclasses

    from artstyletransfer_tpu.parallel.batch import BatchedTransferJob

    content, style = images
    base = Config(levels_num=1, iters_num=6, base_diameter=16,
                  optimizer="adam", stream_every=2)
    seq_cfg = dataclasses.replace(base, pipeline_streaming=False)

    out_pipe = list(TransferJob(content, style, base,
                                params=vgg_params).run())
    out_seq = list(TransferJob(content, style, seq_cfg,
                               params=vgg_params).run())
    assert [d for d, _, _ in out_pipe] == [2, 4, 6]
    assert [d for d, _, _ in out_pipe] == [d for d, _, _ in out_seq]
    for (_, i1, f1), (_, i2, f2) in zip(out_pipe, out_seq):
        assert f1 == f2
        np.testing.assert_array_equal(i1, i2)

    bp = list(BatchedTransferJob([content] * 2, [style] * 2, base,
                                 params=vgg_params).run())
    bs = list(BatchedTransferJob([content] * 2, [style] * 2, seq_cfg,
                                 params=vgg_params).run())
    assert [d for d, _, _ in bp] == [d for d, _, _ in bs] == [2, 4, 6]
    for (_, i1, f1), (_, i2, f2) in zip(bp, bs):
        np.testing.assert_array_equal(f1, f2)
        np.testing.assert_array_equal(i1, i2)


def test_pipeline_streaming_checkpoint_resume(tmp_path, images, vgg_params):
    """Lookahead + checkpointing: the checkpoint may run one chunk AHEAD
    of the yields (chunk k+1 is dispatched — and saved — before chunk k is
    yielded), which is a strictly-fresher valid resume state; a resumed
    run must land bit-exactly on the uninterrupted run's final state."""
    content, style = images
    cfg = Config(levels_num=1, iters_num=6, base_diameter=16,
                 optimizer="adam", stream_every=2)
    ckpt = str(tmp_path / "job.npz")
    full = list(TransferJob(content, style, cfg, params=vgg_params).run())

    job = TransferJob(content, style, cfg, params=vgg_params)
    it = job.run(checkpoint_path=ckpt, checkpoint_every=2)
    first = next(it)  # consumer saw chunk 1; chunk 2 already saved
    assert first[0] == 2
    it.close()  # crash after the first yield
    resumed = list(TransferJob(content, style, cfg, params=vgg_params).run(
        checkpoint_path=ckpt, checkpoint_every=2, resume=True))
    assert [d for d, _, _ in resumed] == [6]  # resumes from the step-4 save
    np.testing.assert_array_equal(resumed[-1][1], full[-1][1])
    assert resumed[-1][2] == full[-1][2]


def test_unknown_optimizer_raises(images, vgg_params):
    content, style = images
    cfg = Config(optimizer="sgd", base_diameter=16, levels_num=1)
    with pytest.raises(RuntimeError, match="Unknown optimizer"):
        TransferJob(content, style, cfg, params=vgg_params)


def test_unknown_model_raises(images, vgg_params):
    content, style = images
    cfg = Config(model="alexnet", base_diameter=16, levels_num=1)
    with pytest.raises(ValueError, match="not supported"):
        TransferJob(content, style, cfg, params=vgg_params)


def test_unknown_init_method_raises(images, vgg_params):
    content, style = images
    cfg = Config(init_method="zeros", base_diameter=16, levels_num=1)
    with pytest.raises(ValueError, match="init_method"):
        TransferJob(content, style, cfg, params=vgg_params)


def test_lbfgs_direction_matrix_matches_loop():
    """The MXU-batched matrix form of the two-loop recursion is the same
    math as the textbook loop form: identical directions (up to f32
    summation-order noise) on empty, partially filled, and wrapped
    circular histories."""
    rng = np.random.default_rng(11)
    n, m = 257, 7

    for count in (0, 1, 3, m, m + 4):
        s_rows = rng.standard_normal((m, n)).astype(np.float32) * 1e-2
        # positive-curvature pairs (s.y > 0) — the ys > 1e-10 store guard
        # means real histories never hold anything else
        y_rows = (s_rows * rng.uniform(0.5, 2.0, (m, 1)).astype(np.float32)
                  + rng.standard_normal((m, n)).astype(np.float32) * 1e-3)
        # unfilled slots must be zero like init_state leaves them
        k = min(count, m)
        live = [(count - 1 - j) % m for j in range(k)]
        mask = np.zeros((m, 1), np.float32)
        mask[live] = 1.0
        s_hist = jnp.asarray(s_rows * mask)
        y_hist = jnp.asarray(y_rows * mask)
        rho = jnp.asarray(
            (mask[:, 0] / np.maximum(
                np.einsum("mn,mn->m", s_rows * mask, y_rows * mask),
                1e-8)).astype(np.float32))
        g = jnp.asarray(rng.standard_normal(n).astype(np.float32))
        state = lbfgs_mod.LbfgsState(
            s_hist=s_hist, y_hist=y_hist, rho=rho,
            count=jnp.int32(count), f=jnp.float32(0.0), g=g,
            n_evals=jnp.int32(1), n_iter=jnp.int32(count))

        d_loop = np.asarray(
            lbfgs_mod._two_loop_direction(g, state, impl="loop"))
        d_mat = np.asarray(
            lbfgs_mod._two_loop_direction(g, state, impl="matrix"))
        np.testing.assert_allclose(
            d_mat, d_loop, rtol=2e-4, atol=2e-4 * np.abs(d_loop).max(),
            err_msg=f"count={count}")


def test_lbfgs_matrix_direction_minimizes_quadratic():
    """Full lbfgs_step with the matrix direction (the production default)
    reaches the quadratic optimum just like the loop form."""
    rng = np.random.default_rng(3)
    n = 16
    a = rng.standard_normal((n, n)).astype(np.float32)
    A = a @ a.T + np.eye(n, dtype=np.float32) * 0.5
    b = rng.standard_normal(n).astype(np.float32)
    x_opt = np.linalg.solve(A, b)
    A_j, b_j = jnp.asarray(A), jnp.asarray(b)

    def loss_grad(x):
        return 0.5 * x @ A_j @ x - b_j @ x, A_j @ x - b_j

    for impl in ("matrix", "loop"):
        x = jnp.zeros(n)
        state = lbfgs_mod.init_state(loss_grad, x, history=8)
        for _ in range(30):
            x, state = lbfgs_mod.lbfgs_step(
                loss_grad, x, state, jnp.float32(1.0), direction_impl=impl)
        np.testing.assert_allclose(np.asarray(x), x_opt, rtol=1e-3,
                                   atol=1e-3, err_msg=impl)


def test_lbfgs_t_init_unit_accepts_newton_step_in_one_eval():
    """t_init='unit': once a curvature pair exists, the gamma-scaled
    direction on an isotropic quadratic IS the Newton step, so the t=1
    trial satisfies strong Wolfe immediately — exactly one line-search
    eval — and lands on the optimum."""
    n = 4
    a = jnp.float32(2.0)

    def loss_grad(x):
        return 0.5 * a * jnp.dot(x, x), a * x

    x = jnp.full((n,), 0.5, jnp.float32)
    state = lbfgs_mod.init_state(loss_grad, x, history=4)
    # step 1: no history -> falls back to the 'lr' opening trial
    x, state = lbfgs_mod.lbfgs_step(loss_grad, x, state, jnp.float32(0.1),
                                    t_init="unit")
    assert int(state.count) == 1
    evals_before = int(state.n_evals)
    # step 2: gamma = s.y/y.y = 1/a -> exact Newton direction; t=1 accepted
    x, state = lbfgs_mod.lbfgs_step(loss_grad, x, state, jnp.float32(0.1),
                                    t_init="unit")
    assert int(state.n_evals) - evals_before == 1
    np.testing.assert_allclose(np.asarray(x), np.zeros(n), atol=1e-6)


def test_lbfgs_t_init_validation_and_lr_default_unchanged():
    """Unknown t_init raises; t_init='lr' is bit-identical to the default
    (the knob must not perturb the torch-parity path)."""
    n = 8
    rng = np.random.default_rng(11)
    A = np.diag(rng.uniform(0.5, 3.0, n)).astype(np.float32)
    b = rng.standard_normal(n).astype(np.float32)
    A_j, b_j = jnp.asarray(A), jnp.asarray(b)

    def loss_grad(x):
        return 0.5 * x @ A_j @ x - b_j @ x, A_j @ x - b_j

    x0 = jnp.zeros(n)
    state0 = lbfgs_mod.init_state(loss_grad, x0, history=4)
    with pytest.raises(ValueError, match="t_init"):
        lbfgs_mod.lbfgs_step(loss_grad, x0, state0, jnp.float32(1.0),
                             t_init="bogus")
    x_d, st_d = lbfgs_mod.lbfgs_step(loss_grad, x0, state0, jnp.float32(1.0))
    x_l, st_l = lbfgs_mod.lbfgs_step(loss_grad, x0, state0, jnp.float32(1.0),
                                     t_init="lr")
    np.testing.assert_array_equal(np.asarray(x_d), np.asarray(x_l))
    assert int(st_d.n_evals) == int(st_l.n_evals)


def test_lbfgs_t_init_unit_engine_end_to_end(images, vgg_params):
    """config.lbfgs_t_init='unit' through the full engine: runs, reduces
    the loss, and compiles as a distinct graph (separate cache key)."""
    from artstyletransfer_tpu.engine.transfer import _config_key

    content, style = images
    cfg = Config(levels_num=1, iters_num=6, base_diameter=16,
                 optimizer="lbfgs", stream_every=6, lbfgs_history=4,
                 lbfgs_t_init="unit")
    job = TransferJob(content, style, cfg, params=vgg_params)
    start = job.initial_loss()
    final = [f for _, _, f in job.run()][-1]
    assert final < start
    base = Config(levels_num=1, base_diameter=16, optimizer="lbfgs")
    assert (_config_key(cfg, job.level_shapes)
            != _config_key(base, job.level_shapes))


def test_lbfgs_incremental_grams_track_recompute():
    """lbfgs_grams='incremental' (S Yᵀ / Y Yᵀ carried in the state and
    refreshed one row+column per step) follows the recompute mode
    step-for-step through full lbfgs_step trajectories — across empty,
    partial, and wrapped histories — and the carried Grams always equal
    the exact Grams of the current buffers."""
    rng = np.random.default_rng(5)
    n, m = 16, 4
    a = rng.standard_normal((n, n)).astype(np.float32)
    A = a @ a.T + np.eye(n, dtype=np.float32) * 0.5
    b = rng.standard_normal(n).astype(np.float32)
    A_j, b_j = jnp.asarray(A), jnp.asarray(b)

    def loss_grad(x):
        return 0.5 * x @ A_j @ x - b_j @ x, A_j @ x - b_j

    x_r = x_i = jnp.zeros(n)
    st_r = lbfgs_mod.init_state(loss_grad, x_r, history=m)
    st_i = lbfgs_mod.init_state(loss_grad, x_i, history=m,
                                track_grams=True)
    assert st_r.sy_gram is None and st_r.yy_gram is None
    assert st_i.sy_gram.shape == (m, m)

    for step in range(3 * m + 2):  # runs well past the first wrap
        x_r, st_r = lbfgs_mod.lbfgs_step(loss_grad, x_r, st_r,
                                         jnp.float32(1.0))
        x_i, st_i = lbfgs_mod.lbfgs_step(loss_grad, x_i, st_i,
                                         jnp.float32(1.0))
        np.testing.assert_allclose(np.asarray(x_i), np.asarray(x_r),
                                   rtol=1e-4, atol=1e-5,
                                   err_msg=f"step {step}")
        # the carried Grams are the from-scratch Grams of the buffers
        # (unfilled rows are zero in both)
        sh, yh = np.asarray(st_i.s_hist), np.asarray(st_i.y_hist)
        np.testing.assert_allclose(np.asarray(st_i.sy_gram), sh @ yh.T,
                                   rtol=1e-5, atol=1e-7)
        np.testing.assert_allclose(np.asarray(st_i.yy_gram), yh @ yh.T,
                                   rtol=1e-5, atol=1e-7)
    assert int(st_i.count) > m  # the wrap actually happened


def test_lbfgs_grams_engine_end_to_end(images, vgg_params):
    """config.lbfgs_grams='incremental' through the full engine: runs,
    reduces the loss, and compiles as a distinct graph (separate cache
    key); unknown values fail loudly."""
    import dataclasses

    from artstyletransfer_tpu.engine.transfer import _config_key

    content, style = images
    cfg = Config(levels_num=1, iters_num=6, base_diameter=16,
                 optimizer="lbfgs", stream_every=6, lbfgs_history=4,
                 lbfgs_grams="incremental")
    job = TransferJob(content, style, cfg, params=vgg_params)
    start = job.initial_loss()
    final = [f for _, _, f in job.run()][-1]
    assert final < start
    base = dataclasses.replace(cfg, lbfgs_grams="recompute")
    assert (_config_key(cfg, job.level_shapes)
            != _config_key(base, job.level_shapes))
    bad = dataclasses.replace(cfg, lbfgs_grams="nope")
    with pytest.raises(ValueError, match="lbfgs_grams"):
        TransferJob(content, style, bad, params=vgg_params).initial_loss()


def test_lbfgs_direction_matrix_matches_loop_vmapped():
    """The matrix direction under vmap (the batched ref-semantics serving
    path) equals the loop form per batch row."""
    rng = np.random.default_rng(17)
    b, n, m = 3, 129, 5
    s = rng.standard_normal((b, m, n)).astype(np.float32) * 1e-2
    y = (s * rng.uniform(0.5, 2.0, (b, m, 1)).astype(np.float32)
         + rng.standard_normal((b, m, n)).astype(np.float32) * 1e-3)
    rho = (1.0 / np.maximum(np.einsum("bmn,bmn->bm", s, y), 1e-8)
           ).astype(np.float32)
    g = rng.standard_normal((b, n)).astype(np.float32)
    counts = np.array([m, 2, m + 3], np.int32)  # full, partial, wrapped
    # zero unfilled slots per row, as init_state leaves them
    for i, cnt in enumerate(counts):
        k = min(int(cnt), m)
        live = [(int(cnt) - 1 - j) % m for j in range(k)]
        mask = np.zeros(m, bool)
        mask[live] = True
        s[i, ~mask] = 0.0
        y[i, ~mask] = 0.0
        rho[i, ~mask] = 0.0

    def direction(impl, s, y, rho, cnt, g):
        st = lbfgs_mod.LbfgsState(
            s_hist=s, y_hist=y, rho=rho, count=cnt,
            f=jnp.float32(0.0), g=g, n_evals=jnp.int32(1),
            n_iter=cnt)
        return lbfgs_mod._two_loop_direction(g, st, impl=impl)

    import functools

    for impl in ("matrix", "loop"):
        fn = jax.vmap(functools.partial(direction, impl))
        out = np.asarray(fn(jnp.asarray(s), jnp.asarray(y),
                            jnp.asarray(rho), jnp.asarray(counts),
                            jnp.asarray(g)))
        if impl == "matrix":
            d_mat = out
        else:
            d_loop = out
    np.testing.assert_allclose(d_mat, d_loop, rtol=2e-4,
                               atol=2e-4 * np.abs(d_loop).max())


def test_lbfgs_freezes_on_non_descent_direction():
    """torch parity (torch lbfgs.py `if gtd > -tolerance_change: break`):
    a direction whose slope is not meaningfully negative makes the step a
    complete no-op — x, loss, grad, and history all unchanged (r4 fix; the
    old behavior substituted a steepest-descent step and diverged from the
    reference trajectory in the near-converged regime)."""
    def loss_grad(x):
        return 0.5 * jnp.sum(x * x), x

    x = jnp.zeros(8, jnp.float32)  # exact minimum: g = 0 -> dphi0 = 0
    state = lbfgs_mod.init_state(loss_grad, x, history=4)
    x2, s2 = lbfgs_mod.lbfgs_step(loss_grad, x, state, jnp.float32(1.0))
    np.testing.assert_array_equal(np.asarray(x2), np.asarray(x))
    assert int(s2.count) == int(state.count)
    np.testing.assert_array_equal(np.asarray(s2.g), np.asarray(state.g))
    assert float(s2.f) == float(state.f)
    # a genuinely descending start still moves (the guard is not a brake)
    x3 = jnp.full((8,), 3.0, jnp.float32)
    st3 = lbfgs_mod.init_state(loss_grad, x3, history=4)
    x4, _s4 = lbfgs_mod.lbfgs_step(loss_grad, x3, st3, jnp.float32(1.0))
    assert float(jnp.max(jnp.abs(x4 - x3))) > 0.0


def test_reference_equivalent_steps():
    """The reference counts closure evaluations (2 per ref-semantics L-BFGS
    step), ours counts optimizer steps (PARITY optimizer notes r4)."""
    import dataclasses

    from artstyletransfer_tpu.config import reference_equivalent_steps

    adam = Config(optimizer="adam")
    assert reference_equivalent_steps(adam, 500) == 500
    ref = dataclasses.replace(adam, optimizer="lbfgs", lbfgs_max_ls_steps=0)
    assert reference_equivalent_steps(ref, 500) == 250
    assert reference_equivalent_steps(ref, 1) == 1  # floor of 1
    fw = dataclasses.replace(adam, optimizer="lbfgs")
    with pytest.raises(ValueError):
        reference_equivalent_steps(fw, 500)


# ---------------------------------------------------------------------------
# Convergence early-stop (config.stop_tol)
# ---------------------------------------------------------------------------


def test_stop_tol_early_stops_single_job(tmp_path, images, vgg_params):
    """stop_tol > 0 ends the run once the loss stops changing across a
    chunk; the final yield carries the image like a normal completion,
    and a converged stop writes the checkpoint. lr_start=0 freezes the
    Adam trajectory, so chunk 2's loss is bitwise chunk 1's — the
    deterministic stand-in for the measured converged-tail plateau
    (PARITY: 9 no-progress line-search evals/step after step ~400)."""
    import dataclasses
    import os

    content, style = images
    cfg = Config(levels_num=1, iters_num=20, base_diameter=16,
                 optimizer="adam", stream_every=5, lr_start=0.0,
                 stop_tol=1e-6)
    job = TransferJob(content, style, cfg, params=vgg_params)
    ckpt = str(tmp_path / "early.ckpt")
    out = list(job.run(checkpoint_path=ckpt, checkpoint_every=100))
    assert [d for d, _, _ in out] == [5, 10]
    assert out[-1][1] is not None and out[-1][1].shape[2] == 3
    assert all(isinstance(f, float) for _, _, f in out)
    assert os.path.exists(ckpt)  # converged stop persists like completion
    # resuming that converged checkpoint yields the completed state once
    # (done=10 < iters, but the stop bookkeeping marks the run complete)
    again = list(TransferJob(content, style, cfg, params=vgg_params).run(
        checkpoint_path=ckpt, checkpoint_every=100, resume=True))
    assert len(again) == 1 and again[0][0] == 10
    np.testing.assert_array_equal(again[0][1], out[-1][1])

    # no-image mode: intermediate chunks stay image-free, the converged
    # final chunk still materializes
    out_n = list(TransferJob(content, style, cfg, params=vgg_params)
                 .run(yield_images=False))
    assert [d for d, _, _ in out_n] == [5, 10]
    assert out_n[0][1] is None and out_n[-1][1] is not None

    # default stop_tol=0 = reference parity: the same frozen run still
    # walks the full budget
    cfg0 = dataclasses.replace(cfg, stop_tol=0.0)
    out0 = list(TransferJob(content, style, cfg0, params=vgg_params).run())
    assert [d for d, _, _ in out0] == [5, 10, 15, 20]


def test_stop_tol_keeps_running_while_improving(images, vgg_params):
    """A still-improving run never trips an (absurdly tight) tolerance."""
    content, style = images
    cfg = Config(levels_num=1, iters_num=15, base_diameter=16,
                 optimizer="adam", stream_every=5, stop_tol=1e-12)
    out = list(TransferJob(content, style, cfg,
                           params=vgg_params).run())
    assert [d for d, _, _ in out] == [5, 10, 15]


def test_stop_tol_early_stops_batched(images, vgg_params):
    """The batched runner stops a group when EVERY job has converged."""
    from artstyletransfer_tpu.parallel.batch import BatchedTransferJob

    content, style = images
    cfg = Config(levels_num=1, iters_num=20, base_diameter=16,
                 optimizer="adam", stream_every=5, lr_start=0.0,
                 stop_tol=1e-6)
    batch = BatchedTransferJob([content] * 2, [style] * 2, cfg,
                               params=vgg_params)
    out = list(batch.run())
    assert [d for d, _, _ in out] == [5, 10]
    assert out[-1][1].shape[0] == 2 and out[-1][2].shape == (2,)


def test_stop_tol_async_generator_reports_100(images, vgg_params):
    """The reference-API generator re-emits the final image at percent=100
    when a run early-stops below the budget (Executor.wait, the lab's
    result page and the bot's "Done!" all key completion on >= 100)."""
    import dataclasses

    content, style = images
    pair = ContentStylePair(("c.jpg", content), ("s.jpg", style))
    cfg = dataclasses.replace(
        Config(levels_num=1, iters_num=20, base_diameter=16,
               optimizer="adam", stream_every=5),
        lr_start=0.0, stop_tol=1e-6)

    async def collect():
        out = []
        async for percent, img in neural_style_transfer(
                pair, cfg.content_weight, cfg.style_weight, cfg.tv_weight,
                "adam", "vgg19", "content+noise", iters_num=20,
                levels_num=1, noise_factor=cfg.noise_factor,
                noise_levels=cfg.noise_levels,
                noise_levels_central_amplitude=cfg.noise_levels_central_amplitude,
                noise_levels_peripheral_amplitude=cfg.noise_levels_peripheral_amplitude,
                noise_levels_dispersion=cfg.noise_levels_dispersion,
                params=vgg_params, config=cfg):
            out.append((percent, img))
        return out

    out = asyncio.run(collect())
    # stopped after chunk 2 of 4, then one synthetic completion update
    assert [p for p, _ in out] == [25.0, 50.0, 100.0]
    assert out[-1][1] is not None
    np.testing.assert_array_equal(out[-1][1], out[1][1])


def test_stop_shrink_per_job_early_exit(images, vgg_params):
    """cfg.stop_shrink: a converged job leaves the batch at the chunk
    boundary (result frozen there, like a single-job stop) while the rest
    re-form at a smaller batch and keep optimizing; without shrinking the
    group-stop waits for the slowest lane. Calibration is pinned to the
    canonical test env like the goldens: at this shape the chunk-2
    relative changes are ~1.15 (job0) vs ~1.46 (job1), so tol=1.3
    converges job0 at step 10 and job1 at step 15."""
    import dataclasses

    from artstyletransfer_tpu.parallel.batch import BatchedTransferJob

    content, style = images
    content2 = np.random.default_rng(123).random(
        content.shape).astype(np.float32)
    cfg = Config(levels_num=1, iters_num=30, base_diameter=16,
                 optimizer="adam", stream_every=5, stop_tol=1.3)

    b = BatchedTransferJob([content, content2], [style, style], cfg,
                           params=vgg_params)
    out = list(b.run())
    assert [d for d, _, _ in out] == [5, 10, 15]
    assert all(i.shape[0] == 2 and l.shape == (2,) for _, i, l in out)
    # job0 froze at its step-10 state (bit-exact image and loss) ...
    assert out[-1][2][0] == out[1][2][0]
    np.testing.assert_array_equal(out[-1][1][0], out[1][1][0])
    # ... while job1 kept improving in the shrunken batch
    assert out[-1][2][1] < out[1][2][1]

    # initial padding lanes (pad_batch_to) are shed by the same shrink
    bp = BatchedTransferJob([content, content2], [style, style], cfg,
                            params=vgg_params, pad_batch_to=4)
    outp = list(bp.run())
    assert [d for d, _, _ in outp] == [5, 10, 15]
    assert outp[-1][2].shape == (2,)
    assert outp[-1][2][0] == outp[1][2][0]

    # group-stop (shrink off): job0 rides along until EVERY job converges
    # at step 15, so it keeps optimizing past its own convergence
    cfg_group = dataclasses.replace(cfg, stop_shrink=False)
    bg = BatchedTransferJob([content, content2], [style, style], cfg_group,
                            params=vgg_params)
    outg = list(bg.run())
    assert [d for d, _, _ in outg] == [5, 10, 15]
    assert outg[-1][2][0] < out[-1][2][0]


def test_stop_tol_group_latches_convergence(images, vgg_params):
    """Convergence latches per job: in group-stop mode (stop_shrink off) a
    job that converged once counts as done even if a later chunk's loss
    oscillation pushes its change back over tol — otherwise staggered
    convergence would require every job to re-converge in the SAME chunk.
    Calibration (canonical test env, probed like the goldens): at
    tol=0.0498 job1's change dips to 0.0415 at step 35, swings back to
    0.0521 at step 40, and job0 first converges at step 40 (0.0475) —
    latched group-stop ends at 40; chunk-local re-derivation would not
    stop before 50."""
    import dataclasses

    from artstyletransfer_tpu.parallel.batch import BatchedTransferJob

    content, style = images
    content2 = np.random.default_rng(123).random(
        content.shape).astype(np.float32)
    cfg = Config(levels_num=1, iters_num=60, base_diameter=16,
                 optimizer="adam", stream_every=5, stop_tol=0.0498,
                 stop_shrink=False)
    b = BatchedTransferJob([content, content2], [style, style], cfg,
                           params=vgg_params)
    out = list(b.run(yield_images=False))
    assert out[-1][0] == 40
    assert out[-1][1] is not None  # converged stop materializes

    # shrink mode at the same tol: job1 exits at its own latch point (35)
    cfg_s = dataclasses.replace(cfg, stop_shrink=True)
    bs = BatchedTransferJob([content, content2], [style, style], cfg_s,
                            params=vgg_params)
    outs = list(bs.run(yield_images=False))
    assert outs[-1][0] == 40
    # job1 froze at step 35; job0 ran to its own convergence at 40
    step35 = [o for o in outs if o[0] == 35][0]
    assert outs[-1][2][1] == step35[2][1]


def test_stop_tol_nan_surfaces_immediately(images, vgg_params):
    """With stop_tol the loss is host-fetched every chunk; a NaN must
    raise THERE, not after the remaining budget burns (single + batched)."""
    import dataclasses

    from artstyletransfer_tpu.parallel.batch import BatchedTransferJob

    content, style = images
    # lr large enough to blow Adam up at 16px within a few steps
    cfg = Config(levels_num=1, iters_num=40, base_diameter=16,
                 optimizer="adam", stream_every=5, lr_start=1e18,
                 stop_tol=1e-6)
    job = TransferJob(content, style, cfg, params=vgg_params)
    steps_seen = []
    with pytest.raises(FloatingPointError):
        for d, _i, _f in job.run(yield_images=False):
            steps_seen.append(d)
    assert len(steps_seen) < 8  # raised long before the 8-chunk budget

    b = BatchedTransferJob([content, content], [style, style],
                           dataclasses.replace(cfg), params=vgg_params)
    steps_seen = []
    with pytest.raises(FloatingPointError):
        for d, _i, _f in b.run(yield_images=False):
            steps_seen.append(d)
    assert len(steps_seen) < 8


def test_stop_tol_latch_survives_checkpoint_resume(tmp_path, images,
                                                   vgg_params):
    """The stop bookkeeping (latched set + previous losses) persists in
    the checkpoint: a run interrupted after a latch resumes and stops at
    the same step with bit-exact results; resuming a converged-stopped
    checkpoint yields the final state instead of optimizing further."""
    from artstyletransfer_tpu.parallel.batch import BatchedTransferJob

    content, style = images
    content2 = np.random.default_rng(123).random(
        content.shape).astype(np.float32)
    # group mode (stop_shrink off keeps the whole batch together): job1
    # latches at step 35, job0 converges at 40 (calibration above)
    cfg = Config(levels_num=1, iters_num=60, base_diameter=16,
                 optimizer="adam", stream_every=5, stop_tol=0.0498,
                 stop_shrink=False)
    args = ([content, content2], [style, style])
    full = list(BatchedTransferJob(*args, cfg, params=vgg_params)
                .run(yield_images=False))
    assert full[-1][0] == 40

    ckpt = str(tmp_path / "latch.ckpt")
    it = BatchedTransferJob(*args, cfg, params=vgg_params).run(
        yield_images=False, checkpoint_path=ckpt, checkpoint_every=5)
    for d, _i, _f in it:
        if d >= 35:   # interrupt after job1's latch landed in the ckpt
            it.close()
            break
    resumed = list(BatchedTransferJob(*args, cfg, params=vgg_params).run(
        yield_images=False, checkpoint_path=ckpt, checkpoint_every=5,
        resume=True))
    assert resumed[-1][0] == 40  # same stop step as the uninterrupted run
    np.testing.assert_array_equal(resumed[-1][1], full[-1][1])
    np.testing.assert_array_equal(resumed[-1][2], full[-1][2])

    # the converged stop wrote a final checkpoint: a later resume yields
    # the completed state once instead of optimizing past the stop
    again = list(BatchedTransferJob(*args, cfg, params=vgg_params).run(
        yield_images=False, checkpoint_path=ckpt, checkpoint_every=5,
        resume=True))
    assert len(again) == 1 and again[0][0] == 40
    # the completed-resume path recomputes the loss AT the final x, while
    # the run yields the optimizer's pre-update loss (one step stale by
    # construction) — same state, slightly fresher number
    np.testing.assert_allclose(again[0][2], full[-1][2], rtol=0.05)
    np.testing.assert_array_equal(again[0][1], full[-1][1])


def test_warm_shrink_gathers_precompiles_ladder(images, vgg_params):
    """warm_shrink_gathers AOT-compiles the fused gather for every
    (batch -> pow2) pair, and is a no-op when shrinking cannot engage."""
    import dataclasses

    from artstyletransfer_tpu.parallel.batch import BatchedTransferJob

    content, style = images
    cfg = Config(levels_num=1, iters_num=20, base_diameter=16,
                 optimizer="adam", stream_every=5, stop_tol=1e-4)
    b = BatchedTransferJob([content] * 4, [style] * 4, cfg,
                           params=vgg_params)
    assert b.warm_shrink_gathers() == 2  # 4->1 and 4->2
    off = dataclasses.replace(cfg, stop_tol=0.0)
    b_off = BatchedTransferJob([content] * 4, [style] * 4, off,
                               params=vgg_params)
    assert b_off.warm_shrink_gathers() == 0


def test_lbfgs_state_dtype_bf16_minimizes_quadratic():
    """lbfgs_state_dtype='bfloat16': the (m, n) history buffers are stored
    bf16 (rho and the carried Grams stay f32), and full lbfgs_step
    trajectories still reach the quadratic optimum — with and without the
    incremental Grams, matrix and loop directions."""
    rng = np.random.default_rng(3)
    n = 16
    a = rng.standard_normal((n, n)).astype(np.float32)
    A = a @ a.T + np.eye(n, dtype=np.float32) * 0.5
    b = rng.standard_normal(n).astype(np.float32)
    x_opt = np.linalg.solve(A, b)
    A_j, b_j = jnp.asarray(A), jnp.asarray(b)

    def loss_grad(x):
        return 0.5 * x @ A_j @ x - b_j @ x, A_j @ x - b_j

    for impl, grams in (("matrix", False), ("matrix", True), ("loop", False)):
        x = jnp.zeros(n)
        state = lbfgs_mod.init_state(loss_grad, x, history=8,
                                     track_grams=grams,
                                     state_dtype=jnp.bfloat16)
        assert state.s_hist.dtype == jnp.bfloat16
        assert state.y_hist.dtype == jnp.bfloat16
        assert state.rho.dtype == jnp.float32
        if grams:
            assert state.sy_gram.dtype == jnp.float32
        for _ in range(30):
            x, state = lbfgs_mod.lbfgs_step(
                loss_grad, x, state, jnp.float32(1.0), direction_impl=impl)
        # bf16 curvature pairs (8-bit mantissa) reach the same optimum at
        # a correspondingly looser tolerance
        np.testing.assert_allclose(np.asarray(x), x_opt, rtol=2e-2,
                                   atol=2e-2, err_msg=f"{impl}/{grams}")
        if grams:
            # the carried Grams still equal the exact Grams of the
            # (quantized) buffers — f32 dots of the stored bf16 rows
            sh = np.asarray(state.s_hist).astype(np.float32)
            yh = np.asarray(state.y_hist).astype(np.float32)
            got_p = np.asarray(state.sy_gram)
            np.testing.assert_allclose(
                got_p * (1 - np.eye(8)), (sh @ yh.T) * (1 - np.eye(8)),
                rtol=1e-3, atol=1e-5)
            np.testing.assert_allclose(np.asarray(state.yy_gram), yh @ yh.T,
                                       rtol=1e-3, atol=1e-5)


def test_lbfgs_state_dtype_bf16_direction_close_to_f32():
    """The direction computed from a bf16-quantized history is the f32
    direction up to quantization noise (same history values cast down),
    for partial and wrapped histories and both lowerings."""
    rng = np.random.default_rng(11)
    n, m = 257, 7

    for count in (1, 3, m + 4):
        s_rows = rng.standard_normal((m, n)).astype(np.float32) * 1e-2
        y_rows = (s_rows * rng.uniform(0.5, 2.0, (m, 1)).astype(np.float32)
                  + rng.standard_normal((m, n)).astype(np.float32) * 1e-3)
        k = min(count, m)
        live = [(count - 1 - j) % m for j in range(k)]
        mask = np.zeros((m, 1), np.float32)
        mask[live] = 1.0
        rho = jnp.asarray(
            (mask[:, 0] / np.maximum(
                np.einsum("mn,mn->m", s_rows * mask, y_rows * mask),
                1e-8)).astype(np.float32))
        g = jnp.asarray(rng.standard_normal(n).astype(np.float32))

        def state_for(dt):
            return lbfgs_mod.LbfgsState(
                s_hist=jnp.asarray(s_rows * mask).astype(dt),
                y_hist=jnp.asarray(y_rows * mask).astype(dt),
                rho=rho, count=jnp.int32(count), f=jnp.float32(0.0), g=g,
                n_evals=jnp.int32(1), n_iter=jnp.int32(count))

        d_f32 = np.asarray(lbfgs_mod._two_loop_direction(
            g, state_for(jnp.float32), impl="matrix"))
        for impl in ("matrix", "loop"):
            d_bf16 = np.asarray(lbfgs_mod._two_loop_direction(
                g, state_for(jnp.bfloat16), impl=impl))
            assert d_bf16.dtype == np.float32  # direction stays f32
            np.testing.assert_allclose(
                d_bf16, d_f32, rtol=3e-2, atol=3e-2 * np.abs(d_f32).max(),
                err_msg=f"count={count} impl={impl}")


def test_lbfgs_state_dtype_engine_end_to_end(images, vgg_params):
    """config.lbfgs_state_dtype='bfloat16' through the full engine: runs,
    reduces the loss, compiles as a distinct graph (separate cache key =
    checkpoint-fingerprint protection), halves the history HBM estimate,
    and unknown values fail loudly."""
    import dataclasses

    from artstyletransfer_tpu.engine.transfer import (
        _config_key, lbfgs_history_gb)

    content, style = images
    cfg = Config(levels_num=1, iters_num=6, base_diameter=16,
                 optimizer="lbfgs", stream_every=6, lbfgs_history=4,
                 lbfgs_state_dtype="bfloat16")
    job = TransferJob(content, style, cfg, params=vgg_params)
    start = job.initial_loss()
    final = [f for _, _, f in job.run()][-1]
    assert final < start
    base = dataclasses.replace(cfg, lbfgs_state_dtype="float32")
    assert (_config_key(cfg, job.level_shapes)
            != _config_key(base, job.level_shapes))
    assert lbfgs_history_gb(cfg, job.level_shapes) == pytest.approx(
        0.5 * lbfgs_history_gb(base, job.level_shapes))
    bad = dataclasses.replace(cfg, lbfgs_state_dtype="fp8")
    with pytest.raises(ValueError, match="lbfgs_state_dtype"):
        TransferJob(content, style, bad, params=vgg_params).initial_loss()
