"""Coverage for remaining paths: remat, CLI config resolution, cache helper,
single-job spatial sharding."""

import dataclasses

import numpy as np
import pytest

from artstyletransfer_tpu.config import Config
from artstyletransfer_tpu.engine.transfer import TransferJob
from artstyletransfer_tpu.frontends.cli import build_parser, config_from_args
from artstyletransfer_tpu.parallel import BatchedTransferJob
from artstyletransfer_tpu.parallel.mesh import jobs_space_mesh


@pytest.fixture(scope="module")
def images():
    rng = np.random.default_rng(21)
    return (rng.random((32, 48, 3)).astype(np.float32),
            rng.random((24, 24, 3)).astype(np.float32))


def test_remat_levels_matches_plain(images, vgg_params):
    """jax.checkpoint around level passes must not change results."""
    content, style = images
    base = Config(levels_num=2, iters_num=3, base_diameter=16,
                  optimizer="adam", stream_every=3)
    plain = TransferJob(content, style, base, params=vgg_params)
    _, img_a, loss_a = list(plain.run())[-1]
    remat = TransferJob(content, style,
                        dataclasses.replace(base, remat_levels=True),
                        params=vgg_params)
    _, img_b, loss_b = list(remat.run())[-1]
    np.testing.assert_allclose(loss_a, loss_b, rtol=1e-5)
    np.testing.assert_allclose(img_a, img_b, rtol=1e-4, atol=1e-5)


def test_single_job_spatial_mesh(images, vgg_params):
    """One job sharded over a pure 'space' axis (the 2K scale-out shape)."""
    content, style = images
    cfg = Config(levels_num=1, iters_num=2, base_diameter=16,
                 optimizer="adam", stream_every=2)
    mesh = jobs_space_mesh(1, 4)
    batch = BatchedTransferJob([content], [style], cfg, params=vgg_params,
                               mesh=mesh, shard_space=True)
    done, imgs, losses = list(batch.run())[-1]
    assert done == 2 and imgs.shape[0] == 1 and np.isfinite(losses).all()

    # matches the unsharded result
    single = TransferJob(content, style, cfg, params=vgg_params)
    _, img_ref, loss_ref = list(single.run())[-1]
    np.testing.assert_allclose(losses[0], loss_ref, rtol=1e-4)
    np.testing.assert_allclose(imgs[0], img_ref, rtol=1e-3, atol=1e-4)


def test_cli_config_resolution():
    parser = build_parser()
    args = parser.parse_args([
        "--content", "c.jpg", "--style", "s.jpg", "--output", "o.jpg",
        "--preset", "light_gauss", "--iters", "42", "--optimizer", "adam"])
    cfg = config_from_args(args)
    # preset fields survive...
    assert cfg.style_weight == 1e3 and cfg.tv_weight == 0.0
    assert cfg.noise_levels == (32, 64, 128, -1, 0)
    # ...explicit flags override
    assert cfg.iters_num == 42 and cfg.optimizer == "adam"


def test_cli_no_use_relu_flag():
    parser = build_parser()
    args = parser.parse_args(["--content", "c", "--style", "s",
                              "--output", "o", "--no-use-relu"])
    assert config_from_args(args).use_relu is False
    args = parser.parse_args(["--content", "c", "--style", "s",
                              "--output", "o"])
    assert config_from_args(args).use_relu is True


def test_use_relu_in_config_key():
    """use_relu changes the traced graph, so it must key the compile cache."""
    from artstyletransfer_tpu.engine.transfer import _config_key

    shapes = ((1, 16, 16, 3),)
    assert (_config_key(Config(use_relu=False), shapes)
            != _config_key(Config(), shapes))


def test_cli_defaults_match_reference():
    parser = build_parser()
    args = parser.parse_args(["--content", "c", "--style", "s",
                              "--output", "o"])
    cfg = config_from_args(args)
    assert cfg == Config()  # reference config.py defaults


def test_compilation_cache_idempotent(tmp_path, monkeypatch):
    import jax

    from artstyletransfer_tpu.utils import cache

    # save/restore the process-wide state: leaving the real JAX compile
    # cache pointed at a pytest tmp dir would leak into every later test
    prev_dir = jax.config.jax_compilation_cache_dir
    monkeypatch.setattr(cache, "_enabled", False)
    try:
        cache.enable_compilation_cache(str(tmp_path / "c1"))
        assert cache._enabled
        cache.enable_compilation_cache(str(tmp_path / "c2"))  # no-op
    finally:
        jax.config.update("jax_compilation_cache_dir", prev_dir)


def test_bfloat16_compute_runs_and_tracks_f32(images, vgg_params):
    """compute_dtype=bfloat16 keeps taps in bf16 (halved layout traffic on
    TPU) while accumulating losses in f32; the result must stay close to
    the f32 trajectory over a few steps."""
    content, style = images
    base = Config(levels_num=2, iters_num=3, base_diameter=16,
                  optimizer="adam", stream_every=3)
    f32 = TransferJob(content, style, base, params=vgg_params)
    _, img32, loss32 = list(f32.run())[-1]
    bf16 = TransferJob(content, style,
                       dataclasses.replace(base, compute_dtype="bfloat16"),
                       params=vgg_params)
    _, img16, loss16 = list(bf16.run())[-1]
    assert np.isfinite(loss16)
    np.testing.assert_allclose(loss16, loss32, rtol=0.05)
    mse = float(np.mean((img16 - img32) ** 2))
    assert 10 * np.log10(1.0 / max(mse, 1e-12)) > 25.0


def test_production_config_platform_resolution(monkeypatch):
    """production_config: identity off-TPU; on TPU f32->bf16 (explicit
    dtypes untouched) and full-Wolfe L-BFGS opens the line search at the
    unit trial (r4) — never reference-semantics (max_ls=0) runs."""
    import jax

    from artstyletransfer_tpu.config import production_config

    # test env runs on CPU: identity (dtype, t_init, AND grams)
    assert production_config(Config()).compute_dtype == "float32"
    assert production_config(Config()).lbfgs_t_init == "lr"
    assert production_config(Config()).lbfgs_grams == "recompute"
    assert production_config(Config()).lbfgs_state_dtype == "float32"

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    # every optimizer runs bf16 on TPU since the r3 matrix two-loop
    # (the r1-r2 full-Wolfe f32 exception was a loop-direction artifact)
    assert production_config(Config()).compute_dtype == "bfloat16"
    assert production_config(
        Config(optimizer="adam")).compute_dtype == "bfloat16"
    assert production_config(
        Config(optimizer="lbfgs",
               lbfgs_max_ls_steps=0)).compute_dtype == "bfloat16"
    # a config that explicitly asks for a dtype keeps it
    explicit = Config(compute_dtype="bfloat16", optimizer="adam")
    assert production_config(explicit).compute_dtype == "bfloat16"
    # non-dtype fields survive the swap
    cfg = production_config(Config(levels_num=3, optimizer="adam"))
    assert cfg.levels_num == 3 and cfg.optimizer == "adam"
    assert cfg.compute_dtype == "bfloat16"

    # r4 unit opening trial: full-Wolfe L-BFGS flips 'lr' -> 'unit' ...
    assert production_config(Config()).lbfgs_t_init == "unit"  # default cfg
    assert production_config(
        Config(compute_dtype="bfloat16")).lbfgs_t_init == "unit"
    # ... but NEVER reference semantics (max_ls=0: the trial IS the step),
    # non-lbfgs optimizers, or an explicit t_init choice
    assert production_config(
        Config(lbfgs_max_ls_steps=0)).lbfgs_t_init == "lr"
    assert production_config(Config(optimizer="adam")).lbfgs_t_init == "lr"
    assert production_config(
        Config(lbfgs_t_init="unit")).lbfgs_t_init == "unit"

    # r4 carried Grams: matrix-direction L-BFGS flips 'recompute' ->
    # 'incremental' on TPU (incl. ref-semantics runs — the direction is
    # line-search independent); never the loop direction or non-lbfgs
    assert production_config(Config()).lbfgs_grams == "incremental"
    assert production_config(
        Config(lbfgs_max_ls_steps=0)).lbfgs_grams == "incremental"
    assert production_config(
        Config(lbfgs_direction="loop")).lbfgs_grams == "recompute"
    assert production_config(
        Config(optimizer="adam")).lbfgs_grams == "recompute"

    # r5 bf16-stored history: L-BFGS flips the s/y storage dtype on TPU
    # (measured +10.8% at the headline and the 2K/history=100 capacity
    # unlock; quality closed by exp_statedtype) — never non-lbfgs
    assert production_config(Config()).lbfgs_state_dtype == "bfloat16"
    assert production_config(
        Config(lbfgs_max_ls_steps=0)).lbfgs_state_dtype == "bfloat16"
    assert production_config(
        Config(optimizer="adam")).lbfgs_state_dtype == "float32"


def test_cli_compute_dtype_default_is_production(monkeypatch):
    """No --compute-dtype flag -> platform production precision; an
    explicit float32 opts out even on TPU."""
    import jax

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    parser = build_parser()
    args = parser.parse_args(["--content", "c", "--style", "s",
                              "--output", "o", "--optimizer", "adam"])
    assert config_from_args(args).compute_dtype == "bfloat16"
    args = parser.parse_args(["--content", "c", "--style", "s",
                              "--output", "o", "--optimizer", "adam",
                              "--compute-dtype", "float32"])
    assert config_from_args(args).compute_dtype == "float32"
    # the default optimizer (full-Wolfe L-BFGS) also runs bf16 since the
    # matrix two-loop direction (r3: 19.4 vs 17.8 steps/s at 512, 5.6-5.8
    # vs 5.0 at 1024; rounds 1-2 kept it f32 — a loop-direction artifact)
    args = parser.parse_args(["--content", "c", "--style", "s",
                              "--output", "o"])
    assert config_from_args(args).compute_dtype == "bfloat16"


def test_cli_lbfgs_t_init_default_is_production(monkeypatch):
    """No --lbfgs-t-init flag -> the unit opening trial on TPU (r4
    production default for full-Wolfe L-BFGS); an explicit 'lr' opts out
    even on TPU (torch's opening rule); ref-semantics runs never flip."""
    import jax

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    parser = build_parser()
    base = ["--content", "c", "--style", "s", "--output", "o"]
    assert config_from_args(parser.parse_args(base)).lbfgs_t_init == "unit"
    assert config_from_args(parser.parse_args(
        base + ["--lbfgs-t-init", "lr"])).lbfgs_t_init == "lr"
    assert config_from_args(parser.parse_args(
        base + ["--lbfgs-max-ls-steps", "0"])).lbfgs_t_init == "lr"
    # an explicit dtype must not disable the t_init production flip
    assert config_from_args(parser.parse_args(
        base + ["--compute-dtype", "float32"])).lbfgs_t_init == "unit"


def test_cli_lbfgs_grams_default_is_production(monkeypatch):
    """No --lbfgs-grams flag -> carried Grams on TPU (r4 production
    default for the matrix direction, incl. ref-semantics runs); an
    explicit 'recompute' opts out even on TPU; the loop direction never
    flips (it has no Grams to carry)."""
    import jax

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    parser = build_parser()
    base = ["--content", "c", "--style", "s", "--output", "o"]
    assert (config_from_args(parser.parse_args(base)).lbfgs_grams
            == "incremental")
    assert config_from_args(parser.parse_args(
        base + ["--lbfgs-grams", "recompute"])).lbfgs_grams == "recompute"
    assert config_from_args(parser.parse_args(
        base + ["--lbfgs-max-ls-steps", "0"])).lbfgs_grams == "incremental"
    assert config_from_args(parser.parse_args(
        base + ["--lbfgs-direction", "loop"])).lbfgs_grams == "recompute"


def test_cli_fused_style_bwd_flag():
    """fused_style_bwd is default-on and --no-fused-style-bwd opts out
    (graph-changing knob: must reach Config and the compile cache key)."""
    from artstyletransfer_tpu.engine.transfer import _config_key

    parser = build_parser()
    base = ["--content", "c", "--style", "s", "--output", "o"]
    on = config_from_args(parser.parse_args(base))
    off = config_from_args(parser.parse_args(base + ["--no-fused-style-bwd"]))
    assert on.fused_style_bwd and not off.fused_style_bwd
    shapes = ((1, 8, 8, 3),)
    assert _config_key(on, shapes) != _config_key(off, shapes)


def test_cli_lbfgs_direction_flag():
    parser = build_parser()
    args = parser.parse_args(["--content", "c", "--style", "s",
                              "--output", "o", "--lbfgs-direction", "loop"])
    assert config_from_args(args).lbfgs_direction == "loop"
    args = parser.parse_args(["--content", "c", "--style", "s",
                              "--output", "o"])
    assert config_from_args(args).lbfgs_direction == "matrix"


def test_lbfgs_direction_in_config_key():
    """The direction lowering changes the traced graph, so it must key the
    compile cache."""
    from artstyletransfer_tpu.engine.transfer import _config_key

    shapes = ((1, 16, 16, 3),)
    assert (_config_key(Config(lbfgs_direction="loop"), shapes)
            != _config_key(Config(), shapes))
