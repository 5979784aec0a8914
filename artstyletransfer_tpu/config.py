"""Configuration for the style-transfer engine.

Reference parity: mirrors the keyword defaults of the reference Config class
(reference config.py:3-31) and the module-level concurrency cap
(reference config.py:1), and adds TPU-native knobs (dtype, streaming cadence,
L-BFGS history, mesh layout) that have no reference counterpart.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

# Max style-transfer jobs optimizing concurrently (reference config.py:1).
# On TPU each job owns the chip while it runs a chunk of steps; the batched
# executor (parallel/batch.py) is the preferred way to run many jobs at once.
simultaneous_tasks_count = 2


@dataclasses.dataclass(frozen=True)
class Config:
    """All engine settings. Defaults match reference config.py:5-18."""

    # --- loss weights (reference config.py:6-8) ---
    content_weight: float = 1e3
    style_weight: float = 4e5
    tv_weight: float = 1e2

    # --- algorithm selection (reference config.py:9-11) ---
    optimizer: str = "lbfgs"            # 'lbfgs' | 'adam'
    model: str = "vgg19"                # 'vgg19'
    init_method: str = "content+noise"  # 'random' | 'content+noise' | 'style'
    use_relu: bool = True               # True: post-ReLU taps (reference
                                        # default); False: pre-ReLU conv taps
                                        # "as in the original paper"
                                        # (reference neural_nets.py:10,17-25).
                                        # conv4_2 is pre-ReLU either way.

    # --- pyramid / iteration counts (reference config.py:12-13) ---
    levels_num: int = 2                 # 4 for maximum resolution
    iters_num: int = 500                # 1500 for maximum quality

    # --- structured noise init (reference config.py:14-18) ---
    noise_factor: float = 0.95
    noise_levels: Tuple[int, ...] = (9, 18, 36, -1, 0)
    noise_levels_central_amplitude: Tuple[float, ...] = (0.30, 0.20, 0.10, 0.20, 0.20)
    noise_levels_peripheral_amplitude: Tuple[float, ...] = (0.20, 0.30, 0.40, 0.10, 0.00)
    noise_levels_dispersion: Tuple[float, ...] = (0.20, 0.30, 0.40, 0.60, 0.30)

    # --- optimizer hyperparameters (reference neural_style_transfer.py:367,
    #     :136 (lbfgs), :154-158 (x0.999/step decay)) ---
    lr_start: float = 10.0
    lr_decay: float = 0.999
    lr_decay_per_eval: bool = True      # reference semantics: the closure
                                        # decays lr on EVERY invocation, and
                                        # torch's strong-Wolfe line search
                                        # calls it several times per L-BFGS
                                        # step (reference
                                        # neural_style_transfer.py:154-158).
                                        # False = decay once per step.
    lbfgs_history: int = 100            # matches torch's history_size
                                        # default that the reference runs
                                        # with; lower to ~10 to cut HBM use
                                        # on 3level+ configs
    lbfgs_max_ls_steps: int = 25        # strong-Wolfe iteration budget per
                                        # step (torch max_ls). NOTE: the
                                        # reference's torch config
                                        # (max_iter=1, default max_eval)
                                        # makes torch pass max_ls=0 — zero
                                        # line-search iterations, one trial
                                        # point kept only if better. Set 0
                                        # for exact reference semantics; 25
                                        # (a real strong-Wolfe search, what
                                        # torch runs when max_eval allows)
                                        # converges far faster per step.
    lbfgs_direction: str = "matrix"     # two-loop lowering: 'matrix'
                                        # (MXU-batched Gram contractions;
                                        # measured 83.7 -> ~13 ms at
                                        # history=100/n=4.7M) | 'loop'
                                        # (textbook recursion, torch's
                                        # form). Identical math — see
                                        # engine/lbfgs.py.
    lbfgs_t_init: str = "lr"            # line search's first trial step:
                                        # 'lr' (torch parity: every search
                                        # opens at the decayed lr) |
                                        # 'unit' (quasi-Newton natural
                                        # t=1 once history exists — fewer
                                        # line-search evals on the
                                        # eval-bound full-Wolfe path, same
                                        # strong-Wolfe guarantees, not
                                        # torch's trajectory). See
                                        # engine/lbfgs.py::lbfgs_step.
    lbfgs_grams: str = "recompute"      # matrix direction's S Yᵀ / Y Yᵀ
                                        # Gram matrices: 'recompute' every
                                        # step (4·m²·n FLOPs, bitwise the
                                        # r3 behavior) | 'incremental'
                                        # (carry the (m, m) Grams in the
                                        # optimizer state, refresh the one
                                        # row+column a step can change via
                                        # three GEMVs — same matrices up
                                        # to dot-order ulps, no drift; the
                                        # win scales with history². Only
                                        # meaningful with
                                        # lbfgs_direction='matrix'.) See
                                        # engine/lbfgs.py::_update_grams.
    lbfgs_state_dtype: str = "float32"  # storage dtype of the (m, n) s/y
                                        # history buffers: 'float32'
                                        # (parity/default) | 'bfloat16'
                                        # (pairs quantized once at store
                                        # time; all contractions still
                                        # accumulate f32). Halves BOTH the
                                        # history's HBM footprint — the
                                        # capacity limit that forces
                                        # --lbfgs-history 10 on
                                        # 3level+/2K jobs (see
                                        # engine/transfer.py::
                                        # lbfgs_history_gb) — and the
                                        # direction's streamed bandwidth.
                                        # rho and the (m, m) Grams stay
                                        # f32. See
                                        # engine/lbfgs.py::init_state.

    # --- TPU-native knobs (no reference counterpart) ---
    base_diameter: int = 256            # level-0 shortest side
                                        # (reference neural_style_transfer.py:213)
    compute_dtype: str = "float32"      # 'float32' | 'bfloat16' conv compute
    conv_precision: str = "default"     # MXU pass count for f32 convs:
                                        # 'default' (bf16 passes, fastest) |
                                        # 'high' | 'highest' (f32 emulation)
    stream_every: int = 10              # steps per jitted chunk between
                                        # progress yields (reference yields every
                                        # step: neural_style_transfer.py:208)
    pipeline_streaming: bool = True     # image-streaming runs dispatch
                                        # chunk k+1 BEFORE materializing
                                        # chunk k's preview (one extra
                                        # on-device image copy), so the
                                        # device->host progress fetch and
                                        # the frontends' report hooks
                                        # overlap the next chunk's compute
                                        # instead of stalling the chip.
                                        # Host-side scheduling only — the
                                        # traced graph, the yielded values
                                        # and their order are identical
                                        # (not part of _config_key).
    seed: int = 0                       # PRNG seed for noise init

    # --- demonstration / ablation flags (reference
    #     neural_style_transfer.py:26-29 module-level booleans) ---
    demo_normal_noise: bool = False     # normal noise instead of style-pixel
                                        # permutation noise
    demo_no_gaussian_mask: bool = False  # skip the Gaussian envelopes
    demo_ignore_gradient_map: bool = False  # constant noise weight instead
                                        # of the Sobel-modulated map
    dump_masks_dir: str = ""            # SHOW_TEST_IMGS equivalent: dump the
                                        # noise map / gradient mask JPEGs
                                        # here (reference :315-323, :345-347)
    use_pallas: bool = False            # route Gram/TV through the Pallas
                                        # kernels (ops/pallas_kernels.py).
                                        # Measured on v5e: each kernel wins
                                        # in isolation (gram 1.77 vs 1.94ms,
                                        # tv 0.017 vs 0.024ms) but the
                                        # custom-call boundary breaks XLA
                                        # fusion around them and the full
                                        # step is ~15% slower — so the fused
                                        # XLA path is the default.
    pool_impl: str = "reduce_window"    # VGG maxpool lowering:
                                        # 'reduce_window' fuses into TPU
                                        # conv fusions (fastest single-chip);
                                        # 'reshape' ((h/2,2,w/2,2) split +
                                        # max over window axes) partitions
                                        # cleanly under SPMD space sharding
                                        # (the batched executor switches to
                                        # it automatically when
                                        # shard_space=True); 'slices'
                                        # (strided slices + maximum) is the
                                        # legacy SPMD variant — warning-free
                                        # but a stride-2 slice along the
                                        # sharded H axis replicates
                                        # everything after the first pool
    fused_style_bwd: bool = True        # style-layer loss with the 1x1-conv
                                        # custom-VJP backward: the tap's
                                        # gradient  f @ (G - Gt)  is emitted
                                        # as a conv op that consumes the tap
                                        # in its native TPU layout instead
                                        # of round-tripping through the
                                        # matmul's standard layout. Same
                                        # math (pinned by tests); level-0
                                        # grad 79.1 -> 61.3 ms/step at
                                        # 1024px bf16 on v5e.
    nan_checks: bool = True             # raise on non-finite loss at SYNCED
                                        # chunk boundaries: every chunk when
                                        # streaming images, only the final
                                        # chunk in pipelined no-image mode
                                        # (a per-chunk fetch would serialize
                                        # the pipeline). TPU analogue of the
                                        # reference's unconditional
                                        # torch.autograd.set_detect_anomaly,
                                        # neural_style_transfer.py:150, at
                                        # zero per-step cost.
    remat_levels: bool = False          # jax.checkpoint each pyramid level's
                                        # VGG pass (for 4-level / 2K outputs)
    stop_tol: float = 0.0               # convergence early-stop: end the run
                                        # once the relative loss change over
                                        # a chunk falls to <= stop_tol
                                        # (|f_prev - f| <= stop_tol *
                                        # max(1, |f|), checked at chunk
                                        # boundaries on the host). 0 =
                                        # reference parity (always run
                                        # iters_num steps — torch's
                                        # tolerance_change termination is
                                        # dead at the reference's max_iter=1
                                        # setting, torch lbfgs.py checks it
                                        # only within one .step() call).
                                        # Measured motivation: once the bf16
                                        # loss surface flattens, full-Wolfe
                                        # L-BFGS burns ~9 line-search
                                        # evals/step making ZERO progress
                                        # (PARITY.md, per-segment eval
                                        # profile). Host-side control flow
                                        # only — not part of _config_key; a
                                        # batched queue stops a group when
                                        # EVERY job in it has converged.
    stop_shrink: bool = True            # with stop_tol > 0: per-job early
                                        # exit for BATCHED runs — a job
                                        # whose chunk change is <= stop_tol
                                        # leaves the batch at the chunk
                                        # boundary (its result freezes
                                        # there, like a single-job stop)
                                        # and the remaining jobs re-form at
                                        # the next power-of-two batch size.
                                        # Measured motivation: group-stop
                                        # alone gates on the SLOWEST lane
                                        # (8-job serving: -10% wall vs -41%
                                        # for per-job scheduling, PARITY).
                                        # Each new size pays one XLA
                                        # compile (the serving warmup set
                                        # is exactly these power-of-two
                                        # sizes; on a multi-device mesh
                                        # the ladder rounds up to
                                        # jobs-axis multiples). Host-side
                                        # only. Coexists with
                                        # checkpointing since r5: the
                                        # checkpoint persists the lane
                                        # composition + frozen rows, so a
                                        # crash mid-ladder resumes
                                        # bit-exactly at the shrunken
                                        # size.


# ---------------------------------------------------------------------------
# Preset configs. Parity with the reference lab presets (reference
# lab.py:17-69) and the headless smoke preset (reference start_nn.py:11-14).
# ---------------------------------------------------------------------------

NO_NOISE_CONFIG = Config(
    noise_factor=0.0,
    noise_levels=(),
    noise_levels_central_amplitude=(),
    noise_levels_peripheral_amplitude=(),
    noise_levels_dispersion=(),
)

PIXEL_WIDE_NOISE_CONFIG = Config(
    noise_factor=0.5,
    noise_levels=(-1,),
    noise_levels_central_amplitude=(1.0,),
    noise_levels_peripheral_amplitude=(1.0,),
    noise_levels_dispersion=(0.5,),
)

NOISE_128_CONFIG = Config(
    noise_factor=0.7,
    noise_levels=(128,),
    noise_levels_central_amplitude=(1.0,),
    noise_levels_peripheral_amplitude=(1.0,),
    noise_levels_dispersion=(0.5,),
)

NOISE_16_CONFIG = Config(
    noise_factor=0.7,
    noise_levels=(16,),
    noise_levels_central_amplitude=(1.0,),
    noise_levels_peripheral_amplitude=(1.0,),
    noise_levels_dispersion=(0.5,),
)

STANDARD_GAUSS_NOISE_CONFIG = Config()

LIGHT_GAUSS_NOISE_CONFIG = Config(
    content_weight=1e3,
    style_weight=1e3,
    tv_weight=0e0,
    levels_num=2,
    iters_num=1500,
    noise_factor=0.95,
    noise_levels=(32, 64, 128, -1, 0),
    noise_levels_central_amplitude=(0.10, 0.15, 0.5, 0.10, 0.00),
    noise_levels_peripheral_amplitude=(0.20, 0.30, 0.10, 0.80, 0.00),
)

STARTING_CONFIG = Config(levels_num=1, iters_num=10)

PRESETS = {
    "no_noise": NO_NOISE_CONFIG,
    "pixel_wide": PIXEL_WIDE_NOISE_CONFIG,
    "noise_128": NOISE_128_CONFIG,
    "noise_16": NOISE_16_CONFIG,
    "standard": STANDARD_GAUSS_NOISE_CONFIG,
    "light_gauss": LIGHT_GAUSS_NOISE_CONFIG,
    "smoke": STARTING_CONFIG,
}


def reference_equivalent_steps(config: Config, reference_iters: int) -> int:
    """Map the reference's iters_num onto this engine's optimizer steps.

    The reference increments its iteration counter INSIDE the torch
    closure (reference neural_style_transfer.py:198; `while step <
    iters_num` at :205), so the unit is CLOSURE EVALUATIONS. One L-BFGS
    optimizer step at the reference's settings (max_iter=1, accidental
    max_ls=0: one entry eval + one trial eval) advances that counter by 2
    — reference iters_num=500 performs 250 L-BFGS parameter updates. Adam
    calls the closure once per step (1:1). This engine's iters_num counts
    optimizer steps everywhere (the principled unit for a framework whose
    step is one compiled graph); use this helper when reproducing a
    reference run's exact amount of optimization.
    """
    if config.optimizer == "lbfgs":
        if config.lbfgs_max_ls_steps == 0:
            return max(1, reference_iters // 2)
        raise ValueError(
            "the reference's closure-count iteration unit has no fixed "
            "optimizer-step equivalence under a real line search "
            "(1 + n_evals closure calls per step, data-dependent)")
    return reference_iters


def production_config(base: Config | None = None) -> Config:
    """Resolve a config to the platform's production settings.

    On TPU backends this switches compute_dtype float32 -> bfloat16 (a
    config that already asks for a non-default dtype is left alone),
    opens the full-Wolfe L-BFGS line search at the quasi-Newton unit
    trial (lbfgs_t_init 'lr' -> 'unit'; r4 study below), carries the
    matrix direction's Grams (r4), and stores the L-BFGS history pairs
    in bfloat16 (r5; +10.8% at the headline, unlocks history=100 at 2K
    on one chip); on CPU/GPU it is the identity. The frontends and the benchmark use this as the
    deployment default; pass an explicit --compute-dtype float32 /
    --lbfgs-t-init lr to opt out.

    Why the unit opening trial is the TPU production default (r4,
    scripts/exp_lbfgs_evals.py + bench, v5e-1): the full-Wolfe path is
    eval-bound, and torch's t=lr opening (10.0 x 0.999-decay) sits far
    from the quasi-Newton natural step, so the search re-brackets almost
    every iteration — 2.13 line-search evals/step at 512px bf16 against
    1.12 with the unit trial. End-to-end: 19.4 -> 33.8 steps/s at 512px,
    5.7 -> 10.1 at 1024px (+74-78%) at matched-or-better loss (the
    time-to-target harness measured a LOWER 10-step loss, PARITY.md).
    The flip never touches reference-semantics runs (lbfgs_max_ls_steps=
    0 keeps torch's exact opening rule — there the trial IS the step).

    History note: rounds 1-2 kept full-Wolfe L-BFGS on f32 (bf16 measured
    ~13% slower at 512px) — that was an artifact of the loop-form
    two-loop direction. On the round-3 matrix direction bf16 wins at
    every measured size (2level512 19.4 vs 17.8 steps/s; 3level1024
    5.6-5.8 vs 5.0, identical or lower final loss at 150 steps, ~2.6 vs
    2.4 line-search evals/step), so all optimizers now run bf16.

    Why bf16 is the TPU production default (scripts/precision_study.py,
    v5e-1, 500 full steps, all losses evaluated under one f32 metric
    graph):
    - 3level1024 Adam: bf16 final loss +0.11% vs f32 (a same-f32 run with
      a 1e-5 single-pixel init perturbation — pure chaos — lands +0.013%;
      pixel-level divergence is chaos-dominated in both cases: 25.3 dB vs
      the 29.5 dB chaos control).
    - 2level512 L-BFGS, exact reference semantics: bf16 and f32 outputs
      are visually identical (56.9 dB PSNR); final loss +1.1%.
    The reference's own production target does the same: torch on its
    CUDA image runs TF32-reduced convolutions by default.
    """
    cfg = base if base is not None else Config()
    try:
        import jax

        on_tpu = jax.default_backend() == "tpu"
    except Exception:  # jax unavailable/uninitializable: keep defaults
        on_tpu = False
    if not on_tpu:
        return cfg
    if cfg.compute_dtype == "float32":  # a non-default dtype is left alone
        cfg = dataclasses.replace(cfg, compute_dtype="bfloat16")
    if (cfg.optimizer == "lbfgs" and cfg.lbfgs_max_ls_steps > 0
            and cfg.lbfgs_t_init == "lr"):  # 'lr' = the parity default
        cfg = dataclasses.replace(cfg, lbfgs_t_init="unit")
    if (cfg.optimizer == "lbfgs" and cfg.lbfgs_direction == "matrix"
            and cfg.lbfgs_grams == "recompute"):
        # r4: carry the matrix direction's S Yᵀ / Y Yᵀ Grams in the
        # optimizer state and refresh one row+column per step instead of
        # the 4·m²·n-FLOP recompute. Same matrices up to dot-order ulps
        # (pinned step-for-step by tests). Decisive probe
        # (scripts/exp_gramupd.py, 1000-iter differential, h=100,
        # n=4.7M): direction+update 26.2 -> 12.7 ms; end-to-end bench
        # A/B at the default-optimizer headline (lbfgs3level1024, unit
        # trial, bf16): 10.16 -> 10.59 steps/s (+4.2%). Applies to
        # ref-semantics runs too (the direction is line-search
        # independent); an explicit --lbfgs-grams recompute opts out.
        cfg = dataclasses.replace(cfg, lbfgs_grams="incremental")
    if (cfg.optimizer == "lbfgs" and cfg.lbfgs_state_dtype == "float32"):
        # r5: store the (m, n) s/y history pairs in bfloat16 — halves
        # both their HBM footprint (the capacity limit that forced
        # history=10 at 2K: torch's history_size=100 default now fits a
        # 16 GB chip, 3.16 steps/s at 4level2k, 1969x torch-CPU) and the
        # matrix direction's streamed bandwidth (bench A/B at the
        # headline: 10.67 -> 11.82 steps/s, +10.8%). Quality closed on
        # the chip by scripts/exp_statedtype.py: final loss within the
        # chaos band at 512 AND 1024 (bf16-state landed lower both
        # times; PARITY.md r5). All contractions still accumulate f32.
        # An explicit --lbfgs-state-dtype float32 opts out.
        cfg = dataclasses.replace(cfg, lbfgs_state_dtype="bfloat16")
    return cfg
