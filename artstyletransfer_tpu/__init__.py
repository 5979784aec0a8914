"""artstyletransfer_tpu — a TPU-native neural style transfer framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
irenemizus/ArtStyleTransfer (improved Gatys-style transfer with
multi-resolution pyramid loss and structured style-derived noise
initialization), built TPU-first:

- VGG19 feature extraction as a pure-JAX NHWC forward pass (models/vgg19.py)
- Gram/TV/content losses as fused ops with Pallas TPU kernels (ops/)
- The full optimization loop (pyramid construction, losses, gradients,
  Adam or strong-Wolfe L-BFGS updates) compiled into a single XLA graph
  with zero host round-trips per step (engine/)
- Batched multi-job execution via vmap/pjit over a device mesh (parallel/)
- An asyncio task executor and web/Telegram/CLI frontends (runtime/, frontends/)

Reference behavior is documented per-module with `/root/reference` file:line
citations; the implementation is new and TPU-idiomatic throughout.
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("ASTT_PLATFORM"):
    # Deployment knob for hosts whose site config pre-imports JAX and pins
    # a platform before JAX_PLATFORMS can take effect: jax.config.update
    # still wins as long as no op has executed, so applying it at package
    # import covers every entry point (CLI, lab, bot, queue, scripts).
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["ASTT_PLATFORM"])

from .config import Config, simultaneous_tasks_count  # noqa: F401


def __getattr__(name):
    """Lazy top-level exports (keeps `import artstyletransfer_tpu` light)."""
    lazy = {
        "ContentStylePair": ("artstyletransfer_tpu.engine.transfer",
                             "ContentStylePair"),
        "TransferJob": ("artstyletransfer_tpu.engine.transfer", "TransferJob"),
        "neural_style_transfer": ("artstyletransfer_tpu.engine.transfer",
                                  "neural_style_transfer"),
        "Executor": ("artstyletransfer_tpu.runtime.executor", "Executor"),
        "prepare_model": ("artstyletransfer_tpu.models.vgg19",
                          "prepare_model"),
        "extract_features": ("artstyletransfer_tpu.models.vgg19",
                             "extract_features"),
        "load_vgg19_params": ("artstyletransfer_tpu.models.weights",
                              "load_vgg19_params"),
        "gram_matrix": ("artstyletransfer_tpu.ops.gram", "gram_matrix"),
        "total_variation": ("artstyletransfer_tpu.ops.tv", "total_variation"),
        "prepare_img": ("artstyletransfer_tpu.utils.image", "prepare_img"),
        "unprepare_img": ("artstyletransfer_tpu.utils.image", "unprepare_img"),
        "load_image": ("artstyletransfer_tpu.utils.image", "load_image"),
        "run_job_queue": ("artstyletransfer_tpu.parallel.batch",
                          "run_job_queue"),
        "BatchedTransferJob": ("artstyletransfer_tpu.parallel.batch",
                               "BatchedTransferJob"),
    }
    if name in lazy:
        import importlib

        module, attr = lazy[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
