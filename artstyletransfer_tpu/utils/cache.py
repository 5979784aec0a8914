"""Persistent XLA compilation cache.

The engine's jitted step graphs are expensive to compile (minutes for
2K-pyramid shapes on TPU) and identical across processes; enabling JAX's
persistent compilation cache makes every entry point (CLI, lab, bot, bench)
pay compilation once per (shape, config) per machine.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(os.path.expanduser("~"), ".cache",
                            "artstyletransfer_tpu", "xla_cache")
_enabled = False


def enable_compilation_cache(cache_dir: str = None) -> None:
    global _enabled
    if _enabled or os.environ.get("ASTT_NO_COMPILE_CACHE"):
        return
    import jax

    path = cache_dir or os.environ.get("ASTT_COMPILE_CACHE", _DEFAULT_DIR)
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        _enabled = True
    except Exception:
        pass  # cache is an optimization; never fail the caller
