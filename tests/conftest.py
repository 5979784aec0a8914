"""Test environment: force CPU JAX with an 8-device virtual mesh.

Tests never touch the real TPU chip — they run on the host platform with
xla_force_host_platform_device_count=8 so sharding/pjit paths are exercised
on a virtual mesh, per the multi-chip testing strategy.
"""

import os

import re

os.environ["JAX_PLATFORMS"] = "cpu"  # the ambient env points at the real TPU
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" in _flags:
    # an ambient flag with a DIFFERENT count (left by a bench/memory
    # script) would silently shrink the suite's virtual mesh — rewrite it
    _flags = re.sub(r"--xla_force_host_platform_device_count=\d+",
                    "--xla_force_host_platform_device_count=8", _flags)
    os.environ["XLA_FLAGS"] = _flags
else:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The container's sitecustomize imports jax at interpreter startup with
# JAX_PLATFORMS=axon already in the environment, so the env var above is
# read too late. Override through the config API — effective as long as no
# backend has been initialized yet (no op has run during collection).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# The serving frontends default to meshing every visible device
# (parallel.mesh.default_serving_mesh); on the suite's 8 VIRTUAL devices
# that would shard every frontend graph 8 ways and pad tiny demo batches
# up to 8 jobs. Force it off; mesh-path tests opt back in via monkeypatch.
os.environ["ASTT_SERVING_MESH"] = "none"

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture(scope="session")
def vgg_params():
    from artstyletransfer_tpu.models.weights import init_vgg19_params

    return init_vgg19_params(seed=0)
