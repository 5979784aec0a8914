"""Total-variation op.

Reference parity: the reference uses a NON-standard squared TV — the mean of
absolute horizontal diffs and the mean of absolute vertical diffs are each
SQUARED and then summed (reference math_utils.py:37-41), not the usual sum of
absolute differences. That exact semantics is reproduced here on NHWC images.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def total_variation(y: jax.Array) -> jax.Array:
    """y: NHWC image batch. Returns scalar (mean|dx|)^2 + (mean|dy|)^2."""
    mean_x = jnp.mean(jnp.abs(y[:, :, :-1, :] - y[:, :, 1:, :]))  # along W
    mean_y = jnp.mean(jnp.abs(y[:, :-1, :, :] - y[:, 1:, :, :]))  # along H
    return mean_x * mean_x + mean_y * mean_y
