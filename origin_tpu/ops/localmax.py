"""3-D local maxima extraction.

TPU re-design of reference lib_origin.py:1220-1256 (`compute_local_max`):
the scipy ``maximum_filter`` becomes a ``lax.reduce_window`` max with -inf
padding.  For a max filter, -inf ('shrinking window') padding is exactly
equivalent to scipy's default reflect mode, because reflecting only
duplicates values already inside the window.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["local_maxima", "compute_local_max"]


def _maxfilter(x, size):
    pads = [((s - 1) // 2, s - 1 - (s - 1) // 2) for s in size]
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=size,
        window_strides=(1,) * len(size),
        padding=pads,
    )


@partial(jax.jit, static_argnames=("size",))
def local_maxima(x, mask, size=3):
    """Values of x at its local maxima (within a size^3 box), 0 elsewhere."""
    if isinstance(size, int):
        size = (size,) * x.ndim
    filt = _maxfilter(x, size)
    keep = (x == filt) & ~mask
    return jnp.where(keep, filt, 0.0)


@partial(jax.jit, static_argnames=("size",))
def compute_local_max(correl, correl_min, mask, size=3):
    """Local maxima of correl and of -correl_min (reference semantics).

    Returns (local_max, local_min): voxel values where the voxel is a strict
    box-maximum (ties keep the value, like the reference's equality test),
    zero elsewhere and on masked voxels.
    """
    local_max = local_maxima(correl, mask, size)
    local_min = local_maxima(-correl_min, mask, size)
    return local_max, local_min
