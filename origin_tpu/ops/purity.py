"""Self-calibrated purity threshold estimation.

Re-design of reference lib_origin.py:1390-1479 (`Compute_threshold_purity`):
the per-threshold detection counts over the local-max / local-min cubes are
computed in a single device pass (searchsorted + bincount + suffix sum)
instead of 50 sequential sweeps; the tiny interpolation stays on host.
"""

from __future__ import annotations

import logging

import jax
import jax.numpy as jnp
import numpy as np

from ..core.table import Table

__all__ = ["counts_above_thresholds", "compute_threshold_purity"]

logger = logging.getLogger(__name__)


@jax.jit
def counts_above_thresholds(values, thresholds):
    """count(values > t) for every t of the (ascending) threshold vector."""
    v = values.ravel()
    k = thresholds.shape[0]
    idx = jnp.searchsorted(thresholds, v, side="left")  # #(t < v)
    hist = jnp.bincount(idx, length=k + 1)
    csum = jnp.cumsum(hist)
    return v.shape[0] - csum[:k]


@jax.jit
def _purity_stats(cube_local_max, cube_local_min):
    """Fused threshold-grid statistics: one device program, 3 scalars."""
    return (
        cube_local_min.max(),
        cube_local_max.max(),
        jnp.median(jnp.amax(cube_local_max, axis=0)),
    )


@jax.jit
def _counts_pair(cube_local_max, cube_local_min, th):
    return (
        counts_above_thresholds(cube_local_max, th),
        counts_above_thresholds(cube_local_min, th),
    )


def compute_threshold_purity(
    purity, cube_local_max, cube_local_min, segmap=None, threshlist=None
):
    """Estimate the detection threshold achieving a target purity.

    The false-detection rate is self-calibrated from the data: local minima
    of the negated cube behave like noise-only detections (symmetry), so

        purity(t) = 1 - n_min(t) * (L1/L0) / n_max(t)

    with L0 the number of calibration spaxels (background if a segmap is
    given) and L1 the total.  Mirrors reference lib_origin.py:1390-1479.

    Returns (threshold, Table[Tval_r, Pval_r, Det_m, Det_M]).

    Inputs may be numpy or device (jax) arrays; the cube-sized reductions
    run on device either way, so device-resident callers pay only scalar
    and (T,)-vector transfers.
    """
    cube_local_max = jnp.asarray(cube_local_max, jnp.float32)
    cube_local_min = jnp.asarray(cube_local_min, jnp.float32)
    l1 = float(np.prod(cube_local_min.shape[1:]))
    if segmap is not None:
        segmask = np.asarray(segmap) == 0
        cube_local_min = cube_local_min * jnp.asarray(segmask)
        l0 = float(np.count_nonzero(segmask))
        logger.info("using only background pixels (%.1f%%)", l0 / l1 * 100)
    else:
        l0 = l1

    if threshlist is None:
        maxmin, maxmax, med = _purity_stats(cube_local_max, cube_local_min)
        threshmax = min(float(maxmin), float(maxmax))
        threshmin = float(med) * 1.1
        threshlist = np.linspace(threshmin, threshmax, 50)
    else:
        threshlist = np.sort(np.asarray(threshlist, dtype=float))

    th = jnp.asarray(threshlist, dtype=jnp.float32)
    n1, n0 = _counts_pair(cube_local_max, cube_local_min, th)
    n1 = np.asarray(n1).astype(float)
    n0 = np.asarray(n0).astype(float)

    n0 = n0 * (l1 / l0)
    with np.errstate(divide="ignore", invalid="ignore"):
        est_purity = 1.0 - n0 / n1

    res = Table(
        data=[threshlist, est_purity, n0.astype(int), n1.astype(int)],
        names=("Tval_r", "Pval_r", "Det_m", "Det_M"),
    )
    res.set_format("Tval_r", ".2f")
    res.set_format("Pval_r", ".2f")

    if est_purity[-1] < purity:
        logger.warning(
            "Maximum computed purity %.2f is below %.2f", est_purity[-1], purity
        )
        threshold = np.inf
    else:
        threshold = float(np.interp(purity, res["Pval_r"], res["Tval_r"]))
        detect = float(np.interp(threshold, res["Tval_r"], res["Det_M"]))
        logger.info(
            "Interpolated Threshold %.2f Detection %d for Purity %.2f",
            threshold,
            detect,
            purity,
        )
    return float(threshold), res
