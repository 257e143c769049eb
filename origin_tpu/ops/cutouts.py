"""Batched window reductions for per-source artifacts.

Step 10 (mask creation) needs, for every detected line, the max-image of the
detection cube over ``z in [z0-fwhm, z0+fwhm]`` on a small spatial window
centred at the source.  The reference (source_masks.py:27-241) — and round 1
of this rebuild — cut a per-source subcube and reduced per line on the host,
which costs one device->host window transfer per source.  Here all line
max-images are produced by ONE device program per retry round: a gather of
(slab, size, size) voxel windows under ``vmap`` with out-of-field positions
filled with -inf, reduced over the spectral slab on device, so only the
(nlines, size, size) images cross the link.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["line_max_images_kernel", "window_ori_stats_kernel"]


@partial(jax.jit, static_argnames=("size",))
def window_ori_stats_kernel(cube, y0, x0, objm, size):
    """Per-source detection-cube stats: object-mean spectrum + max map.

    For each (size x size) window at (y0, x0) (possibly out of field),
    returns the mean spectrum over the object-mask pixels (NaN when the
    mask covers no in-field pixel — the host nanmean convention) and the
    spectral max map (-inf outside the field).  Replaces step 11's
    per-source host passes over the correlation cutout (the ORI_CORR
    spectrum and ORI_MAXMAP image of every source file).
    """
    nz, ny, nx = cube.shape
    ar = jnp.arange(size)

    def one(yy, xx, ob):
        ys = yy + ar
        xs = xx + ar
        vy = (ys >= 0) & (ys < ny)
        vx = (xs >= 0) & (xs < nx)
        valid = vy[:, None] & vx[None, :]
        win = cube[:, jnp.clip(ys, 0, ny - 1)[:, None],
                   jnp.clip(xs, 0, nx - 1)[None, :]]
        w = (ob > 0) & valid
        cnt = jnp.sum(w)
        spec = jnp.einsum("zyx,yx->z", win, w.astype(cube.dtype)) / cnt
        maxmap = jnp.max(jnp.where(valid[None], win, -jnp.inf), axis=0)
        return spec, maxmap

    return jax.vmap(one)(y0, x0, objm)


@partial(jax.jit, static_argnames=("size", "slab"))
def line_max_images_kernel(cube, y0, x0, zlo, zhi, size, slab):
    """Per-line spectral-slab max over spatial windows.

    Parameters
    ----------
    cube : (Nz, Ny, Nx) device array
    y0, x0 : (B,) int32 window start indices (may be negative / OOB; pixels
        outside the field come back as -inf)
    zlo, zhi : (B,) int32 inclusive spectral range, pre-clamped to
        [0, Nz-1] with zlo <= zhi
    size : static window edge length
    slab : static spectral gather length, >= max(zhi - zlo + 1), bucketed
        by the caller to bound recompilation

    Returns (images, valid): (B, size, size) float32 with -inf outside the
    field, and the (B, size, size) in-field mask.
    """
    nz, ny, nx = cube.shape
    ar = jnp.arange(size)
    zr = jnp.arange(slab)

    def one(yy, xx, z0, z1):
        ys = yy + ar
        xs = xx + ar
        vy = (ys >= 0) & (ys < ny)
        vx = (xs >= 0) & (xs < nx)
        ysc = jnp.clip(ys, 0, ny - 1)
        xsc = jnp.clip(xs, 0, nx - 1)
        zs = z0 + zr
        vz = zs <= z1  # z0 >= 0 and z1 <= nz-1 guaranteed by the caller
        zsc = jnp.clip(zs, 0, nz - 1)
        win = cube[zsc[:, None, None], ysc[None, :, None], xsc[None, None, :]]
        win = jnp.where(vz[:, None, None], win, -jnp.inf)
        img = jnp.max(win, axis=0)
        valid = vy[:, None] & vx[None, :]
        return jnp.where(valid, img, -jnp.inf), valid

    return jax.vmap(one)(y0, x0, zlo, zhi)
