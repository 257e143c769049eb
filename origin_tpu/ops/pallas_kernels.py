"""Pallas TPU kernels for the hot fused operations.

`matched_filter_spectral`: the spectral stage of the GLR test as ONE fused
pass.  For every spaxel row tile held in VMEM it computes, for each profile
of the dictionary, the matched-filter numerator and denominator by
shift-accumulate over the (short) profile support, normalizes, and folds the
result into running max / argmax / min accumulators — so the K-profile sweep
reads the two input cubes once and writes the three output cubes once,
instead of the ~4K cube-sized HBM round trips of a convolution-per-profile
formulation.

The spectral axis sits in lanes; profile shifts are lane rotations
(`pltpu.roll`).  The z axis is zero-padded to a multiple of 128 by at least
the maximum shift, which makes the circular rotation equal to the zero-padded
linear shift on all valid output channels (wrapped values land only in the
padding region).

Measured on a v5-lite chip (100x200x3681, 3 profiles): this VPU
shift-accumulate formulation runs at ~1.65 s vs ~16 ms for the
blocked-Toeplitz MXU matmul formulation in ops.glr (the per-shift lane
rotations serialize on the vector unit).  It is kept as a working
reference implementation of the fused single-pass design; the production
pipeline uses `ops.glr.glr_spectral_mxu`.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "matched_filter_spectral",
    "banded_matmul_spectral",
    "pallas_available",
]


def pallas_available():
    """Whether the TPU pallas backend is usable on this platform."""
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def _mf_kernel(x_ref, n_ref, c_ref, m_ref, p_ref, *,
               prof_np, prof2_np, centers, nz):
    """One spaxel-row tile: fused matched filter over all profiles."""
    import jax.experimental.pallas as pl  # noqa: F401
    from jax.experimental.pallas import tpu as pltpu

    x = x_ref[:]
    n = n_ref[:]
    correl = jnp.full(x.shape, -jnp.inf, dtype=jnp.float32)
    cmin = jnp.full(x.shape, jnp.inf, dtype=jnp.float32)
    pidx = jnp.zeros(x.shape, dtype=jnp.int32)

    nprof, length = prof_np.shape
    for k in range(nprof):
        c = centers[k]
        num = jnp.zeros(x.shape, dtype=jnp.float32)
        den = jnp.zeros(x.shape, dtype=jnp.float32)
        for j in range(length):
            w = float(prof_np[k, j])
            w2 = float(prof2_np[k, j])
            if w == 0.0 and w2 == 0.0:
                continue
            shift = j - c
            # out[z] needs in[z + shift]; rolling left by `shift` brings
            # element z+shift to position z.  pltpu.roll requires a
            # non-negative shift, so express left rotations as right
            # rotations by nzp - shift (same circular permutation); wrapped
            # values land only in the zero-padding tail.
            nzp = x.shape[1]
            amount = (-shift) % nzp
            xs = pltpu.roll(x, amount, axis=1) if amount else x
            ns = pltpu.roll(n, amount, axis=1) if amount else n
            num = num + w * xs
            den = den + w2 * ns
        norm = jnp.where(den <= 0, jnp.inf, jnp.sqrt(den))
        t = num / norm
        pidx = jnp.where(t > correl, k, pidx)
        correl = jnp.maximum(correl, t)
        cmin = jnp.minimum(cmin, t)

    c_ref[:] = correl
    m_ref[:] = cmin
    p_ref[:] = pidx


def matched_filter_spectral(x, n, prof_bank, prof2_bank, centers,
                            tile_rows=None, interpret=False):
    """Fused spectral matched filter.

    Parameters
    ----------
    x, n : (S, Nz) float32
        Spaxel-major FSF-convolved cube and norm cube (z innermost).
    prof_bank, prof2_bank : (K, L) float32 numpy arrays
        Right-zero-padded trimmed profiles and their squares.
    centers : tuple of int
        'same' offsets per profile.
    tile_rows : int
        Spaxel rows per pallas program (VMEM sizing).
    interpret : bool
        Run in interpreter mode (for CPU tests).

    Returns (correl, correl_min, profile_idx) of shape (S, Nz).
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    prof_np = np.asarray(prof_bank, dtype=np.float32)
    prof2_np = np.asarray(prof2_bank, dtype=np.float32)
    s, nz = x.shape
    length = prof_np.shape[1]
    max_shift = max(
        max(length - 1 - c for c in centers), max(centers)
    )
    nzp = -(-max(nz + max_shift, nz) // 128) * 128
    if tile_rows is None:
        # 5 windows (2 in + 3 out) double-buffered PLUS the unrolled
        # shift-accumulate loop's live rotated temporaries (~6 more tile
        # buffers after scheduling), all in ~128MB VMEM: keep the in/out
        # working set near 2MB so the temporaries have ~10x headroom
        budget = 2 * 1024 * 1024 // (5 * 2 * 4 * nzp)
        tile_rows = max(8, min(64, (budget // 8) * 8))
    sp = -(-s // tile_rows) * tile_rows

    xp = jnp.zeros((sp, nzp), jnp.float32).at[:s, :nz].set(x)
    npad = jnp.zeros((sp, nzp), jnp.float32).at[:s, :nz].set(n)

    kernel = partial(
        _mf_kernel, prof_np=prof_np, prof2_np=prof2_np,
        centers=tuple(int(c) for c in centers), nz=nz,
    )
    grid = (sp // tile_rows,)
    spec = pl.BlockSpec((tile_rows, nzp), lambda i: (i, 0))
    correl, cmin, pidx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec, spec],
        out_specs=[spec, spec, spec],
        out_shape=[
            jax.ShapeDtypeStruct((sp, nzp), jnp.float32),
            jax.ShapeDtypeStruct((sp, nzp), jnp.float32),
            jax.ShapeDtypeStruct((sp, nzp), jnp.int32),
        ],
        interpret=interpret,
    )(xp, npad)
    return correl[:s, :nz], cmin[:s, :nz], pidx[:s, :nz]


def _banded_kernel(x_ref, n_ref, tn_ref, td_ref, c_ref, m_ref, p_ref, *,
                   nb, block, window):
    """One spaxel-row tile: banded-Toeplitz matched filter, fused.

    The whole (padded) z axis of the tile sits in VMEM; each z-block's
    sliding window is a static VMEM slice feeding two MXU matmuls per
    profile, and the running max / argmax / min accumulators are written
    once — no HBM-materialized window views (the XLA formulation's extra
    ~2 cube read+writes).

    Measured on a v5-lite chip (100x200x3681, 3 profiles): ~2.9 s vs
    ~16 ms for the XLA formulation (ops.glr.glr_spectral_mxu) — the
    VMEM-stack limit caps tiles at 32-64 rows, leaving the MXU's M
    dimension mostly idle across ~100k small dots, and XLA's own window
    materialization turns out to pipeline far better.  Kept as a
    parity-tested reference; the production path is ops.glr.
    """
    import jax.experimental.pallas as pl  # noqa: F401

    x = x_ref[:]
    n = n_ref[:]
    tn = tn_ref[:]
    td = td_ref[:]
    nprof = tn.shape[0]
    hi = jax.lax.Precision.HIGHEST

    for j in range(nb):
        xw = x[:, j * block : j * block + window]
        nw = n[:, j * block : j * block + window]
        correl = None
        cmin = None
        pidx = None
        for k in range(nprof):
            num = jax.lax.dot_general(
                xw, tn[k], (((1,), (0,)), ((), ())), precision=hi,
                preferred_element_type=jnp.float32,
            )
            den = jax.lax.dot_general(
                nw, td[k], (((1,), (0,)), ((), ())), precision=hi,
                preferred_element_type=jnp.float32,
            )
            norm = jnp.where(den <= 0, jnp.inf, jnp.sqrt(den))
            t = num / norm
            if correl is None:
                correl, cmin = t, t
                pidx = jnp.zeros(t.shape, jnp.int32)
            else:
                pidx = jnp.where(t > correl, k, pidx)
                correl = jnp.maximum(correl, t)
                cmin = jnp.minimum(cmin, t)
        c_ref[:, j * block : (j + 1) * block] = correl
        m_ref[:, j * block : (j + 1) * block] = cmin
        p_ref[:, j * block : (j + 1) * block] = pidx


def banded_matmul_spectral(x, n, t_num, t_den, pad_left, nz,
                           tile_rows=128, interpret=False):
    """Fused banded-Toeplitz spectral sweep (MXU matmuls in pallas).

    Parameters mirror ops.glr.toeplitz_sweep's core: ``x``/``n`` are
    (S, Nz) spaxel-major cubes, ``t_num``/``t_den`` the (K, W, B)
    Toeplitz banks with shared left pad ``pad_left``.

    Returns (correl, correl_min, profile_idx int32) of shape (S, Nz).
    """
    import jax.experimental.pallas as pl

    t_num = np.asarray(t_num, np.float32)
    t_den = np.asarray(t_den, np.float32)
    nprof, window, block = t_num.shape
    s = x.shape[0]
    nb = -(-nz // block)
    total = nb * block + window - block
    sp = -(-s // tile_rows) * tile_rows

    xp = jnp.zeros((sp, total), jnp.float32)
    xp = xp.at[:s, pad_left : pad_left + nz].set(x)
    npad = jnp.zeros((sp, total), jnp.float32)
    npad = npad.at[:s, pad_left : pad_left + nz].set(n)

    kernel = partial(_banded_kernel, nb=nb, block=block, window=window)
    grid = (sp // tile_rows,)
    in_spec = pl.BlockSpec((tile_rows, total), lambda i: (i, 0))
    t_spec = pl.BlockSpec((nprof, window, block), lambda i: (0, 0, 0))
    out_spec = pl.BlockSpec((tile_rows, nb * block), lambda i: (i, 0))
    correl, cmin, pidx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[in_spec, in_spec, t_spec, t_spec],
        out_specs=[out_spec, out_spec, out_spec],
        out_shape=[
            jax.ShapeDtypeStruct((sp, nb * block), jnp.float32),
            jax.ShapeDtypeStruct((sp, nb * block), jnp.float32),
            jax.ShapeDtypeStruct((sp, nb * block), jnp.int32),
        ],
        interpret=interpret,
    )(xp, npad, jnp.asarray(t_num), jnp.asarray(t_den))
    return correl[:s, :nz], cmin[:s, :nz], pidx[:s, :nz]
