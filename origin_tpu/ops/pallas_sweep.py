"""Fused Pallas kernel for the GLR spectral matched-filter sweep.

The XLA Toeplitz path (ops.glr.toeplitz_sweep) materializes, per profile k,
two cube-sized einsum outputs plus the normalized statistic before folding
them into the running max/argmax/min — roughly 9 cube-sized HBM passes per
profile, so its cost scales linearly with the dictionary size K even though
the whole sweep reads the same two input cubes.

This kernel fuses the entire sweep: a (TILE_S, Ztot) spaxel tile of the
FSF-convolved cube and norm cube is loaded into VMEM ONCE, the banded
Toeplitz matmuls for ALL K profiles run back-to-back on the MXU against it
(the (W, B) profile banks cycle through VMEM as the innermost grid
dimension), and only the three results (correl, best-profile, correl_min)
are written — ~6 cube-sized HBM passes TOTAL, independent of K.  For the
20-profile Dico_FWHM_2_12 dictionary that is an order of magnitude less
memory traffic than the XLA path.

Numerics match toeplitz_sweep: float32 inputs, HIGHEST-precision matmuls,
the same zero-padded 'same' correlation layout (shared left pad, blocked
z axis), and the same <=0 -> +inf guard on the normalization.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_prec import make_dot

__all__ = ["toeplitz_sweep_pallas"]


def _round_up(x, m):
    return -(-x // m) * m


def _sweep_kernel(x_ref, n_ref, tnum_ref, tden_ref,
                  correl_ref, profile_ref, cmin_ref, *, nb, block, window,
                  precision=jax.lax.Precision.HIGHEST):
    """One (TILE_S, Ztot) spaxel tile x one profile k of the sweep."""
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        correl_ref[:] = jnp.full_like(correl_ref, -jnp.inf)
        cmin_ref[:] = jnp.full_like(cmin_ref, jnp.inf)
        profile_ref[:] = jnp.zeros_like(profile_ref)

    # ops.pallas_prec: plain dots at a jax Precision, or the emulated
    # 3-pass bf16 scheme for "bf16x3" (profile bank split once per
    # kernel, each window once per use)
    sp, d3 = make_dot(precision)
    tn_s = sp(tnum_ref[0])
    td_s = sp(tden_ref[0])
    for b in range(nb):
        xw = x_ref[:, pl.ds(b * block, window)]
        nw = n_ref[:, pl.ds(b * block, window)]
        num = d3(sp(xw), tn_s)
        den = d3(sp(nw), td_s)
        norm = jnp.where(den <= 0, jnp.inf, jnp.sqrt(den))
        t = num / norm
        sl = pl.ds(b * block, block)
        cur = correl_ref[:, sl]
        profile_ref[:, sl] = jnp.where(
            t > cur, jnp.asarray(k, profile_ref.dtype), profile_ref[:, sl]
        )
        correl_ref[:, sl] = jnp.maximum(cur, t)
        cmin_ref[:, sl] = jnp.minimum(cmin_ref[:, sl], t)


def _vmem_bytes(tile_s, zin, zout):
    """Double-buffered VMEM footprint of one grid step."""
    return 2 * tile_s * 4 * (2 * zin + 3 * zout)


def _plan_chunks(zout, window, block, budget=14 << 20, tile_fixed=None):
    """Choose the spaxel tile height and spectral chunking under VMEM.

    Preference order (measured on v5e): FEWEST chunks first — chunking
    re-reads the (window - block) input overlap and pays extra slice /
    concat HBM passes, which costs more than a half-height tile saves —
    then the tallest tile that fits.  ``tile_fixed`` forces the tile height
    and plans chunks for it.  Returns (tile_s, [(z0, zout_c)]).

    Chunk extents are multiples of ``block`` (except possibly the last),
    and the planner budgets each chunk's input for its PADDED output
    extent, so the kernel's final window read never overruns.
    """
    nb = zout // block
    tiles = (tile_fixed,) if tile_fixed else (256, 128, 64, 32, 16, 8)
    for nchunk in range(1, nb + 1):
        bpc = -(-nb // nchunk)
        zout_c = bpc * block
        zin_c = _round_up(zout_c + window - block, 128)
        for t in tiles:
            if _vmem_bytes(t, zin_c, zout_c) <= budget:
                starts = range(0, nb * block, zout_c)
                return t, [(z0, min(zout_c, zout - z0)) for z0 in starts]
    return tiles[-1], [(z0, min(block, zout - z0))
                       for z0 in range(0, zout, block)]


@partial(
    jax.jit,
    static_argnames=("pad_left", "nz", "tile_s", "interpret", "precision",
                     "vma"),
)
def toeplitz_sweep_pallas(cube_fsf, norm_fsf, t_num, t_den, pad_left, nz,
                          tile_s=None, interpret=False,
                          precision=jax.lax.Precision.HIGHEST, vma=None):
    """Drop-in fused variant of ops.glr.toeplitz_sweep (with profiles).

    Inputs/outputs match :func:`origin_tpu.ops.glr.glr_spectral_mxu`:
    (Nz, Ny, Nx) float32 cubes in, (correl, profile_idx, correl_min) out.
    Profile indices are uint8 for dictionaries of up to 255 profiles
    (written directly by the kernel — no extra cube-sized cast pass),
    int32 beyond that or on degenerate (<32-row) tiles.
    """
    nprof, window, block = t_num.shape
    nb = -(-nz // block)
    zout = nb * block
    ny, nx = cube_fsf.shape[1:]
    s = ny * nx
    tile, chunks = _plan_chunks(zout, window, block, tile_fixed=tile_s)
    sp = _round_up(s, tile)
    ztot = zout + window - block

    def flat(a):
        a = a.reshape(nz, s).T
        return jnp.pad(
            a, ((0, sp - s), (pad_left, ztot - pad_left - nz))
        )

    x = flat(cube_fsf)
    n = flat(norm_fsf)

    # pad the flats once so every chunk's (lane-aligned) input slice is
    # in range
    need = max(z0 + _round_up(-(-zc // block) * block + window - block, 128)
               for z0, zc in chunks)
    if need > ztot:
        x = jnp.pad(x, ((0, 0), (0, need - ztot)))
        n = jnp.pad(n, ((0, 0), (0, need - ztot)))

    pdtype = jnp.uint8 if (nprof <= 255 and tile >= 32) else jnp.int32

    outs = []
    for z0, zout_c in chunks:
        nb_c = -(-zout_c // block)
        zpad_c = nb_c * block
        # budget the input for the PADDED output extent: the kernel's last
        # window read ends at (nb_c - 1) * block + window
        zin_c = _round_up(zpad_c + window - block, 128)
        xin = jax.lax.slice_in_dim(x, z0, z0 + zin_c, axis=1)
        nin = jax.lax.slice_in_dim(n, z0, z0 + zin_c, axis=1)
        grid = (sp // tile, nprof)
        kernel = partial(_sweep_kernel, nb=nb_c, block=block,
                         window=window, precision=precision)
        res = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                # the spaxel tile is k-invariant: fetched once per i,
                # reused for all K profiles
                pl.BlockSpec((tile, zin_c), lambda i, k: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, zin_c), lambda i, k: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, window, block), lambda i, k: (k, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, window, block), lambda i, k: (k, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((tile, zpad_c), lambda i, k: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, zpad_c), lambda i, k: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, zpad_c), lambda i, k: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            # vma: required when running inside shard_map (the caller
            # names the mesh axes the outputs vary over)
            out_shape=[
                jax.ShapeDtypeStruct((sp, zpad_c), jnp.float32, vma=vma),
                jax.ShapeDtypeStruct((sp, zpad_c), pdtype, vma=vma),
                jax.ShapeDtypeStruct((sp, zpad_c), jnp.float32, vma=vma),
            ],
            interpret=interpret,
        )(xin, nin, t_num, t_den)
        outs.append(tuple(o[:, :zout_c] for o in res))

    correl = jnp.concatenate([o[0] for o in outs], axis=1)
    profile = jnp.concatenate([o[1] for o in outs], axis=1)
    cmin = jnp.concatenate([o[2] for o in outs], axis=1)

    reshape = lambda a: a[:s, :nz].T.reshape(nz, ny, nx)
    return reshape(correl), reshape(profile), reshape(cmin)
