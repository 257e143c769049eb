"""Fused Pallas kernel for the GLR spatial FSF stage (DFT-by-matmul).

The XLA formulation (ops.glr.glr_spatial_matmul) lowers the per-channel
chain  data -> x-DFT -> y-DFT -> kernel multiply -> inverse DFTs  as 12
separate batched matmuls, each materializing a cube-sized intermediate in
HBM (~3.5 GB of traffic for a 100x200x3681 field) — on a v5-class chip
the stage is about half bandwidth-bound, half MXU passes.

This kernel fuses the whole chain per spectral-channel block: a
(ZT, Ny, Nx) slab of the cube and its (ZT, FY, FXr) FSF spectra are
loaded into VMEM once, all twelve dots for those channels run
back-to-back on the MXU, and only the (ZT, Ny, Nx) convolved slab is
written — HBM traffic drops to one read of the cube, one of the spectra
bank, one write of the result.

Numerics match glr_spatial_matmul exactly in structure: the same factor
matrices (ops.glr.dft_spatial_factors — padded real 2-D DFT with the
centred 'same' slice and real-symmetry weights folded into the inverse
factors), the same float32 HIGHEST-precision dots.  Reference semantics:
per-channel scipy fftconvolve 'same' with the flipped zero-mean FSF
(reference lib_origin.py:1027-1043).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["glr_spatial_pallas"]


def _round_up(x, m):
    return -(-x // m) * m


def _split_bf16(a):
    hi = a.astype(jnp.bfloat16)
    lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _spatial_kernel(x_ref, kr_ref, ki_ref, axr_ref, axi_ref, ayr_ref,
                    ayi_ref, byr_ref, byi_ref, cxr_ref, cxi_ref, out_ref,
                    *, zt, precision):
    """One (ZT, Ny, Nx) channel slab: the full spatial chain in VMEM."""

    if precision == "bf16x3":
        # Mosaic lowers only DEFAULT/HIGHEST dot precision; emulate the
        # 3-pass bf16 scheme (XLA's HIGH) by splitting each operand into
        # bf16 high/low halves: a@b ~ ah@bh + ah@bl + al@bh.  Error vs
        # fp32 ~1e-5 relative through the full chain; half the MXU
        # passes of HIGHEST.  Every operand is split exactly once
        # (factors once per kernel, per-channel operands once per use).
        sp = _split_bf16

        def d3(ap, bp):
            d = lambda u, v: jax.lax.dot_general(
                u, v, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.DEFAULT,
                preferred_element_type=jnp.float32,
            )
            return d(ap[0], bp[0]) + d(ap[0], bp[1]) + d(ap[1], bp[0])
    else:
        sp = lambda a: (a,)

        def d3(ap, bp):
            return jax.lax.dot_general(
                ap[0], bp[0], (((1,), (0,)), ((), ())),
                precision=precision, preferred_element_type=jnp.float32,
            )

    axr_s, axi_s = sp(axr_ref[:]), sp(axi_ref[:])
    ayr_s, ayi_s = sp(ayr_ref[:]), sp(ayi_ref[:])
    byr_s, byi_s = sp(byr_ref[:]), sp(byi_ref[:])
    cxr_s, cxi_s = sp(cxr_ref[:]), sp(cxi_ref[:])

    # fori_loop (not Python unrolling) over the slab's channels: the body
    # is 12 dots — x3 passes in bf16x3 mode — and unrolling zt copies of
    # it makes Mosaic compilation time explode
    def one_channel(t, _):
        ds = sp(x_ref[t])                    # (ny, nx)
        zr_s = sp(d3(ds, axr_s))             # (ny, FXr)   x-DFT
        zi_s = sp(d3(ds, axi_s))
        yr = d3(ayr_s, zr_s) - d3(ayi_s, zi_s)   # (FY, FXr)  y-DFT
        yi = d3(ayr_s, zi_s) + d3(ayi_s, zr_s)
        kr = kr_ref[t]                       # (FY, FXr)   FSF spectrum
        ki = ki_ref[t]
        pr_s = sp(yr * kr - yi * ki)
        pi_s = sp(yr * ki + yi * kr)
        gr = d3(byr_s, pr_s) - d3(byi_s, pi_s)   # (ny, FXr)  inverse y
        gi = d3(byr_s, pi_s) + d3(byi_s, pr_s)
        out_ref[t] = d3(sp(gr), cxr_s) - d3(sp(gi), cxi_s)  # inverse x
        return _

    jax.lax.fori_loop(0, zt, one_channel, None)

def _vmem_bytes(zt, ny, nx, fy, fxr):
    """Approximate double-buffered VMEM footprint of one grid step."""
    nyp, nxp = _round_up(ny, 8), _round_up(nx, 128)
    fyp, fxp = _round_up(fy, 8), _round_up(fxr, 128)
    blocks = zt * (2 * nyp * nxp + 2 * fyp * fxp)      # x+out, kern r/i
    fac = 2 * (nxp * fxp + fyp * nyp + nyp * fyp + fxp * nxp)
    transients = 12 * max(nyp, fyp) * fxp
    return 4 * (2 * blocks + fac + transients)


def _plan_zt(ny, nx, fy, fxr, budget=12 << 20):
    for zt in (16, 12, 8, 4, 2, 1):
        if _vmem_bytes(zt, ny, nx, fy, fxr) <= budget:
            return zt
    return 1


@partial(jax.jit,
         static_argnames=("zt", "interpret", "precision"))
def _spatial_field_pallas(data, kr, ki, fa, zt, interpret, precision):
    nz, ny, nx = data.shape
    fy, fxr = kr.shape[-2:]
    nzp = _round_up(nz, zt)
    if nzp != nz:
        pad = ((0, nzp - nz), (0, 0), (0, 0))
        data = jnp.pad(data, pad)
        kr = jnp.pad(kr, pad)
        ki = jnp.pad(ki, pad)
    grid = (nzp // zt,)
    slab = lambda i: (i, 0, 0)
    full = lambda i: (0, 0)
    res = pl.pallas_call(
        partial(_spatial_kernel, zt=zt, precision=precision),
        grid=grid,
        in_specs=[
            pl.BlockSpec((zt, ny, nx), slab, memory_space=pltpu.VMEM),
            pl.BlockSpec((zt, fy, fxr), slab, memory_space=pltpu.VMEM),
            pl.BlockSpec((zt, fy, fxr), slab, memory_space=pltpu.VMEM),
            pl.BlockSpec((nx, fxr), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((nx, fxr), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((fy, ny), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((fy, ny), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((ny, fy), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((ny, fy), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((fxr, nx), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((fxr, nx), full, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((zt, ny, nx), slab,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nzp, ny, nx), jnp.float32),
        interpret=interpret,
    )(data, kr, ki, fa["axr"], fa["axi"], fa["ayr"], fa["ayi"],
      fa["byr"], fa["byi"], fa["cxr"], fa["cxi"])
    return res[:nz] if nzp != nz else res


def glr_spatial_pallas(cube, kern_r, kern_i, wmaps, factors, zt=None,
                       interpret=False,
                       precision=jax.lax.Precision.HIGHEST):
    """Drop-in fused variant of :func:`origin_tpu.ops.glr.glr_spatial_matmul`.

    Same inputs/outputs: ``cube`` (Nz, Ny, Nx) float32; ``kern_r/kern_i``
    (F, Nz, FY, FXr) real/imag FSF spectra from
    :func:`origin_tpu.ops.glr.precompute_spatial`; ``factors`` from
    :func:`origin_tpu.ops.glr.dft_spatial_factors`; optional mosaic field
    weight maps ``wmaps`` (F, Ny, Nx).  Returns cube_fsf (Nz, Ny, Nx).
    """
    nfields = kern_r.shape[0]
    ny, nx = cube.shape[1:]
    fy, fxr = kern_r.shape[-2:]
    if zt is None:
        zt = _plan_zt(ny, nx, fy, fxr)
    fa = {k: jnp.asarray(v) for k, v in factors.items()}
    out = None
    for f in range(nfields):
        data = cube if wmaps is None else cube * wmaps[f][None]
        o = _spatial_field_pallas(
            data, kern_r[f], kern_i[f], fa, zt, interpret, precision
        )
        out = o if out is None else out + o
    return out
