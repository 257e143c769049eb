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
bank, one write of the result.  Mosaic fields weight the slab in VMEM
(``w_ref``), so the weighted cube is never materialized in HBM either.

Numerics match glr_spatial_matmul exactly in structure: the same factor
matrices (ops.glr.dft_spatial_factors — padded real 2-D DFT with the
centred 'same' slice and real-symmetry weights folded into the inverse
factors), the same float32 HIGHEST-precision dots by default; see
ops.pallas_prec for the bf16x3 throughput mode.  Reference semantics:
per-channel scipy fftconvolve 'same' with the flipped zero-mean FSF
(reference lib_origin.py:1027-1043).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_prec import make_dot

__all__ = ["glr_spatial_pallas", "spatial_pallas_fits"]


def _round_up(x, m):
    return -(-x // m) * m


def _spatial_kernel(*refs, zt, precision, has_w):
    """One (ZT, Ny, Nx) channel slab: the full spatial chain in VMEM."""
    if has_w:
        (x_ref, kr_ref, ki_ref, w_ref, axr_ref, axi_ref, ayr_ref, ayi_ref,
         byr_ref, byi_ref, cxr_ref, cxi_ref, out_ref) = refs
        w = w_ref[:]
    else:
        (x_ref, kr_ref, ki_ref, axr_ref, axi_ref, ayr_ref, ayi_ref,
         byr_ref, byi_ref, cxr_ref, cxi_ref, out_ref) = refs
        w = None

    sp, d3 = make_dot(precision)
    axr_s, axi_s = sp(axr_ref[:]), sp(axi_ref[:])
    ayr_s, ayi_s = sp(ayr_ref[:]), sp(ayi_ref[:])
    byr_s, byi_s = sp(byr_ref[:]), sp(byi_ref[:])
    cxr_s, cxi_s = sp(cxr_ref[:]), sp(cxi_ref[:])

    # fori_loop (not Python unrolling) over the slab's channels: the body
    # is 12 dots — x3 passes in bf16x3 mode — and unrolling zt copies of
    # it makes Mosaic compilation time explode
    def one_channel(t, _):
        d = x_ref[t]                         # (ny, nx)
        if w is not None:
            d = d * w                        # mosaic field weight, in VMEM
        ds = sp(d)
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


VMEM_BUDGET = 12 << 20


def spatial_pallas_fits(ny, nx, fy, fxr, budget=VMEM_BUDGET):
    """Whether the fused kernel fits VMEM for this field/grid geometry.

    The factor matrices scale with the field size and do not shrink with
    the slab height, so very large spatial fields cannot run fused even
    at zt=1 — callers must fall back to the XLA matmul path then.
    """
    return _vmem_bytes(1, ny, nx, fy, fxr) <= budget


def _plan_zt(ny, nx, fy, fxr, budget=VMEM_BUDGET):
    for zt in (16, 12, 8, 4, 2, 1):
        if _vmem_bytes(zt, ny, nx, fy, fxr) <= budget:
            return zt
    return 1


@partial(jax.jit,
         static_argnames=("zt", "interpret", "precision"))
def _spatial_field_pallas(data, kr, ki, wmap, fa, zt, interpret, precision):
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
    has_w = wmap is not None
    in_specs = [
        pl.BlockSpec((zt, ny, nx), slab, memory_space=pltpu.VMEM),
        pl.BlockSpec((zt, fy, fxr), slab, memory_space=pltpu.VMEM),
        pl.BlockSpec((zt, fy, fxr), slab, memory_space=pltpu.VMEM),
    ]
    args = [data, kr, ki]
    if has_w:
        in_specs.append(
            pl.BlockSpec((ny, nx), full, memory_space=pltpu.VMEM)
        )
        args.append(wmap)
    in_specs += [
        pl.BlockSpec((nx, fxr), full, memory_space=pltpu.VMEM),
        pl.BlockSpec((nx, fxr), full, memory_space=pltpu.VMEM),
        pl.BlockSpec((fy, ny), full, memory_space=pltpu.VMEM),
        pl.BlockSpec((fy, ny), full, memory_space=pltpu.VMEM),
        pl.BlockSpec((ny, fy), full, memory_space=pltpu.VMEM),
        pl.BlockSpec((ny, fy), full, memory_space=pltpu.VMEM),
        pl.BlockSpec((fxr, nx), full, memory_space=pltpu.VMEM),
        pl.BlockSpec((fxr, nx), full, memory_space=pltpu.VMEM),
    ]
    args += [fa["axr"], fa["axi"], fa["ayr"], fa["ayi"],
             fa["byr"], fa["byi"], fa["cxr"], fa["cxi"]]
    res = pl.pallas_call(
        partial(_spatial_kernel, zt=zt, precision=precision, has_w=has_w),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((zt, ny, nx), slab,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nzp, ny, nx), jnp.float32),
        interpret=interpret,
    )(*args)
    return res[:nz] if nzp != nz else res


def glr_spatial_pallas(cube, kern_r, kern_i, wmaps, factors, zt=None,
                       interpret=False,
                       precision=jax.lax.Precision.HIGHEST):
    """Drop-in fused variant of :func:`origin_tpu.ops.glr.glr_spatial_matmul`.

    Same inputs/outputs: ``cube`` (Nz, Ny, Nx) float32; ``kern_r/kern_i``
    (F, Nz, FY, FXr) real/imag FSF spectra from
    :func:`origin_tpu.ops.glr.precompute_spatial`; ``factors`` from
    :func:`origin_tpu.ops.glr.dft_spatial_factors`; optional mosaic field
    weight maps ``wmaps`` (F, Ny, Nx), applied to the VMEM slab inside
    the kernel.  Returns cube_fsf (Nz, Ny, Nx).

    Raises ValueError when the geometry cannot fit VMEM even at zt=1
    (check :func:`spatial_pallas_fits` first and fall back to the XLA
    path).
    """
    nfields = kern_r.shape[0]
    ny, nx = cube.shape[1:]
    fy, fxr = kern_r.shape[-2:]
    if not spatial_pallas_fits(ny, nx, fy, fxr):
        raise ValueError(
            f"fused spatial kernel does not fit VMEM for field "
            f"({ny}, {nx}) with DFT grid ({fy}, {fxr}); use "
            "ops.glr.glr_spatial_matmul"
        )
    if zt is None:
        zt = _plan_zt(ny, nx, fy, fxr)
    fa = {k: jnp.asarray(v) for k, v in factors.items()}
    out = None
    for f in range(nfields):
        wmap = None if wmaps is None else wmaps[f]
        o = _spatial_field_pallas(
            cube, kern_r[f], kern_i[f], wmap, fa, zt, interpret, precision
        )
        out = o if out is None else out + o
    return out
