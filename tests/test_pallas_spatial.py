"""Fused Pallas spatial-stage kernel: parity with the XLA matmul path.

Runs in interpret mode on CPU; real-TPU measurements are recorded in
docs/benchmarks.md.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from origin_tpu.core import MoffatFSF
from origin_tpu.ops.convolve import fft2_shape
from origin_tpu.ops.glr import (
    dft_spatial_factors,
    glr_spatial_matmul,
    precompute_spatial,
)
import origin_tpu.ops.pallas_spatial as psp


def _problem(nz, ny, nx, psf_size, nfields=1, seed=0):
    rng = np.random.default_rng(seed)
    cube = jnp.asarray(rng.normal(size=(nz, ny, nx)).astype(np.float32))
    fsf = MoffatFSF(fwhm_pol=[-0.2, 0.7], beta_pol=[2.8], pixstep=0.2)
    psf = fsf.get_3darray(
        4750 + 1.25 * np.arange(nz), (psf_size, psf_size)
    ).astype(np.float32)
    psfs = jnp.stack([psf * (1 + 0.1 * f) for f in range(nfields)])
    wmaps = (
        None if nfields == 1
        else jnp.asarray(
            rng.uniform(0.2, 1.0, size=(nfields, ny, nx)).astype(np.float32)
        )
    )
    fshape2 = fft2_shape((ny, nx), (psf_size, psf_size))
    kern_hats, _ = precompute_spatial(psfs, wmaps, ny, nx, fshape2)
    factors = {
        k: jnp.asarray(v)
        for k, v in dft_spatial_factors(
            ny, nx, fshape2, (psf_size, psf_size)
        ).items()
    }
    return cube, jnp.real(kern_hats), jnp.imag(kern_hats), wmaps, factors


@pytest.mark.parametrize("zt", [1, 4])
def test_pallas_spatial_matches_xla(zt):
    cube, kr, ki, wmaps, factors = _problem(37, 20, 28, 7)
    ref = np.asarray(glr_spatial_matmul(cube, kr, ki, wmaps, factors))
    out = np.asarray(
        psp.glr_spatial_pallas(
            cube, kr, ki, wmaps, factors, zt=zt, interpret=True
        )
    )
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_pallas_spatial_mosaic_fields():
    cube, kr, ki, wmaps, factors = _problem(24, 16, 24, 5, nfields=2)
    ref = np.asarray(glr_spatial_matmul(cube, kr, ki, wmaps, factors))
    out = np.asarray(
        psp.glr_spatial_pallas(
            cube, kr, ki, wmaps, factors, zt=8, interpret=True
        )
    )
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_pallas_spatial_ragged_z():
    # nz not divisible by zt exercises the zero-pad + slice path
    cube, kr, ki, wmaps, factors = _problem(19, 16, 24, 5)
    ref = np.asarray(glr_spatial_matmul(cube, kr, ki, wmaps, factors))
    out = np.asarray(
        psp.glr_spatial_pallas(
            cube, kr, ki, wmaps, factors, zt=8, interpret=True
        )
    )
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_pallas_spatial_bf16x3_mode():
    # interpret mode rounds through bf16 too (astype is real), so this
    # exercises the actual 3-pass error (~1e-5 relative), not just the
    # wiring; on-chip measurements are recorded in docs/benchmarks.md
    cube, kr, ki, wmaps, factors = _problem(16, 16, 24, 5)
    ref = np.asarray(glr_spatial_matmul(cube, kr, ki, wmaps, factors))
    out = np.asarray(
        psp.glr_spatial_pallas(
            cube, kr, ki, wmaps, factors, zt=8, interpret=True,
            precision="bf16x3",
        )
    )
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_plan_zt_fits_budget():
    zt = psp._plan_zt(100, 200, 125, 113)
    assert zt >= 4
    assert psp._vmem_bytes(zt, 100, 200, 125, 113) <= psp.VMEM_BUDGET
    assert psp.spatial_pallas_fits(100, 200, 125, 113)
    # a huge field's factor matrices overflow VMEM even at zt=1: callers
    # must fall back to the XLA matmul path (the engine checks fits)
    assert not psp.spatial_pallas_fits(600, 600, 625, 313)


def test_pallas_spatial_rejects_oversized_field():
    cube = jnp.zeros((2, 600, 600), np.float32)
    kr = jnp.zeros((1, 2, 625, 313), np.float32)
    factors = {}
    with pytest.raises(ValueError, match="does not fit VMEM"):
        psp.glr_spatial_pallas(cube, kr, kr, None, factors)
