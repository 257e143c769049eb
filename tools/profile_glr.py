"""Per-stage profiling of the GLR step on the real chip.

Uses the same chained-scan timing trick as bench.py (the tunnel's
block_until_ready is unreliable) to time each stage in isolation.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from origin_tpu.core import MoffatFSF, gaussian_profile
from origin_tpu.ops import compute_local_max
from origin_tpu.ops.convolve import fft2_shape
from origin_tpu.ops.glr import (
    _pack_profiles,
    glr_spatial,
    glr_spatial_pre,
    glr_spectral,
    glr_spectral_mxu,
    pack_profiles_toeplitz,
    precompute_spatial,
    prepare_profiles,
)

NZ, NY, NX = 3681, 100, 200


def timeit_chained(make_body, args, n=4, label=""):
    """make_body(c, *args) -> (c_next, scalar). Times per-iteration cost."""

    def chained(length):
        @jax.jit
        def fn(c, *rest):
            def body(c, _):
                return make_body(c, *rest)

            c, sums = jax.lax.scan(body, c, None, length=length)
            return sums.sum() + c.ravel()[0]

        return fn

    fn_n, fn_0 = chained(n), chained(0)
    float(fn_n(*args))
    float(fn_0(*args))
    t0 = time.perf_counter()
    float(fn_0(*args))
    overhead = time.perf_counter() - t0
    times = []
    for _ in range(2):
        t0 = time.perf_counter()
        float(fn_n(*args))
        times.append(time.perf_counter() - t0)
    dt = (min(times) - overhead) / n
    print(f"{label:24s} {dt*1e3:9.2f} ms")
    return dt


def main():
    rng = np.random.default_rng(0)
    cube = jnp.asarray(rng.normal(size=(NZ, NY, NX)).astype(np.float32))
    mask = jnp.zeros((NZ, NY, NX), dtype=bool)

    fsf = MoffatFSF(fwhm_pol=[-0.2, 0.7], beta_pol=[2.8], pixstep=0.2)
    lbda = 4750.0 + 1.25 * np.arange(NZ)
    psf = jnp.asarray(fsf.get_3darray(lbda, (25, 25)).astype(np.float32))
    profiles = [gaussian_profile(f) for f in (2.0, 6.736842105263158, 12.0)]
    prepped = prepare_profiles(profiles)
    pb, p2b, centers = _pack_profiles(prepped)
    pb, p2b = jnp.asarray(pb), jnp.asarray(p2b)
    fshape2 = fft2_shape((NY, NX), (25, 25))

    # stage 1: spatial
    def body_spatial(c, psf):
        cf, nf = glr_spatial(c, psf[None], None, fshape2)
        return c + cf * 1e-20, nf[0, 0, 0]

    t1 = timeit_chained(body_spatial, (cube, psf), label="spatial FSF conv")

    cube_fsf, norm_fsf = glr_spatial(cube, psf[None], None, fshape2)
    cube_fsf.block_until_ready()

    # stage 2: spectral
    def body_spectral(c, n, pb, p2b):
        correl, profile, cmin = glr_spectral(c, n, pb, p2b, centers, NZ)
        return c + correl * 1e-20, cmin[0, 0, 0]

    t2 = timeit_chained(
        body_spectral, (cube_fsf, norm_fsf, pb, p2b), label="spectral sweep"
    )

    # stage 3: local max
    def body_lmax(c, mask):
        lmax, lmin = compute_local_max(c, -c, mask, 3)
        return c + lmax * 1e-20, lmin[0, 0, 0]

    t3 = timeit_chained(body_lmax, (cube_fsf, mask), label="local max/min")

    tot = t1 + t2 + t3
    print(f"{'total (old)':24s} {tot*1e3:9.2f} ms  "
          f"({NZ*NY*NX/1e6/tot:.1f} Mvox/s)")

    # --- new paths ---
    kern_hats, norm_pre = precompute_spatial(psf[None], None, NY, NX, fshape2)
    kern_hats.block_until_ready()

    def body_spatial_pre(c, kern_hats):
        cf = glr_spatial_pre(c, kern_hats, None, (25, 25), fshape2)
        return c + cf * 1e-20, cf[0, 0, 0]

    t1n = timeit_chained(
        body_spatial_pre, (cube, kern_hats), label="spatial (precomp FSF)"
    )

    t_num, t_den, pad_left, _ = pack_profiles_toeplitz(prepped)
    t_num, t_den = jnp.asarray(t_num), jnp.asarray(t_den)

    import jax.lax as lax

    for prec, lbl in [
        (lax.Precision.HIGHEST, "spectral mxu f32"),
        (lax.Precision.DEFAULT, "spectral mxu bf16"),
    ]:
        def body_mxu(c, n, t_num, t_den, _prec=prec):
            correl, profile, cmin = glr_spectral_mxu(
                c, n, t_num, t_den, pad_left, NZ, precision=_prec
            )
            return c + correl * 1e-20, cmin[0, 0, 0]

        t2n = timeit_chained(
            body_mxu, (cube_fsf, norm_fsf, t_num, t_den), label=lbl
        )

    # spatial via DFT matmuls on the MXU
    from origin_tpu.ops.glr import dft_spatial_factors, glr_spatial_matmul

    factors = {
        k: jnp.asarray(v)
        for k, v in dft_spatial_factors(NY, NX, fshape2, (25, 25)).items()
    }
    kern_r = jnp.real(kern_hats)
    kern_i = jnp.imag(kern_hats)

    def body_spatial_mm(c, kern_r, kern_i):
        cf = glr_spatial_matmul(c, kern_r, kern_i, None, factors)
        return c + cf * 1e-20, cf[0, 0, 0]

    t1m = timeit_chained(
        body_spatial_mm, (cube, kern_r, kern_i), label="spatial (DFT matmul)"
    )

    totn = t1n + t2n + t3
    print(f"{'total (new)':24s} {totn*1e3:9.2f} ms  "
          f"({NZ*NY*NX/1e6/totn:.1f} Mvox/s)")
    totm = t1m + t2n + t3
    print(f"{'total (matmul spatial)':24s} {totm*1e3:9.2f} ms  "
          f"({NZ*NY*NX/1e6/totm:.1f} Mvox/s)")


if __name__ == "__main__":
    main()
