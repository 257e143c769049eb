"""Benchmark: GLR matched-filter throughput on one chip.

Measures the hot kernel of the pipeline (step05, Correlation_GLR_test +
local extrema) on the reference notebook's configuration: a MUSE UDF-10
style sub-cube of 100x200 spaxels x 3681 channels with the 3-profile
dictionary and a 25x25 wavelength-dependent Moffat FSF.

Baseline: the reference runs this step in 11.57 s single-core
(docs/example.ipynb cell 36/79) => 73.62 Mvoxels / 11.57 s = 6.36 Mvox/s.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

NZ, NY, NX = 3681, 100, 200
BASELINE_MVOX_S = (NZ * NY * NX / 1e6) / 11.57


def main():
    import jax
    import jax.numpy as jnp

    from origin_tpu.core import MoffatFSF, gaussian_profile
    from origin_tpu.ops import compute_local_max
    from origin_tpu.ops.convolve import fft2_shape
    from origin_tpu.ops.glr import (
        dft_spatial_factors,
        glr_spatial_matmul,
        glr_spectral_mxu,
        pack_profiles_toeplitz,
        precompute_spatial,
        prepare_profiles,
    )

    rng = np.random.default_rng(0)
    cube = rng.normal(size=(NZ, NY, NX)).astype(np.float32)
    mask = np.zeros((NZ, NY, NX), dtype=bool)

    fsf = MoffatFSF(fwhm_pol=[-0.2, 0.7], beta_pol=[2.8], pixstep=0.2)
    lbda = 4750.0 + 1.25 * np.arange(NZ)
    psf = fsf.get_3darray(lbda, (25, 25)).astype(np.float32)
    profiles = [gaussian_profile(f) for f in (2.0, 6.736842105263158, 12.0)]

    prepped = prepare_profiles(profiles)
    t_num, t_den, pad_left, _ = pack_profiles_toeplitz(prepped)
    fshape2 = fft2_shape((NY, NX), (25, 25))

    # instrument-model preprocessing (FSF spectra, norm cube, DFT factor
    # matrices), amortized across every cube observed with this
    # FSF/profile configuration
    kern_hats, norm_fsf = precompute_spatial(
        jnp.asarray(psf)[None], None, NY, NX, fshape2
    )
    kern_r, kern_i = jnp.real(kern_hats), jnp.imag(kern_hats)
    factors = {
        k: jnp.asarray(v)
        for k, v in dft_spatial_factors(NY, NX, fshape2, (25, 25)).items()
    }

    def step05(cube, kern_r, kern_i, norm_fsf, t_num, t_den, mask):
        cube_fsf = glr_spatial_matmul(cube, kern_r, kern_i, None, factors)
        correl, profile, correl_min = glr_spectral_mxu(
            cube_fsf, norm_fsf, t_num, t_den, pad_left, NZ
        )
        lmax, lmin = compute_local_max(correl, correl_min, mask, 3)
        return correl, profile, lmax, lmin

    # This TPU is reached through an async tunnel whose block_until_ready
    # does not reliably block, so we time N back-to-back iterations chained
    # inside ONE jitted scan (each iteration's input depends on the previous
    # output, preventing elision) and fetch a scalar, which forces full
    # execution.  Per-iteration time = (T_chain(N) - T_chain(0)) / N.
    def chained(n):
        @jax.jit
        def fn(cube, kern_r, kern_i, norm_fsf, t_num, t_den, mask):
            def body(c, _):
                correl, profile, lmax, lmin = step05(
                    c, kern_r, kern_i, norm_fsf, t_num, t_den, mask
                )
                # cheap, non-elidable data dependency for the next iteration
                return c + correl * 1e-20, lmax.sum()
            c, sums = jax.lax.scan(body, cube, None, length=n)
            return sums.sum() + c[0, 0, 0]
        return fn

    args = (
        jnp.asarray(cube),
        kern_r,
        kern_i,
        norm_fsf,
        jnp.asarray(t_num),
        jnp.asarray(t_den),
        jnp.asarray(mask),
    )

    n_iter = int(os.environ.get("BENCH_ITERS", "4"))
    fn_n = chained(n_iter)
    fn_0 = chained(0)
    float(fn_n(*args))  # compile + warmup
    float(fn_0(*args))

    t0 = time.perf_counter()
    float(fn_0(*args))
    overhead = time.perf_counter() - t0

    times = []
    for _ in range(2):
        t0 = time.perf_counter()
        float(fn_n(*args))
        times.append(time.perf_counter() - t0)
    dt = max(1e-9, (min(times) - overhead) / n_iter)

    mvox_s = NZ * NY * NX / 1e6 / dt
    print(
        json.dumps(
            {
                "metric": "glr_correlation_throughput",
                "value": round(mvox_s, 2),
                "unit": "Mvoxels/s/chip",
                "vs_baseline": round(mvox_s / BASELINE_MVOX_S, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
