"""Measured single-core numpy/scipy baseline for the detection front-end.

The north-star target (BASELINE.json) is phrased against "the numpy/scipy
reference".  The reference package's own recorded timings come from a 2019
desktop; this tool times the NUMPY ORACLE implementations of the same
equations (tests/oracle.py — per-spaxel GLS DCT loop mirroring reference
lib_origin.py:231-238, per-channel scipy fftconvolve + profile FFT sweep
mirroring lib_origin.py:1027-1213, 3-D maximum_filter local extrema) on
THIS host, so the device-vs-numpy speedup is a same-machine comparison.

The oracle math is pinned equal to the device kernels by the parity test
suite (tests/test_ops.py), so the timing comparison is apples-to-apples.

Usage:
    python tools/bench_oracle.py [--ny 100 --nx 200] [--nz 3681]
                                 [--spaxel-sample 2000]

The full per-spaxel DCT loop over a 300x300 field takes tens of minutes;
--spaxel-sample N times the loop on N spaxels and extrapolates linearly
(the loop is embarrassingly per-spaxel, so the extrapolation is exact up
to cache effects; pass 0 to run it fully).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nz", type=int, default=3681)
    ap.add_argument("--ny", type=int, default=100)
    ap.add_argument("--nx", type=int, default=200)
    ap.add_argument("--nprof", type=int, default=3)
    ap.add_argument("--spaxel-sample", type=int, default=2000)
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    import oracle

    from origin_tpu.core import MoffatFSF, gaussian_profile

    nz, ny, nx = args.nz, args.ny, args.nx
    rng = np.random.default_rng(0)
    cube = rng.normal(size=(nz, ny, nx)).astype(np.float32)
    var = rng.uniform(0.5, 1.5, size=(nz, ny, nx)).astype(np.float32)
    valid = np.ones((ny, nx), dtype=bool)
    mask = np.zeros((nz, ny, nx), dtype=bool)

    fsf = MoffatFSF(fwhm_pol=[-0.2, 0.7], beta_pol=[2.8], pixstep=0.2)
    lbda = 4750.0 + 1.25 * np.arange(nz)
    psf = fsf.get_3darray(lbda, (25, 25)).astype(np.float32)
    fwhms = np.linspace(2.0, 12.0, 20)[:args.nprof] if args.nprof != 3 \
        else np.array([2.0, 6.736842105263158, 12.0])
    profiles = [gaussian_profile(f) for f in fwhms]

    out = {}

    # --- DCT continuum (per-spaxel GLS loop, reference lib_origin.py:231) --
    t0 = time.perf_counter()
    if args.spaxel_sample and args.spaxel_sample < ny * nx:
        s = args.spaxel_sample
        sy = max(1, s // nx)
        oracle.dct_continuum_gls(cube[:, :sy], 10, var[:, :sy], valid[:sy])
        dt = (time.perf_counter() - t0) * (ny / sy)
        out["dct_gls_s"] = round(dt, 1)
        out["dct_gls_note"] = f"extrapolated from {sy}x{nx} spaxel rows"
    else:
        oracle.dct_continuum_gls(cube, 10, var, valid)
        out["dct_gls_s"] = round(time.perf_counter() - t0, 1)

    # --- GLR matched filter (per-channel fftconvolve + profile sweep) -----
    t0 = time.perf_counter()
    correl, profile, correl_min = oracle.glr_oracle(cube, psf, profiles)
    out["glr_s"] = round(time.perf_counter() - t0, 1)

    # --- 3-D local extrema ------------------------------------------------
    t0 = time.perf_counter()
    oracle.local_max_oracle(correl, correl_min, mask, 3)
    out["local_max_s"] = round(time.perf_counter() - t0, 1)

    out["geometry"] = f"{nz}x{ny}x{nx}, {len(profiles)} profiles"
    out["front_end_total_s"] = round(
        out["dct_gls_s"] + out["glr_s"] + out["local_max_s"], 1)
    for k, v in out.items():
        print(f"{k}: {v}")
    if args.json:
        print(json.dumps(out))


if __name__ == "__main__":
    main()
