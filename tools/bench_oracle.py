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

# a numpy baseline tool must never initialize (or contend for) the TPU;
# the origin_tpu imports below pull in jax.  This environment pre-imports
# jax with the axon TPU platform, so the env var alone is too late — the
# live config must be overridden before any backend initializes (same
# trick as tests/conftest.py)
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))


def backend_times(session, max_lines=0):
    """Same-host numpy timings of the BACK-END oracles on a real
    session's inputs (VERDICT r4 item 6): greedy PCA per area on the
    session's cube_std/areamap/thresO2 (the exact step-04 inputs,
    reference lib_origin.py:848-954) and the per-line PCA-LS estimator
    on the session's Cat1 detections over the raw cube (the dominant
    cost of reference estimation_line, lib_origin.py:1804-1938: two
    ARPACK rank-1 SVDs + weighted LS deconvolution per (Nz, 25, 25)
    minicube; the surrounding peak search and catalog bookkeeping are
    negligible next to the SVDs and are not timed).
    """
    import oracle

    from origin_tpu import ORIGIN

    orig = ORIGIN.load(session)
    out = {}
    try:
        cube_std = np.asarray(orig.cube_std.data, dtype=np.float32)
        areamap = np.asarray(orig.areamap.data, dtype=int)
        thres = [float(t) for t in orig.thresO2]
        nz = cube_std.shape[0]

        t0 = time.perf_counter()
        iters = 0
        for area in range(1, int(orig.nbAreas) + 1):
            sel = areamap == area
            cube2d = cube_std[:, sel]
            test = np.mean(cube2d ** 2, axis=0)
            _, mapo2, _ = oracle.greedy_pca_oracle(
                cube2d, test, thres[area - 1], 50, 100)
            iters += int(mapo2.max()) if mapo2.size else 0
        out["pca_greedy_s"] = round(time.perf_counter() - t0, 1)
        out["pca_areas"] = int(orig.nbAreas)
        out["pca_max_iters"] = iters

        cat1 = orig.Cat1
        xs = np.asarray(cat1["x0"], int)
        ys = np.asarray(cat1["y0"], int)
        zs = np.asarray(cat1["z0"], int)
        if max_lines:
            xs, ys, zs = xs[:max_lines], ys[:max_lines], zs[:max_lines]
        raw = orig.cube_raw
        var = orig.var
        psf = np.asarray(orig.PSF, np.float32)
        size = psf.shape[-1]
        ny, nx = raw.shape[1:]
        h = size // 2
        t0 = time.perf_counter()
        for x, y, z in zip(xs, ys, zs):
            dat = np.zeros((nz, size, size), np.float32)
            varw = np.full((nz, size, size), np.inf, np.float32)
            sy0, sy1 = max(0, y - h), min(ny, y + h + 1)
            sx0, sx1 = max(0, x - h), min(nx, x + h + 1)
            dy0, dx0 = sy0 - (y - h), sx0 - (x - h)
            dat[:, dy0:dy0 + sy1 - sy0, dx0:dx0 + sx1 - sx0] = \
                raw[:, sy0:sy1, sx0:sx1]
            varw[:, dy0:dy0 + sy1 - sy0, dx0:dx0 + sx1 - sx0] = \
                var[:, sy0:sy1, sx0:sx1]
            oracle.method_pca_wgt_oracle(dat, varw, psf, 30)
        out["estimation_s"] = round(time.perf_counter() - t0, 1)
        out["estimation_lines"] = int(len(xs))
        if max_lines and len(cat1) > max_lines:
            out["estimation_note"] = (
                f"timed {max_lines} of {len(cat1)} lines; scale linearly")
    finally:
        orig.close_logfile()
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nz", type=int, default=3681)
    ap.add_argument("--ny", type=int, default=100)
    ap.add_argument("--nx", type=int, default=200)
    ap.add_argument("--nprof", type=int, default=3)
    ap.add_argument("--spaxel-sample", type=int, default=2000)
    ap.add_argument("--json", action="store_true")
    ap.add_argument("--session", default=None,
                    help="also time the numpy BACK-END oracles (greedy "
                    "PCA, per-line estimation) on this session's inputs")
    ap.add_argument("--max-lines", type=int, default=0,
                    help="time at most N estimation lines (0 = all)")
    ap.add_argument("--backend-only", action="store_true",
                    help="skip the front-end timings (requires --session)")
    args = ap.parse_args()

    if args.backend_only:
        out = backend_times(args.session, args.max_lines)
        out["backend_total_s"] = round(
            out["pca_greedy_s"] + out["estimation_s"], 1)
        for k, v in out.items():
            print(f"{k}: {v}")
        if args.json:
            print(json.dumps(out))
        return

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
    if args.session:
        out.update(backend_times(args.session, args.max_lines))
        out["e2e_total_s"] = round(
            out["front_end_total_s"] + out["pca_greedy_s"]
            + out["estimation_s"], 1)
    for k, v in out.items():
        print(f"{k}: {v}")
    if args.json:
        print(json.dumps(out))


if __name__ == "__main__":
    main()
