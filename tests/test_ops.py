"""Kernel-level parity tests: JAX device kernels vs numpy/scipy oracles."""

import numpy as np
import pytest

import oracle
from origin_tpu.ops import (
    compute_local_max,
    compute_thresh_gaussfit,
    compute_threshold_purity,
    correlation_glr_test,
    counts_above_thresholds,
    dct_residual,
    dctmat,
    greedy_pca,
    greedy_pca_by_area,
    ls_deconv_wgt,
    method_pca_wgt,
    o2test,
    rank1_left_vector,
    standardize,
    estimation_line_arrays,
)

import jax.numpy as jnp


@pytest.fixture(scope="module")
def small_cube():
    rng = np.random.default_rng(7)
    nz, ny, nx = 80, 12, 10
    cube = rng.normal(size=(nz, ny, nx)).astype(np.float32)
    var = rng.uniform(0.5, 2.0, size=(nz, ny, nx)).astype(np.float32)
    mask = np.zeros((nz, ny, nx), dtype=bool)
    mask[:, 0, 0] = True  # fully masked spaxel
    mask[3, 1, 1] = True  # partially masked spaxel
    # add continuum on some spaxels
    z = np.arange(nz)
    cube[:, 5, 5] += 3.0 * np.cos(np.pi * z / nz)
    cube[:, 6, 6] += 2.0 + 0.01 * z
    return cube, var, mask


def test_dctmat_orthonormal():
    d = dctmat(100, 10)
    np.testing.assert_allclose(d.T @ d, np.eye(11), atol=2e-6)


def test_dct_residual_approx(small_cube):
    cube, var, mask = small_cube
    cont = np.asarray(dct_residual(cube, 10, approx=True))
    d = oracle.dct_basis(cube.shape[0], 10)
    expected = np.einsum("zi,iyx->zyx", d, np.einsum("zi,zyx->iyx", d, cube))
    np.testing.assert_allclose(cont, expected, atol=2e-4)


def test_dct_residual_gls_matches_oracle(small_cube):
    cube, var, mask = small_cube
    cont = np.asarray(dct_residual(cube, 10, var=var, mask=mask))
    valid = ~np.any(mask, axis=0)
    expected = oracle.dct_continuum_gls(cube, 10, var, valid)
    np.testing.assert_allclose(cont, expected, atol=5e-4, rtol=1e-3)


def test_o2test(small_cube):
    cube = small_cube[0]
    np.testing.assert_allclose(
        np.asarray(o2test(cube)), oracle.o2(cube), rtol=1e-5
    )


def test_standardize(small_cube):
    cube, var, mask = small_cube
    cont = np.asarray(dct_residual(cube, 10, var=var, mask=mask))
    std_cube, cont_std = standardize(cube, cont, var, mask)
    std_cube = np.asarray(std_cube)
    # oracle: nan-based computation
    data = cube - cont
    data[mask] = np.nan
    mean = np.nanmean(data, axis=(1, 2))
    expected = (data - mean[:, None, None]) / np.sqrt(var)
    expected[mask] = 0
    np.testing.assert_allclose(std_cube, expected, atol=2e-4)
    assert np.all(std_cube[mask] == 0)


def test_local_max_matches_scipy(small_cube):
    cube, var, mask = small_cube
    rng = np.random.default_rng(3)
    correl = rng.normal(size=cube.shape).astype(np.float32)
    correl_min = rng.normal(size=cube.shape).astype(np.float32)
    lm, lmin = compute_local_max(correl, correl_min, mask, 3)
    elm, elmin = oracle.local_max_oracle(correl, correl_min, mask, 3)
    np.testing.assert_allclose(np.asarray(lm), elm, atol=1e-6)
    np.testing.assert_allclose(np.asarray(lmin), elmin, atol=1e-6)


def test_local_max_size5(small_cube):
    cube, var, mask = small_cube
    rng = np.random.default_rng(4)
    correl = rng.normal(size=cube.shape).astype(np.float32)
    lm, lmin = compute_local_max(correl, correl, mask, 5)
    elm, elmin = oracle.local_max_oracle(correl, correl, mask, 5)
    np.testing.assert_allclose(np.asarray(lm), elm, atol=1e-6)


def test_gaussfit_threshold_recovers_noise_stats():
    rng = np.random.default_rng(5)
    data = rng.normal(loc=1.0, scale=0.1, size=20000)
    hist, bins, thres, mea, std = compute_thresh_gaussfit(data, 0.01)
    assert abs(mea - 1.0) < 0.02
    assert abs(std - 0.1) < 0.03
    # threshold ~ mean + 2.33 sigma for pfa=0.01
    assert 1.15 < thres < 1.35


def test_glr_matches_oracle():
    rng = np.random.default_rng(11)
    nz, ny, nx = 60, 9, 8
    cube = rng.normal(size=(nz, ny, nx)).astype(np.float32)
    # wavelength-dependent PSF
    from origin_tpu.core import MoffatFSF, gaussian_profile

    fsf = MoffatFSF(fwhm_pol=[0.2, 0.6], beta_pol=[2.8], pixstep=0.2)
    lbda = np.linspace(5000, 9000, nz)
    psf = fsf.get_3darray(lbda, (7, 7)).astype(np.float32)
    profiles = [gaussian_profile(f, 41, 20) for f in (2.0, 6.0)]

    correl, prof, correl_min = correlation_glr_test(cube, psf, None, profiles)
    ecorrel, eprof, ecorrel_min = oracle.glr_oracle(cube, psf, profiles)

    np.testing.assert_allclose(correl, ecorrel, atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(correl_min, ecorrel_min, atol=2e-3, rtol=1e-3)
    # profile argmax can differ at near-ties; demand 99% agreement
    agree = np.mean(prof == eprof)
    assert agree > 0.99


def test_glr_mosaic_weighted_sum():
    rng = np.random.default_rng(12)
    nz, ny, nx = 40, 8, 8
    cube = rng.normal(size=(nz, ny, nx)).astype(np.float32)
    from origin_tpu.core import MoffatFSF, gaussian_profile

    fsf = MoffatFSF(fwhm_pol=[0.6], beta_pol=[2.8], pixstep=0.2)
    psf = fsf.get_3darray(np.linspace(5000, 9000, nz), (5, 5)).astype(np.float32)
    w1 = np.zeros((ny, nx), np.float32)
    w1[:, :4] = 1
    w2 = 1 - w1
    profiles = [gaussian_profile(4.0, 31, 15)]
    correl, prof, correl_min = correlation_glr_test(
        cube, [psf, psf], [w1, w2], profiles
    )
    # with identical PSFs and complementary weights, must equal single field
    correl1, _, _ = correlation_glr_test(cube, psf, None, profiles)
    np.testing.assert_allclose(correl, correl1, atol=2e-3, rtol=1e-3)


def test_rank1_left_vector_matches_svd():
    rng = np.random.default_rng(13)
    m = rng.normal(size=(50, 30)).astype(np.float32)
    # make dominant direction pronounced
    u_true = rng.normal(size=50)
    u_true /= np.linalg.norm(u_true)
    m += 10 * np.outer(u_true, rng.normal(size=30)).astype(np.float32)
    u = np.asarray(rank1_left_vector(jnp.asarray(m)))
    u_svd = np.linalg.svd(m, full_matrices=False)[0][:, 0]
    assert min(np.linalg.norm(u - u_svd), np.linalg.norm(u + u_svd)) < 1e-3


def _pca_problem(nz=60, npix=40, seed=21):
    rng = np.random.default_rng(seed)
    cube = rng.normal(size=(nz, npix)).astype(np.float32)
    # strong nuisance sources in a few columns
    spec = np.exp(-0.5 * ((np.arange(nz) - 30) / 8.0) ** 2)
    for j, amp in [(5, 10.0), (6, 8.0), (20, 12.0)]:
        cube[:, j] += amp * spec
    test = np.mean(cube ** 2, axis=0)
    thres = np.percentile(test, 80)
    return cube, test.astype(np.float32), float(thres)


def test_greedy_pca_matches_oracle():
    cube, test, thres = _pca_problem()
    faint, mapo2, nstop = greedy_pca(
        jnp.asarray(cube),
        jnp.ones(cube.shape[1], dtype=bool),
        jnp.asarray(test),
        thres,
        noise_population=50.0,
        itermax=100,
    )
    efaint, emapo2, enstop = oracle.greedy_pca_oracle(cube, test, thres, 50, 100)
    np.testing.assert_array_equal(np.asarray(mapo2), emapo2)
    assert int(nstop) == enstop
    np.testing.assert_allclose(np.asarray(faint), efaint, atol=5e-3)
    # all spaxels must now pass the test
    assert np.all(np.mean(np.asarray(faint) ** 2, axis=0) <= thres + 1e-5)


def test_greedy_pca_padding_invariance():
    cube, test, thres = _pca_problem()
    nz, npix = cube.shape
    pad = 64
    cube_pad = np.zeros((nz, npix + pad), np.float32)
    cube_pad[:, :npix] = cube
    valid = np.zeros(npix + pad, bool)
    valid[:npix] = True
    test_pad = np.zeros(npix + pad, np.float32)
    test_pad[:npix] = test
    f1, m1, _ = greedy_pca(
        jnp.asarray(cube), jnp.ones(npix, bool), jnp.asarray(test), thres
    )
    f2, m2, _ = greedy_pca(
        jnp.asarray(cube_pad), jnp.asarray(valid), jnp.asarray(test_pad), thres
    )
    np.testing.assert_allclose(np.asarray(f2)[:, :npix], np.asarray(f1), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(m2)[:npix], np.asarray(m1))
    assert np.all(np.asarray(f2)[:, npix:] == 0)


def test_greedy_pca_itermax():
    cube, test, thres = _pca_problem()
    faint, mapo2, nstop = greedy_pca(
        jnp.asarray(cube), jnp.ones(cube.shape[1], bool), jnp.asarray(test),
        thres, itermax=1,
    )
    efaint, emapo2, enstop = oracle.greedy_pca_oracle(cube, test, thres, 50, 1)
    assert int(nstop) == enstop == 1
    np.testing.assert_array_equal(np.asarray(mapo2), emapo2)


def test_greedy_pca_by_area():
    cube, test, thres = _pca_problem()
    nz = cube.shape[0]
    # lay the 40 columns out as an 5x8 map with two areas
    cube3d = cube.reshape(nz, 5, 8)
    areamap = np.ones((5, 8), dtype=int)
    areamap[:, 4:] = 2
    tests = [
        np.mean(cube3d[:, areamap == a] ** 2, axis=0) for a in (1, 2)
    ]
    faint, mapo2, nstop = greedy_pca_by_area(
        cube3d, areamap, [thres, thres], tests
    )
    assert faint.shape == cube3d.shape
    o2map = np.mean(faint ** 2, axis=0)
    # the loop may bail out with a single remaining nuisance spaxel per area
    # (reference lib_origin.py:927-931), so allow at most one per area
    for a in (1, 2):
        assert np.sum(o2map[areamap == a] > thres + 1e-5) <= 1


def test_counts_above_thresholds():
    rng = np.random.default_rng(31)
    v = rng.normal(size=1000).astype(np.float32)
    th = np.linspace(-1, 2, 13).astype(np.float32)
    counts = np.asarray(counts_above_thresholds(jnp.asarray(v), jnp.asarray(th)))
    expected = [(v > t).sum() for t in th]
    np.testing.assert_array_equal(counts, expected)


def test_compute_threshold_purity():
    rng = np.random.default_rng(33)
    shape = (40, 20, 20)
    lmax = np.zeros(shape, np.float32)
    lmin = np.zeros(shape, np.float32)
    # noise peaks in both cubes, signal peaks only in max cube
    idx = rng.integers(0, 40 * 400, size=300)
    lmax.ravel()[idx] = rng.uniform(2, 6, 300)
    idx = rng.integers(0, 40 * 400, size=300)
    lmin.ravel()[idx] = rng.uniform(2, 6, 300)
    lmax.ravel()[rng.integers(0, 40 * 400, 50)] = rng.uniform(8, 12, 50)
    thresh, res = compute_threshold_purity(0.9, lmax, lmin)
    assert np.isfinite(thresh)
    assert res.colnames == ["Tval_r", "Pval_r", "Det_m", "Det_M"]
    # counting at the estimated threshold: purity must be >= 0.9 - eps
    n1 = (lmax > thresh).sum()
    n0 = (lmin > thresh).sum()
    assert 1 - n0 / n1 >= 0.85


def test_purity_pair_matches_single_calls():
    """The fused step-06 program must reproduce the two independent scans."""
    from origin_tpu.ops import compute_threshold_purity_pair

    rng = np.random.default_rng(34)
    shape = (40, 20, 20)

    def noisy(nsig):
        c = np.zeros(shape, np.float32)
        c.ravel()[rng.integers(0, c.size, 300)] = rng.uniform(2, 6, 300)
        if nsig:
            c.ravel()[rng.integers(0, c.size, nsig)] = rng.uniform(8, 12, nsig)
        return c

    lmax, lmin = noisy(50), noisy(0)
    slmax, slmin = noisy(80), noisy(0)
    segmap = np.zeros(shape[1:], int)
    segmap[5:10, 5:10] = 1

    # explicit threshold list: exact equality with the single-scan calls
    th = np.linspace(2.0, 8.0, 50)
    t_c, pv, t_s, pvc = compute_threshold_purity_pair(
        0.9, lmax, lmin, slmax, slmin, segmap, threshlist=th
    )
    t_c1, pv1 = compute_threshold_purity(0.9, lmax, lmin, segmap,
                                         threshlist=th)
    t_s1, pvc1 = compute_threshold_purity(0.9, slmax, slmin, threshlist=th)
    assert t_c == t_c1 and t_s == t_s1
    for col in ("Tval_r", "Pval_r", "Det_m", "Det_M"):
        np.testing.assert_allclose(np.asarray(pv[col], float),
                                   np.asarray(pv1[col], float))
        np.testing.assert_allclose(np.asarray(pvc[col], float),
                                   np.asarray(pvc1[col], float))

    # auto grids: fused device linspace vs host linspace, float32 round-off
    t_c, pv, t_s, pvc = compute_threshold_purity_pair(
        0.9, lmax, lmin, slmax, slmin, segmap
    )
    t_c1, _ = compute_threshold_purity(0.9, lmax, lmin, segmap)
    t_s1, _ = compute_threshold_purity(0.9, slmax, slmin)
    assert t_c == pytest.approx(t_c1, abs=1e-3)
    assert t_s == pytest.approx(t_s1, abs=1e-3)


def test_purity_pair_auto_grid_endpoint():
    """The fused auto grid must pin its last threshold exactly to tmax.

    float32 grid arithmetic can otherwise land the endpoint strictly below
    min(max(cmax), max(cmin)); the cube maximum then counts into the top of
    the noise curve, the purity collapses and the step silently returns
    threshold = inf (empty catalog).  Stressed over many random cubes: the
    pair function must agree with the two single scans and never go
    infinite when they do not."""
    from origin_tpu.ops import compute_threshold_purity_pair

    shape = (30, 16, 16)
    segmap = np.zeros(shape[1:], int)
    for seed in range(40):
        rng = np.random.default_rng(1000 + seed)

        def noisy(hi):
            c = np.zeros(shape, np.float32)
            idx = rng.integers(0, c.size, 200)
            c.ravel()[idx] = rng.uniform(2, hi, 200).astype(np.float32)
            return c

        lmax, lmin = noisy(9.0), noisy(6.0)
        slmax, slmin = noisy(8.0), noisy(5.5)
        t_c, pv, t_s, pvc = compute_threshold_purity_pair(
            0.9, lmax, lmin, slmax, slmin, segmap
        )
        t_c1, _ = compute_threshold_purity(0.9, lmax, lmin, segmap)
        t_s1, _ = compute_threshold_purity(0.9, slmax, slmin)
        assert np.isfinite(t_c) == np.isfinite(t_c1), f"seed {seed}"
        assert np.isfinite(t_s) == np.isfinite(t_s1), f"seed {seed}"
        if np.isfinite(t_c1):
            assert t_c == pytest.approx(t_c1, abs=1e-3), f"seed {seed}"
        if np.isfinite(t_s1):
            assert t_s == pytest.approx(t_s1, abs=1e-3), f"seed {seed}"
        # noise curve reaches purity 1.0 at the pinned endpoint
        assert np.asarray(pv["Pval_r"], float)[-1] == pytest.approx(1.0)
        assert np.asarray(pvc["Pval_r"], float)[-1] == pytest.approx(1.0)


def test_line_max_images_kernel_matches_host_path():
    """Batched device max-images == per-source subcube + get_image(max),
    including windows hanging off the field edge."""
    from origin_tpu.core.containers import Cube
    from origin_tpu.pipeline.engine import DeferredCube
    from origin_tpu.artifacts.masks import _fetch_line_images, _line_zrange

    rng = np.random.default_rng(35)
    nz, ny, nx = 60, 30, 28
    data = rng.normal(size=(nz, ny, nx)).astype(np.float32)
    host = Cube(data=data.copy())
    dev = DeferredCube(jnp.asarray(data))

    size = 9
    jobs = []
    for key, (x, y) in enumerate([(10.3, 12.7), (1.0, 2.0), (26.9, 28.4),
                                  (0.0, 0.0), (14.5, 15.5)]):
        lines = []
        for ln, (z, f) in enumerate([(5, 2.5), (0, 3.0), (58, 4.0)]):
            lines.append((ln,) + _line_zrange(z, f, nz))
        jobs.append((key, x, y, lines))

    got = _fetch_line_images(dev, jobs, size)
    want = _fetch_line_images(host, jobs, size)
    assert set(got) == set(want)
    for k in want:
        dg, mg = got[k]
        dw, mw = want[k]
        np.testing.assert_allclose(dg, dw, atol=1e-6)
        mg = np.zeros(dg.shape, bool) if mg is None else mg
        mw = np.zeros(dw.shape, bool) if mw is None else mw
        np.testing.assert_array_equal(mg, mw)


def test_ls_deconv_matches_oracle():
    rng = np.random.default_rng(41)
    nl, s = 30, 5
    data = rng.normal(size=(nl, s, s))
    var = rng.uniform(0.5, 2, size=(nl, s, s))
    psf = rng.uniform(0, 1, size=(nl, s, s))
    d, v = ls_deconv_wgt(jnp.asarray(data, dtype=jnp.float32),
                         jnp.asarray(var, dtype=jnp.float32),
                         jnp.asarray(psf, dtype=jnp.float32))
    ed, ev = oracle.ls_deconv_oracle(data, var, psf)
    np.testing.assert_allclose(np.asarray(d), ed, rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(v), ev, rtol=2e-4)


def _line_minicube(nl=60, s=9, seed=43, amp=8.0, z0=30):
    rng = np.random.default_rng(seed)
    from origin_tpu.core import MoffatFSF

    fsf = MoffatFSF(fwhm_pol=[0.5], beta_pol=[2.8], pixstep=0.2)
    psf = fsf.get_3darray(np.linspace(5000, 6000, nl), (s, s))
    line = amp * np.exp(-0.5 * ((np.arange(nl) - z0) / 2.0) ** 2)
    data = rng.normal(scale=0.3, size=(nl, s, s)) + line[:, None, None] * psf
    var = np.full((nl, s, s), 0.09)
    return data.astype(np.float32), var.astype(np.float32), psf.astype(np.float32), line


def test_method_pca_wgt_matches_oracle():
    data, var, psf, line = _line_minicube()
    d0 = dctmat(data.shape[0], 30)
    est, estvar = method_pca_wgt(
        jnp.asarray(data), jnp.asarray(var), jnp.asarray(psf), jnp.asarray(d0)
    )
    eest, eestvar = oracle.method_pca_wgt_oracle(data, var, psf, 30)
    np.testing.assert_allclose(np.asarray(est), eest, atol=0.05, rtol=0.05)
    np.testing.assert_allclose(np.asarray(estvar), eestvar, rtol=1e-3)
    # the estimated line must peak at the injected position
    assert abs(int(np.argmax(np.asarray(est))) - 30) <= 1


def test_estimation_line_end_to_end():
    nl, s = 60, 9
    data, var, psf, line = _line_minicube(nl=nl, s=s)
    # embed the minicube into a larger field
    ny = nx = 21
    rng = np.random.default_rng(44)
    raw = rng.normal(scale=0.3, size=(nl, ny, nx)).astype(np.float32)
    raw[:, 6:15, 6:15] = data
    varfield = np.full((nl, ny, nx), 0.09, np.float32)
    out = estimation_line_arrays(
        np.array([10]), np.array([10]), np.array([30]),
        raw, varfield, psf, size_grid=0,
    )
    assert out["ok"][0]
    assert abs(int(out["z"][0]) - 30) <= 1
    assert out["flux"][0] > 0
    # flux should approximate the line integral over +/-5 channels
    expected = line[25:36].sum()
    assert abs(out["flux"][0] - expected) / expected < 0.25


def test_estimation_line_grid_refines_position():
    nl, s = 60, 9
    data, var, psf, line = _line_minicube(nl=nl, s=s)
    ny = nx = 21
    rng = np.random.default_rng(45)
    raw = rng.normal(scale=0.3, size=(nl, ny, nx)).astype(np.float32)
    raw[:, 6:15, 6:15] = data  # true center at (10, 10)
    varfield = np.full((nl, ny, nx), 0.09, np.float32)
    out = estimation_line_arrays(
        np.array([11]), np.array([9]), np.array([30]),
        raw, varfield, psf, size_grid=1,
    )
    assert out["ok"][0]
    assert int(out["y"][0]) == 10 and int(out["x"][0]) == 10


def test_glr_spectral_mxu_matches_direct():
    """The blocked-Toeplitz MXU sweep equals the direct-conv sweep."""
    import jax.numpy as jnp
    from origin_tpu.core import gaussian_profile
    from origin_tpu.ops.glr import (
        _pack_profiles,
        glr_spectral,
        glr_spectral_mxu,
        pack_profiles_toeplitz,
        prepare_profiles,
    )

    rng = np.random.default_rng(3)
    nz, ny, nx = 300, 5, 6
    cube_fsf = rng.normal(size=(nz, ny, nx)).astype(np.float32)
    norm_fsf = rng.uniform(0.5, 2.0, size=(nz, ny, nx)).astype(np.float32)
    profiles = [gaussian_profile(f, 41, 20) for f in (2.0, 5.0, 9.0)]
    prepped = prepare_profiles(profiles)

    pb, p2b, centers = _pack_profiles(prepped)
    c0, p0, m0 = glr_spectral(
        jnp.asarray(cube_fsf), jnp.asarray(norm_fsf),
        jnp.asarray(pb), jnp.asarray(p2b), centers, nz
    )

    t_num, t_den, pad_left, _ = pack_profiles_toeplitz(prepped, block=128)
    c1, p1, m1 = glr_spectral_mxu(
        jnp.asarray(cube_fsf), jnp.asarray(norm_fsf),
        jnp.asarray(t_num), jnp.asarray(t_den), pad_left, nz
    )

    np.testing.assert_allclose(np.asarray(c1), np.asarray(c0),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m0),
                               atol=1e-5, rtol=1e-5)
    assert np.mean(np.asarray(p1) == np.asarray(p0)) > 0.999


def test_glr_spatial_pre_matches_combined():
    """Precomputed-FSF spatial stage equals the self-contained one."""
    import jax.numpy as jnp
    from origin_tpu.core import MoffatFSF
    from origin_tpu.ops.convolve import fft2_shape
    from origin_tpu.ops.glr import (
        glr_spatial,
        glr_spatial_pre,
        precompute_spatial,
    )

    rng = np.random.default_rng(4)
    nz, ny, nx = 40, 11, 13
    cube = jnp.asarray(rng.normal(size=(nz, ny, nx)).astype(np.float32))
    fsf = MoffatFSF(fwhm_pol=[0.2, 0.6], beta_pol=[2.8], pixstep=0.2)
    psf = jnp.asarray(
        fsf.get_3darray(np.linspace(5000, 9000, nz), (7, 7)).astype(np.float32)
    )
    fshape2 = fft2_shape((ny, nx), (7, 7))

    c0, n0 = glr_spatial(cube, psf[None], None, fshape2)
    kern_hats, n1 = precompute_spatial(psf[None], None, ny, nx, fshape2)
    c1 = glr_spatial_pre(cube, kern_hats, None, (7, 7), fshape2)

    np.testing.assert_allclose(np.asarray(c1), np.asarray(c0),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(n1), np.asarray(n0),
                               atol=1e-5, rtol=1e-5)


def test_glr_spectral_mxu_slab_chunking():
    """Slab-chunked sweep (bounded transients) equals single-slab."""
    import jax.numpy as jnp
    from origin_tpu.core import gaussian_profile
    from origin_tpu.ops.glr import (
        pack_profiles_toeplitz,
        prepare_profiles,
        toeplitz_sweep,
    )

    rng = np.random.default_rng(8)
    nz, ny, nx = 260, 7, 9
    cube_fsf = rng.normal(size=(nz, ny, nx)).astype(np.float32)
    norm_fsf = rng.uniform(0.5, 2.0, size=(nz, ny, nx)).astype(np.float32)
    prepped = prepare_profiles([gaussian_profile(f, 41, 20) for f in (2.0, 7.0)])
    t_num, t_den, pad_left, _ = pack_profiles_toeplitz(prepped, block=128)
    args = (jnp.asarray(cube_fsf), jnp.asarray(norm_fsf),
            jnp.asarray(t_num), jnp.asarray(t_den), pad_left, nz)

    c0, p0, m0 = toeplitz_sweep(*args)                         # one slab
    c1, p1, m1 = toeplitz_sweep(*args, max_transient_bytes=64 * 1024)

    np.testing.assert_allclose(np.asarray(c1), np.asarray(c0), atol=1e-6)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m0), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p0))


def test_glr_spatial_chunked_matches_full():
    """z-chunked spatial stage equals the one-shot stage (incl. mosaic)."""
    import jax.numpy as jnp
    from origin_tpu.core import MoffatFSF
    from origin_tpu.ops.convolve import fft2_shape
    from origin_tpu.ops.glr import glr_spatial, glr_spatial_chunked

    rng = np.random.default_rng(9)
    nz, ny, nx = 50, 10, 12
    cube = jnp.asarray(rng.normal(size=(nz, ny, nx)).astype(np.float32))
    fsf = MoffatFSF(fwhm_pol=[0.2, 0.6], beta_pol=[2.8], pixstep=0.2)
    psf = jnp.asarray(
        fsf.get_3darray(np.linspace(5000, 9000, nz), (7, 7)).astype(np.float32)
    )
    fshape2 = fft2_shape((ny, nx), (7, 7))

    c0, n0 = glr_spatial(cube, psf[None], None, fshape2)
    c1, n1 = glr_spatial_chunked(cube, psf[None], None, fshape2, zchunk=16)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(n1), np.asarray(n0), atol=1e-5)

    w1 = np.zeros((ny, nx), np.float32)
    w1[:, :6] = 1
    wmaps = jnp.asarray(np.stack([w1, 1 - w1]))
    psfs = jnp.stack([psf, psf * 1.1])
    c0, n0 = glr_spatial(cube, psfs, wmaps, fshape2)
    c1, n1 = glr_spatial_chunked(cube, psfs, wmaps, fshape2, zchunk=16)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(n1), np.asarray(n0), atol=1e-5)


def test_glr_spatial_matmul_matches_fft():
    """DFT-by-matmul spatial stage equals the FFT spatial stage."""
    import jax.numpy as jnp
    from origin_tpu.core import MoffatFSF
    from origin_tpu.ops.convolve import fft2_shape
    from origin_tpu.ops.glr import (
        dft_spatial_factors,
        glr_spatial,
        glr_spatial_matmul,
        precompute_spatial,
    )

    rng = np.random.default_rng(10)
    nz, ny, nx = 40, 11, 14
    cube = jnp.asarray(rng.normal(size=(nz, ny, nx)).astype(np.float32))
    fsf = MoffatFSF(fwhm_pol=[0.2, 0.6], beta_pol=[2.8], pixstep=0.2)
    psf = jnp.asarray(
        fsf.get_3darray(np.linspace(5000, 9000, nz), (7, 7)).astype(np.float32)
    )
    fshape2 = fft2_shape((ny, nx), (7, 7))

    c0, _ = glr_spatial(cube, psf[None], None, fshape2)
    kern_hats, _ = precompute_spatial(psf[None], None, ny, nx, fshape2)
    factors = {k: jnp.asarray(v) for k, v in
               dft_spatial_factors(ny, nx, fshape2, (7, 7)).items()}
    c1 = glr_spatial_matmul(
        cube, jnp.real(kern_hats), jnp.imag(kern_hats), None, factors
    )
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c0),
                               atol=2e-5, rtol=2e-4)

    # mosaic weighted-sum path
    w1 = np.zeros((ny, nx), np.float32)
    w1[:, :7] = 1
    wmaps = jnp.asarray(np.stack([w1, 1 - w1]))
    psfs = jnp.stack([psf, psf * 1.2])
    c0, _ = glr_spatial(cube, psfs, wmaps, fshape2)
    kern_hats, _ = precompute_spatial(psfs, wmaps, ny, nx, fshape2)
    c1 = glr_spatial_matmul(
        cube, jnp.real(kern_hats), jnp.imag(kern_hats), wmaps, factors
    )
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c0),
                               atol=2e-5, rtol=2e-4)


def test_pallas_matched_filter_interpret_matches_direct():
    """Pallas fused matched filter (interpret mode) equals glr_spectral."""
    import jax.numpy as jnp
    from origin_tpu.core import gaussian_profile
    from origin_tpu.ops.glr import _pack_profiles, glr_spectral, prepare_profiles
    from origin_tpu.ops.pallas_kernels import matched_filter_spectral

    rng = np.random.default_rng(14)
    nz, ny, nx = 200, 4, 5
    s = ny * nx
    cube_fsf = rng.normal(size=(nz, ny, nx)).astype(np.float32)
    norm_fsf = rng.uniform(0.5, 2.0, size=(nz, ny, nx)).astype(np.float32)
    prepped = prepare_profiles([gaussian_profile(f, 41, 20) for f in (2.0, 6.0)])
    pb, p2b, centers = _pack_profiles(prepped)

    c0, p0, m0 = glr_spectral(
        jnp.asarray(cube_fsf), jnp.asarray(norm_fsf),
        jnp.asarray(pb), jnp.asarray(p2b), centers, nz
    )

    x = jnp.asarray(cube_fsf.reshape(nz, s).T)
    n = jnp.asarray(norm_fsf.reshape(nz, s).T)
    c1, m1, p1 = matched_filter_spectral(x, n, pb, p2b, centers,
                                         tile_rows=8, interpret=True)
    c1 = np.asarray(c1).T.reshape(nz, ny, nx)
    m1 = np.asarray(m1).T.reshape(nz, ny, nx)
    p1 = np.asarray(p1).T.reshape(nz, ny, nx)

    np.testing.assert_allclose(c1, np.asarray(c0), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(m1, np.asarray(m0), atol=1e-4, rtol=1e-4)
    assert np.mean(p1 == np.asarray(p0)) > 0.99


def test_pallas_banded_matmul_interpret_matches_mxu():
    """Pallas banded-Toeplitz kernel (interpret) equals glr_spectral_mxu."""
    import jax.numpy as jnp
    from origin_tpu.core import gaussian_profile
    from origin_tpu.ops.glr import (
        glr_spectral_mxu,
        pack_profiles_toeplitz,
        prepare_profiles,
    )
    from origin_tpu.ops.pallas_kernels import banded_matmul_spectral

    rng = np.random.default_rng(15)
    nz, ny, nx = 300, 4, 5
    s = ny * nx
    cf = rng.normal(size=(nz, ny, nx)).astype(np.float32)
    nf = rng.uniform(0.5, 2.0, size=(nz, ny, nx)).astype(np.float32)
    prepped = prepare_profiles(
        [gaussian_profile(f, 41, 20) for f in (2.0, 5.0, 9.0)]
    )
    t_num, t_den, pad_left, _ = pack_profiles_toeplitz(prepped, block=128)

    c0, p0, m0 = glr_spectral_mxu(
        jnp.asarray(cf), jnp.asarray(nf),
        jnp.asarray(t_num), jnp.asarray(t_den), pad_left, nz
    )
    x = jnp.asarray(cf.reshape(nz, s).T)
    n = jnp.asarray(nf.reshape(nz, s).T)
    c1, m1, p1 = banded_matmul_spectral(x, n, t_num, t_den, pad_left, nz,
                                        tile_rows=8, interpret=True)
    np.testing.assert_allclose(
        np.asarray(c1).T.reshape(nz, ny, nx), np.asarray(c0),
        atol=1e-5, rtol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(m1).T.reshape(nz, ny, nx), np.asarray(m0),
        atol=1e-5, rtol=1e-5,
    )
    assert np.mean(np.asarray(p1).T.reshape(nz, ny, nx) == np.asarray(p0)) > 0.999


def test_batched_source_spectra_matches_host_extract():
    """Device-batched step-11 spectra == host Source.extract_spectra on
    every tag (sky, total, white-, PSF- and line-weighted, both skysub
    variants), including NaN voxels, masked borders and var<=0 pixels."""
    from origin_tpu.artifacts.source import Source, _moffat_weight_cube
    from origin_tpu.core.containers import Cube, Image, cutout_window
    from origin_tpu.core.coords import WCS, WaveCoord
    from origin_tpu.ops.spectra import batched_source_spectra

    rng = np.random.default_rng(3)
    nz, ny, nx = 40, 30, 28
    data = rng.normal(size=(nz, ny, nx)).astype(np.float32)
    var = rng.uniform(0.5, 1.5, size=(nz, ny, nx)).astype(np.float32)
    data[5, 4, 6] = np.nan
    data[:, 2, 3] = np.nan
    var[7, 10, 11] = 0.0
    var[8, 12, 13] = np.nan
    wcs = WCS(crpix=(ny / 2, nx / 2), crval=(-30.0, 53.0), shape=(ny, nx))
    wave = WaveCoord(crval=4750.0, cdelt=1.25, shape=nz)
    cube = Cube(data=data, var=var, wcs=wcs, wave=wave)

    m = 9
    step = wcs.get_step(unit="arcsec")[0]
    fwhm = rng.uniform(0.5, 0.8, size=nz).astype(np.float32)
    beta = np.full(nz, 2.8, np.float32)
    wcube = _moffat_weight_cube(m, m, float(step), fwhm, beta)

    host_specs = {}
    jobs = []
    centers = [(12.0, 13.0), (2.0, 25.0)]  # one interior, one on the border
    for key, (y, x) in enumerate(centers):
        (dec, ra), = wcs.pix2sky([[y, x]])
        sub = cube.subcube(center=(dec, ra), size=m, unit_center="deg")
        objm = np.zeros((m, m), bool)
        objm[3:6, 3:7] = True
        skym = np.ones((m, m), bool)
        skym[2:7, 2:8] = False
        src = Source.from_data(key, ra, dec, ("t", "v", "c", ""))
        src.images["ORI_MASK_OBJ"] = Image(data=objm.astype(int))
        src.images["ORI_MASK_SKY"] = Image(data=skym.astype(int))
        src.images["MUSE_WHITE"] = sub.mean(axis=0)
        lw = rng.uniform(0.0, 2.0, size=(m, m)).astype(np.float32)
        src.images["ORI_CORR_7"] = Image(data=lw)
        src.extract_spectra(sub, skysub=True, psf=fwhm, beta=beta,
                            tags_to_try=["ORI_CORR_7"])
        src.extract_spectra(sub, skysub=False, psf=fwhm, beta=beta,
                            tags_to_try=["ORI_CORR_7"])
        host_specs[key] = {t: (np.asarray(s.data), None if s.var is None
                               else np.asarray(s.var))
                           for t, s in src.spectra.items()}
        y0, x0 = cutout_window(y, x, m)
        jobs.append(dict(key=key, y0=y0 + m, x0=x0 + m,
                         objm=objm, skym=skym, lines=[(7, lw)]))

    pd = jnp.pad(jnp.asarray(cube.filled(0)), ((0, 0), (m, m), (m, m)))
    pv = jnp.pad(jnp.asarray(cube.var_filled(np.inf)),
                 ((0, 0), (m, m), (m, m)), constant_values=np.inf)
    pm = jnp.pad(jnp.asarray(cube.masked_invalid()),
                 ((0, 0), (m, m), (m, m)), constant_values=True)
    dev = batched_source_spectra(pd, pv, pm, jobs, wcube=wcube)

    for key, (y, x) in enumerate(centers):
        # the white-light image rides along (it is the kernel's weight);
        # it must equal the host masked z-mean of the cutout
        (dec, ra), = wcs.pix2sky([[y, x]])
        sub = cube.subcube(center=(dec, ra), size=m, unit_center="deg")
        white_host = sub.mean(axis=0)
        got_white = dev[key].pop("MUSE_WHITE_IMG")
        hw = np.where(white_host.mask, np.nan, white_host.data) \
            if white_host.mask is not None else np.asarray(white_host.data)
        np.testing.assert_allclose(got_white, hw, rtol=2e-4, atol=2e-5)
        for tag, (hdata, hvar) in host_specs[key].items():
            got = dev[key][tag]
            gdata, gvar = got if isinstance(got, tuple) else (got, None)
            np.testing.assert_allclose(
                gdata, hdata, rtol=2e-4, atol=2e-5,
                err_msg=f"src {key} tag {tag}")
            if hvar is not None:
                np.testing.assert_allclose(
                    gvar, hvar, rtol=2e-4, atol=2e-5,
                    err_msg=f"src {key} tag {tag} var")
        assert set(dev[key]) == set(host_specs[key])


def test_window_ori_stats_kernel_matches_host():
    """Device object-mean spectrum + max map == the host ORI_CORR /
    ORI_MAXMAP computations, including border windows."""
    from origin_tpu.core.containers import Cube, cutout_window
    from origin_tpu.core.coords import WCS, WaveCoord
    from origin_tpu.ops.cutouts import window_ori_stats_kernel

    rng = np.random.default_rng(11)
    nz, ny, nx = 30, 20, 22
    data = rng.normal(size=(nz, ny, nx)).astype(np.float32)
    wcs = WCS(crpix=(ny / 2, nx / 2), crval=(-30.0, 53.0), shape=(ny, nx))
    wave = WaveCoord(crval=4750.0, cdelt=1.25, shape=nz)
    cube = Cube(data=data, wcs=wcs, wave=wave)

    m = 7
    centers = [(10.0, 11.0), (1.0, 20.0)]
    y0s, x0s, obs = [], [], []
    for (y, x) in centers:
        y0, x0 = cutout_window(y, x, m)
        y0s.append(y0)
        x0s.append(x0)
        ob = np.zeros((m, m), np.float32)
        ob[2:5, 2:6] = 1.0
        obs.append(ob)
    specs, maxmaps = window_ori_stats_kernel(
        jnp.asarray(data), np.asarray(y0s, np.int32),
        np.asarray(x0s, np.int32), np.stack(obs), m)

    for i, (y, x) in enumerate(centers):
        (dec, ra), = wcs.pix2sky([[y, x]])
        sub = cube.subcube(center=(dec, ra), size=m, unit_center="deg")
        objmask = obs[i] > 0
        ori_masked = np.where(objmask[None], sub.filled(np.nan), np.nan)
        with np.errstate(invalid="ignore"):
            import warnings
            with warnings.catch_warnings():
                warnings.simplefilter("ignore", RuntimeWarning)
                hspec = np.nanmean(ori_masked, axis=(1, 2))
        got = np.asarray(specs[i])
        fin = np.isfinite(hspec)
        np.testing.assert_allclose(got[fin], hspec[fin], rtol=2e-5,
                                   atol=1e-6)
        assert np.array_equal(np.isfinite(got), fin)
        hmax = sub.max(axis=0)
        hdata = np.where(hmax.mask, -np.inf, hmax.data) \
            if hmax.mask is not None else np.asarray(hmax.data)
        np.testing.assert_allclose(np.asarray(maxmaps[i]), hdata,
                                   rtol=2e-5, atol=1e-6)

def test_estimation_line_host_cut_when_inputs_dropped():
    """A tight-memory session that dropped the raw device inputs must
    NOT re-upload the whole field for a few lines: estimation_line
    weighs the bytes and cuts the windows host-side.  Results match the
    device-gather path exactly (same windows, same kernel)."""
    import sys as _sys, os as _os
    _sys.path.insert(0, _os.path.dirname(__file__))
    from test_engine import FakeOrig
    from origin_tpu.pipeline.engine import DeviceEngine

    nl, s = 60, 9
    data, var, psf, line = _line_minicube(nl=nl, s=s)
    ny = nx = 21
    rng = np.random.default_rng(46)
    raw = rng.normal(scale=0.3, size=(nl, ny, nx)).astype(np.float32)
    raw[:, 6:15, 6:15] = data
    varfield = np.full((nl, ny, nx), 0.09, np.float32)

    xs, ys, zs = np.array([10]), np.array([10]), np.array([30])
    ref = estimation_line_arrays(xs, ys, zs, raw, varfield, psf,
                                 size_grid=0)

    eng = DeviceEngine(FakeOrig(raw, varfield,
                                np.zeros_like(raw, dtype=bool)))
    eng.drop_inputs("cube", "var")
    assert not eng.inputs_resident()
    # 1 line x 81 window px < 441 field px: the host-cut path is chosen
    out = estimation_line_arrays(xs, ys, zs, raw, varfield, psf,
                                 size_grid=0, engine=eng)
    assert not eng.inputs_resident(), "field was re-uploaded"
    for k in ("flux", "residual", "y", "x", "z"):
        np.testing.assert_allclose(out[k], ref[k], err_msg=k)

    # with the inputs resident the device gather is used and agrees
    eng2 = DeviceEngine(FakeOrig(raw, varfield,
                                 np.zeros_like(raw, dtype=bool)))
    eng2.input_cube()
    out2 = estimation_line_arrays(xs, ys, zs, raw, varfield, psf,
                                  size_grid=0, engine=eng2)
    np.testing.assert_allclose(out2["flux"], ref["flux"], rtol=1e-5)
