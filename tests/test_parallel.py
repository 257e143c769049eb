"""Multi-chip sharding tests on the 8-device virtual CPU mesh.

Validates that the sharded detection step (halo exchange + psum collectives)
reproduces the single-chip kernels exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from origin_tpu.core import MoffatFSF, gaussian_profile
from origin_tpu.ops import compute_local_max, correlation_glr_test
from origin_tpu.parallel import (
    ShardedPipeline,
    halo_exchange_rows,
    make_mesh,
    sharded_detect,
)


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(5)
    nz, ny, nx = 60, 32, 20
    cube = rng.normal(size=(nz, ny, nx)).astype(np.float32)
    var = rng.uniform(0.5, 1.5, size=(nz, ny, nx)).astype(np.float32)
    mask = np.zeros((nz, ny, nx), dtype=bool)
    fsf = MoffatFSF(fwhm_pol=[0.6], beta_pol=[2.8], pixstep=0.2)
    psf = fsf.get_3darray(np.linspace(5000, 9000, nz), (7, 7)).astype(np.float32)
    profiles = [gaussian_profile(f, 41, 20) for f in (2.0, 6.0)]
    return cube, var, mask, psf, profiles


def test_device_count():
    assert len(jax.devices()) == 8


def test_halo_exchange_rows():
    mesh = make_mesh(4, dp=1)
    n = 4
    x = np.arange(32, dtype=np.float32).reshape(8, 4).repeat(2, axis=1)
    # shard rows over 4 devices (2 rows each); exchange halo 1
    from jax.sharding import PartitionSpec as P
    from functools import partial

    @partial(jax.shard_map, mesh=mesh, in_specs=P(None, "sp", None),
             out_specs=P(None, "sp", None))
    def fn(t):
        padded = halo_exchange_rows(t, 1, "sp")
        return padded[:, 1:-1, :]  # crop back

    out = fn(x[None])
    np.testing.assert_array_equal(np.asarray(out)[0], x)

    @partial(jax.shard_map, mesh=mesh, in_specs=P(None, "sp", None),
             out_specs=P(None, "sp", None))
    def top_halo(t):
        padded = halo_exchange_rows(t, 1, "sp")
        return padded[:, :2, :]  # (halo row, first row)

    th = np.asarray(top_halo(x[None]))[0]
    # shard 1's halo row (global row 2*1) must equal global row 1
    np.testing.assert_array_equal(th[2], x[1])
    # shard 0's halo is zero fill
    np.testing.assert_array_equal(th[0], 0)


def test_sharded_detect_matches_single_chip(problem):
    cube, var, mask, psf, profiles = problem
    mesh = make_mesh(8, dp=1)

    thresholds = np.linspace(1.0, 8.0, 20).astype(np.float32)
    lmax_sh, lmin_sh, cmax, cmin = sharded_detect(
        mesh, cube, var, mask, psf, profiles, thresholds=thresholds
    )

    # single-chip oracle: same math without sharding
    from origin_tpu.ops import dct_residual, standardize

    cont = np.asarray(dct_residual(cube, 10, var=var, mask=mask))
    data, _ = standardize(cube, cont, var, mask)
    data = np.asarray(data)
    correl, _, correl_min = correlation_glr_test(data, psf, None, profiles)
    correl[mask] = 0
    correl_min[mask] = 0
    lmax, lmin = compute_local_max(correl, correl_min, mask, 3)
    lmax, lmin = np.asarray(lmax), np.asarray(lmin)

    np.testing.assert_allclose(lmax_sh, lmax, atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(lmin_sh, lmin, atol=2e-3, rtol=1e-3)

    # counts must equal a direct count on the oracle local max cubes
    expected_cmax = [(lmax > t).sum() for t in thresholds]
    assert np.abs(np.asarray(cmax) - expected_cmax).max() <= 2


def test_sharded_nonsquare_fsf(problem):
    """Row halo must be sized from the FSF's y extent (regression: it was
    sized from x, corrupting tile boundaries whenever ph > pw)."""
    cube, var, mask, psf, profiles = problem
    psf_ns = np.ascontiguousarray(psf[:, :, 1:-1])  # (nz, 7, 5): ph > pw
    mesh = make_mesh(8, dp=1)
    lmax_sh, lmin_sh, _, _ = sharded_detect(
        mesh, cube, var, mask, psf_ns, profiles
    )

    from origin_tpu.ops import dct_residual, standardize

    cont = np.asarray(dct_residual(cube, 10, var=var, mask=mask))
    data, _ = standardize(cube, cont, var, mask)
    correl, _, correl_min = correlation_glr_test(
        np.asarray(data), psf_ns, None, profiles
    )
    correl[mask] = 0
    correl_min[mask] = 0
    lmax, lmin = compute_local_max(correl, correl_min, mask, 3)
    np.testing.assert_allclose(lmax_sh, np.asarray(lmax), atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(lmin_sh, np.asarray(lmin), atol=2e-3, rtol=1e-3)


def test_sharded_batch_dp_sp(problem):
    cube, var, mask, psf, profiles = problem
    mesh = make_mesh(8, dp=2)
    cubes = np.stack([cube, cube * 1.1])
    variances = np.stack([var, var])
    masks = np.stack([mask, mask])
    pipe = ShardedPipeline(mesh, *cube.shape, psf, profiles)
    lmax, lmin, cmax, cmin = pipe(cubes, variances, masks)
    lmax = np.asarray(lmax)
    assert lmax.shape == cubes.shape
    assert np.asarray(cmax).shape[0] == 2
    assert np.isfinite(lmax).all()

    # dp batch elements must be fully independent: swapping the batch slots
    # must swap the outputs bit-for-bit (same program, same partitioning)
    lmax_sw, _, cmax_sw, _ = pipe(cubes[::-1], variances[::-1], masks[::-1])
    lmax_sw = np.asarray(lmax_sw)
    np.testing.assert_array_equal(lmax[0], lmax_sw[1])
    np.testing.assert_array_equal(lmax[1], lmax_sw[0])
    np.testing.assert_array_equal(np.asarray(cmax), np.asarray(cmax_sw)[::-1])
    # and the scaled element must actually differ (guards against one
    # element being broadcast over the dp axis)
    assert not np.array_equal(lmax[0], lmax[1])


def test_glr_tile_pallas_sweep_matches_xla(problem):
    """The fused Pallas sweep inside shard_map (interpret on CPU) matches
    the XLA Toeplitz sweep per tile — the path real TPU meshes run."""
    from functools import partial

    from jax.sharding import PartitionSpec as P

    from origin_tpu.ops.glr import pack_profiles_toeplitz, prepare_profiles
    from origin_tpu.parallel.mesh import build_tile_spatial_op, glr_tile

    cube, var, mask, psf, profiles = problem
    nz, ny, nx = cube.shape
    mesh = make_mesh(8, dp=1)
    sp = mesh.shape["sp"]
    prepped = prepare_profiles(profiles)
    t_num, t_den, pad_left, _ = pack_profiles_toeplitz(
        prepped, block=min(128, nz)
    )
    op, halo = build_tile_spatial_op(psf, ny // sp, nx)

    row = P(None, "sp", None)
    img = P("sp", None)
    rep = P()
    op_spec = jax.tree.map(lambda _: rep, op)
    out_specs = (row, row, row, row, row, img, img)

    def run(use_pallas):
        @partial(
            jax.shard_map, mesh=mesh,
            in_specs=(row, row, op_spec, rep, rep), out_specs=out_specs,
            # the vma checker cannot see through pallas_call
            check_vma=not use_pallas,
        )
        def prog(f, m, o, tn, td):
            return glr_tile(
                f, m, o, tn, td, pad_left, nz, halo=halo,
                use_pallas=use_pallas, sweep_interpret=use_pallas,
            )

        return jax.jit(prog)(
            jnp.asarray(cube), jnp.asarray(mask),
            jax.tree.map(jnp.asarray, op),
            jnp.asarray(t_num), jnp.asarray(t_den),
        )

    ref = run(False)
    out = run(True)
    names = ("correl", "correl_min", "profile", "lmax", "lmin",
             "maxmap", "minmap")
    for name, a, b in zip(names, ref, out):
        np.testing.assert_allclose(
            np.asarray(b, dtype=np.float32), np.asarray(a, dtype=np.float32),
            atol=1e-4, err_msg=name,
        )


def test_session_mesh_full_pipeline(tmp_path):
    """The FULL detection pipeline (steps 01-07, greedy PCA included) on an
    8-device (1 x sp) mesh, driven from the ORIGIN session, reproduces the
    single-chip catalog at matched thresholds.

    This is the realisation of the reference areamap's stated purpose
    (reference steps.py:496-499): the PCA areas run device-parallel, the
    spatial GLR runs with ppermute halo exchange, purity counts ride psum.
    Tolerances: the sharded GLR uses per-tile DFT grids, so correl values
    agree to float32 round-off (atol 2e-3); the PCA iteration map and the
    detection positions must agree exactly.
    """
    import os
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from make_minicube import make_minicube, make_segmap

    from origin_tpu import ORIGIN

    cube_fn = str(tmp_path / "mini.fits")
    seg_fn = str(tmp_path / "seg.fits")
    make_minicube(cube_fn, nz=400, ny=64, nx=64)
    make_segmap(seg_fn, ny=64, nx=64)

    def front_end(name, mesh):
        orig = ORIGIN.init(cube_fn, name=name, loglevel="WARNING",
                           path=str(tmp_path), PSF_size=9, mesh=mesh)
        orig.step01_preprocessing()
        orig.step02_areas(minsize=20, maxsize=40)
        orig.step03_compute_PCA_threshold()
        orig.step04_compute_greedy_PCA()
        orig.step05_compute_TGLR(ncpu=1)
        orig.step06_compute_purity_threshold(purity=0.8)
        return orig

    ref = front_end("single", None)
    mesh = make_mesh(8, dp=1)
    shd = front_end("meshed", mesh)

    from origin_tpu.pipeline.engine import MeshEngine

    assert isinstance(shd.engine, MeshEngine)
    assert ref.param["nbareas"] == shd.param["nbareas"] >= 2

    # PCA parity contract: the per-area threshold fits agree to round-off,
    # and the iteration traces agree except where the sharded preprocess's
    # float32 round-off (psum channel means, ~5e-7) flips an O2 test at the
    # threshold — the greedy PCA's data-dependent while-loop then takes a
    # different (equally valid) path in that area, which is inherent to the
    # algorithm, not to the sharding (on bit-identical inputs the traces
    # are bit-equal: test_greedy_pca_mesh_matches_sequential).
    np.testing.assert_allclose(
        np.asarray(shd.thresO2), np.asarray(ref.thresO2), rtol=1e-4
    )
    same = np.mean(shd.mapO2.data == ref.mapO2.data)
    assert same > 0.99, f"mapO2 agreement {same:.4f}"

    # purity self-calibration: same thresholds (std is PCA-free and matches
    # tightly; correl inherits the PCA path sensitivity)
    assert shd.param["threshold"] == pytest.approx(
        ref.param["threshold"], abs=0.05
    )
    assert shd.param["threshold_std"] == pytest.approx(
        ref.param["threshold_std"], abs=0.02
    )

    # detect both at the SINGLE-CHIP thresholds: catalogs must match
    thr = ref.param["threshold"]
    thr_std = ref.param["threshold_std"]
    ref.step07_detection(threshold=thr, threshold_std=thr_std, segmap=seg_fn)
    shd.step07_detection(threshold=thr, threshold_std=thr_std, segmap=seg_fn)

    def keyed(cat):
        return sorted(zip(
            np.asarray(cat["x0"]), np.asarray(cat["y0"]),
            np.asarray(cat["z0"]), np.asarray(cat["comp"]),
        ))

    assert keyed(shd.Cat0) == keyed(ref.Cat0)
    assert keyed(shd.Cat1) == keyed(ref.Cat1)
    np.testing.assert_array_equal(
        np.sort(np.asarray(shd.Cat1["ID"])), np.sort(np.asarray(ref.Cat1["ID"]))
    )

    # PINNED-INPUT mesh run: a third session whose step 05 starts from the
    # single-chip cube_faint, so steps 05-07 compare at exact-input
    # tolerances END TO END — correl / extrema / maxmap at float32
    # round-off (atol 2e-3, the per-tile DFT grids), purity threshold
    # tight, and the catalog with its T_GLR values at the same 2e-3
    from origin_tpu.pipeline.engine import DeferredCube

    pin = ORIGIN.init(cube_fn, name="pinned", loglevel="WARNING",
                      path=str(tmp_path), PSF_size=9, mesh=mesh)
    pin.step01_preprocessing()
    pin.step02_areas(minsize=20, maxsize=40)
    pin.step03_compute_PCA_threshold()
    pin.step04_compute_greedy_PCA()
    pin.steps["compute_greedy_PCA"].put(
        "cube_faint",
        DeferredCube(jax.device_put(ref.cube_faint.data, pin.engine._row),
                     wcs=pin.wcs, wave=pin.wave),
    )
    pin.step05_compute_TGLR(ncpu=1)
    np.testing.assert_allclose(
        pin.cube_correl.data, ref.cube_correl.data, atol=2e-3, rtol=1e-3,
    )
    np.testing.assert_allclose(
        pin.cube_local_max.data, ref.cube_local_max.data,
        atol=2e-3, rtol=1e-3,
    )
    np.testing.assert_allclose(pin.maxmap.data, ref.maxmap.data, atol=2e-3,
                               rtol=1e-3)
    prof_same = np.mean(pin.cube_profile.data == ref.cube_profile.data)
    assert prof_same > 0.999, f"profile agreement {prof_same:.5f}"

    pin.step06_compute_purity_threshold(purity=0.8)
    assert pin.param["threshold"] == pytest.approx(thr, abs=0.02)
    pin.step07_detection(threshold=thr, threshold_std=thr_std,
                         segmap=seg_fn)
    assert keyed(pin.Cat0) == keyed(ref.Cat0)
    assert keyed(pin.Cat1) == keyed(ref.Cat1)

    def tglr_by_position(cat):
        order = np.lexsort((np.asarray(cat["z0"]), np.asarray(cat["y0"]),
                            np.asarray(cat["x0"])))
        return np.asarray(cat["T_GLR"], float)[order]

    tg_ref = tglr_by_position(ref.Cat1)
    tg_pin = tglr_by_position(pin.Cat1)
    finite = np.isfinite(tg_ref)
    np.testing.assert_allclose(tg_pin[finite], tg_ref[finite], atol=2e-3)

    # sharded resume: write the meshed session, re-load with mesh=, and
    # re-detect — MeshEngine.get must re-upload host products row-sharded
    shd.write()
    from origin_tpu import ORIGIN as _ORIGIN

    res = _ORIGIN.load(str(tmp_path / "meshed"), mesh=mesh,
                       loglevel="WARNING")
    assert isinstance(res.engine, MeshEngine)
    res.step07_detection(threshold=thr, threshold_std=thr_std,
                         segmap=seg_fn)
    assert keyed(res.Cat1) == keyed(shd.Cat1)

    # the back-end steps (sharded minicube gathers, masks, source files)
    # run through on the meshed session
    import glob

    res.step08_compute_spectra()
    assert len(res.Cat2) == len(res.Cat1)
    res.step09_clean_results()
    res.step10_create_masks()
    res.step11_save_sources("0.1")
    nsrc = len(np.unique(np.asarray(res.Cat3_lines["ID"])))
    assert len(glob.glob(str(tmp_path / "meshed" / "sources"
                             / "source-*.fits"))) == nsrc

    for orig in (ref, shd, pin, res):
        for h in orig.logger.handlers:
            h.close()


def test_session_mesh_backend_device_path(tmp_path):
    """A LIVE mesh session's step 11 takes the batched device path — the
    window kernels compile over the row-sharded detection cubes — and its
    sources match a host-path rerun of the same session (same masks, same
    catalogs; only the reduction path differs)."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from make_minicube import make_minicube, make_segmap

    from origin_tpu import ORIGIN
    from origin_tpu.artifacts.source import Source
    from origin_tpu.pipeline.steps import SaveSources

    cube_fn = str(tmp_path / "mini.fits")
    seg_fn = str(tmp_path / "seg.fits")
    make_minicube(cube_fn, nz=400, ny=64, nx=64)
    make_segmap(seg_fn, ny=64, nx=64)

    live = ORIGIN.init(cube_fn, name="live", loglevel="WARNING",
                       path=str(tmp_path), PSF_size=9, mesh=make_mesh(8, dp=1))
    live.step01_preprocessing()
    live.step02_areas(minsize=20, maxsize=40)
    live.step03_compute_PCA_threshold()
    live.step04_compute_greedy_PCA()
    live.step05_compute_TGLR(ncpu=1)
    live.step06_compute_purity_threshold(purity=0.8)
    live.step07_detection(segmap=seg_fn)
    live.step08_compute_spectra()
    live.step09_clean_results()
    live.step10_create_masks()
    assert live.cube_correl.device is not None  # still resident, sharded

    seen = {}
    real = SaveSources._device_source_artifacts

    def spy(o, nb_fwhm):
        out = real(o, nb_fwhm)
        seen["spectra"], seen["line_imgs"] = out
        return out

    try:
        SaveSources._device_source_artifacts = staticmethod(spy)
        live.step11_save_sources("0.1")
    finally:
        SaveSources._device_source_artifacts = staticmethod(real)
    assert seen["spectra"], "mesh device spectra path did not run"
    assert seen["line_imgs"], "mesh device line images did not run"

    host_dir = tmp_path / "meshhost"
    host_dir.mkdir()
    try:
        SaveSources._device_source_artifacts = staticmethod(
            lambda o, nb: (None, None)
        )
        live.step11_save_sources("0.1", path=str(host_dir), overwrite=True)
    finally:
        SaveSources._device_source_artifacts = staticmethod(real)

    ids = sorted(np.unique(np.asarray(live.Cat3_sources["ID"])))
    checked = 0
    for sid in ids[:3]:
        fn = "sources/source-%0.5d.fits" % sid
        a = Source.from_file(str(tmp_path / "live" / fn))
        b = Source.from_file(str(host_dir / "live" / fn))
        assert set(a.spectra) == set(b.spectra)
        for tag in a.spectra:
            sa, sb = a.spectra[tag], b.spectra[tag]
            scale = max(1.0, float(np.nanmax(np.abs(sb.data))))
            np.testing.assert_allclose(
                np.asarray(sa.data), np.asarray(sb.data),
                atol=2e-3 * scale, err_msg=f"src {sid} {tag}")
            checked += 1
    assert checked > 5
    live.close_logfile()


def test_greedy_pca_mesh_matches_sequential():
    """Isolated check: on identical inputs, the mesh-sharded PCA reproduces
    the sequential per-area loop's iteration trace exactly (areas are
    independent and each slot runs the same kernel)."""
    from origin_tpu.ops.pca import greedy_pca_by_area
    from origin_tpu.parallel import greedy_pca_mesh, make_mesh

    rng = np.random.default_rng(3)
    nz, ny, nx = 80, 32, 24
    cube = rng.normal(size=(nz, ny, nx)).astype(np.float32)
    areamap = np.zeros((ny, nx), int)
    areamap[:16, :] = 1
    areamap[16:, :12] = 2
    areamap[16:, 12:] = 3
    sel = rng.choice(ny * nx, 60, replace=False)
    cube.reshape(nz, -1)[:, sel] *= 4.0

    o2 = np.mean(cube.astype(np.float64) ** 2, axis=0)
    testO2, thr = [], []
    for a in (1, 2, 3):
        t = o2[areamap == a]
        testO2.append(t)
        thr.append(np.percentile(t, 85))

    f0, m0, s0 = greedy_pca_by_area(cube, areamap, thr, testO2)
    mesh = make_mesh(8, dp=1)
    fdev, m1, s1 = greedy_pca_mesh(mesh, jnp.asarray(cube), areamap, thr,
                                   testO2)
    f1 = np.asarray(fdev)

    assert s0 == s1
    np.testing.assert_array_equal(m0, m1)
    # different zero-padding widths change f32 summation order inside the
    # power iteration, so values agree to round-off, not bit-for-bit (every
    # spaxel of an area is touched each iteration — the eigenvector is
    # removed from the whole area, reference lib_origin.py:941-943)
    scale = np.abs(f0).max()
    np.testing.assert_allclose(f1, f0, atol=5e-3 * scale)
    # spaxels of areas that never iterated stay bit-equal to the input
    area_iters = [m0[areamap == a].max() for a in (1, 2, 3)]
    assert max(area_iters) >= 2  # the case must exercise real iterations


def test_mesh_engine_validation(tmp_path):
    """MeshEngine rejects unusable meshes with actionable errors."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from make_minicube import make_minicube

    from origin_tpu import ORIGIN
    from origin_tpu.parallel import make_mesh

    cube_fn = str(tmp_path / "m.fits")
    make_minicube(cube_fn, nz=80, ny=30, nx=24)

    # a bad mesh now fails FAST, at session construction (the fresh-init
    # input prefetch instantiates the engine)
    # Ny=30 does not divide over 8 shards
    with pytest.raises(ValueError, match="divide"):
        ORIGIN.init(cube_fn, name="bad1", path=str(tmp_path),
                    loglevel="ERROR", mesh=make_mesh(8, dp=1))

    # dp > 1 meshes are for batch fleets, not sessions
    with pytest.raises(ValueError, match="dp batches"):
        ORIGIN.init(cube_fn, name="bad2", path=str(tmp_path),
                    loglevel="ERROR", mesh=make_mesh(8, dp=2))


def test_balance_slots_spreads_skewed_areas():
    """LPT slot assignment: adjacent large areas must land on different
    devices, and per-device pixel loads stay within 2x of each other."""
    from origin_tpu.parallel.pca import balance_slots

    # two huge areas first (label-adjacent), then many small ones
    sizes = [4000, 3900] + [100] * 14
    sp, m = 8, 2
    slots = balance_slots(sizes, sp, m)
    assert sorted(slots) == list(range(16))  # a permutation of the slots
    devs = np.asarray(slots) // m
    assert devs[0] != devs[1]  # the two big areas split across devices
    loads = np.bincount(devs, weights=np.asarray(sizes), minlength=sp)
    # label-order dealing would serialize both big areas on device 0
    naive = np.bincount(np.arange(16) // m, weights=np.asarray(sizes),
                        minlength=sp)
    assert loads.max() < naive.max() / 1.9
    # LPT bound: makespan within 4/3 of the trivial lower bound + one slot
    lower = max(max(sizes), sum(sizes) / sp)
    assert loads.max() <= 4 / 3 * lower + min(sizes)
    # capacity respected
    assert np.bincount(devs, minlength=sp).max() <= m


def test_greedy_pca_mesh_many_skewed_areas():
    """16 areas with heavily skewed sizes over 8 devices: the balanced
    dispatch must still reproduce the sequential iteration trace exactly."""
    from origin_tpu.ops.pca import greedy_pca_by_area
    from origin_tpu.parallel import greedy_pca_mesh

    rng = np.random.default_rng(11)
    nz, ny, nx = 60, 32, 32
    cube = rng.normal(size=(nz, ny, nx)).astype(np.float32)
    # area 1: the whole left half; areas 2..16: small tiles on the right
    areamap = np.zeros((ny, nx), int)
    areamap[:, :16] = 1
    label = 2
    for by in range(0, 32, 8):
        for bx in range(16, 32, 4):
            areamap[by:by + 8, bx:bx + 4] = label
            label += 1
    nb = areamap.max()
    sel = rng.choice(ny * nx, 120, replace=False)
    cube.reshape(nz, -1)[:, sel] *= 4.0

    o2 = np.mean(cube.astype(np.float64) ** 2, axis=0)
    testO2, thr = [], []
    for a in range(1, nb + 1):
        t = o2[areamap == a]
        testO2.append(t)
        thr.append(np.percentile(t, 80))

    f0, m0, s0 = greedy_pca_by_area(cube, areamap, thr, testO2)
    mesh = make_mesh(8, dp=1)
    fdev, m1, s1 = greedy_pca_mesh(mesh, jnp.asarray(cube), areamap, thr,
                                   testO2)
    assert s0 == s1
    np.testing.assert_array_equal(m0, m1)
    scale = np.abs(f0).max()
    np.testing.assert_allclose(np.asarray(fdev), f0, atol=5e-3 * scale)
    assert m0.max() >= 2  # the case must exercise real iterations


def test_glr_tile_mosaic_pallas_matches_xla(problem):
    """Mosaic (multi-field weighted FSF) x fused Pallas sweep inside
    shard_map (interpret on CPU): matches the XLA mosaic tile path.

    This is the combination real TPU mosaics run; check_vma=False is
    forced there, so this parity test is its coverage."""
    from functools import partial

    from jax.sharding import PartitionSpec as P

    from origin_tpu.core import MoffatFSF
    from origin_tpu.ops.glr import pack_profiles_toeplitz, prepare_profiles
    from origin_tpu.parallel.mesh import build_tile_spatial_op, glr_tile

    cube, var, mask, psf, profiles = problem
    nz, ny, nx = cube.shape
    mesh = make_mesh(8, dp=1)
    sp = mesh.shape["sp"]

    psf2 = (
        MoffatFSF(fwhm_pol=[0.8], beta_pol=[2.5], pixstep=0.2)
        .get_3darray(np.linspace(5000, 9000, nz), (7, 7))
        .astype(np.float32)
    )
    # overlapping weight maps (ramped seam), as FieldsMap would produce
    ramp = np.clip((np.arange(nx) - nx / 2) / 6 + 0.5, 0, 1)
    w2 = np.broadcast_to(ramp, (ny, nx)).astype(np.float32)
    wtiles = np.stack([1.0 - w2, w2])

    prepped = prepare_profiles(profiles)
    t_num, t_den, pad_left, _ = pack_profiles_toeplitz(
        prepped, block=min(128, nz)
    )
    ops, halo = [], 0
    for pf in (psf, psf2):
        op, h = build_tile_spatial_op(pf, ny // sp, nx)
        ops.append(op)
        halo = max(halo, h)

    row = P(None, "sp", None)
    img = P("sp", None)
    rep = P()
    op_spec = jax.tree.map(lambda _: rep, ops)
    out_specs = (row, row, row, row, row, img, img)

    def run(use_pallas):
        @partial(
            jax.shard_map, mesh=mesh,
            in_specs=(row, row, op_spec, rep, rep, P(None, "sp", None)),
            out_specs=out_specs,
            check_vma=not use_pallas,
        )
        def prog(f, m, o, tn, td, wt):
            return glr_tile(
                f, m, o, tn, td, pad_left, nz, halo=halo, wtiles=wt,
                use_pallas=use_pallas, sweep_interpret=use_pallas,
            )

        return jax.jit(prog)(
            jnp.asarray(cube), jnp.asarray(mask),
            jax.tree.map(jnp.asarray, ops),
            jnp.asarray(t_num), jnp.asarray(t_den), jnp.asarray(wtiles),
        )

    ref = run(False)
    out = run(True)
    names = ("correl", "correl_min", "profile", "lmax", "lmin",
             "maxmap", "minmap")
    for name, a, b in zip(names, ref, out):
        np.testing.assert_allclose(
            np.asarray(b, dtype=np.float32), np.asarray(a, dtype=np.float32),
            atol=1e-4, err_msg=name,
        )
