"""End-to-end pipeline tests: the golden 11-step run on a synthetic
minicube, with interleaved write/load checkpointing (mirroring the structure
of the reference integration test, tests/test_origin.py:68-183)."""

import os

import numpy as np
import pytest

from make_minicube import make_minicube, make_segmap, FAINT_LINES, BRIGHT_LINES

from origin_tpu import ORIGIN
from origin_tpu.artifacts import Source
from origin_tpu.core import Table


@pytest.fixture(scope="module")
def minicube(tmp_path_factory):
    path = tmp_path_factory.mktemp("data")
    cube_fn = str(path / "minicube.fits")
    seg_fn = str(path / "segmap.fits")
    make_minicube(cube_fn)
    make_segmap(seg_fn)
    return cube_fn, seg_fn


def test_attrs(minicube, tmp_path):
    orig = ORIGIN.init(minicube[0], name="orig", path=str(tmp_path))
    attrs = dir(orig)
    assert "Cat3_sources" in attrs
    assert "cube_faint" in attrs
    assert "step03_compute_PCA_threshold" in attrs
    assert "threshold_correl" in attrs
    with pytest.raises(AttributeError):
        orig.foo_bar_baz


def test_positional_params_recorded(minicube, tmp_path):
    """Parameters passed positionally must be recorded with the values
    actually used, not the signature defaults."""
    orig = ORIGIN.init(minicube[0], name="orig", path=str(tmp_path))
    orig.step01_preprocessing(9)  # dct_order positionally
    assert orig.param["preprocessing"]["params"]["dct_order"] == 9
    orig.close_logfile()


def test_missing_prerequisites_raise_clearly(minicube, tmp_path):
    """Detection and SaveSources (which, like the reference, declare no
    hard require) must fail with actionable messages, not TypeError or
    KeyError mid-run."""
    orig = ORIGIN.init(minicube[0], name="orig", path=str(tmp_path))
    with pytest.raises(RuntimeError, match="threshold"):
        orig.step07_detection()
    with pytest.raises(RuntimeError, match="clean_results"):
        orig.step11_save_sources("x")
    orig.close_logfile()


def test_init_load(minicube, tmp_path):
    orig = ORIGIN.init(minicube[0], name="orig", path=str(tmp_path))
    orig.write()
    assert (tmp_path / "orig" / "orig.yaml").exists()

    newpath = tmp_path / "new"
    os.makedirs(newpath)
    orig.write(path=str(newpath), erase=True)
    orig = ORIGIN.load(str(newpath / "orig"))
    assert (newpath / "orig" / "orig.yaml").exists()


def test_psf(minicube, tmp_path):
    from origin_tpu import fitsio

    orig = ORIGIN.init(minicube[0], name="tmp", loglevel="INFO",
                       path=str(tmp_path))
    psffile = str(tmp_path / "psf.fits")
    fitsio.writeto(psffile, orig.PSF)

    orig2 = ORIGIN.init(
        minicube[0], name="tmp2", loglevel="INFO", path=str(tmp_path),
        PSF=psffile, FWHM_PSF=np.atleast_1d(orig.FWHM_PSF),
        LBDA_FWHM_PSF=orig.LBDA_FWHM_PSF,
    )
    assert orig.param["FWHM PSF"] == orig2.param["FWHM PSF"]
    assert orig.param["LBDA FWHM PSF"] == orig2.param["LBDA FWHM PSF"]


@pytest.mark.slow
def test_origin_full_pipeline(minicube, tmp_path, caplog):
    """The full 11-step golden run with checkpoint/restore after each phase."""
    cube_fn, seg_fn = minicube
    orig = ORIGIN.init(cube_fn, name="tmp", loglevel="INFO",
                       path=str(tmp_path))
    orig.write()
    folder = str(tmp_path / "tmp")

    # log level reload behaviour
    orig = ORIGIN.load(folder)
    orig.set_loglevel("DEBUG")

    orig.step01_preprocessing()
    assert orig.ima_dct is not None
    assert orig.ima_std is not None
    orig.write()

    orig = ORIGIN.load(folder)
    orig.step02_areas(minsize=30, maxsize=60)
    nb_areas = orig.param["nbareas"]
    assert nb_areas >= 1
    labels = np.unique(orig.areamap.data)
    assert list(labels[labels > 0]) == list(range(1, nb_areas + 1))
    orig.write()

    orig = ORIGIN.load(folder)
    assert orig.param["nbareas"] == nb_areas
    orig.step03_compute_PCA_threshold()
    orig.step04_compute_greedy_PCA()

    orig.step05_compute_TGLR(ncpu=1)
    orig.step06_compute_purity_threshold(purity=0.8)

    # frozen golden thresholds for the synthetic minicube (mirrors the
    # reference integration test pinning 9.28/5.46 for its minicube,
    # tests/test_origin.py:156-168) — any purity/GLR semantic drift
    # must break here, not pass silently
    assert orig.param["threshold"] == pytest.approx(4.5908, abs=0.02)
    assert orig.param["threshold_std"] == pytest.approx(4.8666, abs=0.02)

    # detection with the automatic threshold and the provided segmap
    orig.step07_detection(segmap=seg_fn)
    assert len(orig.Cat0) == 15
    assert len(orig.Cat1) == 14
    orig.step08_compute_spectra()
    orig.write()

    cat = Table.read(str(tmp_path / "tmp" / "Cat1.fits"))
    subcat = cat[np.asarray(cat["comp"]) == 0]
    assert np.all(np.isnan(np.asarray(subcat["STD"])))
    assert np.all(np.isfinite(np.asarray(subcat["T_GLR"])))

    # every injected faint line must be recovered
    x0 = np.asarray(cat["x0"])
    y0 = np.asarray(cat["y0"])
    z0 = np.asarray(cat["z0"])
    for (x, y, z, amp, sig) in FAINT_LINES + BRIGHT_LINES:
        near = (np.abs(x0 - x) <= 2) & (np.abs(y0 - y) <= 2) & (
            np.abs(z0 - z) <= 4
        )
        assert near.any(), f"injected line at ({x},{y},{z}) not recovered"

    # session fork, then cleaning
    orig = ORIGIN.load(folder, newname="tmp2")
    orig.step09_clean_results()
    orig.write()

    assert "CAT3_TS" in Table.read(str(tmp_path / "tmp2" / "Cat3_lines.fits")).meta
    assert "CAT3_TS" in Table.read(
        str(tmp_path / "tmp2" / "Cat3_sources.fits")
    ).meta

    folder2 = str(tmp_path / "tmp2")
    orig = ORIGIN.load(folder2)
    orig.step10_create_masks()
    orig.write()

    orig = ORIGIN.load(folder2)
    orig.step11_save_sources("0.1")
    orig.step11_save_sources("0.1", n_jobs=2, overwrite=True)

    orig.info()
    with open(orig.logfile) as f:
        log = f.read().splitlines()
        assert "Step 11 finished" in log[-1]

    tbl = orig.timestat(table=True)
    assert len(tbl) == 12
    assert tbl.colnames == ["Step", "Exec Date", "Exec Time"]

    caplog.clear()
    orig.stat()
    messages = [rec.message for rec in caplog.records]
    assert any("ORIGIN PCA pfa" in m for m in messages)
    assert any("Nb of detected lines" in m for m in messages)

    cat3 = Table.read(str(tmp_path / "tmp2" / "Cat3_lines.fits"))
    nsources = len(np.unique(cat3["ID"]))
    assert nsources >= len(FAINT_LINES)  # all faint lines as separate sources
    assert max(cat3["ID"]) == nsources
    # frozen golden catalog counts (14 lines / 13 sources, 2 of them
    # complementary std-only detections) for the synthetic minicube
    assert len(cat3) == 14
    assert nsources == 13
    sources = Table.read(str(tmp_path / "tmp2" / "Cat3_sources.fits"))
    assert len(sources) == 13
    assert int(np.sum(np.asarray(sources["comp"]) == 1)) == 2

    # source files
    ids = sorted(np.unique(np.asarray(cat3["ID"])))
    src1 = Source.from_file(
        str(tmp_path / "tmp2" / "sources" / ("source-%0.5d.fits" % ids[0]))
    )
    src2 = Source.from_file(
        str(tmp_path / "tmp2" / "sources" / ("source-%0.5d.fits" % ids[1]))
    )
    shapes = {ima.shape for ima in src1.images.values()}
    assert len(shapes) == 1
    mask_size = src1.images["MUSE_WHITE"].shape[0]
    assert src1.cubes["MUSE_CUBE"].shape == (500, mask_size, mask_size)
    assert "SRC_TS" in src1.header
    assert src1.header["CAT3_TS"] == src2.header["CAT3_TS"]
    assert src1.header["SRC_TS"] == src2.header["SRC_TS"]
    assert src1.header["REFSPEC"] in src1.spectra
    assert src1.lines is not None and len(src1.lines) >= 1

    for h in orig.logger.handlers:
        h.close()


def test_detection_free_field_runs_to_completion(minicube, tmp_path):
    """A field with zero detections (absurd thresholds) must run all 11
    steps without crashing: empty catalogs keep their column structure
    (core.table.vstack), the ID remap handles the empty case, and the
    artifact steps write nothing rather than failing."""
    cube_fn, seg_fn = minicube
    orig = ORIGIN.init(cube_fn, name="empty", path=str(tmp_path),
                       loglevel="ERROR")
    orig.step01_preprocessing()
    orig.step02_areas(minsize=30, maxsize=60)
    orig.step03_compute_PCA_threshold()
    orig.step04_compute_greedy_PCA()
    orig.step05_compute_TGLR(ncpu=1)
    orig.step06_compute_purity_threshold(purity=0.8)
    orig.step07_detection(threshold=1e9, threshold_std=1e9, segmap=seg_fn)
    assert len(orig.Cat0) == 0 and len(orig.Cat1) == 0
    assert "x0" in orig.Cat1.colnames  # empty WITH columns
    orig.step08_compute_spectra()
    orig.step09_clean_results()
    orig.step10_create_masks()
    orig.write()
    orig.step11_save_sources("empty", n_jobs=1)
    assert len(orig.Cat2) == 0
    assert len(orig.Cat3_lines) == 0 and len(orig.Cat3_sources) == 0
    orig.close_logfile()


def test_masked_planes_and_blob_field(tmp_path):
    """Masked channel planes (sky-line gaps) and a masked spatial blob —
    realistic MUSE cube defects — must survive all 11 steps: failed line
    estimations near the mask fall back to detection positions, and
    NaN-flux lines cannot poison the flux-weighted source positions."""
    import os as _os
    import sys as _sys

    _sys.path.insert(0, _os.path.dirname(__file__))
    from make_minicube import make_minicube, make_segmap

    from origin_tpu.core import Cube

    cube_fn = str(tmp_path / "m.fits")
    seg_fn = str(tmp_path / "s.fits")
    make_minicube(cube_fn, nz=300, ny=40, nx=40)
    make_segmap(seg_fn, ny=40, nx=40)
    c = Cube(cube_fn)
    d = np.asarray(c.data, np.float32).copy()
    v = np.asarray(c.var, np.float32).copy()
    d[100:108] = np.nan
    v[100:108] = np.nan
    d[:, 5:9, 5:9] = np.nan
    v[:, 5:9, 5:9] = np.nan
    c2 = Cube(data=d, var=v, wcs=c.wcs, wave=c.wave)
    c2.primary_header = c.primary_header
    masked_fn = str(tmp_path / "masked.fits")
    c2.write(masked_fn)

    orig = ORIGIN.init(masked_fn, name="masked", path=str(tmp_path),
                       loglevel="ERROR")
    orig.step01_preprocessing()
    orig.step02_areas(minsize=20, maxsize=40)
    orig.step03_compute_PCA_threshold()
    orig.step04_compute_greedy_PCA()
    orig.step05_compute_TGLR(ncpu=1)
    orig.step06_compute_purity_threshold(purity=0.8)
    orig.step07_detection(segmap=seg_fn)
    assert len(orig.Cat1) > 0
    orig.step08_compute_spectra()
    # refined positions are always finite (failed fits keep x0/y0/z0)
    assert np.isfinite(np.asarray(orig.Cat2["x"], float)).all()
    assert np.isfinite(np.asarray(orig.Cat2["y"], float)).all()
    orig.step09_clean_results()
    assert np.isfinite(np.asarray(orig.Cat3_sources["x"], float)).all()
    orig.step10_create_masks()
    orig.write()
    orig.step11_save_sources("masked", n_jobs=1)
    orig.close_logfile()


def test_pipeline_20_profile_dictionary(tmp_path):
    """Detection with the 20-profile Dico_FWHM_2_12 dictionary (config 2)."""
    from make_minicube import make_minicube, FAINT_LINES, BRIGHT_LINES
    from origin_tpu.core import DICO_FWHM_2_12

    cube_fn = str(tmp_path / "m.fits")
    make_minicube(cube_fn, nz=300, ny=40, nx=40)
    orig = ORIGIN.init(cube_fn, name="d20", path=str(tmp_path),
                       profiles=DICO_FWHM_2_12, loglevel="WARNING")
    assert len(orig.profiles) == 20
    assert len(orig.FWHM_profiles) == 20
    orig.step01_preprocessing()
    orig.step02_areas(minsize=20, maxsize=40)
    orig.step03_compute_PCA_threshold()
    orig.step04_compute_greedy_PCA()
    orig.step05_compute_TGLR()
    orig.step06_compute_purity_threshold(purity=0.8)
    orig.step07_detection()
    cat = orig.Cat1
    assert len(cat) > 0
    # profile indices span the wider dictionary
    assert np.asarray(cat["profile"]).max() < 20


def test_compute_true_purity_validation(tmp_path):
    """Purity/completeness harness vs an injected-line truth catalog."""
    from make_minicube import make_minicube, FAINT_LINES, BRIGHT_LINES
    from origin_tpu.detect import compute_true_purity
    from origin_tpu.core import Table

    cube_fn = str(tmp_path / "m.fits")
    make_minicube(cube_fn, nz=300, ny=40, nx=40)
    orig = ORIGIN.init(cube_fn, name="tp", path=str(tmp_path),
                       loglevel="WARNING")
    orig.step01_preprocessing()
    orig.step02_areas(minsize=20, maxsize=40)
    orig.step03_compute_PCA_threshold()
    orig.step04_compute_greedy_PCA()
    orig.step05_compute_TGLR()

    lines = [(x, y, z) for (x, y, z, a, s) in FAINT_LINES + BRIGHT_LINES
             if x < 40 and y < 40 and z < 300]
    wave = orig.wave
    refcat = Table(data=[
        np.full(len(lines), 6, dtype=int),
        np.array([l[0] for l in lines], float),
        np.array([l[1] for l in lines], float),
        wave.coord(np.array([l[2] for l in lines], float)),
    ], names=("TYPE", "Q", "P", "LOBS"))

    res = compute_true_purity(orig.cube_local_max, refcat,
                              threshmin=4, threshmax=7)
    # at the lowest threshold nearly every injected line should be matched
    nmiss = np.asarray(res["nmiss"])
    assert nmiss[0] <= 1  # allow one borderline miss
    # purity within [0, 1] where defined, and non-decreasing-ish in threshold
    pur = np.asarray(res["purity"], float)
    pur = pur[np.isfinite(pur)]
    assert ((pur >= 0) & (pur <= 1.0 + 1e-9)).all()


def test_write_skips_unchanged_aux_and_keeps_format(minicube, tmp_path):
    """A second write() must not re-pay the immutable instrument files or
    the per-area O2 text serialization; the session file formats stay
    float32 even with reduced-precision device diagnostics."""
    cube_fn, _ = minicube
    orig = ORIGIN.init(cube_fn, name="w", path=str(tmp_path),
                       loglevel="ERROR")
    orig.step01_preprocessing()
    orig.step02_areas(minsize=30, maxsize=60)
    orig.step03_compute_PCA_threshold()
    orig.write()
    folder = str(tmp_path / "w")

    # cont_dct / cube_std are checkpointed as recipe files by default
    # (pipeline.recipes); the materialized products are float32 dense
    from origin_tpu import fitsio
    from origin_tpu.pipeline.recipes import is_recipe_file, load_cube

    assert is_recipe_file(os.path.join(folder, "cont_dct.fits")) == "dct_cont"
    cont = load_cube(os.path.join(folder, "cont_dct.fits")).data
    assert cont.dtype == np.float32
    # local extrema round-trip the sparse transfer exactly: nonzero where
    # a strict box maximum exists, zero elsewhere.  The session file is a
    # sparse (index, value) table (containers.SPARSE_KEY); Cube() scatters
    # it back to the dense float32 array
    from origin_tpu.core.containers import SPARSE_KEY, Cube

    lmax_fn = os.path.join(folder, "cube_std_local_max.fits")
    assert fitsio.getheader(lmax_fn)[SPARSE_KEY] == "extrema16"
    assert os.path.getsize(lmax_fn) < 2 ** 20  # tiny on disk
    lmax = Cube(lmax_fn).data
    assert lmax.dtype == np.float32
    nnz = np.count_nonzero(lmax)
    assert 0 < nnz < lmax.size // 4  # genuinely sparse
    std = load_cube(os.path.join(folder, "cube_std.fits")).data
    zs, ys, xs = np.nonzero(lmax)
    # the extrema cube is stored scaled-int16: values match the float32
    # statistic to the quantization step, the zero pattern is exact
    qstep = np.abs(std[zs, ys, xs]).max() / 32766.0
    np.testing.assert_allclose(lmax[zs, ys, xs], std[zs, ys, xs],
                               atol=0.51 * qstep)

    mtimes = {
        f: os.path.getmtime(os.path.join(folder, f))
        for f in ("cube_psf.fits", "ima_white.fits", "testO2_1.txt")
    }
    orig.write()  # nothing recomputed: aux files untouched
    for f, t in mtimes.items():
        assert os.path.getmtime(os.path.join(folder, f)) == t, f

    # re-running step03 invalidates the O2 diagnostics only
    orig.step03_compute_PCA_threshold()
    orig.write()
    assert os.path.getmtime(os.path.join(folder, "testO2_1.txt")) > mtimes[
        "testO2_1.txt"
    ]
    assert os.path.getmtime(
        os.path.join(folder, "cube_psf.fits")
    ) == mtimes["cube_psf.fits"]

    # a reloaded session still reads every product
    orig2 = ORIGIN.load(folder)
    assert orig2.cont_dct.data.dtype == np.float32
    assert np.isfinite(orig2.thresO2).all()
    orig.close_logfile()
    orig2.close_logfile()


def test_step11_device_batched_matches_host(minicube, tmp_path):
    """On a live session the batched device spectra path must (a) actually
    run and (b) write source files whose spectra/images match the host
    per-source extraction (wire-decode + f32 reduction tolerances)."""
    from origin_tpu.pipeline.steps import SaveSources

    cube_fn, seg_fn = minicube
    orig = ORIGIN.init(cube_fn, name="bat", loglevel="WARNING",
                       path=str(tmp_path))
    orig.step01_preprocessing()
    orig.step02_areas(minsize=30, maxsize=60)
    orig.step03_compute_PCA_threshold()
    orig.step04_compute_greedy_PCA()
    orig.step05_compute_TGLR(ncpu=1)
    orig.step06_compute_purity_threshold(purity=0.8)
    orig.step07_detection(segmap=seg_fn)
    orig.step08_compute_spectra()
    orig.step09_clean_results()
    orig.step10_create_masks()

    seen = {}
    real = SaveSources._device_source_artifacts

    def spy(o, nb_fwhm):
        res = real(o, nb_fwhm)
        seen["spectra"], seen["line_imgs"] = res
        return res

    try:
        SaveSources._device_source_artifacts = staticmethod(spy)
        orig.step11_save_sources("0.1")
    finally:
        SaveSources._device_source_artifacts = staticmethod(real)
    assert seen["spectra"], "batched device spectra path did not run"
    assert seen["line_imgs"], "device line images did not run"

    # host-path rerun of the same step into a second source tree
    host_dir = tmp_path / "hostpath"
    host_dir.mkdir()
    try:
        SaveSources._device_source_artifacts = staticmethod(
            lambda o, nb: (None, None)
        )
        orig.step11_save_sources("0.1", path=str(host_dir), overwrite=True)
    finally:
        SaveSources._device_source_artifacts = staticmethod(real)

    ids = sorted(np.unique(np.asarray(orig.Cat3_sources["ID"])))
    checked_specs = 0
    for sid in ids[:4]:
        fn = "sources/source-%0.5d.fits" % sid
        a = Source.from_file(str(tmp_path / "bat" / fn))
        b = Source.from_file(str(host_dir / "bat" / fn))
        assert set(a.spectra) == set(b.spectra)
        for tag in a.spectra:
            sa, sb = a.spectra[tag], b.spectra[tag]
            scale = max(1.0, float(np.nanmax(np.abs(sb.data))))
            np.testing.assert_allclose(
                np.asarray(sa.data), np.asarray(sb.data),
                atol=2e-3 * scale, err_msg=f"src {sid} {tag}")
            checked_specs += 1
        for tag in a.images:
            if tag.startswith("ORI_CORR_") or tag in ("MUSE_WHITE",
                                                      "ORI_MAXMAP"):
                ia = np.asarray(a.images[tag].data, float)
                ib = np.asarray(b.images[tag].data, float)
                fin = np.isfinite(ia) & np.isfinite(ib)
                assert fin.any()
                scale = max(1.0, float(np.abs(ib[fin]).max()))
                np.testing.assert_allclose(ia[fin], ib[fin],
                                           atol=2e-3 * scale,
                                           err_msg=f"src {sid} {tag}")
    assert checked_specs > 10
    orig.close_logfile()

    # resumed-session leg: reload the written session and re-run step 11.
    # The batched device path must run from the re-uploaded detection
    # cubes (steps._LazyDeviceCube) and reproduce the host-path sources
    res = ORIGIN.load(str(tmp_path / "bat"), loglevel="WARNING")
    res_dir = tmp_path / "resumed"
    res_dir.mkdir()
    try:
        SaveSources._device_source_artifacts = staticmethod(spy)
        seen.clear()
        res.step11_save_sources("0.1", path=str(res_dir), overwrite=True)
    finally:
        SaveSources._device_source_artifacts = staticmethod(real)
    assert seen["spectra"], "resumed session fell back to the host path"
    for sid in ids[:3]:
        fn = "sources/source-%0.5d.fits" % sid
        a = Source.from_file(str(res_dir / "bat" / fn))
        b = Source.from_file(str(host_dir / "bat" / fn))
        assert set(a.spectra) == set(b.spectra)
        for tag in sorted(a.spectra):
            sa, sb = a.spectra[tag], b.spectra[tag]
            scale = max(1.0, float(np.nanmax(np.abs(sb.data))))
            np.testing.assert_allclose(
                np.asarray(sa.data), np.asarray(sb.data),
                atol=2e-3 * scale, err_msg=f"resumed src {sid} {tag}")
    res.close_logfile()


def test_failed_background_park_is_retried(tmp_path):
    """A failed async product write must not poison the session: the
    failure surfaces once, the slot stays live, and the next write()
    retries (and succeeds) instead of re-raising the stale error."""
    from origin_tpu.core.containers import Image as OImage
    from origin_tpu.pipeline.products import ProductStore

    store = ProductStore({"img": "image"})
    store.stash("img", OImage(data=np.ones((4, 4), np.float32)))

    bad = tmp_path / "missing" / "dir"  # parent does not exist
    store.park_async(str(bad))
    with pytest.raises(OSError):
        store.park_all(str(bad))

    good = tmp_path / "ok"
    good.mkdir()
    store.park_all(str(good))  # must not re-raise the stale failure
    assert (good / "img.fits").is_file()
    assert store.fetch("img") is not None


def test_fresh_session_overwrites_stale_instrument_files(minicube,
                                                         tmp_path):
    """A fresh session initialized into a REUSED directory must rewrite
    cube_psf/ima_white for ITS dataset, not adopt another run's files."""
    cube_fn, _ = minicube
    folder = tmp_path / "reuse"
    folder.mkdir()
    stale = folder / "cube_psf.fits"
    from origin_tpu import fitsio

    fitsio.writeto(str(stale), np.zeros((3, 5, 5), np.float32))
    before = os.path.getsize(str(stale))

    orig = ORIGIN.init(cube_fn, name="reuse", path=str(tmp_path),
                       loglevel="ERROR")
    orig.write()
    after = os.path.getsize(str(stale))
    assert after != before  # rewritten with THIS dataset's PSF
    # ... and a second write() of the same session skips the rewrite
    t0 = os.path.getmtime(str(stale))
    orig.write()
    assert os.path.getmtime(str(stale)) == t0
    orig.close_logfile()


def test_step02_empty_source_fusion_falls_back(tmp_path):
    """A gridded field whose source fusion leaves no convex areas must
    keep running (regression: AxisError on an empty label stack) — it
    now grows the square segmentation instead (see
    test_step02_empty_fusion_keeps_grid_zoning)."""
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from make_minicube import make_minicube

    cube_fn = str(tmp_path / "c.fits")
    make_minicube(cube_fn, nz=80, ny=20, nx=18)
    orig = ORIGIN.init(cube_fn, name="empty2", path=str(tmp_path),
                       loglevel="ERROR")
    orig.step01_preprocessing(dct_order=6)
    # minsize small enough to force the gridded branch on this tiny field
    orig.step02_areas(minsize=8, maxsize=16)
    nb = orig.param["nbareas"]
    assert nb >= 1
    assert set(np.unique(orig.areamap.data)) - {0} == set(range(1, nb + 1))
    orig.close_logfile()


def test_detection_without_step06_sets_nan_purity(minicube, tmp_path):
    """Explicit thresholds bypass step 06 (the reference's Detection
    declares no require either) — but then there is no purity curve to
    interpolate, so per-line purity is NaN with a warning instead of the
    reference's TypeError on Pval=None (reference steps.py:1036)."""
    cube_fn, seg_fn = minicube
    orig = ORIGIN.init(cube_fn, name="nopur", path=str(tmp_path),
                       loglevel="ERROR")
    orig.step01_preprocessing()
    orig.step02_areas(minsize=30, maxsize=60)
    orig.step03_compute_PCA_threshold()
    orig.step04_compute_greedy_PCA()
    orig.step05_compute_TGLR(ncpu=1)
    orig.step07_detection(threshold=4.8, threshold_std=5.5, segmap=seg_fn)
    assert orig.Pval is None  # step 06 really did not run
    cat = orig.Cat1
    assert len(cat) > 0
    assert "purity" in cat.colnames
    assert np.all(np.isnan(np.asarray(cat["purity"])))
    orig.close_logfile()


def test_step02_empty_fusion_keeps_grid_zoning(tmp_path):
    """A large gridded field whose source fusion leaves no convex areas
    keeps the square segmentation (grown over the exposure) instead of
    collapsing to one whole-field area — the minsize/maxsize zoning is
    what bounds step 04's per-zone gather (review follow-up to the
    AxisError fallback)."""
    from origin_tpu.core.containers import Image

    cube_fn = str(tmp_path / "c.fits")
    make_minicube(cube_fn, nz=80, ny=48, nx=48)
    orig = ORIGIN.init(cube_fn, name="grid", path=str(tmp_path),
                       loglevel="ERROR")
    orig.step01_preprocessing(dct_order=6)
    # force an empty continuum segmentation so the source fusion finds
    # nothing to attach
    orig.steps["preprocessing"].put(
        "segmap_merged",
        Image(data=np.zeros((48, 48)), wcs=orig.wcs, copy=False),
    )
    orig.step02_areas(minsize=12, maxsize=24)
    nb = orig.param["nbareas"]
    assert nb > 1, "grid zoning lost: collapsed to a single area"
    labels = set(np.unique(orig.areamap.data)) - {0}
    assert labels == set(range(1, nb + 1))
    orig.close_logfile()


def test_resumed_session_persists_replaced_products(minicube, tmp_path):
    """write() on a RESUMED session persists products whose content was
    replaced — a data-setter assignment on a fetched product and a new
    object put() onto a dumped step — while untouched fetches keep their
    files unrewritten.  (The reference silently drops both: its dump
    only covers RUN steps, reference steps.py:301-307.)"""
    from origin_tpu.core.containers import Image

    cube_fn, _ = minicube
    orig = ORIGIN.init(cube_fn, name="dirty", path=str(tmp_path),
                       loglevel="ERROR")
    orig.step01_preprocessing()
    orig.write()
    orig.close_logfile()

    folder = str(tmp_path / "dirty")
    orig2 = ORIGIN.load(folder, loglevel="ERROR")
    # untouched fetch: the session file must NOT be rewritten
    _ = orig2.ima_std.data
    ima_path = os.path.join(folder, "ima_std.fits")
    before = (os.path.getmtime(ima_path), os.path.getsize(ima_path))
    # setter assignment on a fetched dense product
    replaced = np.full(orig2.ima_dct.shape, 3.25, dtype=np.float32)
    orig2.ima_dct.data = replaced
    # wholesale put() of a new object on the dumped step
    seg_new = np.zeros(orig2.ima_white.shape, dtype=np.float32)
    seg_new[4:9, 4:9] = 2.0
    orig2.steps["preprocessing"].put(
        "segmap_merged", Image(data=seg_new, wcs=orig2.wcs, copy=False))
    orig2.write()
    orig2.close_logfile()

    assert (os.path.getmtime(ima_path),
            os.path.getsize(ima_path)) == before, "clean fetch rewritten"
    orig3 = ORIGIN.load(folder, loglevel="ERROR")
    np.testing.assert_array_equal(orig3.ima_dct.data, replaced)
    np.testing.assert_array_equal(orig3.segmap_merged.data, seg_new)
    orig3.close_logfile()
