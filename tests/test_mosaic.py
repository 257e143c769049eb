"""Mosaic (multi-field) support and plotting smoke tests."""

import matplotlib

matplotlib.use("Agg")

import numpy as np
import pytest

from make_minicube import make_minicube

from origin_tpu import ORIGIN
from origin_tpu.core import Image, MoffatFSF


@pytest.fixture(scope="module")
def mosaic_cube(tmp_path_factory):
    path = tmp_path_factory.mktemp("mosaic")
    cube_fn = str(path / "mosaic.fits")
    cube = make_minicube(nz=200, ny=40, nx=40)
    # two-field FSF model in the header
    hdr = cube.primary_header
    for key in list(hdr.keys()):
        if key.startswith("FSF") and key not in ("FSFMODE", "FSFLB1", "FSFLB2"):
            del hdr[key]
    MoffatFSF(fwhm_pol=[0.7], beta_pol=[2.8], field=0).to_header(hdr)
    MoffatFSF(fwhm_pol=[0.6], beta_pol=[2.6], field=1).to_header(hdr)
    cube.write(cube_fn)
    # field map: left half field 1, right half field 2
    fmap = np.zeros((40, 40), dtype=np.int64)
    fmap[:, :20] = 1
    fmap[:, 20:] = 2
    fmap_fn = str(path / "fieldmap.fits")
    Image(data=fmap).write(fmap_fn)
    return cube_fn, fmap_fn


def test_mosaic_init_and_detection(mosaic_cube, tmp_path):
    cube_fn, fmap_fn = mosaic_cube
    orig = ORIGIN.init(cube_fn, fieldmap=fmap_fn, name="mosaic",
                       path=str(tmp_path), loglevel="WARNING", PSF_size=13)
    assert isinstance(orig.PSF, list) and len(orig.PSF) == 2
    assert orig.wfields is not None and len(orig.wfields) == 2
    assert len(np.asarray(orig.FWHM_PSF)) == 2

    orig.step01_preprocessing()
    orig.step02_areas()
    orig.step03_compute_PCA_threshold()
    orig.step04_compute_greedy_PCA()
    orig.step05_compute_TGLR()
    assert orig.cube_correl is not None
    assert np.isfinite(orig.cube_correl.data).all()
    # detections still found in both halves of the mosaic
    orig.step06_compute_purity_threshold(purity=0.8)
    orig.step07_detection()
    cat = orig.Cat1
    assert len(cat) > 0
    # write/load keeps the mosaic configuration
    orig.write()
    orig2 = ORIGIN.load(str(tmp_path / "mosaic"))
    assert isinstance(orig2.PSF, list) and len(orig2.PSF) == 2
    assert orig2.wfields is not None


def test_plots_smoke(tmp_path):
    import matplotlib.pyplot as plt

    cube_fn = str(tmp_path / "c.fits")
    make_minicube(cube_fn, nz=150, ny=40, nx=40)
    orig = ORIGIN.init(cube_fn, name="plots", path=str(tmp_path),
                       loglevel="ERROR")
    orig.step01_preprocessing()
    orig.step02_areas()
    orig.step03_compute_PCA_threshold()
    orig.step04_compute_greedy_PCA()
    orig.step05_compute_TGLR()
    orig.step06_compute_purity_threshold(purity=0.8)
    orig.step07_detection()

    orig.plot_areas()
    plt.close("all")
    orig.plot_step03_PCA_threshold()
    plt.close("all")
    orig.plot_step03_PCA_stat()
    plt.close("all")
    orig.plot_PCA_threshold(1)
    plt.close("all")
    orig.plot_mapPCA()
    plt.close("all")
    orig.plot_purity()
    plt.close("all")
    orig.plot_purity(comp=True)
    plt.close("all")
    if len(orig.Cat0):
        orig.plot_NB(0)
        plt.close("all")
    orig.plot_sources(np.asarray(orig.Cat1["x0"]), np.asarray(orig.Cat1["y0"]))
    plt.close("all")
    orig.plot_segmaps()
    plt.close("all")
    orig.plot_min_max_hist()
    plt.close("all")
    # det_correl_min helper
    zm, ym, xm = orig.steps["detection"].det_correl_min()
    assert len(zm) == len(ym) == len(xm)


def test_mosaic_on_mesh_matches_single_chip(mosaic_cube, tmp_path):
    """The mosaic (multi-field weighted FSF) GLR runs sharded: per-field
    weighted tiles with halo exchange, summed — catalog parity with the
    single-chip mosaic session at matched thresholds."""
    from origin_tpu.parallel import make_mesh

    cube_fn, fmap_fn = mosaic_cube

    def run(name, mesh):
        orig = ORIGIN.init(cube_fn, fieldmap=fmap_fn, name=name,
                           path=str(tmp_path), loglevel="WARNING",
                           PSF_size=13, mesh=mesh)
        orig.step01_preprocessing()
        orig.step02_areas()
        orig.step03_compute_PCA_threshold()
        orig.step04_compute_greedy_PCA()
        orig.step05_compute_TGLR()
        orig.step06_compute_purity_threshold(purity=0.8)
        return orig

    ref = run("mosref", None)
    shd = run("mosmesh", make_mesh(4, dp=1))  # ny=40 / 4 = 10 >= halo 6

    thr = ref.param["threshold"]
    thr_std = ref.param["threshold_std"]
    ref.step07_detection(threshold=thr, threshold_std=thr_std)
    shd.step07_detection(threshold=thr, threshold_std=thr_std)

    def keyed(cat):
        return sorted(zip(
            np.asarray(cat["x0"]), np.asarray(cat["y0"]),
            np.asarray(cat["z0"]), np.asarray(cat["comp"]),
        ))

    assert keyed(shd.Cat1) == keyed(ref.Cat1)
    d = np.abs(shd.cube_correl.data - ref.cube_correl.data)
    # same PCA trace here (single area typical) -> round-off agreement
    assert np.percentile(d, 99.9) < 2e-2

    for orig in (ref, shd):
        for h in orig.logger.handlers:
            h.close()
