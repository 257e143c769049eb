"""Tests for the artifacts layer: Source files, spectra I/O, masks, catalog
editing utilities."""

import numpy as np
import pytest

from origin_tpu.artifacts import (
    Source,
    gen_source_mask,
    merge_sources,
    split_source,
    update_source_table,
)
from origin_tpu.core import Cube, Image, Spectrum, Table, WCS, WaveCoord, MoffatFSF
from origin_tpu.pipeline import load_spectra, save_spectra


def _cube(nz=80, ny=30, nx=30, seed=0):
    rng = np.random.default_rng(seed)
    return Cube(
        data=rng.normal(size=(nz, ny, nx)).astype(np.float32),
        var=np.ones((nz, ny, nx), np.float32),
        wcs=WCS(crpix=(ny / 2, nx / 2), crval=(-30.0, 53.0), shape=(ny, nx)),
        wave=WaveCoord(crval=4750.0, cdelt=1.25, shape=nz),
    )


def test_spectra_roundtrip(tmp_path):
    wave = WaveCoord(crval=4750.0, cdelt=1.25, shape=50)
    spectra = {
        1: Spectrum(data=np.arange(50, dtype=float), var=np.ones(50), wave=wave),
        7: Spectrum(data=np.ones(50) * 2, wave=wave),
    }
    fn = str(tmp_path / "spectra.fits")
    save_spectra(spectra, fn)
    back = load_spectra(fn)
    assert sorted(back) == [1, 7]
    np.testing.assert_allclose(back[1].data, np.arange(50))
    np.testing.assert_allclose(back[1].var, 1.0)
    assert back[7].var is None
    assert back[1].wave == wave


def test_source_roundtrip(tmp_path):
    cube = _cube()
    src = Source.from_data(5, 53.0, -30.0, ("ORIGIN", "0.1", "cube.fits", ""))
    src.header["OR_TH"] = 6.5, "threshold"
    src.add_history("created for test", "tester")
    src.add_cube(cube, "MUSE_CUBE", size=15, add_white=True)
    assert src.cubes["MUSE_CUBE"].shape == (80, 15, 15)
    mask = Image(data=np.ones((15, 15), dtype=np.int64),
                 wcs=src.cubes["MUSE_CUBE"].wcs)
    skym = Image(data=np.ones((15, 15), dtype=np.int64),
                 wcs=src.cubes["MUSE_CUBE"].wcs)
    skym.data[5:10, 5:10] = 0
    src.add_image(mask, "ORI_MASK_OBJ")
    src.add_image(skym, "ORI_MASK_SKY")
    src.extract_spectra(src.cubes["MUSE_CUBE"], skysub=True)
    src.extract_spectra(src.cubes["MUSE_CUBE"], skysub=False)
    assert "MUSE_TOT_SKYSUB" in src.spectra
    assert "MUSE_TOT" in src.spectra
    src.add_line(["NUM_LINE", "FLUX", "PURITY"], [1, 12.5, 0.9])
    src.add_line(["NUM_LINE", "FLUX", "PURITY"], [2, 5.0, 0.8])
    src.add_table(Table(data=[[1, 2]], names=["ID"]), "ORI_CAT")
    src.add_narrow_band_image_lbdaobs(cube, "NB_LINE_1", lbda=4800.0, width=10)

    fn = str(tmp_path / "source-00005.fits")
    src.write(fn)
    back = Source.from_file(fn)
    assert back.header["ID"] == 5
    assert back.header["OR_TH"] == 6.5
    assert back.cubes["MUSE_CUBE"].shape == (80, 15, 15)
    assert "MUSE_WHITE" in back.images
    assert "NB_LINE_1" in back.images
    assert "MUSE_TOT_SKYSUB" in back.spectra
    assert len(back.lines) == 2
    assert "ORI_CAT" in back.tables
    np.testing.assert_allclose(
        back.spectra["MUSE_TOT"].data, src.spectra["MUSE_TOT"].data, rtol=1e-6
    )


def test_extract_spectra_psf_weighted():
    cube = _cube()
    src = Source.from_data(1, 53.0, -30.0, ("ORIGIN", "0.1", "c", ""))
    src.add_cube(cube, "MUSE_CUBE", size=15, add_white=True)
    sub = src.cubes["MUSE_CUBE"]
    m = Image(data=np.ones((15, 15), np.int64), wcs=sub.wcs)
    sky = Image(data=np.ones((15, 15), np.int64), wcs=sub.wcs)
    src.add_image(m, "ORI_MASK_OBJ")
    src.add_image(sky, "ORI_MASK_SKY")
    fwhm = np.full(80, 0.7)
    beta = np.full(80, 2.8)
    src.extract_spectra(sub, skysub=False, psf=fwhm, beta=beta)
    assert "MUSE_PSF" in src.spectra
    assert src.spectra["MUSE_PSF"].data.shape == (80,)
    assert np.isfinite(src.spectra["MUSE_PSF"].data).all()


def test_gen_source_mask(tmp_path):
    # a bright blob in the center of a detection cube
    nz, ny, nx = 40, 51, 51
    cube = _cube(nz, ny, nx)
    blob = np.zeros((ny, nx))
    yy, xx = np.mgrid[:ny, :nx]
    blob[((yy - 25) ** 2 + (xx - 25) ** 2) < 16] = 10.0
    cube.data[18:23] += blob[None].astype(np.float32)
    sky = Image(data=np.ones((ny, nx), dtype=np.int64), wcs=cube.wcs)
    sky_pos = cube.wcs.pix2sky([[25.0, 25.0]])
    lines = Table(
        data=[[1], [sky_pos[0, 1]], [sky_pos[0, 0]], [20], [3.0]],
        names=["num_line", "ra", "dec", "z", "fwhm"],
    )
    ret = gen_source_mask(
        1, 25.0, 25.0, lines=lines, detection_cube=cube, threshold=5.0,
        cont_sky=sky, fwhm=np.full(nz, 2.0), out_dir=str(tmp_path),
        mask_size=25,
    )
    assert ret is None  # no problem
    m = Image(str(tmp_path / "source-mask-00001.fits"))
    s = Image(str(tmp_path / "sky-mask-00001.fits"))
    assert m.shape == s.shape
    assert m.data.max() == 1
    # mask covers the blob center and sky excludes it
    c = m.shape[0] // 2
    assert m.data[c, c] == 1
    assert s.data[c, c] == 0
    assert (s.data == 1).sum() >= 100


def _catalog_pair():
    lines = Table(
        data=[
            [1, 1, 2, 2],
            [1, 2, 3, 4],              # num_line
            [10.0, 12.0, 30.0, 31.0],  # ra
            [-5.0, -5.0, -6.0, -6.0],  # dec
            [10.0, 12.0, 30.0, 31.0],  # x
            [5.0, 5.0, 6.0, 6.0],      # y
            [4.0, 6.0, 8.0, 2.0],      # flux
            [100, 300, 200, 400],      # z
            [5000., 5200., 5100., 5300.],  # lbda
            [0, 0, 1, 1],              # seg_label
            [0, 0, 0, 0],              # comp
            [-9999, -9999, -9999, -9999],  # merged_in
            [False, False, False, False],  # line_merged_flag
            [7.0, 8.0, 9.0, 3.0],      # T_GLR
            [1.0, 1.1, 1.2, 0.5],      # nsigTGLR
            [np.nan] * 4,              # STD
            [np.nan] * 4,              # nsigSTD
            [0.9, 0.95, 0.8, 0.7],     # purity
        ],
        names=["ID", "num_line", "ra", "dec", "x", "y", "flux", "z", "lbda",
               "seg_label", "comp", "merged_in", "line_merged_flag", "T_GLR",
               "nsigTGLR", "STD", "nsigSTD", "purity"],
    )
    sources = Table(
        data=[
            [1, 2], [11.0, 30.5], [-5.0, -6.0], [11.0, 30.5], [5.0, 6.0],
            [2, 2], [0, 1], [0, 0], [False, False], ["5200,5000", "5100,5300"],
            [6.0, 8.0], [8.0, 9.0], [1.1, 1.2], [np.nan, np.nan],
            [np.nan, np.nan], [0.95, 0.8],
        ],
        names=["ID", "ra", "dec", "x", "y", "n_lines", "seg_label", "comp",
               "line_merged_flag", "waves", "flux", "T_GLR", "nsigTGLR",
               "STD", "nsigSTD", "purity"],
    )
    return sources, lines


def test_split_source():
    sources, lines = _catalog_pair()
    new_id = split_source(1, [1], sources, lines)
    assert new_id == 3
    assert set(np.asarray(lines["ID"])) == {1, 2, 3}
    assert len(sources) == 3
    row = sources[np.asarray(sources["ID"]) == 3][0]
    assert row["n_lines"] == 1
    np.testing.assert_allclose(row["flux"], 6.0)  # line 2 moved to new source


def test_merge_sources():
    sources, lines = _catalog_pair()
    ok = merge_sources(1, [2], sources, lines)
    assert ok
    assert set(np.asarray(lines["ID"])) == {1}
    assert list(sources["ID"]) == [1]
    row = sources[0]
    assert row["n_lines"] == 4
    np.testing.assert_allclose(row["flux"], 8.0)


def test_update_source_table():
    sources, lines = _catalog_pair()
    lines["flux"][0] = 100.0
    update_source_table(1, sources, lines)
    row = sources[np.asarray(sources["ID"]) == 1][0]
    np.testing.assert_allclose(row["flux"], 100.0)
    # flux-weighted position now pulled toward line 1
    assert row["x"] < 10.2


def test_append_cube_matches_inline_write(tmp_path):
    """A deferred-appended detection cutout (two-phase source writer)
    must read back identical to an inline one, and the shared HDU
    builder keeps the int16-wire form (BSCALE extension)."""
    from origin_tpu.core.containers import Quant16
    from origin_tpu.artifacts.source import Source

    rng = np.random.default_rng(5)
    nl, s = 40, 7
    wave = WaveCoord(crpix=1, crval=4750.0, cdelt=1.25, shape=nl)
    wcs = WCS(crpix=(3, 3), crval=(-30.0, 53.0), shape=(s, s))
    data = rng.normal(size=(nl, s, s)).astype(np.float32)
    cut = Cube(data=data, wave=wave, wcs=wcs, mask=False, copy=False)

    def make_source():
        src = Source.from_data(1, -30.0, 53.0, ("ORIGIN", "x", "c", "v"))
        src.images["ORI_MASK_OBJ"] = Image(
            data=np.ones((s, s)), wcs=wcs, mask=False, copy=False)
        return src

    inline = make_source()
    inline.cubes["ORI_CORREL"] = cut
    fn_inline = str(tmp_path / "inline.fits")
    inline.write(fn_inline)

    deferred = make_source()
    fn_app = str(tmp_path / "appended.fits")
    deferred.write(fn_app)
    Source.append_cube(fn_app, "ORI_CORREL", cut)

    a = Source.from_file(fn_inline)
    b = Source.from_file(fn_app)
    assert set(a.cubes) == set(b.cubes) == {"ORI_CORREL"}
    np.testing.assert_array_equal(np.asarray(a.cubes["ORI_CORREL"].data),
                                  np.asarray(b.cubes["ORI_CORREL"].data))
    np.testing.assert_array_equal(np.asarray(b.cubes["ORI_CORREL"].data),
                                  data)

    # int16-wire cutouts append as scaled BITPIX-16 extensions, decoding
    # to the same values as the wire
    q, scale = (np.clip(np.round(data / 1e-4), -32767, 32767)
                .astype(np.int16), 1e-4)
    wcut = Cube.__new__(Cube)
    Cube.__init__(wcut, data=q.astype(np.float32) * scale, wave=wave,
                  wcs=wcs, mask=False, copy=False)
    wcut._wire16 = Quant16(q, scale)
    fn_q = str(tmp_path / "quant.fits")
    make_source().write(fn_q)
    Source.append_cube(fn_q, "ORI_CORREL", wcut)
    from origin_tpu import fitsio

    hdus = fitsio.read(fn_q)
    h = next(h for h in hdus if h.name == "CUB_ORI_CORREL_DATA")
    c = Source.from_file(fn_q).cubes["ORI_CORREL"]
    np.testing.assert_allclose(np.asarray(c.data),
                               q.astype(np.float32) * scale, rtol=0,
                               atol=scale / 2)
