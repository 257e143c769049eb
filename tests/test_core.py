"""Tests for the host-side data substrate: fitsio, containers, coords, table,
FSF model, profile dictionaries."""

import os
from collections import OrderedDict

import numpy as np
import pytest

from origin_tpu import fitsio
from origin_tpu.core import (
    Cube,
    Image,
    Spectrum,
    Table,
    WCS,
    WaveCoord,
    MoffatFSF,
    FieldsMap,
    default_dictionary_path,
    gaussian_profile,
    load_dictionary,
    read_fsf_from_header,
    vstack,
    join,
)


# ---------------------------------------------------------------------------
# fitsio
# ---------------------------------------------------------------------------

def test_fits_image_roundtrip(tmp_path):
    for dtype in (np.float32, np.float64, np.int16, np.int32, np.int64):
        data = (np.arange(24).reshape(2, 3, 4) * 1.5).astype(dtype)
        fn = str(tmp_path / f"img_{np.dtype(dtype).name}.fits")
        hdr = fitsio.Header()
        hdr["FOO"] = 42, "a comment"
        hdr["BAR"] = "hello world"
        hdr["BAZ"] = 3.14159
        hdr["QUX"] = True
        fitsio.writeto(fn, data, header=hdr)
        back = fitsio.read(fn)
        assert len(back) == 1
        np.testing.assert_array_equal(back[0].data, data)
        h = back[0].header
        assert h["FOO"] == 42
        assert h.comment("FOO") == "a comment"
        assert h["BAR"] == "hello world"
        assert h["QUX"] is True
        assert abs(h["BAZ"] - 3.14159) < 1e-12


def test_fits_multi_extension(tmp_path):
    fn = str(tmp_path / "multi.fits")
    hdus = [fitsio.HDU()]
    for i in range(3):
        hdr = fitsio.Header()
        hdr["EXTNAME"] = f"EXT{i}"
        hdus.append(fitsio.HDU(data=np.full((5,), float(i)), header=hdr))
    fitsio.write(fn, hdus)
    back = fitsio.read(fn)
    assert [h.name for h in back[1:]] == ["EXT0", "EXT1", "EXT2"]
    np.testing.assert_array_equal(fitsio.getdata(fn, "EXT2"), np.full(5, 2.0))


def test_fits_bintable_roundtrip(tmp_path):
    fn = str(tmp_path / "table.fits")
    cols = OrderedDict(
        [
            ("ID", np.arange(5, dtype=np.int64)),
            ("flux", np.linspace(0, 1, 5).astype(np.float64)),
            ("T_GLR", np.array([1, np.nan, 3, 4, 5], dtype=np.float32)),
            ("flag", np.array([True, False, True, False, True])),
            ("name", np.array(["aa", "bb", "c", "dddd", "e"])),
        ]
    )
    hdr = fitsio.Header()
    hdr["CAT3_TS"] = "2026-01-01T00:00:00"
    fitsio.write(fn, [fitsio.HDU(), fitsio.HDU(data=cols, header=hdr)])
    back = fitsio.read(fn)
    tab = back[1].data
    np.testing.assert_array_equal(tab["ID"], cols["ID"])
    np.testing.assert_allclose(tab["flux"], cols["flux"])
    assert np.isnan(tab["T_GLR"][1])
    np.testing.assert_array_equal(tab["flag"], cols["flag"])
    assert list(tab["name"]) == ["aa", "bb", "c", "dddd", "e"]
    assert back[1].header["CAT3_TS"] == "2026-01-01T00:00:00"


def test_fits_bintable_vector_columns(tmp_path):
    """Vector (2-D) columns declare their repeat count in TFORM so the
    row layout matches NAXIS1; values round-trip exactly."""
    fn = str(tmp_path / "vec.fits")
    cols = OrderedDict(
        [
            ("ID", np.arange(4, dtype=np.int32)),
            ("vec", np.arange(12, dtype=np.float32).reshape(4, 3)),
            ("flags", np.array([[True, False]] * 4)),
        ]
    )
    fitsio.write(fn, [fitsio.HDU(), fitsio.HDU(data=cols)])
    back = fitsio.read(fn)
    hdr = back[1].header
    tforms = {hdr[f"TTYPE{i}"]: hdr[f"TFORM{i}"] for i in (1, 2, 3)}
    assert tforms["vec"] == "3E" and tforms["flags"] == "2L"
    assert int(hdr["NAXIS1"]) == 4 + 12 + 2
    tab = back[1].data
    np.testing.assert_array_equal(tab["ID"], cols["ID"])
    np.testing.assert_array_equal(tab["vec"], cols["vec"])
    np.testing.assert_array_equal(tab["flags"], cols["flags"])


def test_fits_header_none_and_table_history(tmp_path):
    """An undefined card (None) round-trips as None, not 'None'; table
    HDU headers keep their HISTORY/COMMENT cards."""
    fn = str(tmp_path / "none.fits")
    hdr = fitsio.Header()
    hdr["UNDEF"] = None
    hdr.add_history("made by test")
    hdr.comments_raw.append("a raw comment")
    cols = OrderedDict([("x", np.arange(3, dtype=np.int32))])
    fitsio.write(fn, [fitsio.HDU(header=hdr),
                      fitsio.HDU(data=cols, header=hdr)])
    back = fitsio.read(fn)
    for ext in (0, 1):
        h = back[ext].header
        assert h["UNDEF"] is None
        assert "made by test" in h.history
        assert "a raw comment" in h.comments_raw


def test_fits_block_alignment(tmp_path):
    # file sizes must be multiples of 2880
    fn = str(tmp_path / "align.fits")
    fitsio.writeto(fn, np.zeros((7, 13), dtype=np.float32))
    assert os.path.getsize(fn) % 2880 == 0


# ---------------------------------------------------------------------------
# coords
# ---------------------------------------------------------------------------

def test_wcs_roundtrip():
    wcs = WCS(crpix=(40.0, 40.0), crval=(-30.0, 53.0), cdelt=2e-4 / 3.6)
    pix = np.array([[0.0, 0.0], [40.0, 40.0], [79.0, 12.0]])
    sky = wcs.pix2sky(pix)
    back = wcs.sky2pix(sky)
    np.testing.assert_allclose(back, pix, atol=1e-8)
    # center maps to crval
    np.testing.assert_allclose(wcs.pix2sky([[40.0, 40.0]])[0], [-30.0, 53.0])
    # pixel scale
    np.testing.assert_allclose(wcs.get_step(unit="arcsec"), [0.2, 0.2], rtol=1e-12)


def test_wcs_header_roundtrip():
    wcs = WCS(crpix=(10.0, 20.0), crval=(-5.0, 100.0), cdelt=2e-4 / 3.6)
    hdr = wcs.to_header()
    wcs2 = WCS.from_header(hdr)
    assert wcs == wcs2


def test_wcs_slicing():
    wcs = WCS(crpix=(40.0, 40.0), crval=(-30.0, 53.0))
    sub = wcs[10:30, 5:25]
    p_full = wcs.pix2sky([[12.0, 8.0]])
    p_sub = sub.pix2sky([[2.0, 3.0]])
    np.testing.assert_allclose(p_full, p_sub)


def test_wavecoord():
    wave = WaveCoord(crpix=1.0, crval=4750.0, cdelt=1.25, shape=100)
    assert wave.coord(0) == 4750.0
    assert wave.coord(2) == 4752.5
    assert wave.pixel(4752.5) == 2.0
    assert wave.pixel(4752.6, nearest=True) == 2
    sub = wave[10:20]
    assert sub.coord(0) == wave.coord(10)
    hdr = wave.to_header()
    wave2 = WaveCoord.from_header(hdr, shape=100)
    assert wave == wave2


# ---------------------------------------------------------------------------
# containers
# ---------------------------------------------------------------------------

def _make_cube(nz=30, ny=16, nx=14, with_var=True):
    rng = np.random.default_rng(0)
    data = rng.normal(size=(nz, ny, nx))
    var = rng.uniform(0.5, 1.5, size=(nz, ny, nx)) if with_var else None
    wcs = WCS(crpix=(ny / 2, nx / 2), crval=(-30.0, 53.0), shape=(ny, nx))
    wave = WaveCoord(crval=4750.0, cdelt=1.25, shape=nz)
    return Cube(data=data, var=var, wcs=wcs, wave=wave)


def test_cube_roundtrip(tmp_path):
    cube = _make_cube()
    cube.data[3, 4, 5] = np.nan
    cube.mask = ~np.isfinite(cube.data)
    fn = str(tmp_path / "cube.fits")
    cube.write(fn)
    back = Cube(fn)
    assert back.shape == cube.shape
    assert back.mask[3, 4, 5]
    np.testing.assert_allclose(back.filled(0), cube.filled(0), rtol=1e-6)
    np.testing.assert_allclose(back.var, cube.var, rtol=1e-6)
    assert back.wcs == cube.wcs
    assert back.wave == cube.wave


def test_cube_reductions():
    cube = _make_cube(with_var=False)
    img = cube.mean(axis=0)
    assert isinstance(img, Image)
    np.testing.assert_allclose(img.data, cube.data.mean(axis=0))
    sp = cube.mean(axis=(1, 2))
    assert isinstance(sp, Spectrum)
    np.testing.assert_allclose(sp.data, cube.data.mean(axis=(1, 2)))


def test_cube_subcube_padding():
    cube = _make_cube()
    sub = cube.subcube(center=(2, 3), size=9)
    assert sub.shape == (30, 9, 9)
    # center pixel maps to the middle of the cutout
    np.testing.assert_allclose(sub.data[:, 4, 4], cube.data[:, 2, 3])
    # out-of-field pixels masked
    assert sub.mask[:, 0, 0].all()
    assert not sub.mask[:, 4, 4].any()
    # WCS consistency: same sky position
    p1 = cube.wcs.pix2sky([[2.0, 3.0]])
    p2 = sub.wcs.pix2sky([[4.0, 4.0]])
    np.testing.assert_allclose(p1, p2)


def test_cube_subcube_infield_fast_path():
    """Fully in-field cutouts take the no-fill fast path: same values as a
    border cutout's in-field region, unmasked, lbda slicing intact, and the
    returned buffers never alias the parent cube."""
    cube = _make_cube()
    sub = cube.subcube(center=(8, 7), size=5, lbda=(4760.0, 4790.0))
    k1 = int(cube.wave.pixel(4760.0, nearest=True))
    k2 = int(cube.wave.pixel(4790.0, nearest=True))
    assert sub.shape == (k2 - k1 + 1, 5, 5)
    np.testing.assert_allclose(sub.data, cube.data[k1:k2 + 1, 6:11, 5:10])
    np.testing.assert_allclose(sub.var, cube.var[k1:k2 + 1, 6:11, 5:10])
    assert not sub.mask.any()
    np.testing.assert_allclose(sub.wave.coord(), cube.wave.coord()[k1:k2 + 1])
    # same sky position as the slow (padded) path computes
    p1 = cube.wcs.pix2sky([[8.0, 7.0]])
    p2 = sub.wcs.pix2sky([[2.0, 2.0]])
    np.testing.assert_allclose(p1, p2)
    # independence: writing into the cutout must not touch the parent
    before = cube.data[k1, 6, 5]
    sub.data[0, 0, 0] = 1e9
    sub.mask[0, 0, 0] = True
    assert cube.data[k1, 6, 5] == before
    # full-width window (the contiguous-slice corner case) is also a copy
    full = cube.subcube(center=(7, 7), size=min(cube.shape[1:]))
    assert not np.shares_memory(full.data, cube.data)
    assert not np.shares_memory(full.var, cube.var)


def test_cube_get_image():
    cube = _make_cube(with_var=False)
    img = cube.get_image(wave=(5, 10), unit_wave=None, method="max")
    np.testing.assert_allclose(img.data, cube.data[5:11].max(axis=0))


def test_spectrum_subspec():
    sp = Spectrum(data=np.arange(50, dtype=float),
                  wave=WaveCoord(crval=4750.0, cdelt=1.25, shape=50))
    sub = sp.subspec(10, 19)
    assert sub.shape == (10,)
    assert sub.wave.coord(0) == sp.wave.coord(10)
    # clipping
    sub2 = sp.subspec(-5, 200)
    assert sub2.shape == (50,)


def test_image_subimage():
    img = Image(data=np.arange(100, dtype=float).reshape(10, 10),
                wcs=WCS(crpix=(5, 5), crval=(0, 0), shape=(10, 10)))
    sub = img.subimage(center=(8, 8), size=5)
    assert sub.shape == (5, 5)
    assert sub.data[2, 2] == img.data[8, 8]
    assert sub.mask[4, 4]  # outside


# ---------------------------------------------------------------------------
# Table
# ---------------------------------------------------------------------------

def test_table_basics(tmp_path):
    t = Table(data=[np.arange(5), np.linspace(0, 1, 5)], names=("a", "b"))
    assert len(t) == 5
    assert t.colnames == ["a", "b"]
    t["c"] = t["a"] * 2
    sub = t[t["a"] > 2]
    assert len(sub) == 2
    row = t[3]
    assert row["a"] == 3
    assert row[["a", "c"]] == (3, 6)
    row["c"] = 99
    assert t["c"][3] == 99
    t.sort("c")
    assert t["c"][-1] == 99

    t.meta["CAT3_TS"] = "2026-01-01"
    fn = str(tmp_path / "t.fits")
    t.write(fn)
    back = Table.read(fn)
    assert back.meta["CAT3_TS"] == "2026-01-01"
    np.testing.assert_array_equal(np.sort(back["a"]), np.arange(5))


def test_table_group_by_and_join():
    t = Table(data=[[1, 1, 2, 2, 3], [10.0, 20.0, 30.0, 40.0, 50.0]],
              names=("ID", "flux"))
    g = t.group_by("ID")
    assert len(g.groups) == 3
    keys = [k for k in g.groups.keys["ID"]]
    assert keys == [1, 2, 3]
    agg = g.groups.aggregate(np.max)
    np.testing.assert_array_equal(agg["flux"], [20.0, 40.0, 50.0])

    t2 = Table(data=[[3, 1, 2], ["x", "y", "z"]], names=("ID", "tag"))
    j = join(t, t2, key="ID")
    assert len(j) == 5
    assert list(j[j["ID"] == 3]["tag"]) == ["x"]


def test_table_vstack_fills_missing():
    t1 = Table(data=[[1, 2], [0.5, 0.6]], names=("x0", "T_GLR"))
    t2 = Table(data=[[3], [9.0]], names=("x0", "STD"))
    out = vstack([t1, t2])
    assert len(out) == 3
    assert np.isnan(out["STD"][0]) and np.isnan(out["T_GLR"][2])


def test_table_add_columns_indexes():
    t = Table(data=[[1], [2], [3], [4], [5], [6], [7], [8]],
              names=list("abcdefgh"))
    t.add_columns([[10], [11], [12]], names=["x", "y", "z"], indexes=[4, 5, 6])
    assert t.colnames == ["a", "b", "c", "d", "x", "e", "y", "f", "z", "g", "h"]


# ---------------------------------------------------------------------------
# FSF / profiles
# ---------------------------------------------------------------------------

def test_moffat_fsf_header_roundtrip():
    fsf = MoffatFSF(fwhm_pol=[-0.136, 0.631], beta_pol=[2.8],
                    lbrange=(5000.0, 9000.0), pixstep=0.2)
    hdr = fsf.to_header()
    back = read_fsf_from_header(hdr, pixstep=0.2)
    np.testing.assert_allclose(back.fwhm_pol, fsf.fwhm_pol)
    np.testing.assert_allclose(back.beta_pol, fsf.beta_pol)
    # at the blue reference wavelength fwhm = last coefficient
    np.testing.assert_allclose(back.get_fwhm(5000.0), 0.631)
    np.testing.assert_allclose(back.get_fwhm(9000.0), 0.631 - 0.136)
    np.testing.assert_allclose(back.get_fwhm(5000.0, unit="pix"), 0.631 / 0.2)


def test_moffat_psf_cube():
    fsf = MoffatFSF(fwhm_pol=[0.7], beta_pol=[2.8], pixstep=0.2)
    psf = fsf.get_3darray(np.array([5000.0, 7000.0]), (25, 25))
    assert psf.shape == (2, 25, 25)
    # centered, symmetric, positive, nearly unit flux
    assert psf[0].argmax() == 12 * 25 + 12
    np.testing.assert_allclose(psf[0], psf[0][::-1, ::-1])
    assert abs(psf[0].sum() - 1.0) < 0.05
    np.testing.assert_allclose(psf[0], fsf.get_2darray(5000.0, (25, 25)))


def test_profile_dictionaries():
    path3 = default_dictionary_path("Dico_3FWHM.fits")
    profiles, fwhms = load_dictionary(path3)
    assert len(profiles) == 3
    np.testing.assert_allclose(fwhms, [2.0, np.linspace(2, 12, 20)[9], 12.0])
    for p, f in zip(profiles, fwhms):
        assert p.shape == (201,)
        np.testing.assert_allclose(np.linalg.norm(p), 1.0, rtol=1e-12)
        assert p.argmax() == 100
        np.testing.assert_allclose(p, gaussian_profile(f))
    path20 = default_dictionary_path("Dico_FWHM_2_12.fits")
    profiles, fwhms = load_dictionary(path20)
    assert len(profiles) == 20
    np.testing.assert_allclose(fwhms, np.linspace(2, 12, 20))


def test_fieldsmap_weights():
    fmap = np.zeros((10, 10), dtype=int)
    fmap[:, :5] = 1
    fmap[:, 5:] = 2
    fmap[0, 0] = 0
    fm = FieldsMap(data=fmap, nfields=2)
    w = fm.compute_weights()
    assert len(w) == 2
    total = w[0] + w[1]
    np.testing.assert_allclose(total[fmap > 0], 1.0)
    assert total[0, 0] == 0


def test_fits_bzero_unsigned_roundtrip(tmp_path):
    """Canonical uint16 encoding (BITPIX=16, BZERO=32768) reads back exact."""
    from origin_tpu import fitsio

    fn = str(tmp_path / "u16.fits")
    raw = np.array([-32768, 0, 32767], dtype=">i2").reshape(1, 3)
    hdr = fitsio.Header()
    hdr.set("BSCALE", 1)
    hdr.set("BZERO", 32768)
    fitsio.write(fn, [fitsio.HDU(data=np.asarray(raw.astype("=i2")), header=hdr)])
    hdus = fitsio.read(fn)
    got = hdus[0].data
    np.testing.assert_array_equal(got, np.array([[0, 32768, 65535]]))
    # scaling cards must be stripped so a re-write does not double-scale
    fn2 = str(tmp_path / "u16b.fits")
    fitsio.write(fn2, hdus)
    np.testing.assert_array_equal(fitsio.read(fn2)[0].data, got)


def test_fits_int8_write_roundtrip(tmp_path):
    from origin_tpu import fitsio

    fn = str(tmp_path / "i8.fits")
    data = np.array([[-1, 2, 3]], dtype=np.int8)
    fitsio.write(fn, [fitsio.HDU(data=data)])
    np.testing.assert_array_equal(fitsio.read(fn)[0].data, data)


def test_fits_unsigned_table_columns(tmp_path):
    from origin_tpu.core import Table

    fn = str(tmp_path / "t.fits")
    t = Table(data=[np.array([0, 40000, 65535], dtype=np.uint16),
                    np.array([0, 3000000000, 7], dtype=np.uint32)],
              names=("a", "b"))
    t.write(fn, overwrite=True)
    t2 = Table.read(fn)
    np.testing.assert_array_equal(np.asarray(t2["a"]), [0, 40000, 65535])
    np.testing.assert_array_equal(np.asarray(t2["b"]), [0, 3000000000, 7])


def test_fits_stray_continue_not_joined():
    """A CONTINUE card that does not immediately follow the card it would
    extend must be ignored (FITS convention): a foreign header with a
    literal trailing '&' value followed by other cards and a stray
    CONTINUE must keep the original value."""
    import io

    from origin_tpu import fitsio

    def card(text):
        return text.ljust(80)

    cards = (
        card("SIMPLE  =                    T")
        + card("URLQ    = 'http://x?a=1&'     / literal ampersand value")
        + card("COMMENT  something unrelated")
        + card("OTHER   =                    5")
        + card("CONTINUE  'stray continuation'")
        + card("END")
    )
    raw = cards.ljust(2880).encode("ascii")
    hdr = fitsio._read_header(io.BytesIO(raw))
    assert hdr["URLQ"] == "http://x?a=1&"  # not stripped, not extended
    assert hdr["OTHER"] == 5

    # the legitimate multi-card chain still joins
    cards2 = (
        card("SIMPLE  =                    T")
        + card("LONG    = 'abc&'")
        + card("CONTINUE  'def&'")
        + card("CONTINUE  'ghi'")
        + card("END")
    )
    hdr2 = fitsio._read_header(io.BytesIO(cards2.ljust(2880).encode()))
    assert hdr2["LONG"] == "abcdefghi"


def test_fits_long_header_string_roundtrip(tmp_path):
    """Over-long string values survive a write/read cycle via CONTINUE
    cards (provenance paths in source-file headers exceed one card)."""
    from origin_tpu import fitsio

    fn = str(tmp_path / "h.fits")
    hdr = fitsio.Header()
    cases = {
        "LONGVAL": "x" * 100,
        "LONGPATH": "/some/deep/session/dir/" * 8 + "cube.fits",
        "QUOTED": "it's " + "a very long quoted value " * 6 + "end'",
        "HUGE": "y" * 500,
    }
    for key, val in cases.items():
        hdr.set(key, val, "comment")
    fitsio.write(fn, [fitsio.HDU(header=hdr)])
    back = fitsio.read(fn)[0].header
    for key, val in cases.items():
        assert back[key] == val
    # short values are unaffected by the CONTINUE machinery
    hdr2 = fitsio.Header()
    hdr2.set("SHORT", "abc", "c")
    fitsio.write(fn, [fitsio.HDU(header=hdr2)])
    assert fitsio.read(fn)[0].header["SHORT"] == "abc"

    # a short value pushed overlong only by its comment keeps a truncated
    # comment prefix instead of losing the comment entirely
    hdr3 = fitsio.Header()
    long_comment = "important provenance " * 5
    hdr3.set("KEY", "abc", long_comment)
    fitsio.write(fn, [fitsio.HDU(header=hdr3)])
    back3 = fitsio.read(fn)[0].header
    assert back3["KEY"] == "abc"
    got = back3.comment("KEY")
    assert got and long_comment.startswith(got.rstrip())


def test_wcs_wave_negative_slice_start():
    from origin_tpu.core import WCS, WaveCoord

    wcs = WCS(crpix=(10, 10), crval=(-30.0, 53.0), shape=(20, 20))
    sub = wcs[slice(-5, None), slice(0, 20)]
    # origin moves to row 15: crpix shifts by 15
    assert sub.crpix[0] == 10 - 15
    wave = WaveCoord(crpix=1.0, crval=4750.0, cdelt=1.25, shape=100)
    wv = wave[-5:]
    assert abs(wv.get_start() - wave.coord(95)) < 1e-9
    assert wv.shape == 5


def test_cube_cross_sections_and_masked_sum():
    from origin_tpu.core import Cube, WCS, WaveCoord

    rng = np.random.default_rng(0)
    data = rng.normal(size=(5, 4, 3)).astype(np.float32)
    mask = np.zeros(data.shape, bool)
    mask[:, 1, 1] = True  # fully-masked spaxel
    cube = Cube(data=data, mask=mask,
                wcs=WCS(crpix=(2, 2), crval=(-30.0, 53.0)),
                wave=WaveCoord(crpix=1.0, crval=4750.0, cdelt=1.25))
    # cross-sections return raw arrays instead of mis-coordinated objects
    assert isinstance(cube[:, 2, :], np.ndarray)
    assert isinstance(cube[2, 3, :], np.ndarray)
    # well-defined cases keep containers
    from origin_tpu.core.containers import Image, Spectrum

    assert isinstance(cube[2], Image)
    assert isinstance(cube[:, 2, 1], Spectrum)
    # sum over z must mask the dead spaxel, not report 0 flux
    img = cube.sum(axis=0)
    assert img.mask is not None and bool(img.mask[1, 1])


def test_quant16_cube_write_roundtrip(tmp_path):
    """A DeferredCube carrying a Quant16 wire writes a BITPIX-16 +
    BSCALE session file that any FITS reader decodes to the wire's
    float32 values — without the writer ever building the float cube."""
    import jax.numpy as jnp

    from origin_tpu import fitsio
    from origin_tpu.core.containers import Quant16
    from origin_tpu.pipeline.engine import DeferredCube, _int16_wire_fetch

    rng = np.random.default_rng(11)
    arr = rng.normal(scale=5.0, size=(20, 8, 7)).astype(np.float32)
    wcs = WCS(crpix=(4, 3.5), crval=(-30.0, 53.0), shape=(8, 7))
    wave = WaveCoord(crval=4750.0, cdelt=1.25, shape=20)
    cube = DeferredCube(jnp.asarray(arr), wcs=wcs, wave=wave,
                        fetch=_int16_wire_fetch(jnp.asarray(arr)))

    fn = str(tmp_path / "correl.fits")
    cube.write(fn)
    wire = cube.wire16()
    assert isinstance(wire, Quant16)

    # the on-disk HDU is a scaled int16 image (the reader strips the
    # scaling cards after applying them, so check the raw bytes)
    hdr = fitsio.getheader(fn, ext=1)
    assert int(hdr["BITPIX"]) == 16
    with open(fn, "rb") as fh:
        raw = fh.read(20 * 2880).decode("ascii", "replace")
    assert "BSCALE" in raw

    back = Cube(fn)
    assert back.data.dtype == np.float32
    np.testing.assert_array_equal(back.data, wire.decode())
    step = float(np.abs(arr).max()) / 32766.0
    assert np.abs(back.data - arr).max() <= 0.51 * step
    assert back.wcs == wcs and back.wave == wave

    # re-writing the decoded cube must not double-scale
    fn2 = str(tmp_path / "correl2.fits")
    back.write(fn2)
    np.testing.assert_array_equal(Cube(fn2).data, back.data)

    # replaced content invalidates the wire: the file gets the new data
    cube2 = DeferredCube(jnp.asarray(arr),
                         fetch=_int16_wire_fetch(jnp.asarray(arr)))
    _ = cube2.wire16()
    cube2.data = arr * 3.0
    assert cube2.wire16() is None
    fn3 = str(tmp_path / "correl3.fits")
    cube2.write(fn3)
    np.testing.assert_allclose(Cube(fn3).data, arr * 3.0, rtol=1e-6)


def test_quantcube_subcube_and_source_write(tmp_path):
    """subcube on a wire-carrying cube yields an int16 QuantCube whose
    decoded values equal the decoded-window values, and the Source
    writer stores it as a scaled BITPIX-16 HDU that reads back equal."""
    import jax.numpy as jnp

    from origin_tpu import fitsio
    from origin_tpu.artifacts.source import Source
    from origin_tpu.core.containers import QuantCube
    from origin_tpu.pipeline.engine import DeferredCube, _int16_wire_fetch

    rng = np.random.default_rng(3)
    nz, ny, nx = 40, 30, 26
    arr = rng.normal(scale=7.0, size=(nz, ny, nx)).astype(np.float32)
    wcs = WCS(crpix=(ny / 2, nx / 2), crval=(-30.0, 53.0), shape=(ny, nx))
    wave = WaveCoord(crval=4750.0, cdelt=1.25, shape=nz)
    # fetch_link=True marks a wire-producing LINK fetch (the production
    # configuration for the detection-statistic cubes, steps.py): windows
    # then come from the int16 wire; pure host-rebuild fetches
    # (fetch_link=False) slice on device instead
    parent = DeferredCube(jnp.asarray(arr), wcs=wcs, wave=wave,
                          fetch=_int16_wire_fetch(jnp.asarray(arr)),
                          fetch_link=True)

    sub = parent.subcube(center=(14, 13), size=9)
    assert isinstance(sub, QuantCube)
    assert sub.wire16().q.dtype == np.int16
    assert sub.shape == (nz, 9, 9) and sub.ndim == 3
    assert sub.dtype == np.float32
    # decoded cutout == window of the decoded parent (same wire scale)
    np.testing.assert_array_equal(sub.data, parent.data[:, 10:19, 9:18])
    # coordinates follow the window
    (dec, dec2) = sub.wcs.pix2sky([(4, 4)])[0], parent.wcs.pix2sky(
        [(14, 13)])[0]
    np.testing.assert_allclose(dec, dec2)

    # an out-of-field cutout falls back to the float path (masked fill)
    edge = parent.subcube(center=(1, 1), size=9)
    assert not isinstance(edge, QuantCube)
    assert edge.shape == (nz, 9, 9)

    # Source writer: the cutout HDU is BITPIX 16 and reads back equal
    src = Source.from_data(7, 53.0, -30.0, ("ORIGIN", "t", "c", ""))
    src.cubes["ORI_CORREL"] = sub
    fn = str(tmp_path / "src.fits")
    src.write(fn)
    for ext, h in enumerate(fitsio.read(fn)):
        if str(h.header.get("EXTNAME", "")).strip() == "CUB_ORI_CORREL_DATA":
            # the HDU must actually be the scaled int16 window — assert
            # the on-disk BITPIX, not just the decoded values
            assert int(fitsio.getheader(fn, ext=ext)["BITPIX"]) == 16
            np.testing.assert_array_equal(
                np.asarray(h.data, np.float32), sub.data)
            break
    else:
        raise AssertionError("ORI_CORREL HDU missing")
    back = Source.from_file(fn)
    np.testing.assert_array_equal(back.cubes["ORI_CORREL"].data, sub.data)

    # replaced data invalidates the cutout's wire
    sub.data = sub.data * 2.0
    assert sub.wire16() is None


def test_dense_int16_file_keeps_wire(tmp_path):
    """Loading a dense scaled-int16 session cube keeps the undecoded
    wire: subcube() cuts int16 windows (live/resumed source-file parity),
    a re-write stays BITPIX 16, and reassigning .data drops the wire."""
    from origin_tpu.core.containers import Quant16, QuantCube
    from origin_tpu.core.coords import WCS, WaveCoord

    rng = np.random.default_rng(5)
    q = rng.integers(-32000, 32000, (40, 16, 12)).astype(np.int16)
    scale = 2.5e-4
    wire = Quant16(q, scale)
    cube = Cube(data=wire.decode(), wcs=WCS(crpix=(8, 6)),
                wave=WaveCoord(crval=4750.0, cdelt=1.25), copy=False)
    cube.mask = None
    cube._wire16 = wire
    fn = str(tmp_path / "stat16.fits")
    cube.write(fn)
    hdr = fitsio.getheader(fn, ext=1)
    assert int(hdr["BITPIX"]) == 16

    back = Cube(fn)
    np.testing.assert_array_equal(back.data, wire.decode())
    w = back.wire16()
    assert w is not None and w.q.dtype == np.int16
    np.testing.assert_array_equal(w.q, q)
    assert w.scale == np.float32(scale)

    # subcube of the loaded cube carries an int16 window
    sub = back.subcube((8, 6), 4)
    assert isinstance(sub, QuantCube)
    np.testing.assert_array_equal(sub.data, wire.decode()[:, 6:10, 4:8])

    # re-write stays int16 and round-trips
    fn2 = str(tmp_path / "stat16b.fits")
    back.write(fn2)
    assert int(fitsio.getheader(fn2, ext=1)["BITPIX"]) == 16
    np.testing.assert_array_equal(Cube(fn2).data, wire.decode())

    # replacing the data invalidates the wire
    back.data = back.data * 2.0
    assert back.wire16() is None
    fn3 = str(tmp_path / "stat16c.fits")
    back.write(fn3)
    assert int(fitsio.getheader(fn3, ext=1)["BITPIX"]) == -32


def test_engine_get_uploads_int16_wire(tmp_path):
    """engine.get() of a wire-carrying host cube uploads the int16 buffer
    and dequantizes on device, matching the host decode bit-for-bit."""
    import jax.numpy as jnp

    from origin_tpu.core.containers import Quant16
    from origin_tpu.pipeline.engine import _dequant16

    rng = np.random.default_rng(6)
    q = rng.integers(-32000, 32000, (30, 8, 8)).astype(np.int16)
    wire = Quant16(q, 3.3e-4)
    out = np.asarray(_dequant16(jnp.asarray(q), np.float32(wire.scale)))
    np.testing.assert_array_equal(out, wire.decode())


def test_sparse_extrema_file_roundtrip(tmp_path):
    """A Quant16 wire carrying (index, value) pairs checkpoints as a tiny
    sparse FITS table and reads back as the identical dense float32 cube;
    a re-park of the loaded cube stays sparse."""
    from origin_tpu.core.containers import SPARSE_KEY, Quant16
    from origin_tpu.core.coords import WCS, WaveCoord

    rng = np.random.default_rng(11)
    shape = (40, 16, 12)
    size = int(np.prod(shape))
    idx = np.sort(rng.choice(size, 37, replace=False)).astype(np.int32)
    q = rng.integers(-32000, 32000, 37).astype(np.int16)
    q[q == 0] = 1
    scale = 3.7e-4
    flat = np.zeros(size, np.int16)
    flat[idx] = q
    wire = Quant16(flat.reshape(shape), scale, pairs=(idx, q))

    cube = Cube(data=wire.decode(), wcs=WCS(crpix=(8, 6), crval=(-30.0, 53.0)),
                wave=WaveCoord(crpix=1.0, crval=4750.0, cdelt=1.25), copy=False)
    cube.mask = None
    cube._wire16 = wire
    fn = str(tmp_path / "lmax.fits")
    cube.write(fn)

    assert os.path.getsize(fn) < 40 * 2880  # sparse, not a dense image
    assert fitsio.getheader(fn)[SPARSE_KEY] == "extrema16"

    back = Cube(fn)
    assert back.data.dtype == np.float32
    np.testing.assert_array_equal(back.data, wire.decode())
    np.testing.assert_allclose(back.wave.coord(), cube.wave.coord())
    np.testing.assert_allclose(back.wcs.pix2sky([(3, 3)]),
                               cube.wcs.pix2sky([(3, 3)]))

    # the loaded cube re-parks sparsely (kept pairs), not as dense float32
    fn2 = str(tmp_path / "lmax2.fits")
    back.write(fn2)
    assert fitsio.getheader(fn2)[SPARSE_KEY] == "extrema16"
    again = Cube(fn2)
    np.testing.assert_array_equal(again.data, wire.decode())

    # empty pair set (a detection-free field) round-trips to all zeros
    ew = Quant16(np.zeros(shape, np.int16), 1e-30,
                 pairs=(np.zeros(0, np.int32), np.zeros(0, np.int16)))
    ec = Cube(data=ew.decode(), copy=False)
    ec.mask = None
    ec._wire16 = ew
    fn3 = str(tmp_path / "empty.fits")
    ec.write(fn3)
    assert np.count_nonzero(Cube(fn3).data) == 0

    # opt-out: ORIGIN_TPU_STORE_SPARSE=0 restores a dense file
    os.environ["ORIGIN_TPU_STORE_SPARSE"] = "0"
    try:
        fn4 = str(tmp_path / "dense.fits")
        cube.write(fn4)
        assert SPARSE_KEY not in fitsio.getheader(fn4)
        np.testing.assert_allclose(Cube(fn4).data, wire.decode(), atol=scale)
    finally:
        del os.environ["ORIGIN_TPU_STORE_SPARSE"]


def test_edge_subcube_keeps_parent_wire_undecoded(tmp_path):
    """A partial-field (edge) cutout of a wire-carrying cube decodes only
    its in-field window: the parent stays wire-only, and LATER in-field
    cutouts still come out as int16 QuantCubes.

    Regression shape: one edge source at the top of the source loop used
    to force the parent's full float32 decode through the generic region
    path, after which every remaining source's ORI cutout (and its
    per-source FITS HDU) silently fell back to float32 — doubling the
    bytes the throughput-throttled disk has to absorb in step 11."""
    from origin_tpu.core.containers import Quant16, QuantCube
    from origin_tpu.core.coords import WCS, WaveCoord

    rng = np.random.default_rng(9)
    q = rng.integers(-32000, 32000, (30, 20, 18)).astype(np.int16)
    wire = Quant16(q, 1.5e-4)
    cube = Cube(data=wire.decode(), wcs=WCS(crpix=(10, 9)),
                wave=WaveCoord(crval=4750.0, cdelt=1.25), copy=False)
    cube.mask = None
    cube._wire16 = wire
    fn = str(tmp_path / "stat16.fits")
    cube.write(fn)

    back = Cube(fn)  # wire-only load: no dense float32 yet
    assert back.__dict__.get("_data_arr") is None

    # edge cutout first (the poisoning order)
    edge = back.subcube((1, 1), 9)
    assert not isinstance(edge, QuantCube)
    assert edge.shape == (30, 9, 9)
    # in-field voxels equal the decoded window; out-of-field are masked
    np.testing.assert_array_equal(
        edge.data[:, 3:, 3:], wire.decode()[:, :6, :6])
    assert bool(edge.mask[0, 0, 0]) and not bool(edge.mask[0, 4, 4])
    # the parent was NOT decoded by the edge cutout
    assert back.__dict__.get("_data_arr") is None

    # a later in-field cutout still cuts an int16 window
    sub = back.subcube((10, 9), 6)
    assert isinstance(sub, QuantCube)
    assert sub.wire16().q.dtype == np.int16
    np.testing.assert_array_equal(sub.data, wire.decode()[:, 7:13, 6:12])


def test_deferred_subcube_wire_survives_decode():
    """DeferredCube: a full .data decode (any host consumer) must not
    strand later cutouts at float32 — the kept wire still wins."""
    import jax.numpy as jnp

    from origin_tpu.core.containers import QuantCube
    from origin_tpu.pipeline.engine import DeferredCube, _int16_wire_fetch

    rng = np.random.default_rng(12)
    arr = rng.normal(scale=4.0, size=(25, 16, 14)).astype(np.float32)
    parent = DeferredCube(jnp.asarray(arr),
                          fetch=_int16_wire_fetch(jnp.asarray(arr)),
                          fetch_link=True)
    _ = parent.data  # decode (e.g. a plotting/host consumer)
    assert parent._host is not None and parent._wire is not None
    sub = parent.subcube((8, 7), 6)
    assert isinstance(sub, QuantCube)
    np.testing.assert_array_equal(sub.data, parent.data[:, 5:11, 4:10])
    # edge cutouts window-decode from the wire too
    edge = parent.subcube((0, 0), 7)
    assert not isinstance(edge, QuantCube)
    np.testing.assert_array_equal(
        edge.data[:, 3:, 3:], parent.data[:, :4, :4])
