"""Tests for the host-side detection layer: segmentation, areas, merging,
catalog operations."""

import numpy as np
import pytest

from origin_tpu.core import Table
from origin_tpu.detect import (
    add_tglr_stat,
    area_growing,
    area_segmentation_convex_fusion,
    area_segmentation_final,
    area_segmentation_sources_fusion,
    area_segmentation_square_fusion,
    compute_segmap_gauss,
    deblend_sources,
    detect_sources,
    filter_duplicate_lines,
    fusion_areas,
    make_source_mask,
    merge_similar_lines,
    purity_estimation,
    spatial_segmentation,
    spatiospectral_merging,
    unique_sources,
)


# ---------------------------------------------------------------------------
# segmentation
# ---------------------------------------------------------------------------

def test_detect_sources_basic():
    img = np.zeros((20, 20))
    img[5:8, 5:8] = 10.0   # 9-px source
    img[15, 15] = 10.0     # single pixel, below npixels
    seg = detect_sources(img, 5.0, npixels=5)
    assert seg is not None
    assert seg[6, 6] == 1
    assert seg[15, 15] == 0
    assert detect_sources(img, 50.0, npixels=5) is None


def test_detect_sources_8connectivity():
    img = np.zeros((10, 10))
    # diagonal chain: 8-connected but not 4-connected
    for i in range(5):
        img[i, i] = 10.0
    seg = detect_sources(img, 5.0, npixels=5)
    assert seg is not None
    assert len(np.unique(seg)) == 2  # background + 1 source


def test_deblend_sources_splits_double_peak():
    yy, xx = np.mgrid[:30, :30]
    g1 = 10 * np.exp(-0.5 * ((yy - 10) ** 2 + (xx - 10) ** 2) / 4)
    g2 = 8 * np.exp(-0.5 * ((yy - 10) ** 2 + (xx - 20) ** 2) / 4)
    img = g1 + g2
    seg = detect_sources(img, 0.5, npixels=5)
    assert len(np.unique(seg)) == 2  # blended into one
    deb = deblend_sources(img, seg, npixels=5)
    assert len(np.unique(deb)) == 3  # split into two
    assert deb[10, 10] != deb[10, 20]
    # deblending preserves the footprint
    np.testing.assert_array_equal(deb > 0, seg > 0)


def test_make_source_mask():
    rng = np.random.default_rng(2)
    img = rng.normal(size=(40, 40))
    img[20:23, 20:23] += 50
    mask = make_source_mask(img, snr=3, npixels=5, dilate_size=3)
    assert mask[21, 21]
    assert mask.sum() < 200


def test_compute_segmap_gauss():
    rng = np.random.default_rng(3)
    img = rng.normal(size=(60, 60))
    img[30:35, 30:35] += 20
    thresh, segmap = compute_segmap_gauss(img, pfa=0.01)
    assert segmap[32, 32] > 0
    assert segmap[5, 5] == 0


# ---------------------------------------------------------------------------
# areas
# ---------------------------------------------------------------------------

def test_spatial_segmentation():
    inty, intx = spatial_segmentation(100, 80, 4)
    np.testing.assert_array_equal(intx, [0, 25, 50, 75, 100])
    np.testing.assert_array_equal(inty, [80, 60, 40, 20, 0])


def test_fusion_areas_merges_small():
    planes = np.zeros((3, 10, 10))
    planes[0, :5, :5] = 1    # 25 px
    planes[1, :5, 5:] = 1    # 25 px
    planes[2, 5:, :] = 1     # 50 px
    out = fusion_areas(planes, min_size=30, max_size=200)
    sizes = np.sum(out, axis=(1, 2))
    assert (sizes >= 30).all()
    assert out.shape[0] < 3


def test_area_pipeline_end_to_end():
    # a 60x60 fully-exposed field with two continuum sources
    ny = nx = 60
    nexpmap = np.ones((ny, nx), dtype=int)
    labsrc = np.zeros((ny, nx), dtype=int)
    labsrc[10:15, 10:15] = 1
    labsrc[40:45, 40:48] = 2
    min_s, max_s = 20 ** 2, 40 ** 2
    squares = area_segmentation_square_fusion(nexpmap, min_s, max_s, 3, ny, nx)
    fused, src = area_segmentation_sources_fusion(labsrc, squares, 0.2, ny, nx)
    hulls = area_segmentation_convex_fusion(fused, src)
    assert hulls.shape[0] >= 1
    grown = area_growing(hulls, nexpmap)
    # all exposed pixels covered
    assert np.sum(np.sum(grown, axis=0) > 0) == nexpmap.sum()
    areamap = area_segmentation_final(grown, min_s, max_s)
    labels = np.unique(areamap)
    assert labels[0] >= 0 and len(labels[labels > 0]) >= 1
    # each source sits entirely inside one area
    for lab in (1, 2):
        vals = np.unique(areamap[labsrc == lab])
        assert len(vals) == 1


def test_area_growing_matches_iterated_morphology():
    """The distance-transform closing + windowed/frozen growth loop is
    bit-identical to the direct iterated-scipy formulation (the
    reference's semantics, reference lib_origin.py:698-736)."""
    from scipy import ndimage as ndi

    def reference_growing(label, mask, niter=20):
        order = np.argsort(np.sum(label, axis=(1, 2)))
        out = label.copy().astype(float)
        nlab = out.shape[0]
        while True:
            total = np.sum(out)
            for n in order:
                cu = out[n] > 0
                others = np.delete(np.arange(nlab), n)
                border = (1 - (np.sum(out[others], axis=0) > 0)) * mask
                cu = ndi.binary_dilation(cu, iterations=niter + 1)
                cu = ndi.binary_erosion(cu, border_value=1,
                                        iterations=niter)
                out[n] = cu * border
            if np.sum(out) == np.sum(mask) or np.sum(out) == total:
                break
        return out

    rng = np.random.default_rng(7)
    for _ in range(6):
        ny, nx = rng.integers(40, 100, 2)
        nlab = int(rng.integers(2, 6))
        label = np.zeros((nlab, ny, nx))
        yy, xx = np.mgrid[:ny, :nx]
        for i in range(nlab):
            y, x = rng.integers(5, ny - 5), rng.integers(5, nx - 5)
            label[i][((yy - y) ** 2 + (xx - x) ** 2)
                     < int(rng.integers(9, 400))] = 1
        mask = np.ones((ny, nx), int)
        mask[:, :2] = 0  # an unexposed strip
        np.testing.assert_array_equal(
            area_growing(label, mask), reference_growing(label, mask)
        )


# ---------------------------------------------------------------------------
# merging
# ---------------------------------------------------------------------------

def _merge_table(rows, segmap=None):
    t = Table(rows=rows, names=["x0", "y0", "z0"])
    if segmap is None:
        t["area"] = np.zeros(len(t), dtype=int)
    else:
        t["area"] = segmap[np.asarray(t["y0"]), np.asarray(t["x0"])]
    return t


def test_merging_simple_groups():
    # two close detections + one far away
    t = _merge_table([(10, 10, 100), (12, 11, 400), (40, 40, 100)])
    out = spatiospectral_merging(t, tol_spat=3, tol_spec=5)
    im = np.asarray(out["imatch"])
    # rows sorted by imatch; first two rows same group
    assert im[0] == im[1] != im[2]
    np.testing.assert_array_equal(out["imatch"], out["imatch2"])


def test_merging_sqrt2_gate():
    # chain: a-b close, c within tol of b but 4.47px (> 3*sqrt2) from seed a
    rows = [(10, 10, 100), (12, 10, 500), (14, 12, 900)]
    out = spatiospectral_merging(_merge_table(rows), tol_spat=3, tol_spec=5)
    im = np.asarray(out["imatch"])
    xs = np.asarray(out["x0"])
    # a and b merge (within tol of seed); c is within tol of b but beyond
    # tol*sqrt2 of the seed with |dz| >= tol_spec, so stays separate
    assert im[xs == 10] == im[xs == 12]
    assert im[xs == 14] != im[xs == 10]


def test_merging_sqrt2_gate_close_z():
    # same chain, but c close in z to the seed -> merged
    rows = [(10, 10, 100), (12, 10, 101), (14, 12, 102)]
    out = spatiospectral_merging(_merge_table(rows), tol_spat=3, tol_spec=5)
    assert len(np.unique(out["imatch"])) == 1


def test_merging_segmap_regions():
    # two groups in the same segmap region with close wavelengths merge,
    # a third with distant wavelength stays alone
    segmap = np.zeros((50, 50), dtype=int)
    segmap[20:40, 20:40] = 7
    rows = [(22, 22, 100), (35, 35, 103), (30, 30, 500)]
    out = spatiospectral_merging(_merge_table(rows, segmap), tol_spat=3, tol_spec=5)
    im = np.asarray(out["imatch"])
    im2 = np.asarray(out["imatch2"])
    zs = np.asarray(out["z0"])
    assert im[zs == 100] == im[zs == 103]      # merged by region + close z
    assert im2[zs == 100] != im2[zs == 103]    # but not by the spatial pass
    assert im[zs == 500] != im[zs == 100]


def test_merging_reference_golden():
    """Exact 14-row golden spec of the merging semantics.

    Mirrors the reference's unit test (tests/test_origin.py:186-242): a
    hand-built table exercising the seed/neighbour traversal order, the
    sqrt(2) distance gate, and the second (segmap-region) merge pass, with
    the exact expected ``(imatch, imatch2)`` assignment.  Area labels are the
    values of the reference's tests/segmap.fits at the 14 positions
    ([0]*10 + [1]*4 — rows 11-14 sit in continuum region 1).
    """
    rows = [
        # first source: four spatially-linked lines ...
        (72, 49, 545),
        (71, 49, 549),
        (71, 47, 751),
        (72, 45, 543),
        # ... plus a close line beyond tol_spat*sqrt(2) of the seed but
        # within tol_spec in z, so it still merges
        (74, 44, 546),
        # same spaxel, two wavelengths -> one spatial group
        (51, 44, 360),
        (51, 44, 564),
        (3, 15, 589),
        (3, 15, 597),
        (3, 15, 601),
        # inside segmap region 1: three spatially-separate groups merged by
        # the region pass, and one left out by the tol_spec gate
        (24, 12, 733),
        (24, 15, 736),
        (29, 11, 740),
        (20, 10, 749),
    ]
    t = Table(rows=rows, names=["x0", "y0", "z0"])
    t["area"] = np.array([0] * 10 + [1] * 4)

    out = spatiospectral_merging(t, tol_spat=3, tol_spec=5)

    expected = np.array(
        [
            # (x0, y0, z0, area, imatch, imatch2)
            (72, 49, 545, 0, 0, 0),
            (71, 49, 549, 0, 0, 0),
            (71, 47, 751, 0, 0, 0),
            (72, 45, 543, 0, 0, 0),
            (74, 44, 546, 0, 0, 0),
            (51, 44, 360, 0, 1, 1),
            (51, 44, 564, 0, 1, 1),
            (3, 15, 589, 0, 2, 2),
            (3, 15, 597, 0, 2, 2),
            (3, 15, 601, 0, 2, 2),
            (24, 12, 733, 1, 3, 3),
            (24, 15, 736, 1, 3, 4),
            (29, 11, 740, 1, 3, 5),
            (20, 10, 749, 1, 6, 6),
        ],
        dtype=[("x0", int), ("y0", int), ("z0", int), ("area", int),
               ("imatch", int), ("imatch2", int)],
    )

    for col in expected.dtype.names:
        np.testing.assert_array_equal(
            np.asarray(out[col]), expected[col], err_msg=col
        )


def test_filter_duplicate_lines():
    cor = Table(rows=[(10, 10, 100)], names=["x0", "y0", "z0"])
    std = Table(rows=[(10, 11, 100), (30, 30, 200)], names=["x0", "y0", "z0"])
    keep = filter_duplicate_lines(cor, std, maxdist=2.5)
    assert keep == [1]


# ---------------------------------------------------------------------------
# catalog ops
# ---------------------------------------------------------------------------

def _pval_table():
    return Table(
        data=[np.linspace(2, 10, 9), np.linspace(0, 1, 9),
              np.zeros(9, int), np.zeros(9, int)],
        names=["Tval_r", "Pval_r", "Det_m", "Det_M"],
    )


def test_purity_estimation_interp_and_clip():
    cat = Table(
        data=[[0, 0, 1], [6.0, 20.0, np.nan], [np.nan, np.nan, 4.0]],
        names=["comp", "T_GLR", "STD"],
    )
    out = purity_estimation(cat, _pval_table(), _pval_table())
    p = np.asarray(out["purity"])
    assert abs(p[0] - 0.5) < 1e-6    # interpolated
    assert p[1] == 1.0               # extrapolated, clipped to 1
    assert abs(p[2] - 0.25) < 1e-6   # std table


def _lines_table():
    t = Table(
        data=[
            [1, 1, 1, 2],           # ID
            [5.0, 1.0, 3.0, 7.0],   # flux
            [100, 103, 300, 50],    # z
            [1, 2, 3, 4],           # num_line
            [10.0, 10.2, 10.0, 20.0],  # ra
            [-5.0, -5.0, -5.1, -6.0],  # dec
            [10.0, 10.2, 10.0, 20.0],  # x
            [5.0, 5.0, 5.1, 6.0],      # y
            [0, 0, 0, 1],           # seg_label
            [0, 0, 0, 1],           # comp
            [5000.0, 5003.0, 5500.0, 6000.0],  # lbda
            [8.0, 7.5, 6.0, np.nan],  # T_GLR
            [np.nan, np.nan, np.nan, 9.0],  # STD
            [0.9, 0.8, 0.7, 0.95],  # purity
        ],
        names=["ID", "flux", "z", "num_line", "ra", "dec", "x", "y",
               "seg_label", "comp", "lbda", "T_GLR", "STD", "purity"],
    )
    return t


def test_merge_similar_lines():
    out = merge_similar_lines(_lines_table(), z_pix_threshold=5)
    assert "CAT3_TS" in out.meta
    # lines at z=100 and z=103 of source 1 merge into the brighter (num 1)
    m = {int(n): int(v) for n, v in zip(out["num_line"], out["merged_in"])}
    assert m[2] == 1
    assert m[1] == -9999 and m[3] == -9999 and m[4] == -9999
    flag = {int(n): bool(v) for n, v in zip(out["num_line"], out["line_merged_flag"])}
    assert flag[1] and flag[2] and not flag[3] and not flag[4]


def test_unique_sources_and_stats():
    lines = merge_similar_lines(_lines_table(), z_pix_threshold=5)
    src = unique_sources(lines)
    assert len(src) == 2
    assert src.meta["CAT3_TS"] == lines.meta["CAT3_TS"]
    row1 = src[np.asarray(src["ID"]) == 1][0]
    assert row1["n_lines"] == 2
    # flux-weighted x average of source 1: (5*10 + 1*10.2 + 3*10)/9
    np.testing.assert_allclose(row1["x"], (5 * 10 + 1 * 10.2 + 3 * 10) / 9)
    assert row1["line_merged_flag"]
    # waves: unmerged lines sorted by decreasing flux
    assert row1["waves"] == "5000,5500"

    rng = np.random.default_rng(0)
    correl = rng.normal(size=(10, 10, 10))
    std = rng.normal(size=(10, 10, 10))
    full = add_tglr_stat(src, lines, correl, std)
    assert "nsigTGLR" in full.colnames and "purity" in full.colnames
    row1 = full[np.asarray(full["ID"]) == 1][0]
    np.testing.assert_allclose(row1["T_GLR"], 8.0)
    np.testing.assert_allclose(row1["purity"], 0.9)


def test_native_fof_matches_python():
    """The C++ FoF core must reproduce the Python traversal exactly."""
    from origin_tpu import native
    from origin_tpu.detect.merging import _merge_groups_py

    if native.get_lib() is None:
        pytest.skip("native core unavailable")
    rng = np.random.default_rng(17)
    n = 500
    x = rng.uniform(0, 100, n).round(1)
    y = rng.uniform(0, 100, n).round(1)
    z = rng.integers(0, 400, n).astype(float)
    for tol_spat, tol_spec in [(3, 5), (5, 3), (1.5, 10)]:
        im_py = _merge_groups_py(x, y, z, tol_spat, tol_spec)
        im_c = native.fof_merge_groups(x, y, z, tol_spat, tol_spec)
        np.testing.assert_array_equal(im_c, im_py)

    # degenerate shapes the real pipeline produces: integer pixel
    # coordinates with heavy ties, fully co-located detections, and a
    # dense cluster where everything chains into one group
    cases = []
    xi = rng.integers(0, 30, 300).astype(float)
    yi = rng.integers(0, 30, 300).astype(float)
    zi = rng.integers(0, 100, 300).astype(float)
    cases.append((xi, yi, zi))
    cases.append((np.zeros(20), np.zeros(20),
                  rng.integers(0, 50, 20).astype(float)))
    cases.append((rng.uniform(0, 4, 200), rng.uniform(0, 4, 200),
                  rng.integers(0, 400, 200).astype(float)))
    for cx, cy, cz in cases:
        for tol_spat, tol_spec in [(3, 5), (2, 2)]:
            im_py = _merge_groups_py(cx, cy, cz, tol_spat, tol_spec)
            im_c = native.fof_merge_groups(cx, cy, cz, tol_spat, tol_spec)
            np.testing.assert_array_equal(im_c, im_py)
