"""Unit tests for the device-resident front-end engine."""

import numpy as np
import pytest

import jax.numpy as jnp

from origin_tpu.core import Cube, WCS, WaveCoord
from origin_tpu.pipeline.engine import DeferredCube, DeviceEngine


class FakeOrig:
    """Minimal session stand-in for engine unit tests."""

    def __init__(self, cube, var, mask):
        self._cube = cube
        self._var = var
        self._mask = mask
        self.shape = cube.shape
        self._store = {}

    @property
    def cube_raw(self):
        return self._cube

    @property
    def var(self):
        return self._var

    @property
    def mask(self):
        return self._mask

    def __getattr__(self, name):
        store = self.__dict__.get("_store", {})
        if name in store:
            return store[name]
        raise AttributeError(name)


@pytest.fixture()
def problem():
    rng = np.random.default_rng(42)
    nz, ny, nx = 50, 8, 9
    cube = rng.normal(size=(nz, ny, nx)).astype(np.float32)
    var = rng.uniform(0.5, 1.5, size=(nz, ny, nx)).astype(np.float32)
    mask = np.zeros((nz, ny, nx), dtype=bool)
    return cube, var, mask


def test_deferred_cube_materializes_once(problem):
    cube, _, _ = problem
    dev = jnp.asarray(cube)
    wcs = WCS(crpix=(4, 4), crval=(-30.0, 53.0))
    wave = WaveCoord(crpix=1.0, crval=4750.0, cdelt=1.25)
    d = DeferredCube(dev, wcs=wcs, wave=wave)
    assert d.shape == cube.shape and d.ndim == 3
    assert d.device is not None
    np.testing.assert_array_equal(d.data, cube)
    assert d.device is None  # freed after materialization
    np.testing.assert_array_equal(d.data, cube)  # cached host copy


def test_deferred_cube_post_transform(problem):
    cube, _, _ = problem
    d = DeferredCube(jnp.asarray(cube), post=lambda a: a.astype(np.int16))
    assert d.data.dtype == np.int16


def test_detections_above_matches_np_where(problem):
    cube, var, mask = problem
    orig = FakeOrig(cube, var, mask)
    eng = DeviceEngine(orig)
    arr = cube * 3.0
    extra = (cube * 7).astype(np.float32)
    orig._store["cube_local_max"] = DeferredCube(jnp.asarray(arr))
    orig._store["cube_profile"] = DeferredCube(jnp.asarray(extra))

    thr = 2.5
    (z, y, x), vals, (evals,) = eng.detections_above(
        "cube_local_max", thr, gather=("cube_profile",)
    )
    ez, ey, ex = np.where(arr > thr)
    np.testing.assert_array_equal(z, ez)
    np.testing.assert_array_equal(y, ey)
    np.testing.assert_array_equal(x, ex)
    np.testing.assert_allclose(vals, arr[ez, ey, ex])
    np.testing.assert_allclose(evals, extra[ez, ey, ex])


def test_detections_above_empty(problem):
    cube, var, mask = problem
    orig = FakeOrig(cube, var, mask)
    eng = DeviceEngine(orig)
    orig._store["cube_local_max"] = DeferredCube(jnp.asarray(cube))
    (z, y, x), vals, extras = eng.detections_above("cube_local_max", 1e9)
    assert len(z) == 0 and len(vals) == 0


def test_detections_above_pair_matches_two_calls(problem):
    cube, var, mask = problem
    orig = FakeOrig(cube, var, mask)
    eng = DeviceEngine(orig)
    arr1 = cube * 3.0
    arr2 = (cube * -2.0).astype(np.float32)
    extra = (cube * 7).astype(np.float32)
    orig._store["cube_local_max"] = DeferredCube(jnp.asarray(arr1))
    orig._store["cube_std_local_max"] = DeferredCube(jnp.asarray(arr2))
    orig._store["cube_profile"] = DeferredCube(jnp.asarray(extra))

    (r1, r2) = eng.detections_above_pair(
        ("cube_local_max", 2.5, ("cube_profile",)),
        ("cube_std_local_max", 1.5, ()),
    )
    for res, arr, thr, has_extra in (
        (r1, arr1, 2.5, True), (r2, arr2, 1.5, False)
    ):
        (z, y, x), vals, extras = res
        ez, ey, ex = np.where(arr > thr)
        assert len(ez) > 0  # non-trivial case
        np.testing.assert_array_equal(z, ez)
        np.testing.assert_array_equal(y, ey)
        np.testing.assert_array_equal(x, ex)
        np.testing.assert_allclose(vals, arr[ez, ey, ex])
        if has_extra:
            np.testing.assert_allclose(extras[0], extra[ez, ey, ex])

    # one-sided empty: the pair call degrades gracefully
    (r1, r2) = eng.detections_above_pair(
        ("cube_local_max", 1e9, ("cube_profile",)),
        ("cube_std_local_max", 1.5, ()),
    )
    assert len(r1[0][0]) == 0 and len(r1[1]) == 0 and len(r1[2][0]) == 0
    assert len(r2[0][0]) == len(np.where(arr2 > 1.5)[0])

    # both empty
    (r1, r2) = eng.detections_above_pair(
        ("cube_local_max", 1e9, ()), ("cube_std_local_max", 1e9, ())
    )
    assert len(r1[0][0]) == 0 and len(r2[0][0]) == 0


def test_speculate_detections_joined_by_pair_fetch(problem):
    """step 06's pre-dispatched fetch is consumed by step 07's call and
    yields results identical to the direct path (key hit, key miss, and
    stash-consumed-once semantics)."""
    cube, var, mask = problem
    orig = FakeOrig(cube, var, mask)
    eng = DeviceEngine(orig)
    arr1 = cube * 3.0
    arr2 = (cube * -2.0).astype(np.float32)
    extra = (cube * 7).astype(np.float32)
    orig._store["cube_local_max"] = DeferredCube(jnp.asarray(arr1))
    orig._store["cube_std_local_max"] = DeferredCube(jnp.asarray(arr2))
    orig._store["cube_profile"] = DeferredCube(jnp.asarray(extra))
    spec1 = ("cube_local_max", 2.5, ("cube_profile",))
    spec2 = ("cube_std_local_max", 1.5, ())

    baseline = eng.detections_above_pair(spec1, spec2)

    eng.speculate_detections(spec1, spec2)
    assert eng._spec_det is not None
    got = eng.detections_above_pair(spec1, spec2)
    assert eng._spec_det is None  # consumed exactly once
    for b, g in zip(baseline, got):
        np.testing.assert_array_equal(np.stack(b[0]), np.stack(g[0]))
        np.testing.assert_array_equal(b[1], g[1])
        for be, ge in zip(b[2], g[2]):
            np.testing.assert_array_equal(be, ge)

    # key miss (different threshold): the stash is discarded, the fresh
    # fetch still returns the exact result for the asked thresholds
    eng.speculate_detections(spec1, spec2)
    r1, _ = eng.detections_above_pair(
        ("cube_local_max", 3.5, ("cube_profile",)), spec2
    )
    assert eng._spec_det is None
    ez, ey, ex = np.where(arr1 > 3.5)
    np.testing.assert_array_equal(r1[0][0], ez)
    np.testing.assert_array_equal(r1[0][1], ey)
    np.testing.assert_array_equal(r1[0][2], ex)


def test_upload_cache_dedupes_and_evicts():
    import origin_tpu.pipeline.engine as eng

    saved = dict(eng._upload_cache)
    eng._upload_cache.clear()
    try:
        a = np.arange(24, dtype=np.float32).reshape(4, 6)
        d1 = eng._upload_cached(a)
        d2 = eng._upload_cached(a.copy())  # value-equal -> same handle
        assert d1 is d2
        assert len(eng._upload_cache) == 1
        # same bytes, different shape/dtype -> distinct entries
        eng._upload_cached(a.reshape(6, 4))
        eng._upload_cached(a.astype(np.float64).astype(np.float32) + 1)
        assert len(eng._upload_cache) == 3
        # FIFO bound
        for i in range(eng._UPLOAD_CACHE_MAX + 2):
            eng._upload_cached(np.full((2, 2), i, np.float32))
        assert len(eng._upload_cache) <= eng._UPLOAD_CACHE_MAX
        # a deleted device buffer is re-uploaded, not returned stale,
        # and the stale entry no longer occupies its old LRU position
        b = np.ones((3, 3), np.float32)
        d3 = eng._upload_cached(b)
        d3.delete()
        d4 = eng._upload_cached(b)
        assert not d4.is_deleted()
        np.testing.assert_array_equal(np.asarray(d4), b)
        assert next(reversed(eng._upload_cache)) is not None  # at LRU end
        key_b = next(reversed(eng._upload_cache))
        assert eng._upload_cache[key_b] is d4
    finally:
        eng._upload_cache.clear()
        eng._upload_cache.update(saved)


def test_upload_cache_oversize_bypasses(monkeypatch):
    import origin_tpu.pipeline.engine as eng

    saved = dict(eng._upload_cache)
    eng._upload_cache.clear()
    monkeypatch.setenv("ORIGIN_TPU_UPLOAD_CACHE_BYTES", "1000")
    try:
        small = np.ones((5, 5), np.float32)  # 100 B: cached
        eng._upload_cached(small)
        assert len(eng._upload_cache) == 1
        big = np.ones((64, 64), np.float32)  # 16 kB > budget
        dev = eng._upload_cached(big)
        np.testing.assert_array_equal(np.asarray(dev), big)
        # the oversize array was uploaded UNCACHED and did not flush
        # the cache to make room it can never fit in
        assert len(eng._upload_cache) == 1
        assert eng._upload_cached(small) is not None
        assert len(eng._upload_cache) == 1
    finally:
        eng._upload_cache.clear()
        eng._upload_cache.update(saved)


def test_deferred_cube_failed_transfer_retries(problem):
    """One transient fetch failure must not poison the product."""
    cube, _, _ = problem
    calls = {"n": 0}

    def flaky_fetch():
        calls["n"] += 1
        if calls["n"] == 1:
            raise OSError("transient link failure")
        return cube.copy()

    d = DeferredCube(jnp.asarray(cube), fetch=flaky_fetch)
    d.prefetch()
    with pytest.raises(OSError):
        d.materialize()
    # retry succeeds from the still-held fetch
    np.testing.assert_array_equal(d.data, cube)
    assert calls["n"] == 2


def test_deferred_cube_data_setter_invalidates(problem):
    """Assigning .data must deactivate the recipe/fetch/std state so a
    later write() stores the NEW content, not the stale generator."""
    cube, _, _ = problem
    recipe_calls = []

    d = DeferredCube(
        jnp.asarray(cube),
        fetch=lambda: cube.copy(),
        recipe_save=lambda path: recipe_calls.append(path),
    )
    d._std_scalar = 123.0
    new = np.full_like(cube, 7.0)
    d.data = new
    assert not d.recipe_active
    assert getattr(d, "_std_scalar", None) is None
    np.testing.assert_array_equal(d.data, new)
    import tempfile, os
    with tempfile.TemporaryDirectory() as tmp:
        fn = os.path.join(tmp, "x.fits")
        d.write(fn)
        assert recipe_calls == []  # the stale recipe was NOT written
        from origin_tpu.core import Cube as _Cube
        np.testing.assert_allclose(_Cube(fn).data, new)


def test_deferred_cube_discard_frees_and_raises(problem):
    """discard() releases the wire-fetch closure's pinned device array;
    a later access raises instead of fabricating content."""
    from origin_tpu.pipeline.engine import _int16_wire_fetch

    cube, _, _ = problem
    dev = jnp.asarray(cube)
    d = DeferredCube(dev, fetch=_int16_wire_fetch(dev), fetch_link=True)
    d.discard()
    assert d.device is None and d._fetch is None
    with pytest.raises(RuntimeError, match="discarded"):
        _ = d.data
    # a materialized cube keeps its content through discard
    d2 = DeferredCube(jnp.asarray(cube))
    np.testing.assert_array_equal(d2.data, cube)
    d2.discard()
    np.testing.assert_array_equal(d2.data, cube)


def test_minicubes_match_host_extraction(problem):
    cube, var, mask = problem
    nz, ny, nx = cube.shape
    orig = FakeOrig(cube, var, mask)
    eng = DeviceEngine(orig)
    sg = 5
    xs = np.array([0, 4, nx - 1, 2])  # includes edge positions
    ys = np.array([0, 3, ny - 1, 7])
    dat, varr = eng.minicubes(xs, ys, sg)
    dat, varr = np.asarray(dat), np.asarray(varr)
    h = sg // 2
    for j, (x0, y0) in enumerate(zip(xs, ys)):
        exp = np.zeros((nz, sg, sg), np.float32)
        expv = np.full((nz, sg, sg), np.inf, np.float32)
        yy0, xx0 = y0 - h, x0 - h
        sy0, sy1 = max(0, yy0), min(ny, yy0 + sg)
        sx0, sx1 = max(0, xx0), min(nx, xx0 + sg)
        exp[:, sy0 - yy0 : sy1 - yy0, sx0 - xx0 : sx1 - xx0] = cube[
            :, sy0:sy1, sx0:sx1
        ]
        expv[:, sy0 - yy0 : sy1 - yy0, sx0 - xx0 : sx1 - xx0] = var[
            :, sy0:sy1, sx0:sx1
        ]
        np.testing.assert_allclose(dat[j], exp)
        np.testing.assert_allclose(varr[j], expv)


def test_engine_get_reuploads_after_materialize(problem):
    cube, var, mask = problem
    orig = FakeOrig(cube, var, mask)
    eng = DeviceEngine(orig)
    d = DeferredCube(jnp.asarray(cube))
    orig._store["cube_std"] = d
    dev = eng.get("cube_std")
    assert dev is d.device
    _ = d.data  # materialize -> device handle dropped
    # falls back to the host copy (resume-from-disk path)
    c = Cube(data=cube.copy(), copy=False)
    orig._store["cube_std"] = c
    dev2 = eng.get("cube_std")
    np.testing.assert_allclose(np.asarray(dev2), cube)


def test_engine_get_wire_uploads(problem):
    """get() uploads the int16 wire of a dense-wire host cube, and the
    (index, value) pairs of a sparse-loaded extrema cube, matching the
    host decode bit-for-bit (resume-from-disk paths)."""
    from origin_tpu.core.containers import Quant16

    cube, var, mask = problem
    orig = FakeOrig(cube, var, mask)
    eng = DeviceEngine(orig)
    rng = np.random.default_rng(3)
    shape = cube.shape

    # dense int16 wire (a loaded scaled-int16 session file)
    q = rng.integers(-32000, 32000, shape).astype(np.int16)
    wire = Quant16(q, 1.7e-4)
    c = Cube(data=wire.decode(), copy=False)
    c.mask = None
    c._wire16 = wire
    orig._store["cube_correl"] = c
    np.testing.assert_array_equal(
        np.asarray(eng.get("cube_correl")), wire.decode()
    )

    # sparse pairs wire (a sparse-loaded extrema file): kilobyte upload,
    # device scatter
    size = int(np.prod(shape))
    idx = np.sort(rng.choice(size, 41, replace=False)).astype(np.int64)
    vals = rng.integers(-32000, 32000, 41).astype(np.int16)
    vals[vals == 0] = 3
    scale = np.float32(2.2e-4)
    flat = np.zeros(size, np.float32)
    flat[idx] = vals.astype(np.float32) * scale
    sc = Cube(data=flat.reshape(shape), copy=False)
    sc.mask = None
    sc._wire16 = Quant16(np.zeros(0, np.int16), float(scale),
                         pairs=(idx, vals))
    orig._store["cube_local_max"] = sc
    np.testing.assert_array_equal(
        np.asarray(eng.get("cube_local_max")), flat.reshape(shape)
    )

    # empty pair set (a detection-free field) stays all-zero
    ec = Cube(data=np.zeros(shape, np.float32), copy=False)
    ec.mask = None
    ec._wire16 = Quant16(np.zeros(0, np.int16), 1.0,
                         pairs=(np.zeros(0, np.int64),
                                np.zeros(0, np.int16)))
    orig._store["cube_local_min"] = ec
    assert not np.asarray(eng.get("cube_local_min")).any()


def test_std_scalar_wire_and_offload_cache(problem):
    """std_scalar reduces a materialized int16 wire by exact integer
    sums (no float32 decode) and prefers the device scalar stashed at
    offload time."""
    from origin_tpu.core.containers import Quant16

    cube, var, mask = problem
    orig = FakeOrig(cube, var, mask)
    eng = DeviceEngine(orig)

    # wire path: scale * sqrt(E[q^2] - E[q]^2) == np.std(decode)
    rng = np.random.default_rng(9)
    q = rng.integers(-32000, 32000, cube.shape).astype(np.int16)
    wire = Quant16(q, 2.1e-4)
    c = Cube(data=wire.decode(), copy=False)
    c.mask = None
    c._wire16 = wire
    orig._store["cube_correl"] = c
    got = eng.std_scalar("cube_correl")
    assert abs(got - float(np.std(wire.decode().astype(np.float64)))) \
        < 1e-6 * abs(got)

    # offload stash: the device reduction survives materialization
    d = DeferredCube(jnp.asarray(cube))
    orig._store["cube_std"] = d
    want = eng.std_scalar("cube_std")  # device path
    eng.offload("cube_std")
    assert d.device is None
    assert eng.std_scalar("cube_std") == pytest.approx(want, rel=1e-6)


def test_greedy_pca_engine_matches_direct(problem):
    from origin_tpu.ops import greedy_pca_by_area, o2test

    cube, var, mask = problem
    nz, ny, nx = cube.shape
    # two areas splitting the field; last column outside every area
    areamap = np.ones((ny, nx), dtype=np.int64)
    areamap[:, nx // 2 :] = 2
    areamap[:, -1] = 0
    # inject a nuisance source in each area
    spec = np.exp(-0.5 * ((np.arange(nz) - 25) / 6.0) ** 2).astype(np.float32)
    cube = cube.copy()
    cube[:, 2, 2] += 9 * spec
    cube[:, 5, 7] += 7 * spec

    o2 = np.asarray(o2test(jnp.asarray(cube)))
    testO2 = [o2[areamap == a] for a in (1, 2)]
    thr = [float(np.percentile(t, 80)) for t in testO2]

    faint0, map0, n0 = greedy_pca_by_area(
        cube.reshape(nz, -1).reshape(nz, ny, nx), areamap, thr, testO2
    )

    orig = FakeOrig(cube, var, mask)
    eng = DeviceEngine(orig)
    orig._store["cube_std"] = DeferredCube(jnp.asarray(cube))
    faint1, map1, n1, faint_fetch = eng.greedy_pca_by_area(
        areamap, thr, testO2
    )

    assert n0 == n1
    np.testing.assert_array_equal(map0, map1)
    np.testing.assert_allclose(np.asarray(faint1), faint0, atol=2e-3)

    # the host rebuild (cube_std + recorded rank-1 factors) must agree
    # with the device result to f32 re-summation order
    rebuilt = faint_fetch()
    assert rebuilt.dtype == np.float32
    np.testing.assert_allclose(rebuilt, np.asarray(faint1), atol=1e-4)
    # spaxels outside every area are bit-equal to the input (the factors
    # only correct area columns)
    np.testing.assert_array_equal(
        rebuilt[:, areamap == 0], cube[:, areamap == 0]
    )


def test_deferred_cube_device_subcube(problem):
    """subcube on a device-resident cube downloads only the window."""
    cube, _, _ = problem
    from origin_tpu.core import Cube, WCS, WaveCoord

    wcs = WCS(crpix=(4, 4), crval=(-30.0, 53.0))
    wave = WaveCoord(crpix=1.0, crval=4750.0, cdelt=1.25)
    ref = Cube(data=cube.copy(), wcs=WCS(crpix=(4, 4), crval=(-30.0, 53.0)),
               wave=WaveCoord(crpix=1.0, crval=4750.0, cdelt=1.25),
               mask=False, copy=False)
    d = DeferredCube(jnp.asarray(cube), wcs=wcs, wave=wave)

    for center, size in [((3, 4), 5), ((0, 0), 7), ((7, 8), 4)]:
        got = d.subcube(center, size)
        exp = ref.subcube(center, size)
        np.testing.assert_allclose(got.data, exp.data)
        np.testing.assert_array_equal(got._mask, exp._mask)
    # full cube never materialized by the windowed fetches
    assert d.device is not None


def test_device_memory_budget_env(monkeypatch):
    """The env override decides the budget and flips the engine's mode."""
    from origin_tpu.pipeline.engine import DeviceEngine, device_memory_fits

    monkeypatch.setenv("ORIGIN_TPU_HBM_BYTES", "1e6")
    assert device_memory_fits(10_000)
    assert not device_memory_fits(2_000_000)

    class FakeOrig:  # the engine only consults .shape here
        shape = (100, 50, 50)

    assert DeviceEngine(FakeOrig()).tight_memory
    monkeypatch.setenv("ORIGIN_TPU_HBM_BYTES", "1e12")
    assert not DeviceEngine(FakeOrig()).tight_memory


def test_device_memory_budget_stats():
    """A backend-reported allocator limit is honored without probing."""
    from origin_tpu.pipeline.engine import device_memory_fits

    class FakeDev:
        platform = "tpu"

        def memory_stats(self):
            return {"bytes_limit": 1 << 20}

    assert device_memory_fits(1 << 19, device=FakeDev())
    assert not device_memory_fits(1 << 21, device=FakeDev())


def test_tight_memory_pipeline(tmp_path, monkeypatch):
    """Full pipeline through the memory-bounded paths (chunked spatial,
    slab sweep, eager offload), forced via the tight heuristic."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__)))
    from make_minicube import make_minicube
    from origin_tpu.pipeline.engine import DeviceEngine
    from origin_tpu import ORIGIN

    monkeypatch.setattr(DeviceEngine, "tight_memory", property(lambda self: True))

    cube_fn = str(tmp_path / "m.fits")
    make_minicube(cube_fn, nz=300, ny=40, nx=40)
    orig = ORIGIN.init(cube_fn, name="tight", path=str(tmp_path),
                       loglevel="WARNING")
    orig.step01_preprocessing()
    # diagnostics-only product must have been offloaded to host
    assert orig.cont_dct.device is None
    orig.step02_areas(minsize=20, maxsize=40)
    orig.step03_compute_PCA_threshold()
    orig.step04_compute_greedy_PCA()
    assert orig.cube_std.device is None  # offloaded after PCA
    orig.step05_compute_TGLR()
    assert orig.cube_faint.device is None
    orig.step06_compute_purity_threshold(purity=0.8)
    orig.step07_detection()
    assert len(orig.Cat1) > 0

    # the back end runs through too — tight sessions must take the HOST
    # source-building path (device inputs are dropped after step 08)
    from origin_tpu.pipeline.steps import SaveSources

    seen = {}
    real = SaveSources._device_source_artifacts

    def spy(o, nb_fwhm):
        seen["res"] = real(o, nb_fwhm)
        return seen["res"]

    orig.step08_compute_spectra()
    orig.step09_clean_results()
    orig.step10_create_masks()
    try:
        SaveSources._device_source_artifacts = staticmethod(spy)
        orig.step11_save_sources("0.1")
    finally:
        SaveSources._device_source_artifacts = staticmethod(real)
    assert seen["res"] == (None, None)  # batched path declined
    import glob

    nsrc = len(np.unique(np.asarray(orig.Cat3_lines["ID"])))
    assert len(glob.glob(str(tmp_path / "tight" / "sources"
                             / "source-*.fits"))) == nsrc

    # tight sessions checkpoint through the same int16 wires: the dense
    # statistic cubes' session files are scaled BITPIX-16 images here
    # too, and the mostly-zero extrema cubes sparse tables
    orig.write()
    from origin_tpu import fitsio
    from origin_tpu.core.containers import SPARSE_KEY

    for name in ("cube_correl", "cube_correl_min"):
        hdr = fitsio.getheader(
            str(tmp_path / "tight" / f"{name}.fits"), ext=1)
        assert int(hdr["BITPIX"]) == 16, name
    assert fitsio.getheader(
        str(tmp_path / "tight" / "cube_local_max.fits")
    )[SPARSE_KEY] == "extrema16"
    orig.close_logfile()


def test_mesh_engine_memory_budget_scales_with_sp(tmp_path, monkeypatch):
    """The tight-memory decision must use the PER-DEVICE share of a
    row-sharded cube, not the full footprint."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from make_minicube import make_minicube

    from origin_tpu import ORIGIN
    from origin_tpu.parallel import make_mesh

    cube_fn = str(tmp_path / "m.fits")
    make_minicube(cube_fn, nz=80, ny=32, nx=24)
    cube_bytes = 4 * 80 * 32 * 24

    # budget: too small for 24 full cubes, ample for 24 cubes / 8 shards
    monkeypatch.setenv("ORIGIN_TPU_HBM_BYTES", str(cube_bytes * 24 // 2))

    single = ORIGIN.init(cube_fn, name="t1", path=str(tmp_path),
                         loglevel="ERROR")
    meshed = ORIGIN.init(cube_fn, name="t2", path=str(tmp_path),
                         loglevel="ERROR", mesh=make_mesh(8, dp=1))
    assert single.engine.tight_memory is True
    assert meshed.engine.tight_memory is False
    for o in (single, meshed):
        for h in o.logger.handlers:
            h.close()


def test_sparse_deferred_cube_matches_dense(problem, monkeypatch):
    """Sparse materialization (index/value transfer) rebuilds the dense
    array: exactly with int16 storage off, to the quantization floor
    (max|x|/32766, zeros exact) with it on (the default)."""
    from origin_tpu.core.containers import Quant16
    from origin_tpu.pipeline.engine import materialize_deferred

    rng = np.random.default_rng(7)
    arr = np.zeros((40, 8, 9), dtype=np.float32)
    hits = rng.random(arr.shape) < 0.03
    arr[hits] = rng.normal(size=int(hits.sum())).astype(np.float32)
    arr[0, 0, 0] = -3.5  # negative local extremum must survive
    tol = float(np.abs(arr).max()) / 32766.0

    one = DeferredCube(jnp.asarray(arr), sparse=True)
    assert isinstance(one.wire16(), Quant16)
    assert one.wire16().q.dtype == np.int16
    np.testing.assert_allclose(one.data, arr, atol=tol)
    np.testing.assert_array_equal(one.data == 0, arr == 0)  # zeros exact

    # grouped path: one count program + one extraction program for all
    cubes = [
        DeferredCube(jnp.asarray(arr), sparse=True),
        DeferredCube(jnp.zeros((4, 4, 4), jnp.float32), sparse=True),
        DeferredCube(jnp.asarray(arr * 2)),  # dense, mixed in
    ]
    materialize_deferred(cubes)
    np.testing.assert_allclose(cubes[0].data, arr, atol=tol)
    np.testing.assert_array_equal(cubes[1].data, np.zeros((4, 4, 4)))
    np.testing.assert_array_equal(cubes[2].data, arr * 2)
    assert all(c.device is None for c in cubes)

    # the opt-out restores bit-exact float32 materialization
    monkeypatch.setenv("ORIGIN_TPU_STORE_INT16", "0")
    exact = DeferredCube(jnp.asarray(arr), sparse=True)
    assert exact.wire16() is None
    np.testing.assert_array_equal(exact.data, arr)


def test_sparse_deferred_cube_post(problem):
    arr = np.zeros((10, 4, 4), dtype=np.float32)
    arr[3, 2, 1] = 5.0
    d = DeferredCube(jnp.asarray(arr), sparse=True,
                     post=lambda a: a.astype(np.float64))
    assert d.data.dtype == np.float64
    np.testing.assert_array_equal(d.data, arr)


def test_upload_cache_lru_and_byte_budget(monkeypatch):
    import origin_tpu.pipeline.engine as eng

    saved = dict(eng._upload_cache)
    eng._upload_cache.clear()
    try:
        # byte budget: three 1 KB entries under a 2.5 KB cap -> evict oldest
        monkeypatch.setenv("ORIGIN_TPU_UPLOAD_CACHE_BYTES", "2500")
        a = np.zeros(256, np.float32)  # 1024 bytes
        b = np.ones(256, np.float32)
        c = np.full(256, 2.0, np.float32)
        da = eng._upload_cached(a)
        eng._upload_cached(b)
        # LRU: touching `a` makes `b` the eviction candidate
        assert eng._upload_cached(a) is da
        eng._upload_cached(c)
        assert len(eng._upload_cache) == 2
        assert eng._upload_cached(a) is da  # survived (recently used)
        # b was evicted: re-upload yields a fresh handle
        db2 = eng._upload_cached(b)
        np.testing.assert_array_equal(np.asarray(db2), b)
        # an entry larger than the whole budget uploads UNCACHED and
        # leaves the cache intact (it could never fit anyway)
        n_before = len(eng._upload_cache)
        big = np.zeros(1024, np.float32)  # 4096 bytes > budget
        dev_big = eng._upload_cached(big)
        np.testing.assert_array_equal(np.asarray(dev_big), big)
        assert len(eng._upload_cache) == n_before
    finally:
        eng._upload_cache.clear()
        eng._upload_cache.update(saved)


def test_detections_above_pair_asymmetric_counts(problem):
    """Very asymmetric detection counts use per-side capacities; results
    must still match np.where exactly."""
    cube, var, mask = problem
    orig = FakeOrig(cube, var, mask)
    eng = DeviceEngine(orig)
    a1 = np.zeros((30, 10, 10), np.float32)
    a2 = np.zeros((30, 10, 10), np.float32)
    a1.ravel()[::2] = 2.0          # ~1500 hits
    a2[5, 5, 5] = 2.0              # 1 hit
    orig._store["big"] = DeferredCube(jnp.asarray(a1))
    orig._store["small"] = DeferredCube(jnp.asarray(a2))
    det1, det2 = eng.detections_above_pair(
        ("big", 1.0, ()), ("small", 1.0, ())
    )
    (z1, y1, x1), v1, _ = det1
    (z2, y2, x2), v2, _ = det2
    ez, ey, ex = np.where(a1 > 1.0)
    np.testing.assert_array_equal(z1, ez)
    np.testing.assert_array_equal(x1, ex)
    assert len(z2) == 1 and (z2[0], y2[0], x2[0]) == (5, 5, 5)


def test_detections_above_pair_speculative_overflow(problem, monkeypatch):
    """A count exceeding the speculative single-round-trip capacity must
    fall back to the exact-bucket fetch and still match np.where."""
    import origin_tpu.pipeline.engine as engmod

    cube, var, mask = problem
    orig = FakeOrig(cube, var, mask)
    eng = DeviceEngine(orig)
    a1 = np.zeros((30, 10, 10), np.float32)
    a2 = np.zeros((30, 10, 10), np.float32)
    a1.ravel()[::2] = 2.0          # 1500 hits >> the shrunken capacity
    a2[5, 5, 5] = 2.0
    orig._store["big"] = DeferredCube(jnp.asarray(a1))
    orig._store["small"] = DeferredCube(jnp.asarray(a2))
    monkeypatch.setattr(engmod, "_SPEC_CAP", 64)
    det1, det2 = eng.detections_above_pair(
        ("big", 1.0, ()), ("small", 1.0, ())
    )
    (z1, y1, x1), v1, _ = det1
    ez, ey, ex = np.where(a1 > 1.0)
    np.testing.assert_array_equal(z1, ez)
    np.testing.assert_array_equal(y1, ey)
    np.testing.assert_array_equal(x1, ex)
    np.testing.assert_allclose(v1, a1[ez, ey, ex])
    assert len(det2[0][0]) == 1


def test_derived_inputs_match_host_views(tmp_path):
    """Uploading raw (NaN-carrying) data + variance and deriving the
    zero-filled cube / inf-filled variance / mask on device must be
    bit-equal to the host-side filled views."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from make_minicube import make_minicube

    from origin_tpu import ORIGIN

    cube_fn = str(tmp_path / "c.fits")
    make_minicube(cube_fn, nz=60, ny=16, nx=16)  # includes NaN voxels
    orig = ORIGIN.init(cube_fn, name="d", path=str(tmp_path),
                       loglevel="ERROR")
    eng = orig.engine
    assert orig.mask.any()  # the case must exercise masked voxels
    np.testing.assert_array_equal(np.asarray(eng.input_cube()),
                                  orig.cube_raw)
    np.testing.assert_array_equal(np.asarray(eng.input_var()), orig.var)
    np.testing.assert_array_equal(np.asarray(eng.input_mask()), orig.mask)
    orig.close_logfile()


def test_std_host_rebuild_matches_device(tmp_path):
    """cube_std / cont_dct materialized via the host rebuild (raw data +
    DCT coefficients + channel means) must match the device arrays to f32
    matmul round-off, and nothing cube-sized may cross the link."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from make_minicube import make_minicube

    from origin_tpu import ORIGIN

    cube_fn = str(tmp_path / "c.fits")
    make_minicube(cube_fn, nz=80, ny=20, nx=18)  # includes NaN voxels
    orig = ORIGIN.init(cube_fn, name="r", path=str(tmp_path),
                       loglevel="ERROR")
    orig.step01_preprocessing(dct_order=6)
    std_obj, dct_obj = orig.cube_std, orig.cont_dct
    assert std_obj._fetch is not None and dct_obj._fetch is not None
    # device truth, captured before materialization frees the handles
    dev_std = np.asarray(std_obj.device)
    dev_dct = np.asarray(dct_obj.device, dtype=np.float32)
    host_std = std_obj.data  # triggers the rebuild
    host_dct = dct_obj.data
    assert host_std.dtype == np.float32
    scale = max(1.0, float(np.abs(dev_std).max()))
    np.testing.assert_allclose(host_std, dev_std, atol=2e-5 * scale)
    # the rebuilt continuum is full f32; the device copy is bf16 storage
    scale = max(1.0, float(np.abs(dev_dct).max()))
    np.testing.assert_allclose(host_dct, dev_dct, atol=1e-2 * scale)
    # masked voxels stay exactly zero in the rebuild, as on device
    assert (host_std[orig.mask] == 0).all()
    orig.close_logfile()


def test_correl_int16_wire_bound():
    """The int16 wire decode must match the device float32 values within
    the documented max|x|/32766 half-step bound."""
    from origin_tpu.pipeline.engine import _int16_wire_fetch

    from origin_tpu.core.containers import Quant16

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(scale=4.0, size=(40, 9, 11)).astype(np.float32))
    wire = _int16_wire_fetch(x)()
    step = float(jnp.max(jnp.abs(x))) / 32766.0
    # int16 storage on (default): the fetch returns the wire itself
    assert isinstance(wire, Quant16)
    assert wire.q.dtype == np.int16
    arr = wire.decode()
    assert arr.dtype == np.float32
    # half a quantization step, plus the float32 rounding of the
    # divide/multiply on either side of the wire
    assert np.abs(arr - np.asarray(x)).max() <= 0.51 * step
    # a window decode matches the full decode
    np.testing.assert_array_equal(
        wire.decode(np.s_[3:9, 1:5, 2:7]), arr[3:9, 1:5, 2:7])
    # all-zero cube decodes to exactly zero (scale floor guards /0)
    z = _int16_wire_fetch(jnp.zeros((4, 3, 2), jnp.float32))()
    assert (z.decode() == 0).all()


def test_correl_wire_opt_out(monkeypatch):
    from origin_tpu.pipeline.engine import DeviceEngine

    monkeypatch.setenv("ORIGIN_TPU_CORREL_WIRE", "f32")
    assert DeviceEngine.correl_wire_fetch(jnp.zeros((2, 2, 2))) is None
    monkeypatch.delenv("ORIGIN_TPU_CORREL_WIRE")
    assert DeviceEngine.correl_wire_fetch(jnp.zeros((2, 2, 2))) is not None


def test_park_async_overlapped_write(tmp_path):
    """park_async writes in the background; park_all joins and marks
    Parked; a slot restashed mid-flight keeps its new value and the
    sweep rewrites the file."""
    from origin_tpu.pipeline.products import Parked, ProductStore

    store = ProductStore({"a": "array", "b": "array"})
    store.stash("a", np.arange(3.0))
    store.stash("b", np.ones(2))
    store.park_async(str(tmp_path))
    store.stash("b", np.zeros(2))  # re-run stashes a new value mid-flight
    store.park_all(str(tmp_path))
    assert isinstance(store.peek("a"), Parked)
    assert isinstance(store.peek("b"), Parked)
    np.testing.assert_array_equal(
        np.loadtxt(tmp_path / "b.txt", ndmin=1), np.zeros(2)
    )
    np.testing.assert_array_equal(store.fetch("a"), np.arange(3.0))


def test_profile_packed_wire(problem):
    """The profile-index cube's bit-packed wire is lossless and engages
    exactly when the dictionary fits 1/2/4 bits."""
    from origin_tpu.pipeline.engine import DeviceEngine, _pack_bits

    rng = np.random.default_rng(5)
    x = rng.integers(0, 3, size=(30, 7, 13)).astype(np.uint8)
    fetch = DeviceEngine.profile_wire_fetch(jnp.asarray(x), 3)
    assert fetch is not None
    np.testing.assert_array_equal(fetch(), x)
    # 4 voxels/byte on the wire for a 3-profile dictionary
    packed = np.asarray(_pack_bits(jnp.asarray(x), 2))
    assert packed.shape == (30, 7, 4)  # ceil(13/4)
    # a 20-profile dictionary keeps the dense download
    assert DeviceEngine.profile_wire_fetch(jnp.zeros((2, 2, 2)), 20) is None


def test_sparse_quantization_keeps_tiny_extrema(problem):
    """An extremum smaller than half a quantization step must survive the
    int16 wire as a nonzero (clamped to one step), never vanish."""
    arr = np.zeros((10, 4, 4), dtype=np.float32)
    arr[2, 1, 1] = 30.0        # sets the scale: step ~ 9.2e-4
    arr[7, 2, 3] = 4e-4        # far below half a step
    arr[5, 0, 2] = -2e-4       # negative tiny extremum
    d = DeferredCube(jnp.asarray(arr), sparse=True)
    out = d.data
    np.testing.assert_array_equal(out != 0, arr != 0)
    step = 30.0 / 32766.0
    assert 0 < out[7, 2, 3] <= step
    assert -step <= out[5, 0, 2] < 0


def test_foreground_gate_defers_background_writes(monkeypatch):
    """Background park jobs wait out a foreground phase (few-core mode),
    run from the foreground thread itself, and ignore the gate when
    deferral is off."""
    import threading
    import time

    import origin_tpu.pipeline.engine as engmod

    monkeypatch.setenv("ORIGIN_TPU_DEFER_WRITES", "1")
    order = []

    def bg():
        engmod.wait_for_foreground(timeout=30)
        order.append("bg")

    with engmod.foreground_cpu():
        t = threading.Thread(target=bg)
        t.start()
        time.sleep(0.15)
        # the foreground thread itself is exempt (no self-deadlock)
        engmod.wait_for_foreground(timeout=30)
        order.append("fg")
    t.join(10)
    assert order == ["fg", "bg"]

    # deferral off: the gate is a no-op even inside a foreground phase
    monkeypatch.setenv("ORIGIN_TPU_DEFER_WRITES", "0")
    with engmod.foreground_cpu():
        done = []
        t = threading.Thread(
            target=lambda: (engmod.wait_for_foreground(timeout=30),
                            done.append(1))
        )
        t.start()
        t.join(10)
        assert done == [1]


def test_windowed_rebuild_matches_full(tmp_path):
    """Window reads of a dropped-device recipe product (cube_std /
    cont_dct / cube_faint) rebuild O(window) on host — without forcing
    the full-cube materialization — and are bit-equal to the same window
    of the full rebuild (the per-voxel arithmetic is window-independent,
    recipes.rebuild_std_cont_region)."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from make_minicube import make_minicube

    from origin_tpu import ORIGIN

    cube_fn = str(tmp_path / "c.fits")
    make_minicube(cube_fn, nz=80, ny=40, nx=40)
    orig = ORIGIN.init(cube_fn, name="w", path=str(tmp_path),
                       loglevel="ERROR")
    orig.step01_preprocessing(dct_order=6)
    orig.step02_areas(minsize=20, maxsize=40)
    orig.step03_compute_PCA_threshold()
    orig.step04_compute_greedy_PCA()

    objs = {n: getattr(orig, n)
            for n in ("cube_std", "cont_dct", "cube_faint")}
    for name, obj in objs.items():
        obj.drop_device()
        assert obj.device is None, name
        assert obj.window_rebuildable, name

    win = (slice(10, 40), slice(3, 9), slice(2, 8))
    blocks = {}
    for name, obj in objs.items():
        blocks[name] = np.array(obj._region(*win)[0])
        # the window must NOT have forced the full materialization
        assert obj._host is None and obj._wire is None, name

    # subcube (the per-source cutout path) also stays windowed
    sub = objs["cube_std"].subcube(center=(9.0, 8.0), size=5)
    assert objs["cube_std"]._host is None
    assert sub.shape == (80, 5, 5)

    # integer z index squeezes like numpy
    plane = objs["cube_std"]._region(7, slice(3, 9), slice(2, 8))[0]
    assert plane.shape == (6, 6)

    for name, obj in objs.items():
        full = obj.data  # full host rebuild
        np.testing.assert_array_equal(blocks[name], full[win], err_msg=name)
    np.testing.assert_array_equal(plane, objs["cube_std"].data[7, 3:9, 2:8])

    # once materialized, windows serve from the host copy
    again = objs["cube_faint"]._region(*win)[0]
    np.testing.assert_array_equal(again, blocks["cube_faint"])
    orig.close_logfile()


def test_deferred_region_int_indices_match_numpy(problem):
    """Integer (and negative) indices collapse their axis identically on
    both serving branches — device-resident and host — so a caller's
    shapes never depend on residency (review: the device branch kept
    size-1 y/x axes, and slice(-1, 0) turned negative indices into empty
    windows)."""
    cube, _, _ = problem
    d = DeferredCube(jnp.asarray(cube))
    # device branch
    np.testing.assert_array_equal(
        d._region(-1, slice(0, 5), slice(0, 4))[0], cube[-1, 0:5, 0:4])
    got = d._region(slice(0, 10), 3, slice(2, 8))[0]
    assert got.shape == (10, 6)
    np.testing.assert_array_equal(got, cube[0:10, 3, 2:8])
    np.testing.assert_array_equal(
        d._region(slice(0, 10), -2, -1)[0], cube[0:10, -2, -1])
    # host branch (after materialization) agrees
    _ = d.data
    np.testing.assert_array_equal(
        d._region(-1, slice(0, 5), slice(0, 4))[0], cube[-1, 0:5, 0:4])
    got = d._region(slice(0, 10), 3, slice(2, 8))[0]
    assert got.shape == (10, 6)
    np.testing.assert_array_equal(
        d._region(slice(0, 10), -2, -1)[0], cube[0:10, -2, -1])

def test_region_guard_serves_replaced_content(problem):
    """A data assignment landing while a windowed host rebuild is in
    flight must not let the stale recipe window escape: the generation
    guard (DeferredCube._region) detects the bump and re-serves the
    window from the replaced content."""
    import threading

    cube, _, _ = problem
    started = threading.Event()
    proceed = threading.Event()

    def fetch():
        return cube.copy()

    def region(zsl, ysl, xsl):
        started.set()
        assert proceed.wait(10), "test orchestration stalled"
        return cube[zsl, ysl, xsl]

    fetch.region = region
    d = DeferredCube(jnp.asarray(cube), fetch=fetch)
    d.drop_device()
    assert d.device is None and d.window_rebuildable

    win = (slice(5, 25), slice(1, 6), slice(2, 7))
    out = {}
    t = threading.Thread(
        target=lambda: out.setdefault("w", np.array(d._region(*win)[0]))
    )
    t.start()
    assert started.wait(10)
    new = cube + 1.0
    d.data = new  # replaces content mid-rebuild (bumps the generation)
    proceed.set()
    t.join(10)
    assert not t.is_alive()
    np.testing.assert_array_equal(out["w"], new[win])
    # and a later read serves the replaced content directly
    np.testing.assert_array_equal(np.array(d._region(*win)[0]), new[win])

def test_minicubes_large_window_and_small_field_fallback(problem):
    """The pad-free gather survives windows nearly as large as the field
    (clipped starts pin to 0), and a field SMALLER than the window takes
    the padded fallback — both match the host zero/inf-pad extraction."""
    cube, var, mask = problem
    nz, ny, nx = cube.shape  # (50, 8, 9)

    def host_window(y0c, x0c, sg):
        h = sg // 2
        exp = np.zeros((nz, sg, sg), np.float32)
        expv = np.full((nz, sg, sg), np.inf, np.float32)
        yy0, xx0 = y0c - h, x0c - h
        sy0, sy1 = max(0, yy0), min(ny, yy0 + sg)
        sx0, sx1 = max(0, xx0), min(nx, xx0 + sg)
        exp[:, sy0 - yy0:sy1 - yy0, sx0 - xx0:sx1 - xx0] = \
            cube[:, sy0:sy1, sx0:sx1]
        expv[:, sy0 - yy0:sy1 - yy0, sx0 - xx0:sx1 - xx0] = \
            var[:, sy0:sy1, sx0:sx1]
        return exp, expv

    for sg in (7, 11):  # 7 <= min(ny, nx): pad-free; 11 > both: fallback
        orig = FakeOrig(cube, var, mask)
        eng = DeviceEngine(orig)
        xs = np.array([0, nx - 1, nx // 2, 1])
        ys = np.array([ny - 1, 0, ny // 2, ny - 2])
        dat, varr = eng.minicubes(xs, ys, sg)
        used_fallback = sg in eng._mini_cache
        assert used_fallback == (sg > min(ny, nx)), sg
        for j, (x0c, y0c) in enumerate(zip(xs, ys)):
            exp, expv = host_window(y0c, x0c, sg)
            np.testing.assert_allclose(np.asarray(dat)[j], exp,
                                       err_msg=f"sg={sg} j={j}")
            np.testing.assert_allclose(np.asarray(varr)[j], expv,
                                       err_msg=f"sg={sg} j={j}")


def test_stream_ingest_matches_eager(tmp_path, monkeypatch):
    """pipeline.ingest slab reads reproduce Cube(filename) exactly, hand
    every float32 z-slab to the upload callbacks in order, and the
    concatenated slabs equal the full arrays (what the engine uploads)."""
    from make_minicube import make_minicube

    from origin_tpu.core.containers import Cube
    from origin_tpu.pipeline.ingest import IngestPlan

    fn = str(tmp_path / "mini.fits")
    make_minicube(fn)
    # small slabs: force several upload hand-offs even on the minicube
    monkeypatch.setattr("origin_tpu.pipeline.ingest._SLAB_BYTES", 10 ** 6)

    plan = IngestPlan.scan(fn)
    assert plan is not None
    got = {"data": [], "var": []}
    cube = plan.read(upload_data=got["data"].append,
                     upload_var=got["var"].append)

    eager = Cube(fn)
    assert plan.shape == tuple(eager.shape) == tuple(cube.shape)
    np.testing.assert_array_equal(np.asarray(cube.data),
                                  np.asarray(eager.data))
    np.testing.assert_array_equal(np.asarray(cube.var),
                                  np.asarray(eager.var))
    np.testing.assert_array_equal(
        np.asarray(cube.mask) if cube.mask is not None else None,
        np.asarray(eager.mask) if eager.mask is not None else None)
    assert len(got["data"]) > 3  # genuinely slabbed
    for kind in ("data", "var"):
        cat = np.concatenate(got[kind], axis=0)
        ref = np.asarray(eager.data if kind == "data" else eager.var,
                         np.float32)
        np.testing.assert_array_equal(cat, ref)
    # coordinates parsed identically to the eager loader
    np.testing.assert_allclose(cube.wave.coord(), eager.wave.coord())
    np.testing.assert_allclose(cube.wcs.cd, eager.wcs.cd)
    # non-streamable layouts bail to the eager reader
    import origin_tpu.fitsio as fitsio

    img = str(tmp_path / "img.fits")
    fitsio.writeto(img, np.zeros((4, 5), np.float32))
    assert IngestPlan.scan(img) is None


def test_estimation_host_cut_sanitize_matches_filled_views(tmp_path):
    """With raw=None/var=None and the device inputs dropped (tight
    full-field state), estimation_line_arrays cuts windows from the RAW
    session cube and zero/inf-fills per window — results must equal the
    filled-full-view path (orig.cube_raw / orig.var), which costs
    several full-cube passes the window path avoids."""
    from make_minicube import make_minicube

    from origin_tpu import ORIGIN
    from origin_tpu.ops.lines import estimation_line_arrays

    fn = str(tmp_path / "m.fits")
    # ny*nx large enough that n*sg^2 < ny*nx routes to the host cut
    make_minicube(fn, nz=120, ny=48, nx=52)
    orig = ORIGIN.init(fn, name="s", path=str(tmp_path), loglevel="ERROR")
    eng = orig.engine
    x0 = np.array([10, 40, 25])
    y0 = np.array([12, 30, 40])
    z0 = np.array([40, 60, 80])
    ref = estimation_line_arrays(x0, y0, z0, orig.cube_raw, orig.var,
                                 orig.PSF, engine=None, batch=4)
    eng.input_cube()  # join the streamed upload, then force the host cut
    eng.drop_inputs("cube", "var", "mask")
    assert not eng.inputs_resident()
    got = estimation_line_arrays(x0, y0, z0, None, None, orig.PSF,
                                 engine=eng, batch=4)
    for k in ref:
        np.testing.assert_allclose(np.asarray(ref[k]), np.asarray(got[k]),
                                   rtol=2e-5, atol=1e-5, err_msg=str(k))
    orig.close_logfile()


def test_masked_invalid_stamp(tmp_path):
    """Loaded/streamed cubes serve masked_invalid from the stamped
    derived mask without re-scanning; replacing data drops the stamp."""
    from origin_tpu.core.containers import Cube

    rng = np.random.default_rng(3)
    data = rng.normal(size=(6, 5, 4)).astype(np.float32)
    data[2, 1, 1] = np.nan
    fn = str(tmp_path / "c.fits")
    Cube(data=data, mask=False, copy=False).write(fn)
    c = Cube(fn)
    assert c._mask_is_nonfinite
    m = c.masked_invalid()
    assert m is c.mask  # served, not recomputed
    np.testing.assert_array_equal(m, ~np.isfinite(data))
    # replacing the data invalidates the shortcut
    c.data = np.zeros_like(data)
    assert not c._mask_is_nonfinite
    assert not c.masked_invalid().any() or c.mask is not None
