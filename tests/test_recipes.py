"""Recipe-form checkpointing: cube_std / cont_dct / cube_faint are stored
as their generators (DCT coefficients + channel means, PCA rank-1 factors)
and rebuilt bit-identically on load (pipeline/recipes.py)."""

import os

import numpy as np
import pytest

from make_minicube import make_minicube

from origin_tpu import ORIGIN
from origin_tpu.pipeline.recipes import is_recipe_file, load_cube


@pytest.fixture(scope="module")
def front_session(tmp_path_factory):
    """Steps 01-04 run + checkpoint, with the host-rebuilt references
    captured before the write."""
    path = tmp_path_factory.mktemp("recipes")
    cube_fn = str(path / "minicube.fits")
    make_minicube(cube_fn)
    orig = ORIGIN.init(cube_fn, name="rec", path=str(path), loglevel="ERROR")
    orig.step01_preprocessing()
    orig.step02_areas(minsize=30, maxsize=60)
    orig.step03_compute_PCA_threshold()
    orig.step04_compute_greedy_PCA()
    refs = {
        name: np.array(getattr(orig, name).data)
        for name in ("cube_std", "cont_dct", "cube_faint")
    }
    orig.write()
    return str(path / "rec"), refs


def test_recipe_files_written(front_session):
    folder, refs = front_session
    kinds = {"cube_std": "dct_std", "cont_dct": "dct_cont",
             "cube_faint": "pca_faint"}
    dense_bytes = refs["cube_std"].nbytes
    for name, kind in kinds.items():
        path = os.path.join(folder, name + ".fits")
        assert is_recipe_file(path) == kind
        # the whole point: the generator file is a small fraction of the cube
        assert os.path.getsize(path) < dense_bytes // 4


def test_recipe_reload_bit_identical(front_session):
    """A restored session rebuilds the three products exactly (the CPU
    rebuild is bit-equal to the live session's host arrays — the
    tight-memory greedy PCA depends on that)."""
    folder, refs = front_session
    orig2 = ORIGIN.load(folder, loglevel="ERROR")
    for name, ref in refs.items():
        np.testing.assert_array_equal(getattr(orig2, name).data, ref,
                                      err_msg=name)


def test_recipe_generic_loader(front_session):
    """load_cube needs no session: the recipe records the raw cube path
    (and pca_faint resolves cube_std from its own directory)."""
    folder, refs = front_session
    for name in ("cube_std", "cont_dct", "cube_faint"):
        cube = load_cube(os.path.join(folder, name + ".fits"))
        np.testing.assert_array_equal(cube.data, refs[name], err_msg=name)
        assert cube.data.dtype == np.float32


def test_refetched_recipe_not_rewritten(front_session):
    """Fetching a parked recipe product and writing again must not
    serialize the dense cube over its own still-valid generator file."""
    folder, refs = front_session
    orig2 = ORIGIN.load(folder, loglevel="ERROR")
    path = os.path.join(folder, "cube_std.fits")
    before = (os.path.getmtime(path), os.path.getsize(path))
    _ = orig2.cube_std.data  # fetch: slot becomes a live rebuilt Cube
    orig2.write()
    assert (os.path.getmtime(path), os.path.getsize(path)) == before
    assert is_recipe_file(path) == "dct_std"


def test_pca_recipe_session_missing_std(front_session, tmp_path):
    """A session whose cube_std product is gone must fall back to the
    recipe directory's cube_std (and fail with a clear OSError when that
    is gone too), not crash on None."""
    import shutil

    from origin_tpu.pipeline.recipes import load_recipe

    folder, refs = front_session
    work = str(tmp_path / "rec")  # keep the basename: <name>.yaml lookup
    shutil.copytree(folder, work)
    orig2 = ORIGIN.load(work, loglevel="ERROR")
    # simulate a partially copied session: the product file vanished, so
    # the session fetch returns None — but the ORIGINAL directory passed
    # to load_recipe still holds it
    os.remove(os.path.join(work, "cube_std.fits"))
    faint = load_recipe(os.path.join(folder, "cube_faint.fits"), orig=orig2)
    np.testing.assert_array_equal(faint.data, refs["cube_faint"])
    # no cube_std anywhere near the recipe: a clear error, not a crash
    shutil.copy(os.path.join(folder, "cube_faint.fits"),
                str(tmp_path / "cube_faint.fits"))
    with pytest.raises(OSError, match="cube_std"):
        load_recipe(str(tmp_path / "cube_faint.fits"), orig=orig2)
    orig2.close_logfile()


def test_recipes_optout(tmp_path, monkeypatch):
    """ORIGIN_TPU_STORE_RECIPES=0 restores dense float32 session files."""
    monkeypatch.setenv("ORIGIN_TPU_STORE_RECIPES", "0")
    cube_fn = str(tmp_path / "minicube.fits")
    make_minicube(cube_fn)
    orig = ORIGIN.init(cube_fn, name="dense", path=str(tmp_path),
                       loglevel="ERROR")
    orig.step01_preprocessing()
    ref = np.array(orig.cube_std.data)
    orig.write()
    path = str(tmp_path / "dense" / "cube_std.fits")
    assert is_recipe_file(path) is None
    from origin_tpu import fitsio

    arr = fitsio.getdata(path)
    assert arr.dtype == np.float32
    np.testing.assert_array_equal(np.nan_to_num(arr), ref)


def test_lazy_recipe_windows_match_eager(front_session):
    """Lazy recipe loading serves window reads without the full rebuild,
    bit-equal to the eagerly-rebuilt cube; a restored session's products
    come back lazy."""
    from origin_tpu.pipeline.recipes import LazyRecipeCube

    folder, refs = front_session
    win = (slice(50, 200), slice(5, 20), slice(4, 18))
    for name, ref in refs.items():
        path = os.path.join(folder, name + ".fits")
        lazycube = load_cube(path, lazy=True)
        assert isinstance(lazycube, LazyRecipeCube)
        assert lazycube.shape == ref.shape
        assert lazycube.dtype == np.float32
        block = np.array(lazycube._region(*win)[0])
        assert lazycube._data_arr is None, name  # no full rebuild
        np.testing.assert_array_equal(block, ref[win], err_msg=name)
        # subcube (the per-source cutout path) stays windowed too
        sub = lazycube.subcube(center=(12.0, 11.0), size=7)
        assert lazycube._data_arr is None, name
        assert sub.shape == (ref.shape[0], 7, 7)
        # full access materializes once and windows then serve from it
        np.testing.assert_array_equal(lazycube.data, ref, err_msg=name)
        np.testing.assert_array_equal(
            lazycube._region(*win)[0], ref[win], err_msg=name)

    # a restored session resolves recipe products lazily
    orig2 = ORIGIN.load(folder, loglevel="ERROR")
    obj = orig2.cube_std
    assert isinstance(obj, LazyRecipeCube)
    np.testing.assert_array_equal(
        np.array(obj._region(*win)[0]), refs["cube_std"][win])
    assert obj._data_arr is None
    orig2.close_logfile()


def test_lazy_recipe_copy_and_negative_index(front_session):
    """Derived-container ops inherited from the base class (copy)
    materialize to plain dense containers, and negative integer indices
    follow numpy semantics on the windowed path (review regressions:
    ``copy()`` raised TypeError re-invoking the lazy constructor with
    ``data=``; ``slice(-1, 0)`` made negative indices empty windows)."""
    from origin_tpu.core.containers import Cube

    folder, refs = front_session
    path = os.path.join(folder, "cube_std.fits")
    lazycube = load_cube(path, lazy=True)
    got = lazycube.copy()
    assert type(got) is Cube
    np.testing.assert_array_equal(got.data, refs["cube_std"])

    lazy2 = load_cube(path, lazy=True)
    plane = lazy2._region(-1, slice(0, 6), slice(2, 8))[0]
    assert lazy2._data_arr is None  # still windowed
    np.testing.assert_array_equal(plane, refs["cube_std"][-1, 0:6, 2:8])
    col = lazy2._region(slice(3, 9), -2, -1)[0]
    assert lazy2._data_arr is None
    # single-spaxel windows route the DCT contraction through a different
    # BLAS micro-kernel, so this degenerate shape is round-off-equal, not
    # bit-equal, to the full rebuild
    np.testing.assert_allclose(col, refs["cube_std"][3:9, -2, -1],
                               rtol=1e-6, atol=1e-7)


def test_pca_lazy_needs_no_raw_cube(front_session, tmp_path):
    """pca_faint rebuilds never read the raw cube: a recipe whose
    recorded raw-cube path is stale still loads lazily as long as
    cube_std is resolvable (review: the lazy path hard-failed on the
    stale path where the eager path did not)."""
    from origin_tpu import fitsio
    from origin_tpu.core.containers import Cube
    from origin_tpu.pipeline.recipes import (_read_pca_payload,
                                             write_pca_recipe)

    folder, refs = front_session
    Cube(data=refs["cube_std"], mask=False).write(
        str(tmp_path / "cube_std.fits"))
    hdus = fitsio.read(os.path.join(folder, "cube_faint.fits"))
    factors = _read_pca_payload(hdus, int(hdus[0].header["RENFACT"]))
    write_pca_recipe(str(tmp_path / "cube_faint.fits"), factors,
                     "/nonexistent/raw.fits")

    lazyf = load_cube(str(tmp_path / "cube_faint.fits"), lazy=True)
    assert lazyf.shape == refs["cube_faint"].shape
    win = (slice(10, 30), slice(2, 9), slice(3, 8))
    np.testing.assert_array_equal(
        np.array(lazyf._region(*win)[0]), refs["cube_faint"][win])
    np.testing.assert_array_equal(lazyf.data, refs["cube_faint"])


def test_sessionless_contexts_shared(front_session):
    """Sessionless lazy loads against the same raw cube share one
    rebuild context, so N per-source re-runs (update_sources) read and
    fill the raw cube once per process, not once per source."""
    folder, refs = front_session
    a = load_cube(os.path.join(folder, "cube_std.fits"), lazy=True)
    b = load_cube(os.path.join(folder, "cont_dct.fits"), lazy=True)
    assert a._ctx is b._ctx
    a._region(slice(0, 5), slice(0, 5), slice(0, 5))
    # the shared context now carries the views for BOTH products
    assert b._ctx._views is not None


def test_assigned_data_survives_write(front_session, tmp_path):
    """Assigning new content to a recipe-backed product then writing the
    session must park it densely — NOT skip the save because the recipe
    file still exists (review: _recipe_current silently dropped the
    assignment, losing the checkpoint)."""
    folder, refs = front_session
    import shutil

    work = str(tmp_path / "rec")  # basename must stay the session name
    shutil.copytree(folder, work)
    orig2 = ORIGIN.load(work, loglevel="ERROR")
    replaced = np.full(refs["cube_std"].shape, 7.5, dtype=np.float32)
    cube = orig2.cube_std
    cube.data = replaced  # lazy recipe cube: setter must drop the stamp
    orig2.write()
    orig2.close_logfile()
    path = os.path.join(work, "cube_std.fits")
    assert is_recipe_file(path) is None, "recipe file not replaced"
    orig3 = ORIGIN.load(work, loglevel="ERROR")
    np.testing.assert_array_equal(orig3.cube_std.data, replaced)
    orig3.close_logfile()


def test_getitem_windows_lazy_recipe(front_session):
    """Indexing a lazy recipe cube (the natural user-facing API) routes
    through the windowed rebuild instead of materializing the full cube
    (review: __getitem__/get_image read .data directly)."""
    folder, refs = front_session
    lazycube = load_cube(os.path.join(folder, "cube_std.fits"), lazy=True)
    sub = lazycube[0:4, 1:7, 2:9]
    assert lazycube._data_arr is None, "__getitem__ forced a full rebuild"
    np.testing.assert_array_equal(sub.data, refs["cube_std"][0:4, 1:7, 2:9])
    img = lazycube[2]
    assert lazycube._data_arr is None
    np.testing.assert_array_equal(img.data, refs["cube_std"][2])
    nb = lazycube.get_image((5, 9), method="sum")
    assert lazycube._data_arr is None, "get_image forced a full rebuild"
    ref = np.nansum(refs["cube_std"][5:10], axis=0)
    np.testing.assert_allclose(nb.data, ref, rtol=1e-6, atol=1e-6)


def test_clear_rebuild_contexts(front_session):
    """clear_rebuild_contexts releases the shared raw-view contexts; the
    next sessionless load builds a fresh one."""
    from origin_tpu.pipeline.recipes import (_CTX_CACHE,
                                             clear_rebuild_contexts)

    folder, refs = front_session
    a = load_cube(os.path.join(folder, "cube_std.fits"), lazy=True)
    assert len(_CTX_CACHE) >= 1
    clear_rebuild_contexts()
    assert len(_CTX_CACHE) == 0
    b = load_cube(os.path.join(folder, "cont_dct.fits"), lazy=True)
    assert b._ctx is not a._ctx
    # both still serve correct windows from their own contexts
    win = (slice(0, 3), slice(0, 5), slice(0, 5))
    np.testing.assert_array_equal(a._region(*win)[0],
                                  refs["cube_std"][win])
    np.testing.assert_array_equal(b._region(*win)[0],
                                  refs["cont_dct"][win])
