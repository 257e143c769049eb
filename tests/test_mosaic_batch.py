"""End-to-end test of tools/mosaic_batch.py (BASELINE config 5).

Drives the overlapped ingest/compute loop on a 2x2 synthetic grid over the
8-virtual-device CPU mesh and checks (a) per-field detection counts equal
the unsharded-batch single-field runs on the same spatial tiling, and
(b) the ingest of batch N+1 actually overlaps the compute of batch N.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from make_minicube import make_minicube  # noqa: E402 (tests/ on sys.path)

import mosaic_batch  # noqa: E402

from origin_tpu.core import MoffatFSF
from origin_tpu.core.profiles import gaussian_profile
from origin_tpu.parallel import ShardedPipeline, make_mesh
from origin_tpu.parallel.mesh import sharded_detect


@pytest.fixture(scope="module")
def grid(tmp_path_factory):
    """A 2x2 grid of small synthetic fields on disk."""
    workdir = tmp_path_factory.mktemp("mosaic_grid")
    nz, ny, nx = 120, 24, 20
    paths = []
    for i in range(4):
        fn = str(workdir / f"field_{i:02d}.fits")
        make_minicube(fn, nz=nz, ny=ny, nx=nx, seed=100 + i)
        paths.append(fn)
    return paths, (nz, ny, nx)


@pytest.fixture(scope="module")
def instrument(grid):
    _, (nz, ny, nx) = grid
    fsf = MoffatFSF(fwhm_pol=[-0.2, 0.7], beta_pol=[2.8], pixstep=0.2)
    psf = fsf.get_3darray(
        np.linspace(4750, 9300, nz), (7, 7)
    ).astype(np.float32)
    profiles = [gaussian_profile(f, 41, 20) for f in (2.0, 6.7)]
    thresholds = np.linspace(1.0, 8.0, 12)
    return psf, profiles, thresholds


def test_batch_counts_match_single_field_runs(grid, instrument):
    """Every field's threshold-scan counts from the overlapped dp=2 batch
    loop equal its own single-field run on the same sp=4 spatial tiling."""
    paths, (nz, ny, nx) = grid
    psf, profiles, thresholds = instrument

    mesh = make_mesh(8, dp=2)  # dp=2 x sp=4
    pipe = ShardedPipeline(mesh, nz, ny, nx, psf, profiles,
                           thresholds=thresholds)
    results = mosaic_batch.run_batches(pipe, paths, dp=2)

    assert [p for p, _ in results] == paths  # input order preserved
    ref_mesh = make_mesh(4, dp=1)  # same sp=4 tiling, no data parallelism
    for p, counts in results:
        cubes, variances, masks = mosaic_batch.load_fields([p])
        _, _, cmax_ref, _ = sharded_detect(
            ref_mesh, cubes[0], variances[0], masks[0], psf, profiles,
            thresholds=thresholds,
        )
        np.testing.assert_array_equal(np.asarray(counts), cmax_ref)
        assert int(np.asarray(counts)[0]) > 0  # non-trivial detection scan


def test_odd_field_count_pads_last_batch(grid, instrument):
    """3 fields over dp=2: the padded duplicate's results are discarded
    and every real field keeps its own counts."""
    paths, (nz, ny, nx) = grid
    psf, profiles, thresholds = instrument
    mesh = make_mesh(8, dp=2)
    pipe = ShardedPipeline(mesh, nz, ny, nx, psf, profiles,
                           thresholds=thresholds)
    res3 = mosaic_batch.run_batches(pipe, paths[:3], dp=2)
    res4 = mosaic_batch.run_batches(pipe, paths, dp=2)
    assert [p for p, _ in res3] == paths[:3]
    for (p3, c3), (p4, c4) in zip(res3, res4[:3]):
        assert p3 == p4
        np.testing.assert_array_equal(np.asarray(c3), np.asarray(c4))


def test_ingest_overlaps_compute(grid, instrument):
    """The FITS ingest of batch N+1 starts before the compute of batch N
    finishes (the loop's reason to exist)."""
    paths, (nz, ny, nx) = grid
    psf, profiles, thresholds = instrument
    mesh = make_mesh(8, dp=2)
    pipe = ShardedPipeline(mesh, nz, ny, nx, psf, profiles,
                           thresholds=thresholds)

    events = []
    mosaic_batch.run_batches(pipe, paths, dp=2,
                             on_event=lambda *ev: events.append(ev))
    t = {(kind, idx): when for kind, idx, when in events}
    # batch 1's ingest is submitted before batch 0's compute starts, and
    # must have STARTED (on the ingest thread) before that compute ended
    assert t[("ingest_start", 1)] < t[("compute_done", 0)]
    # ordering sanity: each batch computes only after its ingest finished
    for bi in range(2):
        assert t[("ingest_done", bi)] <= t[("compute_start", bi)]
