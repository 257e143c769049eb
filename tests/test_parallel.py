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
