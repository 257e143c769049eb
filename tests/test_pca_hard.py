"""Adversarial greedy-PCA parity tests (VERDICT round 1, item 7).

The easy-input parity tests live in tests/test_ops.py; this file stresses the
JAX kernel (origin_tpu.ops.pca.greedy_pca) against the float64 numpy/ARPACK
oracle (tests/oracle.py) on inputs shaped like the hard parts of real MUSE
cubes — correlated continua, near-degenerate leading singular values, the
single-nuisance-column bail-out, the itermax path, and large (>1k-pixel)
areas.  Reference semantics: lib_origin.py:848-954.

Tolerances (documented, not aspirational): the kernel runs float32 with a
power iteration; the oracle runs float64 with ARPACK.  On well-separated
spectra the per-voxel drift of the cleaned cube stays below 2e-3 of the data
scale.  On *near-degenerate* leading pairs the subtracted eigenvector is only
defined up to the degenerate subspace, so we assert subspace agreement and
catalog-level equivalence (the set of spaxels flagged as nuisance per
iteration — mapO2 — and the final O2 pass/fail sets), not per-voxel equality.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from oracle import greedy_pca_oracle
from origin_tpu.ops.pca import greedy_pca, rank1_left_vector


def _run_kernel(cube, test, thres, noise_population=50.0, itermax=100):
    nz, npix = cube.shape
    faint, mapo2, nstop = greedy_pca(
        jnp.asarray(cube, jnp.float32),
        jnp.ones(npix, bool),
        jnp.asarray(test, jnp.float32),
        float(thres),
        noise_population=float(noise_population),
        itermax=int(itermax),
    )
    return np.asarray(faint), np.asarray(mapo2), int(nstop)


def _correlated_cube(rng, nz=300, npix=500, n_cont=3, n_bright=40,
                     cont_scale=1.0, seedphase=0.0):
    """Spectra sharing a few smooth continuum components + bright emitters.

    This is the nuisance structure the greedy PCA exists for: a low-rank
    correlated continuum across all spaxels, with a subset of spaxels bright
    enough to fail the O2 test.
    """
    z = np.linspace(0.0, 1.0, nz)
    basis = np.stack(
        [np.cos(np.pi * (k + 1) * z + seedphase + 0.3 * k) for k in range(n_cont)]
    )  # (n_cont, nz), smooth & correlated
    amps = rng.normal(scale=cont_scale, size=(n_cont, npix))
    amps[0] = np.abs(amps[0]) + 0.5  # shared positive continuum level
    cube = basis.T @ amps  # (nz, npix)
    # bright nuisance spaxels: strong continuum boost
    bright = rng.choice(npix, size=n_bright, replace=False)
    cube[:, bright] += 4.0 * (basis.T @ np.abs(rng.normal(size=(n_cont, n_bright))))
    cube += rng.normal(scale=0.3, size=(nz, npix))
    return cube.astype(np.float32), bright


def _parity_case(cube, thres, noise_population=50.0, itermax=100,
                 atol=2e-3):
    test = np.mean(cube.astype(np.float64) ** 2, axis=0)
    f_j, m_j, s_j = _run_kernel(cube, test, thres, noise_population, itermax)
    f_o, m_o, s_o = greedy_pca_oracle(
        cube.astype(np.float64), test, thres, noise_population, itermax
    )
    return (f_j, m_j, s_j), (f_o, m_o, s_o), test


def test_correlated_continuum_parity(rng):
    cube, bright = _correlated_cube(rng)
    test = np.mean(cube.astype(np.float64) ** 2, axis=0)
    thres = float(np.percentile(test, 85.0))

    (f_j, m_j, s_j), (f_o, m_o, s_o), test = _parity_case(cube, thres)

    # the iteration trace is the semantics: it must match exactly
    np.testing.assert_array_equal(m_j, m_o)
    assert s_j == s_o == 0
    assert m_j.max() >= 2, "case too easy — nuisance removed in one pass"
    # nearly all injected bright spaxels were treated as nuisance (a couple
    # can land below the percentile threshold by construction)
    assert (m_j[bright] >= 1).mean() > 0.9
    scale = np.abs(f_o).max()
    np.testing.assert_allclose(f_j, f_o, atol=2e-3 * scale)
    # catalog-level equivalence: identical final pass/fail set
    t_j = np.mean(f_j.astype(np.float64) ** 2, axis=0)
    t_o = np.mean(f_o ** 2, axis=0)
    np.testing.assert_array_equal(t_j > thres, t_o > thres)


def test_single_nuisance_column_bailout(rng):
    """Exactly one column above threshold: the reference breaks before the
    SVD (lib_origin.py:934-938), leaving the cube untouched but counting the
    iteration in mapO2."""
    cube = rng.normal(size=(120, 64)).astype(np.float32)
    cube[:, 7] *= 30.0
    test = np.mean(cube.astype(np.float64) ** 2, axis=0)
    thres = float(np.sort(test)[-2] * 1.5)  # only column 7 above

    (f_j, m_j, s_j), (f_o, m_o, s_o), _ = _parity_case(cube, thres)
    np.testing.assert_array_equal(m_j, m_o)
    expected = np.zeros(64, dtype=np.int32)
    expected[7] = 1
    np.testing.assert_array_equal(m_j, expected)
    assert s_j == s_o == 0
    # both must leave the data untouched
    np.testing.assert_array_equal(f_o, cube.astype(np.float64))
    np.testing.assert_array_equal(f_j, cube)


def test_itermax_bailout(rng):
    """A threshold low enough that the nuisance set never empties: both
    implementations must hit the cap, count one stop, and agree on the trace."""
    cube, _ = _correlated_cube(rng, nz=200, npix=256, n_bright=30)
    test = np.mean(cube.astype(np.float64) ** 2, axis=0)
    thres = float(np.percentile(test, 5.0))  # 95% of spaxels are "nuisance"
    itermax = 5

    (f_j, m_j, s_j), (f_o, m_o, s_o), _ = _parity_case(
        cube, thres, itermax=itermax
    )
    assert s_j == s_o == 1
    np.testing.assert_array_equal(m_j, m_o)
    assert m_j.max() == itermax + 1  # the bail-out iteration still counts
    scale = np.abs(f_o).max()
    np.testing.assert_allclose(f_j, f_o, atol=2e-3 * scale)


def test_large_area_parity(rng):
    """>1k-pixel area (real CreateAreas output sizes) with correlated
    continua; exact trace + final-set agreement."""
    cube, _ = _correlated_cube(rng, nz=300, npix=2048, n_bright=120)
    test = np.mean(cube.astype(np.float64) ** 2, axis=0)
    thres = float(np.percentile(test, 88.0))

    (f_j, m_j, s_j), (f_o, m_o, s_o), _ = _parity_case(cube, thres)
    np.testing.assert_array_equal(m_j, m_o)
    assert s_j == s_o == 0
    t_j = np.mean(f_j.astype(np.float64) ** 2, axis=0)
    t_o = np.mean(f_o ** 2, axis=0)
    np.testing.assert_array_equal(t_j > thres, t_o > thres)
    scale = np.abs(f_o).max()
    np.testing.assert_allclose(f_j, f_o, atol=2e-3 * scale)


def test_power_iteration_vs_arpack_separated(rng):
    """Well-separated leading singular value: power iteration must match
    ARPACK's left vector to ~1e-5 in alignment."""
    from scipy.sparse.linalg import svds

    nz, npix = 200, 300
    u_true = rng.normal(size=nz)
    u_true /= np.linalg.norm(u_true)
    v1 = rng.normal(size=npix)
    m = 10.0 * np.outer(u_true, v1) + rng.normal(size=(nz, npix))
    u_a, _, _ = svds(m.astype(np.float64), k=1)
    u_p = np.asarray(rank1_left_vector(jnp.asarray(m, jnp.float32)))
    align = abs(float(u_p @ u_a[:, 0]))
    assert align > 1.0 - 1e-5


def test_power_iteration_vs_arpack_near_degenerate(rng):
    """Near-degenerate leading pair (s1/s2 = 1.02): the individual vectors
    may differ, but both must lie in the shared leading 2-subspace, and the
    measured divergence is documented by the assertion bounds."""
    from scipy.sparse.linalg import svds

    nz, npix = 200, 300
    q, _ = np.linalg.qr(rng.normal(size=(nz, 2)))
    p, _ = np.linalg.qr(rng.normal(size=(npix, 2)))
    m = 10.2 * np.outer(q[:, 0], p[:, 0]) + 10.0 * np.outer(q[:, 1], p[:, 1])
    m += 0.01 * rng.normal(size=(nz, npix))
    u_a = svds(m.astype(np.float64), k=2)[0]  # leading 2-subspace
    u_p = np.asarray(rank1_left_vector(jnp.asarray(m, jnp.float32)))
    # projection of the power vector onto the ARPACK 2-subspace
    in_subspace = np.linalg.norm(u_a.T @ u_p)
    assert in_subspace > 1.0 - 1e-4
    # and it prefers the true leading direction despite the 2% gap
    align_lead = abs(float(u_p @ q[:, 0]))
    assert align_lead > 0.99


def test_near_degenerate_cube_catalog_equivalence(rng):
    """A cube whose nuisance block has two nearly-equal leading components:
    per-voxel outputs may drift (eigenvector rotation within the degenerate
    subspace), but the iteration trace and the final nuisance set must agree
    with the oracle."""
    nz, npix = 250, 400
    z = np.linspace(0, 1, nz)
    c1 = np.cos(np.pi * z)
    c2 = np.sin(2 * np.pi * z)
    c1 /= np.linalg.norm(c1)
    c2 /= np.linalg.norm(c2)
    cube = rng.normal(scale=0.3, size=(nz, npix))
    bright = rng.choice(npix, size=30, replace=False)
    half = len(bright) // 2
    # two bright families of almost identical total power
    cube[:, bright[:half]] += 3.00 * c1[:, None]
    cube[:, bright[half:]] += 2.97 * c2[:, None]
    cube = cube.astype(np.float32)

    test = np.mean(cube.astype(np.float64) ** 2, axis=0)
    thres = float(np.percentile(test, 90.0))
    (f_j, m_j, s_j), (f_o, m_o, s_o), _ = _parity_case(cube, thres)

    np.testing.assert_array_equal(m_j, m_o)
    assert s_j == s_o
    t_j = np.mean(f_j.astype(np.float64) ** 2, axis=0)
    t_o = np.mean(f_o ** 2, axis=0)
    np.testing.assert_array_equal(t_j > thres, t_o > thres)
