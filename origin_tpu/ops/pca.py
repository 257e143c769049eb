"""Greedy iterative PCA nuisance removal.

TPU re-design of reference lib_origin.py:768-954 (`Compute_GreedyPCA` /
`Compute_GreedyPCA_area`).  The reference's data-dependent Python loop
(shrinking nuisance set, ARPACK rank-1 svds per iteration) becomes:

- a fixed-shape `lax.while_loop` over a (Nz, Npix_pad) area matrix with a
  validity mask instead of a shrinking column set;
- a deterministic power iteration for the dominant left singular vector
  (k=1 is all the reference ever asks of ARPACK, and the nuisance spectrum
  is strongly dominant, so the power method converges in a few matvecs);
- the "faintest background spectra" selection via a rank computation
  (argsort-of-argsort) and a weighted column mean, instead of fancy
  indexing with dynamic sizes.

Areas are processed by a thin host loop that pads each area's pixel count to
a bucket size so the kernel is compiled only a handful of times per cube.

Semantics note: the reference selects the background-estimation columns by
indexing the *uncompressed* cube with indices computed on the compressed
positive-test vector (lib_origin.py:908-917).  Both agree whenever no spaxel
has a zero test value, which holds inside areas (areas only cover exposed
spaxels); we implement the well-defined variant (rank among columns with
0 < test <= threshold).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .stats import compute_thresh_gaussfit

__all__ = [
    "rank1_left_vector",
    "greedy_pca",
    "greedy_pca_by_area",
    "compute_pca_threshold",
]


def rank1_left_vector(m, iters=200, tol=1e-7):
    """Dominant left singular vector of m (nz, np) by power iteration.

    The tolerance is deliberately at the float32 floor (the alignment
    change ``1 - |<u', u>|`` stalls ~2e-6 on noisy spectra, so the loop
    usually runs its full budget): the reference extracts this vector
    with ARPACK ``svds`` at machine precision (reference
    lib_origin.py:940), and a relaxed 1e-5 tolerance — measured 1.6x
    faster per greedy-PCA step — was REJECTED because it perturbs
    detection counts on the golden catalog (see the PCA audit in
    docs/benchmarks.md).  The matvecs themselves run at ~93% of HBM
    bandwidth, so at fixed fidelity this loop is at its roofline.
    """
    eps = jnp.asarray(1e-30, m.dtype)
    colnorm = jnp.sum(m * m, axis=0)
    u0 = m[:, jnp.argmax(colnorm)]
    u0 = u0 / (jnp.linalg.norm(u0) + eps)

    def cond(state):
        _, delta, it = state
        return (it < iters) & (delta > tol)

    def body(state):
        u, _, it = state
        v = m.T @ u
        u2 = m @ v
        u2 = u2 / (jnp.linalg.norm(u2) + eps)
        delta = 1.0 - jnp.abs(jnp.vdot(u2, u))
        return u2, delta, it + 1

    u, _, _ = jax.lax.while_loop(cond, body, (u0, jnp.asarray(1.0, m.dtype), 0))
    return u


@partial(jax.jit, static_argnames=("itermax", "record_factors"))
def greedy_pca(cube, valid, test0, thres, noise_population=50.0, itermax=100,
               record_factors=False):
    """Greedy PCA on one (padded) area.

    Parameters
    ----------
    cube : (Nz, Np) float32
        Standardized spectra of the area; padded columns must be zero.
    valid : (Np,) bool
        True for real columns, False for padding.
    test0 : (Np,) float32
        Initial O2 test values (from the PCA-threshold step).
    thres : float
        O2 threshold separating nuisance (test > thres) from background.
    noise_population : float
        The faintest ``1/noise_population`` fraction of passing spectra
        forms the background signature.
    itermax : int
        Maximum number of iterations.
    record_factors : bool
        Also return the removed rank-1 factors ``(U, C)`` such that
        ``faint == cube - U @ C`` (up to f32 re-summation order): every
        iteration subtracts ``outer(u, u @ faint)``, so recording
        ``U[:, i] = u_i`` and ``C[i] = u_i @ faint_i`` captures the whole
        cleaning as ``itermax`` small factors.  Lets hosts rebuild the
        cleaned cube from the standardized cube plus a few MB of factors
        instead of transferring a full cube.

    Returns
    -------
    faint : (Nz, Np) cleaned spectra
    mapO2 : (Np,) int32 iteration count per spaxel
    nstop : int32 1 if the iteration cap was hit, else 0
    U, C : (Nz, itermax) / (itermax, Np), only when ``record_factors``
    """
    nz, npix = cube.shape
    test0 = jnp.where(valid, test0, 0.0)

    def pypx_of(test):
        return (test > thres) & valid

    def cond(state):
        return (~state[5]) & jnp.any(pypx_of(state[1]))

    def body(state):
        faint, test, mapo2, nbiter, nstop, done = state[:6]
        pypx = pypx_of(test)
        npyp = jnp.sum(pypx)
        nbiter = nbiter + 1
        mapo2 = mapo2 + pypx.astype(jnp.int32)
        over = nbiter > itermax

        # background signature: mean of the nb faintest passing spectra
        passing = valid & (test > 0) & (test <= thres)
        npass = jnp.sum(passing)
        nb = 1 + (npass / noise_population).astype(jnp.int32)
        key = jnp.where(passing, test, jnp.inf)
        order = jnp.argsort(key)
        ranks = jnp.zeros(npix, dtype=jnp.int32).at[order].set(
            jnp.arange(npix, dtype=jnp.int32)
        )
        w = ((ranks < nb) & passing).astype(faint.dtype)
        b = (faint @ w) / jnp.maximum(jnp.sum(w), 1.0)

        # nuisance block, orthogonalized against the background signature
        xr = jnp.where(pypx[None, :], faint, 0.0)
        xr = xr - jnp.outer(b, b @ xr)
        xr = xr / jnp.sum(b * b)

        single = npyp == 1  # reference bails out before the SVD here

        u = rank1_left_vector(xr)
        c = u @ faint
        faint_new = faint - jnp.outer(u, c)
        test_new = jnp.where(valid, jnp.mean(faint_new * faint_new, axis=0), 0.0)

        keep = over | single
        faint = jnp.where(keep, faint, faint_new)
        test = jnp.where(keep, test, test_new)
        nstop = nstop + over.astype(jnp.int32)
        out = (faint, test, mapo2, nbiter, nstop, keep)
        if record_factors:
            u_mat, c_mat = state[6:]
            u_eff = jnp.where(keep, 0.0, u)
            c_eff = jnp.where(keep, 0.0, c)
            it = nbiter - 1  # == itermax only when over (u_eff zero anyway)
            u_mat = u_mat.at[:, it].set(u_eff, mode="drop")
            c_mat = c_mat.at[it].set(c_eff, mode="drop")
            out = out + (u_mat, c_mat)
        return out

    state = (
        cube,
        test0,
        jnp.zeros(npix, dtype=jnp.int32),
        jnp.asarray(0, jnp.int32),
        jnp.asarray(0, jnp.int32),
        jnp.asarray(False),
    )
    if record_factors:
        state = state + (
            jnp.zeros((nz, itermax), cube.dtype),
            jnp.zeros((itermax, npix), cube.dtype),
        )
    state = jax.lax.while_loop(cond, body, state)
    faint, _, mapo2, _, nstop, _ = state[:6]
    if record_factors:
        return faint, mapo2, nstop, state[6], state[7]
    return faint, mapo2, nstop


def _bucket(n, minimum=128):
    """Round n up to a power of two (>= minimum) to bound recompilation."""
    b = minimum
    while b < n:
        b *= 2
    return b


def greedy_pca_by_area(
    cube_std, areamap, thresholds, testO2, noise_population=50.0, itermax=100
):
    """Run the greedy PCA independently on every area (host orchestration).

    Mirrors reference Compute_GreedyPCA_area (lib_origin.py:768-821).

    Parameters
    ----------
    cube_std : (Nz, Ny, Nx) numpy array
    areamap : (Ny, Nx) int array with labels 1..NbArea
    thresholds : sequence of per-area thresholds
    testO2 : sequence of per-area O2 test vectors (one value per area pixel,
        in the order produced by ``areamap == a`` boolean indexing)

    Returns (cube_faint, mapO2, nstop).
    """
    cube_std = np.asarray(cube_std, dtype=np.float32)
    nz = cube_std.shape[0]
    cube_faint = cube_std.copy()
    mapO2 = np.zeros(cube_std.shape[1:], dtype=np.int32)
    nstop = 0
    nb_area = int(np.max(areamap))
    for area in range(1, nb_area + 1):
        sel = areamap == area
        npx = int(sel.sum())
        if npx == 0:
            continue
        cols = cube_std[:, sel]
        pad = _bucket(npx)
        cube_pad = np.zeros((nz, pad), dtype=np.float32)
        cube_pad[:, :npx] = cols
        valid = np.zeros(pad, dtype=bool)
        valid[:npx] = True
        test_pad = np.zeros(pad, dtype=np.float32)
        test_pad[:npx] = np.asarray(testO2[area - 1], dtype=np.float32)
        thr = float(thresholds[area - 1])
        faint, m, k = greedy_pca(
            jnp.asarray(cube_pad),
            jnp.asarray(valid),
            jnp.asarray(test_pad),
            thr,
            noise_population=float(noise_population),
            itermax=int(itermax),
        )
        cube_faint[:, sel] = np.asarray(faint)[:, :npx]
        mapO2[sel] = np.asarray(m)[:npx]
        nstop += int(k)
    return cube_faint, mapO2, nstop


def compute_pca_threshold(cube_area, pfa):
    """O2 test + Gaussian-fit threshold for one area.

    Mirrors reference Compute_PCA_threshold (lib_origin.py:824-845).
    Returns (test, hist, bins, thres, mea, std).
    """
    cube_area = np.asarray(cube_area, dtype=np.float64)
    test = np.mean(cube_area ** 2, axis=0)
    hist, bins, thres, mea, std = compute_thresh_gaussfit(test, pfa)
    return test, hist, bins, thres, mea, std
