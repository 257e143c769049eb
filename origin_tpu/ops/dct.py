"""DCT continuum estimation.

TPU re-design of the reference's per-spaxel Python loop
(lib_origin.py:149-240, `dct_residual`): the variance-weighted GLS continuum

    C_s = D (D^T Sigma_s^-1 D)^-1 D^T Sigma_s^-1 S_s

is evaluated for *all* spaxels at once as a batched Cholesky solve.  The
(order+1 x order+1) normal matrices are built with one big matmul over the
spectral axis (MXU work), instead of ~Ny*Nx Python-level 11x11 inversions.

Spaxels with any masked channel fall back to the unweighted projection
C = D D^T S (reference lib_origin.py:231-238).  Because the DCT basis is
orthonormal, this is exactly the GLS solution with unit weights, so a single
code path handles both cases: set the inverse variance to 1 on those spaxels.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["dctmat", "dct_residual"]


def dctmat(nl, order, dtype=np.float32):
    """Orthonormal DCT-II basis matrix of shape (nl, order+1).

    Same convention as Octave's dctmtx (reference lib_origin.py:127-146).
    """
    yy, xx = np.mgrid[:nl, : order + 1]
    d0 = np.sqrt(2.0 / nl) * np.cos((yy + 0.5) * (np.pi / nl) * xx)
    d0[:, 0] /= np.sqrt(2.0)
    return d0.astype(dtype)


@partial(jax.jit, static_argnames=("order", "approx", "with_coef"))
def dct_residual(w_raw, order, var=None, approx=False, mask=None,
                 with_coef=False):
    """Continuum cube estimated by a low-order DCT fit.

    Parameters
    ----------
    w_raw : (Nz, Ny, Nx) array
        Data cube (masked voxels are expected to be finite, e.g. 0).
    order : int
        Number of DCT atoms to keep minus one.
    var : (Nz, Ny, Nx) array or None
        Per-voxel variance; if None or ``approx``, the unweighted projection
        is used.
    approx : bool
        Ignore the variance.
    mask : (Nz, Ny, Nx) bool array or None
        True where voxels are invalid; spaxels with any invalid voxel use the
        unweighted projection.
    with_coef : bool
        Also return the (order+1, Ny, Nx) basis coefficients.  They are
        tiny (~k/Nz of the cube) and let a host rebuild the continuum as
        ``D @ coef`` instead of transferring the full cube.

    Returns
    -------
    (Nz, Ny, Nx) array: the continuum; with ``with_coef``, the tuple
    ``(continuum, coefficients)``.
    """
    nl = w_raw.shape[0]
    d0 = jnp.asarray(dctmat(nl, order), dtype=w_raw.dtype)
    hi = jax.lax.Precision.HIGHEST

    if approx or var is None:
        coef = jnp.einsum("zi,zyx->iyx", d0, w_raw, precision=hi)
        cont = jnp.einsum("zi,iyx->zyx", d0, coef, precision=hi)
        return (cont, coef) if with_coef else cont

    ivar = 1.0 / var
    if mask is not None:
        valid = ~jnp.any(mask, axis=0)
        ivar = jnp.where(valid[None], ivar, 1.0)
    ivar = jnp.where(jnp.isfinite(ivar), ivar, 0.0)

    # normal matrices A_s = D^T diag(ivar_s) D for every spaxel, as one
    # matmul over z: A[y,x,i,j] = sum_z ivar[z,y,x] * D[z,i] * D[z,j]
    nz, ny, nx = w_raw.shape
    k = order + 1
    dd = (d0[:, :, None] * d0[:, None, :]).reshape(nz, k * k)  # (Nz, k^2)
    a = jnp.einsum("zq,zyx->yxq", dd, ivar, precision=hi).reshape(ny, nx, k, k)
    b = jnp.einsum("zi,zyx->yxi", d0, w_raw * ivar, precision=hi)
    coef = jax.scipy.linalg.cho_solve(
        (jnp.linalg.cholesky(a), True), b[..., None]
    )[..., 0]
    cont = jnp.einsum("zi,yxi->zyx", d0, coef, precision=hi)
    if with_coef:
        return cont, jnp.moveaxis(coef, -1, 0)
    return cont
