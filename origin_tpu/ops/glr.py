"""GLR matched-filter test (T_GLR): the FLOP-dominant kernel of the pipeline.

TPU re-design of reference lib_origin.py:1069-1217 (`Correlation_GLR_test`):

1.  Spatial stage: every spectral channel is convolved with its
    wavelength-dependent zero-mean FSF (and the weight map with FSF^2 for the
    norm).  The reference farms channels to a joblib process pool; here the
    whole cube is one batched 2-D real-FFT convolution on device.
2.  Spectral stage: the cube and norm are FFT'd once along z.  Each profile
    of the dictionary is pre-trimmed (pcut), L2-normalized, mean-subtracted
    and *circularly pre-shifted* so that a plain circular convolution yields
    the centred 'same' result at [0:Nz] — this removes the per-profile
    dynamic output slicing of the reference (lib_origin.py:1178-1181) and
    makes the profile sweep a single `lax.scan` with running max / argmax /
    min accumulators (no K materialized cubes, mirroring
    lib_origin.py:1204-1213).

The spectral axis is kept innermost on device so the XLA FFT operates on the
fastest-varying dimension.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from scipy.fft import next_fast_len

from .convolve import fft2_shape, fftconvolve2d_same

__all__ = ["prepare_profiles", "correlation_glr_test", "glr_spatial", "glr_spectral"]


def prepare_profiles(profiles, pcut=1e-8, pmeansub=True):
    """Trim, normalize and mean-subtract the profile dictionary (host).

    Follows reference lib_origin.py:1153-1165: each profile is cut to the
    symmetric support where it exceeds ``pcut`` around its peak, then
    L2-normalized, then (optionally) mean-subtracted.

    Returns a list of (trimmed_profile, center_index) pairs where
    center = (len-1)//2 is the offset of the 'same' convolution.
    """
    out = []
    for prof in profiles:
        prof = np.asarray(prof, dtype=np.float64).copy()
        if pcut is not None:
            lpeak = int(prof.argmax())
            above = np.where(prof >= pcut)[0]
            lw = int(np.max(np.abs(above[[0, -1]] - lpeak)))
            lo = max(0, lpeak - lw)
            prof = prof[lo : lpeak + lw + 1]
        prof = prof / np.linalg.norm(prof)
        if pmeansub:
            prof = prof - prof.mean()
        out.append((prof, (len(prof) - 1) // 2))
    return out


def _pack_profiles(prepped, fshape):
    """Stack trimmed profiles into circularly-shifted padded buffers.

    Element j of a profile with center c lands at index (j - c) mod fshape,
    so that irfft(rfft(buf) * rfft(x))[0:Nz] is the centred 'same' linear
    convolution (valid while fshape >= Nz + len(prof) - 1).
    """
    k = len(prepped)
    buf = np.zeros((k, fshape), dtype=np.float32)
    buf2 = np.zeros((k, fshape), dtype=np.float32)
    for i, (prof, c) in enumerate(prepped):
        idx = (np.arange(len(prof)) - c) % fshape
        buf[i, idx] = prof
        buf2[i, idx] = prof ** 2
    return buf, buf2


@partial(jax.jit, static_argnames=("fshape2",))
def glr_spatial(cube, psfs, wmaps, fshape2):
    """Spatial FSF stage: returns (cube_fsf, norm_fsf), each (Nz, Ny, Nx).

    ``psfs`` is (F, Nz, P, P); ``wmaps`` is (F, Ny, Nx) or None for a single
    field.  Matches reference _convolve_fsf (lib_origin.py:1027-1043):
    correlate with the flipped zero-mean FSF; norm = conv of the (weighted)
    ones with FSF^2.
    """
    nfields = psfs.shape[0]
    cube_fsf = None
    norm_fsf = None
    for nf in range(nfields):
        kern = psfs[nf][:, ::-1, ::-1]
        kern = kern - jnp.mean(kern, axis=(1, 2), keepdims=True)
        if wmaps is None:
            data = cube
            ones = jnp.ones_like(cube)
        else:
            data = cube * wmaps[nf][None]
            ones = jnp.broadcast_to(wmaps[nf][None], cube.shape)
        c = fftconvolve2d_same(data, kern, fshape2)
        n = fftconvolve2d_same(ones, kern * kern, fshape2)
        cube_fsf = c if cube_fsf is None else cube_fsf + c
        norm_fsf = n if norm_fsf is None else norm_fsf + n
    return cube_fsf, norm_fsf


@partial(jax.jit, static_argnames=("fshape", "nz"))
def glr_spectral(cube_fsf, norm_fsf, prof_buf, prof2_buf, fshape, nz):
    """Spectral matched-filter sweep with running max/argmax/min.

    Inputs are (Nz, Ny, Nx); internally transposed to put z innermost.
    Returns (correl, profile_idx uint8, correl_min), each (Nz, Ny, Nx).
    """
    ny, nx = cube_fsf.shape[1:]
    x = cube_fsf.reshape(nz, ny * nx).T  # (S, Nz)
    n = norm_fsf.reshape(nz, ny * nx).T
    xf = jnp.fft.rfft(x, fshape, axis=-1)
    nf = jnp.fft.rfft(n, fshape, axis=-1)
    pf = jnp.fft.rfft(prof_buf, fshape, axis=-1)
    p2f = jnp.fft.rfft(prof2_buf, fshape, axis=-1)

    s = ny * nx
    init = (
        jnp.full((s, nz), -jnp.inf, dtype=jnp.float32),
        jnp.full((s, nz), jnp.inf, dtype=jnp.float32),
        jnp.zeros((s, nz), dtype=jnp.uint8),
    )

    def body(carry, inp):
        correl, correl_min, profile = carry
        k, pfk, p2fk = inp
        cp = jnp.fft.irfft(xf * pfk[None], fshape, axis=-1)[:, :nz]
        norm = jnp.fft.irfft(nf * p2fk[None], fshape, axis=-1)[:, :nz]
        norm = jnp.where(norm <= 0, jnp.inf, jnp.sqrt(norm))
        t = cp / norm
        profile = jnp.where(t > correl, k.astype(jnp.uint8), profile)
        correl = jnp.maximum(correl, t)
        correl_min = jnp.minimum(correl_min, t)
        return (correl, correl_min, profile), None

    ks = jnp.arange(prof_buf.shape[0], dtype=jnp.uint8)
    (correl, correl_min, profile), _ = jax.lax.scan(body, init, (ks, pf, p2f))
    reshape = lambda a: a.T.reshape(nz, ny, nx)
    return reshape(correl), reshape(profile), reshape(correl_min)


def correlation_glr_test(cube, fsf, weights, profiles, pcut=1e-8, pmeansub=True):
    """Full GLR test: host orchestrator around the two device stages.

    Parameters mirror reference Correlation_GLR_test (lib_origin.py:1069):
    ``fsf`` is one (Nz,P,P) PSF cube or a list of them (mosaic), ``weights``
    the per-field weight maps or None, ``profiles`` the spectral dictionary.

    Returns numpy arrays (correl, profile, correl_min).
    """
    cube = np.asarray(cube, dtype=np.float32)
    nz, ny, nx = cube.shape
    if weights is None:
        psfs = np.asarray(fsf, dtype=np.float32)
        if psfs.ndim == 3:
            psfs = psfs[None]
        wmaps = None
    else:
        psfs = np.stack([np.asarray(p, dtype=np.float32) for p in fsf])
        wmaps = np.stack([np.asarray(w, dtype=np.float32) for w in weights])

    fshape2 = fft2_shape((ny, nx), psfs.shape[-2:])
    cube_fsf, norm_fsf = glr_spatial(
        jnp.asarray(cube), jnp.asarray(psfs),
        None if wmaps is None else jnp.asarray(wmaps), fshape2
    )

    prepped = prepare_profiles(profiles, pcut=pcut, pmeansub=pmeansub)
    dmax = max(len(p) for p, _ in prepped)
    fshape = int(next_fast_len(nz + dmax - 1))
    prof_buf, prof2_buf = _pack_profiles(prepped, fshape)

    correl, profile, correl_min = glr_spectral(
        cube_fsf, norm_fsf, jnp.asarray(prof_buf), jnp.asarray(prof2_buf),
        fshape, nz
    )
    # np.array (not asarray) so callers get writable host buffers
    return (
        np.array(correl),
        np.array(profile),
        np.array(correl_min),
    )
