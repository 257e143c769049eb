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

from .convolve import fft2_shape, fftconvolve2d_same

__all__ = [
    "prepare_profiles",
    "correlation_glr_test",
    "glr_spatial",
    "glr_spectral",
    "precompute_spatial",
    "glr_spatial_pre",
    "glr_spatial_chunked",
    "glr_spatial_matmul",
    "dft_spatial_factors",
    "pack_profiles_toeplitz",
    "glr_spectral_mxu",
    "toeplitz_sweep",
]


def prepare_profiles(profiles, pcut=1e-8, pmeansub=True):
    """Trim, normalize and mean-subtract the profile dictionary (host).

    Follows reference lib_origin.py:1153-1165: each profile is cut to the
    symmetric support where it exceeds ``pcut`` around its peak, then
    L2-normalized, then (optionally) mean-subtracted.

    Returns a list of (trimmed_profile, center_index) pairs where
    center = (len-1)//2 is the offset of the 'same' convolution.
    """
    out = []
    for i, prof in enumerate(profiles):
        prof = np.asarray(prof, dtype=np.float64).copy()
        if not np.any(prof > 0):
            raise ValueError(
                f"profile {i} of the dictionary has no positive samples"
            )
        if pcut is not None:
            lpeak = int(prof.argmax())
            above = np.where(prof >= pcut)[0]
            if above.size == 0:
                raise ValueError(
                    f"profile {i} of the dictionary is entirely below "
                    f"pcut={pcut}"
                )
            lw = int(np.max(np.abs(above[[0, -1]] - lpeak)))
            lo = max(0, lpeak - lw)
            prof = prof[lo : lpeak + lw + 1]
        prof = prof / np.linalg.norm(prof)
        if pmeansub:
            prof = prof - prof.mean()
        out.append((prof, (len(prof) - 1) // 2))
    return out


def _pack_profiles(prepped, length=None):
    """Stack trimmed profiles into a right-zero-padded (K, L) bank.

    Returns (prof_bank, prof2_bank, centers): profile j of length l_j sits in
    row j, padded with zeros on the right; ``centers[j] = (l_j - 1) // 2`` is
    the offset of the centred 'same' convolution.
    """
    k = len(prepped)
    if length is None:
        length = max(len(p) for p, _ in prepped)
    buf = np.zeros((k, length), dtype=np.float32)
    buf2 = np.zeros((k, length), dtype=np.float32)
    centers = []
    for i, (prof, c) in enumerate(prepped):
        buf[i, : len(prof)] = prof
        buf2[i, : len(prof)] = np.asarray(prof) ** 2
        centers.append(int(c))
    return buf, buf2, tuple(centers)


@partial(jax.jit, static_argnames=("fshape2",))
def glr_spatial(cube, psfs, wmaps, fshape2):
    """Spatial FSF stage: returns (cube_fsf, norm_fsf), each (Nz, Ny, Nx).

    ``psfs`` is (F, Nz, P, P); ``wmaps`` is (F, Ny, Nx) or None for a single
    field.  Matches reference _convolve_fsf (lib_origin.py:1027-1043):
    correlate with the flipped zero-mean FSF; norm = conv of the (weighted)
    ones with FSF^2.

    The norm's 'ones' input (or weight map) is channel-constant, so its
    forward FFT is computed once and broadcast over z instead of FFT'ing an
    entire cube of identical images.
    """
    nz, ny, nx = cube.shape
    nfields = psfs.shape[0]
    cube_fsf = None
    norm_fsf = None
    for nf in range(nfields):
        kern = psfs[nf][:, ::-1, ::-1]
        kern = kern - jnp.mean(kern, axis=(1, 2), keepdims=True)
        data = cube if wmaps is None else cube * wmaps[nf][None]
        c = fftconvolve2d_same(data, kern, fshape2)

        # norm: single-image FFT broadcast against the per-channel kern^2 FFT
        base = (
            jnp.ones((1, ny, nx), cube.dtype) if wmaps is None
            else wmaps[nf][None]
        )
        bf = jnp.fft.rfft2(base, fshape2)
        k2f = jnp.fft.rfft2(kern * kern, fshape2)
        full = jnp.fft.irfft2(bf * k2f, fshape2)
        ph, pw = kern.shape[-2:]
        y0, x0 = (ph - 1) // 2, (pw - 1) // 2
        n = jax.lax.slice_in_dim(
            jax.lax.slice_in_dim(full, y0, y0 + ny, axis=-2),
            x0, x0 + nx, axis=-1,
        )
        cube_fsf = c if cube_fsf is None else cube_fsf + c
        norm_fsf = n if norm_fsf is None else norm_fsf + n
    return cube_fsf, norm_fsf


@partial(jax.jit, static_argnames=("ny", "nx", "fshape2"))
def precompute_spatial(psfs, wmaps, ny, nx, fshape2):
    """Data-independent part of the spatial stage, computed once per dataset.

    The FSF (and the field weight maps for mosaics) are fixed instrument
    models, so their padded 2-D spectra — and the entire norm cube, which
    depends only on them — are hoisted out of the per-cube hot path.

    Returns (kern_hats, norm_fsf): ``kern_hats`` is a (F, Nz, fy, fx//2+1)
    complex bank of flipped zero-mean FSF spectra; ``norm_fsf`` the summed
    (Nz, Ny, Nx) norm cube (reference lib_origin.py:1036-1043).
    """
    nfields = psfs.shape[0]
    kern_hats = []
    norm_fsf = None
    for nf in range(nfields):
        kern = psfs[nf][:, ::-1, ::-1]
        kern = kern - jnp.mean(kern, axis=(1, 2), keepdims=True)
        kern_hats.append(jnp.fft.rfft2(kern, fshape2))
        base = (
            jnp.ones((1, ny, nx), psfs.dtype) if wmaps is None
            else wmaps[nf][None]
        )
        bf = jnp.fft.rfft2(base, fshape2)
        k2f = jnp.fft.rfft2(kern * kern, fshape2)
        full = jnp.fft.irfft2(bf * k2f, fshape2)
        ph, pw = kern.shape[-2:]
        y0, x0 = (ph - 1) // 2, (pw - 1) // 2
        n = jax.lax.slice_in_dim(
            jax.lax.slice_in_dim(full, y0, y0 + ny, axis=-2),
            x0, x0 + nx, axis=-1,
        )
        norm_fsf = n if norm_fsf is None else norm_fsf + n
    return jnp.stack(kern_hats), norm_fsf


@partial(jax.jit, static_argnames=("psf_shape", "fshape2"))
def glr_spatial_pre(cube, kern_hats, wmaps, psf_shape, fshape2):
    """Hot-path spatial stage with precomputed FSF spectra.

    Two cube-sized FFT passes (forward + inverse) instead of the five of
    the self-contained ``glr_spatial``.  Returns cube_fsf only; the norm
    cube comes from :func:`precompute_spatial`.
    """
    ny, nx = cube.shape[-2:]
    ph, pw = psf_shape
    y0, x0 = (ph - 1) // 2, (pw - 1) // 2
    nfields = kern_hats.shape[0]
    cube_fsf = None
    for nf in range(nfields):
        data = cube if wmaps is None else cube * wmaps[nf][None]
        cf = jnp.fft.rfft2(data, fshape2)
        full = jnp.fft.irfft2(cf * kern_hats[nf], fshape2)
        c = jax.lax.slice_in_dim(
            jax.lax.slice_in_dim(full, y0, y0 + ny, axis=-2),
            x0, x0 + nx, axis=-1,
        )
        cube_fsf = c if cube_fsf is None else cube_fsf + c
    return cube_fsf


def dft_spatial_factors(ny, nx, fshape2, psf_shape, ny_out=None, y_extra=0):
    """Real/imag DFT factor matrices for the matmul spatial stage (host).

    The padded 2-D real FFT, the centred 'same' slice of the inverse, and
    the real-symmetry weights are folded into four small matrices so the
    whole spatial convolution becomes batched MXU matmuls
    (see :func:`glr_spatial_matmul`).  Returns a dict of float32 arrays.

    ``ny_out`` / ``y_extra`` support halo-extended tiles (sharded path):
    the input has ``ny`` rows but only ``ny_out`` output rows are wanted,
    starting ``y_extra`` rows further down (the halo trim).
    """
    fy, fx = int(fshape2[0]), int(fshape2[1])
    fxr = fx // 2 + 1
    ph, pw = psf_shape
    y0, x0 = (ph - 1) // 2 + int(y_extra), (pw - 1) // 2
    if ny_out is None:
        ny_out = ny
    kx = np.arange(fxr)
    ax = np.exp(-2j * np.pi * np.outer(np.arange(nx), kx) / fx)  # (nx, FXr)
    ay = np.exp(
        -2j * np.pi * np.outer(np.arange(fy), np.arange(ny)) / fy
    )  # (FY, ny)
    by = (
        np.exp(
            2j * np.pi * np.outer(np.arange(ny_out) + y0, np.arange(fy)) / fy
        )
        / fy
    )  # (ny_out, FY)
    w = np.full(fxr, 2.0)
    w[0] = 1.0
    if fx % 2 == 0:
        w[-1] = 1.0
    cx = (
        w[:, None]
        * np.exp(2j * np.pi * np.outer(kx, np.arange(nx) + x0) / fx)
        / fx
    )  # (FXr, nx)
    f32 = lambda a: np.ascontiguousarray(a, dtype=np.float32)
    return dict(
        axr=f32(ax.real), axi=f32(ax.imag),
        ayr=f32(ay.real), ayi=f32(ay.imag),
        byr=f32(by.real), byi=f32(by.imag),
        cxr=f32(cx.real), cxi=f32(cx.imag),
    )


@partial(jax.jit, static_argnames=("precision",))
def glr_spatial_matmul(cube, kern_r, kern_i, wmaps, factors,
                       precision=jax.lax.Precision.HIGHEST):
    """Spatial FSF stage as batched MXU matmuls (DFT-by-matmul).

    Numerically equivalent to :func:`glr_spatial_pre` (same padded linear
    convolution, 'same' slice folded into the inverse factors), but the
    ~N^2 DFT matmuls run on the systolic array, which beats the VPU-bound
    mixed-radix FFT by a wide margin at MUSE field sizes.

    ``kern_r/kern_i``: (F, Nz, FY, FXr) real/imag parts of the
    precomputed flipped zero-mean FSF spectra (from
    :func:`precompute_spatial`); ``factors`` from
    :func:`dft_spatial_factors`.  Returns cube_fsf (Nz, Ny, Nx).
    """
    hi = precision
    nfields = kern_r.shape[0]
    axr, axi = factors["axr"], factors["axi"]
    ayr, ayi = factors["ayr"], factors["ayi"]
    byr, byi = factors["byr"], factors["byi"]
    cxr, cxi = factors["cxr"], factors["cxi"]

    def mm(a, b):  # batched (z, m, k) x (k, n)
        return jnp.einsum("zmk,kn->zmn", a, b, precision=hi)

    def mml(a, b):  # (m, k) x batched (z, k, n)
        return jnp.einsum("mk,zkn->zmn", a, b, precision=hi)

    cube_fsf = None
    for nf in range(nfields):
        data = cube if wmaps is None else cube * wmaps[nf][None]
        zr = mm(data, axr)
        zi = mm(data, axi)
        yr = mml(ayr, zr) - mml(ayi, zi)
        yi = mml(ayr, zi) + mml(ayi, zr)
        pr = yr * kern_r[nf] - yi * kern_i[nf]
        pi = yr * kern_i[nf] + yi * kern_r[nf]
        gr = mml(byr, pr) - mml(byi, pi)
        gi = mml(byr, pi) + mml(byi, pr)
        out = mm(gr, cxr) - mm(gi, cxi)
        cube_fsf = out if cube_fsf is None else cube_fsf + out
    return cube_fsf


@partial(jax.jit, static_argnames=("fshape2", "zchunk"))
def glr_spatial_chunked(cube, psfs, wmaps, fshape2, zchunk=512):
    """Memory-bounded spatial stage: scan over spectral slabs.

    Equivalent to ``glr_spatial`` but computes the per-channel FSF spectra
    slab-by-slab under ``lax.scan`` so peak HBM stays at
    ~zchunk/Nz of the full-cube FFT working set.  Used on devices whose
    HBM cannot hold the precomputed FSF spectra bank of
    :func:`precompute_spatial` for the field size at hand.
    """
    nz, ny, nx = cube.shape
    nfields = psfs.shape[0]
    ph, pw = psfs.shape[-2:]
    y0, x0 = (ph - 1) // 2, (pw - 1) // 2
    nzp = -(-nz // zchunk) * zchunk

    def padz(a):
        return jnp.pad(a, ((0, nzp - nz), (0, 0), (0, 0))).reshape(
            nzp // zchunk, zchunk, *a.shape[1:]
        )

    cube_fsf = None
    norm_fsf = None
    for nf in range(nfields):
        kern = psfs[nf][:, ::-1, ::-1]
        kern = kern - jnp.mean(kern, axis=(1, 2), keepdims=True)
        data = cube if wmaps is None else cube * wmaps[nf][None]
        base = (
            jnp.ones((1, ny, nx), cube.dtype) if wmaps is None
            else wmaps[nf][None]
        )
        bf = jnp.fft.rfft2(base, fshape2)

        def one_slab(_, dk, bf=bf):
            d, k = dk
            kf = jnp.fft.rfft2(k, fshape2)
            cf = jnp.fft.rfft2(d, fshape2)
            c_full = jnp.fft.irfft2(cf * kf, fshape2)
            k2f = jnp.fft.rfft2(k * k, fshape2)
            n_full = jnp.fft.irfft2(bf * k2f, fshape2)
            sl = lambda a: jax.lax.slice_in_dim(
                jax.lax.slice_in_dim(a, y0, y0 + ny, axis=-2),
                x0, x0 + nx, axis=-1,
            )
            return None, (sl(c_full), sl(n_full))

        _, (c, n) = jax.lax.scan(one_slab, None, (padz(data), padz(kern)))
        c = c.reshape(nzp, ny, nx)[:nz]
        n = n.reshape(nzp, ny, nx)[:nz]
        cube_fsf = c if cube_fsf is None else cube_fsf + c
        norm_fsf = n if norm_fsf is None else norm_fsf + n
    return cube_fsf, norm_fsf


def _conv_full_lastdim(v, kern):
    """'full' cross-correlation-style conv along the last axis.

    v: (S, Nz); kern: (O, L).  Returns (S, O, Nz + L - 1) with
    out[s, o, m] = sum_j kern[o, j] * v[s, m - (L-1) + j].
    """
    length = kern.shape[-1]
    return jax.lax.conv_general_dilated(
        v[:, None, :],
        kern[:, None, :],
        window_strides=(1,),
        padding=[(length - 1, length - 1)],
        dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


@partial(jax.jit, static_argnames=("centers", "nz"))
def glr_spectral(cube_fsf, norm_fsf, prof_bank, prof2_bank, centers, nz):
    """Spectral matched-filter sweep with running max/argmax/min.

    The profiles are short (<= ~60 taps after the pcut trim), so the
    spectral convolution is evaluated as a direct XLA convolution along the
    innermost axis — ~8x faster on TPU than the reference's FFT formulation
    (the mixed-radix FFT of a ~3700-channel axis maps poorly to the
    hardware).  Each profile's centred 'same' window is a static slice of
    the 'full' convolution at offset L-1-c_k.

    Inputs are (Nz, Ny, Nx); returns (correl, profile_idx, correl_min),
    each (Nz, Ny, Nx); profile indices are uint8 for dictionaries of up to
    255 profiles and int32 beyond that.
    """
    ny, nx = cube_fsf.shape[1:]
    s = ny * nx
    x = cube_fsf.reshape(nz, s).T  # (S, Nz), z innermost
    n = norm_fsf.reshape(nz, s).T
    length = prof_bank.shape[1]

    pdtype = jnp.uint8 if len(centers) <= 255 else jnp.int32
    correl = jnp.full((s, nz), -jnp.inf, dtype=jnp.float32)
    correl_min = jnp.full((s, nz), jnp.inf, dtype=jnp.float32)
    profile = jnp.zeros((s, nz), dtype=pdtype)

    # one conv per profile (unrolled; K is small) so peak memory stays at
    # ~2 transient cubes regardless of the dictionary size
    for k, c in enumerate(centers):
        off = length - 1 - c
        num = _conv_full_lastdim(x, prof_bank[k : k + 1])[:, 0]
        den = _conv_full_lastdim(n, prof2_bank[k : k + 1])[:, 0]
        cp = jax.lax.slice_in_dim(num, off, off + nz, axis=-1)
        norm = jax.lax.slice_in_dim(den, off, off + nz, axis=-1)
        norm = jnp.where(norm <= 0, jnp.inf, jnp.sqrt(norm))
        t = cp / norm
        profile = jnp.where(t > correl, jnp.asarray(k, pdtype), profile)
        correl = jnp.maximum(correl, t)
        correl_min = jnp.minimum(correl_min, t)

    reshape = lambda a: a.T.reshape(nz, ny, nx)
    return reshape(correl), reshape(profile), reshape(correl_min)


def pack_profiles_toeplitz(prepped, block=128):
    """Band-Toeplitz operator bank for the MXU spectral sweep (host).

    The centred 'same' correlation with profile k is
    ``cp[z] = sum_j p_k[j] * x[z + j - c_k]``.  Over a z-block of ``block``
    outputs this is one (W, block) banded-Toeplitz matmul against a sliding
    window of the (shared, max-center left-padded) input — a shape the MXU
    executes at full tilt, unlike a length-~60 depthwise convolution which
    lands on the VPU.

    Returns (t_num, t_den, pad_left, window) where t_num/t_den are
    (K, W, block) float32 banks for the profile / profile^2 filters.
    """
    k = len(prepped)
    pad_left = max(c for _, c in prepped)
    reach = max(pad_left - c + len(p) for p, c in prepped)
    window = block + reach - 1
    t_num = np.zeros((k, window, block), dtype=np.float32)
    t_den = np.zeros((k, window, block), dtype=np.float32)
    for j, (prof, c) in enumerate(prepped):
        s = pad_left - c
        length = len(prof)
        for i in range(block):
            t_num[j, s + i : s + i + length, i] = prof
            t_den[j, s + i : s + i + length, i] = np.asarray(prof) ** 2
    return t_num, t_den, pad_left, window


def toeplitz_sweep(cube_fsf, norm_fsf, t_num, t_den, pad_left, nz,
                   precision=jax.lax.Precision.HIGHEST, with_profile=True,
                   max_transient_bytes=2 << 30):
    """Core of the MXU spectral sweep (traceable; also used inside
    shard_map tiles, where the z axis is unsharded).

    The sliding-window view costs ~W/B extra copies of the cube, so large
    fields are processed in spaxel slabs under ``lax.scan``, bounding the
    transient memory at roughly ``max_transient_bytes`` regardless of the
    field size.
    """
    nprof, window, block = t_num.shape
    # uint8 saves HBM for ordinary dictionaries; wider types avoid silent
    # wrap-around for dictionaries with more than 256 profiles
    pdtype = jnp.uint8 if nprof <= 255 else jnp.int32
    nb = -(-nz // block)
    ny, nx = cube_fsf.shape[1:]
    s = ny * nx

    # pick the number of sequential slabs so a slab's window view + matmul
    # outputs stay under the transient budget
    per_spaxel = (2 * nb * window + 2 * nb * block) * 4
    nslab = max(1, -(-s * per_spaxel // max_transient_bytes))
    slab = -(-s // nslab)
    sp = nslab * slab

    def flat(a):
        a = a.reshape(nz, s).T  # (S, Nz), z innermost
        total = nb * block + window - block
        a = jnp.pad(a, ((0, sp - s), (pad_left, total - pad_left - nz)))
        return a.reshape(nslab, slab, -1)

    xf = flat(cube_fsf)
    nf = flat(norm_fsf)

    def windows(a):
        return jnp.stack(
            [
                jax.lax.slice_in_dim(a, b * block, b * block + window, axis=-1)
                for b in range(nb)
            ],
            axis=1,
        )  # (slab, NB, W)

    def one_slab(_, xn):
        x, n = xn
        xw = windows(x)
        nw = windows(n)
        correl = jnp.full((slab, nz), -jnp.inf, dtype=jnp.float32)
        correl_min = jnp.full((slab, nz), jnp.inf, dtype=jnp.float32)
        profile = jnp.zeros((slab, nz), dtype=pdtype)
        for k in range(nprof):
            num = jnp.einsum("snw,wz->snz", xw, t_num[k], precision=precision)
            den = jnp.einsum("snw,wz->snz", nw, t_den[k], precision=precision)
            cp = num.reshape(slab, nb * block)[:, :nz]
            norm = den.reshape(slab, nb * block)[:, :nz]
            norm = jnp.where(norm <= 0, jnp.inf, jnp.sqrt(norm))
            t = cp / norm
            if with_profile:
                profile = jnp.where(t > correl, jnp.asarray(k, pdtype),
                                    profile)
            correl = jnp.maximum(correl, t)
            correl_min = jnp.minimum(correl_min, t)
        return None, (correl, profile, correl_min)

    if nslab == 1:
        _, (correl, profile, correl_min) = one_slab(None, (xf[0], nf[0]))
    else:
        _, (correl, profile, correl_min) = jax.lax.scan(
            one_slab, None, (xf, nf)
        )
        correl = correl.reshape(sp, nz)[:s]
        profile = profile.reshape(sp, nz)[:s]
        correl_min = correl_min.reshape(sp, nz)[:s]

    reshape = lambda a: a.T.reshape(nz, ny, nx)
    return (
        reshape(correl),
        reshape(profile) if with_profile else None,
        reshape(correl_min),
    )


@partial(jax.jit, static_argnames=("pad_left", "nz", "precision"))
def glr_spectral_mxu(cube_fsf, norm_fsf, t_num, t_den, pad_left, nz,
                     precision=jax.lax.Precision.HIGHEST):
    """Spectral matched-filter sweep as blocked-Toeplitz MXU matmuls.

    Numerically equivalent to :func:`glr_spectral` (same sums in a
    different association order); ~4x faster on TPU because the
    contraction runs on the systolic array instead of the VPU.

    Inputs are (Nz, Ny, Nx); returns (correl, profile_idx, correl_min),
    each (Nz, Ny, Nx); profile indices are uint8 for dictionaries of up to
    255 profiles and int32 beyond that.
    """
    return toeplitz_sweep(
        cube_fsf, norm_fsf, t_num, t_den, pad_left, nz, precision=precision
    )


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
    jwmaps = None if wmaps is None else jnp.asarray(wmaps)
    kern_hats, norm_fsf = precompute_spatial(
        jnp.asarray(psfs), jwmaps, ny, nx, fshape2
    )
    factors = {
        k: jnp.asarray(v)
        for k, v in dft_spatial_factors(
            ny, nx, fshape2, psfs.shape[-2:]
        ).items()
    }
    cube_fsf = glr_spatial_matmul(
        jnp.asarray(cube), jnp.real(kern_hats), jnp.imag(kern_hats),
        jwmaps, factors
    )

    prepped = prepare_profiles(profiles, pcut=pcut, pmeansub=pmeansub)
    t_num, t_den, pad_left, _ = pack_profiles_toeplitz(
        prepped, block=min(128, nz)
    )

    correl, profile, correl_min = glr_spectral_mxu(
        cube_fsf, norm_fsf, jnp.asarray(t_num), jnp.asarray(t_den),
        pad_left, nz
    )
    # np.array (not asarray) so callers get writable host buffers
    return (
        np.array(correl),
        np.array(profile),
        np.array(correl_min),
    )
