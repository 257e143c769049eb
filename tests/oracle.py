"""NumPy/SciPy oracle implementations of the ORIGIN math (Mary et al. 2020),
written directly from the algorithm definitions, used to validate the JAX
kernels numerically.  Deliberately simple and loop-based."""

import numpy as np
from scipy.ndimage import maximum_filter
from scipy.signal import fftconvolve
from scipy.sparse.linalg import svds


def dct_basis(nl, order):
    k = np.arange(order + 1)
    z = np.arange(nl)
    basis = np.sqrt(2.0 / nl) * np.cos(np.pi / nl * np.outer(z + 0.5, k))
    basis[:, 0] /= np.sqrt(2.0)
    return basis


def dct_continuum_gls(cube, order, var, valid2d):
    """Per-spaxel GLS continuum; unweighted projection on invalid spaxels."""
    nl, ny, nx = cube.shape
    d = dct_basis(nl, order)
    out = np.empty_like(cube, dtype=float)
    for y in range(ny):
        for x in range(nx):
            s = cube[:, y, x]
            if valid2d[y, x]:
                iv = 1.0 / var[:, y, x]
                a = (d.T * iv) @ d
                coef = np.linalg.solve(a, d.T @ (s * iv))
            else:
                coef = d.T @ s
            out[:, y, x] = d @ coef
    return out


def o2(cube):
    return np.mean(cube ** 2, axis=0)


def local_max_oracle(correl, correl_min, mask, size=3):
    lm = maximum_filter(correl, size=size)
    keep = (correl == lm) & ~mask
    lmin_src = -correl_min
    lmin = maximum_filter(lmin_src, size=size)
    keepm = (lmin_src == lmin) & ~mask
    return lm * keep, lmin * keepm


def glr_oracle(cube, psf_per_channel, profiles, pcut=1e-8, pmeansub=True):
    """Matched-filter GLR with scipy FFT convolutions (single field)."""
    nz, ny, nx = cube.shape
    cube = cube.astype(float)
    cube_fsf = np.empty_like(cube)
    norm_fsf = np.empty_like(cube)
    for i in range(nz):
        k = psf_per_channel[i][::-1, ::-1].astype(float)
        k = k - k.mean()
        cube_fsf[i] = fftconvolve(cube[i], k, mode="same")
        norm_fsf[i] = fftconvolve(np.ones((ny, nx)), k * k, mode="same")

    correl = np.full(cube.shape, -np.inf)
    correl_min = np.full(cube.shape, np.inf)
    prof_id = np.zeros(cube.shape, dtype=np.uint8)
    for kidx, prof in enumerate(profiles):
        p = np.asarray(prof, dtype=float).copy()
        if pcut is not None:
            peak = p.argmax()
            above = np.where(p >= pcut)[0]
            half = int(np.max(np.abs(above[[0, -1]] - peak)))
            p = p[max(0, peak - half) : peak + half + 1]
        p = p / np.linalg.norm(p)
        if pmeansub:
            p = p - p.mean()
        num = np.empty_like(cube)
        den = np.empty_like(cube)
        for y in range(ny):
            for x in range(nx):
                num[:, y, x] = fftconvolve(cube_fsf[:, y, x], p, mode="same")
                den[:, y, x] = fftconvolve(norm_fsf[:, y, x], p ** 2, mode="same")
        den[den <= 0] = np.inf
        t = num / np.sqrt(den)
        prof_id[t > correl] = kidx
        np.maximum(correl, t, out=correl)
        np.minimum(correl_min, t, out=correl_min)
    return correl, prof_id, correl_min


def greedy_pca_oracle(cube2d, test, thres, noise_population, itermax):
    """Greedy PCA on an (nz, npix) matrix, direct transcription of the
    published algorithm (background signature -> orthogonalize -> rank-1
    PCA removal -> retest)."""
    faint = cube2d.astype(float).copy()
    mapo2 = np.zeros(faint.shape[1])
    nstop = 0
    test = np.asarray(test, dtype=float).copy()
    nuisance = np.where(test > thres)[0]
    nbiter = 0
    while len(nuisance) > 0:
        nbiter += 1
        mapo2[nuisance] += 1
        if nbiter > itermax:
            nstop += 1
            break
        passing = np.where((test > 0) & (test <= thres))[0]
        nb = 1 + int(len(passing) / noise_population)
        faintest = passing[np.argsort(test[passing])[:nb]]
        b = faint[:, faintest].mean(axis=1)
        xr = faint[:, nuisance].copy()
        xr -= np.outer(b, b @ xr)
        xr /= np.sum(b ** 2)
        if xr.shape[1] == 1:
            break
        u, s, v = svds(xr, k=1)
        w = u[:, 0]
        faint -= np.outer(w, w @ faint)
        test = np.mean(faint ** 2, axis=0)
        nuisance = np.where(test > thres)[0]
    return faint, mapo2, nstop


def ls_deconv_oracle(data, var, psf):
    nl = psf.shape[0]
    p = psf.reshape(nl, -1).astype(float)
    v = var.reshape(nl, -1).astype(float)
    d = data.reshape(nl, -1).astype(float)
    varest = 1.0 / np.sum(p * p / v, axis=1)
    deconv = np.sum(p * d / np.sqrt(v), axis=1) * varest
    return deconv, varest


def method_pca_wgt_oracle(data, var, psf, order_dct):
    nl = psf.shape[0]
    sq = np.sqrt(var.astype(float))
    data_std = data / sq
    x = data_std.reshape(nl, -1)
    x0 = x - x.mean(axis=1, keepdims=True)
    u, s, v = svds(x0, k=1)
    resid = data_std - (u @ (u.T @ x0)).reshape(psf.shape)
    deconv, _ = ls_deconv_oracle(resid, var, psf)
    conv = psf * deconv[:, None, None] * (np.abs(psf) > 0)
    clean = (data - conv) / sq
    x1 = clean.reshape(nl, -1)
    x1 = x1 - x1.mean(axis=1, keepdims=True)
    u2, s, v = svds(x1, k=1)
    if order_dct is not None:
        d0 = dct_basis(nl, order_dct)
        u2 = d0 @ (d0.T @ u2)
    cont = (u2 @ (u2.T @ x)).reshape(psf.shape)
    return ls_deconv_oracle(data_std - cont, var, psf)
