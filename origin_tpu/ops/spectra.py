"""Batched device extraction of per-source spectra (step 11).

The reference builds every source file on the host, extracting each
spectrum with per-source full-cube arithmetic (reference
source_creation.py:201-editions via mpdaf ``Source.extract_spectra``); the
host port of that method lives in ``artifacts.source.Source.extract_spectra``
and costs ~10 einsum-sized passes over a (Nz, m, m) cutout per source — on
a single-core host that is the dominant CPU cost of step 11.

Here ALL spectra of ALL sources are reduced on device by one jitted
program per cutout size: the zero-filled cube / inf-filled variance /
mask already resident on the device are padded once, each source's window
is sliced under ``vmap`` and collapsed to (Nz,) vectors in-register, and
only the ~10 kB-per-source spectra cross the host link.  The arithmetic
mirrors ``Source.extract_spectra`` exactly (zero-filled sums, weight
normalisation by the peak, matched-filter PSF estimator); parity is
pinned by tests/test_ops.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

__all__ = ["source_spectra_kernel", "batched_source_spectra"]


def _window(pd, pv, pm, yy, xx, m):
    nz = pd.shape[0]
    d = lax.dynamic_slice(pd, (0, yy, xx), (nz, m, m))
    v = lax.dynamic_slice(pv, (0, yy, xx), (nz, m, m))
    mk = lax.dynamic_slice(pm, (0, yy, xx), (nz, m, m))
    valid = ~mk
    inv = jnp.where(valid & (v > 0) & jnp.isfinite(v), 1.0 / v, 0.0)
    return d, valid, inv.astype(jnp.float32)


def _weighted(dv_s, dv_p, inv, w):
    """(spec_skysub, var, spec_plain, var) for one normalised weight map."""
    peak = jnp.max(w)
    w = jnp.where(peak > 0, w / peak, w)
    den = jnp.einsum("zyx,yx->z", inv, w * w)
    den = jnp.where(den == 0, jnp.inf, den)
    num_s = jnp.einsum("zyx,yx->z", dv_s, w)
    num_p = jnp.einsum("zyx,yx->z", dv_p, w)
    return num_s / den, 1.0 / den, num_p / den, 1.0 / den


@partial(jax.jit, static_argnames=("m", "has_psf"))
def source_spectra_kernel(pd, pv, pm, y0, x0, objm, skym, wcube,
                          lsrc, lw, m, has_psf):
    """All per-source and per-line spectra for one cutout size.

    Parameters
    ----------
    pd, pv, pm : (Nz, Nyp, Nxp) padded device cubes — zero-filled data,
        inf-filled variance, True-masked validity (pad: 0 / inf / True)
    y0, x0 : (B,) int32 window starts INTO THE PADDED cubes
    objm, skym : (B, m, m) float32 object / sky masks (0/1)
    wcube : (Nz, m, m) float32 PSF weight cube (ignored if not has_psf)
    lsrc : (L,) int32 source index of each line job
    lw : (L, m, m) float32 narrow-band weight image of each line job
    m : static cutout edge
    has_psf : static, whether to produce the PSF-weighted spectra

    Returns a dict of (B, Nz) / (L, Nz) float32 arrays.
    """

    def one_source(yy, xx, ob, sk):
        d, valid, inv = _window(pd, pv, pm, yy, xx, m)
        nsky = jnp.maximum(1.0, jnp.sum(sk))
        sky = jnp.einsum("zyx,yx->z", d, sk) / nsky
        dsub = jnp.where(valid, d - sky[:, None, None], 0.0)
        tot_s = jnp.einsum("zyx,yx->z", dsub, ob)
        tot_p = jnp.einsum("zyx,yx->z", d, ob)
        dv_s = dsub * inv
        dv_p = d * inv
        # white-light weight: masked mean over z (NaN where never valid,
        # matching the host Cube.mean)
        cnt = jnp.sum(valid, axis=0).astype(jnp.float32)
        white = jnp.where(cnt > 0, jnp.sum(d, axis=0) / cnt, jnp.nan)
        ws, wv, wps, wpv = _weighted(dv_s, dv_p, inv,
                                     jnp.where(ob > 0, white, 0.0))
        out = dict(sky=sky, tot_s=tot_s, tot_p=tot_p,
                   white_s=ws, white_s_var=wv,
                   white_p=wps, white_p_var=wpv, white_img=white)
        if has_psf:
            w = wcube * ob[None]
            den = jnp.einsum("zyx,zyx->z", w * w, inv)
            den = jnp.where(den == 0, jnp.inf, den)
            out.update(
                psf_s=jnp.einsum("zyx,zyx->z", w, dv_s) / den,
                psf_s_var=1.0 / den,
                psf_p=jnp.einsum("zyx,zyx->z", w, dv_p) / den,
                psf_p_var=1.0 / den,
            )
        return out

    res = jax.vmap(one_source)(y0, x0, objm, skym)

    def one_line(si, w):
        d, valid, inv = _window(pd, pv, pm, y0[si], x0[si], m)
        ob = objm[si]
        sk = skym[si]
        nsky = jnp.maximum(1.0, jnp.sum(sk))
        sky = jnp.einsum("zyx,yx->z", d, sk) / nsky
        dsub = jnp.where(valid, d - sky[:, None, None], 0.0)
        ls, lv, lp, lpv = _weighted(dsub * inv, d * inv, inv,
                                    jnp.where(ob > 0, w, 0.0))
        return dict(line_s=ls, line_s_var=lv, line_p=lp, line_p_var=lpv)

    if lsrc.shape[0]:
        res.update(jax.vmap(one_line)(lsrc, lw))
    return res


def _bucket4(n, minimum=8):
    """Round up to minimum * 4^k.

    Coarser than power-of-two bucketing on purpose: each distinct padded
    batch shape is a fresh XLA program (~10 s through a remote-compile
    tunnel), and survey fields routinely straddle power-of-two counts.
    With x4 tiers one compiled program covers counts within a 4x band;
    the padding overhead is device-cheap and the padded rows are sliced
    off ON DEVICE before the fetch, so the link never carries them.
    """
    b = minimum
    while b < n:
        b *= 4
    return b


def _trim2(x, n, minimum=8):
    """Device-slice a cap-padded batch down to the x2 bucket of ``n``.

    The companion of :func:`_bucket4`: coarse x4 capacity tiers keep the
    number of compiled batch programs low, and this trim keeps their
    padding off the link (<2x the real rows fetched) while itself using
    only a logarithmic family of slice programs.  THE shared recipe for
    every cap-padded device batch (source spectra, line images, ORI
    stats, sparse compactions) — callers slice the exact ``[:n]`` on the
    host after the fetch.
    """
    from .pca import _bucket

    return x[: min(x.shape[0], _bucket(n, minimum))]


def batched_source_spectra(pd, pv, pm, jobs, wcube=None, chunk=None):
    """Run :func:`source_spectra_kernel` for a list of source jobs.

    ``jobs`` is a list of dicts with keys ``key`` (source id), ``y0``/``x0``
    (window start into the PADDED cubes), ``objm``/``skym`` ((m, m) bool),
    and ``lines``: a list of ``(num_line, (m, m) float32 weight image)``.
    All jobs must share one cutout size ``m`` (callers group by size).

    Jobs run in fixed-size chunks (default 8, ``ORIGIN_TPU_SPECTRA_CHUNK``):
    the kernel's vmapped window gathers materialize (cap, Nz, m, m)
    batches, so an unchunked survey field (cap up to 128 after x4
    bucketing) would demand several GB of transient HBM — enough to OOM
    a small-HBM chip whose persistent cubes are already resident.  One
    chunk size also means ONE compiled program for every field.  All
    chunk programs are dispatched before a single batched fetch collects
    their results, so the link still pays one round-trip.

    Returns ``{source_id: {tag: (Nz,) np.float32 or (spec, var)}}`` with
    tags MUSE_SKY / MUSE_TOT[_SKYSUB] / MUSE_WHITE[_SKYSUB] /
    MUSE_PSF[_SKYSUB] / ORI_CORR_<num>[_SKYSUB].
    """
    if not jobs:
        return {}
    if chunk is None:
        import os

        chunk = int(os.environ.get("ORIGIN_TPU_SPECTRA_CHUNK", "8"))
    # upload the (Nz, m, m) weight cube ONCE: every chunk shares the same
    # device reference (jnp.asarray never dedups host uploads, so doing
    # this per chunk would re-send megabytes of identical bytes per chunk)
    m = jobs[0]["objm"].shape[0]
    has_psf = wcube is not None
    if not has_psf:
        wcube = np.zeros((pd.shape[0], m, m), np.float32)
    wdev = jnp.asarray(np.asarray(wcube, np.float32))
    pending = [
        _dispatch_spectra_chunk(pd, pv, pm, jobs[i:i + chunk], wdev,
                                has_psf)
        for i in range(0, len(jobs), chunk)
    ]
    # ONE batched transfer for every chunk's outputs (async prefetch,
    # single block) — chunking must not multiply link round-trips
    hosts = jax.device_get([res for res, _, _, _ in pending])
    out = {}
    for host, (_, cjobs, ljobs, has_psf) in zip(hosts, pending):
        _decode_spectra_chunk(out, host, cjobs, ljobs, has_psf)
    return out


def _dispatch_spectra_chunk(pd, pv, pm, jobs, wdev, has_psf):
    """Enqueue one chunk's kernel; returns (device outputs, jobs, ljobs,
    has_psf) without blocking on the transfer.  ``wdev`` is the shared
    device-resident PSF weight cube (zeros when ``has_psf`` is False)."""
    m = jobs[0]["objm"].shape[0]
    nb = len(jobs)
    cap = _bucket4(nb)
    y0 = np.zeros(cap, np.int32)
    x0 = np.zeros(cap, np.int32)
    objm = np.zeros((cap, m, m), np.float32)
    skym = np.zeros((cap, m, m), np.float32)
    for i, j in enumerate(jobs):
        y0[i], x0[i] = j["y0"], j["x0"]
        objm[i] = j["objm"]
        skym[i] = j["skym"]
    ljobs = [(i, num, w) for i, j in enumerate(jobs)
             for num, w in j["lines"]]
    nl = len(ljobs)
    lcap = _bucket4(nl) if ljobs else 0
    lsrc = np.zeros(lcap, np.int32)
    lw = np.zeros((lcap, m, m), np.float32)
    for k, (i, _num, w) in enumerate(ljobs):
        lsrc[k] = i
        lw[k] = w
    res = source_spectra_kernel(
        pd, pv, pm, jnp.asarray(y0), jnp.asarray(x0),
        jnp.asarray(objm), jnp.asarray(skym), wdev,
        jnp.asarray(lsrc), jnp.asarray(lw), m, has_psf,
    )
    # slice most of the padding off on device before the fetch (the
    # padded (cap, Nz) rows are real link bytes)
    res = {k: (_trim2(v, nl) if k.startswith("line") else _trim2(v, nb))
           for k, v in res.items()}
    return res, jobs, ljobs, has_psf


def _decode_spectra_chunk(out, host, jobs, ljobs, has_psf):
    for i, j in enumerate(jobs):
        d = {
            "MUSE_SKY": host["sky"][i],
            "MUSE_TOT_SKYSUB": host["tot_s"][i],
            "MUSE_TOT": host["tot_p"][i],
            "MUSE_WHITE_SKYSUB": (host["white_s"][i],
                                  host["white_s_var"][i]),
            "MUSE_WHITE": (host["white_p"][i], host["white_p_var"][i]),
        }
        if has_psf:
            d["MUSE_PSF_SKYSUB"] = (host["psf_s"][i], host["psf_s_var"][i])
            d["MUSE_PSF"] = (host["psf_p"][i], host["psf_p_var"][i])
        # not a spectrum: the (m, m) white-light image, computed as the
        # kernel's weight anyway — callers pop it for the MUSE_WHITE HDU
        d["MUSE_WHITE_IMG"] = host["white_img"][i]
        out[j["key"]] = d
    for k, (i, num, _w) in enumerate(ljobs):
        key = jobs[i]["key"]
        out[key][f"ORI_CORR_{num}_SKYSUB"] = (
            host["line_s"][k], host["line_s_var"][k]
        )
        out[key][f"ORI_CORR_{num}"] = (
            host["line_p"][k], host["line_p_var"][k]
        )
    return out
