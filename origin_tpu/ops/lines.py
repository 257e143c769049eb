"""Per-detection line estimation (flux, refined position, spectrum).

TPU re-design of reference lib_origin.py:1482-1938 (`LS_deconv_wgt`,
`method_PCA_wgt`, `GridAnalysis`, `estimation_line`): the reference loops
sequentially over detections, each doing two ARPACK rank-1 SVDs and a
weighted least-squares deconvolution on a (Nz, 25, 25) minicube.  Here the
whole batch of detections is processed by one vmapped, jit-compiled kernel
(power-iteration rank-1 PCA + batched reductions), chunked on host to bound
memory.

Documented deviations from the reference (see each site):
- the spectral search window is clamped inside the cube (the reference's
  ``maxz = z0 - 5 + z_est`` can go negative for detections within 5 channels
  of the blue edge, lib_origin.py:1726);
- for mosaics with size_grid > 0 the combined PSF is rebuilt from the
  original per-field PSFs at every grid offset (the reference overwrites its
  psf variable on the first offset, lib_origin.py:1713-1717);
- a z_est == 0 offset only invalidates that offset instead of aborting the
  remaining column of the grid scan (lib_origin.py:1723-1724).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .dct import dctmat
from .pca import rank1_left_vector

__all__ = ["ls_deconv_wgt", "method_pca_wgt", "grid_analysis_batch", "estimation_line_arrays"]


def ls_deconv_wgt(data, var, psf):
    """Variance-weighted LS point-source amplitude per channel.

    Reference lib_origin.py:1482-1510, including its asymmetric weighting
    (data / sqrt(var) vs psf^2 / var).
    Shapes: (nl, S, S) -> (nl,), (nl,).
    """
    nl = psf.shape[0]
    p = psf.reshape(nl, -1)
    v = var.reshape(nl, -1)
    d = data.reshape(nl, -1)
    varest = 1.0 / jnp.sum(p * p / v, axis=1)
    deconv = jnp.sum(p * d / jnp.sqrt(v), axis=1) * varest
    return deconv, varest


def method_pca_wgt(data, var, psf, d0):
    """PCA-LS (or DCT-denoised PCA-LS) line estimator on one minicube.

    Reference lib_origin.py:1535-1617. ``d0`` is the (nl, order+1) DCT basis
    or None for plain PCA-LS.
    Returns (estimated_line (nl,), estimated_var (nl,)).
    """
    nl = psf.shape[0]
    sqv = jnp.sqrt(var)
    data_std = data / sqv
    x_std = data_std.reshape(nl, -1)

    x0 = x_std - jnp.mean(x_std, axis=1, keepdims=True)
    u = rank1_left_vector(x0)
    resid = data_std - (jnp.outer(u, u @ x0)).reshape(psf.shape)

    deconv, _ = ls_deconv_wgt(resid, var, psf)
    conv = psf * deconv[:, None, None] * (jnp.abs(psf) > 0)
    data_clean = (data - conv) / sqv

    x1 = data_clean.reshape(nl, -1)
    x1 = x1 - jnp.mean(x1, axis=1, keepdims=True)
    u2 = rank1_left_vector(x1)
    if d0 is not None:
        # denoise the eigenvector on the DCT subspace; the reference then
        # projects with the (now non-unit) smoothed vector as-is
        u2 = d0 @ (d0.T @ u2)
    cont = (jnp.outer(u2, u2 @ x_std)).reshape(psf.shape)
    resid = data_std - cont
    return ls_deconv_wgt(resid, var, psf)


def _peakdet_window(deconv, z0, nl, half=5):
    """Index of the local max of deconv closest to z0 within +/- half.

    Mirrors reference peakdet (lib_origin.py:1793-1801) on the window
    [max(0, z0-half), min(nl, z0+half+1)).  Returns (z_est, start).
    """
    w = 2 * half + 1
    start = jnp.maximum(0, z0 - half)
    end = jnp.minimum(nl, z0 + half + 1)
    length = end - start
    idx = start + jnp.arange(w)
    v = deconv[jnp.clip(idx, 0, nl - 1)]
    v = jnp.where(jnp.arange(w) < length, v, -jnp.inf)
    i = jnp.arange(w)
    is_peak = (
        (i >= 1)
        & (i <= length - 2)
        & (v > jnp.roll(v, 1))
        & (v > jnp.roll(v, -1))
    )
    center = length // 2
    dist = jnp.where(is_peak, (i - center) ** 2, jnp.iinfo(jnp.int32).max)
    z_est = jnp.where(jnp.any(is_peak), jnp.argmin(dist), center)
    return z_est, start


def _window_mask(maxz, nl, half=5):
    """Boolean (nl,) mask of channels in [maxz-half, maxz+half] inter [0, nl)."""
    z = jnp.arange(nl)
    return (z >= maxz - half) & (z <= maxz + half)


def _one_offset(red_dat, red_var, psf_eff, d0, z0, horiz, horiz_psf, size, off):
    """GridAnalysis inner loop for one spatial offset (dy, dx)."""
    nl = red_dat.shape[0]
    dy, dx = off
    r1 = jax.lax.dynamic_slice(red_dat, (0, dy, dx), (nl, size, size))
    v1 = jax.lax.dynamic_slice(red_var, (0, dy, dx), (nl, size, size))

    deconv, varest = method_pca_wgt(r1, v1, psf_eff, d0)
    z_est, start = _peakdet_window(deconv, z0, nl)
    ok = z_est != 0
    maxz = start + z_est  # reference uses z0 - 5 + z_est; clamped variant

    # flux and MSE over the +/-5 window around the refined peak
    m5 = _window_mask(maxz, nl, 5)
    fest5 = jnp.sum(jnp.where(m5, deconv, 0.0))
    mh = _window_mask(maxz, nl, horiz)
    festh = jnp.sum(jnp.where(mh, deconv, 0.0))

    longxy = size // 2
    s0 = longxy - horiz_psf
    ssz = 2 * horiz_psf + 1
    lc = psf_eff * deconv[:, None, None] * (jnp.abs(psf_eff) > 0)

    def win_mse(mask):
        lcr = jax.lax.dynamic_slice(lc, (0, s0, s0), (nl, ssz, ssz))
        r1r = jax.lax.dynamic_slice(r1, (0, s0, s0), (nl, ssz, ssz))
        mz = mask[:, None, None]
        num = jnp.sum(jnp.where(mz, (r1r - lcr) ** 2, 0.0))
        den = jnp.sum(jnp.where(mz, r1r ** 2, 0.0))
        return num / den

    mse5 = win_mse(m5)
    mseh = win_mse(mh)

    fest5 = jnp.where(ok, fest5, 0.0)
    festh = jnp.where(ok, festh, 0.0)
    mse5 = jnp.where(ok, mse5, jnp.inf)
    mseh = jnp.where(ok, mseh, jnp.inf)
    deconv = jnp.where(ok, deconv, 0.0)
    varest = jnp.where(ok, varest, 0.0)
    return festh, fest5, mseh, mse5, deconv, varest, maxz, ok


@partial(
    jax.jit,
    static_argnames=("size_grid", "criteria", "horiz", "horiz_psf", "has_weights"),
)
def grid_analysis_batch(
    red_dat,
    red_var,
    z0s,
    y0s,
    x0s,
    psf,
    red_wgt,
    d0,
    ny,
    nx,
    size_grid=0,
    criteria="flux",
    horiz=5,
    horiz_psf=1,
    has_weights=False,
):
    """Vmapped GridAnalysis over a batch of detections.

    red_dat/red_var: (B, nl, S+2g, S+2g) padded minicubes (var=inf outside);
    psf: (nl, S, S) single field or (F, nl, S, S) mosaic;
    red_wgt: (B, F, S+2g, S+2g) or unused.

    Returns dict of per-detection results.
    """
    g = size_grid
    size = red_dat.shape[-1] - 2 * g
    offsets = jnp.asarray(
        [(dy, dx) for dy in range(2 * g + 1) for dx in range(2 * g + 1)],
        dtype=jnp.int32,
    )

    def per_det(dat, var, z0, y0, x0, wgt):
        def body(off):
            dy, dx = off
            if has_weights:
                w = jax.lax.dynamic_slice(
                    wgt, (0, dy, dx), (wgt.shape[0], size, size)
                )
                psf_eff = jnp.einsum("fab,fzab->zab", w, psf)
            else:
                psf_eff = psf
            festh, fest5, mseh, mse5, deconv, varest, maxz, ok = _one_offset(
                dat, var, psf_eff, d0, z0, horiz, horiz_psf, size, (dy, dx)
            )
            # offsets that leave the cube are invalid (reference dxl/dyl)
            inb = (
                (x0 + dx - g >= 0)
                & (x0 + dx - g < nx)
                & (y0 + dy - g >= 0)
                & (y0 + dy - g < ny)
            )
            festh = jnp.where(inb, festh, 0.0)
            fest5 = jnp.where(inb, fest5, 0.0)
            mseh = jnp.where(inb, mseh, jnp.inf)
            mse5 = jnp.where(inb, mse5, jnp.inf)
            ok = ok & inb
            return festh, fest5, mseh, mse5, deconv, varest, maxz, ok

        festh, fest5, mseh, mse5, deconv, varest, maxz, ok = jax.lax.map(
            body, offsets
        )
        if criteria == "flux":
            sel = jnp.argmax(festh)
        else:
            sel = jnp.argmin(mseh)
        dy = offsets[sel, 0]
        dx = offsets[sel, 1]
        return dict(
            flux=fest5[sel],
            residual=mse5[sel],
            line=deconv[sel],
            line_var=varest[sel],
            y=y0 - g + dy,
            x=x0 - g + dx,
            z=maxz[sel],
            ok=ok[sel],
        )

    if has_weights:
        return jax.vmap(per_det)(red_dat, red_var, z0s, y0s, x0s, red_wgt)
    dummy = jnp.zeros((red_dat.shape[0],), red_dat.dtype)
    return jax.vmap(lambda d, v, z, y, x, _: per_det(d, v, z, y, x, None))(
        red_dat, red_var, z0s, y0s, x0s, dummy
    )


def estimation_line_arrays(
    x0,
    y0,
    z0,
    raw,
    var,
    psf,
    weights=None,
    size_grid=0,
    criteria="flux",
    order_dct=30,
    horiz_psf=1,
    horiz=5,
    batch=64,
    engine=None,
):
    """Estimate lines for detections at (x0, y0, z0) pixel positions.

    Host orchestrator mirroring reference estimation_line
    (lib_origin.py:1804-1938) minus the catalog bookkeeping: extracts padded
    minicubes, runs grid_analysis_batch in chunks, returns numpy arrays
    (flux, residual, lines (N, Nz), line_vars (N, Nz), y, x, z, ok).

    Partial final chunks are padded up to ``batch`` so the kernel compiles
    once.  With ``engine`` (a pipeline.DeviceEngine) and a single field,
    the minicubes are gathered on device from the resident cube instead of
    being cut and uploaded host-side (the upload is ~B*Nz*S^2 floats per
    chunk otherwise).
    """
    nl, ny, nx = raw.shape if engine is None else engine.orig.shape
    if weights is None:
        psf_arr = np.asarray(psf, dtype=np.float32)
        size = psf_arr.shape[-1]
        has_w = False
    else:
        psf_arr = np.stack([np.asarray(p, dtype=np.float32) for p in psf])
        size = psf_arr.shape[-1]
        has_w = True
        wmaps = np.stack([np.asarray(w, dtype=np.float32) for w in weights])
    use_engine = engine is not None and not has_w
    g = int(size_grid)
    sg = size + 2 * g
    n = len(x0)
    if (use_engine and not engine.inputs_resident()
            and n * sg * sg < ny * nx):
        # a tight-memory session dropped the raw device inputs after
        # step 01: the device gather would re-upload the whole field
        # (2*Nz*Ny*Nx floats — tens of seconds at north-star scale on a
        # slow link) for a handful of windows.  Cut the windows from the
        # host raw data and upload just them (2*n*Nz*sg^2 floats)
        # whenever that moves fewer bytes.
        use_engine = False
    sanitize = False
    if not use_engine:
        # raw/var may be passed as None with an engine: cut the windows
        # straight from the session cube's RAW (NaN-carrying) arrays and
        # zero/inf-fill PER WINDOW below — materializing the filled full
        # views (orig.cube_raw / orig.var) costs several full-cube scan
        # + copy passes (measured 40+ s of host CPU at full-field scale
        # for a handful of windows)
        if raw is None or var is None:
            c = engine.orig.cube
            raw = np.asarray(c.data, dtype=np.float32)
            var = c.var
            var_arr = (np.asarray(var, np.float32) if var is not None
                       else np.ones_like(raw))
            cube_mask = c.mask  # explicit-mask sessions: fill those too
            sanitize = True
        else:
            raw = np.asarray(raw, dtype=np.float32)
            var_arr = np.asarray(var, dtype=np.float32)
    d0 = None
    if order_dct is not None:
        d0 = jnp.asarray(dctmat(nl, order_dct))
    psf_dev = jnp.asarray(psf_arr)

    from ..utils import progressbar

    results = {k: [] for k in ("flux", "residual", "line", "line_var", "y", "x", "z", "ok")}
    pending = None  # 1-deep software pipeline: fetch chunk i while i+1 runs

    def collect(out, b):
        # ONE batched transfer for the chunk's eight result arrays
        host = jax.device_get(out)
        for k in results:
            results[k].append(host[k][:b])

    for i0 in progressbar(range(0, n, batch), desc="lines", leave=False):
        ii = slice(i0, min(n, i0 + batch))
        xs = np.asarray(x0[ii], dtype=int)
        ys = np.asarray(y0[ii], dtype=int)
        zs = np.asarray(z0[ii], dtype=int)
        b = len(xs)
        pad = batch - b  # fixed-size chunks: one compile for the whole run
        xs_p = np.concatenate([xs, np.zeros(pad, int)])
        ys_p = np.concatenate([ys, np.zeros(pad, int)])
        zs_p = np.concatenate([zs, np.zeros(pad, int)])

        if use_engine:
            red_dat, red_var = engine.minicubes(xs_p, ys_p, sg)
            red_wgt = None
        else:
            # host-cut windows: build only the b real ones and pad the
            # chunk ON DEVICE — the pad rows are all-zero/inf and would
            # otherwise cross the link as dead bytes (and cost a host
            # memset of a chunk-sized buffer)
            red_dat = np.zeros((b, nl, sg, sg), dtype=np.float32)
            red_var = np.full((b, nl, sg, sg), np.inf, dtype=np.float32)
            red_wgt = (
                np.zeros((b, psf_arr.shape[0], sg, sg), np.float32)
                if has_w else None
            )
            h = sg // 2
            for j in range(b):
                yy0, xx0 = ys[j] - h, xs[j] - h
                sy0, sy1 = max(0, yy0), min(ny, yy0 + sg)
                sx0, sx1 = max(0, xx0), min(nx, xx0 + sg)
                dy0, dx0 = sy0 - yy0, sx0 - xx0
                red_dat[j, :, dy0 : dy0 + sy1 - sy0, dx0 : dx0 + sx1 - sx0] = raw[
                    :, sy0:sy1, sx0:sx1
                ]
                red_var[j, :, dy0 : dy0 + sy1 - sy0, dx0 : dx0 + sx1 - sx0] = var_arr[
                    :, sy0:sy1, sx0:sx1
                ]
                if has_w:
                    red_wgt[j, :, dy0 : dy0 + sy1 - sy0, dx0 : dx0 + sx1 - sx0] = wmaps[
                        :, sy0:sy1, sx0:sx1
                    ]
                if sanitize:
                    # same semantics as cube_raw / var_filled, applied to
                    # just this window: data zero-filled at its non-finite
                    # (+ explicit-mask) voxels, variance inf-filled there
                    # and at its own non-finite entries
                    dwin = red_dat[j, :, dy0:dy0 + sy1 - sy0,
                                   dx0:dx0 + sx1 - sx0]
                    vwin = red_var[j, :, dy0:dy0 + sy1 - sy0,
                                   dx0:dx0 + sx1 - sx0]
                    bad = ~np.isfinite(dwin)
                    if cube_mask is not None:
                        bad |= cube_mask[:, sy0:sy1, sx0:sx1]
                    dwin[bad] = 0.0
                    vwin[bad | ~np.isfinite(vwin)] = np.inf
            if pad:
                bp = ((0, pad), (0, 0), (0, 0), (0, 0))
                red_dat = jnp.pad(jnp.asarray(red_dat), bp)
                red_var = jnp.pad(jnp.asarray(red_var), bp,
                                  constant_values=np.inf)
                if has_w:
                    red_wgt = jnp.pad(jnp.asarray(red_wgt), bp)
        out = grid_analysis_batch(
            jnp.asarray(red_dat),
            jnp.asarray(red_var),
            jnp.asarray(zs_p),
            jnp.asarray(ys_p),
            jnp.asarray(xs_p),
            psf_dev,
            jnp.asarray(red_wgt) if has_w else jnp.zeros((batch,), jnp.float32),
            d0,
            ny,
            nx,
            size_grid=g,
            criteria=criteria,
            horiz=horiz,
            horiz_psf=horiz_psf,
            has_weights=has_w,
        )
        if pending is not None:
            collect(*pending)
        pending = (out, b)
    if pending is not None:
        collect(*pending)
    if use_engine and engine.tight_memory:
        # the gather's re-uploaded raw field must not linger on a tight
        # chip (no later step reads it on device in tight mode)
        engine.drop_inputs("cube", "var")
    return {k: np.concatenate(v) if n else np.empty(0) for k, v in results.items()}
