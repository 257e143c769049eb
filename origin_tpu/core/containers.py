"""Cube / Image / Spectrum containers.

Replaces the subset of ``mpdaf.obj.Cube/Image/Spectrum`` used by the reference
(see reference steps.py:284-299, source_masks.py:77-108,
source_creation.py:219-279): data + optional variance + optional boolean mask
(True = invalid), world coordinates, FITS round-trips (DATA/STAT extensions
with NaN-encoded masks), cutouts that keep the requested size and flag
out-of-field pixels, and the handful of reductions the pipeline needs.
"""

from __future__ import annotations

import numpy as np

from .. import fitsio
from .coords import WCS, WaveCoord

__all__ = ["Cube", "Image", "Spectrum", "Quant16", "QuantCube"]

# primary-header marker of a sparse scaled-int16 cube file (the session
# storage of the four local-extrema cubes; see _Base.write / _Base._load)
SPARSE_KEY = "ORITPUSP"


def _store_sparse():
    import os

    return os.environ.get("ORIGIN_TPU_STORE_SPARSE", "1").lower() not in (
        "0", "false")


class Quant16:
    """Scaled-int16 representation of a float32 array: ``q * scale``.

    Detection-statistic cubes (the GLR correlation, its profile-min
    variant, the local-extrema cubes) are noise-normalized by
    construction: their useful precision is far above the int16
    quantization floor ``max|x| / 32766``.  Carrying them host-side in
    this form (a) halves the device->host transfer, (b) halves the FITS
    bytes — they are stored as BITPIX 16 images with a ``BSCALE`` card,
    which any FITS reader decodes transparently — and (c) skips the
    float32 big-endian conversion pass at write time.  ``decode()``
    materializes the float32 view for numeric consumers.

    ``pairs``, when set, holds the ``(flat_index, value)`` arrays of the
    nonzero entries (the sparse device transfer of a local-extrema cube,
    pipeline.engine._scatter_sparse).  A wire carrying pairs can be
    checkpointed as a tiny sparse FITS table instead of the dense int16
    image — on a throughput-throttled disk the four extrema cubes'
    dense files otherwise dominate the checkpoint's write time.
    """

    __slots__ = ("q", "scale", "pairs")

    def __init__(self, q, scale, pairs=None):
        self.q = np.asarray(q)
        self.scale = float(scale)
        self.pairs = pairs

    @property
    def shape(self):
        return self.q.shape

    @property
    def nbytes(self):
        return self.q.nbytes

    def decode(self, key=None):
        """float32 values (optionally of just the ``key`` window)."""
        arr = self.q[key] if key is not None else self.q
        arr = arr.astype(np.float32)
        arr *= np.float32(self.scale)
        return arr


class _Base:
    """Shared implementation: data/var/mask + FITS I/O."""

    _ndim = None

    def __init__(self, filename=None, data=None, var=None, mask=None, wcs=None,
                 wave=None, primary_header=None, copy=True):
        self.filename = filename
        self.primary_header = primary_header or fitsio.Header()
        self.data_header = fitsio.Header()
        self.wcs = wcs
        self.wave = wave
        if filename is not None and data is None:
            self._load(filename)
        else:
            data = np.asarray(data)
            self.data = np.array(data, copy=copy)
            self.var = None if var is None else np.array(var, copy=copy)
            if mask is None:
                m = ~np.isfinite(self.data) if self.data.dtype.kind == "f" else None
                self.mask = m if (m is not None and m.any()) else None
                if self.data.dtype.kind == "f":
                    self._stamp_nonfinite_mask()
            elif mask is False or (np.ndim(mask) == 0 and not mask):
                # False / np.ma.nomask (mpdaf's "no mask" sentinel): the
                # scalar would also trip numpy 2's copy=False strictness
                self.mask = None
            else:
                self.mask = np.array(mask, dtype=bool, copy=copy)
        self._sync_coord_shapes()

    def _sync_coord_shapes(self):
        shape = self.shape
        if self.wcs is not None and self.wcs.shape is None:
            self.wcs.shape = shape[-2:] if len(shape) >= 2 else None
        if self.wave is not None and self.wave.shape is None and len(shape) != 2:
            self.wave.shape = shape[0]

    # -- basic properties ----------------------------------------------------
    @property
    def data(self):
        if self._data_arr is None:
            # dense-int16 session file loaded wire-only (_load): decode
            # on first dense access, so a resumed session that consumes
            # the cube through its wire (engine uploads, int16 subcube
            # windows, re-parks) never holds wire AND float32 together
            w = getattr(self, "_wire16", None)
            if w is not None and getattr(w, "q", None) is not None \
                    and w.q.size:
                self._data_arr = w.decode()
        return self._data_arr

    @data.setter
    def data(self, val):
        self._data_arr = val
        # replaced content: a stamped derived-mask shortcut is stale
        self._mask_is_nonfinite = False
        # replaced content invalidates a kept int16 wire (loaded session
        # statistic files keep theirs for sparse/int16 re-parks and
        # half-size engine re-uploads; see _load)
        if getattr(self, "_wire16", None) is not None:
            self._wire16 = None
        # ... and a recipe-file provenance stamp: the generator file no
        # longer describes this content, so a session write() must park
        # it as a dense file (products._recipe_current) instead of
        # skipping the save
        if getattr(self, "_recipe_source", None) is not None:
            self._recipe_source = None
        # content generation: lets ProductStore.park_dirty distinguish a
        # replaced product from a plain re-read on a resumed session
        self._gen = getattr(self, "_gen", 0) + 1

    @property
    def shape(self):
        if self.__dict__.get("_data_arr") is None:
            w = getattr(self, "_wire16", None)
            q = getattr(w, "q", None)
            if q is not None and q.size:
                return q.shape
        return self.data.shape

    @property
    def ndim(self):
        return self.data.ndim

    @property
    def dtype(self):
        if self.__dict__.get("_data_arr") is None and \
                getattr(self, "_wire16", None) is not None:
            return np.dtype(np.float32)  # the wire decodes to float32
        return self.data.dtype

    @property
    def _data(self):
        # mpdaf-compatible alias for raw data access
        return self.data

    @_data.setter
    def _data(self, val):
        self.data = np.asarray(val)

    @property
    def _mask(self):
        if self.mask is None:
            return np.zeros(self.shape, dtype=bool)
        return self.mask

    def get_mask(self):
        return self._mask

    def masked_invalid(self):
        # loaded/streamed cubes derived their mask as EXACTLY the data's
        # non-finite pattern: serve it instead of re-scanning the full
        # array (10+ s per access at full-field scale).  The shortcut is
        # dropped when the data or the mask object was replaced since.
        if getattr(self, "_mask_is_nonfinite", False) and \
                self.mask is getattr(self, "_derived_mask", ()):
            m = self.mask
            return m if m is not None else np.zeros(self.shape, bool)
        m = ~np.isfinite(self.data)
        if self.mask is not None:
            m |= self.mask
        return m

    def _stamp_nonfinite_mask(self):
        """Record that ``self.mask`` IS the data's non-finite pattern
        (or None with all-finite data) — see :meth:`masked_invalid`."""
        self._mask_is_nonfinite = True
        self._derived_mask = self.mask

    def filled(self, fill_value=0.0):
        """Data with masked entries replaced by fill_value."""
        if self.mask is None:
            # stamped loads know mask None means all-finite: skip the
            # full-array scan (seconds at full-field scale)
            if (getattr(self, "_mask_is_nonfinite", False)
                    and self._derived_mask is None) \
                    or np.isfinite(self.data).all():
                return self.data
        out = np.array(self.data, copy=True)
        out[self.masked_invalid()] = fill_value
        return out

    def var_filled(self, fill_value=np.inf):
        if self.var is None:
            return None
        out = np.array(self.var, copy=True)
        bad = ~np.isfinite(out)
        if self.mask is not None:
            bad |= self.mask
        out[bad] = fill_value
        return out

    def _dense_cls(self):
        """Container class for derived results (copy/abs).

        Keyed on dimensionality like :meth:`_binop`: subclasses with
        non-standard constructors (device-resident ``DeferredCube``,
        recipe-backed ``LazyRecipeCube``, wire-carrying ``QuantCube``)
        produce plain dense containers instead of trying to re-invoke
        their own ``__init__`` with ``data=``.
        """
        return {3: Cube, 2: Image, 1: Spectrum}.get(self.ndim, type(self))

    def copy(self):
        new = self._dense_cls()(
            data=self.data, var=self.var, mask=self.mask,
            wcs=self._copy_wcs(), wave=self._copy_wave(), copy=True,
        )
        new.primary_header = self.primary_header.copy()
        return new

    def _copy_wcs(self):
        if self.wcs is None:
            return None
        return WCS(crpix=tuple(self.wcs.crpix), crval=tuple(self.wcs.crval),
                   cd=self.wcs.cd.copy(), shape=self.wcs.shape)

    def _copy_wave(self):
        if self.wave is None:
            return None
        return WaveCoord(crpix=self.wave.crpix, crval=self.wave.crval,
                         cdelt=self.wave.cdelt, ctype=self.wave.ctype,
                         shape=self.wave.shape)

    def abs(self):
        return self._dense_cls()(
            data=np.abs(self.data), var=self.var, mask=self.mask,
            wcs=self._copy_wcs(), wave=self._copy_wave(), copy=False)

    # -- arithmetic ------------------------------------------------------------
    def _binop(self, other, op):
        if isinstance(other, _Base):
            odata, omask = other.data, other.mask
        else:
            odata, omask = np.asarray(other), None
        data = op(self.data, odata)
        mask = None
        if self.mask is not None or omask is not None:
            mask = np.broadcast_to(self._mask, data.shape).copy()
            if omask is not None:
                mask |= np.broadcast_to(omask, data.shape)
        cls = {3: Cube, 2: Image, 1: Spectrum}[data.ndim]
        return cls(data=data, mask=mask, wcs=self.wcs if data.ndim >= 2 else None,
                   wave=self.wave if data.ndim != 2 else None, copy=False)

    def __mul__(self, other):
        return self._binop(other, lambda a, b: a * b)

    __rmul__ = __mul__

    def __add__(self, other):
        return self._binop(other, lambda a, b: a + b)

    def __sub__(self, other):
        return self._binop(other, lambda a, b: a - b)

    # -- reductions --------------------------------------------------------------
    def _reduce(self, func, axis):
        import warnings

        data = self.filled(np.nan)
        with np.errstate(invalid="ignore"), warnings.catch_warnings():
            # all-NaN slices (fully masked spaxels) are expected; the
            # resulting NaNs become the output mask below
            warnings.simplefilter("ignore", category=RuntimeWarning)
            out = func(data, axis=axis)
        if np.ndim(out) == 0:
            return float(out)
        mask = ~np.isfinite(out)
        # nansum returns 0 (not NaN) for all-NaN slices: mask those too, so
        # fully-masked spaxels don't masquerade as genuine zero flux
        if axis is not None:
            mask |= np.all(~np.isfinite(data), axis=axis)
        if out.ndim == 2:
            return Image(data=out, mask=mask if mask.any() else None, wcs=self.wcs,
                         copy=False)
        if out.ndim == 1 and self.ndim == 3 and axis in ((1, 2), (-2, -1)):
            return Spectrum(data=out, mask=mask if mask.any() else None,
                            wave=self.wave, copy=False)
        return out

    def mean(self, axis=None):
        return self._reduce(np.nanmean, axis)

    def sum(self, axis=None):
        return self._reduce(np.nansum, axis)

    def max(self, axis=None):
        return self._reduce(np.nanmax, axis)

    def min(self, axis=None):
        return self._reduce(np.nanmin, axis)

    # -- I/O ----------------------------------------------------------------------
    def wire16(self):
        """The product's :class:`Quant16` wire, when it carries one.

        Plain containers only do after loading a sparse extrema file
        (``_load`` keeps the pairs so a re-park stays sparse);
        :class:`DeferredCube` returns the quantized transfer so
        :meth:`write` can store it as a scaled BITPIX-16 image without
        ever decoding the full float32 array.
        """
        return getattr(self, "_wire16", None)

    def _data_header(self):
        """wcs/wave/EXTNAME header for the DATA extension.

        Shape-aware (never touches ``self.data``): on a wire-only int16
        cube the data property access would decode the full float32
        array just to pick the wave header axis."""
        dhdr = fitsio.Header()
        shape = self.shape
        if self.wcs is not None:
            self.wcs.to_header(dhdr)
        if self.wave is not None and len(shape) in (1, 3):
            self.wave.to_header(dhdr, axis=3 if len(shape) == 3 else 1)
        dhdr["EXTNAME"] = "DATA"
        return dhdr

    def write(self, filename, savemask="nan", convert_float32=False, **kwargs):
        wire = self.wire16()
        if (wire is not None and self.var is None and self.mask is None
                and getattr(wire, "pairs", None) is not None
                and len(self.shape) == 3 and _store_sparse()):
            # mostly-zero statistic cube (local extrema): store the
            # (flat index, int16 value) pairs as a FITS binary table —
            # ~1000x smaller than the dense image on typical fields.
            # Reading it back through Cube() reconstructs the dense
            # float32 array bit-identically to the dense int16 file's
            # decode; ORIGIN_TPU_STORE_SPARSE=0 restores dense files
            fidx, qvals = wire.pairs
            dhdr = self._data_header()
            phdr = self.primary_header.copy()
            phdr[SPARSE_KEY] = (
                "extrema16", "sparse scaled-int16 cube (origin_tpu)"
            )
            phdr["SPSCALE"] = wire.scale, "physical = SPSCALE * VAL"
            nz, ny, nx = self.shape
            phdr["SPNZ"] = int(nz)
            phdr["SPNY"] = int(ny)
            phdr["SPNX"] = int(nx)
            from collections import OrderedDict

            cols = OrderedDict(
                IDX=np.asarray(fidx), VAL=np.asarray(qvals, np.int16)
            )
            fitsio.write(filename, [
                fitsio.HDU(header=phdr),
                fitsio.HDU(data=cols, header=dhdr),
            ])
            return
        if (wire is not None and self.var is None and self.mask is None
                and wire.q.shape == self.shape):
            dhdr = self._data_header()
            dhdr["BSCALE"] = wire.scale, "physical = BSCALE * stored"
            dhdr["BZERO"] = 0.0
            fitsio.write(filename, [
                fitsio.HDU(header=self.primary_header.copy()),
                fitsio.HDU(data=wire.q, header=dhdr),
            ])
            return
        data = self.data
        if savemask == "nan" and self.mask is not None and data.dtype.kind == "f":
            data = np.array(data, copy=True)
            data[self.mask] = np.nan
        if convert_float32 and data.dtype == np.float64:
            data = data.astype(np.float32)
        dhdr = self._data_header()
        hdus = [
            fitsio.HDU(header=self.primary_header.copy()),
            fitsio.HDU(data=data, header=dhdr),
        ]
        if self.var is not None:
            shdr = dhdr.copy()
            shdr["EXTNAME"] = "STAT"
            hdus.append(fitsio.HDU(data=self.var, header=shdr))
        fitsio.write(filename, hdus)

    def _load(self, filename):
        hdus = fitsio.read(filename)
        self.primary_header = hdus[0].header
        if self.primary_header.get(SPARSE_KEY) and len(hdus) > 1:
            # sparse scaled-int16 cube (see write): scatter the pairs
            # into a dense float32 array — same values as decoding the
            # dense int16 file this replaces
            phdr = self.primary_header
            shape = (int(phdr["SPNZ"]), int(phdr["SPNY"]), int(phdr["SPNX"]))
            scale = np.float32(phdr["SPSCALE"])
            tbl = hdus[1]
            flat = np.zeros(int(np.prod(shape)), np.float32)
            idx = np.asarray(tbl.data["IDX"])
            if idx.size:
                flat[idx] = np.asarray(tbl.data["VAL"], np.float32) * scale
            self.data = flat.reshape(shape)
            self.var = None
            self.mask = None
            hdr = tbl.header
            self.wcs = WCS.from_header(hdr, shape=shape[-2:])
            self.wave = WaveCoord.from_header(hdr, axis=3, shape=shape[0])
            self.data_header = hdr
            # keep the pairs: a later write() re-parks the (read-only
            # diagnostic) cube sparsely instead of as a dense float32
            self._wire16 = Quant16(
                np.zeros(0, np.int16), float(scale),
                pairs=(idx, np.asarray(tbl.data["VAL"], np.int16)),
            )
            del phdr[SPARSE_KEY]  # re-written fresh by write()
            return
        data_hdu = None
        stat_hdu = None
        for h in hdus:
            if h.data is None or isinstance(h.data, dict):
                continue
            if h.name == "DATA" or data_hdu is None and h.name not in ("STAT",):
                if data_hdu is None or h.name == "DATA":
                    data_hdu = h
            if h.name == "STAT":
                stat_hdu = h
        if data_hdu is None:
            raise OSError(f"no image data in {filename}")
        wq = getattr(data_hdu, "wire16_q", None)
        if (wq is not None and stat_hdu is None
                and wq.shape == np.asarray(data_hdu.data).shape):
            # a scaled-int16 session statistic cube: keep ONLY the
            # undecoded buffer as the wire (the decode is always finite,
            # so no mask pass is needed, and .data re-decodes lazily on
            # first dense access).  subcube() then cuts int16 windows
            # (per-source ORI_CORREL/ORI_SNCUBE files stay int16 on a
            # resumed session, as on a live one), a re-park skips the
            # re-quantization, and the engine re-uploads half the bytes
            # and dequantizes on device.  The wire is dropped if .data
            # is reassigned — but NOT on an in-place mutation of a
            # decoded array, which no pipeline path performs (session
            # statistic files are read-only products)
            self.var = None
            self.mask = None
            self._data_arr = None
            self._wire16 = Quant16(wq, data_hdu.wire16_scale)
        else:
            self.data = np.asarray(data_hdu.data)
            self.var = None if stat_hdu is None else np.asarray(stat_hdu.data)
            if self.data.dtype.kind == "f":
                m = ~np.isfinite(self.data)
                self.mask = m if m.any() else None
                self._stamp_nonfinite_mask()
            else:
                self.mask = None
        hdr = data_hdu.header
        # coordinate parsing must not touch self.data: on a wire-only
        # int16 load that property access would decode the dense float32
        # cube the lazy load just avoided
        shape = self.shape
        if len(shape) >= 2:
            self.wcs = WCS.from_header(hdr, shape=shape[-2:])
        if len(shape) in (1, 3):
            axis = 3 if len(shape) == 3 else 1
            self.wave = WaveCoord.from_header(hdr, axis=axis, shape=shape[0])
        self.data_header = hdr


def _norm_slice(sl, n):
    """``sl`` as a slice: passed through, or an integer's length-1 window
    (numpy negative-index semantics, via :func:`int_window`)."""
    if isinstance(sl, slice):
        return sl
    return int_window(sl, n)


def int_window(i, n):
    """A length-1 slice covering integer index ``i`` of an axis of size
    ``n``, with numpy's negative-index semantics (``-1`` is the last
    element, not an empty window — ``slice(-1, 0)`` would be)."""
    i = int(i)
    if i < 0:
        i += n
    return slice(i, i + 1)


def cutout_window(y, x, size):
    """Start indices of a (size x size) cutout centred at (y, x).

    THE shared convention: Cube.subcube, Image.subimage and the batched
    device cutout path (artifacts.masks) must all agree on it, or
    device-fetched windows would silently shift against host ones.
    """
    size = int(size)
    return int(np.rint(y)) - size // 2, int(np.rint(x)) - size // 2


def cutout_wcs(wcs, y0, x0, size):
    """WCS of a (size x size) cutout starting at pixel (y0, x0)."""
    if wcs is None:
        return None
    return WCS(
        crpix=(wcs.crpix[0] - y0, wcs.crpix[1] - x0),
        crval=tuple(wcs.crval),
        cd=wcs.cd.copy(),
        shape=(size, size),
    )


class Cube(_Base):
    """(Nz, Ny, Nx) spectral cube."""

    _ndim = 3

    def _region(self, zsl, ysl, xsl):
        """(data, var, mask) blocks for a rectangular region.

        Subclasses holding device-resident data override this to fetch
        only the requested region (see pipeline.engine.DeferredCube).
        A cube loaded wire-only (dense scaled-int16 session file) decodes
        just the requested window instead of materializing the full
        float32 cube.
        """
        if self.var is None and self.mask is None and \
                self.__dict__.get("_data_arr") is None:
            w = getattr(self, "_wire16", None)
            q = getattr(w, "q", None)
            if q is not None and q.ndim == 3 and q.shape == self.shape:
                return w.decode((zsl, ysl, xsl)), None, None
        return (
            self.data[zsl, ysl, xsl],
            None if self.var is None else self.var[zsl, ysl, xsl],
            None if self.mask is None else self.mask[zsl, ysl, xsl],
        )

    def __getitem__(self, item):
        if isinstance(item, (int, np.integer)):
            item = (item,)
        if not isinstance(item, tuple):
            item = (item,)
        item = item + (slice(None),) * (3 - len(item))
        zsl, ysl, xsl = item
        if all(isinstance(sl, (int, np.integer, slice))
               for sl in (zsl, ysl, xsl)):
            # the windowed serving path: device-resident and lazy-recipe
            # cubes fetch/rebuild only the requested window instead of
            # materializing the full cube for an indexed cutout
            data, var, mask = self._region(zsl, ysl, xsl)
            if var is None and self.var is not None:
                var = self.var[zsl, ysl, xsl]
            if mask is None and self.mask is not None:
                mask = self.mask[zsl, ysl, xsl]
        else:
            # fancy (array/boolean) indexing: plain numpy semantics on
            # the dense arrays
            data = self.data[zsl, ysl, xsl]
            var = self.var[zsl, ysl, xsl] if self.var is not None else None
            mask = (self.mask[zsl, ysl, xsl]
                    if self.mask is not None else None)
        if data.ndim == 3:
            wave = self.wave[_norm_slice(zsl, self.shape[0])] if (
                self.wave is not None and isinstance(zsl, slice)) else self.wave
            wcs = self.wcs[ysl, xsl] if self.wcs is not None else None
            return Cube(data=data, var=var, mask=mask, wcs=wcs, wave=wave, copy=False)
        z_int = not isinstance(zsl, slice)
        if data.ndim == 2 and z_int:  # one channel
            wcs = self.wcs[ysl, xsl] if self.wcs is not None else None
            return Image(data=data, var=var, mask=mask, wcs=wcs, copy=False)
        if data.ndim == 1 and not z_int:  # one spaxel
            wave = (
                self.wave[zsl] if self.wave is not None else None
            )
            return Spectrum(data=data, var=var, mask=mask, wave=wave, copy=False)
        # cross-sections (e.g. cube[:, 2, :] or cube[2, 3, :]) have no
        # well-defined Cube/Image/Spectrum coordinates: return the raw array
        return data

    def subcube(self, center, size, lbda=None, unit_center=None, unit_size=None):
        """Extract a (size x size) spatial cutout centred on ``center``.

        ``center`` is (y, x) in pixels when ``unit_center`` is None, else
        (dec, ra) in degrees.  The returned cube always has the requested
        size; pixels outside the field are masked.
        """
        if unit_center is not None:
            (y, x), = self.wcs.sky2pix([center])
        else:
            y, x = center
        size = int(size)
        nz, ny, nx = self.shape
        y0, x0 = cutout_window(y, x, size)
        zsl = slice(0, nz)
        if lbda is not None:
            k1 = int(self.wave.pixel(lbda[0], nearest=True))
            k2 = int(self.wave.pixel(lbda[1], nearest=True))
            zsl = slice(k1, k2 + 1)
        nzz = zsl.stop - zsl.start
        sy0, sy1 = max(0, y0), min(ny, y0 + size)
        sx0, sx1 = max(0, x0), min(nx, x0 + size)
        if sy1 - sy0 == size and sx1 - sx0 == size:
            wire = self._subcube_wire() if self.var is None else None
            if wire is not None:
                # the parent is a quantized statistic cube: the cutout is
                # an int16 window copy carried as-is — per-source FITS
                # files then store it scaled-int16 too, and neither side
                # of the cut pays a float32 decode unless a numeric
                # consumer asks for one
                q = np.array(wire.q[zsl, y0:y0 + size, x0:x0 + size],
                             order="C", copy=True)
                wave = self._copy_wave()
                if lbda is not None and wave is not None:
                    wave = self.wave[zsl]
                return QuantCube(Quant16(q, wire.scale),
                                 wcs=cutout_wcs(self.wcs, y0, x0, size),
                                 wave=wave)
            # fully in-field window (the common case): one contiguous copy
            # per array, no fill pass — at 51 sources x 4 cutouts of a
            # notebook-scale cube the memsets alone are seconds of step 11
            dblock, vblock, mblock = self._region(
                zsl, slice(y0, y0 + size), slice(x0, x0 + size)
            )
            # one strided memcpy per array (never a view: _region may hand
            # back slices of the parent's buffers)
            data = np.array(dblock, order="C", copy=True)
            if vblock is not None:
                var = np.array(vblock, order="C", copy=True)
            elif self.var is not None:
                var = np.full((nzz, size, size), np.inf,
                              dtype=self.var.dtype)
            else:
                var = None
            mask = (np.array(mblock, order="C", copy=True)
                    if mblock is not None
                    else np.zeros((nzz, size, size), dtype=bool))
            wcs = cutout_wcs(self.wcs, y0, x0, size)
            wave = self._copy_wave()
            if lbda is not None and wave is not None:
                wave = self.wave[zsl]
            return Cube(data=data, var=var, mask=mask, wcs=wcs, wave=wave,
                        copy=False)
        data = np.zeros((nzz, size, size), dtype=self.dtype)
        mask = np.ones((nzz, size, size), dtype=bool)
        var = None
        if self.var is not None:
            var = np.full((nzz, size, size), np.inf, dtype=self.var.dtype)
        if sy0 < sy1 and sx0 < sx1:
            dy0, dx0 = sy0 - y0, sx0 - x0
            # a quantized parent decodes only the in-field window (the
            # partial cutout needs NaN outside the field, which int16
            # cannot carry, so the WINDOW is float32 — but the parent must
            # not pay a full-cube decode for one edge source, which would
            # also strand every LATER source's cutout at float32)
            wire = self._subcube_wire() if self.var is None else None
            if wire is not None:
                dblock = wire.decode(
                    (zsl, slice(sy0, sy1), slice(sx0, sx1))
                )
                vblock = mblock = None
            else:
                dblock, vblock, mblock = self._region(
                    zsl, slice(sy0, sy1), slice(sx0, sx1)
                )
            data[:, dy0 : dy0 + sy1 - sy0, dx0 : dx0 + sx1 - sx0] = dblock
            mask[:, dy0 : dy0 + sy1 - sy0, dx0 : dx0 + sx1 - sx0] = (
                mblock if mblock is not None else False
            )
            if var is not None and vblock is not None:
                var[:, dy0 : dy0 + sy1 - sy0, dx0 : dx0 + sx1 - sx0] = vblock
        wcs = cutout_wcs(self.wcs, y0, x0, size)
        wave = self._copy_wave()
        if lbda is not None and wave is not None:
            wave = self.wave[zsl]
        return Cube(data=data, var=var, mask=mask, wcs=wcs, wave=wave, copy=False)

    def _subcube_wire(self):
        """The parent's Quant16 wire when slicing it beats decoding.

        Plain cubes carry one only after loading a dense scaled-int16
        session file (``_load`` keeps the undecoded buffer), so resumed
        sessions cut the same int16 windows a live one does;
        :class:`DeferredCube` overrides (device-resident cubes keep
        using the device window slice)."""
        w = getattr(self, "_wire16", None)
        q = getattr(w, "q", None)
        if (q is not None and q.ndim == 3 and q.shape == self.shape
                and self.mask is None):
            return w
        return None

    def get_image(self, wave, unit_wave=None, method="sum"):
        """Image reduced over an (inclusive) spectral range.

        ``wave`` is (zmin, zmax) in pixels when ``unit_wave`` is None, else in
        wavelength units.
        """
        z1, z2 = wave
        if unit_wave is not None:
            z1 = int(self.wave.pixel(z1, nearest=True))
            z2 = int(self.wave.pixel(z2, nearest=True))
        z1 = max(0, int(z1))
        z2 = min(self.shape[0] - 1, int(z2))
        # windowed serving: a narrow band over a device-resident or
        # lazy-recipe cube fetches/rebuilds only those channels
        sub, _, msub = self._region(
            slice(z1, z2 + 1), slice(None), slice(None))
        if msub is None and self.mask is not None:
            msub = self.mask[z1 : z2 + 1]
        import warnings

        func = {"sum": np.nansum, "mean": np.nanmean, "max": np.nanmax}[method]
        if msub is not None:
            sub = np.where(msub, np.nan, sub)
        with np.errstate(invalid="ignore"), warnings.catch_warnings():
            warnings.simplefilter("ignore", category=RuntimeWarning)
            img = func(sub, axis=0)
        mask = ~np.isfinite(img)
        if method == "sum":
            mask |= np.all(~np.isfinite(sub), axis=0)
        img = np.where(mask, 0.0, img)
        return Image(data=img, mask=mask if mask.any() else None, wcs=self.wcs,
                     copy=False)


class QuantCube(Cube):
    """A Cube over a :class:`Quant16` window.

    Produced by :meth:`Cube.subcube` when the parent carries a wire
    (quantized detection-statistic cubes): :meth:`write` and the Source
    writer store the int16 buffer directly (BITPIX 16 + BSCALE), while
    ``.data`` decodes to float32 lazily for numeric consumers.
    """

    def __init__(self, wire, wcs=None, wave=None, primary_header=None):
        self.filename = None
        self.primary_header = primary_header or fitsio.Header()
        self.data_header = fitsio.Header()
        self.wcs = wcs
        self.wave = wave
        self.var = None
        self.mask = None
        self._wire = wire
        self._decoded = None
        self._sync_coord_shapes()

    @property
    def data(self):
        if self._decoded is None:
            self._decoded = self._wire.decode()
        return self._decoded

    @data.setter
    def data(self, val):
        self._decoded = np.asarray(val)
        self._wire = None  # replaced content: the wire is stale
        self._gen = getattr(self, "_gen", 0) + 1
        if getattr(self, "_recipe_source", None) is not None:
            self._recipe_source = None

    @property
    def shape(self):
        return (self._wire.shape if self._wire is not None
                else self._decoded.shape)

    @property
    def ndim(self):
        return len(self.shape)

    @property
    def dtype(self):
        return np.dtype(np.float32)

    def wire16(self):
        return self._wire

    def copy(self):
        return Cube(data=self.data, wcs=self._copy_wcs(),
                    wave=self._copy_wave(),
                    primary_header=self.primary_header.copy(), copy=True)


class Image(_Base):
    """(Ny, Nx) image."""

    _ndim = 2

    def __getitem__(self, item):
        if not isinstance(item, tuple):
            item = (item, slice(None))
        ysl, xsl = item
        data = self.data[ysl, xsl]
        var = self.var[ysl, xsl] if self.var is not None else None
        mask = self.mask[ysl, xsl] if self.mask is not None else None
        if data.ndim == 2:
            wcs = self.wcs[ysl, xsl] if self.wcs is not None else None
            return Image(data=data, var=var, mask=mask, wcs=wcs, copy=False)
        return data

    def subimage(self, center, size, unit_center=None, unit_size=None):
        if unit_center is not None:
            (y, x), = self.wcs.sky2pix([center])
        else:
            y, x = center
        size = int(size)
        ny, nx = self.shape
        y0, x0 = cutout_window(y, x, size)
        data = np.zeros((size, size), dtype=self.data.dtype)
        mask = np.ones((size, size), dtype=bool)
        sy0, sy1 = max(0, y0), min(ny, y0 + size)
        sx0, sx1 = max(0, x0), min(nx, x0 + size)
        if sy0 < sy1 and sx0 < sx1:
            dy0, dx0 = sy0 - y0, sx0 - x0
            data[dy0 : dy0 + sy1 - sy0, dx0 : dx0 + sx1 - sx0] = self.data[
                sy0:sy1, sx0:sx1
            ]
            mask[dy0 : dy0 + sy1 - sy0, dx0 : dx0 + sx1 - sx0] = (
                self.mask[sy0:sy1, sx0:sx1] if self.mask is not None else False
            )
        wcs = cutout_wcs(self.wcs, y0, x0, size)
        return Image(data=data, mask=mask, wcs=wcs, copy=False)


class Spectrum(_Base):
    """(Nz,) spectrum."""

    _ndim = 1

    def __getitem__(self, item):
        data = self.data[item]
        var = self.var[item] if self.var is not None else None
        mask = self.mask[item] if self.mask is not None else None
        if np.ndim(data) == 1:
            wave = self.wave[_norm_slice(item, self.shape[0])] if (
                self.wave is not None and isinstance(item, slice)) else None
            return Spectrum(data=data, var=var, mask=mask, wave=wave, copy=False)
        return data

    def subspec(self, lmin, lmax, unit=None):
        """Trimmed spectrum over [lmin, lmax] (pixels when unit is None)."""
        if unit is not None:
            lmin = int(self.wave.pixel(lmin, nearest=True))
            lmax = int(self.wave.pixel(lmax, nearest=True))
        lmin = max(0, int(lmin))
        lmax = min(self.shape[0] - 1, int(lmax))
        return self[lmin : lmax + 1]

    def mean(self, axis=None):
        return float(np.nanmean(self.filled(np.nan)))
