"""Streaming cube ingest: overlap the FITS decode with the device upload.

The reference reads the whole cube into memory before anything else
(reference origin.py:211-214 via mpdaf).  On a TPU host the raw
cube + variance must ALSO cross the host-device link (the engine's
front-end runs on device), and round-4 measurements showed the upload
fully serialized behind the decode: a cold full-size MUSE field pays
~3 minutes of disk read and THEN ~1 minute of upload.

This module scans the FITS headers first (:func:`origin_tpu.fitsio.scan`
— no payload read), then decodes the DATA / STAT image payloads in
z-slabs, handing each decoded slab to an upload callback the moment it
is byteswapped.  The engine queues the slabs on its single upload worker
and concatenates them on device, so the transfer streams BEHIND the
decode and step 01 joins an upload that is already mostly (cold: fully)
complete.

Only the plain raw-cube layout streams: 3-D float32/float64 DATA with an
optional same-shaped STAT, no BSCALE/BZERO.  Anything else falls back to
the eager :class:`origin_tpu.core.containers.Cube` reader.
"""

from __future__ import annotations

import os

import numpy as np

from .. import fitsio
from ..core.containers import Cube
from ..core.coords import WCS, WaveCoord

__all__ = ["IngestPlan"]

#: z-rows per decoded slab, sized so ~16 slabs cover a full MUSE field
#: (each slab is ~64 MB there) while a notebook-scale field still gets
#: ~8 upload overlap points
_SLAB_BYTES = int(float(os.environ.get("ORIGIN_TPU_INGEST_SLAB", "48e6")))


def _streamable(filename):
    """(hdus, data_idx, stat_idx) when the layout supports slab reads."""
    if os.environ.get("ORIGIN_TPU_STREAM_INGEST", "1") in ("0", "false"):
        return None
    try:
        hdus = fitsio.scan(filename)
    except OSError:
        return None
    data_idx = stat_idx = None
    for i, (hdr, _, nbytes) in enumerate(hdus):
        if nbytes == 0 or str(hdr.get("XTENSION", "")).strip() == "BINTABLE":
            continue
        if int(hdr.get("NAXIS", 0)) != 3:
            return None  # unexpected image payloads: eager reader decides
        if int(hdr["BITPIX"]) not in (-32, -64):
            return None
        if hdr.get("BSCALE", 1) != 1 or hdr.get("BZERO", 0) != 0:
            return None
        name = str(hdr.get("EXTNAME", "")).strip()
        if name == "STAT":
            stat_idx = i
        elif data_idx is None or name == "DATA":
            data_idx = i
        else:
            return None  # two data-like cubes: ambiguous, fall back
    if data_idx is None:
        return None
    if stat_idx is not None:
        dd = [int(hdus[data_idx][0][f"NAXIS{i}"]) for i in (1, 2, 3)]
        ss = [int(hdus[stat_idx][0][f"NAXIS{i}"]) for i in (1, 2, 3)]
        if dd != ss:
            return None
    return hdus, data_idx, stat_idx


class IngestPlan:
    """A scanned, streamable cube file; :meth:`read` decodes + uploads."""

    def __init__(self, filename, hdus, data_idx, stat_idx):
        self.filename = filename
        self._hdus = hdus
        self._data_idx = data_idx
        self._stat_idx = stat_idx
        hdr = hdus[data_idx][0]
        # FITS axes are x-fastest: NAXIS1=nx, NAXIS2=ny, NAXIS3=nz
        self.shape = (int(hdr["NAXIS3"]), int(hdr["NAXIS2"]),
                      int(hdr["NAXIS1"]))

    @classmethod
    def scan(cls, filename):
        """An IngestPlan for ``filename``, or None when the layout does
        not support streaming (the caller falls back to ``Cube``)."""
        got = _streamable(filename)
        if got is None:
            return None
        return cls(filename, *got)

    def _read_payload(self, fh, idx, upload):
        """Decode one image payload in z-slabs; returns the host array."""
        hdr, offset, _ = self._hdus[idx]
        nz, ny, nx = self.shape
        dtype = np.dtype(np.float32 if int(hdr["BITPIX"]) == -32
                         else np.float64)
        plane = ny * nx * dtype.itemsize
        step = max(1, _SLAB_BYTES // plane)
        out = np.empty(self.shape, dtype)
        fh.seek(offset)
        big = dtype.newbyteorder(">")
        for z0 in range(0, nz, step):
            z1 = min(nz, z0 + step)
            view = out[z0:z1]
            n = fh.readinto(memoryview(view).cast("B"))
            if n != view.nbytes:
                raise OSError(f"truncated FITS payload in {self.filename}")
            # the raw bytes are big-endian: swap in place (the view keeps
            # its native dtype, so no second buffer exists)
            view.byteswap(inplace=True)
            if upload is not None:
                upload(view if dtype.itemsize == 4
                       else view.astype(np.float32))
        return out

    def read(self, upload_data=None, upload_var=None):
        """Decode the cube, streaming slabs to the upload callbacks.

        ``upload_data`` / ``upload_var`` receive each float32 z-slab in
        order, immediately after its in-place byteswap — the upload of
        slab k rides the link while slab k+1 decodes.  Returns the fully
        populated :class:`Cube` (same content as ``Cube(filename)``:
        unfilled data/var, mask = non-finite pattern of the data).
        """
        with open(self.filename, "rb") as fh:
            data = self._read_payload(fh, self._data_idx, upload_data)
            var = None
            if self._stat_idx is not None:
                var = self._read_payload(fh, self._stat_idx, upload_var)

        m = ~np.isfinite(data)
        cube = Cube(data=data, var=var, mask=m if m.any() else None,
                    copy=False)
        # the mask above IS the non-finite pattern: let masked_invalid
        # serve it without re-scanning the cube
        cube._stamp_nonfinite_mask()
        cube.filename = self.filename
        cube.primary_header = self._hdus[0][0]
        hdr = self._hdus[self._data_idx][0]
        cube.data_header = hdr
        # same coordinate parsing as containers._Base._load
        cube.wcs = WCS.from_header(hdr, shape=self.shape[-2:])
        cube.wave = WaveCoord.from_header(hdr, axis=3, shape=self.shape[0])
        cube._sync_coord_shapes()
        return cube
