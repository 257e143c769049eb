"""Host<->device wire layer: deferred products, transfer codecs, pools.

Extracted from ``engine.py`` (no behavior change): everything about HOW
bytes cross the host-device link and WHERE products live lives here —

- the background transfer/rebuild thread pools (one worker per link
  direction so the full-duplex link is never self-contended);
- :class:`DeferredCube`, the session product handle whose content stays
  on device until a host consumer actually needs it;
- the content-addressed upload cache for survey-constant instrument data;
- the per-lane host-CPU accounting (:data:`LANE_STATS`) and the
  foreground-CPU gate serializing byte-processing on few-core hosts;
- the wire codecs: int16 quantization, sparse (index, value) compaction
  for the mostly-zero extrema cubes, bit-packed small-integer cubes, and
  their device-side decodes for re-upload.

The reference pipeline has no counterpart: it exchanges dense float64
numpy arrays through process memory (reference steps.py:284-335).  On a
TPU host every cube-sized product crosses a real link, so the codec layer
IS the difference between a link-bound and a compute-bound pipeline.
"""

from __future__ import annotations

from collections import OrderedDict as _OrderedDict
from functools import partial
import threading as _threading

import numpy as np

import jax
import jax.numpy as jnp

from .. import fitsio
from ..core.containers import Cube, Quant16, int_window
from ..ops.spectra import _bucket4, _trim2

__all__ = [
    "DeferredCube", "LANE_STATS", "foreground_cpu", "lane_stats_reset",
    "lane_time", "materialize_deferred", "wait_for_foreground",
]


def _make_pool(attr, workers, prefix):
    global _POOLS
    pool = _POOLS.get(attr)
    if pool is None:
        from concurrent.futures import ThreadPoolExecutor

        pool = _POOLS[attr] = ThreadPoolExecutor(
            max_workers=workers, thread_name_prefix=prefix
        )
    return pool


def _copy_pool():
    """ONE worker for background device-to-host transfers.

    A thread calling ``np.asarray`` on a device array is the one reliable
    way to overlap transfers with later dispatches on every backend
    (``copy_to_host_async`` is a no-op on some and actively pathological
    on async tunnel transports).  A single worker makes the queue a strict
    priority order: concurrent bulk downloads would share the link
    round-robin, so the product every consumer blocks on (``cube_correl``
    feeds the per-source cutouts) would arrive LAST instead of first.
    """
    return _make_pool("d2h", 1, "origin-tpu-d2h")


def _upload_pool():
    """ONE worker for background host-to-device uploads.

    Separate from the download worker: the two directions of a
    full-duplex link don't contend, so a survey-mode session can upload
    the next field while the previous one's products stream out.
    """
    return _make_pool("h2d", 1, "origin-tpu-h2d")


def _host_pool():
    """Workers for host-side product rebuilds (no link traffic).

    Separate from the transfer workers so a CPU-bound rebuild (one host
    matmul + elementwise passes over a cube) never delays the link, and
    vice versa.  Rebuild closures may join transfer futures — distinct
    pools keep that dependency deadlock-free.
    """
    return _make_pool("host", 2, "origin-tpu-host")


_POOLS = {}


class DeferredCube(Cube):
    """A Cube whose data lives on device until first host access.

    Used as the DataObj value for cube-sized front-end products; session
    ``write()`` / plotting / host algorithms trigger the (one) download.
    ``post`` optionally transforms the downloaded array (e.g. dtype cast).
    ``sparse`` marks cubes that are mostly zero by construction (the
    local-extrema cubes: at most one voxel per max-filter box is nonzero),
    whose materialization transfers only (index, value) pairs instead of
    the dense array — on a slow host link the transfer shrinks ~25x.
    ``fetch``, when given, replaces the download entirely: a callable that
    REBUILDS the host array (e.g. cube_faint from the standardized cube
    plus the recorded PCA factors), so nothing cube-sized crosses the link.
    """

    def __init__(self, dev, wcs=None, wave=None, post=None, sparse=False,
                 fetch=None, fetch_link=False, recipe_save=None):
        import threading

        self.filename = None
        self.primary_header = fitsio.Header()
        self.data_header = fitsio.Header()
        self.wcs = wcs
        self.wave = wave
        self.var = None
        self.mask = None
        self._dev = dev
        self._shape = tuple(dev.shape)
        self._dtype = np.dtype(str(dev.dtype))
        self._host = None
        self._wire = None  # Quant16 transfer kept for write-time reuse
        self._post = post
        self._sparse = sparse
        self._fetch = fetch
        # writes the product's generator file instead of the dense cube
        # (recipes.py); None for products without an exact generator
        self._recipe_save = recipe_save
        # True when the custom fetch moves bulk data over the link (e.g.
        # a quantized wire): it then queues on the transfer worker, not
        # the host-rebuild workers
        self._fetch_link = fetch_link
        self._future = None
        self._gen = 0  # bumped by the data setter; guards window reads
        self._lock = threading.Lock()
        self._sync_coord_shapes()

    @property
    def device(self):
        """The device array, if still resident (None after materialize)."""
        return self._dev

    def prefetch(self):
        """Start a background materialization (idempotent).

        The transfer (or host rebuild) overlaps whatever the caller does
        next; the first ``.data`` access then just joins it.  Sparse cubes
        skip it (their dense transfer is exactly what the sparse path
        avoids).
        """
        with self._lock:
            if (self._host is None and self._wire is None
                    and self._future is None and not self._sparse):
                if self._fetch is not None:
                    # fetch-backed products stay prefetchable after a
                    # drop_device (tight recipe cubes): the background
                    # rebuild must still overlap the foreground phase
                    pool = (_copy_pool() if self._fetch_link
                            else _host_pool())
                    self._future = pool.submit(self._fetch)
                elif self._dev is not None:
                    dev = self._dev
                    self._future = _copy_pool().submit(
                        lambda: np.asarray(dev)
                    )

    def _materialize_locked(self):
        """Pull the host copy (or its Quant16 wire) off device; lock held."""
        if self._host is None and self._wire is None:
            if self._future is not None:
                # clear BEFORE joining: a transient transfer failure must
                # not poison the product — the next access retries from
                # the still-held source (_dev / _fetch)
                fut, self._future = self._future, None
                with _lane_timer("wire:join"), _foreground_paused():
                    # a join burns no CPU: release the foreground gate
                    # while blocked so ready background write jobs use
                    # the idle core instead of waiting out the phase
                    arr = fut.result()
            elif self._fetch is not None:
                # no background job was started for this product: the
                # consumer pays the fetch inline.  The wire:inline lane
                # makes that visible — a bulk lane row here means a
                # prefetch ordering bug upstream
                with _lane_timer("wire:inline"):
                    arr = self._fetch()
            elif self._dev is None:
                raise RuntimeError(
                    "product content was discarded before materialization "
                    "(engine.release() on an abandoned session)"
                )
            elif self._sparse:
                arr = _sparse_fetch(self._dev, quant=self._post is None)
            else:
                arr = np.asarray(self._dev)
            if isinstance(arr, Quant16):
                self._wire = arr
            else:
                if self._post is not None:
                    arr = self._post(arr)
                self._host = arr
            self._dev = None  # single owner: free HBM once on host

    def materialize(self):
        """Ensure the content left the device, without forcing a decode."""
        with self._lock:
            self._materialize_locked()

    def wire16(self):
        with self._lock:
            self._materialize_locked()
            return self._wire

    @property
    def recipe_active(self):
        """True when ``write`` will store the recipe, not the dense cube."""
        from .recipes import recipes_enabled

        return self._recipe_save is not None and recipes_enabled()

    @property
    def window_rebuildable(self):
        """True when window reads rebuild O(window) on host without the
        device copy — so consumers cutting a few cutouts need not force
        (or prefetch) the full-cube materialization."""
        return getattr(self._fetch, "region", None) is not None \
            and not self._fetch_link

    def write(self, filename, **kwargs):
        """Park the product: its tiny generator file when one exists
        (recipes.py), the dense cube otherwise."""
        if self.recipe_active:
            self._recipe_save(filename)
            return
        super().write(filename, **kwargs)

    def drop_device(self):
        """Free the device copy when the host can recreate the content.

        Safe only for cubes with a host copy, a wire, or a rebuild
        ``fetch`` (recipe-backed products): later ``.data`` access then
        rebuilds on host instead of downloading.  No-op otherwise.
        (For a LINK-fetch cube the content stays reachable through the
        fetch closure, which keeps its own device reference — so this
        does not actually free that HBM; :meth:`discard` does.)"""
        with self._lock:
            if (self._dev is not None and self._future is None
                    and (self._host is not None or self._wire is not None
                         or self._fetch is not None)):
                self._dev = None

    def discard(self):
        """Hard-free the device copy, even when that loses content.

        For an abandoned field (survey continuing past a failure,
        benchmark teardown) the HBM must be returned NOW: wire-fetch
        closures release the device array they pin, so a cube that was
        never materialized loses its content — a later access raises a
        clear RuntimeError instead of re-downloading.  Materialized or
        parked state is unaffected; an in-flight transfer is left to
        finish (its closure releases itself)."""
        with self._lock:
            self._dev = None
            rel = getattr(self._fetch, "release", None)
            if rel is not None and self._future is None:
                rel()
                self._fetch = None

    @property
    def data(self):
        with self._lock:
            self._materialize_locked()
            if self._host is None:
                # decode the wire once; the wire stays for write fidelity
                self._host = self._wire.decode()
            return self._host

    @data.setter
    def data(self, val):
        val = np.asarray(val)
        with self._lock:
            if self._future is not None:
                # join (ignoring failure) so a mid-flight materialization
                # cannot overwrite the assigned content afterwards
                fut, self._future = self._future, None
                try:
                    fut.result()
                except Exception:
                    pass
            rel = getattr(self._fetch, "release", None)
            if rel is not None:
                rel()  # unpin the wire closure's device array
            self._host = val
            # replaced content: every derived/source form is stale now
            self._wire = None
            self._dev = None
            self._fetch = None
            self._recipe_save = None
            self._recipe_source = None
            self._gen += 1
            self.__dict__.pop("_std_scalar", None)

    @property
    def shape(self):
        if self._host is not None:
            return self._host.shape
        if self._wire is not None:
            return self._wire.shape
        if self._dev is not None:
            return self._dev.shape
        # device dropped with only a rebuild fetch left (tight-memory
        # recipe products): the recorded construction shape
        return self._shape

    @property
    def ndim(self):
        return len(self.shape)

    @property
    def dtype(self):
        if self._host is not None:
            return self._host.dtype
        if self._wire is not None:
            return np.dtype(np.float32)
        dev_dtype = (np.dtype(str(self._dev.dtype))
                     if self._dev is not None else self._dtype)
        if self._post is not None:
            # dtype after the post-transform (e.g. int16 profile cube)
            return self._post(np.zeros(1, dev_dtype)).dtype
        return dev_dtype

    def _subcube_wire(self):
        """Quant16 wire for subcube cutting, when that beats decoding.

        Mirrors :meth:`_region`'s guard: a still-device-resident cube
        keeps using the device window slice; once a wire transfer is
        in flight (or arrived), cutting int16 windows from it avoids the
        full float32 decode."""
        with self._lock:
            if self._wire is not None:
                # int16 windows beat float32 slices even when a decoded
                # host copy also exists: the per-source FITS cutout then
                # stays scaled-int16 (half the bytes on a
                # throughput-throttled disk)
                return self._wire
            if self._host is not None:
                return None  # decoded, no wire kept: plain slicing
            if (self._dev is not None and self._future is None
                    and not self._fetch_link):
                # device-resident (a pure host REBUILD fetch does not
                # count: with recipe checkpointing it may never be
                # needed, so windows slice on device instead)
                return None
            if (self._dev is None and self._future is None
                    and getattr(self._fetch, "region", None) is not None
                    and not self._fetch_link):
                # dropped device, window-capable host rebuild: cutouts
                # go through _region's O(window) rebuild — forcing the
                # full materialization here would defeat it
                return None
            self._materialize_locked()
            return self._wire

    def _region(self, zsl, ysl, xsl):
        """Rectangular region fetch: slice on device while resident.

        Lets ``subcube`` (mask generation, per-source cutouts) download
        only the requested window instead of materializing the full cube.
        Uses ``dynamic_slice`` so every same-size window shares one
        compiled program (start offsets are traced, not baked in).

        When a full-cube background materialization is already in flight,
        joining it beats issuing device slices that would queue behind
        the bulk transfer on the link.  (A host-rebuildable cube whose
        rebuild has NOT started keeps device slicing: with recipe-form
        checkpointing the rebuild may otherwise never be needed at all.)
        """
        with self._lock:
            # snapshot the state once: a background park's materialization
            # can null _dev between an unlocked guard and its use, and a
            # concurrent data assignment swaps every source form (the
            # generation counter re-check below catches that case after
            # the unlocked window fetch/rebuild)
            w, host, dev, future, fetch, fetch_link, gen = (
                self._wire, self._host, self._dev, self._future,
                self._fetch, self._fetch_link, self._gen)
        orig_idx = (zsl, ysl, xsl)
        if w is not None and host is None:
            # materialized as a Quant16 wire: decode only the window
            # instead of forcing the full float32 decode through .data
            return w.decode((zsl, ysl, xsl)), None, None
        region_fn = getattr(fetch, "region", None)
        if (host is None and dev is None and future is None
                and region_fn is not None and not fetch_link
                and not any(isinstance(sl, slice)
                            and sl.step not in (None, 1)
                            for sl in (zsl, ysl, xsl))):
            # device copy dropped, only a host REBUILD fetch left (tight
            # recipe products): rebuild just the window — O(window) host
            # work instead of the full-cube rebuild a .data access pays
            nz, ny, nx = self._shape
            squeeze_z = not isinstance(zsl, slice)
            if squeeze_z:
                zsl = int_window(zsl, nz)
            squeeze_y = not isinstance(ysl, slice)
            if squeeze_y:
                ysl = int_window(ysl, ny)
            squeeze_x = not isinstance(xsl, slice)
            if squeeze_x:
                xsl = int_window(xsl, nx)
            block = region_fn(slice(*zsl.indices(nz)[:2]),
                              slice(*ysl.indices(ny)[:2]),
                              slice(*xsl.indices(nx)[:2]))
            with self._lock:
                stale = self._gen != gen
            if stale:
                # content replaced while the window rebuilt: serve the
                # now-current data (host path) instead of the stale
                # recipe rebuild
                return super()._region(*orig_idx)
            if self._post is not None:
                block = self._post(block)
            if squeeze_x:
                block = block[..., 0]
            if squeeze_y:
                block = block[:, 0] if block.ndim > 1 else block
            if squeeze_z:
                block = block[0]
            return block, None, None
        if (host is not None or dev is None or future is not None
                or (fetch is not None and fetch_link)):
            return super()._region(zsl, ysl, xsl)
        if any(
            isinstance(sl, slice) and sl.step not in (None, 1)
            for sl in (zsl, ysl, xsl)
        ):
            # strided windows are rare: materialize and defer to the host
            # path rather than silently returning the unstrided block
            return super()._region(zsl, ysl, xsl)
        nz, ny, nx = dev.shape
        squeeze_z = not isinstance(zsl, slice)
        if squeeze_z:
            zsl = int_window(zsl, nz)
        squeeze_y = not isinstance(ysl, slice)
        if squeeze_y:
            ysl = int_window(ysl, ny)
        squeeze_x = not isinstance(xsl, slice)
        if squeeze_x:
            xsl = int_window(xsl, nx)
        # slice.indices gives numpy's None-default and out-of-range clamping
        z0, z1 = zsl.indices(nz)[:2]
        y0, y1 = ysl.indices(ny)[:2]
        x0, x1 = xsl.indices(nx)[:2]
        block = np.asarray(
            _dyn_region(
                dev, z0, y0, x0,
                max(0, z1 - z0), max(0, y1 - y0), max(0, x1 - x0),
            )
        )
        with self._lock:
            stale = self._gen != gen
        if stale:
            # a concurrent data assignment replaced the content while the
            # device window was in flight: serve the current host data
            return super()._region(*orig_idx)
        if self._post is not None:
            block = self._post(block)
        # integer indices collapse their axis, matching the base class's
        # numpy indexing (same call must not change shape with residency)
        if squeeze_x:
            block = block[..., 0]
        if squeeze_y:
            block = block[:, 0] if block.ndim > 1 else block
        if squeeze_z:
            block = block[0]
        return block, None, None


_upload_cache = _OrderedDict()
_UPLOAD_CACHE_MAX = 32


def _upload_cache_bytes():
    """HBM budget for the cross-session constant cache (bytes)."""
    import os

    return int(float(os.environ.get("ORIGIN_TPU_UPLOAD_CACHE_BYTES", "256e6")))


def _upload_cached(arr):
    """Device handle for a small host constant, deduplicated by content.

    The instrument model (PSF bank, DFT factor matrices, profile banks)
    is identical for every field of a survey, but each session's step 05
    would re-upload it (~15 MB); on a slow host link that upload IS the
    warm step time.  Keyed by a content digest so value-equal arrays from
    different sessions share one resident copy.  LRU-bounded by both entry
    count and total bytes (``ORIGIN_TPU_UPLOAD_CACHE_BYTES``, default
    256 MB), so a heterogeneous survey cannot pin unbounded HBM.
    """
    import hashlib

    arr = np.ascontiguousarray(arr)
    # hash the buffer directly (tobytes() would copy the whole array)
    key = (
        arr.shape, str(arr.dtype),
        hashlib.blake2b(arr.data, digest_size=16).digest(),
    )
    dev = _upload_cache.get(key)
    if dev is not None and not dev.is_deleted():
        _upload_cache.move_to_end(key)  # LRU: a hit is a use
        return dev
    # purge deleted entries (backend teardown, donated buffers): they
    # hold no HBM but would distort the byte accounting and, on a key
    # hit, re-insert at a stale LRU position
    for k in [k for k, v in _upload_cache.items() if v.is_deleted()]:
        del _upload_cache[k]
    budget = _upload_cache_bytes()
    if int(arr.nbytes) > budget:
        # an over-budget array can never fit: upload it uncached instead
        # of flushing the whole cache to make room it won't use
        return jnp.asarray(arr)
    total = sum(int(v.nbytes) for v in _upload_cache.values())
    while _upload_cache and (
        len(_upload_cache) >= _UPLOAD_CACHE_MAX
        or total + int(arr.nbytes) > budget
    ):
        _, old = _upload_cache.popitem(last=False)
        total -= int(old.nbytes)
    dev = jnp.asarray(arr)
    _upload_cache[key] = dev
    return dev


@partial(jax.jit, static_argnames=("zl", "h", "w"))
def _dyn_region(dev, z0, y0, x0, zl, h, w):
    return jax.lax.dynamic_slice(dev, (z0, y0, x0), (zl, h, w))


#: block width of the two-stage compaction; 512 keeps the second-stage
#: scatter at ``cap x 512`` elements (a few MB) regardless of cube size
_COMPACT_BLOCK = 512

#: arrays at or below this size use the single-stage compaction (the
#: two-stage machinery only pays off once the scatter's serialization
#: dominates)
_COMPACT_SINGLE_MAX = 1 << 21

#: above this size the dense-hit sort compaction falls back to the
#: single-stage scatter: the blocked argsort materializes ~10 bytes per
#: element of sort buffers, which at full-field scale (331 Mvox x the
#: four-cube fused extrema fetch) exceeds a 16 GB chip — the scatter is
#: slower but allocates only the output
_COMPACT_DENSE_MAX = 1 << 27


def _compact_small(flat, hit, extras, cap):
    """Single-stage cumsum + drop-scatter compaction (small arrays)."""
    pos = jnp.cumsum(hit.astype(jnp.int32))
    tgt = jnp.where(hit, pos - 1, cap)
    fidx = jnp.zeros(cap, jnp.int32).at[tgt].set(
        jnp.arange(flat.size, dtype=jnp.int32), mode="drop"
    )
    return fidx, flat[fidx], tuple(e.ravel()[fidx] for e in extras)


def _compact_dense(flat, hit, extras, cap):
    """Blocked sort-based compaction for DENSE hit patterns.

    When hits land in (nearly) every 512-block, the two-stage block
    selection cannot skip anything and the single-stage fallback pays
    the serializing cube-sized scatter (~1 s / 74 Mvox).  This
    formulation has NO large scatter: a stable per-row argsort of the
    (nblk, 512) hit matrix moves each row's hits to the front (order
    preserved — XLA vectorizes the small sorts across rows), per-block
    counts give each rank's block by a cap-sized ``searchsorted`` over
    the count cumsum, and the result is pure gathers.  Output matches
    the single-stage form for the first ``count`` entries (row-major
    np.where order); the slots beyond carry index 0 / value 0, which
    every consumer already treats as trimmed padding.
    """
    n = flat.size
    blk = _COMPACT_BLOCK
    nblk = -(-n // blk)
    pad = nblk * blk - n
    hitp = jnp.pad(hit.ravel(), (0, pad)).reshape(nblk, blk)
    counts = jnp.sum(hitp.astype(jnp.int32), axis=1)
    ends = jnp.cumsum(counts)
    starts = ends - counts
    order = jnp.argsort(~hitp, axis=1, stable=True)
    lidx = order.astype(jnp.int32) \
        + (jnp.arange(nblk, dtype=jnp.int32) * blk)[:, None]
    j = jnp.arange(cap, dtype=jnp.int32)
    b = jnp.minimum(jnp.searchsorted(ends, j, side="right"), nblk - 1)
    local = jnp.clip(j - starts[b], 0, blk - 1)
    valid = j < ends[-1]
    fidx = jnp.where(valid, lidx[b, local], 0)
    vals = jnp.where(valid, flat[fidx], 0)
    return fidx, vals, tuple(
        jnp.where(valid, e.ravel()[fidx], 0) for e in extras)


def _compact_body(flat, hit, extras, cap):
    """Flat indices + values of the first ``cap`` entries where ``hit``
    is True, in row-major (np.where) order.

    Small arrays: one cumsum + drop-scatter pass.  Large arrays
    (full-size cubes) use a TWO-STAGE compaction, because a cube-sized
    scatter serializes on TPU (~1 s per 74 Mvox — it was the whole
    latency of the step-07 detection fetch): per-block hit counts (a
    fast reduction), ``top_k`` over the block indices to select the
    first ``cap`` blocks containing hits (hits beyond ``cap`` blocks
    cannot be among the first ``cap`` hits), then the cumsum+scatter on
    the gathered ``cap x 512`` slice only.  DENSE hit patterns (the
    local-extrema wires: caps so large the block selection would keep
    nearly every block) take the sort-based :func:`_compact_dense`
    instead.  Results are identical to the single-stage form; entries
    beyond ``cap`` are dropped (callers size cap from an exact
    device-side count).
    """
    n = flat.size
    blk = _COMPACT_BLOCK
    if n <= _COMPACT_SINGLE_MAX:
        return _compact_small(flat, hit, extras, cap)
    if cap * blk >= n:
        if n > _COMPACT_DENSE_MAX:
            # memory over speed at full-field scale (see constant above)
            return _compact_small(flat, hit, extras, cap)
        return _compact_dense(flat, hit, extras, cap)
    nblk = -(-n // blk)
    pad = nblk * blk - n
    hitp = jnp.pad(hit.ravel(), (0, pad)).reshape(nblk, blk)
    counts = jnp.sum(hitp, axis=1)
    nbsel = min(cap, nblk)
    # select the first nbsel hit-carrying blocks (ascending) with the
    # single-stage compaction at BLOCK granularity — an nblk-sized
    # scatter is cheap, and unlike top_k it compiles in milliseconds
    blkhit = counts > 0
    blkidx = jnp.arange(nblk, dtype=jnp.int32)
    sel, _, _ = _compact_small(blkidx, blkhit, (), nbsel)
    vsel = jnp.arange(nbsel) < jnp.sum(blkhit.astype(jnp.int32))
    ghit = hitp[sel] & vsel[:, None]
    gidx = (sel[:, None] * blk
            + jnp.arange(blk, dtype=jnp.int32)[None, :]).ravel()
    pos = jnp.cumsum(ghit.ravel().astype(jnp.int32))
    tgt = jnp.where(ghit.ravel(), pos - 1, cap)
    fidx = jnp.zeros(cap, jnp.int32).at[tgt].set(gidx, mode="drop")
    return fidx, flat[fidx], tuple(e.ravel()[fidx] for e in extras)


@jax.jit
def _count_nonzero_many(arrs):
    return tuple(jnp.sum(a != 0) for a in arrs)


@partial(jax.jit, static_argnames=("caps",))
def _extract_nonzero_many(arrs, caps):
    """Compacted (index, value) pairs of every array's nonzero entries,
    as ONE device program / one fetch."""
    out = []
    for a, cap in zip(arrs, caps):
        flat = a.ravel()
        fidx, vals, _ = _compact_body(flat, flat != 0, (), cap)
        out.append((fidx, vals))
    return tuple(out)


LANE_STATS = {}
_LANE_LOCK = _threading.Lock()


def lane_stats_reset():
    """Clear the per-lane CPU accounting (see :func:`lane_time`)."""
    with _LANE_LOCK:
        LANE_STATS.clear()


def lane_time(label, cpu, wall=0.0, nbytes=0):
    """Accumulate (calls, thread-CPU s, wall s, bytes) under ``label``.

    The benchmark harness reads :data:`LANE_STATS` after step 11 to
    attribute the single-core host budget to lanes (rebuilds, wire
    decodes, product parking, source building) — thread CPU is the
    link-weather-independent cost that actually bounds this host.
    """
    with _LANE_LOCK:
        c, t, w, b = LANE_STATS.get(label, (0, 0.0, 0.0, 0))
        LANE_STATS[label] = (c + 1, t + cpu, w + wall, b + int(nbytes))


class _lane_timer:
    """Context manager: lane_time(label, thread_cpu, wall, nbytes)."""

    def __init__(self, label, nbytes=0):
        self.label = label
        self.nbytes = nbytes

    def __enter__(self):
        import time

        self._c0 = time.thread_time()
        self._w0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        import time

        lane_time(self.label, time.thread_time() - self._c0,
                  time.perf_counter() - self._w0, self.nbytes)
        return False


# -- foreground-CPU gate ------------------------------------------------------
#
# On a few-core host, overlapping the checkpoint's byte-processing (int16
# quantization, sparse scatters, big-endian conversion, FITS writes) with
# the source builder's own memory-bound passes is a net LOSS: the threads
# timeslice on the same core and every switch cold-starts L1/L2/TLC, so
# each lane's measured thread-CPU inflates 4x+ (measured: the per-source
# cutout pass costs 0.8 s alone, 3.5-26 s under churn).  Device->host
# TRANSFERS are exempt — a blocked device_get burns no CPU (measured 0%
# duty) and must keep streaming.  The gate lets the hot foreground phase
# (source building) declare itself; background WRITE jobs then wait for
# it to finish before touching bytes, turning the overlap into
# stream-transfers-now / process-bytes-after.

_FG_COND = _threading.Condition()
_FG_HOLDERS = set()  # thread idents currently inside foreground_cpu()


def _defer_background_writes():
    """Gate background byte-processing behind foreground phases?

    Default: only on hosts where the threads would share cores
    (<= 2 usable CPUs).  ``ORIGIN_TPU_DEFER_WRITES=1/0`` forces."""
    import os

    env = os.environ.get("ORIGIN_TPU_DEFER_WRITES")
    if env is not None:
        return env not in ("0", "false")
    try:
        ncpu = len(os.sched_getaffinity(0))
    except AttributeError:  # pragma: no cover - non-Linux
        ncpu = os.cpu_count() or 1
    return ncpu <= 2


class foreground_cpu:
    """Context manager marking a foreground host-CPU phase."""

    def __enter__(self):
        with _FG_COND:
            _FG_HOLDERS.add(_threading.get_ident())
        return self

    def __exit__(self, *exc):
        with _FG_COND:
            _FG_HOLDERS.discard(_threading.get_ident())
            _FG_COND.notify_all()
        return False


class _foreground_paused:
    """Temporarily release this thread's foreground claim (no-op when it
    holds none).  Used around pure waits (wire joins): the blocked
    foreground burns no CPU, so letting gated background byte-processing
    run during the wait costs nothing and shortens the checkpoint tail."""

    def __enter__(self):
        self._held = _threading.get_ident() in _FG_HOLDERS
        if self._held:
            with _FG_COND:
                _FG_HOLDERS.discard(_threading.get_ident())
                _FG_COND.notify_all()
        return self

    def __exit__(self, *exc):
        if self._held:
            with _FG_COND:
                _FG_HOLDERS.add(_threading.get_ident())
        return False


def wait_for_foreground(timeout=900.0):
    """Block a background byte-processing job while a foreground phase
    runs (no-op on multi-core hosts, from a foreground thread itself, or
    after ``timeout`` — the gate must never deadlock a checkpoint)."""
    if not _defer_background_writes():
        return
    if _threading.get_ident() in _FG_HOLDERS:
        return
    with _FG_COND:
        _FG_COND.wait_for(lambda: not _FG_HOLDERS, timeout)


def _store_int16():
    """Whether float detection-statistic cubes keep their scaled-int16
    form host-side (written as BITPIX-16 + BSCALE session files).

    ``ORIGIN_TPU_STORE_INT16=0`` opts every product back into float32
    files; the statistic cubes are noise-normalized, so the quantization
    floor ``max|x|/32766`` (<1e-3 absolute) sits ~3 orders below their
    own noise."""
    import os

    return os.environ.get("ORIGIN_TPU_STORE_INT16", "1").lower() not in (
        "0", "false", "f32", "float32")


def _scatter_sparse(shape, dtype, n, fidx, vals, quant=False):
    """Rebuild a host array from compacted nonzero entries.

    With ``quant``, float cubes come back as :class:`Quant16` (int16
    zeros + the quantized values scattered in): the dense buffer is half
    the size, the session file is written without a float32 conversion
    pass, and the quantization itself touches only the ``n`` nonzero
    entries.  Callers pass ``quant`` only for post-transform-free cubes.
    """
    dtype = np.dtype(dtype)
    size = int(np.prod(shape))
    if quant and dtype.kind == "f" and _store_int16():
        vals = np.asarray(vals[:n], np.float32)
        scale = max(float(np.max(np.abs(vals))) if n else 0.0, 1e-30) \
            / 32766.0
        flat = np.zeros(size, np.int16)
        if n:
            q = np.clip(
                np.round(vals / np.float32(scale)), -32767, 32767
            ).astype(np.int16)
            # an extremum tinier than half a quantization step must not
            # vanish from the nonzero set (consumers enumerate extrema
            # by != 0): clamp it to +-1 — the decode error stays within
            # one step
            tiny = (q == 0) & (vals != 0)
            if tiny.any():
                q[tiny] = np.where(vals[tiny] > 0, 1, -1)
            flat[fidx[:n]] = q
            pairs = (np.ascontiguousarray(fidx[:n]), q)
        else:
            pairs = (np.zeros(0, np.int32), np.zeros(0, np.int16))
        # keep the (index, value) pairs on the wire: the checkpoint then
        # stores the mostly-zero cube as a tiny sparse table instead of a
        # dense int16 image (containers._Base.write)
        return Quant16(flat.reshape(shape), scale, pairs=pairs)
    flat = np.zeros(size, dtype=dtype)
    if n:
        flat[fidx[:n]] = vals[:n]
    return flat.reshape(shape)


def _sparse_fetch(dev, quant=False):
    """Materialize one mostly-zero device cube via sparse transfer."""
    n = int(jax.device_get(_count_nonzero_many((dev,)))[0])
    cap = min(_bucket4(max(n, 1), 256), dev.size)
    ((fidx, vals),) = _extract_nonzero_many((dev,), (cap,))
    fidx, vals = jax.device_get((_trim2(fidx, n), _trim2(vals, n)))
    return _scatter_sparse(dev.shape, np.dtype(str(dev.dtype)), n, fidx,
                           vals, quant=quant)


@jax.jit
def _encode_i16(x):
    """Symmetric int16 quantization of a float cube + its scale.

    One device pass; the 2-byte wire halves the link traffic of a float32
    download.  Max absolute decode error is ``max|x| / 32766`` — for the
    noise-normalized GLR statistic (unit variance by construction,
    values ~[-10, 30]) that is <1e-3, three orders below the statistic's
    own noise floor.
    """
    x = x.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(x)) / 32766.0, 1e-30)
    q = jnp.clip(jnp.round(x / scale), -32767, 32767).astype(jnp.int16)
    return q, scale


@partial(jax.jit, static_argnames=("bits",))
def _pack_bits(x, bits):
    """Pack a small-integer cube to ``bits`` bits/value along x (device).

    Values must be < 2**bits; 8//bits values share one output byte
    (disjoint bit slots, so the sum is a bitwise OR)."""
    k = 8 // bits
    nz, ny, nx = x.shape
    pad = (-nx) % k
    xp = jnp.pad(x.astype(jnp.uint8), ((0, 0), (0, 0), (0, pad)))
    xp = xp.reshape(nz, ny, (nx + pad) // k, k).astype(jnp.int32)
    shifts = jnp.arange(k, dtype=jnp.int32) * bits
    return jnp.sum(xp << shifts, axis=-1).astype(jnp.uint8)


def _unpack_bits(packed, bits, nx, dtype):
    """Host inverse of :func:`_pack_bits`."""
    k = 8 // bits
    mask = np.uint8((1 << bits) - 1)
    out = np.empty(packed.shape[:2] + (packed.shape[2] * k,), np.uint8)
    for j in range(k):
        out[..., j::k] = (packed >> np.uint8(j * bits)) & mask
    out = out[..., :nx]
    return out if out.dtype == dtype else out.astype(dtype)


def _packed_wire_fetch(dev, bits):
    """Bit-packed lossless wire for a small-integer cube.

    The default 3-profile dictionary's index cube packs 4 voxels/byte:
    the host link moves 1/4 of the dense uint8 download.  The caller's
    ``post`` (dtype narrowing) is applied once by the DeferredCube
    materialization, not here."""
    box = [dev]
    nx = int(dev.shape[-1])

    def fetch():
        d = box[0]
        packed = _pack_bits(d, bits)
        del d
        with _lane_timer("wire:packed", nbytes=int(np.prod(packed.shape))):
            packed = np.asarray(packed)
        box[0] = None  # success: release the pinned device array
        return _unpack_bits(packed, bits, nx, np.uint8)

    fetch.release = lambda: box.__setitem__(0, None)
    return fetch


def _int16_wire_fetch(dev):
    """Host materialization of a float device cube over an int16 wire.

    The closure drops its device reference after the fetch so the HBM
    can be freed once the host copy exists (the DeferredCube drops its
    own reference at the same point).  When scaled-int16 storage is on
    (the default), the wire is returned as a :class:`Quant16` — the
    session file is then written straight from the int16 buffer and the
    float32 decode happens only if a numeric consumer asks for it.
    """
    box = [dev]

    def fetch():
        d = box[0]
        q, scale = _encode_i16(d)
        del d
        s = float(scale)
        with _lane_timer("wire:int16", nbytes=2 * int(q.size)):
            q = np.asarray(q)
        box[0] = None  # success: release the pinned device array
        if _store_int16():
            return Quant16(q, s)
        arr = q.astype(np.float32)
        arr *= np.float32(s)
        return arr

    fetch.release = lambda: box.__setitem__(0, None)
    return fetch


def _fetch_sparse_pairs(devs):
    """Nonzero counts + compacted (index, value) pairs for a group of
    sparse device cubes: ONE fused count program and ONE fused
    compaction fetch for the whole group.  Shared by the background
    prefetch and the direct materialization so their cap bucketing,
    trim and quantization can never diverge."""
    counts = [int(v) for v in jax.device_get(_count_nonzero_many(devs))]
    caps = tuple(
        min(_bucket4(max(n, 1), 256), d.size)
        for n, d in zip(counts, devs)
    )
    res = jax.device_get(tuple(
        (_trim2(f, n), _trim2(v, n))
        for n, (f, v) in zip(counts, _extract_nonzero_many(devs, caps))
    ))
    return counts, res


def _prefetch_sparse_group(cubes):
    """Start ONE background job fetching a group of sparse cubes.

    The group shares the fused count/compaction programs of
    :func:`materialize_deferred`, but runs in the copy pool so the (small)
    round-trips land before the dense bulk transfers saturate the link.
    Each cube gets its own Future; ``.data`` joins it as usual.
    """
    from concurrent.futures import Future

    grabbed = []
    for c in cubes:
        with c._lock:
            if (c._host is None and c._wire is None and c._future is None
                    and c._dev is not None and c._sparse):
                fut = Future()
                fut.set_running_or_notify_cancel()
                c._future = fut
                grabbed.append((c, fut, c._dev))
    if not grabbed:
        return

    def _job():
        try:
            counts, res = _fetch_sparse_pairs(
                tuple(dev for _, _, dev in grabbed))
            for (c, fut, dev), n, (fidx, vals) in zip(grabbed, counts, res):
                fut.set_result(_scatter_sparse(
                    dev.shape, np.dtype(str(dev.dtype)), n, fidx, vals,
                    quant=c._post is None,
                ))
        except BaseException as exc:  # propagate to every joiner
            for _, fut, _ in grabbed:
                if not fut.done():
                    fut.set_exception(exc)

    _copy_pool().submit(_job)


def materialize_deferred(cubes):
    """Materialize many DeferredCubes with minimal link traffic.

    Sparse cubes (local extrema) are fetched through TWO fused device
    programs for the whole group (one count fetch, one compacted-pairs
    fetch); dense cubes start background copies first and join at the
    end, so the transfers overlap each other (and the sparse round-trips)
    instead of serializing.  A sparse cube whose group fetch is already
    in flight (:func:`_prefetch_sparse_group`) just joins it.
    """
    live = [c for c in cubes
            if c._host is None and c._wire is None and c._dev is not None]
    dense = [c for c in live if not c._sparse or c._future is not None]
    sparse = [c for c in live if c._sparse and c._future is None]
    # plain downloads first: rebuild closures (custom fetch) may join them,
    # so they must never be queued behind every pool worker
    dense.sort(key=lambda c: c._fetch is not None)
    for c in dense:
        c.prefetch()
    if sparse:
        counts, res = _fetch_sparse_pairs(tuple(c._dev for c in sparse))
        for c, n, (fidx, vals) in zip(sparse, counts, res):
            arr = _scatter_sparse(
                c._dev.shape, np.dtype(str(c._dev.dtype)), n, fidx, vals,
                quant=c._post is None,
            )
            if isinstance(arr, Quant16):
                with c._lock:
                    if c._host is None and c._wire is None:
                        c._wire = arr
                        c._dev = None
                continue
            if c._post is not None:
                arr = c._post(arr)
            with c._lock:
                if c._host is None:
                    c._host = arr
                    c._dev = None
    for c in dense:
        c.materialize()  # join the background copies (no decode)



@jax.jit
def _dequant16(q, scale):
    """The Quant16 decode on device: ``float32(q) * float32(scale)``.

    Same arithmetic as :meth:`origin_tpu.core.containers.Quant16.decode`,
    so an int16-wire re-upload yields bit-identical values to uploading
    the host-decoded float32 array (at half the link bytes)."""
    return q.astype(jnp.float32) * scale


@partial(jax.jit, static_argnames=("size",))
def _scatter16_flat(fidx, q, scale, size):
    """Scatter (index, int16 value) pairs into a flat float32 zero cube.

    The device form of the sparse extrema decode (containers._load):
    pad rows carry ``q == 0`` so their scatter-add is a no-op, making
    the capacity-bucketed upload exact."""
    flat = jnp.zeros((size,), jnp.float32)
    return flat.at[fidx].add(q.astype(jnp.float32) * scale)


def _wire_device_upload(obj, put, reshard=None):
    """Device array rebuilt from a host product's Quant16 wire, or None.

    Shared by both engines' ``get``: a dense int16 wire uploads at half
    the float32 bytes and dequantizes on device (bit-equal to the host
    decode); a sparse pairs wire (loaded extrema file) uploads kilobytes
    and scatters.  ``put`` moves a host array onto the target
    device/sharding; ``reshard`` (optional) places the scatter result
    onto the final sharding."""
    wire = obj.wire16() if hasattr(obj, "wire16") else None
    q = getattr(wire, "q", None)
    if q is None or getattr(obj, "mask", None) is not None:
        return None
    shape = tuple(obj.shape)
    pairs = getattr(wire, "pairs", None)
    # pairs FIRST: a materialized sparse extrema cube carries both a
    # dense q and its pairs — the kilobyte scatter beats re-uploading
    # the full dense int16 image
    if pairs is not None:
        fidx, vals = pairs
        n = int(np.asarray(fidx).size)
        size = int(np.prod(shape))
        cap = min(_bucket4(max(n, 1), 256), max(size, 1))
        fi = np.zeros(cap, np.int64)
        qv = np.zeros(cap, np.int16)
        fi[:n] = np.asarray(fidx)
        qv[:n] = np.asarray(vals)
        flat = _scatter16_flat(jnp.asarray(fi), jnp.asarray(qv),
                               np.float32(wire.scale), size)
        out = flat.reshape(shape)
        return reshard(out) if reshard is not None else out
    if q.dtype == np.int16 and q.ndim == 3 and q.shape == shape:
        return _dequant16(put(q), np.float32(wire.scale))
    return None


