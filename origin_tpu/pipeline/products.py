"""Typed registry for on-disk step products.

Every pipeline stage publishes a fixed set of named products — cubes,
images, catalogs, per-area vectors, per-line spectra.  A product is in one
of three states:

* **live**: the in-memory object, just computed;
* **parked**: written to the session directory and replaced by a
  :class:`Parked` marker, so its memory is freed; the file is re-read
  transparently the next time the product is fetched;
* **absent**: never produced (fetch returns ``None``).

The park/restore cycle is what makes sessions resumable at step
granularity (the reference achieves the same effect with lazy attribute
descriptors, origin steps.py:121-163; here the state machine is explicit
and the format knowledge lives in one table instead of per-kind branch
chains).
"""

from __future__ import annotations

import os
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, NamedTuple

import numpy as np

from ..core.containers import Cube, Image
from ..core.table import Table
from .spectra_io import load_spectra, save_spectra

__all__ = ["FORMATS", "Format", "Parked", "ProductStore", "format_catalog"]


def format_catalog(cat):
    """Apply the standard column print formats to a catalog table."""
    for fmt, names in (
        (".1f", ("flux",)),
        (".2f", ("lbda", "T_GLR", "STD")),
        (".3f", ("ra", "dec", "residual", "purity")),
    ):
        for name in names:
            if name in cat.colnames:
                cat.set_format(name, fmt)
    return cat


class Format(NamedTuple):
    """How one product kind maps to a session file."""

    suffix: str
    load: Callable
    save: Callable


FORMATS = {
    "cube": Format(".fits", Cube, lambda obj, path: obj.write(path)),
    "image": Format(".fits", Image, lambda obj, path: obj.write(path)),
    "table": Format(
        ".fits",
        lambda path: format_catalog(Table.read(path)),
        lambda obj, path: obj.write(path, overwrite=True),
    ),
    "array": Format(
        ".txt",
        lambda path: np.loadtxt(path, ndmin=1),
        lambda obj, path: np.savetxt(path, np.atleast_1d(obj)),
    ),
    "spectra": Format(".fits", load_spectra, save_spectra),
}


_WRITE_POOL = None
_WRITE_POOL_LOCK = threading.Lock()


def _write_pool():
    """One shared writer thread for background product parking.

    A single worker keeps the disk writes sequential (no seek thrash)
    while they overlap whatever the caller does next — device-to-host
    transfers, host rebuilds, source building.  Write jobs may block on a
    product's in-flight materialization; those joins run in the separate
    engine copy pool, so the two never deadlock.
    """
    global _WRITE_POOL
    with _WRITE_POOL_LOCK:
        if _WRITE_POOL is None:
            _WRITE_POOL = ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="origin-tpu-park"
            )
    return _WRITE_POOL


def _timed_save(save, name, value, path):
    """Park one product, accounting its writer-lane cost (see
    engine.LANE_STATS).

    On few-core hosts the byte-processing (quantize/byteswap/write)
    waits for any foreground phase (source building) to finish first:
    interleaving the two on one core inflates BOTH lanes' CPU ~4x via
    cache/TLB thrash (engine.wait_for_foreground).  Transfers are not
    held up — they stream from the copy pool regardless."""
    from .engine import _lane_timer, wait_for_foreground

    wait_for_foreground()
    with _lane_timer(f"park:{name}"):
        save(value, path)
    # a product holding BOTH its decoded float32 copy and its int16 wire
    # keeps the WIRE once the file exists: later consumers cut int16
    # windows from it (per-source FITS cutouts stay BITPIX 16) and the
    # engine re-uploads half the bytes.  The float32 copy is the
    # redundant one (2/3 of the product's host bytes) and re-decodes
    # lazily if a dense consumer comes back.
    lock = getattr(value, "_lock", None)
    if lock is not None and getattr(value, "_wire", None) is not None:
        with lock:
            if value._wire is not None and value._host is not None:
                value._host = None
    try:
        from os import path as _p

        from .engine import lane_time

        lane_time("park:bytes", 0.0, nbytes=_p.getsize(path))
    except OSError:
        pass


class Parked:
    """Marker standing in for a product that lives in a session file."""

    __slots__ = ("path",)

    def __init__(self, path):
        self.path = path

    def __repr__(self):
        return f"Parked({self.path!r})"


class ProductStore:
    """Name -> value mapping for one step's typed products.

    ``spec`` maps each product name to a key of :data:`FORMATS`.
    """

    def __init__(self, spec):
        self.spec = dict(spec)
        self._slots = {}
        self._pending = {}  # name -> (Future, path) of an async park
        self._clean = {}  # name -> (id, gen) recorded at fetch time
        # optional context-aware loader for cube products: recipe files
        # (recipes.py) rebuild against the owning session's raw data;
        # returns None for a plain dense file
        self.resolve = None

    def __contains__(self, name):
        return name in self.spec

    def names(self):
        return self.spec.keys()

    def file_for(self, name, directory):
        return os.path.join(directory, name + FORMATS[self.spec[name]].suffix)

    def peek(self, name):
        """The raw slot value (live object, Parked marker, or None) —
        never touches the disk."""
        return self._slots.get(name)

    def stash(self, name, value):
        if name not in self.spec:
            raise KeyError(f"{name} is not a declared product")
        self._slots[name] = value
        self._clean.pop(name, None)  # a stashed object is new content

    def fetch(self, name):
        """Materialize a product, reading its session file if parked."""
        value = self._slots.get(name)
        if isinstance(value, Parked):
            if not os.path.isfile(value.path):
                return None
            loaded = None
            if self.resolve is not None and self.spec[name] == "cube":
                loaded = self.resolve(value.path)
            if loaded is None:
                loaded = FORMATS[self.spec[name]].load(value.path)
            self._slots[name] = value = loaded
            # freshly read == file content; data setters bump _gen, so
            # park_dirty can tell replaced content from a plain re-read
            self._clean[name] = (id(value), getattr(value, "_gen", None))
        return value

    def park_async(self, directory):
        """Start writing every live product to ``directory`` in the
        background (idempotent).

        The product stays live (readers keep using the in-memory object;
        concurrent reads of the same arrays are safe) until
        :meth:`park_all` joins the write and swaps in the
        :class:`Parked` marker.  Only call this once the products are
        final — the checkpoint is whatever the object holds when the
        writer thread gets to it.
        """
        pool = _write_pool()
        for name, kind in self.spec.items():
            value = self._slots.get(name)
            if (value is None or isinstance(value, Parked)
                    or name in self._pending):
                continue
            path = self.file_for(name, directory)
            if self._recipe_current(value, path):
                self._slots[name] = Parked(path)
                continue
            self._pending[name] = (
                pool.submit(_timed_save, FORMATS[kind].save, name, value,
                            path),
                path, value,
            )

    def _join_pending(self):
        """Wait for async parks and swap in their markers.

        A slot restashed since the write started (a re-run step) keeps
        its new live value: the stale file is joined but not marked, so
        :meth:`park_all`'s sweep rewrites it.  A FAILED write (disk
        full, bad path) is cleared from the pending set and re-raised
        once — the slot stays live, so the next write() retries it
        instead of re-raising the stale failure forever.
        """
        for name, (fut, path, value) in list(self._pending.items()):
            try:
                fut.result()
            except Exception:
                del self._pending[name]
                raise
            if self._slots.get(name) is value:
                self._slots[name] = Parked(path)
            del self._pending[name]

    @staticmethod
    def _recipe_current(value, path):
        """True when ``value`` was rebuilt FROM the recipe file at ``path``
        (a resumed fetch): re-parking it would pointlessly serialize the
        dense cube over its own still-valid generator file."""
        return (getattr(value, "_recipe_source", None) == path
                and os.path.isfile(path))

    def park_all(self, directory):
        """Write every live product to ``directory`` and free its memory."""
        self._join_pending()
        for name, kind in self.spec.items():
            value = self._slots.get(name)
            if value is None or isinstance(value, Parked):
                continue
            path = self.file_for(name, directory)
            if not self._recipe_current(value, path):
                _timed_save(FORMATS[kind].save, name, value, path)
            self._slots[name] = Parked(path)
            self._clean.pop(name, None)

    def park_dirty(self, directory):
        """Write live products whose content was replaced since they were
        read from the session — an object assigned via the data setter,
        or a new object stashed onto an already-dumped step — leaving
        untouched fetches alone.

        This is what lets ``write()`` on a RESUMED session persist user
        edits: the reference silently drops them (its dump only covers
        RUN steps, reference steps.py:301-307); here a dumped step still
        re-parks exactly the replaced products.  In-place mutation of a
        fetched array remains undetectable, as in the reference.
        """
        self._join_pending()
        for name, kind in self.spec.items():
            value = self._slots.get(name)
            if value is None or isinstance(value, Parked):
                continue
            rec = self._clean.get(name)
            if (rec is not None and rec[0] == id(value)
                    and rec[1] == getattr(value, "_gen", None)):
                continue  # unmodified fetch: the session file is current
            path = self.file_for(name, directory)
            if not self._recipe_current(value, path):
                _timed_save(FORMATS[kind].save, name, value, path)
            self._slots[name] = Parked(path)
            self._clean.pop(name, None)

    def point_at(self, directory):
        """Mark every product as parked in ``directory`` (used on session
        restore; nothing is read until fetched)."""
        for name in self.spec:
            self._slots[name] = Parked(self.file_for(name, directory))
