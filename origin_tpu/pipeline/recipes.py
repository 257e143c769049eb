"""Recipe-form checkpointing for exactly-reconstructible cube products.

Three of the session's cube-sized products are pure functions of data the
checkpoint already stores:

* ``cube_std`` / ``cont_dct`` — determined by the raw cube (whose path is
  session state) plus the step-01 DCT basis coefficients and per-channel
  background means (~(order+1)/Nz of a cube);
* ``cube_faint`` — ``cube_std`` minus the greedy PCA's recorded rank-1
  factors (a few MB).

Instead of rebuilding ~900 MB of dense float32 cubes on the host and
serializing them at every ``write()`` (the reference dumps each product
densely, origin.py:651-727), the session stores the *generators*: a tiny
FITS "recipe" file under the product's usual name, self-describing via
the ``ORITPURE`` primary-header keyword.  Loading a recipe re-derives the
dense cube with one host matmul — bit-identical to the host rebuild the
live session would have produced (the arithmetic order is shared with
:meth:`DeviceEngine._make_std_fetches`, which tight-memory greedy PCA
relies on).  ``ORIGIN_TPU_STORE_RECIPES=0`` restores dense float32 files.

Recipe files are ordinary FITS: a header-only primary HDU plus named
image extensions, readable by any FITS library (the arrays are just the
coefficients rather than the cube).
"""

from __future__ import annotations

import os

import numpy as np

from .. import fitsio
from ..core.containers import Cube
from ..ops.dct import dctmat

__all__ = [
    "RECIPE_KEY",
    "recipes_enabled",
    "is_recipe_file",
    "write_dct_recipe",
    "write_pca_recipe",
    "rebuild_std_cont",
    "apply_pca_factors",
    "load_recipe",
    "load_cube",
]

RECIPE_KEY = "ORITPURE"


def recipes_enabled():
    """Store recipe files for the rebuildable cubes (default on)."""
    return os.environ.get("ORIGIN_TPU_STORE_RECIPES", "1") != "0"


def is_recipe_file(path):
    """The recipe kind stored at ``path``, or None for a dense file."""
    try:
        hdr = fitsio.getheader(path, 0)
    except OSError:
        return None
    return hdr.get(RECIPE_KEY)


def _primary(kind, cubename):
    hdr = fitsio.Header()
    hdr[RECIPE_KEY] = kind, "origin_tpu product recipe"
    if cubename:
        hdr["RECUBE"] = str(cubename), "raw cube the recipe rebuilds from"
    return hdr


def write_dct_recipe(path, which, coef, mean_z, order, cubename):
    """Store the cube_std / cont_dct generator: DCT coefficients + means.

    ``which`` is ``"std"`` or ``"cont"``; both recipes carry the same
    payload (the products differ only in which rebuilt array they keep).
    """
    phdr = _primary("dct_std" if which == "std" else "dct_cont", cubename)
    phdr["REORDER"] = int(order), "DCT continuum order"
    chdr = fitsio.Header()
    chdr["EXTNAME"] = "COEF"
    mhdr = fitsio.Header()
    mhdr["EXTNAME"] = "MEANZ"
    fitsio.write(path, [
        fitsio.HDU(header=phdr),
        fitsio.HDU(data=np.asarray(coef, np.float32), header=chdr),
        fitsio.HDU(data=np.asarray(mean_z, np.float32), header=mhdr),
    ])


def write_pca_recipe(path, factors, cubename):
    """Store the cube_faint generator: the greedy PCA's rank-1 factors.

    ``factors`` is the engine's list of ``(idx, u_mat, c_mat)`` per-area
    records; the rebuild subtracts ``u_mat @ c_mat`` from ``cube_std``
    (read recipe-aware from the same session directory) at the flat
    spatial indices ``idx``.
    """
    phdr = _primary("pca_faint", cubename)
    phdr["RENFACT"] = len(factors), "number of per-area factor groups"
    hdus = [fitsio.HDU(header=phdr)]
    for i, (idx, u_mat, c_mat) in enumerate(factors):
        for tag, arr, dt in (("IDX", idx, np.int64), ("U", u_mat, np.float32),
                             ("C", c_mat, np.float32)):
            hdr = fitsio.Header()
            hdr["EXTNAME"] = f"{tag}{i}"
            hdus.append(fitsio.HDU(data=np.asarray(arr, dt), header=hdr))
    fitsio.write(path, hdus)


def rebuild_std_cont(raw, var, mask, coef, mean_z, order):
    """Re-derive (cube_std, cont_dct) from the DCT recipe payload.

    The arithmetic order matches the device program's host mirror
    (engine._make_std_fetches._rebuild_both) EXACTLY: on the CPU backend
    the result is bit-equal to the device arrays, which the tight-memory
    greedy-PCA path depends on (its O2 threshold is a hard comparison).
    """
    nz = raw.shape[0]
    d0 = dctmat(nz, order, dtype=np.float32)
    cont = np.tensordot(d0, np.asarray(coef, np.float32), axes=([1], [0]))
    sigma = np.sqrt(var)
    data = raw - cont
    data -= np.asarray(mean_z, np.float32)[:, None, None]
    with np.errstate(divide="ignore", invalid="ignore"):
        data /= sigma
    bad = np.asarray(mask) | ~np.isfinite(data)
    data[bad] = 0.0
    with np.errstate(divide="ignore", invalid="ignore"):
        cont /= sigma  # in place: cont becomes cont_dct
    cont[~np.isfinite(cont)] = 0.0
    return data, cont


def apply_pca_factors(std, factors):
    """``cube_faint`` from a (copy of) cube_std and the rank-1 factors."""
    faint = np.array(std, dtype=np.float32)
    flat = faint.reshape(faint.shape[0], -1)
    for idx, u_mat, c_mat in factors:
        flat[:, idx] -= u_mat @ c_mat
    return faint


def _read_dct_payload(hdus):
    coef = mean_z = None
    for h in hdus:
        if h.name == "COEF":
            coef = np.asarray(h.data, np.float32)
        elif h.name == "MEANZ":
            mean_z = np.asarray(h.data, np.float32)
    if coef is None or mean_z is None:
        raise OSError("malformed DCT recipe: missing COEF/MEANZ")
    return coef, mean_z


def _read_pca_payload(hdus, nfact):
    by_name = {h.name: h for h in hdus}
    factors = []
    for i in range(nfact):
        try:
            idx = np.asarray(by_name[f"IDX{i}"].data, np.int64)
            u_mat = np.asarray(by_name[f"U{i}"].data, np.float32)
            c_mat = np.asarray(by_name[f"C{i}"].data, np.float32)
        except KeyError as exc:
            raise OSError(f"malformed PCA recipe: missing {exc}") from exc
        factors.append((idx, u_mat, c_mat))
    return factors


class _RawContext:
    """Raw-data views for a rebuild: a session when available, else the
    cube file named in the recipe (same fill semantics as the session's
    ``cube_raw`` / ``var`` / ``mask`` properties)."""

    def __init__(self, orig=None, cubename=None):
        self.orig = orig
        self.cubename = cubename
        self._cube = None

    def _load(self):
        if self._cube is None:
            if not self.cubename or not os.path.isfile(self.cubename):
                raise OSError(
                    f"recipe rebuild needs the raw cube ({self.cubename!r} "
                    "not found) — pass the session or fix the path"
                )
            self._cube = Cube(self.cubename)
        return self._cube

    def views(self):
        if self.orig is not None:
            o = self.orig
            return o.cube_raw, o.var, o.mask, o.wcs, o.wave
        cube = self._load()
        raw = cube.filled(0).astype(np.float32)
        var = cube.var_filled(np.inf)
        var = (np.ones(cube.shape, np.float32) if var is None
               else var.astype(np.float32))
        mask = cube.masked_invalid()
        return raw, var, mask, cube.wcs, cube.wave


def load_recipe(path, orig=None):
    """Materialize the dense Cube a recipe file stands for.

    ``orig`` (an ORIGIN session) provides the raw-data views without
    re-reading the cube file; without it the recipe's recorded cube path
    is read from disk.  ``pca_faint`` recipes resolve ``cube_std`` from
    the same directory (recipe-aware, so either storage mode works) —
    or from the live session when one is given.
    """
    hdus = fitsio.read(path)
    phdr = hdus[0].header
    kind = phdr.get(RECIPE_KEY)
    ctx = _RawContext(orig, phdr.get("RECUBE"))
    if kind in ("dct_std", "dct_cont"):
        coef, mean_z = _read_dct_payload(hdus)
        raw, var, mask, wcs, wave = ctx.views()
        std, cont = rebuild_std_cont(raw, var, mask, coef, mean_z,
                                     int(phdr["REORDER"]))
        data = std if kind == "dct_std" else cont
        return Cube(data=data, wcs=wcs, wave=wave, mask=False, copy=False)
    if kind == "pca_faint":
        factors = _read_pca_payload(hdus, int(phdr.get("RENFACT", 0)))
        # fetch from the session (recipe-aware via the store) when it
        # still holds the product; a session whose cube_std file was
        # deleted falls back to the recipe's own directory like the
        # session-less path
        std_cube = orig.cube_std if orig is not None else None
        if std_cube is not None:
            std = std_cube.data
            wcs, wave = orig.wcs, orig.wave
        else:
            std_path = os.path.join(os.path.dirname(path), "cube_std.fits")
            if not os.path.isfile(std_path):
                raise OSError(
                    f"pca_faint recipe rebuild needs cube_std ({std_path!r}"
                    " not found in the session directory)"
                )
            std_cube = load_cube(std_path, orig=orig)
            std = std_cube.data
            wcs, wave = std_cube.wcs, std_cube.wave
        return Cube(data=apply_pca_factors(std, factors), wcs=wcs,
                    wave=wave, mask=False, copy=False)
    raise OSError(f"unknown recipe kind {kind!r} in {path}")


def load_cube(path, orig=None):
    """Read a session cube product, dense or recipe-form."""
    if is_recipe_file(path):
        return load_recipe(path, orig=orig)
    return Cube(path)
