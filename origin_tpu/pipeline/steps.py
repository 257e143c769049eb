"""Step framework and the 11 pipeline steps.

Keeps the reference's best structural ideas (steps.py:61-352): lazily-loaded
data descriptors, a Step protocol that records parameters from the run
signature, enforces step dependencies, times execution and can dump / reload
every product so sessions are resumable at step granularity.  The numerics
behind each step are the TPU kernels from origin_tpu.ops.
"""

from __future__ import annotations

import inspect
import logging
import os
import shutil
import time
from collections import OrderedDict
from datetime import datetime
from enum import Enum

import numpy as np
from scipy import ndimage as ndi

from ..core.containers import Cube, Image
from ..core.table import Table, vstack
from ..detect import (
    area_growing,
    area_segmentation_convex_fusion,
    area_segmentation_final,
    area_segmentation_sources_fusion,
    area_segmentation_square_fusion,
    compute_segmap_gauss,
    deblend_sources,
    filter_duplicate_lines,
    merge_similar_lines,
    purity_estimation,
    spatiospectral_merging,
    unique_sources,
    add_tglr_stat,
)
from ..ops import (
    compute_threshold_purity,
    estimation_line_arrays,
    o2test,
)
from ..ops.stats import compute_thresh_gaussfit
from .spectra_io import load_spectra, save_spectra

__all__ = [
    "Preprocessing",
    "CreateAreas",
    "ComputePCAThreshold",
    "ComputeGreedyPCA",
    "ComputeTGLR",
    "ComputePurityThreshold",
    "Detection",
    "ComputeSpectra",
    "CleanResults",
    "CreateMasks",
    "SaveSources",
    "Status",
    "Step",
    "STEPS",
]


def _format_cat(cat):
    columns = {
        ".1f": ("flux",),
        ".2f": ("lbda", "T_GLR", "STD"),
        ".3f": ("ra", "dec", "residual", "purity"),
    }
    for fmt, names in columns.items():
        for name in names:
            if name in cat.colnames:
                cat.set_format(name, fmt)
    return cat


class LogMixin:
    def _logdebug(self, *args):
        self.logger.debug(*args)

    def _loginfo(self, *args):
        self.logger.info(*args)

    def _logwarning(self, *args):
        self.logger.warning(*args)


class Status(Enum):
    """Step processing status."""

    NOTRUN = "not run yet"
    RUN = "run"
    DUMPED = "dumped outputs"
    FAILED = "failed"


class DataObj:
    """Descriptor loading step products from disk on first access.

    When the stored value is a string it is treated as a file path and the
    object is materialized according to its kind ('cube', 'image', 'table',
    'array', 'spectra').
    """

    def __init__(self, kind):
        self.kind = kind  # label set by StepMeta

    def __get__(self, obj, owner=None):
        if obj is None:
            return self
        try:
            val = obj.__dict__[self.label]
        except KeyError:
            return None
        if isinstance(val, str):
            if os.path.isfile(val):
                kind = self.kind
                if kind == "cube":
                    val = Cube(val)
                elif kind == "image":
                    val = Image(val)
                elif kind == "table":
                    val = _format_cat(Table.read(val))
                elif kind == "array":
                    val = np.loadtxt(val, ndmin=1)
                elif kind == "spectra":
                    val = load_spectra(val)
                obj.__dict__[self.label] = val
            else:
                val = None
        return val

    def __set__(self, obj, val):
        obj.__dict__[self.label] = val


class StepMeta(type):
    """Labels DataObj descriptors and collects them in ``_dataobjs``."""

    def __new__(cls, name, bases, attrs):
        descr = []
        for n, inst in attrs.items():
            if isinstance(inst, DataObj):
                inst.label = n
                descr.append((n, inst.kind))
        attrs["_dataobjs"] = descr
        return super().__new__(cls, name, bases, attrs)


class Step(LogMixin, metaclass=StepMeta):
    """One processing step bound to an ORIGIN session."""

    name = None
    desc = None
    require = None

    def __init__(self, orig, idx, param):
        self.logger = logging.getLogger(__name__)
        self.orig = orig
        self.idx = idx
        self.method_name = "step%02d_%s" % (idx, self.name)
        self.meta = param.setdefault(self.name, {})
        self.meta.setdefault("stepidx", idx)
        self.param = self.meta.setdefault("params", {})

    def __repr__(self):
        return "Step {:02d}: <{}(status: {})>".format(
            self.idx, self.__class__.__name__, self.status.name
        )

    @property
    def status(self):
        val = self.meta.get("status", Status.NOTRUN)
        if isinstance(val, str):
            val = Status[val]
        return val

    @status.setter
    def status(self, val):
        self.meta["status"] = val

    def __call__(self, *args, **kwargs):
        t0 = time.time()
        self._loginfo("Step %02d - %s", self.idx, self.desc)

        sig = inspect.signature(self.run)
        for name, p in sig.parameters.items():
            if name == "orig":
                continue
            default = p.default if p.default is not p.empty else ""
            self._logdebug(
                "   - %s = %r (default: %r)", name, kwargs.get(name, ""), default
            )
            self.param[name] = kwargs.get(name, p.default)

        if self.require is not None:
            for req in self.require:
                step = self.orig.steps[req]
                if step.status not in (Status.RUN, Status.DUMPED):
                    raise RuntimeError(f"step {step.idx:02d} must be run before")

        try:
            self.run(self.orig, *args, **kwargs)
        except Exception:
            self.status = Status.FAILED
            raise
        else:
            self.status = Status.RUN

        self.meta["runtime"] = tot = time.time() - t0
        self.meta["execution_date"] = datetime.now().isoformat()
        self._loginfo("%02d Done - %.2f sec.", self.idx, tot)

    def store_cube(self, name, data, **kwargs):
        cube = Cube(data=data, wave=self.orig.wave, wcs=self.orig.wcs,
                    mask=False, copy=False, **kwargs)
        setattr(self, name, cube)

    def store_cube_dev(self, name, dev, post=None):
        """Store a device-resident cube product (lazy host materialization)."""
        from .engine import DeferredCube

        cube = DeferredCube(dev, wcs=self.orig.wcs, wave=self.orig.wave,
                            post=post)
        setattr(self, name, cube)

    def store_image(self, name, data, **kwargs):
        im = Image(data=data, wcs=self.orig.wcs, mask=False, copy=False,
                   **kwargs)
        setattr(self, name, im)

    def dump(self, outpath):
        """Write every product to disk and replace it by its path."""
        if self.status is not Status.RUN:
            return
        self.logger.debug("%s - DUMP", self.method_name)
        for name, kind in self._dataobjs:
            obj = getattr(self, name)
            if obj is None:
                continue
            ext = "txt" if kind == "array" else "fits"
            outf = f"{outpath}/{name}.{ext}"
            self.logger.debug("   - %s [%s]", name, kind)
            if kind in ("cube", "image"):
                obj.write(outf)
            elif kind == "table":
                obj.write(outf, overwrite=True)
            elif kind == "array":
                np.savetxt(outf, np.atleast_1d(obj))
            elif kind == "spectra":
                save_spectra(obj, outf)
            setattr(self, name, outf)
        self.status = Status.DUMPED

    def load(self, outpath):
        """Point every product at its dump file (lazy loading on access)."""
        if self.status is not Status.DUMPED:
            return
        self.logger.debug("%s - LOAD", self.method_name)
        for name, kind in self._dataobjs:
            ext = "txt" if kind == "array" else "fits"
            setattr(self, name, f"{outpath}/{name}.{ext}")


class Preprocessing(Step):
    """DCT continuum subtraction, standardization, std local extrema and the
    continuum/residual segmentation maps.

    Parameters: dct_order (DCT atoms, default 10), dct_approx (skip the
    variance weighting), pfasegcont / pfasegres (segmentation PFAs),
    local_max_size (max-filter box), bins (histogram binning).
    """

    name = "preprocessing"
    desc = "Preprocessing"
    cube_std = DataObj("cube")
    cont_dct = DataObj("cube")
    ima_std = DataObj("image")
    ima_dct = DataObj("image")
    segmap_cont = DataObj("image")
    segmap_merged = DataObj("image")
    cube_std_local_min = DataObj("cube")
    cube_std_local_max = DataObj("cube")

    def run(self, orig, dct_order=10, dct_approx=False, pfasegcont=0.01,
            pfasegres=0.01, local_max_size=3, bins="fd"):
        self._loginfo("DCT + standardization + local extrema (fused on device)")
        dev, host = orig.engine.preprocess(dct_order, dct_approx,
                                           local_max_size)

        self._loginfo("Std signal saved in self.cube_std and self.ima_std")
        self.store_cube_dev("cube_std", dev["cube_std"])
        self.store_image("ima_std", host["ima_std"])

        self._loginfo("Local maxima of std cube values saved")
        self.store_cube_dev("cube_std_local_max", dev["cube_std_local_max"])
        self.store_cube_dev("cube_std_local_min", dev["cube_std_local_min"])

        self._loginfo("DCT continuum saved in self.cont_dct and self.ima_dct")
        self.store_cube_dev("cont_dct", dev["cont_dct"])
        self.store_image("ima_dct", host["ima_dct"])

        mean_fwhm = int(np.ceil(np.mean(orig.FWHM_PSF)))

        self._loginfo("Segmentation based on the continuum")
        with np.errstate(divide="ignore"):
            map1 = np.log10(host["cont_sumsq"])
        thresh, map_cont = compute_segmap_gauss(map1, pfasegcont, mean_fwhm,
                                                bins=bins)
        self._loginfo(
            "Found %d regions, threshold=%.2f",
            len(np.unique(map_cont)) - 1, thresh,
        )
        self.store_image("segmap_cont", map_cont)

        self._loginfo("Segmentation based on the residual")
        map2 = host["o2"]
        thresh, map_res = compute_segmap_gauss(map2, pfasegres, mean_fwhm,
                                               bins=bins)
        self._loginfo(
            "Found %d regions, threshold=%.2f",
            len(np.unique(map_res)) - 1, thresh,
        )

        self._loginfo("Merging both maps")
        segmap, nlabels = ndi.label((map_cont > 0) | (map_res > 0))
        self._loginfo("Segmap saved in self.segmap_merged (%d regions)", nlabels)
        self.store_image("segmap_merged", segmap)

        # diagnostics-only product: free its HBM on small-memory devices
        orig.engine.maybe_offload("cont_dct")


class CreateAreas(Step):
    """Build the area map that distributes the PCA over zones/devices.

    Parameters: pfa (segmentation PFA), minsize / maxsize (target area side
    in pixels).
    """

    name = "areas"
    desc = "Areas creation"
    areamap = DataObj("image")

    def run(self, orig, pfa=0.2, minsize=100, maxsize=None):
        nexpmap = (np.sum(~orig.mask, axis=0) > 0).astype(int)
        nb_subcube = np.maximum(
            1, int(np.sqrt(np.sum(nexpmap) / (minsize ** 2)))
        )
        if nb_subcube > 1:
            if maxsize is None:
                maxsize = minsize * 2
            min_size2 = minsize ** 2
            max_size2 = maxsize ** 2

            self._loginfo("First segmentation of %d^2 square", nb_subcube)
            squares = area_segmentation_square_fusion(
                nexpmap, min_size2, max_size2, nb_subcube, orig.Ny, orig.Nx
            )
            self._logdebug("Sources fusion")
            fused, src = area_segmentation_sources_fusion(
                orig.segmap_merged.data, squares, pfa, orig.Ny, orig.Nx
            )
            self._logdebug("Convex envelope")
            convex = area_segmentation_convex_fusion(fused, src)
            self._logdebug("Areas dilation")
            grown = area_growing(convex, nexpmap)
            self._logdebug("Fusion of small area")
            areamap = area_segmentation_final(grown, min_size2, max_size2)
        else:
            areamap = nexpmap

        areamap = areamap.astype(np.int64)
        labels = np.unique(areamap)
        nb_areas = len(labels) - 1 if 0 in labels else len(labels)
        orig.param["nbareas"] = nb_areas
        self.store_image("areamap", areamap)
        self._loginfo("Save the map of areas in self.areamap")
        self._loginfo("%d areas generated", nb_areas)


class ComputePCAThreshold(Step):
    """Per-area O2 test and Gaussian-fit threshold for the greedy PCA.

    Parameter: pfa_test (default 0.01).
    """

    name = "compute_PCA_threshold"
    desc = "PCA threshold computation"
    thresO2 = DataObj("array")
    meaO2 = DataObj("array")
    stdO2 = DataObj("array")
    require = ("preprocessing", "areas")

    def run(self, orig, pfa_test=0.01):
        # O2 map on device (one (Ny, Nx) download); per-area Gaussian fits
        # on host (reference Compute_PCA_threshold, lib_origin.py:824-845)
        o2map = np.asarray(o2test(orig.engine.get("cube_std"))).astype(
            np.float64
        )
        areamap = orig.areamap.data
        results = []
        for area in range(1, orig.nbAreas + 1):
            test = o2map[areamap == area]
            hist, bins, thres, mea, std = compute_thresh_gaussfit(
                test, pfa_test
            )
            results.append((test, hist, bins, thres, mea, std))
            self._loginfo(
                "Area %d, estimation mean/std/threshold: %f/%f/%f",
                area, mea, std, thres,
            )
        (orig.testO2, orig.histO2, orig.binO2, thres, mea, std) = zip(*results)
        self.thresO2 = np.asarray(thres)
        self.meaO2 = np.asarray(mea)
        self.stdO2 = np.asarray(std)


class ComputeGreedyPCA(Step):
    """Zone-wise greedy PCA nuisance removal.

    Parameters: Noise_population (background fraction denominator), itermax,
    threshold_list (per-area threshold override).
    """

    name = "compute_greedy_PCA"
    desc = "Greedy PCA computation"
    cube_faint = DataObj("cube")
    mapO2 = DataObj("image")
    require = ("preprocessing", "areas", "compute_PCA_threshold")

    def run(self, orig, Noise_population=50, itermax=100, threshold_list=None):
        thr = orig.thresO2 if threshold_list is None else threshold_list
        orig.param["threshold_list"] = [float(t) for t in thr]
        self._loginfo(
            "   - List of threshold = %s", " ".join("%.2f" % t for t in thr)
        )
        self._loginfo("Compute greedy PCA on each zone (device-resident)")
        faint, mapo2, nstop = orig.engine.greedy_pca_by_area(
            orig.areamap.data, thr, orig.testO2,
            noise_population=Noise_population, itermax=itermax,
        )
        if nstop > 0:
            self._logwarning(
                "The iterations have been reached the limit of %d in %d cases",
                itermax, nstop,
            )
        self._loginfo("Save the faint signal in self.cube_faint")
        self.store_cube_dev("cube_faint", faint)
        self._loginfo(
            "Save numbers of iterations used by testO2 for each spaxel "
            "in self.mapO2"
        )
        self.store_image("mapO2", mapo2)
        # no later device stage reads cube_std (its local extrema are
        # separate products): free its HBM on small-memory devices
        orig.engine.maybe_offload("cube_std")


class ComputeTGLR(Step):
    """GLR matched-filter test and its local extrema.

    Parameters: size (max-filter box), ncpu (accepted for API compatibility;
    the device kernel is already data-parallel), pcut (profile trim),
    pmeansub (subtract profile means).
    """

    name = "compute_TGLR"
    desc = "GLR test"
    cube_correl = DataObj("cube")
    cube_correl_min = DataObj("cube")
    cube_profile = DataObj("cube")
    cube_local_min = DataObj("cube")
    cube_local_max = DataObj("cube")
    maxmap = DataObj("image")
    minmap = DataObj("image")
    require = ("compute_greedy_PCA",)

    def run(self, orig, size=3, ncpu=1, pcut=1e-8, pmeansub=True):
        self._loginfo("Correlation (device-resident GLR + local extrema)")
        dev, host = orig.engine.tglr(
            orig.PSF, orig.wfields, orig.profiles,
            pcut=pcut, pmeansub=pmeansub, size=size,
        )
        self._loginfo("Save the TGLR value in self.cube_correl")
        self.store_cube_dev("cube_correl", dev["cube_correl"])
        self.store_cube_dev("cube_correl_min", dev["cube_correl_min"])

        self._loginfo(
            "Save the number of profile associated to the TGLR "
            "in self.cube_profile"
        )
        self.store_cube_dev("cube_profile", dev["cube_profile"],
                            post=lambda a: a.astype(np.int16))

        self._loginfo("Save the map of maxima in self.maxmap")
        self.store_image("maxmap", host["maxmap"])
        self.store_image("minmap", host["minmap"])

        self._loginfo("Compute p-values of local maximum of correlation values")
        self._loginfo("Save self.cube_local_max from max correlations")
        self.store_cube_dev("cube_local_max", dev["cube_local_max"])
        self._loginfo("Save self.cube_local_min from min correlations")
        self.store_cube_dev("cube_local_min", dev["cube_local_min"])
        orig.engine.maybe_offload("cube_faint", "cube_correl_min")


class ComputePurityThreshold(Step):
    """Self-calibrated detection thresholds for a target purity.

    Parameters: purity, purity_std, threshlist, pfasegfinal, bins.
    """

    name = "compute_purity_threshold"
    desc = "Compute Purity threshold"
    Pval = DataObj("table")
    Pval_comp = DataObj("table")
    segmap_purity = DataObj("image")
    require = ("compute_TGLR",)

    def run(self, orig, purity=0.9, purity_std=None, threshlist=None,
            pfasegfinal=1e-5, bins="fd"):
        if purity_std is None:
            purity_std = purity
        orig.param.update(dict(purity=purity, purity_std=purity_std))

        thresh, map_res = compute_segmap_gauss(
            orig.maxmap.data, pfasegfinal, 0, bins=bins
        )
        segmap, _ = ndi.label((map_res > 0) | (orig.segmap_merged.data > 0))
        self.store_image("segmap_purity", segmap)

        self._loginfo("Estimation of threshold with purity = %.2f", purity)
        eng = orig.engine
        threshold, self.Pval = compute_threshold_purity(
            purity, eng.get("cube_local_max"), eng.get("cube_local_min"),
            segmap, threshlist=threshlist,
        )
        orig.param["threshold"] = threshold
        self._loginfo("Threshold: %.2f ", threshold)

        self._loginfo(
            "Estimation of threshold std with purity = %.2f", purity_std
        )
        threshold_std, self.Pval_comp = compute_threshold_purity(
            purity_std, eng.get("cube_std_local_max"),
            eng.get("cube_std_local_min"), threshlist=threshlist,
        )
        orig.param["threshold_std"] = threshold_std
        self._loginfo("Threshold: %.2f ", threshold_std)


class Detection(Step):
    """Threshold the local extrema and build the merged line catalog.

    Parameters: threshold / threshold_std (overrides), tol_spat, tol_spec,
    maxdist_lines, segmap (optional user segmentation map path).
    """

    name = "detection"
    desc = "Thresholding and spatio-spectral merging"
    Cat0 = DataObj("table")
    Cat1 = DataObj("table")
    segmap_label = DataObj("image")

    def det_correl_min(self, thresh=None):
        """3D positions of detections in correl_min."""
        thresh = thresh or self.orig.param["threshold"]
        return np.where(self.orig.cube_local_min.data > thresh)

    def run(self, orig, threshold=None, threshold_std=None, tol_spat=3,
            tol_spec=5, maxdist_lines=2.5, segmap=None):
        if threshold is not None:
            orig.threshold_correl = threshold
        if threshold_std is not None:
            orig.threshold_std = threshold_std

        self._loginfo("Thresholding correl (>%.2f)", orig.threshold_correl)
        # device-side sparse extraction: only (n, 3) indices + values cross
        # the host boundary, never the local-max cubes themselves
        (z, y, x), tglr, (profvals,) = orig.engine.detections_above(
            "cube_local_max", orig.threshold_correl, gather=("cube_profile",)
        )
        cat = Table(data=[x, y, z], names=("x0", "y0", "z0"))
        cat["comp"] = np.zeros(len(cat), dtype=int)
        cat["STD"] = np.full(len(cat), np.nan)
        cat["T_GLR"] = tglr.astype(float)
        cat["profile"] = profvals.astype(int)
        self._loginfo("%d detected lines", len(cat))

        self._loginfo("Thresholding std (>%.2f)", orig.threshold_std)
        (z, y, x), stdvals, _ = orig.engine.detections_above(
            "cube_std_local_max", orig.threshold_std
        )
        cat_std = Table(data=[x, y, z], names=("x0", "y0", "z0"))
        cat_std["comp"] = np.ones(len(cat_std), dtype=int)
        cat_std["STD"] = stdvals.astype(float)
        cat_std["T_GLR"] = np.full(len(cat_std), np.nan)
        cat_std["profile"] = np.zeros(len(cat_std), dtype=int)
        self._loginfo("%d detected lines", len(cat_std))

        self.Cat0 = _format_cat(vstack([cat, cat_std]))

        keep = filter_duplicate_lines(cat, cat_std, maxdist_lines)
        cat_std = cat_std[np.asarray(keep, dtype=int)]
        self._loginfo("kept %d lines from std after filtering", len(keep))

        if segmap is not None:
            self.logger.info("Overriding segmap_cont with the given one")
            self.segmap_label = Image(segmap) if isinstance(segmap, str) else segmap
            if self.segmap_label.shape != orig.shape[1:]:
                raise ValueError(
                    "segmap does not have the same shape as the processed cube"
                )
        else:
            self.logger.info(
                "Using segmap_cont with an additional deblending step"
            )
            deb = deblend_sources(
                orig.ima_dct.data, orig.segmap_cont.data, npixels=5,
                mode="linear",
            )
            self.segmap_label = Image(data=deb, wcs=orig.wcs, copy=False)

        cat = _format_cat(vstack([cat, cat_std]))
        cat["area"] = self.segmap_label.data[
            np.asarray(cat["y0"], int), np.asarray(cat["x0"], int)
        ].astype(int)

        self.logger.info("Spatio-spectral merging...")
        cat = spatiospectral_merging(cat, tol_spat, tol_spec)

        z = np.asarray(cat["z0"])
        y = np.asarray(cat["y0"], float)
        x = np.asarray(cat["x0"], float)
        sky = orig.wcs.pix2sky(np.stack((y, x), axis=1))
        cat.add_column(sky[:, 1], name="ra", index=0)
        cat.add_column(sky[:, 0], name="dec", index=1)
        cat.add_column(orig.wave.coord(z), name="lbda", index=2)
        cat.rename_column("area", "seg_label")

        cat["imatch"] = np.asarray(cat["imatch"]) + 1
        cat["imatch2"] = np.asarray(cat["imatch2"]) + 1

        old_ids = np.unique(cat["imatch"])
        idmap = np.zeros(old_ids.max() + 1, dtype=int)
        idmap[old_ids] = np.arange(1, len(old_ids) + 1)
        cat.add_column(idmap[np.asarray(cat["imatch"])], name="ID", index=0)
        cat.sort("ID")

        self._loginfo("Purity estimation")
        cat = purity_estimation(cat, orig.Pval, orig.Pval_comp)

        cat_comp = cat[np.asarray(cat["comp"]) == 1]
        ns = len(set(np.asarray(cat["ID"])))
        ds = len(set(np.asarray(cat_comp["ID"])) - set(np.asarray(cat["ID"])))
        self.Cat1 = cat
        self._loginfo(
            "Save the catalog in self.Cat1 (%d [+%s] sources, %d [+%d] lines)",
            ns, ds, len(cat), len(cat_comp),
        )


class ComputeSpectra(Step):
    """Refined line positions, fluxes and deconvolved spectra.

    Parameters: grid_dxy (spatial search radius), spectrum_size_fwhm
    (spectrum trim length in line-FWHM units).
    """

    name = "compute_spectra"
    desc = "Lines estimation"
    Cat2 = DataObj("table")
    spectra = DataObj("spectra")
    require = ("detection",)

    def run(self, orig, grid_dxy=0, spectrum_size_fwhm=6):
        from ..core.containers import Spectrum

        cat1 = orig.Cat1
        out = estimation_line_arrays(
            np.asarray(cat1["x0"], int),
            np.asarray(cat1["y0"], int),
            np.asarray(cat1["z0"], int),
            orig.cube_raw, orig.var, orig.PSF, weights=orig.wfields,
            size_grid=grid_dxy, criteria="flux", order_dct=30, horiz_psf=1,
            horiz=5, engine=orig.engine,
        )
        cat2 = cat1.copy()
        sky = orig.wcs.pix2sky(
            np.stack((out["y"].astype(float), out["x"].astype(float)), axis=1)
        )
        cat2["ra"] = sky[:, 1]
        cat2["dec"] = sky[:, 0]
        cat2["lbda"] = orig.wave.coord(out["z"])
        cat2.add_columns(
            [out["x"], out["y"], out["z"], out["residual"], out["flux"],
             np.arange(1, len(cat2) + 1)],
            names=["x", "y", "z", "residual", "flux", "num_line"],
            indexes=[4, 5, 6, 8, 8, 8],
        )
        _format_cat(cat2)
        self.Cat2 = cat2
        self._loginfo(
            "Save the updated catalog in self.Cat2 (%d lines)", len(cat2)
        )

        radius = np.ceil(
            np.asarray(orig.FWHM_profiles) * spectrum_size_fwhm / 2
        ).astype(int)
        self.spectra = OrderedDict()
        for i in range(len(cat2)):
            if not out["ok"][i]:
                continue
            prof = int(np.asarray(cat2["profile"])[i])
            zline = int(out["z"][i])
            num = int(np.asarray(cat2["num_line"])[i])
            sp = Spectrum(
                data=out["line"][i], var=out["line_var"][i], wave=orig.wave,
            )
            self.spectra[num] = sp.subspec(
                zline - radius[prof], zline + radius[prof]
            )
        self._loginfo("Save estimated spectrum of each line in self.spectra")


class CleanResults(Step):
    """Merge near-duplicate lines, build the unique-source table and attach
    detection statistics.

    Parameter: merge_lines_z_threshold.
    """

    name = "clean_results"
    desc = "Results cleaning"
    Cat3_lines = DataObj("table")
    Cat3_sources = DataObj("table")
    require = ("compute_spectra",)

    def run(self, orig, merge_lines_z_threshold=5):
        self.Cat3_lines = merge_similar_lines(
            orig.Cat2, z_pix_threshold=merge_lines_z_threshold
        )
        sources = unique_sources(self.Cat3_lines)
        self.Cat3_sources = add_tglr_stat(
            sources, self.Cat3_lines, orig.engine.std_scalar("cube_correl"),
            orig.engine.std_scalar("cube_std"),
        )
        self._loginfo(
            "Save the unique source catalog in self.Cat3_sources (%d sources)",
            len(self.Cat3_sources),
        )
        self._loginfo(
            "Save the cleaned lines in self.Cat3_lines (%d lines)",
            len(self.Cat3_lines),
        )
        nmerged = int(np.sum(np.asarray(self.Cat3_lines["merged_in"]) != -9999))
        if nmerged:
            self._loginfo("%d lines were merged in nearby lines", nmerged)


class CreateMasks(Step):
    """Write the source mask and sky mask FITS file of every source.

    Parameters: path, overwrite, mask_size, min_sky_npixels,
    seg_thres_factor, fwhm_factor, plot_problems.
    """

    name = "create_masks"
    desc = "Mask creation"
    require = ("clean_results",)

    def run(self, orig, path=None, overwrite=True, mask_size=25,
            min_sky_npixels=100, seg_thres_factor=0.5, fwhm_factor=2,
            plot_problems=False):
        from ..artifacts.masks import create_masks

        if path is None:
            out_dir = "%s/masks" % orig.outpath
        else:
            if os.path.exists(path):
                raise ValueError(f"Invalid path: {path}")
            path = os.path.normpath(path)
            out_dir = f"{path}/{orig.name}/masks"

        if overwrite:
            shutil.rmtree(out_dir, ignore_errors=True)
        os.makedirs(out_dir, exist_ok=True)

        orig.param["mask_filename_tpl"] = f"{out_dir}/source-mask-%0.5d.fits"
        orig.param["skymask_filename_tpl"] = f"{out_dir}/sky-mask-%0.5d.fits"

        create_masks(
            line_table=orig.Cat3_lines,
            source_table=orig.Cat3_sources,
            profile_fwhm=orig.FWHM_profiles,
            cube_correl=orig.cube_correl,
            threshold_correl=orig.threshold_correl,
            cube_std=orig.cube_std,
            threshold_std=orig.threshold_std,
            segmap=orig.segmap_label,
            fwhm=orig.LBDA_FWHM_PSF,
            out_dir=out_dir,
            mask_size=mask_size,
            min_sky_npixels=min_sky_npixels,
            seg_thres_factor=seg_thres_factor,
            fwhm_factor=fwhm_factor,
            plot_problems=plot_problems,
        )


class SaveSources(Step):
    """Write one Source FITS file per source.

    Parameters: version (required), path, n_jobs, author, nb_fwhm,
    expmap_filename, overwrite.
    """

    name = "save_sources"
    desc = "Save sources"

    def run(self, orig, version, *, path=None, n_jobs=1, author="",
            nb_fwhm=2, expmap_filename=None, overwrite=True):
        from ..artifacts.source_creation import create_all_sources

        if path is None:
            outpath = orig.outpath
        else:
            if not os.path.exists(path):
                raise ValueError(f"Invalid path: {path}")
            outpath = os.path.join(os.path.normpath(path), orig.name)
        out_dir = os.path.join(outpath, "sources")

        if overwrite:
            shutil.rmtree(out_dir, ignore_errors=True)
        os.makedirs(out_dir, exist_ok=True)

        # the source files reference the dumped products
        orig.write()

        create_all_sources(
            cat3_sources=orig.Cat3_sources,
            cat3_lines=orig.Cat3_lines,
            origin_params=orig.param,
            cube_cor_filename=os.path.join(outpath, "cube_correl.fits"),
            cube_std_filename=os.path.join(outpath, "cube_std.fits"),
            mask_filename_tpl=orig.param["mask_filename_tpl"],
            skymask_filename_tpl=orig.param["skymask_filename_tpl"],
            spectra_fits_filename=os.path.join(outpath, "spectra.fits"),
            segmaps={
                "LABEL": os.path.join(outpath, "segmap_label.fits"),
                "MERGED": os.path.join(outpath, "segmap_merged.fits"),
            },
            version=version,
            profile_fwhm=orig.FWHM_profiles,
            out_tpl=os.path.join(out_dir, "source-%0.5d.fits"),
            n_jobs=n_jobs,
            author=author,
            nb_fwhm=nb_fwhm,
            expmap_filename=expmap_filename,
        )


STEPS = [
    Preprocessing,
    CreateAreas,
    ComputePCAThreshold,
    ComputeGreedyPCA,
    ComputeTGLR,
    ComputePurityThreshold,
    Detection,
    ComputeSpectra,
    CleanResults,
    CreateMasks,
    SaveSources,
]
