"""The ORIGIN session object: step orchestration, checkpoint/resume, stats.

Re-architecture of reference origin.py: the same user-facing surface
(``ORIGIN.init`` / ``load`` / ``write`` / ``stepNN_*`` methods / ``status`` /
``timestat`` / ``stat`` / plots) with a clean parameter schema (safe YAML,
no pickled Python objects) and the origin_tpu substrate underneath.
"""

from __future__ import annotations

import glob
import inspect
import logging
import os
import shutil
import sys
import datetime as _dt
from collections import OrderedDict
from functools import cached_property
from logging.handlers import RotatingFileHandler

import numpy as np
import yaml

from .. import fitsio
from ..core.containers import Cube, Image
from ..core.fsf import FieldsMap, read_fsf_from_header
from ..core.profiles import (
    DICO_3FWHM, DICO_FWHM_2_12, default_dictionary_path, load_dictionary,
)
from ..core.table import Table
from ..version import version as __version__
from . import compat
from . import steps as steps_mod
from .plotting import PlotMixin
from .steps import Status

__all__ = ["ORIGIN"]


def setup_logging(name="origin_tpu", level="DEBUG", color=False,
                  fmt="%(levelname)-05s: %(message)s", stream=None):
    """Configure a stream logger (replaces mpdaf.log.setup_logging)."""
    logger = logging.getLogger(name)
    logger.setLevel("DEBUG")
    logger.handlers = [
        h for h in logger.handlers
        if not isinstance(h, logging.StreamHandler)
        or isinstance(h, RotatingFileHandler)
    ]
    handler = logging.StreamHandler(stream or sys.stdout)
    handler.setLevel(level)
    handler.setFormatter(logging.Formatter(fmt))
    logger.addHandler(handler)
    return logger


def _sanitize(obj):
    """Make the parameter tree safe-YAML serializable."""
    if isinstance(obj, dict):
        return {k: _sanitize(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_sanitize(v) for v in obj]
    if isinstance(obj, Status):
        return obj.name
    if isinstance(obj, (np.integer,)):
        return int(obj)
    if isinstance(obj, (np.floating,)):
        return float(obj)
    if isinstance(obj, np.ndarray):
        return obj.tolist()
    if isinstance(obj, (inspect.Parameter.empty.__class__,)):
        return None
    return obj


class ORIGIN(PlotMixin):
    """ORIGIN session: blind emission-line detection on one datacube.

    Composed of the raw cube + variance, a dictionary of spectral profiles
    and the FSF model; drives the 11 processing steps
    (``step01_preprocessing`` .. ``step11_save_sources``).
    """

    def __init__(
        self,
        filename,
        name="origin",
        path=".",
        loglevel="DEBUG",
        logcolor=False,
        fieldmap=None,
        profiles=None,
        PSF=None,
        LBDA_FWHM_PSF=None,
        FWHM_PSF=None,
        PSF_size=25,
        param=None,
        imawhite=None,
        wfields=None,
        mesh=None,
    ):
        self.path = path
        self.mesh = mesh
        self.name = name
        self.outpath = os.path.join(path, name)
        self.param = param or {}
        self.file_handler = None
        os.makedirs(self.outpath, exist_ok=True)

        # persistent XLA compilation cache: carries the pipeline's compiled
        # programs across processes (cold-start compiles cost minutes on
        # some backends); ORIGIN_TPU_COMPILE_CACHE=0 disables
        from ..utils import enable_compile_cache

        enable_compile_cache()

        setup_logging(name="origin_tpu", level=loglevel, color=logcolor,
                      stream=sys.stdout)
        self.logger = logging.getLogger("origin_tpu")
        self._setup_logfile(self.logger)
        self.param["loglevel"] = loglevel
        self.param["logcolor"] = logcolor

        try:
            self._init_session(filename, fieldmap, profiles, PSF,
                               LBDA_FWHM_PSF, FWHM_PSF, PSF_size, param,
                               imawhite, wfields)
        except Exception:
            # a failed construction (corrupt cube, bad FSF header, bad
            # mesh) must not leave its rotating-file handler on the
            # shared logger: every later session's records would
            # duplicate into the dead session's logfile, one leaked fd
            # per failure
            self.close_logfile()
            raise

    def _init_session(self, filename, fieldmap, profiles, PSF,
                      LBDA_FWHM_PSF, FWHM_PSF, PSF_size, param, imawhite,
                      wfields):
        self.logger.info("Step 00 - Initialization (ORIGIN v%s)", __version__)

        # step wiring: instantiate, fix signatures, expose stepNN_* methods
        self.steps = OrderedDict()
        self._product_owner = {}
        for i, cls in enumerate(steps_mod.STEPS, start=1):
            step = cls(self, i, self.param)
            sig = inspect.signature(step.run)
            step.__signature__ = sig.replace(
                parameters=[p for p in sig.parameters.values()
                            if p.name != "orig"]
            )
            self.steps[step.name] = step
            self.__dict__[step.method_name] = step
            for pname in step.store.names():
                self._product_owner[pname] = step

        fresh_session = param is None
        # False until THIS session has written its instrument files: a
        # fresh session initialized into a reused directory must
        # overwrite another dataset's cube_psf/ima_white/wfield files,
        # not adopt them (loaded sessions own the existing files)
        self._aux_synced = not fresh_session

        self.logger.info("Read the Data Cube %s", filename)
        self.param["cubename"] = filename
        plan = None
        if fresh_session and self.mesh is None:
            # a fresh single-device session is about to run step 01:
            # decode the cube in z-slabs and upload each slab as it is
            # byteswapped, so the (large) input transfer overlaps the
            # FITS read itself instead of only the tail of init
            # (pipeline.ingest; falls back for layouts it cannot stream)
            from .ingest import IngestPlan

            plan = IngestPlan.scan(filename)
        if plan is not None:
            self.Nz, self.Ny, self.Nx = self.shape = plan.shape
            self.cube = self.engine.stream_inputs(plan)
        else:
            self.cube = Cube(filename)
            self.Nz, self.Ny, self.Nx = self.shape = self.cube.shape

        self.wcs = self.cube.wcs
        self.wave = self.cube.wave

        if fresh_session and plan is None:
            # eager-read path: start the input uploads now so they
            # stream behind the remaining init work (FSF build, white
            # image); step 01 then just joins them.  Restored sessions
            # skip this — status/info inspection must not touch the
            # device.  A bad session mesh surfaces here (fail fast;
            # __init__ releases the just-opened logfile on any
            # construction failure).
            self.engine.prefetch_inputs()

        if profiles is None:
            profiles = default_dictionary_path()
        self.param["profiles"] = profiles

        self.param["fieldmap"] = fieldmap
        self.param["PSF_size"] = PSF_size
        self._read_fsf(
            self.cube, fieldmap=fieldmap, wfields=wfields, PSF=PSF,
            LBDA_FWHM_PSF=LBDA_FWHM_PSF, FWHM_PSF=FWHM_PSF, PSF_size=PSF_size,
        )

        self.ima_white = imawhite if imawhite else self.cube.mean(axis=0)
        self.testO2, self.histO2, self.binO2 = None, None, None
        self._o2_files_stale = True
        self.logger.info("Step 00 finished")

    def __getattr__(self, name):
        if name.startswith("__"):
            raise AttributeError(name)
        owners = self.__dict__.get("_product_owner", {})
        if name in owners:
            return getattr(owners[name], name)
        raise AttributeError(f"unknown attribute {name}")

    def __dir__(self):
        return (
            list(super().__dir__())
            + list(self._product_owner.keys())
            + [s.method_name for s in self.steps.values()]
        )

    # -- device engine -------------------------------------------------------
    @cached_property
    def engine(self):
        """Device-resident front-end engine (see pipeline.engine).

        With a session mesh (``init(..., mesh=...)``), the MeshEngine runs
        the front-end steps 01-07 sharded over the mesh's ``sp`` axis with
        the same interface.
        """
        from .engine import DeviceEngine, MeshEngine

        if self.mesh is not None:
            return MeshEngine(self, self.mesh)
        return DeviceEngine(self)

    # -- raw data views ------------------------------------------------------
    @cached_property
    def cube_raw(self):
        return self.cube.filled(0).astype(np.float32, copy=False)

    @cached_property
    def mask(self):
        return self.cube.masked_invalid()

    @cached_property
    def var(self):
        var = self.cube.var_filled(np.inf)
        if var is None:
            var = np.ones(self.shape, dtype=np.float32)
        return var.astype(np.float32, copy=False)

    # -- constructors --------------------------------------------------------
    @classmethod
    def init(cls, cube, fieldmap=None, profiles=None, PSF=None,
             LBDA_FWHM_PSF=None, FWHM_PSF=None, PSF_size=25, name="origin",
             path=".", loglevel="DEBUG", logcolor=False, mesh=None):
        """Create an ORIGIN session from a cube FITS file.

        ``mesh`` (optional): a ``jax.sharding.Mesh`` with a (1 x sp) shape
        (see ``origin_tpu.parallel.make_mesh(n, dp=1)``); the detection
        front-end (steps 01-07) then runs sharded over its ``sp`` axis.
        """
        return cls(
            cube, path=path, name=name, fieldmap=fieldmap, profiles=profiles,
            PSF=PSF, LBDA_FWHM_PSF=LBDA_FWHM_PSF, FWHM_PSF=FWHM_PSF,
            PSF_size=PSF_size, loglevel=loglevel, logcolor=logcolor,
            mesh=mesh,
        )

    @classmethod
    def load(cls, folder, newname=None, loglevel=None, logcolor=None,
             mesh=None):
        """Restore a saved session; optionally fork it under a new name.

        A mesh is runtime state, not session state: pass ``mesh=`` again to
        resume a sharded session (the on-disk format is identical).
        """
        path = os.path.dirname(os.path.abspath(folder))
        name = os.path.basename(folder)

        with open(f"{folder}/{name}.yaml") as stream:
            text = stream.read()
        if compat.looks_like_reference_yaml(text):
            # session written by the reference muse_origin package: its
            # python-tagged YAML dialect is decoded into our schema
            # (same product file names on disk, reference steps.py:301-337)
            param = compat.loads_params(text)
        else:
            param = yaml.safe_load(text)

        # convert step status strings back into enums
        for key, val in param.items():
            if isinstance(val, dict) and "status" in val:
                val["status"] = Status[val["status"]]

        # a session moved from another machine may reference a profile
        # dictionary by an absolute path that no longer exists; the two
        # dictionaries shipped with the reference are also shipped here
        prof = param.get("profiles")
        if prof and not os.path.isfile(str(prof)):
            base = os.path.basename(str(prof))
            if base in (DICO_3FWHM, DICO_FWHM_2_12):
                packaged = default_dictionary_path(base)
                logging.getLogger(__name__).warning(
                    "profile dictionary %s not found; using the packaged %s",
                    prof, packaged,
                )
                param["profiles"] = packaged

        FWHM_PSF = (
            np.asarray(param["FWHM PSF"]) if "FWHM PSF" in param else None
        )
        LBDA_FWHM_PSF = (
            np.asarray(param["LBDA FWHM PSF"])
            if "LBDA FWHM PSF" in param else None
        )

        if param.get("PSF") and os.path.isfile(str(param["PSF"])):
            PSF = param["PSF"]
        elif os.path.isfile("%s/cube_psf.fits" % folder):
            PSF = "%s/cube_psf.fits" % folder
        else:
            files = glob.glob("%s/cube_psf_*.fits" % folder)
            PSF = (
                None if len(files) == 0
                else files[0] if len(files) == 1 else sorted(files)
            )
        wfield_files = sorted(glob.glob("%s/wfield_*.fits" % folder))
        wfields = wfield_files if wfield_files else None

        ima_white = (
            Image("%s/ima_white.fits" % folder)
            if os.path.isfile("%s/ima_white.fits" % folder) else None
        )

        if newname is not None:
            shutil.copytree(os.path.join(path, name),
                            os.path.join(path, newname))
            name = newname

        loglevel = loglevel if loglevel is not None else param["loglevel"]
        logcolor = logcolor if logcolor is not None else param["logcolor"]

        obj = cls(
            path=path, name=name, param=param, imawhite=ima_white,
            loglevel=loglevel, logcolor=logcolor,
            filename=param["cubename"], fieldmap=param.get("fieldmap"),
            wfields=wfields, profiles=param["profiles"], PSF=PSF,
            FWHM_PSF=FWHM_PSF, LBDA_FWHM_PSF=LBDA_FWHM_PSF, mesh=mesh,
        )

        for step in obj.steps.values():
            step.load(obj.outpath)

        nb_areas = param.get("nbareas")
        if nb_areas is not None:
            for attr in ("testO2", "histO2", "binO2"):
                if os.path.isfile("%s/%s_1.txt" % (folder, attr)):
                    setattr(obj, attr, [
                        np.loadtxt("%s/%s_%d.txt" % (folder, attr, a), ndmin=1)
                        for a in range(1, nb_areas + 1)
                    ])
                    obj._o2_files_stale = False  # just read from those files
        return obj

    # -- logging / reporting -------------------------------------------------
    def info(self):
        """Print the processing log (without the step-completion lines)."""
        with open(self.logfile) as f:
            for line in f:
                if "finished" not in line:
                    print(line, end="")

    def status(self):
        """Print the processing status of every step."""
        for name, step in self.steps.items():
            print(f"- {step.idx:02d}, {name}: {step.status.name}")

    def _setup_logfile(self, logger):
        if self.file_handler is not None:
            self.file_handler.close()
            logger.handlers.remove(self.file_handler)
        self.logfile = os.path.join(self.outpath, self.name + ".log")
        self.file_handler = RotatingFileHandler(self.logfile, "a", 1000000, 1)
        self.file_handler.setLevel(logging.DEBUG)
        self.file_handler.setFormatter(
            logging.Formatter("%(asctime)s %(message)s")
        )
        logger.addHandler(self.file_handler)

    def close_logfile(self):
        """Close and detach this session's rotating logfile handler.

        For drivers that process many sessions in one process (the CLI
        survey mode, benchmarks, tests) — releases the file descriptor
        without touching the shared console handler.
        """
        if self.file_handler is not None:
            self.file_handler.close()
            if self.file_handler in self.logger.handlers:
                self.logger.handlers.remove(self.file_handler)
            self.file_handler = None

    def set_loglevel(self, level):
        """Set the console logging level."""
        handler = next(
            h for h in self.logger.handlers
            if isinstance(h, logging.StreamHandler)
            and not isinstance(h, RotatingFileHandler)
        )
        handler.setLevel(level)
        self.param["loglevel"] = level

    # -- parameters ---------------------------------------------------------
    @property
    def nbAreas(self):
        """Number of areas for the zone-wise PCA."""
        return self.param.get("nbareas")

    @property
    def threshold_correl(self):
        """Detection threshold on the max-correlation local maxima."""
        return self.param.get("threshold")

    @threshold_correl.setter
    def threshold_correl(self, value):
        self.param["threshold"] = value

    @property
    def threshold_std(self):
        """Detection threshold on the std-cube local maxima."""
        return self.param.get("threshold_std")

    @threshold_std.setter
    def threshold_std(self, value):
        self.param["threshold_std"] = value

    @cached_property
    def profiles(self):
        """The spectral line profiles."""
        path = self.param["profiles"]
        self.logger.info("Load dictionary of spectral profile %s", path)
        profiles, _ = load_dictionary(path)
        return profiles

    @cached_property
    def FWHM_profiles(self):
        """FWHM of the spectral profiles, in pixels."""
        _, fwhms = load_dictionary(self.param["profiles"])
        return fwhms

    # -- FSF -------------------------------------------------------------------
    def _read_fsf(self, cube, fieldmap=None, wfields=None, PSF=None,
                  LBDA_FWHM_PSF=None, FWHM_PSF=None, PSF_size=25):
        self.wfields = None
        info = self.logger.info

        if PSF is None or FWHM_PSF is None or LBDA_FWHM_PSF is None:
            info("Compute FSFs from the datacube FITS header keywords")
            pixstep = cube.wcs.get_step(unit="arcsec")[0] if cube.wcs else 0.2
            fsf = read_fsf_from_header(cube.primary_header, pixstep=pixstep)
            lbda = cube.wave.coord()
            shape = (PSF_size, PSF_size)
            if not isinstance(fsf, list):
                self.PSF = fsf.get_3darray(lbda, shape).astype(np.float32)
                self.LBDA_FWHM_PSF = fsf.get_fwhm(lbda, unit="pix")
                self.FWHM_PSF = float(np.mean(self.LBDA_FWHM_PSF))
                info("mean FWHM of the FSFs = %.2f pixels", self.FWHM_PSF)
            else:
                self.PSF = [
                    f.get_3darray(lbda, shape).astype(np.float32) for f in fsf
                ]
                fwhm = np.array([f.get_fwhm(lbda, unit="pix") for f in fsf])
                self.LBDA_FWHM_PSF = np.mean(fwhm, axis=0)
                self.FWHM_PSF = np.mean(fwhm, axis=1)
                for i, fw in enumerate(self.FWHM_PSF):
                    info("mean FWHM of the FSFs (field %d) = %.2f pixels",
                         i, fw)
                info("Compute weight maps from field map %s", fieldmap)
                fmap = FieldsMap(fieldmap, nfields=len(fsf))
                self.wfields = fmap.compute_weights()
            self.param["PSF"] = cube.primary_header.get("FSFMODE", "header")
        else:
            self.LBDA_FWHM_PSF = np.asarray(LBDA_FWHM_PSF)
            if isinstance(PSF, str):
                info("Load FSFs from %s", PSF)
                self.param["PSF"] = PSF
                self.PSF = fitsio.getdata(PSF).astype(np.float32)
                if self.PSF.shape[1] != self.PSF.shape[2]:
                    raise ValueError("PSF must be a square image.")
                if not self.PSF.shape[1] % 2:
                    raise ValueError("The spatial size of the PSF must be odd.")
                if self.PSF.shape[0] != self.shape[0]:
                    raise ValueError(
                        "PSF and data cube have not the same dimensions "
                        "along the spectral axis."
                    )
                self.FWHM_PSF = float(np.mean(FWHM_PSF))
                self.param["FWHM PSF"] = np.asarray(FWHM_PSF).tolist()
                info("mean FWHM of the FSFs = %.2f pixels", self.FWHM_PSF)
            else:
                nfields = len(PSF)
                self.wfields = []
                self.PSF = []
                self.FWHM_PSF = list(np.asarray(FWHM_PSF))
                for n in range(nfields):
                    info("Load FSF from %s", PSF[n])
                    self.PSF.append(fitsio.getdata(PSF[n]).astype(np.float32))
                    info("Load weight maps from %s", wfields[n])
                    self.wfields.append(fitsio.getdata(wfields[n]))
                    info("mean FWHM of the FSFs (field %d) = %.2f pixels",
                         n, FWHM_PSF[n])

        self.param["FWHM PSF"] = np.asarray(self.FWHM_PSF).tolist()
        self.param["LBDA FWHM PSF"] = np.asarray(self.LBDA_FWHM_PSF).tolist()

    # -- checkpointing ------------------------------------------------------------
    def write(self, path=None, erase=False, compat=None):
        """Dump the whole session (every step product + parameters).

        With ``compat='reference'`` the session is instead exported in
        the reference package's on-disk dialect — dense standard FITS
        products and its python-tagged params YAML — into
        ``<path or self.path>/<self.name>`` (see
        :func:`origin_tpu.pipeline.compat.export_reference_session`).
        The exported directory loads in BOTH packages; origin_tpu's own
        richer forms (recipe files, sparse tables, scaled-int16 images)
        are decoded to dense in the process.
        """
        if compat is not None:
            from . import compat as compat_mod

            if compat != "reference":
                raise ValueError(f"unknown compat dialect: {compat!r}")
            folder = os.path.join(path or self.path, self.name)
            self.logger.info("Exporting reference-dialect session to %s",
                             folder)
            return compat_mod.export_reference_session(self, folder)
        self.logger.info("Writing...")
        if path is not None and path != self.path:
            if not os.path.exists(path):
                raise ValueError(f"path does not exist: {path}")
            self.path = path
            outpath = os.path.join(path, self.name)
            shutil.copytree(self.outpath, outpath)
            self.outpath = outpath
            self._setup_logfile(self.logger)
        reopen_log = False
        if erase:
            # the rotating-file handler holds <name>.log inside the tree:
            # close it before the rmtree and reopen after the directory
            # is recreated (the reference deletes with the handler open,
            # so its post-erase log output goes to an unlinked inode and
            # info() then fails on the missing file, origin.py:651-727)
            if self.file_handler is not None:
                self.close_logfile()
                reopen_log = True
            shutil.rmtree(self.outpath)
            self._o2_files_stale = True
        os.makedirs(self.outpath, exist_ok=True)
        if reopen_log:
            self._setup_logfile(self.logger)

        # the instrument files never change within a session: write them
        # only when they are not already on disk (a re-written checkpoint
        # would otherwise re-pay the PSF cube + white image every time)
        def _write_once(obj, fname):
            target = os.path.join(self.outpath, fname)
            if not self._aux_synced or not os.path.isfile(target):
                obj.write(target)

        if isinstance(self.PSF, list):
            for i, psf in enumerate(self.PSF):
                _write_once(Cube(data=psf, mask=False),
                            "cube_psf_%02d.fits" % i)
        else:
            _write_once(Cube(data=self.PSF, mask=False), "cube_psf.fits")
        if self.wfields is not None:
            for i, wfield in enumerate(self.wfields):
                _write_once(Image(data=np.asarray(wfield), mask=False),
                            "wfield_%02d.fits" % i)
        if self.ima_white is not None:
            _write_once(self.ima_white, "ima_white.fits")
        self._aux_synced = True  # subsequent write()s skip the rewrites

        # materialize device-resident products with minimal link traffic
        # (fused sparse fetches for the local-extrema cubes, overlapped
        # async copies for the dense ones) before dumping
        from .engine import DeferredCube, materialize_deferred

        pending = [
            val
            for step in self.steps.values()
            for name in step.store.names()
            # peek: fetching would trigger disk loads of already-parked
            # products just to inspect them; a product with an async park
            # in flight is that writer job's responsibility (it joins the
            # product's own transfer), not this pass's
            if name not in step.store._pending
            for val in (step.store.peek(name),)
            if isinstance(val, DeferredCube) and val.device is not None
            # recipe-backed products park as their generator files: no
            # host materialization is needed to write them
            and not val.recipe_active
        ]
        if pending:
            materialize_deferred(pending)

        for step in self.steps.values():
            step.dump(self.outpath)

        with open(f"{self.outpath}/{self.name}.yaml", "w") as stream:
            yaml.safe_dump(_sanitize(self.param), stream)

        # per-area O2 diagnostics: text serialization is slow at survey
        # scale, so rewrite only when step03 recomputed them
        if self.nbAreas is not None and self._o2_files_stale:
            wrote = False
            for attr in ("testO2", "histO2", "binO2"):
                values = getattr(self, attr)
                if values is not None:
                    wrote = True
                    for area in range(1, self.nbAreas + 1):
                        np.savetxt(
                            "%s/%s_%d.txt" % (self.outpath, attr, area),
                            values[area - 1],
                        )
            if wrote:
                self._o2_files_stale = False
        self.logger.info("Current session saved in %s", self.outpath)

    # -- summaries ------------------------------------------------------------------
    def timestat(self, table=False):
        """Runtime per step; returns a Table when ``table`` is True."""
        if table:
            names, exdates, extimes = [], [], []
            tot = 0.0
            for step in self.steps.values():
                if "execution_date" in step.meta:
                    names.append(step.method_name)
                    exdates.append(step.meta["execution_date"])
                    t = step.meta["runtime"]
                    tot += t
                    extimes.append(str(_dt.timedelta(seconds=t)))
            names.append("Total")
            exdates.append("")
            extimes.append(str(_dt.timedelta(seconds=tot)))
            return Table(data=[names, exdates, extimes],
                         names=["Step", "Exec Date", "Exec Time"])
        tot = 0.0
        for step in self.steps.values():
            if "execution_date" in step.meta:
                t = step.meta["runtime"]
                tot += t
                self.logger.info(
                    "%s executed: %s run time: %s", step.method_name,
                    step.meta["execution_date"], str(_dt.timedelta(seconds=t)),
                )
        self.logger.info(
            "*** Total run time: %s", str(_dt.timedelta(seconds=tot))
        )

    def stat(self):
        """Log the detection summary."""
        d = self._get_stat()
        self.logger.info(
            "ORIGIN PCA pfa %.2f Back Purity: %.2f Threshold: %.2f "
            "Bright Purity %.2f Threshold %.2f",
            d["pca"], d["back_purity"], d["back_threshold"],
            d["bright_purity"], d["bright_threshold"],
        )
        self.logger.info("Nb of detected lines: %d", d["tot_nlines"])
        self.logger.info(
            "Nb of sources Total: %d Background: %d Cont: %d",
            d["tot_nsources"], d["back_nsources"], d["cont_nsources"],
        )
        self.logger.info(
            "Nb of sources detected in faint (after PCA): %d "
            "in std (before PCA): %d",
            d["faint_nsources"], d["bright_nsources"],
        )

    def _get_stat(self):
        p = self.param
        cat = self.Cat3_sources
        seg = np.asarray(cat["seg_label"])
        comp = np.asarray(cat["comp"])
        return dict(
            pca=p["compute_PCA_threshold"]["params"]["pfa_test"],
            back_purity=p["purity"],
            back_threshold=p["threshold"],
            bright_purity=p["purity_std"],
            bright_threshold=p["threshold_std"],
            tot_nlines=len(self.Cat3_lines),
            tot_nsources=len(cat),
            back_nsources=int(np.sum(seg == 0)),
            cont_nsources=int(np.sum(seg > 0)),
            faint_nsources=int(np.sum(comp == 0)),
            bright_nsources=int(np.sum(comp == 1)),
        )
