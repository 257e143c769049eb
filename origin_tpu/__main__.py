"""Command-line interface: ``python -m origin_tpu <command>``.

The reference pipeline has no CLI (driven interactively from Python /
notebooks); this adds a thin batch front door over the same session API so
survey pipelines can run fields without writing a driver script.

Commands
--------
run      run the full 11-step pipeline on a cube
resume   resume a saved session, running any remaining steps
status   print a saved session's step status / timings / stats
info     print a saved session's log
"""

from __future__ import annotations

import argparse
import logging
import os
import sys


def _add_session_args(p):
    p.add_argument("--name", default="origin", help="session name")
    p.add_argument("--path", default=".", help="session parent directory")
    p.add_argument("--loglevel", default="INFO")


def _add_run_args(p):
    p.add_argument("--profiles", default=None,
                   help="spectral profile dictionary FITS (default: built-in "
                   "3-FWHM dictionary)")
    p.add_argument("--fieldmap", default=None, help="mosaic field map FITS")
    p.add_argument("--psf", default=None, help="explicit PSF cube FITS")
    p.add_argument("--purity", type=float, default=0.9)
    p.add_argument("--purity-std", type=float, default=None)
    p.add_argument("--pfa-areas", type=float, default=0.2)
    p.add_argument("--minsize", type=int, default=100)
    p.add_argument("--pfa-test", type=float, default=0.01)
    p.add_argument("--threshold", type=float, default=None,
                   help="override the purity-calibrated detection threshold")
    p.add_argument("--segmap", default=None,
                   help="user segmentation map FITS for step 07")
    p.add_argument("--grid-dxy", type=int, default=0)
    p.add_argument("--version", default="0.1", help="source file version tag")
    p.add_argument("--n-jobs", type=int, default=1,
                   help="host workers for source-file writing")
    p.add_argument("--no-sources", action="store_true",
                   help="stop after the catalogs (skip masks/source files)")
    p.add_argument("--overlap-ingest", action="store_true",
                   help="survey mode: initialize the NEXT field (FITS "
                        "read + background raw uploads) while the "
                        "current field's back end runs; needs HBM for "
                        "two fields' raw inputs")
    p.add_argument("--mesh", type=int, default=None, metavar="N",
                   help="shard the detection front-end over the first N "
                   "devices (a (1 x N) spatial mesh; Ny must divide by N)")
    p.add_argument("--precision", choices=("highest", "bf16x3"),
                   default=None,
                   help="matmul precision of the fused GLR kernels "
                   "(bf16x3: ~25%% faster step 05 at ~1e-5 relative "
                   "error; same as ORIGIN_TPU_PRECISION)")


def _steps_from(orig, args, start_at=1):
    """Run steps >= start_at with the CLI's parameters."""
    plan = [
        (1, lambda: orig.step01_preprocessing()),
        (2, lambda: orig.step02_areas(pfa=args.pfa_areas,
                                      minsize=args.minsize)),
        (3, lambda: orig.step03_compute_PCA_threshold(pfa_test=args.pfa_test)),
        (4, lambda: orig.step04_compute_greedy_PCA()),
        (5, lambda: orig.step05_compute_TGLR()),
        (6, lambda: orig.step06_compute_purity_threshold(
            purity=args.purity, purity_std=args.purity_std)),
        (7, lambda: orig.step07_detection(threshold=args.threshold,
                                          segmap=args.segmap)),
        (8, lambda: orig.step08_compute_spectra(grid_dxy=args.grid_dxy)),
        (9, lambda: orig.step09_clean_results()),
    ]
    if not args.no_sources:
        plan += [
            (10, lambda: orig.step10_create_masks()),
            (11, lambda: orig.step11_save_sources(version=args.version,
                                                  n_jobs=args.n_jobs)),
        ]
    for idx, fn in plan:
        if idx >= start_at:
            fn()
    orig.write()
    orig.stat()


def main(argv=None):
    parser = argparse.ArgumentParser(
        prog="python -m origin_tpu",
        description="TPU-native blind emission-line detection for MUSE "
        "datacubes (ORIGIN pipeline)",
    )
    sub = parser.add_subparsers(dest="command", required=True)

    p_run = sub.add_parser("run", help="run the full pipeline on a cube")
    p_run.add_argument("cube", nargs="+",
                       help="input cube FITS (DATA + STAT); several cubes "
                       "run back-to-back in one process (survey mode: "
                       "compiled programs and instrument-model uploads are "
                       "shared, so only the first field pays compilation)")
    _add_session_args(p_run)
    _add_run_args(p_run)

    p_res = sub.add_parser("resume", help="resume a saved session")
    p_res.add_argument("folder", help="saved session directory")
    p_res.add_argument("--newname", default=None, help="fork under a new name")
    p_res.add_argument("--loglevel", default="INFO")
    _add_run_args(p_res)

    p_st = sub.add_parser("status", help="session status / timings / stats")
    p_st.add_argument("folder")

    p_info = sub.add_parser("info", help="print the session log")
    p_info.add_argument("folder")

    args = parser.parse_args(argv)

    if getattr(args, "precision", None):
        os.environ["ORIGIN_TPU_PRECISION"] = args.precision

    from origin_tpu.pipeline.session import ORIGIN
    from origin_tpu.pipeline.steps import Status

    def _mesh(args):
        if getattr(args, "mesh", None) is None:
            return None
        from origin_tpu.parallel import make_mesh

        return make_mesh(args.mesh, dp=1)

    if args.command == "run":
        multi = len(args.cube) > 1
        failures = []

        def _init(cube_fn):
            name = args.name
            if multi:
                stem = os.path.splitext(os.path.basename(cube_fn))[0]
                name = f"{args.name}-{stem}"
            return ORIGIN.init(cube_fn, name=name, path=args.path,
                               loglevel=args.loglevel,
                               profiles=args.profiles,
                               fieldmap=args.fieldmap, PSF=args.psf,
                               mesh=_mesh(args))

        # --overlap-ingest pipelines the survey: field N+1's session is
        # initialized (its FITS read and raw device uploads start in the
        # background) while field N's detection back end still runs, so
        # on a slow host link the next field's ingest is free.  Two
        # fields' raw inputs are then device-resident at once — opt-in,
        # for rigs whose HBM holds them both.
        pending = []  # [(cube_fn, ORIGIN | None)]
        order = list(args.cube)

        # the sessions share one "origin_tpu" logger, so a pre-ingested
        # field's rotating-file handler would capture the CURRENT
        # field's step records (and rotate its own log away under them).
        # Detach the next field's handler once its init lines are
        # recorded; re-attach when its own steps start.
        def _detach_log(orig):
            if orig is not None and orig.file_handler is not None:
                if orig.file_handler in orig.logger.handlers:
                    orig.logger.removeHandler(orig.file_handler)

        def _attach_log(orig):
            h = orig.file_handler
            if h is not None and h not in orig.logger.handlers:
                orig.logger.addHandler(h)

        def _pop_session(idx):
            cube_fn = order[idx]
            if args.overlap_ingest and pending:
                fn, orig = pending.pop(0)
                assert fn == cube_fn
                if orig is not None:
                    _attach_log(orig)
                    return orig
                raise _pending_failure(cube_fn)
            return _init(cube_fn)

        def _pending_failure(cube_fn):
            return RuntimeError(f"initialization failed for {cube_fn}")

        for i, cube_fn in enumerate(order):
            # survey mode: one bad cube must not abort the remaining
            # fields, and its logfile handler must not leak
            orig = None
            try:
                orig = _pop_session(i)
                if args.overlap_ingest and i + 1 < len(order):
                    # keep the current field's handler off while the next
                    # field's init logs, and vice versa afterwards
                    _detach_log(orig)
                    try:
                        nxt = _init(order[i + 1])
                        _detach_log(nxt)
                        pending.append((order[i + 1], nxt))
                    except Exception:
                        logging.getLogger("origin_tpu").exception(
                            "survey: pre-ingest of %s failed", order[i + 1]
                        )
                        pending.append((order[i + 1], None))
                    finally:
                        _attach_log(orig)
                _steps_from(orig, args, start_at=1)
            except Exception:
                if not multi:
                    raise
                failures.append(cube_fn)
                logging.getLogger("origin_tpu").exception(
                    "survey: %s failed; continuing with the next cube",
                    cube_fn,
                )
            finally:
                if multi and orig is not None:
                    orig.close_logfile()
                if orig is not None and "engine" in orig.__dict__:
                    # free the finished field's device allocations NOW:
                    # the session<->engine cycle otherwise holds them
                    # until a GC pass, shrinking the next field's HBM
                    orig.engine.release()
                    del orig
                    import gc

                    gc.collect()
        if failures:
            print(f"survey: {len(failures)} cube(s) failed: "
                  + " ".join(failures), file=sys.stderr)
            return 1
    elif args.command == "resume":
        orig = ORIGIN.load(args.folder, newname=args.newname,
                           loglevel=args.loglevel, mesh=_mesh(args))
        done = [s.idx for s in orig.steps.values()
                if s.status in (Status.RUN, Status.DUMPED)]
        start = (max(done) + 1) if done else 1
        _steps_from(orig, args, start_at=start)
    elif args.command == "status":
        orig = ORIGIN.load(args.folder, loglevel="WARNING")
        orig.status()
        # timestat/stat report via logger.info: raise the console level
        # AFTER the (noisy) load so their records actually print
        orig.set_loglevel("INFO")
        orig.timestat()
        try:
            orig.stat()
        except Exception:
            pass
    elif args.command == "info":
        orig = ORIGIN.load(args.folder, loglevel="WARNING")
        orig.info()
    return 0


if __name__ == "__main__":
    sys.exit(main())
