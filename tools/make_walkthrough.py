"""Generate docs/walkthrough.md: an EXECUTED notebook-scale walkthrough.

The reference ships a 94-cell example notebook whose captured timings are
its de-facto performance record (reference docs/example.ipynb).  This tool
runs the same-geometry pipeline (3681 x 100 x 200 synthetic field, default
parameters, purity 0.8) on the current machine and writes a markdown
walkthrough whose timings, log excerpts and catalog tables are REAL
captured output, stamped with the hardware and date.

Usage: python tools/make_walkthrough.py [--out docs/walkthrough.md]
       (add --small for a quick self-test at reduced geometry)
"""

import argparse
import io
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def capture(fn):
    """(wall s, cpu s, captured stdout) of fn()."""
    import contextlib

    buf = io.StringIO()
    t0 = time.perf_counter()
    c0 = time.process_time()
    with contextlib.redirect_stdout(buf):
        out = fn()
    return (time.perf_counter() - t0, time.process_time() - c0,
            buf.getvalue(), out)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="docs/walkthrough.md")
    ap.add_argument("--small", action="store_true",
                    help="reduced geometry (CI self-test)")
    ap.add_argument("--workdir", default="/tmp/walkthrough")
    ap.add_argument("--warm", action="store_true",
                    help="run one full throwaway session first, so the "
                    "captured pass measures the survey steady state "
                    "(compiled programs + instrument constants resident) "
                    "instead of one-time compilation")
    ap.add_argument("--reuse-field", action="store_true",
                    help="reuse an existing field FITS in --workdir")
    args = ap.parse_args()

    os.environ.setdefault("ORIGIN_TPU_HBM_BYTES", "16e9")

    from bench_e2e import REF_TIMES, make_field  # noqa: E402 (tools dir)

    import jax

    from origin_tpu import ORIGIN

    nz, ny, nx = (500, 50, 60) if args.small else (3681, 100, 200)
    os.makedirs(args.workdir, exist_ok=True)
    cube_fn = os.path.join(args.workdir, "field.fits")
    t0 = time.perf_counter()
    lines = []
    if args.reuse_field and os.path.isfile(cube_fn):
        lines = [None] * 48  # the seed-7 field's line count (display only)
    else:
        cube, lines = make_field(nz, ny, nx, seed=7)
        cube.write(cube_fn)
    gen_s = time.perf_counter() - t0

    if args.warm:
        warm = ORIGIN.init(cube_fn, name="warmup", path=args.workdir,
                           loglevel="ERROR")
        warm.step01_preprocessing()
        warm.step02_areas()
        warm.step03_compute_PCA_threshold()
        warm.step04_compute_greedy_PCA()
        warm.step05_compute_TGLR(ncpu=1)
        warm.step06_compute_purity_threshold(purity=0.8)
        warm.step07_detection()
        warm.step08_compute_spectra()
        warm.step09_clean_results()
        warm.step10_create_masks()
        warm.step11_save_sources(version="warmup")
        warm.write()
        warm.close_logfile()
        if "engine" in warm.__dict__:
            warm.engine.release()
        import gc

        gc.collect()
        # drain the warmup's ~2 GB of dirty pages before the captured
        # pass: writeback throttling on a slow disk would otherwise
        # charge their flush to the captured writers (untimed wait)
        os.sync()

    dev = jax.devices()[0]
    hardware = f"{dev.platform} ({dev.device_kind})"

    orig = ORIGIN.init(cube_fn, name="walkthrough", path=args.workdir,
                       loglevel="INFO")

    steps = [
        ("step01_preprocessing", dict(), "DCT continuum + standardization "
         "+ std local extrema, fused into one device program"),
        ("step02_areas", dict(), "spatial area decomposition of the "
         "active-pixel map"),
        ("step03_compute_PCA_threshold", dict(), "per-area O2 statistics "
         "and Gaussian-fit thresholds"),
        ("step04_compute_greedy_PCA", dict(), "iterative nuisance removal "
         "(device while-loop, areas batched over padded slots)"),
        ("step05_compute_TGLR", dict(ncpu=1), "GLR matched filter: "
         "wavelength-dependent FSF convolution + profile-dictionary sweep "
         "with running max/argmax/min"),
        ("step06_compute_purity_threshold", dict(purity=0.8),
         "self-calibrated purity thresholds (one fused count-scan program)"),
        ("step07_detection", dict(), "thresholding + spatio-spectral "
         "merging into the line catalog"),
        ("step08_compute_spectra", dict(), "per-line flux/position "
         "refinement and spectra (batched device minicube gathers)"),
        ("step09_clean_results", dict(), "line merging + unique-source "
         "aggregation"),
        ("step10_create_masks", dict(), "source/sky masks (batched device "
         "max-image programs)"),
        ("step11_save_sources", dict(version="walkthrough"),
         "per-source FITS files incl. the session checkpoint"),
    ]

    rows = []
    sections = []
    for method, kw, desc in steps:
        wall, cpu, out, _ = capture(lambda m=method, k=kw:
                                    getattr(orig, m)(**k))
        key = "step" + method[4:6]
        rows.append((key, method, wall, cpu, REF_TIMES.get(key)))
        # keep the informative log lines (thresholds, counts), drop bars
        kept = [ln for ln in out.splitlines()
                if ln.strip() and "it/s" not in ln and "%|" not in ln]
        sections.append((method, desc, kw, wall, kept[-6:]))

    wall, cpu, _, _ = capture(orig.write)
    rows.append(("write", "write", wall, cpu, None))

    stat = orig._get_stat()
    ncat3 = len(orig.Cat3_lines)
    nsrc = len(orig.Cat3_sources)
    cat_head = "\n".join(str(orig.Cat3_sources).splitlines()[:12])
    orig.close_logfile()
    if "engine" in orig.__dict__:
        orig.engine.release()

    total = sum(r[2] for r in rows)
    total_cpu = sum(r[3] for r in rows)
    ref_total = sum(v for v in REF_TIMES.values())

    md = io.StringIO()
    w = md.write
    w("# Executed walkthrough (notebook-scale field)\n\n")
    w("*Generated by `tools/make_walkthrough.py` — every timing and log "
      "excerpt below is captured output from a real run; regenerate on "
      "your hardware with* `python tools/make_walkthrough.py`.\n\n")
    w(f"- date: {time.strftime('%Y-%m-%d %H:%M')}\n")
    w(f"- hardware: {hardware}\n")
    w(f"- field: {nz} x {ny} x {nx} synthetic MUSE-like cube "
      f"({len(lines)} injected lines)\n")
    if args.warm:
        w("- capture conditions: WARM pass — a first identical session "
          "in the same process amortized one-time XLA compilation and "
          "first-touch uploads, so this is the survey steady state "
          "(what every field after the first costs); cold-start numbers "
          "live in docs/benchmarks.md\n")
    w("- reference record at this geometry: 61.97 s of step time "
      "(reference docs/example.ipynb cell 79, 2019 desktop CPU)\n\n")

    w("## Per-step timings\n\n")
    w("| step | wall (s) | host CPU (s) | reference (s) | speedup |\n")
    w("|---|---|---|---|---|\n")
    for key, method, wl, cp, ref in rows:
        sp = f"{ref / wl:.1f}x" if ref else "—"
        w(f"| {method} | {wl:.2f} | {cp:.2f} | "
          f"{ref if ref is not None else '—'} | {sp} |\n")
    w(f"| **total** | **{total:.2f}** | **{total_cpu:.2f}** | "
      f"**{ref_total:.2f}** | **{ref_total / total:.1f}x** |\n\n")
    w("Wall times on a tunneled dev chip include host-link latency; the "
      "host-CPU column is the link-independent cost.  docs/benchmarks.md "
      "holds the cross-round records.\n\n")

    w("## Step-by-step\n\n")
    for method, desc, kw, wl, tail in sections:
        kws = ", ".join(f"{k}={v!r}" for k, v in kw.items())
        w(f"### `orig.{method}({kws})` — {wl:.2f} s\n\n{desc}.\n\n")
        if tail:
            w("```\n" + "\n".join(tail) + "\n```\n\n")

    w("## Results\n\n")
    w(f"Detections: {stat}\n\n")
    w(f"Final catalog: {ncat3} lines across {nsrc} sources.\n\n")
    w("```\n" + cat_head + "\n```\n")

    out_path = args.out
    with open(out_path, "w") as f:
        f.write(md.getvalue())
    print(f"wrote {out_path}: total {total:.2f} s "
          f"({ref_total / total:.1f}x the reference record)")


if __name__ == "__main__":
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__))))
    main()
