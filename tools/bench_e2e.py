"""End-to-end pipeline benchmark at the reference notebook's configuration.

The reference example (docs/example.ipynb of musevlt/origin, 2019 desktop
CPU) runs a 100x200 spaxel x 3681 channel MUSE UDF-10 sub-cube through all
11 steps in 61.4 s total (see /root/repo/BASELINE.md).  This tool generates
a synthetic field with the same geometry (noise + continuum galaxies +
faint/bright emission lines under a wavelength-dependent Moffat FSF), runs
the full origin_tpu session, and prints a per-step timing table against the
reference numbers.

Usage: python tools/bench_e2e.py [--ny 100] [--nx 200] [--nz 3681]
                                 [--out /tmp/e2e_session]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF_TIMES = {  # docs/example.ipynb cells 14-79 (see BASELINE.md)
    "step01": 9.62, "step02": 0.20, "step03": 0.13, "step04": 2.63,
    "step05": 11.57, "step06": 0.50, "step07": 0.78, "step08": 2.64,
    "step09": 0.98, "step10": 1.24, "step11": 31.68,
}


def _thread_cpu():
    """Per-thread CPU seconds of this process: {label: seconds}.

    Python-named threads (writer/copy/rebuild pools) are labelled by
    their thread name; everything else (XLA/runtime threads) by the OS
    comm.  Used to attribute a step's process_time to lanes."""
    import threading

    names = {t.native_id: t.name for t in threading.enumerate()
             if t.native_id is not None}
    tick = os.sysconf("SC_CLK_TCK")
    out = {}
    try:
        for tid in os.listdir("/proc/self/task"):
            try:
                with open(f"/proc/self/task/{tid}/stat", "rb") as fh:
                    st = fh.read().decode("ascii", "replace")
                comm = st[st.index("(") + 1:st.rindex(")")]
                rest = st[st.rindex(")") + 2:].split()
                cpu = (int(rest[11]) + int(rest[12])) / tick
            except OSError:
                continue
            label = names.get(int(tid), comm)
            # pool threads share a prefix: aggregate them
            label = label.rsplit("_", 1)[0] if label[-1:].isdigit() else label
            out[label] = out.get(label, 0.0) + cpu
    except OSError:
        pass
    return out


def make_field(nz=3681, ny=100, nx=200, seed=7, noise=1.0,
               n_cont=12, n_faint=40, n_bright=8):
    """Synthetic MUSE-like field with randomly placed sources."""
    from origin_tpu.core import Cube, MoffatFSF, WCS, WaveCoord

    rng = np.random.default_rng(seed)
    wave = WaveCoord(crpix=1.0, crval=4750.0, cdelt=1.25, shape=nz)
    wcs = WCS(crpix=(ny / 2, nx / 2), crval=(-30.0, 53.0), shape=(ny, nx))
    fsf = MoffatFSF(fwhm_pol=[-0.2, 0.7], beta_pol=[2.8], pixstep=0.2)
    lbda = wave.coord()

    sigma_z = noise * (1.0 + 0.2 * np.sin(np.arange(nz) / 60.0))
    data = rng.normal(size=(nz, ny, nx)).astype(np.float32)
    data *= sigma_z[:, None, None].astype(np.float32)
    var = np.broadcast_to(
        (sigma_z ** 2)[:, None, None].astype(np.float32), (nz, ny, nx)
    ).copy()

    yy, xx = np.mgrid[:ny, :nx]
    zz = np.arange(nz)

    margin = 10
    def rand_pos(n):
        return np.stack([
            rng.integers(margin, nx - margin, n),
            rng.integers(margin, ny - margin, n),
        ], axis=1)

    # continuum galaxies
    for (x0, y0) in rand_pos(n_cont):
        amp = rng.uniform(3.0, 9.0)
        sig = rng.uniform(1.5, 3.0)
        spatial = np.exp(-0.5 * ((yy - y0) ** 2 + (xx - x0) ** 2) / sig ** 2)
        spectrum = amp * (1.0 + 0.3 * np.cos(2 * np.pi * zz / nz)
                          + 0.2 * zz / nz)
        data += (spectrum[:, None, None] * spatial[None]).astype(np.float32)

    # emission lines (FSF-convolved point sources)
    half = 7
    lines = []
    for kind, n, amps in (("faint", n_faint, (2.0, 3.2)),
                          ("bright", n_bright, (15.0, 30.0))):
        for (x0, y0) in rand_pos(n):
            z0 = int(rng.integers(60, nz - 60))
            amp = rng.uniform(*amps)
            lsig = rng.uniform(1.0, 4.0)
            line = amp * np.exp(-0.5 * ((zz - z0) / lsig) ** 2)
            zs = slice(max(0, z0 - 40), min(nz, z0 + 41))
            spot = fsf.get_3darray(lbda[zs], (2 * half + 1, 2 * half + 1))
            spot = spot / spot.max(axis=(1, 2), keepdims=True)
            data[zs, y0 - half : y0 + half + 1, x0 - half : x0 + half + 1] += (
                line[zs, None, None] * spot
            ).astype(np.float32)
            lines.append((int(x0), int(y0), z0, kind))

    data[:, 0, 0] = np.nan
    var[:, 0, 0] = np.nan

    cube = Cube(data=data, var=var, wcs=wcs, wave=wave)
    fsf.to_header(cube.primary_header)
    cube.primary_header["CUBE_V"] = "synthetic-e2e-1.0"
    return cube, lines


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nz", type=int, default=3681)
    ap.add_argument("--ny", type=int, default=100)
    ap.add_argument("--nx", type=int, default=200)
    ap.add_argument("--out", default="/tmp/e2e_session")
    ap.add_argument("--loglevel", default="WARNING")
    ap.add_argument("--json", action="store_true",
                    help="also print a JSON summary line")
    ap.add_argument("--repeat", type=int, default=1,
                    help="number of fields to process in this process; "
                    "compilation caches are warm from the 2nd run on, so "
                    "the last run measures steady-state throughput")
    ap.add_argument("--reuse-field", action="store_true",
                    help="reuse an existing synthetic field FITS in --out "
                    "instead of regenerating it (same seed => same field)")
    ap.add_argument("--hbm-bytes", default="16e9",
                    help="device-memory budget for the tight-mode decision "
                    "when the backend reports no memory_stats limit "
                    "(default 16e9 = one v5-lite chip; '' keeps the "
                    "engine's assume-tight fallback)")
    args = ap.parse_args()

    if args.hbm_bytes:
        # backends without memory_stats (e.g. the axon tunnel) otherwise
        # assume tight mode, whose eager offloads dominate wall time and
        # make the per-step numbers incomparable across rounds
        os.environ.setdefault("ORIGIN_TPU_HBM_BYTES", args.hbm_bytes)

    from origin_tpu import ORIGIN

    for run in range(args.repeat):
        t0 = time.perf_counter()
        os.makedirs(args.out, exist_ok=True)
        cube_fn = os.path.join(args.out, f"field{run}.fits")
        if args.reuse_field and os.path.isfile(cube_fn):
            print(f"[run {run}] reusing {cube_fn}")
        else:
            cube, lines = make_field(args.nz, args.ny, args.nx, seed=7 + run)
            cube.write(cube_fn)
            print(f"[run {run}] synthetic field "
                  f"{args.nz}x{args.ny}x{args.nx} ({len(lines)} lines) "
                  f"built in {time.perf_counter()-t0:.1f}s")
        # drain the previous run's dirty pages (≈2 GB of session +
        # source files): on a ~27 MB/s disk the kernel's writeback
        # throttling would otherwise charge their flush to this run's
        # writers — the sync wait is untimed
        os.sync()
        _run_pipeline(args, cube_fn, run)


def _run_pipeline(args, cube_fn, run):
    from origin_tpu import ORIGIN
    from origin_tpu.pipeline.engine import lane_stats_reset

    lane_stats_reset()
    orig = ORIGIN.init(cube_fn, name=f"bench{run}", path=args.out,
                       loglevel=args.loglevel)

    steps = [
        ("step01", lambda: orig.step01_preprocessing()),
        ("step02", lambda: orig.step02_areas()),
        ("step03", lambda: orig.step03_compute_PCA_threshold()),
        ("step04", lambda: orig.step04_compute_greedy_PCA()),
        ("step05", lambda: orig.step05_compute_TGLR(ncpu=1)),
        ("step06", lambda: orig.step06_compute_purity_threshold(purity=0.8)),
        ("step07", lambda: orig.step07_detection()),
        ("step08", lambda: orig.step08_compute_spectra()),
        ("step09", lambda: orig.step09_clean_results()),
        ("step10", lambda: orig.step10_create_masks()),
        # step11 owns the session checkpoint (like the reference notebook,
        # whose 61.4 s total includes step11's internal write); the
        # device->host materializations stream behind its source building.
        ("step11", lambda: orig.step11_save_sources(version="0.1",
                                                    n_jobs=1)),
        # a second write after step11 shows the steady-state checkpoint
        # cost (everything already parked)
        ("write", lambda: orig.write()),
    ]

    def _tunnel_cpu(th):
        """CPU seconds of the device-tunnel client's own threads (axon
        stream codec, gRPC): byte-proportional rig overhead that a
        TPU-VM's PCIe does not pay — split out so the pipeline's OWN
        host cost is comparable across rigs and rounds."""
        return sum(v for k, v in th.items()
                   if k.startswith(("axon", "grpc", "Tsl")))

    times = {}
    cpu_times = {}
    cpu_own_times = {}
    total = 0.0
    cpu_total = 0.0
    print(f"{'step':8s} {'ours (s)':>10s} {'cpu (s)':>9s} {'own (s)':>9s} "
          f"{'ref (s)':>9s} {'speedup':>9s}")
    for name, fn in steps:
        # process_time sums every thread's CPU seconds: it is the
        # link-weather-INDEPENDENT cost of the step on this 1-core host
        # (wall - cpu ~= time spent waiting on the tunnel)
        t0 = time.perf_counter()
        c0 = time.process_time()
        tc0 = _tunnel_cpu(_thread_cpu())
        th0 = _thread_cpu() if name == "step11" else None
        if name == "step11" and os.environ.get("BENCH_E2E_PROFILE"):
            import cProfile
            import pstats

            prof = cProfile.Profile()
            prof.enable()
            fn()
            prof.disable()
            pstats.Stats(prof).sort_stats("cumulative").print_stats(30)
        else:
            fn()
        dt = time.perf_counter() - t0
        dc = time.process_time() - c0
        if th0 is not None:
            th1 = _thread_cpu()
            lanes = sorted(
                ((k, th1.get(k, 0.0) - th0.get(k, 0.0))
                 for k in set(th0) | set(th1)),
                key=lambda kv: -kv[1])
            print("step11 thread CPU: "
                  + ", ".join(f"{k}={v:.1f}s" for k, v in lanes
                              if v >= 0.5))
            from origin_tpu.pipeline.engine import LANE_STATS

            for label, (n, cpu, wall, nb) in sorted(
                    LANE_STATS.items(), key=lambda kv: -kv[1][1]):
                print(f"  lane {label:18s} n={n:4d} cpu={cpu:6.2f}s "
                      f"wall={wall:6.2f}s bytes={nb/1e6:8.1f}MB")
        tunnel = max(0.0, _tunnel_cpu(_thread_cpu()) - tc0)
        times[name] = dt
        cpu_times[name] = dc
        cpu_own_times[name] = own = max(0.0, dc - tunnel)
        total += dt
        cpu_total += dc
        ref = REF_TIMES.get(name)
        sp = f"{ref/dt:8.1f}x" if ref else "      —"
        print(f"{name:8s} {dt:10.2f} {dc:9.2f} {own:9.2f} {ref or 0:9.2f} "
              f"{sp}")
    ref_total = sum(REF_TIMES.values())
    print(f"{'TOTAL':8s} {total:10.2f} {cpu_total:9.2f} "
          f"{sum(cpu_own_times.values()):9.2f} {ref_total:9.2f} "
          f"{ref_total/total:8.1f}x")

    ns = orig._get_stat()
    print(f"detections: {ns}")

    # free this field's device allocations NOW: the session<->engine
    # reference cycle otherwise keeps them alive until a GC pass, and the
    # next field's programs can OOM a small-HBM chip meanwhile
    orig.close_logfile()  # detach this field's rotating-file handler
    if "engine" in orig.__dict__:
        orig.engine.release()
    import gc

    gc.collect()

    if args.json:
        print(json.dumps({
            "metric": "e2e_pipeline_time",
            "value": round(total, 2),
            "unit": "s",
            "vs_baseline": round(ref_total / total, 2),
            "steps": {k: round(v, 2) for k, v in times.items()},
            "steps_cpu": {k: round(v, 2) for k, v in cpu_times.items()},
            "steps_cpu_own": {k: round(v, 2)
                              for k, v in cpu_own_times.items()},
            "cpu_total": round(cpu_total, 2),
            "cpu_own_total": round(sum(cpu_own_times.values()), 2),
        }))


if __name__ == "__main__":
    main()
