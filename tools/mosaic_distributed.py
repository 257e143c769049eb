"""Multi-host mosaic detection over DCN via jax.distributed (config 5 at scale).

The single-process batcher (tools/mosaic_batch.py) overlaps FITS ingest with
the sharded detection step on one host.  This tool scales the same (dp x sp)
design across HOSTS: every process

1. calls ``jax.distributed.initialize`` (coordinator over DCN),
2. ingests ITS OWN fields from FITS — ingest bandwidth scales with hosts,
3. assembles the global (B, Nz, Ny, Nx) batch with
   ``jax.make_array_from_process_local_data`` — each host's fields live on
   its dp row, so no cube data ever crosses DCN,
4. runs the jitted shard_map detection step as one multi-controller SPMD
   program (ppermute halos ride intra-host ICI; the only cross-host
   collective is the final psum of the (T,) purity count vectors),
5. reads back the counts of its addressable dp rows.

On real TPU pods, processes map to TPU VMs (one per host; JAX wires the
coordinator + ICI/DCN topology).  The 2-process x 4-device CPU dryrun that
validates this path end-to-end:

    python tools/mosaic_distributed.py --dryrun

which spawns 2 coordinated CPU processes with 4 virtual devices each and
checks their count tables against a single-process run of the same fields.
"""

import argparse
import json
import os
import subprocess
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

NZ, NY, NX = 120, 32, 24  # dryrun field geometry (tiny, CPU-friendly)
THRESHOLDS = np.linspace(1.0, 8.0, 20)


def _make_fields(workdir, nfields, nz, ny, nx):
    sys.path.insert(0, os.path.join(REPO, "tests"))
    from make_minicube import make_minicube

    paths = []
    for i in range(nfields):
        fn = os.path.join(workdir, f"field_{i:02d}.fits")
        if not os.path.exists(fn):
            make_minicube(fn, nz=nz, ny=ny, nx=nx, seed=100 + i)
        paths.append(fn)
    return paths


def _load_fields(paths):
    from origin_tpu.core import Cube

    cubes, variances, masks = [], [], []
    for p in paths:
        c = Cube(p)
        cubes.append(c.filled(0).astype(np.float32))
        v = c.var_filled(np.inf)
        variances.append(
            v.astype(np.float32) if v is not None
            else np.ones_like(cubes[-1])
        )
        masks.append(c.masked_invalid())
    return np.stack(cubes), np.stack(variances), np.stack(masks)


def _psf_profiles(nz):
    from origin_tpu.core import MoffatFSF
    from origin_tpu.core.profiles import gaussian_profile

    fsf = MoffatFSF(fwhm_pol=[-0.2, 0.7], beta_pol=[2.8], pixstep=0.2)
    psf = fsf.get_3darray(
        np.linspace(4750, 9300, nz), (9, 9)
    ).astype(np.float32)
    profiles = [gaussian_profile(f, 41, 20) for f in (2.0, 6.7)]
    return psf, profiles


def run_worker(args):
    """One coordinated process (= one host of the pod)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=args.coordinator,
        num_processes=args.nprocs,
        process_id=args.pid,
    )
    from jax.sharding import NamedSharding, PartitionSpec as P

    from origin_tpu.parallel import ShardedPipeline
    from origin_tpu.parallel.mesh import Mesh

    ndev_local = len(jax.local_devices())
    ndev = len(jax.devices())
    assert ndev == args.nprocs * ndev_local
    # dp rows = processes (each host feeds its own row over its local PCIe;
    # sp = the host's local devices, so halos stay on intra-host links)
    devices = np.asarray(jax.devices()).reshape(args.nprocs, ndev_local)
    mesh = Mesh(devices, axis_names=("dp", "sp"))

    workdir = args.workdir
    all_fields = sorted(json.loads(args.fields))
    # every process must run the SAME number of global steps (each step is
    # a collective): pad uneven splits by wrapping around the field list —
    # duplicated fields recompute identical results, which overwrite
    per = -(-len(all_fields) // args.nprocs)
    my_fields = [
        os.path.join(
            workdir, all_fields[(args.pid + k * args.nprocs) % len(all_fields)]
        )
        for k in range(per)
    ]

    psf, profiles = _psf_profiles(args.nz)
    pipe = ShardedPipeline(mesh, args.nz, args.ny, args.nx, psf, profiles,
                           thresholds=THRESHOLDS)
    sharding = NamedSharding(mesh, P("dp", None, "sp", None))

    # per-host ingest, overlapped with the previous batch's device step
    t_ingest = 0.0
    t_compute = 0.0
    results = {}

    def load(path):
        t0 = time.perf_counter()
        out = _load_fields([path])
        return out, time.perf_counter() - t0

    with ThreadPoolExecutor(max_workers=1) as ingest:
        nxt = ingest.submit(load, my_fields[0])
        for bi, path in enumerate(my_fields):
            (cubes, variances, masks), dt_i = nxt.result()
            t_ingest += dt_i
            if bi + 1 < len(my_fields):
                nxt = ingest.submit(load, my_fields[bi + 1])
            t0 = time.perf_counter()
            # assemble the global batch: this host contributes its dp row
            gc = jax.make_array_from_process_local_data(sharding, cubes)
            gv = jax.make_array_from_process_local_data(sharding, variances)
            gm = jax.make_array_from_process_local_data(sharding, masks)
            lmax, lmin, cmax, cmin = pipe(gc, gv, gm)
            # counts are P("dp")-sharded: read back this host's row
            local = [
                (s.index[0].start, np.asarray(s.data))
                for s in cmax.addressable_shards
            ]
            t_compute += time.perf_counter() - t0
            for row, counts in local:
                results[os.path.basename(my_fields[bi])] = counts[0].tolist()
    out = dict(
        pid=args.pid,
        nprocs=args.nprocs,
        local_devices=ndev_local,
        fields={k: v[:4] for k, v in results.items()},
        ingest_s=round(t_ingest, 3),
        compute_s=round(t_compute, 3),
        ingest_overlap=round(min(t_ingest, t_compute)
                             / max(t_ingest, 1e-9), 3),
    )
    print("WORKER_RESULT " + json.dumps(out), flush=True)


def run_dryrun(args):
    """Spawn the 2-process x 4-device CPU validation (no TPU needed)."""
    workdir = args.workdir
    os.makedirs(workdir, exist_ok=True)
    nfields = 4
    paths = _make_fields(workdir, nfields, args.nz, args.ny, args.nx)
    names = json.dumps([os.path.basename(p) for p in paths])

    # an OS-assigned free port so concurrent dryruns on one host do not
    # collide on the coordinator (bind, read the port, release)
    import socket

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    procs = []
    env_base = {
        k: v for k, v in os.environ.items()
        if not k.startswith(("JAX_", "XLA_"))
    }
    for pid in range(2):
        env = dict(
            env_base,
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=4",
        )
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__),
             "--coordinator", f"localhost:{port}",
             "--nprocs", "2", "--pid", str(pid),
             "--workdir", workdir, "--fields", names,
             "--nz", str(args.nz), "--ny", str(args.ny), "--nx", str(args.nx)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        ))
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for p, o in zip(procs, outs):
        if p.returncode != 0:
            print(o)
            raise RuntimeError(f"worker {p.args} failed")

    workers = []
    for o in outs:
        for line in o.splitlines():
            if line.startswith("WORKER_RESULT "):
                workers.append(json.loads(line[len("WORKER_RESULT "):]))
    assert len(workers) == 2, outs

    # cross-check: single-process run of the same fields
    import jax

    jax.config.update("jax_platforms", "cpu")
    from origin_tpu.parallel import ShardedPipeline, make_mesh

    psf, profiles = _psf_profiles(args.nz)
    mesh = make_mesh(min(4, len(jax.devices())), dp=1)
    pipe = ShardedPipeline(mesh, args.nz, args.ny, args.nx, psf, profiles,
                           thresholds=THRESHOLDS)
    expected = {}
    for p in paths:
        c, v, m = _load_fields([p])
        _, _, cmax, _ = pipe(c, v, m)
        expected[os.path.basename(p)] = np.asarray(cmax)[0][:4].tolist()

    ok = True
    for w in workers:
        for name, counts in w["fields"].items():
            # per-tile DFT grids differ between the worker mesh and the
            # single-process check, so voxels within float32 round-off of a
            # scanned threshold may flip: allow the documented <=2 slack
            diff = np.abs(np.asarray(counts) - np.asarray(expected[name]))
            if diff.max() > 2:
                print(f"MISMATCH {name}: {counts} != {expected[name]}")
                ok = False
    report = dict(
        dryrun="2 processes x 4 devices (jax.distributed, CPU)",
        fields=nfields,
        geometry=[args.nz, args.ny, args.nx],
        counts_match_single_process=ok,
        per_host=[{k: w[k] for k in
                   ("pid", "ingest_s", "compute_s", "ingest_overlap")}
                  for w in workers],
    )
    print(json.dumps(report, indent=1))
    if not ok:
        raise SystemExit(1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dryrun", action="store_true")
    ap.add_argument("--coordinator", default=None)
    ap.add_argument("--nprocs", type=int, default=2)
    ap.add_argument("--pid", type=int, default=0)
    ap.add_argument("--workdir", default="/tmp/mosaic_distributed")
    ap.add_argument("--fields", default="[]",
                    help="JSON list of field FITS basenames (worker mode)")
    ap.add_argument("--nz", type=int, default=NZ)
    ap.add_argument("--ny", type=int, default=NY)
    ap.add_argument("--nx", type=int, default=NX)
    args = ap.parse_args()

    if args.coordinator:
        run_worker(args)
    else:
        run_dryrun(args)


if __name__ == "__main__":
    main()
