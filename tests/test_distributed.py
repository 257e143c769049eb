"""Multi-host (DCN) mosaic path: 2-process x 4-device CPU dryrun.

Validates the jax.distributed ingest/compute design of
tools/mosaic_distributed.py end-to-end: two coordinated processes, each
ingesting its own FITS fields into its dp row of a global (2 x 4) mesh,
one multi-controller SPMD detection step, counts identical to a
single-process run of the same fields.
"""

import json
import os
import subprocess
import sys


def test_mosaic_distributed_dryrun(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    tool = os.path.join(repo, "tools", "mosaic_distributed.py")
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(("JAX_", "XLA_"))}
    out = subprocess.run(
        [sys.executable, tool, "--dryrun", "--workdir", str(tmp_path)],
        env=env, capture_output=True, text=True, timeout=850,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    report = json.loads(out.stdout[out.stdout.index("{"):])
    assert report["counts_match_single_process"] is True
    assert len(report["per_host"]) == 2
    # the overlap ratio is recorded for the report; asserting on wall-clock
    # ratios would make the test environment-timing dependent
    for host in report["per_host"]:
        assert host["ingest_s"] >= 0 and host["compute_s"] > 0
