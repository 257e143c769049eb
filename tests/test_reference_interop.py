"""Interop against the GENUINE reference package, not a stand-in.

tests/test_compat.py proves the dialect round-trips through origin_tpu's
own compat layer and a hand-built imitation of the reference's YAML node
shapes.  These tests close the remaining gap: they import the REAL
``muse_origin`` from /root/reference (its uninstallable dependencies —
mpdaf, astropy, photutils — resolved by the facade packages in
tests/ref_stubs/, which map onto origin_tpu's own substrate) and execute

- its actual ``ORIGIN.load`` (reference origin.py:345-455, including the
  real ``yaml.unsafe_load`` at origin.py:25-31 and the real per-step
  ``Step.load`` at steps.py:339-353) on a ``write(compat='reference')``
  export, and
- its actual ``ORIGIN.write`` / ``dump_yaml`` (origin.py:651-727), whose
  python-tagged output origin_tpu must then load back.

Run in a subprocess so the facade modules never leak into this test
process's ``sys.modules``.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from make_minicube import make_minicube, make_segmap

from origin_tpu import ORIGIN
from origin_tpu.pipeline import compat
from origin_tpu.pipeline.steps import Status

STUBS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "ref_stubs")
REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "muse_origin")),
    reason="reference package not mounted",
)


@pytest.fixture(scope="module")
def exported(tmp_path_factory):
    """An origin_tpu session run through step09 and exported in the
    reference dialect, plus the values the reference must reproduce."""
    path = tmp_path_factory.mktemp("refinterop")
    cube_fn = str(path / "minicube.fits")
    make_minicube(cube_fn)
    make_segmap(str(path / "segmap.fits"))

    orig = ORIGIN.init(cube_fn, name="refexp", path=str(path),
                       loglevel="WARNING")
    orig.step01_preprocessing()
    orig.step02_areas()
    orig.step03_compute_PCA_threshold()
    orig.step04_compute_greedy_PCA()
    orig.step05_compute_TGLR()
    orig.step06_compute_purity_threshold(purity=0.8)
    orig.step07_detection()
    orig.step08_compute_spectra()
    orig.step09_clean_results()

    expect = {
        "threshold": float(orig.param["threshold"]),
        "threshold_std": float(orig.param["threshold_std"]),
        "nbareas": int(orig.nbAreas),
        "cube_std_sum": float(np.nansum(
            np.asarray(orig.cube_std.data, dtype=np.float64))),
        "cube_std_shape": list(orig.cube_std.shape),
        "cat1_len": len(orig.Cat1),
        "n_profiles": len(orig.profiles),
        "cat2_len": len(orig.Cat2),
    }
    exp_dir = path / "export"
    os.makedirs(exp_dir, exist_ok=True)
    folder = orig.write(path=str(exp_dir), compat="reference")
    orig.close_logfile()
    return folder, expect


@pytest.fixture(scope="module")
def ref_loaded(exported):
    """The real package's load+write executed on the export (once)."""
    folder, expect = exported
    env = dict(os.environ)
    # keep the subprocess OFF the tunneled TPU (the axon sitecustomize
    # on PYTHONPATH force-registers the platform before env vars bite)
    env["PYTHONPATH"] = ":".join(
        p for p in env.get("PYTHONPATH", "").split(":")
        if p and "axon_site" not in p)
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [sys.executable, os.path.join(STUBS, "run_reference_load.py"),
         folder],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert proc.returncode == 0, (
        f"reference load failed\nstdout:\n{proc.stdout[-4000:]}\n"
        f"stderr:\n{proc.stderr[-4000:]}"
    )
    line = [ln for ln in proc.stdout.splitlines()
            if ln.startswith("REFLOAD ")][-1]
    return folder, expect, json.loads(line[len("REFLOAD "):])


def test_reference_load_accepts_export(ref_loaded):
    """The genuine ORIGIN.load accepts the exported session: params,
    Status enums, per-step product files, profiles and O2 arrays."""
    folder, expect, got = ref_loaded
    assert got["status_is_real_enum"]
    # every step we exported as DUMPED is DUMPED through the real enum
    # reconstruction; save_sources was never run
    assert got["statuses"]["preprocessing"] == "DUMPED"
    assert got["statuses"]["compute_TGLR"] == "DUMPED"
    assert got["statuses"]["clean_results"] == "DUMPED"
    assert got["statuses"]["save_sources"] == "NOTRUN"
    assert got["threshold"] == pytest.approx(expect["threshold"], rel=1e-6)
    assert got["threshold_std"] == pytest.approx(expect["threshold_std"],
                                                 rel=1e-6)
    assert got["nbareas"] == expect["nbareas"]
    assert got["testO2_nareas"] == expect["nbareas"]
    assert got["n_profiles"] == expect["n_profiles"]
    assert len(got["fwhm_profiles"]) == expect["n_profiles"]


def test_reference_reads_products(ref_loaded):
    """The real DataObj descriptors load our product files with matching
    content (cube_std values; Cat1 rows through the real _format_cat)."""
    folder, expect, got = ref_loaded
    assert got["cube_std_shape"] == expect["cube_std_shape"]
    # the export decodes to dense float32: equality at float32 resolution
    assert got["cube_std_sum"] == pytest.approx(
        expect["cube_std_sum"], rel=1e-5)
    assert got["cat1_len"] == expect["cat1_len"]
    for col in ("ra", "dec", "lbda", "T_GLR", "purity"):
        assert col in got["cat1_cols"]


def test_origin_tpu_loads_real_dump_yaml(ref_loaded):
    """The real package re-wrote the session (its genuine dump_yaml with
    live Status enums, origin.py:705-707); origin_tpu loads it back."""
    folder, expect, got = ref_loaded
    assert got["rewrote"]
    name = os.path.basename(folder)
    text = open(os.path.join(folder, name + ".yaml")).read()
    # it IS the python-tagged dialect (real dumper, real enum objects)
    assert "muse_origin.steps.Status" in text
    assert compat.looks_like_reference_yaml(text)

    orig2 = ORIGIN.load(folder)
    try:
        assert orig2.steps["compute_spectra"].status is Status.DUMPED
        assert float(orig2.param["threshold"]) == pytest.approx(
            expect["threshold"], rel=1e-6)
        assert len(orig2.Cat1) == expect["cat1_len"]
        assert len(orig2.Cat2) == expect["cat2_len"]
    finally:
        orig2.close_logfile()
