"""Reference-session interoperability (`origin_tpu.pipeline.compat`).

A session directory written by the reference muse_origin package — dense
FITS products plus a python-tagged YAML parameter file (reference
origin.py:651-727, steps.py:301-337) — must load directly into
origin_tpu, so reference users keep their existing sessions when they
switch.  The product file names match by design; what needs translating
is the YAML dialect, exercised here both as a unit (handcrafted
reference-dialect text with every tag family the reference dumper
emits) and end-to-end (a written session whose params file is re-dumped
in the reference dialect, then loaded and resumed).
"""

import base64

import numpy as np
import pytest
import yaml

from make_minicube import make_minicube, make_segmap

from origin_tpu import ORIGIN
from origin_tpu.pipeline import compat
from origin_tpu.pipeline.steps import Status

# our member names -> the reference's member *values* (reference
# steps.py:111-117), which is what its YAML stores
REF_STATUS_VALUES = {
    "NOTRUN": "not run yet",
    "RUN": "run",
    "DUMPED": "dumped outputs",
    "FAILED": "failed",
}


def _np_scalar_yaml(value, code):
    """The exact node shape yaml's unrestricted dumper emits for a numpy
    scalar (object/apply:numpy.core.multiarray.scalar with a dtype node
    and a base64 payload)."""
    payload = base64.b64encode(np.dtype(code).type(value).tobytes()).decode()
    return (
        "!!python/object/apply:numpy.core.multiarray.scalar\n"
        "- !!python/object/apply:numpy.dtype\n"
        f"  args: [{code}, 0, 1]\n"
        "  state: !!python/tuple [3, <, null, null, null, -1, -1, 0]\n"
        "- !!binary |\n"
        f"  {payload}\n"
    )


def test_loads_params_reference_dialect():
    text = (
        "cubename: /data/cube.fits\n"
        "loglevel: DEBUG\n"
        "logcolor: false\n"
        "profiles: /somewhere/Dico_3FWHM.fits\n"
        "threshold: " + _np_scalar_yaml(4.125, "f8") +
        "nbareas: " + _np_scalar_yaml(4, "i8") +
        "preprocessing:\n"
        "  stepidx: 1\n"
        "  params: {dct_order: 10}\n"
        "  status: !!python/object/apply:muse_origin.steps.Status\n"
        "  - dumped outputs\n"
        "  runtime: 9.62\n"
        "somepair: !!python/tuple [1, 2]\n"
        "weird: !!python/object/apply:some.unknown.Thing [5]\n"
        "aname: !!python/name:numpy.median ''\n"
    )
    assert compat.looks_like_reference_yaml(text)
    param = compat.loads_params(text)
    assert param["threshold"] == 4.125
    assert isinstance(param["threshold"], float)
    assert param["nbareas"] == 4
    assert isinstance(param["nbareas"], int)
    assert param["preprocessing"]["status"] == "DUMPED"
    assert param["preprocessing"]["params"]["dct_order"] == 10
    assert param["somepair"] == [1, 2]  # normalized to list
    assert param["weird"] == 5  # unknown tag degrades to its payload
    assert param["aname"] == "numpy.median"
    # plain origin_tpu YAML must NOT be routed through the compat loader
    assert not compat.looks_like_reference_yaml("a: 1\nb: [2, 3]\n")


def test_status_payload_forms():
    from origin_tpu.pipeline.compat import _status_name

    assert _status_name("dumped outputs") == "DUMPED"
    assert _status_name("DUMPED") == "DUMPED"
    # Enum auto() ordinals are 1-based: RUN=2, FAILED=4
    assert _status_name(2) == "RUN"
    assert _status_name(4) == "FAILED"
    with pytest.raises(ValueError):
        _status_name("nonsense")
    with pytest.raises(ValueError):
        _status_name(0)


def test_old_pyyaml_ordereddict_listitems():
    # PyYAML < 5.1 had no OrderedDict representer: represent_object emits
    # an apply node whose CONTENTS ride in `listitems` (pairs), not args
    text = (
        "preprocessing: !!python/object/apply:collections.OrderedDict\n"
        "  listitems:\n"
        "  - [status, dumped]\n"
        "  - [runtime, 9.62]\n"
    )
    param = compat.loads_params(text)
    assert param["preprocessing"] == {"status": "dumped", "runtime": 9.62}


def test_ndarray_param_decodes():
    # an array-valued param (e.g. FWHM PSF as an ndarray) dumps through
    # multiarray._reconstruct with the data in the state tuple
    arr = np.array([1.5, 2.5, 3.25])
    payload = base64.b64encode(arr.tobytes()).decode()
    text = (
        "fwhm: !!python/object/apply:numpy.core.multiarray._reconstruct\n"
        "  args:\n"
        "  - !!python/name:numpy.ndarray ''\n"
        "  - !!python/tuple [0]\n"
        "  - !!binary |\n"
        "    Yg==\n"
        "  state: !!python/tuple\n"
        "  - 1\n"
        "  - !!python/tuple [3]\n"
        "  - !!python/object/apply:numpy.dtype\n"
        "    args: [f8, 0, 1]\n"
        "    state: !!python/tuple [3, <, null, null, null, -1, -1, 0]\n"
        "  - false\n"
        "  - !!binary |\n"
        f"    {payload}\n"
    )
    param = compat.loads_params(text)
    assert param["fwhm"] == [1.5, 2.5, 3.25]


def test_unregistered_python_tags_degrade():
    # bare python tags outside the registered set must degrade with a
    # warning, never refuse the whole file
    text = (
        "c: !!python/complex 3.0+4.0j\n"
        "m: !!python/module:some.module ''\n"
        "obj: !!python/object/new:some.Thing {args: [7]}\n"
    )
    param = compat.loads_params(text)
    assert param["c"] == complex(3.0, 4.0)
    assert param["m"] == ""  # degraded to its (empty scalar) payload
    assert param["obj"] == 7


class _RefStatusTag:
    """Stand-in that serializes exactly like the reference's Status."""

    def __init__(self, name):
        self.name = name


def _status_repr(dumper, obj):
    return dumper.represent_sequence(
        "tag:yaml.org,2002:python/object/apply:muse_origin.steps.Status",
        [REF_STATUS_VALUES[obj.name]],
    )


class _RefDumper(yaml.SafeDumper):
    pass


_RefDumper.add_representer(_RefStatusTag, _status_repr)


@pytest.fixture(scope="module")
def minicube(tmp_path_factory):
    path = tmp_path_factory.mktemp("data")
    cube_fn = str(path / "minicube.fits")
    seg_fn = str(path / "segmap.fits")
    make_minicube(cube_fn)
    make_segmap(seg_fn)
    return cube_fn, seg_fn


def test_export_reference_session_round_trip(minicube, tmp_path):
    """write(compat='reference') produces dense standard files + the
    reference's python-tagged YAML, and the export round-trips through
    our own loader with identical params and products."""
    import os

    orig = ORIGIN.init(minicube[0], name="exp", path=str(tmp_path),
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
    cube_std = np.array(orig.cube_std.data, copy=True)
    cat1_len = len(orig.Cat1)
    thresholds = (orig.param["threshold"], orig.param["threshold_std"])

    exp_dir = tmp_path / "export"
    os.makedirs(exp_dir, exist_ok=True)
    out = orig.write(path=str(exp_dir), compat="reference")
    orig.close_logfile()
    folder = str(exp_dir / "exp")
    assert out == folder

    # every dumped product is a dense standard file: no recipe
    # (ORITPURE) or sparse-table (ORITPUSP) forms anywhere
    from origin_tpu import fitsio

    fits_files = [f for f in os.listdir(folder) if f.endswith(".fits")]
    assert "cube_std.fits" in fits_files and "cube_correl.fits" in fits_files
    assert "spectra.fits" in fits_files and "Cat1.fits" in fits_files
    for f in fits_files:
        hdus = fitsio.read(os.path.join(folder, f))
        hdr = hdus[0].header
        assert "ORITPURE" not in hdr, f
        for h in hdus:
            assert "ORITPUSP" not in h.header, f
    # float cubes are BITPIX -32 (no scaled-int16 images in the dialect)
    hdus = fitsio.read(os.path.join(folder, "cube_correl.fits"))
    datah = next(h for h in hdus if h.data is not None and h.data.ndim == 3)
    assert datah.data.dtype == np.float32
    # instrument + O2 files, as the reference writes them
    assert os.path.isfile(os.path.join(folder, "cube_psf.fits"))
    assert os.path.isfile(os.path.join(folder, "ima_white.fits"))
    assert os.path.isfile(os.path.join(folder, "testO2_1.txt"))

    # the YAML is the reference dialect: python-tagged Status enums that
    # the reference's unsafe_load reconstructs as real enum members
    text = (exp_dir / "exp" / "exp.yaml").read_text()
    assert compat.looks_like_reference_yaml(text)
    import enum
    import sys
    import types

    fake_steps = types.ModuleType("muse_origin.steps")

    class RefStatus(enum.Enum):
        NOTRUN = "not run yet"
        RUN = "run"
        DUMPED = "dumped outputs"
        FAILED = "failed"

    fake_steps.Status = RefStatus
    fake_pkg = types.ModuleType("muse_origin")
    fake_pkg.steps = fake_steps
    sys.modules["muse_origin"] = fake_pkg
    sys.modules["muse_origin.steps"] = fake_steps
    try:
        param = yaml.unsafe_load(text)
    finally:
        del sys.modules["muse_origin"], sys.modules["muse_origin.steps"]
    assert param["preprocessing"]["status"] is RefStatus.DUMPED
    assert param["detection"]["status"] is RefStatus.DUMPED
    assert "PSF" in param  # reference load indexes it unconditionally

    # round-trip through our own loader (structural proxy for the real
    # package, which is not installable here)
    orig2 = ORIGIN.load(folder)
    try:
        assert orig2.steps["compute_spectra"].status is Status.DUMPED
        assert (orig2.param["threshold"],
                orig2.param["threshold_std"]) == thresholds
        np.testing.assert_allclose(np.asarray(orig2.cube_std.data), cube_std,
                                   atol=1e-6)
        assert len(orig2.Cat1) == cat1_len
        assert len(orig2.spectra) > 0
    finally:
        orig2.close_logfile()


def test_load_reference_session(minicube, tmp_path, monkeypatch):
    # dense float32 session files: what a reference-written session holds
    monkeypatch.setenv("ORIGIN_TPU_STORE_INT16", "0")
    monkeypatch.setenv("ORIGIN_TPU_STORE_SPARSE", "0")
    monkeypatch.setenv("ORIGIN_TPU_STORE_RECIPES", "0")

    orig = ORIGIN.init(minicube[0], name="refsess", path=str(tmp_path),
                       loglevel="INFO")
    orig.step01_preprocessing()
    orig.step02_areas()
    orig.step03_compute_PCA_threshold()
    thres = [float(t) for t in orig.thresO2]
    orig.write()
    orig.close_logfile()

    # re-dump the params file in the reference's python-tagged dialect,
    # with a missing-but-packaged profile dictionary path
    yfile = tmp_path / "refsess" / "refsess.yaml"
    param = yaml.safe_load(yfile.read_text())
    for val in param.values():
        if isinstance(val, dict) and "status" in val:
            val["status"] = _RefStatusTag(val["status"])
    param["profiles"] = "/nonexistent/elsewhere/Dico_3FWHM.fits"
    yfile.write_text(yaml.dump(param, Dumper=_RefDumper))
    assert compat.looks_like_reference_yaml(yfile.read_text())

    orig2 = ORIGIN.load(str(tmp_path / "refsess"))
    try:
        assert orig2.steps["compute_PCA_threshold"].status is Status.DUMPED
        assert [float(t) for t in orig2.thresO2] == thres
        # the packaged dictionary replaced the dead absolute path
        import os

        assert os.path.isfile(orig2.param["profiles"])
        # resuming from the translated session proves the products load
        orig2.step04_compute_greedy_PCA()
        assert orig2.cube_faint is not None
    finally:
        orig2.close_logfile()
