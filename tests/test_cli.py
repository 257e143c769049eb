"""CLI tests: python -m origin_tpu run / resume / status."""

import os

import numpy as np
import pytest

from make_minicube import make_minicube
from origin_tpu.__main__ import main
from origin_tpu.core import Table


@pytest.fixture(scope="module")
def cube_fn(tmp_path_factory):
    path = tmp_path_factory.mktemp("cli")
    fn = str(path / "minicube.fits")
    make_minicube(fn, nz=300, ny=40, nx=40)
    return fn


def test_cli_run_and_status(cube_fn, tmp_path, capsys):
    rc = main([
        "run", cube_fn, "--name", "clirun", "--path", str(tmp_path),
        "--purity", "0.8", "--minsize", "20", "--no-sources",
        "--loglevel", "WARNING",
    ])
    assert rc == 0
    folder = str(tmp_path / "clirun")
    assert os.path.isfile(os.path.join(folder, "Cat3_lines.fits"))
    cat = Table.read(os.path.join(folder, "Cat1.fits"))
    assert len(cat) > 0

    rc = main(["status", folder])
    assert rc == 0
    out = capsys.readouterr().out
    assert "09" in out or "clean" in out


def test_cli_survey_mode(cube_fn, tmp_path):
    """Several cubes in one invocation: per-cube sessions named by stem,
    compiled programs and instrument uploads shared across fields."""
    import shutil

    second = str(tmp_path / "field2.fits")
    shutil.copy(cube_fn, second)
    rc = main([
        "run", cube_fn, second, "--name", "svy", "--path", str(tmp_path),
        "--purity", "0.8", "--minsize", "20", "--no-sources",
        "--loglevel", "WARNING",
    ])
    assert rc == 0
    cats = []
    for stem in ("minicube", "field2"):
        folder = str(tmp_path / f"svy-{stem}")
        assert os.path.isfile(os.path.join(folder, "Cat1.fits"))
        cat = Table.read(os.path.join(folder, "Cat1.fits"))
        cats.append(sorted(zip(np.asarray(cat["x0"]), np.asarray(cat["y0"]),
                               np.asarray(cat["z0"]))))
    # identical fields -> identical catalogs
    assert cats[0] == cats[1] and len(cats[0]) > 0


def test_cli_survey_overlap_ingest(cube_fn, tmp_path):
    """--overlap-ingest pipelines the survey (field N+1's session inits
    while field N runs) with identical results, and a bad middle field
    neither aborts the survey nor corrupts its neighbours."""
    import shutil

    second = str(tmp_path / "field2.fits")
    bad = str(tmp_path / "bad.fits")
    shutil.copy(cube_fn, second)
    with open(bad, "wb") as fh:
        fh.write(b"not a FITS file")
    rc = main([
        "run", cube_fn, bad, second, "--name", "ovl", "--path",
        str(tmp_path), "--purity", "0.8", "--minsize", "20",
        "--no-sources", "--loglevel", "WARNING", "--overlap-ingest",
    ])
    assert rc == 1  # the bad field is reported...
    cats = []
    for stem in ("minicube", "field2"):  # ...but both good fields ran
        folder = str(tmp_path / f"ovl-{stem}")
        cat = Table.read(os.path.join(folder, "Cat1.fits"))
        cats.append(sorted(zip(np.asarray(cat["x0"]), np.asarray(cat["y0"]),
                               np.asarray(cat["z0"]))))
    assert cats[0] == cats[1] and len(cats[0]) > 0


def test_cli_resume_noop(cube_fn, tmp_path):
    rc = main([
        "run", cube_fn, "--name", "cliresume", "--path", str(tmp_path),
        "--purity", "0.8", "--minsize", "20", "--no-sources",
        "--loglevel", "WARNING",
    ])
    assert rc == 0
    folder = str(tmp_path / "cliresume")
    # all catalog steps done -> resume runs nothing new and succeeds
    rc = main(["resume", folder, "--no-sources", "--loglevel", "WARNING"])
    assert rc == 0
