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
