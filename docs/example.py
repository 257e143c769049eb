"""Executable walkthrough of an ORIGIN session on a synthetic cube.

Mirrors the reference's docs/example.ipynb: build a cube, run the 11 steps,
inspect catalogs and diagnostics.  Run from the repo root:

    python docs/example.py /tmp/origin_example
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tests")
)

import numpy as np

import origin_tpu
from make_minicube import make_minicube


def main(workdir=None):
    workdir = workdir or tempfile.mkdtemp(prefix="origin_example_")
    os.makedirs(workdir, exist_ok=True)
    cube_fn = os.path.join(workdir, "minicube.fits")
    make_minicube(cube_fn)
    print(f"synthetic cube written to {cube_fn}")

    orig = origin_tpu.ORIGIN.init(
        cube_fn, name="example", path=workdir, loglevel="INFO"
    )

    orig.step01_preprocessing()
    orig.step02_areas()
    orig.step03_compute_PCA_threshold()
    orig.step04_compute_greedy_PCA()
    orig.step05_compute_TGLR()
    orig.step06_compute_purity_threshold(purity=0.8)
    orig.step07_detection()
    orig.step08_compute_spectra()
    orig.step09_clean_results()
    orig.step10_create_masks()
    orig.step11_save_sources("0.1")

    orig.write()
    print()
    orig.status()
    orig.timestat()
    orig.stat()

    cat = orig.Cat3_sources
    print(f"\n{len(cat)} sources:")
    print(cat)
    return orig


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
