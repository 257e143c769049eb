"""origin_tpu — TPU-native blind emission-line detection for MUSE datacubes.

A ground-up JAX/XLA/pallas re-architecture of the capabilities of
musevlt/origin (ORIGIN: detectiOn and extRactIon of Galaxy emIssion liNes,
Mary et al., A&A 2020): an 11-step pipeline that detects faint emission-line
sources in (Nz, Ny, Nx) hyperspectral cubes with per-voxel variance.

Device code (origin_tpu.ops) is a functional core of jit-compiled kernels
over float32 arrays; host code (core/, detect/, artifacts/, pipeline/) owns
FITS I/O, catalogs, WCS and session management; origin_tpu.parallel shards
the cube over a device mesh with halo exchange.
"""

from .version import version as __version__  # noqa: F401

from .core import (  # noqa: F401
    Cube,
    Image,
    Spectrum,
    Table,
    WCS,
    WaveCoord,
    MoffatFSF,
    FieldsMap,
)


def __getattr__(name):
    # Lazy imports so that `import origin_tpu` stays cheap and host-only
    # unless device kernels are actually needed.
    if name == "ORIGIN":
        from .pipeline.session import ORIGIN

        return ORIGIN
    if name in ("steps", "ops", "detect", "artifacts", "pipeline", "parallel"):
        import importlib

        if name == "steps":
            return importlib.import_module(".pipeline.steps", __name__)
        return importlib.import_module("." + name, __name__)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
