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


#: Reference-parity surface: every name musevlt/origin exports at package
#: top level (reference __init__.py:1 star-exports lib_origin.__all__,
#: steps and origin; lib_origin.py:42-59, steps.py:1336-1348), mapped to
#: the equivalent entry point of this framework.  The snake_case names in
#: the submodules are canonical; these lazy aliases exist so a user
#: migrating from the reference finds everything where they expect it.
_REF_PARITY = {
    # numerics kernel library (reference lib_origin.py:42-59)
    "add_tglr_stat": ("detect", "add_tglr_stat"),
    "compute_deblended_segmap": ("detect", "compute_deblended_segmap"),
    "Compute_GreedyPCA": ("ops", "greedy_pca"),
    "compute_local_max": ("ops", "compute_local_max"),
    "compute_segmap_gauss": ("detect", "compute_segmap_gauss"),
    "compute_thresh_gaussfit": ("ops", "compute_thresh_gaussfit"),
    "Compute_threshold_purity": ("ops", "compute_threshold_purity"),
    "compute_true_purity": ("detect", "compute_true_purity"),
    "Correlation_GLR_test": ("ops", "correlation_glr_test"),
    "create_masks": ("artifacts", "create_masks"),
    "estimation_line": ("ops", "estimation_line_arrays"),
    "merge_similar_lines": ("detect", "merge_similar_lines"),
    "purity_estimation": ("detect", "purity_estimation"),
    "spatial_segmentation": ("detect", "spatial_segmentation"),
    "spatiospectral_merging": ("detect", "spatiospectral_merging"),
    "unique_sources": ("detect", "unique_sources"),
    # step framework (reference steps.py:1336-1348)
    "Status": ("pipeline.steps", "Status"),
    "Step": ("pipeline.steps", "Step"),
    "Preprocessing": ("pipeline.steps", "Preprocessing"),
    "CreateAreas": ("pipeline.steps", "CreateAreas"),
    "ComputePCAThreshold": ("pipeline.steps", "ComputePCAThreshold"),
    "ComputeGreedyPCA": ("pipeline.steps", "ComputeGreedyPCA"),
    "ComputeTGLR": ("pipeline.steps", "ComputeTGLR"),
    "ComputePurityThreshold": ("pipeline.steps", "ComputePurityThreshold"),
    "Detection": ("pipeline.steps", "Detection"),
    "ComputeSpectra": ("pipeline.steps", "ComputeSpectra"),
    "CleanResults": ("pipeline.steps", "CleanResults"),
    "CreateMasks": ("pipeline.steps", "CreateMasks"),
    "SaveSources": ("pipeline.steps", "SaveSources"),
    "STEPS": ("pipeline.steps", "STEPS"),
    # source artifacts (reference source_masks.py / source_creation.py)
    "gen_source_mask": ("artifacts", "gen_source_mask"),
    "create_source": ("artifacts", "create_source"),
    "create_all_sources": ("artifacts", "create_all_sources"),
    # catalog-editing utilities (reference source_update.py lists these in
    # __all__ but never imports the module in its __init__ — an opt-in
    # import there; exported here as a convenience beyond the reference)
    "merge_sources": ("artifacts.source_update", "merge_sources"),
    "split_source": ("artifacts.source_update", "split_source"),
    "update_masks": ("artifacts.source_update", "update_masks"),
    "update_sources": ("artifacts.source_update", "update_sources"),
    "update_source_table": ("artifacts.source_update", "update_source_table"),
}


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
    if name in _REF_PARITY:
        import importlib

        mod, attr = _REF_PARITY[name]
        return getattr(importlib.import_module("." + mod, __name__), attr)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def __dir__():
    return sorted(set(globals()) | set(_REF_PARITY)
                  | {"ORIGIN", "steps", "ops", "detect", "artifacts",
                     "pipeline", "parallel"})
