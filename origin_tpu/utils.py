"""Small shared utilities: timing/observability helpers."""

from __future__ import annotations

import logging
from functools import wraps
from time import time

__all__ = ["timeit", "progressbar"]


def timeit(f):
    """Debug-log the wall time of a function (observability hook, mirroring
    the reference's kernel-level timing, lib_origin.py:62-73)."""

    @wraps(f)
    def timed(*args, **kw):
        logger = logging.getLogger(f.__module__)
        t0 = time()
        result = f(*args, **kw)
        logger.debug("%s executed in %0.1fs", f.__name__, time() - t0)
        return result

    return timed


def progressbar(iterable=None, **kwargs):
    """tqdm wrapper that degrades to a plain iterator without tqdm."""
    try:
        from tqdm import tqdm

        return tqdm(iterable, **kwargs)
    except ImportError:  # pragma: no cover
        return iterable


_cache_enabled = False


def enable_compile_cache(path=None):
    """Enable JAX's persistent compilation cache (idempotent).

    Cold-start XLA compilation of the pipeline's programs costs minutes on
    some backends; the on-disk cache carries the compiled executables
    across processes.  Default location ``~/.cache/origin_tpu/xla``;
    override with the ORIGIN_TPU_COMPILE_CACHE environment variable, or
    set it to "0" to disable.
    """
    global _cache_enabled
    if _cache_enabled:
        return
    import os

    path = path or os.environ.get("ORIGIN_TPU_COMPILE_CACHE")
    if path == "0":
        return
    if not path:
        path = os.path.expanduser("~/.cache/origin_tpu/xla")
    try:
        import jax

        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _cache_enabled = True
    except Exception:  # pragma: no cover - cache is best-effort
        logging.getLogger(__name__).debug("compile cache unavailable")
