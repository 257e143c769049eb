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
