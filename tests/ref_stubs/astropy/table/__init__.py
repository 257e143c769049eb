"""astropy.table facade over origin_tpu.core.table (test stub)."""

import numpy as np

from origin_tpu.core import table as _t

vstack = _t.vstack
join = _t.join


class Column(np.ndarray):
    """ndarray view that tolerates astropy Column attribute writes
    (``format``, ``fill_value``) — the reference's _format_cat sets them
    on loaded catalogs (reference steps.py:61-73)."""

    def __new__(cls, data=None, name=None, **kwargs):
        return np.asarray(data).view(cls)


class Table(_t.Table):
    def __getitem__(self, key):
        out = super().__getitem__(key)
        if isinstance(key, str) and isinstance(out, np.ndarray):
            return out.view(Column)
        return out

    @classmethod
    def read(cls, filename, **kwargs):
        base = _t.Table.read(filename)
        t = cls()
        t.columns = base.columns
        t.meta = base.meta
        t._formats = base._formats
        return t
