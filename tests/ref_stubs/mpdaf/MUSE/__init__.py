from origin_tpu.core.fsf import FieldsMap, MoffatFSF  # noqa: F401


class _FSFMeta(type):
    # the reference branches on isinstance(fsf, FSFModel) to distinguish
    # one field from a mosaic (reference origin.py:593); our MoffatFSF
    # plays the single-model role
    def __instancecheck__(cls, obj):
        return isinstance(obj, MoffatFSF)


class FSFModel(metaclass=_FSFMeta):
    """Header-FSF reader facade (reference origin.py:586-609)."""

    @classmethod
    def read(cls, cube):
        from origin_tpu.core.fsf import read_fsf_from_header

        return read_fsf_from_header(cube.primary_header)
