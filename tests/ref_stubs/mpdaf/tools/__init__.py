from origin_tpu.utils import progressbar  # noqa: F401
