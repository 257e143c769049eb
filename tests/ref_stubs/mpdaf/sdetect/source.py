from origin_tpu.artifacts.source import Source  # noqa: F401
