from .source import Source  # noqa: F401
