"""Unit names resolve to plain strings; arithmetic is never exercised by
the session-load path."""


def __getattr__(name):
    return name
