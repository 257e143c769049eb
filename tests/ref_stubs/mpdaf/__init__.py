"""Minimal mpdaf facade over origin_tpu's substrate (TEST STUB) — lets
the genuine reference package run against origin_tpu sessions (see
tests/test_reference_interop.py).  origin_tpu's containers were designed
API-compatible with the mpdaf surface the reference uses, so the facade
is mostly re-exports."""
