"""Minimal astropy facade over origin_tpu's own substrate (TEST STUB).

Exists so the GENUINE reference package (/root/reference/muse_origin) can
be imported and executed against origin_tpu-exported sessions in
tests/test_reference_interop.py — astropy is not installed in this
image.  Only the surface the reference's session-load path touches is
real; everything else raises on use.
"""
