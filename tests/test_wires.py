"""Unit tests of the wire codec layer (pipeline/wires.py) in isolation.

The codecs are the contract between device memory, the host link, and
the session files; these tests exercise them directly — no engine, no
session — so a codec regression localizes here.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from origin_tpu.core.containers import Quant16
from origin_tpu.pipeline import wires


def test_encode_i16_dequant_round_trip():
    rng = np.random.default_rng(0)
    x = (rng.normal(size=(40, 7, 9)) * 20).astype(np.float32)
    q, scale = wires._encode_i16(jnp.asarray(x))
    q = np.asarray(q)
    s = float(scale)
    assert q.dtype == np.int16
    # decode error bounded by half a quantization step
    np.testing.assert_allclose(q.astype(np.float32) * s, x,
                               atol=s / 2 + 1e-12)
    # device decode == host decode bit-for-bit
    dev = np.asarray(wires._dequant16(jnp.asarray(q), np.float32(s)))
    np.testing.assert_array_equal(dev, q.astype(np.float32) * np.float32(s))


@pytest.mark.parametrize("bits,nvals", [(1, 2), (2, 4), (4, 16)])
def test_pack_unpack_bits_lossless(bits, nvals):
    rng = np.random.default_rng(1)
    x = rng.integers(0, nvals, size=(13, 5, 21)).astype(np.uint8)
    packed = np.asarray(wires._pack_bits(jnp.asarray(x), bits))
    assert packed.shape[-1] == -(-21 * bits // 8)  # ceil(nx * bits / 8)
    out = wires._unpack_bits(packed, bits, 21, np.uint8)
    np.testing.assert_array_equal(out, x)


def test_scatter_sparse_dense_and_quant():
    shape = (10, 4, 5)
    fidx = np.array([3, 17, 100], np.int64)
    vals = np.array([1.5, -2.0, 8.0], np.float32)
    dense = wires._scatter_sparse(shape, np.float32, 3, fidx, vals,
                                  quant=False)
    assert dense.shape == shape and dense.dtype == np.float32
    assert dense.ravel()[17] == -2.0 and np.count_nonzero(dense) == 3

    q = wires._scatter_sparse(shape, np.float32, 3, fidx, vals, quant=True)
    if isinstance(q, Quant16):  # int16 storage on (the default)
        dec = q.decode()
        np.testing.assert_allclose(dec.ravel()[[3, 17, 100]], vals,
                                   atol=float(q.scale) / 2)
        # wire carries the (index, value) pairs for the sparse file form
        fi, qv = q.pairs
        np.testing.assert_array_equal(fi, fidx)


def test_scatter_sparse_tiny_values_stay_nonzero():
    """An extremum smaller than half a quantization step must not vanish
    from the nonzero set (consumers enumerate extrema by != 0)."""
    shape = (2, 2, 2)
    fidx = np.array([0, 5], np.int64)
    vals = np.array([100.0, 1e-6], np.float32)  # second quantizes to 0
    q = wires._scatter_sparse(shape, np.float32, 2, fidx, vals, quant=True)
    if isinstance(q, Quant16):
        assert q.q.ravel()[5] != 0
        assert np.count_nonzero(q.q) == 2


def test_scatter16_flat_pad_rows_are_noops():
    fidx = np.array([2, 7, 0, 0], np.int64)  # two pad rows pointing at 0
    q = np.array([100, -50, 0, 0], np.int16)  # pad rows carry q == 0
    out = np.asarray(wires._scatter16_flat(
        jnp.asarray(fidx), jnp.asarray(q), np.float32(0.5), 12))
    assert out[2] == 50.0 and out[7] == -25.0
    assert out[0] == 0.0 and np.count_nonzero(out) == 2


def test_compact_body_row_major_order():
    arr = np.zeros((3, 4), np.float32)
    arr[0, 2] = 5.0
    arr[1, 1] = 3.0
    arr[2, 3] = 7.0
    flat = jnp.asarray(arr).ravel()
    fidx, vals, extras = wires._compact_body(flat, flat != 0, (), 8)
    fidx, vals = np.asarray(fidx), np.asarray(vals)
    n = 3
    np.testing.assert_array_equal(fidx[:n], [2, 5, 11])  # np.where order
    np.testing.assert_array_equal(vals[:n], [5.0, 3.0, 7.0])


def test_compact_body_two_stage_matches_np_where():
    """The large-array two-stage compaction (block top_k + windowed
    scatter) returns exactly the first-cap hits in np.where order."""
    rng = np.random.default_rng(3)
    n = wires._COMPACT_SINGLE_MAX + 50_000  # force the two-stage path
    flat = rng.normal(size=n).astype(np.float32)
    extra = rng.normal(size=n).astype(np.float32)
    for thr, cap in ((4.0, 1024), (2.5, 256)):  # sparse / overflowing
        fj = jnp.asarray(flat)
        fidx, vals, (ev,) = map(np.asarray, (
            lambda r: (r[0], r[1], r[2]))(
            wires._compact_body(fj, fj > thr, (jnp.asarray(extra),), cap)))
        ei = np.where(flat > thr)[0]
        m = min(cap, len(ei))
        assert m > 0
        np.testing.assert_array_equal(fidx[:m], ei[:m])
        np.testing.assert_allclose(vals[:m], flat[ei[:m]])
        np.testing.assert_allclose(ev[:m], extra[ei[:m]])
        # single-stage reference on the same data
        f2, v2, (e2,) = wires._compact_small(fj, fj > thr,
                                             (jnp.asarray(extra),), cap)
        np.testing.assert_array_equal(fidx[:m], np.asarray(f2)[:m])


def test_int16_wire_fetch_releases_device_ref():
    x = (np.random.default_rng(2).normal(size=(6, 4, 4)) * 3).astype(
        np.float32)
    dev = jnp.asarray(x)
    fetch = wires._int16_wire_fetch(dev)
    got = fetch()
    if isinstance(got, Quant16):
        got = got.decode()
    np.testing.assert_allclose(got, x, atol=np.abs(x).max() / 32766 + 1e-12)
    # the closure dropped its pin after a successful fetch
    assert fetch.__closure__ is not None
    fetch.release()  # idempotent


def test_lane_timer_accumulates():
    wires.lane_stats_reset()
    with wires._lane_timer("test:lane", nbytes=10):
        pass
    with wires._lane_timer("test:lane", nbytes=5):
        pass
    n, cpu, wall, nb = wires.LANE_STATS["test:lane"]
    assert n == 2 and nb == 15 and wall >= 0.0
    wires.lane_stats_reset()
    assert wires.LANE_STATS == {}
