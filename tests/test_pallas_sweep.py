"""Fused Pallas spectral-sweep kernel: parity with the XLA Toeplitz path.

Runs in interpret mode on CPU; the real-TPU measurements (1.4-1.7x the XLA
path, parity ~1e-6, 100% profile agreement) are recorded in
docs/benchmarks.md.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from origin_tpu.core import gaussian_profile
from origin_tpu.ops.glr import (
    glr_spectral_mxu,
    pack_profiles_toeplitz,
    prepare_profiles,
)
import origin_tpu.ops.pallas_sweep as ps


def _problem(nz, ny, nx, fwhms, seed=0):
    rng = np.random.default_rng(seed)
    cf = rng.normal(size=(nz, ny, nx)).astype(np.float32)
    nf = rng.uniform(0.5, 2.0, size=(nz, ny, nx)).astype(np.float32)
    prepped = prepare_profiles([gaussian_profile(f, 41, 20) for f in fwhms])
    t_num, t_den, pad_left, _ = pack_profiles_toeplitz(
        prepped, block=min(128, nz)
    )
    return cf, nf, t_num, t_den, pad_left


def _compare(cf, nf, t_num, t_den, pad_left, nz):
    c0, p0, m0 = glr_spectral_mxu(
        jnp.asarray(cf), jnp.asarray(nf), jnp.asarray(t_num),
        jnp.asarray(t_den), pad_left, nz,
    )
    c1, p1, m1 = ps.toeplitz_sweep_pallas(
        jnp.asarray(cf), jnp.asarray(nf), jnp.asarray(t_num),
        jnp.asarray(t_den), pad_left, nz, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m0), atol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(p1), np.asarray(p0).astype(np.int32)
    )


def test_pallas_sweep_parity():
    cf, nf, t_num, t_den, pad_left = _problem(300, 12, 11, (2.0, 5.0, 9.0))
    _compare(cf, nf, t_num, t_den, pad_left, 300)


def test_pallas_sweep_parity_20_profiles():
    cf, nf, t_num, t_den, pad_left = _problem(
        260, 9, 8, tuple(np.linspace(2, 12, 20)), seed=3
    )
    _compare(cf, nf, t_num, t_den, pad_left, 260)


def test_pallas_sweep_bf16x3_mode():
    # interpret mode rounds through bf16 too (astype is real), so this
    # exercises the actual 3-pass error (~1e-5 relative); on-chip
    # measurements are recorded in docs/benchmarks.md
    cf, nf, t_num, t_den, pad_left = _problem(260, 9, 8, (2.0, 6.0), seed=7)
    c0, p0, m0 = glr_spectral_mxu(
        jnp.asarray(cf), jnp.asarray(nf), jnp.asarray(t_num),
        jnp.asarray(t_den), pad_left, 260,
    )
    c1, p1, m1 = ps.toeplitz_sweep_pallas(
        jnp.asarray(cf), jnp.asarray(nf), jnp.asarray(t_num),
        jnp.asarray(t_den), pad_left, 260, interpret=True,
        precision="bf16x3",
    )
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c0), atol=1e-4)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m0), atol=1e-4)


def test_pallas_sweep_vmap_batch():
    """vmap over the kernel (the ShardedPipeline dp path maps multiple
    batch elements per device) matches per-element invocation."""
    import jax

    cf0, nf0, t_num, t_den, pad_left = _problem(260, 9, 8, (2.0, 6.0))
    cf1, nf1, _, _, _ = _problem(260, 9, 8, (2.0, 6.0), seed=11)
    cfs = jnp.stack([jnp.asarray(cf0), jnp.asarray(cf1)])
    nfs = jnp.stack([jnp.asarray(nf0), jnp.asarray(nf1)])
    tn, td = jnp.asarray(t_num), jnp.asarray(t_den)

    batched = jax.vmap(
        lambda c, n: ps.toeplitz_sweep_pallas(
            c, n, tn, td, pad_left, 260, interpret=True
        )
    )(cfs, nfs)
    for i, (cf, nf) in enumerate(((cf0, nf0), (cf1, nf1))):
        single = ps.toeplitz_sweep_pallas(
            jnp.asarray(cf), jnp.asarray(nf), tn, td, pad_left, 260,
            interpret=True,
        )
        for b, s in zip(batched, single):
            np.testing.assert_allclose(
                np.asarray(b[i], np.float32), np.asarray(s, np.float32),
                atol=1e-5,
            )


def test_pallas_sweep_chunked(monkeypatch):
    """Force the spectral-chunked path (VMEM-constrained plan) and check
    the overlap/concat reassembly against the unchunked XLA result."""
    cf, nf, t_num, t_den, pad_left = _problem(500, 7, 6, (2.0, 6.0), seed=5)

    def tiny_plan(zout_, window, block, budget=None, tile_fixed=None):
        return 32, [(0, 256), (256, zout_ - 256)]

    monkeypatch.setattr(ps, "_plan_chunks", tiny_plan)
    # the plan runs at trace time: drop any cached trace of these shapes so
    # the monkeypatched plan actually takes effect
    ps.toeplitz_sweep_pallas.clear_cache()
    _compare(cf, nf, t_num, t_den, pad_left, 500)
    ps.toeplitz_sweep_pallas.clear_cache()


def test_plan_chunks_prefers_fewest_chunks():
    # small problem: single chunk, tallest tile
    tile, chunks = ps._plan_chunks(512, 186, 128)
    assert len(chunks) == 1 and tile >= 128
    # full MUSE z extent: one chunk at a half-height tile beats two chunks
    tile, chunks = ps._plan_chunks(29 * 128, 186, 128)
    assert len(chunks) == 1 and tile == 64
    # a forced tile re-plans the chunking under the same budget
    tile, chunks = ps._plan_chunks(29 * 128, 186, 128, tile_fixed=256)
    assert tile == 256 and len(chunks) > 1
    # chunk starts/extents tile the output exactly
    tile, chunks = ps._plan_chunks(29 * 128, 186, 128, budget=4 << 20)
    assert sum(c[1] for c in chunks) == 29 * 128
    assert chunks[0][0] == 0
    for (a, la), (b, _) in zip(chunks, chunks[1:]):
        assert b == a + la
