"""Multi-chip sharding of the detection pipeline.

The reference's only parallelism is single-node joblib pools and a spatial
"area" decomposition executed sequentially (reference steps.py:496-499,
lib_origin.py:1130-1147).  Here the cube itself is sharded over a
`jax.sharding.Mesh`:

- axis ``dp`` (data parallel): independent cubes / mosaic fields;
- axis ``sp`` (spatial parallel): the Y axis of each cube, with halo
  exchange via ``lax.ppermute`` for the spatially-extended operators (FSF
  convolution needs P//2 rows, the local-max filter needs size//2);
- channel means (standardization) and detection-count scans (purity) are
  global reductions expressed with ``lax.psum`` so they ride the ICI.

All collectives operate inside one jitted ``shard_map``; XLA overlaps the
halo transfers with the local FFT work.  Halo exchange with zero fill at the
mesh edges reproduces the zero-padded 'same' convolution of the single-chip
kernel *numerically* (the halo-extended tile uses its own DFT grid size, so
results agree to float32 round-off, not bit-for-bit; the parity test pins
atol=2e-3 / rtol=1e-3 on the local-max cubes and allows the detection
counts at scanned thresholds to differ by <=2 voxels sitting exactly at a
threshold).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.dct import dctmat

__all__ = [
    "make_mesh",
    "halo_exchange_rows",
    "build_tile_spatial_op",
    "sharded_detect",
    "sharded_detect_batch",
    "ShardedPipeline",
]


def make_mesh(n_devices=None, dp=1, devices=None):
    """Build a (dp, sp) mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = np.asarray(devices[:n_devices])
    sp = n_devices // dp
    return Mesh(devices.reshape(dp, sp), axis_names=("dp", "sp"))


def halo_exchange_rows(x, halo, axis_name="sp"):
    """Pad the (local) row axis with ``halo`` rows from mesh neighbours.

    ``x`` has shape (..., ny_loc, nx); rows are exchanged along
    ``axis_name``; the first/last shard receives zeros (matching the global
    zero padding of the convolution).
    """
    n = jax.lax.axis_size(axis_name)
    if halo == 0 or n == 1:
        if halo == 0:
            return x
        pad = [(0, 0)] * (x.ndim - 2) + [(halo, halo), (0, 0)]
        return jnp.pad(x, pad)
    # bottom rows of shard i -> top halo of shard i+1
    top = jax.lax.ppermute(
        x[..., -halo:, :], axis_name, perm=[(i, i + 1) for i in range(n - 1)]
    )
    # top rows of shard i -> bottom halo of shard i-1
    bottom = jax.lax.ppermute(
        x[..., :halo, :], axis_name, perm=[(i + 1, i) for i in range(n - 1)]
    )
    return jnp.concatenate([top, x, bottom], axis=-2)


def _conv2d_same_local(cube, kern, halo, axis_name="sp"):
    """'same' per-channel 2-D FFT convolution of a row-sharded cube."""
    padded = halo_exchange_rows(cube, halo, axis_name)
    nyp, nx = padded.shape[-2:]
    ph, pw = kern.shape[-2:]
    fshape = (nyp + ph - 1, nx + pw - 1)
    cf = jnp.fft.rfft2(padded, fshape)
    kf = jnp.fft.rfft2(kern, fshape)
    full = jnp.fft.irfft2(cf * kf, fshape)
    y0 = (ph - 1) // 2 + halo
    x0 = (pw - 1) // 2
    ny = cube.shape[-2]
    return jax.lax.dynamic_slice_in_dim(
        jax.lax.dynamic_slice_in_dim(full, y0, ny, axis=-2), x0, nx, axis=-1
    )


def _conv2d_same_local_matmul(cube, kern_r, kern_i, factors, halo,
                              axis_name="sp"):
    """'same' per-channel convolution of a row-sharded cube on the MXU.

    Same DFT-by-matmul formulation as ops.glr.glr_spatial_matmul, applied
    to the halo-extended tile: the inverse factor matrices fold in both
    the 'same' offset and the halo trim, so the output is the (ny_loc, nx)
    tile directly.  The halo exchange keeps sharded == single-chip.
    """
    from ..ops.glr import glr_spatial_matmul

    padded = halo_exchange_rows(cube, halo, axis_name)
    return glr_spatial_matmul(padded, kern_r[None], kern_i[None], None,
                              factors)


def _local_max_sharded(x, mask, size, axis_name="sp"):
    """Local maxima of a row-sharded cube (halo size//2 on the row axis).

    Halo rows that fall outside the global cube (the zero fill ppermute
    leaves on the outermost shards) are forced to -inf so the filter matches
    the single-chip -inf padding even for negative data.
    """
    halo = (size - 1) // 2
    xp = halo_exchange_rows(x, halo, axis_name)
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    ny = x.shape[-2]
    row = jnp.arange(xp.shape[-2])
    outside = ((idx == 0) & (row < halo)) | (
        (idx == n - 1) & (row >= ny + halo)
    )
    xp = jnp.where(outside[:, None], -jnp.inf, xp)
    lo = (size - 1) // 2
    hi_pad = size - 1 - lo
    filt = jax.lax.reduce_window(
        xp,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(size, size, size),
        window_strides=(1, 1, 1),
        padding=[(lo, hi_pad), (0, 0), (lo, hi_pad)],
    )
    filt = jax.lax.dynamic_slice_in_dim(filt, halo, ny, axis=-2)
    keep = (x == filt) & ~mask
    return jnp.where(keep, filt, 0.0)


def build_tile_spatial_op(psf, ny_loc, nx, halo=None):
    """Per-tile spatial FSF operator for a halo-extended row tile (host).

    Precomputes the FSF spectra (of the flipped zero-mean kernel and its
    square) on the tile's exact DFT grid, plus the DFT-matmul factor
    matrices whose inverse side folds in both the 'same' offset and the
    halo trim (see ops.glr.dft_spatial_factors).

    The halo pads the sharded row (y) axis, so it is sized from the FSF's
    y extent.  Returns (spatial_op dict, halo).
    """
    from ..ops.glr import dft_spatial_factors

    psf = np.asarray(psf, dtype=np.float32)
    ph, pw = psf.shape[-2:]
    if halo is None:
        halo = (ph - 1) // 2
    if ny_loc < halo:
        # the halo exchange is single-hop (immediate mesh neighbours),
        # so each tile must be at least one halo tall
        raise ValueError(
            f"tile height {ny_loc} is smaller than the FSF halo ({halo}); "
            "use fewer sp shards or a taller field"
        )
    nyp = ny_loc + 2 * halo
    fshape = (nyp + ph - 1, nx + pw - 1)
    kern = psf[:, ::-1, ::-1]
    kern = kern - kern.mean(axis=(1, 2), keepdims=True)
    kern_hat = np.fft.rfft2(kern, fshape)
    kern2_hat = np.fft.rfft2(kern * kern, fshape)
    factors = dft_spatial_factors(
        nyp, nx, fshape, (ph, pw), ny_out=ny_loc, y_extra=halo
    )
    spatial_op = dict(
        kern_r=kern_hat.real.astype(np.float32),
        kern_i=kern_hat.imag.astype(np.float32),
        kern2_r=kern2_hat.real.astype(np.float32),
        kern2_i=kern2_hat.imag.astype(np.float32),
        factors=factors,
    )
    return spatial_op, halo


def glr_tile(faint, mask, spatial_op, t_num, t_den, pad_left, nz,
             local_max_size=3, halo=0, axis_name="sp", wtiles=None,
             use_pallas=False, precision=None, sweep_interpret=False):
    """Full step-05 tile math with collectives; runs inside shard_map.

    Spatial FSF convolution on the halo-extended tile, banded-Toeplitz
    spectral sweep (with best-profile indices), masking, local extrema and
    the max/min maps.  Matches the single-chip DeviceEngine.tglr products.

    Mosaics: pass a LIST of per-field spatial ops plus ``wtiles``, the
    (F, ny_loc, nx) row shard of the field weight maps; each field
    convolves the weighted tile with its own FSF and the results sum, as
    in the single-chip stage (ops.glr.glr_spatial_matmul with wmaps).

    ``use_pallas`` runs the spectral sweep as the fused Pallas kernel on
    each device's tile (same kernel as the single-chip engine; real TPU
    meshes only — ``sweep_interpret=True`` emulates it on CPU tests), at
    ``precision`` ("bf16x3" or a jax Precision, default HIGHEST).
    """
    from ..ops.glr import toeplitz_sweep

    spatial_ops = (
        [spatial_op] if isinstance(spatial_op, dict) else list(spatial_op)
    )
    cube_fsf = None
    norm_fsf = None
    for f, op in enumerate(spatial_ops):
        if wtiles is None:
            data = faint
            base = jnp.ones_like(faint)
        else:
            w = wtiles[f][None]
            data = faint * w
            base = jnp.broadcast_to(w, faint.shape)
        cf = _conv2d_same_local_matmul(
            data, op["kern_r"], op["kern_i"], op["factors"], halo, axis_name,
        )
        nf_ = _conv2d_same_local_matmul(
            base, op["kern2_r"], op["kern2_i"], op["factors"], halo,
            axis_name,
        )
        cube_fsf = cf if cube_fsf is None else cube_fsf + cf
        norm_fsf = nf_ if norm_fsf is None else norm_fsf + nf_
    if use_pallas:
        from ..ops.pallas_sweep import toeplitz_sweep_pallas

        # NOTE: the enclosing shard_map must pass check_vma=False — the
        # varying-axes checker cannot see through pallas_call (its block
        # machinery manufactures replicated scalars that trip it)
        correl, profile, correl_min = toeplitz_sweep_pallas(
            cube_fsf, norm_fsf, t_num, t_den, pad_left, nz,
            interpret=sweep_interpret,
            precision=(jax.lax.Precision.HIGHEST if precision is None
                       else precision),
            vma=frozenset({axis_name}),
        )
    else:
        correl, profile, correl_min = toeplitz_sweep(
            cube_fsf, norm_fsf, t_num, t_den, pad_left, nz
        )
    correl = jnp.where(mask, 0.0, correl)
    correl_min = jnp.where(mask, 0.0, correl_min)
    profile = jnp.where(mask, jnp.zeros((), profile.dtype), profile)
    lmax = _local_max_sharded(correl, mask, local_max_size, axis_name)
    lmin = _local_max_sharded(-correl_min, mask, local_max_size, axis_name)
    maxmap = jnp.amax(correl, axis=0)
    minmap = jnp.amin(correl_min, axis=0)
    return correl, correl_min, profile, lmax, lmin, maxmap, minmap


def detect_tile_kernel(
    cube, var, mask, spatial_op, t_num, t_den, d0, thresholds,
    pad_left=0, local_max_size=3, axis_name="sp", halo=0,
    use_pallas=False, precision=None,
):
    """Single-tile detection math with collectives; runs inside shard_map.

    cube/var/mask: (Nz, ny_loc, Nx) row shards; ``spatial_op`` is the
    precomputed FSF operator dict (DFT-matmul factors + FSF spectra, see
    ShardedPipeline) applied to the halo-extended tile;
    t_num/t_den: (K, W, B) banded-Toeplitz profile banks (see
    ops.glr.pack_profiles_toeplitz) with shared left pad ``pad_left``;
    d0: (Nz, order+1) DCT basis; thresholds: (T,) purity scan grid.

    Returns (local_max, local_min, counts_max, counts_min).
    """
    nz = cube.shape[0]
    good = ~mask

    # --- DCT continuum (per spaxel, no communication) ---------------------
    hi = jax.lax.Precision.HIGHEST
    ivar = jnp.where(good, 1.0 / var, 1.0)
    ivar = jnp.where(jnp.isfinite(ivar), ivar, 0.0)
    k = d0.shape[1]
    dd = (d0[:, :, None] * d0[:, None, :]).reshape(nz, k * k)
    a = jnp.einsum("zq,zyx->yxq", dd, ivar, precision=hi).reshape(
        cube.shape[1], cube.shape[2], k, k
    )
    b = jnp.einsum("zi,zyx->yxi", d0, cube * ivar, precision=hi)
    coef = jax.scipy.linalg.cho_solve(
        (jnp.linalg.cholesky(a), True), b[..., None]
    )[..., 0]
    cont = jnp.einsum("zi,yxi->zyx", d0, coef, precision=hi)

    # --- standardization: channel means need a reduction over the row
    # shards (sp only: each dp batch element standardizes independently) --
    data = cube - cont
    ngood = jax.lax.psum(jnp.sum(good, axis=(1, 2)), axis_name)
    mean_z = jax.lax.psum(
        jnp.sum(jnp.where(good, data, 0.0), axis=(1, 2)), axis_name
    ) / jnp.maximum(ngood, 1)
    data = (data - mean_z[:, None, None]) / jnp.sqrt(var)
    data = jnp.where(good & jnp.isfinite(data), data, 0.0)

    # --- GLR matched filter + local extrema (halo-exchange tile stage;
    # the unused profile/map outputs are dead-code-eliminated by XLA) -----
    _, _, _, lmax, lmin, _, _ = glr_tile(
        data, mask, spatial_op, t_num, t_den, pad_left, nz,
        local_max_size=local_max_size, halo=halo, axis_name=axis_name,
        use_pallas=use_pallas, precision=precision,
    )

    # --- purity counts: global psum over the mesh -------------------------
    def counts(v):
        idx = jnp.searchsorted(thresholds, v.ravel(), side="left")
        hist = jnp.bincount(idx, length=thresholds.shape[0] + 1)
        csum = jnp.cumsum(hist)
        local = v.size - csum[: thresholds.shape[0]]
        return jax.lax.psum(local, axis_name)

    return lmax, lmin, counts(lmax), counts(lmin)


class ShardedPipeline:
    """Host wrapper compiling the sharded detection step over a mesh."""

    def __init__(self, mesh, nz, ny, nx, psf, profiles, dct_order=10,
                 local_max_size=3, thresholds=None, use_pallas=None,
                 precision=None):
        from ..ops.glr import pack_profiles_toeplitz, prepare_profiles

        if use_pallas is None:
            # fused Pallas sweep per tile on real TPU meshes, same as the
            # session engine (ORIGIN_TPU_PALLAS=0 reverts)
            import os

            from ..ops.pallas_kernels import pallas_available

            use_pallas = (
                pallas_available()
                and os.environ.get("ORIGIN_TPU_PALLAS", "1") != "0"
            )
        self.use_pallas = bool(use_pallas)
        self.precision = precision

        self.mesh = mesh
        self.sp = mesh.shape["sp"]
        self.dp = mesh.shape["dp"]
        if ny % self.sp != 0:
            raise ValueError(f"ny={ny} must divide over sp={self.sp} shards")
        self.shape = (nz, ny, nx)
        self.psf = np.asarray(psf, dtype=np.float32)
        prepped = prepare_profiles(profiles)
        self.t_num, self.t_den, self.pad_left, _ = pack_profiles_toeplitz(
            prepped, block=min(128, nz)
        )

        # precompute the per-tile spatial FSF operator on the halo-extended
        # tile's exact DFT grid
        self.spatial_op, self.halo = build_tile_spatial_op(
            self.psf, ny // self.sp, nx
        )
        self.d0 = dctmat(nz, dct_order)
        if thresholds is None:
            thresholds = np.linspace(2.0, 12.0, 50)
        self.thresholds = np.asarray(thresholds, dtype=np.float32)
        self.local_max_size = local_max_size

        cube_spec = P("dp", None, "sp", None)  # (B, Nz, Ny, Nx)
        rep = P()
        op_spec = jax.tree.map(lambda _: rep, self.spatial_op)

        @partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(cube_spec, cube_spec, cube_spec, op_spec, rep, rep,
                      rep, rep),
            out_specs=(cube_spec, cube_spec, P("dp"), P("dp")),
            # the vma checker cannot see through pallas_call
            check_vma=not self.use_pallas,
        )
        def step(cube, var, mask, spatial_op, t_num, t_den, d0, thresholds):
            out = jax.vmap(
                lambda c, v, m: detect_tile_kernel(
                    c, v, m, spatial_op, t_num, t_den, d0, thresholds,
                    pad_left=self.pad_left,
                    local_max_size=self.local_max_size,
                    halo=self.halo,
                    use_pallas=self.use_pallas,
                    precision=self.precision,
                )
            )(cube, var, mask)
            lmax, lmin, cmax, cmin = out
            return lmax, lmin, cmax, cmin

        self._step = jax.jit(step)

    def __call__(self, cubes, variances, masks):
        """Run the sharded detection on a (B, Nz, Ny, Nx) batch.

        Returns (local_max, local_min, counts_max, counts_min); counts are
        per batch element over the full (unsharded) cube.
        """
        b = cubes.shape[0]
        if b % self.dp != 0:
            raise ValueError(f"batch {b} must divide over dp={self.dp}")
        args = [
            jnp.asarray(cubes, jnp.float32),
            jnp.asarray(variances, jnp.float32),
            jnp.asarray(masks),
            jax.tree.map(jnp.asarray, self.spatial_op),
            jnp.asarray(self.t_num),
            jnp.asarray(self.t_den),
            jnp.asarray(self.d0),
            jnp.asarray(self.thresholds),
        ]
        sharding = NamedSharding(self.mesh, P("dp", None, "sp", None))
        for i in range(3):
            args[i] = jax.device_put(args[i], sharding)
        return self._step(*args)


def sharded_detect(mesh, cube, var, mask, psf, profiles, **kwargs):
    """One-shot helper: sharded detection of a single cube."""
    nz, ny, nx = cube.shape
    pipe = ShardedPipeline(mesh, nz, ny, nx, psf, profiles, **kwargs)
    lmax, lmin, cmax, cmin = pipe(
        cube[None], var[None], mask[None]
    )
    return (
        np.asarray(lmax)[0],
        np.asarray(lmin)[0],
        np.asarray(cmax)[0],
        np.asarray(cmin)[0],
    )


def sharded_detect_batch(mesh, cubes, variances, masks, psf, profiles,
                         **kwargs):
    """Sharded detection of a batch of cubes (dp x sp parallelism)."""
    nz, ny, nx = cubes.shape[1:]
    pipe = ShardedPipeline(mesh, nz, ny, nx, psf, profiles, **kwargs)
    return pipe(cubes, variances, masks)
