"""Device-resident execution engine for the detection front-end.

The reference pipeline's steps exchange full (Nz, Ny, Nx) numpy cubes
through the session object (reference steps.py:284-299 store_cube /
DataObj).  A literal port would round-trip ~10 cube-sized arrays over the
host-device link.  Here the front-end steps (01 preprocessing, 04 greedy
PCA, 05 GLR, 06 purity, 07 detection) keep every cube-sized intermediate
*on the accelerator*: the session's DataObjs hold :class:`DeferredCube`
handles that materialize to host numpy only when actually needed on the
host (session ``write()``, plotting, mask generation), and only the small
products cross the boundary eagerly:

- 2-D images (white/continuum images, O2 map, max/min maps): ~100 KB
- per-area O2 test vectors for the host-side Gaussian threshold fits
- purity count scans ((50,) vectors) and scalars
- sparse detection coordinate lists (argwhere on device)

Besides minimizing PCIe/ICI traffic this lets XLA fuse across what the
reference treats as separate pipeline stages (DCT -> standardize -> local
max run as one compiled program).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from ..ops import compute_local_max, o2test, standardize
from ..ops.dct import dct_residual
from ..ops.convolve import fft2_shape
from ..ops.glr import (
    dft_spatial_factors,
    glr_spatial_chunked,
    glr_spatial_matmul,
    glr_spectral_mxu,
    pack_profiles_toeplitz,
    precompute_spatial,
    prepare_profiles,
)
from ..ops.pca import _bucket, greedy_pca
from ..ops.spectra import _bucket4, _trim2
from .wires import (  # noqa: F401  (re-exported: public API + test surface)
    DeferredCube,
    LANE_STATS,
    _compact_body,
    _copy_pool,
    _count_nonzero_many,
    _dequant16,
    _dyn_region,
    _encode_i16,
    _extract_nonzero_many,
    _fetch_sparse_pairs,
    _host_pool,
    _int16_wire_fetch,
    _lane_timer,
    _pack_bits,
    _packed_wire_fetch,
    _prefetch_sparse_group,
    _scatter16_flat,
    _scatter_sparse,
    _sparse_fetch,
    _store_int16,
    _unpack_bits,
    _UPLOAD_CACHE_MAX,
    _upload_cache,
    _upload_cached,
    _upload_pool,
    _wire_device_upload,
    foreground_cpu,
    lane_stats_reset,
    lane_time,
    materialize_deferred,
    wait_for_foreground,
)

__all__ = ["DeferredCube", "DeviceEngine", "MeshEngine", "device_memory_fits"]


def device_memory_fits(nbytes, device=None):
    """Whether ``nbytes`` of working set fits on ``device``, measured.

    Resolution order:

    1. ``ORIGIN_TPU_HBM_BYTES`` environment variable (an explicit budget in
       bytes; scientific notation accepted);
    2. the backend-reported allocator limit (``memory_stats()['bytes_limit']``
       — production TPU/GPU runtimes report it);
    3. host platforms are treated as unlimited;
    4. otherwise: assume it does NOT fit.  Probing by allocation is not an
       option — a deliberately failing multi-GB allocation destabilizes
       some backends even when the exception is caught (observed on the
       async dev tunnel: the RESOURCE_EXHAUSTED poisons a later, perfectly
       ordinary program).  Tight mode (chunked programs, eager offloads)
       is correct everywhere, merely slower on big-memory devices, whose
       runtimes report their limit anyway.
    """
    import logging
    import os

    env = os.environ.get("ORIGIN_TPU_HBM_BYTES")
    if env:
        return nbytes <= int(float(env))
    if device is None:
        device = jax.devices()[0]
    try:
        stats = device.memory_stats() or {}
        limit = stats.get("bytes_limit")
    except Exception:
        limit = None
    if limit:
        return nbytes <= int(limit)
    if device.platform == "cpu":
        return True
    logging.getLogger(__name__).info(
        "device memory limit unknown (no memory_stats): assuming the "
        "tight-memory mode; set ORIGIN_TPU_HBM_BYTES to override"
    )
    return False








@partial(jax.jit, static_argnames=("order", "approx", "size", "diag_bf16"))
def _preprocess_fused(cube, var, mask, order, approx, size, diag_bf16):
    """Steps 01's device math as one compiled program.

    ``diag_bf16`` stores the diagnostics-only continuum cube as bfloat16
    (all derived statistics are computed in float32 first): halves its HBM
    and its transfer at session write time; bfloat16 keeps float32's range
    so bright continua cannot overflow like float16 would.
    """
    cont, coef = dct_residual(cube, order, var=var, approx=approx, mask=mask,
                              with_coef=True)
    data, cont_std, mean_z = standardize(cube, cont, var, mask,
                                         with_mean=True)
    lmax, lmin = compute_local_max(data, data, mask, size)
    ima_std = jnp.mean(data, axis=0)
    ima_dct = jnp.mean(cont_std, axis=0)
    o2 = o2test(data)
    cont_sumsq = jnp.sum(cont_std * cont_std, axis=0)
    if diag_bf16:
        cont_std = cont_std.astype(jnp.bfloat16)
    return (data, cont_std, lmax, lmin, ima_std, ima_dct, o2, cont_sumsq,
            coef, mean_z)


@jax.jit
def _count_above(arr, threshold):
    return jnp.sum(arr > threshold)


@jax.jit
def _derive_inputs(raw, var_raw):
    """Zero-filled cube, inf-filled variance and NaN mask from the raw
    uploads (bit-equal to the host-side filled()/var_filled() views:
    the variance fills inf at the DATA mask too, containers.var_filled)."""
    mask = ~jnp.isfinite(raw)
    cube = jnp.where(mask, 0.0, raw)
    var = jnp.where(mask | ~jnp.isfinite(var_raw), jnp.inf, var_raw)
    return cube, var, mask


@jax.jit
def _std_jit(arr):
    return jnp.std(arr)




@partial(jax.jit, static_argnames=("sg",))
def _gather_minicubes(cube, var, ys, xs, sg):
    """(B, Nz, sg, sg) windows centred at (ys, xs), pad-free.

    Each window is cut at a clipped start from the UNPADDED arrays,
    rotated into the requested alignment, and its out-of-field cells are
    filled with the padded-extraction convention (data 0, variance inf)
    — bit-equal to slicing whole-field padded copies (the reference's
    overlap_slices + zero-pad extraction, reference
    lib_origin.py:1860-1893) without materializing them.  Requires
    ny >= sg and nx >= sg (callers fall back to the padded path below
    otherwise).
    """
    nl, ny, nx = cube.shape
    h = sg // 2
    ii = jnp.arange(sg)

    def one(yc, xc):
        y0 = yc - h  # requested window start (may be out of field)
        x0 = xc - h
        ya = jnp.clip(y0, 0, ny - sg)  # clipped in-field start
        xa = jnp.clip(x0, 0, nx - sg)
        d = jax.lax.dynamic_slice(cube, (0, ya, xa), (nl, sg, sg))
        v = jax.lax.dynamic_slice(var, (0, ya, xa), (nl, sg, sg))
        # requested row y0+i sits at clipped index y0+i-ya:
        # roll(d, s)[i] = d[i-s], so s = ya-y0 aligns the window
        d = jnp.roll(jnp.roll(d, ya - y0, axis=1), xa - x0, axis=2)
        v = jnp.roll(jnp.roll(v, ya - y0, axis=1), xa - x0, axis=2)
        infield = (((y0 + ii >= 0) & (y0 + ii < ny))[:, None]
                   & ((x0 + ii >= 0) & (x0 + ii < nx))[None, :])
        return (jnp.where(infield, d, jnp.float32(0.0)),
                jnp.where(infield, v, jnp.float32(jnp.inf)))

    return jax.vmap(one)(ys, xs)


@partial(jax.jit, static_argnames=("sg",))
def _gather_minicubes_padded(pd, pv, ys, xs, sg):
    """Window gather over pre-padded (by sg//2) copies — the fallback
    for fields smaller than the window, where the clipped-slice gather
    above cannot run."""
    nl = pd.shape[0]

    def one(y0, x0):
        return (
            jax.lax.dynamic_slice(pd, (0, y0, x0), (nl, sg, sg)),
            jax.lax.dynamic_slice(pv, (0, y0, x0), (nl, sg, sg)),
        )

    return jax.vmap(one)(ys, xs)




def _extract_above_body(arr, extras, threshold, cap):
    flat = arr.ravel()
    return _compact_body(flat, flat > threshold, extras, cap)


_extract_above = partial(jax.jit, static_argnames=("cap",))(
    _extract_above_body
)


#: speculative per-cube line capacity of step 07's single-round-trip
#: count+compact program (tests shrink it to exercise the overflow path)
_SPEC_CAP = 4096


@partial(jax.jit, static_argnames=("cap1", "cap2"))
def _count_extract_above_pair(a1, e1, t1, cap1, a2, e2, t2, cap2):
    """Counts AND capacity-bounded compactions of both cubes as ONE
    program / one fetch (the step-07 fast path: one link round-trip
    when the speculative capacity holds both counts)."""
    return (
        jnp.sum(a1 > t1), jnp.sum(a2 > t2),
        _extract_above_body(a1, e1, t1, cap1),
        _extract_above_body(a2, e2, t2, cap2),
    )







@partial(jax.jit, static_argnames=("cap1", "cap2"))
def _extract_above_pair(a1, e1, t1, cap1, a2, e2, t2, cap2):
    """Both step-07 compactions as ONE device program / one fetch."""
    return (
        _extract_above_body(a1, e1, t1, cap1),
        _extract_above_body(a2, e2, t2, cap2),
    )


@partial(jax.jit, static_argnames=("size", "diag_bf16", "prof_dtype"))
def _mask_extrema(correl, correl_min, profile, mask, size, diag_bf16=False,
                  prof_dtype=None):
    """Masking + 3-D local extrema + max/min maps as one program.

    With ``diag_bf16`` the stored copy of the diagnostics-only
    ``correl_min`` cube is bfloat16 (extrema and minmap are derived from
    the float32 values first); ``prof_dtype`` narrows the profile-index
    cube (uint8 whenever the dictionary fits — the reference's in-memory
    dtype, lib_origin.py:1204) — both shrink HBM + transfer.
    """
    correl = jnp.where(mask, 0.0, correl)
    correl_min = jnp.where(mask, 0.0, correl_min)
    profile = jnp.where(mask, jnp.zeros((), profile.dtype), profile)
    lmax, lmin = compute_local_max(correl, correl_min, mask, size)
    minmap = jnp.amin(correl_min, axis=0)
    if diag_bf16:
        correl_min = correl_min.astype(jnp.bfloat16)
    if prof_dtype is not None:
        profile = profile.astype(prof_dtype)
    return (correl, correl_min, profile, lmax, lmin,
            jnp.amax(correl, axis=0), minmap)


@partial(
    jax.jit,
    static_argnames=("fshape2", "pad_left", "nz", "size", "spatial_pallas",
                     "sweep_pallas", "prec", "diag_bf16", "prof_dtype"),
)
def _tglr_fused(faint, mask, psfs, wmaps, t_num, t_den, factors,
                fshape2, pad_left, nz, size, spatial_pallas, sweep_pallas,
                prec, diag_bf16=False, prof_dtype=None):
    """Step 05 as one compiled program (non-tight-memory path).

    Instrument-model precompute (FSF spectra + norm cube), spatial FSF
    stage, spectral matched-filter sweep, masking, 3-D local extrema and
    the max/min maps; XLA's buffer liveness frees each stage's
    intermediates, so peak HBM matches the separate-program sequence.
    """
    ny, nx = faint.shape[1:]
    kern_hats, norm_fsf = precompute_spatial(psfs, wmaps, ny, nx, fshape2)
    kern_r = jnp.real(kern_hats)
    kern_i = jnp.imag(kern_hats)
    del kern_hats
    if spatial_pallas:
        from ..ops.pallas_spatial import glr_spatial_pallas

        cube_fsf = glr_spatial_pallas(faint, kern_r, kern_i, wmaps,
                                      factors, precision=prec)
    else:
        cube_fsf = glr_spatial_matmul(faint, kern_r, kern_i, wmaps, factors)
    if sweep_pallas:
        from ..ops.pallas_sweep import toeplitz_sweep_pallas

        correl, profile, correl_min = toeplitz_sweep_pallas(
            cube_fsf, norm_fsf, t_num, t_den, pad_left, nz, precision=prec,
        )
    else:
        correl, profile, correl_min = glr_spectral_mxu(
            cube_fsf, norm_fsf, t_num, t_den, pad_left, nz,
        )
    return _mask_extrema(correl, correl_min, profile, mask, size,
                         diag_bf16=diag_bf16, prof_dtype=prof_dtype)




class DeviceEngine:
    """Per-session holder of device-resident front-end state.

    Device handles live in the session's DataObjs (as DeferredCube); the
    engine only caches the uploaded inputs and resolves intermediate
    arrays, re-uploading from the (possibly disk-loaded) host copy when a
    session resumes mid-pipeline.
    """

    #: cube-sized products are divided over this many devices (mesh
    #: engines shard rows over sp devices)
    memory_shards = 1

    def __init__(self, orig):
        self.orig = orig
        self._inputs = {}
        self._inputs_future = None
        self._mini_cache = {}
        self._recipes = {}  # product name -> recipe saver (see recipes.py)
        self._spec_det = None  # in-flight step-07 speculative fetch
        self._tight = None
        # decide the memory mode NOW, before pipeline state accumulates,
        # so every step of this session sees one consistent mode
        _ = self.tight_memory

    # -- inputs ------------------------------------------------------------
    def _put_cube(self):
        return jnp.asarray(self.orig.cube_raw, jnp.float32)

    def _put_var(self):
        return jnp.asarray(self.orig.var, jnp.float32)

    def _put_mask(self):
        return jnp.asarray(self.orig.mask)

    def _put_raw(self, arr):
        return jnp.asarray(arr)

    def _upload_inputs(self):
        """(cube, var, mask) device arrays with minimal upload traffic.

        The mask is the raw data's non-finite pattern (NaN-masked voxels),
        so uploading the UNFILLED data + variance and deriving
        zero-filled / inf-filled / mask on device saves the mask upload
        entirely (and the host-side filled copies).  Sessions with an
        explicit mask extension fall back to the three-array path.
        """
        c = getattr(self.orig, "cube", None)
        if c is None or c.mask is not None:
            # no raw container (engine unit tests) or an explicit mask
            # extension: upload the three host views directly
            return self._put_cube(), self._put_var(), self._put_mask()
        raw = self._put_raw(np.asarray(c.data, np.float32))
        if c.var is not None:
            var_raw = self._put_raw(np.asarray(c.var, np.float32))
        else:
            var_raw = jnp.ones(c.data.shape, jnp.float32)
        return _derive_inputs(raw, var_raw)

    def recipe_saver(self, name):
        """Recipe writer for an exactly-reconstructible product, or None.

        Registered by the steps that record a product's generators
        (step 01: DCT coefficients; step 04: PCA factors); the
        DeferredCube's ``write`` then stores the tiny recipe file instead
        of rebuilding and serializing the dense cube (recipes.py)."""
        return self._recipes.get(name)

    def prefetch_inputs(self):
        """Start uploading the raw cube / variance in the background.

        Called at session construction so the (large) host-to-device
        transfers overlap the rest of the init work (FSF build, white
        image); step 01 then just joins them.
        """
        if self._inputs_future is None and "cube" not in self._inputs:
            self._inputs_future = _upload_pool().submit(self._upload_inputs)

    def stream_inputs(self, plan):
        """Decode the raw cube AND upload it, overlapped slab by slab.

        ``plan`` is a :class:`origin_tpu.pipeline.ingest.IngestPlan`; its
        reader hands every decoded z-slab to the upload worker the moment
        it is byteswapped, so the host-to-device transfer rides the link
        WHILE the next slab decodes (a cold disk read of a full MUSE
        field otherwise serializes ~1 min of upload behind ~3 min of
        decode).  Returns the host Cube; the device inputs land in the
        same ``_inputs_future`` step 01 joins, as one concatenated array
        per input plus the shared ``_derive_inputs`` pass (bit-identical
        to the eager upload path).
        """
        pool = _upload_pool()
        futs = {"data": [], "var": []}

        def _up(kind):
            return lambda slab: futs[kind].append(
                pool.submit(jnp.asarray, slab))

        cube = plan.read(upload_data=_up("data"), upload_var=_up("var"))

        def _assemble():
            data = [f.result() for f in futs["data"]]
            raw = data[0] if len(data) == 1 else jnp.concatenate(data, 0)
            if futs["var"]:
                vs = [f.result() for f in futs["var"]]
                var_raw = vs[0] if len(vs) == 1 else jnp.concatenate(vs, 0)
            else:
                var_raw = jnp.ones(plan.shape, jnp.float32)
            return _derive_inputs(raw, var_raw)

        # same single-worker pool: _assemble queues behind every slab
        # upload it joins, so no ordering deadlock is possible
        self._inputs_future = pool.submit(_assemble)
        return cube

    def _ensure_inputs(self, name):
        if name in self._inputs:
            return
        fut, self._inputs_future = self._inputs_future, None
        if fut is None:
            cube, var, mask = self._upload_inputs()
        else:
            cube, var, mask = fut.result()
        self._inputs.setdefault("cube", cube)
        self._inputs.setdefault("var", var)
        self._inputs.setdefault("mask", mask)

    def input_cube(self):
        self._ensure_inputs("cube")
        return self._inputs["cube"]

    def input_var(self):
        self._ensure_inputs("var")
        return self._inputs["var"]

    def input_mask(self):
        self._ensure_inputs("mask")
        return self._inputs["mask"]

    def drop_inputs(self, *names):
        for n in names:
            self._inputs.pop(n, None)

    def inputs_resident(self):
        """Raw cube/variance device copies resident (or uploading).

        False once a tight-memory session dropped them (after step 01):
        a consumer needing only a few windows should then cut them from
        the host raw data instead of re-uploading the whole field
        (ops.lines.estimation_line_arrays weighs the bytes both ways).
        """
        return "cube" in self._inputs or self._inputs_future is not None

    @staticmethod
    def _use_pallas():
        """Fused Pallas kernels on TPU backends (ORIGIN_TPU_PALLAS=0 off)."""
        import os

        from ..ops.pallas_kernels import pallas_available

        return (
            pallas_available()
            and os.environ.get("ORIGIN_TPU_PALLAS", "1") != "0"
        )

    @staticmethod
    def _diag_bf16():
        """Store diagnostics-only cubes (cont_dct, cube_correl_min) as
        bfloat16 on device: halves their HBM and their write-time transfer;
        the session files stay float32.  ``ORIGIN_TPU_DIAG_DTYPE=float32``
        opts out."""
        import os

        return os.environ.get(
            "ORIGIN_TPU_DIAG_DTYPE", "bf16"
        ).lower() not in ("f32", "fp32", "float32")

    @staticmethod
    def _pallas_precision():
        """Matmul precision for the fused Pallas kernels.

        Default float32 (HIGHEST, 6 bf16 MXU passes — faithful to the
        XLA paths to ~3e-7 relative).  ``ORIGIN_TPU_PRECISION=bf16x3``
        selects the 3-pass scheme: ~25% faster GLR stages at ~1e-5
        relative error (measured catalog-identical on the golden field;
        see docs/benchmarks.md).
        """
        import logging
        import os

        mode = os.environ.get("ORIGIN_TPU_PRECISION", "highest").lower()
        if mode == "bf16x3":
            return "bf16x3"
        if mode not in ("highest", ""):
            logging.getLogger(__name__).warning(
                "unknown ORIGIN_TPU_PRECISION=%r (valid: highest, bf16x3); "
                "using highest", mode,
            )
        return jax.lax.Precision.HIGHEST

    # headroom demanded before running unchunked: ~10 resident cube-sized
    # products plus FFT/window transients
    HEADROOM_CUBES = 24

    @property
    def tight_memory(self):
        """True when the device HBM cannot hold ~24 cubes of this field.

        Decides whether diagnostics-only products are offloaded to host
        eagerly and whether the GLR spatial stage runs z-chunked.  The
        budget is measured, never guessed from the device model name:
        ``ORIGIN_TPU_HBM_BYTES`` (env) > ``memory_stats()['bytes_limit']``
        > assume-tight (see :func:`device_memory_fits` — probing by
        allocation was removed as unsafe on async backends).  The
        cross-session instrument-constant cache counts against the
        budget, and a tight session drops it.
        """
        if self._tight is None:
            cube_bytes = 4 * int(np.prod(self.orig.shape))
            need = cube_bytes * self.HEADROOM_CUBES // self.memory_shards
            # resident cross-session constants reduce the usable budget
            need += sum(int(v.nbytes) for v in _upload_cache.values())
            self._tight = not device_memory_fits(need)
            if self._tight:
                # a tight session needs every byte: drop the shared
                # instrument-constant cache (it re-uploads on demand)
                _upload_cache.clear()
        return self._tight

    def prefetch(self, *names):
        """Start async device-to-host copies of finished products.

        Called by steps the moment a product becomes final: the transfer
        then overlaps the remaining device/host work, so the session
        ``write()`` finds the bytes already on their way (or arrived)
        instead of paying the full link serially.  Sparse products named
        here are grouped into ONE fused count/compaction job, submitted
        before the dense copies so its small round-trips beat the bulk
        transfers onto the link.  No-op for already-materialized
        products; device memory is NOT freed (use :meth:`offload`).
        """
        owners = getattr(self.orig, "_product_owner", None)
        if owners is None:
            return
        objs = []
        for n in names:
            owner = owners.get(n)
            if owner is None:
                continue
            val = owner.store.peek(n)
            if isinstance(val, DeferredCube):
                objs.append(val)
        sparse = [o for o in objs if o._sparse]
        if sparse:
            _prefetch_sparse_group(sparse)
        for o in objs:
            if not o._sparse:
                o.prefetch()

    #: detection statistics whose global std feeds add_tglr_stat
    #: (step 09): compute it while the cube is still device-resident —
    #: after a tight offload the host copy is a quantized wire and a
    #: dense host np.std costs seconds per cube at full-field scale
    _STD_CACHED = ("cube_std", "cube_correl")

    def offload(self, *names):
        """Materialize products to host now, freeing their HBM.

        Quantized transfers stay in wire form (no float32 decode) —
        exactly what a tight session wants from an eager offload."""
        for n in names:
            obj = getattr(self.orig, n, None)
            if isinstance(obj, DeferredCube) and obj.device is not None:
                if n in self._STD_CACHED:
                    obj._std_scalar = float(_std_jit(obj.device))
                obj.materialize()

    def maybe_offload(self, *names):
        """Free the HBM of finished products on tight-memory sessions.

        Host-rebuildable products whose checkpoint is a recipe file
        (cube_std / cont_dct / cube_faint) just drop their device copy:
        materializing them would pay an expensive single-core rebuild
        (tens of seconds per cube at full-field scale) that often nobody
        consumes — a later ``.data`` access rebuilds on demand.  The
        detection-statistic std scalars are reduced on device first
        (:meth:`std_scalar`).  Everything else offloads (materializes)
        as before."""
        if not self.tight_memory:
            return
        for n in names:
            obj = getattr(self.orig, n, None)
            if not isinstance(obj, DeferredCube) or obj.device is None:
                continue
            if n in self._STD_CACHED:
                obj._std_scalar = float(_std_jit(obj.device))
            if obj._fetch is not None and obj.recipe_active:
                obj.drop_device()
            else:
                obj.materialize()

    def drop_device(self, *names):
        """Free still-resident device copies of host-recreatable products.

        Used by step 11 once a recipe-backed cube's device copy has served
        its last on-device consumer: with recipe checkpointing nothing
        materializes these cubes anymore, so without an explicit drop
        their HBM would be freed only when the session objects are
        garbage-collected."""
        owners = getattr(self.orig, "_product_owner", {})
        for n in names:
            owner = owners.get(n)
            val = owner.store.peek(n) if owner is not None else None
            if isinstance(val, DeferredCube):
                val.drop_device()

    def release(self):
        """Drop every device allocation this session's engine holds.

        Multi-field processes (survey CLI, benchmarks) call this once a
        field is finished (everything parked) or abandoned after a
        failure: the session<->engine reference cycle otherwise keeps
        the raw-input device arrays alive until a GC pass, which on a
        small-HBM chip can OOM the NEXT field's programs.  An abandoned
        field's never-materialized device-only products lose their
        content (:meth:`DeferredCube.discard`) — freeing the HBM is the
        point here."""
        self._inputs.clear()
        self._inputs_future = None
        self._mini_cache.clear()
        self._spec_det = None
        owners = getattr(self.orig, "_product_owner", {})
        for name, owner in owners.items():
            val = owner.store.peek(name)
            if isinstance(val, DeferredCube):
                val.discard()

    def std_scalar(self, name):
        """Standard deviation of a session cube (device when resident).

        Prefers the scalar stashed at offload time (device reduction of
        the unquantized array, same program as the non-tight path); a
        materialized quantized wire is reduced by exact integer sums
        (``scale * sqrt(E[q^2] - E[q]^2)``) without the float32 decode
        pass the dense host np.std would pay."""
        obj = getattr(self.orig, name)
        cached = getattr(obj, "_std_scalar", None)
        if cached is not None:
            return cached
        off_device = isinstance(obj, DeferredCube) and obj.device is None
        if off_device:
            w = obj._wire  # direct: wire16() would run a rebuild fetch
        elif not isinstance(obj, DeferredCube) and hasattr(obj, "wire16"):
            w = obj.wire16()
        else:
            w = None
        q = getattr(w, "q", None)
        if q is not None and q.size and q.shape == tuple(obj.shape):
            q = q.ravel()
            n = q.size
            s1 = int(q.sum(dtype=np.int64))
            s2 = int(np.einsum("i,i->", q, q, dtype=np.int64))
            var = s2 / n - (s1 / n) ** 2
            return float(w.scale) * float(np.sqrt(max(var, 0.0)))
        if off_device:
            return float(np.std(obj.data))
        out = float(_std_jit(self.get(name)))
        if isinstance(obj, DeferredCube):
            # stash for consumers arriving after a wire materialization
            # may have dropped the device copy (early bulk prefetches)
            obj._std_scalar = out
        return out

    def get(self, name):
        """Device array for a cube-sized session product.

        Prefers the still-resident DeferredCube handle; falls back to
        uploading the host copy (resume-from-disk path), with masked
        voxels zero-filled as the device kernels expect.  A host copy
        carrying its dense int16 wire (loaded scaled-int16 session
        files, materialized quantized transfers) uploads the wire —
        half the float32 bytes — and dequantizes on device
        (``float32(q) * float32(scale)``, bit-equal to the host decode).
        """
        obj = getattr(self.orig, name)
        if isinstance(obj, DeferredCube) and obj.device is not None:
            return obj.device
        dev = _wire_device_upload(obj, self._put_raw)
        if dev is not None:
            return dev
        host = obj.filled(0)
        if host.dtype == np.float64:
            host = host.astype(np.float32)
        return jnp.asarray(host)

    # -- step 01 -----------------------------------------------------------
    def preprocess(self, dct_order=10, dct_approx=False, local_max_size=3):
        """Fused DCT + standardization + std local extrema.

        Returns (device dict, host dict, fetch dict): cube-sized products
        stay on device; the 2-D images come back as numpy; the fetch dict
        maps product names to host-rebuild callables (see
        :meth:`_make_std_fetches`).
        """
        out = _preprocess_fused(
            self.input_cube(), self.input_var(), self.input_mask(),
            dct_order, dct_approx, local_max_size, self._diag_bf16(),
        )
        (data, cont_std, lmax, lmin, ima_std, ima_dct, o2, cont_sumsq,
         coef, mean_z) = out
        dev = dict(cube_std=data, cont_dct=cont_std,
                   cube_std_local_max=lmax, cube_std_local_min=lmin)
        # one batched transfer for the 2-D products (a high-latency host
        # link pays per-fetch round-trips otherwise); the DCT coefficients
        # and channel means ride along (~(order+1)/Nz of a cube)
        ima_std, ima_dct, o2, cont_sumsq, coef, mean_z = jax.device_get(
            (ima_std, ima_dct, o2, cont_sumsq, coef, mean_z)
        )
        host = dict(ima_std=ima_std, ima_dct=ima_dct, o2=o2,
                    cont_sumsq=cont_sumsq)
        fetches = self._make_std_fetches(coef, mean_z, dct_order)
        # the raw cube / variance are needed again by the line-estimation
        # minicube gather (step 08); keep them resident unless HBM is tight
        if self.tight_memory:
            self.drop_inputs("cube", "var")
        return dev, host, fetches

    def _make_std_fetches(self, coef, mean_z, order):
        """Host rebuilds of cube_std / cont_dct from the DCT coefficients.

        The (order+1, Ny, Nx) basis coefficients plus the (Nz,) channel
        means are ~(order+1)/Nz of a cube; together with the raw data
        already in host RAM they determine both products exactly (same
        math as :func:`_preprocess_fused`), so session ``write()``
        re-derives them with one host matmul instead of transferring ~1.5
        cubes over the link.  Agreement with the device arrays is f32
        matmul round-off (~1e-6 relative); the rebuilt cont_dct skips the
        device's bfloat16 diagnostics storage, so the written file is the
        full-precision continuum.  Sessions without host raw-data views
        (bare-engine use) get no fetches and fall back to the download.
        """
        orig = self.orig
        if getattr(orig, "cube", None) is None:
            return {}
        mean_z = np.asarray(mean_z, np.float32)

        # the same payload, stored: session write() parks these products
        # as tiny recipe files instead of rebuilding + serializing the
        # dense cubes (recipes.py; ORIGIN_TPU_STORE_RECIPES=0 opts out)
        from .recipes import write_dct_recipe

        cubename = getattr(orig, "param", {}).get("cubename")
        self._recipes["cube_std"] = lambda path: write_dct_recipe(
            path, "std", coef, mean_z, order, cubename)
        self._recipes["cont_dct"] = lambda path: write_dct_recipe(
            path, "cont", coef, mean_z, order, cubename)

        # the two fetches run concurrently on the host pool and share the
        # expensive intermediates (the DCT continuum matmul and the
        # inverse-sigma cube): memoize them behind one lock so each is
        # computed once per step01, not once per product
        import threading

        shared = {}
        shared_lock = threading.Lock()

        def _rebuild_both():
            # one locked pass computes BOTH products (shared math with
            # the recipe loader, recipes.rebuild_std_cont: the arithmetic
            # ORDER is part of the contract — on the CPU backend the
            # rebuild is bit-equal to the device arrays, which the
            # tight-memory paths rely on: greedy PCA iterates on a hard
            # O2 threshold, so a 1-ulp drift there flips an iteration
            # and moves the catalog)
            from .recipes import rebuild_std_cont

            with shared_lock:
                if "std" not in shared:
                    data, cont = rebuild_std_cont(
                        orig.cube_raw, orig.var, orig.mask, coef, mean_z,
                        order,
                    )
                    shared["std"] = data
                    shared["cont_dct"] = cont
                return shared

        def fetch_cont_dct():
            with _lane_timer("rebuild:cont_dct"):
                return _rebuild_both()["cont_dct"]

        def fetch_cube_std():
            with _lane_timer("rebuild:cube_std"):
                return _rebuild_both()["std"]

        # windowed rebuilds: a per-source cutout of a dropped-device
        # product costs O(window) host work instead of the full-cube
        # rebuild (DeferredCube._region dispatches here).  Bit-equal to
        # the corresponding window of the full rebuild
        # (recipes.rebuild_std_cont_region), and served from the full
        # rebuild's arrays when one already ran.
        def _region_both(zsl, ysl, xsl):
            with shared_lock:
                if "std" in shared:
                    return {k: shared[k][zsl, ysl, xsl]
                            for k in ("std", "cont_dct")}
                if "d0" not in shared:
                    from ..ops.dct import dctmat

                    shared["d0"] = dctmat(
                        orig.cube_raw.shape[0], order, dtype=np.float32)
                d0 = shared["d0"]
            from .recipes import rebuild_std_cont_region

            with _lane_timer("rebuild:window"):
                std_w, cont_w = rebuild_std_cont_region(
                    orig.cube_raw, orig.var, orig.mask, coef, mean_z,
                    zsl, ysl, xsl, d0,
                )
            return {"std": std_w, "cont_dct": cont_w}

        fetch_cube_std.region = lambda zsl, ysl, xsl: \
            _region_both(zsl, ysl, xsl)["std"]
        fetch_cont_dct.region = lambda zsl, ysl, xsl: \
            _region_both(zsl, ysl, xsl)["cont_dct"]

        return dict(cube_std=fetch_cube_std, cont_dct=fetch_cont_dct)

    # -- step 04 -----------------------------------------------------------
    def greedy_pca_by_area(self, areamap, thresholds, testO2,
                           noise_population=50.0, itermax=100):
        """Zone-wise greedy PCA with device-resident gather/scatter.

        Per area, the (Nz, Npix_area) column block is gathered on device
        from the flat cube via an uploaded (bucketed) index vector, run
        through the jitted greedy-PCA while-loop, and scattered back —
        the cube itself never leaves the accelerator.  Downloads: the
        per-area iteration maps plus the removed rank-1 factors (both
        small), from which hosts REBUILD the cleaned cube
        (``faint = std - U @ C`` per area) instead of transferring it.

        Returns ``(faint_device, mapO2, nstop, faint_fetch)`` where
        ``faint_fetch`` is the host rebuild callable (or None when the
        engine has no factor path).
        """
        cube_std = self.get("cube_std")
        nz = cube_std.shape[0]
        spatial_shape = cube_std.shape[1:]
        flat = cube_std.reshape(nz, -1)
        npix_tot = flat.shape[1]
        areamap = np.asarray(areamap)
        mapO2 = np.zeros(spatial_shape, dtype=np.int32)
        nb_area = int(areamap.max())
        pending = []  # dispatch every area first, fetch once at the end
        for area in range(1, nb_area + 1):
            sel = (areamap == area).ravel()
            (idx,) = np.nonzero(sel)
            npx = idx.size
            if npx == 0:
                continue
            pad = _bucket(npx)
            idx_pad = np.full(pad, npix_tot, dtype=np.int32)  # OOB = padding
            idx_pad[:npx] = idx
            valid = np.zeros(pad, dtype=bool)
            valid[:npx] = True
            test_pad = np.zeros(pad, dtype=np.float32)
            test_pad[:npx] = np.asarray(testO2[area - 1], dtype=np.float32)

            didx = jnp.asarray(idx_pad)
            cols = jnp.take(flat, didx, axis=1, mode="fill", fill_value=0.0)
            faint, m, k, u_mat, c_mat = greedy_pca(
                cols, jnp.asarray(valid), jnp.asarray(test_pad),
                float(thresholds[area - 1]),
                noise_population=float(noise_population),
                itermax=int(itermax), record_factors=True,
            )
            # out-of-bounds scatters (padding columns) are dropped
            flat = flat.at[:, didx].set(faint, mode="drop")
            pending.append((idx, npx, m, k, u_mat, c_mat))
        # ONE batched fetch for all areas' iteration maps, stop flags and
        # rank-1 factors (fetching inside the loop would serialize the
        # area dispatches on a high-latency host link)
        fetched = jax.device_get([p[2:] for p in pending])
        nstop = 0
        factors = []
        for (idx, npx, *_), (m, k, u_mat, c_mat) in zip(pending, fetched):
            mapO2.ravel()[idx] = m[:npx]
            nstop += int(k)
            used = np.flatnonzero((u_mat != 0).any(axis=0))
            if used.size:
                factors.append(
                    (idx, u_mat[:, used], np.ascontiguousarray(
                        c_mat[used][:, :npx]))
                )
        faint_fetch = self._make_faint_fetch(factors, spatial_shape)
        if getattr(self.orig, "cube", None) is not None:
            from .recipes import write_pca_recipe

            cubename = getattr(self.orig, "param", {}).get("cubename")
            self._recipes["cube_faint"] = lambda path: write_pca_recipe(
                path, factors, cubename)
        return flat.reshape(cube_std.shape), mapO2, nstop, faint_fetch

    def _make_faint_fetch(self, factors, spatial_shape):
        """Host rebuild of cube_faint from cube_std + the PCA factors.

        ~MBs of factors replace a full-cube transfer; the rebuild agrees
        with the device's sequential subtractions to f32 re-summation
        order (~1e-6 relative), and spaxels outside every area are
        bit-equal to cube_std.
        """

        def fetch():
            from .recipes import apply_pca_factors

            std = self.orig.cube_std.data  # joins the std rebuild
            with _lane_timer("rebuild:cube_faint"):
                return apply_pca_factors(std, factors)

        def region(zsl, ysl, xsl):
            # windowed faint rebuild: the cube_std window (itself served
            # by whichever source is cheapest — device slice, wire
            # window, windowed host rebuild) minus the factor columns
            # that fall inside the window.  Per-voxel arithmetic matches
            # apply_pca_factors, so the window is bit-equal to slicing
            # the full rebuild.
            from .recipes import subtract_factors_region

            std_w, _, _ = self.orig.cube_std._region(zsl, ysl, xsl)
            faint = np.array(std_w, dtype=np.float32)
            ny, nx = spatial_shape
            y0, y1, _ = ysl.indices(ny)
            x0, x1, _ = xsl.indices(nx)
            with _lane_timer("rebuild:faint_window"):
                subtract_factors_region(
                    faint, factors, nx, zsl, y0, y1, x0, x1)
            return faint

        fetch.region = region
        return fetch

    # -- step 05 -----------------------------------------------------------
    def tglr(self, psf, wfields, profiles, pcut=1e-8, pmeansub=True, size=3):
        """GLR matched filter + local extrema, all device-resident.

        Returns (device dict, host dict with maxmap/minmap images).  The
        whole step — instrument-model precompute, spatial FSF stage,
        spectral sweep, masking, local extrema, max/min maps — runs as
        ONE compiled program (:func:`_tglr_fused`), so a high-latency
        host link pays a single dispatch instead of ~10 (the tight-memory
        mode keeps its separate chunked programs, whose interleaving is
        the point there).
        """
        faint = self.get("cube_faint")
        nz, ny, nx = faint.shape
        if wfields is None:
            psfs = np.asarray(psf, dtype=np.float32)
            if psfs.ndim == 3:
                psfs = psfs[None]
            wmaps = None
        else:
            psfs = np.stack([np.asarray(p, np.float32) for p in psf])
            wmaps = jnp.asarray(
                np.stack([np.asarray(w, np.float32) for w in wfields])
            )
        fshape2 = fft2_shape((ny, nx), psfs.shape[-2:])
        prepped = prepare_profiles(profiles, pcut=pcut, pmeansub=pmeansub)
        t_num, t_den, pad_left, _ = pack_profiles_toeplitz(
            prepped, block=min(128, nz)
        )
        mask = self.input_mask()
        # int16 index cube once the dictionary fits (the cast guard
        # mirrors toeplitz_sweep's uint8 -> int32 index widening)
        nprof = len(profiles)
        if nprof <= np.iinfo(np.uint8).max:
            prof_dtype = "uint8"  # the reference's in-memory dtype
        elif nprof <= np.iinfo(np.int16).max:
            prof_dtype = "int16"
        else:
            prof_dtype = None  # keep the kernel's int32 indices
        # fused Pallas kernels on TPU-family backends (ORIGIN_TPU_PALLAS=0
        # reverts to the XLA formulations); the fused spatial kernel wins
        # only in the bf16x3 throughput mode (docs/benchmarks.md) and
        # falls back to XLA when the field's factor matrices overflow VMEM
        from ..ops.pallas_spatial import spatial_pallas_fits

        prec = self._pallas_precision()
        sweep_pallas = self._use_pallas()
        fy, fxr = fshape2[0], fshape2[1] // 2 + 1
        spatial_pallas = (
            sweep_pallas
            and prec == "bf16x3"
            and spatial_pallas_fits(ny, nx, fy, fxr)
        )

        if self.tight_memory:
            # HBM cannot hold the precomputed FSF spectra bank: stream the
            # spatial stage over spectral slabs instead
            cube_fsf, norm_fsf = glr_spatial_chunked(
                faint, _upload_cached(psfs), wmaps, fshape2
            )
            if sweep_pallas:
                from ..ops.pallas_sweep import toeplitz_sweep_pallas

                correl, profile, correl_min = toeplitz_sweep_pallas(
                    cube_fsf, norm_fsf, _upload_cached(t_num),
                    _upload_cached(t_den), pad_left, nz, precision=prec,
                )
            else:
                correl, profile, correl_min = glr_spectral_mxu(
                    cube_fsf, norm_fsf, _upload_cached(t_num),
                    _upload_cached(t_den), pad_left, nz,
                )
            del cube_fsf, norm_fsf
            (correl, correl_min, profile, lmax, lmin,
             maxmap_d, minmap_d) = _mask_extrema(
                correl, correl_min, profile, mask, size,
                diag_bf16=self._diag_bf16(), prof_dtype=prof_dtype,
            )
        else:
            factors = {
                k: _upload_cached(v)
                for k, v in dft_spatial_factors(
                    ny, nx, fshape2, psfs.shape[-2:]
                ).items()
            }
            out = _tglr_fused(
                faint, mask, _upload_cached(psfs), wmaps,
                _upload_cached(t_num), _upload_cached(t_den), factors,
                fshape2=fshape2, pad_left=int(pad_left), nz=nz, size=size,
                spatial_pallas=spatial_pallas, sweep_pallas=sweep_pallas,
                prec=prec, diag_bf16=self._diag_bf16(), prof_dtype=prof_dtype,
            )
            (correl, correl_min, profile, lmax, lmin,
             maxmap_d, minmap_d) = out

        dev = dict(cube_correl=correl, cube_correl_min=correl_min,
                   cube_profile=profile, cube_local_max=lmax,
                   cube_local_min=lmin)
        maxmap, minmap = jax.device_get((maxmap_d, minmap_d))
        host = dict(maxmap=maxmap, minmap=minmap)
        return dev, host

    @staticmethod
    def correl_wire_fetch(dev):
        """Host materialization of ``cube_correl`` over an int16 wire.

        The device copy (and everything steps 06-10 compute from it)
        stays float32; only the HOST copy — session checkpoint and
        per-source cutouts — decodes from a 2-byte wire, halving the
        single transfer every step-11 consumer blocks on.  Decode error
        is ``max|T_GLR|/32766`` (<1e-3 absolute, three orders below the
        unit-variance statistic's noise floor).
        ``ORIGIN_TPU_CORREL_WIRE=f32`` opts back into the float32
        download.
        """
        import os

        if os.environ.get("ORIGIN_TPU_CORREL_WIRE", "int16").lower() in (
                "f32", "fp32", "float32"):
            return None
        return _int16_wire_fetch(dev)

    @staticmethod
    def profile_wire_fetch(dev, nprof):
        """Lossless bit-packed wire for the profile-index cube.

        Packs to 1/2/4 bits per voxel when the dictionary fits (the
        default 3-profile dictionary: 4 voxels/byte); larger
        dictionaries keep the dense download.  Returns None when packing
        does not apply."""
        for bits in (1, 2, 4):
            if nprof <= (1 << bits):
                return _packed_wire_fetch(dev, bits)
        return None

    # cube_correl_min is stored bfloat16 on device (its 8-bit mantissa
    # is coarser than the int16 quantization floor, so the wire loses
    # nothing) and only ever feeds the session file and diagnostic
    # plots: it shares the correl wire's behavior and opt-outs exactly
    diag_wire_fetch = correl_wire_fetch

    # -- step 08 -----------------------------------------------------------
    def minicubes(self, xs, ys, sg):
        """Gather (B, Nz, sg, sg) detection minicubes on device.

        Windows are cut straight from the resident raw cube / variance
        (clipped `dynamic_slice` + roll-into-alignment + out-of-field
        fill: data 0, variance inf — matching the host extraction's
        convention); nothing cube-sized crosses the link and no padded
        copy of the field is ever materialized (the previous
        whole-field pads were ~11 GB of transient HBM at north-star
        scale).  Fields smaller than the window fall back to one padded
        copy (`_mini_cache`).
        """
        cube = self.input_cube()
        var = self.input_var()
        _, ny, nx = cube.shape
        ys = jnp.asarray(np.asarray(ys, np.int32))
        xs = jnp.asarray(np.asarray(xs, np.int32))
        if ny >= sg and nx >= sg:
            return _gather_minicubes(cube, var, ys, xs, sg)
        if sg not in self._mini_cache:
            h = sg // 2
            pd = jnp.pad(cube, ((0, 0), (h, h), (h, h)))
            pv = jnp.pad(var, ((0, 0), (h, h), (h, h)),
                         constant_values=np.inf)
            # one padded pair at a time; on tight devices also drop the
            # unpadded uploads, which are redundant once pd/pv exist
            self._mini_cache.clear()
            self._mini_cache[sg] = (pd, pv)
            if self.tight_memory:
                self.drop_inputs("cube", "var")
        pd, pv = self._mini_cache[sg]
        return _gather_minicubes_padded(pd, pv, ys, xs, sg)

    # -- step 11 -----------------------------------------------------------
    def source_spectra(self, jobs_by_size, wcube_fn=None):
        """Batched device extraction of every source's spectra.

        ``jobs_by_size`` maps a cutout edge ``m`` to a list of job dicts
        (see :func:`origin_tpu.ops.spectra.batched_source_spectra`) whose
        ``y0``/``x0`` are window starts in FIELD coordinates (possibly
        negative near the border).  ``wcube_fn(m)`` returns the
        (Nz, m, m) PSF weight cube for that size, or None.

        Returns ``{source_id: {tag: spectrum}}``, or ``{}`` when the
        device inputs are unavailable (tight-memory sessions drop them
        after step 08) — callers then fall back to the host path.
        """
        if self.tight_memory:
            return {}
        from ..ops.spectra import batched_source_spectra

        cube = self.input_cube()
        var = self.input_var()
        mask = self.input_mask()
        out = {}
        # pad ONCE by the largest cutout's halo (window starts sit at
        # most m//2 out of field) and share the padded triple across
        # every size group — per-size full-edge pads re-ran three
        # cube-sized device programs per distinct mask size and
        # transiently doubled the halo.  The halo is quantized to
        # power-of-two tiers with a floor of 32 (covers masks up to
        # 63 px, i.e. the default 25 px plus two retry growths): the
        # padded shape keys every per-size kernel's compilation, and an
        # exact halo recompiled the whole family whenever one field's
        # retry ladder produced a larger mask than the previous field's
        need = max(int(m) for m in jobs_by_size) // 2 + 1
        h = 32
        while h < need:
            h *= 2
        pd = jnp.pad(cube, ((0, 0), (h, h), (h, h)))
        pv = jnp.pad(var, ((0, 0), (h, h), (h, h)),
                     constant_values=np.inf)
        pm = jnp.pad(mask, ((0, 0), (h, h), (h, h)),
                     constant_values=True)
        for m, jobs in sorted(jobs_by_size.items()):
            jobs = [dict(j, y0=int(j["y0"]) + h, x0=int(j["x0"]) + h)
                    for j in jobs]
            wcube = wcube_fn(m) if wcube_fn is not None else None
            out.update(batched_source_spectra(pd, pv, pm, jobs, wcube))
        return out

    # -- step 07 -----------------------------------------------------------
    def detections_above(self, name, threshold, gather=()):
        """Sparse (z, y, x) coordinates where ``name`` exceeds threshold.

        The cube stays on device: one scalar count comes back, then one
        fused stream-compaction program returns the flat indices and the
        gathered value vectors in the row-major (z, y, x) ordering of
        ``np.where``.  The capacity is bucketed to x4 tiers (256, 1024,
        4096, ...) so the program compiles once per tier, not once per
        detection count — survey fields routinely straddle power-of-two
        counts, and the padded rows are ~16 bytes each.
        """
        arr = self.get(name)
        extras = tuple(self.get(g) for g in gather)
        n = int(_count_above(arr, threshold))
        if n == 0:
            return self._unpack_sparse(None, 0, arr.shape, len(gather))
        cap = min(_bucket4(n, 256), arr.size)
        res = jax.device_get(_extract_above(arr, extras, threshold, cap))
        return self._unpack_sparse(res, n, arr.shape, len(gather))

    @staticmethod
    def _det_pair_key(spec1, spec2):
        (n1, t1, g1), (n2, t2, g2) = spec1, spec2
        return (n1, float(t1), tuple(g1), n2, float(t2), tuple(g2))

    def speculate_detections(self, spec1, spec2):
        """Dispatch step 07's speculative fetch ahead of the step.

        Called by step 06 the moment the thresholds are known: the
        count+compact program runs NOW and its (small) result starts
        crossing the link in the background, so a following
        :meth:`detections_above_pair` with the same specs joins an
        in-flight — usually already-arrived — transfer instead of paying
        a fresh round-trip at the top of step 07.  On a high-latency
        host link that round-trip IS most of the warm step-07 time (the
        reference's step does two in-memory ``np.where`` scans,
        reference steps.py:958-974, so it never pays one).  Best-effort:
        any failure just leaves the normal fetch path to run.
        """
        try:
            (name1, thr1, g1), (name2, thr2, g2) = spec1, spec2
            a1 = self.get(name1)
            a2 = self.get(name2)
            e1 = tuple(self.get(g) for g in g1)
            e2 = tuple(self.get(g) for g in g2)
        except Exception:  # pragma: no cover - defensive (missing product)
            self._spec_det = None
            return

        def job():
            # dispatch INSIDE the worker: on a cold process the program's
            # trace+compile would otherwise block step 06's main thread
            # for exactly the time this prefetch is meant to save
            return jax.device_get(_count_extract_above_pair(
                a1, e1, thr1, min(_SPEC_CAP, a1.size),
                a2, e2, thr2, min(_SPEC_CAP, a2.size),
            ))

        self._spec_det = (
            self._det_pair_key(spec1, spec2),
            _copy_pool().submit(job),
        )

    def detections_above_pair(self, spec1, spec2):
        """Sparse detections from two cubes in ONE device round-trip.

        Each spec is ``(name, threshold, gather_names)`` and each result
        matches :meth:`detections_above`.  Counts and capacity-bounded
        compactions of BOTH cubes come back in one speculative fetch;
        only a count overflowing the speculative capacity (4096 lines per
        cube) pays a second, exact-bucket fetch.  The device compute is
        microseconds — on a high-latency host link the round-trips ARE
        the step time (reference builds the same catalogs from two
        in-memory ``np.where`` scans, reference steps.py:958-974).  When
        step 06 pre-dispatched the same specs
        (:meth:`speculate_detections`), even that round-trip is already
        in flight and this just joins it.
        """
        name1, thr1, g1 = spec1
        name2, thr2, g2 = spec2
        a1 = self.get(name1)
        a2 = self.get(name2)
        e1 = tuple(self.get(g) for g in g1)
        e2 = tuple(self.get(g) for g in g2)
        # speculative single round-trip: counts + compactions at a fixed
        # capacity in ONE program.  The padded rows cost ~100 kB on the
        # wire — noise next to a link round-trip — and the capacity holds
        # every realistic per-threshold detection count; overflow falls
        # back to the exact-bucket pair fetch below
        sc1 = min(_SPEC_CAP, a1.size)
        sc2 = min(_SPEC_CAP, a2.size)
        res = None
        stash, self._spec_det = self._spec_det, None
        if stash is not None and stash[0] == self._det_pair_key(spec1, spec2):
            try:
                res = stash[1].result()
            except Exception:  # transfer failed: retry with a fresh fetch
                res = None
        if res is None:
            res = jax.device_get(
                _count_extract_above_pair(
                    a1, e1, thr1, sc1, a2, e2, thr2, sc2)
            )
        n1, n2, r1, r2 = res
        n1, n2 = int(n1), int(n2)
        if n1 <= sc1 and n2 <= sc2:
            return (
                self._unpack_sparse(r1, n1, a1.shape, len(g1)),
                self._unpack_sparse(r2, n2, a2.shape, len(g2)),
            )
        # shared capacity bucket while the counts are close (the program
        # cache stays keyed by one cap); per-side buckets when they differ
        # by more than one bucket step — the padded rows of the small side
        # are fetched over the link, so with very asymmetric counts the
        # wasted transfer would scale with the LARGE side's cap.  x4
        # tiers, as in detections_above
        b1 = _bucket4(max(n1, 1), 256)
        b2 = _bucket4(max(n2, 1), 256)
        if max(b1, b2) <= 4 * min(b1, b2):
            b1 = b2 = max(b1, b2)
        cap1 = min(b1, a1.size)
        cap2 = min(b2, a2.size)
        r1, r2 = jax.device_get(
            _extract_above_pair(a1, e1, thr1, cap1, a2, e2, thr2, cap2)
        )
        return (
            self._unpack_sparse(r1, n1, a1.shape, len(g1)),
            self._unpack_sparse(r2, n2, a2.shape, len(g2)),
        )

    @staticmethod
    def _unpack_sparse(res, n, shape, n_extras):
        if n == 0:
            empty = np.zeros(0, dtype=np.int64)
            return (empty,) * 3, np.zeros(0, np.float32), [
                np.zeros(0, np.float32) for _ in range(n_extras)
            ]
        fidx, vals, evals = res
        zyx = np.unravel_index(fidx[:n], shape)
        return (
            zyx,
            vals[:n],
            [e[:n] for e in evals],
        )


class MeshEngine(DeviceEngine):
    """DeviceEngine over a (1 x sp) ``jax.sharding.Mesh``.

    The interface is identical to :class:`DeviceEngine`, so the pipeline
    steps run unchanged; the front-end cubes live row-sharded over the
    mesh's ``sp`` axis (spec ``P(None, 'sp', None)``) and the per-step math
    distributes as:

    - step 01 (DCT/standardize/local max): the existing fused jit program
      on sharded inputs — the DCT solve is per-spaxel (no communication),
      the channel means become psums, and XLA's SPMD partitioner handles
      the ``reduce_window`` halo exchange natively;
    - step 04 (greedy PCA): areas sharded over devices with an on-device
      gather/scatter (parallel.pca.greedy_pca_mesh) — the realisation of
      the reference areamap's stated purpose (reference steps.py:496-499);
    - step 05 (GLR): explicit ``shard_map`` tiles with single-hop
      ``ppermute`` halo exchange for the spatial FSF convolution
      (parallel.mesh.glr_tile) — the one stage where auto-sharding would
      all-gather the field (the DFT mixes the sharded row axis);
    - steps 06/07 (purity counts, stream compaction): the single-chip jit
      programs on sharded inputs (global reductions become collectives).

    Numerics note: the sharded GLR computes each tile's spatial
    convolution on its own (halo-extended) DFT grid, so correl values
    match the single-chip kernel to float32 round-off (atol ~2e-3), not
    bit-for-bit; catalogs agree at matched thresholds except for values
    within round-off of a threshold.  Mosaic fieldmaps (``wfields``) are
    supported: each field's FSF convolves the field-weighted tile (same
    halo exchange) and the per-field results sum, as on a single chip.
    """

    def __init__(self, orig, mesh):
        if "sp" not in mesh.shape:
            raise ValueError("session mesh needs an 'sp' axis "
                             "(make_mesh(n, dp=1))")
        extra = {k: v for k, v in mesh.shape.items()
                 if k != "sp" and v != 1}
        if extra:
            raise ValueError(
                f"session mesh must be (1 x sp), got extra axes {extra}; "
                "a session processes one cube — use sharded_detect_batch "
                "for dp batches of cubes"
            )
        ny = orig.shape[1]
        self.sp = mesh.shape["sp"]
        if ny % self.sp != 0:
            raise ValueError(
                f"Ny={ny} must divide evenly over sp={self.sp} row shards"
            )
        self.mesh = mesh
        # row sharding divides every cube-sized product over sp devices, so
        # the per-device tight-memory headroom shrinks accordingly — set
        # BEFORE the parent's init, which decides the memory mode eagerly
        self.memory_shards = self.sp
        self._row = jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec(None, "sp", None)
        )
        self._glr_cache = {}
        super().__init__(orig)

    # -- inputs: device_put row-sharded -------------------------------------
    def _put_cube(self):
        return jax.device_put(
            np.asarray(self.orig.cube_raw, np.float32), self._row
        )

    def _put_var(self):
        return jax.device_put(
            np.asarray(self.orig.var, np.float32), self._row
        )

    def _put_mask(self):
        return jax.device_put(np.asarray(self.orig.mask), self._row)

    def _put_raw(self, arr):
        return jax.device_put(arr, self._row)

    def get(self, name):
        """Device array for a session product, row-sharded on (re-)upload."""
        obj = getattr(self.orig, name)
        if isinstance(obj, DeferredCube) and obj.device is not None:
            return obj.device
        dev = _wire_device_upload(
            obj,
            lambda a: jax.device_put(a, self._row),
            reshard=lambda x: jax.device_put(x, self._row),
        )
        if dev is not None:
            return dev
        host = obj.filled(0)
        if host.dtype == np.float64:
            host = host.astype(np.float32)
        if host.ndim == 3:
            return jax.device_put(host, self._row)
        return jnp.asarray(host)

    # -- step 04 -------------------------------------------------------------
    def greedy_pca_by_area(self, areamap, thresholds, testO2,
                           noise_population=50.0, itermax=100):
        """Area-parallel greedy PCA over the mesh (one jitted program)."""
        from ..parallel.pca import greedy_pca_mesh

        faint, mapO2, nstop = greedy_pca_mesh(
            self.mesh, self.get("cube_std"), areamap, thresholds, testO2,
            noise_population=noise_population, itermax=itermax,
        )
        return faint, mapO2, nstop, None  # mesh path keeps the dense fetch

    # -- step 05 -------------------------------------------------------------
    def tglr(self, psf, wfields, profiles, pcut=1e-8, pmeansub=True, size=3):
        """Sharded GLR matched filter + local extrema (shard_map tiles)."""
        from jax.sharding import PartitionSpec as P

        from ..ops.glr import pack_profiles_toeplitz, prepare_profiles
        from ..parallel.mesh import build_tile_spatial_op, glr_tile

        faint = self.get("cube_faint")
        mask = self.input_mask()
        nz, ny, nx = faint.shape
        if wfields is None:
            psfs = np.asarray(psf, dtype=np.float32)
            if psfs.ndim == 4:
                psfs = psfs[0]
            fields = [psfs]
            wtiles = None
        else:
            # mosaic: per-field FSFs convolve the field-weighted tile and
            # the results sum (single-chip semantics, glr_spatial_matmul)
            fields = [np.asarray(p, np.float32) for p in psf]
            wtiles = jax.device_put(
                np.stack([np.asarray(w, np.float32) for w in wfields]),
                jax.sharding.NamedSharding(
                    self.mesh, jax.sharding.PartitionSpec(None, "sp", None)
                ),
            )

        spatial_ops = []
        halo = 0
        for pf in fields:
            op, h = build_tile_spatial_op(pf, ny // self.sp, nx)
            spatial_ops.append(op)
            halo = max(halo, h)
        prepped = prepare_profiles(profiles, pcut=pcut, pmeansub=pmeansub)
        t_num, t_den, pad_left, _ = pack_profiles_toeplitz(
            prepped, block=min(128, nz)
        )

        # one compiled program per static configuration (jit caching is
        # keyed on the function object, so the closure must be reused)
        mosaic = wtiles is not None
        # the fused Pallas sweep runs per-device inside shard_map on real
        # TPU meshes, same kernel and precision mode as the single-chip
        # engine (CPU meshes use the XLA Toeplitz sweep)
        use_pallas = self._use_pallas()
        prec = self._pallas_precision()
        key = (int(pad_left), int(nz), int(size), int(halo), len(fields),
               mosaic, use_pallas, prec)
        if key not in self._glr_cache:
            row = P(None, "sp", None)
            img = P("sp", None)
            rep = P()
            op_spec = jax.tree.map(lambda _: rep, spatial_ops)
            out_specs = (row, row, row, row, row, img, img)

            if mosaic:
                @partial(
                    jax.shard_map, mesh=self.mesh,
                    in_specs=(row, row, op_spec, rep, rep,
                              P(None, "sp", None)),
                    out_specs=out_specs,
                    # vma checking cannot see through pallas_call
                    check_vma=not use_pallas,
                )
                def prog(faint, mask, ops, t_num, t_den, wt):
                    return glr_tile(
                        faint, mask, ops, t_num, t_den, pad_left, nz,
                        local_max_size=size, halo=halo, wtiles=wt,
                        use_pallas=use_pallas, precision=prec,
                    )
            else:
                @partial(
                    jax.shard_map, mesh=self.mesh,
                    in_specs=(row, row, op_spec, rep, rep),
                    out_specs=out_specs,
                    # vma checking cannot see through pallas_call
                    check_vma=not use_pallas,
                )
                def prog(faint, mask, ops, t_num, t_den):
                    return glr_tile(
                        faint, mask, ops, t_num, t_den, pad_left, nz,
                        local_max_size=size, halo=halo,
                        use_pallas=use_pallas, precision=prec,
                    )

            self._glr_cache[key] = jax.jit(prog)

        args = [faint, mask, jax.tree.map(_upload_cached, spatial_ops),
                _upload_cached(t_num), _upload_cached(t_den)]
        if mosaic:
            args.append(wtiles)
        out = self._glr_cache[key](*args)
        correl, correl_min, profile, lmax, lmin, maxmap, minmap = out

        dev = dict(cube_correl=correl, cube_correl_min=correl_min,
                   cube_profile=profile, cube_local_max=lmax,
                   cube_local_min=lmin)
        maxmap, minmap = jax.device_get((maxmap, minmap))
        host = dict(maxmap=maxmap, minmap=minmap)
        return dev, host
