"""Mesh-sharded greedy PCA: the reference's area loop as device-parallel work.

The reference's areamap exists explicitly to "distribute the following steps
on multiple processes" (reference steps.py:496-499); its PCA area loop
(lib_origin.py:768-821) runs sequentially.  Here every area becomes one slot
of a padded (A, Nz, Ppad) batch:

- the column gather from the row-sharded standardized cube and the scatter
  back happen inside one jitted program, where XLA inserts the all-to-all
  collectives over the ICI;
- the slots are sharded over the mesh's ``sp`` axis and each device runs
  the fixed-shape greedy-PCA while-loop (ops.pca.greedy_pca) on its local
  slots under ``shard_map`` + ``vmap``, so a device stops iterating as soon
  as *its own* areas converge (no global per-iteration sync);
- padding slots carry an infinite threshold and an all-False validity mask,
  so their while-loops exit immediately and their out-of-bounds scatter
  indices are dropped.

Numerically identical to the sequential per-area loop: areas are disjoint
and each slot runs the very same kernel.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..ops.pca import _bucket, greedy_pca

__all__ = ["greedy_pca_mesh"]


def balance_slots(sizes, sp, slots_per_device):
    """Assign areas to slot positions so per-device work balances.

    ``shard_map`` deals slot axis blocks contiguously: device ``d`` runs
    slots ``[d*m, (d+1)*m)``.  Dealing areas in label order piles adjacent
    large areas onto one device; here the areas go largest-first to the
    least-loaded device (LPT scheduling, pixel count as the cost proxy).

    Returns ``slot_of_area``: area index (0-based) -> slot position.
    """
    order = np.argsort(sizes)[::-1]  # largest first
    load = np.zeros(sp, dtype=np.int64)
    used = np.zeros(sp, dtype=np.int64)
    slot_of_area = np.zeros(len(sizes), dtype=np.int64)
    for a in order:
        open_devs = np.nonzero(used < slots_per_device)[0]
        d = open_devs[np.argmin(load[open_devs])]
        slot_of_area[a] = d * slots_per_device + used[d]
        used[d] += 1
        load[d] += sizes[a]
    return slot_of_area


@partial(jax.jit, static_argnames=("mesh", "noise_population", "itermax"))
def _pca_mesh_program(cube_std, idx, valid, test, thres, mesh,
                      noise_population, itermax):
    nz = cube_std.shape[0]
    a_pad, p_pad = idx.shape
    row = NamedSharding(mesh, P(None, "sp", None))
    cube_std = jax.lax.with_sharding_constraint(cube_std, row)
    flat = cube_std.reshape(nz, -1)

    # gather the (padded) area columns; slots sharded over sp
    cols = jnp.take(flat, idx.reshape(-1), axis=1, mode="fill",
                    fill_value=0.0)
    cols = cols.reshape(nz, a_pad, p_pad).transpose(1, 0, 2)
    cols = jax.lax.with_sharding_constraint(
        cols, NamedSharding(mesh, P("sp", None, None))
    )

    def body(c, v, t, th):
        return jax.vmap(
            lambda ci, vi, ti, thi: greedy_pca(
                ci, vi, ti, thi, noise_population=noise_population,
                itermax=itermax,
            )
        )(c, v, t, th)

    # check_vma=False: the greedy-PCA while-loops initialize carries from
    # replicated constants, which the varying-axes checker would reject even
    # though every output is per-shard data
    faint, mapo2, nstop = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P("sp", None, None), P("sp", None), P("sp", None),
                  P("sp")),
        out_specs=(P("sp", None, None), P("sp", None), P("sp")),
        check_vma=False,
    )(cols, valid, test, thres)

    # scatter the cleaned columns back into the row-sharded cube; padding
    # columns carry out-of-bounds indices and are dropped
    scat = faint.transpose(1, 0, 2).reshape(nz, a_pad * p_pad)
    flat = flat.at[:, idx.reshape(-1)].set(scat, mode="drop")
    out = jax.lax.with_sharding_constraint(
        flat.reshape(cube_std.shape), row
    )
    return out, mapo2, nstop


def greedy_pca_mesh(mesh, cube_std, areamap, thresholds, testO2,
                    noise_population=50.0, itermax=100):
    """Run the greedy PCA of every area in parallel over the mesh.

    Parameters mirror DeviceEngine.greedy_pca_by_area: ``cube_std`` is a
    (row-sharded) device array, ``areamap`` a host (Ny, Nx) label map,
    ``thresholds``/``testO2`` the per-area O2 thresholds and test vectors.

    Returns (cube_faint device array (row-sharded), mapO2 host int32 image,
    nstop int).
    """
    sp = mesh.shape["sp"]
    areamap = np.asarray(areamap)
    spatial_shape = areamap.shape
    npix_tot = int(np.prod(spatial_shape))
    nb_area = int(areamap.max())

    sels = []
    for area in range(1, nb_area + 1):
        (sel,) = np.nonzero((areamap == area).ravel())
        sels.append(sel)
    sizes = [len(s) for s in sels if len(s)]
    if not sizes:
        return cube_std, np.zeros(spatial_shape, np.int32), 0
    p_pad = _bucket(max(sizes))
    a_pad = -(-max(1, nb_area) // sp) * sp  # ceil to a multiple of sp
    # shard_map blocks the slot axis contiguously over sp: balance the
    # per-device pixel load instead of dealing areas in label order
    slot_of_area = balance_slots(
        [len(s) for s in sels], sp, a_pad // sp
    )

    idx = np.full((a_pad, p_pad), npix_tot, dtype=np.int32)  # OOB = padding
    valid = np.zeros((a_pad, p_pad), dtype=bool)
    test = np.zeros((a_pad, p_pad), dtype=np.float32)
    thres = np.full(a_pad, np.inf, dtype=np.float32)
    for a, sel in enumerate(sels):
        n = len(sel)
        if n == 0:
            continue
        s = slot_of_area[a]
        idx[s, :n] = sel
        valid[s, :n] = True
        test[s, :n] = np.asarray(testO2[a], dtype=np.float32)
        thres[s] = float(thresholds[a])

    faint, mapo2, nstop = _pca_mesh_program(
        cube_std, jnp.asarray(idx), jnp.asarray(valid), jnp.asarray(test),
        jnp.asarray(thres), mesh, float(noise_population), int(itermax),
    )

    mapo2, nstop = jax.device_get((mapo2, nstop))  # one batched fetch
    mapO2 = np.zeros(spatial_shape, dtype=np.int32)
    flatmap = mapO2.ravel()
    for a, sel in enumerate(sels):
        flatmap[sel] = mapo2[slot_of_area[a], : len(sel)]
    # padding slots never iterate (all-False validity, +inf threshold),
    # so summing every slot counts exactly the real areas' bail-outs
    return faint, mapO2, int(nstop.sum())
