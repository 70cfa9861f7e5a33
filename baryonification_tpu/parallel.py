"""Parallel orchestration.

Replaces the reference's joblib/loky process pools
(`/root/reference/BaryonForge/utils/Parallelize.py`):

- ``SimpleParallel``: run a list of runners (multi-model / multi-shell
  sweeps). The reference pickles runners into worker processes
  (`Parallelize.py:92-113`); here each runner is already device-parallel
  internally, so jobs execute sequentially on the local device (or can be
  dispatched round-robin across hosts by the caller). Output order is
  preserved.
- ``SplitJoinParallel``: shard ONE runner's halo catalog and sum the
  outputs (`Parallelize.py:116-321`), valid for painting because painting
  is additive. Like the reference, Baryonify* runners are rejected: the
  displacement -> regrid composition is nonlinear (`Parallelize.py:206-209`).
- ``mesh_shard_halos``: the TPU-native path — shard halo arrays over a
  `jax.sharding.Mesh` axis and psum partial maps/offset fields over ICI.
  For baryonification this is exact (offsets accumulate linearly *before*
  the single regrid, `HealpixRunner.py:331-333`), which is why the
  device-mesh path supports baryonify even though SplitJoinParallel
  cannot.
"""

import copy

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ['SimpleParallel', 'SplitJoinParallel', 'mesh_shard_halos',
           'mesh_cellmajor_shell']


class SimpleParallel:
    """Run a list of runners; returns outputs in input order."""

    def __init__(self, joblist, njobs=-1, verbose=True):
        self.joblist = joblist
        self.njobs = njobs  # accepted for API compatibility
        self.verbose = verbose

    def process(self):
        return [runner.process() for runner in self.joblist]


def _get_catalog(runner):
    if hasattr(runner, 'HaloLightConeCatalog'):
        return runner.HaloLightConeCatalog, 'HaloLightConeCatalog'
    return runner.HaloNDCatalog, 'HaloNDCatalog'


class SplitJoinParallel:
    """Split one runner's halo catalog into shards and sum the outputs.

    Only additive (painting) runners are allowed; a seeded shuffle
    balances the load like the reference (`Parallelize.py:252-255`).
    """

    def __init__(self, Runner, njobs=-1, seed=42, verbose=True):
        from .runners import (BaryonifyShell, BaryonifyGrid,
                              BaryonifySnapshot)
        txt = ("SplitJoinParallel can only be used for PaintProfiles "
               "runners: baryonification's displacement -> regrid step is "
               "nonlinear, so halo shards cannot be joined additively "
               "(use the device-mesh path instead, which psums the offset "
               "field before a single regrid).")
        assert not isinstance(Runner, (BaryonifyShell, BaryonifyGrid,
                                       BaryonifySnapshot)), txt
        self.Runner = Runner
        self.njobs = njobs if njobs > 0 else jax.device_count()
        self.seed = seed
        self.verbose = verbose

        cat, attr = _get_catalog(Runner)
        rng = np.random.default_rng(seed)
        order = rng.permutation(len(cat))
        shards = np.array_split(order, self.njobs)

        self.runner_list = []
        for s in shards:
            if s.size == 0:
                continue
            r = copy.copy(Runner)
            setattr(r, attr, cat[np.sort(s)])
            self.runner_list.append(r)

    def process(self):
        out = None
        for r in self.runner_list:
            res = r.process()
            out = res if out is None else out + res
        return out


def mesh_shard_halos(mesh, axis, halo_arrays):
    """Place halo columns sharded along ``axis`` of ``mesh``; scalars and
    maps stay replicated. Returns the sharded pytree.

    This is the building block for the multi-chip runner path: each device
    processes its halo shard against a replicated map, and partial results
    are combined with `jax.lax.psum` (painting, offset fields) — the exact
    additive-join contract of the reference's SplitJoinParallel
    (`Parallelize.py:297-319`) moved onto ICI collectives.
    """
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(
        lambda x: jax.device_put(x, sharding) if np.ndim(x) >= 1 else x,
        halo_arrays)


def mesh_cellmajor_shell(mesh, axis, nside, F, C_blk, n_hi, use_rdelta,
                         pix_planes, hid_dense, counts, packed,
                         gz, gM, table, lnr_grid, eps_max, orig_map):
    """Multi-chip shell baryonify: ONE bucket's cell-major displacement
    pass + conservative regrid, sharded over coarse CELLS.

    NESTED-ordered cells are disjoint sky patches, so the displacement
    pass is embarrassingly parallel: device d owns a contiguous cell
    range (its slice of the pixel planes, dense candidate matrix and
    counts), the per-halo ``packed`` records and the base table are
    replicated, and the per-pixel offsets come out sharded with NO
    communication. The regrid is the only cross-device step: each device
    redeposits its own pixels' mass (a 4-neighbor scatter that may cross
    the shard boundary) into a local full-sky partial map, and a single
    ``psum`` over the mesh joins them — the additive-join contract of
    the reference's SplitJoinParallel (`Parallelize.py:297-319`) riding
    ICI instead of pickled process results.

    pix_planes : (vx, vy, vz) nested-order (npix,) planes
    orig_map : (npix,) mass map in NESTED order (sharded by cell)
    Returns the new mass map (npix,) in RING order, fully replicated
    (the 4-neighbor redeposit targets are RING ids).
    """
    from .runners.shell_cellmajor import cellmajor_offsets_pass
    from .ops import healpix as hpx

    vx, vy, vz = pix_planes
    npix = vx.shape[0]
    n_dev = mesh.shape[axis]
    ncell = counts.shape[0]
    assert ncell % (n_dev * C_blk) == 0, (
        f"cells ({ncell}) must split evenly over {n_dev} devices in "
        f"chunks of {C_blk}")
    dt = orig_map.dtype
    rep = P()

    def step(vx_s, vy_s, vz_s, dense_s, counts_s, orig_s,
             packed_r, gz_r, gM_r, table_r, lnr_r):
        zero = jnp.zeros((counts_s.shape[0] * F,), dtype=dt)
        ox, oy, oz = cellmajor_offsets_pass(
            use_rdelta, F, C_blk, n_hi, vx_s, vy_s, vz_s,
            dense_s.reshape(-1), counts_s, packed_r, gz_r, gM_r,
            table_r, lnr_r, eps_max, zero, zero, zero)
        # local regrid of this shard's pixels into a full-sky partial
        x = vx_s + ox
        y = vy_s + oy
        z = vz_s + oz
        r = jnp.sqrt(x * x + y * y + z * z)
        theta = jnp.arccos(jnp.clip(z / r, -1.0, 1.0))
        phi = jnp.arctan2(y, x)
        phi = jnp.where(phi < 0, phi + 2 * jnp.pi, phi)
        ps, ws = hpx.get_interp_weights_parts(nside, theta, phi)
        # neighbor pixel ids are RING; convert the local nested mass to
        # ring targets via a full-size partial map
        idx = jnp.concatenate([p.astype(jnp.int32) for p in ps])
        contrib = jnp.concatenate([w.astype(dt) * orig_s for w in ws])
        partial = jnp.zeros((npix,), dtype=dt).at[idx].add(contrib)
        return jax.lax.psum(partial, axis)

    K_pad = hid_dense.shape[0] // ncell
    sharded = jax.shard_map(
        step, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), P(axis),
                  rep, rep, rep, rep, rep),
        out_specs=rep)
    return sharded(vx, vy, vz, hid_dense.reshape(ncell, K_pad), counts,
                   orig_map, packed, gz, gM, table, lnr_grid)
