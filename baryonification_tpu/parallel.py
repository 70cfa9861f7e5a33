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
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ['SimpleParallel', 'SplitJoinParallel', 'mesh_shard_halos']


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
