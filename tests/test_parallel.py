"""Parallel orchestration tests: SimpleParallel + device-mesh sharding.

The conftest forces an 8-device virtual CPU mesh, so the shard_map path is
exercised for real (psum over the halo axis).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from baryonification_tpu import (HaloLightConeCatalog, LightconeShell,
                                 PaintProfilesShell)
from baryonification_tpu.parallel import SimpleParallel, mesh_shard_halos
from baryonification_tpu.ops import healpix as hpx
from baryonification_tpu.runners.shell import (_accumulate_shell_offsets,
                                               _regrid_shell)

COSMO_DICT = dict(Omega_m=0.3, Omega_b=0.05, h=0.7, sigma8=0.8, n_s=0.96,
                  w0=-1.0)


class TestSimpleParallel:
    def test_order_preserved(self):
        class FakeRunner:
            def __init__(self, v):
                self.v = v

            def process(self):
                return self.v

        out = SimpleParallel([FakeRunner(i) for i in range(5)]).process()
        assert out == [0, 1, 2, 3, 4]


class TestMeshShardHalos:
    def test_sharded_placement(self):
        mesh = Mesh(np.array(jax.devices()), axis_names=("halos",))
        arrs = dict(M=np.arange(16.0), theta=np.arange(16.0), a=0.5)
        out = mesh_shard_halos(mesh, "halos", arrs)
        assert out["a"] == 0.5
        assert out["M"].sharding.spec == P("halos")


class TestMeshBaryonify:
    def test_sharded_equals_single_device(self):
        """Halo-sharded offsets + psum + replicated regrid == the
        single-device result (the SplitJoinParallel additive-join contract
        over ICI)."""
        from jax import shard_map

        nside = 8
        n_dev = jax.device_count()
        n_halo = 8 * n_dev
        rng = np.random.default_rng(0)

        theta = np.arccos(rng.uniform(-0.8, 0.8, n_halo))
        phi = rng.uniform(0, 2 * np.pi, n_halo)
        M = 10 ** rng.uniform(13.5, 14.5, n_halo)
        a = 1 / (1 + rng.uniform(0.1, 0.5, n_halo))

        from baryonification_tpu.cosmology import Cosmology, MassDef
        cos = Cosmology.from_dict(COSMO_DICT)
        mdef = MassDef(200, 'critical')
        R_com = np.asarray(mdef.get_radius(cos, M, a)) / a
        D = np.asarray(cos.angular_diameter_distance(a))

        zg = np.log(1 + np.linspace(0.05, 0.8, 4))
        Mg = np.log(np.geomspace(1e13, 1e15, 5))
        rg = np.log(np.geomspace(1e-3, 50, 32))
        d_tab = 0.05 * np.exp(rg) * np.exp(-0.5 * rg**2 / 4)
        table = jnp.asarray(np.broadcast_to(d_tab, (4, 5, 32)).copy())
        grids = tuple(map(jnp.asarray, (zg, Mg, rg)))

        rt = hpx.RingTables(nside, dtype=jnp.float64)
        vx, vy, vz = hpx.pixel_vectors_soa(nside, dtype=jnp.float64)
        npix = hpx.npix(nside)
        orig_map = jnp.asarray(rng.uniform(0.5, 1.5, npix))
        args = tuple(map(jnp.asarray, (theta, phi, M, a, R_com, D,
                                       np.zeros((n_halo, 0)))))

        # single device
        z0 = jnp.zeros((npix,))
        offsets = _accumulate_shell_offsets(
            nside, 6, 8, 0, False, rt, vx, vy, vz, grids, table, 20.0,
            *args, (z0, z0, z0))
        want = np.asarray(_regrid_shell(nside, rt, vx, vy, vz, orig_map,
                                        offsets))

        # sharded
        mesh = Mesh(np.array(jax.devices()), axis_names=("halos",))

        def step(*a):
            halo_args, omap = a[:-1], a[-1]
            zv = jax.lax.pcast(jnp.zeros((npix,)), ('halos',),
                               to='varying')
            offs = _accumulate_shell_offsets(
                nside, 6, 8, 0, False, rt, vx, vy, vz, grids, table, 20.0,
                *halo_args, (zv, zv, zv))
            offs = jax.lax.psum(offs, "halos")
            return _regrid_shell(nside, rt, vx, vy, vz, omap, offs)

        sharded = shard_map(step, mesh=mesh,
                            in_specs=tuple([P("halos")] * 7) + (P(),),
                            out_specs=P())
        got = np.asarray(jax.jit(sharded)(*args, orig_map))

        np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)
        assert np.isclose(got.sum(), float(orig_map.sum()))
