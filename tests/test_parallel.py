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


class TestMeshCellMajor:
    def test_matches_single_device(self, cosmo):
        """Sharded cell-major baryonify == single-device cell-major
        (exact: disjoint cell shards + additive regrid join)."""
        import jax
        import jax.numpy as jnp
        from jax.sharding import Mesh
        from baryonification_tpu.ops import healpix as hpx
        from baryonification_tpu.runners import shell_gather as sg
        from baryonification_tpu.runners import shell_cellmajor as cm
        from baryonification_tpu.parallel import mesh_cellmajor_shell

        nside = 32
        nside_c = 8
        F = (nside // nside_c) ** 2
        npix = hpx.npix(nside)
        nc = hpx.npix(nside_c)
        rng = np.random.default_rng(9)
        H = 64
        theta = np.arccos(rng.uniform(-0.9, 0.9, H))
        phi = rng.uniform(0, 2 * np.pi, H)
        radius = rng.uniform(0.05, 0.25, H)
        a = 1 / (1 + rng.uniform(0.1, 0.5, H))
        D = rng.uniform(300, 1500, H)
        R_com = radius * D / a / 5.0        # eps_max = 5
        M = 10 ** rng.uniform(13.5, 14.5, H)

        # toy displacement table
        zg = jnp.asarray(np.log(1 + np.linspace(0.05, 0.6, 4)))
        Mg = jnp.asarray(np.log(np.geomspace(1e13, 1e15, 5)))
        rg = jnp.asarray(np.log(np.geomspace(1e-3, 50, 40)))
        tab = jnp.asarray(np.broadcast_to(
            0.02 * np.exp(rg) * np.exp(-0.25 * np.asarray(rg) ** 2),
            (4, 5, 40)).copy())

        cmap = jnp.asarray(hpx.ring2nest(nside_c, np.arange(nc)),
                           dtype=jnp.int32)
        hids, cell_start, K = sg.coarse_halo_index(
            nside_c, jnp.asarray(theta), jnp.asarray(phi),
            jnp.asarray(radius), dtype=jnp.float64, cell_map=cmap)
        K_pad = max(8, -(-K // 8) * 8)
        dense, counts = cm.dense_cell_candidates(nc, K_pad, hids,
                                                 cell_start)
        st = np.sin(theta)
        packed = cm.pack_halo_records(
            jnp.asarray(st * np.cos(phi)), jnp.asarray(st * np.sin(phi)),
            jnp.asarray(np.cos(theta)), jnp.asarray(D), jnp.asarray(a),
            jnp.asarray(R_com), jnp.asarray(np.log(R_com)),
            jnp.asarray(np.log(1 / a)), jnp.asarray(np.log(M)))

        n2r = hpx.nest2ring(nside, np.arange(npix))
        vx, vy, vz = hpx.pixel_vectors_soa(nside, dtype=jnp.float64)
        vxn, vyn, vzn = vx[n2r], vy[n2r], vz[n2r]
        omap_ring = jnp.asarray(rng.uniform(0.5, 1.5, npix))
        omap_nest = omap_ring[jnp.asarray(n2r)]

        # single device reference
        zero = jnp.zeros((npix,))
        ox, oy, oz = cm.cellmajor_offsets_pass(
            False, F, 4, 40, vxn, vyn, vzn, dense, counts, packed,
            zg, Mg, tab, rg, 5.0, zero, zero, zero)
        x = vxn + ox; y = vyn + oy; z = vzn + oz
        r = jnp.sqrt(x*x + y*y + z*z)
        th = jnp.arccos(jnp.clip(z / r, -1, 1))
        ph = jnp.arctan2(y, x)
        ph = jnp.where(ph < 0, ph + 2*np.pi, ph)
        ps, ws = hpx.get_interp_weights_parts(nside, th, ph)
        idx = jnp.concatenate([p.astype(jnp.int32) for p in ps])
        contrib = jnp.concatenate([w * omap_nest for w in ws])
        want = np.asarray(jnp.zeros((npix,)).at[idx].add(contrib))

        mesh = Mesh(np.array(jax.devices()), axis_names=("cells",))
        got = np.asarray(mesh_cellmajor_shell(
            mesh, "cells", nside, F, 4, 40, False,
            (vxn, vyn, vzn), dense, counts, packed, zg, Mg, tab, rg,
            5.0, omap_nest))
        np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)
        assert np.isclose(got.sum(), float(omap_ring.sum()))


class _StubDisp:
    """Minimal displacement-model stand-in: a toy (z, M, r) table."""

    p_keys = []
    Rdelta_sampling = False

    def __init__(self):
        zg = np.log(1 + np.linspace(0.05, 0.8, 4))
        Mg = np.log(np.geomspace(1e12, 1e16, 6))
        rg = np.log(np.geomspace(1e-3, 80, 48))
        d = 0.03 * np.exp(rg) * np.exp(-0.25 * rg**2)
        self._table = jnp.asarray(np.broadcast_to(d, (4, 6, 48)).copy())
        self._grids = tuple(map(jnp.asarray, (zg, Mg, rg)))


class _StubPaint:
    """Minimal tabulated-profile stand-in (log projected table)."""

    p_keys = []

    def __init__(self):
        zg = np.log(1 + np.linspace(0.05, 0.8, 4))
        Mg = np.log(np.geomspace(1e12, 1e16, 6))
        rg = np.log(np.geomspace(1e-3, 80, 48))
        prof = 5.0 - 2.0 * rg                # ln Sigma ~ r^-2 power law
        self._ln2D = jnp.asarray(np.broadcast_to(prof, (4, 6, 48)).copy())
        self._grids = tuple(map(jnp.asarray, (zg, Mg, rg)))


def _mesh_test_setup(seed=3, n_halo=96, nside=32):
    """Multi-bucket catalog (wide mass range -> several nside_c groups)
    + a random mass shell."""
    rng = np.random.default_rng(seed)
    ra = rng.uniform(0, 360, n_halo)
    dec = np.degrees(np.arcsin(rng.uniform(-0.95, 0.95, n_halo)))
    M = 10 ** rng.uniform(12.5, 15.5, n_halo)
    z = rng.uniform(0.1, 0.6, n_halo)
    cat = HaloLightConeCatalog(ra=ra, dec=dec, M=M, z=z, cosmo=COSMO_DICT)
    shell = LightconeShell(map=rng.uniform(0.5, 1.5, hpx.npix(nside)),
                           cosmo=COSMO_DICT)
    return cat, shell


class TestRunnerMesh:
    """BaryonifyShell / PaintProfilesShell with mesh= run the FULL
    multi-bucket process() sharded over cells and match single-device
    execution exactly (VERDICT r1 item 3)."""

    @pytest.fixture(scope="class")
    def mesh(self):
        return Mesh(np.array(jax.devices()), axis_names=("cells",))

    def test_baryonify_shell_mesh_matches(self, mesh):
        from baryonification_tpu import BaryonifyShell

        cat, shell = _mesh_test_setup()
        model = _StubDisp()
        single = BaryonifyShell(cat, shell, epsilon_max=10.0, model=model,
                                method="cellmajor", verbose=False)
        want = single.process()

        sharded = BaryonifyShell(cat, shell, epsilon_max=10.0, model=model,
                                 mesh=mesh, verbose=False)
        got = sharded.process()
        # identical per-cell arithmetic; only the regrid scatter order
        # differs (per-device partials + psum), so f64 agreement is tight
        np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)
        assert np.isclose(got.sum(), np.asarray(shell.map).sum())

    def test_baryonify_shell_mesh_multibucket(self, mesh):
        """The grouping must produce >= 2 coarse levels for this catalog
        (otherwise the multi-bucket claim is vacuous)."""
        from baryonification_tpu.runners.shell import _buckets_by_nsidec
        from baryonification_tpu.parallel import min_coarse_nside

        cat, shell = _mesh_test_setup()
        from baryonification_tpu.cosmology import Cosmology, MassDef
        cos = Cosmology.from_dict(COSMO_DICT)
        a = 1 / (1 + cat.cat['z'])
        R = np.asarray(MassDef(200, 'critical').get_radius(
            cos, cat.cat['M'], a))
        D = np.asarray(cos.angular_diameter_distance(a))
        nsc_min = min_coarse_nside(jax.device_count())
        groups = _buckets_by_nsidec(10.0 * R / D, 32, nsc_min)
        assert len(groups) >= 2

    def test_baryonify_shell_mesh_refined_matches(self, mesh):
        """Candidate refinement under mesh=: NESTED child blocks stay
        aligned with the parent cell shards, so the sharded refined
        branch must match single-device refined execution exactly."""
        from baryonification_tpu import BaryonifyShell

        nside = 128
        rng = np.random.default_rng(9)
        n_halo = 24
        ra = rng.uniform(0, 360, n_halo)
        dec = np.degrees(np.arcsin(rng.uniform(-0.9, 0.9, n_halo)))
        M = 10 ** rng.uniform(14.6, 15.4, n_halo)
        z = rng.uniform(0.06, 0.12, n_halo)
        cat = HaloLightConeCatalog(ra=ra, dec=dec, M=M, z=z,
                                   cosmo=COSMO_DICT)
        shell = LightconeShell(map=rng.uniform(0.5, 1.5,
                                               hpx.npix(nside)),
                               cosmo=COSMO_DICT)
        model = _StubDisp()
        single = BaryonifyShell(cat, shell, epsilon_max=20.0, model=model,
                                method="cellmajor", verbose=False)
        single.refine_k_min = 1
        want = single.process()
        assert any(v[3] > k[1] for k, v in single._dense_cache.items())

        sharded = BaryonifyShell(cat, shell, epsilon_max=20.0,
                                 model=model, mesh=mesh, verbose=False)
        sharded.refine_k_min = 1
        got = sharded.process()
        assert any(v[3] > k[1] for k, v in sharded._dense_cache.items())
        np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)
        assert np.isclose(got.sum(), np.asarray(shell.map).sum())

    def test_baryonify_grid_mesh_matches(self, mesh):
        """BaryonifyGrid with mesh=: Morton blocks shard over devices;
        must match single-device cell-major execution exactly."""
        from baryonification_tpu import (HaloNDCatalog, GriddedMap,
                                         BaryonifyGrid)
        rng = np.random.default_rng(31)
        N, L = 32, 80.0
        bins = (np.arange(N) + 0.5) * (L / N)
        n = 12
        cat = HaloNDCatalog(x=rng.uniform(0, L, n),
                            y=rng.uniform(0, L, n),
                            z=rng.uniform(0, L, n),
                            M=10 ** rng.uniform(13.8, 14.7, n),
                            redshift=0.25, cosmo=COSMO_DICT)
        gm = GriddedMap(map=rng.uniform(0.5, 1.5, (N, N, N)),
                        redshift=0.25, bins=bins, cosmo=COSMO_DICT)
        model = _StubDisp()
        want = BaryonifyGrid(cat, gm, epsilon_max=10, model=model,
                             method="cellmajor", verbose=False).process()
        got = BaryonifyGrid(cat, gm, epsilon_max=10, model=model,
                            mesh=mesh, verbose=False).process()
        np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)
        assert np.isclose(got.sum(), gm.map.sum())

    def test_paint_grid_mesh_matches(self, mesh, cosmo):
        from baryonification_tpu import (HaloNDCatalog, GriddedMap,
                                         PaintProfilesGrid)
        from baryonification_tpu.tabulate import TabulatedProfile
        from baryonification_tpu.profiles import Gas
        from test_profiles import PAR
        rng = np.random.default_rng(33)
        N, L = 32, 80.0
        bins = (np.arange(N) + 0.5) * (L / N)
        n = 10
        cat = HaloNDCatalog(x=rng.uniform(0, L, n),
                            y=rng.uniform(0, L, n),
                            z=rng.uniform(0, L, n),
                            M=10 ** rng.uniform(13.8, 14.6, n),
                            redshift=0.25, cosmo=COSMO_DICT)
        gm = GriddedMap(map=rng.uniform(0.5, 1.5, (N, N, N)),
                        redshift=0.25, bins=bins, cosmo=COSMO_DICT)
        gas = TabulatedProfile(Gas(**PAR), cosmo)
        gas.setup_interpolator(z_min=0.05, z_max=0.6, N_samples_z=4,
                               M_min=1e13, M_max=1e15, N_samples_Mass=6,
                               R_min=1e-3, R_max=70, N_samples_R=48)
        want = PaintProfilesGrid(cat, gm, epsilon_max=5, model=gas,
                                 method="cellmajor",
                                 verbose=False).process()
        got = PaintProfilesGrid(cat, gm, epsilon_max=5, model=gas,
                                mesh=mesh, verbose=False).process()
        np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)
        assert want.sum() > 0

    def test_baryonify_snapshot_mesh_matches(self, mesh):
        """BaryonifySnapshot with mesh=: cell-list cells shard over
        devices; displaced positions must match single-device."""
        from baryonification_tpu import (HaloNDCatalog, ParticleSnapshot,
                                         BaryonifySnapshot)
        rng = np.random.default_rng(37)
        L = 70.0
        n_part = 4000
        snap = ParticleSnapshot(x=rng.uniform(0, L, n_part),
                                y=rng.uniform(0, L, n_part),
                                z=rng.uniform(0, L, n_part),
                                M=np.ones(n_part), L=L, redshift=0.25,
                                cosmo=COSMO_DICT)
        cat = HaloNDCatalog(x=rng.uniform(0, L, 10),
                            y=rng.uniform(0, L, 10),
                            z=rng.uniform(0, L, 10),
                            M=10 ** rng.uniform(13.9, 14.7, 10),
                            redshift=0.25, cosmo=COSMO_DICT)
        model = _StubDisp()
        want = BaryonifySnapshot(cat, snap, epsilon_max=10, model=model,
                                 method="cellmajor",
                                 verbose=False).process()
        got = BaryonifySnapshot(cat, snap, epsilon_max=10, model=model,
                                mesh=mesh, verbose=False).process()
        moved = False
        for c in 'xyz':
            np.testing.assert_allclose(got[c], want[c], rtol=1e-12,
                                       atol=1e-12)
            moved = moved or not np.allclose(want[c], snap.cat[c])
        assert moved

    def test_paint_shell_mesh_matches(self, mesh):
        from baryonification_tpu import PaintProfilesShell

        cat, shell = _mesh_test_setup(seed=5)
        model = _StubPaint()
        single = PaintProfilesShell(cat, shell, epsilon_max=10.0,
                                    model=model, method="cellmajor",
                                    verbose=False)
        want = single.process()
        sharded = PaintProfilesShell(cat, shell, epsilon_max=10.0,
                                     model=model, mesh=mesh, verbose=False)
        got = sharded.process()
        np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)
        assert want.sum() > 0

    def test_baryonify_grid2d_mesh_matches(self, mesh):
        """2D flat-sky BaryonifyGrid with mesh= (Morton-2D block
        shards), WITH ellipticity: must match single-device cell-major
        execution exactly."""
        from baryonification_tpu import (HaloNDCatalog, GriddedMap,
                                         BaryonifyGrid)
        rng = np.random.default_rng(41)
        N, L = 64, 90.0
        bins = (np.arange(N) + 0.5) * (L / N)
        n = 14
        cat = HaloNDCatalog(x=rng.uniform(0, L, n),
                            y=rng.uniform(0, L, n),
                            M=10 ** rng.uniform(13.8, 14.7, n),
                            q_ell=rng.uniform(0.4, 0.9, n),
                            A_ell=rng.normal(size=(n, 2)),
                            redshift=0.25, cosmo=COSMO_DICT)
        gm = GriddedMap(map=rng.uniform(0.5, 1.5, (N, N)),
                        redshift=0.25, bins=bins, cosmo=COSMO_DICT)
        model = _StubDisp()
        want = BaryonifyGrid(cat, gm, epsilon_max=10, model=model,
                             use_ellipticity=True, method="cellmajor",
                             verbose=False).process()
        got = BaryonifyGrid(cat, gm, epsilon_max=10, model=model,
                            use_ellipticity=True, mesh=mesh,
                            verbose=False).process()
        np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)
        assert np.isclose(got.sum(), gm.map.sum())

    def test_paint_grid2d_mesh_matches(self, mesh, cosmo):
        from baryonification_tpu import (HaloNDCatalog, GriddedMap,
                                         PaintProfilesGrid)
        from baryonification_tpu.tabulate import TabulatedProfile
        from baryonification_tpu.profiles import Gas
        from test_profiles import PAR
        rng = np.random.default_rng(43)
        N, L = 64, 90.0
        bins = (np.arange(N) + 0.5) * (L / N)
        n = 10
        cat = HaloNDCatalog(x=rng.uniform(0, L, n),
                            y=rng.uniform(0, L, n),
                            M=10 ** rng.uniform(13.8, 14.6, n),
                            redshift=0.25, cosmo=COSMO_DICT)
        gm = GriddedMap(map=rng.uniform(0.5, 1.5, (N, N)),
                        redshift=0.25, bins=bins, cosmo=COSMO_DICT)
        gas = TabulatedProfile(Gas(**PAR), cosmo)
        gas.setup_interpolator(z_min=0.05, z_max=0.6, N_samples_z=4,
                               M_min=1e13, M_max=1e15, N_samples_Mass=6,
                               R_min=1e-3, R_max=70, N_samples_R=48)
        want = PaintProfilesGrid(cat, gm, epsilon_max=5, model=gas,
                                 method="cellmajor",
                                 verbose=False).process()
        got = PaintProfilesGrid(cat, gm, epsilon_max=5, model=gas,
                                mesh=mesh, verbose=False).process()
        np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)
        assert want.sum() > 0

    def test_mesh_rejects_non_cellmajor(self, mesh):
        from baryonification_tpu import BaryonifyShell

        cat, shell = _mesh_test_setup()
        with pytest.raises(ValueError, match="cell-major"):
            BaryonifyShell(cat, shell, epsilon_max=10.0, model=_StubDisp(),
                           mesh=mesh, method="scatter")


class TestMeshGradients:
    """Multi-chip gradients (VERDICT r3 directive 4): jax.grad through
    the sharded differentiable cores must match the single-device
    gradient — shard_map offset passes and the psum-joined regrid all
    have transpose rules, and the slot loops run with static trip
    counts."""

    @pytest.fixture(scope="class")
    def mesh(self):
        return Mesh(np.array(jax.devices()), axis_names=("cells",))

    def test_baryonify_shell_mesh_grad_matches(self, mesh):
        from baryonification_tpu import BaryonifyShell

        cat, shell = _mesh_test_setup()
        model = _StubDisp()
        # a fixed random weighting makes the scalar loss sensitive to
        # every pixel
        w = jnp.asarray(np.random.default_rng(5).normal(
            size=shell.map.shape))

        single = BaryonifyShell(cat, shell, epsilon_max=10.0, model=model,
                                method="cellmajor", verbose=False)
        sharded = BaryonifyShell(cat, shell, epsilon_max=10.0, model=model,
                                 mesh=mesh, verbose=False)

        loss_s = lambda t: jnp.sum(w * single.process_device(table=t))
        loss_m = lambda t: jnp.sum(w * sharded.process_device(table=t))

        val_s, g_s = jax.value_and_grad(loss_s)(model._table)
        val_m, g_m = jax.value_and_grad(loss_m)(model._table)
        assert np.isfinite(val_s)
        np.testing.assert_allclose(float(val_m), float(val_s),
                                   rtol=1e-12)
        g_s, g_m = np.asarray(g_s), np.asarray(g_m)
        assert np.abs(g_s).max() > 0
        np.testing.assert_allclose(g_m, g_s, rtol=1e-10,
                                   atol=1e-10 * np.abs(g_s).max())

    def test_paint_shell_mesh_grad_matches(self, mesh):
        cat, shell = _mesh_test_setup()
        model = _StubPaint()
        w = jnp.asarray(np.random.default_rng(6).normal(
            size=shell.map.shape))

        single = PaintProfilesShell(cat, shell, epsilon_max=10.0,
                                    model=model, method="cellmajor",
                                    verbose=False)
        sharded = PaintProfilesShell(cat, shell, epsilon_max=10.0,
                                     model=model, mesh=mesh,
                                     verbose=False)

        loss_s = lambda t: jnp.sum(w * single.process_device(table=t))
        loss_m = lambda t: jnp.sum(w * sharded.process_device(table=t))

        val_s, g_s = jax.value_and_grad(loss_s)(model._ln2D)
        val_m, g_m = jax.value_and_grad(loss_m)(model._ln2D)
        np.testing.assert_allclose(float(val_m), float(val_s),
                                   rtol=1e-12)
        g_s, g_m = np.asarray(g_s), np.asarray(g_m)
        assert np.abs(g_s).max() > 0
        np.testing.assert_allclose(g_m, g_s, rtol=1e-10,
                                   atol=1e-10 * np.abs(g_s).max())

    def test_baryonify_grid_mesh_grad_matches(self, mesh):
        """Multi-chip gradient through the sharded grid pipeline: the
        Morton-block offsets pass + the psum-joined CIC redeposit."""
        from baryonification_tpu import (HaloNDCatalog, GriddedMap,
                                         BaryonifyGrid)
        rng = np.random.default_rng(41)
        N, L = 32, 80.0
        bins = (np.arange(N) + 0.5) * (L / N)
        n = 12
        cat = HaloNDCatalog(x=rng.uniform(0, L, n),
                            y=rng.uniform(0, L, n),
                            z=rng.uniform(0, L, n),
                            M=10 ** rng.uniform(13.8, 14.7, n),
                            redshift=0.25, cosmo=COSMO_DICT)
        gm = GriddedMap(map=rng.uniform(0.5, 1.5, (N, N, N)),
                        redshift=0.25, bins=bins, cosmo=COSMO_DICT)
        model = _StubDisp()
        w = jnp.asarray(rng.normal(size=(N, N, N)))

        single = BaryonifyGrid(cat, gm, epsilon_max=10, model=model,
                               method="cellmajor", verbose=False)
        sharded = BaryonifyGrid(cat, gm, epsilon_max=10, model=model,
                                mesh=mesh, verbose=False)
        loss_s = lambda t: jnp.sum(w * single.process_device(table=t))
        loss_m = lambda t: jnp.sum(w * sharded.process_device(table=t))
        val_s, g_s = jax.value_and_grad(loss_s)(model._table)
        val_m, g_m = jax.value_and_grad(loss_m)(model._table)
        np.testing.assert_allclose(float(val_m), float(val_s),
                                   rtol=1e-12)
        g_s, g_m = np.asarray(g_s), np.asarray(g_m)
        assert np.abs(g_s).max() > 0
        np.testing.assert_allclose(g_m, g_s, rtol=1e-10,
                                   atol=1e-10 * np.abs(g_s).max())

    def test_baryonify_snapshot_mesh_grad_matches(self, mesh):
        """Multi-chip gradient through the sharded particle pass: a
        scalar of the displaced positions w.r.t. the table."""
        from baryonification_tpu import (HaloNDCatalog, ParticleSnapshot,
                                         BaryonifySnapshot)
        rng = np.random.default_rng(43)
        L = 70.0
        n_part = 4000
        snap = ParticleSnapshot(x=rng.uniform(0, L, n_part),
                                y=rng.uniform(0, L, n_part),
                                z=rng.uniform(0, L, n_part),
                                M=np.ones(n_part), L=L, redshift=0.25,
                                cosmo=COSMO_DICT)
        cat = HaloNDCatalog(x=rng.uniform(0, L, 10),
                            y=rng.uniform(0, L, 10),
                            z=rng.uniform(0, L, 10),
                            M=10 ** rng.uniform(13.9, 14.7, 10),
                            redshift=0.25, cosmo=COSMO_DICT)
        model = _StubDisp()
        w = tuple(jnp.asarray(rng.normal(size=n_part)) for _ in range(3))

        single = BaryonifySnapshot(cat, snap, epsilon_max=10, model=model,
                                   method="cellmajor", verbose=False)
        sharded = BaryonifySnapshot(cat, snap, epsilon_max=10,
                                    model=model, mesh=mesh, verbose=False)

        def mk_loss(r):
            def loss(t):
                x, y, z = r.process_device(table=t)
                return jnp.sum(w[0] * x + w[1] * y + w[2] * z)
            return loss

        val_s, g_s = jax.value_and_grad(mk_loss(single))(model._table)
        val_m, g_m = jax.value_and_grad(mk_loss(sharded))(model._table)
        np.testing.assert_allclose(float(val_m), float(val_s),
                                   rtol=1e-12)
        g_s, g_m = np.asarray(g_s), np.asarray(g_m)
        assert np.abs(g_s).max() > 0
        np.testing.assert_allclose(g_m, g_s, rtol=1e-10,
                                   atol=1e-10 * np.abs(g_s).max())

    def test_paint_anis_grid_mesh_grad_matches(self, mesh):
        """Multi-chip gradients for the density-dependent painter:
        grads of the sharded process_device w.r.t. BOTH the remap table
        and the canvas map must match single-device."""
        from test_profiles import PAR
        from baryonification_tpu import HaloNDCatalog, GriddedMap
        from baryonification_tpu.profiles import Gas, DarkMatter
        from baryonification_tpu.tabulate import TabulatedProfile
        from baryonification_tpu.runners import PaintProfilesAnisGrid
        from baryonification_tpu.cosmology import Cosmology

        cosmo = Cosmology.from_dict(COSMO_DICT)
        rng = np.random.default_rng(7)
        N, L = 32, 60.0
        bins = (np.arange(N) + 0.5) * (L / N)
        kw = dict(z_min=0.05, z_max=0.6, N_samples_z=4, M_min=1e13,
                  M_max=1e15, N_samples_Mass=8, R_min=1e-3, R_max=70,
                  N_samples_R=48)
        paint = TabulatedProfile(Gas(**PAR), cosmo)
        paint.setup_interpolator(**kw)
        canvas = TabulatedProfile(DarkMatter(**PAR), cosmo)
        canvas.setup_interpolator(**kw)
        n_h = 8
        cat = HaloNDCatalog(x=rng.uniform(5, 55, n_h),
                            y=rng.uniform(5, 55, n_h),
                            z=np.zeros(n_h),
                            M=10 ** rng.uniform(13.5, 14.8, n_h),
                            redshift=0.25, cosmo=COSMO_DICT)
        gm = GriddedMap(map=10 ** rng.uniform(12.0, 14.0, (N, N)),
                        redshift=0.25, bins=bins, cosmo=COSMO_DICT)
        rkw = dict(epsilon_max=3, Painting_model=paint,
                   Canvas_model=canvas, verbose=False)
        single = PaintProfilesAnisGrid(cat, gm, method="cellmajor",
                                       **rkw)
        sharded = PaintProfilesAnisGrid(cat, gm, method="cellmajor",
                                        mesh=mesh, mesh_axis="cells",
                                        **rkw)
        remap0 = single.build_remap_device()
        canvas0 = jnp.asarray(np.asarray(gm.map, dtype=np.float64))
        w = jnp.asarray(rng.normal(size=(N, N)))

        def mk_loss(r):
            return lambda t, c: jnp.sum(
                w * r.process_device(remap=t, canvas=c))

        val_s, g_s = jax.value_and_grad(mk_loss(single),
                                        argnums=(0, 1))(remap0, canvas0)
        val_m, g_m = jax.value_and_grad(mk_loss(sharded),
                                        argnums=(0, 1))(remap0, canvas0)
        np.testing.assert_allclose(float(val_m), float(val_s),
                                   rtol=1e-12)
        for a_s, a_m in zip(g_s, g_m):
            a_s, a_m = np.asarray(a_s), np.asarray(a_m)
            assert np.abs(a_s).max() > 0
            np.testing.assert_allclose(a_m, a_s, rtol=1e-10,
                                       atol=1e-10 * np.abs(a_s).max())


class TestMeshAnyDeviceCount:
    """Grid/snapshot mesh sharding must run on device counts that do NOT
    divide the cell/block axis (VERDICT r2 weak #5): the cell axis is
    zero-padded (pad_cells_for_mesh) instead of asserting divisibility.
    A 3-device mesh over 32^3 grids / cell lists never divides evenly."""

    @pytest.fixture(scope="class")
    def mesh3(self):
        assert jax.device_count() >= 3
        return Mesh(np.array(jax.devices()[:3]), axis_names=("cells",))

    def test_pad_cells_helper(self):
        from baryonification_tpu.parallel import pad_cells_for_mesh
        for ncell, n_dev, F in [(64, 3, 512), (512, 5, 64), (7, 6, 8),
                                (4096, 7, 4096), (1, 3, 16)]:
            ncell_pad, C_blk = pad_cells_for_mesh(ncell, n_dev, F)
            assert ncell_pad >= ncell
            assert ncell_pad % n_dev == 0
            assert (ncell_pad // n_dev) % C_blk == 0
            assert C_blk * F <= (1 << 18) or C_blk == 1

    def test_baryonify_grid_mesh3_matches(self, mesh3):
        from baryonification_tpu import (HaloNDCatalog, GriddedMap,
                                         BaryonifyGrid)
        rng = np.random.default_rng(41)
        N, L = 32, 80.0
        bins = (np.arange(N) + 0.5) * (L / N)
        n = 12
        cat = HaloNDCatalog(x=rng.uniform(0, L, n),
                            y=rng.uniform(0, L, n),
                            z=rng.uniform(0, L, n),
                            M=10 ** rng.uniform(13.8, 14.7, n),
                            redshift=0.25, cosmo=COSMO_DICT)
        gm = GriddedMap(map=rng.uniform(0.5, 1.5, (N, N, N)),
                        redshift=0.25, bins=bins, cosmo=COSMO_DICT)
        model = _StubDisp()
        want = BaryonifyGrid(cat, gm, epsilon_max=10, model=model,
                             method="cellmajor", verbose=False).process()
        got = BaryonifyGrid(cat, gm, epsilon_max=10, model=model,
                            mesh=mesh3, verbose=False).process()
        np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)
        assert np.isclose(got.sum(), gm.map.sum())

    def test_paint_grid_mesh3_matches(self, mesh3):
        from baryonification_tpu import (HaloNDCatalog, GriddedMap,
                                         PaintProfilesGrid)
        rng = np.random.default_rng(43)
        N, L = 32, 80.0
        bins = (np.arange(N) + 0.5) * (L / N)
        n = 10
        cat = HaloNDCatalog(x=rng.uniform(0, L, n),
                            y=rng.uniform(0, L, n),
                            z=rng.uniform(0, L, n),
                            M=10 ** rng.uniform(13.8, 14.6, n),
                            redshift=0.25, cosmo=COSMO_DICT)
        gm = GriddedMap(map=rng.uniform(0.5, 1.5, (N, N, N)),
                        redshift=0.25, bins=bins, cosmo=COSMO_DICT)
        model = _StubPaint()
        model._ln3D = model._ln2D       # 3D grids read the real table
        want = PaintProfilesGrid(cat, gm, epsilon_max=5, model=model,
                                 method="cellmajor",
                                 verbose=False).process()
        got = PaintProfilesGrid(cat, gm, epsilon_max=5, model=model,
                                mesh=mesh3, verbose=False).process()
        np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)
        assert want.sum() > 0

    def test_baryonify_snapshot_mesh3_matches(self, mesh3):
        from baryonification_tpu import (HaloNDCatalog, ParticleSnapshot,
                                         BaryonifySnapshot)
        rng = np.random.default_rng(47)
        L = 70.0
        n_part = 3000
        snap = ParticleSnapshot(x=rng.uniform(0, L, n_part),
                                y=rng.uniform(0, L, n_part),
                                z=rng.uniform(0, L, n_part),
                                M=np.ones(n_part), L=L, redshift=0.25,
                                cosmo=COSMO_DICT)
        cat = HaloNDCatalog(x=rng.uniform(0, L, 10),
                            y=rng.uniform(0, L, 10),
                            z=rng.uniform(0, L, 10),
                            M=10 ** rng.uniform(13.9, 14.7, 10),
                            redshift=0.25, cosmo=COSMO_DICT)
        model = _StubDisp()
        want = BaryonifySnapshot(cat, snap, epsilon_max=10, model=model,
                                 method="cellmajor",
                                 verbose=False).process()
        got = BaryonifySnapshot(cat, snap, epsilon_max=10, model=model,
                                mesh=mesh3, verbose=False).process()
        moved = False
        for c in 'xyz':
            np.testing.assert_allclose(got[c], want[c], rtol=1e-12,
                                       atol=1e-12)
            moved = moved or not np.allclose(want[c], snap.cat[c])
        assert moved

    def test_min_coarse_nside_rejects_impossible(self):
        from baryonification_tpu.parallel import min_coarse_nside
        assert min_coarse_nside(6) == 1
        assert min_coarse_nside(8) == 2
        with pytest.raises(ValueError, match="power-of-two"):
            min_coarse_nside(5)


class TestSplitJoinDevices:
    def test_round_robin_matches_single(self):
        """SplitJoinParallel with device round-robin still sums to the
        single-runner result (painting is additive)."""
        from baryonification_tpu import SplitJoinParallel, PaintProfilesShell

        cat, shell = _mesh_test_setup(seed=11, n_halo=48)
        model = _StubPaint()
        single = PaintProfilesShell(cat, shell, epsilon_max=10.0,
                                    model=model, method="cellmajor",
                                    verbose=False)
        want = single.process()
        par = SplitJoinParallel(
            PaintProfilesShell(cat, shell, epsilon_max=10.0, model=model,
                               method="cellmajor", verbose=False),
            njobs=4)
        got = par.process()
        np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-9)
