"""End-to-end runner tests: shell/grid/snapshot baryonify + painting.

Strategy (SURVEY.md section 4): mass conservation asserts, physical
invariants (mass moves outward around halos), and a brute-force numpy
re-implementation of the shell algorithm to cross-check the vectorized
kernels at small NSIDE.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from baryonification_tpu import (Cosmology, HaloLightConeCatalog,
                                 HaloNDCatalog, LightconeShell, GriddedMap,
                                 ParticleSnapshot)
from baryonification_tpu.cosmology import MassDef
from baryonification_tpu.displacement import Baryonification3D, Baryonification2D
from baryonification_tpu.profiles import DarkMatterOnly, DarkMatterBaryon, Gas
from baryonification_tpu.runners import (BaryonifyShell, PaintProfilesShell,
                                         BaryonifyGrid, PaintProfilesGrid,
                                         BaryonifySnapshot)
from baryonification_tpu.tabulate import TabulatedProfile
from baryonification_tpu.ops import healpix as hpx

from test_profiles import PAR

COSMO_DICT = dict(Omega_m=0.3, Omega_b=0.05, h=0.7, sigma8=0.8, n_s=0.96,
                  w0=-1.0)


@pytest.fixture(scope="module")
def displ2d(cosmo):
    model = Baryonification2D(DarkMatterOnly(**PAR), DarkMatterBaryon(**PAR),
                              cosmo, epsilon_max=20)
    model.setup_interpolator(z_min=0.05, z_max=0.6, N_samples_z=4,
                             M_min=1e13, M_max=1e15, N_samples_Mass=6,
                             R_min=1e-3, R_max=70, N_samples_R=64)
    return model


@pytest.fixture(scope="module")
def displ3d(cosmo):
    model = Baryonification3D(DarkMatterOnly(**PAR), DarkMatterBaryon(**PAR),
                              cosmo, epsilon_max=20)
    model.setup_interpolator(z_min=0.05, z_max=0.6, N_samples_z=4,
                             M_min=1e13, M_max=1e15, N_samples_Mass=6,
                             R_min=1e-3, R_max=70, N_samples_R=64)
    return model


@pytest.fixture(scope="module")
def shell_setup():
    nside = 32
    rng = np.random.default_rng(11)
    n_halo = 25
    ra = rng.uniform(0, 360, n_halo)
    dec = np.degrees(np.arcsin(rng.uniform(-0.8, 0.8, n_halo)))
    M = 10 ** rng.uniform(13.6, 14.8, n_halo)
    z = rng.uniform(0.15, 0.45, n_halo)
    cat = HaloLightConeCatalog(ra=ra, dec=dec, M=M, z=z, cosmo=COSMO_DICT)
    mass_map = rng.uniform(0.5, 1.5, hpx.npix(nside))
    shell = LightconeShell(map=mass_map, cosmo=COSMO_DICT)
    return cat, shell


class TestBaryonifyShell:
    def test_conservation_and_change(self, shell_setup, displ2d):
        cat, shell = shell_setup
        runner = BaryonifyShell(cat, shell, epsilon_max=20, model=displ2d)
        new_map = runner.process()
        assert new_map.shape == shell.map.shape
        assert np.isclose(new_map.sum(), shell.map.sum(), rtol=1e-8)
        assert not np.allclose(new_map, shell.map)

    def test_matches_bruteforce(self, shell_setup, displ2d, cosmo):
        """Cross-check the vectorized kernel against a direct numpy
        re-implementation of the same algorithm."""
        cat, shell = shell_setup
        nside = shell.NSIDE
        npix = hpx.npix(nside)
        runner = BaryonifyShell(cat, shell, epsilon_max=20, model=displ2d,
                                n_buckets=3)
        got = runner.process()

        # ---- brute force ----
        mdef = MassDef(200, 'critical')
        centers = np.asarray(hpx.pix2vec(nside, np.arange(npix)))
        offsets = np.zeros((npix, 3))
        for j in range(len(cat)):
            M_j = cat.cat['M'][j]
            z_j = cat.cat['z'][j]
            a_j = 1 / (1 + z_j)
            R_j = float(mdef.get_radius(cosmo, M_j, a_j))
            D_j = float(cosmo.angular_diameter_distance(a_j))
            th, ph = np.asarray(hpx.radec2ang(cat.cat['ra'][j],
                                              cat.cat['dec'][j]))
            v0 = np.asarray(hpx.ang2vec(jnp.asarray(th), jnp.asarray(ph)))
            radius = 20 * R_j / D_j
            sel = np.where(centers @ v0 >= np.cos(radius))[0]
            if sel.size < 4:
                sel = np.asarray(hpx.get_interp_weights(
                    nside, jnp.asarray(th), jnp.asarray(ph))[0])
            pos = centers[sel] * D_j
            diff = pos - v0 * D_j
            r_sep = np.sqrt(np.sum(diff**2, axis=1))
            d = np.asarray(displ2d.displacement(r_sep / a_j, M_j, a_j)) * a_j
            off = d[:, None] * diff / r_sep[:, None]
            off = np.where(np.isfinite(off), off, 0)
            nw = pos + off
            nw = nw / np.linalg.norm(nw, axis=1)[:, None]
            offsets[sel] += nw - centers[sel]

        new_vec = centers + offsets
        thn, phn = np.asarray(hpx.vec2ang(jnp.asarray(new_vec)))
        cpix, w = hpx.get_interp_weights(nside, jnp.asarray(thn),
                                         jnp.asarray(phn))
        want = np.zeros(npix)
        np.add.at(want, np.asarray(cpix).reshape(-1),
                  (np.asarray(w) * shell.map[:, None]).reshape(-1))

        rms = np.sqrt(np.mean((got - want) ** 2)) / shell.map.mean()
        assert rms < 1e-10, rms


class TestGatherScatterParity:
    def test_baryonify_methods_agree(self, shell_setup, displ2d):
        """Pixel-major (gather) and halo-major (scatter) paths produce the
        same map (up to the tiny-halo fallback convention)."""
        cat, shell = shell_setup
        m_sc = BaryonifyShell(cat, shell, epsilon_max=20, model=displ2d,
                              method="scatter", verbose=False).process()
        m_ga = BaryonifyShell(cat, shell, epsilon_max=20, model=displ2d,
                              method="gather", verbose=False).process()
        assert np.isclose(m_ga.sum(), shell.map.sum(), rtol=1e-8)
        scale = np.abs(m_sc - shell.map).max()
        np.testing.assert_allclose(m_ga, m_sc, atol=1e-6 * max(scale, 1e-30),
                                   rtol=1e-6)

    def test_baryonify_cellmajor_agrees(self, shell_setup, displ2d):
        """Cell-major (NESTED dense, matmul-blended, hat readout) path
        matches the halo-major scatter path."""
        cat, shell = shell_setup
        m_sc = BaryonifyShell(cat, shell, epsilon_max=20, model=displ2d,
                              method="scatter", verbose=False).process()
        m_cm = BaryonifyShell(cat, shell, epsilon_max=20, model=displ2d,
                              method="cellmajor", verbose=False).process()
        assert np.isclose(m_cm.sum(), shell.map.sum(), rtol=1e-8)
        scale = np.abs(m_sc - shell.map).max()
        np.testing.assert_allclose(m_cm, m_sc, atol=1e-6 * max(scale, 1e-30),
                                   rtol=1e-6)

    def test_paint_cellmajor_agrees(self, shell_setup, cosmo):
        from baryonification_tpu.profiles import Gas
        from baryonification_tpu.tabulate import TabulatedProfile
        cat, shell = shell_setup
        gas = TabulatedProfile(Gas(**PAR), cosmo)
        gas.setup_interpolator(z_min=0.05, z_max=0.6, N_samples_z=4,
                               M_min=1e13, M_max=1e15, N_samples_Mass=6,
                               R_min=1e-3, R_max=70, N_samples_R=48)
        p_sc = PaintProfilesShell(cat, shell, epsilon_max=5, model=gas,
                                  method="scatter", verbose=False).process()
        p_cm = PaintProfilesShell(cat, shell, epsilon_max=5, model=gas,
                                  method="cellmajor",
                                  verbose=False).process()
        np.testing.assert_allclose(p_cm, p_sc, rtol=1e-6,
                                   atol=1e-9 * p_sc.max())

    def test_baryonify_rdelta_cellmajor_agrees(self, shell_setup, cosmo):
        """Rdelta_sampling (Arico-style r/R_Delta radial axis,
        `BaryonCorrection.py:286-306`) through the cell-major and
        scatter paths."""
        from baryonification_tpu.displacement import Baryonification2D
        from baryonification_tpu.profiles import (DarkMatterOnly,
                                                  DarkMatterBaryon)
        cat, shell = shell_setup
        model = Baryonification2D(DarkMatterOnly(**PAR),
                                  DarkMatterBaryon(**PAR), cosmo,
                                  epsilon_max=20)
        model.setup_interpolator(z_min=0.1, z_max=0.6, N_samples_z=2,
                                 M_min=1e13, M_max=1e15, N_samples_Mass=4,
                                 R_min=1e-2, R_max=30, N_samples_R=48,
                                 Rdelta_sampling=True)
        assert model.Rdelta_sampling
        m_sc = BaryonifyShell(cat, shell, epsilon_max=20, model=model,
                              method="scatter", verbose=False).process()
        m_cm = BaryonifyShell(cat, shell, epsilon_max=20, model=model,
                              method="cellmajor", verbose=False).process()
        assert np.isclose(m_cm.sum(), shell.map.sum(), rtol=1e-8)
        scale = np.abs(m_sc - shell.map).max()
        assert scale > 0
        np.testing.assert_allclose(m_cm, m_sc, atol=1e-6 * scale,
                                   rtol=1e-6)

    def test_refine_candidates_superset(self):
        """Refined child-cell candidate lists must remain supersets of
        the halos that can reach ANY fine pixel in the child cell (the
        correctness contract of refine_cell_candidates)."""
        from baryonification_tpu.runners import shell_gather as sg
        from baryonification_tpu.runners import shell_cellmajor as cm

        nside, nsc_p, nsc_c = 64, 4, 8
        rng = np.random.default_rng(3)
        H = 40
        theta = np.arccos(rng.uniform(-1, 1, H))
        phi = rng.uniform(0, 2 * np.pi, H)
        radius = rng.uniform(0.05, 0.25, H)

        # parent registration in NESTED cell order (as the runner does)
        cmap = jnp.asarray(hpx.ring2nest(nsc_p,
                                         np.arange(hpx.npix(nsc_p))),
                           dtype=jnp.int32)
        hids, cell_start, K = sg.coarse_halo_index(
            nsc_p, jnp.asarray(theta), jnp.asarray(phi),
            jnp.asarray(radius), dtype=jnp.float64,
            r_max=float(radius.max()), cell_map=cmap)
        K_pad = max(64, -(-int(K) // 64) * 64)
        dense, counts = cm.dense_cell_candidates(
            hpx.npix(nsc_p), K_pad, hids, cell_start)

        # child centers (NESTED) + reach
        rt = hpx.RingTables(nsc_c, dtype=jnp.float64)
        n2r_c = hpx.nest2ring_all(nsc_c)
        cvx, cvy, cvz = hpx.pixel_planes_device(
            nsc_c, rt.z, rt.start, rt.npr, rt.shift, p=n2r_c)
        st = np.sin(theta)
        hvx, hvy, hvz = (st * np.cos(phi), st * np.sin(phi),
                         np.cos(theta))
        reach = radius + sg.MARGIN * hpx.nside2resol(nsc_c)
        hrec = jnp.stack([jnp.asarray(hvx), jnp.asarray(hvy),
                          jnp.asarray(hvz),
                          jnp.cos(jnp.asarray(reach))]
                         + [jnp.zeros(H)] * 4, axis=-1)
        dense_c, counts_c, K_c = cm.refine_cell_candidates(
            hpx.npix(nsc_c), dense, counts, cvx, cvy, cvz, hrec)
        dense_c = np.asarray(dense_c)
        counts_c = np.asarray(counts_c)

        # brute force: fine pixels of each child cell vs every halo
        f = nside // nsc_c
        n2r_f = np.asarray(hpx.nest2ring_all(nside))
        th_f, ph_f = map(np.asarray,
                         hpx.pix2ang(nside, jnp.arange(hpx.npix(nside))))
        stf = np.sin(th_f)
        vf = np.stack([stf * np.cos(ph_f), stf * np.sin(ph_f),
                       np.cos(th_f)], axis=-1)
        hv = np.stack([hvx, hvy, hvz], axis=-1)
        missing = 0
        for c in range(hpx.npix(nsc_c)):
            fine = vf[n2r_f[c * f * f:(c + 1) * f * f]]
            # halos reaching any fine pixel center of this cell
            reach_h = np.where(
                (fine @ hv.T >= np.cos(radius)[None, :]).any(axis=0))[0]
            listed = set(dense_c[c, :counts_c[c]].tolist())
            missing += len(set(reach_h.tolist()) - listed)
        assert missing == 0

    def test_baryonify_cellmajor_refined_agrees(self, displ2d):
        """End-to-end: candidate refinement (pass runs one level finer
        than the registration) leaves the baryonified map unchanged vs
        the scatter reference path."""
        nside = 128
        rng = np.random.default_rng(5)
        n_halo = 30
        ra = rng.uniform(0, 360, n_halo)
        dec = np.degrees(np.arcsin(rng.uniform(-0.9, 0.9, n_halo)))
        M = 10 ** rng.uniform(14.5, 14.95, n_halo)
        z = rng.uniform(0.06, 0.15, n_halo)
        cat = HaloLightConeCatalog(ra=ra, dec=dec, M=M, z=z,
                                   cosmo=COSMO_DICT)
        shell = LightconeShell(map=rng.uniform(0.5, 1.5,
                                               hpx.npix(nside)),
                               cosmo=COSMO_DICT)
        m_sc = BaryonifyShell(cat, shell, epsilon_max=20, model=displ2d,
                              method="scatter", verbose=False).process()
        r_cm = BaryonifyShell(cat, shell, epsilon_max=20, model=displ2d,
                              method="cellmajor", verbose=False)
        r_cm.refine_k_min = 1      # force refinement at this small scale
        m_cm = r_cm.process()
        # confirm the refined path actually ran (some bucket refined)
        assert any(nsc_eff > nsc_reg for (_, nsc_reg, _), (_, _, _, nsc_eff)
                   in r_cm._dense_cache.items())
        assert np.isclose(m_cm.sum(), shell.map.sum(), rtol=1e-8)
        scale = np.abs(m_sc - shell.map).max()
        assert scale > 0
        np.testing.assert_allclose(m_cm, m_sc, atol=1e-6 * scale,
                                   rtol=1e-6)

    def test_baryonify_cellmajor_low_memory_agrees(self, displ2d):
        """low_memory mode (huge dense-candidate matrices recomputed per
        call instead of device-cached) is bit-identical to the default
        across repeated process() calls."""
        nside = 64
        rng = np.random.default_rng(11)
        n_halo = 25
        cat = HaloLightConeCatalog(
            ra=rng.uniform(0, 360, n_halo),
            dec=np.degrees(np.arcsin(rng.uniform(-0.9, 0.9, n_halo))),
            M=10 ** rng.uniform(14.5, 14.95, n_halo),
            z=rng.uniform(0.06, 0.15, n_halo), cosmo=COSMO_DICT)
        shell = LightconeShell(map=rng.uniform(0.5, 1.5,
                                               hpx.npix(nside)),
                               cosmo=COSMO_DICT)
        r_def = BaryonifyShell(cat, shell, epsilon_max=20, model=displ2d,
                               method="cellmajor", verbose=False)
        m_def = r_def.process()
        r_lm = BaryonifyShell(cat, shell, epsilon_max=20, model=displ2d,
                              method="cellmajor", verbose=False)
        r_lm.low_memory = True
        r_lm.low_memory_bytes = 0     # force the no-cache path
        m_lm = r_lm.process()
        assert len(r_lm._dense_cache) == 0 and len(r_def._dense_cache) > 0
        np.testing.assert_array_equal(m_lm, m_def)
        # a second call recomputes the candidates and still agrees
        np.testing.assert_array_equal(r_lm.process(), m_def)

    def test_paint_methods_agree(self, shell_setup, cosmo):
        from baryonification_tpu.profiles import Gas
        from baryonification_tpu.tabulate import TabulatedProfile
        cat, shell = shell_setup
        gas = TabulatedProfile(Gas(**PAR), cosmo)
        gas.setup_interpolator(z_min=0.05, z_max=0.6, N_samples_z=4,
                               M_min=1e13, M_max=1e15, N_samples_Mass=6,
                               R_min=1e-3, R_max=70, N_samples_R=48)
        p_sc = PaintProfilesShell(cat, shell, epsilon_max=5, model=gas,
                                  method="scatter", verbose=False).process()
        p_ga = PaintProfilesShell(cat, shell, epsilon_max=5, model=gas,
                                  method="gather", verbose=False).process()
        np.testing.assert_allclose(p_ga, p_sc, rtol=1e-6,
                                   atol=1e-9 * p_sc.max())


class TestPaintShell:
    def test_paint_positive_additive(self, shell_setup, cosmo):
        cat, shell = shell_setup
        gas = TabulatedProfile(Gas(**PAR), cosmo)
        gas.setup_interpolator(z_min=0.05, z_max=0.6, N_samples_z=4,
                               M_min=1e13, M_max=1e15, N_samples_Mass=6,
                               R_min=1e-3, R_max=70, N_samples_R=48)
        runner = PaintProfilesShell(cat, shell, epsilon_max=5, model=gas)
        painted = runner.process()
        assert painted.shape == shell.map.shape
        assert np.all(painted >= 0)
        assert painted.sum() > 0

    def test_splitjoin_matches_single(self, shell_setup, cosmo):
        from baryonification_tpu.parallel import SplitJoinParallel
        cat, shell = shell_setup
        gas = TabulatedProfile(Gas(**PAR), cosmo)
        gas.setup_interpolator(z_min=0.05, z_max=0.6, N_samples_z=4,
                               M_min=1e13, M_max=1e15, N_samples_Mass=6,
                               R_min=1e-3, R_max=70, N_samples_R=48)
        runner = PaintProfilesShell(cat, shell, epsilon_max=5, model=gas)
        single = runner.process()
        par = SplitJoinParallel(runner, njobs=3)
        joined = par.process()
        np.testing.assert_allclose(joined, single, rtol=1e-9, atol=1e-30)

    def test_splitjoin_rejects_baryonify(self, shell_setup, displ2d):
        from baryonification_tpu.parallel import SplitJoinParallel
        cat, shell = shell_setup
        runner = BaryonifyShell(cat, shell, epsilon_max=20, model=displ2d)
        with pytest.raises(AssertionError):
            SplitJoinParallel(runner, njobs=2)


class TestPerHaloProps:
    def test_baryonify_with_property_column(self, shell_setup, cosmo):
        """Displacement tables with extra parameter axes consume per-halo
        catalog columns (the ParamTabulatedProfile contract,
        `HealpixRunner.py:284-287`)."""
        model = Baryonification3D(DarkMatterOnly(**PAR),
                                  DarkMatterBaryon(**PAR), cosmo,
                                  epsilon_max=20)
        model.setup_interpolator(
            z_min=0.05, z_max=0.6, N_samples_z=3,
            M_min=1e13, M_max=1e15, N_samples_Mass=4,
            R_min=1e-3, R_max=70, N_samples_R=48,
            other_params={'theta_ej': np.array([2.0, 4.0, 8.0])})

        cat0, shell = shell_setup
        rng = np.random.default_rng(42)
        te = rng.uniform(2.5, 7.5, len(cat0))
        cat = HaloLightConeCatalog(ra=cat0.cat['ra'], dec=cat0.cat['dec'],
                                   M=cat0.cat['M'], z=cat0.cat['z'],
                                   cosmo=COSMO_DICT, theta_ej=te)
        runner = BaryonifyShell(cat, shell, epsilon_max=20, model=model)
        out = runner.process()
        assert np.isclose(out.sum(), shell.map.sum(), rtol=1e-8)

        # different column values change the result
        cat2 = HaloLightConeCatalog(ra=cat0.cat['ra'], dec=cat0.cat['dec'],
                                    M=cat0.cat['M'], z=cat0.cat['z'],
                                    cosmo=COSMO_DICT,
                                    theta_ej=np.full(len(cat0), 2.0))
        out2 = BaryonifyShell(cat2, shell, epsilon_max=20,
                              model=model).process()
        assert not np.allclose(out, out2)


@pytest.fixture(scope="module")
def displ3d_props(cosmo):
    """Displacement table with one extra parameter axis (theta_ej)."""
    model = Baryonification3D(DarkMatterOnly(**PAR), DarkMatterBaryon(**PAR),
                              cosmo, epsilon_max=20)
    model.setup_interpolator(
        z_min=0.05, z_max=0.6, N_samples_z=3,
        M_min=1e13, M_max=1e15, N_samples_Mass=4,
        R_min=1e-3, R_max=70, N_samples_R=48,
        other_params={'theta_ej': np.array([2.0, 4.0, 8.0])})
    return model


@pytest.fixture(scope="module")
def shell_setup_props(shell_setup):
    """shell_setup catalog with a theta_ej per-halo column."""
    cat0, shell = shell_setup
    rng = np.random.default_rng(42)
    te = rng.uniform(2.5, 7.5, len(cat0))
    cat = HaloLightConeCatalog(ra=cat0.cat['ra'], dec=cat0.cat['dec'],
                               M=cat0.cat['M'], z=cat0.cat['z'],
                               cosmo=COSMO_DICT, theta_ej=te)
    return cat, shell


class TestCellmajorProps:
    """Per-halo property columns on the cell-major fast path (VERDICT r3
    directive 1: the reference treats extra table axes as first-class in
    every runner, `HealpixRunner.py:284-287,321`; the TPU-default method
    must too — r3 confirmed a crash here)."""

    def test_shell_baryonify_props_cellmajor_matches_scatter(
            self, shell_setup_props, displ3d_props):
        cat, shell = shell_setup_props
        m_sc = BaryonifyShell(cat, shell, epsilon_max=20,
                              model=displ3d_props, method="scatter",
                              verbose=False).process()
        m_cm = BaryonifyShell(cat, shell, epsilon_max=20,
                              model=displ3d_props, method="cellmajor",
                              verbose=False).process()
        assert np.isclose(m_cm.sum(), shell.map.sum(), rtol=1e-8)
        scale = np.abs(m_sc - shell.map).max()
        assert scale > 0
        np.testing.assert_allclose(m_cm, m_sc, atol=1e-6 * scale,
                                   rtol=1e-6)
        # the prop axis is live: constant-column catalog differs
        cat2 = HaloLightConeCatalog(
            ra=cat.cat['ra'], dec=cat.cat['dec'], M=cat.cat['M'],
            z=cat.cat['z'], cosmo=COSMO_DICT,
            theta_ej=np.full(len(cat), 2.0))
        m_cm2 = BaryonifyShell(cat2, shell, epsilon_max=20,
                               model=displ3d_props, method="cellmajor",
                               verbose=False).process()
        assert not np.allclose(m_cm, m_cm2)

    def test_shell_paint_props_cellmajor_matches_scatter(
            self, shell_setup_props, cosmo):
        from baryonification_tpu.tabulate import ParamTabulatedProfile
        cat, shell = shell_setup_props
        gas = ParamTabulatedProfile(Gas(**PAR), cosmo)
        gas.setup_interpolator(
            z_min=0.05, z_max=0.6, N_samples_z=3,
            M_min=1e13, M_max=1e15, N_samples_Mass=4,
            R_min=1e-3, R_max=70, N_samples_R=48,
            other_params={'theta_ej': np.array([2.0, 4.0, 8.0])})
        p_sc = PaintProfilesShell(cat, shell, epsilon_max=5, model=gas,
                                  method="scatter",
                                  verbose=False).process()
        p_cm = PaintProfilesShell(cat, shell, epsilon_max=5, model=gas,
                                  method="cellmajor",
                                  verbose=False).process()
        assert p_sc.max() > 0
        np.testing.assert_allclose(p_cm, p_sc, rtol=1e-6,
                                   atol=1e-9 * p_sc.max())

    def test_shell_two_prop_axes_cellmajor(self, shell_setup, cosmo):
        """Two extra axes exercise the chained one-hot contraction."""
        model = Baryonification3D(DarkMatterOnly(**PAR),
                                  DarkMatterBaryon(**PAR), cosmo,
                                  epsilon_max=20)
        model.setup_interpolator(
            z_min=0.05, z_max=0.6, N_samples_z=2,
            M_min=1e13, M_max=1e15, N_samples_Mass=4,
            R_min=1e-3, R_max=70, N_samples_R=48,
            other_params={'theta_ej': np.array([2.0, 4.0, 8.0]),
                          'eta': np.array([0.1, 0.3])})
        cat0, shell = shell_setup
        rng = np.random.default_rng(7)
        cat = HaloLightConeCatalog(
            ra=cat0.cat['ra'], dec=cat0.cat['dec'], M=cat0.cat['M'],
            z=cat0.cat['z'], cosmo=COSMO_DICT,
            theta_ej=rng.uniform(2.5, 7.5, len(cat0)),
            eta=rng.uniform(0.12, 0.28, len(cat0)))
        m_sc = BaryonifyShell(cat, shell, epsilon_max=20, model=model,
                              method="scatter", verbose=False).process()
        m_cm = BaryonifyShell(cat, shell, epsilon_max=20, model=model,
                              method="cellmajor",
                              verbose=False).process()
        assert np.isclose(m_cm.sum(), shell.map.sum(), rtol=1e-8)
        scale = np.abs(m_sc - shell.map).max()
        assert scale > 0
        np.testing.assert_allclose(m_cm, m_sc, atol=1e-6 * scale,
                                   rtol=1e-6)

    @pytest.fixture(scope="class")
    def grid3d_props(self):
        rng = np.random.default_rng(23)
        N, L = 32, 80.0
        bins = (np.arange(N) + 0.5) * (L / N)
        n = 14
        cat = HaloNDCatalog(x=rng.uniform(0, L, n),
                            y=rng.uniform(0, L, n),
                            z=rng.uniform(0, L, n),
                            M=10 ** rng.uniform(13.6, 14.8, n),
                            theta_ej=rng.uniform(2.5, 7.5, n),
                            redshift=0.25, cosmo=COSMO_DICT)
        gm = GriddedMap(map=rng.uniform(0.5, 1.5, (N, N, N)),
                        redshift=0.25, bins=bins, cosmo=COSMO_DICT)
        return cat, gm

    def test_grid3d_baryonify_props_cellmajor_matches_scatter(
            self, grid3d_props, displ3d_props):
        cat, gm = grid3d_props
        m_sc = BaryonifyGrid(cat, gm, epsilon_max=10, model=displ3d_props,
                             method="scatter", verbose=False).process()
        m_cm = BaryonifyGrid(cat, gm, epsilon_max=10, model=displ3d_props,
                             method="cellmajor", verbose=False).process()
        assert np.isclose(m_cm.sum(), gm.map.sum(), rtol=1e-8)
        scale = np.abs(m_sc - gm.map).max()
        assert scale > 0
        np.testing.assert_allclose(m_cm, m_sc, atol=1e-8 * scale,
                                   rtol=1e-8)

    def test_grid3d_paint_props_cellmajor_matches_scatter(
            self, grid3d_props, cosmo):
        from baryonification_tpu.tabulate import ParamTabulatedProfile
        cat, gm = grid3d_props
        gas = ParamTabulatedProfile(Gas(**PAR), cosmo)
        gas.setup_interpolator(
            z_min=0.05, z_max=0.6, N_samples_z=3,
            M_min=1e13, M_max=1e15, N_samples_Mass=4,
            R_min=1e-3, R_max=70, N_samples_R=48,
            other_params={'theta_ej': np.array([2.0, 4.0, 8.0])})
        p_sc = PaintProfilesGrid(cat, gm, epsilon_max=5, model=gas,
                                 method="scatter",
                                 verbose=False).process()
        p_cm = PaintProfilesGrid(cat, gm, epsilon_max=5, model=gas,
                                 method="cellmajor",
                                 verbose=False).process()
        assert p_sc.sum() > 0
        np.testing.assert_allclose(p_cm, p_sc, rtol=1e-8,
                                   atol=1e-10 * p_sc.max())

    @pytest.mark.parametrize("ell", [False, True])
    def test_grid2d_props_ellipticity_cellmajor_matches_scatter(
            self, cosmo, ell):
        """Props + (optional) ellipticity together on the 2D fast path:
        the shear matrix AND the prop coordinates both ride in the
        packed records."""
        model = Baryonification2D(DarkMatterOnly(**PAR),
                                  DarkMatterBaryon(**PAR), cosmo,
                                  epsilon_max=20)
        model.setup_interpolator(
            z_min=0.05, z_max=0.6, N_samples_z=3,
            M_min=1e13, M_max=1e15, N_samples_Mass=4,
            R_min=1e-3, R_max=70, N_samples_R=48,
            other_params={'theta_ej': np.array([2.0, 4.0, 8.0])})
        rng = np.random.default_rng(29)
        N, L = 64, 90.0
        bins = (np.arange(N) + 0.5) * (L / N)
        n = 16
        cat = HaloNDCatalog(x=rng.uniform(0, L, n),
                            y=rng.uniform(0, L, n),
                            M=10 ** rng.uniform(13.6, 14.8, n),
                            theta_ej=rng.uniform(2.5, 7.5, n),
                            q_ell=rng.uniform(0.4, 0.9, n),
                            A_ell=rng.normal(size=(n, 2)),
                            redshift=0.25, cosmo=COSMO_DICT)
        gm = GriddedMap(map=rng.uniform(0.5, 1.5, (N, N)),
                        redshift=0.25, bins=bins, cosmo=COSMO_DICT)
        m_sc = BaryonifyGrid(cat, gm, epsilon_max=15, model=model,
                             use_ellipticity=ell, method="scatter",
                             verbose=False).process()
        m_cm = BaryonifyGrid(cat, gm, epsilon_max=15, model=model,
                             use_ellipticity=ell, method="cellmajor",
                             verbose=False).process()
        assert np.isclose(m_cm.sum(), gm.map.sum(), rtol=1e-8)
        scale = np.abs(m_sc - gm.map).max()
        assert scale > 0
        np.testing.assert_allclose(m_cm, m_sc, atol=1e-8 * scale,
                                   rtol=1e-8)

    def test_snapshot_props_cellmajor_matches_gather(self,
                                                     displ3d_props):
        rng = np.random.default_rng(31)
        L = 70.0
        n_part = 6000
        snap = ParticleSnapshot(x=rng.uniform(0, L, n_part),
                                y=rng.uniform(0, L, n_part),
                                z=rng.uniform(0, L, n_part),
                                M=np.ones(n_part), L=L, redshift=0.25,
                                cosmo=COSMO_DICT)
        n_halo = 10
        cat = HaloNDCatalog(x=rng.uniform(0, L, n_halo),
                            y=rng.uniform(0, L, n_halo),
                            z=rng.uniform(0, L, n_halo),
                            M=10 ** rng.uniform(13.8, 14.7, n_halo),
                            theta_ej=rng.uniform(2.5, 7.5, n_halo),
                            redshift=0.25, cosmo=COSMO_DICT)
        got_g = BaryonifySnapshot(cat, snap, epsilon_max=10,
                                  model=displ3d_props, method="gather",
                                  verbose=False).process()
        got_c = BaryonifySnapshot(cat, snap, epsilon_max=10,
                                  model=displ3d_props, method="cellmajor",
                                  verbose=False).process()
        for c in 'xyz':
            np.testing.assert_allclose(got_c[c], got_g[c], rtol=1e-10,
                                       atol=1e-10)
        assert any(not np.allclose(got_g[c], snap.cat[c]) for c in 'xyz')

    def test_fallback_warnings(self, shell_setup, displ3d_props,
                               monkeypatch):
        """auto must WARN when it walks off the fast path on an
        accelerator (VERDICT r3 directive 7), naming the reason."""
        import warnings
        import jax as _jax
        monkeypatch.setattr(_jax, 'default_backend', lambda: 'tpu')
        # shell: too many prop axes -> scatter + warning
        many = type('M', (), {'p_keys': [f'p{i}' for i in range(9)]})()
        cat, shell = shell_setup
        with pytest.warns(UserWarning, match="extra parameter axes"):
            r = BaryonifyShell(cat, shell, epsilon_max=20, model=many,
                               verbose=False)
        assert r.method == "scatter"
        # snapshot: 2D -> gather + warning
        rng = np.random.default_rng(3)
        snap2d = ParticleSnapshot(x=rng.uniform(0, 10, 50),
                                  y=rng.uniform(0, 10, 50),
                                  M=np.ones(50), L=10.0, redshift=0.25,
                                  cosmo=COSMO_DICT)
        cat2 = HaloNDCatalog(x=[5.0], y=[5.0], M=[1e14], redshift=0.25,
                             cosmo=COSMO_DICT)
        with pytest.warns(UserWarning, match="2D snapshots"):
            rs = BaryonifySnapshot(cat2, snap2d, epsilon_max=10,
                                   model=displ3d_props, verbose=False)
        assert rs.method == "gather"
        # grid: 3D ellipticity -> explicit cellmajor is a clear error
        N, L = 16, 20.0
        bins = (np.arange(N) + 0.5) * (L / N)
        cat3 = HaloNDCatalog(x=[10.], y=[10.], z=[10.], M=[1e14],
                             q_ell=[0.7], A_ell=[[1.0, 0.0]],
                             redshift=0.25, cosmo=COSMO_DICT)
        gm3 = GriddedMap(map=np.ones((N, N, N)), redshift=0.25,
                         bins=bins, cosmo=COSMO_DICT)
        with pytest.raises(ValueError, match="3D ellipticity"):
            BaryonifyGrid(cat3, gm3, epsilon_max=10, model=displ3d_props,
                          use_ellipticity=True, method="cellmajor",
                          verbose=False)


@pytest.fixture(scope="module")
def grid_setup_2d():
    rng = np.random.default_rng(12)
    N = 64
    L = 100.0
    bins = (np.arange(N) + 0.5) * (L / N)
    n_halo = 15
    cat = HaloNDCatalog(x=rng.uniform(0, L, n_halo),
                        y=rng.uniform(0, L, n_halo),
                        M=10 ** rng.uniform(13.6, 14.6, n_halo),
                        redshift=0.25, cosmo=COSMO_DICT)
    mass_map = rng.uniform(0.5, 1.5, (N, N))
    gm = GriddedMap(map=mass_map, redshift=0.25, bins=bins,
                    cosmo=COSMO_DICT)
    return cat, gm


class TestBaryonifyGrid:
    def test_conservation_2d(self, grid_setup_2d, displ2d):
        cat, gm = grid_setup_2d
        runner = BaryonifyGrid(cat, gm, epsilon_max=20, model=displ2d)
        new_map = runner.process()
        assert new_map.shape == gm.map.shape
        assert np.isclose(new_map.sum(), gm.map.sum(), rtol=1e-8)
        assert not np.allclose(new_map, gm.map)

    def test_mass_moves_outward_2d(self, displ3d, cosmo):
        """A single halo on a uniform map: mass inside ~R should drop
        (gas ejection dominates at the default parameters)."""
        N, L = 64, 50.0
        bins = (np.arange(N) + 0.5) * (L / N)
        cat = HaloNDCatalog(x=[25.0], y=[25.0], M=[10 ** 14.8],
                            redshift=0.25, cosmo=COSMO_DICT)
        gm = GriddedMap(map=np.ones((N, N)), redshift=0.25, bins=bins,
                        cosmo=COSMO_DICT)
        runner = BaryonifyGrid(cat, gm, epsilon_max=15, model=displ3d)
        new_map = runner.process()
        xx = bins[:, None] - 25.0
        yy = bins[None, :] - 25.0
        rr = np.sqrt(xx**2 + yy**2)
        inner = rr < 2.0
        assert new_map[inner].sum() < gm.map[inner].sum()

    def test_conservation_3d(self, displ3d):
        rng = np.random.default_rng(13)
        N, L = 32, 80.0
        bins = (np.arange(N) + 0.5) * (L / N)
        cat = HaloNDCatalog(x=rng.uniform(0, L, 8), y=rng.uniform(0, L, 8),
                            z=rng.uniform(0, L, 8),
                            M=10 ** rng.uniform(13.8, 14.5, 8),
                            redshift=0.25, cosmo=COSMO_DICT)
        gm = GriddedMap(map=rng.uniform(0.5, 1.5, (N, N, N)), redshift=0.25,
                        bins=bins, cosmo=COSMO_DICT)
        runner = BaryonifyGrid(cat, gm, epsilon_max=10, model=displ3d)
        new_map = runner.process()
        assert np.isclose(new_map.sum(), gm.map.sum(), rtol=1e-8)
        assert not np.allclose(new_map, gm.map)

    @pytest.fixture(scope="class")
    def bf2d_setup(self, cosmo):
        """Small eps=10 displacement table + a 12-halo 2D box, for the
        independent numpy brute-force parity tests below."""
        displ = Baryonification2D(DarkMatterOnly(**PAR),
                                  DarkMatterBaryon(**PAR), cosmo,
                                  epsilon_max=10)
        displ.setup_interpolator(z_min=0.05, z_max=0.6, N_samples_z=3,
                                 M_min=1e13, M_max=1e15, N_samples_Mass=6,
                                 R_min=1e-3, R_max=70, N_samples_R=48,
                                 verbose=False)
        rng = np.random.default_rng(5)
        N, L = 64, 100.0
        bins = (np.arange(N) + 0.5) * (L / N)
        n_h = 12
        cat = HaloNDCatalog(x=rng.uniform(0, L, n_h),
                            y=rng.uniform(0, L, n_h),
                            M=10 ** rng.uniform(13.3, 14.8, n_h),
                            redshift=0.25, cosmo=COSMO_DICT)
        gm = GriddedMap(map=rng.uniform(0.5, 1.5, (N, N)), redshift=0.25,
                        bins=bins, cosmo=COSMO_DICT)
        return displ, cat, gm

    @staticmethod
    def _bruteforce_2d(displ, cat, gm, cosmo, eps):
        """Independent numpy implementation of the reference's per-halo
        cutout loop (`Map2DRunner.py:476-580`): per halo, its OWN
        Nsize[j] // 2 window around the nearest bin center, displacement
        read from the model's table, CIC redeposit of the original map
        at the displaced pixel positions."""
        N = gm.Npix
        L = float(N * gm.res)
        res = gm.res
        bins = np.asarray(gm.bins, dtype=np.float64)
        c = cat.cat
        a = 1.0 / (1.0 + cat.redshift)
        R_com = np.asarray(MassDef(200, 'critical').get_radius(
            cosmo, c['M'], a)) / a
        R_q = np.clip(eps * R_com, 0, L / 2)
        Nsize = (2 * R_q / res).astype(np.int64) // 2 * 2
        ox = np.zeros(N * N)
        oy = np.zeros(N * N)
        for j in range(len(c['M'])):
            if Nsize[j] < 2:
                continue
            h = int(Nsize[j] // 2)
            xc = int(np.argmin(np.abs(bins - c['x'][j])))
            yc = int(np.argmin(np.abs(bins - c['y'][j])))
            xi = np.mod(np.arange(xc - h, xc + h), N)
            yi = np.mod(np.arange(yc - h, yc + h), N)
            relx = (np.arange(2 * h) - h) * res + (bins[xc] - c['x'][j])
            rely = (np.arange(2 * h) - h) * res + (bins[yc] - c['y'][j])
            gx = relx[:, None] * np.ones((1, 2 * h))
            gy = np.ones((2 * h, 1)) * rely[None, :]
            r = np.sqrt(gx ** 2 + gy ** 2)
            d = np.asarray(displ.displacement(
                np.maximum(r, 1e-30).reshape(-1), c['M'][j], a))
            d = np.where(np.isfinite(d), d, 0.0)
            d = np.where(r.reshape(-1) < eps * R_com[j], d, 0.0) / res
            flat = (xi[:, None] * N + yi[None, :]).reshape(-1)
            rc = np.maximum(r, 1e-30)
            np.add.at(ox, flat, d * (gx / rc).reshape(-1))
            np.add.at(oy, flat, d * (gy / rc).reshape(-1))
        ix, iy = np.divmod(np.arange(N * N), N)
        px, py = ix + ox, iy + oy
        x0 = np.floor(px).astype(np.int64)
        y0 = np.floor(py).astype(np.int64)
        fx, fy = px - x0, py - y0
        out = np.zeros(N * N)
        vals = np.asarray(gm.map, dtype=np.float64).reshape(-1)
        for ddx, wx in ((0, 1 - fx), (1, fx)):
            for ddy, wy in ((0, 1 - fy), (1, fy)):
                np.add.at(out, np.mod(x0 + ddx, N) * N
                          + np.mod(y0 + ddy, N), vals * wx * wy)
        return out.reshape(N, N)

    def test_matches_bruteforce_2d(self, bf2d_setup, cosmo):
        """With one halo per bucket, the scatter path must reproduce the
        reference's per-halo cutout loop EXACTLY (measured 7e-15)."""
        displ, cat, gm = bf2d_setup
        want = self._bruteforce_2d(displ, cat, gm, cosmo, eps=10)
        got = BaryonifyGrid(cat, gm, epsilon_max=10, model=displ,
                            verbose=False, method="scatter",
                            n_buckets=len(cat.cat['M'])).process()
        scale = np.abs(want).max()
        np.testing.assert_allclose(got, want, atol=1e-12 * scale, rtol=0)

    def test_bucket_window_artifact_bounded_2d(self, bf2d_setup, cosmo):
        """With ALL halos in one bucket, the shared bucket-max window is
        a SUPERSET of each halo's own cutout square: the thin ring
        between a smaller halo's square and its circular r < eps * R
        cutoff picks up the (near-zero, table-tapered) displacement tail
        the reference's square clips away. Bound the artifact: measured
        max 1.3e-4 of map max, rms 8e-6 — far below the physical signal.
        Both windowed-scatter and cell-major use the same bucket window,
        so both are checked against the per-halo brute force."""
        displ, cat, gm = bf2d_setup
        want = self._bruteforce_2d(displ, cat, gm, cosmo, eps=10)
        scale = np.abs(want).max()
        change = np.abs(want - np.asarray(gm.map)).max()
        for method in ("scatter", "cellmajor"):
            got = BaryonifyGrid(cat, gm, epsilon_max=10, model=displ,
                                verbose=False, method=method,
                                n_buckets=1).process()
            err = np.abs(got - want).max()
            assert err < 5e-4 * scale, f"{method}: {err / scale:.2e}"
            assert err < 0.02 * change


class TestGridCellMajor:
    """Block-major dense grid kernels (grid_cellmajor.py) must match the
    windowed halo-major path bit-for-bit-ish (same bucket windows, same
    trilinear readout arithmetic)."""

    @pytest.fixture(scope="class")
    def grid3d(self):
        rng = np.random.default_rng(21)
        N, L = 32, 80.0
        bins = (np.arange(N) + 0.5) * (L / N)
        n = 14
        cat = HaloNDCatalog(x=rng.uniform(0, L, n),
                            y=rng.uniform(0, L, n),
                            z=rng.uniform(0, L, n),
                            M=10 ** rng.uniform(13.6, 14.8, n),
                            redshift=0.25, cosmo=COSMO_DICT)
        gm = GriddedMap(map=rng.uniform(0.5, 1.5, (N, N, N)),
                        redshift=0.25, bins=bins, cosmo=COSMO_DICT)
        return cat, gm

    def test_baryonify_3d_cellmajor_matches_scatter(self, grid3d,
                                                    displ3d):
        cat, gm = grid3d
        m_sc = BaryonifyGrid(cat, gm, epsilon_max=10, model=displ3d,
                             method="scatter", verbose=False).process()
        m_cm = BaryonifyGrid(cat, gm, epsilon_max=10, model=displ3d,
                             method="cellmajor", verbose=False).process()
        assert np.isclose(m_cm.sum(), gm.map.sum(), rtol=1e-8)
        scale = np.abs(m_sc - gm.map).max()
        assert scale > 0
        np.testing.assert_allclose(m_cm, m_sc, atol=1e-8 * scale,
                                   rtol=1e-8)

    def test_baryonify_3d_cellmajor_rdelta(self, grid3d, cosmo):
        from baryonification_tpu.displacement import Baryonification3D
        from baryonification_tpu.profiles import (DarkMatterOnly,
                                                  DarkMatterBaryon)
        cat, gm = grid3d
        model = Baryonification3D(DarkMatterOnly(**PAR),
                                  DarkMatterBaryon(**PAR), cosmo,
                                  epsilon_max=10)
        model.setup_interpolator(z_min=0.1, z_max=0.6, N_samples_z=2,
                                 M_min=1e13, M_max=1e15, N_samples_Mass=4,
                                 R_min=1e-2, R_max=30, N_samples_R=48,
                                 Rdelta_sampling=True)
        m_sc = BaryonifyGrid(cat, gm, epsilon_max=10, model=model,
                             method="scatter", verbose=False).process()
        m_cm = BaryonifyGrid(cat, gm, epsilon_max=10, model=model,
                             method="cellmajor", verbose=False).process()
        scale = np.abs(m_sc - gm.map).max()
        assert scale > 0
        np.testing.assert_allclose(m_cm, m_sc, atol=1e-8 * scale,
                                   rtol=1e-8)

    def test_paint_3d_cellmajor_matches_scatter(self, grid3d, cosmo):
        cat, gm = grid3d
        gas = TabulatedProfile(Gas(**PAR), cosmo)
        gas.setup_interpolator(z_min=0.05, z_max=0.6, N_samples_z=4,
                               M_min=1e13, M_max=1e15, N_samples_Mass=6,
                               R_min=1e-3, R_max=70, N_samples_R=48)
        p_sc = PaintProfilesGrid(cat, gm, epsilon_max=5, model=gas,
                                 method="scatter", verbose=False).process()
        p_cm = PaintProfilesGrid(cat, gm, epsilon_max=5, model=gas,
                                 method="cellmajor",
                                 verbose=False).process()
        assert p_sc.sum() > 0
        np.testing.assert_allclose(p_cm, p_sc, rtol=1e-8,
                                   atol=1e-10 * p_sc.max())

    def test_baryonify_3d_refined_agrees(self, displ3d):
        """Block refinement (pass runs at B/2 or B/4) must leave the
        map unchanged vs the scatter path."""
        rng = np.random.default_rng(27)
        N, L = 64, 90.0
        bins = (np.arange(N) + 0.5) * (L / N)
        n = 10
        cat = HaloNDCatalog(x=rng.uniform(0, L, n),
                            y=rng.uniform(0, L, n),
                            z=rng.uniform(0, L, n),
                            M=10 ** rng.uniform(14.3, 14.9, n),
                            redshift=0.25, cosmo=COSMO_DICT)
        gm = GriddedMap(map=rng.uniform(0.5, 1.5, (N, N, N)),
                        redshift=0.25, bins=bins, cosmo=COSMO_DICT)
        m_sc = BaryonifyGrid(cat, gm, epsilon_max=15, model=displ3d,
                             method="scatter", verbose=False).process()
        r_cm = BaryonifyGrid(cat, gm, epsilon_max=15, model=displ3d,
                             method="cellmajor", verbose=False)
        r_cm.refine_k_min = 1
        m_cm = r_cm.process()
        assert any(v[3] < k[1] for k, v in r_cm._gdense_cache.items()), \
            "refinement did not trigger"
        scale = np.abs(m_sc - gm.map).max()
        assert scale > 0
        np.testing.assert_allclose(m_cm, m_sc, atol=1e-8 * scale,
                                   rtol=1e-8)

    @pytest.fixture(scope="class")
    def grid2d(self):
        rng = np.random.default_rng(34)
        N, L = 64, 90.0
        bins = (np.arange(N) + 0.5) * (L / N)
        n = 16
        kw = dict(x=rng.uniform(0, L, n), y=rng.uniform(0, L, n),
                  M=10 ** rng.uniform(13.6, 14.8, n),
                  redshift=0.25, cosmo=COSMO_DICT)
        cat = HaloNDCatalog(**kw)
        cat_ell = HaloNDCatalog(q_ell=rng.uniform(0.4, 0.9, n),
                                A_ell=rng.normal(size=(n, 2)), **kw)
        gm = GriddedMap(map=rng.uniform(0.5, 1.5, (N, N)),
                        redshift=0.25, bins=bins, cosmo=COSMO_DICT)
        return cat, cat_ell, gm

    @pytest.mark.parametrize("ell", [False, True])
    def test_baryonify_2d_cellmajor_matches_scatter(self, grid2d,
                                                    displ2d, ell):
        cat, cat_ell, gm = grid2d
        c = cat_ell if ell else cat
        m_sc = BaryonifyGrid(c, gm, epsilon_max=15, model=displ2d,
                             use_ellipticity=ell, method="scatter",
                             verbose=False).process()
        m_cm = BaryonifyGrid(c, gm, epsilon_max=15, model=displ2d,
                             use_ellipticity=ell, method="cellmajor",
                             verbose=False).process()
        assert np.isclose(m_cm.sum(), gm.map.sum(), rtol=1e-8)
        scale = np.abs(m_sc - gm.map).max()
        assert scale > 0
        np.testing.assert_allclose(m_cm, m_sc, atol=1e-8 * scale,
                                   rtol=1e-8)

    @pytest.mark.parametrize("ell", [False, True])
    def test_paint_2d_cellmajor_matches_scatter(self, grid2d, cosmo,
                                                ell):
        cat, cat_ell, gm = grid2d
        c = cat_ell if ell else cat
        gas = TabulatedProfile(Gas(**PAR), cosmo)
        gas.setup_interpolator(z_min=0.05, z_max=0.6, N_samples_z=4,
                               M_min=1e13, M_max=1e15, N_samples_Mass=6,
                               R_min=1e-3, R_max=70, N_samples_R=48)
        p_sc = PaintProfilesGrid(c, gm, epsilon_max=5, model=gas,
                                 use_ellipticity=ell, method="scatter",
                                 verbose=False).process()
        p_cm = PaintProfilesGrid(c, gm, epsilon_max=5, model=gas,
                                 use_ellipticity=ell, method="cellmajor",
                                 verbose=False).process()
        assert p_sc.sum() > 0
        np.testing.assert_allclose(p_cm, p_sc, rtol=1e-8,
                                   atol=1e-10 * p_sc.max())

    def test_baryonify_2d_refined_agrees(self, grid2d, displ2d):
        """2D block refinement (4-child Morton rows) must leave the map
        unchanged vs the scatter path."""
        cat, cat_ell, gm = grid2d
        m_sc = BaryonifyGrid(cat_ell, gm, epsilon_max=15, model=displ2d,
                             use_ellipticity=True, method="scatter",
                             verbose=False).process()
        r_cm = BaryonifyGrid(cat_ell, gm, epsilon_max=15, model=displ2d,
                             use_ellipticity=True, method="cellmajor",
                             verbose=False)
        r_cm.refine_k_min = 1
        m_cm = r_cm.process()
        assert any(v[3] < k[1] for k, v in r_cm._gdense_cache.items()), \
            "refinement did not trigger"
        scale = np.abs(m_sc - gm.map).max()
        assert scale > 0
        np.testing.assert_allclose(m_cm, m_sc, atol=1e-8 * scale,
                                   rtol=1e-8)

    def test_cellmajor_rejects_3d_ellipticity(self, displ3d):
        """3D ellipticity raises (reference parity, Map2DRunner.py:333)
        regardless of method; 2D + cellmajor is now a supported pair."""
        rng = np.random.default_rng(5)
        N, L = 16, 40.0
        bins = (np.arange(N) + 0.5) * (L / N)
        cat = HaloNDCatalog(x=[20.0], y=[20.0], z=[20.0], M=[1e14],
                            q_ell=[0.5], A_ell=[[1.0, 0.0, 0.0]],
                            redshift=0.25, cosmo=COSMO_DICT)
        gm = GriddedMap(map=rng.uniform(0.5, 1.5, (N, N, N)),
                        redshift=0.25, bins=bins, cosmo=COSMO_DICT)
        with pytest.raises(NotImplementedError):
            BaryonifyGrid(cat, gm, epsilon_max=10, model=displ3d,
                          use_ellipticity=True)


class TestPaintGrid:
    def test_paint_2d(self, grid_setup_2d, cosmo):
        cat, gm = grid_setup_2d
        gas = TabulatedProfile(Gas(**PAR), cosmo)
        gas.setup_interpolator(z_min=0.05, z_max=0.6, N_samples_z=4,
                               M_min=1e13, M_max=1e15, N_samples_Mass=6,
                               R_min=1e-3, R_max=70, N_samples_R=48)
        runner = PaintProfilesGrid(cat, gm, epsilon_max=5, model=gas)
        painted = runner.process()
        assert painted.shape == gm.map.shape
        assert np.all(painted >= 0)
        assert painted.sum() > 0
        # peak near a halo position
        i = int(np.argmin(np.abs(gm.bins - cat.cat['x'][0])))
        j = int(np.argmin(np.abs(gm.bins - cat.cat['y'][0])))
        assert painted[i, j] > np.median(painted)


class TestPaintAnisGrid:
    def test_identity_remap(self, grid_setup_2d, cosmo):
        """With Paint == Canvas the density-dependent painter
        (`Map2DRunner.py:912-927`) reproduces the existing map values
        inside the halo cutouts (the Canvas->Paint mapping is the
        identity), and leaves untouched pixels at 0."""
        from baryonification_tpu.runners import PaintProfilesAnisGrid
        cat, gm = grid_setup_2d
        gas = TabulatedProfile(Gas(**PAR), cosmo)
        gas.setup_interpolator(z_min=0.05, z_max=0.6, N_samples_z=4,
                               M_min=1e13, M_max=1e15, N_samples_Mass=6,
                               R_min=1e-3, R_max=70, N_samples_R=48)
        # map values must live inside the Canvas's value range for the
        # monotone Canvas -> Paint remap to engage
        rng = np.random.default_rng(3)
        gm = GriddedMap(map=10 ** rng.uniform(12.5, 13.5, gm.map.shape),
                        redshift=0.25, bins=gm.bins, cosmo=COSMO_DICT)
        runner = PaintProfilesAnisGrid(cat, gm, epsilon_max=3,
                                       Painting_model=gas,
                                       Canvas_model=gas, verbose=False)
        painted = runner.process()
        assert painted.shape == gm.map.shape
        touched = painted != 0
        assert touched.sum() > 0
        orig = np.asarray(gm.map)
        # identity mapping: painted values equal map values where a
        # single halo cutout covers the pixel (overlaps add)
        ratio = painted[touched] / orig[touched]
        k = np.round(ratio).astype(int)
        assert np.all(k >= 1)
        np.testing.assert_allclose(ratio, k, rtol=1e-6)

    @pytest.fixture()
    def mesh(self):
        from jax.sharding import Mesh
        import jax
        return Mesh(np.array(jax.devices()), axis_names=("halos",))

    @pytest.fixture()
    def anis_setup(self, cosmo):
        """(cat, gm, paint, canvas): Gas painted on a DarkMatter canvas,
        map values inside the canvas's projected value range."""
        from baryonification_tpu.profiles import DarkMatter
        rng = np.random.default_rng(7)
        N, L = 32, 60.0
        bins = (np.arange(N) + 0.5) * (L / N)
        kw = dict(z_min=0.05, z_max=0.6, N_samples_z=4, M_min=1e13,
                  M_max=1e15, N_samples_Mass=12, R_min=1e-3, R_max=70,
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
        return cat, gm, paint, canvas

    def test_cellmajor_matches_host_single_node(self, anis_setup, cosmo):
        """Cell-major anis parity at a mass node: with every halo mass
        exactly on a remap table node there is no M-blend error, so the
        dense pass must reproduce the reference host loop to the
        ln-canvas resampling floor — same touched set, <1e-3 values."""
        from baryonification_tpu.runners import PaintProfilesAnisGrid
        cat, gm, paint, canvas = anis_setup
        gM = np.asarray(paint._grids[1])
        c = cat.cat.copy()
        c['M'] = np.exp(gM[np.random.default_rng(0).integers(
            3, 9, len(c['M']))])
        cat = HaloNDCatalog(x=c['x'], y=c['y'], z=c['z'], M=c['M'],
                            redshift=0.25, cosmo=COSMO_DICT)
        kw = dict(epsilon_max=3, Painting_model=paint,
                  Canvas_model=canvas, verbose=False)
        host = PaintProfilesAnisGrid(cat, gm, method="scatter",
                                     **kw).process()
        cm = PaintProfilesAnisGrid(cat, gm, method="cellmajor",
                                   **kw).process()
        b_h, b_c = host != 0, cm != 0
        assert b_h.sum() > 20
        assert np.array_equal(b_h, b_c), "touched pixel sets differ"
        rel = np.abs(cm[b_h] / host[b_h] - 1)
        assert rel.max() < 1e-3, f"value parity broke: {rel.max():.2e}"

    def test_cellmajor_matches_host_blended(self, anis_setup):
        """Off-node masses: the kernel blends remap rows linearly in
        lnM; agreement with the exact per-halo host remap is bounded by
        the mass-axis interpolation error (measured 4.9e-3 max at 12
        mass nodes)."""
        from baryonification_tpu.runners import PaintProfilesAnisGrid
        cat, gm, paint, canvas = anis_setup
        kw = dict(epsilon_max=3, Painting_model=paint,
                  Canvas_model=canvas, verbose=False)
        host = PaintProfilesAnisGrid(cat, gm, method="scatter",
                                     **kw).process()
        cm = PaintProfilesAnisGrid(cat, gm, method="cellmajor",
                                   **kw).process()
        b_h, b_c = host != 0, cm != 0
        assert np.array_equal(b_h, b_c)
        rel = np.abs(cm[b_h] / host[b_h] - 1)
        assert rel.max() < 2e-2
        assert np.sqrt((rel ** 2).mean()) < 5e-3

    def test_cellmajor_per_halo_window_shared_buckets(self, anis_setup):
        """REGRESSION: with n_halos >> n_buckets, halos share a bucket
        and the bucket-max cutout window exceeds the smaller halos' own
        Nsize[j] // 2 squares. The anis paint has no radial decay (it
        remaps map VALUES), so a shared window paints pixels the host
        loop never touches at up to O(max) amplitude. The kernel must
        use the PER-HALO window (packed ANIS_HALF_COL_2D column):
        touched sets equal, values at the blended-mass floor."""
        from baryonification_tpu.runners import PaintProfilesAnisGrid
        cat0, gm, paint, canvas = anis_setup
        rng = np.random.default_rng(11)
        n_h = 24
        cat = HaloNDCatalog(x=rng.uniform(2, 58, n_h),
                            y=rng.uniform(2, 58, n_h),
                            z=np.zeros(n_h),
                            M=10 ** rng.uniform(13.2, 14.8, n_h),
                            redshift=0.25, cosmo=COSMO_DICT)
        kw = dict(epsilon_max=3, Painting_model=paint,
                  Canvas_model=canvas, verbose=False, n_buckets=2)
        host = PaintProfilesAnisGrid(cat, gm, method="scatter",
                                     **kw).process()
        cm = PaintProfilesAnisGrid(cat, gm, method="cellmajor",
                                   **kw).process()
        b_h, b_c = host != 0, cm != 0
        assert b_h.sum() > 50
        spurious = b_c & ~b_h
        assert spurious.sum() == 0, (
            f"{spurious.sum()} pixels painted outside per-halo cutouts")
        assert np.array_equal(b_h, b_c)
        rel = np.abs(cm[b_h] / host[b_h] - 1)
        assert rel.max() < 2e-2
        assert np.sqrt((rel ** 2).mean()) < 5e-3

    def test_cellmajor_mesh_matches_single(self, anis_setup, mesh):
        """mesh= shards the Morton block axis; painting is additive so
        the psum join must be bit-identical to single-device."""
        from baryonification_tpu.runners import PaintProfilesAnisGrid
        cat, gm, paint, canvas = anis_setup
        kw = dict(epsilon_max=3, Painting_model=paint,
                  Canvas_model=canvas, verbose=False)
        cm = PaintProfilesAnisGrid(cat, gm, method="cellmajor",
                                   **kw).process()
        mm = PaintProfilesAnisGrid(cat, gm, method="cellmajor",
                                   mesh=mesh, mesh_axis="halos",
                                   **kw).process()
        scale = np.abs(cm).max()
        np.testing.assert_allclose(mm, cm, atol=1e-12 * scale, rtol=0)

    def test_process_device_matches_process(self, anis_setup):
        """The differentiable device core with the default (host-built)
        remap is the same cell-major machinery as process() — exact
        parity (only static trip counts and a device-array return
        differ)."""
        from baryonification_tpu.runners import PaintProfilesAnisGrid
        cat, gm, paint, canvas = anis_setup
        r = PaintProfilesAnisGrid(cat, gm, epsilon_max=3,
                                  Painting_model=paint,
                                  Canvas_model=canvas,
                                  method="cellmajor", verbose=False)
        cm = r.process()
        dev = np.asarray(r.process_device())
        scale = np.abs(cm).max()
        np.testing.assert_allclose(dev, cm, atol=1e-12 * scale, rtol=0)
        # explicit traced-style inputs reproduce the defaults
        dev2 = np.asarray(r.process_device(
            remap=r._anis_remap_table(
                Cosmology.from_dict(r.cosmo),
                1.0 / (1.0 + cat.redshift))[3],
            canvas=jnp.asarray(np.asarray(gm.map))))
        np.testing.assert_allclose(dev2, cm, atol=1e-12 * scale, rtol=0)

    def test_build_remap_device_matches_host(self, anis_setup):
        """The differentiable remap builder reproduces the host builder
        node for node: same degenerate-node sentinel pattern, same
        valid-range rows, same resampled ln-profile rows (the device
        path reads the SAME ln2D tables through the same multilinear
        interp, so agreement is at rounding + the 1e-12 sort
        tie-break)."""
        from baryonification_tpu.runners import PaintProfilesAnisGrid
        cat, gm, paint, canvas = anis_setup
        r = PaintProfilesAnisGrid(cat, gm, epsilon_max=3,
                                  Painting_model=paint,
                                  Canvas_model=canvas, verbose=False)
        a = 1.0 / (1.0 + cat.redshift)
        _lnq, _gM, _gp, host = r._anis_remap_table(
            Cosmology.from_dict(r.cosmo), a)
        dev = np.asarray(r.build_remap_device())
        assert dev.shape == host.shape
        sent_h = host <= -1e29
        sent_d = dev <= -1e29
        np.testing.assert_array_equal(sent_h, sent_d)
        ok = ~sent_h & (host < 1e29)  # real rows + finite range entries
        assert ok.sum() > 100
        np.testing.assert_allclose(dev[ok], host[ok], rtol=0, atol=1e-8)
        # the device remap through the device pass = the host pipeline
        kw = dict(epsilon_max=3, Painting_model=paint,
                  Canvas_model=canvas, method="cellmajor", verbose=False)
        rr = PaintProfilesAnisGrid(cat, gm, **kw)
        cm = rr.process()
        out = np.asarray(rr.process_device(remap=jnp.asarray(dev)))
        scale = np.abs(cm).max()
        np.testing.assert_allclose(out, cm, atol=1e-7 * scale, rtol=0)


class TestBaryonifySnapshot:
    def test_cellmajor_matches_gather(self, displ3d):
        """The particle-major dense pass (snapshot_cellmajor.py) must
        reproduce the halo-major cell-block gather path exactly."""
        rng = np.random.default_rng(17)
        L = 70.0
        n_part = 6000
        snap = ParticleSnapshot(x=rng.uniform(0, L, n_part),
                                y=rng.uniform(0, L, n_part),
                                z=rng.uniform(0, L, n_part),
                                M=np.ones(n_part), L=L, redshift=0.25,
                                cosmo=COSMO_DICT)
        n_halo = 10
        cat = HaloNDCatalog(x=rng.uniform(0, L, n_halo),
                            y=rng.uniform(0, L, n_halo),
                            z=rng.uniform(0, L, n_halo),
                            M=10 ** rng.uniform(13.8, 14.7, n_halo),
                            redshift=0.25, cosmo=COSMO_DICT)
        got_g = BaryonifySnapshot(cat, snap, epsilon_max=10,
                                  model=displ3d, method="gather",
                                  verbose=False).process()
        got_c = BaryonifySnapshot(cat, snap, epsilon_max=10,
                                  model=displ3d, method="cellmajor",
                                  verbose=False).process()
        for c in 'xyz':
            np.testing.assert_allclose(got_c[c], got_g[c], rtol=1e-10,
                                       atol=1e-10)
        assert any(not np.allclose(got_g[c], snap.cat[c]) for c in 'xyz')

    def test_displacements(self, displ3d):
        rng = np.random.default_rng(14)
        L = 80.0
        n_part = 5000
        snap = ParticleSnapshot(x=rng.uniform(0, L, n_part),
                                y=rng.uniform(0, L, n_part),
                                z=rng.uniform(0, L, n_part),
                                M=np.ones(n_part), L=L, redshift=0.25,
                                cosmo=COSMO_DICT)
        cat = HaloNDCatalog(x=[40.0], y=[40.0], z=[40.0], M=[10 ** 14.8],
                            redshift=0.25, cosmo=COSMO_DICT)
        runner = BaryonifySnapshot(cat, snap, epsilon_max=10, model=displ3d)
        new_cat = runner.process()

        old = np.stack([snap.cat[c] for c in 'xyz'], axis=-1)
        new = np.stack([new_cat[c] for c in 'xyz'], axis=-1)
        moved = np.any(old != new, axis=1)
        assert moved.sum() > 0
        # only particles within epsilon_max * R of the halo move
        d_old = np.sqrt(np.sum((old - 40.0) ** 2, axis=1))
        a = 1 / 1.25
        cos = Cosmology.from_dict(COSMO_DICT)
        R = float(MassDef(200, 'critical').get_radius(cos, 10**14.8, a)) / a
        assert np.all(d_old[moved] < 10 * R * 1.05)
        # particles far away unmoved
        assert not np.any(moved & (d_old > 10 * R * 1.2))
        # positions stay in the box
        assert np.all((new >= 0) & (new <= L))

    def test_matches_bruteforce(self, displ3d):
        """Cell-list gather == direct O(N^2) neighbor loop."""
        rng = np.random.default_rng(15)
        L = 60.0
        n_part = 2000
        xyz = rng.uniform(0, L, (n_part, 3))
        snap = ParticleSnapshot(x=xyz[:, 0], y=xyz[:, 1], z=xyz[:, 2],
                                M=np.ones(n_part), L=L, redshift=0.25,
                                cosmo=COSMO_DICT)
        hx = np.array([10.0, 50.0])
        hy = np.array([12.0, 45.0])
        hz = np.array([8.0, 55.0])
        hM = np.array([10 ** 14.5, 10 ** 14.2])
        cat = HaloNDCatalog(x=hx, y=hy, z=hz, M=hM, redshift=0.25,
                            cosmo=COSMO_DICT)
        runner = BaryonifySnapshot(cat, snap, epsilon_max=8, model=displ3d)
        new_cat = runner.process()

        # brute force
        a = 1 / 1.25
        cos = Cosmology.from_dict(COSMO_DICT)
        tot = np.zeros((n_part, 3))
        for j in range(2):
            R = float(MassDef(200, 'critical').get_radius(cos, hM[j], a))
            R_q = min(8 * R / a, L / 2)
            dx = xyz - np.array([hx[j], hy[j], hz[j]])
            dx = np.where(dx > L / 2, dx - L, dx)
            dx = np.where(dx < -L / 2, dx + L, dx)
            d = np.sqrt(np.sum(dx**2, axis=1))
            sel = d < R_q
            dd = np.asarray(displ3d.displacement(d[sel], hM[j], a)) * a
            dd = np.where(np.isfinite(dd), dd, 0)
            # epsilon_max zeroing uses the runner's epsilon_max=8
            R_com = R / a
            dd = np.where(d[sel] < 8 * R_com, dd, 0)
            tot[sel] += dd[:, None] * dx[sel] / d[sel][:, None]
        want = xyz + tot
        want = np.where(want > L, want - L, want)
        want = np.where(want < 0, want + L, want)
        got = np.stack([new_cat[c] for c in 'xyz'], axis=-1)
        np.testing.assert_allclose(got, want, atol=1e-9)


class TestBaryonifySnapshot2D:
    """2D particle snapshots (z=None): the reference supports them
    end-to-end (`utils/io.py:490-670` is2D, `SnapshotRunner.py:100-155`
    2D periodic distances) — VERDICT r3 directive 3 requires parity
    coverage here too."""

    @pytest.fixture(scope="class")
    def snap2d_setup(self):
        rng = np.random.default_rng(19)
        L = 60.0
        n_part = 3000
        xy = rng.uniform(0, L, (n_part, 2))
        snap = ParticleSnapshot(x=xy[:, 0], y=xy[:, 1],
                                M=np.ones(n_part), L=L, redshift=0.25,
                                cosmo=COSMO_DICT)
        assert snap.is2D
        cat = HaloNDCatalog(x=np.array([15.0, 45.0]),
                            y=np.array([20.0, 50.0]),
                            M=np.array([10 ** 14.5, 10 ** 14.2]),
                            redshift=0.25, cosmo=COSMO_DICT)
        return snap, cat, xy, L

    def test_matches_bruteforce_2d(self, snap2d_setup, displ2d):
        """2D periodic cell-list gather == direct O(N^2) neighbor loop
        (the 2D port of TestBaryonifySnapshot.test_matches_bruteforce)."""
        snap, cat, xy, L = snap2d_setup
        runner = BaryonifySnapshot(cat, snap, epsilon_max=8,
                                   model=displ2d, verbose=False)
        assert runner.method == "gather"   # the only 2D formulation
        new_cat = runner.process()

        a = 1 / 1.25
        cos = Cosmology.from_dict(COSMO_DICT)
        tot = np.zeros((len(xy), 2))
        for j in range(len(cat)):
            hM = cat.cat['M'][j]
            R = float(MassDef(200, 'critical').get_radius(cos, hM, a))
            R_q = min(8 * R / a, L / 2)
            dx = xy - np.array([cat.cat['x'][j], cat.cat['y'][j]])
            dx = np.where(dx > L / 2, dx - L, dx)
            dx = np.where(dx < -L / 2, dx + L, dx)
            d = np.sqrt(np.sum(dx ** 2, axis=1))
            sel = d < R_q
            dd = np.asarray(displ2d.displacement(d[sel], hM, a)) * a
            dd = np.where(np.isfinite(dd), dd, 0)
            dd = np.where(d[sel] < 8 * R / a, dd, 0)
            tot[sel] += dd[:, None] * dx[sel] / d[sel][:, None]
        want = xy + tot
        want = np.where(want > L, want - L, want)
        want = np.where(want < 0, want + L, want)
        got = np.stack([new_cat[c] for c in 'xy'], axis=-1)
        assert np.abs(tot).max() > 0
        np.testing.assert_allclose(got, want, atol=1e-9)

    def test_locality_and_box_2d(self, snap2d_setup, displ2d):
        """Only particles within epsilon_max * R move; positions stay in
        the box (the 2D analog of test_displacements)."""
        snap, cat, xy, L = snap2d_setup
        runner = BaryonifySnapshot(cat, snap, epsilon_max=8,
                                   model=displ2d, verbose=False)
        new_cat = runner.process()
        new = np.stack([new_cat[c] for c in 'xy'], axis=-1)
        moved = np.any(new != xy, axis=1)
        assert moved.sum() > 0
        a = 1 / 1.25
        cos = Cosmology.from_dict(COSMO_DICT)
        mdef = MassDef(200, 'critical')
        reach = np.full(len(xy), np.inf)
        for j in range(len(cat)):
            R = float(mdef.get_radius(cos, cat.cat['M'][j], a)) / a
            dx = xy - np.array([cat.cat['x'][j], cat.cat['y'][j]])
            dx = np.where(dx > L / 2, dx - L, dx)
            dx = np.where(dx < -L / 2, dx + L, dx)
            d = np.sqrt(np.sum(dx ** 2, axis=1))
            reach = np.minimum(reach, d / (8 * R))
        assert np.all(reach[moved] < 1.05)
        assert np.all((new >= 0) & (new <= L))

    def test_make_map_2d_conserves_mass(self, snap2d_setup, displ2d):
        """ParticleSnapshot.make_map on 2D before/after baryonify: total
        mass conserved, map actually changes (`utils/io.py:622-670`)."""
        snap, cat, xy, L = snap2d_setup
        m0 = snap.make_map(32)
        assert m0.shape == (32, 32)
        new_cat = BaryonifySnapshot(cat, snap, epsilon_max=8,
                                    model=displ2d, verbose=False).process()
        snap_new = ParticleSnapshot(x=new_cat['x'], y=new_cat['y'],
                                    M=new_cat['M'], L=L, redshift=0.25,
                                    cosmo=COSMO_DICT)
        m1 = snap_new.make_map(32)
        assert np.isclose(m1.sum(), m0.sum(), rtol=1e-12)
        assert not np.allclose(m1, m0)


class TestMorton:
    def test_roundtrip(self):
        from baryonification_tpu.runners import grid_cellmajor as gcm
        import jax.numpy as jnp
        rng = np.random.default_rng(0)
        xyz = rng.integers(0, 1024, (3, 500))
        m = gcm.morton3(jnp.asarray(xyz[0], dtype=jnp.int32),
                        jnp.asarray(xyz[1], dtype=jnp.int32),
                        jnp.asarray(xyz[2], dtype=jnp.int32))
        x, y, z = gcm.demorton3(m)
        np.testing.assert_array_equal(np.asarray(x), xyz[0])
        np.testing.assert_array_equal(np.asarray(y), xyz[1])
        np.testing.assert_array_equal(np.asarray(z), xyz[2])
        # bijection over a full small cube
        import itertools
        g = np.array(list(itertools.product(range(8), repeat=3))).T
        m8 = np.asarray(gcm.morton3(jnp.asarray(g[0], dtype=jnp.int32),
                                    jnp.asarray(g[1], dtype=jnp.int32),
                                    jnp.asarray(g[2], dtype=jnp.int32)))
        assert sorted(m8.tolist()) == list(range(512))

    def test_np_host_matches_device(self):
        from baryonification_tpu.runners import grid_cellmajor as gcm
        from baryonification_tpu.runners import snapshot_cellmajor as scm
        import jax.numpy as jnp
        nb = 16
        rm = np.arange(nb ** 3)
        want = scm.np_morton3_of_rowmajor(rm, nb)
        cx, cyz = rm // (nb * nb), rm % (nb * nb)
        cy, cz = cyz // nb, cyz % nb
        got = np.asarray(gcm.morton3(jnp.asarray(cx, dtype=jnp.int32),
                                     jnp.asarray(cy, dtype=jnp.int32),
                                     jnp.asarray(cz, dtype=jnp.int32)))
        np.testing.assert_array_equal(got, want)


class TestEllipticity:
    """The use_ellipticity path (VERDICT r2 weak #1): golden Rmat values
    against the reference's galsim math, q=1 == isotropic through the
    full runners, and quantitative elliptical paint/displacement checks.
    """

    @staticmethod
    def _reference_Rmat(A, q):
        """Direct transcription of the reference formula
        (`Map2DRunner.py:303-329`) used as the golden oracle."""
        A = np.asarray(A, dtype=np.float64)
        A = A / np.linalg.norm(A)
        beta = np.arccos(np.dot(A, np.array([1.0, 0.0])))
        eta = -np.log(q)
        if eta > 1e-4:
            eta2g = np.tanh(0.5 * eta) / eta
        else:
            etasq = eta * eta
            eta2g = 0.5 + etasq * ((-1 / 24) + etasq * (1 / 240))
        g = eta2g * eta * np.exp(2j * beta)
        det = np.sqrt(1 - np.abs(g) ** 2)
        return np.array([[1 + g.real, g.imag],
                         [g.imag, 1 - g.real]]) / det

    def test_build_Rmat_golden(self):
        from baryonification_tpu.runners.grid import build_Rmat
        for A in [(1.0, 0.0), (0.0, 1.0), (0.6, -0.8), (-2.0, 1.0),
                  (3.0, 4.0)]:
            for q in [0.3, 0.5, 0.7, 0.99995, 1.0]:
                got = build_Rmat(np.array(A), q)
                want = self._reference_Rmat(A, q)
                np.testing.assert_allclose(got, want, rtol=1e-9,
                                           atol=1e-12)
        # q = 1 must be exactly the identity
        np.testing.assert_array_equal(
            build_Rmat(np.array([0.3, -0.7]), 1.0), np.eye(2))
        # area-preserving for any q (det == 1)
        assert np.isclose(np.linalg.det(
            build_Rmat(np.array([1.0, 2.0]), 0.4)), 1.0)

    def test_q1_matches_isotropic(self):
        """use_ellipticity=True with q_ell == 1 must reproduce the
        isotropic result exactly, for baryonify AND paint."""
        from test_parallel import _StubDisp, _StubPaint
        rng = np.random.default_rng(55)
        N, L = 32, 80.0
        bins = (np.arange(N) + 0.5) * (L / N)
        n = 8
        kw = dict(x=rng.uniform(0, L, n), y=rng.uniform(0, L, n),
                  M=10 ** rng.uniform(13.8, 14.6, n),
                  redshift=0.25, cosmo=COSMO_DICT)
        cat_iso = HaloNDCatalog(**kw)
        cat_ell = HaloNDCatalog(q_ell=np.ones(n),
                                A_ell=rng.normal(size=(n, 2)), **kw)
        gm = GriddedMap(map=rng.uniform(0.5, 1.5, (N, N)), redshift=0.25,
                        bins=bins, cosmo=COSMO_DICT)
        disp = _StubDisp()
        want = BaryonifyGrid(cat_iso, gm, epsilon_max=10, model=disp,
                             verbose=False).process()
        got = BaryonifyGrid(cat_ell, gm, epsilon_max=10, model=disp,
                            use_ellipticity=True, verbose=False).process()
        np.testing.assert_allclose(got, want, rtol=1e-13, atol=1e-13)
        assert np.isclose(got.sum(), gm.map.sum())

        paint = _StubPaint()
        want_p = PaintProfilesGrid(cat_iso, gm, epsilon_max=5, model=paint,
                                   verbose=False).process()
        got_p = PaintProfilesGrid(cat_ell, gm, epsilon_max=5, model=paint,
                                  use_ellipticity=True,
                                  verbose=False).process()
        np.testing.assert_allclose(got_p, want_p, rtol=1e-13, atol=1e-13)
        assert want_p.sum() > 0

    def test_elliptical_paint_axis_ratio(self):
        """One halo at a bin center with A = x-hat, q = 0.5 painting an
        exact r^-2 power law: the elliptical radius is r*q^(-1/2) along
        A and r*q^(1/2) perpendicular, so paint(k, 0)/paint(0, k) = q^2
        (exact — the log-profile is linear in ln r, which the table
        readout reproduces with no interpolation error)."""
        from test_parallel import _StubPaint
        q = 0.5
        N, L = 64, 160.0
        bins = (np.arange(N) + 0.5) * (L / N)
        cx = N // 2
        cat = HaloNDCatalog(x=[bins[cx]], y=[bins[cx]], M=[10 ** 14.5],
                            redshift=0.25, cosmo=COSMO_DICT,
                            q_ell=[q], A_ell=[[1.0, 0.0]])
        gm = GriddedMap(map=np.zeros((N, N)), redshift=0.25, bins=bins,
                        cosmo=COSMO_DICT)
        out = PaintProfilesGrid(cat, gm, epsilon_max=15,
                                model=_StubPaint(), use_ellipticity=True,
                                verbose=False).process()
        for k in (2, 3, 5):
            along = out[cx + k, cx]
            perp = out[cx, cx + k]
            assert along > 0 and perp > 0
            np.testing.assert_allclose(along / perp, q ** 2, rtol=1e-10)

    def test_elliptical_displacement_magnitude(self):
        """Offset-kernel check with a LINEAR displacement table
        d(r) = c*r: along A the readout radius is r*q^(-1/2) and the
        push direction stays the circular unit vector (reference
        `Map2DRunner.py:518-536`), so |offset| along A over |offset|
        perpendicular at equal separation is exactly 1/q."""
        import jax.numpy as jnp
        from baryonification_tpu.runners.grid import (
            _accumulate_grid_offsets, build_Rmat)
        q = 0.5
        c = 0.02
        N, L = 64, 160.0
        res = L / N
        bins = (np.arange(N) + 0.5) * res
        cx = N // 2
        zg = np.log(1 + np.linspace(0.05, 0.8, 4))
        Mg = np.log(np.geomspace(1e13, 1e16, 5))
        rg = np.log(np.geomspace(1e-3, 1e3, 512))   # dense: interp error ~0
        table = jnp.asarray(np.broadcast_to(c * np.exp(rg),
                                            (4, 5, 512)).copy())
        grids = tuple(map(jnp.asarray, (zg, Mg, rg)))
        zeros = jnp.zeros((N * N,), dtype=jnp.float64)
        Rmat = jnp.asarray(build_Rmat(np.array([1.0, 0.0]), q))[None]
        offs = _accumulate_grid_offsets(
            N, 16, 0, False, 1, True, grids, table, 1e9, 0.8, res,
            jnp.asarray(bins), jnp.asarray([bins[cx]]),
            jnp.asarray([bins[cx]]), None, jnp.asarray([10 ** 14.5]),
            jnp.asarray([1.0]), Rmat, jnp.zeros((1, 0)),
            (zeros, zeros))
        ox = np.asarray(offs[0]).reshape(N, N)
        oy = np.asarray(offs[1]).reshape(N, N)
        for k in (3, 5, 8):
            along = ox[cx + k, cx]          # push along +x at (k, 0)
            perp = oy[cx, cx + k]           # push along +y at (0, k)
            assert along > 0 and perp > 0
            # d(r q^-1/2)/d(r q^1/2) = q^-1 for linear d; rtol covers the
            # log-grid segment interpolation of the linear table
            np.testing.assert_allclose(along / perp, 1.0 / q, rtol=2e-3)


class TestEmptyCatalog:
    """An empty catalog is a legitimate input (an empty SplitJoin
    spatial chunk, a lightcone z-slice with no halos above the mass
    cut) and must be a no-op, matching the reference's loop-over-
    nothing semantics (`HealpixRunner.py:291`, `Map2DRunner.py:497`,
    `SnapshotRunner.py:100`) — not a zero-size-reduction crash in the
    bucket machinery."""

    @pytest.fixture(scope="class")
    def lc_empty(self):
        return HaloLightConeCatalog(ra=np.array([]), dec=np.array([]),
                                    M=np.array([]), z=np.array([]),
                                    cosmo=COSMO_DICT)

    @pytest.fixture(scope="class")
    def nd_empty(self):
        return HaloNDCatalog(x=np.array([]), y=np.array([]),
                             M=np.array([]), redshift=0.25,
                             cosmo=COSMO_DICT)

    @pytest.fixture(scope="class")
    def gas_tab(self, cosmo):
        gas = TabulatedProfile(Gas(**PAR), cosmo)
        gas.setup_interpolator(z_min=0.05, z_max=0.6, N_samples_z=4,
                               M_min=1e13, M_max=1e15, N_samples_Mass=6,
                               R_min=1e-3, R_max=70, N_samples_R=48)
        return gas

    def test_shell_baryonify_noop(self, lc_empty, displ2d):
        nside = 16
        rng = np.random.default_rng(3)
        smap = rng.uniform(0.5, 1.5, hpx.npix(nside))
        shell = LightconeShell(map=smap.copy(), cosmo=COSMO_DICT)
        for method in ("scatter", "cellmajor", "gather"):
            out = np.asarray(BaryonifyShell(
                lc_empty, shell, epsilon_max=20, model=displ2d,
                method=method, verbose=False).process())
            np.testing.assert_array_equal(out, smap)

    def test_shell_paint_zeros(self, lc_empty, gas_tab):
        nside = 16
        shell = LightconeShell(map=np.ones(hpx.npix(nside)),
                               cosmo=COSMO_DICT)
        out = np.asarray(PaintProfilesShell(
            lc_empty, shell, epsilon_max=5, model=gas_tab,
            verbose=False).process())
        assert out.shape == (hpx.npix(nside),)
        assert (out == 0).all()

    def test_grid_baryonify_noop(self, nd_empty, displ2d):
        N, L = 16, 100.0
        rng = np.random.default_rng(3)
        bins = (np.arange(N) + 0.5) * (L / N)
        gmap = rng.uniform(0.5, 1.5, (N, N))
        gm = GriddedMap(map=gmap.copy(), redshift=0.25, bins=bins,
                        cosmo=COSMO_DICT)
        for method in ("scatter", "cellmajor"):
            out = np.asarray(BaryonifyGrid(
                nd_empty, gm, epsilon_max=15, model=displ2d,
                method=method, verbose=False).process())
            np.testing.assert_array_equal(out, gmap)

    def test_grid_paint_zeros(self, nd_empty, gas_tab):
        N, L = 16, 100.0
        bins = (np.arange(N) + 0.5) * (L / N)
        gm = GriddedMap(map=np.ones((N, N)), redshift=0.25, bins=bins,
                        cosmo=COSMO_DICT)
        out = np.asarray(PaintProfilesGrid(
            nd_empty, gm, epsilon_max=5, model=gas_tab,
            verbose=False).process())
        assert out.shape == (N, N) and (out == 0).all()

    def test_anis_paint_zeros(self, nd_empty, gas_tab):
        from baryonification_tpu.runners import PaintProfilesAnisGrid
        N, L = 16, 100.0
        bins = (np.arange(N) + 0.5) * (L / N)
        gm = GriddedMap(map=np.ones((N, N)), redshift=0.25, bins=bins,
                        cosmo=COSMO_DICT)
        out = np.asarray(PaintProfilesAnisGrid(
            nd_empty, gm, epsilon_max=5, Painting_model=gas_tab,
            Canvas_model=gas_tab, verbose=False).process())
        assert out.shape == (N, N) and (out == 0).all()

    def test_snapshot_noop(self, displ3d):
        L = 100.0
        rng = np.random.default_rng(3)
        nd3_empty = HaloNDCatalog(x=np.array([]), y=np.array([]),
                                  z=np.array([]), M=np.array([]),
                                  redshift=0.25, cosmo=COSMO_DICT)
        snap = ParticleSnapshot(x=rng.uniform(0, L, 50),
                                y=rng.uniform(0, L, 50),
                                z=rng.uniform(0, L, 50),
                                M=np.ones(50), L=L, redshift=0.25,
                                cosmo=COSMO_DICT)
        new_cat = BaryonifySnapshot(nd3_empty, snap, epsilon_max=15,
                                    model=displ3d,
                                    verbose=False).process()
        for c in ("x", "y", "z"):
            np.testing.assert_array_equal(new_cat[c], snap.cat[c])
