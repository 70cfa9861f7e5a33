"""Runner edge cases: pole halos, single-halo catalogs, periodic edges."""

import numpy as np
import jax.numpy as jnp
import pytest

from baryonification_tpu import (Cosmology, HaloLightConeCatalog,
                                 LightconeShell, HaloNDCatalog, GriddedMap)
from baryonification_tpu.displacement import Baryonification2D
from baryonification_tpu.profiles import DarkMatterOnly, DarkMatterBaryon
from baryonification_tpu.runners import BaryonifyShell, BaryonifyGrid
from baryonification_tpu.ops import healpix as hpx

COSMO_DICT = dict(Omega_m=0.3, Omega_b=0.05, h=0.7, sigma8=0.8,
                  n_s=0.96, w0=-1.0)
PAR = dict(epsilon=4.0, theta_ej=4.0, theta_co=0.1, M_c=1e14, mu_beta=0.1,
           gamma=2.5, delta=7, mu_theta_ej=0.1, M_theta_ej=5e13,
           M_theta_co=5e13, M_gamma=5e13, M_delta=5e13, eta=0.3,
           eta_delta=0.1, tau=-1.5, tau_delta=0, A=0.055, M1=3e11,
           epsilon_h=0.015, a=0.3, n=2.0, p=0.3, q=0.707,
           cutoff=np.inf, proj_cutoff=1000)


@pytest.fixture(scope="module")
def model(cosmo):
    m = Baryonification2D(DarkMatterOnly(**PAR), DarkMatterBaryon(**PAR),
                          cosmo, epsilon_max=20)
    m.setup_interpolator(z_min=0.1, z_max=0.6, N_samples_z=2,
                         M_min=1e13, M_max=1e15, N_samples_Mass=4,
                         R_min=1e-2, R_max=30, N_samples_R=48)
    return m


class TestShellEdges:
    def test_single_pole_halo(self, model):
        """One massive halo at (clipped) dec=90: conservation holds and
        the displacement is nonzero for all three methods."""
        nside = 32
        rng = np.random.default_rng(0)
        shell = LightconeShell(map=rng.uniform(0.5, 1.5, hpx.npix(nside)),
                               cosmo=COSMO_DICT)
        cat = HaloLightConeCatalog(ra=[10.0], dec=[90.0], M=[10 ** 14.8],
                                   z=[0.2], cosmo=COSMO_DICT)
        maps = {}
        for method in ("scatter", "gather", "cellmajor"):
            out = BaryonifyShell(cat, shell, epsilon_max=20, model=model,
                                 method=method, verbose=False).process()
            assert np.isclose(out.sum(), shell.map.sum(), rtol=1e-8)
            assert np.abs(out - shell.map).max() > 0
            maps[method] = out
        scale = np.abs(maps["scatter"] - shell.map).max()
        np.testing.assert_allclose(maps["cellmajor"], maps["scatter"],
                                   atol=1e-6 * scale, rtol=1e-6)
        np.testing.assert_allclose(maps["gather"], maps["scatter"],
                                   atol=1e-6 * scale, rtol=1e-6)

    def test_south_pole_and_seam(self, model):
        """Halos at dec=-90 and at the ra = 0/360 seam."""
        nside = 32
        rng = np.random.default_rng(1)
        shell = LightconeShell(map=rng.uniform(0.5, 1.5, hpx.npix(nside)),
                               cosmo=COSMO_DICT)
        cat = HaloLightConeCatalog(ra=[0.0, 359.99, 180.0],
                                   dec=[-90.0, 0.0, 45.0],
                                   M=[3e14, 3e14, 3e14],
                                   z=[0.2, 0.3, 0.4], cosmo=COSMO_DICT)
        m_sc = BaryonifyShell(cat, shell, epsilon_max=20, model=model,
                              method="scatter", verbose=False).process()
        m_cm = BaryonifyShell(cat, shell, epsilon_max=20, model=model,
                              method="cellmajor", verbose=False).process()
        scale = np.abs(m_sc - shell.map).max()
        np.testing.assert_allclose(m_cm, m_sc, atol=1e-6 * scale,
                                   rtol=1e-6)


class TestGridEdges:
    def test_halo_at_box_corner(self, model, cosmo):
        """Periodic wrap: a halo at the box corner displaces mass across
        all four edges and still conserves."""
        N, L = 64, 100.0
        bins = (np.arange(N) + 0.5) * (L / N)
        rng = np.random.default_rng(2)
        gm = GriddedMap(map=rng.uniform(0.5, 1.5, (N, N)), redshift=0.25,
                        bins=bins, cosmo=COSMO_DICT)
        cat = HaloNDCatalog(x=[0.2], y=[L - 0.2], M=[10 ** 14.5],
                            redshift=0.25, cosmo=COSMO_DICT)
        out = BaryonifyGrid(cat, gm, epsilon_max=20, model=model,
                            verbose=False).process()
        assert np.isclose(out.sum(), np.asarray(gm.map).sum(), rtol=1e-6)
        diff = np.abs(out - np.asarray(gm.map))
        # changes present in all four corners (wrapped cutout)
        q = N // 4
        assert diff[:q, :q].max() > 0 and diff[-q:, -q:].max() > 0
        assert diff[:q, -q:].max() > 0 and diff[-q:, :q].max() > 0
