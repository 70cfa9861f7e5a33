"""Arico20 profile family tests: mass bookkeeping & component invariants."""

import numpy as np
import pytest

import jax.numpy as jnp

from baryonification_tpu.profiles import arico20 as A20

# canonical Arico config (reference examples/12_Reproduce_Arico_deltaPk)
h = 0.7
APAR = dict(alpha_g=2, epsilon_h=0.015, M1_0=2.2e11 / h, alpha_sat=1,
            M_c=1.2e14 / h, eta=0.6, mu=0.31, beta=0.6,
            epsilon_hydro=np.sqrt(5), M_inn=3.3e13 / h,
            M_r=1e30, beta_r=2, theta_inn=0.1, theta_out=1,
            theta_rg=0.3, sigma_rg=0.1, a=0.3, n=2, p=0.3, q=0.707,
            A_nt=0.495, alpha_nt=0.1, mean_molecular_weight=0.59)

A_SCALE = 0.8
MASSES = np.array([1e13, 1e14, 1e15])


def sph_mass(r, rho):
    return np.trapezoid(4 * np.pi * r**2 * rho, r, axis=-1)


class TestAricoDM:
    def test_mass_normalization(self, cosmo):
        """Hard-truncated NFW: M(<R) = M exactly (analytic norm)."""
        dm = A20.DarkMatter(**APAR)
        r = np.geomspace(1e-4, 10, 6000)
        rho = np.asarray(dm.real(cosmo, r, MASSES, A_SCALE))
        R = np.asarray(dm.mass_def.get_radius(cosmo, MASSES,
                                              A_SCALE)) / A_SCALE
        M_enc = sph_mass(r, rho)
        np.testing.assert_allclose(M_enc, MASSES, rtol=5e-3)
        # zero beyond R
        for i in range(3):
            assert np.all(rho[i][r > R[i] * 1.001] == 0)


class TestStarFractions:
    def test_monotonic_behavior(self, cosmo):
        """f_cg peaks near M1 and falls at high mass (Behroozi shape)."""
        prof = A20.Stars(**APAR)
        M = np.geomspace(1e11, 1e15, 24)
        f = np.asarray(prof._get_star_frac(jnp.asarray(M), 0.25))
        assert np.all(f > 0)
        assert f[-1] < np.max(f)

    def test_star_mass(self, cosmo):
        st = A20.Stars(**APAR)
        r = np.geomspace(1e-6, 5, 4000)
        rho = np.asarray(st.real(cosmo, r, MASSES, A_SCALE))
        M_star = sph_mass(r, rho)
        f_cga = np.asarray(st._get_star_frac(jnp.asarray(MASSES),
                                             1 / A_SCALE - 1))
        np.testing.assert_allclose(M_star, f_cga * MASSES, rtol=2e-2)


class TestGasComponents:
    def test_fraction_bookkeeping(self, cosmo):
        """f_bg + f_rg + f_eg + f_cg + f_sg = f_bar."""
        bg = A20.BoundGas(**APAR)
        fr = bg._gas_fractions(cosmo, jnp.asarray(MASSES), 0.25)
        total = (fr['f_bg'] + fr['f_rg'] + fr['f_eg'] + fr['f_cg']
                 + fr['f_sg'])
        np.testing.assert_allclose(np.asarray(total), fr['f_bar'],
                                   rtol=1e-12)

    def test_bound_gas_mass(self, cosmo):
        """M_bg(<R) = f_bg M (per-halo normalization over [1e-6, R])."""
        bg = A20.BoundGas(**APAR)
        R = np.asarray(bg.mass_def.get_radius(cosmo, MASSES,
                                              A_SCALE)) / A_SCALE
        fr = bg._gas_fractions(cosmo, jnp.asarray(MASSES), 1 / A_SCALE - 1)
        for i, M in enumerate(MASSES):
            r = np.geomspace(1e-5, R[i], 3000)
            rho = np.asarray(bg.real(cosmo, r, np.array([M]), A_SCALE))[0]
            got = sph_mass(r, rho)
            want = float(fr['f_bg'][i]) * M
            assert abs(got / want - 1) < 2e-2, M

    def test_reaccreted_gas_mass(self, cosmo):
        """Analytic erf normalization: M_rg(<R) = f_rg M."""
        par = dict(APAR, M_r=1e13)  # make f_rg non-negligible
        rg = A20.ReaccretedGas(**par)
        R = np.asarray(rg.mass_def.get_radius(cosmo, MASSES,
                                              A_SCALE)) / A_SCALE
        fr = rg._gas_fractions(cosmo, jnp.asarray(MASSES), 1 / A_SCALE - 1)
        for i, M in enumerate(MASSES):
            r = np.linspace(1e-4, R[i], 20000)
            rho = np.asarray(rg.real(cosmo, r, np.array([M]), A_SCALE))[0]
            got = sph_mass(r, rho)
            want = float(fr['f_rg'][i]) * M
            assert abs(got / want - 1) < 1e-2, M

    def test_ejected_gas_mass(self, cosmo):
        eg = A20.EjectedGas(**APAR)
        fr = eg._gas_fractions(cosmo, jnp.asarray(MASSES), 1 / A_SCALE - 1)
        r = np.geomspace(1e-4, 400, 8000)
        rho = np.asarray(eg.real(cosmo, r, MASSES, A_SCALE))
        got = sph_mass(r, rho)
        np.testing.assert_allclose(got, np.asarray(fr['f_eg']) * MASSES,
                                   rtol=2e-2)

    def test_gas_composition(self, cosmo):
        gas = A20.Gas(**APAR)
        r = np.geomspace(0.01, 10, 16)
        got = np.asarray(gas.real(cosmo, r, 1e14, A_SCALE))
        want = (np.asarray(A20.BoundGas(**APAR).real(cosmo, r, 1e14, A_SCALE))
                + np.asarray(A20.EjectedGas(**APAR).real(cosmo, r, 1e14,
                                                         A_SCALE))
                + np.asarray(A20.ReaccretedGas(**APAR).real(cosmo, r, 1e14,
                                                            A_SCALE)))
        np.testing.assert_allclose(got, want, rtol=1e-12)


class TestModifiedDM:
    def test_continuity_and_mass(self, cosmo):
        mdm = A20.ModifiedDarkMatter(**APAR)
        r = np.geomspace(1e-3, 5, 2000)
        rho = np.asarray(mdm.real(cosmo, r, np.array([1e14]), A_SCALE))[0]
        assert np.all(np.isfinite(rho))
        assert np.all(rho >= 0)
        # M(<R) should be ~ f_DM * M (eq. A10 construction)
        R = float(mdm.mass_def.get_radius(cosmo, 1e14, A_SCALE)) / A_SCALE
        rr = np.geomspace(1e-5, R, 4000)
        rho2 = np.asarray(mdm.real(cosmo, rr, np.array([1e14]), A_SCALE))[0]
        got = sph_mass(rr, rho2)
        want = (1 - 0.05 / 0.3) * 1e14
        assert abs(got / want - 1) < 0.05


class TestCLMAndCombiners:
    def test_clm_mass_pinned(self, cosmo):
        """M_clm(<R) = f_clm M by construction (`Arico20.py:826-828`)."""
        clm = A20.CollisionlessMatter(**APAR)
        M = np.array([1e14])
        R = float(clm.mass_def.get_radius(cosmo, 1e14, A_SCALE)) / A_SCALE
        r = np.geomspace(1e-4, R, 3000)
        rho = np.asarray(clm.real(cosmo, r, M, A_SCALE))[0]
        got = sph_mass(r, rho)
        f_sg = float(clm._get_star_frac(jnp.asarray([1e14]),
                                        1 / A_SCALE - 1,
                                        satellite=True)[0])
        want = (1 - 0.05 / 0.3 + f_sg) * 1e14
        assert abs(got / want - 1) < 0.05

    def test_dmb_total_mass(self, cosmo):
        """DMB total mass inside ~R matches DMO (renormalization)."""
        dmb = A20.DarkMatterBaryon(**APAR)
        dmo = A20.DarkMatterOnly(**APAR)
        r = np.geomspace(1e-5, 100, 600)
        m_dmb = sph_mass(r, np.asarray(dmb.real(cosmo, r, 1e14, A_SCALE)))
        m_dmo = sph_mass(r, np.asarray(dmo.real(cosmo, r, 1e14, A_SCALE)))
        assert abs(m_dmb / m_dmo - 1) < 1e-2


class TestAricoThermo:
    def test_pressure_positive_decreasing(self, cosmo):
        P = A20.Pressure(**APAR)
        r = np.geomspace(0.01, 1.5, 24)
        prof = np.asarray(P.real(cosmo, r, 1e14, A_SCALE))
        assert np.all(prof >= 0)
        assert prof[0] > prof[-1]

    def test_ntf_range(self, cosmo):
        ntf = A20.NonThermalFrac(**APAR)
        r = np.geomspace(0.05, 3, 16)
        f = np.asarray(ntf.real(cosmo, r, 1e14, A_SCALE))
        assert np.all(f > -0.5) and np.all(f < 1.0)
        assert np.all(np.diff(f) > 0)  # increases outward

    def test_temperature_positive(self, cosmo):
        T = A20.Temperature(**APAR)
        r = np.geomspace(0.05, 1.0, 8)
        prof = np.asarray(T.real(cosmo, r, 1e14, A_SCALE))
        assert np.all(prof >= 0)
        assert np.any(prof > 1e5)  # cluster gas is ~1e7 K


class TestExtendedAndDeprecated:
    def test_extended_bound_gas_continuity(self, cosmo):
        ebg = A20.ExtendedBoundGas(**APAR)
        R = float(ebg.mass_def.get_radius(cosmo, 1e14, A_SCALE)) / A_SCALE
        R_out = APAR['theta_out'] * R
        r = np.array([R_out * 0.999, R_out * 1.001])
        rho = np.asarray(ebg.real(cosmo, r, 1e14, A_SCALE))
        assert abs(rho[1] / rho[0] - 1) < 0.02  # continuous at R_out

    def test_deprecated_bound_gas(self, cosmo):
        bgd = A20.BoundGasDeprecated(**APAR)
        r = np.geomspace(0.01, 5, 32)
        rho = np.asarray(bgd.real(cosmo, r, 1e14, A_SCALE))
        R = float(bgd.mass_def.get_radius(cosmo, 1e14, A_SCALE)) / A_SCALE
        assert np.all(rho[r > R] == 0)
        assert np.all(rho[r < R] > 0)
