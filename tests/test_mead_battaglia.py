"""Mead20 + Battaglia profile family tests."""

import numpy as np
import pytest

import jax.numpy as jnp

from baryonification_tpu.profiles import mead20 as M20
from baryonification_tpu.profiles import battaglia as B12

MPAR = dict(M20.Params_TAGN_7p8)
A_SCALE = 0.8
MASSES = np.array([1e13, 1e14, 1e15])


def sph_mass(r, rho):
    return np.trapezoid(4 * np.pi * r**2 * rho, r, axis=-1)


class TestMeadStars:
    def test_fstar_split(self, cosmo):
        st = M20.Stars(**MPAR)
        M = np.geomspace(1e11, 1e15, 20)
        f_str, f_cen, f_sat = st._get_fstar(jnp.asarray(M), A_SCALE)
        f_str, f_cen, f_sat = map(np.asarray, (f_str, f_cen, f_sat))
        np.testing.assert_allclose(f_cen + f_sat, f_str, rtol=1e-12)
        # below M*, all stars are central
        Mstr = MPAR['M_star'] * np.exp((1 / A_SCALE - 1) * MPAR['nu_M_star'])
        below = M < Mstr
        np.testing.assert_allclose(f_cen[below], f_str[below], rtol=1e-12)
        # floor at A_star/3 above M*
        z = 1 / A_SCALE - 1
        Astr = MPAR['A_star'] + MPAR['nu_A_star'] * z
        assert np.all(f_str[M > Mstr] >= Astr / 3 - 1e-12)

    def test_star_mass(self, cosmo):
        st = M20.Stars(**MPAR)
        r = np.geomspace(1e-6, 10, 4000)
        rho = np.asarray(st.real(cosmo, r, MASSES, A_SCALE))
        _, f_cen, _ = st._get_fstar(jnp.asarray(MASSES), A_SCALE)
        np.testing.assert_allclose(sph_mass(r, rho),
                                   np.asarray(f_cen) * MASSES, rtol=1e-2)


class TestMeadGas:
    def test_bound_gas_mass(self, cosmo):
        bg = M20.BoundGas(**MPAR)
        R = np.asarray(bg.mass_def.get_radius(cosmo, MASSES,
                                              A_SCALE)) / A_SCALE
        f_bnd = np.asarray(bg._f_bnd(cosmo, jnp.asarray(MASSES), A_SCALE))
        for i, M in enumerate(MASSES):
            r = np.geomspace(1e-5, R[i], 3000)
            rho = np.asarray(bg.real(cosmo, r, np.array([M]), A_SCALE))[0]
            got = sph_mass(r, rho)
            assert abs(got / (f_bnd[i] * M) - 1) < 2e-2

    def test_ejected_gas_mass(self, cosmo):
        eg = M20.EjectedGas(**MPAR)
        f_str, _, _ = eg._get_fstar(jnp.asarray(MASSES), A_SCALE)
        f_bnd = np.asarray(eg._f_bnd(cosmo, jnp.asarray(MASSES), A_SCALE))
        f_ej = (0.05 / 0.3 - np.asarray(f_str)) - f_bnd
        r = np.geomspace(1e-3, 500, 6000)
        rho = np.asarray(eg.real(cosmo, r, MASSES, A_SCALE))
        np.testing.assert_allclose(sph_mass(r, rho), f_ej * MASSES,
                                   rtol=3e-2)

    def test_gas_composition(self, cosmo):
        gas = M20.Gas(**MPAR)
        r = np.geomspace(0.01, 10, 12)
        got = np.asarray(gas.real(cosmo, r, 1e14, A_SCALE))
        want = (np.asarray(M20.BoundGas(**MPAR).real(cosmo, r, 1e14,
                                                     A_SCALE))
                + np.asarray(M20.EjectedGas(**MPAR).real(cosmo, r, 1e14,
                                                         A_SCALE)))
        np.testing.assert_allclose(got, want, rtol=1e-12)


class TestMeadCLM:
    def test_concentration_modification(self, cosmo):
        clm = M20.CollisionlessMatter(**MPAR)
        c = np.asarray(clm._modify_concentration(
            cosmo, jnp.asarray([5.0]), jnp.asarray([1e14]), A_SCALE))
        assert c[0] != 5.0 and c[0] > 0

    def test_clm_mass_fraction(self, cosmo):
        clm = M20.CollisionlessMatter(**MPAR)
        r = np.geomspace(1e-4, 10, 5000)
        rho = np.asarray(clm.real(cosmo, r, MASSES, A_SCALE))
        _, _, f_sat = clm._get_fstar(jnp.asarray(MASSES), A_SCALE)
        want = (1 - 0.05 / 0.3 + np.asarray(f_sat)) * MASSES
        np.testing.assert_allclose(sph_mass(r, rho), want, rtol=5e-3)

    def test_dmb_mass_matches_dmo(self, cosmo):
        dmb = M20.DarkMatterBaryon(**MPAR)
        dmo = M20.DarkMatterOnly(**MPAR)
        r = np.geomspace(1e-5, 100, 500)
        m_dmb = sph_mass(r, np.asarray(dmb.real(cosmo, r, 1e14, A_SCALE)))
        m_dmo = sph_mass(r, np.asarray(dmo.real(cosmo, r, 1e14, A_SCALE)))
        assert abs(m_dmb / m_dmo - 1) < 1e-2


class TestMeadThermo:
    def test_temperature_virial_scale(self, cosmo):
        """T ~ 1e7 K for a 1e14 Msun cluster."""
        T = M20.Temperature(**MPAR)
        r = np.geomspace(0.05, 1, 8)
        prof = np.asarray(T.real(cosmo, r, 1e14, A_SCALE))
        assert np.all(prof > 1e6) and np.all(prof < 1e9)
        assert np.all(np.diff(prof) < 0)

    def test_pressure_two_phase(self, cosmo):
        P = M20.Pressure(**MPAR)
        r = np.geomspace(0.05, 20, 24)
        prof = np.asarray(P.real(cosmo, r, 1e14, A_SCALE))
        assert np.all(prof >= 0)
        assert prof[0] > prof[-1]

    def test_param_dicts_complete(self):
        for d in (M20.Params_TAGN_7p6, M20.Params_TAGN_7p8,
                  M20.Params_TAGN_8p0):
            M20.DarkMatterBaryon(**d)  # constructs without error


class TestBattaglia:
    def test_pressure_calibrations(self, cosmo):
        r = np.geomspace(0.05, 3, 16)
        for model in ('200_AGN', '500_AGN', '500_SH'):
            P = B12.Pressure(Model_def=model)
            prof = np.asarray(P.real(cosmo, r, 1e14, A_SCALE))
            assert np.all(prof > 0)
            assert np.all(np.diff(prof) < 0), model

    def test_pressure_invalid_model(self):
        with pytest.raises(ValueError):
            B12.Pressure(Model_def='bogus')

    def test_truncation(self, cosmo):
        P = B12.Pressure(Model_def='200_AGN', truncate=1.5)
        R = float(P.mass_def.get_radius(cosmo, 1e14, A_SCALE)) / A_SCALE
        r = np.array([1.0 * R, 2.0 * R])
        prof = np.asarray(P.real(cosmo, r, 1e14, A_SCALE))
        assert prof[0] > 0 and prof[1] == 0

    def test_electron_pressure_ratio(self, cosmo):
        from baryonification_tpu.constants import PTH_TO_PE
        r = np.geomspace(0.1, 2, 8)
        P = np.asarray(B12.Pressure('200_AGN').real(cosmo, r, 1e14, A_SCALE))
        Pe = np.asarray(B12.ElectronPressure('200_AGN').real(cosmo, r, 1e14,
                                                             A_SCALE))
        np.testing.assert_allclose(Pe / P, PTH_TO_PE, rtol=1e-12)

    def test_gas_density_scale(self, cosmo):
        """Gas mass within R200c should be a reasonable fraction of f_b M."""
        gd = B12.GasDensity('200_AGN')
        R = float(gd.mass_def.get_radius(cosmo, 1e14, A_SCALE)) / A_SCALE
        r = np.geomspace(1e-3, R, 3000)
        rho = np.asarray(gd.real(cosmo, r, 1e14, A_SCALE))
        # rho is physical; mass integral over comoving r needs a^3
        Mgas = np.trapezoid(4 * np.pi * r**2 * rho, r) * A_SCALE**3
        fb = 0.05 / 0.3
        assert 0.2 * fb * 1e14 < Mgas < 1.5 * fb * 1e14

    def test_pressure_amplitude_sane(self, cosmo):
        """P at 0.5 R200c for 1e14 Msun is ~1e-3..1e-1 keV/cm^3 in CGS
        (~1e-12..1e-10 erg/cm^3)."""
        P = B12.Pressure('200_AGN')
        R = float(P.mass_def.get_radius(cosmo, 1e14, A_SCALE)) / A_SCALE
        prof = float(P.real(cosmo, np.array([0.5 * R]), 1e14, A_SCALE)[0])
        assert 1e-13 < prof < 1e-9
