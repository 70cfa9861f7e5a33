"""Thermodynamic profile tests: hydrostatic pressure, tSZ, temperature."""

import numpy as np
import pytest

import jax.numpy as jnp

from baryonification_tpu import constants as const
from baryonification_tpu.profiles import (Pressure, NonThermalFrac,
                                          NonThermalFracGreen20,
                                          ElectronPressure, GasNumberDensity,
                                          Temperature, ThermalSZ,
                                          XrayLuminosity, Gas)
from baryonification_tpu.profiles.thermodynamic import G, kb_cgs

from test_profiles import PAR

A_SCALE = 0.8


class TestPressure:
    def test_positive_decreasing(self, cosmo):
        P = Pressure(**PAR)
        r = np.geomspace(0.02, 5, 32)
        prof = np.asarray(P.real(cosmo, r, 1e14, A_SCALE))
        assert np.all(prof >= 0)
        assert np.all(np.diff(prof[prof > 0]) < 0)

    def test_hydrostatic_consistency(self, cosmo):
        """dP/dr should equal -G M(<r) rho_gas / r^2 (CGS-converted) to
        integration accuracy at intermediate radii."""
        P = Pressure(**PAR)
        r0 = 0.5
        dr = 0.01
        r = np.array([r0 - dr, r0 + dr])
        prof = np.asarray(P.real(cosmo, r, 1e14, A_SCALE))
        dP_dr = (prof[1] - prof[0]) / (2 * dr)

        # independent estimate of the RHS
        rr = np.geomspace(1e-6, r0, 4000)
        rho_tot = np.asarray(P.DarkMatterBaryon.real(cosmo, rr, 1e14,
                                                     A_SCALE))
        M_enc = np.trapezoid(4 * np.pi * rr**2 * rho_tot, rr)
        rho_gas = float(P.Gas.real(cosmo, np.array([r0]), 1e14, A_SCALE)[0])
        want = -G * M_enc * rho_gas / r0**2 * const.MSUN_G / const.MPC_CM
        assert abs(dP_dr / want - 1) < 0.1

    def test_magnitude(self, cosmo):
        """P ~ 1e-13..1e-9 erg/cm^3 in cluster cores."""
        P = Pressure(**PAR)
        prof = float(P.real(cosmo, np.array([0.3]), 1e14, A_SCALE)[0])
        assert 1e-14 < prof < 1e-8


class TestNonThermal:
    def test_pandey_clip(self, cosmo):
        ntf = NonThermalFrac(**PAR)
        r = np.geomspace(1e-3, 100, 32)
        f = np.asarray(ntf.real(cosmo, r, 1e14, A_SCALE))
        assert np.all((f >= 0) & (f <= 1))
        assert np.all(np.diff(f) >= -1e-12)

    def test_green20(self, cosmo):
        ntf = NonThermalFracGreen20(**PAR)
        r = np.geomspace(0.05, 3, 16)
        f = np.asarray(ntf.real(cosmo, r, 1e14, A_SCALE))
        assert np.all(f < 1.0)
        assert np.all(np.diff(f) > 0)

    def test_thermal_pressure_product(self, cosmo):
        """Pressure * (1 - NTF) stays below Pressure."""
        P = Pressure(**PAR)
        Pth = P * (1 - NonThermalFrac(**PAR))
        r = np.geomspace(0.1, 2, 8)
        p_all = np.asarray(P.real(cosmo, r, 1e14, A_SCALE))
        p_th = np.asarray(Pth.real(cosmo, r, 1e14, A_SCALE))
        assert np.all(p_th <= p_all + 1e-30)


class TestElectronAndDensity:
    def test_electron_ratio(self, cosmo):
        r = np.geomspace(0.1, 2, 8)
        P = np.asarray(Pressure(**PAR).real(cosmo, r, 1e14, A_SCALE))
        Pe = np.asarray(ElectronPressure(**PAR).real(cosmo, r, 1e14,
                                                     A_SCALE))
        np.testing.assert_allclose(Pe / P, const.PTH_TO_PE, rtol=1e-12)

    def test_gas_number_density(self, cosmo):
        n = GasNumberDensity(**PAR)
        r = np.array([0.3])
        got = float(n.real(cosmo, r, 1e14, A_SCALE)[0])
        rho = float(Gas(**PAR).real(cosmo, r, 1e14, A_SCALE)[0])
        want = rho / (1.15 * const.M_PROTON_G / const.MSUN_G) / const.MPC_CM**3
        assert abs(got / want - 1) < 1e-10
        # ~1e-4..1e-2 cm^-3 in cluster cores
        assert 1e-6 < got < 1e-1


class TestTemperature:
    def test_ideal_gas(self, cosmo):
        T = Temperature(**PAR)
        r = np.geomspace(0.1, 1, 6)
        prof = np.asarray(T.real(cosmo, r, 1e14, A_SCALE))
        assert np.all(prof >= 0)
        assert np.any((prof > 1e6) & (prof < 1e9))  # cluster virial T

    def test_projected_is_ratio(self, cosmo):
        T = Temperature(**PAR)
        r = np.array([0.5])
        got = float(np.atleast_1d(T.projected(cosmo, r, 1e14, A_SCALE))[0])
        P = float(np.atleast_1d(T.Pressure.projected(
            cosmo, r, 1e14, A_SCALE))[0])
        n = float(np.atleast_1d(T.GasNumberDensity.projected(
            cosmo, r, 1e14, A_SCALE))[0])
        assert abs(got - P / n / kb_cgs) / got < 1e-10


class TestThermalSZ:
    def test_real_sentinel(self, cosmo):
        y = ThermalSZ(**PAR)
        out = np.asarray(y.real(cosmo, np.array([0.1, 1.0]), 1e14, A_SCALE))
        np.testing.assert_allclose(out, -99.0)

    def test_compton_y_magnitude(self, cosmo):
        """y ~ 1e-7..1e-4 through a 1e14 halo center."""
        y = ThermalSZ(**PAR)
        prof = np.asarray(y.projected(cosmo, np.array([0.1, 1.0]), 1e14,
                                      A_SCALE))
        assert np.all(prof > 0)
        assert 1e-8 < prof[0] < 1e-3
        assert prof[0] > prof[1]

    def test_unit_chain(self, cosmo):
        """y = projected-P * a * Mpc_cm * sigma_T/(m_e c^2) * Pth_to_Pe."""
        y = ThermalSZ(**PAR)
        r = np.array([0.4])
        sig = float(np.atleast_1d(y.pressure.projected(cosmo, r, 1e14,
                                                       A_SCALE))[0])
        want = (sig * A_SCALE * const.MPC_CM * const.SIGMA_THOMSON
                / (const.M_ELECTRON_G * const.C_LIGHT_CGS**2)
                * const.PTH_TO_PE)
        got = float(np.atleast_1d(y.projected(cosmo, r, 1e14, A_SCALE))[0])
        assert abs(got / want - 1) < 1e-12


class TestXray:
    def test_not_implemented(self):
        with pytest.raises(NotImplementedError):
            XrayLuminosity(**PAR)
