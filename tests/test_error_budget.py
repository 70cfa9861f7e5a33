"""Cosmology error budget: how the EH98 P(k) accuracy propagates.

`cosmology/power.py` documents EH98 as ~1-2% off Boltzmann codes. These
tests quantify what that buys in the quantities that matter (SURVEY
hard-part #2): the displacement function d(r) and the dP(k)/P(k)
suppression — and exercise the `TabulatedCorrelation3D` injection
workflow (the documented CCL-parity escape hatch, reference
`Tabulate.py:704-757`).
"""

import numpy as np
import pytest

from baryonification_tpu.cosmology import Cosmology
from baryonification_tpu.displacement import Baryonification3D
from baryonification_tpu.profiles import (DarkMatter, DarkMatterOnly,
                                          DarkMatterBaryon, TwoHalo)
from baryonification_tpu.tabulate import TabulatedCorrelation3D

PAR = dict(epsilon=4.0, theta_ej=4, theta_co=0.1, M_c=1e14, mu_beta=0.1,
           gamma=2.5, delta=7, eta=0.3, eta_delta=0.1, tau=-1.5,
           tau_delta=0, A=0.055, M1=3e11, epsilon_h=0.015, a=0.3, n=2.0,
           p=0.3, q=0.707, cutoff=np.inf, proj_cutoff=1000)


def _build(cosmo, xi):
    dmo = DarkMatterOnly(xi_mm=xi, **PAR)
    dmb = DarkMatterBaryon(xi_mm=xi, **PAR)
    dmo.TwoHalo.xi_mm = xi
    dmb.TwoHalo.xi_mm = xi
    m = Baryonification3D(dmo, dmb, cosmo, epsilon_max=20)
    m.setup_interpolator(z_min=0.1, z_max=0.4, N_samples_z=2,
                         M_min=1e13, M_max=1e15, N_samples_Mass=6,
                         R_min=1e-3, R_max=100, N_samples_R=150)
    return m


class TestErrorBudget:
    @pytest.fixture(scope="class")
    def tables(self, cosmo):
        m0 = _build(cosmo, None)
        # a +2% linear-P(k) error enters the displacement solely through
        # xi_mm in TwoHalo (linear in P)
        m_pert = _build(cosmo, lambda r, a: 1.02 * cosmo.xi_mm(r, a))
        tc = TabulatedCorrelation3D(cosmo)
        tc.setup_interpolator(z_min=0.0, z_max=1.0, N_samples_z=8)
        m_tc = _build(cosmo, tc)
        return m0, m_pert, m_tc

    def test_displacement_within_map_budget(self, tables):
        """A 2% P(k) error moves d(r) by < 1e-3 of the separation — an
        order of magnitude inside the <0.1%-map-RMS budget (the pixel
        displacement IS the map operation)."""
        m0, m_pert, _ = tables
        r = np.geomspace(0.05, 30, 40)
        for M in (1e13, 1e14, 1e15):
            d0 = np.asarray(m0.displacement(r, M, 0.8))
            dp = np.asarray(m_pert.displacement(r, M, 0.8))
            rel = np.nanmax(np.abs(dp - d0) / r)
            assert rel < 1.2e-3, f"M={M:g}: |delta d|/r = {rel:.2e}"
            # ... and the signal itself is orders of magnitude larger
            assert np.nanmax(np.abs(d0) / r) > 0.1

    def test_tabulated_xi_injection_matches_builtin(self, tables):
        """The TabulatedCorrelation3D workflow (tabulate xi once, inject
        as xi_mm) reproduces the built-in xi to <1e-4 of the separation —
        the path for users who want CCL/Boltzmann-exact two-halo terms."""
        m0, _, m_tc = tables
        r = np.geomspace(0.05, 30, 40)
        for M in (1e13, 1e15):
            d0 = np.asarray(m0.displacement(r, M, 0.8))
            dt = np.asarray(m_tc.displacement(r, M, 0.8))
            assert np.nanmax(np.abs(dt - d0) / r) < 1e-4

    def test_suppression_insensitive_to_pk_error(self, cosmo):
        """dP(k)/P(k) moves by < 0.005 absolute under a 2% P(k)
        (1% sigma8) error — 4x below the measured 0.021 parity RMS
        against the published curves."""
        from baryonification_tpu.analysis import pk_suppression
        k = np.geomspace(0.1, 15, 25)
        dmo = DarkMatter(**PAR)
        dmb = DarkMatterBaryon(**PAR) - TwoHalo(**PAR)
        S0 = np.asarray(pk_suppression(dmo, dmb, cosmo, k))
        c2 = Cosmology(Omega_m=cosmo.Omega_m, Omega_b=cosmo.Omega_b,
                       h=cosmo.h, sigma8=cosmo.sigma8 * 1.01,
                       n_s=cosmo.n_s)
        S2 = np.asarray(pk_suppression(dmo, dmb, c2, k))
        assert np.abs(S2 - S0).max() < 0.005
        # the suppression signal itself is much larger
        assert (1 - S0.min()) > 0.1
