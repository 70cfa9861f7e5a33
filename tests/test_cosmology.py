"""Cosmology-core tests: closed forms, scipy cross-checks, known values."""

import numpy as np
import pytest
from scipy import integrate as sci_integrate

import jax.numpy as jnp

from baryonification_tpu import constants as const
from baryonification_tpu.cosmology import (Cosmology, MassDef,
                                           ConcentrationConstant,
                                           ConcentrationDiemer15,
                                           ConcentrationDuffy08,
                                           mass_translator)


class TestBackground:
    def test_rho_crit0(self, cosmo):
        # rho_crit(z=0) ~ 2.775e11 h^2 Msun/Mpc^3
        got = float(cosmo.rho_crit(1.0))
        assert abs(got / (2.775e11 * 0.7**2) - 1) < 2e-3

    def test_E_of_a(self, cosmo):
        # At a=1, E=1 by construction (flat)
        assert abs(float(cosmo.E(1.0)) - 1.0) < 1e-12
        # matter-dominated scaling at high z
        assert abs(float(cosmo.E(0.01)) / np.sqrt(0.3 * 1e6) - 1) < 0.05

    def test_comoving_distance_vs_quad(self, cosmo):
        """chi against direct scipy quadrature of the same integrand."""
        t = cosmo._tables
        Or, Ol = float(t["Or"]), float(t["Ol"])

        def integrand(a):
            E = np.sqrt(0.3 * a**-3 + Or * a**-4 + Ol)
            return 1.0 / (a * a * E)

        for z in [0.1, 0.5, 1.0, 3.0, 10.0]:
            a = 1.0 / (1.0 + z)
            want = sci_integrate.quad(integrand, a, 1.0)[0] * const.DH_100 / 0.7
            got = float(cosmo.comoving_radial_distance(a))
            assert abs(got / want - 1) < 1e-5, z

    def test_angular_diameter(self, cosmo):
        a = 0.5
        chi = float(cosmo.comoving_radial_distance(a))
        assert abs(float(cosmo.angular_diameter_distance(a)) - a * chi) < 1e-10

    def test_growth_normalized(self, cosmo):
        assert abs(float(cosmo.growth_factor(1.0)) - 1.0) < 1e-8

    def test_growth_matter_dom(self, cosmo):
        """In the matter era D ~ a: D(a1)/D(a2) ~ a1/a2 at high z."""
        r = float(cosmo.growth_factor(0.02) / cosmo.growth_factor(0.01))
        assert abs(r / 2.0 - 1) < 0.02

    def test_growth_lcdm_today_value(self):
        """For Om=0.3 matter+Lambda (no radiation), the growth suppression
        g0 = D(1)/D_EdS(1) is the textbook ~0.779."""
        c = Cosmology(Omega_m=0.3, Omega_b=0.05, h=0.7, sigma8=0.8,
                      n_s=0.96, T_CMB=1e-4, Neff=0.0)
        D_early = float(c.growth_factor(1e-3))
        g0 = 1e-3 / D_early  # D ~ a/g0 early once normalized to D(1)=1
        assert abs(g0 / 0.779 - 1) < 0.01

    def test_growth_vs_scipy_ode(self, cosmo):
        """D(a) in the usable range against scipy solve_ivp of the same ODE
        (radiation included)."""
        from scipy.integrate import solve_ivp
        t = cosmo._tables
        Or, Ol = float(t["Or"]), float(t["Ol"])
        Om = 0.3

        def E2(a):
            return Om * a**-3 + Or * a**-4 + Ol

        def rhs(lna, y):
            a = np.exp(lna)
            e2 = E2(a)
            dlnE2 = (-3 * Om * a**-3 - 4 * Or * a**-4) / e2
            return [y[1], -(2 + 0.5 * dlnE2) * y[1] + 1.5 * Om * a**-3 / e2 * y[0]]

        a0 = 1e-5
        a_eq = Or / Om
        sol = solve_ivp(rhs, [np.log(a0), 0.0],
                        [1 + 1.5 * a0 / a_eq, 1.5 * a0 / a_eq],
                        rtol=1e-10, atol=1e-12, dense_output=True)
        D_end = sol.y[0][-1]
        for z in [0.0, 0.5, 1.0, 3.0, 5.0]:
            a = 1 / (1 + z)
            want = sol.sol(np.log(a))[0] / D_end
            got = float(cosmo.growth_factor(a))
            assert abs(got / want - 1) < 2e-4, z


class TestPower:
    def test_sigma8_normalization(self, cosmo):
        got = float(cosmo.sigmaM(
            4.0 / 3.0 * np.pi * (8.0 / 0.7) ** 3 * float(cosmo._tables["rho_m0"]),
            1.0))
        assert abs(got / 0.8 - 1) < 2e-3

    def test_sigmaM_monotone_decreasing(self, cosmo):
        M = np.geomspace(1e10, 1e16, 50)
        s = np.asarray(cosmo.sigmaM(M, 1.0))
        assert np.all(np.diff(s) < 0)

    def test_sigma_growth_scaling(self, cosmo):
        M = 1e14
        s1 = float(cosmo.sigmaM(M, 1.0))
        s05 = float(cosmo.sigmaM(M, 0.5))
        D = float(cosmo.growth_factor(0.5))
        assert abs(s05 / (s1 * D) - 1) < 1e-10

    def test_xi_vs_direct_quadrature(self, cosmo):
        """xi(r) against direct j0 quadrature of the tabulated P(k)."""
        t = cosmo._tables
        k = np.asarray(t["k"])
        pk = np.asarray(t["pk0"])
        for r in [1.0, 5.0, 20.0]:
            integ = k**3 * pk * np.sin(k * r) / (k * r) / (2 * np.pi**2)
            want = np.trapezoid(integ, np.log(k))
            got = float(cosmo.xi_mm(r, 1.0))
            assert abs(got / want - 1) < 2e-2, r

    def test_xi_bao_scale_sign(self, cosmo):
        """xi is positive at 50 Mpc, small at 200 Mpc (beyond BAO)."""
        assert float(cosmo.xi_mm(50.0, 1.0)) > 0
        assert abs(float(cosmo.xi_mm(200.0, 1.0))) < 0.01


class TestMassDef:
    def test_radius_roundtrip(self, cosmo):
        md = MassDef(200, "critical")
        M = 1e14
        R = float(md.get_radius(cosmo, M, 0.8))
        assert abs(float(md.get_mass(cosmo, R, 0.8)) / M - 1) < 1e-12

    def test_radius_value(self, cosmo):
        """R200c(1e14, z=0) ~ 0.96 Mpc for h=0.7 (textbook value ~1 Mpc)."""
        md = MassDef(200, "critical")
        R = float(md.get_radius(cosmo, 1e14, 1.0))
        assert 0.8 < R < 1.1

    def test_translator_200c_to_200m(self, cosmo):
        """M200m > M200c always (mean density < critical density)."""
        md_c = MassDef(200, "critical")
        md_m = MassDef(200, "matter")
        conc = ConcentrationDuffy08(md_c)
        M = np.array([1e13, 1e14, 1e15])
        M2 = np.asarray(mass_translator(cosmo, M, 0.9, md_c, md_m, conc))
        assert np.all(M2 > M)
        assert np.all(M2 < 2.0 * M)

    def test_translator_identity(self, cosmo):
        md = MassDef(200, "critical")
        conc = ConcentrationDuffy08(md)
        M2 = float(mass_translator(cosmo, 1e14, 0.7, md, md, conc))
        assert abs(M2 / 1e14 - 1) < 1e-6


class TestConcentration:
    def test_constant(self, cosmo):
        c = ConcentrationConstant(7.0)
        np.testing.assert_allclose(np.asarray(c(cosmo, np.ones(3) * 1e14, 0.5)),
                                   7.0)

    def test_duffy_values(self, cosmo):
        c = ConcentrationDuffy08(MassDef(200, "critical"))
        got = float(c(cosmo, 2e12 / 0.7, 1.0))
        assert abs(got / 5.71 - 1) < 1e-10

    def test_diemer_reasonable(self, cosmo):
        """c200c(1e12..1e15, z=0) should be ~4-10, decreasing with M."""
        c = ConcentrationDiemer15()
        M = np.geomspace(1e12, 1e15, 8)
        got = np.asarray(c(cosmo, M, 1.0))
        assert np.all(got > 2.5) and np.all(got < 12.0)
        assert got[0] > got[-1]


class TestHalofit:
    """Property tests for the Takahashi+2012 halofit P_nl (external
    Boltzmann/sim anchors are unavailable in the sandbox; the sim-anchored
    validation is the Fig-2 suppression parity in examples/10)."""

    def test_linear_limit_low_k(self, cosmo):
        import jax.numpy as jnp
        k = np.geomspace(1e-4, 5e-3, 8)
        pl = np.asarray(cosmo.P_lin(jnp.asarray(k), 1.0))
        pn = np.asarray(cosmo.P_nl(jnp.asarray(k), 1.0))
        np.testing.assert_allclose(pn, pl, rtol=2e-2)

    def test_nonlinear_boost_high_k(self, cosmo):
        import jax.numpy as jnp
        k = np.array([1.0, 3.0, 10.0])
        pl = np.asarray(cosmo.P_lin(jnp.asarray(k), 1.0))
        pn = np.asarray(cosmo.P_nl(jnp.asarray(k), 1.0))
        assert np.all(pn > 2 * pl)
        # boost grows with k in this regime
        assert np.all(np.diff(pn / pl) > 0)

    def test_growth_ordering(self, cosmo):
        """Nonlinear boost at z=1 is weaker than at z=0."""
        import jax.numpy as jnp
        k = jnp.asarray([2.0])
        b0 = float((cosmo.P_nl(k, 1.0) / cosmo.P_lin(k, 1.0))[0])
        b1 = float((cosmo.P_nl(k, 0.5) / cosmo.P_lin(k, 0.5))[0])
        assert b0 > b1 > 1.0

    def test_sigma8_monotonicity(self):
        from baryonification_tpu.cosmology import Cosmology
        import jax.numpy as jnp
        lo = Cosmology(Omega_m=0.3, Omega_b=0.05, h=0.7, sigma8=0.7,
                       n_s=0.96)
        hi = Cosmology(Omega_m=0.3, Omega_b=0.05, h=0.7, sigma8=0.9,
                       n_s=0.96)
        k = jnp.asarray([1.0])
        assert float(hi.P_nl(k, 1.0)[0]) > float(lo.P_nl(k, 1.0)[0])
