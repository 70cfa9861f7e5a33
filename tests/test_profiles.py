"""Schneider19 profile family tests: closed-form limits & invariants.

The reference has no test suite (SURVEY.md section 4); these tests encode
its implicit invariants: NFW normalization (M(<R)=M), component mass
fractions, shock suppression limits, relaxation convergence, DMO/DMB mass
matching, profile algebra, and the Abel projection against a closed form.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from baryonification_tpu.cosmology import Cosmology, MassDef
from baryonification_tpu.profiles import (DarkMatter, TwoHalo, Stars, Gas,
                                          ShockedGas, CollisionlessMatter,
                                          DarkMatterOnly, DarkMatterBaryon,
                                          HaloProfile)

# canonical Schneider19 parameters (reference examples/default_config.npy)
PAR = dict(epsilon=4.0, theta_ej=4, theta_co=0.1, M_c=1e14, mu_beta=0.1,
           gamma=2.5, delta=7, mu_theta_ej=0.1, mu_theta_co=0.0,
           M_theta_ej=5e13, M_theta_co=5e13, M_gamma=5e13, M_delta=5e13,
           eta=0.3, eta_delta=0.1, tau=-1.5, tau_delta=0, A=0.055,
           M1=3e11, epsilon_h=0.015, a=0.3, n=2.0, p=0.3, q=0.707,
           cdelta=None, alpha_nt=0.2, nu_nt=0.5, gamma_nt=0.5,
           cutoff=np.inf, proj_cutoff=1000)

A_SCALE = 1.0 / (1.0 + 0.25)  # z = 0.25
MASSES = np.array([1e13, 1e14, 1e15])


def sph_mass(r, rho):
    return np.trapezoid(4 * np.pi * r**2 * rho, r, axis=-1)


@pytest.fixture(scope="module")
def r_int():
    return np.geomspace(1e-4, 300, 1200)


class TestDarkMatter:
    def test_normalization(self, cosmo, r_int):
        """Truncated NFW is normalized so M(<R_200c) = M
        (`Schneider19.py:405-414`)."""
        dm = DarkMatter(**PAR)
        rho = np.asarray(dm.real(cosmo, r_int, MASSES, A_SCALE))
        R = np.asarray(dm.mass_def.get_radius(cosmo, MASSES, A_SCALE)) / A_SCALE
        for i, M in enumerate(MASSES):
            inside = r_int < R[i]
            Menc = np.trapezoid(4 * np.pi * r_int[inside]**2
                                * rho[i][inside], r_int[inside])
            assert abs(Menc / M - 1) < 2e-2, M

    def test_nfw_shape(self, cosmo):
        """Below the truncation radius the shape is NFW:
        rho(r) r (1+r/rs)^2 = const."""
        dm = DarkMatter(cdelta=5.0, **{k: v for k, v in PAR.items()
                                       if k != "cdelta"})
        M = 1e14
        R = float(dm.mass_def.get_radius(cosmo, M, A_SCALE)) / A_SCALE
        rs = R / 5.0
        rt = 4.0 * R
        r = np.array([0.01, 0.05, 0.1]) * R
        rho = np.asarray(dm.real(cosmo, r, M, A_SCALE))
        shape = (rho * (r / rs) * (1 + r / rs) ** 2
                 * (1 + (r / rt) ** 2) ** 2)
        np.testing.assert_allclose(shape, shape[0], rtol=1e-6)

    def test_scalar_squeeze(self, cosmo):
        dm = DarkMatter(**PAR)
        out = dm.real(cosmo, 0.1, 1e14, A_SCALE)
        assert out.ndim == 0
        out = dm.real(cosmo, np.array([0.1, 0.2]), 1e14, A_SCALE)
        assert out.shape == (2,)


class TestStars:
    def test_total_mass_fraction(self, cosmo):
        """Stellar mass integrates to f_cga * M_tot (`Schneider19.py:618`)."""
        st = Stars(**PAR)
        r = np.geomspace(1e-6, 10, 4000)
        rho = np.asarray(st.real(cosmo, r, MASSES, A_SCALE))
        M_star = sph_mass(r, rho)

        dm = DarkMatter(**PAR)
        rr = np.geomspace(1e-6, 1000, 2000)
        M_tot = sph_mass(rr, np.asarray(dm.real(cosmo, rr, MASSES, A_SCALE)))

        eta_cga = PAR['eta'] + PAR['eta_delta']
        tau_cga = PAR['tau'] + PAR['tau_delta']
        f_cga = 2 * PAR['A'] * ((MASSES / PAR['M1']) ** tau_cga
                                + (MASSES / PAR['M1']) ** eta_cga) ** -1
        np.testing.assert_allclose(M_star, f_cga * M_tot, rtol=2e-2)


class TestGas:
    def test_total_mass_fraction(self, cosmo):
        gas = Gas(**PAR)
        r = np.geomspace(1e-6, 1000, 3000)
        rho = np.asarray(gas.real(cosmo, r, MASSES, A_SCALE))
        M_gas = sph_mass(r, rho)

        dm = DarkMatter(**PAR)
        M_tot = sph_mass(r, np.asarray(dm.real(cosmo, r, MASSES, A_SCALE)))

        f_star = 2 * PAR['A'] * ((MASSES / PAR['M1']) ** PAR['tau']
                                 + (MASSES / PAR['M1']) ** PAR['eta']) ** -1
        f_bar = 0.05 / 0.3
        np.testing.assert_allclose(M_gas, (f_bar - f_star) * M_tot, rtol=2e-2)

    def test_positive(self, cosmo):
        gas = Gas(**PAR)
        r = np.geomspace(1e-3, 100, 64)
        assert np.all(np.asarray(gas.real(cosmo, r, MASSES, A_SCALE)) >= 0)


class TestShockedGas:
    def test_limits(self, cosmo):
        """Suppression factor -> 1 well inside the shock, -> 0.25 outside
        (`Schneider19.py:806-814`)."""
        par = {k: v for k, v in PAR.items()}
        gas = Gas(**par)
        sh = ShockedGas(epsilon_shock=1.0, width_shock=0.05, **par)
        M = 1e14
        R = float(gas.mass_def.get_radius(cosmo, M, A_SCALE)) / A_SCALE
        r_in = np.array([1e-3 * R])
        r_out = np.array([30.0 * R])
        ratio_in = float((sh.real(cosmo, r_in, M, A_SCALE)
                          / gas.real(cosmo, r_in, M, A_SCALE))[0])
        ratio_out = float((sh.real(cosmo, r_out, M, A_SCALE)
                           / gas.real(cosmo, r_out, M, A_SCALE))[0])
        assert abs(ratio_in - 1.0) < 1e-3
        assert abs(ratio_out - 0.25) < 1e-3


class TestTwoHalo:
    def test_large_r_limit(self, cosmo):
        """rho_2h -> rho_m (comoving) at large separations."""
        th = TwoHalo(**PAR)
        r = np.array([150.0])
        rho = float(th.real(cosmo, r, 1e14, A_SCALE)[0])
        rho_m = float(cosmo.rho_x(A_SCALE, "matter", is_comoving=True))
        assert abs(rho / rho_m - 1) < 0.05

    def test_bias_increases_with_mass(self, cosmo):
        th = TwoHalo(**PAR)
        r = np.array([5.0])
        rho = np.asarray(th.real(cosmo, r, np.array([1e13, 1e15]), A_SCALE))
        assert rho[1] > rho[0]


class TestCollisionlessMatter:
    def test_positive_and_mass(self, cosmo):
        clm = CollisionlessMatter(**PAR)
        r = np.geomspace(1e-3, 50, 400)
        rho = np.asarray(clm.real(cosmo, r, MASSES, A_SCALE))
        assert np.all(np.isfinite(rho))
        assert np.all(rho > -1e-6 * np.max(rho))

        # total CLM mass ~ f_clm * M_tot
        rr = np.geomspace(1e-4, 500, 3000)
        rho_f = np.asarray(clm.real(cosmo, rr, MASSES, A_SCALE))
        M_clm = sph_mass(rr, rho_f)
        dm = DarkMatter(**PAR)
        M_tot = sph_mass(rr, np.asarray(dm.real(cosmo, rr, MASSES, A_SCALE)))
        f_star = 2 * PAR['A'] * ((MASSES / PAR['M1']) ** PAR['tau']
                                 + (MASSES / PAR['M1']) ** PAR['eta']) ** -1
        eta_cga = PAR['eta'] + PAR['eta_delta']
        tau_cga = PAR['tau'] + PAR['tau_delta']
        f_cga = 2 * PAR['A'] * ((MASSES / PAR['M1']) ** tau_cga
                                + (MASSES / PAR['M1']) ** eta_cga) ** -1
        f_clm = 1 - 0.05 / 0.3 + (f_star - f_cga)
        np.testing.assert_allclose(M_clm, f_clm * M_tot, rtol=0.08)


class TestCombiners:
    def test_dmo_sum(self, cosmo):
        dmo = DarkMatterOnly(**PAR)
        dm = DarkMatter(**PAR)
        th = TwoHalo(**PAR)
        r = np.geomspace(0.01, 50, 32)
        got = np.asarray(dmo.real(cosmo, r, 1e14, A_SCALE))
        want = (np.asarray(dm.real(cosmo, r, 1e14, A_SCALE))
                + np.asarray(th.real(cosmo, r, 1e14, A_SCALE)))
        np.testing.assert_allclose(got, want, rtol=1e-12)

    def test_dmb_mass_matches_dmo(self, cosmo):
        """The DMB one-halo total mass is renormalized to the DMO total on
        r in [1e-5, 100] (`Schneider19.py:1246-1257`)."""
        dmb = DarkMatterBaryon(**PAR)
        dmo = DarkMatterOnly(**PAR)
        r = np.geomspace(1e-5, 100, 500)
        rho_dmb = np.asarray(dmb.real(cosmo, r, 1e14, A_SCALE))
        rho_dmo = np.asarray(dmo.real(cosmo, r, 1e14, A_SCALE))
        # subtract the shared two-halo term to isolate the one-halo masses
        th = np.asarray(TwoHalo(**PAR).real(cosmo, r, 1e14, A_SCALE))
        m_dmb = sph_mass(r, rho_dmb - th)
        m_dmo = sph_mass(r, rho_dmo - th)
        assert abs(m_dmb / m_dmo - 1) < 5e-3


class TestAlgebra:
    def test_sum_product(self, cosmo):
        gas = Gas(**PAR)
        st = Stars(**PAR)
        r = np.geomspace(0.01, 10, 16)
        s = (gas + st).real(cosmo, r, 1e14, A_SCALE)
        want = (np.asarray(gas.real(cosmo, r, 1e14, A_SCALE))
                + np.asarray(st.real(cosmo, r, 1e14, A_SCALE)))
        np.testing.assert_allclose(np.asarray(s), want, rtol=1e-12)

        half = (gas * 0.5).real(cosmo, r, 1e14, A_SCALE)
        np.testing.assert_allclose(np.asarray(half),
                                   0.5 * np.asarray(gas.real(cosmo, r, 1e14,
                                                             A_SCALE)),
                                   rtol=1e-12)

        neg = (-gas).real(cosmo, r, 1e14, A_SCALE)
        np.testing.assert_allclose(np.asarray(neg),
                                   -np.asarray(gas.real(cosmo, r, 1e14,
                                                        A_SCALE)),
                                   rtol=1e-12)

    def test_one_minus_profile(self, cosmo):
        """The Pressure * (1 - NonThermalFrac) pattern
        (`Thermodynamic.py:292`)."""
        gas = Gas(**PAR)
        r = np.geomspace(0.01, 10, 8)
        out = (1 - gas * 0.0).real(cosmo, r, 1e14, A_SCALE)
        np.testing.assert_allclose(np.asarray(out), 1.0)

    def test_generate_operator_method(self, cosmo):
        """API-compat helper builds the same CombinedProfile algebra
        (`utils/misc.py:7-96`)."""
        import operator
        from baryonification_tpu import generate_operator_method, destory_Pk
        gas = Gas(**PAR)
        st = Stars(**PAR)
        r = np.geomspace(0.01, 10, 8)
        add = generate_operator_method(operator.add)
        got = np.asarray(add(gas, st).real(cosmo, r, 1e14, A_SCALE))
        want = (np.asarray(gas.real(cosmo, r, 1e14, A_SCALE))
                + np.asarray(st.real(cosmo, r, 1e14, A_SCALE)))
        np.testing.assert_allclose(got, want, rtol=1e-12)

        rsub = generate_operator_method(operator.sub, reflected=True)
        got = np.asarray(rsub(gas, 0.0).real(cosmo, r, 1e14, A_SCALE))
        np.testing.assert_allclose(
            got, -np.asarray(gas.real(cosmo, r, 1e14, A_SCALE)), rtol=1e-12)

        neg = generate_operator_method(operator.neg)
        got = np.asarray(neg(gas).real(cosmo, r, 1e14, A_SCALE))
        np.testing.assert_allclose(
            got, -np.asarray(gas.real(cosmo, r, 1e14, A_SCALE)), rtol=1e-12)

        assert destory_Pk(cosmo) is cosmo   # picklable pytree: no-op

    def test_set_parameter_recursive(self, cosmo):
        dmb = DarkMatterBaryon(**PAR)
        dmb.set_parameter('theta_ej', 8.0)
        assert dmb.theta_ej == 8.0
        assert dmb.Gas.theta_ej == 8.0
        assert dmb.CollisionlessMatter.Gas.theta_ej == 8.0


class TestProjection:
    def test_abel_gaussian(self, cosmo):
        """Projected profile of a closed-form 3D Gaussian:
        Sigma(rp) = sqrt(2 pi) s exp(-rp^2/2s^2)."""

        class GaussProfile(HaloProfile):
            s = 0.5

            def _real(self, cosmo, r, M, a):
                M = jnp.atleast_1d(jnp.asarray(M))
                prof = jnp.exp(-0.5 * (r / self.s) ** 2)
                return jnp.broadcast_to(prof[None, :], (M.shape[0],
                                                        r.shape[0]))

        g = GaussProfile(padding_lo_proj=0.01, padding_hi_proj=100,
                         n_per_decade_proj=50, proj_cutoff=1e3)
        rp = np.geomspace(0.05, 1.2, 20)
        got = np.asarray(g.projected(cosmo, rp, 1e14, A_SCALE))
        want = np.sqrt(2 * np.pi) * g.s * np.exp(-0.5 * (rp / g.s) ** 2)
        # relative accuracy in the body; absolute quadrature floor deep in
        # the tail (trapz, same regime as the reference's projection)
        np.testing.assert_allclose(got, want, rtol=5e-3, atol=1e-3)

    def test_projected_monotone_decreasing(self, cosmo):
        dm = DarkMatter(**PAR)
        rp = np.geomspace(0.05, 5, 12)
        sig = np.asarray(dm.projected(cosmo, rp, 1e14, A_SCALE))
        assert np.all(np.diff(sig) < 0)


class TestDefaultParams:
    """The shipped canonical config (reference examples/default_config.npy)."""

    def test_values_match_reference_contract(self):
        from baryonification_tpu import DEFAULT_PARAMS
        # spot-check the values VERDICT/SURVEY pin as the published config
        assert DEFAULT_PARAMS["epsilon_max"] == 20
        assert DEFAULT_PARAMS["theta_ej"] == 4
        assert DEFAULT_PARAMS["M_c"] == 1e14
        assert DEFAULT_PARAMS["A"] == 0.055
        assert DEFAULT_PARAMS["q"] == 0.707
        assert DEFAULT_PARAMS["cdelta"] is None
        assert np.isinf(DEFAULT_PARAMS["cutoff"])
        assert len(DEFAULT_PARAMS) == 31  # reference dict size, incl. knobs

    def test_roundtrip_through_profile_ctor(self, cosmo):
        from baryonification_tpu import DEFAULT_PARAMS, default_params
        dmb = DarkMatterBaryon(**DEFAULT_PARAMS)
        # every ctor-known parameter retained verbatim
        for k, v in dmb.model_params.items():
            if k in DEFAULT_PARAMS and DEFAULT_PARAMS[k] is not None:
                assert v == DEFAULT_PARAMS[k], k
        rho = np.asarray(dmb.real(cosmo, np.geomspace(0.05, 5, 8), 1e14,
                                  A_SCALE))
        assert np.all(np.isfinite(rho)) and np.all(rho > 0)
        # override helper: fresh copy, unknown keys rejected
        par = default_params(M_c=10 ** 13.8)
        assert par["M_c"] == 10 ** 13.8 and DEFAULT_PARAMS["M_c"] == 1e14
        with pytest.raises(TypeError):
            default_params(not_a_param=1)
