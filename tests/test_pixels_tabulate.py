"""Pixel-window, ConvolvedProfile and tabulation tests."""

import numpy as np
import pytest

import jax.numpy as jnp

from baryonification_tpu.pixels import (ConvolvedProfile, GridPixelApprox,
                                        HealPixel, NoPix, _nside2resol)
from baryonification_tpu.profiles import Gas, HaloProfile
from baryonification_tpu.tabulate import (TabulatedProfile,
                                          ParamTabulatedProfile,
                                          TabulatedCorrelation3D)

from test_profiles import PAR

A_SCALE = 0.8


class TestWindows:
    def test_nopix_identity(self):
        k = np.geomspace(0.1, 10, 16)
        np.testing.assert_allclose(np.asarray(NoPix().projected(k)), 1.0)
        np.testing.assert_allclose(np.asarray(NoPix().real(k)), 1.0)

    def test_grid_pixel_limits(self):
        px = GridPixelApprox(size=0.5)
        k = np.array([1e-6, 1e3])
        b = np.asarray(px.projected(k))
        assert abs(b[0] - 1.0) < 1e-8      # k->0: no smoothing
        assert abs(b[1]) < 0.05            # k->inf: suppressed

    def test_healpixel(self):
        px = HealPixel(NSIDE=128)
        assert px.isHarmonic
        assert abs(px.size - _nside2resol(128)) < 1e-15
        ells = np.array([1.0, 3 * 128.0])
        b = np.asarray(px.projected(ells))
        assert b[0] > 0.999
        assert b[1] < 0.9
        assert np.all(np.asarray(px.real(ells)) == 0)  # poisoned 3D use


class GaussProfile(HaloProfile):
    """3D Gaussian with closed-form transforms, for convolution tests."""
    s = 0.4

    def _real(self, cosmo, r, M, a):
        M = jnp.atleast_1d(jnp.asarray(M))
        prof = jnp.exp(-0.5 * (r / self.s) ** 2)
        return jnp.broadcast_to(prof[None, :], (M.shape[0], r.shape[0]))


class TestConvolvedProfile:
    def test_nopix_roundtrip(self, cosmo):
        """Convolving with the identity window returns the profile
        (FFTLog round trip * (2 pi)^3)."""
        g = GaussProfile()
        cp = ConvolvedProfile(g, NoPix())
        r = np.geomspace(0.05, 2, 24)
        got = np.asarray(cp.real(cosmo, r, 1e14, A_SCALE))
        want = np.exp(-0.5 * (r / g.s) ** 2)
        np.testing.assert_allclose(got.ravel(), want, rtol=2e-2, atol=1e-4)

    def test_tophat_smoothing_conserves(self, cosmo):
        """A window with W(0)=1 conserves the profile integral and
        suppresses small-scale structure."""
        g = GaussProfile()
        px = GridPixelApprox(size=0.3)
        cp = ConvolvedProfile(g, px)
        r = np.geomspace(0.02, 3, 200)
        raw = np.exp(-0.5 * (r / g.s) ** 2)
        conv = np.asarray(cp.real(cosmo, r, 1e14, A_SCALE)).ravel()
        m_raw = np.trapezoid(4 * np.pi * r**2 * raw, r)
        m_conv = np.trapezoid(4 * np.pi * r**2 * conv, r)
        assert abs(m_conv / m_raw - 1) < 0.05
        assert conv[0] < raw[0]  # central value smoothed down

    def test_attribute_delegation(self, cosmo):
        gas = Gas(**PAR)
        cp = ConvolvedProfile(gas, GridPixelApprox(0.2))
        assert cp.theta_ej == gas.theta_ej
        assert cp.mass_def is gas.mass_def

    def test_pickling(self, cosmo):
        import pickle
        cp = ConvolvedProfile(Gas(**PAR), GridPixelApprox(0.2))
        cp2 = pickle.loads(pickle.dumps(cp))
        assert cp2.Pixel.size == 0.2


class TestTabulatedProfile:
    @pytest.fixture(scope="class")
    def tab(self, cosmo):
        t = TabulatedProfile(Gas(**PAR), cosmo)
        # reference-default radial resolution (100 points); coarser grids
        # visibly degrade the steep theta_ej tail
        t.setup_interpolator(z_min=0.1, z_max=0.5, N_samples_z=4,
                            M_min=1e13, M_max=1e15, N_samples_Mass=8,
                            R_min=1e-2, R_max=30, N_samples_R=100)
        return t

    def test_real_matches_model(self, cosmo, tab):
        # table-resolution limited in the steep theta_ej tail, like the
        # reference's 100-point tables
        r = np.geomspace(0.05, 5, 12)
        got = np.asarray(tab.real(cosmo, r, 1e14, 0.8))
        want = np.asarray(Gas(**PAR).real(cosmo, r, 1e14, 0.8))
        np.testing.assert_allclose(got, want, rtol=6e-2)

    def test_projected_includes_a(self, cosmo, tab):
        """Tabulated projected stores projected * a (the comoving ->
        physical LoS conversion, `Tabulate.py:226`).

        Raw-table parity is exact when the direct call uses the table's
        own radii (the projection quadrature grid depends on the input
        radii, so off-grid comparisons carry few-percent trapz noise —
        same property as the reference, `Schneider19.py:225-233`).
        """
        z_node = float(np.exp(tab.raw_input_z_range[2]) - 1)
        a_node = 1.0 / (1.0 + z_node)
        r_table = np.exp(tab.raw_input_r_range)
        want = np.asarray(Gas(**PAR).projected(
            cosmo, r_table, np.exp(tab.raw_input_M_range), a_node)) * a_node
        np.testing.assert_allclose(tab.raw_input_2D[2], want, rtol=1e-10)
        # readout at the table nodes reproduces the stored values
        M_node = float(np.exp(tab.raw_input_M_range[5]))
        got = np.asarray(tab.projected(cosmo, r_table[10:60:7], M_node,
                                       a_node))
        np.testing.assert_allclose(got, tab.raw_input_2D[2, 5, 10:60:7],
                                   rtol=1e-6)

    def test_out_of_bounds_nan(self, cosmo, tab):
        out = np.asarray(tab.real(cosmo, np.array([100.0]), 1e14, 0.8))
        assert np.isnan(out[0])

    def test_unbuilt_raises(self, cosmo):
        t = TabulatedProfile(Gas(**PAR), cosmo)
        with pytest.raises(NameError):
            t.real(cosmo, 1.0, 1e14, 0.8)

    def test_rejects_other_params(self, cosmo):
        """TabulatedProfile has no parameter axes: other_params must raise
        (not be silently ignored) and point at ParamTabulatedProfile."""
        t = TabulatedProfile(Gas(**PAR), cosmo)
        with pytest.raises(ValueError, match="ParamTabulatedProfile"):
            t.setup_interpolator(other_params={'theta_ej': np.array([2.0])})

    def test_pickle(self, cosmo, tab):
        import pickle
        t2 = pickle.loads(pickle.dumps(tab))
        r = np.geomspace(0.1, 5, 4)
        np.testing.assert_allclose(
            np.asarray(t2.real(cosmo, r, 1e14, 0.8)),
            np.asarray(tab.real(cosmo, r, 1e14, 0.8)), rtol=1e-12)


class TestParamTabulated:
    def test_param_axis(self, cosmo):
        t = ParamTabulatedProfile(Gas(**PAR), cosmo)
        t.setup_interpolator(z_min=0.1, z_max=0.5, N_samples_z=3,
                             M_min=1e13, M_max=1e15, N_samples_Mass=6,
                             R_min=1e-2, R_max=30, N_samples_R=32,
                             other_params={'theta_ej': np.array([2., 4., 8.])})
        r = np.geomspace(0.1, 5, 8)
        lo = np.asarray(t.real(cosmo, r, 1e14, 0.8, theta_ej=2.0))
        hi = np.asarray(t.real(cosmo, r, 1e14, 0.8, theta_ej=8.0))
        assert not np.allclose(lo, hi)
        with pytest.raises(AssertionError):
            t.real(cosmo, r, 1e14, 0.8)
        # interpolated value at the node matches a direct evaluation
        gas = Gas(**dict(PAR, theta_ej=4.0))
        want = np.asarray(gas.real(cosmo, r, 1e14, 0.8))
        got = np.asarray(t.real(cosmo, r, 1e14, 0.8, theta_ej=4.0))
        np.testing.assert_allclose(got, want, rtol=8e-2)

    def test_rejects_tabulated_input(self, cosmo):
        t = TabulatedProfile(Gas(**PAR), cosmo)
        with pytest.raises(AssertionError):
            ParamTabulatedProfile(t, cosmo)


class TestTabulatedCorrelation:
    def test_matches_cosmo_xi(self, cosmo):
        t = TabulatedCorrelation3D(cosmo, R_range=(1e-2, 200), N_samples=400)
        t.setup_interpolator(z_min=0.0, z_max=1.0, N_samples_z=8)
        r = np.geomspace(0.1, 50, 16)
        got = np.asarray(t(r, 0.8))
        want = np.asarray(cosmo.xi_mm(r, 0.8))
        np.testing.assert_allclose(got, want, rtol=2e-2)
