"""Displacement-model tests: inversion correctness and physical limits."""

import numpy as np
import pytest

import jax.numpy as jnp

from baryonification_tpu.cosmology import Cosmology, MassDef
from baryonification_tpu.displacement import (Baryonification3D,
                                              Baryonification2D,
                                              _invert_mass_profile)
from baryonification_tpu.profiles import DarkMatterOnly, DarkMatterBaryon

from test_profiles import PAR

SMALL = dict(z_min=0.1, z_max=0.5, N_samples_z=3,
             M_min=1e13, M_max=1e15, N_samples_Mass=6,
             R_min=1e-3, R_max=1e2, N_samples_R=64)


class TestInversion:
    def test_identity(self):
        """DMO == DMB => displacement 0 (separation mask kills all points,
        profile degrades softly to d = 0)."""
        lnr = np.log(np.geomspace(1e-3, 100, 64))
        lnM = np.log(1e13 * np.exp(lnr))  # monotone masses
        off, ok = _invert_mass_profile(jnp.asarray(lnr), jnp.asarray(lnM),
                                       jnp.asarray(lnM))
        np.testing.assert_allclose(np.asarray(off), 0.0, atol=1e-10)

    def test_known_shift(self):
        """If M_DMB(r) = M_DMO(r / (1+s)), then d(r) = s * r exactly."""
        r = np.geomspace(1e-3, 100, 64)
        lnr = np.log(r)
        s = 0.05
        # use a curved but monotone mass profile
        lnM_dmo = np.log(1e13) + 1.5 * lnr + 0.05 * lnr**2 / 10
        lnM_dmb = np.log(1e13) + 1.5 * (lnr - np.log(1 + s)) \
            + 0.05 * (lnr - np.log(1 + s))**2 / 10
        off, ok = _invert_mass_profile(jnp.asarray(lnr),
                                       jnp.asarray(lnM_dmo),
                                       jnp.asarray(lnM_dmb))
        off = np.asarray(off)
        interior = slice(4, -4)
        np.testing.assert_allclose(off[interior], s * r[interior], rtol=1e-4)

    def test_broken_profile_gives_zero(self):
        lnr = np.log(np.geomspace(1e-3, 100, 64))
        lnM = np.full(64, 30.0)  # constant mass -> degenerate
        off, ok = _invert_mass_profile(jnp.asarray(lnr), jnp.asarray(lnM),
                                       jnp.asarray(lnM))
        assert not bool(ok)
        np.testing.assert_allclose(np.asarray(off), 0.0)


class TestScipyParity:
    def test_inversion_matches_scipy_pipeline(self, cosmo):
        """The fixed-shape masked inversion reproduces a direct scipy
        re-implementation of the reference's algorithm
        (`BaryonCorrection.py:237-284`) on real DMO/DMB mass profiles."""
        from scipy.interpolate import PchipInterpolator

        DMO = DarkMatterOnly(**PAR)
        DMB = DarkMatterBaryon(**PAR)
        model = Baryonification3D(DMO, DMB, cosmo, epsilon_max=20)

        r = np.geomspace(1e-3, 1e2, 100)
        M_dmo = np.asarray(model.get_masses(DMO, r, np.array([1e14]),
                                            0.8))[0]
        M_dmb = np.asarray(model.get_masses(DMB, r, np.array([1e14]),
                                            0.8))[0]

        # ---- scipy path (reference masking semantics) ----
        ln_DMB, ln_DMO = np.log(M_dmb), np.log(M_dmo)
        diff_mask = np.ones_like(ln_DMB, dtype=bool)
        for _ in range(30):
            new_mask = ((np.diff(ln_DMB[diff_mask], prepend=0) > 1e-5)
                        & ((np.abs(ln_DMB - ln_DMO)[diff_mask] > 1e-6)
                           | np.isnan(ln_DMO)[diff_mask])
                        & np.isfinite(ln_DMB)[diff_mask])
            prev = diff_mask.copy()
            diff_mask[diff_mask] = new_mask
            diff_mask[0] = True
            if np.array_equal(prev, diff_mask):
                break
        fini_mask = ((np.diff(ln_DMO, prepend=0) > 1e-5)
                     & ((np.abs(ln_DMB - ln_DMO) > 1e-6)
                        | np.isnan(ln_DMB))
                     & np.isfinite(ln_DMO))
        i_dmb = PchipInterpolator(ln_DMB[diff_mask], np.log(r)[diff_mask],
                                  extrapolate=False)
        i_dmo = PchipInterpolator(np.log(r)[fini_mask], ln_DMO[fini_mask],
                                  extrapolate=False)
        want = np.exp(i_dmb(i_dmo(np.log(r)))) - r
        want = np.where(np.isfinite(want), want, 0.0)

        # ---- jitted fixed-shape path ----
        got, ok = _invert_mass_profile(jnp.asarray(np.log(r)),
                                       jnp.asarray(ln_DMO),
                                       jnp.asarray(ln_DMB))
        got = np.asarray(got)
        assert bool(ok)
        np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-8)


@pytest.fixture(scope="module")
def bfc3(cosmo):
    DMO = DarkMatterOnly(**PAR)
    DMB = DarkMatterBaryon(**PAR)
    model = Baryonification3D(DMO, DMB, cosmo, epsilon_max=20)
    model.setup_interpolator(**SMALL)
    return model


class TestBaryonification3D:
    def test_table_shape(self, bfc3):
        assert bfc3.raw_input_d.shape == (3, 6, 64)
        assert np.all(np.isfinite(bfc3.raw_input_d))

    def test_displacement_small_at_large_r(self, bfc3, cosmo):
        """d -> 0 as r -> large (DMO and DMB masses converge;
        epsilon_max zeroing also applies)."""
        r = np.geomspace(0.01, 80, 48)
        d = np.asarray(bfc3.displacement(r, 1e14, 0.8))
        R = float(MassDef(200, 'critical').get_radius(cosmo, 1e14, 0.8)) / 0.8
        assert abs(d[-1]) < 1e-3
        assert np.all(d[r > 20 * R] == 0.0)

    def test_displacement_magnitude_sane(self, bfc3):
        """|d| is a small fraction of r for the default model."""
        r = np.geomspace(0.05, 10, 32)
        d = np.asarray(bfc3.displacement(r, 1e14, 0.8))
        assert np.all(np.abs(d) < r)
        assert np.any(d != 0)
        # classic displacement-function shape: inward at small r (stellar
        # contraction), outward bump near the halo scale (gas ejection)
        assert d[0] < 0 and np.max(d) > 0

    def test_gas_expansion_sign(self, bfc3):
        """Baryonification moves mass outward at the ejection scale
        (theta_ej = 4 pushes gas out): net positive displacement
        somewhere in 0.1-5 Mpc."""
        r = np.geomspace(0.1, 5, 32)
        d = np.asarray(bfc3.displacement(r, 1e14, 0.8))
        assert np.max(d) > 0

    def test_requires_setup(self, cosmo):
        model = Baryonification3D(DarkMatterOnly(**PAR),
                                  DarkMatterBaryon(**PAR), cosmo)
        with pytest.raises(NameError):
            model.displacement(1.0, 1e14, 0.8)

    def test_missing_param_key_asserts(self, cosmo):
        DMO = DarkMatterOnly(**PAR)
        DMB = DarkMatterBaryon(**PAR)
        model = Baryonification3D(DMO, DMB, cosmo)
        model.setup_interpolator(
            z_min=0.2, z_max=0.4, N_samples_z=2,
            M_min=1e13, M_max=1e15, N_samples_Mass=4,
            R_min=1e-2, R_max=10, N_samples_R=32,
            other_params={'theta_ej': np.array([2.0, 4.0, 8.0])})
        with pytest.raises(AssertionError):
            model.displacement(1.0, 1e14, 0.8)
        d_lo = np.asarray(model.displacement(
            np.geomspace(0.1, 5, 16), 1e14, 0.8, theta_ej=2.0))
        d_hi = np.asarray(model.displacement(
            np.geomspace(0.1, 5, 16), 1e14, 0.8, theta_ej=8.0))
        assert not np.allclose(d_lo, d_hi)


class TestBaryonification2D:
    def test_end_to_end_small(self, cosmo):
        DMO = DarkMatterOnly(**PAR)
        DMB = DarkMatterBaryon(**PAR)
        model = Baryonification2D(DMO, DMB, cosmo, epsilon_max=20)
        model.setup_interpolator(z_min=0.2, z_max=0.4, N_samples_z=2,
                                 M_min=1e13, M_max=1e15, N_samples_Mass=4,
                                 R_min=1e-2, R_max=30, N_samples_R=48)
        r = np.geomspace(0.05, 10, 24)
        d = np.asarray(model.displacement(r, 1e14, 0.8))
        assert np.all(np.isfinite(d))
        assert np.any(d != 0)
        assert np.all(np.abs(d) < r)

        # checkpoint contract (reference keeps models picklable via
        # destory_Pk, `utils/misc.py:130-157`; here tables are plain
        # arrays so round-tripping is exact)
        import pickle
        m2 = pickle.loads(pickle.dumps(model))
        np.testing.assert_allclose(np.asarray(m2.displacement(r, 1e14,
                                                              0.8)),
                                   d, rtol=1e-12)

        # save/load table round trip (npz checkpoint)
        import tempfile, os
        with tempfile.TemporaryDirectory() as td:
            path = os.path.join(td, "tab.npz")
            model.save_table(path)
            m3 = Baryonification2D(DarkMatterOnly(**PAR),
                                   DarkMatterBaryon(**PAR), cosmo,
                                   epsilon_max=20)
            m3.load_table(path)
            np.testing.assert_allclose(
                np.asarray(m3.displacement(r, 1e14, 0.8)), d, rtol=1e-12)
