"""Mead+20 (HMx-calibrated) halo-profile family.

TPU-native re-implementation of
`/root/reference/BaryonForge/Profiles/Mead20.py`: Gaussian-in-log10M
stellar fractions with central/satellite split, Duffy08-concentration NFW,
Komatsu-Seljak-like bound gas, ejected gas with the Schneider & Teyssier
escape-radius equation solved by a local monotone root find, a
feedback-modified-concentration collisionless matter (no iteration),
analytic virial temperature, and the two-phase (bound + warm-ejected)
pressure. Ships the three BAHAMAS-calibrated parameter dicts of Mead+20
Table 2 (`Mead20.py:786-803`).
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.scipy.special import erf

from .. import constants as const
from ..cosmology.concentration import (ConcentrationConstant,
                                       ConcentrationDuffy08)
from . import schneider19 as S19
from . import arico20 as A20
from .arico20 import pchip_local_root
from .schneider19 import sigmoid_cutoff
from .thermodynamic import G, kb_cgs, m_p_Msun

__all__ = ['model_params', 'MeadProfiles', 'DarkMatter', 'TwoHalo',
           'Stars', 'BoundGas', 'EjectedGas', 'Gas', 'CollisionlessMatter',
           'DarkMatterOnly', 'DarkMatterBaryon', 'DarkMatterOnlywithLSS',
           'DarkMatterBaryonwithLSS', 'Temperature', 'Pressure',
           'Params_TAGN_7p6', 'Params_TAGN_7p8', 'Params_TAGN_8p0']


model_params = [
    'cdelta', 'eps1', 'nu_eps1', 'eps2',      # DM / feedback-concentration
    'cutoff', 'proj_cutoff',
    'p', 'q',                                 # two-halo
    'M_0', 'beta', 'Gamma', 'nu_Gamma', 'eta_b',   # gas
    'A_star', 'nu_A_star', 'M_star', 'nu_M_star', 'sigma_star',
    'epsilon_h', 'eta',                       # stars
    'T_w', 'nu_T_w',                          # ejected-gas temperature
    'mean_molecular_weight',
]


class MeadProfiles(A20.AricoProfiles):
    """Family base: Mead vocabulary + stellar fractions
    (`Mead20.py:28-97`)."""

    model_param_names = model_params

    def _concentration(self, cosmo, M, a):
        # Duffy08 default (`Mead20.py:141-146`)
        if self.cdelta is None:
            return ConcentrationDuffy08(self.mass_def)(cosmo, M, a)
        return ConcentrationConstant(self.cdelta, self.mass_def)(cosmo, M, a)

    def _get_fstar(self, M, a):
        """Gaussian-in-log10M stellar fraction with z evolution and
        central/satellite split via (M/M*)^eta (`Mead20.py:35-97`)."""
        z = 1 / a - 1
        Astr = self.A_star + self.nu_A_star * z
        Mstr = self.M_star * jnp.exp(z * self.nu_M_star)
        f_str = Astr * jnp.exp(-(jnp.log10(M / Mstr) / self.sigma_star) ** 2
                               / 2)
        f_str = jnp.where(M > Mstr, jnp.maximum(f_str, Astr / 3), f_str)
        f_cen = f_str * jnp.where(M < Mstr, 1.0,
                                  jnp.power(M / Mstr, self.eta))
        f_sat = f_str * jnp.where(M < Mstr, 0.0,
                                  1 - jnp.power(M / Mstr, self.eta))
        return f_str, f_cen, f_sat

    def _f_bnd(self, cosmo, M, a):
        f_str, _, _ = self._get_fstar(M, a)
        f_bar = cosmo.Omega_b / cosmo.Omega_m
        x = jnp.power(self.M_0 / M, self.beta)
        return (f_bar - f_str) * x / (1 + x)


class DarkMatter(MeadProfiles):
    """NFW hard-truncated at R, Duffy08 c(M) (`Mead20.py:100-170`)."""

    def _real(self, cosmo, r, M, a):
        c = self._concentration(cosmo, M, a)
        R = self.mass_def.get_radius(cosmo, M, a) / a
        r_s = R / c
        norm = 4 * jnp.pi * r_s**3 * (jnp.log(1 + c) - c / (1 + c))
        rho_c = (M / norm)[:, None]
        r_s = r_s[:, None]
        kfac = sigmoid_cutoff(r[None, :], self.cutoff)
        prof = rho_c / (r / r_s * (1 + r / r_s) ** 2) * kfac
        return jnp.where(r[None, :] <= R[:, None], prof, 0.0)


class TwoHalo(S19.TwoHalo, MeadProfiles):
    """S19 two-halo with the Mead vocabulary (`Mead20.py:173-174`)."""


class Stars(MeadProfiles):
    """Central-galaxy Gaussian (S19 functional form with f_cen;
    `Mead20.py:177-233`)."""

    def __init__(self, **kwargs):
        super().__init__(**kwargs)
        self.update_precision_fftlog(padding_lo_fftlog=1e-5,
                                     padding_hi_fftlog=1e5)

    def _real(self, cosmo, r, M, a):
        R = self.mass_def.get_radius(cosmo, M, a) / a
        _, f_cen, _ = self._get_fstar(M, a)
        R_h = (self.epsilon_h * R)[:, None]
        return (f_cen[:, None] * M[:, None] / (4 * jnp.pi**1.5 * R_h)
                / r**2 * jnp.exp(-((r / (2 * R_h)) ** 2)))


class BoundGas(MeadProfiles):
    """Komatsu-Seljak-like (ln(1+x)/x)^(1/(Gamma-1)), per-halo norm over
    [1e-6, R_i], hard cut at R (`Mead20.py:236-319`)."""

    def _real(self, cosmo, r, M, a):
        z = 1 / a - 1
        c = self._concentration(cosmo, M, a)
        R = self.mass_def.get_radius(cosmo, M, a) / a
        r_s = (R / c)[:, None]
        Geff = self.Gamma + self.nu_Gamma * z
        f_bnd = self._f_bnd(cosmo, M, a)[:, None]

        def norm_one(R_i, rs_i):
            r_int = jnp.geomspace(1e-6, R_i, 500)
            x = r_int / rs_i
            shape = jnp.power(jnp.log(1 + x) / x, 1 / (Geff - 1))
            return jnp.trapezoid(4 * jnp.pi * r_int**2 * shape, r_int)

        norm = jax.vmap(norm_one)(R, r_s[:, 0])[:, None]

        x = r / r_s
        kfac = sigmoid_cutoff(r[None, :], self.cutoff)
        prof = jnp.power(jnp.log(1 + x) / x, 1 / (Geff - 1)) * kfac
        prof = jnp.where(r[None, :] <= R[:, None], prof, 0.0)
        return prof * f_bnd * M[:, None] / norm


class EjectedGas(MeadProfiles):
    """Gaussian ejected gas with R_ej solved from the Schneider & Teyssier
    15 / Omori+23 erf equation (`Mead20.py:322-388`)."""

    def _real(self, cosmo, r, M, a):
        R = self.mass_def.get_radius(cosmo, M, a) / a
        f_str, _, _ = self._get_fstar(M, a)
        f_bar = cosmo.Omega_b / cosmo.Omega_m
        f_bnd = self._f_bnd(cosmo, M, a)
        f_ej = ((f_bar - f_str) - f_bnd)[:, None]

        R_esc = 0.5 * jnp.sqrt(200.0) * R[:, None]
        rgrid = jnp.geomspace(1e-2, 100, 100)
        t1 = 1 - erf(self.eta_b * R_esc / jnp.sqrt(2.0) / rgrid)
        t2 = (jnp.sqrt(2 / jnp.pi) * self.eta_b * R_esc / rgrid
              * jnp.exp(-((self.eta_b * R_esc / rgrid) ** 2) / 2))
        diff = t1 + t2 - f_ej / f_bar

        R_ej = jax.vmap(lambda d_i: jnp.exp(
            pchip_local_root(d_i, jnp.log(rgrid))))(diff)[:, None]

        kfac = sigmoid_cutoff(r[None, :], self.cutoff)
        return (f_ej * M[:, None] / jnp.power(2 * jnp.pi * R_ej**2, 1.5)
                * jnp.exp(-(r / R_ej) ** 2 / 2) * kfac)


class Gas(MeadProfiles):
    """BoundGas + EjectedGas (`Mead20.py:391-407`)."""

    def __init__(self, **kwargs):
        self.myprof = BoundGas(**kwargs) + EjectedGas(**kwargs)

    def __getattr__(self, name):
        try:
            mp = self.__dict__['myprof']
        except KeyError:
            raise AttributeError(name)
        return getattr(mp, name)

    def __getstate__(self):
        return self.__dict__.copy()

    def __setstate__(self, state):
        self.__dict__.update(state)

    def _real(self, cosmo, r, M, a):
        return self.myprof._real(cosmo, r, M, a)

    def real(self, cosmo, r, M, a):
        return self.myprof.real(cosmo, r, M, a)

    def projected(self, cosmo, r, M, a):
        return self.myprof.projected(cosmo, r, M, a)


class CollisionlessMatter(MeadProfiles):
    """NFW with feedback-modified concentration
    c -> c (1 + eps1 + (eps2 - eps1) f_bnd/f_bar) and density rescaled by
    (1 - f_bar + f_sat); no iteration (`Mead20.py:410-500`)."""

    def _modify_concentration(self, cosmo, c, M, a):
        z = 1 / a - 1
        f_bar = cosmo.Omega_b / cosmo.Omega_m
        x = jnp.power(self.M_0 / M, self.beta)
        f_bnd = f_bar * x / (1 + x)
        eps1 = self.eps1 + z * self.nu_eps1
        return c * (1 + eps1 + (self.eps2 - eps1) * f_bnd / f_bar)

    def _real(self, cosmo, r, M, a):
        c = self._concentration(cosmo, M, a)
        c = self._modify_concentration(cosmo, c, M, a)
        R = self.mass_def.get_radius(cosmo, M, a) / a
        r_s = R / c
        norm = 4 * jnp.pi * r_s**3 * (jnp.log(1 + c) - c / (1 + c))
        rho_c = M / norm
        _, _, f_sat = self._get_fstar(M, a)
        f_bar = cosmo.Omega_b / cosmo.Omega_m
        rho_c = (rho_c * (1 - f_bar + f_sat))[:, None]
        r_s = r_s[:, None]

        kfac = sigmoid_cutoff(r[None, :], self.cutoff)
        prof = rho_c / (r / r_s * (1 + r / r_s) ** 2) * kfac
        return jnp.where(r[None, :] <= R[:, None], prof, 0.0)


class DarkMatterOnly(DarkMatter):
    """Just the NFW profile — no two-halo term (`Mead20.py:503-508`)."""


class DarkMatterBaryon(S19.DarkMatterBaryon, MeadProfiles):
    """CLM + Stars + Gas renormalized to the DMO mass, no two-halo
    (`Mead20.py:511-595`)."""

    def __init__(self, gas=None, stars=None, collisionlessmatter=None,
                 darkmatter=None, **kwargs):
        self.Gas = gas if gas is not None else Gas(**kwargs)
        self.Stars = stars if stars is not None else Stars(**kwargs)
        self.TwoHalo = TwoHalo(**kwargs) * 0
        self.DarkMatter = (darkmatter if darkmatter is not None
                           else DarkMatter(**kwargs))
        self.CollisionlessMatter = (
            collisionlessmatter if collisionlessmatter is not None
            else CollisionlessMatter(**kwargs))
        MeadProfiles.__init__(self, **kwargs)


class DarkMatterOnlywithLSS(S19.DarkMatterOnly, MeadProfiles):
    """NFW + two-halo (`Mead20.py:598-610`)."""

    def __init__(self, darkmatter=None, twohalo=None, **kwargs):
        self.DarkMatter = (darkmatter if darkmatter is not None
                           else DarkMatter(**kwargs))
        self.TwoHalo = twohalo if twohalo is not None else TwoHalo(**kwargs)
        MeadProfiles.__init__(self, **kwargs)


class DarkMatterBaryonwithLSS(S19.DarkMatterBaryon, MeadProfiles):
    """DMB + two-halo (`Mead20.py:613-631`)."""

    def __init__(self, gas=None, stars=None, collisionlessmatter=None,
                 darkmatter=None, twohalo=None, **kwargs):
        self.Gas = gas if gas is not None else Gas(**kwargs)
        self.Stars = stars if stars is not None else Stars(**kwargs)
        self.TwoHalo = twohalo if twohalo is not None else TwoHalo(**kwargs)
        self.DarkMatter = (darkmatter if darkmatter is not None
                           else DarkMatter(**kwargs))
        self.CollisionlessMatter = (
            collisionlessmatter if collisionlessmatter is not None
            else CollisionlessMatter(**kwargs))
        MeadProfiles.__init__(self, **kwargs)


class Temperature(MeadProfiles):
    """Analytic virial temperature T0 ln(1+x)/x in Kelvin
    (`Mead20.py:634-703`); ``projected`` divides the LoS integral by
    2 r_max to return an average temperature."""

    def _real(self, cosmo, r, M, a):
        c = self._concentration(cosmo, M, a)
        R = self.mass_def.get_radius(cosmo, M, a) / a
        r_s = (R / c)[:, None]
        E0 = (G * M * m_p_Msun * self.mean_molecular_weight / (a * R)
              * const.MSUN_G * const.MPC_CM**2)
        T0 = E0 / (1.5 * kb_cgs)
        x = r / r_s
        return T0[:, None] * jnp.log(1 + x) / x

    def projected(self, cosmo, r, M, a):
        r_max = self.padding_hi_proj * np.max(np.asarray(r))
        if self.proj_cutoff is not None:
            r_max = self.proj_cutoff
        return super().projected(cosmo, r, M, a) / (2 * r_max)


class Pressure(MeadProfiles):
    """Two-phase pressure: P = n_bnd T_bnd k_B + n_ej T_w(z) k_B in CGS
    (`Mead20.py:707-783`)."""

    def __init__(self, boundgas=None, ejectedgas=None, temperature=None,
                 **kwargs):
        self.BoundGas = (boundgas if boundgas is not None
                         else BoundGas(**kwargs))
        self.EjectedGas = (ejectedgas if ejectedgas is not None
                           else EjectedGas(**kwargs))
        self.Temperature = (temperature if temperature is not None
                            else Temperature(**kwargs))
        super().__init__(**kwargs)

    def _n_gas(self, rho):
        return rho / (self.mean_molecular_weight * m_p_Msun) / const.MPC_CM**3

    def _real(self, cosmo, r, M, a):
        z = 1 / a - 1
        T = self.Temperature._real(cosmo, r, M, a)
        n = self._n_gas(self.BoundGas._real(cosmo, r, M, a))
        P1 = T * n * kb_cgs
        T_w = self.T_w * jnp.exp(self.nu_T_w * z)
        n2 = self._n_gas(self.EjectedGas._real(cosmo, r, M, a))
        P2 = T_w * n2 * kb_cgs
        return P1 + P2


# BAHAMAS-calibrated parameter dicts (Mead+20 Table 2; `Mead20.py:786-803`)
Params_TAGN_7p6 = {
    'A_star': 0.0346, 'nu_A_star': -0.0092, 'M_star': 10 ** 12.5506,
    'nu_M_star': -0.4615, 'eta': -0.4970, 'eps1': 0.4021,
    'nu_eps1': 0.0435, 'Gamma': 1.2763, 'nu_Gamma': -0.0554,
    'M_0': 10 ** 13.0978, 'T_w': 10 ** 6.6762, 'nu_T_w': -0.5566,
    'eps2': 0, 'mean_molecular_weight': 0.59, 'eta_b': 0.5,
    'sigma_star': 1.2, 'beta': 0.6, 'epsilon_h': 0.015, 'p': 0.3,
    'q': 0.707}

Params_TAGN_7p8 = {
    'A_star': 0.0342, 'nu_A_star': -0.0105, 'M_star': 10 ** 12.3715,
    'nu_M_star': 0.0149, 'eta': -0.4052, 'eps1': 0.1236,
    'nu_eps1': -0.0187, 'Gamma': 1.2956, 'nu_Gamma': -0.0937,
    'M_0': 10 ** 13.4854, 'T_w': 10 ** 6.6545, 'nu_T_w': -0.3652,
    'eps2': 0, 'mean_molecular_weight': 0.59, 'eta_b': 0.5,
    'sigma_star': 1.2, 'beta': 0.6, 'epsilon_h': 0.015, 'p': 0.3,
    'q': 0.707}

Params_TAGN_8p0 = {
    'A_star': 0.0321, 'nu_A_star': -0.0094, 'M_star': 10 ** 12.3032,
    'nu_M_star': -0.0817, 'eta': -0.3443, 'eps1': -0.1158,
    'nu_eps1': 0.1408, 'Gamma': 1.2861, 'nu_Gamma': -0.1382,
    'M_0': 10 ** 14.1254, 'T_w': 10 ** 6.6615, 'nu_T_w': -0.0617,
    'eps2': 0, 'mean_molecular_weight': 0.59, 'eta_b': 0.5,
    'sigma_star': 1.2, 'beta': 0.6, 'epsilon_h': 0.015, 'p': 0.3,
    'q': 0.707}
