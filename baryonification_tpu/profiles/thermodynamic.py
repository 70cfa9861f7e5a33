"""Thermodynamic profiles: pressure, temperature, gas density, Compton-y.

TPU-native re-implementation of
`/root/reference/BaryonForge/Profiles/Thermodynamic.py`: hydrostatic
pressure (inward cumulative integral of dP/dr = -G M(<r) rho_gas / r^2),
Pandey+25 and Green+20 non-thermal fractions, electron pressure, gas number
density, ideal-gas temperature, and the Compton-y (tSZ) projection. CGS
output conventions match the reference exactly.
"""

import jax
import jax.numpy as jnp

from .. import constants as const
from ..cosmology.massdef import MassDef, mass_translator
from ..cosmology.concentration import ConcentrationDiemer15
from .base import HaloProfile
from .schneider19 import (SchneiderProfiles, Gas, DarkMatterBaryon, TwoHalo,
                          model_params, sigmoid_cutoff)

__all__ = ['Pressure', 'NonThermalFrac', 'NonThermalFracGreen20',
           'Temperature', 'ThermalSZ', 'ElectronPressure', 'GasNumberDensity',
           'XrayLuminosity']

# CGS-facing constants (reference `Thermodynamic.py:9-38`)
G = const.G_SI / const.MPC_M**3 * const.MSUN_KG     # Mpc^3 / (Msun s^2)
kb_cgs = const.K_BOLTZMANN                          # erg / K
Pth_to_Pe = const.PTH_TO_PE
Pressure_at_infinity = const.PRESSURE_AT_INFINITY
m_p_Msun = const.M_PROTON_G / const.MSUN_G          # proton mass in Msun


class BaseThermodynamicProfile(SchneiderProfiles):
    """Thermodynamic base: same vocabulary as SchneiderProfiles but missing
    params default to None (no mu/nu/zeta/M_* magic;
    `Thermodynamic.py:45-91`)."""

    model_param_names = model_params

    def __init__(self, mass_def=None, **kwargs):
        known = {m: kwargs[m] for m in self.model_param_names if m in kwargs}
        extra = {k: v for k, v in kwargs.items()
                 if k not in self.model_param_names}
        HaloProfile.__init__(self, mass_def=mass_def, **extra)
        for m in self.model_param_names:
            setattr(self, m, known.get(m, None))
        self.cutoff = kwargs.get('cutoff', 1e3)
        self.proj_cutoff = kwargs.get('proj_cutoff', self.cutoff)


class Pressure(BaseThermodynamicProfile):
    """Hydrostatic-equilibrium total gas pressure in CGS (barye).

    dP/dr = -G M_tot(<r) rho_gas / r^2, integrated inward from r -> inf
    (reversed cumulative sum; `Thermodynamic.py:246-258`). The default mass
    profile is the one-halo DMB: DarkMatterBaryon - TwoHalo
    (`Thermodynamic.py:163`).
    """

    def __init__(self, gas=None, darkmatterbaryon=None, **kwargs):
        self.Gas = gas if gas is not None else Gas(**kwargs)
        if darkmatterbaryon is None:
            darkmatterbaryon = DarkMatterBaryon(**kwargs) - TwoHalo(**kwargs)
        self.DarkMatterBaryon = darkmatterbaryon
        self.Gas.set_parameter('cutoff', 1000)
        self.DarkMatterBaryon.set_parameter('cutoff', 1000)
        super().__init__(**kwargs)

    def _real(self, cosmo, r, M, a):
        from ..ops.interp import pchip_derivatives, pchip_eval

        r_int = jnp.geomspace(1e-6, 1000, 500)
        lnr_int = jnp.log(r_int)
        dlnr = lnr_int[1] - lnr_int[0]

        rho_total = self.DarkMatterBaryon._real(cosmo, r_int, M, a)
        rho_gas = self.Gas._real(cosmo, r_int, M, a)

        M_total = 4 * jnp.pi * jnp.cumsum(r_int**3 * rho_total * dlnr, axis=-1)
        dP_dr = -G * M_total * rho_gas / r_int**2

        # inward integral, boundary P(inf)=0: reversed cumsum
        integ = (dP_dr * r_int)[..., ::-1] * dlnr
        prof = -jnp.cumsum(integ, axis=-1)[..., ::-1]

        lnP = jnp.log(prof + Pressure_at_infinity)
        d = pchip_derivatives(lnr_int, lnP)
        out = jax.vmap(lambda y, dd: pchip_eval(jnp.log(r), lnr_int, y, dd,
                                                extrapolate=False))(lnP, d)
        out = jnp.exp(out) - Pressure_at_infinity
        out = jnp.where(jnp.isfinite(out), out, 0.0)

        # [Msun Mpc^-1 s^-2] -> CGS barye (`Thermodynamic.py:265`)
        out = out * const.MSUN_G / const.MPC_CM
        return out * sigmoid_cutoff(r[None, :], self.cutoff)


class NonThermalFrac(BaseThermodynamicProfile):
    """Pandey+25 non-thermal fraction: f_nt = alpha f(z) (r/R)^gamma, clipped
    to [0, 1] (`Thermodynamic.py:282-367`). Multiply into Pressure:
    ``Pressure(**kw) * (1 - NonThermalFrac(**kw))``."""

    def __init__(self, alpha_nt, nu_nt, gamma_nt, **kwargs):
        super().__init__(**kwargs)
        self.alpha_nt = alpha_nt
        self.nu_nt = nu_nt
        self.gamma_nt = gamma_nt

    def _real(self, cosmo, r, M, a):
        z = 1 / a - 1
        R = self.mass_def.get_radius(cosmo, M, a) / a
        f_max = 6.0 ** -self.gamma_nt / self.alpha_nt
        f_z = jnp.minimum((1 + z) ** self.nu_nt,
                          (f_max - 1) * jnp.tanh(self.nu_nt * z) + 1)
        f_nt = self.alpha_nt * f_z * (r[None, :] / R[:, None]) ** self.gamma_nt
        return jnp.clip(f_nt, 0.0, 1.0)


class NonThermalFracGreen20(BaseThermodynamicProfile):
    """Green+20 fixed-parameter non-thermal fraction vs r/R200m and peak
    height (`Thermodynamic.py:371-427`). No free parameters."""

    def __init__(self, concentration=None, **kwargs):
        super().__init__(**kwargs)
        self.concentration = (concentration if concentration is not None
                              else ConcentrationDiemer15(self.mass_def))

    def _real(self, cosmo, r, M, a):
        mdef_m = MassDef(200, 'matter')
        M200m = mass_translator(cosmo, M, a, self.mass_def, mdef_m,
                                self.concentration)
        # NOTE: mirrors the reference, which computes R200m from the
        # *input* mass (`Thermodynamic.py:413`)
        R200m = mdef_m.get_radius(cosmo, M, a) / a
        x = r[None, :] / R200m[:, None]
        pa, pb, pc, pd, pe, pf = 0.495, 0.719, 1.417, -0.166, 0.265, -2.116
        nu_M = (const.DELTA_COLLAPSE / cosmo.sigmaM(M200m, a))[:, None]
        return 1 - pa * (1 + jnp.exp(-((x / pb) ** pc))) \
            * (nu_M / 4.1) ** (pd / (1 + (x / pe) ** pf))


class ElectronPressure(Pressure):
    """P_e = Pth_to_Pe * P_gas (`Thermodynamic.py:431-457`)."""

    def _real(self, cosmo, r, M, a):
        return Pth_to_Pe * super()._real(cosmo, r, M, a)


class GasNumberDensity(BaseThermodynamicProfile):
    """n_gas = rho_gas / (mu m_p), per cm^3 (`Thermodynamic.py:460-529`)."""

    def __init__(self, gas=None, mean_molecular_weight=1.15, **kwargs):
        self.Gas = gas if gas is not None else Gas(**kwargs)
        super().__init__(**kwargs)
        self.mean_molecular_weight = mean_molecular_weight

    def _real(self, cosmo, r, M, a):
        rho = self.Gas._real(cosmo, r, M, a)
        return rho / (self.mean_molecular_weight * m_p_Msun) / const.MPC_CM**3


class Temperature(BaseThermodynamicProfile):
    """Ideal-gas temperature T = P / (n k_B) in Kelvin
    (`Thermodynamic.py:532-658`). The input pressure must be the *thermal*
    pressure (non-thermal fraction already applied)."""

    def __init__(self, pressure=None, gasnumberdensity=None, **kwargs):
        if pressure is None:
            pressure = Pressure(**kwargs) * (1 - NonThermalFrac(**kwargs))
        self.Pressure = pressure
        self.GasNumberDensity = (gasnumberdensity if gasnumberdensity
                                 is not None else GasNumberDensity(**kwargs))
        super().__init__(**kwargs)

    def _real(self, cosmo, r, M, a):
        P = self.Pressure._real(cosmo, r, M, a)
        n = self.GasNumberDensity._real(cosmo, r, M, a)
        prof = jnp.where(n == 0, 0.0, P / jnp.where(n == 0, 1.0, n) / kb_cgs)
        return prof

    def projected(self, cosmo, r, M, a):
        """LoS-average temperature: ratio of projected P and n
        (`Thermodynamic.py:605-658`)."""
        P = self.Pressure.projected(cosmo, r, M, a)
        n = self.GasNumberDensity.projected(cosmo, r, M, a)
        return jnp.where(n == 0, 0.0, P / jnp.where(n == 0, 1.0, n) / kb_cgs)


class ThermalSZ(BaseThermodynamicProfile):
    """Compton-y: projected pressure * a * Mpc->cm * sigma_T/(m_e c^2) *
    Pgas_to_Pe (`Thermodynamic.py:662-776`). ``real()`` returns the -99
    sentinel so the profile can ride through TabulatedProfile."""

    def __init__(self, pressure=None, **kwargs):
        self.pressure = pressure if pressure is not None else Pressure(**kwargs)
        super().__init__(**kwargs)

    def Pgas_to_Pe(self, cosmo, r, M, a):
        return Pth_to_Pe

    def projected(self, cosmo, r, M, a):
        r_use = jnp.atleast_1d(jnp.asarray(r, dtype=jnp.float64))
        M_use = jnp.atleast_1d(jnp.asarray(M, dtype=jnp.float64))
        prof = self.pressure.projected(cosmo, r_use, M_use, a)
        prof = prof * a * const.MPC_CM
        prof = prof * const.SIGMA_THOMSON / (const.M_ELECTRON_G
                                             * const.C_LIGHT_CGS**2)
        prof = prof * self.Pgas_to_Pe(cosmo, r_use, M_use, a)
        if jnp.ndim(r) == 0:
            prof = jnp.squeeze(prof, axis=-1)
        if jnp.ndim(M) == 0:
            prof = jnp.squeeze(prof, axis=0)
        return prof

    def real(self, cosmo, r, M, a):
        r_use = jnp.atleast_1d(jnp.asarray(r))
        M_use = jnp.atleast_1d(jnp.asarray(M))
        return jnp.full((M_use.size, r_use.size), -99.0)

    def _real(self, cosmo, r, M, a):
        return jnp.nan

    def _projected(self, cosmo, r, M, a):
        return jnp.nan


class XrayLuminosity(BaseThermodynamicProfile):
    """n^2 T (X-ray-like emissivity). The reference raises
    NotImplementedError pending cooling-function calibration
    (`Thermodynamic.py:784`); we keep the same guard."""

    def __init__(self, temperature=None, gasnumberdensity=None, **kwargs):
        raise NotImplementedError(
            "XrayLuminosity is not calibrated (missing cooling factors); "
            "the reference raises here too.")
