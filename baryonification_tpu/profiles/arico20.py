"""Arico+20 (BACCO) halo-profile family.

TPU-native re-implementation of
`/root/reference/BaryonForge/Profiles/Arico20.py`: hard-truncated NFW,
Behroozi+13-style stellar fractions, the BoundGas/EjectedGas/ReaccretedGas
decomposition with gas-fraction bookkeeping, ModifiedDarkMatter (eq. A10
of Arico+19 solved by a vectorized local root find), per-halo adiabatic
relaxation on halo-scaled grids, polytropic pressure (Arico+24 eq. 5),
Green20-style non-thermal fraction with free amplitude, and temperature.

Per-halo Python loops in the reference (BoundGas normalization
`Arico20.py:397-409`, CollisionlessMatter `:760-841`) become vmaps over
halo-scaled fixed-size radial grids.
"""

import jax
import jax.numpy as jnp
from jax.scipy.special import erf

from .. import constants as const
from ..cosmology.concentration import ConcentrationDiemer15
from . import schneider19 as S19
from .schneider19 import sigmoid_cutoff
from .thermodynamic import G, kb_cgs, m_p_Msun

__all__ = ['model_params', 'AricoProfiles',
           'DarkMatter', 'TwoHalo', 'Stars', 'Gas', 'BoundGas',
           'EjectedGas', 'ReaccretedGas', 'ModifiedDarkMatter',
           'CollisionlessMatter', 'DarkMatterOnly', 'DarkMatterBaryon',
           'DarkMatterOnlywithLSS', 'DarkMatterBaryonwithLSS',
           'Pressure', 'NonThermalFrac', 'Temperature',
           'ExtendedBoundGas', 'BoundGasDeprecated']


model_params = [
    'cdelta', 'a', 'n',                       # DM + relaxation
    'q', 'p',                                 # two-halo
    'cutoff', 'proj_cutoff',                  # numerical cutoffs
    'theta_out', 'theta_inn', 'M_inn', 'M_c', 'mu', 'beta',
    'M_r', 'beta_r', 'eta', 'theta_rg', 'sigma_rg', 'epsilon_hydro',
    'alpha_sat', 'M1_0', 'alpha_g', 'epsilon_h',   # stars
    'A_nt', 'alpha_nt',                       # pressure
    'mean_molecular_weight',
]


def pchip_local_root(x, lny):
    """Zero of the curve x(lny) via monotone interpolation of a 10-point
    window around the sign change (vectorize with vmap; mirrors the
    reference's `_safe_Pchip_minimize`, `Arico20.py:651-659`)."""
    from ..ops.interp import pchip_derivatives, pchip_eval
    i0 = jnp.clip(jnp.argmin(jnp.abs(x)), 5, x.shape[0] - 6)
    xw = jax.lax.dynamic_slice_in_dim(x, i0 - 5, 10)
    yw = jax.lax.dynamic_slice_in_dim(lny, i0 - 5, 10)
    # enforce increasing x for the monotone interpolation
    sign = jnp.sign(xw[-1] - xw[0])
    xw = xw * sign
    order = jnp.argsort(xw)
    xw, yw = xw[order], yw[order]
    d = pchip_derivatives(xw, yw)
    return pchip_eval(jnp.asarray(0.0), xw, yw, d)


class AricoProfiles(S19.SchneiderProfiles):
    """Family base: own parameter vocabulary (all unset params -> None,
    `Arico20.py:37-54`), gas parameter scalings and Behroozi-style star
    fractions."""

    model_param_names = model_params

    def __init__(self, **kwargs):
        super().__init__(**kwargs)
        for m in self.model_param_names:
            setattr(self, m, kwargs.get(m, None))
        self.cutoff = kwargs.get('cutoff', 1e3)
        self.proj_cutoff = kwargs.get('proj_cutoff', self.cutoff)

    def _get_gas_params(self, M, z):
        """beta = 3 - (M_inn/M)^mu; constant theta_out/theta_inn
        (`Arico20.py:57-98`). Returns (M, 1) columns."""
        beta = 3.0 - jnp.power(self.M_inn / M, self.mu) * jnp.ones_like(M)
        theta_out = self.theta_out * jnp.ones_like(M)
        theta_inn = self.theta_inn * jnp.ones_like(M)
        return beta[:, None], theta_out[:, None], theta_inn[:, None]

    def _get_star_frac(self, M, z, satellite=False):
        """Behroozi+13 fitting function with Kravtsov+18 values
        (eq. A16-17 of Arico+19; `Arico20.py:99-177`)."""
        M1_a, M1_z = -1.793, -0.251
        eps_0, eps_a, eps_a2 = jnp.log10(0.023), -0.006, -0.119
        alpha_0, alpha_a = -1.779, 0.731
        delta_0, delta_a, delta_z = 4.394, 2.608, -0.043
        gamma_0, gamma_a, gamma_z = 0.547, 1.319, 0.279

        a = 1.0 / (1.0 + z)
        nu = jnp.exp(-4.0 * a**2)
        M1 = self.M1_0 * 10.0 ** ((M1_a * (a - 1) + M1_z * z) * nu)
        eps = 10.0 ** (eps_0 + nu * (eps_a * (a - 1)) + eps_a2 * (a - 1))
        alpha = alpha_0 + nu * (alpha_a * (a - 1))
        delta = delta_0 + nu * (delta_a * (a - 1) + delta_z * z)
        gamma = gamma_0 + nu * (gamma_a * (a - 1) + gamma_z * z)

        if satellite:
            M1 = jnp.power(M1, self.alpha_sat)
            eps = jnp.power(eps, self.alpha_sat)
            alpha = alpha * self.alpha_sat
            delta = delta * self.alpha_sat
            gamma = gamma * self.alpha_sat

        x = jnp.log10(M / M1)
        g_x = (-jnp.log10(10.0**(alpha * x) + 1)
               + delta * jnp.log10(1 + jnp.exp(x)) ** gamma
               / (1 + jnp.exp(10.0 ** (-x))))
        g_0 = (-jnp.log10(2.0)
               + delta * jnp.log10(2.0) ** gamma / (1 + jnp.e))
        return eps * (M1 / M) * 10.0 ** (g_x - g_0)

    def _gas_fractions(self, cosmo, M, z):
        """f_hg / f_rg / f_bg / f_eg bookkeeping (`Arico20.py:380-387`)."""
        f_cg = self._get_star_frac(M, z)
        f_sg = self._get_star_frac(M, z, satellite=True)
        f_bar = cosmo.Omega_b / cosmo.Omega_m
        f_hg = (f_bar - f_cg - f_sg) / (1 + jnp.power(self.M_c / M, self.beta))
        f_rg = (f_bar - f_cg - f_sg - f_hg) / (1 + jnp.power(self.M_r / M,
                                                             self.beta_r))
        f_bg = f_hg - f_rg
        f_eg = f_bar - f_cg - f_sg - f_hg
        return dict(f_cg=f_cg, f_sg=f_sg, f_bar=f_bar, f_hg=f_hg,
                    f_rg=f_rg, f_bg=f_bg, f_eg=f_eg)


class DarkMatter(AricoProfiles):
    """NFW truncated *at R* with analytic normalization
    (`Arico20.py:192-255`)."""

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


class TwoHalo(S19.TwoHalo, AricoProfiles):
    """S19 two-halo with the Arico parameter vocabulary
    (`Arico20.py:258-259`)."""


class Stars(AricoProfiles):
    """Power-law x Gaussian: r^-alpha_g exp(-(r/2R_h)^2), numerical norm
    over [1e-6, 5] Mpc (`Arico20.py:262-327`)."""

    def __init__(self, **kwargs):
        super().__init__(**kwargs)
        self.update_precision_fftlog(padding_lo_fftlog=1e-5,
                                     padding_hi_fftlog=1e5)

    def _real(self, cosmo, r, M, a):
        z = 1 / a - 1
        R = self.mass_def.get_radius(cosmo, M, a) / a
        f_cga = self._get_star_frac(M, z)[:, None]
        R_h = (self.epsilon_h * R)[:, None]

        r_int = jnp.geomspace(1e-6, 5, 500)
        shape_int = (1.0 / R_h / jnp.power(r_int, self.alpha_g)
                     * jnp.exp(-((r_int / (2 * R_h)) ** 2)))
        norm = jnp.trapezoid(4 * jnp.pi * r_int**2 * shape_int, r_int,
                             axis=-1)[:, None]
        prof = (f_cga * M[:, None] / R_h / jnp.power(r, self.alpha_g)
                * jnp.exp(-((r / (2 * R_h)) ** 2)) / norm)
        return prof


class BoundGas(AricoProfiles):
    """(1 + r/R_co)^-beta (1 + (r/R_ej)^2)^-2 with per-halo normalization
    over [1e-6, R_i] (`Arico20.py:330-425`). Unlike the density itself the
    normalization integral is hard-cut at R."""

    def _real(self, cosmo, r, M, a):
        z = 1 / a - 1
        R = self.mass_def.get_radius(cosmo, M, a) / a
        fr = self._gas_fractions(cosmo, M, z)
        beta, theta_out, theta_inn = self._get_gas_params(M, z)
        R_co = theta_inn * R[:, None]
        R_ej = theta_out * R[:, None]

        def norm_one(R_i, Rco_i, Rej_i, beta_i):
            r_int = jnp.geomspace(1e-6, R_i, 500)
            shape = (1 + r_int / Rco_i) ** -beta_i \
                / (1 + (r_int / Rej_i) ** 2) ** 2
            shape = jnp.where(r_int < R_i, shape, 0.0)
            return jnp.trapezoid(4 * jnp.pi * r_int**2 * shape, r_int)

        norm = jax.vmap(norm_one)(R, R_co[:, 0], R_ej[:, 0],
                                  beta[:, 0])[:, None]

        u = r / R_co
        v = r / R_ej
        kfac = sigmoid_cutoff(r[None, :], self.cutoff)
        prof = (1 + u) ** -beta / (1 + v**2) ** 2 * kfac
        return prof * fr['f_bg'][:, None] * M[:, None] / norm


class EjectedGas(AricoProfiles):
    """Gaussian with R_ej = eta * 0.75 * R_esc, R_esc = (sqrt(Delta)/2) R;
    requires a critical-overdensity mass definition (`Arico20.py:428-492`)."""

    def _real(self, cosmo, r, M, a):
        assert self.mass_def.rho_type == 'critical', (
            f"Escape radius cannot be calculated for mass_def = "
            f"{self.mass_def}. Use critical overdensity.")
        z = 1 / a - 1
        R = self.mass_def.get_radius(cosmo, M, a) / a
        fr = self._gas_fractions(cosmo, M, z)
        f_eg = fr['f_eg'][:, None]

        R_esc = 0.5 * jnp.sqrt(self.mass_def.Delta) * R
        R_ej = (self.eta * 0.75 * R_esc)[:, None]

        kfac = sigmoid_cutoff(r[None, :], self.cutoff)
        return (f_eg * M[:, None] / jnp.power(2 * jnp.pi * R_ej**2, 1.5)
                * jnp.exp(-(r / R_ej) ** 2 / 2) * kfac)


class ReaccretedGas(AricoProfiles):
    """Gaussian shell at theta_rg R of width sigma_rg R with analytic erf
    normalization, zero beyond R (`Arico20.py:496-568`)."""

    def _real(self, cosmo, r, M, a):
        z = 1 / a - 1
        R = self.mass_def.get_radius(cosmo, M, a) / a
        fr = self._gas_fractions(cosmo, M, z)
        R_rg = self.theta_rg * R[:, None]
        S_rg = self.sigma_rg * R[:, None]
        f_rg = fr['f_rg'][:, None]
        Rc = R[:, None]

        t1 = 2 * jnp.sqrt(2 * jnp.pi) * (
            jnp.exp(-R_rg**2 / (2 * S_rg**2)) * R_rg
            - jnp.exp(-((R_rg - Rc) ** 2) / (2 * S_rg**2)) * (R_rg + Rc))
        t2 = 2 * jnp.pi * (R_rg**2 + S_rg**2) * erf(R_rg / (jnp.sqrt(2.0)
                                                            * S_rg))
        t3 = -2 * jnp.pi * (R_rg**2 + S_rg**2) * erf((R_rg - Rc)
                                                     / (jnp.sqrt(2.0) * S_rg))
        norm = t1 * S_rg + t2 + t3

        kfac = sigmoid_cutoff(r[None, :], self.cutoff)
        prof = (1.0 / jnp.sqrt(2 * jnp.pi * S_rg**2)
                * jnp.exp(-(((r - R_rg) / S_rg) ** 2) / 2))
        prof = prof * f_rg * M[:, None] / norm * kfac
        return jnp.where(r[None, :] <= Rc, prof, 0.0)


class Gas(AricoProfiles):
    """BoundGas + EjectedGas + ReaccretedGas via profile algebra with
    attribute delegation (`Arico20.py:571-591`)."""

    def __init__(self, **kwargs):
        self.myprof = (BoundGas(**kwargs) + EjectedGas(**kwargs)
                       + ReaccretedGas(**kwargs))

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


class ModifiedDarkMatter(AricoProfiles):
    """NFW inside r_p, (rho_GravityOnly - rho_BoundGas) outside; r_p from
    eq. A10 of Arico+19 via a local monotone root find
    (`Arico20.py:594-704`)."""

    def __init__(self, gas=None, gravityonly=None, **kwargs):
        self.Gas = gas if gas is not None else BoundGas(**kwargs)
        self.GravityOnly = (gravityonly if gravityonly is not None
                            else DarkMatter(**kwargs))
        super().__init__(**kwargs)

    def _real(self, cosmo, r, M, a):
        from ..ops.interp import pchip_derivatives, pchip_eval

        c = self._concentration(cosmo, M, a)
        R = self.mass_def.get_radius(cosmo, M, a) / a
        r_s = (R / c)[:, None]
        fDM = 1 - cosmo.Omega_b / cosmo.Omega_m

        rp_grid = jnp.geomspace(1e-6, 10, 500)
        # rho_GravityOnly(R) and rho_BG(R) per halo (diagonal evaluation)
        pGro = jax.vmap(lambda R_i, M_i: self.GravityOnly._real(
            cosmo, R_i[None], M_i[None], a)[0, 0])(R, M)[:, None]
        pBG = jax.vmap(lambda R_i, M_i: self.Gas._real(
            cosmo, R_i[None], M_i[None], a)[0, 0])(R, M)[:, None]

        dp = pGro - pBG
        LHS = (rp_grid * jnp.power(rp_grid + r_s, 2) * dp
               * (jnp.log(1 + rp_grid / r_s) - 1 / (1 + r_s / rp_grid))
               + dp / 3 * (R[:, None] ** 3 - rp_grid**3))
        RHS = (fDM * M / (4 * jnp.pi))[:, None]

        rp = jax.vmap(lambda lhs_i, rhs_i: jnp.exp(
            pchip_local_root(lhs_i - rhs_i, jnp.log(rp_grid))))(LHS, RHS)
        rp = rp[:, None]
        rho_c = dp * (rp / r_s) * jnp.power(1 + rp / r_s, 2)

        prof = rho_c / (r / r_s) / jnp.power(1 + r / r_s, 2)
        prof = jnp.where(r[None, :] < rp, prof, dp)
        prof = prof * sigmoid_cutoff(r[None, :], self.cutoff)
        return jnp.where(r[None, :] <= R[:, None], prof, 0.0)


class CollisionlessMatter(AricoProfiles):
    """Per-halo relaxation on a [r_min, R_i] grid, zeta normalized to 1 at
    R, mass pinned to f_clm M at R (`Arico20.py:707-865`)."""

    def __init__(self, gas=None, stars=None, darkmatter=None, max_iter=10,
                 reltol=1e-2, r_min_int=1e-8, r_max_int=1e1, r_steps=5000,
                 **kwargs):
        self.Gas = gas if gas is not None else Gas(**kwargs)
        self.Stars = stars if stars is not None else Stars(**kwargs)
        self.DarkMatter = (darkmatter if darkmatter is not None
                           else ModifiedDarkMatter(**kwargs))
        self.Gas.set_parameter('cutoff', 1000)
        self.Stars.set_parameter('cutoff', 1000)
        self.DarkMatter.set_parameter('cutoff', 1000)
        self.max_iter = max_iter
        self.reltol = reltol
        self.r_min_int = r_min_int
        self.r_max_int = r_max_int
        self.r_steps = r_steps
        super().__init__(**kwargs)

    def _real(self, cosmo, r, M, a):
        from ..ops.interp import pchip_derivatives, pchip_eval

        z = 1 / a - 1
        R = self.mass_def.get_radius(cosmo, M, a) / a
        f_sg = self._get_star_frac(M, z, satellite=True)
        f_dm = 1 - cosmo.Omega_b / cosmo.Omega_m
        f_clm = f_dm + f_sg

        a_rel, n_rel = self.a, self.n
        n_steps = self.r_steps
        r_min = self.r_min_int

        def one_halo(R_i, M_i, fc_i):
            r_int = jnp.geomspace(r_min, R_i, n_steps)
            lnr_int = jnp.log(r_int)
            dlnr = lnr_int[1] - lnr_int[0]

            rho_i = self.DarkMatter._real(cosmo, r_int, M_i[None], a)[0]
            rho_cga = self.Stars._real(cosmo, r_int, M_i[None], a)[0]
            rho_gas = self.Gas._real(cosmo, r_int, M_i[None], a)[0]

            M_i_c = 4 * jnp.pi * jnp.cumsum(r_int**3 * rho_i * dlnr)
            M_cga = 4 * jnp.pi * jnp.cumsum(r_int**3 * rho_cga * dlnr)
            M_gas = 4 * jnp.pi * jnp.cumsum(r_int**3 * rho_gas * dlnr)

            lnM_nfw = jnp.log(M_i_c)
            lnM_cga = jnp.log(M_cga)
            lnM_gas = jnp.log(M_gas)
            d_nfw = pchip_derivatives(lnr_int, lnM_nfw)
            d_cga = pchip_derivatives(lnr_int, lnM_cga)
            d_gas = pchip_derivatives(lnr_int, lnM_gas)

            def rd(lnq, y, d, y_max):
                v = pchip_eval(lnq, lnr_int, y, d, extrapolate=False)
                return jnp.where(jnp.isfinite(v), jnp.exp(v),
                                 jnp.exp(y_max))

            def body(_, zeta):
                lnrf = lnr_int + jnp.log(zeta)
                M_f = (fc_i * M_i_c
                       + rd(lnrf, lnM_cga, d_cga, lnM_cga[-1])
                       + rd(lnrf, lnM_gas, d_gas, lnM_gas[-1]))
                znew = 1 + a_rel * (jnp.power(M_i_c / M_f, n_rel) - 1)
                # normalize so zeta(R) = 1 (`Arico20.py:810-812`)
                znorm = jnp.interp(R_i, r_int, znew)
                return znew / znorm

            zeta = jax.lax.fori_loop(0, self.max_iter, body,
                                     jnp.ones(n_steps))

            lnM_clm = jnp.log(fc_i) + pchip_eval(
                lnr_int - jnp.log(zeta), lnr_int, lnM_nfw, d_nfw)
            # pin M_clm(R) = f_clm * M (`Arico20.py:826-828`)
            lnM_clm = lnM_clm + (jnp.log(fc_i * M_i)
                                 - jnp.interp(jnp.log(R_i), lnr_int,
                                              lnM_clm))

            d_clm = pchip_derivatives(lnr_int, lnM_clm)
            log_der = pchip_eval(lnr_int, lnr_int, lnM_clm, d_clm, deriv=1)
            rho = (log_der * jnp.exp(lnM_clm) / r_int
                   / (4 * jnp.pi * r_int**2))
            d_rho = pchip_derivatives(lnr_int, rho)
            out = pchip_eval(jnp.log(r), lnr_int, rho, d_rho,
                             extrapolate=False)
            out = jnp.where(jnp.isnan(out), 0.0, out)
            out = out * sigmoid_cutoff(r, self.cutoff)
            return jnp.where(r <= R_i, out, 0.0)

        return jax.vmap(one_halo)(R, M, f_clm)


class DarkMatterOnly(S19.DarkMatterOnly, AricoProfiles):
    """DarkMatter with the two-halo term zeroed (`Arico20.py:868-881`)."""

    def __init__(self, darkmatter=None, **kwargs):
        self.DarkMatter = (darkmatter if darkmatter is not None
                           else DarkMatter(**kwargs))
        self.TwoHalo = TwoHalo(**kwargs) * 0
        AricoProfiles.__init__(self, **kwargs)


class DarkMatterBaryon(S19.DarkMatterBaryon, AricoProfiles):
    """CLM + Stars + Gas (renormalized), no two-halo
    (`Arico20.py:884-899`)."""

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
        AricoProfiles.__init__(self, **kwargs)


class DarkMatterOnlywithLSS(S19.DarkMatterOnly, AricoProfiles):
    """Variant retaining the two-halo term (`Arico20.py:901-913`)."""

    def __init__(self, darkmatter=None, twohalo=None, **kwargs):
        self.DarkMatter = (darkmatter if darkmatter is not None
                           else DarkMatter(**kwargs))
        self.TwoHalo = twohalo if twohalo is not None else TwoHalo(**kwargs)
        AricoProfiles.__init__(self, **kwargs)


class DarkMatterBaryonwithLSS(S19.DarkMatterBaryon, AricoProfiles):
    """Variant retaining the two-halo term (`Arico20.py:916-933`)."""

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
        AricoProfiles.__init__(self, **kwargs)


class Pressure(AricoProfiles):
    """Polytropic pressure P = P0 rho_BG^Geff in CGS, with Geff from the
    concentration and P0 from eq. 5 of Arico+24 (`Arico20.py:937-1028`)."""

    def __init__(self, gas=None, **kwargs):
        self.Gas = gas if gas is not None else BoundGas(**kwargs)
        super().__init__(**kwargs)

    def _real(self, cosmo, r, M, a):
        c = self._concentration(cosmo, M, a)[:, None]
        R = self.mass_def.get_radius(cosmo, M, a) / a
        r_s = R[:, None] / c
        norm = 4 * jnp.pi * r_s**3 * (jnp.log(1 + c) - c / (1 + c))
        rhoc = M[:, None] / norm
        xp = c * self.theta_out
        Geff = 1 + (((1 + xp) * jnp.log(1 + xp) - xp)
                    / ((1 + 3 * xp) * jnp.log(1 + xp)))

        rho0 = self.Gas._real(cosmo, jnp.zeros(1), M, a)
        P0 = (4 * jnp.pi * G * (rhoc * r_s**2) / jnp.power(rho0, Geff - 1)
              * (1 - 1 / Geff))
        P0 = P0 * const.MSUN_G / const.MPC_CM  # -> CGS

        rhoBG = self.Gas._real(cosmo, r, M, a)
        prof = P0 * jnp.power(rhoBG, Geff)
        return prof * sigmoid_cutoff(r[None, :], self.cutoff)


class NonThermalFrac(AricoProfiles):
    """Green+20 non-thermal fraction with a free amplitude
    A_nt (1+z)^alpha_nt (`Arico20.py:1031-1093`).

    NOTE: the reference overwrites the scale factor ``a`` with the
    amplitude before calling sigmaM (`Arico20.py:1084-1085`), evaluating
    the peak height at a nonsensical epoch; we evaluate sigmaM at the true
    scale factor (the intended behavior).
    """

    def __init__(self, concentration=None, **kwargs):
        super().__init__(**kwargs)
        self.concentration = (concentration if concentration is not None
                              else ConcentrationDiemer15(self.mass_def))

    def _real(self, cosmo, r, M, a):
        from ..cosmology.massdef import MassDef, mass_translator
        z = 1 / a - 1
        mdef_m = MassDef(200, 'matter')
        M200m = mass_translator(cosmo, M, a, self.mass_def, mdef_m,
                                self.concentration)
        R200m = mdef_m.get_radius(cosmo, M, a) / a
        x = r[None, :] / R200m[:, None]
        pb, pc, pd, pe, pf = 0.719, 1.417, -0.166, 0.265, -2.116
        amp = self.A_nt * jnp.power(1 + z, self.alpha_nt)
        nu_M = (const.DELTA_COLLAPSE / cosmo.sigmaM(M200m, a))[:, None]
        return 1 - amp * (1 + jnp.exp(-((x / pb) ** pc))) \
            * (nu_M / 4.1) ** (pd / (1 + (x / pe) ** pf))


class Temperature(AricoProfiles):
    """Ideal-gas temperature from polytropic (thermal) pressure and
    BoundGas number density (`Arico20.py:1095-1180`)."""

    def __init__(self, pressure=None, gas=None, **kwargs):
        if pressure is None:
            pressure = Pressure(**kwargs) * (1 - NonThermalFrac(**kwargs))
        self.Pressure = pressure
        self.Gas = gas if gas is not None else BoundGas(**kwargs)
        super().__init__(**kwargs)

    def _n_gas(self, rho):
        return rho / (self.mean_molecular_weight * m_p_Msun) / const.MPC_CM**3

    def _real(self, cosmo, r, M, a):
        P = self.Pressure._real(cosmo, r, M, a)
        n = self._n_gas(self.Gas._real(cosmo, r, M, a))
        return jnp.where(n == 0, 0.0, P / jnp.where(n == 0, 1.0, n) / kb_cgs)

    def projected(self, cosmo, r, M, a):
        P = self.Pressure.projected(cosmo, r, M, a)
        n = self._n_gas(self.Gas.projected(cosmo, r, M, a))
        return jnp.where(n == 0, 0.0, P / jnp.where(n == 0, 1.0, n) / kb_cgs)


class ExtendedBoundGas(AricoProfiles):
    """BoundGas matched onto an NFW tail beyond R_out with continuity
    factor y1 (`Arico20.py:1183-1282`)."""

    def _real(self, cosmo, r, M, a):
        z = 1 / a - 1
        R = self.mass_def.get_radius(cosmo, M, a) / a
        fr = self._gas_fractions(cosmo, M, z)
        beta, theta_out, theta_inn = self._get_gas_params(M, z)
        R_inn = theta_inn * R[:, None]
        R_out = theta_out * R[:, None]

        c = self._concentration(cosmo, M, a)
        r_s = (R / c)[:, None]
        x = r / r_s
        y1 = (jnp.power(1 + R_out / R_inn, -beta) / 4 * (R_out / r_s)
              * jnp.power(1 + R_out / r_s, 2))

        r_int = jnp.geomspace(1e-6, 10, 500)
        u_i = r_int / R_inn
        v_i = r_int / R_out
        shape = (1 + u_i) ** -beta / (1 + v_i**2) ** 2
        shape = jnp.where(r_int[None, :] < R[:, None], shape, 0.0)
        norm = jnp.trapezoid(4 * jnp.pi * r_int**2 * shape, r_int,
                             axis=-1)[:, None]

        u = r / R_inn
        v = r / R_out
        prof = (1 + u) ** -beta / (1 + v**2) ** 2
        nfw = y1 / x / jnp.power(1 + x, 2)
        prof = jnp.where(v <= 1, prof, nfw) / norm
        prof = prof * fr['f_bg'][:, None] * M[:, None]
        return prof * sigmoid_cutoff(r[None, :], self.cutoff)


class BoundGasDeprecated(AricoProfiles):
    """Original Arico+20 two-regime bound gas: Komatsu-Seljak-like inside
    R/eps_hydro, NFW-like outside, cut at R (`Arico20.py:1285-1382`)."""

    def _real(self, cosmo, r, M, a):
        z = 1 / a - 1
        R = self.mass_def.get_radius(cosmo, M, a) / a
        f_cg = self._get_star_frac(M, z)
        f_bar = cosmo.Omega_b / cosmo.Omega_m
        f_bg = ((f_bar - f_cg)
                / (1 + jnp.power(self.M_c / M, self.beta)))[:, None]

        c = self._concentration(cosmo, M, a)
        r_s = (R / c)[:, None]
        eps = self.epsilon_hydro
        e5 = c[:, None] / eps
        Geff = ((1 + 3 * c / eps) * jnp.log(1 + c / eps)
                / ((1 + c / eps) * jnp.log(1 + c / eps) - c / eps))[:, None]
        y1 = jnp.power(jnp.log(1 + e5) / e5, Geff) * (e5 * (1 + e5) ** 2)

        r_int = jnp.geomspace(1e-6, 10, 500)
        x_i = r_int / r_s
        u_i = jnp.power(jnp.log(1 + x_i) / x_i, Geff)
        v_i = y1 * jnp.power(1 + x_i, -2) / x_i
        y_i = jnp.where(r_int[None, :] < R[:, None] / eps, u_i, v_i)
        y_i = jnp.where(r_int[None, :] > R[:, None], 0.0, y_i)
        norm = jnp.trapezoid(4 * jnp.pi * r_int**2 * y_i, r_int,
                             axis=-1)[:, None]

        x = r / r_s
        u = jnp.power(jnp.log(1 + x) / x, Geff)
        v = y1 * jnp.power(1 + x, -2) / x
        prof = jnp.where(r[None, :] < R[:, None] / eps, u, v)
        prof = jnp.where(r[None, :] > R[:, None], 0.0, prof)
        prof = f_bg * M[:, None] * prof / norm
        return prof * sigmoid_cutoff(r[None, :], self.cutoff)
