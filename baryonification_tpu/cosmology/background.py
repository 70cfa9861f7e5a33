"""Flat w0-CDM cosmology with device-resident lookup tables.

This is the TPU-native replacement for the pyccl L0 layer the reference sits
on (`SURVEY.md` section 1/2.13): comoving & angular-diameter distances,
linear growth, critical/matter densities, sigma(M), the linear matter
correlation function xi_mm(r), and the linear power spectrum — everything
the Schneider19/Arico/Mead profile families and the runners consume
(`/root/reference/BaryonForge/Runners/HealpixRunner.py:268-280`,
`Profiles/Schneider19.py:485-513`).

Design: all cosmology functions are closed-form or table lookups over
precomputed log-spaced grids, so they are jit-safe, vmap-safe, and
differentiable. Tables are built once per Cosmology instance with plain
jnp ops (trapezoid rules, an RK4 `lax.scan` for growth, and an FFTLog for
xi), in float64.
"""

from dataclasses import dataclass, field
from functools import partial

import jax
import jax.numpy as jnp

from .. import constants as const
from ..ops.fftlog import fftlog_transform
from .power import eh98_transfer, sigma_tophat

__all__ = ["Cosmology", "CosmologyDevice", "cosmology_device"]


@partial(jax.jit, static_argnames=("n_steps",))
def _growth_ode(lna_grid, Om, Or, Ok, Ol, w0, n_steps=None):
    """Linear growth D(a): RK4 integration of the standard ODE in ln a.

    D'' + (2 + dlnE/dlna) D' = 1.5 Omega_m(a) D, with the Meszaros
    growing-mode initial condition (valid through matter-radiation
    equality) at the grid start.
    """
    def E2(lna):
        a = jnp.exp(lna)
        return (Om * a**-3 + Or * a**-4 + Ok * a**-2
                + Ol * a ** (-3.0 * (1.0 + w0)))

    def dlnE2_dlna(lna):
        a = jnp.exp(lna)
        return (-3.0 * Om * a**-3 - 4.0 * Or * a**-4 - 2.0 * Ok * a**-2
                - 3.0 * (1.0 + w0) * Ol * a ** (-3.0 * (1.0 + w0)))

    def rhs(lna, y):
        D, Dp = y
        e2 = E2(lna)
        damp = 2.0 + 0.5 * dlnE2_dlna(lna) / e2
        source = 1.5 * Om * jnp.exp(-3.0 * lna) / e2
        return jnp.array([Dp, -damp * Dp + source * D])

    a0 = jnp.exp(lna_grid[0])
    a_eq = Or / Om
    D0 = 1.0 + 1.5 * a0 / a_eq
    Dp0 = 1.5 * a0 / a_eq
    y0 = jnp.array([D0, Dp0])
    h = lna_grid[1] - lna_grid[0]

    def step(y, lna):
        k1 = rhs(lna, y)
        k2 = rhs(lna + 0.5 * h, y + 0.5 * h * k1)
        k3 = rhs(lna + 0.5 * h, y + 0.5 * h * k2)
        k4 = rhs(lna + h, y + h * k3)
        y_new = y + (h / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)
        return y_new, y_new[0]

    _, D = jax.lax.scan(step, y0, lna_grid[:-1])
    D = jnp.concatenate([jnp.array([y0[0]]), D])
    return D / D[-1]  # normalized to unity today (CCL convention)


@dataclass(frozen=True)
class Cosmology:
    """Flat w0-CDM cosmology (mirrors the cosmo-dict contract of the
    reference's io objects: Omega_m, Omega_b, h, sigma8, n_s, w0)."""

    Omega_m: float = 0.3
    Omega_b: float = 0.05
    h: float = 0.7
    sigma8: float = 0.8
    n_s: float = 0.96
    w0: float = -1.0
    T_CMB: float = 2.725
    Neff: float = 3.044
    # table resolutions
    _n_a: int = 2048
    _n_k: int = 2048
    _n_m: int = 512
    # derived tables (filled in __post_init__)
    _tables: dict = field(default=None, repr=False, compare=False)

    def __post_init__(self):
        # Table building uses complex128 FFTs (FFTLog) and fp64 quadratures,
        # which TPUs don't support natively — build once on the host CPU
        # backend; the resulting arrays flow to the accelerator on use.
        with jax.default_device(jax.devices("cpu")[0]):
            object.__setattr__(self, "_tables", self._build_tables())

    # ----- construction -----
    def _build_tables(self):
        h = self.h
        Og = 2.47282e-5 / h**2 * (self.T_CMB / 2.725) ** 4
        Onu = self.Neff * (7.0 / 8.0) * (4.0 / 11.0) ** (4.0 / 3.0) * Og
        Or = Og + Onu
        Ok = 0.0
        Ol = 1.0 - self.Omega_m - Or

        lna = jnp.linspace(jnp.log(1e-5), 0.0, self._n_a)
        a = jnp.exp(lna)
        E = jnp.sqrt(self.Omega_m * a**-3 + Or * a**-4
                     + Ol * a ** (-3.0 * (1.0 + self.w0)))

        # chi(a) = (c/H0) int_a^1 da'/(a'^2 E) ; on the log grid the
        # integrand is dlna/(a E). Integrate from a=1 downwards.
        integrand = 1.0 / (a * E)
        dlna = lna[1] - lna[0]
        incr = 0.5 * (integrand[1:] + integrand[:-1]) * dlna
        # cumulative from the end (a=1) backwards
        chi = jnp.concatenate([jnp.cumsum(incr[::-1])[::-1], jnp.zeros(1)])
        chi = chi * const.DH_100 / h

        D = _growth_ode(lna, self.Omega_m, Or, Ok, Ol, self.w0)

        # linear P(k) at z=0, sigma8-normalized
        k = jnp.geomspace(1e-5, 1e4, self._n_k)
        T = eh98_transfer(k, self.Omega_m, self.Omega_b, h, self.T_CMB)
        pk_un = k**self.n_s * T**2
        s8_un = sigma_tophat(k, pk_un, 8.0 / h)
        pk0 = pk_un * (self.sigma8 / s8_un) ** 2

        # sigma(M) at z=0 on a wide mass grid (Lagrangian comoving R)
        rho_m0 = self.Omega_m * const.RHO_CRIT_0 * h**2  # Msun / Mpc^3 comoving
        lnM = jnp.linspace(jnp.log(1e6), jnp.log(1e18), self._n_m)
        R_L = (3.0 * jnp.exp(lnM) / (4.0 * jnp.pi * rho_m0)) ** (1.0 / 3.0)
        lnsig = jnp.log(sigma_tophat(k, pk0, R_L))

        # xi_lin(r) at z=0 via FFTLog: xi = T3[P] (SURVEY 2.13)
        r_xi, xi0 = fftlog_transform(k, pk0, 3, 0, plaw=-1.55)

        return dict(Or=Or, Ol=Ol, lna=lna, chi=chi, lnD=jnp.log(D),
                    k=k, pk0=pk0, lnM=lnM, lnsig=lnsig,
                    lnr_xi=jnp.log(r_xi), xi0=xi0, rho_m0=rho_m0)

    # ----- background -----
    @property
    def Omega_c(self):
        return self.Omega_m - self.Omega_b

    @property
    def cosmodict(self):
        """The plain dict the io catalog objects validate against
        (reference `utils/io.py:79-83`, `utils/misc.py:160-210`)."""
        return dict(Omega_m=self.Omega_m, Omega_b=self.Omega_b, h=self.h,
                    sigma8=self.sigma8, n_s=self.n_s, w0=self.w0)

    @classmethod
    def from_dict(cls, d):
        keys = ("Omega_m", "Omega_b", "h", "sigma8", "n_s", "w0")
        return cls(**{k: float(d[k]) for k in keys if k in d})

    def E(self, a):
        a = jnp.asarray(a)
        t = self._tables
        return jnp.sqrt(self.Omega_m * a**-3 + t["Or"] * a**-4
                        + t["Ol"] * a ** (-3.0 * (1.0 + self.w0)))

    def H(self, a):
        """H(a) in km/s/Mpc."""
        return 100.0 * self.h * self.E(a)

    def comoving_radial_distance(self, a):
        """chi(a) in Mpc (flat: equals the comoving angular distance)."""
        t = self._tables
        return jnp.interp(jnp.log(a), t["lna"], t["chi"])

    comoving_angular_distance = comoving_radial_distance

    def angular_diameter_distance(self, a):
        return jnp.asarray(a) * self.comoving_radial_distance(a)

    def growth_factor(self, a):
        """D(a), normalized to 1 at a=1 (CCL convention; the reference uses
        delta_c = 1.686/D, `Schneider19.py:502`)."""
        t = self._tables
        return jnp.exp(jnp.interp(jnp.log(a), t["lna"], t["lnD"]))

    def rho_crit(self, a, comoving=False):
        """Critical density in Msun/Mpc^3."""
        rc = const.RHO_CRIT_0 * self.h**2 * self.E(a) ** 2
        return rc * jnp.asarray(a) ** 3 if comoving else rc

    def rho_x(self, a, species="matter", is_comoving=False):
        """Density of a species, Msun/Mpc^3 (mirrors ccl.rho_x)."""
        a = jnp.asarray(a)
        if species == "matter":
            rho = self._tables["rho_m0"] * a**-3  # physical
        elif species == "critical":
            rho = self.rho_crit(a)
        else:
            raise ValueError(f"unknown species {species!r}")
        return rho * a**3 if is_comoving else rho

    # ----- fluctuations -----
    def P_lin(self, k, a=1.0):
        t = self._tables
        pk = jnp.exp(jnp.interp(jnp.log(k), jnp.log(t["k"]),
                                jnp.log(t["pk0"])))
        return pk * self.growth_factor(a) ** 2

    def Omega_m_a(self, a):
        """Matter density parameter at scale factor a."""
        a = jnp.asarray(a)
        return self.Omega_m * a**-3 / self.E(a) ** 2

    def P_nl(self, k, a=1.0):
        """Nonlinear matter power spectrum (halofit, Takahashi+2012).

        An analysis extension beyond the reference (which forces linear
        P(k) everywhere); used by the dP(k)/P(k) suppression prediction.
        """
        from .power import halofit_pk
        t = self._tables
        ol_z = t["Ol"] * jnp.asarray(a) ** (-3.0 * (1.0 + self.w0)) \
            / self.E(a) ** 2
        return halofit_pk(k, t["k"], t["pk0"] * self.growth_factor(a) ** 2,
                          self.Omega_m_a(a), ol_z, self.w0)

    def dlnP_dlnk(self, k):
        """Logarithmic slope of the z=0 linear power spectrum."""
        t = self._tables
        lnk = jnp.log(t["k"])
        lnp = jnp.log(t["pk0"])
        slope = jnp.gradient(lnp) / (lnk[1] - lnk[0])
        return jnp.interp(jnp.log(k), lnk, slope)

    def sigmaM(self, M, a=1.0):
        """sigma(M, a) with tophat window (ccl.sigmaM parity)."""
        t = self._tables
        s0 = jnp.exp(jnp.interp(jnp.log(M), t["lnM"], t["lnsig"]))
        return s0 * self.growth_factor(a)

    def xi_mm(self, r, a=1.0):
        """Linear matter correlation function (ccl.correlation_3d parity).

        Linear theory separates: xi(r, a) = D(a)^2 xi(r, z=0).
        """
        t = self._tables
        xi0 = jnp.interp(jnp.log(r), t["lnr_xi"], t["xi0"])
        return xi0 * self.growth_factor(a) ** 2

    def lagrangian_R(self, M):
        """Comoving Lagrangian radius of mass M."""
        return (3.0 * jnp.asarray(M)
                / (4.0 * jnp.pi * self._tables["rho_m0"])) ** (1.0 / 3.0)


class CosmologyDevice(Cosmology):
    """A :class:`Cosmology` whose scalar parameters are pytree CHILDREN.

    The base class registers (Omega_m, ..., w0) as static pytree aux data —
    the right choice for the runner hot paths, where a cosmology is fixed
    per compiled program. For gradient-based inference over *cosmological*
    parameters the scalars must instead be traceable leaves; construct one
    with :func:`cosmology_device` inside the function being differentiated
    and every method (``growth_factor``, ``sigmaM``, ``xi_mm``, ``P_lin``,
    ``rho_x``, ...) becomes differentiable w.r.t. (Omega_m, Omega_b, h,
    sigma8, n_s, w0). The reference's pyccl L0 layer
    (`/root/reference/BaryonForge/Profiles/Schneider19.py:485-513` consumes
    ccl's C-level splines) is constitutionally non-differentiable — this
    class is the TPU-era replacement that closes the autodiff chain from
    cosmology through `build_table_device` into the baryonified map.
    """


def cosmology_device(params=None, **kw):
    """Build a :class:`CosmologyDevice` from (possibly traced) parameters.

    Parameters
    ----------
    params : dict, optional
        Any of ``Omega_m, Omega_b, h, sigma8, n_s, w0`` as floats OR JAX
        tracers. Extra keyword arguments override/extend the dict. The
        non-sampled attributes (``T_CMB, Neff`` and the table resolutions)
        may be passed as floats/ints only.

    Notes
    -----
    The lookup tables (growth, chi, P(k), sigma(M), xi_mm) are built with
    the traced values flowing through them, so ``jax.grad`` of anything
    computed from the returned object w.r.t. the input parameters is exact
    (the FFTLog / trapezoid discretization differentiates alongside).

    The table build uses complex128 FFTs and fp64 quadratures: run the
    surrounding grad/jit on the CPU backend (the same discipline as
    ``BaryonificationClass.build_table_device`` — wrap eager calls in
    ``jax.default_device(jax.devices('cpu')[0])``; this function does so
    itself when called with concrete floats outside a trace).
    """
    d = dict(params or {})
    d.update(kw)
    scalars = dict(Omega_m=0.3, Omega_b=0.05, h=0.7, sigma8=0.8,
                   n_s=0.96, w0=-1.0)
    fixed = dict(T_CMB=2.725, Neff=3.044, _n_a=2048, _n_k=2048, _n_m=512)
    for k in list(d):
        if k not in scalars and k not in fixed:
            raise TypeError(f"unknown cosmology parameter {k!r}")
    c = object.__new__(CosmologyDevice)
    for k, v in scalars.items():
        object.__setattr__(c, k, d.get(k, v))
    for k, v in fixed.items():
        object.__setattr__(c, k, d.get(k, v))
    traced = any(isinstance(d.get(k), jax.core.Tracer) for k in scalars)
    if traced:
        tables = c._build_tables()
    else:
        with jax.default_device(jax.devices("cpu")[0]):
            tables = c._build_tables()
    object.__setattr__(c, "_tables", tables)
    return c


def _cosmo_flatten(c):
    children = (c._tables,)
    aux = (c.Omega_m, c.Omega_b, c.h, c.sigma8, c.n_s, c.w0, c.T_CMB,
           c.Neff, c._n_a, c._n_k, c._n_m)
    return children, aux


def _cosmo_unflatten(aux, children):
    c = object.__new__(Cosmology)
    names = ("Omega_m", "Omega_b", "h", "sigma8", "n_s", "w0", "T_CMB",
             "Neff", "_n_a", "_n_k", "_n_m")
    for name, val in zip(names, aux):
        object.__setattr__(c, name, val)
    object.__setattr__(c, "_tables", children[0])
    return c


jax.tree_util.register_pytree_node(Cosmology, _cosmo_flatten, _cosmo_unflatten)


def _cosmod_flatten(c):
    children = (c.Omega_m, c.Omega_b, c.h, c.sigma8, c.n_s, c.w0, c._tables)
    aux = (c.T_CMB, c.Neff, c._n_a, c._n_k, c._n_m)
    return children, aux


def _cosmod_unflatten(aux, children):
    c = object.__new__(CosmologyDevice)
    for name, val in zip(("Omega_m", "Omega_b", "h", "sigma8", "n_s", "w0"),
                         children[:6]):
        object.__setattr__(c, name, val)
    for name, val in zip(("T_CMB", "Neff", "_n_a", "_n_k", "_n_m"), aux):
        object.__setattr__(c, name, val)
    object.__setattr__(c, "_tables", children[6])
    return c


jax.tree_util.register_pytree_node(CosmologyDevice, _cosmod_flatten,
                                   _cosmod_unflatten)
