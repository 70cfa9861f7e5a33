"""Spherical-overdensity mass definitions (ccl.halos.massdef parity).

The reference default everywhere is ``MassDef(200, 'critical')``
(`/root/reference/BaryonForge/Profiles/Schneider19.py:76`,
`Runners/HealpixRunner.py:150`); the Green+20 non-thermal fraction needs a
200c -> 200m mass translation (`Profiles/Thermodynamic.py:410-413`).
"""

from dataclasses import dataclass

import jax.numpy as jnp

__all__ = ["MassDef", "mass_translator"]


@dataclass(frozen=True, eq=True)
class MassDef:
    """Overdensity Delta w.r.t. critical or mean-matter density."""

    Delta: float = 200.0
    rho_type: str = "critical"  # 'critical' | 'matter'

    def get_Delta(self, cosmo=None, a=None):
        return self.Delta

    def get_radius(self, cosmo, M, a):
        """R_Delta in **physical** Mpc (ccl convention: callers divide by a
        for comoving, e.g. `Schneider19.py:398`)."""
        rho = cosmo.rho_x(a, species=self.rho_type, is_comoving=False)
        return (3.0 * jnp.asarray(M) / (4.0 * jnp.pi * self.Delta * rho)) ** (1.0 / 3.0)

    def get_mass(self, cosmo, R, a):
        """Inverse of get_radius; R in physical Mpc."""
        rho = cosmo.rho_x(a, species=self.rho_type, is_comoving=False)
        return 4.0 / 3.0 * jnp.pi * self.Delta * rho * jnp.asarray(R) ** 3


def _nfw_mu(x):
    return jnp.log(1.0 + x) - x / (1.0 + x)


def mass_translator(cosmo, M, a, mass_def_in, mass_def_out, concentration,
                    n_iter=60):
    """Translate halo mass between overdensity definitions via an NFW shape.

    Solves for x2 = R2/r_s with Delta2 rho2 * x2^3 / mu(x2) =
    Delta1 rho1 * c1^3 / mu(c1) by bisection (fixed iteration count, so it
    is jit/vmap friendly). Mirrors ccl.halos.mass_translator as used at
    `Thermodynamic.py:410-413`.
    """
    M = jnp.asarray(M)
    c1 = concentration(cosmo, M, a)
    rho1 = cosmo.rho_x(a, species=mass_def_in.rho_type, is_comoving=False)
    rho2 = cosmo.rho_x(a, species=mass_def_out.rho_type, is_comoving=False)
    # target constant: Delta2 rho2 x2^3 / mu(x2) = Delta1 rho1 c1^3 / mu(c1)
    K = mass_def_in.Delta * rho1 * c1**3 / _nfw_mu(c1) / (mass_def_out.Delta * rho2)

    def f(x):
        return x**3 / _nfw_mu(x) - K

    lo = jnp.full(jnp.shape(K), 1e-3)
    hi = jnp.full(jnp.shape(K), 1e3)
    for _ in range(n_iter):
        mid = jnp.sqrt(lo * hi)
        gt = f(mid) > 0.0
        hi = jnp.where(gt, mid, hi)
        lo = jnp.where(gt, lo, mid)
    x2 = jnp.sqrt(lo * hi)
    M2 = M * _nfw_mu(x2) / _nfw_mu(c1)
    return M2
