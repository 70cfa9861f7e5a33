"""Differentiability of the model layer.

The reference cannot differentiate anything (numpy/scipy/numba); here the
profile evaluations and table readouts are JAX-traced, so gradients flow
from painted values back to halo properties and baryon parameters.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from baryonification_tpu.profiles import Gas, DarkMatter
from baryonification_tpu.ops.interp import blend_table_radial, radial_readout

PAR = dict(epsilon=4.0, theta_ej=4, theta_co=0.1, M_c=1e14, mu_beta=0.1,
           gamma=2.5, delta=7, mu_theta_ej=0.1, M_theta_ej=5e13,
           M_theta_co=5e13, M_gamma=5e13, M_delta=5e13, eta=0.3,
           eta_delta=0.1, tau=-1.5, tau_delta=0, A=0.055, M1=3e11,
           epsilon_h=0.015, a=0.3, n=2.0, p=0.3, q=0.707,
           cutoff=np.inf, proj_cutoff=1000)


class TestGradients:
    def test_profile_grad_wrt_mass(self, cosmo):
        """d rho_gas / d lnM via autodiff matches finite differences."""
        r = jnp.asarray([0.1, 0.5, 1.0])

        def f(lnM):
            gas = Gas(**PAR)
            return jnp.sum(jnp.asarray(
                gas.real(cosmo, r, jnp.exp(lnM), 0.8)))

        lnM0 = jnp.log(1e14)
        g = jax.grad(f)(lnM0)
        eps = 1e-4
        fd = (f(lnM0 + eps) - f(lnM0 - eps)) / (2 * eps)
        np.testing.assert_allclose(float(g), float(fd), rtol=1e-4)
        assert np.isfinite(float(g)) and float(g) != 0

    def test_table_readout_grad(self):
        """Gradients flow through the (z, M, r) table blend + radial
        readout — the kernel-side readout used by every runner."""
        zg = jnp.asarray(np.log(1 + np.linspace(0.05, 0.6, 4)))
        Mg = jnp.asarray(np.log(np.geomspace(1e13, 1e15, 5)))
        rg = jnp.asarray(np.log(np.geomspace(1e-3, 50, 32)))
        rng = np.random.default_rng(0)
        table = jnp.asarray(rng.normal(size=(4, 5, 32)))

        def f(lnM, lnr):
            prof = blend_table_radial((zg, Mg, rg), table,
                                      [jnp.log(1.3), lnM])
            return radial_readout(prof, rg, lnr)

        g = jax.grad(f, argnums=(0, 1))(jnp.log(2e14), jnp.log(0.5))
        assert all(np.isfinite(float(x)) for x in g)
        eps = 1e-5
        fd0 = (f(jnp.log(2e14) + eps, jnp.log(0.5))
               - f(jnp.log(2e14) - eps, jnp.log(0.5))) / (2 * eps)
        np.testing.assert_allclose(float(g[0]), float(fd0), rtol=1e-5,
                                   atol=1e-10)
