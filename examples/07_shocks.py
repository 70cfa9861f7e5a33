"""Shock-heated gas profiles (reference examples/07_Shocks.ipynb).

ShockedGas multiplies the gas density by a logistic suppression toward
the Rankine-Hugoniot maximum compression drop at r = epsilon_shock * R;
the temperature of the shocked component is what produces SZ boundary
features.

Run: python examples/07_shocks.py
"""

import numpy as np

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root
if not _os.environ.get("BENCH"):  # demos run on CPU; BENCH=1 uses the accelerator
    import jax as _jax
    _jax.config.update("jax_platforms", "cpu")
from baryonification_tpu import Cosmology
from baryonification_tpu.profiles import Gas, ShockedGas

cosmo = Cosmology.from_dict(dict(Omega_m=0.3, Omega_b=0.05, h=0.7,
                                 sigma8=0.8, n_s=0.96, w0=-1.0))
par = dict(epsilon=4.0, theta_ej=4.0, theta_co=0.1, M_c=1e14, mu_beta=0.1,
           gamma=2.5, delta=7, eta=0.3, eta_delta=0.1, tau=-1.5,
           tau_delta=0, A=0.055, M1=3e11, epsilon_h=0.015, a=0.3, n=2.0,
           p=0.3, q=0.707, cutoff=np.inf, proj_cutoff=1000)

M, a = 1e14, 0.8
r = np.geomspace(0.1, 15, 12)
gas = Gas(**par)

print("   r [Mpc]   rho_gas       shocked/gas per epsilon_shock:")
print("                            eps=2        eps=4        eps=6")
cols = []
for eps_shock in (2.0, 4.0, 6.0):
    sg = ShockedGas(epsilon_shock=eps_shock, width_shock=0.1, **par)
    cols.append(np.asarray(sg.real(cosmo, r, M, a)))
g = np.asarray(gas.real(cosmo, r, M, a))
for i in range(len(r)):
    print(f"   {r[i]:7.3f}  {g[i]:11.4e}  "
          + "  ".join(f"{c[i]/g[i]:9.4f}" for c in cols))
