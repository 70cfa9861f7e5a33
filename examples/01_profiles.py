"""Evaluate the halo-profile families (reference examples/01, 08, 11, 13).

Prints component densities rho(r) for the Schneider19, Arico20 and Mead20
models at a few radii and masses — the script analog of the reference's
profile-plotting notebooks.

Run: python examples/01_profiles.py
"""

import numpy as np

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root
if not _os.environ.get("BENCH"):  # demos run on CPU; BENCH=1 uses the accelerator
    import jax as _jax
    _jax.config.update("jax_platforms", "cpu")
from baryonification_tpu import Cosmology
from baryonification_tpu.profiles import Schneider19 as S19
from baryonification_tpu.profiles import Arico20 as A20
from baryonification_tpu.profiles import Mead20 as M20

cosmo = Cosmology(Omega_m=0.3, Omega_b=0.05, h=0.7, sigma8=0.8, n_s=0.96)

# canonical Schneider19 parameters (reference examples/default_config.npy)
s19_par = dict(epsilon=4.0, theta_ej=4, theta_co=0.1, M_c=1e14, mu_beta=0.1,
               gamma=2.5, delta=7, eta=0.3, eta_delta=0.1, tau=-1.5,
               tau_delta=0, A=0.055, M1=3e11, epsilon_h=0.015, a=0.3, n=2.0,
               p=0.3, q=0.707, cutoff=np.inf, proj_cutoff=1000)

h = 0.7
a20_par = dict(alpha_g=2, epsilon_h=0.015, M1_0=2.2e11 / h, alpha_sat=1,
               M_c=1.2e14 / h, eta=0.6, mu=0.31, beta=0.6,
               epsilon_hydro=np.sqrt(5), M_inn=3.3e13 / h, M_r=1e30,
               beta_r=2, theta_inn=0.1, theta_out=1, theta_rg=0.3,
               sigma_rg=0.1, a=0.3, n=2, p=0.3, q=0.707)

r = np.geomspace(0.01, 10, 8)     # comoving Mpc
M = 1e14                          # Msun
a = 1 / (1 + 0.25)

rows = {
    "S19 DarkMatter": S19.DarkMatter(**s19_par),
    "S19 Gas": S19.Gas(**s19_par),
    "S19 Stars": S19.Stars(**s19_par),
    "S19 CollisionlessMatter": S19.CollisionlessMatter(**s19_par),
    "S19 DarkMatterBaryon": S19.DarkMatterBaryon(**s19_par),
    "A20 DarkMatter": A20.DarkMatter(**a20_par),
    "A20 BoundGas": A20.BoundGas(**a20_par),
    "A20 EjectedGas": A20.EjectedGas(**a20_par),
    "M20 DarkMatter": M20.DarkMatter(**M20.Params_TAGN_7p8),
    "M20 BoundGas": M20.BoundGas(**M20.Params_TAGN_7p8),
}

print(f"rho(r) [Msun/Mpc^3] at M = {M:.1e} Msun, z = 0.25")
print("r [Mpc]:", "  ".join(f"{x:9.3f}" for x in r))
for name, prof in rows.items():
    rho = np.asarray(prof.real(cosmo, r, M, a))
    print(f"{name:26s}", "  ".join(f"{x:9.2e}" for x in rho))
