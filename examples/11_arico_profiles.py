"""Arico+20 component profiles (reference examples/11_Plot_Profiles_Arico.ipynb).

Run: python examples/11_arico_profiles.py
"""

import numpy as np

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root
if not _os.environ.get("BENCH"):  # demos run on CPU; BENCH=1 uses the accelerator
    import jax as _jax
    _jax.config.update("jax_platforms", "cpu")
from baryonification_tpu import Cosmology
from baryonification_tpu.profiles import arico20 as A20

h = 0.7
cosmo = Cosmology.from_dict(dict(Omega_m=0.3, Omega_b=0.05, h=h,
                                 sigma8=0.8, n_s=0.96, w0=-1.0))
apar = dict(alpha_g=2, epsilon_h=0.015, M1_0=2.2e11 / h, alpha_sat=1,
            M_c=1.2e14 / h, eta=0.6, mu=0.31, beta=0.6,
            epsilon_hydro=np.sqrt(5), M_inn=3.3e13 / h,
            M_r=1e30, beta_r=2, theta_inn=0.1, theta_out=1,
            theta_rg=0.3, sigma_rg=0.1, a=0.3, n=2, p=0.3, q=0.707,
            A_nt=0.495, alpha_nt=0.1, mean_molecular_weight=0.59)

M, a = 1e14, 0.8
r = np.geomspace(0.02, 5, 10)
comps = dict(DM=A20.DarkMatter(**apar), MDM=A20.ModifiedDarkMatter(**apar),
             BG=A20.BoundGas(**apar), EG=A20.EjectedGas(**apar),
             RG=A20.ReaccretedGas(**apar), Stars=A20.Stars(**apar),
             CLM=A20.CollisionlessMatter(**apar))
rho = {k: np.asarray(v.real(cosmo, r, M, a)) for k, v in comps.items()}
hdr = "   r [Mpc] " + "".join(f"{k:>12s}" for k in comps)
print(hdr)
for i in range(len(r)):
    print(f"   {r[i]:7.3f}" + "".join(f"{rho[k][i]:12.3e}" for k in comps))

p = np.asarray(A20.Pressure(**apar).real(cosmo, r, M, a))
t = np.asarray(A20.Temperature(**apar).real(cosmo, r, M, a))
print("\n   polytropic P(r) [cgs] and T(r) [K] at r=0.1/1.0 Mpc:")
i1, i2 = 4, 8
print(f"   P: {p[i1]:.3e} / {p[i2]:.3e}   T: {t[i1]:.3e} / {t[i2]:.3e}")
