"""Schneider+19 component density profiles (reference
examples/08_Reproduce_Schneider19.ipynb, Fig. 1 of Schneider+19).

Evaluates the component rho(r) at M = 10^14 Msun, z = 0 and prints the
fractions: CollisionlessMatter + Gas + Stars should approach the total
DMB profile, and the enclosed DMO vs DMB masses converge at large r
(the defining property the displacement function inverts).

Run: python examples/08_schneider19_profiles.py
"""

import numpy as np

from baryonification_tpu import Cosmology
from baryonification_tpu.profiles import (DarkMatter, CollisionlessMatter,
                                          Gas, Stars, DarkMatterOnly,
                                          DarkMatterBaryon)

cosmo = Cosmology.from_dict(dict(Omega_m=0.3, Omega_b=0.05, h=0.7,
                                 sigma8=0.8, n_s=0.96, w0=-1.0))

par = dict(epsilon=4.0, theta_ej=4.0, theta_co=0.1, M_c=1e14, mu_beta=0.1,
           gamma=2.5, delta=7, eta=0.3, eta_delta=0.1, tau=-1.5,
           tau_delta=0, A=0.055, M1=3e11, epsilon_h=0.015, a=0.3, n=2.0,
           p=0.3, q=0.707, cutoff=np.inf, proj_cutoff=1000)

M, a = 1e14, 1.0
r = np.geomspace(0.01, 10, 13)

comps = dict(DM=DarkMatter(**par), CLM=CollisionlessMatter(**par),
             Gas=Gas(**par), Stars=Stars(**par),
             DMO=DarkMatterOnly(**par), DMB=DarkMatterBaryon(**par))
rho = {k: np.asarray(v.real(cosmo, r, M, a)) for k, v in comps.items()}

print("   r [Mpc]    rho_DM       rho_CLM      rho_Gas      rho_Star     "
      "(CLM+Gas+Star)/DMB")
for i in range(len(r)):
    tot = rho['CLM'][i] + rho['Gas'][i] + rho['Stars'][i]
    print(f"   {r[i]:7.3f}  {rho['DM'][i]:11.4e}  {rho['CLM'][i]:11.4e}"
          f"  {rho['Gas'][i]:11.4e}  {rho['Stars'][i]:11.4e}"
          f"   {tot / rho['DMB'][i]:7.4f}")

# enclosed-mass convergence
rr = np.geomspace(1e-3, 60, 4000)
m_dmo = np.trapezoid(4 * np.pi * rr**2
                     * np.asarray(comps['DMO'].real(cosmo, rr, M, a)), rr)
m_dmb = np.trapezoid(4 * np.pi * rr**2
                     * np.asarray(comps['DMB'].real(cosmo, rr, M, a)), rr)
print(f"\nM_DMO(<60 Mpc) / M_DMB(<60 Mpc) = {m_dmo / m_dmb:.5f}")
