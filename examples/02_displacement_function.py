"""Displacement function d(r | M, z) across mass and redshift (reference
examples/02_Displacement_function.ipynb).

Builds the Schneider19 DMO->DMB displacement table and prints the
displacement profile at a few masses, plus the parameter sensitivity to
theta_ej (larger ejection radius pushes mass farther out).

Run: python examples/02_displacement_function.py
"""

import numpy as np

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root
if not _os.environ.get("BENCH"):  # demos run on CPU; BENCH=1 uses the accelerator
    import jax as _jax
    _jax.config.update("jax_platforms", "cpu")
from baryonification_tpu import Cosmology
from baryonification_tpu.displacement import Baryonification3D
from baryonification_tpu.profiles import DarkMatterOnly, DarkMatterBaryon

cosmo = Cosmology.from_dict(dict(Omega_m=0.3, Omega_b=0.05, h=0.7,
                                 sigma8=0.8, n_s=0.96, w0=-1.0))

base = dict(epsilon=4.0, theta_co=0.1, M_c=1e14, mu_beta=0.1, gamma=2.5,
            delta=7, eta=0.3, eta_delta=0.1, tau=-1.5, tau_delta=0,
            A=0.055, M1=3e11, epsilon_h=0.015, a=0.3, n=2.0, p=0.3,
            q=0.707, cutoff=np.inf, proj_cutoff=1000)

r = np.geomspace(0.03, 20, 14)

for theta_ej in (4.0, 8.0):
    par = dict(base, theta_ej=theta_ej)
    model = Baryonification3D(DarkMatterOnly(**par),
                              DarkMatterBaryon(**par), cosmo,
                              epsilon_max=20)
    model.setup_interpolator(z_min=0.1, z_max=0.3, N_samples_z=2,
                             M_min=1e13, M_max=1e15, N_samples_Mass=4,
                             R_min=1e-2, R_max=50, N_samples_R=64)
    print(f"\ntheta_ej = {theta_ej}")
    print("   r [Mpc]   " + "".join(f"d(M=1e{m:g})  " for m in (13, 14, 15)))
    ds = [np.asarray(model.displacement(r, 10.0 ** m, 0.8))
          for m in (13, 14, 15)]
    for i in range(0, len(r), 2):
        print(f"   {r[i]:7.3f}   " + "".join(f"{d[i]:+9.5f}   "
                                             for d in ds))
