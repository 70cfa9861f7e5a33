"""Customizing the adiabatic relaxation (reference
examples/06_Change_Adiabatic_Relaxation.ipynb).

The reference subclasses CollisionlessMatter to change the relaxation
law; here the knobs (relaxation parameters a, n and the iteration
budget) are constructor arguments, and the same subclassing pattern
works because the fixed-point update reads them from ``self``.

Run: python examples/06_custom_relaxation.py
"""

import numpy as np

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root
if not _os.environ.get("BENCH"):  # demos run on CPU; BENCH=1 uses the accelerator
    import jax as _jax
    _jax.config.update("jax_platforms", "cpu")
from baryonification_tpu import Cosmology
from baryonification_tpu.profiles import CollisionlessMatter

cosmo = Cosmology.from_dict(dict(Omega_m=0.3, Omega_b=0.05, h=0.7,
                                 sigma8=0.8, n_s=0.96, w0=-1.0))
base = dict(epsilon=4.0, theta_ej=4.0, theta_co=0.1, M_c=1e14,
            mu_beta=0.1, gamma=2.5, delta=7, eta=0.3, eta_delta=0.1,
            tau=-1.5, tau_delta=0, A=0.055, M1=3e11, epsilon_h=0.015,
            n=2.0, p=0.3, q=0.707, cutoff=np.inf, proj_cutoff=1000)

M, z_l = 1e14, 0.25
a_scale = 1 / (1 + z_l)
r = np.geomspace(0.02, 3, 10)

print("   r [Mpc]   rho_clm ratios vs default (a=0.3):")
print("              a=0.1        a=0.68 (no relaxation-like)")
ref = np.asarray(CollisionlessMatter(a=0.3, **base).real(cosmo, r, M,
                                                         a_scale))
for a_rel in (0.1, 0.68):
    clm = CollisionlessMatter(a=a_rel, **base)
    rho = np.asarray(clm.real(cosmo, r, M, a_scale))
    print(f"  relax a={a_rel}: "
          + "  ".join(f"{rho[i]/ref[i]:7.4f}" for i in range(0, 10, 2)))

# the subclassing pattern: tighten the iteration budget
class OneStepRelaxation(CollisionlessMatter):
    def __init__(self, **kw):
        super().__init__(max_iter=1, **kw)

rho1 = np.asarray(OneStepRelaxation(a=0.3, **base).real(cosmo, r, M,
                                                        a_scale))
print("  1-iter vs 10-iter max |ratio-1|:",
      float(np.abs(rho1 / ref - 1).max()))
