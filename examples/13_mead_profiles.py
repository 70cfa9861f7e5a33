"""Mead+20 component profiles with the published BAHAMAS calibrations
(reference examples/13_Plot_Profiles_Mead.ipynb).

Run: python examples/13_mead_profiles.py
"""

import numpy as np

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root
if not _os.environ.get("BENCH"):  # demos run on CPU; BENCH=1 uses the accelerator
    import jax as _jax
    _jax.config.update("jax_platforms", "cpu")
from baryonification_tpu import Cosmology
from baryonification_tpu.profiles import mead20 as M20

cosmo = Cosmology.from_dict(dict(Omega_m=0.3, Omega_b=0.05, h=0.7,
                                 sigma8=0.8, n_s=0.96, w0=-1.0))

M, a = 1e14, 0.8
r = np.geomspace(0.02, 5, 8)

for name in ("Params_TAGN_7p6", "Params_TAGN_8p0"):
    par = dict(getattr(M20, name))
    comps = dict(DM=M20.DarkMatter(**par), CLM=M20.CollisionlessMatter(**par),
                 BG=M20.BoundGas(**par), EG=M20.EjectedGas(**par),
                 Stars=M20.Stars(**par))
    rho = {k: np.asarray(v.real(cosmo, r, M, a)) for k, v in comps.items()}
    print(f"\n{name}:")
    print("   r [Mpc] " + "".join(f"{k:>12s}" for k in comps))
    for i in range(len(r)):
        print(f"   {r[i]:7.3f}"
              + "".join(f"{rho[k][i]:12.3e}" for k in comps))
