"""Mead+20 component profiles with the published BAHAMAS calibrations
(reference examples/13_Plot_Profiles_Mead.ipynb) — ASSERTED.

Prints the component densities for two published TAGN calibrations, then
asserts the mass bookkeeping of the Mead+20 construction (exit nonzero
on regression; `/root/reference/BaryonForge/Profiles/Mead20.py:100-500`):

  1. DarkMatter (hard-truncated NFW): M_enc(R_200c) = M exactly;
  2. BoundGas integrates to f_bnd * M inside R;
  3. EjectedGas integrates to (f_bar - f_star - f_bnd) * M over all
     space (its R_ej is solved from the Schneider & Teyssier escape
     equation);
  4. total closure: CLM + BoundGas + EjectedGas + Stars integrate to M
     (the identity (1 - f_bar + f_sat) + f_bnd + f_ej + f_cen = 1).

Run: python examples/13_mead_profiles.py   (~1 min, CPU)
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

# ---- asserted mass bookkeeping (both calibrations) ----
import jax.numpy as jnp

masses = np.array([1e13, 1e14, 1e15])
fails = []
for name in ("Params_TAGN_7p6", "Params_TAGN_8p0"):
    par = dict(getattr(M20, name))
    dm = M20.DarkMatter(**par)
    R200 = np.asarray(dm.mass_def.get_radius(cosmo, masses, a)) / a
    f_str, f_cen, f_sat = (np.asarray(x) for x in
                           dm._get_fstar(jnp.asarray(masses), a))
    f_bar = cosmo.Omega_b / cosmo.Omega_m
    f_bnd = np.asarray(dm._f_bnd(cosmo, jnp.asarray(masses), a))
    f_ej = f_bar - f_str - f_bnd

    def mass_to(prof, r_max):
        got = np.empty(len(masses))
        for i, (Mi, Ri) in enumerate(zip(masses, r_max)):
            rr = np.geomspace(1e-6, Ri, 6000)
            rho = np.asarray(prof.real(cosmo, rr, Mi, a))
            got[i] = np.trapezoid(4 * np.pi * rr**2 * rho, rr)
        return got

    checks = [
        ("DM M_enc(R) = M", mass_to(dm, R200), np.ones(3)),
        ("BoundGas(<R) = f_bnd M", mass_to(M20.BoundGas(**par), R200),
         f_bnd),
        ("EjectedGas(tot) = f_ej M",
         mass_to(M20.EjectedGas(**par), 400 * R200), f_ej),
        ("Stars(tot) = f_cen M",
         mass_to(M20.Stars(**par), 20 * R200), f_cen),
        ("CLM(<R) = (1 - f_bar + f_sat) M",
         mass_to(M20.CollisionlessMatter(**par), R200),
         1 - f_bar + f_sat),
    ]
    print(f"\n{name} bookkeeping:")
    tot = np.zeros(len(masses))
    for label, got, want in checks:
        ratio = got / (want * masses)
        if label != "DM M_enc(R) = M":
            tot += got / masses
        print(f"  {label}: " + "  ".join(f"{x:.4f}" for x in ratio))
        if np.any(np.abs(ratio - 1) > 0.02):
            fails.append(f"{name} {label}: {ratio}")
    # 4. total closure (f_cen + f_sat = f_str makes the sum exactly M)
    print("  total (CLM+BG+EG+Stars)/M:",
          "  ".join(f"{x:.4f}" for x in tot))
    if np.any(np.abs(tot - 1) > 0.02):
        fails.append(f"{name} total closure: {tot}")

if fails:
    print("\nFAIL:\n  " + "\n  ".join(fails))
    raise SystemExit(1)
print("\nPASS: Mead20 component masses match their bookkeeping fractions "
      "and the total closes at M for both TAGN calibrations (2%)")
