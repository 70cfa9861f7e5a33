"""Evaluate the halo-profile families (reference examples/01, 08, 11, 13)
— ASSERTED.

Prints component densities rho(r) for the Schneider19, Arico20 and Mead20
models at a few radii and masses — the script analog of the reference's
profile-plotting notebooks — then asserts the mass-closure invariants the
figures are drawn to illustrate (exit nonzero on regression):

  1. DarkMatter normalization: the truncated NFW integrates to
     M(<R_200c) = M (`Schneider19.py:405-414`);
  2. baryon budget: M_gas + M_star = f_bar * M_tot with
     f_bar = Omega_b/Omega_m (eqs. 2.13-2.15 of Schneider+19);
  3. total-mass closure: the DarkMatterBaryon sum integrates to the
     DarkMatterOnly total (the construction constraint of the
     displacement method, `Schneider19.py:1070-1190`).

Run: python examples/01_profiles.py   (~2 min, CPU)
"""

import numpy as np

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root
if not _os.environ.get("BENCH"):  # demos run on CPU; BENCH=1 uses the accelerator
    import jax as _jax
    _jax.config.update("jax_platforms", "cpu")
from baryonification_tpu import Cosmology, default_params
from baryonification_tpu.profiles import Schneider19 as S19
from baryonification_tpu.profiles import Arico20 as A20
from baryonification_tpu.profiles import Mead20 as M20

cosmo = Cosmology(Omega_m=0.3, Omega_b=0.05, h=0.7, sigma8=0.8, n_s=0.96)

# canonical Schneider19 parameters: the importable analog of the
# reference's examples/default_config.npy
s19_par = default_params()

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

# ---- asserted mass-closure invariants ----
def sph_mass(prof, r_int, Ms):
    rho = np.asarray(prof.real(cosmo, r_int, Ms, a))
    return np.trapezoid(4 * np.pi * r_int**2 * rho, r_int, axis=-1)

masses = np.array([1e13, 1e14, 1e15])
r_wide = np.geomspace(1e-6, 1000, 4000)
fails = []

# 1. truncated-NFW normalization: M(<R_200c) = M
dm = S19.DarkMatter(**s19_par)
R200 = np.asarray(dm.mass_def.get_radius(cosmo, masses, a)) / a
rho_dm = np.asarray(dm.real(cosmo, r_wide, masses, a))
for i, Mi in enumerate(masses):
    sel = r_wide < R200[i]
    Menc = np.trapezoid(4 * np.pi * r_wide[sel]**2 * rho_dm[i][sel],
                        r_wide[sel])
    print(f"M_enc(R_200c)/M at M={Mi:.0e}: {Menc / Mi:.4f}")
    if abs(Menc / Mi - 1) > 0.02:
        fails.append(f"NFW closure off at M={Mi:.1e}: {Menc / Mi:.4f}")

# 2. baryon budget: gas + central stars + satellite stars = f_bar * M_tot.
#    The Stars PROFILE carries only the central galaxy (f_cga,
#    `Schneider19.py:583-618`); satellite stars ride inside
#    CollisionlessMatter, so their analytic fraction
#    f_sga = f_star - f_cga closes the budget (eqs. 2.13-2.15).
M_tot = sph_mass(dm, r_wide, masses)           # includes truncation tail
M_gas = sph_mass(S19.Gas(**s19_par), r_wide, masses)
M_str = sph_mass(S19.Stars(**s19_par), np.geomspace(1e-6, 10, 4000), masses)
A_, M1_ = s19_par["A"], s19_par["M1"]
tau_, eta_ = s19_par["tau"], s19_par["eta"]
f_star = 2 * A_ / ((masses / M1_) ** tau_ + (masses / M1_) ** eta_)
f_cga = 2 * A_ / ((masses / M1_) ** (tau_ + s19_par["tau_delta"])
                  + (masses / M1_) ** (eta_ + s19_par["eta_delta"]))
f_bar = cosmo.Omega_b / cosmo.Omega_m
got = (M_gas + M_str) / M_tot + (f_star - f_cga)
print(f"(M_gas + M_star_cga + f_sga M) / (f_bar M_tot): "
      + "  ".join(f"{x / f_bar:.4f}" for x in got))
if np.any(np.abs(got / f_bar - 1) > 0.02):
    fails.append(f"baryon budget violated: {got / f_bar}")

# 3. one-halo DMB total mass equals the one-halo DMO total over the
#    model's matching range r < 100 Mpc (the displacement-method
#    constraint; both composites carry the SAME TwoHalo term, so it is
#    subtracted to expose the matched one-halo normalization)
r_m = np.geomspace(1e-6, 100, 4000)
th = np.asarray(S19.TwoHalo(**s19_par).real(cosmo, r_m, masses, a))
rho_dmb = np.asarray(S19.DarkMatterBaryon(**s19_par)
                     .real(cosmo, r_m, masses, a)) - th
rho_dmo = np.asarray(S19.DarkMatterOnly(**s19_par)
                     .real(cosmo, r_m, masses, a)) - th
M_dmb = np.trapezoid(4 * np.pi * r_m**2 * rho_dmb, r_m, axis=-1)
M_dmo = np.trapezoid(4 * np.pi * r_m**2 * rho_dmo, r_m, axis=-1)
print("one-halo M_DMB / M_DMO:", "  ".join(f"{x:.4f}" for x in M_dmb / M_dmo))
if np.any(np.abs(M_dmb / M_dmo - 1) > 0.02):
    fails.append(f"DMB/DMO one-halo mass closure violated: {M_dmb / M_dmo}")

if fails:
    print("\nFAIL:\n  " + "\n  ".join(fails))
    raise SystemExit(1)
print("\nPASS: NFW M(<R_200c)=M, gas+stars = f_bar * M_tot, and "
      "DMB total = DMO total all hold to 2%")
