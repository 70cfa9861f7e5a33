"""Arico+20 component profiles (reference examples/11_Plot_Profiles_Arico.ipynb)
— ASSERTED.

Prints the component densities, then asserts the gas/stellar mass
bookkeeping the Arico+20 model is built on (exit nonzero on regression;
`/root/reference/BaryonForge/Profiles/Arico20.py:330-568`):

  1. BoundGas integrates to f_bg * M inside R_200c (its normalization
     integral is hard-cut at R);
  2. ReaccretedGas integrates to f_rg * M inside R (analytic erf norm,
     zero beyond R);
  3. EjectedGas integrates to f_eg * M over all space (Gaussian);
  4. Stars integrate to f_cg * M;
  5. full baryon budget: f_bg + f_eg + f_rg + f_cg + f_sg = f_bar
     realized by the profile INTEGRALS (satellite stars f_sg ride in
     CollisionlessMatter, added analytically).

Run: python examples/11_arico_profiles.py   (~1 min, CPU)
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

# ---- asserted mass bookkeeping ----
import jax.numpy as jnp

masses = np.array([1e13, 1e14, 1e15])
z = 1 / a - 1
bg = comps["BG"]
fr = {k: np.asarray(v) for k, v in
      bg._gas_fractions(cosmo, jnp.asarray(masses), z).items()}
f_cg = np.asarray(bg._get_star_frac(jnp.asarray(masses), z))
f_sg = np.asarray(bg._get_star_frac(jnp.asarray(masses), z,
                                    satellite=True))
R200 = np.asarray(bg.mass_def.get_radius(cosmo, masses, a)) / a


def mass_to(prof, r_max):
    got = np.empty(len(masses))
    for i, (Mi, Ri) in enumerate(zip(masses, r_max)):
        rr = np.geomspace(1e-6, Ri, 6000)
        rho = np.asarray(prof.real(cosmo, rr, Mi, a))
        got[i] = np.trapezoid(4 * np.pi * rr**2 * rho, rr)
    return got


fails = []
checks = [
    ("BoundGas(<R) = f_bg M", mass_to(comps["BG"], R200), fr["f_bg"]),
    ("ReaccretedGas(<R) = f_rg M", mass_to(comps["RG"], R200), fr["f_rg"]),
    ("EjectedGas(tot) = f_eg M",
     mass_to(comps["EG"], 60 * R200), fr["f_eg"]),
    ("Stars(tot) = f_cg M",
     mass_to(comps["Stars"], 20 * R200), f_cg),
]
tot = np.zeros(len(masses))
for name, got, want in checks:
    ratio = got / (want * masses)
    tot += got / masses
    print(f"{name}: " + "  ".join(f"{x:.4f}" for x in ratio))
    if np.any(np.abs(ratio - 1) > 0.02):
        fails.append(f"{name}: {ratio}")

# 5. integral baryon budget (satellites analytic)
f_bar = fr["f_bar"]
budget = (tot + f_sg) / f_bar
print("(sum of components + f_sg) / f_bar:",
      "  ".join(f"{x:.4f}" for x in budget))
if np.any(np.abs(budget - 1) > 0.02):
    fails.append(f"baryon budget: {budget}")

if fails:
    print("\nFAIL:\n  " + "\n  ".join(fails))
    raise SystemExit(1)
print("\nPASS: every Arico20 gas/stellar component integrates to its "
      "bookkeeping fraction and the budget closes at f_bar (2%)")
