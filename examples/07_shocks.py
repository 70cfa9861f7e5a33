"""Shock-heated gas profiles (reference examples/07_Shocks.ipynb) — ASSERTED.

ShockedGas multiplies the gas density by a logistic suppression toward
the Rankine-Hugoniot maximum compression drop at r = epsilon_shock * R;
the temperature of the shocked component is what produces SZ boundary
features.

Asserted invariants (exit nonzero on regression), all from the shock
model contract (`/root/reference/BaryonForge/Profiles/Schneider19.py:745-822`):
  1. Rankine-Hugoniot floor: far outside the shock the density ratio
     shocked/gas -> 0.25 exactly (a strong shock compresses by at most
     4x, so the downstream density is a 4x DROP of the profile here);
  2. the ratio -> 1 well inside the shock radius (unshocked core);
  3. shock location: at r = epsilon_shock * R_200c the logistic is at
     its midpoint, ratio = (1 - 0.25)/2 + 0.25 = 0.625 exactly;
  4. the transition radius scales linearly with epsilon_shock
     (monotone shift of the half-drop radius);
  5. width_shock controls the logistic steepness in ln r: the analytic
     slope d(ratio)/dlnr at the midpoint is -(1-0.25)/(4 width).

Run: python examples/07_shocks.py   (~1 min, CPU)
"""

import numpy as np

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root
if not _os.environ.get("BENCH"):  # demos run on CPU; BENCH=1 uses the accelerator
    import jax as _jax
    _jax.config.update("jax_platforms", "cpu")
from baryonification_tpu import Cosmology, default_params
from baryonification_tpu.profiles import Gas, ShockedGas

cosmo = Cosmology.from_dict(dict(Omega_m=0.3, Omega_b=0.05, h=0.7,
                                 sigma8=0.8, n_s=0.96, w0=-1.0))
# canonical config (reference examples/default_config.npy), importable
par = default_params()

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

# ---- asserted reproduction ----
R = float(np.asarray(gas.mass_def.get_radius(cosmo, M, a))) / a  # comoving
width = 0.1
fails = []

for eps_shock in (2.0, 4.0, 6.0):
    sg = ShockedGas(epsilon_shock=eps_shock, width_shock=width, **par)
    r_sh = eps_shock * R

    def ratio(rq):
        rq = np.atleast_1d(np.asarray(rq, dtype=float))
        return (np.asarray(sg.real(cosmo, rq, M, a))
                / np.asarray(gas.real(cosmo, rq, M, a)))

    # 1. Rankine-Hugoniot floor far downstream (10 logistic widths out:
    #    e^10 suppression of the transition term, < 3e-5 residual)
    far = float(ratio(r_sh * np.exp(10 * width))[0])
    # 2. unshocked core
    inner = float(ratio(r_sh * np.exp(-10 * width))[0])
    # 3. logistic midpoint at the shock radius
    mid = float(ratio(r_sh)[0])
    # 5. analytic logistic slope in ln r at the midpoint
    h = 0.02 * width
    slope = (float(ratio(r_sh * np.exp(h))[0])
             - float(ratio(r_sh * np.exp(-h))[0])) / (2 * h)
    slope_want = -(1 - 0.25) / (4 * width)
    print(f"eps_shock={eps_shock}: floor {far:.5f} core {inner:.5f} "
          f"mid {mid:.5f} slope {slope:.3f} (want {slope_want:.3f})")
    if abs(far - 0.25) > 1e-3:
        fails.append(f"eps={eps_shock}: floor {far} != 0.25")
    if abs(inner - 1.0) > 1e-3:
        fails.append(f"eps={eps_shock}: core {inner} != 1")
    if abs(mid - 0.625) > 1e-6:
        fails.append(f"eps={eps_shock}: midpoint {mid} != 0.625")
    if abs(slope - slope_want) > 0.02 * abs(slope_want):
        fails.append(f"eps={eps_shock}: slope {slope} != {slope_want}")

# 4. half-drop radius scales linearly with epsilon_shock
r_scan = np.geomspace(0.05 * R, 40 * R, 4000)
for e1, e2 in ((2.0, 4.0), (4.0, 6.0)):
    mids = []
    for e in (e1, e2):
        sg = ShockedGas(epsilon_shock=e, width_shock=width, **par)
        rat = (np.asarray(sg.real(cosmo, r_scan, M, a))
               / np.asarray(gas.real(cosmo, r_scan, M, a)))
        mids.append(r_scan[np.argmin(np.abs(rat - 0.625))])
    got = mids[1] / mids[0]
    if abs(got - e2 / e1) > 0.02 * (e2 / e1):
        fails.append(f"shock radius ratio {got} != {e2/e1}")
    print(f"half-drop radius scaling {e1}->{e2}: {got:.4f} "
          f"(want {e2/e1:.4f})")

if fails:
    print("\nFAIL:\n  " + "\n  ".join(fails))
    raise SystemExit(1)
print("\nPASS: Rankine-Hugoniot 0.25 floor, unshocked core, exact 0.625 "
      "midpoint at epsilon_shock * R_200c, analytic logistic slope, and "
      "linear shock-radius scaling all reproduced")
