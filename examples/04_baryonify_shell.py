"""Baryonify a full-sky HEALPix density shell (reference examples/04).

Builds the Schneider19 DMO/DMB displacement model, tabulates the 2D
(map-level) displacement function, and displaces the mass of a lightcone
shell around a synthetic halo catalog. Prints mass-conservation and map
change summaries.

Run: python examples/04_baryonify_shell.py            (NSIDE=64 demo)
     BENCH=1 python examples/04_baryonify_shell.py    (NSIDE=1024)
"""

import os
import time

import numpy as np

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root
if not _os.environ.get("BENCH"):  # demos run on CPU; BENCH=1 uses the accelerator
    import jax as _jax
    _jax.config.update("jax_platforms", "cpu")
from baryonification_tpu import (Cosmology, HaloLightConeCatalog,
                                 LightconeShell, BaryonifyShell)
from baryonification_tpu.displacement import Baryonification2D
from baryonification_tpu.profiles import DarkMatterOnly, DarkMatterBaryon
from baryonification_tpu.ops import healpix as hpx

nside = 1024 if os.environ.get("BENCH") else 64
n_halo = 200_000 if os.environ.get("BENCH") else 2_000

cosmo_dict = dict(Omega_m=0.3, Omega_b=0.05, h=0.7, sigma8=0.8, n_s=0.96,
                  w0=-1.0)
cosmo = Cosmology.from_dict(cosmo_dict)

par = dict(epsilon=4.0, theta_ej=4, theta_co=0.1, M_c=1e14, mu_beta=0.1,
           gamma=2.5, delta=7, eta=0.3, eta_delta=0.1, tau=-1.5,
           tau_delta=0, A=0.055, M1=3e11, epsilon_h=0.015, a=0.3, n=2.0,
           p=0.3, q=0.707, cutoff=np.inf, proj_cutoff=1000)

print("building displacement table ...")
t0 = time.time()
model = Baryonification2D(DarkMatterOnly(**par), DarkMatterBaryon(**par),
                          cosmo, epsilon_max=20)
model.setup_interpolator(z_min=0.05, z_max=1.0, N_samples_z=8,
                         M_min=1e12, M_max=1e16, N_samples_Mass=20,
                         R_min=1e-3, R_max=1e2, N_samples_R=100)
print(f"  table built in {time.time() - t0:.1f}s")

rng = np.random.default_rng(1)
cat = HaloLightConeCatalog(
    ra=rng.uniform(0, 360, n_halo),
    dec=np.degrees(np.arcsin(rng.uniform(-1, 1, n_halo))),
    M=10 ** rng.uniform(13.0, 15.0, n_halo),
    z=rng.uniform(0.1, 0.9, n_halo), cosmo=cosmo_dict)
shell = LightconeShell(map=rng.uniform(0.5, 1.5, hpx.npix(nside)),
                       cosmo=cosmo_dict)

runner = BaryonifyShell(cat, shell, epsilon_max=20, model=model,
                        verbose=False)
t0 = time.time()
new_map = runner.process()
print(f"baryonified NSIDE={nside} shell with {n_halo} halos "
      f"in {time.time() - t0:.1f}s (incl. compile)")
print(f"  mass conservation: {new_map.sum() / shell.map.sum() - 1:+.2e}")
print(f"  rms map change   : "
      f"{np.sqrt(np.mean((new_map - shell.map) ** 2)):.4e}")
print(f"  max |change|     : {np.abs(new_map - shell.map).max():.4e}")
