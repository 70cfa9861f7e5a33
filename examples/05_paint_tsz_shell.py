"""Paint a Compton-y (tSZ) map on a lightcone shell (reference examples/05).

Builds the Schneider19 hydrostatic pressure -> ThermalSZ stack, convolves
with the HEALPix pixel window, tabulates, and paints onto a shell.

Run: python examples/05_paint_tsz_shell.py
"""

import time

import numpy as np

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root
if not _os.environ.get("BENCH"):  # demos run on CPU; BENCH=1 uses the accelerator
    import jax as _jax
    _jax.config.update("jax_platforms", "cpu")
from baryonification_tpu import (Cosmology, HaloLightConeCatalog,
                                 LightconeShell, PaintProfilesShell,
                                 ConvolvedProfile, HealPixel,
                                 TabulatedProfile)
from baryonification_tpu.profiles import ThermalSZ
from baryonification_tpu.ops import healpix as hpx

nside = 64
n_halo = 2_000

cosmo_dict = dict(Omega_m=0.3, Omega_b=0.05, h=0.7, sigma8=0.8, n_s=0.96,
                  w0=-1.0)
cosmo = Cosmology.from_dict(cosmo_dict)

par = dict(epsilon=4.0, theta_ej=4, theta_co=0.1, M_c=1e14, mu_beta=0.1,
           gamma=2.5, delta=7, eta=0.3, eta_delta=0.1, tau=-1.5,
           tau_delta=0, A=0.055, M1=3e11, epsilon_h=0.015, a=0.3, n=2.0,
           p=0.3, q=0.707, cutoff=np.inf, proj_cutoff=1000)

print("tabulating pixel-convolved tSZ profile ...")
t0 = time.time()
y_model = ConvolvedProfile(ThermalSZ(**par), HealPixel(NSIDE=nside))
tab = TabulatedProfile(y_model, cosmo)
tab.setup_interpolator(z_min=0.05, z_max=1.0, N_samples_z=8,
                       M_min=1e12, M_max=1e16, N_samples_Mass=20,
                       R_min=1e-3, R_max=1e2, N_samples_R=100)
print(f"  table built in {time.time() - t0:.1f}s")

rng = np.random.default_rng(2)
cat = HaloLightConeCatalog(
    ra=rng.uniform(0, 360, n_halo),
    dec=np.degrees(np.arcsin(rng.uniform(-1, 1, n_halo))),
    M=10 ** rng.uniform(13.5, 15.0, n_halo),
    z=rng.uniform(0.1, 0.9, n_halo), cosmo=cosmo_dict)
shell = LightconeShell(map=np.zeros(hpx.npix(nside)), cosmo=cosmo_dict)

runner = PaintProfilesShell(cat, shell, epsilon_max=5, model=tab,
                            verbose=False)
t0 = time.time()
y_map = runner.process()
print(f"painted tSZ on NSIDE={nside} in {time.time() - t0:.1f}s")
print(f"  mean y = {y_map.mean():.3e}, max y = {y_map.max():.3e}")
print(f"  painted pixels: {(y_map > 0).sum()} / {y_map.size}")
