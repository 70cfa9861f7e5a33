"""dC_ell from shell baryonification (reference examples/09).

Baryonifies a HEALPix shell for a sweep of theta_ej values and measures
the angular power-spectrum ratio C_ell(baryonified)/C_ell(DMO) with the
on-device anafast equivalent.

Run: python examples/09_delta_cls_shells.py
"""

import time

import numpy as np
import jax.numpy as jnp

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root
from baryonification_tpu import (Cosmology, HaloLightConeCatalog,
                                 LightconeShell, BaryonifyShell)
from baryonification_tpu.displacement import Baryonification2D
from baryonification_tpu.profiles import DarkMatterOnly, DarkMatterBaryon
from baryonification_tpu.ops import healpix as hpx
from baryonification_tpu.ops.spectra import anafast

nside = 64
lmax = 2 * nside
n_halo = 3_000

cosmo_dict = dict(Omega_m=0.3, Omega_b=0.05, h=0.7, sigma8=0.8, n_s=0.96,
                  w0=-1.0)
cosmo = Cosmology.from_dict(cosmo_dict)

base_par = dict(epsilon=4.0, theta_co=0.1, M_c=1e14, mu_beta=0.1,
                gamma=2.5, delta=7, eta=0.3, eta_delta=0.1, tau=-1.5,
                tau_delta=0, A=0.055, M1=3e11, epsilon_h=0.015, a=0.3,
                n=2.0, p=0.3, q=0.707, cutoff=np.inf, proj_cutoff=1000)

rng = np.random.default_rng(4)
cat = HaloLightConeCatalog(
    ra=rng.uniform(0, 360, n_halo),
    dec=np.degrees(np.arcsin(rng.uniform(-1, 1, n_halo))),
    M=10 ** rng.uniform(13.2, 15.0, n_halo),
    z=rng.uniform(0.1, 0.9, n_halo), cosmo=cosmo_dict)

# mass shell: clustered around halos so dC_ell is visible
mass_map = rng.uniform(0.8, 1.2, hpx.npix(nside))
th, ph = np.asarray(hpx.radec2ang(cat.cat['ra'], cat.cat['dec']))
pix = np.asarray(hpx.ang2pix(nside, jnp.asarray(th), jnp.asarray(ph)))
np.add.at(mass_map, pix, cat.cat['M'] / 1e14)
shell = LightconeShell(map=mass_map, cosmo=cosmo_dict)

cl0 = np.asarray(anafast(jnp.asarray(shell.map), nside, lmax))

print("theta_ej sweep (dC_ell/C_ell at a few ells):")
ells = [8, 16, 32, 48, 64, 96]
print("            " + "  ".join(f"l={l:3d}" for l in ells))
for theta_ej in (2.0, 4.0, 8.0):
    par = dict(base_par, theta_ej=theta_ej)
    model = Baryonification2D(DarkMatterOnly(**par),
                              DarkMatterBaryon(**par), cosmo,
                              epsilon_max=20)
    model.setup_interpolator(z_min=0.05, z_max=1.0, N_samples_z=6,
                             M_min=1e12, M_max=1e16, N_samples_Mass=16,
                             R_min=1e-3, R_max=1e2, N_samples_R=100,
                             verbose=False)
    runner = BaryonifyShell(cat, shell, epsilon_max=20, model=model,
                            verbose=False)
    t0 = time.time()
    new_map = runner.process()
    cl1 = np.asarray(anafast(jnp.asarray(new_map), nside, lmax))
    ratios = "  ".join(f"{cl1[l] / cl0[l] - 1:+.3f}" for l in ells)
    print(f"theta_ej={theta_ej:4.1f}  {ratios}   ({time.time()-t0:.0f}s)")
