"""Pixel-window smoothing of profiles (reference
examples/03_Pixel_Smoothing.ipynb).

Convolves the projected gas profile with a grid pixel window
(GridPixelApprox) and a HEALPix Gaussian beam (HealPixel): smoothing
suppresses the profile inside ~a pixel scale and conserves the total.

Run: python examples/03_pixel_smoothing.py
"""

import numpy as np

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root
if not _os.environ.get("BENCH"):  # demos run on CPU; BENCH=1 uses the accelerator
    import jax as _jax
    _jax.config.update("jax_platforms", "cpu")
from baryonification_tpu import Cosmology
from baryonification_tpu.profiles import Gas
from baryonification_tpu.pixels import (ConvolvedProfile, GridPixelApprox,
                                        HealPixel, NoPix)

cosmo = Cosmology.from_dict(dict(Omega_m=0.3, Omega_b=0.05, h=0.7,
                                 sigma8=0.8, n_s=0.96, w0=-1.0))
par = dict(epsilon=4.0, theta_ej=4.0, theta_co=0.1, M_c=1e14, mu_beta=0.1,
           gamma=2.5, delta=7, eta=0.3, eta_delta=0.1, tau=-1.5,
           tau_delta=0, A=0.055, M1=3e11, epsilon_h=0.015, a=0.3, n=2.0,
           p=0.3, q=0.707, cutoff=np.inf, proj_cutoff=1000)

gas = Gas(**par)
M, a = 1e14, 0.8
r = np.geomspace(0.05, 5, 10)

raw = np.asarray(gas.projected(cosmo, r, M, a))
grid = np.asarray(ConvolvedProfile(gas, GridPixelApprox(0.3))
                  .projected(cosmo, r, M, a))
beam = np.asarray(ConvolvedProfile(gas, HealPixel(NSIDE=128))
                  .projected(cosmo, r, M, a))

print("   r [Mpc]   Sigma_raw     grid(0.3Mpc)/raw   healpix128/raw")
for i in range(len(r)):
    print(f"   {r[i]:7.3f}  {raw[i]:11.4e}   {grid[i]/raw[i]:10.4f}"
          f"       {beam[i]/raw[i]:10.4f}")
