"""Arico+20 dP(k)/P(k) from snapshot baryonification (reference
examples/12_Reproduce_Arico_deltaPk.ipynb).

Uses the Arico20 profile family with a 3D displacement model built with
``Rdelta_sampling=True`` (the r/R_Delta radial axis that resolves the
model's sharp truncation features, `BaryonCorrection.py:286-306`) and
``epsilon_max=2`` as in the reference notebook, then displaces particles
in a periodic box and measures the matter power-spectrum ratio.

Run: python examples/12_arico_delta_pk_snapshot.py
"""

import time

import numpy as np

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root
from baryonification_tpu import (Cosmology, HaloNDCatalog,
                                 ParticleSnapshot)
from baryonification_tpu.displacement import Baryonification3D
from baryonification_tpu.profiles import arico20 as A20
from baryonification_tpu.runners import BaryonifySnapshot
from baryonification_tpu.ops.spectra import power_spectrum_3d

h = 0.7
cosmo_dict = dict(Omega_m=0.3, Omega_b=0.05, h=h, sigma8=0.8, n_s=0.96,
                  w0=-1.0)
cosmo = Cosmology.from_dict(cosmo_dict)

apar = dict(alpha_g=2, epsilon_h=0.015, M1_0=2.2e11 / h, alpha_sat=1,
            M_c=1.2e14 / h, eta=0.6, mu=0.31, beta=0.6,
            epsilon_hydro=np.sqrt(5), M_inn=3.3e13 / h,
            M_r=1e30, beta_r=2, theta_inn=0.1, theta_out=1,
            theta_rg=0.3, sigma_rg=0.1, a=0.3, n=2, p=0.3, q=0.707,
            A_nt=0.495, alpha_nt=0.1, mean_molecular_weight=0.59)

L = 250.0          # Mpc box
n_part = 64 ** 3
n_halo = 800
n_grid = 128

rng = np.random.default_rng(11)

# clustered mock: particles around halos + uniform background
hx = rng.uniform(0, L, n_halo)
hy = rng.uniform(0, L, n_halo)
hz = rng.uniform(0, L, n_halo)
M = 10 ** rng.uniform(13.0, 14.8, n_halo)
w = M / M.sum()
n_clust = n_part // 2
sel = rng.choice(n_halo, n_clust, p=w)
scatter = rng.normal(0, 1.0, (n_clust, 3)) * (M[sel, None] / 1e14) ** (1 / 3)
px = np.mod(np.concatenate([hx[sel] + scatter[:, 0],
                            rng.uniform(0, L, n_part - n_clust)]), L)
py = np.mod(np.concatenate([hy[sel] + scatter[:, 1],
                            rng.uniform(0, L, n_part - n_clust)]), L)
pz = np.mod(np.concatenate([hz[sel] + scatter[:, 2],
                            rng.uniform(0, L, n_part - n_clust)]), L)

cat = HaloNDCatalog(x=hx, y=hy, z=hz, M=M, redshift=0.0, cosmo=cosmo_dict)
snap = ParticleSnapshot(x=px, y=py, z=pz, M=np.ones(n_part), L=L,
                        redshift=0.0, cosmo=cosmo_dict)

DMO = A20.DarkMatterOnly(**apar)
DMB = A20.DarkMatterBaryon(**apar)

t0 = time.time()
model = Baryonification3D(DMO, DMB, cosmo, epsilon_max=2)
model.setup_interpolator(z_min=0.0, z_max=0.1, N_samples_z=2,
                         z_linear_sampling=True,
                         M_min=1e12, M_max=1e16,
                         N_samples_Mass=8, R_min=1e-3, R_max=30,
                         N_samples_R=100, Rdelta_sampling=True)
print(f"displacement table (Rdelta sampling): {time.time() - t0:.0f}s")

t0 = time.time()
new_cat = BaryonifySnapshot(cat, snap, epsilon_max=2, model=model,
                            verbose=False).process()
print(f"baryonified {n_part} particles: {time.time() - t0:.1f}s")

snap_b = ParticleSnapshot(x=new_cat['x'], y=new_cat['y'], z=new_cat['z'],
                          M=new_cat['M'], L=L, redshift=0.0,
                          cosmo=cosmo_dict)

rho0 = np.asarray(snap.make_map(n_grid))
rho1 = np.asarray(snap_b.make_map(n_grid))
k, P0, _ = power_spectrum_3d(rho0 / rho0.mean() - 1, L)
k, P1, _ = power_spectrum_3d(rho1 / rho1.mean() - 1, L)

good = np.asarray(P0) > 0
k, r = np.asarray(k)[good], (np.asarray(P1) / np.asarray(P0))[good]
print("\n   k [1/Mpc]   dP/P")
for i in range(0, len(k), max(1, len(k) // 10)):
    print(f"   {k[i]:8.3f}   {r[i] - 1:+.4f}")
