"""Snapshot baryonification and dP(k)/P(k) (reference examples/10, 12).

Displaces particles of a synthetic periodic box around a halo catalog with
the 3D Schneider19 displacement model, grids the particles, and measures
the matter power-spectrum ratio before/after — the pipeline used to
reproduce Schneider+19 Fig. 2 in the reference (numba histogram + np.fft
there; jnp.fft + Pallas-scattered CIC here).

Run: python examples/10_delta_pk_snapshot.py
"""

import time

import numpy as np
import jax.numpy as jnp

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root
from baryonification_tpu import (Cosmology, HaloNDCatalog,
                                 ParticleSnapshot, BaryonifySnapshot)
from baryonification_tpu.displacement import Baryonification3D
from baryonification_tpu.profiles import DarkMatterOnly, DarkMatterBaryon
from baryonification_tpu.ops.spectra import power_spectrum_3d

cosmo_dict = dict(Omega_m=0.3, Omega_b=0.05, h=0.7, sigma8=0.8, n_s=0.96,
                  w0=-1.0)
cosmo = Cosmology.from_dict(cosmo_dict)

par = dict(epsilon=4.0, theta_ej=4, theta_co=0.1, M_c=1e14, mu_beta=0.1,
           gamma=2.5, delta=7, eta=0.3, eta_delta=0.1, tau=-1.5,
           tau_delta=0, A=0.055, M1=3e11, epsilon_h=0.015, a=0.3, n=2.0,
           p=0.3, q=0.707, cutoff=np.inf, proj_cutoff=1000)

print("building 3D displacement table ...")
model = Baryonification3D(DarkMatterOnly(**par), DarkMatterBaryon(**par),
                          cosmo, epsilon_max=10)
model.setup_interpolator(z_min=0.05, z_max=0.5, N_samples_z=4,
                         M_min=1e13, M_max=10**15.5, N_samples_Mass=12,
                         R_min=1e-3, R_max=70, N_samples_R=100)

# synthetic box: uniform particles + NFW-ish clumps at halo positions
rng = np.random.default_rng(3)
L = 150.0
n_halo = 40
n_grid = 128
hx = rng.uniform(0, L, (n_halo, 3))
hM = 10 ** rng.uniform(13.8, 15.0, n_halo)

parts = [rng.uniform(0, L, (300_000, 3))]
for j in range(n_halo):
    n_in = int(hM[j] / 2e11)
    rr = 0.5 * rng.exponential(0.8, n_in)
    u = rng.normal(size=(n_in, 3))
    u /= np.linalg.norm(u, axis=1)[:, None]
    parts.append(np.mod(hx[j] + rr[:, None] * u, L))
xyz = np.concatenate(parts)
print(f"box: {len(xyz):,} particles, {n_halo} halos")

snap = ParticleSnapshot(x=xyz[:, 0], y=xyz[:, 1], z=xyz[:, 2],
                        M=np.ones(len(xyz)), L=L, redshift=0.25,
                        cosmo=cosmo_dict)
cat = HaloNDCatalog(x=hx[:, 0], y=hx[:, 1], z=hx[:, 2], M=hM,
                    redshift=0.25, cosmo=cosmo_dict)

t0 = time.time()
runner = BaryonifySnapshot(cat, snap, epsilon_max=10, model=model)
new_cat = runner.process()
print(f"displaced particles in {time.time() - t0:.1f}s")

def pk_of(c):
    s = ParticleSnapshot(x=c['x'], y=c['y'], z=c['z'], M=c['M'], L=L,
                         redshift=0.25, cosmo=cosmo_dict)
    grid = s.make_map(n_grid)
    delta = grid / grid.mean() - 1
    return power_spectrum_3d(jnp.asarray(delta), L, n_bins=24)

k, pk0, _ = pk_of(snap.cat)
_, pk1, _ = pk_of(new_cat)
k, pk0, pk1 = map(np.asarray, (k, pk0, pk1))

print("\n k [1/Mpc]   P_new/P_dmo - 1")
for i in range(0, 24, 3):
    if pk0[i] > 0:
        print(f"  {k[i]:7.3f}    {pk1[i] / pk0[i] - 1:+.4f}")
