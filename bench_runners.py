"""Secondary runner benchmarks: grid/snapshot cell-major vs the
halo-major formulations, on the real TPU (NOT the driver's headline
bench — that is bench.py).

Usage:  python bench_runners.py snap   # particle snapshot displacement
        python bench_runners.py grid   # 3D grid baryonify
Scales via NHALO / NPART / NGRID env vars. One TPU process at a time.

Measured (v5e, L=500 Mpc):
  snap (2e6 particles, 3e4 halos):
    cellmajor steady 2.04 s   gather steady 24.9 s    (12.2x)
  snap (5e6 particles, 1e5 halos):
    cellmajor steady 6.83 s   gather CRASHES the worker (memory)
  snap (1e7 particles, 2e5 halos):
    cellmajor steady 27.6 s   gather CRASHES the worker (memory)
  grid (256^3 voxels, 5e4 halos):
    cellmajor steady 11.4 s   scatter steady 49.7 s   (4.4x)
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import numpy as np
import jax
import jax.numpy as jnp

from baryonification_tpu import Cosmology, HaloNDCatalog, GriddedMap, ParticleSnapshot
from baryonification_tpu.displacement import Baryonification3D
from baryonification_tpu.profiles import DarkMatterOnly, DarkMatterBaryon
from baryonification_tpu.runners import BaryonifyGrid, BaryonifySnapshot

COSMO = dict(Omega_m=0.3, Omega_b=0.05, h=0.7, sigma8=0.8, n_s=0.96, w0=-1.0)
PAR = dict(epsilon=4.0, theta_ej=4, theta_co=0.1, M_c=1e14, mu_beta=0.1,
           gamma=2.5, delta=7, mu_theta_ej=0.1, M_theta_ej=5e13,
           M_theta_co=5e13, M_gamma=5e13, M_delta=5e13, eta=0.3,
           eta_delta=0.1, tau=-1.5, tau_delta=0, A=0.055, M1=3e11,
           epsilon_h=0.015, a=0.3, n=2.0, p=0.3, q=0.707,
           cutoff=np.inf, proj_cutoff=1000)

which = sys.argv[1] if len(sys.argv) > 1 else "grid"
cosmo = Cosmology.from_dict(COSMO)
cache = ".bench_table3d.npz"
model = Baryonification3D(DarkMatterOnly(**PAR), DarkMatterBaryon(**PAR),
                          cosmo, epsilon_max=15)
if os.path.exists(cache):
    model.load_table(cache)
else:
    t0 = time.time()
    model.setup_interpolator(z_min=0.05, z_max=1.0, N_samples_z=8,
                             M_min=1e12, M_max=1e16, N_samples_Mass=24,
                             R_min=1e-3, R_max=1e2, N_samples_R=100)
    print(f"# table: {time.time()-t0:.0f}s", file=sys.stderr)
    model.save_table(cache)

rng = np.random.default_rng(3)
L = 500.0
n_halo = int(os.environ.get("NHALO", 100_000))
u = rng.uniform(0, 1, n_halo)
M = 1e13 * (1 - u * (1 - (10 ** 15.0 / 1e13) ** (-0.8))) ** (-1 / 0.8)
hx, hy, hz = (rng.uniform(0, L, n_halo) for _ in range(3))
cat = HaloNDCatalog(x=hx, y=hy, z=hz, M=M, redshift=0.25, cosmo=COSMO)

def run(runner, tag):
    t0 = time.time()
    runner.process()
    warm = time.time() - t0
    ts = []
    for _ in range(2):
        t0 = time.time()
        runner.process()
        ts.append(time.time() - t0)
    print(f"{tag}: warm {warm:.1f}s steady {min(ts):.2f}s")

if which == "grid":
    N = int(os.environ.get("NGRID", 256))
    bins = (np.arange(N) + 0.5) * (L / N)
    gm = GriddedMap(map=rng.uniform(0.5, 1.5, (N, N, N)).astype(np.float64),
                    redshift=0.25, bins=bins, cosmo=COSMO)
    for method in ("cellmajor", "scatter"):
        run(BaryonifyGrid(cat, gm, epsilon_max=15, model=model,
                          method=method, verbose=False), f"grid/{method}")
else:
    n_part = int(os.environ.get("NPART", 5_000_000))
    snap = ParticleSnapshot(x=rng.uniform(0, L, n_part),
                            y=rng.uniform(0, L, n_part),
                            z=rng.uniform(0, L, n_part),
                            M=np.ones(n_part), L=L, redshift=0.25,
                            cosmo=COSMO)
    for method in ("cellmajor", "gather"):
        run(BaryonifySnapshot(cat, snap, epsilon_max=15, model=model,
                              method=method, verbose=False),
            f"snap/{method}")
