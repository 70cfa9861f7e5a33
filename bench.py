"""Headline benchmark: full-sky NSIDE=1024 shell baryonify with 1e6 halos.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

The project metric (BASELINE.json): seconds per NSIDE=1024 shell baryonify
(1e6 halos); north-star <10 s. vs_baseline = 10.0 / measured_seconds (the
reference publishes no timings — `BASELINE.md`).

Displacement-table construction (one-time, host-side fp64 — the same
amortized setup the reference performs via setup_interpolator) is excluded
from the timed region, mirroring how the reference's runtime is reported.
"""

import json
import os
import sys
import time

# persistent compile cache: the per-shape kernel compiles dominate cold
# starts (especially through remote-compile TPU tunnels)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import numpy as np


def main():
    nside = int(os.environ.get("BENCH_NSIDE", 1024))
    n_halo = int(os.environ.get("BENCH_NHALO", 1_000_000))
    eps_max = float(os.environ.get("BENCH_EPS_MAX", 20.0))
    # BENCH_PROPS=1: sweep a per-halo theta_ej column through an extra
    # displacement-table axis (the ParamTabulatedProfile contract,
    # reference HealpixRunner.py:284-287,321) — measures the cell-major
    # props fast path vs the plain (z, M) headline
    props = os.environ.get("BENCH_PROPS", "") not in ("", "0")

    import jax
    import jax.numpy as jnp

    from baryonification_tpu import (Cosmology, HaloLightConeCatalog,
                                     LightconeShell)
    from baryonification_tpu.displacement import Baryonification2D
    from baryonification_tpu.profiles import DarkMatterOnly, DarkMatterBaryon
    from baryonification_tpu.runners import BaryonifyShell
    from baryonification_tpu.ops import healpix as hpx

    cosmo_dict = dict(Omega_m=0.3, Omega_b=0.05, h=0.7, sigma8=0.8,
                      n_s=0.96, w0=-1.0)
    cosmo = Cosmology.from_dict(cosmo_dict)

    par = dict(epsilon=4.0, theta_ej=4, theta_co=0.1, M_c=1e14, mu_beta=0.1,
               gamma=2.5, delta=7, mu_theta_ej=0.1, M_theta_ej=5e13,
               M_theta_co=5e13, M_gamma=5e13, M_delta=5e13, eta=0.3,
               eta_delta=0.1, tau=-1.5, tau_delta=0, A=0.055, M1=3e11,
               epsilon_h=0.015, a=0.3, n=2.0, p=0.3, q=0.707,
               cutoff=np.inf, proj_cutoff=1000)

    # ---- displacement table (one-time setup, cached on disk) ----
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".bench_table_props.npz" if props
                         else ".bench_table.npz")
    model = Baryonification2D(DarkMatterOnly(**par), DarkMatterBaryon(**par),
                              cosmo, epsilon_max=eps_max)
    other = ({"theta_ej": np.linspace(2.0, 8.0, 4)} if props else {})
    if os.path.exists(cache):
        model.load_table(cache)
    else:
        t0 = time.time()
        model.setup_interpolator(z_min=0.05, z_max=1.2, N_samples_z=12,
                                 M_min=1e12, M_max=1e16, N_samples_Mass=24,
                                 R_min=1e-3, R_max=1e2, N_samples_R=100,
                                 other_params=other)
        print(f"# table build: {time.time() - t0:.1f}s", file=sys.stderr)
        model.save_table(cache)

    # ---- synthetic catalog + shell ----
    rng = np.random.default_rng(7)
    ra = rng.uniform(0, 360, n_halo)
    dec = np.degrees(np.arcsin(rng.uniform(-1, 1, n_halo)))
    # power-law mass function in [10^13, 10^15.3]
    u = rng.uniform(0, 1, n_halo)
    M = 1e13 * (1 - u * (1 - (10 ** 15.3 / 1e13) ** (-0.8))) ** (-1 / 0.8)
    z = rng.uniform(0.1, 0.9, n_halo)
    extra = ({"theta_ej": rng.uniform(2.5, 7.5, n_halo)} if props else {})
    cat = HaloLightConeCatalog(ra=ra, dec=dec, M=M, z=z, cosmo=cosmo_dict,
                               **extra)
    shell = LightconeShell(map=rng.uniform(0.5, 1.5, hpx.npix(nside)),
                           cosmo=cosmo_dict)

    runner = BaryonifyShell(cat, shell, epsilon_max=eps_max, model=model,
                            verbose=False)
    if nside >= 2048:
        # holding every bucket's dense candidates on device exceeds HBM
        # at 50M+ pixels; recompute them per call instead
        runner.low_memory = True
    profile = os.environ.get("BENCH_PROFILE", "") not in ("", "0")
    if profile:
        # per-stage wall times with a device sync after each stage
        # (serializes the async pipeline: attribution, not the headline)
        runner.profile = True

    def dump_stages(tag):
        if not profile:
            return
        for label, dt_s in runner.stage_times:
            print(f"#   {tag} {label}: {dt_s:.2f}s", file=sys.stderr)
        runner.stage_times = []

    def collect_stages():
        """One profiled run (device syncs between stages) whose per-stage
        wall times go into the JSON record: separates device compute
        (passes/regrid) from tunnel transport (fetch) so the driver
        record is attributable (VERDICT r2 item 8)."""
        runner.profile = True
        runner.stage_times = []
        t0 = time.time()
        runner.process()
        total = time.time() - t0
        stages = {}
        for label, dt_s in runner.stage_times:
            key = label.split('[')[0]       # fold per-bucket labels
            stages[key] = round(stages.get(key, 0.0) + dt_s, 3)
        runner.stage_times = []
        runner.profile = profile
        stages["profiled_total"] = round(total, 3)
        return stages

    # device/tunnel establishment: the first device op of a process pays
    # backend init + (on remote-TPU tunnels) connection setup, which has
    # been measured anywhere from ~1 s to 400+ s under congestion —
    # report it separately so the compute warm-up is attributable
    t0 = time.time()
    float(jnp.sum(jnp.ones((8,), dtype=jnp.float32)))
    device_init_s = time.time() - t0
    print(f"# device init (tunnel establishment): {device_init_s:.1f}s",
          file=sys.stderr)

    # warm-up (compile)
    t0 = time.time()
    runner.process()
    warmup_s = time.time() - t0
    print(f"# warm-up (incl. compile): {warmup_s:.1f}s", file=sys.stderr)
    dump_stages("warm")

    # timed steady-state runs (min over repeats: the host<->device tunnel
    # adds +/- 1-2 s of transfer jitter per run)
    n_runs = int(os.environ.get("BENCH_NRUNS", 5))
    times = []
    for i in range(n_runs):
        t0 = time.time()
        new_map = runner.process()
        times.append(time.time() - t0)
        dump_stages(f"steady{i}")
    dt = min(times)
    print(f"# steady runs: {['%.2f' % t for t in times]}", file=sys.stderr)

    # stage attribution for the record (profiled run, syncs serialize
    # the pipeline — its total exceeds the unprofiled headline)
    stages = collect_stages()
    for label, dt_s in stages.items():
        print(f"#   stage {label}: {dt_s:.2f}s", file=sys.stderr)

    assert np.isclose(new_map.sum(), shell.map.sum(), rtol=1e-5)
    print(json.dumps({
        "metric": (f"nside{nside}_shell_baryonify_{n_halo}halos"
                   + ("_props" if props else "")),
        "value": round(dt, 3),
        "unit": "s",
        "vs_baseline": round(10.0 / dt, 3),
        "n_runs": n_runs,
        # device compute alone (pass + regrid, synced) — the steady value
        # additionally carries the 50 MB host fetch, which is pure remote-
        # tunnel bandwidth (~0 on a local TPU host) and swings 2-6 s with
        # tunnel congestion
        "device_compute_s": round(stages.get("pass", 0.0)
                                  + stages.get("regrid", 0.0), 3),
        "steady_runs_s": [round(t, 3) for t in times],
        "warmup_s": round(warmup_s, 1),
        "device_init_s": round(device_init_s, 1),
        "stages_s": stages,
    }))


if __name__ == "__main__":
    main()
