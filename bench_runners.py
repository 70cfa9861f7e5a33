"""Secondary runner benchmarks: every runner family x {baryonify, paint}
on the real TPU (NOT the driver's headline bench — that is bench.py).

Usage:  python bench_runners.py snap     # particle snapshot displacement
        python bench_runners.py grid     # 3D grid baryonify
        python bench_runners.py grid2d   # flat-sky 2D map baryonify+paint
        python bench_runners.py paint    # NSIDE=1024 tSZ shell painting
        python bench_runners.py cls      # NSIDE=1024 anafast C_ell
        python bench_runners.py synth    # NSIDE=1024 alm2map synthesis
Scales via NHALO / NPART / NGRID / NSIDE env vars. One TPU process at a
time.

Measured numbers live in BENCH_RUNNERS.json (schema: per-surface
warm_s / steady_s / device_compute_s) — `python bench_runners.py all`
re-measures every row in one sweep; each single mode merges its rows
into the JSON in place. README "Performance" renders that JSON's table.
Two baselines have no JSON row because they crash or dwarf the budget:
  snap gather at >= 5e6 particles CRASHES the worker (memory) — the
    2e6/3e4 gather row (24.9 s steady vs cellmajor) is the comparison;
  anis 'scatter' is the reference's per-halo host loop: through the
    remote tunnel per-halo projected() readouts are device round trips
    (2000 halos exceed a 25-min budget); run on the CPU host, its
    native regime, it measures 348 ms/halo (200 halos, linear in
    n_halo), i.e. ~19 h for the 2e5-halo cellmajor workload.
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import numpy as np
import jax
import jax.numpy as jnp

from baryonification_tpu import (Cosmology, HaloNDCatalog, GriddedMap,
                                 ParticleSnapshot, HaloLightConeCatalog,
                                 LightconeShell, ConvolvedProfile,
                                 HealPixel, TabulatedProfile)
from baryonification_tpu.displacement import (Baryonification2D,
                                              Baryonification3D)
from baryonification_tpu.profiles import (DarkMatterOnly, DarkMatterBaryon,
                                          ThermalSZ)
from baryonification_tpu.runners import (BaryonifyGrid, BaryonifySnapshot,
                                         PaintProfilesGrid,
                                         PaintProfilesShell)
from baryonification_tpu.ops import healpix as hpx

COSMO = dict(Omega_m=0.3, Omega_b=0.05, h=0.7, sigma8=0.8, n_s=0.96, w0=-1.0)
PAR = dict(epsilon=4.0, theta_ej=4, theta_co=0.1, M_c=1e14, mu_beta=0.1,
           gamma=2.5, delta=7, mu_theta_ej=0.1, M_theta_ej=5e13,
           M_theta_co=5e13, M_gamma=5e13, M_delta=5e13, eta=0.3,
           eta_delta=0.1, tau=-1.5, tau_delta=0, A=0.055, M1=3e11,
           epsilon_h=0.015, a=0.3, n=2.0, p=0.3, q=0.707,
           cutoff=np.inf, proj_cutoff=1000)

which = sys.argv[1] if len(sys.argv) > 1 else "grid"
cosmo = Cosmology.from_dict(COSMO)
rng = np.random.default_rng(3)


def power_law_masses(n, Mlo=1e13, Mhi=1e15, slope=-0.8):
    u = rng.uniform(0, 1, n)
    return Mlo * (1 - u * (1 - (Mhi / Mlo) ** slope)) ** (1 / slope)


def disp_model(cls, cache):
    model = cls(DarkMatterOnly(**PAR), DarkMatterBaryon(**PAR), cosmo,
                epsilon_max=15)
    if os.path.exists(cache):
        model.load_table(cache)
    else:
        t0 = time.time()
        model.setup_interpolator(z_min=0.05, z_max=1.0, N_samples_z=8,
                                 M_min=1e12, M_max=1e16,
                                 N_samples_Mass=24, R_min=1e-3, R_max=1e2,
                                 N_samples_R=100)
        print(f"# table: {time.time()-t0:.0f}s", file=sys.stderr)
        model.save_table(cache)
    return model


def disp_model_3d():
    return disp_model(Baryonification3D, ".bench_table3d.npz")


def disp_model_2d():
    return disp_model(Baryonification2D, ".bench_table2d_flat.npz")


def tsz_model(nside):
    """Pixel-convolved ThermalSZ TabulatedProfile (cached npz — the
    reference's flagship painting model, examples/05 cell 12)."""
    cache = f".bench_tsz_{nside}.npz"
    tab = TabulatedProfile(ConvolvedProfile(ThermalSZ(**PAR),
                                            HealPixel(NSIDE=nside)), cosmo)
    if os.path.exists(cache):
        d = np.load(cache)
        tab._grids = tuple(jnp.asarray(d[k]) for k in
                           ("g0", "g1", "g2"))
        tab._ln3D = jnp.asarray(d["ln3D"])
        tab._ln2D = jnp.asarray(d["ln2D"])
    else:
        t0 = time.time()
        tab.setup_interpolator(z_min=0.05, z_max=1.0, N_samples_z=8,
                               M_min=1e12, M_max=1e16, N_samples_Mass=24,
                               R_min=1e-3, R_max=1e2, N_samples_R=100)
        print(f"# tSZ table: {time.time()-t0:.0f}s", file=sys.stderr)
        np.savez(cache, g0=np.asarray(tab._grids[0]),
                 g1=np.asarray(tab._grids[1]),
                 g2=np.asarray(tab._grids[2]),
                 ln3D=np.asarray(tab._ln3D), ln2D=np.asarray(tab._ln2D))
    return tab


def _sync(out):
    """Device sync: block_until_ready is not a barrier on axon, so force a
    host reduction. Snapshot runners return a numpy structured array
    (fields M/x/y/z), which has no .sum() ufunc loop — sum a field."""
    arr = np.asarray(out)
    if arr.dtype.names:
        arr = arr[arr.dtype.names[-1]]
    return float(np.sum(arr))


def _sync_dev(out):
    """Sync a process_device() result with a SCALAR host round-trip only
    (no full-map fetch): times taken this way are device compute, the
    same attribution bench.py's device_compute_s uses. Snapshot device
    cores return an (x, y, z) tuple of device arrays."""
    if isinstance(out, tuple):
        return sum(float(jnp.sum(o)) for o in out)
    return float(jnp.sum(out))


RESULTS = {}


def run(runner, tag, n_steady=2):
    """End-to-end steady time (includes the host fetch of the result) and,
    where the runner has a differentiable device core (the cell-major
    formulations), the DEVICE-COMPUTE time: the same pipeline synced with
    a scalar reduction instead of a full-map host transfer — the number
    to compare across machines, since the fetch is pure tunnel bandwidth
    (round-5 VERDICT directive 2)."""
    t0 = time.time()
    _ = _sync(runner.process())
    warm = time.time() - t0
    ts = []
    for _i in range(n_steady):
        t0 = time.time()
        _ = _sync(runner.process())
        ts.append(time.time() - t0)
    dev = None
    if (getattr(runner, "method", None) in ("cellmajor", "auto")
            and hasattr(runner, "process_device")):
        try:
            _ = _sync_dev(runner.process_device())   # compile/stage
            ds = []
            for _i in range(n_steady):
                t0 = time.time()
                _ = _sync_dev(runner.process_device())
                ds.append(time.time() - t0)
            dev = min(ds)
        except Exception as e:                        # pragma: no cover
            print(f"# {tag}: device-compute attribution failed: {e}",
                  file=sys.stderr)
    extra = f" device_compute {dev:.2f}s" if dev is not None else ""
    print(f"{tag}: warm {warm:.1f}s steady {min(ts):.2f}s{extra}",
          flush=True)
    RESULTS[tag] = dict(warm_s=round(warm, 2), steady_s=round(min(ts), 3),
                        device_compute_s=(None if dev is None
                                          else round(dev, 3)))


def _methods_env(default):
    env = os.environ.get("METHODS")
    return tuple(env.split(",")) if env else default


def bench_grid(methods=None, n_halo=None):
    methods = methods or _methods_env(("cellmajor", "scatter"))
    L = 500.0
    n_halo = n_halo or int(os.environ.get("NHALO", 100_000))
    cat = HaloNDCatalog(x=rng.uniform(0, L, n_halo),
                        y=rng.uniform(0, L, n_halo),
                        z=rng.uniform(0, L, n_halo),
                        M=power_law_masses(n_halo), redshift=0.25,
                        cosmo=COSMO)
    model = disp_model_3d()
    N = int(os.environ.get("NGRID", 256))
    bins = (np.arange(N) + 0.5) * (L / N)
    gm = GriddedMap(map=rng.uniform(0.5, 1.5, (N, N, N)).astype(np.float64),
                    redshift=0.25, bins=bins, cosmo=COSMO)
    for method in methods:
        run(BaryonifyGrid(cat, gm, epsilon_max=15, model=model,
                          method=method, verbose=False),
            f"grid/{method}[{N}^3,{n_halo}]")


def bench_snap(methods=None, n_halo=None, n_part=None):
    methods = methods or _methods_env(("cellmajor", "gather"))
    L = 500.0
    n_halo = n_halo or int(os.environ.get("NHALO", 100_000))
    cat = HaloNDCatalog(x=rng.uniform(0, L, n_halo),
                        y=rng.uniform(0, L, n_halo),
                        z=rng.uniform(0, L, n_halo),
                        M=power_law_masses(n_halo), redshift=0.25,
                        cosmo=COSMO)
    model = disp_model_3d()
    n_part = n_part or int(os.environ.get("NPART", 5_000_000))
    snap = ParticleSnapshot(x=rng.uniform(0, L, n_part),
                            y=rng.uniform(0, L, n_part),
                            z=rng.uniform(0, L, n_part),
                            M=np.ones(n_part), L=L, redshift=0.25,
                            cosmo=COSMO)
    for method in methods:
        run(BaryonifySnapshot(cat, snap, epsilon_max=15, model=model,
                              method=method, verbose=False),
            f"snap/{method}[{n_part},{n_halo}]")


def bench_paint(methods=None):
    methods = methods or _methods_env(("cellmajor", "scatter"))
    # the reference's flagship painting use-case: full-sky NSIDE=1024
    # Compton-y map (HealpixRunner.py:366-447, examples/05 cell 12)
    nside = int(os.environ.get("NSIDE", 1024))
    n_halo = int(os.environ.get("NHALO", 1_000_000))
    tab = tsz_model(nside)
    cat = HaloLightConeCatalog(
        ra=rng.uniform(0, 360, n_halo),
        dec=np.degrees(np.arcsin(rng.uniform(-1, 1, n_halo))),
        M=power_law_masses(n_halo), z=rng.uniform(0.1, 0.9, n_halo),
        cosmo=COSMO)
    shell = LightconeShell(map=np.zeros(hpx.npix(nside)), cosmo=COSMO)
    for method in methods:
        run(PaintProfilesShell(cat, shell, epsilon_max=5, model=tab,
                               method=method, verbose=False),
            f"paint/{method}[nside{nside},{n_halo}]")


def bench_grid2d(methods=None):
    # map-level 2D branch (Map2DRunner.py:425-615, Anbajagane+24)
    L = 1000.0
    N = int(os.environ.get("NGRID", 2048))
    n_halo = int(os.environ.get("NHALO", 200_000))
    cat = HaloNDCatalog(x=rng.uniform(0, L, n_halo),
                        y=rng.uniform(0, L, n_halo),
                        M=power_law_masses(n_halo), redshift=0.25,
                        cosmo=COSMO)
    bins = (np.arange(N) + 0.5) * (L / N)
    gm = GriddedMap(map=rng.uniform(0.5, 1.5, (N, N)).astype(np.float64),
                    redshift=0.25, bins=bins, cosmo=COSMO)
    model = disp_model_2d()
    methods = methods or os.environ.get("METHODS",
                                        "cellmajor,scatter").split(",")
    for method in methods:
        run(BaryonifyGrid(cat, gm, epsilon_max=15, model=model,
                          method=method, verbose=False),
            f"grid2d/baryonify/{method}[{N}^2,{n_halo}]")
    tab = tsz_model(32)   # flat-sky: pixel window n/a; reuse tSZ table
    for method in methods:
        run(PaintProfilesGrid(cat, gm, epsilon_max=5, model=tab,
                              method=method, verbose=False),
            f"grid2d/paint/{method}[{N}^2,{n_halo}]")


def bench_anis(scatter=True):
    # density-dependent painting (Map2DRunner.py:818-940): tSZ painted
    # as a function of the existing density canvas. cellmajor = the
    # block-major remap pass; scatter = the reference host loop (slow:
    # NHALO_SCATTER caps its halo count; its time scales linearly)
    from baryonification_tpu.runners import PaintProfilesAnisGrid
    from baryonification_tpu.profiles import DarkMatter
    L = 1000.0
    N = int(os.environ.get("NGRID", 2048))
    n_halo = int(os.environ.get("NHALO", 200_000))
    cat = HaloNDCatalog(x=rng.uniform(0, L, n_halo),
                        y=rng.uniform(0, L, n_halo),
                        M=power_law_masses(n_halo), redshift=0.25,
                        cosmo=COSMO)
    bins = (np.arange(N) + 0.5) * (L / N)
    paint = tsz_model(32)
    canvas = TabulatedProfile(DarkMatter(**PAR), cosmo)
    cache = ".bench_anis_canvas.npz"
    if os.path.exists(cache):
        d = np.load(cache)
        canvas._grids = tuple(jnp.asarray(d[k]) for k in ("g0", "g1", "g2"))
        canvas._ln3D = jnp.asarray(d["ln3D"])
        canvas._ln2D = jnp.asarray(d["ln2D"])
    else:
        canvas.setup_interpolator(z_min=0.05, z_max=1.0, N_samples_z=8,
                                  M_min=1e12, M_max=1e16,
                                  N_samples_Mass=24, R_min=1e-3,
                                  R_max=1e2, N_samples_R=100)
        np.savez(cache, g0=np.asarray(canvas._grids[0]),
                 g1=np.asarray(canvas._grids[1]),
                 g2=np.asarray(canvas._grids[2]),
                 ln3D=np.asarray(canvas._ln3D),
                 ln2D=np.asarray(canvas._ln2D))
    # canvas map: DM surface-density-like values inside the remap range
    gm = GriddedMap(map=10 ** rng.uniform(12.0, 14.5, (N, N)),
                    redshift=0.25, bins=bins, cosmo=COSMO)
    run(PaintProfilesAnisGrid(cat, gm, epsilon_max=5,
                              Painting_model=paint, Canvas_model=canvas,
                              method="cellmajor", verbose=False),
        f"anis/paint/cellmajor[{N}^2,{n_halo}]")
    if not scatter:
        return
    n_sc = int(os.environ.get("NHALO_SCATTER", 2000))
    cat_sc = HaloNDCatalog(x=np.asarray(cat.cat['x'][:n_sc]),
                           y=np.asarray(cat.cat['y'][:n_sc]),
                           M=np.asarray(cat.cat['M'][:n_sc]),
                           redshift=0.25, cosmo=COSMO)
    run(PaintProfilesAnisGrid(cat_sc, gm, epsilon_max=5,
                              Painting_model=paint, Canvas_model=canvas,
                              method="scatter", verbose=False),
        f"anis/paint/scatter[{n_sc} halos]", n_steady=1)


def bench_cls():
    # the reference's example-09 diagnostic at production resolution:
    # healpy.anafast of an NSIDE=1024 map (ring-FFT SHT, f32 on TPU).
    # steady_s is end-to-end from a HOST map (includes the tunnel upload
    # of the 50 MB f32 map every call); device_compute_s re-times with
    # the map already device-resident (the C_ell fetch is lmax+1 floats,
    # negligible) — the same upload/fetch separation bench.py applies to
    # the headline metric.
    import jax
    import jax.numpy as jnp
    from baryonification_tpu.ops.spectra import anafast
    nside = int(os.environ.get("NSIDE", 1024))
    lmax = int(os.environ.get("LMAX", 2 * nside))
    m = rng.normal(size=12 * nside * nside).astype(np.float32)
    t0 = time.time()
    cl = np.asarray(anafast(m, nside, lmax))
    _ = float(cl.sum())
    warm = time.time() - t0
    ts = []
    for _i in range(3):
        t0 = time.time()
        cl = np.asarray(anafast(m, nside, lmax))
        _ = float(cl.sum())
        ts.append(time.time() - t0)
    m_dev = jax.device_put(jnp.asarray(m))
    _ = float(jnp.sum(m_dev))          # sync the upload out of the loop
    td = []
    for _i in range(3):
        t0 = time.time()
        cl = np.asarray(anafast(m_dev, nside, lmax))
        _ = float(cl.sum())
        td.append(time.time() - t0)
    flat = float(np.mean(cl[4:lmax // 2]) / (4 * np.pi / m.size))
    tag = f"cls/nside{nside}/lmax{lmax}"
    print(f"{tag}: warm {warm:.1f}s steady {min(ts):.2f}s "
          f"device {min(td):.2f}s  white-noise flatness {flat:.4f}",
          flush=True)
    RESULTS[tag] = dict(warm_s=round(warm, 2), steady_s=round(min(ts), 3),
                        device_compute_s=round(min(td), 3),
                        flatness=round(flat, 5))


def bench_synth():
    # synthesis direction (healpy.alm2map analog) — the Gaussian-mock /
    # smoothing workhorse. steady_s is end-to-end from host alm arrays
    # (tunnel upload of 2 (lmax+1)^2 f32 triangles + fetch of the
    # 12*nside^2 map); device_compute_s re-times with device-resident
    # alm and a scalar-sum sync, leaving the map on-chip the way
    # synfast -> paint pipelines consume it.
    from baryonification_tpu.ops.spectra import alm2map
    nside = int(os.environ.get("NSIDE", 1024))
    lmax = int(os.environ.get("LMAX", 2 * nside))
    L = lmax + 1
    tri = np.tril(np.ones((L, L), np.float32))
    ar = (rng.normal(size=(L, L)) * tri).astype(np.float32)
    ai = (rng.normal(size=(L, L)) * tri
          * (np.arange(L)[None, :] > 0)).astype(np.float32)
    t0 = time.time()
    m = np.asarray(alm2map(ar, ai, nside, lmax))
    _ = float(m.sum())
    warm = time.time() - t0
    ts = []
    for _i in range(3):
        t0 = time.time()
        m = np.asarray(alm2map(ar, ai, nside, lmax))
        _ = float(m.sum())
        ts.append(time.time() - t0)
    ar_d, ai_d = jax.device_put(jnp.asarray(ar)), jax.device_put(jnp.asarray(ai))
    _ = float(jnp.sum(ar_d) + jnp.sum(ai_d))   # sync uploads out of the loop
    td = []
    for _i in range(3):
        t0 = time.time()
        md = alm2map(ar_d, ai_d, nside, lmax)
        _ = float(jnp.sum(md))
        td.append(time.time() - t0)
    # unit-normal alm (re AND im for m>0) => E C_l = (1+4l)/(2l+1), so
    # map variance ~ sum_l (1+4l) / 4pi = (2L^2 - L) / 4pi; record the
    # ratio as the sanity metric (analog of the cls flatness)
    expect = (2.0 * L * L - L) / (4 * np.pi)
    varr = float(np.var(m) / expect)
    tag = f"synth/nside{nside}/lmax{lmax}"
    print(f"{tag}: warm {warm:.1f}s steady {min(ts):.2f}s "
          f"device {min(td):.2f}s  variance ratio {varr:.4f}", flush=True)
    RESULTS[tag] = dict(warm_s=round(warm, 2), steady_s=round(min(ts), 3),
                        device_compute_s=round(min(td), 3),
                        var_ratio=round(varr, 5))


if which == "grid":
    bench_grid()

elif which == "snap":
    bench_snap()

elif which == "paint":
    bench_paint()

elif which == "grid2d":
    bench_grid2d()

elif which == "anis":
    bench_anis()

elif which == "cls":
    bench_cls()

elif which == "synth":
    bench_synth()

elif which == "all":
    # one sweep over every CELL-MAJOR surface in the README performance
    # table, emitting BENCH_RUNNERS.json so the secondary numbers are
    # driver-reproducible, not hand-pasted (round-5 VERDICT directive 7).
    # The halo-major baselines are one-time comparative numbers (some
    # crash the worker by design); they keep their dedicated modes.
    import json
    t_all = time.time()
    bench_snap(methods=("cellmajor",), n_halo=30_000, n_part=2_000_000)
    bench_snap(methods=("cellmajor",), n_halo=100_000, n_part=5_000_000)
    bench_grid(methods=("cellmajor",), n_halo=50_000)
    bench_paint(methods=("cellmajor",))
    bench_grid2d(methods=["cellmajor"])
    bench_anis(scatter=False)
    bench_cls()
    bench_synth()
    out = dict(generated_by="bench_runners.py all",
               total_sweep_s=round(time.time() - t_all, 1),
               surfaces=RESULTS)
    with open("BENCH_RUNNERS.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))

else:
    sys.exit(f"unknown mode {which!r}")

if which != "all" and RESULTS and os.path.exists("BENCH_RUNNERS.json"):
    # single-mode runs refresh their rows in the sweep JSON in place, so
    # a re-measured surface doesn't require the full ~40 min 'all' sweep
    import json
    with open("BENCH_RUNNERS.json") as f:
        out = json.load(f)
    out["surfaces"].update(RESULTS)
    with open("BENCH_RUNNERS.json", "w") as f:
        json.dump(out, f, indent=1)
    print(f"merged {sorted(RESULTS)} into BENCH_RUNNERS.json", flush=True)
