"""Asserted reproduction of Schneider+19 Fig. 2 (dP(k)/P(k) suppression).

The reference notebook (`examples/10_Reproduce_Schneider_deltaPk.ipynb`)
baryonifies the TNG300-3-Dark snapshot (2.4e8 particles, not shippable)
and overlays the measured P_B(k)/P_DMO(k) on curves scraped from the
published figure (S19_Fig2_Scrapped.csv), sweeping theta_ej, eta and M_c
— 15 curves, checked by eye. This script replaces the eyeball check with
two asserted comparisons:

A. Published-curve parity: the halo-model suppression prediction
   (`baryonification_tpu.analysis.pk_suppression`) vs ALL 15 scraped
   sweep curves, with the notebook-10 cosmology/parameters. Measured
   agreement: ~0.022 RMS absolute in the ratio across 936 points (the
   suppression signal is 10-25%), max ~0.07 at single scraped points.

B. Pipeline cross-check: the full snapshot machinery (displacement-table
   build -> BaryonifySnapshot -> gridded P(k) ratio) runs on a mock box
   whose halos are sampled from the DMO profile itself; the measured
   suppression must match the analytic per-catalog expectation
   S(k) = 1 + sum_j [rho_hat_DMB^2 - rho_hat_DMO^2](k|M_j) / (rhobar^2 V
   P_D(k)) — by construction, displacing DMO-distributed particles with
   d(r) produces the DMB profile.

Exits nonzero if either comparison regresses.

Run: python examples/10_delta_pk_snapshot.py
"""

import os
import sys
import time

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))  # repo root, for the package
if not os.environ.get("BENCH"):  # demos run on CPU
    import jax as _jax
    _jax.config.update("jax_platforms", "cpu")

# per-curve RMS tolerance (absolute, in the P_B/P_DMO ratio): ~1.5x the
# values measured at commit time (0.019-0.026)
FIG2_TOL = 0.035
FIG2_TOL_OVERALL = 0.030


def s19_fig2_config():
    """Notebook-10 cosmology, parameter dict, and the S19-beta gas class."""
    from baryonification_tpu import Cosmology
    from baryonification_tpu.profiles import Gas

    h = 0.6711
    cosmo = Cosmology(Omega_m=0.3175, Omega_b=0.049, h=h, sigma8=0.82,
                      n_s=0.9649)
    bpar = dict(theta_ej=4, theta_co=0.1,
                M_c=1e14 / h, mu_beta=0.4,
                eta=0.3, eta_delta=0.3,
                tau=-np.inf, tau_delta=0,  # -inf cancels one f_star term
                A=0.09 / 2, M1=2.5e11 / h,
                epsilon_h=0.015, a=0.3, n=2, epsilon=4, p=0.3, q=0.707,
                gamma=2, delta=7, proj_cutoff=205 / h / 2)

    class Gas_S19(Gas):
        """Schneider+19 beta(M) = 3 - (M_c/M)^mu, reverting the default
        Giri & Schneider form (reference notebook 10, cell 9)."""

        def _get_gas_params(self, M, z):
            beta, theta_ej, theta_co, delta, gamma = \
                super()._get_gas_params(M, z)
            beta = 3.0 - (self.M_c / M)[:, None] ** self.mu_beta
            return beta, theta_ej, theta_co, delta, gamma

    return cosmo, bpar, Gas_S19, h


def fig2_sweeps(bpar, h):
    """(scraped-column tag, parameter dict) for the 15 published curves."""
    sweeps = [(f'T{v}', dict(bpar, theta_ej=v)) for v in (2, 3, 4, 6, 8)]
    # eta sweep holds eta_cga = eta + eta_delta = 0.6 fixed (notebook
    # cell 18)
    sweeps += [(f'Ep{i + 1}', dict(bpar, eta=v, eta_delta=0.6 - v))
               for i, v in enumerate((0.1, 0.2, 0.3, 0.4, 0.5))]
    sweeps += [(tag, dict(bpar, M_c=v)) for tag, v in
               [('Mc2p5e13', 2.5e13 / h), ('Mc5e13', 5e13 / h),
                ('Mc1e14', 1e14 / h), ('Mc2e14', 2e14 / h),
                ('Mc4e14', 4e14 / h)]]
    return sweeps


def load_scraped_fig2(h, path=None):
    """Scraped S19 Fig 2 curves as {tag: (k [1/Mpc], P_B/P_DMO)}.

    The scraped x-axis is in h/Mpc (the notebook multiplies by h when
    overlaying, cells 16/19/22)."""
    if path is None:
        path = os.path.join(_HERE, 'data', 'S19_Fig2_Scrapped.csv')
    tags = [t.strip() for t in open(path).readline().split(',')[::2]]
    raw = np.genfromtxt(path, delimiter=',', skip_header=2)
    out = {}
    for i, tag in enumerate(tags):
        X, Y = raw[:, 2 * i], raw[:, 2 * i + 1]
        ok = np.isfinite(X) & np.isfinite(Y)
        out[tag] = (X[ok] * h, Y[ok])
    return out


def fig2_rms(tags=None):
    """RMS absolute deviation of the predicted suppression from each
    scraped curve. ``tags`` restricts to a subset (None = all 15)."""
    import jax
    from baryonification_tpu.analysis import pk_suppression
    from baryonification_tpu.profiles import (DarkMatter, DarkMatterBaryon,
                                              TwoHalo)

    cosmo, bpar, Gas_S19, h = s19_fig2_config()
    scraped = load_scraped_fig2(h)
    rms = {}
    with jax.default_device(jax.devices("cpu")[0]):
        for tag, par in fig2_sweeps(bpar, h):
            if tags is not None and tag not in tags:
                continue
            kk, SS = scraped[tag]
            dmo = DarkMatter(**par)
            dmb = (DarkMatterBaryon(**par, gas=Gas_S19(**par))
                   - TwoHalo(**par))
            S = np.asarray(pk_suppression(dmo, dmb, cosmo, kk,
                                          M_cut=10**12.8))
            rms[tag] = float(np.sqrt(np.mean((S - SS) ** 2)))
    return rms


def box_crosscheck(n_halo=40, L=100.0, n_grid=128, n_bins=36, seed=7,
                   part_mass=4e10, table_samples=(20, 500), verbose=True,
                   model_pair=None, cosmo=None, epsilon_max=20,
                   table_kwargs=None, M_range=(13.0, 14.5)):
    """Run the real snapshot pipeline on a DMO-sampled mock box.

    Returns (k, S_measured, S_predicted) over the box's k bins. The
    comparison window should exclude the first few bins (mode-starved)
    and k above ~0.6 k_Nyquist (NGP gridding).

    ``model_pair`` = (DMO_profile, DMB_profile) lets other profile
    families reuse the harness (examples/12 runs it with Arico20 and an
    Rdelta-sampled table); default is the S19 Fig-2 pair with TwoHalo
    zeroed (the sampled particles follow the one-halo profile, so the
    table must invert the same pair — Arico zeroes TwoHalo by default).
    """
    import jax
    import jax.numpy as jnp
    from baryonification_tpu import (HaloNDCatalog, ParticleSnapshot,
                                     BaryonifySnapshot)
    from baryonification_tpu.analysis import profile_uk
    from baryonification_tpu.displacement import Baryonification3D
    from baryonification_tpu.ops.spectra import power_spectrum_3d
    from baryonification_tpu.profiles import (DarkMatterOnly,
                                              DarkMatterBaryon, TwoHalo)

    if model_pair is None:
        cosmo, bpar, Gas_S19, h = s19_fig2_config()
        zero2h = TwoHalo(**bpar) * 0
        DMO = DarkMatterOnly(**bpar, twohalo=zero2h)
        DMB = DarkMatterBaryon(**bpar, twohalo=zero2h,
                               gas=Gas_S19(**bpar))
    else:
        DMO, DMB = model_pair
        assert cosmo is not None, "pass cosmo with model_pair"
    cd = dict(cosmo.cosmodict)

    t0 = time.time()
    disp = Baryonification3D(DMO, DMB, cosmo, epsilon_max=epsilon_max)
    tkw = dict(z_min=0.0, z_max=0.01, N_samples_z=2,
               z_linear_sampling=True, M_min=1e12, M_max=1e16,
               N_samples_Mass=table_samples[0],
               R_min=1e-4, R_max=300, N_samples_R=table_samples[1])
    tkw.update(table_kwargs or {})
    disp.setup_interpolator(**tkw)
    if verbose:
        print(f"  displacement table: {time.time() - t0:.1f}s")

    # sample particles from the DMO enclosed-mass CDF around each halo
    rng = np.random.default_rng(seed)
    hx = rng.uniform(0, L, (n_halo, 3))
    hM = 10 ** rng.uniform(M_range[0], M_range[1], n_halo)
    r_s = np.geomspace(1e-3, 60, 2048)
    with jax.default_device(jax.devices("cpu")[0]):
        rho_all = np.clip(np.asarray(DMO.real(cosmo, r_s, hM, 1.0)), 0,
                          None)
    parts, mass = [], []
    for j in range(n_halo):
        Menc = np.cumsum(4 * np.pi * r_s**3 * rho_all[j]
                         * np.gradient(np.log(r_s)))
        n_p = max(2000, int(hM[j] / part_mass))
        rr = np.interp(rng.uniform(0, 1, n_p), Menc / Menc[-1], r_s)
        dirs = rng.normal(size=(n_p, 3))
        dirs /= np.linalg.norm(dirs, axis=1)[:, None]
        parts.append(np.mod(hx[j] + rr[:, None] * dirs, L))
        mass.append(np.full(n_p, Menc[-1] / n_p))
    xyz = np.concatenate(parts)
    pm = np.concatenate(mass)
    if verbose:
        print(f"  mock box: {len(xyz):,} particles, {n_halo} halos")

    snap = ParticleSnapshot(x=xyz[:, 0], y=xyz[:, 1], z=xyz[:, 2], M=pm,
                            L=L, redshift=0.0, cosmo=cd)
    cat = HaloNDCatalog(x=hx[:, 0], y=hx[:, 1], z=hx[:, 2], M=hM,
                        redshift=0.0, cosmo=cd)
    t0 = time.time()
    # the CDF-level comparison needs the f64 displacement path: pin to
    # the host CPU backend (a mock this small gains nothing from TPU)
    with jax.default_device(jax.devices("cpu")[0]):
        new_cat = BaryonifySnapshot(cat, snap, epsilon_max=epsilon_max,
                                    model=disp,
                                    precision="float64").process()
    if verbose:
        print(f"  BaryonifySnapshot: {time.time() - t0:.1f}s")

    def pk_of(c):
        s = ParticleSnapshot(x=np.asarray(c['x']), y=np.asarray(c['y']),
                             z=np.asarray(c['z']), M=np.asarray(c['M']),
                             L=L, redshift=0.0, cosmo=cd)
        grid = s.make_map(n_grid)
        delta = grid / grid.mean() - 1
        return power_spectrum_3d(jnp.asarray(delta), L, n_bins=n_bins)

    with jax.default_device(jax.devices("cpu")[0]):
        k, pk0, _ = pk_of(snap.cat)
        _, pk1, _ = pk_of(new_cat)
    k, pk0, pk1 = map(np.asarray, (k, pk0, pk1))
    S_meas = pk1 / pk0

    with jax.default_device(jax.devices("cpu")[0]):
        uD = np.asarray(profile_uk(DMO, cosmo, hM, 1.0, k))
        uB = np.asarray(profile_uk(DMB, cosmo, hM, 1.0, k))
    rho_bar = pm.sum() / L**3
    S_pred = 1 + (uB**2 - uD**2).sum(axis=0) / (rho_bar**2 * L**3) / pk0
    return k, S_meas, S_pred


def main():
    failed = []

    # --- Part A: published-curve parity ---
    print("Part A: halo-model dP(k)/P(k) vs Schneider+19 Fig 2 "
          "(15 scraped curves)")
    t0 = time.time()
    rms = fig2_rms()
    worst = max(rms, key=rms.get)
    overall = float(np.sqrt(np.mean([v**2 for v in rms.values()])))
    for tag, v in rms.items():
        status = "ok" if v < FIG2_TOL else "FAIL"
        if status == "FAIL":
            failed.append(f"fig2:{tag}")
        print(f"  {tag:9s}: RMS = {v:.4f}  (tol {FIG2_TOL})  {status}")
    print(f"  overall RMS = {overall:.4f} (tol {FIG2_TOL_OVERALL}), "
          f"worst = {worst} ({rms[worst]:.4f})  [{time.time() - t0:.0f}s]")
    if overall >= FIG2_TOL_OVERALL:
        failed.append("fig2:overall")

    # --- Part B: end-to-end pipeline cross-check ---
    # Window and tolerance: the first few bins are mode-starved (few
    # Fourier modes, ~40 Poisson halos); beyond k ~ 1.2 the per-catalog
    # realization scatter of the few-halo box (halo-interference noise in
    # the bin average, halo-overlap displacement cross-talk) grows to
    # +-0.05-0.1 with catalog-dependent sign. Inside k = [~0.45, 1.2] the
    # measured and predicted ratios agree to ~0.03 RMS on a 10-25%
    # suppression signal — that validates the table build, the runner
    # displacement, and the P(k) measurement end-to-end.
    print("\nPart B: snapshot pipeline on a DMO-sampled mock box")
    k, S_meas, S_pred = box_crosscheck()
    win = (np.arange(len(k)) >= 6) & (k <= 1.2)
    diff = S_meas[win] - S_pred[win]
    rms_b = float(np.sqrt(np.mean(diff**2)))
    supp = 1 - S_meas[win].min()
    print(f"  window k = [{k[win].min():.2f}, {k[win].max():.2f}] 1/Mpc, "
          f"{win.sum()} bins, max suppression {100 * supp:.1f}%")
    print(f"  measured-vs-predicted RMS = {rms_b:.4f} "
          f"(tol 0.050), mean = {diff.mean():+.4f}")
    if not rms_b < 0.050:
        failed.append("box:rms")
    if not supp > 0.10:
        failed.append("box:no-suppression")

    if failed:
        print(f"\nREGRESSION: {failed}")
        return 1
    print("\nall dP(k)/P(k) checks within tolerance")
    return 0


if __name__ == '__main__':
    sys.exit(main())
