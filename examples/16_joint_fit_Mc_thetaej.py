"""Joint gradient fit of (M_c, theta_ej) + Laplace degeneracy analysis.

One reverse-mode pass through the full differentiable pipeline (table
build -> cell-major shell baryonification -> conservative regrid,
`BaryonCorrection.py:136-321` / `HealpixRunner.py:223-349` semantics)
prices BOTH baryon parameters simultaneously — and `jax.hessian`
through the same chain quantifies their covariance. The reference's
scipy/numba pipeline can express neither: fitting there is per-
parameter finite differencing, and curvature is out of reach entirely.

The physics makes this a stringent demo: at map level M_c (which halos
eject) and theta_ej (how far the ejected gas goes) are strongly
degenerate. The asserted outcomes are chosen to reflect that honestly:

  1. chi^2 drops > 100x from the perturbed start (measured ~1500x);
  2. the well-constrained parameter recovers: ln theta_ej to < 25% of
     its injected offset (measured ~8%);
  3. the Laplace covariance *flags the degeneracy*: corr(lnMc, lntej)
     < -0.5 (measured -0.94), and every parameter's residual is within
     3 Laplace sigma (the near-flat lnMc direction has sigma ~ 8, so
     its larger residual is exactly what the curvature predicts).

Run: python examples/16_joint_fit_Mc_thetaej.py   (~15-20 min, CPU)
"""

import os
import sys

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))  # repo root, for the package
if not os.environ.get("BENCH"):  # demos run on CPU
    import jax as _jax
    _jax.config.update("jax_platforms", "cpu")

import jax
import jax.numpy as jnp

from baryonification_tpu import (Cosmology, HaloLightConeCatalog,
                                 LightconeShell)
from baryonification_tpu.displacement import Baryonification2D
from baryonification_tpu.profiles import DarkMatterOnly, DarkMatterBaryon
from baryonification_tpu.runners import BaryonifyShell
from baryonification_tpu.ops import healpix as hpx
from baryonification_tpu.inference import fit, laplace_covariance

COSMO = dict(Omega_m=0.3, Omega_b=0.05, h=0.7, sigma8=0.8, n_s=0.96,
             w0=-1.0)
PAR = dict(epsilon=4.0, theta_ej=4, theta_co=0.1, M_c=1e14, mu_beta=0.1,
           gamma=2.5, delta=7, mu_theta_ej=0.1, M_theta_ej=5e13,
           M_theta_co=5e13, M_gamma=5e13, M_delta=5e13, eta=0.3,
           eta_delta=0.1, tau=-1.5, tau_delta=0, A=0.055, M1=3e11,
           epsilon_h=0.015, a=0.3, n=2.0, p=0.3, q=0.707,
           cutoff=np.inf, proj_cutoff=1000)

TRUTH = {"lnMc": float(np.log(10 ** 13.8)),
         "ln_tej": float(np.log(4.0))}
START = {"lnMc": float(np.log(10 ** 14.3)),    # 0.5 dex high
         "ln_tej": float(np.log(6.0))}          # 50% high

Z_RANGE = np.geomspace(0.1, 0.5, 3)
M_RANGE = np.geomspace(1e13, 1e15, 6)
R_RANGE = np.geomspace(1e-3, 70, 48)


def main():
    cosmo = Cosmology.from_dict(COSMO)

    # ---- mock observation (same geometry as example 14) ----
    nside = 32
    rng = np.random.default_rng(7)
    n_halo = 30
    cat = HaloLightConeCatalog(
        ra=rng.uniform(0, 360, n_halo),
        dec=np.degrees(np.arcsin(rng.uniform(-0.85, 0.85, n_halo))),
        M=10 ** rng.uniform(13.8, 14.9, n_halo),
        z=rng.uniform(0.15, 0.45, n_halo), cosmo=COSMO)
    shell = LightconeShell(map=rng.uniform(0.5, 1.5, hpx.npix(nside)),
                           cosmo=COSMO)

    model0 = Baryonification2D(DarkMatterOnly(**PAR),
                               DarkMatterBaryon(**PAR), cosmo,
                               epsilon_max=20)
    model0.setup_interpolator(z_min=Z_RANGE[0], z_max=Z_RANGE[-1],
                              N_samples_z=len(Z_RANGE),
                              M_min=M_RANGE[0], M_max=M_RANGE[-1],
                              N_samples_Mass=len(M_RANGE),
                              R_min=R_RANGE[0], R_max=R_RANGE[-1],
                              N_samples_R=len(R_RANGE))
    runner = BaryonifyShell(cat, shell, epsilon_max=20, model=model0,
                            method="cellmajor", verbose=False)

    def table_of(p):
        par = dict(PAR)
        par['M_c'] = jnp.exp(p["lnMc"])
        par['theta_ej'] = jnp.exp(p["ln_tej"])
        m = Baryonification2D(DarkMatterOnly(**par),
                              DarkMatterBaryon(**par), cosmo,
                              epsilon_max=20)
        t = m.build_table_device(Z_RANGE, M_RANGE, R_RANGE)
        return t.reshape(len(Z_RANGE), len(M_RANGE), len(R_RANGE))

    target = jax.lax.stop_gradient(runner.process_device(table_of(TRUTH)))

    def chi2(p):
        m = runner.process_device(table_of(p))
        return jnp.sum((m - target) ** 2) * 1e6

    def progress(step, params, loss, grad):
        if step % 5 == 0 or step == 39:
            print(f"step {step:2d}: ln M_c = {float(params['lnMc']):.3f} "
                  f"(truth {TRUTH['lnMc']:.3f})  ln theta_ej = "
                  f"{float(params['ln_tej']):.3f} "
                  f"(truth {TRUTH['ln_tej']:.3f})  chi2 = {loss:.3e}",
                  flush=True)

    res = fit(chi2, {k: jnp.asarray(v) for k, v in START.items()},
              steps=40, learning_rate=0.12, callback=progress)

    c0, c_fin = res.history[0], res.loss
    print(f"\nchi2: {c0:.3e} -> {c_fin:.3e} ({c0 / c_fin:.0f}x drop)")
    assert c_fin < c0 / 100, "chi2 did not drop 100x"

    err_tej = abs(float(res.params["ln_tej"]) - TRUTH["ln_tej"])
    off_tej = abs(START["ln_tej"] - TRUTH["ln_tej"])
    print(f"ln theta_ej residual {err_tej:.3f} "
          f"({err_tej / off_tej:.1%} of injected offset)")
    assert err_tej < 0.25 * off_tej, "theta_ej not recovered"

    # ---- Laplace curvature through the same pipeline ----
    cov, sigma = laplace_covariance(chi2, res.params)
    # ravel order is the pytree's sorted-key order: lnMc, ln_tej
    corr = float(cov[0, 1] / np.sqrt(cov[0, 0] * cov[1, 1]))
    sig = {k: float(np.asarray(v)) for k, v in sigma.items()}
    print(f"Laplace: sigma(ln M_c) = {sig['lnMc']:.2f}, "
          f"sigma(ln theta_ej) = {sig['ln_tej']:.2f}, "
          f"corr = {corr:+.3f}")
    assert corr < -0.5, "M_c-theta_ej degeneracy not flagged"
    for k in TRUTH:
        resid = abs(float(res.params[k]) - TRUTH[k])
        assert resid < 3.0 * sig[k], (
            f"{k}: residual {resid:.3f} outside 3 sigma ({sig[k]:.3f})")
        print(f"  {k}: residual {resid:.3f} vs 3 sigma "
              f"{3 * sig[k]:.3f}  ok")

    print("\nPASS: joint (M_c, theta_ej) fit — the constrained "
          "parameter recovered, the degenerate direction correctly "
          "priced by the pipeline Hessian")


if __name__ == "__main__":
    main()
