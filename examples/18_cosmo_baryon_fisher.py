"""Joint cosmology + baryon inference: gradients and a Fisher forecast
w.r.t. (sigma8, ln M_c) THROUGH the full baryonification pipeline —
ASSERTED.

Round-5 capability demo: the cosmology layer itself is differentiable
(``cosmology_device``), so one reverse-mode pass prices a COSMOLOGICAL
parameter through

    sigma8 -> EH98 P(k) normalization -> sigma(M), xi_mm, growth
           -> profile quadratures + adiabatic relaxation
           -> displacement-table inversion (build_table_device)
           -> cell-major shell baryonification (process_device)
           -> chi^2 against a mock map

alongside the baryon parameter ln M_c. The reference's pyccl L0 layer is
C-level splines — no derivative of ANY cosmological parameter can flow
through it; grid-free Fisher forecasts like this one are structurally
unavailable there (`/root/reference/BaryonForge/Profiles/Schneider19.py:485-513`
consumes ccl splines; SURVEY.md section 7 step 1).

Asserts (exit nonzero on regression):
  1. autodiff d(chi^2)/d(sigma8) and d(chi^2)/d(ln M_c) at a perturbed
     point match central finite differences to 0.5%;
  2. both gradients at the truth are ~0 relative to the perturbed-point
     gradients (the truth is the minimum);
  3. the Laplace/Fisher covariance from ``jax.hessian`` through the FULL
     pipeline is finite and positive on the diagonal;
  4. the sigma8-M_c degeneracy is real: |corr| > 0.3 (both parameters
     deepen the same map-level suppression, so the likelihood carries a
     correlated valley).

Run: python examples/18_cosmo_baryon_fisher.py   (~10 min, CPU)
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
                                 LightconeShell, cosmology_device,
                                 default_params)
from baryonification_tpu.displacement import Baryonification2D
from baryonification_tpu.inference import laplace_covariance
from baryonification_tpu.profiles import DarkMatterOnly, DarkMatterBaryon
from baryonification_tpu.runners import BaryonifyShell
from baryonification_tpu.ops import healpix as hpx

COSMO = dict(Omega_m=0.3, Omega_b=0.05, h=0.7, sigma8=0.8, n_s=0.96,
             w0=-1.0)
PAR = default_params()

TRUTH = dict(sigma8=0.8, ln_Mc=float(np.log(10 ** 13.8)))
START = dict(sigma8=0.85, ln_Mc=float(np.log(10 ** 14.1)))

Z_RANGE = np.geomspace(0.1, 0.5, 2)
M_RANGE = np.geomspace(1e13, 1e15, 5)
R_RANGE = np.geomspace(1e-3, 70, 44)


def main():
    cosmo0 = Cosmology.from_dict(COSMO)

    nside = 16
    rng = np.random.default_rng(12)
    n_halo = 15
    cat = HaloLightConeCatalog(
        ra=rng.uniform(0, 360, n_halo),
        dec=np.degrees(np.arcsin(rng.uniform(-0.85, 0.85, n_halo))),
        M=10 ** rng.uniform(13.8, 14.9, n_halo),
        z=rng.uniform(0.15, 0.45, n_halo), cosmo=COSMO)
    shell = LightconeShell(map=rng.uniform(0.5, 1.5, hpx.npix(nside)),
                           cosmo=COSMO)

    # staged runner: geometry (registration/candidates) is frozen at the
    # fiducial cosmology; the gradient prices the displacement-TABLE
    # dependence — the physical channel (same contract as baryon fits)
    model0 = Baryonification2D(DarkMatterOnly(**PAR),
                               DarkMatterBaryon(**PAR), cosmo0,
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
        c = cosmology_device({**COSMO, "sigma8": p["sigma8"]})
        par = dict(PAR)
        par["M_c"] = jnp.exp(p["ln_Mc"])
        m = Baryonification2D(DarkMatterOnly(**par),
                              DarkMatterBaryon(**par), c, epsilon_max=20)
        t = m.build_table_device(Z_RANGE, M_RANGE, R_RANGE)
        return t.reshape(len(Z_RANGE), len(M_RANGE), len(R_RANGE))

    target = jax.lax.stop_gradient(runner.process_device(table_of(TRUTH)))

    def chi2(p):
        m = runner.process_device(table_of(p))
        return jnp.sum((m - target) ** 2) * 1e8

    # ---- assert 1: FD parity of BOTH gradients at the perturbed start ----
    g = jax.grad(chi2)({k: jnp.asarray(v) for k, v in START.items()})
    print("autodiff grad at start: "
          + "  ".join(f"d/d{k} = {float(g[k]):+.5e}" for k in g))
    for key, eps in (("sigma8", 2e-4), ("ln_Mc", 1e-3)):
        pp = dict(START); pp[key] = START[key] + eps
        pm = dict(START); pm[key] = START[key] - eps
        fd = (float(chi2(pp)) - float(chi2(pm))) / (2 * eps)
        ad = float(g[key])
        rel = abs(ad - fd) / abs(fd)
        print(f"  d/d{key}: fd = {fd:+.5e}  rel err = {rel:.2e}")
        assert rel < 5e-3, f"FD parity failed for {key}: {rel}"

    # ---- assert 2: the truth is stationary ----
    g0 = jax.grad(chi2)({k: jnp.asarray(v) for k, v in TRUTH.items()})
    for key in TRUTH:
        ratio = abs(float(g0[key])) / abs(float(g[key]))
        print(f"grad at truth / grad at start for {key}: {ratio:.3e}")
        assert ratio < 0.05, f"truth not stationary in {key}"

    # ---- asserts 3+4: Fisher forecast through the full pipeline ----
    cov, sigma = laplace_covariance(
        chi2, {k: jnp.asarray(v) for k, v in TRUTH.items()})
    # ravel_pytree orders keys alphabetically: (ln_Mc, sigma8)
    corr = cov[0, 1] / np.sqrt(cov[0, 0] * cov[1, 1])
    print(f"\nFisher forecast at the truth (map-level, {n_halo} halos):")
    print(f"  sigma(ln M_c)  = {float(sigma['ln_Mc']):.4f}")
    print(f"  sigma(sigma8)  = {float(sigma['sigma8']):.5f}")
    print(f"  corr(ln M_c, sigma8) = {corr:+.3f}")
    assert np.all(np.isfinite(cov)), "non-finite Fisher covariance"
    assert float(sigma["ln_Mc"]) > 0 and float(sigma["sigma8"]) > 0
    assert abs(corr) > 0.3, (
        f"expected a real sigma8-M_c degeneracy, got corr = {corr}")

    print("\nPASS: cosmology (sigma8) and baryon (M_c) parameters are "
          "jointly differentiable through table build + shell "
          "baryonification; FD parity 0.5%, stationary truth, finite "
          "Fisher covariance with a real degeneracy")


if __name__ == "__main__":
    main()
