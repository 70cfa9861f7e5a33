"""Asserted Arico+20 dP(k)/P(k) from snapshot baryonification (reference
examples/12_Reproduce_Arico_deltaPk.ipynb).

The reference runs the Arico20 family on TNG300-3-Dark with a 3D
displacement model built with ``Rdelta_sampling=True`` (the r/R_Delta
radial axis that resolves the model's sharp truncation features,
`BaryonCorrection.py:286-306`) and ``epsilon_max=2``, and eyeballs the
P(k) ratio. Here the same machinery runs on a DMO-sampled mock box (the
harness of examples/10) and the measured suppression is asserted against
the analytic per-catalog expectation -- by construction, displacing
DMO-distributed particles with d(r) produces the DMB profile, so
S(k) = 1 + sum_j [rho_hat_DMB^2 - rho_hat_DMO^2](k|M_j) / (rhobar^2 V
P_D(k)).

This validates the Arico-specific paths end-to-end: the hard-truncated
NFW DMO, the CollisionlessMatter/BoundGas/EjectedGas/ReaccretedGas DMB
composition, and the Rdelta-sampled displacement table + runner readout.

Run: python examples/12_arico_delta_pk_snapshot.py
"""

import importlib.util
import os
import sys
import time

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))  # repo root, for the package
if not os.environ.get("BENCH"):  # demos run on CPU
    import jax as _jax
    _jax.config.update("jax_platforms", "cpu")


def _load_ex10():
    spec = importlib.util.spec_from_file_location(
        "ex10", os.path.join(_HERE, "10_delta_pk_snapshot.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def arico_config():
    """Arico+20 parameter dict (reference notebook-12 values, h-scaled)."""
    from baryonification_tpu import Cosmology

    h = 0.7
    cosmo = Cosmology(Omega_m=0.3, Omega_b=0.05, h=h, sigma8=0.8,
                      n_s=0.96)
    apar = dict(alpha_g=2, epsilon_h=0.015, M1_0=2.2e11 / h, alpha_sat=1,
                M_c=1.2e14 / h, eta=0.6, mu=0.31, beta=0.6,
                epsilon_hydro=np.sqrt(5), M_inn=3.3e13 / h,
                M_r=1e30, beta_r=2, theta_inn=0.1, theta_out=1,
                theta_rg=0.3, sigma_rg=0.1, a=0.3, n=2, p=0.3, q=0.707,
                A_nt=0.495, alpha_nt=0.1, mean_molecular_weight=0.59)
    return cosmo, apar


def main():
    from baryonification_tpu.profiles import arico20 as A20

    ex10 = _load_ex10()
    cosmo, apar = arico_config()
    # Arico zeroes the TwoHalo term by default (`Arico20.py:875,890`),
    # so DMO/DMB are already the one-halo pair the mock box needs
    DMO = A20.DarkMatterOnly(**apar)
    DMB = A20.DarkMatterBaryon(**apar)

    print("Arico+20 snapshot pipeline on a DMO-sampled mock box "
          "(Rdelta-sampled table, epsilon_max=2)")
    t0 = time.time()
    k, S_meas, S_pred = ex10.box_crosscheck(
        model_pair=(DMO, DMB), cosmo=cosmo, epsilon_max=2,
        table_kwargs=dict(M_min=1e12, M_max=1e16, N_samples_Mass=16,
                          R_min=1e-3, R_max=30, N_samples_R=1500,
                          Rdelta_sampling=True),
        n_halo=40, L=100.0, n_grid=128, n_bins=36, seed=13,
        part_mass=4e10, M_range=(13.0, 14.5))

    win = (np.arange(len(k)) >= 6) & (k <= 1.2)
    diff = S_meas[win] - S_pred[win]
    rms = float(np.sqrt(np.mean(diff**2)))
    supp = 1 - S_meas[win].min()
    print(f"  window k = [{k[win].min():.2f}, {k[win].max():.2f}] 1/Mpc, "
          f"{win.sum()} bins, max suppression {100 * supp:.1f}%")
    print(f"  measured-vs-predicted RMS = {rms:.4f} (tol 0.050), "
          f"mean = {diff.mean():+.4f}   [{time.time() - t0:.0f}s]")

    failed = []
    if not rms < 0.050:
        failed.append("arico-box:rms")
    # Arico with these parameters ejects gas: suppression somewhere in
    # the window, recovering toward 1 at low k
    if not supp > 0.02:
        failed.append("arico-box:no-suppression")
    if failed:
        print(f"REGRESSION: {failed}")
        return 1
    print("Arico dP(k)/P(k) pipeline check within tolerance")
    return 0


if __name__ == '__main__':
    sys.exit(main())
