"""Gradient inference through a COMPOSED map pipeline: baryonify a
projected-density grid, then paint a density-dependent (anisotropic)
observable on the baryonified map, and recover M_c by differentiating
through BOTH stages.

The chain (all device-resident, one reverse-mode pass):

    ln M_c
      -> displacement table (Baryonification2D.build_table_device)
      -> baryonified projected-density map
         (BaryonifyGrid.process_device on a flat-sky grid)
      -> density-dependent painting y(delta): the Canvas -> Paint
         monotone remap read out at the log of the BARYONIFIED map
         (PaintProfilesAnisGrid.process_device(canvas=...))
      -> chi^2 against the mock observable.

This is the composition the reference structurally cannot express: its
anis painter (`Map2DRunner.py:818-940`) is a per-halo scipy host loop
painting on a fixed numpy map — there is no derivative of the painted
observable w.r.t. the upstream baryonification, let alone w.r.t. the
displacement model's parameters. Here the painter's readout coordinate
is a traced function of the displacement table, so d(y map)/d(ln M_c)
prices the feedback strength directly from the density-dependent
observable.

Asserts (exit nonzero on regression):
  1. the gradient at the truth is ~0 relative to the perturbed start,
     and at the start it points back toward the truth;
  2. Adam recovers ln M_c to < 10% of the injected offset;
  3. the chi^2 drops by > 30x from the perturbed start.

Run: python examples/17_anis_paint_composition.py   (~3-5 min, CPU)
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

from baryonification_tpu import Cosmology, HaloNDCatalog, GriddedMap
from baryonification_tpu.displacement import Baryonification2D
from baryonification_tpu.profiles import (DarkMatter, DarkMatterOnly,
                                          DarkMatterBaryon, Gas)
from baryonification_tpu.runners import (BaryonifyGrid, PaintProfilesGrid,
                                         PaintProfilesAnisGrid)
from baryonification_tpu.tabulate import TabulatedProfile

COSMO = dict(Omega_m=0.3, Omega_b=0.05, h=0.7, sigma8=0.8, n_s=0.96,
             w0=-1.0)
PAR = dict(epsilon=4.0, theta_ej=4, theta_co=0.1, M_c=1e14, mu_beta=0.1,
           gamma=2.5, delta=7, mu_theta_ej=0.1, M_theta_ej=5e13,
           M_theta_co=5e13, M_gamma=5e13, M_delta=5e13, eta=0.3,
           eta_delta=0.1, tau=-1.5, tau_delta=0, A=0.055, M1=3e11,
           epsilon_h=0.015, a=0.3, n=2.0, p=0.3, q=0.707,
           cutoff=np.inf, proj_cutoff=1000)

LN_MC_TRUE = float(np.log(10 ** 13.8))
LN_MC_START = float(np.log(10 ** 14.4))   # 0.6 dex off

# small table grid: the fit rebuilds it every step
Z_RANGE = np.geomspace(0.1, 0.5, 3)
M_RANGE = np.geomspace(1e13, 1e15, 6)
R_RANGE = np.geomspace(1e-3, 70, 48)
TAB_KW = dict(z_min=Z_RANGE[0], z_max=Z_RANGE[-1],
              N_samples_z=len(Z_RANGE),
              M_min=M_RANGE[0], M_max=M_RANGE[-1],
              N_samples_Mass=len(M_RANGE),
              R_min=R_RANGE[0], R_max=R_RANGE[-1],
              N_samples_R=len(R_RANGE))


def main():
    cosmo = Cosmology.from_dict(COSMO)

    # ---- the scene: a flat-sky projected-density grid with painted
    # dark-matter halos (the anis painter's Canvas model) ----
    N, L = 48, 60.0
    bins = (np.arange(N) + 0.5) * (L / N)
    rng = np.random.default_rng(17)
    n_halo = 10
    cat = HaloNDCatalog(x=rng.uniform(6, 54, n_halo),
                        y=rng.uniform(6, 54, n_halo),
                        M=10 ** rng.uniform(13.8, 14.7, n_halo),
                        redshift=0.25, cosmo=COSMO)

    canvas_model = TabulatedProfile(DarkMatter(**PAR), cosmo)
    canvas_model.setup_interpolator(**TAB_KW)
    gm0 = GriddedMap(map=np.zeros((N, N)), redshift=0.25, bins=bins,
                     cosmo=COSMO)
    base = np.asarray(PaintProfilesGrid(cat, gm0, epsilon_max=5,
                                        model=canvas_model,
                                        verbose=False).process())
    gm = GriddedMap(map=base, redshift=0.25, bins=bins, cosmo=COSMO)
    assert (base > 0).sum() > 100, "scene painting failed"

    # ---- stage 1: baryonification of the density grid ----
    model0 = Baryonification2D(DarkMatterOnly(**PAR),
                               DarkMatterBaryon(**PAR), cosmo,
                               epsilon_max=10)
    model0.setup_interpolator(**TAB_KW)
    bary = BaryonifyGrid(cat, gm, epsilon_max=10, model=model0,
                         verbose=False)

    # ---- stage 2: the density-dependent observable, painted on the
    # (traced) baryonified map. The Canvas -> Paint remap is FIXED
    # (gas parameters held at truth); the fit's signal is purely how
    # feedback moves the density through the remap ----
    paint_model = TabulatedProfile(Gas(**PAR), cosmo)
    paint_model.setup_interpolator(**TAB_KW)
    anis = PaintProfilesAnisGrid(cat, gm, epsilon_max=5,
                                 Painting_model=paint_model,
                                 Canvas_model=canvas_model,
                                 method="cellmajor", verbose=False)
    remap = jax.lax.stop_gradient(anis.build_remap_device())

    def table_of(lnMc):
        par = dict(PAR)
        par['M_c'] = jnp.exp(lnMc)
        m = Baryonification2D(DarkMatterOnly(**par),
                              DarkMatterBaryon(**par), cosmo,
                              epsilon_max=10)
        t = m.build_table_device(Z_RANGE, M_RANGE, R_RANGE)
        return t.reshape(len(Z_RANGE), len(M_RANGE), len(R_RANGE))

    def y_map(lnMc):
        rho_b = bary.process_device(table=table_of(lnMc))
        return anis.process_device(remap=remap, canvas=rho_b)

    data = jax.lax.stop_gradient(y_map(jnp.asarray(LN_MC_TRUE)))
    assert bool(jnp.isfinite(data).all()) and float(
        (data > 0).sum()) > 50, "mock observable empty"
    scale = 1.0 / float(jnp.max(data)) ** 2

    def chi2(lnMc):
        return jnp.sum((y_map(lnMc) - data) ** 2) * scale * 1e6

    val_grad = jax.value_and_grad(chi2)

    # ---- assert 1: gradient geometry through BOTH stages ----
    _, g_true = val_grad(jnp.asarray(LN_MC_TRUE))
    c0, g_start = val_grad(jnp.asarray(LN_MC_START))
    print(f"grad at truth: {float(g_true):+.3e}   "
          f"grad at start: {float(g_start):+.3e}   "
          f"chi2 start: {float(c0):.4e}")
    assert abs(float(g_true)) < 0.05 * abs(float(g_start)), \
        "gradient at the truth should be ~0 relative to the start"
    assert float(g_start) * (LN_MC_START - LN_MC_TRUE) > 0, \
        "gradient at the start must point back toward the truth"

    # ---- assert 2+3: Adam recovers M_c through the composition ----
    from baryonification_tpu.inference import fit

    def progress(step, params, loss, grad):
        if step % 5 == 0 or step == 24:
            print(f"step {step:2d}: ln M_c = {float(params):.4f} "
                  f"(truth {LN_MC_TRUE:.4f})  chi2 = {loss:.4e}")

    res = fit(chi2, jnp.asarray(LN_MC_START), steps=25,
              learning_rate=0.15, callback=progress)
    c_final, lnMc_final = res.loss, float(res.params)
    err = abs(lnMc_final - LN_MC_TRUE)
    off0 = abs(LN_MC_START - LN_MC_TRUE)
    print(f"\nrecovered ln M_c = {lnMc_final:.4f}  "
          f"(truth {LN_MC_TRUE:.4f}; residual {err:.4f} = "
          f"{err / off0:.1%} of injected offset)")
    print(f"chi2: {float(c0):.4e} -> {c_final:.4e} "
          f"({float(c0) / max(c_final, 1e-300):.1f}x drop)")
    assert err < 0.10 * off0, "M_c not recovered through the composition"
    assert c_final < float(c0) / 30, "chi2 did not drop 30x"

    print("\nPASS: M_c recovered through baryonify -> y(delta) painting")


if __name__ == "__main__":
    main()
