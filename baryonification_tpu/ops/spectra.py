"""Summary statistics on device: 3D power spectra and HEALPix C_ell.

Replaces the reference's notebook-side diagnostics:
- P(k): numba histogram + np.fft + bincount radial average with
  box-folding for high k (`examples/10_Reproduce_Schneider_deltaPk.ipynb`
  cells 12/18) -> jnp.fft.rfftn + segment-sum radial binning.
- C_ell: healpy.anafast (`examples/09_Reproduce_Schneider_deltaCls.ipynb`)
  -> a direct spherical-harmonic transform over iso-latitude rings with
  overflow-safe normalized-Legendre recurrences.

The SHT is exact (quadrature at pixel centers, like anafast without
iterative refinement); its cost is O(lmax^2 * nring) via an m-scan, fine
for diagnostic NSIDEs. A ring-FFT + Pallas pipeline is the planned
optimization for production NSIDE=1024 spectra.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from . import healpix as hpx

__all__ = ["power_spectrum_3d", "power_spectrum_2d", "anafast"]


def power_spectrum_3d(delta, L, n_bins=None, subtract_shot=0.0):
    """Isotropic P(k) of a 3D field in a periodic box of size L.

    delta : (N, N, N) real field (e.g. rho/rho_mean - 1)
    Returns (k_centers, P(k), counts). Units: k in 1/L-units, P in L^3.
    """
    delta = jnp.asarray(delta)
    N = delta.shape[0]
    if n_bins is None:
        n_bins = N // 2

    fk = jnp.fft.rfftn(delta) * (L / N) ** 3
    pk3 = jnp.abs(fk) ** 2 / L**3

    kf = 2 * jnp.pi / L
    kx = jnp.fft.fftfreq(N, d=1.0 / N) * kf
    kz = jnp.fft.rfftfreq(N, d=1.0 / N) * kf
    kmag = jnp.sqrt(kx[:, None, None] ** 2 + kx[None, :, None] ** 2
                    + kz[None, None, :] ** 2)

    # rfft double-count weights (all kz!=0,Nyq planes appear once but
    # represent two conjugate modes)
    w = jnp.ones_like(pk3)
    w = w.at[:, :, 1:].set(2.0)
    if N % 2 == 0:
        w = w.at[:, :, -1].set(1.0)

    k_edges = jnp.linspace(kf * 0.5, kf * (n_bins + 0.5), n_bins + 1)
    idx = jnp.clip(jnp.searchsorted(k_edges, kmag.reshape(-1)) - 1,
                   0, n_bins - 1)
    inb = ((kmag.reshape(-1) >= k_edges[0])
           & (kmag.reshape(-1) < k_edges[-1]))
    wf = jnp.where(inb, w.reshape(-1), 0.0)

    counts = jnp.zeros(n_bins).at[idx].add(wf)
    psum = jnp.zeros(n_bins).at[idx].add(wf * pk3.reshape(-1))
    ksum = jnp.zeros(n_bins).at[idx].add(wf * kmag.reshape(-1))

    pk = jnp.where(counts > 0, psum / jnp.maximum(counts, 1), 0.0)
    kc = jnp.where(counts > 0, ksum / jnp.maximum(counts, 1), 0.0)
    return kc, pk - subtract_shot, counts


def power_spectrum_2d(delta, L, n_bins=None):
    """Isotropic P(k) of a 2D periodic field (flat-sky maps)."""
    delta = jnp.asarray(delta)
    N = delta.shape[0]
    if n_bins is None:
        n_bins = N // 2

    fk = jnp.fft.rfftn(delta) * (L / N) ** 2
    pk2 = jnp.abs(fk) ** 2 / L**2

    kf = 2 * jnp.pi / L
    kx = jnp.fft.fftfreq(N, d=1.0 / N) * kf
    ky = jnp.fft.rfftfreq(N, d=1.0 / N) * kf
    kmag = jnp.sqrt(kx[:, None] ** 2 + ky[None, :] ** 2)

    w = jnp.ones_like(pk2)
    w = w.at[:, 1:].set(2.0)
    if N % 2 == 0:
        w = w.at[:, -1].set(1.0)

    k_edges = jnp.linspace(kf * 0.5, kf * (n_bins + 0.5), n_bins + 1)
    idx = jnp.clip(jnp.searchsorted(k_edges, kmag.reshape(-1)) - 1,
                   0, n_bins - 1)
    inb = ((kmag.reshape(-1) >= k_edges[0])
           & (kmag.reshape(-1) < k_edges[-1]))
    wf = jnp.where(inb, w.reshape(-1), 0.0)

    counts = jnp.zeros(n_bins).at[idx].add(wf)
    psum = jnp.zeros(n_bins).at[idx].add(wf * pk2.reshape(-1))
    ksum = jnp.zeros(n_bins).at[idx].add(wf * kmag.reshape(-1))
    pk = jnp.where(counts > 0, psum / jnp.maximum(counts, 1), 0.0)
    kc = jnp.where(counts > 0, ksum / jnp.maximum(counts, 1), 0.0)
    return kc, pk, counts


@partial(jax.jit, static_argnames=("nside", "lmax"))
def anafast(hmap, nside, lmax):
    """Angular power spectrum C_ell of a RING-ordered HEALPix map.

    Direct SHT: per-ring Fourier sums G_m(ring) then a normalized-Legendre
    ell-recurrence per m, accumulated into C_ell. Matches healpy.anafast
    (without pixel-window deconvolution or iterative quadrature).
    """
    hmap = jnp.asarray(hmap, dtype=jnp.float64)
    nring = 4 * nside - 1
    rings = jnp.arange(1, 4 * nside)
    z, start, npr, shift = hpx.ring_info(nside, rings)
    theta = jnp.arccos(jnp.clip(z, -1, 1))
    dOmega = 4 * jnp.pi / hpx.npix(nside)

    # pack rings into a padded (nring, 4*nside) matrix
    max_npr = 4 * nside
    j = jnp.arange(max_npr)
    pix = start[:, None] + jnp.minimum(j[None, :], npr[:, None] - 1)
    vals = hmap[pix]
    valid = j[None, :] < npr[:, None]
    vals = jnp.where(valid, vals, 0.0)
    phi = (j[None, :] + shift[:, None]) * (2 * jnp.pi / npr[:, None])

    x = z                      # cos(theta) per ring
    sx = jnp.sqrt(jnp.maximum(1.0 - x * x, 0.0))

    ell = jnp.arange(lmax + 1)

    def per_m(m, cl_acc):
        # ring Fourier coefficient G_m(r) = sum_j f e^{-i m phi}
        phase = jnp.exp(-1j * m * phi)
        G = jnp.sum(vals * jnp.where(valid, phase, 0.0), axis=-1) * dOmega

        # normalized associated Legendre lambda_lm(x): sectoral seed in
        # log space (overflow-safe), then the standard upward recurrence
        # lambda_l = a_l (x lambda_{l-1} - lambda_{l-2}/a_{l-1}),
        # a_l = sqrt((4l^2-1)/(l^2-m^2)).
        k = jnp.arange(1, lmax + 1)
        logdd = jnp.cumsum(jnp.where(k <= m,
                                     jnp.log((2 * k - 1.0) / (2 * k)), 0.0))
        log_pref = 0.5 * (jnp.log((2 * m + 1) / (4 * jnp.pi))
                          + jnp.where(m > 0, logdd[jnp.maximum(m - 1, 0)],
                                      0.0))
        sign = 1.0 - 2.0 * (m % 2)
        lam_mm = jnp.where(
            sx > 0,
            sign * jnp.exp(log_pref
                           + m * jnp.log(jnp.maximum(sx, 1e-300))),
            jnp.where(m == 0, jnp.exp(log_pref), 0.0))
        lam_m1 = x * jnp.sqrt(2.0 * m + 3.0) * lam_mm

        def ell_step(carry, l):
            p2, p1 = carry      # lambda at l-2, l-1
            al = jnp.sqrt((4.0 * l * l - 1.0)
                          / jnp.maximum(l * l - m * m, 1e-30))
            al1 = jnp.sqrt((4.0 * (l - 1) ** 2 - 1.0)
                           / jnp.maximum((l - 1) ** 2 - m * m, 1e-30))
            lam_rec = al * (x * p1 - p2 / al1)
            lam_l = jnp.where(l < m, 0.0,
                              jnp.where(l == m, lam_mm,
                                        jnp.where(l == m + 1, lam_m1,
                                                  lam_rec)))
            alm = jnp.sum(G * lam_l)          # quadrature over rings
            return (p1, lam_l), jnp.abs(alm) ** 2

        _, alm2 = jax.lax.scan(ell_step,
                               (jnp.zeros_like(x), jnp.zeros_like(x)), ell)
        mult = jnp.where(m == 0, 1.0, 2.0)
        return cl_acc + mult * alm2

    cl = jax.lax.fori_loop(0, lmax + 1,
                           lambda m, acc: per_m(m, acc),
                           jnp.zeros(lmax + 1))
    return cl / (2.0 * ell + 1.0)
