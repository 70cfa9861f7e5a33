"""Summary statistics on device: 3D power spectra and HEALPix C_ell.

Replaces the reference's notebook-side diagnostics:
- P(k): numba histogram + np.fft + bincount radial average with
  box-folding for high k (`examples/10_Reproduce_Schneider_deltaPk.ipynb`
  cells 12/18) -> jnp.fft.rfftn + segment-sum radial binning.
- C_ell: healpy.anafast (`examples/09_Reproduce_Schneider_deltaCls.ipynb`)
  -> a ring-FFT spherical-harmonic transform (production path, exact
  quadrature at pixel centers like anafast without iterative
  refinement), in two stages:

  1. per-ring Fourier coefficients G_m(ring), belt/cap split (see
     ``_ring_analysis``): the equatorial belt — 2*nside+1 contiguous
     rings of exactly 4*nside pixels — is a reshape + one batched
     power-of-two rfft; the polar caps have a different pixel count
     per ring (4i), where a plain batched FFT cannot produce the
     native-length DFTs — Bluestein re-expresses each length-n DFT as
     one convolution of chirped sequences, which embeds in a SINGLE
     power-of-two FFT length shared by all cap rings. Exact for every
     ring size, three batched FFTs total. Frequencies above a ring's
     Nyquist alias as m mod npr (a slice for belt rings at
     lmax <= 2*nside; gathered once in the caps).
  2. one Legendre-recurrence scan over ell, vectorized across the full
     (m, ring) plane, with a libsharp-style SCALED representation
     (lambda = p * FOLD^-sc, rescaled as it grows): high-m sectoral
     seeds underflow any float near the poles but the true lambda_lm
     recovers to O(1) past the turning point — the scale counter keeps
     those contributions, which plain floats silently zero.

  The old O(lmax^2 * nring * npr) per-m phase-matrix transform is kept
  as ``anafast_direct`` (a cross-check oracle for tests); the scan
  stage here is the irreducible O(lmax^2 * nring) of any standard SHT
  but runs as fused full-plane VPU work, making NSIDE=1024 / lmax=3072
  spectra practical on one chip.
"""

from contextlib import contextmanager, nullcontext
from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import healpix as hpx


def _cdiv(a, b):
    return -(-a // b)


def _use_pallas(dt):
    """The Legendre-recurrence Pallas kernel runs on the accelerator f32
    path only (Mosaic has no f64; CPU keeps the lax.scan, where XLA's
    loop fusion is already adequate and tests want f64 anchors)."""
    return dt == jnp.dtype("float32") and jax.default_backend() != "cpu"

__all__ = ["power_spectrum_3d", "power_spectrum_2d", "anafast",
           "anafast_direct", "map2alm", "alm2map", "alm2cl", "synalm",
           "synfast", "gauss_beam", "smoothing"]


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
def anafast_direct(hmap, nside, lmax):
    """Angular power spectrum C_ell of a RING-ordered HEALPix map —
    the O(lmax^2) per-m phase-matrix formulation.

    Direct SHT: per-ring Fourier sums G_m(ring) then a normalized-Legendre
    ell-recurrence per m, accumulated into C_ell. Matches healpy.anafast
    (without pixel-window deconvolution or iterative quadrature).
    Diagnostic-NSIDE oracle for :func:`anafast` (the ring-FFT
    production path); kept because its per-m structure is independent
    of the batched Bluestein + scaled-recurrence machinery.
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


def _ring_dfts(vals, npr, M, sign=-1):
    """Native-length DFT of every padded ring row via batched Bluestein.

    vals : (nring, maxn) real or complex ring samples, zero beyond npr[r]
    npr  : (nring,) int32 ring lengths (all <= maxn)
    M    : static convolution length, power of two >= 2 * maxn
    sign : -1 (analysis) or +1 (synthesis) exponent sign

    Returns complex D[r, k] = sum_j vals[r, j] e^{sign 2 pi i j k / npr[r]}
    for k < npr[r] (zero beyond). Bluestein: with chirp
    w_j = e^{-sign i pi j^2 / n}, D[k] = conj(w_k) * (a (*) b)[k] where
    a_j = f_j conj(w_j) and b_j = w_j for |j| < n — ONE circular
    convolution of length M, shared by every ring regardless of its n.
    Chirp phases use j^2 mod 2n (exact in int32: e^{-i pi (2n t)/n} = 1),
    so single precision stays accurate at j ~ 4 * nside.
    """
    nring, maxn = vals.shape
    dt = jnp.real(vals).dtype
    n = npr[:, None].astype(jnp.int32)
    j = jnp.arange(maxn, dtype=jnp.int32)[None, :]
    jsq = (j * j) % (2 * n)
    theta = dt.type(-sign) * (jnp.pi * jsq.astype(dt)) / n.astype(dt)
    w = jnp.exp(1j * theta)                       # (nring, maxn)
    a = jnp.where(j < n, vals, 0.0) * jnp.conj(w)
    A = jnp.fft.fft(a, n=M, axis=1)

    jj = jnp.arange(M, dtype=jnp.int32)[None, :]
    s = jnp.minimum(jj, M - jj)                   # wrapped |offset|
    ssq = (s * s) % (2 * n)
    b = jnp.where(s < n,
                  jnp.exp(1j * dt.type(-sign)
                          * (jnp.pi * ssq.astype(dt)) / n.astype(dt)),
                  0.0)
    conv = jnp.fft.ifft(A * jnp.fft.fft(b, axis=1), axis=1)[:, :maxn]
    D = jnp.conj(w) * conv
    return jnp.where(j < n, D, 0.0)


def _ring_analysis(hmap, nside, lmax, M, start_d, npr_d):
    """Native-length ring DFT coefficients D[m, r] = D_r[m mod npr_r]
    for every ring of a RING-ordered map, split by HEALPix ring family
    (the reference reaches these through healpy/libsharp,
    `BaryonForge/Runners/HealpixRunner.py` + example 09 notebooks —
    this is the TPU formulation):

    - the equatorial BELT (rings nside..3*nside, 2*nside+1 of them) is
      contiguous in RING pixel order and every ring has exactly
      4*nside pixels: packing is a reshape (no gather), the DFT one
      batched power-of-two rfft (no Bluestein chirp convolution), and
      for lmax <= 2*nside the alias readout D_r[m mod n] is a plain
      slice of the rfft output (conjugate-alias column gather above).
    - the polar CAPS (2*(nside-1) rings of 4i pixels each) keep the
      padded gather + batched-Bluestein path of :func:`_ring_dfts`, at
      half the row count and 4*(nside-1) columns instead of 4*nside.

    At NSIDE=2048 this halves the pack gather (67M -> 34M elements),
    halves the Bluestein FFT rows, and removes the 34M-element alias
    ``take_along_axis`` — the three analysis-only costs that made
    anafast slower than alm2map at equal (nside, lmax).

    Returns complex (lmax+1, nring) in full north-to-south ring order.
    """
    dt = hmap.dtype
    L = lmax + 1
    nc = nside - 1                       # rings per polar cap
    nb = 2 * nside + 1                   # belt rings
    nbf = 4 * nside                      # belt ring length
    belt0 = 2 * nside * (nside - 1)      # first belt pixel (RING order)

    belt = hmap[belt0:belt0 + nb * nbf].reshape(nb, nbf)
    R = jnp.fft.rfft(belt, axis=1)                    # (nb, 2*nside+1)
    if lmax <= 2 * nside:
        Dgb = R[:, :L]
    else:
        k = np.arange(L) % nbf
        k2 = np.minimum(k, nbf - k)
        Dgb = jnp.where((k <= nbf // 2)[None, :],
                        R[:, k2], jnp.conj(R[:, k2]))
    if nc == 0:
        return Dgb.T

    maxn_cap = 4 * nc
    startc = jnp.concatenate([start_d[:nc], start_d[3 * nside:]])
    nprc = jnp.concatenate([npr_d[:nc],
                            npr_d[3 * nside:]]).astype(jnp.int32)
    jc = jnp.arange(maxn_cap)
    pixc = startc[:, None] + jnp.minimum(jc[None, :], nprc[:, None] - 1)
    valsc = jnp.where(jc[None, :] < nprc[:, None], hmap[pixc], 0.0)
    Dc = _ring_dfts(valsc, nprc, M)                   # (2*nc, maxn_cap)
    kkc = jnp.mod(jnp.arange(L, dtype=jnp.int32)[None, :],
                  nprc[:, None])
    Dgc = jnp.take_along_axis(Dc, kkc, axis=1)        # (2*nc, L)
    return jnp.concatenate([Dgc[:nc], Dgb, Dgc[nc:]], axis=0).T


def _anafast_seeds(nside, lmax, log_fold):
    """Host-side (f64 numpy) geometry + scaled sectoral seeds.

    Returns ring geometry and (p_mm, sc0) with
    lambda_mm(x_r) = p_mm[m, r] * FOLD^(-sc0[m, r]), p_mm in (1/F, 1].
    Precomputing in f64 on the host keeps the m*log(sin theta) seed
    exponents exact even when the device scan runs in f32."""
    rings = np.arange(1, 4 * nside)
    z, start, npr, shift = (np.asarray(v, dtype=np.float64)
                            for v in hpx.ring_info(nside, rings))
    sx = np.sqrt(np.maximum(1.0 - z * z, 0.0))    # > 0 on every ring
    m = np.arange(lmax + 1, dtype=np.float64)
    k = np.arange(1, lmax + 1, dtype=np.float64)
    logdd = np.cumsum(np.log((2 * k - 1.0) / (2 * k)))
    log_pref = 0.5 * (np.log((2 * m + 1) / (4 * np.pi))
                      + np.concatenate([[0.0], logdd]))
    logp = log_pref[:, None] + m[:, None] * np.log(sx)[None, :]
    sc0 = np.maximum(np.floor(-logp / log_fold), 0.0)
    sign = 1.0 - 2.0 * (np.arange(lmax + 1) % 2)
    p_mm = sign[:, None] * np.exp(logp + sc0 * log_fold)
    return (z, start.astype(np.int64), npr.astype(np.int64), shift,
            p_mm, sc0.astype(np.int32))


def _legendre_alm_pallas(Ger, Gor, Gei, Goi, p_mm, sc0, x_row,
                         interpret=False):
    """Pallas TPU kernel for the scaled-Legendre ell recurrence.

    Computes A[l, m] = sum_r lambda_lm(x_r) * Gfold[m, r] for the
    equator-folded northern half-plane (Ger/Gor = even/odd real folds,
    Gei/Goi imaginary) — the analysis stage-2 of :func:`anafast` /
    :func:`map2alm`. Same recurrence, seeding, and FOLD/BIG scaling as
    the ``lax.scan`` formulation in ``_anafast_core`` (the CPU/f64
    path), but restructured for the hardware:

    - the scan's per-ell carries (p2, p1, sc — three (lmax+1, R) planes)
      round-trip HBM on EVERY ell step, ~0.6 GB/step at NSIDE=2048
      (measured 16.4 s, ~100x off the VPU compute floor);
    - here the m axis is blocked (one grid step per MB rows) and the
      ell loop runs INSIDE the kernel with carries resident in VMEM, so
      each G/seed block is read from HBM exactly once. Each block's
      loop starts at ell = m_min(block) — lambda is identically zero
      for ell < m.

    Returns (Ar, Ai), each (L, L) float32 indexed [l, m]; the m > l
    triangle is zero by construction (the per-block loop starts at
    ell = m_min and unseeded lanes carry lambda = 0).

    Layout note: the kernel's output block is (MB, Lp) indexed [m, l]
    (transposed at the end) because Mosaic requires an output block's
    last dim to be 128-divisible or full; per-ell results land in the
    l column via a one-hot lane FMA on a VMEM loop carry — the lane
    reduction naturally yields an (MB, 1) sublane column, so the
    accumulate is a relayout-free broadcast (a dynamic row write would
    instead need a sublane<->lane transpose every step).
    """
    L, R = Ger.shape
    MB = 32 if R <= 4096 else 16        # m rows per block (VMEM budget)
    Lp = _cdiv(L, MB) * MB
    Rp = _cdiv(R, 128) * 128
    # zero padding is self-consistent: G = 0 kills contributions, and
    # p_mm = 0 seeds keep the recurrence identically zero on pad lanes
    pad2 = lambda a: jnp.pad(a, ((0, Lp - L), (0, Rp - R)))  # noqa: E731
    Ger, Gor, Gei, Goi = pad2(Ger), pad2(Gor), pad2(Gei), pad2(Goi)
    p_mm, sc0 = pad2(p_mm), pad2(sc0)
    x2 = jnp.pad(x_row.reshape(1, R), ((0, 0), (0, Rp - R)))
    FOLD, BIG = 1e20, 1e10              # f32 scaling (TPU hot path)

    def kern(ger, gor, gei, goi, pmm, sc0r, x, ar_out, ai_out):
        i = pl.program_id(0)
        mf_i = (jax.lax.broadcasted_iota(jnp.int32, (MB, 1), 0)
                + i * jnp.int32(MB))
        mf = mf_i.astype(jnp.float32)
        xr = x[:]                                   # (1, Rp)
        pmm_v, sc0_v = pmm[:], sc0r[:]

        def body(l, carry):
            p2, p1, sc, acr, aci = carry
            lf = l.astype(jnp.float32)
            # factored (l-m)(l+m) forms + clamps exactly as in the scan
            al = jnp.sqrt(jnp.maximum((2 * lf - 1) * (2 * lf + 1), 0.5)
                          / jnp.maximum((lf - mf) * (lf + mf), 0.5))
            al1 = jnp.sqrt(jnp.maximum((2 * lf - 3) * (2 * lf - 1), 0.5)
                           / jnp.maximum((lf - 1 - mf) * (lf - 1 + mf),
                                         0.5))
            inv_al1 = 1.0 / al1                     # (MB, 1): cheap
            p = al * (xr * p1 - p2 * inv_al1)
            is_seed = (l == mf_i)
            p = jnp.where(is_seed, pmm_v, p)
            sc = jnp.where(is_seed, sc0_v, sc)
            grow = (jnp.abs(p) > BIG) & (sc > 0)
            p = jnp.where(grow, p * (1.0 / FOLD), p)
            new_p2 = jnp.where(is_seed, 0.0,
                               jnp.where(grow, p1 * (1.0 / FOLD), p1))
            sc = sc - grow.astype(jnp.int32)
            lam = jnp.where(sc == 0, p, 0.0)
            even = ((l + mf_i) % 2 == 0)
            ar = jnp.sum(jnp.where(even, ger[:], gor[:]) * lam, axis=1,
                         keepdims=True)              # (MB, 1)
            ai = jnp.sum(jnp.where(even, gei[:], goi[:]) * lam, axis=1,
                         keepdims=True)
            onehot = (jax.lax.broadcasted_iota(jnp.int32, (1, Lp), 1)
                      == l).astype(jnp.float32)
            return (new_p2, p, sc, acr + ar * onehot, aci + ai * onehot)

        z = jnp.zeros((MB, Rp), jnp.float32)
        za = jnp.zeros((MB, Lp), jnp.float32)
        _, _, _, acr, aci = jax.lax.fori_loop(
            i * MB, Lp, body,
            (z, z, jnp.zeros((MB, Rp), jnp.int32), za, za))
        ar_out[:] = acr
        ai_out[:] = aci

    bspec = pl.BlockSpec((MB, Rp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    Ar, Ai = pl.pallas_call(
        kern,
        grid=(Lp // MB,),
        in_specs=[bspec] * 6 + [pl.BlockSpec((1, Rp), lambda i: (0, 0),
                                             memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((MB, Lp), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),) * 2,
        out_shape=(jax.ShapeDtypeStruct((Lp, Lp), jnp.float32),) * 2,
        interpret=interpret,
    )(Ger, Gor, Gei, Goi, p_mm, sc0, x2)
    return Ar.T[:L, :L], Ai.T[:L, :L]


def _legendre_synth_pallas(ar, ai, p_mm, sc0, x_row, interpret=False):
    """Pallas TPU kernel for the synthesis-direction Legendre recurrence.

    Computes the parity folds of B[m, r] = sum_l a_lm lambda_lm(x_r)
    over the NORTHERN half-plane — stage 1 of :func:`alm2map` (the
    adjoint of :func:`_legendre_alm_pallas`'s analysis contraction).
    Same recurrence/seeding/FOLD scaling as the ``lax.scan`` in
    ``_alm2map_core``, restructured identically to the analysis kernel:
    the scan's five (L, nring) carries round-trip HBM every ell step;
    here the m axis is blocked, the ell loop runs inside the kernel
    with carries resident in VMEM, and it additionally applies the
    equator parity fold (the scan formulation runs all 4*nside-1
    rings) — lambda_lm(-z) = (-1)^(l+m) lambda_lm(z), so accumulating
    Be = sum_{l+m even} a lam and Bo = sum_{l+m odd} a lam on 2*nside
    northern rings gives B_north = Be + Bo and B_south = Be - Bo.

    ar/ai : (L, L) a_lm indexed [l, m] (m > l triangle ignored — those
    lanes never seed, lambda stays 0). The per-ell coefficient row is
    extracted from the transposed (m, l) block by a one-hot lane
    contraction (a dynamic lane slice would relayout every step).

    Returns (Ber, Bor, Bei, Boi), each (L, R) float32 [m, r_north].
    """
    L = ar.shape[0]
    R = x_row.shape[0]
    MB = 32 if R <= 4096 else 16        # m rows per block (VMEM budget)
    Lp = _cdiv(L, MB) * MB
    Rp = _cdiv(R, 128) * 128
    padLR = lambda a: jnp.pad(a, ((0, Lp - L), (0, Rp - R)))  # noqa: E731
    # (m, l) layout so the kernel's lane axis is ell; zero padding is
    # inert (pad m rows never seed; pad l lanes multiply lambda = 0)
    At_r = jnp.pad(ar.T, ((0, Lp - L), (0, Lp - L)))
    At_i = jnp.pad(ai.T, ((0, Lp - L), (0, Lp - L)))
    p_mm, sc0 = padLR(p_mm), padLR(sc0)
    x2 = jnp.pad(x_row.reshape(1, R), ((0, 0), (0, Rp - R)))
    FOLD, BIG = 1e20, 1e10              # f32 scaling (TPU hot path)

    def kern(atr, ati, pmm, sc0r, x, ber_o, bor_o, bei_o, boi_o):
        i = pl.program_id(0)
        mf_i = (jax.lax.broadcasted_iota(jnp.int32, (MB, 1), 0)
                + i * jnp.int32(MB))
        mf = mf_i.astype(jnp.float32)
        xr = x[:]                                   # (1, Rp)
        pmm_v, sc0_v = pmm[:], sc0r[:]
        lane_l = jax.lax.broadcasted_iota(jnp.int32, (1, Lp), 1)

        def body(l, carry):
            p2, p1, sc, ber, bor, bei, boi = carry
            lf = l.astype(jnp.float32)
            al = jnp.sqrt(jnp.maximum((2 * lf - 1) * (2 * lf + 1), 0.5)
                          / jnp.maximum((lf - mf) * (lf + mf), 0.5))
            al1 = jnp.sqrt(jnp.maximum((2 * lf - 3) * (2 * lf - 1), 0.5)
                           / jnp.maximum((lf - 1 - mf) * (lf - 1 + mf),
                                         0.5))
            p = al * (xr * p1 - p2 * (1.0 / al1))
            is_seed = (l == mf_i)
            p = jnp.where(is_seed, pmm_v, p)
            sc = jnp.where(is_seed, sc0_v, sc)
            grow = (jnp.abs(p) > BIG) & (sc > 0)
            p = jnp.where(grow, p * (1.0 / FOLD), p)
            new_p2 = jnp.where(is_seed, 0.0,
                               jnp.where(grow, p1 * (1.0 / FOLD), p1))
            sc = sc - grow.astype(jnp.int32)
            lam = jnp.where(sc == 0, p, 0.0)
            onehot = (lane_l == l).astype(jnp.float32)
            a_r = jnp.sum(atr[:] * onehot, axis=1, keepdims=True)
            a_i = jnp.sum(ati[:] * onehot, axis=1, keepdims=True)
            even = ((l + mf_i) % 2 == 0)
            cr, ci = a_r * lam, a_i * lam
            return (new_p2, p, sc,
                    ber + jnp.where(even, cr, 0.0),
                    bor + jnp.where(even, 0.0, cr),
                    bei + jnp.where(even, ci, 0.0),
                    boi + jnp.where(even, 0.0, ci))

        z = jnp.zeros((MB, Rp), jnp.float32)
        _, _, _, ber, bor, bei, boi = jax.lax.fori_loop(
            i * MB, Lp, body,
            (z, z, jnp.zeros((MB, Rp), jnp.int32), z, z, z, z))
        ber_o[:] = ber
        bor_o[:] = bor
        bei_o[:] = bei
        boi_o[:] = boi

    bspec = pl.BlockSpec((MB, Rp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    aspec = pl.BlockSpec((MB, Lp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kern,
        grid=(Lp // MB,),
        in_specs=[aspec, aspec, bspec, bspec,
                  pl.BlockSpec((1, Rp), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(bspec,) * 4,
        out_shape=(jax.ShapeDtypeStruct((Lp, Rp), jnp.float32),) * 4,
        interpret=interpret,
    )(At_r, At_i, p_mm, sc0, x2)
    return tuple(o[:L, :R] for o in outs)


@partial(jax.jit, static_argnames=("nside", "lmax", "M", "want_alm",
                                   "use_pallas", "pallas_interpret"))
def _anafast_core(hmap, nside, lmax, M, z_d, start_d, npr_d, shift_d,
                  p_mm, sc0, want_alm=False, use_pallas=False,
                  pallas_interpret=False):
    dt = hmap.dtype
    dOmega = 4 * np.pi / hpx.npix(nside)

    # stage 1: G[m, r] = dOmega e^{-i m phi0(r)} D[r, m mod npr], with
    # the ring DFTs belt/cap split (see _ring_analysis)
    Dg = _ring_analysis(hmap, nside, lmax, M, start_d, npr_d)
    mi = jnp.arange(lmax + 1, dtype=jnp.int32)
    # ring phase e^{-i m phi0}, phi0 = shift * 2 pi / npr with
    # shift in {0, 1/2}: reduce the argument EXACTLY in integers
    # ((m * 2 shift) mod 2 npr) — at f32 the raw product m * phi0
    # reaches ~2e3 rad on polar rings and loses 3-4 digits
    s2 = jnp.round(2.0 * shift_d).astype(jnp.int32)    # 0 or 1
    npr_i = npr_d.astype(jnp.int32)
    k2 = jnp.mod(mi[:, None] * s2[None, :], 2 * npr_i[None, :])
    theta0 = jnp.pi * k2.astype(dt) / npr_i[None, :].astype(dt)
    G = dt.type(dOmega) * jnp.exp(-1j * theta0) * Dg
    Gr, Gi = jnp.real(G).astype(dt), jnp.imag(G).astype(dt)

    # stage 2: scaled normalized-Legendre scan over ell on the NORTHERN
    # half-plane only. HEALPix rings mirror across the equator (ring r
    # pairs with nring-1-r at -z, equal length), and
    # lambda_lm(-z) = (-1)^(l+m) lambda_lm(z), so
    #   sum_r lambda(z_r) G_r = sum_north lambda(z_r) * (G_n +/- G_s)
    # with + for even l+m and - for odd — precompute the even/odd folds
    # and run the recurrence on 2*nside rings instead of 4*nside-1.
    # This halves the dominant per-step HBM traffic (p1/p2/sc carries);
    # the equatorial ring pairs with itself: its G_s is zeroed so the
    # even fold counts it once, and the odd fold is killed by
    # lambda_lm(0) = 0 for odd l+m, which the recurrence produces
    # EXACTLY at x = 0 (the zero propagates through alternate steps).
    # lambda = p * FOLD^-sc; contributions only where sc == 0 (the rest
    # are < BIG/FOLD ~ 1e-20 relative — libsharp's truncation).
    n_north = 2 * nside
    is_eq = (jnp.arange(n_north) == n_north - 1)[None, :]
    Gr_s = jnp.where(is_eq, 0.0, Gr[:, ::-1][:, :n_north])
    Gi_s = jnp.where(is_eq, 0.0, Gi[:, ::-1][:, :n_north])
    Ger, Gor = Gr[:, :n_north] + Gr_s, Gr[:, :n_north] - Gr_s
    Gei, Goi = Gi[:, :n_north] + Gi_s, Gi[:, :n_north] - Gi_s
    if dt == jnp.dtype('float64'):
        FOLD, BIG = 1e40, 1e20
    else:
        FOLD, BIG = 1e20, 1e10
    x_row = z_d[None, :n_north].astype(dt)
    mf = mi.astype(dt)[:, None]
    mult = jnp.where(mi == 0, 1.0, 2.0).astype(dt)
    p_mm = p_mm[:, :n_north].astype(dt)
    sc0 = sc0[:, :n_north]

    if use_pallas:
        # TPU: m-blocked Pallas kernel, recurrence carries resident in
        # VMEM (see _legendre_alm_pallas — ~10x over the lax.scan, whose
        # per-ell carry round trips are pure HBM traffic)
        Ar2, Ai2 = _legendre_alm_pallas(Ger, Gor, Gei, Goi, p_mm, sc0,
                                        z_d[:n_north].astype(dt),
                                        interpret=pallas_interpret)
        if want_alm:
            mvalid = (jnp.arange(lmax + 1)[None, :]
                      <= jnp.arange(lmax + 1)[:, None])
            return Ar2 * mvalid, Ai2 * mvalid
        cl = jnp.sum(mult[None, :] * (Ar2 * Ar2 + Ai2 * Ai2), axis=1)
        ell = jnp.arange(lmax + 1, dtype=dt)
        return cl / (2.0 * ell + 1.0)

    def step(carry, l):
        p2, p1, sc = carry
        lf = l.astype(dt)
        # factored forms: l^2 - m^2 = (l-m)(l+m) avoids f32 cancellation.
        # Numerator AND denominator clamps only ever bite on lanes the
        # l<m / seed masks discard (l <= 1 or l <= m+1) — without them
        # sqrt(negative junk) turns 0*NaN into NaN on live lanes.
        al = jnp.sqrt(jnp.maximum((2 * lf - 1) * (2 * lf + 1), 0.5)
                      / jnp.maximum((lf - mf) * (lf + mf), 0.5))
        al1 = jnp.sqrt(jnp.maximum((2 * lf - 3) * (2 * lf - 1), 0.5)
                       / jnp.maximum((lf - 1 - mf) * (lf - 1 + mf), 0.5))
        p = al * (x_row * p1 - p2 / al1)
        is_seed = (l == mi[:, None])
        p = jnp.where(is_seed, p_mm, p)
        sc = jnp.where(is_seed, sc0, sc)
        grow = (jnp.abs(p) > BIG) & (sc > 0)
        p = jnp.where(grow, p * (1.0 / FOLD), p)
        new_p2 = jnp.where(is_seed, 0.0,
                           jnp.where(grow, p1 * (1.0 / FOLD), p1))
        sc = sc - grow.astype(jnp.int32)
        lam = jnp.where(sc == 0, p, 0.0)
        even = ((l + mi) % 2 == 0)[:, None]
        Ar = jnp.sum(jnp.where(even, Ger, Gor) * lam, axis=1)
        Ai = jnp.sum(jnp.where(even, Gei, Goi) * lam, axis=1)
        if want_alm:
            return (new_p2, p, sc), (Ar, Ai)
        cl = jnp.sum(mult * (Ar * Ar + Ai * Ai))
        return (new_p2, p, sc), cl

    zero = jnp.zeros((lmax + 1, n_north), dtype=dt)
    # no unroll: measured on v5e at NSIDE=1024 — unroll=4 was ~2x SLOWER
    # (the ~150 MB carries exceed VMEM, so unrolling only bloats the
    # program) and quadrupled compile time
    (_, _, _), out = jax.lax.scan(
        step, (zero, zero, jnp.zeros((lmax + 1, n_north), jnp.int32)),
        jnp.arange(lmax + 1))
    if want_alm:
        # rows are a_lm for one l each: (lmax+1, lmax+1) indexed [l, m]
        mvalid = (jnp.arange(lmax + 1)[None, :]
                  <= jnp.arange(lmax + 1)[:, None])
        return out[0] * mvalid, out[1] * mvalid
    ell = jnp.arange(lmax + 1, dtype=dt)
    return out / (2.0 * ell + 1.0)


@contextmanager
def _sht_precision_ctx():
    """Shared precision/backing dispatch for the SHT wrappers (anafast /
    map2alm / alm2map): f64 on CPU (package-global x64 mode), f32 on
    accelerators (traced under ``x64_disabled`` — TPU FFT has no c128
    path). Yields (active float dtype, nside -> Bluestein length M:
    the smallest power of two >= 2 * maxn = 8 * nside)."""
    if jax.default_backend() == "cpu":
        ctx = nullcontext()
    else:
        from ..utils import x64_disabled
        ctx = x64_disabled()

    def M_of(nside):
        M = 1
        while M < 8 * nside:
            M *= 2
        return M

    with ctx:
        yield jnp.zeros(0).dtype, M_of


def anafast(hmap, nside, lmax, iter=0):
    """Angular power spectrum C_ell of a RING-ordered HEALPix map —
    the ring-FFT production path (see module docstring). Matches
    healpy.anafast (no pixel-window deconvolution) and
    ``anafast_direct`` to float precision; runs NSIDE=1024 /
    lmax ~ 3*nside on a single chip.

    iter : Jacobi quadrature-refinement rounds as in healpy (its
    default is 3; here 0 keeps the single-pass estimator — each round
    costs one extra analysis + synthesis). With iter > 0 the spectrum
    is assembled from the refined a_lm.

    Precision: f64 on CPU (under the package's global x64 mode), f32 on
    accelerators (traced under ``x64_disabled`` — TPU FFT has no c128
    path) — seeds are always precomputed in f64 on the host.
    """
    if iter:
        are, aim = map2alm(hmap, nside, lmax, iter=iter)
        return alm2cl(are, aim)
    with _sht_precision_ctx() as (dt, M_of):
        hmap = jnp.asarray(hmap).astype(dt)
        return _anafast_core(hmap, nside, lmax, M_of(nside),
                             *_anafast_seed_consts(nside, lmax, str(dt)),
                             use_pallas=_use_pallas(dt))


def map2alm(hmap, nside, lmax, iter=0):
    """Harmonic coefficients a_lm of a RING-ordered HEALPix map
    (healpy.map2alm analog).

    Returns (alm_re, alm_im), each (lmax+1, lmax+1) indexed [l, m] with
    the m > l triangle zeroed — the same positive-m real-field storage
    :func:`alm2map` consumes, so ``alm2map(*map2alm(f))`` reproduces the
    band-limited part of ``f`` up to HEALPix pixel-center quadrature
    error. Same engine as :func:`anafast` (which equals
    ``sum_m w_m |a_lm|^2 / (2l+1)`` of this output); precision/platform
    handling as there.

    iter : rounds of Jacobi refinement against the pixel-center
    quadrature error (healpy's iterative scheme):
    ``a += analysis(map - synthesis(a))``. For band-limited maps each
    round contracts the residual by the quadrature-error factor
    (measured ~30x/round at lmax = nside/4); healpy defaults to 3."""
    with _sht_precision_ctx() as (dt, M_of):
        hmap = jnp.asarray(hmap).astype(dt)
        consts = _anafast_seed_consts(nside, lmax, str(dt))
        M = M_of(nside)
        up = _use_pallas(dt)
        are, aim = _anafast_core(hmap, nside, lmax, M, *consts,
                                 want_alm=True, use_pallas=up)
        for _ in range(iter):
            resid = hmap - _alm2map_core(are, aim, nside, lmax, M,
                                         *consts, use_pallas=up)
            dre, dim = _anafast_core(resid, nside, lmax, M, *consts,
                                     want_alm=True, use_pallas=up)
            are = are + dre
            aim = aim + dim
        return are, aim


def alm2cl(alm_re, alm_im):
    """C_ell from positive-m [l, m] a_lm storage (healpy.alm2cl analog):
    ``C_l = sum_m w_m |a_lm|^2 / (2l+1)``, w_0 = 1, w_m = 2."""
    alm_re = jnp.asarray(alm_re)
    alm_im = jnp.asarray(alm_im)
    L = alm_re.shape[0]
    wm = jnp.where(jnp.arange(L) == 0, 1.0, 2.0)[None, :]
    ell = jnp.arange(L, dtype=alm_re.dtype)
    return (jnp.sum(wm * (alm_re**2 + alm_im**2), axis=1)
            / (2.0 * ell + 1.0))


def gauss_beam(fwhm, lmax):
    """Gaussian beam window b_l = exp(-l(l+1) sigma^2 / 2),
    sigma = fwhm / sqrt(8 ln 2), fwhm in radians (healpy.gauss_beam)."""
    sigma = fwhm / np.sqrt(8.0 * np.log(2.0))
    l = jnp.arange(lmax + 1)
    return jnp.exp(-0.5 * l * (l + 1) * sigma**2)


def smoothing(hmap, nside, lmax, fwhm=None, beam=None, iter=0):
    """Convolve a RING-ordered map with an isotropic beam on the sphere
    (healpy.smoothing analog): map2alm -> a_lm * b_l -> alm2map.

    fwhm : Gaussian beam FWHM in radians (builds b_l via gauss_beam), or
    beam : (lmax+1,) explicit window b_l (overrides fwhm).
    iter : Jacobi quadrature-refinement rounds for the analysis step
    (see :func:`map2alm`).
    """
    if beam is None:
        if fwhm is None:
            raise ValueError("smoothing: give fwhm or beam")
        beam = gauss_beam(fwhm, lmax)
    beam = jnp.asarray(beam)
    alm_re, alm_im = map2alm(hmap, nside, lmax, iter=iter)
    return alm2map(alm_re * beam[:, None], alm_im * beam[:, None],
                   nside, lmax)


@partial(jax.jit, static_argnames=("nside", "lmax", "M", "use_pallas",
                                   "pallas_interpret"))
def _alm2map_core(alm_re, alm_im, nside, lmax, M, z_d, start_d, npr_d,
                  shift_d, p_mm, sc0, use_pallas=False,
                  pallas_interpret=False):
    """Synthesis (inverse SHT): f = sum_{l, m>=0} w_m Re(a_lm Y_lm),
    w_0 = 1, w_m = 2 — the adjoint structure of `_anafast_core` run
    backwards: (1) the scaled-Legendre ell scan ACCUMULATES
    B[m, r] = sum_l a_lm lambda_lm(x_r); (2) m's alias-fold into each
    ring's native frequency bins with the exact integer-reduced phi0
    phase; (3) batched inverse Bluestein DFTs evaluate every ring.

    With ``use_pallas`` (TPU f32 path) stage (1) runs the m-blocked
    VMEM-resident kernel :func:`_legendre_synth_pallas` on the
    equator-folded northern half instead of the full-ring lax.scan."""
    dt = alm_re.dtype
    nring = 4 * nside - 1
    mi = jnp.arange(lmax + 1, dtype=jnp.int32)

    if use_pallas:
        n_north = 2 * nside
        Ber, Bor, Bei, Boi = _legendre_synth_pallas(
            alm_re.astype(dt), alm_im.astype(dt),
            p_mm[:, :n_north].astype(dt), sc0[:, :n_north],
            z_d[:n_north].astype(dt), interpret=pallas_interpret)
        # unfold: ring r < n_north is northern; ring nring-1-r is its
        # southern mirror (the equator r = n_north-1 pairs with itself
        # and appears once, in the north block)
        Br = jnp.concatenate([Ber + Bor,
                              (Ber - Bor)[:, :n_north - 1][:, ::-1]],
                             axis=1)
        Bi = jnp.concatenate([Bei + Boi,
                              (Bei - Boi)[:, :n_north - 1][:, ::-1]],
                             axis=1)
        return _synth_rings(Br, Bi, nside, lmax, M, dt, mi, start_d,
                            npr_d, shift_d)

    if dt == jnp.dtype('float64'):
        FOLD, BIG = 1e40, 1e20
    else:
        FOLD, BIG = 1e20, 1e10
    x_row = z_d[None, :].astype(dt)
    mf = mi.astype(dt)[:, None]
    p_mm = p_mm.astype(dt)

    def step(carry, inp):
        p2, p1, sc, Br, Bi = carry
        l, ar, ai = inp                      # alm row at this ell
        lf = l.astype(dt)
        al = jnp.sqrt(jnp.maximum((2 * lf - 1) * (2 * lf + 1), 0.5)
                      / jnp.maximum((lf - mf) * (lf + mf), 0.5))
        al1 = jnp.sqrt(jnp.maximum((2 * lf - 3) * (2 * lf - 1), 0.5)
                       / jnp.maximum((lf - 1 - mf) * (lf - 1 + mf), 0.5))
        p = al * (x_row * p1 - p2 / al1)
        is_seed = (l == mi[:, None])
        p = jnp.where(is_seed, p_mm, p)
        sc = jnp.where(is_seed, sc0, sc)
        grow = (jnp.abs(p) > BIG) & (sc > 0)
        p = jnp.where(grow, p * (1.0 / FOLD), p)
        new_p2 = jnp.where(is_seed, 0.0,
                           jnp.where(grow, p1 * (1.0 / FOLD), p1))
        sc = sc - grow.astype(jnp.int32)
        lam = jnp.where(sc == 0, p, 0.0)
        Br = Br + ar[:, None] * lam
        Bi = Bi + ai[:, None] * lam
        return (new_p2, p, sc, Br, Bi), None

    zero = jnp.zeros((lmax + 1, nring), dtype=dt)
    (_, _, _, Br, Bi), _ = jax.lax.scan(
        step,
        (zero, zero, jnp.zeros((lmax + 1, nring), jnp.int32), zero, zero),
        (jnp.arange(lmax + 1), alm_re.astype(dt), alm_im.astype(dt)))
    return _synth_rings(Br, Bi, nside, lmax, M, dt, mi, start_d, npr_d,
                        shift_d)


def _synth_rings(Br, Bi, nside, lmax, M, dt, mi, start_d, npr_d,
                 shift_d):
    """Stages (2)-(3) of the synthesis: alias-fold B[m, r] into each
    ring's native frequency bins (exact integer-reduced phi0 phase,
    real-field multiplicity w_m) and evaluate every ring — the belt/cap
    split of :func:`_ring_analysis` run backwards:

    - BELT rings: for lmax < 4*nside no two m alias into the same
      frequency bin, so the fold is a transpose + zero-pad (no
      scatter), the evaluation one batched power-of-two ifft (no
      Bluestein), and the pixel writeback a reshape into the belt's
      contiguous RING-order segment.
    - CAP rings keep the scatter-add fold + inverse Bluestein +
      variable-length pixel scatter, at cap sizes (half the rows,
      4*(nside-1) columns).
    """
    L = lmax + 1
    nc = nside - 1                       # rings per polar cap
    nb = 2 * nside + 1                   # belt rings
    nbf = 4 * nside                      # belt ring length
    belt0 = 2 * nside * (nside - 1)      # first belt pixel (RING order)
    npr_i = npr_d.astype(jnp.int32)
    s2 = jnp.round(2.0 * shift_d).astype(jnp.int32)    # 0 or 1
    k2 = jnp.mod(mi[:, None] * s2[None, :], 2 * npr_i[None, :])
    theta0 = jnp.pi * k2.astype(dt) / npr_i[None, :].astype(dt)
    wm = jnp.where(mi == 0, 1.0, 2.0).astype(dt)[:, None]
    Bc = (wm * (Br + 1j * Bi)) * jnp.exp(1j * theta0)  # (L, nring)

    # belt: pixel j of ring r gets Re sum_k C[r, k] e^{+2 pi i k j / n}
    Bb = Bc[:, nc:nc + nb].T                           # (nb, L)
    if lmax < nbf:
        Cb = jnp.concatenate(
            [Bb, jnp.zeros((nb, nbf - L), dtype=Bb.dtype)], axis=1)
    else:
        kb = jnp.mod(mi, nbf)
        Cb = jnp.zeros((nb, nbf), dtype=Bb.dtype).at[:, kb].add(Bb)
    vals_b = jnp.real(jnp.fft.ifft(Cb, axis=1)) * dt.type(nbf)
    if nc == 0:
        return vals_b.reshape(-1)

    # caps
    maxn_cap = 4 * nc
    Bcap = jnp.concatenate([Bc[:, :nc], Bc[:, nc + nb:]], axis=1)
    nprc = jnp.concatenate([npr_i[:nc], npr_i[3 * nside:]])
    kkc = jnp.mod(mi[:, None], nprc[None, :])          # (L, 2*nc)
    flat = (jnp.arange(2 * nc, dtype=jnp.int32)[None, :] * maxn_cap
            + kkc).reshape(-1)
    Crc = jnp.zeros(2 * nc * maxn_cap, dtype=dt).at[flat].add(
        jnp.real(Bcap).reshape(-1)).reshape(2 * nc, maxn_cap)
    Cic = jnp.zeros(2 * nc * maxn_cap, dtype=dt).at[flat].add(
        jnp.imag(Bcap).reshape(-1)).reshape(2 * nc, maxn_cap)
    Fc = _ring_dfts(Crc + 1j * Cic, nprc, M, sign=+1)
    vals_c = jnp.real(Fc)                              # (2*nc, maxn_cap)

    # pixel writeback: north cap is exactly [0, belt0), the belt
    # [belt0, npix - belt0), the south cap the rest — concatenate the
    # three segments instead of scattering 12*nside^2 rows
    jc = jnp.arange(maxn_cap)
    validc = jc[None, :] < nprc[:, None]
    startc = jnp.concatenate([start_d[:nc], start_d[3 * nside:]])
    pix_n = (startc[:nc, None]
             + jnp.minimum(jc[None, :], nprc[:nc, None] - 1))
    north = jnp.zeros(belt0, dtype=dt).at[pix_n.reshape(-1)].add(
        jnp.where(validc[:nc], vals_c[:nc], 0.0).reshape(-1))
    off = belt0 + nb * nbf
    pix_s = (startc[nc:, None] - off
             + jnp.minimum(jc[None, :], nprc[nc:, None] - 1))
    south = jnp.zeros(belt0, dtype=dt).at[pix_s.reshape(-1)].add(
        jnp.where(validc[nc:], vals_c[nc:], 0.0).reshape(-1))
    return jnp.concatenate([north, vals_b.reshape(-1), south])


def alm2map(alm_re, alm_im, nside, lmax):
    """Synthesize a RING-ordered HEALPix map from harmonic coefficients.

    alm_re/alm_im : (lmax+1, lmax+1) real/imag parts of a_lm, indexed
    [l, m] with the m > l triangle ignored. Conventions match
    :func:`anafast` (complex Y_lm with positive-m storage for a real
    field, scipy `sph_harm_y`-anchored), so
    anafast(alm2map(a)) == sum_m w_m |a_lm|^2 / (2l+1) up to HEALPix
    quadrature error. Precision/platform handling as in anafast."""
    with _sht_precision_ctx() as (dt, M_of):
        return _alm2map_core(jnp.asarray(alm_re).astype(dt),
                             jnp.asarray(alm_im).astype(dt),
                             nside, lmax, M_of(nside),
                             *_anafast_seed_consts(nside, lmax, str(dt)),
                             use_pallas=_use_pallas(dt))


def synalm(cl, lmax, key):
    """Draw Gaussian a_lm with spectrum C_ell (healpy.synalm analog).

    cl : (lmax+1,) angular power spectrum
    Returns (alm_re, alm_im), each (lmax+1, lmax+1) [l, m]: m = 0 modes
    are real ~ N(0, C_l); m > 0 have re/im ~ N(0, C_l / 2), so
    E[sum_m w_m |a_lm|^2] = (2l+1) C_l, the anafast estimator's mean."""
    cl = jnp.asarray(cl)
    L = lmax + 1
    kr, ki = jax.random.split(jax.random.PRNGKey(key)
                              if isinstance(key, int) else key)
    l = jnp.arange(L)[:, None]
    m = jnp.arange(L)[None, :]
    tri = (m <= l)
    std = jnp.sqrt(jnp.maximum(cl, 0.0))[:, None]
    fac = jnp.where(m == 0, 1.0, np.sqrt(0.5)) * std * tri
    alm_re = jax.random.normal(kr, (L, L), dtype=cl.dtype) * fac
    alm_im = (jax.random.normal(ki, (L, L), dtype=cl.dtype) * fac
              * (m > 0))
    return alm_re, alm_im


def synfast(cl, nside, lmax, key):
    """Gaussian random RING-ordered map realization with spectrum C_ell
    (healpy.synfast analog): alm2map(synalm(cl))."""
    alm_re, alm_im = synalm(cl, lmax, key)
    return alm2map(alm_re, alm_im, nside, lmax)


@lru_cache(maxsize=4)
def _anafast_seed_consts(nside, lmax, dt_name):
    """Device-resident geometry + seed arrays, cached per (nside, lmax,
    dtype) — they are map-independent and ~70 MB at NSIDE=1024, so
    re-uploading them per call would dominate on a remote device."""
    dt = jnp.dtype(dt_name)
    lnF = np.log(1e40 if dt == jnp.dtype('float64') else 1e20)
    z, start, npr, shift, p_mm, sc0 = _anafast_seeds(nside, lmax, lnF)
    return (jnp.asarray(z, dtype=dt), jnp.asarray(start),
            jnp.asarray(npr), jnp.asarray(shift, dtype=dt),
            jnp.asarray(p_mm, dtype=dt), jnp.asarray(sc0))
