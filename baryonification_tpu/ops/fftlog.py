"""FFTLog Hankel transforms in pure JAX.

Replaces the reference's use of CCL's C FFTLog engine
(`/root/reference/BaryonForge/utils/Pixel.py:8`, used at `Pixel.py:146-147,
208-209`) and powers the linear correlation function xi(r) from P(k).

Conventions follow CCL's ``_fftlog_transform(r, f, dim, ell, plaw)``:

  dim=3, ell=0:  T3[f](k) = 1/(2 pi^2) * int dr r^2 j_0(kr) f(r)
  dim=2, ell=0:  T2[f](k) = 1/(2 pi)   * int dr r   J_0(kr) f(r)

so that a round trip returns f/(2 pi)^dim (the reference multiplies the
round-tripped profile by (2 pi)^dim, `Pixel.py:155,222`).

The algorithm is the standard Talman/Hamilton FFTLog: decompose f into
power-law modes via an FFT in ln r, multiply by the analytic Mellin
transform of the Bessel kernel, and FFT back on the reflected log grid.
"""

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["loggamma", "fftlog_transform", "hankel_transform"]


# Lanczos approximation (g=7, n=9) for the log-gamma function of a complex
# argument; jax.scipy has no complex gammaln.
_LANCZOS_G = 7.0
_LANCZOS_COEFS = np.array([
    0.99999999999980993,
    676.5203681218851,
    -1259.1392167224028,
    771.32342877765313,
    -176.61502916214059,
    12.507343278686905,
    -0.13857109526572012,
    9.9843695780195716e-6,
    1.5056327351493116e-7,
])


def _loggamma_positive(z):
    """log Gamma(z) for Re(z) > 0 (complex), via Lanczos."""
    z = z - 1.0
    x = jnp.full(z.shape, _LANCZOS_COEFS[0], dtype=z.dtype)
    for i in range(1, len(_LANCZOS_COEFS)):
        x = x + _LANCZOS_COEFS[i] / (z + i)
    t = z + _LANCZOS_G + 0.5
    return 0.5 * jnp.log(2.0 * jnp.pi) + (z + 0.5) * jnp.log(t) - t + jnp.log(x)


def loggamma(z):
    """log Gamma(z) for complex z, with reflection for Re(z) < 0.5."""
    z = jnp.asarray(z, dtype=jnp.complex128)
    reflect = jnp.real(z) < 0.5
    z_safe = jnp.where(reflect, 1.0 - z, z)
    lg = _loggamma_positive(z_safe)
    # reflection: Gamma(z) Gamma(1-z) = pi / sin(pi z)
    refl = jnp.log(jnp.pi / jnp.sin(jnp.pi * z))
    return jnp.where(reflect, refl - lg, lg)


def _mellin_bessel(mu, s):
    """T_mu(s) = int_0^inf t^(s+1) J_mu(t) dt = 2^(s+1) G(1+(mu+s)/2)/G((mu-s)/2)."""
    num = loggamma(1.0 + 0.5 * (mu + s))
    den = loggamma(0.5 * (mu - s))
    return jnp.exp((s + 1.0) * jnp.log(2.0) + num - den)


def hankel_transform(x, f, mu, q=0.0):
    """F(y) = int_0^inf f(x) J_mu(x y) x dx on a reflected log grid.

    Parameters
    ----------
    x : (N,) log-spaced, strictly increasing sample points.
    f : (..., N) samples of f(x); transforms vectorize over leading axes.
    mu : Bessel order (float).
    q : power-law bias exponent for the log-FFT decomposition.

    Returns
    -------
    y : (N,) log-spaced output grid with pivot y_c = 1/x_c.
    F : (..., N) the transform evaluated on y.
    """
    x = jnp.asarray(x)
    f = jnp.asarray(f)
    N = x.shape[-1]
    dlnx = jnp.log(x[1] / x[0])
    n0 = 0.5 * (N - 1)
    lnx0 = 0.5 * (jnp.log(x[0]) + jnp.log(x[-1]))  # log pivot (grid center)

    # Output grid: y_n = y0 * exp((n - n0) dlnx), y0 = 1/x0
    n = jnp.arange(N)
    lny = -lnx0 + (n - n0) * dlnx
    y = jnp.exp(lny)

    # Power-law mode decomposition: f(x) = sum_m c_m (x/x0)^(q + i eta_m).
    # With the grid centered at x0 (index n0), the FFT coefficients pick up
    # an e^{+i 2pi m n0 / N} phase: c_m = fft(a)_m / N * e^{+i 2pi m n0/N}.
    xf = jnp.exp(jnp.log(x) - lnx0)  # x / x0
    a = f * xf ** (-q)
    c = jnp.fft.fft(a, axis=-1) / N          # fft(a)/N, m in FFT order
    m = jnp.fft.fftfreq(N, d=1.0 / N)        # integer mode numbers (FFT order)
    eta = 2.0 * jnp.pi * m / (N * dlnx)
    s = q + 1j * eta

    T = _mellin_bessel(mu, s)
    # F(y_n) = y_n^-2 (y_n/y0)^-q sum_m c_m T(s_m) e^{-i 2pi m (n - n0)/N};
    # the two n0 phases (decomposition + output re-centering) combine to
    # e^{+i 2pi m (2 n0)/N}.
    d = c * T * jnp.exp(1j * 2.0 * jnp.pi * m * (2.0 * n0) / N)
    # need sum_m d_m e^{-i 2pi m n/N}; ifft gives the +i kernel, so conjugate:
    ssum = jnp.conj(jnp.fft.ifft(jnp.conj(d), axis=-1)) * N
    F = jnp.real(ssum) * y ** (-2.0) * jnp.exp(-q * (n - n0) * dlnx)
    return y, F


def fftlog_transform(r, f, dim, ell, plaw=0.0):
    """CCL-convention FFTLog transform (see module docstring).

    dim=3: T3[f](k) = 4 pi/(2 pi)^3 int r^2 j_ell(kr) f dr
    dim=2: T2[f](k) = 2 pi/(2 pi)^2 int r J_ell(kr) f dr

    ``plaw`` biases the log-periodic decomposition (CCL's ``plaw_fourier``).
    Returns (k, F) with F having the same leading axes as f.
    """
    r = jnp.asarray(r)
    f = jnp.asarray(f)
    if dim == 3:
        # j_ell(x) = sqrt(pi/(2x)) J_{ell+1/2}(x)
        # int r^2 j_ell(kr) f dr = sqrt(pi/2) k^{-1/2} H_{ell+1/2}[sqrt(r) f](k)
        mu = ell + 0.5
        k, H = hankel_transform(r, f * jnp.sqrt(r), mu, q=plaw + 0.5)
        F = (1.0 / (2.0 * jnp.pi ** 2)) * jnp.sqrt(jnp.pi / 2.0) * H / jnp.sqrt(k)
    elif dim == 2:
        mu = float(ell)
        k, H = hankel_transform(r, f, mu, q=plaw)
        F = H / (2.0 * jnp.pi)
    else:
        raise ValueError(f"dim must be 2 or 3, got {dim}")
    return k, F
