"""HEALPix RING-scheme geometry in pure JAX.

Replaces healpy's C++ routines used throughout the reference shell runner
(`/root/reference/BaryonForge/Runners/HealpixRunner.py`): ang2vec/pix2vec
(`:303,312`), query_disc (`:306`), get_interp_weights (`:337`) and
nside2resol. Everything is closed-form RING arithmetic — vectorized,
jit-able, TPU-friendly (no host callbacks, no variable shapes).

The variable-size ``query_disc`` becomes ``disc_window``: a fixed
(NR rings x NP pixels-per-ring) index window with a validity mask, so
per-halo pixel gathers vmap cleanly (SURVEY.md section 7 step 6).

Conventions match HEALPix: theta = colatitude in [0, pi], phi in [0, 2pi),
ring index i = 1..4n-1. All formulas from Gorski et al. 2005.
"""

from functools import lru_cache as _functools_lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["npix", "nside2resol", "pix2ang", "ang2pix", "pix2vec", "ang2vec",
           "vec2ang", "ring_info", "z_to_ring", "get_interp_weights",
           "disc_window", "ud_grade", "nest2ring", "ring2nest"]


def npix(nside):
    return 12 * nside * nside


def _idt():
    """Index dtype: int64 on the x64 (host/f64) path, int32 on the
    accelerator f32 path — pixel ids fit int32 for nside <= 8192
    (12 * 8192^2 < 2^31), and asking for int64 under disabled x64
    emits a per-trace UserWarning."""
    return jnp.int64 if jax.config.jax_enable_x64 else jnp.int32


def _fdt():
    """Float dtype matching the x64 state (f64 host path / f32
    accelerator path) without per-trace truncation warnings."""
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


def nside2resol(nside):
    """Mean pixel spacing in radians (healpy parity)."""
    return np.sqrt(4.0 * np.pi / npix(nside))


def ang2vec(theta, phi):
    st = jnp.sin(theta)
    return jnp.stack([st * jnp.cos(phi), st * jnp.sin(phi),
                      jnp.cos(theta)], axis=-1)


def vec2ang(vec):
    x, y, z = vec[..., 0], vec[..., 1], vec[..., 2]
    r = jnp.sqrt(x * x + y * y + z * z)
    theta = jnp.arccos(jnp.clip(z / r, -1.0, 1.0))
    phi = jnp.arctan2(y, x)
    phi = jnp.where(phi < 0, phi + 2 * jnp.pi, phi)
    return theta, phi


def radec2ang(ra_deg, dec_deg):
    """(ra, dec) in degrees -> (theta, phi) HEALPix angles (lonlat=True
    convention in healpy)."""
    theta = jnp.deg2rad(90.0 - dec_deg)
    phi = jnp.deg2rad(jnp.mod(ra_deg, 360.0))
    return theta, phi


# ----- pixel <-> angle -----

def pix2ang(nside, ipix):
    """RING pixel index -> (theta, phi), vectorized."""
    n = nside
    p = jnp.asarray(ipix, dtype=_idt())
    Np = 12 * n * n
    ncap = 2 * n * (n - 1)

    # --- north cap: rings i = 1..n-1 with 4i pixels ---
    ph = (p + 1) * 0.5
    i_cap = (jnp.floor(jnp.sqrt(jnp.maximum(
        ph - jnp.sqrt(jnp.floor(ph)), 0.0))) + 1).astype(p.dtype)
    j_cap = p - 2 * i_cap * (i_cap - 1)          # 0-based in ring
    z_n = 1.0 - i_cap.astype(_fdt()) ** 2 / (3.0 * n * n)
    phi_n = (jnp.pi / (2.0 * i_cap)) * (j_cap + 0.5)

    # --- equatorial belt: rings i = n..3n, 4n pixels each ---
    pe = p - ncap
    i_eq = pe // (4 * n) + n
    j_eq = pe % (4 * n)
    s = (i_eq - n + 1) % 2                        # phase shift
    z_e = 4.0 / 3.0 - 2.0 * i_eq.astype(_fdt()) / (3.0 * n)
    phi_e = (jnp.pi / (2.0 * n)) * (j_eq + s * 0.5)

    # --- south cap (mirror of north) ---
    q = Np - 1 - p
    qh = (q + 1) * 0.5
    i_s = (jnp.floor(jnp.sqrt(jnp.maximum(
        qh - jnp.sqrt(jnp.floor(qh)), 0.0))) + 1).astype(p.dtype)
    j_s = q - 2 * i_s * (i_s - 1)
    z_s = -(1.0 - i_s.astype(_fdt()) ** 2 / (3.0 * n * n))
    phi_s = (jnp.pi / (2.0 * i_s)) * ((4 * i_s - 1 - j_s) + 0.5)

    north = p < ncap
    south = p >= Np - ncap
    z = jnp.where(north, z_n, jnp.where(south, z_s, z_e))
    phi = jnp.where(north, phi_n, jnp.where(south, phi_s, phi_e))
    return jnp.arccos(jnp.clip(z, -1.0, 1.0)), phi


def pix2vec(nside, ipix):
    theta, phi = pix2ang(nside, ipix)
    return ang2vec(theta, phi)


def vec2pix(nside, x, y, z):
    """Unit vector(s) -> RING pixel index (healpy.vec2pix analog)."""
    theta, phi = vec2ang(jnp.stack(
        [jnp.asarray(x), jnp.asarray(y), jnp.asarray(z)], axis=-1))
    return ang2pix(nside, theta, phi)


def nside2npix(nside):
    """healpy-compat alias of :func:`npix`."""
    return npix(nside)


def ang2pix(nside, theta, phi):
    """(theta, phi) -> RING pixel index, vectorized (healpy algorithm)."""
    n = nside
    z = jnp.cos(theta)
    za = jnp.abs(z)
    tt = jnp.mod(phi, 2 * jnp.pi) / (0.5 * jnp.pi)   # in [0, 4)

    # --- equatorial: |z| <= 2/3 ---
    temp1 = n * (0.5 + tt)
    temp2 = n * (z * 0.75)
    jp = jnp.floor(temp1 - temp2).astype(_idt())
    jm = jnp.floor(temp1 + temp2).astype(_idt())
    ir = n + 1 + jp - jm          # ring counted from z = 2/3: 1..2n+1
    kshift = 1 - (ir & 1)
    ip = (jp + jm - n + kshift + 1) // 2
    ip = jnp.mod(ip, 4 * n)
    pix_eq = 2 * n * (n - 1) + 4 * n * (ir - 1) + ip

    # --- polar caps ---
    tp = tt - jnp.floor(tt)
    tmp = n * jnp.sqrt(jnp.maximum(3.0 * (1.0 - za), 0.0))
    jp_c = jnp.floor(tp * tmp).astype(_idt())
    jm_c = jnp.floor((1.0 - tp) * tmp).astype(_idt())
    ir_c = jp_c + jm_c + 1
    ip_c = jnp.floor(tt * ir_c).astype(_idt())
    ip_c = jnp.mod(ip_c, 4 * ir_c)
    pix_n = 2 * ir_c * (ir_c - 1) + ip_c
    pix_s = 12 * n * n - 2 * ir_c * (ir_c + 1) + ip_c

    pix_polar = jnp.where(z > 0, pix_n, pix_s)
    return jnp.where(za <= 2.0 / 3.0, pix_eq, pix_polar)


# ----- ring bookkeeping -----

def ring_info(nside, i):
    """For ring index i (1..4n-1): (z, start_pixel, npix_in_ring, shifted).

    shifted=1 means pixel centers offset by half a spacing in phi.
    """
    n = nside
    i = jnp.asarray(i, dtype=_idt())
    in_ncap = i < n
    in_scap = i > 3 * n

    # north cap
    z_n = 1.0 - i.astype(_fdt()) ** 2 / (3.0 * n * n)
    start_n = 2 * i * (i - 1)
    npr_n = 4 * i

    # equatorial
    z_e = 4.0 / 3.0 - 2.0 * i.astype(_fdt()) / (3.0 * n)
    start_e = 2 * n * (n - 1) + 4 * n * (i - n)
    npr_e = jnp.full_like(i, 4 * n)
    shift_e = ((i - n + 1) % 2).astype(_fdt()) * 0.5

    # south cap: mirror ring i' = 4n - i
    i_m = 4 * n - i
    z_s = -(1.0 - i_m.astype(_fdt()) ** 2 / (3.0 * n * n))
    start_s = 12 * n * n - 2 * i_m * (i_m + 1)
    npr_s = 4 * i_m

    z = jnp.where(in_ncap, z_n, jnp.where(in_scap, z_s, z_e))
    start = jnp.where(in_ncap, start_n, jnp.where(in_scap, start_s, start_e))
    npr = jnp.where(in_ncap, npr_n, jnp.where(in_scap, npr_s, npr_e))
    shift = jnp.where(in_ncap | in_scap, 0.5, shift_e)
    return z, start, npr, shift


def z_to_ring(nside, z):
    """Ring index of the ring at-or-above z (0 = above the first ring)."""
    n = nside
    z = jnp.asarray(z)
    # equatorial inverse: i = 2n - 1.5 n z  (from z = 4/3 - 2i/(3n))
    i_eq = jnp.floor(n * (2.0 - 1.5 * z)).astype(_idt())
    # caps: i = n sqrt(3 (1 -| z|))
    i_n = jnp.floor(n * jnp.sqrt(jnp.maximum(3.0 * (1.0 - z), 0.0))
                    ).astype(_idt())
    i_s = 4 * n - 1 - jnp.floor(
        n * jnp.sqrt(jnp.maximum(3.0 * (1.0 + z), 0.0))).astype(_idt())
    ring = jnp.where(z > 2.0 / 3.0, i_n,
                     jnp.where(z < -2.0 / 3.0, i_s, i_eq))
    return jnp.clip(ring, 0, 4 * n - 1)


# ----- bilinear interpolation weights (healpy get_interp_weights) -----

def _ring_phi_neighbors(nside, ring, phi):
    """In ring ``ring``: the two pixels bracketing phi and the fractional
    offset toward the second one."""
    z, start, npr, shift = ring_info(nside, ring)
    dphi = 2.0 * jnp.pi / npr.astype(_fdt())
    t = phi / dphi - shift
    j1 = jnp.floor(t).astype(_idt())
    frac = t - j1
    p1 = start + jnp.mod(j1, npr)
    p2 = start + jnp.mod(j1 + 1, npr)
    return p1, p2, frac, z


def get_interp_weights(nside, theta, phi):
    """4 neighbor pixels + bilinear weights for each (theta, phi).

    Returns (pix, w) of shape (..., 4); weights sum to 1 (healpy
    get_interp_weights parity; the pole rows fall back to splitting the
    weight within the nearest ring, which preserves the sum).
    """
    n = nside
    z = jnp.cos(theta)
    r1 = z_to_ring(n, z)
    r2 = r1 + 1
    at_npole = r1 < 1
    at_spole = r2 > 4 * n - 1
    r1c = jnp.clip(r1, 1, 4 * n - 1)
    r2c = jnp.clip(r2, 1, 4 * n - 1)

    p11, p12, f1, z1 = _ring_phi_neighbors(n, r1c, phi)
    p21, p22, f2, z2 = _ring_phi_neighbors(n, r2c, phi)

    # theta-weight toward ring 2 (healpy interpolates in theta)
    th1 = jnp.arccos(jnp.clip(z1, -1, 1))
    th2 = jnp.arccos(jnp.clip(z2, -1, 1))
    denom = jnp.where(th2 > th1, th2 - th1, 1.0)
    wt = jnp.clip((theta - th1) / denom, 0.0, 1.0)
    wt = jnp.where(at_npole, 0.0, jnp.where(at_spole, 1.0, wt))

    pix = jnp.stack([p11, p12, p21, p22], axis=-1)
    w = jnp.stack([(1 - wt) * (1 - f1), (1 - wt) * f1,
                   wt * (1 - f2), wt * f2], axis=-1)
    return pix, w


# ----- fixed-size disc windows (query_disc replacement) -----

# ----- precomputed-table fast path (for accelerator kernels) -----
#
# The closed-form functions above mix integer ring bookkeeping with f64
# trigonometry — exact, but expensive on TPUs (f64 is software-emulated).
# For the hot kernels we precompute two host-side tables once per NSIDE:
#   * ring tables (4n-1 entries): z, theta, start pixel, ring length,
#     phi shift — a few KB;
#   * the pixel-center unit vectors (npix, 3) — e.g. 151 MB in f32 at
#     NSIDE=1024;
# and the kernels become pure f32 gathers + arithmetic. Ring lookup is a
# searchsorted against the (tiny) descending-z table, which is exact.

class RingTables:
    """Host-precomputed per-ring tables in a chosen device dtype."""

    def __init__(self, nside, dtype=jnp.float32):
        self.nside = nside
        with jax.default_device(jax.devices("cpu")[0]):
            rings = jnp.arange(1, 4 * nside)
            z, start, npr, shift = ring_info(nside, rings)
            theta = jnp.arccos(jnp.clip(z, -1, 1))
        self.z = jnp.asarray(np.asarray(z), dtype=dtype)
        self.neg_z = -self.z                      # ascending, for searches
        self.theta = jnp.asarray(np.asarray(theta), dtype=dtype)
        self.start = jnp.asarray(np.asarray(start), dtype=jnp.int32)
        self.npr = jnp.asarray(np.asarray(npr), dtype=jnp.int32)
        self.shift = jnp.asarray(np.asarray(shift), dtype=dtype)
        self.dtype = dtype


@partial(jax.jit, static_argnames=("nside",))
def nest2ring_all(nside):
    """NESTED -> RING ids for ALL pixels, on-device int32 (exact).

    The numpy `nest2ring` costs ~30 s for NSIDE 1024 on a single host
    core; this is pure int32 bit arithmetic (no roots), so it runs
    exactly on the accelerator in milliseconds. Valid for nside <= 8192
    (ids < 2^31, spread-bit intermediates < 2^27).
    """
    assert nside <= 8192
    n = nside
    p = jnp.arange(12 * n * n, dtype=jnp.int32)
    face = p // (n * n)
    rem = (p - face * n * n).astype(jnp.uint32)

    def compress(v):
        v = v & jnp.uint32(0x55555555)
        v = (v | (v >> 1)) & jnp.uint32(0x33333333)
        v = (v | (v >> 2)) & jnp.uint32(0x0F0F0F0F)
        v = (v | (v >> 4)) & jnp.uint32(0x00FF00FF)
        v = (v | (v >> 8)) & jnp.uint32(0x0000FFFF)
        return v

    x = compress(rem).astype(jnp.int32)
    y = compress(rem >> 1).astype(jnp.int32)
    jrll = jnp.asarray(_JRLL, dtype=jnp.int32)[face]
    jpll = jnp.asarray(_JPLL, dtype=jnp.int32)[face]

    jr = jrll * n - x - y - 1
    npx = 12 * n * n
    ncap = 2 * n * (n - 1)
    north = jr < n
    south = jr > 3 * n
    nr = jnp.where(north, jr, jnp.where(south, 4 * n - jr, n))
    start = jnp.where(north, 2 * nr * (nr - 1),
                      jnp.where(south, npx - 2 * nr * (nr + 1),
                                ncap + (jr - n) * 4 * n))
    kshift = jnp.where(north | south, 0, (jr - n) & 1)
    jp = (jpll * nr + x - y + 1 + kshift) // 2
    jp = jnp.where(jp > 4 * nr, jp - 4 * nr, jp)
    jp = jnp.where(jp < 1, jp + 4 * nr, jp)
    return start + jp - 1


@partial(jax.jit, static_argnames=("nside",))
def pixel_planes_device(nside, z_tab, start_tab, npr_tab, shift_tab,
                        p=None):
    """(vx, vy, vz) pixel-center unit-vector planes built ON DEVICE.

    Uses the small per-ring tables (f64-accurate, cast to the table
    dtype): ring id by searchsorted over the 4n-1 ring starts, then
    phi = (j + shift) * 2 pi / npr and the trig in the table dtype. This
    replaces a ~3 GB single-core host computation + a 150 MB tunnel
    transfer (at NSIDE 1024) with ~0.3 s of one-time device work. ``p``
    optionally reorders (e.g. NESTED ids from ``nest2ring_all``).
    """
    if p is None:
        p = jnp.arange(12 * nside * nside, dtype=jnp.int32)
    dt = z_tab.dtype
    ring = (jnp.searchsorted(start_tab, p, side="right") - 1).astype(
        jnp.int32)
    j = (p - start_tab[ring]).astype(dt)
    dphi = (2.0 * jnp.pi) / npr_tab[ring].astype(dt)
    phi = (j + shift_tab[ring]) * dphi
    z = z_tab[ring]
    st = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    return st * jnp.cos(phi), st * jnp.sin(phi), z


def _rt_flatten(rt):
    return ((rt.z, rt.neg_z, rt.theta, rt.start, rt.npr, rt.shift),
            (rt.nside, rt.dtype))


def _rt_unflatten(aux, children):
    rt = object.__new__(RingTables)
    rt.nside, rt.dtype = aux
    (rt.z, rt.neg_z, rt.theta, rt.start, rt.npr, rt.shift) = children
    return rt


jax.tree_util.register_pytree_node(RingTables, _rt_flatten, _rt_unflatten)


def pixel_vectors(nside, dtype=jnp.float32):
    """(npix, 3) pixel-center unit vectors, host-built in f64, cast."""
    with jax.default_device(jax.devices("cpu")[0]):
        vec = pix2vec(nside, jnp.arange(npix(nside)))
        vec = np.asarray(vec)
    return jnp.asarray(vec, dtype=dtype)


def pixel_vectors_soa(nside, dtype=jnp.float32):
    """Pixel-center unit vectors as three (npix,) arrays.

    Structure-of-arrays layout: on TPU an (npix, 3) array is tiled
    T(8, 128) — the 3-wide minor dim pads to 128 lanes, costing 42x the
    memory and HBM bandwidth (6.4 GB at NSIDE 1024 instead of 150 MB).
    The hot runners carry vectors as separate component planes instead.
    """
    with jax.default_device(jax.devices("cpu")[0]):
        vec = np.asarray(pix2vec(nside, jnp.arange(npix(nside))))
    return tuple(jnp.asarray(vec[:, i], dtype=dtype) for i in range(3))


def ring_above_tab(tables, z):
    """Number of rings with z_ring >= z (0 = above the first ring)."""
    return jnp.searchsorted(tables.neg_z, -z, side="right").astype(jnp.int32)


def _ring_phi_neighbors_tab(tables, ring, phi):
    """Two pixels bracketing phi in ring ``ring`` (1-based) + fraction."""
    k = ring - 1
    start = tables.start[k]
    npr = tables.npr[k]
    shift = tables.shift[k]
    theta_r = tables.theta[k]
    dphi = 2.0 * jnp.pi / npr.astype(tables.dtype)
    t = phi / dphi - shift
    j1 = jnp.floor(t).astype(jnp.int32)
    frac = t - j1
    p1 = start + jnp.mod(j1, npr)
    p2 = start + jnp.mod(j1 + 1, npr)
    return p1, p2, frac, theta_r


def get_interp_weights_parts_tab(tables, theta, phi):
    """Table-based 4-neighbor bilinear weights as component tuples
    ((p1..p4), (w1..w4)) — the SoA form the batched regrid needs (an
    (npix, 4) stacked array is tiled T(8, 128) on TPU: 32x its size)."""
    n = tables.nside
    z = jnp.cos(theta)
    r1 = ring_above_tab(tables, z)
    r2 = r1 + 1
    at_npole = r1 < 1
    at_spole = r2 > 4 * n - 1
    r1c = jnp.clip(r1, 1, 4 * n - 1)
    r2c = jnp.clip(r2, 1, 4 * n - 1)

    p11, p12, f1, th1 = _ring_phi_neighbors_tab(tables, r1c, phi)
    p21, p22, f2, th2 = _ring_phi_neighbors_tab(tables, r2c, phi)

    denom = jnp.where(th2 > th1, th2 - th1, 1.0)
    wt = jnp.clip((theta - th1) / denom, 0.0, 1.0)
    wt = jnp.where(at_npole, 0.0, jnp.where(at_spole, 1.0, wt))

    return ((p11, p12, p21, p22),
            ((1 - wt) * (1 - f1), (1 - wt) * f1,
             wt * (1 - f2), wt * f2))


def get_interp_weights_parts(nside, theta, phi):
    """Closed-form 4-neighbor bilinear weights as component tuples —
    no ring-table gathers (a searchsorted + per-pixel table gather costs
    ~10 ns/row on TPU; the closed forms are pure arithmetic). Matches
    get_interp_weights_parts_tab."""
    n = nside
    z = jnp.cos(theta)
    r1 = z_to_ring(n, z).astype(jnp.int32)
    r2 = r1 + 1
    at_npole = r1 < 1
    at_spole = r2 > 4 * n - 1
    r1c = jnp.clip(r1, 1, 4 * n - 1)
    r2c = jnp.clip(r2, 1, 4 * n - 1)

    def ring_neighbors(ring):
        zr, start, npr, shift = ring_info(n, ring)
        dphi = 2.0 * jnp.pi / npr.astype(theta.dtype)
        t = phi / dphi - shift
        j1 = jnp.floor(t).astype(_idt())
        frac = (t - j1).astype(theta.dtype)
        p1 = start + jnp.mod(j1, npr)
        p2 = start + jnp.mod(j1 + 1, npr)
        th_r = jnp.arccos(jnp.clip(zr, -1.0, 1.0)).astype(theta.dtype)
        return p1, p2, frac, th_r

    p11, p12, f1, th1 = ring_neighbors(r1c)
    p21, p22, f2, th2 = ring_neighbors(r2c)

    denom = jnp.where(th2 > th1, th2 - th1, 1.0)
    wt = jnp.clip((theta - th1) / denom, 0.0, 1.0)
    wt = jnp.where(at_npole, 0.0, jnp.where(at_spole, 1.0, wt))

    return ((p11, p12, p21, p22),
            ((1 - wt) * (1 - f1), (1 - wt) * f1,
             wt * (1 - f2), wt * f2))


def get_interp_weights_tab(tables, theta, phi):
    """Table-based 4-neighbor bilinear weights (get_interp_weights
    fast path; identical semantics). Stacked (..., 4) output — use
    get_interp_weights_parts_tab in batched hot paths."""
    ps, ws = get_interp_weights_parts_tab(tables, theta, phi)
    return jnp.stack(ps, axis=-1), jnp.stack(ws, axis=-1)


def disc_window_tab(tables, vec_table, theta0, phi0, radius, n_rings,
                    n_phi):
    """Table-based fixed-shape disc window (disc_window fast path; call
    inside a jitted kernel — ``tables`` is closed over, not traced).

    Returns (pix, valid, pvec): pixel indices, validity mask, and the
    gathered pixel-center unit vectors (saves the caller a second gather).
    """
    n = tables.nside
    dt = tables.dtype
    cos_r = jnp.cos(radius)
    v0 = ang2vec(theta0, phi0)

    z_hi = jnp.cos(jnp.maximum(theta0 - radius, 0.0))
    ring_lo = jnp.clip(ring_above_tab(tables, z_hi), 1, 4 * n - 1)
    k = jnp.arange(n_rings, dtype=jnp.int32)
    rings_raw = ring_lo[..., None] + k
    ring_ok = rings_raw <= 4 * n - 1
    rings = jnp.clip(rings_raw, 1, 4 * n - 1)

    kk = rings - 1
    z = tables.z[kk]
    start = tables.start[kk]
    npr = tables.npr[kk]
    shift = tables.shift[kk]
    dphi_pix = 2.0 * jnp.pi / npr.astype(dt)

    st0 = jnp.sin(theta0)[..., None]
    ct0 = jnp.cos(theta0)[..., None]
    st = jnp.sqrt(jnp.maximum(1.0 - z * z, 1e-30))
    cosdphi = (cos_r[..., None] - z * ct0) / (st * st0 + 1e-30)
    no_overlap = cosdphi > 1.0

    t = phi0[..., None] / dphi_pix - shift
    j_center = jnp.round(t).astype(jnp.int32)
    m = jnp.arange(n_phi, dtype=jnp.int32) - (n_phi // 2)
    j = j_center[..., None] + m
    jw = jnp.mod(j, npr[..., None])
    pix = start[..., None] + jw

    pvec = vec_table[pix]                              # (..., NR, NP, 3)
    inside = jnp.einsum('...i,...i->...', pvec,
                        v0[..., None, None, :]) >= cos_r[..., None, None]
    valid = inside & ~no_overlap[..., None] & ring_ok[..., None]
    span = jnp.minimum(npr[..., None], n_phi)
    slot_ok = (m >= -(span // 2)) & (m < span - span // 2)
    valid = valid & slot_ok
    return pix, valid, pvec


def disc_window_mask_tab(tables, theta0, phi0, radius, n_rings, n_phi):
    """Fixed-shape disc window WITHOUT pixel-vector gathers.

    Same pixel set as :func:`disc_window_tab` (the pixel-center-in-disc
    test is evaluated analytically per ring: cos(dist) = z*cos(theta0) +
    sin(theta)*sin(theta0)*cos(dphi) >= cos(radius)), but no (..., 3)
    arrays are built — an (N, 3) intermediate is tiled T(8, 128) on TPU
    and costs 42x its logical size, which OOMs large batched windows.
    Returns (pix, valid).
    """
    n = tables.nside
    dt = tables.dtype
    cos_r = jnp.cos(radius)

    z_hi = jnp.cos(jnp.maximum(theta0 - radius, 0.0))
    ring_lo = jnp.clip(ring_above_tab(tables, z_hi), 1, 4 * n - 1)
    k = jnp.arange(n_rings, dtype=jnp.int32)
    rings_raw = ring_lo[..., None] + k
    ring_ok = rings_raw <= 4 * n - 1
    rings = jnp.clip(rings_raw, 1, 4 * n - 1)

    kk = rings - 1
    z = tables.z[kk]
    start = tables.start[kk]
    npr = tables.npr[kk]
    shift = tables.shift[kk]
    dphi_pix = 2.0 * jnp.pi / npr.astype(dt)

    st0 = jnp.sin(theta0)[..., None]
    ct0 = jnp.cos(theta0)[..., None]
    st = jnp.sqrt(jnp.maximum(1.0 - z * z, 1e-30))
    # in-disc iff cos(phi_pix - phi0) >= cosdphi_thresh on this ring
    cosdphi_thresh = (cos_r[..., None] - z * ct0) / (st * st0 + 1e-30)

    t = phi0[..., None] / dphi_pix - shift
    j_center = jnp.round(t).astype(jnp.int32)
    m = jnp.arange(n_phi, dtype=jnp.int32) - (n_phi // 2)
    j = j_center[..., None] + m
    jw = jnp.mod(j, npr[..., None])
    pix = start[..., None] + jw

    # actual pixel phi (unwrapped j is fine under cos)
    dphi = ((j.astype(dt) + shift[..., None]) * dphi_pix[..., None]
            - phi0[..., None, None])
    inside = jnp.cos(dphi) >= cosdphi_thresh[..., None]
    valid = inside & ring_ok[..., None]
    span = jnp.minimum(npr[..., None], n_phi)
    slot_ok = (m >= -(span // 2)) & (m < span - span // 2)
    valid = valid & slot_ok
    return pix, valid


@partial(jax.jit, static_argnames=("nside", "n_rings", "n_phi"))
def disc_window(nside, theta0, phi0, radius, n_rings, n_phi):
    """Fixed-shape pixel window covering a disc of angular ``radius``
    around (theta0, phi0).

    Returns (pix, valid) of shapes (..., n_rings, n_phi): RING pixel
    indices and a mask selecting pixels whose centers lie inside the disc.
    ``n_rings``/``n_phi`` are static padding bounds; callers size them from
    the largest disc in the batch (bucketing halos keeps padding tight).
    """
    n = nside
    theta0 = jnp.asarray(theta0)
    phi0 = jnp.asarray(phi0)
    radius = jnp.asarray(radius)

    cos_r = jnp.cos(radius)
    v0 = ang2vec(theta0, phi0)

    # candidate rings
    z_hi = jnp.cos(jnp.maximum(theta0 - radius, 0.0))
    ring_lo = z_to_ring(n, z_hi)           # first ring at-or-below top
    ring_lo = jnp.clip(ring_lo, 1, 4 * n - 1)
    k = jnp.arange(n_rings)
    rings_raw = ring_lo[..., None] + k
    ring_ok = rings_raw <= 4 * n - 1        # avoid double-counting the
    rings = jnp.clip(rings_raw, 1, 4 * n - 1)  # clamped last ring (..., NR)

    z, start, npr, shift = ring_info(n, rings)
    dphi_pix = 2.0 * jnp.pi / npr.astype(_fdt())

    # phi half-width of the disc at this ring's colatitude
    st0 = jnp.sin(theta0)[..., None]
    ct0 = jnp.cos(theta0)[..., None]
    st = jnp.sqrt(jnp.maximum(1.0 - z * z, 1e-30))
    cosdphi = (cos_r[..., None] - z * ct0) / (st * st0 + 1e-30)
    full_ring = cosdphi < -1.0
    no_overlap = cosdphi > 1.0
    dphi_max = jnp.where(full_ring, jnp.pi,
                         jnp.arccos(jnp.clip(cosdphi, -1.0, 1.0)))

    # center pixel in ring and symmetric candidate offsets
    t = phi0[..., None] / dphi_pix - shift
    j_center = jnp.round(t).astype(_idt())
    m = jnp.arange(n_phi) - (n_phi // 2)
    j = j_center[..., None] + m                        # (..., NR, NP)
    jw = jnp.mod(j, npr[..., None])
    pix = start[..., None] + jw

    # validity: pixel center actually within the disc (exact, via dot
    # product -- mirrors query_disc inclusive=False semantics)
    pvec = pix2vec(n, pix)
    inside = jnp.einsum('...i,...i->...', pvec,
                        v0[..., None, None, :]) >= cos_r[..., None, None]
    valid = inside & ~no_overlap[..., None] & ring_ok[..., None]
    # mask candidate slots that alias the same pixel (ring shorter than NP)
    span = jnp.minimum(npr[..., None], n_phi)
    slot_ok = (m >= -(span // 2)) & (m < span - span // 2)
    valid = valid & slot_ok
    return pix, valid


# ----- NESTED ordering (host-side, vectorized numpy) -----
#
# The cell-major TPU kernels want fine pixels of any coarse cell to be
# contiguous in memory, which is exactly the NESTED hierarchy: fine
# nested pixel p at nside belongs to coarse nested cell p >> 2k at
# nside >> k. Conversions follow the standard HEALPix (face, x, y)
# decomposition (Gorski et al. 2005).

_JRLL = np.array([2, 2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 4])
_JPLL = np.array([1, 3, 5, 7, 0, 2, 4, 6, 1, 3, 5, 7])


def _compress_bits(v):
    """Keep even-position bits of v and pack them (uint64)."""
    v = v & np.uint64(0x5555555555555555)
    v = (v | (v >> np.uint64(1))) & np.uint64(0x3333333333333333)
    v = (v | (v >> np.uint64(2))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v >> np.uint64(4))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v >> np.uint64(8))) & np.uint64(0x0000FFFF0000FFFF)
    v = (v | (v >> np.uint64(16))) & np.uint64(0x00000000FFFFFFFF)
    return v


def _spread_bits(v):
    """Inverse of _compress_bits: spread bits to even positions."""
    v = v & np.uint64(0x00000000FFFFFFFF)
    v = (v | (v << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v << np.uint64(2))) & np.uint64(0x3333333333333333)
    v = (v | (v << np.uint64(1))) & np.uint64(0x5555555555555555)
    return v


def nest2ring(nside, ipnest):
    """NESTED -> RING pixel index (vectorized numpy, host-side)."""
    n = int(nside)
    p = np.asarray(ipnest, dtype=np.int64)
    face = p // (n * n)
    rem = (p - face * n * n).astype(np.uint64)
    x = _compress_bits(rem).astype(np.int64)
    y = _compress_bits(rem >> np.uint64(1)).astype(np.int64)

    jr = _JRLL[face] * n - x - y - 1          # ring 1..4n-1
    npx = 12 * n * n
    ncap = 2 * n * (n - 1)

    north = jr < n
    south = jr > 3 * n
    nr = np.where(north, jr, np.where(south, 4 * n - jr, n))
    start = np.where(north, 2 * nr * (nr - 1),
                     np.where(south, npx - 2 * nr * (nr + 1),
                              ncap + (jr - n) * 4 * n))
    kshift = np.where(north | south, 0, (jr - n) & 1)

    jp = (_JPLL[face] * nr + x - y + 1 + kshift) // 2
    jp = np.where(jp > 4 * nr, jp - 4 * nr, jp)
    jp = np.where(jp < 1, jp + 4 * nr, jp)
    return start + jp - 1


def ring2nest(nside, ipring):
    """RING -> NESTED pixel index (vectorized numpy, host-side)."""
    n = int(nside)
    p = np.asarray(ipring, dtype=np.int64)
    npx = 12 * n * n
    ncap = 2 * n * (n - 1)

    # ring number jr and index-in-ring jp (1-based), per regime
    north = p < ncap
    south = p >= npx - ncap

    ph = (p + 1) * 0.5
    i_n = (np.floor(np.sqrt(np.maximum(ph - np.sqrt(np.floor(ph)), 0.0)))
           + 1).astype(np.int64)
    q = npx - 1 - p
    qh = (q + 1) * 0.5
    i_s = (np.floor(np.sqrt(np.maximum(qh - np.sqrt(np.floor(qh)), 0.0)))
           + 1).astype(np.int64)

    jr = np.where(north, i_n,
                  np.where(south, 4 * n - i_s, (p - ncap) // (4 * n) + n))
    nr = np.where(north, i_n, np.where(south, i_s, n))
    start = np.where(north, 2 * nr * (nr - 1),
                     np.where(south, npx - 2 * nr * (nr + 1),
                              ncap + (jr - n) * 4 * n))
    jp = p - start + 1
    kshift = np.where(north | south, 0, (jr - n) & 1)

    # face and (x - y), (x + y) from ring coordinates
    ire = jr - n + 1                          # 1..2n+1 in equator
    irm = 2 * n + 2 - ire
    ifm = (jp - ire // 2 + n - 1) // n        # face index helpers
    ifp = (jp - irm // 2 + n - 1) // n
    face_eq = np.where(ifp == ifm, (ifp & 3) + 4,
                       np.where(ifp < ifm, ifp & 3, (ifm & 3) + 8))
    face_n = (jp - 1) // nr                   # north cap: 4 faces 0..3
    face_s = 8 + (jp - 1) // nr
    face = np.where(north, face_n, np.where(south, face_s, face_eq))

    irt = jr - _JRLL[face] * n + 1            # -nside+1 .. 0
    ipt = 2 * jp - _JPLL[face] * nr - kshift - 1
    ipt = np.where(ipt >= 2 * n, ipt - 8 * n, ipt)
    x = ((ipt - irt) // 2).astype(np.uint64)
    y = ((-ipt - irt) // 2).astype(np.uint64)
    rem = _spread_bits(x) | (_spread_bits(y) << np.uint64(1))
    return (face * n * n + rem.astype(np.int64))


@_functools_lru_cache(maxsize=8)
def _udgrade_index(nside_in, nside_out):
    """Host-side gather/scatter indices for ud_grade, cached per pair.

    Returns (ring_of_nested_in, ring_of_nested_out) as device arrays:
    RING index of each NESTED pixel at the input/output resolution."""
    r_in = jnp.asarray(nest2ring(nside_in, np.arange(12 * nside_in**2,
                                                     dtype=np.int64)))
    r_out = jnp.asarray(nest2ring(nside_out, np.arange(12 * nside_out**2,
                                                       dtype=np.int64)))
    return r_in, r_out


def ud_grade(hmap, nside_out, power=0.0):
    """Up/downgrade a RING-ordered HEALPix map (healpy.ud_grade analog).

    Degrading averages each output pixel's 4^k NESTED children; upgrading
    replicates the parent value into its children (no interpolation) —
    the same semantics as healpy (`hp.ud_grade`, used by reference
    workflows for resolution matching). ``power``: the result is divided
    by (nside_in/nside_out)**power; power=-2 keeps the map SUM invariant
    (mass-like maps), power=0 (default) keeps the MEAN invariant
    (temperature-like maps). Bad-pixel (UNSEEN) handling is not
    implemented."""
    hmap = jnp.asarray(hmap)
    if not jnp.issubdtype(hmap.dtype, jnp.floating):
        # degrade averages children: an integer output dtype would
        # truncate them (and int-target .at[].set(float) is a future
        # JAX error); healpy returns float maps here too
        hmap = hmap.astype(jnp.promote_types(hmap.dtype, jnp.float32))
    npix_in = hmap.shape[-1]
    nside_in = int(round(np.sqrt(npix_in / 12)))
    if 12 * nside_in**2 != npix_in:
        raise ValueError(f"ud_grade: invalid map size {npix_in}")
    nside_out = int(nside_out)
    r_in, r_out = _udgrade_index(nside_in, nside_out)
    if nside_out <= nside_in:
        k = (nside_in // nside_out) ** 2
        nested = hmap[..., r_in].reshape(hmap.shape[:-1] + (-1, k))
        vals = jnp.mean(nested, axis=-1)
    else:
        k = (nside_out // nside_in) ** 2
        nested = jnp.repeat(hmap[..., r_in], k, axis=-1)
        vals = nested
    out = jnp.zeros(hmap.shape[:-1] + (12 * nside_out**2,),
                    dtype=hmap.dtype)
    out = out.at[..., r_out].set(vals)
    if power:
        out = out / jnp.asarray((nside_in / nside_out) ** power,
                                dtype=hmap.dtype)
    return out
