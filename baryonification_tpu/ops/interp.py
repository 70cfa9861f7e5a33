"""Interpolation primitives in fixed-shape JAX.

This module is the TPU-native replacement for the reference's pervasive use
of scipy interpolators:

- ``pchip_*``: Fritsch–Carlson monotone cubic (scipy ``PchipInterpolator``),
  used by the reference for every mass-profile inversion
  (`/root/reference/BaryonForge/Profiles/BaryonCorrection.py:280-284`,
  `Schneider19.py:1003-1005`). Monotone interpolation is load-bearing: plain
  cubics oscillate at profile truncations (noted at `Arico20.py:755-759`).
- ``masked_compact``: turns the reference's boolean-mask + ragged-array
  interpolation (`BaryonCorrection.py:237-284`) into a fixed-shape
  compaction so it can live under ``jit``/``vmap``.
- ``ndlinear_interp``: scipy ``RegularGridInterpolator`` (multilinear,
  NaN outside bounds) for the displacement / profile tables.

All functions are shape-static, jit-able, and vmap-able.
"""

import jax
import jax.numpy as jnp

__all__ = ["pchip_derivatives", "pchip_eval", "pchip_interp",
           "masked_compact", "ndlinear_interp", "searchsorted_interp"]


def pchip_derivatives(x, y):
    """Fritsch–Carlson endpoint-corrected derivatives for monotone cubics.

    x : (N,) strictly increasing; y : (..., N). Returns d : (..., N).
    Matches scipy.interpolate.PchipInterpolator's derivative choices.
    """
    h = jnp.diff(x)                      # (N-1,)
    m = jnp.diff(y, axis=-1) / h         # slopes, (..., N-1)

    hk = h[1:]                           # h_k,   k = 1..N-2
    hkm1 = h[:-1]                        # h_{k-1}
    mk = m[..., 1:]
    mkm1 = m[..., :-1]
    w1 = 2.0 * hk + hkm1
    w2 = hk + 2.0 * hkm1
    # harmonic-weighted mean where slopes agree in sign, else 0
    denom = w1 / jnp.where(mkm1 == 0.0, 1.0, mkm1) + w2 / jnp.where(mk == 0.0, 1.0, mk)
    d_int = jnp.where(
        (jnp.sign(mkm1) * jnp.sign(mk) > 0.0),
        (w1 + w2) / denom,
        0.0,
    )

    def _edge(h0, h1, m0, m1):
        d = ((2.0 * h0 + h1) * m0 - h0 * m1) / (h0 + h1)
        d = jnp.where(jnp.sign(d) != jnp.sign(m0), 0.0, d)
        d = jnp.where(
            (jnp.sign(m0) != jnp.sign(m1)) & (jnp.abs(d) > 3.0 * jnp.abs(m0)),
            3.0 * m0, d)
        return d

    d0 = _edge(h[0], h[1], m[..., 0], m[..., 1])
    dN = _edge(h[-1], h[-2], m[..., -1], m[..., -2])
    return jnp.concatenate(
        [d0[..., None], d_int, dN[..., None]], axis=-1)


def pchip_eval(xq, x, y, d, extrapolate=True, deriv=0):
    """Evaluate the cubic Hermite defined by (x, y, d) at xq.

    xq : (...,) query points; x : (N,); y, d : (N,) (use vmap for batches).
    With extrapolate=True the end cubics are extended (scipy behavior);
    otherwise out-of-range queries return NaN. ``deriv=1`` evaluates the
    first derivative instead.
    """
    N = x.shape[-1]
    i = jnp.clip(jnp.searchsorted(x, xq, side="right") - 1, 0, N - 2)
    hi = x[i + 1] - x[i]
    t = (xq - x[i]) / hi
    t2 = t * t
    if deriv == 0:
        t3 = t2 * t
        h00 = 2.0 * t3 - 3.0 * t2 + 1.0
        h10 = t3 - 2.0 * t2 + t
        h01 = -2.0 * t3 + 3.0 * t2
        h11 = t3 - t2
        out = (h00 * y[i] + h10 * hi * d[i]
               + h01 * y[i + 1] + h11 * hi * d[i + 1])
    elif deriv == 1:
        g00 = (6.0 * t2 - 6.0 * t) / hi
        g10 = 3.0 * t2 - 4.0 * t + 1.0
        g01 = (-6.0 * t2 + 6.0 * t) / hi
        g11 = 3.0 * t2 - 2.0 * t
        out = (g00 * y[i] + g10 * d[i] + g01 * y[i + 1] + g11 * d[i + 1])
    else:
        raise ValueError("deriv must be 0 or 1")
    if not extrapolate:
        out = jnp.where((xq < x[0]) | (xq > x[-1]), jnp.nan, out)
    return out


def pchip_interp(xq, x, y, extrapolate=True):
    """One-shot monotone-cubic interpolation (single curve)."""
    d = pchip_derivatives(x, y)
    return pchip_eval(xq, x, y, d, extrapolate=extrapolate)


def masked_compact(x, y, mask, pad_dx=1.0):
    """Compact the valid points of a masked curve to the array front.

    Fixed-shape replacement for ``x[mask], y[mask]``: valid entries keep
    their order at the front; the tail is filled with a monotone x
    continuation and constant y so downstream pchip stays well-defined.

    Returns (xc, yc, x_hi) where x_hi is the largest valid x (queries above
    it — or below xc[0] — should be treated as out of range by the caller).
    """
    order = jnp.argsort(jnp.where(mask, 0, 1), stable=True)
    xc = x[order]
    yc = y[order]
    n = jnp.sum(mask)
    last = jnp.maximum(n - 1, 0)
    x_hi = xc[last]
    y_hi = yc[last]
    j = jnp.arange(x.shape[-1])
    tail = j > last
    xc = jnp.where(tail, x_hi + (j - last) * pad_dx, xc)
    yc = jnp.where(tail, y_hi, yc)
    return xc, yc, x_hi


def searchsorted_interp(xq, x, y):
    """Plain linear interpolation with end-value clamping (jnp.interp)."""
    return jnp.interp(xq, x, y)


def blend_table_radial(grids, table, scalar_coords):
    """Blend a (z, M, r [, props...]) table down to one radial profile.

    ``scalar_coords`` are per-halo scalars for every axis except r (axis
    2). Returns the (Nr,) profile, NaN outside the non-r bounds. Combined
    with :func:`radial_readout` this turns a 2^D-gather-per-point table
    readout into a 1-D lerp per point — the fast path used by the runner
    kernels.
    """
    other_axes = [0, 1] + list(range(3, len(grids)))
    idxs, ws = [], []
    inb = True
    for ax, c in zip(other_axes, scalar_coords):
        g = grids[ax]
        i = jnp.clip(jnp.searchsorted(g, c, side="right") - 1, 0,
                     g.shape[0] - 2)
        t = (c - g[i]) / (g[i + 1] - g[i])
        inb = inb & (c >= g[0]) & (c <= g[-1])
        idxs.append(i)
        ws.append(t)

    n_other = len(other_axes)
    prof = jnp.zeros_like(table, shape=table.shape[2:3])
    for corner in range(2 ** n_other):
        w = jnp.ones((), dtype=table.dtype)
        ind = []
        for d in range(n_other):
            b = (corner >> d) & 1
            ind.append(idxs[d] + b)
            w = w * jnp.where(b, ws[d], 1.0 - ws[d])
        sel = (ind[0], ind[1], slice(None)) + tuple(ind[2:])
        prof = prof + w * table[sel]
    return jnp.where(inb, prof, jnp.nan)


def radial_readout(prof, lnr_grid, lnr):
    """Linear interpolation of a radial profile on its uniform log grid,
    NaN outside the range."""
    g0 = lnr_grid[0]
    dg = lnr_grid[1] - lnr_grid[0]
    t = (lnr - g0) / dg
    i = jnp.clip(jnp.floor(t).astype(jnp.int32), 0, lnr_grid.shape[0] - 2)
    w = t - i
    out = (1.0 - w) * prof[i] + w * prof[i + 1]
    inb = (lnr >= g0) & (lnr <= lnr_grid[-1])
    return jnp.where(inb, out, jnp.nan)


def ndlinear_interp(grids, values, coords, fill_value=jnp.nan):
    """Multilinear interpolation on a rectilinear N-D grid.

    grids  : tuple of D strictly-increasing 1-D arrays
    values : array of shape (len(g) for g in grids)
    coords : tuple of D broadcastable query arrays
    Out-of-bounds queries return ``fill_value`` (scipy
    RegularGridInterpolator with bounds_error=False semantics).
    """
    D = len(grids)
    coords = jnp.broadcast_arrays(*[jnp.asarray(c) for c in coords])
    idx = []
    frac = []
    inb = jnp.ones(coords[0].shape, dtype=bool)
    for g, c in zip(grids, coords):
        g = jnp.asarray(g)
        i = jnp.clip(jnp.searchsorted(g, c, side="right") - 1, 0, g.shape[0] - 2)
        t = (c - g[i]) / (g[i + 1] - g[i])
        inb = inb & (c >= g[0]) & (c <= g[-1])
        idx.append(i)
        frac.append(t)

    acc = jnp.zeros(coords[0].shape, dtype=values.dtype)
    for corner in range(2 ** D):
        w = jnp.ones(coords[0].shape, dtype=values.dtype)
        ind = []
        for dim in range(D):
            b = (corner >> dim) & 1
            ind.append(idx[dim] + b)
            w = w * jnp.where(b, frac[dim], 1.0 - frac[dim])
        acc = acc + values[tuple(ind)] * w
    return jnp.where(inb, acc, fill_value)
