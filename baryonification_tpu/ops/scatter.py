"""Conservative scatter-add kernels (regridding).

TPU-native replacements for the reference's numba hot loops:

- ``regrid_healpix``: 4-neighbor weighted redeposit of displaced HEALPix
  pixels (`/root/reference/BaryonForge/Runners/HealpixRunner.py:13-70`),
  expressed as one XLA scatter-add.
- ``cic_deposit_2d`` / ``cic_deposit_3d``: conservative redeposit of unit
  pixels/cells at displaced fractional positions with periodic wrapping
  (`Runners/Map2DRunner.py:14-168`). The reference computes exact overlap
  areas of a shifted unit pixel over a +/-2 neighborhood; for unit-size
  pixels that overlap is exactly the 2^d-corner cloud-in-cell hat, so the
  kernel reduces to a CIC scatter-add.

All kernels accumulate in float64 by default: the mass-conservation assert
after regridding (`HealpixRunner.py:344-346`) needs better-than-f32 sums
at the 12M-pixel scale.
"""

import jax
import jax.numpy as jnp

from .scatter_pallas import scatter_add_accum

__all__ = ["regrid_healpix", "cic_deposit_2d", "cic_deposit_3d",
           "scatter_add_1d"]


def scatter_add_1d(size, idx, vals, dtype=None):
    """out[idx] += vals into a fresh zeros(size) array."""
    dtype = dtype or vals.dtype
    out = jnp.zeros((size,), dtype=dtype)
    return out.at[idx.reshape(-1)].add(vals.reshape(-1).astype(dtype))


def regrid_healpix(npix_out, parent_vals, child_pix, child_weights,
                   dtype=jnp.float64):
    """Redistribute each parent value over its 4 neighbor pixels.

    parent_vals : (N,) values of displaced pixels
    child_pix   : (N, 4) destination pixel indices
    child_weights : (N, 4) weights (sum to 1 per row)
    """
    contrib = (child_weights * parent_vals[:, None]).reshape(-1)
    (out,) = scatter_add_accum((jnp.zeros((npix_out,), dtype=dtype),),
                               child_pix.reshape(-1).astype(jnp.int32),
                               (contrib.astype(dtype),))
    return out


def cic_deposit_2d(N, pos_x, pos_y, vals, dtype=jnp.float64):
    """Deposit unit squares centered on (pos_x, pos_y) (in pixel units)
    onto an (N, N) periodic grid, axis order grid[ix, iy].

    The exact-overlap redeposit of a shifted unit pixel
    (`Map2DRunner.py:48-83`) reduces to this 4-corner hat deposit.
    Positions are separate component planes (SoA; an (N, d) array is
    tiled T(8, 128) on TPU — 42x+ its logical size).
    """
    x = jnp.mod(pos_x, N)
    y = jnp.mod(pos_y, N)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = x - x0
    fy = y - y0
    v = vals.astype(dtype)
    idx_rows = []
    val_rows = []
    for dx, wx in ((0, 1.0 - fx), (1, fx)):
        for dy, wy in ((0, 1.0 - fy), (1, fy)):
            xi = jnp.mod(x0 + dx, N)
            yi = jnp.mod(y0 + dy, N)
            idx_rows.append(xi * N + yi)
            val_rows.append(v * wx * wy)
    (flat,) = scatter_add_accum((jnp.zeros((N * N,), dtype=dtype),),
                                jnp.concatenate(idx_rows),
                                (jnp.concatenate(val_rows),))
    return flat.reshape(N, N)


def cic_deposit_3d(N, pos_x, pos_y, pos_z, vals, dtype=jnp.float64):
    """3D version of :func:`cic_deposit_2d` onto an (N, N, N) periodic
    grid, axis order grid[ix, iy, iz] (`Map2DRunner.py:119-163`)."""
    x = jnp.mod(pos_x, N)
    y = jnp.mod(pos_y, N)
    z = jnp.mod(pos_z, N)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    z0 = jnp.floor(z).astype(jnp.int32)
    fx = x - x0
    fy = y - y0
    fz = z - z0
    v = vals.astype(dtype)
    idx_rows = []
    val_rows = []
    for dx, wx in ((0, 1.0 - fx), (1, fx)):
        for dy, wy in ((0, 1.0 - fy), (1, fy)):
            for dz, wz in ((0, 1.0 - fz), (1, fz)):
                xi = jnp.mod(x0 + dx, N)
                yi = jnp.mod(y0 + dy, N)
                zi = jnp.mod(z0 + dz, N)
                idx_rows.append((xi * N + yi) * N + zi)
                val_rows.append(v * wx * wy * wz)
    (flat,) = scatter_add_accum((jnp.zeros((N * N * N,), dtype=dtype),),
                                jnp.concatenate(idx_rows),
                                (jnp.concatenate(val_rows),))
    return flat.reshape(N, N, N)
