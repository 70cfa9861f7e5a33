"""Cell-major kernels for the particle-snapshot runner.

The halo-major snapshot path (`snapshot.py`) gathers a K^dim block of
cells x P padded particle slots PER HALO — per-halo AoS gathers plus a
scatter-add of overlapping contributions, both TPU-hostile at scale.
This module inverts the loop like `shell_cellmajor.py` /
`grid_cellmajor.py`:

  1. particles are PADDED PER CELL once per catalog: (ncell, P) SoA
     position planes in cell-list order (slot p of cell c = sorted
     particle start[c] + p), so the pass reads contiguous fixed-shape
     blocks with zero gathers on the particle side;
  2. halos register into every cell their eps_max * R reach may touch
     (cube margin h*sqrt(3)/2 exact), pair sort -> CSR -> dense
     (ncell, K_pad) candidates, cached per catalog per bucket;
  3. one dense pass per bucket: per (cell, slot) ONE packed-record row
     gather, the radial profile row rebuilt by a mass-axis one-hot
     matmul (redshift blended once — snapshot catalogs are
     single-redshift), segment readout, offsets accumulated on the
     (ncell, P) planes. Every output is written exactly once.

Semantics match `_accumulate_particle_offsets` exactly: the halo-major
K^dim cell block always covers the full eps_max * R sphere, so both
formulations reduce to the same r < eps_max * R radial mask.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from .grid_cellmajor import (_blend_rows_M, _segment_readout,
                             table_z_readout_layout, PROP_COL0_SNAP)

__all__ = ["pad_particles_by_cell", "snapshot_offsets_pass"]


def _np_spread3(v):
    v = v.astype(np.int64)
    v = (v | (v << 16)) & 0x030000FF
    v = (v | (v << 8)) & 0x0300F00F
    v = (v | (v << 4)) & 0x030C30C3
    v = (v | (v << 2)) & 0x09249249
    return v


def np_morton3_of_rowmajor(rm, nb):
    """Morton id of each row-major cell id (host numpy)."""
    cx, cyz = rm // (nb * nb), rm % (nb * nb)
    cy, cz = cyz // nb, cyz % nb
    return (_np_spread3(cx) | (_np_spread3(cy) << 1)
            | (_np_spread3(cz) << 2))


def pad_particles_by_cell(tree, coords, P_pad):
    """(ncell * P_pad,) SoA padded position planes (cells in MORTON
    order, matching the Morton registration ids) + per-cell counts +
    the (Np,) map from sorted-particle index to padded slot.

    Host-side, one-time per catalog (numpy; the cell list is already
    host-built). Pad slots hold the cell's first particle position
    (inert: masked by count in the kernel)."""
    ncell = len(tree.cell_count)
    nb = tree.n_cells
    Np = coords.shape[0]
    dim = coords.shape[1]
    srt = coords[tree.order]
    m_of_rm = np_morton3_of_rowmajor(np.arange(ncell), nb)
    counts_rm = np.minimum(tree.cell_count, P_pad).astype(np.int32)
    counts = np.zeros(ncell, dtype=np.int32)
    counts[m_of_rm] = counts_rm
    # sorted index i lives in cell sorted_cid[i] at slot i - start[cell]
    cell_of = tree.sorted_cid
    slot_of = np.arange(Np) - tree.cell_start[cell_of]
    pad_idx = (m_of_rm[cell_of] * P_pad + slot_of).astype(np.int64)
    first_rm = srt[tree.cell_start.clip(0, Np - 1)]       # (ncell, dim)
    planes = np.zeros((dim, ncell * P_pad))
    for d in range(dim):
        base = np.zeros(ncell)
        base[m_of_rm] = first_rm[:, d]
        planes[d] = np.repeat(base, P_pad)
        planes[d, pad_idx] = srt[:, d]
    return planes, counts, pad_idx


@partial(jax.jit, static_argnames=("use_rdelta", "P", "C_blk", "n_hi",
                                   "k_static"))
def snapshot_offsets_pass(use_rdelta, P, C_blk, n_hi,
                          hid_dense, counts_h, px, py, pz, counts_p,
                          packed, gM, table_z, lnr_grid, eps_max,
                          a_scale, L, ox, oy, oz, k_static=None,
                          gprops=()):
    """One bucket's displacement pass over all padded particle slots.

    px, py, pz : (ncell * P,) padded particle-position planes
    counts_p : (ncell,) particles per cell
    packed : (H, 16) [x, y, z, R_com, lnM, lnRc | props...] halo records
    gprops : extra table-axis grids (per-halo coordinates in packed
             cols PROP_COL0_SNAP..)
    a_scale : scalar — d(comoving) * a -> snapshot coordinates
              (`SnapshotRunner.py:228,245`)
    Output: padded offset planes (accumulated onto ox/oy/oz).
    """
    ncell = counts_p.shape[0]
    K_pad = hid_dense.shape[0] // ncell
    n_chunks = ncell // C_blk
    dt = ox.dtype
    g0 = lnr_grid[0]
    dg = lnr_grid[1] - lnr_grid[0]
    table2 = table_z_readout_layout(table_z)
    k_max = jnp.max(counts_h.reshape(n_chunks, C_blk), axis=1)
    slot = jnp.arange(P, dtype=jnp.int32)[None, :]

    def one_chunk(c0):
        s = c0 * (C_blk * P)
        pxc = jax.lax.dynamic_slice_in_dim(px, s, C_blk * P
                                           ).reshape(C_blk, P)
        pyc = jax.lax.dynamic_slice_in_dim(py, s, C_blk * P
                                           ).reshape(C_blk, P)
        pzc = jax.lax.dynamic_slice_in_dim(pz, s, C_blk * P
                                           ).reshape(C_blk, P)
        cnt_h = jax.lax.dynamic_slice_in_dim(counts_h, c0 * C_blk, C_blk)
        cnt_p = jax.lax.dynamic_slice_in_dim(counts_p, c0 * C_blk, C_blk)
        hid_blk = jax.lax.dynamic_slice_in_dim(
            hid_dense, c0 * C_blk * K_pad,
            C_blk * K_pad).reshape(C_blk, K_pad)
        p_ok = slot < cnt_p[:, None]

        def k_body(k, acc):
            ax, ay, az = acc
            ok = (k < cnt_h)
            hid = hid_blk[:, k]
            rec = packed[hid]
            hx = rec[:, 0][:, None]
            hy = rec[:, 1][:, None]
            hz = rec[:, 2][:, None]
            hR = rec[:, 3][:, None]
            hlnR = rec[:, 5][:, None]

            A_T, inb_M = _blend_rows_M(
                rec[:, 4], gM, table2,
                rec[:, PROP_COL0_SNAP:PROP_COL0_SNAP + len(gprops)],
                gprops)

            dx = pxc - hx
            dx = dx - L * jnp.round(dx / L)
            dy = pyc - hy
            dy = dy - L * jnp.round(dy / L)
            dz = pzc - hz
            dz = dz - L * jnp.round(dz / L)
            r = jnp.sqrt(dx * dx + dy * dy + dz * dz)
            lnr = jnp.log(jnp.maximum(r, 1e-30))
            rad = lnr - hlnR if use_rdelta else lnr
            t = (rad - g0) / dg
            d = _segment_readout(A_T, t, n_hi)
            d = jnp.where((rad >= g0) & (rad <= lnr_grid[n_hi - 1]),
                          d, 0.0)
            d = jnp.where(r < eps_max * hR, d, 0.0)
            live = ok & inb_M
            d = jnp.where(p_ok & live[:, None] & jnp.isfinite(d),
                          d, 0.0) * a_scale
            scale = d / jnp.maximum(r, 1e-30)
            return (ax + scale * dx, ay + scale * dy, az + scale * dz)

        z = pxc * jnp.zeros((), dtype=dt)
        upper = k_max[c0] if k_static is None else k_static
        bx, by, bz = jax.lax.fori_loop(0, upper, k_body, (z, z, z))
        return bx.reshape(-1), by.reshape(-1), bz.reshape(-1)

    bx, by, bz = jax.lax.map(one_chunk, jnp.arange(n_chunks))
    n = ncell * P
    return (ox + bx.reshape(n), oy + by.reshape(n), oz + bz.reshape(n))
