"""Cell-major kernels for the 3D grid runners: the TPU-native formulation.

The windowed halo-major grid path (`grid.py`, mirroring the reference's
per-halo cutouts in `Map2DRunner.py:394-423`) performs one (W^3) cutout
gather + scatter-add per halo — scatter-dominated on TPU exactly like
the shell's halo-major path was. This module inverts the loop the same
way `shell_cellmajor.py` does for HEALPix shells:

  1. voxels are processed in BLOCK-major order (B^3-voxel cubes), so all
     F = B^3 voxels of a block are one contiguous run;
  2. halos register into every block their reach can touch (cube
     geometry makes the conservative margin exact: block half-diagonal
     sqrt(3)/2 * B * res), one pair sort -> CSR -> dense (ncell, K_pad)
     candidate matrix, cached per catalog;
  3. one dense pass per bucket: per (block, slot) ONE row gather of the
     halo's packed record, the radial profile row rebuilt by a one-hot
     matmul over the mass axis (the redshift axis is blended ONCE per
     pass — grid catalogs are single-redshift), and the same
     segment-basis radial readout as the shell kernels.

Semantics match the halo-major path bit-for-bit, including the
reference's per-bucket cutout clipping: a halo only touches voxels
whose per-axis index lies in the [x_cen - half, x_cen + half) window
around its nearest bin (`Map2DRunner.py:394-423` pick_indices), so the
per-axis window test rides along in the kernel masks.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["block_perm", "register_halos_grid", "blend_table_z",
           "grid_offsets_pass", "grid_paint_pass", "pick_block_size",
           "block_perm_2d", "register_halos_grid_2d",
           "refine_block_candidates_2d", "grid_offsets_pass_2d",
           "grid_paint_pass_2d", "grid_anis_paint_pass_2d",
           "morton2", "demorton2"]


def _spread3(v):
    """Spread the low 10 bits of v to every third bit (3D Morton)."""
    v = (v | (v << 16)) & jnp.int32(0x030000FF)
    v = (v | (v << 8)) & jnp.int32(0x0300F00F)
    v = (v | (v << 4)) & jnp.int32(0x030C30C3)
    v = (v | (v << 2)) & jnp.int32(0x09249249)
    return v


def _compact3(v):
    """Inverse of _spread3."""
    v = v & jnp.int32(0x09249249)
    v = (v | (v >> 2)) & jnp.int32(0x030C30C3)
    v = (v | (v >> 4)) & jnp.int32(0x0300F00F)
    v = (v | (v >> 8)) & jnp.int32(0x030000FF)
    v = (v | (v >> 16)) & jnp.int32(0x000003FF)
    return v


def morton3(x, y, z):
    """Z-order (Morton) id of 3D integer coordinates (< 1024 each).

    Morton order is the cube analog of HEALPix NESTED: consecutive ids
    are spatially compact (so per-chunk candidate bounds stay local —
    row-major chunks are box-spanning slabs whose k_max is the global
    max), and it is hierarchical — the 8 children of block b at the
    next finer level are ids 8b..8b+7, which makes refinement a
    contiguous row repeat."""
    return (_spread3(x) | (_spread3(y) << 1) | (_spread3(z) << 2))


def demorton3(c):
    """Morton id -> (x, y, z)."""
    return _compact3(c), _compact3(c >> 1), _compact3(c >> 2)


def pick_block_size(N, reach_vox):
    """Block edge (voxels): blocks-per-axis nb must be a power of two
    (Morton ids) dividing N; edge B = N/nb ~ max reach, B >= 4."""
    nb = 1
    while (nb * 2 <= N // 4 and N % (nb * 2) == 0
           and N // (nb * 2) >= max(reach_vox, 4.0)):
        nb *= 2
    return N // nb


@partial(jax.jit, static_argnames=("N", "B"))
def block_perm(N, B):
    """(N^3,) int32: row-major voxel id of each block-major position.

    Block-major position i = b * B^3 + f with b the MORTON id of the
    block coords (see morton3) and f = (ox*B + oy)*B + oz; row-major
    voxel id = (x*N + y)*N + z."""
    F = B * B * B
    i = jnp.arange(N * N * N, dtype=jnp.int32)
    b, f = i // F, i % F
    bx, by, bz = demorton3(b)
    ox, oyz = f // (B * B), f % (B * B)
    oy, oz = oyz // B, oyz % B
    return ((bx * B + ox) * N + (by * B + oy)) * N + (bz * B + oz)


@partial(jax.jit, static_argnames=("nb", "W"))
def register_halos_grid(nb, W, L, xh, yh, zh, reach):
    """Register halos into every B^3-voxel block their reach may touch.

    nb : blocks per axis; W : static window (blocks per axis per halo)
    xh, yh, zh : (H,) halo positions (box coords, [0, L))
    reach : (H,) search radius + sqrt(3)/2 block-edge margin (box units);
            reach < 0 marks shape padding (registers nothing)
    Returns (hids_sorted, cell_start (ncell+1,), K) like
    shell_gather._register_halos. One compile per (nb, W).
    """
    H = xh.shape[0]
    hb = L / nb
    nc = nb * nb * nb
    w = jnp.arange(W, dtype=jnp.int32) - (W - 1) // 2

    def one(x0, y0, z0, rr):
        c0x = jnp.floor(x0 / hb).astype(jnp.int32)
        c0y = jnp.floor(y0 / hb).astype(jnp.int32)
        c0z = jnp.floor(z0 / hb).astype(jnp.int32)
        bx = jnp.mod(c0x + w, nb)
        by = jnp.mod(c0y + w, nb)
        bz = jnp.mod(c0z + w, nb)
        # per-axis min-image distance from halo to block-center plane
        def ax_ok(b, x0_):
            ctr = (b.astype(x0_.dtype) + 0.5) * hb
            d = ctr - x0_
            d = d - L * jnp.round(d / L)
            return jnp.abs(d) <= rr + 0.5 * hb
        okx = ax_ok(bx, x0)
        oky = ax_ok(by, y0)
        okz = ax_ok(bz, z0)
        cells = morton3(bx[:, None, None], by[None, :, None],
                        bz[None, None, :])
        ok = (okx[:, None, None] & oky[None, :, None]
              & okz[None, None, :] & (rr >= 0))
        return cells.reshape(-1), ok.reshape(-1)

    cells, valid = jax.vmap(one)(xh, yh, zh, reach)
    cells = jnp.where(valid, cells, nc).reshape(-1).astype(jnp.int32)
    hids = jnp.broadcast_to(jnp.arange(H, dtype=jnp.int32)[:, None],
                            valid.shape).reshape(-1)
    cells_s, hids_s = jax.lax.sort((cells, hids), num_keys=1)
    cell_start = jnp.searchsorted(cells_s,
                                  jnp.arange(nc + 1, dtype=jnp.int32)
                                  ).astype(jnp.int32)
    counts = cell_start[1:] - cell_start[:-1]
    return hids_s, cell_start, jnp.max(counts)


@partial(jax.jit, static_argnames=("nb_child",))
def refine_block_candidates(nb_child, dense_parent, counts_parent,
                            hrec, hb_child, L):
    """Split blocks 2x finer per axis and re-filter each parent list.

    Registration margins add ~hb/2 per axis to the halo reach; at the
    natural level (hb ~ reach) that inflates K — which the pass's work
    is proportional to — by ~(3/2)^3. Each refinement level halves the
    margin (the cube analog of shell_cellmajor.refine_cell_candidates,
    with closed-form child centers).

    dense_parent : ((nb_child/2)^3 * K_pad,) Morton block candidates
    hrec : (H, 16) records — cols 0..2 = box positions, col 3 = the
           PER-HALO per-axis reach (min(bucket window, eps_max * R):
           the radial cutoff zeroes everything beyond each halo's own
           reach, so small halos in a wide bucket drop out of far
           blocks)
    Returns (dense_child (nc_child, K_pad), counts_child, K_dev).
    """
    nbp = nb_child // 2
    K_pad = dense_parent.shape[0] // (nbp ** 3)
    nc = nb_child ** 3
    dt = hrec.dtype
    k = jnp.arange(K_pad, dtype=jnp.int32)[None, :]
    dense_p2d = dense_parent.reshape(nbp ** 3, K_pad)

    # chunk over child cells: the (Cc * K_pad, 16) record gather is the
    # memory hot spot (a full-size gather is ~GBs at 1e7-particle cell
    # counts); Cc stays a multiple of 8 so chunks align with parents
    n_chunks = 1
    while (nc // n_chunks) * K_pad > (1 << 22) \
            and (nc // n_chunks) % 16 == 0:
        n_chunks *= 2
    Cc = nc // n_chunks

    def one_chunk(ci):
        c0 = ci * Cc
        c = c0 + jnp.arange(Cc, dtype=jnp.int32)
        cx, cy, cz = demorton3(c)
        # Morton is hierarchical: children of parent b are ids 8b..8b+7
        par = jax.lax.dynamic_slice_in_dim(dense_p2d, c0 // 8, Cc // 8)
        hid = jnp.repeat(par, 8, axis=0)
        cnt = jnp.repeat(jax.lax.dynamic_slice_in_dim(
            counts_parent, c0 // 8, Cc // 8), 8)
        rec = hrec[hid.reshape(-1)]
        lim = rec[:, 3].reshape(Cc, K_pad) + 0.5 * hb_child

        def ax_ok(ci_, col):
            ctr = (ci_.astype(dt) + 0.5) * hb_child
            d = ctr[:, None] - rec[:, col].reshape(Cc, K_pad)
            d = d - L * jnp.round(d / L)
            return jnp.abs(d) <= lim

        ok = (k < cnt[:, None]) & ax_ok(cx, 0) & ax_ok(cy, 1) \
            & ax_ok(cz, 2)
        keys = jnp.where(ok, k, K_pad + k)
        _, hid_s = jax.lax.sort((keys, hid), num_keys=1)
        return hid_s, jnp.sum(ok, axis=1).astype(jnp.int32)

    hid_s, counts_child = jax.lax.map(one_chunk,
                                      jnp.arange(n_chunks))
    hid_s = hid_s.reshape(nc, K_pad)
    counts_child = counts_child.reshape(nc)
    return hid_s, counts_child, jnp.max(counts_child)


def blend_table_z(table, gz, z_coord):
    """Blend the (Nz, NM, Nr [, P...]) table down to (NM, Nr [, P...])
    at the catalog's single log(1+z) coordinate (linear, matching
    ndlinear_interp's z axis). Returns (table_z, inb_z)."""
    g = gz
    i = jnp.clip(jnp.searchsorted(g, z_coord, side="right") - 1, 0,
                 g.shape[0] - 2)
    t = (z_coord - g[i]) / (g[i + 1] - g[i])
    inb = (z_coord >= g[0]) & (z_coord <= g[-1])
    tz = (1.0 - t) * table[i] + t * table[i + 1]
    return tz, inb


# packed-record column where extra table-axis coordinates start, per
# kernel family (cols before it are geometry; 16-wide records)
PROP_COL0_3D = 9      # grid 3D: [x y z R lnM lnR cenx ceny cenz | props]
PROP_COL0_2D = 11     # grid 2D: [x y R lnM lnR cenx ceny Rm00..Rm11 | props]
PROP_COL0_SNAP = 6    # snapshot: [x y z R lnM lnR | props]
ANIS_HALF_COL_2D = 15  # anis paint: per-halo cutout half-window (last col)
MAX_PROPS_3D = 16 - PROP_COL0_3D
MAX_PROPS_2D = 16 - PROP_COL0_2D
MAX_PROPS_ANIS_2D = ANIS_HALF_COL_2D - PROP_COL0_2D
MAX_PROPS_SNAP = 16 - PROP_COL0_SNAP


def table_z_readout_layout(table_z):
    """(NM, Nr [, P...]) z-blended table -> (Nr, NM * prod(P)) readout
    layout: the radial axis becomes the matmul row axis, the mass and
    extra-param axes merge into ONE contraction axis (C-order matching
    shell_cellmajor.combined_axis_weights). One relayout per pass."""
    nd = table_z.ndim
    t = jnp.transpose(table_z, (1, 0) + tuple(range(2, nd)))
    return t.reshape(t.shape[0], -1)


def _blend_rows_M(lnM, gM, table2, props=None, gprops=()):
    """One-hot (mass x extra-axis) blend: (C,) slot masses (+ per-slot
    prop coordinates, (C, n_props)) -> (Nr, C) profile rows from the
    readout-layout table (see table_z_readout_layout; same arithmetic
    as ops.interp.blend_table_radial's non-z axes)."""
    from .shell_cellmajor import axis_weights, combined_axis_weights
    WM, inb_M = axis_weights(gM, lnM)
    if gprops:
        V_T, inb_p = combined_axis_weights(WM, props, gprops, 0)
        inb_M = inb_M & inb_p
    else:
        V_T = WM.T
    A_T = table2 @ V_T
    return A_T, inb_M


def _segment_readout(A_T, t, n_hi):
    tc = jnp.clip(t, 0.0, float(n_hi - 1))
    d = jnp.broadcast_to(A_T[0][:, None], t.shape)
    for n_node in range(n_hi - 1):
        seg = jnp.clip(tc - float(n_node), 0.0, 1.0)
        d = d + seg * (A_T[n_node + 1] - A_T[n_node])[:, None]
    return d


def _hat_readout(A_T, t, n_hi):
    tc = jnp.clip(t, 0.0, float(n_hi - 1))
    d = jnp.zeros_like(t)
    for n_node in range(n_hi):
        w = jnp.maximum(0.0, 1.0 - jnp.abs(tc - n_node))
        d = d + w * A_T[n_node][:, None]
    return d


def _voxel_planes(c0, C_blk, B, nb, bins0, res, dt, block0=0):
    """(C, F) voxel-center coordinates for one chunk of MORTON-ordered
    blocks (consecutive ids are spatially compact, so the chunk-local
    candidate bound k_max stays local). ``block0`` offsets the GLOBAL
    block id — under shard_map each device passes its shard's base."""
    F = B * B * B
    b = block0 + c0 * C_blk + jnp.arange(C_blk, dtype=jnp.int32)
    bx, by, bz = demorton3(b)
    f = jnp.arange(F, dtype=jnp.int32)
    ox, oyz = f // (B * B), f % (B * B)
    oy, oz = oyz // B, oyz % B
    ix = bx[:, None] * B + ox[None, :]
    iy = by[:, None] * B + oy[None, :]
    iz = bz[:, None] * B + oz[None, :]
    xv = bins0 + ix.astype(dt) * res
    yv = bins0 + iy.astype(dt) * res
    zv = bins0 + iz.astype(dt) * res
    return (ix, iy, iz), (xv, yv, zv)


def _window_ok(iv, cen, half, N):
    """Reference cutout-window test: voxel index iv is inside the
    2*half window starting at cen - half (periodic), per axis."""
    return jnp.mod(iv - (cen - half), N) < 2 * half


@partial(jax.jit, static_argnames=("use_rdelta", "B", "C_blk", "n_hi",
                                   "N", "half", "k_static"))
def grid_offsets_pass(use_rdelta, B, C_blk, n_hi, N, half,
                      hid_dense, counts, packed, gM, table_z, lnr_grid,
                      eps_max, L, res, bins0, ox_o, oy_o, oz_o,
                      k_static=None, block0=0, gprops=()):
    """One bucket's displacement pass over all voxels in block-major
    order.

    packed : (H, 16) [x, y, z, R_com, lnM, lnRc, cen_x, cen_y, cen_z,
             pad...] — nearest-bin indices ride as floats (exact for
             N <= 4096); see the runner's _grid_packed_records
    table_z : (NM, Nr) z-blended displacement table (non-finite nodes
              pre-sanitized to 0 by the caller)
    half : the bucket's cutout half-window (voxels) — reproduces the
           halo-major path's per-bucket window clipping exactly
    Output: block-major offset planes in PIXEL units (accumulated).
    """
    nb = N // B
    F = B * B * B
    ncell = counts.shape[0]
    K_pad = hid_dense.shape[0] // ncell
    n_chunks = ncell // C_blk
    dt = ox_o.dtype
    g0 = lnr_grid[0]
    dg = lnr_grid[1] - lnr_grid[0]
    table2 = table_z_readout_layout(table_z)
    k_max = jnp.max(counts.reshape(n_chunks, C_blk), axis=1)

    def one_chunk(c0):
        (ix, iy, iz), (xv, yv, zv) = _voxel_planes(c0, C_blk, B, nb,
                                                   bins0, res, dt,
                                                   block0=block0)
        cnt = jax.lax.dynamic_slice_in_dim(counts, c0 * C_blk, C_blk)
        hid_blk = jax.lax.dynamic_slice_in_dim(
            hid_dense, c0 * C_blk * K_pad,
            C_blk * K_pad).reshape(C_blk, K_pad)

        def k_body(k, acc):
            ax, ay, az = acc
            ok = (k < cnt)
            hid = hid_blk[:, k]
            rec = packed[hid]                            # (C, 16)
            hx = rec[:, 0][:, None]
            hy = rec[:, 1][:, None]
            hz = rec[:, 2][:, None]
            hR = rec[:, 3][:, None]
            hlnR = rec[:, 5][:, None]
            cenx = rec[:, 6][:, None].astype(jnp.int32)
            ceny = rec[:, 7][:, None].astype(jnp.int32)
            cenz = rec[:, 8][:, None].astype(jnp.int32)

            A_T, inb_M = _blend_rows_M(
                rec[:, 4], gM, table2,
                rec[:, PROP_COL0_3D:PROP_COL0_3D + len(gprops)], gprops)

            dx = xv - hx
            dx = dx - L * jnp.round(dx / L)
            dy = yv - hy
            dy = dy - L * jnp.round(dy / L)
            dz = zv - hz
            dz = dz - L * jnp.round(dz / L)
            r = jnp.sqrt(dx * dx + dy * dy + dz * dz)
            lnr = jnp.log(jnp.maximum(r, 1e-30))
            rad = lnr - hlnR if use_rdelta else lnr
            t = (rad - g0) / dg
            d = _segment_readout(A_T, t, n_hi)
            d = jnp.where((rad >= g0) & (rad <= lnr_grid[n_hi - 1]),
                          d, 0.0)
            d = jnp.where(r < eps_max * hR, d, 0.0)
            win = (_window_ok(ix, cenx, half, N)
                   & _window_ok(iy, ceny, half, N)
                   & _window_ok(iz, cenz, half, N))
            live = ok & inb_M
            d = jnp.where(win & live[:, None] & jnp.isfinite(d), d, 0.0)
            scale = (d / res) / jnp.maximum(r, 1e-30)
            return (ax + scale * dx, ay + scale * dy, az + scale * dz)

        z = xv * jnp.zeros((), dtype=dt)
        upper = k_max[c0] if k_static is None else k_static
        bx_, by_, bz_ = jax.lax.fori_loop(0, upper, k_body, (z, z, z))
        return bx_.reshape(-1), by_.reshape(-1), bz_.reshape(-1)

    bx_, by_, bz_ = jax.lax.map(one_chunk, jnp.arange(n_chunks))
    # accumulator length, NOT N^3: under shard_map each device owns
    # ncell_local * F voxels
    nvox = ox_o.shape[0]
    return (ox_o + bx_.reshape(nvox), oy_o + by_.reshape(nvox),
            oz_o + bz_.reshape(nvox))


@partial(jax.jit, static_argnames=("B", "C_blk", "n_hi", "N", "half",
                                   "k_static"))
def grid_paint_pass(B, C_blk, n_hi, N, half,
                    hid_dense, counts, packed, gM, table_z, lnr_grid,
                    eps_max, L, res, bins0, new_map, k_static=None,
                    block0=0, gprops=()):
    """Cell-major painting pass over a 3D grid (log-profile table_z —
    non-finite nodes pre-sanitized to -1e30 by the caller; exp readout
    via the hat form, which keeps huge sentinels inert)."""
    nb = N // B
    F = B * B * B
    ncell = counts.shape[0]
    K_pad = hid_dense.shape[0] // ncell
    n_chunks = ncell // C_blk
    dt = new_map.dtype
    g0 = lnr_grid[0]
    dg = lnr_grid[1] - lnr_grid[0]
    table2 = table_z_readout_layout(table_z)
    k_max = jnp.max(counts.reshape(n_chunks, C_blk), axis=1)

    def one_chunk(c0):
        (ix, iy, iz), (xv, yv, zv) = _voxel_planes(c0, C_blk, B, nb,
                                                   bins0, res, dt,
                                                   block0=block0)
        cnt = jax.lax.dynamic_slice_in_dim(counts, c0 * C_blk, C_blk)
        hid_blk = jax.lax.dynamic_slice_in_dim(
            hid_dense, c0 * C_blk * K_pad,
            C_blk * K_pad).reshape(C_blk, K_pad)

        def k_body(k, acc):
            ok = (k < cnt)
            hid = hid_blk[:, k]
            rec = packed[hid]
            hx = rec[:, 0][:, None]
            hy = rec[:, 1][:, None]
            hz = rec[:, 2][:, None]
            hR = rec[:, 3][:, None]
            cenx = rec[:, 6][:, None].astype(jnp.int32)
            ceny = rec[:, 7][:, None].astype(jnp.int32)
            cenz = rec[:, 8][:, None].astype(jnp.int32)

            A_T, inb_M = _blend_rows_M(
                rec[:, 4], gM, table2,
                rec[:, PROP_COL0_3D:PROP_COL0_3D + len(gprops)], gprops)

            dx = xv - hx
            dx = dx - L * jnp.round(dx / L)
            dy = yv - hy
            dy = dy - L * jnp.round(dy / L)
            dz = zv - hz
            dz = dz - L * jnp.round(dz / L)
            r = jnp.maximum(jnp.sqrt(dx * dx + dy * dy + dz * dz), 1e-30)
            lnr = jnp.log(r)
            t = (lnr - g0) / dg
            paint = jnp.exp(_hat_readout(A_T, t, n_hi))
            paint = jnp.where((lnr >= g0) & (lnr <= lnr_grid[n_hi - 1]),
                              paint, 0.0)
            paint = jnp.where(r < eps_max * hR, paint, 0.0)
            win = (_window_ok(ix, cenx, half, N)
                   & _window_ok(iy, ceny, half, N)
                   & _window_ok(iz, cenz, half, N))
            live = ok & inb_M
            paint = jnp.where(win & live[:, None]
                              & jnp.isfinite(paint), paint, 0.0)
            return acc + paint

        z = xv * jnp.zeros((), dtype=dt)
        upper = k_max[c0] if k_static is None else k_static
        out = jax.lax.fori_loop(0, upper, k_body, z)
        return out.reshape(-1)

    out = jax.lax.map(one_chunk, jnp.arange(n_chunks))
    return new_map + out.reshape(new_map.shape[0])


# ---------------------------------------------------------------------------
# 2D (flat-sky map) variants: the map-level method of Anbajagane+24
# (reference `Map2DRunner.py:425-615` 2D branch). Same design as the 3D
# kernels — Morton blocks, registration + refinement, dense per-bucket
# passes — with the galsim-style shear matrix riding IN the packed halo
# records: the displacement/paint magnitude reads at the ELLIPTICAL
# radius while displacement pushes along the CIRCULAR unit vector
# (`Map2DRunner.py:518-536`), and an identity matrix makes the isotropic
# case the same code path (4 extra FMAs per element).
# ---------------------------------------------------------------------------


def _spread2(v):
    """Spread the low 16 bits of v to every other bit (2D Morton)."""
    v = (v | (v << 8)) & jnp.int32(0x00FF00FF)
    v = (v | (v << 4)) & jnp.int32(0x0F0F0F0F)
    v = (v | (v << 2)) & jnp.int32(0x33333333)
    v = (v | (v << 1)) & jnp.int32(0x55555555)
    return v


def _compact2(v):
    """Inverse of _spread2."""
    v = v & jnp.int32(0x55555555)
    v = (v | (v >> 1)) & jnp.int32(0x33333333)
    v = (v | (v >> 2)) & jnp.int32(0x0F0F0F0F)
    v = (v | (v >> 4)) & jnp.int32(0x00FF00FF)
    v = (v | (v >> 8)) & jnp.int32(0x0000FFFF)
    return v


def morton2(x, y):
    """Z-order id of 2D integer coords (< 65536 each); children of block
    b at the next finer level are ids 4b..4b+3."""
    return _spread2(x) | (_spread2(y) << 1)


def demorton2(c):
    """Morton id -> (x, y)."""
    return _compact2(c), _compact2(c >> 1)


@partial(jax.jit, static_argnames=("N", "B"))
def block_perm_2d(N, B):
    """(N^2,) int32: row-major pixel id of each block-major position
    (b = MORTON id of block coords, f = ox*B + oy; pixel id x*N + y)."""
    F = B * B
    i = jnp.arange(N * N, dtype=jnp.int32)
    b, f = i // F, i % F
    bx, by = demorton2(b)
    ox, oy = f // B, f % B
    return (bx * B + ox) * N + (by * B + oy)


@partial(jax.jit, static_argnames=("nb", "W"))
def register_halos_grid_2d(nb, W, L, xh, yh, reach):
    """2D analog of register_halos_grid: halos register into every
    B^2-pixel block within per-axis min-image reach + half block edge.
    reach < 0 marks shape padding. Returns (hids_sorted, cell_start, K).
    """
    H = xh.shape[0]
    hb = L / nb
    nc = nb * nb
    w = jnp.arange(W, dtype=jnp.int32) - (W - 1) // 2

    def one(x0, y0, rr):
        c0x = jnp.floor(x0 / hb).astype(jnp.int32)
        c0y = jnp.floor(y0 / hb).astype(jnp.int32)
        bx = jnp.mod(c0x + w, nb)
        by = jnp.mod(c0y + w, nb)

        def ax_ok(b, x0_):
            ctr = (b.astype(x0_.dtype) + 0.5) * hb
            d = ctr - x0_
            d = d - L * jnp.round(d / L)
            return jnp.abs(d) <= rr + 0.5 * hb

        okx = ax_ok(bx, x0)
        oky = ax_ok(by, y0)
        cells = morton2(bx[:, None], by[None, :])
        ok = okx[:, None] & oky[None, :] & (rr >= 0)
        return cells.reshape(-1), ok.reshape(-1)

    cells, valid = jax.vmap(one)(xh, yh, reach)
    cells = jnp.where(valid, cells, nc).reshape(-1).astype(jnp.int32)
    hids = jnp.broadcast_to(jnp.arange(H, dtype=jnp.int32)[:, None],
                            valid.shape).reshape(-1)
    cells_s, hids_s = jax.lax.sort((cells, hids), num_keys=1)
    cell_start = jnp.searchsorted(cells_s,
                                  jnp.arange(nc + 1, dtype=jnp.int32)
                                  ).astype(jnp.int32)
    counts = cell_start[1:] - cell_start[:-1]
    return hids_s, cell_start, jnp.max(counts)


@partial(jax.jit, static_argnames=("nb_child",))
def refine_block_candidates_2d(nb_child, dense_parent, counts_parent,
                               hrec, hb_child, L):
    """2D analog of refine_block_candidates (children of parent b are
    Morton ids 4b..4b+3). hrec cols 0,1 = positions, col 3 = per-halo
    per-axis reach (matching the 3D layout so runners share staging)."""
    nbp = nb_child // 2
    K_pad = dense_parent.shape[0] // (nbp ** 2)
    nc = nb_child ** 2
    dt = hrec.dtype
    k = jnp.arange(K_pad, dtype=jnp.int32)[None, :]
    dense_p2d = dense_parent.reshape(nbp ** 2, K_pad)

    n_chunks = 1
    while (nc // n_chunks) * K_pad > (1 << 22) \
            and (nc // n_chunks) % 8 == 0:
        n_chunks *= 2
    Cc = nc // n_chunks

    def one_chunk(ci):
        c0 = ci * Cc
        c = c0 + jnp.arange(Cc, dtype=jnp.int32)
        cx, cy = demorton2(c)
        par = jax.lax.dynamic_slice_in_dim(dense_p2d, c0 // 4, Cc // 4)
        hid = jnp.repeat(par, 4, axis=0)
        cnt = jnp.repeat(jax.lax.dynamic_slice_in_dim(
            counts_parent, c0 // 4, Cc // 4), 4)
        rec = hrec[hid.reshape(-1)]
        lim = rec[:, 3].reshape(Cc, K_pad) + 0.5 * hb_child

        def ax_ok(ci_, col):
            ctr = (ci_.astype(dt) + 0.5) * hb_child
            d = ctr[:, None] - rec[:, col].reshape(Cc, K_pad)
            d = d - L * jnp.round(d / L)
            return jnp.abs(d) <= lim

        ok = (k < cnt[:, None]) & ax_ok(cx, 0) & ax_ok(cy, 1)
        keys = jnp.where(ok, k, K_pad + k)
        _, hid_s = jax.lax.sort((keys, hid), num_keys=1)
        return hid_s, jnp.sum(ok, axis=1).astype(jnp.int32)

    hid_s, counts_child = jax.lax.map(one_chunk, jnp.arange(n_chunks))
    return (hid_s.reshape(nc, K_pad), counts_child.reshape(nc),
            jnp.max(counts_child))


def _pixel_planes_2d(c0, C_blk, B, bins0, res, dt, block0=0):
    """(C, F) pixel-center coordinates for one chunk of Morton blocks."""
    F = B * B
    b = block0 + c0 * C_blk + jnp.arange(C_blk, dtype=jnp.int32)
    bx, by = demorton2(b)
    f = jnp.arange(F, dtype=jnp.int32)
    ox, oy = f // B, f % B
    ix = bx[:, None] * B + ox[None, :]
    iy = by[:, None] * B + oy[None, :]
    xv = bins0 + ix.astype(dt) * res
    yv = bins0 + iy.astype(dt) * res
    return (ix, iy), (xv, yv)


@partial(jax.jit, static_argnames=("use_rdelta", "B", "C_blk", "n_hi",
                                   "N", "half", "k_static"))
def grid_offsets_pass_2d(use_rdelta, B, C_blk, n_hi, N, half,
                         hid_dense, counts, packed, gM, table_z, lnr_grid,
                         eps_max, L, res, bins0, ox_o, oy_o,
                         k_static=None, block0=0, gprops=()):
    """One bucket's 2D displacement pass in block-major order.

    packed : (H, 16) [x, y, R_com, lnM, lnRc, cen_x, cen_y,
             Rm00, Rm01, Rm10, Rm11, pad...] — the shear matrix maps
             pixel offsets to the elliptical-radius frame (identity for
             isotropic halos); displacement reads at the elliptical
             radius and pushes along the circular unit vector.
    Output: block-major (ox, oy) offset planes in PIXEL units.
    """
    ncell = counts.shape[0]
    K_pad = hid_dense.shape[0] // ncell
    n_chunks = ncell // C_blk
    dt = ox_o.dtype
    g0 = lnr_grid[0]
    dg = lnr_grid[1] - lnr_grid[0]
    table2 = table_z_readout_layout(table_z)
    k_max = jnp.max(counts.reshape(n_chunks, C_blk), axis=1)

    def one_chunk(c0):
        (ix, iy), (xv, yv) = _pixel_planes_2d(c0, C_blk, B, bins0, res,
                                              dt, block0=block0)
        cnt = jax.lax.dynamic_slice_in_dim(counts, c0 * C_blk, C_blk)
        hid_blk = jax.lax.dynamic_slice_in_dim(
            hid_dense, c0 * C_blk * K_pad,
            C_blk * K_pad).reshape(C_blk, K_pad)

        def k_body(k, acc):
            ax, ay = acc
            ok = (k < cnt)
            hid = hid_blk[:, k]
            rec = packed[hid]
            hx = rec[:, 0][:, None]
            hy = rec[:, 1][:, None]
            hR = rec[:, 2][:, None]
            hlnR = rec[:, 4][:, None]
            cenx = rec[:, 5][:, None].astype(jnp.int32)
            ceny = rec[:, 6][:, None].astype(jnp.int32)
            Rm00 = rec[:, 7][:, None]
            Rm01 = rec[:, 8][:, None]
            Rm10 = rec[:, 9][:, None]
            Rm11 = rec[:, 10][:, None]

            A_T, inb_M = _blend_rows_M(
                rec[:, 3], gM, table2,
                rec[:, PROP_COL0_2D:PROP_COL0_2D + len(gprops)], gprops)

            dx = xv - hx
            dx = dx - L * jnp.round(dx / L)
            dy = yv - hy
            dy = dy - L * jnp.round(dy / L)
            ex = Rm00 * dx + Rm10 * dy
            ey = Rm01 * dx + Rm11 * dy
            r_ell = jnp.sqrt(ex * ex + ey * ey)
            r_c = jnp.sqrt(dx * dx + dy * dy)
            lnr = jnp.log(jnp.maximum(r_ell, 1e-30))
            rad = lnr - hlnR if use_rdelta else lnr
            t = (rad - g0) / dg
            d = _segment_readout(A_T, t, n_hi)
            d = jnp.where((rad >= g0) & (rad <= lnr_grid[n_hi - 1]),
                          d, 0.0)
            d = jnp.where(r_ell < eps_max * hR, d, 0.0)
            win = (_window_ok(ix, cenx, half, N)
                   & _window_ok(iy, ceny, half, N))
            live = ok & inb_M
            d = jnp.where(win & live[:, None] & jnp.isfinite(d), d, 0.0)
            scale = (d / res) / jnp.maximum(r_c, 1e-30)
            return (ax + scale * dx, ay + scale * dy)

        z = xv * jnp.zeros((), dtype=dt)
        upper = k_max[c0] if k_static is None else k_static
        bx_, by_ = jax.lax.fori_loop(0, upper, k_body, (z, z))
        return bx_.reshape(-1), by_.reshape(-1)

    bx_, by_ = jax.lax.map(one_chunk, jnp.arange(n_chunks))
    npix = ox_o.shape[0]
    return (ox_o + bx_.reshape(npix), oy_o + by_.reshape(npix))


@partial(jax.jit, static_argnames=("B", "C_blk", "n_hi", "N",
                                   "k_static"))
def grid_anis_paint_pass_2d(B, C_blk, n_hi, N,
                            hid_dense, counts, packed, gM, table_q,
                            lnq_grid, eps_max, L, res, bins0, canvas,
                            new_map, k_static=None, block0=0, gprops=()):
    """Cell-major density-dependent (anisotropic) painting pass: the
    TPU formulation of the reference's Canvas -> Paint monotone remap
    (`Map2DRunner.py:818-940`, host loop in
    ``PaintProfilesAnisGrid.process``).

    Identical machinery to :func:`grid_paint_pass_2d` with ONE change:
    the readout coordinate is the log of the EXISTING map value
    (``canvas``, block-major like ``new_map``), not the log radius —
    painting y(delta) instead of y(r). ``table_q`` holds ln Paint
    resampled onto the uniform global ln Canvas grid ``lnq_grid`` per
    (M [, prop...]) node, PLUS two extra rows (indices n_hi, n_hi + 1)
    carrying each node's valid [lnC_min, lnC_max] canvas range (readout
    layout, see :func:`table_z_readout_layout`). The range rows blend
    with the same one-hot weights as the profile rows, so the per-slot
    range test reproduces the reference's per-halo NaN -> masked-zero
    interp domain exactly at the table nodes. Both the radial cutoff
    r < eps_max * R and the cutout window measure from the halo's
    NEAREST BIN CENTER, as the reference's cutout radius grid does
    (`Map2DRunner.py:890-905`; circular — the remap has no ellipticity
    branch). The window half-width is PER HALO (packed column
    ``ANIS_HALF_COL_2D``), matching the host loop's per-halo
    ``Nsize[j] // 2`` cutout — a shared bucket-max window would paint
    pixels outside a smaller halo's cutout square that still pass its
    circular r < eps_max * R test (the remap value does not decay with
    radius, so such spills are NOT small)."""
    ncell = counts.shape[0]
    K_pad = hid_dense.shape[0] // ncell
    n_chunks = ncell // C_blk
    dt = new_map.dtype
    q0 = lnq_grid[0]
    dq = lnq_grid[1] - lnq_grid[0]
    table2 = table_z_readout_layout(table_q)
    k_max = jnp.max(counts.reshape(n_chunks, C_blk), axis=1)
    F = B * B

    def one_chunk(c0):
        (ix, iy), (xv, yv) = _pixel_planes_2d(c0, C_blk, B, bins0, res,
                                              dt, block0=block0)
        v = jax.lax.dynamic_slice_in_dim(canvas, c0 * C_blk * F,
                                         C_blk * F).reshape(C_blk, F)
        vpos = v > 0
        lnv = jnp.log(jnp.where(vpos, v, 1.0))
        t = (lnv - q0) / dq
        cnt = jax.lax.dynamic_slice_in_dim(counts, c0 * C_blk, C_blk)
        hid_blk = jax.lax.dynamic_slice_in_dim(
            hid_dense, c0 * C_blk * K_pad,
            C_blk * K_pad).reshape(C_blk, K_pad)

        def k_body(k, acc):
            ok = (k < cnt)
            hid = hid_blk[:, k]
            rec = packed[hid]
            hR = rec[:, 2][:, None]
            cenx = rec[:, 5][:, None].astype(jnp.int32)
            ceny = rec[:, 6][:, None].astype(jnp.int32)
            hhalf = rec[:, ANIS_HALF_COL_2D][:, None].astype(jnp.int32)

            A_T, inb_M = _blend_rows_M(
                rec[:, 3], gM, table2,
                rec[:, PROP_COL0_2D:PROP_COL0_2D + len(gprops)], gprops)
            lo = A_T[n_hi][:, None]
            hi = A_T[n_hi + 1][:, None]

            # cutout radius from the nearest bin center (reference
            # builds its radius grid around x_cen, not the halo pos)
            bx = bins0 + cenx.astype(dt) * res
            by = bins0 + ceny.astype(dt) * res
            dx = xv - bx
            dx = dx - L * jnp.round(dx / L)
            dy = yv - by
            dy = dy - L * jnp.round(dy / L)
            r_c = jnp.sqrt(dx * dx + dy * dy)
            paint = jnp.exp(_hat_readout(A_T, t, n_hi))
            paint = jnp.where(vpos & (lnv >= lo) & (lnv <= hi),
                              paint, 0.0)
            paint = jnp.where(r_c < eps_max * hR, paint, 0.0)
            win = (_window_ok(ix, cenx, hhalf, N)
                   & _window_ok(iy, ceny, hhalf, N))
            live = ok & inb_M
            paint = jnp.where(win & live[:, None]
                              & jnp.isfinite(paint), paint, 0.0)
            return acc + paint

        z = xv * jnp.zeros((), dtype=dt)
        upper = k_max[c0] if k_static is None else k_static
        out = jax.lax.fori_loop(0, upper, k_body, z)
        return out.reshape(-1)

    out = jax.lax.map(one_chunk, jnp.arange(n_chunks))
    return new_map + out.reshape(new_map.shape[0])


@partial(jax.jit, static_argnames=("B", "C_blk", "n_hi", "N", "half",
                                   "k_static"))
def grid_paint_pass_2d(B, C_blk, n_hi, N, half,
                       hid_dense, counts, packed, gM, table_z, lnr_grid,
                       eps_max, L, res, bins0, new_map, k_static=None,
                       block0=0, gprops=()):
    """2D cell-major painting pass (projected log-profile table; the
    readout radius is the elliptical one)."""
    ncell = counts.shape[0]
    K_pad = hid_dense.shape[0] // ncell
    n_chunks = ncell // C_blk
    dt = new_map.dtype
    g0 = lnr_grid[0]
    dg = lnr_grid[1] - lnr_grid[0]
    table2 = table_z_readout_layout(table_z)
    k_max = jnp.max(counts.reshape(n_chunks, C_blk), axis=1)

    def one_chunk(c0):
        (ix, iy), (xv, yv) = _pixel_planes_2d(c0, C_blk, B, bins0, res,
                                              dt, block0=block0)
        cnt = jax.lax.dynamic_slice_in_dim(counts, c0 * C_blk, C_blk)
        hid_blk = jax.lax.dynamic_slice_in_dim(
            hid_dense, c0 * C_blk * K_pad,
            C_blk * K_pad).reshape(C_blk, K_pad)

        def k_body(k, acc):
            ok = (k < cnt)
            hid = hid_blk[:, k]
            rec = packed[hid]
            hx = rec[:, 0][:, None]
            hy = rec[:, 1][:, None]
            hR = rec[:, 2][:, None]
            cenx = rec[:, 5][:, None].astype(jnp.int32)
            ceny = rec[:, 6][:, None].astype(jnp.int32)
            Rm00 = rec[:, 7][:, None]
            Rm01 = rec[:, 8][:, None]
            Rm10 = rec[:, 9][:, None]
            Rm11 = rec[:, 10][:, None]

            A_T, inb_M = _blend_rows_M(
                rec[:, 3], gM, table2,
                rec[:, PROP_COL0_2D:PROP_COL0_2D + len(gprops)], gprops)

            dx = xv - hx
            dx = dx - L * jnp.round(dx / L)
            dy = yv - hy
            dy = dy - L * jnp.round(dy / L)
            ex = Rm00 * dx + Rm10 * dy
            ey = Rm01 * dx + Rm11 * dy
            r_ell = jnp.maximum(jnp.sqrt(ex * ex + ey * ey), 1e-30)
            lnr = jnp.log(r_ell)
            t = (lnr - g0) / dg
            paint = jnp.exp(_hat_readout(A_T, t, n_hi))
            paint = jnp.where((lnr >= g0) & (lnr <= lnr_grid[n_hi - 1]),
                              paint, 0.0)
            paint = jnp.where(r_ell < eps_max * hR, paint, 0.0)
            win = (_window_ok(ix, cenx, half, N)
                   & _window_ok(iy, ceny, half, N))
            live = ok & inb_M
            paint = jnp.where(win & live[:, None]
                              & jnp.isfinite(paint), paint, 0.0)
            return acc + paint

        z = xv * jnp.zeros((), dtype=dt)
        upper = k_max[c0] if k_static is None else k_static
        out = jax.lax.fori_loop(0, upper, k_body, z)
        return out.reshape(-1)

    out = jax.lax.map(one_chunk, jnp.arange(n_chunks))
    return new_map + out.reshape(new_map.shape[0])
