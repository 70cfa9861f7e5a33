"""Pixel-major (gather) kernels for the shell runners.

The scatter formulation (runners/shell.py) mirrors the reference's
halo-major loop: every halo pushes its window of pixels, and conflicting
writes meet in a scatter-add. On TPU the sort+scatter step dominates. This
module inverts the loop — the TPU-native formulation:

  1. bucket halos by angular radius (as before);
  2. per bucket, register each halo in every coarse HEALPix cell its disc
     touches (cell size ~ the bucket's max radius), building cell -> halo
     lists with one small sort;
  3. one dense pass over all fine pixels: each pixel gathers its cell's
     candidate halos (fixed K slots, masked), evaluates separations +
     per-halo radial profiles, and REDUCES on the spot.

Every output is written exactly once (dense), all memory access is
gather-side, and there is no sort or scatter over per-pixel rows at all.
The displacement semantics match the halo-major path up to the chord-vs-
arc sliver at the epsilon_max boundary, where d ~ 0 (same class of edge
convention as the reference's query_disc radius vs readout cutoff,
`HealpixRunner.py:306` vs `BaryonCorrection.py:381`).

All vector quantities ride as separate (N,) component planes (SoA): a
TPU-resident (N, 3) array is tiled T(8, 128) — 42x its logical size in
HBM — so the hot path never materializes one.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import healpix as hpx
from ..ops.interp import blend_table_radial

__all__ = ["coarse_halo_index", "blend_halo_profiles",
           "gather_offsets_pass", "gather_paint_pass"]

# conservative cell-reach margin, in units of the mean cell resolution:
# the max distance from a HEALPix cell center to any point of the cell
# is <= ~1.01 resol (measured numerically through nside 512 with 16x
# sub-pixel sampling; see coarse_halo_index)
MARGIN = 1.15


def pick_coarse_nside(radius_max, nside):
    """Coarse grid with cell size ~ the bucket's max disc radius."""
    resol_target = max(radius_max, 1e-4)
    n = int(2 ** np.round(np.log2(np.sqrt(np.pi / 3.0) / resol_target)))
    return int(np.clip(n, 1, nside))


@partial(jax.jit, static_argnames=("nc", "n_rings", "n_phi"))
def _register_halos(nc, n_rings, n_phi, tables_c, theta, phi, radius_reg,
                    cell_map=None):
    """Device part of the coarse registration: windowed cell lists, one
    sort, CSR cell_start. One compile per (nside_c, window shape).

    Uses the no-pixel-vector window (disc_window_mask_tab): the batched
    (H, NR, NP, 3) vector intermediate of the exact-test variant is tiled
    T(8, 128) on TPU and OOMs at 1e6-halo scale.
    """
    H = theta.shape[0]

    def one(th0, ph0, rr):
        cells, valid = hpx.disc_window_mask_tab(tables_c, th0, ph0, rr,
                                                n_rings, n_phi)
        # rr < 0 marks shape-padding halos: register nothing
        return cells.reshape(-1), (valid & (rr >= 0)).reshape(-1)

    cells, valid = jax.vmap(one)(theta, phi, radius_reg)
    if cell_map is not None:
        # remap RING window cells to another cell numbering (NESTED for
        # the cell-major kernels) before sorting
        cells = cell_map[jnp.clip(cells, 0, nc - 1)]
    cells = jnp.where(valid, cells, nc).reshape(-1).astype(jnp.int32)
    hids = jnp.broadcast_to(jnp.arange(H, dtype=jnp.int32)[:, None],
                            valid.shape).reshape(-1)

    # pair sort carries the halo ids with the keys — saves two ~1e8-row
    # gathers vs argsort + indexing (the registration is the dominant
    # one-time cost per catalog)
    cells_s, hids_s = jax.lax.sort((cells, hids), num_keys=1)
    cell_start = jnp.searchsorted(cells_s,
                                  jnp.arange(nc + 1, dtype=jnp.int32)
                                  ).astype(jnp.int32)
    counts = cell_start[1:] - cell_start[:-1]
    return hids_s, cell_start, jnp.max(counts)


def coarse_halo_index(nside_c, theta, phi, radius, dtype=jnp.float32,
                      r_max=None, cell_map=None):
    """Register halos in every coarse cell their disc may touch.

    Returns (halo_ids_sorted, cell_start) over the nc = 12 nside_c^2
    cells, plus K = max halos per cell. Registration adds a margin of
    1.15 cell resolutions to the halo radius, so a fine pixel's own cell
    always lists every halo that can reach it: the maximum distance from
    a HEALPix cell center to any point of the cell is ~1.006 x the mean
    resolution (measured numerically over nside 1..128 with 128x boundary
    sampling), and every evaluated fine-pixel center lies inside its
    cell. Pass ``r_max`` (host float, max of ``radius``) to avoid a
    device sync when sizing the search window.
    """
    resol_c = hpx.nside2resol(nside_c)
    radius_reg = radius + MARGIN * resol_c

    if r_max is None:
        r_max = float(jnp.max(radius))
    r_max = r_max + MARGIN * resol_c
    n_rings = int(np.ceil(2 * r_max / (np.pi / (4 * nside_c)))) + 4
    n_phi = int(np.ceil(2.5 * r_max * 4 * nside_c / np.pi)) + 8
    # quantize window dims + halo count so compiles are shared across
    # buckets/runs (pad halos carry radius < 0 => register nothing)
    n_rings = min(-(-n_rings // 8) * 8, 4 * nside_c - 1)
    n_phi = min(-(-n_phi // 8) * 8, 4 * nside_c)
    H = theta.shape[0]
    step = max(1024, 1 << max(max(H - 1, 1).bit_length() - 3, 0))
    H_pad = -(-H // step) * step
    pad = lambda v, fill: jnp.concatenate(
        [v, jnp.full((H_pad - H,), fill, dtype=v.dtype)])         if H_pad > H else v

    tables_c = hpx.RingTables(nside_c, dtype=dtype)

    nc = hpx.npix(nside_c)
    hids_s, cell_start, K = _register_halos(
        nc, n_rings, n_phi, tables_c,
        pad(theta.astype(dtype), 0.5 * np.pi),
        pad(phi.astype(dtype), 0.0),
        pad(radius_reg.astype(dtype), -1.0), cell_map=cell_map)
    return hids_s, cell_start, int(K)


def _axis_weights(g, c):
    """One-hot linear-interp weight matrix W (H, N) for coords c on grid
    g, plus the in-bounds mask: W @ values == lerp(values at c)."""
    i = jnp.clip(jnp.searchsorted(g, c, side="right") - 1, 0,
                 g.shape[0] - 2)
    t = (c - g[i]) / (g[i + 1] - g[i])
    n = jnp.arange(g.shape[0], dtype=jnp.int32)
    eq0 = (n[None, :] == i[:, None])
    eq1 = (n[None, :] == (i[:, None] + 1))
    W = (jnp.where(eq0, (1.0 - t)[:, None], 0.0)
         + jnp.where(eq1, t[:, None], 0.0)).astype(g.dtype)
    inb = (c >= g[0]) & (c <= g[-1])
    return W, inb


@jax.jit
def blend_halo_profiles(grids, table, scalars):
    """Per-halo blended radial table rows: (H, n_sc) scalar coords ->
    (H, Nr) profiles (NaN rows outside the non-r bounds, matching
    blend_table_radial). Module-level jit so the compile is shared across
    buckets and process() calls.

    For the common (z, M) case the bilinear blend is expressed as one-hot
    weight matmuls — Nz matmuls of (H, NM) @ (NM, Nr) on the MXU — instead
    of H x 4 random row gathers (TPU gathers are the slow path; matmuls
    are the fast one)."""
    n_sc = scalars.shape[1]

    if n_sc == 2:
        gz, gM = grids[0], grids[1]
        Wz, inb_z = _axis_weights(gz, scalars[:, 0])
        WM, inb_M = _axis_weights(gM, scalars[:, 1])
        prof = jnp.zeros((scalars.shape[0], table.shape[2]),
                         dtype=table.dtype)
        for z in range(gz.shape[0]):
            prof = prof + Wz[:, z:z + 1] * (WM @ table[z])
        inb = inb_z & inb_M
        return jnp.where(inb[:, None], prof, jnp.nan)

    def bp(row):
        return blend_table_radial(grids, table,
                                  [row[i] for i in range(n_sc)])

    return jax.vmap(bp)(scalars)


@partial(jax.jit, static_argnames=("use_rdelta", "block"))
def gather_offsets_pass(K, use_rdelta, block, cell_of_pixel, vx, vy, vz,
                        hids_sorted, cell_start,
                        v0x, v0y, v0z, D, a, R_com, lnR, profiles,
                        lnr_grid, eps_max, ox, oy, oz):
    """One dense pixel pass for a bucket: offsets[p] += sum over the
    pixel's candidate halos of the displacement unit-vector delta.

    profiles : (H, Nr) per-halo blended radial displacement tables
    (comoving d(r) at lnr_grid nodes). K (max candidates per cell) is a
    traced scalar — one compile per block shape. All 3-vectors ride as
    separate component planes.
    """
    npix = cell_of_pixel.shape[0]
    n_blocks = npix // block
    dt = ox.dtype

    def one_block(b):
        s = b * block
        px = jax.lax.dynamic_slice_in_dim(vx, s, block)
        py = jax.lax.dynamic_slice_in_dim(vy, s, block)
        pz = jax.lax.dynamic_slice_in_dim(vz, s, block)
        cells = jax.lax.dynamic_slice_in_dim(cell_of_pixel, s, block)
        start = cell_start[cells]                                  # (B,)
        count = cell_start[cells + 1] - start

        def k_body(k, acc):
            ax, ay, az = acc
            ok = k < count
            hid = hids_sorted[jnp.where(ok, start + k, 0)]
            hvx = v0x[hid]
            hvy = v0y[hid]
            hvz = v0z[hid]
            hD = D[hid]
            ha = a[hid]
            hR = R_com[hid]
            hlnR = lnR[hid]

            # physical separation components: (pvec - v0) * D
            dx = (px - hvx) * hD
            dy = (py - hvy) * hD
            dz = (pz - hvz) * hD
            r_sep = jnp.sqrt(dx * dx + dy * dy + dz * dz)
            r_com = r_sep / ha
            lnr = jnp.log(jnp.maximum(r_com, 1e-30))
            rad = lnr - hlnR if use_rdelta else lnr

            # radial readout from the halo's own profile row (2 gathers)
            g0 = lnr_grid[0]
            dg = lnr_grid[1] - lnr_grid[0]
            t = (rad - g0) / dg
            i = jnp.clip(jnp.floor(t).astype(jnp.int32), 0,
                         lnr_grid.shape[0] - 2)
            w = t - i
            d = ((1.0 - w) * profiles[hid, i]
                 + w * profiles[hid, i + 1])
            d = jnp.where((rad >= g0) & (rad <= lnr_grid[-1]), d, 0.0)
            d = jnp.where(r_com < eps_max * hR, d, 0.0)
            # angular window parity with the halo-major path
            # (disc_window's pixel-center-in-disc test)
            cosang = px * hvx + py * hvy + pz * hvz
            ang_ok = cosang >= jnp.cos(eps_max * hR * ha / hD)
            d = jnp.where(ang_ok, d, 0.0)
            d = jnp.where(jnp.isfinite(d), d, 0.0) * ha     # physical

            scale = d / jnp.maximum(r_sep, 1e-30)
            ofx = scale * dx
            ofy = scale * dy
            ofz = scale * dz
            # stable delta = normalize(pos + off) - pvec with pos = pvec*D
            nwx = px * hD + ofx
            nwy = py * hD + ofy
            nwz = pz * hD + ofz
            nw_norm = jnp.sqrt(nwx * nwx + nwy * nwy + nwz * nwz)
            pos_dot_off = hD * (px * ofx + py * ofy + pz * ofz)
            off_sq = ofx * ofx + ofy * ofy + ofz * ofz
            sft = (2.0 * pos_dot_off + off_sq) / (nw_norm + hD)
            dxn = (ofx - px * sft) / nw_norm
            dyn = (ofy - py * sft) / nw_norm
            dzn = (ofz - pz * sft) / nw_norm
            good = (ok & jnp.isfinite(dxn) & jnp.isfinite(dyn)
                    & jnp.isfinite(dzn))
            zero = jnp.zeros((), dtype=dt)
            return (ax + jnp.where(good, dxn, zero),
                    ay + jnp.where(good, dyn, zero),
                    az + jnp.where(good, dzn, zero))

        z = jnp.zeros((block,), dtype=dt)
        return jax.lax.fori_loop(0, K, k_body, (z, z, z))

    bx, by, bz = jax.lax.map(one_block, jnp.arange(n_blocks))
    return (ox + bx.reshape(npix), oy + by.reshape(npix),
            oz + bz.reshape(npix))


@partial(jax.jit, static_argnames=("block",))
def gather_paint_pass(K, block, cell_of_pixel, vx, vy, vz,
                      hids_sorted, cell_start,
                      v0x, v0y, v0z, D, a, R_com, profiles, lnr_grid,
                      eps_max, new_map):
    """Dense painting pass: new_map[p] += sum of the pixel's candidate
    halos' projected-profile values (profiles hold log-values)."""
    npix = cell_of_pixel.shape[0]
    n_blocks = npix // block
    dt = new_map.dtype

    def one_block(b):
        s = b * block
        px = jax.lax.dynamic_slice_in_dim(vx, s, block)
        py = jax.lax.dynamic_slice_in_dim(vy, s, block)
        pz = jax.lax.dynamic_slice_in_dim(vz, s, block)
        cells = jax.lax.dynamic_slice_in_dim(cell_of_pixel, s, block)
        start = cell_start[cells]
        count = cell_start[cells + 1] - start

        def k_body(k, acc):
            ok = k < count
            hid = hids_sorted[jnp.where(ok, start + k, 0)]
            hvx = v0x[hid]
            hvy = v0y[hid]
            hvz = v0z[hid]
            hD = D[hid]
            ha = a[hid]
            hR = R_com[hid]

            dx = (px - hvx) * hD
            dy = (py - hvy) * hD
            dz = (pz - hvz) * hD
            r_sep = jnp.sqrt(dx * dx + dy * dy + dz * dz)
            r_com = jnp.maximum(r_sep / ha, 1e-30)
            lnr = jnp.log(r_com)

            g0 = lnr_grid[0]
            dg = lnr_grid[1] - lnr_grid[0]
            t = (lnr - g0) / dg
            i = jnp.clip(jnp.floor(t).astype(jnp.int32), 0,
                         lnr_grid.shape[0] - 2)
            w = t - i
            lnp = ((1.0 - w) * profiles[hid, i]
                   + w * profiles[hid, i + 1])
            paint = jnp.exp(lnp)
            paint = jnp.where((lnr >= g0) & (lnr <= lnr_grid[-1]), paint,
                              0.0)
            paint = jnp.where(r_com < eps_max * hR, paint, 0.0)
            cosang = px * hvx + py * hvy + pz * hvz
            ang_ok = cosang >= jnp.cos(eps_max * hR * ha / hD)
            paint = jnp.where(ang_ok & ok & jnp.isfinite(paint), paint,
                              0.0)
            return acc + paint

        return jax.lax.fori_loop(0, K, k_body,
                                 jnp.zeros((block,), dtype=dt))

    out = jax.lax.map(one_block, jnp.arange(n_blocks))
    return new_map + out.reshape(npix)
