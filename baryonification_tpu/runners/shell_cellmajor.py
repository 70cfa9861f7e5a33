"""Cell-major shell kernels: the TPU speed-of-light formulation.

Why a third formulation: the pixel-major pass (shell_gather.py) performs
~10 random gathers per (pixel, candidate) slot, and XLA TPU gathers cost
~10 ns per row regardless of locality — measured 140 ns per slot, which
is minutes at NSIDE 1024 x 1e6 halos. This module removes per-pixel
gathers entirely:

  1. fine pixels are processed in NESTED order, so all F = (nside /
     nside_c)^2 pixels of a coarse cell are one contiguous block;
  2. per (cell, candidate-slot): ONE row gather of the halo's packed
     16-float record (row gathers stream at ~1 GB/s-of-rows), and the
     halo's radial profile row is REBUILT from the small (Nz, NM, Nr)
     base table with one-hot weight matmuls on the MXU — bitwise the
     same bilinear blend the tabulation defines;
  3. the radial lerp readout is an unrolled hat-basis reduction over the
     Nr nodes — pure VPU elementwise work on (cells, K, F) tiles,
     zero gathers: sum_n max(0, 1 - |t - n|) * A[n] is exactly linear
     interpolation on the uniform log grid.

Per-slot data movement is amortized over the F pixels of the cell, and
everything else is dense vector/matrix work. Semantics match
shell_gather.gather_*_pass exactly (same masks, same stable delta).
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["pack_halo_records", "dense_cell_candidates",
           "refine_cell_candidates", "axis_weights",
           "table_readout_layout", "combined_axis_weights",
           "cellmajor_offsets_pass", "cellmajor_paint_pass",
           "PROP_COL0", "MAX_PROPS"]


PROP_COL0 = 9          # first packed-record column holding a prop value
MAX_PROPS = 16 - PROP_COL0   # extra scalar table axes per halo record


def pack_halo_records(v0x, v0y, v0z, D, a, R_com, lnR, ln1pz, lnM,
                      props=None):
    """(H, 16) packed per-halo record — one row gather per slot fetches
    everything the kernel needs. Columns 9..15 carry the per-halo extra
    table-axis coordinates (the ParamTabulatedProfile contract,
    reference `HealpixRunner.py:284-287,321`) — up to MAX_PROPS of them;
    unused columns are padding to a lane-friendly width."""
    H = v0x.shape[0]
    dt = v0x.dtype
    cols = [v0x, v0y, v0z, D, a, R_com, lnR, ln1pz, lnM]
    if props is not None and props.shape[1]:
        assert props.shape[1] <= MAX_PROPS, (
            f"at most {MAX_PROPS} extra parameter axes fit the packed "
            f"records; got {props.shape[1]}")
        cols += [props[:, j] for j in range(props.shape[1])]
    out = jnp.stack(cols + [jnp.zeros((H,), dt)] * (16 - len(cols)),
                    axis=-1)
    return out


@partial(jax.jit, static_argnames=("nc", "K_pad"))
def dense_cell_candidates(nc, K_pad, hids_sorted, cell_start):
    """CSR registration -> dense (nc * K_pad,) halo-id matrix + (nc,)
    counts. Pad slots hold 0 (masked by count in the kernel)."""
    counts = jnp.minimum(cell_start[1:] - cell_start[:-1], K_pad)
    reg_len = hids_sorted.shape[0]
    k = jnp.arange(K_pad, dtype=jnp.int32)[None, :]
    src = jnp.minimum(cell_start[:-1][:, None] + k, reg_len - 1)
    dense = jnp.where(k < counts[:, None], hids_sorted[src], 0)
    return dense.reshape(-1), counts.astype(jnp.int32)


@partial(jax.jit, static_argnames=("nc_child",))
def refine_cell_candidates(nc_child, dense_parent, counts_parent,
                           cvx, cvy, cvz, hrec):
    """Split NESTED cells 2x finer and re-filter each parent cell's
    candidate list against the child-cell geometry.

    The coarse registration adds MARGIN (1.15) cell resolutions to the
    halo radius so that every fine pixel inside a cell finds every halo
    that can reach it. At the natural bucket level the cell size ~ the
    halo radius, so the margin inflates the search area (and therefore
    K, which the pass's work is directly proportional to) by ~2x. One
    refinement level keeps the same conservative guarantee — candidate
    kept iff dist(child center, halo) <= r_halo + MARGIN * resol(child)
    (``cos_reach`` = cos of that reach, per halo) — with half the
    margin, roughly halving K. The child candidate set stays a SUPERSET
    of the reachable halos (max center-to-point distance measured
    <= 1.01 resol through nside 512), so pass semantics are unchanged.

    dense_parent : (nc_parent * K_pad,) NESTED-cell candidate ids
    counts_parent: (nc_parent,)
    cv* : (nc_child,) child cell-center unit-vector planes, NESTED order
    hrec : (H, 8) packed per-halo [vx, vy, vz, cos_reach, pad...] —
           ONE row gather per slot (per-lane gathers of 4 separate
           planes cost ~10 ns/element; rows stream)
    Returns (dense_child (nc_child, K_pad) — crop columns to the new
    ladder on the host, counts_child, per-row valid max for K).
    """
    nc_parent = nc_child // 4
    K_pad = dense_parent.shape[0] // nc_parent
    dense_p2d = dense_parent.reshape(nc_parent, K_pad)
    k = jnp.arange(K_pad, dtype=jnp.int32)[None, :]

    # chunk over child cells: the (Cc * K_pad, 8) record gather is the
    # memory hot spot — at multi-million-cell child levels with K_pad in
    # the hundreds a monolithic gather is tens of GB (the NSIDE=2048
    # OOM); Cc stays a multiple of 4 so chunks align with NESTED parents
    # (children of parent p are ids 4p..4p+3)
    n_chunks = 1
    while (nc_child // n_chunks) * K_pad > (1 << 22) \
            and (nc_child // n_chunks) % 8 == 0:
        n_chunks *= 2
    Cc = nc_child // n_chunks

    def one_chunk(ci):
        c0 = ci * Cc
        par = jax.lax.dynamic_slice_in_dim(dense_p2d, c0 // 4, Cc // 4)
        hid = jnp.repeat(par, 4, axis=0)
        cnt = jnp.repeat(jax.lax.dynamic_slice_in_dim(
            counts_parent, c0 // 4, Cc // 4), 4)
        rec = hrec[hid.reshape(-1)]
        cx = jax.lax.dynamic_slice_in_dim(cvx, c0, Cc)
        cy = jax.lax.dynamic_slice_in_dim(cvy, c0, Cc)
        cz = jax.lax.dynamic_slice_in_dim(cvz, c0, Cc)
        dot = (cx[:, None] * rec[:, 0].reshape(Cc, K_pad)
               + cy[:, None] * rec[:, 1].reshape(Cc, K_pad)
               + cz[:, None] * rec[:, 2].reshape(Cc, K_pad))
        ok = (k < cnt[:, None]) & (dot >= rec[:, 3].reshape(Cc, K_pad))
        # stable compaction: valid slots first, original slot order kept
        keys = jnp.where(ok, k, K_pad + k)
        _, hid_s = jax.lax.sort((keys, hid), num_keys=1)
        return hid_s, jnp.sum(ok, axis=1).astype(jnp.int32)

    if n_chunks == 1:
        hid_s, counts_child = one_chunk(jnp.int32(0))
    else:
        hid_s, counts_child = jax.lax.map(one_chunk,
                                          jnp.arange(n_chunks))
        hid_s = hid_s.reshape(nc_child, K_pad)
        counts_child = counts_child.reshape(nc_child)
    return hid_s, counts_child, jnp.max(counts_child)


def axis_weights(g, c):
    """One-hot linear-interp weight matrix for scalar coords ``c`` (C,)
    on grid ``g``: W (C, len(g)) with the two bracketing-node weights,
    plus the in-bounds flag. Gather-free: searchsorted and g[i] lower to
    per-lane gathers on TPU (~10 ns each); a broadcast compare + one-hot
    dot against the tiny grid is pure vector work."""
    ge = (c[:, None] >= g[None, :])
    i = jnp.clip(jnp.sum(ge.astype(jnp.int32), axis=1) - 1, 0,
                 g.shape[0] - 2)
    n = jnp.arange(g.shape[0], dtype=jnp.int32)
    eq0 = (n[None, :] == i[:, None])
    eq1 = (n[None, :] == i[:, None] + 1)
    g_i = jnp.sum(jnp.where(eq0, g[None, :], 0.0), axis=1)
    g_i1 = jnp.sum(jnp.where(eq1, g[None, :], 0.0), axis=1)
    t = (c - g_i) / (g_i1 - g_i)
    W = (jnp.where(eq0, (1.0 - t)[:, None], 0.0)
         + jnp.where(eq1, t[:, None], 0.0))
    inb = (c >= g[0]) & (c <= g[-1])
    return W.astype(g.dtype), inb


def table_readout_layout(base_table):
    """(Nz, NM, Nr, P1, ..., Pk) table -> (Nz, Nr, NM * P1 * ... * Pk)
    readout layout: the radial axis becomes the matmul ROW axis (so the
    hat/segment readout's per-node slices are cheap sublane slices of
    the blended (Nr, C) result), and the mass + extra-param axes merge
    into ONE contraction axis so the per-slot blend stays a single
    matmul chain regardless of how many axes the table carries. Done
    once per pass (a real relayout), not per slot."""
    nd = base_table.ndim
    t = jnp.transpose(base_table, (0, 2, 1) + tuple(range(3, nd)))
    return t.reshape(t.shape[0], t.shape[1], -1)


def combined_axis_weights(WM, packed_k, gprops, p_col0):
    """Merge the mass-axis one-hot weights with one one-hot weight
    matrix per extra table axis (prop j's per-halo coordinate rides in
    packed column ``p_col0 + j``) into V_T (NM * prod(P), C) — the
    contraction operand matching :func:`table_readout_layout`'s merged
    axis (C-order: index = ((m * P1 + p1) * P2 + p2) ...)."""
    C = packed_k.shape[0]
    V_T = WM.T
    inb = True
    for j, gp in enumerate(gprops):
        Wp, inb_p = axis_weights(gp, packed_k[:, p_col0 + j])
        inb = inb & inb_p
        V_T = (V_T[:, None, :] * Wp.T[None, :, :]).reshape(-1, C)
    return V_T, inb


def _blend_rows(packed_k, gz, gM, base2, gprops=()):
    """Rebuild the (C,) slots' radial profile rows A_T (Nr, C) from the
    readout-layout table (see table_readout_layout) by one-hot
    multilinear matmuls (identical arithmetic to
    ops.interp.blend_table_radial over every non-radial axis; NaN ->
    masked later via the in-bounds flags)."""
    ln1pz = packed_k[:, 7]
    lnM = packed_k[:, 8]

    Wz, inb_z = axis_weights(gz, ln1pz)
    WM, inb_M = axis_weights(gM, lnM)
    V_T, inb_p = combined_axis_weights(WM, packed_k, gprops, PROP_COL0)
    # build TRANSPOSED (Nr, C): the hat-readout loop slices one node row
    # per step, which is a cheap sublane slice in this layout (a lane
    # slice of (C, Nr) is strided and relayouts every iteration)
    C = packed_k.shape[0]
    Nr = base2.shape[1]
    A_T = jnp.zeros((Nr, C), dtype=base2.dtype)
    for z in range(gz.shape[0]):
        A_T = A_T + base2[z] @ (V_T * Wz[:, z][None, :])
    return A_T, (inb_z & inb_M & inb_p)


def _hat_readout(A_T, t, n_lo, n_hi):
    """Exact piecewise-linear readout d[c, f] = lerp(A_T[:, c], t[c, f])
    as an unrolled hat-basis reduction over nodes [n_lo, n_hi) — no
    gathers, pure VPU. Out-of-range t must be masked by the caller (the
    clip below only protects the reduction itself). Nodes far from t
    contribute EXACTLY zero, so huge sentinel values elsewhere in A_T
    (the paint pass's -1e30) stay inert — the paint pass must use this
    form, not _segment_readout."""
    tc = jnp.clip(t, float(n_lo), float(n_hi - 1))
    d = jnp.zeros_like(t)
    for n_node in range(n_lo, n_hi):
        w = jnp.maximum(0.0, 1.0 - jnp.abs(tc - n_node))
        d = d + w * A_T[n_node][:, None]
    return d


def _segment_readout(A_T, t, n_lo, n_hi):
    """Same piecewise-linear readout via the saturating-ramp identity
    lerp(t) = A[n_lo] + sum_n clip01(t - n) * (A[n+1] - A[n]) — one
    fused fma + a 2-op clamp per node on the big (C, F) tensor instead
    of the hat form's sub/abs/rsub/max/mul/add (~17% less VPU work in
    the hottest loop). The sum telescopes through every node BELOW t,
    so A_T must hold only moderate finite values (the offsets pass
    sanitizes its table to 0.0) — NOT valid for tables with huge
    sentinels."""
    tc = jnp.clip(t, float(n_lo), float(n_hi - 1))
    d = jnp.broadcast_to(A_T[n_lo][:, None], t.shape)
    for n_node in range(n_lo, n_hi - 1):
        seg = jnp.clip(tc - float(n_node), 0.0, 1.0)
        d = d + seg * (A_T[n_node + 1] - A_T[n_node])[:, None]
    return d


@partial(jax.jit, static_argnames=("use_rdelta", "F", "C_blk", "n_hi",
                                   "k_static"))
def cellmajor_offsets_pass(use_rdelta, F, C_blk, n_hi,
                           pix_x, pix_y, pix_z, hid_dense, counts,
                           packed, gz, gM, base_table, lnr_grid,
                           eps_max, ox, oy, oz, k_static=None,
                           gprops=()):
    """One bucket's displacement pass over all pixels in NESTED order.

    pix_* : (npix,) nested-order pixel unit-vector planes
    hid_dense : (ncell * K_pad,) dense candidate halo ids (int32)
    counts : (ncell,) candidates per cell
    packed : (H, 16) pack_halo_records output
    gprops : extra table-axis grids (table axes 3..) — per-halo
             coordinates ride in the packed records (cols 9..)
    n_hi : static node bound — nodes >= n_hi are unreachable for this
           bucket (r <= eps_max * R_max), so the hat loop skips them
    The slot loop bound is the chunk-local max count: NESTED chunks are
    spatially contiguous sky patches, so a cluster inflates K only in
    its own chunk instead of globally. ``k_static`` replaces the
    data-dependent bound with a fixed trip count — required for
    reverse-mode AD (a traced fori_loop bound lowers to while_loop,
    which has no transpose rule); pass the bucket's host-known K.
    Output: nested-order offset planes (accumulated onto ox/oy/oz).
    """
    npix = pix_x.shape[0]
    ncell = counts.shape[0]
    K_pad = hid_dense.shape[0] // ncell
    n_chunks = ncell // C_blk
    dt = ox.dtype
    g0 = lnr_grid[0]
    dg = lnr_grid[1] - lnr_grid[0]
    # sanitize once: a non-finite table node would poison the one-hot
    # matmuls (0 * inf = NaN) for every slot
    base_table = jnp.where(jnp.isfinite(base_table), base_table, 0.0)
    base2 = table_readout_layout(base_table)
    k_max = jnp.max(counts.reshape(n_chunks, C_blk), axis=1)

    def one_chunk(c0):
        s_pix = c0 * (C_blk * F)
        px = jax.lax.dynamic_slice_in_dim(pix_x, s_pix,
                                          C_blk * F).reshape(C_blk, F)
        py = jax.lax.dynamic_slice_in_dim(pix_y, s_pix,
                                          C_blk * F).reshape(C_blk, F)
        pz = jax.lax.dynamic_slice_in_dim(pix_z, s_pix,
                                          C_blk * F).reshape(C_blk, F)
        cnt = jax.lax.dynamic_slice_in_dim(counts, c0 * C_blk, C_blk)
        hid_blk = jax.lax.dynamic_slice_in_dim(
            hid_dense, c0 * C_blk * K_pad,
            C_blk * K_pad).reshape(C_blk, K_pad)

        def k_body(k, acc):
            ax, ay, az = acc
            ok = (k < cnt)                                   # (C,)
            hid = hid_blk[:, k]                              # (C,)
            rec = packed[hid]                                # (C, 16)
            hvx = rec[:, 0][:, None]
            hvy = rec[:, 1][:, None]
            hvz = rec[:, 2][:, None]
            hD = rec[:, 3][:, None]
            ha = rec[:, 4][:, None]
            hR = rec[:, 5][:, None]
            hlnR = rec[:, 6][:, None]

            A_T, inb = _blend_rows(rec, gz, gM, base2, gprops)  # (Nr, C)
            live = ok & inb                                  # (C,)

            dx = (px - hvx) * hD
            dy = (py - hvy) * hD
            dz = (pz - hvz) * hD
            r_sep = jnp.sqrt(dx * dx + dy * dy + dz * dz)
            r_com = r_sep / ha
            lnr = jnp.log(jnp.maximum(r_com, 1e-30))
            rad = lnr - hlnR if use_rdelta else lnr
            t = (rad - g0) / dg

            d = _segment_readout(A_T, t, 0, n_hi)
            d = jnp.where((rad >= g0) & (rad <= lnr_grid[n_hi - 1]),
                          d, 0.0)
            d = jnp.where(r_com < eps_max * hR, d, 0.0)
            cosang = px * hvx + py * hvy + pz * hvz
            ang_ok = cosang >= jnp.cos(eps_max * hR * ha / hD)
            d = jnp.where(ang_ok & live[:, None], d, 0.0)
            d = jnp.where(jnp.isfinite(d), d, 0.0) * ha      # physical

            scale = d / jnp.maximum(r_sep, 1e-30)
            ofx = scale * dx
            ofy = scale * dy
            ofz = scale * dz
            nwx = px * hD + ofx
            nwy = py * hD + ofy
            nwz = pz * hD + ofz
            nw_norm = jnp.sqrt(nwx * nwx + nwy * nwy + nwz * nwz)
            pdo = hD * (px * ofx + py * ofy + pz * ofz)
            osq = ofx * ofx + ofy * ofy + ofz * ofz
            sft = (2.0 * pdo + osq) / (nw_norm + hD)
            dxn = (ofx - px * sft) / nw_norm
            dyn = (ofy - py * sft) / nw_norm
            dzn = (ofz - pz * sft) / nw_norm
            good = (jnp.isfinite(dxn) & jnp.isfinite(dyn)
                    & jnp.isfinite(dzn))
            zero = jnp.zeros((), dtype=dt)
            return (ax + jnp.where(good, dxn, zero),
                    ay + jnp.where(good, dyn, zero),
                    az + jnp.where(good, dzn, zero))

        # derive the carry from the (possibly device-varying) pixel data
        # so the loop-carry varying-axis types match under shard_map
        z = px * jnp.zeros((), dtype=dt)
        upper = k_max[c0] if k_static is None else k_static
        bx, by, bz = jax.lax.fori_loop(0, upper, k_body, (z, z, z))
        return bx.reshape(-1), by.reshape(-1), bz.reshape(-1)

    bx, by, bz = jax.lax.map(one_chunk, jnp.arange(n_chunks))
    return (ox + bx.reshape(npix), oy + by.reshape(npix),
            oz + bz.reshape(npix))


@partial(jax.jit, static_argnames=("F", "C_blk", "n_hi", "k_static"))
def cellmajor_paint_pass(F, C_blk, n_hi,
                         pix_x, pix_y, pix_z, hid_dense, counts,
                         packed, gz, gM, base_table, lnr_grid,
                         eps_max, new_map, k_static=None, gprops=()):
    """Cell-major painting pass (log-profile base table; exp readout).
    ``k_static`` / ``gprops`` as in :func:`cellmajor_offsets_pass`."""
    npix = pix_x.shape[0]
    ncell = counts.shape[0]
    K_pad = hid_dense.shape[0] // ncell
    n_chunks = ncell // C_blk
    dt = new_map.dtype
    g0 = lnr_grid[0]
    dg = lnr_grid[1] - lnr_grid[0]
    # log-profile tables carry -inf/NaN where the profile is 0; a large
    # negative FINITE stand-in keeps the one-hot matmuls NaN-free and
    # still paints exp(...) = 0 wherever such a node is touched
    base_table = jnp.where(jnp.isfinite(base_table), base_table, -1e30)
    base2 = table_readout_layout(base_table)
    k_max = jnp.max(counts.reshape(n_chunks, C_blk), axis=1)

    def one_chunk(c0):
        s_pix = c0 * (C_blk * F)
        px = jax.lax.dynamic_slice_in_dim(pix_x, s_pix,
                                          C_blk * F).reshape(C_blk, F)
        py = jax.lax.dynamic_slice_in_dim(pix_y, s_pix,
                                          C_blk * F).reshape(C_blk, F)
        pz = jax.lax.dynamic_slice_in_dim(pix_z, s_pix,
                                          C_blk * F).reshape(C_blk, F)
        cnt = jax.lax.dynamic_slice_in_dim(counts, c0 * C_blk, C_blk)
        hid_blk = jax.lax.dynamic_slice_in_dim(
            hid_dense, c0 * C_blk * K_pad,
            C_blk * K_pad).reshape(C_blk, K_pad)

        def k_body(k, acc):
            ok = (k < cnt)
            hid = hid_blk[:, k]
            rec = packed[hid]
            hvx = rec[:, 0][:, None]
            hvy = rec[:, 1][:, None]
            hvz = rec[:, 2][:, None]
            hD = rec[:, 3][:, None]
            ha = rec[:, 4][:, None]
            hR = rec[:, 5][:, None]

            A_T, inb = _blend_rows(rec, gz, gM, base2, gprops)
            live = ok & inb

            dx = (px - hvx) * hD
            dy = (py - hvy) * hD
            dz = (pz - hvz) * hD
            r_sep = jnp.sqrt(dx * dx + dy * dy + dz * dz)
            r_com = jnp.maximum(r_sep / ha, 1e-30)
            lnr = jnp.log(r_com)
            t = (lnr - g0) / dg

            lnp = _hat_readout(A_T, t, 0, n_hi)
            paint = jnp.exp(lnp)
            paint = jnp.where((lnr >= g0) & (lnr <= lnr_grid[n_hi - 1]),
                              paint, 0.0)
            paint = jnp.where(r_com < eps_max * hR, paint, 0.0)
            cosang = px * hvx + py * hvy + pz * hvz
            ang_ok = cosang >= jnp.cos(eps_max * hR * ha / hD)
            paint = jnp.where(ang_ok & live[:, None]
                              & jnp.isfinite(paint), paint, 0.0)
            return acc + paint

        z = px * jnp.zeros((), dtype=dt)
        upper = k_max[c0] if k_static is None else k_static
        out = jax.lax.fori_loop(0, upper, k_body, z)
        return out.reshape(-1)

    out = jax.lax.map(one_chunk, jnp.arange(n_chunks))
    return new_map + out.reshape(npix)
