"""Particle-snapshot runner: baryonify raw particle positions.

TPU-native re-design of `/root/reference/BaryonForge/Runners/
SnapshotRunner.py`. The reference builds a scipy KDTree (`:97`) and
queries particles per halo in a Python loop (`:205-247`); here a periodic
uniform-grid **cell list** is built once (sort particles by cell id), and
each halo gathers its fixed-shape block of candidate cells — vmapped over
halo chunks with masked, padded per-cell particle slots. Per-particle
offsets accumulate via scatter-add (overlapping halos add, like the
reference's ``tot_offsets[inds] +=``), then positions are updated and
periodically wrapped (`:250-260`).
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..cosmology import Cosmology, MassDef
from ..ops.interp import blend_table_radial, radial_readout
from ..ops.scatter_pallas import scatter_add_accum

__all__ = ['DefaultRunnerSnapshot', 'BaryonifySnapshot']


class CellList:
    """Periodic uniform-grid spatial index over particle positions."""

    def __init__(self, coords, L, n_cells):
        self.L = float(L)
        self.n_cells = int(n_cells)
        self.dim = coords.shape[1]
        h = self.L / self.n_cells
        cell = np.floor(np.mod(coords, self.L) / h).astype(np.int64)
        cell = np.clip(cell, 0, self.n_cells - 1)
        cid = cell[:, 0]
        for d in range(1, self.dim):
            cid = cid * self.n_cells + cell[:, d]
        order = np.argsort(cid, kind='stable')
        self.order = order                       # particle permutation
        self.sorted_cid = cid[order]
        ncid = self.n_cells ** self.dim
        self.cell_start = np.searchsorted(self.sorted_cid,
                                          np.arange(ncid), side='left')
        self.cell_count = np.diff(np.append(self.cell_start,
                                            len(cid))).astype(np.int64)
        self.max_per_cell = int(self.cell_count.max()) if len(cid) else 0
        self.h = h


class DefaultRunnerSnapshot:
    """Shared configuration (reference `SnapshotRunner.py:8-156`)."""

    def __init__(self, HaloNDCatalog, ParticleSnapshot, epsilon_max, model,
                 mass_def=None, verbose=True, halo_chunk=32, n_buckets=4,
                 n_cells=None, precision="auto", method="auto",
                 mesh=None, mesh_axis=None):
        # multi-device execution: a jax.sharding.Mesh shards the
        # cell-list cell axis of the cell-major pass (parallel.py
        # mesh_snap_offsets_bucket); requires the cell-major method
        self.mesh = mesh
        self.mesh_axis = (mesh_axis if mesh_axis is not None
                          else (mesh.axis_names[0] if mesh is not None
                                else None))
        if mesh is not None and method == "auto":
            method = "cellmajor"
        if mesh is not None and method != "cellmajor":
            raise ValueError("mesh= requires the cell-major method")
        self.HaloNDCatalog = HaloNDCatalog
        self.ParticleSnapshot = ParticleSnapshot
        self.epsilon_max = epsilon_max
        self.cosmo = HaloNDCatalog.cosmology
        self.model = model
        self.mass_def = mass_def if mass_def is not None else MassDef(200, 'critical')
        self.verbose = verbose
        self.halo_chunk = halo_chunk
        self.n_buckets = n_buckets
        if precision == "auto":
            precision = ("float64" if jax.default_backend() == "cpu"
                         else "float32")
        self.dtype = jnp.dtype(precision)
        # 'cellmajor': particle-major dense pass, zero per-call gathers
        # on the particle side (snapshot_cellmajor.py; extra table axes
        # / per-halo property columns ride in the packed records);
        # 'gather': the per-halo K^dim cell-block formulation (the only
        # path for 2D snapshots). auto: cellmajor where eligible on
        # accelerators.
        from .grid_cellmajor import MAX_PROPS_SNAP
        p_keys = getattr(model, 'p_keys', []) or []
        why_not = None
        if ParticleSnapshot.is2D:
            why_not = "2D snapshots have no cell-major formulation"
        elif len(p_keys) > MAX_PROPS_SNAP:
            why_not = (f"model has {len(p_keys)} extra parameter axes; "
                       f"the packed records fit at most {MAX_PROPS_SNAP}")
        from ._method import resolve_method
        self.method = resolve_method(method, why_not, "gather")

        coords = (['x', 'y'] if ParticleSnapshot.is2D else ['x', 'y', 'z'])
        self._coords = np.stack([ParticleSnapshot.cat[c] for c in coords],
                                axis=-1)
        if n_cells is None:
            # target a few particles per cell, capped for memory
            npart = len(self._coords)
            n_cells = int(np.clip(round(npart ** (1 / len(coords)) / 2),
                                  4, 512))
        if self.method == "cellmajor":
            # power-of-two cell counts keep the chunked dense pass's
            # cell axis evenly divisible
            n_cells = int(2 ** np.clip(round(np.log2(n_cells)), 2, 9))
        self.tree = CellList(self._coords, ParticleSnapshot.L, n_cells)


@partial(jax.jit, static_argnames=("K", "P", "n_cells", "dim", "chunk",
                                   "n_props", "use_rdelta"))
def _accumulate_particle_offsets(K, P, n_cells, dim, chunk, n_props,
                                 use_rdelta, grids, table, eps_max, L,
                                 sorted_pos, cell_start, cell_count,
                                 xh, Mh, ah, Rh, props, offsets):
    """Per-halo gather over a K^dim block of cells, P padded particle
    slots per cell; displacement readout and scatter-add of offsets.

    sorted_pos : (Np, dim) particle positions in cell-list order
    xh : (H, dim) halo positions; Rh : (H,) comoving halo radii
    offsets : (Np, dim) running per-particle offsets (cell-list order)
    """
    H = xh.shape[0]
    n_chunks = H // chunk
    h_cell = L / n_cells
    Np_tot = sorted_pos.shape[0]

    k_off = jnp.arange(K, dtype=jnp.int32) - K // 2

    def one_halo(x0, M_h, a_h, R_h, pr_h):
        # candidate cells: K^dim block around the halo's cell
        c0 = jnp.floor(jnp.mod(x0, L) / h_cell).astype(jnp.int32)
        grids_k = jnp.meshgrid(*([k_off] * dim), indexing='ij')
        cells = [jnp.mod(c0[d] + grids_k[d].reshape(-1), n_cells)
                 for d in range(dim)]
        cid = cells[0]
        for d in range(1, dim):
            cid = cid * n_cells + cells[d]                    # (K^dim,)

        start = cell_start[cid]                               # (C,)
        count = cell_count[cid]
        slot = jnp.arange(P, dtype=jnp.int32)
        pidx = start[:, None] + slot[None, :]                 # (C, P)
        pvalid = slot[None, :] < count[:, None]
        pidx = jnp.where(pvalid, pidx, 0)

        pos = sorted_pos[pidx]                                # (C, P, dim)
        dxv = pos - x0
        dxv = jnp.where(dxv > L / 2, dxv - L, dxv)
        dxv = jnp.where(dxv < -L / 2, dxv + L, dxv)
        r = jnp.sqrt(jnp.sum(dxv * dxv, axis=-1))

        lnr = jnp.log(jnp.maximum(r, 1e-30))
        rad = lnr - jnp.log(R_h) if use_rdelta else lnr
        scalars = [jnp.log(1.0 / a_h), jnp.log(M_h)] \
            + [pr_h[pi] for pi in range(n_props)]
        prof_h = blend_table_radial(grids, table, scalars)
        d = radial_readout(prof_h, grids[2], rad)
        d = jnp.where(r < eps_max * R_h, d, 0.0)
        # displacement(d, M, a) * a — comoving table readout scaled to the
        # snapshot's coordinate convention (`SnapshotRunner.py:228,245`)
        d = jnp.where(jnp.isfinite(d), d, 0.0) * a_h
        off = d[..., None] * dxv / jnp.maximum(r, 1e-30)[..., None]
        off = jnp.where(pvalid[..., None], off, 0.0)
        return pidx.reshape(-1), off.reshape(-1, dim)

    def chunk_body(offs, idx):
        sl = lambda x: jax.lax.dynamic_slice_in_dim(x, idx * chunk, chunk)
        pidx, off = jax.vmap(one_halo)(
            sl(xh), sl(Mh), sl(ah), sl(Rh), sl(props))
        dt_o = offs[0].dtype
        offs = scatter_add_accum(offs, pidx.reshape(-1).astype(jnp.int32),
                                 tuple(off[..., c].reshape(-1).astype(dt_o)
                                       for c in range(dim)))
        return offs, None

    offsets, _ = jax.lax.scan(chunk_body, tuple(offsets),
                              jnp.arange(n_chunks))
    return offsets


class BaryonifySnapshot(DefaultRunnerSnapshot):
    """Displace particles radially around halos
    (reference `SnapshotRunner.py:159-262`)."""

    def process(self):
        cosmo = Cosmology.from_dict(self.cosmo)
        model = self.model
        if not hasattr(model, '_table'):
            raise NameError("Displacement model has no table. Run "
                            "setup_interpolator() first")

        snap = self.ParticleSnapshot
        L = float(snap.L)
        dim = 2 if snap.is2D else 3
        cat = self.HaloNDCatalog.cat
        if cat.size == 0:
            # loop-over-nothing semantics (SnapshotRunner.py:100): no
            # halos means zero displacement for every particle
            return snap.cat.copy()
        a = 1.0 / (1.0 + self.HaloNDCatalog.redshift)

        R_phys = np.asarray(self.mass_def.get_radius(cosmo, cat['M'], a))
        R_com = R_phys / a
        R_q = np.clip(self.epsilon_max * R_com, 0, L / 2)

        tree = self.tree
        coords_h = (['x', 'y'] if snap.is2D else ['x', 'y', 'z'])
        xh = np.stack([cat[c] for c in coords_h], axis=-1)

        p_keys = getattr(model, 'p_keys', []) or []
        props = (np.stack([cat[k] for k in p_keys], axis=-1)
                 if p_keys else np.zeros((cat.size, 0)))
        use_rdelta = bool(getattr(model, 'Rdelta_sampling', False))

        dt = self.dtype
        from contextlib import nullcontext
        from ..utils import x64_disabled
        hot_ctx = (x64_disabled() if dt == jnp.dtype('float32')
                   else nullcontext())
        if self.method == "cellmajor":
            return self._process_cellmajor(snap, L, cat, a, R_com, R_q,
                                           xh, use_rdelta, hot_ctx)
        with hot_ctx:
            grids_d = tuple(g.astype(dt) for g in model._grids)
            table_d = model._table.astype(dt)
            sorted_pos = jnp.asarray(self._coords[tree.order], dtype=dt)
            zeros = jnp.zeros((len(self._coords),), dtype=dt)
            offsets = (zeros,) * dim

            # bucket halos by query radius so the candidate-cell block K
            # stays tight per bucket
            order = np.argsort(R_q)
            for idx in [s for s in np.array_split(order, self.n_buckets)
                        if s.size > 0]:
                Rmax = float(R_q[idx].max())
                K = 2 * int(np.ceil(Rmax / tree.h)) + 1
                K = min(K, tree.n_cells)
                P = tree.max_per_cell
                chunk = min(self.halo_chunk, len(idx))
                n_pad = (-len(idx)) % chunk
                pad = lambda v, fill=0.0: np.concatenate(
                    [v, np.full((n_pad,) + v.shape[1:], fill)]) if n_pad else v
                offsets = _accumulate_particle_offsets(
                    K, P, tree.n_cells, dim, chunk, len(p_keys), use_rdelta,
                    grids_d, table_d, float(self.epsilon_max), L,
                    sorted_pos,
                    jnp.asarray(tree.cell_start, dtype=jnp.int32),
                    jnp.asarray(tree.cell_count, dtype=jnp.int32),
                    jnp.asarray(pad(xh[idx]), dtype=dt),
                    jnp.asarray(pad(cat['M'][idx], 1.0), dtype=dt),
                    jnp.asarray(pad(np.full(len(idx), a), 1.0), dtype=dt),
                    jnp.asarray(pad(R_com[idx], 1e-10), dtype=dt),
                    jnp.asarray(pad(props[idx]), dtype=dt), offsets)

        # scatter back to original particle order (the * a conversion is
        # applied inside the kernel)
        off_np = np.stack([np.asarray(o) for o in offsets], axis=-1)
        tot = np.zeros_like(off_np)
        tot[tree.order] = off_np

        new_cat = snap.cat.copy()
        for d, cname in enumerate(coords_h):
            pos = new_cat[cname] + tot[:, d]
            pos = np.where(pos > L, pos - L, pos)
            pos = np.where(pos < 0, pos + L, pos)
            new_cat[cname] = pos
        return new_cat

    # ----- cell-major path -----
    def _cm_staging(self, dt):
        """Padded per-cell particle planes + packed-slot map, cached."""
        cache = getattr(self, '_cmstage_cache', None)
        if cache is None:
            cache = {}
            self._cmstage_cache = cache
        key = str(dt)
        if key not in cache:
            from . import snapshot_cellmajor as scm
            tree = self.tree
            P_pad = max(tree.max_per_cell, 1)
            planes, counts_p, pad_idx = scm.pad_particles_by_cell(
                tree, self._coords, P_pad)
            cache[key] = (P_pad,
                          tuple(jnp.asarray(p, dtype=dt) for p in planes),
                          jnp.asarray(counts_p),
                          jnp.asarray(pad_idx, dtype=jnp.int32))
        return cache[key]

    def _cm_dense(self, bi, sel, xh, reach, R_q_sel, dt):
        """Dense cell-list candidates for one bucket, cached.

        For wide-reach buckets the registration runs at a COARSER block
        level (2x/4x/8x the cell size — window rows scale as W^3, and
        the pair sort over H * W^3 rows is the memory hot spot at
        1e5-halo scale) and is then refined back down to the cell level
        with cheap per-axis filters (grid_cellmajor.
        refine_block_candidates)."""
        cache = getattr(self, '_cmdense_cache', None)
        if cache is None:
            cache = {}
            self._cmdense_cache = cache
        key = (bi, str(dt))
        if key not in cache:
            from . import grid_cellmajor as gcm
            from . import shell_cellmajor as cm
            tree = self.tree
            nb = tree.n_cells
            L = tree.L
            # register coarse enough that the per-halo window stays small
            levels = 0
            nb_reg = nb
            while (2 * int(np.ceil(reach / (L / nb_reg) + 1.0)) + 1 > 9
                   and nb_reg % 2 == 0 and nb_reg > 8 and levels < 3):
                nb_reg //= 2
                levels += 1
            W = min(2 * int(np.ceil(reach / (L / nb_reg) + 1.0)) + 1,
                    nb_reg)
            H = len(sel)
            step = max(256, 1 << max(max(H - 1, 1).bit_length() - 3, 0))
            H_pad = -(-H // step) * step
            pad = lambda v, fill: np.concatenate(
                [v, np.full(H_pad - H, fill)]) if H_pad > H else v
            xm = np.mod(xh[sel], L)
            rr = np.minimum(reach, np.asarray(R_q_sel))
            hids, cell_start, K = gcm.register_halos_grid(
                nb_reg, W, dt.type(L),
                jnp.asarray(pad(xm[:, 0], 0.0), dtype=dt),
                jnp.asarray(pad(xm[:, 1], 0.0), dtype=dt),
                jnp.asarray(pad(xm[:, 2], 0.0), dtype=dt),
                jnp.asarray(pad(rr, -1.0), dtype=dt))
            K = int(K)
            K_pad = max(64, -(-K // 64) * 64)
            dense, counts = cm.dense_cell_candidates(
                nb_reg ** 3, K_pad, hids, cell_start)
            if levels:
                hrec = np.zeros((H, 16))
                hrec[:, 0], hrec[:, 1], hrec[:, 2] = xm.T
                hrec[:, 3] = rr
                hrec_d = jnp.asarray(hrec, dtype=dt)
                while nb_reg < nb:
                    nb_reg *= 2
                    dense2d, counts, K_dev = gcm.refine_block_candidates(
                        nb_reg, dense, counts, hrec_d,
                        dt.type(L / nb_reg), dt.type(L))
                    K = int(K_dev)
                    K_pad = max(64, -(-K // 64) * 64)
                    dense = dense2d[:, :min(K_pad, dense2d.shape[1])
                                    ].reshape(-1)
            cache[key] = (dense, counts, K)
        return cache[key]

    @staticmethod
    def _node_bound(g2, rad_max, Nr):
        n_hi = int(np.floor((rad_max - g2[0]) / (g2[1] - g2[0]))) + 2
        return min(Nr, max(32, -(-n_hi // 32) * 32))

    def _halo_geom(self):
        """Host halo staging (radii, wrapped positions, packed record
        columns), cached per catalog — also what makes process_device
        fully jit-able: a traced call must not run jnp ops on host data
        (they would become tracers and break the numpy staging)."""
        if getattr(self, '_geom_cache_cat', None) is self.HaloNDCatalog \
                and hasattr(self, '_geom_cache'):
            return self._geom_cache
        cosmo = Cosmology.from_dict(self.cosmo)
        cat = self.HaloNDCatalog.cat
        a = 1.0 / (1.0 + self.HaloNDCatalog.redshift)
        L = float(self.ParticleSnapshot.L)
        R_phys = np.asarray(self.mass_def.get_radius(cosmo, cat['M'], a))
        R_com = R_phys / a
        R_q = np.clip(self.epsilon_max * R_com, 0, L / 2)
        xh = np.stack([cat[c] for c in 'xyz'], axis=-1)
        H = len(xh)
        cols = np.zeros((H, 16))
        cols[:, :3] = np.mod(xh, L)
        cols[:, 3] = R_com
        cols[:, 4] = np.log(cat['M'])
        cols[:, 5] = np.log(R_com)
        from .grid_cellmajor import PROP_COL0_SNAP
        p_keys = getattr(self.model, 'p_keys', []) or []
        for j, k in enumerate(p_keys):
            cols[:, PROP_COL0_SNAP + j] = cat[k]
        self._geom_cache = (a, R_com, R_q, xh, cols)
        self._geom_cache_cat = self.HaloNDCatalog
        return self._geom_cache

    def process_device(self, table=None):
        """Differentiable, device-resident displacement.

        Counterpart of ``BaryonifyShell.process_device`` for particle
        snapshots: returns the displaced (x, y, z) positions in the
        ORIGINAL particle order as device arrays. ``table`` (default
        ``model._table``) may be traced, so gradients flow from any
        scalar of the displaced positions (e.g. a P(k) band from
        ``ops.spectra.power_spectrum_3d``) back through the radial
        readout into the displacement table and on into baryon
        parameters via ``build_table_device`` — the differentiable
        dP(k) path. Requires method='cellmajor' staging; geometry
        (cell list, padded particle planes, registrations) is constant.
        With ``mesh=`` the pass runs sharded over cell-list cells with
        static trip counts and stays differentiable
        (cf. ``BaryonifyShell.process_device``).
        """
        assert self.method == "cellmajor", (
            "process_device requires the cell-major snapshot method")
        from contextlib import nullcontext
        from ..utils import x64_disabled
        from . import grid_cellmajor as gcm
        from . import snapshot_cellmajor as scm
        model = self.model
        if table is None:
            table = model._table
        snap = self.ParticleSnapshot
        L = float(snap.L)
        # cached host staging: also what keeps this method traceable
        # under an outer jax.jit (no jnp ops on host catalog data)
        a, R_com, R_q, xh, cols = self._halo_geom()
        use_rdelta = bool(getattr(model, 'Rdelta_sampling', False))
        tree = self.tree
        dt = self.dtype
        nb = tree.n_cells
        ncell = nb ** 3
        hot_ctx = (x64_disabled() if dt == jnp.dtype('float32')
                   else nullcontext())
        with hot_ctx:
            gz = model._grids[0].astype(dt)
            gM = model._grids[1].astype(dt)
            g2 = model._grids[2].astype(dt)
            gprops = tuple(g.astype(dt) for g in model._grids[3:])
            table = jnp.asarray(table).astype(dt)
            z_coord = dt.type(np.log(1.0 + self.HaloNDCatalog.redshift))
            table_z, inb_z = gcm.blend_table_z(table, gz, z_coord)
            table_z = jnp.where(jnp.isfinite(table_z), table_z, 0.0)
            # out-of-range catalog redshift -> zero displacement (the
            # halo-major path's NaN -> 0 soft degradation)
            table_z = jnp.where(inb_z, table_z, 0.0)
            P_pad, (px, py, pz), counts_p, pad_idx = self._cm_staging(dt)
            packed = jnp.asarray(cols, dtype=dt)
            g2_np = np.asarray(model._grids[2])
            n_dev = (self.mesh.shape[self.mesh_axis]
                     if self.mesh is not None else 1)
            if self.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec
                from ..parallel import pad_cells_for_mesh, pad_rows
                sh = NamedSharding(self.mesh,
                                   PartitionSpec(self.mesh_axis))
                put = lambda x: jax.device_put(x, sh)
                ncell_pad, C_blk = pad_cells_for_mesh(ncell, n_dev,
                                                      P_pad)
                pad_plane = lambda p: put(pad_rows(
                    p.reshape(ncell, P_pad), ncell_pad).reshape(-1))
                px, py, pz = pad_plane(px), pad_plane(py), pad_plane(pz)
                counts_p = put(pad_rows(counts_p, ncell_pad))
            else:
                from ..parallel import cell_chunk
                put = lambda x: x
                ncell_pad = ncell
                C_blk = cell_chunk(ncell, P_pad)
            zeros = put(jnp.zeros((ncell_pad * P_pad,), dtype=dt))
            off_pad = (zeros, zeros, zeros)
            order = np.argsort(R_q)
            for bi, idx in enumerate(
                    [s for s in np.array_split(order, self.n_buckets)
                     if s.size > 0]):
                # per-axis box test: registration adds the hb/2 cell
                # half-extent itself, so reach is the radial cutoff
                reach = float(R_q[idx].max())
                dense, counts_h, K = self._cm_dense(bi, idx, xh, reach,
                                                    R_q[idx], dt)
                rad_max = (np.log(self.epsilon_max) if use_rdelta
                           else np.log(self.epsilon_max
                                       * R_com[idx].max()))
                n_hi = self._node_bound(g2_np, rad_max, len(g2_np))
                sel_dev = jnp.asarray(idx, dtype=jnp.int32)
                if self.mesh is not None:
                    from ..parallel import mesh_snap_offsets_bucket
                    off_pad = mesh_snap_offsets_bucket(
                        self.mesh, self.mesh_axis, use_rdelta,
                        P_pad, C_blk, n_hi,
                        put(pad_rows(dense.reshape(ncell, -1),
                                     ncell_pad)),
                        put(pad_rows(counts_h, ncell_pad)),
                        (px, py, pz), counts_p, packed[sel_dev], gM,
                        table_z, g2, float(self.epsilon_max),
                        float(a), L, off_pad,
                        k_static=max(int(K), 1), gprops=gprops)
                else:
                    off_pad = scm.snapshot_offsets_pass(
                        use_rdelta, P_pad, C_blk, n_hi, dense, counts_h,
                        px, py, pz, counts_p, packed[sel_dev], gM,
                        table_z, g2, float(self.epsilon_max),
                        dt.type(a), dt.type(L), *off_pad,
                        k_static=max(int(K), 1), gprops=gprops)
            # unpad (sorted order) -> unsort (original order) -> update
            order_dev = jnp.asarray(tree.order, dtype=jnp.int32)
            out = []
            for d, cname in enumerate('xyz'):
                off_sorted = off_pad[d][pad_idx]
                off = jnp.zeros_like(off_sorted).at[order_dev].set(
                    off_sorted)
                pos = jnp.asarray(snap.cat[cname], dtype=dt) + off
                pos = jnp.where(pos > L, pos - L, pos)
                pos = jnp.where(pos < 0, pos + L, pos)
                out.append(pos)
        return tuple(out)

    def _process_cellmajor(self, snap, L, cat, a, R_com, R_q, xh,
                           use_rdelta, hot_ctx):
        """Particle-major dense pass (see snapshot_cellmajor.py)."""
        from . import grid_cellmajor as gcm
        from . import snapshot_cellmajor as scm
        model = self.model
        tree = self.tree
        dt = self.dtype
        nb = tree.n_cells
        ncell = nb ** 3
        with hot_ctx:
            gz = model._grids[0].astype(dt)
            gM = model._grids[1].astype(dt)
            g2 = model._grids[2].astype(dt)
            gprops = tuple(g.astype(dt) for g in model._grids[3:])
            z_coord = float(np.log(1.0 + self.HaloNDCatalog.redshift))
            table_z, inb_z = gcm.blend_table_z(
                model._table.astype(dt), gz, dt.type(z_coord))
            table_z = jnp.where(jnp.isfinite(table_z), table_z, 0.0)
            P_pad, (px, py, pz), counts_p, pad_idx = self._cm_staging(dt)
            n_dev = (self.mesh.shape[self.mesh_axis]
                     if self.mesh is not None else 1)
            if self.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec
                from ..parallel import pad_cells_for_mesh, pad_rows
                sh = NamedSharding(self.mesh,
                                   PartitionSpec(self.mesh_axis))
                put = lambda x: jax.device_put(x, sh)
                # pad the cell axis to any device count (zero particle/
                # halo counts -> padded cells are no-op work)
                ncell_pad, C_blk = pad_cells_for_mesh(ncell, n_dev,
                                                      P_pad)
                pad_plane = lambda p: put(pad_rows(
                    p.reshape(ncell, P_pad), ncell_pad).reshape(-1))
                px, py, pz = pad_plane(px), pad_plane(py), pad_plane(pz)
                counts_p = put(pad_rows(counts_p, ncell_pad))
            else:
                put = lambda x: x
                ncell_pad = ncell
            # packed halo records (positions wrapped into [0, L),
            # extra table-axis coordinates at PROP_COL0_SNAP..) — the
            # SAME staging product process_device reads, so the record
            # layout has exactly one builder (_halo_geom) and the cache
            # is shared between the forward and differentiable paths
            cols = self._halo_geom()[4]
            packed = jnp.asarray(cols, dtype=dt)
            g2_np = np.asarray(model._grids[2])
            zeros = put(jnp.zeros((ncell_pad * P_pad,), dtype=dt))
            off_pad = (zeros, zeros, zeros)
            if self.mesh is None:
                from ..parallel import cell_chunk
                C_blk = cell_chunk(ncell, P_pad)
            if bool(inb_z):
                order = np.argsort(R_q)
                for bi, idx in enumerate(
                        [s for s in np.array_split(order, self.n_buckets)
                         if s.size > 0]):
                    reach = float(R_q[idx].max())
                    dense, counts_h, K = self._cm_dense(
                        bi, idx, xh, reach, R_q[idx], dt)
                    rad_max = (np.log(self.epsilon_max) if use_rdelta
                               else np.log(self.epsilon_max
                                           * R_com[idx].max()))
                    n_hi = self._node_bound(g2_np, rad_max, len(g2_np))
                    if self.verbose:
                        print(f"Baryonifying matter: bucket {bi + 1} "
                              f"({len(idx)} halos, n_cells={nb}, K={K}, "
                              f"P={P_pad}, C={C_blk}, n_hi={n_hi})")
                    sel_dev = jnp.asarray(idx, dtype=jnp.int32)
                    if self.mesh is not None:
                        from ..parallel import mesh_snap_offsets_bucket
                        off_pad = mesh_snap_offsets_bucket(
                            self.mesh, self.mesh_axis, use_rdelta,
                            P_pad, C_blk, n_hi,
                            put(pad_rows(dense.reshape(ncell, -1),
                                         ncell_pad)),
                            put(pad_rows(counts_h, ncell_pad)),
                            (px, py, pz), counts_p, packed[sel_dev], gM,
                            table_z, g2, float(self.epsilon_max),
                            float(a), L, off_pad, gprops=gprops)
                    else:
                        off_pad = scm.snapshot_offsets_pass(
                            use_rdelta, P_pad, C_blk, n_hi, dense,
                            counts_h, px, py, pz, counts_p,
                            packed[sel_dev], gM, table_z, g2,
                            float(self.epsilon_max),
                            dt.type(a), dt.type(L), *off_pad,
                            gprops=gprops)
            # unpad: sorted-particle order, then the original unsort
            off_np = np.stack([np.asarray(o[pad_idx]) for o in off_pad],
                              axis=-1)
        tot = np.zeros_like(off_np)
        tot[tree.order] = off_np
        new_cat = snap.cat.copy()
        for d, cname in enumerate(['x', 'y', 'z']):
            pos = new_cat[cname] + tot[:, d]
            pos = np.where(pos > L, pos - L, pos)
            pos = np.where(pos < 0, pos + L, pos)
            new_cat[cname] = pos
        return new_cat
