"""2D/3D grid runners: baryonify + profile painting on periodic maps.

TPU-native re-design of `/root/reference/BaryonForge/Runners/
Map2DRunner.py`. The reference loops halos in Python, building a
variable-size periodic cutout per halo (`:394-423`) and finishing with a
numba exact-overlap redeposit (`:14-168`); here halos are bucketed by
cutout size, each bucket runs as one vmapped fixed-shape kernel with a
scatter-add of displacement offsets (or painted values), and the final
redeposit is the CIC kernel in `ops/scatter.py` (exact-overlap == CIC for
unit pixels).

Supports the reference's 2D ellipticity path (galsim-style shear rotation
of the radius grid, `Map2DRunner.py:275-344`); 3D ellipticity raises, as
in the reference (`:333`).
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..cosmology import Cosmology, MassDef
from ..ops.interp import blend_table_radial, radial_readout
from ..ops.scatter import cic_deposit_2d, cic_deposit_3d
from ..ops.scatter_pallas import scatter_add_accum

__all__ = ['DefaultRunnerGrid', 'BaryonifyGrid', 'PaintProfilesGrid',
           'PaintProfilesAnisGrid']


def build_Rmat(A, q):
    """2D shear matrix mapping grid coordinates to the elliptical-radius
    frame of a halo with axis vector A and axis ratio q (reference
    `Map2DRunner.py:275-344`, galsim Shear conventions).

    Closed form: the reference goes through conformal shear eta = -ln q
    and a Taylor-guarded tanh, but |g| = tanh(eta/2) is exactly
    (1 - q)/(1 + q), and the position angle only enters through
    cos/sin(2 beta) which follow algebraically from the normalized axis
    vector — no trig, logs, or series needed. beta = arccos(A_x) in
    [0, pi] is the reference's convention; note it discards the sign
    of A_y, i.e. (ax, ay) and (ax, -ay) give the SAME matrix even
    though they are physically distinct orientations — faithful to
    `Map2DRunner.py:303-329` (golden-tested), not a simplification
    choice here.

    The matrix is area-preserving (det = 1): coordinates ALONG A are
    stretched by q^(-1/2) and perpendicular ones shrunk by q^(1/2), so
    iso-profile contours come out with semi-axis ratio q along A.
    """
    ax, ay = np.asarray(A, dtype=np.float64) / np.linalg.norm(A)
    gmod = (1.0 - q) / (1.0 + q)
    g1 = gmod * (2.0 * ax * ax - 1.0)        # |g| cos(2 beta)
    g2 = gmod * (2.0 * ax * abs(ay))         # |g| sin(2 beta)
    det = np.sqrt(1.0 - gmod * gmod)
    return np.array([[1.0 + g1, g2], [g2, 1.0 - g1]]) / det


class DefaultRunnerGrid:
    """Shared configuration for the grid runners
    (reference `Map2DRunner.py:171-366`)."""

    def __init__(self, HaloNDCatalog, GriddedMap, epsilon_max, model,
                 use_ellipticity=False, mass_def=None, verbose=True,
                 halo_chunk=64, n_buckets=8, precision="auto",
                 method="auto", mesh=None, mesh_axis=None):
        # multi-device execution: a jax.sharding.Mesh shards the Morton
        # block axis of the cell-major passes (see parallel.py
        # mesh_grid_* helpers); requires the cell-major method
        self.mesh = mesh
        self.mesh_axis = (mesh_axis if mesh_axis is not None
                          else (mesh.axis_names[0] if mesh is not None
                                else None))
        if mesh is not None and method == "auto":
            method = "cellmajor"
        if mesh is not None and method != "cellmajor":
            raise ValueError("mesh= requires the cell-major method")
        self.HaloNDCatalog = HaloNDCatalog
        self.GriddedMap = GriddedMap
        self.cosmo = HaloNDCatalog.cosmology
        self.model = model
        self.epsilon_max = epsilon_max
        self.mass_def = mass_def if mass_def is not None else MassDef(200, 'critical')
        self.verbose = verbose
        self.halo_chunk = halo_chunk
        self.n_buckets = n_buckets
        self.use_ellipticity = use_ellipticity
        if precision == "auto":
            precision = ("float64" if jax.default_backend() == "cpu"
                         else "float32")
        self.dtype = jnp.dtype(precision)
        # 'cellmajor' (2D incl. ellipticity — the shear matrix rides in
        # the packed records — or isotropic 3D; extra table axes /
        # per-halo property columns ride in the packed records too):
        # block-major dense pass, TPU speed-of-light (grid_cellmajor.py);
        # 'scatter': per-halo windowed cutouts + scatter-add (exact
        # reference-loop semantics; the only path for 3D ellipticity).
        # auto: cellmajor where eligible on accelerators.
        from .grid_cellmajor import MAX_PROPS_2D, MAX_PROPS_3D
        p_keys = getattr(model, 'p_keys', []) or []
        max_props = MAX_PROPS_2D if GriddedMap.is2D else MAX_PROPS_3D
        why_not = None
        if not GriddedMap.is2D and use_ellipticity:
            why_not = "3D ellipticity has no cell-major formulation"
        elif len(p_keys) > max_props:
            why_not = (f"model has {len(p_keys)} extra parameter axes; "
                       f"the packed records fit at most {max_props}")
        from ._method import resolve_method
        self.method = resolve_method(method, why_not, "scatter")

        if use_ellipticity:
            names = HaloNDCatalog.cat.dtype.names
            assert 'q_ell' in names, ("The 'q_ell' column is missing, but "
                                      "you set use_ellipticity = True")
            if not GriddedMap.is2D:
                raise NotImplementedError(
                    "use_ellipticity is not implemented for 3D maps "
                    "(parity with Map2DRunner.py:333).")
            assert 'A_ell' in names, ("The 'A_ell' column is missing, but "
                                      "you set use_ellipticity = True")

    def _halo_arrays(self, cosmo, comoving_R=False):
        cat = self.HaloNDCatalog.cat
        a = 1.0 / (1.0 + self.HaloNDCatalog.redshift)
        R = np.asarray(self.mass_def.get_radius(cosmo, cat['M'], a))
        if comoving_R:
            R = R / a
        out = dict(x=cat['x'].copy(), y=cat['y'].copy(), M=cat['M'].copy(),
                   R=R)
        if not self.GriddedMap.is2D:
            out['z'] = cat['z'].copy()
        if self.use_ellipticity:
            Rmats = np.stack([build_Rmat(Av, qv) for Av, qv in
                              zip(cat['A_ell'], cat['q_ell'])])
            out['Rmat'] = Rmats
            # max stretch factor circular->elliptical radius: the
            # eps_max * R cutoff on the ELLIPTICAL radius reaches out to
            # q^(-1/2) farther in circular distance (registration bound)
            q = np.asarray(cat['q_ell'], dtype=np.float64)
            out['qfac'] = np.sqrt(np.maximum(q, 1.0 / np.maximum(q, 1e-8)))
        else:
            out['Rmat'] = np.tile(np.eye(2), (cat.size, 1, 1))
            out['qfac'] = np.ones(cat.size)
        p_keys = getattr(self.model, 'p_keys', []) or []
        out['props'] = (np.stack([cat[k] for k in p_keys], axis=-1)
                        if p_keys else np.zeros((cat.size, 0)))
        return a, out

    # ----- cell-major staging (3D; cached per catalog) -----
    def _check_gcaches(self):
        """Invalidate per-catalog staging caches on catalog swap."""
        if getattr(self, '_gcache_cat', None) is not self.HaloNDCatalog:
            for attr in ('_gpacked_cache', '_gdense_cache',
                         '_anis_remap_cache'):
                if hasattr(self, attr):
                    delattr(self, attr)
            self._gcache_cat = self.HaloNDCatalog

    @staticmethod
    def _node_bound(g2, rad_max, Nr):
        """Static radial-node bound (see shell.DefaultRunner)."""
        n_hi = int(np.floor((rad_max - g2[0]) / (g2[1] - g2[0]))) + 2
        return min(Nr, max(32, -(-n_hi // 32) * 32))

    def _nearest_bins(self, x):
        """Nearest-bin index per halo per axis, matching
        jnp.argmin(|bins - x|) exactly (ties -> lower index)."""
        gm = self.GriddedMap
        bins = np.asarray(gm.bins, dtype=np.float64)
        N = len(bins)
        cand = np.clip(np.floor((x - bins[0]) / gm.res).astype(np.int64),
                       0, N - 2)
        lo = np.abs(bins[cand] - x)
        hi = np.abs(bins[cand + 1] - x)
        return (cand + (hi < lo)).astype(np.int64)

    def _grid_packed(self, arrs, R_com, dt):
        """(H, 16) packed records [x, y, z, R_com, lnM, lnRc, cen_x,
        cen_y, cen_z | props...] for the cell-major grid kernels (cached
        per dtype). Extra table-axis coordinates (per-halo property
        columns) ride in the trailing columns — PROP_COL0_3D /
        PROP_COL0_2D in grid_cellmajor.py."""
        from .grid_cellmajor import PROP_COL0_2D, PROP_COL0_3D
        cache = getattr(self, '_gpacked_cache', None)
        if cache is None:
            cache = {}
            self._gpacked_cache = cache
        key = str(dt)
        if key not in cache:
            H = len(arrs['x'])
            n_props = arrs['props'].shape[1]
            cols = np.zeros((H, 16))
            if self.GriddedMap.is2D:
                # 2D layout: [x, y, R_com, lnM, lnRc, cen_x, cen_y,
                #             Rm00, Rm01, Rm10, Rm11 | props...]
                cols[:, 0] = arrs['x']
                cols[:, 1] = arrs['y']
                cols[:, 2] = R_com
                cols[:, 3] = np.log(arrs['M'])
                cols[:, 4] = np.log(R_com)
                cols[:, 5] = self._nearest_bins(arrs['x'])
                cols[:, 6] = self._nearest_bins(arrs['y'])
                cols[:, 7:11] = arrs['Rmat'].reshape(H, 4)
                if n_props:
                    cols[:, PROP_COL0_2D:PROP_COL0_2D + n_props] = \
                        arrs['props']
            else:
                cols[:, 0] = arrs['x']
                cols[:, 1] = arrs['y']
                cols[:, 2] = arrs['z']
                cols[:, 3] = R_com
                cols[:, 4] = np.log(arrs['M'])
                cols[:, 5] = np.log(R_com)
                cols[:, 6] = self._nearest_bins(arrs['x'])
                cols[:, 7] = self._nearest_bins(arrs['y'])
                cols[:, 8] = self._nearest_bins(arrs['z'])
                if n_props:
                    cols[:, PROP_COL0_3D:PROP_COL0_3D + n_props] = \
                        arrs['props']
            cache[key] = jnp.asarray(cols, dtype=dt)
        return cache[key]

    def _grid_dense(self, bi, B, sel, arrs, reach, R_q_sel, dt):
        """Dense block candidates for one bucket (cached per catalog).

        Returns (dense, counts, K, B_eff): like the shell path, the
        candidate lists are REFINED to finer blocks while K is
        margin-dominated (grid_cellmajor.refine_block_candidates) —
        pass work is npix * K. The per-halo reach is
        min(bucket window, eps_max * R): the radial cutoff zeroes
        everything beyond each halo's own reach, so the bucket's
        smaller halos register far more tightly than the bucket-max
        window alone would."""
        cache = getattr(self, '_gdense_cache', None)
        if cache is None:
            cache = {}
            self._gdense_cache = cache
        key = (bi, B, str(dt))
        if key not in cache:
            from . import grid_cellmajor as gcm
            from . import shell_cellmajor as cm
            gm = self.GriddedMap
            dim = 2 if gm.is2D else 3
            N = gm.Npix
            nb = N // B
            L = float(N * gm.res)
            hb = L / nb
            # cover every block whose center can be within
            # reach + hb/2 (per axis) of a halo anywhere in its block
            W = min(2 * int(np.ceil(reach / hb + 1.0)) + 1, nb)
            H = len(sel)
            step = max(256, 1 << max(max(H - 1, 1).bit_length() - 3, 0))
            H_pad = -(-H // step) * step
            pad = lambda v, fill: np.concatenate(
                [v, np.full(H_pad - H, fill)]) if H_pad > H else v
            rr = np.minimum(reach, np.asarray(R_q_sel))
            x0 = np.asarray(gm.bins)[0] - gm.res / 2
            xs = np.mod(arrs['x'][sel] - x0, L)
            ys = np.mod(arrs['y'][sel] - x0, L)
            if gm.is2D:
                hids, cell_start, K = gcm.register_halos_grid_2d(
                    nb, W, dt.type(L),
                    jnp.asarray(pad(xs, 0.0), dtype=dt),
                    jnp.asarray(pad(ys, 0.0), dtype=dt),
                    jnp.asarray(pad(rr, -1.0), dtype=dt))
            else:
                zs = np.mod(arrs['z'][sel] - x0, L)
                hids, cell_start, K = gcm.register_halos_grid(
                    nb, W, dt.type(L),
                    jnp.asarray(pad(xs, 0.0), dtype=dt),
                    jnp.asarray(pad(ys, 0.0), dtype=dt),
                    jnp.asarray(pad(zs, 0.0), dtype=dt),
                    jnp.asarray(pad(rr, -1.0), dtype=dt))
            K = int(K)
            K_pad = max(64, -(-K // 64) * 64)
            dense, counts = cm.dense_cell_candidates(
                nb ** dim, K_pad, hids, cell_start)
            # refinement: shifted positions + per-halo reach ride in a
            # local record bank (cols 0..dim-1 positions, col 3 reach)
            hrec = np.zeros((H, 16))
            hrec[:, 0], hrec[:, 1] = xs, ys
            if not gm.is2D:
                hrec[:, 2] = zs
            hrec[:, 3] = rr
            hrec_d = jnp.asarray(hrec, dtype=dt)
            refine = (gcm.refine_block_candidates_2d if gm.is2D
                      else gcm.refine_block_candidates)
            B_eff = B
            k_min = getattr(self, 'refine_k_min', 48)
            while K >= k_min and B_eff % 2 == 0 and B_eff // 2 >= 4:
                B_eff //= 2
                nb2 = N // B_eff
                dense2d, counts, K_dev = refine(
                    nb2, dense, counts, hrec_d,
                    dt.type(L / nb2), dt.type(L))
                K = int(K_dev)
                K_pad = max(64, -(-K // 64) * 64)
                dense = dense2d[:, :min(K_pad,
                                        dense2d.shape[1])].reshape(-1)
            cache[key] = (dense, counts, K, B_eff)
        return cache[key]

    def _grid_cell_chunk(self, ncell, F, target=1 << 18):
        """Blocks per lax.map step: must divide ncell exactly."""
        from ..parallel import cell_chunk
        return cell_chunk(ncell, F, target)

    def _windowed_offsets(self, gm, a, arrs, R_com, Nsize, idx_all,
                          use_rdelta, grids_d, table_d, dt, offsets):
        """Bucketed windowed-scatter displacement accumulation (shared by
        process() and the differentiable process_device(); ``table_d``
        may be traced — bucket geometry is concrete)."""
        p_keys = getattr(self.model, 'p_keys', []) or []
        for idx in _nsize_buckets(Nsize[idx_all], self.n_buckets):
            sel = idx_all[idx]
            half = int(Nsize[sel].max() // 2)
            chunk = min(self.halo_chunk, len(sel))
            n_pad = (-len(sel)) % chunk
            pad = lambda v, fill=0.0: np.concatenate(
                [v, np.full((n_pad,) + v.shape[1:], fill)]) if n_pad else v
            offsets = _accumulate_grid_offsets(
                gm.Npix, half, len(p_keys), use_rdelta, chunk, gm.is2D,
                grids_d, table_d, float(self.epsilon_max), a,
                gm.res, jnp.asarray(gm.bins, dtype=dt),
                jnp.asarray(pad(arrs['x'][sel]), dtype=dt),
                jnp.asarray(pad(arrs['y'][sel]), dtype=dt),
                (jnp.asarray(pad(arrs['z'][sel]), dtype=dt)
                 if not gm.is2D else None),
                jnp.asarray(pad(arrs['M'][sel], 1.0), dtype=dt),
                jnp.asarray(pad(R_com[sel], 1e-10), dtype=dt),
                jnp.asarray(pad(arrs['Rmat'][sel]), dtype=dt),
                jnp.asarray(pad(arrs['props'][sel]), dtype=dt), offsets)
        return offsets

    def _windowed_paint(self, gm, a, arrs, R_com, Nsize, grids_d,
                        table_d, dt, new_map):
        """Bucketed windowed-scatter painting (shared by process() and
        process_device())."""
        p_keys = getattr(self.model, 'p_keys', []) or []
        for idx in _nsize_buckets(Nsize, self.n_buckets):
            half = int(Nsize[idx].max() // 2)
            chunk = min(self.halo_chunk, len(idx))
            n_pad = (-len(idx)) % chunk
            pad = lambda v, fill=0.0: np.concatenate(
                [v, np.full((n_pad,) + v.shape[1:], fill)]) if n_pad else v
            new_map = _accumulate_grid_paint(
                gm.Npix, half, len(p_keys), chunk, gm.is2D,
                grids_d, table_d, float(self.epsilon_max), a,
                gm.res, jnp.asarray(gm.bins, dtype=dt),
                jnp.asarray(pad(arrs['x'][idx]), dtype=dt),
                jnp.asarray(pad(arrs['y'][idx]), dtype=dt),
                (jnp.asarray(pad(arrs['z'][idx]), dtype=dt)
                 if not gm.is2D else None),
                jnp.asarray(pad(arrs['M'][idx], 1.0), dtype=dt),
                jnp.asarray(pad(R_com[idx], 1e-10), dtype=dt),
                jnp.asarray(pad(arrs['Rmat'][idx]), dtype=dt),
                jnp.asarray(pad(arrs['props'][idx]), dtype=dt), new_map)
        return new_map

    def _cic_coords(self, N, dim, dt):
        """Row-major integer pixel-coordinate planes as device arrays,
        cached per (N, dim, dtype) — rebuilding the np.divmod planes
        host-side costs ~hundreds of MB of allocation + a re-upload per
        call (and per gradient step through process_device)."""
        cache = getattr(self, '_ccoord_cache', None)
        if cache is None:
            cache = {}
            self._ccoord_cache = cache
        key = (N, dim, jnp.dtype(dt).name)
        if key not in cache:
            if dim == 2:
                ix, iy = np.divmod(np.arange(N * N), N)
                planes = (ix, iy)
            else:
                ixy, iz = np.divmod(np.arange(N ** 3), N)
                ix, iy = np.divmod(ixy, N)
                planes = (ix, iy, iz)
            cache[key] = tuple(jnp.asarray(p, dtype=dt) for p in planes)
        return cache[key]

    def _cic_offsets(self, gm, offsets_d, orig_map, dt):
        """CIC redeposit of the original map at displaced positions
        (device array in, device array out; differentiable)."""
        N = gm.Npix
        vals = jnp.asarray(orig_map.reshape(-1), dtype=dt)
        if gm.is2D:
            ix, iy = self._cic_coords(N, 2, dt)
            return cic_deposit_2d(
                N, offsets_d[0] + ix, offsets_d[1] + iy, vals, dtype=dt)
        ix, iy, iz = self._cic_coords(N, 3, dt)
        return cic_deposit_3d(
            N, offsets_d[0] + ix, offsets_d[1] + iy, offsets_d[2] + iz,
            vals, dtype=dt)

    def _grid_inv_perm(self, N, B):
        """Row-major voxel/pixel id -> block-major position (for
        unsorting the pass outputs), cached per (N, B)."""
        cache = getattr(self, '_gperm_cache', None)
        if cache is None:
            cache = {}
            self._gperm_cache = cache
        dim = 2 if self.GriddedMap.is2D else 3
        if (N, B, dim) not in cache:
            from . import grid_cellmajor as gcm
            perm = (gcm.block_perm_2d(N, B) if dim == 2
                    else gcm.block_perm(N, B))
            inv = jnp.zeros((N ** dim,), dtype=jnp.int32).at[perm].set(
                jnp.arange(N ** dim, dtype=jnp.int32))
            cache[(N, B, dim)] = inv
        return cache[(N, B, dim)]


def _cutout_coords(x_h, bins, half, res, Npix):
    """Periodic cutout index array + sub-pixel halo offset along one axis.

    Mirrors pick_indices + the dx offset (`Map2DRunner.py:394-423,513`).
    """
    x_cen = jnp.argmin(jnp.abs(bins - x_h))
    inds = jnp.mod(x_cen - half + jnp.arange(2 * half), Npix)
    dx = bins[x_cen] - x_h
    # coordinate of each cutout cell relative to the halo
    rel = (jnp.arange(2 * half) - half) * res + dx
    return inds, rel


@partial(jax.jit, static_argnames=("Npix", "half", "n_props", "use_rdelta",
                                   "chunk", "is2D"))
def _accumulate_grid_offsets(Npix, half, n_props, use_rdelta, chunk, is2D,
                             grids, table, eps_max, a_scale, res, bins,
                             xs, ys, zs, Ms, Rs, Rmats, props, offsets):
    """Displacement-offset accumulation for one bucket of halos
    (`Map2DRunner.py:476-580`). ``offsets`` is (Npix^d, d) in pixel units.
    """
    H = xs.shape[0]
    n_chunks = H // chunk
    W = 2 * half

    def readout(r_com, M_h, R_h, pr_h):
        lnr = jnp.log(jnp.maximum(r_com, 1e-30))
        rad = lnr - jnp.log(R_h) if use_rdelta else lnr
        scalars = [jnp.log(1.0 / a_scale), jnp.log(M_h)] \
            + [pr_h[pi] for pi in range(n_props)]
        prof_h = blend_table_radial(grids, table, scalars)
        d = radial_readout(prof_h, grids[2], rad)
        d = jnp.where(r_com < eps_max * R_h, d, 0.0)
        return jnp.where(jnp.isfinite(d), d, 0.0)

    if is2D:
        def one_halo(x_h, y_h, z_h, M_h, R_h, Rm_h, pr_h):
            x_inds, relx = _cutout_coords(x_h, bins, half, res, Npix)
            y_inds, rely = _cutout_coords(y_h, bins, half, res, Npix)
            # meshgrid 'xy': rows vary y, cols vary x; flat index follows
            # the reference's inds[x_inds,:][:,y_inds] layout
            gx = relx[:, None] * jnp.ones((1, W))
            gy = jnp.ones((W, 1)) * rely[None, :]
            # displacement magnitude reads at the ELLIPTICAL radius but
            # pushes along the CIRCULAR unit vector, like the reference
            # (`Map2DRunner.py:518-536`: x_hat is built from r_grid
            # before it is overwritten with the elliptical radius)
            ex = Rm_h[0, 0] * gx + Rm_h[1, 0] * gy
            ey = Rm_h[0, 1] * gx + Rm_h[1, 1] * gy
            r = jnp.sqrt(ex * ex + ey * ey)
            r_c = jnp.sqrt(gx * gx + gy * gy)
            r_hat_x = gx / jnp.maximum(r_c, 1e-30)
            r_hat_y = gy / jnp.maximum(r_c, 1e-30)
            d = readout(r.reshape(-1), M_h, R_h, pr_h) / res
            flat = (x_inds[:, None] * Npix + y_inds[None, :]).reshape(-1)
            return flat, jnp.stack([d * r_hat_x.reshape(-1),
                                    d * r_hat_y.reshape(-1)], axis=-1)
    else:
        def one_halo(x_h, y_h, z_h, M_h, R_h, Rm_h, pr_h):
            x_inds, relx = _cutout_coords(x_h, bins, half, res, Npix)
            y_inds, rely = _cutout_coords(y_h, bins, half, res, Npix)
            z_inds, relz = _cutout_coords(z_h, bins, half, res, Npix)
            gx = relx[:, None, None]
            gy = rely[None, :, None]
            gz = relz[None, None, :]
            r = jnp.sqrt(gx * gx + gy * gy + gz * gz)
            rs = jnp.maximum(r, 1e-30)
            d = readout(r.reshape(-1), M_h, R_h, pr_h) / res
            flat = (x_inds[:, None, None] * Npix * Npix
                    + y_inds[None, :, None] * Npix
                    + z_inds[None, None, :]).reshape(-1)
            return flat, jnp.stack(
                [d * (gx / rs).reshape(-1),
                 d * (gy / rs).reshape(-1),
                 d * (gz / rs).reshape(-1)], axis=-1)

    def chunk_body(offs, idx):
        sl = lambda x: jax.lax.dynamic_slice_in_dim(x, idx * chunk, chunk)
        zz = sl(zs) if zs is not None else sl(xs)
        flat, dvec = jax.vmap(one_halo)(
            sl(xs), sl(ys), zz, sl(Ms), sl(Rs), sl(Rmats), sl(props))
        dt_o = offs[0].dtype
        offs = scatter_add_accum(
            offs, flat.reshape(-1).astype(jnp.int32),
            tuple(dvec[..., c].reshape(-1).astype(dt_o)
                  for c in range(dvec.shape[-1])))
        return offs, None

    offsets, _ = jax.lax.scan(chunk_body, tuple(offsets),
                              jnp.arange(n_chunks))
    return offsets


@partial(jax.jit, static_argnames=("Npix", "half", "n_props", "chunk",
                                   "is2D"))
def _accumulate_grid_paint(Npix, half, n_props, chunk, is2D,
                           grids, table, eps_max, a_scale, res, bins,
                           xs, ys, zs, Ms, Rs, Rmats, props, new_map):
    """Painting accumulation for one bucket (`Map2DRunner.py:714-810`)."""
    H = xs.shape[0]
    n_chunks = H // chunk
    W = 2 * half

    def readout(r_com, M_h, pr_h):
        scalars = [jnp.log(1.0 / a_scale), jnp.log(M_h)] \
            + [pr_h[pi] for pi in range(n_props)]
        prof_h = blend_table_radial(grids, table, scalars)  # log-profile
        return jnp.exp(radial_readout(
            prof_h, grids[2], jnp.log(jnp.maximum(r_com, 1e-30))))

    if is2D:
        def one_halo(x_h, y_h, z_h, M_h, R_h, Rm_h, pr_h):
            x_inds, relx = _cutout_coords(x_h, bins, half, res, Npix)
            y_inds, rely = _cutout_coords(y_h, bins, half, res, Npix)
            gx = relx[:, None] * jnp.ones((1, W))
            gy = jnp.ones((W, 1)) * rely[None, :]
            ex = Rm_h[0, 0] * gx + Rm_h[1, 0] * gy
            ey = Rm_h[0, 1] * gx + Rm_h[1, 1] * gy
            r = jnp.sqrt(ex * ex + ey * ey).reshape(-1)
            paint = readout(r, M_h, pr_h)
            paint = jnp.where((r < eps_max * R_h) & jnp.isfinite(paint),
                              paint, 0.0)
            flat = (x_inds[:, None] * Npix + y_inds[None, :]).reshape(-1)
            return flat, paint
    else:
        def one_halo(x_h, y_h, z_h, M_h, R_h, Rm_h, pr_h):
            x_inds, relx = _cutout_coords(x_h, bins, half, res, Npix)
            y_inds, rely = _cutout_coords(y_h, bins, half, res, Npix)
            z_inds, relz = _cutout_coords(z_h, bins, half, res, Npix)
            gx = relx[:, None, None]
            gy = rely[None, :, None]
            gz = relz[None, None, :]
            r = jnp.sqrt(gx * gx + gy * gy + gz * gz).reshape(-1)
            paint = readout(r, M_h, pr_h)
            paint = jnp.where((r < eps_max * R_h) & jnp.isfinite(paint),
                              paint, 0.0)
            flat = (x_inds[:, None, None] * Npix * Npix
                    + y_inds[None, :, None] * Npix
                    + z_inds[None, None, :]).reshape(-1)
            return flat, paint

    def chunk_body(m, idx):
        sl = lambda x: jax.lax.dynamic_slice_in_dim(x, idx * chunk, chunk)
        zz = sl(zs) if zs is not None else sl(xs)
        flat, paint = jax.vmap(one_halo)(
            sl(xs), sl(ys), zz, sl(Ms), sl(Rs), sl(Rmats), sl(props))
        (m,) = scatter_add_accum((m,), flat.reshape(-1).astype(jnp.int32),
                                 (paint.reshape(-1).astype(m.dtype),))
        return m, None

    new_map, _ = jax.lax.scan(chunk_body, new_map, jnp.arange(n_chunks))
    return new_map


def _nsize_buckets(Nsizes, n_buckets):
    order = np.argsort(Nsizes)
    return [s for s in np.array_split(order, n_buckets) if s.size > 0]


@jax.jit
def _permute_add(acc_rm, plane_bm, inv):
    """acc_rm[i] += plane_bm[inv[i]] — unsort one bucket's block-major
    output into the row-major accumulator. With sharded operands the
    gather crosses shard boundaries; GSPMD inserts the collective."""
    return acc_rm + plane_bm[inv]


class BaryonifyGrid(DefaultRunnerGrid):
    """Baryonify a 2D/3D mass grid (reference `Map2DRunner.py:370-615`).

    The input grid must be a MASS grid (empty cells = 0)."""

    def process(self):
        cosmo = Cosmology.from_dict(self.cosmo)
        model = self.model
        if not hasattr(model, '_table'):
            raise NameError("Displacement model has no table. Run "
                            "setup_interpolator() first")

        gm = self.GriddedMap
        orig_map = np.asarray(gm.map, dtype=np.float64)
        if self.HaloNDCatalog.cat.size == 0:
            # loop-over-nothing semantics (Map2DRunner.py:497 skips
            # every halo): an empty catalog (e.g. an empty SplitJoin
            # chunk) leaves the map untouched
            return orig_map.copy()
        a, arrs = self._halo_arrays(cosmo, comoving_R=False)
        # query radius in comoving Mpc, clipped to half box
        R_q = np.clip(self.epsilon_max * arrs['R'] / a, 0,
                      np.max(gm.bins) / 2)
        Nsize = (2 * R_q / gm.res).astype(np.int64) // 2 * 2
        keep = Nsize >= 2   # skip tiny halos (`Map2DRunner.py:497`)

        p_keys = getattr(model, 'p_keys', []) or []
        use_rdelta = bool(getattr(model, 'Rdelta_sampling', False))
        dim = 2 if gm.is2D else 3

        dt = self.dtype
        from contextlib import nullcontext
        from ..utils import x64_disabled
        hot_ctx = (x64_disabled() if dt == jnp.dtype('float32')
                   else nullcontext())
        R_com = arrs['R'] / a   # table masking radius, comoving
        idx_all = np.where(keep)[0]
        if self.method == "cellmajor":
            return self._process_cellmajor(gm, a, arrs, R_com, Nsize,
                                           idx_all, use_rdelta, orig_map)
        with hot_ctx:
            grids_d = tuple(g.astype(dt) for g in model._grids)
            table_d = model._table.astype(dt)
            zeros = jnp.zeros((gm.Npix ** dim,), dtype=dt)
            offsets = self._windowed_offsets(gm, a, arrs, R_com, Nsize,
                                             idx_all, use_rdelta, grids_d,
                                             table_d, dt, (zeros,) * dim)
            offsets_d = tuple(jnp.where(jnp.isfinite(o), o, 0.0)
                              for o in offsets)
            # add integer grid coordinates and redeposit (CIC); map layout
            # is map[ix, iy(, iz)]: flat index (ix*N + iy)*... is C-order
            new_map = np.asarray(self._cic_offsets(gm, offsets_d,
                                                   orig_map, dt))

        new_sum, old_sum = new_map.sum(), orig_map.sum()
        assert np.isclose(new_sum, old_sum), (
            "ERROR in pixel regridding, sum(new_map) [%0.14e] != "
            "sum(oldmap) [%0.14e]" % (new_sum, old_sum))
        return new_map

    def _process_cellmajor(self, gm, a, arrs, R_com, Nsize, idx_all,
                           use_rdelta, orig_map, table=None, device=False):
        """Block-major dense pass (3D voxels or 2D flat-sky pixels):
        see grid_cellmajor.py. Same per-bucket cutout semantics as the
        windowed path (the kernels carry the [cen - half, cen + half)
        window test; 2D carries the shear matrix per halo).

        ``table`` overrides ``model._table`` and may be TRACED when
        ``device=True`` (static k_static trip counts, no host round-trip
        or conservation assert — the differentiable core)."""
        from contextlib import nullcontext
        from ..utils import x64_disabled
        from . import grid_cellmajor as gcm
        model = self.model
        dt = self.dtype
        dim = 2 if gm.is2D else 3
        N = gm.Npix
        L = float(N * gm.res)
        res = gm.res
        self._check_gcaches()
        hot_ctx = (x64_disabled() if dt == jnp.dtype('float32')
                   else nullcontext())
        with hot_ctx:
            gz, gM, g2 = (model._grids[0].astype(dt),
                          model._grids[1].astype(dt),
                          model._grids[2].astype(dt))
            gprops = tuple(g.astype(dt) for g in model._grids[3:])
            z_coord = float(np.log(1.0 / a))
            tbl = (model._table if table is None
                   else jnp.asarray(table)).astype(dt)
            table_z, inb_z = gcm.blend_table_z(tbl, gz, dt.type(z_coord))
            table_z = jnp.where(jnp.isfinite(table_z), table_z, 0.0)
            packed = self._grid_packed(arrs, R_com, dt)
            n_dev = (self.mesh.shape[self.mesh_axis]
                     if self.mesh is not None else 1)
            if self.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec
                from ..parallel import pad_cells_for_mesh, pad_rows
                sh = NamedSharding(self.mesh,
                                   PartitionSpec(self.mesh_axis))
                put = lambda x: jax.device_put(x, sh)
                # row-major (N^dim) voxel/pixel arrays shard only when
                # divisible; otherwise they stay replicated (the block
                # axis is the one padded to any device count)
                put_rm = put if (N ** dim) % n_dev == 0 else (lambda x: x)
            else:
                put = put_rm = lambda x: x
            offsets = tuple(put_rm(jnp.zeros((N ** dim,), dtype=dt))
                            for _ in range(dim))
            g2_np = np.asarray(model._grids[2])
            if bool(inb_z):
                for bi, idx in enumerate(
                        _nsize_buckets(Nsize[idx_all], self.n_buckets)):
                    sel = idx_all[idx]
                    half = int(Nsize[sel].max() // 2)
                    B = gcm.pick_block_size(N, max(half, 4))
                    reach = (half + 1) * res
                    dense, counts, K, B_eff = self._grid_dense(
                        bi, B, sel, arrs, reach,
                        self.epsilon_max * R_com[sel]
                        * arrs['qfac'][sel], dt)
                    nb = N // B_eff
                    F = B_eff ** dim
                    ncell = nb ** dim
                    if self.mesh is not None:
                        # pad the block axis to any device count (zero
                        # counts -> padded blocks are no-op work)
                        ncell_pad, C_blk = pad_cells_for_mesh(
                            ncell, n_dev, F)
                    else:
                        ncell_pad = ncell
                        C_blk = self._grid_cell_chunk(ncell, F)
                    rad_max = (np.log(self.epsilon_max) if use_rdelta
                               else np.log(self.epsilon_max
                                           * R_com[sel].max()))
                    n_hi = self._node_bound(g2_np, rad_max, len(g2_np))
                    if self.verbose:
                        print(f"Baryonifying matter: bucket {bi + 1} "
                              f"({len(sel)} halos, B={B}->{B_eff}, "
                              f"K={K}, F={F}, C={C_blk}, n_hi={n_hi}"
                              + (f", mesh x{n_dev})" if self.mesh
                                 is not None else ")"))
                    sel_dev = jnp.asarray(sel, dtype=jnp.int32)
                    bins0 = float(np.asarray(gm.bins)[0])
                    if self.mesh is not None:
                        from ..parallel import mesh_grid_offsets_bucket
                        zb = put(jnp.zeros((ncell_pad * F,), dtype=dt))
                        planes = mesh_grid_offsets_bucket(
                            self.mesh, self.mesh_axis, use_rdelta,
                            B_eff, C_blk, n_hi, N, half,
                            put(pad_rows(dense.reshape(ncell, -1),
                                         ncell_pad)),
                            put(pad_rows(counts, ncell_pad)),
                            packed[sel_dev], gM, table_z, g2,
                            float(self.epsilon_max), L, res, bins0,
                            (zb,) * dim,
                            k_static=(max(int(K), 1) if device
                                      else None),
                            gprops=gprops)
                    else:
                        pass_fn = (gcm.grid_offsets_pass_2d if gm.is2D
                                   else gcm.grid_offsets_pass)
                        planes = pass_fn(
                            use_rdelta, B_eff, C_blk, n_hi, N, half,
                            dense, counts, packed[sel_dev], gM, table_z,
                            g2, float(self.epsilon_max), dt.type(L),
                            dt.type(res), dt.type(bins0),
                            *(jnp.zeros((N ** dim,), dtype=dt)
                              for _ in range(dim)),
                            k_static=(max(int(K), 1) if device else None),
                            gprops=gprops)
                    inv = put_rm(self._grid_inv_perm(N, B_eff))
                    offsets = tuple(_permute_add(o, p, inv)
                                    for o, p in zip(offsets, planes))

            offsets_d = tuple(jnp.where(jnp.isfinite(o), o, 0.0)
                              for o in offsets)
            if self.mesh is not None:
                from ..parallel import mesh_grid_cic
                vals = jnp.asarray(orig_map.reshape(-1), dtype=dt)
                new_map_d = mesh_grid_cic(
                    self.mesh, self.mesh_axis, N, vals, offsets_d)
                if device:
                    return new_map_d
                new_map = np.asarray(new_map_d)
            else:
                new_map_d = self._cic_offsets(gm, offsets_d, orig_map, dt)
                if device:
                    return new_map_d
                new_map = np.asarray(new_map_d)
        new_sum, old_sum = new_map.sum(), orig_map.sum()
        assert np.isclose(new_sum, old_sum), (
            "ERROR in pixel regridding, sum(new_map) [%0.14e] != "
            "sum(oldmap) [%0.14e]" % (new_sum, old_sum))
        return new_map

    def process_device(self, table=None):
        """Differentiable, device-resident counterpart of
        :meth:`process` (cf. ``BaryonifyShell.process_device``,
        shell.py). Geometry (buckets, registration, packed records)
        is staged from concrete halo positions and the
        epsilon_max * R_Delta reach only — table-independent — so
        ``table`` (default ``model._table``) may be a TRACED array and
        ``jax.grad`` flows from any scalar of the returned map back
        through the kernels into the displacement table, and on into
        physical parameters via ``build_table_device``. Covers BOTH
        formulations: the 3D cell-major pass (static ``k_static`` trip
        counts) and the windowed-scatter one — the only 2D path,
        including ``use_ellipticity`` (the Pallas scatter carries an
        exact custom VJP, so this also works on TPU). Returns the new
        map as a device array; no conservation assert. With ``mesh=``
        the cell-major pipeline runs sharded over Morton blocks with
        static trip counts and a psum-joined CIC — shard_map and psum
        both carry transpose rules, so ``jax.grad`` flows through the
        multi-chip pass (cf. ``BaryonifyShell.process_device``)."""
        cosmo = Cosmology.from_dict(self.cosmo)
        model = self.model
        if table is None:
            if not hasattr(model, '_table'):
                raise NameError("Displacement model has no table. Run "
                                "setup_interpolator() first")
            table = model._table
        gm = self.GriddedMap
        orig_map = np.asarray(gm.map, dtype=np.float64)
        a, arrs = self._halo_arrays(cosmo, comoving_R=False)
        R_q = np.clip(self.epsilon_max * arrs['R'] / a, 0,
                      np.max(gm.bins) / 2)
        Nsize = (2 * R_q / gm.res).astype(np.int64) // 2 * 2
        keep = Nsize >= 2
        use_rdelta = bool(getattr(model, 'Rdelta_sampling', False))
        dim = 2 if gm.is2D else 3
        dt = self.dtype
        R_com = arrs['R'] / a
        idx_all = np.where(keep)[0]
        if self.method == "cellmajor":
            return self._process_cellmajor(gm, a, arrs, R_com, Nsize,
                                           idx_all, use_rdelta, orig_map,
                                           table=table, device=True)
        from contextlib import nullcontext
        from ..utils import x64_disabled
        hot_ctx = (x64_disabled() if dt == jnp.dtype('float32')
                   else nullcontext())
        with hot_ctx:
            grids_d = tuple(g.astype(dt) for g in model._grids)
            table_d = jnp.asarray(table).astype(dt)
            zeros = jnp.zeros((gm.Npix ** dim,), dtype=dt)
            offsets = self._windowed_offsets(gm, a, arrs, R_com, Nsize,
                                             idx_all, use_rdelta, grids_d,
                                             table_d, dt, (zeros,) * dim)
            offsets_d = tuple(jnp.where(jnp.isfinite(o), o, 0.0)
                              for o in offsets)
            return self._cic_offsets(gm, offsets_d, orig_map, dt)


class PaintProfilesGrid(DefaultRunnerGrid):
    """Paint profiles onto a 2D/3D grid (reference
    `Map2DRunner.py:618-814`): 2D grids use the projected table, 3D grids
    the real-space table."""

    def process(self):
        cosmo = Cosmology.from_dict(self.cosmo)
        model = self.model
        gm = self.GriddedMap

        p_keys = getattr(model, 'p_keys', []) or []
        if len(p_keys) > 0:
            from ..tabulate import ParamTabulatedProfile
            assert isinstance(model, ParamTabulatedProfile), (
                f"You asked to use {p_keys} properties in painting. You "
                f"must pass a ParamTabulatedProfile as the model.")
        attr = '_ln2D' if gm.is2D else '_ln3D'
        if not hasattr(model, attr):
            raise NameError(
                "PaintProfilesGrid requires a tabulated model "
                "(TabulatedProfile / ParamTabulatedProfile).")
        table = getattr(model, attr)

        dim_out = 2 if gm.is2D else 3
        if self.HaloNDCatalog.cat.size == 0:
            # empty catalog paints nothing (Map2DRunner.py:676 loop)
            return np.zeros((gm.Npix,) * dim_out, dtype=np.float64)

        a, arrs = self._halo_arrays(cosmo, comoving_R=True)
        R_com = arrs['R']
        Nsize = (2 * self.epsilon_max * R_com / gm.res).astype(np.int64)
        Nsize = np.clip(Nsize // 2 * 2, 2, len(gm.bins) // 2)

        if self.method == "cellmajor":
            return self._paint_cellmajor(gm, a, arrs, R_com, Nsize, table)

        dim = 2 if gm.is2D else 3
        dt = self.dtype
        from contextlib import nullcontext
        from ..utils import x64_disabled
        hot_ctx = (x64_disabled() if dt == jnp.dtype('float32')
                   else nullcontext())
        with hot_ctx:
            grids_d = tuple(g.astype(dt) for g in model._grids)
            table_d = table.astype(dt)
            new_map = self._windowed_paint(
                gm, a, arrs, R_com, Nsize, grids_d, table_d, dt,
                jnp.zeros((gm.Npix ** dim,), dtype=dt))
            new_map = np.asarray(new_map)
        if gm.is2D:
            return new_map.reshape(gm.Npix, gm.Npix)
        return new_map.reshape(gm.Npix, gm.Npix, gm.Npix)

    def process_device(self, table=None):
        """Differentiable, device-resident counterpart of
        :meth:`process` (cf. ``PaintProfilesShell.process_device``).
        ``table`` (default ``model._ln2D`` for 2D maps, ``_ln3D`` for
        3D) may be TRACED — gradients flow from any scalar of the
        painted map back into the log-profile table and on into gas
        parameters via ``build_tables_device``. Works for both the 3D
        cell-major formulation and the windowed one (the only 2D
        path). With ``mesh=`` the cell-major pass runs sharded over
        Morton blocks with static trip counts and stays differentiable
        (cf. ``BaryonifyGrid.process_device``)."""
        cosmo = Cosmology.from_dict(self.cosmo)
        model = self.model
        gm = self.GriddedMap
        if table is None:
            attr = '_ln2D' if gm.is2D else '_ln3D'
            if not hasattr(model, attr):
                raise NameError(
                    "PaintProfilesGrid requires a tabulated model "
                    "(TabulatedProfile / ParamTabulatedProfile).")
            table = getattr(model, attr)
        a, arrs = self._halo_arrays(cosmo, comoving_R=True)
        R_com = arrs['R']
        Nsize = (2 * self.epsilon_max * R_com / gm.res).astype(np.int64)
        Nsize = np.clip(Nsize // 2 * 2, 2, len(gm.bins) // 2)
        if self.method == "cellmajor":
            return self._paint_cellmajor(gm, a, arrs, R_com, Nsize,
                                         table, device=True)
        dim = 2 if gm.is2D else 3
        dt = self.dtype
        from contextlib import nullcontext
        from ..utils import x64_disabled
        hot_ctx = (x64_disabled() if dt == jnp.dtype('float32')
                   else nullcontext())
        with hot_ctx:
            grids_d = tuple(g.astype(dt) for g in model._grids)
            table_d = jnp.asarray(table).astype(dt)
            new_map = self._windowed_paint(
                gm, a, arrs, R_com, Nsize, grids_d, table_d, dt,
                jnp.zeros((gm.Npix ** dim,), dtype=dt))
        if gm.is2D:
            return new_map.reshape(gm.Npix, gm.Npix)
        return new_map.reshape(gm.Npix, gm.Npix, gm.Npix)

    def _paint_cellmajor(self, gm, a, arrs, R_com, Nsize, table,
                         device=False):
        """Block-major dense painting (3D voxels or 2D flat-sky pixels;
        see grid_cellmajor.py). ``device=True``: traced-table
        differentiable core (static k_static trip counts, device-array
        return)."""
        from contextlib import nullcontext
        from ..utils import x64_disabled
        from . import grid_cellmajor as gcm
        model = self.model
        dt = self.dtype
        dim = 2 if gm.is2D else 3
        N = gm.Npix
        L = float(N * gm.res)
        res = gm.res
        self._check_gcaches()
        hot_ctx = (x64_disabled() if dt == jnp.dtype('float32')
                   else nullcontext())
        with hot_ctx:
            gz, gM, g2 = (model._grids[0].astype(dt),
                          model._grids[1].astype(dt),
                          model._grids[2].astype(dt))
            gprops = tuple(g.astype(dt) for g in model._grids[3:])
            z_coord = float(np.log(1.0 / a))
            table_z, inb_z = gcm.blend_table_z(
                jnp.asarray(table).astype(dt), gz, dt.type(z_coord))
            # log-profile table: -inf/NaN nodes -> large negative FINITE
            # sentinel (exp -> 0; keeps the one-hot matmuls NaN-free)
            table_z = jnp.where(jnp.isfinite(table_z), table_z, -1e30)
            packed = self._grid_packed(arrs, R_com, dt)
            n_dev = (self.mesh.shape[self.mesh_axis]
                     if self.mesh is not None else 1)
            if self.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec
                from ..parallel import pad_cells_for_mesh, pad_rows
                sh = NamedSharding(self.mesh,
                                   PartitionSpec(self.mesh_axis))
                put = lambda x: jax.device_put(x, sh)
                put_rm = put if (N ** dim) % n_dev == 0 else (lambda x: x)
            else:
                put = put_rm = lambda x: x
            new_map = put_rm(jnp.zeros((N ** dim,), dtype=dt))
            g2_np = np.asarray(model._grids[2])
            idx_all = np.arange(len(R_com))
            if bool(inb_z):
                for bi, idx in enumerate(
                        _nsize_buckets(Nsize, self.n_buckets)):
                    sel = idx_all[idx]
                    half = int(Nsize[sel].max() // 2)
                    B = gcm.pick_block_size(N, max(half, 4))
                    reach = (half + 1) * res
                    dense, counts, K, B_eff = self._grid_dense(
                        bi, B, sel, arrs, reach,
                        self.epsilon_max * R_com[sel]
                        * arrs['qfac'][sel], dt)
                    nb = N // B_eff
                    F = B_eff ** dim
                    ncell = nb ** dim
                    if self.mesh is not None:
                        ncell_pad, C_blk = pad_cells_for_mesh(
                            ncell, n_dev, F)
                    else:
                        ncell_pad = ncell
                        C_blk = self._grid_cell_chunk(ncell, F)
                    rad_max = np.log(self.epsilon_max * R_com[sel].max())
                    n_hi = self._node_bound(g2_np, rad_max, len(g2_np))
                    if self.verbose:
                        print(f"Painting Profile: bucket {bi + 1} "
                              f"({len(sel)} halos, B={B}->{B_eff}, "
                              f"K={K}, F={F}, C={C_blk}, n_hi={n_hi}"
                              + (f", mesh x{n_dev})" if self.mesh
                                 is not None else ")"))
                    sel_dev = jnp.asarray(sel, dtype=jnp.int32)
                    bins0 = float(np.asarray(gm.bins)[0])
                    if self.mesh is not None:
                        from ..parallel import mesh_grid_paint_bucket
                        out_bm = mesh_grid_paint_bucket(
                            self.mesh, self.mesh_axis, B_eff, C_blk,
                            n_hi, N, half,
                            put(pad_rows(dense.reshape(ncell, -1),
                                         ncell_pad)),
                            put(pad_rows(counts, ncell_pad)),
                            packed[sel_dev], gM, table_z,
                            g2, float(self.epsilon_max), L, res, bins0,
                            put(jnp.zeros((ncell_pad * F,), dtype=dt)),
                            k_static=(max(int(K), 1) if device
                                      else None),
                            is2D=gm.is2D, gprops=gprops)
                    else:
                        paint_fn = (gcm.grid_paint_pass_2d if gm.is2D
                                    else gcm.grid_paint_pass)
                        out_bm = paint_fn(
                            B_eff, C_blk, n_hi, N, half, dense, counts,
                            packed[sel_dev], gM, table_z, g2,
                            float(self.epsilon_max), dt.type(L),
                            dt.type(res), dt.type(bins0),
                            jnp.zeros((N ** dim,), dtype=dt),
                            k_static=(max(int(K), 1) if device else None),
                            gprops=gprops)
                    inv = put_rm(self._grid_inv_perm(N, B_eff))
                    new_map = _permute_add(new_map, out_bm, inv)
            shape = (N, N) if gm.is2D else (N, N, N)
            if device:
                return new_map.reshape(shape)
            new_map = np.asarray(new_map)
        return new_map.reshape(shape)


class PaintProfilesAnisGrid(DefaultRunnerGrid):
    """Density-dependent painting (reference `Map2DRunner.py:818-940`):
    per halo, build the radial (Paint, Canvas) profile pair, construct the
    monotone Canvas -> Paint mapping, and evaluate it on the *existing*
    map values — painting y(delta) instead of y(r). 2D only.

    Two formulations:

    - ``method='scatter'`` (CPU default): the reference's host loop —
      per halo, exact profile pair on a per-halo radius grid and a
      1000-point monotone log-log interp evaluated on the halo's cutout.
    - ``method='cellmajor'`` (accelerator default; takes ``mesh=``): the
      remap ln Paint(ln Canvas) is tabulated ONCE per (M [, prop...])
      node on a uniform global ln-canvas grid (``Nq_interp`` nodes) at
      the catalog redshift, then a single block-major dense pass per
      bucket reads it with the same one-hot (M x prop) blend +
      hat-basis readout as the radial paint kernels — the readout
      coordinate is the log of the existing map value
      (`grid_cellmajor.grid_anis_paint_pass_2d`). Painting is additive,
      so ``mesh=`` shards the Morton block axis with a psum join, the
      reference's SplitJoinParallel contract
      (`utils/Parallelize.py:297-319`).
    """

    def __init__(self, HaloNDCatalog, GriddedMap, epsilon_max,
                 Painting_model=None, Canvas_model=None, Nbin_interp=1000,
                 Nq_interp=96, mass_def=None, verbose=True, halo_chunk=64,
                 n_buckets=8, precision="auto", method="auto", mesh=None,
                 mesh_axis=None):
        super().__init__(HaloNDCatalog, GriddedMap, epsilon_max,
                         Painting_model, mass_def=mass_def, verbose=verbose,
                         halo_chunk=halo_chunk, n_buckets=n_buckets,
                         precision=precision, method=method, mesh=mesh,
                         mesh_axis=mesh_axis)
        self.Canvas_model = Canvas_model
        self.Nbin_interp = Nbin_interp
        self.Nq_interp = Nq_interp

    def _anis_remap_table(self, cosmo, a):
        """Cached :meth:`_anis_remap_table_impl`: the remap depends only
        on (models, a, epsilon_max, grid geometry, interp sizes) — all
        fixed for the runner's lifetime — so repeated process() calls
        (steady-state timing, parameter sweeps reusing the runner) must
        not re-run the NM x prod(P) host profile quadratures. Cleared on
        catalog swap by _check_gcaches (the mass grid can derive from
        catalog masses)."""
        gm = self.GriddedMap
        key = (id(self.model), id(self.Canvas_model), float(a),
               float(self.epsilon_max), float(gm.res), gm.Npix,
               float(np.asarray(gm.bins)[0]), self.Nq_interp,
               self.Nbin_interp)
        cached = getattr(self, '_anis_remap_cache', None)
        if cached is not None and cached[0] == key:
            return cached[1]
        out = self._anis_remap_table_impl(cosmo, a)
        self._anis_remap_cache = (key, out)
        return out

    def _anis_remap_table_impl(self, cosmo, a):
        """Tabulate ln Paint as a function of ln Canvas on a uniform
        global ln-canvas grid, per (M [, prop...]) node.

        Each node's (Paint, Canvas) pair is evaluated on the SAME radius
        domain the host loop uses for a halo of that node mass —
        [1e-6, sqrt(2) * half * res] with half the halo's cutout
        half-window — so the per-node valid canvas range matches the
        reference's per-halo interp domain (values outside it are
        NaN -> masked zero there; `Map2DRunner.py:899-918`). The node's
        [lnC_min, lnC_max] range rides as TWO EXTRA ROWS of the remap
        table (indices Nq, Nq+1), blended by the kernel alongside the
        profile rows so the range test is per-slot exact at the nodes.

        Returns (lnq_grid (Nq,), gM (NM,), gprops tuple, remap
        (NM, Nq + 2 [, P...])) in float64; degenerate nodes carry an
        inverted range (+1e30, -1e30), which blends to an empty
        in-range window.
        """
        from itertools import product
        Paint, Canvas = self.model, self.Canvas_model
        gm = self.GriddedMap
        p_keys = getattr(Paint, 'p_keys', []) or []
        if p_keys:
            from ..tabulate import ParamTabulatedProfile
            from .grid_cellmajor import MAX_PROPS_ANIS_2D
            assert isinstance(Paint, ParamTabulatedProfile), (
                "per-halo properties on the cell-major anis path need a "
                "ParamTabulatedProfile Painting_model (its prop grids "
                "define the table axes)")
            assert len(p_keys) <= MAX_PROPS_ANIS_2D, (
                f"the cell-major anis path fits at most "
                f"{MAX_PROPS_ANIS_2D} extra parameter axes (the last "
                f"packed column carries the per-halo window half); got "
                f"{len(p_keys)} — use method='scatter'")
            gprops = tuple(np.asarray(g, dtype=np.float64)
                           for g in Paint._grids[3:])
        else:
            gprops = ()

        lnM_cat = np.log(self.HaloNDCatalog.cat['M'].astype(np.float64))
        if hasattr(Paint, '_grids'):
            gM = np.asarray(Paint._grids[1], dtype=np.float64)
        else:
            lo, hi = lnM_cat.min(), lnM_cat.max()
            pad = max(0.05 * (hi - lo), 1e-3)
            gM = np.linspace(lo - pad, hi + pad, 33)
        M_nodes = np.exp(gM)

        # per-node radius domain = the host loop's per-halo one
        R_nodes = np.atleast_1d(np.asarray(
            self.mass_def.get_radius(cosmo, M_nodes, a))) / a
        Nsize_n = (2 * self.epsilon_max * R_nodes
                   / gm.res).astype(np.int64) // 2 * 2
        half_n = np.maximum(Nsize_n // 2, 1)
        r_hi_n = np.sqrt(2.0) * half_n * gm.res

        combos = list(product(*[range(len(g)) for g in gprops])) \
            if gprops else [()]
        Nq = self.Nq_interp
        lnP_n = np.empty((len(M_nodes), self.Nbin_interp, len(combos)))
        lnC_n = np.empty_like(lnP_n)
        good_n = np.zeros(lnP_n.shape, dtype=bool)
        for mi, M_i in enumerate(M_nodes):
            r_arr = np.geomspace(1e-6, max(r_hi_n[mi], 2e-6),
                                 self.Nbin_interp)
            for ci, combo in enumerate(combos):
                o = {k: gprops[i][combo[i]] for i, k in enumerate(p_keys)}
                P = np.asarray(Paint.projected(cosmo, r_arr, M_i, a, **o))
                C = np.asarray(Canvas.projected(cosmo, r_arr, M_i, a,
                                                **o))
                g = (np.isfinite(P) & np.isfinite(C) & (P > 0) & (C > 0))
                good_n[mi, :, ci] = g
                with np.errstate(invalid='ignore', divide='ignore'):
                    lnP_n[mi, :, ci] = np.log(np.where(g, P, 1.0))
                    lnC_n[mi, :, ci] = np.log(np.where(g, C, 1.0))
        if not good_n.any():
            raise ValueError("anis remap: no valid (Paint, Canvas) "
                             "profile points at any table node")
        lnq_lo = lnC_n[good_n].min()
        lnq_hi = lnC_n[good_n].max()
        lnq_grid = np.linspace(lnq_lo, lnq_hi, Nq)

        remap = np.full((len(M_nodes), Nq + 2, len(combos)), -1e30)
        remap[:, Nq, :] = 1e30       # lnC_min sentinel (empty range)
        remap[:, Nq + 1, :] = -1e30  # lnC_max sentinel
        for mi in range(len(M_nodes)):
            for ci in range(len(combos)):
                g = good_n[mi, :, ci]
                if g.sum() < 2:
                    continue
                lnC = lnC_n[mi, g, ci]
                lnP = lnP_n[mi, g, ci]
                s = np.argsort(lnC)
                # endpoint-clamped rows; the range test is separate
                remap[mi, :Nq, ci] = np.interp(lnq_grid, lnC[s], lnP[s])
                remap[mi, Nq, ci] = lnC[s][0]
                remap[mi, Nq + 1, ci] = lnC[s][-1]
        shape = (len(M_nodes), Nq + 2) + tuple(len(g) for g in gprops)
        return lnq_grid, gM, gprops, remap.reshape(shape)

    def _paint_anis_cellmajor(self, gm, cosmo, a, arrs, R_com, Nsize,
                              device=False, remap=None, canvas=None):
        """Block-major dense density-dependent painting (see
        grid_cellmajor.grid_anis_paint_pass_2d). ``device=True``: the
        differentiable core — ``remap`` (the (NM, Nq+2[, P...]) ln-remap
        table) and ``canvas`` (the existing map, (N, N)) may be TRACED,
        trip counts are static (``k_static``), and the painted map
        returns as a device array with no host conversion."""
        from contextlib import nullcontext
        from ..utils import x64_disabled
        from . import grid_cellmajor as gcm
        dt = self.dtype
        N = gm.Npix
        L = float(N * gm.res)
        res = gm.res
        self._check_gcaches()
        # geometry (lnq grid, M nodes, prop grids) is always the host
        # builder's — a static discretization, like the k_static trip
        # bounds elsewhere; only the remap VALUES may be traced
        lnq_np, gM_np, gprops_np, remap_host = \
            self._anis_remap_table(cosmo, a)
        if remap is None:
            remap = remap_host
        hot_ctx = (x64_disabled() if dt == jnp.dtype('float32')
                   else nullcontext())
        with hot_ctx:
            lnq = jnp.asarray(lnq_np).astype(dt)
            gM = jnp.asarray(gM_np).astype(dt)
            gprops = tuple(jnp.asarray(g).astype(dt) for g in gprops_np)
            table_q = jnp.asarray(remap).astype(dt)
            table_q = jnp.where(jnp.isfinite(table_q), table_q, -1e30)
            packed = self._grid_packed(arrs, R_com, dt)
            n_dev = (self.mesh.shape[self.mesh_axis]
                     if self.mesh is not None else 1)
            if self.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec
                from ..parallel import pad_cells_for_mesh, pad_rows
                sh = NamedSharding(self.mesh,
                                   PartitionSpec(self.mesh_axis))
                put = lambda x: jax.device_put(x, sh)
                put_rm = put if (N * N) % n_dev == 0 else (lambda x: x)
            else:
                put = put_rm = lambda x: x
            new_map = put_rm(jnp.zeros((N * N,), dtype=dt))
            if canvas is None:
                canvas_rm = jnp.asarray(
                    np.asarray(gm.map, dtype=np.float64).reshape(-1)
                ).astype(dt)
            else:
                canvas_rm = jnp.asarray(canvas).reshape(-1).astype(dt)
            n_hi = self.Nq_interp
            idx_all = np.where(Nsize >= 2)[0]   # host-loop keep mask
            for bi, idx in enumerate(
                    _nsize_buckets(Nsize[idx_all], self.n_buckets)):
                sel = idx_all[idx]
                half = int(Nsize[sel].max() // 2)
                B = gcm.pick_block_size(N, max(half, 4))
                reach = (half + 1) * res
                dense, counts, K, B_eff = self._grid_dense(
                    bi, B, sel, arrs, reach,
                    self.epsilon_max * R_com[sel]
                    * arrs['qfac'][sel], dt)
                nb = N // B_eff
                F = B_eff ** 2
                ncell = nb ** 2
                if self.mesh is not None:
                    ncell_pad, C_blk = pad_cells_for_mesh(
                        ncell, n_dev, F)
                else:
                    ncell_pad = ncell
                    C_blk = self._grid_cell_chunk(ncell, F)
                if self.verbose:
                    print(f"Anis Painting: bucket {bi + 1} "
                          f"({len(sel)} halos, B={B}->{B_eff}, "
                          f"K={K}, F={F}, C={C_blk}, n_hi={n_hi}"
                          + (f", mesh x{n_dev})" if self.mesh
                             is not None else ")"))
                sel_dev = jnp.asarray(sel, dtype=jnp.int32)
                # per-halo cutout half-window (the host loop's
                # Nsize[j] // 2) rides in the packed records' last
                # column — a shared bucket-max window would paint
                # outside smaller halos' cutout squares
                packed_b = packed[sel_dev].at[
                    :, gcm.ANIS_HALF_COL_2D].set(
                    jnp.asarray(Nsize[sel] // 2).astype(dt))
                bins0 = float(np.asarray(gm.bins)[0])
                # canvas in this bucket's block-major order
                perm = gcm.block_perm_2d(N, B_eff)
                canvas_bm = canvas_rm[perm]
                if self.mesh is not None:
                    from ..parallel import mesh_grid_anis_paint_bucket
                    canvas_pad = jnp.zeros((ncell_pad * F,), dtype=dt)
                    canvas_pad = canvas_pad.at[:N * N].set(canvas_bm)
                    out_bm = mesh_grid_anis_paint_bucket(
                        self.mesh, self.mesh_axis, B_eff, C_blk,
                        n_hi, N,
                        put(pad_rows(dense.reshape(ncell, -1),
                                     ncell_pad)),
                        put(pad_rows(counts, ncell_pad)),
                        packed_b, gM, table_q,
                        lnq, float(self.epsilon_max), L, res, bins0,
                        put(canvas_pad),
                        put(jnp.zeros((ncell_pad * F,), dtype=dt)),
                        k_static=(max(int(K), 1) if device else None),
                        gprops=gprops)
                else:
                    out_bm = gcm.grid_anis_paint_pass_2d(
                        B_eff, C_blk, n_hi, N, dense, counts,
                        packed_b, gM, table_q, lnq,
                        float(self.epsilon_max), dt.type(L),
                        dt.type(res), dt.type(bins0), canvas_bm,
                        jnp.zeros((N * N,), dtype=dt),
                        k_static=(max(int(K), 1) if device else None),
                        gprops=gprops)
                inv = put_rm(self._grid_inv_perm(N, B_eff))
                new_map = _permute_add(new_map, out_bm, inv)
            if device:
                return new_map.reshape(N, N)
            new_map = np.asarray(new_map)
        return new_map.reshape(N, N)

    def process(self):
        assert self.GriddedMap.is2D, ("Can only paint tSZ on 2D maps. "
                                      "You have passed a 3D Map")
        cosmo = Cosmology.from_dict(self.cosmo)
        gm = self.GriddedMap
        Paint, Canvas = self.model, self.Canvas_model
        assert (list(getattr(Paint, 'p_keys', []) or [])
                == list(getattr(Canvas, 'p_keys', []) or []))

        if self.HaloNDCatalog.cat.size == 0:
            # empty catalog paints nothing (Map2DRunner.py:868 loop)
            return np.zeros((gm.Npix, gm.Npix), dtype=np.float64)

        a, arrs = self._halo_arrays(cosmo, comoving_R=True)
        R_com = arrs['R']
        Nsize = (2 * self.epsilon_max * R_com / gm.res).astype(np.int64)
        Nsize = Nsize // 2 * 2
        keep = Nsize >= 2

        if self.method == "cellmajor":
            # clip the cutout window to the map (the host loop would
            # wrap-and-double-count there; stay out of that regime)
            Nsize_eff = np.where(keep,
                                 np.clip(Nsize, 2, gm.Npix), 0)
            return self._paint_anis_cellmajor(gm, cosmo, a, arrs, R_com,
                                              Nsize_eff)

        orig_flat = np.asarray(gm.map, dtype=np.float64).reshape(-1)
        new_map = np.zeros_like(orig_flat)
        cat = self.HaloNDCatalog.cat
        p_keys = getattr(Paint, 'p_keys', []) or []

        # host loop (this runner is rarely hot; the per-halo work is a
        # device-side table readout + monotone remap)
        for j in np.where(keep)[0]:
            o_j = {k: cat[k][j] for k in p_keys}
            half = int(Nsize[j] // 2)
            x_cen = int(np.argmin(np.abs(gm.bins - cat['x'][j])))
            y_cen = int(np.argmin(np.abs(gm.bins - cat['y'][j])))
            x_inds = np.mod(np.arange(x_cen - half, x_cen + half), gm.Npix)
            y_inds = np.mod(np.arange(y_cen - half, y_cen + half), gm.Npix)
            xx = (np.arange(2 * half) - half) * gm.res
            gx, gy = np.meshgrid(xx, xx, indexing='ij')
            r_grid = np.sqrt(gx**2 + gy**2).reshape(-1)
            flat = (x_inds[:, None] * gm.Npix + y_inds[None, :]).reshape(-1)

            r_arr = np.geomspace(max(r_grid.min(), 1e-6), r_grid.max(),
                                 self.Nbin_interp)
            P = np.asarray(Paint.projected(cosmo, r_arr, cat['M'][j], a,
                                           **o_j))
            C = np.asarray(Canvas.projected(cosmo, r_arr, cat['M'][j], a,
                                            **o_j))
            good = np.isfinite(P) & np.isfinite(C) & (P > 0) & (C > 0)
            if good.sum() < 2:
                continue
            P, C = P[good], C[good]
            s = np.argsort(C)
            lnC, lnP = np.log(C[s]), np.log(P[s])
            vals = orig_flat[flat]
            lnv = np.where(vals > 0, np.log(np.maximum(vals, 1e-300)),
                           np.nan)
            painted = np.exp(np.interp(lnv, lnC, lnP,
                                       left=np.nan, right=np.nan))
            mask = np.isfinite(painted) & (r_grid < R_com[j]
                                           * self.epsilon_max)
            new_map[flat] += np.where(mask, painted, 0.0)

        return new_map.reshape(gm.Npix, gm.Npix)

    def process_device(self, remap=None, canvas=None):
        """Differentiable, device-resident counterpart of
        :meth:`process` (always the cell-major formulation — the
        reference's per-halo host loop, `Map2DRunner.py:818-940`, has no
        device analog). Both inputs may be TRACED:

        - ``remap``: the (NM, Nq + 2 [, P...]) ln Paint(ln Canvas) remap
          table (default: the host-built :meth:`_anis_remap_table`
          values). Build it differentiably from traced profile tables
          with :meth:`build_remap_device` to chain gradients from gas
          parameters into the painted y(delta) map.
        - ``canvas``: the existing map, (N, N) (default
          ``GriddedMap.map``). Passing a traced map composes the anis
          painter after ``BaryonifyGrid.process_device`` — gradients of
          the density-dependent painting w.r.t. the underlying
          (baryonified) density map itself.

        The lnq grid, mass nodes and prop grids stay the host builder's
        static discretization, exactly like the ``k_static`` trip bounds
        of the other device cores. With ``mesh=`` the sharded pass stays
        differentiable (psum join; cf. ``PaintProfilesGrid``)."""
        assert self.GriddedMap.is2D, ("Can only paint tSZ on 2D maps. "
                                      "You have passed a 3D Map")
        cosmo = Cosmology.from_dict(self.cosmo)
        gm = self.GriddedMap
        Paint, Canvas = self.model, self.Canvas_model
        assert (list(getattr(Paint, 'p_keys', []) or [])
                == list(getattr(Canvas, 'p_keys', []) or []))
        if self.HaloNDCatalog.cat.size == 0:
            # empty catalog paints nothing (loop-over-nothing,
            # Map2DRunner.py:868); gradients w.r.t. unused traced
            # inputs are structural zeros
            return jnp.zeros((gm.Npix, gm.Npix), dtype=self.dtype)
        a, arrs = self._halo_arrays(cosmo, comoving_R=True)
        R_com = arrs['R']
        Nsize = (2 * self.epsilon_max * R_com / gm.res).astype(np.int64)
        Nsize = Nsize // 2 * 2
        Nsize_eff = np.where(Nsize >= 2, np.clip(Nsize, 2, gm.Npix), 0)
        return self._paint_anis_cellmajor(gm, cosmo, a, arrs, R_com,
                                          Nsize_eff, device=True,
                                          remap=remap, canvas=canvas)

    def build_remap_device(self, paint_table=None, canvas_table=None):
        """Differentiable device-side build of the ln Paint(ln Canvas)
        remap table — :meth:`_anis_remap_table_impl` re-expressed as
        fixed-shape masked JAX ops.

        ``paint_table`` / ``canvas_table`` are the models' projected
        log-tables (default ``._ln2D``) and may be TRACED — e.g. from
        ``TabulatedProfile.build_tables_device`` on a model whose
        parameters are tracers; gradients then flow

        profile parameters -> ln2D tables -> remap -> painted map

        when the result feeds :meth:`process_device`. TabulatedProfile
        models only (no extra prop axes — those use the host builder).

        Node-for-node match with the host builder: the same per-node
        radius domain [1e-6, sqrt(2) * half * res] (the host loop's
        per-halo interp domain at the node mass, `Map2DRunner.py:899-918`),
        the same good-point mask (finite, positive profile pairs — here
        a fixed-shape where-mask over the log readouts), the same
        endpoint-clamped linear resampling onto the host lnq grid
        (queries clipped into the node's valid canvas range), and the
        same degenerate-node sentinels (inverted range -> empty
        in-range window; a fully-degenerate table paints zeros instead
        of raising). Returns the (NM, Nq + 2) remap in float64."""
        from ..ops.interp import ndlinear_interp
        Paint, Canvas = self.model, self.Canvas_model
        assert not (getattr(Paint, 'p_keys', []) or []), (
            "build_remap_device supports TabulatedProfile models only "
            "(no extra parameter axes) — per-halo-property remaps use "
            "the host _anis_remap_table builder")
        for m, name in ((Paint, "Painting_model"), (Canvas,
                                                    "Canvas_model")):
            if not hasattr(m, '_grids'):
                raise NameError(f"{name} has no table — run "
                                "setup_interpolator() first")
        cosmo = Cosmology.from_dict(self.cosmo)
        gm = self.GriddedMap
        a = 1.0 / (1.0 + self.HaloNDCatalog.redshift)
        # static geometry (lnq grid, M nodes) from the host builder
        lnq_np, gM_np, _gprops, _remap_host = \
            self._anis_remap_table(cosmo, a)
        if paint_table is None:
            paint_table = Paint._ln2D
        if canvas_table is None:
            canvas_table = Canvas._ln2D

        M_nodes = np.exp(gM_np)
        R_nodes = np.atleast_1d(np.asarray(
            self.mass_def.get_radius(cosmo, M_nodes, a))) / a
        Nsize_n = (2 * self.epsilon_max * R_nodes
                   / gm.res).astype(np.int64) // 2 * 2
        half_n = np.maximum(Nsize_n // 2, 1)
        r_hi_n = np.sqrt(2.0) * half_n * gm.res
        lnr_nodes = jnp.asarray(np.log(np.stack([
            np.geomspace(1e-6, max(r_hi_n[mi], 2e-6), self.Nbin_interp)
            for mi in range(len(M_nodes))])))
        z_coord = float(np.log(1.0 / a))

        # -inf/NaN table nodes -> inert finite sentinel (exp -> 0), so
        # the multilinear readout and its VJP stay NaN-free
        pt = jnp.where(jnp.isfinite(paint_table), paint_table, -1e30)
        ct = jnp.where(jnp.isfinite(canvas_table), canvas_table, -1e30)
        pgrids, cgrids = tuple(Paint._grids), tuple(Canvas._grids)
        lnq = jnp.asarray(lnq_np)
        nb = self.Nbin_interp

        def one_node(lnM_i, lnr_i):
            zc = jnp.full_like(lnr_i, z_coord)
            mc = jnp.full_like(lnr_i, lnM_i)
            # out-of-table radii read NaN (RegularGridInterpolator
            # semantics, same as the host's projected()); every NaN is
            # where-masked before any arithmetic touches it
            lnP = ndlinear_interp(pgrids, pt, (zc, mc, lnr_i))
            lnC = ndlinear_interp(cgrids, ct, (zc, mc, lnr_i))
            # host mask semantics exactly: exp(ln) > 0 in float64 (the
            # host builder masks on the positive profile VALUES; NaN
            # log-readouts give exp(NaN) = NaN > 0 == False). Comparisons
            # carry no cotangent, so this stays NaN-grad-safe.
            good = (jnp.exp(lnP) > 0.0) & (jnp.exp(lnC) > 0.0)
            n_good = jnp.sum(good)
            j = jnp.arange(nb, dtype=lnr_i.dtype)
            # push masked points beyond every real canvas value (the +j
            # already de-ties the sentinel tail), sort, then break only
            # EXACT ties so the interp VJP never divides by 0 — real
            # (good) canvas coordinates stay bit-exact unless tied
            x = jnp.where(good, lnC, 1e15 + j)
            s = jnp.argsort(x)
            xs = x[s]
            tie = jnp.concatenate([jnp.zeros((1,), bool),
                                   xs[1:] <= xs[:-1]])
            xs = xs + jnp.cumsum(tie.astype(xs.dtype)) * 1e-12
            ys = jnp.where(good, lnP, 0.0)[s]
            lo = jnp.min(jnp.where(good, lnC, 1e30))
            hi = jnp.max(jnp.where(good, lnC, -1e30))
            # endpoint clamping via query clip = np.interp's clamp over
            # the good points only (the masked tail is never reached)
            row = jnp.interp(jnp.clip(lnq, lo, hi), xs, ys)
            okn = n_good >= 2
            return jnp.concatenate([
                jnp.where(okn, row, -1e30),
                jnp.where(okn, lo, 1e30)[None],
                jnp.where(okn, hi, -1e30)[None]])

        return jax.vmap(one_node)(jnp.asarray(gM_np), lnr_nodes)
