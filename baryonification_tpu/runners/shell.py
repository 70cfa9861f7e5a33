"""Full-sky HEALPix shell runners: baryonify + profile painting.

TPU-native re-design of `/root/reference/BaryonForge/Runners/
HealpixRunner.py`. The reference iterates halos in Python, calling
healpy's query_disc per halo and a numba scatter at the end (`:291-341`);
here the whole pipeline is three device-resident stages:

  (A) per-halo gather: fixed-shape disc windows (bucketed by angular size
      so padding stays tight), vmapped over halo chunks;
  (B) displacement table lookup + unit-vector offset accumulation into
      full-sky per-component offset planes via one scatter-add per chunk —
      offsets from overlapping halos accumulate linearly *before*
      regridding, exactly like the reference (`:331-333`);
  (C) a single regrid: 4-neighbor bilinear weights for every displaced
      pixel and one conservative scatter-add (`regrid_pixels_hpix`
      equivalent), followed by the mass-conservation check (`:344-346`).

Painting (PaintProfilesShell) is stage (A) plus an additive value scatter
— no regrid — and therefore shards trivially over halos (the
SplitJoinParallel contract, `utils/Parallelize.py:297-319`).

Layout note: all 3-vector fields (pixel centers, offsets, deltas) ride as
separate 1-D component planes (SoA). A TPU-resident (N, 3) array is tiled
T(8, 128) — the minor dim pads to 128 lanes, 42x the logical size — which
both OOMs at NSIDE 1024 scale and multiplies HBM traffic.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from contextlib import nullcontext

from ..cosmology import Cosmology, MassDef
from ..ops import healpix as hpx
from ..ops.interp import blend_table_radial, radial_readout
from ..ops.scatter_pallas import scatter_add_accum
from ..utils import x64_disabled

__all__ = ['DefaultRunner', 'BaryonifyShell', 'PaintProfilesShell',
           'PaintProfilesAnisShell']


@jax.jit
def _pack_from_angles(theta, phi, D, a, R_com, M, props):
    """Fused build of the cell-major packed halo records (``props`` is
    the (H, n_props) extra-table-axis coordinate matrix, possibly
    zero-width)."""
    from .shell_cellmajor import pack_halo_records
    st = jnp.sin(theta)
    return pack_halo_records(st * jnp.cos(phi), st * jnp.sin(phi),
                             jnp.cos(theta), D, a, R_com,
                             jnp.log(R_com), jnp.log(1.0 / a), jnp.log(M),
                             props=props)


def _bucket_edges(radii, n_buckets):
    """Split halos into geometric angular-radius buckets (host-side).

    Each bucket spans at most a factor ~2 in radius, so the fixed-shape
    window padding wastes at most ~4x work within a bucket — a single
    global window sized for the largest halo would waste O(100x) on the
    smallest. Returns a list of index arrays.
    """
    radii = np.asarray(radii)
    r_max = radii.max()
    r_min = max(radii.min(), r_max / 2 ** n_buckets, 1e-12)
    edges = np.geomspace(r_min, r_max, n_buckets + 1)
    edges[0], edges[-1] = 0.0, np.inf
    out = []
    for lo, hi in zip(edges[:-1], edges[1:]):
        idx = np.where((radii > lo) & (radii <= hi))[0]
        if idx.size:
            out.append(idx)
    return out


def _buckets_by_nsidec(radii, nside, nside_c_min=1):
    """Group halos by their coarse-cell level (the cell-major pass's
    natural granularity): one dense pass per distinct nside_c instead of
    one per radius bucket. Merging radius buckets that share a level is
    a strict win — the per-cell candidate bound of the union is at most
    (and typically well below) the sum of the separate bounds, and each
    merged level saves one full-sky sweep. ``nside_c_min`` floors the
    coarseness so the cell count splits evenly over a device mesh."""
    radii = np.asarray(radii)
    t = np.sqrt(np.pi / 3.0) / np.maximum(radii, 1e-4)
    n_c = np.clip(2.0 ** np.round(np.log2(t)), nside_c_min,
                  nside).astype(np.int64)
    out = []
    for val in np.unique(n_c)[::-1]:          # fine -> coarse
        idx = np.where(n_c == val)[0]
        if idx.size:
            out.append((int(val), idx))
    return out


def _chunk_for(n_rings, n_phi, halo_chunk, budget=4_000_000):
    """Halo-chunk size bounded by a per-chunk gathered-pixel budget."""
    per_halo = n_rings * n_phi + 4
    return max(1, min(halo_chunk, budget // per_halo))


def _quantize_dim(x):
    """Round a window dimension up onto a coarse ladder so kernel shapes
    (and therefore compiles) are reused across buckets and runs."""
    if x <= 64:
        return int(-(-x // 8) * 8)
    if x <= 512:
        return int(-(-x // 64) * 64)
    return int(-(-x // 256) * 256)


def _window_dims(nside, radius_max):
    """Static (n_rings, n_phi) bounds for discs up to ``radius_max``."""
    ring_h = np.pi / (4 * nside)            # ring spacing
    n_rings = int(np.ceil(2 * radius_max / ring_h)) + 4
    # worst-case phi width: disc at colatitude ~radius from pole has
    # dphi ~ pi; bound via radius/sin(theta_min) with theta_min ~ radius
    n_phi = int(np.ceil(2.5 * radius_max * 4 * nside / np.pi)) + 8
    n_phi = min(_quantize_dim(n_phi), 4 * nside)
    n_rings = min(_quantize_dim(n_rings), 4 * nside - 1)
    return n_rings, n_phi


class DefaultRunner:
    """Shared configuration for the shell runners (reference
    `HealpixRunner.py:74-220`)."""

    def __init__(self, HaloLightConeCatalog, LightconeShell, epsilon_max,
                 model, use_ellipticity=False, mass_def=None, verbose=True,
                 halo_chunk=256, n_buckets=8, precision="auto",
                 method="auto", mesh=None, mesh_axis=None):
        self.HaloLightConeCatalog = HaloLightConeCatalog
        self.LightconeShell = LightconeShell
        self.cosmo = HaloLightConeCatalog.cosmology
        self.model = model
        self.epsilon_max = epsilon_max
        self.mass_def = mass_def if mass_def is not None else MassDef(200, 'critical')
        self.verbose = verbose
        self.halo_chunk = halo_chunk
        self.n_buckets = n_buckets
        self.use_ellipticity = use_ellipticity
        # multi-device execution: a jax.sharding.Mesh shards the NESTED
        # pixel/cell axis of the cell-major passes across devices (the
        # full process() pipeline — offsets, painting and the final
        # psum-joined regrid — runs sharded; see parallel.py)
        self.mesh = mesh
        self.mesh_axis = (mesh_axis if mesh_axis is not None
                          else (mesh.axis_names[0] if mesh is not None
                                else None))
        if mesh is not None and method == "auto":
            method = "cellmajor"
        if mesh is not None and method != "cellmajor":
            raise ValueError(
                "mesh= is only supported with the cell-major method (the "
                "cell axis is what shards); got method=%r" % (method,))
        # float32 on accelerators (f64 is software-emulated on TPU); the
        # conservation-critical regrid weights stay exact-sum by
        # construction, and the offset delta uses a cancellation-stable
        # form, so f32 is accurate at the 0.1%-map level.
        if precision == "auto":
            precision = ("float64" if jax.default_backend() == "cpu"
                         else "float32")
        self.dtype = jnp.dtype(precision)
        # 'cellmajor' = NESTED-order dense pass, per-slot data built by
        # matmuls + one packed row gather (TPU speed-of-light path;
        # extra table axes / per-halo property columns ride in the
        # packed records — up to shell_cellmajor.MAX_PROPS of them);
        # 'gather' = pixel-major dense pass (per-pixel gathers — slower
        # on TPU, kept for cross-checks); 'scatter' = halo-major windows
        # + Pallas/XLA scatter (exact reference-loop semantics incl. the
        # <4-pixel fallback). auto: cellmajor on accelerators, scatter
        # on CPU.
        from .shell_cellmajor import MAX_PROPS
        from ._method import resolve_method
        n_props = len(getattr(model, 'p_keys', []) or [])
        why_not = None
        if n_props > MAX_PROPS:
            why_not = (f"model has {n_props} extra parameter axes; "
                       f"the packed records fit at most {MAX_PROPS}")
        self.method = resolve_method(method, why_not, "scatter")
        if use_ellipticity:
            raise NotImplementedError(
                "use_ellipticity = True is not implemented for the "
                "curved-sky runner (parity with HealpixRunner.py:164).")

    # ----- stage profiling -----
    def _stage(self, label, t0, sync=None):
        """Record a wall-clock stage time when ``self.profile`` is set.

        ``sync`` forces completion of the stage's device work through a
        scalar readback (block_until_ready is not a reliable barrier on
        remote-TPU platforms — see CLAUDE.md). Results accumulate in
        ``self.stage_times`` as (label, seconds); profiling serializes
        the normally-async pipeline, so the per-stage sum exceeds the
        unprofiled wall time — use it for attribution, not as the
        headline number."""
        if not getattr(self, 'profile', False):
            return
        import time as _time
        if sync is not None:
            float(jnp.sum(sync))
        self.stage_times.append((label, _time.perf_counter() - t0))

    def _stage_t0(self):
        if not getattr(self, 'profile', False):
            return 0.0
        if not hasattr(self, 'stage_times'):
            self.stage_times = []
        import time as _time
        return _time.perf_counter()

    def build_Rmat(self, A, ref):
        """2x2 rotation aligning A with ref (API parity with the
        reference's unused ellipticity helper, `HealpixRunner.py:168-197`).
        """
        A = np.asarray(A, dtype=float)
        ref = np.asarray(ref, dtype=float)
        A = A / np.linalg.norm(A)
        ref = ref / np.linalg.norm(ref)
        ang = np.arccos(np.clip(np.dot(A, ref), -1, 1))
        return np.array([[np.cos(ang), -np.sin(ang)],
                         [np.sin(ang), np.cos(ang)]])

    def coord_array(self, *args):
        """Flatten and stack coordinate arrays (`HealpixRunner.py:200-220`)."""
        return np.vstack([np.asarray(a).flatten() for a in args]).T

    # ----- gather-path helpers -----
    @staticmethod
    def _pixel_block(npix, target=1 << 18):
        n_blocks = max(1, -(-npix // target))
        while npix % n_blocks:
            n_blocks += 1
        return npix // n_blocks

    def _cells_of_pixels(self, nside, nside_c):
        """Coarse cell id of every fine pixel (cached per nside_c;
        host-built once in f64 so the mapping is exact)."""
        cache = getattr(self, '_cell_cache', None)
        if cache is None:
            cache = {}
            self._cell_cache = cache
        if nside_c not in cache:
            with jax.default_device(jax.devices("cpu")[0]):
                theta, phi = hpx.pix2ang(nside,
                                         jnp.arange(hpx.npix(nside)))
                cells = np.asarray(hpx.ang2pix(nside_c, theta, phi))
            cache[nside_c] = jnp.asarray(cells, dtype=jnp.int32)
        return cache[nside_c]

    def _bucket_registration(self, bi, nside_c, sub, dt, r_b,
                             cell_map=None):
        """Coarse halo registration for bucket ``bi``, cached on the
        runner — the catalog is fixed per runner, so the spatial index
        is reusable across process() calls (the same amortization the
        reference gets from building its KDTree in __init__,
        `SnapshotRunner.py:97`). ``sub`` may be a dict of sliced arrays
        or a zero-arg callable producing one (evaluated on cache miss
        only — slicing eight 1e6-element host arrays per bucket per
        process() call costs ~1 s/run on a single-core host)."""
        cache = getattr(self, '_reg_cache', None)
        if cache is None:
            cache = {}
            self._reg_cache = cache
        key = (bi, nside_c, str(dt), cell_map is not None)
        if key not in cache:
            from . import shell_gather as sg
            if callable(sub):
                sub = sub()
            cache[key] = sg.coarse_halo_index(
                nside_c, jnp.asarray(sub['theta'], dtype=dt),
                jnp.asarray(sub['phi'], dtype=dt),
                jnp.asarray(sub['radius'], dtype=dt), dtype=dt,
                r_max=r_b, cell_map=cell_map)
        return cache[key]

    def _dense_candidates(self, bi, nside_c, sub, dt, r_b):
        """Dense NESTED-cell candidate matrix for the cell-major pass,
        cached per bucket like the registration (``sub`` as above).

        Returns (dense, counts, K, nside_c_eff): when profitable, the
        candidate lists are REFINED one or more levels below the
        registration level (see shell_cellmajor.refine_cell_candidates)
        — the pass's work is npix * K, and K carries a ~2x inflation
        from the conservative registration margin at the natural level,
        which each refinement level roughly halves."""
        cache = getattr(self, '_dense_cache', None)
        if cache is None:
            cache = {}
            self._dense_cache = cache
        key = (bi, nside_c, str(dt))
        if key not in cache:
            from . import shell_cellmajor as cm
            from .shell_gather import MARGIN
            if callable(sub):
                sub = sub()
            hids, cell_start, K = self._bucket_registration(
                bi, nside_c, sub, dt, r_b,
                cell_map=self._cell_map_nested(nside_c))
            # generous rounding: K_pad only sets the dense-matrix SHAPE
            # (the slot loop runs to the chunk-local max count), so a
            # coarse ladder buys compile sharing across buckets for free.
            # Above ~4M cells the 64-quantum dense matrix alone is GBs
            # (npix(2048) * 64 * 4B = 12.8 GB -> OOM), so huge-ncell
            # buckets drop to an 8-quantum — those shapes are rare, so
            # the compile-sharing loss is negligible.
            K = int(K)
            q = self._kpad_quantum(hpx.npix(nside_c))
            K_pad = max(q, -(-K // q) * q)
            dense, counts = cm.dense_cell_candidates(
                hpx.npix(nside_c), K_pad, hids, cell_start)
            nside = self.LightconeShell.NSIDE
            nsc = nside_c
            # refine while K is margin-dominated, the child level stays
            # within the validated margin range (<= 512), and enough
            # pixels per cell remain to amortize the per-slot blend
            # (refine_k_min is overridable, mainly so small-scale tests
            # can force the refined path)
            k_min = getattr(self, 'refine_k_min', 48)
            while (K >= k_min and 2 * nsc <= 512 and 2 * nsc <= nside
                   and (nside // (2 * nsc)) ** 2 >= 64):
                nsc *= 2
                cvx, cvy, cvz = self._cell_centers_nested(nsc, dt)
                th = jnp.asarray(sub['theta'], dtype=dt)
                ph = jnp.asarray(sub['phi'], dtype=dt)
                st = jnp.sin(th)
                reach = (jnp.asarray(sub['radius'], dtype=dt)
                         + dt.type(MARGIN * hpx.nside2resol(nsc)))
                zc = jnp.zeros_like(th)
                hrec = jnp.stack([st * jnp.cos(ph), st * jnp.sin(ph),
                                  jnp.cos(th), jnp.cos(reach),
                                  zc, zc, zc, zc], axis=-1)
                dense2d, counts, K_dev = cm.refine_cell_candidates(
                    hpx.npix(nsc), dense, counts, cvx, cvy, cvz, hrec)
                K = int(K_dev)
                q = self._kpad_quantum(hpx.npix(nsc))
                K_pad = max(q, -(-K // q) * q)
                dense = dense2d[:, :min(K_pad,
                                        dense2d.shape[1])].reshape(-1)
            if (getattr(self, 'low_memory', False)
                    and dense.size * dense.dtype.itemsize
                    > getattr(self, 'low_memory_bytes', 256 << 20)):
                # NSIDE >= 2048: holding every bucket's multi-GB dense
                # candidate matrix on device at once exceeds HBM —
                # recompute the huge ones per call and let each free
                # after its pass (small buckets stay cached/amortized)
                return (dense, counts, K, nsc)
            cache[key] = (dense, counts, K, nsc)
        return cache[key]

    @staticmethod
    def _kpad_quantum(ncell):
        """Dense-candidate K_pad quantum: 64 (compile sharing) while the
        matrix stays well under a GB, 8 for multi-million-cell buckets
        (NSIDE >= 2048 registration levels) to bound HBM."""
        return 64 if ncell <= (1 << 22) else 8

    def _cell_centers_nested(self, nside_c, dt):
        """NESTED-order cell-center unit-vector planes at an arbitrary
        (coarse) nside, device-built and cached."""
        cache = getattr(self, '_ctr_cache', None)
        if cache is None:
            cache = {}
            self._ctr_cache = cache
        key = (nside_c, str(dt))
        if key not in cache:
            rt = hpx.RingTables(nside_c, dtype=dt)
            n2r = hpx.nest2ring_all(nside_c)
            cache[key] = hpx.pixel_planes_device(nside_c, rt.z, rt.start,
                                                 rt.npr, rt.shift, p=n2r)
        return cache[key]

    def _cm_groups(self, arrs, nside, nsc_min):
        """Cell-major bucket grouping + per-group metadata, cached per
        catalog: (nside_c, device halo ids, r_b, R_com max). Steady-state
        process() calls then do no per-bucket host slicing at all.

        The pass level is floored at ``min_f_pixels`` pixels per cell
        (default 4, i.e. nside_c <= nside/2): at F = 1 the per-slot
        ``_blend_rows`` table reconstruction is amortized over a single
        pixel and dominates the pass — measured on the NSIDE=1024 tSZ
        paint surface, the F=1 bucket (171k small halos, K=6) cost
        0.88 s while the F=4 bucket processed 2.8x the halos in 0.37 s.
        Merging the F=1 level into its parent trades a slightly larger
        K for 4x blend amortization."""
        cache = getattr(self, '_groups_cache', None)
        if cache is None:
            cache = {}
            self._groups_cache = cache
        key = (nside, nsc_min)
        if key not in cache:
            f_min = int(getattr(self, 'min_f_pixels', 4))
            nsc_cap = max(1, nsc_min, nside // max(1, int(f_min ** 0.5)))
            groups = _buckets_by_nsidec(arrs['radius'], nsc_cap, nsc_min)
            cache[key] = [
                (nsc, idx, jnp.asarray(idx, dtype=jnp.int32),
                 float(arrs['radius'][idx].max()),
                 float(arrs['R_com'][idx].max()))
                for nsc, idx in groups]
        return cache[key]

    def _orig_map_nested(self, orig_map, n2r, dt):
        """Device-resident NESTED-order copy of the shell's mass map,
        cached on the runner. Parameter sweeps (the production use case:
        many baryonify passes over ONE shell with different models)
        otherwise re-pay a 50 MB host->device transfer per process()
        call (~2 s through a tunnel at NSIDE 1024). The cache keys on
        the map object's identity + total mass, so an in-place edit of
        the same array invalidates it."""
        key = (id(self.LightconeShell.map), str(dt), orig_map.shape[0],
               float(orig_map.sum()))
        cache = getattr(self, '_omap_cache', None)
        if cache is None or cache[0] != key:
            # convert on host first: halves the transfer for the f32 path
            host = np.ascontiguousarray(orig_map, dtype=np.dtype(dt))
            self._omap_cache = (key, jnp.asarray(host)[n2r])
        return self._omap_cache[1]

    def _cell_map_nested(self, nside_c):
        """(nc,) RING -> NESTED cell-id lookup, cached."""
        cache = getattr(self, '_cmap_cache', None)
        if cache is None:
            cache = {}
            self._cmap_cache = cache
        if nside_c not in cache:
            cache[nside_c] = jnp.asarray(
                hpx.ring2nest(nside_c, np.arange(hpx.npix(nside_c))),
                dtype=jnp.int32)
        return cache[nside_c]

    def _nested_maps(self, nside):
        """(N2R, R2N) permutations: nested position -> ring pixel id,
        and ring position -> nested pixel id. Cached. Built on-device
        (exact int32 bit arithmetic) — the numpy versions cost ~30 s
        each at NSIDE 1024 on a single host core."""
        if getattr(self, '_nest_maps', None) is None:
            n2r = hpx.nest2ring_all(nside)
            r2n = jnp.zeros((hpx.npix(nside),), dtype=jnp.int32).at[
                n2r].set(jnp.arange(hpx.npix(nside), dtype=jnp.int32))
            self._nest_maps = (n2r, r2n)
        return self._nest_maps

    def _ring_tables(self, nside, dt):
        cache = getattr(self, '_rt_cache', None)
        if cache is None:
            cache = {}
            self._rt_cache = cache
        key = str(dt)
        if key not in cache:
            rt = hpx.RingTables(nside, dtype=dt)
            planes = hpx.pixel_planes_device(nside, rt.z, rt.start,
                                             rt.npr, rt.shift)
            cache[key] = (rt, planes)
        return cache[key]

    def _packed_records(self, arrs, dt):
        """(H, 16) packed halo records for the cell-major kernels,
        cached per dtype (single fused jit: ~20 separate 1e6-element
        dispatches otherwise cost seconds in per-call latency)."""
        cache = getattr(self, '_packed_cache', None)
        if cache is None:
            cache = {}
            self._packed_cache = cache
        key = str(dt)
        if key not in cache:
            from . import shell_cellmajor as cm
            theta = jnp.asarray(arrs['theta'], dtype=dt)
            phi = jnp.asarray(arrs['phi'], dtype=dt)
            D = jnp.asarray(arrs['D'], dtype=dt)
            a = jnp.asarray(arrs['a'], dtype=dt)
            Rc = jnp.asarray(arrs['R_com'], dtype=dt)
            Mh = jnp.asarray(arrs['M'], dtype=dt)
            props = jnp.asarray(arrs['props'], dtype=dt)
            packed = _pack_from_angles(theta, phi, D, a, Rc, Mh, props)
            float(jnp.sum(packed[:, 0]))    # hard barrier
            cache[key] = packed
        return cache[key]

    def _pixels_nested(self, nside, dt):
        """Nested-order pixel unit-vector planes, cached per dtype.
        Built entirely on device (ring-table lookup + trig at NESTED
        ids) — no 150 MB host->device transfer."""
        cache = getattr(self, '_pixn_cache', None)
        if cache is None:
            cache = {}
            self._pixn_cache = cache
        key = str(dt)
        if key not in cache:
            n2r, _ = self._nested_maps(nside)
            rt, _ = self._ring_tables(nside, dt)
            cache[key] = hpx.pixel_planes_device(nside, rt.z, rt.start,
                                                 rt.npr, rt.shift, p=n2r)
        return cache[key]

    # ----- mesh (multi-device) helpers -----
    @property
    def _n_mesh_devices(self):
        return self.mesh.shape[self.mesh_axis] if self.mesh is not None \
            else 1

    def _pixel_sharding(self):
        from jax.sharding import NamedSharding, PartitionSpec
        return NamedSharding(self.mesh, PartitionSpec(self.mesh_axis))

    def _pixels_nested_sharded(self, nside, dt):
        """Nested-order pixel planes, sharded by contiguous pixel blocks
        (= contiguous coarse-cell ranges) over the mesh axis."""
        cache = getattr(self, '_pixn_mesh_cache', None)
        if cache is None:
            cache = {}
            self._pixn_mesh_cache = cache
        key = str(dt)
        if key not in cache:
            sh = self._pixel_sharding()
            cache[key] = tuple(jax.device_put(p, sh)
                               for p in self._pixels_nested(nside, dt))
        return cache[key]

    def _dense_candidates_sharded(self, bi, nside_c, sub, dt, r_b):
        """(ncell, K_pad) dense candidates + (ncell,) counts, sharded by
        cells over the mesh axis (cached per bucket)."""
        cache = getattr(self, '_dense_mesh_cache', None)
        if cache is None:
            cache = {}
            self._dense_mesh_cache = cache
        key = (bi, nside_c, str(dt))
        if key not in cache:
            # refinement (nsc_eff > nside_c) keeps contiguous NESTED
            # child blocks aligned with the parent shards, so the same
            # cells-axis sharding applies at the refined level
            dense, counts, K, nsc_eff = self._dense_candidates(
                bi, nside_c, sub, dt, r_b)
            ncell = counts.shape[0]
            sh = self._pixel_sharding()
            cache[key] = (jax.device_put(dense.reshape(ncell, -1), sh),
                          jax.device_put(counts, sh), K, nsc_eff)
        return cache[key]

    @staticmethod
    def _node_bound(g2, rad_max, Nr):
        """Static radial-node bound for a bucket: nodes above the
        largest reachable lnr (eps_max * R cutoff) contribute nothing;
        quantized up so compiles are shared."""
        n_hi = int(np.floor((rad_max - g2[0]) / (g2[1] - g2[0]))) + 2
        return min(Nr, max(32, -(-n_hi // 32) * 32))

    @staticmethod
    def _cell_chunk(nside_c, F, target=1 << 18, n_dev=1):
        """Cells per lax.map step: a power of two (divides the 12 *
        nside_c^2 cells — or the per-device cell count when sharded)
        with ~target pixels per step."""
        c = 1
        cap = max(1, 4 * nside_c * nside_c // n_dev)
        while c * 2 * F <= target and c * 2 <= cap:
            c *= 2
        return c

    @staticmethod
    def _scalar_coords(arrs, dt, n_props):
        """(H, 2 + n_props) scalar table coordinates per halo:
        log(1+z), log M, then the catalog property columns."""
        sc_cols = [np.log(1.0 / arrs['a']), np.log(arrs['M'])]
        sc_cols += [arrs['props'][:, i] for i in range(n_props)]
        return jnp.asarray(np.stack(sc_cols, axis=-1), dtype=dt)

    def _check_catalog_caches(self):
        """Invalidate catalog-derived caches if the catalog object was
        swapped (SplitJoinParallel shallow-copies the runner and replaces
        the catalog per shard)."""
        if getattr(self, '_cache_cat', None) is not self.HaloLightConeCatalog:
            for attr in ('_halo_arrays_cache', '_packed_cache',
                         '_reg_cache', '_dense_cache',
                         '_dense_mesh_cache', '_groups_cache'):
                if hasattr(self, attr):
                    delattr(self, attr)
            self._cache_cat = self.HaloLightConeCatalog

    # ----- shared halo preprocessing -----
    def _halo_arrays(self, cosmo):
        """Catalog-derived per-halo arrays, cached on the runner (the
        catalog and cosmology are fixed per runner; recomputing costs
        ~10 s of f64 device work at the 1e6-halo scale)."""
        self._check_catalog_caches()
        cached = getattr(self, '_halo_arrays_cache', None)
        if cached is not None:
            return cached
        out = self._halo_arrays_impl(cosmo)
        self._halo_arrays_cache = out
        return out

    def _halo_arrays_impl(self, cosmo):
        cat = self.HaloLightConeCatalog.cat
        a = 1.0 / (1.0 + cat['z'])
        # f64 preprocessing belongs on the host: eagerly dispatching
        # 1e6-halo f64 ops to a remote accelerator costs minutes of
        # tunnel round-trips (measured 270 s at the bench scale) vs ~2 s
        # on the CPU backend
        with jax.default_device(jax.devices("cpu")[0]):
            theta, phi = np.asarray(hpx.radec2ang(cat['ra'], cat['dec']))
            R_phys = np.asarray(self.mass_def.get_radius(cosmo, cat['M'],
                                                         a))
            D = np.asarray(cosmo.angular_diameter_distance(a))
        radius = self.epsilon_max * R_phys / D
        p_keys = getattr(self.model, 'p_keys', []) or []
        props = (np.stack([cat[k] for k in p_keys], axis=-1)
                 if p_keys else np.zeros((cat.size, 0)))
        return dict(theta=theta, phi=phi, M=cat['M'].copy(), a=a,
                    R_com=R_phys / a, D=D, radius=radius, props=props)


# ----- stage A+B kernel: windowed displacement accumulation -----

@partial(jax.jit, static_argnames=("nside", "n_rings", "n_phi", "n_props",
                                   "use_rdelta"))
def _accumulate_shell_offsets(nside, n_rings, n_phi, n_props, use_rdelta,
                              tables, vx, vy, vz, grids, table,
                              eps_max, theta, phi, M, a, R_com, D, props,
                              offsets):
    """Accumulate per-pixel offset components for one chunk of halos.

    Mirrors the reference per-halo loop (`HealpixRunner.py:291-331`):
    query pixels, physical separations, displacement readout (comoving in,
    comoving out, x a both ways), re-normalize to the unit sphere, add the
    unit-vector delta. Falls back to the 4 bilinear-neighbor pixels when
    the disc resolves fewer than 4 pixels (`:309-310`).

    Geometry runs through precomputed ring/pixel tables in the compute
    dtype (f32 on TPU) — no f64 emulation in the hot path. Chunks are
    dispatched from the host (async): one jit per chunk keeps individual
    kernels small and robust while the device stays saturated.
    ``offsets`` is a tuple of three (npix,) component planes.
    """

    def one_halo(th0, ph0, M_h, a_h, Rc_h, D_h, pr_h):
        radius = eps_max * (Rc_h * a_h) / D_h
        pix, valid = hpx.disc_window_mask_tab(tables, th0, ph0,
                                              radius, n_rings, n_phi)
        pix = pix.reshape(-1)
        valid = valid.reshape(-1)

        # <4-pixel fallback: replace window by the 4 interp neighbors
        fb_pix, _ = hpx.get_interp_weights_tab(tables, th0, ph0)
        use_fb = jnp.sum(valid) < 4
        valid = valid & ~use_fb
        pix = jnp.concatenate([pix, fb_pix])
        valid = jnp.concatenate([valid, jnp.broadcast_to(use_fb, (4,))])

        px = vx[pix]
        py = vy[pix]
        pz = vz[pix]
        st0 = jnp.sin(th0)
        v0x = st0 * jnp.cos(ph0)
        v0y = st0 * jnp.sin(ph0)
        v0z = jnp.cos(th0)
        # physical separation components: (pvec - v0) * D
        dx = (px - v0x) * D_h
        dy = (py - v0y) * D_h
        dz = (pz - v0z) * D_h
        r_sep = jnp.sqrt(dx * dx + dy * dy + dz * dz)

        # displacement readout (comoving): d(r/a, M, a) * a. The (z, M,
        # props) axes are blended once per halo; per pixel only the 1-D
        # radial interpolation remains.
        r_com = r_sep / a_h
        lnr = jnp.log(jnp.maximum(r_com, 1e-30))
        rad = lnr - jnp.log(Rc_h) if use_rdelta else lnr
        scalars = [jnp.log(1.0 / a_h), jnp.log(M_h)] \
            + [pr_h[pi] for pi in range(n_props)]
        prof_h = blend_table_radial(grids, table, scalars)
        d = radial_readout(prof_h, grids[2], rad)
        d = jnp.where(r_com < eps_max * Rc_h, d, 0.0)
        d = jnp.where(jnp.isfinite(d), d, 0.0) * a_h      # physical

        scale = d / jnp.maximum(r_sep, 1e-30)
        ofx = scale * dx
        ofy = scale * dy
        ofz = scale * dz
        # delta = normalize(pos + offset) - pvec (pos = pvec * D),
        # computed without the catastrophic cancellation of the naive
        # difference (needed for the float32 TPU path): with
        # s = |pos+off| - D, delta = (off - pvec * s) / |pos+off|.
        nwx = px * D_h + ofx
        nwy = py * D_h + ofy
        nwz = pz * D_h + ofz
        nw_norm = jnp.sqrt(nwx * nwx + nwy * nwy + nwz * nwz)
        pos_dot_off = D_h * (px * ofx + py * ofy + pz * ofz)
        off_sq = ofx * ofx + ofy * ofy + ofz * ofz
        s = (2.0 * pos_dot_off + off_sq) / (nw_norm + D_h)
        dxn = (ofx - px * s) / nw_norm
        dyn = (ofy - py * s) / nw_norm
        dzn = (ofz - pz * s) / nw_norm
        good = (valid & jnp.isfinite(dxn) & jnp.isfinite(dyn)
                & jnp.isfinite(dzn))
        zero = jnp.zeros((), dtype=d.dtype)
        return (jnp.where(valid, pix, 0),
                jnp.where(good, dxn, zero),
                jnp.where(good, dyn, zero),
                jnp.where(good, dzn, zero))

    pix, dxn, dyn, dzn = jax.vmap(one_halo)(theta, phi, M, a, R_com, D,
                                            props)
    dt = offsets[0].dtype
    return scatter_add_accum(offsets, pix.reshape(-1).astype(jnp.int32),
                             (dxn.reshape(-1).astype(dt),
                              dyn.reshape(-1).astype(dt),
                              dzn.reshape(-1).astype(dt)))


@partial(jax.jit, static_argnames=("nside", "n_rings", "n_phi", "n_props"))
def _accumulate_shell_paint(nside, n_rings, n_phi, n_props,
                            tables, vx, vy, vz, grids, table, eps_max,
                            theta, phi, M, a, R_com, D, props, new_map):
    """Additive profile painting for one chunk of halos
    (`HealpixRunner.py:418-445`): windowed gather, tabulated
    projected-profile readout at the comoving separation, scatter-add.
    ``new_map`` is a single (npix,) plane."""

    def one_halo(th0, ph0, M_h, a_h, Rc_h, D_h, pr_h):
        radius = eps_max * (Rc_h * a_h) / D_h
        pix, valid = hpx.disc_window_mask_tab(tables, th0, ph0,
                                              radius, n_rings, n_phi)
        pix = pix.reshape(-1)
        valid = valid.reshape(-1)
        px = vx[pix]
        py = vy[pix]
        pz = vz[pix]
        st0 = jnp.sin(th0)
        v0x = st0 * jnp.cos(ph0)
        v0y = st0 * jnp.sin(ph0)
        v0z = jnp.cos(th0)
        dx = (px - v0x) * D_h
        dy = (py - v0y) * D_h
        dz = (pz - v0z) * D_h
        r_sep = jnp.sqrt(dx * dx + dy * dy + dz * dz)

        r_com = jnp.maximum(r_sep / a_h, 1e-30)
        scalars = [jnp.log(1.0 / a_h), jnp.log(M_h)] \
            + [pr_h[pi] for pi in range(n_props)]
        prof_h = blend_table_radial(grids, table, scalars)  # log-profile
        paint = jnp.exp(radial_readout(prof_h, grids[2], jnp.log(r_com)))
        paint = jnp.where(jnp.isfinite(paint) & valid, paint, 0.0)
        return jnp.where(valid, pix, 0), paint

    pix, paint = jax.vmap(one_halo)(theta, phi, M, a, R_com, D, props)
    (out,) = scatter_add_accum((new_map,),
                               pix.reshape(-1).astype(jnp.int32),
                               (paint.reshape(-1).astype(new_map.dtype),))
    return out


@partial(jax.jit, static_argnames=("nside",))
def _regrid_shell(nside, tables, vx, vy, vz, orig_map, offsets):
    """Stage C: displace every pixel's unit vector, bilinear-redeposit the
    original mass (`HealpixRunner.py:333-341`). ``offsets`` is the
    (ox, oy, oz) component-plane tuple."""
    ox, oy, oz = offsets
    x = vx.astype(ox.dtype) + ox
    y = vy.astype(ox.dtype) + oy
    z = vz.astype(ox.dtype) + oz
    r = jnp.sqrt(x * x + y * y + z * z)
    theta = jnp.arccos(jnp.clip(z / r, -1.0, 1.0))
    phi = jnp.arctan2(y, x)
    phi = jnp.where(phi < 0, phi + 2 * jnp.pi, phi)
    ps, ws = hpx.get_interp_weights_parts(nside, theta, phi)
    idx = jnp.concatenate([p.astype(jnp.int32) for p in ps])
    contrib = jnp.concatenate(
        [w.astype(orig_map.dtype) * orig_map for w in ws])
    # XLA's native scatter beats sort + Pallas for this single-channel
    # f32 deposit (measured 0.6 s vs 2.0 s at 50M rows on v5e)
    return jnp.zeros((hpx.npix(nside),),
                     dtype=orig_map.dtype).at[idx].add(contrib)


def _pad_to(arrs, n, chunk):
    """Pad halo arrays to a multiple of chunk (masked-out via zero mass /
    zero radius)."""
    n_pad = (-n) % chunk
    out = {}
    for k, v in arrs.items():
        if v.ndim == 1:
            out[k] = np.concatenate([v, np.full(n_pad, 1.0 if k in
                                                ('a', 'D', 'M', 'R_com')
                                                else 0.0)])
        else:
            out[k] = np.concatenate(
                [v, np.zeros((n_pad,) + v.shape[1:])], axis=0)
    # padded halos: tiny radius + tiny mass => zero displacement (outside
    # table -> NaN -> 0) and the <4-pixel fallback touches pixel weights
    # with zero displacement only
    if n_pad:
        out['R_com'][-n_pad:] = 1e-10
        out['radius'][-n_pad:] = 0.0
    return out


class BaryonifyShell(DefaultRunner):
    """Baryonify a HEALPix mass shell (reference `HealpixRunner.py:223-349`).

    The input map must be a MASS map (empty pixels = 0)."""

    def process(self):
        cosmo = Cosmology.from_dict(self.cosmo)
        model = self.model
        if not hasattr(model, '_table'):
            raise NameError("Displacement model has no table. Run "
                            "setup_interpolator() first")

        nside = self.LightconeShell.NSIDE
        orig_map = np.asarray(self.LightconeShell.map, dtype=np.float64)

        if self.HaloLightConeCatalog.cat.size == 0:
            # reference loop-over-nothing semantics (HealpixRunner.py:291
            # iterates an empty catalog without touching the map): an
            # empty chunk from a spatial SplitJoin split, or a z-slice
            # with no halos above the mass cut, is a no-op — not a crash
            # in the bucket machinery
            return orig_map.copy()

        t0 = self._stage_t0()
        arrs = self._halo_arrays(cosmo)
        self._stage("halo_arrays", t0)
        p_keys = getattr(model, 'p_keys', []) or []
        n_props = len(p_keys)
        use_rdelta = bool(getattr(model, 'Rdelta_sampling', False))

        dt = self.dtype
        table = model._table.astype(dt)
        grids = tuple(g.astype(dt) for g in model._grids)
        tables, (vx, vy, vz) = self._ring_tables(nside, dt)

        # the f32 hot path (with its gridded Pallas scatters) must trace
        # with x64 disabled; see utils.x64_disabled
        hot_ctx = (x64_disabled() if dt == jnp.dtype('float32')
                   else nullcontext())
        with hot_ctx:
            zeros = jnp.zeros((hpx.npix(nside),), dtype=dt)
            offsets = (zeros, zeros, zeros)
            buckets = _bucket_edges(arrs['radius'], self.n_buckets)
            block = self._pixel_block(hpx.npix(nside))
            if self.method in ("gather", "cellmajor"):
                from . import shell_gather as sg
            if self.method == "gather":
                th_all = jnp.asarray(arrs['theta'], dtype=dt)
                ph_all = jnp.asarray(arrs['phi'], dtype=dt)
                st_all = jnp.sin(th_all)
                v0x_all = st_all * jnp.cos(ph_all)
                v0y_all = st_all * jnp.sin(ph_all)
                v0z_all = jnp.cos(th_all)
                D_all = jnp.asarray(arrs['D'], dtype=dt)
                a_all = jnp.asarray(arrs['a'], dtype=dt)
                Rc_all = jnp.asarray(arrs['R_com'], dtype=dt)
                lnRc_all = jnp.log(Rc_all)
                # one all-halo device pass: blended profile rows, sliced
                # per bucket below
                prof_all = sg.blend_halo_profiles(
                    grids, table, self._scalar_coords(arrs, dt, n_props))
                # serialize: let the all-halo blend finish before queueing
                # the bucket registrations (deep async queues of large ops
                # have crashed the remote TPU worker). block_until_ready is
                # not a reliable barrier on the remote-TPU platform, so
                # force completion through a scalar readback.
                float(jnp.sum(prof_all[:, 0]))
            if self.method == "cellmajor":
                from . import shell_cellmajor as cm
                t0 = self._stage_t0()
                packed_all = self._packed_records(arrs, dt)
                self._stage("packed_records", t0, packed_all)
                n_dev = self._n_mesh_devices
                if self.mesh is not None:
                    from ..parallel import (mesh_offsets_bucket,
                                            min_coarse_nside)
                    nsc_min = min_coarse_nside(n_dev)
                    assert nsc_min <= nside, (
                        f"nside={nside} too small to shard over {n_dev} "
                        f"devices (needs nside >= {nsc_min})")
                    vxn, vyn, vzn = self._pixels_nested_sharded(nside, dt)
                    sh = self._pixel_sharding()
                    off_nested = tuple(jax.device_put(z, sh)
                                       for z in (zeros, zeros, zeros))
                else:
                    nsc_min = 1
                    t0 = self._stage_t0()
                    vxn, vyn, vzn = self._pixels_nested(nside, dt)
                    self._stage("pixels_nested", t0, vzn)
                    off_nested = (zeros, zeros, zeros)
            if self.method == "cellmajor":
                for bi, (nside_c, idx, jidx, r_b, rcm_max) in enumerate(
                        self._cm_groups(arrs, nside, nsc_min)):
                    lazy_sub = lambda idx=idx: {k: v[idx]
                                                for k, v in arrs.items()}
                    g2 = np.asarray(model._grids[2])
                    rad_max = (np.log(self.epsilon_max) if use_rdelta
                               else np.log(self.epsilon_max * rcm_max))
                    n_hi = self._node_bound(g2, rad_max, len(g2))
                    if self.mesh is not None:
                        (dense2d, counts, K,
                         nsc_eff) = self._dense_candidates_sharded(
                            bi, nside_c, lazy_sub, dt, r_b)
                        F = (nside // nsc_eff) ** 2
                        C_blk = self._cell_chunk(nsc_eff, F, n_dev=n_dev)
                        if self.verbose:
                            print(f"Baryonifying matter: bucket {bi + 1} "
                                  f"({len(idx)} halos, "
                                  f"nside_c={nside_c}->{nsc_eff}, K={K}, "
                                  f"F={F}, C={C_blk}, n_hi={n_hi}, "
                                  f"mesh x{n_dev})")
                        off_nested = mesh_offsets_bucket(
                            self.mesh, self.mesh_axis, use_rdelta, F,
                            C_blk, n_hi, (vxn, vyn, vzn), dense2d, counts,
                            packed_all[jidx], grids[0], grids[1], table,
                            grids[2], float(self.epsilon_max), off_nested,
                            gprops=grids[3:])
                        continue
                    t0 = self._stage_t0()
                    dense, counts, K, nsc_eff = self._dense_candidates(
                        bi, nside_c, lazy_sub, dt, r_b)
                    self._stage(f"reg[b{bi} nc{nside_c} "
                                f"H{len(idx)}]", t0, counts)
                    F = (nside // nsc_eff) ** 2
                    C_blk = self._cell_chunk(nsc_eff, F, n_dev=n_dev)
                    if self.verbose:
                        print(f"Baryonifying matter: bucket {bi + 1} "
                              f"({len(idx)} halos, "
                              f"nside_c={nside_c}->{nsc_eff}, K={K}, "
                              f"F={F}, C={C_blk}, n_hi={n_hi})")
                    t0 = self._stage_t0()
                    off_nested = cm.cellmajor_offsets_pass(
                        use_rdelta, F, C_blk, n_hi, vxn, vyn, vzn,
                        dense, counts, packed_all[jidx],
                        grids[0], grids[1], table, grids[2],
                        float(self.epsilon_max), *off_nested,
                        gprops=grids[3:])
                    self._stage(f"pass[b{bi} nc{nsc_eff} K{K} "
                                f"n_hi{n_hi}]", t0, off_nested[0])
            groups = ([] if self.method == "cellmajor"
                      else [(None, i) for i in buckets])
            for bi, (nsc, idx) in enumerate(groups):
                sub = {k: v[idx] for k, v in arrs.items()}
                r_b = float(sub['radius'].max())
                if self.method == "gather":
                    jidx = jnp.asarray(idx, dtype=jnp.int32)
                    nside_c = sg.pick_coarse_nside(r_b, nside)
                    hids, cell_start, K = self._bucket_registration(
                        bi, nside_c, sub, dt, r_b)
                    if self.verbose:
                        print(f"Baryonifying matter: bucket {bi + 1}/"
                              f"{len(buckets)} ({len(idx)} halos, "
                              f"nside_c={nside_c}, K={K})")
                    cells = self._cells_of_pixels(nside, nside_c)
                    offsets = sg.gather_offsets_pass(
                        K, use_rdelta, block, cells, vx, vy, vz, hids,
                        cell_start, v0x_all[jidx], v0y_all[jidx],
                        v0z_all[jidx], D_all[jidx], a_all[jidx],
                        Rc_all[jidx], lnRc_all[jidx], prof_all[jidx],
                        grids[2], float(self.epsilon_max), *offsets)
                    continue

                n_rings, n_phi = _window_dims(nside, r_b)
                if self.verbose:
                    print(f"Baryonifying matter: bucket {bi + 1}/"
                          f"{len(buckets)} ({len(idx)} halos, window "
                          f"{n_rings}x{n_phi})")
                chunk = _chunk_for(n_rings, n_phi, self.halo_chunk)
                sub = _pad_to(sub, len(idx), chunk)
                H = len(sub['theta'])
                for c0 in range(0, H, chunk):
                    s = slice(c0, c0 + chunk)
                    offsets = _accumulate_shell_offsets(
                        nside, n_rings, n_phi, n_props, use_rdelta,
                        tables, vx, vy, vz, grids, table,
                        float(self.epsilon_max),
                        jnp.asarray(sub['theta'][s], dtype=dt),
                        jnp.asarray(sub['phi'][s], dtype=dt),
                        jnp.asarray(sub['M'][s], dtype=dt),
                        jnp.asarray(sub['a'][s], dtype=dt),
                        jnp.asarray(sub['R_com'][s], dtype=dt),
                        jnp.asarray(sub['D'][s], dtype=dt),
                        jnp.asarray(sub['props'][s], dtype=dt), offsets)

            if self.method == "cellmajor":
                # the regrid is order-agnostic given consistent (vec,
                # offset, mass) triples — run it directly in NESTED order
                # (one mass gather instead of three offset gathers); the
                # scatter targets are RING ids either way
                t0 = self._stage_t0()
                n2r, _ = self._nested_maps(nside)
                omap_n = self._orig_map_nested(orig_map, n2r, dt)
                if self.mesh is not None:
                    from ..parallel import mesh_regrid_shell
                    omap_n = jax.device_put(omap_n, self._pixel_sharding())
                    new_map = mesh_regrid_shell(
                        self.mesh, self.mesh_axis, nside,
                        (vxn, vyn, vzn), omap_n, off_nested)
                else:
                    new_map = _regrid_shell(nside, tables, vxn, vyn, vzn,
                                            omap_n, off_nested)
                self._stage("regrid", t0, new_map)
            else:
                new_map = _regrid_shell(nside, tables, vx, vy, vz,
                                        jnp.asarray(orig_map, dtype=dt),
                                        offsets)
        t0 = self._stage_t0()
        new_map = np.asarray(new_map, dtype=np.float64)
        self._stage("fetch_map", t0)

        new_sum, old_sum = new_map.sum(), orig_map.sum()
        assert np.isclose(new_sum, old_sum), (
            "ERROR in pixel regridding, sum(new_map) [%0.14e] != "
            "sum(oldmap) [%0.14e]" % (new_sum, old_sum))
        return new_map

    def process_device(self, table=None):
        """Differentiable, device-resident cell-major pipeline.

        Runs the same single-device cell-major computation as
        :meth:`process` but returns the new RING-order map as a device
        array with no host round-trip or conservation assert. The
        spatial geometry (registration, refined candidates, packed halo
        records, pixel planes) is staged once from the runner caches
        and treated as constant; ``table`` (default ``model._table``)
        may be a TRACED array — the slot loops run with static trip
        counts — so ``jax.grad`` flows from any scalar of the returned
        map back through the hat readout into the displacement table,
        and on into physical baryon parameters via
        ``BaryonificationClass.build_table_device``. Geometry constancy
        is exact: registration uses only halo positions and the
        epsilon_max * R_Delta reach, neither of which depends on the
        table. The reference's scipy/numba pipeline has no analog of
        this capability. Intended for fitting/MCMC loops; parameter
        sweeps re-use all staged geometry across calls.

        With ``mesh=`` the same differentiable pipeline runs SHARDED
        over coarse cells: the offset passes are embarrassingly
        parallel, the regrid's psum join has a transpose rule, and the
        slot loops run with static trip counts — so ``jax.grad`` of a
        scalar of the returned map w.r.t. the table (and through
        ``build_table_device`` on into physical baryon parameters) is
        exact on a multi-chip mesh: differentiable end-to-end at
        scales beyond single-chip HBM. The reference cannot express
        either capability.
        """
        assert self.method in ("auto", "cellmajor"), (
            "process_device supports only the cell-major formulation")
        cosmo = Cosmology.from_dict(self.cosmo)
        model = self.model
        if table is None:
            table = model._table
        nside = self.LightconeShell.NSIDE
        orig_map = np.asarray(self.LightconeShell.map, dtype=np.float64)
        arrs = self._halo_arrays(cosmo)
        use_rdelta = bool(getattr(model, 'Rdelta_sampling', False))
        dt = self.dtype
        table = jnp.asarray(table).astype(dt)
        grids = tuple(g.astype(dt) for g in model._grids)
        tables, _ = self._ring_tables(nside, dt)
        n_dev = self._n_mesh_devices
        hot_ctx = (x64_disabled() if dt == jnp.dtype('float32')
                   else nullcontext())
        with hot_ctx:
            from . import shell_cellmajor as cm
            zeros = jnp.zeros((hpx.npix(nside),), dtype=dt)
            packed_all = self._packed_records(arrs, dt)
            if self.mesh is not None:
                from ..parallel import (mesh_offsets_bucket,
                                        mesh_regrid_shell,
                                        min_coarse_nside)
                nsc_min = min_coarse_nside(n_dev)
                assert nsc_min <= nside, (
                    f"nside={nside} too small to shard over {n_dev} "
                    f"devices (needs nside >= {nsc_min})")
                vxn, vyn, vzn = self._pixels_nested_sharded(nside, dt)
                sh = self._pixel_sharding()
                off_nested = tuple(jax.device_put(z, sh)
                                   for z in (zeros, zeros, zeros))
            else:
                nsc_min = 1
                vxn, vyn, vzn = self._pixels_nested(nside, dt)
                off_nested = (zeros, zeros, zeros)
            g2 = np.asarray(model._grids[2])
            for bi, (nside_c, idx, jidx, r_b, rcm_max) in enumerate(
                    self._cm_groups(arrs, nside, nsc_min)):
                lazy_sub = lambda idx=idx: {k: v[idx]
                                            for k, v in arrs.items()}
                rad_max = (np.log(self.epsilon_max) if use_rdelta
                           else np.log(self.epsilon_max * rcm_max))
                n_hi = self._node_bound(g2, rad_max, len(g2))
                if self.mesh is not None:
                    (dense2d, counts, K,
                     nsc_eff) = self._dense_candidates_sharded(
                        bi, nside_c, lazy_sub, dt, r_b)
                    F = (nside // nsc_eff) ** 2
                    C_blk = self._cell_chunk(nsc_eff, F, n_dev=n_dev)
                    off_nested = mesh_offsets_bucket(
                        self.mesh, self.mesh_axis, use_rdelta, F,
                        C_blk, n_hi, (vxn, vyn, vzn), dense2d, counts,
                        packed_all[jidx], grids[0], grids[1], table,
                        grids[2], float(self.epsilon_max), off_nested,
                        gprops=grids[3:], k_static=max(int(K), 1))
                    continue
                dense, counts, K, nsc_eff = self._dense_candidates(
                    bi, nside_c, lazy_sub, dt, r_b)
                F = (nside // nsc_eff) ** 2
                C_blk = self._cell_chunk(nsc_eff, F)
                off_nested = cm.cellmajor_offsets_pass(
                    use_rdelta, F, C_blk, n_hi, vxn, vyn, vzn,
                    dense, counts, packed_all[jidx],
                    grids[0], grids[1], table, grids[2],
                    float(self.epsilon_max), *off_nested,
                    k_static=max(int(K), 1), gprops=grids[3:])
            n2r, _ = self._nested_maps(nside)
            omap_n = self._orig_map_nested(orig_map, n2r, dt)
            if self.mesh is not None:
                omap_n = jax.device_put(omap_n, self._pixel_sharding())
                new_map = mesh_regrid_shell(
                    self.mesh, self.mesh_axis, nside,
                    (vxn, vyn, vzn), omap_n, off_nested)
            else:
                new_map = _regrid_shell(nside, tables, vxn, vyn, vzn,
                                        omap_n, off_nested)
        return new_map


class PaintProfilesShell(DefaultRunner):
    """Paint a (tabulated) projected profile onto a shell (reference
    `HealpixRunner.py:352-447`)."""

    def process(self):
        cosmo = Cosmology.from_dict(self.cosmo)
        model = self.model
        assert model is not None, "You must provide a model"

        p_keys = getattr(model, 'p_keys', []) or []
        if len(p_keys) > 0:
            from ..tabulate import ParamTabulatedProfile
            assert isinstance(model, ParamTabulatedProfile), (
                f"You asked to use {p_keys} properties in painting. You "
                f"must pass a ParamTabulatedProfile as the model. You have "
                f"passed {type(model)} instead")

        if not hasattr(model, '_ln2D'):
            raise NameError(
                "PaintProfilesShell requires a tabulated model "
                "(TabulatedProfile / ParamTabulatedProfile with "
                "setup_interpolator() run): the TPU path reads the "
                "projected profile from a device-resident table.")

        nside = self.LightconeShell.NSIDE
        if self.HaloLightConeCatalog.cat.size == 0:
            # empty catalog paints nothing (loop-over-nothing,
            # HealpixRunner.py:404) — the painted-only map is zeros
            return np.zeros(hpx.npix(nside), dtype=np.float64)
        arrs = self._halo_arrays(cosmo)
        dt = self.dtype
        table = model._ln2D.astype(dt)
        grids = tuple(g.astype(dt) for g in model._grids)
        tables, (vx, vy, vz) = self._ring_tables(nside, dt)

        hot_ctx = (x64_disabled() if dt == jnp.dtype('float32')
                   else nullcontext())
        with hot_ctx:
            new_map = jnp.zeros((hpx.npix(nside),), dtype=dt)
            buckets = _bucket_edges(arrs['radius'], self.n_buckets)
            block = self._pixel_block(hpx.npix(nside))
            if self.method in ("gather", "cellmajor"):
                from . import shell_gather as sg
            if self.method == "gather":
                th_all = jnp.asarray(arrs['theta'], dtype=dt)
                ph_all = jnp.asarray(arrs['phi'], dtype=dt)
                st_all = jnp.sin(th_all)
                v0x_all = st_all * jnp.cos(ph_all)
                v0y_all = st_all * jnp.sin(ph_all)
                v0z_all = jnp.cos(th_all)
                D_all = jnp.asarray(arrs['D'], dtype=dt)
                a_all = jnp.asarray(arrs['a'], dtype=dt)
                Rc_all = jnp.asarray(arrs['R_com'], dtype=dt)
                prof_all = sg.blend_halo_profiles(
                    grids, table,
                    self._scalar_coords(arrs, dt, len(p_keys)))
                float(jnp.sum(prof_all[:, 0]))   # hard barrier (see above)
            if self.method == "cellmajor":
                from . import shell_cellmajor as cm
                packed_all = self._packed_records(arrs, dt)
                n_dev = self._n_mesh_devices
                if self.mesh is not None:
                    from ..parallel import (mesh_paint_bucket,
                                            min_coarse_nside)
                    nsc_min = min_coarse_nside(n_dev)
                    assert nsc_min <= nside, (
                        f"nside={nside} too small to shard over {n_dev} "
                        f"devices (needs nside >= {nsc_min})")
                    vxn, vyn, vzn = self._pixels_nested_sharded(nside, dt)
                    map_nested = jax.device_put(
                        jnp.zeros((hpx.npix(nside),), dtype=dt),
                        self._pixel_sharding())
                else:
                    nsc_min = 1
                    vxn, vyn, vzn = self._pixels_nested(nside, dt)
                    map_nested = jnp.zeros((hpx.npix(nside),), dtype=dt)
            if self.method == "cellmajor":
                for bi, (nside_c, idx, jidx, r_b, rcm_max) in enumerate(
                        self._cm_groups(arrs, nside, nsc_min)):
                    lazy_sub = lambda idx=idx: {k: v[idx]
                                                for k, v in arrs.items()}
                    g2 = np.asarray(model._grids[2])
                    rad_max = np.log(self.epsilon_max * rcm_max)
                    n_hi = self._node_bound(g2, rad_max, len(g2))
                    if self.mesh is not None:
                        (dense2d, counts, K,
                         nsc_eff) = self._dense_candidates_sharded(
                            bi, nside_c, lazy_sub, dt, r_b)
                        F = (nside // nsc_eff) ** 2
                        C_blk = self._cell_chunk(nsc_eff, F, n_dev=n_dev)
                        if self.verbose:
                            print(f"Painting Profile: bucket {bi + 1} "
                                  f"({len(idx)} halos, "
                                  f"nside_c={nside_c}->{nsc_eff}, K={K}, "
                                  f"F={F}, C={C_blk}, n_hi={n_hi}, "
                                  f"mesh x{n_dev})")
                        map_nested = mesh_paint_bucket(
                            self.mesh, self.mesh_axis, F, C_blk, n_hi,
                            (vxn, vyn, vzn), dense2d, counts,
                            packed_all[jidx], grids[0], grids[1], table,
                            grids[2], float(self.epsilon_max), map_nested,
                            gprops=grids[3:])
                        continue
                    t0 = self._stage_t0()
                    dense, counts, K, nsc_eff = self._dense_candidates(
                        bi, nside_c, lazy_sub, dt, r_b)
                    self._stage(f"reg[b{bi} nc{nside_c} "
                                f"h{len(idx)}]", t0, counts)
                    F = (nside // nsc_eff) ** 2
                    C_blk = self._cell_chunk(nsc_eff, F, n_dev=n_dev)
                    if self.verbose:
                        print(f"Painting Profile: bucket {bi + 1} "
                              f"({len(idx)} halos, "
                              f"nside_c={nside_c}->{nsc_eff}, K={K}, "
                              f"F={F}, C={C_blk}, n_hi={n_hi})")
                    t0 = self._stage_t0()
                    map_nested = cm.cellmajor_paint_pass(
                        F, C_blk, n_hi, vxn, vyn, vzn, dense, counts,
                        packed_all[jidx], grids[0], grids[1], table,
                        grids[2], float(self.epsilon_max), map_nested,
                        gprops=grids[3:])
                    self._stage(f"pass[b{bi} nc{nsc_eff} K{K} "
                                f"n_hi{n_hi}]", t0, map_nested)
            groups = ([] if self.method == "cellmajor"
                      else [(None, i) for i in buckets])
            for bi, (nsc, idx) in enumerate(groups):
                sub = {k: v[idx] for k, v in arrs.items()}
                r_b = float(sub['radius'].max())
                if self.method == "gather":
                    jidx = jnp.asarray(idx, dtype=jnp.int32)
                    nside_c = sg.pick_coarse_nside(r_b, nside)
                    hids, cell_start, K = self._bucket_registration(
                        bi, nside_c, sub, dt, r_b)
                    if self.verbose:
                        print(f"Painting Profile: bucket {bi + 1}/"
                              f"{len(buckets)} ({len(idx)} halos, "
                              f"nside_c={nside_c}, K={K})")
                    cells = self._cells_of_pixels(nside, nside_c)
                    new_map = sg.gather_paint_pass(
                        K, block, cells, vx, vy, vz, hids, cell_start,
                        v0x_all[jidx], v0y_all[jidx], v0z_all[jidx],
                        D_all[jidx], a_all[jidx], Rc_all[jidx],
                        prof_all[jidx], grids[2],
                        float(self.epsilon_max), new_map)
                    continue

                n_rings, n_phi = _window_dims(nside, r_b)
                if self.verbose:
                    print(f"Painting Profile: bucket {bi + 1}/"
                          f"{len(buckets)} ({len(idx)} halos, window "
                          f"{n_rings}x{n_phi})")
                chunk = _chunk_for(n_rings, n_phi, self.halo_chunk)
                sub = _pad_to(sub, len(idx), chunk)
                H = len(sub['theta'])
                for c0 in range(0, H, chunk):
                    s = slice(c0, c0 + chunk)
                    new_map = _accumulate_shell_paint(
                        nside, n_rings, n_phi, len(p_keys),
                        tables, vx, vy, vz, grids, table,
                        float(self.epsilon_max),
                        jnp.asarray(sub['theta'][s], dtype=dt),
                        jnp.asarray(sub['phi'][s], dtype=dt),
                        jnp.asarray(sub['M'][s], dtype=dt),
                        jnp.asarray(sub['a'][s], dtype=dt),
                        jnp.asarray(sub['R_com'][s], dtype=dt),
                        jnp.asarray(sub['D'][s], dtype=dt),
                        jnp.asarray(sub['props'][s], dtype=dt), new_map)

            if self.method == "cellmajor":
                t0 = self._stage_t0()
                _, r2n = self._nested_maps(nside)
                new_map = new_map + map_nested[r2n]
                self._stage("n2r", t0, new_map)

        t0 = self._stage_t0()
        out = np.asarray(new_map, dtype=np.float64)
        self._stage("fetch_map", t0)
        return out

    def process_device(self, table=None):
        """Differentiable, device-resident cell-major painting.

        Counterpart of ``BaryonifyShell.process_device`` for the paint
        path: returns the painted RING-order map as a device array;
        ``table`` (default ``model._ln2D``, the LOG projected-profile
        table) may be traced, so ``jax.grad`` flows from any scalar of
        the map back into the table — and into physical profile
        parameters via ``TabulatedProfile.build_tables_device`` (e.g.
        gas-pressure parameters from a painted tSZ map). Geometry is
        staged from the runner caches and constant. With ``mesh=`` the
        pipeline runs sharded over coarse cells (painting is purely
        local per device) and stays differentiable — see
        ``BaryonifyShell.process_device``."""
        assert self.method in ("auto", "cellmajor"), (
            "process_device supports only the cell-major formulation")
        cosmo = Cosmology.from_dict(self.cosmo)
        model = self.model
        assert model is not None and hasattr(model, '_ln2D')
        if table is None:
            table = model._ln2D
        nside = self.LightconeShell.NSIDE
        arrs = self._halo_arrays(cosmo)
        dt = self.dtype
        table = jnp.asarray(table).astype(dt)
        grids = tuple(g.astype(dt) for g in model._grids)
        n_dev = self._n_mesh_devices
        hot_ctx = (x64_disabled() if dt == jnp.dtype('float32')
                   else nullcontext())
        with hot_ctx:
            from . import shell_cellmajor as cm
            packed_all = self._packed_records(arrs, dt)
            if self.mesh is not None:
                from ..parallel import mesh_paint_bucket, min_coarse_nside
                nsc_min = min_coarse_nside(n_dev)
                assert nsc_min <= nside, (
                    f"nside={nside} too small to shard over {n_dev} "
                    f"devices (needs nside >= {nsc_min})")
                vxn, vyn, vzn = self._pixels_nested_sharded(nside, dt)
                map_nested = jax.device_put(
                    jnp.zeros((hpx.npix(nside),), dtype=dt),
                    self._pixel_sharding())
            else:
                nsc_min = 1
                vxn, vyn, vzn = self._pixels_nested(nside, dt)
                map_nested = jnp.zeros((hpx.npix(nside),), dtype=dt)
            g2 = np.asarray(model._grids[2])
            for bi, (nside_c, idx, jidx, r_b, rcm_max) in enumerate(
                    self._cm_groups(arrs, nside, nsc_min)):
                lazy_sub = lambda idx=idx: {k: v[idx]
                                            for k, v in arrs.items()}
                rad_max = np.log(self.epsilon_max * rcm_max)
                n_hi = self._node_bound(g2, rad_max, len(g2))
                if self.mesh is not None:
                    (dense2d, counts, K,
                     nsc_eff) = self._dense_candidates_sharded(
                        bi, nside_c, lazy_sub, dt, r_b)
                    F = (nside // nsc_eff) ** 2
                    C_blk = self._cell_chunk(nsc_eff, F, n_dev=n_dev)
                    map_nested = mesh_paint_bucket(
                        self.mesh, self.mesh_axis, F, C_blk, n_hi,
                        (vxn, vyn, vzn), dense2d, counts,
                        packed_all[jidx], grids[0], grids[1], table,
                        grids[2], float(self.epsilon_max), map_nested,
                        gprops=grids[3:], k_static=max(int(K), 1))
                    continue
                dense, counts, K, nsc_eff = self._dense_candidates(
                    bi, nside_c, lazy_sub, dt, r_b)
                F = (nside // nsc_eff) ** 2
                C_blk = self._cell_chunk(nsc_eff, F)
                map_nested = cm.cellmajor_paint_pass(
                    F, C_blk, n_hi, vxn, vyn, vzn, dense, counts,
                    packed_all[jidx], grids[0], grids[1], table,
                    grids[2], float(self.epsilon_max), map_nested,
                    k_static=max(int(K), 1), gprops=grids[3:])
            _, r2n = self._nested_maps(nside)
            # nested -> ring gather; on a sharded map GSPMD inserts the
            # cross-shard collective (differentiable either way)
            out = map_nested[r2n]
        return out


class PaintProfilesAnisShell(PaintProfilesShell):
    """Alias of PaintProfilesShell (the reference's version is a verbatim
    copy kept out of __all__, `HealpixRunner.py:451-546`)."""
