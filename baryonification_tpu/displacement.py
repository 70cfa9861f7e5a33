"""Displacement-function models (baryonification proper).

TPU-native re-implementation of
`/root/reference/BaryonForge/Profiles/BaryonCorrection.py`: build enclosed
DMO/DMB mass profiles, invert M_DMB, and tabulate the displacement

    d(r | M, z, params) = M_DMB^{-1}(M_DMO(r)) - r

on a (log(1+z), logM, logr [, extra-param]) grid, then read it out with a
vectorized multilinear interpolation.

Design changes vs the reference:
- the per-(z, M) Python loops with scipy Pchip + boolean fancy-indexing
  (`BaryonCorrection.py:214-301`) become a single jit-compiled program:
  `lax.map` over redshift slices, `vmap` over masses, and a fixed-shape
  masked compaction for the validity/monotonicity filtering
  (`BaryonCorrection.py:237-267`);
- the table is a plain device array, so the runner hot paths can read
  millions of displacements per halo batch in one fused gather.

Soft-degradation policy preserved: halos whose mass profiles are too
broken to invert get d = 0 (`BaryonCorrection.py:290-297`).
"""

import jax
import jax.numpy as jnp
import numpy as np

from .cosmology.massdef import MassDef
from .ops.interp import (pchip_derivatives, pchip_eval, masked_compact,
                         ndlinear_interp)

__all__ = ["BaryonificationClass", "Baryonification3D", "Baryonification2D"]


from .utils import safe_log as _safe_log


def _prev_valid(values, mask, fill=0.0):
    """For each i, the value of the latest valid entry j < i (else ``fill``).

    Fixed-shape equivalent of ``np.diff(x[mask], prepend=0)`` when combined
    with x - prev_valid(x, mask).
    """
    def step(carry, xm):
        x, m = xm
        out = carry
        carry = jnp.where(m, x, carry)
        return carry, out

    _, prev = jax.lax.scan(step, jnp.asarray(fill, values.dtype),
                           (values, mask))
    return prev


def _invert_mass_profile(lnr, ln_DMO, ln_DMB, n_mask_iter=30):
    """Compute d(r) = exp(pchip_DMB(pchip_DMO(ln r))) - r with the
    reference's iterative monotonicity/validity masking
    (`BaryonCorrection.py:237-284`). Returns (offset, ok).

    Reverse-mode differentiable: the masking logic runs on
    stop-gradient copies (comparisons carry no cotangent), and every
    value that flows into the pchip numerics is finite — the NaN
    out-of-range markers of the scipy-style formulation would emit
    NaN cotangents through exp/ pchip even under a final where
    (0 * inf), which is what `build_table_device` gradients need to
    avoid.
    """
    N = lnr.shape[0]
    # raw copies drive the masks; gradients never flow through them
    lno_r = jax.lax.stop_gradient(ln_DMO)
    lnb_r = jax.lax.stop_gradient(ln_DMB)
    # sanitized copies drive the numerics: identical at every
    # mask-valid entry (valid requires finiteness), finite elsewhere
    ln_DMO = jnp.where(jnp.isfinite(lno_r), ln_DMO, 0.0)
    ln_DMB = jnp.where(jnp.isfinite(lnb_r), ln_DMB, 0.0)

    # --- iterative DMB mask: monotone-increasing (vs previous valid point),
    # separated from DMO, finite; index 0 forced valid each round ---
    def body(mask, _):
        prev = _prev_valid(lnb_r, mask)
        diff_ok = (lnb_r - prev) > 1e-5
        sep_ok = (jnp.abs(lnb_r - lno_r) > 1e-6) | jnp.isnan(lno_r)
        fin_ok = jnp.isfinite(lnb_r)
        new = mask & diff_ok & sep_ok & fin_ok
        new = new.at[0].set(True)
        return new, None

    mask0 = jnp.ones((N,), dtype=bool)
    diff_mask, _ = jax.lax.scan(body, mask0, None, length=n_mask_iter)
    ok = jnp.sum(diff_mask) > 5

    # --- single-shot DMO mask (x-axis is radius, so laxer requirements) ---
    prev_dmo = jnp.concatenate([jnp.zeros(1, lno_r.dtype), lno_r[:-1]])
    fini_mask = ((lno_r - prev_dmo > 1e-5)
                 & ((jnp.abs(lnb_r - lno_r) > 1e-6) | jnp.isnan(lnb_r))
                 & jnp.isfinite(lno_r))

    # --- monotone interpolants on compacted points ---
    # DMO: ln r -> ln M_DMO
    x1, y1, x1_hi = masked_compact(lnr, ln_DMO, fini_mask)
    d1 = pchip_derivatives(x1, y1)
    q1 = pchip_eval(lnr, x1, y1, d1)
    in1 = (lnr >= x1[0]) & (lnr <= x1_hi)

    # DMB inverse: ln M_DMB -> ln r
    x2, y2, x2_hi = masked_compact(ln_DMB, lnr, diff_mask)
    d2 = pchip_derivatives(x2, y2)
    # clamp the query into the valid x2 span: out-of-span entries are
    # masked out below (in2), and evaluating the edge cubic far outside
    # its interval explodes -> inf/NaN cotangents
    q1s = jnp.clip(q1, x2[0], x2_hi)
    q2 = pchip_eval(q1s, x2, y2, d2)
    in2 = in1 & (q1 >= x2[0]) & (q1 <= x2_hi)

    offset = jnp.exp(q2) - jnp.exp(lnr)
    offset = jnp.where(in2 & jnp.isfinite(offset), offset, 0.0)
    offset = jnp.where(ok, offset, 0.0)
    return offset, ok


class BaryonificationClass:
    """Base displacement model: holds DMO+DMB profiles, builds the table.

    Mirrors the reference ctor contract (`BaryonCorrection.py:89-105`):
    forces ``cutoff = 1000`` on both profiles (the user-facing cutoffs are
    applied in the runners), stores epsilon_max and the mass definition.
    """

    def __init__(self, DMO, DMB, cosmo, epsilon_max=20,
                 mass_def=None):
        self.DMO = DMO
        self.DMB = DMB
        self.DMO.set_parameter('cutoff', 1000)
        self.DMB.set_parameter('cutoff', 1000)
        self.cosmo = cosmo
        self.epsilon_max = epsilon_max
        self.mass_def = mass_def if mass_def is not None else MassDef(200, 'critical')

    def get_masses(self, model, r, M, a):
        raise NotImplementedError("Implement a get_masses() method first")

    def build_table_device(self, z_range, M_range, r, rdelta_range=None,
                           combos=None, p_keys=(), Rdelta_sampling=False):
        """Pure-JAX displacement-table build: the device core of
        :meth:`setup_interpolator`, returned as a (z*C, M, R) array with
        no host conversion.

        DIFFERENTIABLE: gradients flow from the returned table back to
        any profile parameter currently set as a traced value on
        ``self.DMO`` / ``self.DMB`` (construct the profiles with traced
        kwargs, or ``set_parameter`` a tracer before calling). Combined
        with ``BaryonifyShell.process_device`` this closes the autodiff
        chain from baryon parameters to the baryonified map — a
        capability the reference (scipy interpolators,
        `BaryonCorrection.py:136-321`) cannot express.
        """
        if combos is None:
            combos = np.zeros((1, 0))
        # the radial axis is STATIC table geometry: get_masses takes
        # np.min/np.max of it for its integration range, and inside the
        # scan trace a reduction on a closed-over DEVICE array returns a
        # tracer (constants are lifted into the trace), so a jnp input
        # here would crash float() — coerce to host numpy up front
        r = np.asarray(r)
        if rdelta_range is None:
            rdelta_range = r
        p_keys = list(p_keys)
        lnr = jnp.asarray(np.log(r))
        M_dev = jnp.asarray(M_range)
        rdelta_dev = jnp.asarray(rdelta_range)
        cosmo = self.cosmo
        mass_def = self.mass_def
        use_rdelta = bool(Rdelta_sampling)

        def build_slice(carry, za_and_p):
            z_j, pvals = za_and_p
            a_j = 1.0 / (1.0 + z_j)
            from .profiles.base import _set_parameter
            for ki, key in enumerate(p_keys):
                _set_parameter(self.DMO, key, pvals[ki])
                _set_parameter(self.DMB, key, pvals[ki])

            M_DMO = self.get_masses(self.DMO, r, M_dev, a_j)  # (M, r)
            M_DMB = self.get_masses(self.DMB, r, M_dev, a_j)

            offsets, _ = jax.vmap(
                lambda do, db: _invert_mass_profile(lnr, _safe_log(do),
                                                    _safe_log(db))
            )(M_DMO, M_DMB)

            if use_rdelta:
                Rdelta = mass_def.get_radius(cosmo, M_dev, a_j) / a_j
                offsets = jax.vmap(
                    lambda off, Rd: jnp.interp(rdelta_dev, jnp.exp(lnr) / Rd,
                                               off)
                )(offsets, Rdelta)
            return carry, offsets

        # sweep (z x combos) in one compiled lax.map-style scan (nested
        # jit is grad-transparent: closed-over tracers lift to consts)
        z_range = np.asarray(z_range)
        zz = np.repeat(z_range, combos.shape[0])
        pp = np.tile(combos, (z_range.size, 1))
        build = jax.jit(lambda zs, ps: jax.lax.scan(
            build_slice, 0, (zs, ps))[1])
        return build(jnp.asarray(zz), jnp.asarray(pp))

    def setup_interpolator(self,
                           z_min=1e-2, z_max=5, N_samples_z=30,
                           z_linear_sampling=False,
                           M_min=1e12, M_max=1e16, N_samples_Mass=30,
                           R_min=1e-3, R_max=1e2, N_samples_R=100,
                           Rdelta_min=1e-3, Rdelta_max=10,
                           Rdelta_sampling=False,
                           other_params={}, verbose=True):
        """Tabulate d(log(1+z), logM, logr [, extra params]).

        Matches the reference sampling semantics
        (`BaryonCorrection.py:136-321`), including ``Rdelta_sampling``
        (re-grid the radius axis to r/R_Delta for sharp-featured models
        like Arico20) and extra-parameter axes (``other_params``).
        """
        if z_min <= 0:
            assert z_linear_sampling, (
                f"Geometric series not possible for {z_min} < z < {z_max}. "
                "Set z_linear_sampling = True, or z_min > 0")

        M_range = np.geomspace(M_min, M_max, N_samples_Mass)
        r = np.geomspace(R_min, R_max, N_samples_R)
        z_range = (np.linspace(z_min, z_max, N_samples_z) if z_linear_sampling
                   else np.geomspace(z_min, z_max, N_samples_z))
        p_keys = list(other_params.keys())
        self.p_keys = p_keys

        rdelta_range = np.geomspace(Rdelta_min, Rdelta_max, N_samples_R)

        # combo grid over extra params (outer product, like the reference's
        # itertools.product sweep)
        if p_keys:
            grids = np.meshgrid(*[np.asarray(other_params[k]) for k in p_keys],
                                indexing="ij")
            combos = np.stack([g.ravel() for g in grids], axis=-1)  # (C, P)
        else:
            combos = np.zeros((1, 0))

        use_rdelta = bool(Rdelta_sampling)
        # Save profile params that the sweep mutates, restore afterwards
        saved = [{k: getattr(prof, k, None) for k in p_keys}
                 for prof in (self.DMO, self.DMB)]
        try:
            # table building is fp64 host work (like the reference's scipy
            # path); pin it to the CPU backend — the finished table then
            # flows to the accelerator for the runner hot path
            with jax.default_device(jax.devices("cpu")[0]):
                table = self.build_table_device(
                    z_range, M_range, r, rdelta_range=rdelta_range,
                    combos=combos, p_keys=p_keys,
                    Rdelta_sampling=Rdelta_sampling)
        finally:
            # restore swept params so no tracers leak into the profiles
            for prof, sv in zip((self.DMO, self.DMB), saved):
                for k, v in sv.items():
                    prof.set_parameter(k, v)

        # (z*C, M, r) -> (z, M, r, p1, p2, ...)
        table = np.asarray(table).reshape(
            (z_range.size,) + tuple(len(other_params[k]) for k in p_keys)
            + (M_range.size, N_samples_R))
        # move param axes to the back
        nP = len(p_keys)
        table = np.moveaxis(table, range(1, 1 + nP),
                            range(table.ndim - nP, table.ndim))

        input_rad = np.log(r) if not use_rdelta else np.log(rdelta_range)
        self.raw_input_d = table
        self.raw_input_z_range = np.log(1 + z_range)
        self.raw_input_M_range = np.log(M_range)
        self.raw_input_r_range = input_rad
        for k in p_keys:
            setattr(self, 'raw_input_%s_range' % k, np.asarray(other_params[k]))

        self._grids = tuple([jnp.asarray(np.log(1 + z_range)),
                             jnp.asarray(np.log(M_range)),
                             jnp.asarray(input_rad)]
                            + [jnp.asarray(np.asarray(other_params[k]))
                               for k in p_keys])
        self._table = jnp.asarray(table)
        self.Rdelta_sampling = use_rdelta

    # ----- checkpointing -----
    def save_table(self, path):
        """Serialize the displacement table (plain npz — the TPU-era
        analog of the reference's pickling discipline, `SURVEY.md` 5)."""
        if not hasattr(self, '_table'):
            raise NameError("No Table created. Run setup_interpolator() first")
        np.savez(path, table=np.asarray(self._table),
                 n_grids=len(self._grids),
                 rdelta=int(self.Rdelta_sampling),
                 p_keys=np.asarray(self.p_keys, dtype=object),
                 **{f"grid{i}": np.asarray(g)
                    for i, g in enumerate(self._grids)})

    def load_table(self, path):
        """Restore a table written by :meth:`save_table`."""
        dat = np.load(path, allow_pickle=True)
        self._table = jnp.asarray(dat["table"])
        self._grids = tuple(jnp.asarray(dat[f"grid{i}"])
                            for i in range(int(dat["n_grids"])))
        self.Rdelta_sampling = bool(dat["rdelta"])
        self.p_keys = list(dat["p_keys"])
        # mirror the reference's raw_input_* attributes
        self.raw_input_d = np.asarray(dat["table"])
        self.raw_input_z_range = np.asarray(dat["grid0"])
        self.raw_input_M_range = np.asarray(dat["grid1"])
        self.raw_input_r_range = np.asarray(dat["grid2"])
        return self

    # ----- readout -----
    def _readout(self, r, M, a, **kwargs):
        r_use = jnp.atleast_1d(jnp.asarray(r))
        M_use = jnp.atleast_1d(jnp.asarray(M))

        z_in = jnp.log(1.0 / a) * jnp.ones_like(r_use)  # log(1+z)
        lnr = jnp.log(r_use)
        k_in = [kwargs[k] * jnp.ones_like(r_use) for k in self.p_keys]

        R = self.mass_def.get_radius(self.cosmo, M_use, a) / a  # comoving

        def one_mass(lnM_i, R_i):
            rad = lnr - jnp.log(R_i) if self.Rdelta_sampling else lnr
            coords = tuple([z_in, lnM_i * jnp.ones_like(r_use), rad] + k_in)
            d = ndlinear_interp(self._grids, self._table, coords)
            return jnp.where(r_use < self.epsilon_max * R_i, d, 0.0)

        displ = jax.vmap(one_mass)(jnp.log(M_use), R)
        if jnp.ndim(r) == 0:
            displ = jnp.squeeze(displ, axis=-1)
        if jnp.ndim(M) == 0:
            displ = jnp.squeeze(displ, axis=0)
        return displ

    def displacement(self, r, M, a, **kwargs):
        """Displacement in comoving Mpc (table readout only, like the
        reference `BaryonCorrection.py:393-431`)."""
        if not hasattr(self, '_table'):
            raise NameError("No Table created. Run setup_interpolator() first")
        for k in self.p_keys:
            assert k in kwargs, (
                "Need to provide %s as input into `displacement'. "
                "Table was built with this." % k)
        return self._readout(r, M, a, **kwargs)


class Baryonification3D(BaryonificationClass):
    """3D displacement: enclosed mass from the spherical density profile
    (`BaryonCorrection.py:435-548`)."""

    def get_masses(self, model, r, M, a):
        r_min = min(float(np.min(r)), 1e-6)
        r_max = max(float(np.max(r)), 1000.0)
        r_int = jnp.geomspace(r_min / 1.2, r_max * 1.2, 50_000)
        dlnr = jnp.log(r_int[1] / r_int[0])

        rho = model._real(self.cosmo, r_int, jnp.atleast_1d(jnp.asarray(M)), a)
        rho = jnp.where(rho < 0, 0.0, rho)
        M_enc = jnp.cumsum(4 * jnp.pi * r_int**3 * rho * dlnr, axis=-1)

        lnr_int = jnp.log(r_int)
        lnr_q = jnp.log(jnp.asarray(r))

        def interp_one(rho_i, Menc_i):
            mask = (rho_i > 0) & jnp.isfinite(Menc_i)
            xc, yc, x_hi = masked_compact(lnr_int, jnp.log(Menc_i), mask)
            d = pchip_derivatives(xc, yc)
            q = pchip_eval(lnr_q, xc, yc, d)
            q = jnp.where((lnr_q >= xc[0]) & (lnr_q <= x_hi), q, jnp.nan)
            return jnp.exp(q)

        return jax.vmap(interp_one)(rho, M_enc)


class Baryonification2D(BaryonificationClass):
    """2D (projected) displacement: enclosed mass from the surface density,
    with the comoving->physical ``a`` factor on Sigma
    (`BaryonCorrection.py:551-664`)."""

    def get_masses(self, model, r, M, a):
        r_min = min(float(np.min(r)), 1e-6)
        r_max = max(float(np.max(r)), 1000.0)
        r_int = jnp.geomspace(r_min / 1.5, r_max * 1.5, 50_000)
        dlnr = jnp.log(r_int[1] / r_int[0])

        Sigma = model.projected(self.cosmo, r_int,
                                jnp.atleast_1d(jnp.asarray(M)), a) * a
        Sigma = jnp.where(Sigma < 0, 0.0, Sigma)
        M_enc = jnp.cumsum(2 * jnp.pi * r_int**2 * Sigma * dlnr, axis=-1)

        lnr_int = jnp.log(r_int)
        lnr_q = jnp.log(jnp.asarray(r))

        def interp_one(Sig_i, Menc_i):
            mask = (Sig_i > 0) & jnp.isfinite(Menc_i)
            xc, yc, x_hi = masked_compact(lnr_int, jnp.log(Menc_i), mask)
            d = pchip_derivatives(xc, yc)
            q = pchip_eval(lnr_q, xc, yc, d)
            q = jnp.where((lnr_q >= xc[0]) & (lnr_q <= x_hi), q, jnp.nan)
            return jnp.exp(q)

        return jax.vmap(interp_one)(Sigma, M_enc)
