"""Device-resident tabulated profiles.

TPU-native re-implementation of `/root/reference/BaryonForge/utils/
Tabulate.py`: ``TabulatedProfile`` precomputes real/projected profiles on a
(log(1+z), logM, logr) grid and reads them out with vectorized multilinear
interpolation in log space; ``ParamTabulatedProfile`` adds arbitrary
extra-parameter axes (per-halo property columns like cdelta);
``TabulatedCorrelation3D`` tabulates xi_mm(r, z) for injection into TwoHalo.

The reference's per-z Python loop + itertools.product sweep
(`Tabulate.py:220-227, 529-548`) becomes a scan/vmap program; tables are
plain arrays (always picklable — no ``destory_Pk`` dance needed).
"""

import numpy as np
import jax
import jax.numpy as jnp

from .cosmology.massdef import MassDef
from .ops.interp import ndlinear_interp
from .profiles.base import HaloProfile, _set_parameter

__all__ = ['TabulatedProfile', 'ParamTabulatedProfile',
           'TabulatedCorrelation3D']


class TabulatedProfile(HaloProfile):
    """Tabulated (z, M, r) wrapper around any profile model
    (`Tabulate.py:68-358`). ``projected`` tables store ``projected * a``
    (comoving -> physical correction, `Tabulate.py:226`)."""

    def __init__(self, model, cosmo, mass_def=None):
        self.model = model
        self.cosmo = cosmo
        super().__init__(mass_def=mass_def if mass_def is not None
                         else MassDef(200, 'critical'))

    def setup_interpolator(self, z_min=1e-2, z_max=5, N_samples_z=30,
                           z_linear_sampling=False,
                           M_min=1e12, M_max=1e16, N_samples_Mass=30,
                           R_min=1e-3, R_max=1e2, N_samples_R=100,
                           other_params={}, verbose=True):
        if other_params:
            raise ValueError(
                "TabulatedProfile has no extra parameter axes; use "
                "ParamTabulatedProfile for other_params="
                f"{sorted(other_params)}. (The reference silently ignores "
                "this argument, `Tabulate.py:163`; we reject it instead.)")
        M_range = np.geomspace(M_min, M_max, N_samples_Mass)
        r = np.geomspace(R_min, R_max, N_samples_R)
        z_range = (np.linspace(z_min, z_max, N_samples_z)
                   if z_linear_sampling
                   else np.geomspace(z_min, z_max, N_samples_z))

        interp3D = []
        interp2D = []
        # profile quadratures are fp64 host work; pin to the CPU backend
        with jax.default_device(jax.devices("cpu")[0]):
            for z_j in z_range:
                a_j = 1.0 / (1.0 + z_j)
                interp3D.append(np.asarray(self.model.real(
                    self.cosmo, r, M_range, a_j)))
                interp2D.append(np.asarray(self.model.projected(
                    self.cosmo, r, M_range, a_j)) * a_j)
        interp3D = np.stack(interp3D)
        interp2D = np.stack(interp2D)

        self.raw_input_3D = interp3D
        self.raw_input_2D = interp2D
        self.raw_input_z_range = np.log(1 + z_range)
        self.raw_input_M_range = np.log(M_range)
        self.raw_input_r_range = np.log(r)

        self._grids = (jnp.asarray(np.log(1 + z_range)),
                       jnp.asarray(np.log(M_range)),
                       jnp.asarray(np.log(r)))
        with np.errstate(divide='ignore', invalid='ignore'):
            self._ln3D = jnp.asarray(np.log(interp3D))
            self._ln2D = jnp.asarray(np.log(interp2D))

    def build_tables_device(self, z_range, M_range, r):
        """Pure-JAX (ln3D, ln2D) table build: the device core of
        :meth:`setup_interpolator`, returned as (Nz, NM, NR) arrays with
        no host conversion.

        DIFFERENTIABLE: gradients flow from the returned log-tables back
        to any profile parameter currently set as a traced value on
        ``self.model`` (construct the model with traced kwargs or
        ``set_parameter`` a tracer first). Combined with
        ``PaintProfilesShell.process_device`` this closes the autodiff
        chain from e.g. gas-pressure parameters to a painted tSZ map.
        Zero profile values log to -inf (NaN-free backward; the paint
        kernels sanitize nonfinite nodes to an inert sentinel).
        """
        from .utils import safe_log
        z_range = np.asarray(z_range)
        M_dev = jnp.asarray(M_range)
        r_dev = jnp.asarray(r)

        def one_z(carry, z_j):
            a_j = 1.0 / (1.0 + z_j)
            p3 = self.model.real(self.cosmo, r_dev, M_dev, a_j)
            p2 = self.model.projected(self.cosmo, r_dev, M_dev, a_j) * a_j
            return carry, (safe_log(p3), safe_log(p2))

        build = jax.jit(lambda zs: jax.lax.scan(one_z, 0, zs)[1])
        ln3, ln2 = build(jnp.asarray(z_range))
        return ln3, ln2

    def _check_built(self):
        if not hasattr(self, '_ln3D'):
            raise NameError(
                "No Table created. Run setup_interpolator() method first")

    def _readout(self, r, M, a, table):
        r_use = jnp.atleast_1d(jnp.asarray(r))
        M_use = jnp.atleast_1d(jnp.asarray(M))
        z_in = jnp.log(1.0 / a) * jnp.ones_like(r_use)
        lnr = jnp.log(r_use)

        def one(lnM_i):
            coords = (z_in, lnM_i * jnp.ones_like(r_use), lnr)
            return jnp.exp(ndlinear_interp(self._grids, table, coords))

        prof = jax.vmap(one)(jnp.log(M_use))
        if jnp.ndim(r) == 0:
            prof = jnp.squeeze(prof, axis=-1)
        if jnp.ndim(M) == 0:
            prof = jnp.squeeze(prof, axis=0)
        return prof

    def _real(self, cosmo, r, M, a):
        self._check_built()
        prof = self._readout(r, M, a, self._ln3D)
        return jnp.atleast_2d(prof)

    def _projected(self, cosmo, r, M, a):
        self._check_built()
        prof = self._readout(r, M, a, self._ln2D)
        return jnp.atleast_2d(prof)


class ParamTabulatedProfile:
    """Tabulated profile with extra parameter axes (`Tabulate.py:362-701`).

    Required by the runners whenever per-halo property columns (e.g.
    ``cdelta``) feed the model (`Runners/HealpixRunner.py:284-287`).
    """

    def __init__(self, model, cosmo, mass_def=None):
        assert not isinstance(model, TabulatedProfile), \
            "Input model cannot be 'TabulatedProfile' object."
        self.model = model
        self.cosmo = cosmo
        self.mass_def = (mass_def if mass_def is not None
                         else MassDef(200, 'critical'))

    def setup_interpolator(self, z_min=1e-2, z_max=5, N_samples_z=30,
                           z_linear_sampling=False,
                           M_min=1e12, M_max=1e16, N_samples_Mass=30,
                           R_min=1e-3, R_max=1e2, N_samples_R=100,
                           other_params={}, verbose=True):
        M_range = np.geomspace(M_min, M_max, N_samples_Mass)
        r = np.geomspace(R_min, R_max, N_samples_R)
        z_range = (np.linspace(z_min, z_max, N_samples_z)
                   if z_linear_sampling
                   else np.geomspace(z_min, z_max, N_samples_z))
        p_keys = list(other_params.keys())
        self.p_keys = p_keys

        p_sizes = [len(np.asarray(other_params[k])) for k in p_keys]
        if p_keys:
            grids = np.meshgrid(*[np.asarray(other_params[k]) for k in p_keys],
                                indexing="ij")
            combos = np.stack([g.ravel() for g in grids], axis=-1)
        else:
            combos = np.zeros((1, 0))

        shape = (len(z_range),) + tuple(p_sizes) + (len(M_range), len(r))
        interp3D = np.zeros(shape)
        interp2D = np.zeros(shape)

        saved = {k: getattr(self.model, k, None) for k in p_keys}
        try:
          with jax.default_device(jax.devices("cpu")[0]):
            for j, z_j in enumerate(z_range):
                a_j = 1.0 / (1.0 + z_j)
                for c, pvals in enumerate(combos):
                    for ki, key in enumerate(p_keys):
                        _set_parameter(self.model, key, float(pvals[ki]))
                    idx = (j,) + np.unravel_index(c, tuple(p_sizes)) \
                        if p_keys else (j,)
                    interp3D[idx] = np.asarray(
                        self.model.real(self.cosmo, r, M_range, a_j))
                    interp2D[idx] = np.asarray(
                        self.model.projected(self.cosmo, r, M_range, a_j)) * a_j
        finally:
            for k, v in saved.items():
                _set_parameter(self.model, k, v)

        # (z, p..., M, r) -> (z, M, r, p...)
        nP = len(p_keys)
        interp3D = np.moveaxis(interp3D, range(1, 1 + nP),
                               range(interp3D.ndim - nP, interp3D.ndim))
        interp2D = np.moveaxis(interp2D, range(1, 1 + nP),
                               range(interp2D.ndim - nP, interp2D.ndim))

        self.raw_input_3D = interp3D
        self.raw_input_2D = interp2D
        self.raw_input_z_range = np.log(1 + z_range)
        self.raw_input_M_range = np.log(M_range)
        self.raw_input_r_range = np.log(r)
        for k in p_keys:
            setattr(self, 'raw_input_%s_range' % k,
                    np.asarray(other_params[k]))

        self._grids = tuple(
            [jnp.asarray(np.log(1 + z_range)), jnp.asarray(np.log(M_range)),
             jnp.asarray(np.log(r))]
            + [jnp.asarray(np.asarray(other_params[k])) for k in p_keys])
        with np.errstate(divide='ignore', invalid='ignore'):
            self._ln3D = jnp.asarray(np.log(interp3D))
            self._ln2D = jnp.asarray(np.log(interp2D))

    def _check_built(self):
        if not hasattr(self, '_ln3D'):
            raise NameError(
                "No Table created. Run setup_interpolator() method first")

    def _readout(self, r, M, a, table, **kwargs):
        r_use = jnp.atleast_1d(jnp.asarray(r))
        M_use = jnp.atleast_1d(jnp.asarray(M))
        z_in = jnp.log(1.0 / a) * jnp.ones_like(r_use)
        lnr = jnp.log(r_use)
        k_in = [kwargs[k] * jnp.ones_like(r_use) for k in self.p_keys]

        def one(lnM_i):
            coords = tuple([z_in, lnM_i * jnp.ones_like(r_use), lnr] + k_in)
            return jnp.exp(ndlinear_interp(self._grids, table, coords))

        prof = jax.vmap(one)(jnp.log(M_use))
        if jnp.ndim(r) == 0:
            prof = jnp.squeeze(prof, axis=-1)
        if jnp.ndim(M) == 0:
            prof = jnp.squeeze(prof, axis=0)
        return prof

    def real(self, cosmo, r, M, a, **kwargs):
        self._check_built()
        for k in self.p_keys:
            assert k in kwargs, ("Need to provide %s as input into `real'. "
                                 "Table was built with this." % k)
        return self._readout(r, M, a, self._ln3D, **kwargs)

    def projected(self, cosmo, r, M, a, **kwargs):
        self._check_built()
        for k in self.p_keys:
            assert k in kwargs, ("Need to provide %s as input into "
                                 "`projected'. Table was built with this." % k)
        return self._readout(r, M, a, self._ln2D, **kwargs)


class TabulatedCorrelation3D:
    """Tabulated xi_mm(r, z), callable as xi(r, a) for injection into
    TwoHalo (`Tabulate.py:704-757`)."""

    def __init__(self, cosmo, R_range=(1e-3, 1e3), N_samples=500):
        self.cosmo = cosmo
        self.R_range = R_range
        self.N_samples = N_samples

    def setup_interpolator(self, z_min=0, z_max=5, N_samples_z=10,
                           verbose=False):
        r = np.geomspace(self.R_range[0], self.R_range[1], self.N_samples)
        z_range = np.linspace(z_min, z_max, N_samples_z)
        table = np.stack([
            np.asarray(self.cosmo.xi_mm(r, 1.0 / (1.0 + z_j)))
            for z_j in z_range])

        self.raw_input_3D = table
        self.raw_input_z_range = np.log(1 + z_range)
        self.raw_input_r_range = np.log(r)
        self._grids = (jnp.asarray(np.log(1 + z_range)),
                       jnp.asarray(np.log(r)))
        # xi can be negative beyond the BAO scale: interpolate linearly
        self._xi = jnp.asarray(table)

    def __call__(self, r, a):
        r_use = jnp.atleast_1d(jnp.asarray(r))
        z_in = jnp.log(1.0 / a) * jnp.ones_like(r_use)
        # edge-clamp instead of NaN-fill: displacement-table builds
        # evaluate TwoHalo on quadrature grids wider than R_range
        # (r down to 1e-6 Mpc, where the one-halo term dominates by many
        # orders of magnitude); a NaN there would poison the enclosed-mass
        # cumsum and soft-degrade the whole table to d=0.
        gz, gr = self._grids
        z_in = jnp.clip(z_in, gz[0], gz[-1])
        lnr = jnp.clip(jnp.log(r_use), gr[0], gr[-1])
        return ndlinear_interp(self._grids, self._xi, (z_in, lnr))
