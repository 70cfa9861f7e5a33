"""Halo-profile base class: evaluation contract, projection, algebra.

Plays the role of ``ccl.halos.profiles.HaloProfile`` plus the reference's
``SchneiderProfiles`` plumbing (`/root/reference/BaryonForge/Profiles/
Schneider19.py:29-331`) and the operator-overloading machinery of
`utils/misc.py:7-127` — but the arithmetic is a small combinator class
instead of runtime class surgery, and the projected profile is a fully
vectorized (vmap-style) Abel integral instead of a per-(M, r) Python loop
(`Schneider19.py:249-252`).

Evaluation contract (mirrors CCL): ``real(cosmo, r, M, a)`` returns shape
(M, r); scalar r and/or M axes are squeezed away.
"""

import math
import operator

import jax
import jax.numpy as jnp

from ..cosmology.massdef import MassDef

__all__ = ["HaloProfile", "CombinedProfile", "default_fftlog_params"]


def default_fftlog_params():
    """FFTLog precision knobs, mirroring CCL's ``precision_fftlog`` dict.

    The reference tunes these per profile family (plaw_fourier=-2, wide
    padding, `Schneider19.py:124-128`; Stars widens to 1e±5 at `:588`) and
    warns they must be reproduced, not re-tuned (SURVEY hard-part #5).
    """
    return dict(padding_lo_fftlog=1e-2, padding_hi_fftlog=1e2,
                padding_lo_extra=1e-4, padding_hi_extra=1e4,
                n_per_decade=100, plaw_fourier=-2.0)


class HaloProfile:
    """Base class for all halo profiles."""

    #: parameter vocabulary; subclasses override (see Schneider19 model_params)
    model_param_names = []

    def __init__(self, mass_def=None,
                 use_fftlog_projection=False,
                 padding_lo_proj=0.1, padding_hi_proj=10.0,
                 n_per_decade_proj=10,
                 xi_mm=None,
                 proj_chunk=4096,
                 **kwargs):
        if mass_def is None:
            mass_def = MassDef(200, "critical")
        self.mass_def = mass_def
        self.xi_mm = xi_mm

        # Parameter auto-defaulting (`Schneider19.py:84-92`): missing
        # mu_/nu_/zeta_ slopes -> 0, M_* normalizations -> 1e14, else None.
        for m in self.model_param_names:
            if m in kwargs:
                setattr(self, m, kwargs[m])
            elif ("mu_" in m) or ("nu_" in m) or ("zeta_" in m):
                setattr(self, m, 0)
            elif "M_" in m:
                setattr(self, m, 1e14)
            else:
                setattr(self, m, None)

        self.padding_lo_proj = padding_lo_proj
        self.padding_hi_proj = padding_hi_proj
        self.n_per_decade_proj = n_per_decade_proj
        self.proj_chunk = proj_chunk

        # cutoff: sigmoid truncation scale in comoving Mpc (1 Gpc default,
        # `Schneider19.py:107-108`); proj_cutoff bounds the projection
        # integral (box size).
        self.cutoff = kwargs.get("cutoff", 1e3)
        self.proj_cutoff = kwargs.get("proj_cutoff", self.cutoff)

        self.use_fftlog_projection = use_fftlog_projection
        if use_fftlog_projection:
            assert self.cutoff == self.proj_cutoff, (
                "Set the same cutoff for the 3D profile and the projection "
                "to use the fftlog projection.")

        self.precision_fftlog = default_fftlog_params()

    # ----- parameter plumbing -----
    def update_precision_fftlog(self, **kwargs):
        self.precision_fftlog.update(kwargs)

    @property
    def model_params(self):
        return {k: v for k, v in vars(self).items()
                if k in self.model_param_names}

    def set_parameter(self, key, value):
        """Recursively set ``key`` on this profile and nested sub-profiles
        (reference `utils/Tabulate.py:12-65`)."""
        _set_parameter(self, key, value)

    # ----- evaluation -----
    def _real(self, cosmo, r, M, a):
        raise NotImplementedError

    def real(self, cosmo, r, M, a):
        r_use = jnp.atleast_1d(jnp.asarray(r, dtype=jnp.float64))
        M_use = jnp.atleast_1d(jnp.asarray(M, dtype=jnp.float64))
        prof = self._real(cosmo, r_use, M_use, a)
        if jnp.ndim(r) == 0:
            prof = jnp.squeeze(prof, axis=-1)
        if jnp.ndim(M) == 0:
            prof = jnp.squeeze(prof, axis=0)
        return prof

    #: subclasses with a native projected implementation (e.g. tabulated
    #: profiles) set this; otherwise the realspace/fftlog integral is used
    #: (mirrors the reference's `self._projected = ...` dispatch,
    #: `Schneider19.py:114-119`)
    _projected = None

    def projected(self, cosmo, r, M, a):
        r_use = jnp.atleast_1d(jnp.asarray(r, dtype=jnp.float64))
        M_use = jnp.atleast_1d(jnp.asarray(M, dtype=jnp.float64))
        if self._projected is not None:
            prof = self._projected(cosmo, r_use, M_use, a)
        elif self.use_fftlog_projection:
            prof = self._projected_fftlog(cosmo, r_use, M_use, a)
        else:
            prof = self._projected_realspace(cosmo, r_use, M_use, a)
        if jnp.ndim(r) == 0:
            prof = jnp.squeeze(prof, axis=-1)
        if jnp.ndim(M) == 0:
            prof = jnp.squeeze(prof, axis=0)
        return prof

    def _projected_realspace(self, cosmo, r_use, M_use, a):
        """Abel projection with a hard upper cutoff, as a chunked vectorized
        integral: Sigma(rp) = 2 int rho(sqrt(l^2 + rp^2)) dl with the
        substitution l -> r_integral (reference `Schneider19.py:195-265`).
        """
        int_min = self.padding_lo_proj * jnp.min(r_use)
        int_max = self.padding_hi_proj * jnp.max(r_use)
        # static point count: mirror `int_N = n_per_decade * log10(max/min)`
        # but with a trace-safe static bound (log range known at trace time
        # only if r static; use concrete values when available)
        try:
            n_dec = math.log10(float(int_max) / float(int_min))
        except Exception:  # traced r: fall back to a generous static range
            n_dec = 12.0
        if self.proj_cutoff is not None:
            int_max = self.proj_cutoff
        int_N = max(int(self.n_per_decade_proj * int(n_dec)), 32)
        r_integral = jnp.geomspace(int_min, int_max, int_N)

        prof = self._real(cosmo, r_integral, M_use, a)  # (M, Nint)
        lnr_int = jnp.log(r_integral)

        def _sigma_chunk(rp_chunk):
            # (chunk, Nint) separations
            rr = jnp.sqrt(r_integral[None, :] ** 2 + rp_chunk[:, None] ** 2)
            # interpolate each mass row at rr; jnp.interp clamps at ends
            # (np.interp semantics in the reference)
            def per_mass(p):
                vals = jnp.interp(rr, r_integral, p)
                return 2.0 * jnp.trapezoid(vals, r_integral, axis=-1)
            return jax.vmap(per_mass)(prof)  # (M, chunk)

        n = r_use.shape[0]
        chunk = min(self.proj_chunk, n)
        n_pad = (-n) % chunk
        rp = jnp.concatenate([r_use, jnp.full((n_pad,), r_use[-1])])
        rp = rp.reshape(-1, chunk)
        out = jax.lax.map(_sigma_chunk, rp)        # (nchunk, M, chunk)
        out = jnp.moveaxis(out, 1, 0).reshape(M_use.shape[0], -1)[:, :n]
        return out

    def _projected_fftlog(self, cosmo, r_use, M_use, a):
        """FFTLog-based projection (CCL default path, opt-in here)."""
        from ..ops.fftlog import fftlog_transform
        par = self.precision_fftlog
        r_min = jnp.minimum(jnp.min(r_use) * par["padding_lo_fftlog"], 1e-8)
        r_max = jnp.maximum(jnp.max(r_use) * par["padding_hi_fftlog"], 1e3)
        n = int(par["n_per_decade"] * 12)
        r_fft = jnp.geomspace(r_min, r_max, n)
        prof = self._real(cosmo, r_fft, M_use, a)
        # projection theorem: Sigma = (2 pi)^3 T2[T3[rho]] (the 2D FT of a
        # projection is the kz=0 slice of the 3D FT)
        k, Pk = fftlog_transform(r_fft, prof, 3, 0, par["plaw_fourier"])
        rp, sig = fftlog_transform(k, Pk, 2, 0, par["plaw_fourier"] + 1)
        sig = sig * (2.0 * jnp.pi) ** 3
        def per_mass(s):
            return jnp.interp(jnp.log(r_use), jnp.log(rp), s)
        return jax.vmap(per_mass)(sig)

    # ----- misc -----
    def __str_par__(self):
        s = "("
        for m in self.model_param_names:
            s += f"{m} = {getattr(self, m)}, "
        return s[:-2] + ")"

    def __str_prf__(self):
        return self.__class__.__name__

    def __str__(self):
        return self.__str_prf__() + self.__str_par__()

    __repr__ = __str__

    # ----- profile algebra (reference `utils/misc.py:47-127`) -----
    def __add__(self, other):
        return CombinedProfile(operator.add, self, other, "add")

    def __radd__(self, other):
        return CombinedProfile(operator.add, other, self, "add")

    def __sub__(self, other):
        return CombinedProfile(operator.sub, self, other, "sub")

    def __rsub__(self, other):
        return CombinedProfile(operator.sub, other, self, "sub")

    def __mul__(self, other):
        return CombinedProfile(operator.mul, self, other, "mul")

    def __rmul__(self, other):
        return CombinedProfile(operator.mul, other, self, "mul")

    def __truediv__(self, other):
        return CombinedProfile(operator.truediv, self, other, "truediv")

    def __rtruediv__(self, other):
        return CombinedProfile(operator.truediv, other, self, "truediv")

    def __pow__(self, other):
        return CombinedProfile(operator.pow, self, other, "pow")

    def __neg__(self):
        return CombinedProfile(lambda a, b: -a, self, None, "neg")

    def __pos__(self):
        return self

    def __abs__(self):
        return CombinedProfile(lambda a, b: abs(a), self, None, "abs")


class CombinedProfile(HaloProfile):
    """Pointwise arithmetic combination of profiles and/or scalars.

    The combined ``_real`` applies ``op`` to the operand evaluations; the
    projected profile then integrates the combined 3D profile exactly like
    any other (matching the reference's class-surgery approach, where the
    generated class inherits ``_projected_realspace``).
    """

    def __init__(self, op, left, right, opname="op"):
        self.op = op
        self.left = left
        self.right = right
        self.opname = opname
        # inherit evaluation configuration from the first profile operand
        proto = left if isinstance(left, HaloProfile) else right
        super().__init__(mass_def=proto.mass_def,
                         padding_lo_proj=proto.padding_lo_proj,
                         padding_hi_proj=proto.padding_hi_proj,
                         n_per_decade_proj=proto.n_per_decade_proj,
                         xi_mm=proto.xi_mm,
                         cutoff=proto.cutoff,
                         proj_cutoff=proto.proj_cutoff)
        self.precision_fftlog = dict(proto.precision_fftlog)

    def _operand(self, o, cosmo, r, M, a):
        if isinstance(o, HaloProfile):
            return o._real(cosmo, r, M, a)
        if o is None:
            return None
        return o  # scalar

    def _real(self, cosmo, r, M, a):
        lv = self._operand(self.left, cosmo, r, M, a)
        rv = self._operand(self.right, cosmo, r, M, a)
        return self.op(lv, rv)

    def __str_prf__(self):
        parts = []
        for o in (self.left, self.right):
            if isinstance(o, HaloProfile):
                parts.append(o.__str_prf__())
            elif o is not None:
                parts.append(str(o))
        return f"{self.opname}[" + ", ".join(parts) + "]"


def _set_parameter(obj, key, value):
    """Recursive attribute setter descending into nested HaloProfiles
    (reference `utils/Tabulate.py:12-65`)."""
    for k in list(vars(obj).keys()):
        if k == key:
            setattr(obj, key, value)
        elif isinstance(getattr(obj, k), HaloProfile):
            _set_parameter(getattr(obj, k), key, value)
