"""Cross-cutting utilities (reference `utils/misc.py`, `utils/debug.py`).

Most of the reference's misc machinery disappears by construction:
``generate_operator_method`` (runtime class surgery for profile algebra,
`misc.py:47-127`) is the CombinedProfile combinator in `profiles/base.py`;
``destory_Pk`` (`misc.py:130-157`) is unnecessary because our tables and
Cosmology are plain arrays and always picklable.
"""

import time
from contextlib import contextmanager
from functools import wraps

__all__ = ['build_cosmodict', 'log_time', 'host_cpu_device', 'x64_disabled',
           'generate_operator_method', 'destory_Pk', 'trace', 'safe_log']


def safe_log(m):
    """log(m) for m > 0, -inf otherwise — with a NaN-free backward pass.

    jnp.log(m) at m <= 0 leaves d(log)/dm = inf in the graph, which a
    downstream where() cannot neutralize (0 * inf = NaN in the VJP); the
    double-where keeps the cotangent of non-positive entries an exact 0.
    Non-positive values read as -inf instead of NaN; every table/mask
    consumer in the package treats the two identically (nonfinite)."""
    import jax.numpy as jnp
    pos = m > 0
    return jnp.where(pos, jnp.log(jnp.where(pos, m, 1.0)), -jnp.inf)


@contextmanager
def x64_disabled():
    """Temporarily disable jax_enable_x64.

    The package enables x64 globally for fp64 table building, but Mosaic
    fails to legalize *gridded* Pallas kernels when tracing under x64 —
    so the f32 runner hot paths (which contain the Pallas scatter kernels)
    trace and execute inside this context. jit caches key on the flag, so
    consistently wrapping the hot path keeps caches warm.
    """
    import jax
    prev = jax.config.jax_enable_x64
    jax.config.update('jax_enable_x64', False)
    try:
        yield
    finally:
        jax.config.update('jax_enable_x64', prev)


def build_cosmodict(cosmo):
    """Cosmology -> the plain dict the io objects require
    (reference `utils/misc.py:160-210`)."""
    return cosmo.cosmodict


def host_cpu_device():
    """The host CPU jax device (table building is pinned here: fp64 +
    complex FFTs are not TPU-native, and build cost is one-time)."""
    import jax
    return jax.devices("cpu")[0]


def log_time(fn):
    """Decorator printing the wall time of each call (stand-in for the
    reference's line-level timing decorator, `utils/debug.py:6-74`)."""

    @wraps(fn)
    def wrapper(*args, **kwargs):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        print(f"[log_time] {fn.__qualname__}: "
              f"{time.perf_counter() - t0:.3f}s")
        return out

    return wrapper


def generate_operator_method(op, reflected=False):
    """Build a profile-algebra dunder method for a given ``operator``
    function (API parity with the reference's class-surgery helper,
    `utils/misc.py:7-96`).

    The reference clones the HaloProfile class and swaps ``_real`` for the
    composed op; here the same algebra is a first-class
    :class:`~baryonification_tpu.profiles.base.CombinedProfile` node, so
    this helper just returns a method that constructs one.
    """
    import operator as _operator
    from .profiles.base import CombinedProfile
    name = getattr(op, '__name__', 'op')

    if op in (_operator.abs, _operator.neg, _operator.pos):
        def method(self):
            return CombinedProfile(lambda a, b: op(a), self, None, name)
        return method

    if reflected:
        def method(self, other):
            return CombinedProfile(lambda a, b: op(b, a), self, other, name)
    else:
        def method(self, other):
            return CombinedProfile(lambda a, b: op(a, b), self, other, name)
    return method


def destory_Pk(cosmo):
    """No-op kept for API compatibility (reference `utils/misc.py:130-157`,
    including the upstream spelling). The reference must strip unpicklable
    SwigPyObject P(k) handles from CCL cosmologies before pickling across
    worker processes; this framework's :class:`Cosmology` is a frozen
    dataclass of plain arrays and pickles as-is."""
    return cosmo


from contextlib import contextmanager as _contextmanager


@_contextmanager
def trace(log_dir):
    """Profiler context: wraps ``jax.profiler.trace`` so runner calls can
    be inspected in TensorBoard/XProf (the TPU-native upgrade of the
    reference's `utils/debug.py:6-74` line-timing decorator)."""
    import jax
    with jax.profiler.trace(str(log_dir)):
        yield
