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

__all__ = ['build_cosmodict', 'log_time', 'host_cpu_device', 'x64_disabled']


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
