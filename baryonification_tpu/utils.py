"""Cross-cutting utilities (reference `utils/misc.py`, `utils/debug.py`).

Most of the reference's misc machinery disappears by construction:
``generate_operator_method`` (runtime class surgery for profile algebra,
`misc.py:47-127`) is the CombinedProfile combinator in `profiles/base.py`;
``destory_Pk`` (`misc.py:130-157`) is unnecessary because our tables and
Cosmology are plain arrays and always picklable.
"""

import time
from functools import wraps

__all__ = ['build_cosmodict', 'log_time', 'host_cpu_device']


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
