"""Small quadrature helpers used by profile normalizations and tables."""

import jax.numpy as jnp

__all__ = ["trapz", "cumtrapz", "trapz_loggrid", "cumsum_loggrid"]


def trapz(y, x, axis=-1):
    """Trapezoidal rule along ``axis`` (jnp.trapezoid wrapper)."""
    return jnp.trapezoid(y, x, axis=axis)


def cumtrapz(y, x, axis=-1, initial=0.0):
    """Cumulative trapezoid along the last axis, with a leading ``initial``."""
    if axis != -1:
        raise NotImplementedError("cumtrapz only supports axis=-1")
    dx = jnp.diff(x)
    incr = 0.5 * (y[..., 1:] + y[..., :-1]) * dx
    c = jnp.cumsum(incr, axis=-1)
    pad = jnp.full(c.shape[:-1] + (1,), initial, dtype=c.dtype)
    return jnp.concatenate([pad, c + initial], axis=-1)


def trapz_loggrid(y, r, axis=-1):
    """int y dr on a log-spaced grid, computed as int (y r) dlnr."""
    return jnp.trapezoid(y * r, jnp.log(r), axis=axis)


def cumsum_loggrid(y, r):
    """Left-Riemann cumulative integral of y dr = (y r) dlnr on a log grid.

    Mirrors the reference's `np.cumsum(... * dlnr)` convention
    (`Schneider19.py:996-999`, `BaryonCorrection.py:534`), which keeps our
    enclosed-mass tables numerically identical in spirit.
    """
    dlnr = jnp.log(r[1] / r[0])
    return jnp.cumsum(y * r * dlnr, axis=-1)
