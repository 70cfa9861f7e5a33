"""Gradient-based parameter inference on the differentiable pipeline.

The reference pipeline (scipy interpolators + numba scatter loops,
`BaryonCorrection.py:136-321`, `HealpixRunner.py:223-349`) exposes no
derivatives: fitting baryon parameters there means finite-difference
sweeps of the full pipeline per parameter. Here every runner family has
a differentiable device core (``process_device``) and the displacement
table itself is differentiable (``build_table_device``), so one
reverse-mode pass prices every parameter simultaneously. This module
packages the workflow the asserted demos (examples/14, examples/15)
exercise end-to-end into a small reusable API:

- :func:`fit` — first-order optimization of an arbitrary pytree of
  parameters against a scalar loss, any optax optimizer (Adam default),
  tracking the best-seen iterate (pipeline losses are noisy-ish in
  float32 and not convex; the last iterate is not always the best).
- :func:`laplace_covariance` — parameter uncertainties at the optimum
  from the inverse Hessian (Laplace approximation), computed with
  forward-over-reverse ``jax.hessian`` through the SAME pipeline.
  Entirely out of reach of the reference.

Losses may be as heavy as a full table build + shell baryonification;
both utilities only require that ``loss_fn(params)`` is traceable.
"""

import warnings
from typing import Any, Callable, NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["FitResult", "fit", "laplace_covariance"]


class FitResult(NamedTuple):
    """Outcome of :func:`fit`.

    params : best-seen parameter pytree (lowest loss over all steps,
             INCLUDING the starting point).
    loss : the loss at ``params``.
    history : (steps,) numpy array of the loss at each visited iterate.
    last_params : the final iterate (== ``params`` only if the last
                  step was also the best).
    """
    params: Any
    loss: float
    history: np.ndarray
    last_params: Any


def fit(loss_fn: Callable, params: Any, steps: int = 100,
        optimizer=None, learning_rate: float = 0.1,
        verbose: bool = False, callback: Optional[Callable] = None,
        jit: bool = False):
    """Minimize ``loss_fn`` over a pytree of parameters with optax.

    loss_fn : params -> scalar. May trace the full differentiable
              pipeline (table build + runner device core).
    params : pytree of initial values (scalars, arrays, dicts, ...).
    optimizer : any ``optax.GradientTransformation``; defaults to
                ``optax.adam(learning_rate)``.
    callback : optional ``callback(step, params, loss, grad)`` invoked
               after each evaluation (prints, early stopping via
               raising StopIteration, ...).
    jit : compile ``value_and_grad(loss_fn)`` as ONE program, so each
          step is a single native call — use when the loss is evaluated
          many times and its staging is fully traceable (examples/15).
          NOTE ``jit(value_and_grad(f))``, not ``value_and_grad(jit(f))``
          — only the former compiles the backward pass too. Off by
          default: pipeline losses that jit internal stages themselves
          (``process_device``) can compile faster un-wrapped.

    Returns a :class:`FitResult`. The best-seen iterate is returned,
    matching the examples' behavior — with a non-convex pipeline loss
    and a fixed step budget, the final Adam iterate can overshoot.
    """
    import optax
    if optimizer is None:
        optimizer = optax.adam(learning_rate=learning_rate)

    val_grad = jax.value_and_grad(loss_fn)
    if jit:
        val_grad = jax.jit(val_grad)
    state = optimizer.init(params)
    best_loss = np.inf
    best_params = params
    history = []
    for step in range(steps):
        loss, grad = val_grad(params)
        loss_f = float(loss)
        history.append(loss_f)
        if not np.isfinite(loss_f):
            if not np.isfinite(best_loss):
                raise FloatingPointError(
                    f"non-finite loss at step {step}: {loss_f} (check "
                    f"the loss for NaN-unsafe ops in reverse mode — see "
                    f"CLAUDE.md double-where notes)")
            # progress exists: keep it — a fixed-budget Adam run can
            # overshoot into a NaN region after converging well, and
            # discarding the accumulated best iterate would throw away
            # the (possibly hours of) compute that produced it
            warnings.warn(
                f"fit: non-finite loss at step {step}; stopping early "
                f"and returning the best finite iterate "
                f"(loss {best_loss:.6e})", RuntimeWarning)
            break
        if loss_f < best_loss:
            best_loss = loss_f
            best_params = params
        if verbose:
            print(f"fit step {step:3d}: loss = {loss_f:.6e}")
        if callback is not None:
            try:
                callback(step, params, loss_f, grad)
            except StopIteration:
                break
        updates, state = optimizer.update(grad, state, params)
        params = optax.apply_updates(params, updates)
    if not history:
        # steps=0 (or an optimizer-free probe): still honor the
        # FitResult contract — params/loss describe the starting point
        best_loss = float(loss_fn(params))
        history.append(best_loss)
        best_params = params
    return FitResult(params=best_params, loss=best_loss,
                     history=np.asarray(history), last_params=params)


def laplace_covariance(loss_fn: Callable, params: Any,
                       loss_is_chi2: bool = True):
    """Laplace-approximation parameter covariance at ``params``.

    For a Gaussian likelihood L ∝ exp(-chi²/2), the posterior
    covariance is ``2 H⁻¹`` with H the Hessian of chi² at the optimum;
    pass ``loss_is_chi2=False`` when ``loss_fn`` is already a negative
    log-likelihood (covariance = H⁻¹). The Hessian is computed by
    ``jax.hessian`` (forward-over-reverse) through whatever pipeline
    the loss traces.

    Returns ``(cov, sigma)``: the (n, n) covariance over the raveled
    parameter vector (``jax.flatten_util.ravel_pytree`` order) and a
    pytree of per-parameter 1-sigma values shaped like ``params``.
    """
    from jax.flatten_util import ravel_pytree
    flat, unravel = ravel_pytree(params)

    def flat_loss(x):
        return loss_fn(unravel(x))

    H = np.asarray(jax.hessian(flat_loss)(flat), dtype=np.float64)
    H = H.reshape(flat.shape[0], flat.shape[0])
    cov = np.linalg.inv(H)
    if loss_is_chi2:
        cov = 2.0 * cov
    var = np.diag(cov)
    if np.any(var < 0):
        # an indefinite Hessian means ``params`` is not a minimum (the
        # Laplace approximation does not apply there) — say so and
        # return NaN sigmas rather than a silent sigma=0, which would
        # read as "perfectly constrained"
        bad = np.flatnonzero(var < 0)
        warnings.warn(
            f"laplace_covariance: negative variance for raveled "
            f"parameter indices {bad.tolist()} — the Hessian is not "
            f"positive definite at these params (not a local minimum); "
            f"their sigmas are returned as NaN", RuntimeWarning)
    sigma = np.sqrt(np.where(var < 0, np.nan, var))
    return cov, unravel(jnp.asarray(sigma, dtype=flat.dtype))
