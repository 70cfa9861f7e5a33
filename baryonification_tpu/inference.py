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
- :func:`hmc_sample` — full posterior sampling by Hamiltonian Monte
  Carlo: every leapfrog step is one reverse-mode gradient of the
  pipeline log-posterior, the whole chain is a single compiled
  ``lax.scan`` (TPU-resident, no host round-trips per step), and the
  Laplace covariance plugs in as the mass matrix so even strongly
  degenerate posteriors (example 16's M_c/theta_ej, corr -0.94) mix.
  Gradient-free reference pipelines need ~dim x more likelihood calls
  per effective sample (random-walk/emcee scaling).

Losses may be as heavy as a full table build + shell baryonification;
both utilities only require that ``loss_fn(params)`` is traceable.
"""

import warnings
from typing import Any, Callable, NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["FitResult", "fit", "laplace_covariance",
           "HMCResult", "hmc_sample"]


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


def _save_checkpoint(path, step, params, state, best_params, best_loss,
                     history):
    """Atomic pickle of the full optimizer state (resume == bit-exact
    continuation: params, optax state, best iterate, loss history)."""
    import os
    import pickle
    tonp = lambda t: jax.tree_util.tree_map(np.asarray, t)
    blob = dict(step=step, params=tonp(params), state=tonp(state),
                best_params=tonp(best_params), best_loss=best_loss,
                history=list(history))
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(blob, f)
    os.replace(tmp, path)   # never leaves a torn checkpoint behind


def fit(loss_fn: Callable, params: Any, steps: int = 100,
        optimizer=None, learning_rate: float = 0.1,
        verbose: bool = False, callback: Optional[Callable] = None,
        jit: bool = False, checkpoint: Optional[str] = None,
        checkpoint_every: int = 1):
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
    checkpoint : optional path. The full optimizer state (params, optax
          state, best iterate, history) is pickled there atomically
          every ``checkpoint_every`` steps, and — if the file already
          exists — the fit RESUMES from it (bit-exact: the restored
          trajectory is identical to an uninterrupted run, asserted in
          tests). Pipeline fits run ~minutes per step (examples/15:
          ~45 min total); a crash no longer costs the accumulated run.

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
    start_step = 0
    if checkpoint is not None:
        import os
        import pickle
        if os.path.exists(checkpoint):
            with open(checkpoint, "rb") as f:
                blob = pickle.load(f)
            tojnp = lambda t: jax.tree_util.tree_map(jnp.asarray, t)
            params = tojnp(blob["params"])
            state = tojnp(blob["state"])
            best_params = tojnp(blob["best_params"])
            best_loss = blob["best_loss"]
            history = list(blob["history"])
            start_step = blob["step"]
            if verbose:
                print(f"fit: resumed from {checkpoint} at step "
                      f"{start_step} (best loss {best_loss:.6e})")
    for step in range(start_step, steps):
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
        if checkpoint is not None and (
                (step + 1) % checkpoint_every == 0 or step == steps - 1):
            _save_checkpoint(checkpoint, step + 1, params, state,
                             best_params, best_loss, history)
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


class HMCResult(NamedTuple):
    """Outcome of :func:`hmc_sample`.

    samples : pytree shaped like ``params`` with a leading
              ``(n_samples,)`` axis on every leaf (post-warmup chain).
    log_probs : (n_samples,) numpy array of the log-posterior at each
                sample.
    accept_rate : mean Metropolis acceptance over the kept samples.
    step_size : the (dual-averaging-adapted) leapfrog step size used
                after warmup.
    """
    samples: Any
    log_probs: np.ndarray
    accept_rate: float
    step_size: float


def hmc_sample(log_prob_fn: Callable, params: Any, key,
               n_samples: int = 500, n_warmup: int = 200,
               step_size: float = 0.1, n_leapfrog: int = 16,
               mass_covariance: Optional[np.ndarray] = None,
               target_accept: float = 0.8):
    """Posterior sampling by Hamiltonian Monte Carlo.

    ``log_prob_fn(params) -> scalar`` is the log-posterior (for a chi²
    pipeline loss pass ``lambda p: -0.5 * chi2(p)``); it must be
    traceable, exactly like :func:`fit` losses. The entire chain —
    warmup with Nesterov dual-averaging step-size adaptation (Hoffman &
    Gelman 2014 schedule, targeting ``target_accept``) plus sampling —
    is ONE compiled ``lax.scan`` whose leapfrog steps each take one
    reverse-mode gradient of the pipeline, so the chain stays
    device-resident end to end (no host round-trip per step).

    mass_covariance : optional (dim, dim) estimate of the posterior
        covariance over the raveled parameter vector — pass the ``cov``
        from :func:`laplace_covariance` — used as the inverse mass
        matrix. This preconditions the dynamics so strongly correlated
        or badly scaled posteriors (example 16's M_c/theta_ej direction,
        corr -0.94) mix in O(1) leapfrog steps instead of stalling.

    key : a ``jax.random.PRNGKey``; the chain is deterministic in it.

    Returns :class:`HMCResult`.
    """
    from jax.flatten_util import ravel_pytree
    x0, unravel = ravel_pytree(params)
    dim = x0.shape[0]
    dtype = x0.dtype

    if mass_covariance is not None:
        minv = np.asarray(mass_covariance, dtype=np.float64)
        minv = minv.reshape(dim, dim)
        mass = np.linalg.inv(minv)
        # momentum ~ N(0, M): p = chol(M) @ xi
        chol_mass = np.linalg.cholesky(0.5 * (mass + mass.T))
    else:
        minv = np.eye(dim)
        chol_mass = np.eye(dim)
    minv_d = jnp.asarray(minv, dtype=dtype)
    chol_d = jnp.asarray(chol_mass, dtype=dtype)

    def flat_logp(x):
        return log_prob_fn(unravel(x))

    logp_and_grad = jax.value_and_grad(flat_logp)

    eps0 = float(step_size)
    # dual-averaging constants (Hoffman & Gelman 2014, Algorithm 5)
    da_mu = np.log(10.0 * eps0)
    da_gamma, da_t0, da_kappa = 0.05, 10.0, 0.75
    n_total = n_warmup + n_samples

    def leapfrog(x, p, eps):
        logp0, g = logp_and_grad(x)
        p = p + 0.5 * eps * g

        def body(_, carry):
            x, p, _g, _lp = carry
            x = x + eps * (minv_d @ p)
            lp, g = logp_and_grad(x)   # one pipeline backward per step
            p = p + eps * g
            return (x, p, g, lp)

        x, p, g, logp_new = jax.lax.fori_loop(
            0, n_leapfrog, body, (x, p, g, logp0))
        p = p - 0.5 * eps * g            # undo the trailing half-kick
        return x, p, logp_new

    def kinetic(p):
        return 0.5 * p @ (minv_d @ p)

    def step(carry, i):
        x, logp, key, log_eps, log_epsbar, hbar = carry
        key, k_mom, k_acc = jax.random.split(key, 3)
        eps = jnp.where(i < n_warmup,
                        jnp.exp(log_eps), jnp.exp(log_epsbar))
        p0 = chol_d @ jax.random.normal(k_mom, (dim,), dtype=dtype)
        x_new, p_new, logp_new = leapfrog(x, p0, eps.astype(dtype))
        delta = (logp_new - kinetic(p_new)) - (logp - kinetic(p0))
        # a NaN proposal (pipeline loss outside its domain) is a reject,
        # not a poisoned chain
        delta = jnp.where(jnp.isnan(delta), -jnp.inf, delta)
        alpha = jnp.exp(jnp.minimum(delta, 0.0))
        accept = jax.random.uniform(k_acc) < alpha
        x = jnp.where(accept, x_new, x)
        logp = jnp.where(accept, logp_new, logp)

        # dual averaging, active only during warmup
        t = (i + 1).astype(jnp.float64)
        eta = 1.0 / (t + da_t0)
        hbar_w = (1.0 - eta) * hbar + eta * (target_accept - alpha)
        log_eps_w = da_mu - jnp.sqrt(t) / da_gamma * hbar_w
        w = t ** (-da_kappa)
        log_epsbar_w = w * log_eps_w + (1.0 - w) * log_epsbar
        in_warm = i < n_warmup
        hbar = jnp.where(in_warm, hbar_w, hbar)
        log_eps = jnp.where(in_warm, log_eps_w, log_eps)
        log_epsbar = jnp.where(in_warm, log_epsbar_w, log_epsbar)

        out = (x, logp, accept.astype(jnp.float64))
        return (x, logp, key, log_eps, log_epsbar, hbar), out

    @jax.jit
    def run(x0, key):
        logp0 = flat_logp(x0)
        init = (x0, logp0, key,
                jnp.asarray(np.log(eps0), dtype=jnp.float64),
                jnp.asarray(np.log(eps0), dtype=jnp.float64),
                jnp.asarray(0.0, dtype=jnp.float64))
        carry, (xs, logps, accs) = jax.lax.scan(
            step, init, jnp.arange(n_total))
        return xs, logps, accs, carry[4]

    xs, logps, accs, log_epsbar = run(x0, key)
    xs = xs[n_warmup:]
    samples = jax.vmap(unravel)(xs)
    return HMCResult(samples=samples,
                     log_probs=np.asarray(logps[n_warmup:]),
                     accept_rate=float(np.mean(np.asarray(
                         accs[n_warmup:]))),
                     step_size=float(np.exp(log_epsbar)))
