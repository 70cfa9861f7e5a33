"""inference.py: the packaged gradient-fit / Laplace-uncertainty API
(the workflow examples/14 and /15 exercise through the full pipeline,
tested here on fast closed-form losses plus one tiny table-build loss)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from baryonification_tpu.inference import (FitResult, fit,
                                           laplace_covariance)


class TestFit:
    def test_quadratic_scalar(self):
        loss = lambda x: (x - 3.0) ** 2
        res = fit(loss, jnp.asarray(0.0), steps=200, learning_rate=0.1)
        assert isinstance(res, FitResult)
        assert abs(float(res.params) - 3.0) < 1e-3
        assert res.loss < 1e-6
        assert res.history.shape == (200,)
        # history starts at the initial loss
        assert np.isclose(res.history[0], 9.0)

    def test_pytree_params(self):
        target = {"a": 1.5, "b": jnp.asarray([2.0, -1.0])}

        def loss(p):
            return ((p["a"] - target["a"]) ** 2
                    + jnp.sum((p["b"] - target["b"]) ** 2))

        res = fit(loss, {"a": jnp.asarray(0.0),
                         "b": jnp.zeros(2)}, steps=300,
                  learning_rate=0.1)
        assert abs(float(res.params["a"]) - 1.5) < 5e-3
        np.testing.assert_allclose(np.asarray(res.params["b"]),
                                   [2.0, -1.0], atol=5e-3)

    def test_best_iterate_not_last(self):
        """A huge learning rate makes Adam overshoot and diverge; the
        returned params must be the best-seen, not the final iterate."""
        loss = lambda x: (x - 1.0) ** 2
        res = fit(loss, jnp.asarray(0.9), steps=12, learning_rate=5.0)
        assert res.loss <= min(res.history)
        assert res.loss <= float((res.last_params - 1.0) ** 2) + 1e-12

    def test_callback_early_stop(self):
        calls = []

        def cb(step, params, loss, grad):
            calls.append(loss)
            if loss < 1e-4:
                raise StopIteration

        loss = lambda x: (x - 2.0) ** 2
        res = fit(loss, jnp.asarray(0.0), steps=500, learning_rate=0.2,
                  callback=cb)
        assert len(calls) < 500
        assert res.history.shape[0] == len(calls)

    def test_nonfinite_loss_at_start_raises(self):
        """NaN on the very first evaluation = the loss itself is broken;
        there is no progress to preserve, so fit must raise."""
        loss = lambda x: jnp.log(x)   # NaN for x < 0
        with pytest.raises(FloatingPointError):
            fit(loss, jnp.asarray(-1.0), steps=50, learning_rate=1.0)

    def test_nonfinite_loss_after_progress_returns_best(self):
        """Adam overshooting into a NaN region AFTER finite steps must
        not discard the accumulated best iterate (a pipeline fit can be
        ~hours of compute) — fit warns and returns it."""
        loss = lambda x: jnp.log(x)   # finite at the start, NaN once
        with pytest.warns(RuntimeWarning, match="non-finite loss"):
            res = fit(loss, jnp.asarray(0.05), steps=50,
                      learning_rate=1.0)
        assert np.isfinite(res.loss)
        assert res.history.shape[0] < 50          # stopped early
        assert not np.isfinite(res.history[-1])   # the NaN is recorded
        assert res.loss == min(h for h in res.history if np.isfinite(h))

    def test_steps_zero_evaluates_start(self):
        """FitResult promises params/loss describe the best iterate
        INCLUDING the starting point, even when no step runs."""
        loss = lambda x: (x - 3.0) ** 2
        res = fit(loss, jnp.asarray(1.0), steps=0)
        assert res.loss == pytest.approx(4.0)
        assert res.history.shape == (1,)
        assert float(res.params) == 1.0

    def test_jit_mode_matches_eager(self):
        """jit=True (one compiled value_and_grad program per step) must
        produce the same trajectory as the eager default."""
        loss = lambda x: jnp.sum((x - jnp.asarray([1.0, -2.0])) ** 2)
        r1 = fit(loss, jnp.zeros(2), steps=40, learning_rate=0.1)
        r2 = fit(loss, jnp.zeros(2), steps=40, learning_rate=0.1,
                 jit=True)
        np.testing.assert_allclose(r1.history, r2.history, rtol=1e-12)
        np.testing.assert_allclose(np.asarray(r1.params),
                                   np.asarray(r2.params), rtol=1e-12)

    def test_custom_optimizer(self):
        import optax
        loss = lambda x: jnp.sum((x - jnp.arange(3.0)) ** 2)
        res = fit(loss, jnp.zeros(3), steps=400,
                  optimizer=optax.sgd(learning_rate=0.2))
        np.testing.assert_allclose(np.asarray(res.params),
                                   np.arange(3.0), atol=1e-3)


class TestLaplace:
    def test_quadratic_covariance(self):
        """chi2 = (x-mu)^T A (x-mu) has Hessian 2A, so the Laplace
        covariance (2 H^-1) must equal A^-1 exactly."""
        A = np.array([[2.0, 0.3], [0.3, 0.5]])
        mu = jnp.asarray([1.0, -2.0])

        def chi2(x):
            d = x - mu
            return d @ jnp.asarray(A) @ d

        cov, sigma = laplace_covariance(chi2, mu)
        np.testing.assert_allclose(cov, np.linalg.inv(A), atol=1e-6)
        np.testing.assert_allclose(np.asarray(sigma),
                                   np.sqrt(np.diag(np.linalg.inv(A))),
                                   atol=1e-6)

    def test_nll_convention(self):
        """loss_is_chi2=False: covariance = H^-1 (no factor 2)."""
        def nll(x):
            return 0.5 * jnp.sum(x ** 2) / 0.25   # sigma = 0.5

        cov, sigma = laplace_covariance(nll, jnp.zeros(1),
                                        loss_is_chi2=False)
        np.testing.assert_allclose(cov, [[0.25]], atol=1e-8)
        np.testing.assert_allclose(np.asarray(sigma), [0.5], atol=1e-8)

    def test_indefinite_hessian_warns_nan_sigma(self):
        """At a saddle/maximum the chi2 Hessian is indefinite; sigma=0
        would read as 'perfectly constrained', so the negative-variance
        axes must come back NaN with a warning."""
        def chi2(x):
            return x[0] ** 2 - x[1] ** 2   # saddle at the origin

        with pytest.warns(RuntimeWarning, match="not positive definite"):
            cov, sigma = laplace_covariance(chi2, jnp.zeros(2))
        s = np.asarray(sigma)
        assert np.isfinite(s[0]) and s[0] > 0
        assert np.isnan(s[1])
        assert cov[1, 1] < 0   # the raw covariance still reports it

    def test_pytree_sigma_shape(self):
        def chi2(p):
            return (p["m"] - 1.0) ** 2 + jnp.sum(p["v"] ** 2)

        cov, sigma = laplace_covariance(
            chi2, {"m": jnp.asarray(1.0), "v": jnp.zeros(2)})
        assert cov.shape == (3, 3)
        assert set(sigma.keys()) == {"m", "v"}
        assert np.asarray(sigma["v"]).shape == (2,)


class TestPipelineFit:
    def test_recover_mc_from_table_band(self, ):
        """End-to-end smoke on a real differentiable-pipeline loss: fit
        ln M_c so a coarse displacement-table band matches a mock built
        at the truth (the examples/14 workflow at toy resolution)."""
        from baryonification_tpu import Cosmology
        from baryonification_tpu.displacement import Baryonification2D
        from baryonification_tpu.profiles import (DarkMatterOnly,
                                                  DarkMatterBaryon)
        from test_profiles import PAR

        cosmo = Cosmology(Omega_m=0.3, Omega_b=0.05, h=0.7, sigma8=0.8,
                          n_s=0.96)
        z = jnp.asarray([0.2])
        M = jnp.asarray(10 ** np.linspace(13.5, 14.5, 4))
        r = jnp.asarray(np.geomspace(0.1, 20.0, 32))

        def table_of(lnMc):
            par = dict(PAR)
            par['M_c'] = jnp.exp(lnMc)
            m = Baryonification2D(DarkMatterOnly(**par),
                                  DarkMatterBaryon(**par), cosmo,
                                  epsilon_max=20)
            return m.build_table_device(z, M, r)

        truth = float(np.log(10 ** 13.9))
        target = jax.lax.stop_gradient(table_of(jnp.asarray(truth)))

        def chi2(lnMc):
            return jnp.sum((table_of(lnMc) - target) ** 2) * 1e4

        start = float(np.log(10 ** 14.3))
        res = fit(chi2, jnp.asarray(start), steps=12, learning_rate=0.2)
        assert abs(float(res.params) - truth) < 0.3 * abs(start - truth)
        assert res.loss < res.history[0] / 10
