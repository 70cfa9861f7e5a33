"""inference.py: the packaged gradient-fit / Laplace-uncertainty API
(the workflow examples/14 and /15 exercise through the full pipeline,
tested here on fast closed-form losses plus one tiny table-build loss)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from baryonification_tpu.inference import (FitResult, fit, hmc_sample,
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


class TestFitCheckpoint:
    """checkpoint= : crash-safe resume for multi-hour pipeline fits."""

    LOSS = staticmethod(lambda p: (p["a"] - 1.5) ** 2
                        + jnp.sum((p["b"] - jnp.asarray([2., -1.])) ** 2))
    START = {"a": jnp.asarray(0.0), "b": jnp.zeros(2)}

    def test_resume_is_bit_exact(self, tmp_path):
        """interrupted-at-7 + resumed-to-20 == uninterrupted 20 steps,
        including the optax state (identical trajectory, not merely a
        nearby optimum)."""
        ck = str(tmp_path / "fit.ckpt")
        ref = fit(self.LOSS, self.START, steps=20, learning_rate=0.1)
        fit(self.LOSS, self.START, steps=7, learning_rate=0.1,
            checkpoint=ck)
        res = fit(self.LOSS, self.START, steps=20, learning_rate=0.1,
                  checkpoint=ck)
        np.testing.assert_array_equal(res.history, ref.history)
        np.testing.assert_array_equal(np.asarray(res.params["b"]),
                                      np.asarray(ref.params["b"]))
        assert float(res.params["a"]) == float(ref.params["a"])

    def test_resume_past_end_returns_saved(self, tmp_path):
        ck = str(tmp_path / "fit.ckpt")
        first = fit(self.LOSS, self.START, steps=9, learning_rate=0.1,
                    checkpoint=ck)
        again = fit(self.LOSS, self.START, steps=9, learning_rate=0.1,
                    checkpoint=ck)   # nothing left to do
        assert again.history.shape == (9,)
        assert again.loss == first.loss

    def test_checkpoint_every(self, tmp_path):
        import pickle
        ck = str(tmp_path / "fit.ckpt")
        fit(self.LOSS, self.START, steps=13, learning_rate=0.1,
            checkpoint=ck, checkpoint_every=5)
        with open(ck, "rb") as f:
            blob = pickle.load(f)
        assert blob["step"] == 13      # final step always saved
        assert len(blob["history"]) == 13


class TestHMC:
    def test_gaussian_moments(self):
        """Correlated 2D Gaussian: the chain must recover mean and
        covariance (the closed-form anchor for the sampler)."""
        cov = np.array([[1.0, 0.6], [0.6, 1.0]])
        prec = jnp.asarray(np.linalg.inv(cov))
        mu = jnp.asarray([1.0, -2.0])

        def logp(x):
            d = x - mu
            return -0.5 * d @ prec @ d

        res = hmc_sample(logp, jnp.zeros(2), jax.random.PRNGKey(0),
                         n_samples=3000, n_warmup=500, step_size=0.3,
                         n_leapfrog=8)
        s = np.asarray(res.samples)
        assert 0.5 < res.accept_rate <= 1.0
        np.testing.assert_allclose(s.mean(axis=0), np.asarray(mu),
                                   atol=0.12)
        np.testing.assert_allclose(np.cov(s.T), cov, atol=0.2)
        # dual averaging converged near the target acceptance
        assert abs(res.accept_rate - 0.8) < 0.15

    def test_mass_matrix_preconditions_anisotropy(self):
        """sigma ratio 100: without preconditioning a fixed-leapfrog
        chain cannot traverse the long axis; with the (Laplace-style)
        covariance as inverse mass it mixes like an isotropic one."""
        sig = np.array([1.0, 100.0])

        def logp(x):
            return -0.5 * jnp.sum((x / jnp.asarray(sig)) ** 2)

        res = hmc_sample(logp, jnp.zeros(2), jax.random.PRNGKey(1),
                         n_samples=3000, n_warmup=500, step_size=0.3,
                         n_leapfrog=8,
                         mass_covariance=np.diag(sig ** 2))
        s = np.asarray(res.samples)
        assert res.accept_rate > 0.5
        np.testing.assert_allclose(s.std(axis=0), sig, rtol=0.25)

    def test_deterministic_in_key(self):
        logp = lambda x: -0.5 * jnp.sum(x ** 2)
        a = hmc_sample(logp, jnp.zeros(2), jax.random.PRNGKey(7),
                       n_samples=50, n_warmup=20)
        b = hmc_sample(logp, jnp.zeros(2), jax.random.PRNGKey(7),
                       n_samples=50, n_warmup=20)
        c = hmc_sample(logp, jnp.zeros(2), jax.random.PRNGKey(8),
                       n_samples=50, n_warmup=20)
        np.testing.assert_array_equal(np.asarray(a.samples),
                                      np.asarray(b.samples))
        assert not np.array_equal(np.asarray(a.samples),
                                  np.asarray(c.samples))

    def test_pytree_params(self):
        def logp(p):
            return -0.5 * ((p["m"] - 1.0) ** 2 + jnp.sum(p["v"] ** 2))

        res = hmc_sample(logp, {"m": jnp.asarray(0.0),
                                "v": jnp.zeros(2)},
                         jax.random.PRNGKey(2), n_samples=400,
                         n_warmup=200)
        assert np.asarray(res.samples["m"]).shape == (400,)
        assert np.asarray(res.samples["v"]).shape == (400, 2)
        assert abs(np.asarray(res.samples["m"]).mean() - 1.0) < 0.3
        assert res.log_probs.shape == (400,)

    def test_nan_proposals_rejected_not_poisoning(self):
        """A log-posterior with a bounded domain goes NaN outside it;
        those proposals must be rejected, leaving the chain finite and
        in-domain throughout."""
        def logp(x):
            return jnp.log(1.0 - x[0] ** 2)   # NaN for |x| > 1

        res = hmc_sample(logp, jnp.zeros(1), jax.random.PRNGKey(3),
                         n_samples=500, n_warmup=100, step_size=0.5,
                         n_leapfrog=4)
        s = np.asarray(res.samples)
        assert np.all(np.isfinite(s))
        assert np.all(np.abs(s) < 1.0)
        assert np.all(np.isfinite(res.log_probs))


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

        # the same pipeline loss must also drive HMC: the whole chain
        # (leapfrog gradients of the table build included) is one
        # compiled lax.scan — smoke the traceability + finiteness
        samp = hmc_sample(lambda lnMc: -0.5 * chi2(lnMc),
                          res.params, jax.random.PRNGKey(0),
                          n_samples=4, n_warmup=2, n_leapfrog=2,
                          step_size=0.02)
        s = np.asarray(samp.samples)
        assert s.shape == (4,)
        assert np.all(np.isfinite(s))
        assert np.all(np.isfinite(samp.log_probs))
