"""Unit tests for the numerical primitives (fftlog, interp, scatter)."""

import numpy as np
import pytest

import jax.numpy as jnp
from scipy import interpolate as sint

from baryonification_tpu.ops.fftlog import fftlog_transform, loggamma
from baryonification_tpu.ops.interp import (pchip_derivatives, pchip_eval,
                                            pchip_interp, masked_compact,
                                            ndlinear_interp)
from baryonification_tpu.ops.scatter_pallas import (scatter_add_accum,
                                                    sorted_scatter_add_pallas)


class TestLogGamma:
    def test_real_axis(self):
        from scipy.special import gammaln
        z = np.linspace(0.1, 20.0, 50)
        got = np.asarray(loggamma(z + 0j))
        np.testing.assert_allclose(np.real(got), gammaln(z), rtol=1e-12)

    def test_complex(self):
        """Gamma(z) = exp(loggamma(z)) matches scipy; our loggamma may
        differ by 2 pi i branches in the reflection region, which cancels
        in exp (all fftlog kernels go through exp)."""
        from scipy.special import loggamma as sc_loggamma
        z = np.array([0.25 + 3j, 1.5 - 10j, 3.0 + 40j, 0.75 + 0.1j, -1.5 + 2j])
        got = np.exp(np.asarray(loggamma(z)))
        want = np.exp(sc_loggamma(z))
        np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)


class TestFFTLog:
    def test_gaussian_3d(self):
        """3D transform of a Gaussian: T3[e^{-r^2/2}](k) = e^{-k^2/2}/(2pi)^{3/2}.

        Uses plaw=-2, the production bias the reference hardcodes for
        profiles (`Schneider19.py:124`): tight in the resolved band,
        few-percent on the low-k plateau (same regime CCL operates in).
        """
        r = np.geomspace(1e-4, 1e3, 1024)
        f = np.exp(-0.5 * r**2)
        k, F = fftlog_transform(r, f, 3, 0, plaw=-2.0)
        k, F = np.asarray(k), np.asarray(F)
        want = np.exp(-0.5 * k**2) / (2 * np.pi) ** 1.5
        mid = (k > 0.2) & (k < 4.0)
        np.testing.assert_allclose(F[mid], want[mid], rtol=1e-3)
        lo = (k > 1e-2) & (k < 0.2)
        np.testing.assert_allclose(F[lo], want[lo], rtol=3e-2)

    def test_gaussian_2d(self):
        """2D: T2[e^{-r^2/2}](k) = e^{-k^2/2}/(2pi).

        2D transforms use plaw=-1 — the reference always passes
        ``plaw_fourier + 1`` for dim=2 (`Pixel.py:208-209`); q=-2 would sit
        on the Gamma pole of the mu=0 Mellin kernel.
        """
        r = np.geomspace(1e-4, 1e3, 1024)
        f = np.exp(-0.5 * r**2)
        k, F = fftlog_transform(r, f, 2, 0, plaw=-1.0)
        k, F = np.asarray(k), np.asarray(F)
        want = np.exp(-0.5 * k**2) / (2 * np.pi)
        mid = (k > 0.2) & (k < 4.0)
        np.testing.assert_allclose(F[mid], want[mid], rtol=1e-3)
        lo = (k > 1e-2) & (k < 0.2)
        np.testing.assert_allclose(F[lo], want[lo], rtol=3e-2)

    def test_round_trip(self):
        """Round trip recovers f/(2pi)^3 (the reference multiplies back,
        `utils/Pixel.py:155`)."""
        r = np.geomspace(1e-5, 1e4, 2048)
        f = 1.0 / (1.0 + (r / 3.0) ** 2) ** 2 * np.exp(-((r / 50) ** 2))
        k, Fk = fftlog_transform(r, f, 3, 0, plaw=-2.0)
        r2, f2 = fftlog_transform(np.asarray(k), Fk, 3, 0, plaw=-1.0)
        f2 = np.asarray(f2) * (2 * np.pi) ** 3
        interp_back = np.interp(np.log(r), np.log(np.asarray(r2)), f2)
        sel = (r > 1e-2) & (r < 20)
        np.testing.assert_allclose(interp_back[sel], f[sel], rtol=5e-3,
                                   atol=1e-6 * f.max())

    def test_batched(self):
        r = np.geomspace(1e-3, 1e3, 512)
        f = np.stack([np.exp(-0.5 * r**2), np.exp(-0.125 * r**2)])
        k, F = fftlog_transform(r, f, 3, 0, plaw=-1.0)
        assert F.shape == (2, 512)
        k, F0 = fftlog_transform(r, f[0], 3, 0, plaw=-1.0)
        np.testing.assert_allclose(np.asarray(F)[0], np.asarray(F0), rtol=1e-12)


class TestPchip:
    def test_matches_scipy(self):
        rng = np.random.default_rng(0)
        x = np.sort(rng.uniform(0, 10, 40))
        y = np.cumsum(rng.uniform(0, 1, 40))  # monotone data
        xq = np.linspace(x[0], x[-1], 500)
        want = sint.PchipInterpolator(x, y)(xq)
        got = np.asarray(pchip_interp(xq, x, y))
        np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-10)

    def test_matches_scipy_nonmonotone(self):
        rng = np.random.default_rng(1)
        x = np.linspace(0, 5, 30)
        y = np.sin(x) + 0.1 * rng.standard_normal(30)
        xq = np.linspace(0, 5, 333)
        want = sint.PchipInterpolator(x, y)(xq)
        got = np.asarray(pchip_interp(xq, x, y))
        np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-9)

    def test_extrapolation_matches_scipy(self):
        x = np.linspace(1.0, 4.0, 20)
        y = np.log(x)
        xq = np.array([0.5, 0.9, 4.1, 5.0])
        want = sint.PchipInterpolator(x, y, extrapolate=True)(xq)
        got = np.asarray(pchip_interp(xq, x, y, extrapolate=True))
        np.testing.assert_allclose(got, want, rtol=1e-10)

    def test_no_extrapolate_nan(self):
        x = np.linspace(0, 1, 10)
        y = x**2
        out = np.asarray(pchip_interp(np.array([-0.1, 0.5, 1.1]), x, y,
                                      extrapolate=False))
        assert np.isnan(out[0]) and np.isnan(out[2]) and np.isfinite(out[1])

    def test_monotone_preserving(self):
        """Monotone input data must give monotone interpolant (the property
        the reference relies on for mass inversion)."""
        x = np.linspace(0, 1, 20)
        y = np.where(x < 0.5, x, 0.5) + np.where(x > 0.5, 2 * (x - 0.5), 0)
        xq = np.linspace(0, 1, 1000)
        got = np.asarray(pchip_interp(xq, x, y))
        assert np.all(np.diff(got) >= -1e-12)

    def test_masked_compact(self):
        x = np.linspace(0, 9, 10)
        y = x**2
        mask = np.array([1, 1, 0, 1, 1, 1, 0, 1, 0, 0], dtype=bool)
        xc, yc, x_hi = masked_compact(jnp.asarray(x), jnp.asarray(y),
                                      jnp.asarray(mask))
        xc, yc = np.asarray(xc), np.asarray(yc)
        np.testing.assert_allclose(xc[:6], x[mask])
        np.testing.assert_allclose(yc[:6], y[mask])
        assert np.all(np.diff(xc) > 0)  # strictly increasing incl. padding
        assert float(x_hi) == 7.0


class TestNdLinear:
    def test_matches_scipy_3d(self):
        rng = np.random.default_rng(2)
        gx = np.sort(rng.uniform(0, 1, 8))
        gy = np.sort(rng.uniform(0, 1, 9))
        gz = np.sort(rng.uniform(0, 1, 10))
        vals = rng.standard_normal((8, 9, 10))
        rgi = sint.RegularGridInterpolator((gx, gy, gz), vals,
                                           bounds_error=False,
                                           fill_value=np.nan)
        q = rng.uniform(-0.05, 1.05, (200, 3))
        want = rgi(q)
        got = np.asarray(ndlinear_interp((gx, gy, gz), vals,
                                         (q[:, 0], q[:, 1], q[:, 2])))
        np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)

    def test_1d(self):
        gx = np.linspace(0, 1, 11)
        vals = gx**2
        got = np.asarray(ndlinear_interp((gx,), vals, (np.array([0.55]),)))
        np.testing.assert_allclose(got, [0.5 * (0.25 + 0.36)], atol=1e-12)


def _scatter_reference(npix, idx, val_channels):
    """Ground truth: XLA scatter-add with out-of-range rows dropped."""
    ok = idx < npix
    safe = np.where(ok, idx, 0)
    return tuple(
        np.asarray(jnp.zeros(npix, jnp.float32)
                   .at[safe].add(jnp.where(ok, v, 0.0)))
        for v in val_channels)


class TestPallasScatter:
    """Interpret-mode coverage of the TPU sorted-scatter kernel — the
    framework's hottest primitive (ADVICE r1: the CPU suite otherwise only
    ever exercises the .at[].add fallback, and the TPU bench asserts total
    mass only, which per-pixel block/tile misrouting would still pass)."""

    def _run(self, npix, n_rows, n_chan, seed, oor_frac=0.1,
             block_rows=256, tile_rows=128, dupes=True):
        rng = np.random.default_rng(seed)
        hi = npix + max(1, int(npix * 0.5)) if oor_frac > 0 else npix
        idx = rng.integers(0, hi, n_rows)
        if not dupes:
            idx = np.unique(idx)[:n_rows]
        idx = np.sort(idx).astype(np.int32)
        vals = tuple(rng.normal(size=idx.size).astype(np.float32)
                     for _ in range(n_chan))
        accs = tuple(jnp.zeros(npix, jnp.float32) for _ in range(n_chan))
        got = sorted_scatter_add_pallas(
            accs, jnp.asarray(idx), tuple(jnp.asarray(v) for v in vals),
            block_rows=block_rows, tile_rows=tile_rows, interpret=True)
        want = _scatter_reference(npix, idx, vals)
        for g, w in zip(got, want):
            np.testing.assert_allclose(np.asarray(g), w, rtol=1e-6,
                                       atol=1e-6)

    def test_single_channel_with_oor_sentinels(self):
        """Random sorted indices incl. out-of-range padding sentinels."""
        self._run(npix=300, n_rows=1000, n_chan=1, seed=0)

    def test_multi_channel(self):
        """Three value planes (the SoA offset channels) routed per-pixel."""
        self._run(npix=513, n_rows=2048, n_chan=3, seed=1)

    def test_heavy_duplicates_accumulate(self):
        """Many rows landing on few pixels must sum, not overwrite."""
        rng = np.random.default_rng(2)
        npix = 140
        idx = np.sort(rng.integers(0, 8, 4000)).astype(np.int32)
        vals = (rng.normal(size=idx.size).astype(np.float32),)
        accs = (jnp.zeros(npix, jnp.float32),)
        got = sorted_scatter_add_pallas(
            accs, jnp.asarray(idx), (jnp.asarray(vals[0]),),
            block_rows=128, tile_rows=128, interpret=True)
        want = _scatter_reference(npix, idx, vals)
        np.testing.assert_allclose(np.asarray(got[0]), want[0], rtol=1e-5,
                                   atol=1e-5)

    def test_nonzero_accumulator_aliasing(self):
        """Input accumulators already hold values; output adds in place."""
        rng = np.random.default_rng(3)
        npix = 260
        base = rng.normal(size=npix).astype(np.float32)
        idx = np.sort(rng.integers(0, npix, 700)).astype(np.int32)
        vals = rng.normal(size=idx.size).astype(np.float32)
        got = sorted_scatter_add_pallas(
            (jnp.asarray(base),), jnp.asarray(idx), (jnp.asarray(vals),),
            block_rows=128, tile_rows=128, interpret=True)
        want = base + _scatter_reference(npix, idx, (vals,))[0]
        np.testing.assert_allclose(np.asarray(got[0]), want, rtol=1e-5,
                                   atol=1e-5)

    def test_all_rows_out_of_range(self):
        """Pure-padding batch leaves the accumulator untouched."""
        npix = 130
        idx = np.full(512, npix + 7, np.int32)
        got = sorted_scatter_add_pallas(
            (jnp.ones(npix, jnp.float32),), jnp.asarray(idx),
            (jnp.ones(512, jnp.float32),),
            block_rows=128, tile_rows=128, interpret=True)
        np.testing.assert_array_equal(np.asarray(got[0]),
                                      np.ones(npix, np.float32))

    def test_block_tile_shape_ladder(self):
        """Misrouting across block/tile boundaries shows up when the
        partition sizes change but the answer must not."""
        for br, tr in [(128, 128), (256, 128), (512, 256), (1024, 512)]:
            self._run(npix=1100, n_rows=3000, n_chan=2, seed=4,
                      block_rows=br, tile_rows=tr)

    def test_scatter_add_accum_unsorted_cpu_fallback(self):
        """The public entry: unsorted indices + OOR dropped on the CPU
        fallback path the runners hit in tests."""
        rng = np.random.default_rng(5)
        npix = 200
        idx = jnp.asarray(rng.integers(0, npix + 50, 900).astype(np.int32))
        vals = (jnp.asarray(rng.normal(size=900).astype(np.float32)),
                jnp.asarray(rng.normal(size=900).astype(np.float32)))
        accs = (jnp.zeros(npix, jnp.float32), jnp.zeros(npix, jnp.float32))
        got = scatter_add_accum(accs, idx, vals)
        want = _scatter_reference(npix, np.asarray(idx),
                                  tuple(np.asarray(v) for v in vals))
        for g, w in zip(got, want):
            np.testing.assert_allclose(np.asarray(g), w, rtol=1e-6,
                                       atol=1e-6)
