"""HEALPix geometry tests: round trips, known centers, disc coverage."""

import numpy as np
import pytest

import jax.numpy as jnp

from baryonification_tpu.ops import healpix as hpx


class TestPixAng:
    @pytest.mark.parametrize("nside", [1, 2, 8, 64])
    def test_round_trip_all_pixels(self, nside):
        p = np.arange(hpx.npix(nside))
        theta, phi = hpx.pix2ang(nside, p)
        p2 = np.asarray(hpx.ang2pix(nside, theta, phi))
        np.testing.assert_array_equal(p2, p)

    def test_nside1_known_centers(self):
        """healpy pix2ang(1, [0,4,11], lonlat=False) values."""
        theta, phi = hpx.pix2ang(1, np.array([0, 4, 8, 11]))
        theta, phi = np.asarray(theta), np.asarray(phi)
        np.testing.assert_allclose(theta[0], np.arccos(2 / 3), rtol=1e-12)
        np.testing.assert_allclose(phi[0], np.pi / 4, rtol=1e-12)
        np.testing.assert_allclose(theta[1], np.pi / 2, rtol=1e-12)
        np.testing.assert_allclose(phi[1], 0.0, atol=1e-12)
        np.testing.assert_allclose(theta[2], np.arccos(-2 / 3), rtol=1e-12)
        np.testing.assert_allclose(phi[2], np.pi / 4, rtol=1e-12)
        np.testing.assert_allclose(phi[3], 7 * np.pi / 4, rtol=1e-12)

    def test_nside2_cap_pixels(self):
        """nside=2: first ring (cap) has 4 pixels at z = 1 - 1/12."""
        theta, phi = hpx.pix2ang(2, np.arange(4))
        np.testing.assert_allclose(np.cos(np.asarray(theta)), 11 / 12,
                                   rtol=1e-12)
        np.testing.assert_allclose(np.asarray(phi),
                                   (np.arange(4) + 0.5) * np.pi / 2,
                                   rtol=1e-12)

    @pytest.mark.parametrize("nside", [4, 32])
    def test_ang2pix_nearest_ring(self, nside):
        """Random angles map to a pixel whose center is within ~2 pixel
        spacings."""
        rng = np.random.default_rng(3)
        theta = np.arccos(rng.uniform(-1, 1, 500))
        phi = rng.uniform(0, 2 * np.pi, 500)
        p = hpx.ang2pix(nside, theta, phi)
        tc, pc = hpx.pix2ang(nside, p)
        v1 = np.asarray(hpx.ang2vec(jnp.asarray(theta), jnp.asarray(phi)))
        v2 = np.asarray(hpx.ang2vec(tc, pc))
        ang = np.arccos(np.clip(np.sum(v1 * v2, axis=-1), -1, 1))
        assert np.max(ang) < 2.0 * hpx.nside2resol(nside)

    def test_ring_info_counts(self):
        """Total pixels from ring structure equals 12 nside^2."""
        nside = 8
        rings = np.arange(1, 4 * nside)
        z, start, npr, shift = hpx.ring_info(nside, rings)
        assert int(np.sum(np.asarray(npr))) == hpx.npix(nside)
        # ring starts are cumulative
        np.testing.assert_array_equal(np.asarray(start)[1:],
                                      np.cumsum(np.asarray(npr))[:-1])
        # z strictly decreasing
        assert np.all(np.diff(np.asarray(z)) < 0)

    def test_z_to_ring_consistent(self):
        nside = 16
        rings = np.arange(1, 4 * nside)
        z, _, _, _ = hpx.ring_info(nside, rings)
        got = np.asarray(hpx.z_to_ring(nside, np.asarray(z) - 1e-9))
        np.testing.assert_array_equal(got, rings)


class TestInterpWeights:
    @pytest.mark.parametrize("nside", [4, 32])
    def test_weights_sum_to_one(self, nside):
        rng = np.random.default_rng(4)
        theta = np.arccos(rng.uniform(-1, 1, 300))
        phi = rng.uniform(0, 2 * np.pi, 300)
        pix, w = hpx.get_interp_weights(nside, jnp.asarray(theta),
                                        jnp.asarray(phi))
        np.testing.assert_allclose(np.sum(np.asarray(w), axis=-1), 1.0,
                                   rtol=1e-12)
        assert np.all(np.asarray(w) >= -1e-12)
        assert np.all(np.asarray(pix) >= 0)
        assert np.all(np.asarray(pix) < hpx.npix(nside))

    def test_exact_at_pixel_centers(self):
        """At a pixel center, the interpolation reproduces the map value
        (dominant weight on that pixel)."""
        nside = 16
        p = np.array([17, 500, 1800, 3000])
        theta, phi = hpx.pix2ang(nside, p)
        pix, w = hpx.get_interp_weights(nside, theta, phi)
        pix, w = np.asarray(pix), np.asarray(w)
        for i in range(len(p)):
            sel = pix[i] == p[i]
            assert np.sum(w[i][sel]) > 0.95, (p[i], pix[i], w[i])

    def test_linear_in_z_function(self):
        """Interpolating the map m(pix) = z(pix) reproduces z to high
        accuracy away from the poles."""
        nside = 32
        zmap = np.cos(np.asarray(hpx.pix2ang(nside,
                                             np.arange(hpx.npix(nside)))[0]))
        rng = np.random.default_rng(5)
        theta = np.arccos(rng.uniform(-0.9, 0.9, 200))
        phi = rng.uniform(0, 2 * np.pi, 200)
        pix, w = hpx.get_interp_weights(nside, jnp.asarray(theta),
                                        jnp.asarray(phi))
        got = np.sum(zmap[np.asarray(pix)] * np.asarray(w), axis=-1)
        np.testing.assert_allclose(got, np.cos(theta), atol=2e-3)


class TestDiscWindow:
    @pytest.mark.parametrize("nside,radius", [(16, 0.1), (16, 0.3),
                                              (64, 0.05)])
    def test_matches_brute_force(self, nside, radius):
        """disc_window recovers exactly the pixels whose centers lie in
        the disc (query_disc inclusive=False semantics)."""
        rng = np.random.default_rng(6)
        allpix = np.arange(hpx.npix(nside))
        centers = np.asarray(hpx.pix2vec(nside, allpix))

        theta0 = np.arccos(rng.uniform(-0.95, 0.95, 12))
        phi0 = rng.uniform(0, 2 * np.pi, 12)
        v0 = np.asarray(hpx.ang2vec(jnp.asarray(theta0), jnp.asarray(phi0)))

        n_rings = int(2 * radius / (np.pi / (4 * nside))) + 4
        n_phi = int(2.5 * radius * 4 * nside / np.pi) + 8

        pix, valid = hpx.disc_window(nside, jnp.asarray(theta0),
                                     jnp.asarray(phi0),
                                     jnp.full(12, radius), n_rings, n_phi)
        pix, valid = np.asarray(pix), np.asarray(valid)

        for h in range(12):
            want = set(allpix[centers @ v0[h] >= np.cos(radius)])
            got = pix[h][valid[h]]
            assert len(got) == len(set(got.tolist())), "duplicate pixels"
            assert set(got.tolist()) == want, (
                f"halo {h}: missing {want - set(got.tolist())}, "
                f"extra {set(got.tolist()) - want}")

    def test_polar_disc(self):
        """Disc covering the north pole."""
        nside = 16
        radius = 0.2
        n_rings = int(2 * radius / (np.pi / (4 * nside))) + 4
        n_phi = 4 * nside  # full rings possible near pole
        pix, valid = hpx.disc_window(nside, jnp.asarray([0.02]),
                                     jnp.asarray([1.0]),
                                     jnp.asarray([radius]), n_rings, n_phi)
        got = np.asarray(pix)[0][np.asarray(valid)[0]]
        allpix = np.arange(hpx.npix(nside))
        centers = np.asarray(hpx.pix2vec(nside, allpix))
        v0 = np.asarray(hpx.ang2vec(jnp.asarray(0.02), jnp.asarray(1.0)))
        want = set(allpix[centers @ v0 >= np.cos(radius)])
        assert len(got) == len(set(got.tolist()))
        assert set(got.tolist()) == want


class TestDiscWindowMask:
    def test_matches_vector_window(self):
        """disc_window_mask_tab (analytic per-ring test, no pixel-vector
        gathers) selects exactly the same pixels as disc_window_tab."""
        nside = 32
        rng = np.random.default_rng(3)
        n = 40
        theta0 = np.arccos(rng.uniform(-1, 1, n))
        phi0 = rng.uniform(0, 2 * np.pi, n)
        radius = rng.uniform(0.01, 0.4, n)
        n_rings, n_phi = 40, 64

        import jax
        tables = hpx.RingTables(nside, dtype=jnp.float64)
        vec = hpx.pixel_vectors(nside, dtype=jnp.float64)

        p1, v1, _ = jax.vmap(lambda t, p, r: hpx.disc_window_tab(
            tables, vec, t, p, r, n_rings, n_phi))(
            jnp.asarray(theta0), jnp.asarray(phi0), jnp.asarray(radius))
        p2, v2 = jax.vmap(lambda t, p, r: hpx.disc_window_mask_tab(
            tables, t, p, r, n_rings, n_phi))(
            jnp.asarray(theta0), jnp.asarray(phi0), jnp.asarray(radius))

        for h in range(n):
            got1 = set(np.asarray(p1[h])[np.asarray(v1[h])].tolist())
            got2 = set(np.asarray(p2[h])[np.asarray(v2[h])].tolist())
            assert got1 == got2, (h, got1 ^ got2)


class TestInterpWeightsClosed:
    def test_matches_table_version(self):
        nside = 32
        rng = np.random.default_rng(5)
        theta = np.arccos(rng.uniform(-1, 1, 500))
        phi = rng.uniform(0, 2 * np.pi, 500)
        tables = hpx.RingTables(nside, dtype=jnp.float64)
        pix_t, w_t = hpx.get_interp_weights_tab(tables, jnp.asarray(theta),
                                                jnp.asarray(phi))
        ps, ws = hpx.get_interp_weights_parts(nside, jnp.asarray(theta),
                                              jnp.asarray(phi))
        pix_c = np.stack([np.asarray(p) for p in ps], axis=-1)
        w_c = np.stack([np.asarray(w) for w in ws], axis=-1)
        np.testing.assert_array_equal(pix_c, np.asarray(pix_t))
        np.testing.assert_allclose(w_c, np.asarray(w_t), atol=1e-12)


class TestDeviceBuilders:
    """The on-device geometry builders must match the numpy/host
    reference implementations exactly (they replace ~85 s of single-core
    host work + a 150 MB transfer per bench run at NSIDE 1024)."""

    @pytest.mark.parametrize("nside", [4, 8, 64])
    def test_nest2ring_all_matches_numpy(self, nside):
        got = np.asarray(hpx.nest2ring_all(nside))
        want = hpx.nest2ring(nside, np.arange(hpx.npix(nside)))
        np.testing.assert_array_equal(got, want)

    @pytest.mark.parametrize("nside", [4, 8, 64])
    def test_pixel_planes_device_matches_pix2vec(self, nside):
        rt = hpx.RingTables(nside, dtype=jnp.float64)
        got = hpx.pixel_planes_device(nside, rt.z, rt.start, rt.npr,
                                      rt.shift)
        want = hpx.pixel_vectors_soa(nside, dtype=jnp.float64)
        for g, w in zip(got, want):
            np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                       rtol=0, atol=1e-13)

    def test_pixel_planes_nested_order(self):
        nside = 8
        rt = hpx.RingTables(nside, dtype=jnp.float64)
        n2r = hpx.nest2ring_all(nside)
        got = hpx.pixel_planes_device(nside, rt.z, rt.start, rt.npr,
                                      rt.shift, p=n2r)
        vx, vy, vz = hpx.pixel_vectors_soa(nside, dtype=jnp.float64)
        n2r_np = np.asarray(n2r)
        for g, w in zip(got, (vx, vy, vz)):
            np.testing.assert_allclose(np.asarray(g),
                                       np.asarray(w)[n2r_np],
                                       rtol=0, atol=1e-13)
