"""FITS HEALPix map IO (reference `utils/io.py:338-350` reads shell maps
via hp.read_map; here a pure-numpy reader/writer covers the healpy
binary-table layout — healpy/astropy are absent from the image, so the
oracle is a byte-level hand-built file plus write/read round-trips)."""

import gzip

import numpy as np
import pytest

from baryonification_tpu.io import (LightconeShell, read_healpix_fits,
                                    write_healpix_fits)
from baryonification_tpu.ops import healpix as hpx

COSMO_DICT = dict(Omega_m=0.3, Omega_b=0.05, h=0.7, sigma8=0.8,
                  n_s=0.96, w0=-1.0)


class TestHealpixFits:
    def test_roundtrip_ring(self, tmp_path):
        nside = 16
        rng = np.random.default_rng(7)
        m = rng.normal(size=hpx.npix(nside))
        p = tmp_path / "map.fits"
        write_healpix_fits(p, m)
        got = read_healpix_fits(p)
        np.testing.assert_array_equal(got, m)

    def test_roundtrip_nested_converts(self, tmp_path):
        """A NESTED-ordered file must come back RING-ordered."""
        nside = 8
        rng = np.random.default_rng(8)
        m = rng.normal(size=hpx.npix(nside))
        p = tmp_path / "map_nest.fits"
        write_healpix_fits(p, m, nest=True)
        # the file is genuinely nested on disk: raw column != ring map
        raw = np.frombuffer(open(p, 'rb').read(), dtype='>f8',
                            offset=2 * 2880,
                            count=hpx.npix(nside)).astype(np.float64)
        assert not np.array_equal(raw, m)
        got = read_healpix_fits(p)
        np.testing.assert_array_equal(got, m)

    def test_handbuilt_f32_chunked(self, tmp_path):
        """Byte-level oracle: a 1024E-chunked float32 BINTABLE (the
        exact healpy.write_map layout for NSIDE >= 16) with an extra
        leading column, read back via field selection."""
        nside = 16
        npix = hpx.npix(nside)
        rng = np.random.default_rng(9)
        m = rng.normal(size=npix).astype(np.float32)
        extra = np.arange(npix, dtype=np.int32)
        rep, nrow = 1024, npix // 1024

        def card(key, val):
            v = (f"'{val}'".ljust(20) if isinstance(val, str)
                 else ('T'.rjust(20) if val is True else str(val).rjust(20)))
            return f"{key:8s}= {v} /".ljust(80)[:80]

        def block(cards):
            txt = ''.join(cards + ['END'.ljust(80)])
            return txt.ljust(-(-len(txt) // 2880) * 2880).encode()

        primary = block([card('SIMPLE', True), card('BITPIX', 8),
                         card('NAXIS', 0), card('EXTEND', True)])
        hdr = block([card('XTENSION', 'BINTABLE'), card('BITPIX', 8),
                     card('NAXIS', 2), card('NAXIS1', 4 * rep * 2),
                     card('NAXIS2', nrow), card('PCOUNT', 0),
                     card('GCOUNT', 1), card('TFIELDS', 2),
                     card('TFORM1', f'{rep}J'), card('TFORM2', f'{rep}E'),
                     card('ORDERING', 'RING'), card('NSIDE', nside)])
        rows = np.zeros(nrow, dtype=[('a', '>i4', (rep,)),
                                     ('b', '>f4', (rep,))])
        rows['a'] = extra.reshape(nrow, rep)
        rows['b'] = m.reshape(nrow, rep)
        data = rows.tobytes()
        p = tmp_path / "hand.fits"
        p.write_bytes(primary + hdr + data
                      + b'\x00' * ((-len(data)) % 2880))
        got = read_healpix_fits(p, field=1)
        np.testing.assert_array_equal(got, m.astype(np.float64))
        got0 = read_healpix_fits(p, field=0)
        np.testing.assert_array_equal(got0, extra.astype(np.float64))

    def test_gzip(self, tmp_path):
        nside = 8
        m = np.arange(hpx.npix(nside), dtype=np.float64)
        p = tmp_path / "map.fits"
        write_healpix_fits(p, m)
        pz = tmp_path / "map.fits.gz"
        pz.write_bytes(gzip.compress(p.read_bytes()))
        np.testing.assert_array_equal(read_healpix_fits(pz), m)

    def test_gzip_write_roundtrip(self, tmp_path):
        """write_healpix_fits must honor a .gz suffix (the reader
        gzip-opens by suffix, so a raw-bytes write would not read back)."""
        nside = 8
        rng = np.random.default_rng(7)
        m = rng.normal(size=hpx.npix(nside))
        pz = tmp_path / "map.fits.gz"
        write_healpix_fits(pz, m)
        assert pz.read_bytes()[:2] == b"\x1f\x8b"  # gzip magic
        np.testing.assert_array_equal(read_healpix_fits(pz), m)

    def test_lightcone_shell_path(self, tmp_path):
        nside = 8
        rng = np.random.default_rng(11)
        m = rng.uniform(0.5, 1.5, hpx.npix(nside))
        p = tmp_path / "shell.fits"
        write_healpix_fits(p, m)
        shell = LightconeShell(path=str(p), cosmo=COSMO_DICT)
        assert shell.NSIDE == nside
        np.testing.assert_array_equal(shell.map, m)

    def test_non_bintable_rejected(self, tmp_path):
        p = tmp_path / "bad.fits"
        p.write_bytes(b"SIMPLE  =                    T /".ljust(80)
                      + b"NAXIS   =                    0 /".ljust(80)
                      + b"END".ljust(2880 - 160))
        with pytest.raises(ValueError, match="BINTABLE"):
            read_healpix_fits(p)
