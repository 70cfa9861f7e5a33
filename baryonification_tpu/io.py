"""Data objects: halo catalogs, lightcone shells, grids, snapshots.

TPU-native re-implementation of `/root/reference/BaryonForge/utils/io.py`.
Catalogs are plain structured numpy arrays on the host (IO/layout), with
helpers to export device-friendly columnar float arrays for the runner
kernels. Validation, pole-clipping, slicing and the cosmology-dict
contract mirror the reference.
"""

import warnings

import numpy as np

__all__ = ['HaloLightConeCatalog', 'HaloNDCatalog', 'LightconeShell',
           'GriddedMap', 'ParticleSnapshot', 'read_healpix_fits',
           'write_healpix_fits']


# ---- minimal FITS HEALPix map IO (healpy.write_map layout) ----
# The reference loads shell maps via hp.read_map
# (`utils/io.py:338-350`); healpy/astropy are not in this image, but the
# format is a plain FITS binary table, so a ~100-line pure-numpy reader
# closes the IO parity gap. Scope: single-HDU BINTABLE maps as written
# by healpy.write_map (E/D/J/K columns, RING or NESTED ordering).

_TFORM_DTYPES = {'E': '>f4', 'D': '>f8', 'J': '>i4', 'K': '>i8',
                 'I': '>i2', 'B': 'u1'}


def _parse_fits_headers(fh):
    """Yield (cards, data_offset, data_bytes) per HDU of an open file."""
    out = []
    while True:
        cards = {}
        ended = False
        first = fh.read(2880)
        if len(first) < 2880:
            break
        block = first
        while True:
            for i in range(0, 2880, 80):
                card = block[i:i + 80].decode('ascii', 'replace')
                key = card[:8].strip()
                if key == 'END':
                    ended = True
                    break
                if card[8:10] == '= ':
                    val = card[10:]
                    if val.lstrip().startswith("'"):
                        val = val.split("'")[1].strip()
                    else:
                        val = val.split('/')[0].strip()
                    cards[key] = val
            if ended:
                break
            block = fh.read(2880)
            if len(block) < 2880:
                raise ValueError("truncated FITS header")
        naxis = int(cards.get('NAXIS', '0'))
        nbytes = 0
        if naxis > 0:
            # FITS standard: |BITPIX|/8 * GCOUNT * (PCOUNT + prod NAXISi)
            prod = 1
            for ax in range(1, naxis + 1):
                prod *= int(cards[f'NAXIS{ax}'])
            nbytes = (abs(int(cards.get('BITPIX', '8'))) // 8
                      * int(cards.get('GCOUNT', '1'))
                      * (int(cards.get('PCOUNT', '0')) + prod))
        offset = fh.tell()
        out.append((cards, offset, nbytes))
        fh.seek(offset + -(-nbytes // 2880) * 2880)
    return out


def read_healpix_fits(path, field=0):
    """Read a HEALPix map from a FITS binary table (healpy.write_map
    layout) without healpy/astropy. Returns a RING-ordered float64 map
    (column ``field``); NESTED files are converted via the on-device
    bit-exact `ops.healpix.nest2ring_all` mapping."""
    import re
    if str(path).lower().endswith('.gz'):
        import gzip
        opener = lambda p: gzip.open(p, 'rb')
    else:
        opener = lambda p: open(p, 'rb')
    with opener(path) as fh:
        hdus = _parse_fits_headers(fh)
        table = next(((c, off, nb) for c, off, nb in hdus
                      if c.get('XTENSION', '').startswith('BINTABLE')),
                     None)
        if table is None:
            raise ValueError(f"{path}: no BINTABLE HDU "
                             "(not a healpy-style HEALPix map file)")
        cards, offset, nbytes = table
        if cards.get('INDXSCHM', 'IMPLICIT').upper().startswith('EXPL'):
            raise NotImplementedError(
                f"{path}: INDXSCHM=EXPLICIT (partial-sky map with a "
                "PIXEL index column) is not supported — read the "
                "PIXEL/SIGNAL columns with field= and assemble manually")
        nrow = int(cards['NAXIS2'])
        tfields = int(cards['TFIELDS'])
        dtl = []
        for i in range(1, tfields + 1):
            m = re.match(r'(\d*)([A-Z])', cards[f'TFORM{i}'].strip())
            rep, code = int(m.group(1) or 1), m.group(2)
            if code not in _TFORM_DTYPES:
                raise ValueError(f"unsupported FITS column type {code!r}")
            dtl.append((f'c{i}', _TFORM_DTYPES[code], (rep,)))
        fh.seek(offset)
        rows = np.frombuffer(fh.read(int(cards['NAXIS1']) * nrow),
                             dtype=np.dtype(dtl), count=nrow)
    m = np.ascontiguousarray(
        rows[f'c{field + 1}']).astype(np.float64).reshape(-1)
    if cards.get('ORDERING', 'RING').upper().startswith('NEST'):
        from .ops import healpix as hpx
        nside = int(round(np.sqrt(m.size / 12)))
        n2r = np.asarray(hpx.nest2ring_all(nside))
        ring = np.empty_like(m)
        ring[n2r] = m
        return ring
    return m


def write_healpix_fits(path, hmap, nest=False):
    """Write a RING-ordered map as a healpy-compatible FITS binary
    table (one float64 column, 1024-element rows like healpy)."""
    hmap = np.asarray(hmap, dtype=np.float64).reshape(-1)
    npix = hmap.size
    nside = int(round(np.sqrt(npix / 12)))
    if 12 * nside * nside != npix:
        raise ValueError(f"map size {npix} is not a valid HEALPix size")
    if nest:
        from .ops import healpix as hpx
        hmap = hmap[np.asarray(hpx.nest2ring_all(nside))]
    rep = 1024 if npix % 1024 == 0 else 1
    nrow = npix // rep

    def block(cards):
        txt = ''.join(c.ljust(80) for c in cards + ['END'])
        return txt.ljust(-(-len(txt) // 2880) * 2880).encode('ascii')

    def card(key, val, comment=''):
        if isinstance(val, str):
            v = f"'{val}'".ljust(20)
        elif isinstance(val, bool):
            v = 'T'.rjust(20) if val else 'F'.rjust(20)
        else:
            v = str(val).rjust(20)
        return f"{key:8s}= {v} / {comment}"[:80]

    primary = block([card('SIMPLE', True), card('BITPIX', 8),
                     card('NAXIS', 0), card('EXTEND', True)])
    header = block([
        card('XTENSION', 'BINTABLE'), card('BITPIX', 8),
        card('NAXIS', 2), card('NAXIS1', 8 * rep),
        card('NAXIS2', nrow), card('PCOUNT', 0), card('GCOUNT', 1),
        card('TFIELDS', 1), card('TFORM1', f'{rep}D'),
        card('TTYPE1', 'TEMPERATURE'),
        card('PIXTYPE', 'HEALPIX'),
        card('ORDERING', 'NESTED' if nest else 'RING'),
        card('NSIDE', nside), card('FIRSTPIX', 0),
        card('LASTPIX', npix - 1), card('INDXSCHM', 'IMPLICIT')])
    data = hmap.astype('>f8').tobytes()
    pad = b'\x00' * ((-len(data)) % 2880)
    if str(path).lower().endswith('.gz'):
        import gzip
        opener = lambda p: gzip.open(p, 'wb')  # mirror the reader's opener
    else:
        opener = lambda p: open(p, 'wb')
    with opener(path) as fh:
        fh.write(primary + header + data + pad)

_COSMO_KEYS = ('Omega_m', 'sigma8', 'h', 'Omega_b', 'n_s', 'w0')


def _validate_cosmo(cosmo):
    if cosmo is None:
        return None
    keys = cosmo.keys() if hasattr(cosmo, 'keys') else ()
    if not all(k in keys for k in _COSMO_KEYS):
        raise ValueError("Not all cosmology parameters provided. I need "
                         "Omega_m, sigma8, h, Omega_b, n_s, w0")
    return dict(cosmo)


class HaloLightConeCatalog:
    """Halos on a lightcone: ra, dec [deg], M [Msun], z, plus arbitrary
    per-halo extra columns (reference `utils/io.py:9-140`)."""

    def __init__(self, ra, dec, M, z, cosmo, **arrays):
        t = np.float64
        dtype = ([('M', t), ('z', t), ('ra', t), ('dec', t)]
                 + [(name, t) for name in arrays])
        ra = np.atleast_1d(np.asarray(ra, dtype=t))
        dec = np.atleast_1d(np.asarray(dec, dtype=t))
        cat = np.zeros(len(ra), dtype)

        if np.any(np.abs(dec) == 90):
            warnings.warn("Some halos found with declination exactly at the "
                          "poles. Offsetting these by 4e-5 arcsec")
            dec = np.clip(dec, -90 + 1e-8, 90 - 1e-8)

        cat['ra'] = ra
        cat['dec'] = dec
        cat['z'] = z
        cat['M'] = M
        for name, arr in arrays.items():
            cat[name] = arr

        self.cat = cat
        self.cosmo = _validate_cosmo(cosmo)

    @property
    def data(self):
        return self.cat

    @property
    def cosmology(self):
        return self.cosmo

    def __len__(self):
        return self.cat.size

    def __getitem__(self, key):
        other = {k: self.cat[k][key] for k in self.cat.dtype.names
                 if k not in ('ra', 'dec', 'M', 'z')}
        return HaloLightConeCatalog(ra=self.cat['ra'][key],
                                    dec=self.cat['dec'][key],
                                    M=self.cat['M'][key],
                                    z=self.cat['z'][key],
                                    cosmo=self.cosmo, **other)

    def __str__(self):
        return (f"HaloLightConeCatalog with {self.cat.size} Halos at "
                f"{self.cat['z'].min()} < z < {self.cat['z'].max()}.")


class HaloNDCatalog:
    """Halos at Cartesian x, y (, z) [comoving Mpc] at one redshift
    (reference `utils/io.py:143-287`). Extra columns may be multi-dim."""

    def __init__(self, x, y, M, redshift, cosmo, z=None, **arrays):
        t = np.float64
        dtype = [('M', t), ('x', t), ('y', t), ('z', t)]
        for name, arr in arrays.items():
            arr = np.asarray(arr)
            if arr.ndim > 1:
                dtype.append((name, t, arr.shape[1:]))
            else:
                dtype.append((name, t))

        x = np.atleast_1d(np.asarray(x, dtype=t))
        cat = np.zeros(len(x), dtype)
        cat['x'] = x
        cat['y'] = y
        cat['z'] = z if z is not None else np.nan
        cat['M'] = M
        for name, arr in arrays.items():
            cat[name] = arr

        self.cat = cat
        self.redshift = redshift
        self.is2D = z is None
        self.cosmo = _validate_cosmo(cosmo)

    @property
    def data(self):
        return self.cat

    @property
    def cosmology(self):
        return self.cosmo

    def __len__(self):
        return self.cat.size

    def __getitem__(self, key):
        other = {k: self.cat[k][key] for k in self.cat.dtype.names
                 if k not in ('x', 'y', 'M', 'z')}
        z = None if self.is2D else self.cat['z'][key]
        return HaloNDCatalog(x=self.cat['x'][key], y=self.cat['y'][key],
                             M=self.cat['M'][key], redshift=self.redshift,
                             cosmo=self.cosmo, z=z, **other)


class LightconeShell:
    """A full-sky HEALPix map (RING) of mass (or any field) plus a cosmology
    dict (reference `utils/io.py:290-375`)."""

    def __init__(self, map=None, path=None, cosmo=None):
        if map is None and path is None:
            raise ValueError("Need either map or path as input")
        if path is not None:
            if str(path).lower().endswith(('.fits', '.fits.gz')):
                map = read_healpix_fits(path)
            else:
                map = np.load(path)
        self.map = np.asarray(map)

        npix = self.map.size
        nside = int(round(np.sqrt(npix / 12)))
        if 12 * nside * nside != npix:
            raise ValueError(f"Map size {npix} is not a valid HEALPix size")
        self.NSIDE = nside
        self.cosmo = _validate_cosmo(cosmo)

    @property
    def data(self):
        return self.map

    @property
    def cosmology(self):
        return self.cosmo


class GriddedMap:
    """2D or 3D square/cubic grid with physical-Mpc ``bins`` (reference
    `utils/io.py:378-487`).

    Unlike the reference we do NOT precompute the full meshgrid / index
    cube (`io.py:456-463`) — the runner kernels compute coordinates on the
    fly on device, which avoids holding O(Npix^3) host arrays. ``grid``
    and ``inds`` are provided as lazy properties for API compatibility.
    """

    def __init__(self, map=None, redshift=None, bins=None, cosmo=None):
        self.map = np.asarray(map)
        self.redshift = redshift
        self.Npix = self.map.shape[0]
        self.bins = np.asarray(bins)
        self.res = float(self.bins[1] - self.bins[0])
        self.is2D = self.map.ndim == 2
        if self.is2D:
            assert self.map.shape[0] == self.map.shape[1], \
                "Maps have to be square"
        else:
            assert (self.map.shape[0] == self.map.shape[1]
                    == self.map.shape[2]), "Maps have to be cubic"
        self.cosmo = _validate_cosmo(cosmo)

    @property
    def grid(self):
        """Full coordinate meshgrid (lazy; reference `io.py:456-463`)."""
        n = self.map.ndim
        return np.meshgrid(*([self.bins] * n), indexing='xy')

    @property
    def inds(self):
        """Flattened index cube (lazy; reference `io.py:463`)."""
        return np.arange(self.map.size).reshape(self.map.shape)

    @property
    def data(self):
        return self.map

    @property
    def cosmology(self):
        return self.cosmo


class ParticleSnapshot:
    """Raw particle snapshot: x, y (, z) [comoving Mpc] and mass M in a
    periodic box of size L (reference `utils/io.py:490-670`)."""

    def __init__(self, x=None, y=None, z=None, M=None, L=None, redshift=None,
                 cosmo=None):
        t = np.float64
        is2D = z is None
        dtype = [('M', t), ('x', t), ('y', t), ('z', t)]
        x = np.atleast_1d(np.asarray(x, dtype=t))
        cat = np.zeros(len(x), dtype)
        cat['x'] = x
        cat['y'] = y
        cat['z'] = z if z is not None else np.nan
        cat['M'] = M if M is not None else np.nan

        self.L = L
        self.cat = cat
        self.redshift = redshift
        self.is2D = is2D
        self.cosmo = _validate_cosmo(cosmo)

    @property
    def data(self):
        return self.cat

    @property
    def cosmology(self):
        return self.cosmo

    def __len__(self):
        return self.cat.size

    def make_map(self, N_grid):
        """Bin particles into a mass grid (np.histogramdd;
        reference `utils/io.py:622-670`)."""
        assert np.isnan(self.cat['M']).sum() == 0, (
            "If you want to make a map, provide a value for the particle "
            "mass")
        coords = ['x', 'y'] if self.is2D else ['x', 'y', 'z']
        sample = np.stack([self.cat[c] for c in coords], axis=-1)
        bins = [np.linspace(0, self.L, N_grid + 1)] * len(coords)
        H, _ = np.histogramdd(sample, bins=bins, weights=self.cat['M'])
        return H
