from . import fftlog, interp, healpix, scatter, spectra
from . import scatter_pallas

__all__ = ["fftlog", "interp", "healpix", "scatter",
           "scatter_pallas", "spectra"]
