from . import fftlog, integrate, interp, healpix, scatter, spectra
from . import scatter_pallas

__all__ = ["fftlog", "integrate", "interp", "healpix", "scatter",
           "scatter_pallas", "spectra"]
