from . import fftlog, integrate, interp

__all__ = ["fftlog", "integrate", "interp"]
