"""Numerics kernels: FFTLog, interpolation, integration, HEALPix, scatter."""

from . import fftlog
from . import interp
from . import integrate
