"""Pixel-window convolution of profiles (reference utils/Pixel.py analog).

``ConvolvedProfile`` wraps any profile and convolves it with an isotropic
pixel window via an FFTLog round trip on the natural reciprocal grids
(ops/fftlog.convolve_profile — exact identity for a unit window, which the
reference only achieves to ~1e-3). Below pixel_size/5 the output is clamped
to suppress small-scale ringing, mirroring the reference (Pixel.py:169).

Windows:
  * GridPixelApprox — square pixel ≈ circular tophat, B = 3 j1(kr)/(kr)
    with volume/area-equivalent radius (Pixel.py:272-450)
  * HealPixel — HEALPix pixel ≈ Gaussian harmonic beam
    exp(-k(k+1) sigma^2/2), sigma = resol/sqrt(8 ln2)/sqrt(2); real-space
    use intentionally poisoned with zeros (Pixel.py:454-583)
  * NoPix — unity window (Pixel.py:586-625)
"""

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import fftlog as _fftlog
from ..ops import healpix as _hpx
from ..ops.interp import pchip_interp
from ..cosmo import core as _core
from .Tabulate import _set_parameter

__all__ = ["ConvolvedProfile", "GridPixelApprox", "HealPixel", "NoPix"]


class GridPixelApprox:
    """Square grid pixel approximated as a circular tophat."""

    isHarmonic = False

    def __init__(self, size):
        self.size = size

    def beam(self, k, R):
        # 3 j1(x)/x with x = k * 2R (diameter convention, ref. Pixel.py)
        x = jnp.asarray(k) * (2.0 * R)
        x_safe = jnp.where(x > 0, x, 1.0)
        j1_over = (jnp.sin(x_safe) / x_safe ** 2
                   - jnp.cos(x_safe) / x_safe)   # spherical j1(x)
        return jnp.where(x > 0, 3.0 * j1_over / x_safe, 1.0)

    def real(self, k):
        R = np.cbrt(self.size ** 3 / (4.0 / 3.0 * np.pi))
        return self.beam(k, R)

    def projected(self, k):
        R = np.sqrt(self.size ** 2 / np.pi)
        return self.beam(k, R)


class HealPixel:
    """HEALPix pixel as a Gaussian harmonic beam. ``real`` returns zeros on
    purpose: real-space use of an angular pixel is meaningless, and zeros
    propagate loudly (reference behavior)."""

    isHarmonic = True

    def __init__(self, NSIDE):
        self.NSIDE = NSIDE
        self.size = float(np.sqrt(_hpx.nside2pixarea(NSIDE)))

    def real(self, k):
        return jnp.zeros_like(jnp.asarray(k))

    def projected(self, k):
        sig = self.size / np.sqrt(8 * np.log(2)) / np.sqrt(2)
        k = jnp.asarray(k)
        return jnp.exp(-k * (1 + k) / 2 * sig ** 2)


class NoPix:
    """Unity window (testing)."""

    isHarmonic = False
    size = 0.0

    def real(self, k):
        return jnp.ones_like(jnp.asarray(k))

    def projected(self, k):
        return jnp.ones_like(jnp.asarray(k))


class ConvolvedProfile:
    """profile (*) pixel window, drop-in profile wrapper
    (reference Pixel.py:12-267). Unknown attributes delegate to the wrapped
    profile."""

    def __init__(self, Profile, Pixel):
        self.Profile = Profile
        self.Pixel = Pixel
        self.isHarmonic = Pixel.isHarmonic
        self.p_keys = list(vars(Profile).get("p_keys", []))

    def __getattr__(self, name):
        try:
            return super().__getattribute__(name)
        except AttributeError:
            return getattr(self.Profile, name)

    def __getstate__(self):
        return self.__dict__.copy()

    def __setstate__(self, state):
        self.__dict__.update(state)

    def set_parameter(self, key, value):
        _set_parameter(self, key, value)

    def __str_prf__(self):
        return (f"Convolution[{self.Profile.__str_prf__()}, "
                f"{self.Pixel.__class__.__name__}]")

    def __repr__(self):
        return self.__str_prf__()

    # ------------------------------------------------------------------
    def _fft_grid(self, r):
        p = getattr(self.Profile, "precision_fftlog",
                    dict(padding_lo_fftlog=1e-2, padding_hi_fftlog=1e2,
                         n_per_decade=64, plaw_fourier=-2.0))
        r = np.atleast_1d(np.asarray(r, dtype=float))
        r_min = min(float(r.min()) * p["padding_lo_fftlog"], 1e-8)
        r_max = max(float(r.max()) * p["padding_hi_fftlog"], 1e3)
        n = int(p["n_per_decade"] * np.int32(np.log10(r_max / r_min)))
        n = int(2 ** np.ceil(np.log2(max(n, 64))))
        return np.geomspace(r_min, r_max, n), p["plaw_fourier"]

    def real(self, cosmo, r, M, a, **kw):
        r_fft, plaw = self._fft_grid(r)
        prof = self.Profile.real(cosmo, r_fft, M, a, **kw)
        prof = jnp.atleast_2d(prof)
        r_j = jnp.asarray(r_fft)

        conv = jax.vmap(lambda row: _fftlog.convolve_profile(
            r_j, row, self.Pixel.real, dim=3, plaw=plaw))(prof)

        r_eval = jnp.clip(jnp.atleast_1d(jnp.asarray(r)),
                          self.Pixel.size / 5, None)
        out = jax.vmap(lambda row: pchip_interp(
            jnp.log(r_j), row, jnp.log(r_eval), extrapolate=False))(conv)
        out = jnp.where(jnp.isnan(out), 0.0, out)
        if jnp.ndim(r) == 0:
            out = jnp.squeeze(out, axis=-1)
        if jnp.ndim(M) == 0:
            out = jnp.squeeze(out, axis=0)
        return out

    def projected(self, cosmo, r, M, a, **kw):
        if self.isHarmonic:
            # angular pixel: work in angle theta = r / D_A
            D_A = _core.comoving_radial_distance(cosmo, a)[0]
        r_fft, plaw = self._fft_grid(r)
        prof = self.Profile.projected(cosmo, r_fft, M, a, **kw)
        prof = jnp.atleast_2d(prof)
        x_j = jnp.asarray(r_fft) / (D_A if self.isHarmonic else 1.0)

        conv = jax.vmap(lambda row: _fftlog.convolve_profile(
            x_j, row, self.Pixel.projected, dim=2, plaw=plaw))(prof)

        clip_lo = self.Pixel.size / 5 * (D_A if self.isHarmonic else 1.0)
        r_eval = jnp.clip(jnp.atleast_1d(jnp.asarray(r)), clip_lo, None)
        x_eval = r_eval / (D_A if self.isHarmonic else 1.0)
        out = jax.vmap(lambda row: pchip_interp(
            jnp.log(x_j), row, jnp.log(x_eval), extrapolate=False))(conv)
        out = jnp.where(jnp.isnan(out), 0.0, out)
        if jnp.ndim(r) == 0:
            out = jnp.squeeze(out, axis=-1)
        if jnp.ndim(M) == 0:
            out = jnp.squeeze(out, axis=0)
        return out

    def fourier(self, cosmo, k, M, a, **kw):
        return self.Profile.fourier(cosmo, k, M, a, **kw) \
            * self.Pixel.real(jnp.asarray(k))
