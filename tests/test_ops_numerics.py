"""Golden tests of the numerics kernels against scipy/analytic results."""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy import interpolate as sinterp
from scipy import integrate as sintegrate
from scipy import special as sspecial

from baryonforge_tpu.ops import fftlog, interp, integrate


# ---------------------------------------------------------------------------
# complex log-gamma
# ---------------------------------------------------------------------------
def test_loggamma_complex():
    zs = np.array([0.3 + 2j, 1.5 - 3j, 5.0 + 0.1j, -0.2 + 1j, 2.75 + 0j])
    ours = np.asarray(fftlog.loggamma(zs))
    ref = sspecial.loggamma(zs)
    np.testing.assert_allclose(ours, ref, rtol=1e-10, atol=1e-10)


# ---------------------------------------------------------------------------
# FFTLog: Gaussian pair is analytic
# ---------------------------------------------------------------------------
def test_sph_fourier_gaussian():
    # f(r) = exp(-r^2/2)  ->  F(k) = (2 pi)^{3/2} exp(-k^2/2)
    r = jnp.geomspace(1e-4, 1e3, 1024)
    f = jnp.exp(-r ** 2 / 2.0)
    k_out = jnp.geomspace(1e-2, 10.0, 64)
    F = np.asarray(fftlog.sph_fourier_3d(r, f, k_out, plaw=-2.0))
    expected = (2 * np.pi) ** 1.5 * np.exp(-np.asarray(k_out) ** 2 / 2)
    # atol set by the FFTLog ringing floor (~1e-7 of the peak value)
    np.testing.assert_allclose(F, expected, rtol=2e-3, atol=1e-5)


def test_convolve_identity_roundtrip():
    # unit window round trip must reproduce the profile to fp precision
    r = jnp.geomspace(1e-4, 1e3, 1024)
    f = 1.0 / ((r / 0.3) * (1 + r / 0.3) ** 2) * jnp.exp(-(r / 50.0) ** 2)
    # scope to where the profile is non-negligible; beyond that FFTLog
    # ringing dominates (the reference zeroes/warns in the same regime)
    sel = ((np.asarray(r) > 1e-3) & (np.asarray(r) < 100.0)
           & (np.asarray(f) > 1e-6 * float(np.max(np.asarray(f)))))
    for dim in (2, 3):
        back = np.asarray(fftlog.convolve_profile(
            r, f, lambda k: jnp.ones_like(k), dim=dim))
        # reference demands rtol 1e-3 on its identity-window test
        # (text_pixel_conv.py:13-26)
        np.testing.assert_allclose(back[sel], np.asarray(f)[sel], rtol=1e-3)


def test_convolve_gaussian_window():
    # Gaussian profile (*) Gaussian window is analytic:
    # exp(-r^2/(2 s1^2)) (*) W=exp(-k^2 s2^2 / 2) -> Gaussian of s^2=s1^2+s2^2
    s1, s2 = 1.0, 0.5
    r = jnp.geomspace(1e-4, 1e3, 2048)
    f = jnp.exp(-r ** 2 / (2 * s1 ** 2))
    out = np.asarray(fftlog.convolve_profile(
        r, f, lambda k: jnp.exp(-k ** 2 * s2 ** 2 / 2.0), dim=3))
    s_tot = np.sqrt(s1 ** 2 + s2 ** 2)
    expected = (s1 / s_tot) ** 3 * np.exp(-np.asarray(r) ** 2 / (2 * s_tot ** 2))
    # below ~window_scale/5 the r^-2 FFTLog ringing dominates — same reason
    # the reference clips r at pixel_size/5 (Pixel.py)
    sel = (np.asarray(r) > s2 / 5.0) & (np.asarray(r) < 4.0)
    np.testing.assert_allclose(out[sel], expected[sel], rtol=5e-3)


def test_proj_fourier_gaussian_2d():
    # f(R) = exp(-R^2/2) -> F(k) = 2 pi exp(-k^2/2)
    R = jnp.geomspace(1e-4, 1e3, 1024)
    f = jnp.exp(-R ** 2 / 2.0)
    k_out = jnp.geomspace(1e-2, 2.5, 32)
    F = np.asarray(fftlog.proj_fourier_2d(R, f, k_out, plaw=-2.0))
    expected = 2 * np.pi * np.exp(-np.asarray(k_out) ** 2 / 2)
    # additive ringing floor is ~3e-4 of F(0) = 2pi
    np.testing.assert_allclose(F, expected, rtol=5e-3, atol=3e-3)


# ---------------------------------------------------------------------------
# PCHIP vs scipy
# ---------------------------------------------------------------------------
def test_pchip_matches_scipy():
    rng = np.random.default_rng(0)
    x = np.sort(rng.uniform(0, 10, 40))
    y = np.cumsum(rng.uniform(0, 1, 40))      # monotone data
    xq = np.linspace(-1, 11, 200)             # includes extrapolation
    ours = np.asarray(interp.pchip_interp(jnp.array(x), jnp.array(y), jnp.array(xq)))
    ref = sinterp.PchipInterpolator(x, y, extrapolate=True)(xq)
    np.testing.assert_allclose(ours, ref, rtol=1e-10, atol=1e-10)


def test_pchip_nonmonotone_matches_scipy():
    x = np.linspace(0, 10, 30)
    y = np.sin(x) + 0.3 * x
    xq = np.linspace(0, 10, 111)
    ours = np.asarray(interp.pchip_interp(jnp.array(x), jnp.array(y), jnp.array(xq)))
    ref = sinterp.PchipInterpolator(x, y)(xq)
    np.testing.assert_allclose(ours, ref, rtol=1e-10, atol=1e-12)


def test_masked_pchip():
    x = np.linspace(0, 10, 30)
    y = 2.0 * x + 1.0
    valid = np.ones(30, dtype=bool)
    valid[5:12] = False                        # knock out a chunk
    xq = np.linspace(0.5, 9.5, 50)
    ours = np.asarray(interp.masked_pchip_interp(
        jnp.array(x), jnp.array(y), jnp.array(valid), jnp.array(xq)))
    ref = sinterp.PchipInterpolator(x[valid], y[valid])(xq)
    np.testing.assert_allclose(ours, ref, rtol=1e-10)
    # outside the valid range -> NaN (extrapolate=False semantics)
    out = np.asarray(interp.masked_pchip_interp(
        jnp.array(x), jnp.array(y), jnp.array(valid), jnp.array([20.0])))
    assert np.isnan(out).all()
    # too few valid points -> NaN
    few = np.zeros(30, dtype=bool)
    few[:4] = True
    out = np.asarray(interp.masked_pchip_interp(
        jnp.array(x), jnp.array(y), jnp.array(few), jnp.array(xq)))
    assert np.isnan(out).all()


# ---------------------------------------------------------------------------
# Cubic spline + derivative vs scipy (not-a-knot)
# ---------------------------------------------------------------------------
def test_cubic_spline_matches_scipy():
    x = np.linspace(0, 4 * np.pi, 50)
    y = np.stack([np.sin(x), np.cos(0.5 * x)], axis=0)
    xq = np.linspace(0.1, 4 * np.pi - 0.1, 77)
    d = interp.cubic_spline_coeffs(jnp.array(x), jnp.array(y))
    ours = np.asarray(interp.cubic_spline_eval(jnp.array(x), jnp.array(y), d, jnp.array(xq)))
    ours_der = np.asarray(interp.cubic_spline_derivative_eval(
        jnp.array(x), jnp.array(y), d, jnp.array(xq)))
    ref = sinterp.CubicSpline(x, y, axis=-1)
    np.testing.assert_allclose(ours, ref(xq), rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(ours_der, ref.derivative(1)(xq), rtol=1e-6, atol=1e-8)


# ---------------------------------------------------------------------------
# cumulative Simpson vs scipy
# ---------------------------------------------------------------------------
def test_cumulative_simpson_matches_scipy():
    rng = np.random.default_rng(1)
    y = rng.uniform(0.1, 2.0, (3, 101))
    ours = np.asarray(integrate.cumulative_simpson_uniform(jnp.array(y), dx=0.37))
    ref = sintegrate.cumulative_simpson(y, dx=0.37, initial=0.0, axis=-1)
    np.testing.assert_allclose(ours, ref, rtol=1e-12, atol=1e-12)


# ---------------------------------------------------------------------------
# multilinear grid interpolation vs scipy RGI
# ---------------------------------------------------------------------------
def test_multilinear_matches_scipy():
    rng = np.random.default_rng(2)
    ax = (np.linspace(0, 1, 7), np.linspace(-2, 2, 9), np.geomspace(1, 10, 5))
    vals = rng.normal(size=(7, 9, 5))
    pts = np.stack([rng.uniform(0, 1, 40), rng.uniform(-2, 2, 40),
                    rng.uniform(1, 10, 40)], axis=1)
    pts[0] = [-0.5, 0.0, 2.0]                  # out of bounds -> NaN
    ours = np.asarray(interp.multilinear_interp(
        tuple(jnp.array(a) for a in ax), jnp.array(vals), jnp.array(pts)))
    ref = sinterp.RegularGridInterpolator(ax, vals, bounds_error=False,
                                          fill_value=np.nan)(pts)
    np.testing.assert_allclose(ours, ref, rtol=1e-12, equal_nan=True)
