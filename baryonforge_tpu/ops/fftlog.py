"""FFTLog: fast Hankel / spherical-Bessel transforms on log-uniform grids.

TPU-native replacement for the FFTLog machinery the reference delegates to CCL
(``ccl.halos.profiles.HaloProfile._fftlog_wrap``; see reference Base.py:126-130
for how profiles tune ``plaw_fourier`` and paddings). Used for:

  * ``Profile.fourier``  : rho(k) = 4 pi int r^2 rho(r) j0(kr) dr
  * xi_mm from P(k)      : xi(r) = 1/(2 pi^2) int k^2 P(k) j0(kr) dk
  * pixel-window convolution round trips (utils/Pixel.py analog)

Implementation follows Hamilton (2000): decompose a(x) ~ sum_m c_m x^{q+i w_m}
on a periodic log grid and use the analytic Mellin pair
int_0^inf x^s J_mu(k x) dx = k^-(s+1) 2^s Gamma((mu+1+s)/2)/Gamma((mu+1-s)/2).

Everything is jit-friendly: static shapes, no data-dependent control flow.
"""

import jax
import jax.numpy as jnp
import numpy as np
from functools import partial

__all__ = ["loggamma", "fht", "sph_fourier_3d", "sph_inverse_3d",
           "proj_fourier_2d", "proj_inverse_2d", "xi_from_pk",
           "convolve_profile"]


# ---------------------------------------------------------------------------
# Complex log-gamma (Lanczos approximation, g=7, n=9) — JAX lacks complex
# gammaln. Accuracy ~1e-13 relative over the domain used here.
# ---------------------------------------------------------------------------
_LANCZOS_G = 7.0
_LANCZOS_COEF = np.array([
    0.99999999999980993,
    676.5203681218851,
    -1259.1392167224028,
    771.32342877765313,
    -176.61502916214059,
    12.507343278686905,
    -0.13857109526572012,
    9.9843695780195716e-6,
    1.5056327351493116e-7,
])


def _loggamma_positive(z):
    """log Gamma(z) for Re(z) > 0.5 via Lanczos."""
    z = z - 1.0
    x = jnp.full(z.shape, _LANCZOS_COEF[0], dtype=z.dtype)
    for i in range(1, 9):
        x = x + _LANCZOS_COEF[i] / (z + i)
    t = z + _LANCZOS_G + 0.5
    return 0.5 * jnp.log(2.0 * jnp.pi) + (z + 0.5) * jnp.log(t) - t + jnp.log(x)


def loggamma(z):
    """Principal-branch log Gamma for complex z (vectorized, jit-safe).

    Uses reflection for Re(z) < 0.5. Not valid exactly at non-positive
    integers (poles), which never occur for FFTLog kernel arguments.
    """
    z = jnp.asarray(z, dtype=jnp.complex128)
    reflect = jnp.real(z) < 0.5
    z_safe = jnp.where(reflect, 1.0 - z, z)
    lg = _loggamma_positive(z_safe)
    # log Gamma(z) = log(pi / sin(pi z)) - log Gamma(1 - z)
    refl_val = jnp.log(jnp.pi) - jnp.log(jnp.sin(jnp.pi * z)) - lg
    return jnp.where(reflect, refl_val, lg)


# ---------------------------------------------------------------------------
# Core discrete Hankel transform on a log grid
# ---------------------------------------------------------------------------
def _u_coefficients(N, dln, mu, q, k0x0):
    """Kernel coefficients d-multiplier: U_mu(q + i w_m) (k0 x0)^(-i w_m)."""
    m = jnp.fft.fftfreq(N) * N                      # signed integer freqs
    omega = 2.0 * jnp.pi * m / (N * dln)
    s = q + 1j * omega
    U = jnp.exp(s * jnp.log(2.0)
                + loggamma((mu + 1.0 + s) / 2.0)
                - loggamma((mu + 1.0 - s) / 2.0))
    return U * jnp.exp(-1j * omega * jnp.log(k0x0))


def _safe_q(mu, q, eps=1e-4):
    """Nudge the bias q off Gamma poles of U_mu ((mu+1+q)/2 = 0, -1, ...).

    The reference dodges the same pole by hand (plaw_fourier = -3 + 1e-4,
    Arico20.py:378-379); we automate it.
    """
    arg = (mu + 1.0 + q) / 2.0
    if arg <= 1e-8 and abs(arg - round(arg)) < eps:
        return q + eps
    return q


def fht(x, a, mu, q=0.0, kcrc=1.0):
    """Discrete Hankel transform  ã(k) = ∫ a(x) J_mu(k x) k dx.

    ``x`` must be log-uniform and increasing (static shape N). Returns
    (k, ã(k)) with k log-uniform, k_c x_c = kcrc.
    """
    N = x.shape[0]
    q = _safe_q(mu, q)
    dln = jnp.log(x[1] / x[0])
    x0 = x[0]
    k0 = kcrc / x[-1]
    j = jnp.arange(N)
    k = k0 * jnp.exp(j * dln)

    b = a * (x / x0) ** (-q)
    c = jnp.fft.fft(b.astype(jnp.complex128)) / N
    d = c * _u_coefficients(N, dln, mu, q, k0 * x0)
    out = jnp.fft.fft(d)
    atilde = (k0 * x0) ** (-q) * jnp.exp(-q * j * dln) * jnp.real(out)
    return k, atilde


def _log_resample(x_src, y_src, x_query):
    """Linear interpolation in log-x (values linear), zero outside."""
    lx = jnp.log(x_src)
    lq = jnp.log(x_query)
    y = jnp.interp(lq, lx, y_src, left=0.0, right=0.0)
    return y


def _padded_grid(r, pad_lo, pad_hi, n_per_decade):
    """Build a static padded log grid covering [r0*pad_lo, r1*pad_hi].

    Host-side helper (numpy): shapes must be static, so call with concrete
    pad factors. Returns the padded grid as a numpy array.
    """
    r0 = float(r[0]) * pad_lo
    r1 = float(r[-1]) * pad_hi
    n = int(np.ceil(np.log10(r1 / r0) * n_per_decade))
    # power-of-two-ish size for FFT efficiency
    n = int(2 ** np.ceil(np.log2(max(n, 32))))
    return np.geomspace(r0, r1, n)


# ---------------------------------------------------------------------------
# Physics-facing wrappers
# ---------------------------------------------------------------------------
def sph_fourier_3d(r, f, k_out, plaw=-2.0):
    """3D spherical Fourier transform F(k) = 4 pi ∫ r^2 f(r) j0(kr) dr.

    ``r`` log-uniform (static); result interpolated onto ``k_out``.
    ``plaw`` is the assumed power-law slope of f for de-biasing (the
    reference's ``plaw_fourier``; Base.py:126).
    """
    a = f * r ** 1.5
    q = 1.5 + plaw          # bias that flattens a(r) * r^{-q}
    k, at = fht(r, a, mu=0.5, q=q)
    F = (2.0 * jnp.pi) ** 1.5 * at / k ** 1.5
    return _log_resample(k, F, k_out)


def sph_inverse_3d(k, F, r_out, plaw=-2.0):
    """Inverse: f(r) = 1/(2 pi^2) ∫ k^2 F(k) j0(kr) dk."""
    return sph_fourier_3d(k, F, r_out, plaw=plaw) / (2.0 * jnp.pi) ** 3


def proj_fourier_2d(R, f, k_out, plaw=-2.0):
    """2D transform F(k) = 2 pi ∫ R f(R) J0(kR) dR (for projected profiles)."""
    a = f * R
    q = 1.5 + plaw        # empirically best bias; 1.0+plaw hits a Gamma pole
    k, at = fht(R, a, mu=0.0, q=q)
    F = 2.0 * jnp.pi * at / k
    return _log_resample(k, F, k_out)


def proj_inverse_2d(k, F, R_out, plaw=-2.0):
    """Inverse 2D: f(R) = 1/(2 pi)^2 * [2 pi ∫ k F(k) J0(kR) dk]."""
    return proj_fourier_2d(k, F, R_out, plaw=plaw) / (2.0 * jnp.pi) ** 2


def xi_from_pk(k, pk, r_out):
    """Matter correlation xi(r) = 1/(2 pi^2) ∫ k^2 P(k) j0(kr) dk."""
    return sph_inverse_3d(k, pk, r_out, plaw=-2.0)


def convolve_profile(r, f, window_fn, dim=3, plaw=-2.0):
    """Convolve a radial profile with an isotropic window W(k).

    Computes  FT^-1[ FT[f](k) * W(k) ]  with both transforms on the natural
    reciprocal log grids and opposite bias signs, so a unit window round
    trip is exact to floating-point (the identity-window property the
    reference's ConvolvedProfile is tested on, text_pixel_conv.py:13-26).

    ``r`` must be log-uniform; result is evaluated on the same ``r``.
    ``window_fn`` maps k -> W(k) (evaluated on the internal grid).
    dim=3: F = 4 pi ∫ r^2 f j0(kr) dr;  dim=2: F = 2 pi ∫ R f J0(kR) dR.
    """
    if dim == 3:
        mu, p = 0.5, 1.5
        fwd_const, inv_const = (2.0 * jnp.pi) ** 1.5, (2.0 * jnp.pi) ** -1.5
    else:
        mu, p = 0.0, 1.0
        fwd_const, inv_const = 2.0 * jnp.pi, (2.0 * jnp.pi) ** -1
    q = 1.5 + plaw        # bias; for dim=2, 1.0+plaw would hit a Gamma pole
    k, at = fht(r, f * r ** p, mu=mu, q=q)
    F = fwd_const * at / k ** p
    F = F * window_fn(k)
    x, bt = fht(k, F * k ** p, mu=mu, q=-q)
    return inv_const * bt / x ** p
