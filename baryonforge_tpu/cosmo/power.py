"""Linear matter power spectrum, sigma(M), and correlation function in JAX.

Replaces the CCL calls the reference makes: ``ccl.sigmaM`` (Schneider19.py:383),
``ccl.correlation_3d`` (Schneider19.py:378), ``cosmo.compute_sigma``.

Transfer functions implemented analytically:
  * Eisenstein & Hu 1998 with baryon acoustic features (default)
  * Eisenstein & Hu 1998 "no-wiggle"
  * BBKS

The reference uses CAMB via CCL; an analytic transfer cannot match CAMB at
the 0.1% level, so (mirroring the reference's own ``xi_mm`` injection hook,
Base.py:103) all consumers accept user-tabulated P(k)/xi(r) overrides.
Normalization is always via sigma8.
"""

from functools import partial
import jax
import jax.numpy as jnp
import numpy as np

from . import core
from ..utils import constants as const
from ..ops.fftlog import xi_from_pk

__all__ = ["transfer_eh98", "transfer_eh98_nowiggle", "transfer_bbks",
           "linear_power", "sigmaR", "sigmaM", "sigma8_norm",
           "correlation_3d", "lagrangian_radius", "pk_grid",
           "dlnP_dlnk"]

# Fixed wavenumber grid used for normalization integrals and FFTLog (1/Mpc)
K_GRID = jnp.asarray(np.geomspace(1e-5, 1e3, 1024))


# ---------------------------------------------------------------------------
# Transfer functions
# ---------------------------------------------------------------------------
def _eh98_params(cosmo):
    om, ob, h = cosmo.Omega_m, cosmo.Omega_b, cosmo.h
    oc = om - ob
    omh2, obh2 = om * h * h, ob * h * h
    theta = cosmo.T_CMB / 2.7

    z_eq = 2.50e4 * omh2 * theta ** -4
    k_eq = 7.46e-2 * omh2 * theta ** -2                       # 1/Mpc

    b1 = 0.313 * omh2 ** -0.419 * (1.0 + 0.607 * omh2 ** 0.674)
    b2 = 0.238 * omh2 ** 0.223
    z_d = 1291.0 * omh2 ** 0.251 / (1.0 + 0.659 * omh2 ** 0.828) \
        * (1.0 + b1 * obh2 ** b2)

    R_d = 31.5 * obh2 * theta ** -4 * (1000.0 / z_d)
    R_eq = 31.5 * obh2 * theta ** -4 * (1000.0 / z_eq)
    s = 2.0 / (3.0 * k_eq) * jnp.sqrt(6.0 / R_eq) * jnp.log(
        (jnp.sqrt(1.0 + R_d) + jnp.sqrt(R_d + R_eq)) / (1.0 + jnp.sqrt(R_eq)))

    k_silk = 1.6 * obh2 ** 0.52 * omh2 ** 0.73 \
        * (1.0 + (10.4 * omh2) ** -0.95)

    a1 = (46.9 * omh2) ** 0.670 * (1.0 + (32.1 * omh2) ** -0.532)
    a2 = (12.0 * omh2) ** 0.424 * (1.0 + (45.0 * omh2) ** -0.582)
    alpha_c = a1 ** (-ob / om) * a2 ** (-(ob / om) ** 3)

    bb1 = 0.944 / (1.0 + (458.0 * omh2) ** -0.708)
    bb2 = (0.395 * omh2) ** -0.0266
    beta_c = 1.0 / (1.0 + bb1 * ((oc / om) ** bb2 - 1.0))

    y = (1.0 + z_eq) / (1.0 + z_d)
    sq = jnp.sqrt(1.0 + y)
    Gy = y * (-6.0 * sq + (2.0 + 3.0 * y) * jnp.log((sq + 1.0) / (sq - 1.0)))
    alpha_b = 2.07 * k_eq * s * (1.0 + R_d) ** -0.75 * Gy
    beta_b = 0.5 + ob / om + (3.0 - 2.0 * ob / om) \
        * jnp.sqrt((17.2 * omh2) ** 2 + 1.0)
    beta_node = 8.41 * omh2 ** 0.435
    return dict(k_eq=k_eq, s=s, k_silk=k_silk, alpha_c=alpha_c,
                beta_c=beta_c, alpha_b=alpha_b, beta_b=beta_b,
                beta_node=beta_node, ob_om=ob / om, oc_om=oc / om)


def _T0_tilde(q, alpha, beta):
    C = 14.2 / alpha + 386.0 / (1.0 + 69.9 * q ** 1.08)
    L = jnp.log(jnp.e + 1.8 * beta * q)
    return L / (L + C * q * q)


def transfer_eh98(cosmo, k):
    """EH98 transfer with BAO features; k in 1/Mpc (not h/Mpc)."""
    p = _eh98_params(cosmo)
    q = k / (13.41 * p["k_eq"])
    ks = k * p["s"]

    f = 1.0 / (1.0 + (ks / 5.4) ** 4)
    Tc = f * _T0_tilde(q, 1.0, p["beta_c"]) \
        + (1.0 - f) * _T0_tilde(q, p["alpha_c"], p["beta_c"])

    s_tilde = p["s"] / (1.0 + (p["beta_node"] / ks) ** 3) ** (1.0 / 3.0)
    x = k * s_tilde
    j0 = jnp.sinc(x / jnp.pi)      # sin(x)/x
    Tb = (_T0_tilde(q, 1.0, 1.0) / (1.0 + (ks / 5.2) ** 2)
          + p["alpha_b"] / (1.0 + (p["beta_b"] / ks) ** 3)
          * jnp.exp(-(k / p["k_silk"]) ** 1.4)) * j0
    return p["ob_om"] * Tb + p["oc_om"] * Tc


def transfer_eh98_nowiggle(cosmo, k):
    """EH98 zero-baryon ('no-wiggle') shape; k in 1/Mpc."""
    p = _eh98_params(cosmo)
    om, ob, h = cosmo.Omega_m, cosmo.Omega_b, cosmo.h
    theta = cosmo.T_CMB / 2.7
    alpha_g = 1.0 - 0.328 * jnp.log(431.0 * om * h * h) * ob / om \
        + 0.38 * jnp.log(22.3 * om * h * h) * (ob / om) ** 2
    gamma_eff = om * h * (alpha_g + (1.0 - alpha_g)
                          / (1.0 + (0.43 * k * p["s"]) ** 4))
    q = k * theta ** 2 / (gamma_eff * h)
    L = jnp.log(2.0 * jnp.e + 1.8 * q)
    C = 14.2 + 731.0 / (1.0 + 62.5 * q)
    return L / (L + C * q * q)


def transfer_bbks(cosmo, k):
    """BBKS 1986 transfer with the Sugiyama baryon correction; k in 1/Mpc."""
    h = cosmo.h
    gamma = cosmo.Omega_m * h * jnp.exp(
        -cosmo.Omega_b * (1.0 + jnp.sqrt(2.0 * h) / cosmo.Omega_m))
    q = k / (gamma * h)
    return (jnp.log(1.0 + 2.34 * q) / (2.34 * q)
            * (1.0 + 3.89 * q + (16.1 * q) ** 2
               + (5.46 * q) ** 3 + (6.71 * q) ** 4) ** -0.25)


_TRANSFERS = {
    "eisenstein_hu": transfer_eh98,
    "eisenstein_hu_nowiggles": transfer_eh98_nowiggle,
    "bbks": transfer_bbks,
}


# ---------------------------------------------------------------------------
# P(k), sigma(R), sigma(M)
# ---------------------------------------------------------------------------
def _tophat_w(x):
    # 3 (sin x - x cos x)/x^3, series-safe at small x
    x = jnp.asarray(x)
    small = x < 1e-3
    xs = jnp.where(small, 1.0, x)
    w = 3.0 * (jnp.sin(xs) - xs * jnp.cos(xs)) / xs ** 3
    return jnp.where(small, 1.0 - x * x / 10.0, w)


@partial(jax.jit, static_argnames=("transfer",))
def _sigma2_unnorm(cosmo, R, transfer):
    """Unnormalized sigma^2(R) at a=1 using P ~ k^ns T^2."""
    k = K_GRID
    T = _TRANSFERS[transfer](cosmo, k)
    pk = k ** cosmo.n_s * T * T
    R = jnp.atleast_1d(R)[..., None]
    integrand = k ** 3 * pk * _tophat_w(k * R) ** 2
    return jnp.trapezoid(integrand, jnp.log(k), axis=-1) / (2.0 * jnp.pi ** 2)


def sigma8_norm(cosmo, transfer="eisenstein_hu"):
    """Amplitude A such that P(k) = A k^ns T^2 gives sigma(8/h) = sigma8."""
    s2 = _sigma2_unnorm(cosmo, jnp.array([8.0 / cosmo.h]), transfer)[0]
    return cosmo.sigma8 ** 2 / s2


@partial(jax.jit, static_argnames=("transfer",))
def linear_power(cosmo, k, a=1.0, transfer="eisenstein_hu"):
    """Linear matter power P(k, a) in Mpc^3 (k in 1/Mpc)."""
    A = sigma8_norm(cosmo, transfer)
    T = _TRANSFERS[transfer](cosmo, k)
    D = core.growth_factor(cosmo, a)
    return A * k ** cosmo.n_s * T * T * jnp.squeeze(D) ** 2


def pk_grid(cosmo, a=1.0, transfer="eisenstein_hu"):
    """(k, P(k, a)) on the module's fixed log grid."""
    return K_GRID, linear_power(cosmo, K_GRID, a, transfer)


def dlnP_dlnk(cosmo, k, transfer="eisenstein_hu"):
    """Logarithmic slope of the z=0 linear power at k (1/Mpc)."""
    eps = 1e-3
    lp = jnp.log(linear_power(cosmo, k * jnp.exp(eps), 1.0, transfer))
    lm = jnp.log(linear_power(cosmo, k * jnp.exp(-eps), 1.0, transfer))
    return (lp - lm) / (2.0 * eps)


@partial(jax.jit, static_argnames=("transfer",))
def sigmaR(cosmo, R, a=1.0, transfer="eisenstein_hu"):
    """RMS linear fluctuation in comoving tophat of radius R (Mpc).
    Mirrors the scalar/array rank of R."""
    A = sigma8_norm(cosmo, transfer)
    D = core.growth_factor(cosmo, jnp.asarray(a))
    out = jnp.sqrt(A * _sigma2_unnorm(cosmo, R, transfer)) * D
    return out[0] if jnp.ndim(R) == 0 else out


def lagrangian_radius(cosmo, M):
    """R_L = (3M / 4 pi rho_m0)^(1/3), comoving Mpc."""
    rho_m0 = cosmo.Omega_m * const.RHO_CRIT_0_h2 * cosmo.h ** 2
    return (3.0 * jnp.asarray(M) / (4.0 * jnp.pi * rho_m0)) ** (1.0 / 3.0)


def sigmaM(cosmo, M, a=1.0, transfer="eisenstein_hu"):
    """sigma(M, a) on the Lagrangian scale of mass M (ccl.sigmaM analog)."""
    return sigmaR(cosmo, lagrangian_radius(cosmo, M), a, transfer)


@partial(jax.jit, static_argnames=("transfer",))
def correlation_3d(cosmo, r, a=1.0, transfer="eisenstein_hu"):
    """Linear matter correlation xi(r, a) via FFTLog (ccl.correlation_3d)."""
    k, pk = pk_grid(cosmo, a, transfer)
    return xi_from_pk(k, pk, jnp.atleast_1d(r))
