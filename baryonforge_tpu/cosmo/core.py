"""JAX cosmology core: background expansion, distances, growth.

This replaces the parts of pyccl (layer L0 in SURVEY.md) that the reference
package leans on: ``ccl.Cosmology``, ``angular_diameter_distance``,
``growth_factor``, ``rho_x``. Flat w0-wa CDM with optional radiation.

The :class:`Cosmology` object is a registered pytree of scalars so it can be
passed through jit/vmap; all functions are pure.
"""

from dataclasses import dataclass, field
from functools import partial
import jax
import jax.numpy as jnp
import numpy as np

from ..utils import constants as const

__all__ = ["Cosmology", "Eofa", "hubble_Ha", "rho_crit", "rho_x",
           "comoving_radial_distance", "angular_diameter_distance",
           "growth_factor", "build_cosmodict", "cosmology_from_dict"]


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class Cosmology:
    """Flat w0waCDM cosmology parameter set (reference cosmo-dict analog).

    Required keys mirror the reference's validated cosmo dict
    (utils/io.py:56-129): Omega_m, Omega_b, sigma8, h, n_s, w0 (+ wa).
    """
    Omega_m: float
    Omega_b: float
    h: float
    sigma8: float
    n_s: float
    w0: float = -1.0
    wa: float = 0.0
    T_CMB: float = 2.725
    Neff: float = 3.044

    def tree_flatten(self):
        leaves = (self.Omega_m, self.Omega_b, self.h, self.sigma8,
                  self.n_s, self.w0, self.wa, self.T_CMB, self.Neff)
        return leaves, None

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves)

    @property
    def Omega_c(self):
        return self.Omega_m - self.Omega_b

    @property
    def Omega_g(self):
        # photon density from T_CMB:  Omega_g h^2 = 2.473e-5 (T/2.7255)^4
        return 2.47282e-5 * (self.T_CMB / 2.7255) ** 4 / self.h ** 2

    @property
    def Omega_nu_rel(self):
        return self.Omega_g * 0.2271073 * self.Neff

    @property
    def Omega_r(self):
        return self.Omega_g + self.Omega_nu_rel

    @property
    def Omega_de(self):
        return 1.0 - self.Omega_m - self.Omega_r

    def __hash__(self):
        return hash((self.Omega_m, self.Omega_b, self.h, self.sigma8,
                     self.n_s, self.w0, self.wa, self.T_CMB, self.Neff))


def cosmology_from_dict(d):
    """Build a Cosmology from the reference-style cosmo dict."""
    return Cosmology(Omega_m=float(d["Omega_m"]), Omega_b=float(d["Omega_b"]),
                     h=float(d["h"]), sigma8=float(d["sigma8"]),
                     n_s=float(d["n_s"]), w0=float(d.get("w0", -1.0)),
                     wa=float(d.get("wa", 0.0)))


def build_cosmodict(cosmo):
    """Cosmology -> plain dict (reference utils/misc.py:187-237 analog)."""
    return dict(Omega_m=cosmo.Omega_m, Omega_b=cosmo.Omega_b, h=cosmo.h,
                sigma8=cosmo.sigma8, n_s=cosmo.n_s, w0=cosmo.w0, wa=cosmo.wa)


# ---------------------------------------------------------------------------
# Background
# ---------------------------------------------------------------------------
def Eofa(cosmo, a):
    """Dimensionless Hubble rate E(a) = H(a)/H0 for flat w0waCDM + radiation."""
    a = jnp.asarray(a)
    de = cosmo.Omega_de * a ** (-3.0 * (1.0 + cosmo.w0 + cosmo.wa)) \
        * jnp.exp(-3.0 * cosmo.wa * (1.0 - a))
    return jnp.sqrt(cosmo.Omega_m * a ** -3 + cosmo.Omega_r * a ** -4 + de)


def hubble_Ha(cosmo, a):
    """H(a) in km/s/Mpc."""
    return 100.0 * cosmo.h * Eofa(cosmo, a)


def rho_crit(cosmo, a):
    """Critical density at scale factor a, physical Msun / Mpc^3."""
    return const.RHO_CRIT_0_h2 * cosmo.h ** 2 * Eofa(cosmo, a) ** 2


def rho_x(cosmo, a, species="matter", is_comoving=False):
    """Density of a species (reference ccl.rho_x analog), Msun / Mpc^3."""
    rc0 = const.RHO_CRIT_0_h2 * cosmo.h ** 2
    if species == "matter":
        rho0 = cosmo.Omega_m * rc0
        phys = rho0 * jnp.asarray(a) ** -3
    elif species == "critical":
        phys = rho_crit(cosmo, a)
        rho0 = None
    elif species == "baryon":
        rho0 = cosmo.Omega_b * rc0
        phys = rho0 * jnp.asarray(a) ** -3
    else:
        raise ValueError(f"unknown species {species}")
    if is_comoving:
        if rho0 is None:
            return phys * jnp.asarray(a) ** 3
        return rho0 * jnp.ones_like(jnp.asarray(a, dtype=jnp.result_type(float)))
    return phys


# ---------------------------------------------------------------------------
# Distances (flat): chi(a) = (c/H0) ∫_a^1 da' / (a'^2 E(a'))
# Fixed-order Gauss-Legendre quadrature, vectorized over a.
# ---------------------------------------------------------------------------
_GL_NODES, _GL_WEIGHTS = np.polynomial.legendre.leggauss(128)


@jax.jit
def comoving_radial_distance(cosmo, a):
    """Comoving radial distance in Mpc (vectorized over a)."""
    a = jnp.atleast_1d(jnp.asarray(a, dtype=jnp.result_type(float)))
    lo, hi = a[..., None], 1.0
    x = 0.5 * (hi - lo) * (_GL_NODES + 1.0) + lo          # (..., 128)
    w = 0.5 * (hi - lo) * _GL_WEIGHTS
    integrand = 1.0 / (x ** 2 * Eofa(cosmo, x))
    chi = (const.C_LIGHT / (100.0 * cosmo.h)) * jnp.sum(w * integrand, axis=-1)
    return chi


def angular_diameter_distance(cosmo, a):
    """Angular-diameter distance D_A = a * chi (flat), physical Mpc."""
    a = jnp.asarray(a)
    return jnp.atleast_1d(a) * comoving_radial_distance(cosmo, a)


# ---------------------------------------------------------------------------
# Linear growth factor: solve the growth ODE in ln a with fixed-step RK4.
#   D'' + (2 + dlnE/dlna) D' - (3/2) Omega_m(a) D = 0    (' = d/dlna)
# Normalized so growth_factor(a) = D(a) / D(1)  (CCL convention).
# ---------------------------------------------------------------------------
_GROWTH_N = 512
_GROWTH_LNA0 = np.log(1e-4)


def _Eofa_norad(cosmo, a):
    """E(a) without radiation — used only in the growth ODE, where the
    matter-domination initial condition D ~ a requires a radiation-free
    background (radiation shifts D by <0.1% at the z<30 range we serve)."""
    ode = 1.0 - cosmo.Omega_m
    de = ode * a ** (-3.0 * (1.0 + cosmo.w0 + cosmo.wa)) \
        * jnp.exp(-3.0 * cosmo.wa * (1.0 - a))
    return jnp.sqrt(cosmo.Omega_m * a ** -3 + de)


def _omega_m_of_a(cosmo, a):
    return cosmo.Omega_m * a ** -3 / _Eofa_norad(cosmo, a) ** 2


def _dlnE_dlna(cosmo, a):
    eps = 1e-4
    return (jnp.log(_Eofa_norad(cosmo, a * jnp.exp(eps)))
            - jnp.log(_Eofa_norad(cosmo, a * jnp.exp(-eps)))) / (2.0 * eps)


@jax.jit
def _growth_table(cosmo):
    """Integrate the growth ODE; returns (lna_grid, D_grid) with D(1)=1."""
    lna = jnp.linspace(_GROWTH_LNA0, 0.0, _GROWTH_N)
    dl = lna[1] - lna[0]

    def rhs(state, lna_i):
        D, Dp = state
        a = jnp.exp(lna_i)
        damp = 2.0 + _dlnE_dlna(cosmo, a)
        return jnp.array([Dp, -damp * Dp + 1.5 * _omega_m_of_a(cosmo, a) * D])

    def step(state, lna_i):
        k1 = rhs(state, lna_i)
        k2 = rhs(state + 0.5 * dl * k1, lna_i + 0.5 * dl)
        k3 = rhs(state + 0.5 * dl * k2, lna_i + 0.5 * dl)
        k4 = rhs(state + dl * k3, lna_i + dl)
        new = state + dl / 6.0 * (k1 + 2 * k2 + 2 * k3 + k4)
        return new, new[0]

    a0 = jnp.exp(_GROWTH_LNA0)
    init = jnp.array([a0, a0])       # matter-domination: D ~ a
    _, Ds = jax.lax.scan(step, init, lna[1:])
    D = jnp.concatenate([jnp.array([a0]), Ds])
    return lna, D / D[-1]


@jax.jit
def growth_factor(cosmo, a):
    """Linear growth D(a)/D(1); mirrors the input's scalar/array rank."""
    lna_grid, D_grid = _growth_table(cosmo)
    a_arr = jnp.atleast_1d(jnp.asarray(a, dtype=jnp.result_type(float)))
    out = jnp.interp(jnp.log(a_arr), lna_grid, D_grid)
    return out[0] if jnp.ndim(a) == 0 else out
