"""Utility profiles: truncation windows, identity/zero test doubles, unit
conversion wrappers (reference Profiles/misc.py analog)."""

import numpy as np
import jax
import jax.numpy as jnp

from .Base import Profile, _atleast_1d_pair
from ..ops import fftlog as _fftlog

__all__ = ["Truncation", "Identity", "Zeros", "TruncatedFourier",
           "ComovingToPhysical", "Mdelta_to_Mtot"]


class Truncation(Profile):
    """Indicator profile: 1 inside epsilon * R_def, 0 outside. Multiply onto
    another profile to truncate it (reference misc.py:11-83)."""

    model_param_names = ["epsilon_trunc"]

    def __init__(self, epsilon_trunc=1.0, **kwargs):
        super().__init__(**kwargs)
        self.epsilon_trunc = epsilon_trunc

    def _real(self, cosmo, r, M, a):
        r_use, M_use = _atleast_1d_pair(r, M)
        R = self.mass_def.get_radius(cosmo, M_use, a) / a
        return jnp.where(r_use[None, :] < self.epsilon_trunc * R[:, None],
                         1.0, 0.0)


class Identity(Profile):
    """Profile that is 1 everywhere (test double, reference misc.py:86)."""

    def _real(self, cosmo, r, M, a):
        r_use, M_use = _atleast_1d_pair(r, M)
        return jnp.ones([M_use.size, r_use.size])


class Zeros(Profile):
    """Profile that is 0 everywhere — for nulling components
    (reference misc.py:120-160)."""

    def _real(self, cosmo, r, M, a):
        r_use, M_use = _atleast_1d_pair(r, M)
        return jnp.zeros([M_use.size, r_use.size])

    def _fourier(self, cosmo, k, M, a):
        k_use, M_use = _atleast_1d_pair(k, M)
        return jnp.zeros([M_use.size, k_use.size])

    def _projected(self, cosmo, r, M, a, **kw):
        r_use, M_use = _atleast_1d_pair(r, M)
        return jnp.zeros([M_use.size, r_use.size])


class TruncatedFourier(Profile):
    """Fourier transform with hard per-halo integration limits
    [eps_min R, eps_max R] for sharply truncated profiles
    (reference misc.py:164-228). Wraps another profile."""

    def __init__(self, profile, epsilon_max=1.0, epsilon_min=1e-3, N_int=512,
                 **kwargs):
        self.Profile = profile
        self.epsilon_max = epsilon_max
        self.epsilon_min = epsilon_min
        self.N_int = N_int
        self.model_param_names = profile.model_param_names
        super().__init__(**{**profile.model_params, **profile.hyper_params})

    def _real(self, cosmo, r, M, a):
        return self.Profile._real(cosmo, r, M, a)

    def _fourier(self, cosmo, k, M, a):
        k_use, M_use = _atleast_1d_pair(k, M)
        R = self.mass_def.get_radius(cosmo, M_use, a) / a
        # per-halo geomspace(eps_min R, eps_max R): direct quadrature of
        # 4 pi r^2 rho j0(kr) (no FFTLog: limits are per-halo)
        t = jnp.linspace(0.0, 1.0, self.N_int)
        r_lo = self.epsilon_min * R
        r_hi = self.epsilon_max * R
        r_int = jnp.exp(jnp.log(r_lo)[:, None]
                        + (jnp.log(r_hi) - jnp.log(r_lo))[:, None] * t[None])
        rho = jax.vmap(
            lambda rr, m: self.Profile._real(cosmo, rr, m[None], a)[0]
        )(r_int, M_use)
        x = k_use[None, None, :] * r_int[:, :, None]
        j0 = jnp.sinc(x / jnp.pi)
        integrand = 4 * jnp.pi * r_int[:, :, None] ** 2 * rho[:, :, None] * j0
        return jnp.trapezoid(integrand, r_int[:, :, None], axis=1)


class ComovingToPhysical(Profile):
    """Wraps profile * a^factor (projected gains one more power of a)
    (reference misc.py:231-276)."""

    def __init__(self, profile, factor=1.0, **kwargs):
        self.Profile = profile
        self.factor = factor
        self.model_param_names = profile.model_param_names
        super().__init__(**{**profile.model_params, **profile.hyper_params})

    def _real(self, cosmo, r, M, a):
        return self.Profile._real(cosmo, r, M, a) * a ** self.factor

    def _projected(self, cosmo, r, M, a, **kw):
        return (self.Profile._projected(cosmo, r, M, a, **kw)
                * a ** (self.factor + 1))


class Mdelta_to_Mtot:
    """M_tot(M_delta) by integrating rho out to r_max
    (reference misc.py:279-325); feeds FlexibleHMCalculator."""

    def __init__(self, profile, r_min=1e-6, r_max=100.0, N_int=512):
        self.Profile = profile
        self.r_min = r_min
        self.r_max = r_max
        self.N_int = N_int

    def __call__(self, cosmo, M, a):
        M_use = jnp.atleast_1d(jnp.asarray(M, dtype=jnp.result_type(float)))
        r_int = jnp.geomspace(self.r_min, self.r_max, self.N_int)
        rho = self.Profile._real(cosmo, r_int, M_use, a)
        Mtot = jnp.trapezoid(4 * jnp.pi * r_int ** 2 * rho, r_int, axis=-1)
        return Mtot[0] if jnp.ndim(M) == 0 else Mtot
