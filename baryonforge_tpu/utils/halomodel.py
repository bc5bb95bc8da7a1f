"""Halo-model calculator with M_delta != M_tot support, in JAX.

Reference: utils/halomodel.py (FlexibleHMCalculator). Because we replace
pyccl entirely, this module also carries the halo mass functions and bias
(Sheth-Tormen 1999, Tinker 2008/2010-style) the reference pulls from CCL.

The calculator computes halo-model integrals

    I = ∫ dM n(M, a) f(M, k, a)

with the mass-function mass M_delta allowed to differ from the profile's
total mass M_tot (untruncated profiles), using the same counter-term
normalization as the reference (halomodel.py:47-76):

    n_0 = (rho_m - ∫ n M_tot dM) / M_tot,min          (mass conservation)
    b_0 = (rho_m - ∫ n b M_tot dM) / M_tot,min        (bias consistency)
"""

from functools import partial
import numpy as np
import jax
import jax.numpy as jnp

from ..cosmo import core as _core
from ..cosmo import power as _power
from ..cosmo import massdef as _massdef

__all__ = ["MassFuncShethTormen", "MassFuncTinker08", "HaloBiasShethTormen",
           "FlexibleHMCalculator", "halomodel_power"]

_DELTA_C = 1.686


def _dlnsig_dlnM(cosmo, M, a):
    eps = 1e-3
    lp = jnp.log(_power.sigmaM(cosmo, M * jnp.exp(eps), a))
    lm = jnp.log(_power.sigmaM(cosmo, M * jnp.exp(-eps), a))
    return (lp - lm) / (2 * eps)


class MassFuncShethTormen:
    """Sheth & Tormen 1999 dn/dlog10M [Mpc^-3] (comoving)."""

    def __init__(self, mass_def=_massdef.MassDef200m, A=0.3222, a_st=0.707,
                 p=0.3):
        self.mass_def = mass_def
        self.A, self.a_st, self.p = A, a_st, p

    def __call__(self, cosmo, M, a):
        M = jnp.atleast_1d(jnp.asarray(M))
        sig = _power.sigmaM(cosmo, M, a)
        nu = _DELTA_C / sig
        anu2 = self.a_st * nu ** 2
        f = (self.A * jnp.sqrt(2 * anu2 / jnp.pi)
             * (1 + anu2 ** -self.p) * jnp.exp(-anu2 / 2))
        rho_m0 = _core.rho_x(cosmo, 1.0, "matter", is_comoving=True)
        dlns = -_dlnsig_dlnM(cosmo, M, a)
        # dn/dlog10M = f(nu) rho_m/M * dln sigma^-1/dlog10 M
        return f * rho_m0 / M * dlns * jnp.log(10.0)


class MassFuncTinker08:
    """Tinker et al. 2008 dn/dlog10M for Delta=200m."""

    def __init__(self, mass_def=_massdef.MassDef200m):
        self.mass_def = mass_def
        # Delta = 200 (matter) calibration row
        self.A0, self.a0, self.b0, self.c0 = 0.186, 1.47, 2.57, 1.19

    def __call__(self, cosmo, M, a):
        M = jnp.atleast_1d(jnp.asarray(M))
        z = jnp.clip(1 / a - 1, 0.0, 3.0)
        sig = _power.sigmaM(cosmo, M, a)
        A = self.A0 * (1 + z) ** -0.14
        aa = self.a0 * (1 + z) ** -0.06
        alpha = 10 ** (-((0.75 / jnp.log10(200 / 75.0)) ** 1.2))
        b = self.b0 * (1 + z) ** -alpha
        c = self.c0
        f = A * ((sig / b) ** -aa + 1) * jnp.exp(-c / sig ** 2)
        rho_m0 = _core.rho_x(cosmo, 1.0, "matter", is_comoving=True)
        dlns = -_dlnsig_dlnM(cosmo, M, a)
        return f * rho_m0 / M * dlns * jnp.log(10.0)


class HaloBiasShethTormen:
    """Sheth & Tormen 1999 peak-background-split bias."""

    def __init__(self, mass_def=_massdef.MassDef200m, a_st=0.707, p=0.3):
        self.mass_def = mass_def
        self.a_st, self.p = a_st, p

    def __call__(self, cosmo, M, a):
        M = jnp.atleast_1d(jnp.asarray(M))
        nu = _DELTA_C / _power.sigmaM(cosmo, M, a)
        anu2 = self.a_st * nu ** 2
        return (1 + (anu2 - 1) / _DELTA_C
                + 2 * self.p / _DELTA_C / (1 + anu2 ** self.p))


class FlexibleHMCalculator:
    """Halo-model integrals with the M_delta/M_tot distinction
    (reference utils/halomodel.py:47-76)."""

    def __init__(self, *, mass_function, halo_bias, halo_m_to_mtot=None,
                 mass_def=_massdef.MassDef200m, log10M_min=8.0,
                 log10M_max=16.0, nM=128):
        self.mass_function = mass_function
        self.halo_bias = halo_bias
        self.halo_m_to_mtot = halo_m_to_mtot
        self.mass_def = mass_def
        self._mass = jnp.asarray(np.geomspace(10.0 ** log10M_min,
                                              10.0 ** log10M_max, nM))
        self._lmass = jnp.log10(self._mass)

    def _weights(self, cosmo, a):
        rho0 = _core.rho_x(cosmo, 1.0, "matter", is_comoving=True)
        nM = self.mass_function(cosmo, self._mass, a)     # dn/dlog10M
        if self.halo_m_to_mtot is not None:
            mtot = self.halo_m_to_mtot(cosmo, self._mass, a)
        else:
            mtot = self._mass
        # counter terms: unresolved low-mass halos carry the missing mass
        integ_m = jnp.trapezoid(nM * mtot, self._lmass)
        mf0 = (rho0 - integ_m) / mtot[0]
        bf = self.halo_bias(cosmo, self._mass, a)
        integ_b = jnp.trapezoid(nM * bf * mtot, self._lmass)
        mbf0 = (rho0 - integ_b) / mtot[0]
        return nM, bf, mf0, mbf0

    def integrate_over_massfunc(self, func, cosmo, a):
        """∫ dn/dlog10M func(M) dlog10M + counter term."""
        nM, _, mf0, _ = self._weights(cosmo, a)
        fM = func(self._mass)
        return jnp.trapezoid(nM * fM, self._lmass) + mf0 * func(
            self._mass[:1])[0]

    def I_0_1(self, cosmo, k, a, prof):
        """∫ n(M) u(k, M) dM + counter term."""
        nM, _, mf0, _ = self._weights(cosmo, a)
        uk = jnp.atleast_2d(prof.fourier(cosmo, k, np.asarray(self._mass),
                                         a))               # (M, k)
        integ = jnp.trapezoid(nM[:, None] * uk, self._lmass, axis=0)
        return integ + mf0 * uk[0]

    def I_1_1(self, cosmo, k, a, prof):
        """∫ n(M) b(M) u(k, M) dM + counter term."""
        nM, bf, _, mbf0 = self._weights(cosmo, a)
        uk = jnp.atleast_2d(prof.fourier(cosmo, k, np.asarray(self._mass),
                                         a))
        integ = jnp.trapezoid((nM * bf)[:, None] * uk, self._lmass, axis=0)
        return integ + mbf0 * uk[0]


def halomodel_power(cosmo, k, a, prof, hmc):
    """Halo-model P(k) = P_2h + P_1h (normalized 2-halo with linear P)."""
    k = np.atleast_1d(np.asarray(k, dtype=float))
    pk_lin = _power.linear_power(cosmo, jnp.asarray(k), a)
    rho0 = _core.rho_x(cosmo, 1.0, "matter", is_comoving=True)
    i11 = hmc.I_1_1(cosmo, k, a, prof) / rho0
    nM, _, mf0, _ = hmc._weights(cosmo, a)
    uk = jnp.atleast_2d(prof.fourier(cosmo, k, np.asarray(hmc._mass), a))
    i02 = (jnp.trapezoid(nM[:, None] * uk ** 2, hmc._lmass, axis=0)
           / rho0 ** 2)
    return pk_lin * i11 ** 2 + i02
