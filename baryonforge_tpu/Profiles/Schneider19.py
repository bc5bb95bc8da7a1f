"""Schneider et al. 2019 baryonification model family, TPU-native.

Physics parity with reference Profiles/Schneider19.py (cited per class); the
implementation is redesigned as batched jnp: per-halo normalization loops
(Schneider19.py:290-294) become broadcasted per-halo log grids, and the
adiabatic-relaxation while-loop (Schneider19.py:876-909) becomes a fixed
``max_iter`` vectorized fixed-point iteration over all halos at once.
"""

import numpy as np
import jax
import jax.numpy as jnp

from .Base import Profile, hyper_params, sigmoid_cutoff, _mirror_dims, \
    _atleast_1d_pair
from ..cosmo import core as _core
from ..cosmo import power as _power
from ..ops.integrate import cumulative_simpson_uniform
from ..ops.interp import (pchip_derivatives, pchip_eval, cubic_spline_coeffs,
                          cubic_spline_eval, cubic_spline_derivative_eval)

__all__ = ["model_params", "SchneiderProfiles", "DarkMatter", "TwoHalo",
           "Stars", "SatelliteStars", "Gas", "ShockedGas",
           "CollisionlessMatter", "DarkMatterOnly", "DarkMatterBaryon"]

# parameter inventory mirrors reference Schneider19.py:16-33
model_params = ['cdelta', 'epsilon', 'a', 'n',
                'q', 'p',
                'cutoff', 'proj_cutoff',

                'theta_ej', 'theta_co', 'M_c', 'gamma', 'delta',
                'mu_theta_ej', 'mu_theta_co', 'mu_beta', 'mu_gamma', 'mu_delta',
                'M_theta_ej', 'M_theta_co', 'M_gamma', 'M_delta',
                'nu_theta_ej', 'nu_theta_co', 'nu_M_c', 'nu_gamma', 'nu_delta',
                'zeta_theta_ej', 'zeta_theta_co', 'zeta_M_c', 'zeta_gamma',
                'zeta_delta',

                'A', 'M1', 'eta', 'eta_delta', 'tau', 'tau_delta', 'epsilon_h',
                'mu_epsilon_h',
                'M_epsilon_h',
                'nu_A', 'nu_M1', 'nu_eta', 'nu_eta_delta', 'nu_tau',
                'nu_tau_delta', 'nu_epsilon_h',
                'zeta_A', 'zeta_M1', 'zeta_eta', 'zeta_eta_delta', 'zeta_tau',
                'zeta_tau_delta', 'zeta_epsilon_h',

                'alpha_nt', 'nu_nt', 'gamma_nt', 'mean_molecular_weight']


def _f_bar(cosmo):
    return cosmo.Omega_b / cosmo.Omega_m


class SchneiderProfiles(Profile):
    """Family base: gas parameter scalings and stellar/gas mass fractions
    (reference Schneider19.py:35-210)."""

    model_param_names = model_params
    hyper_param_names = hyper_params

    def _get_gas_params(self, M, z):
        cdelta = 1 if self.cdelta is None else self.cdelta
        M_c = self.M_c * (1 + z) ** self.nu_M_c * cdelta ** self.zeta_M_c
        beta = 3 * (M / M_c) ** self.mu_beta / (1 + (M / M_c) ** self.mu_beta)

        theta_ej = (self.theta_ej * (M / self.M_theta_ej) ** self.mu_theta_ej
                    * (1 + z) ** self.nu_theta_ej
                    * cdelta ** self.zeta_theta_ej)
        theta_co = (self.theta_co * (M / self.M_theta_co) ** self.mu_theta_co
                    * (1 + z) ** self.nu_theta_co
                    * cdelta ** self.zeta_theta_co)
        delta = (self.delta * (M / self.M_delta) ** self.mu_delta
                 * (1 + z) ** self.nu_delta * cdelta ** self.zeta_delta)
        gamma = (self.gamma * (M / self.M_gamma) ** self.mu_gamma
                 * (1 + z) ** self.nu_gamma * cdelta ** self.zeta_gamma)

        return (beta[:, None], theta_ej[:, None], theta_co[:, None],
                delta[:, None], gamma[:, None])

    def _get_star_frac(self, M_use, a, cosmo):
        cdelta = 1 if self.cdelta is None else self.cdelta
        z = 1 / a - 1
        A = self.A * (1 + z) ** self.nu_A * cdelta ** self.zeta_A
        eta = self.eta * (1 + z) ** self.nu_eta * cdelta ** self.zeta_eta
        tau = self.tau * (1 + z) ** self.nu_tau * cdelta ** self.zeta_tau
        eta_d = (self.eta_delta * (1 + z) ** self.nu_eta_delta
                 * cdelta ** self.zeta_eta_delta)
        tau_d = (self.tau_delta * (1 + z) ** self.nu_tau_delta
                 * cdelta ** self.zeta_tau_delta)
        M1 = self.M1 * (1 + z) ** self.nu_M1 * cdelta ** self.zeta_M1

        eta_cga = eta + eta_d
        tau_cga = tau + tau_d

        fb = _f_bar(cosmo)
        f_star = 2 * A * ((M_use / M1) ** tau + (M_use / M1) ** eta) ** -1
        f_cga = 2 * A * ((M_use / M1) ** tau_cga
                         + (M_use / M1) ** eta_cga) ** -1
        f_star = jnp.clip(f_star, 1e-10, fb)
        f_cga = jnp.clip(f_cga, 1e-10, f_star)
        f_sga = jnp.clip(f_star - f_cga, 1e-10, None)
        return f_star, f_cga, f_sga

    def get_f_star(self, M_use, a, cosmo):
        return self._get_star_frac(M_use, a, cosmo)[0]

    def get_f_star_cen(self, M_use, a, cosmo):
        return self._get_star_frac(M_use, a, cosmo)[1]

    def get_f_star_sat(self, M_use, a, cosmo):
        return self._get_star_frac(M_use, a, cosmo)[2]

    def _get_gas_frac(self, M_use, a, cosmo):
        f_star = self.get_f_star(M_use, a, cosmo)
        return jnp.clip(_f_bar(cosmo) - f_star, 1e-10, None)

    def get_f_gas(self, M_use, a, cosmo):
        return self._get_gas_frac(M_use, a, cosmo)


def _per_halo_loggrid(r_min, R, steps):
    """geomspace(r_min, R_i, steps) per halo, shape (M, steps)."""
    t = jnp.linspace(0.0, 1.0, steps)
    return jnp.exp(jnp.log(r_min)
                   + (jnp.log(R)[:, None] - jnp.log(r_min)) * t[None, :])


class DarkMatter(SchneiderProfiles):
    """Truncated NFW with numeric per-halo normalization to M(<R)
    (reference Schneider19.py:214-309)."""

    def _real(self, cosmo, r, M, a):
        r_use, M_use = _atleast_1d_pair(r, M)
        c = self._get_concentration(cosmo, M_use, a)
        R = self.mass_def.get_radius(cosmo, M_use, a) / a   # comoving Mpc
        r_s = (R / c)[:, None]
        r_t = (R * self.epsilon)[:, None]

        # numeric normalization: trapz of the truncated NFW shape on a
        # per-halo geomspace(r_min_int, R_i) grid — vectorized over halos
        r_int = _per_halo_loggrid(self.r_min_int, R, self.r_steps)
        shape = (1.0 / (r_int / r_s * (1 + r_int / r_s) ** 2)
                 * 1.0 / (1 + (r_int / r_t) ** 2) ** 2)
        norm = jnp.trapezoid(4 * jnp.pi * r_int ** 2 * shape, r_int, axis=-1)
        rho_c = (M_use / norm)[:, None]

        kfac = sigmoid_cutoff(r_use[None, :], self.cutoff)
        prof = (rho_c / (r_use / r_s * (1 + r_use / r_s) ** 2)
                / (1 + (r_use / r_t) ** 2) ** 2 * kfac)
        return prof


class TwoHalo(SchneiderProfiles):
    """(1 + b(M) xi_mm(r)) rho_m with Sheth-Tormen bias
    (reference Schneider19.py:312-399)."""

    def _real(self, cosmo, r, M, a):
        r_use, M_use = _atleast_1d_pair(r, M)

        if self.xi_mm is None:
            xi = _power.correlation_3d(cosmo, r_use, a=a)
        else:
            xi = self.xi_mm(r_use, a)

        delta_c = 1.686 / _core.growth_factor(cosmo, a)
        nu_M = delta_c / _power.sigmaM(cosmo, M_use, a)
        bias = (1 + (self.q * nu_M ** 2 - 1) / delta_c
                + 2 * self.p / delta_c / (1 + (self.q * nu_M ** 2) ** self.p))
        rho_m = _core.rho_x(cosmo, a, species="matter", is_comoving=True)
        prof = (1 + bias[:, None] * xi[None, :]) * rho_m
        return prof * sigmoid_cutoff(r_use[None, :], self.cutoff)


class Stars(SchneiderProfiles):
    """Central-galaxy exponential stellar profile
    (reference Schneider19.py:402-500)."""

    def __init__(self, **kwargs):
        super().__init__(**kwargs)
        # extreme padding needed against fourier ringing (ref. 459-466)
        self.update_precision_fftlog(padding_lo_fftlog=1e-5,
                                     padding_hi_fftlog=1e5)

    def _real(self, cosmo, r, M, a):
        r_use, M_use = _atleast_1d_pair(r, M)
        z = 1 / a - 1
        R = self.mass_def.get_radius(cosmo, M_use, a) / a

        cdelta = 1 if self.cdelta is None else self.cdelta
        eps_h = (self.epsilon_h * (M_use / self.M_epsilon_h) ** self.mu_epsilon_h
                 * (1 + z) ** self.nu_epsilon_h * cdelta ** self.zeta_epsilon_h)
        f_cga = self.get_f_star_cen(M_use, a, cosmo)[:, None]
        R_h = (eps_h * R)[:, None]

        # M_tot from integrating a fresh DarkMatter (cutoff at 1 Gpc)
        M_tot = _total_dm_mass(self, cosmo, M_use, a)[:, None]

        kfac = sigmoid_cutoff(r_use[None, :], self.cutoff)
        prof = (f_cga * M_tot / (4 * jnp.pi ** 1.5 * R_h) / r_use ** 2
                * jnp.exp(-(r_use / 2 / R_h) ** 2) * kfac)
        return prof


def _total_dm_mass(prof_obj, cosmo, M_use, a):
    """∫ 4 pi r^2 rho_NFW dr over the fixed integration grid (cutoff 1 Gpc),
    reused by Stars/Gas normalizations (reference Schneider19.py:485-487)."""
    DM = DarkMatter(**prof_obj.model_params, **prof_obj.hyper_params)
    DM.cutoff = 1e3
    r_int = jnp.geomspace(prof_obj.r_min_int, prof_obj.r_max_int,
                          prof_obj.r_steps)
    rho = DM._real(cosmo, r_int, M_use, a)
    return jnp.trapezoid(4 * jnp.pi * r_int ** 2 * rho, r_int, axis=-1)


class Gas(SchneiderProfiles):
    """GNFW gas profile normalized to f_gas M_tot
    (reference Schneider19.py:503-609)."""

    def _real(self, cosmo, r, M, a):
        r_use, M_use = _atleast_1d_pair(r, M)
        z = 1 / a - 1
        R = self.mass_def.get_radius(cosmo, M_use, a) / a

        f_gas = self.get_f_gas(M_use, a, cosmo)[:, None]
        beta, theta_ej, theta_co, delta, gamma = self._get_gas_params(M_use, z)
        R_co = theta_co * R[:, None]
        R_ej = theta_ej * R[:, None]

        u = r_use[None, :] / R_co
        v = r_use[None, :] / R_ej

        r_int = jnp.geomspace(self.r_min_int, self.r_max_int, self.r_steps)
        u_i = r_int[None, :] / R_co
        v_i = r_int[None, :] / R_ej
        shape_i = (1 + u_i) ** -beta \
            * (1 + v_i ** gamma) ** (-(delta - beta) / gamma)
        norm = jnp.trapezoid(4 * jnp.pi * r_int ** 2 * shape_i, r_int,
                             axis=-1)[:, None]

        M_tot = _total_dm_mass(self, cosmo, M_use, a)[:, None]

        kfac = sigmoid_cutoff(r_use[None, :], self.cutoff)
        prof = (1 + u) ** -beta * (1 + v ** gamma) ** (-(delta - beta) / gamma) \
            * kfac
        return prof * f_gas * M_tot / norm


class ShockedGas(Gas):
    """Gas with Rankine-Hugoniot density suppression behind the shock
    (reference Schneider19.py:612-689)."""

    def __init__(self, epsilon_shock, width_shock, **kwargs):
        self.epsilon_shock = epsilon_shock
        self.width_shock = width_shock
        super().__init__(**kwargs)

    def _real(self, cosmo, r, M, a):
        r_use, M_use = _atleast_1d_pair(r, M)
        R = self.mass_def.get_radius(cosmo, M_use, a) / a
        rho_gas = super()._real(cosmo, r_use, M_use, a)
        g_arg = (jnp.log(r_use)[None, :]
                 - jnp.log(self.epsilon_shock * R)[:, None]) / self.width_shock
        g_arg = jnp.where(g_arg > 1e2, jnp.inf, g_arg)
        factor = (1 - 0.25) / (1 + jnp.exp(g_arg)) + 0.25
        return rho_gas * factor


class CollisionlessMatter(SchneiderProfiles):
    """Adiabatically relaxed collisionless component (DM + satellites).

    The reference's per-halo while-loop (Schneider19.py:876-909) becomes a
    vectorized fixed-point iteration of exactly ``max_iter`` steps over all
    halos (the loop converges in 2-3 steps; extra steps are no-ops at the
    fixed point).
    """

    def __init__(self, gas=None, stars=None, darkmatter=None, max_iter=10,
                 reltol=1e-2, r_min_int=1e-8, r_max_int=1e5, r_steps=5000,
                 **kwargs):
        self.Gas = gas if gas is not None else Gas(**kwargs)
        self.Stars = stars if stars is not None else Stars(**kwargs)
        self.DarkMatter = (darkmatter if darkmatter is not None
                           else DarkMatter(**kwargs))

        # no artificial cutoffs during relaxation (ref. 812-814)
        self.Gas.set_parameter('cutoff', 1000)
        self.Stars.set_parameter('cutoff', 1000)
        self.DarkMatter.set_parameter('cutoff', 1000)

        self.max_iter = max_iter
        self.reltol = reltol
        super().__init__(**kwargs, r_min_int=r_min_int,
                         r_max_int=r_max_int, r_steps=r_steps)

    def _real(self, cosmo, r, M, a):
        r_use, M_use = _atleast_1d_pair(r, M)

        r_int = jnp.geomspace(self.r_min_int, self.r_max_int, self.r_steps)
        lnr = jnp.log(r_int)

        f_sga = self.get_f_star_sat(M_use, a, cosmo)[:, None]
        f_clm = 1 - _f_bar(cosmo) + f_sga

        rho_i = self.DarkMatter._real(cosmo, r_int, M_use, a)
        rho_cga = self.Stars._real(cosmo, r_int, M_use, a)
        rho_gas = self.Gas._real(cosmo, r_int, M_use, a)

        dlnr = lnr[1] - lnr[0]
        dV = 4 * jnp.pi * r_int ** 3 * dlnr
        def cmass(rho):
            return (cumulative_simpson_uniform(dV[None, :] * rho, dx=1.0,
                                               axis=-1)
                    + dV[0] * rho[:, :1])
        M_i = cmass(rho_i)
        M_cga = cmass(rho_cga)
        M_gas = cmass(rho_gas)

        # floor the cumulative masses: an injected Zeros() component (ref.
        # allows sub-profile injection) gives M(<r)=0 whose log would
        # poison the PCHIP relaxation with -inf/NaN; 1e-20 Msun acts as
        # "contributes nothing" while keeping the interpolants finite
        ln_Mi = jnp.log(jnp.maximum(M_i, 1e-20))
        d_nfw = jax.vmap(lambda y: pchip_derivatives(lnr, y))(ln_Mi)
        ln_Mc = jnp.log(jnp.maximum(M_cga, 1e-20))
        d_cga = jax.vmap(lambda y: pchip_derivatives(lnr, y))(ln_Mc)
        ln_Mg = jnp.log(jnp.maximum(M_gas, 1e-20))
        d_gas = jax.vmap(lambda y: pchip_derivatives(lnr, y))(ln_Mg)

        def body(_, zeta):
            ln_rf = lnr[None, :] + jnp.log(zeta)
            Mcga_f = jnp.exp(jax.vmap(
                lambda yc, dc, x: pchip_eval(lnr, yc, dc, x))(ln_Mc, d_cga,
                                                              ln_rf))
            Mgas_f = jnp.exp(jax.vmap(
                lambda yg, dg, x: pchip_eval(lnr, yg, dg, x))(ln_Mg, d_gas,
                                                              ln_rf))
            M_f = f_clm * M_i + Mcga_f + Mgas_f
            return self.a * ((M_i / M_f) ** self.n - 1) + 1

        zeta = jax.lax.fori_loop(0, self.max_iter, body,
                                 jnp.ones_like(M_i))

        # rho_clm from d/dr of the relaxed (shifted) NFW mass curve
        def shifted(yi, di, z_row):
            return pchip_eval(lnr, yi, di, lnr - jnp.log(z_row))
        ln_M_clm = jnp.log(f_clm) + jax.vmap(shifted)(ln_Mi, d_nfw, zeta)

        d_spl = cubic_spline_coeffs(lnr, ln_M_clm)
        ln_ru = jnp.log(r_use)
        log_der = cubic_spline_derivative_eval(lnr, ln_M_clm, d_spl, ln_ru)
        ln_at = cubic_spline_eval(lnr, ln_M_clm, d_spl, ln_ru)
        lin_der = log_der * jnp.exp(ln_at) / r_use[None, :]
        prof = lin_der / (4 * jnp.pi * r_use[None, :] ** 2)
        prof = jnp.clip(prof, 0.0, None)
        # outside the spline domain -> 0 (scipy extrapolate=False semantics)
        outside = (ln_ru < lnr[0]) | (ln_ru > lnr[-1])
        prof = jnp.where(outside[None, :], 0.0, prof)

        kfac = sigmoid_cutoff(r_use[None, :], self.cutoff)
        prof = jnp.where(jnp.isfinite(prof), prof, 0.0) * kfac
        return prof


class SatelliteStars(CollisionlessMatter):
    """CLM rescaled to the satellite fraction (reference 932-955)."""

    def _real(self, cosmo, r, M, a):
        r_use, M_use = _atleast_1d_pair(r, M)
        f_sga = self.get_f_star_sat(M_use, a, cosmo)[:, None]
        f_clm = 1 - _f_bar(cosmo) + f_sga
        return super()._real(cosmo, r_use, M_use, a) * (f_sga / f_clm)


class DarkMatterOnly(SchneiderProfiles):
    """NFW + TwoHalo (reference Schneider19.py:958-1033)."""

    def __init__(self, darkmatter=None, twohalo=None, **kwargs):
        self.DarkMatter = (darkmatter if darkmatter is not None
                           else DarkMatter(**kwargs))
        self.TwoHalo = twohalo if twohalo is not None else TwoHalo(**kwargs)
        super().__init__(**kwargs)

    def _real(self, cosmo, r, M, a):
        r_use, M_use = _atleast_1d_pair(r, M)
        return (self.DarkMatter._real(cosmo, r_use, M_use, a)
                + self.TwoHalo._real(cosmo, r_use, M_use, a))


class DarkMatterBaryon(SchneiderProfiles):
    """(CLM + Stars + Gas) * (M_DMO/M_DMB) + TwoHalo — mass-conserving
    one-halo rescaling (reference Schneider19.py:1036-1160)."""

    def __init__(self, gas=None, stars=None, collisionlessmatter=None,
                 darkmatter=None, twohalo=None, r_min_int=1e-5,
                 r_max_int=100, r_steps=500, **kwargs):
        self.Gas = gas if gas is not None else Gas(**kwargs)
        self.Stars = stars if stars is not None else Stars(**kwargs)
        self.TwoHalo = twohalo if twohalo is not None else TwoHalo(**kwargs)
        self.DarkMatter = (darkmatter if darkmatter is not None
                           else DarkMatter(**kwargs))
        self.CollisionlessMatter = (
            collisionlessmatter if collisionlessmatter is not None
            else CollisionlessMatter(**kwargs))
        super().__init__(**kwargs, r_min_int=r_min_int,
                         r_max_int=r_max_int, r_steps=r_steps)

    def _real(self, cosmo, r, M, a):
        r_use, M_use = _atleast_1d_pair(r, M)
        r_int = jnp.geomspace(self.r_min_int, self.r_max_int, self.r_steps)

        rho_dmo = self.DarkMatter._real(cosmo, r_int, M_use, a)
        M_tot = jnp.trapezoid(4 * jnp.pi * r_int ** 2 * rho_dmo, r_int,
                              axis=-1)

        clm_i = self.CollisionlessMatter._real(cosmo, r_int, M_use, a)
        str_i = self.Stars._real(cosmo, r_int, M_use, a)
        gas_i = self.Gas._real(cosmo, r_int, M_use, a)
        M_dmb = jnp.trapezoid(4 * jnp.pi * r_int ** 2
                              * (clm_i + str_i + gas_i), r_int, axis=-1)

        factor = (M_tot / M_dmb)[:, None]
        prof = (self.CollisionlessMatter._real(cosmo, r_use, M_use, a) * factor
                + self.Stars._real(cosmo, r_use, M_use, a) * factor
                + self.Gas._real(cosmo, r_use, M_use, a) * factor
                + self.TwoHalo._real(cosmo, r_use, M_use, a))
        return prof
