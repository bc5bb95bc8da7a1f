"""Shared test fixtures: cosmology + canonical parameter dicts.

Same canonical parameter values as the reference test suite
(reference tests/defaults.py) so behavior is comparable model-for-model.
"""

import numpy as np
from baryonforge_tpu import cosmo as bcosmo

h = 0.7
COSMO = bcosmo.Cosmology(Omega_m=0.30, Omega_b=0.04, h=h,
                         sigma8=0.8, n_s=0.96, w0=-1.0)
COSMO_DICT = dict(Omega_m=0.30, Omega_b=0.04, h=h, sigma8=0.8,
                  n_s=0.96, w0=-1.0)

bpar_S19 = dict(theta_ej=4, theta_co=0.1, M_c=1e14 / h, mu_beta=0.4,
                eta=0.3, eta_delta=0.3, tau=-1.5, tau_delta=0,
                A=0.09 / 2, M1=2.5e11 / h, epsilon_h=0.015,
                a=0.3, n=2, epsilon=4, p=0.3, q=0.707, gamma=2, delta=7)

bpar_S25 = dict(epsilon0=4, epsilon1=0.5, alpha_excl=0.4, p=0.3, q=0.707,
                M_c=1e15, mu=0.8,
                q0=0.075, q1=0.25, q2=0.7, nu_q0=0, nu_q1=1, nu_q2=0,
                nstep=3 / 2,
                theta_c=0.3, nu_theta_c=1 / 2, c_iga=0.1, nu_c_iga=3 / 2,
                r_min_iga=1e-3, alpha=1, gamma=3 / 2, delta=7,
                tau=-1.376, tau_delta=0, Mstar=3e11, Nstar=0.03,
                eta=0.1, eta_delta=0.22, epsilon_cga=0.03,
                alpha_nt=0.1, nu_nt=0.5, gamma_nt=0.8,
                mean_molecular_weight=0.6125)

bpar_A20 = dict(alpha_g=2, epsilon_h=0.015, M1_0=2.2e11 / h,
                alpha_fsat=1, M1_fsat=1, delta_fsat=1, gamma_fsat=1,
                eps_fsat=1,
                M_c=1.2e14 / h, eta=0.6, mu=0.31, beta=0.6,
                epsilon_hydro=np.sqrt(5),
                M_inn=3.3e13 / h, M_r=1e16, beta_r=2, theta_inn=0.1,
                theta_out=3,
                theta_rg=0.3, sigma_rg=0.1, a=0.3, n=2, p=0.3, q=0.707,
                A_nt=0.495, alpha_nt=0.1,
                mean_molecular_weight=0.59)


# ---------------------------------------------------------------------
# Session-scoped memo for expensive displacement/profile table builds.
# The dominant test-suite cost is repeated setup_interpolator runs with
# identical parameters across modules; identical builds dedup within one
# pytest process. Key must uniquely identify the build (family, params,
# grids) — when in doubt, don't share.
# ---------------------------------------------------------------------
_TABLE_MEMO = {}


def memo_table(key, builder):
    if key not in _TABLE_MEMO:
        _TABLE_MEMO[key] = builder()
    return _TABLE_MEMO[key]
