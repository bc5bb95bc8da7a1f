"""Example: evaluate and compare the four baryonification model families
(reference examples 01, 11, 13, 15: Plot_Profiles*).

Prints component densities rho(r) for Schneider+19, Arico+20, Mead+20 (HMx)
and Schneider+25 at a fixed halo mass, plus the baryon fraction budget
(reference example 18_BaryonFractions).

Run: python examples/05_profile_gallery.py
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), '..'))

import numpy as np

import baryonforge_tpu  # noqa: F401
from baryonforge_tpu import Profiles
from baryonforge_tpu import cosmo as bcosmo


def main():
    h = 0.7
    cosmo = bcosmo.Cosmology(Omega_m=0.30, Omega_b=0.045, h=h, sigma8=0.8,
                             n_s=0.96, w0=-1.0)
    r = np.geomspace(0.01, 10, 12)
    M, a = 1e14, 1.0 / 1.3

    s19 = dict(theta_ej=4, theta_co=0.1, M_c=1e14 / h, mu_beta=0.4,
               eta=0.3, eta_delta=0.3, tau=-1.5, tau_delta=0,
               A=0.09 / 2, M1=2.5e11 / h, epsilon_h=0.015,
               a=0.3, n=2, epsilon=4, p=0.3, q=0.707, gamma=2, delta=7)
    # Arico+20 fiducial (reference examples/11)
    a20 = dict(cdelta=4, alpha_g=2, epsilon_h=0.015, M1_0=2.2e11 / h,
               alpha_fsat=1, M1_fsat=1, delta_fsat=1, gamma_fsat=1,
               eps_fsat=1, M_c=1.2e14 / h, eta=0.6, mu=0.31, beta=0.6,
               epsilon_hydro=np.sqrt(5), M_inn=3.3e13 / h, M_r=1e16,
               beta_r=2, theta_inn=0.1, theta_out=3, theta_rg=0.3,
               sigma_rg=0.1, a=0.3, n=2, p=0.3, q=0.707,
               A_nt=0.495, alpha_nt=0.1, mean_molecular_weight=0.59)
    fams = {
        "S19.DarkMatter": Profiles.DarkMatter(**s19),
        "S19.Gas": Profiles.Gas(**s19),
        "S19.Stars": Profiles.Stars(**s19),
        "S19.CollisionlessMatter": Profiles.CollisionlessMatter(**s19),
        "A20.BoundGas": Profiles.Arico20.BoundGas(**a20),
        "A20.EjectedGas": Profiles.Arico20.EjectedGas(**a20),
        "M20.BoundGas": Profiles.Mead20.BoundGas(
            **Profiles.Mead20.Params_TAGN_7p8_All),
        "S25.HotGas": Profiles.Schneider25.HotGas(
            # Schneider+25 fiducials (reference examples/15)
            epsilon0=4, epsilon1=0.5, alpha_excl=0.4, p=0.3, q=0.707,
            M_c=1e15, mu=0.8, q0=0.075, q1=0.25, q2=0.7, nu_q0=0,
            nu_q1=1, nu_q2=0, nstep=1.5, theta_c=0.3, nu_theta_c=0.5,
            c_iga=0.1, nu_c_iga=1.5, r_min_iga=1e-3, alpha=1, gamma=1.5,
            delta=7, tau=-1.376, tau_delta=0, Mstar=3e11, Nstar=0.03,
            eta=0.1, eta_delta=0.22, epsilon_cga=0.03),
    }
    for name, prof in fams.items():
        rho = np.asarray(prof.real(cosmo, r, M, a)).ravel()
        print(f"{name:28s} rho(0.1 Mpc) = {np.interp(0.1, r, rho):.3e} "
              f"rho(1 Mpc) = {np.interp(1.0, r, rho):.3e}")

    # baryon budget: star/gas fractions vs mass (S19 parameterization)
    prof = Profiles.Gas(**s19)
    Ms = np.geomspace(1e12, 1e15, 7)
    fstar, fcga = prof._get_star_frac(Ms, 1 / (1 + 0.3), cosmo)[:2]
    fgas = prof._get_gas_frac(Ms, 1 / (1 + 0.3), cosmo)
    fbar = cosmo.Omega_b / cosmo.Omega_m
    print("\nM [Msun]    f_star    f_cga     f_gas     (f_bar=%.4f)" % fbar)
    for m, fs, fc, fg in zip(Ms, np.ravel(fstar), np.ravel(fcga),
                             np.ravel(fgas)):
        print(f"{m:9.2e}  {fs:.5f}  {fc:.5f}  {fg:.5f}")


if __name__ == "__main__":
    main()
