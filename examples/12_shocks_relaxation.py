"""Example: shocked gas and adiabatic-relaxation knobs
(reference examples 06_Change_Adiabatic_Relaxation and 07_Shocks).

* ShockedGas applies a Rankine-Hugoniot suppression outside the shock
  radius epsilon_shock * R.
* CollisionlessMatter exposes the relaxation parameters (a, n) and accepts
  injected sub-profiles; changing them reshapes the relaxed matter.

Run: python examples/12_shocks_relaxation.py
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
    bpar = dict(theta_ej=4, theta_co=0.1, M_c=1e14 / h, mu_beta=0.4,
                eta=0.3, eta_delta=0.3, tau=-1.5, tau_delta=0,
                A=0.09 / 2, M1=2.5e11 / h, epsilon_h=0.015,
                a=0.3, n=2, epsilon=4, p=0.3, q=0.707, gamma=2, delta=7)
    r = np.geomspace(0.05, 10, 12)
    M, a = 1e14, 1 / 1.2

    gas = Profiles.Gas(**bpar)
    shocked = Profiles.ShockedGas(epsilon_shock=1.0, width_shock=0.1,
                                  **bpar)
    g = np.asarray(gas.real(cosmo, r, M, a)).ravel()
    s = np.asarray(shocked.real(cosmo, r, M, a)).ravel()
    print("   r [Mpc]   gas rho        shocked/gas")
    for i in range(len(r)):
        print(f"   {r[i]:7.3f}   {g[i]:.4e}   {s[i] / g[i]:.4f}")

    # relaxation knobs: a stronger response exponent moves more mass
    clm_fid = Profiles.CollisionlessMatter(**bpar)
    clm_hi = Profiles.CollisionlessMatter(**{**bpar, "a": 0.6, "n": 1})
    f = np.asarray(clm_fid.real(cosmo, r, M, a)).ravel()
    hgt = np.asarray(clm_hi.real(cosmo, r, M, a)).ravel()
    print("\nrelaxation (a=0.3,n=2) vs (a=0.6,n=1): "
          f"rho ratio at 0.1 Mpc = {np.interp(0.1, r, hgt / f):.4f}, "
          f"at 1 Mpc = {np.interp(1.0, r, hgt / f):.4f}")

    # sub-profile injection: zero out the stars
    clm_nostars = Profiles.CollisionlessMatter(
        darkmatter=Profiles.DarkMatter(**bpar),
        gas=Profiles.Gas(**bpar),
        stars=Profiles.Zeros(), **bpar)
    ns = np.asarray(clm_nostars.real(cosmo, r, M, a)).ravel()
    print("no-stars CLM core suppression:",
          f"{np.interp(0.1, r, ns / f):.4f}")


if __name__ == "__main__":
    main()
