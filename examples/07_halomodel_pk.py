"""Example: halo-model power spectrum with flexible mass normalization
(reference example 14_HaloModel_Pk).

Computes P(k) through the in-repo halo model (Sheth-Tormen or Tinker08 mass
function + ST bias + truncated NFW profile), including the
``FlexibleHMCalculator`` counter-term treatment for profiles whose total
mass differs from the mass-definition mass.

Run: python examples/07_halomodel_pk.py
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), '..'))

import numpy as np

import baryonforge_tpu  # noqa: F401
from baryonforge_tpu import Profiles
from baryonforge_tpu import cosmo as bcosmo
from baryonforge_tpu.utils.halomodel import (FlexibleHMCalculator,
                                             MassFuncShethTormen,
                                             HaloBiasShethTormen,
                                             halomodel_power)


def main():
    h = 0.7
    cosmo = bcosmo.Cosmology(Omega_m=0.30, Omega_b=0.045, h=h, sigma8=0.8,
                             n_s=0.96, w0=-1.0)
    bpar = dict(theta_ej=4, theta_co=0.1, M_c=1e14 / h, mu_beta=0.4,
                eta=0.3, eta_delta=0.3, tau=-1.5, tau_delta=0,
                A=0.09 / 2, M1=2.5e11 / h, epsilon_h=0.015,
                a=0.3, n=2, epsilon=4, p=0.3, q=0.707, gamma=2, delta=7)

    prof_dmo = Profiles.DarkMatter(**bpar)
    prof_dmb = (Profiles.CollisionlessMatter(**bpar)
                + Profiles.Stars(**bpar) + Profiles.Gas(**bpar))

    calc = FlexibleHMCalculator(mass_function=MassFuncShethTormen(),
                                halo_bias=HaloBiasShethTormen(),
                                log10M_min=10.0, log10M_max=16.0,
                                nM=64)
    k = np.geomspace(0.05, 20.0, 24)
    a = 1.0
    pk_dmo = np.asarray(halomodel_power(cosmo, k, a, prof_dmo, calc))
    pk_dmb = np.asarray(halomodel_power(cosmo, k, a, prof_dmb, calc))

    print("   k [1/Mpc]   P_DMO          P_DMB/P_DMO")
    for i in range(len(k)):
        print(f"   {k[i]:9.3f}   {pk_dmo[i]:.5e}   "
              f"{pk_dmb[i] / pk_dmo[i]:.4f}")


if __name__ == "__main__":
    main()
