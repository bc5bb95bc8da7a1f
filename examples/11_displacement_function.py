"""Example: the baryonification displacement function d(r; M, z)
(reference example 02_Displacement_function).

Builds the 3D enclosed-mass displacement table for an S19 DMO/DMB pair and
prints d(r) for several halo masses, plus the shock test: ejecting more gas
(larger theta_ej) moves mass further out.

Run: python examples/11_displacement_function.py
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), '..'))

import numpy as np

import baryonforge_tpu  # noqa: F401
from baryonforge_tpu import Profiles
from baryonforge_tpu import cosmo as bcosmo
from baryonforge_tpu.Profiles.BaryonCorrection import Baryonification3D


def make_model(cosmo, bpar):
    DMO = Profiles.DarkMatterOnly(**bpar)
    DMB = Profiles.DarkMatterBaryon(**bpar)
    model = Baryonification3D(DMO, DMB, cosmo, epsilon_max=20)
    model.setup_interpolator(z_min=0.05, z_max=0.4, N_samples_z=2,
                             M_min=1e13, M_max=3e15, N_samples_Mass=8,
                             R_min=1e-3, R_max=50, N_samples_R=48,
                             verbose=False)
    return model


def main():
    h = 0.7
    cosmo = bcosmo.Cosmology(Omega_m=0.30, Omega_b=0.045, h=h, sigma8=0.8,
                             n_s=0.96, w0=-1.0)
    bpar = dict(theta_ej=4, theta_co=0.1, M_c=1e14 / h, mu_beta=0.4,
                eta=0.3, eta_delta=0.3, tau=-1.5, tau_delta=0,
                A=0.09 / 2, M1=2.5e11 / h, epsilon_h=0.015,
                a=0.3, n=2, epsilon=4, p=0.3, q=0.707, gamma=2, delta=7)

    print("building displacement tables ...")
    model = make_model(cosmo, bpar)
    model_ej = make_model(cosmo, {**bpar, "theta_ej": 8})

    r = np.geomspace(0.05, 20, 10)
    a = 1 / 1.2
    print("\n   r [Mpc]    d(r) M=1e13     d(r) M=1e14     d(r) M=1e15")
    for ri in r:
        d = [float(np.asarray(model.displacement(ri, M, a)))
             for M in (1e13, 1e14, 1e15)]
        print(f"   {ri:7.3f}   {d[0]:+.6f}      {d[1]:+.6f}      "
              f"{d[2]:+.6f}")

    d1 = np.asarray(model.displacement(r, 1e14, a))
    d2 = np.asarray(model_ej.displacement(r, 1e14, a))
    print("\nmax |d| fiducial: %.4f Mpc, theta_ej x2: %.4f Mpc"
          % (np.abs(d1).max(), np.abs(d2).max()))


if __name__ == "__main__":
    main()
