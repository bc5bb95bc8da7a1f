"""Example: pixel-window convolution of profiles
(reference example 03_Pixel_Smoothing).

Convolves an S19 DarkMatter profile with a HEALPix beam and a square grid
pixel via the FFTLog round trip, and prints the core suppression.

Run: python examples/08_pixel_smoothing.py
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), '..'))

import numpy as np

import baryonforge_tpu  # noqa: F401
from baryonforge_tpu import Profiles, utils
from baryonforge_tpu import cosmo as bcosmo


def main():
    h = 0.7
    cosmo = bcosmo.Cosmology(Omega_m=0.30, Omega_b=0.045, h=h, sigma8=0.8,
                             n_s=0.96, w0=-1.0)
    bpar = dict(theta_ej=4, theta_co=0.1, M_c=1e14 / h, mu_beta=0.4,
                eta=0.3, eta_delta=0.3, tau=-1.5, tau_delta=0,
                A=0.09 / 2, M1=2.5e11 / h, epsilon_h=0.015,
                a=0.3, n=2, epsilon=4, p=0.3, q=0.707, gamma=2, delta=7)
    dm = Profiles.DarkMatter(**bpar, proj_cutoff=100)
    R = np.geomspace(0.02, 10, 16)
    M, a = 1e14, 1 / 1.25

    raw = np.asarray(dm.projected(cosmo, R, M, a)).ravel()
    for name, px in [("NoPix", utils.NoPix()),
                     ("GridPixelApprox(0.5 Mpc)",
                      utils.GridPixelApprox(size=0.5)),
                     ("HealPixel(NSIDE=1024)",
                      utils.HealPixel(NSIDE=1024))]:
        conv = utils.ConvolvedProfile(dm, px)
        out = np.asarray(conv.projected(cosmo, R, M, a)).ravel()
        print(f"{name:26s} Sigma(R_min)/raw = {out[0] / raw[0]:8.4f}   "
              f"Sigma(5 Mpc)/raw = "
              f"{np.interp(5, R, out) / np.interp(5, R, raw):8.4f}")


if __name__ == "__main__":
    main()
