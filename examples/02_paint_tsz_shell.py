"""Example: paint a tSZ Compton-y map on a shell (reference example 05)."""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), '..'))

import sys
import time
import numpy as np

import baryonforge_tpu  # noqa: F401
from baryonforge_tpu import Profiles, Runners, utils
from baryonforge_tpu import cosmo as bcosmo
from baryonforge_tpu.Profiles import Thermodynamic


def main(nside=256, n_halos=2000):
    h = 0.7
    cosmo_dict = dict(Omega_m=0.30, Omega_b=0.045, h=h, sigma8=0.8,
                      n_s=0.96, w0=-1.0)
    cosmo = bcosmo.cosmology_from_dict(cosmo_dict)
    bpar = dict(theta_ej=4, theta_co=0.1, M_c=1e14 / h, mu_beta=0.4,
                eta=0.3, eta_delta=0.3, tau=-1.5, tau_delta=0,
                A=0.09 / 2, M1=2.5e11 / h, epsilon_h=0.015,
                a=0.3, n=2, epsilon=4, p=0.3, q=0.707, gamma=2, delta=7,
                alpha_nt=0.18, nu_nt=0.8, gamma_nt=0.8)

    rng = np.random.default_rng(2)
    cat = utils.HaloLightConeCatalog(
        ra=rng.uniform(0, 360, n_halos),
        dec=np.degrees(np.arcsin(rng.uniform(-1, 1, n_halos))),
        M=10 ** rng.uniform(13.5, 15.0, n_halos),
        z=rng.uniform(0.1, 0.5, n_halos), cosmo=cosmo_dict)
    npix = 12 * nside * nside
    shell = utils.LightconeShell(map=np.zeros(npix), cosmo=cosmo_dict)

    print("tabulating the tSZ profile ...")
    y_prof = Thermodynamic.ThermalSZ(**bpar, proj_cutoff=100)
    tab = utils.TabulatedProfile(y_prof, cosmo)
    tab.setup_interpolator(z_min=0.05, z_max=0.6, N_samples_z=8,
                           M_min=1e13, M_max=3e15, N_samples_Mass=16,
                           R_min=1e-3, R_max=60, N_samples_R=48,
                           verbose=False)

    runner = Runners.PaintProfilesShell(cat, shell, epsilon_max=5,
                                        model=tab)
    t0 = time.time()
    y_map = runner.process()
    print(f"painted {n_halos} halos in {time.time() - t0:.2f} s "
          "(incl. compile)")
    print(f"mean y = {y_map.mean():.3e}, max y = {y_map.max():.3e}")


if __name__ == "__main__":
    args = [int(x) for x in sys.argv[1:3]]
    main(*args)
