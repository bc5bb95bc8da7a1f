"""Example: baryonify a HEALPix lightcone shell (reference example 04).

Builds a synthetic halo catalog + mass shell, a Schneider+19 DMO/DMB model
pair, the 2D displacement table, and runs BaryonifyShell.

Run: python examples/01_baryonify_shell.py [nside] [n_halos]
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), '..'))

import sys
import time
import numpy as np

import baryonforge_tpu  # noqa: F401
from baryonforge_tpu import Profiles, Runners, utils
from baryonforge_tpu import cosmo as bcosmo
from baryonforge_tpu.Profiles.BaryonCorrection import Baryonification2D


def main(nside=256, n_halos=2000):
    h = 0.7
    cosmo_dict = dict(Omega_m=0.30, Omega_b=0.045, h=h, sigma8=0.8,
                      n_s=0.96, w0=-1.0)
    cosmo = bcosmo.cosmology_from_dict(cosmo_dict)
    bpar = dict(theta_ej=4, theta_co=0.1, M_c=1e14 / h, mu_beta=0.4,
                eta=0.3, eta_delta=0.3, tau=-1.5, tau_delta=0,
                A=0.09 / 2, M1=2.5e11 / h, epsilon_h=0.015,
                a=0.3, n=2, epsilon=4, p=0.3, q=0.707, gamma=2, delta=7)

    rng = np.random.default_rng(1)
    cat = utils.HaloLightConeCatalog(
        ra=rng.uniform(0, 360, n_halos),
        dec=np.degrees(np.arcsin(rng.uniform(-1, 1, n_halos))),
        M=10 ** rng.uniform(13.0, 14.8, n_halos),
        z=rng.uniform(0.1, 0.5, n_halos), cosmo=cosmo_dict)
    npix = 12 * nside * nside
    shell = utils.LightconeShell(map=rng.exponential(1.0, npix),
                                 cosmo=cosmo_dict)

    print("building displacement table ...")
    DMO = Profiles.DarkMatterOnly(**bpar, proj_cutoff=100)
    DMB = Profiles.DarkMatterBaryon(**bpar, proj_cutoff=100)
    model = Baryonification2D(DMO, DMB, cosmo, epsilon_max=20)
    model.setup_interpolator(z_min=0.05, z_max=0.6, N_samples_z=8,
                             M_min=5e12, M_max=2e15, N_samples_Mass=20,
                             R_min=1e-3, R_max=60, N_samples_R=64,
                             verbose=False)

    runner = Runners.BaryonifyShell(cat, shell, epsilon_max=20, model=model)
    t0 = time.time()
    new_map = runner.process()
    print(f"baryonified {n_halos} halos on NSIDE={nside} shell "
          f"in {time.time() - t0:.2f} s (incl. compile)")
    print("mass conserved:",
          np.isclose(new_map.sum(), shell.map.sum()))
    print("rms map change:",
          float(np.sqrt(np.mean((new_map - shell.map) ** 2))))


if __name__ == "__main__":
    args = [int(x) for x in sys.argv[1:3]]
    main(*args)
