"""Example: baryonify a particle snapshot (reference SnapshotRunner flow)."""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), '..'))

import sys
import time
import numpy as np

import baryonforge_tpu  # noqa: F401
from baryonforge_tpu import Profiles, utils
from baryonforge_tpu.Runners.SnapshotRunner import BaryonifySnapshot
from baryonforge_tpu.Profiles.BaryonCorrection import Baryonification3D


def main(n_part=200_000, n_halos=100, L=256.0):
    h = 0.7
    cosmo_dict = dict(Omega_m=0.30, Omega_b=0.045, h=h, sigma8=0.8,
                      n_s=0.96, w0=-1.0)
    from baryonforge_tpu import cosmo as bcosmo
    cosmo = bcosmo.cosmology_from_dict(cosmo_dict)
    bpar = dict(theta_ej=4, theta_co=0.1, M_c=1e14 / h, mu_beta=0.4,
                eta=0.3, eta_delta=0.3, tau=-1.5, tau_delta=0,
                A=0.09 / 2, M1=2.5e11 / h, epsilon_h=0.015,
                a=0.3, n=2, epsilon=4, p=0.3, q=0.707, gamma=2, delta=7)

    rng = np.random.default_rng(5)
    snap = utils.ParticleSnapshot(x=rng.uniform(0, L, n_part),
                                  y=rng.uniform(0, L, n_part),
                                  z=rng.uniform(0, L, n_part),
                                  M=np.ones(n_part), L=L,
                                  cosmo=cosmo_dict, redshift=0.2)
    cat = utils.HaloNDCatalog(x=rng.uniform(0, L, n_halos),
                              y=rng.uniform(0, L, n_halos),
                              z=rng.uniform(0, L, n_halos),
                              M=10 ** rng.uniform(13.5, 14.8, n_halos),
                              redshift=0.2, cosmo=cosmo_dict)

    print("building the displacement model ...")
    DMO = Profiles.DarkMatterOnly(**bpar)
    DMB = Profiles.DarkMatterBaryon(**bpar)
    model = Baryonification3D(DMO, DMB, cosmo, epsilon_max=20)
    model.setup_interpolator(z_min=0.1, z_max=0.3, N_samples_z=3,
                             M_min=5e12, M_max=2e15, N_samples_Mass=12,
                             verbose=False)

    runner = BaryonifySnapshot(cat, snap, epsilon_max=20, model=model)
    t0 = time.time()
    new_cat = runner.process()
    dt = time.time() - t0
    moved = np.abs(new_cat["x"] - snap.cat["x"])
    moved = np.minimum(moved, L - moved)
    print(f"displaced {np.sum(moved > 0)} / {n_part} particles around "
          f"{n_halos} halos in {dt:.2f} s (incl. compile)")
    print(f"max displacement: {moved.max():.3f} Mpc")


if __name__ == "__main__":
    main(*[int(float(x)) for x in sys.argv[1:3]])
