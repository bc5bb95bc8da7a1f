"""Example: baryonify a 3D grid and measure Delta P(k)
(reference examples 10/12 reproduce published suppression curves)."""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), '..'))

import sys
import time
import numpy as np

import baryonforge_tpu  # noqa: F401
from baryonforge_tpu import Profiles, utils
from baryonforge_tpu.Runners.Map2DRunner import (BaryonifyGrid,
                                                 PaintProfilesGrid)
from baryonforge_tpu.Profiles.BaryonCorrection import Baryonification3D


def main(N=128, L=256.0, n_halos=300):
    h = 0.7
    cosmo_dict = dict(Omega_m=0.30, Omega_b=0.045, h=h, sigma8=0.8,
                      n_s=0.96, w0=-1.0)
    from baryonforge_tpu import cosmo as bcosmo
    cosmo = bcosmo.cosmology_from_dict(cosmo_dict)
    bpar = dict(theta_ej=4, theta_co=0.1, M_c=1e14 / h, mu_beta=0.4,
                eta=0.3, eta_delta=0.3, tau=-1.5, tau_delta=0,
                A=0.09 / 2, M1=2.5e11 / h, epsilon_h=0.015,
                a=0.3, n=2, epsilon=4, p=0.3, q=0.707, gamma=2, delta=7)

    rng = np.random.default_rng(4)
    bins = (np.arange(N) + 0.5) * (L / N)
    cat = utils.HaloNDCatalog(x=rng.uniform(0, L, n_halos),
                              y=rng.uniform(0, L, n_halos),
                              z=rng.uniform(0, L, n_halos),
                              M=10 ** rng.uniform(13.0, 14.8, n_halos),
                              redshift=0.2, cosmo=cosmo_dict)

    print("painting the DMO mass field ...")
    dmo_tab = utils.TabulatedProfile(Profiles.DarkMatter(**bpar), cosmo)
    dmo_tab.setup_interpolator(z_min=0.1, z_max=0.3, N_samples_z=3,
                               M_min=5e12, M_max=2e15, N_samples_Mass=12,
                               verbose=False)
    gm0 = utils.GriddedMap(map=np.zeros((N, N, N)), bins=bins,
                           cosmo=cosmo_dict, redshift=0.2)
    mass_map = PaintProfilesGrid(cat, gm0, epsilon_max=10, model=dmo_tab,
                                 include_pixel_size=True).process()
    mass_map = mass_map + mass_map.mean()

    print("building the 3D displacement model ...")
    DMO = Profiles.DarkMatterOnly(**bpar)
    DMB = Profiles.DarkMatterBaryon(**bpar)
    model = Baryonification3D(DMO, DMB, cosmo, epsilon_max=20)
    model.setup_interpolator(z_min=0.1, z_max=0.3, N_samples_z=3,
                             M_min=5e12, M_max=2e15, N_samples_Mass=12,
                             verbose=False)

    gm = utils.GriddedMap(map=mass_map, bins=bins, cosmo=cosmo_dict,
                          redshift=0.2)
    t0 = time.time()
    new_map = BaryonifyGrid(cat, gm, epsilon_max=20, model=model).process()
    print(f"baryonified {n_halos} halos on a {N}^3 grid in "
          f"{time.time() - t0:.2f} s (incl. compile)")

    # P(k) ratio
    def pk(field):
        delta = field / field.mean() - 1
        fk = np.fft.rfftn(delta)
        p3 = np.abs(fk) ** 2
        kf = 2 * np.pi / L
        kx = np.fft.fftfreq(N, 1.0 / N) * kf
        kz = np.fft.rfftfreq(N, 1.0 / N) * kf
        kk = np.sqrt(kx[:, None, None] ** 2 + kx[None, :, None] ** 2
                     + kz[None, None, :] ** 2)
        b = np.arange(0.5, N // 2) * kf
        w = np.digitize(kk.ravel(), b)
        c = np.bincount(w, minlength=b.size + 1)
        s = np.bincount(w, weights=p3.ravel(), minlength=b.size + 1)
        ctr = np.concatenate([[0], b]) + kf / 2
        g = c > 0
        return ctr[g], (s / np.maximum(c, 1))[g]

    k0, p0 = pk(mass_map)
    k1, p1 = pk(new_map)
    print("k [1/Mpc]   P_baryonified / P_DMO")
    for i in range(0, len(k0), max(1, len(k0) // 12)):
        print(f"  {k0[i]:7.3f}    {p1[i] / p0[i]:.4f}")


if __name__ == "__main__":
    main(*[int(float(x)) for x in sys.argv[1:2]])
