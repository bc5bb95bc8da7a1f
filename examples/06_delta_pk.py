"""Example: Delta P(k) from 3D-grid baryonification
(reference examples 10_Reproduce_Schneider_deltaPk and
12_Reproduce_Arico_deltaPk).

Paints a DMO mass field onto a periodic cubic grid, baryonifies it with an
S19 displacement table, and prints the P(k) suppression ratio.

Run: python examples/06_delta_pk.py [N_grid] [n_halos]
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), '..'))

import sys
import numpy as np

import baryonforge_tpu  # noqa: F401
from baryonforge_tpu import Profiles, utils
from baryonforge_tpu import cosmo as bcosmo
from baryonforge_tpu.Runners.Map2DRunner import (BaryonifyGrid,
                                                 PaintProfilesGrid)
from baryonforge_tpu.Profiles.BaryonCorrection import Baryonification3D


def pk_3d(field, L):
    N = field.shape[0]
    delta = field / field.mean() - 1.0
    fk = np.fft.rfftn(delta) * (L / N) ** 3
    pk3 = np.abs(fk) ** 2 / L ** 3
    kf = 2 * np.pi / L
    kx = np.fft.fftfreq(N, 1.0 / N) * kf
    kz = np.fft.rfftfreq(N, 1.0 / N) * kf
    kk = np.sqrt(kx[:, None, None] ** 2 + kx[None, :, None] ** 2
                 + kz[None, None, :] ** 2)
    bins = np.arange(0.5, N // 2) * kf
    which = np.digitize(kk.ravel(), bins)
    counts = np.bincount(which, minlength=bins.size + 1)
    sums = np.bincount(which, weights=pk3.ravel(), minlength=bins.size + 1)
    centers = np.concatenate([[0], bins]) + kf / 2
    good = counts > 0
    return centers[good], (sums / np.maximum(counts, 1))[good]


def main(N=64, n_halos=120):
    h = 0.7
    L = 128.0
    cosmo_dict = dict(Omega_m=0.30, Omega_b=0.045, h=h, sigma8=0.8,
                      n_s=0.96, w0=-1.0)
    cosmo = bcosmo.cosmology_from_dict(cosmo_dict)
    bpar = dict(theta_ej=4, theta_co=0.1, M_c=1e14 / h, mu_beta=0.4,
                eta=0.3, eta_delta=0.3, tau=-1.5, tau_delta=0,
                A=0.09 / 2, M1=2.5e11 / h, epsilon_h=0.015,
                a=0.3, n=2, epsilon=4, p=0.3, q=0.707, gamma=2, delta=7)
    rng = np.random.default_rng(3)
    bins = (np.arange(N) + 0.5) * (L / N)
    cat = utils.HaloNDCatalog(x=rng.uniform(0, L, n_halos),
                              y=rng.uniform(0, L, n_halos),
                              z=rng.uniform(0, L, n_halos),
                              M=10 ** rng.uniform(13.5, 14.8, n_halos),
                              redshift=0.2, cosmo=cosmo_dict)

    print("painting DMO field ...")
    dmo_tab = utils.TabulatedProfile(Profiles.DarkMatter(**bpar), cosmo)
    dmo_tab.setup_interpolator(z_min=0.1, z_max=0.3, N_samples_z=2,
                               M_min=1e13, M_max=1e15, N_samples_Mass=8,
                               R_min=1e-3, R_max=60, N_samples_R=64,
                               verbose=False)
    gm0 = utils.GriddedMap(map=np.zeros((N, N, N)), bins=bins,
                           cosmo=cosmo_dict, redshift=0.2)
    dmo_map = PaintProfilesGrid(cat, gm0, epsilon_max=10, model=dmo_tab,
                                verbose=False).process()
    dmo_map = np.asarray(dmo_map) + dmo_map.mean() * 0.1  # background floor

    print("building displacement table ...")
    DMO = Profiles.DarkMatterOnly(**bpar)
    DMB = Profiles.DarkMatterBaryon(**bpar)
    model = Baryonification3D(DMO, DMB, cosmo, epsilon_max=20)
    model.setup_interpolator(z_min=0.1, z_max=0.3, N_samples_z=2,
                             M_min=1e13, M_max=3e15, N_samples_Mass=8,
                             R_min=1e-3, R_max=50, N_samples_R=48,
                             verbose=False)

    print("baryonifying grid ...")
    gm = utils.GriddedMap(map=dmo_map, bins=bins, cosmo=cosmo_dict,
                          redshift=0.2)
    dmb_map = BaryonifyGrid(cat, gm, epsilon_max=20, model=model,
                            verbose=False).process()

    k0, p0 = pk_3d(dmo_map, L)
    k1, p1 = pk_3d(np.asarray(dmb_map), L)
    print("\n   k [1/Mpc]   P_DMB/P_DMO")
    for i in range(0, len(k0), max(1, len(k0) // 12)):
        print(f"   {k0[i]:9.3f}   {p1[i] / p0[i]:.4f}")
    print("\nmass conserved:",
          np.isclose(dmb_map.sum(), dmo_map.sum(), rtol=1e-8))


if __name__ == "__main__":
    args = [int(x) for x in sys.argv[1:3]]
    main(*args)
