"""Example: per-halo secondary properties through ParamTabulatedProfile
(reference example 17_Secondary_Properties).

Tabulates a profile over an extra ``epsilon`` axis and paints a shell where
each halo carries its own epsilon value — the runner reads the per-halo
column automatically via the model's ``p_keys``.

Run: python examples/09_secondary_properties.py
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), '..'))

import numpy as np

import baryonforge_tpu  # noqa: F401
from baryonforge_tpu import Profiles, Runners, utils
from baryonforge_tpu import cosmo as bcosmo


def main(nside=64, n_halos=300):
    h = 0.7
    cosmo_dict = dict(Omega_m=0.30, Omega_b=0.045, h=h, sigma8=0.8,
                      n_s=0.96, w0=-1.0)
    cosmo = bcosmo.cosmology_from_dict(cosmo_dict)
    bpar = dict(theta_ej=4, theta_co=0.1, M_c=1e14 / h, mu_beta=0.4,
                eta=0.3, eta_delta=0.3, tau=-1.5, tau_delta=0,
                A=0.09 / 2, M1=2.5e11 / h, epsilon_h=0.015,
                a=0.3, n=2, epsilon=4, p=0.3, q=0.707, gamma=2, delta=7)

    prof = Profiles.DarkMatter(**bpar, proj_cutoff=100)
    tab = utils.ParamTabulatedProfile(prof, cosmo)
    print("tabulating over (z, M, R, epsilon) ...")
    tab.setup_interpolator(z_min=0.1, z_max=0.5, N_samples_z=3,
                           M_min=1e13, M_max=1e15, N_samples_Mass=6,
                           R_min=1e-3, R_max=60, N_samples_R=48,
                           other_params={"epsilon":
                                         np.array([2.0, 4.0, 6.0])},
                           verbose=False)
    print("p_keys:", tab.p_keys)

    rng = np.random.default_rng(11)
    cat = utils.HaloLightConeCatalog(
        ra=rng.uniform(0, 360, n_halos),
        dec=np.degrees(np.arcsin(rng.uniform(-1, 1, n_halos))),
        M=10 ** rng.uniform(13.5, 14.5, n_halos),
        z=rng.uniform(0.15, 0.45, n_halos), cosmo=cosmo_dict,
        epsilon=rng.uniform(2.0, 6.0, n_halos))     # per-halo property
    npix = 12 * nside * nside
    shell = utils.LightconeShell(map=np.zeros(npix), cosmo=cosmo_dict)
    out = Runners.PaintProfilesShell(cat, shell, epsilon_max=5, model=tab,
                                     halo_batch=64, verbose=False).process()
    print(f"painted map: sum = {out.sum():.4e}, "
          f"nonzero pixels = {(out > 0).sum()}")

    # direct readout with explicit epsilon values
    r = np.geomspace(0.05, 5, 6)
    for eps in (2.0, 4.0, 6.0):
        v = np.asarray(tab.real(cosmo, r, 1e14, 0.8, epsilon=eps)).ravel()
        print(f"epsilon = {eps}: rho(0.5 Mpc) = {np.interp(0.5, r, v):.4e}")


if __name__ == "__main__":
    main()
