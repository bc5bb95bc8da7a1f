"""Delta-Cl from shell baryonification (reference
examples/09_Reproduce_Schneider_deltaCls.ipynb workflow).

Paints a DMO mass shell, baryonifies it with an S19 displacement table,
and computes the angular power-spectrum ratio with the built-in
spherical-harmonic transform (utils/sht.anafast — no healpy needed).

Run:  JAX_PLATFORMS=cpu python examples/15_delta_cl.py [NSIDE]
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), '..'))

import sys
import numpy as np

from baryonforge_tpu import Profiles, Runners, utils
from baryonforge_tpu import cosmo as bcosmo
from baryonforge_tpu.Profiles.BaryonCorrection import Baryonification2D
from baryonforge_tpu.utils import sht

NSIDE = int(sys.argv[1]) if len(sys.argv) > 1 else 64
NPIX = 12 * NSIDE * NSIDE
H = 0.7
CD = dict(Omega_m=0.30, Omega_b=0.045, h=H, sigma8=0.8, n_s=0.96, w0=-1.0)
COSMO = bcosmo.cosmology_from_dict(CD)
BPAR = dict(theta_ej=4, theta_co=0.1, M_c=1e14 / H, mu_beta=0.4,
            eta=0.3, eta_delta=0.3, tau=-1.5, tau_delta=0, A=0.09 / 2,
            M1=2.5e11 / H, epsilon_h=0.015, a=0.3, n=2, epsilon=4,
            p=0.3, q=0.707, gamma=2, delta=7)

rng = np.random.default_rng(1)
n = 150
cat = utils.HaloLightConeCatalog(
    ra=rng.uniform(0, 360, n),
    dec=np.degrees(np.arcsin(rng.uniform(-1, 1, n))),
    M=10 ** rng.uniform(14.0, 15.0, n),
    z=rng.uniform(0.08, 0.15, n), cosmo=CD)

tab = utils.TabulatedProfile(
    Profiles.DarkMatterOnly(**BPAR, proj_cutoff=100), COSMO)
tab.setup_interpolator(z_min=0.05, z_max=0.3, N_samples_z=3,
                       M_min=5e13, M_max=3e15, N_samples_Mass=8,
                       R_min=1e-3, R_max=60, N_samples_R=64, verbose=False)
zero = utils.LightconeShell(map=np.zeros(NPIX), cosmo=CD)
mass_map = Runners.PaintProfilesShell(
    cat, zero, epsilon_max=10, model=tab, include_pixel_size=True,
    halo_batch=64, verbose=False).process()
mass_map = mass_map + mass_map.mean()

DMO = Profiles.DarkMatterOnly(**BPAR, proj_cutoff=100)
DMB = Profiles.DarkMatterBaryon(**BPAR, proj_cutoff=100)
model = Baryonification2D(DMO, DMB, COSMO, epsilon_max=20)
model.setup_interpolator(z_min=0.05, z_max=0.3, N_samples_z=3,
                         M_min=5e13, M_max=3e15, N_samples_Mass=8,
                         R_min=1e-3, R_max=60, N_samples_R=64,
                         verbose=False)
shell = utils.LightconeShell(map=mass_map, cosmo=CD)
new_map = Runners.BaryonifyShell(cat, shell, epsilon_max=20, model=model,
                                 halo_batch=64, verbose=False).process()

lmax = 3 * NSIDE - 1
cl0 = sht.anafast(mass_map / mass_map.mean() - 1, lmax=lmax)
cl1 = sht.anafast(new_map / new_map.mean() - 1, lmax=lmax)
ell = np.arange(lmax + 1)
for lo, hi in [(2, 10), (10, 40), (40, 100), (100, lmax)]:
    m = (ell >= lo) & (ell <= hi)
    print(f"ell {lo:>3}-{hi:<3}:  Cl_DMB/Cl_DMO = "
          f"{np.mean(cl1[m] / np.maximum(cl0[m], 1e-300)):.4f}")
