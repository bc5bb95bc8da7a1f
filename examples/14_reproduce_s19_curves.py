"""Reproduce the Schneider+19 Fig. 1 profile curves against digitized
plot data (reference examples/08_Reproduce_Schneider19.ipynb).

Evaluates the S19 gas / stars / two-halo / DMO / DMB profiles with the
paper's parameter choices and compares them to the plot points scraped
from the published figure (tests/data/S19_Fig1_Scrapped.csv). Prints the
median dex deviation per curve; see tests/test_s19_published_curves.py
for the CI-enforced tolerances (0.03-0.15 dex).

Run:  JAX_PLATFORMS=cpu python examples/14_reproduce_s19_curves.py
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), '..'))

import os
import numpy as np

from baryonforge_tpu import Profiles
from baryonforge_tpu import cosmo as bcosmo

H = 0.67
COSMO = bcosmo.Cosmology(Omega_m=0.32, Omega_b=0.048, h=H,
                         sigma8=0.83, n_s=0.96, w0=-1.0)
BPAR = dict(theta_ej=4, theta_co=0.1, mu_beta=1, eta=0.3, eta_delta=0.3,
            tau=0, tau_delta=0, A=0.09 / 2, M1=2.5e11 / H,
            epsilon_h=0.015, a=0.3, n=2, epsilon=4, p=0.3, q=0.707,
            cdelta=6.71, gamma=2, delta=7)
M14 = 1e14 / H

DATA = os.path.join(os.path.dirname(__file__), "..", "tests", "data",
                    "S19_Fig1_Scrapped.csv")
names = []
for i in ["STAR", "GAS1", "GAS2", "GAS3", "2HALO", "TOTAL", "R200",
          "DMO", "DMB1", "DMB2", "DMB3"]:
    names += [i + "_X", i + "_Y"]
S19 = np.genfromtxt(DATA, delimiter=",", skip_header=2, names=names)

R = np.geomspace(1e-3, 50, 400)

# (label, profile, CSV key, weight) — note GAS1/GAS3 and DMB1/DMB3 are
# swapped in the digitized file relative to the notebook legend
CURVES = [
    ("Gas beta=0", Profiles.Gas(M_c=np.inf, **BPAR), "GAS3", 1),
    ("Gas beta=1.5", Profiles.Gas(M_c=1e14 / H, **BPAR), "GAS2", 1),
    ("Gas beta=3", Profiles.Gas(M_c=1e-10, **BPAR), "GAS1", 1),
    ("Stars", Profiles.Stars(**BPAR), "STAR", 1),
    ("TwoHalo", Profiles.TwoHalo(**BPAR), "2HALO", 1),
    ("DMO", Profiles.DarkMatterOnly(**BPAR), "DMO", R ** 2),
    ("DMB beta=0", Profiles.DarkMatterBaryon(M_c=np.inf, **BPAR),
     "DMB3", R ** 2),
    ("DMB beta=1.5", Profiles.DarkMatterBaryon(M_c=1e14 / H, **BPAR),
     "DMB2", R ** 2),
    ("DMB beta=3", Profiles.DarkMatterBaryon(M_c=1e-10, **BPAR),
     "DMB1", R ** 2),
]

print(f"{'curve':<14} {'median |dlog10|':>16}  n_pts")
for label, prof, key, w in CURVES:
    rho = np.asarray(prof.real(COSMO, R, M14, 1.0))
    y_model = rho * w / (1.0 if np.ndim(w) else H ** 2)
    if np.ndim(w) == 0:                     # left panel: rho / h^2
        y_model = rho / H ** 2
    x, y = S19[key + "_X"], S19[key + "_Y"]
    good = np.isfinite(x) & np.isfinite(y)
    x, y = x[good], y[good]
    ly = np.interp(np.log(x), np.log(R * H), np.log(np.maximum(y_model,
                                                               1e-300)))
    dev = np.median(np.abs(ly - np.log(y))) / np.log(10.0)
    print(f"{label:<14} {dev:16.3f}  {good.sum():5d}")
