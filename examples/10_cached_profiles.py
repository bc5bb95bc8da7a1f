"""Example: profile evaluation caching
(reference example 20_Cached_Profiles_Speedup).

Wraps an expensive composed profile in CachedProfile and measures the
repeat-call speedup (the reference reports 1.65 s -> 223 us).

Run: python examples/10_cached_profiles.py
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), '..'))

import time
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
    prof = Profiles.DarkMatterBaryon(**bpar, proj_cutoff=100)
    cached = utils.CachedProfile(prof)

    R = np.geomspace(0.01, 30, 32)
    M = np.geomspace(1e13, 1e15, 8)

    t0 = time.time()
    a1 = np.asarray(cached.projected(cosmo, R, M, 0.8))
    t_cold = time.time() - t0
    t0 = time.time()
    a2 = np.asarray(cached.projected(cosmo, R, M, 0.8))
    t_hot = time.time() - t0
    assert np.array_equal(a1, a2)
    print(f"cold call: {t_cold:.3f} s   cached call: {t_hot * 1e3:.2f} ms "
          f"({t_cold / max(t_hot, 1e-9):.0f}x)")
    print("cache entries:", len(cached.cache))


if __name__ == "__main__":
    main()
