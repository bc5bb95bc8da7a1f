"""Stage-level timing of the stencil phase B at a given NSIDE.

The stencil's cost is halo-count independent (exclusion is geometric in
practice: hot tiles measured 0% even at 1e6-halo density), so a small
catalog warms the same phase-B kernels cheaply. Reports the two
dispatches separately: ``combo`` (hot-tile detect + 3x3 gather stencil
over all tiles) and ``finish`` (flat view + scatter complement over the
excluded tiles), warm (second of two runs), fully blocked.

Usage: python tools/stencil_bench.py [--nside 4096] [--halos 50000]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nside", type=int, default=4096)
    ap.add_argument("--halos", type=int, default=50_000)
    args = ap.parse_args()

    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(os.path.dirname(os.path.dirname(
                              os.path.abspath(__file__))), ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1.0)
    except Exception:
        pass
    import jax.numpy as jnp
    import baryonforge_tpu  # noqa: F401
    from baryonforge_tpu import Profiles, Runners, utils
    from baryonforge_tpu import cosmo as bcosmo
    from baryonforge_tpu.Profiles.BaryonCorrection import Baryonification2D

    nside, n_halos = args.nside, args.halos
    npix = 12 * nside * nside
    h = 0.7
    cd = dict(Omega_m=0.30, Omega_b=0.045, h=h, sigma8=0.8, n_s=0.96,
              w0=-1.0)
    cosmo = bcosmo.cosmology_from_dict(cd)
    bpar = dict(theta_ej=4, theta_co=0.1, M_c=1e14 / h, mu_beta=0.4,
                eta=0.3, eta_delta=0.3, tau=-1.5, tau_delta=0,
                A=0.09 / 2, M1=2.5e11 / h, epsilon_h=0.015,
                a=0.3, n=2, epsilon=4, p=0.3, q=0.707, gamma=2, delta=7)
    rng = np.random.default_rng(7)
    cat = utils.HaloLightConeCatalog(
        ra=rng.uniform(0, 360, n_halos),
        dec=np.degrees(np.arcsin(rng.uniform(-1, 1, n_halos))),
        M=10 ** rng.uniform(13.0, 14.8, n_halos),
        z=rng.uniform(0.8, 1.0, n_halos), cosmo=cd)
    shell = utils.LightconeShell(
        map=rng.exponential(1.0, npix).astype(np.float32), cosmo=cd)

    DMO = Profiles.DarkMatterOnly(**bpar, proj_cutoff=100)
    DMB = Profiles.DarkMatterBaryon(**bpar, proj_cutoff=100)
    model = Baryonification2D(DMO, DMB, cosmo, epsilon_max=20)
    model.load_table(os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "_northstar_table.npz"))

    runner = Runners.BaryonifyShell(cat, shell, epsilon_max=20,
                                    model=model, halo_batch=8192,
                                    verbose=False, n_size_buckets=8,
                                    regrid_dtype=jnp.float32)
    t0 = time.time()
    runner.process()
    print(f"# warmup: {time.time()-t0:.1f} s", file=sys.stderr)

    res = {"nside": nside, "n_halos": n_halos}
    times = runner.stencil_stage_times(nside, npix, jnp.float32)
    res.update(times)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
