"""Faithful host-side emulation of the reference snapshot runner.

The reference (BaryonForge Runners/SnapshotRunner.py:176-275) loops
halos on the host: cKDTree.query_ball_point per halo, numpy vector math
on the neighbour set, and a per-halo displacement-interpolator call.
Its hard dependencies (pyccl, numba) are absent here, so this tool
re-creates that exact loop with scipy's cKDTree and np.interp over
PRE-computed per-halo displacement curves — strictly cheaper than the
reference's own per-halo interpolator call, so the number it prints is
a CONSERVATIVE (favourable-to-the-reference) baseline for
tools/snapshot_bench.py's measurement of our bucketed device runner.

Same catalog/snapshot construction as snapshot_bench.py (seed 11).
Times a subset of halos and extrapolates linearly (the loop is
embarrassingly per-halo).

Usage: python tools/snapshot_ref_baseline.py [--parts 1000000]
           [--halos 20000] [--sample 1000]
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
    ap.add_argument("--parts", type=int, default=1_000_000)
    ap.add_argument("--halos", type=int, default=20_000)
    ap.add_argument("--L", type=float, default=512.0)
    ap.add_argument("--sample", type=int, default=1000)
    args = ap.parse_args()

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    from scipy.spatial import cKDTree

    from baryonforge_tpu import Profiles, utils
    from baryonforge_tpu import cosmo as bcosmo
    from baryonforge_tpu.Profiles.BaryonCorrection import Baryonification3D
    from baryonforge_tpu.Runners.SnapshotRunner import BaryonifySnapshot

    h = 0.7
    cd = dict(Omega_m=0.30, Omega_b=0.045, h=h, sigma8=0.8,
              n_s=0.96, w0=-1.0)
    cosmo = bcosmo.cosmology_from_dict(cd)
    bpar = dict(theta_ej=4, theta_co=0.1, M_c=1e14 / h, mu_beta=0.4,
                eta=0.3, eta_delta=0.3, tau=-1.5, tau_delta=0,
                A=0.09 / 2, M1=2.5e11 / h, epsilon_h=0.015,
                a=0.3, n=2, epsilon=4, p=0.3, q=0.707, gamma=2, delta=7)

    rng = np.random.default_rng(11)
    L = args.L
    px = rng.uniform(0, L, args.parts)
    py = rng.uniform(0, L, args.parts)
    pz = rng.uniform(0, L, args.parts)
    hx = rng.uniform(0, L, args.halos)
    hy = rng.uniform(0, L, args.halos)
    hz = rng.uniform(0, L, args.halos)
    M = 10 ** rng.uniform(13.0, 14.8, args.halos)
    zred = 0.2
    a = 1.0 / (1.0 + zred)

    DMO = Profiles.DarkMatter(**bpar)
    DMB = Profiles.DarkMatter(**{**bpar, "epsilon": 2.0})
    model = Baryonification3D(DMO, DMB, cosmo, epsilon_max=20)
    model.setup_interpolator(z_min=0.1, z_max=0.3, N_samples_z=2,
                             M_min=5e12, M_max=2e15, N_samples_Mass=12,
                             R_min=1e-3, R_max=50, N_samples_R=48,
                             verbose=False)

    # query radius: epsilon_max * R_200c / a, as the reference does
    # (SnapshotRunner.py:227-229), using the same mass def as the runner
    cat = utils.HaloNDCatalog(x=hx, y=hy, z=hz, M=M, redshift=zred,
                              cosmo=cd)
    snap = utils.ParticleSnapshot(x=px, y=py, z=pz,
                                  M=np.ones(args.parts), L=L,
                                  cosmo=cd, redshift=zred)
    runner = BaryonifySnapshot(cat, snap, epsilon_max=20, model=model,
                               verbose=False)
    import jax
    R_j = np.asarray(jax.jit(lambda M, a: runner.mass_def.get_radius(
        cosmo, M, a))(M, a))      # physical Mpc, same def as our runner
    R_q = np.clip(20.0 * R_j / a, 0, L / 2)

    # per-halo displacement curves, PREcomputed in one vectorized call
    # (the reference pays a fresh interpolator call per halo — this is
    # the favourable-to-the-reference shortcut)
    curves, ln_r0, dlnr = model.halo_curves(M, a)
    curves = np.asarray(curves)
    n_r = curves.shape[1]
    r_grid = np.exp(ln_r0 + float(dlnr) * np.arange(n_r))

    t0 = time.time()
    tree = cKDTree(np.column_stack([px, py, pz]), boxsize=L)
    t_tree = time.time() - t0

    tot = np.zeros((args.parts, 3))
    ns = min(args.sample, args.halos)
    lnr = np.log(r_grid)
    t0 = time.time()
    for j in range(ns):
        inds = tree.query_ball_point([hx[j], hy[j], hz[j]], R_q[j])
        inds = np.asarray(inds, dtype=np.int64)
        dx = px[inds] - hx[j]
        dy = py[inds] - hy[j]
        dz = pz[inds] - hz[j]
        for dd in (dx, dy, dz):
            np.subtract(dd, L, out=dd, where=dd > L / 2)
            np.add(dd, L, out=dd, where=dd < -L / 2)
        d = np.sqrt(dx * dx + dy * dy + dz * dz)
        d = np.maximum(d, 1e-12)
        off = np.interp(np.log(d), lnr, curves[j],
                        left=0.0, right=0.0)
        off = np.where(np.isfinite(off), off, 0.0)
        s = off / d
        tot[inds, 0] += s * dx
        tot[inds, 1] += s * dy
        tot[inds, 2] += s * dz
    t_loop = time.time() - t0
    per_halo = t_loop / ns
    total_est = per_halo * args.halos + t_tree
    print(json.dumps({
        "particles": args.parts, "halos": args.halos,
        "sampled_halos": ns,
        "tree_build_s": round(t_tree, 2),
        "loop_s_per_halo": round(per_halo, 5),
        "est_total_s": round(total_est, 1),
        "halos_per_s": round(args.halos / total_est, 1),
    }))


if __name__ == "__main__":
    main()
