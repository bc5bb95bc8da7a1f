"""Benchmark: BaryonifyShell at NSIDE=1024 (the BASELINE.md primary metric).

Reference baseline: 18,512 halos in ~12-16 s on 1 CPU core with an S19
tabulated displacement (examples/04) => ~1,350 halos/s midpoint.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "halos/s", "vs_baseline": N/1350}

The displacement table is built in a clean CPU subprocess (the axon TPU
plugin reroutes every XLA compile to a slow remote compiler; a plain
JAX_PLATFORMS=cpu process compiles the table kernels locally in seconds)
and checkpointed to .npz; the hot per-halo phase runs on the accelerator.
"""

import json
import os
import subprocess
import sys
import tempfile
import time

import numpy as np

_TABLE_BUILDER = r"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_REMOTE_COMPILE", None)
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
import jax
jax.config.update("jax_platforms", "cpu")
# persistent cache: the ~20 s XLA:CPU compile of the table kernel is paid
# once; later bench runs rebuild the table in a few seconds
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.getcwd(), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np
import baryonforge_tpu
from baryonforge_tpu import Profiles
from baryonforge_tpu import cosmo as bcosmo
from baryonforge_tpu.Profiles.BaryonCorrection import Baryonification2D

h = 0.7
cosmo = bcosmo.Cosmology(Omega_m=0.30, Omega_b=0.045, h=h, sigma8=0.8,
                         n_s=0.96, w0=-1.0)
bpar = dict(theta_ej=4, theta_co=0.1, M_c=1e14 / h, mu_beta=0.4,
            eta=0.3, eta_delta=0.3, tau=-1.5, tau_delta=0,
            A=0.09 / 2, M1=2.5e11 / h, epsilon_h=0.015,
            a=0.3, n=2, epsilon=4, p=0.3, q=0.707, gamma=2, delta=7)
DMO = Profiles.DarkMatterOnly(**bpar, proj_cutoff=100)
DMB = Profiles.DarkMatterBaryon(**bpar, proj_cutoff=100)
model = Baryonification2D(DMO, DMB, cosmo, epsilon_max=20)
model.setup_interpolator(z_min=0.7, z_max=1.1, N_samples_z=8,
                         M_min=5e12, M_max=2e15, N_samples_Mass=20,
                         R_min=1e-3, R_max=60, N_samples_R=64,
                         verbose=False)
model.save_table(os.environ["BFG_TABLE_PATH"])
"""


def main():
    import jax
    # persistent host-prep cache (tile binning; warmup amortization)
    os.environ.setdefault(
        "BFG_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".bfg_cache"))
    # persistent compilation cache (kept in-repo so driver rounds reuse it)
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(os.path.dirname(
                              os.path.abspath(__file__)), ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp
    import baryonforge_tpu  # noqa: F401  (enables x64)
    from baryonforge_tpu import Profiles, Runners, utils
    from baryonforge_tpu import cosmo as bcosmo
    from baryonforge_tpu.Profiles.BaryonCorrection import Baryonification2D

    n_halos = int(os.environ.get("BFG_BENCH_HALOS", 18512))
    nside = int(os.environ.get("BFG_BENCH_NSIDE", 1024))
    npix = 12 * nside * nside

    h = 0.7
    cosmo_dict = dict(Omega_m=0.30, Omega_b=0.045, h=h, sigma8=0.8,
                      n_s=0.96, w0=-1.0)
    cosmo = bcosmo.cosmology_from_dict(cosmo_dict)
    bpar = dict(theta_ej=4, theta_co=0.1, M_c=1e14 / h, mu_beta=0.4,
                eta=0.3, eta_delta=0.3, tau=-1.5, tau_delta=0,
                A=0.09 / 2, M1=2.5e11 / h, epsilon_h=0.015,
                a=0.3, n=2, epsilon=4, p=0.3, q=0.707, gamma=2, delta=7)

    rng = np.random.default_rng(7)
    ra = rng.uniform(0, 360, n_halos)
    dec = np.degrees(np.arcsin(rng.uniform(-1, 1, n_halos)))
    M = 10 ** rng.uniform(13.0, 14.8, n_halos)
    z = rng.uniform(0.8, 1.0, n_halos)
    cat = utils.HaloLightConeCatalog(ra=ra, dec=dec, M=M, z=z,
                                     cosmo=cosmo_dict)
    shell = utils.LightconeShell(map=rng.exponential(1.0, npix),
                                 cosmo=cosmo_dict)

    # ---- displacement table: clean-CPU subprocess + checkpoint ----------
    t0 = time.time()
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "table.npz")
        env = dict(os.environ, BFG_TABLE_PATH=path)
        subprocess.run([sys.executable, "-c", _TABLE_BUILDER], env=env,
                       check=True, cwd=os.path.dirname(
                           os.path.abspath(__file__)))
        DMO = Profiles.DarkMatterOnly(**bpar, proj_cutoff=100)
        DMB = Profiles.DarkMatterBaryon(**bpar, proj_cutoff=100)
        model = Baryonification2D(DMO, DMB, cosmo, epsilon_max=20)
        model.load_table(path)
    t_table = time.time() - t0
    print(f"# displacement table build (CPU subprocess): {t_table:.1f} s",
          file=sys.stderr)

    runner = Runners.BaryonifyShell(cat, shell, epsilon_max=20, model=model,
                                    halo_batch=4096, verbose=False,
                                    n_size_buckets=8,
                                    regrid_dtype=jnp.float32)

    # warmup: CONCURRENT ahead-of-time compile of every kernel (the
    # round-4 serial first-touch cost 555-945 s cold; the remote
    # compiler parallelizes across requests), then one real call to
    # flush the long tail (persistent-cache hits)
    t0 = time.time()
    wrep = runner.warmup()
    t_aot = time.time() - t0
    out = runner.process()
    t_warm = time.time() - t0
    print(f"# warmup: {t_warm:.1f} s total ({t_aot:.1f} s concurrent AOT"
          f" of {wrep['n_compiles']} kernels, {wrep['n_failed']} failed;"
          f" rest = first full call)", file=sys.stderr)

    # device-only throughput: warm, fully-blocked per-phase times (the
    # e2e value below includes tunnel RPC congestion; this field is the
    # machine truth a congested-link day cannot touch)
    stage = runner.stencil_stage_times(nside, npix, jnp.float32)
    t_dev = (stage["phase_a_s"] + stage["combo_s"] + stage["finish_s"])
    dev_rate = n_halos / t_dev
    print(f"# device-only: {stage} -> {t_dev:.3f} s/call "
          f"= {dev_rate:.0f} halos/s", file=sys.stderr)

    # PIPELINED steady state: dispatch all repeats via process_async().
    # Call k's result download (device->host, over a 4-40 MB/s dev tunnel
    # here; ~1 ms on directly-attached TPU) runs on a fetch thread while
    # call k+1's compute is dispatched, so the wall clock pays
    # max(compute, transfer) per call instead of their sum — this is the
    # production serving pattern (stream shells through the device).
    # The sparse changed-block download (ops/transfer.py) shrinks the
    # transfer itself.
    n_rep = int(os.environ.get("BFG_BENCH_REPEATS", 8))
    t0 = time.time()
    futs = [runner.process_async() for _ in range(n_rep)]
    outs = [f.result() for f in futs]
    wall = time.time() - t0
    out = outs[-1]
    splits = [(f.timings.get("compute_s", float("nan")),
               f.timings.get("transfer_s", float("nan"))) for f in futs]
    compute_med = float(np.median([c for c, _ in splits]))
    transfer_med = float(np.median([t for _, t in splits]))
    print(f"# pipelined wall for {n_rep} calls: {wall:.2f} s", file=sys.stderr)
    print("# compute/transfer splits: "
          + str([f"{c:.2f}/{t:.2f}" for c, t in splits]), file=sys.stderr)

    assert np.isfinite(out).all()
    halos_per_s = n_halos * n_rep / wall
    baseline = 1350.0      # reference midpoint, 1 CPU core
    print(json.dumps({
        "metric": "baryonify_shell_nside1024_halos_per_s",
        "value": round(halos_per_s, 1),
        "unit": "halos/s",
        "vs_baseline": round(halos_per_s / baseline, 2),
        "pipelined_calls": n_rep,
        "wall_s": round(wall, 2),
        "compute_s_median": round(compute_med, 3),
        "transfer_s_median": round(transfer_med, 3),
        "splits_s": [[round(c, 2), round(t, 2)] for c, t in splits],
        "warmup_s": round(t_warm, 1),
        "warmup_aot_s": round(t_aot, 1),
        "n_compiles": wrep["n_compiles"],
        # the e2e value is hostage to the dev tunnel: at this halo
        # density ~43% of pixels move, so every call downloads the
        # full f32 map — report the link rate so a slow-link day is
        # identifiable in the artifact itself
        "transfer_mb": round(float(np.median(
            [f.timings.get("transfer_mb", 0.0) for f in futs])), 1),
        "link_mb_per_s": round(float(np.median(
            [f.timings.get("transfer_mb", 0.0)
             / max(f.timings.get("transfer_s", 1e-9), 1e-9)
             for f in futs])), 2),
        "device_s_per_call": round(t_dev, 3),
        "device_halos_per_s": round(dev_rate, 1),
        "device_vs_baseline": round(dev_rate / baseline, 2),
        "device_stage_s": stage,
    }))


if __name__ == "__main__":
    main()
