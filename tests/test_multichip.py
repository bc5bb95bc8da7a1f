"""Multi-device sharding tests on the virtual 8-CPU mesh: sharded runner
output must equal the single-device output exactly (same reductions)."""

import numpy as np
import jax
import jax.numpy as jnp

from baryonforge_tpu import Profiles, Runners, utils, parallel
from baryonforge_tpu.Profiles.BaryonCorrection import Baryonification3D
from defaults import COSMO, COSMO_DICT, bpar_S19

NSIDE = 32
NPIX = 12 * NSIDE * NSIDE
RNG = np.random.default_rng(21)


def _setup():
    n = 48
    ra = RNG.uniform(0, 360, n)
    dec = np.degrees(np.arcsin(RNG.uniform(-1, 1, n)))
    M = 10 ** RNG.uniform(13.5, 15.0, n)
    z = RNG.uniform(0.1, 0.4, n)
    cat = utils.HaloLightConeCatalog(ra=ra, dec=dec, M=M, z=z,
                                     cosmo=COSMO_DICT)
    DMO = Profiles.DarkMatter(**bpar_S19)
    DMB = Profiles.DarkMatter(**{**bpar_S19, "epsilon": 2.0})
    model = Baryonification3D(DMO, DMB, COSMO, epsilon_max=20)
    model.setup_interpolator(z_min=0.05, z_max=0.6, N_samples_z=3,
                             M_min=1e13, M_max=3e15, N_samples_Mass=5,
                             R_min=1e-3, R_max=50, N_samples_R=32,
                             verbose=False)
    return cat, model


def test_sharded_baryonify_matches_single_device():
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    cat, model = _setup()
    raw = RNG.exponential(1.0, NPIX)
    shell = utils.LightconeShell(map=raw, cosmo=COSMO_DICT)

    # mesh mode runs the scatter deposit; compare like-for-like (the
    # tiled deposit is equivalence-tested separately in
    # test_tiled_deposit.py with edge-jitter tolerances)
    single = Runners.BaryonifyShell(cat, shell, epsilon_max=20, model=model,
                                    halo_batch=8,
                                    deposit="scatter").process()
    mesh = parallel.halo_mesh(8)
    sharded = Runners.BaryonifyShell(cat, shell, epsilon_max=20, model=model,
                                     halo_batch=8, mesh=mesh,
                                     deposit="scatter").process()
    np.testing.assert_allclose(sharded, single, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(sharded.sum(), raw.sum(), rtol=1e-8)


def test_tiled_mesh_matches_tiled_single():
    """The tiled deposit sharded over the mesh must reproduce the
    single-device tiled result (same algorithm; only f32 reduction order
    differs across shards)."""
    cat, model = _setup()
    raw = RNG.exponential(1.0, NPIX)
    shell = utils.LightconeShell(map=raw, cosmo=COSMO_DICT)
    single = Runners.BaryonifyShell(cat, shell, epsilon_max=20,
                                    model=model, halo_batch=8).process()
    mesh = parallel.halo_mesh(8)
    sharded = Runners.BaryonifyShell(cat, shell, epsilon_max=20,
                                     model=model, halo_batch=8,
                                     mesh=mesh).process()
    scale = np.abs(single - raw).max()
    np.testing.assert_allclose(sharded, single, atol=1e-4 * scale)
    np.testing.assert_allclose(sharded.sum(), raw.sum(), rtol=1e-8)


def test_anis_shell_sharded_matches_single():
    """PaintProfilesAnisShell accepts the full runner config (mesh, ...)
    and its sharded output equals the single-device one."""
    cat, _ = _setup()
    tab = utils.TabulatedProfile(Profiles.DarkMatter(
        **bpar_S19, proj_cutoff=50), COSMO)
    tab.setup_interpolator(z_min=0.05, z_max=0.6, N_samples_z=3,
                           M_min=1e13, M_max=3e15, N_samples_Mass=5,
                           R_min=1e-3, R_max=60, N_samples_R=32,
                           verbose=False)
    shell = utils.LightconeShell(map=RNG.exponential(1.0, NPIX),
                                 cosmo=COSMO_DICT, redshift=0.25)
    kw = dict(epsilon_max=5, model=tab, Tracer_model=tab, Mtot_model=tab,
              background_val=1.0, global_tracer_fraction=0.1,
              halo_batch=8, verbose=False)
    single = Runners.PaintProfilesAnisShell(cat, shell, **kw).process()
    sharded = Runners.PaintProfilesAnisShell(
        cat, shell, mesh=parallel.halo_mesh(8), **kw).process()
    np.testing.assert_allclose(sharded, single, rtol=1e-10, atol=1e-10
                               * np.abs(single).max())


def test_simple_parallel_concurrent_matches_sequential():
    """SimpleParallel must produce the same per-runner outputs as a
    sequential loop while spreading runners over devices."""
    cat, model = _setup()
    shells = [utils.LightconeShell(map=RNG.exponential(1.0, NPIX),
                                   cosmo=COSMO_DICT) for _ in range(4)]
    runners = [Runners.BaryonifyShell(cat, s, epsilon_max=20, model=model,
                                      halo_batch=8, deposit="scatter")
               for s in shells]
    seq = [Runners.BaryonifyShell(cat, s, epsilon_max=20, model=model,
                                  halo_batch=8, deposit="scatter").process()
           for s in shells]
    par = parallel.SimpleParallel(runners, njobs=4).process()
    assert len(par) == 4
    for a, b in zip(par, seq):
        np.testing.assert_allclose(a, b, rtol=1e-12, atol=1e-12)


def test_splitjoin_paint():
    cat, _ = _setup()
    tab = utils.TabulatedProfile(Profiles.DarkMatter(
        **bpar_S19, proj_cutoff=100), COSMO)
    tab.setup_interpolator(z_min=0.05, z_max=0.6, N_samples_z=3,
                           M_min=1e13, M_max=3e15, N_samples_Mass=5,
                           R_min=1e-3, R_max=60, N_samples_R=32,
                           verbose=False)
    shell = utils.LightconeShell(map=np.zeros(NPIX), cosmo=COSMO_DICT)
    runner = Runners.PaintProfilesShell(cat, shell, epsilon_max=5,
                                        model=tab, halo_batch=8,
                                        deposit="scatter")
    single = runner.process()
    split = parallel.SplitJoinParallel(runner, mesh=parallel.halo_mesh(8))
    out = split.process()
    np.testing.assert_allclose(out, single, rtol=1e-12, atol=1e-15)


def test_stencil_phase_b_mesh_matches_single():
    """The stencil phase B now runs in mesh mode too (output tile axis
    sharded, inputs replicated): forced-stencil sharded output must match
    the forced-stencil single-device output."""
    cat, model = _setup()
    raw = RNG.exponential(1.0, NPIX)
    shell = utils.LightconeShell(map=raw, cosmo=COSMO_DICT)
    single = Runners.BaryonifyShell(cat, shell, epsilon_max=20,
                                    model=model, halo_batch=8,
                                    regrid="stencil").process()
    sharded = Runners.BaryonifyShell(cat, shell, epsilon_max=20,
                                     model=model, halo_batch=8,
                                     regrid="stencil",
                                     mesh=parallel.halo_mesh(8)).process()
    scale = np.abs(single - raw).max()
    np.testing.assert_allclose(sharded, single, atol=1e-4 * scale)
    np.testing.assert_allclose(sharded.sum(), raw.sum(), rtol=1e-8)
