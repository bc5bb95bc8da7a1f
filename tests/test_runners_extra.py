"""Coverage for the remaining runner surface: anisotropic painting,
2D ellipticity, SimpleParallel, log_time."""

import numpy as np
import jax.numpy as jnp
import pytest

from baryonforge_tpu import Profiles, Runners, utils, parallel
from baryonforge_tpu.Runners.Map2DRunner import (PaintProfilesGrid,
                                                 PaintProfilesAnisGrid,
                                                 BaryonifyGrid)
from defaults import COSMO, COSMO_DICT, bpar_S19

RNG = np.random.default_rng(66)
NSIDE = 32
NPIX = 12 * NSIDE * NSIDE


def _tab(proj_cutoff=100, r_steps=500):
    from defaults import memo_table

    def build():
        t = utils.TabulatedProfile(Profiles.DarkMatter(
            **bpar_S19, proj_cutoff=proj_cutoff), COSMO)
        t.setup_interpolator(z_min=0.05, z_max=0.6, N_samples_z=3,
                             M_min=1e13, M_max=3e15, N_samples_Mass=6,
                             R_min=1e-3, R_max=60, N_samples_R=48,
                             verbose=False)
        return t

    return memo_table(("runners_extra_dm_tab", proj_cutoff, r_steps),
                      build)


def _cat(n=24):
    return utils.HaloLightConeCatalog(
        ra=RNG.uniform(0, 360, n),
        dec=np.degrees(np.arcsin(RNG.uniform(-1, 1, n))),
        M=10 ** RNG.uniform(13.5, 14.8, n),
        z=RNG.uniform(0.1, 0.4, n), cosmo=COSMO_DICT)


def test_paint_anis_shell():
    cat = _cat()
    tab = _tab()
    shell = utils.LightconeShell(map=RNG.exponential(1.0, NPIX),
                                 cosmo=COSMO_DICT, redshift=0.25)
    runner = Runners.PaintProfilesAnisShell(
        cat, shell, epsilon_max=5, model=tab, Tracer_model=tab,
        Mtot_model=tab, background_val=1.0, global_tracer_fraction=0.1,
        halo_batch=8, verbose=False)
    out = runner.process()
    assert out.shape == (NPIX,)
    assert np.all(np.isfinite(out))
    assert out.sum() > 0


def test_paint_anis_grid():
    N, L = 32, 128.0
    n = 12
    bins = (np.arange(N) + 0.5) * (L / N)
    cat = utils.HaloNDCatalog(x=RNG.uniform(0, L, n), y=RNG.uniform(0, L, n),
                              M=10 ** RNG.uniform(13.5, 14.5, n),
                              redshift=0.2, cosmo=COSMO_DICT)
    gm = utils.GriddedMap(map=RNG.exponential(1.0, (N, N)), bins=bins,
                          cosmo=COSMO_DICT, redshift=0.2)
    tab = _tab()
    out = PaintProfilesAnisGrid(
        cat, gm, epsilon_max=5, model=tab, Tracer_model=tab,
        Mtot_model=tab, background_val=1.0, global_tracer_fraction=0.1,
        halo_batch=4).process()
    assert out.shape == (N, N)
    assert np.all(np.isfinite(out))


def test_grid_ellipticity_2d():
    N, L = 64, 128.0
    n = 8
    bins = (np.arange(N) + 0.5) * (L / N)
    A_ell = RNG.normal(size=(n, 2))
    cat = utils.HaloNDCatalog(x=RNG.uniform(0, L, n), y=RNG.uniform(0, L, n),
                              M=10 ** RNG.uniform(14.0, 14.5, n),
                              redshift=0.2, cosmo=COSMO_DICT,
                              q_ell=RNG.uniform(0.5, 0.9, n), A_ell=A_ell)
    gm = utils.GriddedMap(map=np.zeros((N, N)), bins=bins,
                          cosmo=COSMO_DICT, redshift=0.2)
    tab = _tab()
    out_e = PaintProfilesGrid(cat, gm, epsilon_max=5, model=tab,
                              use_ellipticity=True, halo_batch=4).process()
    out_c = PaintProfilesGrid(cat, gm, epsilon_max=5, model=tab,
                              use_ellipticity=False, halo_batch=4).process()
    assert np.all(np.isfinite(out_e)) and out_e.sum() > 0
    # elliptical painting differs from circular
    assert not np.allclose(out_e, out_c)
    # ellipticity on the baryonify path too
    DMO = Profiles.DarkMatter(**bpar_S19)
    DMB = Profiles.DarkMatter(**{**bpar_S19, "epsilon": 2.0})
    from baryonforge_tpu.Profiles.BaryonCorrection import Baryonification3D
    model = Baryonification3D(DMO, DMB, COSMO, epsilon_max=20)
    model.setup_interpolator(z_min=0.1, z_max=0.3, N_samples_z=2,
                             M_min=1e13, M_max=1e15, N_samples_Mass=4,
                             R_min=1e-3, R_max=50, N_samples_R=32,
                             verbose=False)
    gm2 = utils.GriddedMap(map=RNG.exponential(1.0, (N, N)), bins=bins,
                           cosmo=COSMO_DICT, redshift=0.2)
    out_b = BaryonifyGrid(cat, gm2, epsilon_max=20, model=model,
                          use_ellipticity=True, halo_batch=4).process()
    np.testing.assert_allclose(out_b.sum(), gm2.map.sum(), rtol=1e-10)


def test_simple_parallel():
    cat = _cat(8)
    tab = _tab()
    shells = [utils.LightconeShell(map=np.zeros(NPIX), cosmo=COSMO_DICT)
              for _ in range(2)]
    runners = [Runners.PaintProfilesShell(cat, s, epsilon_max=5, model=tab,
                                          halo_batch=4, verbose=False)
               for s in shells]
    outs = parallel.SimpleParallel(runners).process()
    assert len(outs) == 2
    np.testing.assert_allclose(outs[0], outs[1])


def test_log_time(capsys):
    from baryonforge_tpu.utils import log_time

    @log_time
    def work(x, log_line_time=None):
        log_line_time("start")
        y = x * 2
        log_line_time("end")
        return y

    assert work(21) == 42
    out = capsys.readouterr().out
    assert "start" in out and "end" in out


def test_runner_helper_api():
    # build_Rmat / coord_array / pick_indices parity helpers
    from baryonforge_tpu.Runners.HealpixRunner import DefaultRunner
    from baryonforge_tpu.Runners.Map2DRunner import DefaultRunnerGrid
    import numpy as np

    r = DefaultRunner.__new__(DefaultRunner)
    R = r.build_Rmat(np.array([1.0, 0.0]), np.array([0.0, 1.0]))
    np.testing.assert_allclose(R @ np.array([1.0, 0.0]),
                               np.array([0.0, 1.0]), atol=1e-12)
    xy = r.coord_array(np.arange(4).reshape(2, 2), np.ones((2, 2)))
    assert xy.shape == (4, 2) and xy[2, 0] == 2 and xy[3, 1] == 1

    g = DefaultRunnerGrid.__new__(DefaultRunnerGrid)
    # q=1 -> identity shear
    np.testing.assert_allclose(g.build_Rmat(np.array([1.0, 0.0]), 1.0),
                               np.eye(2), atol=1e-12)
    import pytest
    with pytest.raises(NotImplementedError):
        g.build_Rmat(np.array([1.0, 0.0, 0.0]), 0.7)
    inds = g.pick_indices(1, 3, 10)
    np.testing.assert_array_equal(inds, [8, 9, 0, 1, 2, 3])


def test_models_are_pickleable():
    # SURVEY §5 checkpoint/parallelism parity: built tables must survive
    # pickling (the reference strips SwigPyObjects via destory_Pk; our
    # models hold plain arrays so pickle round-trips directly)
    import pickle
    from baryonforge_tpu.Profiles.BaryonCorrection import Baryonification3D
    DMO = Profiles.DarkMatter(**bpar_S19)
    DMB = Profiles.DarkMatter(**{**bpar_S19, "epsilon": 2.0})
    model = Baryonification3D(DMO, DMB, COSMO, epsilon_max=20)
    model.setup_interpolator(z_min=0.1, z_max=0.3, N_samples_z=2,
                             M_min=1e13, M_max=1e15, N_samples_Mass=3,
                             R_min=1e-3, R_max=50, N_samples_R=16,
                             verbose=False)
    m2 = pickle.loads(pickle.dumps(model))
    r = np.geomspace(0.1, 10, 8)
    np.testing.assert_allclose(np.asarray(model.displacement(r, 1e14, 0.8)),
                               np.asarray(m2.displacement(r, 1e14, 0.8)))


def test_fits_roundtrip(tmp_path):
    # native FITS writer/reader round-trips a HEALPix map and feeds
    # LightconeShell(path=...) (reference loads via hp.read_map,
    # io.py:341-363)
    from baryonforge_tpu.utils.fitsio import (read_healpix_fits,
                                              write_healpix_fits)
    rng = np.random.default_rng(2)
    m = rng.exponential(1.0, 12 * 16 * 16)
    p = str(tmp_path / "shell.fits")
    write_healpix_fits(p, m)
    back = read_healpix_fits(p)
    np.testing.assert_allclose(back, m, rtol=2e-7)     # f32 storage
    write_healpix_fits(p, m, dtype=">f8")
    np.testing.assert_array_equal(read_healpix_fits(p), m)
    shell = utils.LightconeShell(path=p, cosmo=COSMO_DICT)
    assert shell.NSIDE == 16
    np.testing.assert_array_equal(shell.map, m)


class _HideCurves:
    """Expose only the projected()/p_keys surface of a profile: forces
    the runner's direct-evaluation path (no halo_curves fast path)."""

    def __init__(self, prof):
        self._prof = prof

    def projected(self, *args, **kwargs):
        return self._prof.projected(*args, **kwargs)


def test_paint_anis_curve_fast_path_matches_direct():
    """The Anis curve fast path (two 1D lerps per pixel) must agree with
    the direct TabulatedProfile.projected evaluation."""
    cat = _cat()
    tab = _tab()
    shell = utils.LightconeShell(map=RNG.exponential(1.0, NPIX),
                                 cosmo=COSMO_DICT, redshift=0.25)
    kw = dict(epsilon_max=5, background_val=1.0,
              global_tracer_fraction=0.1, halo_batch=8, verbose=False)
    fast = Runners.PaintProfilesAnisShell(
        cat, shell, model=tab, Tracer_model=tab, Mtot_model=tab,
        **kw).process()
    direct = Runners.PaintProfilesAnisShell(
        cat, shell, model=_HideCurves(tab), Tracer_model=_HideCurves(tab),
        Mtot_model=tab, **kw).process()
    scale = np.abs(direct).max()
    # the paths share the physics but not the f32 rounding (tiled lookup
    # noise on steep log curves is ~1e-3 relative at the largest pixels)
    np.testing.assert_allclose(fast, direct, rtol=2e-2,
                               atol=2e-4 * scale)


def test_paint_anis_tiled_matches_scatter():
    """The paint2 tile kernel (scatter-free Anis halo sum) must agree
    with the per-halo scatter accumulation of the same curves."""
    cat = _cat()
    tab = _tab()
    shell = utils.LightconeShell(map=RNG.exponential(1.0, NPIX),
                                 cosmo=COSMO_DICT, redshift=0.25)
    kw = dict(epsilon_max=5, background_val=1.0,
              global_tracer_fraction=0.1, halo_batch=8, verbose=False)
    # float64: the two paths are algebraically identical — pin tightly
    t64 = Runners.PaintProfilesAnisShell(
        cat, shell, model=tab, Tracer_model=tab, Mtot_model=tab,
        deposit="auto", dtype=jnp.float64, **kw).process()
    s64 = Runners.PaintProfilesAnisShell(
        cat, shell, model=tab, Tracer_model=tab, Mtot_model=tab,
        deposit="scatter", dtype=jnp.float64, **kw).process()
    np.testing.assert_allclose(t64, s64, rtol=1e-6,
                               atol=1e-9 * np.abs(s64).max())
    # float32 (default): both paths carry ~1e-3-relative lookup noise on
    # steep log curves (exp amplifies the f32 lnr error) — loose pin
    tiled = Runners.PaintProfilesAnisShell(
        cat, shell, model=tab, Tracer_model=tab, Mtot_model=tab,
        deposit="auto", **kw).process()
    scatter = Runners.PaintProfilesAnisShell(
        cat, shell, model=tab, Tracer_model=tab, Mtot_model=tab,
        deposit="scatter", **kw).process()
    np.testing.assert_allclose(tiled, scatter, rtol=2e-2,
                               atol=2e-5 * np.abs(scatter).max())


def test_anis_grid_repeat_calls_track_map_mutation():
    """Repeated process() with an in-place map mutation must NOT reuse
    the previous call's baked-in Mtot/orig device constants (the grid
    _scan_accumulate keys on content tokens via extra_key; regression
    for the stale-closure aliasing the shell runners fixed in r4)."""
    N, L = 32, 128.0
    n = 12
    rng = np.random.default_rng(11)
    bins = (np.arange(N) + 0.5) * (L / N)
    cat = utils.HaloNDCatalog(x=rng.uniform(0, L, n),
                              y=rng.uniform(0, L, n),
                              M=10 ** rng.uniform(13.5, 14.5, n),
                              redshift=0.2, cosmo=COSMO_DICT)
    map1 = rng.exponential(1.0, (N, N))
    gm = utils.GriddedMap(map=map1.copy(), bins=bins,
                          cosmo=COSMO_DICT, redshift=0.2)
    tab = _tab()
    runner = PaintProfilesAnisGrid(
        cat, gm, epsilon_max=5, model=tab, Tracer_model=tab,
        Mtot_model=tab, background_val=1.0, global_tracer_fraction=0.1,
        halo_batch=4)
    out1 = runner.process()
    # mutate the map in place; a second call must see the new content
    gm.map[:] = 3.0 * map1
    out2 = runner.process()
    # the orig map enters linearly through the mfrac weighting
    np.testing.assert_allclose(out2, 3.0 * out1, rtol=1e-10)
    # timings split recorded (fleet transfer standard)
    assert {"compute_s", "transfer_s"} <= set(runner.timings)


def test_baryonify_grid_async_pipeline_and_conservation():
    """process_async() futures resolve to the same map as process()
    and repeated calls keep mass conservation."""
    N, L = 32, 128.0
    n = 8
    rng = np.random.default_rng(12)
    bins = (np.arange(N) + 0.5) * (L / N)
    cat = utils.HaloNDCatalog(x=rng.uniform(0, L, n),
                              y=rng.uniform(0, L, n),
                              M=10 ** rng.uniform(14.0, 14.5, n),
                              redshift=0.2, cosmo=COSMO_DICT)
    gm = utils.GriddedMap(map=rng.exponential(1.0, (N, N)), bins=bins,
                          cosmo=COSMO_DICT, redshift=0.2)
    DMO = Profiles.DarkMatter(**bpar_S19)
    DMB = Profiles.DarkMatter(**{**bpar_S19, "epsilon": 2.0})
    from baryonforge_tpu.Profiles.BaryonCorrection import Baryonification3D
    model = Baryonification3D(DMO, DMB, COSMO, epsilon_max=20)
    model.setup_interpolator(z_min=0.1, z_max=0.3, N_samples_z=2,
                             M_min=1e13, M_max=1e15, N_samples_Mass=4,
                             R_min=1e-3, R_max=50, N_samples_R=32,
                             verbose=False)
    runner = BaryonifyGrid(cat, gm, epsilon_max=20, model=model,
                           halo_batch=4)
    sync = runner.process()
    futs = [runner.process_async() for _ in range(2)]
    outs = [f.result() for f in futs]
    for out in outs:
        assert out.shape == (N, N)
        np.testing.assert_allclose(out, sync, rtol=1e-12)
        np.testing.assert_allclose(out.sum(), gm.map.sum(), rtol=1e-10)
