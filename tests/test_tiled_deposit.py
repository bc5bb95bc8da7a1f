"""Equivalence of the scatter-free tiled phase A vs the scatter path.

Both compute the same per-pixel tangent-offset sums (the tiled kernel uses
local-coordinate chord math instead of the haversine, so agreement is to
f32 pair-distance accuracy, not bitwise).
"""

import numpy as np
import jax.numpy as jnp

from baryonforge_tpu import Profiles, Runners, utils
from baryonforge_tpu import cosmo as bcosmo
from baryonforge_tpu.Profiles.BaryonCorrection import Baryonification3D
from defaults import COSMO_DICT, bpar_S19

RNG = np.random.default_rng(5)


def _setup(nside=64, n_halos=40):
    cosmo = bcosmo.cosmology_from_dict(COSMO_DICT)
    ra = RNG.uniform(0, 360, n_halos)
    dec = np.degrees(np.arcsin(RNG.uniform(-1, 1, n_halos)))
    # park two halos at the poles to exercise polar tiles
    dec[0], dec[1] = 89.5, -89.5
    M = 10 ** RNG.uniform(13.8, 14.8, n_halos)
    z = RNG.uniform(0.15, 0.35, n_halos)
    cat = utils.HaloLightConeCatalog(ra=ra, dec=dec, M=M, z=z,
                                     cosmo=COSMO_DICT)
    npix = 12 * nside * nside
    shell = utils.LightconeShell(map=RNG.exponential(1.0, npix),
                                 cosmo=COSMO_DICT)

    DMO = Profiles.DarkMatterOnly(**bpar_S19)
    DMB = Profiles.DarkMatterBaryon(**bpar_S19)
    model = Baryonification3D(DMO, DMB, cosmo, epsilon_max=20)
    model.setup_interpolator(z_min=0.1, z_max=0.4, N_samples_z=2,
                             M_min=1e13, M_max=1e15, N_samples_Mass=6,
                             R_min=1e-3, R_max=50, N_samples_R=48,
                             verbose=False)
    return cat, shell, model


def test_tiled_matches_scatter():
    cat, shell, model = _setup()
    kw = dict(epsilon_max=20, model=model, halo_batch=16, verbose=False)
    out_s = Runners.BaryonifyShell(cat, shell, deposit="scatter",
                                   **kw).process()
    out_t = Runners.BaryonifyShell(cat, shell, deposit="tiles",
                                   **kw).process()
    orig = np.asarray(shell.map)
    # same mass (process() asserts conservation internally)
    np.testing.assert_allclose(out_t.sum(), orig.sum(), rtol=1e-10)
    # Same displaced map up to disc-EDGE membership jitter: the two paths
    # compute the f32 pixel-halo distance with different (equally valid)
    # formulations, so pixels exactly on the disc boundary can flip
    # in/out, carrying the (tiny) edge displacement with them. Bound the
    # aggregate mass-motion difference tightly and individual pixels
    # loosely.
    scale = np.abs(out_s - orig).max()
    assert scale > 0, "displacement did nothing"
    np.testing.assert_allclose(out_t, out_s, atol=0.02 * scale)
    moved = np.abs(out_s - orig).sum()
    assert np.abs(out_t - out_s).sum() < 3e-3 * moved


def test_stencil_regrid_matches_scatter_phase_b():
    """The stencil phase B must reproduce the chunked scatter regrid for
    the same tiled phase-A offsets (identical weights by construction;
    only f64 summation order differs)."""
    cat, shell, model = _setup(nside=64, n_halos=40)
    kw = dict(epsilon_max=20, model=model, halo_batch=16, verbose=False)
    out_sc = Runners.BaryonifyShell(cat, shell, regrid="scatter",
                                    **kw).process()
    out_st = Runners.BaryonifyShell(cat, shell, regrid="stencil",
                                    **kw).process()
    orig = np.asarray(shell.map)
    np.testing.assert_allclose(out_st.sum(), orig.sum(), rtol=1e-10)
    scale = np.abs(out_sc - orig).max()
    assert scale > 0
    np.testing.assert_allclose(out_st, out_sc, atol=1e-9 * scale)


def test_stencil_regrid_cap_blocks():
    """Exercise cap-block stencil rows (i_min below the cap boundary):
    NSIDE=256 puts eligible cap rings in play."""
    cat, shell, model = _setup(nside=256, n_halos=25)
    kw = dict(epsilon_max=20, model=model, halo_batch=16, verbose=False)
    out_sc = Runners.BaryonifyShell(cat, shell, regrid="scatter",
                                    **kw).process()
    out_st = Runners.BaryonifyShell(cat, shell, regrid="stencil",
                                    **kw).process()
    orig = np.asarray(shell.map)
    np.testing.assert_allclose(out_st.sum(), orig.sum(), rtol=1e-10)
    scale = np.abs(out_sc - orig).max()
    np.testing.assert_allclose(out_st, out_sc, atol=1e-9 * scale)


def test_tiled_paint_matches_scatter():
    cat, shell, _ = _setup(nside=64, n_halos=30)
    cosmo = bcosmo.cosmology_from_dict(COSMO_DICT)
    prof = utils.TabulatedProfile(Profiles.DarkMatter(**bpar_S19), cosmo)
    prof.setup_interpolator(z_min=0.1, z_max=0.4, N_samples_z=2,
                            M_min=1e13, M_max=1e15, N_samples_Mass=6,
                            R_min=1e-3, R_max=60, N_samples_R=48,
                            verbose=False)
    kw = dict(epsilon_max=10, model=prof, halo_batch=16, verbose=False,
              include_pixel_size=True)
    out_s = Runners.PaintProfilesShell(cat, shell, deposit="scatter",
                                       **kw).process()
    out_t = Runners.PaintProfilesShell(cat, shell, deposit="tiles",
                                       **kw).process()
    assert out_t.sum() > 0
    np.testing.assert_allclose(out_t, out_s, atol=2e-3 * np.abs(out_s).max(),
                               rtol=2e-3)


def test_tiled_is_default_with_curves():
    cat, shell, model = _setup(nside=32, n_halos=12)
    r = Runners.BaryonifyShell(cat, shell, epsilon_max=20, model=model,
                               halo_batch=8, verbose=False)
    assert r._tiles_available((0.0, 0.1))
    out = r.process()
    assert np.isfinite(out).all()
