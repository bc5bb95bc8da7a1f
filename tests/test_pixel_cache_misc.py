"""Pixel-window convolution, caching, snapshot runner, misc utils."""

import numpy as np
import jax.numpy as jnp
import pytest

from baryonforge_tpu import Profiles, utils
from baryonforge_tpu.Runners.SnapshotRunner import BaryonifySnapshot
from baryonforge_tpu.Profiles.BaryonCorrection import Baryonification3D
from baryonforge_tpu.utils.misc import safe_Pchip_minimize, combine_fftpars
from defaults import COSMO, COSMO_DICT, bpar_S19

RNG = np.random.default_rng(41)
M = np.geomspace(1e13, 1e15, 4)
R = np.geomspace(1e-2, 50, 24)


def test_convolved_identity_window():
    # ConvolvedProfile(prof, NoPix) == prof to rtol 1e-3
    # (reference text_pixel_conv.py:13-26)
    dm = Profiles.DarkMatter(**bpar_S19)
    conv = utils.ConvolvedProfile(dm, utils.NoPix())
    raw = np.asarray(dm.real(COSMO, R, M, 0.8))
    out = np.asarray(conv.real(COSMO, R, M, 0.8))
    sel = raw > 1e-10 * raw.max(axis=1, keepdims=True)   # per-halo scale
    np.testing.assert_allclose(out[sel], raw[sel], rtol=1e-3)

    raw = np.asarray(dm.projected(COSMO, R, M, 0.8))
    out = np.asarray(conv.projected(COSMO, R, M, 0.8))
    sel = raw > 1e-8 * raw.max(axis=1, keepdims=True)
    np.testing.assert_allclose(out[sel], raw[sel], rtol=5e-3)


def test_convolved_grid_pixel_smooths():
    dm = Profiles.DarkMatter(**bpar_S19)
    conv = utils.ConvolvedProfile(dm, utils.GridPixelApprox(size=0.5))
    raw = np.asarray(dm.real(COSMO, R, 1e14, 0.8))
    out = np.asarray(conv.real(COSMO, R, 1e14, 0.8))
    # smoothing suppresses the cusp at small r, preserves large r
    # (but stay above the far-truncation tail where ringing dominates)
    assert out[0] < raw[0]
    sel = (R > 5.0) & (R < 20.0)
    np.testing.assert_allclose(out[sel], raw[sel], rtol=5e-2)


def test_healpixel_beam_properties():
    px = utils.HealPixel(NSIDE=128)
    k = jnp.geomspace(1, 1e4, 16)
    assert np.all(np.asarray(px.real(k)) == 0)    # poisoned on purpose
    b = np.asarray(px.projected(k))
    assert b[0] > 0.999 and b[-1] < 1e-3 and np.all(np.diff(b) < 0)


def test_convolved_healpixel_projected():
    from baryonforge_tpu.cosmo import core as ccore
    a = 0.8
    nside = 2048
    dm = Profiles.DarkMatter(**bpar_S19, proj_cutoff=100)
    px = utils.HealPixel(NSIDE=nside)
    conv = utils.ConvolvedProfile(dm, px)
    R_t = np.geomspace(1e-2, 8.0, 24)    # dense where the profile lives
    out = np.asarray(conv.projected(COSMO, R_t, 1e14, a))
    raw = np.asarray(dm.projected(COSMO, R_t, 1e14, a))
    assert np.all(np.isfinite(out))
    # the beam suppresses the core ...
    assert out[0] < raw[0]
    # ... and conserves the profile well beyond the (comoving) beam scale,
    # above the FFTLog ringing floor
    beam_com = px.size * float(ccore.comoving_radial_distance(COSMO, a)[0])
    sel = (R_t > 4 * beam_com) & (raw > 1e-4 * raw.max())
    assert sel.sum() >= 3
    np.testing.assert_allclose(out[sel], raw[sel], rtol=0.08)


def test_cached_profile():
    dm = Profiles.DarkMatter(**bpar_S19)
    cached = utils.CachedProfile(dm)
    a1 = np.asarray(cached.real(COSMO, R, M, 0.8))
    a2 = np.asarray(cached.real(COSMO, R, M, 0.8))   # hit
    np.testing.assert_array_equal(a1, a2)
    assert len(cached.cache) == 1
    cached.real(COSMO, R, M, 0.5)
    assert len(cached.cache) == 2


def test_safe_pchip_minimize():
    x = np.linspace(0, 10, 200)
    y = (x - 3.7) ** 3 + 0.1 * (x - 3.7)
    root = float(safe_Pchip_minimize(jnp.array(y), jnp.array(x)))
    assert abs(root - 3.7) < 0.05
    # no crossing, all positive -> inf
    root = float(safe_Pchip_minimize(jnp.array(y ** 2 + 1.0), jnp.array(x)))
    assert np.isinf(root)


def test_combine_fftpars():
    a = dict(plaw_fourier=-2, padding_lo_fftlog=1e-2, padding_hi_fftlog=1e2,
             n_per_decade=64)
    b = dict(plaw_fourier=-3, padding_lo_fftlog=1e-5, padding_hi_fftlog=1e5,
             n_per_decade=128)
    out = combine_fftpars(a, b)
    assert out["plaw_fourier"] == -3
    assert out["padding_lo_fftlog"] == 1e-5
    assert out["padding_hi_fftlog"] == 1e5
    assert out["n_per_decade"] == 128


def test_baryonify_snapshot():
    n_part, L = 5000, 128.0
    snap = utils.ParticleSnapshot(x=RNG.uniform(0, L, n_part),
                                  y=RNG.uniform(0, L, n_part),
                                  z=RNG.uniform(0, L, n_part),
                                  M=np.ones(n_part), L=L,
                                  cosmo=COSMO_DICT, redshift=0.2)
    cat = utils.HaloNDCatalog(x=RNG.uniform(0, L, 10),
                              y=RNG.uniform(0, L, 10),
                              z=RNG.uniform(0, L, 10),
                              M=10 ** RNG.uniform(14, 15, 10),
                              redshift=0.2, cosmo=COSMO_DICT)
    DMO = Profiles.DarkMatter(**bpar_S19)
    DMB = Profiles.DarkMatter(**{**bpar_S19, "epsilon": 2.0})
    model = Baryonification3D(DMO, DMB, COSMO, epsilon_max=20)
    model.setup_interpolator(z_min=0.1, z_max=0.3, N_samples_z=2,
                             M_min=1e13, M_max=3e15, N_samples_Mass=5,
                             R_min=1e-3, R_max=50, N_samples_R=32,
                             verbose=False)
    new_cat = BaryonifySnapshot(cat, snap, epsilon_max=20,
                                model=model).process()
    # particles stay in the box and most moved by a finite small amount
    for c in ["x", "y", "z"]:
        assert np.all((new_cat[c] >= 0) & (new_cat[c] <= L))
    disp = np.abs(new_cat["x"] - snap.cat["x"])
    disp = np.minimum(disp, L - disp)
    assert np.any(disp > 0)
    assert np.max(disp) < 5.0
    # snapshot is 2D-capable too
    snap2 = utils.ParticleSnapshot(x=RNG.uniform(0, L, 1000),
                                   y=RNG.uniform(0, L, 1000),
                                   M=np.ones(1000), L=L,
                                   cosmo=COSMO_DICT, redshift=0.2)
    cat2 = utils.HaloNDCatalog(x=[50.0], y=[60.0], M=[1e14],
                               redshift=0.2, cosmo=COSMO_DICT)
    out2 = BaryonifySnapshot(cat2, snap2, epsilon_max=20,
                             model=model).process()
    assert np.all((out2["x"] >= 0) & (out2["x"] <= L))
