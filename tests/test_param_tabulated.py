"""Per-halo property (p_keys) flows: ParamTabulatedProfile painting and
displacement tables with other_params, through the shell runners."""

import numpy as np
import jax.numpy as jnp
import pytest

from baryonforge_tpu import Profiles, Runners, utils
from baryonforge_tpu.Profiles.BaryonCorrection import Baryonification3D
from defaults import COSMO, COSMO_DICT, bpar_S19

RNG = np.random.default_rng(88)
NSIDE = 32
NPIX = 12 * NSIDE * NSIDE


def test_param_tabulated_profile_readout():
    # table over an extra 'epsilon' axis: readout must interpolate it
    prof = Profiles.DarkMatter(**{**bpar_S19})
    tab = utils.ParamTabulatedProfile(prof, COSMO)
    tab.setup_interpolator(z_min=0.1, z_max=0.4, N_samples_z=3,
                           M_min=1e13, M_max=1e15, N_samples_Mass=5,
                           R_min=1e-2, R_max=30, N_samples_R=32,
                           other_params={"epsilon": np.array([2.0, 4.0,
                                                              6.0])},
                           verbose=False)
    assert tab.p_keys == ["epsilon"]
    r = np.geomspace(0.05, 5, 8)
    lo = np.asarray(tab.real(COSMO, r, 1e14, 0.8, epsilon=2.0))
    hi = np.asarray(tab.real(COSMO, r, 1e14, 0.8, epsilon=6.0))
    mid = np.asarray(tab.real(COSMO, r, 1e14, 0.8, epsilon=4.0))
    assert not np.allclose(lo, hi)
    between = (np.minimum(lo, hi) - 1e-9 <= mid) \
        & (mid <= np.maximum(lo, hi) + 1e-9)
    assert between.mean() > 0.8      # mostly monotone in the extra param
    # missing key must be rejected
    with pytest.raises(AssertionError):
        tab.real(COSMO, r, 1e14, 0.8)


def _catalog_with_eps(n=16):
    return utils.HaloLightConeCatalog(
        ra=RNG.uniform(0, 360, n),
        dec=np.degrees(np.arcsin(RNG.uniform(-1, 1, n))),
        M=10 ** RNG.uniform(13.5, 14.5, n),
        z=RNG.uniform(0.15, 0.35, n), cosmo=COSMO_DICT,
        epsilon=RNG.uniform(2.0, 6.0, n))


def test_paint_shell_with_p_keys():
    cat = _catalog_with_eps()
    prof = Profiles.DarkMatter(**{**bpar_S19}, proj_cutoff=100)
    tab = utils.ParamTabulatedProfile(prof, COSMO)
    tab.setup_interpolator(z_min=0.1, z_max=0.4, N_samples_z=3,
                           M_min=1e13, M_max=1e15, N_samples_Mass=5,
                           R_min=1e-3, R_max=60, N_samples_R=32,
                           other_params={"epsilon": np.array([2.0, 4.0,
                                                              6.0])},
                           verbose=False)
    shell = utils.LightconeShell(map=np.zeros(NPIX), cosmo=COSMO_DICT)
    out = Runners.PaintProfilesShell(cat, shell, epsilon_max=5, model=tab,
                                     halo_batch=4).process()
    assert np.all(np.isfinite(out)) and out.sum() > 0


@pytest.mark.slow
def test_baryonify_shell_with_p_keys():
    # sweep a gas parameter (theta_ej): other_params sets it on BOTH
    # models (reference semantics, BaryonCorrection.py:226-227), but only
    # the DMB model uses it, so the displacement varies with the per-halo
    # property value
    n = 10
    cat = utils.HaloLightConeCatalog(
        ra=RNG.uniform(0, 360, n),
        dec=np.degrees(np.arcsin(RNG.uniform(-1, 1, n))),
        M=10 ** RNG.uniform(13.5, 14.5, n),
        z=RNG.uniform(0.15, 0.35, n), cosmo=COSMO_DICT,
        theta_ej=RNG.uniform(3.0, 6.0, n))
    DMO = Profiles.DarkMatterOnly(**bpar_S19)
    DMB = Profiles.DarkMatterBaryon(**bpar_S19)
    model = Baryonification3D(DMO, DMB, COSMO, epsilon_max=20)
    model.setup_interpolator(z_min=0.1, z_max=0.4, N_samples_z=2,
                             M_min=1e13, M_max=1e15, N_samples_Mass=4,
                             R_min=1e-3, R_max=50, N_samples_R=32,
                             other_params={"theta_ej": np.array([3.0,
                                                                 6.0])},
                             verbose=False)
    assert model.p_keys == ["theta_ej"]
    # the table must actually vary with the extra parameter
    assert not np.allclose(model.raw_input_d[..., 0],
                           model.raw_input_d[..., 1])
    raw = RNG.exponential(1.0, NPIX)
    shell = utils.LightconeShell(map=raw, cosmo=COSMO_DICT)
    out = Runners.BaryonifyShell(cat, shell, epsilon_max=20, model=model,
                                 halo_batch=4).process()
    np.testing.assert_allclose(out.sum(), raw.sum(), rtol=1e-8)
    assert not np.allclose(out, raw)
