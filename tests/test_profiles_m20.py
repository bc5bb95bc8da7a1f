"""Mead20 (HMx) family tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from baryonforge_tpu.Profiles import Mead20 as M20
from defaults import COSMO

M = np.geomspace(1e11, 1e16, 5)
R = np.geomspace(1e-3, 1e3, 10)
K = np.geomspace(1e-3, 1e3, 10)
BPAR = M20.Params_TAGN_7p6_All


@pytest.mark.parametrize("a", [0.25, 0.5, 1.0])
def test_dm_smoke(a):
    dm = M20.DarkMatter(**BPAR)
    out = np.asarray(dm.real(COSMO, R, M, a))
    assert out.shape == (5, 10) and np.all(np.isfinite(out))
    assert np.all(np.isfinite(np.asarray(dm.projected(COSMO, R[:4], M, a))))
    assert np.all(np.isfinite(np.asarray(dm.fourier(COSMO, K, M, a))))


def test_fraction_budget():
    p = M20.BoundGas(**BPAR)
    Ms = jnp.geomspace(1e12, 1e15, 8)
    f_str = np.asarray(p.get_f_star(Ms, 1.0, COSMO))
    f_bnd, f_ej = [np.asarray(x) for x in p._get_gas_frac(Ms, 1.0, COSMO)]
    fb = COSMO.Omega_b / COSMO.Omega_m
    np.testing.assert_allclose(f_str + f_bnd + f_ej, fb, rtol=1e-6)
    assert np.all(f_bnd >= 0)


def test_concentration_modification():
    p = M20.CollisionlessMatter(**BPAR)
    Ms = jnp.geomspace(1e12, 1e15, 5)
    c = jnp.full(5, 5.0)
    cm = np.asarray(p._modify_concentration(COSMO, c, Ms, 1.0))
    assert cm.shape == (5,)
    assert not np.allclose(cm, 5.0)     # eps1 != 0 at TAGN 7.6


@pytest.mark.parametrize("cls", ["CentralStars", "SatelliteStars", "Stars",
                                 "BoundGas", "EjectedGas", "Gas",
                                 "CollisionlessMatter", "DarkMatterOnly",
                                 "DarkMatterBaryon",
                                 "DarkMatterOnlywithLSS",
                                 "DarkMatterBaryonwithLSS", "TwoHalo"])
def test_component_smoke(cls):
    prof = getattr(M20, cls)(**BPAR)
    out = np.asarray(prof.real(COSMO, R, M, 0.5))
    assert out.shape == (5, 10)
    assert np.all(np.isfinite(out)), f"{cls} non-finite"


def test_delta_stars_fourier_constant():
    p = M20.DeltaStars(**BPAR)
    out = np.asarray(p.fourier(COSMO, K, 1e14, 1.0))
    np.testing.assert_allclose(out, out[0], rtol=1e-12)   # flat in k


def test_gas_add_diffuse_fourier():
    p = M20.GasAddDiffuse(**BPAR)
    bg = M20.BoundGas(**BPAR)
    k = np.geomspace(1e-3, 10, 8)
    f_ej = float(np.asarray(p._get_gas_frac(jnp.array([1e14]), 1.0,
                                            COSMO)[1])[0])
    out = np.asarray(p.fourier(COSMO, k, 1e14, 1.0))
    raw = np.asarray(bg.fourier(COSMO, k, 1e14, 1.0))
    np.testing.assert_allclose(out, raw + f_ej * 1e14, rtol=1e-8)


def test_temperature_pressure():
    T = M20.Temperature(**BPAR)
    out = np.asarray(T.real(COSMO, np.geomspace(0.05, 1, 8), 1e14, 0.8))
    assert np.all(np.isfinite(out)) and np.all(out > 0)
    assert 1e6 < out.max() < 1e9       # cluster temperatures in K

    P = M20.Pressure(**BPAR)
    out = np.asarray(P.real(COSMO, np.geomspace(0.05, 2, 8), 1e14, 0.8))
    assert np.all(np.isfinite(out)) and np.all(out >= 0)
    assert out[0] > out[-1]


def test_tagn2pars():
    mid = M20.Tagn2pars(7.8)
    np.testing.assert_allclose(mid["A_star"],
                               M20.Params_TAGN_7p8_All["A_star"])
    np.testing.assert_allclose(mid["M_0"], M20.Params_TAGN_7p8_All["M_0"])
    between = M20.Tagn2pars(7.7)
    assert (min(M20.Params_TAGN_7p6_All["A_star"],
                M20.Params_TAGN_7p8_All["A_star"])
            <= between["A_star"] <=
            max(M20.Params_TAGN_7p6_All["A_star"],
                M20.Params_TAGN_7p8_All["A_star"]))
    # log-interpolated keys stay positive under extrapolation
    ext = M20.Tagn2pars(8.2)
    assert ext["M_0"] > 0 and ext["T_w"] > 0
