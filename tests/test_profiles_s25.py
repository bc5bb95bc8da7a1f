"""Schneider25 family tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from baryonforge_tpu.Profiles import Schneider25 as S25
from defaults import COSMO, bpar_S25

M = np.geomspace(1e11, 1e16, 5)
R = np.geomspace(1e-3, 1e3, 10)
K = np.geomspace(1e-3, 1e3, 10)


@pytest.mark.parametrize("a", [0.25, 0.5, 1.0])
def test_dm_smoke(a):
    dm = S25.DarkMatter(**bpar_S25)
    out = np.asarray(dm.real(COSMO, R, M, a))
    assert out.shape == (5, 10) and np.all(np.isfinite(out))
    assert np.all(np.isfinite(np.asarray(dm.projected(COSMO, R[:4], M, a))))
    assert np.all(np.isfinite(np.asarray(dm.fourier(COSMO, K, M, a))))
    # scalar-rank mirroring
    assert np.asarray(dm.real(COSMO, R, M[0], a)).ndim == 1
    assert np.asarray(dm.real(COSMO, R[0], M[0], a)).ndim == 0


def test_nu_dependent_truncation():
    # higher-mass halos have larger nu -> larger relative truncation radius
    dm = S25.DarkMatter(**bpar_S25)
    a = 1.0
    nu = np.asarray(1.686 / S25._power.sigmaM(COSMO, jnp.array(M), a))
    eps = bpar_S25["epsilon0"] + bpar_S25["epsilon1"] * nu
    assert np.all(np.diff(eps) > 0)


def test_twohalo_exclusion():
    # S25 TwoHalo = S19-style TwoHalo * (1 - exp(-alpha_excl r/R))
    from baryonforge_tpu.Profiles import Schneider19 as S19
    th25 = S25.TwoHalo(**bpar_S25)
    th19 = S19.TwoHalo(q=bpar_S25["q"], p=bpar_S25["p"])
    r = np.geomspace(1e-2, 100, 24)
    a = 1.0
    Mi = 1e14
    out25 = np.asarray(th25.real(COSMO, r, Mi, a))
    out19 = np.asarray(th19.real(COSMO, r, Mi, a))
    R = float(S25._power.lagrangian_radius(COSMO, Mi)) * 0 + float(
        th25.mass_def.get_radius(COSMO, Mi, a)) / a
    f_excl = 1 - np.exp(-bpar_S25["alpha_excl"] * np.clip(r / R, 0, 30))
    np.testing.assert_allclose(out25, out19 * f_excl, rtol=1e-10)


def test_gas_fraction_budget():
    p = S25.HotGas(**bpar_S25)
    Ms = jnp.geomspace(1e12, 1e15, 8)
    f_star = np.asarray(p.get_f_star(Ms, 1.0, COSMO))
    f_hga, f_iga = [np.asarray(x) for x in p._get_gas_frac(Ms, 1.0, COSMO)]
    fb = COSMO.Omega_b / COSMO.Omega_m
    np.testing.assert_allclose(f_star + f_hga + f_iga, fb, rtol=1e-5)


@pytest.mark.parametrize("cls", ["Stars", "HotGas", "InnerGas", "Gas",
                                 "CollisionlessMatter", "SatelliteStars",
                                 "DarkMatterOnly", "DarkMatterBaryon",
                                 "TwoHalo"])
def test_component_smoke(cls):
    prof = getattr(S25, cls)(**bpar_S25)
    out = np.asarray(prof.real(COSMO, R, M, 0.5))
    assert out.shape == (5, 10)
    assert np.all(np.isfinite(out)), f"{cls} non-finite"


def test_inner_gas_hard_cut():
    ig = S25.InnerGas(**bpar_S25)
    r_min = bpar_S25["r_min_iga"]
    out = np.asarray(ig.real(COSMO, np.array([r_min / 2, r_min * 2]),
                             1e14, 0.8))
    assert out[0] == 0.0 and out[1] > 0.0


def test_dmb_mass_conservation_factor():
    # DMB - TwoHalo integrates to the DMO total (the Factor enforces it)
    a = 0.8
    Mi = 1e14
    r = np.geomspace(1e-4, 90, 1200)
    dmb = S25.DarkMatterBaryon(**bpar_S25)
    dmo_prof = S25.DarkMatter(**bpar_S25)
    rho_dmb = np.asarray(dmb.real(COSMO, r, Mi, a))
    rho_2h = np.asarray(dmb.TwoHalo.real(COSMO, r, Mi, a))
    rho_dmo = np.asarray(dmo_prof.real(COSMO, r, Mi, a))
    M_dmb1h = np.trapezoid(4 * np.pi * r ** 2 * (rho_dmb - rho_2h), r)
    M_dmo = np.trapezoid(4 * np.pi * r ** 2 * rho_dmo, r)
    np.testing.assert_allclose(M_dmb1h, M_dmo, rtol=0.05)
