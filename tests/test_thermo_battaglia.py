"""Battaglia12 + Thermodynamic profile stack tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from baryonforge_tpu.Profiles import Battaglia as B12
from baryonforge_tpu.Profiles import Thermodynamic as TH
from baryonforge_tpu.utils import constants as const
from defaults import COSMO, bpar_S19

R = np.geomspace(1e-2, 10, 12)
M = np.geomspace(1e13, 1e15, 4)


@pytest.mark.parametrize("model", ["200_AGN", "500_AGN", "500_SH"])
def test_battaglia_pressure(model):
    p = B12.Pressure(Model_def=model)
    out = np.asarray(p.real(COSMO, R, M, 0.8))
    assert out.shape == (4, 12)
    assert np.all(np.isfinite(out)) and np.all(out > 0)
    assert np.all(out[:, 0] > out[:, -1])         # decreasing outward
    # electron pressure is a fixed rescaling
    pe = B12.ElectronPressure(Model_def=model)
    oute = np.asarray(pe.real(COSMO, R, M, 0.8))
    np.testing.assert_allclose(oute, const.Pth_to_Pe * out, rtol=1e-12)


@pytest.mark.parametrize("model", ["200_AGN", "200_SH"])
def test_battaglia_gasdensity(model):
    g = B12.GasDensity(Model_def=model)
    out = np.asarray(g.real(COSMO, R, M, 0.8))
    assert np.all(np.isfinite(out)) and np.all(out > 0)
    assert np.all(out[:, 0] > out[:, -1])
    # truncation
    gt = B12.GasDensity(Model_def=model, truncate=1.0)
    outt = np.asarray(gt.real(COSMO, np.array([0.1, 50.0]), 1e14, 0.8))
    assert outt[1] == 0.0 and outt[0] > 0


def test_hydrostatic_pressure():
    p = TH.Pressure(**bpar_S19)
    out = np.asarray(p.real(COSMO, R, 1e14, 0.8))
    assert np.all(np.isfinite(out)) and np.all(out >= 0)
    assert out[0] > out[-1]
    # hydrostatic equilibrium check: dP/dr ~ -G M(<r) rho_gas / r^2 on a
    # mid-range interval (CGS conversion folded in)
    r_chk = np.geomspace(0.3, 1.0, 24)
    P = np.asarray(p.real(COSMO, r_chk, 1e14, 0.8))
    dP_dr = np.gradient(P, r_chk)
    gas = p.Gas
    rho_gas = np.asarray(gas.real(COSMO, r_chk, 1e14, 0.8))
    rr = np.geomspace(1e-5, r_chk.max(), 3000)
    rho_tot = np.asarray(p.DarkMatterBaryon.real(COSMO, rr, 1e14, 0.8))
    M_enc = np.concatenate([[0], np.cumsum(
        0.5 * np.diff(rr) * (4 * np.pi * rr ** 2 * rho_tot)[1:]
        + 0.5 * np.diff(rr) * (4 * np.pi * rr ** 2 * rho_tot)[:-1])])
    M_chk = np.interp(r_chk, rr, M_enc)
    rhs = (-const.G * M_chk * rho_gas / r_chk ** 2
           * const.Msun_to_g / const.Mpc_to_cm / 0.8)
    np.testing.assert_allclose(dP_dr, rhs, rtol=0.15)


def test_nonthermal_fracs():
    nt = TH.NonThermalFrac(alpha_nt=0.18, nu_nt=0.8, gamma_nt=0.8,
                           **bpar_S19)
    out = np.asarray(nt.real(COSMO, R, 1e14, 0.8))
    assert np.all((out >= 0) & (out <= 1))
    assert np.all(np.diff(out[0] if out.ndim > 1 else out) >= 0)

    g20 = TH.NonThermalFracGreen20(**bpar_S19)
    out = np.asarray(g20.real(COSMO, R, M, 0.8))
    assert np.all((out >= 0) & (out <= 1))


def test_thermalsz_and_temperature():
    y = TH.ThermalSZ(**bpar_S19)
    out = np.asarray(y.projected(COSMO, R, 1e14, 0.8))
    assert np.all(np.isfinite(out)) and np.all(out >= 0)
    # Compton-y for a 1e14 cluster: ~1e-7..1e-4 range
    assert 1e-9 < out.max() < 1e-3

    T = TH.Temperature(alpha_nt=0.18, nu_nt=0.8, gamma_nt=0.8, **bpar_S19)
    out = np.asarray(T.real(COSMO, np.geomspace(0.1, 1, 6), 1e14, 0.8))
    assert np.all(np.isfinite(out)) and np.all(out >= 0)
    assert out.max() < 1e9 and out.max() > 1e5

    n = TH.GasNumberDensity(**bpar_S19)
    out = np.asarray(n.real(COSMO, R, 1e14, 0.8))
    assert np.all(out > 0) and out.max() < 1.0     # ~1e-4..1e-2 cm^-3


def test_xray_unfinished():
    with pytest.raises(NotImplementedError):
        TH.XrayLuminosity(**bpar_S19)
