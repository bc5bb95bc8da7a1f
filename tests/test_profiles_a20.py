"""Arico20 family tests: smoke + physics sanity (fractions sum to f_bar,
analytic NFW normalization, gas-component mass budget)."""

import numpy as np
import jax.numpy as jnp
import pytest

from baryonforge_tpu.Profiles import Arico20 as A20
from defaults import COSMO, bpar_A20

M = np.geomspace(1e11, 1e16, 5)
R = np.geomspace(1e-3, 1e3, 10)
K = np.geomspace(1e-3, 1e3, 10)


@pytest.mark.parametrize("a", [0.25, 0.5, 1.0])
def test_darkmatter_smoke(a):
    dm = A20.DarkMatter(**bpar_A20)
    out = np.asarray(dm.real(COSMO, R, M, a))
    assert out.shape == (5, 10) and np.all(np.isfinite(out))
    out = np.asarray(dm.projected(COSMO, R[:4], M, a))
    assert np.all(np.isfinite(out))
    out = np.asarray(dm.fourier(COSMO, K, M, a))
    assert np.all(np.isfinite(out))


def test_nfw_analytic_norm():
    # enclosed mass within R200c must equal M exactly (analytic norm)
    dm = A20.DarkMatter(**bpar_A20)
    a = 0.8
    Mi = 1e14
    Rh = float(A20._massdef.MassDef200c.get_radius(COSMO, Mi, a)) / a
    r = np.geomspace(1e-6, Rh, 3000)
    rho = np.asarray(dm.real(COSMO, r, Mi, a))
    Menc = np.trapezoid(4 * np.pi * r ** 2 * rho, r)
    np.testing.assert_allclose(Menc, Mi, rtol=2e-3)
    # zero outside R
    assert float(dm.real(COSMO, Rh * 1.01, Mi, a)) == 0.0


def test_fractions_budget():
    p = A20.Gas(**bpar_A20)
    Ms = jnp.geomspace(1e12, 1e15, 8)
    f_str = np.asarray(p.get_f_star(Ms, 1.0, COSMO))
    f_bg, f_rg, f_eg = [np.asarray(x) for x in
                        p._get_gas_frac(Ms, 1.0, COSMO)]
    fb = COSMO.Omega_b / COSMO.Omega_m
    np.testing.assert_allclose(f_str + f_bg + f_rg + f_eg, fb, rtol=1e-6)
    assert np.all(f_bg >= 0) and np.all(f_rg >= 0) and np.all(f_eg >= 0)


def test_gas_component_mass_budget():
    # integrating each gas component to large radius recovers its fraction
    a = 0.8
    Mi = 1e14
    r = np.geomspace(1e-5, 500, 3000)
    gas = A20.Gas(**bpar_A20)
    f_bg, f_rg, f_eg = [float(np.asarray(x)[0]) for x in
                        gas._get_gas_frac(jnp.array([Mi]), a, COSMO)]
    for prof, frac, rtol in [
            (A20.BoundGas(**bpar_A20), f_bg, 2e-2),
            (A20.ReaccretedGas(**bpar_A20), f_rg, 2e-2),
            (A20.EjectedGas(**bpar_A20, cutoff=1e5), f_eg, 2e-2)]:
        rho = np.asarray(prof.real(COSMO, r, Mi, a))
        Menc = np.trapezoid(4 * np.pi * r ** 2 * rho, r)
        np.testing.assert_allclose(Menc, frac * Mi, rtol=rtol)


@pytest.mark.parametrize("cls", ["Stars", "BoundGas", "EjectedGas",
                                 "ReaccretedGas", "Gas",
                                 "ModifiedDarkMatter",
                                 "CollisionlessMatter", "DarkMatterOnly",
                                 "DarkMatterBaryon", "DarkMatterOnlywithLSS",
                                 "DarkMatterBaryonwithLSS", "TwoHalo",
                                 "BoundGasDeprecated"])
def test_component_smoke(cls):
    prof = getattr(A20, cls)(**bpar_A20)
    out = np.asarray(prof.real(COSMO, R, M, 0.5))
    assert out.shape == (5, 10)
    assert np.all(np.isfinite(out)), f"{cls} non-finite"


@pytest.mark.slow
def test_dmb_mass_close_to_dmo():
    # total DMB mass within R200c should be close to M (components sum to
    # f_bar-complete budget inside the halo, minus ejected gas outside)
    a = 0.8
    Mi = 1e14
    Rh = float(A20._massdef.MassDef200c.get_radius(COSMO, Mi, a)) / a
    r = np.geomspace(1e-5, Rh, 2000)
    dmb = A20.DarkMatterBaryon(**bpar_A20)
    rho = np.asarray(dmb.real(COSMO, r, Mi, a))
    Menc = np.trapezoid(4 * np.pi * r ** 2 * rho, r)
    assert 0.8 < Menc / Mi < 1.05


def test_pressure_temperature():
    a = 0.8
    pres = A20.Pressure(**bpar_A20)
    out = np.asarray(pres.real(COSMO, np.geomspace(0.01, 2, 16), 1e14, a))
    assert np.all(np.isfinite(out)) and np.all(out >= 0)
    assert out[0] > out[-1]          # pressure decreases outward

    nt = A20.NonThermalFrac(**bpar_A20)
    f = np.asarray(nt.real(COSMO, np.geomspace(0.01, 10, 16), 1e14, a))
    assert np.all((f >= 0) & (f <= 1))

    T = A20.Temperature(**bpar_A20)
    out = np.asarray(T.real(COSMO, np.geomspace(0.05, 1, 8), 1e14, a))
    assert np.all(np.isfinite(out)) and np.all(out >= 0)
    # cluster-core temperatures are ~1e7-1e8 K
    assert 1e6 < out.max() < 1e9
