"""Tests of the JAX cosmology core against analytic / scipy references."""

import numpy as np
import jax.numpy as jnp
from scipy import integrate as sintegrate

from baryonforge_tpu import cosmo
from baryonforge_tpu.utils import constants as const

COSMO = cosmo.Cosmology(Omega_m=0.3, Omega_b=0.045, h=0.7,
                        sigma8=0.8, n_s=0.96, w0=-1.0)


def test_Eofa_basics():
    assert np.isclose(float(cosmo.Eofa(COSMO, 1.0)), 1.0, rtol=1e-12)
    # matter domination scaling
    e = float(cosmo.Eofa(COSMO, 0.01))
    assert np.isclose(e, np.sqrt(0.3 * 1e6 + COSMO.Omega_r * 1e8
                                 + COSMO.Omega_de), rtol=1e-12)


def test_comoving_distance_vs_quad():
    for a in [0.9, 0.5, 0.2]:
        ref, _ = sintegrate.quad(
            lambda x: 1.0 / (x * x * float(cosmo.Eofa(COSMO, x))), a, 1.0,
            epsabs=1e-12, epsrel=1e-12)
        ref *= const.C_LIGHT / (100.0 * COSMO.h)
        ours = float(cosmo.comoving_radial_distance(COSMO, a)[0])
        np.testing.assert_allclose(ours, ref, rtol=1e-8)


def test_angular_diameter_distance():
    a = 0.5
    chi = float(cosmo.comoving_radial_distance(COSMO, a)[0])
    da = float(cosmo.angular_diameter_distance(COSMO, a)[0])
    assert np.isclose(da, a * chi, rtol=1e-12)


def test_growth_factor():
    D = np.asarray(cosmo.growth_factor(COSMO, np.array([1.0, 0.5, 0.1, 0.01])))
    assert np.isclose(D[0], 1.0, rtol=1e-10)
    assert np.all(np.diff(D) < 0)
    # At high z, growth suppression g = D/a approaches the EdS-era plateau:
    # D(a)/a should be nearly constant between a=0.01 and a=0.02
    D2 = np.asarray(cosmo.growth_factor(COSMO, np.array([0.01, 0.02])))
    g1, g2 = D2[0] / 0.01, D2[1] / 0.02
    assert abs(g1 / g2 - 1) < 5e-3
    # LCDM z=0 suppression is ~0.77-0.80 for these params
    g0 = D[0] / (D2[0] / 0.01)
    assert 0.7 < g0 < 0.85


def test_sigma8_normalization():
    s8 = float(cosmo.sigmaR(COSMO, 8.0 / COSMO.h, a=1.0))
    np.testing.assert_allclose(s8, COSMO.sigma8, rtol=1e-10)
    # sigma(M) decreasing in M
    s = np.asarray(cosmo.sigmaM(COSMO, np.geomspace(1e11, 1e16, 6), a=1.0))
    assert np.all(np.diff(s) < 0)
    # redshift scaling via growth
    s_z = float(cosmo.sigmaM(COSMO, 1e14, a=0.5))
    s_0 = float(cosmo.sigmaM(COSMO, 1e14, a=1.0))
    D = float(cosmo.growth_factor(COSMO, 0.5))
    np.testing.assert_allclose(s_z / s_0, D, rtol=1e-10)


def test_correlation_3d_positive_smallr():
    r = np.geomspace(0.1, 50, 32)
    xi = np.asarray(cosmo.correlation_3d(COSMO, r, a=1.0))
    assert xi[0] > 1.0           # strongly clustered at 0.1 Mpc
    assert np.all(np.diff(xi[:20]) < 0)  # decreasing before BAO scales


def test_massdef_radius():
    md = cosmo.MassDef200c
    M = 1e14
    a = 0.6
    R = float(md.get_radius(COSMO, M, a))
    rho_c = float(cosmo.rho_crit(COSMO, a))
    np.testing.assert_allclose(4 / 3 * np.pi * 200 * rho_c * R ** 3, M, rtol=1e-12)
    np.testing.assert_allclose(float(md.get_mass(COSMO, R, a)), M, rtol=1e-12)


def test_translate_mass_consistency():
    # translating to the same def returns identity
    md = cosmo.MassDef200c
    M = jnp.array([1e13, 1e14, 1e15])
    M2, c2 = cosmo.translate_mass(COSMO, M, 1.0, jnp.array([5.0, 5.0, 5.0]),
                                  md, md)
    np.testing.assert_allclose(np.asarray(M2), np.asarray(M), rtol=1e-6)
    # 200m mass should exceed 200c mass (rho_m < rho_c -> larger radius)
    M2m, _ = cosmo.translate_mass(COSMO, M, 1.0, jnp.array([5.0, 5.0, 5.0]),
                                  md, cosmo.MassDef200m)
    assert np.all(np.asarray(M2m) > np.asarray(M))


def test_concentrations_sane():
    M = jnp.geomspace(1e12, 1e15, 8)
    for rel in [cosmo.ConcentrationDiemer15(), cosmo.ConcentrationDuffy08(),
                cosmo.ConcentrationBhattacharya13(),
                cosmo.ConcentrationPrada12()]:
        c = np.asarray(rel(COSMO, M, 1.0))
        assert np.all((c > 1.0) & (c < 30.0)), f"{rel} out of range: {c}"
    # Duffy08 exact power law check
    c = np.asarray(cosmo.ConcentrationDuffy08()(COSMO, jnp.array([2e12 / 0.7]), 1.0))
    np.testing.assert_allclose(c, 5.71, rtol=1e-12)


def test_generic_concentration_remap():
    base = cosmo.ConcentrationDuffy08()
    remapped = cosmo.GenericConcentration(base, cosmo.MassDef200m)
    M = jnp.array([1e13, 1e14])
    c_m = np.asarray(remapped(COSMO, M, 1.0))
    c_c = np.asarray(base(COSMO, M, 1.0))
    # 200m concentration should be larger (R200m > R200c, same r_s)
    assert np.all(c_m > c_c)
