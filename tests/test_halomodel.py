"""Halo-model calculator tests: mass-function sanity + P(k) limits."""

import numpy as np
import jax.numpy as jnp
import pytest

from baryonforge_tpu.utils import halomodel as hm
from baryonforge_tpu import Profiles, cosmo as bcosmo
from baryonforge_tpu.Profiles.misc import Mdelta_to_Mtot
from defaults import COSMO, bpar_S19


def test_mass_functions_sane():
    M = jnp.geomspace(1e10, 1e16, 16)
    for mf in [hm.MassFuncShethTormen(), hm.MassFuncTinker08()]:
        n = np.asarray(mf(COSMO, M, 1.0))
        assert np.all(n > 0)
        assert np.all(np.diff(np.log(n)) < 0)       # steeply decreasing
        # exponential cluster cutoff: 1e16 halos are ultra-rare
        assert n[-1] / n[0] < 1e-8


def test_st_mass_fraction():
    # ∫ n(M) M dM over the resolved range carries the bulk of rho_m
    # (the nu -> 0 tail is cut off by the finite sigma(M) grid; the
    # FlexibleHMCalculator counter-terms absorb exactly this remainder)
    mf = hm.MassFuncShethTormen()
    M = jnp.geomspace(1e4, 1e17, 256)
    n = np.asarray(mf(COSMO, M, 1.0))
    integ = np.trapezoid(n * np.asarray(M), np.log10(np.asarray(M)))
    from baryonforge_tpu.cosmo import core
    rho_m = float(core.rho_x(COSMO, 1.0, "matter", is_comoving=True))
    assert 0.5 < integ / rho_m < 1.02


def test_bias_increasing():
    b = np.asarray(hm.HaloBiasShethTormen()(
        COSMO, jnp.geomspace(1e12, 1e16, 8), 1.0))
    assert np.all(np.diff(b) > 0) and b[0] < 1.5 and b[-1] > 3


def test_halomodel_power_limits():
    # with an NFW-ish profile, P_hm -> P_lin * <b>^2 ~ P_lin at low k and
    # exceeds P_lin at high k (1-halo term)
    dm = Profiles.DarkMatter(**bpar_S19)
    hmc = hm.FlexibleHMCalculator(
        mass_function=hm.MassFuncShethTormen(),
        halo_bias=hm.HaloBiasShethTormen(),
        halo_m_to_mtot=Mdelta_to_Mtot(dm),
        log10M_min=10, log10M_max=16, nM=64)
    k = np.geomspace(1e-3, 10, 16)
    pk = np.asarray(hm.halomodel_power(COSMO, k, 1.0, dm, hmc))
    from baryonforge_tpu.cosmo import power
    pk_lin = np.asarray(power.linear_power(COSMO, jnp.asarray(k), 1.0))
    assert np.all(np.isfinite(pk)) and np.all(pk > 0)
    np.testing.assert_allclose(pk[0], pk_lin[0], rtol=0.3)    # 2-halo limit
    assert pk[-1] > pk_lin[-1]                                # 1-halo boost
