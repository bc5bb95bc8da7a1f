"""Displacement-model tests: analytic inversion checks + S19 end-to-end.

The reference has no numeric tests here; we add golden checks using
analytically invertible mass profiles (the displacement of a model against
a scaled copy of itself is known in closed form).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from baryonforge_tpu import Profiles
from baryonforge_tpu.Profiles.BaryonCorrection import (
    Baryonification3D, Baryonification2D, _displacement_rows)
from baryonforge_tpu.Profiles.Base import Profile
from defaults import COSMO, bpar_S19


class PowerLawProfile(Profile):
    """rho ~ r^-2 => M(<r) ~ r: trivially invertible."""
    model_param_names = ["norm", "slope"]

    def __init__(self, norm=1e13, slope=-2.0, **kw):
        super().__init__(**kw)
        self.norm = norm
        self.slope = slope

    def _real(self, cosmo, r, M, a):
        r_use = jnp.atleast_1d(r)
        M_use = jnp.atleast_1d(M)
        return (self.norm * r_use[None, :] ** self.slope
                * jnp.ones([M_use.size, 1]))


def test_displacement_rows_analytic():
    # DMO: M(r) = r (ln M = ln r); DMB: M(r) = (r/s)^1 with s=1.2 (shifted)
    # => d(r) = M_DMB^-1(M_DMO(r)) - r = 1.2 r - r = 0.2 r
    r = np.geomspace(1e-2, 1e2, 64)
    M_DMO = r.copy()
    M_DMB = r / 1.2
    d = np.asarray(_displacement_rows(jnp.log(jnp.array(r)),
                                      jnp.array(M_DMO)[None, :],
                                      jnp.array(M_DMB)[None, :]))[0]
    inner = (r > 2e-2) & (r < 50)      # away from table edges
    np.testing.assert_allclose(d[inner], 0.2 * r[inner], rtol=1e-6)


def test_displacement_rows_identical_profiles():
    # DMO == DMB -> all points masked by the |lnDMB - lnDMO| > 1e-6 rule
    # -> d row becomes NaN (caller zeroes it) — the reference's d=0 fallback
    r = np.geomspace(1e-2, 1e2, 64)
    d = np.asarray(_displacement_rows(jnp.log(jnp.array(r)),
                                      jnp.array(r)[None, :],
                                      jnp.array(r)[None, :]))[0]
    assert np.all(~np.isfinite(d) | (d == 0))


def test_powerlaw_displacement_3d():
    # rho ~ r^-2 with norms A (DMO) and B (DMB):
    # M_dmo(r) = 4 pi A r, M_dmb(r) = 4 pi B r  =>  d(r) = (A/B - 1) r
    DMO = PowerLawProfile(norm=1.0e13)
    DMB = PowerLawProfile(norm=0.8e13)
    model = Baryonification3D(DMO, DMB, COSMO, epsilon_max=200)
    model.setup_interpolator(z_min=0.1, z_max=0.5, N_samples_z=2,
                             M_min=1e13, M_max=1e15, N_samples_Mass=4,
                             R_min=1e-2, R_max=10, N_samples_R=64,
                             verbose=False)
    r = np.geomspace(0.05, 5, 16)
    d = np.asarray(model.displacement(r, 1e14, 1 / 1.3))
    np.testing.assert_allclose(d, (1.0 / 0.8 - 1.0) * r, rtol=2e-2)


def test_s19_displacement_physical():
    # Full S19 DMO/DMB: displacement should be finite, zero far outside
    # epsilon_max R, and negative at intermediate radii (gas pushed out
    # means matter moves outward; sign depends on radius — just check
    # structure and scale)
    DMO = Profiles.DarkMatterOnly(**bpar_S19)
    DMB = Profiles.DarkMatterBaryon(**bpar_S19)
    model = Baryonification3D(DMO, DMB, COSMO, epsilon_max=20)
    model.setup_interpolator(z_min=0.1, z_max=0.3, N_samples_z=2,
                             M_min=1e13, M_max=1e15, N_samples_Mass=6,
                             R_min=1e-3, R_max=50, N_samples_R=64,
                             verbose=False)
    r = np.geomspace(0.01, 30, 32)
    d = np.asarray(model.displacement(r, 1e14, 1 / 1.2))
    assert np.all(np.isfinite(d))
    assert np.any(d != 0)
    # displacements are sub-Mpc (baryon effects are ~% of halo scale)
    assert np.max(np.abs(d)) < 1.0
    # contraction (d<0) in the core where stars dominate, expansion (d>0)
    # at gas-ejection scales
    assert d[0] < 0 and np.max(d) > 0
    # far outside the halo the displacement must vanish
    d_far = np.asarray(model.displacement(np.array([100.0]), 1e14, 1 / 1.2))
    assert d_far[0] == 0.0


def test_s19_displacement_2d():
    DMO = Profiles.DarkMatterOnly(**bpar_S19, proj_cutoff=100)
    DMB = Profiles.DarkMatterBaryon(**bpar_S19, proj_cutoff=100)
    model = Baryonification2D(DMO, DMB, COSMO, epsilon_max=20)
    model.setup_interpolator(z_min=0.1, z_max=0.3, N_samples_z=2,
                             M_min=1e13, M_max=1e15, N_samples_Mass=4,
                             R_min=1e-3, R_max=50, N_samples_R=48,
                             verbose=False)
    r = np.geomspace(0.05, 10, 16)
    d = np.asarray(model.displacement(r, 1e14, 1 / 1.2))
    assert np.all(np.isfinite(d))
    assert np.any(d != 0)


def test_halo_curves_match_displacement():
    # the runner fast path (per-halo curve + 1D log-uniform lookup) must
    # agree with the full table readout
    import jax.numpy as jnp
    from baryonforge_tpu.Profiles.BaryonCorrection import (
        BaryonificationClass)
    DMO = PowerLawProfile(norm=1.0e13)
    DMB = PowerLawProfile(norm=0.8e13)
    model = Baryonification3D(DMO, DMB, COSMO, epsilon_max=200)
    model.setup_interpolator(z_min=0.1, z_max=0.5, N_samples_z=4,
                             M_min=1e13, M_max=1e15, N_samples_Mass=6,
                             R_min=1e-2, R_max=10, N_samples_R=64,
                             verbose=False)
    rng = np.random.default_rng(3)
    M = 10 ** rng.uniform(13.2, 14.8, 12)
    a = 1.0 / (1.0 + rng.uniform(0.12, 0.45, 12))
    r = np.geomspace(0.05, 5, 32)
    curves, ln_r0, dlnr = model.halo_curves(jnp.array(M), jnp.array(a))
    for i in range(12):
        fast = np.asarray(BaryonificationClass.curve_lookup(
            curves[i], ln_r0, dlnr, jnp.array(r)))
        ref = np.asarray(model.displacement(r, M[i], a[i]))
        np.testing.assert_allclose(fast, ref, rtol=1e-10, atol=1e-12)
