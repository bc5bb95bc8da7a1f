"""Phase-B pole pass-through: a displacement pushing a pixel across a pole
must land it at phi + pi (the reference's 3D-vector normalize gives this
implicitly, HealpixRunner.py:357-365; round 1 dropped the phi flip).
"""

import numpy as np
import jax.numpy as jnp

from baryonforge_tpu.Runners.HealpixRunner import BaryonifyShell
from baryonforge_tpu.ops import healpix as hpx


def _run_phase_b(nside, po, orig):
    npix = 12 * nside * nside
    p = jnp.arange(npix, dtype=jnp.int32)
    theta, phi = hpx.pix2ang(nside, p, jnp.float64)
    ang_base = jnp.stack([theta, phi], axis=1)
    return np.asarray(BaryonifyShell._phase_b(
        nside, npix, jnp.float64, ang_base,
        jnp.asarray(po), jnp.asarray(orig)))


def _expect_mass_at(nside, new_map, theta_t, phi_t, mass):
    """The deposited mass must sit on the 4 interp neighbours of the
    target angle."""
    pix, wgt = hpx.get_interp_weights(nside, jnp.asarray([theta_t]),
                                      jnp.asarray([phi_t]))
    got = new_map[np.asarray(pix)[0]].sum()
    np.testing.assert_allclose(got, mass, rtol=1e-10)
    np.testing.assert_allclose(new_map.sum(), mass, rtol=1e-12)


def test_north_pole_passthrough():
    nside = 16
    npix = 12 * nside * nside
    p0 = 1                                    # a ring-1 pixel
    th0, ph0 = (float(np.asarray(x)) for x in hpx.pix2ang(nside, p0))
    po = np.zeros((npix, 2))
    po[p0, 0] = -2.0 * th0                    # push across the north pole
    orig = np.zeros(npix)
    orig[p0] = 3.25
    new = _run_phase_b(nside, po, orig)
    _expect_mass_at(nside, new, th0, ph0 + np.pi, 3.25)


def test_south_pole_passthrough():
    nside = 16
    npix = 12 * nside * nside
    p0 = npix - 2                             # a last-ring pixel
    th0, ph0 = (float(np.asarray(x)) for x in hpx.pix2ang(nside, p0))
    po = np.zeros((npix, 2))
    po[p0, 0] = 2.0 * (np.pi - th0)           # push across the south pole
    orig = np.zeros(npix)
    orig[p0] = 1.5
    new = _run_phase_b(nside, po, orig)
    _expect_mass_at(nside, new, th0, ph0 + np.pi, 1.5)


def test_no_reflection_unaffected():
    nside = 16
    npix = 12 * nside * nside
    rng = np.random.default_rng(3)
    po = np.zeros((npix, 2))
    sel = rng.integers(0, npix, 50)
    po[sel, 0] = rng.uniform(-1e-3, 1e-3, 50)
    po[sel, 1] = rng.uniform(-1e-3, 1e-3, 50)
    orig = rng.exponential(1.0, npix)
    new = _run_phase_b(nside, po, orig)
    np.testing.assert_allclose(new.sum(), orig.sum(), rtol=1e-12)
