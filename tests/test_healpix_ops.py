"""Validation of the native HEALPix (ring scheme) implementation.

healpy is unavailable in this environment, so correctness is established by
(a) exact internal consistency (ang2pix(pix2ang(p)) == p for every pixel),
(b) analytically known NSIDE=1 geometry, (c) brute-force disc membership,
(d) mathematical properties of the bilinear interpolation weights.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from baryonforge_tpu.ops import healpix as hpx


@pytest.mark.parametrize("nside", [1, 2, 4, 16, 64])
def test_pix2ang_ang2pix_roundtrip(nside):
    p = jnp.arange(hpx.npix(nside))
    theta, phi = hpx.pix2ang(nside, p)
    back = np.asarray(hpx.ang2pix(nside, theta, phi))
    np.testing.assert_array_equal(back, np.arange(hpx.npix(nside)))


def test_nside1_known_geometry():
    # NSIDE=1: 12 pixels, rings at z = 2/3 (phi=45,135,225,315 deg),
    # z = 0 (phi=0,90,180,270), z = -2/3 (phi=45,...)
    theta, phi = hpx.pix2ang(1, jnp.arange(12))
    z = np.cos(np.asarray(theta))
    np.testing.assert_allclose(z[:4], 2 / 3, rtol=1e-14)
    np.testing.assert_allclose(z[4:8], 0.0, atol=1e-14)
    np.testing.assert_allclose(z[8:], -2 / 3, rtol=1e-14)
    np.testing.assert_allclose(np.degrees(np.asarray(phi)[:4]),
                               [45, 135, 225, 315], rtol=1e-12)
    np.testing.assert_allclose(np.degrees(np.asarray(phi)[4:8]),
                               [0, 90, 180, 270], atol=1e-12)


@pytest.mark.parametrize("nside", [4, 32])
def test_pix2vec_unit_norm_and_area(nside):
    p = jnp.arange(hpx.npix(nside))
    v = np.asarray(hpx.pix2vec(nside, p))
    np.testing.assert_allclose(np.linalg.norm(v, axis=1), 1.0, rtol=1e-12)
    # center of mass of all pixel centers is the origin (equal-area property)
    np.testing.assert_allclose(v.mean(axis=0), 0.0, atol=1e-12)


def test_ang2pix_assigns_nearest_region():
    # random points: the assigned pixel center must be within 2x the typical
    # pixel radius
    nside = 32
    rng = np.random.default_rng(3)
    n = 500
    theta = np.arccos(rng.uniform(-1, 1, n))
    phi = rng.uniform(0, 2 * np.pi, n)
    p = hpx.ang2pix(nside, jnp.array(theta), jnp.array(phi))
    tc, pc = hpx.pix2ang(nside, p)
    cosd = (np.cos(np.asarray(tc)) * np.cos(theta)
            + np.sin(np.asarray(tc)) * np.sin(theta)
            * np.cos(np.asarray(pc) - phi))
    ang = np.arccos(np.clip(cosd, -1, 1))
    pix_radius = np.sqrt(hpx.nside2pixarea(nside) / np.pi)
    assert np.all(ang < 2.0 * pix_radius)


def test_interp_weights_properties():
    nside = 16
    rng = np.random.default_rng(4)
    n = 300
    theta = np.arccos(rng.uniform(-1, 1, n))
    phi = rng.uniform(0, 2 * np.pi, n)
    pix, wgt = hpx.get_interp_weights(nside, jnp.array(theta), jnp.array(phi))
    pix, wgt = np.asarray(pix), np.asarray(wgt)
    # weights sum to 1, are non-negative, pixels valid
    np.testing.assert_allclose(wgt.sum(axis=1), 1.0, rtol=1e-12)
    assert np.all(wgt > -1e-12)
    assert np.all((pix >= 0) & (pix < hpx.npix(nside)))
    # interpolating the pixel-center z values reproduces z to pixel accuracy
    zmap = np.cos(np.asarray(hpx.pix2ang(nside, jnp.arange(hpx.npix(nside)))[0]))
    interp_z = (zmap[pix] * wgt).sum(axis=1)
    assert np.max(np.abs(interp_z - np.cos(theta))) < 0.01
    # interpolating a constant map is exact
    ones = np.ones(hpx.npix(nside))
    np.testing.assert_allclose((ones[pix] * wgt).sum(axis=1), 1.0, rtol=1e-12)


def test_interp_weights_at_pixel_centers():
    # at a pixel center, the dominant weight must belong to that pixel
    nside = 8
    p = jnp.arange(hpx.npix(nside))
    theta, phi = hpx.pix2ang(nside, p)
    pix, wgt = hpx.get_interp_weights(nside, theta, phi)
    pix, wgt = np.asarray(pix), np.asarray(wgt)
    dominant = pix[np.arange(len(p)), np.argmax(wgt, axis=1)]
    frac_ok = np.mean(dominant == np.asarray(p))
    assert frac_ok > 0.95       # ties at exact ring boundaries allowed


def test_interp_weights_poles():
    nside = 8
    # points very near the poles must still give normalized weights
    for theta0 in [1e-6, np.pi - 1e-6, 0.0, np.pi]:
        pix, wgt = hpx.get_interp_weights(
            nside, jnp.array([theta0]), jnp.array([0.3]))
        np.testing.assert_allclose(np.asarray(wgt).sum(), 1.0, rtol=1e-9)
        assert np.all(np.asarray(pix) >= 0)
        assert np.all(np.asarray(pix) < hpx.npix(nside))


@pytest.mark.parametrize("nside,radius", [(16, 0.3), (32, 0.1), (64, 0.02),
                                          (16, 1.2)])
def test_disc_pixels_vs_bruteforce(nside, radius):
    rng = np.random.default_rng(5)
    allvec = np.asarray(hpx.pix2vec(nside, jnp.arange(hpx.npix(nside))))
    K_ring, K_phi = hpx.disc_pad_sizes(nside, radius)
    for _ in range(6):
        z0 = rng.uniform(-1, 1)
        theta0 = float(np.arccos(z0))
        phi0 = rng.uniform(0, 2 * np.pi)
        pix, mask = hpx.disc_pixels(nside, theta0, phi0, radius,
                                    K_ring, K_phi)
        got = np.sort(np.asarray(pix)[np.asarray(mask)])
        # brute force membership
        c = np.array([np.sin(theta0) * np.cos(phi0),
                      np.sin(theta0) * np.sin(phi0), np.cos(theta0)])
        want = np.where(allvec @ c >= np.cos(radius))[0]
        np.testing.assert_array_equal(got, want)
        assert len(np.unique(got)) == len(got)   # no duplicates


def test_disc_near_pole():
    nside = 16
    K_ring, K_phi = hpx.disc_pad_sizes(nside, 0.3)
    allvec = np.asarray(hpx.pix2vec(nside, jnp.arange(hpx.npix(nside))))
    for theta0 in [0.01, np.pi - 0.01]:
        pix, mask = hpx.disc_pixels(nside, theta0, 1.0, 0.3, K_ring, K_phi)
        got = np.sort(np.asarray(pix)[np.asarray(mask)])
        c = np.array([np.sin(theta0) * np.cos(1.0),
                      np.sin(theta0) * np.sin(1.0), np.cos(theta0)])
        want = np.where(allvec @ c >= np.cos(0.3))[0]
        np.testing.assert_array_equal(got, want)


def test_f32_pole_conditioning_nside4096():
    # at NSIDE>=2048 the cap ring spacing in z drops below f32 eps; the
    # half-angle (sin(theta/2)) formulations must keep f32 results finite
    # and consistent with f64 near the poles
    nside = 4096
    rng = np.random.default_rng(12)
    n = 400
    # points concentrated at both poles + a few belt points
    theta = np.concatenate([10 ** rng.uniform(-5, -1, n // 2),
                            np.pi - 10 ** rng.uniform(-5, -1, n // 2)])
    phi = rng.uniform(0, 2 * np.pi, n)
    p32, w32 = hpx.get_interp_weights(nside, jnp.array(theta, jnp.float32),
                                      jnp.array(phi, jnp.float32),
                                      jnp.float32)
    p64, w64 = hpx.get_interp_weights(nside, jnp.array(theta),
                                      jnp.array(phi), jnp.float64)
    w32, w64 = np.asarray(w32), np.asarray(w64)
    assert np.isfinite(w32).all()
    np.testing.assert_allclose(w32.sum(axis=1), 1.0, atol=1e-5)
    # the 4 neighbours agree with f64 for nearly all points (floor can
    # legitimately flip on exact ring boundaries)
    same = (np.asarray(p32) == np.asarray(p64)).all(axis=1)
    assert same.mean() > 0.97
    # pixel round trip at the pole rings in f32
    p = jnp.arange(0, 64, dtype=jnp.int32)          # first pole rings
    t32, f32 = hpx.pix2ang(nside, p, jnp.float32)
    t64, _ = hpx.pix2ang(nside, p, jnp.float64)
    np.testing.assert_allclose(np.asarray(t32), np.asarray(t64), rtol=3e-6)
    back = np.asarray(hpx.ang2pix(nside, t32, f32))
    assert (back == np.asarray(p)).mean() > 0.95
