"""Spherical-harmonic analysis of RING-ordered HEALPix maps.

TPU-native replacement for the ``healpy.anafast`` step of the reference's
Delta-Cl validation workflows (reference examples
09_Reproduce_Schneider_deltaCls.ipynb; the reference package itself
delegates all SHT to healpy). Exploits the RING layout the way libsharp
does: each iso-latitude ring has uniformly spaced phi centers, so the
m-transform per ring is a DFT (here a cos/sin matmul — no complex dtypes,
TPU-safe, see ops/fftlog.py for why), and the colatitude transform is an
associated-Legendre recurrence over l at fixed m.

a_lm = sum_rings  P_lm(z_r) * [Omega_p * sum_{j in ring} map_j e^{-i m phi_j}]

Intended for validation and post-processing at moderate lmax (the
recurrence is materialized per (ring, l, m); lmax <= ~3 nside and a few
hundred works comfortably).
"""

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import healpix as hpx

__all__ = ["ring_alm_real", "anafast"]


def _ring_geometry(nside):
    """Host-side per-ring (start, count, z, shifted phi0)."""
    N = nside
    i = np.arange(1, 4 * N)
    i_s = 4 * N - i
    nr = np.where(i < N, 4 * i, np.where(i > 3 * N, 4 * i_s, 4 * N))
    ncap = 2 * N * (N - 1)
    npx = 12 * N * N
    sp = np.where(i < N, 2 * i * (i - 1),
                  np.where(i > 3 * N, npx - 2 * i_s * (i_s + 1),
                           ncap + (i - N) * 4 * N))
    z = np.where(i < N, 1.0 - i ** 2 / (3.0 * N ** 2),
                 np.where(i > 3 * N, -1.0 + i_s ** 2 / (3.0 * N ** 2),
                          4.0 / 3.0 - 2.0 * i / (3.0 * N)))
    shifted = np.where((i < N) | (i > 3 * N), 1.0,
                       np.where((i - N) % 2 == 0, 1.0, 0.0))
    phi0 = 0.5 * shifted * (2.0 * np.pi / nr)
    return sp, nr, z, phi0


def _legendre_lambda(z, lmax):
    """Normalized associated Legendre lambda_lm(z) for all 0<=m<=l<=lmax.

    lambda_lm = sqrt((2l+1)/(4pi) (l-m)!/(l+m)!) P_lm(z): the spherical
    harmonic is Y_lm = lambda_lm e^{i m phi}. Standard stable recurrence:
    diagonal lambda_mm, then upward in l. Returns (n_ring, L, L) with
    zeros for m > l (L = lmax + 1).
    """
    z = jnp.asarray(z)
    L = lmax + 1
    s = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))        # sin(theta)

    # diagonal: lambda_mm = sqrt((2m+1)/(4pi)) * prod_{k<=m} sqrt((2k-1)/(2k)) * (-s)^m ...
    # using the healpix convention WITHOUT Condon-Shortley sign on output
    # Cl (signs cancel in |alm|^2 anyway).
    def diag(m):
        # lambda_mm(z) = sqrt(1/(4pi)) * sqrt(prod_{k=1..m} (2k+1)/(2k)) * s^m
        k = jnp.arange(1, lmax + 1)
        fac = jnp.where(k <= m, (2.0 * k + 1.0) / (2.0 * k), 1.0)
        amp = jnp.sqrt(jnp.prod(fac) / (4.0 * jnp.pi))
        return amp * s ** m                             # (n_ring,)

    lam_mm = jax.vmap(diag)(jnp.arange(L))              # (L, n_ring)

    def per_m(m, lmm):
        # upward recurrence in l at fixed m:
        # a_l lambda_{l,m} = z lambda_{l-1,m} - b_l lambda_{l-2,m}
        l = jnp.arange(L).astype(z.dtype)
        mf = m.astype(z.dtype)
        a = jnp.sqrt(((2 * l + 1) * (2 * l - 1))
                     / jnp.maximum((l - mf) * (l + mf), 1.0))
        b = jnp.sqrt(jnp.maximum(
            (2 * l + 1) * (l - 1 - mf) * (l - 1 + mf), 0.0)
            / jnp.maximum((2 * l - 3) * (l - mf) * (l + mf), 1.0))

        def step(carry, li):
            prev, prev2 = carry
            cur = a[li] * (z * prev - b[li] / a[li] * prev2)
            # only valid for li > m; keep lmm at li == m, zero below
            cur = jnp.where(li == m, lmm,
                            jnp.where(li < m, 0.0, cur))
            return (cur, prev), cur

        _, lam = jax.lax.scan(step, (jnp.zeros_like(lmm),
                                     jnp.zeros_like(lmm)),
                              jnp.arange(L))
        return lam                                      # (L, n_ring)

    lam = jax.vmap(per_m)(jnp.arange(L), lam_mm)        # (m, l, n_ring)
    return jnp.moveaxis(lam, -1, 0)                     # (n_ring, m, l)


def ring_alm_real(nside, hmap, lmax):
    """(Re, Im) of a_lm for m >= 0, shapes (L, L) indexed [m, l]."""
    sp, nr, z, phi0 = _ring_geometry(nside)
    L = lmax + 1
    npix = 12 * nside * nside
    omega = 4.0 * jnp.pi / npix
    hmap = jnp.asarray(hmap, dtype=jnp.float64)

    # per-ring m-modes F_m = sum_j map_j e^{-i m phi_j}; phi_j = phi0 + j dphi
    # => F_m = e^{-i m phi0} sum_j map_j e^{-i m j dphi}. Rings have
    # different lengths: pad to the longest and mask.
    nmax = int(nr.max())
    idx = sp[:, None] + np.minimum(np.arange(nmax)[None, :],
                                   (nr - 1)[:, None])
    mask = np.arange(nmax)[None, :] < nr[:, None]
    ring_vals = jnp.where(jnp.asarray(mask), hmap[jnp.asarray(idx)], 0.0)

    m = jnp.arange(L)
    # phase matrices per ring: (n_ring, L, nmax) is large; contract per m
    # via matmul over j with ring-specific dphi: cos/sin(m j dphi).
    j = jnp.arange(nmax)
    dphi = jnp.asarray(2.0 * np.pi / nr)

    def per_ring(vals, dp, p0):
        ang = m[:, None] * j[None, :] * dp              # (L, nmax)
        cr = jnp.cos(ang) @ vals
        ci = -jnp.sin(ang) @ vals
        # shift by phi0
        c0, s0 = jnp.cos(m * p0), jnp.sin(m * p0)
        return cr * c0 + ci * s0, ci * c0 - cr * s0

    Fr, Fi = jax.vmap(per_ring)(ring_vals, dphi, jnp.asarray(phi0))
    lam = _legendre_lambda(jnp.asarray(z), lmax)        # (n_ring, m, l)
    alm_r = jnp.einsum("rm,rml->ml", Fr, lam) * omega
    alm_i = jnp.einsum("rm,rml->ml", Fi, lam) * omega
    return alm_r, alm_i


def anafast(hmap, lmax=None, nside=None):
    """Angular power spectrum C_l of a RING map (healpy.anafast analog).

    C_l = 1/(2l+1) [ |a_l0|^2 + 2 sum_{m>0} |a_lm|^2 ].
    """
    hmap = np.asarray(hmap)
    if nside is None:
        nside = int(np.sqrt(hmap.size / 12))
    assert 12 * nside * nside == hmap.size, "not a healpix map"
    if lmax is None:
        lmax = 3 * nside - 1
    alm_r, alm_i = ring_alm_real(nside, hmap, lmax)
    p = alm_r ** 2 + alm_i ** 2                         # (m, l)
    m = jnp.arange(lmax + 1)[:, None]
    l = jnp.arange(lmax + 1)[None, :]
    w = jnp.where(m == 0, 1.0, 2.0) * (m <= l)
    cl = jnp.sum(p * w, axis=0) / (2.0 * l[0] + 1.0)
    return np.asarray(cl)
