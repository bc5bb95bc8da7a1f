"""Disjoint sky tiling for gather-style (scatter-free) HEALPix deposits.

TPU scatter-add is serialized (~50M updates/s measured) and is THE wall of
the baryonification hot loop (reference per-halo loop:
HealpixRunner.py:315-373; our round-1 phase A spent 44 s at NSIDE=4096 on
it). This module inverts the computation: instead of every halo scattering
into its disc pixels, the sphere is partitioned into static rectangular
tiles (ring blocks x phi sectors), halos are binned to the tiles their
discs overlap (host-side, cached), and one dense kernel per tile-bucket
computes every (pixel, halo) pair contribution with vectorized fma math +
small MXU matmuls — no scatter at all. Tile outputs are written back as
whole rows and the flat map view is a single analytic-index gather.

Geometry notes (all closed-form, nothing tabulated):
  * tiles are addressed (block b, sector s); block b covers rings
    [1 + b*RB, 1 + (b+1)*RB); each ring's pixels split into S_b equal-phi
    sectors; a ring segment holds at most K slots (K chosen so
    nr_max/S_b <= K - 1).
  * slot (u, v) of tile (b, s): ring i = 1 + b*RB + u, j = j0(s) + v with
    j0(s) = ceil(s*nr/S - 0.5*shift) -- integer math, see _j0.
  * flat pixel -> (tile, slot) is likewise closed form (slot_index), so
    reassembly is a gather with computed indices, no stored permutation.

Pair math avoids catastrophic f32 cancellation by working in LOCAL tile
coordinates: chord^2(p, h) = |dp - dh|^2 with dp = v_p - c_tile,
dh = v_h - c_tile (|d| <~ 0.1), expanded as |dp|^2 + |dh|^2 - 2 dp.dh with
the cross term on the MXU (precision HIGHEST).
"""

from functools import partial
import numpy as np
import jax
import jax.numpy as jnp

from . import healpix as hpx

__all__ = ["SkyTiling", "bin_halos_to_tiles", "bucket_tiles"]


class SkyTiling:
    """Static tiling of a RING-ordered HEALPix sphere.

    Parameters
    ----------
    nside : int
    ring_block : rings per block (RB)
    seg_slots : slots per ring segment (K); sectors are chosen per block
        so every segment fits: S_b = ceil(nr_max_b / (K - 2)).
    """

    def __init__(self, nside, ring_block=16, seg_slots=32):
        self.nside = int(nside)
        self.RB = int(ring_block)
        self.K = int(seg_slots)
        N = self.nside
        n_rings = 4 * N - 1
        self.n_blocks = -(-n_rings // self.RB)

        i0 = 1 + self.RB * np.arange(self.n_blocks)
        i_hi = np.minimum(i0 + self.RB - 1, n_rings)
        nr_max = 4 * np.minimum(np.maximum(i_hi, 4 * N - i0), N)
        self.S = np.maximum(1, -(-nr_max // (self.K - 2))).astype(np.int64)
        # belt-pure blocks (all rings in [N, 3N], nr = 4N = const): pick S
        # so segments are EXACTLY K pixels — then the tile-major layout of
        # those blocks is a pure transpose of flat ring order and the flat
        # view needs no gather there (flat_parts below)
        belt = (i0 >= N) & (i_hi <= 3 * N)
        if 4 * N % self.K == 0:
            self.S = np.where(belt, 4 * N // self.K, self.S)
        self._belt_exact = belt & (self.S * self.K == 4 * N)
        self.i0 = i0.astype(np.int64)
        self.tile_off = np.concatenate([[0], np.cumsum(self.S)])
        self.n_tiles = int(self.tile_off[-1])

        # per-tile host arrays
        self.tile_block = np.repeat(np.arange(self.n_blocks), self.S)
        self.tile_s = (np.arange(self.n_tiles)
                       - self.tile_off[self.tile_block])
        self.tile_i0 = self.i0[self.tile_block]
        self.tile_S = self.S[self.tile_block]

        # tile centers (unit vectors) + block theta ranges, for binning
        th_lo = _ring_theta_np(N, np.maximum(self.i0 - 0.5, 0.5))
        th_hi = _ring_theta_np(
            N, np.minimum(self.i0 + self.RB - 0.5, n_rings + 0.5))
        self.block_th_lo = th_lo
        self.block_th_hi = th_hi
        th_c = 0.5 * (th_lo + th_hi)[self.tile_block]
        ph_c = 2.0 * np.pi * (self.tile_s + 0.5) / self.tile_S
        st, ct = np.sin(th_c), np.cos(th_c)
        self.tile_center = np.stack(
            [st * np.cos(ph_c), st * np.sin(ph_c), ct], axis=1)

    # -- device-side closed-form geometry ------------------------------
    def slot_pixels(self, i0_t, s_t, S_t):
        """Per-slot (pix, phi, valid) for one tile; also per-ring
        (theta_r, sin, cos). All jnp, shapes (RB, K)."""
        N = self.nside
        RB, K = self.RB, self.K
        u = jnp.arange(RB, dtype=jnp.int32)
        i = i0_t.astype(jnp.int32) + u
        ring_ok = (i >= 1) & (i <= 4 * N - 1)
        i_c = jnp.clip(i, 1, 4 * N - 1)
        sp, nr, _, sh = hpx.ring_info(N, i_c, jnp.float64)
        sh_i = sh.astype(jnp.int32)
        S = S_t.astype(jnp.int32)
        s = s_t.astype(jnp.int32)
        j0 = (2 * s * nr - sh_i * S + 2 * S - 1) // (2 * S)
        j1 = (2 * (s + 1) * nr - sh_i * S + 2 * S - 1) // (2 * S)
        v = jnp.arange(K, dtype=jnp.int32)
        j = j0[:, None] + v[None, :]
        valid = (v[None, :] < (j1 - j0)[:, None]) & ring_ok[:, None]
        jw = jnp.where(j < nr[:, None], j, j - nr[:, None])
        pix = sp[:, None] + jw
        theta_r = hpx.ring_theta(N, i_c, jnp.float64)
        dphi = 2.0 * jnp.pi / nr
        phi = (jw.astype(jnp.float64) + 0.5 * sh[:, None]) * dphi[:, None]
        return pix, phi, valid, theta_r

    def slot_index(self, p):
        """Flat RING pixel id -> linear slot index into the
        (n_tiles * RB * K) tile-major layout. Closed-form int math (jnp).

        int32 throughout (int64 is software-emulated on TPU and this runs
        once per map pixel); valid while npix and n_tiles*RB*K < 2^31,
        i.e. NSIDE <= 8192 with the default slot geometry. The cap-ring
        sqrt runs in f64 on the raw pixel id (exact for p < 2^52).
        """
        N = self.nside
        RB, K = self.RB, self.K
        p = jnp.asarray(p, dtype=jnp.int32)
        ncap = 2 * N * (N - 1)
        npx = 12 * N * N

        # ring i and in-ring index j (mirrors hpx.pix2ang int logic)
        pf = p.astype(jnp.float64)
        i_n = ((1 + jnp.sqrt(1.0 + 2.0 * pf)) / 2.0).astype(jnp.int32)
        i_n = jnp.where(2 * i_n * (i_n - 1) > p, i_n - 1, i_n)
        i_n = jnp.where(2 * i_n * (i_n + 1) <= p, i_n + 1, i_n)
        j_n = p - 2 * i_n * (i_n - 1)

        pe = p - ncap
        i_e = N + pe // (4 * N)
        j_e = pe % (4 * N)

        ps = (npx - 1) - p
        psf = ps.astype(jnp.float64)
        i_ss = ((1 + jnp.sqrt(1.0 + 2.0 * psf)) / 2.0).astype(jnp.int32)
        i_ss = jnp.where(2 * i_ss * (i_ss - 1) > ps, i_ss - 1, i_ss)
        i_ss = jnp.where(2 * i_ss * (i_ss + 1) <= ps, i_ss + 1, i_ss)
        j_s = 4 * i_ss - 1 - (ps - 2 * i_ss * (i_ss - 1))

        north = p < ncap
        south = p >= npx - ncap
        i = jnp.where(north, i_n, jnp.where(south, 4 * N - i_ss, i_e))
        j = jnp.where(north, j_n, jnp.where(south, j_s, j_e))
        nr = jnp.where(north, 4 * i_n,
                       jnp.where(south, 4 * i_ss, 4 * N))
        sh = jnp.where(north | south, 1,
                       jnp.where((i - N) % 2 == 0, 1, 0))

        b = (i - 1) // RB
        u = (i - 1) - b * RB
        S = jnp.asarray(self.S, dtype=jnp.int32)[b]
        off = jnp.asarray(self.tile_off[:-1], dtype=jnp.int32)[b]
        s = (2 * j + sh) * S // (2 * nr)
        j0 = (2 * s * nr - sh * S + 2 * S - 1) // (2 * S)
        v = j - j0
        return ((off + s) * RB + u) * K + v


    def flat_view(self, acc):
        """Tile-major accumulator (n_tiles, RB*K, ...) -> flat RING order
        (npix, ...).

        Belt-exact blocks (segments of exactly K pixels) reassemble with a
        pure transpose+reshape (memory-bandwidth); only the polar caps go
        through the computed-index gather (~1/3 of pixels) — the full
        gather was the measured phase-A bottleneck after the hat kernel.
        """
        N = self.nside
        RB, K = self.RB, self.K
        npix = 12 * N * N
        trail = acc.shape[2:]
        flat_slots = acc.reshape((self.n_tiles * RB * K,) + trail)

        blocks = np.where(self._belt_exact)[0]
        if blocks.size == 0:
            lin = self.slot_index(jnp.arange(npix, dtype=jnp.int32))
            return flat_slots[lin]
        b0, b1 = int(blocks[0]), int(blocks[-1])
        ncap = 2 * N * (N - 1)
        ring0 = int(self.i0[b0])
        ring1 = int(self.i0[b1]) + RB - 1
        sp0 = ncap + (ring0 - N) * 4 * N
        sp1 = ncap + (ring1 + 1 - N) * 4 * N
        t0 = int(self.tile_off[b0])
        t1 = int(self.tile_off[b1 + 1])
        S = int(self.S[b0])
        NB = b1 - b0 + 1

        belt = acc[t0:t1].reshape((NB, S, RB, K) + trail)
        belt = jnp.swapaxes(belt, 1, 2).reshape((sp1 - sp0,) + trail)
        head = flat_slots[self.slot_index(
            jnp.arange(sp0, dtype=jnp.int32))]
        tail = flat_slots[self.slot_index(
            jnp.arange(sp1, npix, dtype=jnp.int32))]
        return jnp.concatenate([head, belt, tail], axis=0)


def _ring_theta_np(N, i):
    """Host-side ring colatitude for (possibly fractional) ring index."""
    i = np.asarray(i, dtype=float)
    i_s = 4 * N - i
    th_n = 2.0 * np.arcsin(np.clip(i / (np.sqrt(6.0) * N), 0, 1))
    th_s = np.pi - 2.0 * np.arcsin(np.clip(i_s / (np.sqrt(6.0) * N), 0, 1))
    z_e = 4.0 / 3.0 - 2.0 * i / (3.0 * N)
    th_e = np.arccos(np.clip(z_e, -1, 1))
    return np.where(i < N, th_n, np.where(i > 3 * N, th_s, th_e))


def _ring_of_theta_np(N, theta):
    """Host-side ring_above + 1 style ring index of a colatitude."""
    theta = np.clip(theta, 0.0, np.pi)
    z = np.cos(theta)
    polar = np.abs(z) > 2.0 / 3.0
    rt6N = np.sqrt(6.0) * N
    irn = np.floor(rt6N * np.sin(0.5 * theta)).astype(np.int64)
    irs = np.floor(rt6N * np.cos(0.5 * theta)).astype(np.int64)
    ring_pol = np.where(z > 0, irn, 4 * N - irs - 1)
    ring_eq = np.floor(N * (2.0 - 1.5 * z)).astype(np.int64)
    return np.where(polar, ring_pol, ring_eq)


def bin_halos_to_tiles(tiling, theta, phi, radius, margin_pix=2.0):
    """Host-side: (tile_id, halo_id) pairs for every tile each halo's disc
    (angular radius ``radius``) may touch. Vectorized numpy; cached by the
    caller. ``margin_pix`` widens the phi window by that many pixel widths
    (slot centers vs disc edges)."""
    N = tiling.nside
    RB = tiling.RB
    theta = np.asarray(theta, float)
    phi = np.mod(np.asarray(phi, float), 2 * np.pi)
    radius = np.asarray(radius, float)
    n = theta.size

    i_lo = np.clip(_ring_of_theta_np(N, theta - radius), 1, 4 * N - 1)
    i_hi = np.clip(_ring_of_theta_np(N, theta + radius) + 1, 1, 4 * N - 1)
    b_lo = (i_lo - 1) // RB
    b_hi = (i_hi - 1) // RB
    max_d = int((b_hi - b_lo).max()) + 1 if n else 0

    tiles_all, halos_all = [], []
    sin_r = np.sin(np.minimum(radius, 0.5 * np.pi))
    for d in range(max_d):
        b = b_lo + d
        act = b <= b_hi
        if not act.any():
            continue
        idx = np.where(act)[0]
        bb = b[idx]
        # effective theta band of the disc inside this block
        t_lo = np.maximum(theta[idx] - radius[idx], tiling.block_th_lo[bb])
        t_hi = np.minimum(theta[idx] + radius[idx], tiling.block_th_hi[bb])
        # widest phi need: smallest sin(theta) on the band edge (the band
        # cannot cross a pole without touching theta=0/pi)
        sin_min = np.minimum(np.sin(t_lo), np.sin(t_hi))
        # band containing the equator: sin >= sin(t_lo), fine as is
        touches_pole = (t_lo <= 1e-9) | (t_hi >= np.pi - 1e-9)
        w = np.where(
            (sin_min <= sin_r[idx]) | touches_pole, np.pi,
            np.arcsin(np.clip(sin_r[idx] / np.maximum(sin_min, 1e-12),
                              0, 1)))
        # margin: a couple of pixel widths (sector boundaries vs centers)
        S = tiling.S[bb]
        dphi_sec = 2 * np.pi / S
        w = np.minimum(w + margin_pix * np.pi / (2.0 * N)
                       / np.maximum(sin_min, 1e-3), np.pi)
        s_lo = np.floor((phi[idx] - w) / dphi_sec).astype(np.int64)
        s_hi = np.floor((phi[idx] + w) / dphi_sec).astype(np.int64)
        cnt = np.minimum(s_hi - s_lo + 1, S)
        # expand (halo, sector-range) -> pairs
        rep_h = np.repeat(idx, cnt)
        rep_b = np.repeat(bb, cnt)
        rep_s0 = np.repeat(s_lo, cnt)
        rep_S = np.repeat(S, cnt)
        pos = np.arange(cnt.sum()) - np.repeat(
            np.concatenate([[0], np.cumsum(cnt)[:-1]]), cnt)
        s = np.mod(rep_s0 + pos, rep_S)
        tiles_all.append(tiling.tile_off[rep_b] + s)
        halos_all.append(rep_h)
    if not tiles_all:
        return (np.zeros(0, np.int64), np.zeros(0, np.int64))
    return np.concatenate(tiles_all), np.concatenate(halos_all)


def make_tile_deposit(tiling, n_r, mode="displace", dtype=jnp.float32,
                      h_chunk=64, t_chunk=256, log_curves=False,
                      lookup="auto", mesh=None, mesh_axis="halos"):
    """Build the dense per-tile pair kernel (the scatter-free phase A).

    Returns ``run(bucket, halo_pack, extra) -> (tile_ids, out)`` where
    ``bucket = (tile_ids (T,), halo_idx (T, H))`` from :func:`bucket_tiles`
    and ``halo_pack`` is a dict of (n_halos, ...) device arrays:

      vh      (n, 3)  halo unit vectors (f64 host-computed, cast to dtype)
      crit2   (n,)    squared max chord: (2 sin(radius/2))^2
      lnDa    (n,)    ln(D * rscale / a) -- radial log offset of the lookup
      afac    (n,)    multiplies the displacement (comoving -> physical: a)
      invD    (n,)    1 / D (angular diameter distance)
      curves  (n, n_r) per-halo displacement (or paint) curves
      ln_r0, inv_dlnr : scalars of the curve grid (python floats)

    mode="displace": out (T, RB*K, 2) tangent (d theta, sin-theta d phi)
    sums. mode="paint": out (T, RB*K) plain curve-value sums (afac is then
    the per-halo paint scale, e.g. 1/a or pixarea*D^2/a).

    The (P, 3) x (3, H) cross terms run on the MXU at HIGHEST precision;
    everything else is fma-grade elementwise math. No scatter anywhere.
    """
    nside = tiling.nside
    RB, K = tiling.RB, tiling.K
    P = RB * K
    tile_i0 = jnp.asarray(tiling.tile_i0, dtype=jnp.int32)
    tile_s = jnp.asarray(tiling.tile_s, dtype=jnp.int32)
    tile_S = jnp.asarray(tiling.tile_S, dtype=jnp.int32)
    tile_center = jnp.asarray(tiling.tile_center)          # (n_tiles, 3)
    displace = mode == "displace"
    if lookup == "auto":
        # the hat contraction is the TPU-native exact lerp (per-pair
        # gathers serialize, 27x slower — measured); on CPU the gather
        # wins by a similar margin
        lookup = "hat" if jax.default_backend() == "tpu" else "gather"

    def one_tile(tid, hidx, pack, ln_r0, inv_dlnr):
        # ---- slot geometry (f64 ints/trig once per slot, cast to dtype)
        pix, phi, valid, theta_r = tiling.slot_pixels(
            tile_i0[tid], tile_s[tid], tile_S[tid])
        c = tile_center[tid]                                # (3,) f64
        st = jnp.sin(theta_r)[:, None]
        ct = jnp.cos(theta_r)[:, None]
        sphi = jnp.sin(phi)
        cphi = jnp.cos(phi)
        vp = jnp.stack([st * cphi, st * sphi,
                        jnp.broadcast_to(ct, phi.shape)], axis=-1)
        # transposed (3, P) layout: P rides the lane dimension everywhere
        dpT = (vp - c).reshape(P, 3).astype(dtype).T        # local coords
        np2 = jnp.sum(dpT * dpT, axis=0)                    # (P,)
        if displace:
            e_thT = jnp.stack([ct * cphi, ct * sphi,
                               jnp.broadcast_to(-st, phi.shape)],
                              axis=-1).reshape(P, 3).astype(dtype).T
            e_phT = jnp.stack([-sphi, cphi, jnp.zeros_like(phi)],
                              axis=-1).reshape(P, 3).astype(dtype).T
            a_th = -(c.astype(dtype) @ e_thT)               # (P,)
            a_ph = -(c.astype(dtype) @ e_phT)

        # ---- halo-axis scan in chunks (bounds the (h, P) intermediates)
        n_h = hidx.shape[0]
        hc = min(h_chunk, n_h)
        hidx_c = hidx.reshape(n_h // hc, hc)

        def h_body(carry, hi):
            ok = hi >= 0
            hcl = jnp.maximum(hi, 0)
            vh = pack["vh"][hcl].astype(dtype)              # (h, 3)
            dh = vh - c.astype(dtype)[None, :]
            nh2 = jnp.sum(dh * dh, axis=-1)
            # all (h, P): TPU VPU wants the big axis minor; per-pair
            # gathers are 27x slower than this select+fma form (measured)
            G = (dh[:, 0:1] * dpT[0][None, :]
                 + dh[:, 1:2] * dpT[1][None, :]
                 + dh[:, 2:3] * dpT[2][None, :])
            chord2 = nh2[:, None] + np2[None, :] - 2.0 * G
            chord2 = jnp.maximum(chord2, 1e-30)
            x = (0.5 * jnp.log(chord2)
                 + pack["lnDa"][hcl][:, None] - ln_r0) * inv_dlnr
            cv = pack["curves"][hcl]                        # (h, n_r)
            if lookup == "hat":
                # exact linear interp as a hat-basis contraction: the TPU
                # has no per-lane gather, so sum_c max(0, 1-|x-c|)*cv[:,c]
                # IS the native table lookup
                val = jax.lax.fori_loop(
                    0, n_r,
                    lambda cc, acc: acc + jnp.maximum(
                        0.0, 1.0 - jnp.abs(x - cc))
                    * jax.lax.dynamic_slice_in_dim(cv, cc, 1, axis=1),
                    jnp.zeros_like(x))
            else:
                i = jnp.clip(x.astype(jnp.int32), 0, n_r - 2)
                t = x - i.astype(dtype)
                v0 = jnp.take_along_axis(cv, i, axis=1)
                v1 = jnp.take_along_axis(cv, i + 1, axis=1)
                val = v0 * (1.0 - t) + v1 * t
            if log_curves:           # paint curves store log values
                val = jnp.exp(val)
            use = ((x >= 0) & (x <= n_r - 1) & ok[:, None]
                   & (chord2 <= pack["crit2"][hcl][:, None]))
            d = jnp.where(use, val, 0.0) * pack["afac"][hcl][:, None]
            if displace:
                amp = d * jax.lax.rsqrt(chord2) * pack["invD"][hcl][:, None]
                gth = (dh[:, 0:1] * e_thT[0][None, :]
                       + dh[:, 1:2] * e_thT[1][None, :]
                       + dh[:, 2:3] * e_thT[2][None, :])
                gph = (dh[:, 0:1] * e_phT[0][None, :]
                       + dh[:, 1:2] * e_phT[1][None, :]
                       + dh[:, 2:3] * e_phT[2][None, :])
                s0, sth, sph = carry
                s0 = s0 + jnp.sum(amp, axis=0)
                sth = sth + jnp.sum(amp * gth, axis=0)
                sph = sph + jnp.sum(amp * gph, axis=0)
                return (s0, sth, sph), None
            s0, _, _ = carry
            return (s0 + jnp.sum(d, axis=0), s0, s0), None

        z = jnp.zeros(P, dtype=dtype)
        if mesh is not None:     # carry mixes with sharded inputs
            z = jax.lax.pvary(z, (mesh_axis,))
        (s0, sth, sph), _ = jax.lax.scan(h_body, (z, z, z), hidx_c)
        if displace:
            out = jnp.stack([s0 * a_th - sth, s0 * a_ph - sph], axis=-1)
        else:
            out = s0
        return jnp.where(jnp.isfinite(out), out, 0.0)

    def run_all(tid, hid, pack, ln_r0, inv_dlnr):
        # one dispatch: sequential lax.map over tile chunks (bounds the
        # (P, h) intermediates), vmap over tiles inside each chunk
        def chunk(args):
            t, h = args
            return jax.vmap(lambda ti, hi: one_tile(ti, hi, pack, ln_r0,
                                                    inv_dlnr))(t, h)
        out = jax.lax.map(chunk, (tid, hid))
        return out.reshape((-1,) + out.shape[2:])

    if mesh is None:
        jitted = jax.jit(run_all)
        ndev = 1
    else:
        # tiles are disjoint: shard the chunk axis across devices with
        # NO collective (each device owns its chunks' output rows; the
        # caller's accumulator add handles any resharding)
        from jax.sharding import PartitionSpec as _PS

        ndev = mesh.devices.size
        jitted = jax.jit(jax.shard_map(
            run_all, mesh=mesh,
            in_specs=(_PS(mesh_axis), _PS(mesh_axis), _PS(), _PS(),
                      _PS()),
            out_specs=_PS(mesh_axis)))
    _dev_cache = {}

    def run(bucket, pack, ln_r0, inv_dlnr):
        tids_np, hidx_np = bucket
        key = id(hidx_np)
        if key not in _dev_cache:
            # pad/upload ONCE: repeated process() calls (and per-call
            # chunk loops) must not re-ship halo lists over the (slow)
            # host->device link
            T, H = hidx_np.shape
            Hp = (-(-H // 8) * 8 if H <= h_chunk
                  else -(-H // h_chunk) * h_chunk)
            Tp = min(t_chunk, max(8, T))
            nch = -(-(-(-T // Tp)) // ndev) * ndev   # ceil to ndev multiple
            hid = np.full((nch * Tp, Hp), -1, dtype=np.int32)
            hid[:T, :H] = hidx_np
            tid = np.zeros(nch * Tp, dtype=np.int32)
            tid[:T] = tids_np
            _dev_cache[key] = (jnp.asarray(tid.reshape(nch, Tp)),
                               jnp.asarray(hid.reshape(nch, Tp, Hp)))
        tid_d, hid_d = _dev_cache[key]
        out = jitted(tid_d, hid_d, pack, ln_r0, inv_dlnr)
        return tids_np, out[:tids_np.shape[0]]

    return run


def bucket_tiles(tile_ids, halo_ids, n_buckets=4, h_align=8):
    """Group (tile, halo) pairs into per-tile halo lists, bucketed by list
    length so each bucket runs one static-shape kernel.

    Returns a list of (tiles (T,), halo_idx (T, H) int32 padded with -1).
    """
    order = np.argsort(tile_ids, kind="stable")
    t_sorted = tile_ids[order]
    h_sorted = halo_ids[order]
    utiles, starts, counts = np.unique(t_sorted, return_index=True,
                                       return_counts=True)
    if utiles.size == 0:
        return []
    # bucket edges: geometric in count
    cmax = int(counts.max())
    edges = [0]
    c = max(h_align, int(np.ceil(counts.min() / h_align) * h_align))
    while c < cmax:
        edges.append(c)
        c *= 4
    edges.append(cmax)
    buckets = []
    for lo, hi in zip(edges[:-1], edges[1:]):
        sel = (counts > lo) & (counts <= hi)
        if not sel.any():
            continue
        T = int(sel.sum())
        H = int(np.ceil(hi / h_align) * h_align)
        hidx = np.full((T, H), -1, dtype=np.int32)
        st = starts[sel]
        ct = counts[sel]
        rows = np.repeat(np.arange(T), ct)
        cols = (np.arange(ct.sum())
                - np.repeat(np.concatenate([[0], np.cumsum(ct)[:-1]]), ct))
        src = np.concatenate([np.arange(s, s + c) for s, c in zip(st, ct)])
        hidx[rows, cols] = h_sorted[src].astype(np.int32)
        buckets.append((utiles[sel].astype(np.int32), hidx))
    return buckets
