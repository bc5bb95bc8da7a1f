"""Pruned + windowed tile deposit == full-sweep deposit (exact).

``ops.tiles.refine_pairs`` drops (tile, halo) pairs whose tile provably
lies outside the halo's disc (the kernel would zero every pixel through
the crit2 mask) and classifies the survivors into "far" pairs that
sweep an n_c-wide curve window instead of all n_r centers. Both
transformations are value-identical up to f32 rounding; these tests pin
that against the full sweep, including polar tiles and the paint2
two-curve kernel.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from baryonforge_tpu.ops import tiles as T


N_R = 48


def _setup(n=250, seed=7, nside=64):
    rng = np.random.default_rng(seed)
    tiling = T.SkyTiling(nside)
    u = rng.uniform(-1, 1, n)
    ph = rng.uniform(0, 2 * np.pi, n)
    th = np.arccos(u)
    # a few halos pinned at the poles (cap tiles + wrap seams)
    th[:4] = [0.01, 0.02, np.pi - 0.01, np.pi - 0.02]
    vh = np.stack([np.sin(th) * np.cos(ph), np.sin(th) * np.sin(ph),
                   np.cos(th)], axis=1)
    radius = rng.uniform(0.02, 0.35, n)
    chord_rad = 2 * np.sin(np.minimum(radius, np.pi) / 2)
    lnDa = np.log(rng.uniform(900, 1100, n))
    pack = dict(
        vh=jnp.asarray(vh),
        crit2=jnp.asarray(chord_rad ** 2, dtype=jnp.float32),
        lnDa=jnp.asarray(lnDa, dtype=jnp.float32),
        afac=jnp.asarray(rng.uniform(0.4, 0.6, n), dtype=jnp.float32),
        invD=jnp.asarray(1.0 / rng.uniform(900, 1100, n),
                         dtype=jnp.float32),
        curves=jnp.asarray(rng.normal(0, 1, (n, N_R)).cumsum(1) * 1e-3,
                           dtype=jnp.float32))
    t_ids, h_ids = T.bin_halos_to_tiles(tiling, th, ph, radius)
    return tiling, vh, chord_rad, lnDa, pack, (t_ids, h_ids)


def _accumulate(tiling, run, buckets, pack, ln_r0, inv):
    P = tiling.RB * tiling.K
    acc = None
    for b in buckets:
        tids, out = run(b, pack, ln_r0, inv)
        if acc is None:
            acc = np.zeros((tiling.n_tiles, P) + tuple(out.shape[2:]),
                           np.float64)
        np.add.at(acc, tids, np.asarray(out, np.float64))
    return acc


def _tile_pixel_vectors(tiling):
    import jax
    from baryonforge_tpu.ops import healpix as hpx
    pix, valid = jax.vmap(tiling.slot_pix)(
        jnp.asarray(tiling.tile_i0), jnp.asarray(tiling.tile_s),
        jnp.asarray(tiling.tile_S))
    th, ph = hpx.pix2ang(tiling.nside,
                         jnp.where(valid, pix, 0).reshape(-1))
    th = np.asarray(th).reshape(valid.shape)
    ph = np.asarray(ph).reshape(valid.shape)
    v = np.stack([np.sin(th) * np.cos(ph), np.sin(th) * np.sin(ph),
                  np.cos(th)], axis=-1)
    return v, np.asarray(valid)


def test_refine_prune_is_exact_and_nonempty():
    """Every pruned pair must have NO pixel inside the halo's disc —
    then dropping it is value-identical (the kernel's crit2 mask would
    have zeroed every pixel). Proven geometrically per pruned pair."""
    tiling, vh, chord_rad, lnDa, pack, (t_ids, h_ids) = _setup()
    far, near = T.refine_pairs(tiling, t_ids, h_ids, vh, chord_rad,
                               inv_dlnr=(N_R - 1) / np.log(6e4),
                               n_c=24, lnDa=lnDa)
    kept = far[0].size + near[0].size
    assert kept < t_ids.size          # something actually pruned
    assert far[0].size > 0            # and something classified far

    kept_set = set(zip(np.concatenate([far[0], near[0]]).tolist(),
                       np.concatenate([far[1], near[1]]).tolist()))
    pruned = [(t, h) for t, h in zip(t_ids.tolist(), h_ids.tolist())
              if (t, h) not in kept_set]
    assert pruned
    pv, valid = _tile_pixel_vectors(tiling)
    for t, h in pruned:
        d = pv[t] - vh[h]
        chord = np.sqrt((d * d).sum(-1))
        chord = np.where(valid[t], chord, np.inf)
        assert chord.min() > chord_rad[h], (t, h)


def _windowed_buckets(far, near, invs, n_c=24):
    return (T.bucket_tiles_binned(
        (far[0], far[1].astype(np.int64), far[2]),
        T.window_tags(invs, n_c))
        + T.bucket_tiles(near[0], near[1].astype(np.int64)))


@pytest.mark.parametrize("mode", ["displace", "paint"])
def test_windowed_matches_full(mode):
    tiling, vh, chord_rad, lnDa, pack, (t_ids, h_ids) = _setup()
    ln_r0 = float(np.log(1e-3))
    inv = float((N_R - 1) / np.log(6e4))
    far, near = T.refine_pairs(tiling, t_ids, h_ids, vh, chord_rad,
                               inv_dlnr=inv, n_c=24, lnDa=lnDa)
    assert far[0].size > 0
    run = T.make_tile_deposit(tiling, N_R, mode=mode)
    full = _accumulate(tiling, run, T.bucket_tiles(
        t_ids, h_ids.astype(np.int64)), pack, ln_r0, inv)
    win = _accumulate(tiling, run,
                      _windowed_buckets(far, near, (inv,)),
                      pack, ln_r0, inv)
    scale = np.abs(full).max()
    np.testing.assert_allclose(win, full, rtol=0, atol=3e-6 * scale)


def test_windowed_matches_full_paint2():
    tiling, vh, chord_rad, lnDa, pack, (t_ids, h_ids) = _setup(n=150)
    n_r2 = 32
    rng = np.random.default_rng(11)
    pack = dict(pack)
    pack["curves2"] = jnp.asarray(
        rng.normal(0, 1, (pack["curves"].shape[0], n_r2)).cumsum(1)
        * 1e-3, dtype=jnp.float32)
    ln_r0 = float(np.log(1e-3))
    inv = float((N_R - 1) / np.log(6e4))
    inv2 = float((n_r2 - 1) / np.log(6e4))
    pack["ln_r0_2"] = jnp.asarray(np.log(2e-3), dtype=jnp.float32)
    pack["inv_dlnr_2"] = jnp.asarray(inv2, dtype=jnp.float32)
    far, near = T.refine_pairs(tiling, t_ids, h_ids, vh, chord_rad,
                               inv_dlnr=(inv, inv2), n_c=24, lnDa=lnDa)
    assert far[0].size > 0
    run = T.make_tile_deposit(tiling, N_R, mode="paint2", n_r2=n_r2,
                              log_curves=False)
    full = _accumulate(tiling, run, T.bucket_tiles(
        t_ids, h_ids.astype(np.int64)), pack, ln_r0, inv)
    win = _accumulate(tiling, run,
                      _windowed_buckets(far, near, (inv, inv2)),
                      pack, ln_r0, inv)
    scale = np.abs(full).max()
    np.testing.assert_allclose(win, full, rtol=0, atol=3e-6 * scale)


def test_tile_crad_bounds_all_slot_pixels():
    """crad must upper-bound the chord from tile center to every valid
    slot pixel — the pruning/window exactness proof rests on it."""
    import jax
    tiling = T.SkyTiling(32)
    pix, valid = jax.vmap(tiling.slot_pix)(
        jnp.asarray(tiling.tile_i0), jnp.asarray(tiling.tile_s),
        jnp.asarray(tiling.tile_S))
    from baryonforge_tpu.ops import healpix as hpx
    th, ph = hpx.pix2ang(tiling.nside, jnp.where(valid, pix, 0)
                         .reshape(-1))
    th = np.asarray(th).reshape(valid.shape)
    ph = np.asarray(ph).reshape(valid.shape)
    v = np.stack([np.sin(th) * np.cos(ph), np.sin(th) * np.sin(ph),
                  np.cos(th)], axis=-1)
    d = v - tiling.tile_center[:, None, None, :]
    chord = np.sqrt((d * d).sum(-1))
    chord = np.where(np.asarray(valid), chord, 0.0)
    assert (chord.max(axis=(1, 2)) <= tiling.tile_crad + 1e-12).all()


def _classed_buckets(tiling, t_ids, h_ids, vh, chord_rad, lnDa, grids):
    far, near = T.refine_pairs(tiling, t_ids, h_ids, vh, chord_rad,
                               inv_dlnr=None, lnDa=None)
    tk, hk = near
    cls = T.classify_tile_windows(tiling, tk, hk, vh, chord_rad, lnDa,
                                  grids)
    assert (cls < len((16, 24, 32, 48))).any()  # some tile got a class
    # min_frac=0: keep even sliver classes so the windowed kernel is
    # actually exercised at this tiny test scale
    return T.bucket_tiles_classed(tk, hk.astype(np.int64), cls,
                                  tuple(g[1] for g in grids),
                                  min_frac=0.0)


@pytest.mark.parametrize("mode", ["displace", "paint"])
def test_tile_window_class_matches_full(mode):
    """Per-tile window classes (classify_tile_windows +
    bucket_tiles_classed) == full sweep, exact to f32 rounding."""
    tiling, vh, chord_rad, lnDa, pack, (t_ids, h_ids) = _setup()
    ln_r0 = float(np.log(1e-3))
    inv = float((N_R - 1) / np.log(6e4))
    run = T.make_tile_deposit(tiling, N_R, mode=mode)
    full = _accumulate(tiling, run, T.bucket_tiles(
        t_ids, h_ids.astype(np.int64)), pack, ln_r0, inv)
    classed = _classed_buckets(tiling, t_ids, h_ids, vh, chord_rad,
                               lnDa, [(ln_r0, inv, N_R)])
    got = _accumulate(tiling, run, classed, pack, ln_r0, inv)
    scale = np.abs(full).max()
    np.testing.assert_allclose(got, full, rtol=0, atol=3e-6 * scale)


def test_tile_window_class_matches_full_paint2():
    tiling, vh, chord_rad, lnDa, pack, (t_ids, h_ids) = _setup(n=150)
    n_r2 = 32
    rng = np.random.default_rng(11)
    pack = dict(pack)
    pack["curves2"] = jnp.asarray(
        rng.normal(0, 1, (pack["curves"].shape[0], n_r2)).cumsum(1)
        * 1e-3, dtype=jnp.float32)
    ln_r0 = float(np.log(1e-3))
    inv = float((N_R - 1) / np.log(6e4))
    inv2 = float((n_r2 - 1) / np.log(6e4))
    ln_r0_2 = float(np.log(2e-3))
    pack["ln_r0_2"] = jnp.asarray(ln_r0_2, dtype=jnp.float32)
    pack["inv_dlnr_2"] = jnp.asarray(inv2, dtype=jnp.float32)
    run = T.make_tile_deposit(tiling, N_R, mode="paint2", n_r2=n_r2)
    full = _accumulate(tiling, run, T.bucket_tiles(
        t_ids, h_ids.astype(np.int64)), pack, ln_r0, inv)
    classed = _classed_buckets(
        tiling, t_ids, h_ids, vh, chord_rad, lnDa,
        [(ln_r0, inv, N_R), (ln_r0_2, inv2, n_r2)])
    got = _accumulate(tiling, run, classed, pack, ln_r0, inv)
    scale = np.abs(full).max()
    np.testing.assert_allclose(got, full, rtol=0, atol=3e-6 * scale)


def test_tile_window_class_covers_used_range():
    """Host-side proof of the class contract: for every classed tile,
    the device's own window-start formula leaves every pair's USED
    lookup range inside the window (with the bracket cell)."""
    tiling, vh, chord_rad, lnDa, pack, (t_ids, h_ids) = _setup()
    ln_r0 = float(np.log(1e-3))
    inv = float((N_R - 1) / np.log(6e4))
    far, near = T.refine_pairs(tiling, t_ids, h_ids, vh, chord_rad,
                               inv_dlnr=None, lnDa=None)
    tk, hk = near
    classes = (16, 24, 32, 48)
    cls = T.classify_tile_windows(tiling, tk, hk, vh, chord_rad, lnDa,
                                  [(ln_r0, inv, N_R)], classes=classes)
    crad = tiling.tile_crad.astype(np.float32)[tk]
    d = (tiling.tile_center.astype(np.float32)[tk]
         - vh.astype(np.float32)[hk])
    dcen = np.sqrt(np.einsum("ij,ij->i", d, d))
    y_lo = (np.log(np.maximum(dcen - crad, 1e-20))
            + lnDa.astype(np.float32)[hk])
    y_hi = np.log(dcen + crad) + lnDa.astype(np.float32)[hk]
    for ci, C in enumerate(classes):
        sel = cls == ci
        if not sel.any():
            continue
        nc = min(C, N_R)
        for t in np.unique(tk[sel]):
            m = sel & (tk == t)
            y_min = y_lo[m].min()      # device formula, same f32 inputs
            clo = np.clip(np.floor((y_min - ln_r0) * inv) - 1, 0,
                          N_R - nc)
            x_hi = (y_hi[m] - ln_r0) * inv
            assert np.minimum(x_hi, N_R - 1).max() <= clo + nc - 1
