"""Cartesian grid runners: BaryonifyGrid, PaintProfilesGrid (+Anis), 2D/3D.

Reference: Runners/Map2DRunner.py. Per-halo Python loops over variable-size
cutouts become fixed-shape batched gathers (bucketed by cutout size), and the
numba conservative-deposit kernels become one multilinear scatter
(ops/scatter.py).

Conventions mirrored from the reference:
  * cutout size Nsize = 2 eps_max R / res forced even, clipped to
    [2, Npix/2] (Map2DRunner.py:500-503)
  * per-halo sub-pixel offsets (dx, dy) from the nearest grid center
  * displacement accumulated in units of pixel widths, applied to the
    integer pixel lattice, then conservatively redeposited; mass
    conservation asserted (Map2DRunner.py:616-619)
  * painting masks non-finite values and r > eps_max R (Map2DRunner.py:814)
  * 2D ellipticity via the galsim-style shear matrix (Map2DRunner.py:281-350)

Deviation: cutout radial grids use exact pixel-center offsets
(i - w) * res + dx rather than the reference's linspace(-N/2, N/2, N)
spacing (which is stretched by N/(N-1) and drifts up to ~1.5 px from true
centers at the cutout edge), and the map axes are used self-consistently
(axis 0 = x). Painted fields agree wherever the profile is resolved
(r > 2 res); near-center pixels differ because the reference evaluates a
steep profile off-center (quantified in tests/test_grid_cutout_parity.py).
"""

from functools import partial
import numpy as np
import jax
import jax.numpy as jnp

from ..cosmo import massdef as _massdef
from ..ops import compat
from ..ops.scatter import deposit_2d, deposit_3d

__all__ = ["DefaultRunnerGrid", "BaryonifyGrid", "PaintProfilesGrid",
           "PaintProfilesAnisGrid"]


def _shear_matrix(A, q):
    """2x2 shear matrix rotating/squeezing by axis direction A and axis
    ratio q (galsim Shear-style; reference Map2DRunner.py:281-350).
    jnp, vectorizable per halo."""
    A = A / jnp.sqrt(jnp.sum(A ** 2))
    beta = jnp.arccos(jnp.clip(A[0], -1.0, 1.0))
    eta = -jnp.log(q)
    etasq = eta * eta
    eta2g = jnp.where(eta > 1e-4,
                      jnp.tanh(0.5 * eta) / jnp.where(eta == 0, 1.0, eta),
                      0.5 + etasq * (-1.0 / 24 + etasq / 240))
    g1 = eta2g * eta * jnp.cos(2 * beta)
    g2 = eta2g * eta * jnp.sin(2 * beta)
    det = jnp.sqrt(1.0 - (g1 ** 2 + g2 ** 2))
    return jnp.array([[1 + g1, g2], [g2, 1 - g1]]) / det


class DefaultRunnerGrid:
    """Shared state for grid runners (reference Map2DRunner.py:170-372)."""

    def __init__(self, HaloNDCatalog, GriddedMap, epsilon_max, model,
                 use_ellipticity=False, mass_def=_massdef.MassDef200c,
                 include_pixel_size=True, verbose=True, halo_batch=256,
                 dtype=jnp.float32, mesh=None, n_size_buckets=4,
                 pixel_budget=8_000_000, regrid_dtype=jnp.float64):
        self.HaloNDCatalog = HaloNDCatalog
        self.GriddedMap = GriddedMap
        self.cosmo = HaloNDCatalog.cosmology
        self.model = model
        self.epsilon_max = epsilon_max
        self.mass_def = mass_def
        self.verbose = verbose
        self.use_ellipticity = use_ellipticity
        self.include_pixel_size = include_pixel_size
        self.halo_batch = halo_batch
        self.dtype = dtype
        self.mesh = mesh
        self.n_size_buckets = n_size_buckets
        self.pixel_budget = pixel_budget
        # float64 deposits are exact but EMULATED on TPU (~5-10x slower
        # at big grids); float32 keeps mass conservation to ~1e-7 relative
        self.regrid_dtype = regrid_dtype
        # compiled-kernel cache: closures are rebuilt on every process()
        # call, so jit identity alone would recompile each time; we key
        # compiled executables by static shape info instead
        self._compiled = {}

        if use_ellipticity:
            names = HaloNDCatalog.cat.dtype.names
            assert "q_ell" in names, "missing 'q_ell' (use_ellipticity=True)"
            assert "A_ell" in names, "missing 'A_ell' (use_ellipticity=True)"
            if not GriddedMap.is2D:
                raise NotImplementedError(
                    "ellipticity is 2D-only (as in the reference)")

    # ------------------------------------------------------------------
    def build_Rmat(self, A, q):
        """Public 2x2 shear/rotation matrix from axis direction ``A`` and
        axis ratio ``q`` (API parity with reference
        Map2DRunner.py:281-350; 3D rotation unverified upstream and
        likewise not implemented here)."""
        A = np.asarray(A, dtype=float)
        if A.ndim != 1 or len(A) == 1:
            raise ValueError("Can't rotate a 1-dimensional vector")
        if len(A) == 3:
            raise NotImplementedError(
                "3D ellipticity rotation is not implemented; use the 2D "
                "method")
        return np.asarray(_shear_matrix(jnp.asarray(A), float(q)))

    def coord_array(self, *args):
        """Flatten and column-stack coordinate arrays
        (reference Map2DRunner.py:352-372)."""
        return np.vstack([np.asarray(a).flatten() for a in args]).T

    def pick_indices(self, center, width, Npix):
        """Periodically-wrapped index window [center-width, center+width)
        (reference Map2DRunner.py:400-430)."""
        inds = np.arange(center - width, center + width)
        return np.mod(inds, Npix)

    def _halo_data(self, cosmo):
        cat = self.HaloNDCatalog.cat
        a = 1.0 / (1.0 + self.HaloNDCatalog.redshift)
        M = np.asarray(cat["M"], dtype=float)
        R = np.asarray(jax.jit(lambda M, a: self.mass_def.get_radius(
            cosmo, M, a))(M, a))   # jit: eager axon dispatch is ~55 s/op at 1e5  # physical
        return cat, a, M, R

    def _cutout_sizes(self, R_q):
        """Even cutout sizes clipped to [2, Npix/2] (ref. 500-503)."""
        res = self.GriddedMap.res
        Nsize = (2 * R_q / res).astype(int) // 2 * 2
        return np.clip(Nsize, 2, self.GriddedMap.bins.size // 2)

    def _model_p_keys(self):
        return list(vars(self.model).get("p_keys", []))

    def _scan_accumulate(self, scan_fn, batches, acc_shape, acc_dtype):
        key = (tuple((tuple(b.shape), str(b.dtype)) for b in batches),
               tuple(acc_shape), str(acc_dtype), self.mesh is None)
        if key not in self._compiled:
            def local(batches_local, varying=False):
                acc = jnp.zeros(acc_shape, dtype=acc_dtype)
                if varying:  # in shard_map the carry must be axis-varying
                    acc = compat.pvary(acc, ("halos",))
                acc, _ = jax.lax.scan(scan_fn, acc, batches_local)
                return acc

            if self.mesh is None:
                self._compiled[key] = jax.jit(local)
            else:
                from jax.sharding import PartitionSpec as P

                def sharded(batches_local):
                    return jax.lax.psum(local(batches_local, varying=True),
                                        "halos")

                self._compiled[key] = jax.jit(
                    jax.shard_map(sharded, mesh=self.mesh,
                                  in_specs=P("halos"), out_specs=P()))
        return self._compiled[key](batches)

    def _n_batch_multiple(self):
        return 1 if self.mesh is None else self.mesh.devices.size

    def _padded_batches(self, arrays, batch):
        n = arrays[0].shape[0]
        nb = -(-n // batch)
        mult = self._n_batch_multiple()
        nb = -(-nb // mult) * mult
        pad = nb * batch - n
        out = []
        for x in arrays:
            xp = np.concatenate([x, np.zeros((pad,) + x.shape[1:],
                                             dtype=x.dtype)])
            out.append(xp.reshape((nb, batch) + x.shape[1:]))
        valid = np.concatenate([np.ones(n, bool), np.zeros(pad, bool)])
        return out, valid.reshape(nb, batch)

    def _bucketed_accumulate(self, make_body, Nsize, per_halo_arrays,
                             acc_shape, acc_dtype):
        """Bucket halos by cutout size; each bucket gets a static cutout."""
        n = Nsize.shape[0]
        nbuck = max(1, min(self.n_size_buckets, n))
        order = np.argsort(Nsize)
        splits = np.array_split(order, nbuck)
        ndim = 2 if self.GriddedMap.is2D else 3

        acc_total = None
        for idx in splits:
            if idx.size == 0:
                continue
            Ns = int(Nsize[idx].max())
            K = Ns ** ndim
            batch = int(np.clip(self.pixel_budget // K, 4, self.halo_batch))
            body = make_body(Ns)
            sub = [a[idx].astype(np.float64) for a in per_halo_arrays]
            batched, valid = self._padded_batches(sub, batch)
            batches = tuple(jnp.asarray(b) for b in batched) \
                + (jnp.asarray(valid),)
            acc = self._scan_accumulate(body, batches, acc_shape, acc_dtype)
            acc_total = acc if acc_total is None else acc_total + acc
        return acc_total

    def _cutout_geometry(self, Ns, center_idx, d_off, Npix, res):
        """Flat cutout indices + per-axis relative positions.

        center_idx: (ndim,) integer nearest-pixel indices (traced)
        d_off: (ndim,) sub-pixel offsets bins[center] - pos (traced)
        Returns (flat_inds (K,), rel (ndim, Ns)) with rel[d, i] the distance
        of cutout cell i (axis d) from the halo along that axis.
        """
        w = Ns // 2
        offs = jnp.arange(Ns) - w
        inds = [jnp.mod(center_idx[d] + offs, Npix) for d in
                range(center_idx.shape[0])]
        rel = [offs * res + d_off[d] for d in range(center_idx.shape[0])]
        return inds, rel


class BaryonifyGrid(DefaultRunnerGrid):
    """Baryonify a 2D/3D mass grid (reference Map2DRunner.py:376-621)."""

    def process(self):
        from ..cosmo.core import cosmology_from_dict
        cosmo = cosmology_from_dict(self.cosmo)
        gm = self.GriddedMap
        orig_map = np.asarray(gm.map, dtype=np.float64)
        Npix = gm.Npix
        res = gm.res
        is2D = gm.is2D
        ndim = 2 if is2D else 3
        nflat = orig_map.size

        cat, a, M, R = self._halo_data(cosmo)
        keys = self._model_p_keys()
        extras = [np.asarray(cat[k], dtype=float) for k in keys]

        R_q = np.clip(self.epsilon_max * R / a, 0, gm.bins.max() / 2)
        Nsize = self._cutout_sizes(R_q)

        bins = gm.bins
        pos_cols = ["x", "y"] if is2D else ["x", "y", "z"]
        pos = np.stack([np.asarray(cat[c], dtype=float) for c in pos_cols],
                       axis=1)
        cen = np.argmin(np.abs(bins[None, None, :]
                               - pos[:, :, None]), axis=2)      # (n, ndim)
        d_off = bins[cen] - pos                                  # (n, ndim)
        assert np.all(np.abs(d_off) <= res), \
            "halo offsets larger than grid resolution"

        dt = self.dtype
        model = self.model
        use_ell = self.use_ellipticity
        if use_ell:
            q_ell = np.asarray(cat["q_ell"], dtype=float)
            A_ell = np.asarray(cat["A_ell"], dtype=float)

        # per-halo displacement-curve fast path (same as BaryonifyShell):
        # interpolate the (z, M) table axes once per halo so the per-cell
        # readout is a single log-uniform pair-gather lerp instead of the
        # full N-D table interpolation
        curve_meta = None
        if hasattr(model, "halo_curves"):
            try:
                mcur = model
                if dt == jnp.float32 and hasattr(model, "with_dtype"):
                    mcur = model.with_dtype(dt)
                # p_keys columns collapse into the per-halo curves
                # (ops/interp.collapse_curves)
                pkw = {k: e for k, e in zip(keys, extras)}
                curves, ln_r0, dlnr = mcur.halo_curves(
                    M, np.full(M.shape, a), **pkw)
                Rcom = R / a
                rscale = (1.0 / Rcom
                          if getattr(model, "Rdelta_sampling", False)
                          else np.ones_like(Rcom))
                extras = extras + [np.asarray(curves), Rcom, rscale]
                curve_meta = (float(ln_r0), float(dlnr))
            except NotImplementedError:
                curve_meta = None

        def make_body(Ns):
            def one_halo(M_h, cen_h, doff_h, valid_h, *o_rest):
                inds, rel = self._cutout_geometry(
                    Ns, cen_h.astype(jnp.int32), doff_h, Npix, res)
                if is2D:
                    gx = rel[0][:, None] + jnp.zeros((1, Ns))
                    gy = rel[1][None, :] + jnp.zeros((Ns, 1))
                    flat = (inds[0][:, None] * Npix
                            + inds[1][None, :]).reshape(-1)
                    if use_ell:
                        q_h, A_h = o_rest[-2], o_rest[-1]
                        Rmat = _shear_matrix(A_h, q_h)
                        xy = jnp.stack([gx.reshape(-1), gy.reshape(-1)], 1)
                        xe, ye = (xy @ Rmat).T
                        r_grid = jnp.sqrt(xe ** 2 + ye ** 2).reshape(Ns, Ns)
                    else:
                        r_grid = jnp.sqrt(gx ** 2 + gy ** 2)
                    hats = [gx / r_grid, gy / r_grid]
                else:
                    gx = rel[0][:, None, None] + jnp.zeros((1, Ns, Ns))
                    gy = rel[1][None, :, None] + jnp.zeros((Ns, 1, Ns))
                    gz = rel[2][None, None, :] + jnp.zeros((Ns, Ns, 1))
                    flat = ((inds[0][:, None, None] * Npix
                             + inds[1][None, :, None]) * Npix
                            + inds[2][None, None, :]).reshape(-1)
                    r_grid = jnp.sqrt(gx ** 2 + gy ** 2 + gz ** 2)
                    hats = [gx / r_grid, gy / r_grid, gz / r_grid]

                r_flat = r_grid.reshape(-1)
                if curve_meta is not None:
                    from ..Profiles.BaryonCorrection import \
                        BaryonificationClass as _BC
                    ce = len(keys)
                    curve_h, Rcom_h, rscale_h = o_rest[ce:ce + 3]
                    ln_r0, dlnr = curve_meta
                    r_safe = jnp.maximum(r_flat, 1e-30)
                    d = _BC.curve_lookup(curve_h.astype(dt), ln_r0, dlnr,
                                         r_safe * rscale_h.astype(dt))
                    d = jnp.where(
                        r_flat < self.epsilon_max * Rcom_h.astype(dt),
                        d, 0.0)
                else:
                    kw = {k: o for k, o in
                          zip(keys, o_rest[:len(keys)])}
                    d = model.displacement(r_flat, M_h, a, **kw)
                d = jnp.reshape(d, (-1,)).astype(dt) / res   # pixel units
                d = jnp.where(jnp.isfinite(d), d, 0.0)
                d = jnp.where(valid_h, d, 0.0)
                offs = jnp.stack(
                    [d * h.reshape(-1).astype(dt) for h in hats], axis=1)
                offs = jnp.where(jnp.isfinite(offs), offs, 0.0)
                return flat, offs

            def body(acc, batch):
                *cols, valid_b = batch
                M_b, cen_b, doff_b = cols[0], cols[1], cols[2]
                o_rest = cols[3:]
                flat, offs = jax.vmap(one_halo)(M_b, cen_b, doff_b, valid_b,
                                                *o_rest)
                # flat 1-wide scatter (component d at [d*nflat + cell]):
                # TPU row scatters are ~6x slower per row than element
                # scatters (see HealpixRunner phase A)
                flatv = flat.reshape(-1)
                off2 = offs.reshape(-1, ndim).astype(acc.dtype)
                idx = jnp.concatenate([flatv + d * nflat
                                       for d in range(ndim)])
                upd = jnp.concatenate([off2[:, d] for d in range(ndim)])
                return acc.at[idx].add(upd), None
            return body

        per_halo = [M, cen.astype(float), d_off] + extras
        if use_ell:
            per_halo += [q_ell, A_ell]
        acc = self._bucketed_accumulate(
            make_body, Nsize, per_halo, (ndim * nflat,), dt)
        pix_offsets = jnp.stack([acc[d * nflat:(d + 1) * nflat]
                                 for d in range(ndim)], axis=1)

        # regrid: integer lattice + offsets -> conservative deposit
        rdt = self.regrid_dtype

        def regrid(pix_offsets, orig_flat):
            po = jnp.where(jnp.isfinite(pix_offsets), pix_offsets, 0.0)
            po = po.astype(rdt)
            orig_flat = orig_flat.astype(rdt)
            if is2D:
                ii = jnp.arange(Npix)
                base = jnp.stack(
                    [jnp.repeat(ii, Npix), jnp.tile(ii, Npix)], axis=1)
                new = deposit_2d(jnp.zeros((Npix, Npix), dtype=rdt),
                                 base + po, orig_flat)
            else:
                ii = jnp.arange(Npix)
                bx = jnp.repeat(ii, Npix * Npix)
                by = jnp.tile(jnp.repeat(ii, Npix), Npix)
                bz = jnp.tile(ii, Npix * Npix)
                base = jnp.stack([bx, by, bz], axis=1)
                new = deposit_3d(jnp.zeros((Npix,) * 3, dtype=rdt),
                                 base + po, orig_flat)
            return new

        rkey = ("regrid", Npix, is2D, str(rdt))
        if rkey not in self._compiled:
            self._compiled[rkey] = jax.jit(regrid)
        new_map = np.asarray(
            self._compiled[rkey](pix_offsets,
                                 jnp.asarray(orig_map.reshape(-1))))
        new_sum, old_sum = new_map.sum(), orig_map.sum()
        assert np.isclose(new_sum, old_sum), (
            "ERROR in pixel regridding, sum(new_map) [%0.14e] != "
            "sum(oldmap) [%0.14e]" % (new_sum, old_sum))
        return new_map


class PaintProfilesGrid(DefaultRunnerGrid):
    """Paint profiles onto a 2D/3D grid (reference Map2DRunner.py:624-829).
    2D uses ``projected``, 3D uses ``real``; output multiplied by pixel
    area/volume when ``include_pixel_size`` (default True here)."""

    def process(self):
        from ..cosmo.core import cosmology_from_dict
        cosmo = cosmology_from_dict(self.cosmo)
        gm = self.GriddedMap
        Npix = gm.Npix
        res = gm.res
        is2D = gm.is2D
        nflat = gm.map.size

        cat, a, M, R = self._halo_data(cosmo)
        R_com = R / a                                # comoving
        keys = self._model_p_keys()
        extras = [np.asarray(cat[k], dtype=float) for k in keys]
        Nsize = self._cutout_sizes(self.epsilon_max * R_com)

        bins = gm.bins
        pos_cols = ["x", "y"] if is2D else ["x", "y", "z"]
        pos = np.stack([np.asarray(cat[c], dtype=float) for c in pos_cols],
                       axis=1)
        cen = np.argmin(np.abs(bins[None, None, :]
                               - pos[:, :, None]), axis=2)
        d_off = bins[cen] - pos

        model = self.model
        eps_max = self.epsilon_max
        use_ell = self.use_ellipticity
        dt = self.dtype
        if use_ell:
            q_ell = np.asarray(cat["q_ell"], dtype=float)
            A_ell = np.asarray(cat["A_ell"], dtype=float)

        # per-halo curve fast path (see BaryonifyShell._use_curves): one
        # pair-gather lerp per cell instead of the N-D table readout
        curve_meta = None
        clog = getattr(model, "curves_are_log", False)
        if hasattr(model, "halo_curves"):
            try:
                kind = "projected" if is2D else "real"
                # p_keys columns collapse into the per-halo curves
                pkw = {k: e for k, e in zip(keys, extras)}
                curves, ln_r0, dlnr = model.halo_curves(
                    M, np.full(M.shape, a), kind=kind, **pkw)
                extras = extras + [np.asarray(curves)]
                curve_meta = (float(ln_r0), float(dlnr))
            except (NotImplementedError, AttributeError, KeyError):
                curve_meta = None

        def make_body(Ns):
            def one_halo(M_h, R_h, cen_h, doff_h, valid_h, *o_rest):
                inds, rel = self._cutout_geometry(
                    Ns, cen_h.astype(jnp.int32), doff_h, Npix, res)
                if is2D:
                    gx = rel[0][:, None] + jnp.zeros((1, Ns))
                    gy = rel[1][None, :] + jnp.zeros((Ns, 1))
                    flat = (inds[0][:, None] * Npix
                            + inds[1][None, :]).reshape(-1)
                    if use_ell:
                        q_h, A_h = o_rest[-2], o_rest[-1]
                        Rmat = _shear_matrix(A_h, q_h)
                        xy = jnp.stack([gx.reshape(-1), gy.reshape(-1)], 1)
                        xe, ye = (xy @ Rmat).T
                        r_grid = jnp.sqrt(xe ** 2 + ye ** 2)
                    else:
                        r_grid = jnp.sqrt(gx ** 2 + gy ** 2).reshape(-1)
                    if curve_meta is not None:
                        from ..utils.Tabulate import \
                            TabulatedProfile as _TP
                        from ..Profiles.BaryonCorrection import \
                            BaryonificationClass as _BC
                        curve_h = o_rest[len(keys)]
                        # projected curves store Sigma * a (log or raw
                        # per model's storage convention)
                        lookup = (_TP.curve_lookup if clog
                                  else _BC.curve_lookup)
                        paint = lookup(
                            curve_h.astype(dt), curve_meta[0],
                            curve_meta[1], r_grid) / a
                    else:
                        kw = {k: o for k, o in
                              zip(keys, o_rest[:len(keys)])}
                        paint = model.projected(cosmo, r_grid, M_h, a,
                                                **kw)
                else:
                    gx = rel[0][:, None, None] + jnp.zeros((1, Ns, Ns))
                    gy = rel[1][None, :, None] + jnp.zeros((Ns, 1, Ns))
                    gz = rel[2][None, None, :] + jnp.zeros((Ns, Ns, 1))
                    flat = ((inds[0][:, None, None] * Npix
                             + inds[1][None, :, None]) * Npix
                            + inds[2][None, None, :]).reshape(-1)
                    r_grid = jnp.sqrt(gx ** 2 + gy ** 2
                                      + gz ** 2).reshape(-1)
                    if curve_meta is not None:
                        from ..utils.Tabulate import \
                            TabulatedProfile as _TP
                        from ..Profiles.BaryonCorrection import \
                            BaryonificationClass as _BC
                        curve_h = o_rest[len(keys)]
                        lookup = (_TP.curve_lookup if clog
                                  else _BC.curve_lookup)
                        paint = lookup(
                            curve_h.astype(dt), curve_meta[0],
                            curve_meta[1], r_grid)
                    else:
                        kw = {k: o for k, o in
                              zip(keys, o_rest[:len(keys)])}
                        paint = model.real(cosmo, r_grid, M_h, a, **kw)

                paint = jnp.reshape(paint, r_grid.shape)
                mask = jnp.isfinite(paint) & (r_grid < R_h * eps_max) \
                    & valid_h
                paint = jnp.where(mask, paint, 0.0)
                return flat, paint

            def body(acc, batch):
                *cols, valid_b = batch
                M_b, R_b, cen_b, doff_b = cols[:4]
                o_rest = cols[4:]
                flat, paint = jax.vmap(one_halo)(M_b, R_b, cen_b, doff_b,
                                                 valid_b, *o_rest)
                return acc.at[flat.reshape(-1)].add(
                    paint.reshape(-1).astype(jnp.float64)), None
            return body

        per_halo = [M, R_com, cen.astype(float), d_off] + extras
        if use_ell:
            per_halo += [q_ell, A_ell]
        new_map = np.asarray(self._bucketed_accumulate(
            make_body, Nsize, per_halo, (nflat,), jnp.float64))

        if self.include_pixel_size:
            new_map = new_map * res ** (2 if is2D else 3)
        return new_map.reshape(gm.map.shape)


class PaintProfilesAnisGrid(PaintProfilesGrid):
    """Anisotropic grid painting (reference Map2DRunner.py:833-1016):
    painted profile weighted by the per-pixel tracer mass fraction of an
    Mtot canvas plus a uniform background. 2D only, as in the reference."""

    def __init__(self, HaloNDCatalog, GriddedMap, epsilon_max, model,
                 Tracer_model, Mtot_model, background_val,
                 global_tracer_fraction, mass_def=_massdef.MassDef200c,
                 include_pixel_size=True, use_ellipticity=False,
                 verbose=True, **kw):
        assert GriddedMap.is2D, "PaintProfilesAnisGrid is 2D-only"
        self.Tracer_model = Tracer_model
        self.Mtot_model = Mtot_model
        self.background_val = background_val
        self.global_tracer_fraction = global_tracer_fraction
        super().__init__(HaloNDCatalog, GriddedMap, epsilon_max, model,
                         use_ellipticity, mass_def, include_pixel_size,
                         verbose, **kw)

    def process(self):
        import warnings
        from ..cosmo.core import cosmology_from_dict
        from ..cosmo import core as _core
        from ..utils.Tabulate import _get_parameter
        cosmo = cosmology_from_dict(self.cosmo)
        gm = self.GriddedMap
        Npix, res = gm.Npix, gm.res
        orig_map = np.asarray(gm.map, dtype=np.float64)

        Mtot_map = PaintProfilesGrid(
            self.HaloNDCatalog, gm, self.epsilon_max, self.Mtot_model,
            use_ellipticity=self.use_ellipticity, mass_def=self.mass_def,
            include_pixel_size=True, verbose=self.verbose,
            halo_batch=self.halo_batch, dtype=self.dtype).process()

        a = 1.0 / (1.0 + self.HaloNDCatalog.redshift)
        dL = 2 * _get_parameter(self.Mtot_model, "proj_cutoff")
        dV = res ** 2 * dL
        rho_halos = Mtot_map.sum() / (dV * Mtot_map.size)
        rho_m = float(_core.rho_x(cosmo, a, "matter", is_comoving=False))
        drho_m = np.clip(rho_m - rho_halos, 0, None)
        Mtot_map = Mtot_map + dV * drho_m
        if rho_halos > rho_m:
            warnings.warn("halos contribute more mass than the mean "
                          "matter density allows")

        Mtot_dev = jnp.asarray(Mtot_map.reshape(-1))
        orig_dev = jnp.asarray(orig_map.reshape(-1))
        base_model = self.model
        tracer = self.Tracer_model

        # custom painting body: like PaintProfilesGrid but weighted per pixel
        keys = self._model_p_keys()
        cat, a, M, R = self._halo_data(cosmo)
        R_com = R / a
        extras = [np.asarray(cat[k], dtype=float) for k in keys]
        Nsize = self._cutout_sizes(self.epsilon_max * R_com)
        bins = gm.bins
        pos = np.stack([np.asarray(cat["x"], dtype=float),
                        np.asarray(cat["y"], dtype=float)], axis=1)
        cen = np.argmin(np.abs(bins[None, None, :] - pos[:, :, None]),
                        axis=2)
        d_off = bins[cen] - pos
        eps_max = self.epsilon_max
        include_pix = self.include_pixel_size

        def make_body(Ns):
            def one_halo(M_h, R_h, cen_h, doff_h, valid_h, *o_rest):
                inds, rel = self._cutout_geometry(
                    Ns, cen_h.astype(jnp.int32), doff_h, Npix, res)
                gx = rel[0][:, None] + jnp.zeros((1, Ns))
                gy = rel[1][None, :] + jnp.zeros((Ns, 1))
                flat = (inds[0][:, None] * Npix
                        + inds[1][None, :]).reshape(-1)
                r_grid = jnp.sqrt(gx ** 2 + gy ** 2).reshape(-1)
                kw = {k: o for k, o in zip(keys, o_rest[:len(keys)])}
                painting = base_model.projected(cosmo, r_grid, M_h, a, **kw)
                painting = jnp.where(jnp.isfinite(painting), painting, 0.0)
                canvas = tracer.projected(cosmo, r_grid, M_h, a, **kw)
                canvas = jnp.where(jnp.isfinite(canvas), canvas, 0.0)
                mtot_px = Mtot_dev[flat]
                mfrac = jnp.where(mtot_px > 0, canvas / mtot_px, 0.0)
                mfrac = mfrac * orig_dev[flat]
                val = painting * mfrac
                mask = jnp.isfinite(val) & (r_grid < R_h * eps_max) & valid_h
                val = jnp.where(mask, val, 0.0)
                return flat, val

            def body(acc, batch):
                *cols, valid_b = batch
                M_b, R_b, cen_b, doff_b = cols[:4]
                o_rest = cols[4:]
                flat, val = jax.vmap(one_halo)(M_b, R_b, cen_b, doff_b,
                                               valid_b, *o_rest)
                return acc.at[flat.reshape(-1)].add(
                    val.reshape(-1).astype(jnp.float64)), None
            return body

        per_halo = [M, R_com, cen.astype(float), d_off] + extras
        new_map = np.asarray(self._bucketed_accumulate(
            make_body, Nsize, per_halo, (orig_map.size,), jnp.float64))
        if include_pix:
            new_map = new_map * res ** 2

        mfrac_bg = np.where(Mtot_map > 0,
                            dV * drho_m / Mtot_map, 0.0).reshape(-1)
        mfrac_bg *= orig_map.reshape(-1)
        new_map = new_map + (self.background_val
                             * self.global_tracer_fraction * mfrac_bg)
        return new_map.reshape(orig_map.shape)
