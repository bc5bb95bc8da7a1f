"""Particle snapshot runner: BaryonifySnapshot (2D/3D, periodic box).

Reference: Runners/SnapshotRunner.py. The per-halo KDTree query + Python
offset loop becomes: host-side neighbour search (scipy cKDTree, the same
C++ engine the reference uses) producing padded static neighbour lists
bucketed by count, then a device-side batched displacement + scatter-add
over particles. Minimum-image convention throughout.
"""

import numpy as np
import jax
import jax.numpy as jnp
from scipy.spatial import cKDTree

from ..cosmo import massdef as _massdef

__all__ = ["DefaultRunnerSnapshot", "BaryonifySnapshot"]


class DefaultRunnerSnapshot:
    """Shared state for snapshot runners (reference SnapshotRunner.py)."""

    def __init__(self, HaloNDCatalog, ParticleSnapshot, epsilon_max, model,
                 mass_def=_massdef.MassDef200c, verbose=True,
                 halo_batch=256, dtype=jnp.float32, n_size_buckets=4,
                 KDTree_kwargs=None):
        self.HaloNDCatalog = HaloNDCatalog
        self.ParticleSnapshot = ParticleSnapshot
        self.cosmo = HaloNDCatalog.cosmology
        self.model = model
        self.epsilon_max = epsilon_max
        self.mass_def = mass_def
        self.verbose = verbose
        self.halo_batch = halo_batch
        self.dtype = dtype
        self.n_size_buckets = n_size_buckets

        cols = ["x", "y"] if ParticleSnapshot.is2D else ["x", "y", "z"]
        self._coords = np.stack(
            [np.asarray(ParticleSnapshot.cat[c], dtype=float) for c in cols],
            axis=1)
        L = ParticleSnapshot.L
        self.tree = cKDTree(np.mod(self._coords, L), boxsize=L,
                            **(KDTree_kwargs or {}))

    def _model_p_keys(self):
        return list(vars(self.model).get("p_keys", []))


class BaryonifySnapshot(DefaultRunnerSnapshot):
    """Displace particles around each halo
    (reference SnapshotRunner.py:162-275). Returns the new particle catalog
    (positions wrapped back into the box)."""

    def process(self):
        from ..cosmo.core import cosmology_from_dict
        cosmo = cosmology_from_dict(self.cosmo)

        snap = self.ParticleSnapshot
        L = snap.L
        is2D = snap.is2D
        ndim = 2 if is2D else 3
        n_part = len(snap.cat)
        coords = self._coords            # (n_part, ndim)

        cat = self.HaloNDCatalog.cat
        a = 1.0 / (1.0 + self.HaloNDCatalog.redshift)
        M = np.asarray(cat["M"], dtype=float)
        R = np.asarray(jax.jit(lambda M, a: self.mass_def.get_radius(
            cosmo, M, a))(M, a))   # jit: eager axon dispatch is ~55 s/op at 1e5
        R_q = np.clip(self.epsilon_max * R / a, 0, L / 2)
        hcols = ["x", "y"] if is2D else ["x", "y", "z"]
        hpos = np.stack([np.asarray(cat[c], dtype=float) for c in hcols],
                        axis=1)
        keys = self._model_p_keys()
        extras = [np.asarray(cat[k], dtype=float) for k in keys]

        # host-side neighbour lists, padded per count bucket. Prefer the
        # in-repo native C++ cell list (3D); scipy's cKDTree otherwise.
        if not is2D:
            from .. import native
            padded, counts = native.cell_query(coords, L, hpos, R_q)
            neigh = [padded[q][padded[q] >= 0] for q in range(len(R_q))]
        else:
            neigh = self.tree.query_ball_point(np.mod(hpos, L), R_q)
            counts = np.array([len(x) for x in neigh])

        model = self.model
        dt = self.dtype
        coords_dev = jnp.asarray(coords)

        def make_step(K):
            def one_halo(hp, M_h, valid_h, inds, nn, *o_h):
                # inds: (K,) padded neighbour indices; nn true count
                p = coords_dev[inds]                    # (K, ndim)
                dx = p - hp[None, :]
                dx = jnp.where(dx > L / 2, dx - L, dx)  # min-image
                dx = jnp.where(dx < -L / 2, dx + L, dx)
                d = jnp.sqrt(jnp.sum(dx ** 2, axis=-1))
                d_safe = jnp.where(d > 0, d, 1.0)
                kw = {k: o for k, o in zip(keys, o_h)}
                off = model.displacement(d, M_h, a, **kw)
                off = jnp.reshape(off, d.shape).astype(dt)
                off = jnp.where(jnp.isfinite(off), off, 0.0)
                vec = off[:, None] * (dx / d_safe[:, None]).astype(dt)
                m = (jnp.arange(K) < nn) & valid_h
                vec = jnp.where(m[:, None], vec, 0.0)
                inds = jnp.where(m, inds, n_part)       # dummy row
                return inds, vec

            def body(acc, batch):
                hp_b, M_b, valid_b, inds_b, nn_b, *o_b = batch
                inds, vec = jax.vmap(one_halo)(hp_b, M_b, valid_b, inds_b,
                                               nn_b, *o_b)
                return acc.at[inds.reshape(-1)].add(
                    vec.reshape(-1, ndim)), None
            return body

        # bucket halos by neighbour count
        order = np.argsort(counts)
        splits = np.array_split(order, max(1, min(self.n_size_buckets,
                                                  len(counts))))
        acc = jnp.zeros((n_part + 1, ndim), dtype=dt)
        for idx in splits:
            if idx.size == 0:
                continue
            K = max(int(counts[idx].max()), 1)
            body = make_step(K)
            inds_pad = np.full((idx.size, K), n_part, dtype=np.int64)
            for row, j in enumerate(idx):
                inds_pad[row, :counts[j]] = neigh[j]
            # pad halo axis to batch multiples
            B = max(1, min(self.halo_batch, 8_000_000 // K))
            nb = -(-idx.size // B)
            pad = nb * B - idx.size

            def padb(x, fill=0.0):
                shape = (pad,) + x.shape[1:]
                return np.concatenate(
                    [x, np.full(shape, fill, dtype=x.dtype)]
                ).reshape((nb, B) + x.shape[1:])

            batch = (jnp.asarray(padb(hpos[idx])),
                     jnp.asarray(padb(M[idx])),
                     jnp.asarray(np.concatenate(
                         [np.ones(idx.size, bool), np.zeros(pad, bool)]
                     ).reshape(nb, B)),
                     jnp.asarray(padb(inds_pad, fill=n_part)),
                     jnp.asarray(padb(counts[idx].astype(np.int64))),
                     ) + tuple(jnp.asarray(padb(e[idx])) for e in extras)

            def run(acc_in, batch):
                acc_out, _ = jax.lax.scan(body, acc_in, batch)
                return acc_out
            acc = jax.jit(run)(acc, batch)

        tot_offsets = np.asarray(acc[:n_part], dtype=np.float64)

        new_cat = snap.cat.copy()
        for d_i, c in enumerate(hcols):
            new_cat[c] = new_cat[c] + tot_offsets[:, d_i]
            new_cat[c] = np.where(new_cat[c] > L, new_cat[c] - L, new_cat[c])
            new_cat[c] = np.where(new_cat[c] < 0, new_cat[c] + L, new_cat[c])
        return new_cat
