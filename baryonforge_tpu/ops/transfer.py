"""Sparse device->host map fetch.

The development-tunnel link between host and TPU runs at a few to a few
tens of MB/s, so downloading a full-sky map (50 MB at NSIDE=1024, 800 MB
at NSIDE=4096) dominates end-to-end runner wall time even though device
compute is ~1 s.  Baryonification only modifies pixels inside halo discs
(typically 20-50% of the sky for realistic catalogs): the stencil regrid
passes untouched tiles through bitwise, so ``new == orig`` exactly on
every unmodified pixel.

``SparseMapFetcher`` exploits that: it compares the result map against
the base map on device per fixed-size pixel block, downloads a tiny
per-block changed bitmap, then downloads only the changed blocks and
reconstructs the exact full map host-side from the (bitwise-identical)
host copy of the base map.  The result is bit-for-bit equal to a full
``np.asarray(new_dev)`` — this is a lossless transfer optimization, not
an approximation.

Fallback: when the changed fraction exceeds ``dense_threshold`` the full
map is fetched directly (the bitmap roundtrip already happened, but it
is ~0.1% of the map).

No analog exists in the reference (maps live host-side throughout;
reference Runners/HealpixRunner.py:235-373 never moves them).
"""

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["SparseMapFetcher"]


def _bucket(n, step=256):
    """Round n up to a multiple of step (bounds jit specializations)."""
    return int(-(-n // step) * step)


class SparseMapFetcher:
    """Fetch a device map to host, transferring only changed blocks.

    Parameters
    ----------
    npix : map length (must be divisible by ``block``)
    block : pixels per block (default 4096 = 16 KB f32)
    dense_threshold : changed-block fraction above which a dense fetch
        is used instead
    """

    def __init__(self, npix, block=4096, dense_threshold=0.8):
        if npix % block:
            raise ValueError(f"npix={npix} not divisible by block={block}")
        self.npix = int(npix)
        self.block = int(block)
        self.nblk = self.npix // self.block
        self.dense_threshold = float(dense_threshold)
        self._jits = {}

    def _diff_fn(self, dt, vs_zero):
        key = ("diff", str(dt), vs_zero)
        if key not in self._jits:
            nblk, B = self.nblk, self.block

            def diff(new, base):
                return (new.reshape(nblk, B)
                        != base.reshape(nblk, B)).any(axis=1)

            def diff0(new):
                return (new.reshape(nblk, B) != 0).any(axis=1)

            self._jits[key] = jax.jit(diff0 if vs_zero else diff)
        return self._jits[key]

    def _gather_fn(self, dt, P):
        key = ("gather", str(dt), P)
        if key not in self._jits:
            nblk, B = self.nblk, self.block

            def gather(new, ids):
                return new.reshape(nblk, B)[ids]

            self._jits[key] = jax.jit(gather)
        return self._jits[key]

    def fetch(self, new_dev, base_dev=None, base_host=None,
              out_dtype=np.float64):
        """Return ``np.asarray(new_dev)`` as ``out_dtype``, cheaply.

        ``base_host`` must be the host array whose upload produced
        ``base_dev`` (bitwise-identical values, same dtype); pass both as
        None to diff against zeros (painting onto an empty map).
        """
        dt = new_dev.dtype
        if base_dev is None:
            changed = np.asarray(self._diff_fn(dt, True)(new_dev))
        else:
            changed = np.asarray(self._diff_fn(dt, False)(new_dev,
                                                          base_dev))
        ids = np.nonzero(changed)[0]
        n_changed = ids.size
        if n_changed > self.dense_threshold * self.nblk:
            return np.asarray(new_dev, dtype=out_dtype)

        if base_host is None:
            out = np.zeros(self.npix, dtype=out_dtype)
        else:
            out = np.asarray(base_host, dtype=out_dtype).copy()
        if n_changed:
            P = _bucket(n_changed)
            ids_pad = np.zeros(P, dtype=np.int32)
            ids_pad[:n_changed] = ids
            vals = np.asarray(
                self._gather_fn(dt, P)(new_dev, jnp.asarray(ids_pad)))
            out.reshape(self.nblk, self.block)[ids] = \
                vals[:n_changed].astype(out_dtype)
        return out
