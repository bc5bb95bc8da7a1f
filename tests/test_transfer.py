"""Sparse device->host map fetch (ops/transfer.py): the downloaded map
must be bit-for-bit equal to a dense np.asarray, for baryonify (diff vs
original) and paint (diff vs zero) alike."""

import numpy as np
import jax.numpy as jnp
import pytest

from baryonforge_tpu.ops.transfer import SparseMapFetcher


@pytest.mark.parametrize("frac", [0.0, 0.01, 0.3, 1.0])
def test_sparse_fetch_vs_dense(frac):
    npix = 1 << 20
    rng = np.random.default_rng(4)
    base = rng.exponential(1.0, npix).astype(np.float32)
    new = base.copy()
    n_changed = int(frac * npix)
    if n_changed:
        idx = rng.choice(npix, n_changed, replace=False)
        new[idx] += rng.normal(0, 0.1, n_changed).astype(np.float32)
    base_dev = jnp.asarray(base)
    new_dev = jnp.asarray(new)

    f = SparseMapFetcher(npix)
    out = f.fetch(new_dev, base_dev, base)
    np.testing.assert_array_equal(out, np.asarray(new_dev,
                                                  dtype=np.float64))


def test_sparse_fetch_vs_zero():
    npix = 1 << 20
    rng = np.random.default_rng(5)
    new = np.zeros(npix, np.float32)
    idx = rng.choice(npix, 5000, replace=False)
    new[idx] = rng.exponential(1.0, 5000).astype(np.float32)
    f = SparseMapFetcher(npix)
    out = f.fetch(jnp.asarray(new))
    np.testing.assert_array_equal(out, new.astype(np.float64))


def test_block_sizes():
    # any HEALPix npix with nside >= 8 divides the fallback block 768
    for nside in (8, 16, 64, 256, 1024, 4096):
        assert (12 * nside * nside) % 768 == 0
