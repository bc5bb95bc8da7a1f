"""Conservative mass-deposit kernels for periodic grids.

Replaces the reference's numba scatter loops (Runners/Map2DRunner.py:13-167,
``regrid_pixels_2D/3D``). A displaced unit square/cube at fractional position
p overlaps exactly its 2^d neighbouring cells with per-axis weights
(1 - frac, frac) — the area/volume-overlap deposit reduces exactly to a
multilinear scatter-add, which XLA executes as one deterministic fused
scatter instead of a sequential CPU loop.
"""

import jax
import jax.numpy as jnp

__all__ = ["deposit_2d", "deposit_3d"]


def _corner_weights_1d(pos, N):
    """(i0, i1, w0, w1) for a unit interval starting at ``pos`` on a
    periodic grid of size N."""
    pos = jnp.mod(pos, N)
    i0 = jnp.floor(pos).astype(jnp.int32)
    frac = pos - i0
    i1 = jnp.mod(i0 + 1, N)
    i0 = jnp.mod(i0, N)
    return i0, i1, 1.0 - frac, frac


def deposit_2d(grid, positions, values):
    """Deposit unit squares at ``positions`` (M, 2) with ``values`` (M,)
    onto a periodic (N, N) ``grid`` (returns the updated grid).

    positions are in pixel units; position (i, j) with zero fractional part
    deposits fully into cell (i, j).
    """
    N = grid.shape[0]
    x, y = positions[:, 0], positions[:, 1]
    x0, x1, wx0, wx1 = _corner_weights_1d(x, N)
    y0, y1, wy0, wy1 = _corner_weights_1d(y, N)

    flat = grid.reshape(-1)
    for xi, wxi in ((x0, wx0), (x1, wx1)):
        for yi, wyi in ((y0, wy0), (y1, wy1)):
            flat = flat.at[xi * N + yi].add(values * wxi * wyi)
    return flat.reshape(N, N)


def deposit_3d(grid, positions, values):
    """Trilinear unit-cube deposit onto a periodic (N, N, N) grid."""
    N = grid.shape[0]
    x, y, z = positions[:, 0], positions[:, 1], positions[:, 2]
    x0, x1, wx0, wx1 = _corner_weights_1d(x, N)
    y0, y1, wy0, wy1 = _corner_weights_1d(y, N)
    z0, z1, wz0, wz1 = _corner_weights_1d(z, N)

    flat = grid.reshape(-1)
    for xi, wxi in ((x0, wx0), (x1, wx1)):
        for yi, wyi in ((y0, wy0), (y1, wy1)):
            for zi, wzi in ((z0, wz0), (z1, wz1)):
                flat = flat.at[(xi * N + yi) * N + zi].add(
                    values * wxi * wyi * wzi)
    return flat.reshape(N, N, N)
