"""Integration primitives: cumulative Simpson, trapezoid helpers.

Replaces scipy.integrate.cumulative_simpson used throughout the reference for
enclosed-mass curves (Schneider19.py:860-864, BaryonCorrection.py:564, 682)
and inward pressure integrals (Thermodynamic.py:242-243).
"""

import numpy as np
import jax.numpy as jnp

__all__ = ["cumulative_simpson_uniform", "cumulative_trapezoid", "trapz"]


def cumulative_simpson_uniform(y, dx=1.0, axis=-1):
    """Cumulative composite Simpson integral on a uniform grid, initial=0.

    Matches scipy.integrate.cumulative_simpson(y, dx=dx, initial=0):
    each sub-interval's increment comes from the quadratic through the three
    surrounding samples; interior intervals average the two bracketing
    quadratics.
    """
    y = jnp.moveaxis(y, axis, -1)
    n = y.shape[-1]
    h = dx
    # Quadratic through samples (j, j+1, j+2) integrated over its LEFT half
    # [x_j, x_{j+1}]:  h/12 (5 f_j + 8 f_{j+1} - f_{j+2}); RIGHT half
    # [x_{j+1}, x_{j+2}]: h/12 (-f_j + 8 f_{j+1} + 5 f_{j+2}).
    f0, f1, f2 = y[..., :-2], y[..., 1:-1], y[..., 2:]
    left = h / 12.0 * (5.0 * f0 + 8.0 * f1 - f2)     # interval [j, j+1]
    right = h / 12.0 * (-f0 + 8.0 * f1 + 5.0 * f2)   # interval [j+1, j+2]

    # scipy processes non-overlapping triplets (0,1,2), (2,3,4), ...:
    #   interval i even  -> left half of the quadratic starting at i
    #   interval i odd   -> right half of the quadratic starting at i-1
    #   last interval when the count is odd -> right half of the final triplet
    i = np.arange(n - 1)
    use_right = (i % 2 == 1) | (i == n - 2) & (i % 2 == 0) & (i > 0)
    qidx = np.where(use_right, i - 1, np.minimum(i, n - 3))
    inc = jnp.where(jnp.asarray(use_right), right[..., qidx], left[..., qidx])
    out = jnp.concatenate(
        [jnp.zeros_like(y[..., :1]), jnp.cumsum(inc, axis=-1)], axis=-1)
    return jnp.moveaxis(out, -1, axis)


def cumulative_trapezoid(y, x=None, dx=1.0, axis=-1, initial=0.0):
    """Cumulative trapezoid with an ``initial`` value prepended."""
    y = jnp.moveaxis(y, axis, -1)
    if x is not None:
        d = jnp.diff(x)
    else:
        d = dx
    inc = 0.5 * d * (y[..., 1:] + y[..., :-1])
    out = jnp.concatenate(
        [jnp.full_like(y[..., :1], initial),
         initial + jnp.cumsum(inc, axis=-1)], axis=-1)
    return jnp.moveaxis(out, -1, axis)


def trapz(y, x, axis=-1):
    return jnp.trapezoid(y, x, axis=axis)
