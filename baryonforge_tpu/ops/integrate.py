"""Integration primitives: cumulative Simpson, trapezoid helpers.

Replaces scipy.integrate.cumulative_simpson used throughout the reference for
enclosed-mass curves (Schneider19.py:860-864, BaryonCorrection.py:564, 682)
and inward pressure integrals (Thermodynamic.py:242-243).
"""

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
    h = dx
    # Quadratic through (i-1, i, i+1) integrated over the LEFT half [i-1, i]:
    #   h/12 * (5 f_{i-1} + 8 f_i - f_{i+1})
    # and over the RIGHT half [i, i+1]:
    #   h/12 * (-f_{i-1} + 8 f_i + 5 f_{i+1})
    f0, f1, f2 = y[..., :-2], y[..., 1:-1], y[..., 2:]
    left = h / 12.0 * (5.0 * f0 + 8.0 * f1 - f2)     # increment for [i-1, i]
    right = h / 12.0 * (-f0 + 8.0 * f1 + 5.0 * f2)   # increment for [i, i+1]

    # interval j (from x_j to x_{j+1}), j = 0..N-2:
    #   j == 0      : left quadratic only (through 0,1,2)  -> left[0]
    #   j == N-2    : right quadratic only (through N-3..) -> right[-1]
    #   else        : average of right[j-1] (quad centered j) and
    #                 left[j] (quad centered j+1)
    interior = 0.5 * (right[..., :-1] + left[..., 1:])
    inc = jnp.concatenate(
        [left[..., :1], interior, right[..., -1:]], axis=-1)
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
