"""Small JAX version-compat shims."""

import jax


def pvary(x, axis_names):
    """Mark ``x`` as varying over manual-mode mesh axes.

    ``jax.lax.pvary`` is deprecated in favour of
    ``jax.lax.pcast(..., to='varying')``; use whichever this JAX has.
    """
    if hasattr(jax.lax, "pcast"):
        return jax.lax.pcast(x, axis_names, to="varying")
    return jax.lax.pvary(x, axis_names)
