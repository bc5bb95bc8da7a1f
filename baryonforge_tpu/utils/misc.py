"""Support utilities (reference utils/misc.py analog).

``generate_operator_method`` lives in Profiles/Base.py (profile algebra is
part of the framework core here). This module carries the numerics/plumbing
helpers: the robust near-zero root finder, FFT-precision merge rules, and
the pickling helper (our cosmology object is a pure pytree, so the
reference's ``destory_Pk`` SwigPyObject stripping is a no-op kept for API
parity).
"""

import warnings
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.interp import pchip_derivatives, pchip_eval

__all__ = ["safe_Pchip_minimize", "destory_Pk", "destroy_Pk",
           "build_cosmodict", "combine_fftpars", "log_time"]


def safe_Pchip_minimize(y, x, n_window=5):
    """Root of y(x) ~ 0 via monotone interpolation around the sign change
    (reference utils/misc.py:239-256), shape-static jnp.

    Finds the first index where y crosses zero, fits a PCHIP of x(y) on a
    +-n_window point window, and evaluates at y = 0. Fallbacks: if y never
    crosses zero, returns +inf if y is all-positive else x[argmin |y|].
    """
    y = jnp.asarray(y)
    x = jnp.asarray(x)
    n = y.shape[0]
    sign_change = (y[:-1] * y[1:] <= 0) & (y[:-1] != y[1:])
    has_root = jnp.any(sign_change)
    i0 = jnp.argmax(sign_change)          # first crossing

    lo = jnp.clip(i0 - n_window + 1, 0, n - 2 * n_window)
    window = lo + jnp.arange(2 * n_window)
    xw = x[window]
    yw = y[window]
    # need yw increasing for interpolation of x(y); flip if decreasing
    dec = yw[-1] < yw[0]
    yw = jnp.where(dec, -yw, yw)
    order = jnp.argsort(yw)
    yw_s, xw_s = yw[order], xw[order]
    # de-duplicate: add tiny ramp to force strict monotonicity
    eps = (jnp.abs(yw_s[-1] - yw_s[0]) + 1e-30) * 1e-12
    yw_s = yw_s + jnp.arange(2 * n_window) * eps
    d = pchip_derivatives(yw_s, xw_s)
    root = pchip_eval(yw_s, xw_s, d, jnp.zeros(()))

    all_pos = jnp.all(y > 0)
    fallback = jnp.where(all_pos, jnp.inf, x[jnp.argmin(jnp.abs(y))])
    return jnp.where(has_root, root, fallback)


def destory_Pk(cosmo):
    """API-parity no-op: our Cosmology is a pure pytree of scalars, always
    pickleable (the reference strips SwigPyObject P(k) caches,
    utils/misc.py:157-184)."""
    return cosmo


destroy_Pk = destory_Pk


def build_cosmodict(cosmo):
    from ..cosmo.core import build_cosmodict as _b
    return _b(cosmo)


# merge rules per FFT-precision parameter (reference utils/misc.py:261-336)
_FFT_PRECISION_LOGIC = {
    "plaw_fourier": min,
    "padding_lo_fftlog": min,
    "padding_lo_extra": min,
    "padding_hi_fftlog": max,
    "padding_hi_extra": max,
    "n_per_decade": max,
}


def combine_fftpars(pars_a, pars_b):
    """Merge two FFTLog precision dicts with per-key min/max rules."""
    out = dict(pars_a)
    for k, v in pars_b.items():
        if k in out and out[k] is not None and v is not None:
            rule = _FFT_PRECISION_LOGIC.get(k)
            out[k] = rule(out[k], v) if rule else out[k]
        elif v is not None:
            out[k] = v
        elif k in out:
            warnings.warn(f"FFT parameter {k} is None in one operand; "
                          "keeping the defined value")
    return out


def log_time(fn=None, logger=print):
    """Decorator injecting a ``log_line_time(tag)`` checkpoint callback that
    prints cumulative wall time (reference utils/debug.py:6-74 analog)."""
    import time
    import functools

    def deco(f):
        @functools.wraps(f)
        def wrapper(*args, **kwargs):
            t0 = time.perf_counter()
            marks = []

            def log_line_time(tag):
                marks.append((tag, time.perf_counter() - t0))
                logger(f"[log_time] {f.__name__}:{tag} "
                       f"+{marks[-1][1]:.3f}s")

            kwargs.setdefault("log_line_time", log_line_time)
            try:
                return f(*args, **kwargs)
            except TypeError:
                kwargs.pop("log_line_time", None)
                return f(*args, **kwargs)
        return wrapper

    return deco(fn) if fn is not None else deco
