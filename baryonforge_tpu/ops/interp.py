"""Interpolation primitives in JAX: PCHIP, masked PCHIP, cubic splines, and
rectilinear multilinear grids.

These replace the scipy interpolators the reference leans on
(``PchipInterpolator`` for mass inversion — BaryonCorrection.py:287-291,
``CubicSpline`` derivatives — Schneider19.py:911-916, and
``RegularGridInterpolator`` for table readout — Tabulate.py /
BaryonCorrection.py:322). All functions are shape-static and jit/vmap-safe;
masked variants implement the reference's data-dependent point-dropping with
a compress-to-front gather instead of dynamic shapes.
"""

import jax
import jax.numpy as jnp

__all__ = [
    "pchip_derivatives", "pchip_eval", "pchip_interp",
    "masked_pchip_interp", "cubic_spline_coeffs", "cubic_spline_eval",
    "cubic_spline_derivative_eval", "multilinear_interp", "interp1d_linear",
    "collapse_curves",
]


# ---------------------------------------------------------------------------
# PCHIP (Fritsch–Carlson monotone cubic Hermite)
# ---------------------------------------------------------------------------
def pchip_derivatives(x, y):
    """Endpoint-aware monotone derivative estimates, matching scipy's PCHIP.

    x: (N,) strictly increasing; y: (N,). Returns d: (N,).
    """
    h = jnp.diff(x)                       # (N-1,)
    delta = jnp.diff(y) / h               # (N-1,)

    # Interior points: weighted harmonic mean where slopes share a sign
    h_l, h_r = h[:-1], h[1:]              # (N-2,)
    d_l, d_r = delta[:-1], delta[1:]
    w1 = 2.0 * h_r + h_l
    w2 = h_r + 2.0 * h_l
    same_sign = (d_l * d_r) > 0.0
    # guard the division; masked out when not same_sign
    denom = jnp.where(same_sign, w1 / jnp.where(d_l == 0, 1.0, d_l)
                      + w2 / jnp.where(d_r == 0, 1.0, d_r), 1.0)
    d_int = jnp.where(same_sign, (w1 + w2) / denom, 0.0)

    def _edge(h0, h1, del0, del1):
        d = ((2.0 * h0 + h1) * del0 - h0 * del1) / (h0 + h1)
        d = jnp.where(jnp.sign(d) != jnp.sign(del0), 0.0, d)
        d = jnp.where((jnp.sign(del0) != jnp.sign(del1))
                      & (jnp.abs(d) > 3.0 * jnp.abs(del0)),
                      3.0 * del0, d)
        return d

    d0 = _edge(h[0], h[1], delta[0], delta[1])
    dn = _edge(h[-1], h[-2], delta[-1], delta[-2])
    return jnp.concatenate([d0[None], d_int, dn[None]])


def pchip_eval(x, y, d, xq):
    """Evaluate the cubic Hermite defined by (x, y, d) at xq.

    Extrapolates with the boundary cubic pieces (scipy extrapolate=True).
    """
    i = jnp.clip(jnp.searchsorted(x, xq, side="right") - 1, 0, x.shape[0] - 2)
    x0, x1 = x[i], x[i + 1]
    y0, y1 = y[i], y[i + 1]
    d0, d1 = d[i], d[i + 1]
    h = x1 - x0
    t = (xq - x0) / h
    h00 = (1.0 + 2.0 * t) * (1.0 - t) ** 2
    h10 = t * (1.0 - t) ** 2
    h01 = t ** 2 * (3.0 - 2.0 * t)
    h11 = t ** 2 * (t - 1.0)
    return h00 * y0 + h10 * h * d0 + h01 * y1 + h11 * h * d1


def pchip_interp(x, y, xq, extrapolate=True):
    """One-shot monotone cubic interpolation; NaN outside if not extrapolate."""
    d = pchip_derivatives(x, y)
    out = pchip_eval(x, y, d, xq)
    if not extrapolate:
        out = jnp.where((xq < x[0]) | (xq > x[-1]), jnp.nan, out)
    return out


def _compress_valid(x, y, valid, x_pad_step=1.0):
    """Gather valid (x, y) points to the front, padding the tail with a
    strictly increasing x-ramp and the last valid y (flat extension).

    Returns (xc, yc, n_valid). Static shapes throughout.
    """
    n = x.shape[0]
    # stable argsort: invalid points go to the back, order preserved
    order = jnp.argsort(jnp.where(valid, 0, 1), stable=True)
    xs, ys, vs = x[order], y[order], valid[order]
    n_valid = jnp.sum(valid)
    idx = jnp.arange(n)
    last = jnp.maximum(n_valid - 1, 0)
    x_last, y_last = xs[last], ys[last]
    ramp = x_last + (idx - last).astype(x.dtype) * x_pad_step
    xc = jnp.where(vs, xs, ramp)
    yc = jnp.where(vs, ys, y_last)
    return xc, yc, n_valid


def masked_pchip_interp(x, y, valid, xq, min_pts=5):
    """PCHIP through only the ``valid`` subset of (x, y), static shapes.

    Mirrors the reference pattern of dropping broken table rows before
    fitting PchipInterpolator (BaryonCorrection.py:287-291, 243-304).
    Evaluation outside the valid x-range returns NaN (extrapolate=False
    semantics). If fewer than ``min_pts`` points are valid, returns NaN
    everywhere (caller decides the fallback, e.g. displacement d=0).
    """
    span = jnp.maximum(x[-1] - x[0], 1.0)
    xc, yc, n_valid = _compress_valid(x, y, valid, x_pad_step=span)
    out = pchip_interp(xc, yc, xq, extrapolate=True)
    last = jnp.maximum(n_valid - 1, 0)
    in_range = (xq >= xc[0]) & (xq <= xc[last])
    ok = (n_valid > min_pts) & in_range
    return jnp.where(ok, out, jnp.nan)


# ---------------------------------------------------------------------------
# Natural cubic spline (for CubicSpline + derivative in CollisionlessMatter)
# ---------------------------------------------------------------------------
def cubic_spline_coeffs(x, y):
    """Second derivatives of the not-a-knot cubic spline through (x, y).

    y may be (..., N); x is (N,). Solves the tridiagonal system with the
    Thomas algorithm via an unrolled scan (N is static).
    """
    n = x.shape[0]
    h = jnp.diff(x)                                  # (N-1,)
    y = jnp.moveaxis(jnp.atleast_2d(y), -1, 0)       # (N, B)

    # not-a-knot boundary conditions (scipy default)
    # system in unknown second-derivative values m_i
    d_main = jnp.concatenate([
        jnp.array([h[1]]),
        2.0 * (h[:-1] + h[1:]),
        jnp.array([h[-2]]),
    ])
    d_lower = jnp.concatenate([h[:-1], jnp.array([h[-1] + h[-2]])])
    d_upper = jnp.concatenate([jnp.array([h[0] + h[1]]), h[1:]])
    slope = (y[1:] - y[:-1]) / h[:, None]            # (N-1, B)
    rhs_int = 3.0 * (slope[1:] * h[:-1, None] + slope[:-1] * h[1:, None])
    rhs0 = ((h[0] + 2.0 * (h[0] + h[1])) * h[1] * slope[0]
            + h[0] ** 2 * slope[1]) / (h[0] + h[1])
    rhsn = (h[-1] ** 2 * slope[-2]
            + (2.0 * (h[-1] + h[-2]) + h[-1]) * h[-2] * slope[-1]) / (h[-1] + h[-2])
    rhs = jnp.concatenate([rhs0[None], rhs_int, rhsn[None]], axis=0)  # (N, B)

    # Thomas algorithm (this solves for first-derivative values d_i of the
    # C2 cubic spline — standard Hermite form afterwards)
    def fwd(carry, inp):
        cp_prev, dp_prev = carry
        a_i, b_i, c_i, r_i = inp
        denom = b_i - a_i * cp_prev
        cp = c_i / denom
        dp = (r_i - a_i * dp_prev) / denom
        return (cp, dp), (cp, dp)

    a_full = jnp.concatenate([jnp.array([0.0]), d_lower])
    c_full = jnp.concatenate([d_upper, jnp.array([0.0])])
    (_, _), (cps, dps) = jax.lax.scan(
        fwd, (jnp.array(0.0), jnp.zeros(y.shape[1])),
        (a_full, d_main, c_full, rhs))

    def bwd(carry, inp):
        x_next = carry
        cp_i, dp_i = inp
        x_i = dp_i - cp_i * x_next
        return x_i, x_i

    _, ds = jax.lax.scan(bwd, jnp.zeros(y.shape[1]), (cps, dps), reverse=True)
    return jnp.moveaxis(ds, 0, -1)                   # (..., N) first derivs


def _spline_segment(x, y, d, xq):
    i = jnp.clip(jnp.searchsorted(x, xq, side="right") - 1, 0, x.shape[0] - 2)
    h = x[i + 1] - x[i]
    t = (xq - x[i]) / h
    return i, h, t


def cubic_spline_eval(x, y, d, xq):
    """Evaluate Hermite-form spline; y, d are (..., N), xq (...Q,)."""
    i, h, t = _spline_segment(x, y, d, xq)
    y0, y1 = y[..., i], y[..., i + 1]
    d0, d1 = d[..., i], d[..., i + 1]
    h00 = (1 + 2 * t) * (1 - t) ** 2
    h10 = t * (1 - t) ** 2
    h01 = t ** 2 * (3 - 2 * t)
    h11 = t ** 2 * (t - 1)
    return h00 * y0 + h10 * h * d0 + h01 * y1 + h11 * h * d1


def cubic_spline_derivative_eval(x, y, d, xq):
    """First derivative of the Hermite-form spline at xq."""
    i, h, t = _spline_segment(x, y, d, xq)
    y0, y1 = y[..., i], y[..., i + 1]
    d0, d1 = d[..., i], d[..., i + 1]
    dh00 = 6 * t * (t - 1) / h
    dh10 = (3 * t - 1) * (t - 1)
    dh01 = -6 * t * (t - 1) / h
    dh11 = t * (3 * t - 2)
    return dh00 * y0 + dh10 * d0 + dh01 * y1 + dh11 * d1


# ---------------------------------------------------------------------------
# Rectilinear multilinear interpolation (RegularGridInterpolator analog)
# ---------------------------------------------------------------------------
def multilinear_interp(grid_axes, values, points, fill_value=jnp.nan):
    """Multilinear interpolation on a rectilinear grid.

    grid_axes : tuple of (Ni,) increasing arrays (static length D)
    values    : (N1, ..., ND)
    points    : (Q, D)
    Outside the grid returns ``fill_value`` (matching the reference's
    RegularGridInterpolator(bounds_error=False, fill_value=nan)).
    """
    D = len(grid_axes)
    Q = points.shape[0]
    idx, frac, oob = [], [], jnp.zeros(Q, dtype=bool)
    for d in range(D):
        ax = grid_axes[d]
        p = points[:, d]
        i = jnp.clip(jnp.searchsorted(ax, p, side="right") - 1, 0, ax.shape[0] - 2)
        t = (p - ax[i]) / (ax[i + 1] - ax[i])
        oob = oob | (p < ax[0]) | (p > ax[-1])
        idx.append(i)
        frac.append(t)

    out = jnp.zeros(Q, dtype=values.dtype)
    for corner in range(2 ** D):
        w = jnp.ones(Q, dtype=values.dtype)
        loc = []
        for d in range(D):
            bit = (corner >> d) & 1
            w = w * jnp.where(bit, frac[d], 1.0 - frac[d])
            loc.append(idx[d] + bit)
        out = out + w * values[tuple(loc)]
    return jnp.where(oob, fill_value, out)


def interp1d_linear(x, y, xq, left=None, right=None):
    """jnp.interp wrapper with the same defaults as np.interp."""
    return jnp.interp(xq, x, y, left=left, right=right)


def collapse_curves(table, axes, r_axis, M, a, p_keys, kwargs, fill=0.0):
    """Collapse every non-radial axis of a (z, M, r, p...) lookup table at
    per-halo scalars, returning one radial curve per halo.

    This is the runner fast-path enabler: (z, M, p...) are constant per
    halo, so interpolating those axes ONCE reduces the per-pixel readout
    to a 1D log-uniform lerp. Extra parameter axes (p_keys — the
    reference's per-halo-property mechanism, Tabulate.py:395-730) are
    per-halo scalars too, so they collapse the same way: 2^(2+P) corner
    gathers of radial rows, multilinearly weighted (bit-matching
    :func:`multilinear_interp` on the same table).

    table  : (N_z, N_M, N_r, N_p1, ...) with the radial axis at ``r_axis``
    axes   : per-axis grids, interp coordinates (log z+1, log M, ...)
    M, a   : per-halo mass / scale factor (scalars or (n,))
    p_keys : names of the trailing parameter axes
    kwargs : per-halo values for each p_key (scalar or (n,))
    fill   : value for rows with any out-of-table coordinate
             (0.0 for raw tables, -inf for log tables)

    Returns (curves (n, N_r), ln_r0, dlnr).
    """
    dt = table.dtype
    M_use = jnp.atleast_1d(jnp.asarray(M, dtype=dt))
    a_use = jnp.atleast_1d(jnp.asarray(a, dtype=dt))
    n = M_use.size
    vals = [jnp.broadcast_to(jnp.log(1.0 / a_use), (n,)),
            jnp.log(M_use)]
    for k in p_keys:
        assert k in kwargs, f"need {k} as input (table built with it)"
        vals.append(jnp.broadcast_to(
            jnp.asarray(kwargs[k], dtype=dt), (n,)))

    def locate(ax, x):
        i = jnp.clip(jnp.searchsorted(ax, x, side="right") - 1,
                     0, ax.shape[0] - 2)
        t = (x - ax[i]) / (ax[i + 1] - ax[i])
        oob = (x < ax[0]) | (x > ax[-1])
        return i, t, oob

    axis_ids = [0, 1] + list(range(r_axis + 1, table.ndim))
    locs = [locate(axes[ai], v) for ai, v in zip(axis_ids, vals)]
    tab_t = jnp.transpose(table, tuple(axis_ids) + (r_axis,))
    oob = locs[0][2]
    for loc in locs[1:]:
        oob = oob | loc[2]
    curves = jnp.zeros((n, table.shape[r_axis]), dtype=dt)
    for corner in range(2 ** len(locs)):
        w = jnp.ones((n,), dtype=dt)
        idx = []
        for d, (i, t, _) in enumerate(locs):
            bit = (corner >> d) & 1
            idx.append(i + bit)
            w = w * jnp.where(bit, t, 1.0 - t)
        curves = curves + w[:, None] * tab_t[tuple(idx)]
    curves = jnp.where(oob[:, None], fill, curves)
    ln_r = axes[r_axis]
    return curves, ln_r[0], ln_r[1] - ln_r[0]
