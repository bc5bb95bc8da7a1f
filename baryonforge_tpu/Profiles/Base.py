"""Profile framework base class (reference Profiles/Base.py analog).

Design: profiles are light Python objects holding scalar parameters; all
evaluation (``_real``) is pure jnp over (M, r) grids so it traces under
jit/vmap. The reference's per-halo Python loops (numeric normalizations with
halo-dependent limits, Schneider19.py:290-294) become broadcasted log-grids;
its nested M x r projection loop (Base.py:251-254) becomes one batched
gather+trapezoid.

Radial/evaluation grids are derived from *concrete* r inputs (host numpy) so
shapes stay static; M and a may be traced values. Hot paths never call these
directly — they read tables (utils/Tabulate.py, Profiles/BaryonCorrection.py).

Conventions mirrored from the reference:
  * inputs r [comoving Mpc], M [Msun], a; outputs mirror input ranks
  * sigmoid large-r cutoff kfac = 1/(1+exp(2(r - cutoff))) with overflow
    guard (Schneider19.py:299-301)
  * concentration fallback chain cdelta -> c_M_relation -> Diemer15
    (Schneider19.py:269-278), non-finite c -> 1
  * ``projected`` defaults to a real-space LOS integral with a hard
    ``proj_cutoff`` bound (Base.py:114-119, 187-266)
"""

import operator
import warnings
import numpy as np
import jax
import jax.numpy as jnp

from ..cosmo import massdef as _massdef
from ..cosmo import concentration as _conc
from ..ops import fftlog as _fftlog

__all__ = ["Profile", "hyper_params", "generate_operator_method"]

hyper_params = ["mass_def", "c_M_relation", "use_fftlog_projection",
                "padding_lo_proj", "padding_hi_proj", "n_per_decade_proj",
                "r_min_int", "r_max_int", "r_steps", "xi_mm"]

# per-parameter merge rules for combining two profiles' hyper params
# (profile algebra), mirroring the reference's _fft_precision_logic
# min/max/warn table (reference utils/misc.py:261-336): grid/integration
# knobs take the SUPERSET of both operands' requirements; identity-like
# knobs (mass_def, c_M_relation, xi_mm, ...) have no automatic rule —
# operand A wins with a warning when they differ.
_hyper_merge_logic = {
    "padding_lo_proj": min,
    "padding_hi_proj": max,
    "n_per_decade_proj": max,
    "r_min_int": min,
    "r_max_int": max,
    "r_steps": max,
    "mass_def": None,
    "c_M_relation": None,
    "use_fftlog_projection": None,
    "xi_mm": None,
}

_DEFAULT_FFT_PRECISION = dict(
    plaw_fourier=-2.0,
    padding_lo_fftlog=1e-2, padding_hi_fftlog=1e2,
    padding_lo_extra=1e-4, padding_hi_extra=1e4,
    n_per_decade=64,
)


def _atleast_1d_pair(r, M):
    r_use = jnp.atleast_1d(jnp.asarray(r, dtype=jnp.result_type(float)))
    M_use = jnp.atleast_1d(jnp.asarray(M, dtype=jnp.result_type(float)))
    return r_use, M_use


def _mirror_dims(prof, r, M):
    """Squeeze output axes to mirror scalar inputs (reference convention)."""
    if jnp.ndim(r) == 0:
        prof = jnp.squeeze(prof, axis=-1)
    if jnp.ndim(M) == 0:
        prof = jnp.squeeze(prof, axis=0)
    return prof


def sigmoid_cutoff(r_use, cutoff):
    """kfac = 1 / (1 + exp(2 (r - cutoff))) with overflow guard."""
    c = 1e3 if cutoff is None else cutoff
    arg = r_use - c
    arg = jnp.where(arg > 30.0, jnp.inf, arg)
    return 1.0 / (1.0 + jnp.exp(2.0 * arg))


class Profile:
    """Base halo profile: real / projected / fourier + parameter handling."""

    model_param_names = []
    hyper_param_names = hyper_params

    def __init__(self, mass_def=_massdef.MassDef200c, c_M_relation=None,
                 use_fftlog_projection=False, padding_lo_proj=0.1,
                 padding_hi_proj=10.0, n_per_decade_proj=10,
                 r_min_int=1e-6, r_max_int=1e3, r_steps=500,
                 xi_mm=None, **kwargs):

        # parameter auto-init (reference Base.py:70-78): slope params
        # (mu_/nu_/zeta_) default to 0, mass pivots (M_*) to 1e14, rest None
        for m in self.model_param_names:
            if m in kwargs:
                setattr(self, m, kwargs[m])
            elif ("mu_" in m) or ("nu_" in m) or ("zeta_" in m):
                setattr(self, m, 0)
            elif "M_" in m:
                setattr(self, m, 1e14)
            else:
                setattr(self, m, None)

        self.mass_def = mass_def
        if c_M_relation is not None:
            self.c_M_relation = c_M_relation(mass_def=mass_def)
        else:
            self.c_M_relation = None
        self._c_M_relation = c_M_relation

        self.padding_lo_proj = padding_lo_proj
        self.padding_hi_proj = padding_hi_proj
        self.n_per_decade_proj = n_per_decade_proj
        self.r_min_int = r_min_int
        self.r_max_int = r_max_int
        self.r_steps = r_steps
        self.xi_mm = xi_mm

        self.cutoff = kwargs.get("cutoff", 1e3)
        self.proj_cutoff = kwargs.get("proj_cutoff", self.cutoff)

        self._use_fftlog_projection = use_fftlog_projection
        if use_fftlog_projection:
            assert self.cutoff == self.proj_cutoff, (
                "fftlog projection requires cutoff == proj_cutoff "
                f"(got {self.cutoff} vs {self.proj_cutoff})")

        self.precision_fftlog = dict(_DEFAULT_FFT_PRECISION)

    # ------------------------------------------------------------------
    # parameter views / mutation
    # ------------------------------------------------------------------
    @property
    def model_params(self):
        return {k: v for k, v in vars(self).items()
                if k in self.model_param_names}

    @property
    def hyper_params(self):
        params = {k: v for k, v in vars(self).items()
                  if k in self.hyper_param_names}
        params["c_M_relation"] = self._c_M_relation
        params["use_fftlog_projection"] = self._use_fftlog_projection
        return params

    def set_parameter(self, key, value):
        from ..utils.Tabulate import _set_parameter
        _set_parameter(self, key, value)

    def update_precision_fftlog(self, **pars):
        """Update FFTLog knobs recursively on nested profiles."""
        self.precision_fftlog.update(pars)
        for v in vars(self).values():
            if isinstance(v, Profile):
                v.update_precision_fftlog(**pars)

    # ------------------------------------------------------------------
    # concentration helper (fallback chain, Schneider19.py:269-278)
    # ------------------------------------------------------------------
    def _get_concentration(self, cosmo, M_use, a):
        cdelta = getattr(self, "cdelta", None)
        if (cdelta is None) and (self.c_M_relation is None):
            rel = _conc.ConcentrationDiemer15(mass_def=self.mass_def)
        elif self.c_M_relation is not None:
            rel = self.c_M_relation
        else:
            rel = _conc.ConcentrationConstant(c=cdelta,
                                              mass_def=self.mass_def)
        c = rel(cosmo, M_use, a)
        return jnp.where(jnp.isfinite(c), c, 1.0)

    # ------------------------------------------------------------------
    # evaluation entry points
    # ------------------------------------------------------------------
    def _real(self, cosmo, r, M, a):
        raise NotImplementedError

    def real(self, cosmo, r, M, a, **kwargs):
        r_use, M_use = _atleast_1d_pair(r, M)
        prof = self._real(cosmo, r_use, M_use, a, **kwargs)
        return _mirror_dims(prof, r, M)

    # -- projection ------------------------------------------------------
    def _projection_grids(self, r):
        """Static LOS integration grids from concrete r (host side)."""
        r_np = np.atleast_1d(np.asarray(r, dtype=float))
        int_min = self.padding_lo_proj * float(r_np.min())
        int_max = self.padding_hi_proj * float(r_np.max())
        if self.proj_cutoff is not None:
            int_max = max(self.proj_cutoff, int_max)
        r_max = self.proj_cutoff if self.proj_cutoff is not None else \
            (self.cutoff if self.cutoff is not None else 1e4)
        # size the grid AFTER the cutoff extension (the reference sizes it
        # before, Base.py:219-225, leaving narrow-r calls badly
        # under-resolved: e.g. 20 points spanning 4 decades). Ceil the
        # decade count: integer truncation made resolution jump at decade
        # boundaries (a 3.99-decade span got 3 decades' points).
        span = max(int_max, r_max) / int_min
        int_N = max(int(self.n_per_decade_proj * np.ceil(np.log10(span))),
                    4 * self.n_per_decade_proj)
        r_integral = np.geomspace(int_min, int_max, int_N)
        r_proj = np.geomspace(int_min, r_max, int_N)
        return jnp.asarray(r_integral), jnp.asarray(r_proj)

    def _projected_realspace(self, cosmo, r, M, a, **kwargs):
        """Sigma(R) = 2 ∫ rho(sqrt(R^2 + l^2)) dl on a fixed log grid.

        Batched replacement for the reference's nested M x r trapz loop
        (Base.py:251-254): one gather over (M, r, l).
        """
        r_use, M_use = _atleast_1d_pair(r, M)
        r_integral, r_proj = self._projection_grids(np.asarray(r))

        # evaluate the density EXACTLY at the LOS points sqrt(l^2 + R^2)
        # (the reference linearly interpolates a log-grid sample,
        # Base.py:254 — several-% systematic error on steep profiles) and
        # integrate in log-ell: ∫ f dl = ∫ f l dlnl (second-order accurate
        # on the geometric grid)
        s = jnp.sqrt(r_proj[None, :] ** 2 + r_use[:, None] ** 2)  # (r, L)
        vals = self._real(cosmo, s.reshape(-1), M_use, a, **kwargs)
        vals = vals.reshape(M_use.size, r_use.size, r_proj.size)
        proj = 2.0 * jnp.trapezoid(vals * r_proj[None, None, :],
                                   jnp.log(r_proj)[None, None, :], axis=-1)
        # l in [0, int_min] segment (dropped by the grid; the integrand is
        # flat there since s ~ R): rectangle correction. The reference
        # drops this chunk entirely (up to ~10% of Sigma for scalar r).
        proj = proj + 2.0 * r_proj[0] * vals[..., 0]
        return proj

    def _projected(self, cosmo, r, M, a, **kwargs):
        if self._use_fftlog_projection:
            return self._projected_fftlog(cosmo, r, M, a, **kwargs)
        return self._projected_realspace(cosmo, r, M, a, **kwargs)

    def projected(self, cosmo, r, M, a, **kwargs):
        # pass raw r through: the LOS grid construction needs host-concrete
        # r values (static shapes); the implementations atleast_1d r
        # themselves
        prof = self._projected(cosmo, r, M, a, **kwargs)
        return _mirror_dims(prof, r, M)

    # -- fourier -----------------------------------------------------------
    def _fftlog_r_grid(self, k):
        """Padded real-space grid reciprocal to the requested k range.

        The span covers BOTH padding knob pairs (``*_extra`` and
        ``*_fftlog``): profiles that demand extreme fftlog padding against
        ringing (e.g. Stars, reference Schneider19.py:459-466) widen the
        sampled grid here, and composed profiles inherit the widest
        operand's span via ``combine_fftpars``."""
        k_np = np.atleast_1d(np.asarray(k, dtype=float))
        p = self.precision_fftlog
        pad_lo = min(p["padding_lo_extra"], p["padding_lo_fftlog"])
        pad_hi = max(p["padding_hi_extra"], p["padding_hi_fftlog"])
        r_lo = pad_lo / float(k_np.max())
        r_hi = pad_hi / float(k_np.min())
        n = int(np.ceil(np.log10(r_hi / r_lo) * p["n_per_decade"]))
        n = int(2 ** np.ceil(np.log2(max(n, 64))))
        return jnp.asarray(np.geomspace(r_lo, r_hi, n))

    def _fourier_fftlog(self, cosmo, k, M, a, **kwargs):
        k_use, M_use = _atleast_1d_pair(k, M)
        r_grid = self._fftlog_r_grid(k)
        prof = self._real(cosmo, r_grid, M_use, a, **kwargs)   # (M, R)
        plaw = self.precision_fftlog["plaw_fourier"]

        def tr(row):
            return _fftlog.sph_fourier_3d(r_grid, row, k_use, plaw=plaw)

        return jax.vmap(tr)(prof)                               # (M, k)

    def fourier(self, cosmo, k, M, a, **kwargs):
        # raw k passes through so the reciprocal grids stay host-concrete
        if hasattr(self, "_fourier"):
            k_use, M_use = _atleast_1d_pair(k, M)
            prof = self._fourier(cosmo, k_use, M_use, a, **kwargs)
        else:
            prof = self._fourier_fftlog(cosmo, k, M, a, **kwargs)
        return _mirror_dims(prof, k, M)

    def _projected_fftlog(self, cosmo, r, M, a, **kwargs):
        """Projected profile via a 3D->2D Fourier round trip."""
        r_use, M_use = _atleast_1d_pair(r, M)
        r_grid = self._fftlog_r_grid(np.asarray(r) / 10.0)
        prof = self._real(cosmo, r_grid, M_use, a, **kwargs)
        plaw = self.precision_fftlog["plaw_fourier"]

        def tr(row):
            # Sigma(R) = (1/2pi) ∫ k F3D(k) J0(kR) dk: transform forward 3D
            # then inverse 2D on the internal grids
            k, at = _fftlog.fht(r_grid, row * r_grid ** 1.5, mu=0.5,
                                q=1.5 + plaw)
            F = (2.0 * jnp.pi) ** 1.5 * at / k ** 1.5
            return _fftlog.proj_inverse_2d(k, F, r_use, plaw=plaw)

        return jax.vmap(tr)(prof)

    # ------------------------------------------------------------------
    # pretty-printing (reference Base.py:269-298)
    # ------------------------------------------------------------------
    def __str_par__(self):
        s = "(" + ", ".join(f"{m} = {getattr(self, m)}"
                            for m in self.model_param_names) + ")"
        return s

    def __str_prf__(self):
        return self.__class__.__name__

    def __str__(self):
        return self.__str_prf__() + self.__str_par__()

    __repr__ = __str__

    # operator algebra hooks installed below
    pass


# ---------------------------------------------------------------------------
# Profile algebra (reference utils/misc.py:9-154)
# ---------------------------------------------------------------------------
class _CombinedProfile(Profile):
    """Profile wrapping an operator over one or two profiles."""

    def __init__(self, op, A, B=None, reflect=False):
        self._op = op
        self._A = A
        self._B = B
        self._reflect = reflect

        base = A if isinstance(A, Profile) else B
        names = set()
        for x in (A, B):
            if isinstance(x, Profile):
                names |= set(x.model_param_names)
        self.model_param_names = sorted(names)

        hp = dict(base.hyper_params)
        # merged hyper params per the _hyper_merge_logic table: grid /
        # integration knobs take the superset of both operands'
        # requirements (the old "B wins only where A is None" silently
        # kept A's r_steps-class knobs); identity-like knobs keep A
        # with a warning when the operands disagree
        if isinstance(A, Profile) and isinstance(B, Profile):
            hpb = B.hyper_params
            for k, vb in hpb.items():
                va = hp.get(k)
                if va is None:
                    hp[k] = vb
                    continue
                if vb is None:
                    continue
                rule = _hyper_merge_logic.get(k)
                if rule is not None:
                    try:
                        hp[k] = rule(va, vb)
                    except TypeError:     # non-comparable user objects
                        pass
                else:
                    differ = va is not vb
                    try:
                        differ = differ and bool(va != vb)
                    except Exception:     # array-valued / odd __eq__
                        pass
                    if differ:
                        import warnings
                        warnings.warn(
                            f"hyper parameter {k} differs between "
                            f"combined profiles ({va!r}, {vb!r}); using "
                            "the first operand's value")
        mp = {}
        for x in (A, B):
            if isinstance(x, Profile):
                for k, v in x.model_params.items():
                    if k not in mp or mp[k] is None:
                        mp[k] = v
        super().__init__(**{**mp, **hp})

        # merge the operands' FFTLog precision (reference
        # utils/misc.py:68-126 with the _fft_precision_logic table at
        # 261-336): without this, (Stars + Gas).fourier silently evaluated
        # with default padding even though Stars demands 1e-5/1e5
        from ..utils.misc import combine_fftpars
        fp = None
        for x in (A, B):
            if isinstance(x, Profile):
                fp = (dict(x.precision_fftlog) if fp is None
                      else combine_fftpars(fp, x.precision_fftlog))
        if fp is not None:
            self.precision_fftlog = fp

    def _eval_operand(self, x, method, cosmo, r, M, a, **kw):
        if isinstance(x, Profile):
            return getattr(x, method)(cosmo, r, M, a, **kw)
        return x     # scalar

    def _apply(self, method, cosmo, r, M, a, **kw):
        A = self._eval_operand(self._A, method, cosmo, r, M, a, **kw)
        if self._B is None:
            return self._op(A)
        B = self._eval_operand(self._B, method, cosmo, r, M, a, **kw)
        return self._op(B, A) if self._reflect else self._op(A, B)

    def _real(self, cosmo, r, M, a, **kw):
        A = (self._A._real(cosmo, r, M, a, **kw)
             if isinstance(self._A, Profile) else self._A)
        if self._B is None:
            return self._op(A)
        B = (self._B._real(cosmo, r, M, a, **kw)
             if isinstance(self._B, Profile) else self._B)
        return self._op(B, A) if self._reflect else self._op(A, B)

    def _fourier_available(self):
        def has_f(x):
            return (not isinstance(x, Profile)) or hasattr(x, "_fourier") \
                or isinstance(x, _CombinedProfile) and x._fourier_available()
        return has_f(self._A) and (self._B is None or has_f(self._B))

    def set_parameter(self, key, value):
        from ..utils.Tabulate import _set_parameter
        for x in (self._A, self._B):
            if isinstance(x, Profile):
                _set_parameter(x, key, value)
        if key in vars(self):
            setattr(self, key, value)

    def __str_prf__(self):
        name = getattr(self._op, "__name__", str(self._op))
        if self._B is None:
            return f"{name}[{self._A.__str_prf__()}]"
        def nm(x):
            return x.__str_prf__() if isinstance(x, Profile) else str(x)
        return f"{name}[{nm(self._A)}, {nm(self._B)}]"


def generate_operator_method(op, reflect=False):
    """Build an operator dunder producing a combined profile
    (reference utils/misc.py:49-152)."""
    if op in (operator.abs, operator.pos, operator.neg):
        def _unary(self):
            return _CombinedProfile(op, self)
        return _unary

    def _binary(self, other):
        return _CombinedProfile(op, self, other, reflect=reflect)
    return _binary


Profile.__add__ = generate_operator_method(operator.add)
Profile.__mul__ = generate_operator_method(operator.mul)
Profile.__sub__ = generate_operator_method(operator.sub)
Profile.__truediv__ = generate_operator_method(operator.truediv)
Profile.__pow__ = generate_operator_method(operator.pow)
Profile.__radd__ = generate_operator_method(operator.add, reflect=True)
Profile.__rmul__ = generate_operator_method(operator.mul, reflect=True)
Profile.__rsub__ = generate_operator_method(operator.sub, reflect=True)
Profile.__rtruediv__ = generate_operator_method(operator.truediv, reflect=True)
Profile.__abs__ = generate_operator_method(operator.abs)
Profile.__pos__ = generate_operator_method(operator.pos)
Profile.__neg__ = generate_operator_method(operator.neg)
