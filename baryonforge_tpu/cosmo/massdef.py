"""Spherical-overdensity mass definitions and NFW-based mass translation.

Replaces ``ccl.halos.massdef``: MassDef(Delta, 'critical'|'matter'),
``get_radius`` (physical Mpc), and the mass translator used by the
concentration remappers (reference utils/concentration.py:97-149).
"""

from dataclasses import dataclass
import jax
import jax.numpy as jnp

from . import core

__all__ = ["MassDef", "MassDef200c", "MassDef200m", "MassDef500c",
           "nfw_mu", "translate_mass"]


@dataclass(frozen=True)
class MassDef:
    """Overdensity mass definition: M = (4/3) pi Delta rho_type(a) R^3."""
    Delta: float
    rho_type: str          # 'critical' or 'matter'

    @property
    def name(self):
        return f"{int(self.Delta)}{self.rho_type[0]}"

    def get_Delta(self, cosmo=None, a=None):
        return self.Delta

    def _rho(self, cosmo, a):
        if self.rho_type == "critical":
            return core.rho_crit(cosmo, a)
        elif self.rho_type == "matter":
            return core.rho_x(cosmo, a, "matter", is_comoving=False)
        raise ValueError(f"unknown rho_type {self.rho_type}")

    def get_radius(self, cosmo, M, a):
        """Physical halo radius in Mpc (ccl get_radius convention)."""
        rho = self._rho(cosmo, a)
        return (3.0 * jnp.asarray(M) / (4.0 * jnp.pi * self.Delta * rho)) ** (1.0 / 3.0)

    def get_mass(self, cosmo, R, a):
        """Inverse of get_radius: mass enclosed in physical radius R."""
        rho = self._rho(cosmo, a)
        return 4.0 / 3.0 * jnp.pi * self.Delta * rho * jnp.asarray(R) ** 3

    def __hash__(self):
        return hash((self.Delta, self.rho_type))


MassDef200c = MassDef(200, "critical")
MassDef200m = MassDef(200, "matter")
MassDef500c = MassDef(500, "critical")


def nfw_mu(c):
    """NFW dimensionless enclosed mass mu(c) = ln(1+c) - c/(1+c)."""
    return jnp.log1p(c) - c / (1.0 + c)


def translate_mass(cosmo, M1, a, c1, mdef_in, mdef_out, n_iter=40):
    """Translate halo mass between SO definitions assuming an NFW profile
    with concentration ``c1`` in the input definition.

    Solves  Delta2 rho2 R2^3 = Delta1 rho1 R1^3 mu(c1 R2/R1)/mu(c1)
    for R2 by bisection (static ``n_iter`` steps). Returns (M2, c2).
    """
    M1 = jnp.asarray(M1)
    R1 = mdef_in.get_radius(cosmo, M1, a)
    rho1 = mdef_in._rho(cosmo, a) * mdef_in.Delta
    rho2 = mdef_out._rho(cosmo, a) * mdef_out.Delta

    def f(x):
        # x = R2 / R1
        return rho2 * x ** 3 - rho1 * nfw_mu(c1 * x) / nfw_mu(c1)

    lo = jnp.full(M1.shape, 1e-3)
    hi = jnp.full(M1.shape, 1e3)

    def body(_, state):
        lo, hi = state
        mid = jnp.sqrt(lo * hi)
        fm = f(mid)
        take_hi = fm > 0.0     # f increasing in x
        return jnp.where(take_hi, lo, mid), jnp.where(take_hi, mid, hi)

    lo, hi = jax.lax.fori_loop(0, n_iter, body, (lo, hi))
    x = jnp.sqrt(lo * hi)
    R2 = x * R1
    M2 = mdef_out.get_mass(cosmo, R2, a)
    c2 = c1 * x
    return M2, c2
