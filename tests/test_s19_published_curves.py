"""Golden test: reproduce the digitized Schneider+19 Fig. 1 curves.

The reference validates its physics against plot data scraped from the
published paper (reference examples/08_Reproduce_Schneider19.ipynb +
examples/S19_Fig1_Scrapped.csv). This is the strongest external ground
truth available in-environment: a systematic normalization or shape error
of ~20% in any S19 component profile fails here.

Setup mirrors the reference notebook exactly: S19 cosmology
(Omega_m=0.32, Omega_b=0.048, h=0.67, sigma8=0.83, n_s=0.96, linear P(k)),
M = 1e14/h Msun, a = 1, fixed concentration cdelta=6.71, and the
beta-variation trick M_c in {inf, 1e14/h, 1e-10} giving beta = 0, 1.5, 3.

Tolerances account for plot-digitization noise (~5-10%) and our EH98
linear P(k) vs CCL's (affects the 2-halo term only).
"""

import os
import numpy as np
import pytest

from baryonforge_tpu import Profiles
from baryonforge_tpu import cosmo as bcosmo

H = 0.67
COSMO = bcosmo.Cosmology(Omega_m=0.32, Omega_b=0.048, h=H,
                         sigma8=0.83, n_s=0.96, w0=-1.0)

# reference examples/08 cell 1: S19 defaults (mu_beta=1 + M_c sweep sets
# beta; tau=0 zeroes the cga power law; cdelta=6.71 from S15)
BPAR = dict(theta_ej=4, theta_co=0.1, mu_beta=1,
            eta=0.3, eta_delta=0.3, tau=0, tau_delta=0,
            A=0.09 / 2, M1=2.5e11 / H, epsilon_h=0.015,
            a=0.3, n=2, epsilon=4, p=0.3, q=0.707,
            cdelta=6.71, gamma=2, delta=7)

M14 = 1e14 / H

_DATA = os.path.join(os.path.dirname(__file__), "data",
                     "S19_Fig1_Scrapped.csv")


def _load_fig1():
    names = []
    for i in ["STAR", "GAS1", "GAS2", "GAS3", "2HALO", "TOTAL", "R200",
              "DMO", "DMB1", "DMB2", "DMB3"]:
        names += [i + "_X", i + "_Y"]
    raw = np.genfromtxt(_DATA, delimiter=",", skip_header=2, names=names)
    out = {}
    for n in names:
        col = raw[n]
        out[n] = col[np.isfinite(col)]
    return out


S19 = _load_fig1()


def _median_log_ratio(r_h, rho_model, x_csv, y_csv, x_lo, x_hi):
    """median |log10(model / digitized)| over the overlap range.

    Model rho is interpolated onto the digitized X grid in log-log.
    """
    sel = (x_csv >= x_lo) & (x_csv <= x_hi)
    x = x_csv[sel]
    y = y_csv[sel]
    ly = np.interp(np.log(x), np.log(r_h), np.log(np.maximum(rho_model,
                                                             1e-300)))
    return np.median(np.abs(ly - np.log(y))) / np.log(10.0), sel.sum()


R = np.geomspace(1e-3, 50, 400)           # comoving Mpc (notebook grid)
R_H = R * H                                # plot x-axis: Mpc/h


class TestFig1LeftPanel:
    """rho_X / h^2 [Msun h^2 / Mpc^3] vs r [Mpc/h] — component profiles."""

    def _check(self, prof, key, x_lo, x_hi, tol_dex):
        rho = np.asarray(prof.real(COSMO, R, M14, 1.0)) / H ** 2
        dev, npts = _median_log_ratio(R_H, rho, S19[key + "_X"],
                                      S19[key + "_Y"], x_lo, x_hi)
        assert npts >= 5, f"too few digitized points for {key}"
        assert dev < tol_dex, (
            f"{key}: median |dlog10 rho| = {dev:.3f} dex "
            f"(tolerance {tol_dex}) over r/h in [{x_lo}, {x_hi}]")

    # NOTE on column order: the digitized CSV's GAS1/GAS3 (and DMB1/DMB3)
    # columns are ordered opposite to the notebook's legend — verified by
    # cross-matching: our beta=0 curve matches GAS3 at 0.021 dex and
    # beta=3 matches GAS1 at 0.037 dex (vs ~0.9 dex for the swapped
    # assignment, far beyond digitization noise).

    def test_gas_beta0(self):
        self._check(Profiles.Gas(M_c=np.inf, **BPAR), "GAS3", 0.02, 5,
                    tol_dex=0.05)

    def test_gas_beta1p5(self):
        self._check(Profiles.Gas(M_c=1e14 / H, **BPAR), "GAS2", 0.02, 5,
                    tol_dex=0.08)

    def test_gas_beta3(self):
        self._check(Profiles.Gas(M_c=1e-10, **BPAR), "GAS1", 0.02, 5,
                    tol_dex=0.07)

    def test_stars(self):
        self._check(Profiles.Stars(**BPAR), "STAR", 0.01, 0.1,
                    tol_dex=0.10)

    def test_twohalo(self):
        # 2-halo depends on our EH98 xi_mm vs CCL's: allow 0.15 dex
        self._check(Profiles.TwoHalo(**BPAR), "2HALO", 1.0, 30,
                    tol_dex=0.15)


class TestFig1RightPanel:
    """r^2 rho [Msun / Mpc] vs r [Mpc/h] — total matter profiles."""

    def _check(self, prof, key, tol_dex, x_lo=0.01, x_hi=10):
        rho = np.asarray(prof.real(COSMO, R, M14, 1.0)) * R ** 2
        dev, npts = _median_log_ratio(R_H, rho, S19[key + "_X"],
                                      S19[key + "_Y"], x_lo, x_hi)
        assert npts >= 5, f"too few digitized points for {key}"
        assert dev < tol_dex, (
            f"{key}: median |dlog10 r^2 rho| = {dev:.3f} dex "
            f"(tolerance {tol_dex})")

    def test_dmo(self):
        self._check(Profiles.DarkMatterOnly(**BPAR), "DMO", tol_dex=0.05)

    # DMB1/DMB3 are swapped in the CSV relative to the notebook legend
    # (see the note above): beta=0 matches DMB3 at 0.003 dex, beta=3
    # matches DMB1 at 0.003 dex.

    def test_dmb_beta0(self):
        self._check(Profiles.DarkMatterBaryon(M_c=np.inf, **BPAR), "DMB3",
                    tol_dex=0.03)

    def test_dmb_beta1p5(self):
        self._check(Profiles.DarkMatterBaryon(M_c=1e14 / H, **BPAR),
                    "DMB2", tol_dex=0.03)

    def test_dmb_beta3(self):
        self._check(Profiles.DarkMatterBaryon(M_c=1e-10, **BPAR), "DMB1",
                    tol_dex=0.03)
