"""Golden Delta P(k) validation against the digitized Schneider+19 Fig. 2
curves (tests/data/S19_Fig2_Scrapped.csv, vendored from the reference),
plus an Arico20 suppression test mirroring reference
examples/12_Reproduce_Arico_deltaPk.ipynb.

The reference reproduces Fig. 2 by baryonifying TNG300-3-Dark particles
(reference examples/10). No simulation data is available here, so the
matter field is a synthetic box built from first principles: halos
sampled from the Tinker08 mass function above 10^12.8 Msun (the
reference's mask), truncated-NFW profiles painted at their positions,
and the un-collapsed mass fraction added as a uniform background. The
resulting P(k) suppression tracks the digitized sim curves to ~0.03-0.06
at k = 1-3 h/Mpc (calibrated 2026-08; see the bands below), so a >= 20%
normalization error in any S19/A20 mass component moves the ratio far
outside the asserted bands.
"""

import os

import numpy as np
import pytest

from baryonforge_tpu import Profiles, utils
from baryonforge_tpu import cosmo as bcosmo
from baryonforge_tpu.Runners.Map2DRunner import (BaryonifyGrid,
                                                 PaintProfilesGrid)
from baryonforge_tpu.Profiles.BaryonCorrection import Baryonification3D
from baryonforge_tpu.utils import halomodel as hm

pytestmark = pytest.mark.slow

# cosmology of reference examples/10 and /12 (TNG-like)
H = 0.6711
COSMO = bcosmo.Cosmology(Omega_m=0.3175, Omega_b=0.049, h=H, sigma8=0.82,
                         n_s=0.9649, w0=-1.0)
CD = dict(Omega_m=0.3175, Omega_b=0.049, h=H, sigma8=0.82, n_s=0.9649,
          w0=-1.0)
# S19 defaults as set in reference examples/10 (tau=-inf zeroes their
# unused satellite term; A = 0.09/2 matches their high-mass behavior)
BPAR_S19 = dict(theta_ej=4, theta_co=0.1, M_c=1e14 / H, mu_beta=0.4,
                eta=0.3, eta_delta=0.3, tau=-np.inf, tau_delta=0,
                A=0.09 / 2, M1=2.5e11 / H, epsilon_h=0.015,
                a=0.3, n=2, epsilon=4, p=0.3, q=0.707, gamma=2, delta=7,
                proj_cutoff=205 / H / 2)
# A20 defaults as set in reference examples/12
BPAR_A20 = dict(alpha_g=2, epsilon_h=0.015, M1_0=2.2e11 / H,
                alpha_fsat=1, M1_fsat=1, delta_fsat=1, gamma_fsat=1,
                eps_fsat=1,
                M_c=1.2e14 / H, eta=0.6, mu=0.31, beta=0.6,
                epsilon_hydro=np.sqrt(5),
                M_inn=3.3e13 / H, M_r=1e30, beta_r=2, theta_inn=0.1,
                theta_out=1,
                theta_rg=0.3, sigma_rg=0.1, a=0.3, n=2, p=0.3, q=0.707)

N, L = 256, 128.0


def _pk(field):
    delta = field / field.mean() - 1.0
    fk = np.fft.rfftn(delta) * (L / N) ** 3
    p3 = np.abs(fk) ** 2 / L ** 3
    kf = 2 * np.pi / L
    kx = np.fft.fftfreq(N, 1.0 / N) * kf
    kz = np.fft.rfftfreq(N, 1.0 / N) * kf
    kk = np.sqrt(kx[:, None, None] ** 2 + kx[None, :, None] ** 2
                 + kz[None, None, :] ** 2)
    b = np.arange(0.5, N // 2) * kf
    w = np.digitize(kk.ravel(), b)
    c = np.bincount(w, minlength=b.size + 1)
    s = np.bincount(w, weights=p3.ravel(), minlength=b.size + 1)
    cen = np.concatenate([[0], b]) + kf / 2
    g = c > 0
    return cen[g], (s / np.maximum(c, 1))[g]


@pytest.fixture(scope="module")
def mass_box():
    """(catalog, painted DMO mass map): Tinker08-sampled halos with
    truncated-NFW profiles plus a uniform un-collapsed background."""
    import jax.numpy as jnp

    rng = np.random.default_rng(123)
    lgM = np.linspace(12.8, 15.3, 60)
    M_grid = 10 ** lgM
    dndlgM = np.asarray(hm.MassFuncTinker08()(COSMO,
                                              jnp.asarray(M_grid), 1.0))
    counts = dndlgM * np.gradient(lgM) * L ** 3
    ns = rng.poisson(counts)
    masses = np.repeat(M_grid, ns) * 10 ** rng.uniform(-0.02, 0.02,
                                                       int(ns.sum()))
    n_halos = masses.size
    cat = utils.HaloNDCatalog(x=rng.uniform(0, L, n_halos),
                              y=rng.uniform(0, L, n_halos),
                              z=rng.uniform(0, L, n_halos),
                              M=masses, redshift=0.0, cosmo=CD)

    dmo_tab = utils.TabulatedProfile(Profiles.DarkMatter(**BPAR_S19),
                                     COSMO)
    dmo_tab.setup_interpolator(z_min=0.0, z_max=0.05, N_samples_z=2,
                               z_linear_sampling=True,
                               M_min=3e12, M_max=5e15, N_samples_Mass=12,
                               R_min=1e-3, R_max=60, N_samples_R=64,
                               verbose=False)
    bins = (np.arange(N) + 0.5) * (L / N)
    gm0 = utils.GriddedMap(map=np.zeros((N, N, N)), bins=bins, cosmo=CD,
                           redshift=0.0)
    mass_map = PaintProfilesGrid(cat, gm0, epsilon_max=5, model=dmo_tab,
                                 include_pixel_size=True, halo_batch=64,
                                 verbose=False).process()
    rho_m = float(bcosmo.core.rho_x(COSMO, 1.0, species="matter",
                                    is_comoving=True))
    M_box = rho_m * L ** 3
    # sanity: a realistic collapsed fraction (calibration run: 0.407)
    assert 0.3 < mass_map.sum() / M_box < 0.5
    mass_map = mass_map + (M_box - mass_map.sum()) / N ** 3
    return cat, mass_map


def _suppression(cat, mass_map, DMO, DMB, eps_max, k_eval_h,
                 rdelta=False):
    model = Baryonification3D(DMO, DMB, COSMO, epsilon_max=eps_max)
    model.setup_interpolator(z_min=0.0, z_max=0.05, N_samples_z=2,
                             z_linear_sampling=True,
                             M_min=3e12, M_max=5e15, N_samples_Mass=12,
                             R_min=1e-4, R_max=300,
                             N_samples_R=2000 if rdelta else 500,
                             Rdelta_sampling=rdelta, verbose=False)
    bins = (np.arange(N) + 0.5) * (L / N)
    gm = utils.GriddedMap(map=mass_map, bins=bins, cosmo=CD, redshift=0.0)
    new_map = BaryonifyGrid(cat, gm, epsilon_max=eps_max, model=model,
                            halo_batch=64, verbose=False).process()
    k0, p0 = _pk(mass_map)
    k1, p1 = _pk(new_map)
    r = p1 / p0
    return [float(np.interp(kh * H, k0, r)) for kh in k_eval_h]


def _s19_csv():
    import csv
    path = os.path.join(os.path.dirname(__file__), "data",
                        "S19_Fig2_Scrapped.csv")
    with open(path) as f:
        header = f.readline().split(",")[::2]
        f.readline()
        rows = list(csv.reader(f))
    cols = {}
    for i, name in enumerate(h.strip() for h in header):
        x = np.array([float(r[2 * i]) for r in rows if r[2 * i]])
        y = np.array([float(r[2 * i + 1]) for r in rows if r[2 * i + 1]])
        o = np.argsort(x)
        cols[name] = (x[o], y[o])
    return cols


def test_s19_fig2_mc_anchor(mass_box):
    """S19 Delta P(k) vs the digitized Fig. 2 M_c curves at k = 1 and
    3 h/Mpc. Calibration run (2026-08): ours/S19 = 0.940/0.942 and
    0.806/0.831 at M_c=1e14/h; 0.925/0.892 and 0.776/0.746 at 4e14/h."""
    cat, mass_map = mass_box
    csv_curves = _s19_csv()
    got = {}
    for key, M_c in [("Mc1e14", 1e14 / H), ("Mc4e14", 4e14 / H)]:
        par = dict(BPAR_S19, M_c=M_c)
        r = _suppression(cat, mass_map,
                         Profiles.DarkMatterOnly(**par),
                         Profiles.DarkMatterBaryon(**par),
                         eps_max=10, k_eval_h=[1.0, 3.0])
        got[key] = r
        x, y = csv_curves[key]
        for kh, ours in zip([1.0, 3.0], r):
            ref = float(np.interp(kh, x, y))
            assert abs(ours - ref) < 0.07, (
                f"{key} at k={kh} h/Mpc: ours {ours:.3f} vs "
                f"S19 Fig2 {ref:.3f}")
    # suppression must deepen with M_c, visibly
    assert got["Mc4e14"][1] < got["Mc1e14"][1] - 0.02


def test_a20_suppression(mass_box):
    """Arico20 Delta P(k) (reference examples/12 workflow): weak
    percent-level suppression at the fiducial M_c growing toward small
    scales, and a much deeper response at M_c = 1e15/h. Calibration run
    (2026-08): fiducial 0.996/0.978/0.951 at k = 1/3/6 h/Mpc."""
    cat, mass_map = mass_box
    fid = _suppression(cat, mass_map,
                       Profiles.Arico20.DarkMatterOnly(**BPAR_A20),
                       Profiles.Arico20.DarkMatterBaryon(**BPAR_A20),
                       eps_max=2, k_eval_h=[1.0, 3.0, 6.0], rdelta=True)
    assert 0.98 < fid[0] <= 1.005      # k=1: sub-percent
    assert 0.955 < fid[1] < 0.995      # k=3
    assert 0.92 < fid[2] < 0.98        # k=6
    assert fid[2] < fid[1] < fid[0]    # grows toward small scales

    par = dict(BPAR_A20, M_c=1e15 / H)
    deep = _suppression(cat, mass_map,
                        Profiles.Arico20.DarkMatterOnly(**par),
                        Profiles.Arico20.DarkMatterBaryon(**par),
                        eps_max=2, k_eval_h=[3.0], rdelta=True)
    # measured gap 0.011 (0.967 vs 0.978): A20's M_c response is gentle
    # at these halo masses (beta=0.6 bound-fraction tail)
    assert deep[0] < fid[1] - 0.008    # M_c response
