"""Delta-Cl validation: baryonifying a painted mass shell suppresses the
angular power spectrum at small scales and preserves large scales — the
reference's examples/09_Reproduce_Schneider_deltaCls.ipynb workflow
(paint -> baryonify -> anafast ratio), self-contained via utils/sht.
"""

import numpy as np
import pytest

from baryonforge_tpu import Profiles, Runners, utils
from baryonforge_tpu import cosmo as bcosmo
from baryonforge_tpu.Profiles.BaryonCorrection import Baryonification2D
from baryonforge_tpu.utils import sht
from defaults import COSMO, COSMO_DICT, bpar_S19

RNG = np.random.default_rng(13)
NSIDE = 64
NPIX = 12 * NSIDE * NSIDE


@pytest.mark.slow
def test_baryonification_suppresses_cl():
    n = 120
    ra = RNG.uniform(0, 360, n)
    dec = np.degrees(np.arcsin(RNG.uniform(-1, 1, n)))
    M = 10 ** RNG.uniform(14.0, 15.0, n)
    z = RNG.uniform(0.08, 0.15, n)
    cat = utils.HaloLightConeCatalog(ra=ra, dec=dec, M=M, z=z,
                                     cosmo=COSMO_DICT)

    # paint the DMO mass shell
    tab = utils.TabulatedProfile(
        Profiles.DarkMatterOnly(**bpar_S19, proj_cutoff=100), COSMO)
    tab.setup_interpolator(z_min=0.05, z_max=0.3, N_samples_z=3,
                           M_min=5e13, M_max=3e15, N_samples_Mass=8,
                           R_min=1e-3, R_max=60, N_samples_R=64,
                           verbose=False)
    zero_shell = utils.LightconeShell(map=np.zeros(NPIX), cosmo=COSMO_DICT)
    mass_map = Runners.PaintProfilesShell(
        cat, zero_shell, epsilon_max=10, model=tab,
        include_pixel_size=True, halo_batch=32, verbose=False).process()
    mass_map = mass_map + mass_map.mean()     # uniform background

    # baryonify
    DMO = Profiles.DarkMatterOnly(**bpar_S19, proj_cutoff=100)
    DMB = Profiles.DarkMatterBaryon(**bpar_S19, proj_cutoff=100)
    model = Baryonification2D(DMO, DMB, COSMO, epsilon_max=20)
    model.setup_interpolator(z_min=0.05, z_max=0.3, N_samples_z=3,
                             M_min=5e13, M_max=3e15, N_samples_Mass=8,
                             R_min=1e-3, R_max=60, N_samples_R=64,
                             verbose=False)
    shell = utils.LightconeShell(map=mass_map, cosmo=COSMO_DICT)
    new_map = Runners.BaryonifyShell(cat, shell, epsilon_max=20,
                                     model=model, halo_batch=32,
                                     verbose=False).process()

    lmax = 3 * NSIDE - 1
    d0 = mass_map / mass_map.mean() - 1.0
    d1 = new_map / new_map.mean() - 1.0
    cl0 = sht.anafast(d0, lmax=lmax)
    cl1 = sht.anafast(d1, lmax=lmax)
    good = cl0 > 0
    ratio = np.where(good, cl1 / np.where(good, cl0, 1.0), 1.0)

    ell = np.arange(lmax + 1)
    lo = (ell >= 2) & (ell <= 10)
    hi = (ell >= 120) & (ell <= lmax)
    # large scales preserved to a few percent
    assert np.abs(np.mean(ratio[lo]) - 1) < 0.05, ratio[lo]
    # small scales suppressed (gas pushed out of halo centers). At
    # NSIDE=64 the pixels are ~1 deg so the accessible ells only graze
    # the suppression regime (measured ~2% at ell 100-190); the strong
    # quantitative pins live in test_deltapk / test_s19_published_curves.
    hi_mean = np.mean(ratio[hi])
    assert hi_mean < 0.99, f"no high-ell suppression: {hi_mean}"
    assert hi_mean > 0.85, f"suppression implausibly strong: {hi_mean}"
    # mass conservation already asserted inside process()


@pytest.mark.slow
def test_deltacl_limber_vs_s19_fig2():
    """Quantitative Delta-Cl against the digitized S19 Fig. 2 suppression
    via the thin-shell Limber mapping (VERDICT r3 order #4).

    Derivation: for a single thin shell at comoving distance chi_bar with
    width dchi << chi_bar, Limber gives
        Cl = integral dchi W(chi)^2 P_2D((l + 1/2)/chi) / chi^2
           ~ P((l + 1/2)/chi_bar) / (chi_bar^2 dchi),
    so the SAME scale-dependent suppression factor S(k) multiplies the
    baryonified and DMO spectra at k = (l + 1/2)/chi_bar and
        Cl_b / Cl_dmo (ell) = S(k = (l + 1/2)/chi_bar).
    The banded DeltaP(k) golden (test_deltapk_golden.py) pins S(k) to the
    digitized Fig. 2 to +-0.07; this test pins the projected pipeline
    (paint -> Baryonification2D shell displace -> anafast) to the same
    curve through the Limber map.

    Fig-2 consistency: TNG cosmology, the Mc1e14 parameter set, halos
    Tinker08-sampled to the same 10^12.8 Msun completeness in a thin
    z in [0.10, 0.12] shell (volume-weighted z). Calibration run
    (2026-08, NSIDE=256, ~93k halos): ratio/Fig2 = 0.9671/0.9666 at
    k=0.7 h/Mpc, 0.9562/0.9415 at 1.0, 0.9511/0.9130 at 1.4 — residuals
    +0.0005/+0.015/+0.038, growing toward small scales with the NSIDE=256
    pixel smoothing (the ratio's residual window), all inside the +-0.07
    band the DeltaP(k) goldens themselves carry.
    """
    H_ = 0.6711
    CD_ = dict(Omega_m=0.3175, Omega_b=0.049, h=H_, sigma8=0.82,
               n_s=0.9649, w0=-1.0)
    COSMO_ = bcosmo.cosmology_from_dict(CD_)
    BPAR = dict(theta_ej=4, theta_co=0.1, M_c=1e14 / H_, mu_beta=0.4,
                eta=0.3, eta_delta=0.3, tau=-np.inf, tau_delta=0,
                A=0.09 / 2, M1=2.5e11 / H_, epsilon_h=0.015,
                a=0.3, n=2, epsilon=4, p=0.3, q=0.707, gamma=2, delta=7,
                proj_cutoff=205 / H_ / 2)

    from baryonforge_tpu.cosmo import core as _core
    from baryonforge_tpu.utils import halomodel as hm
    import jax.numpy as jnp

    rng = np.random.default_rng(31)
    z1, z2 = 0.10, 0.12
    a_of = lambda z: 1.0 / (1.0 + z)          # noqa: E731
    chi1 = float(np.asarray(
        _core.comoving_radial_distance(COSMO_, a_of(z1))).ravel()[0])
    chi2 = float(np.asarray(
        _core.comoving_radial_distance(COSMO_, a_of(z2))).ravel()[0])
    chi_bar = 0.5 * (chi1 + chi2)
    vol = 4.0 * np.pi / 3.0 * (chi2 ** 3 - chi1 ** 3)

    # Tinker08-complete sample above 10^12.8 Msun (the Fig-2 box mask)
    lgM = np.linspace(12.8, 15.3, 60)
    M_grid = 10 ** lgM
    dndlgM = np.asarray(hm.MassFuncTinker08()(
        COSMO_, jnp.asarray(M_grid), a_of(0.11)))
    counts = dndlgM * np.gradient(lgM) * vol
    ns = rng.poisson(counts)
    masses = np.repeat(M_grid, ns) * 10 ** rng.uniform(
        -0.02, 0.02, int(ns.sum()))
    n = masses.size
    assert 30000 < n < 200000, n       # ~93k at the 10^12.8 cut
    # volume-weighted z inside the shell
    u = rng.uniform(0, 1, n)
    chis = (chi1 ** 3 + u * (chi2 ** 3 - chi1 ** 3)) ** (1.0 / 3.0)
    zs = np.interp(chis, [chi1, chi_bar, chi2], [z1, 0.11, z2])
    cat = utils.HaloLightConeCatalog(
        ra=rng.uniform(0, 360, n),
        dec=np.degrees(np.arcsin(rng.uniform(-1, 1, n))),
        M=masses, z=zs, cosmo=CD_)

    nside = 256
    npix = 12 * nside * nside

    tab = utils.TabulatedProfile(Profiles.DarkMatter(**BPAR), COSMO_)
    tab.setup_interpolator(z_min=0.08, z_max=0.14, N_samples_z=3,
                           z_linear_sampling=True,
                           M_min=3e12, M_max=5e15, N_samples_Mass=12,
                           R_min=1e-3, R_max=60, N_samples_R=64,
                           verbose=False)
    zero_shell = utils.LightconeShell(map=np.zeros(npix), cosmo=CD_)
    mass_map = Runners.PaintProfilesShell(
        cat, zero_shell, epsilon_max=5, model=tab,
        include_pixel_size=True, halo_batch=256, verbose=False).process()
    # un-collapsed mass as a uniform background (Fig-2 box recipe)
    rho_m = float(_core.rho_x(COSMO_, 1.0, species="matter",
                              is_comoving=True))
    M_tot = rho_m * vol
    frac = mass_map.sum() / M_tot
    assert 0.25 < frac < 0.55, frac
    mass_map = mass_map + (M_tot - mass_map.sum()) / npix

    DMO = Profiles.DarkMatterOnly(**BPAR)
    DMB = Profiles.DarkMatterBaryon(**BPAR)
    model = Baryonification2D(DMO, DMB, COSMO_, epsilon_max=10)
    model.setup_interpolator(z_min=0.08, z_max=0.14, N_samples_z=3,
                             z_linear_sampling=True,
                             M_min=3e12, M_max=5e15, N_samples_Mass=12,
                             R_min=1e-3, R_max=60, N_samples_R=64,
                             verbose=False)
    shell = utils.LightconeShell(map=mass_map, cosmo=CD_)
    new_map = Runners.BaryonifyShell(cat, shell, epsilon_max=10,
                                     model=model, halo_batch=256,
                                     verbose=False).process()

    lmax = 3 * nside - 1
    d0 = mass_map / mass_map.mean() - 1.0
    d1 = new_map / new_map.mean() - 1.0
    cl0 = sht.anafast(d0, lmax=lmax)
    cl1 = sht.anafast(d1, lmax=lmax)
    ratio = cl1 / cl0
    ell = np.arange(lmax + 1)

    # digitized Fig. 2 Mc1e14 curve (k in h/Mpc)
    import csv
    import os
    path = os.path.join(os.path.dirname(__file__), "data",
                        "S19_Fig2_Scrapped.csv")
    with open(path) as f:
        header = [h.strip() for h in f.readline().split(",")[::2]]
        f.readline()
        rows = list(csv.reader(f))
    i = header.index("Mc1e14")
    x = np.array([float(r[2 * i]) for r in rows if r[2 * i]])
    y = np.array([float(r[2 * i + 1]) for r in rows if r[2 * i + 1]])
    o = np.argsort(x)
    fig2 = (x[o], y[o])

    # large scales: no suppression
    lo = (ell >= 2) & (ell <= 20)
    assert abs(np.mean(ratio[lo]) - 1) < 0.03

    # Limber-mapped band comparison at k where the map resolves the
    # suppression (k <= ~1.5 h/Mpc at NSIDE=256)
    for kh in (0.7, 1.0, 1.4):
        l_c = kh * H_ * chi_bar - 0.5
        band = (ell >= 0.85 * l_c) & (ell <= 1.15 * l_c)
        got = float(np.mean(ratio[band]))
        want = float(np.interp(kh, *fig2))
        print(f"deltaCl k={kh} h/Mpc ell~{l_c:.0f}: ours {got:.4f} "
              f"Fig2 {want:.4f} diff {got - want:+.4f}")
        assert abs(got - want) < 0.07, (
            f"DeltaCl at k={kh} h/Mpc (ell~{l_c:.0f}): ours {got:.3f} "
            f"vs Limber-mapped S19 Fig2 {want:.3f}")


@pytest.mark.slow
def test_deltacl_nside512():
    """Metric-scale Delta-Cl: NSIDE=512, lmax=768 via the bounded-memory
    blocked SHT (utils/sht.py). Calibration run (2026-08, lmax=1280):
    ratio 1.0000 at ell 2-10, 0.9966 at 20-100, 0.937 at 100-300,
    0.855 at 300-600, upturn beyond — the classic S19 Delta-Cl shape
    (reference examples/09)."""
    nside = 512
    npix = 12 * nside * nside
    rng = np.random.default_rng(13)
    n = 400
    cat = utils.HaloLightConeCatalog(
        ra=rng.uniform(0, 360, n),
        dec=np.degrees(np.arcsin(rng.uniform(-1, 1, n))),
        M=10 ** rng.uniform(14.0, 15.0, n),
        z=rng.uniform(0.08, 0.15, n), cosmo=COSMO_DICT)

    tab = utils.TabulatedProfile(
        Profiles.DarkMatterOnly(**bpar_S19, proj_cutoff=100), COSMO)
    tab.setup_interpolator(z_min=0.05, z_max=0.3, N_samples_z=3,
                           M_min=5e13, M_max=3e15, N_samples_Mass=8,
                           R_min=1e-3, R_max=60, N_samples_R=64,
                           verbose=False)
    zero_shell = utils.LightconeShell(map=np.zeros(npix),
                                      cosmo=COSMO_DICT)
    mass_map = Runners.PaintProfilesShell(
        cat, zero_shell, epsilon_max=10, model=tab,
        include_pixel_size=True, halo_batch=64, verbose=False).process()
    mass_map = mass_map + mass_map.mean()

    DMO = Profiles.DarkMatterOnly(**bpar_S19, proj_cutoff=100)
    DMB = Profiles.DarkMatterBaryon(**bpar_S19, proj_cutoff=100)
    model = Baryonification2D(DMO, DMB, COSMO, epsilon_max=20)
    model.setup_interpolator(z_min=0.05, z_max=0.3, N_samples_z=3,
                             M_min=5e13, M_max=3e15, N_samples_Mass=8,
                             R_min=1e-3, R_max=60, N_samples_R=64,
                             verbose=False)
    shell = utils.LightconeShell(map=mass_map, cosmo=COSMO_DICT)
    new_map = Runners.BaryonifyShell(cat, shell, epsilon_max=20,
                                     model=model, halo_batch=64,
                                     verbose=False).process()

    lmax = 768
    d0 = mass_map / mass_map.mean() - 1.0
    d1 = new_map / new_map.mean() - 1.0
    cl0 = sht.anafast(d0, lmax=lmax)
    cl1 = sht.anafast(d1, lmax=lmax)
    ratio = cl1 / cl0
    ell = np.arange(lmax + 1)

    def band(lo, hi):
        return float(np.mean(ratio[(ell >= lo) & (ell <= hi)]))

    assert abs(band(2, 10) - 1) < 0.02
    assert 0.90 < band(100, 300) < 0.96
    assert 0.80 < band(300, 600) < 0.90
    assert band(100, 300) > band(300, 600)   # deepening toward the dip
