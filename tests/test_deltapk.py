"""Physics validation: baryonification suppresses P(k) at intermediate
scales (the headline Schneider+19 / Arico+20 result; reference examples
10/12 reproduce published Delta P(k) curves).

We paint DMO halos onto a 3D grid, baryonify the grid, and check the P(k)
ratio: ~1 at the largest scales, suppressed at k ~ 1-10 / Mpc.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from baryonforge_tpu import Profiles, utils
from baryonforge_tpu.Runners.Map2DRunner import (BaryonifyGrid,
                                                 PaintProfilesGrid)
from baryonforge_tpu.Profiles.BaryonCorrection import Baryonification3D
from defaults import COSMO, COSMO_DICT, bpar_S19

RNG = np.random.default_rng(77)


def _pk_3d(field, L):
    """Isotropic power spectrum of a cubic field (box size L)."""
    N = field.shape[0]
    delta = field / field.mean() - 1.0
    fk = np.fft.rfftn(delta) * (L / N) ** 3
    pk3 = np.abs(fk) ** 2 / L ** 3
    kf = 2 * np.pi / L
    kx = np.fft.fftfreq(N, 1.0 / N) * kf
    kz = np.fft.rfftfreq(N, 1.0 / N) * kf
    kk = np.sqrt(kx[:, None, None] ** 2 + kx[None, :, None] ** 2
                 + kz[None, None, :] ** 2)
    bins = np.arange(0.5, N // 2) * kf
    which = np.digitize(kk.ravel(), bins)
    counts = np.bincount(which, minlength=bins.size + 1)
    sums = np.bincount(which, weights=pk3.ravel(), minlength=bins.size + 1)
    centers = np.concatenate([[0], bins]) + kf / 2
    good = counts > 0
    return centers[good], (sums / np.maximum(counts, 1))[good]


@pytest.mark.slow
def test_baryonification_suppresses_pk():
    N, L = 64, 128.0
    n_halos = 60
    bins = (np.arange(N) + 0.5) * (L / N)

    cat = utils.HaloNDCatalog(x=RNG.uniform(0, L, n_halos),
                              y=RNG.uniform(0, L, n_halos),
                              z=RNG.uniform(0, L, n_halos),
                              M=10 ** RNG.uniform(13.5, 14.5, n_halos),
                              redshift=0.2, cosmo=COSMO_DICT)

    # paint the DMO mass field
    dmo_tab = utils.TabulatedProfile(Profiles.DarkMatter(**bpar_S19), COSMO)
    dmo_tab.setup_interpolator(z_min=0.1, z_max=0.3, N_samples_z=2,
                               M_min=1e13, M_max=1e15, N_samples_Mass=8,
                               R_min=1e-3, R_max=60, N_samples_R=64,
                               verbose=False)
    gm0 = utils.GriddedMap(map=np.zeros((N, N, N)), bins=bins,
                           cosmo=COSMO_DICT, redshift=0.2)
    mass_map = PaintProfilesGrid(cat, gm0, epsilon_max=10, model=dmo_tab,
                                 include_pixel_size=True,
                                 halo_batch=8).process()
    mass_map = mass_map + mass_map.mean()        # add a uniform background

    # baryonify
    DMO = Profiles.DarkMatterOnly(**bpar_S19)
    DMB = Profiles.DarkMatterBaryon(**bpar_S19)
    model = Baryonification3D(DMO, DMB, COSMO, epsilon_max=20)
    model.setup_interpolator(z_min=0.1, z_max=0.3, N_samples_z=2,
                             M_min=1e13, M_max=1e15, N_samples_Mass=8,
                             R_min=1e-3, R_max=50, N_samples_R=64,
                             verbose=False)
    gm = utils.GriddedMap(map=mass_map, bins=bins, cosmo=COSMO_DICT,
                          redshift=0.2)
    new_map = BaryonifyGrid(cat, gm, epsilon_max=20, model=model,
                            halo_batch=8).process()

    k0, pk0 = _pk_3d(mass_map, L)
    k1, pk1 = _pk_3d(new_map, L)
    ratio = pk1 / pk0

    # Quantitative band informed by the S19 Fig2 suppression curves
    # (tests/data/S19_Fig2_Scrapped.csv: ~0.78-0.88 at k ~ 10-20 h/Mpc)
    # scaled to this synthetic setup, where ~50% of the mass sits in
    # halos by construction: measured suppression reaches 8-9% by
    # k ~ 1 /Mpc. A >=20% normalization or displacement bug moves the
    # curve far outside these bounds.
    assert abs(ratio[1] - 1) < 0.02, "large scales must be preserved"
    mid = (k0 > 0.9) & (k0 < 1.5)
    mid_mean = ratio[mid].mean()
    assert 0.85 < mid_mean < 0.96, (
        f"suppression at k~1/Mpc out of band: {mid_mean:.4f}")
    # suppression grows monotonically (smoothed) from large scales
    lo_mean = ratio[(k0 > 0.1) & (k0 < 0.3)].mean()
    assert lo_mean > mid_mean
    # skip bin 0: DC mode is roundoff after mean removal
    assert ratio[1:].min() > 0.5
