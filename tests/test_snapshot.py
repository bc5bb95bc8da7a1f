"""BaryonifySnapshot: sharded == single-device equality, per-bucket
padding correctness vs the brute-force O(n_halos * n_part) displacement
sum (reference Runners/SnapshotRunner.py:176-275 semantics)."""

import numpy as np
import pytest

import jax

from baryonforge_tpu import Profiles, utils
from baryonforge_tpu.Profiles.BaryonCorrection import Baryonification3D
from baryonforge_tpu.Runners.SnapshotRunner import BaryonifySnapshot
from defaults import COSMO, COSMO_DICT, bpar_S19

RNG = np.random.default_rng(77)
L = 128.0


def _setup(n_part=4000, n_halos=30):
    snap = utils.ParticleSnapshot(x=RNG.uniform(0, L, n_part),
                                  y=RNG.uniform(0, L, n_part),
                                  z=RNG.uniform(0, L, n_part),
                                  M=np.ones(n_part), L=L,
                                  cosmo=COSMO_DICT, redshift=0.2)
    cat = utils.HaloNDCatalog(x=RNG.uniform(0, L, n_halos),
                              y=RNG.uniform(0, L, n_halos),
                              z=RNG.uniform(0, L, n_halos),
                              M=10 ** RNG.uniform(13.5, 15, n_halos),
                              redshift=0.2, cosmo=COSMO_DICT)
    DMO = Profiles.DarkMatter(**bpar_S19)
    DMB = Profiles.DarkMatter(**{**bpar_S19, "epsilon": 2.0})
    model = Baryonification3D(DMO, DMB, COSMO, epsilon_max=20)
    model.setup_interpolator(z_min=0.1, z_max=0.3, N_samples_z=2,
                             M_min=1e13, M_max=3e15, N_samples_Mass=5,
                             R_min=1e-3, R_max=50, N_samples_R=32,
                             verbose=False)
    return snap, cat, model


def test_snapshot_brute_force_parity():
    """The bucketed cell-list pipeline must reproduce a direct numpy
    accumulation of min-image displacements (f32 scatter tolerance)."""
    snap, cat, model = _setup(n_part=2500, n_halos=12)
    new_cat = BaryonifySnapshot(cat, snap, epsilon_max=20, model=model,
                                verbose=False).process()

    pos = np.stack([np.asarray(snap.cat[c], float) for c in "xyz"], 1)
    hpos = np.stack([np.asarray(cat.cat[c], float) for c in "xyz"], 1)
    M = np.asarray(cat.cat["M"], float)
    a = 1.0 / 1.2
    import jax.numpy as jnp
    R = np.asarray(model.mass_def.get_radius(
        COSMO, jnp.asarray(M), a))
    want = np.zeros_like(pos)
    for j in range(len(M)):
        dx = pos - hpos[j]
        dx = np.where(dx > L / 2, dx - L, dx)
        dx = np.where(dx < -L / 2, dx + L, dx)
        d = np.sqrt((dx ** 2).sum(1))
        sel = d < min(20 * R[j] / a, L / 2)
        off = np.asarray(model.displacement(
            jnp.asarray(d[sel]), M[j], a)).reshape(-1)
        want[sel] += (off[:, None] * dx[sel] / d[sel][:, None])
    got = np.stack([np.asarray(new_cat[c], float) for c in "xyz"], 1) - pos
    got = np.where(got > L / 2, got - L, got)
    got = np.where(got < -L / 2, got + L, got)
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)


@pytest.mark.skipif(len(jax.devices()) < 2,
                    reason="needs a multi-device mesh")
def test_snapshot_sharded_matches_single():
    from jax.sharding import Mesh
    snap, cat, model = _setup()
    single = BaryonifySnapshot(cat, snap, epsilon_max=20, model=model,
                               verbose=False).process()
    mesh = Mesh(np.array(jax.devices()), ("halos",))
    sharded = BaryonifySnapshot(cat, snap, epsilon_max=20, model=model,
                                mesh=mesh, verbose=False).process()
    for c in "xyz":
        # identical displacement sums up to f32 association
        dx = np.asarray(sharded[c]) - np.asarray(single[c])
        dx = np.where(dx > L / 2, dx - L, dx)
        dx = np.where(dx < -L / 2, dx + L, dx)
        np.testing.assert_allclose(dx, 0.0, atol=2e-5)
