import os, time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import baryonforge_tpu
from baryonforge_tpu import Profiles, utils
from baryonforge_tpu.Runners.SnapshotRunner import BaryonifySnapshot
from baryonforge_tpu import cosmo as bcosmo
from baryonforge_tpu.Profiles.BaryonCorrection import Baryonification3D
h=0.7
cosmo_dict = dict(Omega_m=0.30, Omega_b=0.045, h=h, sigma8=0.8, n_s=0.96, w0=-1.0)
cosmo = bcosmo.cosmology_from_dict(cosmo_dict)
bpar = dict(theta_ej=4, theta_co=0.1, M_c=1e14/h, mu_beta=0.4, eta=0.3,
            eta_delta=0.3, tau=-1.5, tau_delta=0, A=0.09/2, M1=2.5e11/h,
            epsilon_h=0.015, a=0.3, n=2, epsilon=4, p=0.3, q=0.707, gamma=2, delta=7)
model = Baryonification3D(Profiles.DarkMatterOnly(**bpar), Profiles.DarkMatterBaryon(**bpar), cosmo, epsilon_max=5)
model.load_table("/tmp/bfg_t3.npz")
L = 256.0
n_halos = 7088
n_part = 2_000_000
rng = np.random.default_rng(1)
snap = utils.ParticleSnapshot(x=rng.uniform(0,L,n_part), y=rng.uniform(0,L,n_part),
                              z=rng.uniform(0,L,n_part), M=np.ones(n_part), L=L,
                              cosmo=cosmo_dict, redshift=0.1)
cat = utils.HaloNDCatalog(x=rng.uniform(0,L,n_halos), y=rng.uniform(0,L,n_halos),
                          z=rng.uniform(0,L,n_halos), M=10**rng.uniform(13.0,14.8,n_halos),
                          redshift=0.1, cosmo=cosmo_dict)
runner = BaryonifySnapshot(cat, snap, epsilon_max=5, model=model)
t0=time.time(); out = runner.process(); print("warmup", time.time()-t0, flush=True)
best=1e9
for _ in range(2):
    t0=time.time(); out = runner.process(); best=min(best,time.time()-t0)
print(f"steady {best:.2f}s -> {n_halos/best:.0f} halos/s (2M particles; reference snapshot ~70-190/s)", flush=True)
