"""baryonforge_tpu — a TPU-native baryonification framework.

A ground-up JAX/XLA/Pallas re-design with the capabilities of BaryonForge
(github.com/DhayaaAnbajagane/BaryonForge): baryonify N-body products (HEALPix
lightcone shells, 2D/3D grids, particle snapshots) against halo catalogs, and
paint thermodynamic fields from halo profiles — with the physics evaluated as
batched, jit-compiled array programs and the per-halo scatter loops replaced
by fixed-shape gather/scatter kernels sharded over a TPU device mesh.

Layer map (mirrors SURVEY.md):
  cosmo/        L0  in-repo cosmology core (replaces pyccl)
  ops/          numerics + HEALPix geometry + scatter kernels
  profiles/     L1  halo profile models (Schneider19/25, Arico20, Mead20, ...)
  baryonification  L2  displacement model
  utils/        L3  tables, pixel windows, caching, IO
  runners/      L4  shell / grid / snapshot execution engines
  parallel/     L5  device-mesh orchestration
"""

import os

# The physics spans ~30 decades in density and the displacement function is a
# difference of nearly-equal inverse masses; the reference runs float64
# end-to-end. We enable x64 at import (opt out with BFG_TPU_NO_X64=1); hot
# map-scatter paths downcast to float32 explicitly where it is safe.
if not os.environ.get("BFG_TPU_NO_X64"):
    import jax
    jax.config.update("jax_enable_x64", True)

# Honor the user's JAX_PLATFORMS: some accelerator plugins force-select
# their platform at interpreter startup, silently overriding the env var
# (a CPU-pinned run then lands on the accelerator). Re-assert the user's
# explicit choice while jax is still uninitialized.
_env_plat = os.environ.get("JAX_PLATFORMS")
if _env_plat:
    import jax
    try:
        if (jax.config.jax_platforms or "") != _env_plat:
            jax.config.update("jax_platforms", _env_plat)
    except Exception:          # backends already initialized: too late
        pass
del _env_plat

# Persistent compilation cache: table-build and runner kernels compile in
# 20-120 s (remote compiler on the axon backend; tens of seconds on
# XLA:CPU) but are stable across processes — cache them once per machine.
# Opt out with BFG_TPU_NO_COMPILE_CACHE=1 or point BFG_TPU_COMPILE_CACHE
# somewhere else (default: $XDG_CACHE_HOME/baryonforge_tpu/jax).
if not os.environ.get("BFG_TPU_NO_COMPILE_CACHE"):
    import jax
    _cache = os.environ.get(
        "BFG_TPU_COMPILE_CACHE",
        os.path.join(os.environ.get("XDG_CACHE_HOME",
                                    os.path.expanduser("~/.cache")),
                     "baryonforge_tpu", "jax"))
    try:
        # respect an app-level choice (bench.py / conftest point the
        # cache at the repo's .jax_cache before importing the package)
        if getattr(jax.config, "jax_compilation_cache_dir", None) is None:
            jax.config.update("jax_compilation_cache_dir", _cache)
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:          # older jax without the knobs
        pass

from . import cosmo
from . import ops
from . import utils
from . import Profiles
from . import Runners
from . import parallel
from .utils.io import (HaloLightConeCatalog, HaloNDCatalog, LightconeShell,
                       GriddedMap, ParticleSnapshot)
# star-exported public surface, mirroring the reference package root
# (BaryonForge/__init__.py:1-5)
from .Profiles import *       # noqa: F401,F403
from .Runners import *        # noqa: F401,F403

__version__ = "0.1.0"
