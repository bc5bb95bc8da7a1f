"""Test configuration: run everything on a virtual 8-device CPU mesh.

XLA flags must be set before jax initializes; the axon TPU plugin (if
present) force-sets jax_platforms at interpreter startup, so we override it
again through jax.config after import.

Wall-time note: the suite's cost is per-test XLA:CPU tracing/compiles
(the persistent cache below removes recompiles, not retraces). On a
multi-core CI runner ``-m "not slow"`` is the per-push lane; the
slow-marked physics guards run in the nightly lane
(.github/workflows/tests.yml). On a single-core dev box expect
~15-30 min for the not-slow lane.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# the axon remote-compiler reroutes even CPU XLA compiles through a slow
# RPC when these are set; stripping them halves suite wall time
os.environ.pop("PALLAS_AXON_REMOTE_COMPILE", None)
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: the suite's dominant cost is XLA:CPU compiles
# of near-identical kernels re-traced per test (new closures per runner).
# Keyed by HLO, so repeats across tests AND across pytest runs hit.
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import baryonforge_tpu  # noqa: E402  (enables x64)

assert jax.devices()[0].platform == "cpu"
