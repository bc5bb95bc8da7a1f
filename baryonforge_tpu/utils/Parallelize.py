"""API-parity alias: the reference exposes SimpleParallel/SplitJoinParallel
under utils.Parallelize; the implementations live in parallel/mesh.py
(device-mesh orchestration replaces joblib processes)."""

from ..parallel.mesh import SimpleParallel, SplitJoinParallel, halo_mesh

__all__ = ["SimpleParallel", "SplitJoinParallel", "halo_mesh"]
