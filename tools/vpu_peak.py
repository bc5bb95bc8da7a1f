"""Measure the chip's attainable f32 VPU fma throughput (roofline peak).

The tile deposit kernel (ops/tiles.make_tile_deposit) is pure
elementwise VPU math — no MXU — so its roofline ceiling is the f32
fma issue rate, not the matmul TFLOPs headline. This microbenchmark
measures that ceiling the same way the kernel consumes it: a long
in-register fma chain over a VMEM-resident block, deep enough
(CHAIN fmas per element per loop iteration) that HBM traffic is
negligible (CHAIN/8 B/elem ~ 16 fma/B >> the ~5 fma/B breakeven of
v5e's 819 GB/s vs ~4 Tops/s VPU).

Prints one JSON line: {"fma_per_s": ..., "gops": ...}.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    CHAIN = 128          # fma+abs stages per element per loop step
    ITERS = 100
    N = (2048, 2048)     # 16 MB f32 block

    # abs between fmas: composition of affine maps is affine (XLA folds
    # a pure fma chain to ONE fma — measured 857 "PFLOP/s"); abs-affine
    # does not fold, and abs/max/fma is the tile kernel's actual hat-
    # sweep op mix, so this measures the ceiling the kernel can reach.
    a = np.float32(-0.999993)            # sign flip keeps abs non-trivial
    bs = np.linspace(1e-6, 2e-6, CHAIN, dtype=np.float32)

    @jax.jit
    def burn(x):
        def body(_, x):
            for b in bs:           # unrolled CHAIN-deep abs-fma chain
                x = jnp.abs(x * a + b)
            return x
        return jax.lax.fori_loop(0, ITERS, body, x)

    # block_until_ready is NOT a reliable barrier for chained dispatches
    # on remote-executor backends (measured: 10 chained reps "block" in
    # 0.3 ms). Ground truth: time K chained reps ENDING IN a jitted
    # scalar reduction whose value is fetched to host, for K=0 vs K,
    # and difference out the fetch.
    ssum = jax.jit(lambda y: y.sum())
    x = jnp.asarray(np.random.default_rng(0).random(N, dtype=np.float32))
    y = burn(x)
    float(ssum(y))                                 # compile + warm fetch
    t0 = time.time()
    float(ssum(y))
    t_fetch = time.time() - t0
    K = 10
    t0 = time.time()
    y2 = y
    for _ in range(K):
        y2 = burn(y2)
    float(ssum(y2))
    dt = (time.time() - t0 - t_fetch) / K
    stages = N[0] * N[1] * CHAIN * ITERS           # 1 fma + 1 abs each
    print(json.dumps({
        "backend": jax.default_backend(),
        "block": list(N), "chain": CHAIN, "iters": ITERS,
        "time_per_rep_s": round(dt, 4),
        "fma_per_s": float(f"{stages / dt:.4g}"),
        "vpu_ops_per_s": float(f"{2 * stages / dt:.4g}"),
        "gfma_per_s": round(stages / dt / 1e9, 1),
    }))


if __name__ == "__main__":
    main()
