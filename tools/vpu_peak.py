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

    CHAIN = 128          # fmas chained per element per loop step
    ITERS = 100
    N = (2048, 2048)     # 16 MB f32 block

    # distinct multipliers so XLA cannot fold the chain; values chosen
    # to keep x bounded (a ~ 1-eps, b small)
    a = np.float32(0.999993)
    bs = np.linspace(1e-6, 2e-6, CHAIN, dtype=np.float32)

    @jax.jit
    def burn(x):
        def body(_, x):
            for b in bs:           # unrolled CHAIN-deep fma chain
                x = x * a + b
            return x
        return jax.lax.fori_loop(0, ITERS, body, x)

    x = jnp.asarray(np.random.default_rng(0).random(N, dtype=np.float32))
    burn(x).block_until_ready()                    # compile
    n_rep = 3
    t0 = time.time()
    for _ in range(n_rep):
        x = burn(x)
    x.block_until_ready()
    dt = (time.time() - t0) / n_rep
    fmas = N[0] * N[1] * CHAIN * ITERS
    print(json.dumps({
        "backend": jax.default_backend(),
        "block": list(N), "chain": CHAIN, "iters": ITERS,
        "time_s": round(dt, 4),
        "fma_per_s": float(f"{fmas / dt:.4g}"),
        "gfma_per_s": round(fmas / dt / 1e9, 1),
    }))


if __name__ == "__main__":
    main()
