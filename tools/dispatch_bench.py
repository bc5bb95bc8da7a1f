"""Measure per-dispatch overhead of the backend (RPC latency on axon).

A cached-jit call with tiny args is pure dispatch; timing N of them
back-to-back (no block_until_ready until the end) reveals whether
dispatch is async (total ~ 1 RTT) or blocking (total ~ N x RTT).

Usage: python tools/dispatch_bench.py [N]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20

    f = jax.jit(lambda x: x * 1.0000001 + 1.0)
    x = jnp.ones(1024, dtype=jnp.float32)
    x = f(x)                       # compile
    x.block_until_ready()

    # dispatch-only: issue N chained calls, sync once
    t0 = time.time()
    y = x
    for _ in range(n):
        y = f(y)
    t_issue = time.time() - t0
    y.block_until_ready()
    t_total = time.time() - t0
    print(f"chained  x{n}: issue {t_issue*1e3:8.1f} ms, "
          f"total {t_total*1e3:8.1f} ms "
          f"({t_total/n*1e3:.1f} ms/dispatch)")

    # independent dispatches (no data dependency)
    t0 = time.time()
    outs = [f(x) for _ in range(n)]
    t_issue = time.time() - t0
    for o in outs:
        o.block_until_ready()
    t_total = time.time() - t0
    print(f"indep    x{n}: issue {t_issue*1e3:8.1f} ms, "
          f"total {t_total*1e3:8.1f} ms "
          f"({t_total/n*1e3:.1f} ms/dispatch)")

    # tiny host->device transfer per call (fresh scalar arg)
    g = jax.jit(lambda x, s: x * s)
    _ = g(x, 1.5).block_until_ready()
    t0 = time.time()
    y = x
    for i in range(n):
        y = g(y, 1.0 + 1e-7 * i)
    y.block_until_ready()
    t_total = time.time() - t0
    print(f"scalararg x{n}: total {t_total*1e3:8.1f} ms "
          f"({t_total/n*1e3:.1f} ms/dispatch)")

    # small device->host download (sync) per call
    t0 = time.time()
    for _ in range(n):
        float(jnp.sum(x))
    t_total = time.time() - t0
    print(f"sync-download x{n}: total {t_total*1e3:8.1f} ms "
          f"({t_total/n*1e3:.1f} ms/roundtrip)")


if __name__ == "__main__":
    main()
