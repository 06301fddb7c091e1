"""Dispatch floor + true per-op slope today.

(1) tiny scalar jit round trip, (2) chained matmuls K=1/50/400 (slope =
true matmul cost, intercept = dispatch+fence overhead), (3) same for
elementwise 7.7MB, (4) scan iteration slope at fixed dispatch count.
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {dev.device_kind}", flush=True)

    # 1. dispatch floor
    @jax.jit
    def tiny(x):
        return x + 1.0

    z = jnp.float32(0.0)
    np.asarray(tiny(z))
    ts = []
    for _ in range(20):
        t0 = time.time()
        np.asarray(tiny(z))
        ts.append(time.time() - t0)
    print(f"scalar dispatch+fence: min {min(ts)*1e3:.2f} ms med {sorted(ts)[10]*1e3:.2f} ms", flush=True)

    # 2. matmul chain slope
    n = 512
    a = jnp.asarray(rng.random((n, n), dtype=np.float32))
    b = jnp.asarray(rng.random((n, n), dtype=np.float32) * 0.001)

    res = {}
    for K in (1, 50, 400):
        @jax.jit
        def chain(a, K=K):
            for i in range(K):
                a = a @ b + 1e-6 * i
            return a

        np.asarray(chain(a)).ravel()[:1]
        ts = []
        for _ in range(5):
            t0 = time.time()
            np.asarray(chain(a)).ravel()[:1]
            ts.append(time.time() - t0)
        res[K] = min(ts)
        print(f"matmul chain K={K}: {min(ts)*1e3:.1f} ms", flush=True)
    slope = (res[400] - res[50]) / 350
    print(f"  -> per 512^3 matmul: {slope*1e6:.1f} us = {2*n**3/slope/1e12:.2f} Tf/s", flush=True)

    # 3. elementwise chain slope at 7.7 MB (roll defeats fusion collapse)
    x = jnp.asarray(rng.random((1200, 1600), dtype=np.float32))
    res = {}
    for K in (1, 16, 64):
        @jax.jit
        def chain(x, K=K):
            for i in range(K):
                x = jnp.roll(x, 1, axis=-1) + 1e-6
            return x

        np.asarray(chain(x)).ravel()[:1]
        ts = []
        for _ in range(5):
            t0 = time.time()
            np.asarray(chain(x)).ravel()[:1]
            ts.append(time.time() - t0)
        res[K] = min(ts)
        print(f"roll7.7MB chain K={K}: {min(ts)*1e3:.1f} ms", flush=True)
    slope = (res[64] - res[16]) / 48
    print(f"  -> per roll+add: {slope*1e6:.1f} us = {2*x.size*4/slope/1e9:.1f} GB/s", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
