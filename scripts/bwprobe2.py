"""Separate per-scan-iteration overhead from true compute bandwidth.

Body = K chained (c + eps) adds over an N-MB carry; time/iteration vs K
gives: intercept = per-iteration floor, slope = true per-add cost.
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

    R = 10
    rng = np.random.default_rng(0)
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {dev.device_kind}", flush=True)

    def bench(n_mb, k):
        n = int(n_mb * 1024 * 1024 // 4)
        x = jnp.asarray(rng.random(n, dtype=np.float32))

        @jax.jit
        def loop(x):
            def body(c, _):
                for i in range(k):
                    c = c + (1.0 + i * 1e-7)  # distinct consts: no CSE
                return c, None
            y, _ = jax.lax.scan(body, x, None, length=R)
            return y

        np.asarray(loop(x)).ravel()[:1]
        ts = []
        for _ in range(3):
            t0 = time.time()
            np.asarray(loop(x)).ravel()[:1]
            ts.append((time.time() - t0) / R)
        dt = min(ts)
        per_add = dt / k
        bw = 2 * n * 4 / per_add / 1e9
        print(
            f"{n_mb:5.1f} MB x{k:3d} adds: {dt*1e6:9.1f} us/iter "
            f"({per_add*1e6:8.1f} us/add -> {bw:8.1f} GB/s)",
            flush=True,
        )

    for k in [1, 4, 16, 64]:
        bench(7.7, k)
    for k in [1, 16]:
        bench(1.0, k)
    return 0


if __name__ == "__main__":
    sys.exit(main())
