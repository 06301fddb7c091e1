"""Raw device bandwidth/FLOPs probe vs array size (axon TPU investigation).

Times y = x + 1 (2 arrays of traffic) and x @ m in-scan at various sizes.
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

    R = 20
    rng = np.random.default_rng(0)
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {dev.device_kind}", flush=True)

    def bench_add(n_mb):
        n = int(n_mb * 1024 * 1024 // 4)
        x = jnp.asarray(rng.random(n, dtype=np.float32))

        @jax.jit
        def loop(x):
            def body(c, _):
                return c + 1.0, None
            y, _ = jax.lax.scan(body, x, None, length=R)
            return y

        np.asarray(loop(x)).ravel()[:1]
        ts = []
        for _ in range(3):
            t0 = time.time()
            np.asarray(loop(x)).ravel()[:1]
            ts.append((time.time() - t0) / R)
        dt = min(ts)
        bw = 2 * n * 4 / dt / 1e9
        print(f"add {n_mb:7.1f} MB: {dt*1e6:9.1f} us  -> {bw:7.1f} GB/s", flush=True)

    for mb in [0.25, 1, 2, 4, 7.7, 16, 64]:
        bench_add(mb)

    def bench_mm(m, k, n):
        a = jnp.asarray(rng.random((m, k), dtype=np.float32))
        b = jnp.asarray(rng.random((k, n), dtype=np.float32))

        @jax.jit
        def loop(a):
            def body(c, _):
                return (c @ b) * (1.0 / n) , None
            y, _ = jax.lax.scan(body, a, None, length=R)
            return y

        np.asarray(loop(a)).ravel()[:1]
        ts = []
        for _ in range(3):
            t0 = time.time()
            np.asarray(loop(a)).ravel()[:1]
            ts.append((time.time() - t0) / R)
        dt = min(ts)
        fl = 2 * m * k * n / dt / 1e12
        print(f"mm {m}x{k}x{n}: {dt*1e6:9.1f} us -> {fl:6.2f} Tflop/s (f32 HIGHEST-equivalent? default prec)", flush=True)

    bench_mm(1024, 1024, 1024)
    bench_mm(1200, 1600, 1600)
    return 0


if __name__ == "__main__":
    sys.exit(main())
