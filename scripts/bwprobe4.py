"""Is compute fast when the working set is small?  MXU flop probe with
a VMEM-sized working set (chained small matmuls) vs big-array streaming.
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

    # chained small matmuls: 3 MB working set, K x 0.27 GFLOP
    n, K = 512, 100
    a = jnp.asarray(rng.random((n, n), dtype=np.float32))
    b = jnp.asarray(rng.random((n, n), dtype=np.float32) * 0.001)

    @jax.jit
    def chain(a):
        for i in range(K):
            a = a @ b + 1e-6 * i
        return a

    np.asarray(chain(a)).ravel()[:1]
    ts = []
    for _ in range(3):
        t0 = time.time()
        np.asarray(chain(a)).ravel()[:1]
        ts.append(time.time() - t0)
    dt = min(ts)
    print(f"chained {K}x {n}^3 f32 matmul: {dt*1e3:.1f} ms -> {2*K*n**3/dt/1e12:.2f} Tf/s", flush=True)

    # same chain in bf16
    ab = a.astype(jnp.bfloat16)
    bb = b.astype(jnp.bfloat16)

    @jax.jit
    def chainb(a):
        for i in range(K):
            a = (a @ bb).astype(jnp.bfloat16)
        return a

    np.asarray(chainb(ab).astype(jnp.float32)).ravel()[:1]
    ts = []
    for _ in range(3):
        t0 = time.time()
        np.asarray(chainb(ab).astype(jnp.float32)).ravel()[:1]
        ts.append(time.time() - t0)
    dt = min(ts)
    print(f"chained {K}x {n}^3 bf16 matmul: {dt*1e3:.1f} ms -> {2*K*n**3/dt/1e12:.2f} Tf/s", flush=True)

    # chained elementwise on small (1 MB) vs big (7.7 MB) working set
    for shape, label in [((512, 512), "1MB"), ((1200, 1600), "7.7MB")]:
        x = jnp.asarray(rng.random(shape, dtype=np.float32))

        @jax.jit
        def ch(x):
            for i in range(100):
                x = x * (1.0 + 1e-8 * i) + 1e-7
            return x

        np.asarray(ch(x)).ravel()[:1]
        ts = []
        for _ in range(3):
            t0 = time.time()
            np.asarray(ch(x)).ravel()[:1]
            ts.append(time.time() - t0)
        dt = min(ts)
        nb = x.size * 4
        print(f"chained 100x elementwise {label}: {dt*1e3:.1f} ms "
              f"(if fused: {2*nb/dt/1e9:.1f} GB/s; if unfused: {200*nb/dt/1e9:.1f} GB/s)",
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
