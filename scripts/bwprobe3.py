"""Does scan unroll / loop structure change the per-iteration floor?

Hypothesis (from bwprobe2): this axon backend pays ~carry_bytes / 1GB/s
per XLA while-loop iteration.  If true, scan(unroll=k) divides it by k.
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

    R = 16
    rng = np.random.default_rng(0)
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {dev.device_kind}", flush=True)
    x0 = jnp.asarray(rng.random((1200, 1600), dtype=np.float32))

    def body(c):
        # roll defeats slice-propagation; cheap real work
        return jnp.roll(c, 1, axis=-1) + 1.0

    def bench(label, loop):
        jloop = jax.jit(loop)
        y = jloop(x0)
        np.asarray(jax.tree.leaves(y)[0]).ravel()[:1]
        ts = []
        for _ in range(3):
            t0 = time.time()
            y = jloop(x0)
            np.asarray(jax.tree.leaves(y)[0]).ravel()[:1]
            ts.append((time.time() - t0) / R)
        print(f"{label:28s} {min(ts)*1e6:9.1f} us/iter", flush=True)

    def scan_u(k):
        def loop(x):
            y, _ = jax.lax.scan(
                lambda c, _: (body(c), None), x, None, length=R, unroll=k
            )
            return y
        return loop

    bench("scan unroll=1", scan_u(1))
    bench("scan unroll=4", scan_u(4))
    bench("scan unroll=16 (=R, no loop)", scan_u(16))

    def fori(x):
        return jax.lax.fori_loop(0, R, lambda i, c: body(c), x)

    bench("fori_loop", fori)

    def py_unrolled(x):
        for _ in range(R):
            x = body(x)
        return x

    bench("python-unrolled (flat jit)", py_unrolled)
    return 0


if __name__ == "__main__":
    sys.exit(main())
