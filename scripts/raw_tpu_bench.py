"""Raw device capability probe: MXU TFLOPs (f32/bf16), HBM bandwidth,
KCC-shaped batched matmuls, gathers, and dispatch overhead."""
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    print(jax.devices(), flush=True)
    R = 30

    def bench(label, f, *xs):
        @jax.jit
        def loop(*xs):
            def body(c, _):
                return f(*c), None
            y, _ = jax.lax.scan(body, xs, None, length=R)
            return y

        xs = [jax.block_until_ready(jnp.asarray(x)) for x in xs]
        t0 = time.time()
        y = loop(*xs)
        np.asarray(jax.tree.leaves(y)[0]).ravel()[:1]
        tc = time.time() - t0
        t0 = time.time()
        y = loop(*xs)
        np.asarray(jax.tree.leaves(y)[0]).ravel()[:1]
        dt = (time.time() - t0) / R
        print(f"{label:45s} {dt*1e6:9.1f} us  compile {tc:.1f}s", flush=True)
        return dt

    rng = np.random.default_rng(0)
    n = 2048
    a = rng.standard_normal((n, n)).astype(np.float32)
    b = rng.standard_normal((n, n)).astype(np.float32)
    dt = bench("matmul f32 default 2048^3", lambda a, b: (a @ b * 1e-3, b), a, b)
    print("  -> TFLOPs", 2 * n**3 / dt / 1e12, flush=True)
    hi = jax.lax.Precision.HIGHEST
    dt = bench(
        "matmul f32 HIGHEST 2048^3",
        lambda a, b: (jnp.matmul(a, b, precision=hi) * 1e-3, b), a, b)
    print("  -> TFLOPs", 2 * n**3 / dt / 1e12, flush=True)
    ab = a.astype(jnp.bfloat16)
    bb = b.astype(jnp.bfloat16)
    dt = bench("matmul bf16 2048^3", lambda a, b: (a @ b * 1e-3, b), ab, bb)
    print("  -> TFLOPs", 2 * n**3 / dt / 1e12, flush=True)

    x = rng.standard_normal((64, 1024, 1024)).astype(np.float32)
    dt = bench("elementwise 256MB", lambda x: (x * 1.0001 + 1.0,), x)
    print("  -> GB/s (r+w)", 2 * x.nbytes / dt / 1e9, flush=True)

    # KCC-shaped: (8,480,640)@(640,321) then (8,480,321)@(321,640), f32 def
    a = rng.standard_normal((8, 480, 640)).astype(np.float32)
    m1 = rng.standard_normal((640, 321)).astype(np.float32)
    m2 = rng.standard_normal((321, 640)).astype(np.float32)

    def f(a, m1, m2):
        t = jnp.einsum("bij,jk->bik", a, m1)
        return jnp.einsum("bik,kj->bij", t, m2) * 1e-3, m1, m2

    dt = bench("kcc mm pair 8x480x640 f32 default", f, a, m1, m2)
    fl = 2 * 8 * 480 * 640 * 321 * 2
    print("  -> TFLOPs", fl / dt / 1e12, flush=True)

    def fh(a, m1, m2):
        t = jnp.einsum("bij,jk->bik", a, m1, precision=hi)
        return jnp.einsum("bik,kj->bij", t, m2, precision=hi) * 1e-3, m1, m2

    dt = bench("kcc mm pair 8x480x640 f32 HIGHEST", fh, a, m1, m2)
    print("  -> TFLOPs", fl / dt / 1e12, flush=True)

    # single-image variant (lookahead=1 shape)
    a1 = rng.standard_normal((1, 480, 640)).astype(np.float32)
    dt = bench("kcc mm pair 1x480x640 f32 default", f, a1, m1, m2)
    print("  -> TFLOPs", fl / 8 / dt / 1e12, flush=True)

    # dispatch overhead
    @jax.jit
    def triv(x):
        return x + 1.0

    xx = jax.block_until_ready(jnp.zeros(8, jnp.float32))
    np.asarray(triv(xx))
    t0 = time.time()
    for _ in range(100):
        xx = triv(xx)
    np.asarray(xx)
    print(f"dispatch+readback amortized: {(time.time()-t0)/100*1e6:.1f} us/call",
          flush=True)

    t0 = time.time()
    for _ in range(20):
        xx = triv(xx)
        np.asarray(xx)
    print(f"dispatch w/ sync each: {(time.time()-t0)/20*1e6:.1f} us/call",
          flush=True)


if __name__ == "__main__":
    main()
