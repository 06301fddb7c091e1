"""Per-primitive TPU microbenchmarks for the KCC hot path.

Attributes per-frame time (VERDICT r1 task 1): XLA-FFT vs matmul-DFT
transforms at the real problem sizes, rotation resamplers, peak stats,
and the LM pose-graph solve.  Each op is timed inside a ``lax.scan`` of
REPS chained applications (single dispatch — honest on tunneled
backends), with a d2h readback as the fence.

Usage: python scripts/microbench_tpu.py [--reps N]
"""
from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=50)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"device: {dev.platform} {dev.device_kind}", flush=True)
    R = args.reps

    def bench(label, make_fn, x):
        """make_fn() -> f(x)->x-like; times R chained applications."""
        f = make_fn()

        @jax.jit
        def loop(x):
            def body(c, _):
                return f(c), None
            y, _ = jax.lax.scan(body, x, None, length=R)
            return y

        x = jax.block_until_ready(jnp.asarray(x))
        t0 = time.time()
        y = loop(x)
        np.asarray(jax.tree.leaves(y)[0]).ravel()[:1]
        t_compile = time.time() - t0
        t0 = time.time()
        y = loop(x)
        np.asarray(jax.tree.leaves(y)[0]).ravel()[:1]
        dt = time.time() - t0
        print(f"{label:55s} {dt / R * 1e6:9.1f} us/op  (compile {t_compile:.1f}s)",
              flush=True)
        return dt / R

    rng = np.random.default_rng(0)

    # ---- FFT roundtrips (rfft2+irfft2 per pair; report half for one xform)
    for (h, w) in [(256, 256), (360, 240), (480, 640), (720, 480)]:
        for b in (1, 8):
            x = rng.standard_normal((b, h, w)).astype(np.float32)

            def mk(h=h, w=w):
                def f(x):
                    return jnp.fft.irfft2(jnp.fft.rfft2(x) * 1.000001, s=(h, w))
                return f

            bench(f"xla rfft2+irfft2 {b}x{h}x{w}", mk, x)

    # ---- matmul-DFT roundtrips at the same sizes
    def dft_mats(n):
        k = np.arange(n)
        m = np.exp(-2j * np.pi * np.outer(k, k) / n)
        return m

    for (h, w) in [(256, 256), (360, 240), (480, 640), (720, 480)]:
        w2 = w // 2 + 1
        fw = dft_mats(w)[:, :w2]  # (W, W2) forward, cols truncated
        fh = dft_mats(h)  # (H, H)
        # inverse: full-W reconstruction from half spectrum then inverse mats
        iw_full = np.conj(dft_mats(w)) / w  # (W, W)
        # conj-symmetric cols j in [1, ceil(w/2)) fold back with weight 2
        dbl = np.ones(w2)
        dbl[1: (w + 1) // 2] = 2.0
        ih = np.conj(dft_mats(h)) / h
        fw_re = jnp.asarray(fw.real, jnp.float32)
        fw_im = jnp.asarray(fw.imag, jnp.float32)
        fh_re = jnp.asarray(fh.real, jnp.float32)
        fh_im = jnp.asarray(fh.imag, jnp.float32)
        ih_re = jnp.asarray(ih.real, jnp.float32)
        ih_im = jnp.asarray(ih.imag, jnp.float32)
        iw_re = jnp.asarray((iw_full[:, :w2] * dbl).real.T, jnp.float32)  # (W2, W)
        iw_im = jnp.asarray((iw_full[:, :w2] * dbl).imag.T, jnp.float32)

        for b in (1, 8):
            x = rng.standard_normal((b, h, w)).astype(np.float32)

            def mk(h=h, w=w, fw_re=fw_re, fw_im=fw_im, fh_re=fh_re, fh_im=fh_im,
                   ih_re=ih_re, ih_im=ih_im, iw_re=iw_re, iw_im=iw_im):
                def f(x):
                    # forward: rows then cols
                    tr = x @ fw_re
                    ti = x @ fw_im
                    rr = jnp.einsum("ij,bjk->bik", fh_re, tr) - jnp.einsum(
                        "ij,bjk->bik", fh_im, ti)
                    ri = jnp.einsum("ij,bjk->bik", fh_re, ti) + jnp.einsum(
                        "ij,bjk->bik", fh_im, tr)
                    rr = rr * 1.000001
                    # inverse: undo rows (H), then half->full cols with fold
                    ur = jnp.einsum("ij,bjk->bik", ih_re, rr) - jnp.einsum(
                        "ij,bjk->bik", ih_im, ri)
                    ui = jnp.einsum("ij,bjk->bik", ih_re, ri) + jnp.einsum(
                        "ij,bjk->bik", ih_im, rr)
                    y = ur @ iw_re - ui @ iw_im
                    return y
                return f

            bench(f"mm  dft2+idft2   {b}x{h}x{w}", mk, x)

    # ---- rotation resamplers at 480x640
    import sys as _s, os as _o; _s.path.insert(0, _o.path.dirname(_o.path.dirname(_o.path.abspath(__file__))))
    from nislam_tpu.ops.warp import rotate_wrap, rotate_wrap_fft

    x = rng.standard_normal((1, 480, 640)).astype(np.float32)
    bench("rotate_wrap_fft 1x480x640", lambda: (lambda im: rotate_wrap_fft(im, im[..., 0, 0])), x)
    bench("rotate_wrap(gather) 1x480x640", lambda: (lambda im: rotate_wrap(im, im[..., 0, 0])), x)

    # ---- polar warp gather 720x480 from 480x640
    from nislam_tpu.ops.warp import polar_grid, warp_polar

    px, py = polar_grid(480, 640, 720, 480)
    px = jnp.asarray(px)
    py = jnp.asarray(py)
    x = rng.standard_normal((1, 480, 640)).astype(np.float32)

    def mk_polar():
        def f(im):
            p = warp_polar(im, px, py)  # (1, 720, 480)
            # fold back to input shape so scan chains: pad/crop
            return im + p[:, :480, :480].mean() * 0
        return f

    bench("warp_polar 480x640->720x480 (+chain hack)", mk_polar, x)

    # ---- peak stats (fused argmax/PSR) at 480x640
    from nislam_tpu.ops.pallas_kernels import peak_stats

    x = rng.standard_normal((1, 480, 640)).astype(np.float32)

    def mk_peak():
        def f(im):
            peak, idx, s, ss = peak_stats(im)
            return im + (peak + s + ss + idx.astype(jnp.float32)) * 1e-20
        return f

    bench("peak_stats 1x480x640", mk_peak, x)

    # ---- LM pose-graph solve, bench-size graph
    from nislam_tpu.core.pose_graph import (
        PoseGraphProblem, SolverConfig, solve_pose_graph)

    for k, e in [(144, 512), (272, 512), (512, 1024)]:
        poses = rng.standard_normal((k, 3)).astype(np.float32) * 0.1
        f = rng.integers(0, k - 1, e).astype(np.int32)
        t = (f + 1).astype(np.int32)
        T = rng.standard_normal((e, 3)).astype(np.float32) * 0.1
        prob = PoseGraphProblem(
            poses=jnp.asarray(poses),
            pose_mask=jnp.ones(k, bool),
            from_slot=jnp.asarray(f),
            to_slot=jnp.asarray(t),
            T=jnp.asarray(T),
            sqrt_info=jnp.broadcast_to(jnp.eye(3), (e, 3, 3)),
            edge_mask=jnp.ones(e, bool),
        )
        cfg = SolverConfig(max_iterations=100)

        def mk_lm(prob=prob, cfg=cfg):
            def f(poses):
                p2, _, cost = solve_pose_graph(prob._replace(poses=poses), cfg)
                return p2 + cost * 1e-20
            return f

        # one solve per rep is plenty; use reps//5
        fmk = mk_lm()

        @jax.jit
        def loop(x, fmk=fmk):
            def body(c, _):
                return fmk(c), None
            y, _ = jax.lax.scan(body, x, None, length=5)
            return y

        xx = jax.block_until_ready(jnp.asarray(poses))
        t0 = time.time()
        np.asarray(loop(xx)).ravel()[:1]
        tc = time.time() - t0
        t0 = time.time()
        np.asarray(loop(xx)).ravel()[:1]
        dt = time.time() - t0
        print(f"{'LM solve K=%d E=%d (max_it=100)' % (k, e):55s} {dt/5*1e3:9.2f} ms/solve (compile {tc:.1f}s)",
              flush=True)

    # ---- dispatch overhead: trivial jitted op, 100 sequential dispatches
    @jax.jit
    def triv(x):
        return x + 1.0

    xx = jax.block_until_ready(jnp.zeros(8, jnp.float32))
    np.asarray(triv(xx))
    t0 = time.time()
    for _ in range(100):
        xx = triv(xx)
    np.asarray(xx)
    print(f"{'dispatch overhead (trivial jit, d2h each 100)':55s} {(time.time()-t0)/100*1e6:9.1f} us/call",
          flush=True)

    return 0


if __name__ == "__main__":
    sys.exit(main())
