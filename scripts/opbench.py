"""Slope-based op microbench: time K-chained ops in ONE program at two
chain lengths; the difference is pure per-op cost (cancels dispatch floor,
fence transfer, and any fixed carry overheads — the r5 methodology after
bwprobe* showed isolated timings on this tunneled device are floored by
tens of ms of fixed costs).

Usage: python scripts/opbench.py [--h 1200 --w 1600] [--only fft,...]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--h", type=int, default=1200)
    ap.add_argument("--w", type=int, default=1600)
    ap.add_argument("--k", type=int, nargs=2, default=(8, 32))
    ap.add_argument("--only", type=str, default="")
    ap.add_argument("--batch", type=int, default=0)
    args = ap.parse_args()
    only = set(args.only.split(",")) if args.only else None
    h, w = args.h, args.w
    k_lo, k_hi = args.k

    import jax
    import jax.numpy as jnp

    from nislam_tpu.ops import fft as F

    dev = jax.devices()[0]
    print(f"device: {dev.platform} {dev.device_kind}  {h}x{w} batch={args.batch}", flush=True)
    rng = np.random.default_rng(0)
    shape = (args.batch, h, w) if args.batch else (h, w)
    img = jnp.asarray(rng.random(shape, dtype=np.float32))

    def slope(label, mk_chain):
        """mk_chain(K) -> jitted fn(x)->x applying the op K times."""
        if only is not None and not any(label.startswith(o) for o in only):
            return
        ts = {}
        for K in (k_lo, k_hi):
            fn = jax.jit(mk_chain(K))
            np.asarray(fn(img)).ravel()[:1]  # compile
            best = float("inf")
            for _ in range(3):
                t0 = time.time()
                np.asarray(fn(img)).ravel()[:1]
                best = min(best, time.time() - t0)
            ts[K] = best
        per = (ts[k_hi] - ts[k_lo]) / (k_hi - k_lo)
        print(f"{label:40s} {per*1e6:9.1f} us/op   (K{k_lo}:{ts[k_lo]*1e3:7.1f}ms K{k_hi}:{ts[k_hi]*1e3:7.1f}ms)", flush=True)

    # FFT roundtrips
    def mk_rt(K):
        def fn(x):
            for i in range(K):
                x = F.irfft2(F.rfft2(x), (h, w)) + 1e-7 * i
            return x
        return fn

    F.set_ct_min(None)
    slope("fft rt mm-CT", mk_rt)
    F.set_ct_min(0)
    slope("fft rt mm-dense", mk_rt)
    F.set_fft_backend("xla")
    slope("fft rt xla-FFT", mk_rt)
    F.set_fft_backend(None)
    F.set_ct_min(None)

    # rotate (3 shears)
    from nislam_tpu.ops.warp import rotate_wrap, rotate_wrap_fft

    def mk_rot(K):
        def fn(x):
            for i in range(K):
                x = rotate_wrap_fft(x, 7.0 + i * 1e-6)
            return x
        return fn

    slope("rotate 3-shear mm-CT", mk_rot)
    F.set_ct_min(0)
    slope("rotate 3-shear mm-dense", mk_rot)
    F.set_ct_min(None)

    def mk_rotg(K):
        def fn(x):
            for i in range(K):
                x = rotate_wrap(x, 7.0 + i * 1e-6)
            return x
        return fn

    slope("rotate gather", mk_rotg)

    # peak_stats
    from nislam_tpu.ops.pallas_kernels import (
        _jnp_peak_stats,
        _pallas_peak_stats_blocked,
    )

    def mk_pk(fn_):
        def mk(K):
            def fn(x):
                for i in range(K):
                    peak, idx, s, ss = fn_(x)
                    x = x * (1.0 + 1e-12 * (peak + s)) + 1e-12 * idx.astype(jnp.float32).sum()
                return x
            return fn
        return mk

    slope("peak_stats jnp", mk_pk(_jnp_peak_stats))
    slope("peak_stats blocked-pallas", mk_pk(_pallas_peak_stats_blocked))

    # elementwise reference point
    def mk_roll(K):
        def fn(x):
            for i in range(K):
                x = jnp.roll(x, 1, axis=-1) + 1e-7
            return x
        return fn

    slope("roll+add (bandwidth ref)", mk_roll)
    return 0


if __name__ == "__main__":
    sys.exit(main())
