"""Compare power→polar pipeline variants on the current device.

Variants: (a) 8-tap fused gather (DC suppression folded into taps),
(b) 4-tap gather + elementwise DC suppression, (c) the literal chain
(remove_zero_component → fftshift → 4-tap grid gather).  Batched and
single-frame — the real frontend runs batched over a chunk.

Usage: python scripts/polarbench.py [--size 256] [--batch 16]
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
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--batch", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from nislam_tpu.ops.fft import fftshift2
    from nislam_tpu.ops.registration import remove_zero_component
    from nislam_tpu.ops.warp import (
        polar_grid,
        polar_resample,
        polar_tap_constants,
        warp_polar,
    )

    if args.size == 640:
        h, w, rd, rc = 480, 640, 720, 480
    else:
        h, w, rd, rc = 256, 256, 360, 240
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {dev.device_kind}  {h}x{w} -> {rd}x{rc}", flush=True)

    idx8, w8 = polar_tap_constants(h, w, rd, rc, fold_dc=True)
    idx4, w4 = polar_tap_constants(h, w, rd, rc, fold_dc=False)
    gx, gy = polar_grid(h, w, rd, rc)
    idx8, w8, idx4, w4, gx, gy = map(jnp.asarray, (idx8, w8, idx4, w4, gx, gy))

    R = 20
    rng = np.random.default_rng(0)

    def bench(label, f, x):
        @jax.jit
        def loop(x):
            def body(c, _):
                return f(c), None
            y, _ = jax.lax.scan(body, x, None, length=R)
            return y

        x = jnp.asarray(x)
        t0 = time.time()
        y = loop(x)
        np.asarray(y).ravel()[:1]
        tc = time.time() - t0
        t0 = time.time()
        y = loop(x)
        np.asarray(y).ravel()[:1]
        dt = (time.time() - t0) / R
        n = x.shape[0] if x.ndim == 3 else 1
        print(f"{label:34s} {dt*1e6:9.1f} us  ({dt*1e6/n:7.1f} us/frame, compile {tc:.1f}s)",
              flush=True)

    def back(pol, x):
        # fold output back to input shape to keep the scan carry static
        s = jnp.sum(pol) * 1e-20
        return x + s

    def fused8(x):
        return back(polar_resample(x, idx8, w8), x)

    def fused4(x):
        return back(polar_resample(remove_zero_component(x), idx4, w4), x)

    # half_polar production path: gather only the first rd//2 rows
    idx4h, w4h = idx4[: rd // 2], w4[: rd // 2]

    def fused4_half(x):
        return back(polar_resample(remove_zero_component(x), idx4h, w4h), x)

    def literal(x):
        return back(warp_polar(fftshift2(remove_zero_component(x)), gx, gy), x)

    for b in (1, args.batch):
        shape = (h, w) if b == 1 else (b, h, w)
        x = rng.random(shape, dtype=np.float32)
        print(f"--- batch {b}")
        bench("fused 8-tap", fused8, x)
        bench("4-tap + elementwise dc", fused4, x)
        bench("4-tap half_polar (production)", fused4_half, x)
        bench("literal chain", literal, x)
    return 0


if __name__ == "__main__":
    sys.exit(main())
