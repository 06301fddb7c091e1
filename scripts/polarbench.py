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

    def fused4_half_bm(x):
        # batch-minor row-gather: transpose the batch to the minor axis so
        # the shared-index gather reads contiguous (B,) vectors per tap
        # (embedding-lookup pattern) instead of B*taps scalar gathers.
        if x.ndim == 2:
            return fused4_half(x)
        b = x.shape[0]
        p = remove_zero_component(x).reshape(b, h * w).T  # (HW, B)
        taps = jnp.take(p, idx4h.reshape(-1), axis=0)     # (D2*C*4, B)
        taps = taps.reshape(rd // 2, rc, 4, b)
        pol = jnp.einsum("dckb,dck->dcb", taps, w4h)
        return back(jnp.moveaxis(pol, -1, 0), x)

    from nislam_tpu.ops.fft import rfft2 as _rfft2
    from nislam_tpu.ops.warp import polar_quad_constants, polar_resample_quad

    baseq, w4q = polar_quad_constants(h, w, rd, rc)
    baseq, w4q = jnp.asarray(baseq[: rd // 2]), jnp.asarray(w4q[: rd // 2])

    def quad_into_rfft2(x):
        pol = polar_resample_quad(remove_zero_component(x), baseq, w4q)
        return back(jnp.abs(_rfft2(pol)), x)

    def half_into_rfft2(x):
        # the ENGINE's context: gather feeding rfft2(pol) (consumer fusion)
        pol = polar_resample(remove_zero_component(x), idx4h, w4h)
        return back(jnp.abs(_rfft2(pol)), x)

    def quadbm_into_rfft2(x):
        # quad + batch-minor: ONE descriptor per polar output PER CHUNK,
        # each fetching the (B, 4) footprint block (B*16 bytes contiguous)
        from nislam_tpu.ops.warp import quad_pack
        b = x.shape[0]
        q = quad_pack(remove_zero_component(x))          # (B, HW, 4)
        qbm = jnp.moveaxis(q, 0, 1).reshape(h * w, b * 4)  # (HW, B*4)
        taps = jnp.take(qbm, baseq.reshape(-1), axis=0)  # (D2*C, B*4)
        taps = taps.reshape(rd // 2, rc, b, 4)
        pol = jnp.einsum("dcbk,dck->bdc", taps, w4q)
        return back(jnp.abs(_rfft2(pol)), x)

    def crop_into_rfft2(x):
        # same consumer, gather replaced by a crop: the difference is the
        # gather's true marginal cost in context
        pol = remove_zero_component(x)[..., : rd // 2, :rc]
        return back(jnp.abs(_rfft2(pol)), x)

    def literal(x):
        return back(warp_polar(fftshift2(remove_zero_component(x)), gx, gy), x)

    only_ctx = os.environ.get("POLARBENCH_ONLY_CTX") == "1"
    for b in ((args.batch,) if only_ctx else (1, args.batch)):
        shape = (h, w) if b == 1 else (b, h, w)
        x = rng.random(shape, dtype=np.float32)
        print(f"--- batch {b}")
        if only_ctx:
            bench("half gather -> rfft2 (engine ctx)", half_into_rfft2, x)
            bench("quad gather -> rfft2 (1 idx/out)", quad_into_rfft2, x)
            bench("quad batch-minor -> rfft2", quadbm_into_rfft2, x)
            bench("crop -> rfft2 (no gather bound)", crop_into_rfft2, x)
            continue
        bench("fused 8-tap", fused8, x)
        bench("4-tap + elementwise dc", fused4, x)
        bench("4-tap half_polar (production)", fused4_half, x)
        bench("4-tap half batch-minor rowgather", fused4_half_bm, x)
        bench("half gather -> rfft2 (engine ctx)", half_into_rfft2, x)
        bench("crop -> rfft2 (no gather bound)", crop_into_rfft2, x)
        bench("literal chain", literal, x)
    return 0


if __name__ == "__main__":
    sys.exit(main())
