"""HD-config (1200x1600) stage decomposition on the current device.

Round-5 investigation harness for VERDICT r4 weak #1 (the 30-fps HD
cliff): times each suspect in isolation — factored vs dense matmul-DFT,
blocked vs multi-pass peak_stats, shear pieces, gather variants — all
scan-chained (R iterations inside one program) so the ~1 ms dispatch
floor of this device amortizes away.

Usage: python scripts/hdbench.py [--only A,B,...] [--r N]
"""
from __future__ import annotations

import argparse
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--r", type=int, default=20)
    ap.add_argument("--only", type=str, default="")
    args = ap.parse_args()
    only = set(args.only.split(",")) if args.only else None

    import jax
    import jax.numpy as jnp

    from nislam_tpu.ops import fft as F
    from nislam_tpu.ops.warp import (
        _shear_x,
        bilinear_sample,
        polar_quad_constants,
        polar_resample_quad,
        quad_pack,
        rotate_wrap_fft,
    )

    h, w = 1200, 1600
    rd, rc = 720, 480
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {dev.device_kind}  size {h}x{w}", flush=True)
    R = args.r
    rng = np.random.default_rng(0)

    def bench(label, f, x):
        if only is not None and not any(label.startswith(o) for o in only):
            return

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
        tc = time.time() - t0
        t0 = time.time()
        y = loop(x)
        np.asarray(jax.tree.leaves(y)[0]).ravel()[:1]
        dt = (time.time() - t0) / R
        print(f"{label:44s} {dt*1e6:9.1f} us  (compile {tc:.1f}s)", flush=True)
        return dt

    img = rng.random((h, w), dtype=np.float32)

    # --- peak_stats variants ---
    from nislam_tpu.ops.pallas_kernels import (
        _jnp_peak_stats,
        _pallas_peak_stats_blocked,
    )

    def mk_pk(fn):
        def pk(x):
            peak, idx, s, ss = fn(x)
            return x + (peak + s + ss + idx.astype(jnp.float32)) * 1e-20
        return pk

    bench("peak_stats jnp multi-pass", mk_pk(_jnp_peak_stats), img)
    bench("peak_stats blocked pallas", mk_pk(_pallas_peak_stats_blocked), img)

    # --- transforms: CT vs dense ---
    def rfft2_rt(x):
        f = F.rfft2(x)
        return F.irfft2(f, (h, w)) + x * 1e-20

    def irfft2_mag(x):
        return F.irfft2(jnp.abs(F.rfft2(x)), (h, w))

    F.set_ct_min(None)  # default: CT active at 1200/1600
    bench("rfft2+irfft2 roundtrip (CT)", rfft2_rt, img)
    bench("irfft2 of magnitude (CT)", irfft2_mag, img)
    bench("rotate_wrap_fft 3 shears (CT)", lambda x: rotate_wrap_fft(x, x[0, 0] * 1e-9 + 7.0), img)
    bench("shear_x only (CT)", lambda x: _shear_x(x, x[0, 0] * 1e-9 + 0.12), img)
    F.set_ct_min(0)  # disable CT → dense constants
    bench("rfft2+irfft2 roundtrip (dense)", rfft2_rt, img)
    bench("irfft2 of magnitude (dense)", irfft2_mag, img)
    bench("rotate_wrap_fft 3 shears (dense)", lambda x: rotate_wrap_fft(x, x[0, 0] * 1e-9 + 7.0), img)
    F.set_ct_min(None)

    # --- phase-only cost (the sincos term of one shear) ---
    def phase_only(x):
        kx = jnp.arange(w // 2 + 1, dtype=jnp.float32)
        y = jnp.arange(h, dtype=jnp.float32) - h / 2.0
        d = (x[0, 0] * 1e-9 + 0.12) * y
        ph = jnp.exp(2j * jnp.pi / w * d[:, None] * kx)
        return x + jnp.real(ph).sum() * 1e-20

    bench("shear phase sincos only", phase_only, img)

    # --- polar gather from HD power ---
    pidx, pw4 = polar_quad_constants(h, w, rd, rc)
    pidx_d, pw4_d = jnp.asarray(pidx), jnp.asarray(pw4)
    bench(
        "polar_resample_quad (720x480 out)",
        lambda x: polar_resample_quad(x, pidx_d, pw4_d).sum() * 1e-20 + x,
        img,
    )

    # --- undistort variants ---
    # mild barrel distortion grid (static, host-precomputed)
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    cx, cy = w / 2.0, h / 2.0
    r2 = ((xs - cx) / cx) ** 2 + ((ys - cy) / cy) ** 2
    k = 0.02
    gx = cx + (xs - cx) * (1 + k * r2)
    gy = cy + (ys - cy) * (1 + k * r2)
    gx_d, gy_d = jnp.asarray(gx), jnp.asarray(gy)
    bench(
        "undistort bilinear_sample (4 taps)",
        lambda x: bilinear_sample(x, gx_d, gy_d) + x * 1e-20,
        img,
    )

    # quad-packed undistort: 1 descriptor per output
    x0 = np.floor(gx).astype(np.int64)
    y0 = np.floor(gy).astype(np.int64)
    wx = gx - x0
    wy = gy - y0
    w4 = np.stack(
        [(1 - wy) * (1 - wx), (1 - wy) * wx, wy * (1 - wx), wy * wx], axis=-1
    ).astype(np.float32)
    base = (np.mod(y0, h) * w + np.mod(x0, w)).astype(np.int32)
    base_d, w4_d = jnp.asarray(base), jnp.asarray(w4)

    def undist_quad(x):
        q = quad_pack(x)
        taps = jnp.take(q, base_d.reshape(-1), axis=-2).reshape(h, w, 4)
        return jnp.sum(taps * w4_d, axis=-1) + x * 1e-20

    bench("undistort quad-packed (1 desc)", undist_quad, img)

    return 0


if __name__ == "__main__":
    sys.exit(main())
