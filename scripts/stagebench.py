"""Per-stage timing of the tracked-frame pipeline on the current device.

Times each hot-path stage in isolation (scan-chained, single dispatch):
undistort gather, compute_intermedium, polar registration, 3-shear rotate,
image registration, peak_stats — at the bench config size.

Usage: python scripts/stagebench.py [--size 256|640]
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
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from nislam_tpu.core.camera import make_camera_ops
    from nislam_tpu.core.config import CameraConfig, CFConfig
    from nislam_tpu.ops.fft import irfft2, r2c, rfft2
    from nislam_tpu.ops.registration import (
        _kernel_spectrum,
        compute_intermedium,
        estimate_trans,
        keyframe_filter,
        make_cf_ops,
    )
    from nislam_tpu.ops.warp import rotate_wrap_fft

    if args.size == 640:
        h, w, rd, rc = 480, 640, 720, 480
    elif args.size == 1200:
        # the reference HD config (/root/reference/configs/config_HD.yaml)
        h, w, rd, rc = 1200, 1600, 720, 480
    else:
        h, w, rd, rc = 256, 256, 360, 240
    cfg = CFConfig(width=w, height=h, rotation_divisor=rd, rotation_channel=rc)
    cam = make_camera_ops(CameraConfig(
        image_width=w, image_height=h, height=1.0,
        intrinsics=(float(w), w / 2.0, float(w), h / 2.0),
    ))
    ops = make_cf_ops(cfg)
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {dev.device_kind}  size {h}x{w} polar {rd}x{rc}",
          flush=True)

    R = 30
    rng = np.random.default_rng(0)

    def bench(label, f, x):
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
        print(f"{label:38s} {dt*1e6:9.1f} us  (compile {tc:.1f}s)", flush=True)
        return dt

    img = rng.random((h, w), dtype=np.float32)

    bench("undistort gather", lambda x: cam.undistort(x) + x * 1e-9, img)

    def intermed(x):
        f, p = compute_intermedium(x, ops)
        return x + (jnp.abs(f[0, 0]) + jnp.abs(p[0, 0])).real * 1e-20

    bench("compute_intermedium (3 xforms+polar)", intermed, img)

    # polar registration with cached filter.  NB: setup math must be jitted
    # and carried as float pairs — this backend implements neither eager
    # slicing nor complex64 host transfers.
    from nislam_tpu.ops.fft import c2r

    pshape = cfg.polar_shape
    pol = rng.random(pshape).astype(np.float32)
    zf_p = np.fft.rfft2(pol).astype(np.complex64)
    zf_p_pair = np.stack([zf_p.real, zf_p.imag], axis=-1).astype(np.float32)

    @jax.jit
    def _mk_filt_p(zp, tgt):
        return c2r(keyframe_filter(r2c(zp), r2c(tgt), pshape, cfg))

    filt_p_pair = _mk_filt_p(jnp.asarray(zf_p_pair), ops.target_rot_fft)
    np.asarray(filt_p_pair[..., 0, 0])  # fence

    zf_p_dev = jnp.asarray(zf_p_pair)

    def polar_reg(x):
        xf = rfft2(x)
        tr, psr = estimate_trans(r2c(zf_p_dev), xf, r2c(ops.target_rot_fft),
                                 pshape, cfg, filt=r2c(filt_p_pair))
        return x + (tr[0] + psr) * 1e-20

    bench("polar registration (incl rfft2)", polar_reg, pol)

    bench("rotate_wrap_fft (3 shears)",
          lambda x: rotate_wrap_fft(x, x[0, 0] * 1e-9 + 7.0), img)

    ishape = (h, w)
    zf_i = np.fft.rfft2(img).astype(np.complex64)
    zf_i_pair = jnp.asarray(
        np.stack([zf_i.real, zf_i.imag], axis=-1).astype(np.float32)
    )

    @jax.jit
    def _mk_filt_i(zi, tgt):
        return c2r(keyframe_filter(r2c(zi), r2c(tgt), ishape, cfg))

    filt_i_pair = _mk_filt_i(zf_i_pair, ops.target_fft)
    np.asarray(filt_i_pair[..., 0, 0])  # fence

    def img_reg(x):
        xf = rfft2(x)
        tr, psr = estimate_trans(r2c(zf_i_pair), xf, r2c(ops.target_fft),
                                 ishape, cfg, filt=r2c(filt_i_pair))
        return x + (tr[0] + psr) * 1e-20

    bench("image registration (incl rfft2)", img_reg, img)

    from nislam_tpu.ops.pallas_kernels import peak_stats

    def pk(x):
        peak, idx, s, ss = peak_stats(x)
        return x + (peak + s + ss + idx.astype(jnp.float32)) * 1e-20

    bench("peak_stats", pk, img)

    def kfilt(x):
        f = rfft2(x)
        fi = keyframe_filter(f, r2c(ops.target_fft), ishape, cfg)
        return x + jnp.abs(fi[0, 0]).real * 1e-20

    bench("keyframe_filter (2 xforms, img size)", kfilt, img)

    return 0


if __name__ == "__main__":
    sys.exit(main())
