"""Interleaved A/B bench of peak_stats variants at HD size.

Co-tenant noise on this shared TPU swings isolated microbenches ±3x;
interleaving repeats of each variant in one process gives trustworthy
relative numbers (memory: axon-tpu-quirks).
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

    from nislam_tpu.ops.pallas_kernels import (
        _jnp_peak_stats,
        _pallas_peak_stats_blocked,
    )

    h, w = 1200, 1600
    R = 20
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((h, w), dtype=np.float32))

    def mk(fn, **kw):
        def pk(x):
            peak, idx, s, ss = fn(x, **kw)
            return x + (peak + s + ss + idx.astype(jnp.float32)) * 1e-20

        @jax.jit
        def loop(x):
            def body(c, _):
                return pk(c), None
            y, _ = jax.lax.scan(body, x, None, length=R)
            return y

        return loop

    def sum_only_pallas(x):
        """Streaming-only control: no max/argmax, just block sums."""
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        bh = 320
        nb = -(-h // bh)

        def kernel(g_ref, out_ref, acc_ref):
            j = pl.program_id(0)
            x = g_ref[0] if g_ref.shape[0] == 1 else g_ref[...]
            s = jnp.sum(x)

            @pl.when(j == 0)
            def _():
                acc_ref[0] = s

            @pl.when(j > 0)
            def _():
                acc_ref[0] = acc_ref[0] + s

            @pl.when(j == nb - 1)
            def _():
                out_ref[0] = acc_ref[0]

        out = pl.pallas_call(
            kernel,
            grid=(nb,),
            out_shape=jax.ShapeDtypeStruct((1,), jnp.float32),
            in_specs=[
                pl.BlockSpec((bh, w), lambda j: (j, 0), memory_space=pltpu.VMEM)
            ],
            out_specs=pl.BlockSpec((1,), lambda j: (0,), memory_space=pltpu.SMEM),
            scratch_shapes=[pltpu.SMEM((1,), jnp.float32)],
        )(x)
        return (out[0], jnp.int32(0), out[0], out[0])

    variants = {
        "jnp4pass": mk(_jnp_peak_stats),
        "blocked": mk(_pallas_peak_stats_blocked),
        "blocked_bh600": mk(_pallas_peak_stats_blocked, block_rows=600),
        "sumonly": mk(sum_only_pallas),
    }

    # compile all
    for name, loop in variants.items():
        t0 = time.time()
        np.asarray(loop(img)).ravel()[:1]
        print(f"compile {name}: {time.time()-t0:.1f}s", flush=True)

    times = {k: [] for k in variants}
    for rep in range(5):
        for name, loop in variants.items():
            t0 = time.time()
            np.asarray(loop(img)).ravel()[:1]
            times[name].append((time.time() - t0) / R * 1e6)
    for name, ts in times.items():
        print(f"{name:16s} min {min(ts):9.1f} us  med {sorted(ts)[len(ts)//2]:9.1f} us", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
