"""Pallas TPU kernels for the latency-critical reductions.

The KCC hot path ends every registration with: argmax of the correlation
response, its peak value, and the peak-to-sidelobe ratio — four separate
passes over the (H, W) response in stock XLA (max, argmax, sum, sum-of-
squares).  :func:`peak_stats` fuses them into ONE VMEM pass (SURVEY §7 hard
part 5): the response block is read once and all four moments come out
together.  Falls back to plain ``jnp`` off-TPU (CPU tests, interpret-free).

Conventions match the reference exactly: **column-major** first-maximum
tie-break — the reference's response arrays are default (column-major)
``Eigen::ArrayXXf`` and ``maxCoeff(&row, &col)`` traverses storage order,
so the first maximum in column-major order wins
(/root/reference/src/correlation_flow.cc:160-165) — and the PSR definition
of ``GetInfo`` (:238-243).  Ties only matter for bit-exact parity on
constructed inputs; real correlation responses never tie.
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp

# Escape hatch: NISLAM_NO_PALLAS=1 forces the plain-XLA reduction path
# (some remote-compile backends are slow/flaky for Mosaic kernels).
_DISABLE = os.environ.get("NISLAM_NO_PALLAS", "") not in ("", "0")


def _jnp_peak_stats(g: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
    h, w = g.shape[-2], g.shape[-1]
    flat = g.reshape(*g.shape[:-2], h * w)
    # argmax over the transposed view = first maximum in column-major
    # traversal order (Eigen maxCoeff parity); result converted back to a
    # row-major flat index.
    idx_cm = jnp.argmax(jnp.swapaxes(g, -2, -1).reshape(*g.shape[:-2], h * w), axis=-1)
    row = idx_cm % h
    col = idx_cm // h
    idx = row * w + col
    peak = jnp.take_along_axis(flat, idx[..., None], axis=-1)[..., 0]
    s = jnp.sum(flat, axis=-1)
    ss = jnp.sum(flat * flat, axis=-1)
    return peak, idx.astype(jnp.int32), s, ss


def _pallas_peak_stats_2d(g: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
    """Single (H, W) response → (peak, flat_idx, sum, sumsq) in one pass."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    h, w = g.shape

    def kernel(g_ref, out_ref):
        x = g_ref[:]
        m = jnp.max(x)
        rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
        # Column-major first-max tie-break (Eigen maxCoeff parity): minimize
        # the column-major linear index over the argmax set, then report the
        # winner as a row-major flat index.
        flat_cm = cols * h + rows
        idx_cm = jnp.min(jnp.where(x >= m, flat_cm, h * w))
        idx = (idx_cm % h) * w + idx_cm // h
        out_ref[0, 0] = m
        out_ref[0, 1] = idx.astype(jnp.float32)
        out_ref[0, 2] = jnp.sum(x)
        out_ref[0, 3] = jnp.sum(x * x)

    # Propagate the input's varying-manifest-axes so the call traces cleanly
    # inside `jax.shard_map(..., check_vma=True)` (the r2 regression: a
    # vma-less ShapeDtypeStruct fails check_vma at trace time even when the
    # lowered platform would pick the jnp branch).  jax.typeof / the vma
    # kwarg exist on every JAX the package imports on (pyproject floor 0.7,
    # required by the jax.shard_map surface used throughout parallel/).
    vma = getattr(jax.typeof(g), "vma", frozenset()) or frozenset()
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, 4), jnp.float32, vma=vma),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
    )(g)
    return out[0, 0], out[0, 1].astype(jnp.int32), out[0, 2], out[0, 3]


def _pallas_peak_stats_blocked(
    g: jnp.ndarray, block_rows: int | None = None
) -> Tuple[jnp.ndarray, ...]:
    """Row-block-streamed peak_stats for responses too large to hold in
    VMEM at once (the reference HD config: a 1200×1600 response is 7.7 MB,
    and the loop-closure candidate batch multiplies that by 16).

    One sequential grid walks (batch, row-block); scalar accumulators live
    in SMEM scratch and merge blocks with the same column-major-first-max
    tie-break as the single-block kernel, so the result is bit-identical.
    Replaces the r4 fallback to the 4-pass XLA reduction, which measured
    7.4 ms per 1200×1600 response on the bench TPU (vs ~bandwidth for this
    kernel) — the dominant term of VERDICT r4's HD cliff.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    h, w = g.shape[-2], g.shape[-1]
    lead = g.shape[:-2]
    gb = g.reshape((-1, h, w))
    b = gb.shape[0]
    # Block rows: ~2 MB of VMEM per block, sublane-aligned.
    bh = block_rows or max(8, min(h, (2 * 1024 * 1024 // (w * 4)) // 8 * 8))
    nb = -(-h // bh)
    sentinel = h * w  # > any valid column-major index

    def kernel(g_ref, out_ref, acc_ref, idx_ref):
        i = pl.program_id(0)
        j = pl.program_id(1)
        x = g_ref[0]  # (bh, w); rows past h are padding garbage → masked
        rows = jax.lax.broadcasted_iota(jnp.int32, (bh, w), 0) + j * bh
        cols = jax.lax.broadcasted_iota(jnp.int32, (bh, w), 1)
        valid = rows < h
        xm = jnp.where(valid, x, -jnp.inf)
        m = jnp.max(xm)
        icm = jnp.min(jnp.where(xm >= m, cols * h + rows, sentinel))
        s = jnp.sum(jnp.where(valid, x, 0.0))
        ss = jnp.sum(jnp.where(valid, x * x, 0.0))

        @pl.when(j == 0)
        def _init():
            acc_ref[0] = m
            acc_ref[1] = s
            acc_ref[2] = ss
            idx_ref[0] = icm

        @pl.when(j > 0)
        def _merge():
            pm = acc_ref[0]
            pidx = idx_ref[0]
            better = (m > pm) | ((m == pm) & (icm < pidx))
            acc_ref[0] = jnp.where(better, m, pm)
            idx_ref[0] = jnp.where(better, icm, pidx)
            acc_ref[1] = acc_ref[1] + s
            acc_ref[2] = acc_ref[2] + ss

        @pl.when(j == nb - 1)
        def _finish():
            # The output block is the whole (b, 4) array (TPU block-shape
            # rules forbid a (1, 4) SMEM block); each batch writes its row.
            icm_win = idx_ref[0]
            out_ref[i, 0] = acc_ref[0]
            out_ref[i, 1] = ((icm_win % h) * w + icm_win // h).astype(
                jnp.float32
            )
            out_ref[i, 2] = acc_ref[1]
            out_ref[i, 3] = acc_ref[2]

    vma = getattr(jax.typeof(g), "vma", frozenset()) or frozenset()
    out = pl.pallas_call(
        kernel,
        grid=(b, nb),
        out_shape=jax.ShapeDtypeStruct((b, 4), jnp.float32, vma=vma),
        in_specs=[
            pl.BlockSpec(
                (1, bh, w), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
            )
        ],
        out_specs=pl.BlockSpec(
            (b, 4), lambda i, j: (0, 0), memory_space=pltpu.SMEM
        ),
        scratch_shapes=[
            pltpu.SMEM((3,), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
        ],
    )(gb)
    return (
        out[:, 0].reshape(lead),
        out[:, 1].astype(jnp.int32).reshape(lead),
        out[:, 2].reshape(lead),
        out[:, 3].reshape(lead),
    )


@functools.partial(jax.jit, static_argnames=("force",))
def peak_stats(
    g: jnp.ndarray, force: str | None = None
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(peak, flat_argmax, sum, sum_of_squares) over the last two axes.

    Uses the fused Pallas kernel on TPU (vmapped over leading axes), plain
    jnp elsewhere.  ``force`` ∈ {"pallas", "jnp"} pins the implementation
    (testing).
    """
    if force == "jnp" or _DISABLE:
        return _jnp_peak_stats(g)
    # The fused single-block kernel holds one full (H, W) response in VMEM;
    # past ~4 MB per instance the Mosaic stack allocation (with the
    # compiler's instance pipelining) exceeds the 16 MB VMEM budget —
    # measured OOM at the reference's HD config (1200×1600 × the
    # 8-candidate × 2-hypothesis loop batch needs 22.8 MB).  Oversized
    # responses stream through the row-blocked kernel instead (r4's
    # fallback to the 4-pass XLA reduction measured 7.4 ms per response —
    # the dominant term of the HD cliff).
    if g.shape[-2] * g.shape[-1] * 4 > 4 * 1024 * 1024:
        if force == "pallas":
            return _pallas_peak_stats_blocked(g)
        return jax.lax.platform_dependent(
            g, tpu=_pallas_peak_stats_blocked, default=_jnp_peak_stats
        )
    fn = _pallas_peak_stats_2d
    for _ in range(g.ndim - 2):
        fn = jax.vmap(fn)
    if force == "pallas":
        return fn(g)
    # Decide at LOWERING time, not trace time: one process can hold both a
    # TPU main program and a CPU-mesh program (bench scaling proxy), and
    # `jax.default_backend()` only describes the former.
    return jax.lax.platform_dependent(g, tpu=fn, default=_jnp_peak_stats)


def psr_from_stats(
    peak: jnp.ndarray, s: jnp.ndarray, ss: jnp.ndarray, n: int
) -> jnp.ndarray:
    """PSR from fused moments — identical to ``ops.registration.psr``:
    ``side_mean = (Σg − peak)/(n−1)``; ``std = sqrt(mean((g − side_mean)²))
    = sqrt(ss/n − 2·side_mean·s/n + side_mean²)``."""
    side_mean = (s - peak) / (n - 1)
    var = ss / n - 2.0 * side_mean * s / n + side_mean * side_mean
    std = jnp.sqrt(jnp.maximum(var, 0.0))
    return (peak - side_mean) / (std + 1e-7)
