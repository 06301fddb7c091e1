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
    # The fused kernel holds one full (H, W) response block in VMEM; past
    # ~4 MB per instance the Mosaic stack allocation (with the compiler's
    # instance pipelining) exceeds the 16 MB VMEM budget — measured OOM at
    # the reference's HD config (1200×1600 × the 8-candidate × 2-hypothesis
    # loop batch needs 22.8 MB).  Oversized responses take the plain-XLA
    # multi-pass reduction instead (bandwidth-bound either way at that size).
    if g.shape[-2] * g.shape[-1] * 4 > 4 * 1024 * 1024:
        return _jnp_peak_stats(g)
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
