"""Tracing & profiling utilities (SURVEY §5: the reference has only ad-hoc
``std::chrono`` per-frame prints, /root/reference/main.cpp:61-65; the TPU
build provides real tooling).

- :class:`StageTimer` — named host-side wall-clock accumulators with the
  per-frame ms print as a formatting option (CLI parity with the
  reference's stdout),
- :func:`trace` — context manager around ``jax.profiler`` emitting a
  TensorBoard-loadable trace directory,
- :func:`device_fence` — an honest completion fence: a tiny device→host
  readback (``jax.block_until_ready`` alone can return early on relayed
  backends — see bench.py).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator

import numpy as np


def device_fence(x) -> None:
    """Block until ``x``'s computation really finished (d2h readback)."""
    import jax

    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(jax.numpy.ravel(leaf)[0])


class StageTimer:
    """Accumulate wall-clock per named stage; print summaries."""

    def __init__(self) -> None:
        self.total: Dict[str, float] = defaultdict(float)
        self.count: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, *, fence=None) -> Iterator[None]:
        t0 = time.perf_counter()
        yield
        if fence is not None:
            device_fence(fence)
        dt = time.perf_counter() - t0
        self.total[name] += dt
        self.count[name] += 1

    def mean_ms(self, name: str) -> float:
        return 1e3 * self.total[name] / max(self.count[name], 1)

    def summary(self) -> str:
        lines = []
        for name in sorted(self.total, key=lambda n: -self.total[n]):
            lines.append(
                f"{name:24s} {self.total[name]:8.3f}s total "
                f"{self.mean_ms(name):9.3f}ms/call x{self.count[name]}"
            )
        return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """``jax.profiler`` trace context (view with TensorBoard)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
