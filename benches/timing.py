"""Shared benchmark timing methodology.

One implementation of the dispatch-RTT probe used by both ``bench.py``
(repo root) and ``benches/bench_suite.py`` so the two can't drift: the
axon tunnel of this environment costs ~29 ms per dispatch (a production
TPU host pays microseconds), and every chained-on-device measurement
subtracts this single-call floor. Best-of-5 — the tunnel occasionally
hiccups, and an overestimated RTT would flatter the result.
"""

from __future__ import annotations

import time

_RTT_CACHE: list[float] = []


def dispatch_rtt(*, refresh: bool = False) -> float:
    """Best-of-5 single-dispatch round-trip time, cached per process."""
    import jax
    import jax.numpy as jnp

    if refresh:
        _RTT_CACHE.clear()
    if not _RTT_CACHE:
        nop = jax.jit(lambda x: x + 1)
        float(nop(jnp.float32(1)))
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            float(nop(jnp.float32(2)))
            best = min(best, time.perf_counter() - t0)
        _RTT_CACHE.append(best)
    return _RTT_CACHE[0]
