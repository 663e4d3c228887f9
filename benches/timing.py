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


def chained_timer(fn, *args, iters: int = 30):
    """Build a ``once() -> seconds/iteration`` probe for ``fn(*args)``.

    The shared chained-on-device methodology (see module docstring):
    ``iters`` calls run inside ONE jitted ``fori_loop`` with a
    cross-iteration data dependency threaded through the first argument
    (``x + acc*1e-30`` — numerically invisible, but XLA cannot overlap or
    elide iterations), reduced by a FULL sum — a ``[:1]`` slice can
    propagate backward through non-custom-call stages and understate the
    cost. Each ``once()`` call reads back one scalar and returns
    per-iteration wall seconds minus the cached dispatch RTT.

    Integer first arguments (tokenized ids, u8 images) carry the
    dependency through a never-true data-dependent select instead of the
    additive perturbation (whose int cast would be a foldable no-op).
    Tuple-returning ``fn``s are timed on their first element. Used by
    ``bench.py``, ``benches/bench_suite.py`` and the ``tools/profile_*``
    harnesses so the methodology cannot drift between them (interleave
    ``once()`` calls across variants and take medians — single-shot
    readings on this tunnel mislead by 10-20%).
    """
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(*a):
        def body(_, acc):
            first = a[0]
            if jnp.issubdtype(first.dtype, jnp.floating):
                x_i = first + (acc * 1e-30).astype(first.dtype)
            else:
                x_i = jnp.where(acc > jnp.float32(1e30), first + 1, first)
            out = fn(x_i, *a[1:])
            if isinstance(out, tuple):
                out = out[0]
            return acc + jnp.sum(out.astype(jnp.float32)) * 1e-20
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    float(run(*args))  # compile outside the timed region

    def once() -> float:
        t0 = time.perf_counter()
        float(run(*args))
        return max(time.perf_counter() - t0 - dispatch_rtt(), 1e-9) / iters

    return once
