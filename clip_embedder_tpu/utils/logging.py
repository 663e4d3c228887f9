"""Env-filtered logging + profiling helpers.

The observability analog of the reference's dev-only tracing setup
(``tracing-subscriber`` with ``EnvFilter::new("info,ort=warn")`` in examples
— reference: examples/search.rs:10-13) and its ad-hoc ``Instant::now()``
timings (reference: examples/search.rs:17-50). Configure with
``CLIP_TPU_LOG=info`` (or debug/warning/error); profile device execution
with ``trace()`` which wraps ``jax.profiler`` (view in TensorBoard or
Perfetto).
"""

from __future__ import annotations

import contextlib
import logging
import os
import time


def get_logger(name: str = "clip_embedder_tpu") -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler()
        handler.setFormatter(
            logging.Formatter("%(asctime)s %(levelname)s %(name)s: %(message)s",
                              datefmt="%H:%M:%S")
        )
        logger.addHandler(handler)
        level = os.environ.get("CLIP_TPU_LOG", "warning").upper()
        logger.setLevel(getattr(logging, level, logging.WARNING))
    return logger


@contextlib.contextmanager
def timed(label: str, logger: logging.Logger | None = None):
    """Wall-clock timing of a block (the Instant::now() analog)."""
    logger = logger or get_logger()
    t0 = time.perf_counter()
    try:
        yield
    finally:
        logger.info("%s: %.1f ms", label, (time.perf_counter() - t0) * 1e3)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/clip_tpu_trace"):
    """Device-level profiler trace (jax.profiler) around a block."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


_warned_once: set = set()


def warn_once(key: str, msg: str, *args) -> None:
    """Emit a warning exactly once per process for ``key`` (unanchored-
    structure notices at config resolution: fastvit mci3/4, PE-Core).
    Tests reset via ``_warned_once.clear()``."""
    if key in _warned_once:
        return
    _warned_once.add(key)
    get_logger().warning(msg, *args)
