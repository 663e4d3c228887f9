"""Persistent XLA compilation cache.

First-compile of the large towers through the remote TPU toolchain can take
minutes; the persistent cache makes every later process reuse the compiled
executable. Enabled automatically by the embedders and bench; opt out with
``CLIP_TPU_NO_COMPILE_CACHE=1`` or point elsewhere with
``JAX_COMPILATION_CACHE_DIR``.
"""

from __future__ import annotations

import os
from pathlib import Path

_enabled = False


def enable_compilation_cache() -> None:
    global _enabled
    if _enabled or os.environ.get("CLIP_TPU_NO_COMPILE_CACHE"):
        return
    import jax

    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        str(Path.home() / ".cache" / "clip_tpu" / "xla_cache"),
    )
    try:
        Path(cache_dir).mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _enabled = True
    except Exception:  # noqa: BLE001 — cache is best-effort
        pass
