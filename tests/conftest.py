"""Test harness config: force the CPU backend with 8 virtual devices so
sharding/mesh tests run without TPU hardware (SURVEY.md §4: CPU-backend CI).

Must run before the first ``import jax`` anywhere in the test session.

TPU kernel tier: ``CLIP_TPU_TESTS=1 python -m pytest tests/ -m tpu``
keeps the real backend (axon-tunneled TPU) and runs only the
``@pytest.mark.tpu`` kernel A/B tests — the Mosaic-lowering regression
gate executed by the verify drive (see .claude/skills/verify/SKILL.md).
The default run excludes them via ``addopts = -m "not tpu"`` in
pyproject.toml (a user-supplied ``-m`` overrides it).
"""

import os

_TPU_TIER = os.environ.get("CLIP_TPU_TESTS") == "1"

if not _TPU_TIER:
    # Hard-set (not setdefault): the environment ships JAX_PLATFORMS=axon
    # plus a sitecustomize that registers the TPU plugin whenever
    # PALLAS_AXON_POOL_IPS is set — both must be overridden for a
    # deterministic CPU test backend.
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()

# The sitecustomize has already registered the axon plugin by the time
# conftest runs; the config update (not just the env var) forces CPU.
import jax  # noqa: E402

if not _TPU_TIER:
    jax.config.update("jax_platforms", "cpu")
else:
    from clip_embedder_tpu.utils.compilation_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()


import pytest  # noqa: E402


def pytest_configure(config):
    """Under CLIP_TPU_TESTS=1 the real (single, shared) TPU is the backend:
    refuse to run the CPU-designed bulk of the suite against it — the
    8-virtual-device mesh tests would fail spuriously and occupy the chip
    unserialized (CLAUDE.md forbids concurrent TPU work). Require an
    explicit ``-m`` selection that includes the tpu marker."""
    if _TPU_TIER and "tpu" not in (config.option.markexpr or ""):
        raise pytest.UsageError(
            "CLIP_TPU_TESTS=1 keeps the real TPU backend; run only the "
            "TPU tier with it: CLIP_TPU_TESTS=1 pytest tests/ -m tpu")
