"""Test harness config: force the CPU backend with 8 virtual devices so
sharding/mesh tests run without TPU hardware (SURVEY.md §4: CPU-backend CI).

Must run before the first ``import jax`` anywhere in the test session.
"""

import os

# Hard-set (not setdefault): the environment ships JAX_PLATFORMS=axon plus a
# sitecustomize that registers the TPU plugin whenever PALLAS_AXON_POOL_IPS
# is set — both must be overridden for a deterministic CPU test backend.
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

jax.config.update("jax_platforms", "cpu")
