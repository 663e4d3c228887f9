"""Device mesh construction and basic placement helpers.

The TPU replacement for the reference's ordered execution-provider fallback
list (reference: src/lib.rs:90-93, benches/model_bench.rs:23-28): instead of
TensorRT→CUDA→…→CPU, device selection is a JAX platform choice plus a mesh
shape over the chips of a slice. Multi-host extends the same mesh over DCN
via ``jax.distributed.initialize`` (call before ``get_mesh`` in multi-process
deployments).
"""

from __future__ import annotations

import math

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..errors import DeviceError

DATA_AXIS = "data"
MODEL_AXIS = "model"


def get_mesh(
    *,
    devices: list | None = None,
    model_parallel: int = 1,
) -> Mesh:
    """Build a ('data', 'model') mesh over the available devices.

    ``model_parallel=1`` (default) is pure data parallelism — the bulk
    embedding layout. Larger values carve a model axis for tensor
    parallelism of ViT-H/gopt-class towers; the model axis is laid out over
    adjacent devices so TP collectives ride the fastest ICI hops.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n % model_parallel != 0:
        raise DeviceError(
            f"model_parallel={model_parallel} does not divide {n} devices"
        )
    grid = np.array(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def replicate(tree, mesh: Mesh):
    """Place a pytree fully replicated over the mesh (the weights layout for
    data-parallel embedding — every chip holds the tower)."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(array, mesh: Mesh, *, extra_dims: int | None = None):
    """Place an array batch-sharded over the data axis (inputs layout)."""
    ndim = extra_dims + 1 if extra_dims is not None else np.ndim(array)
    spec = P(DATA_AXIS, *([None] * (ndim - 1)))
    return jax.device_put(array, NamedSharding(mesh, spec))


def pad_to_multiple(n: int, multiple: int) -> int:
    return int(math.ceil(n / multiple) * multiple)


def init_distributed(**kwargs) -> None:
    """Multi-host bring-up: initialize the JAX distributed runtime so the
    mesh spans hosts (ICI within a slice, DCN across) — the role a NCCL/MPI
    bootstrap plays in GPU frameworks (SURVEY.md §5 distributed backend).
    Call once per process before get_mesh(); no-ops on a single process
    without coordinator configuration.
    """
    import jax

    try:
        jax.distributed.initialize(**kwargs)
    except (ValueError, RuntimeError) as e:
        get_logger = __import__(
            "clip_embedder_tpu.utils.logging", fromlist=["get_logger"]
        ).get_logger
        get_logger().info("distributed init skipped: %s", e)


def select_platform(
    preferences: list[str] | None = None, *, strict: bool = False
) -> str:
    """Ordered platform preference with fallback — the analog of the
    reference's ordered execution-provider list (reference: src/lib.rs:90-93:
    each EP tried in order, falling back to CPU).

    Pins jax to the first preference that initializes (via
    ``jax.config.update("jax_platforms", ...)``, which takes effect even
    after backend init) and returns its name. If none of the preferred
    platforms is available, the default platform is left in place and its
    name returned — unless ``strict=True``, which raises ``DeviceError``
    instead (the ``.error_on_failure()`` analog, reference:
    examples/debug_local.rs:57,60: an EP misconfiguration fails loudly
    rather than silently landing on a slow fallback).
    """
    import jax

    preferences = preferences or ["tpu", "cpu"]
    prev = jax.config.jax_platforms
    for pref in preferences:
        try:
            jax.config.update("jax_platforms", pref)
            platform = jax.devices()[0].platform
            if platform == pref:
                return pref
        except RuntimeError:
            continue
    # restore whatever was pinned on entry (not None: a caller-forced
    # platform must survive a failed preference sweep)
    jax.config.update("jax_platforms", prev)
    if strict:
        raise DeviceError(
            f"None of the preferred platforms {preferences} initialized; "
            "strict platform selection refuses the silent fallback "
            "(reference: examples/debug_local.rs:57 error_on_failure)"
        )
    return jax.devices()[0].platform
