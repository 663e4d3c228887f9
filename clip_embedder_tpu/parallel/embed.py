"""Mesh-sharded bulk embedding — the TPU analog of the reference's bulk
indexing workload (reference: examples/search.rs:49 ranks an image library;
its only scale-out story is per-thread ``duplicate()`` replicas,
src/clip.rs:69-73).

Here: weights live replicated (or TP-sharded) on every chip, the batch axis
shards over the 'data' mesh axis, and one jitted program runs preprocess +
tower fused across the slice. XLA partitions everything; host work is only
JPEG decode and resize-weight construction.

Jitted sharded forwards are cached at module level per
(spec, attn_impl, mesh, tensor_parallel) — constructing several sharded
wrappers over the same model never recompiles — and batches bucket to
powers of two (aligned to the data axis) so varying-size streams reuse a
handful of compiled programs.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..errors import InferenceError
from ..ops.preprocess import bucket_batch
from ..utils.images import to_rgb_array
from .mesh import DATA_AXIS, pad_to_multiple, replicate
from .sharding import tp_param_specs


def _batch_bucket(n: int, n_data: int) -> int:
    """Power-of-two batch bucket, aligned to the data-axis size."""
    return pad_to_multiple(bucket_batch(n), n_data)


def _tp_shardings(params: dict, mesh: Mesh):
    specs = tp_param_specs(params, tower="vit")
    return jax.tree.map(
        lambda s: NamedSharding(mesh, s), specs,
        is_leaf=lambda x: isinstance(x, P),
    )


@lru_cache(maxsize=32)
def _sharded_vision_forward(spec, attn_impl: str, mesh: Mesh,
                            tensor_parallel: bool, preprocessor_key):
    """One jitted sharded forward per (tower, mesh, layout). The preprocess
    constants (mean/std/dtype) are part of the key via ``preprocessor_key``.

    Note: for tensor_parallel the param shardings are derived from the
    param *structure*, which is spec-determined for all supported
    checkpoints; the shardings pytree is rebuilt per call from the params.
    """
    mean, std, out_dtype = preprocessor_key
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    batch_spec = NamedSharding(mesh, P(DATA_AXIS))

    def forward(params, images_u8, whs_u, wws_u, idx):
        from ..ops.preprocess import resize_normalize_indexed
        from ..vision import _jitted_vision_forward, preprocess_layout

        pixels = resize_normalize_indexed(
            images_u8, whs_u, wws_u, idx, mean, std,
            out_dtype=out_dtype, layout=preprocess_layout(spec.family))
        return _jitted_vision_forward(spec, attn_impl)(params, pixels)

    if not tensor_parallel:
        # Pure DP is embarrassingly parallel: run the whole forward
        # per-shard under shard_map so the Pallas kernels keep working on
        # local blocks with zero collectives. Under plain GSPMD a Pallas
        # kernel is an opaque custom call with no partitioning rule — the
        # partitioner would all-gather the batch-sharded activations every
        # layer (the same mechanism docs/DEPLOYMENT.md describes for the
        # model axis), erasing the DP speedup.
        forward = jax.shard_map(
            forward, mesh=mesh, check_vma=False,
            in_specs=(P(), P(DATA_AXIS), P(), P(), P(DATA_AXIS)),
            out_specs=P(DATA_AXIS),
        )

    return jax.jit(
        forward,
        # unique weight tables replicate; the batch and its index shard
        in_shardings=(None, batch_spec, None, None, batch_spec),
        out_shardings=batch_spec,
    )


@lru_cache(maxsize=32)
def _sharded_text_forward(spec, attn_impl: str, mesh: Mesh):
    batch_spec = NamedSharding(mesh, P(DATA_AXIS))

    def forward(params, ids, mask):
        from ..text import _jitted_text_forward

        # the tokenizer-produced mask is authoritative (see text.py:75-80):
        # dropping it here would let hf_bert towers re-derive a mask from
        # cfg.pad_id, which can differ from the resolved tokenizer pad id
        return _jitted_text_forward(spec, attn_impl)(params, ids, mask)

    # per-shard execution (DP only — no TP for text): Pallas attention runs
    # on local batch blocks instead of forcing GSPMD to gather the batch
    # around an unpartitionable custom call (see _sharded_vision_forward)
    forward = jax.shard_map(
        forward, mesh=mesh, check_vma=False,
        in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=P(DATA_AXIS),
    )

    return jax.jit(
        forward,
        in_shardings=(None, batch_spec, batch_spec),
        out_shardings=batch_spec,
    )


class ShardedVisionEmbedder:
    """Wraps a VisionEmbedder for data-parallel (optionally tensor-parallel)
    bulk embedding over a mesh."""

    def __init__(self, embedder, mesh: Mesh, *, tensor_parallel: bool = False):
        self.inner = embedder
        self.mesh = mesh
        if tensor_parallel and getattr(embedder, "quantize", None):
            from ..errors import ConfigError

            raise ConfigError(
                "tensor_parallel is not supported with quantized embedders "
                "(TP partition specs describe full-precision param trees)"
            )
        if tensor_parallel and embedder.spec.family == "vit":
            self.params = jax.device_put(
                embedder.params, _tp_shardings(embedder.params, mesh))
        else:
            tensor_parallel = False
            self.params = replicate(embedder.params, mesh)

        # GSPMD partitions the einsum attention across the model axis
        # natively; a Pallas kernel is an opaque custom call that forces an
        # all-gather of the TP-sharded activations every layer (see
        # docs/DEPLOYMENT.md). With attn_impl="auto" the inner embedder
        # resolves to pallas on TPU — override to the sharding-native core.
        self.attn_impl = embedder.attn_impl
        if tensor_parallel and self.attn_impl.startswith("pallas"):
            from ..utils.logging import warn_once

            warn_once(
                "tp-pallas-override",
                "tensor_parallel: overriding attn_impl=%r to 'xla' (a Pallas "
                "custom call would force per-layer all-gathers of the "
                "model-sharded activations)", self.attn_impl)
            self.attn_impl = "xla"

        pp = embedder.preprocessor
        self._forward = _sharded_vision_forward(
            embedder.spec, self.attn_impl, mesh, tensor_parallel,
            (tuple(np.asarray(pp.mean).tolist()),
             tuple(np.asarray(pp.std).tolist()), pp.out_dtype),
        )

    def embed_images(self, images: Sequence[Any]) -> np.ndarray:
        embs, n = self.embed_images_device(images)
        return np.asarray(embs[:n].astype(jnp.float32))

    def embed_images_device(self, images: Sequence[Any]):
        """Async variant (see VisionEmbedder.embed_images_device)."""
        if len(images) == 0:
            raise InferenceError("Empty batch")
        arrays = [to_rgb_array(img) for img in images]
        bb = _batch_bucket(len(arrays), self.mesh.shape[DATA_AXIS])
        batch, whs_u, wws_u, idx = (
            self.inner.preprocessor.stage_host_batch_unique(
                arrays, batch_bucket=bb))
        return self._forward(self.params, batch, whs_u, wws_u, idx), len(arrays)


class ShardedTextEmbedder:
    """Data-parallel bulk text embedding over a mesh."""

    def __init__(self, embedder, mesh: Mesh):
        self.inner = embedder
        self.mesh = mesh
        self.params = replicate(embedder.params, mesh)
        self._forward = _sharded_text_forward(
            embedder.spec, embedder.attn_impl, mesh)

    def embed_texts(self, texts: Sequence[str]) -> np.ndarray:
        if len(texts) == 0:
            raise InferenceError("Empty batch")
        ids, mask = self.inner.tokenize(texts)
        bb = _batch_bucket(len(texts), self.mesh.shape[DATA_AXIS])
        if bb != ids.shape[0]:
            pad = np.full((bb - ids.shape[0], ids.shape[1]),
                          self.inner.pad_id, np.int32)
            ids = np.concatenate([ids, pad], axis=0)
            mask = np.concatenate([mask, np.zeros_like(pad)], axis=0)
        embs = self._forward(self.params, jnp.asarray(ids), jnp.asarray(mask))
        return np.asarray(embs[: len(texts)].astype(jnp.float32))
