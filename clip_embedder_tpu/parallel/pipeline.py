"""Asynchronous bulk-embedding pipeline: host decode overlapped with device
compute.

The production form of the reference's bulk indexing workload
(reference: examples/search.rs:49, rayon preprocessing src/vision.rs:128-132):
a host thread pool decodes/stages the next batch while the device embeds the
current one. JAX dispatch is asynchronous, so the pipeline simply keeps one
batch of host prep in flight ahead of the device and only synchronizes when
draining results — decode, weight-matrix construction, H2D transfer, and
tower compute all overlap.
"""

from __future__ import annotations

import concurrent.futures as cf
from typing import Any, Iterable, Iterator, Sequence

import numpy as np

from ..utils.images import to_rgb_array
from ..utils.logging import get_logger


class EmbedPipeline:
    """Stream images through a (possibly mesh-sharded) vision embedder.

    embedder: VisionEmbedder or ShardedVisionEmbedder (anything with
    ``embed_images``). ``batch_size`` is the device batch; ``prefetch``
    bounds how many prepared batches may wait ahead of the device.
    """

    def __init__(self, embedder, *, batch_size: int = 32,
                 decode_workers: int = 8, prefetch: int = 2):
        self.embedder = embedder
        self.batch_size = batch_size
        self.decode_workers = decode_workers
        self.prefetch = max(1, prefetch)
        self.log = get_logger()

    @staticmethod
    def _submit_batch(pool: cf.Executor, batch: Sequence[Any]) -> list[cf.Future]:
        # per-image futures: every worker participates in decoding the
        # in-flight batches, so decode-bound streams use the full pool
        return [pool.submit(to_rgb_array, img) for img in batch]

    def embed_iter(self, images: Iterable[Any]) -> Iterator[np.ndarray]:
        """Yield one [batch, D] embedding array per input batch, preserving
        order. Decode of batch N+prefetch proceeds while batch N computes."""
        items = iter(images)

        def take() -> list[Any] | None:
            chunk = []
            for img in items:
                chunk.append(img)
                if len(chunk) == self.batch_size:
                    break
            return chunk or None

        import jax.numpy as jnp

        embed_dev = getattr(self.embedder, "embed_images_device", None)

        with cf.ThreadPoolExecutor(self.decode_workers) as pool:
            pending: list[list[cf.Future]] = []
            # prime the decode pipeline
            for _ in range(self.prefetch):
                chunk = take()
                if chunk is None:
                    break
                pending.append(self._submit_batch(pool, chunk))

            # device pipeline: batch N's readback happens only after batch
            # N+1's staging + forward have been dispatched, so H2D transfer
            # and compute of N+1 overlap the readback wait of N
            dev_pending: list[tuple[Any, int]] = []
            while pending:
                try:
                    arrays = [fut.result() for fut in pending.pop(0)]
                    chunk = take()
                    if chunk is not None:
                        pending.append(self._submit_batch(pool, chunk))
                    if embed_dev is None:  # duck-typed, no async variant
                        yield self.embedder.embed_images(arrays)
                        continue
                    dev_pending.append(embed_dev(arrays))
                except Exception:
                    # a failed batch must not swallow the previous batch's
                    # already-computed embeddings still in flight — drain
                    # before propagating so consumers keep every completed
                    # batch (matches the old synchronous loop's semantics)
                    for embs, n in dev_pending:
                        yield np.asarray(embs[:n].astype(jnp.float32))
                    raise
                while len(dev_pending) > 1:
                    embs, n = dev_pending.pop(0)
                    yield np.asarray(embs[:n].astype(jnp.float32))
            for embs, n in dev_pending:
                yield np.asarray(embs[:n].astype(jnp.float32))

    def embed_all(self, images: Sequence[Any]) -> np.ndarray:
        """Embed a full collection, returning [N, D]."""
        outs = list(self.embed_iter(images))
        if not outs:
            from ..errors import InferenceError

            raise InferenceError("Empty batch")
        return np.concatenate(outs, axis=0)
