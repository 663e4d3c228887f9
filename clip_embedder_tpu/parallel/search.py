"""Device-resident sharded corpus search — semantic search at index scale.

The reference's search example embeds a handful of images and ranks them
with a host-side dot product (reference: examples/search.rs:26-58,
src/clip.rs:136-170 rank_images). This is the production-scale version of
that workload, TPU-first: the embedding corpus lives row-sharded over the
mesh's data axis (millions of rows fit a v5e slice's aggregate HBM), each
device scores queries against only its shard on the MXU, takes a local
top-k, and one tiny ``all_gather`` of the per-device candidates (k values
+ indices, not scores) merges the global top-k on every chip. The [Q, N]
score matrix never materializes and no corpus bytes ever move between
devices.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..errors import InferenceError
from ..ops.preprocess import bucket_batch
from .mesh import DATA_AXIS


@partial(jax.jit, static_argnames=("k", "axis", "mesh", "precision"))
def _sharded_topk(queries, corpus, valid, *, k: int, axis: str, mesh: Mesh,
                  precision):
    """shard_map body: local MXU scores -> local top-k -> all-gather the
    candidate set -> global top-k. Outputs replicated."""

    def per_device(q, shard, ok):
        n_local = shard.shape[0]
        kl = min(k, n_local)
        # [Q, n_local] on the MXU. Default precision is full f32 ("highest",
        # 3 bf16 passes): at query batches the extra passes hide under the
        # HBM read of the corpus shard, and scoring matches host f32 exactly
        # — near-tie top-k orders stay deterministic. Pass precision=None
        # for raw-bf16 scoring when Q is large enough to be compute-bound.
        scores = jnp.matmul(q, shard.T, precision=precision)
        scores = jnp.where(ok[None, :], scores, -jnp.inf)
        vals, idx = jax.lax.top_k(scores, kl)
        base = jax.lax.axis_index(axis) * n_local
        gidx = idx + base
        # candidate sets are [Q, kl] — tiny vs the corpus shard; one
        # gather over the ring yields [Q, n_dev·kl] on every device
        vals = jax.lax.all_gather(vals, axis, axis=1, tiled=True)
        gidx = jax.lax.all_gather(gidx, axis, axis=1, tiled=True)
        mvals, mpos = jax.lax.top_k(vals, k)
        return mvals, jnp.take_along_axis(gidx, mpos, axis=1)

    # check_vma off: the final top-k runs on the all-gathered candidate set,
    # so outputs are replicated by construction, but the VMA type system has
    # no varying->invariant cast to express that (inference-only: no grads)
    return jax.shard_map(
        per_device, mesh=mesh, axis_names={axis}, check_vma=False,
        in_specs=(P(), P(axis), P(axis)), out_specs=(P(), P()),
    )(queries, corpus, valid)


class CorpusIndex:
    """An [N, D] embedding corpus sharded row-wise over the mesh.

    Embeddings are expected L2-normalized (the embedders guarantee it), so
    the scores are cosine similarities. Rows added through ``add`` keep
    their insertion order as global ids; ``search`` returns those ids.
    """

    def __init__(self, mesh: Mesh, embed_dim: int, *,
                 dtype=jnp.float32, axis: str = DATA_AXIS,
                 precision: str | None = "highest"):
        self.mesh = mesh
        self.embed_dim = int(embed_dim)
        self.dtype = dtype
        self.axis = axis
        self.precision = precision
        self._n = 0
        self._corpus = None   # [N_pad, D] sharded P(axis)
        self._valid = None    # [N_pad] bool sharded P(axis)
        # host mirror of the unpadded rows: append-heavy workloads restage
        # from host memory instead of reading the whole corpus back over
        # the device link on every add (host RAM >> HBM, so the mirror is
        # the cheap side of the trade)
        self._host = None     # [N, D] numpy

    @classmethod
    def build(cls, embeddings, mesh: Mesh, **kw) -> "CorpusIndex":
        embeddings = np.asarray(embeddings)
        index = cls(mesh, embeddings.shape[-1], **kw)
        index.add(embeddings)
        return index

    def __len__(self) -> int:
        return self._n

    def add(self, embeddings) -> None:
        """Append rows. Restages the sharded corpus (O(N) host bytes) —
        batch additions rather than adding row-by-row."""
        new = np.asarray(embeddings, dtype=np.dtype(self.dtype))
        if new.ndim == 1:
            new = new[None, :]
        if new.ndim != 2 or new.shape[1] != self.embed_dim:
            raise InferenceError(
                f"corpus rows must be [*, {self.embed_dim}], got {new.shape}")
        if self._host is not None:
            new = np.concatenate([self._host, new], axis=0)
        self._host = new
        n = new.shape[0]
        n_dev = self.mesh.shape[self.axis]
        # per-device rows bucket to powers of two: corpus growth compiles
        # O(log N) programs, not one per add() (cold compiles on this
        # runtime can stall minutes — same invariant as the embedders)
        n_pad = bucket_batch(-(-n // n_dev)) * n_dev
        if n_pad != n:
            new = np.concatenate(
                [new, np.zeros((n_pad - n, self.embed_dim), new.dtype)])
        valid = np.arange(n_pad) < n
        sh = NamedSharding(self.mesh, P(self.axis))
        # device_put straight from numpy: each device receives only its own
        # rows — the padded corpus is never resident on a single device, so
        # corpora sized for the slice's *aggregate* HBM stage correctly
        self._corpus = jax.device_put(new, sh)
        self._valid = jax.device_put(valid, sh)
        self._n = n

    def search(self, queries, k: int):
        """Top-k rows by cosine similarity for each query.

        ``queries``: [Q, D] or a single [D] vector. Returns
        ``(scores [Q, k], ids [Q, k])`` as numpy, scores descending; for a
        single vector the leading axis is dropped.
        """
        if self._n == 0:
            raise InferenceError("Empty corpus")
        q = jnp.asarray(np.asarray(queries, np.float32), self.dtype)
        single = q.ndim == 1
        if single:
            q = q[None, :]
        if q.shape[-1] != self.embed_dim:
            raise InferenceError(
                f"query dim {q.shape[-1]} != corpus dim {self.embed_dim}")
        k = int(k)
        if not 1 <= k <= self._n:
            raise InferenceError(f"k={k} must be in [1, {self._n}]")
        # bucket Q and k to powers of two so repeat searches with varying
        # shapes reuse a bounded compiled-program set (zero-padded query
        # rows and the k..kb candidate tail are sliced off below; each
        # device still contributes ≥ min(k, n_local) candidates, so the
        # true global top-k survives the bucketing)
        n_q = q.shape[0]
        qb = bucket_batch(n_q)
        if qb != n_q:
            q = jnp.concatenate(
                [q, jnp.zeros((qb - n_q, q.shape[1]), q.dtype)])
        kb = min(bucket_batch(k), self._corpus.shape[0])
        q = jax.device_put(q, NamedSharding(self.mesh, P()))
        vals, idx = _sharded_topk(q, self._corpus, self._valid,
                                  k=kb, axis=self.axis, mesh=self.mesh,
                                  precision=self.precision)
        vals = np.asarray(vals.astype(jnp.float32))[:n_q, :k]
        idx = np.asarray(idx)[:n_q, :k]
        if single:
            return vals[0], idx[0]
        return vals, idx

    def search_texts(self, clip, texts: Sequence[str], k: int):
        """Text-to-corpus search through a ``Clip``'s text embedder —
        the scaled ``rank_images`` (reference: src/clip.rs:136-170): embed
        the queries, return the corpus top-k per query."""
        embs = clip.text.embed_texts(list(texts))
        return self.search(embs, k)
