"""L2 normalization — the final op of every tower.

The reference bakes ``normalize=True`` into its exported graphs
(reference: pull_onnx.py:58-59,67-68) so embeddings come out unit-length and
dot product equals cosine similarity (reference: src/clip.rs:102). Here it is
an explicit f32 op at the end of each tower's forward.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def l2_normalize(x: jax.Array, *, axis: int = -1, eps: float = 0.0) -> jax.Array:
    """x / ||x||₂ along ``axis``, computed in f32.

    ``eps=0`` matches torch's ``F.normalize`` clamp semantics closely enough
    for nonzero embeddings; a tiny eps can be passed for safety with
    synthetic zero inputs.
    """
    x32 = x.astype(jnp.promote_types(x.dtype, jnp.float32))
    norm = jnp.sqrt(jnp.sum(jnp.square(x32), axis=axis, keepdims=True))
    if eps:
        norm = jnp.maximum(norm, eps)
    return (x32 / norm).astype(x.dtype)
