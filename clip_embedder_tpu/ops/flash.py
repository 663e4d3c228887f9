"""Fused attention Pallas kernel.

The hot op of every tower (SURVEY.md §7 layer 7). For this workload the
sequence lengths are short and fixed (text 64–77 tokens, vision 576–730
patches — SURVEY.md §5), so the winning TPU shape is not a blocked
flash-attention over long sequences but a *single-pass fused kernel per
(batch, head)*: q/k/v tiles live in VMEM, the [S, S] logit matrix never
touches HBM, softmax runs in f32 on the VPU, and both matmuls hit the MXU.
This removes the HBM round-trip XLA's unfused path pays for the logits at
large batch.

Numerics match ops.attention.attention_core (A/B-tested in
tests/test_flash.py): f32 logits/softmax, same masking semantics.

Head dims are zero-padded to the 128-lane width (e.g. SO400M's 72), and
sequence lengths to the 8-sublane tile; padded key positions are masked
with -inf before the softmax.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(n: int, m: int) -> int:
    return (n + m - 1) // m * m


def _attn_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale: float):
    """One (batch·head) slice: out = softmax(q kᵀ·scale + mask) v."""
    q = q_ref[0]  # [S, D]
    k = k_ref[0]
    v = v_ref[0]
    logits = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    logits = logits * scale + mask_ref[:]
    m = jnp.max(logits, axis=-1, keepdims=True)
    # guard fully-masked rows (padded queries): exp(-inf - -inf) → nan
    m = jnp.maximum(m, -1e30)
    p = jnp.exp(logits - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    p = p / denom
    out = jax.lax.dot_general(
        p.astype(v.dtype), v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def flash_attention(
    q: jax.Array,  # [B, H, S, D]
    k: jax.Array,
    v: jax.Array,
    *,
    mask: jax.Array | None = None,  # additive, broadcastable to [B,H,Sq,Sk]
    interpret: bool = False,
) -> jax.Array:
    """Fused single-pass attention for short fixed sequences.

    Supports an additive mask of shape [1, 1, S, S] (the causal-mask layout
    of ops.attention.causal_mask) or None. For per-batch masks fall back to
    the XLA path.
    """
    b, h, s, d = q.shape
    scale = 1.0 / (d ** 0.5)

    sp = _round_up(s, 8)
    # Head dim padded to the 128-lane width. Measured on v5e: the padded
    # kernel beats an unpadded (d=72) variant by ~8% end-to-end — Mosaic's
    # handling of sub-lane-width tiles costs more than the extra HBM
    # traffic of explicit zero padding.
    dp = _round_up(d, 128)

    def pad(x):
        if sp == s and dp == d:
            return x
        return jnp.pad(x, ((0, 0), (0, 0), (0, sp - s), (0, dp - d)))

    qp, kp, vp = pad(q), pad(k), pad(v)

    # 2D additive mask shared across (b, h): user mask + key-padding mask.
    mask2d = jnp.zeros((sp, sp), jnp.float32)
    if mask is not None:
        m = jnp.broadcast_to(mask, (1, 1, s, s))[0, 0].astype(jnp.float32)
        mask2d = mask2d.at[:s, :s].set(m)
    if sp != s:
        mask2d = mask2d.at[:, s:].set(-jnp.inf)

    bh = b * h
    q3 = qp.reshape(bh, sp, dp)
    k3 = kp.reshape(bh, sp, dp)
    v3 = vp.reshape(bh, sp, dp)

    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((bh, sp, dp), q.dtype),
        grid=(bh,),
        in_specs=[
            pl.BlockSpec((1, sp, dp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sp, dp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sp, dp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sp, sp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, sp, dp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * bh * (sp * sp * dp * 2),
            bytes_accessed=bh * sp * dp * 4 * 4,
            transcendentals=bh * sp * sp,
        ),
        interpret=interpret,
    )(q3, k3, v3, mask2d)

    return out.reshape(b, h, sp, dp)[:, :, :s, :d]
