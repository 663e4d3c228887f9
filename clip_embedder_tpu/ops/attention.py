"""Multi-head attention, XLA path.

Replaces the fused attention nodes inside the reference's ONNX graphs
(executed by ONNX Runtime's CPU/GPU kernels — reference: src/onnx.rs:19-23)
with a from-scratch JAX implementation shaped for the MXU: one [B,S,D]→
[B,S,3D]-style projection set, batched head matmuls, f32 softmax.

A fused Pallas flash-attention kernel (clip_embedder_tpu.ops.flash) can be
selected with ``impl="pallas"``; numerics are A/B-tested against this path.
Sequence lengths in this workload are short and fixed (text 64–77 tokens,
vision 576–729 patches — SURVEY.md §5), so the XLA path is already strong;
flash attention wins on HBM traffic at large batch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from einops import rearrange

from .layers import linear

Params = dict


def attention_core(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    mask: jax.Array | None = None,
    impl: str = "xla",
) -> jax.Array:
    """Scaled dot-product attention over [B, H, S, Dh] tensors.

    ``mask`` is an additive bias broadcastable to [B, H, Sq, Sk] (use -inf
    for disallowed positions, e.g. the causal mask of the CLIP text tower).
    Softmax runs in f32 regardless of input dtype.
    """
    if impl in ("pallas", "pallas_fast"):
        from .flash import flash_attention  # deferred: optional fast path

        # pallas_fast: clamped-exp softmax (no max pass) — ~7% faster
        # kernel, bf16-noise-level numerics for trained models
        return flash_attention(q, k, v, mask=mask,
                               fast_softmax=impl == "pallas_fast")
    if impl != "xla":
        # a typo like 'palas' must not silently run the XLA path while the
        # caller reports the Pallas kernel (same contract as check_attn_impl)
        raise ValueError(
            f"Unknown attention impl '{impl}' "
            "(choices: xla, pallas, pallas_fast)")

    ct = jnp.promote_types(q.dtype, jnp.float32)
    scale = 1.0 / (q.shape[-1] ** 0.5)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=ct)
    logits = logits * scale
    if mask is not None:
        logits = logits + mask.astype(ct)
    weights = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd",
        weights.astype(v.dtype),
        v,
        preferred_element_type=ct,
    )
    return out.astype(v.dtype)


def multi_head_attention(
    params: Params,
    x: jax.Array,
    *,
    num_heads: int,
    mask: jax.Array | None = None,
    kv: jax.Array | None = None,
    impl: str = "xla",
    pre_ln: Params | None = None,
    ln_eps: float = 1e-6,
    residual: jax.Array | None = None,
    rope: tuple[jax.Array, jax.Array] | None = None,
) -> jax.Array:
    """Full MHA block: [LayerNorm →] project → attend → merge → out-project.

    params: {"q","k","v","out"} each a linear pytree ({"w": [d, d'], "b"}).
    ``kv`` enables cross-attention (used by the SigLIP attention-pooling
    head, where a learned probe attends over patch tokens).

    ``rope`` (optional ``(sin, cos)`` head-tiled [S, H·D] tables from
    ops.rope) rotates q/k in the packed projection layout right after the
    projections — 2-D axial rope for the PE-Core family; prefix tokens get
    identity rows in the table rather than a concatenate/split here.

    ``pre_ln`` (optional {"scale","bias"}) applies the pre-attention
    LayerNorm as part of this call; on the Pallas path it fuses with the
    q/k/v projections in one kernel (ops.qkv.ln_qkv — the normalized
    activations never leave VMEM).

    ``residual`` (optional, same shape as the output) returns
    ``residual + out_proj(attention)``: quantized out-projections fold the
    add into the kernel epilogue; other paths add explicitly.
    """

    def out_proj(out):
        outp = params["out"]
        if residual is not None and "w_q" in outp:
            from .int8_mlp import fits_fused_linear, int8_linear_fused

            if out.size // out.shape[-1] >= 128 and fits_fused_linear(outp):
                return int8_linear_fused(outp, out, residual=residual)
        h = linear(outp, out)
        return h if residual is None else residual + h
    fused_qkv = False
    if pre_ln is not None and kv is None and impl in ("pallas", "pallas_fast"):
        from .qkv import (fits_fused_qkv, fits_fused_qkv_int8, ln_qkv,
                          ln_qkv_int8)

        if fits_fused_qkv_int8(params, x.shape[-1]):  # int8_all towers
            q, k, v = ln_qkv_int8(params, pre_ln, x, eps=ln_eps)
            fused_qkv = True
        elif fits_fused_qkv(params, x.shape[-1]):
            q, k, v = ln_qkv(params, pre_ln, x, eps=ln_eps)
            fused_qkv = True
    if not fused_qkv:
        if pre_ln is not None:
            from .layers import layer_norm

            x = layer_norm(pre_ln, x, eps=ln_eps)
        kv = x if kv is None else kv
        q = linear(params["q"], x)
        k = linear(params["k"], kv)
        v = linear(params["v"], kv)

    if impl in ("pallas", "pallas_fast") and q.shape == k.shape:
        from .flash import _head_group, flash_attention_packed

        d = q.shape[-1] // num_heads
        if _head_group(num_heads, d) is not None and (rope is None
                                                      or mask is None):
            # packed-layout kernel: q/k/v stay in the projection layout
            # [B, S, H·D] — no transpose, no head-dim lane pad (ops.flash
            # v3). rope applies IN-KERNEL on the VMEM-resident blocks
            # (bit-identical to the outside apply_rope, minus its q/k HBM
            # round-trip).
            # pallas_fast additionally runs the [S, S] softmax-weight
            # pipeline in bf16 at head dims below 96 (exp_bf16): measured
            # round 4 on v5e, interleaved medians — +18%/+7% at d=72
            # (SO400M), +7% at d=80 (H14); at d=96 repeated runs
            # straddle zero (−6%/+5% gopt, neutral PE), so the gate keeps
            # d=96 on the f32 exp's better numerics. ~3e-5 cosine, inside
            # the pallas_fast budget (BENCH_RESULTS round 4).
            out = flash_attention_packed(
                q, k, v, num_heads=num_heads, mask=mask, rope=rope,
                fast_softmax=impl == "pallas_fast",
                exp_bf16=impl == "pallas_fast" and d < 96)
            return out_proj(out)

    if rope is not None:
        from .rope import apply_rope

        sin, cos = rope
        q = apply_rope(q, sin, cos)
        k = apply_rope(k, sin, cos)

    q = rearrange(q, "b s (h d) -> b h s d", h=num_heads)
    k = rearrange(k, "b s (h d) -> b h s d", h=num_heads)
    v = rearrange(v, "b s (h d) -> b h s d", h=num_heads)

    out = attention_core(q, k, v, mask=mask, impl=impl)
    out = rearrange(out, "b h s d -> b s (h d)")
    return out_proj(out)


def causal_mask(seq_len: int, dtype=jnp.float32) -> jax.Array:
    """Additive causal mask [1, 1, S, S] (CLIP text tower's
    ``build_causal_mask`` analog)."""
    mask = jnp.triu(jnp.full((seq_len, seq_len), -jnp.inf, dtype=dtype), k=1)
    return mask[None, None, :, :]
