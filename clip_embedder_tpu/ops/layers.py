"""Core transformer layers, written TPU-first.

These are the building blocks that live inside the reference's exported ONNX
graphs (the ViT/text towers in visual.onnx / text.onnx, executed by ONNX
Runtime — reference: src/vision.rs:106-114, src/text.rs:154-167). Here they
are from-scratch JAX functions designed for the MXU:

* matmuls carry ``preferred_element_type=float32`` so bf16 weights accumulate
  in f32 on the MXU;
* LayerNorm statistics are always computed in f32 regardless of activation
  dtype (bf16-safe), then cast back;
* activations cover the open_clip zoo: gelu (erf), gelu_tanh (timm/SigLIP),
  quick_gelu (original CLIP ViT checkpoints).

Parameters are plain dict pytrees: ``linear`` expects ``{"w": [in, out],
"b": [out]}``; ``layer_norm`` expects ``{"scale": [d], "bias": [d]}``.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

Params = dict


def quick_gelu(x: jax.Array) -> jax.Array:
    """x * sigmoid(1.702 x) — original CLIP's approximation. Computed in
    ≥f32 like the other activations (bf16 sigmoid tails lose precision)."""
    orig = x.dtype
    x32 = x.astype(_promote(x))
    return (x32 * jax.nn.sigmoid(1.702 * x32)).astype(orig)


def _promote(x: jax.Array) -> jnp.dtype:
    """Compute dtype: at least f32 (so bf16 activations get f32 math), but
    keep f64 if the caller runs in x64 mode (numerics verification)."""
    return jnp.promote_types(x.dtype, jnp.float32)


def gelu(x: jax.Array) -> jax.Array:
    """Exact (erf) gelu; computed in ≥f32 to keep tails exact for bf16."""
    orig = x.dtype
    return jax.nn.gelu(x.astype(_promote(x)), approximate=False).astype(orig)


def gelu_tanh(x: jax.Array) -> jax.Array:
    """tanh-approximate gelu (timm default; SigLIP towers)."""
    orig = x.dtype
    return jax.nn.gelu(x.astype(_promote(x)), approximate=True).astype(orig)


ACTIVATIONS: dict[str, Callable[[jax.Array], jax.Array]] = {
    "gelu": gelu,
    "gelu_tanh": gelu_tanh,
    "quick_gelu": quick_gelu,
    "relu": jax.nn.relu,
}

_ACTIVATION_NAMES = {fn: name for name, fn in ACTIVATIONS.items()}


def layer_norm(params: Params, x: jax.Array, *, eps: float = 1e-5) -> jax.Array:
    """LayerNorm over the last axis with f32 statistics.

    TPU note: bf16 mean/variance accumulation loses ~2-3 decimal digits on
    1k-dim activations, which alone can blow the ≤1e-3 cosine-parity budget
    (SURVEY.md §7 risk list) — so stats are always f32.
    """
    orig = x.dtype
    ct = _promote(x)
    x32 = x.astype(ct)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * params["scale"].astype(ct) + params["bias"].astype(ct)
    return y.astype(orig)


def linear(params: Params, x: jax.Array) -> jax.Array:
    """Affine map on the last axis. ``w: [in, out]``; bias optional.
    Params carrying ``w_q`` (int8-converted via ops.quant.quantize_tree)
    route through the quantized path."""
    if "w_q" in params:
        from .int8_mlp import fits_fused_linear, int8_linear_fused
        from .quant import int8_linear

        rows = x.size // x.shape[-1]
        if rows >= 128 and fits_fused_linear(params):
            return int8_linear_fused(params, x)
        return int8_linear(params, x)
    ct = _promote(x)
    y = jnp.dot(x, params["w"], preferred_element_type=ct)
    b = params.get("b")
    if b is not None:
        y = y + b.astype(ct)
    return y.astype(x.dtype)


def mlp(
    params: Params,
    x: jax.Array,
    *,
    activation: Callable[[jax.Array], jax.Array],
    pre_ln: Params | None = None,
    ln_eps: float = 1e-6,
    residual: bool = False,
) -> jax.Array:
    """Transformer MLP block: [LayerNorm →] linear → act → linear.

    params: {"fc": linear-params, "proj": linear-params}

    ``pre_ln`` (optional {"scale","bias"}) applies the pre-MLP LayerNorm as
    part of this call so the quantized path can fuse it in-kernel.
    Quantized blocks (``w_q`` leaves) route to the fused W8A8 Pallas kernel
    on TPU (ops.int8_mlp — the intermediate activations never leave VMEM);
    elsewhere they fall back to the unfused int8 matmuls.

    ``residual=True`` (requires ``pre_ln``) returns ``x + mlp(ln(x))``:
    the fused quantized kernel folds the transformer-block residual add
    into its epilogue (one less HBM pass per layer).
    """
    if residual and pre_ln is None:
        raise ValueError("mlp(residual=True) requires pre_ln")
    fc = params.get("fc")
    if isinstance(fc, dict) and "w_q" in fc:
        from .int8_mlp import (fits_fused_mlp, fits_streamed_mlp, int8_mlp,
                               int8_mlp_streamed)

        name = _ACTIVATION_NAMES.get(activation)
        if name and fits_fused_mlp(params, name):
            return int8_mlp(params, x, activation=name, pre_ln=pre_ln,
                            ln_eps=ln_eps, add_residual=residual)
        if name and fits_streamed_mlp(params, name,
                                      x.size // x.shape[-1]):
            # weight sets beyond VMEM residency (PE-Core-bigG 27.5 MB):
            # hidden-slab weight streaming, DMA hidden under slab matmuls
            return int8_mlp_streamed(params, x, activation=name,
                                     pre_ln=pre_ln, ln_eps=ln_eps,
                                     add_residual=residual)
    res = x if residual else None
    if pre_ln is not None:
        x = layer_norm(pre_ln, x, eps=ln_eps)
    h = linear(params["fc"], x)
    h = activation(h)
    h = linear(params["proj"], h)
    return h if res is None else res + h
