"""Opt-in int8 quantization (W8A8, dynamic) for the matmul-heavy layers.

v5e's MXU runs int8×int8→int32 at ~1.4× the measured bf16 rate, so serving
deployments that can spend a little accuracy (measured round 5,
BENCH_RESULTS.md: embeddings move ~2-6e-4 cosine vs bf16 — inside the
≤1e-3 parity budget; opt-in because bf16 stays the accuracy-first default)
get a throughput bump on the MLP blocks, which carry ~75% of a
ViT's FLOPs.

Scheme: per-output-channel symmetric int8 weights (static, computed at
load), per-row (per-token) symmetric int8 activations (dynamic, computed
in-graph on the VPU), int32 accumulation, fused dequantize into the output:

    y[t, o] = (Σ_k x̂[t,k] ŵ[k,o]) · sx[t] · sw[o]  (+ bias)

Enable via ``quantize="int8"`` on the embedder constructors; only Linear
layers whose params were converted by :func:`quantize_tree` run quantized —
LayerNorm/softmax/attention keep full precision.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

Params = dict


def quantize_weight(w: np.ndarray, *, clip: str = "mse") -> dict:
    """[..., in, out] float weight → per-output-channel symmetric int8
    (leading dims — e.g. the stacked-layer axis — quantize independently).

    ``clip="mse"`` (the default since round 5) searches a per-channel clip
    ratio α ∈ [0.70, 1.0] minimizing the channel's round-trip MSE instead
    of always scaling by the absolute max: clipping a channel's few
    outlier weights buys finer resolution for the bulk, which measurably
    tightens int8_all embeddings against the ≤1e-3 cosine budget at zero
    runtime cost (the search runs once at load). ``clip="max"`` keeps the
    round-4 exact-max scales."""
    w = np.asarray(w, np.float32)
    amax = np.abs(w).max(axis=-2, keepdims=True)
    amax = np.where(amax == 0, 1.0, amax)
    if clip == "mse":
        best_scale = None
        best_err = None
        for alpha in np.linspace(0.70, 1.0, 13):
            scale = (alpha * amax / 127.0).astype(np.float32)
            q = np.clip(np.round(w / scale), -127, 127)
            err = ((q * scale - w) ** 2).sum(axis=-2, keepdims=True)
            if best_err is None:
                best_err, best_scale = err, scale
            else:
                take = err < best_err
                best_err = np.where(take, err, best_err)
                best_scale = np.where(take, scale, best_scale)
        scale = best_scale.astype(np.float32)
    else:
        scale = (amax / 127.0).astype(np.float32)
    w_q = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
    return {"w_q": w_q, "w_scale": np.squeeze(scale, axis=-2)}


# MLP-block subtree names across the vision families: vit/text 'mlp',
# fastvit 'ffn', convnext block linears 'fc1'/'fc2'.
DEFAULT_QUANT_PATHS = ("mlp", "ffn", "fc1", "fc2")
# "int8_all" additionally quantizes the attention projections (q/k/v/out) —
# a larger speedup with a correspondingly larger accuracy cost (measured
# 3.5-6e-4 cosine, BENCH_RESULTS.md round 5); served by the fused Pallas
# linear kernel on TPU.
QUANT_PATHS_ALL = DEFAULT_QUANT_PATHS + ("attn",)


def quantize_tree(params: Params, *,
                  paths: tuple[str, ...] = DEFAULT_QUANT_PATHS,
                  exclude: tuple[str, ...] = (),
                  clip: str = "mse") -> Params:
    """Convert the Linear leaves under the given subtree names (default:
    the MLP blocks of every family) to int8. Only matmul weights quantize
    (2-D, or 3-D stacked-layer); convs and other leaves are untouched.
    ``exclude`` names subtrees kept full-precision even under a target
    path (e.g. ``("out",)`` keeps the attention out-projections bf16 —
    the accuracy/throughput frontier knob measured in BENCH_RESULTS).
    Works on numpy or jax trees; returns a new tree."""

    def walk(node, under_target: bool, depth: int = 0):
        if isinstance(node, dict):
            if under_target and "w" in node:
                w = np.asarray(node["w"])
                # 1×1 convs ([kh=1, kw=1, in, out], optionally with a
                # stacked-layer axis in front — FastViT's ConvFFN fc1/fc2)
                # are matmuls: squeeze the spatial dims and quantize.
                if w.ndim in (4, 5) and w.shape[-4] == 1 and w.shape[-3] == 1:
                    w = w.reshape(w.shape[:-4] + w.shape[-2:])
                if w.ndim in (2, 3):
                    q = quantize_weight(w, clip=clip)
                    out = {k: v for k, v in node.items() if k != "w"}
                    out.update(q)
                    return out
                return node
            return {
                # the ROOT-level "proj" is the tower's output projection
                # (e.g. convnext timm_proj='mlp' head with fc1/fc2 children
                # that would otherwise name-collide with block linears) —
                # the layer most sensitive to quantization noise stays out
                # of scope; blocks live under blocks/stages/etc.
                k: (v if (depth == 0 and k == "proj") or k in exclude
                    else walk(v, under_target or k in paths, depth + 1))
                for k, v in node.items()
            }
        if isinstance(node, list):
            return [walk(v, under_target, depth + 1) for v in node]
        return node

    return walk(params, False)


def quantize_tree_checked(params: Params, family: str, *,
                          mode: str = "int8",
                          paths: tuple[str, ...] | None = None) -> Params:
    """``quantize_tree`` that raises when nothing quantized — the shared
    contract for both embedders (a silently no-op ``quantize="int8"`` hides
    a perf bug from the caller). ``mode``: "int8" (MLP blocks) or
    "int8_all" (MLP + attention projections)."""
    from ..errors import ConfigError

    if paths is None:
        paths = QUANT_PATHS_ALL if mode == "int8_all" else DEFAULT_QUANT_PATHS
    qparams = quantize_tree(params, paths=paths)
    found = []

    def scan(node):
        if isinstance(node, dict):
            if "w_q" in node:
                found.append(True)
            for v in node.values():
                scan(v)
        elif isinstance(node, list):
            for v in node:
                scan(v)

    scan(qparams)
    if not found:
        raise ConfigError(
            f"int8 quantization found no quantizable (matmul) layers for "
            f"the '{family}' family"
        )
    return qparams


def int8_linear(params: Params, x: jax.Array) -> jax.Array:
    """Quantized affine map: dynamic per-row activation quant → int8 MXU
    matmul → fused dequant. ``params``: {"w_q": [in,out] i8,
    "w_scale": [out] f32, optional "b": [out]}."""
    orig_shape = x.shape
    orig_dtype = x.dtype
    x2 = x.reshape(-1, orig_shape[-1]).astype(jnp.float32)
    amax = jnp.max(jnp.abs(x2), axis=-1, keepdims=True)
    x_scale = jnp.where(amax == 0, 1.0, amax / 127.0)
    x_q = jnp.clip(jnp.round(x2 / x_scale), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        x_q, params["w_q"],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * x_scale * params["w_scale"]
    b = params.get("b")
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y.reshape(*orig_shape[:-1], -1).astype(orig_dtype)
