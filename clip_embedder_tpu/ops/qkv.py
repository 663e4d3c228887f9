"""Fused pre-attention LayerNorm + q/k/v projection Pallas kernel.

The pre-attention LayerNorm is a separate XLA pass over the [B, S, W]
residual stream (HBM round trip) before the three projection matmuls. This
kernel runs, per row tile resident in VMEM:

    x → f32 LayerNorm → bf16 → (x̂ Wq + bq, x̂ Wk + bk, x̂ Wv + bv)

with all three weight matrices resident in VMEM (constant block index), so
the normalized activations never touch HBM and the three projections issue
back-to-back on the MXU. Numerics are identical to
``layer_norm`` + 3 × ``linear`` (f32 LN statistics, one bf16 rounding of the
normalized activations, f32 matmul accumulation) — A/B-tested in
tests/test_flash.py.

Used by ops.attention.multi_head_attention when a ``pre_ln`` is supplied
with a Pallas attention impl; the output layout [B, S, H·D] feeds
ops.flash.flash_attention_packed directly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Params = dict

# Combined q/k/v weight bytes that may sit resident in VMEM per grid step
# (16 MB/core, minus row tiles and double-buffering headroom). Widths whose
# full q/k/v set exceeds this stream column slabs instead: the grid gains a
# leading chunk dimension and each step holds [W, W/nc] slices of all three
# matrices (so W=1536 giant-opt towers ride the fused path too, 2 slabs).
_VMEM_WEIGHT_BUDGET = 12 * 1024 * 1024
_MAX_WEIGHT_CHUNKS = 4


def _pick_chunks(width: int, itemsize: int) -> int | None:
    """Smallest column-chunk count keeping the per-step q/k/v slab bytes in
    budget, with 128-lane-aligned slab widths. None = no valid chunking."""
    for nc in range(1, _MAX_WEIGHT_CHUNKS + 1):
        if width % (nc * 128) != 0:
            continue
        if 3 * width * (width // nc) * itemsize <= _VMEM_WEIGHT_BUDGET:
            return nc
    return None


def _kernel(x_ref, g_ref, b_ref, wq_ref, bq_ref, wk_ref, bk_ref,
            wv_ref, bv_ref, q_ref, k_ref, v_ref, *, eps: float):
    x32 = x_ref[:].astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = (y * g_ref[0] + b_ref[0]).astype(q_ref.dtype)
    for w_ref, bias_ref, o_ref in (
        (wq_ref, bq_ref, q_ref),
        (wk_ref, bk_ref, k_ref),
        (wv_ref, bv_ref, v_ref),
    ):
        o = jax.lax.dot_general(
            y, w_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[:] = (o + bias_ref[0]).astype(o_ref.dtype)


def fits_fused_qkv(params: Params, width: int) -> bool:
    """Static eligibility: unquantized square projections on a TPU backend,
    lane-aligned width, and the full q/k/v set resident in one VMEM slab.

    Widths needing column chunking (bf16 W=1536, gopt) stay on the unfused
    XLA path: the chunked kernel was measured SLOWER there — v5e,
    batch 8 × S 577, interleaved medians, RTT-corrected: unfused ~0.33 ms
    vs chunked 0.42-0.46 ms across (tile, nc) ∈ {128,256,512}×{2,3} — the
    second streaming pass over x plus the per-chunk LN recompute costs more
    than the fusion saves once the weights no longer fit. The chunked grid
    stays available via ``ln_qkv(_nc=...)`` for re-measurement."""
    if jax.default_backend() != "tpu" or width % 128 != 0:
        return False
    itemsize = None
    for name in ("q", "k", "v"):
        p = params.get(name)
        if not isinstance(p, dict) or "w_q" in p or "w" not in p:
            return False
        w = p["w"]
        if w.ndim != 2 or w.shape != (width, width):
            return False
        itemsize = w.dtype.itemsize
    return _pick_chunks(width, itemsize) == 1


def _kernel_int8(x_ref, g_ref, b_ref, wq_ref, sq_ref, bq_ref,
                 wk_ref, sk_ref, bk_ref, wv_ref, sv_ref, bv_ref,
                 q_ref, k_ref, v_ref, *, eps: float):
    x32 = x_ref[:].astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * g_ref[0] + b_ref[0]
    # one shared per-row activation quant for all three projections (the
    # separate int8_linear_fused calls each repeat this VPU pass)
    amax = jnp.max(jnp.abs(y), axis=-1, keepdims=True)
    xs = jnp.where(amax == 0, 1.0, amax / 127.0)
    yq = jnp.clip(jnp.round(y / xs), -127, 127).astype(jnp.int8)
    for w_ref, s_ref, bias_ref, o_ref in (
        (wq_ref, sq_ref, bq_ref, q_ref),
        (wk_ref, sk_ref, bk_ref, k_ref),
        (wv_ref, sv_ref, bv_ref, v_ref),
    ):
        o = jax.lax.dot_general(
            yq, w_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
        o_ref[:] = (o * (xs * s_ref[0]) + bias_ref[0]).astype(o_ref.dtype)


def fits_fused_qkv_int8(params: Params, width: int) -> bool:
    """int8 variant eligibility: quantized square projections, TPU backend,
    lane-aligned width, chunkable within the VMEM budget (int8 weights are
    3·W² bytes — one slab up to W=2048)."""
    if jax.default_backend() != "tpu" or width % 128 != 0:
        return False
    for name in ("q", "k", "v"):
        p = params.get(name)
        if not isinstance(p, dict) or "w_q" not in p:
            return False
        w = p["w_q"]
        if w.ndim != 2 or w.shape != (width, width):
            return False
    # same single-slab gating as the bf16 path (chunked streaming measured
    # slower there; no real open_clip width exceeds 2048 anyway)
    return _pick_chunks(width, 1) == 1


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def ln_qkv_int8(params: Params, pre_ln: Params, x: jax.Array, *,
                eps: float = 1e-6, interpret: bool = False,
                ) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Fused LayerNorm + W8A8 q/k/v projections (``quantize="int8_all"``).

    Same structure as ``ln_qkv`` with ops.quant weight layout ({"w_q"
    [W, W] int8, "w_scale" [W], "b"?}): f32 LN → one shared per-row
    activation quant → three int8 MXU matmuls with resident weights →
    fused dequant + bias.
    """
    w = x.shape[-1]
    g = pre_ln["scale"].astype(jnp.float32).reshape(1, w)
    b = pre_ln["bias"].astype(jnp.float32).reshape(1, w)

    flat = []
    for name in ("q", "k", "v"):
        p = params[name]
        pb = p.get("b")
        flat += [p["w_q"], p["w_scale"].astype(jnp.float32).reshape(1, w),
                 (jnp.zeros((1, w), jnp.float32) if pb is None
                  else pb.astype(jnp.float32).reshape(1, w))]

    orig_shape = x.shape
    rows = x.size // w
    x2 = x.reshape(rows, w)
    tile = 256 if rows % 256 == 0 else 128
    rp = (rows + tile - 1) // tile * tile
    if rp != rows:
        x2 = jnp.pad(x2, ((0, rp - rows), (0, 0)))

    nc = _pick_chunks(w, 1)
    if nc is None:
        raise ValueError(
            f"ln_qkv_int8: width {w} has no single-slab chunking within the "
            "VMEM budget — gate callers on fits_fused_qkv_int8()")
    wc = w // nc
    # chunk dim outer, row tiles inner: each weight slab loads once and
    # stays resident while the row tiles stream past it
    row_spec = pl.BlockSpec((tile, w), lambda j, i: (i, 0),
                            memory_space=pltpu.VMEM)
    ln_vec = pl.BlockSpec((1, w), lambda j, i: (0, 0),
                          memory_space=pltpu.VMEM)
    slab_vec = pl.BlockSpec((1, wc), lambda j, i: (0, j),
                            memory_space=pltpu.VMEM)
    slab_mat = pl.BlockSpec((w, wc), lambda j, i: (0, j),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((tile, wc), lambda j, i: (i, j),
                            memory_space=pltpu.VMEM)

    outs = pl.pallas_call(
        functools.partial(_kernel_int8, eps=eps),
        out_shape=tuple(
            jax.ShapeDtypeStruct((rp, w), x.dtype) for _ in range(3)),
        grid=(nc, rp // tile),
        in_specs=[row_spec, ln_vec, ln_vec]
                 + [slab_mat, slab_vec, slab_vec] * 3,
        out_specs=(out_spec, out_spec, out_spec),
        compiler_params=pltpu.CompilerParams(
            # resident weights + double-buffered row tiles pass the 16 MB
            # scoped default at W=1280 (ViT-H)
            vmem_limit_bytes=32 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=3 * 2 * rp * w * w,
            bytes_accessed=nc * rp * w * 2 + rp * w * 3 * 2 + 3 * w * w,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x2, g, b, *flat)
    return tuple(o[:rows].reshape(orig_shape) for o in outs)


@functools.partial(jax.jit,
                   static_argnames=("eps", "interpret", "_tile", "_nc"))
def ln_qkv(params: Params, pre_ln: Params, x: jax.Array, *,
           eps: float = 1e-6, interpret: bool = False,
           _tile: int | None = None, _nc: int | None = None,
           ) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Fused LayerNorm + q/k/v projections.

    ``params``: {"q","k","v"} linear pytrees ({"w": [W, W], "b"?});
    ``pre_ln``: {"scale","bias"}; ``x``: [..., W] (bf16/f32).
    Returns (q, k, v), each shaped like x.
    ``_tile``/``_nc`` override the row-tile size / weight-chunk count
    (benchmark-sweep knobs; production callers leave them None).
    """
    w = x.shape[-1]
    g = pre_ln["scale"].astype(jnp.float32).reshape(1, w)
    b = pre_ln["bias"].astype(jnp.float32).reshape(1, w)

    weights, biases = [], []
    for name in ("q", "k", "v"):
        p = params[name]
        weights.append(p["w"])
        pb = p.get("b")
        biases.append(jnp.zeros((1, w), jnp.float32) if pb is None
                      else pb.astype(jnp.float32).reshape(1, w))

    orig_shape = x.shape
    rows = x.size // w
    x2 = x.reshape(rows, w)
    tile = _tile or (256 if rows % 256 == 0 else 128)
    rp = (rows + tile - 1) // tile * tile
    if rp != rows:
        x2 = jnp.pad(x2, ((0, rp - rows), (0, 0)))

    nc = _nc or _pick_chunks(w, weights[0].dtype.itemsize)
    if nc is None or w % (nc * 128) != 0:
        raise ValueError(
            f"ln_qkv: width {w} has no valid column chunking (needs a "
            f"128-multiple slab within the {_VMEM_WEIGHT_BUDGET >> 20} MB "
            f"VMEM weight budget; got nc={nc}) — gate callers on "
            "fits_fused_qkv or pass an explicit _nc")
    wc = w // nc
    # chunk dim outer, row tiles inner (see ln_qkv_int8): W=1536 streams
    # two [W, W/2] slabs per matrix; W≤1408 keeps the single-slab layout
    row_spec = pl.BlockSpec((tile, w), lambda j, i: (i, 0),
                            memory_space=pltpu.VMEM)
    ln_vec = pl.BlockSpec((1, w), lambda j, i: (0, 0),
                          memory_space=pltpu.VMEM)
    slab_vec = pl.BlockSpec((1, wc), lambda j, i: (0, j),
                            memory_space=pltpu.VMEM)
    slab_mat = pl.BlockSpec((w, wc), lambda j, i: (0, j),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((tile, wc), lambda j, i: (i, j),
                            memory_space=pltpu.VMEM)

    outs = pl.pallas_call(
        functools.partial(_kernel, eps=eps),
        out_shape=tuple(
            jax.ShapeDtypeStruct((rp, w), x.dtype) for _ in range(3)),
        grid=(nc, rp // tile),
        in_specs=[row_spec, ln_vec, ln_vec,
                  slab_mat, slab_vec, slab_mat, slab_vec,
                  slab_mat, slab_vec],
        out_specs=(out_spec, out_spec, out_spec),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=3 * 2 * rp * w * w,
            bytes_accessed=nc * rp * w * 2 + rp * w * 3 * 2 + 3 * w * w * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x2, g, b, weights[0], biases[0], weights[1], biases[1],
      weights[2], biases[2])
    return tuple(o[:rows].reshape(orig_shape) for o in outs)
