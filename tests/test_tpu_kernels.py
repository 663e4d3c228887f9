"""Real-TPU kernel A/B numerics — the Mosaic-lowering regression gate.

VERDICT.md (round 3, weak #5): the CPU suite runs every Pallas kernel in
interpret mode only, so a Mosaic lowering regression (like the round-2
erf gap, where the exact-gelu int8 MLP silently needed an in-kernel erf
polynomial) could only be caught by luck during benchmarking. This tier
pins the fused kernels' numerics against their unfused references ON THE
CHIP, as executable tests:

    CLIP_TPU_TESTS=1 python -m pytest tests/ -m tpu -q

The default suite excludes them (``addopts = -m "not tpu"``); the verify
drive runs them (.claude/skills/verify/SKILL.md). Never run this tier
concurrently with another TPU job (CLAUDE.md: the chip is shared).

Shapes are the production lane-aligned ones (SO400M W=1152 16x72,
erf-gelu MLP) at tiny batch — numerics gate, not a benchmark.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(
        jax.default_backend() != "tpu",
        reason="real-TPU kernel tier (set CLIP_TPU_TESTS=1 and run -m tpu)",
    ),
]


def _qkv_inputs(b=2, s=576, h=16, d=72, seed=0, dtype=jnp.bfloat16):
    rng = np.random.default_rng(seed)
    return tuple(
        jnp.asarray(rng.standard_normal((b, s, h * d)), dtype)
        for _ in range(3)
    )


def _attn_ref(q, k, v, num_heads, mask=None):
    """f32 XLA reference through attention_core in the packed layout."""
    from clip_embedder_tpu.ops.attention import attention_core

    b, s, hd = q.shape
    d = hd // num_heads

    def to4(x):
        return x.astype(jnp.float32).reshape(b, s, num_heads, d) \
            .transpose(0, 2, 1, 3)

    out = attention_core(to4(q), to4(k), to4(v), mask=mask, impl="xla")
    return np.asarray(out.transpose(0, 2, 1, 3).reshape(b, s, hd))


def _min_cos(a: np.ndarray, b: np.ndarray) -> float:
    a = a.reshape(-1, a.shape[-1]).astype(np.float64)
    b = b.reshape(-1, b.shape[-1]).astype(np.float64)
    a /= np.linalg.norm(a, axis=-1, keepdims=True)
    b /= np.linalg.norm(b, axis=-1, keepdims=True)
    return float(np.min(np.sum(a * b, axis=-1)))


@pytest.mark.parametrize(
    "flags,min_cos",
    [
        ({}, 1 - 1e-4),                                  # production default
        ({"mxu_denom": False}, 1 - 1e-4),
        ({"fast_softmax": True}, 1 - 1e-4),              # pallas_fast preset
        ({"exp_bf16": True}, 1 - 2e-3),
        ({"quant_qk": True}, 1 - 2e-3),
        ({"quant_qk": True, "exp_bf16": True}, 1 - 4e-3),
        ({"quant_pv": True}, 1 - 2e-3),                  # rejected, still built
    ],
)
def test_packed_attention_on_chip(flags, min_cos):
    from clip_embedder_tpu.ops.flash import flash_attention_packed

    q, k, v = _qkv_inputs()
    ref = _attn_ref(q, k, v, 16)
    got = np.asarray(
        flash_attention_packed(q, k, v, num_heads=16, **flags),
        np.float32)
    assert _min_cos(got, ref) > min_cos, flags


def test_packed_attention_rope_on_chip():
    """In-kernel rope (EVA02/PE path): single-lane rolls must lower."""
    from clip_embedder_tpu.ops.flash import flash_attention_packed
    from clip_embedder_tpu.ops.rope import apply_rope

    b, s, h, d = 2, 256, 16, 72
    q, k, v = _qkv_inputs(b=b, s=s, h=h, d=d, seed=1)
    rng = np.random.default_rng(2)
    ang = np.tile(rng.standard_normal((s, d)).astype(np.float32), (1, h))
    sin_t, cos_t = jnp.sin(jnp.asarray(ang)), jnp.cos(jnp.asarray(ang))
    got = np.asarray(
        flash_attention_packed(q, k, v, num_heads=h, rope=(sin_t, cos_t)),
        np.float32)
    qr = apply_rope(q.astype(jnp.float32), sin_t, cos_t).astype(q.dtype)
    kr = apply_rope(k.astype(jnp.float32), sin_t, cos_t).astype(k.dtype)
    ref = _attn_ref(qr, kr, v, h)
    assert _min_cos(got, ref) > 1 - 1e-4


def test_packed_attention_key_mask_on_chip():
    """Per-batch key-padding mask (the BERT text layout) on Mosaic."""
    from clip_embedder_tpu.ops.flash import flash_attention_packed

    b, s, h, d = 2, 64, 8, 64
    q, k, v = _qkv_inputs(b=b, s=s, h=h, d=d, seed=3)
    lengths = np.array([40, 64])
    mask = np.zeros((b, 1, 1, s), np.float32)
    for i, ln in enumerate(lengths):
        mask[i, :, :, ln:] = -np.inf
    m = jnp.asarray(mask)
    got = np.asarray(
        flash_attention_packed(q, k, v, num_heads=h, mask=m), np.float32)
    ref = _attn_ref(q, k, v, h, mask=m)
    assert _min_cos(got, ref) > 1 - 1e-4


def _quantize_linear(w, b):
    from clip_embedder_tpu.ops.quant import quantize_weight

    p = {k2: jnp.asarray(v) for k2, v in quantize_weight(w).items()}
    p["b"] = jnp.asarray(b)
    return p


@pytest.mark.parametrize("activation", ["gelu", "quick_gelu"])
def test_fused_int8_mlp_on_chip(activation):
    """The round-2 erf regression class: exact-gelu needs the in-kernel
    polynomial (Mosaic has no erf lowering)."""
    from clip_embedder_tpu.ops.int8_mlp import int8_mlp
    from clip_embedder_tpu.ops.layers import ACTIVATIONS
    from clip_embedder_tpu.ops.quant import int8_linear

    rng = np.random.default_rng(4)
    K, H = 1152, 4304  # SO400M MLP shape
    params = {
        "fc": _quantize_linear(
            (rng.standard_normal((K, H)) * 0.05).astype(np.float32),
            (rng.standard_normal(H) * 0.01).astype(np.float32)),
        "proj": _quantize_linear(
            (rng.standard_normal((H, K)) * 0.05).astype(np.float32),
            (rng.standard_normal(K) * 0.01).astype(np.float32)),
    }
    x = jnp.asarray(rng.standard_normal((2, 64, K)).astype(np.float32))
    act = ACTIVATIONS[activation]
    ref = np.asarray(
        int8_linear(params["proj"], act(int8_linear(params["fc"], x))))
    got = np.asarray(int8_mlp(params, x, activation=activation))
    # atol covers single int8 bin flips in the hidden-activation requant
    # (in-kernel act evaluates at slightly different precision than XLA's;
    # one flipped bin propagates ~|w_col|·amax_h/127 ≈ 0.008 at these
    # scales — measured 29/147k elements, max 0.0067, on a healthy chip).
    # The erf-regression class this test exists for shows up as a gross
    # mismatch: min_cos collapses well below the 1e-5 gate.
    np.testing.assert_allclose(got, ref, atol=0.01, err_msg=activation)
    assert _min_cos(got, ref) > 1 - 1e-5, activation


def test_streamed_int8_mlp_on_chip():
    """Weight-streamed fused MLP (PE-Core path): DMA-pipelined slabs."""
    from clip_embedder_tpu.ops.int8_mlp import int8_mlp_streamed
    from clip_embedder_tpu.ops.layers import ACTIVATIONS
    from clip_embedder_tpu.ops.quant import int8_linear

    rng = np.random.default_rng(5)
    K, H = 512, 2048
    params = {
        "fc": _quantize_linear(
            (rng.standard_normal((K, H)) * 0.05).astype(np.float32),
            (rng.standard_normal(H) * 0.01).astype(np.float32)),
        "proj": _quantize_linear(
            (rng.standard_normal((H, K)) * 0.05).astype(np.float32),
            (rng.standard_normal(K) * 0.01).astype(np.float32)),
    }
    x = jnp.asarray(rng.standard_normal((2, 64, K)).astype(np.float32))
    act = ACTIVATIONS["gelu"]
    ref = np.asarray(
        int8_linear(params["proj"], act(int8_linear(params["fc"], x))))
    got = np.asarray(int8_mlp_streamed(params, x, activation="gelu"))
    # the streamed kernel requants the hidden activations per slab — a
    # deliberately different (finer) quant granularity than the unfused
    # reference's global row scale (int8_mlp.py docstring), so elementwise
    # closeness is bin-flip-limited everywhere (measured min_cos 0.99984
    # on a healthy chip); the gate is directional agreement plus a bounded
    # worst element
    assert _min_cos(got, ref) > 1 - 5e-4
    np.testing.assert_allclose(got, ref, atol=0.15)


def test_ln_qkv_on_chip():
    """Fused LayerNorm+q/k/v (bf16 and int8 variants) vs unfused."""
    from clip_embedder_tpu.ops.layers import layer_norm, linear
    from clip_embedder_tpu.ops.qkv import ln_qkv, ln_qkv_int8
    from clip_embedder_tpu.ops.quant import int8_linear

    w = 1152
    rng = np.random.default_rng(6)
    params = {
        n: {"w": jnp.asarray(
                (rng.standard_normal((w, w)) * 0.05).astype(np.float32)),
            "b": jnp.asarray(
                (rng.standard_normal(w) * 0.01).astype(np.float32))}
        for n in "qkv"
    }
    pre_ln = {
        "scale": jnp.asarray(
            1 + (rng.standard_normal(w) * 0.1).astype(np.float32)),
        "bias": jnp.asarray(
            (rng.standard_normal(w) * 0.01).astype(np.float32)),
    }
    x = jnp.asarray(rng.standard_normal((2, 64, w)), jnp.bfloat16)
    pd = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    y = layer_norm(pre_ln, x, eps=1e-6)
    ref = [np.asarray(linear(pd[n], y), np.float32) for n in "qkv"]
    got = ln_qkv(pd, pre_ln, x, eps=1e-6)
    for r, o in zip(ref, got):
        assert _min_cos(np.asarray(o, np.float32), r) > 1 - 1e-3

    qparams = {
        n: _quantize_linear(np.asarray(params[n]["w"]),
                            np.asarray(params[n]["b"]))
        for n in "qkv"
    }
    ref_i = [np.asarray(int8_linear(qparams[n], y.astype(jnp.float32)),
                        np.float32) for n in "qkv"]
    got_i = ln_qkv_int8(qparams, pre_ln, x, eps=1e-6)
    for r, o in zip(ref_i, got_i):
        assert _min_cos(np.asarray(o, np.float32), r) > 1 - 2e-3


def test_int8_linear_fused_on_chip():
    from clip_embedder_tpu.ops.int8_mlp import int8_linear_fused
    from clip_embedder_tpu.ops.quant import int8_linear

    rng = np.random.default_rng(7)
    params = _quantize_linear(
        (rng.standard_normal((1152, 1152)) * 0.05).astype(np.float32),
        (rng.standard_normal(1152) * 0.01).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((128, 1152)).astype(np.float32))
    ref = np.asarray(int8_linear(params, x))
    got = np.asarray(int8_linear_fused(params, x))
    np.testing.assert_allclose(got, ref, atol=2e-3)


def test_preprocess_resize_on_chip():
    """The fused MXU matmul-resize on XLA:TPU vs the same math in f64 on
    host (the CPU suite proves PIL pixel-parity; this pins the TPU
    compilation of the two einsums)."""
    from clip_embedder_tpu.ops.preprocess import (
        preprocess_weights_for,
        resize_normalize,
    )

    rng = np.random.default_rng(8)
    h = w = 256
    img = rng.integers(0, 256, (2, h, w, 3), dtype=np.uint8)
    wh, ww = preprocess_weights_for(w, h, 224)
    mean = np.array([0.48, 0.46, 0.41], np.float32)
    std = np.array([0.27, 0.26, 0.28], np.float32)
    got = np.asarray(resize_normalize(
        jnp.asarray(img),
        jnp.asarray(np.broadcast_to(wh, (2,) + wh.shape)),
        jnp.asarray(np.broadcast_to(ww, (2,) + ww.shape)),
        jnp.asarray(mean), jnp.asarray(std), layout="nchw"), np.float32)
    x = img.astype(np.float64) / 255.0
    ref = np.einsum("bhwc,sh->bswc", x, wh.astype(np.float64))
    ref = np.einsum("bswc,tw->bsct", ref, ww.astype(np.float64))
    ref = np.transpose(ref, (0, 2, 1, 3))  # [B, C, S, T]
    ref = (ref - mean[None, :, None, None]) / std[None, :, None, None]
    np.testing.assert_allclose(got, ref, atol=5e-4)
