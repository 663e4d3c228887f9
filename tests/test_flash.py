"""A/B numerics: the fused Pallas attention kernel vs the XLA path
(the per-kernel landing gate of SURVEY.md §7 layer 7). Runs in interpreter
mode on the CPU backend; the same kernel compiles for TPU via Mosaic.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clip_embedder_tpu.ops.attention import attention_core, causal_mask
from clip_embedder_tpu.ops.flash import flash_attention


@pytest.mark.parametrize(
    "b,h,s,d",
    [
        (2, 4, 64, 32),    # text-tower-like, d needs padding to 128
        (1, 2, 77, 64),    # CLIP context length (odd, needs seq padding)
        (2, 2, 144, 72),   # SO400M-like head_dim 72
    ],
)
def test_flash_matches_xla(b, h, s, d):
    keys = jax.random.split(jax.random.key(0), 3)
    q = jax.random.normal(keys[0], (b, h, s, d), jnp.float32)
    k = jax.random.normal(keys[1], (b, h, s, d), jnp.float32)
    v = jax.random.normal(keys[2], (b, h, s, d), jnp.float32)

    ref = attention_core(q, k, v)
    got = flash_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


def test_flash_causal_matches_xla():
    b, h, s, d = 2, 4, 40, 32
    keys = jax.random.split(jax.random.key(1), 3)
    q = jax.random.normal(keys[0], (b, h, s, d), jnp.float32)
    k = jax.random.normal(keys[1], (b, h, s, d), jnp.float32)
    v = jax.random.normal(keys[2], (b, h, s, d), jnp.float32)
    mask = causal_mask(s)

    ref = attention_core(q, k, v, mask=mask)
    got = flash_attention(q, k, v, mask=mask, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


def test_flash_bf16():
    b, h, s, d = 2, 2, 64, 64
    keys = jax.random.split(jax.random.key(2), 3)
    q = jax.random.normal(keys[0], (b, h, s, d), jnp.bfloat16)
    k = jax.random.normal(keys[1], (b, h, s, d), jnp.bfloat16)
    v = jax.random.normal(keys[2], (b, h, s, d), jnp.bfloat16)

    ref = attention_core(q, k, v)
    got = flash_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        atol=2e-2, rtol=2e-2,
    )


def test_tower_with_pallas_attn_matches_xla_attn():
    """Whole-tower A/B: attn_impl='pallas' vs 'xla'."""
    from clip_embedder_tpu.models import vit
    from clip_embedder_tpu.models.vit import ViTCfg
    from clip_embedder_tpu.ops import flash as flash_mod
    import functools

    # route the tower's pallas path through interpreter mode on CPU
    orig = flash_mod.flash_attention
    flash_mod.flash_attention = functools.partial(orig, interpret=True)
    try:
        cfg = ViTCfg(image_size=32, patch_size=8, width=64, layers=2,
                     heads=4, mlp_hidden=128, embed_dim=32)
        params = vit.init(jax.random.key(3), cfg)
        x = jax.random.uniform(jax.random.key(4), (2, 32, 32, 3))
        a = vit.apply(params, x, cfg, attn_impl="xla")
        b = vit.apply(params, x, cfg, attn_impl="pallas")
        cos = np.sum(np.asarray(a) * np.asarray(b), axis=-1)
        assert (cos > 1 - 1e-6).all()
    finally:
        flash_mod.flash_attention = orig


@pytest.mark.parametrize("d", [72, 128])
def test_flash_fast_softmax_matches_exact(d):
    """fast_softmax (clamped exp, no max pass) must match the exact-max
    softmax for realistic logit magnitudes, for both the spare-lane (d=72)
    and row-sum-fallback (d=128) denominators."""
    k1, k2, k3 = jax.random.split(jax.random.key(0), 3)
    q = jax.random.normal(k1, (2, 3, 40, d))
    k = jax.random.normal(k2, (2, 3, 40, d))
    v = jax.random.normal(k3, (2, 3, 40, d))
    exact = flash_attention(q, k, v, interpret=True)
    fast = flash_attention(q, k, v, fast_softmax=True, interpret=True)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(exact),
                               atol=2e-6)
    ref = attention_core(q, k, v)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref), atol=2e-5)


def test_flash_exact_lane_multiple_head_dim():
    """d an exact lane multiple (no spare lane): denominator falls back to
    the explicit row-sum; numerics must still match the XLA core."""
    k1, k2, k3 = jax.random.split(jax.random.key(1), 3)
    q = jax.random.normal(k1, (1, 2, 16, 128))
    k = jax.random.normal(k2, (1, 2, 16, 128))
    v = jax.random.normal(k3, (1, 2, 16, 128))
    out = flash_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(attention_core(q, k, v)),
                               atol=2e-5)


# ---- packed-layout kernel (v3) ----------------------------------------


def _packed_ref(q, k, v, h, mask=None):
    from einops import rearrange

    out = attention_core(
        *(rearrange(t, "b s (h d) -> b h s d", h=h) for t in (q, k, v)),
        mask=mask)
    return rearrange(out, "b h s d -> b s (h d)")


@pytest.mark.parametrize(
    "b,h,s,d",
    [
        (2, 16, 61, 72),   # SO400M-like: group of 16 heads, odd seq
        (2, 8, 64, 64),    # one 128-lane pair per group (g=2)
        (1, 16, 33, 8),    # g=16, tiny head dim
    ],
)
@pytest.mark.parametrize("fast", [False, True])
def test_flash_packed_matches_xla(b, h, s, d, fast):
    from clip_embedder_tpu.ops.flash import flash_attention_packed

    keys = jax.random.split(jax.random.key(5), 3)
    q = jax.random.normal(keys[0], (b, s, h * d), jnp.float32)
    k = jax.random.normal(keys[1], (b, s, h * d), jnp.float32)
    v = jax.random.normal(keys[2], (b, s, h * d), jnp.float32)
    got = flash_attention_packed(q, k, v, num_heads=h, fast_softmax=fast,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(_packed_ref(q, k, v, h)),
                               atol=2e-5, rtol=1e-5)


def test_flash_packed_causal():
    from clip_embedder_tpu.ops.flash import flash_attention_packed

    b, h, s, d = 2, 8, 77, 64
    keys = jax.random.split(jax.random.key(6), 3)
    q = jax.random.normal(keys[0], (b, s, h * d), jnp.float32)
    k = jax.random.normal(keys[1], (b, s, h * d), jnp.float32)
    v = jax.random.normal(keys[2], (b, s, h * d), jnp.float32)
    mask = causal_mask(s)
    got = flash_attention_packed(q, k, v, num_heads=h, mask=mask,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(_packed_ref(q, k, v, h, mask)),
                               atol=2e-5, rtol=1e-5)


def test_flash_packed_bf16():
    from clip_embedder_tpu.ops.flash import flash_attention_packed

    b, h, s, d = 2, 16, 32, 72
    keys = jax.random.split(jax.random.key(7), 3)
    q = jax.random.normal(keys[0], (b, s, h * d), jnp.bfloat16)
    k = jax.random.normal(keys[1], (b, s, h * d), jnp.bfloat16)
    v = jax.random.normal(keys[2], (b, s, h * d), jnp.bfloat16)
    got = flash_attention_packed(q, k, v, num_heads=h, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32),
        np.asarray(_packed_ref(q, k, v, h), np.float32),
        atol=2e-2, rtol=2e-2)


def test_head_group_selection():
    from clip_embedder_tpu.ops.flash import _head_group

    assert _head_group(16, 72) == 16   # SO400M: only the full group works
    assert _head_group(8, 64) == 2     # 2·64 = 128
    assert _head_group(16, 80) == 8    # ViT-H: 8·80 = 640
    assert _head_group(12, 64) == 2    # ViT-B text
    assert _head_group(3, 72) is None  # no group reaches a lane multiple


def test_ln_qkv_matches_unfused():
    """Fused LayerNorm+qkv kernel vs layer_norm + three linears."""
    from clip_embedder_tpu.ops.layers import layer_norm, linear
    from clip_embedder_tpu.ops.qkv import ln_qkv

    w = 256
    keys = jax.random.split(jax.random.key(8), 8)
    params = {
        n: {"w": jax.random.normal(keys[i], (w, w)) * 0.05,
            "b": jax.random.normal(keys[i + 3], (w,)) * 0.01}
        for i, n in enumerate("qkv")
    }
    pre_ln = {"scale": 1 + jax.random.normal(keys[6], (w,)) * 0.1,
              "bias": jax.random.normal(keys[7], (w,)) * 0.01}
    for dt in (jnp.float32, jnp.bfloat16):
        x = jax.random.normal(keys[0], (2, 61, w), dt)
        pd = jax.tree.map(lambda a: a.astype(dt), params)
        y = layer_norm(pre_ln, x, eps=1e-6)
        ref = [linear(pd[n], y) for n in "qkv"]
        got = ln_qkv(pd, pre_ln, x, eps=1e-6, interpret=True)
        for r, o in zip(ref, got):
            np.testing.assert_allclose(
                np.asarray(o, np.float32), np.asarray(r, np.float32),
                atol=(1e-6 if dt == jnp.float32 else 0.0))


def test_tower_packed_kernel_matches_xla():
    """Whole-tower A/B through the packed path (128-multiple width)."""
    import functools

    from clip_embedder_tpu.models import vit
    from clip_embedder_tpu.models.vit import ViTCfg
    from clip_embedder_tpu.ops import flash as flash_mod

    orig = flash_mod.flash_attention_packed
    flash_mod.flash_attention_packed = functools.partial(orig, interpret=True)
    try:
        cfg = ViTCfg(image_size=32, patch_size=8, width=128, layers=2,
                     heads=2, mlp_hidden=256, embed_dim=64)
        params = vit.init(jax.random.key(9), cfg)
        x = jax.random.uniform(jax.random.key(10), (2, 32, 32, 3))
        a = vit.apply(params, x, cfg, attn_impl="xla")
        b = vit.apply(params, x, cfg, attn_impl="pallas")
        cos = np.sum(np.asarray(a) * np.asarray(b), axis=-1)
        assert (cos > 1 - 1e-6).all()
    finally:
        flash_mod.flash_attention_packed = orig


def test_flash_packed_per_batch_key_mask():
    """[B,1,1,S] key-padding masks (the BERT text layout) in the packed
    kernel must match the XLA core."""
    from clip_embedder_tpu.ops.flash import flash_attention_packed

    b, h, s, d = 3, 8, 40, 64
    keys = jax.random.split(jax.random.key(11), 3)
    q = jax.random.normal(keys[0], (b, s, h * d), jnp.float32)
    k = jax.random.normal(keys[1], (b, s, h * d), jnp.float32)
    v = jax.random.normal(keys[2], (b, s, h * d), jnp.float32)
    lengths = jnp.asarray([40, 17, 5])
    valid = (jnp.arange(s)[None, :] < lengths[:, None])
    mask = jnp.where(valid, 0.0, -1e30)[:, None, None, :]
    got = flash_attention_packed(q, k, v, num_heads=h, mask=mask,
                                 interpret=True)
    ref = _packed_ref(q, k, v, h, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


def test_flash_per_head_per_batch_mask_falls_back():
    """The legacy per-head kernel keeps one shared [S,S] mask; a per-batch
    [B,1,1,S] mask must take the XLA fallback, not crash (caught by the
    TPU verify drive on the packed-ineligible golden BERT fixture)."""
    from clip_embedder_tpu.ops.flash import flash_attention

    b, h, s, d = 3, 4, 12, 16  # h*d=64: packed-ineligible shape
    keys = jax.random.split(jax.random.key(13), 3)
    q = jax.random.normal(keys[0], (b, h, s, d), jnp.float32)
    k = jax.random.normal(keys[1], (b, h, s, d), jnp.float32)
    v = jax.random.normal(keys[2], (b, h, s, d), jnp.float32)
    lengths = jnp.asarray([12, 7, 2])
    valid = (jnp.arange(s)[None, :] < lengths[:, None])
    mask = jnp.where(valid, 0.0, -1e30)[:, None, None, :]
    got = flash_attention(q, k, v, mask=mask, interpret=True)
    ref = attention_core(q, k, v, mask=mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


def test_hf_bert_pallas_matches_xla():
    """BERT text tower end-to-end with attn_impl='pallas' (per-batch
    key-padding mask through the packed kernel)."""
    import functools

    from clip_embedder_tpu.models import hf_text
    from clip_embedder_tpu.models.hf_text import BertCfg
    from clip_embedder_tpu.ops import flash as flash_mod

    orig = flash_mod.flash_attention_packed
    flash_mod.flash_attention_packed = functools.partial(orig, interpret=True)
    try:
        cfg = BertCfg(context_length=8, vocab_size=64, width=128,
                      heads=2, layers=2, mlp_hidden=256, embed_dim=64,
                      pad_id=0)
        params = hf_text.init(jax.random.key(12), cfg)
        ids = jnp.asarray([[2, 5, 9, 11, 3, 0, 0, 0],
                           [2, 7, 3, 0, 0, 0, 0, 0]], jnp.int32)
        a = hf_text.apply(params, ids, cfg, attn_impl="xla")
        b = hf_text.apply(params, ids, cfg, attn_impl="pallas")
        cos = np.sum(np.asarray(a) * np.asarray(b), axis=-1)
        assert (cos > 1 - 1e-6).all()
    finally:
        flash_mod.flash_attention_packed = orig


def test_packed_per_batch_full_mask():
    """A per-batch full [B,1,S,S] mask (CoCa text's causal+cls layout) is
    streamed one [S,S] block per batch grid index and must match the XLA
    core."""
    from clip_embedder_tpu.ops.attention import attention_core
    from clip_embedder_tpu.ops.flash import flash_attention_packed

    b, h, s, d = 3, 2, 8, 64
    keys = jax.random.split(jax.random.key(9), 4)
    q, k, v = (jax.random.normal(kk, (b, s, h * d), jnp.float32)
               for kk in keys[:3])
    # distinct per-batch masks: causal plus a random blocked key per batch
    mask = jnp.triu(jnp.full((s, s), -jnp.inf), k=1)[None, None]
    mask = jnp.tile(mask, (b, 1, 1, 1))
    for i in range(b):
        mask = mask.at[i, 0, s - 1, i].set(-jnp.inf)
    got = flash_attention_packed(q, k, v, num_heads=h, mask=mask,
                                 interpret=True)
    ref = attention_core(
        q.reshape(b, s, h, d).transpose(0, 2, 1, 3),
        k.reshape(b, s, h, d).transpose(0, 2, 1, 3),
        v.reshape(b, s, h, d).transpose(0, 2, 1, 3),
        mask=mask, impl="xla",
    ).transpose(0, 2, 1, 3).reshape(b, s, h * d)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_packed_rejects_per_head_mask_with_clear_error():
    """A per-head [B,H,S,S] mask is not a supported packed-kernel layout; it
    must fail with the shape in the message, not an opaque broadcast error
    from inside jnp.broadcast_to (advisor finding)."""
    from clip_embedder_tpu.ops.flash import flash_attention_packed

    b, h, s, d = 2, 2, 8, 64
    keys = jax.random.split(jax.random.key(9), 3)
    q, k, v = (jax.random.normal(kk, (b, s, h * d), jnp.float32)
               for kk in keys)
    mask = jnp.zeros((b, h, s, s), jnp.float32)
    with pytest.raises(ValueError, match="unsupported mask shape"):
        flash_attention_packed(q, k, v, num_heads=h, mask=mask,
                               interpret=True)


def test_packed_rejects_wrong_width_key_mask():
    """A [B,1,1,S_mask] key-padding mask whose S_mask != S must raise, not
    silently truncate to the first S columns (review finding)."""
    from clip_embedder_tpu.ops.flash import flash_attention_packed

    b, h, s, d = 2, 2, 8, 64
    keys = jax.random.split(jax.random.key(10), 3)
    q, k, v = (jax.random.normal(kk, (b, s, h * d), jnp.float32)
               for kk in keys)
    mask = jnp.zeros((b, 1, 1, s + 8), jnp.float32)
    with pytest.raises(ValueError, match="unsupported mask shape"):
        flash_attention_packed(q, k, v, num_heads=h, mask=mask,
                               interpret=True)


def test_packed_rejects_mismatched_kv():
    """k/v shaped differently from q would be silently truncated by the
    shared block spec; the kernel must refuse them (review finding)."""
    from clip_embedder_tpu.ops.flash import flash_attention_packed

    b, h, s, d = 2, 2, 8, 64
    keys = jax.random.split(jax.random.key(11), 3)
    q = jax.random.normal(keys[0], (b, s, h * d), jnp.float32)
    k = jax.random.normal(keys[1], (b, s + 8, h * d), jnp.float32)
    v = jax.random.normal(keys[2], (b, s + 8, h * d), jnp.float32)
    with pytest.raises(ValueError, match="one shape"):
        flash_attention_packed(q, k, v, num_heads=h, interpret=True)


def test_flash_cross_attention_falls_back_to_xla():
    """flash_attention with Sq != Sk (a pooling-head cross-attention) must
    return the XLA-core result instead of dying in the k reshape
    (review finding)."""
    from clip_embedder_tpu.ops.attention import attention_core
    from clip_embedder_tpu.ops.flash import flash_attention

    b, h, sq, sk, d = 2, 4, 1, 16, 32
    keys = jax.random.split(jax.random.key(12), 3)
    q = jax.random.normal(keys[0], (b, h, sq, d), jnp.float32)
    k = jax.random.normal(keys[1], (b, h, sk, d), jnp.float32)
    v = jax.random.normal(keys[2], (b, h, sk, d), jnp.float32)
    got = flash_attention(q, k, v, interpret=True)
    expect = attention_core(q, k, v, impl="xla")
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               atol=1e-6)


def test_select_platform_strict():
    """strict=True raises DeviceError when no preference initializes — the
    error_on_failure analog (reference: examples/debug_local.rs:57) — and
    the entry platform pin survives the failed sweep."""
    from clip_embedder_tpu.errors import DeviceError
    from clip_embedder_tpu.parallel.mesh import select_platform

    prev = jax.config.jax_platforms
    try:
        with pytest.raises(DeviceError, match="strict"):
            select_platform(["no_such_platform"], strict=True)
        assert jax.config.jax_platforms == prev  # pin restored
        # a later preference that works still satisfies strict mode
        assert select_platform(["no_such_platform", "cpu"],
                               strict=True) == "cpu"
    finally:
        jax.config.update("jax_platforms", prev)


def test_pick_chunks_budget():
    """Chunk selection: W≤1408 bf16 single slab, W=1536 bf16 two slabs
    (14.2 MB full set > 12 MB budget), int8 single slab through W=2048
    (exactly 12 MB), non-lane-aligned widths rejected."""
    from clip_embedder_tpu.ops.qkv import _pick_chunks

    assert _pick_chunks(1152, 2) == 1   # SO400M
    assert _pick_chunks(1280, 2) == 1   # ViT-H
    assert _pick_chunks(1536, 2) == 2   # gopt: chunked fused path
    assert _pick_chunks(1536, 1) == 1   # gopt int8: 7.1 MB fits whole
    assert _pick_chunks(2048, 1) == 1   # 3·2048² = exactly the budget
    assert _pick_chunks(2304, 1) == 2
    assert _pick_chunks(96, 2) is None  # not lane aligned


def test_ln_qkv_chunked_matches_unfused():
    """W=1536 (gopt width) rides the chunked fused kernel — two [W, W/2]
    weight slabs per matrix streamed over the grid — and must match
    layer_norm + three linears exactly (same f32 accumulation; the LN is
    recomputed per chunk with identical inputs)."""
    from clip_embedder_tpu.ops.layers import layer_norm, linear
    from clip_embedder_tpu.ops.qkv import _pick_chunks, ln_qkv

    w = 1536
    assert _pick_chunks(w, 2) == 2
    keys = jax.random.split(jax.random.key(11), 8)
    params = {
        n: {"w": (jax.random.normal(keys[i], (w, w)) * 0.05).astype(
               jnp.bfloat16),
            "b": (jax.random.normal(keys[i + 3], (w,)) * 0.01).astype(
               jnp.bfloat16)}
        for i, n in enumerate("qkv")
    }
    pre_ln = {"scale": 1 + jax.random.normal(keys[6], (w,)) * 0.1,
              "bias": jax.random.normal(keys[7], (w,)) * 0.01}
    x = jax.random.normal(keys[0], (1, 9, w), jnp.bfloat16)
    y = layer_norm(pre_ln, x, eps=1e-6)
    ref = [linear(params[n], y) for n in "qkv"]
    got = ln_qkv(params, pre_ln, x, eps=1e-6, interpret=True)
    for r, o in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(o, np.float32),
                                      np.asarray(r, np.float32))


def test_packed_quant_pv_close_to_exact():
    """int8 p·v variant (the last bf16 matmuls under int8_all): per-row
    quantized softmax weights × per-column quantized v must stay within
    int8 noise of the exact kernel (denominator stays f32)."""
    from clip_embedder_tpu.ops.flash import flash_attention_packed

    b, h, s, d = 2, 2, 64, 64
    keys = jax.random.split(jax.random.key(21), 3)
    q, k, v = (jax.random.normal(kk, (b, s, h * d), jnp.float32)
               for kk in keys)
    exact = flash_attention_packed(q, k, v, num_heads=h, interpret=True)
    quant = flash_attention_packed(q, k, v, num_heads=h, interpret=True,
                                   quant_pv=True)
    e = np.asarray(exact, np.float32).reshape(-1, d)
    g = np.asarray(quant, np.float32).reshape(-1, d)
    cos = (e * g).sum(-1) / (np.linalg.norm(e, axis=-1)
                             * np.linalg.norm(g, axis=-1) + 1e-9)
    # random-normal inputs are the worst case (near-uniform softmax rows
    # quantize coarsest); ~1e-4 cosine is the int8 noise level
    assert (cos > 1 - 5e-4).all()
    np.testing.assert_allclose(g, e, atol=0.1)


@pytest.mark.parametrize(
    "flags,min_cos,atol",
    [
        ({"quant_qk": True}, 1 - 2e-3, 0.08),
        ({"exp_bf16": True}, 1 - 1e-3, 0.02),
        ({"quant_qk": True, "exp_bf16": True}, 1 - 3e-3, 0.08),
        ({"quant_qk": True, "fast_softmax": True}, 1 - 2e-3, 0.08),
    ],
)
def test_packed_quant_qk_and_exp_bf16_close_to_exact(flags, min_cos, atol):
    """Round-4 VPU-floor variants: int8 q·kᵀ (per-row q / per-head k quant,
    int32 row max) and the bf16 softmax-weight pipeline must stay within
    their quantization noise of the exact kernel, with and without a
    mask (the mask path dequantizes to f32 logits before the add)."""
    from clip_embedder_tpu.ops.attention import causal_mask
    from clip_embedder_tpu.ops.flash import flash_attention_packed

    b, h, s, d = 2, 2, 64, 64
    keys = jax.random.split(jax.random.key(23), 3)
    q, k, v = (jax.random.normal(kk, (b, s, h * d), jnp.float32)
               for kk in keys)
    for mask in (None, causal_mask(s)):
        exact = flash_attention_packed(q, k, v, num_heads=h, mask=mask,
                                       interpret=True)
        got = flash_attention_packed(q, k, v, num_heads=h, mask=mask,
                                     interpret=True, **flags)
        e = np.asarray(exact, np.float32).reshape(-1, d)
        g = np.asarray(got, np.float32).reshape(-1, d)
        cos = (e * g).sum(-1) / (np.linalg.norm(e, axis=-1)
                                 * np.linalg.norm(g, axis=-1) + 1e-9)
        assert (cos > min_cos).all(), (flags, mask is not None)
        np.testing.assert_allclose(g, e, atol=atol)


def test_ln_qkv_rejects_unchunkable_width():
    """A direct ln_qkv call on a width with no valid VMEM chunking must
    raise a descriptive error, not a TypeError from nc=None arithmetic
    (production callers gate on fits_fused_qkv; the benchmark-sweep entry
    point does not)."""
    from clip_embedder_tpu.ops.qkv import ln_qkv

    w = 4160  # no 128-multiple slab of 3*w*w/nc fits the VMEM budget
    params = {
        name: {"w": jnp.zeros((w, w), jnp.float32)} for name in ("q", "k", "v")
    }
    pre_ln = {"scale": jnp.ones((w,)), "bias": jnp.zeros((w,))}
    with pytest.raises(ValueError, match="no valid column chunking"):
        ln_qkv(params, pre_ln, jnp.zeros((2, 4, w)), interpret=True)


def test_packed_in_kernel_rope_matches_outside_apply():
    """rope=(sin, cos) applied inside the packed kernel matches
    ops.rope.apply_rope on the tensors outside (same f32 math; differences
    limited to fma-contraction rounding across the two compilations), and
    rejects mask+rope combinations."""
    from clip_embedder_tpu.ops.flash import flash_attention_packed
    from clip_embedder_tpu.ops.rope import apply_rope

    b, h, s, d = 2, 4, 9, 32  # h*d = 128 (one lane group)
    keys = jax.random.split(jax.random.key(11), 3)
    q, k, v = (jax.random.normal(kk, (b, s, h * d), jnp.float32)
               for kk in keys)
    rng = np.random.default_rng(12)
    ang = np.tile(rng.standard_normal((s, d)).astype(np.float32), (1, h))
    sin, cos = jnp.sin(jnp.asarray(ang)), jnp.cos(jnp.asarray(ang))

    inside = flash_attention_packed(q, k, v, num_heads=h, rope=(sin, cos),
                                    interpret=True)
    outside = flash_attention_packed(
        apply_rope(q, sin, cos), apply_rope(k, sin, cos), v, num_heads=h,
        interpret=True)
    np.testing.assert_allclose(np.asarray(inside), np.asarray(outside),
                               atol=1e-5, rtol=1e-5)

    with pytest.raises(ValueError, match="rope with a mask"):
        flash_attention_packed(
            q, k, v, num_heads=h, rope=(sin, cos),
            mask=jnp.zeros((s, s)), interpret=True)
    with pytest.raises(ValueError, match="rope tables"):
        flash_attention_packed(q, k, v, num_heads=h,
                               rope=(sin[:-1], cos), interpret=True)


@pytest.mark.parametrize(
    "b,h,s,d",
    [
        (2, 16, 61, 72),   # SO400M-like
        (1, 16, 65, 96),   # PE-Core-bigG head dim (g=4)
        (2, 8, 64, 64),    # g=2
    ],
)
@pytest.mark.parametrize("fast", [False, True])
def test_flash_packed_mxu_denom_matches(b, h, s, d, fast):
    """The MXU-denominator variant (softmax row sums emitted by the p·v
    matmul via a ones lane appended to each head's v slab) must match the
    explicit-sum kernel and the XLA core; in f32 the ones-lane sum is the
    same f32 accumulation, so the match is tight."""
    from clip_embedder_tpu.ops.flash import flash_attention_packed

    keys = jax.random.split(jax.random.key(11), 3)
    q = jax.random.normal(keys[0], (b, s, h * d), jnp.float32)
    k = jax.random.normal(keys[1], (b, s, h * d), jnp.float32)
    v = jax.random.normal(keys[2], (b, s, h * d), jnp.float32)
    got = flash_attention_packed(q, k, v, num_heads=h, fast_softmax=fast,
                                 mxu_denom=True, interpret=True)
    base = flash_attention_packed(q, k, v, num_heads=h, fast_softmax=fast,
                                  interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(base),
                               atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(_packed_ref(q, k, v, h)),
                               atol=2e-5, rtol=1e-5)


def test_flash_packed_mxu_denom_with_mask_and_rope():
    """mxu_denom composes with the mask branch (text towers) and with
    in-kernel rope (PE-Core/EVA02 vision)."""
    from clip_embedder_tpu.ops.flash import flash_attention_packed
    from clip_embedder_tpu.ops.rope import apply_rope

    b, h, s, d = 2, 8, 77, 64
    keys = jax.random.split(jax.random.key(12), 3)
    q = jax.random.normal(keys[0], (b, s, h * d), jnp.float32)
    k = jax.random.normal(keys[1], (b, s, h * d), jnp.float32)
    v = jax.random.normal(keys[2], (b, s, h * d), jnp.float32)
    mask = causal_mask(s)
    got = flash_attention_packed(q, k, v, num_heads=h, mask=mask,
                                 mxu_denom=True, interpret=True)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(_packed_ref(q, k, v, h, mask)),
                               atol=2e-5, rtol=1e-5)

    rng = np.random.default_rng(13)
    ang = np.tile(rng.standard_normal((s, d)).astype(np.float32), (1, h))
    sin, cos = jnp.sin(jnp.asarray(ang)), jnp.cos(jnp.asarray(ang))
    inside = flash_attention_packed(q, k, v, num_heads=h, rope=(sin, cos),
                                    mxu_denom=True, interpret=True)
    outside = flash_attention_packed(
        apply_rope(q, sin, cos), apply_rope(k, sin, cos), v, num_heads=h,
        interpret=True)
    np.testing.assert_allclose(np.asarray(inside), np.asarray(outside),
                               atol=1e-5, rtol=1e-5)
