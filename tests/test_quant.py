"""Opt-in int8 (W8A8) quantization: numerics within the documented budget
and end-to-end through the public API."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clip_embedder_tpu.models import vit
from clip_embedder_tpu.models.vit import ViTCfg
from clip_embedder_tpu.ops.quant import int8_linear, quantize_tree, quantize_weight


def test_quantize_weight_roundtrip():
    rng = np.random.default_rng(0)
    w = rng.standard_normal((64, 32)).astype(np.float32)
    q = quantize_weight(w)
    assert q["w_q"].dtype == np.int8
    deq = q["w_q"].astype(np.float32) * q["w_scale"]
    rel = np.abs(deq - w).max() / np.abs(w).max()
    assert rel < 0.01  # per-channel int8: <1% worst-case weight error


def test_int8_linear_close_to_float():
    rng = np.random.default_rng(1)
    w = rng.standard_normal((64, 48)).astype(np.float32) * 0.1
    b = rng.standard_normal(48).astype(np.float32) * 0.01
    x = jnp.asarray(rng.standard_normal((4, 10, 64)), jnp.float32)

    from clip_embedder_tpu.ops.layers import linear

    ref = linear({"w": jnp.asarray(w), "b": jnp.asarray(b)}, x)
    qp = quantize_weight(w)
    got = int8_linear(
        {"w_q": jnp.asarray(qp["w_q"]), "w_scale": jnp.asarray(qp["w_scale"]),
         "b": jnp.asarray(b)}, x)
    err = np.abs(np.asarray(got) - np.asarray(ref)).max()
    scale = np.abs(np.asarray(ref)).max()
    assert err / scale < 0.03


def test_quantized_tower_cosine_budget():
    """Full tower with int8 MLPs: embeddings within the documented
    ~1e-3-cosine opt-in budget of the float tower."""
    cfg = ViTCfg(image_size=32, patch_size=8, width=64, layers=3, heads=4,
                 mlp_hidden=256, embed_dim=48)
    params = vit.init(jax.random.key(0), cfg)
    x = jax.random.uniform(jax.random.key(1), (3, 32, 32, 3))
    ref = np.asarray(vit.apply(params, x, cfg))

    qparams = quantize_tree(jax.tree.map(np.asarray, params))
    # mlp weights converted, attention untouched
    assert "w_q" in qparams["blocks"]["mlp"]["fc"]
    assert "w" in qparams["blocks"]["attn"]["q"]
    got = np.asarray(vit.apply(
        jax.tree.map(jnp.asarray, qparams), x, cfg))
    cos = (got * ref).sum(-1)
    assert (cos > 1 - 5e-3).all()


def test_quantized_embedder_end_to_end():
    from clip_embedder_tpu import Clip, VisionEmbedder
    from test_concurrency import make_model_dir

    d = make_model_dir()
    vision = VisionEmbedder.from_local_dir(d, quantize="int8")
    assert vision.quantize == "int8"
    rng = np.random.default_rng(2)
    img = rng.integers(0, 255, (40, 40, 3), dtype=np.uint8)
    emb_q = vision.embed_image(img)
    np.testing.assert_allclose(np.linalg.norm(emb_q), 1.0, atol=1e-4)

    emb_f = VisionEmbedder.from_local_dir(d).embed_image(img)
    assert float(emb_q @ emb_f) > 1 - 5e-3

    dup = vision.duplicate()
    np.testing.assert_allclose(dup.embed_image(img), emb_q, atol=1e-6)


def test_unknown_quantize_mode_raises():
    from clip_embedder_tpu import VisionEmbedder
    from clip_embedder_tpu.errors import ConfigError
    from test_concurrency import make_model_dir

    with pytest.raises(ConfigError):
        VisionEmbedder.from_local_dir(make_model_dir(), quantize="fp4")


def test_clip_quantize_passthrough():
    """quantize='int8' flows through Clip.from_local_dir to both towers."""
    from clip_embedder_tpu import Clip
    from test_concurrency import make_model_dir

    clip = Clip.from_local_dir(make_model_dir(), quantize="int8")
    assert clip.vision.quantize == "int8"
    assert clip.text.quantize == "int8"
    rng = np.random.default_rng(5)
    img = rng.integers(0, 255, (40, 40, 3), dtype=np.uint8)
    results = clip.classify(img, ["a cat", "a dog"])
    assert abs(sum(p for _, p in results) - 1.0) < 1e-5


def test_no_quantizable_layers_raises_for_both_towers():
    """Shared contract: quantize='int8' on a params tree with no matmul
    layers raises for vision AND text (round-1 had a silent text no-op)."""
    from clip_embedder_tpu.errors import ConfigError
    from clip_embedder_tpu.ops.quant import quantize_tree_checked

    no_matmul = {"stem": {"conv": {"w": np.zeros((3, 3, 3, 8), np.float32)}}}
    for family in ("fastvit", "hf_bert"):
        with pytest.raises(ConfigError, match="no quantizable"):
            quantize_tree_checked(no_matmul, family)


def test_bucket_size_bounded_program_set():
    """Any source size maps onto a 128-multiple bucket — including >4096px
    giants (round-1 returned exact sizes there, one program per image)."""
    from clip_embedder_tpu.ops.preprocess import bucket_size

    rng = np.random.default_rng(0)
    for n in [1, 127, 128, 129, 4096, 4097, 5000, 9999,
              *rng.integers(1, 20000, 200).tolist()]:
        b = bucket_size(int(n))
        assert b % 128 == 0 and b >= n and b - n < 128 + 1


def test_attn_impl_rejected_for_unsupported_family():
    """attn_impl='pallas' on a family whose forward ignores it must raise,
    not silently run the XLA path (ADVICE round 1)."""
    from clip_embedder_tpu.errors import ConfigError
    from clip_embedder_tpu.vision import check_attn_impl

    check_attn_impl("vit", "pallas")
    check_attn_impl("fastvit", "xla")
    check_attn_impl("hf_bert", "pallas")  # supported since the packed kernel
    with pytest.raises(ConfigError, match="attn_impl"):
        check_attn_impl("fastvit", "pallas")


def test_fused_int8_mlp_matches_unfused():
    """The fused W8A8 Pallas MLP kernel (interpret mode) must match the
    unfused int8_linear→act→int8_linear path bit-near-exactly, for every
    supported in-kernel activation."""
    import jax.numpy as jnp

    from clip_embedder_tpu.ops.int8_mlp import int8_mlp
    from clip_embedder_tpu.ops.layers import ACTIVATIONS
    from clip_embedder_tpu.ops.quant import int8_linear, quantize_weight

    rng = np.random.default_rng(3)
    K, H = 256, 384
    w1 = (rng.standard_normal((K, H)) * 0.05).astype(np.float32)
    w2 = (rng.standard_normal((H, K)) * 0.05).astype(np.float32)
    b1 = (rng.standard_normal(H) * 0.01).astype(np.float32)
    b2 = (rng.standard_normal(K) * 0.01).astype(np.float32)
    params = {
        "fc": {**{k: jnp.asarray(v) for k, v in quantize_weight(w1).items()},
               "b": jnp.asarray(b1)},
        "proj": {**{k: jnp.asarray(v) for k, v in quantize_weight(w2).items()},
                 "b": jnp.asarray(b2)},
    }
    x = jnp.asarray(rng.standard_normal((2, 50, K)).astype(np.float32))
    for name, act in ACTIVATIONS.items():
        ref = int8_linear(params["proj"], act(int8_linear(params["fc"], x)))
        got = int8_mlp(params, x, activation=name, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5, err_msg=name)


def test_fused_int8_linear_matches_unfused():
    """int8_linear_fused (interpret) ≡ the unfused int8_linear."""
    import jax.numpy as jnp

    from clip_embedder_tpu.ops.int8_mlp import int8_linear_fused
    from clip_embedder_tpu.ops.quant import int8_linear, quantize_weight

    rng = np.random.default_rng(4)
    w = (rng.standard_normal((256, 192)) * 0.05).astype(np.float32)
    b = (rng.standard_normal(192) * 0.01).astype(np.float32)
    params = {**{k: jnp.asarray(v) for k, v in quantize_weight(w).items()},
              "b": jnp.asarray(b)}
    x = jnp.asarray(rng.standard_normal((150, 256)).astype(np.float32))
    ref = int8_linear(params, x)
    got = int8_linear_fused(params, x, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_int8_all_mode_quantizes_attention():
    """quantize='int8_all' must quantize the attention projections too and
    stay within a ~2e-3 cosine budget of the float tower."""
    import jax
    import jax.numpy as jnp

    from clip_embedder_tpu.models import vit
    from clip_embedder_tpu.models.vit import ViTCfg
    from clip_embedder_tpu.ops.quant import quantize_tree_checked

    cfg = ViTCfg(image_size=32, patch_size=8, width=64, layers=2, heads=4,
                 mlp_hidden=128, embed_dim=32)
    params = vit.init(jax.random.key(0), cfg)
    qparams = quantize_tree_checked(
        jax.tree.map(np.asarray, params), "vit", mode="int8_all")
    assert "w_q" in jax.tree.map(lambda x: x, qparams)["blocks"]["attn"]["q"]
    x = jax.random.uniform(jax.random.key(1), (2, 32, 32, 3))
    ref = np.asarray(vit.apply(params, x, cfg))
    got = np.asarray(vit.apply(jax.tree.map(jnp.asarray, qparams), x, cfg))
    cos = (ref * got).sum(-1)
    assert (cos > 1 - 2e-3).all(), cos


def test_fastvit_int8_quantizes_pointwise_convs():
    """FastViT ConvFFN fc1/fc2 are 1×1 convs — quantize='int8' must convert
    them (round-1 skipped conv-form weights) and stay within a cosine
    budget of the float tower; the 7×7 depthwise convs stay float."""
    import jax
    import jax.numpy as jnp

    from clip_embedder_tpu.models import fastvit
    from clip_embedder_tpu.models.fastvit import FastViTCfg
    from clip_embedder_tpu.ops.quant import quantize_tree_checked

    cfg = FastViTCfg(image_size=64, embed_dim=32, depths=(1, 1, 1, 1),
                     dims=(16, 32, 64, 128), mlp_ratios=(3, 3, 3, 3),
                     mixers=("repmixer",) * 3 + ("attention",),
                     pos_embs=(False,) * 3 + (True,))
    params = fastvit.init(jax.random.key(0), cfg)
    qparams = quantize_tree_checked(
        jax.tree.map(np.asarray, params), "fastvit")
    ffn = qparams["stages"][2]["blocks"]["ffn"]
    assert "w_q" in ffn["fc1"] and "w_q" in ffn["fc2"]
    assert ffn["fc1"]["w_q"].ndim == 3  # stacked [L, in, out] matmul form
    assert "w" in ffn["dw"] and "w_q" not in ffn["dw"]

    x = jax.random.uniform(jax.random.key(1), (2, 64, 64, 3))
    ref = np.asarray(fastvit.apply(params, x, cfg))
    got = np.asarray(fastvit.apply(
        jax.tree.map(jnp.asarray, qparams), x, cfg))
    cos = (ref * got).sum(-1)
    assert (cos > 1 - 2e-3).all(), cos


def test_fused_int8_mlp_with_pre_ln_matches_separate_ln():
    """pre_ln fused inside the kernel must equal layer_norm → int8_mlp."""
    import jax.numpy as jnp

    from clip_embedder_tpu.ops.int8_mlp import int8_mlp
    from clip_embedder_tpu.ops.layers import layer_norm
    from clip_embedder_tpu.ops.quant import quantize_weight

    rng = np.random.default_rng(9)
    K, H = 256, 384
    params = {
        "fc": {k: jnp.asarray(v) for k, v in quantize_weight(
            (rng.standard_normal((K, H)) * 0.05).astype(np.float32)).items()},
        "proj": {k: jnp.asarray(v) for k, v in quantize_weight(
            (rng.standard_normal((H, K)) * 0.05).astype(np.float32)).items()},
    }
    ln = {"scale": jnp.asarray(rng.standard_normal(K).astype(np.float32)),
          "bias": jnp.asarray(rng.standard_normal(K).astype(np.float32))}
    x = jnp.asarray(rng.standard_normal((2, 40, K)).astype(np.float32)) * 3
    ref = int8_mlp(params, layer_norm(ln, x, eps=1e-6), interpret=True)
    got = int8_mlp(params, x, pre_ln=ln, ln_eps=1e-6, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)


def test_chunked_int8_mlp_matches_unchunked():
    """The hidden-chunked kernel variant (MXU/VPU co-issue) must be
    bit-identical to chunks=1: global row amax + int32 partial-sum
    accumulation reproduce the single-matmul numerics exactly."""
    import jax.numpy as jnp

    from clip_embedder_tpu.ops.int8_mlp import int8_mlp
    from clip_embedder_tpu.ops.quant import quantize_weight

    rng = np.random.default_rng(12)
    k, hidden = 128, 640  # ragged last chunk: 640 → 256+256+128 at chunks=3
    params = {}
    for name, shape in (("fc", (k, hidden)), ("proj", (hidden, k))):
        w = (rng.standard_normal(shape) * 0.05).astype(np.float32)
        params[name] = {kk: jnp.asarray(v)
                        for kk, v in quantize_weight(w).items()}
        params[name]["b"] = jnp.asarray(
            rng.standard_normal(shape[1]).astype(np.float32) * 0.01)
    x = jnp.asarray(rng.standard_normal((2, 33, k)).astype(np.float32))
    ln = {"scale": jnp.asarray(1 + rng.standard_normal(k).astype(np.float32) * 0.1),
          "bias": jnp.asarray(rng.standard_normal(k).astype(np.float32) * 0.01)}
    for pre_ln in (None, ln):
        ref = int8_mlp(params, x, pre_ln=pre_ln, chunks=1, interpret=True)
        for n in (2, 3):
            got = int8_mlp(params, x, pre_ln=pre_ln, chunks=n,
                           interpret=True)
            np.testing.assert_array_equal(np.asarray(got), np.asarray(ref),
                                          err_msg=f"chunks={n} pre_ln={pre_ln is not None}")


def test_ln_qkv_int8_matches_separate():
    """Fused LN + W8A8 qkv kernel ≡ layer_norm → 3 × int8_linear."""
    import jax
    import jax.numpy as jnp

    from clip_embedder_tpu.ops.layers import layer_norm
    from clip_embedder_tpu.ops.qkv import ln_qkv_int8
    from clip_embedder_tpu.ops.quant import int8_linear, quantize_weight

    rng = np.random.default_rng(11)
    w = 256
    params = {}
    for n in "qkv":
        wt = (rng.standard_normal((w, w)) * 0.05).astype(np.float32)
        params[n] = {**{k: jnp.asarray(v) for k, v in
                        quantize_weight(wt).items()},
                     "b": jnp.asarray(rng.standard_normal(w).astype(np.float32) * 0.01)}
    pre_ln = {"scale": jnp.asarray(1 + rng.standard_normal(w).astype(np.float32) * 0.1),
              "bias": jnp.asarray(rng.standard_normal(w).astype(np.float32) * 0.01)}
    x = jnp.asarray(rng.standard_normal((2, 61, w)).astype(np.float32))
    y = layer_norm(pre_ln, x, eps=1e-6)
    ref = [int8_linear(params[n], y) for n in "qkv"]
    got = ln_qkv_int8(params, pre_ln, x, eps=1e-6, interpret=True)
    for n, r, o in zip("qkv", ref, got):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   atol=2e-5, err_msg=n)


def test_quantize_tree_skips_root_output_projection():
    """The root-level 'proj' (tower output head — e.g. convnext
    timm_proj='mlp' with fc1/fc2 children) must NOT quantize even though
    its child names collide with block-linear names."""
    import jax.numpy as jnp

    from clip_embedder_tpu.ops.quant import quantize_tree

    rng = np.random.default_rng(5)
    lin = lambda i, o: {"w": rng.standard_normal((i, o)).astype(np.float32)}
    tree = {
        "stages": [{"blocks": {"fc1": lin(8, 16), "fc2": lin(16, 8)}}],
        "proj": {"fc1": lin(8, 8), "fc2": lin(8, 4)},
    }
    q = quantize_tree(tree)
    assert "w_q" in q["stages"][0]["blocks"]["fc1"]
    assert "w" in q["proj"]["fc1"] and "w_q" not in q["proj"]["fc1"]
    assert "w" in q["proj"]["fc2"]


def test_fused_int8_mlp_residual_epilogue():
    """int8_mlp(add_residual=True) ≡ x + int8_mlp(pre_ln fused) — the
    transformer residual folded into the kernel epilogue."""
    import jax.numpy as jnp

    from clip_embedder_tpu.ops.int8_mlp import int8_mlp
    from clip_embedder_tpu.ops.quant import quantize_weight

    rng = np.random.default_rng(13)
    k, hidden = 128, 256
    params = {}
    for name, shape in (("fc", (k, hidden)), ("proj", (hidden, k))):
        w = (rng.standard_normal(shape) * 0.05).astype(np.float32)
        params[name] = {kk: jnp.asarray(v)
                        for kk, v in quantize_weight(w).items()}
        params[name]["b"] = jnp.asarray(
            rng.standard_normal(shape[1]).astype(np.float32) * 0.01)
    ln = {"scale": jnp.ones(k, jnp.float32), "bias": jnp.zeros(k, jnp.float32)}
    x = jnp.asarray(rng.standard_normal((2, 33, k)).astype(np.float32))
    ref = x + int8_mlp(params, x, pre_ln=ln, interpret=True)
    got = int8_mlp(params, x, pre_ln=ln, add_residual=True, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)
    with pytest.raises(ValueError, match="pre_ln"):
        int8_mlp(params, x, add_residual=True, interpret=True)


def test_fused_int8_linear_residual():
    """int8_linear_fused(residual=r) ≡ r + int8_linear_fused(x)."""
    import jax.numpy as jnp

    from clip_embedder_tpu.ops.int8_mlp import int8_linear_fused
    from clip_embedder_tpu.ops.quant import quantize_weight

    rng = np.random.default_rng(14)
    w = (rng.standard_normal((128, 128)) * 0.05).astype(np.float32)
    params = {**{k: jnp.asarray(v) for k, v in quantize_weight(w).items()},
              "b": jnp.asarray(rng.standard_normal(128).astype(np.float32) * 0.01)}
    x = jnp.asarray(rng.standard_normal((3, 50, 128)).astype(np.float32))
    r = jnp.asarray(rng.standard_normal((3, 50, 128)).astype(np.float32))
    ref = r + int8_linear_fused(params, x, interpret=True)
    got = int8_linear_fused(params, x, residual=r, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_streamed_int8_mlp_matches_unfused():
    """The weight-streamed fused MLP (PE-Core-class weight sets beyond VMEM
    residency) quantizes the hidden activations per slab. Against a
    per-slab unfused reference it must be near-exact; against the
    global-row-scale unfused path it must stay within int8 rounding
    (cosine ≥ 1 - 1e-4). Covers pre-LN + in-kernel residual and a ragged
    last slab."""
    import jax
    import jax.numpy as jnp

    from clip_embedder_tpu.ops.int8_mlp import int8_mlp_streamed
    from clip_embedder_tpu.ops.layers import layer_norm
    from clip_embedder_tpu.ops.quant import int8_linear, quantize_weight

    rng = np.random.default_rng(21)
    k, hidden = 128, 576  # chunk=256 -> slabs 256+256+64 (ragged last)
    params = {}
    raw = {}
    for name, shape in (("fc", (k, hidden)), ("proj", (hidden, k))):
        w = (rng.standard_normal(shape) * 0.05).astype(np.float32)
        raw[name] = w
        params[name] = {kk: jnp.asarray(v)
                        for kk, v in quantize_weight(w).items()}
        params[name]["b"] = jnp.asarray(
            rng.standard_normal(shape[1]).astype(np.float32) * 0.01)
    x = jnp.asarray(rng.standard_normal((2, 64, k)).astype(np.float32))
    ln = {"scale": jnp.asarray(
              1 + rng.standard_normal(k).astype(np.float32) * 0.1),
          "bias": jnp.asarray(rng.standard_normal(k).astype(np.float32)
                              * 0.01)}

    def act(h):
        return jax.nn.gelu(h, approximate=True)

    def per_slab_reference(xin, chunk):
        """Unfused math with the streamed kernel's exact quant structure:
        per-slab row scales on the hidden activations, f32 accumulation."""
        h = act(int8_linear(params["fc"], xin))
        h = np.asarray(h, np.float64)
        w2q = np.asarray(params["proj"]["w_q"], np.float64)
        w2s = np.asarray(params["proj"]["w_scale"], np.float64)
        acc = np.zeros(h.shape[:-1] + (k,), np.float64)
        for off in range(0, hidden, chunk):
            hs = h[..., off:off + chunk]
            amax = np.max(np.abs(hs), axis=-1, keepdims=True)
            scale = np.where(amax == 0, 1.0, amax / 127.0)
            aq = np.clip(np.round(hs / scale), -127, 127)
            acc += (aq @ w2q[off:off + chunk]) * (scale * w2s)
        return acc + np.asarray(params["proj"]["b"], np.float64)

    # plain: near-exact vs the per-slab reference
    got = int8_mlp_streamed(params, x, activation="gelu_tanh", chunk=256,
                            interpret=True)
    np.testing.assert_allclose(np.asarray(got, np.float64),
                               per_slab_reference(x, 256),
                               atol=2e-5, rtol=0)

    # one slab == the resident kernel's numerics exactly
    ref1 = int8_linear(params["proj"], act(int8_linear(params["fc"], x)))
    got1 = int8_mlp_streamed(params, x, activation="gelu_tanh", chunk=hidden,
                             interpret=True)
    np.testing.assert_allclose(np.asarray(got1), np.asarray(ref1), atol=2e-5)

    # vs the global-row-scale path: same int8 rounding class
    g = np.asarray(got).reshape(-1, k)
    r = np.asarray(ref1).reshape(-1, k)
    cos = (g * r).sum(-1) / (np.linalg.norm(g, axis=-1)
                             * np.linalg.norm(r, axis=-1))
    assert cos.min() > 1 - 5e-4, cos.min()

    # pre-LN + in-kernel residual (the production int8 tower configuration)
    xn = layer_norm(ln, x, eps=1e-6)
    got = int8_mlp_streamed(params, x, activation="gelu_tanh", chunk=256,
                            pre_ln=ln, ln_eps=1e-6, add_residual=True,
                            interpret=True)
    np.testing.assert_allclose(np.asarray(got, np.float64),
                               np.asarray(x, np.float64)
                               + per_slab_reference(xn, 256),
                               atol=2e-5, rtol=0)


def test_mse_clip_never_worse_than_max_scales():
    """Round 5: the MSE clip-ratio search can only improve on the exact-max
    scale (alpha=1.0 is in the search set). The measured gain for
    per-OUTPUT-CHANNEL scales is small (~2% error at in=4304 Gaussian
    channels; a lone outlier makes alpha=1.0 genuinely optimal) — the
    scheme's accuracy is bounded by the dynamic per-row ACTIVATION quant,
    which is why int8_all sits near 1e-3 cosine regardless (see
    BENCH_RESULTS round 5)."""
    from clip_embedder_tpu.ops.quant import quantize_weight

    rng = np.random.default_rng(0)
    for rows in (256, 4304):
        w = rng.standard_normal((rows, 64)).astype(np.float32)

        def rt_err(q):
            deq = q["w_q"].astype(np.float32) * q["w_scale"][None, :]
            return ((deq - w) ** 2).sum(axis=0)

        err_mse = rt_err(quantize_weight(w, clip="mse"))
        err_max = rt_err(quantize_weight(w, clip="max"))
        assert (err_mse <= err_max + 1e-12).all()


def test_quantize_tree_exclude_subtree():
    from clip_embedder_tpu.ops.quant import QUANT_PATHS_ALL, quantize_tree

    tree = {"blocks": {"attn": {
        "q": {"w": np.ones((8, 8), np.float32)},
        "out": {"w": np.ones((8, 8), np.float32)},
    }}}
    q = quantize_tree(tree, paths=QUANT_PATHS_ALL, exclude=("out",))
    assert "w_q" in q["blocks"]["attn"]["q"]
    assert "w" in q["blocks"]["attn"]["out"]  # excluded: stays float
