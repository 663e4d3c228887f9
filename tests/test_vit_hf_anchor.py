"""Flagship towers anchored on third-party implementations we didn't write.

Every benchmark number rides models/vit.py and models/text_transformer.py,
which until this file were validated only against tests/torch_ref.py — a
mirror written by the same builder (a shared misreading of open_clip/timm
conventions would pass every test). Here random-init `transformers` models
(`SiglipVisionModel`, `CLIPVisionModelWithProjection`,
`CLIPTextModelWithProjection`) are mapped through the *production* weight
mappers (weights.map_timm_visual / map_clip_visual / map_clip_text, via
renames from HF naming to the open_clip/timm naming those mappers consume)
and embeddings must agree end-to-end. This is the independent-anchor pattern
of test_convnext_hf_anchor.py applied to the headline families
(reference: README.md:147-148 — the "verified equal embedding outputs"
claim this framework must earn).

Architecture notes: transformers' SiglipVisionModel is the same trunk +
MAP-head architecture timm builds for the open_clip SigLIP *and* SigLIP2
fixed-resolution checkpoints (ViT-SO400M-16-SigLIP2-384,
ViT-gopt-16-SigLIP2-384): patch conv, no class token, pre-norm blocks,
post-LN, latent-probe attention pool with residual MLP. The gap tests
anchor the timm global_pool='avg' layouts against the same trunk.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

transformers = pytest.importorskip("transformers")

from clip_embedder_tpu.models import text_transformer, vit  # noqa: E402
from clip_embedder_tpu.models.text_transformer import TextCfgResolved  # noqa: E402
from clip_embedder_tpu.models.vit import ViTCfg  # noqa: E402
from clip_embedder_tpu.weights import (  # noqa: E402
    map_clip_text,
    map_clip_visual,
    map_timm_visual,
)

# W=128 / HEADS=4 (head dim 32, group 4·32=128 lanes) keeps the towers
# packed-kernel eligible (ops.flash._head_group) so the pallas anchor test
# exercises the real benchmark path, not the unpacked fallback
W, HEADS, LAYERS, MLP, PATCH, IMG, EMBED = 128, 4, 3, 256, 8, 32, 48


def _np(sd):
    return {k: v.detach().numpy() for k, v in sd.items()
            if "position_ids" not in k}


def _pack_qkv(sd, p):
    w = np.concatenate([sd[p + "self_attn.q_proj.weight"],
                        sd[p + "self_attn.k_proj.weight"],
                        sd[p + "self_attn.v_proj.weight"]], axis=0)
    b = np.concatenate([sd[p + "self_attn.q_proj.bias"],
                        sd[p + "self_attn.k_proj.bias"],
                        sd[p + "self_attn.v_proj.bias"]], axis=0)
    return w, b


def _to_timm_names(sd):
    """transformers Siglip naming → the timm naming map_timm_visual
    consumes (patch_embed.proj, blocks.N.{norm1,attn.qkv,attn.proj,norm2,
    mlp.fc1/2}, norm, attn_pool.{latent,q,kv,proj,norm,mlp})."""
    out = {}
    v = "vision_model."
    out["patch_embed.proj.weight"] = sd[v + "embeddings.patch_embedding.weight"]
    out["patch_embed.proj.bias"] = sd[v + "embeddings.patch_embedding.bias"]
    out["pos_embed"] = sd[v + "embeddings.position_embedding.weight"]
    i = 0
    while v + f"encoder.layers.{i}.layer_norm1.weight" in sd:
        p, o = v + f"encoder.layers.{i}.", f"blocks.{i}."
        out[o + "attn.qkv.weight"], out[o + "attn.qkv.bias"] = _pack_qkv(sd, p)
        for a, b in (("layer_norm1", "norm1"), ("layer_norm2", "norm2"),
                     ("self_attn.out_proj", "attn.proj"),
                     ("mlp.fc1", "mlp.fc1"), ("mlp.fc2", "mlp.fc2")):
            out[o + b + ".weight"] = sd[p + a + ".weight"]
            out[o + b + ".bias"] = sd[p + a + ".bias"]
        i += 1
    out["norm.weight"] = sd[v + "post_layernorm.weight"]
    out["norm.bias"] = sd[v + "post_layernorm.bias"]
    if v + "head.probe" in sd:
        inw, inb = sd[v + "head.attention.in_proj_weight"], sd[
            v + "head.attention.in_proj_bias"]
        w = inw.shape[1]
        out["attn_pool.latent"] = sd[v + "head.probe"]
        out["attn_pool.q.weight"], out["attn_pool.q.bias"] = inw[:w], inb[:w]
        out["attn_pool.kv.weight"], out["attn_pool.kv.bias"] = inw[w:], inb[w:]
        out["attn_pool.proj.weight"] = sd[v + "head.attention.out_proj.weight"]
        out["attn_pool.proj.bias"] = sd[v + "head.attention.out_proj.bias"]
        out["attn_pool.norm.weight"] = sd[v + "head.layernorm.weight"]
        out["attn_pool.norm.bias"] = sd[v + "head.layernorm.bias"]
        out["attn_pool.mlp.fc1.weight"] = sd[v + "head.mlp.fc1.weight"]
        out["attn_pool.mlp.fc1.bias"] = sd[v + "head.mlp.fc1.bias"]
        out["attn_pool.mlp.fc2.weight"] = sd[v + "head.mlp.fc2.weight"]
        out["attn_pool.mlp.fc2.bias"] = sd[v + "head.mlp.fc2.bias"]
    return out


def _to_openclip_visual_names(sd):
    """transformers CLIP vision naming → classic open_clip VisionTransformer
    naming (conv1, class_embedding, positional_embedding, ln_pre,
    transformer.resblocks.N.*, ln_post, proj)."""
    out = {}
    v = "vision_model."
    out["conv1.weight"] = sd[v + "embeddings.patch_embedding.weight"]
    out["class_embedding"] = sd[v + "embeddings.class_embedding"]
    out["positional_embedding"] = sd[v + "embeddings.position_embedding.weight"]
    pre = "pre_layrnorm" if v + "pre_layrnorm.weight" in sd else "pre_layernorm"
    out["ln_pre.weight"] = sd[v + pre + ".weight"]
    out["ln_pre.bias"] = sd[v + pre + ".bias"]
    i = 0
    while v + f"encoder.layers.{i}.layer_norm1.weight" in sd:
        p, o = v + f"encoder.layers.{i}.", f"transformer.resblocks.{i}."
        out[o + "attn.in_proj_weight"], out[o + "attn.in_proj_bias"] = (
            _pack_qkv(sd, p))
        for a, b in (("layer_norm1", "ln_1"), ("layer_norm2", "ln_2"),
                     ("self_attn.out_proj", "attn.out_proj"),
                     ("mlp.fc1", "mlp.c_fc"), ("mlp.fc2", "mlp.c_proj")):
            out[o + b + ".weight"] = sd[p + a + ".weight"]
            out[o + b + ".bias"] = sd[p + a + ".bias"]
        i += 1
    out["ln_post.weight"] = sd[v + "post_layernorm.weight"]
    out["ln_post.bias"] = sd[v + "post_layernorm.bias"]
    if "visual_projection.weight" in sd:
        # HF Linear [embed, width] → open_clip bare Parameter [width, embed]
        out["proj"] = np.ascontiguousarray(sd["visual_projection.weight"].T)
    return out


def _to_openclip_text_names(sd):
    out = {}
    t = "text_model."
    out["token_embedding.weight"] = sd[t + "embeddings.token_embedding.weight"]
    out["positional_embedding"] = sd[t + "embeddings.position_embedding.weight"]
    i = 0
    while t + f"encoder.layers.{i}.layer_norm1.weight" in sd:
        p, o = t + f"encoder.layers.{i}.", f"transformer.resblocks.{i}."
        out[o + "attn.in_proj_weight"], out[o + "attn.in_proj_bias"] = (
            _pack_qkv(sd, p))
        for a, b in (("layer_norm1", "ln_1"), ("layer_norm2", "ln_2"),
                     ("self_attn.out_proj", "attn.out_proj"),
                     ("mlp.fc1", "mlp.c_fc"), ("mlp.fc2", "mlp.c_proj")):
            out[o + b + ".weight"] = sd[p + a + ".weight"]
            out[o + b + ".bias"] = sd[p + a + ".bias"]
        i += 1
    out["ln_final.weight"] = sd[t + "final_layer_norm.weight"]
    out["ln_final.bias"] = sd[t + "final_layer_norm.bias"]
    if "text_projection.weight" in sd:
        out["text_projection"] = np.ascontiguousarray(
            sd["text_projection.weight"].T)
    return out


@pytest.fixture(scope="module")
def siglip_pair():
    cfg_hf = transformers.SiglipVisionConfig(
        hidden_size=W, intermediate_size=MLP, num_hidden_layers=LAYERS,
        num_attention_heads=HEADS, image_size=IMG, patch_size=PATCH,
        hidden_act="gelu_pytorch_tanh", layer_norm_eps=1e-6,
    )
    torch.manual_seed(0)
    model = transformers.SiglipVisionModel(cfg_hf).eval()
    params = map_timm_visual(_to_timm_names(_np(model.state_dict())))
    return model, params


def _siglip_cfg(**kw):
    base = dict(image_size=IMG, patch_size=PATCH, width=W, layers=LAYERS,
                heads=HEADS, mlp_hidden=MLP, embed_dim=W,
                activation="gelu_tanh", use_class_token=False,
                use_ln_pre=False, pool="map", use_proj=False,
                ln_eps=1e-6, pos_embed_cls=False)
    return ViTCfg(**{**base, **kw})


def test_siglip_map_pool_matches_transformers(siglip_pair):
    """The headline architecture (SO400M/gopt SigLIP2 towers): trunk +
    latent-probe attention pool, vs transformers' independent
    implementation."""
    model, params = siglip_pair
    torch.manual_seed(1)
    x = torch.randn(2, 3, IMG, IMG)
    with torch.no_grad():
        ref = model(x).pooler_output.numpy()
    got = np.asarray(vit.apply(
        params, jnp.asarray(x.permute(0, 2, 3, 1).numpy()), _siglip_cfg(),
        normalize=False))
    np.testing.assert_allclose(got, ref, atol=1e-4)
    cos = (got * ref).sum(-1) / (
        np.linalg.norm(got, axis=-1) * np.linalg.norm(ref, axis=-1))
    assert (cos > 1 - 1e-6).all()


def test_siglip_map_pool_pallas_packed(siglip_pair):
    """Same anchor through the packed Pallas attention kernel (interpreter
    mode on CPU) — the path every TPU benchmark actually runs."""
    model, params = siglip_pair
    import functools

    from clip_embedder_tpu.ops import flash as flash_mod

    # the tower must actually be packed-eligible, or this test silently
    # falls through to the unpacked kernel (uninterpreted → CPU error)
    assert flash_mod._head_group(HEADS, W // HEADS) is not None

    torch.manual_seed(2)
    x = torch.randn(2, 3, IMG, IMG)
    with torch.no_grad():
        ref = model(x).pooler_output.numpy()
    orig = flash_mod.flash_attention_packed
    flash_mod.flash_attention_packed = functools.partial(orig, interpret=True)
    try:
        got = np.asarray(vit.apply(
            params, jnp.asarray(x.permute(0, 2, 3, 1).numpy()),
            _siglip_cfg(), normalize=False, attn_impl="pallas"))
    finally:
        flash_mod.flash_attention_packed = orig
    np.testing.assert_allclose(got, ref, atol=2e-4)


def test_siglip_gap_matches_transformers_trunk(siglip_pair):
    """gap pooling (timm global_pool='avg' with trunk norm): mean over the
    post-LN hidden states must equal transformers' last_hidden_state mean
    (SiglipVisionTransformer applies post_layernorm before the head)."""
    model, params = siglip_pair
    params = dict(params)
    params.pop("attn_pool")
    torch.manual_seed(3)
    x = torch.randn(2, 3, IMG, IMG)
    with torch.no_grad():
        ref = model(x).last_hidden_state.mean(dim=1).numpy()
    got = np.asarray(vit.apply(
        params, jnp.asarray(x.permute(0, 2, 3, 1).numpy()),
        _siglip_cfg(pool="gap"), normalize=False))
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_siglip_gap_norm_after_pool_matches_transformers(siglip_pair):
    """fc_norm layout (norm AFTER pooling): anchored on transformers'
    pre-post_layernorm hidden states + its own LayerNorm module."""
    model, params = siglip_pair
    params = dict(params)
    params.pop("attn_pool")
    torch.manual_seed(4)
    x = torch.randn(2, 3, IMG, IMG)
    with torch.no_grad():
        pre_ln = model(x, output_hidden_states=True).hidden_states[-1]
        ref = model.vision_model.post_layernorm(pre_ln.mean(dim=1)).numpy()
    got = np.asarray(vit.apply(
        params, jnp.asarray(x.permute(0, 2, 3, 1).numpy()),
        _siglip_cfg(pool="gap", norm_after_pool=True), normalize=False))
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_clip_vision_matches_transformers():
    """Classic CLIP ViT (DFN5B-class): class token, ln_pre, quick_gelu, CLS
    pool, bias-free projection — vs CLIPVisionModelWithProjection."""
    cfg_hf = transformers.CLIPVisionConfig(
        hidden_size=W, intermediate_size=MLP, projection_dim=EMBED,
        num_hidden_layers=LAYERS, num_attention_heads=HEADS,
        image_size=IMG, patch_size=PATCH, hidden_act="quick_gelu",
    )
    torch.manual_seed(5)
    model = transformers.CLIPVisionModelWithProjection(cfg_hf).eval()
    params = map_clip_visual(_to_openclip_visual_names(_np(model.state_dict())))

    cfg = ViTCfg(image_size=IMG, patch_size=PATCH, width=W, layers=LAYERS,
                 heads=HEADS, mlp_hidden=MLP, embed_dim=EMBED,
                 activation="quick_gelu", pool="cls", ln_eps=1e-5)
    x = torch.randn(2, 3, IMG, IMG)
    with torch.no_grad():
        ref = model(x).image_embeds.numpy()
    got = np.asarray(vit.apply(
        params, jnp.asarray(x.permute(0, 2, 3, 1).numpy()), cfg,
        normalize=False))
    np.testing.assert_allclose(got, ref, atol=1e-4)
    cos = (got * ref).sum(-1) / (
        np.linalg.norm(got, axis=-1) * np.linalg.norm(ref, axis=-1))
    assert (cos > 1 - 1e-6).all()


def test_clip_text_matches_transformers():
    """Classic CLIP text tower: causal mask, argmax-EOT pooling, bias-free
    projection — vs CLIPTextModelWithProjection. EOT is the max vocab id
    (open_clip convention) and transformers' eos_token_id, so both pooling
    rules select the same position."""
    vocab, ctx, eot = 99, 16, 98
    cfg_hf = transformers.CLIPTextConfig(
        vocab_size=vocab, hidden_size=W, intermediate_size=MLP,
        projection_dim=EMBED, num_hidden_layers=LAYERS,
        num_attention_heads=HEADS, max_position_embeddings=ctx,
        hidden_act="quick_gelu", eos_token_id=eot, bos_token_id=97,
        pad_token_id=0,
    )
    torch.manual_seed(6)
    model = transformers.CLIPTextModelWithProjection(cfg_hf).eval()
    params = map_clip_text(_to_openclip_text_names(_np(model.state_dict())))

    cfg = TextCfgResolved(
        context_length=ctx, vocab_size=vocab, width=W, heads=HEADS,
        layers=LAYERS, mlp_hidden=MLP, embed_dim=EMBED,
        activation="quick_gelu", causal=True, pool="argmax", ln_eps=1e-5)
    torch.manual_seed(7)
    ids = torch.randint(1, 97, (3, ctx))
    ids[:, 0] = 97
    ids[0, 5] = eot
    ids[0, 6:] = 0
    ids[1, 15] = eot
    ids[2, 2] = eot
    ids[2, 3:] = 0
    with torch.no_grad():
        ref = model(input_ids=ids).text_embeds.numpy()
    got = np.asarray(text_transformer.apply(
        params, jnp.asarray(ids.numpy()), cfg, normalize=False))
    np.testing.assert_allclose(got, ref, atol=1e-4)
    cos = (got * ref).sum(-1) / (
        np.linalg.norm(got, axis=-1) * np.linalg.norm(ref, axis=-1))
    assert (cos > 1 - 1e-6).all()
