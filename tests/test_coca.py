"""CoCa towers: attentional-pool vision + embed_cls text, natively.

The reference runs open_clip's CoCa checkpoints (coca_ViT-B-32 /
coca_ViT-L-14 — the "any open_clip model" claim, reference src/lib.rs:9) as
opaque ONNX graphs under ONNX Runtime (src/onnx.rs:19-23). Here both towers
are native: models/vit.py pool="attn" (open_clip AttentionalPooler, legacy
boolean path: queries in embed-dim space, ln_post after pooling, contrastive
embedding = query 0) and models/text_transformer.py embed_cls=True (cls
token appended, causal+cls mask with open_clip's literal build_cls_mask
semantics, ln_final after last-position pooling). Checks:

* config resolution of a coca_ViT-B-32-shaped open_clip config;
* full-tower parity against torch mirrors through the production weight
  mappers (open_clip parameter naming, separate q/k/v_proj_weight in the
  pooler because kdim != embed_dim);
* padding-dependence of the text tower (the cls mask must see pad ids);
* end-to-end: torch-exported visual.onnx + text.onnx through
  Clip.from_local_dir (structural extraction — linear weights constant-fold
  in the export) with embedding parity vs the torch pipeline.
"""

import json

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from clip_embedder_tpu.config import ModelCfg, OpenClipConfig, TextCfg, VisionCfg
from clip_embedder_tpu.errors import ConfigError
from clip_embedder_tpu.models import text_transformer, vit
from clip_embedder_tpu.models.build import resolve_text, resolve_vision
from clip_embedder_tpu.weights import map_state_dict

from torch_ref import CoCaTextTower, CoCaVisionTower

# width 128 / 4 heads keeps the packed Pallas kernel eligible for the
# transformer blocks; embed_dim (= pooler d_model) deliberately differs
# from width so the pooler exercises the kdim != embed_dim MHA layout.
W, HEADS, LAYERS, MLP, PATCH, IMG, EMBED = 128, 4, 2, 256, 8, 32, 48
N_QUERIES, POOL_HEADS = 8, 4
CTX, VOCAB, PAD = 12, 64, 0


def _coca_model_cfg():
    return ModelCfg(
        embed_dim=EMBED,
        vision_cfg=VisionCfg(
            image_size=IMG, layers=LAYERS, width=W, patch_size=PATCH,
            head_width=W // HEADS, mlp_ratio=MLP / W,
            extra={"attentional_pool": True,
                   "attn_pooler_queries": N_QUERIES,
                   "attn_pooler_heads": POOL_HEADS,
                   "output_tokens": True},
        ),
        text_cfg=TextCfg(
            context_length=CTX, vocab_size=VOCAB, width=W, heads=HEADS,
            layers=LAYERS,
            extra={"embed_cls": True, "output_tokens": True,
                   "mlp_ratio": MLP / W},
        ),
    )


def test_coca_resolution():
    mc = _coca_model_cfg()
    vspec = resolve_vision(mc)
    assert vspec.family == "vit"
    assert vspec.cfg.pool == "attn"
    assert vspec.cfg.attn_pool_queries == N_QUERIES
    assert vspec.cfg.attn_pool_dim == EMBED
    assert vspec.cfg.pool_heads == POOL_HEADS
    tspec = resolve_text(mc)
    assert tspec.family == "text_transformer"
    assert tspec.cfg.embed_cls and tspec.cfg.pool == "last"
    assert tspec.cfg.causal


def test_parallel_pool_rejected():
    mc = _coca_model_cfg()
    mc.vision_cfg.extra["attentional_pool"] = "parallel"
    with pytest.raises(ConfigError, match="parallel"):
        resolve_vision(mc)


def test_coca_vision_parity():
    torch.manual_seed(0)
    mirror = CoCaVisionTower(IMG, PATCH, W, LAYERS, HEADS, MLP, EMBED,
                             n_queries=N_QUERIES, pool_heads=POOL_HEADS).eval()
    # the pooler's MHA keeps separate projections when kdim != d_model —
    # the layout the production mapper must handle for real coca dirs
    assert hasattr(mirror.attn_pool.attn, "q_proj_weight")

    spec = resolve_vision(_coca_model_cfg())
    sd = {k: v.detach().numpy() for k, v in mirror.state_dict().items()}
    params = map_state_dict(sd, tower="visual", family="vit")
    assert "query" in params["attn_pool"]

    pixels = np.random.default_rng(1).standard_normal(
        (2, IMG, IMG, 3)).astype(np.float32)
    ours = np.asarray(vit.apply(
        jax.tree.map(jnp.asarray, params), jnp.asarray(pixels), spec.cfg))
    with torch.no_grad():
        theirs = mirror(torch.from_numpy(pixels).permute(0, 3, 1, 2)).numpy()
    np.testing.assert_allclose((ours * theirs).sum(-1), 1.0, atol=1e-6)
    np.testing.assert_allclose(ours, theirs, atol=2e-5)


@pytest.mark.parametrize("attn_impl", ["xla", "pallas"])
def test_coca_text_parity(attn_impl, monkeypatch):
    import functools

    from clip_embedder_tpu.ops import flash as flash_mod

    # route the pallas path through interpreter mode on CPU: the per-batch
    # [B,1,S+1,S+1] causal+cls mask exercises the packed kernel's
    # full-mask streaming branch
    monkeypatch.setattr(
        flash_mod, "flash_attention_packed",
        functools.partial(flash_mod.flash_attention_packed, interpret=True))

    torch.manual_seed(1)
    mirror = CoCaTextTower(CTX, VOCAB, W, HEADS, LAYERS, MLP, EMBED,
                           pad_id=PAD).eval()
    spec = resolve_text(_coca_model_cfg())
    sd = {k: v.detach().numpy() for k, v in mirror.state_dict().items()}
    params = map_state_dict(sd, tower="text", family="text_transformer")
    assert "cls_emb" in params

    # rows with different amounts of padding: the cls mask depends on ids
    rng = np.random.default_rng(2)
    ids = rng.integers(1, VOCAB, (3, CTX)).astype(np.int32)
    ids[0, 5:] = PAD
    ids[1, 9:] = PAD
    ours = np.asarray(text_transformer.apply(
        jax.tree.map(jnp.asarray, params), jnp.asarray(ids), spec.cfg,
        attn_impl=attn_impl))
    with torch.no_grad():
        theirs = mirror(torch.from_numpy(ids.astype(np.int64))).numpy()
    np.testing.assert_allclose((ours * theirs).sum(-1), 1.0, atol=1e-6)
    np.testing.assert_allclose(ours, theirs, atol=2e-5)


def test_cls_mask_literal_semantics():
    """The additive cls mask replicates open_clip's F.pad shift: column 0
    open, token j's pad status on column j+1, non-cls rows untouched."""
    ids = jnp.asarray([[3, 5, PAD, PAD]])
    m = np.asarray(text_transformer._cls_mask(ids, PAD))[0, 0]
    assert m.shape == (5, 5)
    np.testing.assert_array_equal(m[:4], 0.0)          # text-token queries
    assert list(np.isneginf(m[4])) == [False, False, False, True, True]


def test_coca_from_onnx_dir(tmp_path):
    """Both coca towers from torch-exported .onnx through Clip.from_local_dir
    (reference dir contract, src/model_manager.rs:8-18): structural
    extraction recovers the constant-folded pooler/cls parameters, and the
    resulting pipeline matches the torch towers on a real JPEG + token ids."""
    import torch.nn.functional as F
    from PIL import Image
    from torch import nn

    from test_onnx_exec import export
    from test_tokenizer import make_clip_style_spec

    torch.manual_seed(3)
    vis = CoCaVisionTower(IMG, PATCH, W, LAYERS, HEADS, MLP, EMBED,
                          n_queries=N_QUERIES, pool_heads=POOL_HEADS).eval()
    txt = CoCaTextTower(CTX, VOCAB, W, HEADS, LAYERS, MLP, EMBED,
                        pad_id=PAD).eval()
    # value-distinct params (torch.onnx deduplicates identical initializers)
    with torch.no_grad():
        for model in (vis, txt):
            for _, p in model.named_parameters():
                if (p == p.flatten()[0]).all():
                    p.add_(0.02 * torch.randn_like(p))

    class _V(nn.Module):
        def __init__(self, t):
            super().__init__()
            self.visual = t

        def forward(self, p):
            return self.visual(p)

    class _T(nn.Module):
        def __init__(self, t):
            super().__init__()
            self.text = t

        def forward(self, ids):
            return self.text(ids)

    d = tmp_path / "mini-CoCa-ONNX"
    d.mkdir()
    export(_V(vis), torch.randn(2, 3, IMG, IMG), d / "visual.onnx",
           input_name="pixel_values", output_name="image_embeds")
    export(_T(txt), torch.randint(1, VOCAB, (2, CTX)), d / "text.onnx",
           input_name="input_ids", output_name="text_embeds")
    occ = {
        "model_cfg": {
            "embed_dim": EMBED,
            "vision_cfg": {
                "image_size": IMG, "layers": LAYERS, "width": W,
                "patch_size": PATCH, "head_width": W // HEADS,
                "mlp_ratio": MLP / W,
                "attentional_pool": True,
                "attn_pooler_queries": N_QUERIES,
                "attn_pooler_heads": POOL_HEADS,
            },
            "text_cfg": {"context_length": CTX, "vocab_size": VOCAB,
                         "width": W, "heads": HEADS, "layers": LAYERS,
                         "embed_cls": True, "mlp_ratio": MLP / W},
        },
        "preprocess_cfg": {"mean": [0.5, 0.5, 0.5], "std": [0.5, 0.5, 0.5]},
    }
    (d / "open_clip_config.json").write_text(json.dumps(occ))
    (d / "model_config.json").write_text(json.dumps(
        {"tokenizer_needs_lowercase": False,
         "activation_function": "softmax", "logit_scale": 100.0,
         "logit_bias": 0.0, "pad_id": PAD}))
    (d / "tokenizer.json").write_text(json.dumps(make_clip_style_spec()))

    jpg = tmp_path / "photo.jpg"
    rng = np.random.default_rng(5)
    Image.fromarray(rng.integers(0, 255, (IMG, IMG, 3), np.uint8)).save(
        jpg, "JPEG", quality=95)

    from clip_embedder_tpu import Clip

    clip = Clip.from_local_dir(d)
    assert (d / "visual.npz").is_file() and (d / "text.npz").is_file()

    got_img = clip.vision.embed_images([jpg])
    arr = np.asarray(Image.open(jpg).convert("RGB"), np.float32) / 255.0
    arr = (arr - np.float32(0.5)) / np.float32(0.5)
    with torch.no_grad():
        ref_img = vis(torch.from_numpy(arr).permute(2, 0, 1)[None]).numpy()
    assert float(got_img[0] @ ref_img[0]) > 1 - 1e-5

    labels = ["a cat", "a dog"]
    got_txt = clip.text.embed_texts(labels)
    ids, _ = clip.text.tokenize(labels)
    with torch.no_grad():
        ref_txt = txt(torch.from_numpy(
            np.asarray(ids).astype(np.int64))).numpy()
    cos = (got_txt * ref_txt).sum(-1)
    np.testing.assert_allclose(cos, 1.0, atol=1e-5)

    res = clip.classify(jpg, labels)
    probs = [p for _, p in res]
    assert abs(sum(probs) - 1.0) < 1e-4 and probs == sorted(probs,
                                                            reverse=True)


def test_embed_cls_uses_tokenizer_pad_id(tmp_path):
    """The cls attention mask is built from ids inside the forward, so it
    must use the pad id the tokenizer actually pads with (model_config.json
    chain, text.py) — not text_cfg's open_clip default 0. A dir whose
    resolved pad id differs from 0 must mask its real padding columns."""
    from clip_embedder_tpu.text import TextEmbedder
    from clip_embedder_tpu.weights import save_pytree
    from test_tokenizer import make_clip_style_spec

    real_pad = 17
    mc = _coca_model_cfg()
    spec = resolve_text(mc)
    assert spec.cfg.pad_id == 0  # config-level default

    d = tmp_path / "coca-pad"
    d.mkdir()
    occ = {
        "model_cfg": {
            "embed_dim": EMBED,
            "vision_cfg": {"image_size": IMG, "layers": LAYERS, "width": W,
                           "patch_size": PATCH, "mlp_ratio": MLP / W},
            "text_cfg": {"context_length": CTX, "vocab_size": 49408,
                         "width": W, "heads": HEADS, "layers": LAYERS,
                         "embed_cls": True, "mlp_ratio": MLP / W},
        },
        "preprocess_cfg": {"mean": [0.5] * 3, "std": [0.5] * 3},
    }
    (d / "open_clip_config.json").write_text(json.dumps(occ))
    (d / "model_config.json").write_text(json.dumps(
        {"tokenizer_needs_lowercase": False,
         "activation_function": "softmax", "logit_scale": 100.0,
         "logit_bias": 0.0, "pad_id": real_pad}))
    (d / "tokenizer.json").write_text(json.dumps(make_clip_style_spec()))
    big = resolve_text(ModelCfg(
        embed_dim=EMBED,
        vision_cfg=mc.vision_cfg,
        text_cfg=TextCfg(context_length=CTX, vocab_size=49408, width=W,
                         heads=HEADS, layers=LAYERS,
                         extra={"embed_cls": True, "mlp_ratio": MLP / W}),
    ))
    save_pytree(d / "text.npz",
                text_transformer.init(jax.random.key(4), big.cfg))
    vspec = resolve_vision(OpenClipConfig.from_file(
        d / "open_clip_config.json").model_cfg)
    save_pytree(d / "visual.npz", vit.init(jax.random.key(5), vspec.cfg))

    emb = TextEmbedder.from_local_dir(d)
    assert emb.spec.cfg.pad_id == real_pad

    # functional: with the override, a row padded with real_pad embeds the
    # same whether the pad tail is there or replaced by other pad ids —
    # i.e. the cls query ignores padding. Without the fix the cls mask
    # masked nothing (no token == 0), so padding leaked into the embedding.
    ids = np.full((2, CTX), real_pad, np.int32)
    ids[0, :3] = [5, 9, 2]
    ids[1, :3] = [5, 9, 2]
    out_a = np.asarray(text_transformer.apply(
        jax.tree.map(jnp.asarray, emb.params), jnp.asarray(ids[:1]),
        emb.spec.cfg))
    wrong_cfg = big.cfg  # pad_id=0: mask misses the real padding
    out_b = np.asarray(text_transformer.apply(
        jax.tree.map(jnp.asarray, emb.params), jnp.asarray(ids[:1]),
        wrong_cfg))
    assert not np.allclose(out_a, out_b, atol=1e-6)

    # and the fixed path matches the torch mirror at this pad id
    torch.manual_seed(6)
    mirror = CoCaTextTower(CTX, 49408, W, HEADS, LAYERS, MLP, EMBED,
                           pad_id=real_pad).eval()
    sd = {k: v.detach().numpy() for k, v in mirror.state_dict().items()}
    params = map_state_dict(sd, tower="text", family="text_transformer")
    ours = np.asarray(text_transformer.apply(
        jax.tree.map(jnp.asarray, params), jnp.asarray(ids), emb.spec.cfg))
    with torch.no_grad():
        theirs = mirror(torch.from_numpy(ids.astype(np.int64))).numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-5)
