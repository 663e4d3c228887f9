"""EVA02 tower parity vs an independent torch mirror (rope/SwiGLU/sub-LN
with timm naming). Rope conventions follow the published description; see
models/eva02.py for the real-checkpoint-validation caveat.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F
from torch import nn

import jax
import jax.numpy as jnp

from clip_embedder_tpu.models import eva02
from clip_embedder_tpu.models.eva02 import Eva02Cfg, map_eva02_visual, rope_embed


class TorchEva02Block(nn.Module):
    def __init__(self, dim, heads, hidden):
        super().__init__()
        self.heads = heads
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = nn.Module()
        self.attn.q_proj = nn.Linear(dim, dim)
        self.attn.k_proj = nn.Linear(dim, dim, bias=False)
        self.attn.v_proj = nn.Linear(dim, dim)
        self.attn.norm = nn.LayerNorm(dim, eps=1e-6)
        self.attn.proj = nn.Linear(dim, dim)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = nn.Module()
        self.mlp.fc1_g = nn.Linear(dim, hidden)
        self.mlp.fc1_x = nn.Linear(dim, hidden)
        self.mlp.norm = nn.LayerNorm(hidden, eps=1e-6)
        self.mlp.fc2 = nn.Linear(hidden, dim)

    @staticmethod
    def _rot(x):
        # timm pos_embed_sincos.rot / GPT-J rotate_every_two
        return torch.stack([-x[..., 1::2], x[..., ::2]], -1).reshape(x.shape)

    def _rope(self, x, sin, cos):
        return x * cos + self._rot(x) * sin

    def forward(self, x, sin, cos):
        b, n, d = x.shape
        h = self.norm1(x)
        q = self.attn.q_proj(h).view(b, n, self.heads, -1).transpose(1, 2)
        k = self.attn.k_proj(h).view(b, n, self.heads, -1).transpose(1, 2)
        v = self.attn.v_proj(h).view(b, n, self.heads, -1).transpose(1, 2)
        q = torch.cat([q[:, :, :1], self._rope(q[:, :, 1:], sin, cos)], dim=2)
        k = torch.cat([k[:, :, :1], self._rope(k[:, :, 1:], sin, cos)], dim=2)
        o = F.scaled_dot_product_attention(q, k, v)
        o = o.transpose(1, 2).reshape(b, n, d)
        o = self.attn.norm(o)
        x = x + self.attn.proj(o)

        h = self.norm2(x)
        hidden = F.silu(self.mlp.fc1_g(h)) * self.mlp.fc1_x(h)
        x = x + self.mlp.fc2(self.mlp.norm(hidden))
        return x


class TorchEva02(nn.Module):
    def __init__(self, image_size, patch, dim, depth, heads, hidden, embed_dim):
        super().__init__()
        from torch_ref import PatchEmbed

        self.patch_embed = PatchEmbed(patch, dim)
        grid = image_size // patch
        self.cls_token = nn.Parameter(0.02 * torch.randn(1, 1, dim))
        self.pos_embed = nn.Parameter(0.02 * torch.randn(1, grid * grid + 1, dim))
        self.blocks = nn.ModuleList(
            TorchEva02Block(dim, heads, hidden) for _ in range(depth))
        self.norm = nn.LayerNorm(dim, eps=1e-6)
        self.head = nn.Module()
        self.head.proj = nn.Linear(dim, embed_dim)
        ang = torch.tensor(rope_embed(grid, dim // heads, 10000.0, ref_grid=16),
                           dtype=torch.float32)
        self.register_buffer("sin", ang.sin())
        self.register_buffer("cos", ang.cos())

    def forward(self, x):
        x = self.patch_embed(x)
        cls = self.cls_token.expand(x.shape[0], -1, -1)
        x = torch.cat([cls, x], dim=1) + self.pos_embed
        for blk in self.blocks:
            x = blk(x, self.sin, self.cos)
        pooled = self.norm(x[:, 0])
        return F.normalize(self.head.proj(pooled), dim=-1)


def test_eva02_parity():
    torch.manual_seed(0)
    tm = TorchEva02(32, 8, 64, 2, 4, 96, 48).eval()
    cfg = Eva02Cfg(image_size=32, patch_size=8, width=64, layers=2, heads=4,
                   mlp_hidden=96, embed_dim=48)
    sd = {f"trunk.{k}": v.numpy() for k, v in tm.state_dict().items()
          if k not in ("sin", "cos")}
    params = map_eva02_visual(sd)

    x = torch.randn(2, 3, 32, 32)
    with torch.no_grad():
        ref = tm(x).numpy()
    got = np.asarray(eva02.apply(
        params, jnp.asarray(x.permute(0, 2, 3, 1).numpy()), cfg))
    cos = (got * ref).sum(-1)
    assert (cos > 1 - 1e-5).all()
    np.testing.assert_allclose(got, ref, atol=5e-3)


def test_eva02_resolve_and_routing():
    from clip_embedder_tpu.config import ModelCfg
    from clip_embedder_tpu.models.build import resolve_vision

    mc = ModelCfg.from_dict({
        "embed_dim": 512,
        "vision_cfg": {"image_size": 224,
                       "timm_model_name": "eva02_base_patch16_clip_224",
                       "timm_proj": "linear"},
        "text_cfg": {"context_length": 77},
    })
    spec = resolve_vision(mc)
    assert spec.family == "eva02"
    assert spec.cfg.width == 768 and spec.cfg.mlp_hidden == 2048

    # EVA01 giant routes through the plain ViT parser
    mc2 = ModelCfg.from_dict({
        "embed_dim": 1024,
        "vision_cfg": {"image_size": 224,
                       "timm_model_name": "eva_giant_patch14_224",
                       "timm_proj": "linear"},
        "text_cfg": {"context_length": 77},
    })
    spec2 = resolve_vision(mc2)
    assert spec2.family == "vit"
    assert spec2.cfg.width == 1408 and spec2.cfg.layers == 40


def test_eva_qkv_bias_synthesis():
    """EVA attention stores q_bias/v_bias separately with a bias-free k —
    the timm mapper must synthesize the packed qkv bias."""
    from clip_embedder_tpu.weights import map_timm_visual

    torch.manual_seed(1)
    from torch_ref import TimmSiglipViT

    tm = TimmSiglipViT(16, 8, 32, 1, 4, 64).eval()
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    # rewrite block 0's fused qkv bias into EVA's split layout
    qkv_b = sd.pop("blocks.0.attn.qkv.bias")
    sd["blocks.0.attn.q_bias"] = qkv_b[:32]
    sd["blocks.0.attn.v_bias"] = qkv_b[64:]
    params = map_timm_visual(sd)
    np.testing.assert_array_equal(params["blocks"]["attn"]["q"]["b"][0], qkv_b[:32])
    np.testing.assert_array_equal(params["blocks"]["attn"]["k"]["b"][0],
                                  np.zeros(32, np.float32))
    np.testing.assert_array_equal(params["blocks"]["attn"]["v"]["b"][0], qkv_b[64:])


def test_rope_pair_rotation_matches_transformers_gptj():
    """timm's RotaryEmbeddingCat applies the same even/odd pair rotation as
    GPT-J rotary. Anchor our _apply_rope on transformers' implementation
    (third-party code, not a self-written mirror): with the duplicated
    angle table, x*cos + rot(x)*sin must equal GPT-J's
    apply_rotary_pos_emb fed the un-duplicated half table."""
    from transformers.models.gptj.modeling_gptj import apply_rotary_pos_emb

    from clip_embedder_tpu.models.eva02 import _apply_rope

    grid, head_dim, heads = 4, 16, 2
    ang = rope_embed(grid, head_dim, 10000.0, ref_grid=16)  # [N, D]
    # adjacent lanes hold duplicated angles; GPT-J duplicates internally
    np.testing.assert_array_equal(ang[:, 0::2], ang[:, 1::2])
    ang_half = torch.tensor(ang[:, 0::2], dtype=torch.float32)  # [N, D/2]

    torch.manual_seed(0)
    x = torch.randn(2, grid * grid, heads, head_dim)  # [B, T, H, D] (gptj)
    ref = apply_rotary_pos_emb(
        x, ang_half.sin()[None], ang_half.cos()[None]).numpy()

    ang_j = jnp.asarray(ang, jnp.float32)
    got = np.asarray(_apply_rope(
        jnp.asarray(x.permute(0, 2, 1, 3).numpy()),  # [B, H, N, D]
        jnp.sin(ang_j), jnp.cos(ang_j)))
    np.testing.assert_allclose(got.transpose(0, 2, 1, 3), ref, atol=1e-6)


def test_rope_table_ref_grid_rescale():
    """ref_feat_shape semantics: a 24-grid table (336px/14) must sample the
    same frequency range as the 16-grid pretrain table — max angle equals
    the ref grid's, and coordinates scale by ref/grid."""
    t16 = rope_embed(16, 16, 10000.0, ref_grid=16)
    t24 = rope_embed(24, 16, 10000.0, ref_grid=16)
    # row stride in y: position (y=g, x=0) angle = coord * inv_freq
    # coords are arange(g)/g*16, so the last row's y-angle < 16 in both
    assert t24[:, 0].max() < 16.0 and t16[:, 0].max() < 16.0
    # identity when ref == grid: plain integer coords
    t_plain = rope_embed(16, 16, 10000.0, ref_grid=None)
    np.testing.assert_allclose(t16, t_plain, atol=1e-12)


def test_eva02_init_apply():
    cfg = Eva02Cfg(image_size=32, patch_size=8, width=64, layers=2, heads=4,
                   mlp_hidden=96, embed_dim=32)
    params = eva02.init(jax.random.key(0), cfg)
    out = eva02.apply(params,
                      jax.random.uniform(jax.random.key(1), (2, 32, 32, 3)),
                      cfg)
    assert out.shape == (2, 32)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(out), axis=-1), 1.0,
                               atol=1e-5)


def test_eva02_packed_attn_matches_xla():
    """attn_impl='pallas' (packed kernel + rope in the packed layout)
    must match the xla path end-to-end."""
    import functools

    from clip_embedder_tpu.ops import flash as flash_mod

    # heads=2, d=64 → head group g=2 (g·d = 128): packed-eligible
    cfg = Eva02Cfg(image_size=32, patch_size=8, width=128, layers=2,
                   heads=2, mlp_hidden=192, embed_dim=48)
    params = eva02.init(jax.random.key(4), cfg)
    x = jax.random.normal(jax.random.key(5), (2, 32, 32, 3), jnp.float32)

    orig = flash_mod.flash_attention_packed
    flash_mod.flash_attention_packed = functools.partial(orig, interpret=True)
    try:
        a = np.asarray(eva02.apply(params, x, cfg, attn_impl="xla"))
        b = np.asarray(eva02.apply(params, x, cfg, attn_impl="pallas"))
    finally:
        flash_mod.flash_attention_packed = orig
    cos = (a * b).sum(-1)
    assert (cos > 1 - 1e-6).all(), cos
    np.testing.assert_allclose(a, b, atol=2e-5)


@pytest.mark.parametrize("with_cfg", [True, False])
def test_eva02_from_onnx_dir(tmp_path, with_cfg):
    """A torch-exported EVA02 ``visual.onnx`` (reference dir format,
    normalize baked in — reference: pull_onnx.py:53-59) converts to the
    NATIVE eva02 tower via structural extraction (the Linear weights
    constant-fold to anonymous names; the baked rope tables are skipped
    and recomputed), then matches the torch pipeline on a real JPEG.

    with_cfg=False is the real-world dir shape (no eva02_cfg dims in the
    config): the dims must be self-derived from the graph itself
    (onnx_reader.derive_eva02_cfg) — the mirror's dims differ from the
    paper table's 'base' entry in every field, so a silent table fallback
    would fail the weight load — and persisted for the .npz fast path."""
    import json

    from PIL import Image

    from test_onnx_exec import export
    from test_tokenizer import make_clip_style_spec

    IMG, PATCH, W, LAYERS, HEADS, HIDDEN, EMBED = 32, 8, 64, 2, 4, 96, 48
    torch.manual_seed(7)
    mirror = TorchEva02(IMG, PATCH, W, LAYERS, HEADS, HIDDEN, EMBED).eval()
    with torch.no_grad():
        for _, p in mirror.named_parameters():
            if (p == p.flatten()[0]).all():
                p.add_(0.02 * torch.randn_like(p))

    class _V(nn.Module):
        def __init__(self, t):
            super().__init__()
            self.visual = t

        def forward(self, x):
            return self.visual(x)  # mirror already L2-normalizes

    d = tmp_path / "mini-EVA02-ONNX"
    d.mkdir()
    export(_V(mirror), torch.randn(2, 3, IMG, IMG), d / "visual.onnx",
           input_name="pixel_values", output_name="image_embeds")
    occ = {
        "model_cfg": {
            "embed_dim": EMBED,
            "vision_cfg": {
                "image_size": IMG,
                "timm_model_name": f"eva02_base_patch{PATCH}_clip",
                **({"eva02_cfg": {"width": W, "layers": LAYERS,
                                  "heads": HEADS, "mlp_hidden": HIDDEN}}
                   if with_cfg else {}),
            },
            "text_cfg": {"context_length": 12, "vocab_size": 49408,
                         "width": W, "heads": HEADS, "layers": 1,
                         "mlp_ratio": 2.0},
        },
        "preprocess_cfg": {"mean": [0.5] * 3, "std": [0.5] * 3},
    }
    (d / "open_clip_config.json").write_text(json.dumps(occ))
    (d / "model_config.json").write_text(json.dumps(
        {"tokenizer_needs_lowercase": False,
         "activation_function": "softmax", "logit_scale": 100.0,
         "logit_bias": 0.0, "pad_id": 0}))
    (d / "tokenizer.json").write_text(json.dumps(make_clip_style_spec()))

    from clip_embedder_tpu.config import OpenClipConfig
    from clip_embedder_tpu.models import text_transformer
    from clip_embedder_tpu.models.build import resolve_text
    from clip_embedder_tpu.weights import save_pytree

    tspec = resolve_text(OpenClipConfig.from_dict(occ).model_cfg)
    save_pytree(d / "text.npz", jax.tree.map(
        np.asarray, text_transformer.init(jax.random.key(0), tspec.cfg)))

    jpg = tmp_path / "photo.jpg"
    rng = np.random.default_rng(6)
    Image.fromarray(rng.integers(0, 255, (IMG, IMG, 3), np.uint8)).save(
        jpg, "JPEG", quality=95)

    from clip_embedder_tpu import VisionEmbedder

    ve = VisionEmbedder.from_local_dir(d)
    assert (d / "visual.npz").is_file()  # native conversion happened
    assert ve.spec.family == "eva02"

    got = ve.embed_images([jpg])
    arr = np.asarray(Image.open(jpg).convert("RGB"), np.float32) / 255.0
    arr = (arr - np.float32(0.5)) / np.float32(0.5)
    with torch.no_grad():
        ref = mirror(torch.from_numpy(arr).permute(2, 0, 1)[None]).numpy()
    assert float(np.asarray(got)[0] @ ref[0]) > 1 - 1e-5

    if not with_cfg:
        c = ve.spec.cfg
        assert (c.width, c.layers, c.heads, c.mlp_hidden) == (
            W, LAYERS, HEADS, HIDDEN)
        persisted = json.loads((d / "open_clip_config.json").read_text())
        ec = persisted["model_cfg"]["vision_cfg"]["eva02_cfg"]
        assert ec["width"] == W and ec["layers"] == LAYERS
        assert ec["heads"] == HEADS and ec["mlp_hidden"] == HIDDEN
