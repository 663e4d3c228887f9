"""PE-Core vision tower: rope convention + full-tower parity + resolution.

The reference runs timm/PE-Core-bigG-14-448 as an opaque ONNX graph
(reference: README.md:145, src/onnx.rs:19-23). Here the tower is native
(models/vit.py with rope_2d); the structure is reconstructed from Meta's
published perception_models architecture, so this file checks three layers:

* the 2-D axial rope table/rotation (ops.rope, x-bands-first) against an
  independent complex-arithmetic implementation of SAM2/PE's
  ``compute_axial_cis`` (tests/torch_ref.py) — different math route, same
  rotations;
* end-to-end tower parity against the torch mirror through the production
  weight mapper (weights.map_pe_visual, Meta parameter naming), with and
  without LayerScale, on the XLA and packed-Pallas attention paths;
* config resolution of the timm name the reference's tested-model list
  uses (``vit_pe_core_gigantic_patch14_448``).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from clip_embedder_tpu.config import ModelCfg, TextCfg, VisionCfg
from clip_embedder_tpu.models import vit
from clip_embedder_tpu.models.build import resolve_vision
from clip_embedder_tpu.ops.rope import (apply_rope, axial_rope_table,
                                        head_tiled_tables)
from clip_embedder_tpu.weights import map_state_dict

from torch_ref import PECoreViT, apply_rotary_cis, compute_axial_cis

# head_dim 32 (rope bands 8) and 4·32=128 lanes keep the packed Pallas
# kernel eligible, matching test_vit_hf_anchor's dims
W, HEADS, LAYERS, MLP, PATCH, IMG, EMBED = 128, 4, 2, 256, 8, 32, 48
GRID = IMG // PATCH


def test_rope_matches_meta_complex_convention():
    """ops.rope (sin/cos tables, pair rotation) ≡ PE/SAM2 compute_axial_cis
    (complex multiply) on random q tensors, identity on the cls row."""
    d = 32
    ang = axial_rope_table(GRID, d, order="xy", prefix=1)
    x = np.random.default_rng(0).standard_normal(
        (2, 3, GRID * GRID + 1, d)).astype(np.float32)

    ours = np.asarray(apply_rope(jnp.asarray(x), jnp.sin(jnp.asarray(ang)),
                                 jnp.cos(jnp.asarray(ang))))

    cis = compute_axial_cis(d, GRID, GRID)
    cis = torch.cat([torch.ones(1, cis.shape[-1], dtype=cis.dtype), cis])
    theirs = apply_rotary_cis(torch.from_numpy(x), cis).numpy()

    np.testing.assert_allclose(ours, theirs, atol=1e-5)
    np.testing.assert_allclose(ours[:, :, 0], x[:, :, 0], atol=0)  # cls row


def _pe_cfg(layer_scale=False):
    return ModelCfg(
        embed_dim=EMBED,
        vision_cfg=VisionCfg(
            image_size=IMG,
            timm_model_name="vit_pe_core_gigantic_patch14_448",
            extra={"pe_cfg": {
                "width": W, "layers": LAYERS, "heads": HEADS,
                "mlp_hidden": MLP, "use_layer_scale": layer_scale,
            }},
        ),
        text_cfg=TextCfg(context_length=16),
    )


@pytest.mark.parametrize("layer_scale", [False, True])
@pytest.mark.parametrize("attn_impl", ["xla", "pallas"])
def test_pe_core_tower_parity(layer_scale, attn_impl):
    torch.manual_seed(0)
    mirror = PECoreViT(IMG, PATCH, W, LAYERS, HEADS, MLP, EMBED,
                       layer_scale=layer_scale).eval()
    # patch14 in the name is overridden by the mirror's patch size via the
    # resolved cfg below — use a config whose name carries the real patch
    spec = resolve_vision(_pe_cfg(layer_scale))
    cfg = vit.ViTCfg(**{**spec.cfg.__dict__, "patch_size": PATCH,
                        "image_size": IMG})
    sd = {k: v.detach().numpy() for k, v in mirror.state_dict().items()}
    params = map_state_dict(sd, tower="visual", family="vit")
    if layer_scale:
        assert "ls1" in params["blocks"], "LayerScale gammas not mapped"

    pixels = np.random.default_rng(1).standard_normal(
        (2, IMG, IMG, 3)).astype(np.float32)
    jparams = jax.tree.map(jnp.asarray, params)
    if attn_impl == "pallas":
        # interpreter mode on CPU, same pattern as test_vit_hf_anchor
        import functools

        from clip_embedder_tpu.ops import flash as flash_mod

        assert flash_mod._head_group(HEADS, W // HEADS) is not None
        orig = flash_mod.flash_attention_packed
        flash_mod.flash_attention_packed = functools.partial(
            orig, interpret=True)
        try:
            ours = np.asarray(vit.apply(
                jparams, jnp.asarray(pixels), cfg, attn_impl=attn_impl))
        finally:
            flash_mod.flash_attention_packed = orig
    else:
        ours = np.asarray(vit.apply(
            jparams, jnp.asarray(pixels), cfg, attn_impl=attn_impl))
    with torch.no_grad():
        theirs = mirror(
            torch.from_numpy(pixels).permute(0, 3, 1, 2)).numpy()
    cos = (ours * theirs).sum(-1)
    np.testing.assert_allclose(cos, 1.0, atol=1e-6)
    np.testing.assert_allclose(ours, theirs, atol=2e-5)


def _build_pe_onnx_dir(tmp_path, *, with_pe_cfg: bool):
    """Torch-exported PE-Core model dir (reference format); optionally
    WITHOUT the pe_cfg dims override — the real-world shape, where the dims
    must be self-derived from the graph (onnx_reader.derive_pe_cfg)."""
    import json

    from PIL import Image
    from torch import nn

    from test_onnx_exec import export

    torch.manual_seed(3)
    mirror = PECoreViT(IMG, PATCH, W, LAYERS, HEADS, MLP, EMBED).eval()
    # value-distinct params (torch.onnx deduplicates identical
    # initializers — same guard as test_onnx_dir_e2e)
    with torch.no_grad():
        for name, p in mirror.named_parameters():
            if (p == p.flatten()[0]).all():
                p.add_(0.02 * torch.randn_like(p))

    # real-arithmetic rope for export (view_as_complex has no ONNX
    # lowering); assert it matches the complex route first
    probe = torch.randn(1, 3, IMG, IMG)
    with torch.no_grad():
        ref_complex = mirror(probe)
        mirror.use_complex_rope = False
        assert (mirror(probe) - ref_complex).abs().max() < 1e-6

    class _Normalized(nn.Module):
        def __init__(self, tower):
            super().__init__()
            self.visual = tower

        def forward(self, pixels):
            return self.visual(pixels)  # mirror already L2-normalizes

    d = tmp_path / "mini-PE-Core-ONNX"
    d.mkdir()
    export(_Normalized(mirror), torch.randn(2, 3, IMG, IMG),
           d / "visual.onnx", input_name="pixel_values",
           output_name="image_embeds")
    mean = [0.5, 0.5, 0.5]
    vision_cfg = {
        "image_size": IMG,
        "timm_model_name": f"vit_pe_core_gigantic_patch{PATCH}_448",
    }
    if with_pe_cfg:
        vision_cfg["pe_cfg"] = {"width": W, "layers": LAYERS,
                                "heads": HEADS, "mlp_hidden": MLP}
    occ = {
        "model_cfg": {
            "embed_dim": EMBED,
            "vision_cfg": vision_cfg,
            "text_cfg": {"context_length": 16, "vocab_size": 64,
                         "width": W, "heads": HEADS, "layers": 1},
        },
        "preprocess_cfg": {"mean": mean, "std": mean},
    }
    (d / "open_clip_config.json").write_text(json.dumps(occ))
    (d / "model_config.json").write_text(json.dumps(
        {"tokenizer_needs_lowercase": False,
         "activation_function": "softmax", "logit_scale": 100.0,
         "logit_bias": 0.0, "pad_id": 0}))
    from test_tokenizer import make_clip_style_spec

    (d / "tokenizer.json").write_text(json.dumps(make_clip_style_spec()))
    # the dir contract requires a text tower too (reference:
    # src/model_manager.rs:8-18); a tiny native one satisfies it
    from clip_embedder_tpu.config import OpenClipConfig
    from clip_embedder_tpu.models import text_transformer
    from clip_embedder_tpu.models.build import resolve_text
    from clip_embedder_tpu.weights import save_pytree

    tspec = resolve_text(OpenClipConfig.from_dict(occ).model_cfg)
    save_pytree(d / "text.npz", jax.tree.map(
        np.asarray, text_transformer.init(jax.random.key(0), tspec.cfg)))

    jpg = tmp_path / "photo.jpg"
    rng = np.random.default_rng(5)
    Image.fromarray(rng.integers(0, 255, (IMG, IMG, 3), np.uint8)).save(
        jpg, "JPEG", quality=95)
    return d, mirror, jpg


def _check_pe_dir_parity(d, mirror, jpg):
    import torch.nn.functional as F
    from PIL import Image

    from clip_embedder_tpu import VisionEmbedder

    ve = VisionEmbedder.from_local_dir(d)
    assert (d / "visual.npz").is_file()  # in-place conversion happened
    got = ve.embed_images([jpg])

    arr = np.asarray(Image.open(jpg).convert("RGB"), np.float32) / 255.0
    arr = (arr - np.float32(0.5)) / np.float32(0.5)
    with torch.no_grad():
        ref = F.normalize(
            mirror(torch.from_numpy(arr).permute(2, 0, 1)[None]),
            dim=-1).numpy()
    assert float(got[0] @ ref[0]) > 1 - 1e-5
    return ve


def test_pe_core_from_onnx_dir(tmp_path):
    """A torch-exported PE-Core ``visual.onnx`` (reference dir format,
    normalize baked in — reference: pull_onnx.py:53-59) flows through
    ``VisionEmbedder.from_local_dir``: in-place ONNX→npz conversion via
    the name-based extractor (the rope constants in the graph are ignored;
    parameters map through weights.map_pe_visual), then embedding parity
    with torch on a real JPEG."""
    d, mirror, jpg = _build_pe_onnx_dir(tmp_path, with_pe_cfg=True)
    _check_pe_dir_parity(d, mirror, jpg)


def test_pe_core_dims_self_derived_from_graph(tmp_path):
    """The real-world dir shape: NO pe_cfg in the config. The dims must be
    derived from the exported graph itself (onnx_reader.derive_pe_cfg) —
    the mirror's dims differ from the paper table's 'gigantic' entry in
    every field, so a silent table fallback would fail the weight load.
    The derivation must also persist into open_clip_config.json so the
    .npz fast path resolves identically on later loads."""
    import json

    d, mirror, jpg = _build_pe_onnx_dir(tmp_path, with_pe_cfg=False)
    ve = _check_pe_dir_parity(d, mirror, jpg)
    c = ve.spec.cfg
    assert (c.width, c.layers, c.heads, c.mlp_hidden) == (W, LAYERS, HEADS,
                                                          MLP)
    assert c.patch_size == PATCH
    assert c.pool_mlp_hidden == 4 * W  # the mirror's MAP-pool MLP width
    persisted = json.loads((d / "open_clip_config.json").read_text())
    pe = persisted["model_cfg"]["vision_cfg"]["pe_cfg"]
    assert pe["width"] == W and pe["layers"] == LAYERS
    assert pe["heads"] == HEADS and pe["mlp_hidden"] == MLP

    # later loads (npz fast path) resolve from the persisted dims
    ve2 = _check_pe_dir_parity(d, mirror, jpg)
    assert ve2.spec.cfg.width == W


def test_pe_core_resolution():
    mc = ModelCfg(
        embed_dim=1280,
        vision_cfg=VisionCfg(
            image_size=448,
            timm_model_name="vit_pe_core_gigantic_patch14_448"),
        text_cfg=TextCfg(context_length=72),
    )
    spec = resolve_vision(mc)
    assert spec.family == "vit"
    c = spec.cfg
    assert (c.width, c.layers, c.heads, c.mlp_hidden) == (1536, 50, 16, 8960)
    assert c.patch_size == 14 and c.image_size == 448
    assert c.rope_2d and c.pool == "map" and c.pool_heads == 8
    assert c.pool_mlp_hidden == 4 * 1536
    assert c.use_class_token and c.use_ln_pre and c.embed_dim == 1280
    assert c.activation == "gelu"
    # bigG spelling (HF repo name family) resolves identically
    mc2 = ModelCfg(
        embed_dim=1280,
        vision_cfg=VisionCfg(
            image_size=448, timm_model_name="vit_pe_core_bigg_patch14_448"),
        text_cfg=TextCfg(context_length=72),
    )
    assert resolve_vision(mc2).cfg.width == 1536
    # the flagship repo's capitalized spelling (timm/PE-Core-bigG-14-448)
    mc3 = ModelCfg(
        embed_dim=1280,
        vision_cfg=VisionCfg(
            image_size=448, timm_model_name="vit_pe_core_bigG_patch14_448"),
        text_cfg=TextCfg(context_length=72),
    )
    assert resolve_vision(mc3).cfg.width == 1536
