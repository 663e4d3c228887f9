"""Numerical parity: JAX towers + weight mapping vs the independent torch
reference (tests/torch_ref.py).

f32 thresholds allow pure rounding noise (random-init nets amplify f32
accumulation-order differences); exact semantic parity is verified at f64 by
tests/_f64_check.py (<1e-12).

This is the golden-tensor layer the reference lacks (SURVEY.md §4): the
reference only verified numerics manually via examples/debug_local.rs. Budget
here is far tighter than the ≤1e-3 cosine-distance acceptance bound — f32 on
CPU should agree to ~1e-6.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from clip_embedder_tpu.models import text_transformer, vit
from clip_embedder_tpu.models.text_transformer import TextCfgResolved
from clip_embedder_tpu.models.vit import ViTCfg
from clip_embedder_tpu.weights import map_state_dict

from torch_ref import TextTransformer, TimmSiglipViT, VisionTransformer

torch.manual_seed(0)


def cosine_distance(a, b):
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    sims = (a * b).sum(-1) / (
        np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1)
    )
    return float(1.0 - sims.min())


def to_numpy_sd(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


@pytest.mark.parametrize("quick_gelu", [False, True])
def test_clip_visual_parity(quick_gelu):
    torch_model = VisionTransformer(
        image_size=32, patch_size=8, width=64, layers=3, heads=4,
        mlp_hidden=256, embed_dim=48, quick_gelu=quick_gelu,
    ).eval()
    cfg = ViTCfg(
        image_size=32, patch_size=8, width=64, layers=3, heads=4,
        mlp_hidden=256, embed_dim=48,
        activation="quick_gelu" if quick_gelu else "gelu",
    )
    params = map_state_dict(to_numpy_sd(torch_model), tower="visual", family="vit")

    x = torch.randn(3, 3, 32, 32)
    with torch.no_grad():
        ref = torch_model(x).numpy()
    # torch is NCHW; the JAX tower takes channel-last NHWC.
    got = vit.apply(params, jnp.asarray(x.permute(0, 2, 3, 1).numpy()), cfg)
    assert cosine_distance(got, ref) < 5e-5
    np.testing.assert_allclose(np.asarray(got), ref, atol=5e-3)


@pytest.mark.parametrize(
    "causal,pool,proj_bias",
    [(True, "argmax", False), (False, "last", True)],
    ids=["clip", "siglip"],
)
def test_text_parity(causal, pool, proj_bias):
    torch_model = TextTransformer(
        context_length=16, vocab_size=120, width=64, heads=4, layers=3,
        mlp_hidden=256, embed_dim=48, causal=causal, pool=pool,
        proj_bias=proj_bias,
    ).eval()
    cfg = TextCfgResolved(
        context_length=16, vocab_size=120, width=64, heads=4, layers=3,
        mlp_hidden=256, embed_dim=48, causal=causal, pool=pool,
        proj_bias=proj_bias,
    )
    params = map_state_dict(
        to_numpy_sd(torch_model), tower="text", family="text_transformer"
    )

    ids = torch.randint(1, 119, (4, 16))
    ids[:, 0] = 119  # give argmax pooling a deterministic EOT position
    with torch.no_grad():
        ref = torch_model(ids).numpy()
    got = text_transformer.apply(params, jnp.asarray(ids.numpy()), cfg)
    assert cosine_distance(got, ref) < 5e-5
    np.testing.assert_allclose(np.asarray(got), ref, atol=5e-3)


def test_timm_siglip_visual_parity():
    torch_model = TimmSiglipViT(
        image_size=32, patch_size=8, width=64, layers=3, heads=4, mlp_hidden=256
    ).eval()
    cfg = ViTCfg(
        image_size=32, patch_size=8, width=64, layers=3, heads=4,
        mlp_hidden=256, embed_dim=64, activation="gelu_tanh",
        use_class_token=False, use_ln_pre=False, pool="map", use_proj=False,
        ln_eps=1e-6, pos_embed_cls=False,
    )
    sd = {f"trunk.{k}": v for k, v in to_numpy_sd(torch_model).items()}
    params = map_state_dict(sd, tower="visual", family="vit")

    x = torch.randn(3, 3, 32, 32)
    with torch.no_grad():
        ref = torch_model(x).numpy()
    got = vit.apply(params, jnp.asarray(x.permute(0, 2, 3, 1).numpy()), cfg)
    assert cosine_distance(got, ref) < 5e-5
    np.testing.assert_allclose(np.asarray(got), ref, atol=5e-3)


def test_towers_are_jittable_without_retrace():
    cfg = ViTCfg(
        image_size=32, patch_size=8, width=64, layers=2, heads=4,
        mlp_hidden=128, embed_dim=32,
    )
    params = vit.init(jax.random.key(0), cfg)
    fn = jax.jit(lambda p, x: vit.apply(p, x, cfg))
    x = jnp.zeros((2, 32, 32, 3))
    fn(params, x)
    n0 = fn._cache_size()
    fn(params, x + 1.0)
    assert fn._cache_size() == n0


def test_timm_avg_pool_and_head_proj():
    """timm global_pool='avg' towers: fc_norm applies after pooling, and an
    open_clip head.proj linear maps width→embed_dim (the BiomedCLIP-style
    vision path). Verified against a torch mirror."""
    import torch.nn.functional as F
    from torch import nn
    from torch_ref import PatchEmbed, TimmBlock

    class TimmAvgViT(nn.Module):
        def __init__(self, image_size, patch, width, layers, heads, mlp,
                     embed_dim):
            super().__init__()
            self.patch_embed = PatchEmbed(patch, width)
            n = (image_size // patch) ** 2
            self.pos_embed = nn.Parameter(0.02 * torch.randn(1, n, width))
            self.blocks = nn.ModuleList(
                TimmBlock(width, heads, mlp) for _ in range(layers))
            self.fc_norm = nn.LayerNorm(width, eps=1e-6)
            self.head = nn.Module()
            self.head.proj = nn.Linear(width, embed_dim)

        def forward(self, x):
            x = self.patch_embed(x) + self.pos_embed
            for blk in self.blocks:
                x = blk(x)
            pooled = self.fc_norm(x.mean(dim=1))
            return F.normalize(self.head.proj(pooled), dim=-1)

    torch.manual_seed(4)
    tm = TimmAvgViT(32, 8, 64, 2, 4, 128, 48).eval()
    from clip_embedder_tpu.config import ModelCfg
    from clip_embedder_tpu.models.build import resolve_vision

    mc = ModelCfg.from_dict({
        "embed_dim": 48,
        "vision_cfg": {"image_size": 32,
                       "timm_model_name": "vit_base_patch8_fake",
                       "timm_pool": "avg"},  # timm_proj omitted → linear
        "text_cfg": {"context_length": 8},
    })
    # 'base' sizes don't match this tiny tower; build the cfg manually with
    # the resolution *semantics* under test (avg pool → gap + post-pool norm,
    # default proj linear)
    spec = resolve_vision(mc)
    assert spec.cfg.pool == "gap" and spec.cfg.norm_after_pool
    assert spec.cfg.use_proj

    cfg = ViTCfg(image_size=32, patch_size=8, width=64, layers=2, heads=4,
                 mlp_hidden=128, embed_dim=48, activation="gelu_tanh",
                 use_class_token=False, use_ln_pre=False, pool="gap",
                 use_proj=True, proj_bias=True, ln_eps=1e-6,
                 pos_embed_cls=False, norm_after_pool=True)
    sd = {f"trunk.{k}": v.numpy() for k, v in tm.state_dict().items()}
    params = map_state_dict(sd, tower="visual", family="vit")
    assert "proj" in params

    x = torch.randn(2, 3, 32, 32)
    with torch.no_grad():
        ref = tm(x).numpy()
    got = np.asarray(vit.apply(
        params, jnp.asarray(x.permute(0, 2, 3, 1).numpy()), cfg))
    cos = (got * ref).sum(-1)
    assert (cos > 1 - 1e-6).all()
