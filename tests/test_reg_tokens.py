"""Register-token ViT (timm vit_*_reg*_gap_* / so150m family) parity vs an
independent torch mirror of timm's reg-token semantics: learnable prefix
tokens after the (absent) class token, pos-embed over patches only
(no_embed_class), registers excluded from gap pooling."""

import numpy as np
import torch
import torch.nn.functional as F
from torch import nn

import jax
import jax.numpy as jnp

from clip_embedder_tpu.config import ModelCfg
from clip_embedder_tpu.models import vit
from clip_embedder_tpu.models.build import resolve_vision
from clip_embedder_tpu.weights import map_timm_visual

from torch_ref import PatchEmbed, TimmBlock


class TorchRegViT(nn.Module):
    """timm reg-token ViT, gap pool, no class token, no_embed_class."""

    def __init__(self, image_size, patch, width, layers, heads, hidden,
                 reg_tokens):
        super().__init__()
        self.patch_embed = PatchEmbed(patch, width)
        n = (image_size // patch) ** 2
        self.reg_token = nn.Parameter(0.02 * torch.randn(1, reg_tokens, width))
        self.pos_embed = nn.Parameter(0.02 * torch.randn(1, n, width))
        self.blocks = nn.ModuleList(
            TimmBlock(width, heads, hidden) for _ in range(layers))
        self.norm = nn.LayerNorm(width, eps=1e-6)
        self.n_reg = reg_tokens

    def forward(self, x):
        x = self.patch_embed(x) + self.pos_embed
        reg = self.reg_token.expand(x.shape[0], -1, -1)
        x = torch.cat([reg, x], dim=1)
        for block in self.blocks:
            x = block(x)
        x = self.norm(x)
        pooled = x[:, self.n_reg:].mean(dim=1)  # registers excluded
        return F.normalize(pooled, dim=-1)


def test_reg_token_vit_parity():
    torch.manual_seed(0)
    tm = TorchRegViT(32, 8, 64, 2, 4, 96, reg_tokens=4).eval()
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    params = map_timm_visual(sd)
    assert params["reg_tokens"].shape == (1, 4, 64)

    cfg = vit.ViTCfg(
        image_size=32, patch_size=8, width=64, layers=2, heads=4,
        mlp_hidden=96, embed_dim=64, activation="gelu_tanh",
        use_class_token=False, use_ln_pre=False, pool="gap", use_proj=False,
        ln_eps=1e-6, pos_embed_cls=False, reg_tokens=4)
    x = torch.randn(2, 3, 32, 32)
    with torch.no_grad():
        ref = tm(x).numpy()
    got = np.asarray(vit.apply(
        params, jnp.asarray(x.permute(0, 2, 3, 1).numpy()), cfg))
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_so150m_resolution():
    mc = ModelCfg.from_dict({
        "embed_dim": 768,
        "vision_cfg": {"image_size": 256,
                       "timm_model_name": "vit_so150m_patch16_reg4_gap_256",
                       "timm_proj": "linear"},
        "text_cfg": {"context_length": 77},
    })
    spec = resolve_vision(mc)
    assert spec.family == "vit"
    cfg = spec.cfg
    assert cfg.width == 896 and cfg.layers == 18 and cfg.heads == 14
    assert cfg.reg_tokens == 4 and not cfg.use_class_token
    assert cfg.pool == "gap" and not cfg.pos_embed_cls
    # init/apply smoke: prefix excluded from pooling, unit-norm output
    params = vit.init(jax.random.key(0), cfg)
    assert params["reg_tokens"].shape == (1, 4, 896)
    out = vit.apply(params,
                    jax.random.uniform(jax.random.key(1), (1, 256, 256, 3)),
                    cfg)
    assert out.shape == (1, 768)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(out), axis=-1),
                               1.0, atol=1e-5)


def test_reg_tokens_with_prefix_pos_table():
    """If a checkpoint's pos table covers prefix+patches, apply must add it
    after the concat (inferred from the table length)."""
    cfg = vit.ViTCfg(
        image_size=16, patch_size=8, width=32, layers=1, heads=4,
        mlp_hidden=64, embed_dim=32, use_class_token=False, use_ln_pre=False,
        pool="gap", use_proj=False, ln_eps=1e-6, pos_embed_cls=False,
        reg_tokens=2)
    params = vit.init(jax.random.key(0), cfg)
    # patches-only table (default init)
    out1 = vit.apply(params, jnp.zeros((1, 16, 16, 3)), cfg)
    # swap in a prefix-covering table: zero prefix rows must reproduce the
    # same output as the patches-only table (registers got +0)
    pos = params["pos_embed"]
    full = jnp.concatenate([jnp.zeros((1, 2, 32), pos.dtype), pos], axis=1)
    params2 = dict(params, pos_embed=full)
    out2 = vit.apply(params2, jnp.zeros((1, 16, 16, 3)), cfg)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-6)
