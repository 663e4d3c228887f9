"""ConvNeXt tower parity vs an independent torch implementation with timm
naming (laion CLIP-convnext family)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F
from torch import nn

import jax
import jax.numpy as jnp

from clip_embedder_tpu.models import convnext
from clip_embedder_tpu.models.convnext import ConvNeXtCfg, map_convnext_visual


class TorchConvNeXtBlock(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.conv_dw = nn.Conv2d(dim, dim, 7, padding=3, groups=dim)
        self.norm = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = nn.Module()
        self.mlp.fc1 = nn.Linear(dim, dim * 4)
        self.mlp.fc2 = nn.Linear(dim * 4, dim)
        self.gamma = nn.Parameter(1e-2 * torch.randn(dim))

    def forward(self, x):  # NCHW
        y = self.conv_dw(x)
        y = y.permute(0, 2, 3, 1)
        y = self.norm(y)
        y = self.mlp.fc2(F.gelu(self.mlp.fc1(y)))
        y = (self.gamma * y).permute(0, 3, 1, 2)
        return x + y


class TorchConvNeXt(nn.Module):
    """timm-style naming: stem.0/stem.1, stages.N.downsample.0/1,
    stages.N.blocks.M.*, head.norm, head.proj (open_clip projection)."""

    def __init__(self, depths, dims, embed_dim):
        super().__init__()
        self.stem = nn.Sequential(
            nn.Conv2d(3, dims[0], 4, 4), nn.LayerNorm([dims[0]], eps=1e-6))
        self.stages = nn.ModuleList()
        for i, (depth, dim) in enumerate(zip(depths, dims)):
            stage = nn.Module()
            if i > 0:
                stage.downsample = nn.Sequential(
                    nn.LayerNorm([dims[i - 1]], eps=1e-6),
                    nn.Conv2d(dims[i - 1], dim, 2, 2))
            stage.blocks = nn.ModuleList(
                TorchConvNeXtBlock(dim) for _ in range(depth))
            self.stages.append(stage)
        self.head = nn.Module()
        self.head.norm = nn.LayerNorm(dims[-1], eps=1e-6)
        self.head.proj = nn.Linear(dims[-1], embed_dim)

    def forward(self, x):
        x = self.stem[0](x)
        x = self.stem[1](x.permute(0, 2, 3, 1)).permute(0, 3, 1, 2)
        for stage in self.stages:
            if hasattr(stage, "downsample"):
                x = stage.downsample[0](x.permute(0, 2, 3, 1)).permute(0, 3, 1, 2)
                x = stage.downsample[1](x)
            for block in stage.blocks:
                x = block(x)
        pooled = x.mean(dim=(2, 3))
        pooled = self.head.norm(pooled)
        pooled = self.head.proj(pooled)
        return F.normalize(pooled, dim=-1)


DEPTHS = (1, 1, 2, 1)
DIMS = (16, 32, 64, 128)


def test_convnext_parity():
    torch.manual_seed(0)
    tm = TorchConvNeXt(DEPTHS, DIMS, embed_dim=48).eval()
    cfg = ConvNeXtCfg(image_size=64, embed_dim=48, depths=DEPTHS, dims=DIMS,
                      proj="linear")
    params = map_convnext_visual(
        {f"trunk.{k}": v.numpy() for k, v in tm.state_dict().items()})

    x = torch.randn(2, 3, 64, 64)
    with torch.no_grad():
        ref = tm(x).numpy()
    got = np.asarray(convnext.apply(
        params, jnp.asarray(x.permute(0, 2, 3, 1).numpy()), cfg))
    cos = (got * ref).sum(-1)
    assert (cos > 1 - 1e-5).all()
    np.testing.assert_allclose(got, ref, atol=5e-3)


def test_convnext_resolve_and_init():
    from clip_embedder_tpu.config import ModelCfg
    from clip_embedder_tpu.models.build import resolve_vision

    mc = ModelCfg.from_dict({
        "embed_dim": 640,
        "vision_cfg": {"image_size": 256, "timm_model_name": "convnext_base",
                       "timm_proj": "linear"},
        "text_cfg": {"context_length": 77},
    })
    spec = resolve_vision(mc)
    assert spec.family == "convnext"
    assert spec.cfg.dims == (128, 256, 512, 1024)

    small = ConvNeXtCfg(image_size=64, embed_dim=32, depths=DEPTHS, dims=DIMS)
    params = convnext.init(jax.random.key(0), small)
    out = convnext.apply(params,
                         jax.random.uniform(jax.random.key(1), (2, 64, 64, 3)),
                         small)
    assert out.shape == (2, 32)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(out), axis=-1), 1.0,
                               atol=1e-5)
