"""Torch reference for the inference-form FastViT tower (test-only).

Mirrors the reparameterized FastViT structure with timm-style state-dict
naming (``stem.N.reparam_conv``, ``stages.N.blocks.M.token_mixer…``) so the
weight mapper in clip_embedder_tpu.models.fastvit is exercised against
realistic checkpoint keys.
"""

from __future__ import annotations

import torch
import torch.nn.functional as F
from torch import nn


class ReparamConv(nn.Module):
    """Fused MobileOne/RepMixer conv: conv + bias (+ optional gelu)."""

    def __init__(self, cin, cout, k, stride=1, groups=1, act=True):
        super().__init__()
        self.reparam_conv = nn.Conv2d(cin, cout, k, stride, padding=k // 2,
                                      groups=groups)
        self.act = act

    def forward(self, x):
        y = self.reparam_conv(x)
        return F.gelu(y) if self.act else y


class ConvFFN(nn.Module):
    """timm ConvMlp: the depthwise conv is ConvNormAct — bias-free conv
    followed by a BatchNorm that reparameterize_model does NOT fuse."""

    def __init__(self, dim, hidden):
        super().__init__()
        self.conv = nn.Sequential()
        self.conv.add_module("conv", nn.Conv2d(dim, dim, 7, padding=3,
                                               groups=dim, bias=False))
        self.conv.add_module("bn", nn.BatchNorm2d(dim))
        self.fc1 = nn.Conv2d(dim, hidden, 1)
        self.fc2 = nn.Conv2d(hidden, dim, 1)

    def forward(self, x):
        y = self.conv.bn(self.conv.conv(x))
        y = self.fc2(F.gelu(self.fc1(y)))
        return y


class LayerScale2d(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.gamma = nn.Parameter(1e-2 * torch.randn(dim))

    def forward(self, x):
        return x * self.gamma.view(1, -1, 1, 1)


class RepMixerBlock(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.token_mixer = ReparamConv(dim, dim, 3, groups=dim, act=False)
        self.mlp = ConvFFN(dim, hidden)
        self.layer_scale = LayerScale2d(dim)

    def forward(self, x):
        x = self.token_mixer.forward(x)
        return x + self.layer_scale(self.mlp(x))


class AttnMixerBlock(nn.Module):
    def __init__(self, dim, hidden, head_dim=32):
        super().__init__()
        self.heads = dim // head_dim
        self.norm = nn.BatchNorm2d(dim)  # eval mode == per-channel affine
        self.token_mixer = nn.Module()
        self.token_mixer.qkv = nn.Linear(dim, dim * 3)
        self.token_mixer.proj = nn.Linear(dim, dim)
        self.layer_scale_1 = LayerScale2d(dim)
        self.mlp = ConvFFN(dim, hidden)
        self.layer_scale_2 = LayerScale2d(dim)

    def attn(self, x):
        b, c, h, w = x.shape
        t = x.flatten(2).transpose(1, 2)  # [B, N, C]
        qkv = self.token_mixer.qkv(t).reshape(b, h * w, 3, self.heads,
                                              c // self.heads)
        q, k, v = qkv.permute(2, 0, 3, 1, 4).unbind(0)
        o = F.scaled_dot_product_attention(q, k, v)
        o = o.transpose(1, 2).reshape(b, h * w, c)
        o = self.token_mixer.proj(o)
        return o.transpose(1, 2).reshape(b, c, h, w)

    def forward(self, x):
        x = x + self.layer_scale_1(self.attn(self.norm(x)))
        return x + self.layer_scale_2(self.mlp(x))


class Downsample(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.proj = nn.Sequential(
            ReparamConv(cin, cin, 7, stride=2, groups=cin),
            ReparamConv(cin, cout, 1),
        )
        # timm names: downsample.proj.0.lkb_reparam / proj.1.reparam_conv —
        # our mapper accepts reparam_conv for both.

    def forward(self, x):
        return self.proj(x)


class TorchFastViT(nn.Module):
    def __init__(self, depths, dims, mlp_ratios, mixers, pos_embs,
                 embed_dim, head_dim=32):
        super().__init__()
        c0 = dims[0]
        self.stem = nn.Sequential(
            ReparamConv(3, c0, 3, stride=2),
            ReparamConv(c0, c0, 3, stride=2, groups=c0),
            ReparamConv(c0, c0, 1),
        )
        self.stages = nn.ModuleList()
        for i, (depth, dim) in enumerate(zip(depths, dims)):
            stage = nn.Module()
            if i > 0:
                stage.downsample = Downsample(dims[i - 1], dim)
            if pos_embs[i]:
                stage.pos_emb = nn.Module()
                stage.pos_emb.reparam_conv = nn.Conv2d(dim, dim, 7, padding=3,
                                                       groups=dim)
            hidden = int(dim * mlp_ratios[i])
            if mixers[i] == "repmixer":
                stage.blocks = nn.ModuleList(
                    RepMixerBlock(dim, hidden) for _ in range(depth))
            else:
                stage.blocks = nn.ModuleList(
                    AttnMixerBlock(dim, hidden, head_dim) for _ in range(depth))
            self.stages.append(stage)
        c_last = dims[-1]
        c_final = c_last * 2
        self.final_conv = ReparamConv(c_last, c_final, 3, groups=c_last)
        self.head = nn.Linear(c_final, embed_dim, bias=False)

    def forward(self, x):
        x = self.stem(x)
        for stage in self.stages:
            if hasattr(stage, "downsample"):
                x = stage.downsample(x)
            if hasattr(stage, "pos_emb"):
                x = stage.pos_emb.reparam_conv(x) + 0.0 * x  # fused CPE: conv only
            for block in stage.blocks:
                x = block(x)
        x = self.final_conv(x)
        pooled = x.mean(dim=(2, 3))
        pooled = self.head(pooled)
        return F.normalize(pooled, dim=-1)
