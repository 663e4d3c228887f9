"""Independent torch reference towers for numerical-parity testing.

The reference project verifies numerics manually against the Python
open_clip implementation (reference: examples/debug_local.rs,
README.md:147-148). This module plays that role here: a from-scratch torch
implementation of the open_clip/timm tower math *and parameter naming*, so
tests can (a) cross-check the JAX towers against an independent
implementation and (b) exercise the state-dict → pytree mapping in
clip_embedder_tpu.weights with realistic checkpoint key names.

Deliberately torch-only and test-only — never imported by the framework.
"""

from __future__ import annotations

import math

import torch
import torch.nn.functional as F
from torch import nn


class QuickGELU(nn.Module):
    def forward(self, x):
        return x * torch.sigmoid(1.702 * x)


class ResidualAttentionBlock(nn.Module):
    """open_clip-style pre-LN block with packed-qkv nn.MultiheadAttention
    naming (attn.in_proj_weight / attn.out_proj)."""

    def __init__(self, width, heads, mlp_hidden, act, ln_eps=1e-5):
        super().__init__()
        self.heads = heads
        self.ln_1 = nn.LayerNorm(width, eps=ln_eps)
        self.attn = nn.MultiheadAttention(width, heads, batch_first=True)
        self.ln_2 = nn.LayerNorm(width, eps=ln_eps)
        self.mlp = nn.Sequential()
        self.mlp.add_module("c_fc", nn.Linear(width, mlp_hidden))
        self.mlp.add_module("gelu", act())
        self.mlp.add_module("c_proj", nn.Linear(mlp_hidden, width))

    def forward(self, x, attn_mask=None):
        y = self.ln_1(x)
        y, _ = self.attn(y, y, y, need_weights=False, attn_mask=attn_mask)
        x = x + y
        x = x + self.mlp(self.ln_2(x))
        return x


class Transformer(nn.Module):
    def __init__(self, width, layers, heads, mlp_hidden, act, ln_eps=1e-5):
        super().__init__()
        self.resblocks = nn.ModuleList(
            ResidualAttentionBlock(width, heads, mlp_hidden, act, ln_eps)
            for _ in range(layers)
        )

    def forward(self, x, attn_mask=None):
        for block in self.resblocks:
            x = block(x, attn_mask)
        return x


class VisionTransformer(nn.Module):
    """Classic open_clip CLIP visual tower (visual.* naming)."""

    def __init__(self, image_size, patch_size, width, layers, heads,
                 mlp_hidden, embed_dim, quick_gelu=False):
        super().__init__()
        act = QuickGELU if quick_gelu else nn.GELU
        self.conv1 = nn.Conv2d(3, width, patch_size, patch_size, bias=False)
        scale = width ** -0.5
        self.class_embedding = nn.Parameter(scale * torch.randn(width))
        n = (image_size // patch_size) ** 2 + 1
        self.positional_embedding = nn.Parameter(scale * torch.randn(n, width))
        self.ln_pre = nn.LayerNorm(width)
        self.transformer = Transformer(width, layers, heads, mlp_hidden, act)
        self.ln_post = nn.LayerNorm(width)
        self.proj = nn.Parameter(scale * torch.randn(width, embed_dim))

    def forward(self, x):
        x = self.conv1(x)  # [B, W, gh, gw]
        x = x.reshape(x.shape[0], x.shape[1], -1).permute(0, 2, 1)
        cls = self.class_embedding.to(x.dtype).expand(x.shape[0], 1, -1)
        x = torch.cat([cls, x], dim=1)
        x = x + self.positional_embedding
        x = self.ln_pre(x)
        x = self.transformer(x)
        pooled = self.ln_post(x[:, 0])
        return F.normalize(pooled @ self.proj, dim=-1)


class TextTransformer(nn.Module):
    """open_clip text tower. ``causal=True, pool='argmax'`` is classic CLIP;
    ``causal=False, pool='last', proj_bias=True`` is the SigLIP text tower."""

    def __init__(self, context_length, vocab_size, width, heads, layers,
                 mlp_hidden, embed_dim, quick_gelu=False, causal=True,
                 pool="argmax", proj_bias=False):
        super().__init__()
        act = QuickGELU if quick_gelu else nn.GELU
        self.causal = causal
        self.pool = pool
        self.token_embedding = nn.Embedding(vocab_size, width)
        self.positional_embedding = nn.Parameter(0.01 * torch.randn(context_length, width))
        self.transformer = Transformer(width, layers, heads, mlp_hidden, act)
        self.ln_final = nn.LayerNorm(width)
        if proj_bias:
            self.text_projection = nn.Linear(width, embed_dim)
        else:
            self.text_projection = nn.Parameter(
                width ** -0.5 * torch.randn(width, embed_dim)
            )

    def forward(self, ids):
        x = self.token_embedding(ids)
        x = x + self.positional_embedding
        mask = None
        if self.causal:
            n = ids.shape[1]
            mask = torch.full((n, n), float("-inf")).triu(1)
        x = self.transformer(x, mask)
        x = self.ln_final(x)
        if self.pool == "argmax":
            pooled = x[torch.arange(x.shape[0]), ids.argmax(dim=-1)]
        elif self.pool == "last":
            pooled = x[:, -1]
        else:
            pooled = x.mean(dim=1)
        if isinstance(self.text_projection, nn.Linear):
            pooled = self.text_projection(pooled)
        else:
            pooled = pooled @ self.text_projection
        return F.normalize(pooled, dim=-1)


# ---------------------------------------------------------------------------
# timm-style ViT (SigLIP): trunk.* naming with packed qkv and map pooling
# ---------------------------------------------------------------------------

class TimmAttention(nn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.heads = heads
        self.qkv = nn.Linear(dim, dim * 3)
        self.proj = nn.Linear(dim, dim)

    def forward(self, x):
        B, N, D = x.shape
        qkv = self.qkv(x).reshape(B, N, 3, self.heads, D // self.heads)
        q, k, v = qkv.permute(2, 0, 3, 1, 4).unbind(0)
        x = F.scaled_dot_product_attention(q, k, v)
        x = x.transpose(1, 2).reshape(B, N, D)
        return self.proj(x)


class TimmMlp(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.act = nn.GELU(approximate="tanh")
        self.fc2 = nn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(self.act(self.fc1(x)))


class TimmBlock(nn.Module):
    def __init__(self, dim, heads, mlp_hidden, ln_eps=1e-6):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=ln_eps)
        self.attn = TimmAttention(dim, heads)
        self.norm2 = nn.LayerNorm(dim, eps=ln_eps)
        self.mlp = TimmMlp(dim, mlp_hidden)

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        x = x + self.mlp(self.norm2(x))
        return x


class AttentionPoolLatent(nn.Module):
    """timm's MAP head as used by SigLIP towers."""

    def __init__(self, dim, heads, mlp_hidden, ln_eps=1e-6):
        super().__init__()
        self.heads = heads
        self.latent = nn.Parameter(0.02 * torch.randn(1, 1, dim))
        self.q = nn.Linear(dim, dim)
        self.kv = nn.Linear(dim, dim * 2)
        self.proj = nn.Linear(dim, dim)
        self.norm = nn.LayerNorm(dim, eps=ln_eps)
        self.mlp = TimmMlp(dim, mlp_hidden)

    def forward(self, x):
        B, N, D = x.shape
        q = self.q(self.latent.expand(B, -1, -1))
        q = q.reshape(B, 1, self.heads, D // self.heads).transpose(1, 2)
        kv = self.kv(x).reshape(B, N, 2, self.heads, D // self.heads)
        k, v = kv.permute(2, 0, 3, 1, 4).unbind(0)
        out = F.scaled_dot_product_attention(q, k, v)
        out = out.transpose(1, 2).reshape(B, 1, D)
        out = self.proj(out)
        out = out + self.mlp(self.norm(out))
        return out[:, 0]


class PatchEmbed(nn.Module):
    def __init__(self, patch_size, width):
        super().__init__()
        self.proj = nn.Conv2d(3, width, patch_size, patch_size)

    def forward(self, x):
        x = self.proj(x)
        return x.flatten(2).transpose(1, 2)


class TimmSiglipViT(nn.Module):
    """timm vit_*_siglip tower (no cls token, map pool, no head).

    Named ``trunk`` inside open_clip's TimmModel, so state-dict keys here
    match ``visual.trunk.*`` once wrapped.
    """

    def __init__(self, image_size, patch_size, width, layers, heads, mlp_hidden):
        super().__init__()
        self.patch_embed = PatchEmbed(patch_size, width)
        n = (image_size // patch_size) ** 2
        self.pos_embed = nn.Parameter(0.02 * torch.randn(1, n, width))
        self.blocks = nn.ModuleList(
            TimmBlock(width, heads, mlp_hidden) for _ in range(layers)
        )
        self.norm = nn.LayerNorm(width, eps=1e-6)
        self.attn_pool = AttentionPoolLatent(width, heads, mlp_hidden)

    def forward(self, x):
        x = self.patch_embed(x) + self.pos_embed
        for block in self.blocks:
            x = block(x)
        x = self.norm(x)
        pooled = self.attn_pool(x)
        return F.normalize(pooled, dim=-1)
