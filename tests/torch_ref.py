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


class CoCaAttentionalPooler(nn.Module):
    """open_clip AttentionalPooler (CoCa legacy path): learned queries in
    embed-dim space, ln_k on the width-dim tokens, ln_q on the queries, MHA
    with kdim=vdim=width (open_clip naming: query / attn / ln_q / ln_k)."""

    def __init__(self, d_model, context_dim, n_head, n_queries):
        super().__init__()
        self.query = nn.Parameter(torch.randn(n_queries, d_model))
        self.attn = nn.MultiheadAttention(
            d_model, n_head, kdim=context_dim, vdim=context_dim,
            batch_first=True)
        self.ln_q = nn.LayerNorm(d_model)
        self.ln_k = nn.LayerNorm(context_dim)

    def forward(self, x):
        n = x.shape[0]
        x = self.ln_k(x)
        q = self.ln_q(self.query)
        out, _ = self.attn(q.unsqueeze(0).expand(n, -1, -1), x, x,
                           need_weights=False)
        return out


class CoCaVisionTower(nn.Module):
    """CoCa visual tower (open_clip VisionTransformer with the legacy
    boolean ``attentional_pool``): classic CLIP stem/blocks, pooler in
    embed-dim space, ln_post over the pooled queries, contrastive embedding
    = query 0, square projection."""

    def __init__(self, image_size, patch_size, width, layers, heads,
                 mlp_hidden, embed_dim, n_queries=8, pool_heads=4):
        super().__init__()
        self.conv1 = nn.Conv2d(3, width, patch_size, patch_size, bias=False)
        scale = width ** -0.5
        self.class_embedding = nn.Parameter(scale * torch.randn(width))
        n = (image_size // patch_size) ** 2 + 1
        self.positional_embedding = nn.Parameter(scale * torch.randn(n, width))
        self.ln_pre = nn.LayerNorm(width)
        self.transformer = Transformer(width, layers, heads, mlp_hidden,
                                       nn.GELU)
        self.attn_pool = CoCaAttentionalPooler(
            embed_dim, width, pool_heads, n_queries)
        self.ln_post = nn.LayerNorm(embed_dim)
        self.proj = nn.Parameter(
            embed_dim ** -0.5 * torch.randn(embed_dim, embed_dim))

    def forward(self, x):
        x = self.conv1(x)
        x = x.reshape(x.shape[0], x.shape[1], -1).permute(0, 2, 1)
        cls = self.class_embedding.to(x.dtype).expand(x.shape[0], 1, -1)
        x = torch.cat([cls, x], dim=1)
        x = x + self.positional_embedding
        x = self.ln_pre(x)
        x = self.transformer(x)
        x = self.attn_pool(x)
        x = self.ln_post(x)
        pooled = x[:, 0]
        return F.normalize(pooled @ self.proj, dim=-1)


class CoCaTextTower(nn.Module):
    """open_clip TextTransformer with ``embed_cls=True`` (CoCa): a learned
    cls token appended at the END of the sequence, causal mask combined
    with build_cls_mask (replicated literally, including its one-column
    shift), pooled at the cls position, ln_final AFTER pooling."""

    def __init__(self, context_length, vocab_size, width, heads, layers,
                 mlp_hidden, embed_dim, pad_id=0):
        super().__init__()
        self.heads = heads
        self.pad_id = pad_id
        self.token_embedding = nn.Embedding(vocab_size, width)
        self.positional_embedding = nn.Parameter(
            0.01 * torch.randn(context_length + 1, width))
        self.cls_emb = nn.Parameter(0.01 * torch.randn(width))
        self.transformer = Transformer(width, layers, heads, mlp_hidden,
                                       nn.GELU)
        self.ln_final = nn.LayerNorm(width)
        self.text_projection = nn.Parameter(
            width ** -0.5 * torch.randn(width, embed_dim))

    def build_cls_mask(self, text):
        cls_mask = (text != self.pad_id).unsqueeze(1)
        cls_mask = F.pad(cls_mask, (1, 0, cls_mask.shape[2], 0), value=True)
        additive = torch.zeros(cls_mask.shape, dtype=torch.float32)
        additive.masked_fill_(~cls_mask, float("-inf"))
        return torch.repeat_interleave(additive, self.heads, 0)

    def forward(self, ids):
        s = ids.shape[1] + 1
        x = self.token_embedding(ids)
        x = torch.cat(
            [x, self.cls_emb.to(x.dtype).expand(x.shape[0], 1, -1)], dim=1)
        causal = torch.full((s, s), float("-inf")).triu(1)
        mask = causal[None] + self.build_cls_mask(ids)
        x = x + self.positional_embedding[:s]
        x = self.transformer(x, mask)
        pooled = self.ln_final(x[:, -1])
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


# ---------------------------------------------------------------------------
# Meta Perception Encoder (PE-Core): CLIP-lineage blocks + 2-D axial rope
# (SAM2-style complex math — an independent route vs ops.rope's sin/cos
# tables) + MAP attention pooling. Meta parameter naming (conv1,
# class_embedding, transformer.resblocks.*, attn_pool.*, proj).
# ---------------------------------------------------------------------------

def compute_axial_cis(dim, end_x, end_y, theta=10000.0):
    """SAM2/PE ``compute_axial_cis``: [end_x*end_y, dim/2] complex rotations,
    x-axis bands first, raw integer grid coordinates."""
    freqs = 1.0 / (theta ** (torch.arange(0, dim, 4)[: dim // 4].float() / dim))
    t = torch.arange(end_x * end_y, dtype=torch.float32)
    t_x = t % end_x
    t_y = torch.div(t, end_x, rounding_mode="floor")
    freqs_x = torch.outer(t_x, freqs)
    freqs_y = torch.outer(t_y, freqs)
    cis_x = torch.polar(torch.ones_like(freqs_x), freqs_x)
    cis_y = torch.polar(torch.ones_like(freqs_y), freqs_y)
    return torch.cat([cis_x, cis_y], dim=-1)


def apply_rotary_cis(x, freqs_cis):
    """x: [B, H, S, D]; freqs_cis: [S, D/2] complex. Adjacent-lane pairs
    as complex numbers, rotated by complex multiply."""
    x_ = torch.view_as_complex(x.float().reshape(*x.shape[:-1], -1, 2))
    out = torch.view_as_real(x_ * freqs_cis).flatten(-2)
    return out.type_as(x)


def apply_rotary_real(x, sin, cos):
    """Same rotation in real arithmetic (ONNX-exportable —
    ``view_as_complex`` has no ONNX lowering): x·cos + rot(x)·sin with
    pair-duplicated [S, D] tables. Equivalence to the complex route is
    asserted by tests/test_pe_core.py before any export relies on it."""
    x_even = x[..., 0::2]
    x_odd = x[..., 1::2]
    rot = torch.stack([-x_odd, x_even], dim=-1).flatten(-2)
    return x * cos + rot * sin


class PEAttention(nn.Module):
    """Packed-qkv self-attention with rope on q/k (Meta SelfAttention
    naming: in_proj_weight / in_proj_bias / out_proj)."""

    def __init__(self, width, heads):
        super().__init__()
        self.heads = heads
        self.in_proj_weight = nn.Parameter(torch.empty(3 * width, width))
        self.in_proj_bias = nn.Parameter(torch.zeros(3 * width))
        self.out_proj = nn.Linear(width, width)
        nn.init.normal_(self.in_proj_weight, std=width ** -0.5)

    def forward(self, x, rope):
        b, s, w = x.shape
        qkv = F.linear(x, self.in_proj_weight, self.in_proj_bias)
        q, k, v = qkv.chunk(3, dim=-1)
        d = w // self.heads
        q = q.view(b, s, self.heads, d).transpose(1, 2)
        k = k.view(b, s, self.heads, d).transpose(1, 2)
        v = v.view(b, s, self.heads, d).transpose(1, 2)
        if isinstance(rope, tuple):  # real-arithmetic (ONNX-export) path
            q = apply_rotary_real(q, *rope)
            k = apply_rotary_real(k, *rope)
        else:
            q = apply_rotary_cis(q, rope)
            k = apply_rotary_cis(k, rope)
        out = F.scaled_dot_product_attention(q, k, v)
        out = out.transpose(1, 2).reshape(b, s, w)
        return self.out_proj(out)


class LayerScale(nn.Module):
    def __init__(self, width, init=0.1):
        super().__init__()
        self.gamma = nn.Parameter(init * torch.ones(width))

    def forward(self, x):
        return x * self.gamma


class PEBlock(nn.Module):
    def __init__(self, width, heads, mlp_hidden, layer_scale=False):
        super().__init__()
        self.ln_1 = nn.LayerNorm(width)
        self.attn = PEAttention(width, heads)
        self.ln_2 = nn.LayerNorm(width)
        self.mlp = nn.Sequential()
        self.mlp.add_module("c_fc", nn.Linear(width, mlp_hidden))
        self.mlp.add_module("gelu", nn.GELU())
        self.mlp.add_module("c_proj", nn.Linear(mlp_hidden, width))
        if layer_scale:
            self.ls_1 = LayerScale(width)
            self.ls_2 = LayerScale(width)
        else:
            self.ls_1 = nn.Identity()
            self.ls_2 = nn.Identity()

    def forward(self, x, rope):
        x = x + self.ls_1(self.attn(self.ln_1(x), rope))
        x = x + self.ls_2(self.mlp(self.ln_2(x)))
        return x


class PEAttentionPooling(nn.Module):
    """big_vision MAP head as used by PE: learned probe, MHA, LN+MLP
    residual (Meta naming: probe / attn / layernorm / mlp.c_fc|c_proj)."""

    def __init__(self, width, heads, mlp_hidden):
        super().__init__()
        self.probe = nn.Parameter(0.02 * torch.randn(1, 1, width))
        self.attn = nn.MultiheadAttention(width, heads, batch_first=True)
        self.layernorm = nn.LayerNorm(width)
        self.mlp = nn.Sequential()
        self.mlp.add_module("c_fc", nn.Linear(width, mlp_hidden))
        self.mlp.add_module("gelu", nn.GELU())
        self.mlp.add_module("c_proj", nn.Linear(mlp_hidden, width))

    def forward(self, x):
        probe = self.probe.expand(x.shape[0], -1, -1)
        y, _ = self.attn(probe, x, x, need_weights=False)
        y = y + self.mlp(self.layernorm(y))
        return y[:, 0]


class PECoreViT(nn.Module):
    """PE-Core visual tower (Meta perception_models structure)."""

    def __init__(self, image_size, patch_size, width, layers, heads,
                 mlp_hidden, embed_dim, pool_heads=8, pool_mlp_hidden=None,
                 layer_scale=False):
        super().__init__()
        self.conv1 = nn.Conv2d(3, width, patch_size, patch_size, bias=False)
        scale = width ** -0.5
        grid = image_size // patch_size
        self.class_embedding = nn.Parameter(scale * torch.randn(width))
        self.positional_embedding = nn.Parameter(
            scale * torch.randn(grid * grid + 1, width))
        self.ln_pre = nn.LayerNorm(width)
        self.transformer = nn.Module()
        self.transformer.resblocks = nn.ModuleList(
            PEBlock(width, heads, mlp_hidden, layer_scale)
            for _ in range(layers))
        self.ln_post = nn.LayerNorm(width)
        self.attn_pool = PEAttentionPooling(
            width, pool_heads, pool_mlp_hidden or 4 * width)
        self.proj = nn.Parameter(scale * torch.randn(width, embed_dim))
        cis = compute_axial_cis(width // heads, grid, grid)
        cis = torch.cat([torch.ones(1, cis.shape[-1], dtype=cis.dtype), cis])
        self.register_buffer("freqs_cis", cis, persistent=False)
        self.register_buffer(
            "rope_sin", torch.repeat_interleave(cis.imag, 2, dim=-1),
            persistent=False)
        self.register_buffer(
            "rope_cos", torch.repeat_interleave(cis.real, 2, dim=-1),
            persistent=False)
        # complex rotation by default (the independent math route); real
        # sin/cos tables for ONNX export (view_as_complex has no lowering)
        self.use_complex_rope = True

    def forward(self, x):
        x = self.conv1(x)
        x = x.reshape(x.shape[0], x.shape[1], -1).permute(0, 2, 1)
        cls = self.class_embedding.to(x.dtype).expand(x.shape[0], 1, -1)
        x = torch.cat([cls, x], dim=1)
        x = x + self.positional_embedding
        x = self.ln_pre(x)
        rope = (self.freqs_cis if self.use_complex_rope
                else (self.rope_sin, self.rope_cos))
        for block in self.transformer.resblocks:
            x = block(x, rope)
        x = self.ln_post(x)
        pooled = self.attn_pool(x)
        return F.normalize(pooled @ self.proj, dim=-1)
