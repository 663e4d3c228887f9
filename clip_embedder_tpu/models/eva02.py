"""EVA02 vision towers (EVA02-B/L CLIP models — timm ``eva02_*_clip_*``
under open_clip).

EVA-02 architecture (paper: EVA-02: A Visual Representation for Neon
Genesis): ViT with
  * separate q/k/v projections (k bias-free),
  * 2D axial rotary position embedding on q/k over the patch tokens (the
    class token is not rotated), applied on top of a learned absolute
    pos-embed,
  * sub-LN: a LayerNorm on the merged attention output before the
    out-projection, and one inside the FFN before its down-projection,
  * SwiGLU FFN: silu(w_gate·x) ⊙ (w_x·x) → ffn_ln → w_out.

Rope conventions here transcribe timm's ``RotaryEmbeddingCat`` with
``in_pixels=False`` — the code path real eva02_*_clip_* checkpoints were
trained under: per axis ``head_dim/4`` inverse-frequency bands
(``1/temperature**(i/bands)``, temperature 10000), y-axis bands then x-axis
bands along the head dim, each band duplicated into ADJACENT lanes
(``repeat_interleave(2)``), rotation over even/odd lane pairs
(``rot(x) = (-x1, x0, -x3, x2, …)``), and grid coordinates rescaled to the
pretrain grid via ``ref_feat_shape`` (16×16 for every eva02 clip variant:
timm eva.py model defs). The pair-rotation convention is anchored against
``transformers``' GPT-J rotary implementation in tests/test_eva02.py;
full-checkpoint validation still needs network (tracked in COMPONENTS.md).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Mapping

import jax
import jax.numpy as jnp
import numpy as np
from einops import rearrange

from ..errors import ConfigError
from ..ops.attention import attention_core
from ..ops.layers import layer_norm, linear
from ..ops.normalize import l2_normalize

# Shared with the PE-Core tower (ops.rope); aliased because the GPT-J
# anchor test exercises the pair convention through this module.
from ..ops.rope import apply_rope as _apply_rope
from ..ops.rope import rotate_pairs as _rotate_pairs  # noqa: F401

Params = dict


@dataclass(frozen=True)
class Eva02Cfg:
    image_size: int
    patch_size: int
    width: int
    layers: int
    heads: int
    mlp_hidden: int        # SwiGLU hidden size
    embed_dim: int
    use_proj: bool = True
    rope_temperature: float = 10000.0
    # Pretrain grid size (timm ref_feat_shape): rope coordinates are rescaled
    # arange(grid)/grid*ref_grid so fine-tuned resolutions keep the pretrain
    # frequency range. All eva02 clip variants pin (16, 16).
    rope_ref_grid: int | None = 16
    ln_eps: float = 1e-6

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size

    @property
    def head_dim(self) -> int:
        return self.width // self.heads


# width, layers, heads, swiglu hidden for the eva02 clip variants.
_EVA02_VARIANTS: dict[str, tuple[int, int, int, int]] = {
    "base": (768, 12, 12, 2048),
    "large": (1024, 24, 16, 2730),
}


def resolve_eva02(name: str, vcfg, embed_dim: int) -> Eva02Cfg:
    import re

    size_key = next((k for k in _EVA02_VARIANTS if f"_{k}_" in name), None)
    if size_key is None:
        raise ConfigError(
            f"Unsupported EVA02 variant '{name}' (supported sizes: "
            f"{', '.join(_EVA02_VARIANTS)})"
        )
    m = re.search(r"patch(\d+)", name)
    if not m:
        raise ConfigError(f"No patch size in '{name}'")
    width, layers, heads, hidden = _EVA02_VARIANTS[size_key]
    override = vcfg.extra.get("eva02_cfg", {})
    return Eva02Cfg(
        image_size=vcfg.image_size,
        patch_size=int(m.group(1)),
        width=override.get("width", width),
        layers=override.get("layers", layers),
        heads=override.get("heads", heads),
        mlp_hidden=override.get("mlp_hidden", hidden),
        embed_dim=embed_dim,
        use_proj=(vcfg.timm_proj or "linear") not in ("none", ""),
        rope_temperature=override.get("rope_temperature", 10000.0),
        rope_ref_grid=override.get("rope_ref_grid", 16),
        ln_eps=override.get("ln_eps", 1e-6),
    )


def derive_eva02_cfg_from_sd(sd) -> dict:
    """Derive EVA02 dims from a checkpoint state dict's shapes — the
    checkpoint-path analog of ``onnx_reader.derive_eva02_cfg`` (same
    contract as weights.derive_pe_cfg_from_sd / fastvit's
    derive_fastvit_cfg_from_sd: read the real model, never a table).
    ``heads`` is NOT shape-derivable (separate square q/k/v projections;
    the rope tables a graph carries are computed at runtime here) and
    stays table/override-seeded.

    Raises WeightError when the dict is not an EVA02-shaped tower."""
    from ..errors import WeightError
    from ..weights import _max_index, strip_prefix

    sd = {k: np.asarray(v).shape for k, v in strip_prefix(
        dict(sd), "model.", "visual.", "trunk.").items()}
    patch = sd.get("patch_embed.proj.weight")
    if patch is None or len(patch) != 4 or patch[1] != 3:
        raise WeightError(
            "state dict has no [width, 3, p, p] patch conv "
            "(patch_embed.proj.weight)")
    layers = _max_index(sd, r"blocks\.(\d+)\.norm1\.weight")
    gate = sd.get("blocks.0.mlp.fc1_g.weight")
    if layers == 0 or gate is None:
        raise WeightError(
            "state dict has no EVA02 SwiGLU blocks (blocks.*.mlp.fc1_g)")
    return {
        "width": int(patch[0]),
        "layers": layers,
        "mlp_hidden": int(gate[0]),
    }


def rope_embed(grid: int, head_dim: int, temperature: float = 10000.0,
               ref_grid: int | None = None) -> np.ndarray:
    """Axial 2D rope angle table [grid², head_dim], timm
    ``RotaryEmbeddingCat(in_pixels=False)`` layout: per position the head
    dim holds [y bands, x bands] (see ops.rope for the shared convention
    family; PE-Core uses the same math with x bands first)."""
    from ..ops.rope import axial_rope_table

    return axial_rope_table(grid, head_dim, temperature, order="yx",
                            ref_grid=ref_grid)


def apply(params: Params, pixels: jax.Array, cfg: Eva02Cfg, *,
          normalize: bool = True, channels_first: bool = False,
          attn_impl: str = "xla") -> jax.Array:
    """[B, H, W, 3] (or [B, 3, H, W]) → [B, embed_dim].

    ``attn_impl="pallas"/"pallas_fast"`` routes eligible head layouts
    through ops.flash.flash_attention_packed; rope is applied directly in
    the packed [B, N, H·D] projection layout (pair rotation commutes with
    head packing — head offsets h·D are even, so lane pairs stay within a
    head — and the sin/cos tables tile across heads).
    """
    from .vit import patchify

    use_packed = False
    if attn_impl in ("pallas", "pallas_fast"):
        from ..ops.flash import _head_group

        use_packed = _head_group(cfg.heads, cfg.head_dim) is not None
    elif attn_impl != "xla":
        raise ValueError(
            f"Unknown attention impl '{attn_impl}' "
            "(choices: xla, pallas, pallas_fast)")

    x = patchify(pixels, cfg.patch_size, channels_first)
    x = linear(params["patch_embed"], x)
    cls = jnp.broadcast_to(params["cls_token"].astype(x.dtype),
                           (x.shape[0], 1, cfg.width))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["pos_embed"].astype(x.dtype)

    ang = jnp.asarray(rope_embed(cfg.grid, cfg.head_dim,
                                 cfg.rope_temperature, cfg.rope_ref_grid),
                      jnp.float32)
    sin, cos = jnp.sin(ang), jnp.cos(ang)
    if use_packed:
        # head-tiled tables for rope in the packed layout, with an identity
        # row 0 (sin 0 / cos 1) so the cls token passes through unrotated —
        # lets the kernel apply rope to the whole [S, H·D] block in VMEM
        # instead of a concat around an outside apply_rope (bit-identical:
        # x·1 + rot(x)·0 is the exact bf16 passthrough)
        sin_p = jnp.tile(
            jnp.concatenate([jnp.zeros_like(sin[:1]), sin]), (1, cfg.heads))
        cos_p = jnp.tile(
            jnp.concatenate([jnp.ones_like(cos[:1]), cos]), (1, cfg.heads))

    def body(carry, block):
        if use_packed:
            from ..ops.flash import flash_attention_packed

            # NOT the ln_qkv fused kernel here (unlike the ViT path):
            # measured on EVA02-L/v5e it REGRESSES ~7% — the kernel
            # boundary stops XLA from fusing the rope elementwise pass
            # into the projection epilogue, which the plain path gets
            h = layer_norm(block["ln1"], carry, eps=cfg.ln_eps)
            q = linear(block["attn"]["q"], h)  # [B, N, H·D]
            k = linear(block["attn"]["k"], h)
            v = linear(block["attn"]["v"], h)
            # rope applies in-kernel (identity row 0 covers the cls token)
            o = flash_attention_packed(
                q, k, v, num_heads=cfg.heads, rope=(sin_p, cos_p),
                fast_softmax=attn_impl == "pallas_fast")
        else:
            h = layer_norm(block["ln1"], carry, eps=cfg.ln_eps)
            q = rearrange(linear(block["attn"]["q"], h),
                          "b n (h d) -> b h n d", h=cfg.heads)
            k = rearrange(linear(block["attn"]["k"], h),
                          "b n (h d) -> b h n d", h=cfg.heads)
            v = rearrange(linear(block["attn"]["v"], h),
                          "b n (h d) -> b h n d", h=cfg.heads)
            # rope on patch tokens only; cls (position 0) passes through
            q = jnp.concatenate(
                [q[:, :, :1], _apply_rope(q[:, :, 1:], sin, cos)], axis=2)
            k = jnp.concatenate(
                [k[:, :, :1], _apply_rope(k[:, :, 1:], sin, cos)], axis=2)
            # impl threads through: packed-ineligible pallas layouts take
            # the padded per-head kernel (same fallback chain as the ViT
            # path) — never a silent switch to the XLA softmax
            o = rearrange(attention_core(q, k, v, impl=attn_impl),
                          "b h n d -> b n (h d)")
        o = layer_norm(block["attn"]["inner_ln"], o, eps=cfg.ln_eps)  # sub-LN
        carry = carry + linear(block["attn"]["out"], o)

        h = layer_norm(block["ln2"], carry, eps=cfg.ln_eps)
        gate = jax.nn.silu(linear(block["mlp"]["w_gate"], h).astype(jnp.float32))
        val = linear(block["mlp"]["w_x"], h).astype(jnp.float32)
        hidden = (gate * val).astype(h.dtype)
        hidden = layer_norm(block["mlp"]["ffn_ln"], hidden, eps=cfg.ln_eps)
        carry = carry + linear(block["mlp"]["w_out"], hidden)
        return carry, None

    x, _ = jax.lax.scan(body, x, params["blocks"])
    pooled = layer_norm(params["ln_post"], x[:, :1], eps=cfg.ln_eps)[:, 0]
    if cfg.use_proj and "proj" in params:
        pooled = linear(params["proj"], pooled)
    if normalize:
        pooled = l2_normalize(pooled)
    return pooled


def init(key: jax.Array, cfg: Eva02Cfg, *, dtype=jnp.float32) -> Params:
    from .vit import _init_linear, _init_ln

    keys = jax.random.split(key, 8)
    patch_dim = cfg.patch_size ** 2 * 3
    n = cfg.grid ** 2 + 1
    params: Params = {
        "patch_embed": _init_linear(keys[0], patch_dim, cfg.width,
                                    std=patch_dim ** -0.5, dtype=dtype),
        "cls_token": (jax.random.normal(keys[1], (1, 1, cfg.width)) * 0.02
                      ).astype(dtype),
        "pos_embed": (jax.random.normal(keys[2], (1, n, cfg.width)) * 0.02
                      ).astype(dtype),
        "ln_post": _init_ln(cfg.width, dtype),
    }
    blocks = []
    for i in range(cfg.layers):
        bk = jax.random.fold_in(keys[3], i)
        kq, kk, kv, ko, k1, k2, k3 = jax.random.split(bk, 7)
        blocks.append({
            "ln1": _init_ln(cfg.width, dtype),
            "attn": {
                "q": _init_linear(kq, cfg.width, cfg.width, dtype=dtype),
                "k": _init_linear(kk, cfg.width, cfg.width, bias=False,
                                  dtype=dtype),
                "v": _init_linear(kv, cfg.width, cfg.width, dtype=dtype),
                "inner_ln": _init_ln(cfg.width, dtype),
                "out": _init_linear(ko, cfg.width, cfg.width, dtype=dtype),
            },
            "ln2": _init_ln(cfg.width, dtype),
            "mlp": {
                "w_gate": _init_linear(k1, cfg.width, cfg.mlp_hidden, dtype=dtype),
                "w_x": _init_linear(k2, cfg.width, cfg.mlp_hidden, dtype=dtype),
                "ffn_ln": _init_ln(cfg.mlp_hidden, dtype),
                "w_out": _init_linear(k3, cfg.mlp_hidden, cfg.width, dtype=dtype),
            },
        })
    import jax as _jax

    params["blocks"] = _jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    if cfg.use_proj:
        params["proj"] = _init_linear(keys[4], cfg.width, cfg.embed_dim,
                                      dtype=dtype)
    return params


def map_eva02_visual(sd: Mapping[str, np.ndarray]) -> Params:
    """Map a timm eva02 state dict (``visual.trunk.*``) onto the pytree.

    timm naming: blocks.N.{norm1,norm2}, attn.{q_proj,k_proj,v_proj,norm,
    proj}, mlp.{fc1_g,fc1_x,norm,fc2}; patch_embed.proj, cls_token,
    pos_embed, norm; open_clip projection under head.proj.
    """
    from ..weights import (_conv_to_patch, _get, _linear, _ln, _max_index,
                           _stack_blocks, strip_prefix)

    sd = {k: np.asarray(v) for k, v in strip_prefix(
        dict(sd), "model.", "visual.", "trunk.").items()}
    n = _max_index(sd, r"blocks\.(\d+)\.norm1\.weight")
    blocks = []
    for i in range(n):
        p = f"blocks.{i}"
        blocks.append({
            "ln1": _ln(sd, f"{p}.norm1"),
            "attn": {
                "q": _linear(sd, f"{p}.attn.q_proj"),
                "k": _linear(sd, f"{p}.attn.k_proj"),
                "v": _linear(sd, f"{p}.attn.v_proj"),
                "inner_ln": _ln(sd, f"{p}.attn.norm"),
                "out": _linear(sd, f"{p}.attn.proj"),
            },
            "ln2": _ln(sd, f"{p}.norm2"),
            "mlp": {
                "w_gate": _linear(sd, f"{p}.mlp.fc1_g"),
                "w_x": _linear(sd, f"{p}.mlp.fc1_x"),
                "ffn_ln": _ln(sd, f"{p}.mlp.norm"),
                "w_out": _linear(sd, f"{p}.mlp.fc2"),
            },
        })
    pos = np.asarray(_get(sd, "pos_embed"))
    if pos.ndim == 2:
        pos = pos[None]
    params: Params = {
        "patch_embed": {
            "w": _conv_to_patch(_get(sd, "patch_embed.proj.weight")),
            "b": _get(sd, "patch_embed.proj.bias"),
        },
        "cls_token": np.asarray(_get(sd, "cls_token")).reshape(1, 1, -1),
        "pos_embed": pos,
        "blocks": _stack_blocks(blocks),
        "ln_post": _ln(sd, "norm"),
    }
    if "head.proj.weight" in sd:
        params["proj"] = _linear(sd, "head.proj")
    return params
