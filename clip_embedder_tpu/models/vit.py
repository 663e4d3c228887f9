"""Vision Transformer towers, from scratch.

This is the TPU-native replacement for the ViT graphs inside the reference's
``visual.onnx`` (built by open_clip/timm, exported via torch.onnx and run by
ONNX Runtime — reference: pull_onnx.py:277-286, src/vision.rs:106-114). One
config-driven implementation covers the open_clip ViT zoo:

* classic CLIP ViT (class token, ln_pre, quick_gelu option, linear
  projection without bias, CLS pooling) — e.g. DFN5B-CLIP-ViT-H-14;
* timm/SigLIP ViT (no class token, tanh-gelu, optional attention-pool "map"
  head with latent probe, optional layer-scale) — e.g.
  ViT-SO400M-16-SigLIP2-384, ViT-gopt-16-SigLIP2-384.

TPU-first choices: transformer blocks are *stacked* pytrees walked with
``lax.scan`` (one compiled block body regardless of depth → fast compiles,
full XLA fusion), patch embedding is a single [B,N,P²·3]×[P²·3,D] matmul on
the MXU rather than a conv, and all shapes are static.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import jax
import jax.numpy as jnp
from einops import rearrange

from ..ops.attention import multi_head_attention
from ..ops.layers import ACTIVATIONS, gelu, layer_norm, linear, mlp
from ..ops.normalize import l2_normalize

Params = dict


@dataclass(frozen=True)
class ViTCfg:
    """Resolved architecture of one vision tower (built from
    open_clip_config's ``vision_cfg`` by clip_embedder_tpu.models.build)."""

    image_size: int
    patch_size: int
    width: int
    layers: int
    heads: int
    mlp_hidden: int
    embed_dim: int
    activation: str = "gelu"          # gelu | gelu_tanh | quick_gelu
    use_class_token: bool = True
    use_ln_pre: bool = True           # CLIP has ln_pre; timm ViTs don't
    pool: str = "cls"                 # cls | map | gap | tok
    use_proj: bool = True             # final [width, embed_dim] projection
    proj_bias: bool = False
    use_layer_scale: bool = False
    ln_eps: float = 1e-5
    pos_embed_cls: bool = True        # class token has a pos-embed row
    # classic timm global_pool='avg': fc_norm applies AFTER pooling
    norm_after_pool: bool = False
    # timm register tokens (vit_*_reg4_* / so150m family): learnable prefix
    # tokens after the class token, excluded from gap pooling; whether they
    # carry pos-embed rows is inferred from the loaded table's length.
    reg_tokens: int = 0
    # PE-Core (Meta Perception Encoder): 2-D axial rope on q/k, x bands
    # first (ops.rope order="xy"), prefix tokens unrotated. The map-pool
    # head of that family uses its own head count / MLP width (Meta
    # AttentionPooling: 8 heads, ratio-4 MLP) — 0 means "same as tower".
    rope_2d: bool = False
    rope_temperature: float = 10000.0
    pool_heads: int = 0
    pool_mlp_hidden: int = 0
    # CoCa (open_clip coca_*): pool == "attn" — a bank of learned queries in
    # embed-dim space cross-attends over the width-dim patch tokens
    # (open_clip AttentionalPooler: ln_k on tokens, ln_q on queries, MHA with
    # kdim=width), ln_post runs over the pooled queries and the contrastive
    # embedding is query 0 (open_clip VisionTransformer legacy
    # attentional_pool branch). The reference runs CoCa only as an exported
    # ONNX graph (src/onnx.rs:13-29 runs whatever graph it is given).
    attn_pool_queries: int = 0
    attn_pool_dim: int = 0            # pooler d_model (embed_dim); 0 = width

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid * self.grid

    @property
    def prefix_tokens(self) -> int:
        return (1 if self.use_class_token else 0) + self.reg_tokens

    @property
    def seq_len(self) -> int:
        return self.num_patches + self.prefix_tokens

    @property
    def head_dim(self) -> int:
        return self.width // self.heads


def _init_linear(key, d_in, d_out, *, bias=True, std=None, dtype=jnp.float32):
    std = std if std is not None else d_in ** -0.5
    kw, _ = jax.random.split(key)
    p = {"w": (jax.random.normal(kw, (d_in, d_out)) * std).astype(dtype)}
    if bias:
        p["b"] = jnp.zeros((d_out,), dtype)
    return p


def _init_ln(d, dtype=jnp.float32):
    return {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)}


def _init_attn(key, width, *, dtype=jnp.float32):
    ks = jax.random.split(key, 4)
    return {
        "q": _init_linear(ks[0], width, width, dtype=dtype),
        "k": _init_linear(ks[1], width, width, dtype=dtype),
        "v": _init_linear(ks[2], width, width, dtype=dtype),
        "out": _init_linear(ks[3], width, width, dtype=dtype),
    }


def _init_block(key, cfg: ViTCfg, dtype=jnp.float32) -> Params:
    ka, km = jax.random.split(key)
    kf, kp = jax.random.split(km)
    block = {
        "ln1": _init_ln(cfg.width, dtype),
        "attn": _init_attn(ka, cfg.width, dtype=dtype),
        "ln2": _init_ln(cfg.width, dtype),
        "mlp": {
            "fc": _init_linear(kf, cfg.width, cfg.mlp_hidden, dtype=dtype),
            "proj": _init_linear(kp, cfg.mlp_hidden, cfg.width, dtype=dtype),
        },
    }
    if cfg.use_layer_scale:
        block["ls1"] = jnp.full((cfg.width,), 1e-5, dtype)
        block["ls2"] = jnp.full((cfg.width,), 1e-5, dtype)
    return block


def init(key: jax.Array, cfg: ViTCfg, *, dtype=jnp.float32) -> Params:
    """Random-init parameter pytree (used for benchmarks and tests; real
    weights come from clip_embedder_tpu.weights)."""
    keys = jax.random.split(key, 8)
    patch_dim = cfg.patch_size * cfg.patch_size * 3
    params: Params = {
        "patch_embed": _init_linear(
            keys[0], patch_dim, cfg.width, std=patch_dim ** -0.5, dtype=dtype
        ),
        "pos_embed": (
            jax.random.normal(
                keys[1],
                (1, cfg.num_patches + (1 if cfg.pos_embed_cls else 0), cfg.width),
            )
            * 0.02
        ).astype(dtype),
        "ln_post": _init_ln(cfg.width, dtype),
    }
    if cfg.use_class_token:
        params["cls_token"] = (
            jax.random.normal(keys[2], (1, 1, cfg.width)) * 0.02
        ).astype(dtype)
    if cfg.reg_tokens:
        params["reg_tokens"] = (
            jax.random.normal(keys[7], (1, cfg.reg_tokens, cfg.width)) * 0.02
        ).astype(dtype)
    if cfg.use_ln_pre:
        params["ln_pre"] = _init_ln(cfg.width, dtype)

    block_keys = jax.random.split(keys[3], cfg.layers)
    blocks = [_init_block(k, cfg, dtype) for k in block_keys]
    params["blocks"] = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)

    if cfg.pool == "attn":
        dm = cfg.attn_pool_dim or cfg.width
        kq, kk, kv, ko, kque = jax.random.split(keys[4], 5)
        params["ln_post"] = _init_ln(dm, dtype)  # over pooler d_model
        params["attn_pool"] = {
            "query": (jax.random.normal(kque, (cfg.attn_pool_queries, dm))
                      * dm ** -0.5).astype(dtype),
            "ln_q": _init_ln(dm, dtype),
            "ln_k": _init_ln(cfg.width, dtype),
            "attn": {
                "q": _init_linear(kq, dm, dm, dtype=dtype),
                "k": _init_linear(kk, cfg.width, dm, dtype=dtype),
                "v": _init_linear(kv, cfg.width, dm, dtype=dtype),
                "out": _init_linear(ko, dm, dm, dtype=dtype),
            },
        }
    if cfg.pool == "map":
        kq, kk, kv, ko, kf, kp = jax.random.split(keys[4], 6)
        pool_hidden = cfg.pool_mlp_hidden or cfg.mlp_hidden
        params["attn_pool"] = {
            "probe": (jax.random.normal(keys[5], (1, 1, cfg.width)) * 0.02).astype(dtype),
            "attn": {
                "q": _init_linear(kq, cfg.width, cfg.width, dtype=dtype),
                "k": _init_linear(kk, cfg.width, cfg.width, dtype=dtype),
                "v": _init_linear(kv, cfg.width, cfg.width, dtype=dtype),
                "out": _init_linear(ko, cfg.width, cfg.width, dtype=dtype),
            },
            "ln": _init_ln(cfg.width, dtype),
            "mlp": {
                "fc": _init_linear(kf, cfg.width, pool_hidden, dtype=dtype),
                "proj": _init_linear(kp, pool_hidden, cfg.width, dtype=dtype),
            },
        }
    if cfg.use_proj:
        proj_in = (cfg.attn_pool_dim or cfg.width) if cfg.pool == "attn" \
            else cfg.width
        params["proj"] = _init_linear(
            keys[6], proj_in, cfg.embed_dim, bias=cfg.proj_bias,
            std=proj_in ** -0.5, dtype=dtype,
        )
    return params


def patchify(x: jax.Array, patch_size: int,
             channels_first: bool = False) -> jax.Array:
    """[B, H, W, 3] (or [B, 3, H, W] with ``channels_first``) → [B, N,
    P·P·3] patch matrix.

    The per-patch flatten order is always (py, px, c), matched to torch
    Conv2d semantics at weight-load time (see clip_embedder_tpu.weights).
    Accepting channels-first lets the on-device preprocess skip its output
    transpose entirely (ops.preprocess layout="nchw") — the pixel reorder
    into patch rows happens here either way.
    """
    pattern = ("b c (gh p1) (gw p2) -> b (gh gw) (p1 p2 c)" if channels_first
               else "b (gh p1) (gw p2) c -> b (gh gw) (p1 p2 c)")
    return rearrange(x, pattern, p1=patch_size, p2=patch_size)


def _block_forward(
    cfg: ViTCfg, act: Callable, x: jax.Array, block: Params, *, impl: str,
    rope: tuple[jax.Array, jax.Array] | None = None,
) -> jax.Array:
    # ln1 passes through multi_head_attention so the Pallas path fuses it
    # with the q/k/v projections in-kernel (ops.qkv); without layer-scale
    # the residual add rides the quantized out-projection epilogue
    if "ls1" in block:
        h = multi_head_attention(
            block["attn"], x, num_heads=cfg.heads, impl=impl,
            pre_ln=block["ln1"], ln_eps=cfg.ln_eps, rope=rope,
        )
        x = x + h * block["ls1"]
    else:
        x = multi_head_attention(
            block["attn"], x, num_heads=cfg.heads, impl=impl,
            pre_ln=block["ln1"], ln_eps=cfg.ln_eps, residual=x, rope=rope,
        )
    # ln2 passes through mlp() so the quantized path fuses it in-kernel;
    # without layer-scale the residual add fuses into the kernel epilogue
    if "ls2" in block:
        h = mlp(block["mlp"], x, activation=act, pre_ln=block["ln2"],
                ln_eps=cfg.ln_eps)
        return x + h * block["ls2"]
    return mlp(block["mlp"], x, activation=act, pre_ln=block["ln2"],
               ln_eps=cfg.ln_eps, residual=True)


def _map_pool(cfg: ViTCfg, act: Callable, params: Params, x: jax.Array) -> jax.Array:
    """timm AttentionPoolLatent ('map' pool): a learned probe cross-attends
    over the patch tokens, followed by a residual MLP."""
    p = params["attn_pool"]
    probe = jnp.broadcast_to(
        p["probe"].astype(x.dtype), (x.shape[0], 1, cfg.width)
    )
    pooled = multi_head_attention(p["attn"], probe, kv=x,
                                  num_heads=cfg.pool_heads or cfg.heads)
    pooled = pooled + mlp(
        p["mlp"], layer_norm(p["ln"], pooled, eps=cfg.ln_eps), activation=act
    )
    return pooled[:, 0]


def apply(
    params: Params,
    pixels: jax.Array,
    cfg: ViTCfg,
    *,
    normalize: bool = True,
    attn_impl: str = "xla",
    remat: bool = False,
    channels_first: bool = False,
) -> jax.Array:
    """Forward: [B, H, W, 3] preprocessed pixels → [B, embed_dim] embedding
    ([B, 3, H, W] with ``channels_first`` — the zero-transpose handoff from
    ops.preprocess layout="nchw").

    Matches open_clip ``encode_image(..., normalize=True)`` semantics — the
    reference bakes that normalize into its export (pull_onnx.py:57-59).
    ``remat`` rematerializes each block on the backward pass (training-time
    memory/FLOPs trade — activations of one block instead of all layers).
    """
    act = ACTIVATIONS[cfg.activation]

    x = patchify(pixels, cfg.patch_size, channels_first)
    x = linear(params["patch_embed"], x)

    pos = params["pos_embed"].astype(x.dtype)
    prefix = []
    if cfg.use_class_token:
        prefix.append(jnp.broadcast_to(
            params["cls_token"].astype(x.dtype), (x.shape[0], 1, cfg.width)))
    if cfg.reg_tokens:
        prefix.append(jnp.broadcast_to(
            params["reg_tokens"].astype(x.dtype),
            (x.shape[0], cfg.reg_tokens, cfg.width)))
    if pos.shape[1] == cfg.num_patches and prefix:
        # timm no_embed_class layout: pos covers patches only; prefix
        # tokens (cls/registers) join after the add
        x = jnp.concatenate(prefix + [x + pos], axis=1)
    else:
        x = jnp.concatenate(prefix + [x], axis=1) if prefix else x
        x = x + pos

    if cfg.use_ln_pre:
        x = layer_norm(params["ln_pre"], x, eps=cfg.ln_eps)

    rope = None
    if cfg.rope_2d:
        from ..ops.rope import axial_rope_table, head_tiled_tables

        # Meta compute_axial_cis: x bands first, raw integer coordinates,
        # identity rows for the prefix (cls) tokens
        ang = axial_rope_table(cfg.grid, cfg.head_dim, cfg.rope_temperature,
                               order="xy", prefix=cfg.prefix_tokens)
        rope = head_tiled_tables(ang, cfg.heads)

    def body(carry, block):
        return _block_forward(cfg, act, carry, block, impl=attn_impl,
                              rope=rope), None

    if remat:
        body = jax.checkpoint(body)
    x, _ = jax.lax.scan(body, x, params["blocks"])

    if cfg.pool == "attn":
        # CoCa legacy attentional pool: pooler → ln_post → first query
        # (open_clip VisionTransformer forward, bool attentional_pool path)
        p = params["attn_pool"]
        dm = cfg.attn_pool_dim or cfg.width
        keys = layer_norm(p["ln_k"], x, eps=cfg.ln_eps)
        q = layer_norm(p["ln_q"], p["query"].astype(x.dtype), eps=cfg.ln_eps)
        q = jnp.broadcast_to(
            q[None], (x.shape[0], cfg.attn_pool_queries, dm))
        pooled = multi_head_attention(
            p["attn"], q, kv=keys, num_heads=cfg.pool_heads or cfg.heads)
        pooled = layer_norm(params["ln_post"], pooled, eps=cfg.ln_eps)[:, 0]
    elif cfg.pool == "map":
        x = layer_norm(params["ln_post"], x, eps=cfg.ln_eps)
        pooled = _map_pool(cfg, act, params, x)
    elif cfg.pool == "gap":
        start = cfg.prefix_tokens
        if cfg.norm_after_pool:
            pooled = jnp.mean(x[:, start:], axis=1)
            pooled = layer_norm(params["ln_post"], pooled, eps=cfg.ln_eps)
        else:
            x = layer_norm(params["ln_post"], x, eps=cfg.ln_eps)
            pooled = jnp.mean(x[:, start:], axis=1)
    else:  # cls / tok
        pooled = layer_norm(params["ln_post"], x[:, :1], eps=cfg.ln_eps)[:, 0]

    if cfg.use_proj and "proj" in params:
        proj = params["proj"]
        if "fc" in proj:  # open_clip timm_proj='mlp': Linear→gelu→Linear
            pooled = linear(proj["out"], gelu(linear(proj["fc"], pooled)))
        else:
            pooled = linear(proj, pooled)
    if normalize:
        pooled = l2_normalize(pooled)
    return pooled
