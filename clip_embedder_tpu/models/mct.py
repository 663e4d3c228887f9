"""MCT-class hybrid text towers (MobileCLIP-S0's ``mct`` text encoder).

The MobileCLIP text encoder replaces the lower transformer layers with
1-D convolutional token-mixing blocks (reparameterized at inference to a
single depthwise conv per block, the same trick as the FastViT vision
stages) followed by standard transformer layers. The reference runs this
family only as an opaque exported graph through ONNX Runtime
(reference: src/onnx.rs:13-29, src/text.rs:150-169); here it gets a
first-class TPU tower so it rides the same bf16/int8/Pallas levers as
every other text family (VERDICT.md round 3, missing #3).

Honesty note (the unanchored-family rule, COMPONENTS.md): no source of
truth for the real MCT block structure exists in this environment (no
timm / open_clip / ml-mobileclip, no network), so this tower NEVER loads
from a hand-written config. Its architecture is derived from the exported
graph itself (``onnx_reader.derive_mct_cfg`` — embedding tables, dw-conv
kernel shapes, per-block FFN dims, head counts from reshape constants,
mask constants), its weights recovered by consumption order
(``_structural_mct``), and the conversion SELF-VERIFIES: the converted
native tower is compared against the generic ONNX executor on the same
graph at load time, and any mismatch falls back to the executor
(text.py). A structure misread therefore cannot produce silently-wrong
embeddings — it produces the round-3 behavior.

Architecture (inference/reparameterized form):

    token_embed + pos_embed
    -> N conv blocks:   x = x + dwconv1d(x)            (token mixing)
                        x = x + fc2(act(fc1(ln(x))))   (ConvFFN, optional)
    -> M transformer blocks (pre-LN MHA + MLP, same as text_transformer)
    -> ln_final -> pool (argmax-EOT | last) -> projection -> L2 normalize

TPU shape notes: the dw conv runs as k shifted elementwise multiplies on
the [B, T, C] block (T <= 77, k <= 11 — a conv layout change would cost
more than the taps); the transformer blocks are stacked on axis 0 and
scanned exactly like text_transformer so the packed attention kernel and
fused int8 paths apply unchanged.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..ops.attention import causal_mask, multi_head_attention
from ..ops.layers import ACTIVATIONS, layer_norm, linear, mlp
from ..ops.normalize import l2_normalize

Params = dict


@dataclass(frozen=True)
class MctCfg:
    """Resolved hybrid-text architecture; every field is graph-derived
    (onnx_reader.derive_mct_cfg) — see the module docstring."""

    context_length: int
    vocab_size: int
    width: int
    heads: int
    layers: int                       # transformer layers
    mlp_hidden: int                   # transformer MLP hidden
    embed_dim: int
    # per conv block: (dw kernel size, ffn hidden dim; 0 = no ConvFFN)
    conv_blocks: tuple[tuple[int, int], ...]
    activation: str = "gelu"
    causal: bool = True
    pool: str = "argmax"              # argmax (CLIP EOT) | last
    proj_bias: bool = False
    use_proj: bool = True
    ln_eps: float = 1e-5

    @property
    def head_dim(self) -> int:
        return self.width // self.heads


def init(key: jax.Array, cfg: MctCfg, *, dtype=jnp.float32) -> Params:
    """Random init (tests / verify drives; production loads converted
    graphs)."""
    from .vit import ViTCfg, _init_block, _init_linear, _init_ln

    shim = ViTCfg(
        image_size=1, patch_size=1, width=cfg.width, layers=cfg.layers,
        heads=cfg.heads, mlp_hidden=cfg.mlp_hidden, embed_dim=cfg.embed_dim,
        activation=cfg.activation, ln_eps=cfg.ln_eps,
    )
    keys = jax.random.split(key, 5 + len(cfg.conv_blocks))
    params: Params = {
        "token_embed": (
            jax.random.normal(keys[0], (cfg.vocab_size, cfg.width)) * 0.02
        ).astype(dtype),
        "pos_embed": (
            jax.random.normal(keys[1], (cfg.context_length, cfg.width)) * 0.01
        ).astype(dtype),
        "ln_final": _init_ln(cfg.width, dtype),
    }
    conv_blocks = []
    for i, (k, ffn_hidden) in enumerate(cfg.conv_blocks):
        bkeys = jax.random.split(keys[4 + i], 3)
        block: dict = {"mixer": {
            "w": (jax.random.normal(bkeys[0], (k, cfg.width))
                  * (1.0 / k)).astype(dtype),
            "b": jnp.zeros((cfg.width,), dtype),
        }}
        if ffn_hidden:
            block["ffn"] = {
                "ln": _init_ln(cfg.width, dtype),
                "fc": _init_linear(bkeys[1], cfg.width, ffn_hidden,
                                   std=0.02, dtype=dtype),
                "proj": _init_linear(bkeys[2], ffn_hidden, cfg.width,
                                     std=0.02, dtype=dtype),
            }
        conv_blocks.append(block)
    params["conv_blocks"] = conv_blocks
    blocks = [_init_block(k2, shim, dtype)
              for k2 in jax.random.split(keys[2], cfg.layers)]
    params["blocks"] = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    if cfg.use_proj:
        params["proj"] = _init_linear(
            keys[3], cfg.width, cfg.embed_dim, bias=cfg.proj_bias,
            std=cfg.width ** -0.5, dtype=dtype)
    return params


def _dwconv1d(p: Params, x: jax.Array) -> jax.Array:
    """Depthwise 1-D conv over the sequence axis of [B, T, C], SAME
    padding, as k shifted elementwise multiplies (T <= 77: cheaper than
    any conv relayout; XLA fuses the taps into one VPU pass chain)."""
    w = p["w"].astype(x.dtype)          # [k, C]
    k = w.shape[0]
    t = x.shape[1]
    pad_l = (k - 1) // 2
    xp = jnp.pad(x, ((0, 0), (pad_l, k - 1 - pad_l), (0, 0)))
    y = sum(xp[:, j:j + t, :] * w[j][None, None, :] for j in range(k))
    return y + p["b"].astype(x.dtype)


def apply(
    params: Params,
    input_ids: jax.Array,
    cfg: MctCfg,
    *,
    normalize: bool = True,
    attn_impl: str = "xla",
) -> jax.Array:
    """Forward: [B, context_length] int32 token ids → [B, embed_dim]."""
    act = ACTIVATIONS[cfg.activation]
    x = params["token_embed"][input_ids]
    x = x + params["pos_embed"].astype(x.dtype)[None, : x.shape[1]]

    for block in params["conv_blocks"]:
        x = x + _dwconv1d(block["mixer"], x)
        if "ffn" in block:
            f = block["ffn"]
            x = mlp(f, x, activation=act, pre_ln=f["ln"], ln_eps=cfg.ln_eps,
                    residual=True)

    mask = causal_mask(x.shape[1]) if cfg.causal else None

    def body(carry, block):
        h = multi_head_attention(
            block["attn"], carry, num_heads=cfg.heads, mask=mask,
            impl=attn_impl, pre_ln=block["ln1"], ln_eps=cfg.ln_eps,
            residual=carry,
        )
        return mlp(block["mlp"], h, activation=act, pre_ln=block["ln2"],
                   ln_eps=cfg.ln_eps, residual=True), None

    x, _ = jax.lax.scan(body, x, params["blocks"])

    x = layer_norm(params["ln_final"], x, eps=cfg.ln_eps)
    if cfg.pool == "argmax":
        eot = jnp.argmax(input_ids, axis=-1)
        pooled = jnp.take_along_axis(x, eot[:, None, None], axis=1)[:, 0]
    else:  # last
        pooled = x[:, -1]
    if cfg.use_proj and "proj" in params:
        pooled = linear(params["proj"], pooled)
    if normalize:
        pooled = l2_normalize(pooled)
    return pooled
