"""Text transformer towers, from scratch.

TPU-native replacement for the graphs inside the reference's ``text.onnx``
(open_clip TextTransformer exported via torch.onnx, run by ONNX Runtime —
reference: pull_onnx.py:288-302, src/text.rs:150-169). One config-driven
implementation covers:

* classic CLIP text tower: causal mask, argmax-EOT pooling (the hidden state
  at the position of the highest token id — the <end_of_text> token),
  bias-free projection, quick_gelu option;
* SigLIP text tower: bidirectional (``no_causal_mask``), "last"-token
  pooling at the fixed final context position, projection with bias,
  tanh-gelu.

Same TPU-first structure as the vision tower: stacked blocks under
``lax.scan``, f32 LayerNorm/softmax, static [B, context_length] shapes
(tokenization always pads/truncates to context_length, matching
reference src/text.rs:76-85).
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
class TextCfgResolved:
    """Resolved text-tower architecture (built from open_clip_config's
    ``text_cfg`` by clip_embedder_tpu.models.build)."""

    context_length: int
    vocab_size: int
    width: int
    heads: int
    layers: int
    mlp_hidden: int
    embed_dim: int
    activation: str = "gelu"
    causal: bool = True
    pool: str = "argmax"       # argmax (CLIP EOT) | last | first | mean
    proj_bias: bool = False
    use_proj: bool = True
    ln_eps: float = 1e-5

    @property
    def head_dim(self) -> int:
        return self.width // self.heads


def init(key: jax.Array, cfg: TextCfgResolved, *, dtype=jnp.float32) -> Params:
    from .vit import _init_block, _init_ln, _init_linear, ViTCfg

    # Reuse the block initializer via a shim cfg with matching fields.
    shim = ViTCfg(
        image_size=1, patch_size=1, width=cfg.width, layers=cfg.layers,
        heads=cfg.heads, mlp_hidden=cfg.mlp_hidden, embed_dim=cfg.embed_dim,
        activation=cfg.activation, ln_eps=cfg.ln_eps,
    )
    keys = jax.random.split(key, 5)
    params: Params = {
        "token_embed": (
            jax.random.normal(keys[0], (cfg.vocab_size, cfg.width)) * 0.02
        ).astype(dtype),
        "pos_embed": (
            jax.random.normal(keys[1], (cfg.context_length, cfg.width)) * 0.01
        ).astype(dtype),
        "ln_final": _init_ln(cfg.width, dtype),
    }
    block_keys = jax.random.split(keys[2], cfg.layers)
    blocks = [_init_block(k, shim, dtype) for k in block_keys]
    params["blocks"] = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    if cfg.use_proj:
        params["proj"] = _init_linear(
            keys[3], cfg.width, cfg.embed_dim, bias=cfg.proj_bias,
            std=cfg.width ** -0.5, dtype=dtype,
        )
    return params


def apply(
    params: Params,
    input_ids: jax.Array,
    cfg: TextCfgResolved,
    *,
    normalize: bool = True,
    attn_impl: str = "xla",
    remat: bool = False,
) -> jax.Array:
    """Forward: [B, context_length] int32 token ids → [B, embed_dim].

    Matches open_clip ``encode_text(..., normalize=True)`` semantics
    (reference bakes this into its export — pull_onnx.py:66-68).
    """
    act = ACTIVATIONS[cfg.activation]
    x = params["token_embed"][input_ids]
    x = x + params["pos_embed"].astype(x.dtype)[None, : x.shape[1]]

    mask = causal_mask(x.shape[1]) if cfg.causal else None

    def body(carry, block):
        # ln1/ln2 pass through so the Pallas/int8 paths fuse them in-kernel
        h = multi_head_attention(
            block["attn"], carry, num_heads=cfg.heads, mask=mask,
            impl=attn_impl, pre_ln=block["ln1"], ln_eps=cfg.ln_eps,
            residual=carry,
        )
        carry = h
        # residual fuses into the quantized kernel epilogue
        carry = mlp(
            block["mlp"], carry, activation=act,
            pre_ln=block["ln2"], ln_eps=cfg.ln_eps, residual=True,
        )
        return carry, None

    if remat:
        body = jax.checkpoint(body)
    x, _ = jax.lax.scan(body, x, params["blocks"])
    x = layer_norm(params["ln_final"], x, eps=cfg.ln_eps)

    if cfg.pool == "argmax":
        # CLIP: features at the EOT token, located by the highest token id.
        eot = jnp.argmax(input_ids, axis=-1)
        pooled = jnp.take_along_axis(x, eot[:, None, None], axis=1)[:, 0]
    elif cfg.pool == "last":
        pooled = x[:, -1]
    elif cfg.pool == "first":
        pooled = x[:, 0]
    else:  # mean
        pooled = jnp.mean(x, axis=1)

    if cfg.use_proj and "proj" in params:
        pooled = linear(params["proj"], pooled)
    if normalize:
        pooled = l2_normalize(pooled)
    return pooled
