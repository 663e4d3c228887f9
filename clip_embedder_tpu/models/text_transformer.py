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
    # CoCa text tower (open_clip TextTransformer embed_cls=True): a learned
    # cls token is APPENDED to the sequence, the causal mask is combined
    # with open_clip's build_cls_mask (replicated literally, including its
    # one-column shift), pooling is the cls (last) position, and ln_final
    # applies to the pooled vector only. The reference runs CoCa solely as
    # an exported ONNX graph (src/onnx.rs:13-29).
    embed_cls: bool = False
    pad_id: int = 0

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
    num_pos = cfg.context_length + (1 if cfg.embed_cls else 0)
    params: Params = {
        "token_embed": (
            jax.random.normal(keys[0], (cfg.vocab_size, cfg.width)) * 0.02
        ).astype(dtype),
        "pos_embed": (
            jax.random.normal(keys[1], (num_pos, cfg.width)) * 0.01
        ).astype(dtype),
        "ln_final": _init_ln(cfg.width, dtype),
    }
    if cfg.embed_cls:
        params["cls_emb"] = (
            jax.random.normal(keys[4], (1, 1, cfg.width)) * 0.01
        ).astype(dtype)
    block_keys = jax.random.split(keys[2], cfg.layers)
    blocks = [_init_block(k, shim, dtype) for k in block_keys]
    params["blocks"] = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    if cfg.use_proj:
        params["proj"] = _init_linear(
            keys[3], cfg.width, cfg.embed_dim, bias=cfg.proj_bias,
            std=cfg.width ** -0.5, dtype=dtype,
        )
    return params


def _cls_mask(input_ids: jax.Array, pad_id: int) -> jax.Array:
    """open_clip ``TextTransformer.build_cls_mask``, replicated literally.

    For ids [B, S] the returned additive mask is [B, 1, S+1, S+1]: rows
    0..S-1 (the text-token queries) are all zero, and the last row (the
    appended cls query) masks column j+1 when token j is padding, with
    column 0 always open. The one-column shift — token j's pad status
    lands on column j+1, not j — matches open_clip's
    ``F.pad(cls_mask, (1, 0, S, 0), value=True)`` exactly; reproducing the
    shipped behavior matters because the reference runs graphs exported
    from that code (pull_onnx.py:288-302)."""
    b, s = input_ids.shape
    keep = jnp.concatenate(
        [jnp.ones((b, 1), bool), input_ids != pad_id], axis=1)  # [B, S+1]
    last_row = jnp.where(keep, 0.0, -jnp.inf)[:, None, :]       # [B, 1, S+1]
    is_cls_row = (jnp.arange(s + 1) == s)[None, :, None]        # [1, S+1, 1]
    return jnp.where(is_cls_row, last_row, 0.0)[:, None]        # [B,1,S+1,S+1]


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
    if cfg.embed_cls:
        cls = jnp.broadcast_to(
            params["cls_emb"].astype(x.dtype), (x.shape[0], 1, cfg.width))
        x = jnp.concatenate([x, cls], axis=1)
    x = x + params["pos_embed"].astype(x.dtype)[None, : x.shape[1]]

    mask = causal_mask(x.shape[1]) if cfg.causal else None
    if cfg.embed_cls:
        cls_add = _cls_mask(input_ids, cfg.pad_id)
        mask = cls_add if mask is None else mask + cls_add

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

    if cfg.embed_cls:
        # open_clip embed_cls path: pool the appended cls (last position),
        # THEN ln_final on the pooled vector only
        pooled = layer_norm(params["ln_final"], x[:, -1], eps=cfg.ln_eps)
        if cfg.use_proj and "proj" in params:
            pooled = linear(params["proj"], pooled)
        if normalize:
            pooled = l2_normalize(pooled)
        return pooled

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
