"""HF (BERT/RoBERTa-style) text towers — the ``hf_model_name`` branch of
open_clip text configs (e.g. BiomedCLIP's PubMedBERT, laion's
xlm-roberta-large-ViT-H-14), reference: src/config.rs:46
(``hf_tokenizer_name``) and the text graphs that take an ``attention_mask``
input (reference: src/text.rs:156-161).

From-scratch post-LN BERT encoder in JAX: embeddings (word + position +
token-type, LayerNorm), blocks of self-attention → residual+LN → MLP →
residual+LN with additive key-padding mask derived from the pad id, then an
open_clip-style pooler (CLS or masked mean) and projection (linear or MLP).
RoBERTa-class models (``model_type`` roberta / xlm-roberta / camembert)
differ only in the embeddings: position ids are derived from the pad id
(pads pinned to ``padding_idx``, real tokens numbered from
``padding_idx + 1``) against a ``max_position_embeddings``-sized table.
Parity vs transformers.BertModel / XLMRobertaModel is tested in
tests/test_hf_text.py.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Mapping

import jax
import jax.numpy as jnp
import numpy as np

from ..errors import ConfigError, WeightError
from ..ops.attention import multi_head_attention
from ..ops.layers import ACTIVATIONS, layer_norm, linear, mlp

Params = dict


@dataclass(frozen=True)
class BertCfg:
    context_length: int
    vocab_size: int
    width: int
    heads: int
    layers: int
    mlp_hidden: int
    embed_dim: int
    pad_id: int = 0
    activation: str = "gelu"
    pooler: str = "cls"          # cls | cls_pooler | mean | max
    proj: str = "linear"         # linear | mlp | none
    ln_eps: float = 1e-12
    position_style: str = "bert"  # bert (0..L-1) | roberta (pad-id offset)
    max_pos: int = 0             # position-table rows; 0 → context_length


def resolve_hf_text(model_cfg) -> BertCfg:
    """Resolve a BertCfg from open_clip's text_cfg. Architecture dims come
    from ``hf_config`` (stored into the model dir by pull_weights.py at
    conversion time, since the reference dir contract carries no HF
    config.json)."""
    t = model_cfg.text_cfg
    hf_cfg = t.extra.get("hf_config")
    if not hf_cfg:
        raise ConfigError(
            "hf_model_name text towers need text_cfg.hf_config "
            "(written by pull_weights.py at conversion time)"
        )
    # open_clip pooler types: cls_pooler (BERT pooler_output =
    # tanh(dense(CLS))), cls_last_hidden_state_pooler (raw CLS),
    # mean_pooler (masked mean), max_pooler (masked max).
    # Key spelling varies by open_clip era: BiomedCLIP-class configs use
    # "pooler_type"/"proj"; current open_clip uses "hf_pooler_type"/
    # "hf_proj_type" ("proj_type" kept for fixtures/back-compat).
    pooler_type = next(
        (t.extra[k] for k in ("hf_pooler_type", "pooler_type")
         if t.extra.get(k)), "cls_last_hidden_state_pooler")
    if pooler_type == "cls_pooler":
        pooler = "cls_pooler"
    elif "mean" in pooler_type:
        pooler = "mean"
    elif "max" in pooler_type:
        pooler = "max"
    else:
        pooler = "cls"
    # open_clip's HFTextEncoder defaults the projection to "mlp" when the
    # tower width differs from embed_dim (identity/"none" when equal)
    default_proj = ("none" if int(hf_cfg["hidden_size"]) == model_cfg.embed_dim
                    else "mlp")
    proj_type = next(
        (t.extra[k] for k in ("hf_proj_type", "proj", "proj_type")
         if t.extra.get(k)), default_proj)
    # RoBERTa-class embeddings: transformers derives position ids from the
    # pad id (create_position_ids_from_input_ids) and sizes the table to
    # max_position_embeddings (= context + pad_id + 2 upstream).
    model_type = str(hf_cfg.get("model_type", "bert")).replace("_", "-")
    roberta = model_type in ("roberta", "xlm-roberta", "xlm-roberta-xl",
                             "camembert")
    return BertCfg(
        context_length=t.context_length,
        vocab_size=int(hf_cfg["vocab_size"]),
        width=int(hf_cfg["hidden_size"]),
        heads=int(hf_cfg["num_attention_heads"]),
        layers=int(hf_cfg["num_hidden_layers"]),
        mlp_hidden=int(hf_cfg["intermediate_size"]),
        embed_dim=model_cfg.embed_dim,
        pad_id=int(hf_cfg.get("pad_token_id", 1 if roberta else 0)),
        pooler=pooler,
        proj={"mlp": "mlp", "none": "none"}.get(proj_type, "linear"),
        ln_eps=float(hf_cfg.get("layer_norm_eps",
                                1e-5 if roberta else 1e-12)),
        position_style="roberta" if roberta else "bert",
        max_pos=int(hf_cfg.get("max_position_embeddings", 0)),
    )


def init(key: jax.Array, cfg: BertCfg, *, dtype=jnp.float32) -> Params:
    from .vit import _init_attn, _init_ln, _init_linear

    keys = jax.random.split(key, 8)
    params: Params = {
        "word_embed": (jax.random.normal(keys[0], (cfg.vocab_size, cfg.width))
                       * 0.02).astype(dtype),
        "pos_embed": (jax.random.normal(
            keys[1],
            (cfg.max_pos or cfg.context_length, cfg.width))
            * 0.02).astype(dtype),
        "type_embed": (jax.random.normal(keys[2], (2, cfg.width))
                       * 0.02).astype(dtype),
        "embed_ln": _init_ln(cfg.width, dtype),
    }
    block_keys = jax.random.split(keys[3], cfg.layers)
    blocks = []
    for bk in block_keys:
        ka, kf, kp = jax.random.split(bk, 3)
        blocks.append({
            "attn": _init_attn(ka, cfg.width, dtype=dtype),
            "attn_ln": _init_ln(cfg.width, dtype),
            "mlp": {
                "fc": _init_linear(kf, cfg.width, cfg.mlp_hidden, dtype=dtype),
                "proj": _init_linear(kp, cfg.mlp_hidden, cfg.width, dtype=dtype),
            },
            "mlp_ln": _init_ln(cfg.width, dtype),
        })
    params["blocks"] = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)

    if cfg.pooler == "cls_pooler":
        # the declared architecture includes the BERT pooler head — init
        # must produce it (apply refuses to silently degrade to raw CLS)
        params["pooler"] = _init_linear(keys[5], cfg.width, cfg.width,
                                        dtype=dtype)
    if cfg.proj == "linear":
        params["proj"] = _init_linear(keys[4], cfg.width, cfg.embed_dim,
                                      bias=False, dtype=dtype)
    elif cfg.proj == "mlp":
        hidden = (cfg.width + cfg.embed_dim) // 2
        k1, k2 = jax.random.split(keys[4])
        params["proj"] = {
            "fc": _init_linear(k1, cfg.width, hidden, dtype=dtype),
            "out": _init_linear(k2, hidden, cfg.embed_dim, bias=False, dtype=dtype),
        }
    return params


def apply(params: Params, input_ids: jax.Array, cfg: BertCfg, *,
          normalize: bool = True, attn_impl: str = "xla",
          attention_mask: jax.Array | None = None) -> jax.Array:
    """[B, L] ids → [B, embed_dim] embedding. The key-padding mask is the
    tokenizer-produced ``attention_mask`` when given (the optional
    attention_mask input of the reference's text graphs,
    src/text.rs:156-161) — the tokenizer's resolved pad id can differ from
    the HF config's ``pad_token_id``, so deriving from ``cfg.pad_id``
    alone would mis-mask such model dirs. Falls back to the
    ``cfg.pad_id`` derivation when no mask is supplied."""
    from ..ops.normalize import l2_normalize

    act = ACTIVATIONS[cfg.activation]
    if attention_mask is not None:
        valid = attention_mask.astype(jnp.float32)  # [B, L]
    else:
        valid = (input_ids != cfg.pad_id).astype(jnp.float32)
    x = params["word_embed"][input_ids]
    if cfg.position_style == "roberta":
        # transformers create_position_ids_from_input_ids: pads sit at
        # padding_idx, real tokens count from padding_idx + 1 — derived
        # from input_ids vs the HF pad id, NOT the attention mask (HF
        # computes them the same way even when a mask is passed).
        real = (input_ids != cfg.pad_id).astype(jnp.int32)
        pos_ids = jnp.cumsum(real, axis=1) * real + cfg.pad_id
        x = x + params["pos_embed"].astype(x.dtype)[pos_ids]
    else:
        # BERT convention: positions 0..L-1; CLS/SEP are real ids.
        x = x + params["pos_embed"].astype(x.dtype)[None, : x.shape[1]]
    x = x + params["type_embed"].astype(x.dtype)[0][None, None, :]
    x = layer_norm(params["embed_ln"], x, eps=cfg.ln_eps)

    # additive mask [B, 1, 1, L]: -inf on padded keys
    neg = jnp.asarray(-1e30, jnp.float32)
    attn_mask = jnp.where(valid, 0.0, neg)[:, None, None, :]

    def body(carry, block):
        h = multi_head_attention(block["attn"], carry, num_heads=cfg.heads,
                                 mask=attn_mask, impl=attn_impl)
        carry = layer_norm(block["attn_ln"], carry + h, eps=cfg.ln_eps)
        h = mlp(block["mlp"], carry, activation=act)
        carry = layer_norm(block["mlp_ln"], carry + h, eps=cfg.ln_eps)
        return carry, None

    x, _ = jax.lax.scan(body, x, params["blocks"])

    if cfg.pooler == "mean":
        denom = jnp.maximum(valid.sum(-1, keepdims=True), 1.0)
        pooled = (x * valid[..., None]).sum(1) / denom
    elif cfg.pooler == "max":
        neg = jnp.asarray(-1e30, x.dtype)
        pooled = jnp.max(jnp.where(valid[..., None] > 0, x, neg), axis=1)
    elif cfg.pooler == "cls_pooler":
        if "pooler" not in params:
            # fail loudly: silently degrading to raw-CLS would produce
            # wrong (non-parity) embeddings with no error
            raise WeightError(
                "pooler_type 'cls_pooler' requires the BERT pooler weights "
                "(pooler.dense.*) — checkpoint was exported without them")
        # BERT pooler_output: tanh(dense(CLS))
        pooled = jnp.tanh(linear(params["pooler"], x[:, 0]))
    else:
        pooled = x[:, 0]

    proj = params.get("proj")
    if proj is not None:
        if cfg.proj == "mlp":
            from ..ops.layers import gelu  # promoted ≥f32 per CLAUDE.md

            pooled = linear(proj["out"], gelu(linear(proj["fc"], pooled)))
        else:
            pooled = linear(proj, pooled)
    if normalize:
        pooled = l2_normalize(pooled)
    return pooled


# -- weight mapping ---------------------------------------------------------

def map_hf_text(sd: Mapping[str, np.ndarray]) -> Params:
    """Map an open_clip HFTextEncoder state dict (``text.transformer.*`` =
    HF BERT naming + ``text.proj``) onto the BertCfg pytree."""
    from ..weights import _linear, _ln, _stack_blocks, strip_prefix, _max_index, _get

    sd = strip_prefix(sd, "model.", "text.")
    sd = strip_prefix(sd, "transformer.")
    sd = strip_prefix(sd, "bert.")
    sd = strip_prefix(sd, "roberta.")

    n = _max_index(sd, r"encoder\.layer\.(\d+)\.attention\.self\.query\.weight")
    blocks = []
    for i in range(n):
        p = f"encoder.layer.{i}"
        blocks.append({
            "attn": {
                "q": _linear(sd, f"{p}.attention.self.query"),
                "k": _linear(sd, f"{p}.attention.self.key"),
                "v": _linear(sd, f"{p}.attention.self.value"),
                "out": _linear(sd, f"{p}.attention.output.dense"),
            },
            "attn_ln": _ln(sd, f"{p}.attention.output.LayerNorm"),
            "mlp": {
                "fc": _linear(sd, f"{p}.intermediate.dense"),
                "proj": _linear(sd, f"{p}.output.dense"),
            },
            "mlp_ln": _ln(sd, f"{p}.output.LayerNorm"),
        })

    params: Params = {
        "word_embed": _get(sd, "embeddings.word_embeddings.weight"),
        "pos_embed": _get(sd, "embeddings.position_embeddings.weight"),
        "type_embed": _get(sd, "embeddings.token_type_embeddings.weight"),
        "embed_ln": _ln(sd, "embeddings.LayerNorm"),
        "blocks": _stack_blocks(blocks),
    }

    if "pooler.dense.weight" in sd:
        params["pooler"] = _linear(sd, "pooler.dense")

    if "proj.weight" in sd:  # linear proj
        params["proj"] = _linear(sd, "proj")
    elif "proj.0.weight" in sd:  # mlp proj: Linear, GELU, Linear
        params["proj"] = {
            "fc": _linear(sd, "proj.0"),
            "out": _linear(sd, "proj.2"),
        }
    return params
