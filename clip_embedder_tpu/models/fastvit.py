"""FastViT / MobileCLIP "MCi" vision towers, inference (reparameterized) form.

MobileCLIP2-S2/S3/S4 — the reference's integration-test and low-latency
model family (reference: tests/integration_test.rs:13, pull_onnx.py:110-116)
— use conv-hybrid FastViT towers. The reference exports them *after* timm's
``reparameterize_model`` fuses all MobileOne branches and BatchNorms, so the
deployed graph is the plain-conv inference form; that is exactly the form
implemented here (training-time branch structure is out of scope, as it is
for the reference).

Structure (FastViT paper; config-driven):
  stem: conv3x3 s2 → dw3x3 s2 → pw1x1 (each conv+bias+gelu, fused MobileOne)
  4 stages of blocks, with a downsample (dw7x7 s2 → pw1x1) between stages:
    - RepMixer block: fused dw3x3 token mixer (residual folded in), then
      ConvFFN (dw7x7 → pw expand → gelu → pw project) with layer scale
    - Attention block: per-channel affine (fused BN) → MHA over flattened
      tokens → layer scale, then ConvFFN with layer scale
    - optional RepCPE (fused dw7x7 positional conv) at stage entry
  final: expand conv (dw3x3-style MobileOne, ×2 channels) → GAP → head →
  projection to embed_dim, L2-normalize.

All convs run NHWC via lax.conv_general_dilated (XLA maps them onto the
MXU); blocks within a homogeneous run are stacked and scanned.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Mapping

import jax
import jax.numpy as jnp
import numpy as np

from ..errors import ConfigError, WeightError
from ..ops.layers import gelu
from ..ops.normalize import l2_normalize

Params = dict

_DN = ("NHWC", "HWIO", "NHWC")


@dataclass(frozen=True)
class FastViTCfg:
    image_size: int
    embed_dim: int
    depths: tuple[int, ...]
    dims: tuple[int, ...]
    mlp_ratios: tuple[float, ...]
    mixers: tuple[str, ...]          # "repmixer" | "attention"
    pos_embs: tuple[bool, ...]       # RepCPE at stage entry
    head_dim: int = 32
    final_conv_ratio: float = 2.0
    use_head_proj: bool = True       # project GAP features to embed_dim
    # timm lkc_use_act: the mci (MobileCLIP) family applies an activation
    # after the large-kernel downsample conv; classic fastvit variants don't
    lkc_act: bool = False


# Known timm fastvit variants (inference-form shapes). MobileCLIP uses the
# mci family; mci3/mci4 dims are inferred at weight-conversion time if they
# differ (see map_fastvit_visual's shape checks).
_FASTVIT_VARIANTS: dict[str, dict] = {
    "fastvit_t8": dict(depths=(2, 2, 4, 2), dims=(48, 96, 192, 384),
                       mlp_ratios=(3, 3, 3, 3),
                       mixers=("repmixer",) * 4, pos_embs=(False,) * 4),
    "fastvit_t12": dict(depths=(2, 2, 6, 2), dims=(64, 128, 256, 512),
                        mlp_ratios=(3, 3, 3, 3),
                        mixers=("repmixer",) * 4, pos_embs=(False,) * 4),
    "fastvit_s12": dict(depths=(2, 2, 6, 2), dims=(64, 128, 256, 512),
                        mlp_ratios=(4, 4, 4, 4),
                        mixers=("repmixer",) * 4, pos_embs=(False,) * 4),
    "fastvit_sa12": dict(depths=(2, 2, 6, 2), dims=(64, 128, 256, 512),
                         mlp_ratios=(4, 4, 4, 4),
                         mixers=("repmixer",) * 3 + ("attention",),
                         pos_embs=(False, False, False, True)),
    "fastvit_sa24": dict(depths=(4, 4, 12, 4), dims=(64, 128, 256, 512),
                         mlp_ratios=(4, 4, 4, 4),
                         mixers=("repmixer",) * 3 + ("attention",),
                         pos_embs=(False, False, False, True)),
    "fastvit_sa36": dict(depths=(6, 6, 18, 6), dims=(64, 128, 256, 512),
                         mlp_ratios=(4, 4, 4, 4),
                         mixers=("repmixer",) * 3 + ("attention",),
                         pos_embs=(False, False, False, True)),
    "fastvit_ma36": dict(depths=(6, 6, 18, 6), dims=(76, 152, 304, 608),
                         mlp_ratios=(4, 4, 4, 4),
                         mixers=("repmixer",) * 3 + ("attention",),
                         pos_embs=(False, False, False, True)),
    # MobileCLIP image encoders
    "fastvit_mci0": dict(lkc_act=True, depths=(2, 6, 10, 2), dims=(64, 128, 256, 512),
                         mlp_ratios=(3, 3, 3, 3),
                         mixers=("repmixer",) * 3 + ("attention",),
                         pos_embs=(False, False, False, True)),
    "fastvit_mci1": dict(lkc_act=True, depths=(4, 12, 20, 4), dims=(64, 128, 256, 512),
                         mlp_ratios=(3, 3, 3, 3),
                         mixers=("repmixer",) * 3 + ("attention",),
                         pos_embs=(False, False, False, True)),
    "fastvit_mci2": dict(lkc_act=True, depths=(4, 12, 24, 4), dims=(80, 160, 320, 640),
                         mlp_ratios=(3, 3, 3, 3),
                         mixers=("repmixer",) * 3 + ("attention",),
                         pos_embs=(False, False, False, True)),
    # MobileCLIP2-S3/S4 (MCi3/MCi4) — dims follow the published scaling;
    # conversion re-checks against checkpoint shapes.
    "fastvit_mci3": dict(lkc_act=True, depths=(4, 12, 24, 4), dims=(96, 192, 384, 768),
                         mlp_ratios=(3, 3, 3, 3),
                         mixers=("repmixer",) * 3 + ("attention",),
                         pos_embs=(False, False, False, True)),
    "fastvit_mci4": dict(lkc_act=True, depths=(4, 12, 24, 4), dims=(128, 256, 512, 1024),
                         mlp_ratios=(3, 3, 3, 3),
                         mixers=("repmixer",) * 3 + ("attention",),
                         pos_embs=(False, False, False, True)),
}


_ALIASES = {
    "mobileclip_s0": "fastvit_mci0", "mobileclip_s1": "fastvit_mci1",
    "mobileclip_s2": "fastvit_mci2", "mobileclip2_s2": "fastvit_mci2",
    "mobileclip2_s3": "fastvit_mci3", "mobileclip2_s4": "fastvit_mci4",
}


# Variants whose structure comes from the published scaling recipe only —
# no in-env anchor (no timm, no real checkpoint) has ever confirmed the dims
# or the ConvFFN BN-fold for them (see COMPONENTS.md evidence table).
_UNANCHORED_VARIANTS = frozenset({"fastvit_mci3", "fastvit_mci4"})


def resolve_fastvit(name: str, vcfg, embed_dim: int, model_cfg) -> FastViTCfg:
    resolved = name if name in _FASTVIT_VARIANTS else _ALIASES.get(name, "")
    base = _FASTVIT_VARIANTS.get(resolved)
    if base is None:
        # normalize bare aliases like "mci2"
        for key in _FASTVIT_VARIANTS:
            if key.endswith(name) or name.endswith(key.removeprefix("fastvit_")):
                base, resolved = _FASTVIT_VARIANTS[key], key
                break
    if base is None:
        raise ConfigError(f"Unknown FastViT variant '{name}'")
    override = vcfg.extra.get("fastvit_cfg", {})
    if resolved in _UNANCHORED_VARIANTS and "dims" not in override:
        # dirs that arrived as ONNX exports carry graph-derived dims in the
        # override (vision._maybe_derive_vision_dims → derive_fastvit_cfg);
        # only a table-seeded load without that ground truth warns
        from ..utils.logging import warn_once

        warn_once(
            resolved,
            "FastViT variant '%s' uses structure-from-paper dims that have "
            "no independent anchor in this build (golden fixtures pin "
            "today's numerics; real-checkpoint conversion re-checks shapes "
            "and fails loudly on mismatch)", resolved)
    merged = {**base, **override}
    return FastViTCfg(
        image_size=vcfg.image_size,
        embed_dim=embed_dim,
        depths=tuple(merged["depths"]),
        dims=tuple(merged["dims"]),
        mlp_ratios=tuple(merged["mlp_ratios"]),
        mixers=tuple(merged["mixers"]),
        pos_embs=tuple(merged["pos_embs"]),
        head_dim=int(merged.get("head_dim", 32)),
        final_conv_ratio=float(merged.get("final_conv_ratio", 2.0)),
        use_head_proj=bool(merged.get("use_head_proj", True)),
        lkc_act=bool(merged.get("lkc_act", False)),
    )


def derive_fastvit_cfg_from_sd(sd: Mapping[str, np.ndarray]) -> dict:
    """Derive the stage architecture from a reparameterized timm fastvit
    state dict's shapes — the checkpoint-path analog of
    ``onnx_reader.derive_fastvit_cfg`` (the exporter pattern: read the real
    model, never a table — reference: pull_onnx.py:93-150). Used by
    pull_weights.py at conversion time so the paper-table rows for the
    unanchored MCi3/MCi4 variants are bypassed whenever a checkpoint
    exists; the table only seeds bare-config construction.

    Not shape-derivable (kept from the family defaults): ``head_dim``
    (timm's fastvit attention uses a fixed 32 across every variant — the
    packed qkv is [3d, d] regardless) and ``lkc_act`` (an activation
    placement, not a weight; family-level mci-vs-classic fact).

    Raises WeightError when the dict is not fastvit-shaped.
    """
    import re

    from ..weights import strip_prefix

    shapes = {k: tuple(np.asarray(v).shape) for k, v in strip_prefix(
        dict(sd), "model.", "visual.", "trunk.").items()}

    def conv_shape(*prefixes):
        for p in prefixes:
            s = shapes.get(f"{p}.weight")
            if s is not None:
                return s
        return None

    stem0 = conv_shape("stem.0.reparam_conv", "stem.0.conv")
    if stem0 is None or len(stem0) != 4 or stem0[1] != 3:
        raise WeightError(
            "state dict has no fastvit RGB stem conv (stem.0.reparam_conv)")
    stage_ids = sorted({int(m.group(1)) for k in shapes
                        if (m := re.match(r"stages\.(\d+)\.", k))})
    if not stage_ids or stage_ids != list(range(len(stage_ids))):
        raise WeightError("state dict has no contiguous fastvit stages")

    depths, dims, ratios, mixers, pos_embs = [], [], [], [], []
    cur = int(stem0[0])
    for si in stage_ids:
        sp = f"stages.{si}"
        ds = conv_shape(f"{sp}.downsample.proj.1.reparam_conv",
                        f"{sp}.downsample.proj.1.conv")
        if ds is not None:
            cur = int(ds[0])
        elif si > 0:
            raise WeightError(f"fastvit stage {si} has no downsample")
        dims.append(cur)
        block_ids = sorted({
            int(m.group(1)) for k in shapes
            if (m := re.match(rf"stages\.{si}\.blocks\.(\d+)\.", k))})
        if not block_ids:
            raise WeightError(f"fastvit stage {si} has no blocks")
        depths.append(len(block_ids))
        mixers.append("attention"
                      if f"{sp}.blocks.0.token_mixer.qkv.weight" in shapes
                      else "repmixer")
        pos_embs.append(f"{sp}.pos_emb.reparam_conv.weight" in shapes)
        fc1 = conv_shape(f"{sp}.blocks.0.mlp.fc1")
        if fc1 is None:
            raise WeightError(f"fastvit stage {si} has no ConvFFN fc1")
        ratios.append(int(fc1[0]) / cur)

    fin = conv_shape("final_conv.reparam_conv", "final_conv.conv")
    if fin is None:
        raise WeightError("state dict has no final expand conv")
    return {
        "depths": tuple(depths),
        "dims": tuple(dims),
        "mlp_ratios": tuple(ratios),
        "mixers": tuple(mixers),
        "pos_embs": tuple(pos_embs),
        "final_conv_ratio": int(fin[0]) / dims[-1],
        "use_head_proj": any(f"{k}.weight" in shapes
                             for k in ("head.fc", "head.proj", "head")),
    }


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _conv_init(key, k, cin, cout, groups=1, dtype=jnp.float32):
    fan_in = k * k * cin // groups
    w = jax.random.normal(key, (k, k, cin // groups, cout)) * (fan_in ** -0.5)
    return {"w": w.astype(dtype), "b": jnp.zeros((cout,), dtype)}


def _conv(params, x, *, stride=1, groups=1):
    if "w_q" in params:
        # int8-quantized 1×1 conv (ops.quant squeezes it to matmul form):
        # NHWC 1×1 conv ≡ a matmul over the channel axis — only valid
        # unstrided/ungrouped (quantize_tree only converts such convs)
        assert stride == 1 and groups == 1, (
            "quantized conv routed to linear() must be stride-1/group-1")
        from ..ops.layers import linear

        return linear(params, x)
    pad = (params["w"].shape[0] - 1) // 2
    y = jax.lax.conv_general_dilated(
        x, params["w"].astype(x.dtype),
        window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=_DN,
        feature_group_count=groups,
        preferred_element_type=jnp.float32,
    )
    return (y + params["b"].astype(jnp.float32)).astype(x.dtype)


def _convffn_init(key, dim, hidden, dtype):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "dw": _conv_init(k1, 7, dim, dim, groups=dim, dtype=dtype),
        "fc1": _conv_init(k2, 1, dim, hidden, dtype=dtype),
        "fc2": _conv_init(k3, 1, hidden, dim, dtype=dtype),
        "ls": jnp.full((dim,), 1e-5, dtype),
    }


def _attnblock_init(key, dim, head_dim, dtype):
    from .vit import _init_attn

    ka, _ = jax.random.split(key)
    return {
        "affine": {"scale": jnp.ones((dim,), dtype),
                   "bias": jnp.zeros((dim,), dtype)},
        "attn": _init_attn(ka, dim, dtype=dtype),
        "ls": jnp.full((dim,), 1e-5, dtype),
    }


def init(key: jax.Array, cfg: FastViTCfg, *, dtype=jnp.float32) -> Params:
    keys = jax.random.split(key, 16)
    c0 = cfg.dims[0]
    params: Params = {
        "stem": [
            _conv_init(keys[0], 3, 3, c0, dtype=dtype),
            _conv_init(keys[1], 3, c0, c0, groups=c0, dtype=dtype),
            _conv_init(keys[2], 1, c0, c0, dtype=dtype),
        ],
        "stages": [],
    }
    for i, (depth, dim) in enumerate(zip(cfg.depths, cfg.dims)):
        skey = jax.random.fold_in(keys[3], i)
        stage: Params = {}
        if i > 0:
            k1, k2 = jax.random.split(jax.random.fold_in(skey, 999))
            stage["downsample"] = {
                "dw": _conv_init(k1, 7, cfg.dims[i - 1], cfg.dims[i - 1],
                                 groups=cfg.dims[i - 1], dtype=dtype),
                "pw": _conv_init(k2, 1, cfg.dims[i - 1], dim, dtype=dtype),
            }
        if cfg.pos_embs[i]:
            stage["cpe"] = _conv_init(jax.random.fold_in(skey, 998), 7, dim,
                                      dim, groups=dim, dtype=dtype)
        hidden = int(dim * cfg.mlp_ratios[i])
        blocks = []
        for j in range(depth):
            bkey = jax.random.fold_in(skey, j)
            k1, k2 = jax.random.split(bkey)
            block: Params = {"ffn": _convffn_init(k2, dim, hidden, dtype)}
            if cfg.mixers[i] == "repmixer":
                block["mixer"] = _conv_init(k1, 3, dim, dim, groups=dim,
                                            dtype=dtype)
            else:
                block["mixer"] = _attnblock_init(k1, dim,
                                                 cfg.head_dim, dtype)
            blocks.append(block)
        stage["blocks"] = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
        params["stages"].append(stage)

    c_last = cfg.dims[-1]
    c_final = int(c_last * cfg.final_conv_ratio)
    params["final_conv"] = _conv_init(keys[4], 3, c_last, c_final,
                                      groups=c_last, dtype=dtype)
    if cfg.use_head_proj:
        from .vit import _init_linear

        params["head"] = _init_linear(keys[5], c_final, cfg.embed_dim,
                                      bias=False, dtype=dtype)
    return params


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _convffn(p: Params, x: jax.Array) -> jax.Array:
    dim = x.shape[-1]
    y = _conv(p["dw"], x, groups=dim)
    y = _conv(p["fc1"], y)
    y = gelu(y)
    y = _conv(p["fc2"], y)
    return x + p["ls"].astype(x.dtype) * y


def _attention_mix(p: Params, x: jax.Array, head_dim: int) -> jax.Array:
    from ..ops.attention import multi_head_attention

    b, h, w, c = x.shape
    y = x * p["affine"]["scale"].astype(x.dtype) + p["affine"]["bias"].astype(x.dtype)
    tokens = y.reshape(b, h * w, c)
    mixed = multi_head_attention(p["attn"], tokens, num_heads=c // head_dim)
    mixed = mixed.reshape(b, h, w, c)
    return x + p["ls"].astype(x.dtype) * mixed


def apply(params: Params, pixels: jax.Array, cfg: FastViTCfg, *,
          normalize: bool = True) -> jax.Array:
    """[B, H, W, 3] → [B, embed_dim]."""
    x = pixels
    s = params["stem"]
    x = gelu(_conv(s[0], x, stride=2))
    x = gelu(_conv(s[1], x, stride=2, groups=x.shape[-1]))
    x = gelu(_conv(s[2], x))

    for i, stage in enumerate(params["stages"]):
        if "downsample" in stage:
            d = stage["downsample"]
            x = _conv(d["dw"], x, stride=2, groups=x.shape[-1])
            if cfg.lkc_act:  # timm lkc_use_act (mci family only)
                x = gelu(x)
            x = gelu(_conv(d["pw"], x))
        if "cpe" in stage:
            x = _conv(stage["cpe"], x, groups=x.shape[-1])

        mixer_kind = cfg.mixers[i]

        def block_fn(carry, block):
            if mixer_kind == "repmixer":
                carry = _conv(block["mixer"], carry, groups=carry.shape[-1])
            else:
                carry = _attention_mix(block["mixer"], carry, cfg.head_dim)
            carry = _convffn(block["ffn"], carry)
            return carry, None

        x, _ = jax.lax.scan(block_fn, x, stage["blocks"])

    x = gelu(_conv(params["final_conv"], x, groups=x.shape[-1]))
    # f32 pooling accumulation (bf16 reduction over many positions loses
    # digits — same rationale as ops.layers.layer_norm)
    pooled = jnp.mean(x.astype(jnp.float32), axis=(1, 2)).astype(x.dtype)
    if "head" in params:
        from ..ops.layers import linear

        pooled = linear(params["head"], pooled)
    if normalize:
        pooled = l2_normalize(pooled)
    return pooled


# ---------------------------------------------------------------------------
# weight mapping (timm fastvit naming, reparameterized checkpoints)
# ---------------------------------------------------------------------------

def _conv_from(sd: Mapping[str, np.ndarray], prefix: str) -> Params:
    """torch Conv2d [O, I/g, K, K] → HWIO."""
    w = sd.get(f"{prefix}.weight")
    if w is None:
        raise WeightError(f"Missing conv '{prefix}.weight'")
    w = np.asarray(w)
    p = {"w": np.ascontiguousarray(w.transpose(2, 3, 1, 0))}
    b = sd.get(f"{prefix}.bias")
    p["b"] = np.asarray(b) if b is not None else np.zeros(w.shape[0], w.dtype)
    return p


def map_fastvit_visual(sd: Mapping[str, np.ndarray]) -> Params:
    """Map a reparameterized timm fastvit state dict (``visual.trunk.*``)
    onto the FastViT pytree.

    timm inference-form naming: MobileOneBlock → ``reparam_conv``; RepMixer
    → ``reparam_conv``; RepCPE → ``reparam_conv``; ConvFFN → ``conv.conv``
    (fused dw) + ``fc1``/``fc2``; attention affine comes from the fused
    ``norm`` of the attention block.
    """
    from ..weights import strip_prefix, _linear, _stack_blocks

    sd = {k: np.asarray(v) for k, v in strip_prefix(
        dict(sd), "model.", "visual.", "trunk.").items()}

    def conv_any(*prefixes):
        for p in prefixes:
            if f"{p}.weight" in sd:
                return _conv_from(sd, p)
        raise WeightError(f"None of {prefixes} found in checkpoint")

    params: Params = {
        "stem": [
            conv_any("stem.0.reparam_conv", "stem.0.conv"),
            conv_any("stem.1.reparam_conv", "stem.1.conv"),
            conv_any("stem.2.reparam_conv", "stem.2.conv"),
        ],
        "stages": [],
    }

    import re

    stage_ids = sorted({
        int(m.group(1)) for k in sd
        if (m := re.match(r"stages\.(\d+)\.", k))
    })
    for si in stage_ids:
        sp = f"stages.{si}"
        stage: Params = {}
        if f"{sp}.downsample.proj.0.lkb_reparam.weight" in sd or \
           f"{sp}.downsample.proj.0.reparam_conv.weight" in sd:
            stage["downsample"] = {
                "dw": conv_any(f"{sp}.downsample.proj.0.lkb_reparam",
                               f"{sp}.downsample.proj.0.reparam_conv"),
                "pw": conv_any(f"{sp}.downsample.proj.1.reparam_conv",
                               f"{sp}.downsample.proj.1.conv"),
            }
        if f"{sp}.pos_emb.reparam_conv.weight" in sd:
            stage["cpe"] = _conv_from(sd, f"{sp}.pos_emb.reparam_conv")

        block_ids = sorted({
            int(m.group(1)) for k in sd
            if (m := re.match(rf"stages\.{si}\.blocks\.(\d+)\.", k))
        })
        blocks = []
        for bi in block_ids:
            bp = f"{sp}.blocks.{bi}"
            block: Params = {}
            if f"{bp}.token_mixer.reparam_conv.weight" in sd:
                block["mixer"] = _conv_from(sd, f"{bp}.token_mixer.reparam_conv")
                ffn_prefix = f"{bp}.mlp"  # timm RepMixerBlock: .mlp
                ls_key = f"{bp}.layer_scale.gamma"
            else:
                qkv = sd.get(f"{bp}.token_mixer.qkv.weight")
                if qkv is None:
                    raise WeightError(f"Block '{bp}' has neither repmixer nor attention")
                from ..weights import _split_qkv, fold_bn_affine

                attn = _split_qkv(qkv, sd.get(f"{bp}.token_mixer.qkv.bias"))
                attn["out"] = _linear(sd, f"{bp}.token_mixer.proj")
                # fold the (unfused) BatchNorm into a per-channel affine
                gamma = np.asarray(sd[f"{bp}.norm.weight"], np.float64)
                beta = np.asarray(sd[f"{bp}.norm.bias"], np.float64)
                mean_ = sd.get(f"{bp}.norm.running_mean")
                var_ = sd.get(f"{bp}.norm.running_var")
                if mean_ is not None and var_ is not None:
                    scale, bias = fold_bn_affine(gamma, beta, mean_, var_)
                else:
                    scale, bias = gamma, beta
                block["mixer"] = {
                    "affine": {
                        "scale": scale.astype(np.float32),
                        "bias": bias.astype(np.float32),
                    },
                    "attn": attn,
                    "ls": np.asarray(sd[f"{bp}.layer_scale_1.gamma"]).reshape(-1),
                }
                ffn_prefix = f"{bp}.mlp"
                ls_key = f"{bp}.layer_scale_2.gamma"
            dw = conv_any(f"{ffn_prefix}.conv.conv", f"{ffn_prefix}.conv")
            # timm ConvMlp's depthwise conv is ConvNormAct: conv (bias-free)
            # followed by a BatchNorm that reparameterize_model does NOT
            # fuse — fold it here (w·s per out-channel, b = β − mean·s).
            bn_prefix = f"{ffn_prefix}.conv.bn"
            if f"{bn_prefix}.weight" in sd:
                from ..weights import fold_bn_affine

                scale, bn_bias = fold_bn_affine(
                    sd[f"{bn_prefix}.weight"], sd[f"{bn_prefix}.bias"],
                    sd[f"{bn_prefix}.running_mean"],
                    sd[f"{bn_prefix}.running_var"])
                dw["w"] = (dw["w"] * scale[None, None, None, :]).astype(np.float32)
                dw["b"] = (np.asarray(dw["b"], np.float64) * scale
                           + bn_bias).astype(np.float32)
            block["ffn"] = {
                "dw": dw,
                "fc1": _conv_from(sd, f"{ffn_prefix}.fc1"),
                "fc2": _conv_from(sd, f"{ffn_prefix}.fc2"),
                "ls": np.asarray(sd[ls_key]).reshape(-1),
            }
            blocks.append(block)
        stage["blocks"] = _stack_blocks(blocks)
        params["stages"].append(stage)

    params["final_conv"] = conv_any("final_conv.reparam_conv", "final_conv.conv")
    for head_key in ("head.fc", "head.proj", "head"):
        if f"{head_key}.weight" in sd:
            params["head"] = _linear(sd, head_key)
            break
    return params
