"""ConvNeXt vision towers (laion CLIP-convnext_base_w / _large_d / _xxlarge
class models — the timm ``convnext_*`` branch of open_clip vision configs).

Inference-form ConvNeXt in NHWC JAX: 4×4/s4 patchify stem + LayerNorm,
stages of blocks (depthwise 7×7 conv → channel-LN → pointwise MLP with
gelu → layer-scale → residual) with LN+2×2/s2 conv downsamples between
stages, then global-average-pool → head LN → projection. Channel-last
layout means every pointwise op is a clean [*, C] matmul on the MXU and the
depthwise conv maps to lax.conv feature groups.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Mapping

import jax
import jax.numpy as jnp
import numpy as np

from ..errors import ConfigError, WeightError
from ..ops.layers import gelu, layer_norm, linear
from ..ops.normalize import l2_normalize

Params = dict
_DN = ("NHWC", "HWIO", "NHWC")


@dataclass(frozen=True)
class ConvNeXtCfg:
    image_size: int
    embed_dim: int
    depths: tuple[int, ...]
    dims: tuple[int, ...]
    proj: str = "linear"          # linear | mlp | none
    ln_eps: float = 1e-6


_CONVNEXT_VARIANTS: dict[str, dict] = {
    "convnext_tiny": dict(depths=(3, 3, 9, 3), dims=(96, 192, 384, 768)),
    "convnext_small": dict(depths=(3, 3, 27, 3), dims=(96, 192, 384, 768)),
    "convnext_base": dict(depths=(3, 3, 27, 3), dims=(128, 256, 512, 1024)),
    "convnext_large": dict(depths=(3, 3, 27, 3), dims=(192, 384, 768, 1536)),
    "convnext_xlarge": dict(depths=(3, 3, 27, 3), dims=(256, 512, 1024, 2048)),
    "convnext_xxlarge": dict(depths=(3, 4, 30, 3), dims=(384, 768, 1536, 3072)),
}


def resolve_convnext(name: str, vcfg, embed_dim: int, model_cfg) -> ConvNeXtCfg:
    base = _CONVNEXT_VARIANTS.get(name)
    if base is None:
        raise ConfigError(f"Unknown ConvNeXt variant '{name}'")
    override = vcfg.extra.get("convnext_cfg", {})
    merged = {**base, **override}
    proj = vcfg.timm_proj or "linear"
    return ConvNeXtCfg(
        image_size=vcfg.image_size,
        embed_dim=embed_dim,
        depths=tuple(merged["depths"]),
        dims=tuple(merged["dims"]),
        proj={"mlp": "mlp", "none": "none", "": "none"}.get(proj, "linear"),
    )


def _conv(w, b, x, *, stride=1, groups=1):
    pad = (w.shape[0] - 1) // 2 if stride == 1 else 0
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=_DN, feature_group_count=groups,
        preferred_element_type=jnp.float32,
    )
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y.astype(x.dtype)


def _block(p: Params, x: jax.Array, eps: float) -> jax.Array:
    dim = x.shape[-1]
    y = _conv(p["dw"]["w"], p["dw"]["b"], x, groups=dim)
    y = layer_norm(p["norm"], y, eps=eps)
    y = linear(p["fc1"], y)
    y = gelu(y)
    y = linear(p["fc2"], y)
    if "gamma" in p:
        y = y * p["gamma"].astype(y.dtype)
    return x + y


def apply(params: Params, pixels: jax.Array, cfg: ConvNeXtCfg, *,
          normalize: bool = True) -> jax.Array:
    """[B, H, W, 3] → [B, embed_dim]."""
    x = _conv(params["stem_conv"]["w"], params["stem_conv"]["b"], pixels,
              stride=4)
    x = layer_norm(params["stem_norm"], x, eps=cfg.ln_eps)

    for i, stage in enumerate(params["stages"]):
        if "downsample_norm" in stage:
            x = layer_norm(stage["downsample_norm"], x, eps=cfg.ln_eps)
            x = _conv(stage["downsample_conv"]["w"],
                      stage["downsample_conv"]["b"], x, stride=2)

        def body(carry, block):
            return _block(block, carry, cfg.ln_eps), None

        x, _ = jax.lax.scan(body, x, stage["blocks"])

    if "pre_norm" in params:  # head_norm_first checkpoints: LN before pool
        x = layer_norm(params["pre_norm"], x, eps=cfg.ln_eps)
        pooled = jnp.mean(x.astype(jnp.float32), axis=(1, 2)).astype(x.dtype)
    else:
        pooled = jnp.mean(x.astype(jnp.float32), axis=(1, 2)).astype(x.dtype)
        pooled = layer_norm(params["head_norm"], pooled, eps=cfg.ln_eps)
    proj = params.get("proj")
    if proj is not None:
        if cfg.proj == "mlp":
            pooled = linear(proj["fc2"], gelu(linear(proj["fc1"], pooled)))
        else:
            pooled = linear(proj, pooled)
    if normalize:
        pooled = l2_normalize(pooled)
    return pooled


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def init(key: jax.Array, cfg: ConvNeXtCfg, *, dtype=jnp.float32) -> Params:
    from .vit import _init_linear, _init_ln

    def conv_init(k, ks, cin, cout, groups=1):
        fan = ks * ks * cin // groups
        return {
            "w": (jax.random.normal(k, (ks, ks, cin // groups, cout))
                  * fan ** -0.5).astype(dtype),
            "b": jnp.zeros((cout,), dtype),
        }

    keys = jax.random.split(key, 8)
    c0 = cfg.dims[0]
    params: Params = {
        "stem_conv": conv_init(keys[0], 4, 3, c0),
        "stem_norm": _init_ln(c0, dtype),
        "stages": [],
        "head_norm": _init_ln(cfg.dims[-1], dtype),
    }
    for i, (depth, dim) in enumerate(zip(cfg.depths, cfg.dims)):
        skey = jax.random.fold_in(keys[1], i)
        stage: Params = {}
        if i > 0:
            stage["downsample_norm"] = _init_ln(cfg.dims[i - 1], dtype)
            stage["downsample_conv"] = conv_init(
                jax.random.fold_in(skey, 99), 2, cfg.dims[i - 1], dim)
        blocks = []
        for j in range(depth):
            bk = jax.random.fold_in(skey, j)
            k1, k2, k3 = jax.random.split(bk, 3)
            blocks.append({
                "dw": conv_init(k1, 7, dim, dim, groups=dim),
                "norm": _init_ln(dim, dtype),
                "fc1": _init_linear(k2, dim, dim * 4, dtype=dtype),
                "fc2": _init_linear(k3, dim * 4, dim, dtype=dtype),
                "gamma": jnp.full((dim,), 1e-6, dtype),
            })
        stage["blocks"] = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
        params["stages"].append(stage)

    if cfg.proj == "linear":
        params["proj"] = _init_linear(keys[2], cfg.dims[-1], cfg.embed_dim,
                                      dtype=dtype)
    elif cfg.proj == "mlp":
        k1, k2 = jax.random.split(keys[2])
        hidden = cfg.dims[-1]
        params["proj"] = {
            "fc1": _init_linear(k1, cfg.dims[-1], hidden, dtype=dtype),
            "fc2": _init_linear(k2, hidden, cfg.embed_dim, dtype=dtype),
        }
    return params


# ---------------------------------------------------------------------------
# weight mapping (timm convnext under open_clip's visual.trunk)
# ---------------------------------------------------------------------------

def _conv_hwio(sd, prefix) -> Params:
    w = sd.get(f"{prefix}.weight")
    if w is None:
        raise WeightError(f"Missing conv '{prefix}.weight'")
    w = np.asarray(w)
    p = {"w": np.ascontiguousarray(w.transpose(2, 3, 1, 0))}
    b = sd.get(f"{prefix}.bias")
    p["b"] = np.asarray(b) if b is not None else None
    return p


def map_convnext_visual(sd: Mapping[str, np.ndarray]) -> Params:
    from ..weights import _linear, _ln, _stack_blocks, strip_prefix

    sd = {k: np.asarray(v) for k, v in strip_prefix(
        dict(sd), "model.", "visual.", "trunk.").items()}

    params: Params = {
        "stem_conv": _conv_hwio(sd, "stem.0"),
        "stem_norm": _ln(sd, "stem.1"),
        "stages": [],
    }
    import re

    stage_ids = sorted({int(m.group(1)) for k in sd
                        if (m := re.match(r"stages\.(\d+)\.", k))})
    for si in stage_ids:
        sp = f"stages.{si}"
        stage: Params = {}
        if f"{sp}.downsample.0.weight" in sd:
            stage["downsample_norm"] = _ln(sd, f"{sp}.downsample.0")
            stage["downsample_conv"] = _conv_hwio(sd, f"{sp}.downsample.1")
        block_ids = sorted({
            int(m.group(1)) for k in sd
            if (m := re.match(rf"stages\.{si}\.blocks\.(\d+)\.", k))})
        blocks = []
        for bi in block_ids:
            bp = f"{sp}.blocks.{bi}"
            block = {
                "dw": _conv_hwio(sd, f"{bp}.conv_dw"),
                "norm": _ln(sd, f"{bp}.norm"),
                "fc1": _linear(sd, f"{bp}.mlp.fc1"),
                "fc2": _linear(sd, f"{bp}.mlp.fc2"),
            }
            if f"{bp}.gamma" in sd:
                block["gamma"] = np.asarray(sd[f"{bp}.gamma"]).reshape(-1)
            blocks.append(block)
        stage["blocks"] = _stack_blocks(blocks)
        params["stages"].append(stage)

    # timm NormMlpClassifierHead with num_classes=0 keeps head.norm
    # (post-pool); head_norm_first models carry norm_pre (pre-pool) instead.
    if "head.norm.weight" in sd:
        params["head_norm"] = _ln(sd, "head.norm")
    else:
        params["pre_norm"] = _ln(sd, "norm_pre")

    # open_clip TimmModel projection lives outside the trunk:
    # 'linear' → head.proj, 'mlp' → head.fc1/head.fc2 (after strip, keys may
    # collide with trunk head names — the proj Linear has no trunk analog)
    if "head.proj.weight" in sd:
        params["proj"] = _linear(sd, "head.proj")
    elif "head.fc1.weight" in sd:
        params["proj"] = {"fc1": _linear(sd, "head.fc1"),
                          "fc2": _linear(sd, "head.fc2")}
    return params
