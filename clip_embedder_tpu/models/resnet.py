"""CLIP's ModifiedResNet vision tower (RN50/RN101/RN50x4-class models).

Completes the classic open_clip vision families ("any open_clip model" —
reference: src/lib.rs:9): the anti-aliased ResNet CLIP uses — 3-conv stem
with average-pool downsampling, Bottleneck blocks whose stride lives in an
avg-pool (not strided conv), and the AttentionPool2d head where a mean
token cross-attends over spatial positions.

Inference form: BatchNorms are carried as folded per-channel affines
(scale/bias), applied after their convs — the exact eval-mode math.
NHWC convs on the MXU; blocks stacked+scanned within homogeneous runs is
not applicable here (stages are heterogeneous at their first block), so
stages unroll.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Mapping

import jax
import jax.numpy as jnp
import numpy as np

from ..errors import WeightError
from ..ops.normalize import l2_normalize

Params = dict
_DN = ("NHWC", "HWIO", "NHWC")
EXPANSION = 4


@dataclass(frozen=True)
class ResNetCfg:
    image_size: int
    embed_dim: int
    layers: tuple[int, int, int, int]
    width: int = 64
    heads: int = 32          # attnpool heads = width * 32 // 64
    ln_unused: float = 0.0

    @property
    def pool_tokens(self) -> int:
        return (self.image_size // 32) ** 2 + 1


def _conv(w, x, *, stride=1):
    pad = (w.shape[0] - 1) // 2
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=_DN, preferred_element_type=jnp.float32,
    ).astype(x.dtype)


def _bn(p, x):
    return x * p["scale"].astype(x.dtype) + p["bias"].astype(x.dtype)


def _avgpool(x, k):
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, k, k, 1), (1, k, k, 1), "VALID"
    ) / (k * k)


def _bottleneck(p: Params, x: jax.Array, *, stride: int) -> jax.Array:
    out = jax.nn.relu(_bn(p["bn1"], _conv(p["conv1"], x)))
    out = jax.nn.relu(_bn(p["bn2"], _conv(p["conv2"], out)))
    if stride > 1:
        out = _avgpool(out, stride)
    out = _bn(p["bn3"], _conv(p["conv3"], out))
    if "downsample" in p:
        identity = x
        if stride > 1:
            identity = _avgpool(identity, stride)
        identity = _bn(p["downsample"]["bn"], _conv(p["downsample"]["conv"], identity))
    else:
        identity = x
    return jax.nn.relu(out + identity)


def apply(params: Params, pixels: jax.Array, cfg: ResNetCfg, *,
          normalize: bool = True) -> jax.Array:
    """[B, H, W, 3] → [B, embed_dim]."""
    x = pixels
    x = jax.nn.relu(_bn(params["bn1"], _conv(params["conv1"], x, stride=2)))
    x = jax.nn.relu(_bn(params["bn2"], _conv(params["conv2"], x)))
    x = jax.nn.relu(_bn(params["bn3"], _conv(params["conv3"], x)))
    x = _avgpool(x, 2)

    for stage_idx, stage in enumerate(params["stages"]):
        stride = 1 if stage_idx == 0 else 2
        for block_idx, block in enumerate(stage):
            x = _bottleneck(block, x, stride=stride if block_idx == 0 else 1)

    # AttentionPool2d: mean token queries the spatial tokens.
    p = params["attnpool"]
    b, h, w, c = x.shape
    tokens = x.reshape(b, h * w, c)
    mean_tok = jnp.mean(tokens.astype(jnp.float32), axis=1,
                        keepdims=True).astype(tokens.dtype)
    tokens = jnp.concatenate([mean_tok, tokens], axis=1)  # [B, 1+HW, C]
    tokens = tokens + p["pos_embed"].astype(tokens.dtype)[None]

    from ..ops.attention import attention_core
    from ..ops.layers import linear
    from einops import rearrange

    heads = cfg.heads
    q = linear(p["q"], tokens[:, :1])
    k = linear(p["k"], tokens)
    v = linear(p["v"], tokens)
    q = rearrange(q, "b s (h d) -> b h s d", h=heads)
    k = rearrange(k, "b s (h d) -> b h s d", h=heads)
    v = rearrange(v, "b s (h d) -> b h s d", h=heads)
    out = attention_core(q, k, v)
    out = rearrange(out, "b h s d -> b s (h d)")[:, 0]
    pooled = linear(p["out"], out)
    if normalize:
        pooled = l2_normalize(pooled)
    return pooled


# ---------------------------------------------------------------------------
# init (random weights, for tests/benches)
# ---------------------------------------------------------------------------

def _conv_w(key, k, cin, cout, dtype):
    fan = k * k * cin
    return (jax.random.normal(key, (k, k, cin, cout)) * fan ** -0.5).astype(dtype)


def _affine(c, dtype):
    return {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}


def init(key: jax.Array, cfg: ResNetCfg, *, dtype=jnp.float32) -> Params:
    from .vit import _init_linear

    keys = jax.random.split(key, 8)
    w = cfg.width
    params: Params = {
        "conv1": _conv_w(keys[0], 3, 3, w // 2, dtype), "bn1": _affine(w // 2, dtype),
        "conv2": _conv_w(keys[1], 3, w // 2, w // 2, dtype), "bn2": _affine(w // 2, dtype),
        "conv3": _conv_w(keys[2], 3, w // 2, w, dtype), "bn3": _affine(w, dtype),
        "stages": [],
    }
    cin = w
    for stage_idx, depth in enumerate(cfg.layers):
        planes = w * (2 ** stage_idx)
        cout = planes * EXPANSION
        stage = []
        for block_idx in range(depth):
            bkey = jax.random.fold_in(keys[3], stage_idx * 100 + block_idx)
            k1, k2, k3, k4 = jax.random.split(bkey, 4)
            block = {
                "conv1": _conv_w(k1, 1, cin, planes, dtype), "bn1": _affine(planes, dtype),
                "conv2": _conv_w(k2, 3, planes, planes, dtype), "bn2": _affine(planes, dtype),
                "conv3": _conv_w(k3, 1, planes, cout, dtype), "bn3": _affine(cout, dtype),
            }
            if block_idx == 0 and cin != cout:
                block["downsample"] = {
                    "conv": _conv_w(k4, 1, cin, cout, dtype),
                    "bn": _affine(cout, dtype),
                }
            stage.append(block)
            cin = cout
        params["stages"].append(stage)

    feat = cin
    params["attnpool"] = {
        "pos_embed": (jax.random.normal(keys[4], (cfg.pool_tokens, feat))
                      * feat ** -0.5).astype(dtype),
        "q": _init_linear(keys[5], feat, feat, dtype=dtype),
        "k": _init_linear(keys[6], feat, feat, dtype=dtype),
        "v": _init_linear(keys[7], feat, feat, dtype=dtype),
        "out": _init_linear(jax.random.fold_in(keys[7], 1), feat,
                            cfg.embed_dim, dtype=dtype),
    }
    return params


# ---------------------------------------------------------------------------
# weight mapping (open_clip ModifiedResNet naming)
# ---------------------------------------------------------------------------

def _fold_bn(sd: Mapping[str, np.ndarray], prefix: str) -> Params:
    from ..weights import fold_bn_affine

    scale, bias = fold_bn_affine(
        sd[f"{prefix}.weight"], sd[f"{prefix}.bias"],
        sd[f"{prefix}.running_mean"], sd[f"{prefix}.running_var"])
    return {"scale": scale.astype(np.float32),
            "bias": bias.astype(np.float32)}


def _conv_hwio(sd, key) -> np.ndarray:
    w = np.asarray(sd[key])
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0))


def map_resnet_visual(sd: Mapping[str, np.ndarray]) -> Params:
    from ..weights import _linear, strip_prefix

    sd = {k: np.asarray(v) for k, v in strip_prefix(
        dict(sd), "model.", "visual.").items()}
    if "conv1.weight" not in sd:
        raise WeightError("Not a ModifiedResNet checkpoint (no conv1.weight)")

    params: Params = {
        "conv1": _conv_hwio(sd, "conv1.weight"), "bn1": _fold_bn(sd, "bn1"),
        "conv2": _conv_hwio(sd, "conv2.weight"), "bn2": _fold_bn(sd, "bn2"),
        "conv3": _conv_hwio(sd, "conv3.weight"), "bn3": _fold_bn(sd, "bn3"),
        "stages": [],
    }
    import re

    for stage_idx in range(1, 5):
        depth = 1 + max(
            (int(m.group(1)) for k in sd
             if (m := re.match(rf"layer{stage_idx}\.(\d+)\.conv1\.weight", k))),
            default=-1,
        )
        if depth == 0:
            raise WeightError(f"layer{stage_idx} missing from checkpoint")
        stage = []
        for i in range(depth):
            p = f"layer{stage_idx}.{i}"
            block = {
                "conv1": _conv_hwio(sd, f"{p}.conv1.weight"),
                "bn1": _fold_bn(sd, f"{p}.bn1"),
                "conv2": _conv_hwio(sd, f"{p}.conv2.weight"),
                "bn2": _fold_bn(sd, f"{p}.bn2"),
                "conv3": _conv_hwio(sd, f"{p}.conv3.weight"),
                "bn3": _fold_bn(sd, f"{p}.bn3"),
            }
            # open_clip downsample: Sequential(avgpool, conv(-1), bn(0/1))
            for conv_key, bn_key in ((f"{p}.downsample.0.weight", f"{p}.downsample.1"),
                                     (f"{p}.downsample.1.weight", f"{p}.downsample.2")):
                if conv_key in sd:
                    block["downsample"] = {
                        "conv": _conv_hwio(sd, conv_key),
                        "bn": _fold_bn(sd, bn_key),
                    }
                    break
            stage.append(block)
        params["stages"].append(stage)

    params["attnpool"] = {
        "pos_embed": np.asarray(sd["attnpool.positional_embedding"]),
        "q": _linear(sd, "attnpool.q_proj"),
        "k": _linear(sd, "attnpool.k_proj"),
        "v": _linear(sd, "attnpool.v_proj"),
        "out": _linear(sd, "attnpool.c_proj"),
    }
    return params
