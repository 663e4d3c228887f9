"""Weight ingestion: torch/open_clip checkpoints → native JAX pytrees.

The reference ships weights inside ONNX graphs consumed opaquely by ONNX
Runtime (reference: src/model_manager.rs:8-18, pull_onnx.py:159-181). This
framework owns its parameters, so ingestion is explicit:

* ``map_state_dict`` — maps an open_clip-style torch ``state_dict`` (names
  like ``visual.transformer.resblocks.0.attn.in_proj_weight`` or
  ``visual.trunk.blocks.0.attn.qkv.weight``) onto this framework's pytrees,
  transposing torch ``[out, in]`` Linear weights to ``[in, out]`` and
  flattening conv patch-embeddings into the (py, px, c) matmul layout used
  by :func:`clip_embedder_tpu.models.vit.patchify`;
* ``save_pytree`` / ``load_pytree`` — the native on-disk weight format
  (``visual.npz`` / ``text.npz``): a flat npz of '/'-joined key paths, with
  per-layer block params pre-stacked along axis 0 for ``lax.scan``.

ONNX-graph extraction for the reference's published ``*-ONNX`` HF repos
lives in :mod:`clip_embedder_tpu.onnx_reader`.
"""

from __future__ import annotations

import re
from pathlib import Path
from typing import Any, Mapping

import jax.numpy as jnp
import numpy as np

from .errors import WeightError

Params = dict


# ---------------------------------------------------------------------------
# npz pytree serialization (the native weight format)
# ---------------------------------------------------------------------------

def _flatten(tree: Any, prefix: str = "") -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    if isinstance(tree, Mapping):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def save_pytree(path: Path | str, tree: Params) -> None:
    flat = _flatten(tree)
    np.savez(path, **flat)


def _relistify(node):
    """Restore list structure: a dict whose keys are all decimal strings was
    a list/tuple before flattening (e.g. FastViT/ResNet ``stages``)."""
    if not isinstance(node, dict):
        return node
    node = {k: _relistify(v) for k, v in node.items()}
    if node and all(k.isdigit() for k in node):
        return [node[k] for k in sorted(node, key=int)]
    return node


def load_pytree(path: Path | str, *, dtype=None) -> Params:
    try:
        data_ctx = np.load(path)
    except Exception as e:  # zipfile.BadZipFile / OSError / ValueError
        raise WeightError(
            f"Failed to read weight file '{path}': {e}") from e
    with data_ctx as data:
        tree: Params = {}
        for key in data.files:
            arr = data[key]
            if dtype is not None and np.issubdtype(arr.dtype, np.floating):
                arr = arr.astype(dtype)
            node = tree
            parts = key.split("/")
            for part in parts[:-1]:
                node = node.setdefault(part, {})
            node[parts[-1]] = jnp.asarray(arr)
    return _relistify(tree)


def _flat_shapes(tree: Any, prefix: str = "") -> dict[str, tuple]:
    """Flatten a pytree (of arrays or ShapeDtypeStructs) to path → shape."""
    out: dict[str, tuple] = {}
    if isinstance(tree, Mapping):
        for k, v in tree.items():
            out.update(_flat_shapes(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flat_shapes(v, f"{prefix}{i}/"))
    else:
        out[prefix[:-1]] = tuple(tree.shape)
    return out


def _family_init(family: str):
    """The family's ``init(key, cfg)`` — the canonical pytree layout every
    weight source (mapper, structural extraction, npz) must produce."""
    if family == "vit":
        from .models import vit
        return vit.init
    if family == "fastvit":
        from .models import fastvit
        return fastvit.init
    if family == "resnet":
        from .models import resnet
        return resnet.init
    if family == "convnext":
        from .models import convnext
        return convnext.init
    if family == "eva02":
        from .models import eva02
        return eva02.init
    if family == "text_transformer":
        from .models import text_transformer
        return text_transformer.init
    if family == "hf_bert":
        from .models import hf_text
        return hf_text.init
    if family == "mct":
        from .models import mct
        return mct.init
    return None  # "onnx": the graph IS the params, nothing to check against


def validate_tower_pytree(params: Params, spec, *, source) -> None:
    """Check a loaded weight pytree against the family's canonical layout.

    ``visual.npz``/``text.npz`` are consumed blindly by the jitted forward;
    a file whose tree doesn't match the TowerSpec (hand-edited, produced by
    an older converter, or paired with the wrong config) must fail here as a
    typed :class:`WeightError` naming the offending paths — not as a raw
    KeyError/scan-shape ValueError inside the forward. The expected layout
    is ``jax.eval_shape`` of the family's ``init`` (zero FLOPs, zero
    memory). Shapes only — dtype is a load-time knob. This is the npz
    analog of ORT's session-build validation (reference src/onnx.rs:13-29:
    a graph whose initializers don't match its nodes refuses to load).
    """
    init = _family_init(spec.family)
    if init is None:
        return
    import jax

    expected = _flat_shapes(
        jax.eval_shape(lambda k: init(k, spec.cfg), jax.random.PRNGKey(0)))
    got = _flat_shapes(params)

    def optional_bias(k: str) -> bool:
        # biases are optional by the ops contract (ops.layers.linear: "bias
        # optional"; mappers add "b" only when the source has one — e.g.
        # open_clip ViT patch conv is bias-free), so a missing bias whose
        # sibling weight IS present and correct is a legitimate layout
        head, _, leaf = k.rpartition("/")
        if leaf != "b":
            return False
        sib = f"{head}/w" if head else "w"
        return sib in got and got[sib] == expected.get(sib)

    missing = sorted(k for k in set(expected) - set(got)
                     if not optional_bias(k))
    unexpected = sorted(set(got) - set(expected))
    wrong = sorted(k for k in set(got) & set(expected)
                   if got[k] != expected[k])
    if not (missing or unexpected or wrong):
        return

    def head(items, fmt):
        shown = [fmt(k) for k in items[:5]]
        if len(items) > 5:
            shown.append(f"... +{len(items) - 5} more")
        return ", ".join(shown)

    parts = []
    if missing:
        parts.append(f"missing: {head(missing, str)}")
    if unexpected:
        parts.append(f"unexpected: {head(unexpected, str)}")
    if wrong:
        parts.append("shape mismatch: " + head(
            wrong, lambda k: f"{k} {got[k]} != {expected[k]}"))
    raise WeightError(
        f"Weight tree from {source} does not match the '{spec.family}' "
        f"tower layout — {'; '.join(parts)}")


# ---------------------------------------------------------------------------
# state-dict helpers
# ---------------------------------------------------------------------------

def _t(w: np.ndarray) -> np.ndarray:
    """torch Linear [out, in] → [in, out]."""
    return np.ascontiguousarray(np.asarray(w).T)


def _conv_to_patch(w: np.ndarray) -> np.ndarray:
    """torch Conv2d patch kernel [D, C, P, P] → [P·P·C, D] matching
    ``patchify``'s (py, px, c) flatten order."""
    w = np.asarray(w)
    d = w.shape[0]
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0).reshape(-1, d))


def _get(sd: Mapping[str, np.ndarray], key: str) -> np.ndarray:
    if key not in sd:
        raise WeightError(f"Missing weight '{key}' in checkpoint")
    return np.asarray(sd[key])


def _ln(sd, prefix: str) -> Params:
    return {"scale": _get(sd, f"{prefix}.weight"), "bias": _get(sd, f"{prefix}.bias")}


def _linear(sd, prefix: str, *, bias: bool = True) -> Params:
    p = {"w": _t(_get(sd, f"{prefix}.weight"))}
    if bias and f"{prefix}.bias" in sd:
        p["b"] = np.asarray(sd[f"{prefix}.bias"])
    return p


def _split_qkv(w: np.ndarray, b: np.ndarray | None) -> Params:
    """Packed [3D, D] qkv (+bias) → separate q/k/v linear pytrees."""
    d = w.shape[0] // 3
    out: Params = {}
    for i, name in enumerate(("q", "k", "v")):
        p = {"w": _t(w[i * d : (i + 1) * d])}
        if b is not None:
            p["b"] = np.asarray(b[i * d : (i + 1) * d])
        out[name] = p
    return out


def _stack_blocks(blocks: list[Params]) -> Params:
    import jax

    return jax.tree.map(lambda *xs: np.stack(xs), *blocks)


def strip_prefix(sd: Mapping[str, np.ndarray], *prefixes: str) -> dict[str, np.ndarray]:
    """Drop a leading module prefix (e.g. the export wrapper's ``model.`` —
    reference: pull_onnx.py:53-68 wraps the whole model one level deep)."""
    out = dict(sd)
    for prefix in prefixes:
        if any(k.startswith(prefix) for k in out):
            out = {
                (k[len(prefix):] if k.startswith(prefix) else k): v
                for k, v in out.items()
            }
    return out


def fold_bn_affine(gamma, beta, mean, var, *, eps: float = 1e-5):
    """Inference BatchNorm fold → per-channel affine (f64 intermediate):
    ``scale = γ/√(var+ε)``, ``bias = β − mean·scale``. Shared by the
    FastViT attention-norm/ConvMlp folds and the ResNet mapper."""
    gamma = np.asarray(gamma, np.float64)
    beta = np.asarray(beta, np.float64)
    scale = gamma / np.sqrt(np.asarray(var, np.float64) + eps)
    bias = beta - np.asarray(mean, np.float64) * scale
    return scale, bias


def _select_prefix(sd: Mapping[str, np.ndarray],
                   prefix: str) -> dict[str, np.ndarray]:
    """Tower-selecting strip: when ``prefix`` exists, keep ONLY the
    prefixed keys (stripped). Unlike ``strip_prefix`` this discards the
    rest — a whole-model classic-CLIP state dict has the text tower at
    top level (``transformer.resblocks.*``), and stripping ``visual.``
    without filtering would collide the two towers' keys (dict last-wins:
    silently building the visual tower from text weights)."""
    if any(k.startswith(prefix) for k in sd):
        return {k[len(prefix):]: v for k, v in sd.items()
                if k.startswith(prefix)}
    return dict(sd)


def _max_index(sd: Mapping[str, np.ndarray], pattern: str) -> int:
    rx = re.compile(pattern)
    idx = [int(m.group(1)) for k in sd if (m := rx.match(k))]
    if not idx:
        raise WeightError(f"No blocks matching '{pattern}' in checkpoint")
    return max(idx) + 1


# ---------------------------------------------------------------------------
# classic open_clip towers (CLIP ViT + causal text transformer)
# ---------------------------------------------------------------------------

def _openclip_resblock(sd, prefix: str) -> Params:
    attn = _split_qkv(
        _get(sd, f"{prefix}.attn.in_proj_weight"),
        sd.get(f"{prefix}.attn.in_proj_bias"),
    )
    attn["out"] = _linear(sd, f"{prefix}.attn.out_proj")
    return {
        "ln1": _ln(sd, f"{prefix}.ln_1"),
        "attn": attn,
        "ln2": _ln(sd, f"{prefix}.ln_2"),
        "mlp": {
            "fc": _linear(sd, f"{prefix}.mlp.c_fc"),
            "proj": _linear(sd, f"{prefix}.mlp.c_proj"),
        },
    }


def map_clip_visual(sd: Mapping[str, np.ndarray]) -> Params:
    """Classic open_clip VisionTransformer state dict (``visual.*``) →
    ViT pytree. Expects keys already stripped to start at ``conv1`` etc."""
    sd = _select_prefix(strip_prefix(sd, "model."), "visual.")
    n_blocks = _max_index(sd, r"transformer\.resblocks\.(\d+)\.ln_1\.weight")
    blocks = [
        _openclip_resblock(sd, f"transformer.resblocks.{i}") for i in range(n_blocks)
    ]
    params: Params = {
        "patch_embed": {"w": _conv_to_patch(_get(sd, "conv1.weight"))},
        "cls_token": np.asarray(_get(sd, "class_embedding")).reshape(1, 1, -1),
        "pos_embed": np.asarray(_get(sd, "positional_embedding"))[None],
        "ln_pre": _ln(sd, "ln_pre"),
        "blocks": _stack_blocks(blocks),
        "ln_post": _ln(sd, "ln_post"),
    }
    if "conv1.bias" in sd:
        params["patch_embed"]["b"] = np.asarray(sd["conv1.bias"])
    if "attn_pool.query" in sd:
        # CoCa legacy AttentionalPooler (open_clip transformer.py): learned
        # queries in embed-dim space, MHA with kdim=vdim=width. torch's
        # nn.MultiheadAttention packs in_proj only when q/k/v dims match;
        # CoCa's differ, so the checkpoint carries q/k/v_proj_weight plus a
        # single [3·dm] in_proj_bias.
        dm = np.asarray(sd["attn_pool.query"]).shape[-1]
        if "attn_pool.attn.in_proj_weight" in sd:
            pool_attn = _split_qkv(
                _get(sd, "attn_pool.attn.in_proj_weight"),
                sd.get("attn_pool.attn.in_proj_bias"),
            )
        else:
            b = sd.get("attn_pool.attn.in_proj_bias")
            pool_attn = {}
            for i, name in enumerate(("q", "k", "v")):
                p = {"w": _t(_get(sd, f"attn_pool.attn.{name}_proj_weight"))}
                if b is not None:
                    p["b"] = np.asarray(b[i * dm:(i + 1) * dm])
                pool_attn[name] = p
        pool_attn["out"] = _linear(sd, "attn_pool.attn.out_proj")
        params["attn_pool"] = {
            "query": np.asarray(sd["attn_pool.query"]),
            "ln_q": _ln(sd, "attn_pool.ln_q"),
            "ln_k": _ln(sd, "attn_pool.ln_k"),
            "attn": pool_attn,
        }
    if "proj" in sd:
        params["proj"] = {"w": np.asarray(sd["proj"])}  # stored [width, embed]
    return params


def _pick(sd, *prefixes: str) -> str:
    """First prefix with a ``.weight`` key present, else a loud error."""
    for p in prefixes:
        if f"{p}.weight" in sd:
            return p
    raise WeightError(
        f"None of {prefixes} found in checkpoint (keys near: "
        f"{sorted(k for k in sd if k.startswith(prefixes[0].split('.')[0]))[:8]})")


def map_pe_visual(sd: Mapping[str, np.ndarray]) -> Params:
    """Meta Perception Encoder (PE-Core) vision state dict → ViT pytree.

    Meta naming (perception_models / CLIP lineage): ``conv1``,
    ``class_embedding``, ``positional_embedding``, ``ln_pre``,
    ``transformer.resblocks.N.{ln_1, attn.in_proj_*, attn.out_proj,
    ls_1.gamma?, ln_2, mlp.c_fc, mlp.c_proj}``, ``ln_post``,
    ``attn_pool.{probe, attn.in_proj_*, attn.out_proj, layernorm,
    mlp.c_fc|fc1, mlp.c_proj|fc2}``, ``proj``. timm-converted dicts
    (``blocks.N.attn.qkv`` style) route to map_timm_visual instead.
    The reference runs this family only as an exported ONNX graph
    (reference README.md:145)."""
    sd = _select_prefix(strip_prefix(sd, "model."), "visual.")
    n_blocks = _max_index(sd, r"transformer\.resblocks\.(\d+)\.ln_1\.weight")
    blocks = []
    for i in range(n_blocks):
        prefix = f"transformer.resblocks.{i}"
        block = _openclip_resblock(sd, prefix)
        for ours, theirs in (("ls1", "ls_1"), ("ls2", "ls_2")):
            if f"{prefix}.{theirs}.gamma" in sd:
                block[ours] = np.asarray(sd[f"{prefix}.{theirs}.gamma"])
        blocks.append(block)

    pos = np.asarray(_get(sd, "positional_embedding"))
    if pos.ndim == 2:
        pos = pos[None]
    params: Params = {
        "patch_embed": {"w": _conv_to_patch(_get(sd, "conv1.weight"))},
        "pos_embed": pos,
        "blocks": _stack_blocks(blocks),
        "ln_post": _ln(sd, "ln_post"),
    }
    if "conv1.bias" in sd:
        params["patch_embed"]["b"] = np.asarray(sd["conv1.bias"])
    if "class_embedding" in sd:
        params["cls_token"] = np.asarray(sd["class_embedding"]).reshape(1, 1, -1)
    if "ln_pre.weight" in sd:
        params["ln_pre"] = _ln(sd, "ln_pre")

    if "attn_pool.probe" in sd:
        pool_attn = _split_qkv(
            _get(sd, "attn_pool.attn.in_proj_weight"),
            sd.get("attn_pool.attn.in_proj_bias"),
        )
        pool_attn["out"] = _linear(sd, "attn_pool.attn.out_proj")
        params["attn_pool"] = {
            "probe": np.asarray(sd["attn_pool.probe"]).reshape(1, 1, -1),
            "attn": pool_attn,
            "ln": _ln(sd, _pick(sd, "attn_pool.layernorm", "attn_pool.norm",
                                "attn_pool.ln")),
            "mlp": {
                "fc": _linear(sd, _pick(sd, "attn_pool.mlp.c_fc",
                                        "attn_pool.mlp.fc1")),
                "proj": _linear(sd, _pick(sd, "attn_pool.mlp.c_proj",
                                          "attn_pool.mlp.fc2")),
            },
        }
    if "proj" in sd:
        params["proj"] = {"w": np.asarray(sd["proj"])}  # stored [width, embed]
    elif "proj.weight" in sd:
        params["proj"] = _linear(sd, "proj")
    return params


def derive_pe_cfg_from_sd(sd: Mapping[str, np.ndarray]) -> dict:
    """Derive PE-Core dims from a checkpoint state dict's shapes — the
    checkpoint-path analog of ``onnx_reader.derive_pe_cfg`` (the exporter
    pattern: read the real model, never a table — reference:
    pull_onnx.py:93-150). Used by pull_weights.py at conversion time so the
    paper-reconstructed size table (models.build._PE_CORE_SIZES) is
    bypassed for every shape-derivable field whenever a checkpoint exists.

    ``heads`` is NOT shape-derivable (the packed in_proj is [3w, w] for any
    head count, and the rope tables a graph carries are computed at runtime
    here) — it stays table/override-seeded and models.build warns when so.

    Raises WeightError when the dict is not a PE-Core-shaped ViT.
    """
    sd = _select_prefix(strip_prefix(sd, "model."), "visual.")
    conv1 = sd.get("conv1.weight")
    if conv1 is None or np.asarray(conv1).ndim != 4 \
            or np.asarray(conv1).shape[1] != 3:
        raise WeightError(
            "state dict has no [width, 3, p, p] patch conv (conv1.weight)")
    width = int(np.asarray(conv1).shape[0])
    patch = int(np.asarray(conv1).shape[2])
    layers = _max_index(sd, r"transformer\.resblocks\.(\d+)\.ln_1\.weight")
    if layers == 0:
        raise WeightError("state dict has no transformer.resblocks.* layers")
    fc = sd.get("transformer.resblocks.0.mlp.c_fc.weight")
    if fc is None:
        raise WeightError("state dict has no mlp.c_fc weights")
    cfg = {
        "width": width,
        "patch_size": patch,
        "layers": layers,
        "mlp_hidden": int(np.asarray(fc).shape[0]),
        "use_class_token": "class_embedding" in sd,
        "use_ln_pre": "ln_pre.weight" in sd,
        "pool": "map" if "attn_pool.probe" in sd else "tok",
    }
    for key in ("attn_pool.mlp.c_fc.weight", "attn_pool.mlp.fc1.weight"):
        if key in sd:
            cfg["pool_mlp_hidden"] = int(np.asarray(sd[key]).shape[0])
            break
    return cfg


def map_clip_text(sd: Mapping[str, np.ndarray]) -> Params:
    """Classic open_clip text transformer state dict → pytree.

    Accepts both whole-model naming (``token_embedding.weight``, …) and
    custom-text naming (``text.token_embedding.weight``, …)."""
    sd = strip_prefix(sd, "model.", "text.")
    n_blocks = _max_index(sd, r"transformer\.resblocks\.(\d+)\.ln_1\.weight")
    blocks = [
        _openclip_resblock(sd, f"transformer.resblocks.{i}") for i in range(n_blocks)
    ]
    params: Params = {
        "token_embed": _get(sd, "token_embedding.weight"),
        "pos_embed": _get(sd, "positional_embedding"),
        "blocks": _stack_blocks(blocks),
        "ln_final": _ln(sd, "ln_final"),
    }
    if "cls_emb" in sd:  # CoCa embed_cls token (appended at sequence end)
        params["cls_emb"] = np.asarray(sd["cls_emb"]).reshape(1, 1, -1)
    if "text_projection.weight" in sd:  # nn.Linear projection (SigLIP-style)
        params["proj"] = _linear(sd, "text_projection")
    elif "text_projection" in sd:  # bare Parameter [width, embed]
        params["proj"] = {"w": np.asarray(sd["text_projection"])}
    return params


# ---------------------------------------------------------------------------
# timm ViT towers (SigLIP / SigLIP2)
# ---------------------------------------------------------------------------

def _timm_block(sd, prefix: str) -> Params:
    qkv_bias = sd.get(f"{prefix}.attn.qkv.bias")
    if qkv_bias is None and f"{prefix}.attn.q_bias" in sd:
        # EVA attention: separate q/v biases, bias-free k
        q_b = np.asarray(sd[f"{prefix}.attn.q_bias"])
        v_b = np.asarray(sd[f"{prefix}.attn.v_bias"])
        qkv_bias = np.concatenate([q_b, np.zeros_like(q_b), v_b])
    attn = _split_qkv(_get(sd, f"{prefix}.attn.qkv.weight"), qkv_bias)
    attn["out"] = _linear(sd, f"{prefix}.attn.proj")
    block = {
        "ln1": _ln(sd, f"{prefix}.norm1"),
        "attn": attn,
        "ln2": _ln(sd, f"{prefix}.norm2"),
        "mlp": {
            "fc": _linear(sd, f"{prefix}.mlp.fc1"),
            "proj": _linear(sd, f"{prefix}.mlp.fc2"),
        },
    }
    if f"{prefix}.ls1.gamma" in sd:
        block["ls1"] = np.asarray(sd[f"{prefix}.ls1.gamma"])
        block["ls2"] = np.asarray(sd[f"{prefix}.ls2.gamma"])
    return block


def map_timm_visual(sd: Mapping[str, np.ndarray]) -> Params:
    """timm ViT state dict (open_clip TimmModel: ``visual.trunk.*``) →
    ViT pytree, including the SigLIP attention-pool (map) head."""
    sd = strip_prefix(sd, "model.", "visual.", "trunk.")
    n_blocks = _max_index(sd, r"blocks\.(\d+)\.norm1\.weight")
    blocks = [_timm_block(sd, f"blocks.{i}") for i in range(n_blocks)]

    pos = np.asarray(_get(sd, "pos_embed"))
    if pos.ndim == 2:
        pos = pos[None]
    params: Params = {
        "patch_embed": {
            "w": _conv_to_patch(_get(sd, "patch_embed.proj.weight")),
            "b": _get(sd, "patch_embed.proj.bias"),
        },
        "pos_embed": pos,
        "blocks": _stack_blocks(blocks),
        # global_pool='avg' checkpoints carry fc_norm (post-pool) instead
        # of a trunk norm (build.py sets norm_after_pool accordingly)
        "ln_post": _ln(sd, "norm" if "norm.weight" in sd else "fc_norm"),
    }
    if "cls_token" in sd:
        params["cls_token"] = np.asarray(sd["cls_token"]).reshape(1, 1, -1)
    if "reg_token" in sd:  # timm register tokens (vit_*_reg*_ / so150m)
        reg = np.asarray(sd["reg_token"])
        params["reg_tokens"] = reg.reshape(1, -1, reg.shape[-1])

    if "attn_pool.latent" in sd:
        kv = _get(sd, "attn_pool.kv.weight")
        kvb = sd.get("attn_pool.kv.bias")
        d = kv.shape[0] // 2
        pool_attn = {
            "q": _linear(sd, "attn_pool.q"),
            "k": {"w": _t(kv[:d])},
            "v": {"w": _t(kv[d:])},
            "out": _linear(sd, "attn_pool.proj"),
        }
        if kvb is not None:
            pool_attn["k"]["b"] = np.asarray(kvb[:d])
            pool_attn["v"]["b"] = np.asarray(kvb[d:])
        params["attn_pool"] = {
            "probe": np.asarray(sd["attn_pool.latent"]).reshape(1, 1, -1),
            "attn": pool_attn,
            "ln": _ln(sd, "attn_pool.norm"),
            "mlp": {
                "fc": _linear(sd, "attn_pool.mlp.fc1"),
                "proj": _linear(sd, "attn_pool.mlp.fc2"),
            },
        }
    # open_clip TimmModel projections live under head.*: 'linear' →
    # head.proj (Sequential with dropout), 'mlp' → head.fc1/fc2 (timm Mlp);
    # a bare head.weight is the trunk's own classifier-style head.
    if "head.proj.weight" in sd:
        params["proj"] = _linear(sd, "head.proj")
    elif "head.fc1.weight" in sd:
        params["proj"] = {
            "fc": _linear(sd, "head.fc1"),
            "out": _linear(sd, "head.fc2"),
        }
    elif "head.weight" in sd:
        params["proj"] = _linear(sd, "head")
    return params


# ---------------------------------------------------------------------------
# entry point
# ---------------------------------------------------------------------------

def map_state_dict(
    sd: Mapping[str, np.ndarray], *, tower: str, family: str
) -> Params:
    """Map a torch state dict onto a tower pytree.

    tower: "visual" | "text"; family: as returned by models.build.
    """
    sd = {k: np.asarray(v) for k, v in sd.items()}
    if tower == "visual":
        if family == "vit":
            keys = set(sd)
            if any(".trunk." in k or k.startswith("trunk.") or "blocks.0.norm1.weight" in k
                   for k in keys):
                return map_timm_visual(sd)
            if any(k.endswith("attn_pool.probe") for k in keys):
                return map_pe_visual(sd)  # Meta PE-Core naming
            return map_clip_visual(sd)
        if family == "fastvit":
            from .models.fastvit import map_fastvit_visual

            return map_fastvit_visual(sd)
        if family == "resnet":
            from .models.resnet import map_resnet_visual

            return map_resnet_visual(sd)
        if family == "convnext":
            from .models.convnext import map_convnext_visual

            return map_convnext_visual(sd)
        if family == "eva02":
            from .models.eva02 import map_eva02_visual

            return map_eva02_visual(sd)
        raise WeightError(f"Unknown visual family '{family}'")
    if tower == "text":
        if family == "text_transformer":
            return map_clip_text(sd)
        if family == "hf_bert":
            from .models.hf_text import map_hf_text

            return map_hf_text(sd)
        raise WeightError(f"Unknown text family '{family}'")
    raise WeightError(f"Unknown tower '{tower}'")
