"""Load-time weight-tree validation (weights.validate_tower_pytree).

``visual.npz`` / ``text.npz`` are consumed blindly by the jitted forwards;
a tree that doesn't match the TowerSpec (hand-edited file, older converter,
wrong config pairing) must fail at load as a typed WeightError naming the
offending paths — never as a raw KeyError / scan-shape ValueError inside
the forward. This is the npz analog of ORT refusing to build a session
over a graph whose initializers don't match (reference: src/onnx.rs:13-29).
"""

import json

import numpy as np
import pytest

import jax

from clip_embedder_tpu.errors import WeightError
from clip_embedder_tpu.models.build import TowerSpec
from clip_embedder_tpu.weights import (
    load_pytree,
    save_pytree,
    validate_tower_pytree,
)


def _specs():
    from clip_embedder_tpu.models import (
        fastvit,
        mct,
        text_transformer,
        vit,
    )

    vit_cfg = vit.ViTCfg(image_size=32, patch_size=8, width=64, layers=2,
                         heads=4, mlp_hidden=128, embed_dim=32)
    fv_cfg = fastvit.FastViTCfg(
        image_size=64, embed_dim=32, depths=(1, 1, 1, 1),
        dims=(16, 32, 64, 128), mlp_ratios=(3, 3, 3, 3),
        mixers=("repmixer",) * 3 + ("attention",),
        pos_embs=(False, False, False, True), lkc_act=True)
    txt_cfg = text_transformer.TextCfgResolved(
        context_length=12, vocab_size=128, width=64, heads=4, layers=2,
        mlp_hidden=256, embed_dim=32)
    mct_cfg = mct.MctCfg(context_length=16, vocab_size=64, width=32,
                         heads=2, layers=1, mlp_hidden=64, embed_dim=16,
                         conv_blocks=((3, 64), (5, 0)))
    return {
        "vit": (TowerSpec("vit", vit_cfg), vit.init),
        "fastvit": (TowerSpec("fastvit", fv_cfg), fastvit.init),
        "text_transformer": (TowerSpec("text_transformer", txt_cfg),
                             text_transformer.init),
        "mct": (TowerSpec("mct", mct_cfg), mct.init),
    }


@pytest.mark.parametrize("family", ["vit", "fastvit", "text_transformer",
                                    "mct"])
def test_validate_accepts_init_layout_and_rejects_mutations(family):
    spec, init = _specs()[family]
    params = init(jax.random.key(0), spec.cfg)

    validate_tower_pytree(params, spec, source="test")  # exact layout: ok

    flat, treedef = jax.tree_util.tree_flatten(params)

    # a wrong-shaped leaf → typed error naming the path
    bad = jax.tree_util.tree_unflatten(
        treedef, [np.zeros((7, 7), np.float32)] + flat[1:])
    with pytest.raises(WeightError, match="shape mismatch"):
        validate_tower_pytree(bad, spec, source="test")

    # a missing entry → typed error
    pruned = {k: v for k, v in params.items() if k != next(iter(params))}
    with pytest.raises(WeightError, match="missing"):
        validate_tower_pytree(pruned, spec, source="test")

    # an extra entry → typed error (a stale/foreign tree must not load)
    extra = dict(params)
    extra["not_a_weight"] = np.zeros((3,), np.float32)
    with pytest.raises(WeightError, match="unexpected"):
        validate_tower_pytree(extra, spec, source="test")


def test_corrupt_visual_npz_fails_typed_at_load(tmp_path):
    """End to end: a model dir whose visual.npz holds a foreign tree raises
    WeightError at construction, before any forward runs."""
    from test_tokenizer import make_clip_style_spec

    from clip_embedder_tpu import Clip
    from clip_embedder_tpu.config import OpenClipConfig
    from clip_embedder_tpu.models import text_transformer, vit
    from clip_embedder_tpu.models.build import resolve_text, resolve_vision

    occ = {
        "model_cfg": {
            "embed_dim": 32,
            "vision_cfg": {"image_size": 32, "layers": 2, "width": 64,
                           "patch_size": 8, "head_width": 16},
            "text_cfg": {"context_length": 12, "vocab_size": 512,
                         "width": 64, "heads": 4, "layers": 2},
        },
        "preprocess_cfg": {"mean": [0.5] * 3, "std": [0.5] * 3,
                           "interpolation": "bicubic",
                           "resize_mode": "shortest"},
    }
    d = tmp_path / "model"
    d.mkdir()
    (d / "open_clip_config.json").write_text(json.dumps(occ))
    (d / "model_config.json").write_text(json.dumps({
        "tokenizer_needs_lowercase": False,
        "activation_function": "softmax", "logit_scale": 100.0,
        "logit_bias": 0.0, "pad_id": 0, "vocab_size": 512}))
    (d / "tokenizer.json").write_text(json.dumps(make_clip_style_spec()))

    cfg = OpenClipConfig.from_dict(occ)
    save_pytree(d / "text.npz",
                text_transformer.init(jax.random.key(1),
                                      resolve_text(cfg.model_cfg).cfg))
    np.savez(d / "visual.npz", foo=np.zeros((3, 3), np.float32))

    with pytest.raises(WeightError, match="does not match the 'vit'"):
        Clip.from_local_dir(str(d))

    # repaired weights load fine through the same path
    save_pytree(d / "visual.npz",
                vit.init(jax.random.key(0), resolve_vision(cfg.model_cfg).cfg))
    Clip.from_local_dir(str(d))


def test_roundtrip_passes_validation(tmp_path):
    """save_pytree → load_pytree of a real init tree validates clean (list
    restoration via _relistify included — FastViT stages)."""
    spec, init = _specs()["fastvit"]
    params = init(jax.random.key(0), spec.cfg)
    save_pytree(tmp_path / "w.npz", params)
    validate_tower_pytree(load_pytree(tmp_path / "w.npz"), spec,
                          source=tmp_path / "w.npz")
