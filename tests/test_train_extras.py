"""Training-side checkpoint/resume (orbax) and training→serving handoff."""

import numpy as np

import jax
import jax.numpy as jnp

from clip_embedder_tpu.models.text_transformer import TextCfgResolved
from clip_embedder_tpu.models.vit import ViTCfg
from clip_embedder_tpu.train import (
    TrainConfig,
    export_trained_model,
    init_train_state,
    load_checkpoint,
    save_checkpoint,
)

VCFG = ViTCfg(image_size=16, patch_size=8, width=32, layers=1, heads=2,
              mlp_hidden=64, embed_dim=16)
TCFG = TextCfgResolved(context_length=8, vocab_size=64, width=32, heads=2,
                       layers=1, mlp_hidden=64, embed_dim=16)


def test_checkpoint_roundtrip(tmp_path):
    cfg = TrainConfig(vision_cfg=VCFG, text_cfg=TCFG)
    params, _ = init_train_state(jax.random.key(0), cfg)
    save_checkpoint(tmp_path / "ckpt", params, step=3)

    abstract = {
        "params": jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), params
        ),
        "step": 0,
    }
    restored = load_checkpoint(tmp_path / "ckpt", step=3,
                               abstract_state=abstract)
    assert restored["step"] == 3
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(restored["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_export_trained_model_serves(tmp_path):
    """Trained params written to a model dir must be loadable by the
    inference weight path (training → serving handoff)."""
    import json

    from clip_embedder_tpu import Clip
    from test_clip_e2e import MODEL_CONFIG
    from test_tokenizer import make_clip_style_spec

    cfg = TrainConfig(vision_cfg=ViTCfg(image_size=32, patch_size=8, width=64,
                                        layers=2, heads=4, mlp_hidden=128,
                                        embed_dim=32, activation="quick_gelu"),
                      text_cfg=TextCfgResolved(context_length=12, vocab_size=512,
                                               width=64, heads=4, layers=2,
                                               mlp_hidden=256, embed_dim=32))
    params, _ = init_train_state(jax.random.key(1), cfg)

    d = tmp_path / "model"
    d.mkdir()
    open_clip_config = {
        "model_cfg": {
            "embed_dim": 32, "quick_gelu": True,
            # mlp_ratio must match the trained mlp_hidden (128 = 2×64):
            # export_trained_model validates the handoff and rejects a
            # config that doesn't describe the weights
            "vision_cfg": {"image_size": 32, "layers": 2, "width": 64,
                           "patch_size": 8, "head_width": 16,
                           "mlp_ratio": 2.0},
            "text_cfg": {"context_length": 12, "vocab_size": 512, "width": 64,
                         "heads": 4, "layers": 2},
        },
        "preprocess_cfg": {"mean": [0.5, 0.5, 0.5], "std": [0.5, 0.5, 0.5]},
    }
    (d / "open_clip_config.json").write_text(json.dumps(open_clip_config))
    (d / "model_config.json").write_text(json.dumps(MODEL_CONFIG))
    (d / "tokenizer.json").write_text(json.dumps(make_clip_style_spec()))
    export_trained_model(d, params)

    clip = Clip.from_local_dir(d)
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
    results = clip.classify(img, ["a cat", "a dog"])
    assert len(results) == 2
    assert abs(sum(p for _, p in results) - 1.0) < 1e-5


def test_export_rejects_config_weight_mismatch(tmp_path):
    """export_trained_model must refuse a handoff where the dir's
    open_clip_config resolves a different architecture than the trained
    weights (here: config omits the non-default mlp_ratio) — a typed
    error at export beats a dir every later load rejects."""
    import json

    import pytest

    from clip_embedder_tpu.errors import WeightError

    cfg = TrainConfig(vision_cfg=ViTCfg(image_size=32, patch_size=8, width=64,
                                        layers=2, heads=4, mlp_hidden=128,
                                        embed_dim=32),
                      text_cfg=TextCfgResolved(context_length=12,
                                               vocab_size=512, width=64,
                                               heads=4, layers=2,
                                               mlp_hidden=256, embed_dim=32))
    params, _ = init_train_state(jax.random.key(1), cfg)

    d = tmp_path / "model"
    d.mkdir()
    (d / "open_clip_config.json").write_text(json.dumps({
        "model_cfg": {
            "embed_dim": 32,
            # no mlp_ratio → resolves mlp_hidden 256, weights carry 128
            "vision_cfg": {"image_size": 32, "layers": 2, "width": 64,
                           "patch_size": 8, "head_width": 16},
            "text_cfg": {"context_length": 12, "vocab_size": 512,
                         "width": 64, "heads": 4, "layers": 2},
        },
        "preprocess_cfg": {"mean": [0.5] * 3, "std": [0.5] * 3},
    }))
    with pytest.raises(WeightError, match="mlp"):
        export_trained_model(d, params)
    assert not (d / "visual.npz").exists()  # nothing half-written
