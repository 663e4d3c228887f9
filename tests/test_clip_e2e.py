"""End-to-end Clip tests over a synthetic model dir.

The reference's only integration test downloads a real model and classifies
a cat photo (reference: tests/integration_test.rs:10-36). Network is not
available in CI here, so this builds a complete *synthetic* model dir —
tokenizer.json, open_clip_config.json, model_config.json, native weights —
and drives the full pipeline: image decode → on-device preprocess → vision
tower → tokenize → text tower → scale/bias → softmax → ranked labels.
"""

import json

import numpy as np
import pytest

import jax

from clip_embedder_tpu import Clip, TextEmbedder, VisionEmbedder
from clip_embedder_tpu.errors import MissingModelFileError, ModelFolderNotFoundError
from clip_embedder_tpu.model_manager import verify_model_dir
from clip_embedder_tpu.models import text_transformer, vit
from clip_embedder_tpu.models.build import resolve_text, resolve_vision
from clip_embedder_tpu.config import OpenClipConfig
from clip_embedder_tpu.weights import save_pytree

from test_tokenizer import make_clip_style_spec

OPEN_CLIP_CONFIG = {
    "model_cfg": {
        "embed_dim": 32,
        "quick_gelu": True,
        "vision_cfg": {"image_size": 32, "layers": 2, "width": 64,
                       "patch_size": 8, "head_width": 16},
        "text_cfg": {"context_length": 12, "vocab_size": 512, "width": 64,
                     "heads": 4, "layers": 2},
    },
    "preprocess_cfg": {
        "mean": [0.48145466, 0.4578275, 0.40821073],
        "std": [0.26862954, 0.26130258, 0.27577711],
        "interpolation": "bicubic",
        "resize_mode": "shortest",
    },
}

MODEL_CONFIG = {
    "tokenizer_needs_lowercase": False,
    "activation_function": "softmax",
    "logit_scale": 100.0,
    "logit_bias": 0.0,
    "pad_id": 0,
    "vocab_size": 512,
}


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("synthetic_model")
    (d / "open_clip_config.json").write_text(json.dumps(OPEN_CLIP_CONFIG))
    (d / "model_config.json").write_text(json.dumps(MODEL_CONFIG))
    (d / "tokenizer.json").write_text(json.dumps(make_clip_style_spec()))

    cfg = OpenClipConfig.from_dict(OPEN_CLIP_CONFIG)
    vspec = resolve_vision(cfg.model_cfg)
    tspec = resolve_text(cfg.model_cfg)
    vparams = vit.init(jax.random.key(0), vspec.cfg)
    tparams = text_transformer.init(jax.random.key(1), tspec.cfg)
    save_pytree(d / "visual.npz", vparams)
    save_pytree(d / "text.npz", tparams)
    return d


def test_verify_model_dir(model_dir, tmp_path):
    verify_model_dir(model_dir)  # native-weight dirs satisfy the contract
    with pytest.raises(ModelFolderNotFoundError):
        verify_model_dir(tmp_path / "nope")
    incomplete = tmp_path / "incomplete"
    incomplete.mkdir()
    (incomplete / "model_config.json").write_text("{}")
    with pytest.raises(MissingModelFileError):
        verify_model_dir(incomplete)


@pytest.fixture(scope="module")
def shared_clip(model_dir):
    return Clip.from_local_dir(model_dir)


def test_classify_end_to_end(shared_clip):
    clip = shared_clip
    rng = np.random.default_rng(0)
    image = rng.integers(0, 255, size=(48, 64, 3), dtype=np.uint8)
    labels = ["a photo of a cat", "a photo of a dog", "a photo of a beignet"]
    results = clip.classify(image, labels)

    assert len(results) == 3
    assert {r[0] for r in results} == set(labels)
    probs = [r[1] for r in results]
    assert probs == sorted(probs, reverse=True)
    assert abs(sum(probs) - 1.0) < 1e-5
    # scoring must be reproducible
    again = clip.classify(image, labels)
    assert [r[0] for r in again] == [r[0] for r in results]
    np.testing.assert_allclose(
        [r[1] for r in again], probs, rtol=1e-6, atol=1e-7
    )


def test_compare_matches_classify_logit_semantics(shared_clip):
    """compare() returns sim·scale + bias (reference: src/clip.rs:81-90)."""
    clip = shared_clip
    rng = np.random.default_rng(1)
    image = rng.integers(0, 255, size=(40, 40, 3), dtype=np.uint8)
    logit = clip.compare(image, "a photo of a cat")
    v = clip.vision.embed_image(image)
    t = clip.text.embed_text("a photo of a cat")
    expect = float(v @ t) * MODEL_CONFIG["logit_scale"] + MODEL_CONFIG["logit_bias"]
    assert abs(logit - expect) < 1e-4


def test_rank_images(shared_clip):
    clip = shared_clip
    rng = np.random.default_rng(2)
    images = [
        rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)
        for h, w in [(33, 47), (64, 32), (32, 32)]
    ]
    results = clip.rank_images(images, "a photo of a dog")
    assert sorted(i for i, _ in results) == [0, 1, 2]
    probs = [p for _, p in results]
    assert probs == sorted(probs, reverse=True)
    assert abs(sum(probs) - 1.0) < 1e-5


def test_embeddings_unit_norm_and_batch_consistency(shared_clip):
    """Batch embedding must equal single-image embedding (the reference's
    dynamic batch axis contract), and embeddings are L2-normalized."""
    vision = shared_clip.vision
    text = shared_clip.text
    rng = np.random.default_rng(3)
    images = [rng.integers(0, 255, size=(50, 41, 3), dtype=np.uint8)
              for _ in range(3)]
    batch = vision.embed_images(images)
    np.testing.assert_allclose(np.linalg.norm(batch, axis=-1), 1.0, atol=1e-5)
    single = vision.embed_image(images[1])
    # different batch buckets compile different XLA programs; on a random-init
    # (chaotic) tower that means f32-noise-level differences, so compare at
    # cosine level (trained towers agree far tighter).
    cos = float(batch[1] @ single)
    assert cos > 1.0 - 1e-5
    np.testing.assert_allclose(batch[1], single, atol=5e-3)

    texts = ["a cat", "a dog photo", "the beignet of photo"]
    tbatch = text.embed_texts(texts)
    np.testing.assert_allclose(np.linalg.norm(tbatch, axis=-1), 1.0, atol=1e-5)
    np.testing.assert_allclose(tbatch[2], text.embed_text(texts[2]), atol=5e-3)
    assert float(tbatch[2] @ text.embed_text(texts[2])) > 1.0 - 1e-5


def test_sigmoid_activation_path(model_dir, tmp_path):
    """SigLIP-style scoring: sigmoid over scale·sim + bias
    (reference: src/clip.rs:110-121)."""
    import shutil

    d = tmp_path / "sigmodel"
    shutil.copytree(model_dir, d)
    mc = dict(MODEL_CONFIG)
    mc["activation_function"] = "sigmoid"
    mc["logit_bias"] = -10.0
    mc["tokenizer_needs_lowercase"] = True
    (d / "model_config.json").write_text(json.dumps(mc))

    clip = Clip.from_local_dir(d)
    rng = np.random.default_rng(4)
    image = rng.integers(0, 255, size=(32, 32, 3), dtype=np.uint8)
    results = clip.classify(image, ["A PHOTO OF A CAT", "a photo of a dog"])
    for _, p in results:
        assert 0.0 <= p <= 1.0
    # sigmoid probs don't sum to 1
    assert abs(sum(p for _, p in results) - 1.0) > 1e-3


def test_duplicate(shared_clip):
    clip = shared_clip
    dup = clip.duplicate()
    rng = np.random.default_rng(5)
    image = rng.integers(0, 255, size=(32, 32, 3), dtype=np.uint8)
    a = clip.vision.embed_image(image)
    b = dup.vision.embed_image(image)
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_warmup_runs(shared_clip):
    from clip_embedder_tpu.serving import warmup

    warmup(shared_clip, batch_sizes=(1, 2), image_sizes=((40, 40),))


def test_fastvit_model_dir_end_to_end(tmp_path):
    """Full Clip pipeline over a FastViT (MobileCLIP-style) model dir."""
    from clip_embedder_tpu.models import fastvit
    from clip_embedder_tpu.models.fastvit import FastViTCfg

    occ = {
        "model_cfg": {
            "embed_dim": 32,
            "vision_cfg": {"image_size": 64, "timm_model_name": "fastvit_mci0",
                           "fastvit_cfg": {"depths": (1, 1, 1, 1),
                                           "dims": (16, 32, 64, 128),
                                           "mlp_ratios": (3, 3, 3, 3),
                                           "mixers": ("repmixer",) * 3 + ("attention",),
                                           "pos_embs": (False, False, False, True)}},
            "text_cfg": {"context_length": 12, "vocab_size": 512, "width": 64,
                         "heads": 4, "layers": 2},
        },
        "preprocess_cfg": {"mean": [0, 0, 0], "std": [1, 1, 1]},
    }
    d = tmp_path / "fastvit_model"
    d.mkdir()
    (d / "open_clip_config.json").write_text(json.dumps(occ))
    (d / "model_config.json").write_text(json.dumps(MODEL_CONFIG))
    (d / "tokenizer.json").write_text(json.dumps(make_clip_style_spec()))
    cfg = OpenClipConfig.from_dict(occ)
    vspec = resolve_vision(cfg.model_cfg)
    assert vspec.family == "fastvit"
    from clip_embedder_tpu.weights import save_pytree as sp

    sp(d / "visual.npz", fastvit.init(jax.random.key(0), vspec.cfg))
    sp(d / "text.npz", text_transformer.init(
        jax.random.key(1), resolve_text(cfg.model_cfg).cfg))

    clip = Clip.from_local_dir(d)
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (80, 100, 3), dtype=np.uint8)
    results = clip.classify(img, ["a cat", "a dog"])
    assert abs(sum(p for _, p in results) - 1.0) < 1e-5


def test_resnet_model_dir_end_to_end(tmp_path):
    """Full Clip pipeline over a ModifiedResNet (RN50-style) model dir."""
    from clip_embedder_tpu.models import resnet as resnet_mod

    occ = {
        "model_cfg": {
            "embed_dim": 32,
            "vision_cfg": {"image_size": 64, "layers": [1, 1, 1, 1],
                           "width": 16},
            "text_cfg": {"context_length": 12, "vocab_size": 512, "width": 64,
                         "heads": 4, "layers": 2},
        },
        "preprocess_cfg": {"mean": [0.48, 0.46, 0.41],
                           "std": [0.27, 0.26, 0.28]},
    }
    d = tmp_path / "resnet_model"
    d.mkdir()
    (d / "open_clip_config.json").write_text(json.dumps(occ))
    (d / "model_config.json").write_text(json.dumps(MODEL_CONFIG))
    (d / "tokenizer.json").write_text(json.dumps(make_clip_style_spec()))
    cfg = OpenClipConfig.from_dict(occ)
    vspec = resolve_vision(cfg.model_cfg)
    assert vspec.family == "resnet"
    from clip_embedder_tpu.weights import save_pytree as sp

    sp(d / "visual.npz", resnet_mod.init(jax.random.key(0), vspec.cfg))
    sp(d / "text.npz", text_transformer.init(
        jax.random.key(1), resolve_text(cfg.model_cfg).cfg))

    clip = Clip.from_local_dir(d)
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (90, 70, 3), dtype=np.uint8)
    results = clip.classify(img, ["a cat", "a dog", "the beignet"])
    assert abs(sum(p for _, p in results) - 1.0) < 1e-5
    ranked = clip.rank_images([img, img[:50]], "a photo of a cat")
    assert len(ranked) == 2
