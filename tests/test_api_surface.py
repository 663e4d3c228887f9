"""Public API surface pin: every capability the reference exports
(reference: src/lib.rs:170-181 re-exports + method sets) must exist here.
Guards against accidental surface regressions."""

import inspect

import clip_embedder_tpu as pkg


def test_root_exports():
    for name in ("Clip", "VisionEmbedder", "TextEmbedder", "ClipError",
                 "ModelConfig", "OpenClipConfig"):
        assert hasattr(pkg, name), name


def test_clip_methods():
    from clip_embedder_tpu import Clip

    for name in ("from_hf", "from_local_id", "from_local_dir", "duplicate",
                 "get_model_config", "compare", "classify", "rank_images",
                 "softmax", "sigmoid"):
        assert callable(getattr(Clip, name)), name


def test_vision_methods():
    from clip_embedder_tpu import VisionEmbedder

    for name in ("from_hf", "from_local_id", "from_local_dir", "duplicate",
                 "embed_image", "embed_images", "preprocess",
                 "preprocess_batch"):
        assert callable(getattr(VisionEmbedder, name)), name


def test_text_methods():
    from clip_embedder_tpu import TextEmbedder

    for name in ("from_hf", "from_local_id", "from_local_dir", "duplicate",
                 "tokenize", "embed_text", "embed_texts"):
        assert callable(getattr(TextEmbedder, name)), name


def test_error_variants():
    """Every reference ClipError variant has a typed analog
    (reference: src/error.rs:8-41)."""
    from clip_embedder_tpu import errors

    for name in ("IoError", "JsonError", "ImageError", "TokenizerError",
                 "ConfigError", "InferenceError", "ShapeError",
                 "ModelFolderNotFoundError", "HfHubError",
                 "MissingModelFileError", "ResizeError"):
        cls = getattr(errors, name)
        assert issubclass(cls, errors.ClipError), name


def test_model_files_contract():
    from clip_embedder_tpu.model_manager import MODEL_FILES

    # the reference's 9-file list, verbatim (src/model_manager.rs:8-18)
    assert set(MODEL_FILES) == {
        "model_config.json", "open_clip_config.json",
        "special_tokens_map.json", "text.onnx", "tokenizer.json",
        "tokenizer_config.json", "visual.onnx", "text.onnx.data",
        "visual.onnx.data",
    }


def test_non_square_image_size_rejected():
    """A list-valued non-square image_size must raise ConfigError, not
    silently run the tower at size[0]."""
    import pytest

    from clip_embedder_tpu.config import VisionCfg
    from clip_embedder_tpu.errors import ConfigError

    assert VisionCfg.from_dict({"image_size": [336, 336]}).image_size == 336
    with pytest.raises(ConfigError, match="Non-square"):
        VisionCfg.from_dict({"image_size": [336, 448]})


def test_parallel_exports():
    """The scale-out surface docs/MIGRATION.md points users at."""
    import clip_embedder_tpu.parallel as par

    for name in ("get_mesh", "replicate", "select_platform", "shard_batch",
                 "tp_param_specs", "ShardedVisionEmbedder",
                 "ShardedTextEmbedder", "EmbedPipeline"):
        assert hasattr(par, name), name


def test_migration_guide_names_resolve():
    """Every dotted clip_embedder_tpu attribute the migration guide cites
    must exist — docs must not rot."""
    import re
    from pathlib import Path

    import clip_embedder_tpu

    text = (Path(__file__).parent.parent / "docs" / "MIGRATION.md").read_text()
    for mod, attr in re.findall(
            r"`(?:clip_embedder_tpu\.)?(parallel|serving|errors|config|"
            r"model_manager|train)\.([A-Za-z_]\w*)", text):
        if attr == "py":  # a file mention (`train.py`), not an attribute
            continue
        module = __import__(f"clip_embedder_tpu.{mod}", fromlist=[mod])
        assert hasattr(module, attr), f"{mod}.{attr} cited but missing"
