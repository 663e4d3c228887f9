#!/usr/bin/env python
"""Generate committed golden fixtures: one tiny model dir per tower family
with pinned embeddings computed on the f32 CPU backend.

These lock numerics ACROSS rounds (the per-round parity tests randomize, so
they can't catch a silent convention change — e.g. a rope layout edit).
Regenerating an existing fixture intentionally invalidates that protection,
so existing dirs are skipped unless ``--force <name>`` is given.

The reference's analog is its verified-equal-embeddings claim
(reference: README.md:147-148) pinned by the HF integration test
(reference: tests/integration_test.rs:10-36); here the pins are offline.
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

FIXDIR = REPO / "tests" / "fixtures"

TEXT_CFG_TINY = {"context_length": 12, "vocab_size": 512, "width": 64,
                 "heads": 4, "layers": 2}
PRE_CFG = {"mean": [0.48145466, 0.4578275, 0.40821073],
           "std": [0.26862954, 0.26130258, 0.27577711],
           "interpolation": "bicubic", "resize_mode": "shortest"}
MODEL_CFG_SOFTMAX = {"tokenizer_needs_lowercase": False,
                     "activation_function": "softmax",
                     "logit_scale": 100.0, "logit_bias": 0.0, "pad_id": 0}

# name -> (model_cfg dict, model_config.json dict)
FAMILIES: dict[str, tuple[dict, dict]] = {
    "golden_fastvit": (
        {"embed_dim": 32,
         "vision_cfg": {"image_size": 64, "timm_model_name": "fastvit_mci0",
                        "fastvit_cfg": {"depths": (1, 1, 1, 1),
                                        "dims": (16, 32, 64, 128),
                                        "mlp_ratios": (3, 3, 3, 3),
                                        "mixers": ("repmixer",) * 3
                                                  + ("attention",),
                                        "pos_embs": (False,) * 3 + (True,)}},
         "text_cfg": TEXT_CFG_TINY},
        MODEL_CFG_SOFTMAX,
    ),
    "golden_resnet": (
        {"embed_dim": 32,
         "vision_cfg": {"image_size": 64, "layers": [1, 1, 1, 1], "width": 16},
         "text_cfg": TEXT_CFG_TINY},
        MODEL_CFG_SOFTMAX,
    ),
    "golden_convnext": (
        {"embed_dim": 32,
         "vision_cfg": {"image_size": 64,
                        "timm_model_name": "convnext_tiny",
                        "convnext_cfg": {"depths": (1, 1, 1, 1),
                                         "dims": (16, 32, 64, 128)}},
         "text_cfg": TEXT_CFG_TINY},
        MODEL_CFG_SOFTMAX,
    ),
    "golden_eva02": (
        {"embed_dim": 32,
         "vision_cfg": {"image_size": 32,
                        "timm_model_name": "eva02_base_patch8_clip_32",
                        "eva02_cfg": {"width": 64, "layers": 2, "heads": 4,
                                      "mlp_hidden": 96}},
         "text_cfg": TEXT_CFG_TINY},
        MODEL_CFG_SOFTMAX,
    ),
    "golden_hf_bert": (
        {"embed_dim": 32,
         "vision_cfg": {"image_size": 32, "layers": 2, "width": 64,
                        "patch_size": 8, "head_width": 16},
         "text_cfg": {"context_length": 12,
                      "hf_model_name": "tiny-bert-fixture",
                      "hf_config": {"vocab_size": 512, "hidden_size": 64,
                                    "num_attention_heads": 4,
                                    "num_hidden_layers": 2,
                                    "intermediate_size": 128},
                      "pooler_type": "cls_last_hidden_state_pooler", "proj_type": "linear"}},
        MODEL_CFG_SOFTMAX,
    ),
    "golden_siglip": (
        {"embed_dim": 64, "init_logit_bias": -10,
         "vision_cfg": {"image_size": 64,
                        "timm_model_name": "vit_tiny_patch16_siglip_64",
                        "timm_proj": "none",
                        "vit_cfg": {"width": 64, "layers": 2, "heads": 4,
                                    "mlp_hidden": 128}},
         "text_cfg": {**TEXT_CFG_TINY, "no_causal_mask": True,
                      "pool_type": "last", "proj_bias": True}},
        {"tokenizer_needs_lowercase": True,
         "activation_function": "sigmoid",
         "logit_scale": 100.0, "logit_bias": -10.0, "pad_id": 1},
    ),
}


def build_fixture(name: str) -> None:
    from test_tokenizer import make_clip_style_spec

    from clip_embedder_tpu import Clip
    from clip_embedder_tpu.config import OpenClipConfig
    from clip_embedder_tpu.models.build import resolve_text, resolve_vision
    from clip_embedder_tpu.weights import save_pytree

    model_cfg, model_config = FAMILIES[name]
    d = FIXDIR / name
    d.mkdir(parents=True, exist_ok=True)
    occ = {"model_cfg": model_cfg, "preprocess_cfg": PRE_CFG}
    (d / "open_clip_config.json").write_text(json.dumps(occ, indent=1))
    (d / "model_config.json").write_text(json.dumps(model_config, indent=1))
    (d / "tokenizer.json").write_text(json.dumps(make_clip_style_spec()))

    cfg = OpenClipConfig.from_file(d / "open_clip_config.json")
    vspec = resolve_vision(cfg.model_cfg)
    tspec = resolve_text(cfg.model_cfg)
    import importlib

    vmod = importlib.import_module(f"clip_embedder_tpu.models.{vspec.family}"
                                   if vspec.family != "vit" else
                                   "clip_embedder_tpu.models.vit")
    tmod = importlib.import_module(
        "clip_embedder_tpu.models.hf_text" if tspec.family == "hf_bert"
        else "clip_embedder_tpu.models.text_transformer")
    save_pytree(d / "visual.npz", vmod.init(jax.random.key(42), vspec.cfg))
    save_pytree(d / "text.npz", tmod.init(jax.random.key(43), tspec.cfg))

    clip = Clip.from_local_dir(d)
    rng = np.random.default_rng(7)
    img = rng.integers(0, 255, (48, 40, 3), dtype=np.uint8)
    np.save(d / "golden_image.npy", img)
    img_emb = clip.vision.embed_image(img)
    txt_emb = clip.text.embed_texts(["a photo of a cat", "the dog!"])
    np.savez(d / "golden_outputs.npz", image_embedding=img_emb,
             text_embeddings=txt_emb)
    probs = clip.classify(img, ["a photo of a cat", "a photo of a dog"])
    (d / "golden_classify.json").write_text(json.dumps(probs))
    print(f"{name}: wrote {sorted(p.name for p in d.iterdir())}")
    print(f"{name}: classify {probs}")


def main(argv: list[str]) -> int:
    force = set()
    if "--force" in argv:
        force = set(argv[argv.index("--force") + 1:])
    for name in FAMILIES:
        if (FIXDIR / name / "golden_outputs.npz").exists() and name not in force:
            print(f"{name}: exists, skipping (use --force {name} to redo)")
            continue
        build_fixture(name)
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
