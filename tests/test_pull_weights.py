"""Offline coverage of the converter (pull_weights.py): a synthetic full
open_clip checkpoint (torch state dict with visual.* + text + logit params)
converts into a servable model dir — the reference exporter's role
(reference: pull_onnx.py:251-303) without the network."""

import json
import sys
from pathlib import Path

import numpy as np
import pytest
import torch

sys.path.insert(0, str(Path(__file__).parent.parent))

import pull_weights
from torch_ref import TextTransformer, VisionTransformer


@pytest.fixture()
def checkpoint_and_dir(tmp_path):
    torch.manual_seed(0)
    vt = VisionTransformer(32, 8, 64, 2, 4, 256, 32, quick_gelu=True).eval()
    tt = TextTransformer(12, 512, 64, 4, 2, 256, 32, quick_gelu=True).eval()
    sd = {f"visual.{k}": v.numpy() for k, v in vt.state_dict().items()}
    sd.update({k: v.numpy() for k, v in tt.state_dict().items()})
    sd["logit_scale"] = np.asarray(np.log(100.0), np.float32)

    d = tmp_path / "model"
    d.mkdir()
    occ = {
        "model_cfg": {
            "embed_dim": 32, "quick_gelu": True,
            "vision_cfg": {"image_size": 32, "layers": 2, "width": 64,
                           "patch_size": 8, "head_width": 16},
            "text_cfg": {"context_length": 12, "vocab_size": 512, "width": 64,
                         "heads": 4, "layers": 2},
        },
        "preprocess_cfg": {"mean": [0.5, 0.5, 0.5], "std": [0.3, 0.3, 0.3]},
    }
    (d / "open_clip_config.json").write_text(json.dumps(occ))
    from test_tokenizer import make_clip_style_spec

    (d / "tokenizer.json").write_text(json.dumps(make_clip_style_spec()))
    return sd, d, occ, vt, tt


def test_convert_checkpoint_serves(checkpoint_and_dir):
    sd, d, occ, vt, tt = checkpoint_and_dir
    model_config = pull_weights.derive_model_config("some/CLIP-model", occ, sd)
    (d / "model_config.json").write_text(json.dumps(model_config))
    # non-siglip repo: softmax head, no lowercase, exp'd logit scale
    assert model_config["activation_function"] == "softmax"
    assert model_config["tokenizer_needs_lowercase"] is False
    assert abs(model_config["logit_scale"] - 100.0) < 1e-3
    assert model_config["vocab_size"] == 512

    pull_weights.convert_checkpoint(d, sd)
    assert (d / "visual.npz").is_file() and (d / "text.npz").is_file()

    from clip_embedder_tpu import Clip

    clip = Clip.from_local_dir(d)
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (40, 50, 3), dtype=np.uint8)
    results = clip.classify(img, ["a photo of a cat", "a photo of a dog"])
    assert abs(sum(p for _, p in results) - 1.0) < 1e-5

    # vision tower must match the torch source
    import jax.numpy as jnp
    from clip_embedder_tpu.models import vit as vit_mod

    x = torch.randn(2, 3, 32, 32)
    ref = vt(x).detach().numpy()
    got = np.asarray(vit_mod.apply(
        clip.vision.params, jnp.asarray(x.permute(0, 2, 3, 1).numpy()),
        clip.vision.spec.cfg))
    assert ((got * ref).sum(-1) > 1 - 1e-5).all()

    # and the text tower
    ids = torch.randint(1, 510, (3, 12))
    ids[:, 0] = 511
    ref_t = tt(ids).detach().numpy()
    from clip_embedder_tpu.models import text_transformer as tt_mod

    got_t = np.asarray(tt_mod.apply(
        clip.text.params, jnp.asarray(ids.numpy()), clip.text.spec.cfg))
    assert ((got_t * ref_t).sum(-1) > 1 - 1e-5).all()


def test_derive_fastvit_cfg_from_sd():
    """Checkpoint shapes are the ground truth for the stage architecture
    (VERDICT r4 next #3) — every graph-derivable field except head_dim/
    lkc_act recovers from the state dict alone."""
    from torch_ref_fastvit import TorchFastViT

    from clip_embedder_tpu.models.fastvit import derive_fastvit_cfg_from_sd

    torch.manual_seed(0)
    m = TorchFastViT((1, 2, 2), (8, 16, 32), (3, 3, 3),
                     ("repmixer", "repmixer", "attention"),
                     (False, False, True), embed_dim=32, head_dim=16).eval()
    sd = {f"visual.trunk.{k}": v.numpy() for k, v in m.state_dict().items()}
    cfg = derive_fastvit_cfg_from_sd(sd)
    assert cfg["depths"] == (1, 2, 2)
    assert cfg["dims"] == (8, 16, 32)
    assert cfg["mlp_ratios"] == (3.0, 3.0, 3.0)
    assert cfg["mixers"] == ("repmixer", "repmixer", "attention")
    assert cfg["pos_embs"] == (False, False, True)
    assert cfg["final_conv_ratio"] == 2.0
    assert cfg["use_head_proj"] is True

    # a plain-ViT state dict must be rejected, not misread
    from clip_embedder_tpu.errors import WeightError

    vt = VisionTransformer(32, 8, 64, 2, 4, 256, 32).eval()
    with pytest.raises(WeightError, match="stem"):
        derive_fastvit_cfg_from_sd(
            {f"visual.{k}": v.numpy() for k, v in vt.state_dict().items()})


def test_derive_eva02_cfg_from_sd():
    from test_eva02 import TorchEva02

    from clip_embedder_tpu.models.eva02 import derive_eva02_cfg_from_sd

    IMG, PATCH, W, LAYERS, HEADS, HIDDEN, EMBED = 32, 8, 64, 2, 4, 96, 48
    torch.manual_seed(7)
    mirror = TorchEva02(IMG, PATCH, W, LAYERS, HEADS, HIDDEN, EMBED).eval()
    sd = {f"visual.trunk.{k}": v.numpy()
          for k, v in mirror.state_dict().items()}
    cfg = derive_eva02_cfg_from_sd(sd)
    assert cfg == {"width": W, "layers": LAYERS, "mlp_hidden": HIDDEN}

    from clip_embedder_tpu.errors import WeightError

    vt = VisionTransformer(32, 8, 64, 2, 4, 256, 32).eval()
    with pytest.raises(WeightError, match="SwiGLU|patch conv"):
        derive_eva02_cfg_from_sd(
            {f"visual.{k}": v.numpy() for k, v in vt.state_dict().items()})


def test_derive_pe_cfg_from_sd():
    from test_pe_core import EMBED, HEADS, IMG, LAYERS, MLP, PATCH, W, \
        PECoreViT

    from clip_embedder_tpu.weights import derive_pe_cfg_from_sd

    torch.manual_seed(0)
    mirror = PECoreViT(IMG, PATCH, W, LAYERS, HEADS, MLP, EMBED).eval()
    sd = {k: v.detach().numpy() for k, v in mirror.state_dict().items()}
    cfg = derive_pe_cfg_from_sd(sd)
    assert cfg["width"] == W
    assert cfg["patch_size"] == PATCH
    assert cfg["layers"] == LAYERS
    assert cfg["mlp_hidden"] == MLP
    assert cfg["pool"] == "map"
    assert "heads" not in cfg  # never shape-derivable — table/override only


def test_convert_checkpoint_derives_fastvit_dims(tmp_path):
    """An MCi3-named checkpoint with dims that contradict the paper table
    converts with SD-DERIVED dims (persisted), loads, and matches the torch
    mirror — the table is bypassed whenever a checkpoint exists."""
    from torch_ref_fastvit import TorchFastViT

    torch.manual_seed(3)
    # head_dim 32 = the timm constant the derivation assumes
    fv = TorchFastViT((1, 2, 2), (16, 32, 64), (3, 3, 3),
                      ("repmixer", "repmixer", "attention"),
                      (False, False, True), embed_dim=32, head_dim=32).eval()
    tt = TextTransformer(12, 512, 64, 4, 2, 256, 32).eval()
    sd = {f"visual.trunk.{k}": v.numpy() for k, v in fv.state_dict().items()}
    sd.update({k: v.numpy() for k, v in tt.state_dict().items()})
    sd["logit_scale"] = np.asarray(np.log(100.0), np.float32)

    d = tmp_path / "model"
    d.mkdir()
    occ = {
        "model_cfg": {
            "embed_dim": 32,
            "vision_cfg": {"image_size": 64,
                           "timm_model_name": "fastvit_mci3"},
            "text_cfg": {"context_length": 12, "vocab_size": 512,
                         "width": 64, "heads": 4, "layers": 2},
        },
        "preprocess_cfg": {"mean": [0.5] * 3, "std": [0.3] * 3},
    }
    (d / "open_clip_config.json").write_text(json.dumps(occ))
    from test_tokenizer import make_clip_style_spec

    (d / "tokenizer.json").write_text(json.dumps(make_clip_style_spec()))
    (d / "model_config.json").write_text(json.dumps(
        pull_weights.derive_model_config("apple/MobileCLIP2-S3", occ, sd)))

    pull_weights.convert_checkpoint(d, sd)
    # derived dims were persisted — the mci3 paper-table row is unused
    occ2 = json.loads((d / "open_clip_config.json").read_text())
    derived = occ2["model_cfg"]["vision_cfg"]["fastvit_cfg"]
    assert tuple(derived["dims"]) == (16, 32, 64)
    assert tuple(derived["depths"]) == (1, 2, 2)

    from clip_embedder_tpu import VisionEmbedder

    ve = VisionEmbedder.from_local_dir(d)
    assert ve.spec.family == "fastvit"
    x = torch.randn(2, 3, 64, 64)
    ref = fv(x).detach().numpy()
    ref /= np.linalg.norm(ref, axis=-1, keepdims=True)
    import jax.numpy as jnp

    from clip_embedder_tpu.models import fastvit as fv_mod

    got = np.asarray(fv_mod.apply(
        ve.params, jnp.asarray(x.permute(0, 2, 3, 1).numpy()), ve.spec.cfg))
    assert ((got * ref).sum(-1) > 1 - 1e-5).all()


def test_derive_model_config_siglip_rules(checkpoint_and_dir):
    """SigLIP detection rules (reference: pull_onnx.py:128-150): repo name
    or init_logit_bias; pad_id 1 for SigLIP-v1, 0 for SigLIP2."""
    sd, _, occ, _, _ = checkpoint_and_dir
    sd = dict(sd)
    sd["logit_bias"] = np.asarray(-12.9, np.float32)

    mc = pull_weights.derive_model_config("timm/ViT-SO400M-14-SigLIP", occ, sd)
    assert mc["activation_function"] == "sigmoid"
    assert mc["tokenizer_needs_lowercase"] is True
    assert mc["pad_id"] == 1
    assert abs(mc["logit_bias"] + 12.9) < 1e-5

    mc2 = pull_weights.derive_model_config("timm/ViT-B-16-SigLIP2", occ, sd)
    assert mc2["pad_id"] == 0

    occ_bias = dict(occ)
    occ_bias["model_cfg"] = {**occ["model_cfg"], "init_logit_bias": -10.0}
    mc3 = pull_weights.derive_model_config("someone/NoNameHint", occ_bias, sd)
    assert mc3["activation_function"] == "sigmoid"


def test_write_model_readme(tmp_path):
    """Converted dirs get a usage README (the reference exporter rewrites
    the repo README with a usage snippet, pull_onnx.py:184-248)."""
    import ast
    import re

    from pull_weights import write_model_readme

    write_model_readme(tmp_path, "someorg/Some-Model")
    text = (tmp_path / "README.md").read_text()
    assert "Some-Model" in text and "from clip_embedder_tpu import Clip" in text
    block = re.search(r"```python\n(.*?)```", text, flags=re.S).group(1)
    ast.parse(block)  # the snippet must at least be valid python


def test_write_model_readme_preserves_upstream_card(tmp_path):
    """When the source repo's README was carried over (reference:
    pull_onnx.py:43-50 copies it, :184-248 rewrites it), the rewrite keeps
    the upstream frontmatter minus library_name and the upstream body,
    injecting the usage header between them."""
    from pull_weights import write_model_readme

    (tmp_path / "README.md").write_text(
        "---\nlicense: apache-2.0\nlibrary_name: open_clip\ntags:\n- clip\n"
        "---\n\n# Upstream card\n\nOriginal model description.\n")
    write_model_readme(tmp_path, "someorg/Some-Model")
    text = (tmp_path / "README.md").read_text()
    assert text.startswith("---\nlicense: apache-2.0\ntags:\n- clip\n---\n")
    assert "library_name" not in text
    assert "from clip_embedder_tpu import Clip" in text
    assert "Original model description." in text
    # header comes before the upstream body
    assert text.index("clip_embedder_tpu model dir") < text.index(
        "# Upstream card")


def test_write_model_readme_no_frontmatter(tmp_path):
    """An upstream README without YAML frontmatter is kept below the
    injected header."""
    from pull_weights import write_model_readme

    (tmp_path / "README.md").write_text("# Plain card\n\nBody text.\n")
    write_model_readme(tmp_path, "someorg/Other")
    text = (tmp_path / "README.md").read_text()
    assert "from clip_embedder_tpu import Clip" in text
    assert "Body text." in text


def test_write_model_readme_idempotent(tmp_path):
    """Rerunning a pull whose upstream README download missed must not
    stack a second usage header onto the already-rewritten card."""
    from pull_weights import write_model_readme

    (tmp_path / "README.md").write_text(
        "---\nlicense: mit\n---\n\n# Upstream card\n\nBody.\n")
    write_model_readme(tmp_path, "someorg/Some-Model")
    once = (tmp_path / "README.md").read_text()
    write_model_readme(tmp_path, "someorg/Some-Model")
    assert (tmp_path / "README.md").read_text() == once
    assert once.count("clip_embedder_tpu model dir") == 1


def test_pull_popular_models_tallies_failures(tmp_path):
    """The batch-pull script (analog of the reference's
    scripts/pull_popular_models.ps1) runs the exporter per id and exits
    nonzero with a failure summary when a pull fails."""
    import subprocess
    import sys
    from pathlib import Path

    script = Path(__file__).resolve().parent.parent / "scripts" \
        / "pull_popular_models.py"
    r = subprocess.run(
        [sys.executable, str(script), "--models", "no-such-org/no-such-model",
         "--output", str(tmp_path)],
        capture_output=True, text=True, timeout=300)
    assert r.returncode == 1
    assert "FAILED: no-such-org/no-such-model" in r.stderr
    assert "Summary of failures" in r.stderr
