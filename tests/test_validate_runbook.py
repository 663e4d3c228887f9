"""Dry-run of the network-day validation runbook
(scripts/validate_reference_models.py) with mocked fetches: both
conversion paths are exercised against the SAME torch tower (a synthetic
checkpoint for the pull path, a torch-exported ONNX dir for the published-
dir path), so the parity column measures a real two-route agreement —
exactly what the script does on network day against the reference's
tested list (reference: README.md:135-145, tests/integration_test.rs)."""

import json
import sys
from pathlib import Path

import numpy as np
import pytest
import torch
import torch.nn.functional as F
from torch import nn

sys.path.insert(0, str(Path(__file__).parent))
sys.path.insert(0, str(Path(__file__).parent.parent / "scripts"))

from test_onnx_exec import export  # noqa: E402
from test_tokenizer import make_clip_style_spec  # noqa: E402
from torch_ref import TextTransformer, VisionTransformer  # noqa: E402

import validate_reference_models as vrm  # noqa: E402

IMG, PATCH, W, LAYERS, HEADS, MLP, EMBED, CTX = 32, 8, 64, 2, 4, 256, 32, 12


def _write_configs(d: Path) -> None:
    occ = {
        "model_cfg": {
            "embed_dim": EMBED,
            "vision_cfg": {"image_size": IMG, "layers": LAYERS, "width": W,
                           "patch_size": PATCH, "head_width": W // HEADS},
            "text_cfg": {"context_length": CTX, "vocab_size": 512,
                         "width": W, "heads": HEADS, "layers": LAYERS},
        },
        "preprocess_cfg": {"mean": [0.5] * 3, "std": [0.5] * 3},
    }
    (d / "open_clip_config.json").write_text(json.dumps(occ))
    (d / "model_config.json").write_text(json.dumps(
        {"tokenizer_needs_lowercase": False,
         "activation_function": "softmax", "logit_scale": 100.0,
         "logit_bias": 0.0, "pad_id": 0}))
    (d / "tokenizer.json").write_text(json.dumps(make_clip_style_spec()))


@pytest.fixture(scope="module")
def two_path_dirs(tmp_path_factory):
    """ckpt-converted dir + ONNX-exported dir from the same torch towers."""
    base = tmp_path_factory.mktemp("runbook")
    torch.manual_seed(0)
    vt = VisionTransformer(IMG, PATCH, W, LAYERS, HEADS, MLP, EMBED).eval()
    tt = TextTransformer(CTX, 512, W, HEADS, LAYERS, MLP, EMBED).eval()
    for m in (vt, tt):
        with torch.no_grad():
            for _, p in m.named_parameters():
                if p.abs().sum() == 0 or (p == p.flatten()[0]).all():
                    p.add_(0.02 * torch.randn_like(p))

    ckpt_dir = base / "ckpt-dir"
    ckpt_dir.mkdir()
    _write_configs(ckpt_dir)
    sd = {f"visual.{k}": v.numpy() for k, v in vt.state_dict().items()}
    sd.update({k: v.numpy() for k, v in tt.state_dict().items()})
    import pull_weights

    pull_weights.convert_checkpoint(ckpt_dir, sd)

    onnx_dir = base / "onnx-dir"
    onnx_dir.mkdir()
    _write_configs(onnx_dir)

    class _N(nn.Module):
        def __init__(self, t):
            super().__init__()
            self.t = t

        def forward(self, x):
            return F.normalize(self.t(x), dim=-1)

    export(_N(vt), torch.randn(2, 3, IMG, IMG), onnx_dir / "visual.onnx",
           input_name="pixel_values", output_name="image_embeds")
    export(_N(tt), torch.randint(0, 512, (2, CTX)), onnx_dir / "text.onnx",
           input_name="input_ids", output_name="text_embeds")
    return ckpt_dir, onnx_dir


def test_validate_model_two_paths(two_path_dirs, monkeypatch):
    ckpt_dir, onnx_dir = two_path_dirs
    import pull_weights

    from clip_embedder_tpu import model_manager

    monkeypatch.setattr(pull_weights, "run_pull",
                        lambda mid, out: ckpt_dir)
    monkeypatch.setattr(model_manager, "get_hf_model",
                        lambda repo, **kw: onnx_dir)
    monkeypatch.setitem(vrm.ONNX_DIRS, "fake/model", "fake/model-ONNX")

    row = vrm.validate_model("fake/model", ckpt_dir.parent, None)
    assert row.ckpt == "ok", row.notes
    assert row.onnx == "ok", row.notes
    assert row.family == "vit"
    # two independently-converted routes over the same weights agree
    assert ">" not in row.parity and row.parity != "FAIL", row.parity
    assert float(row.parity) <= vrm.PARITY_BUDGET
    assert row.classify == "-"  # no cat image supplied
    assert row.ok


def test_validate_model_tallies_failure(monkeypatch, tmp_path):
    import pull_weights

    def boom(mid, out):
        raise RuntimeError("offline")

    monkeypatch.setattr(pull_weights, "run_pull", boom)
    row = vrm.validate_model("fake/other", tmp_path, None)
    assert row.ckpt == "FAIL" and not row.ok
    assert any("offline" in n for n in row.notes)


def test_write_report(two_path_dirs, tmp_path, monkeypatch):
    ckpt_dir, onnx_dir = two_path_dirs
    import pull_weights

    from clip_embedder_tpu import model_manager

    monkeypatch.setattr(pull_weights, "run_pull", lambda mid, out: ckpt_dir)
    monkeypatch.setattr(model_manager, "get_hf_model",
                        lambda repo, **kw: onnx_dir)
    monkeypatch.setitem(vrm.ONNX_DIRS, "fake/model", "fake/model-ONNX")
    rows = [vrm.validate_model("fake/model", tmp_path, None)]
    report = tmp_path / "VALIDATION_RESULTS.md"
    vrm.write_report(rows, report)
    text = report.read_text()
    assert "| fake/model | ok | ok | vit |" in text
    assert "integration_test.rs" in text


def test_cat_gate_semantics(two_path_dirs):
    """The gate is the reference's literal assertion: top-1 must be the cat
    label with p>0.99 — a synthetic random image must NOT pass."""
    ckpt_dir, _ = two_path_dirs
    from clip_embedder_tpu import Clip

    clip = Clip.from_local_dir(ckpt_dir)
    rng = np.random.default_rng(0)
    ok, detail = vrm.cat_gate(
        clip, rng.integers(0, 255, (64, 64, 3), dtype=np.uint8))
    assert isinstance(ok, bool) and "@" in detail
