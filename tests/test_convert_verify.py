"""Load-time self-verification of EVERY structural ONNX conversion
(VERDICT r4 next #1, generalizing the MCT pattern of test_mct.py): after
``_structural_{vit,text,eva02,fastvit,bert}`` recovery,
``onnx_reader.probe_verify`` runs a probe batch through the converted
native tower AND the generic graph executor on the same graph; a mismatch
raises WeightError and the load falls back to the executor — so a
consumption-order misread on a real-world export (another torch version,
onnx-simplifier, a different opset) can never ship silently-wrong
embeddings. This mirrors the reference engine's safety-by-construction:
ORT cannot load wrong weights because the graph IS the weights
(reference: src/onnx.rs:13-29).

Each family gets a sabotage test: corrupt the structural recovery, assert
the embedder lands on the executor family instead of shipping the corrupt
tower.
"""

import json
import shutil
import sys
from pathlib import Path

import numpy as np
import pytest
import torch
from torch import nn

sys.path.insert(0, str(Path(__file__).parent))

# fixtures resolve from their defining modules' namespaces
from test_bert_onnx_dir import bert_onnx_dir  # noqa: E402, F401
from test_onnx_dir_e2e import (  # noqa: E402, F401
    fastvit_onnx_dir,
    onnx_model_dir,
)
from test_onnx_exec import export  # noqa: E402
from test_tokenizer import make_clip_style_spec  # noqa: E402
from torch_ref import TextTransformer  # noqa: E402

from clip_embedder_tpu import onnx_reader  # noqa: E402
from clip_embedder_tpu.errors import WeightError  # noqa: E402


def _flip_largest_2d(tree) -> None:
    """Corrupt a recovered pytree in place: reverse the rows of its largest
    2-D float leaf (projection / embedding table) — a misread of exactly
    the silent kind the probe must catch (every shape stays valid)."""
    best = None

    def walk(node):
        nonlocal best
        items = node.items() if isinstance(node, dict) \
            else enumerate(node) if isinstance(node, (list, tuple)) else ()
        for k, v in items:
            if isinstance(v, np.ndarray) and v.ndim == 2 \
                    and v.dtype.kind == "f":
                if best is None or v.size > best[2].size:
                    best = (node, k, v)
            elif isinstance(v, (dict, list, tuple)):
                walk(v)

    walk(tree)
    assert best is not None, "no 2-D float leaf to corrupt"
    node, k, v = best
    node[k] = np.ascontiguousarray(v[::-1])


def _sabotaged(monkeypatch, func_name: str):
    orig = getattr(onnx_reader, func_name)

    def corrupt(g, cfg):
        params = orig(g, cfg)
        _flip_largest_2d(params)
        return params

    monkeypatch.setattr(onnx_reader, func_name, corrupt)


def _fresh_dir(src: Path, tmp_path: Path, *, drop_keys: tuple = ()) -> Path:
    d = tmp_path / f"sabotage-{src.name}"
    shutil.copytree(src, d)
    for npz in d.glob("*.npz"):
        npz.unlink()
    if drop_keys:
        occ = json.loads((d / "open_clip_config.json").read_text())
        for section, key in drop_keys:
            occ["model_cfg"].get(section, {}).pop(key, None)
        (d / "open_clip_config.json").write_text(json.dumps(occ))
    return d


def test_sabotaged_vit_falls_back_to_executor(onnx_model_dir, tmp_path,
                                              monkeypatch):
    d, _, _, _ = onnx_model_dir
    broken = _fresh_dir(d, tmp_path)
    _sabotaged(monkeypatch, "_structural_vit")
    from clip_embedder_tpu.vision import VisionEmbedder

    emb = VisionEmbedder.from_local_dir(broken, dtype=np.float32)
    assert emb.spec.family == "onnx", (
        "a failed probe_verify must fall back to the executor, got "
        f"'{emb.spec.family}'")
    # and the fallback still serves correct embeddings (the graph's own)
    e = emb.embed_images([np.zeros((32, 32, 3), np.uint8)])
    assert np.isfinite(e).all() and abs(float(np.linalg.norm(e[0])) - 1) < 1e-4


def test_sabotaged_text_transformer_falls_back(onnx_model_dir, tmp_path,
                                               monkeypatch):
    d, _, _, _ = onnx_model_dir
    broken = _fresh_dir(d, tmp_path)
    _sabotaged(monkeypatch, "_structural_text")
    from clip_embedder_tpu.text import TextEmbedder

    emb = TextEmbedder.from_local_dir(broken, dtype=np.float32)
    assert emb.spec.family == "onnx"
    e = emb.embed_texts(["a cat"])
    assert np.isfinite(e).all()


def test_sabotaged_fastvit_falls_back(fastvit_onnx_dir, tmp_path,
                                      monkeypatch):
    d, _, _, _ = fastvit_onnx_dir
    broken = _fresh_dir(d, tmp_path)
    _sabotaged(monkeypatch, "_structural_fastvit")
    from clip_embedder_tpu.vision import VisionEmbedder

    emb = VisionEmbedder.from_local_dir(broken, dtype=np.float32)
    assert emb.spec.family == "onnx"


def test_sabotaged_convnext_falls_back(tmp_path, monkeypatch):
    from test_onnx_dir_e2e import convnext_onnx_dir  # noqa: F811

    # build the fixture contents inline (module fixtures don't cross-call)
    d = convnext_onnx_dir.__wrapped__(_TmpFactory(tmp_path))[0]
    broken = _fresh_dir(d, tmp_path, drop_keys=(("vision_cfg",
                                                 "convnext_cfg"),))
    _sabotaged(monkeypatch, "_structural_convnext")
    from clip_embedder_tpu.vision import VisionEmbedder

    emb = VisionEmbedder.from_local_dir(broken, dtype=np.float32)
    assert emb.spec.family == "onnx"


def test_sabotaged_resnet_falls_back(tmp_path, monkeypatch):
    """Requires the executor's static-If support: ModifiedResNet exports
    carry an If node (torch multi_head_attention_forward), so without it
    probe_verify would have to accept the family unverified."""
    from test_onnx_dir_e2e import resnet_onnx_dir  # noqa: F811

    d = resnet_onnx_dir.__wrapped__(_TmpFactory(tmp_path))[0]
    broken = _fresh_dir(d, tmp_path, drop_keys=(("vision_cfg",
                                                 "resnet_cfg"),))
    # corrupt the c_proj (not the generic largest-2D leaf: with random
    # weights the attnpool's q barely moves the output — softmax is near
    # uniform — so a q flip is a genuinely harmless misread there)
    orig = onnx_reader._structural_resnet

    def corrupt(g, cfg):
        params = orig(g, cfg)
        w = params["attnpool"]["out"]["w"]
        params["attnpool"]["out"]["w"] = np.ascontiguousarray(w[:, ::-1])
        return params

    monkeypatch.setattr(onnx_reader, "_structural_resnet", corrupt)
    from clip_embedder_tpu.vision import VisionEmbedder

    emb = VisionEmbedder.from_local_dir(broken, dtype=np.float32)
    assert emb.spec.family == "onnx"


class _TmpFactory:
    """Minimal tmp_path_factory shim for calling module fixtures inline."""

    def __init__(self, base: Path):
        self._base = base
        self._n = 0

    def mktemp(self, name: str) -> Path:
        self._n += 1
        p = self._base / f"{name}{self._n}"
        p.mkdir(parents=True, exist_ok=True)
        return p


def test_sabotaged_bert_falls_back(bert_onnx_dir, tmp_path, monkeypatch):
    d, _ = bert_onnx_dir
    broken = _fresh_dir(d, tmp_path,
                        drop_keys=(("text_cfg", "hf_config"),))
    _sabotaged(monkeypatch, "_structural_bert")
    from clip_embedder_tpu.text import TextEmbedder

    emb = TextEmbedder.from_local_dir(broken, dtype=np.float32)
    assert emb.spec.family == "onnx"


@pytest.fixture(scope="module")
def eva02_onnx_dir(tmp_path_factory):
    """Miniature EVA02 ONNX dir (the test_eva02.py::test_eva02_from_onnx_dir
    shape), module-scoped for the sabotage case."""
    from test_eva02 import TorchEva02

    IMG, PATCH, W, LAYERS, HEADS, HIDDEN, EMBED = 32, 8, 64, 2, 4, 96, 48
    torch.manual_seed(7)
    mirror = TorchEva02(IMG, PATCH, W, LAYERS, HEADS, HIDDEN, EMBED).eval()
    with torch.no_grad():
        for _, p in mirror.named_parameters():
            if (p == p.flatten()[0]).all():
                p.add_(0.02 * torch.randn_like(p))

    class _V(nn.Module):
        def __init__(self, t):
            super().__init__()
            self.visual = t

        def forward(self, x):
            return self.visual(x)  # mirror already L2-normalizes

    d = tmp_path_factory.mktemp("eva02_onnx") / "mini-EVA02-ONNX"
    d.mkdir()
    export(_V(mirror), torch.randn(2, 3, IMG, IMG), d / "visual.onnx",
           input_name="pixel_values", output_name="image_embeds")
    torch.manual_seed(1)
    tt = TextTransformer(12, 64, W, HEADS, 1, HIDDEN, EMBED).eval()
    with torch.no_grad():
        for _, p in tt.named_parameters():
            if p.abs().sum() == 0 or (p == p.flatten()[0]).all():
                p.add_(0.02 * torch.randn_like(p))

    class _T(nn.Module):
        def __init__(self, t):
            super().__init__()
            self.text = t

        def forward(self, ids):
            return torch.nn.functional.normalize(self.text(ids), dim=-1)

    export(_T(tt), torch.randint(4, 64, (2, 12)), d / "text.onnx",
           input_name="input_ids", output_name="text_embeds")
    occ = {
        "model_cfg": {
            "embed_dim": EMBED,
            "vision_cfg": {
                "image_size": IMG,
                "timm_model_name": f"eva02_base_patch{PATCH}_clip",
            },
            "text_cfg": {"context_length": 12, "vocab_size": 64,
                         "width": W, "heads": HEADS, "layers": 1,
                         "mlp_ratio": HIDDEN / W},
        },
        "preprocess_cfg": {"mean": [0.5] * 3, "std": [0.5] * 3},
    }
    (d / "open_clip_config.json").write_text(json.dumps(occ))
    (d / "model_config.json").write_text(json.dumps(
        {"tokenizer_needs_lowercase": False,
         "activation_function": "softmax", "logit_scale": 100.0,
         "logit_bias": 0.0, "pad_id": 0}))
    (d / "tokenizer.json").write_text(json.dumps(make_clip_style_spec()))
    return d


def test_sabotaged_eva02_falls_back(eva02_onnx_dir, tmp_path, monkeypatch):
    broken = _fresh_dir(eva02_onnx_dir, tmp_path,
                        drop_keys=(("vision_cfg", "eva02_cfg"),))
    _sabotaged(monkeypatch, "_structural_eva02")
    from clip_embedder_tpu.vision import VisionEmbedder

    emb = VisionEmbedder.from_local_dir(broken, dtype=np.float32)
    assert emb.spec.family == "onnx"


def test_unsabotaged_eva02_loads_native(eva02_onnx_dir, tmp_path):
    """Positive control: the same dir WITHOUT sabotage passes probe_verify
    and rides the native tower."""
    clean = _fresh_dir(eva02_onnx_dir, tmp_path,
                       drop_keys=(("vision_cfg", "eva02_cfg"),))
    from clip_embedder_tpu.vision import VisionEmbedder

    emb = VisionEmbedder.from_local_dir(clean, dtype=np.float32)
    assert emb.spec.family == "eva02"


def test_probe_verify_raises_on_corrupt_params(onnx_model_dir):
    """Unit-level: probe_verify itself rejects a corrupt pytree with the
    diagnostic WeightError (the callers' fallback trigger)."""
    d, _, _, _ = onnx_model_dir
    from clip_embedder_tpu.config import OpenClipConfig
    from clip_embedder_tpu.models.build import resolve_vision
    from clip_embedder_tpu.onnx_reader import (
        extract_tower_params,
        probe_verify,
    )

    cfg = OpenClipConfig.from_file(d / "open_clip_config.json")
    spec = resolve_vision(cfg.model_cfg)
    params = extract_tower_params(d / "visual.onnx", spec, tower="visual")
    _flip_largest_2d(params)
    with pytest.raises(WeightError, match="self-check failed"):
        probe_verify(d / "visual.onnx", spec, tower="visual", params=params)


def test_probe_verify_warns_not_rejects_on_unrunnable_graph(
        onnx_model_dir, tmp_path, monkeypatch, caplog):
    """When the executor can't run the graph there is nothing to fall back
    to — the conversion is accepted with a loud warning, never rejected."""
    d, _, _, _ = onnx_model_dir
    from clip_embedder_tpu import onnx_exec
    from clip_embedder_tpu.config import OpenClipConfig
    from clip_embedder_tpu.models.build import resolve_vision
    from clip_embedder_tpu.onnx_reader import (
        extract_tower_params,
        probe_verify,
    )
    from clip_embedder_tpu.utils.logging import _warned_once

    cfg = OpenClipConfig.from_file(d / "open_clip_config.json")
    spec = resolve_vision(cfg.model_cfg)
    params = extract_tower_params(d / "visual.onnx", spec, tower="visual")

    def boom(cfg):
        raise RuntimeError("unsupported op")

    monkeypatch.setattr(onnx_exec, "get_tower", boom)
    _warned_once.clear()
    import logging

    with caplog.at_level(logging.WARNING, logger="clip_embedder_tpu"):
        probe_verify(d / "visual.onnx", spec, tower="visual", params=params)
    assert any("accepting unverified" in r.getMessage()
               for r in caplog.records)
