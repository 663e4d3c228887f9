"""Cross-round numerical stability: a committed fixture model dir with
pinned golden embeddings (generated once on the f32 CPU backend). Any
refactor that silently shifts tower numerics, preprocessing math, tokenizer
output, or scoring beyond f32-noise level fails here — the bit-stability
net the per-round parity tests can't provide on randomized inputs.
"""

import json
from pathlib import Path

import numpy as np
import pytest

from clip_embedder_tpu import Clip

FIXTURES_ROOT = Path(__file__).parent / "fixtures"
# every committed golden dir: classic CLIP ViT (golden_model) plus one per
# tower family (tools/make_golden_fixtures.py)
GOLDEN_DIRS = sorted(
    p.name for p in FIXTURES_ROOT.iterdir()
    if (p / "golden_outputs.npz").exists()
)


def cosines(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return (a * b).sum(-1) / (
        np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1))


@pytest.mark.parametrize("name", GOLDEN_DIRS)
def test_golden_embeddings_stable(name):
    fixture = FIXTURES_ROOT / name
    clip = Clip.from_local_dir(fixture)
    img = np.load(fixture / "golden_image.npy")
    golden = np.load(fixture / "golden_outputs.npz")

    img_emb = clip.vision.embed_image(img)
    assert cosines(img_emb, golden["image_embedding"]).min() > 1 - 1e-6
    np.testing.assert_allclose(img_emb, golden["image_embedding"], atol=5e-4)

    txt_emb = clip.text.embed_texts(["a photo of a cat", "the dog!"])
    assert cosines(txt_emb, golden["text_embeddings"]).min() > 1 - 1e-6
    np.testing.assert_allclose(txt_emb, golden["text_embeddings"], atol=5e-4)


@pytest.mark.parametrize("name", GOLDEN_DIRS)
def test_golden_classify_stable(name):
    fixture = FIXTURES_ROOT / name
    clip = Clip.from_local_dir(fixture)
    img = np.load(fixture / "golden_image.npy")
    golden = json.loads((fixture / "golden_classify.json").read_text())
    results = clip.classify(img, [label for label, _ in golden])
    assert [r[0] for r in results] == [g[0] for g in golden]
    np.testing.assert_allclose(
        [r[1] for r in results], [g[1] for g in golden], atol=1e-4)


def test_all_family_fixtures_present():
    """The fixture net must cover every vision family plus both text
    families — a missing dir silently weakens cross-round protection."""
    assert {"golden_model", "golden_fastvit", "golden_resnet",
            "golden_convnext", "golden_eva02", "golden_hf_bert",
            "golden_siglip"} <= set(GOLDEN_DIRS)
