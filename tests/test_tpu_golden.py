"""Real-TPU whole-tower goldens (VERDICT r4 next #6).

Both TPU-only bugs so far — the Mosaic erf lowering gap and the resize
einsum precision — were WHOLE-PATH issues the kernel A/B tier nearly
missed. This tier runs each committed golden fixture dir end-to-end
(Clip.from_local_dir → decode → preprocess → tower → classify) ON THE
CHIP in the production configuration (bf16 + the auto-selected Pallas
attention) and pins the result against the stored CPU-f32 goldens:

    CLIP_TPU_TESTS=1 python -m pytest tests/ -m tpu -q

Tolerances are bf16-production ones (the fixtures were generated on the
f32 CPU backend): embedding cosine > 1-2e-3 per tower, top-1 label
stable wherever the golden margin is non-marginal. One fixture also runs
the full int8_all quantized path, exercising the fused int8 Pallas
kernels through the PUBLIC api on the chip. Never run this tier
concurrently with another TPU job (CLAUDE.md: the chip is shared).
"""

import json
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(
        jax.default_backend() != "tpu",
        reason="real-TPU tier (set CLIP_TPU_TESTS=1 and run -m tpu)",
    ),
]

FIXTURES_ROOT = Path(__file__).parent / "fixtures"
GOLDEN_DIRS = sorted(
    p.name for p in FIXTURES_ROOT.iterdir()
    if (p / "golden_outputs.npz").exists()
)


def _cos(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return (a * b).sum(-1) / (
        np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1))


@pytest.mark.parametrize("name", GOLDEN_DIRS)
def test_golden_family_on_chip_bf16(name):
    from clip_embedder_tpu import Clip

    fixture = FIXTURES_ROOT / name
    clip = Clip.from_local_dir(fixture, dtype=jnp.bfloat16)
    img = np.load(fixture / "golden_image.npy")
    golden = np.load(fixture / "golden_outputs.npz")

    img_emb = clip.vision.embed_image(img)
    assert _cos(img_emb, golden["image_embedding"]).min() > 1 - 2e-3

    txt_emb = clip.text.embed_texts(["a photo of a cat", "the dog!"])
    assert _cos(txt_emb, golden["text_embeddings"]).min() > 1 - 2e-3

    # classification order, where the stored margin isn't bf16-marginal
    ranked = json.loads((fixture / "golden_classify.json").read_text())
    results = clip.classify(img, [label for label, _ in ranked])
    probs = dict(results)
    for (la, pa), (lb, pb) in zip(ranked[:-1], ranked[1:]):
        if pa - pb > 0.05:
            assert probs[la] > probs[lb], (name, results, ranked)


def test_golden_int8_all_on_chip():
    """The throughput configuration end-to-end through the public API on
    the chip: fused int8 MLP + ln_qkv + out-proj kernels, bf16 packed
    attention, on the classic-CLIP golden fixture."""
    from clip_embedder_tpu import Clip

    fixture = FIXTURES_ROOT / "golden_model"
    clip = Clip.from_local_dir(fixture, dtype=jnp.bfloat16,
                               quantize="int8_all", attn_impl="pallas_fast")
    img = np.load(fixture / "golden_image.npy")
    golden = np.load(fixture / "golden_outputs.npz")
    img_emb = clip.vision.embed_image(img)
    assert _cos(img_emb, golden["image_embedding"]).min() > 1 - 5e-3
    txt_emb = clip.text.embed_texts(["a photo of a cat", "the dog!"])
    assert _cos(txt_emb, golden["text_embeddings"]).min() > 1 - 5e-3
