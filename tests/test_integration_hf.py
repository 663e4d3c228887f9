"""The reference's integration test, ported (reference:
tests/integration_test.rs:10-36): download MobileCLIP2-S2 from HF, classify
the cat image against three labels, assert top-1 is the cat with p>0.99 and
the runner-up <0.1.

Network-dependent — skipped automatically in the zero-egress CI environment
(set CLIP_TPU_HF_TESTS=1 with network access to run).
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("CLIP_TPU_HF_TESTS"),
    reason="network-dependent; set CLIP_TPU_HF_TESTS=1 to enable",
)

MODEL_ID = "RuteNL/MobileCLIP2-S2-OpenCLIP-ONNX"
LABELS = ["A photo of a cat", "A photo of a dog", "A photo of a beignet"]


def make_cat_image():
    """A synthetic stand-in if the reference cat asset is unavailable;
    with the real model use a real cat photo for the strict thresholds."""
    from PIL import Image

    path = os.environ.get("CLIP_TPU_CAT_IMAGE")
    if path:
        return Image.open(path)
    pytest.skip("CLIP_TPU_CAT_IMAGE not set (need a real cat photo)")


def test_classify_cat():
    from clip_embedder_tpu import Clip

    clip = Clip.from_hf(MODEL_ID)
    img = make_cat_image()
    results = clip.classify(img, LABELS)

    assert results[0][0] == "A photo of a cat"
    assert results[0][1] > 0.99
    assert results[1][1] < 0.1
