"""Native C++ host preprocessing vs the Python/device weight-matrix math —
same Pillow-convolution semantics, two independent implementations
(reference analog: fast_image_resize vs image crate, README.md:201-203).
"""

import numpy as np
import pytest

from clip_embedder_tpu import native
from clip_embedder_tpu.ops.preprocess import preprocess_weights_for

pytestmark = pytest.mark.skipif(
    not native.available(), reason="libclippre.so not built (make -C native)"
)

MEAN = (0.48145466, 0.4578275, 0.40821073)
STD = (0.26862954, 0.26130258, 0.27577711)


@pytest.mark.parametrize("interp", ["bicubic", "bilinear", "nearest"])
@pytest.mark.parametrize("mode", ["shortest", "squash"])
def test_native_matches_python_weights(interp, mode):
    rng = np.random.default_rng(0)
    arrays = [
        rng.integers(0, 255, size=(57, 101, 3), dtype=np.uint8),
        rng.integers(0, 255, size=(120, 80, 3), dtype=np.uint8),
    ]
    size = 48
    out = native.host_preprocess_batch(
        arrays, image_size=size, mean=MEAN, std=STD,
        interpolation=interp, resize_mode=mode, chw=True,
    )
    assert out.shape == (2, 3, size, size)

    for i, a in enumerate(arrays):
        h, w = a.shape[:2]
        wh, ww = preprocess_weights_for(
            w, h, size, interpolation=interp, resize_mode=mode)
        resized = np.einsum("oh,hwc,pw->opc", wh, a.astype(np.float64), ww)
        ref = (resized / 255.0 - np.asarray(MEAN)) / np.asarray(STD)
        ref = ref.transpose(2, 0, 1).astype(np.float32)
        np.testing.assert_allclose(out[i], ref, atol=1e-4)


def test_native_hwc_layout():
    rng = np.random.default_rng(1)
    a = rng.integers(0, 255, size=(64, 64, 3), dtype=np.uint8)
    chw = native.host_preprocess_batch(
        [a], image_size=32, mean=MEAN, std=STD, chw=True)
    hwc = native.host_preprocess_batch(
        [a], image_size=32, mean=MEAN, std=STD, chw=False)
    np.testing.assert_allclose(chw[0], hwc[0].transpose(2, 0, 1), atol=1e-6)


def test_native_multithreaded_deterministic():
    rng = np.random.default_rng(2)
    arrays = [rng.integers(0, 255, size=(40 + i, 60, 3), dtype=np.uint8)
              for i in range(8)]
    a = native.host_preprocess_batch(
        arrays, image_size=32, mean=MEAN, std=STD, n_threads=1)
    b = native.host_preprocess_batch(
        arrays, image_size=32, mean=MEAN, std=STD, n_threads=4)
    np.testing.assert_array_equal(a, b)
