"""Preprocessing parity: the on-device matmul-resize vs Pillow.

The reference resizes with fast_image_resize's CatmullRom convolution and
accepts small deviations from Pillow (reference: README.md:201-203 admits
fir "has slightly more differences than image compared to PIL"). Our
convolution-resize weight matrices implement the same Pillow precompute
math in float, so they match PIL's float-mode ('F') resize exactly (the u8
path differs only by PIL's intermediate quantization/clamping).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from clip_embedder_tpu.ops.preprocess import (
    Preprocessor,
    preprocess_weights_for,
    resize_weights,
    shortest_crop_box,
)

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402


def pil_resize(arr, target, interpolation, box=None):
    """Per-channel float-mode PIL resize: the exact convolution math with no
    intermediate u8 quantization/clamping (PIL's u8 path rounds and clamps
    between the separable passes; our device path stays float throughout)."""
    resample = {
        "bicubic": Image.BICUBIC,
        "bilinear": Image.BILINEAR,
        "nearest": Image.NEAREST,
    }[interpolation]
    chans = []
    for c in range(arr.shape[-1]):
        img = Image.fromarray(arr[..., c].astype(np.float32), mode="F")
        chans.append(np.asarray(img.resize((target, target), resample, box=box)))
    return np.stack(chans, axis=-1)


@pytest.mark.parametrize("interpolation", ["bicubic", "bilinear"])
@pytest.mark.parametrize(
    "src_hw", [(64, 64), (100, 80), (37, 53), (256, 117)],
)
def test_squash_resize_matches_pil(interpolation, src_hw):
    h, w = src_hw
    rng = np.random.default_rng(0)
    arr = rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)
    target = 48

    wh = resize_weights(target, h, interpolation=interpolation)
    ww = resize_weights(target, w, interpolation=interpolation)
    ours = np.einsum("oh,hwc,pw->opc", wh, arr.astype(np.float64), ww)

    ref = pil_resize(arr, target, interpolation).astype(np.float64)
    # float-mode PIL is the exact same math; tolerance is float32 rounding.
    assert np.abs(ours - ref).max() <= 2e-3


@pytest.mark.parametrize(
    "src_hw", [(100, 80), (80, 100), (65, 65), (333, 501)],
)
def test_shortest_crop_resize_matches_pil(src_hw):
    """"shortest" mode = centered min-side square crop then resize
    (reference: src/vision.rs:184-192); PIL's box= argument replicates the
    fractional crop exactly."""
    h, w = src_hw
    rng = np.random.default_rng(1)
    arr = rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)
    target = 56

    wh, ww = preprocess_weights_for(w, h, target, interpolation="bicubic",
                                    resize_mode="shortest")
    ours = np.einsum("oh,hwc,pw->opc", wh, arr.astype(np.float64), ww)

    cx, cy, side = shortest_crop_box(w, h)
    ref = pil_resize(arr, target, "bicubic",
                     box=(cx, cy, cx + side, cy + side)).astype(np.float64)
    assert np.abs(ours - ref).max() <= 2e-3


def test_weight_rows_sum_to_one():
    for out_size, in_size in [(48, 100), (100, 48), (224, 224), (384, 500)]:
        for interp in ("bicubic", "bilinear", "nearest"):
            w = resize_weights(out_size, in_size, interpolation=interp)
            np.testing.assert_allclose(w.sum(axis=1), 1.0, atol=1e-5)


def test_preprocessor_normalization_and_padding():
    mean = (0.5, 0.4, 0.3)
    std = (0.2, 0.25, 0.3)
    pp = Preprocessor(image_size=32, mean=mean, std=std,
                      interpolation="bilinear", resize_mode="shortest")
    rng = np.random.default_rng(2)
    arrs = [rng.integers(0, 255, size=(40, 50, 3), dtype=np.uint8),
            rng.integers(0, 255, size=(70, 33, 3), dtype=np.uint8)]
    out = np.asarray(pp(arrs))  # padded to batch bucket 2
    assert out.shape == (2, 32, 32, 3)

    # channel normalization: invert and compare to a host-side reference
    got = out[0] * np.asarray(std) + np.asarray(mean)
    wh, ww = pp._weights(50, 40, 128, 128)
    padded = np.zeros((128, 128, 3), np.float64)
    padded[:40, :50] = arrs[0] / 255.0
    ref = np.einsum("oh,hwc,pw->opc", wh, padded, ww)
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_padding_does_not_leak_into_result():
    """Bucket zero-padding must not affect the resized image: weights are
    zero beyond the true extent."""
    pp = Preprocessor(image_size=16, mean=(0, 0, 0), std=(1, 1, 1),
                      interpolation="bicubic", resize_mode="shortest")
    rng = np.random.default_rng(3)
    arr = rng.integers(0, 255, size=(60, 45, 3), dtype=np.uint8)
    a = np.asarray(pp([arr]))[0]
    # same image alongside a much larger one → larger padding bucket
    big = rng.integers(0, 255, size=(300, 400, 3), dtype=np.uint8)
    b = np.asarray(pp([arr, big]))[0]
    np.testing.assert_allclose(a, b, atol=1e-4)


def test_random_size_fuzz_vs_pil():
    """30 random (source, crop-mode, filter) combinations vs float-PIL —
    the geometry sweep beyond the hand-picked cases."""
    import random

    rng = np.random.default_rng(9)
    rnd = random.Random(9)
    for _ in range(30):
        h = rnd.randint(8, 300)
        w = rnd.randint(8, 300)
        target = rnd.choice([16, 32, 48, 97])
        interp = rnd.choice(["bicubic", "bilinear"])
        mode = rnd.choice(["shortest", "squash"])
        arr = rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)

        wh, ww = preprocess_weights_for(w, h, target, interpolation=interp,
                                        resize_mode=mode)
        ours = np.einsum("oh,hwc,pw->opc", wh, arr.astype(np.float64), ww)

        if mode == "squash":
            box = None
        else:
            cx, cy, side = shortest_crop_box(w, h)
            box = (cx, cy, cx + side, cy + side)
        ref = pil_resize(arr, target, interp, box=box).astype(np.float64)
        assert np.abs(ours - ref).max() <= 5e-3, (h, w, target, interp, mode)


def test_nchw_layout_matches_nhwc():
    """layout="nchw" (the zero-transpose ViT handoff) must be exactly the
    transposed NHWC output, for both output dtypes."""
    import jax.numpy as jnp

    from clip_embedder_tpu.ops.preprocess import resize_normalize

    rng = np.random.default_rng(3)
    imgs = jnp.asarray(rng.integers(0, 255, size=(2, 40, 56, 3),
                                    dtype=np.uint8))
    wh, ww = preprocess_weights_for(56, 40, 24)
    whb = jnp.broadcast_to(jnp.asarray(wh), (2, 24, 40))
    wwb = jnp.broadcast_to(jnp.asarray(ww), (2, 24, 56))
    mean = jnp.asarray([0.48, 0.45, 0.4], jnp.float32)
    std = jnp.asarray([0.26, 0.26, 0.27], jnp.float32)
    for dt in (jnp.float32, jnp.bfloat16):
        nhwc = resize_normalize(imgs, whb, wwb, mean, std, out_dtype=dt)
        nchw = resize_normalize(imgs, whb, wwb, mean, std, out_dtype=dt,
                                layout="nchw")
        np.testing.assert_array_equal(
            np.asarray(nchw, np.float32),
            np.asarray(nhwc, np.float32).transpose(0, 3, 1, 2))


def test_patchify_channels_first_matches():
    """vit.patchify must produce identical patch rows from either layout."""
    import jax.numpy as jnp

    from clip_embedder_tpu.models.vit import patchify

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 3)), jnp.float32)
    a = patchify(x, 8)
    b = patchify(jnp.transpose(x, (0, 3, 1, 2)), 8, channels_first=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
