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


def test_thread_sanitizer_clean():
    """Race detection for the native lib (SURVEY.md §5: the reference has
    no sanitizer coverage; we gate the threaded C++ path under TSan).
    Runs the multithreaded preprocess in a subprocess with libtsan
    preloaded; any data-race report fails via TSAN_OPTIONS exitcode."""
    import subprocess
    import sys
    from pathlib import Path

    tsan_lib = Path(__file__).parent.parent / "native" / "libclippre_tsan.so"
    preload = Path("/lib/x86_64-linux-gnu/libtsan.so.2")
    if not tsan_lib.is_file() or not preload.is_file():
        pytest.skip("TSan build not present (make -C native tsan)")

    code = f"""
import ctypes, numpy as np
lib = ctypes.CDLL({str(tsan_lib)!r})
lib.clip_preprocess_batch.restype = None
rng = np.random.default_rng(0)
arrays = [np.ascontiguousarray(rng.integers(0,255,(50+i,60,3),dtype=np.uint8)) for i in range(16)]
out = np.empty((16,3,32,32), np.float32)
srcs = (ctypes.POINTER(ctypes.c_uint8)*16)(*[a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)) for a in arrays])
hs = (ctypes.c_int*16)(*[a.shape[0] for a in arrays]); ws = (ctypes.c_int*16)(*[a.shape[1] for a in arrays])
mean = np.asarray([.5,.5,.5], np.float32); std = np.asarray([.3,.3,.3], np.float32)
for _ in range(3):
    lib.clip_preprocess_batch(srcs, hs, ws, 16, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), 32,
        mean.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), std.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        0, 0, 1, 4)
print("ok")
"""
    env = {"LD_PRELOAD": str(preload), "TSAN_OPTIONS": "exitcode=66",
           "PATH": "/usr/bin:/bin"}
    proc = subprocess.run([sys.executable, "-c", code], env=env,
                          capture_output=True, text=True, timeout=120)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "ok" in proc.stdout


def test_native_jpeg_decode_matches_pillow():
    """native/decode.cc must be BIT-IDENTICAL to Pillow on JPEG decode
    (both wrap libjpeg-turbo with default IDCT) — the precondition for
    making it the default fast path in utils.images.to_rgb_array."""
    import io

    from PIL import Image

    rng = np.random.default_rng(3)
    for shape, quality in (((37, 53), 92), ((128, 96), 75), ((1, 1), 95)):
        img = Image.fromarray(
            rng.integers(0, 255, (*shape, 3), np.uint8))
        buf = io.BytesIO()
        img.save(buf, "JPEG", quality=quality)
        data = buf.getvalue()
        ours = native.decode_jpeg(data)
        theirs = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
        np.testing.assert_array_equal(ours, theirs)


def test_native_jpeg_decode_rejects_garbage():
    from clip_embedder_tpu.errors import ImageError

    with pytest.raises(ImageError):
        native.decode_jpeg(b"\xff\xd8not actually a jpeg")


def test_to_rgb_array_uses_native_and_falls_back(monkeypatch, tmp_path):
    """to_rgb_array routes JPEG bytes through the native decoder and falls
    back to Pillow (same result, canonical errors) when it is disabled."""
    import io

    from PIL import Image

    from clip_embedder_tpu.utils.images import to_rgb_array

    rng = np.random.default_rng(4)
    img = Image.fromarray(rng.integers(0, 255, (24, 31, 3), np.uint8))
    buf = io.BytesIO()
    img.save(buf, "JPEG", quality=90)
    data = buf.getvalue()

    fast = to_rgb_array(data)
    monkeypatch.setenv("CLIP_TPU_NO_NATIVE_DECODE", "1")
    slow = to_rgb_array(data)
    np.testing.assert_array_equal(fast, slow)

    # PNG bytes (non-JPEG magic) always take the Pillow path
    monkeypatch.delenv("CLIP_TPU_NO_NATIVE_DECODE")
    buf = io.BytesIO()
    img.save(buf, "PNG")
    png = to_rgb_array(buf.getvalue())
    np.testing.assert_array_equal(png, np.asarray(img))


def test_native_jpeg_decode_bomb_guard():
    """Header dims are attacker-controlled: a few-KB JPEG declaring huge
    dimensions must not allocate h*w*3 bytes — the native path mirrors
    Pillow's MAX_IMAGE_PIXELS decompression-bomb policy (ImageError → the
    caller falls back to Pillow, which raises its canonical error)."""
    import io

    from PIL import Image

    from clip_embedder_tpu.errors import ImageError

    img = Image.fromarray(np.zeros((16, 16, 3), np.uint8))
    buf = io.BytesIO()
    img.save(buf, "JPEG", quality=90)
    data = bytearray(buf.getvalue())
    sof = data.find(b"\xff\xc0")
    assert sof > 0
    # SOF0: marker(2) length(2) precision(1) height(2) width(2)
    data[sof + 5:sof + 9] = (65500).to_bytes(2, "big") * 2
    with pytest.raises(ImageError, match="decompression-bomb"):
        native.decode_jpeg(bytes(data))
