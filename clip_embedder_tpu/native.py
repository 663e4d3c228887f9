"""ctypes binding for the native host preprocessing library
(native/libclippre.so — see native/preprocess.cc).

The host-side counterpart of the on-device matmul-resize: same sampling
math, runs multithreaded on CPU without touching the accelerator. Used by
``host_preprocess_batch`` (the reference's rayon+fast_image_resize pipeline
shape, reference: src/vision.rs:120-135) and available standalone. Falls
back gracefully when the library hasn't been built (``available()`` is
False); build with ``make -C native``.
"""

from __future__ import annotations

import ctypes
from functools import lru_cache
from pathlib import Path

import numpy as np

from .errors import ImageError

_FILTERS = {"bicubic": 0, "bilinear": 1, "nearest": 2}
_MODES = {"shortest": 0, "squash": 1}


@lru_cache(maxsize=1)
def _lib():
    path = Path(__file__).parent.parent / "native" / "libclippre.so"
    if not path.is_file():
        return None
    lib = ctypes.CDLL(str(path))
    lib.clip_preprocess_batch.argtypes = [
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.clip_preprocess_batch.restype = None
    # clip_decode_jpeg is newer than clip_preprocess_batch; a libclippre.so
    # built before decode.cc existed must still serve the preprocess path.
    if hasattr(lib, "clip_decode_jpeg"):
        lib.clip_decode_jpeg.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_ulong,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.clip_decode_jpeg.restype = ctypes.c_int
    return lib


def available() -> bool:
    return _lib() is not None


def host_preprocess_batch(
    arrays: list[np.ndarray],
    *,
    image_size: int,
    mean,
    std,
    interpolation: str = "bicubic",
    resize_mode: str = "shortest",
    chw: bool = True,
    n_threads: int = 0,
) -> np.ndarray:
    """u8 [H, W, 3] arrays → normalized f32 batch ([B, 3, S, S] when ``chw``,
    else [B, S, S, 3]) on the host via the native library."""
    lib = _lib()
    if lib is None:
        raise ImageError(
            "native preprocessing library not built (run `make -C native`)"
        )
    if interpolation not in _FILTERS:
        raise ImageError(f"Unsupported interpolation '{interpolation}'")
    batch = len(arrays)
    arrays = [np.ascontiguousarray(a, dtype=np.uint8) for a in arrays]
    for a in arrays:
        if a.ndim != 3 or a.shape[2] != 3:
            raise ImageError(f"Expected [H, W, 3] u8 arrays, got {a.shape}")
        if a.shape[0] == 0 or a.shape[1] == 0:
            raise ImageError(f"Empty image dimension: {a.shape}")

    shape = ((batch, 3, image_size, image_size) if chw
             else (batch, image_size, image_size, 3))
    out = np.empty(shape, dtype=np.float32)
    srcs = (ctypes.POINTER(ctypes.c_uint8) * batch)(
        *[a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)) for a in arrays]
    )
    hs = (ctypes.c_int * batch)(*[a.shape[0] for a in arrays])
    ws = (ctypes.c_int * batch)(*[a.shape[1] for a in arrays])
    mean_arr = np.asarray(mean, dtype=np.float32)
    std_arr = np.asarray(std, dtype=np.float32)

    lib.clip_preprocess_batch(
        srcs, hs, ws, batch,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        image_size,
        mean_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        std_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        _FILTERS[interpolation], _MODES.get(resize_mode, 0),
        1 if chw else 0, n_threads,
    )
    return out


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode JPEG bytes to an RGB u8 [H, W, 3] array via the native
    library (libjpeg; two-phase: header for dims, then decode into a
    caller-owned numpy buffer). ctypes releases the GIL for the call, so
    thread pools scale. Raises ImageError on malformed data or when the
    library isn't built."""
    lib = _lib()
    if lib is None or not hasattr(lib, "clip_decode_jpeg"):
        raise ImageError(
            "native decode library not built (run `make -C native`)")
    buf = np.frombuffer(data, dtype=np.uint8)
    src = buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    w = ctypes.c_int(0)
    h = ctypes.c_int(0)
    rc = lib.clip_decode_jpeg(src, len(data), None,
                              ctypes.byref(w), ctypes.byref(h))
    if rc != 0 or w.value <= 0 or h.value <= 0:
        raise ImageError(f"Image error: JPEG header decode failed (rc={rc})")
    # Decompression-bomb guard: header dims are attacker-controlled (a
    # few-KB JPEG can declare 65500x65500 ≈ 12.8 GB RGB). Mirror Pillow's
    # MAX_IMAGE_PIXELS policy; on exceed the caller falls back to Pillow,
    # which raises its canonical DecompressionBombError/-Warning.
    try:
        from PIL import Image as _PILImage
        max_pixels = _PILImage.MAX_IMAGE_PIXELS
    except Exception:
        max_pixels = 178956970
    if max_pixels is not None and h.value * w.value > max_pixels:
        raise ImageError(
            f"Image error: {h.value}x{w.value} JPEG exceeds the "
            f"{max_pixels}-pixel decompression-bomb limit")
    out = np.empty((h.value, w.value, 3), dtype=np.uint8)
    rc = lib.clip_decode_jpeg(src, len(data),
                              out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                              ctypes.byref(w), ctypes.byref(h))
    if rc != 0:
        raise ImageError(f"Image error: JPEG decode failed (rc={rc})")
    return out
