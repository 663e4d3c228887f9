"""Image input handling.

The reference takes ``image::DynamicImage`` values and converts to RGB8
(reference: src/vision.rs:168-169). Here any of {PIL image, numpy array,
path, bytes} is accepted and converted to an RGB uint8 [H, W, 3] array;
JPEG/PNG decode is delegated to Pillow (the host-side decode role the
`image` crate plays in the reference).
"""

from __future__ import annotations

import io
from pathlib import Path
from typing import Any

import numpy as np

from ..errors import ImageError


def _native_decode_jpeg(data: bytes):
    """JPEG bytes → RGB array via native/decode.cc, or None to fall back
    to Pillow (library not built, or malformed data — Pillow then raises
    the canonical ImageError)."""
    import os

    if os.environ.get("CLIP_TPU_NO_NATIVE_DECODE"):
        return None
    try:
        from .. import native

        if not native.available():
            return None
        return native.decode_jpeg(data)
    except ImageError:
        return None


def to_rgb_array(image: Any) -> np.ndarray:
    """Convert any supported image input to an RGB uint8 [H, W, 3] array.

    Float arrays are interpreted by range: values all ≤ 1.0 are treated as
    the standard 0–1 convention and scaled by 255; anything else is treated
    as already 0–255. A float image genuinely in 0–255 scale whose peak
    happens to be ≤ 1.0 (a near-black frame) is indistinguishable from the
    0–1 convention — pass uint8 (or pre-scale) to avoid the ambiguity.
    """
    if isinstance(image, np.ndarray):
        if image.ndim == 2:
            image = np.stack([image] * 3, axis=-1)
        if image.ndim != 3 or image.shape[-1] not in (3, 4):
            raise ImageError(f"Unsupported array shape {image.shape}")
        if image.shape[-1] == 4:
            image = image[..., :3]
        if image.dtype != np.uint8:
            arr = np.asarray(image, dtype=np.float32)
            if arr.max() <= 1.0:
                arr = arr * 255.0
            image = np.clip(arr, 0, 255).astype(np.uint8)
        return np.ascontiguousarray(image)

    if isinstance(image, (str, Path)):
        try:
            data = Path(image).read_bytes()
        except OSError as e:
            raise ImageError(f"Image error: {e}") from e
        return to_rgb_array(bytes(data))

    if isinstance(image, (bytes, bytearray)):
        data = bytes(image)
        if data[:2] == b"\xff\xd8":
            # JPEG: native libjpeg fast path (bit-identical to Pillow —
            # both wrap libjpeg-turbo; proven in test_native.py). The
            # ctypes call releases the GIL, so the EmbedPipeline decode
            # pool scales across cores. Any native failure falls through
            # to Pillow for its (identical) error semantics.
            decoded = _native_decode_jpeg(data)
            if decoded is not None:
                return decoded
        try:
            from PIL import Image

            with Image.open(io.BytesIO(data)) as img:
                return np.asarray(img.convert("RGB"))
        except ImportError as e:
            raise ImageError("Pillow required to decode image bytes") from e
        except OSError as e:
            raise ImageError(f"Image error: {e}") from e

    # PIL image (duck-typed so PIL is optional)
    if hasattr(image, "convert"):
        return np.asarray(image.convert("RGB"))

    raise ImageError(f"Unsupported image input type {type(image)!r}")
