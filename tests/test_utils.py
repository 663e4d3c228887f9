"""Utility-layer tests: logging/trace helpers and image input conversion."""

import logging
import numpy as np
import pytest

from clip_embedder_tpu.utils.images import to_rgb_array
from clip_embedder_tpu.utils.logging import get_logger, timed, trace
from clip_embedder_tpu.errors import ImageError


def test_to_rgb_array_variants(tmp_path):
    rng = np.random.default_rng(0)
    u8 = rng.integers(0, 255, (10, 12, 3), dtype=np.uint8)
    np.testing.assert_array_equal(to_rgb_array(u8), u8)

    # RGBA drops alpha; grayscale stacks; float 0-1 scales
    rgba = np.concatenate([u8, np.full((10, 12, 1), 255, np.uint8)], axis=-1)
    np.testing.assert_array_equal(to_rgb_array(rgba), u8)
    gray = u8[..., 0]
    assert to_rgb_array(gray).shape == (10, 12, 3)
    f01 = u8.astype(np.float32) / 255.0
    np.testing.assert_allclose(to_rgb_array(f01), u8, atol=1)
    f255 = u8.astype(np.float32) + 0.4  # max > 1 → treated as 0-255
    assert np.abs(to_rgb_array(f255).astype(int) - u8.astype(int)).max() <= 1

    # PIL round trip through a real PNG
    PIL = pytest.importorskip("PIL")
    from PIL import Image

    p = tmp_path / "img.png"
    Image.fromarray(u8).save(p)
    np.testing.assert_array_equal(to_rgb_array(str(p)), u8)
    np.testing.assert_array_equal(to_rgb_array(p.read_bytes()), u8)

    with pytest.raises(ImageError):
        to_rgb_array(object())


def test_bad_array_shape():
    with pytest.raises(ImageError):
        to_rgb_array(np.zeros((2, 2, 7), dtype=np.uint8))


def test_timed_logs(caplog):
    logger = get_logger("clip_test_logger")
    logger.setLevel(logging.INFO)
    with caplog.at_level(logging.INFO, logger="clip_test_logger"):
        with timed("unit-test-block", logger):
            pass
    assert any("unit-test-block" in r.message for r in caplog.records)


def test_trace_writes_profile(tmp_path):
    import jax
    import jax.numpy as jnp

    with trace(str(tmp_path / "tr")):
        jax.block_until_ready(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
    files = list((tmp_path / "tr").rglob("*"))
    assert files, "profiler trace produced no files"
