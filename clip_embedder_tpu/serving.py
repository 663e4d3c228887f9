"""Serving helpers: warmup (ahead-of-time compile of the shape buckets a
deployment will hit) and a ready-check.

Batch shapes are bucketed (powers of two; source sizes to 128-multiples), so
a deployment compiles a small, enumerable set of programs. ``warmup``
compiles them before traffic arrives — on this class of TPU runtime a cold
compile can take minutes, a warm one milliseconds (the persistent
compilation cache in utils.compilation_cache makes warmup survive process
restarts too).
"""

from __future__ import annotations

from typing import Iterable

import numpy as np

from .utils.logging import get_logger, timed


def warmup(
    clip_or_embedder,
    *,
    batch_sizes: Iterable[int] = (1, 8, 32),
    image_sizes: Iterable[tuple[int, int]] = ((512, 512),),
    texts: bool = True,
) -> None:
    """Compile the embed programs for the given batch buckets.

    Accepts a ``Clip`` or a single embedder. ``image_sizes`` are *source*
    sizes (pre-resize); each distinct padded bucket compiles once.
    """
    logger = get_logger()
    vision = getattr(clip_or_embedder, "vision", None)
    text = getattr(clip_or_embedder, "text", None)
    if vision is None and hasattr(clip_or_embedder, "embed_images"):
        vision = clip_or_embedder
    if text is None and hasattr(clip_or_embedder, "embed_texts"):
        text = clip_or_embedder

    rng = np.random.default_rng(0)
    for batch in batch_sizes:
        if vision is not None:
            for h, w in image_sizes:
                with timed(f"warmup vision batch={batch} src={h}x{w}", logger):
                    imgs = [
                        rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
                        for _ in range(batch)
                    ]
                    vision.embed_images(imgs)
        if text is not None and texts:
            with timed(f"warmup text batch={batch}", logger):
                text.embed_texts(["warmup"] * batch)
