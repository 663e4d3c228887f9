"""Thread-safety: embedders shared across threads without locks.

The reference makes one session usable across user threads via an RwLock
and offers ``duplicate()`` for per-thread replicas (reference:
src/onnx.rs:9, src/clip.rs:69-73). Here embedders are functionally pure
(immutable params + jitted forwards), so concurrent use needs no locks —
this test pins that contract.
"""

import concurrent.futures as cf
import json
import tempfile
from pathlib import Path

import numpy as np

import jax

from clip_embedder_tpu import Clip
from clip_embedder_tpu.config import OpenClipConfig
from clip_embedder_tpu.models import text_transformer, vit
from clip_embedder_tpu.models.build import resolve_text, resolve_vision
from clip_embedder_tpu.weights import save_pytree

from test_clip_e2e import MODEL_CONFIG, OPEN_CLIP_CONFIG
from test_tokenizer import make_clip_style_spec


def make_model_dir() -> Path:
    d = Path(tempfile.mkdtemp())
    (d / "open_clip_config.json").write_text(json.dumps(OPEN_CLIP_CONFIG))
    (d / "model_config.json").write_text(json.dumps(MODEL_CONFIG))
    (d / "tokenizer.json").write_text(json.dumps(make_clip_style_spec()))
    cfg = OpenClipConfig.from_dict(OPEN_CLIP_CONFIG)
    save_pytree(d / "visual.npz",
                vit.init(jax.random.key(0), resolve_vision(cfg.model_cfg).cfg))
    save_pytree(d / "text.npz",
                text_transformer.init(jax.random.key(1),
                                      resolve_text(cfg.model_cfg).cfg))
    return d


def test_concurrent_embedding_is_consistent():
    clip = Clip.from_local_dir(make_model_dir())
    rng = np.random.default_rng(0)
    images = [rng.integers(0, 255, (40, 40, 3), dtype=np.uint8)
              for _ in range(4)]
    texts = [f"a photo of a cat {i}" for i in range(4)]

    expect_img = [clip.vision.embed_image(img) for img in images]
    expect_txt = [clip.text.embed_text(t) for t in texts]

    def img_task(i):
        return "img", i, clip.vision.embed_image(images[i])

    def txt_task(i):
        return "txt", i, clip.text.embed_text(texts[i])

    with cf.ThreadPoolExecutor(max_workers=8) as pool:
        futures = [pool.submit(img_task, i % 4) for i in range(16)]
        futures += [pool.submit(txt_task, i % 4) for i in range(16)]
        for fut in cf.as_completed(futures):
            kind, i, emb = fut.result()
            expect = expect_img[i] if kind == "img" else expect_txt[i]
            np.testing.assert_allclose(emb, expect, atol=1e-5)


def test_duplicate_usable_from_threads():
    clip = Clip.from_local_dir(make_model_dir())
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
    expect = clip.vision.embed_image(img)

    def task():
        return clip.duplicate().vision.embed_image(img)

    with cf.ThreadPoolExecutor(max_workers=4) as pool:
        for fut in [pool.submit(task) for _ in range(8)]:
            np.testing.assert_allclose(fut.result(), expect, atol=1e-5)
