"""Documentation code blocks parse AND run — the analog of the reference's
doctested README usage (reference: src/lib.rs:22-119, whose doc examples
execute under cargo test).

Execution strategy: every ```python block runs against the committed golden
fixture model (tests/fixtures/golden_model) in one shared namespace per
document, with the same substitutions a doctest harness would make:
``Clip.from_hf`` resolves to the fixture dir (no network), free variables
the prose implies (``model_dir``, ``images``, ``paths``, ``index``) are
predefined, and the Pallas kernel runs in interpret mode on the CPU test
backend.
"""

import ast
import functools
import re
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).parent.parent
DOCS = [Path("README.md"), Path("docs/DEPLOYMENT.md")]
FIXTURE = Path(__file__).parent / "fixtures" / "golden_model"


def blocks_of(doc: Path) -> list[str]:
    text = (REPO / doc).read_text(encoding="utf-8")
    return re.findall(r"```python\n(.*?)```", text, flags=re.S)


@pytest.mark.parametrize("doc", DOCS, ids=[str(d) for d in DOCS])
def test_python_blocks_parse(doc):
    blocks = blocks_of(doc)
    assert blocks, f"no python blocks found in {doc}"
    for i, block in enumerate(blocks):
        try:
            ast.parse(block)
        except SyntaxError as e:
            raise AssertionError(f"{doc} block {i} does not parse: {e}") from e


@pytest.fixture()
def doc_namespace(tmp_path, monkeypatch):
    import jax.numpy as jnp
    from PIL import Image

    import clip_embedder_tpu
    from clip_embedder_tpu.ops import flash as flash_mod

    # CPU test backend: run the Pallas kernel in interpret mode
    monkeypatch.setattr(
        flash_mod, "flash_attention",
        functools.partial(flash_mod.flash_attention, interpret=True))
    # no network: from_hf resolves to the committed fixture dir
    monkeypatch.setattr(clip_embedder_tpu.Clip, "from_hf",
                        classmethod(lambda cls, model_id, **kw:
                                    cls.from_local_dir(FIXTURE, **kw)))

    rng = np.random.default_rng(0)
    paths = []
    for i in range(3):
        p = tmp_path / f"img{i}.jpg"
        Image.fromarray(
            rng.integers(0, 255, (40, 48, 3), dtype=np.uint8)).save(p)
        paths.append(str(p))

    class _Index:
        def __init__(self):
            self.rows = []

        def add(self, embs):
            self.rows.append(np.asarray(embs))

    images = [np.asarray(Image.open(p)) for p in paths]
    ns = {
        "jnp": jnp,
        "jpeg_bytes": Path(paths[0]).read_bytes(),
        "model_dir": str(FIXTURE),
        "list_of_images": images,
        "images": images,
        "paths": paths,
        "index": _Index(),
        "print": lambda *a, **k: None,  # silence example prints
    }
    ns["__index__"] = ns["index"]
    return ns


@pytest.mark.parametrize("doc", DOCS, ids=[str(d) for d in DOCS])
def test_python_blocks_execute(doc, doc_namespace):
    """Each document's blocks run top-to-bottom in one namespace (later
    blocks legitimately build on earlier ones, e.g. reusing ``clip``)."""
    ns = doc_namespace
    for i, block in enumerate(blocks_of(doc)):
        # the docs illustrate the cat example with "cat.jpg"; use a real jpg
        block = block.replace('"cat.jpg"', "paths[0]")
        try:
            exec(compile(block, f"{doc}#block{i}", "exec"), ns)  # lint: ok
        except Exception as e:
            raise AssertionError(
                f"{doc} block {i} failed to execute: {type(e).__name__}: {e}"
            ) from e
    # the bulk-indexing example must actually have produced embeddings
    if doc.name == "DEPLOYMENT.md":
        rows = np.concatenate(ns["__index__"].rows)
        assert rows.shape[0] >= len(ns["paths"])
        np.testing.assert_allclose(
            np.linalg.norm(rows[: len(ns["paths"])], axis=-1), 1.0,
            atol=1e-2)
