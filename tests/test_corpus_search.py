"""Sharded corpus search ≡ dense numpy top-k, on the 8-device mesh.

CorpusIndex keeps the corpus row-sharded over the data axis and merges
per-device top-k candidate sets with one all_gather; these tests prove the
result is exactly the dense argsort answer, including the padded-tail,
k > shard-size, TP-mesh, and incremental-add cases.
"""

import numpy as np
import pytest

from clip_embedder_tpu.errors import InferenceError
from clip_embedder_tpu.parallel import CorpusIndex, get_mesh


def _unit_rows(rng, n, d):
    x = rng.standard_normal((n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def _dense_topk(corpus, queries, k):
    scores = queries @ corpus.T
    idx = np.argsort(-scores, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(scores, idx, axis=1), idx


@pytest.mark.parametrize("n,q,k", [(100, 5, 10), (16, 3, 16), (9, 2, 4)])
def test_search_matches_dense(n, q, k):
    """n=100 exercises the padded tail (100 % 8 != 0); n=16 exercises
    k > per-device shard size (shard=2, k=16); n=9 a near-empty shard."""
    mesh = get_mesh()
    rng = np.random.default_rng(0)
    corpus = _unit_rows(rng, n, 32)
    queries = _unit_rows(rng, q, 32)

    index = CorpusIndex.build(corpus, mesh)
    assert len(index) == n
    vals, idx = index.search(queries, k)
    dvals, didx = _dense_topk(corpus, queries, k)
    np.testing.assert_allclose(vals, dvals, rtol=1e-5, atol=1e-6)
    # ties (none expected with random unit rows, but be safe): compare by
    # score of the chosen ids, not the ids themselves
    np.testing.assert_allclose(
        np.take_along_axis(queries @ corpus.T, idx, axis=1), dvals,
        rtol=1e-5, atol=1e-6)


def test_search_single_vector_and_tp_mesh():
    mesh = get_mesh(model_parallel=2)
    rng = np.random.default_rng(1)
    corpus = _unit_rows(rng, 40, 16)
    qv = _unit_rows(rng, 1, 16)[0]

    index = CorpusIndex.build(corpus, mesh)
    vals, idx = index.search(qv, 3)
    assert vals.shape == (3,) and idx.shape == (3,)
    dvals, didx = _dense_topk(corpus, qv[None, :], 3)
    np.testing.assert_allclose(vals, dvals[0], rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(idx, didx[0])


def test_incremental_add_keeps_insertion_ids():
    mesh = get_mesh()
    rng = np.random.default_rng(2)
    a = _unit_rows(rng, 10, 8)
    b = _unit_rows(rng, 7, 8)
    index = CorpusIndex(mesh, 8)
    index.add(a)
    index.add(b)
    assert len(index) == 17
    full = np.concatenate([a, b])
    q = _unit_rows(rng, 2, 8)
    vals, idx = index.search(q, 17)
    dvals, didx = _dense_topk(full, q, 17)
    np.testing.assert_allclose(vals, dvals, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(idx, didx)


def test_search_errors():
    mesh = get_mesh()
    index = CorpusIndex(mesh, 8)
    with pytest.raises(InferenceError, match="Empty corpus"):
        index.search(np.zeros(8, np.float32), 1)
    index.add(np.eye(8, dtype=np.float32)[:4])
    with pytest.raises(InferenceError, match="k="):
        index.search(np.zeros(8, np.float32), 5)
    with pytest.raises(InferenceError, match="query dim"):
        index.search(np.zeros(4, np.float32), 1)
    with pytest.raises(InferenceError, match="corpus rows"):
        index.add(np.zeros((2, 3), np.float32))


def test_search_texts_through_clip(tmp_path):
    """search_texts = embed queries through Clip.text, then corpus top-k —
    the scaled rank_images. Builds the synthetic model dir of
    test_clip_e2e."""
    import json

    import jax

    from test_clip_e2e import MODEL_CONFIG, OPEN_CLIP_CONFIG
    from test_tokenizer import make_clip_style_spec

    from clip_embedder_tpu import Clip
    from clip_embedder_tpu.config import OpenClipConfig
    from clip_embedder_tpu.models import text_transformer, vit
    from clip_embedder_tpu.models.build import resolve_text, resolve_vision
    from clip_embedder_tpu.weights import save_pytree

    d = tmp_path / "model"
    d.mkdir()
    (d / "open_clip_config.json").write_text(json.dumps(OPEN_CLIP_CONFIG))
    (d / "model_config.json").write_text(json.dumps(MODEL_CONFIG))
    (d / "tokenizer.json").write_text(json.dumps(make_clip_style_spec()))
    cfg = OpenClipConfig.from_dict(OPEN_CLIP_CONFIG)
    save_pytree(d / "visual.npz",
                vit.init(jax.random.key(0), resolve_vision(cfg.model_cfg).cfg))
    save_pytree(d / "text.npz",
                text_transformer.init(jax.random.key(1),
                                      resolve_text(cfg.model_cfg).cfg))

    clip = Clip.from_local_dir(str(d))
    mesh = get_mesh()
    rng = np.random.default_rng(3)
    embed_dim = OPEN_CLIP_CONFIG["model_cfg"]["embed_dim"]
    corpus = _unit_rows(rng, 24, embed_dim)
    index = CorpusIndex.build(corpus, mesh)
    vals, idx = index.search_texts(clip, ["a cat", "a dog"], 5)
    assert vals.shape == (2, 5) and idx.shape == (2, 5)
    embs = clip.text.embed_texts(["a cat", "a dog"])
    dvals, _ = _dense_topk(corpus, np.asarray(embs, np.float32), 5)
    np.testing.assert_allclose(vals, dvals, rtol=1e-4, atol=1e-5)


def test_search_shapes_bucket_to_bounded_program_set():
    """Varying Q and k must reuse compiled programs via power-of-two
    bucketing (CLAUDE.md invariant: cold compiles can stall minutes on the
    real runtime), and corpus growth compiles O(log N) layouts."""
    from clip_embedder_tpu.parallel.search import _sharded_topk

    rng = np.random.default_rng(3)
    mesh = get_mesh()
    index = CorpusIndex.build(_unit_rows(rng, 200, 32), mesh)

    qs = _unit_rows(rng, 7, 32)
    base = _sharded_topk._cache_size()
    vals, ids = index.search(qs, k=5)  # Q=7->8, k=5->8
    dv, di = _dense_topk(np.asarray(index._corpus)[:200], qs, 5)
    np.testing.assert_array_equal(ids, di)
    np.testing.assert_allclose(vals, dv, rtol=0, atol=1e-5)
    grew = _sharded_topk._cache_size() - base
    assert grew <= 1

    # same buckets, different raw shapes: zero new compiles
    before = _sharded_topk._cache_size()
    index.search(_unit_rows(rng, 5, 32), k=6)   # 5->8, 6->8
    index.search(_unit_rows(rng, 8, 32), k=8)   # exact bucket
    assert _sharded_topk._cache_size() == before

    # adds within the same per-device power-of-two row bucket keep the
    # corpus shape (no restage-triggered recompile)
    shape_before = index._corpus.shape
    index.add(_unit_rows(rng, 10, 32))  # 210 rows -> still 32/dev bucket
    assert index._corpus.shape == shape_before
