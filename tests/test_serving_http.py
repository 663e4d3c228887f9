"""HTTP serving surface: ClipServer endpoints against a live loopback
server over a synthetic model dir.

The reference serves by being embedded in a host app (session replicas via
``duplicate()``, reference src/clip.rs:69-73); the TPU deployment story is a
batching service in front of one chip — ClipServer is that surface, riding
MicroBatcher so concurrent single-item callers coalesce into batched device
steps (docs/DEPLOYMENT.md).
"""

import base64
import concurrent.futures as cf
import io
import json
import urllib.error
import urllib.request

import numpy as np
import pytest

from clip_embedder_tpu import Clip
from clip_embedder_tpu.serving import ClipServer

from test_concurrency import make_model_dir


@pytest.fixture(scope="module")
def served():
    clip = Clip.from_local_dir(make_model_dir())
    with ClipServer(clip, max_delay_ms=5.0) as server:
        yield clip, server


def _url(server, path):
    host, port = server.address
    return f"http://{host}:{port}{path}"


def _post(server, path, data, ctype="application/json"):
    if isinstance(data, dict):
        data = json.dumps(data).encode()
    req = urllib.request.Request(
        _url(server, path), data=data, headers={"Content-Type": ctype})
    with urllib.request.urlopen(req, timeout=30) as resp:
        return json.loads(resp.read())


def _jpeg(seed: int) -> bytes:
    from PIL import Image

    rng = np.random.default_rng(seed)
    buf = io.BytesIO()
    Image.fromarray(
        rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)).save(
            buf, format="JPEG")
    return buf.getvalue()


def test_healthz(served):
    _, server = served
    with urllib.request.urlopen(_url(server, "/healthz"), timeout=30) as r:
        assert json.loads(r.read())["status"] == "ok"


def test_embed_image_raw_bytes_matches_direct(served):
    clip, server = served
    jpg = _jpeg(0)
    got = _post(server, "/v1/embed/image", jpg, ctype="image/jpeg")
    np.testing.assert_allclose(
        np.asarray(got["embeddings"][0], np.float32),
        clip.vision.embed_image(jpg), atol=1e-5)


def test_embed_image_json_batch(served):
    clip, server = served
    jpgs = [_jpeg(1), _jpeg(2)]
    got = _post(server, "/v1/embed/image",
                {"images_b64": [base64.b64encode(j).decode() for j in jpgs]})
    np.testing.assert_allclose(
        np.asarray(got["embeddings"], np.float32),
        clip.vision.embed_images(jpgs), atol=1e-5)


def test_embed_text_single_and_batch(served):
    clip, server = served
    got = _post(server, "/v1/embed/text", {"texts": "a photo of a cat"})
    np.testing.assert_allclose(
        np.asarray(got["embeddings"][0], np.float32),
        clip.text.embed_text("a photo of a cat"), atol=1e-5)
    texts = ["a cat", "a dog", "a beignet"]
    got = _post(server, "/v1/embed/text", {"texts": texts})
    np.testing.assert_allclose(
        np.asarray(got["embeddings"], np.float32),
        clip.text.embed_texts(texts), atol=1e-5)


def test_classify_and_rank_parity(served):
    clip, server = served
    jpg = _jpeg(3)
    labels = ["a photo of a cat", "a photo of a dog"]
    got = _post(server, "/v1/classify",
                {"image_b64": base64.b64encode(jpg).decode(),
                 "labels": labels})
    expect = clip.classify(jpg, labels)
    assert [r[0] for r in got["results"]] == [e[0] for e in expect]
    np.testing.assert_allclose([r[1] for r in got["results"]],
                               [e[1] for e in expect], atol=1e-5)

    jpgs = [_jpeg(4), _jpeg(5)]
    got = _post(server, "/v1/rank",
                {"images_b64": [base64.b64encode(j).decode() for j in jpgs],
                 "text": "the cat"})
    expect = clip.rank_images(jpgs, "the cat")
    assert [r[0] for r in got["results"]] == [e[0] for e in expect]


def test_concurrent_singles_coalesce(served):
    clip, server = served
    jpg = _jpeg(6)
    expect = clip.vision.embed_image(jpg)
    before = server._vision_batcher.batches

    def one(_):
        return _post(server, "/v1/embed/image", jpg, ctype="image/jpeg")

    with cf.ThreadPoolExecutor(max_workers=8) as pool:
        results = list(pool.map(one, range(16)))
    for got in results:
        np.testing.assert_allclose(
            np.asarray(got["embeddings"][0], np.float32), expect, atol=1e-5)
    # 16 requests must have shared windows, not run 16 singleton batches
    assert server._vision_batcher.batches - before < 16


@pytest.mark.parametrize(
    "path,payload,ctype,expect_error",
    [
        ("/v1/embed/image", b"not an image", "image/jpeg", "ImageError"),
        ("/v1/embed/image", {"images_b64": []}, "application/json",
         "InferenceError"),
        ("/v1/embed/text", b"{bad json", "application/json",
         "JSONDecodeError"),
        ("/v1/classify", {"labels": ["x"]}, "application/json", "KeyError"),
    ],
)
def test_client_errors_are_400(served, path, payload, ctype, expect_error):
    _, server = served
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(server, path, payload, ctype=ctype)
    assert ei.value.code == 400
    body = json.loads(ei.value.read())
    assert expect_error in body["error"], body


def test_unknown_post_route_is_404(served):
    # wrong URL != malformed request: POST routing matches GET's semantics
    _, server = served
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(server, "/v1/nope", {}, ctype="application/json")
    assert ei.value.code == 404
    assert json.loads(ei.value.read())["error"] == "NotFound"


# ---------------------------------------------------------------------------
# mesh-backed deployment: the same HTTP surface over the sharded embedders
# (the scale-past-one-chip answer to the reference's per-thread duplicate(),
# src/clip.rs:69-73) — every path must agree with the single-device Clip
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def served_mesh():
    from clip_embedder_tpu.parallel.mesh import get_mesh

    clip = Clip.from_local_dir(make_model_dir())
    mesh = get_mesh()  # the 8-virtual-CPU-device test mesh (conftest)
    with ClipServer(clip, max_delay_ms=5.0, mesh=mesh) as server:
        yield clip, server


def test_mesh_server_embeds_match_single_device(served_mesh):
    clip, server = served_mesh
    assert server.mesh is not None
    jpgs = [_jpeg(10), _jpeg(11), _jpeg(12)]
    got = _post(server, "/v1/embed/image",
                {"images_b64": [base64.b64encode(j).decode() for j in jpgs]})
    np.testing.assert_allclose(
        np.asarray(got["embeddings"], np.float32),
        clip.vision.embed_images(jpgs), atol=1e-4)

    texts = ["a cat", "a dog", "a beignet", "x"]
    got = _post(server, "/v1/embed/text", {"texts": texts})
    np.testing.assert_allclose(
        np.asarray(got["embeddings"], np.float32),
        clip.text.embed_texts(texts), atol=1e-4)


def test_mesh_server_classify_and_rank_parity(served_mesh):
    clip, server = served_mesh
    jpg = _jpeg(13)
    labels = ["a photo of a cat", "a photo of a dog"]
    got = _post(server, "/v1/classify",
                {"image_b64": base64.b64encode(jpg).decode(),
                 "labels": labels})
    expect = clip.classify(jpg, labels)
    assert [r[0] for r in got["results"]] == [e[0] for e in expect]
    np.testing.assert_allclose([r[1] for r in got["results"]],
                               [e[1] for e in expect], atol=1e-4)

    jpgs = [_jpeg(14), _jpeg(15)]
    got = _post(server, "/v1/rank",
                {"images_b64": [base64.b64encode(j).decode() for j in jpgs],
                 "text": "the cat"})
    expect = clip.rank_images(jpgs, "the cat")
    assert [r[0] for r in got["results"]] == [e[0] for e in expect]


def test_mesh_server_concurrent_singles_coalesce(served_mesh):
    clip, server = served_mesh
    jpg = _jpeg(16)
    expect = clip.vision.embed_image(jpg)
    before = server._vision_batcher.batches

    def one(_):
        return _post(server, "/v1/embed/image", jpg, ctype="image/jpeg")

    with cf.ThreadPoolExecutor(max_workers=8) as pool:
        results = list(pool.map(one, range(16)))
    for got in results:
        np.testing.assert_allclose(
            np.asarray(got["embeddings"][0], np.float32), expect, atol=1e-4)
    # concurrent singles share sharded device steps, same as single-chip
    assert server._vision_batcher.batches - before < 16


def test_submit_after_close_rejected():
    clip = Clip.from_local_dir(make_model_dir())
    server = ClipServer(clip)
    server.close()
    with pytest.raises(urllib.error.URLError):
        _post(server, "/v1/embed/text", {"texts": "x"})


def test_shutdown_race_maps_clip_errors_to_503(served):
    """A valid request racing graceful shutdown must read as
    server-unavailable (retry), not a 400 client error: daemon handler
    threads can outlive shutdown() and hit already-closed batchers."""
    _, server = served
    server._closing = True  # simulate the close() window, listener still up
    try:
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(server, "/v1/embed/text", {"texts": []},
                  ctype="application/json")
        assert ei.value.code == 503
    finally:
        server._closing = False


def test_metrics_endpoint(served):
    """GET /v1/metrics: per-endpoint request/item counts, latency
    percentiles, error tallies, micro-batch counts (round 5 — the
    observability layer SURVEY §5 notes the reference lacks)."""
    clip, server = served
    _post(server, "/v1/embed/text", {"texts": ["metrics probe"]})
    _post(server, "/v1/embed/image", _jpeg(21), "image/jpeg")
    try:  # one client error to tally
        _post(server, "/v1/embed/text", {"texts": []})
    except Exception:  # noqa: BLE001 — urllib raises on 400
        pass
    with urllib.request.urlopen(_url(server, "/v1/metrics"), timeout=30) as r:
        snap = json.loads(r.read())
    assert snap["requests"]["/v1/embed/text"] >= 1
    assert snap["items"]["/v1/embed/image"] >= 1
    lat = snap["latency"]["/v1/embed/text"]
    assert lat["p50_ms"] > 0 and lat["p95_ms"] >= lat["p50_ms"]
    assert any(k.startswith("/v1/embed/text:") for k in snap["errors"])
    assert snap["micro_batches"]["vision"] >= 1
    assert snap["uptime_s"] >= 0
