"""Example scripts run end-to-end as subprocesses over the golden fixture
dir (the reference's examples are exercised by CI builds; ours actually
execute — reference: examples/*.rs)."""

import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).parent.parent
FIXTURE = REPO / "tests" / "fixtures" / "golden_model"

ENV = {
    **os.environ,
    "JAX_PLATFORMS": "cpu",
    "CLIP_TPU_LOG": "info",
}


def run_example(script: str, *args: str) -> subprocess.CompletedProcess:
    # examples force their own sys.path; run with CPU backend via env +
    # the conftest trick is unavailable, so pass a sitecustomize-free env
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu'); "
        f"import runpy, sys; sys.argv = [{script!r}, *{list(args)!r}]; "
        f"runpy.run_path({str(REPO / 'examples' / script)!r}, run_name='__main__')"
    )
    return subprocess.run(
        [sys.executable, "-c", code], env=ENV, capture_output=True,
        text=True, timeout=300, cwd=REPO,
    )


@pytest.fixture(scope="module")
def image_file(tmp_path_factory):
    PIL = pytest.importorskip("PIL")
    from PIL import Image

    d = tmp_path_factory.mktemp("imgs")
    img = np.load(FIXTURE / "golden_image.npy")
    path = d / "img.png"
    Image.fromarray(img).save(path)
    return path


def test_basic_example(image_file):
    proc = run_example("basic.py", str(FIXTURE), str(image_file),
                       "a photo of a cat", "a photo of a dog")
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "a photo of a cat" in proc.stdout
    assert "%" in proc.stdout


def test_text_only_example():
    proc = run_example("text_only.py", str(FIXTURE), "a cat", "a dog")
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dim=32" in proc.stdout


def test_vision_only_example(image_file):
    proc = run_example("vision_only.py", str(FIXTURE), str(image_file))
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dim=32" in proc.stdout


def test_debug_local_example(image_file, tmp_path):
    proc = run_example("debug_local.py", str(FIXTURE), str(image_file),
                       "a photo of a cat")
    assert proc.returncode == 0, proc.stderr[-2000:]
    for marker in ("tokenization", "preprocessing", "embeddings",
                   "raw dot product"):
        assert marker in proc.stdout
    (REPO / "debug_preprocessed.png").unlink(missing_ok=True)


def test_search_example(image_file, tmp_path):
    # a directory of two images
    import shutil

    d = tmp_path / "gallery"
    d.mkdir()
    shutil.copy(image_file, d / "a.png")
    shutil.copy(image_file, d / "b.png")
    proc = run_example("search.py", str(FIXTURE), str(d), "a photo of a cat")
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "a.png" in proc.stdout and "b.png" in proc.stdout


def test_search_example_over_committed_assets():
    """The out-of-the-box demo story: rank the committed assets/img corpus
    (the reference ships 8 demo photos for examples/search.rs:26-58)."""
    assets = REPO / "assets" / "img"
    images = [p for p in assets.iterdir()
              if p.suffix.lower() in (".jpg", ".jpeg", ".png", ".webp")]
    assert len(images) >= 8, "demo corpus shrank"
    proc = run_example("search.py", str(FIXTURE), str(assets),
                       "a starry night sky")
    assert proc.returncode == 0, proc.stderr[-2000:]
    for p in images:
        assert p.name in proc.stdout


def test_serve_example(image_file):
    """examples/serve.py end-to-end: concurrent HTTP callers through the
    MicroBatcher-backed service get correct, unit-norm embeddings."""
    import threading
    import urllib.request

    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu'); "
        f"import runpy, sys; sys.argv = ['serve.py', {str(FIXTURE)!r}, '0']; "
        f"runpy.run_path({str(REPO / 'examples' / 'serve.py')!r}, "
        "run_name='__main__')"
    )
    proc = subprocess.Popen(
        [sys.executable, "-c", code], env=ENV, stdout=subprocess.PIPE,
        stderr=subprocess.PIPE, text=True, cwd=REPO)
    try:
        # load + warmup happen before the banner; generous CI allowance
        banner = [None]
        reader = threading.Thread(
            target=lambda: banner.__setitem__(0, proc.stdout.readline()),
            daemon=True)
        reader.start()
        reader.join(timeout=240)
        assert banner[0] and banner[0].startswith("serving on "), (
            banner[0], proc.stderr if proc.poll() is not None else "")
        base = "http://" + banner[0].split()[-1].strip()

        def post(path, data):
            req = urllib.request.Request(base + path, data=data,
                                         method="POST")
            with urllib.request.urlopen(req, timeout=120) as resp:
                return resp.status, json.loads(resp.read())

        img_bytes = Path(image_file).read_bytes()
        results = [None] * 6

        def caller(i):
            if i % 2 == 0:
                results[i] = post("/v1/embed/image", img_bytes)
            else:
                results[i] = post(
                    "/v1/embed/text",
                    json.dumps({"texts": "a photo of a cat"}).encode())

        threads = [threading.Thread(target=caller, args=(i,))
                   for i in range(6)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=180)

        for i, r in enumerate(results):
            assert r is not None, f"caller {i} hung"
            status, obj = r
            assert status == 200
            emb = np.asarray(obj["embeddings"][0])
            assert emb.shape[0] == 32
            np.testing.assert_allclose(np.linalg.norm(emb), 1.0, atol=1e-3)
        # identical inputs -> identical rows, regardless of window packing
        img_embs = [np.asarray(r[1]["embeddings"][0]) for r in results[::2]]
        for e in img_embs[1:]:
            np.testing.assert_allclose(e, img_embs[0], atol=1e-4)

        with urllib.request.urlopen(base + "/healthz", timeout=30) as resp:
            assert json.loads(resp.read())["status"] == "ok"

        # malformed image -> 400 with a ClipError name, service stays up
        req = urllib.request.Request(base + "/v1/embed/image",
                                     data=b"not an image", method="POST")
        try:
            urllib.request.urlopen(req, timeout=120)
            raise AssertionError("expected HTTP 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
            assert json.loads(e.read())["error"] == "ImageError"
        status, _ = post("/v1/embed/text",
                         json.dumps({"texts": "still alive"}).encode())
        assert status == 200
    finally:
        proc.terminate()
        try:
            proc.wait(timeout=30)
        except subprocess.TimeoutExpired:
            proc.kill()
