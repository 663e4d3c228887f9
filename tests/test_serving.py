"""MicroBatcher: the TPU serving analog of the reference's per-thread
session replication (``duplicate()``, reference src/clip.rs:69-73) — on TPU
concurrent callers share the chip through one coalesced batch per window
instead of one session per thread."""

import threading
import time

import numpy as np
import pytest

from clip_embedder_tpu.errors import InferenceError
from clip_embedder_tpu.serving import MicroBatcher


def ident_embed(items):
    """Deterministic stand-in for embed_images/embed_texts: row i encodes
    item i, so cross-caller result mixups are detectable."""
    return np.stack([np.full(4, float(v), np.float32) for v in items])


def test_results_route_to_the_right_caller():
    with MicroBatcher(ident_embed, max_batch=8, max_delay_ms=20) as mb:
        futs = [mb.submit(i) for i in range(20)]
        for i, f in enumerate(futs):
            np.testing.assert_array_equal(f.result(timeout=10),
                                          np.full(4, float(i), np.float32))
    assert mb.items == 20
    assert mb.batches >= 3  # max_batch=8 caps every window


def test_concurrent_callers_coalesce_into_few_batches():
    n = 32
    barrier = threading.Barrier(n)
    results = [None] * n

    with MicroBatcher(ident_embed, max_batch=n, max_delay_ms=150) as mb:
        def caller(i):
            barrier.wait()
            results[i] = mb.embed(i)

        threads = [threading.Thread(target=caller, args=(i,))
                   for i in range(n)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        batches = mb.batches

    for i, r in enumerate(results):
        np.testing.assert_array_equal(r, np.full(4, float(i), np.float32))
    # 32 simultaneous single-item callers must not pay 32 device steps.
    assert batches <= 8, batches


def test_single_item_latency_bounded_by_window():
    with MicroBatcher(ident_embed, max_batch=64, max_delay_ms=30) as mb:
        t0 = time.monotonic()
        mb.embed(7)
        elapsed = time.monotonic() - t0
    # one window (30 ms) + slack; a full-batch wait would hang forever
    assert elapsed < 5.0


def test_failed_window_propagates_only_to_its_callers():
    calls = []

    def flaky(items):
        calls.append(list(items))
        if len(calls) == 1:
            raise InferenceError("boom")
        return ident_embed(items)

    with MicroBatcher(flaky, max_batch=4, max_delay_ms=10) as mb:
        bad = mb.submit(1)
        with pytest.raises(InferenceError, match="boom"):
            bad.result(timeout=10)
        good = mb.embed(2)  # the next window must be unaffected
    np.testing.assert_array_equal(good, np.full(4, 2.0, np.float32))


def test_row_count_mismatch_is_an_inference_error():
    with MicroBatcher(lambda items: np.zeros((len(items) + 1, 4)),
                      max_batch=2, max_delay_ms=5) as mb:
        fut = mb.submit(1)
        with pytest.raises(InferenceError, match="rows"):
            fut.result(timeout=10)


@pytest.mark.filterwarnings(
    "ignore::pytest.PytestUnhandledThreadExceptionWarning")
def test_base_exception_fails_callers_instead_of_hanging():
    """A BaseException (KeyboardInterrupt-class) in embed_fn must resolve
    the window's futures and close the batcher — silently killing the daemon
    collector would hang every blocked caller forever."""
    def interrupted(items):
        raise KeyboardInterrupt

    mb = MicroBatcher(interrupted, max_batch=4, max_delay_ms=5)
    fut = mb.submit(1)
    with pytest.raises(InferenceError, match="KeyboardInterrupt"):
        fut.result(timeout=10)
    # collector is dead and the batcher marked closed: new submits fail fast
    mb._worker.join(timeout=10)
    assert not mb._worker.is_alive()
    with pytest.raises(InferenceError, match="closed"):
        mb.submit(2)


def test_close_drains_then_rejects():
    mb = MicroBatcher(ident_embed, max_batch=4, max_delay_ms=5)
    futs = [mb.submit(i) for i in range(10)]
    mb.close()
    for i, f in enumerate(futs):  # pre-close submissions all complete
        np.testing.assert_array_equal(f.result(timeout=10),
                                      np.full(4, float(i), np.float32))
    with pytest.raises(InferenceError, match="closed"):
        mb.submit(99)
    mb.close()  # idempotent


def test_end_to_end_with_real_embedder(tmp_path):
    """Concurrent MicroBatcher rows must equal direct embed_images rows
    through a real VisionEmbedder (the production wiring)."""
    from clip_embedder_tpu import Clip
    from test_concurrency import make_model_dir

    clip = Clip.from_local_dir(make_model_dir())
    rng = np.random.default_rng(0)
    imgs = [rng.integers(0, 255, (32, 32, 3), np.uint8) for _ in range(8)]
    direct = clip.vision.embed_images(imgs)

    with MicroBatcher(clip.vision.embed_images, max_batch=8,
                      max_delay_ms=100) as mb:
        futs = [mb.submit(img) for img in imgs]
        rows = [f.result(timeout=120) for f in futs]
        batches = mb.batches

    # identical bucketed batch shape -> identical program -> exact equality
    for got, want in zip(rows, direct):
        np.testing.assert_allclose(got, want, atol=2e-6)
    assert batches <= 4


def test_submit_close_race_never_hangs_a_future():
    """A submit racing close() must either complete or raise — never leave
    its Future unresolved (the closed-check + enqueue are atomic vs the
    close fence)."""
    for _ in range(20):
        mb = MicroBatcher(ident_embed, max_batch=4, max_delay_ms=1)
        results = []

        def submitter():
            try:
                results.append(mb.submit(7))
            except InferenceError:
                results.append(None)

        threads = [threading.Thread(target=submitter) for _ in range(8)]
        for t in threads:
            t.start()
        mb.close()
        for t in threads:
            t.join()
        for fut in results:
            if fut is None:
                continue  # rejected cleanly
            # accepted submissions must resolve (value or exception), fast
            try:
                np.testing.assert_array_equal(
                    fut.result(timeout=5), np.full(4, 7.0, np.float32))
            except InferenceError:
                pass  # failed by the close-drain: resolved, acceptable
