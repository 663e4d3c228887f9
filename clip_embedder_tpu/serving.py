"""Serving helpers: warmup (ahead-of-time compile of the shape buckets a
deployment will hit), a dynamic micro-batcher for concurrent callers, and a
ready-check.

Batch shapes are bucketed (powers of two; source sizes to 128-multiples), so
a deployment compiles a small, enumerable set of programs. ``warmup``
compiles them before traffic arrives — on this class of TPU runtime a cold
compile can take minutes, a warm one milliseconds (the persistent
compilation cache in utils.compilation_cache makes warmup survive process
restarts too).

The reference scales concurrent callers by replicating sessions
(``duplicate()``, reference src/clip.rs:69-73 — one ORT session per user
thread). On TPU the scarce resource is the chip, not the session: one large
batch through the MXU beats many concurrent small ones, so the serving
analog is ``MicroBatcher`` — coalesce items from concurrent callers into
one device step per window.
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future
from typing import Any, Callable, Iterable, Sequence

import numpy as np

from .errors import InferenceError
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


_STOP = object()


class ServerMetrics:
    """Thread-safe per-endpoint serving metrics (requests, items, errors,
    latency percentiles over a sliding window) — the observability layer
    the reference leaves to its callers (SURVEY §5: the reference has
    none; results are just returned). Exposed at ``GET /v1/metrics``."""

    _WINDOW = 2048  # latency samples kept per endpoint

    def __init__(self) -> None:
        from collections import Counter, defaultdict, deque

        self._lock = threading.Lock()
        self._requests: dict[str, int] = Counter()
        self._items: dict[str, int] = Counter()
        self._errors: dict[str, int] = Counter()
        self._lat = defaultdict(lambda: deque(maxlen=self._WINDOW))
        self._t0 = time.time()

    def observe(self, endpoint: str, *, items: int, seconds: float,
                error: str | None = None) -> None:
        with self._lock:
            self._requests[endpoint] += 1
            self._items[endpoint] += items
            if error is not None:
                self._errors[f"{endpoint}:{error}"] += 1
            else:
                self._lat[endpoint].append(seconds * 1e3)

    def snapshot(self) -> dict:
        with self._lock:
            lat = {}
            for ep, window in self._lat.items():
                if not window:
                    continue
                s = sorted(window)
                lat[ep] = {
                    "p50_ms": round(s[len(s) // 2], 3),
                    "p95_ms": round(s[int(len(s) * 0.95)], 3),
                    "max_ms": round(s[-1], 3),
                    "window": len(s),
                }
            return {
                "uptime_s": round(time.time() - self._t0, 1),
                "requests": dict(self._requests),
                "items": dict(self._items),
                "errors": dict(self._errors),
                "latency": lat,
            }


class _NoSuchEndpoint(Exception):
    """Unknown route — mapped to HTTP 404 (a wrong URL is not a 400-class
    malformed request; clients and proxies key on the distinction)."""


class MicroBatcher:
    """Coalesce single-item embed requests from concurrent callers into
    batched device steps.

    ``embed_fn`` maps a list of items to an ``[N, D]`` array — pass a bound
    ``VisionEmbedder.embed_images`` or ``TextEmbedder.embed_texts`` (or any
    callable with that contract). A collector thread drains the submission
    queue: the first item opens a window, further items join until
    ``max_batch`` is reached or ``max_delay_ms`` elapses, then the whole
    window runs as ONE forward. Per-request latency is bounded by
    ``max_delay_ms`` + one device step; throughput approaches the bulk
    batched rate even when every caller submits a single item.

    Batch sizes inside the embedders bucket to powers of two, so pick
    ``max_batch`` equal to a warmed bucket (``warmup(..., batch_sizes=...)``)
    to avoid cold compiles under traffic.

    Thread-safe; usable as a context manager. A failed forward propagates
    the exception to exactly the callers whose items were in that window —
    later windows are unaffected.
    """

    def __init__(
        self,
        embed_fn: Callable[[Sequence[Any]], np.ndarray],
        *,
        max_batch: int = 32,
        max_delay_ms: float = 2.0,
    ) -> None:
        if max_batch < 1:
            raise ValueError(f"max_batch must be >= 1, got {max_batch}")
        self._embed_fn = embed_fn
        self._max_batch = int(max_batch)
        self._max_delay = float(max_delay_ms) / 1e3
        self._queue: queue.SimpleQueue = queue.SimpleQueue()
        self._closed = False
        # makes the closed-check + put in submit() atomic vs close(): without
        # it a submit can pass the check, lose the CPU, and enqueue behind a
        # fully drained fence — its Future would never resolve
        self._submit_lock = threading.Lock()
        self.batches = 0   # windows executed (observability + tests)
        self.items = 0     # items embedded
        self._worker = threading.Thread(
            target=self._run, name="clip-microbatcher", daemon=True)
        self._worker.start()

    # -- submission ---------------------------------------------------------

    def submit(self, item: Any) -> "Future[np.ndarray]":
        """Enqueue one item; resolves to its ``[D]`` embedding row."""
        fut: Future = Future()
        with self._submit_lock:
            if self._closed:
                raise InferenceError("MicroBatcher is closed")
            self._queue.put((item, fut))
        return fut

    def embed(self, item: Any) -> np.ndarray:
        """Blocking convenience wrapper over :meth:`submit`."""
        return self.submit(item).result()

    # -- lifecycle ----------------------------------------------------------

    def close(self) -> None:
        """Drain already-submitted items, then stop the collector thread.
        Subsequent :meth:`submit` calls raise ``InferenceError``."""
        with self._submit_lock:
            if self._closed:
                return
            self._closed = True      # reject new work first…
            self._queue.put(_STOP)   # …then fence the queue (FIFO: earlier
        self._worker.join()          # submissions drain before the fence)
        # Belt and braces: the lock already prevents a submit slipping
        # behind the fence, but fail any leftover rather than hang forever.
        while True:
            try:
                leftover = self._queue.get_nowait()
            except queue.Empty:
                break
            if leftover is not _STOP:
                leftover[1].set_exception(
                    InferenceError("MicroBatcher is closed"))

    def __enter__(self) -> "MicroBatcher":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    # -- collector ----------------------------------------------------------

    def _run(self) -> None:
        logger = get_logger()
        while True:
            first = self._queue.get()
            if first is _STOP:
                return
            window = [first]
            deadline = time.monotonic() + self._max_delay
            stop = False
            while len(window) < self._max_batch:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    nxt = self._queue.get(timeout=remaining)
                except queue.Empty:
                    break
                if nxt is _STOP:
                    stop = True
                    break
                window.append(nxt)
            items = [item for item, _ in window]
            try:
                rows = self._embed_fn(items)
            except Exception as e:  # propagate to THIS window's callers
                for _, fut in window:
                    fut.set_exception(e)
            except BaseException as e:
                # KeyboardInterrupt/SystemExit in embed_fn: resolve this
                # window's (and any already-queued) futures so blocked
                # callers fail instead of hanging on a dead daemon thread,
                # then let it kill the collector (later submits fail via
                # the closed check).
                err = InferenceError(
                    f"embed_fn raised {type(e).__name__}; batcher closed")
                with self._submit_lock:
                    self._closed = True
                    for _, fut in window:
                        fut.set_exception(err)
                    while True:
                        try:
                            queued = self._queue.get_nowait()
                        except queue.Empty:
                            break
                        if queued is not _STOP:
                            queued[1].set_exception(err)
                raise
            else:
                if len(rows) != len(window):
                    err = InferenceError(
                        f"embed_fn returned {len(rows)} rows for "
                        f"{len(window)} items")
                    for _, fut in window:
                        fut.set_exception(err)
                else:
                    for (_, fut), row in zip(window, rows):
                        fut.set_result(np.asarray(row))
            self.batches += 1
            self.items += len(window)
            logger.debug("microbatch: %d items", len(window))
            if stop:
                return


class ClipServer:
    """Minimal production HTTP embedding service over a ``Clip``.

    Stdlib-only (``http.server.ThreadingHTTPServer``): no framework
    dependency, deployable anywhere the library runs. Single-item image and
    text requests ride per-modality :class:`MicroBatcher` instances, so
    concurrent callers coalesce into batched device steps; list requests go
    straight to the bulk embed path (already one batch).

    Endpoints (JSON unless noted):

    - ``GET  /healthz`` → ``{"status": "ok", ...}`` (after construction the
      model is loaded; pair with :func:`warmup` for cold-start-free serving)
    - ``POST /v1/embed/image`` — body = raw image bytes (any
      ``image/*``/``application/octet-stream`` content type), or JSON
      ``{"images_b64": ["<base64>", ...]}`` → ``{"embeddings": [[...], ...]}``
    - ``POST /v1/embed/text`` — ``{"texts": ["...", ...]}`` →
      ``{"embeddings": [[...], ...]}``
    - ``POST /v1/classify`` — ``{"image_b64": "...", "labels": [...]}`` →
      ``{"results": [[label, prob], ...]}`` sorted descending (the
      reference's classify contract, src/clip.rs:94-132)
    - ``POST /v1/rank`` — ``{"images_b64": [...], "text": "..."}`` →
      ``{"results": [[index, prob], ...]}`` sorted descending
    - ``GET  /v1/metrics`` → per-endpoint request/item/error counts,
      latency percentiles over a sliding window, micro-batch counts
      (:class:`ServerMetrics` — scrape-friendly JSON)

    Client errors (bad JSON, undecodable image, empty batch) map to HTTP
    400 with ``{"error": <ClipError class>, "message": ...}``; unexpected
    failures to 500. Binds loopback by default — put a real ingress in
    front for anything public.

    Pass ``mesh=`` (a ``jax.sharding.Mesh``) for a multi-chip deployment:
    every forward — bulk requests and the coalesced micro-batches alike —
    runs through the DP (optionally ``tensor_parallel=True``) sharded
    embedders over the whole slice (parallel.embed), so one server scales
    past a single chip instead of replicating per-thread sessions the way
    the reference does (src/clip.rs:69-73). classify/rank ride the same
    sharded paths, with the single-item side coalescing through the
    MicroBatcher.
    """

    def __init__(
        self,
        clip,
        *,
        host: str = "127.0.0.1",
        port: int = 0,
        max_batch: int = 32,
        max_delay_ms: float = 2.0,
        mesh=None,
        tensor_parallel: bool = False,
    ) -> None:
        import base64
        import json as _json
        from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

        from .errors import ClipError

        self._clip = clip
        self._closing = False
        self.metrics = ServerMetrics()
        self.mesh = mesh
        if mesh is not None:
            # mesh-backed deployment: every forward (bulk requests AND the
            # coalesced micro-batches) runs through the DP(+TP) sharded
            # embedders over the whole slice — the scale-past-one-chip
            # answer to the reference's per-thread duplicate() replicas
            # (src/clip.rs:69-73)
            from .parallel.embed import (ShardedTextEmbedder,
                                         ShardedVisionEmbedder)

            self._sharded_vision = ShardedVisionEmbedder(
                clip.vision, mesh, tensor_parallel=tensor_parallel)
            self._sharded_text = ShardedTextEmbedder(clip.text, mesh)
            self._embed_images = self._sharded_vision.embed_images
            self._embed_texts = self._sharded_text.embed_texts
        else:
            self._embed_images = clip.vision.embed_images
            self._embed_texts = clip.text.embed_texts
        self._vision_batcher = MicroBatcher(
            self._embed_images, max_batch=max_batch,
            max_delay_ms=max_delay_ms)
        self._text_batcher = MicroBatcher(
            self._embed_texts, max_batch=max_batch,
            max_delay_ms=max_delay_ms)
        server = self

        class Handler(BaseHTTPRequestHandler):
            # quiet: route request logs through our env-filtered logger
            def log_message(self, fmt, *args):  # noqa: A003
                get_logger().debug("http: " + fmt, *args)

            def _send(self, code: int, payload: dict) -> None:
                body = _json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _body(self) -> bytes:
                n = int(self.headers.get("Content-Length") or 0)
                return self.rfile.read(n)

            def do_GET(self):  # noqa: N802
                if self.path == "/healthz":
                    self._send(200, {
                        "status": "ok",
                        "batches": server._vision_batcher.batches
                        + server._text_batcher.batches,
                    })
                elif self.path == "/v1/metrics":
                    snap = server.metrics.snapshot()
                    snap["micro_batches"] = {
                        "vision": server._vision_batcher.batches,
                        "text": server._text_batcher.batches,
                    }
                    self._send(200, snap)
                else:
                    self._send(404, {"error": "NotFound",
                                     "message": self.path})

            def do_POST(self):  # noqa: N802
                t0 = time.perf_counter()
                try:
                    payload = self._route(self.path, self._body(),
                                          self.headers.get("Content-Type",
                                                           ""))
                except ClipError as e:
                    # A valid request racing a graceful shutdown is not a
                    # client error: daemon handler threads outlive
                    # shutdown(), so the batchers may already be closed.
                    # 503 tells well-behaved clients to retry elsewhere.
                    code = 503 if server._closing else 400
                    self._observe(t0, error=type(e).__name__)
                    self._send(code, {"error": type(e).__name__,
                                      "message": str(e)})
                except _NoSuchEndpoint as e:
                    self._send(404, {"error": "NotFound",
                                     "message": str(e)})
                except (ValueError, KeyError, TypeError) as e:
                    self._observe(t0, error=type(e).__name__)
                    self._send(400, {"error": type(e).__name__,
                                     "message": str(e)})
                except Exception as e:  # noqa: BLE001
                    self._observe(t0, error=type(e).__name__)
                    self._send(500, {"error": type(e).__name__,
                                     "message": str(e)})
                else:
                    rows = payload.get("embeddings") \
                        or payload.get("results") or ()
                    self._observe(t0, items=len(rows))
                    self._send(200, payload)

            def _observe(self, t0: float, *, items: int = 0,
                         error: str | None = None) -> None:
                server.metrics.observe(self.path, items=items,
                                       seconds=time.perf_counter() - t0,
                                       error=error)

            def _route(self, path: str, body: bytes, ctype: str) -> dict:
                if path == "/v1/embed/image":
                    if ctype.startswith("application/json"):
                        req = _json.loads(body)
                        imgs = [base64.b64decode(b)
                                for b in req["images_b64"]]
                        if not imgs:
                            from .errors import InferenceError

                            raise InferenceError("Empty batch")
                        emb = server._embed_images(imgs)
                        return {"embeddings": np.asarray(emb).tolist()}
                    row = server._vision_batcher.embed(body)
                    return {"embeddings": [row.tolist()]}
                if path == "/v1/embed/text":
                    req = _json.loads(body)
                    texts = req["texts"]
                    if isinstance(texts, str):
                        texts = [texts]
                    if len(texts) == 1:
                        return {"embeddings":
                                [server._text_batcher.embed(texts[0])
                                 .tolist()]}
                    emb = server._embed_texts(texts)
                    return {"embeddings": np.asarray(emb).tolist()}
                if path == "/v1/classify":
                    req = _json.loads(body)
                    img = base64.b64decode(req["image_b64"])
                    return {"results":
                            server._classify(img, req["labels"])}
                if path == "/v1/rank":
                    req = _json.loads(body)
                    imgs = [base64.b64decode(b) for b in req["images_b64"]]
                    return {"results": server._rank(imgs, req["text"])}
                raise _NoSuchEndpoint(f"no such endpoint: {path}")

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, name="clip-http", daemon=True)
        self._thread.start()

    # classify/rank on the server's own embed paths (sharded when a mesh
    # is configured), with the single image riding the vision MicroBatcher
    # so concurrent classify callers coalesce. Scoring semantics are
    # Clip.classify/rank_images' exactly (reference: src/clip.rs:94-170).

    def _classify(self, image, labels) -> list[tuple[str, float]]:
        v = self._vision_batcher.embed(image)
        t = np.asarray(self._embed_texts([str(l) for l in labels]))
        scale, bias = self._clip._scale_bias()
        probs = self._clip._activate(t @ v * scale + bias)
        return sorted(zip([str(l) for l in labels], probs.tolist()),
                      key=lambda kv: kv[1], reverse=True)

    def _rank(self, images, text: str) -> list[tuple[int, float]]:
        embs = np.asarray(self._embed_images(images))
        t = self._text_batcher.embed(text)
        scale, bias = self._clip._scale_bias()
        probs = self._clip._activate(embs @ t * scale + bias)
        return sorted(enumerate(probs.tolist()),
                      key=lambda kv: kv[1], reverse=True)

    @property
    def address(self) -> tuple[str, int]:
        """Actual (host, port) — useful with ``port=0`` (ephemeral)."""
        return self._httpd.server_address[:2]

    def close(self) -> None:
        self._closing = True
        self._httpd.shutdown()
        self._httpd.server_close()
        self._thread.join()
        self._vision_batcher.close()
        self._text_batcher.close()

    def __enter__(self) -> "ClipServer":
        return self

    def __exit__(self, *exc) -> None:
        self.close()
