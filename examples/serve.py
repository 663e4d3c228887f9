"""Minimal HTTP embedding service: the production-serving composition of
``Clip`` + ``serving.warmup`` + ``serving.MicroBatcher``.

    python examples/serve.py <model_dir> [port]

Endpoints:
    POST /embed/image   (body: raw image bytes)  -> {"embedding": [...], "dim": D}
    POST /embed/text    (body: UTF-8 text)       -> {"embedding": [...], "dim": D}
    GET  /healthz                                -> {"ok": true}

The reference's concurrency story is per-thread session replicas
(``duplicate()``, reference src/clip.rs:69-73). Here each connection gets a
thread (ThreadingHTTPServer) but all threads share the one TPU through a
MicroBatcher, which coalesces in-flight requests into one bucketed device
batch per window — request-at-a-time traffic runs at near-bulk throughput.
"""

import json
import sys
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from clip_embedder_tpu import Clip
from clip_embedder_tpu.errors import ClipError
from clip_embedder_tpu.serving import MicroBatcher, warmup
from clip_embedder_tpu.utils.logging import get_logger

MAX_BATCH = 8  # a warmed bucket: windows never hit a cold compile


def main():
    model_dir = sys.argv[1]
    port = int(sys.argv[2]) if len(sys.argv) > 2 else 8000
    logger = get_logger()

    clip = Clip.from_local_dir(model_dir)
    warmup(clip, batch_sizes=(1, MAX_BATCH), image_sizes=((256, 256),))
    vision_mb = MicroBatcher(clip.vision.embed_images, max_batch=MAX_BATCH)
    text_mb = MicroBatcher(clip.text.embed_texts, max_batch=MAX_BATCH)

    class Handler(BaseHTTPRequestHandler):
        def _reply(self, code: int, obj) -> None:
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._reply(200, {"ok": True})
            else:
                self._reply(404, {"error": "not found"})

        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            data = self.rfile.read(n)
            try:
                if self.path == "/embed/image":
                    emb = vision_mb.embed(data)
                elif self.path == "/embed/text":
                    emb = text_mb.embed(data.decode("utf-8"))
                else:
                    self._reply(404, {"error": "not found"})
                    return
            except ClipError as e:
                self._reply(400, {"error": str(e)})
                return
            self._reply(200, {"embedding": emb.tolist(), "dim": len(emb)})

        def log_message(self, fmt, *args):
            logger.info("http: " + fmt, *args)

    server = ThreadingHTTPServer(("127.0.0.1", port), Handler)
    # port 0 auto-assigns; print the resolved address for callers
    print(f"serving on 127.0.0.1:{server.server_address[1]}", flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        vision_mb.close()
        text_mb.close()


if __name__ == "__main__":
    main()
