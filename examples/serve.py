"""Minimal HTTP embedding service: the production-serving composition of
``Clip`` + ``serving.warmup`` + ``serving.ClipServer``.

    python examples/serve.py <model_dir> [port]

Endpoints (see ClipServer's docstring for bodies):
    GET  /healthz
    POST /v1/embed/image   raw image bytes, or {"images_b64": [...]}
    POST /v1/embed/text    {"texts": [...]}
    POST /v1/classify      {"image_b64": ..., "labels": [...]}
    POST /v1/rank          {"images_b64": [...], "text": ...}

The reference's concurrency story is per-thread session replicas
(``duplicate()``, reference src/clip.rs:69-73). Here every connection gets
a thread but all threads share the one TPU: ClipServer's MicroBatchers
coalesce in-flight single-item requests into one bucketed device batch per
window, so request-at-a-time traffic runs at near-bulk throughput.
"""

import sys
import threading
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from clip_embedder_tpu import Clip
from clip_embedder_tpu.serving import ClipServer, warmup

MAX_BATCH = 8  # a warmed bucket: windows never hit a cold compile


def main():
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    model_dir = sys.argv[1]
    port = int(sys.argv[2]) if len(sys.argv) > 2 else 8000

    clip = Clip.from_local_dir(model_dir)
    warmup(clip, batch_sizes=(1, MAX_BATCH), image_sizes=((256, 256),))
    with ClipServer(clip, port=port, max_batch=MAX_BATCH) as server:
        host, bound = server.address
        print(f"serving on {host}:{bound}", flush=True)
        try:
            threading.Event().wait()
        except KeyboardInterrupt:
            pass


if __name__ == "__main__":
    main()
