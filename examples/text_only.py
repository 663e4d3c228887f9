"""Batch text embedding with the decoupled TextEmbedder
(reference: examples/text_only.rs).

    python examples/text_only.py <model_dir> "<text>" ...
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from clip_embedder_tpu import TextEmbedder


def main():
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    model_dir, texts = sys.argv[1], sys.argv[2:]
    text = TextEmbedder.from_local_dir(model_dir)
    embs = text.embed_texts(texts)
    for t, emb in zip(texts, embs):
        print(f"{t!r}: dim={emb.shape[0]} first5={emb[:5].round(4).tolist()}")


if __name__ == "__main__":
    main()
