"""Batch image embedding with the decoupled VisionEmbedder
(reference: examples/vision_only.rs).

    python examples/vision_only.py <model_dir> <image...>
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from clip_embedder_tpu import VisionEmbedder
from clip_embedder_tpu.utils.logging import get_logger, timed


def main():
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    model_dir, images = sys.argv[1], sys.argv[2:]
    logger = get_logger()
    with timed("load", logger):
        vision = VisionEmbedder.from_local_dir(model_dir)
    with timed(f"embed {len(images)}", logger):
        embs = vision.embed_images(images)
    for path, emb in zip(images, embs):
        print(f"{path}: dim={emb.shape[0]} first5={emb[:5].round(4).tolist()}")


if __name__ == "__main__":
    main()
