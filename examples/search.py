"""Semantic image search over a directory (reference: examples/search.rs):
embed every image, rank against a text query. With more than one device the
batch shards across the mesh (the TPU version of the reference's bulk
indexing workload).

    python examples/search.py <model_dir> <image_dir> "<query>"
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from clip_embedder_tpu import Clip
from clip_embedder_tpu.utils.logging import get_logger, timed

logger = get_logger()


def main():
    if len(sys.argv) < 4:
        sys.exit(__doc__)
    model_dir, image_dir, query = sys.argv[1], sys.argv[2], sys.argv[3]
    paths = sorted(
        p for p in Path(image_dir).iterdir()
        if p.suffix.lower() in (".jpg", ".jpeg", ".png", ".webp")
    )
    if not paths:
        raise SystemExit(f"No images in {image_dir}")

    with timed("model load", logger):
        clip = Clip.from_local_dir(model_dir)

    import jax

    if len(jax.devices()) > 1:
        from clip_embedder_tpu.parallel import ShardedVisionEmbedder
        from clip_embedder_tpu.parallel.mesh import get_mesh

        mesh = get_mesh()
        sharded = ShardedVisionEmbedder(clip.vision, mesh)
        with timed(f"embed {len(paths)} images on {mesh.shape}", logger):
            img_embs = sharded.embed_images([str(p) for p in paths])
        text_emb = clip.text.embed_text(query)
        sims = img_embs @ text_emb
        ranked = sorted(enumerate(sims.tolist()), key=lambda kv: -kv[1])
    else:
        with timed(f"embed+rank {len(paths)} images", logger):
            ranked = clip.rank_images([str(p) for p in paths], query)

    print(f"Results for {query!r}:")
    for idx, score in ranked:
        print(f"  {score:.4f}  {paths[idx].name}")


if __name__ == "__main__":
    main()
