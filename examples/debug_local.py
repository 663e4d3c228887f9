"""Numerical-parity debug harness (reference: examples/debug_local.rs):
prints token ids, preprocessed pixel stats/slices, embedding stats, and the
raw dot product; reconstructs the preprocessed tensor to a PNG for
eyeballing. Point it at a model dir and an image to compare stage-by-stage
against another implementation.

    python examples/debug_local.py <model_dir> <image> "<text>"
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

from clip_embedder_tpu import Clip


def stats(name, arr):
    arr = np.asarray(arr, dtype=np.float64)
    print(f"  {name}: shape={list(arr.shape)} mean={arr.mean():.6f} "
          f"std={arr.std():.6f} min={arr.min():.4f} max={arr.max():.4f}")


def main():
    if len(sys.argv) < 4:
        sys.exit(__doc__)
    model_dir, image, text = sys.argv[1], sys.argv[2], sys.argv[3]
    clip = Clip.from_local_dir(model_dir)

    print("== tokenization (reference: debug_local.rs:73-82)")
    ids, mask = clip.text.tokenize([text])
    print(f"  ids[{len(ids[0])}]: {ids[0].tolist()}")
    print(f"  mask: {mask[0].tolist()}")

    print("== preprocessing (reference: debug_local.rs:84-102)")
    pixels = clip.vision.preprocess(image)  # NCHW like the reference
    stats("pixels (NCHW)", pixels)
    print(f"  first 10 of channel 0: {pixels[0, 0].ravel()[:10].round(5).tolist()}")

    # reconstruct to PNG (reference: debug_local.rs:20-37)
    pp = clip.vision.config.preprocess_cfg
    mean = np.asarray(pp.mean).reshape(3, 1, 1)
    std = np.asarray(pp.std).reshape(3, 1, 1)
    recon = np.clip((pixels[0] * std + mean) * 255.0, 0, 255).astype(np.uint8)
    try:
        from PIL import Image

        out_path = Path("debug_preprocessed.png")
        Image.fromarray(recon.transpose(1, 2, 0)).save(out_path)
        print(f"  wrote {out_path}")
    except ImportError:
        print("  (Pillow unavailable: skipping PNG reconstruction)")

    print("== embeddings (reference: debug_local.rs:104-123)")
    img_emb = clip.vision.embed_image(image)
    txt_emb = clip.text.embed_text(text)
    stats("image embedding", img_emb)
    print(f"  image first5: {img_emb[:5].round(5).tolist()}")
    stats("text embedding", txt_emb)
    print(f"  text first5: {txt_emb[:5].round(5).tolist()}")

    print("== similarity (reference: debug_local.rs:125-127)")
    dot = float(img_emb @ txt_emb)
    mc = clip.get_model_config()
    scale = mc.logit_scale or 1.0
    bias = mc.logit_bias or 0.0
    print(f"  raw dot product: {dot:.6f}")
    print(f"  logit (scale={scale:.3f}, bias={bias:.3f}): {dot * scale + bias:.4f}")


if __name__ == "__main__":
    main()
