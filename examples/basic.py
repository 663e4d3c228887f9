"""Zero-shot classification in a few lines (reference: examples/basic.rs).

    python examples/basic.py <model_dir_or_hf_id> <image> [labels...]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from clip_embedder_tpu import Clip


def main():
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    model = sys.argv[1]
    image = sys.argv[2]
    labels = sys.argv[3:] or [
        "a photo of a cat", "a photo of a dog", "a photo of a beignet",
    ]
    clip = (Clip.from_local_dir(model) if Path(model).exists()
            else Clip.from_hf(model))
    for text, prob in clip.classify(image, labels):
        print(f"{text}: {prob * 100:.2f}%")


if __name__ == "__main__":
    main()
