"""clip_embedder_tpu — a TPU-native zero-shot embedding framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the
``open_clip_inference`` Rust crate (reference mounted at /root/reference):
OpenCLIP-compatible zero-shot embedding with the same public surface —
``Clip`` / ``VisionEmbedder`` / ``TextEmbedder``, ``classify`` /
``rank_images`` / ``compare`` / ``embed_*``, HF-or-local model resolution
over the same model-dir contract (reference: src/lib.rs:170-181) — but with
the compute engine rebuilt TPU-first: jit-compiled ViT/FastViT and text
towers with Pallas kernels replace ONNX Runtime, a fused on-device
matmul-resize replaces host SIMD preprocessing, a from-scratch
tokenizer.json pipeline replaces the HF tokenizers crate, and bulk
embedding shards across TPU meshes via pjit instead of session replicas.

Usage (mirroring reference src/lib.rs:22-40):

    from clip_embedder_tpu import Clip
    clip = Clip.from_hf("RuteNL/MobileCLIP2-S2-OpenCLIP-ONNX")
    results = clip.classify("cat.jpg", ["a cat", "a dog", "a beignet"])

Decoupled embedders (reference src/lib.rs:46-71):

    from clip_embedder_tpu import VisionEmbedder, TextEmbedder
    vision = VisionEmbedder.from_local_dir(model_dir)
    embs = vision.embed_images(images)
"""

from .clip import Clip
from .config import ModelConfig, OpenClipConfig
from .errors import ClipError
from .text import TextEmbedder
from .vision import VisionEmbedder

__version__ = "0.1.0"

__all__ = [
    "Clip",
    "ClipError",
    "ModelConfig",
    "OpenClipConfig",
    "TextEmbedder",
    "VisionEmbedder",
]
