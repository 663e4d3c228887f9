"""Model families.

From-scratch JAX towers replacing the reference's ONNX graphs:
``vit`` (CLIP + SigLIP ViTs), ``text_transformer`` (CLIP causal + SigLIP
bidirectional), ``fastvit`` (MobileCLIP conv-hybrid, inference/reparameterized
form), ``hf_text`` (BERT-style HF text towers). Architecture selection is
config-driven via :mod:`clip_embedder_tpu.models.build`.
"""

from . import text_transformer, vit
from .build import TowerSpec, resolve_text, resolve_vision
from .text_transformer import TextCfgResolved
from .vit import ViTCfg

__all__ = [
    "vit",
    "text_transformer",
    "ViTCfg",
    "TextCfgResolved",
    "TowerSpec",
    "resolve_vision",
    "resolve_text",
]
