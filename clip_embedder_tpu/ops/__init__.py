"""TPU-native compute primitives.

This package replaces the reference's opaque ONNX-Runtime kernel library
(reference: src/onnx.rs:19-23) with from-scratch JAX/XLA ops plus Pallas
kernels for the hot blocks. Everything is functional: params in, arrays out,
jit-traceable, static shapes.
"""

from .layers import (
    gelu,
    gelu_tanh,
    layer_norm,
    linear,
    mlp,
    quick_gelu,
    ACTIVATIONS,
)
from .normalize import l2_normalize
from .attention import multi_head_attention

__all__ = [
    "gelu",
    "gelu_tanh",
    "quick_gelu",
    "layer_norm",
    "linear",
    "mlp",
    "ACTIVATIONS",
    "l2_normalize",
    "multi_head_attention",
]
