"""Torch mirror of the MCT-class hybrid text tower (MobileCLIP-S0's
``mct``), in its inference/reparameterized form: depthwise 1-D conv token
mixers (+ optional ConvFFN) before standard pre-LN transformer layers.

Used by tests/test_mct.py to produce exported graphs for the graph-derived
conversion path (onnx_reader.derive_mct_cfg + _structural_mct). The graph
— not this mirror — is the conversion's ground truth: text.py additionally
self-verifies every converted tower against the generic ONNX executor on
the same graph, so the mirror only needs to be a *member* of the family,
not a bit-exact replica of Apple's implementation.
"""

import torch
import torch.nn.functional as F
from torch import nn

from torch_ref import Transformer


class ConvMixerBlock(nn.Module):
    """Reparameterized Text-RepMixer block: residual depthwise 1-D conv
    token mixing + optional pre-LN ConvFFN (pointwise convs == Linear)."""

    def __init__(self, width, kernel, ffn_hidden=0):
        super().__init__()
        self.dw = nn.Conv1d(width, width, kernel, padding=kernel // 2,
                            groups=width)
        self.ffn_hidden = ffn_hidden
        if ffn_hidden:
            self.ln = nn.LayerNorm(width)
            self.fc1 = nn.Linear(width, ffn_hidden)
            self.fc2 = nn.Linear(ffn_hidden, width)

    def forward(self, x):  # [B, T, C]
        x = x + self.dw(x.transpose(1, 2)).transpose(1, 2)
        if self.ffn_hidden:
            x = x + self.fc2(F.gelu(self.fc1(self.ln(x))))
        return x


class TorchMctText(nn.Module):
    def __init__(self, context_length, vocab_size, width, heads, layers,
                 mlp_hidden, embed_dim, conv_blocks=((5, 0), (3, 0)),
                 causal=True, pool="argmax"):
        super().__init__()
        self.causal = causal
        self.pool = pool
        self.token_embedding = nn.Embedding(vocab_size, width)
        self.positional_embedding = nn.Parameter(
            0.01 * torch.randn(context_length, width))
        self.conv_blocks = nn.ModuleList(
            ConvMixerBlock(width, k, h) for k, h in conv_blocks)
        self.transformer = Transformer(width, layers, heads, mlp_hidden,
                                       nn.GELU)
        self.ln_final = nn.LayerNorm(width)
        self.text_projection = nn.Parameter(
            width ** -0.5 * torch.randn(width, embed_dim))

    def forward(self, ids):
        x = self.token_embedding(ids)
        x = x + self.positional_embedding
        for block in self.conv_blocks:
            x = block(x)
        mask = None
        if self.causal:
            n = ids.shape[1]
            mask = torch.full((n, n), float("-inf")).triu(1)
        x = self.transformer(x, mask)
        x = self.ln_final(x)
        if self.pool == "argmax":
            pooled = x[torch.arange(x.shape[0]), ids.argmax(dim=-1)]
        else:
            pooled = x[:, -1]
        return F.normalize(pooled @ self.text_projection, dim=-1)
