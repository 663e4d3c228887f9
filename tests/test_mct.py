"""MCT-class hybrid text towers (MobileCLIP-S0's ``mct``) get a NATIVE
tower with graph-derived structure — the last fallback-only text family
(VERDICT.md round 3, missing #3 / next #6).

The honesty contract under test (COMPONENTS.md unanchored-family rule):
the architecture is derived from the exported graph itself
(``onnx_reader.derive_mct_cfg``), weights recovered by consumption order
(``_structural_mct``), and the conversion SELF-VERIFIES against the
generic ONNX executor before acceptance, falling back to the executor on
any mismatch — so a structure misread can't ship wrong embeddings.
"""

import json
import sys
from pathlib import Path

import numpy as np
import pytest
import torch
import torch.nn.functional as F
from torch import nn

sys.path.insert(0, str(Path(__file__).parent))

from test_onnx_exec import export  # noqa: E402
from test_tokenizer import make_clip_style_spec  # noqa: E402
from torch_ref import VisionTransformer  # noqa: E402
from torch_ref_mct import TorchMctText  # noqa: E402

from clip_embedder_tpu.onnx_reader import derive_mct_cfg  # noqa: E402

CTX, VOCAB, W, HEADS, LAYERS, MLP, EMBED = 12, 64, 64, 4, 2, 256, 32
CONV_BLOCKS = ((5, 96), (3, 0))
MEAN = [0.5, 0.5, 0.5]
STD = [0.5, 0.5, 0.5]


def _distinct(model):
    # torch.onnx deduplicates identical fresh-init initializers; no trained
    # checkpoint exhibits that, so perturb constant tensors
    with torch.no_grad():
        for _, p in model.named_parameters():
            if (p == p.flatten()[0]).all():
                p.add_(0.02 * torch.randn_like(p))
    return model


class _NormText(nn.Module):
    def __init__(self, tower):
        super().__init__()
        self.text = tower

    def forward(self, ids):
        return self.text(ids)  # normalize already baked into the mirror


@pytest.fixture(scope="module")
def mct_onnx_dir(tmp_path_factory):
    """A reference-contract model dir whose text.onnx is an MCT-class
    hybrid export (visual.onnx is a standard ViT so Clip-level loads
    work)."""
    d = tmp_path_factory.mktemp("mct_onnx") / "mini-MobileCLIP-S0-ONNX"
    d.mkdir()
    torch.manual_seed(11)
    tt = _distinct(TorchMctText(CTX, VOCAB, W, HEADS, LAYERS, MLP, EMBED,
                                conv_blocks=CONV_BLOCKS).eval())
    export(_NormText(tt), torch.randint(4, VOCAB, (2, CTX)), d / "text.onnx",
           input_name="input_ids", output_name="text_embeddings")

    vt = _distinct(VisionTransformer(32, 8, W, 2, HEADS, MLP, EMBED).eval())

    class _NormVis(nn.Module):
        def __init__(self, tower):
            super().__init__()
            self.visual = tower

        def forward(self, pixels):
            return F.normalize(self.visual(pixels), dim=-1)

    export(_NormVis(vt), torch.randn(2, 3, 32, 32), d / "visual.onnx",
           input_name="pixel_values", output_name="image_embeddings")

    occ = {
        "model_cfg": {
            "embed_dim": EMBED,
            "vision_cfg": {"image_size": 32, "layers": 2, "width": W,
                           "patch_size": 8, "head_width": W // HEADS},
            # the dir-contract config describes a generic text tower; the
            # hybrid structure lives only in the graph (the S0 situation)
            "text_cfg": {"context_length": CTX, "vocab_size": VOCAB,
                         "width": W, "heads": HEADS, "layers": LAYERS},
        },
        "preprocess_cfg": {"mean": MEAN, "std": STD},
    }
    mcfg = {"tokenizer_needs_lowercase": False,
            "activation_function": "softmax", "logit_scale": 100.0,
            "logit_bias": 0.0, "pad_id": 0}
    (d / "open_clip_config.json").write_text(json.dumps(occ))
    (d / "model_config.json").write_text(json.dumps(mcfg))
    (d / "tokenizer.json").write_text(json.dumps(make_clip_style_spec()))
    return d, tt


def test_derive_mct_cfg_from_graph(mct_onnx_dir):
    d, _ = mct_onnx_dir
    cfg = derive_mct_cfg(d / "text.onnx")
    assert cfg["vocab_size"] == VOCAB
    assert cfg["width"] == W
    assert cfg["context_length"] == CTX
    assert cfg["layers"] == LAYERS
    assert cfg["heads"] == HEADS
    assert cfg["mlp_hidden"] == MLP
    assert cfg["embed_dim"] == EMBED
    assert cfg["conv_blocks"] == CONV_BLOCKS
    assert cfg["causal"] is True
    assert cfg["pool"] == "argmax"
    assert cfg["activation"] == "gelu"


def test_text_embedder_rides_native_mct_tower(mct_onnx_dir):
    d, tt = mct_onnx_dir
    from clip_embedder_tpu.text import TextEmbedder

    emb = TextEmbedder.from_local_dir(d, dtype=np.float32)
    assert emb.spec.family == "mct", (
        "MCT-class hybrid ONNX dir must lift to the native tower, "
        f"not '{emb.spec.family}'")

    texts = ["a photo of a cat", "the dog", "cats"]
    got = np.asarray(emb.embed_texts(texts))
    ids, _ = emb.tokenize(texts)
    with torch.no_grad():
        ref = tt(torch.from_numpy(np.asarray(ids).astype(np.int64))).numpy()
    cos = (got * ref).sum(-1)
    np.testing.assert_allclose(cos, 1.0, atol=1e-5)

    # the derived structure is persisted: the next load resolves natively
    # without re-deriving, and rides the .npz fast path
    occ = json.loads((d / "open_clip_config.json").read_text())
    mc = occ["model_cfg"]["text_cfg"]["mct_cfg"]
    assert tuple(tuple(b) for b in mc["conv_blocks"]) == CONV_BLOCKS
    assert (d / "text.npz").is_file()
    emb2 = TextEmbedder.from_local_dir(d, dtype=np.float32)
    assert emb2.spec.family == "mct"
    np.testing.assert_allclose(
        np.asarray(emb2.embed_texts(texts)), got, atol=1e-6)


def test_mct_tower_quantizes(mct_onnx_dir):
    """The point of the native lift: the family now rides the int8 stack
    (the executor used to exclude it from the fused kernels)."""
    d, _ = mct_onnx_dir
    from clip_embedder_tpu.text import TextEmbedder

    emb = TextEmbedder.from_local_dir(d, dtype=np.float32)
    q = TextEmbedder.from_local_dir(d, dtype=np.float32, quantize="int8_all")
    assert q.spec.family == "mct"
    texts = ["a photo of a cat", "the dog"]
    a = np.asarray(emb.embed_texts(texts))
    b = np.asarray(q.embed_texts(texts))
    cos = (a * b).sum(-1)
    assert (cos > 1 - 2e-3).all()


def test_plain_transformer_graph_rejected_by_derive(tmp_path):
    """Plain text transformers must NOT lift to the hybrid family."""
    from torch_ref import TextTransformer

    torch.manual_seed(3)
    tt = _distinct(TextTransformer(CTX, VOCAB, W, HEADS, 2, MLP,
                                   EMBED).eval())
    path = tmp_path / "text.onnx"
    export(_NormText(tt), torch.randint(4, VOCAB, (2, CTX)), path,
           input_name="input_ids", output_name="text_embeddings")
    from clip_embedder_tpu.errors import WeightError

    with pytest.raises(WeightError, match="no depthwise 1-D conv"):
        derive_mct_cfg(path)


def test_causal_padded_mixer_rejected_by_derive(tmp_path):
    """mct._dwconv1d implements symmetric SAME padding only; an export
    using causal (left-only, via an explicit Pad) or VALID conv padding is
    a numerically different tower and must be rejected at derivation (with
    the reason logged) instead of converted-and-bounced (advisor r4)."""
    import torch_ref_mct as m
    from clip_embedder_tpu.errors import WeightError

    class CausalMixer(m.ConvMixerBlock):
        def forward(self, x):
            k = self.dw.kernel_size[0]
            y = F.pad(x.transpose(1, 2), (k - 1, 0))[..., :x.shape[1] + k - 1]
            x = x + self.dw.__class__.forward(self.dw, y)[
                ..., :x.shape[1]].transpose(1, 2)
            if self.ffn_hidden:
                x = x + self.fc2(F.gelu(self.fc1(self.ln(x))))
            return x

    torch.manual_seed(5)
    tt = _distinct(TorchMctText(CTX, VOCAB, W, HEADS, LAYERS, MLP, EMBED,
                                conv_blocks=CONV_BLOCKS).eval())
    # swap the mixers for causal ones (padding now lives in a Pad node,
    # the Conv itself exports pads=[0, 0])
    for blk in tt.conv_blocks:
        blk.__class__ = CausalMixer
        blk.dw.padding = (0,)
    path = tmp_path / "text.onnx"
    export(_NormText(tt), torch.randint(4, VOCAB, (2, CTX)), path,
           input_name="input_ids", output_name="text_embeddings")
    with pytest.raises(WeightError, match="padding"):
        derive_mct_cfg(path)


def test_mct_self_verify_rejects_mismatched_graph(mct_onnx_dir, tmp_path,
                                                  monkeypatch):
    """The self-check is the safety net: if structural extraction
    mis-assembles the weights, the load must fall back to the executor,
    never ship the wrong tower."""
    import shutil

    d, _ = mct_onnx_dir
    broken = tmp_path / "broken"
    shutil.copytree(d, broken)
    (broken / "text.npz").unlink(missing_ok=True)
    occ = json.loads((broken / "open_clip_config.json").read_text())
    occ["model_cfg"]["text_cfg"].pop("mct_cfg", None)
    (broken / "open_clip_config.json").write_text(json.dumps(occ))

    import clip_embedder_tpu.text as text_mod

    real = text_mod.extract_tower_params \
        if hasattr(text_mod, "extract_tower_params") else None
    from clip_embedder_tpu import onnx_reader

    orig = onnx_reader._structural_mct

    def corrupt(g, cfg):
        params = orig(g, cfg)
        params["proj"]["w"] = np.ascontiguousarray(params["proj"]["w"][::-1])
        return params

    monkeypatch.setattr(onnx_reader, "_structural_mct", corrupt)
    emb = text_mod.TextEmbedder.from_local_dir(broken, dtype=np.float32)
    assert emb.spec.family == "onnx", (
        "a failed self-check must fall back to the executor, got "
        f"'{emb.spec.family}'")
    del real
