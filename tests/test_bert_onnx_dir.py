"""BiomedCLIP-class ONNX dirs convert to the NATIVE BERT tower with no
network access: the reference model-dir contract carries no HF config.json
(src/model_manager.rs:8-18), so ``derive_bert_hf_config`` recovers the
architecture dims from the exported text graph itself, and
``TextEmbedder.from_local_dir`` persists them into ``text_cfg.hf_config``.

microsoft/BiomedCLIP-PubMedBERT is on the reference's tested-model list
(reference: README.md:143); the exported text tower takes only input_ids —
open_clip's HFTextEncoder derives the attention mask in-graph from the HF
pad id (reference: pull_onnx.py:62-68 wraps encode_text).
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
from test_tokenizer import make_wordpiece_spec  # noqa: E402
from torch_ref import VisionTransformer  # noqa: E402

transformers = pytest.importorskip("transformers")

from clip_embedder_tpu.onnx_reader import derive_bert_hf_config  # noqa: E402

VOCAB, HIDDEN, LAYERS, HEADS, INTER, MAX_POS = 120, 64, 3, 4, 128, 32
EMBED, CTX = 32, 16
IMG, PATCH = 32, 8
MEAN = [0.5, 0.5, 0.5]
STD = [0.5, 0.5, 0.5]


class HFTextWrapper(nn.Module):
    """open_clip HFTextEncoder in miniature: BERT trunk, in-graph mask from
    the HF pad id, raw-CLS pooling (cls_last_hidden_state_pooler), MLP
    projection (Linear-GELU-Linear, second bias-free), L2 normalize — the
    BiomedCLIP text configuration."""

    def __init__(self, bert: nn.Module, embed_dim: int, pad_id: int):
        super().__init__()
        self.transformer = bert
        hidden = bert.config.hidden_size
        mid = (hidden + embed_dim) // 2
        self.proj = nn.Sequential(
            nn.Linear(hidden, mid), nn.GELU(),
            nn.Linear(mid, embed_dim, bias=False))
        self.pad_id = pad_id

    def forward(self, ids):
        mask = (ids != self.pad_id).long()
        out = self.transformer(
            input_ids=ids, attention_mask=mask).last_hidden_state
        return F.normalize(self.proj(out[:, 0]), dim=-1)


def _make_bert():
    config = transformers.BertConfig(
        vocab_size=VOCAB, hidden_size=HIDDEN, num_hidden_layers=LAYERS,
        num_attention_heads=HEADS, intermediate_size=INTER,
        max_position_embeddings=MAX_POS, pad_token_id=0,
    )
    torch.manual_seed(7)
    bert = transformers.BertModel(config, add_pooling_layer=False).eval()
    wrapper = HFTextWrapper(bert, EMBED, pad_id=0).eval()
    # de-duplicate identical fresh-init tensors (torch.onnx folds equal
    # initializers together, which no trained checkpoint exhibits)
    with torch.no_grad():
        for _, p in wrapper.named_parameters():
            if (p == p.flatten()[0]).all():
                p.add_(0.02 * torch.randn_like(p))
    return wrapper


@pytest.fixture(scope="module")
def bert_onnx_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("bert_onnx") / "mini-BiomedCLIP-ONNX"
    d.mkdir()
    wrapper = _make_bert()
    export(wrapper, torch.randint(4, VOCAB, (2, CTX)), d / "text.onnx",
           input_name="input_ids", output_name="text_embeds")

    torch.manual_seed(0)
    vt = VisionTransformer(IMG, PATCH, HIDDEN, 2, HEADS, INTER, EMBED).eval()
    with torch.no_grad():
        for _, p in vt.named_parameters():
            if p.abs().sum() == 0 or (p == p.flatten()[0]).all():
                p.add_(0.02 * torch.randn_like(p))

    class _Norm(nn.Module):
        def __init__(self, tower):
            super().__init__()
            self.visual = tower

        def forward(self, pixels):
            return F.normalize(self.visual(pixels), dim=-1)

    export(_Norm(vt), torch.randn(2, 3, IMG, IMG), d / "visual.onnx",
           input_name="pixel_values", output_name="image_embeds")

    occ = {
        "model_cfg": {
            "embed_dim": EMBED,
            "vision_cfg": {"image_size": IMG, "layers": 2, "width": HIDDEN,
                           "patch_size": PATCH, "head_width": HIDDEN // HEADS},
            # BiomedCLIP-era spelling: hf_model_name + proj/pooler_type,
            # and crucially NO hf_config — the dims must come from the graph
            "text_cfg": {"context_length": CTX,
                         "hf_model_name": "test/mini-pubmedbert",
                         "hf_tokenizer_name": "test/mini-pubmedbert",
                         "proj": "mlp",
                         "pooler_type": "cls_last_hidden_state_pooler"},
        },
        "preprocess_cfg": {"mean": MEAN, "std": STD},
    }
    mcfg = {"tokenizer_needs_lowercase": False,
            "activation_function": "softmax", "logit_scale": 100.0,
            "logit_bias": 0.0, "pad_id": 0}
    (d / "open_clip_config.json").write_text(json.dumps(occ))
    (d / "model_config.json").write_text(json.dumps(mcfg))
    (d / "tokenizer.json").write_text(json.dumps(make_wordpiece_spec()))
    return d, wrapper


def test_derive_hf_config_from_bert_graph(bert_onnx_dir):
    d, _ = bert_onnx_dir
    hf = derive_bert_hf_config(d / "text.onnx")
    assert hf["vocab_size"] == VOCAB
    assert hf["hidden_size"] == HIDDEN
    assert hf["num_hidden_layers"] == LAYERS
    assert hf["num_attention_heads"] == HEADS
    assert hf["intermediate_size"] == INTER
    assert hf["max_position_embeddings"] == MAX_POS
    assert hf["model_type"] == "bert"
    assert hf["pad_token_id"] == 0
    assert hf["layer_norm_eps"] == pytest.approx(1e-12)


def test_text_embedder_rides_native_bert_tower(bert_onnx_dir):
    d, wrapper = bert_onnx_dir
    from clip_embedder_tpu.text import TextEmbedder

    emb = TextEmbedder.from_local_dir(d, dtype=np.float32)
    assert emb.spec.family == "hf_bert", (
        "BiomedCLIP-class ONNX dir must resolve to the native BERT tower, "
        f"not '{emb.spec.family}'")

    texts = ["a photo of a cat", "the dog", "cats"]
    got = np.asarray(emb.embed_texts(texts))

    ids, _ = emb.tokenize(texts)
    ids = np.asarray(ids)
    with torch.no_grad():
        ref = wrapper(torch.from_numpy(ids.astype(np.int64))).numpy()
    cos = (got * ref).sum(-1)
    np.testing.assert_allclose(cos, 1.0, atol=1e-5)

    # the derived dims are persisted — later loads skip the ONNX read
    occ = json.loads((d / "open_clip_config.json").read_text())
    hf = occ["model_cfg"]["text_cfg"]["hf_config"]
    assert hf["hidden_size"] == HIDDEN and hf["num_hidden_layers"] == LAYERS


def test_derive_hf_config_roberta_graph(tmp_path):
    """XLM-R class towers (laion/xlm-roberta-large-ViT-H-14): the CumSum
    position-id derivation marks the model type, and the in-graph
    ``ids != pad`` comparison carries pad_token_id=1."""
    config = transformers.XLMRobertaConfig(
        vocab_size=VOCAB, hidden_size=HIDDEN, num_hidden_layers=2,
        num_attention_heads=HEADS, intermediate_size=INTER,
        max_position_embeddings=MAX_POS + 2, pad_token_id=1,
        layer_norm_eps=1e-5,
    )
    torch.manual_seed(3)
    xlmr = transformers.XLMRobertaModel(
        config, add_pooling_layer=False).eval()
    wrapper = HFTextWrapper(xlmr, EMBED, pad_id=1).eval()
    with torch.no_grad():
        for _, p in wrapper.named_parameters():
            if (p == p.flatten()[0]).all():
                p.add_(0.02 * torch.randn_like(p))
    path = tmp_path / "text.onnx"
    export(wrapper, torch.randint(4, VOCAB, (2, CTX)), path,
           input_name="input_ids", output_name="text_embeds")

    hf = derive_bert_hf_config(path)
    assert hf["model_type"] == "xlm-roberta"
    assert hf["pad_token_id"] == 1
    assert hf["num_hidden_layers"] == 2
    assert hf["num_attention_heads"] == HEADS
    assert hf["max_position_embeddings"] == MAX_POS + 2
    assert hf["layer_norm_eps"] == pytest.approx(1e-5)
