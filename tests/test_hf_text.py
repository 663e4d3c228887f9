"""Parity: the from-scratch BERT text tower vs transformers.BertModel
(the HF text-tower family used by BiomedCLIP-style models —
reference: src/config.rs:46 hf_tokenizer_name, src/text.rs:156-161
attention_mask path).
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from clip_embedder_tpu.models import hf_text
from clip_embedder_tpu.models.hf_text import BertCfg

transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def bert_pair():
    config = transformers.BertConfig(
        vocab_size=120, hidden_size=64, num_hidden_layers=3,
        num_attention_heads=4, intermediate_size=128,
        max_position_embeddings=32, pad_token_id=0,
    )
    torch.manual_seed(0)
    model = transformers.BertModel(config, add_pooling_layer=False).eval()
    cfg = BertCfg(
        context_length=16, vocab_size=120, width=64, heads=4, layers=3,
        mlp_hidden=128, embed_dim=64, pad_id=0, pooler="cls", proj="none",
    )
    sd = {f"transformer.{k}": v.detach().numpy()
          for k, v in model.state_dict().items()}
    params = hf_text.map_hf_text(sd)
    return model, cfg, params


def make_ids(batch=3, length=16):
    torch.manual_seed(1)
    ids = torch.randint(3, 119, (batch, length))
    ids[:, 0] = 101  # CLS-ish
    ids[0, 10:] = 0  # padding on one row
    ids[1, 5:] = 0
    return ids


def test_hidden_states_parity(bert_pair):
    model, cfg, params = bert_pair
    ids = make_ids()
    mask = (ids != 0).long()
    with torch.no_grad():
        ref = model(input_ids=ids, attention_mask=mask).last_hidden_state
    ref_cls = ref[:, 0].numpy()

    got = np.asarray(
        hf_text.apply(params, jnp.asarray(ids.numpy()), cfg, normalize=False)
    )
    # only CLS pooling output is compared (padded positions diverge freely)
    cos = (got * ref_cls).sum(-1) / (
        np.linalg.norm(got, axis=-1) * np.linalg.norm(ref_cls, axis=-1)
    )
    assert (cos > 1 - 1e-6).all()
    np.testing.assert_allclose(got, ref_cls, atol=2e-4)


def test_mean_pooler_ignores_padding(bert_pair):
    model, cfg0, params = bert_pair
    cfg = BertCfg(**{**cfg0.__dict__, "pooler": "mean"})
    ids = make_ids()
    mask = (ids != 0).float()
    with torch.no_grad():
        ref = model(input_ids=ids, attention_mask=mask.long()).last_hidden_state
    ref_mean = ((ref * mask[..., None]).sum(1) / mask.sum(1)[:, None]).numpy()

    got = np.asarray(
        hf_text.apply(params, jnp.asarray(ids.numpy()), cfg, normalize=False)
    )
    np.testing.assert_allclose(got, ref_mean, atol=2e-4)


def test_resolve_from_config():
    from clip_embedder_tpu.config import ModelCfg
    from clip_embedder_tpu.models.build import resolve_text

    mc = ModelCfg.from_dict({
        "embed_dim": 48,
        "vision_cfg": {"image_size": 32, "layers": 2, "width": 64,
                       "patch_size": 8},
        "text_cfg": {
            "context_length": 16,
            "hf_model_name": "some/bert",
            "hf_tokenizer_name": "some/bert",
            "pooler_type": "cls_last_hidden_state_pooler",
            "proj_type": "mlp",
            "hf_config": {
                "vocab_size": 120, "hidden_size": 64,
                "num_attention_heads": 4, "num_hidden_layers": 3,
                "intermediate_size": 128, "pad_token_id": 0,
            },
        },
    })
    spec = resolve_text(mc)
    assert spec.family == "hf_bert"
    assert spec.cfg.width == 64
    assert spec.cfg.proj == "mlp"
    assert spec.cfg.pooler == "cls"


def test_cls_pooler_output_matches_transformers():
    """open_clip 'cls_pooler' semantics: BERT pooler_output =
    tanh(dense(CLS))."""
    config = transformers.BertConfig(
        vocab_size=120, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128,
        max_position_embeddings=32, pad_token_id=0,
    )
    torch.manual_seed(2)
    model = transformers.BertModel(config, add_pooling_layer=True).eval()
    cfg = BertCfg(
        context_length=16, vocab_size=120, width=64, heads=4, layers=2,
        mlp_hidden=128, embed_dim=64, pad_id=0, pooler="cls_pooler",
        proj="none",
    )
    sd = {f"transformer.{k}": v.detach().numpy()
          for k, v in model.state_dict().items()}
    params = hf_text.map_hf_text(sd)
    assert "pooler" in params

    ids = make_ids()
    mask = (ids != 0).long()
    with torch.no_grad():
        ref = model(input_ids=ids, attention_mask=mask).pooler_output.numpy()
    got = np.asarray(hf_text.apply(params, jnp.asarray(ids.numpy()), cfg,
                                   normalize=False))
    np.testing.assert_allclose(got, ref, atol=3e-4)


def test_resolve_accepts_all_proj_pooler_key_spellings():
    """open_clip key spelling varies by era: BiomedCLIP-class configs use
    'proj'/'pooler_type', current open_clip 'hf_proj_type'/
    'hf_pooler_type' — all must resolve (review finding: 'proj' was
    ignored, silently mis-building the projection)."""
    from clip_embedder_tpu.config import ModelCfg
    from clip_embedder_tpu.models.build import resolve_text

    def mc(**text_extra):
        return ModelCfg.from_dict({
            "embed_dim": 48,
            "vision_cfg": {"image_size": 32, "layers": 2, "width": 64,
                           "patch_size": 8},
            "text_cfg": {
                "context_length": 16,
                "hf_model_name": "some/bert",
                "hf_config": {"vocab_size": 120, "hidden_size": 64,
                              "num_attention_heads": 4,
                              "num_hidden_layers": 2,
                              "intermediate_size": 128,
                              "pad_token_id": 0},
                **text_extra,
            },
        })

    biomed = resolve_text(mc(proj="mlp",
                             pooler_type="cls_last_hidden_state_pooler"))
    assert biomed.cfg.proj == "mlp" and biomed.cfg.pooler == "cls"
    modern = resolve_text(mc(hf_proj_type="linear",
                             hf_pooler_type="mean_pooler"))
    assert modern.cfg.proj == "linear" and modern.cfg.pooler == "mean"
    # unspecified: width != embed_dim → open_clip's mlp default
    assert resolve_text(mc()).cfg.proj == "mlp"


@pytest.fixture(scope="module")
def xlmr_pair():
    """Independent anchor: transformers.XLMRobertaModel (not written here)
    through the production mapper — the laion xlm-roberta-large-ViT-H-14
    text-tower class."""
    config = transformers.XLMRobertaConfig(
        vocab_size=130, hidden_size=64, num_hidden_layers=3,
        num_attention_heads=4, intermediate_size=128,
        max_position_embeddings=24, pad_token_id=1,
        layer_norm_eps=1e-5,
    )
    torch.manual_seed(4)
    model = transformers.XLMRobertaModel(config,
                                         add_pooling_layer=False).eval()
    cfg = BertCfg(
        context_length=16, vocab_size=130, width=64, heads=4, layers=3,
        mlp_hidden=128, embed_dim=64, pad_id=1, pooler="mean", proj="none",
        ln_eps=1e-5, position_style="roberta", max_pos=24,
    )
    sd = {f"transformer.{k}": v.detach().numpy()
          for k, v in model.state_dict().items()}
    params = hf_text.map_hf_text(sd)
    assert params["pos_embed"].shape == (24, 64)
    return model, cfg, params


def make_roberta_ids(batch=3, length=16):
    torch.manual_seed(5)
    ids = torch.randint(4, 129, (batch, length))
    ids[:, 0] = 0       # <s>
    ids[0, 10:] = 1     # <pad> rows (XLM-R pad id is 1)
    ids[1, 5:] = 1
    return ids


def test_xlm_roberta_hidden_state_parity(xlmr_pair):
    """RoBERTa position ids (pads at padding_idx, real tokens from
    padding_idx+1) must match transformers exactly — BERT-style 0..L-1
    positions would shift every token's position embedding."""
    model, cfg, params = xlmr_pair
    ids = make_roberta_ids()
    mask = (ids != 1).long()
    with torch.no_grad():
        ref = model(input_ids=ids, attention_mask=mask).last_hidden_state
    maskf = mask.float()
    ref_mean = ((ref * maskf[..., None]).sum(1)
                / maskf.sum(1)[:, None]).numpy()

    got = np.asarray(
        hf_text.apply(params, jnp.asarray(ids.numpy()), cfg,
                      normalize=False,
                      attention_mask=jnp.asarray(mask.numpy())))
    np.testing.assert_allclose(got, ref_mean, atol=2e-4)


def test_xlm_roberta_position_ids_not_bert(xlmr_pair):
    """Same weights under position_style='bert' must NOT match the anchor —
    proves the parity above actually exercises the RoBERTa offset."""
    model, cfg, params = xlmr_pair
    ids = make_roberta_ids()
    mask = (ids != 1).long()
    with torch.no_grad():
        ref = model(input_ids=ids, attention_mask=mask).last_hidden_state
    maskf = mask.float()
    ref_mean = ((ref * maskf[..., None]).sum(1)
                / maskf.sum(1)[:, None]).numpy()

    bert_cfg = BertCfg(**{**cfg.__dict__, "position_style": "bert"})
    got = np.asarray(
        hf_text.apply(params, jnp.asarray(ids.numpy()), bert_cfg,
                      normalize=False,
                      attention_mask=jnp.asarray(mask.numpy())))
    assert np.abs(got - ref_mean).max() > 1e-3


def test_resolve_roberta_config():
    """model_type roberta/xlm-roberta flips the position style, pulls the
    position-table size, and defaults pad_id=1 / ln_eps=1e-5."""
    from clip_embedder_tpu.config import ModelCfg
    from clip_embedder_tpu.models.build import resolve_text

    mc = ModelCfg.from_dict({
        "embed_dim": 48,
        "vision_cfg": {"image_size": 32, "layers": 2, "width": 64,
                       "patch_size": 8},
        "text_cfg": {
            "context_length": 16,
            "hf_model_name": "xlm-roberta-large",
            "hf_tokenizer_name": "xlm-roberta-large",
            "hf_pooler_type": "mean_pooler",
            "hf_proj_type": "mlp",
            "hf_config": {
                "model_type": "xlm-roberta",
                "vocab_size": 130, "hidden_size": 64,
                "num_attention_heads": 4, "num_hidden_layers": 3,
                "intermediate_size": 128,
                "max_position_embeddings": 24,
            },
        },
    })
    spec = resolve_text(mc)
    assert spec.family == "hf_bert"
    cfg = spec.cfg
    assert cfg.position_style == "roberta"
    assert cfg.max_pos == 24
    assert cfg.pad_id == 1
    assert cfg.ln_eps == 1e-5
    assert cfg.pooler == "mean" and cfg.proj == "mlp"
    # init builds the full-size position table for the declared style
    import jax

    params = hf_text.init(jax.random.key(0), cfg)
    assert params["pos_embed"].shape[0] == 24


def test_cls_pooler_without_weights_raises():
    """cls_pooler with a checkpoint exported without the BERT pooler must
    raise, not silently degrade to raw-CLS pooling."""
    from clip_embedder_tpu.errors import WeightError

    cfg = BertCfg(context_length=8, vocab_size=64, width=32, heads=2,
                  layers=1, mlp_hidden=64, embed_dim=32, pad_id=0,
                  pooler="cls_pooler", proj="none")
    import jax

    params = hf_text.init(jax.random.key(0), cfg)
    params.pop("pooler", None)
    ids = jnp.asarray([[2, 5, 3, 0, 0, 0, 0, 0]], jnp.int32)
    with pytest.raises(WeightError, match="pooler"):
        hf_text.apply(params, ids, cfg)


def test_attention_mask_overrides_pad_id_derivation():
    """The tokenizer-produced mask is authoritative: when the tokenizer's
    pad id differs from hf_config's pad_token_id, masking must follow the
    mask, not cfg.pad_id (review: the mask argument was discarded)."""
    import jax

    cfg = BertCfg(context_length=8, vocab_size=64, width=32, heads=2,
                  layers=2, mlp_hidden=64, embed_dim=32, pad_id=0)
    params = hf_text.init(jax.random.key(3), cfg)
    # ids padded with id 1 (≠ cfg.pad_id): derivation from pad_id would
    # attend the padding; the explicit mask must control
    ids = jnp.asarray([[2, 5, 9, 1, 1, 1, 1, 1]], jnp.int32)
    mask = jnp.asarray([[1, 1, 1, 0, 0, 0, 0, 0]], jnp.int32)
    with_mask = np.asarray(hf_text.apply(params, ids, cfg,
                                         attention_mask=mask))
    # ground truth: same content padded with cfg.pad_id and derived mask
    ids0 = jnp.asarray([[2, 5, 9, 0, 0, 0, 0, 0]], jnp.int32)
    ref = np.asarray(hf_text.apply(params, ids0, cfg))
    cos = (with_mask * ref).sum(-1)
    # embeddings differ only through the pad-row word embeddings, which are
    # fully masked out of attention and pooling (cls pool at position 0)
    assert (cos > 1 - 1e-6).all()
    without_mask = np.asarray(hf_text.apply(params, ids, cfg))
    assert (np.abs(without_mask - with_mask) > 1e-6).any()
