"""Weight-format round-trip across every tower family: init → save_pytree →
load_pytree → forward must reproduce the original forward exactly (the
native npz format is the serving artifact — any structural loss corrupts
deployments silently).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clip_embedder_tpu.weights import load_pytree, save_pytree


def _vit():
    from clip_embedder_tpu.models import vit
    from clip_embedder_tpu.models.vit import ViTCfg

    cfg = ViTCfg(image_size=32, patch_size=8, width=64, layers=2, heads=4,
                 mlp_hidden=128, embed_dim=32)
    x = jax.random.uniform(jax.random.key(1), (2, 32, 32, 3))
    return vit.init(jax.random.key(0), cfg), lambda p: vit.apply(p, x, cfg)


def _siglip_vit():
    from clip_embedder_tpu.models import vit
    from clip_embedder_tpu.models.vit import ViTCfg

    cfg = ViTCfg(image_size=32, patch_size=8, width=64, layers=2, heads=4,
                 mlp_hidden=128, embed_dim=64, activation="gelu_tanh",
                 use_class_token=False, use_ln_pre=False, pool="map",
                 use_proj=False, ln_eps=1e-6, pos_embed_cls=False)
    x = jax.random.uniform(jax.random.key(1), (2, 32, 32, 3))
    return vit.init(jax.random.key(0), cfg), lambda p: vit.apply(p, x, cfg)


def _fastvit():
    from clip_embedder_tpu.models import fastvit
    from clip_embedder_tpu.models.fastvit import FastViTCfg

    cfg = FastViTCfg(image_size=64, embed_dim=32, depths=(1, 1, 1, 1),
                     dims=(16, 32, 64, 128), mlp_ratios=(3, 3, 3, 3),
                     mixers=("repmixer",) * 3 + ("attention",),
                     pos_embs=(False, False, False, True), lkc_act=True)
    x = jax.random.uniform(jax.random.key(1), (2, 64, 64, 3))
    return (fastvit.init(jax.random.key(0), cfg),
            lambda p: fastvit.apply(p, x, cfg))


def _resnet():
    from clip_embedder_tpu.models import resnet
    from clip_embedder_tpu.models.resnet import ResNetCfg

    cfg = ResNetCfg(image_size=64, embed_dim=32, layers=(1, 1, 1, 1),
                    width=16, heads=8)
    x = jax.random.uniform(jax.random.key(1), (2, 64, 64, 3))
    return (resnet.init(jax.random.key(0), cfg),
            lambda p: resnet.apply(p, x, cfg))


def _convnext():
    from clip_embedder_tpu.models import convnext
    from clip_embedder_tpu.models.convnext import ConvNeXtCfg

    cfg = ConvNeXtCfg(image_size=64, embed_dim=32, depths=(1, 1, 1, 1),
                      dims=(16, 32, 64, 128))
    x = jax.random.uniform(jax.random.key(1), (2, 64, 64, 3))
    return (convnext.init(jax.random.key(0), cfg),
            lambda p: convnext.apply(p, x, cfg))


def _eva02():
    from clip_embedder_tpu.models import eva02
    from clip_embedder_tpu.models.eva02 import Eva02Cfg

    cfg = Eva02Cfg(image_size=32, patch_size=8, width=64, layers=2, heads=4,
                   mlp_hidden=96, embed_dim=32)
    x = jax.random.uniform(jax.random.key(1), (2, 32, 32, 3))
    return (eva02.init(jax.random.key(0), cfg),
            lambda p: eva02.apply(p, x, cfg))


def _text():
    from clip_embedder_tpu.models import text_transformer
    from clip_embedder_tpu.models.text_transformer import TextCfgResolved

    cfg = TextCfgResolved(context_length=12, vocab_size=128, width=64,
                          heads=4, layers=2, mlp_hidden=128, embed_dim=32)
    ids = jax.random.randint(jax.random.key(1), (2, 12), 1, 127)
    return (text_transformer.init(jax.random.key(0), cfg),
            lambda p: text_transformer.apply(p, ids, cfg))


def _bert():
    from clip_embedder_tpu.models import hf_text
    from clip_embedder_tpu.models.hf_text import BertCfg

    cfg = BertCfg(context_length=12, vocab_size=128, width=64, heads=4,
                  layers=2, mlp_hidden=128, embed_dim=32)
    ids = jax.random.randint(jax.random.key(1), (2, 12), 1, 127)
    return (hf_text.init(jax.random.key(0), cfg),
            lambda p: hf_text.apply(p, ids, cfg))


FAMILIES = {
    "vit": _vit, "siglip_vit": _siglip_vit, "fastvit": _fastvit,
    "resnet": _resnet, "convnext": _convnext, "eva02": _eva02,
    "text": _text, "bert": _bert,
}


@pytest.mark.parametrize("family", list(FAMILIES), ids=list(FAMILIES))
def test_roundtrip_preserves_forward(family, tmp_path):
    params, forward = FAMILIES[family]()
    expect = np.asarray(forward(params))

    path = tmp_path / "weights.npz"
    save_pytree(path, params)
    loaded = load_pytree(path)

    # structural equality (incl. restored list structure)
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(loaded)
    got = np.asarray(forward(loaded))
    np.testing.assert_array_equal(got, expect)
