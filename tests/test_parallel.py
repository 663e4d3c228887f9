"""Mesh/sharding tests on the 8-virtual-device CPU backend.

Covers the scale-out layer the reference lacks (SURVEY.md §2 parallelism
statement): data-parallel bulk embedding must be numerically consistent
with single-device embedding, tensor-parallel forward must match the
replicated forward, and the sharded train step must run under DP×TP.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from clip_embedder_tpu.models import text_transformer, vit
from clip_embedder_tpu.models.text_transformer import TextCfgResolved
from clip_embedder_tpu.models.vit import ViTCfg
from clip_embedder_tpu.parallel.mesh import get_mesh, replicate
from clip_embedder_tpu.parallel.sharding import tp_param_specs

VCFG = ViTCfg(image_size=32, patch_size=8, width=64, layers=2, heads=4,
              mlp_hidden=128, embed_dim=32)
TCFG = TextCfgResolved(context_length=16, vocab_size=128, width=64, heads=4,
                       layers=2, mlp_hidden=128, embed_dim=32)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    return get_mesh(model_parallel=2)  # 4 × 2 ('data', 'model')


def test_mesh_shape(mesh):
    assert dict(mesh.shape) == {"data": 4, "model": 2}


def test_data_parallel_embed_matches_single(mesh):
    params = vit.init(jax.random.key(0), VCFG)
    x = jax.random.uniform(jax.random.key(1), (8, 32, 32, 3))

    expect = vit.apply(params, x, VCFG)

    p_repl = replicate(params, mesh)
    x_sh = jax.device_put(x, NamedSharding(mesh, P("data")))
    fn = jax.jit(
        lambda p, x: vit.apply(p, x, VCFG),
        in_shardings=(NamedSharding(mesh, P()), NamedSharding(mesh, P("data"))),
        out_shardings=NamedSharding(mesh, P("data")),
    )
    got = fn(p_repl, x_sh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect), atol=2e-5)


def test_tensor_parallel_vit_matches_replicated(mesh):
    params = vit.init(jax.random.key(2), VCFG)
    x = jax.random.uniform(jax.random.key(3), (4, 32, 32, 3))
    expect = vit.apply(params, x, VCFG)

    specs = tp_param_specs(params, tower="vit")
    shardings = jax.tree.map(
        lambda s: NamedSharding(mesh, s), specs,
        is_leaf=lambda s: isinstance(s, P),
    )
    p_tp = jax.device_put(params, shardings)
    fn = jax.jit(
        lambda p, x: vit.apply(p, x, VCFG),
        in_shardings=(shardings, NamedSharding(mesh, P("data"))),
        out_shardings=NamedSharding(mesh, P("data")),
    )
    got = fn(p_tp, jax.device_put(x, NamedSharding(mesh, P("data"))))
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect), atol=2e-5)


def test_tensor_parallel_text_matches_replicated(mesh):
    params = text_transformer.init(jax.random.key(4), TCFG)
    ids = jax.random.randint(jax.random.key(5), (4, 16), 1, 127)
    expect = text_transformer.apply(params, ids, TCFG)

    specs = tp_param_specs(params, tower="text")
    shardings = jax.tree.map(
        lambda s: NamedSharding(mesh, s), specs,
        is_leaf=lambda s: isinstance(s, P),
    )
    p_tp = jax.device_put(params, shardings)
    fn = jax.jit(
        lambda p, i: text_transformer.apply(p, i, TCFG),
        in_shardings=(shardings, NamedSharding(mesh, P("data"))),
        out_shardings=NamedSharding(mesh, P("data")),
    )
    got = fn(p_tp, jax.device_put(ids, NamedSharding(mesh, P("data"))))
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect), atol=2e-5)


@pytest.mark.parametrize("loss", ["clip", "siglip"])
def test_sharded_train_step_runs_and_descends(mesh, loss):
    from clip_embedder_tpu.train import (
        TrainConfig, init_train_state, make_sharded_train_step,
    )

    cfg = TrainConfig(vision_cfg=VCFG, text_cfg=TCFG, loss=loss,
                      tensor_parallel=True, learning_rate=1e-3)
    params, _ = init_train_state(jax.random.key(0), cfg)
    step, params, opt_state = make_sharded_train_step(cfg, mesh, params)

    rng = np.random.default_rng(0)
    batch = {
        "pixels": jax.device_put(
            jnp.asarray(rng.standard_normal((8, 32, 32, 3)), jnp.float32),
            NamedSharding(mesh, P("data"))),
        "input_ids": jax.device_put(
            jnp.asarray(rng.integers(1, 127, (8, 16)), jnp.int32),
            NamedSharding(mesh, P("data"))),
    }
    losses = []
    for _ in range(3):
        params, opt_state, l = step(params, opt_state, batch)
        losses.append(float(l))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]  # optimizing the same batch must descend


def test_sharded_bulk_embedders(mesh):
    """ShardedVisionEmbedder / ShardedTextEmbedder wrap the public embedders
    for mesh execution and must agree with the single-device path."""
    import json

    from clip_embedder_tpu import Clip
    from clip_embedder_tpu.parallel import ShardedTextEmbedder, ShardedVisionEmbedder
    from test_clip_e2e import MODEL_CONFIG, OPEN_CLIP_CONFIG
    from test_tokenizer import make_clip_style_spec
    from clip_embedder_tpu.config import OpenClipConfig
    from clip_embedder_tpu.models.build import resolve_text, resolve_vision
    from clip_embedder_tpu.weights import save_pytree
    import tempfile
    from pathlib import Path

    d = Path(tempfile.mkdtemp())
    (d / "open_clip_config.json").write_text(json.dumps(OPEN_CLIP_CONFIG))
    (d / "model_config.json").write_text(json.dumps(MODEL_CONFIG))
    (d / "tokenizer.json").write_text(json.dumps(make_clip_style_spec()))
    cfg = OpenClipConfig.from_dict(OPEN_CLIP_CONFIG)
    save_pytree(d / "visual.npz", vit.init(jax.random.key(0),
                                           resolve_vision(cfg.model_cfg).cfg))
    save_pytree(d / "text.npz", text_transformer.init(jax.random.key(1),
                                                      resolve_text(cfg.model_cfg).cfg))
    clip = Clip.from_local_dir(d)

    rng = np.random.default_rng(1)
    images = [rng.integers(0, 255, size=(40 + i, 50, 3), dtype=np.uint8)
              for i in range(5)]  # 5 → padded to 8 on the data axis
    sharded_v = ShardedVisionEmbedder(clip.vision, mesh)
    got = sharded_v.embed_images(images)
    expect = clip.vision.embed_images(images)
    assert got.shape == expect.shape
    cos = np.sum(got * expect, axis=-1)
    assert (cos > 1 - 1e-5).all()

    texts = ["a cat", "a dog", "the photo of a beignet"]
    sharded_t = ShardedTextEmbedder(clip.text, mesh)
    got_t = sharded_t.embed_texts(texts)
    expect_t = clip.text.embed_texts(texts)
    cos_t = np.sum(got_t * expect_t, axis=-1)
    assert (cos_t > 1 - 1e-5).all()


def test_sharded_bulk_embed_quantized_dp(mesh):
    """The production throughput configuration (int8_all) composes with
    DP mesh serving: quantized params replicate, the per-shard forward
    runs the int8 path, and the result matches the single-device
    quantized embedder exactly (same program, sharded batch)."""
    from test_concurrency import make_model_dir

    from clip_embedder_tpu import Clip
    from clip_embedder_tpu.parallel import ShardedVisionEmbedder

    d = make_model_dir()
    clip_q = Clip.from_local_dir(d, quantize="int8_all")
    assert clip_q.vision.quantize == "int8_all"
    rng = np.random.default_rng(2)
    images = [rng.integers(0, 255, size=(40 + i, 50, 3), dtype=np.uint8)
              for i in range(6)]
    sharded = ShardedVisionEmbedder(clip_q.vision, mesh)
    got = sharded.embed_images(images)
    expect = clip_q.vision.embed_images(images)
    cos = np.sum(got * expect, axis=-1)
    assert (cos > 1 - 1e-5).all()

    # and TP stays rejected for quantized params (the documented contract)
    from clip_embedder_tpu.errors import ConfigError

    with pytest.raises(ConfigError, match="tensor_parallel"):
        ShardedVisionEmbedder(clip_q.vision, mesh, tensor_parallel=True)


def test_embed_pipeline_order_and_values(mesh):
    """EmbedPipeline must match direct embedding, preserve order, and
    handle a ragged final batch."""
    from clip_embedder_tpu.parallel.pipeline import EmbedPipeline
    from test_concurrency import make_model_dir
    from clip_embedder_tpu import Clip

    clip = Clip.from_local_dir(make_model_dir())
    rng = np.random.default_rng(7)
    images = [rng.integers(0, 255, (36 + i % 3, 44, 3), dtype=np.uint8)
              for i in range(11)]

    pipe = EmbedPipeline(clip.vision, batch_size=4, prefetch=2)
    got = pipe.embed_all(images)
    assert got.shape[0] == 11
    expect = clip.vision.embed_images(images)
    cos = np.sum(got * expect, axis=-1)
    assert (cos > 1 - 1e-5).all()


def test_remat_train_step_matches_no_remat(mesh):
    """jax.checkpoint rematerialization must not change the loss."""
    from clip_embedder_tpu.train import (
        TrainConfig, init_train_state, make_sharded_train_step,
    )

    rng = np.random.default_rng(3)
    batch = {
        "pixels": jax.device_put(
            jnp.asarray(rng.standard_normal((8, 32, 32, 3)), jnp.float32),
            NamedSharding(mesh, P("data"))),
        "input_ids": jax.device_put(
            jnp.asarray(rng.integers(1, 127, (8, 16)), jnp.int32),
            NamedSharding(mesh, P("data"))),
    }
    losses = {}
    for remat in (False, True):
        cfg = TrainConfig(vision_cfg=VCFG, text_cfg=TCFG, remat=remat)
        params, _ = init_train_state(jax.random.key(0), cfg)
        step, params, opt_state = make_sharded_train_step(cfg, mesh, params)
        _, _, loss = step(params, opt_state, batch)
        losses[remat] = float(loss)
    assert abs(losses[False] - losses[True]) < 1e-5


def test_pipeline_over_sharded_embedder(mesh):
    """EmbedPipeline composed with ShardedVisionEmbedder — the full bulk
    indexing stack (decode overlap + mesh sharding)."""
    from clip_embedder_tpu.parallel import ShardedVisionEmbedder
    from clip_embedder_tpu.parallel.pipeline import EmbedPipeline
    from test_concurrency import make_model_dir
    from clip_embedder_tpu import Clip

    clip = Clip.from_local_dir(make_model_dir())
    sharded = ShardedVisionEmbedder(clip.vision, mesh)
    rng = np.random.default_rng(11)
    images = [rng.integers(0, 255, (40, 40 + i % 5, 3), dtype=np.uint8)
              for i in range(10)]
    pipe = EmbedPipeline(sharded, batch_size=4, prefetch=2)
    got = pipe.embed_all(images)
    expect = clip.vision.embed_images(images)
    assert got.shape == expect.shape
    cos = np.sum(got * expect, axis=-1)
    assert (cos > 1 - 1e-5).all()


def test_fsdp_train_step_matches_dp(mesh):
    """FSDP (ZeRO-3 param sharding over 'data') must produce the same loss
    as plain DP, with params actually sharded."""
    from clip_embedder_tpu.train import (
        TrainConfig, init_train_state, make_sharded_train_step,
    )

    rng = np.random.default_rng(5)
    batch = {
        "pixels": jax.device_put(
            jnp.asarray(rng.standard_normal((8, 32, 32, 3)), jnp.float32),
            NamedSharding(mesh, P("data"))),
        "input_ids": jax.device_put(
            jnp.asarray(rng.integers(1, 127, (8, 16)), jnp.int32),
            NamedSharding(mesh, P("data"))),
    }
    losses = {}
    for fsdp in (False, True):
        cfg = TrainConfig(vision_cfg=VCFG, text_cfg=TCFG, fsdp=fsdp)
        params, _ = init_train_state(jax.random.key(0), cfg)
        step, params, opt_state = make_sharded_train_step(cfg, mesh, params)
        if fsdp:
            # a large matrix param must actually be sharded over 'data'
            fc = params["visual"]["blocks"]["mlp"]["fc"]["w"]
            assert "data" in str(fc.sharding.spec)
        _, _, loss = step(params, opt_state, batch)
        losses[fsdp] = float(loss)
    assert abs(losses[False] - losses[True]) < 1e-5


def test_fsdp_and_tp_mutually_exclusive(mesh):
    from clip_embedder_tpu.train import (
        TrainConfig, init_train_state, make_sharded_train_step,
    )

    cfg = TrainConfig(vision_cfg=VCFG, text_cfg=TCFG, fsdp=True,
                      tensor_parallel=True)
    params, _ = init_train_state(jax.random.key(0), cfg)
    with pytest.raises(ValueError):
        make_sharded_train_step(cfg, mesh, params)


def test_pipeline_propagates_decode_errors(mesh):
    """A bad input inside a stream must surface as ImageError, not hang."""
    from clip_embedder_tpu.errors import ClipError
    from clip_embedder_tpu.parallel.pipeline import EmbedPipeline
    from test_concurrency import make_model_dir
    from clip_embedder_tpu import Clip

    clip = Clip.from_local_dir(make_model_dir())
    rng = np.random.default_rng(0)
    images = [rng.integers(0, 255, (32, 32, 3), dtype=np.uint8),
              object(),  # undecodable
              rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)]
    pipe = EmbedPipeline(clip.vision, batch_size=2)
    with pytest.raises(ClipError):
        pipe.embed_all(images)


def test_pipeline_yields_completed_batches_before_error(mesh):
    """A failed batch must not swallow earlier batches already in flight
    on the device — the iterator yields every completed batch, then
    raises (parity with the old synchronous loop)."""
    from clip_embedder_tpu.errors import ClipError
    from clip_embedder_tpu.parallel.pipeline import EmbedPipeline
    from test_concurrency import make_model_dir
    from clip_embedder_tpu import Clip

    clip = Clip.from_local_dir(make_model_dir())
    rng = np.random.default_rng(1)
    good = [rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
            for _ in range(4)]
    images = good + [object()]  # batches: [g,g], [g,g], [bad]
    pipe = EmbedPipeline(clip.vision, batch_size=2)
    got = []
    with pytest.raises(ClipError):
        for block in pipe.embed_iter(images):
            got.append(block)
    assert sum(b.shape[0] for b in got) == 4


def test_eva02_packed_ineligible_pallas_uses_padded_kernel():
    """attn_impl='pallas' on a packed-ineligible eva02 head layout must
    route through the padded per-head kernel (attention_core impl
    passthrough), matching xla numerics — never a silent xla switch."""
    import functools

    from clip_embedder_tpu.models import eva02
    from clip_embedder_tpu.models.eva02 import Eva02Cfg
    from clip_embedder_tpu.ops import flash as flash_mod

    # heads=4, d=16 → _head_group None (no 128-lane grouping)
    cfg = Eva02Cfg(image_size=32, patch_size=8, width=64, layers=1,
                   heads=4, mlp_hidden=96, embed_dim=32)
    params = eva02.init(jax.random.key(6), cfg)
    x = jax.random.normal(jax.random.key(7), (2, 32, 32, 3), jnp.float32)

    calls = []
    orig = flash_mod.flash_attention

    def spy(*a, **kw):
        calls.append(1)
        return orig(*a, **kw, interpret=True)

    flash_mod.flash_attention = spy
    try:
        a = np.asarray(eva02.apply(params, x, cfg, attn_impl="xla"))
        assert not calls
        b = np.asarray(eva02.apply(params, x, cfg, attn_impl="pallas"))
        assert calls  # the padded kernel actually ran
    finally:
        flash_mod.flash_attention = orig
    np.testing.assert_allclose(a, b, atol=2e-5)


def test_sharded_text_embedder_passes_mask(mesh, tmp_path):
    """Sharded ≡ single-device for an hf_bert tower whose tokenizer pad id
    differs from hf_config.pad_token_id (VERDICT r2 weak #3: the sharded
    path dropped the mask, letting the tower re-derive it from cfg.pad_id
    and silently mis-mask BiomedCLIP-class text)."""
    import json

    from clip_embedder_tpu import TextEmbedder
    from clip_embedder_tpu.config import OpenClipConfig
    from clip_embedder_tpu.models import hf_text
    from clip_embedder_tpu.models.build import resolve_text
    from clip_embedder_tpu.parallel import ShardedTextEmbedder
    from clip_embedder_tpu.weights import save_pytree
    from test_tokenizer import make_clip_style_spec

    spec_json = make_clip_style_spec()
    eot_id = next(t["id"] for t in spec_json["added_tokens"]
                  if t["content"] == "<|endoftext|>")
    open_clip_config = {
        "model_cfg": {
            "embed_dim": 32,
            "vision_cfg": {"image_size": 32, "layers": 2, "width": 64,
                           "patch_size": 8},
            "text_cfg": {
                "context_length": 16,
                "hf_model_name": "some/bert",
                "hf_tokenizer_name": "some/bert",
                "pooler_type": "mean_pooler",
                "proj_type": "linear",
                # hf pad_token_id=0 ≠ the tokenizer's resolved pad id (eot):
                # deriving the mask from cfg.pad_id attends the padding
                "hf_config": {"vocab_size": 128, "hidden_size": 32,
                              "num_attention_heads": 2,
                              "num_hidden_layers": 2,
                              "intermediate_size": 64, "pad_token_id": 0},
            },
        },
        "preprocess_cfg": {"mean": [0.5] * 3, "std": [0.5] * 3},
    }
    model_config = {"tokenizer_needs_lowercase": False,
                    "activation_function": "softmax", "logit_scale": 10.0,
                    "logit_bias": 0.0, "pad_id": eot_id}
    d = tmp_path / "biomed_like"
    d.mkdir()
    (d / "open_clip_config.json").write_text(json.dumps(open_clip_config))
    (d / "model_config.json").write_text(json.dumps(model_config))
    (d / "tokenizer.json").write_text(json.dumps(spec_json))
    cfg = OpenClipConfig.from_dict(open_clip_config)
    tspec = resolve_text(cfg.model_cfg)
    assert tspec.family == "hf_bert"
    save_pytree(d / "text.npz", hf_text.init(jax.random.key(8), tspec.cfg))
    save_pytree(d / "visual.npz",
                vit.init(jax.random.key(9),
                         __import__("clip_embedder_tpu.models.build",
                                    fromlist=["resolve_vision"])
                         .resolve_vision(cfg.model_cfg).cfg))

    emb = TextEmbedder.from_local_dir(d)
    assert emb.pad_id == eot_id != tspec.cfg.pad_id
    texts = ["a cat", "a photo of a dog", "the beignet"]
    expect = emb.embed_texts(texts)
    # mis-masking must actually change this tower's output, or the test
    # proves nothing: mean pooling over eot-padded rows diverges
    ids, mask = emb.tokenize(texts)
    from clip_embedder_tpu.text import _jitted_text_forward
    wrong = np.asarray(_jitted_text_forward(emb.spec, emb.attn_impl)(
        emb.params, jnp.asarray(ids), None).astype(jnp.float32))
    assert (np.abs(wrong - expect) > 1e-4).any()

    got = ShardedTextEmbedder(emb, mesh).embed_texts(texts)
    np.testing.assert_allclose(got, expect, atol=2e-5)


def test_tensor_parallel_coca_towers_match_replicated(mesh):
    """TP specs cover the CoCa pooler layout ({query, ln_q, ln_k, attn} —
    not the MAP pool's {probe, attn, ln, mlp}) and the embed_cls text
    params; both towers must match the replicated forward under TP."""
    vcfg = ViTCfg(image_size=32, patch_size=8, width=64, layers=2, heads=4,
                  mlp_hidden=128, embed_dim=32, pool="attn",
                  attn_pool_queries=8, attn_pool_dim=32, pool_heads=4)
    params = vit.init(jax.random.key(8), vcfg)
    x = jax.random.uniform(jax.random.key(9), (4, 32, 32, 3))
    expect = vit.apply(params, x, vcfg)
    specs = tp_param_specs(params, tower="vit")
    shardings = jax.tree.map(
        lambda s: NamedSharding(mesh, s), specs,
        is_leaf=lambda s: isinstance(s, P),
    )
    fn = jax.jit(
        lambda p, xx: vit.apply(p, xx, vcfg),
        in_shardings=(shardings, NamedSharding(mesh, P("data"))),
        out_shardings=NamedSharding(mesh, P("data")),
    )
    got = fn(jax.device_put(params, shardings),
             jax.device_put(x, NamedSharding(mesh, P("data"))))
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               atol=2e-5)

    tcfg = TextCfgResolved(context_length=16, vocab_size=128, width=64,
                           heads=4, layers=2, mlp_hidden=128, embed_dim=32,
                           pool="last", embed_cls=True)
    tparams = text_transformer.init(jax.random.key(10), tcfg)
    ids = jax.random.randint(jax.random.key(11), (4, 16), 1, 127)
    t_expect = text_transformer.apply(tparams, ids, tcfg)
    t_specs = tp_param_specs(tparams, tower="text")
    t_shardings = jax.tree.map(
        lambda s: NamedSharding(mesh, s), t_specs,
        is_leaf=lambda s: isinstance(s, P),
    )
    t_fn = jax.jit(
        lambda p, i: text_transformer.apply(p, i, tcfg),
        in_shardings=(t_shardings, NamedSharding(mesh, P("data"))),
        out_shardings=NamedSharding(mesh, P("data")),
    )
    t_got = t_fn(jax.device_put(tparams, t_shardings),
                 jax.device_put(ids, NamedSharding(mesh, P("data"))))
    np.testing.assert_allclose(np.asarray(t_got), np.asarray(t_expect),
                               atol=2e-5)


def test_tensor_parallel_overrides_pallas_attn(mesh):
    """tensor_parallel + a Pallas attn_impl (what attn_impl="auto" resolves
    to on TPU) must fall back to the sharding-native XLA core — an opaque
    custom call would force per-layer all-gathers of the model-sharded
    activations (docs/DEPLOYMENT.md)."""
    from clip_embedder_tpu import Clip
    from clip_embedder_tpu.parallel import ShardedVisionEmbedder
    from test_concurrency import make_model_dir

    clip = Clip.from_local_dir(make_model_dir(), attn_impl="pallas")
    assert clip.vision.attn_impl == "pallas"
    tp = ShardedVisionEmbedder(clip.vision, mesh, tensor_parallel=True)
    assert tp.attn_impl == "xla"
    # data-parallel-only keeps the inner embedder's choice
    dp = ShardedVisionEmbedder(clip.vision, mesh)
    assert dp.attn_impl == "pallas"
