"""Chunked SigLIP ring loss ≡ dense sigmoid loss — value and gradient.

The dense ``siglip_loss`` materializes the global [B, B] logit matrix on
every chip; ``siglip_ring_loss`` rotates text shards around the data-axis
ring (shard_map + ppermute) so only [b, b] blocks ever exist. These tests
prove the two are the same function of the embeddings, including under a
TP ('data','model') mesh and inside the sharded train step.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from clip_embedder_tpu.models.text_transformer import TextCfgResolved
from clip_embedder_tpu.models.vit import ViTCfg
from clip_embedder_tpu.parallel.mesh import get_mesh
from clip_embedder_tpu.train import (
    TrainConfig,
    init_train_state,
    make_sharded_train_step,
    siglip_loss,
    siglip_ring_loss,
)


def _embs(key, b, d):
    k1, k2 = jax.random.split(key)
    img = jax.random.normal(k1, (b, d), jnp.float32)
    txt = jax.random.normal(k2, (b, d), jnp.float32)
    img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
    txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
    return img, txt


@pytest.mark.parametrize("model_parallel", [1, 2])
def test_ring_loss_matches_dense(model_parallel):
    mesh = get_mesh(model_parallel=model_parallel)
    b, d = 8 * mesh.shape["data"], 16
    img, txt = _embs(jax.random.key(0), b, d)
    scale = jnp.asarray(10.0)
    bias = jnp.asarray(-10.0)

    dense = siglip_loss(img, txt, scale, bias)
    sharding = NamedSharding(mesh, P("data"))
    ring = jax.jit(
        lambda i, t: siglip_ring_loss(i, t, scale, bias, mesh=mesh)
    )(jax.device_put(img, sharding), jax.device_put(txt, sharding))
    np.testing.assert_allclose(float(ring), float(dense), rtol=1e-5)


def test_ring_loss_gradients_match_dense():
    mesh = get_mesh()
    b, d = 4 * mesh.shape["data"], 8
    img, txt = _embs(jax.random.key(1), b, d)
    scale = jnp.asarray(5.0)
    bias = jnp.asarray(-2.0)

    g_dense = jax.grad(
        lambda i, t, s, bb: siglip_loss(i, t, s, bb), argnums=(0, 1, 2, 3)
    )(img, txt, scale, bias)
    sharding = NamedSharding(mesh, P("data"))
    g_ring = jax.jit(jax.grad(
        lambda i, t, s, bb: siglip_ring_loss(i, t, s, bb, mesh=mesh),
        argnums=(0, 1, 2, 3),
    ))(jax.device_put(img, sharding), jax.device_put(txt, sharding),
       scale, bias)
    for gd, gr in zip(g_dense, g_ring):
        np.testing.assert_allclose(np.asarray(gr), np.asarray(gd),
                                   rtol=2e-5, atol=1e-7)


def _tiny_cfg(**kw):
    return TrainConfig(
        vision_cfg=ViTCfg(image_size=16, patch_size=8, width=32, layers=1,
                          heads=2, mlp_hidden=64, embed_dim=16),
        text_cfg=TextCfgResolved(context_length=8, vocab_size=64, width=32,
                                 heads=2, layers=1, mlp_hidden=64,
                                 embed_dim=16),
        loss="siglip",
        **kw,
    )


def test_sharded_train_step_with_ring_loss_matches_dense():
    """One sharded train step with ring_loss=True produces the same loss
    and updated params as the dense GSPMD siglip path."""
    mesh = get_mesh()
    batch_size = mesh.shape["data"] * 2
    batch = {
        "pixels": jax.random.uniform(
            jax.random.key(2), (batch_size, 16, 16, 3), jnp.float32),
        "input_ids": jax.random.randint(
            jax.random.key(3), (batch_size, 8), 0, 64),
    }

    losses = []
    for ring in (False, True):
        cfg = _tiny_cfg(ring_loss=ring)
        params, _ = init_train_state(jax.random.key(0), cfg)
        step, params, opt_state = make_sharded_train_step(cfg, mesh, params)
        p, _, loss = step(params, opt_state, batch)
        jax.block_until_ready(p)
        assert np.isfinite(float(loss))
        losses.append(float(loss))
    # loss parity dense-vs-ring; per-param update parity is NOT asserted:
    # adamw's first step is ≈ lr·sign(g), so float-order noise in near-zero
    # gradients flips whole updates (gradient parity has its own test above)
    np.testing.assert_allclose(losses[1], losses[0], rtol=1e-5)


def test_ring_loss_requires_siglip():
    cfg = _tiny_cfg(ring_loss=True)
    cfg = type(cfg)(**{**cfg.__dict__, "loss": "clip"})
    mesh = get_mesh()
    params, _ = init_train_state(jax.random.key(0), cfg)
    with pytest.raises(ValueError, match="ring_loss"):
        step, params, opt_state = make_sharded_train_step(cfg, mesh, params)
        batch = {
            "pixels": jnp.zeros((mesh.shape["data"], 16, 16, 3)),
            "input_ids": jnp.zeros((mesh.shape["data"], 8), jnp.int32),
        }
        step(params, opt_state, batch)
