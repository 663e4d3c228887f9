"""A/B numerics: the fused Pallas attention kernel vs the XLA path
(the per-kernel landing gate of SURVEY.md §7 layer 7). Runs in interpreter
mode on the CPU backend; the same kernel compiles for TPU via Mosaic.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clip_embedder_tpu.ops.attention import attention_core, causal_mask
from clip_embedder_tpu.ops.flash import flash_attention


@pytest.mark.parametrize(
    "b,h,s,d",
    [
        (2, 4, 64, 32),    # text-tower-like, d needs padding to 128
        (1, 2, 77, 64),    # CLIP context length (odd, needs seq padding)
        (2, 2, 144, 72),   # SO400M-like head_dim 72
    ],
)
def test_flash_matches_xla(b, h, s, d):
    keys = jax.random.split(jax.random.key(0), 3)
    q = jax.random.normal(keys[0], (b, h, s, d), jnp.float32)
    k = jax.random.normal(keys[1], (b, h, s, d), jnp.float32)
    v = jax.random.normal(keys[2], (b, h, s, d), jnp.float32)

    ref = attention_core(q, k, v)
    got = flash_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


def test_flash_causal_matches_xla():
    b, h, s, d = 2, 4, 40, 32
    keys = jax.random.split(jax.random.key(1), 3)
    q = jax.random.normal(keys[0], (b, h, s, d), jnp.float32)
    k = jax.random.normal(keys[1], (b, h, s, d), jnp.float32)
    v = jax.random.normal(keys[2], (b, h, s, d), jnp.float32)
    mask = causal_mask(s)

    ref = attention_core(q, k, v, mask=mask)
    got = flash_attention(q, k, v, mask=mask, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


def test_flash_bf16():
    b, h, s, d = 2, 2, 64, 64
    keys = jax.random.split(jax.random.key(2), 3)
    q = jax.random.normal(keys[0], (b, h, s, d), jnp.bfloat16)
    k = jax.random.normal(keys[1], (b, h, s, d), jnp.bfloat16)
    v = jax.random.normal(keys[2], (b, h, s, d), jnp.bfloat16)

    ref = attention_core(q, k, v)
    got = flash_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        atol=2e-2, rtol=2e-2,
    )


def test_tower_with_pallas_attn_matches_xla_attn():
    """Whole-tower A/B: attn_impl='pallas' vs 'xla'."""
    from clip_embedder_tpu.models import vit
    from clip_embedder_tpu.models.vit import ViTCfg
    from clip_embedder_tpu.ops import flash as flash_mod
    import functools

    # route the tower's pallas path through interpreter mode on CPU
    orig = flash_mod.flash_attention
    flash_mod.flash_attention = functools.partial(orig, interpret=True)
    try:
        cfg = ViTCfg(image_size=32, patch_size=8, width=64, layers=2,
                     heads=4, mlp_hidden=128, embed_dim=32)
        params = vit.init(jax.random.key(3), cfg)
        x = jax.random.uniform(jax.random.key(4), (2, 32, 32, 3))
        a = vit.apply(params, x, cfg, attn_impl="xla")
        b = vit.apply(params, x, cfg, attn_impl="pallas")
        cos = np.sum(np.asarray(a) * np.asarray(b), axis=-1)
        assert (cos > 1 - 1e-6).all()
    finally:
        flash_mod.flash_attention = orig


@pytest.mark.parametrize("d", [72, 128])
def test_flash_fast_softmax_matches_exact(d):
    """fast_softmax (clamped exp, no max pass) must match the exact-max
    softmax for realistic logit magnitudes, for both the spare-lane (d=72)
    and row-sum-fallback (d=128) denominators."""
    k1, k2, k3 = jax.random.split(jax.random.key(0), 3)
    q = jax.random.normal(k1, (2, 3, 40, d))
    k = jax.random.normal(k2, (2, 3, 40, d))
    v = jax.random.normal(k3, (2, 3, 40, d))
    exact = flash_attention(q, k, v, interpret=True)
    fast = flash_attention(q, k, v, fast_softmax=True, interpret=True)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(exact),
                               atol=2e-6)
    ref = attention_core(q, k, v)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref), atol=2e-5)


def test_flash_exact_lane_multiple_head_dim():
    """d an exact lane multiple (no spare lane): denominator falls back to
    the explicit row-sum; numerics must still match the XLA core."""
    k1, k2, k3 = jax.random.split(jax.random.key(1), 3)
    q = jax.random.normal(k1, (1, 2, 16, 128))
    k = jax.random.normal(k2, (1, 2, 16, 128))
    v = jax.random.normal(k3, (1, 2, 16, 128))
    out = flash_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(attention_core(q, k, v)),
                               atol=2e-5)
