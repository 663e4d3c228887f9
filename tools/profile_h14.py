"""Component-level profile of the DFN5B ViT-H/14-378 vision step on TPU.

H14 under int8_all delivers ~182 effective TF/s vs gopt's ~255 on the same
kernels (BENCH_RESULTS per-model suite) — this tool breaks the per-layer
cost into the fused kernels at H14 shapes (W=1280, 16 heads x 80, S=730,
MLP 5120, quick_gelu) to find which component sits off its floor.

Usage: python tools/profile_h14.py  (env: PROF_BATCH, PROF_ITERS)
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

W, HEADS, HD, S, MLP = 1280, 16, 80, 730, 5120


def main() -> None:
    import jax
    import jax.numpy as jnp

    from clip_embedder_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()

    from clip_embedder_tpu.ops import int8_mlp
    from clip_embedder_tpu.ops.flash import flash_attention_packed
    from clip_embedder_tpu.ops.qkv import ln_qkv_int8
    from clip_embedder_tpu.ops.quant import quantize_weight

    def quantize_linear(p):
        q = quantize_weight(p["w"])
        q["b"] = p["b"]
        return q

    batch = int(os.environ.get("PROF_BATCH", "8"))
    iters = int(os.environ.get("PROF_ITERS", "30"))

    from benches.timing import chained_timer

    def timed(label, fn, *args, it=iters, flops=None):
        once = chained_timer(fn, *args, iters=it)
        dt = min(once() for _ in range(3))
        eff = f"  ({flops / dt / 1e12:.0f} TF/s-equiv)" if flops else ""
        print(f"{label:44s} {dt * 1e3:7.3f} ms{eff}", flush=True)
        return dt

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, S, W)), jnp.bfloat16)

    # --- fused int8 MLP at H14 shapes (quick_gelu, 13.1 MB resident) ---
    fc = quantize_linear({"w": rng.standard_normal((W, MLP)).astype(np.float32),
                          "b": np.zeros(MLP, np.float32)})
    pr = quantize_linear({"w": rng.standard_normal((MLP, W)).astype(np.float32),
                          "b": np.zeros(W, np.float32)})
    params = jax.tree.map(jnp.asarray, {"fc": fc, "proj": pr})
    ln = {"scale": jnp.ones((W,), jnp.float32),
          "bias": jnp.zeros((W,), jnp.float32)}
    mlp_flops = 2 * batch * S * W * MLP * 2
    assert int8_mlp.fits_fused_mlp(params, "quick_gelu")
    timed("fused int8 MLP (quick_gelu, auto chunks)",
          lambda xx: int8_mlp.int8_mlp(params, xx, activation="quick_gelu",
                                       pre_ln=ln),
          x, flops=mlp_flops)
    for chunks in (1, 2, 4, 16):
        timed(f"fused int8 MLP hidden-chunked x{chunks}",
              lambda xx, c=chunks: int8_mlp.int8_mlp(
                  params, xx, activation="quick_gelu", pre_ln=ln, chunks=c),
              x, flops=mlp_flops)

    # SO400M reference point on this chip for calibration
    W2, MLP2, S2 = 1152, 4304, 577
    x2 = jnp.asarray(rng.standard_normal((batch, S2, W2)), jnp.bfloat16)
    fc2 = quantize_linear({"w": rng.standard_normal((W2, MLP2)).astype(np.float32),
                           "b": np.zeros(MLP2, np.float32)})
    pr2 = quantize_linear({"w": rng.standard_normal((MLP2, W2)).astype(np.float32),
                           "b": np.zeros(W2, np.float32)})
    p2 = jax.tree.map(jnp.asarray, {"fc": fc2, "proj": pr2})
    ln2 = {"scale": jnp.ones((W2,), jnp.float32),
           "bias": jnp.zeros((W2,), jnp.float32)}
    timed("fused int8 MLP @SO400M shapes (gelu_tanh)",
          lambda xx: int8_mlp.int8_mlp(p2, xx, activation="gelu_tanh",
                                       pre_ln=ln2),
          x2, flops=2 * batch * S2 * W2 * MLP2 * 2)

    # --- fused int8 LN+qkv at W=1280 ---
    qkv = {}
    for name in ("q", "k", "v"):
        qkv[name] = jax.tree.map(jnp.asarray, quantize_linear(
            {"w": rng.standard_normal((W, W)).astype(np.float32),
             "b": np.zeros(W, np.float32)}))
    timed("fused int8 ln_qkv (W=1280)",
          lambda xx: ln_qkv_int8(qkv, ln, xx)[0],
          x, flops=3 * 2 * batch * S * W * W)

    # --- packed attention at S=730, 16 x 80 ---
    q = jnp.asarray(rng.standard_normal((batch, S, HEADS * HD)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((batch, S, HEADS * HD)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((batch, S, HEADS * HD)), jnp.bfloat16)
    attn_flops = 2 * 2 * batch * S * S * HEADS * HD
    timed("packed attention (S=730, 16x80)",
          lambda qq: flash_attention_packed(qq, k, v, num_heads=HEADS,
                                            fast_softmax=True),
          q, flops=attn_flops)
    # padded-to-96 comparison: is head_dim 80's lane misalignment the cost?
    q96 = jnp.asarray(rng.standard_normal((batch, S, HEADS * 96)), jnp.bfloat16)
    k96 = jnp.asarray(rng.standard_normal((batch, S, HEADS * 96)), jnp.bfloat16)
    v96 = jnp.asarray(rng.standard_normal((batch, S, HEADS * 96)), jnp.bfloat16)
    timed("packed attention (S=730, 16x96)",
          lambda qq: flash_attention_packed(qq, k96, v96, num_heads=HEADS,
                                            fast_softmax=True),
          q96, flops=2 * 2 * batch * S * S * HEADS * 96)
    # S=577 point (SO400M length) at H14 head layout
    q5 = jnp.asarray(rng.standard_normal((batch, 577, HEADS * HD)), jnp.bfloat16)
    k5 = jnp.asarray(rng.standard_normal((batch, 577, HEADS * HD)), jnp.bfloat16)
    v5 = jnp.asarray(rng.standard_normal((batch, 577, HEADS * HD)), jnp.bfloat16)
    timed("packed attention (S=577, 16x80)",
          lambda qq: flash_attention_packed(qq, k5, v5, num_heads=HEADS,
                                            fast_softmax=True),
          q5, flops=2 * 2 * batch * 577 * 577 * HEADS * HD)

    # --- int8 out-projection with fused residual ---
    out = jax.tree.map(jnp.asarray, quantize_linear(
        {"w": rng.standard_normal((W, W)).astype(np.float32),
         "b": np.zeros(W, np.float32)}))
    timed("int8 out-proj + residual (W=1280)",
          lambda xx: int8_mlp.int8_linear_fused(out, xx, residual=xx),
          x, flops=2 * batch * S * W * W)


if __name__ == "__main__":
    main()
