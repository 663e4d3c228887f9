"""Component-level profile of the PE-Core-bigG-14-448 vision step on TPU.

PE under int8_all measured only ~1.08× bf16 (26.6 vs 28.6 ms/img,
BENCH_RESULTS.md) while per-kernel A/B at the same shapes shows int8 MLP
1.4× (tools/profile_streamed_mlp.py) — this tool times every layer
component at PE shapes (W=1536, 16 heads × 96, S=1025, MLP 8960, 2-D
axial rope) to find where the expected saving goes.

Usage: python tools/profile_pe.py  (env: PROF_BATCH, PROF_ITERS)
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

W, HEADS, HD, S, MLP = 1536, 16, 96, 1025, 8960


def main() -> None:
    import jax
    import jax.numpy as jnp

    from clip_embedder_tpu.utils.compilation_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()

    from benches.timing import chained_timer
    from clip_embedder_tpu.ops import int8_mlp
    from clip_embedder_tpu.ops.flash import flash_attention_packed
    from clip_embedder_tpu.ops.qkv import (fits_fused_qkv_int8, ln_qkv,
                                           ln_qkv_int8)
    from clip_embedder_tpu.ops.quant import quantize_weight
    from clip_embedder_tpu.ops.rope import axial_rope_table, head_tiled_tables

    batch = int(os.environ.get("PROF_BATCH", "16"))
    iters = int(os.environ.get("PROF_ITERS", "20"))

    def timed(label, fn, *args, it=iters, flops=None):
        once = chained_timer(fn, *args, iters=it)
        dt = min(once() for _ in range(3))
        eff = f"  ({flops / dt / 1e12:.0f} TF/s-equiv)" if flops else ""
        print(f"{label:46s} {dt * 1e3:7.3f} ms{eff}", flush=True)
        return dt

    def qlin(w, b=True):
        q = quantize_weight(w)
        if b:
            q["b"] = np.zeros(w.shape[1], np.float32)
        return q

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, S, W)), jnp.bfloat16)
    ln = {"scale": jnp.ones((W,), jnp.float32),
          "bias": jnp.zeros((W,), jnp.float32)}

    # rope tables exactly as models/vit.py builds them (grid 32x32 + 1
    # unrotated cls/probe-free prefix = S 1025? PE uses no prefix in
    # blocks; table built for the 1024 grid + 1 identity row)
    ang = axial_rope_table(32, HD, 10000.0, prefix=S - 32 * 32)
    rope = head_tiled_tables(ang, HEADS)
    rope = tuple(jnp.asarray(r) for r in rope)

    qkvp = {n: jax.tree.map(jnp.asarray, qlin(
        rng.standard_normal((W, W)).astype(np.float32) * 0.02))
        for n in ("q", "k", "v")}
    assert fits_fused_qkv_int8(qkvp, W)
    bf_qkvp = {n: {"w": jnp.asarray(qkvp[n]["w_q"].astype(np.float32)
                                    * qkvp[n]["w_scale"], jnp.bfloat16),
                   "b": jnp.zeros((W,), jnp.bfloat16)} for n in ("q", "k", "v")}

    t_qkv_i8 = timed("ln_qkv_int8 (fused LN + 3 proj)",
                     lambda xx: ln_qkv_int8(qkvp, ln, xx, eps=1e-6)[0],
                     x, flops=3 * 2 * batch * S * W * W)
    t_qkv_bf = timed("ln_qkv bf16 fused",
                     lambda xx: ln_qkv(bf_qkvp, ln, xx, eps=1e-6)[0],
                     x, flops=3 * 2 * batch * S * W * W)

    q = jnp.asarray(rng.standard_normal((batch, S, W)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((batch, S, W)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((batch, S, W)), jnp.bfloat16)
    attn_flops = 2 * 2 * batch * HEADS * S * S * HD
    t_attn = timed("packed attention + in-kernel rope",
                   lambda qq: flash_attention_packed(
                       qq, k, v, num_heads=HEADS, rope=rope,
                       fast_softmax=True),
                   q, flops=attn_flops)
    t_attn_nr = timed("packed attention (no rope)",
                      lambda qq: flash_attention_packed(
                          qq, k, v, num_heads=HEADS, fast_softmax=True),
                      q, flops=attn_flops)

    outp = jax.tree.map(jnp.asarray, qlin(
        rng.standard_normal((W, W)).astype(np.float32) * 0.02))
    t_out = timed("out-proj int8 fused (+residual)",
                  lambda oo: int8_mlp.int8_linear_fused(outp, oo, residual=x),
                  q, flops=2 * batch * S * W * W)

    fc = qlin(rng.standard_normal((W, MLP)).astype(np.float32) * 0.02)
    pr = qlin(rng.standard_normal((MLP, W)).astype(np.float32) * 0.02)
    mparams = jax.tree.map(jnp.asarray, {"fc": fc, "proj": pr})
    mlp_flops = 2 * batch * S * W * MLP * 2

    from clip_embedder_tpu.ops.layers import mlp as mlp_dispatch

    from clip_embedder_tpu.ops.layers import ACTIVATIONS

    t_mlp = timed("MLP int8 via mlp() dispatch",
                  lambda xx: mlp_dispatch(
                      mparams, xx, activation=ACTIVATIONS["gelu_tanh"],
                      pre_ln=ln, residual=True),
                  x, flops=mlp_flops)

    per_layer = t_qkv_i8 + t_attn + t_out + t_mlp
    print(f"\nint8_all per-layer total: {per_layer * 1e3:.3f} ms "
          f"-> x50 = {per_layer * 50 / batch * 1e3:.2f} ms/img")


if __name__ == "__main__":
    main()
