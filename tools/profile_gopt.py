"""Component-level profile of the ViT-gopt-16-SigLIP2-384 vision step.

gopt is the reference's slowest model (README.md:108 — 2354 ms/img) and
this framework's thinnest-covered big ViT: W=1536 is excluded from the
fused bf16 ln_qkv (chunked variant measured-and-rejected round 3) and its
18.9 MB int8 MLP weight set is excluded from both the resident fused MLP
("a wash", fits_fused_mlp) and the streamed MLP (loses vs the 320
TF/s-equiv unfused XLA path, fits_streamed_mlp). VERDICT r3 weak #6 asks
for the H14-style decomposition (tools/profile_h14.py pattern): time each
per-layer component at gopt shapes under int8_all, compare the sum
against the measured end-to-end step, and re-measure the excluded fused
variants so every exclusion is a current-number rejection, not a stale
one.

Usage: python tools/profile_gopt.py  (env: PROF_BATCH, PROF_ITERS)
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

W, HEADS, HD, S, MLP = 1536, 16, 96, 577, 6144


def main() -> None:
    import jax
    import jax.numpy as jnp

    from clip_embedder_tpu.utils.compilation_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()

    from clip_embedder_tpu.ops import int8_mlp
    from clip_embedder_tpu.ops.flash import flash_attention_packed
    from clip_embedder_tpu.ops.layers import gelu_tanh, layer_norm, mlp
    from clip_embedder_tpu.ops.qkv import fits_fused_qkv_int8, ln_qkv_int8
    from clip_embedder_tpu.ops.quant import int8_linear, quantize_weight

    def quantize_linear(p):
        q = quantize_weight(p["w"])
        q["b"] = p["b"]
        return q

    batch = int(os.environ.get("PROF_BATCH", "16"))
    iters = int(os.environ.get("PROF_ITERS", "30"))

    from benches.timing import chained_timer

    def timed(label, fn, *args, it=iters, flops=None):
        once = chained_timer(fn, *args, iters=it)
        dt = min(once() for _ in range(3))
        eff = f"  ({flops / dt / 1e12:.0f} TF/s-equiv)" if flops else ""
        print(f"{label:52s} {dt * 1e3:7.3f} ms{eff}", flush=True)
        return dt

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, S, W)), jnp.bfloat16)
    ln = {"scale": jnp.ones((W,), jnp.float32),
          "bias": jnp.zeros((W,), jnp.float32)}

    total = 0.0

    # --- MLP: production unfused XLA W8A8 vs the excluded fused variants ---
    fc = quantize_linear({"w": rng.standard_normal((W, MLP)).astype(np.float32),
                          "b": np.zeros(MLP, np.float32)})
    pr = quantize_linear({"w": rng.standard_normal((MLP, W)).astype(np.float32),
                          "b": np.zeros(W, np.float32)})
    params = jax.tree.map(jnp.asarray, {"fc": fc, "proj": pr})
    mlp_flops = 2 * batch * S * W * MLP * 2
    # (round 4: this profile's finding moved gopt onto the fused resident
    # path — fits_fused_mlp now admits the 18.9 MB set)

    def unfused_mlp(xx):
        h = layer_norm(ln, xx, eps=1e-6)
        h = int8_linear(params["fc"], h)
        h = gelu_tanh(h)
        return xx + int8_linear(params["proj"], h)

    total += timed("MLP unfused XLA W8A8 + ln + residual (prod)",
                   unfused_mlp, x, flops=mlp_flops)
    for chunks in (1, 2, 4, 8, 16):
        timed(f"MLP fused int8 kernel, hidden-chunked x{chunks}",
              lambda xx, c=chunks: int8_mlp.int8_mlp(
                  params, xx, activation="gelu_tanh", pre_ln=ln, chunks=c,
                  add_residual=True),
              x, flops=mlp_flops)
    # streamed kernel is gated off at 18.9 MB (fits_streamed_mlp) — call
    # it directly to keep the rejection a current number
    timed("MLP streamed int8 kernel (fits gate bypassed)",
          lambda xx: int8_mlp.int8_mlp_streamed(
              params, xx, activation="gelu_tanh", pre_ln=ln,
              add_residual=True),
          x, flops=mlp_flops)

    # --- ln_qkv: production fused int8 (2 slabs at W=1536) vs unfused ---
    qkv = {}
    for name in ("q", "k", "v"):
        qkv[name] = jax.tree.map(jnp.asarray, quantize_linear(
            {"w": rng.standard_normal((W, W)).astype(np.float32),
             "b": np.zeros(W, np.float32)}))
    qkv_flops = 3 * 2 * batch * S * W * W
    assert fits_fused_qkv_int8(qkv, W)
    total += timed("fused int8 ln_qkv (W=1536, 2 slabs) (prod)",
                   lambda xx: ln_qkv_int8(qkv, ln, xx)[0], x,
                   flops=qkv_flops)

    def unfused_qkv(xx):
        h = layer_norm(ln, xx, eps=1e-6)
        return (int8_linear(qkv["q"], h) + int8_linear(qkv["k"], h)
                + int8_linear(qkv["v"], h))

    timed("unfused XLA W8A8 ln+q/k/v", unfused_qkv, x, flops=qkv_flops)

    # --- packed attention at S=577, 16 x 96 ---
    q = jnp.asarray(rng.standard_normal((batch, S, HEADS * HD)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((batch, S, HEADS * HD)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((batch, S, HEADS * HD)), jnp.bfloat16)
    attn_flops = 2 * 2 * batch * S * S * HEADS * HD
    total += timed("packed attention fast_softmax (prod int8_all)",
                   lambda qq: flash_attention_packed(
                       qq, k, v, num_heads=HEADS, fast_softmax=True),
                   q, flops=attn_flops)
    timed("packed attention fast+exp_bf16 (rejected at d=96)",
          lambda qq: flash_attention_packed(qq, k, v, num_heads=HEADS,
                                            fast_softmax=True, exp_bf16=True),
          q, flops=attn_flops)

    # --- int8 out-projection with fused residual ---
    out = jax.tree.map(jnp.asarray, quantize_linear(
        {"w": rng.standard_normal((W, W)).astype(np.float32),
         "b": np.zeros(W, np.float32)}))
    total += timed("int8 out-proj + residual (W=1536) (prod)",
                   lambda xx: int8_mlp.int8_linear_fused(out, xx,
                                                         residual=xx),
                   x, flops=2 * batch * S * W * W)

    layer_flops = mlp_flops + qkv_flops + attn_flops + 2 * batch * S * W * W
    print(f"\nper-layer component sum (prod paths): {total * 1e3:.3f} ms "
          f"({layer_flops / total / 1e12:.0f} TF/s-equiv); x40 layers = "
          f"{total * 40 * 1e3:.1f} ms/step at batch {batch} "
          f"(+ fixed preprocess/patch/map-pool tail)", flush=True)

    # full production block for cross-checking the component sum (the real
    # dispatch through mlp()/ln_qkv_int8 with residuals)
    def full_block(xx):
        qq, kk, vv = ln_qkv_int8(qkv, ln, xx, eps=1e-6)
        att = flash_attention_packed(qq, kk, vv, num_heads=HEADS,
                                     fast_softmax=True)
        h = int8_mlp.int8_linear_fused(out, att, residual=xx)
        return mlp(params, h, activation=gelu_tanh, pre_ln=ln, ln_eps=1e-6,
                   residual=True)

    timed("full production layer (dispatched)", full_block, x,
          flops=layer_flops)


if __name__ == "__main__":
    main()
