"""Interleaved A/B of the weight-streamed fused int8 MLP vs the unfused
int8 path and bf16, at PE-Core-bigG (1536×8960, S=1025) and ViT-gopt
(1536×6144, S=577) MLP shapes.

Context: PE-Core under int8_all measured only ~1.08× bf16
(BENCH_RESULTS.md) — its 27.5 MB int8 MLP weight set exceeds the resident
kernel's VMEM bound, so the MLPs ran unfused, whose quant/dequant HBM
round-trips at [B·S, 8960] erase the int8 MXU gain. The streamed kernel
(ops/int8_mlp.int8_mlp_streamed) keeps the per-slab DMA under the slab
matmuls.

Usage: python tools/profile_streamed_mlp.py  (env: PROF_BATCH, PROF_ITERS)
Methodology: chained on-device fori_loop, full-sum reduction, RTT
subtracted, interleaved A/B medians (CLAUDE.md: single runs mislead).
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from clip_embedder_tpu.utils.compilation_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()

    from benches.timing import chained_timer
    from clip_embedder_tpu.ops import int8_mlp as m
    from clip_embedder_tpu.ops.layers import layer_norm
    from clip_embedder_tpu.ops.quant import int8_linear, quantize_weight

    batch = int(os.environ.get("PROF_BATCH", "16"))
    iters = int(os.environ.get("PROF_ITERS", "20"))
    rounds = int(os.environ.get("PROF_ROUNDS", "7"))

    def chain(fn, *args, it=iters):
        return chained_timer(fn, *args, iters=it)

    for label, (W, H, S, act) in {
        "PE-bigG": (1536, 8960, 1025, "gelu_tanh"),
        "gopt": (1536, 6144, 577, "gelu_tanh"),
    }.items():
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((batch, S, W)), jnp.bfloat16)
        fc = quantize_weight(rng.standard_normal((W, H)).astype(np.float32)
                             * 0.05)
        fc["b"] = np.zeros(H, np.float32)
        pr = quantize_weight(rng.standard_normal((H, W)).astype(np.float32)
                             * 0.05)
        pr["b"] = np.zeros(W, np.float32)
        params = jax.tree.map(jnp.asarray, {"fc": fc, "proj": pr})
        bfp = {"fc": {"w": jnp.asarray(fc["w_q"].astype(np.float32)
                                       * fc["w_scale"], jnp.bfloat16),
                      "b": jnp.zeros(H, jnp.bfloat16)},
               "proj": {"w": jnp.asarray(pr["w_q"].astype(np.float32)
                                         * pr["w_scale"], jnp.bfloat16),
                        "b": jnp.zeros(W, jnp.bfloat16)}}
        ln = {"scale": jnp.ones((W,), jnp.float32),
              "bias": jnp.zeros((W,), jnp.float32)}
        flops = 2 * batch * S * W * H * 2

        def unfused(xx):
            xn = layer_norm(ln, xx, eps=1e-6)
            h = jax.nn.gelu(int8_linear(params["fc"], xn), approximate=True)
            return xx + int8_linear(params["proj"], h)

        def bf16(xx):
            xn = layer_norm(ln, xx, eps=1e-6)
            from clip_embedder_tpu.ops.layers import linear

            h = jax.nn.gelu(linear(bfp["fc"], xn), approximate=True)
            return xx + linear(bfp["proj"], h)

        variants = {
            "bf16 (xla)": chain(bf16, x),
            "int8 unfused (xla)": chain(unfused, x),
        }
        for chunk in (1024, 1280, 1792):
            variants[f"int8 streamed chunk={chunk}"] = chain(
                lambda xx, c=chunk: m.int8_mlp_streamed(
                    params, xx, activation=act, pre_ln=ln,
                    add_residual=True, chunk=c), x)
        samples = {k: [] for k in variants}
        for _ in range(rounds):
            for k, once in variants.items():
                samples[k].append(once())
        print(f"== {label} MLP  W={W} H={H} S={S} batch={batch} ==")
        for k, vals in samples.items():
            med = float(np.median(vals))
            print(f"  {k:28s} {med * 1e3:7.3f} ms"
                  f"  ({flops / med / 1e12:5.0f} TF/s-equiv)", flush=True)


if __name__ == "__main__":
    main()
