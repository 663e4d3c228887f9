"""Interleaved A/B: gopt's int8 MLP, unfused XLA W8A8 vs the fused kernel.

tools/profile_gopt.py's sequential pass showed the fused resident kernel
(hidden-chunked x2) beating the unfused path by ~10% at gopt shapes
(W=1536, MLP=6144, 18.9 MB int8 weight set) — contradicting the round-3
"a wash" note that set fits_fused_mlp's 14 MB gate. Tunnel timing noise
is ±10-20% on sequential runs (CLAUDE.md), so this tool settles it the
only way that counts: interleaved rounds, medians.

Usage: python tools/profile_gopt_mlp.py  (env: PROF_BATCH, PROF_ITERS,
PROF_ROUNDS)
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

W, MLP = 1536, 6144


def main() -> None:
    import jax
    import jax.numpy as jnp

    from clip_embedder_tpu.utils.compilation_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()

    from benches.timing import chained_timer
    from clip_embedder_tpu.ops import int8_mlp
    from clip_embedder_tpu.ops.layers import gelu_tanh, layer_norm
    from clip_embedder_tpu.ops.quant import int8_linear, quantize_weight

    batch = int(os.environ.get("PROF_BATCH", "16"))
    iters = int(os.environ.get("PROF_ITERS", "30"))
    rounds = int(os.environ.get("PROF_ROUNDS", "9"))
    s = 577

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, s, W)), jnp.bfloat16)
    ln = {"scale": jnp.ones((W,), jnp.float32),
          "bias": jnp.zeros((W,), jnp.float32)}

    def quantize_linear(shape_in, shape_out):
        q = quantize_weight(
            rng.standard_normal((shape_in, shape_out)).astype(np.float32))
        q["b"] = np.zeros(shape_out, np.float32)
        return jax.tree.map(jnp.asarray, q)

    params = {"fc": quantize_linear(W, MLP), "proj": quantize_linear(MLP, W)}
    flops = 2 * batch * s * W * MLP * 2

    def unfused(xx):
        h = layer_norm(ln, xx, eps=1e-6)
        h = gelu_tanh(int8_linear(params["fc"], h))
        return xx + int8_linear(params["proj"], h)

    variants = {
        "unfused XLA W8A8 (prod)": chained_timer(unfused, x, iters=iters),
    }
    for c in (1, 2, 4, 8):
        variants[f"fused x{c}"] = chained_timer(
            lambda xx, cc=c: int8_mlp.int8_mlp(
                params, xx, activation="gelu_tanh", pre_ln=ln, chunks=cc,
                add_residual=True),
            x, iters=iters)

    samples: dict[str, list[float]] = {k: [] for k in variants}
    for _ in range(rounds):
        for k, once in variants.items():
            samples[k].append(once())
    base = float(np.median(samples["unfused XLA W8A8 (prod)"]))
    print(f"== gopt MLP b{batch} S={s} W={W} hidden={MLP} "
          f"({rounds} interleaved rounds, medians) ==")
    for k, v in samples.items():
        med = float(np.median(v))
        print(f"  {k:28s} {med * 1e3:7.3f} ms "
              f"({flops / med / 1e12:5.0f} TF/s-equiv, {base / med:.2f}x)",
              flush=True)


if __name__ == "__main__":
    main()
