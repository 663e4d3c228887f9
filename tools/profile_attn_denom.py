"""Interleaved A/B of the packed attention kernel's softmax-denominator
strategy: explicit [S, S] VPU row-sum (current) vs MXU spare-lane (v2's
trick ported to the packed layout — a ones column appended to each head's
v slab makes the p·v matmul emit the row sums for free; the MXU pads the
[S, d] operand to 128 lanes internally regardless).

Shapes: the four transformer towers whose attention dominates (SO400M
S=576 d=72, H14 S=730 d=80, gopt S=577 d=96, PE-bigG S=1025 d=96 with
in-kernel rope).

Usage: python tools/profile_attn_denom.py  (env: PROF_BATCH, PROF_ITERS,
PROF_ROUNDS)
Methodology: chained on-device fori_loop, full-sum reduction, RTT
subtracted, interleaved A/B medians (CLAUDE.md: single runs mislead).
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax.numpy as jnp

    from clip_embedder_tpu.utils.compilation_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()

    from benches.timing import chained_timer
    from clip_embedder_tpu.ops.flash import flash_attention_packed

    iters = int(os.environ.get("PROF_ITERS", "30"))
    rounds = int(os.environ.get("PROF_ROUNDS", "7"))

    def chain(fn, *args, it=iters):
        return chained_timer(fn, *args, iters=it)

    cases = {
        "SO400M b32": (32, 16, 576, 72, False),
        "H14 b16": (16, 16, 730, 80, False),
        "gopt b16": (16, 16, 577, 96, False),
        "PE-bigG b16 rope": (16, 16, 1025, 96, True),
    }
    for label, (batch, h, s, d, use_rope) in cases.items():
        rng = np.random.default_rng(0)
        q, k, v = (jnp.asarray(rng.standard_normal((batch, s, h * d)),
                               jnp.bfloat16) for _ in range(3))
        rope = None
        if use_rope:
            ang = np.tile(rng.standard_normal((s, d)).astype(np.float32),
                          (1, h))
            rope = (jnp.sin(jnp.asarray(ang)), jnp.cos(jnp.asarray(ang)))

        variants = {}
        for fast in (True, False):
            for mxu in (False, True):
                variants[f"fast={int(fast)} mxu_denom={int(mxu)}"] = chain(
                    lambda qq, kk, vv, f=fast, m=mxu: flash_attention_packed(
                        qq, kk, vv, num_heads=h, fast_softmax=f,
                        rope=rope, mxu_denom=m), q, k, v)
        # bf16 softmax pipeline (exp and everything downstream on
        # half-width vectors, no cast pass before p·v) on the production
        # config — see flash.py exp_bf16
        variants["fast=1 mxu_denom=1 exp_bf16"] = chain(
            lambda qq, kk, vv: flash_attention_packed(
                qq, kk, vv, num_heads=h, fast_softmax=True,
                rope=rope, mxu_denom=True, exp_bf16=True), q, k, v)
        samples = {kk: [] for kk in variants}
        for _ in range(rounds):
            for kk, once in variants.items():
                samples[kk].append(once())
        flops = 2 * batch * h * s * s * d * 2
        print(f"== {label}  S={s} d={d} heads={h} ==")
        for kk, vals in samples.items():
            med = float(np.median(vals))
            print(f"  {kk:26s} {med * 1e3:7.3f} ms"
                  f"  ({flops / med / 1e12:5.0f} TF/s-equiv)", flush=True)


if __name__ == "__main__":
    main()
