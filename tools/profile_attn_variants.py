"""Interleaved A/B of the round-4 packed-attention variants.

Two levers VERDICT.md (round 3) asked to measure-or-reject:

* ``quant_qk`` — int8 q·kᵀ score matmul. Unlike the rejected quant_pv
  (whose per-row softmax-weight quantization added [S, S] VPU passes),
  quantizing q and k costs only [S, D] passes, and the positive per-row
  dequant scale lets the softmax row max run on the raw int32
  accumulator, fusing the dequant multiply into the exp argument.
* ``exp_bf16`` — the [S, S] exp pass (and everything downstream) at bf16
  width after the f32 max-subtract, probing Mosaic's packed bf16 lanes
  against the kernel's VPU floor (~103 TF/s-equiv at S>=576, the cost
  that bounds H14 and PE — BENCH_RESULTS "H14's int8_all efficiency
  gap").

Shapes: the three big towers the floor hurts most (SO400M S=576 d=72,
H14 S=730 d=80, PE-bigG S=1025 d=96 with in-kernel rope) + gopt
(S=577 d=96).

Usage: python tools/profile_attn_variants.py  (env: PROF_ITERS,
PROF_ROUNDS, PROF_CASES — comma list to subset)
Methodology: chained on-device fori_loop, full-sum reduction, RTT
subtracted, interleaved A/B medians (CLAUDE.md: single runs mislead).
Also prints numerics (max |diff| and cosine) of each variant vs the
exact-softmax kernel so speed and accuracy land in one table.
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

    cases = {
        "SO400M b8": (8, 16, 576, 72, False),
        "SO400M b32": (32, 16, 576, 72, False),
        "H14 b16": (16, 16, 730, 80, False),
        "gopt b16": (16, 16, 577, 96, False),
        "PE-bigG b8 rope": (8, 16, 1025, 96, True),
    }
    subset = os.environ.get("PROF_CASES")
    if subset:
        keep = {s.strip() for s in subset.split(",")}
        cases = {k: v for k, v in cases.items() if k in keep}

    for label, (batch, h, s, d, use_rope) in cases.items():
        rng = np.random.default_rng(0)
        q, k, v = (jnp.asarray(rng.standard_normal((batch, s, h * d)),
                               jnp.bfloat16) for _ in range(3))
        rope = None
        if use_rope:
            ang = np.tile(rng.standard_normal((s, d)).astype(np.float32),
                          (1, h))
            rope = (jnp.sin(jnp.asarray(ang)), jnp.cos(jnp.asarray(ang)))

        def run(qq, kk, vv, **kw):
            return flash_attention_packed(qq, kk, vv, num_heads=h,
                                          rope=rope, **kw)

        flag_sets = {
            "exact (prod default)": {},
            "exp_bf16": {"exp_bf16": True},
            "quant_qk": {"quant_qk": True},
            "quant_qk+exp_bf16": {"quant_qk": True, "exp_bf16": True},
            "fast_softmax": {"fast_softmax": True},
            "fast+exp_bf16": {"fast_softmax": True, "exp_bf16": True},
            # round-5: two-heads-per-step amortizations (VERDICT r4 #4)
            "fast+pair_exp": {"fast_softmax": True, "pair_exp": True},
            "pair_exp": {"pair_exp": True},
            "fast+group_mult2": {"fast_softmax": True, "group_mult": 2},
            "fast+pair+gm2": {"fast_softmax": True, "pair_exp": True,
                              "group_mult": 2},
        }
        # numerics first (one eval each, vs the exact kernel in f32)
        ref = np.asarray(run(q, k, v)).astype(np.float64)
        refn = ref / np.linalg.norm(ref, axis=-1, keepdims=True)
        print(f"== {label}  S={s} d={d} heads={h} ==", flush=True)
        numerics = {}
        for name, kw in flag_sets.items():
            if not kw:
                continue
            out = np.asarray(run(q, k, v, **kw)).astype(np.float64)
            outn = out / np.linalg.norm(out, axis=-1, keepdims=True)
            cos = float(np.min(np.sum(refn * outn, axis=-1)))
            numerics[name] = (float(np.max(np.abs(out - ref))), 1.0 - cos)

        variants = {
            name: chained_timer(
                lambda qq, kk, vv, kw=kw: run(qq, kk, vv, **kw),
                q, k, v, iters=iters)
            for name, kw in flag_sets.items()
        }
        samples = {kk_: [] for kk_ in variants}
        for _ in range(rounds):
            for kk_, once in variants.items():
                samples[kk_].append(once())
        flops = 2 * batch * h * s * s * d * 2
        base = float(np.median(samples["exact (prod default)"]))
        for kk_, vals in samples.items():
            med = float(np.median(vals))
            nm = numerics.get(kk_)
            extra = (f"  maxdiff={nm[0]:.4f} cosdist={nm[1]:.2e}"
                     if nm else "")
            print(f"  {kk_:22s} {med * 1e3:7.3f} ms"
                  f"  ({flops / med / 1e12:5.0f} TF/s-equiv,"
                  f" {base / med:4.2f}x){extra}", flush=True)


if __name__ == "__main__":
    main()
