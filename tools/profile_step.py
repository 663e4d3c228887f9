"""Component-level profile of the SO400M batch-8 vision step on TPU.

Times jitted variants with the on-device-chained methodology of bench.py
(fori_loop with a data dependency, one scalar readback) and prints a
breakdown: per-layer slope vs fixed tail, attention kernel alone, MHA block
alone (kernel + projections + layout copies), int8 variants.

Usage: python tools/profile_step.py  (env: PROF_BATCH, PROF_ITERS)
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from clip_embedder_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()

    from clip_embedder_tpu.models import vit
    from clip_embedder_tpu.models.zoo import so400m_siglip2_384
    from clip_embedder_tpu.ops.flash import flash_attention
    from clip_embedder_tpu.ops.attention import multi_head_attention
    from clip_embedder_tpu.ops.preprocess import (preprocess_weights_for,
                                                  resize_normalize)

    batch = int(os.environ.get("PROF_BATCH", "8"))
    iters = int(os.environ.get("PROF_ITERS", "30"))
    dtype = jnp.bfloat16
    src, target = 512, 384

    base_cfg = so400m_siglip2_384()
    mean = jnp.asarray([0.5, 0.5, 0.5], jnp.float32)
    std = jnp.asarray([0.5, 0.5, 0.5], jnp.float32)
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.integers(0, 255, size=(batch, src, src, 3), dtype=np.uint8))
    wh_np, ww_np = preprocess_weights_for(src, src, target)
    wh = jnp.broadcast_to(jnp.asarray(wh_np), (batch, target, src))
    ww = jnp.broadcast_to(jnp.asarray(ww_np), (batch, target, src))


    # shared single-dispatch RTT probe (benches/timing.py)
    from benches.timing import dispatch_rtt

    def timeit(name, fn, *args):
        try:
            jax.block_until_ready(fn(*args))
            t0 = time.perf_counter()
            jax.block_until_ready(fn(*args))
            dt = max(time.perf_counter() - t0 - dispatch_rtt(), 1e-9) / iters
            print(f"{name}: {dt*1e3:.3f} ms", flush=True)
            return dt
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)
            return None

    def full_step_fn(cfg, params, attn_impl):
        @jax.jit
        def chain(params, images_u8, wh, ww):
            def body(_, acc):
                wh_i = wh + (acc * 1e-30).astype(wh.dtype)
                pixels = resize_normalize(images_u8, wh_i, ww, mean, std,
                                          out_dtype=dtype, layout="nchw")
                emb = vit.apply(params, pixels, cfg, attn_impl=attn_impl,
                                channels_first=True)
                # FULL reduction: a [:1] slice invites XLA slice-propagation
                # into the bench body (observed computing one row of a bare
                # matmul chain); real towers measured immune, but the full
                # sum removes the hazard for ~nothing ([B, D] reduce)
                return acc + jnp.sum(emb.astype(jnp.float32))
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0))
        return chain

    def make(cfg_layers):
        cfg = dataclasses.replace(base_cfg, layers=cfg_layers)
        params = vit.init(jax.random.key(0), cfg, dtype=dtype)
        return cfg, params

    cfg27, p27 = make(27)
    cfg13, p13 = make(13)

    t27 = timeit("full L=27 pallas_fast", full_step_fn(cfg27, p27, "pallas_fast"),
                 p27, images, wh, ww)
    t13 = timeit("full L=13 pallas_fast", full_step_fn(cfg13, p13, "pallas_fast"),
                 p13, images, wh, ww)
    if t27 and t13:
        per_layer = (t27 - t13) / 14
        tail = t27 - 27 * per_layer
        print(f"  -> per-layer {per_layer*1e3:.3f} ms, tail {tail*1e3:.3f} ms",
              flush=True)

    timeit("full L=27 xla", full_step_fn(cfg27, p27, "xla"), p27, images, wh, ww)

    # attention kernel alone, chained: [B, H, S, D]
    s, h, d = cfg27.seq_len, cfg27.heads, cfg27.head_dim
    q = jnp.asarray(rng.standard_normal((batch, h, s, d)), dtype)
    k = jnp.asarray(rng.standard_normal((batch, h, s, d)), dtype)
    v = jnp.asarray(rng.standard_normal((batch, h, s, d)), dtype)

    @jax.jit
    def kern_chain(q, k, v):
        def body(_, carry):
            o = flash_attention(carry, k, v, fast_softmax=True)
            return o
        return jax.lax.fori_loop(0, iters, body, q)

    timeit("flash kernel alone (per call)", kern_chain, q, k, v)

    # full MHA block (projections + layout + kernel), chained
    attn_params = p27["blocks"][0 if False else "attn"] if False else None
    attn_params = jax.tree.map(lambda a: a[0], p27["blocks"]["attn"])
    x = jnp.asarray(rng.standard_normal((batch, s, cfg27.width)), dtype)

    def mha_chain_fn(impl):
        @jax.jit
        def chain(x):
            def body(_, carry):
                return multi_head_attention(attn_params, carry, num_heads=h,
                                            impl=impl)
            return jax.lax.fori_loop(0, iters, body, x)
        return chain

    timeit("mha block pallas_fast (per call)", mha_chain_fn("pallas_fast"), x)
    timeit("mha block xla (per call)", mha_chain_fn("xla"), x)

    # int8 variants
    from clip_embedder_tpu.ops.quant import (DEFAULT_QUANT_PATHS,
                                             QUANT_PATHS_ALL, quantize_tree)

    def quant(params, paths):
        return jax.tree.map(
            jnp.asarray,
            quantize_tree(jax.tree.map(np.asarray, params), paths=paths))

    for label, paths in (("int8", DEFAULT_QUANT_PATHS),
                         ("int8_all", QUANT_PATHS_ALL)):
        q27 = quant(p27, paths)
        q13 = quant(p13, paths)
        t27q = timeit(f"full L=27 pallas_fast {label}",
                      full_step_fn(cfg27, q27, "pallas_fast"),
                      q27, images, wh, ww)
        t13q = timeit(f"full L=13 pallas_fast {label}",
                      full_step_fn(cfg13, q13, "pallas_fast"),
                      q13, images, wh, ww)
        if t27q and t13q:
            per_layer = (t27q - t13q) / 14
            tail = t27q - 27 * per_layer
            print(f"  -> {label} per-layer {per_layer*1e3:.3f} ms, tail "
                  f"{tail*1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
