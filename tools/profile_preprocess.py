"""Microbench isolated preprocess variants on TPU (batch 8, 512→384).

Finds where the ~1 ms resize_normalize cost actually sits: u8 convert,
einsum row pass, einsum col pass, dtype, dot orientation.
"""

from __future__ import annotations

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
    from clip_embedder_tpu.ops.preprocess import preprocess_weights_for

    batch = int(os.environ.get("PROF_BATCH", "8"))
    iters = int(os.environ.get("PROF_ITERS", "100"))
    src, target = 512, 384
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.integers(0, 255, size=(batch, src, src, 3), dtype=np.uint8))
    wh_np, ww_np = preprocess_weights_for(src, src, target)
    wh = jnp.broadcast_to(jnp.asarray(wh_np), (batch, target, src))
    ww = jnp.broadcast_to(jnp.asarray(ww_np), (batch, target, src))
    mean = jnp.asarray([0.5, 0.5, 0.5], jnp.float32)
    std = jnp.asarray([0.5, 0.5, 0.5], jnp.float32)

    def chain(fn):
        @jax.jit
        def c(images, wh, ww):
            def body(_, acc):
                wh_i = wh + (acc * 1e-30).astype(wh.dtype)
                r = fn(images, wh_i, ww)
                return acc + r.reshape(-1)[:1].astype(jnp.float32).sum()
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0))
        return c

    def timeit(name, fn):
        c = chain(fn)
        try:
            jax.block_until_ready(c(images, wh, ww))
            t0 = time.perf_counter()
            jax.block_until_ready(c(images, wh, ww))
            dt = (time.perf_counter() - t0) / iters
            print(f"{name}: {dt*1e3:.3f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)

    # 0. u8 convert only
    timeit("convert_only", lambda i, a, b: i.astype(jnp.float32) * (1 / 255.0))

    # 1. einsum row pass only (natural A^T B)
    timeit("rows_only", lambda i, a, b: jnp.einsum(
        "bhwc,bsh->bwcs", i.astype(jnp.float32), a,
        preferred_element_type=jnp.float32))

    # 2. full current implementation (nchw)
    def current(i, a, b):
        x = i.astype(jnp.float32)
        x = jnp.einsum("bhwc,bsh->bwcs", x, a * (1 / 255.0),
                       preferred_element_type=jnp.float32)
        x = jnp.einsum("bwcs,btw->bcst", x, b,
                       preferred_element_type=jnp.float32)
        return (x - mean[None, :, None, None]) / std[None, :, None, None]
    timeit("current_nchw_f32", current)

    # 3. old channels-first (transpose + plain GEMMs)
    def old(i, a, b):
        x = i.astype(jnp.float32) * (1 / 255.0)
        x = jnp.transpose(x, (0, 3, 1, 2))
        x = jnp.einsum("bsh,bchw->bcsw", a, x,
                       preferred_element_type=jnp.float32)
        x = jnp.einsum("bcsw,btw->bcst", x, b,
                       preferred_element_type=jnp.float32)
        return (x - mean[None, :, None, None]) / std[None, :, None, None]
    timeit("old_transpose_f32", old)

    # 4. bf16 operands, f32 accumulation
    def bf16_variant(i, a, b):
        x = i.astype(jnp.bfloat16)
        x = jnp.einsum("bhwc,bsh->bwcs", x,
                       (a * (1 / 255.0)).astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        x = jnp.einsum("bwcs,btw->bcst", x.astype(jnp.bfloat16),
                       b.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        return (x - mean[None, :, None, None]) / std[None, :, None, None]
    timeit("bf16_ops_f32_acc", bf16_variant)

    # 5. merged-batch GEMM: fold batch into M via block-diag? — instead try
    # shared-weight path (weights identical across batch): 2D weights
    wh2 = jnp.asarray(wh_np)
    ww2 = jnp.asarray(ww_np)

    def shared(i, a, b):
        x = i.astype(jnp.float32)
        x = jnp.einsum("bhwc,sh->bwcs", x, wh2 * (1 / 255.0),
                       preferred_element_type=jnp.float32)
        x = jnp.einsum("bwcs,tw->bcst", x, ww2,
                       preferred_element_type=jnp.float32)
        return (x - mean[None, :, None, None]) / std[None, :, None, None]
    timeit("shared_weights_f32", shared)

    # 6. reshape-merge variant: one plain GEMM for rows
    def plain_rows(i, a, b):
        x = i.astype(jnp.float32).reshape(batch, src, src * 3)
        x = jnp.einsum("bsh,bhm->bsm", a * (1 / 255.0), x,
                       preferred_element_type=jnp.float32)  # [B,S,W*C]
        x = x.reshape(batch, target, src, 3)
        x = jnp.einsum("bswc,btw->bsct", x, b,
                       preferred_element_type=jnp.float32)
        return (x - mean[None, None, :, None]) / std[None, None, :, None]
    timeit("plain_rows_then_ATB", plain_rows)




def main2() -> None:
    import jax
    import jax.numpy as jnp

    from clip_embedder_tpu.ops.preprocess import (preprocess_weights_for,
                                                  resize_normalize)
    import time

    batch = int(os.environ.get("PROF_BATCH", "8"))
    iters = int(os.environ.get("PROF_ITERS", "100"))
    src, target = 512, 384
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.integers(0, 255, size=(batch, src, src, 3), dtype=np.uint8))
    wh_np, ww_np = preprocess_weights_for(src, src, target)
    wh = jnp.broadcast_to(jnp.asarray(wh_np), (batch, target, src))
    ww = jnp.broadcast_to(jnp.asarray(ww_np), (batch, target, src))
    mean = jnp.asarray([0.5, 0.5, 0.5], jnp.float32)
    std = jnp.asarray([0.5, 0.5, 0.5], jnp.float32)

    def timeit(name, fn):
        @jax.jit
        def c(images, wh, ww):
            def body(_, acc):
                wh_i = wh + (acc * 1e-30).astype(wh.dtype)
                r = fn(images, wh_i, ww)
                return acc + jnp.sum(r[0, :1].astype(jnp.float32))
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0))
        try:
            jax.block_until_ready(c(images, wh, ww))
            t0 = time.perf_counter()
            jax.block_until_ready(c(images, wh, ww))
            dt = (time.perf_counter() - t0) / iters
            print(f"{name}: {dt*1e3:.3f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)

    timeit("rn_f32_nhwc", lambda i, a, b: resize_normalize(
        i, a, b, mean, std))
    timeit("rn_f32_nchw", lambda i, a, b: resize_normalize(
        i, a, b, mean, std, layout="nchw"))
    timeit("rn_bf16_nchw", lambda i, a, b: resize_normalize(
        i, a, b, mean, std, out_dtype=jnp.bfloat16, layout="nchw"))
    timeit("rn_bf16_nhwc", lambda i, a, b: resize_normalize(
        i, a, b, mean, std, out_dtype=jnp.bfloat16))


if __name__ == "__main__" and os.environ.get("PROF_PART") == "2":
    main2()
elif __name__ == "__main__":
    main()
