"""Dissect the non-scan 'tail' of the SO400M vision step at batch 8.

Times cumulative prefixes of the forward pass (preprocess → patch embed →
scan → pool/proj) with the on-device-chained methodology, so each stage's
marginal cost is the difference between consecutive prefixes.
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

    from clip_embedder_tpu.models import vit
    from clip_embedder_tpu.models.vit import patchify, _map_pool
    from clip_embedder_tpu.models.zoo import so400m_siglip2_384
    from clip_embedder_tpu.ops.layers import ACTIVATIONS, layer_norm, linear
    from clip_embedder_tpu.ops.normalize import l2_normalize
    from clip_embedder_tpu.ops.preprocess import (preprocess_weights_for,
                                                  resize_normalize)

    batch = int(os.environ.get("PROF_BATCH", "8"))
    iters = int(os.environ.get("PROF_ITERS", "30"))
    dtype = jnp.bfloat16
    src, target = 512, 384

    cfg = so400m_siglip2_384()
    params = vit.init(jax.random.key(0), cfg, dtype=dtype)
    act = ACTIVATIONS[cfg.activation]
    mean = jnp.asarray([0.5, 0.5, 0.5], jnp.float32)
    std = jnp.asarray([0.5, 0.5, 0.5], jnp.float32)
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.integers(0, 255, size=(batch, src, src, 3), dtype=np.uint8))
    wh_np, ww_np = preprocess_weights_for(src, src, target)
    wh = jnp.broadcast_to(jnp.asarray(wh_np), (batch, target, src))
    ww = jnp.broadcast_to(jnp.asarray(ww_np), (batch, target, src))

    def stage_fn(stage):
        def fwd(params, pixels):
            x = patchify(pixels, cfg.patch_size, True)
            x = linear(params["patch_embed"], x)
            x = x + params["pos_embed"].astype(x.dtype)
            if stage == "embed":
                return x
            from clip_embedder_tpu.models.vit import _block_forward

            def body(carry, block):
                return _block_forward(cfg, act, carry, block,
                                      impl="pallas_fast"), None
            x, _ = jax.lax.scan(body, x, params["blocks"])
            if stage == "scan":
                return x
            x = layer_norm(params["ln_post"], x, eps=cfg.ln_eps)
            pooled = _map_pool(cfg, act, params, x)
            if cfg.use_proj and "proj" in params:
                pooled = linear(params["proj"], pooled)
            return l2_normalize(pooled)

        @jax.jit
        def chain(params, images_u8, wh, ww):
            def body(_, acc):
                wh_i = wh + (acc * 1e-30).astype(wh.dtype)
                pixels = resize_normalize(images_u8, wh_i, ww, mean, std,
                                          out_dtype=dtype, layout="nchw")
                if stage == "pre":
                    r = pixels
                else:
                    r = fwd(params, pixels)
                return acc + jnp.sum(r[0, :1].astype(jnp.float32))
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

        return chain


    _rtt = []

    def dispatch_rtt() -> float:
        if not _rtt:
            nop = jax.jit(lambda v: v + 1)
            float(nop(jnp.float32(1)))
            best = float("inf")
            for _ in range(5):
                t0 = time.perf_counter()
                float(nop(jnp.float32(2)))
                best = min(best, time.perf_counter() - t0)
            _rtt.append(best)
        return _rtt[0]

    results = {}
    for stage in ("pre", "embed", "scan", "full"):
        fn = stage_fn(stage)
        try:
            jax.block_until_ready(fn(params, images, wh, ww))
            t0 = time.perf_counter()
            jax.block_until_ready(fn(params, images, wh, ww))
            dt = max(time.perf_counter() - t0 - dispatch_rtt(), 1e-9) / iters
            results[stage] = dt
            print(f"{stage}: {dt*1e3:.3f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{stage}: FAILED {type(e).__name__}: {e}", flush=True)

    if len(results) == 4:
        print(f"marginal embed: {(results['embed']-results['pre'])*1e3:.3f} ms")
        print(f"marginal scan:  {(results['scan']-results['embed'])*1e3:.3f} ms")
        print(f"marginal pool:  {(results['full']-results['scan'])*1e3:.3f} ms")


if __name__ == "__main__":
    main()
