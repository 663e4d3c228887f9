"""Benchmark: images/sec/chip, vision embedding at 384px.

Measures the full device path the reference's ``vision/embed`` criterion
bench measures (preprocess resize+normalize from decoded u8 + tower forward,
reference: benches/model_bench.rs:36-48) on the flagship model class
ViT-SO400M-16-SigLIP2-384 (reference headline: 988 ms/image on the author's
CPU → 1.012 img/s, README.md:110; BASELINE.md north star ≥5000 img/s/chip).

Methodology: throughput is measured by chaining ``ITERS`` full steps
on-device inside one jitted fori_loop (each iteration data-depends on the
previous, so XLA cannot hoist or elide work), reading back one scalar, and
subtracting the measured single-dispatch RTT from the wall time. This
isolates device throughput from this environment's tunnel dispatch latency
(~29 ms per call), which would otherwise dominate — a production TPU host
pays microseconds, not milliseconds, to dispatch. (Same scheme as
benches/bench_suite.py; before round 2's fix the un-subtracted RTT left a
~RTT/ITERS ≈ 1 ms/step bias in the headline.) The p50 single-image latency
is still reported as honest wall-clock including dispatch.

Prints ONE JSON line:
    {"metric": "images_per_sec_per_chip_vision_384px", "value": N,
     "unit": "images/sec/chip", "vs_baseline": N}

Env knobs: BENCH_BATCH (default sweep 8/16/32), BENCH_DTYPE
(bfloat16|float32), BENCH_SRC (source image size, default 512), BENCH_ATTN
(pallas|pallas_fast|xla), BENCH_QUANT (int8 = fused W8A8 MLP kernels,
~3e-4 cosine; int8_all = + fused int8 attention projections, ~1e-3
cosine), BENCH_ITERS (chained steps, default 100).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

# Reference baseline: 988 ms single-image vision embed (ViT-SO400M-16-
# SigLIP2-384, author's CPU, README.md:110) → 1.0121 images/sec.
BASELINE_IMAGES_PER_SEC = 1000.0 / 988.0


def main() -> None:
    import jax
    import jax.numpy as jnp

    from clip_embedder_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()

    from clip_embedder_tpu.models import vit
    from clip_embedder_tpu.models.zoo import so400m_siglip2_384
    from clip_embedder_tpu.ops.preprocess import preprocess_weights_for, resize_normalize

    dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[
        os.environ.get("BENCH_DTYPE", "bfloat16")
    ]
    # serving default: the clamped-softmax Pallas kernel (pallas_fast) —
    # numerics within 2e-6 of exact softmax on realistic logits
    # (tests/test_flash.py), ~2% faster end-to-end
    attn_impl = os.environ.get("BENCH_ATTN", "pallas_fast")
    src = int(os.environ.get("BENCH_SRC", "512"))
    iters = int(os.environ.get("BENCH_ITERS", "100"))
    target = 384

    # shared chained-on-device harness (benches/timing.py): fori_loop with
    # a cross-iteration data dependency, full-sum reduction, and the
    # single-dispatch RTT subtracted — with the default 100 chained iters
    # the leftover bias would otherwise be ~0.3 ms/step
    from benches.timing import chained_timer

    cfg = so400m_siglip2_384()
    assert cfg.image_size == target
    params = vit.init(jax.random.key(0), cfg, dtype=dtype)
    quant = os.environ.get("BENCH_QUANT")
    if quant in ("int8", "int8_all"):
        import numpy as _np

        from clip_embedder_tpu.ops.quant import (DEFAULT_QUANT_PATHS,
                                                 QUANT_PATHS_ALL,
                                                 quantize_tree)

        paths = QUANT_PATHS_ALL if quant == "int8_all" else DEFAULT_QUANT_PATHS
        params = jax.tree.map(
            jnp.asarray,
            quantize_tree(jax.tree.map(_np.asarray, params), paths=paths))
    mean = jnp.asarray([0.5, 0.5, 0.5], jnp.float32)
    std = jnp.asarray([0.5, 0.5, 0.5], jnp.float32)

    @jax.jit
    def embed(params, images_u8, wh, ww):
        pixels = resize_normalize(images_u8, wh, ww, mean, std,
                                  out_dtype=dtype, layout="nchw")
        return vit.apply(params, pixels, cfg, attn_impl=attn_impl,
                         channels_first=True)

    def tower_probe(params, images_u8, wh, ww):
        # the harness perturbs its FIRST argument for the cross-iteration
        # dependency, so the (float) resize weights lead the signature —
        # a true data dependency at zero cost
        return chained_timer(
            lambda wh_i, p, img, ww_: vit.apply(
                p, resize_normalize(img, wh_i, ww_, mean, std,
                                    out_dtype=dtype, layout="nchw"),
                cfg, attn_impl=attn_impl, channels_first=True),
            wh, params, images_u8, ww, iters=iters)

    wh_np, ww_np = preprocess_weights_for(src, src, target)

    env_batch = os.environ.get("BENCH_BATCH")
    batches = [int(env_batch)] if env_batch else [8, 16, 32]
    best = 0.0
    best_batch = 0
    rng = np.random.default_rng(0)
    for batch in batches:
        images = jnp.asarray(
            rng.integers(0, 255, size=(batch, src, src, 3), dtype=np.uint8)
        )
        wh = jnp.broadcast_to(jnp.asarray(wh_np), (batch, target, src))
        ww = jnp.broadcast_to(jnp.asarray(ww_np), (batch, target, src))
        try:
            dt = tower_probe(params, images, wh, ww)()
        except Exception as e:  # noqa: BLE001 — OOM at large batch: skip
            print(f"batch {batch} failed: {type(e).__name__}", file=sys.stderr)
            continue
        ips = batch / dt
        print(f"batch {batch}: {dt*1e3:.1f} ms/step on-device → "
              f"{ips:.1f} img/s", file=sys.stderr)
        if ips > best:
            best = ips
            best_batch = batch

    if best == 0.0:
        print("benchmark failed: no batch size completed", file=sys.stderr)
        sys.exit(1)

    # opt-in int8 alternates, measured at the winning batch when the main
    # run is bf16 (reported in detail, not as the headline metric):
    # "int8" = fused W8A8 MLPs only (~3e-4 cosine vs bf16); "int8_all" also
    # runs the attention projections through the fused int8 LN+qkv and
    # linear kernels (~1e-3 cosine)
    int8_ips: dict[str, float] = {}
    if quant is None and best_batch:
        import numpy as _np

        from clip_embedder_tpu.ops.quant import (DEFAULT_QUANT_PATHS,
                                                 QUANT_PATHS_ALL,
                                                 quantize_tree)

        np_params = jax.tree.map(_np.asarray, params)
        images = jnp.asarray(rng.integers(
            0, 255, size=(best_batch, src, src, 3), dtype=np.uint8))
        wh = jnp.broadcast_to(jnp.asarray(wh_np), (best_batch, target, src))
        ww = jnp.broadcast_to(jnp.asarray(ww_np), (best_batch, target, src))
        for qmode, qpaths in (("int8", DEFAULT_QUANT_PATHS),
                              ("int8_all", QUANT_PATHS_ALL)):
            try:
                qparams = jax.tree.map(
                    jnp.asarray, quantize_tree(np_params, paths=qpaths))
                dtq = tower_probe(qparams, images, wh, ww)()
                int8_ips[qmode] = round(best_batch / dtq, 2)
                print(f"{qmode} alternate (batch {best_batch}): "
                      f"{int8_ips[qmode]} img/s", file=sys.stderr)
            except Exception as e:  # noqa: BLE001
                print(f"{qmode} alternate failed: {type(e).__name__}",
                      file=sys.stderr)

    # p50 single-image latency, honest wall-clock including dispatch (the
    # second tracked metric in BASELINE.json)
    p50_ms = None
    try:
        one = jnp.asarray(rng.integers(0, 255, size=(1, src, src, 3),
                                       dtype=np.uint8))
        wh1 = jnp.asarray(wh_np)[None]
        ww1 = jnp.asarray(ww_np)[None]
        jax.block_until_ready(embed(params, one, wh1, ww1))
        times = []
        for _ in range(20):
            t0 = time.perf_counter()
            jax.block_until_ready(embed(params, one, wh1, ww1))
            times.append(time.perf_counter() - t0)
        p50_ms = round(sorted(times)[len(times) // 2] * 1e3, 2)
        print(f"p50 single-image (wall, incl. dispatch): {p50_ms} ms",
              file=sys.stderr)
    except Exception as e:  # noqa: BLE001
        print(f"p50 measurement failed: {type(e).__name__}", file=sys.stderr)
    result = {
        "metric": "images_per_sec_per_chip_vision_384px",
        "value": round(best, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(best / BASELINE_IMAGES_PER_SEC, 2),
        "detail": {
            "model": "ViT-SO400M-16-SigLIP2-384 (map pool)",
            "dtype": str(dtype.__name__ if hasattr(dtype, '__name__') else dtype),
            "batch": best_batch,
            "attn_impl": attn_impl,
            "quantize": quant or "none",
            "includes_preprocess": True,
            "int8_images_per_sec": int8_ips.get("int8"),
            "int8_all_images_per_sec": int8_ips.get("int8_all"),
            "methodology": (
                f"{iters} full steps chained on-device in one jitted "
                "fori_loop with cross-iteration data dependency; scalar "
                "readback; measured single-dispatch RTT subtracted "
                "(isolates device throughput from this env's ~29 ms "
                "tunnel dispatch RTT)"
            ),
            "p50_single_image_ms": p50_ms,
            "p50_note": "wall-clock incl. tunnel dispatch RTT",
            "p50_vs_baseline_988ms": (round(988.0 / p50_ms, 1) if p50_ms
                                      else None),
            "baseline": "988 ms/image, author CPU (reference README.md:110)",
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
