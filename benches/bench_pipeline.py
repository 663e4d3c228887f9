"""End-to-end bulk-indexing benchmark: JPEG bytes → decode (host threads)
→ on-device preprocess → tower → embeddings.

This is the reference's ``examples/search.rs`` workload measured honestly:
unlike bench.py (pure device throughput, chained on-device), this includes
JPEG decode, host→device transfer, and one dispatch per batch — in this
environment each dispatch rides a ~29 ms tunnel a production host does not
pay, so the wall number is a lower bound (printed alongside the estimated
tunnel share).

Usage: python benches/bench_pipeline.py [--n 512] [--batch 32]
       [--src 512] [--quant int8_all] [--attn pallas_fast]
"""

from __future__ import annotations

import argparse
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def make_jpegs(n: int, src: int, out_dir: Path) -> list[Path]:
    from PIL import Image

    rng = np.random.default_rng(0)
    paths = []
    # low-frequency content so files have realistic JPEG decode cost
    base = rng.integers(0, 255, size=(src // 8, src // 8, 3), dtype=np.uint8)
    for i in range(n):
        arr = np.asarray(
            Image.fromarray(base).resize((src, src), Image.BILINEAR),
            np.uint8)
        arr = np.clip(
            arr.astype(np.int16)
            + rng.integers(-20, 20, arr.shape, dtype=np.int16),
            0, 255).astype(np.uint8)
        p = out_dir / f"img_{i:04d}.jpg"
        Image.fromarray(arr).save(p, quality=85)
        paths.append(p)
    return paths


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=512)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--src", type=int, default=512)
    ap.add_argument("--quant", default=None)
    ap.add_argument("--attn", default="pallas_fast")
    ap.add_argument("--decode-workers", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from clip_embedder_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()

    from benches.timing import dispatch_rtt
    from clip_embedder_tpu.config import ModelConfig, OpenClipConfig
    from clip_embedder_tpu.models import vit
    from clip_embedder_tpu.models.build import TowerSpec
    from clip_embedder_tpu.models.zoo import so400m_siglip2_384
    from clip_embedder_tpu.parallel.pipeline import EmbedPipeline
    from clip_embedder_tpu.vision import VisionEmbedder

    with tempfile.TemporaryDirectory() as td:
        tmp = Path(td)
        paths = make_jpegs(args.n, args.src, tmp)
        sizes = [p.stat().st_size for p in paths]
        print(f"{args.n} JPEGs, median {np.median(sizes)/1024:.0f} KiB",
              file=sys.stderr)

        cfg = so400m_siglip2_384()
        occ = OpenClipConfig.from_dict({
            "model_cfg": {
                "embed_dim": cfg.embed_dim,
                "vision_cfg": {"image_size": cfg.image_size,
                               "patch_size": cfg.patch_size,
                               "layers": cfg.layers, "width": cfg.width},
                "text_cfg": {"context_length": 64, "vocab_size": 32000,
                             "width": cfg.width},
            },
            "preprocess_cfg": {"mean": [0.5] * 3, "std": [0.5] * 3,
                               "interpolation": "bicubic",
                               "resize_mode": "squash"},
        })
        mc = ModelConfig.from_dict({
            "tokenizer_needs_lowercase": True,
            "activation_function": "sigmoid",
            "logit_scale": 100.0, "logit_bias": -10.0, "pad_id": 1,
        })
        params = vit.init(jax.random.key(0), cfg, dtype=jnp.bfloat16)
        if args.quant:
            from clip_embedder_tpu.ops.quant import (DEFAULT_QUANT_PATHS,
                                                     QUANT_PATHS_ALL,
                                                     quantize_tree)

            qpaths = (QUANT_PATHS_ALL if args.quant == "int8_all"
                      else DEFAULT_QUANT_PATHS)
            params = jax.tree.map(
                jnp.asarray,
                quantize_tree(jax.tree.map(np.asarray, params),
                              paths=qpaths))
        emb = VisionEmbedder(
            params=params, spec=TowerSpec("vit", cfg), config=occ,
            model_config=mc, model_dir=tmp, dtype=jnp.bfloat16,
            attn_impl=args.attn, quantize=None)
        pipe = EmbedPipeline(emb, batch_size=args.batch,
                             decode_workers=args.decode_workers)

        # warmup: compile + prime decode pool
        next(iter(pipe.embed_iter(paths[:args.batch])))

        t0 = time.perf_counter()
        total = 0
        for block in pipe.embed_iter(paths):
            total += block.shape[0]
        wall = time.perf_counter() - t0
        assert total == args.n

        # Measure this environment's tunnel cost per batch: ship one staged
        # batch and force materialization with a scalar readback (NB:
        # jax.block_until_ready does NOT force the tunnel copy here — only
        # an actual readback does). A production host moves the same bytes
        # over PCIe/DMA at GB/s; the estimate below subtracts the measured
        # tunnel share and charges nothing in its place.
        from PIL import Image

        arrays = [np.asarray(Image.open(p).convert("RGB"), np.uint8)
                  for p in paths[:args.batch]]
        staged = emb.preprocessor.stage_host_batch_unique(arrays)
        probe = jax.jit(lambda b, w1, w2, i: (
            b.astype(jnp.float32).sum() + w1.sum() + w2.sum()
            + i.astype(jnp.float32).sum()))
        float(probe(*(jnp.asarray(s) for s in staged)))  # compile
        t1 = time.perf_counter()
        for _ in range(3):
            float(probe(*(jnp.asarray(np.ascontiguousarray(s))
                          for s in staged)))
        tunnel_batch_s = max(
            (time.perf_counter() - t1) / 3 - dispatch_rtt(), 0.0)
        n_dispatch = -(-args.n // args.batch)
        tunnel_s = (tunnel_batch_s + dispatch_rtt()) * n_dispatch
        staged_mb = sum(s.nbytes for s in staged) / 1e6
        # Upper bound only: the depth-1 device pipeline already hides an
        # unmeasurable part of each batch's tunnel transfer behind the
        # previous batch's readback, so subtracting the full serial tunnel
        # time over-credits production. True production sits between the
        # raw wall rate and this bound.
        prod_hi = args.n / max(wall - tunnel_s, 1e-9)
        print(
            f"e2e: {args.n} images in {wall:.2f}s → {args.n/wall:.1f} img/s "
            f"wall ({wall/args.n*1e3:.2f} ms/img incl. decode); tunnel "
            f"share ≤ {tunnel_s:.2f}s ({staged_mb:.0f} MB staged/batch at "
            f"~{staged_mb/max(tunnel_batch_s,1e-9):.0f} MB/s serial) → "
            f"production between {args.n/wall:.0f} and ~{prod_hi:.0f} img/s",
            file=sys.stderr)
        import json
        print(json.dumps({
            "metric": "pipeline_images_per_sec_e2e",
            "value": round(args.n / wall, 2),
            "unit": "images/sec",
            "detail": {
                "n": args.n, "batch": args.batch, "src": args.src,
                "quant": args.quant or "none", "attn": args.attn,
                "includes": "jpeg decode + host->device + preprocess + tower",
                "staged_mb_per_batch": round(staged_mb, 1),
                "serial_tunnel_share_s": round(tunnel_s, 2),
                "production_estimate_upper_img_s": round(prod_hi, 1),
            },
        }))


if __name__ == "__main__":
    main()
