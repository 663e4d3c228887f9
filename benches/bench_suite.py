"""Per-model benchmark suite (the reference's criterion harness analog —
reference: benches/model_bench.rs:7-48: 6 models × {vision/preprocess,
vision/embed, text/embed}).

Runs each model class with random weights (latency is weight-independent) on
the default JAX device and prints a table plus one JSON line per
measurement. Reference CPU numbers from README.md:106-115 are shown as
vs_baseline speedups where published.

    python benches/bench_suite.py [--models vit_so400m_siglip2_384,mobileclip2_s2] [--batch N]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

# model-class definitions: flagship reference models (reference:
# benches/model_bench.rs:8-13) expressed as tower configs.
MODELS: dict[str, dict] = {
    "vit_so400m_siglip2_384": dict(
        kind="vit", image=384, patch=16, width=1152, layers=27, heads=16,
        mlp=4304, pool="map", act="gelu_tanh",
        text=dict(ctx=64, vocab=32000, width=1152, heads=16, layers=27,
                  mlp=4304, causal=False, pool="last", embed=1152),
        baseline_vision_ms=988.0, baseline_text_ms=136.0,
    ),
    "vit_gopt_siglip2_384": dict(
        kind="vit", image=384, patch=16, width=1536, layers=40, heads=16,
        mlp=6144, pool="map", act="gelu_tanh",
        text=dict(ctx=64, vocab=32000, width=1152, heads=16, layers=27,
                  mlp=4304, causal=False, pool="last", embed=1152),
        baseline_vision_ms=2354.0, baseline_text_ms=128.0,
    ),
    "vit_h14_dfn5b_378": dict(
        kind="vit", image=378, patch=14, width=1280, layers=32, heads=16,
        mlp=5120, pool="cls", act="quick_gelu",
        text=dict(ctx=77, vocab=49408, width=1024, heads=16, layers=24,
                  mlp=4096, causal=True, pool="argmax", embed=1024),
        baseline_vision_ms=1860.0, baseline_text_ms=131.0,
    ),
    "mobileclip2_s2": dict(
        kind="fastvit", variant="fastvit_mci2", image=256,
        text=dict(ctx=77, vocab=49408, width=512, heads=8, layers=12,
                  mlp=2048, causal=True, pool="argmax", embed=512),
        baseline_vision_ms=75.0, baseline_text_ms=19.0,
    ),
    "mobileclip2_s3": dict(
        kind="fastvit", variant="fastvit_mci3", image=256,
        text=dict(ctx=77, vocab=49408, width=640, heads=10, layers=12,
                  mlp=2560, causal=True, pool="argmax", embed=640),
        baseline_vision_ms=116.0, baseline_text_ms=35.0,
    ),
    "mobileclip2_s4": dict(
        kind="fastvit", variant="fastvit_mci4", image=256,
        text=dict(ctx=77, vocab=49408, width=768, heads=12, layers=16,
                  mlp=3072, causal=True, pool="argmax", embed=768),
        baseline_vision_ms=192.0, baseline_text_ms=38.0,
    ),
    # PE-Core-bigG-14-448 (reference tested-model list: README.md:145) —
    # native rope_2d ViT tower; the reference publishes no timing for it,
    # so there is no vs_baseline column. Off by default (--models to run):
    # at 50 layers × W1536 × 1025 tokens it is the largest tower here.
    "pe_core_bigg_448": dict(
        kind="pe", image=448, patch=14, width=1536, layers=50, heads=16,
        mlp=8960, embed=1280, default=False,
        text=dict(ctx=72, vocab=49408, width=1280, heads=20, layers=24,
                  mlp=5120, causal=True, pool="argmax", embed=1280),
    ),
    # coca_ViT-L-14 (open_clip CoCa; the reference runs it as an exported
    # graph, here native: models/vit.py pool="attn" + text embed_cls).
    # No published reference timing, so no vs_baseline. Off by default.
    "coca_vit_l14_224": dict(
        kind="coca", image=224, patch=14, width=1024, layers=24, heads=16,
        mlp=4096, embed=768, default=False,
        text=dict(ctx=76, vocab=49408, width=768, heads=12, layers=12,
                  mlp=3072, causal=True, pool="last", embed=768,
                  embed_cls=True),
    ),
}


from benches.timing import chained_timer  # noqa: E402 — shared methodology


def _time(fn, params, x, *, iters=20):
    """Per-step time of ``fn(params, x)``, one chained-on-device reading
    through the shared ``benches.timing.chained_timer`` harness (fori_loop
    with a cross-iteration data dependency, full-sum reduction, dispatch
    RTT subtracted — see its docstring for why each piece exists)."""
    return chained_timer(lambda x_i, p: fn(p, x_i), x, params,
                         iters=iters)()


def bench_model(name: str, spec: dict, batch: int, attn_impl: str,
                quant: str | None = None) -> list[dict]:
    import jax
    import jax.numpy as jnp

    from clip_embedder_tpu.models import fastvit, text_transformer, vit
    from clip_embedder_tpu.models.fastvit import resolve_fastvit
    from clip_embedder_tpu.models.text_transformer import TextCfgResolved
    from clip_embedder_tpu.models.vit import ViTCfg
    from clip_embedder_tpu.config import VisionCfg
    from clip_embedder_tpu.ops.preprocess import (
        preprocess_weights_for, resize_normalize,
    )

    results = []
    rng = np.random.default_rng(0)
    image = spec["image"]

    # --- vision tower ---
    if spec["kind"] == "pe":
        # PE-Core: cls token + abs pos + 2-D axial rope + MAP pool (8
        # heads, ratio-4 MLP) + projection (models/build._parse_pe_core)
        vcfg = ViTCfg(
            image_size=image, patch_size=spec["patch"], width=spec["width"],
            layers=spec["layers"], heads=spec["heads"],
            mlp_hidden=spec["mlp"], embed_dim=spec["embed"],
            activation="gelu", use_class_token=True, use_ln_pre=True,
            pool="map", use_proj=True, ln_eps=1e-5, pos_embed_cls=True,
            rope_2d=True, pool_heads=8, pool_mlp_hidden=4 * spec["width"],
        )
        vparams = vit.init(jax.random.key(0), vcfg, dtype=jnp.bfloat16)
        vision_fn = jax.jit(lambda p, x: vit.apply(p, x, vcfg,
                                                   attn_impl=attn_impl,
                                                   channels_first=True))
        pre_layout = "nchw"
    elif spec["kind"] == "coca":
        # CoCa: classic CLIP stem + legacy boolean AttentionalPooler in
        # embed-dim space (models/build.resolve_vision attn pool path)
        vcfg = ViTCfg(
            image_size=image, patch_size=spec["patch"], width=spec["width"],
            layers=spec["layers"], heads=spec["heads"],
            mlp_hidden=spec["mlp"], embed_dim=spec["embed"],
            activation="gelu", use_class_token=True, use_ln_pre=True,
            pool="attn", use_proj=True, ln_eps=1e-5, pos_embed_cls=True,
            attn_pool_queries=256, attn_pool_dim=spec["embed"],
            pool_heads=8,
        )
        vparams = vit.init(jax.random.key(0), vcfg, dtype=jnp.bfloat16)
        vision_fn = jax.jit(lambda p, x: vit.apply(p, x, vcfg,
                                                   attn_impl=attn_impl,
                                                   channels_first=True))
        pre_layout = "nchw"
    elif spec["kind"] == "vit":
        is_map = spec["pool"] == "map"
        vcfg = ViTCfg(
            image_size=image, patch_size=spec["patch"], width=spec["width"],
            layers=spec["layers"], heads=spec["heads"], mlp_hidden=spec["mlp"],
            embed_dim=spec["width"] if is_map else 1024,
            activation=spec["act"], use_class_token=not is_map,
            use_ln_pre=not is_map, pool=spec["pool"], use_proj=not is_map,
            ln_eps=1e-6 if is_map else 1e-5, pos_embed_cls=not is_map,
        )
        vparams = vit.init(jax.random.key(0), vcfg, dtype=jnp.bfloat16)
        vision_fn = jax.jit(lambda p, x: vit.apply(p, x, vcfg,
                                                   attn_impl=attn_impl,
                                                   channels_first=True))
        pre_layout = "nchw"  # zero-transpose ViT handoff (ops.preprocess)
    else:
        vcfg = resolve_fastvit(spec["variant"], VisionCfg(image_size=image), 512, None)
        vparams = fastvit.init(jax.random.key(0), vcfg, dtype=jnp.bfloat16)
        vision_fn = jax.jit(lambda p, x: fastvit.apply(p, x, vcfg))
        pre_layout = "nhwc"
    if quant in ("int8", "int8_all"):
        from clip_embedder_tpu.ops.quant import (DEFAULT_QUANT_PATHS,
                                                 QUANT_PATHS_ALL,
                                                 quantize_tree)

        paths = QUANT_PATHS_ALL if quant == "int8_all" else DEFAULT_QUANT_PATHS
        vparams = jax.tree.map(
            jnp.asarray,
            quantize_tree(jax.tree.map(np.asarray, vparams), paths=paths))

    # preprocess (on-device) from 512px sources
    src = 512
    wh_np, ww_np = preprocess_weights_for(src, src, image)
    mean = jnp.asarray([0.5, 0.5, 0.5])
    std = jnp.asarray([0.5, 0.5, 0.5])
    imgs = jnp.asarray(rng.integers(0, 255, (batch, src, src, 3), dtype=np.uint8))
    wh = jnp.broadcast_to(jnp.asarray(wh_np), (batch, image, src))
    ww = jnp.broadcast_to(jnp.asarray(ww_np), (batch, image, src))

    pre_fn = jax.jit(lambda i, a, b: resize_normalize(
        i, a, b, mean, std, out_dtype=jnp.bfloat16, layout=pre_layout))
    # preprocess steps are sub-millisecond: chain many so the RTT
    # subtraction noise stays small relative to the signal
    dt_pre = _time(
        lambda _, whx: resize_normalize(imgs, whx, ww, mean, std,
                                        out_dtype=jnp.bfloat16,
                                        layout=pre_layout),
        None, wh, iters=300)
    results.append({"metric": f"{name}/vision_preprocess_ms_per_image",
                    "value": round(dt_pre / batch * 1e3, 4), "unit": "ms"})

    pixels = pre_fn(imgs, wh, ww)
    dt_vis = _time(vision_fn, vparams, pixels)
    entry = {"metric": f"{name}/vision_embed_ms_per_image",
             "value": round((dt_pre + dt_vis) / batch * 1e3, 3), "unit": "ms"}
    if spec.get("baseline_vision_ms"):
        entry["vs_baseline"] = round(
            spec["baseline_vision_ms"] / ((dt_pre + dt_vis) / batch * 1e3), 1)
    results.append(entry)

    # --- text tower ---
    t = spec["text"]
    tcfg = TextCfgResolved(
        context_length=t["ctx"], vocab_size=t["vocab"], width=t["width"],
        heads=t["heads"], layers=t["layers"], mlp_hidden=t["mlp"],
        embed_dim=t.get("embed", 512), causal=t["causal"], pool=t["pool"],
        embed_cls=t.get("embed_cls", False),
    )
    tparams = text_transformer.init(jax.random.key(1), tcfg, dtype=jnp.bfloat16)
    if quant in ("int8", "int8_all"):
        from clip_embedder_tpu.ops.quant import (DEFAULT_QUANT_PATHS,
                                                 QUANT_PATHS_ALL,
                                                 quantize_tree)

        paths = QUANT_PATHS_ALL if quant == "int8_all" else DEFAULT_QUANT_PATHS
        tparams = jax.tree.map(
            jnp.asarray,
            quantize_tree(jax.tree.map(np.asarray, tparams), paths=paths))
    ids = jnp.asarray(rng.integers(1, t["vocab"] - 1, (batch, t["ctx"])),
                      jnp.int32)
    text_fn = jax.jit(lambda p, i: text_transformer.apply(p, i, tcfg,
                                                          attn_impl=attn_impl))
    dt_txt = _time(text_fn, tparams, ids)
    entry = {"metric": f"{name}/text_embed_ms_per_text",
             "value": round(dt_txt / batch * 1e3, 3), "unit": "ms"}
    if spec.get("baseline_text_ms"):
        entry["vs_baseline"] = round(
            spec["baseline_text_ms"] / (dt_txt / batch * 1e3), 1)
    results.append(entry)
    return results


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--models",
        default=",".join(n for n, s in MODELS.items()
                         if s.get("default", True)))
    parser.add_argument("--batch", type=int, default=32)
    parser.add_argument("--attn", default="pallas",
                        choices=["xla", "pallas", "pallas_fast"])
    parser.add_argument("--quant", default=None,
                        choices=[None, "int8", "int8_all"],
                        help="W8A8 MLPs / + attention projections (opt-in)")
    args = parser.parse_args()

    from clip_embedder_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()

    measured = 0
    for name in args.models.split(","):
        name = name.strip()
        if name not in MODELS:
            print(f"unknown model '{name}' (choices: {', '.join(MODELS)})",
                  file=sys.stderr)
            continue
        try:
            for row in bench_model(name, MODELS[name], args.batch, args.attn,
                                   args.quant):
                print(json.dumps(row), flush=True)
                measured += 1
        except Exception as e:  # noqa: BLE001
            print(f"{name} failed: {type(e).__name__}: {e}", file=sys.stderr)
    if measured == 0:
        print("benchmark suite produced no measurements", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
