"""Benchmark the generic ONNX-executor fallback (clip_embedder_tpu.onnx_exec)
against the native towers — the perf disclosure for the "run any exported
open_clip model" capability (reference: src/onnx.rs:13-29 runs whatever
graph it is given; families without a native tower here — MobileCLIP-S0's
MCT text, CoCa, PE-Core — take this path).

Two probes, same on-device-chained methodology as bench_suite.py:
  1. a ViT-B/32-class visual tower exported with torch.onnx, run through
     the executor vs the native vit at the identical config (f32 both, the
     executor preserves the graph's numerics; bf16 native also shown — the
     deployment configuration),
  2. an MCT-like hybrid text tower (depthwise-conv token mixing +
     transformer blocks, MobileCLIP-S0 dims) through the executor vs the
     native text transformer at the same transformer dims.

    python benches/bench_onnx_fallback.py [--batch N]
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))
sys.path.insert(0, str(Path(__file__).parent.parent / "tests"))

import numpy as np


def _export_towers(tmp: Path):
    import torch
    import torch.nn.functional as F
    from torch import nn

    from test_onnx_exec import MctLikeTextTower, export
    from torch_ref import VisionTransformer

    torch.manual_seed(0)
    vt = VisionTransformer(224, 32, 768, 12, 12, 3072, 512).eval()
    # value-distinct params (torch.onnx dedups identical initializers —
    # fresh LN weights/MHA zero biases collapse otherwise)
    with torch.no_grad():
        for name, p in vt.named_parameters():
            if (p == p.flatten()[0]).all():
                p.add_(0.02 * torch.randn_like(p))

    class _Norm(nn.Module):
        def __init__(self, t):
            super().__init__()
            self.t = t

        def forward(self, x):
            return F.normalize(self.t(x), dim=-1)

    vis_path = tmp / "visual.onnx"
    export(_Norm(vt), torch.randn(2, 3, 224, 224), vis_path,
           input_name="pixel_values", output_name="image_embeds")

    class MctS0(MctLikeTextTower):
        """MobileCLIP-S0-scale hybrid (vocab 49408, ctx 77, dim 512)."""

        def __init__(self):
            super().__init__(vocab=49408, ctx=77, dim=512)
            layer = nn.TransformerEncoderLayer(
                512, 8, 2048, batch_first=True, norm_first=True, dropout=0.0)
            self.block = nn.TransformerEncoder(layer, 4)
            self.proj = nn.Linear(512, 512, bias=False)

    torch.manual_seed(1)
    mct = MctS0().eval()
    txt_path = tmp / "text.onnx"
    export(mct, torch.randint(0, 49408, (2, 77)), txt_path,
           input_name="input_ids", output_name="text_embeds")
    return vis_path, txt_path


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=16)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from benches.bench_suite import _time
    from clip_embedder_tpu.models import text_transformer, vit
    from clip_embedder_tpu.models.text_transformer import TextCfgResolved
    from clip_embedder_tpu.models.vit import ViTCfg
    from clip_embedder_tpu.onnx_exec import OnnxTower

    b = args.batch
    rng = np.random.default_rng(0)
    results = []
    with tempfile.TemporaryDirectory() as td:
        vis_path, txt_path = _export_towers(Path(td))

        # --- vision: executor vs native, identical ViT-B/32 config ---
        tower = OnnxTower(vis_path)
        oparams = {k: jnp.asarray(v) for k, v in tower.params.items()}
        onnx_fn = jax.jit(lambda p, x: tower(p, {"pixel_values": x}))
        pixels = jnp.asarray(rng.normal(size=(b, 3, 224, 224)), jnp.float32)
        dt_onnx = _time(onnx_fn, oparams, pixels)

        cfg = ViTCfg(image_size=224, patch_size=32, width=768, layers=12,
                     heads=12, mlp_hidden=3072, embed_dim=512, pool="cls",
                     ln_eps=1e-5)
        for dtype, tag in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
            params = vit.init(jax.random.key(0), cfg, dtype=dtype)
            fn = jax.jit(lambda p, x: vit.apply(
                p, x, cfg, channels_first=True,
                attn_impl="xla" if dtype == jnp.float32 else "pallas"))
            dt = _time(fn, params, pixels.astype(dtype))
            results.append({
                "metric": f"onnx_fallback/vitb32_native_{tag}_ms_per_image",
                "value": round(dt / b * 1e3, 3), "unit": "ms"})
            if dtype == jnp.float32:
                results.append({
                    "metric": "onnx_fallback/vitb32_executor_ms_per_image",
                    "value": round(dt_onnx / b * 1e3, 3), "unit": "ms",
                    "vs_baseline": round(dt / dt_onnx, 2)})

        # --- executor TPU modes on the ViT graph: bf16 autocast / int8 ---
        for mode_kw, tag in (({"compute_dtype": "bfloat16"}, "bf16"),
                             ({"quantize": True}, "int8")):
            mtower = OnnxTower(vis_path, **mode_kw)
            mparams = {k: jnp.asarray(v) for k, v in mtower.params.items()}
            mfn = jax.jit(lambda p, x, t=mtower: t(p, {"pixel_values": x}))
            dt_m = _time(mfn, mparams, pixels)
            results.append({
                "metric": f"onnx_fallback/vitb32_executor_{tag}_ms_per_image",
                "value": round(dt_m / b * 1e3, 3), "unit": "ms",
                "vs_baseline": round(dt_onnx / dt_m, 2)})  # vs f32 executor

        # --- text: MCT-hybrid executor vs native text tower, S0 dims ---
        tower_t = OnnxTower(txt_path)
        tparams_o = {k: jnp.asarray(v) for k, v in tower_t.params.items()}
        onnx_tfn = jax.jit(lambda p, i: tower_t(p, {"input_ids": i}))
        ids = jnp.asarray(rng.integers(1, 49000, (b, 77)), jnp.int32)
        dt_onnx_t = _time(onnx_tfn, tparams_o, ids)
        results.append({
            "metric": "onnx_fallback/mct_s0_executor_ms_per_text",
            "value": round(dt_onnx_t / b * 1e3, 3), "unit": "ms"})

        for mode_kw, tag in (({"compute_dtype": "bfloat16"}, "bf16"),
                             ({"quantize": True}, "int8")):
            mtower = OnnxTower(txt_path, **mode_kw)
            mparams = {k: jnp.asarray(v) for k, v in mtower.params.items()}
            mfn = jax.jit(lambda p, i, t=mtower: t(p, {"input_ids": i}))
            dt_m = _time(mfn, mparams, ids)
            results.append({
                "metric": f"onnx_fallback/mct_s0_executor_{tag}_ms_per_text",
                "value": round(dt_m / b * 1e3, 3), "unit": "ms",
                "vs_baseline": round(dt_onnx_t / dt_m, 2)})

        tcfg = TextCfgResolved(
            context_length=77, vocab_size=49408, width=512, heads=8,
            layers=4, mlp_hidden=2048, embed_dim=512, causal=False,
            pool="last")
        for dtype, tag in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
            tparams = text_transformer.init(jax.random.key(1), tcfg,
                                            dtype=dtype)
            tfn = jax.jit(lambda p, i: text_transformer.apply(p, i, tcfg))
            dt = _time(tfn, tparams, ids)
            results.append({
                "metric": f"onnx_fallback/text4l_native_{tag}_ms_per_text",
                "value": round(dt / b * 1e3, 3), "unit": "ms"})

    for r in results:
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
