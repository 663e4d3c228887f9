"""ONNX executor tests: export real torch models with torch.onnx (the same
exporter the reference's pull_onnx.py uses, opset 18 — reference:
pull_onnx.py:159-181) and check the from-scratch JAX executor reproduces
torch's outputs. This is the "run any exported open_clip model" fallback
(reference capability: src/onnx.rs:13-29 executes arbitrary graphs)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F
from torch import nn

import jax
import jax.numpy as jnp

from clip_embedder_tpu.onnx_exec import OnnxTower
from clip_embedder_tpu.errors import WeightError

# torch's legacy exporter calls _add_onnxscript_fn unconditionally, which
# imports the (uninstalled) `onnx` package just to re-serialize the proto.
# For models without custom onnxscript functions the step is a no-op, so
# shim it to identity — the exported bytes are unchanged.
from torch.onnx._internal.torchscript_exporter import (  # noqa: E402
    onnx_proto_utils as _opu,
)

_opu._add_onnxscript_fn = lambda model_bytes, custom_opsets: model_bytes


def export(model, dummy, path, input_name="input", output_name="output"):
    torch.onnx.export(
        model, dummy, str(path),
        input_names=[input_name], output_names=[output_name],
        dynamic_axes={input_name: {0: "batch"}, output_name: {0: "batch"}},
        opset_version=18, do_constant_folding=True, dynamo=False,
    )


def run_tower(path, feeds):
    tower = OnnxTower(path)
    params = {k: jnp.asarray(v) for k, v in tower.params.items()}
    fn = jax.jit(lambda p, f: tower(p, f))
    return np.asarray(fn(params, feeds))


def test_mlp_layernorm_gelu(tmp_path):
    torch.manual_seed(0)
    model = nn.Sequential(
        nn.Linear(32, 64), nn.GELU(), nn.LayerNorm(64), nn.Linear(64, 16),
        nn.Softmax(dim=-1),
    ).eval()
    x = torch.randn(3, 32)
    path = tmp_path / "mlp.onnx"
    export(model, x, path)
    with torch.no_grad():
        ref = model(x).numpy()
    got = run_tower(path, {"input": jnp.asarray(x.numpy())})
    np.testing.assert_allclose(got, ref, atol=2e-5)


class TinyTextTower(nn.Module):
    """CLIP-style text tower: embed → pos → transformer → argmax-EOT pool
    → proj → L2 normalize (the exporter wrapper bakes normalize=True,
    reference: pull_onnx.py:53-68)."""

    def __init__(self, vocab=64, ctx=12, dim=32, heads=4):
        super().__init__()
        self.tok = nn.Embedding(vocab, dim)
        self.pos = nn.Parameter(0.02 * torch.randn(ctx, dim))
        layer = nn.TransformerEncoderLayer(
            dim, heads, dim * 2, batch_first=True, norm_first=True,
            dropout=0.0)
        self.encoder = nn.TransformerEncoder(layer, 2)
        self.ln = nn.LayerNorm(dim)
        self.proj = nn.Linear(dim, 16, bias=False)

    def forward(self, ids):
        x = self.tok(ids) + self.pos
        x = self.encoder(x)
        x = self.ln(x)
        pooled = x[torch.arange(x.shape[0]), ids.argmax(dim=-1)]
        return F.normalize(self.proj(pooled), dim=-1)


def test_text_tower_with_argmax_pooling(tmp_path):
    torch.manual_seed(1)
    model = TinyTextTower().eval()
    ids = torch.randint(0, 64, (2, 12))
    path = tmp_path / "text.onnx"
    export(model, ids, path, input_name="input_ids",
           output_name="text_embeddings")
    with torch.no_grad():
        ref = model(ids).numpy()
    got = run_tower(path, {"input_ids": jnp.asarray(ids.numpy())})
    np.testing.assert_allclose(got, ref, atol=5e-5)
    np.testing.assert_allclose(np.linalg.norm(got, axis=-1), 1.0, atol=1e-5)


class MctLikeTextTower(nn.Module):
    """MobileCLIP-S0-style hybrid text encoder: 1-D depthwise-conv mixing
    blocks + a transformer layer + last-token pooling. The native families
    don't model this — the ONNX fallback must run it."""

    def __init__(self, vocab=64, ctx=12, dim=32):
        super().__init__()
        self.tok = nn.Embedding(vocab, dim)
        self.dw = nn.Conv1d(dim, dim, 5, padding=2, groups=dim)
        self.pw = nn.Conv1d(dim, dim, 1)
        self.bn = nn.BatchNorm1d(dim)
        layer = nn.TransformerEncoderLayer(
            dim, 4, dim * 2, batch_first=True, norm_first=True, dropout=0.0)
        self.block = nn.TransformerEncoder(layer, 1)
        self.ln = nn.LayerNorm(dim)
        self.proj = nn.Linear(dim, 16, bias=False)

    def forward(self, ids):
        x = self.tok(ids)                       # [B, T, C]
        c = x.transpose(1, 2)                   # [B, C, T]
        c = self.bn(self.pw(torch.relu(self.dw(c))))
        x = x + c.transpose(1, 2)
        x = self.block(x)
        pooled = self.ln(x)[:, -1]
        return F.normalize(self.proj(pooled), dim=-1)


def test_mct_like_hybrid_text_tower(tmp_path):
    torch.manual_seed(2)
    model = MctLikeTextTower().eval()
    ids = torch.randint(0, 64, (2, 12))
    path = tmp_path / "text.onnx"
    export(model, ids, path, input_name="input_ids",
           output_name="text_embeddings")
    with torch.no_grad():
        ref = model(ids).numpy()
    got = run_tower(path, {"input_ids": jnp.asarray(ids.numpy())})
    np.testing.assert_allclose(got, ref, atol=5e-5)


class TinyConvTower(nn.Module):
    def __init__(self, embed_dim=8):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 8, 3, stride=2, padding=1)
        self.bn = nn.BatchNorm2d(8)
        self.pool = nn.MaxPool2d(2)
        self.conv2 = nn.Conv2d(8, 16, 3, padding=1, groups=8)
        self.head = nn.Linear(16, embed_dim)

    def forward(self, x):
        x = self.pool(torch.relu(self.bn(self.conv1(x))))
        x = torch.nn.functional.hardswish(self.conv2(x))
        x = x.mean(dim=(2, 3))
        return F.normalize(self.head(x), dim=-1)


def test_conv_tower(tmp_path):
    torch.manual_seed(3)
    model = TinyConvTower().eval()
    x = torch.randn(2, 3, 16, 16)
    path = tmp_path / "visual.onnx"
    export(model, x, path, input_name="pixel_values",
           output_name="image_embeddings")
    with torch.no_grad():
        ref = model(x).numpy()
    got = run_tower(path, {"pixel_values": jnp.asarray(x.numpy())})
    np.testing.assert_allclose(got, ref, atol=5e-5)


def test_unsupported_op_raises(tmp_path):
    class Weird(nn.Module):
        def forward(self, x):
            return torch.fft.rfft(x, dim=-1).real

    x = torch.randn(2, 8)
    path = tmp_path / "weird.onnx"
    try:
        export(Weird().eval(), x, path)
    except Exception:
        pytest.skip("exporter rejected the op before our executor could")
    with pytest.raises(WeightError, match="unsupported op"):
        run_tower(path, {"input": jnp.asarray(x.numpy())})


def _write_model_dir(tmp_path, image_size=16, ctx=12):
    import json
    import sys

    sys.path.insert(0, str(Path(__file__).parent))
    from test_tokenizer import make_clip_style_spec

    d = tmp_path / "model"
    d.mkdir()
    occ = {
        "model_cfg": {
            "embed_dim": 16,
            "vision_cfg": {"image_size": image_size, "layers": 2,
                           "width": 64, "patch_size": 8, "head_width": 16},
            "text_cfg": {"context_length": ctx, "vocab_size": 64,
                         "width": 64, "heads": 4, "layers": 2},
        },
        "preprocess_cfg": {"mean": [0.5, 0.5, 0.5], "std": [0.5, 0.5, 0.5]},
    }
    (d / "open_clip_config.json").write_text(json.dumps(occ))
    (d / "model_config.json").write_text(json.dumps({
        "tokenizer_needs_lowercase": False,
        "activation_function": "softmax", "logit_scale": 20.0,
        "logit_bias": 0.0, "pad_id": 0}))
    (d / "tokenizer.json").write_text(json.dumps(make_clip_style_spec()))
    return d


from pathlib import Path  # noqa: E402


def test_clip_end_to_end_with_onnx_fallback_towers(tmp_path):
    """A model dir whose exported towers don't match any native family must
    still serve through Clip — the reference's run-any-graph capability.
    The text tower is the MCT-like hybrid (conv+transformer); the vision
    tower is a conv net the config mis-describes (structural extraction
    fails → ONNX fallback)."""
    from clip_embedder_tpu import Clip

    d = _write_model_dir(tmp_path)
    torch.manual_seed(7)
    export(MctLikeTextTower(ctx=12).eval(), torch.randint(0, 64, (2, 12)),
           d / "text.onnx", input_name="input_ids",
           output_name="text_embeddings")
    export(TinyConvTower(embed_dim=16).eval(), torch.randn(2, 3, 16, 16),
           d / "visual.onnx", input_name="pixel_values",
           output_name="image_embeddings")

    clip = Clip.from_local_dir(d)
    assert clip.text.spec.family == "onnx"
    assert clip.vision.spec.family == "onnx"
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (20, 24, 3), dtype=np.uint8)
    results = clip.classify(img, ["a cat", "a dog", "a beignet"])
    probs = [p for _, p in results]
    assert abs(sum(probs) - 1) < 1e-4
    assert sorted(probs, reverse=True) == probs
    embs = clip.vision.embed_images([img, img])
    np.testing.assert_allclose(np.linalg.norm(embs, axis=-1), 1.0, atol=1e-4)
    # duplicate() shares the jitted graph (no recompile) like native families
    dup = clip.duplicate()
    r2 = dup.classify(img, ["a cat", "a dog", "a beignet"])
    assert all(abs(a[1] - b[1]) < 1e-5 for a, b in zip(results, r2))


def test_executor_tpu_modes_bf16_and_int8(tmp_path):
    """The fallback family rides the same TPU levers as the native towers:
    ``dtype=bfloat16`` autocasts the MatMul/Gemm/Conv operands (f32
    accumulation), ``quantize="int8"`` runs W8A8 MatMuls against
    pre-quantized initializers. Both must stay within quantization
    tolerance of the exported-f32 executor on an MCT-like hybrid dir."""
    from clip_embedder_tpu import TextEmbedder

    d = _write_model_dir(tmp_path)
    torch.manual_seed(9)
    # dim 64: MatMul weights reach the executor's quantization floor
    model = MctLikeTextTower(vocab=64, ctx=12, dim=64).eval()
    export(model, torch.randint(0, 64, (2, 12)), d / "text.onnx",
           input_name="input_ids", output_name="text_embeddings")
    export(TinyConvTower(embed_dim=16).eval(), torch.randn(2, 3, 16, 16),
           d / "visual.onnx", input_name="pixel_values",
           output_name="image_embeddings")  # dir contract needs both towers

    texts = ["a cat", "the dog!", "a beignet of dogs"]
    base = TextEmbedder.from_local_dir(d)
    assert base.spec.family == "onnx"
    ref = base.embed_texts(texts)

    bf16 = TextEmbedder.from_local_dir(d, dtype=jnp.bfloat16)
    assert bf16.spec.cfg.compute_dtype == "bfloat16"
    got = bf16.embed_texts(texts)
    cos = (got * ref).sum(-1)
    assert (cos > 1 - 5e-3).all(), cos

    q = TextEmbedder.from_local_dir(d, quantize="int8")
    assert q.spec.cfg.quantize
    from clip_embedder_tpu.onnx_exec import get_tower

    assert get_tower(q.spec.cfg).quant_names  # something actually quantized
    qgot = q.embed_texts(texts)
    qcos = (qgot * ref).sum(-1)
    assert (qcos > 1 - 5e-3).all(), qcos
    np.testing.assert_allclose(np.linalg.norm(qgot, axis=-1), 1.0, atol=1e-3)


def test_executor_int8_raises_when_nothing_quantizes(tmp_path):
    """quantize="int8" on a graph with no eligible MatMul weights must fail
    loudly (the embedders' no-silent-noop contract), not serve f32."""
    from clip_embedder_tpu import TextEmbedder
    from clip_embedder_tpu.errors import ConfigError

    d = _write_model_dir(tmp_path)
    torch.manual_seed(10)
    # dim 32 < the 64-wide quantization floor → nothing eligible
    export(MctLikeTextTower(vocab=64, ctx=12, dim=32).eval(),
           torch.randint(0, 64, (2, 12)), d / "text.onnx",
           input_name="input_ids", output_name="text_embeddings")
    export(TinyConvTower(embed_dim=16).eval(), torch.randn(2, 3, 16, 16),
           d / "visual.onnx", input_name="pixel_values",
           output_name="image_embeddings")
    with pytest.raises(ConfigError, match="quantiz"):
        TextEmbedder.from_local_dir(d, quantize="int8")


def test_slice_reverse_and_overclamp_semantics(tmp_path):
    """ONNX Slice edge cases the review flagged: reverse slices (torch Flip
    exports start=-1, end=INT_MIN, step=-1) and ends far below zero on a
    positive step (must be empty, not near-full)."""
    import numpy as np_

    from clip_embedder_tpu.onnx_exec import _slice_op

    x = np_.arange(5)
    env = {"x": x, "st": np_.array([-1]), "en": np_.array([-(2 ** 63) + 1]),
           "ax": np_.array([0]), "sp": np_.array([-1])}
    out = _slice_op(env, ["x", "st", "en", "ax", "sp"], {})
    np_.testing.assert_array_equal(out, [4, 3, 2, 1, 0])

    env2 = {"x": x, "st": np_.array([0]), "en": np_.array([-1000]),
            "ax": np_.array([0]), "sp": np_.array([1])}
    out2 = _slice_op(env2, ["x", "st", "en", "ax", "sp"], {})
    assert out2.size == 0

    # end=-1 means "stop before the last element"
    env3 = {"x": x, "st": np_.array([0]), "en": np_.array([-1]),
            "ax": np_.array([0]), "sp": np_.array([1])}
    np_.testing.assert_array_equal(
        _slice_op(env3, ["x", "st", "en", "ax", "sp"], {}), [0, 1, 2, 3])


def test_batchnorm_op_runs_with_epsilon(tmp_path):
    """BatchNormalization arity + epsilon attr (review finding: the handler
    crashed on any BN graph)."""
    torch.manual_seed(5)
    bn = nn.BatchNorm1d(8, eps=1e-3)
    bn.weight.data.uniform_(0.5, 1.5)
    bn.bias.data.uniform_(-1, 1)
    bn.running_mean.uniform_(-1, 1)
    bn.running_var.uniform_(0.5, 2.0)
    model = nn.Sequential(nn.Linear(8, 8), bn).eval()
    x = torch.randn(4, 8)
    path = tmp_path / "bn.onnx"
    export(model, x, path)
    with torch.no_grad():
        ref = model(x).numpy()
    got = run_tower(path, {"input": jnp.asarray(x.numpy())})
    np.testing.assert_allclose(got, ref, atol=5e-5)


def test_pad_reflect_and_ceil_mode_pool(tmp_path):
    """Pad honors the mode attribute (reflect previously executed as a
    silent zero-pad) and MaxPool honors ceil_mode (previously floor)."""

    class PadPool(nn.Module):
        def forward(self, x):
            y = F.pad(x, (1, 1, 1, 1), mode="reflect")
            y = F.max_pool2d(y, 3, stride=2, ceil_mode=True)
            return y.flatten(1)

    model = PadPool().eval()
    x = torch.randn(2, 3, 11, 11)
    path = tmp_path / "padpool.onnx"
    export(model, x, path)
    with torch.no_grad():
        ref = model(x).numpy()
    got = run_tower(path, {"input": jnp.asarray(x.numpy())})
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_avgpool_ceil_mode_count_include_pad_divisor(tmp_path):
    """AveragePool with ceil_mode + count_include_pad: torch counts the
    explicit padding in the divisor but NOT the ceil-mode extension
    (advisor finding: a flat prod(kernel) divisor made boundary-window
    averages too small)."""
    # 10×10 input, k=3 s=2 p=1: span 12 → floor gives 5 windows, ceil 6 —
    # the 6th row/col of windows overhangs into the ceil extension
    model = nn.AvgPool2d(3, stride=2, padding=1, ceil_mode=True,
                         count_include_pad=True).eval()
    x = torch.randn(2, 3, 10, 10)
    path = tmp_path / "avgceil.onnx"
    export(model, x, path)
    with torch.no_grad():
        ref = model(x).numpy()
    got = run_tower(path, {"input": jnp.asarray(x.numpy())})
    assert got.shape == ref.shape == (2, 3, 6, 6)
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_avgpool_ceil_mode_exclude_pad(tmp_path):
    """Same geometry with count_include_pad=False (the counts path)."""
    model = nn.AvgPool2d(3, stride=2, padding=1, ceil_mode=True,
                         count_include_pad=False).eval()
    x = torch.randn(1, 2, 10, 10)
    path = tmp_path / "avgceil2.onnx"
    export(model, x, path)
    with torch.no_grad():
        ref = model(x).numpy()
    got = run_tower(path, {"input": jnp.asarray(x.numpy())})
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_pad_unsupported_mode_raises(tmp_path):
    """An exotic Pad mode must raise WeightError, not silently zero-pad
    (the module's unsupported-op contract)."""
    from clip_embedder_tpu.onnx_exec import _pad_op

    env = {"x": jnp.ones((1, 4)), "pads": np.asarray([0, 1, 0, 1])}
    with pytest.raises(WeightError, match="Pad mode"):
        _pad_op(env, ["x", "pads"], {"mode": b"hypercube"})
    # sanity: the supported modes run
    for mode in (b"constant", b"reflect", b"edge", b"wrap"):
        out = _pad_op(env, ["x", "pads"], {"mode": mode})
        assert out.shape == (1, 6)


def test_div_integer_truncation():
    """ONNX Div on integer tensors truncates toward zero (matching the
    host-fold path); floats use true division."""
    from clip_embedder_tpu.onnx_exec import _div

    x = jnp.asarray([-7, 7, -1], jnp.int64)
    y = jnp.asarray([2, -2, 3], jnp.int64)
    np.testing.assert_array_equal(np.asarray(_div(x, y)), [-3, -3, 0])
    f = _div(jnp.asarray([-7.0]), jnp.asarray([2.0]))
    np.testing.assert_allclose(np.asarray(f), [-3.5])


def test_corrupt_native_weights_surface_not_reroute(tmp_path):
    """A present-but-corrupt native .npz must raise WeightError — not
    silently reroute the tower to the ONNX-graph interpreter."""
    import shutil

    from clip_embedder_tpu import Clip
    from clip_embedder_tpu.errors import WeightError as WErr

    src = Path(__file__).parent / "fixtures" / "golden_model"
    d = tmp_path / "model"
    shutil.copytree(src, d)
    (d / "text.npz").write_bytes(b"not an npz archive")
    # a text.onnx exists, so the old behavior would have quietly fallen
    # back to the graph executor (and then failed confusingly on parse)
    (d / "text.onnx").write_bytes(b"\x08\x07")
    with pytest.raises(WErr, match="text.npz"):
        Clip.from_local_dir(d)


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_random_towers_match_torch(tmp_path, seed):
    """Structural fuzz of the run-any-graph claim: randomized small towers
    assembled from the op families real exports use (linear/conv/norm/
    activation/pool/residual/attention), exported with torch.onnx and
    executed by the from-scratch interpreter; outputs must match torch."""
    rng = np.random.default_rng(seed)
    torch.manual_seed(seed)

    class RandTower(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv = nn.Conv2d(3, 8, 3, stride=2,
                                  padding=int(rng.integers(0, 2)))
            self.bn = nn.BatchNorm2d(8)
            self.act1 = [nn.GELU(), nn.SiLU(), nn.ReLU(),
                         nn.Hardswish()][int(rng.integers(0, 4))]
            self.pool = [nn.MaxPool2d(2, ceil_mode=bool(rng.integers(0, 2))),
                         nn.AvgPool2d(2)][int(rng.integers(0, 2))]
            width = int(rng.integers(2, 5)) * 16
            self.proj_in = nn.Linear(8, width)
            self.ln = nn.LayerNorm(width)
            self.attn = nn.MultiheadAttention(width, 4, batch_first=True)
            self.mlp = nn.Sequential(
                nn.Linear(width, width * 2),
                [nn.GELU(), nn.Tanh()][int(rng.integers(0, 2))],
                nn.Linear(width * 2, width))
            self.head = nn.Linear(width, 12)
            self.res = bool(rng.integers(0, 2))

        def forward(self, x):
            y = self.pool(self.act1(self.bn(self.conv(x))))
            y = y.flatten(2).transpose(1, 2)       # [B, T, 8]
            y = self.ln(self.proj_in(y))
            a, _ = self.attn(y, y, y, need_weights=False)
            y = y + a if self.res else a
            y = y + self.mlp(self.ln(y)) if self.res else self.mlp(y)
            y = y.mean(dim=1)
            return F.normalize(self.head(y), dim=-1)

    model = RandTower().eval()
    x = torch.randn(2, 3, 26, 26)
    path = tmp_path / f"fuzz_{seed}.onnx"
    export(model, x, path)
    with torch.no_grad():
        ref = model(x).numpy()
    got = run_tower(path, {"input": jnp.asarray(x.numpy())})
    np.testing.assert_allclose(got, ref, atol=5e-4)


def test_variadic_min_max_and_pow_promotion():
    """ONNX Min/Max take 1..N inputs; Pow promotes mixed int/float types
    (casting 0.5 to an int exponent would compute x**0)."""
    from clip_embedder_tpu.onnx_exec import _OPS, _pow

    a = jnp.asarray([3.0, -1.0]); b = jnp.asarray([2.0, 5.0])
    c = jnp.asarray([1.0, 0.0])
    env = {"a": a, "b": b, "c": c}
    np.testing.assert_array_equal(
        np.asarray(_OPS["Min"](env, ["a", "b", "c"], {})), [1.0, -1.0])
    np.testing.assert_array_equal(
        np.asarray(_OPS["Max"](env, ["a", "b", "c"], {})), [3.0, 5.0])
    got = _pow(jnp.asarray([4, 9], jnp.int32), jnp.asarray(0.5))
    np.testing.assert_array_equal(np.asarray(got), [2, 3])


def test_if_static_condition(tmp_path):
    """torch guards shape-dependent paths with If over statically-foldable
    conditions (e.g. inside multi_head_attention_forward); the executor
    inlines the chosen branch at trace time. The mirror's If condition
    depends on a traced shape, which the executor folds to a static bool."""

    class Gated(nn.Module):
        def forward(self, x):
            if x.shape[-1] == 32:  # traces to an If in scripted exports
                return torch.nn.functional.softmax(x, dim=-1)
            return x * 2.0

    # scripting (not tracing) preserves the branch as an ONNX If
    model = torch.jit.script(Gated().eval())
    path = tmp_path / "if.onnx"
    torch.onnx.export(model, torch.randn(2, 32), str(path),
                      input_names=["input"], output_names=["output"],
                      opset_version=18, dynamo=False)
    from clip_embedder_tpu.onnx_reader import read_onnx

    g = read_onnx(path)
    if not any(op == "If" for op, *_ in g.nodes):
        pytest.skip("exporter folded the branch — nothing to test")
    x = np.random.default_rng(0).standard_normal((2, 32)).astype(np.float32)
    got = run_tower(path, {"input": jnp.asarray(x)})
    with torch.no_grad():
        ref = Gated()(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(got, ref, atol=1e-6)
