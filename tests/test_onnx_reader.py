"""ONNX reader tests: serialize a ModelProto by hand (independent protobuf
writer) and check the from-scratch parser recovers initializers — including
external-data blobs (the ``.onnx.data`` files of the reference's model-dir
contract, reference: src/model_manager.rs:16-17) and bfloat16 tensors —
then that a named-weights graph maps onto a tower pytree.
"""

import struct

import numpy as np
import pytest
import torch

from clip_embedder_tpu.onnx_reader import extract_tower_params, read_onnx
from clip_embedder_tpu.models.build import TowerSpec
from clip_embedder_tpu.models.vit import ViTCfg

from torch_ref import VisionTransformer


# -- minimal protobuf writer (test-only, independent of the parser) --------

def _varint(n: int) -> bytes:
    out = b""
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _tag(field: int, wtype: int) -> bytes:
    return _varint((field << 3) | wtype)


def _len_field(field: int, payload: bytes) -> bytes:
    return _tag(field, 2) + _varint(len(payload)) + payload


def _varint_field(field: int, value: int) -> bytes:
    return _tag(field, 0) + _varint(value)


def make_tensor(name: str, arr: np.ndarray, *, external: str | None = None,
                offset: int = 0, bfloat16: bool = False) -> bytes:
    body = b""
    for d in arr.shape:
        body += _varint_field(1, d)
    if bfloat16:
        body += _varint_field(2, 16)
    else:
        dtype_code = {np.float32: 1, np.int64: 7, np.float16: 10}[arr.dtype.type]
        body += _varint_field(2, dtype_code)
    body += _len_field(8, name.encode())
    if external is not None:
        entry = _len_field(1, b"location") + _len_field(2, external.encode())
        body += _len_field(13, entry)
        entry = _len_field(1, b"offset") + _len_field(2, str(offset).encode())
        body += _len_field(13, entry)
        body += _varint_field(14, 1)  # data_location = EXTERNAL
    else:
        body += _len_field(9, arr.tobytes())
    return body


def make_node(op: str, inputs: list[str], outputs: list[str],
              int_attrs: dict[str, int] | None = None) -> bytes:
    body = b"".join(_len_field(1, i.encode()) for i in inputs)
    body += b"".join(_len_field(2, o.encode()) for o in outputs)
    body += _len_field(4, op.encode())
    for k, v in (int_attrs or {}).items():
        attr = _len_field(1, k.encode()) + _varint_field(3, v)
        body += _len_field(5, attr)
    return body


def make_model(tensors: list[bytes], nodes: list[bytes] | None = None) -> bytes:
    graph = b"".join(_len_field(5, t) for t in tensors)
    if nodes is None:
        # a node, for structure-parsing coverage
        nodes = [make_node("Relu", ["x"], ["y"])]
    graph += b"".join(_len_field(1, n) for n in nodes)
    model = _varint_field(1, 8)  # ir_version
    model += _len_field(7, graph)
    return model


def test_square_weight_gemm_vs_matmul_orientation(tmp_path):
    """Square anonymous weights are shape-ambiguous: a Gemm(transB=1)
    consumer stores torch [out, in] and must transpose; a MatMul constant is
    already folded [in, out] and must not."""
    from clip_embedder_tpu.onnx_reader import _Puller, _pull_linear

    d = 8
    w_t = np.arange(d * d, dtype=np.float32).reshape(d, d)   # torch [out,in]
    bias = np.zeros(d, np.float32)
    w_m = np.ascontiguousarray(w_t.T)                        # folded [in,out]
    tensors = [make_tensor("gemm_w", w_t), make_tensor("gemm_b", bias),
               make_tensor("mm_w", w_m)]
    nodes = [make_node("Gemm", ["x", "gemm_w", "gemm_b"], ["y"],
                       {"alpha_unused": 1, "transB": 1}),
             make_node("MatMul", ["y", "mm_w"], ["z"])]
    path = tmp_path / "model.onnx"
    path.write_bytes(make_model(tensors, nodes))

    p = _Puller(read_onnx(path))
    lin_gemm = _pull_linear(p, d, d, what="gemm square")
    np.testing.assert_array_equal(lin_gemm["w"], w_t.T)
    lin_mm = _pull_linear(p, d, d, what="matmul square", bias=False)
    np.testing.assert_array_equal(lin_mm["w"], w_m)


def test_roundtrip_raw_and_external_and_bf16(tmp_path):
    rng = np.random.default_rng(0)
    a = rng.standard_normal((3, 4)).astype(np.float32)
    b = (rng.standard_normal((2, 5)) * 10).astype(np.float32)
    ids = np.arange(6, dtype=np.int64).reshape(2, 3)

    (tmp_path / "model.onnx.data").write_bytes(b.tobytes())

    bf = rng.standard_normal((4, 2)).astype(np.float32)
    bf16_bytes = (bf.view(np.uint32) >> 16).astype(np.uint16).tobytes()

    # hand-assemble the bf16 tensor (raw_data carries uint16 payload)
    bf16_body = b""
    for d in bf.shape:
        bf16_body += _varint_field(1, d)
    bf16_body += _varint_field(2, 16)
    bf16_body += _len_field(8, b"w_bf16")
    bf16_body += _len_field(9, bf16_bytes)

    model = make_model([
        make_tensor("w_a", a),
        make_tensor("w_b", b, external="model.onnx.data"),
        make_tensor("ids", ids),
        bf16_body,
    ])
    path = tmp_path / "model.onnx"
    path.write_bytes(model)

    g = read_onnx(path)
    np.testing.assert_array_equal(g.initializers["w_a"], a)
    np.testing.assert_array_equal(g.initializers["w_b"], b)
    np.testing.assert_array_equal(g.initializers["ids"], ids)
    # bf16 → f32 upcast loses the low mantissa bits we chopped
    np.testing.assert_allclose(g.initializers["w_bf16"], bf, atol=0.04, rtol=0.01)
    assert g.nodes == [("Relu", ["x"], ["y"], {})]


def test_extract_named_weights_end_to_end(tmp_path):
    """A visual.onnx whose initializers carry torch state-dict names (the
    common torch.onnx export case) must map straight onto the ViT pytree."""
    torch.manual_seed(0)
    tm = VisionTransformer(16, 8, 32, 2, 4, 64, 24).eval()
    tensors = [
        make_tensor(f"model.visual.{k}", v.detach().numpy())
        for k, v in tm.state_dict().items()
    ]
    path = tmp_path / "visual.onnx"
    path.write_bytes(make_model(tensors))

    cfg = ViTCfg(image_size=16, patch_size=8, width=32, layers=2, heads=4,
                 mlp_hidden=64, embed_dim=24)
    params = extract_tower_params(path, TowerSpec("vit", cfg), tower="visual")

    assert params["patch_embed"]["w"].shape == (8 * 8 * 3, 32)
    assert params["blocks"]["attn"]["q"]["w"].shape == (2, 32, 32)
    assert params["proj"]["w"].shape == (32, 24)

    # and the mapped params must reproduce the torch forward
    import jax.numpy as jnp
    from clip_embedder_tpu.models import vit

    x = torch.randn(2, 3, 16, 16)
    ref = tm(x).detach().numpy()
    got = np.asarray(vit.apply(params, jnp.asarray(x.permute(0, 2, 3, 1).numpy()), cfg))
    cos = (got * ref).sum(-1)
    assert (cos > 1 - 1e-6).all()


def test_structural_extraction_folded_names(tmp_path):
    """Constant-folded exports lose parameter names (onnx::MatMul_123).
    Structural recovery reassigns by consumption order + shape and must
    reproduce the torch forward."""
    torch.manual_seed(1)
    tm = VisionTransformer(16, 8, 32, 2, 4, 64, 24).eval()
    sd = tm.state_dict()

    # Build the folded-layout parameter sequence in forward-consumption
    # order with anonymous names (Linear weights stored transposed, the
    # way the exporter folds them into MatMul constants).
    seq = []
    seq.append(sd["conv1.weight"].numpy())                       # Conv keeps layout
    seq.append(sd["class_embedding"].numpy())
    seq.append(sd["positional_embedding"].numpy())
    seq += [sd["ln_pre.weight"].numpy(), sd["ln_pre.bias"].numpy()]
    for i in range(2):
        p = f"transformer.resblocks.{i}"
        seq += [sd[f"{p}.ln_1.weight"].numpy(), sd[f"{p}.ln_1.bias"].numpy()]
        seq.append(sd[f"{p}.attn.in_proj_weight"].numpy().T)     # folded [d, 3d]
        seq.append(sd[f"{p}.attn.in_proj_bias"].numpy())
        seq.append(sd[f"{p}.attn.out_proj.weight"].numpy().T)
        seq.append(sd[f"{p}.attn.out_proj.bias"].numpy())
        seq += [sd[f"{p}.ln_2.weight"].numpy(), sd[f"{p}.ln_2.bias"].numpy()]
        seq.append(sd[f"{p}.mlp.c_fc.weight"].numpy().T)
        seq.append(sd[f"{p}.mlp.c_fc.bias"].numpy())
        seq.append(sd[f"{p}.mlp.c_proj.weight"].numpy().T)
        seq.append(sd[f"{p}.mlp.c_proj.bias"].numpy())
    seq += [sd["ln_post.weight"].numpy(), sd["ln_post.bias"].numpy()]
    seq.append(sd["proj"].numpy())                               # already [in, out]

    tensors = []
    nodes = b""
    prev = b"input"
    for i, arr in enumerate(seq):
        name = f"onnx::MatMul_{100 + i}"
        tensors.append(make_tensor(name, np.ascontiguousarray(
            arr.astype(np.float32))))
        out = f"t{i}".encode()
        nodes += _len_field(1, (_len_field(1, prev) + _len_field(1, name.encode())
                                + _len_field(2, out) + _len_field(4, b"MatMul")))
        prev = out

    graph = b"".join(_len_field(5, t) for t in tensors) + nodes
    model = _varint_field(1, 8) + _len_field(7, graph)
    path = tmp_path / "visual.onnx"
    path.write_bytes(model)

    cfg = ViTCfg(image_size=16, patch_size=8, width=32, layers=2, heads=4,
                 mlp_hidden=64, embed_dim=24)
    params = extract_tower_params(path, TowerSpec("vit", cfg), tower="visual")

    import jax.numpy as jnp
    from clip_embedder_tpu.models import vit

    x = torch.randn(2, 3, 16, 16)
    ref = tm(x).detach().numpy()
    got = np.asarray(
        vit.apply(params, jnp.asarray(x.permute(0, 2, 3, 1).numpy()), cfg))
    cos = (got * ref).sum(-1)
    assert (cos > 1 - 1e-6).all()


def test_mixed_name_graph_falls_back_to_structural(tmp_path):
    """Realistic constant-folded torch exports keep LN/conv/param names but
    fold Linear weights to anonymous constants; extraction must fall back
    from name-based mapping to structural recovery."""
    torch.manual_seed(2)
    tm = VisionTransformer(16, 8, 32, 2, 4, 64, 24).eval()
    sd = tm.state_dict()

    def named(key):
        return f"model.visual.{key}"

    seq = []  # (name, array) in consumption order
    seq.append((named("conv1.weight"), sd["conv1.weight"].numpy()))
    seq.append((named("class_embedding"), sd["class_embedding"].numpy()))
    seq.append((named("positional_embedding"), sd["positional_embedding"].numpy()))
    seq.append((named("ln_pre.weight"), sd["ln_pre.weight"].numpy()))
    seq.append((named("ln_pre.bias"), sd["ln_pre.bias"].numpy()))
    anon = iter(range(1000, 2000))
    for i in range(2):
        p = f"transformer.resblocks.{i}"
        seq.append((named(f"{p}.ln_1.weight"), sd[f"{p}.ln_1.weight"].numpy()))
        seq.append((named(f"{p}.ln_1.bias"), sd[f"{p}.ln_1.bias"].numpy()))
        seq.append((f"onnx::MatMul_{next(anon)}", sd[f"{p}.attn.in_proj_weight"].numpy().T))
        seq.append((named(f"{p}.attn.in_proj_bias"), sd[f"{p}.attn.in_proj_bias"].numpy()))
        seq.append((f"onnx::MatMul_{next(anon)}", sd[f"{p}.attn.out_proj.weight"].numpy().T))
        seq.append((named(f"{p}.attn.out_proj.bias"), sd[f"{p}.attn.out_proj.bias"].numpy()))
        seq.append((named(f"{p}.ln_2.weight"), sd[f"{p}.ln_2.weight"].numpy()))
        seq.append((named(f"{p}.ln_2.bias"), sd[f"{p}.ln_2.bias"].numpy()))
        seq.append((f"onnx::MatMul_{next(anon)}", sd[f"{p}.mlp.c_fc.weight"].numpy().T))
        seq.append((named(f"{p}.mlp.c_fc.bias"), sd[f"{p}.mlp.c_fc.bias"].numpy()))
        seq.append((f"onnx::MatMul_{next(anon)}", sd[f"{p}.mlp.c_proj.weight"].numpy().T))
        seq.append((named(f"{p}.mlp.c_proj.bias"), sd[f"{p}.mlp.c_proj.bias"].numpy()))
    seq.append((named("ln_post.weight"), sd["ln_post.weight"].numpy()))
    seq.append((named("ln_post.bias"), sd["ln_post.bias"].numpy()))
    seq.append((f"onnx::MatMul_{next(anon)}", sd["proj"].numpy()))

    tensors = []
    nodes = b""
    prev = b"input"
    for i, (name, arr) in enumerate(seq):
        tensors.append(make_tensor(name, np.ascontiguousarray(arr.astype(np.float32))))
        out = f"t{i}".encode()
        nodes += _len_field(1, (_len_field(1, prev) + _len_field(1, name.encode())
                                + _len_field(2, out) + _len_field(4, b"MatMul")))
        prev = out
    graph = b"".join(_len_field(5, t) for t in tensors) + nodes
    path = tmp_path / "visual.onnx"
    path.write_bytes(_varint_field(1, 8) + _len_field(7, graph))

    cfg = ViTCfg(image_size=16, patch_size=8, width=32, layers=2, heads=4,
                 mlp_hidden=64, embed_dim=24)
    params = extract_tower_params(path, TowerSpec("vit", cfg), tower="visual")

    import jax.numpy as jnp
    from clip_embedder_tpu.models import vit

    x = torch.randn(2, 3, 16, 16)
    ref = tm(x).detach().numpy()
    got = np.asarray(vit.apply(params, jnp.asarray(x.permute(0, 2, 3, 1).numpy()), cfg))
    cos = (got * ref).sum(-1)
    assert (cos > 1 - 1e-6).all()


def test_reference_style_onnx_dir_end_to_end(tmp_path):
    """A complete reference-style model dir (ONNX weights, all 9 contract
    files) must load through Clip.from_local_dir: weights convert from the
    graphs on first load, cache as visual.npz/text.npz, and serve classify;
    a second load must use the cache."""
    import json

    import jax.numpy as jnp

    from clip_embedder_tpu import Clip
    from torch_ref import TextTransformer

    sys_path_hack = None  # noqa: F841 (test_tokenizer import below)
    from test_tokenizer import make_clip_style_spec

    d = tmp_path / "onnx_model"
    d.mkdir()
    occ = {
        "model_cfg": {
            "embed_dim": 24,
            "vision_cfg": {"image_size": 16, "layers": 2, "width": 32,
                           "patch_size": 8, "head_width": 8},
            "text_cfg": {"context_length": 8, "vocab_size": 120, "width": 32,
                         "heads": 4, "layers": 2},
        },
        "preprocess_cfg": {"mean": [0.5, 0.5, 0.5], "std": [0.3, 0.3, 0.3]},
    }
    (d / "open_clip_config.json").write_text(json.dumps(occ))
    (d / "model_config.json").write_text(json.dumps({
        "tokenizer_needs_lowercase": False, "activation_function": "softmax",
        "logit_scale": 50.0, "logit_bias": 0.0, "pad_id": 0,
        "vocab_size": 120}))
    (d / "tokenizer.json").write_text(json.dumps(make_clip_style_spec()))
    # the contract's remaining files (content irrelevant to loading)
    (d / "tokenizer_config.json").write_text("{}")
    (d / "special_tokens_map.json").write_text("{}")

    torch.manual_seed(3)
    vt = VisionTransformer(16, 8, 32, 2, 4, 128, 24).eval()
    tt = TextTransformer(8, 120, 32, 4, 2, 128, 24).eval()
    (d / "visual.onnx").write_bytes(make_model([
        make_tensor(f"model.visual.{k}", v.numpy())
        for k, v in vt.state_dict().items()]))
    (d / "text.onnx").write_bytes(make_model([
        make_tensor(f"model.{k}", v.numpy())
        for k, v in tt.state_dict().items()]))

    # mlp_hidden=128 → head_width 8 → heads 4; mlp_ratio must match the
    # torch model: width 32 * 4.0 = 128 ✓ (default ratio)
    clip = Clip.from_local_dir(d)
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (30, 40, 3), dtype=np.uint8)
    results = clip.classify(img, ["a photo of a cat", "a photo of a dog"])
    assert abs(sum(p for _, p in results) - 1.0) < 1e-5
    assert (d / "visual.npz").is_file() and (d / "text.npz").is_file()

    # second load comes from the npz cache and must agree
    clip2 = Clip.from_local_dir(d)
    np.testing.assert_allclose(
        clip2.vision.embed_image(img), clip.vision.embed_image(img), atol=1e-6)

    # and the towers must match the torch source models
    x = torch.randn(2, 3, 16, 16)
    ref = vt(x).detach().numpy()
    import clip_embedder_tpu.models.vit as vit_mod

    got = np.asarray(vit_mod.apply(
        clip.vision.params, jnp.asarray(x.permute(0, 2, 3, 1).numpy()),
        clip.vision.spec.cfg))
    cos = (got * ref).sum(-1)
    assert (cos > 1 - 1e-5).all()


def _typed_tensor(name: str, dtype_code: int, dims: list[int],
                  values: list[int], *, packed: bool) -> bytes:
    """TensorProto with data in the typed int32/int64 fields (field 5/7)
    instead of raw_data — the non-torch-exporter encoding."""
    body = b""
    for d in dims:
        body += _varint_field(1, d)
    body += _varint_field(2, dtype_code)
    body += _len_field(8, name.encode())
    field = 7 if dtype_code == 7 else 5
    def enc(v):  # plain two's-complement 64-bit varint
        return _varint(v & ((1 << 64) - 1))
    if packed:
        body += _len_field(field, b"".join(enc(v) for v in values))
    else:
        for v in values:
            body += _varint_field(field, v & ((1 << 64) - 1))
    return body


def test_typed_field_int32_negative_and_unpacked(tmp_path):
    """Negative int32 in int32_data is a 64-bit sign-extended varint (not
    32-bit two's complement); unpacked repeated encoding must parse too."""
    from clip_embedder_tpu.onnx_reader import read_onnx

    tensors = [
        _typed_tensor("neg_packed", 6, [3], [-1, 2, -300], packed=True),
        _typed_tensor("neg_unpacked", 6, [2], [-7, 5], packed=False),
        _typed_tensor("i64_unpacked", 7, [2], [-9, 4], packed=False),
    ]
    path = tmp_path / "t.onnx"
    path.write_bytes(make_model(tensors))
    g = read_onnx(path)
    np.testing.assert_array_equal(g.initializers["neg_packed"], [-1, 2, -300])
    np.testing.assert_array_equal(g.initializers["neg_unpacked"], [-7, 5])
    np.testing.assert_array_equal(g.initializers["i64_unpacked"], [-9, 4])


def test_typed_field_fp16_bit_patterns(tmp_path):
    """fp16 initializers may live element-wise in int32_data as bit
    patterns (ONNX spec); values, not bit-ints, must come out."""
    from clip_embedder_tpu.onnx_reader import read_onnx

    vals = np.asarray([1.5, -0.25, 0.0], np.float16)
    bits = [int(b) for b in vals.view(np.uint16)]
    path = tmp_path / "h.onnx"
    path.write_bytes(make_model(
        [_typed_tensor("half", 10, [3], bits, packed=True)]))
    g = read_onnx(path)
    np.testing.assert_array_equal(
        g.initializers["half"].astype(np.float32), vals.astype(np.float32))


def _fake_graph(entries):
    """Build an OnnxGraph whose consumption order is the given
    [(name, array, consumer_op)] list."""
    from clip_embedder_tpu.onnx_reader import OnnxGraph

    g = OnnxGraph()
    for i, (name, arr, op) in enumerate(entries):
        g.initializers[name] = arr
        g.nodes.append((op, [name], [f"out{i}"], {}))
    return g


def test_packed_probe_does_not_steal_ratio3_mlp_weight():
    """A packed-qkv probe on a tower whose MLP hidden is exactly 3x width
    must NOT consume the MatMul-consumed fc weight sitting later in the
    lookahead window (it previously matched by shape alone and skipped the
    separate q/k/v projections entirely)."""
    from clip_embedder_tpu.onnx_reader import _maybe_packed, _Puller

    d = 8
    rng = np.random.default_rng(0)
    entries = [
        ("q", rng.standard_normal((d, d)), "MatMul"),
        ("k", rng.standard_normal((d, d)), "MatMul"),
        ("v", rng.standard_normal((d, d)), "MatMul"),
        ("out", rng.standard_normal((d, d)), "MatMul"),
        ("ln2_g", rng.standard_normal((d,)), "Mul"),
        ("ln2_b", rng.standard_normal((d,)), "Add"),
        ("fc", rng.standard_normal((d, 3 * d)), "MatMul"),  # ratio-3 MLP
        ("fc_b", rng.standard_normal((3 * d,)), "Add"),
        ("proj", rng.standard_normal((3 * d, d)), "MatMul"),
    ]
    p = _Puller(_fake_graph(entries))
    assert _maybe_packed(p, (3 * d, d), (d, 3 * d)) is None
    assert p.pos == 0  # nothing consumed, separate path starts at q

    # a REAL packed in_proj (Split-consumed) is still found, full window
    packed = [("in_proj", rng.standard_normal((3 * d, d)), "Split")] \
        + entries[3:]
    p2 = _Puller(_fake_graph(packed))
    got = _maybe_packed(p2, (3 * d, d), (d, 3 * d))
    assert got is not None and got.shape == (3 * d, d)

    # a MatMul-consumed packed weight adjacent to the probe position is
    # accepted via the short window (folded in_proj, Split on the output)
    folded = [("in_proj", rng.standard_normal((d, 3 * d)), "MatMul")] \
        + entries[3:]
    p3 = _Puller(_fake_graph(folded))
    got = _maybe_packed(p3, (3 * d, d), (d, 3 * d))
    assert got is not None and got.shape == (d, 3 * d)


def test_rewind_pull_takes_late_bias_without_skipping_weights():
    """rewind=True consumes a later-ordered parameter (packed attention
    bias exported after the projection weights) without advancing pos past
    the unconsumed weights in between."""
    from clip_embedder_tpu.onnx_reader import _Puller

    d = 4
    rng = np.random.default_rng(1)
    entries = [
        ("q", rng.standard_normal((d, d)), "MatMul"),
        ("k", rng.standard_normal((d, d)), "MatMul"),
        ("v", rng.standard_normal((d, d)), "MatMul"),
        ("in_proj_bias", rng.standard_normal((3 * d,)), "Slice"),
        ("out", rng.standard_normal((d, d)), "MatMul"),
    ]
    p = _Puller(_fake_graph(entries))
    b = p.maybe((3 * d,), rewind=True)
    assert b is not None and p.pos == 0
    for want in ("q", "k", "v", "out"):
        p.pull((d, d), what=want)
        assert p.last_name == want


@pytest.mark.parametrize("data,match", [
    (b"", "No graph"),
    (b"\x12\x34\x56\x78" * 100, "wire type"),
    (bytes([0x3a, 0xff, 0xff, 0xff, 0x7f]) + b"abc", "Truncated"),
])
def test_malformed_onnx_raises_typed_error(tmp_path, data, match):
    """Corrupt / cut-off .onnx files fail loudly with WeightError (never
    parse as an empty graph — a truncated download must not degrade to a
    'no initializers' message downstream)."""
    from clip_embedder_tpu.errors import WeightError
    from clip_embedder_tpu.onnx_reader import read_onnx

    p = tmp_path / "bad.onnx"
    p.write_bytes(data)
    with pytest.raises(WeightError, match=match):
        read_onnx(p)
