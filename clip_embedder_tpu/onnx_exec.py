"""Generic ONNX-graph executor on JAX — the "run any exported model" path.

The reference runs *arbitrary* exported open_clip graphs because ONNX
Runtime executes whatever ``visual.onnx``/``text.onnx`` contains
(reference: src/onnx.rs:13-29, pull_onnx.py:159-181). This framework's
native towers cover the families worth hand-optimizing (scan-stacked
pytrees + Pallas kernels); for anything else — MobileCLIP-S0's MCT hybrid
text tower, CoCa, register-token ViTs, future exports — this module
interprets the ONNX graph directly into jitted XLA ops, so the model-dir
contract keeps its "any open_clip model" capability claim.

Execution model (designed for ``jax.jit`` tracing):

* The graph (from onnx_reader.read_onnx, which parses full node
  attributes) is walked in file order — torch exports are topologically
  sorted.
* Initializers are passed in as a pytree argument, so weights are device
  buffers, not baked constants.
* Shape computations stay host-side: ``Shape`` returns a concrete numpy
  array (shapes are static under jit), and any node whose inputs are all
  host constants evaluates with numpy (``_NP_FOLD``) — jnp ops would STAGE
  into the jaxpr even on concrete inputs, turning shape chains into
  tracers. So the standard torch-export pattern (Shape → Gather → Mod →
  Reshape → Slice ends) folds to Python ints before reaching a primitive
  that needs static arguments. A shape argument that turns out to be
  data-dependent raises a clear error instead of miscompiling.

Unsupported ops raise ``WeightError`` naming the op, mirroring the typed
failure the reference surfaces for unrunnable graphs.
"""

from __future__ import annotations

import functools

from pathlib import Path
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from .errors import WeightError
from .onnx_reader import _DTYPES, OnnxGraph, read_onnx

Value = Any  # np.ndarray (host constant) | jax.Array | tracer


def _is_static(v: Value) -> bool:
    return not isinstance(v, jax.core.Tracer)


def _static_ints(v: Value, what: str) -> list[int]:
    if not _is_static(v):
        raise WeightError(
            f"ONNX executor: {what} is data-dependent (dynamic shapes are "
            "not supported under jit)")
    return [int(x) for x in np.asarray(v).reshape(-1)]


def _static_scalar(v: Value, what: str) -> float:
    if not _is_static(v):
        raise WeightError(f"ONNX executor: {what} must be static")
    return float(np.asarray(v).reshape(()))


_CAST = {code: np.dtype(dt) for code, dt in _DTYPES.items()}
_CAST[16] = np.dtype(np.float32)  # bf16 attr tensors arrive upcast


def _axes_arg(inputs, env, attrs, idx=1):
    """Reduce*/Squeeze/Unsqueeze axes: attr (≤opset 13) or input (18)."""
    if "axes" in attrs:
        return list(attrs["axes"]) if isinstance(attrs["axes"], list) else [
            attrs["axes"]]
    if len(inputs) > idx and inputs[idx]:
        return _static_ints(env[inputs[idx]], "axes")
    return None


def _reduce(fn, x, axes, keepdims):
    axes_t = None if axes is None else tuple(axes)
    return fn(x, axis=axes_t, keepdims=bool(keepdims))


def _conv(x, w, b, attrs):
    group = int(attrs.get("group", 1))
    strides = tuple(attrs.get("strides", [1] * (x.ndim - 2)))
    dil = tuple(attrs.get("dilations", [1] * (x.ndim - 2)))
    spatial = x.ndim - 2
    if attrs.get("auto_pad", b"NOTSET") not in (b"NOTSET", "NOTSET"):
        raise WeightError("ONNX executor: auto_pad convs not supported")
    pads = attrs.get("pads", [0] * (2 * spatial))
    pad_pairs = tuple((pads[i], pads[i + spatial]) for i in range(spatial))
    dn = jax.lax.conv_dimension_numbers(
        x.shape, w.shape,
        ("NCHW", "OIHW", "NCHW") if spatial == 2 else ("NCH", "OIH", "NCH"))
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), strides, pad_pairs, rhs_dilation=dil,
        dimension_numbers=dn, feature_group_count=group,
        preferred_element_type=jnp.float32).astype(x.dtype)
    if b is not None:
        y = y + b.astype(y.dtype).reshape((1, -1) + (1,) * spatial)
    return y


def _pool(x, attrs, kind):
    spatial = x.ndim - 2
    ks = tuple(attrs["kernel_shape"])
    strides = tuple(attrs.get("strides", [1] * spatial))
    if any(d != 1 for d in attrs.get("dilations", [1] * spatial)):
        raise WeightError("Pool dilations != 1 not supported")
    pads = attrs.get("pads", [0] * (2 * spatial))
    pad_pairs = [(pads[i], pads[i + spatial]) for i in range(spatial)]
    explicit_pairs = list(pad_pairs)
    if int(attrs.get("ceil_mode", 0)):
        # ceil output dims: extend the high-side padding so reduce_window's
        # floor arithmetic lands on ceil((in + pads - k)/s) + 1 windows
        # (the extra region pads with the reduction identity; for avg the
        # count denominator already excludes it)
        for i in range(spatial):
            span = x.shape[2 + i] + pad_pairs[i][0] + pad_pairs[i][1]
            out = -(-(span - ks[i]) // strides[i]) + 1
            need = (out - 1) * strides[i] + ks[i] - span
            if need > 0:
                pad_pairs[i] = (pad_pairs[i][0], pad_pairs[i][1] + need)
    pad_pairs = tuple(pad_pairs)
    window = (1, 1) + ks
    strides_full = (1, 1) + strides
    pad_full = ((0, 0), (0, 0)) + pad_pairs
    if kind == "max":
        init = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else (
            jnp.iinfo(x.dtype).min)
        return jax.lax.reduce_window(x, init, jax.lax.max, window,
                                     strides_full, pad_full)
    s = jax.lax.reduce_window(x.astype(jnp.float32), 0.0, jax.lax.add,
                              window, strides_full, pad_full)
    if int(attrs.get("count_include_pad", 0)):
        ceil_extra = tuple((0, pad_pairs[i][1] - explicit_pairs[i][1])
                           for i in range(spatial))
        if any(e for _, e in ceil_extra):
            # torch semantics (the source of these exports): the divisor
            # counts explicit padding but NOT the ceil-mode extension — a
            # flat prod(kernel) would make boundary averages too small
            ones = jnp.pad(jnp.ones(x.shape[2:], jnp.float32),
                           explicit_pairs, constant_values=1.0)[None, None]
            counts = jax.lax.reduce_window(
                ones, 0.0, jax.lax.add, window, strides_full,
                ((0, 0), (0, 0)) + ceil_extra)
            return (s / counts).astype(x.dtype)
        denom = float(np.prod(ks))
        return (s / denom).astype(x.dtype)
    ones = jnp.ones(x.shape[2:], jnp.float32)[None, None]
    counts = jax.lax.reduce_window(ones, 0.0, jax.lax.add, window,
                                   strides_full, pad_full)
    return (s / counts).astype(x.dtype)


def _gemm(env, inputs, attrs):
    a = jnp.asarray(env[inputs[0]])
    b = jnp.asarray(env[inputs[1]])
    if int(attrs.get("transA", 0)):
        a = a.T
    if int(attrs.get("transB", 0)):
        b = b.T
    y = jnp.dot(a, b, preferred_element_type=jnp.float32)
    y = y * float(attrs.get("alpha", 1.0))
    if len(inputs) > 2 and inputs[2]:
        y = y + float(attrs.get("beta", 1.0)) * jnp.asarray(env[inputs[2]])
    return y.astype(a.dtype)


def _slice_op(env, inputs, attrs):
    x = env[inputs[0]]
    if "starts" in attrs:  # opset 9 attribute form
        starts = list(attrs["starts"])
        ends = list(attrs["ends"])
        axes = list(attrs.get("axes", range(len(starts))))
        steps = [1] * len(starts)
    else:
        starts = _static_ints(env[inputs[1]], "Slice starts")
        ends = _static_ints(env[inputs[2]], "Slice ends")
        axes = (_static_ints(env[inputs[3]], "Slice axes")
                if len(inputs) > 3 and inputs[3] else list(range(len(starts))))
        steps = (_static_ints(env[inputs[4]], "Slice steps")
                 if len(inputs) > 4 and inputs[4] else [1] * len(starts))
    index: list[slice] = [slice(None)] * np.ndim(x)
    for st, en, ax, sp in zip(starts, ends, axes, steps):
        # ONNX Slice semantics: negative indices count from the end BEFORE
        # clamping; for negative steps an end below 0 (e.g. INT_MIN) means
        # "run past the first element" (python stop=None).
        dim = x.shape[ax]
        st2 = st + dim if st < 0 else st
        en2 = en + dim if en < 0 else en
        if sp > 0:
            lo = min(max(st2, 0), dim)
            hi = min(max(en2, 0), dim)
            index[ax] = slice(lo, hi, sp) if sp != 1 else slice(lo, hi)
        else:
            lo = min(max(st2, 0), dim - 1)
            stop = None if en2 < 0 else min(en2, dim - 1)
            index[ax] = slice(lo, stop, sp)
    return x[tuple(index)]


def _reshape(env, inputs, attrs):
    x = env[inputs[0]]
    shape = _static_ints(env[inputs[1]], "Reshape shape")
    out: list[int] = []
    for i, s in enumerate(shape):
        if s == 0 and not int(attrs.get("allowzero", 0)):
            out.append(x.shape[i])
        else:
            out.append(s)
    return jnp.reshape(jnp.asarray(x), out)


def _expand(env, inputs):
    x = jnp.asarray(env[inputs[0]])
    shape = _static_ints(env[inputs[1]], "Expand shape")
    # ONNX Expand is bidirectional broadcast
    nd = max(x.ndim, len(shape))
    xs = (1,) * (nd - x.ndim) + x.shape
    sh = [1] * (nd - len(shape)) + list(shape)
    target = tuple(max(a, b) for a, b in zip(xs, sh))
    return jnp.broadcast_to(x.reshape(xs), target)


def _gather_nd(data, indices, batch_dims=0):
    data = jnp.asarray(data)
    indices = jnp.asarray(indices)
    if batch_dims:
        # flatten batch dims and vmap
        def one(d, idx):
            return _gather_nd(d, idx, 0)
        fn = one
        for _ in range(batch_dims):
            fn = jax.vmap(fn)
        return fn(data, indices)
    flat_idx = tuple(jnp.moveaxis(indices, -1, 0))
    return data[flat_idx]


def _layer_norm(env, inputs, attrs):
    x = jnp.asarray(env[inputs[0]])
    axis = int(attrs.get("axis", -1))
    eps = float(attrs.get("epsilon", 1e-5))
    ct = jnp.promote_types(x.dtype, jnp.float32)
    x32 = x.astype(ct)
    axes = tuple(range(axis % x.ndim, x.ndim))
    mean = jnp.mean(x32, axis=axes, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=axes, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * jnp.asarray(env[inputs[1]]).astype(ct)
    if len(inputs) > 2 and inputs[2]:
        y = y + jnp.asarray(env[inputs[2]]).astype(ct)
    return y.astype(x.dtype)


def _batch_norm(env, inputs, attrs):
    x, scale, bias, mean, var = (jnp.asarray(env[n]) for n in inputs[:5])
    eps = float(attrs.get("epsilon", 1e-5))
    ct = jnp.promote_types(x.dtype, jnp.float32)
    shape = (1, -1) + (1,) * (x.ndim - 2)
    y = (x.astype(ct) - mean.astype(ct).reshape(shape)) * jax.lax.rsqrt(
        var.astype(ct).reshape(shape) + eps)
    y = y * scale.astype(ct).reshape(shape) + bias.astype(ct).reshape(shape)
    return y.astype(x.dtype)


def _pow(x, y):
    """ONNX Pow: inputs may differ in type; compute in the promoted type
    and cast back to the base's dtype (casting the exponent to an integer
    base's dtype would truncate e.g. 0.5 → 0)."""
    x, y = jnp.asarray(x), jnp.asarray(y)
    ct = jnp.promote_types(x.dtype, y.dtype)
    return jnp.power(x.astype(ct), y.astype(ct)).astype(x.dtype)


def _div(x, y):
    """ONNX Div: C-style truncation toward zero for integer operands
    (matching the host-fold path's _np_div), true division otherwise."""
    x, y = jnp.asarray(x), jnp.asarray(y)
    if (jnp.issubdtype(x.dtype, jnp.integer)
            and jnp.issubdtype(y.dtype, jnp.integer)):
        ct = jnp.promote_types(x.dtype, y.dtype)
        return jax.lax.div(x.astype(ct), y.astype(ct))
    return jnp.divide(x, y)


def _arg_minmax(fn, x, attrs):
    axis = int(attrs.get("axis", 0))
    out = fn(x, axis=axis)
    if int(attrs.get("keepdims", 1)):
        out = jnp.expand_dims(out, axis)
    return out.astype(jnp.int64)


def _resolve_ops() -> dict[str, Callable]:
    e = {}  # populated below via closures taking (env, inputs, attrs)

    def unary(fn):
        return lambda env, i, a: fn(jnp.asarray(env[i[0]]))

    def binary(fn):
        return lambda env, i, a: fn(env[i[0]], env[i[1]])

    e["Identity"] = lambda env, i, a: env[i[0]]
    e["Dropout"] = lambda env, i, a: env[i[0]]
    e["Add"] = binary(jnp.add)
    e["Sub"] = binary(jnp.subtract)
    e["Mul"] = binary(jnp.multiply)
    e["Div"] = binary(_div)
    e["Pow"] = binary(_pow)
    e["MatMul"] = binary(lambda x, y: jnp.matmul(
        jnp.asarray(x), jnp.asarray(y),
        preferred_element_type=jnp.promote_types(jnp.asarray(x).dtype,
                                                 jnp.float32)
    ).astype(jnp.asarray(x).dtype))
    e["Gemm"] = _gemm
    e["Neg"] = unary(jnp.negative)
    e["Abs"] = unary(jnp.abs)
    e["Exp"] = unary(jnp.exp)
    e["Log"] = unary(jnp.log)
    e["Sqrt"] = unary(jnp.sqrt)
    e["Reciprocal"] = unary(lambda x: 1.0 / x)
    e["Erf"] = unary(jax.lax.erf)
    e["Tanh"] = unary(jnp.tanh)
    e["Sin"] = unary(jnp.sin)
    e["Cos"] = unary(jnp.cos)
    e["Floor"] = unary(jnp.floor)
    e["Ceil"] = unary(jnp.ceil)
    e["Round"] = unary(jnp.round)
    e["Sigmoid"] = unary(jax.nn.sigmoid)
    e["Relu"] = unary(jax.nn.relu)
    e["LeakyRelu"] = lambda env, i, a: jax.nn.leaky_relu(
        jnp.asarray(env[i[0]]), a.get("alpha", 0.01))
    e["Elu"] = lambda env, i, a: jax.nn.elu(jnp.asarray(env[i[0]]),
                                            a.get("alpha", 1.0))
    e["Gelu"] = lambda env, i, a: jax.nn.gelu(
        jnp.asarray(env[i[0]]),
        approximate=a.get("approximate", b"none") == b"tanh")
    e["Softplus"] = unary(jax.nn.softplus)
    e["HardSigmoid"] = lambda env, i, a: jnp.clip(
        a.get("alpha", 0.2) * jnp.asarray(env[i[0]]) + a.get("beta", 0.5),
        0.0, 1.0)
    e["HardSwish"] = unary(lambda x: x * jnp.clip(x / 6.0 + 0.5, 0.0, 1.0))
    # Min/Max are variadic (1..N inputs) since opset 8
    e["Min"] = lambda env, i, a: functools.reduce(
        jnp.minimum, (jnp.asarray(env[n]) for n in i))
    e["Max"] = lambda env, i, a: functools.reduce(
        jnp.maximum, (jnp.asarray(env[n]) for n in i))
    e["Equal"] = binary(jnp.equal)
    e["Greater"] = binary(jnp.greater)
    e["GreaterOrEqual"] = binary(jnp.greater_equal)
    e["Less"] = binary(jnp.less)
    e["LessOrEqual"] = binary(jnp.less_equal)
    e["Not"] = unary(jnp.logical_not)
    e["And"] = binary(jnp.logical_and)
    e["Or"] = binary(jnp.logical_or)
    e["Where"] = lambda env, i, a: jnp.where(env[i[0]], env[i[1]], env[i[2]])
    e["Clip"] = lambda env, i, a: jnp.clip(
        jnp.asarray(env[i[0]]),
        None if len(i) < 2 or not i[1] else env[i[1]],
        None if len(i) < 3 or not i[2] else env[i[2]])
    e["Softmax"] = lambda env, i, a: jax.nn.softmax(
        jnp.asarray(env[i[0]]).astype(jnp.promote_types(
            jnp.asarray(env[i[0]]).dtype, jnp.float32)),
        axis=int(a.get("axis", -1))).astype(jnp.asarray(env[i[0]]).dtype)
    e["Transpose"] = lambda env, i, a: jnp.transpose(
        jnp.asarray(env[i[0]]), a.get("perm"))
    e["Concat"] = lambda env, i, a: (
        np.concatenate([env[n] for n in i], axis=int(a["axis"]))
        if all(_is_static(env[n]) for n in i)
        else jnp.concatenate([jnp.asarray(env[n]) for n in i],
                             axis=int(a["axis"])))
    e["Flatten"] = lambda env, i, a: jnp.reshape(
        jnp.asarray(env[i[0]]),
        (int(np.prod(env[i[0]].shape[:int(a.get("axis", 1))] or (1,))), -1))
    e["Reshape"] = _reshape
    e["Expand"] = lambda env, i, a: _expand(env, i)
    e["Mod"] = lambda env, i, a: (
        jnp.fmod(jnp.asarray(env[i[0]]), jnp.asarray(env[i[1]]))
        if int(a.get("fmod", 0))
        else jnp.mod(jnp.asarray(env[i[0]]), jnp.asarray(env[i[1]])))
    e["Slice"] = _slice_op
    e["Squeeze"] = lambda env, i, a: jnp.squeeze(
        jnp.asarray(env[i[0]]),
        axis=None if _axes_arg(i, env, a) is None
        else tuple(_axes_arg(i, env, a)))
    e["Unsqueeze"] = lambda env, i, a: jnp.expand_dims(
        jnp.asarray(env[i[0]]), tuple(_axes_arg(i, env, a)))
    e["Gather"] = lambda env, i, a: jnp.take(
        jnp.asarray(env[i[0]]), jnp.asarray(env[i[1]]),
        axis=int(a.get("axis", 0)))
    e["GatherElements"] = lambda env, i, a: jnp.take_along_axis(
        jnp.asarray(env[i[0]]), jnp.asarray(env[i[1]]),
        axis=int(a.get("axis", 0)))
    e["GatherND"] = lambda env, i, a: _gather_nd(
        env[i[0]], env[i[1]], int(a.get("batch_dims", 0)))
    e["Cast"] = lambda env, i, a: jnp.asarray(env[i[0]]).astype(
        _CAST[int(a["to"])])
    e["CastLike"] = lambda env, i, a: jnp.asarray(env[i[0]]).astype(
        jnp.asarray(env[i[1]]).dtype)
    e["ReduceMean"] = lambda env, i, a: _reduce(
        jnp.mean, jnp.asarray(env[i[0]]), _axes_arg(i, env, a),
        a.get("keepdims", 1))
    e["ReduceSum"] = lambda env, i, a: _reduce(
        jnp.sum, jnp.asarray(env[i[0]]), _axes_arg(i, env, a),
        a.get("keepdims", 1))
    e["ReduceMax"] = lambda env, i, a: _reduce(
        jnp.max, jnp.asarray(env[i[0]]), _axes_arg(i, env, a),
        a.get("keepdims", 1))
    e["ReduceMin"] = lambda env, i, a: _reduce(
        jnp.min, jnp.asarray(env[i[0]]), _axes_arg(i, env, a),
        a.get("keepdims", 1))
    e["ReduceProd"] = lambda env, i, a: _reduce(
        jnp.prod, jnp.asarray(env[i[0]]), _axes_arg(i, env, a),
        a.get("keepdims", 1))
    e["ReduceL2"] = lambda env, i, a: _reduce(
        lambda x, axis, keepdims: jnp.sqrt(
            jnp.sum(jnp.square(x), axis=axis, keepdims=keepdims)),
        jnp.asarray(env[i[0]]).astype(jnp.float32),
        _axes_arg(i, env, a), a.get("keepdims", 1))
    e["LpNormalization"] = lambda env, i, a: (
        jnp.asarray(env[i[0]])
        / jnp.linalg.norm(jnp.asarray(env[i[0]]).astype(jnp.float32),
                          ord=int(a.get("p", 2)),
                          axis=int(a.get("axis", -1)),
                          keepdims=True).astype(jnp.asarray(env[i[0]]).dtype))
    e["ArgMax"] = lambda env, i, a: _arg_minmax(jnp.argmax,
                                                jnp.asarray(env[i[0]]), a)
    e["ArgMin"] = lambda env, i, a: _arg_minmax(jnp.argmin,
                                                jnp.asarray(env[i[0]]), a)
    e["Shape"] = lambda env, i, a: np.asarray(
        env[i[0]].shape[int(a.get("start", 0)):
                        (int(a["end"]) if "end" in a else None)],
        dtype=np.int64)
    e["Size"] = lambda env, i, a: np.asarray(env[i[0]].size, np.int64)
    e["Range"] = lambda env, i, a: jnp.arange(
        _static_scalar(env[i[0]], "Range start"),
        _static_scalar(env[i[1]], "Range limit"),
        _static_scalar(env[i[2]], "Range delta"),
        dtype=np.asarray(env[i[0]]).dtype)
    e["ConstantOfShape"] = lambda env, i, a: jnp.full(
        tuple(_static_ints(env[i[0]], "ConstantOfShape")),
        a["value"].reshape(()) if "value" in a else np.float32(0))
    e["Trilu"] = lambda env, i, a: (
        jnp.tril if int(a.get("upper", 1)) == 0 else jnp.triu)(
        jnp.asarray(env[i[0]]),
        0 if len(i) < 2 or not i[1] else int(
            _static_scalar(env[i[1]], "Trilu k")))
    e["Einsum"] = lambda env, i, a: jnp.einsum(
        a["equation"].decode() if isinstance(a["equation"], bytes)
        else a["equation"],
        *[jnp.asarray(env[n]) for n in i])
    e["Conv"] = lambda env, i, a: _conv(
        jnp.asarray(env[i[0]]), jnp.asarray(env[i[1]]),
        jnp.asarray(env[i[2]]) if len(i) > 2 and i[2] else None, a)
    e["MaxPool"] = lambda env, i, a: _pool(jnp.asarray(env[i[0]]), a, "max")
    e["AveragePool"] = lambda env, i, a: _pool(jnp.asarray(env[i[0]]), a,
                                               "avg")
    e["GlobalAveragePool"] = lambda env, i, a: jnp.mean(
        jnp.asarray(env[i[0]]),
        axis=tuple(range(2, env[i[0]].ndim)), keepdims=True)
    e["LayerNormalization"] = _layer_norm
    e["BatchNormalization"] = _batch_norm
    e["Pad"] = _pad_op
    e["Split"] = _split
    return e


def _pad_pairs(pads: list[int], nd: int):
    return tuple((pads[k], pads[k + nd]) for k in range(nd))


def _pad_op(env, inputs, attrs):
    x = jnp.asarray(env[inputs[0]])
    mode = attrs.get("mode", b"constant")
    mode = mode.decode() if isinstance(mode, bytes) else mode
    jnp_mode = {"constant": "constant", "reflect": "reflect",
                "edge": "edge", "wrap": "wrap"}.get(mode)
    if jnp_mode is None:
        raise WeightError(f"Pad mode '{mode}' not supported")
    pads = _static_ints(env[inputs[1]], "Pad pads")
    if len(inputs) > 3 and inputs[3]:
        # opset-18 optional axes input: pads applies to these axes only
        axes = [ax % x.ndim
                for ax in _static_ints(env[inputs[3]], "Pad axes")]
        n = len(axes)
        pairs = [(0, 0)] * x.ndim
        for j, ax in enumerate(axes):
            pairs[ax] = (pads[j], pads[j + n])
        pairs = tuple(pairs)
    else:
        pairs = _pad_pairs(pads, x.ndim)
    if jnp_mode != "constant":
        return jnp.pad(x, pairs, mode=jnp_mode)
    value = (0 if len(inputs) < 3 or not inputs[2]
             else _static_scalar(env[inputs[2]], "Pad value"))
    return jnp.pad(x, pairs, constant_values=value)


def _split(env, inputs, attrs):
    x = jnp.asarray(env[inputs[0]])
    axis = int(attrs.get("axis", 0))
    if len(inputs) > 1 and inputs[1]:
        sizes = _static_ints(env[inputs[1]], "Split sizes")
    elif "split" in attrs:
        sizes = list(attrs["split"])
    else:
        n = int(attrs["num_outputs"])
        base = -(-x.shape[axis] // n)
        sizes = [base] * (n - 1) + [x.shape[axis] - base * (n - 1)]
    offsets = np.cumsum([0] + sizes)
    return tuple(
        jax.lax.slice_in_dim(x, int(offsets[j]), int(offsets[j + 1]),
                             axis=axis)
        for j in range(len(sizes)))


_OPS = _resolve_ops()

_MULTI_OUTPUT = {"Split"}


# --------------------------------------------------------------------------
# Host-side constant folding.
#
# Under jax tracing, jnp ops on concrete inputs still STAGE into the jaxpr,
# so a shape-arithmetic subgraph (Shape → Gather → Mod → Reshape → Slice
# ends, the standard torch-export pattern) would turn into tracers and
# break ops that need static integers. These numpy implementations evaluate
# a node on the host whenever every input is a host constant, keeping the
# whole shape chain concrete.
# --------------------------------------------------------------------------

def _np_div(a, b):
    a, b = np.asarray(a), np.asarray(b)
    if np.issubdtype(a.dtype, np.integer) and np.issubdtype(b.dtype,
                                                            np.integer):
        # ONNX int Div truncates toward zero
        return (np.sign(a) * np.sign(b) *
                (np.abs(a) // np.abs(b))).astype(a.dtype)
    return np.divide(a, b)


def _np_reshape(env, i, a):
    x = np.asarray(env[i[0]])
    shape = [int(s) for s in np.asarray(env[i[1]]).reshape(-1)]
    out = [x.shape[k] if s == 0 and not int(a.get("allowzero", 0)) else s
           for k, s in enumerate(shape)]
    return x.reshape(out)


def _np_expand(env, i):
    x = np.asarray(env[i[0]])
    shape = [int(s) for s in np.asarray(env[i[1]]).reshape(-1)]
    nd = max(x.ndim, len(shape))
    xs = (1,) * (nd - x.ndim) + x.shape
    sh = [1] * (nd - len(shape)) + list(shape)
    target = tuple(max(a_, b_) for a_, b_ in zip(xs, sh))
    return np.broadcast_to(x.reshape(xs), target)


_NP_FOLD: dict[str, Callable] = {
    "Identity": lambda env, i, a: env[i[0]],
    "Add": lambda env, i, a: np.add(env[i[0]], env[i[1]]),
    "Sub": lambda env, i, a: np.subtract(env[i[0]], env[i[1]]),
    "Mul": lambda env, i, a: np.multiply(env[i[0]], env[i[1]]),
    "Div": lambda env, i, a: _np_div(env[i[0]], env[i[1]]),
    "Mod": lambda env, i, a: (np.fmod if int(a.get("fmod", 0)) else np.mod)(
        env[i[0]], env[i[1]]),
    "Neg": lambda env, i, a: np.negative(env[i[0]]),
    "Abs": lambda env, i, a: np.abs(env[i[0]]),
    "Floor": lambda env, i, a: np.floor(env[i[0]]),
    "Ceil": lambda env, i, a: np.ceil(env[i[0]]),
    "Sqrt": lambda env, i, a: np.sqrt(env[i[0]]),
    "Min": lambda env, i, a: functools.reduce(
        np.minimum, (env[n] for n in i)),
    "Max": lambda env, i, a: functools.reduce(
        np.maximum, (env[n] for n in i)),
    "Equal": lambda env, i, a: np.equal(env[i[0]], env[i[1]]),
    "Greater": lambda env, i, a: np.greater(env[i[0]], env[i[1]]),
    "Less": lambda env, i, a: np.less(env[i[0]], env[i[1]]),
    "Not": lambda env, i, a: np.logical_not(env[i[0]]),
    "Where": lambda env, i, a: np.where(env[i[0]], env[i[1]], env[i[2]]),
    "Cast": lambda env, i, a: np.asarray(env[i[0]]).astype(
        _CAST[int(a["to"])]),
    "Concat": lambda env, i, a: np.concatenate(
        [np.atleast_1d(np.asarray(env[n])) for n in i], axis=int(a["axis"])),
    "Gather": lambda env, i, a: np.take(
        np.asarray(env[i[0]]), np.asarray(env[i[1]]),
        axis=int(a.get("axis", 0))),
    "Unsqueeze": lambda env, i, a: np.expand_dims(
        np.asarray(env[i[0]]), tuple(_axes_arg(i, env, a))),
    "Squeeze": lambda env, i, a: np.squeeze(
        np.asarray(env[i[0]]),
        axis=None if _axes_arg(i, env, a) is None
        else tuple(_axes_arg(i, env, a))),
    "Reshape": _np_reshape,
    "Slice": _slice_op,  # pure indexing — stays numpy on numpy inputs
    "Transpose": lambda env, i, a: np.transpose(
        np.asarray(env[i[0]]), a.get("perm")),
    "Range": lambda env, i, a: np.arange(
        np.asarray(env[i[0]]).reshape(()),
        np.asarray(env[i[1]]).reshape(()),
        np.asarray(env[i[2]]).reshape(())),
    "ConstantOfShape": lambda env, i, a: np.full(
        tuple(int(x) for x in np.asarray(env[i[0]]).reshape(-1)),
        a["value"].reshape(()) if "value" in a else np.float32(0)),
    "ReduceProd": lambda env, i, a: np.prod(
        np.asarray(env[i[0]]),
        axis=None if _axes_arg(i, env, a) is None
        else tuple(_axes_arg(i, env, a)),
        keepdims=bool(a.get("keepdims", 1))),
    "Expand": lambda env, i, a: _np_expand(env, i),
}


def _int8_matmul(env: dict, inputs: list[str]) -> Value:
    """Quantized MatMul against a pre-quantized initializer rhs: dynamic
    per-row activation quant → int8 MXU matmul → fused dequant (the same
    W8A8 scheme as ops.quant.int8_linear, generalized to any-rank lhs)."""
    x = jnp.asarray(env[inputs[0]])
    w_q = jnp.asarray(env[inputs[1] + "#q"])
    w_scale = jnp.asarray(env[inputs[1] + "#scale"])
    orig_shape, orig_dtype = x.shape, x.dtype
    x2 = x.reshape(-1, orig_shape[-1]).astype(jnp.float32)
    amax = jnp.max(jnp.abs(x2), axis=-1, keepdims=True)
    x_scale = jnp.where(amax == 0, 1.0, amax / 127.0)
    x_q = jnp.clip(jnp.round(x2 / x_scale), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(x_q, w_q, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * x_scale * w_scale
    return y.reshape(*orig_shape[:-1], -1).astype(orig_dtype)


# FLOPs-heavy ops eligible for compute-dtype autocasting. Only the first
# two inputs (data × weight) are cast — biases and everything around the
# op stay in the graph's exported dtype, so host-folded f32 constants
# can't silently re-promote the whole graph.
_AUTOCAST_OPS = frozenset({"MatMul", "Gemm", "Conv"})


def _autocast(env: dict, op_type: str, inputs: list[str], attrs,
              compute_dtype) -> Value:
    x = jnp.asarray(env[inputs[0]])
    if not jnp.issubdtype(x.dtype, jnp.floating):
        return _OPS[op_type](env, inputs, attrs)
    local = dict(env)
    for n in inputs[:2]:
        a = jnp.asarray(env[n])
        if jnp.issubdtype(a.dtype, jnp.floating):
            local[n] = a.astype(compute_dtype)
    out = _OPS[op_type](local, inputs, attrs)
    # results re-enter the graph in the exported dtype: accumulation was
    # f32 (preferred_element_type) and only the MXU operands were narrowed
    return jnp.asarray(out).astype(x.dtype)


def execute_graph(g: OnnxGraph, feeds: dict[str, Value],
                  params: dict[str, Value] | None = None, *,
                  compute_dtype=None,
                  quant: frozenset = frozenset()) -> list[Value]:
    """Run the graph on the given input feeds; returns graph outputs.

    ``params`` overrides the initializer values (pass device arrays here so
    weights are jit arguments instead of baked constants); defaults to the
    graph's own initializers.

    ``compute_dtype`` (e.g. ``jnp.bfloat16``) autocasts the MatMul/Gemm/Conv
    operands onto the narrow MXU path with f32 accumulation — the TPU-first
    execution mode for exported-f32 graphs. ``quant`` names initializers
    pre-quantized by :class:`OnnxTower` (their ``<name>#q``/``<name>#scale``
    tensors must be in ``params``); MatMuls against them run W8A8.
    """
    env: dict[str, Value] = {}
    env.update(g.initializers)
    if params:
        env.update(params)
    env.update(feeds)

    for op_type, inputs, outputs, attrs in g.nodes:
        if op_type == "If":
            # torch exports guard shape-dependent paths with If over a
            # statically-foldable condition (e.g. batch checks inside
            # multi_head_attention_forward); with static shapes the
            # executor resolves it at trace time and inlines the chosen
            # branch (a subgraph capturing outer values by name). A
            # genuinely dynamic condition has no XLA-compatible lowering
            # here (branches may differ in shape) — reject loudly.
            cond = env.get(inputs[0])
            if not _is_static(cond):
                raise WeightError(
                    "ONNX executor: 'If' with a non-static condition "
                    f"(outputs {outputs[:1]})")
            branch = attrs.get("then_branch"
                               if bool(np.asarray(cond).reshape(()))
                               else "else_branch")
            if branch is None or not getattr(branch, "nodes", None):
                raise WeightError(
                    "ONNX executor: 'If' branch subgraph missing "
                    f"(outputs {outputs[:1]})")
            results = execute_graph(branch, dict(env),
                                    compute_dtype=compute_dtype,
                                    quant=quant)
            for name, r in zip(outputs, results):
                env[name] = r
            continue
        if op_type == "MatMul" and inputs[1] in quant \
                and not _is_static(env.get(inputs[0])):
            env[outputs[0]] = _int8_matmul(env, inputs)
            continue
        if compute_dtype is not None and op_type in _AUTOCAST_OPS:
            env[outputs[0]] = _autocast(env, op_type, inputs, attrs,
                                        compute_dtype)
            continue
        if op_type == "Constant":
            val = attrs.get("value")
            if val is None:
                if "value_int" in attrs:
                    val = np.asarray(attrs["value_int"], np.int64)
                elif "value_ints" in attrs:
                    val = np.asarray(attrs["value_ints"], np.int64)
                elif "value_float" in attrs:
                    val = np.asarray(attrs["value_float"], np.float32)
                elif "value_floats" in attrs:
                    val = np.asarray(attrs["value_floats"], np.float32)
                else:
                    raise WeightError("ONNX executor: unsupported Constant")
            env[outputs[0]] = val
            continue
        fn = _OPS.get(op_type)
        if fn is None and op_type not in _NP_FOLD:
            raise WeightError(
                f"ONNX executor: unsupported op '{op_type}' "
                f"(outputs {outputs[:1]})")
        missing = [n for n in inputs if n and n not in env]
        if missing:
            raise WeightError(
                f"ONNX executor: {op_type} consumes undefined values "
                f"{missing}")
        # host-side constant folding: keep shape-arithmetic chains concrete
        # (jnp ops STAGE under tracing even on concrete inputs, which would
        # turn Reshape/Slice shape arguments into tracers)
        if op_type in _NP_FOLD and all(
                isinstance(env[n], np.ndarray) or np.isscalar(env[n])
                for n in inputs if n):
            result = _NP_FOLD[op_type](env, inputs, attrs)
        else:
            result = fn(env, inputs, attrs)
        if op_type in _MULTI_OUTPUT:
            for name, r in zip(outputs, result):
                env[name] = r
        else:
            env[outputs[0]] = result

    missing_outs = [n for n in g.outputs if n not in env]
    if missing_outs:
        raise WeightError(f"ONNX executor: graph outputs {missing_outs} "
                          "were never produced")
    return [env[n] for n in g.outputs]


class OnnxCfg:
    """Hashable tower-spec payload for the ONNX-fallback family: identifies
    the graph by path + (mtime, size) + execution mode so the per-spec jit
    cache can't serve a stale compile after the file changes or a different
    compute mode is requested."""

    def __init__(self, path: str, *, compute_dtype: str | None = None,
                 quantize: bool = False):
        self.path = str(path)
        self.compute_dtype = compute_dtype  # dtype NAME ("bfloat16") or None
        self.quantize = bool(quantize)
        st = Path(path).stat()
        self._key = (self.path, st.st_mtime_ns, st.st_size,
                     compute_dtype, self.quantize)

    def __hash__(self):
        return hash(self._key)

    def __eq__(self, other):
        return isinstance(other, OnnxCfg) and self._key == other._key

    def __repr__(self):
        return (f"OnnxCfg({self.path!r}, "
                f"compute_dtype={self.compute_dtype!r}, "
                f"quantize={self.quantize})")


def fallback_cfg(path, *, dtype=None, quantize: str | None = None) -> OnnxCfg:
    """Map the embedder-level ``dtype``/``quantize`` knobs onto the executor
    spec: a sub-f32 float dtype becomes the MatMul/Gemm/Conv autocast dtype
    (the graph itself stays in its exported dtype), and ``"int8"`` /
    ``"int8_all"`` turn on W8A8 MatMuls (the executor has no MLP-vs-attention
    path split — every eligible MatMul weight quantizes in both modes)."""
    name = None
    if dtype is not None:
        d = np.dtype(dtype)
        # jnp.issubdtype, not np: ml_dtypes extension floats (bfloat16)
        # register with numpy kind 'V', invisible to np.issubdtype
        if jnp.issubdtype(d, jnp.floating) and d.itemsize < 4:
            name = d.name
    return OnnxCfg(str(path), compute_dtype=name,
                   quantize=quantize in ("int8", "int8_all"))


_TOWER_CACHE: dict[tuple, "OnnxTower"] = {}
_TOWER_CACHE_MAX = 8  # parsed graphs hold all initializer arrays — evict
# LRU so stale entries (e.g. a regenerated .onnx with a new mtime) don't
# pin hundreds of MB of host memory for the process lifetime


def get_tower(cfg: OnnxCfg) -> "OnnxTower":
    """Parse-once LRU cache of OnnxTower instances keyed by OnnxCfg
    identity (path, mtime, size, execution mode)."""
    tower = _TOWER_CACHE.pop(cfg._key, None)
    if tower is None:
        tower = OnnxTower(cfg.path, compute_dtype=cfg.compute_dtype,
                          quantize=cfg.quantize)
    _TOWER_CACHE[cfg._key] = tower  # (re-)insert as most recent
    while len(_TOWER_CACHE) > _TOWER_CACHE_MAX:
        _TOWER_CACHE.pop(next(iter(_TOWER_CACHE)))
    return tower


# a MatMul rhs must be at least this wide/deep before W8A8 pays for the
# activation quant passes (tiny projections are VPU-bound either way)
_QUANT_MIN_DIM = 64


class OnnxTower:
    """A tower served directly from its ONNX graph (fallback family).

    Loads the graph once; ``__call__`` is jit-friendly (trace it inside
    jax.jit with the initializers passed as the params pytree).

    TPU-first execution modes (the reference's fallback — ORT — runs the
    exported f32 graph as-is; here the fallback rides the same MXU levers
    as the native towers): ``compute_dtype`` autocasts MatMul/Gemm/Conv to
    bf16 operands with f32 accumulation; ``quantize`` pre-quantizes every
    2-D float initializer consumed exclusively as a MatMul rhs to
    per-output-channel int8 (W8A8 with dynamic activation scales, the
    ops.quant scheme).
    """

    def __init__(self, path: Path | str, *,
                 compute_dtype: str | None = None, quantize: bool = False):
        self.path = Path(path)
        self.graph = read_onnx(self.path)
        if not self.graph.inputs:
            # torch exports always declare graph inputs; initializer-only
            # input lists (rare) would need value_info parsing
            raise WeightError(f"No graph inputs found in {self.path}")
        self.input_names = [n for n in self.graph.inputs
                            if n not in self.graph.initializers]
        self.params = {k: v for k, v in self.graph.initializers.items()}
        self.compute_dtype = (None if compute_dtype is None
                              else jnp.dtype(compute_dtype))
        self.quant_names: frozenset[str] = frozenset()
        if quantize:
            self.quant_names = self._quantize_params()

    def _quantize_params(self) -> frozenset:
        from .ops.quant import quantize_weight

        # eligible = consumed ONLY as a MatMul rhs (a weight shared with a
        # Gemm/Transpose/etc. must stay float for those consumers)
        usage: dict[str, bool] = {}
        for op_type, inputs, _, _ in self.graph.nodes:
            for idx, n in enumerate(inputs):
                if n in self.graph.initializers:
                    ok = op_type == "MatMul" and idx == 1
                    usage[n] = usage.get(n, True) and ok
        quantized = []
        for name, ok in usage.items():
            w = self.graph.initializers[name]
            if not (ok and w.ndim == 2
                    and np.issubdtype(w.dtype, np.floating)
                    and min(w.shape) >= _QUANT_MIN_DIM):
                continue
            q = quantize_weight(w)
            self.params[name + "#q"] = q["w_q"]
            self.params[name + "#scale"] = q["w_scale"]
            del self.params[name]
            quantized.append(name)
        return frozenset(quantized)

    def __call__(self, params: dict[str, Value],
                 feeds: dict[str, Value]) -> Value:
        outs = execute_graph(self.graph, feeds, params=params,
                             compute_dtype=self.compute_dtype,
                             quant=self.quant_names)
        return outs[0]
