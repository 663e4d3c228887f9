"""Fused W8A8 transformer-MLP Pallas kernel.

The unfused int8 path (ops.quant.int8_linear) leaves most of the int8 MXU
rate (measured 1.4× bf16 on v5e) on the table because the dynamic
activation quant / dequant epilogues are separate VPU passes with HBM
round-trips between them. This kernel runs the whole MLP block

    x → rowquant → int8 matmul (fc1) → dequant+bias → gelu_tanh
      → rowquant → int8 matmul (fc2) → dequant+bias → y

per row tile with both int8 weight matrices resident in VMEM, so the
intermediate [T, hidden] activations never touch HBM.

Weight layout matches ops.quant.quantize_weight: per-output-channel
symmetric int8 (``w_q`` [in, out] int8, ``w_scale`` [out] f32); activations
use per-row (per-token) symmetric int8, computed in-kernel.

Numerics match the unfused path within int8 rounding (A/B-tested in
tests/test_quant.py); like the unfused path it is opt-in via
``quantize="int8"`` (reference embeddings move ~1e-4–1e-3 cosine).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Params = dict


def _row_quant(x32: jax.Array) -> tuple[jax.Array, jax.Array]:
    """[T, K] f32 → int8 with per-row symmetric scale."""
    amax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
    scale = jnp.where(amax == 0, 1.0, amax / 127.0)
    q = jnp.clip(jnp.round(x32 / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _erf(x: jax.Array) -> jax.Array:
    """erf for Mosaic kernels (lax.erf/erfc have no Pallas TPU lowering —
    caught by the TPU verify drive on an exact-gelu model). Abramowitz &
    Stegun 7.1.26 rational approximation: max abs error 1.5e-7, invisible
    under the kernel's int8 requantization (1/254 ≈ 4e-3 resolution) and
    A/B-tested against the unfused exact-erf path in tests/test_quant.py."""
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return jnp.sign(x) * (1.0 - poly * jnp.exp(-ax * ax))


def _act(h: jax.Array, name: str) -> jax.Array:
    if name == "gelu_tanh":
        return jax.nn.gelu(h, approximate=True)
    if name == "gelu":
        # exact-erf gelu via the in-kernel erf approximation
        return 0.5 * h * (1.0 + _erf(h * (2.0 ** -0.5)))
    if name == "quick_gelu":
        return h * jax.nn.sigmoid(1.702 * h)
    if name == "relu":
        return jnp.maximum(h, 0.0)
    raise ValueError(f"unsupported in-kernel activation '{name}'")


def _unpack_qlinear(p: Params, n: int):
    """ops.quant weight layout → (w_q [K, N] int8, scale [1, N] f32,
    bias [1, N] f32). Scales/biases become rows because TPU VMEM refs want
    ≥2D layouts; a missing bias defaults to zeros."""
    w, s = p["w_q"], p["w_scale"].astype(jnp.float32)
    b = p.get("b")
    b = jnp.zeros((n,), jnp.float32) if b is None else b.astype(jnp.float32)
    return w, s.reshape(1, n), b.reshape(1, n)


def _flatten_rows(x: jax.Array, k_in: int, tiles: tuple[int, ...]):
    """Flatten leading dims to rows and zero-pad to the first tile in
    ``tiles`` that divides the row count (last tile pads up otherwise).
    Returns (x2 [rp, k_in], orig_shape, rows, rp, tile)."""
    orig_shape = x.shape
    rows = 1
    for dim in orig_shape[:-1]:
        rows *= dim
    x2 = x.reshape(rows, k_in)
    tile = next((t for t in tiles if rows % t == 0), tiles[-1])
    rp = (rows + tile - 1) // tile * tile
    if rp != rows:
        x2 = jnp.pad(x2, ((0, rp - rows), (0, 0)))
    return x2, orig_shape, rows, rp, tile


def _chunk_bounds(hidden: int, chunks: int) -> list[tuple[int, int]]:
    """Split ``hidden`` into ``chunks`` slabs with 128-aligned offsets
    (the last slab may be ragged — Mosaic pads it internally, exactly as
    it does for an unchunked ragged hidden)."""
    size = ((hidden + chunks - 1) // chunks + 127) // 128 * 128
    bounds = []
    off = 0
    while off < hidden:
        bounds.append((off, min(size, hidden - off)))
        off += size
    return bounds


def _mlp_kernel(x_ref, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref, b2_ref,
                o_ref, *, activation: str, ln_refs=None, ln_eps=1e-6,
                h_scratch=None, chunks: int = 1, add_residual: bool = False):
    x32 = x_ref[:].astype(jnp.float32)
    res = x32 if add_residual else None  # raw residual stream (pre-LN x)
    if ln_refs is not None:
        # fused pre-MLP LayerNorm: x is the raw residual stream, normalized
        # in f32 here instead of a separate XLA pass (one less HBM round
        # trip per layer)
        g_ref, b_ref = ln_refs
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
        x32 = (x32 - mean) * jax.lax.rsqrt(var + ln_eps)
        x32 = x32 * g_ref[0] + b_ref[0]
    xq, xs = _row_quant(x32)
    if chunks <= 1:
        h = jax.lax.dot_general(
            xq, w1_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
        h = h * (xs * s1_ref[0]) + b1_ref[0]
        h = _act(h, activation)
        aq, as_ = _row_quant(h)
        y = jax.lax.dot_general(
            aq, w2_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
        y = y * (as_ * s2_ref[0]) + b2_ref[0]
        if res is not None:
            y = y + res
        o_ref[:] = y.astype(o_ref.dtype)
        return

    # Chunked hidden dim: independent per-slab work lets Mosaic co-issue
    # the MXU matmul of slab i+1 with the VPU dequant/act of slab i
    # (the unchunked kernel serializes one big matmul against one big VPU
    # pass). Numerics are BIT-IDENTICAL to chunks=1: the activation quant
    # scale uses the global row amax (two passes over the f32 scratch) and
    # the fc2 partial sums accumulate in int32, exactly like the MXU's own
    # K-dim accumulation.
    hidden = w1_ref.shape[1]
    bounds = _chunk_bounds(hidden, chunks)
    for off, size in bounds:
        hc = jax.lax.dot_general(
            xq, w1_ref[:, off:off + size],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
        hc = hc * (xs * s1_ref[0, off:off + size]) + b1_ref[0, off:off + size]
        h_scratch[:, off:off + size] = _act(hc, activation)
    amax = jnp.max(jnp.abs(h_scratch[:]), axis=-1, keepdims=True)
    as_ = jnp.where(amax == 0, 1.0, amax / 127.0)
    acc = None
    for off, size in bounds:
        aq = jnp.clip(jnp.round(h_scratch[:, off:off + size] / as_),
                      -127, 127).astype(jnp.int8)
        part = jax.lax.dot_general(
            aq, w2_ref[off:off + size, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        acc = part if acc is None else acc + part
    y = acc.astype(jnp.float32) * (as_ * s2_ref[0]) + b2_ref[0]
    if res is not None:
        y = y + res
    o_ref[:] = y.astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("activation", "ln_eps", "interpret",
                                    "chunks", "add_residual"))
def int8_mlp(params: Params, x: jax.Array, *,
             activation: str = "gelu_tanh",
             pre_ln: Params | None = None, ln_eps: float = 1e-6,
             interpret: bool = False,
             chunks: int | None = None,
             add_residual: bool = False) -> jax.Array:
    """Fused quantized MLP block. ``params``: {"fc": {"w_q", "w_scale",
    "b"}, "proj": {"w_q", "w_scale", "b"}} (ops.quant.quantize_tree layout).
    ``x``: [..., K]; the activation runs in f32 inside the kernel.
    ``pre_ln`` ({"scale", "bias"}) fuses the pre-MLP LayerNorm in-kernel.
    ``chunks`` splits the hidden dim into slabs for MXU/VPU co-issue
    (None = auto: 8 for hidden ≥ 2048); numerics are bit-identical to
    chunks=1 (see _mlp_kernel). ``add_residual`` (requires ``pre_ln``)
    returns ``x + mlp(ln(x))`` — the raw input IS the residual stream when
    the pre-LN is fused, so the transformer-block residual add happens
    in-kernel instead of as a separate XLA pass over HBM.
    """
    if add_residual and pre_ln is None:
        raise ValueError("add_residual requires the fused pre_ln (the raw "
                         "kernel input must be the residual stream)")
    fc, pr = params["fc"], params["proj"]
    k_in, hidden = fc["w_q"].shape
    k_out = pr["w_q"].shape[1]
    w1, s1, b1 = _unpack_qlinear(fc, hidden)
    w2, s2, b2 = _unpack_qlinear(pr, k_out)
    x2, orig_shape, rows, rp, tile = _flatten_rows(x, k_in, (256, 128))

    in_specs = [
        pl.BlockSpec((tile, k_in), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        # weights/scales/biases: constant index map → resident in VMEM
        pl.BlockSpec((k_in, hidden), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, hidden), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, hidden), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((hidden, k_out), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, k_out), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, k_out), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [x2, w1, s1, b1, w2, s2, b2]
    # auto policy, measured on v5e with interleaved-median A/B (SO400M and
    # H14 shapes): chunks=8 is a small consistent win (~2%) over unchunked
    # — Mosaic already pipelines most of the VPU work — and never loses.
    # Small hiddens don't amortize the scratch pass.
    n_chunks = chunks if chunks is not None else (8 if hidden >= 2048 else 1)
    scratch_shapes = ([pltpu.VMEM((tile, hidden), jnp.float32)]
                      if n_chunks > 1 else [])
    if pre_ln is not None:
        ln_g = pre_ln["scale"].astype(jnp.float32).reshape(1, k_in)
        ln_b = pre_ln["bias"].astype(jnp.float32).reshape(1, k_in)

        def kernel(x_ref, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref, b2_ref,
                   g_ref, lb_ref, o_ref, *scratch):
            _mlp_kernel(x_ref, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref,
                        b2_ref, o_ref, activation=activation,
                        ln_refs=(g_ref, lb_ref), ln_eps=ln_eps,
                        h_scratch=scratch[0] if scratch else None,
                        chunks=n_chunks, add_residual=add_residual)

        in_specs = in_specs + [
            pl.BlockSpec((1, k_in), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k_in), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        args = args + [ln_g, ln_b]
    else:
        def kernel(x_ref, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref, b2_ref,
                   o_ref, *scratch):
            _mlp_kernel(x_ref, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref,
                        b2_ref, o_ref, activation=activation,
                        h_scratch=scratch[0] if scratch else None,
                        chunks=n_chunks)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rp, k_out), x.dtype),
        grid=(rp // tile,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile, k_out), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch_shapes,
        compiler_params=pltpu.CompilerParams(
            # resident int8 weights (~10 MB at SO400M) + f32 hidden scratch
            # (4.4 MB) + double-buffered row tiles
            vmem_limit_bytes=32 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * rp * k_in * hidden + 2 * rp * hidden * k_out,
            bytes_accessed=(rp * (k_in + k_out) * 2
                            + k_in * hidden + hidden * k_out),
            transcendentals=rp * hidden,
        ),
        interpret=interpret,
    )(*args)
    return out[:rows].reshape(*orig_shape[:-1], k_out)


def _mlp_streamed_kernel(x_ref, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref,
                         b2_ref, o_ref, xq_ref, xs_ref, acc_ref, *,
                         activation: str, ln_refs=None, ln_eps=1e-6,
                         n_chunks: int, add_residual: bool,
                         hidden: int, chunk: int):
    """One (row-tile, hidden-slab) grid step of the weight-streamed MLP.

    j == 0: LN + row-quant the input tile once into scratch, zero the f32
    accumulator. Every j: h_j = act(dequant(xq @ w1_j)), per-slab row
    requant, acc += dequant(aq_j @ w2_j). j == last: bias + (residual) +
    cast to the output tile. Weight slabs arrive via the BlockSpec pipeline
    (double-buffered DMA hides under the slab matmuls from tile 512 up)."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _first():
        x32 = x_ref[:].astype(jnp.float32)
        if ln_refs is not None:
            g_ref, b_ref = ln_refs
            mean = jnp.mean(x32, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
            x32 = (x32 - mean) * jax.lax.rsqrt(var + ln_eps)
            x32 = x32 * g_ref[0] + b_ref[0]
        xq, xs = _row_quant(x32)
        xq_ref[:] = xq
        xs_ref[:] = xs
        acc_ref[:] = jnp.zeros_like(acc_ref)

    h = jax.lax.dot_general(
        xq_ref[:], w1_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    h = h * (xs_ref[:] * s1_ref[0]) + b1_ref[0]
    h = _act(h, activation)
    if hidden % chunk:
        # ragged last slab: Mosaic's out-of-range block padding is
        # unspecified — zero it so the per-slab amax (and via aq=0, the
        # fc2 contribution of padded rows) stays exact
        cols = jax.lax.broadcasted_iota(jnp.int32, h.shape, 1)
        valid = hidden - pl.program_id(1) * chunk
        h = jnp.where(cols < valid, h, 0.0)
    # per-slab row scales (vs the resident kernel's global row amax):
    # finer quant granularity, same int8 rounding class — A/B-tested
    aq, as_ = _row_quant(h)
    part = jax.lax.dot_general(
        aq, w2_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    acc_ref[:] += part * (as_ * s2_ref[0])

    @pl.when(j == n_chunks - 1)
    def _last():
        y = acc_ref[:] + b2_ref[0]
        if add_residual:
            y = y + x_ref[:].astype(jnp.float32)
        o_ref[:] = y.astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("activation", "ln_eps", "interpret",
                                    "chunk", "add_residual"))
def int8_mlp_streamed(params: Params, x: jax.Array, *,
                      activation: str = "gelu_tanh",
                      pre_ln: Params | None = None, ln_eps: float = 1e-6,
                      interpret: bool = False,
                      chunk: int = 1792,
                      add_residual: bool = False) -> jax.Array:
    """Fused W8A8 MLP for weight sets too large to sit resident in VMEM
    (PE-Core-bigG: 1536×8960×2 ≈ 27.5 MB int8). The hidden dim is split
    into ``chunk``-column slabs streamed through the BlockSpec pipeline —
    per grid step one w1 column slab and the matching w2 row slab — with
    the input tile quantized once and a f32 output accumulator in scratch.
    The intermediate [T, hidden] activations never exist anywhere, not
    even in scratch.

    Numerics: per-slab activation requant (slightly finer than the
    resident kernel's global row scale); within int8 rounding of the
    unfused path (tests/test_quant.py)."""
    if add_residual and pre_ln is None:
        raise ValueError("add_residual requires the fused pre_ln")
    fc, pr = params["fc"], params["proj"]
    k_in, hidden = fc["w_q"].shape
    k_out = pr["w_q"].shape[1]
    w1, s1, b1 = _unpack_qlinear(fc, hidden)
    w2, s2, b2 = _unpack_qlinear(pr, k_out)
    # larger row tiles than the resident kernel: the streamed weights make
    # per-tile fixed costs (input quant into scratch) relatively pricier
    x2, orig_shape, rows, rp, tile = _flatten_rows(x, k_in, (512, 256, 128))

    n_chunks = (hidden + chunk - 1) // chunk
    # BlockSpec pads the trailing ragged slab with zeros: h = act(0 + 0) =
    # 0 for every supported activation, so padded columns contribute
    # nothing to the fc2 accumulation.
    in_specs = [
        pl.BlockSpec((tile, k_in), lambda i, j: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((k_in, chunk), lambda i, j: (0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, chunk), lambda i, j: (0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, chunk), lambda i, j: (0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((chunk, k_out), lambda i, j: (j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, k_out), lambda i, j: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, k_out), lambda i, j: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [x2, w1, s1, b1, w2, s2, b2]
    scratch_shapes = [
        pltpu.VMEM((tile, k_in), jnp.int8),      # quantized LN'd input
        pltpu.VMEM((tile, 1), jnp.float32),      # its per-row scales
        pltpu.VMEM((tile, k_out), jnp.float32),  # output accumulator
    ]
    if pre_ln is not None:
        ln_g = pre_ln["scale"].astype(jnp.float32).reshape(1, k_in)
        ln_b = pre_ln["bias"].astype(jnp.float32).reshape(1, k_in)

        def kernel(x_ref, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref, b2_ref,
                   g_ref, lb_ref, o_ref, xq_ref, xs_ref, acc_ref):
            _mlp_streamed_kernel(x_ref, w1_ref, s1_ref, b1_ref, w2_ref,
                                 s2_ref, b2_ref, o_ref, xq_ref, xs_ref,
                                 acc_ref, activation=activation,
                                 ln_refs=(g_ref, lb_ref), ln_eps=ln_eps,
                                 n_chunks=n_chunks,
                                 add_residual=add_residual,
                                 hidden=hidden, chunk=chunk)

        in_specs = in_specs + [
            pl.BlockSpec((1, k_in), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k_in), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        args = args + [ln_g, ln_b]
    else:
        def kernel(x_ref, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref, b2_ref,
                   o_ref, xq_ref, xs_ref, acc_ref):
            _mlp_streamed_kernel(x_ref, w1_ref, s1_ref, b1_ref, w2_ref,
                                 s2_ref, b2_ref, o_ref, xq_ref, xs_ref,
                                 acc_ref, activation=activation,
                                 n_chunks=n_chunks,
                                 add_residual=add_residual,
                                 hidden=hidden, chunk=chunk)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rp, k_out), x.dtype),
        grid=(rp // tile, n_chunks),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile, k_out), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            # double-buffered weight slabs (2×(k_in+k_out)×chunk ≈ 7.9 MB
            # at PE shapes) + tiles/scratch
            vmem_limit_bytes=48 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * rp * k_in * hidden + 2 * rp * hidden * k_out,
            bytes_accessed=(rp * (k_in + k_out) * 2
                            + (rp // tile) * (k_in + k_out) * hidden),
            transcendentals=rp * hidden,
        ),
        interpret=interpret,
    )(*args)
    return out[:rows].reshape(*orig_shape[:-1], k_out)


def fits_streamed_mlp(params: Params, activation_name: str,
                      rows: int) -> bool:
    """Eligibility for the weight-streamed fused MLP: quantized weights too
    large for residency (fits_fused_mlp takes priority), enough rows per
    weight pass to amortize the streaming, a supported in-kernel
    activation, TPU.

    Measured gate (tools/profile_streamed_mlp.py, v5e, interleaved
    medians): PE-bigG's 27.5 MB set wins streamed vs unfused (3.35 vs
    3.62 ms, 270 TF/s-equiv); gopt's 18.9 MB set loses (1.19 vs 1.09 —
    the unfused XLA path already runs 320 TF/s-equiv at those shapes), so
    only weight sets past ~20 MB stream."""
    fc = params.get("fc")
    pr = params.get("proj")
    if not (isinstance(fc, dict) and isinstance(pr, dict)):
        return False
    if "w_q" not in fc or "w_q" not in pr:
        return False
    if fc["w_q"].ndim != 2 or pr["w_q"].ndim != 2:
        return False
    if activation_name not in ("gelu_tanh", "gelu", "quick_gelu", "relu"):
        return False
    if jax.default_backend() != "tpu":
        return False
    if fc["w_q"].size + pr["w_q"].size <= 20 * 1024 * 1024:
        return False
    return rows >= 512


def _linear_kernel(x_ref, w_ref, s_ref, b_ref, o_ref):
    x32 = x_ref[:].astype(jnp.float32)
    xq, xs = _row_quant(x32)
    y = jax.lax.dot_general(
        xq, w_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    y = y * (xs * s_ref[0]) + b_ref[0]
    o_ref[:] = y.astype(o_ref.dtype)


def _linear_res_kernel(x_ref, w_ref, s_ref, b_ref, r_ref, o_ref):
    x32 = x_ref[:].astype(jnp.float32)
    xq, xs = _row_quant(x32)
    y = jax.lax.dot_general(
        xq, w_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    y = y * (xs * s_ref[0]) + b_ref[0] + r_ref[:].astype(jnp.float32)
    o_ref[:] = y.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def int8_linear_fused(params: Params, x: jax.Array, *,
                      residual: jax.Array | None = None,
                      interpret: bool = False) -> jax.Array:
    """Fused W8A8 affine map (one matmul): in-kernel dynamic row quant →
    int8 MXU matmul → fused dequant + bias. Same params layout as
    ops.quant.int8_linear; used for the attention projections under
    ``quantize="int8_all"``. ``residual`` ([..., k_out], same leading
    shape as x) adds in-kernel — the transformer-block residual stream
    riding the epilogue instead of a separate XLA pass."""
    k_in, k_out = params["w_q"].shape
    w, s, b = _unpack_qlinear(params, k_out)
    x2, orig_shape, rows, rp, tile = _flatten_rows(x, k_in, (256, 128))

    in_specs = [
        pl.BlockSpec((tile, k_in), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((k_in, k_out), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, k_out), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, k_out), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [x2, w, s, b]
    kernel = _linear_kernel
    if residual is not None:
        r2 = residual.reshape(rows, k_out)
        if rp != rows:
            r2 = jnp.pad(r2, ((0, rp - rows), (0, 0)))
        in_specs.append(pl.BlockSpec((tile, k_out), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM))
        args.append(r2)
        kernel = _linear_res_kernel

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rp, k_out), x.dtype),
        grid=(rp // tile,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile, k_out), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * rp * k_in * k_out,
            bytes_accessed=rp * (k_in + k_out) * 2 + k_in * k_out,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)
    return out[:rows].reshape(*orig_shape[:-1], k_out)


def fits_fused_linear(params: Params) -> bool:
    """Static eligibility for the fused W8A8 linear: 2-D quantized weight,
    VMEM-resident, TPU backend."""
    w = params.get("w_q")
    if w is None or w.ndim != 2:
        return False
    if jax.default_backend() != "tpu":
        return False
    return w.size <= 11 * 1024 * 1024


def fits_fused_mlp(params: Params, activation_name: str) -> bool:
    """Static eligibility: both MLP linears quantized, a supported in-kernel
    activation, both weight matrices small enough to co-reside in VMEM, and
    a TPU backend (the kernel is Mosaic-only)."""
    fc = params.get("fc")
    pr = params.get("proj")
    if not (isinstance(fc, dict) and isinstance(pr, dict)):
        return False
    if "w_q" not in fc or "w_q" not in pr:
        return False
    if activation_name not in ("gelu_tanh", "gelu", "quick_gelu", "relu"):
        return False
    if jax.default_backend() != "tpu":
        return False
    vmem_bytes = fc["w_q"].size + pr["w_q"].size  # int8 = 1 byte each
    # 20 MB admits ViT-H/14 (1280×5120×2 ≈ 13.1 MB — measured ~12% faster
    # fused than unfused on v5e) and ViT-gopt (1536×6144×2 ≈ 18.9 MB —
    # round 3 called it a wash on sequential timings; round 4's
    # interleaved medians settle it at a small consistent fused win, 1.37
    # vs 1.34 ms at b16, +3%, chunk-count-insensitive —
    # tools/profile_gopt_mlp.py). PE-bigG's 27.5 MB set stays streamed.
    return vmem_bytes <= 20 * 1024 * 1024
