"""Axial 2-D rotary position embedding, shared by the rope ViT families.

The reference runs rope ViTs (EVA02 CLIP, PE-Core — reference:
README.md:144-145 lists timm/PE-Core-bigG-14-448 as a tested model) only as
opaque ONNX graphs inside ONNX Runtime (src/onnx.rs:19-23). Here the rope
math is owned directly, in the one convention family both timm's
``RotaryEmbeddingCat`` (EVA02) and Meta's SAM2-lineage ``compute_axial_cis``
(Perception Encoder) share:

* per axis ``head_dim/4`` inverse-frequency bands
  ``1/temperature**(i/bands)`` — identical exponents in both codebases
  (timm: ``arange(bands)/bands``; Meta: ``arange(0, dim, 4)/dim``);
* each band duplicated into ADJACENT lanes (``repeat_interleave(2)``),
  rotation over even/odd lane pairs ``rot(x) = (-x1, x0, -x3, x2, …)`` —
  the GPT-J pair convention, anchored against transformers' GPT-J rotary
  in tests/test_eva02.py;
* the two axes concatenated along the head dim. The ORDER differs per
  family: timm cats [y bands, x bands] (EVA02), Meta cats
  [x bands, y bands] (PE) — the ``order`` argument.

Prefix tokens (class/register tokens) are not rotated: ``prefix`` prepends
zero-angle rows (cos=1, sin=0 → identity), matching both codebases' cls
handling without any concatenate/split at apply time.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def axial_rope_table(
    grid: int,
    head_dim: int,
    temperature: float = 10000.0,
    *,
    order: str = "yx",
    ref_grid: int | None = None,
    prefix: int = 0,
) -> np.ndarray:
    """Angle table [prefix + grid², head_dim] for a square patch grid in
    row-major order.

    ``order``: "yx" = timm RotaryEmbeddingCat (EVA02), "xy" = Meta
    compute_axial_cis (PE / SAM2). ``ref_grid`` rescales integer grid
    coordinates to the pretrain feature grid (timm ``ref_feat_shape``;
    Meta uses raw coordinates → None). ``prefix`` rows of zeros come first
    (identity rotation for class/register tokens).
    """
    if order not in ("yx", "xy"):
        raise ValueError(f"Unknown axial rope order '{order}'")
    bands = head_dim // 4
    inv_freq = 1.0 / (temperature ** (np.arange(bands) / bands))
    coords = np.arange(grid, dtype=np.float64)
    if ref_grid is not None:
        coords = coords / grid * ref_grid
    ang = np.einsum("g,f->gf", coords, inv_freq)      # [grid, bands]
    yy = np.repeat(ang[:, None, :], grid, axis=1)     # [gy, gx, bands]
    xx = np.repeat(ang[None, :, :], grid, axis=0)
    halves = [yy, xx] if order == "yx" else [xx, yy]
    ang_half = np.concatenate(halves, axis=-1)        # [gy, gx, head_dim/2]
    full = np.repeat(ang_half, 2, axis=-1)            # adjacent-lane pairs
    full = full.reshape(grid * grid, head_dim)
    if prefix:
        full = np.concatenate(
            [np.zeros((prefix, head_dim), full.dtype), full], axis=0)
    return full


def rotate_pairs(x: jax.Array) -> jax.Array:
    """timm ``rot`` / GPT-J ``rotate_every_two``: (x0,x1,…) → (-x1,x0,…)."""
    x_even = x[..., 0::2]
    x_odd = x[..., 1::2]
    return jnp.stack([-x_odd, x_even], axis=-1).reshape(x.shape)


def apply_rope(x: jax.Array, sin: jax.Array, cos: jax.Array) -> jax.Array:
    """Rotate ``x`` by per-position angle tables.

    x: [B, H, N, D] with [N, D] tables — or the packed [B, N, H·D]
    projection layout with head-tiled [N, H·D] tables (pair rotation stays
    within heads because head offsets are even). Computes in f32.

    The pair rotation is expressed as two single-lane rolls + a parity
    select instead of ``rotate_pairs``'s strided slices + interleave —
    algebraically identical (even lane j takes -x[j+1] = -roll(x,-1)[j],
    odd lane j takes x[j-1] = roll(x,1)[j]; the wrap-around lanes land
    only on positions whose parity never selects them), but lane rotates
    are cheap TPU ops while strided gather/interleave lower to lane
    shuffles that measured 6x the memory-bound floor at PE-Core shapes.
    """
    orig = x.dtype
    x32 = x.astype(jnp.float32)
    even = (jnp.arange(x.shape[-1]) % 2) == 0
    rot = jnp.where(even, -jnp.roll(x32, -1, axis=-1),
                    jnp.roll(x32, 1, axis=-1))
    return (x32 * cos + rot * sin).astype(orig)


def head_tiled_tables(ang: np.ndarray, heads: int) -> tuple[jax.Array, jax.Array]:
    """[N, D] angle table → (sin, cos) tiled to [N, H·D] for the packed
    projection layout."""
    a = jnp.asarray(ang, jnp.float32)
    return jnp.tile(jnp.sin(a), (1, heads)), jnp.tile(jnp.cos(a), (1, heads))
