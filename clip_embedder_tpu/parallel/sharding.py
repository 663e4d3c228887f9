"""Tensor-parallel partition specs for the tower pytrees.

Megatron-style sharding expressed as PartitionSpecs and left to GSPMD: the
residual stream (embeddings, LayerNorms, projections) stays replicated;
attention q/k/v and MLP fc shard their *output* features (heads / hidden)
over the 'model' axis and the attention out-projection / MLP proj shard
their *input* features — so each sublayer costs exactly one all-reduce,
which XLA inserts and schedules over ICI (no hand-written collectives;
SURVEY.md §2 "parallelism strategies").

Specs mirror the parameter pytrees of models.vit / models.text_transformer;
stacked blocks carry a leading layer axis, always unsharded.
"""

from __future__ import annotations

from jax.sharding import PartitionSpec as P

from .mesh import MODEL_AXIS

REPL = P()  # fully replicated leaf


def _linear_col(params: dict, *, stacked: bool) -> dict:
    """Column-parallel: shard output features."""
    lead = (None,) if stacked else ()
    spec = {"w": P(*lead, None, MODEL_AXIS)}
    if "b" in params:
        spec["b"] = P(*lead, MODEL_AXIS)
    return spec


def _linear_row(params: dict, *, stacked: bool) -> dict:
    """Row-parallel: shard input features; bias replicated (applied after
    the implicit all-reduce)."""
    lead = (None,) if stacked else ()
    spec = {"w": P(*lead, MODEL_AXIS, None)}
    if "b" in params:
        spec["b"] = REPL
    return spec


def _attn_specs(attn_params: dict, *, stacked: bool) -> dict:
    return {
        "q": _linear_col(attn_params["q"], stacked=stacked),
        "k": _linear_col(attn_params["k"], stacked=stacked),
        "v": _linear_col(attn_params["v"], stacked=stacked),
        "out": _linear_row(attn_params["out"], stacked=stacked),
    }


def _mlp_specs(mlp_params: dict, *, stacked: bool) -> dict:
    return {
        "fc": _linear_col(mlp_params["fc"], stacked=stacked),
        "proj": _linear_row(mlp_params["proj"], stacked=stacked),
    }


def _replicated_like(tree) -> dict | P:
    if isinstance(tree, dict):
        return {k: _replicated_like(v) for k, v in tree.items()}
    return REPL


def tp_param_specs(params: dict, *, tower: str) -> dict:
    """Build a PartitionSpec pytree matching ``params`` for 2-way+ tensor
    parallelism. tower: "vit" | "text". Leaves not named here (pos/cls/token
    embeddings, LNs, final projection) are replicated.
    """
    if tower not in ("vit", "text"):
        raise ValueError(f"Unknown tower '{tower}'")

    specs = {k: _replicated_like(v) for k, v in params.items()}
    block_params = params["blocks"]
    specs["blocks"] = {
        "ln1": _replicated_like(block_params["ln1"]),
        "ln2": _replicated_like(block_params["ln2"]),
        "attn": _attn_specs(block_params["attn"], stacked=True),
        "mlp": _mlp_specs(block_params["mlp"], stacked=True),
    }
    if "ls1" in block_params:
        # layer-scale gammas multiply sublayer outputs post-projection
        # (replicated activations) — keep them replicated.
        specs["blocks"]["ls1"] = REPL
        specs["blocks"]["ls2"] = REPL
    if "attn_pool" in params:
        # covers both pooler layouts: SigLIP/PE MAP pool
        # ({probe, attn, ln, mlp}) and the CoCa AttentionalPooler
        # ({query, ln_q, ln_k, attn}) — queries/LNs replicate, the pooler
        # MHA shards by heads like any attention, the MAP MLP like any MLP
        pool = params["attn_pool"]
        pool_specs = {
            k: _replicated_like(v) for k, v in pool.items()
            if k not in ("attn", "mlp")
        }
        pool_specs["attn"] = _attn_specs(pool["attn"], stacked=False)
        if "mlp" in pool:
            pool_specs["mlp"] = _mlp_specs(pool["mlp"], stacked=False)
        specs["attn_pool"] = pool_specs
    return specs
