"""Contrastive training: CLIP softmax-CE and SigLIP sigmoid losses with a
mesh-sharded train step.

The reference is inference-only — its "training" story is the offline
export pipeline (reference: pull_onnx.py). This module makes the framework
self-hosting on TPU: fine-tune or train the same tower pytrees the
embedders serve, with data parallelism over the 'data' mesh axis and
optional Megatron tensor parallelism over 'model'
(clip_embedder_tpu.parallel.sharding). The global batch shards over chips;
the contrastive logit matrix needs every pair, so embeddings are
all-gathered by GSPMD from the sharded batch automatically — on a v5e
slice that collective rides ICI.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .models import text_transformer, vit
from .models.text_transformer import TextCfgResolved
from .models.vit import ViTCfg
from .parallel.mesh import DATA_AXIS
from .parallel.sharding import tp_param_specs


@dataclass(frozen=True)
class TrainConfig:
    vision_cfg: ViTCfg
    text_cfg: TextCfgResolved
    loss: str = "clip"          # "clip" (softmax CE) | "siglip" (sigmoid)
    learning_rate: float = 1e-4
    weight_decay: float = 0.05
    tensor_parallel: bool = False
    # FSDP/ZeRO-3-style: shard params (and optimizer moments) over the
    # 'data' axis; GSPMD all-gathers weights per layer on demand. For
    # towers whose replicated params + adamw moments don't fit a chip.
    # Mutually exclusive with tensor_parallel.
    fsdp: bool = False
    # rematerialize blocks on backward: activation memory of one layer
    # instead of all (jax.checkpoint — the HBM/FLOPs trade for big towers)
    remat: bool = False
    # chunked SigLIP loss over the data-axis ring (siglip_ring_loss): the
    # [B, B] global logit matrix never materializes — required at
    # SigLIP-scale global batches. Only valid with loss="siglip".
    ring_loss: bool = False


def init_train_state(key: jax.Array, cfg: TrainConfig, *, dtype=jnp.float32):
    """Params (both towers + learnable logit scale/bias).

    Returns ``(params, None)`` — the optimizer state is created by
    ``make_sharded_train_step`` (under jit, inheriting param shardings) or
    ``init_opt_state`` for unsharded use; materializing adamw moments on
    one device here would double the unsharded memory for nothing.
    """
    kv, kt = jax.random.split(key)
    params = {
        "visual": vit.init(kv, cfg.vision_cfg, dtype=dtype),
        "text": text_transformer.init(kt, cfg.text_cfg, dtype=dtype),
        # CLIP stores log-scale (exp'd in the loss); SigLIP adds a bias.
        "logit_scale": jnp.asarray(jnp.log(1.0 / 0.07), dtype=jnp.float32),
        "logit_bias": jnp.asarray(-10.0 if cfg.loss == "siglip" else 0.0,
                                  dtype=jnp.float32),
    }
    return params, None


def init_opt_state(cfg: TrainConfig, params):
    """Optimizer state for the unsharded ``train_step`` path."""
    return make_optimizer(cfg).init(params)


def _fsdp_spec(p, *, mesh) -> P:
    """FSDP sharding for one param: shard the largest axis divisible by the
    data-axis size over 'data'; small/odd params stay replicated."""
    n = mesh.shape[DATA_AXIS]
    if jnp.ndim(p) < 2:
        return P()
    axes = sorted(range(jnp.ndim(p)), key=lambda a: -p.shape[a])
    for axis in axes:
        if p.shape[axis] % n == 0 and p.shape[axis] >= n:
            spec = [None] * jnp.ndim(p)
            spec[axis] = DATA_AXIS
            return P(*spec)
    return P()


def _decay_mask(params):
    """Decay only matrix-shaped weights: embeddings/kernels decay; biases,
    LayerNorm scales, layer-scale gammas, and the learnable logit
    scale/bias don't (standard open_clip recipe)."""
    return jax.tree.map(lambda p: jnp.ndim(p) >= 2, params)


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    return optax.adamw(cfg.learning_rate, weight_decay=cfg.weight_decay,
                       mask=_decay_mask)


def clip_loss(img_emb: jax.Array, txt_emb: jax.Array, scale: jax.Array,
              bias: jax.Array) -> jax.Array:
    """Symmetric InfoNCE over the global batch (CLIP)."""
    logits = img_emb @ txt_emb.T * scale + bias  # [B, B]
    labels = jnp.arange(logits.shape[0])
    li = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    lt = optax.softmax_cross_entropy_with_integer_labels(logits.T, labels)
    return jnp.mean(li + lt) * 0.5


def siglip_loss(img_emb: jax.Array, txt_emb: jax.Array, scale: jax.Array,
                bias: jax.Array) -> jax.Array:
    """Pairwise sigmoid loss (SigLIP): positives on the diagonal."""
    logits = img_emb @ txt_emb.T * scale + bias
    n = logits.shape[0]
    signs = 2.0 * jnp.eye(n) - 1.0
    return -jnp.mean(jax.nn.log_sigmoid(signs * logits)) * n


def siglip_ring_loss(img_emb: jax.Array, txt_emb: jax.Array,
                     scale: jax.Array, bias: jax.Array, *, mesh: Mesh,
                     axis: str = DATA_AXIS) -> jax.Array:
    """Device-chunked sigmoid loss — the SigLIP recipe for giant global
    batches, as an explicit ring over the mesh's data axis.

    The dense ``siglip_loss`` under GSPMD all-gathers the full text-embedding
    batch onto every chip and materializes the global ``[B, B]`` logit
    matrix per chip; at SigLIP-scale batches (32k) that matrix alone is 4 GB
    f32. Here each device keeps only its ``[b, D]`` shards: inside
    ``shard_map`` the text shard rotates one neighbor around the data-axis
    ring per hop (``lax.ppermute`` — on a TPU slice each hop is one
    nearest-neighbor ICI transfer, overlapping the ``[b, b]`` logit-block
    compute), every device accumulating its local rows' pairwise terms.
    Peak per-device live memory is ``[b, b]``; the ``[B, B]`` matrix never
    exists anywhere. Sum of all blocks is psum'd and normalized exactly like
    the dense loss, so values and gradients match it to float tolerance
    (tests/test_train_ring.py proves both on an 8-device mesh).
    """
    n = int(mesh.shape[axis])
    perm = [(i, (i + 1) % n) for i in range(n)]

    def per_device(img, txt, scale, bias):
        b = img.shape[0]
        diag = jnp.eye(b, dtype=img.dtype)

        def hop(carry, k):
            txt_k, acc = carry
            logits = img @ txt_k.T * scale + bias
            # positives live on the local diagonal only on hop 0, when the
            # resident text chunk is the device's own
            signs = jnp.where(k == 0, 2.0 * diag - 1.0, -jnp.ones_like(diag))
            acc = acc - jnp.sum(jax.nn.log_sigmoid(signs * logits))
            txt_k = jax.lax.ppermute(txt_k, axis, perm)
            return (txt_k, acc), None

        acc0 = jax.lax.pcast(jnp.zeros((), jnp.float32), axis, to="varying")
        (_, acc), _ = jax.lax.scan(hop, (txt, acc0), jnp.arange(n))
        # dense normalization: -sum(log_sigmoid)/B_global
        return jax.lax.psum(acc, axis) / (n * b)

    spec = P(axis)
    # only the data axis goes manual: on a ('data','model') TP mesh the
    # model axis stays under GSPMD, composing with Megatron-sharded towers
    return jax.shard_map(
        per_device, mesh=mesh, axis_names={axis},
        in_specs=(spec, spec, P(), P()), out_specs=P(),
    )(img_emb, txt_emb, scale, bias)


def loss_fn(params, batch, cfg: TrainConfig, mesh: Mesh | None = None):
    img_emb = vit.apply(params["visual"], batch["pixels"], cfg.vision_cfg,
                        remat=cfg.remat)
    txt_emb = text_transformer.apply(params["text"], batch["input_ids"],
                                     cfg.text_cfg, remat=cfg.remat)
    scale = jnp.exp(params["logit_scale"])
    bias = params["logit_bias"]
    img_emb = img_emb.astype(jnp.float32)
    txt_emb = txt_emb.astype(jnp.float32)
    if cfg.ring_loss:
        if cfg.loss != "siglip":
            raise ValueError("ring_loss requires loss='siglip' (softmax CE "
                             "needs the global logit row; the sigmoid loss "
                             "is the one that chunks exactly)")
        if mesh is None:
            raise ValueError("ring_loss needs the mesh — use "
                             "make_sharded_train_step")
        return siglip_ring_loss(img_emb, txt_emb, scale, bias, mesh=mesh)
    if cfg.loss == "siglip":
        return siglip_loss(img_emb, txt_emb, scale, bias)
    return clip_loss(img_emb, txt_emb, scale, bias)


def train_step(params, opt_state, batch, *, cfg: TrainConfig,
               tx: optax.GradientTransformation, mesh: Mesh | None = None):
    loss, grads = jax.value_and_grad(
        partial(loss_fn, cfg=cfg, mesh=mesh))(params, batch)
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss


def make_sharded_train_step(cfg: TrainConfig, mesh: Mesh, params):
    """jit the train step over the mesh: batch sharded over 'data', params
    replicated (DP) or Megatron-sharded over 'model' (DP×TP).

    The optimizer state is initialized under jit from the already-placed
    params, so adamw's mu/nu moments inherit the param shardings
    automatically (GSPMD propagation) — no hand-written state specs.
    Returns (jitted_step, placed_params, placed_opt_state).
    """
    if cfg.tensor_parallel and cfg.fsdp:
        raise ValueError("tensor_parallel and fsdp are mutually exclusive")
    if cfg.tensor_parallel:
        param_specs = {
            "visual": tp_param_specs(params["visual"], tower="vit"),
            "text": tp_param_specs(params["text"], tower="text"),
            "logit_scale": P(),
            "logit_bias": P(),
        }
    elif cfg.fsdp:
        param_specs = jax.tree.map(partial(_fsdp_spec, mesh=mesh), params)
    else:
        param_specs = jax.tree.map(lambda _: P(), params)

    param_sh = jax.tree.map(
        lambda s: NamedSharding(mesh, s), param_specs,
        is_leaf=lambda x: isinstance(x, P),
    )
    params = jax.device_put(params, param_sh)
    tx = make_optimizer(cfg)
    opt_state = jax.jit(tx.init)(params)

    batch_sh = {
        "pixels": NamedSharding(mesh, P(DATA_AXIS)),
        "input_ids": NamedSharding(mesh, P(DATA_AXIS)),
    }
    step = jax.jit(
        partial(train_step, cfg=cfg, tx=tx,
                mesh=mesh if cfg.ring_loss else None),
        in_shardings=(param_sh, None, batch_sh),
        out_shardings=(param_sh, None, NamedSharding(mesh, P())),
        donate_argnums=(0, 1),
    )
    return step, params, opt_state


# ---------------------------------------------------------------------------
# checkpoint / resume
# ---------------------------------------------------------------------------

def save_checkpoint(path, params, opt_state=None, *, step: int = 0) -> None:
    """Persist train state with orbax (sharded-aware). The inference-side
    artifact contract stays npz (clip_embedder_tpu.weights); this is the
    training-side checkpoint/resume the reference has no analog for
    (SURVEY.md §5 checkpoint/resume)."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        state = {"params": params, "step": step}
        if opt_state is not None:
            state["opt_state"] = opt_state
        from pathlib import Path

        ckptr.save(Path(path).absolute() / f"step_{step}", state)


def load_checkpoint(path, *, step: int, abstract_state=None):
    """Restore train state saved by save_checkpoint."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        from pathlib import Path

        return ckptr.restore(Path(path).absolute() / f"step_{step}",
                             abstract_state)


def export_trained_model(model_dir, params) -> None:
    """Write trained tower params into a model dir's native weight files so
    the inference embedders serve them (training → serving handoff).

    When the dir already carries an ``open_clip_config.json``, the trained
    trees are validated against the architecture it resolves — an export
    whose config doesn't describe the weights (e.g. a non-default mlp_ratio
    the JSON omits) fails HERE as a typed WeightError instead of producing
    a dir that every later load rejects."""
    from pathlib import Path

    from .weights import save_pytree, validate_tower_pytree

    model_dir = Path(model_dir)
    occ = model_dir / "open_clip_config.json"
    if occ.is_file():
        from .config import OpenClipConfig
        from .models.build import resolve_text, resolve_vision

        cfg = OpenClipConfig.from_file(occ)
        validate_tower_pytree(
            params["visual"], resolve_vision(cfg.model_cfg),
            source="trained visual params vs open_clip_config.json")
        validate_tower_pytree(
            params["text"], resolve_text(cfg.model_cfg),
            source="trained text params vs open_clip_config.json")
    save_pytree(model_dir / "visual.npz", params["visual"])
    save_pytree(model_dir / "text.npz", params["text"])
