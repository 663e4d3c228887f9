"""VisionEmbedder: image → L2-normalized embedding.

Public surface mirrors the reference's ``VisionEmbedder``
(reference: src/vision.rs:20-140): ``from_hf`` / ``from_local_id`` /
``from_local_dir`` construction, ``embed_image`` / ``embed_images``,
``preprocess`` / ``preprocess_batch``, ``duplicate``. The engine differs
end-to-end: preprocessing is a fused on-device matmul-resize
(clip_embedder_tpu.ops.preprocess) instead of a rayon/SIMD host loop, and
the tower is a from-scratch jit-compiled JAX ViT/FastViT instead of an ONNX
Runtime session.
"""

from __future__ import annotations

from functools import lru_cache
from pathlib import Path
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .config import ModelConfig, OpenClipConfig
from .errors import ConfigError, InferenceError, WeightError
from .model_manager import (
    NATIVE_VISUAL,
    get_default_base_folder,
    get_hf_model,
    verify_model_dir,
)
from .models.build import TowerSpec, resolve_vision
from .ops.preprocess import Preprocessor
from .utils.images import to_rgb_array
from .weights import load_pytree, save_pytree, validate_tower_pytree


def to_device_tree(params: dict, dtype) -> dict:
    """numpy pytree → device pytree, casting float leaves to ``dtype``.
    Dequantization scales (``w_scale``) stay f32 — rounding them to bf16
    would add systematic per-channel error on top of the int8 budget."""
    from jax.tree_util import tree_map_with_path

    def conv(path, a):
        a = np.asarray(a)
        if not np.issubdtype(a.dtype, np.floating):
            return jnp.asarray(a)
        key = getattr(path[-1], "key", None) if path else None
        if key == "w_scale":
            return jnp.asarray(a, dtype=jnp.float32)
        return jnp.asarray(a, dtype=dtype)

    return tree_map_with_path(conv, params)


def _maybe_derive_vision_dims(model_dir: Path,
                              config: OpenClipConfig) -> None:
    """For the families whose per-size dim tables are paper-reconstructed
    with no independent in-env anchor (PE-Core: models.build._PE_CORE_SIZES;
    EVA02: models.eva02._EVA02_VARIANTS), dirs that arrived as reference
    ONNX exports carry the ground truth IN the graph — recover the dims
    from it and persist them into ``vision_cfg.{pe_cfg,eva02_cfg}``, so a
    real exported dir loads with self-derived dims and wrong table entries
    can't silently load. Leaves the config untouched (table + loud
    weight-load failure) when derivation fails."""
    v = config.model_cfg.vision_cfg
    name = (v.timm_model_name or "").lower()
    if "pe_core" in name:
        from .onnx_reader import derive_pe_cfg as derive
        key = "pe_cfg"
    elif name.startswith("eva02_"):
        from .onnx_reader import derive_eva02_cfg as derive
        key = "eva02_cfg"
    elif "fastvit" in name or "mci" in name or "mobileclip" in name:
        # MCi3/MCi4 dims are structure-from-paper (models.fastvit
        # _UNANCHORED_VARIANTS) — the exported graph is the ground truth
        from .onnx_reader import derive_fastvit_cfg as derive
        key = "fastvit_cfg"
    elif name.startswith("convnext"):
        from .onnx_reader import derive_convnext_cfg as derive
        key = "convnext_cfg"
    elif not name and isinstance(config.model_cfg.vision_cfg.layers,
                                 (list, tuple)):
        # ModifiedResNet dirs declare per-stage depths as a list; the graph
        # additionally carries the attnpool head count the config lacks
        from .onnx_reader import derive_resnet_cfg as derive
        key = "resnet_cfg"
    else:
        return
    if v.extra.get(key):
        return
    onnx_path = model_dir / "visual.onnx"
    if not onnx_path.is_file():
        return
    try:
        derived = derive(onnx_path)
    except WeightError:
        return
    v.extra[key] = derived
    # persist, so later loads (incl. the .npz fast path, whose spec still
    # resolves from this config) never re-read the ONNX
    from .config import update_config_json

    update_config_json(
        model_dir / "open_clip_config.json",
        lambda raw: raw.setdefault("model_cfg", {}).setdefault(
            "vision_cfg", {}).__setitem__(key, derived))


def derive_vision_dims_from_sd(model_dir: Path, config: OpenClipConfig,
                               visual_sd: dict) -> None:
    """Checkpoint-path twin of :func:`_maybe_derive_vision_dims` (used by
    pull_weights.convert_checkpoint): for the families whose per-size dim
    tables are paper-reconstructed (PE-Core, FastViT MCi3/MCi4), the
    checkpoint state dict carries the ground-truth shapes — derive the
    dims from it and persist them, so table rows are last-resort-with-
    warning only when neither a graph nor a checkpoint exists (the
    exporter pattern: read the real model, never a table — reference:
    pull_onnx.py:93-150)."""
    v = config.model_cfg.vision_cfg
    name = (v.timm_model_name or "").lower()
    if "pe_core" in name:
        from .weights import derive_pe_cfg_from_sd as derive
        key = "pe_cfg"
    elif "fastvit" in name or "mci" in name or "mobileclip" in name:
        from .models.fastvit import derive_fastvit_cfg_from_sd as derive
        key = "fastvit_cfg"
    elif name.startswith("eva02_"):
        from .models.eva02 import derive_eva02_cfg_from_sd as derive
        key = "eva02_cfg"
    else:
        return
    if v.extra.get(key):
        return
    try:
        derived = derive(visual_sd)
    except WeightError:
        return
    v.extra[key] = derived
    from .config import update_config_json

    update_config_json(
        model_dir / "open_clip_config.json",
        lambda raw: raw.setdefault("model_cfg", {}).setdefault(
            "vision_cfg", {}).__setitem__(key, derived))


def _load_or_convert_visual(model_dir: Path, spec: TowerSpec, dtype) -> dict:
    """Load native weights, converting from ONNX once if needed (the cache
    role the reference's model dir plays for ORT — SURVEY.md §5
    checkpoint/resume)."""
    if spec.family == "onnx":
        # fallback family: the graph initializers ARE the params; kept in
        # the graph's exported dtype (compute_dtype autocasts the hot ops
        # in-graph), no npz caching needed
        from .onnx_exec import get_tower

        tower = get_tower(spec.cfg)
        if spec.cfg.quantize and not tower.quant_names:
            raise ConfigError(
                "int8 quantization found no quantizable (MatMul) "
                f"initializers in {spec.cfg.path}")
        return {k: jnp.asarray(v) for k, v in tower.params.items()}
    native = model_dir / NATIVE_VISUAL
    if native.is_file():
        params = load_pytree(native, dtype=dtype)
        validate_tower_pytree(params, spec, source=native)
        return params
    from .onnx_reader import extract_tower_params

    params = extract_tower_params(model_dir / "visual.onnx", spec, tower="visual")
    try:
        save_pytree(native, params)
    except OSError:
        pass  # read-only model dir: skip the cache, stay functional
    return to_device_tree(params, dtype)


# families whose forward consumes the preprocess output channels-first
# ([B, 3, S, S] — ops.preprocess layout="nchw", zero transposes end to end);
# the conv families keep NHWC (their lax.conv layout).
CHW_FAMILIES = frozenset({"vit", "eva02", "onnx"})


def preprocess_layout(family: str) -> str:
    return "nchw" if family in CHW_FAMILIES else "nhwc"


@lru_cache(maxsize=64)
def _jitted_vision_forward(spec: TowerSpec, attn_impl: str):
    """One jitted forward per (tower spec, attn impl) — shared across all
    embedder instances, so ``duplicate()`` (reference: src/vision.rs:87-91)
    and repeated construction never recompile. Pixel layout per family:
    see ``preprocess_layout``."""
    from .utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()

    def apply(params, pixels):
        if spec.family == "vit":
            from .models import vit

            return vit.apply(params, pixels, spec.cfg, attn_impl=attn_impl,
                             channels_first=True)
        if spec.family == "fastvit":
            from .models import fastvit

            return fastvit.apply(params, pixels, spec.cfg)
        if spec.family == "resnet":
            from .models import resnet

            return resnet.apply(params, pixels, spec.cfg)
        if spec.family == "convnext":
            from .models import convnext

            return convnext.apply(params, pixels, spec.cfg)
        if spec.family == "eva02":
            from .models import eva02

            return eva02.apply(params, pixels, spec.cfg, channels_first=True,
                               attn_impl=attn_impl)
        if spec.family == "onnx":
            from .onnx_exec import get_tower
            from .ops.normalize import l2_normalize

            tower = get_tower(spec.cfg)
            name = next((n for n in ("pixel_values", "input")
                         if n in tower.input_names), tower.input_names[0])
            out = tower(params, {name: pixels.astype(jnp.float32)})
            # exported graphs bake normalize=True (pull_onnx.py:53-68);
            # re-normalizing is a no-op there and enforces our unit-norm
            # contract for graphs that don't
            return l2_normalize(out)
        raise InferenceError(f"Unknown vision family '{spec.family}'")

    return jax.jit(apply)


# families whose forward actually threads attn_impl; anything else must not
# silently ignore a non-default request (it would report e.g. "pallas" while
# running the XLA path).
ATTN_IMPL_FAMILIES = frozenset({"vit", "text_transformer", "hf_bert",
                                "eva02", "mct"})


def check_attn_impl(family: str, attn_impl: str) -> None:
    if attn_impl != "xla" and family not in ATTN_IMPL_FAMILIES:
        raise ConfigError(
            f"attn_impl='{attn_impl}' is not supported for the '{family}' "
            f"family (supported families: {sorted(ATTN_IMPL_FAMILIES)}); "
            "use attn_impl='xla'"
        )


def resolve_attn_impl(family: str, attn_impl: str) -> str:
    """Resolve the embedder-level ``attn_impl`` request. ``"auto"`` (the
    default) picks the fused packed-head Pallas kernel on a TPU backend for
    families that thread it, and the XLA core everywhere else (CPU, or a
    family the kernel doesn't cover) — a TPU-first framework should not
    hide its fast path behind an opt-in. Explicit values are validated
    and passed through: ``"pallas_fast"`` (drops the softmax max-pass —
    the benchmark configuration) and ``"xla"`` (required under tensor
    parallelism, where GSPMD partitions the einsum attention natively but
    a Pallas call is an opaque boundary — docs/DEPLOYMENT.md)."""
    if attn_impl == "auto":
        import jax

        if jax.default_backend() == "tpu" and family in ATTN_IMPL_FAMILIES:
            return "pallas"
        return "xla"
    check_attn_impl(family, attn_impl)
    return attn_impl


class VisionEmbedder:
    """Image tower + preprocessing (reference: src/vision.rs:20-27)."""

    def __init__(
        self,
        *,
        params: dict,
        spec: TowerSpec,
        config: OpenClipConfig,
        model_config: ModelConfig,
        model_dir: Path,
        dtype: Any = jnp.float32,
        attn_impl: str = "auto",
        quantize: str | None = None,
    ):
        attn_impl = resolve_attn_impl(spec.family, attn_impl)
        self.params = params
        self.spec = spec
        self.config = config
        self.model_config = model_config
        self.model_dir = Path(model_dir)
        self.dtype = dtype
        self.attn_impl = attn_impl
        self.quantize = quantize

        pp = config.preprocess_cfg
        self.preprocessor = Preprocessor(
            image_size=config.model_cfg.vision_cfg.image_size,
            mean=pp.mean,
            std=pp.std,
            interpolation=pp.interpolation,
            resize_mode=pp.resize_mode,
            out_dtype=dtype,
            layout=preprocess_layout(spec.family),
        )
        self._forward = _jitted_vision_forward(spec, attn_impl)

    # -- construction (reference: src/vision.rs:31-84) ---------------------

    @classmethod
    def from_local_dir(
        cls, model_dir: Path | str, *, dtype: Any = jnp.float32,
        attn_impl: str = "auto", quantize: str | None = None,
    ) -> "VisionEmbedder":
        model_dir = Path(model_dir)
        verify_model_dir(model_dir)
        config = OpenClipConfig.from_file(model_dir / "open_clip_config.json")
        model_config = ModelConfig.from_file(model_dir / "model_config.json")
        _maybe_derive_vision_dims(model_dir, config)
        try:
            spec = resolve_vision(config.model_cfg)
            params = _load_or_convert_visual(model_dir, spec, dtype)
        except (ConfigError, WeightError) as err:
            # see text.py: a present native .npz that failed to load is
            # corruption — surface it instead of rerouting to the executor
            onnx_path = model_dir / "visual.onnx"
            if ((model_dir / NATIVE_VISUAL).is_file()
                    or not onnx_path.is_file()):
                raise
            from .onnx_exec import fallback_cfg
            from .utils.logging import warn_once

            warn_once(
                f"vision_fallback:{model_dir}",
                "no native vision tower for %s — serving the graph via the "
                "ONNX executor instead (%s)", str(model_dir), err)

            # the executor fallback rides the same TPU levers: dtype maps
            # to matmul/conv bf16 autocast, quantize to W8A8 MatMuls
            spec = TowerSpec("onnx", fallback_cfg(onnx_path, dtype=dtype,
                                                  quantize=quantize))
            params = _load_or_convert_visual(model_dir, spec, dtype)
        if quantize in ("int8", "int8_all"):
            if spec.family != "onnx":  # executor graphs quantize at load
                # opt-in W8A8: "int8" = MLP blocks, "int8_all" = MLP +
                # attention projections (see ops.quant for the accuracy
                # tradeoffs); incompatible with tensor-parallel sharding.
                from .ops.quant import quantize_tree_checked

                params = to_device_tree(
                    quantize_tree_checked(params, spec.family, mode=quantize),
                    dtype)
        elif quantize is not None:
            raise ConfigError(f"Unknown quantize mode '{quantize}'")
        return cls(
            params=params, spec=spec, config=config, model_config=model_config,
            model_dir=model_dir, dtype=dtype, attn_impl=attn_impl,
            quantize=quantize,
        )

    @classmethod
    def from_local_id(
        cls, model_id: str, *, base_folder: Path | str | None = None, **kw
    ) -> "VisionEmbedder":
        base = Path(base_folder) if base_folder else get_default_base_folder()
        return cls.from_local_dir(base / model_id, **kw)

    @classmethod
    def from_hf(cls, model_id: str, **kw) -> "VisionEmbedder":
        return cls.from_local_dir(get_hf_model(model_id), **kw)

    def duplicate(self) -> "VisionEmbedder":
        """Fresh instance over the same model dir
        (reference: src/vision.rs:87-91). Params are shared device buffers —
        duplication is cheap and the instances are independently usable."""
        return VisionEmbedder(
            params=self.params, spec=self.spec, config=self.config,
            model_config=self.model_config, model_dir=self.model_dir,
            dtype=self.dtype, attn_impl=self.attn_impl, quantize=self.quantize,
        )

    # -- embedding (reference: src/vision.rs:94-117) -----------------------

    def embed_image(self, image: Any) -> np.ndarray:
        return self.embed_images([image])[0]

    def embed_images(self, images: Sequence[Any]) -> np.ndarray:
        embs, n = self.embed_images_device(images)
        return np.asarray(embs[:n].astype(jnp.float32))

    def embed_images_device(self, images: Sequence[Any]):
        """Asynchronous variant: dispatches the forward and returns
        ``(embeddings_device, n)`` WITHOUT host synchronization — the
        [bucket, D] result stays on device until read. Lets a caller
        (parallel.pipeline.EmbedPipeline) keep a batch in flight while the
        previous one reads back."""
        if len(images) == 0:
            raise InferenceError("Empty batch")
        arrays = [to_rgb_array(img) for img in images]
        pixels = self.preprocessor(arrays)  # [bucket, S, S, 3]
        return self._forward(self.params, pixels), len(arrays)

    # -- preprocessing only (reference: src/vision.rs:120-138) -------------

    def preprocess(self, image: Any) -> np.ndarray:
        return self.preprocess_batch([image])

    def preprocess_batch(self, images: Sequence[Any]) -> np.ndarray:
        """Returns the preprocessed tensor in the reference's NCHW f32 layout
        ([B, 3, S, S] — reference: src/vision.rs:120-135) for parity
        debugging, regardless of the family's internal device layout."""
        arrays = [to_rgb_array(img) for img in images]
        pixels = self.preprocessor(arrays)[: len(images)].astype(jnp.float32)
        if self.preprocessor.layout != "nchw":
            pixels = jnp.transpose(pixels, (0, 3, 1, 2))
        return np.asarray(pixels)
