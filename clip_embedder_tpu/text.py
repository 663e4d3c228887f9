"""TextEmbedder: text → L2-normalized embedding.

Public surface mirrors the reference's ``TextEmbedder``
(reference: src/text.rs:13-169): ``from_hf`` / ``from_local_id`` /
``from_local_dir``, ``tokenize``, ``embed_text`` / ``embed_texts``,
``duplicate``; same pad-id resolution (``model_config.pad_id`` falling back
to the tokenizer's ``<pad>`` entry — src/text.rs:70-73), same fixed
pad/truncate to ``context_length`` (src/text.rs:76-85), same SigLIP
pre-lowercasing rule (src/text.rs:115-121). The engine is the from-scratch
tokenizer (clip_embedder_tpu.tokenizer) plus a jit-compiled JAX text tower
instead of HF `tokenizers` + an ONNX Runtime session.
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
    NATIVE_TEXT,
    get_default_base_folder,
    get_hf_model,
    verify_model_dir,
)
from .models.build import TowerSpec, resolve_text
from .ops.preprocess import bucket_batch
from .tokenizer import Tokenizer
from .weights import load_pytree, save_pytree, validate_tower_pytree


def _maybe_derive_hf_config(model_dir: Path, config: OpenClipConfig) -> None:
    """For ``hf_model_name`` (BERT/RoBERTa) dirs that arrived as reference
    ONNX exports: the dir contract carries no HF config.json, so recover the
    architecture dims from the text graph itself and persist them into
    ``text_cfg.hf_config`` — the BiomedCLIP class (reference README.md:143)
    then rides the native tower instead of the generic executor. Leaves the
    config untouched (executor fallback) when derivation fails."""
    tcfg = config.model_cfg.text_cfg
    if not (tcfg.hf_model_name or tcfg.extra.get("hf_model_name")):
        return
    if tcfg.extra.get("hf_config"):
        return
    onnx_path = model_dir / "text.onnx"
    if not onnx_path.is_file():
        return
    from .onnx_reader import derive_bert_hf_config

    try:
        hf_cfg = derive_bert_hf_config(onnx_path)
    except WeightError:
        return
    tcfg.extra["hf_config"] = hf_cfg
    # persist, so later loads (and the .npz fast path, whose spec still
    # resolves from this config) never re-read the ONNX; both writers
    # derive identical content from the same graph, so the helper's
    # last-replace-wins atomicity is safe
    from .config import update_config_json

    update_config_json(
        model_dir / "open_clip_config.json",
        lambda raw: raw.setdefault("model_cfg", {}).setdefault(
            "text_cfg", {}).__setitem__("hf_config", hf_cfg))


def _maybe_native_hybrid(model_dir: Path, onnx_path: Path) -> TowerSpec | None:
    """MCT-class hybrid text (MobileCLIP-S0): when the standard families
    fail, try to lift the exported graph into the native hybrid tower
    (models.mct) instead of the generic executor, so the family rides the
    bf16/int8/Pallas stack like every other text tower.

    Honesty contract (COMPONENTS.md unanchored-family rule): the
    architecture is derived from the graph itself
    (onnx_reader.derive_mct_cfg), the weights recovered by consumption
    order, and the converted tower is probe-verified against the generic
    ONNX executor ON THE SAME GRAPH before acceptance
    (onnx_reader.probe_verify, shared by every structural conversion) — a
    structure misread yields ``None`` (round-3 executor behavior), never
    wrong embeddings. On success the derived cfg is persisted into
    open_clip_config.json so later loads resolve natively without
    re-deriving."""
    from .models.mct import MctCfg
    from .onnx_reader import derive_mct_cfg, extract_tower_params

    try:
        raw = derive_mct_cfg(onnx_path)
    except WeightError:
        return None
    spec = TowerSpec("mct", MctCfg(**raw))
    try:
        # includes the probe_verify executor cross-check
        extract_tower_params(onnx_path, spec, tower="text")
    except WeightError:
        return None

    from .config import update_config_json

    # JSON round-trips the conv-block tuples as lists; resolve_text
    # re-tuples them
    persisted = dict(raw)
    persisted["conv_blocks"] = [list(b) for b in raw["conv_blocks"]]
    try:
        update_config_json(
            model_dir / "open_clip_config.json",
            lambda r: r.setdefault("model_cfg", {}).setdefault(
                "text_cfg", {}).__setitem__("mct_cfg", persisted))
    except OSError:
        pass  # read-only dir: native path still works this process
    return spec


def _load_or_convert_text(model_dir: Path, spec: TowerSpec, dtype) -> dict:
    from .vision import to_device_tree

    if spec.family == "onnx":
        from .onnx_exec import get_tower

        tower = get_tower(spec.cfg)
        if spec.cfg.quantize and not tower.quant_names:
            raise ConfigError(
                "int8 quantization found no quantizable (MatMul) "
                f"initializers in {spec.cfg.path}")
        return {k: jnp.asarray(v) for k, v in tower.params.items()}

    native = model_dir / NATIVE_TEXT
    if native.is_file():
        params = load_pytree(native, dtype=dtype)
        validate_tower_pytree(params, spec, source=native)
        return params
    from .onnx_reader import extract_tower_params

    params = extract_tower_params(model_dir / "text.onnx", spec, tower="text")
    try:
        save_pytree(native, params)
    except OSError:
        pass
    return to_device_tree(params, dtype)


@lru_cache(maxsize=64)
def _jitted_text_forward(spec: TowerSpec, attn_impl: str):
    """One jitted forward per (tower spec, attn impl) — shared across
    instances so ``duplicate()`` never recompiles."""
    from .utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()

    def apply(params, ids, mask=None):
        if spec.family == "text_transformer":
            from .models import text_transformer

            return text_transformer.apply(params, ids, spec.cfg, attn_impl=attn_impl)
        if spec.family == "hf_bert":
            from .models import hf_text

            # the tokenizer-produced mask is authoritative: its resolved
            # pad id (model_config.pad_id / '<pad>' vocab) can differ from
            # the HF config's pad_token_id that cfg.pad_id carries
            return hf_text.apply(params, ids, spec.cfg,
                                 attn_impl=attn_impl,
                                 attention_mask=mask)
        if spec.family == "mct":
            from .models import mct

            return mct.apply(params, ids, spec.cfg, attn_impl=attn_impl)
        if spec.family == "onnx":
            # run-any-graph fallback (MCT and friends); mask passed only if
            # the graph declares it (reference: src/text.rs:90,156-161)
            from .onnx_exec import get_tower
            from .ops.normalize import l2_normalize

            tower = get_tower(spec.cfg)
            name = next((n for n in ("input_ids", "input")
                         if n in tower.input_names), tower.input_names[0])
            feeds = {name: ids}
            if mask is not None and "attention_mask" in tower.input_names:
                feeds["attention_mask"] = mask
            return l2_normalize(tower(params, feeds))
        raise InferenceError(f"Unknown text family '{spec.family}'")

    return jax.jit(apply)


class TextEmbedder:
    """Text tower + tokenizer (reference: src/text.rs:13-22)."""

    def __init__(
        self,
        *,
        params: dict,
        spec: TowerSpec,
        config: OpenClipConfig,
        model_config: ModelConfig,
        tokenizer: Tokenizer,
        model_dir: Path,
        dtype: Any = jnp.float32,
        attn_impl: str = "auto",
        quantize: str | None = None,
    ):
        from .vision import resolve_attn_impl

        attn_impl = resolve_attn_impl(spec.family, attn_impl)
        self.params = params
        self.spec = spec
        self.config = config
        self.model_config = model_config
        self.tokenizer = tokenizer
        self.model_dir = Path(model_dir)
        self.dtype = dtype
        self.attn_impl = attn_impl
        self.quantize = quantize
        self.pad_id = tokenizer.pad_id
        self._forward = _jitted_text_forward(spec, attn_impl)

    # -- construction (reference: src/text.rs:27-101) ----------------------

    @classmethod
    def from_local_dir(
        cls, model_dir: Path | str, *, dtype: Any = jnp.float32,
        attn_impl: str = "auto", quantize: str | None = None,
    ) -> "TextEmbedder":
        model_dir = Path(model_dir)
        verify_model_dir(model_dir)
        config = OpenClipConfig.from_file(model_dir / "open_clip_config.json")
        model_config = ModelConfig.from_file(model_dir / "model_config.json")
        tokenizer = Tokenizer.from_file(model_dir / "tokenizer.json")

        # Pad-id resolution, exactly the reference's chain
        # (src/text.rs:70-73): explicit config value, else '<pad>' vocab id.
        pad_id = model_config.pad_id
        if pad_id is None:
            pad_id = tokenizer.get_vocab(True).get("<pad>")
        if pad_id is None:
            raise ConfigError("No pad token found in tokenizer")
        ctx_len = config.model_cfg.text_cfg.context_length
        tokenizer.with_padding(length=ctx_len, pad_id=int(pad_id))
        tokenizer.with_truncation(max_length=ctx_len)

        _maybe_derive_hf_config(model_dir, config)

        try:
            spec = resolve_text(config.model_cfg)
            if getattr(spec.cfg, "embed_cls", False) \
                    and spec.cfg.pad_id != int(pad_id):
                # CoCa's cls attention mask is built from the ids INSIDE the
                # forward, so it must use the id the tokenizer actually pads
                # with (the chain above) — not text_cfg's default 0. Same
                # authoritative-tokenizer rule as the hf_bert mask.
                import dataclasses

                spec = TowerSpec(spec.family, dataclasses.replace(
                    spec.cfg, pad_id=int(pad_id)))
            params = _load_or_convert_text(model_dir, spec, dtype)
        except (ConfigError, WeightError) as err:
            # run-any-graph fallback (e.g. MobileCLIP-S0's MCT text tower):
            # families without a native tower, or graphs whose structure
            # doesn't match the resolved one, run via the ONNX executor.
            # A present native .npz that failed to load is corruption, not
            # a structural mismatch — surface it instead of rerouting.
            onnx_path = model_dir / "text.onnx"
            if (model_dir / NATIVE_TEXT).is_file() or not onnx_path.is_file():
                raise
            # MCT-class hybrids lift to a native tower when the graph
            # derivation + self-check succeed (see _maybe_native_hybrid)
            spec = _maybe_native_hybrid(model_dir, onnx_path)
            if spec is None:
                from .onnx_exec import fallback_cfg
                from .utils.logging import warn_once

                warn_once(
                    f"text_fallback:{model_dir}",
                    "no native text tower for %s — serving the graph via "
                    "the ONNX executor instead (%s)", str(model_dir), err)

                # executor graphs ride the same TPU levers: dtype → bf16
                # matmul/conv autocast, quantize → W8A8 MatMuls
                spec = TowerSpec("onnx", fallback_cfg(onnx_path, dtype=dtype,
                                                      quantize=quantize))
            params = _load_or_convert_text(model_dir, spec, dtype)
        if quantize in ("int8", "int8_all"):
            if spec.family != "onnx":  # executor graphs quantize at load
                # same no-quantizable-layers contract as VisionEmbedder
                from .ops.quant import quantize_tree_checked
                from .vision import to_device_tree

                params = to_device_tree(
                    quantize_tree_checked(params, spec.family, mode=quantize),
                    dtype)
        elif quantize is not None:
            raise ConfigError(f"Unknown quantize mode '{quantize}'")
        return cls(
            params=params, spec=spec, config=config, model_config=model_config,
            tokenizer=tokenizer, model_dir=model_dir, dtype=dtype,
            attn_impl=attn_impl, quantize=quantize,
        )

    @classmethod
    def from_local_id(
        cls, model_id: str, *, base_folder: Path | str | None = None, **kw
    ) -> "TextEmbedder":
        base = Path(base_folder) if base_folder else get_default_base_folder()
        return cls.from_local_dir(base / model_id, **kw)

    @classmethod
    def from_hf(cls, model_id: str, **kw) -> "TextEmbedder":
        return cls.from_local_dir(get_hf_model(model_id), **kw)

    def duplicate(self) -> "TextEmbedder":
        """(reference: src/text.rs:104-108) — params are shared device
        buffers; the tokenizer is cloned so replicas are independently
        usable across threads (stateful pre-tokenizers carry per-call
        state)."""
        return TextEmbedder(
            params=self.params, spec=self.spec, config=self.config,
            model_config=self.model_config,
            tokenizer=self.tokenizer.clone(),
            model_dir=self.model_dir, dtype=self.dtype,
            attn_impl=self.attn_impl, quantize=self.quantize,
        )

    # -- tokenization (reference: src/text.rs:111-139) ---------------------

    def tokenize(self, texts: Sequence[str]) -> tuple[np.ndarray, np.ndarray]:
        """Texts → fixed-shape int32 (ids, attention_mask) arrays of shape
        [batch, context_length]. SigLIP models lowercase first
        (reference: src/text.rs:115-121)."""
        if self.model_config.tokenizer_needs_lowercase:
            texts = [t.lower() for t in texts]
        return self.tokenizer.encode_batch(list(texts))

    # -- embedding (reference: src/text.rs:142-169) ------------------------

    def embed_text(self, text: str) -> np.ndarray:
        return self.embed_texts([text])[0]

    def embed_texts(self, texts: Sequence[str]) -> np.ndarray:
        if len(texts) == 0:
            raise InferenceError("Empty batch")
        ids, mask = self.tokenize(texts)
        # Pad the batch axis to a bucket so jit caches a handful of programs.
        bb = bucket_batch(len(texts))
        if bb != ids.shape[0]:
            pad = np.full((bb - ids.shape[0], ids.shape[1]), self.pad_id, np.int32)
            ids = np.concatenate([ids, pad], axis=0)
            mask = np.concatenate(
                [mask, np.zeros_like(pad)], axis=0)
        embs = self._forward(self.params, jnp.asarray(ids), jnp.asarray(mask))
        return np.asarray(embs[: len(texts)].astype(jnp.float32))
