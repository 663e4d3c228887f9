#!/usr/bin/env python
"""Convert an open_clip-compatible HuggingFace model into a native model dir.

The TPU-native analog of the reference's offline exporter
(reference: pull_onnx.py): instead of exporting torch graphs to ONNX, this
downloads the original open_clip checkpoint and converts its weights into
this framework's npz pytrees, producing a model dir that satisfies the
same contract (model_config.json, open_clip_config.json, tokenizer files,
weights) in the same default cache (~/.cache/open_clip_rs).

It also accepts the reference's published ONNX model dirs: point ``--dir``
at one and the .onnx weights are converted in place.

Usage:
    python pull_weights.py --id timm/ViT-SO400M-16-SigLIP2-384
    python pull_weights.py --dir /path/to/onnx/model/dir
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np

CONFIG_FILES = (
    "open_clip_config.json",
    "tokenizer.json",
    "tokenizer_config.json",
    "special_tokens_map.json",
    # carried over from the source repo like the reference exporter does
    # (reference: pull_onnx.py:43-50) — the upstream model card is rewritten
    # with this framework's usage header, keeping its frontmatter/content
    "README.md",
    ".gitattributes",
)
CHECKPOINT_CANDIDATES = (
    "open_clip_model.safetensors",
    "open_clip_pytorch_model.safetensors",
    "open_clip_pytorch_model.bin",
    "model.safetensors",
    "pytorch_model.bin",
)


def load_checkpoint(path: Path) -> dict[str, np.ndarray]:
    if path.suffix == ".safetensors":
        from safetensors.numpy import load_file

        return load_file(str(path))
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: v.numpy() for k, v in sd.items()}


def derive_model_config(repo_id: str, open_clip_config: dict,
                        sd: dict[str, np.ndarray]) -> dict:
    """Derive scoring metadata from the checkpoint — the role of the
    reference exporter's get_model_config (reference: pull_onnx.py:128-150):
    SigLIP detection (repo name or init_logit_bias), exp'd logit scale,
    sigmoid vs softmax head, lowercasing, and the SigLIP-v1 pad-id quirk.
    """
    model_cfg = open_clip_config.get("model_cfg", {})
    is_siglip = "siglip" in repo_id.lower() or "init_logit_bias" in model_cfg
    is_siglip2 = "siglip2" in repo_id.lower()

    logit_scale = float(np.exp(np.asarray(sd.get("logit_scale", 0.0)).item()))
    logit_bias = float(np.asarray(sd.get("logit_bias", 0.0)).item()) if "logit_bias" in sd else 0.0

    vocab_size = None
    for key in ("token_embedding.weight", "text.token_embedding.weight"):
        if key in sd:
            vocab_size = int(sd[key].shape[0])
            break
    if vocab_size is None:
        vocab_size = model_cfg.get("text_cfg", {}).get("vocab_size")

    return {
        "logit_scale": logit_scale,
        "logit_bias": logit_bias,
        "activation_function": "sigmoid" if is_siglip else "softmax",
        "tokenizer_needs_lowercase": is_siglip,
        "pad_id": 1 if (is_siglip and not is_siglip2) else 0,
        "vocab_size": vocab_size,
    }


def convert_checkpoint(model_dir: Path, sd: dict[str, np.ndarray]) -> None:
    """Map a full open_clip state dict into visual.npz / text.npz."""
    from clip_embedder_tpu.config import OpenClipConfig
    from clip_embedder_tpu.models.build import resolve_text, resolve_vision
    from clip_embedder_tpu.weights import (
        map_state_dict,
        save_pytree,
        validate_tower_pytree,
    )

    cfg = OpenClipConfig.from_file(model_dir / "open_clip_config.json")
    visual_sd = {k: v for k, v in sd.items() if k.startswith("visual.")}
    text_sd = {
        k: v for k, v in sd.items()
        if not k.startswith("visual.") and k not in ("logit_scale", "logit_bias")
    }
    # the checkpoint is the ground truth for the paper-table families
    # (PE-Core sizes, FastViT MCi3/MCi4): derive + persist dims from its
    # shapes before resolving the architecture
    from clip_embedder_tpu.vision import derive_vision_dims_from_sd

    derive_vision_dims_from_sd(model_dir, cfg, visual_sd)
    vspec = resolve_vision(cfg.model_cfg)
    tspec = resolve_text(cfg.model_cfg)
    vparams = map_state_dict(visual_sd, tower="visual", family=vspec.family)
    tparams = map_state_dict(text_sd, tower="text", family=tspec.family)
    # fail at conversion (typed, naming paths) rather than at first load if
    # the mapped tree doesn't match the resolved architecture — e.g. a
    # checkpoint paired with the wrong open_clip_config.json
    validate_tower_pytree(vparams, vspec, source="mapped checkpoint (visual)")
    validate_tower_pytree(tparams, tspec, source="mapped checkpoint (text)")
    save_pytree(model_dir / "visual.npz", vparams)
    save_pytree(model_dir / "text.npz", tparams)


def convert_onnx_dir(model_dir: Path) -> None:
    """Convert a reference-style ONNX model dir's weights in place."""
    from clip_embedder_tpu.config import OpenClipConfig
    from clip_embedder_tpu.models.build import resolve_text, resolve_vision
    from clip_embedder_tpu.onnx_reader import extract_tower_params
    from clip_embedder_tpu.weights import save_pytree

    cfg = OpenClipConfig.from_file(model_dir / "open_clip_config.json")
    # hf_model_name (BERT-class) dirs carry no HF config.json — recover the
    # architecture dims from the text graph itself (and persist them)
    from clip_embedder_tpu.text import _maybe_derive_hf_config

    _maybe_derive_hf_config(model_dir, cfg)
    vspec = resolve_vision(cfg.model_cfg)
    tspec = resolve_text(cfg.model_cfg)
    save_pytree(
        model_dir / "visual.npz",
        extract_tower_params(model_dir / "visual.onnx", vspec, tower="visual"),
    )
    save_pytree(
        model_dir / "text.npz",
        extract_tower_params(model_dir / "text.onnx", tspec, tower="text"),
    )


def run_pull(repo_id: str, base_output_dir: Path) -> Path:
    from huggingface_hub import hf_hub_download

    out = base_output_dir / repo_id
    out.mkdir(parents=True, exist_ok=True)

    for filename in CONFIG_FILES:
        try:
            p = hf_hub_download(repo_id=repo_id, filename=filename)
            (out / filename).write_bytes(Path(p).read_bytes())
            print(f"  ok   {filename}")
        except Exception as e:  # noqa: BLE001
            print(f"  miss {filename} ({type(e).__name__})")

    if not (out / "open_clip_config.json").is_file():
        raise SystemExit(
            f"'{repo_id}' has no open_clip_config.json — not an "
            f"open_clip-compatible repo (transformers-format repos are not "
            f"supported; use the original open_clip checkpoint repo)"
        )

    ckpt = None
    for filename in CHECKPOINT_CANDIDATES:
        try:
            ckpt = Path(hf_hub_download(repo_id=repo_id, filename=filename))
            print(f"  ok   {filename}")
            break
        except Exception:  # noqa: BLE001
            continue
    if ckpt is None:
        raise SystemExit(f"No open_clip checkpoint found in {repo_id}")

    sd = load_checkpoint(ckpt)
    occ = json.loads((out / "open_clip_config.json").read_text())
    (out / "model_config.json").write_text(
        json.dumps(derive_model_config(repo_id, occ, sd), indent=2)
    )
    _inject_hf_text_config(out, occ)
    convert_checkpoint(out, sd)
    write_model_readme(out, repo_id)
    print(f"Done: {out}")
    return out


def _usage_header(model_dir: Path, repo_id: str) -> str:
    name = repo_id.split("/", 1)[-1]
    return f"""# {name} — clip_embedder_tpu model dir

Converted from [`{repo_id}`](https://huggingface.co/{repo_id}) by
`pull_weights.py`. Serve it with the TPU-native framework:

```python
from clip_embedder_tpu import Clip

clip = Clip.from_local_dir("{model_dir}")
results = clip.classify("cat.jpg", [
    "A photo of a cat",
    "A photo of a dog",
    "A photo of a beignet",
])
for label, prob in results:
    print(f"{{label}}: {{prob*100:.1f}}%")
```

Contents follow the reference model-dir contract
(`open_clip_config.json`, `model_config.json`, `tokenizer.json`, …) plus
native `visual.npz`/`text.npz` weight pytrees.

---
"""


def write_model_readme(model_dir: Path, repo_id: str) -> None:
    """Write or rewrite the model dir's README (the analog of the reference
    exporter's _modify_readme — reference: pull_onnx.py:184-248): keep the
    upstream model card's YAML frontmatter (minus ``library_name:``, which
    would mislabel the dir) and body, and inject this framework's usage
    header between them. When the source repo carried no README, the header
    alone becomes the model card."""
    readme = model_dir / "README.md"
    header = _usage_header(model_dir, repo_id)
    if not readme.is_file():
        readme.write_text(header)
        return
    content = readme.read_text(encoding="utf-8")
    if "— clip_embedder_tpu model dir" in content:
        # already rewritten (rerun whose upstream README download missed):
        # injecting again would stack a second usage header on the card
        return
    if content.startswith("---"):
        parts = content.split("---", 2)
        if len(parts) >= 3:
            frontmatter = "\n".join(
                line for line in parts[1].splitlines()
                if not line.strip().startswith("library_name:")
            ).strip("\n")
            readme.write_text(
                f"---\n{frontmatter}\n---\n\n{header}\n{parts[2].lstrip()}")
            return
    readme.write_text(header + "\n" + content)


def _inject_hf_text_config(out: Path, occ: dict) -> None:
    """For hf_model_name text towers (BiomedCLIP family) the architecture
    dims live in the HF model's config.json, which the reference model-dir
    contract doesn't carry — fetch it at conversion time and store it under
    ``text_cfg.hf_config`` (read by models.hf_text.resolve_hf_text)."""
    text_cfg = occ.get("model_cfg", {}).get("text_cfg", {})
    hf_name = text_cfg.get("hf_model_name")
    if not hf_name or text_cfg.get("hf_config"):
        return
    from huggingface_hub import hf_hub_download

    try:
        cfg_path = hf_hub_download(repo_id=hf_name, filename="config.json")
        hf_cfg = json.loads(Path(cfg_path).read_text())
    except Exception as e:  # noqa: BLE001
        print(f"  warn: could not fetch HF config for {hf_name}: {e}")
        return
    text_cfg["hf_config"] = {
        k: hf_cfg[k]
        for k in ("vocab_size", "hidden_size", "num_attention_heads",
                  "num_hidden_layers", "intermediate_size", "pad_token_id",
                  "layer_norm_eps",
                  # RoBERTa-class towers (xlm-roberta-large-ViT-H-14):
                  # position-id style + table size (models/hf_text.py)
                  "model_type", "max_position_embeddings")
        if k in hf_cfg
    }
    (out / "open_clip_config.json").write_text(json.dumps(occ, indent=2))


def main() -> None:
    from clip_embedder_tpu.model_manager import get_default_base_folder

    parser = argparse.ArgumentParser(
        description="Convert OpenCLIP models to native TPU model dirs."
    )
    parser.add_argument("--id", type=str,
                        help="HuggingFace repo id (open_clip compatible)")
    parser.add_argument("--dir", type=Path,
                        help="Existing ONNX model dir to convert in place")
    parser.add_argument("--output", type=Path,
                        default=get_default_base_folder(),
                        help="Base output directory")
    args = parser.parse_args()

    if args.dir:
        convert_onnx_dir(args.dir)
        print(f"Converted ONNX weights in {args.dir}")
    elif args.id:
        run_pull(args.id, args.output)
    else:
        parser.error("one of --id or --dir is required")


if __name__ == "__main__":
    main()
