#!/usr/bin/env python
"""Network-day validation runbook: pull the reference's full tested-model
list, convert via BOTH paths, and emit an embedding-parity + classify
table.

The reference's parity culture is "verified equal embedding outputs
compared to the reference Python implementation"
(reference: README.md:147-148) plus one executed behavioral test — the
MobileCLIP2 cat classify (reference: tests/integration_test.rs:10-36).
This environment has no network, so that proof cannot be manufactured
here; this script is the ONE command to run the day network exists:

    python scripts/validate_reference_models.py [--output DIR] \
        [--models id1,id2] [--cat-image PATH] [--report PATH]

Per model it:
  1. pulls + converts the original open_clip checkpoint
     (pull_weights.run_pull — the native-weights path);
  2. when the reference publishes an ONNX dir for it (the RuteNL/…-ONNX
     repos), downloads that dir and converts it in place
     (model_manager.get_hf_model + pull_weights.convert_onnx_dir — the
     structural-extraction path, incl. onnx_reader.probe_verify);
  3. checks embedding parity between the two independently-converted dirs
     on probe images/texts (≤1e-3 cosine distance — BASELINE.md's budget;
     the ONNX dir carries the graph ONNX Runtime executes, so matching it
     IS matching the reference engine's inputs);
  4. runs the reference's cat classify gate (top-1 "A photo of a cat"
     p>0.99, runner-up <0.1) on every model;
  5. writes a markdown results table (--report, default
     VALIDATION_RESULTS.md).

Offline behavior is tested with mocked fetches in
tests/test_validate_runbook.py; the script itself needs network.
"""

from __future__ import annotations

import argparse
import sys
import urllib.request
from dataclasses import dataclass, field
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# the reference's tested list (reference: README.md:106-113 benchmark table
# + README.md:135-145 "tested to work with pull_onnx.py & this crate")
TESTED_MODELS: tuple[str, ...] = (
    "timm/ViT-gopt-16-SigLIP2-384",
    "apple/DFN5B-CLIP-ViT-H-14-378",
    "timm/ViT-SO400M-16-SigLIP2-384",
    "timm/MobileCLIP2-S2-OpenCLIP",
    "timm/MobileCLIP2-S3-OpenCLIP",
    "timm/MobileCLIP2-S4-OpenCLIP",
    "timm/ViT-SO400M-14-SigLIP-384",
    "timm/vit_base_patch32_clip_224.openai",
    "Marqo/marqo-fashionSigLIP",
    "laion/CLIP-ViT-B-32-laion2B-s34B-b79K",
    "microsoft/BiomedCLIP-PubMedBERT_256-vit_base_patch16_224",
    "imageomics/bioclip",
    "timm/PE-Core-bigG-14-448",
)

# reference-published ONNX dirs (reference: README.md:106-113) — the
# structural-extraction path's inputs, keyed by the checkpoint repo
ONNX_DIRS: dict[str, str] = {
    "timm/ViT-gopt-16-SigLIP2-384": "RuteNL/ViT-gopt-16-SigLIP2-384-ONNX",
    "apple/DFN5B-CLIP-ViT-H-14-378": "RuteNL/DFN5B-CLIP-ViT-H-14-378-ONNX",
    "timm/ViT-SO400M-16-SigLIP2-384":
        "RuteNL/ViT-SO400M-16-SigLIP2-384-ONNX",
    "timm/MobileCLIP2-S2-OpenCLIP": "RuteNL/MobileCLIP2-S2-OpenCLIP-ONNX",
    "timm/MobileCLIP2-S3-OpenCLIP": "RuteNL/MobileCLIP2-S3-OpenCLIP-ONNX",
    "timm/MobileCLIP2-S4-OpenCLIP": "RuteNL/MobileCLIP2-S4-OpenCLIP-ONNX",
}

CAT_LABELS = ["A photo of a cat", "A photo of a dog", "A photo of a beignet"]
CAT_URL = ("https://raw.githubusercontent.com/RuurdBijlsma/"
           "clip-embedder-rs/main/assets/img/cat_face.jpg")
PARITY_BUDGET = 1e-3  # cosine distance (BASELINE.md)


@dataclass
class Row:
    model: str
    ckpt: str = "-"        # checkpoint-path conversion outcome
    onnx: str = "-"        # ONNX-dir-path conversion outcome
    family: str = "-"      # resolved vision family (native vs executor)
    parity: str = "-"      # max cosine distance between the two paths
    classify: str = "-"    # cat gate outcome
    ok: bool = False
    notes: list[str] = field(default_factory=list)


def _probe_images(seed: int = 0, n: int = 4) -> list[np.ndarray]:
    rng = np.random.default_rng(seed)
    return [rng.integers(0, 255, (384, 384, 3), dtype=np.uint8)
            for _ in range(n)]


PROBE_TEXTS = ["a photo of a cat", "two dogs on a beach",
               "an aerial view of a city at night", "the beignet"]


def parity_cos_distance(clip_a, clip_b, images, texts) -> float:
    """Max cosine distance across both towers between two Clip instances."""
    va = np.asarray(clip_a.vision.embed_images(images))
    vb = np.asarray(clip_b.vision.embed_images(images))
    ta = np.asarray(clip_a.text.embed_texts(texts))
    tb = np.asarray(clip_b.text.embed_texts(texts))
    d_v = float((1 - (va * vb).sum(-1)).max())
    d_t = float((1 - (ta * tb).sum(-1)).max())
    return max(d_v, d_t)


def cat_gate(clip, cat_image) -> tuple[bool, str]:
    """The reference's integration assertion
    (reference: tests/integration_test.rs:23-29)."""
    results = clip.classify(cat_image, CAT_LABELS)
    top_label, top_p = results[0]
    second_p = results[1][1]
    ok = top_label == CAT_LABELS[0] and top_p > 0.99 and second_p < 0.1
    return ok, f"{top_label}@{top_p:.4f}/next@{second_p:.4f}"


def fetch_cat_image(path: Path) -> Path:
    if not path.is_file():
        path.parent.mkdir(parents=True, exist_ok=True)
        with urllib.request.urlopen(CAT_URL, timeout=60) as resp:
            path.write_bytes(resp.read())
    return path


def validate_model(model_id: str, output: Path, cat_image) -> Row:
    import pull_weights
    from clip_embedder_tpu import Clip
    from clip_embedder_tpu.model_manager import get_hf_model

    row = Row(model_id)
    clip_ckpt = clip_onnx = None

    try:
        d = pull_weights.run_pull(model_id, output)
        clip_ckpt = Clip.from_local_dir(d)
        row.ckpt = "ok"
        row.family = clip_ckpt.vision.spec.family
    except Exception as e:  # noqa: BLE001 — per-model isolation, tallied
        row.ckpt = "FAIL"
        row.notes.append(f"ckpt: {type(e).__name__}: {e}")

    onnx_repo = ONNX_DIRS.get(model_id)
    if onnx_repo:
        try:
            od = get_hf_model(onnx_repo)
            pull_weights.convert_onnx_dir(od)
            clip_onnx = Clip.from_local_dir(od)
            row.onnx = "ok"
            if row.family == "-":
                row.family = clip_onnx.vision.spec.family
        except Exception as e:  # noqa: BLE001
            row.onnx = "FAIL"
            row.notes.append(f"onnx: {type(e).__name__}: {e}")

    if clip_ckpt is not None and clip_onnx is not None:
        try:
            d = parity_cos_distance(clip_ckpt, clip_onnx,
                                    _probe_images(), PROBE_TEXTS)
            row.parity = f"{d:.2e}" + ("" if d <= PARITY_BUDGET
                                       else f" > {PARITY_BUDGET}")
        except Exception as e:  # noqa: BLE001
            row.parity = "FAIL"
            row.notes.append(f"parity: {type(e).__name__}: {e}")

    best = clip_ckpt or clip_onnx
    if best is not None and cat_image is not None:
        try:
            ok, detail = cat_gate(best, cat_image)
            row.classify = ("PASS " if ok else "FAIL ") + detail
        except Exception as e:  # noqa: BLE001
            row.classify = "FAIL"
            row.notes.append(f"classify: {type(e).__name__}: {e}")

    row.ok = (
        row.ckpt == "ok"
        and row.onnx in ("-", "ok")
        and row.parity != "FAIL" and ">" not in row.parity
        and (row.classify == "-" or row.classify.startswith("PASS"))
    )
    return row


def write_report(rows: list[Row], path: Path) -> None:
    lines = [
        "# Reference tested-model validation",
        "",
        "One row per model on the reference's tested list "
        "(reference: README.md:106-145). `ckpt` = checkpoint conversion "
        "(pull_weights), `onnx` = published-ONNX-dir conversion "
        "(structural extraction + probe_verify), `parity` = max cosine "
        f"distance between the two paths (budget {PARITY_BUDGET}), "
        "`classify` = the cat gate "
        "(reference: tests/integration_test.rs:23-29).",
        "",
        "| model | ckpt | onnx | vision family | parity | classify | ok |",
        "|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| {r.model} | {r.ckpt} | {r.onnx} | {r.family} | {r.parity} "
            f"| {r.classify} | {'✔' if r.ok else '✘'} |")
    notes = [f"- **{r.model}**: {'; '.join(r.notes)}" for r in rows if r.notes]
    if notes:
        lines += ["", "## Failure notes", ""] + notes
    path.write_text("\n".join(lines) + "\n")


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    parser.add_argument("--output", type=Path, default=None)
    parser.add_argument("--models", type=str, default=None,
                        help="comma-separated HF ids (default: full list)")
    parser.add_argument("--cat-image", type=Path, default=None,
                        help="local cat photo (default: fetch the "
                             "reference's cat_face.jpg)")
    parser.add_argument("--report", type=Path,
                        default=Path("VALIDATION_RESULTS.md"))
    args = parser.parse_args(argv)

    from clip_embedder_tpu.model_manager import get_default_base_folder

    output = args.output or get_default_base_folder()
    ids = [m.strip() for m in args.models.split(",")] if args.models \
        else list(TESTED_MODELS)
    cat = args.cat_image
    if cat is None:
        try:
            cat = fetch_cat_image(output / "_validation" / "cat_face.jpg")
        except Exception as e:  # noqa: BLE001
            print(f"warn: no cat image ({e}); skipping the classify gate")
    rows = []
    for model_id in ids:
        print(f"=== {model_id}", flush=True)
        rows.append(validate_model(model_id, output, cat))
        print(f"    ckpt={rows[-1].ckpt} onnx={rows[-1].onnx} "
              f"parity={rows[-1].parity} classify={rows[-1].classify}",
              flush=True)
    write_report(rows, args.report)
    failed = [r.model for r in rows if not r.ok]
    print(f"\n{len(rows) - len(failed)}/{len(rows)} models validated; "
          f"report: {args.report}")
    if failed:
        print("failed:", ", ".join(failed))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
