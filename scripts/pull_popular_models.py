"""Batch-convert the popular open_clip models to native model dirs.

Analog of the reference's ``scripts/pull_popular_models.ps1``: iterate the
model list, run the exporter per id (here ``pull_weights.py``), tally
failures at the end. The ids are the reference's tested-model list
(reference: scripts/pull_popular_models.ps1, README.md:135-145); uncomment
what you want to pull — each model downloads its checkpoint from HF.

    python scripts/pull_popular_models.py [--output DIR]
"""

from __future__ import annotations

import argparse
import subprocess
import sys
from pathlib import Path

MODELS = [
    # the reference's six benchmark models
    "timm/ViT-SO400M-16-SigLIP2-384",
    "timm/ViT-gopt-16-SigLIP2-384",
    "apple/DFN5B-CLIP-ViT-H-14-378",
    "timm/MobileCLIP2-S2-OpenCLIP",
    "timm/MobileCLIP2-S3-OpenCLIP",
    "timm/MobileCLIP2-S4-OpenCLIP",
    # the rest of its tested list (uncomment to pull)
    # "microsoft/BiomedCLIP-PubMedBERT_256-vit_base_patch16_224",
    # "laion/CLIP-ViT-B-32-laion2B-s34B-b79K",
    # "timm/vit_base_patch32_clip_224.openai",
    # "timm/ViT-SO400M-14-SigLIP-384",
    # "Marqo/marqo-fashionSigLIP",
    # "imageomics/bioclip",
    # "timm/PE-Core-bigG-14-448",
]


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--output", type=Path, default=None,
                        help="base output dir (pull_weights default cache)")
    parser.add_argument("--models", type=str, default=None,
                        help="comma-separated HF ids (overrides the list)")
    args = parser.parse_args()

    ids = args.models.split(",") if args.models else MODELS
    pull = Path(__file__).resolve().parent.parent / "pull_weights.py"
    failed: list[str] = []
    for model in ids:
        model = model.strip()
        print(f"Processing: {model}", flush=True)
        cmd = [sys.executable, str(pull), "--id", model]
        if args.output:
            cmd += ["--output", str(args.output)]
        if subprocess.run(cmd).returncode != 0:
            failed.append(model)
            print(f"FAILED: {model}", file=sys.stderr, flush=True)

    if failed:
        print("\nSummary of failures:", file=sys.stderr)
        for model in failed:
            print(f" - {model}", file=sys.stderr)
        return 1
    print("\nAll models processed successfully!")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
