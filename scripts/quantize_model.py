#!/usr/bin/env python3
"""Rewrite a training checkpoint as a quantized serving checkpoint.

Beyond-reference CLI (the reference serves full-precision ``.pt`` only):
weight-only bf16 / int8 compression with the same checkpoint dict keys, so
``Predictor`` / ``serve.py`` / ``evaluate.py`` load the result unchanged
(they detect the ``"quantization"`` marker and dequantize in-program).

    python scripts/quantize_model.py -m models/best_model.pt --mode int8
    python scripts/serve.py -m models/best_model.int8.pt
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main():
    parser = argparse.ArgumentParser(
        description="Quantize a checkpoint for serving")
    parser.add_argument("--model-path", "-m", default="models/best_model.pt")
    parser.add_argument("--output", "-o", default=None,
                        help="Destination (default: <model>.<mode>.pt)")
    parser.add_argument("--mode", choices=("bf16", "int8"), default="int8")
    args = parser.parse_args()

    from nbody_gnn_hpc_tpu.predict import quantize_checkpoint

    src = Path(args.model_path)
    dst = Path(args.output) if args.output else src.with_suffix(
        f".{args.mode}.pt")
    info = quantize_checkpoint(str(src), str(dst), args.mode)
    print(f"{src} ({info['src_bytes'] / 1e6:.1f} MB) -> "
          f"{dst} ({info['dst_bytes'] / 1e6:.1f} MB), "
          f"{info['ratio']}x smaller [{info['mode']}]")


if __name__ == "__main__":
    main()
