"""Monocular depth extraction for dense-depth supervision.

Counterpart of the reference `depth_tools/extract_depth.py` (omnidata DPT).
The omnidata weights/timm stack is not bundled; this tool supports:
  1. any torch depth model via --model_path (a TorchScript module mapping
     [1,3,H,W] -> [1,1,H,W]), or
  2. precomputed per-image .npy depth maps copied into <data>/depths/
     (the colmap provider consumes <name>.npy at training time).

Usage: python depth_tools/extract_depth.py <image_dir> [--model_path m.pt]
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("path")
    ap.add_argument("--model_path", default=None)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    out = args.out or os.path.join(os.path.dirname(args.path.rstrip("/")), "depths")
    os.makedirs(out, exist_ok=True)
    files = sorted(
        sum((glob.glob(os.path.join(args.path, e)) for e in ("*.png", "*.jpg")), [])
    )
    if args.model_path is None:
        raise SystemExit(
            "No depth model given. Provide --model_path <torchscript.pt> "
            "(e.g. an exported omnidata DPT), or place precomputed .npy depth "
            f"maps directly into {out}/."
        )

    import torch
    from PIL import Image

    model = torch.jit.load(args.model_path).eval()
    for f in files:
        img = np.asarray(Image.open(f).convert("RGB"), np.float32) / 255.0
        x = torch.from_numpy(img).permute(2, 0, 1)[None]
        with torch.no_grad():
            d = model(x)[0, 0].numpy()
        np.save(os.path.join(out, os.path.splitext(os.path.basename(f))[0] + ".npy"), d)
        print(f, "->", d.shape)


if __name__ == "__main__":
    main()
