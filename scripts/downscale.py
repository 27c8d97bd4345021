"""Batch image downscaler (counterpart of reference scripts/downscale.py).

Usage: python scripts/downscale.py <dir> --scale 2 [--out <dir_2>]
"""

from __future__ import annotations

import argparse
import glob
import os

from PIL import Image


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("path")
    ap.add_argument("--scale", type=int, default=2)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    out = args.out or (args.path.rstrip("/") + f"_{args.scale}")
    os.makedirs(out, exist_ok=True)
    files = sorted(
        sum((glob.glob(os.path.join(args.path, e)) for e in ("*.png", "*.jpg", "*.jpeg")), [])
    )
    for f in files:
        img = Image.open(f)
        img = img.resize((img.width // args.scale, img.height // args.scale), Image.LANCZOS)
        img.save(os.path.join(out, os.path.basename(f)))
    print(f"downscaled {len(files)} images -> {out}")


if __name__ == "__main__":
    main()
