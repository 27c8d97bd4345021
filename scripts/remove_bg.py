"""Background removal for captured datasets (counterpart of reference
scripts/remove_bg.py, which uses rembg).  rembg is not available in this
image; this script uses it when installed and otherwise falls back to a
simple color-threshold matte against the border color.
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np
from PIL import Image


def simple_matte(img: np.ndarray, thresh: float = 0.12) -> np.ndarray:
    """Alpha from distance to the median border color (uniform backdrops)."""
    border = np.concatenate([img[0], img[-1], img[:, 0], img[:, -1]])
    bg = np.median(border, axis=0)
    d = np.linalg.norm(img - bg, axis=-1)
    return (d > thresh).astype(np.float32)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("path")
    args = ap.parse_args()

    try:
        import rembg  # type: ignore

        use_rembg = True
    except Exception:
        use_rembg = False
        print("[warn] rembg unavailable, using color-threshold matte")

    files = sorted(
        sum((glob.glob(os.path.join(args.path, e)) for e in ("*.png", "*.jpg")), [])
    )
    for f in files:
        img = Image.open(f).convert("RGB")
        if use_rembg:
            out = rembg.remove(img)
        else:
            arr = np.asarray(img, np.float32) / 255.0
            alpha = simple_matte(arr)
            rgba = np.concatenate([arr, alpha[..., None]], axis=-1)
            out = Image.fromarray((rgba * 255).astype(np.uint8))
        out.save(os.path.splitext(f)[0] + "_rgba.png")
    print(f"processed {len(files)} images")


if __name__ == "__main__":
    main()
