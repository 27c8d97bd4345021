"""Monocular depth extraction for dense-depth supervision.

Counterpart of the reference `depth_tools/extract_depth.py` (omnidata DPT,
reference lines 16-83): resize to 384x384, normalize mean/std 0.5, run the
depth net, bicubic-resize back to the source resolution, save <name>.npy
(the colmap provider consumes <data>/depths/<name>.npy at training time).

The depth net is pluggable:
  1. --ckpt <omnidata_dpt_depth_v2.ckpt>: the omnidata DPT-hybrid depth
     checkpoint, run through the pure-JAX DPT re-implementation
     (depth_tools/dpt_jax.py — no timm needed, torch only deserializes);
  2. --model_path <m.pt>: any TorchScript module mapping the normalized
     [1,3,384,384] input to [1,384,384] (or [1,1,384,384]) depth; or
  3. precomputed per-image .npy depth maps copied into <data>/depths/.

Usage: python depth_tools/extract_depth.py <image_dir> [--ckpt w.ckpt]
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np

IMAGE_SIZE = 384


def run_model(model, img: np.ndarray):
    """img [H,W,3] float in [0,1] -> depth [H,W] float (reference protocol:
    384^2 resize, (x-0.5)/0.5 normalize, bicubic resize back)."""
    import torch
    import torch.nn.functional as F

    H, W = img.shape[:2]
    x = torch.from_numpy(img).permute(2, 0, 1)[None].float()
    x = F.interpolate(x, size=(IMAGE_SIZE, IMAGE_SIZE), mode="bilinear", align_corners=False)
    x = (x - 0.5) / 0.5
    with torch.no_grad():
        d = model(x)
    if d.ndim == 3:
        d = d.unsqueeze(1)  # [1,1,h,w]
    d = F.interpolate(d, size=(H, W), mode="bicubic", align_corners=False)
    return d.squeeze().cpu().numpy()


class JaxDPT:
    """Callable wrapping dpt_jax with the TorchScript-module interface
    ([1,3,384,384] torch tensor in, [1,384,384] torch tensor out)."""

    def __init__(self, ckpt_path: str):
        import sys

        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        import dpt_jax

        self._fwd = dpt_jax.dpt_depth
        self._params = dpt_jax.load_dpt(ckpt_path)

    def __call__(self, x):
        import jax
        import torch

        xin = x.permute(0, 2, 3, 1).cpu().numpy()
        d = jax.jit(self._fwd)(self._params, xin)
        return torch.from_numpy(np.asarray(d))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("path")
    ap.add_argument("--ckpt", default=None,
                    help="omnidata DPT-hybrid depth checkpoint (JAX path)")
    ap.add_argument("--model_path", default=None)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    out = args.out or os.path.join(os.path.dirname(args.path.rstrip("/")), "depths")
    os.makedirs(out, exist_ok=True)
    files = sorted(
        sum((glob.glob(os.path.join(args.path, e)) for e in ("*.png", "*.jpg")), [])
    )
    if args.model_path is None and args.ckpt is None:
        raise SystemExit(
            "No depth model given. Provide --ckpt <omnidata.ckpt> (pure-JAX "
            "DPT), --model_path <torchscript.pt>, or place precomputed .npy "
            f"depth maps directly into {out}/."
        )

    import torch
    from PIL import Image

    if args.ckpt is not None:
        model = JaxDPT(args.ckpt)
    else:
        model = torch.jit.load(args.model_path).eval()
    for f in files:
        img = np.asarray(Image.open(f).convert("RGB"), np.float32) / 255.0
        d = run_model(model, img)
        np.save(os.path.join(out, os.path.splitext(os.path.basename(f))[0] + ".npy"), d)
        print(f, "->", d.shape)


if __name__ == "__main__":
    main()
