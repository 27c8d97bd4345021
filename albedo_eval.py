"""Albedo evaluation: scale-corrected PSNR/SSIM(/LPIPS) against ground truth.

Re-implements the reference `albedo_eval.py`: inverse rendering recovers
albedo up to a global per-channel scale, so the predicted albedo is rescaled
by the median GT/pred ratio over masked pixels before computing metrics
(reference albedo_eval.py:115-119), matching the TensoIR evaluation protocol.

Usage:
    python albedo_eval.py --pred_dir ws/results --gt_dir <tensoir_gt> [--mask_dir ...]

Expects pairs of images (pred kd vs gt albedo); accepts .png/.hdr/.exr/.npy.
"""

from __future__ import annotations

import argparse
import glob
import json
import os

import numpy as np


def load_any(path: str) -> np.ndarray:
    if path.endswith(".npy"):
        return np.load(path).astype(np.float32)
    if path.endswith((".hdr", ".exr")):
        from mirres_restir_nerf_mesh_tpu.utils.image_io import load_hdr

        return load_hdr(path)
    from PIL import Image

    return np.asarray(Image.open(path), np.float32) / 255.0


def albedo_scale(pred: np.ndarray, gt: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """Median per-channel GT/pred ratio over masked pixels
    (reference albedo_eval.py:115-119)."""
    scale = np.ones(3, np.float32)
    for c in range(3):
        p = pred[..., c][mask]
        g = gt[..., c][mask]
        ok = p > 1e-4
        if ok.any():
            scale[c] = np.median(g[ok] / p[ok])
    return scale


def evaluate_pair(pred: np.ndarray, gt: np.ndarray, mask: np.ndarray):
    import jax.numpy as jnp

    from mirres_restir_nerf_mesh_tpu.train.metrics import psnr, ssim, lpips_fn

    scale = albedo_scale(pred, gt, mask)
    pred_s = np.clip(pred * scale, 0, 1)
    gt = np.clip(gt, 0, 1)
    pred_s = np.where(mask[..., None], pred_s, 0.0)
    gt_m = np.where(mask[..., None], gt, 0.0)

    out = {
        "psnr": float(psnr(jnp.asarray(pred_s), jnp.asarray(gt_m))),
        "ssim": float(ssim(jnp.asarray(pred_s), jnp.asarray(gt_m))),
        "scale": scale.tolist(),
    }
    lp = lpips_fn()
    if lp is not None:
        out["lpips"] = lp(pred_s, gt_m)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pred_dir", required=True)
    ap.add_argument("--gt_dir", required=True)
    ap.add_argument("--mask_dir", default=None)
    ap.add_argument("--pred_glob", default="*kd*")
    ap.add_argument("--gt_glob", default="*albedo*")
    ap.add_argument("--out", default=None, help="also write the aggregate JSON here")
    args = ap.parse_args()

    preds = sorted(
        glob.glob(os.path.join(args.pred_dir, args.pred_glob + ".*"))
        + glob.glob(os.path.join(args.pred_dir, args.pred_glob))
    )
    gts = sorted(
        glob.glob(os.path.join(args.gt_dir, args.gt_glob + ".*"))
        + glob.glob(os.path.join(args.gt_dir, args.gt_glob))
    )
    assert preds and len(preds) == len(gts), f"{len(preds)} preds vs {len(gts)} gts"

    results = []
    for p, g in zip(preds, gts):
        pred = load_any(p)[..., :3]
        gt_img = load_any(g)
        if gt_img.shape[-1] == 4:
            mask = gt_img[..., 3] > 0.5
            gt_img = gt_img[..., :3]
        else:
            mask = np.ones(gt_img.shape[:2], bool)
        if args.mask_dir:
            m = load_any(sorted(glob.glob(os.path.join(args.mask_dir, "*")))[len(results)])
            mask = (m if m.ndim == 2 else m[..., 0]) > 0.5
        results.append(evaluate_pair(pred, gt_img, mask))
        print(os.path.basename(p), results[-1])

    agg = {
        k: float(np.mean([r[k] for r in results]))
        for k in ("psnr", "ssim")
    }
    if "lpips" in results[0]:
        agg["lpips"] = float(np.mean([r["lpips"] for r in results]))
    print(json.dumps({"albedo_eval": agg}))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(agg, f)


if __name__ == "__main__":
    main()
