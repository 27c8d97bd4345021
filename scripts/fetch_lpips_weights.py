"""One-time LPIPS(VGG) weight export -> the .npz layout train/lpips.py loads.

This environment has no network egress, so the official weights cannot be
vendored into the repo; run this script ON A MACHINE WITH INTERNET once and
point `--lpips_weights` at the resulting file:

    pip install torch torchvision lpips
    python scripts/fetch_lpips_weights.py --out lpips_vgg.npz
    python main.py ... --lpips_weights lpips_vgg.npz

Layout (consumed by mirres_restir_nerf_mesh_tpu/train/lpips.py:load_weights):
    conv{i}_w : [3,3,Cin,Cout] float32 (HWIO; torch OIHW is transposed here)
    conv{i}_b : [Cout] float32
    lin{j}_w  : [C_tap] float32 — the LPIPS 1x1 "lin" weights, non-negative

i runs over the 13 VGG16 conv layers in order; j over the 5 taps
(relu1_2, relu2_2, relu3_3, relu4_3, relu5_3) — matching the reference's
`lpips.LPIPS(net='vgg')` (reference nerf/utils.py:600-708).
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="lpips_vgg.npz")
    args = ap.parse_args()

    import numpy as np

    try:
        import lpips as lpips_pkg
        import torchvision
    except ImportError:
        raise SystemExit("pip install lpips torchvision  (needs internet)")

    vgg_sd = {
        k: v.detach().numpy()
        for k, v in torchvision.models.vgg16(pretrained=True)
        .features.state_dict().items()
    }
    model = lpips_pkg.LPIPS(net="vgg")  # downloads the lin weights
    model.eval()
    lin_sd = {
        f"lin{j}.model.1.weight": lin.model[-1].weight.detach().numpy()
        for j, lin in enumerate(model.lins)
    }

    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from mirres_restir_nerf_mesh_tpu.train.lpips import convert_state_dicts

    out = convert_state_dicts(vgg_sd, lin_sd)
    np.savez(args.out, **out)
    print(f"wrote {args.out}: {sorted(out)[:4]}... ({len(out)} arrays)")


if __name__ == "__main__":
    main()
