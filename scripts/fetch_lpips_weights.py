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
    import torch

    try:
        import lpips as lpips_pkg
    except ImportError:
        raise SystemExit("pip install lpips torchvision  (needs internet)")

    model = lpips_pkg.LPIPS(net="vgg")  # downloads VGG16 + lin weights
    model.eval()

    out = {}
    conv_i = 0
    for layer in model.net.slice1 + model.net.slice2 + model.net.slice3 \
            + model.net.slice4 + model.net.slice5:
        if isinstance(layer, torch.nn.Conv2d):
            w = layer.weight.detach().numpy()          # [O,I,kh,kw]
            out[f"conv{conv_i}_w"] = np.transpose(w, (2, 3, 1, 0)).astype(np.float32)
            out[f"conv{conv_i}_b"] = layer.bias.detach().numpy().astype(np.float32)
            conv_i += 1
    assert conv_i == 13, f"expected 13 VGG16 convs, got {conv_i}"

    for j, lin in enumerate(model.lins):
        w = lin.model[-1].weight.detach().numpy()      # [1,C,1,1]
        out[f"lin{j}_w"] = w.reshape(-1).astype(np.float32)
    assert j == 4

    np.savez(args.out, **out)
    print(f"wrote {args.out}: {sorted(out)[:4]}... ({len(out)} arrays)")


if __name__ == "__main__":
    main()
