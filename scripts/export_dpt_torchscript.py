"""One-time omnidata DPT -> TorchScript export for depth_tools/extract_depth.py.

This environment has no network egress and no timm, so the omnidata DPT
cannot run here directly; run this ON A MACHINE WITH INTERNET once:

    pip install torch timm==0.4.12
    bash <reference>/depth_tools/download_models.sh     # omnidata ckpt
    python scripts/export_dpt_torchscript.py \
        --ckpt omnidata_dpt_depth_v2.ckpt --out dpt_depth.pt

then extract depth anywhere (only torch-cpu needed):

    python depth_tools/extract_depth.py <image_dir> --model_path dpt_depth.pt

The exported module maps a normalized [1,3,384,384] tensor to [1,384,384]
depth — the contract extract_depth.run_model drives (reference
depth_tools/extract_depth.py:52-79).
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--out", default="dpt_depth.pt")
    ap.add_argument("--backbone", default="vitb_rn50_384")
    args = ap.parse_args()

    import torch

    try:
        # the reference's own model definition (DPT-Hybrid)
        import sys, os
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "depth_tools"))
        from dpt import DPTDepthModel  # type: ignore
    except ImportError:
        raise SystemExit(
            "DPTDepthModel not importable — run next to the reference's "
            "depth_tools/dpt.py (pip install timm==0.4.12)"
        )

    model = DPTDepthModel(backbone=args.backbone)
    ckpt = torch.load(args.ckpt, map_location="cpu")
    state = ckpt.get("state_dict", ckpt)
    state = {k[6:] if k.startswith("model.") else k: v for k, v in state.items()}
    model.load_state_dict(state)
    model.eval()

    example = torch.zeros(1, 3, 384, 384)
    ts = torch.jit.trace(model, example)
    ts.save(args.out)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
