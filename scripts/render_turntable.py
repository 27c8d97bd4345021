"""Offline orbit-camera turntable renderer — the headless analog of the
reference's dearpygui viewer (`nerf/gui.py`, disabled upstream too).

Renders N frames orbiting the scene from a trained workspace and writes
PNGs (+ an MP4 when imageio-ffmpeg is available).

Usage:
    python scripts/render_turntable.py <data_path> --workspace ws --stage 0 \
        [--frames 60 --radius 2.0 --H 400 --W 400]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import main as cli
    from mirres_restir_nerf_mesh_tpu.data.provider import FrameData, compute_mvps, RayDataset
    from mirres_restir_nerf_mesh_tpu.data.synthetic import orbit_pose
    from mirres_restir_nerf_mesh_tpu.train.trainer import Trainer
    from mirres_restir_nerf_mesh_tpu.utils.image_io import save_png

    ap = argparse.ArgumentParser()
    ap.add_argument("path")
    ap.add_argument("--workspace", required=True)
    ap.add_argument("--stage", type=int, default=0)
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--radius", type=float, default=2.0)
    ap.add_argument("--elevation", type=float, default=60.0, help="theta in degrees")
    ap.add_argument("--H", type=int, default=400)
    ap.add_argument("--W", type=int, default=400)
    ap.add_argument("--fovy", type=float, default=50.0)
    ap.add_argument("--extra", nargs=argparse.REMAINDER, default=[],
                    help="extra CLI flags forwarded to the trainer config")
    args = ap.parse_args()

    cfg = cli.config_from_args(
        [args.path, "--workspace", args.workspace, "--stage", str(args.stage), "--test"]
        + list(args.extra)
    )

    H, W = args.H, args.W
    fy = 0.5 * H / np.tan(0.5 * np.radians(args.fovy))
    intrinsics = np.array([fy, fy, W / 2, H / 2], np.float32)
    poses = np.stack(
        [
            orbit_pose(np.radians(args.elevation), 2 * np.pi * k / args.frames, args.radius)
            for k in range(args.frames)
        ]
    )
    data = FrameData(
        images=np.ones((args.frames, H, W, 3), np.float32),
        poses=poses, intrinsics=intrinsics, H=H, W=W,
        mvps=compute_mvps(poses, intrinsics, H, W, cfg.bound),
    )

    trainer = Trainer("ngp", cfg, data, workspace=args.workspace)
    sampler = RayDataset(data, bound=cfg.bound)
    out_dir = os.path.join(args.workspace, "turntable")
    os.makedirs(out_dir, exist_ok=True)
    frames = []
    for i in range(args.frames):
        img, _ = trainer._render_eval_frame(sampler, i)
        save_png(os.path.join(out_dir, f"frame_{i:04d}.png"), img)
        frames.append((img * 255).astype(np.uint8))
        print(f"frame {i+1}/{args.frames}")

    try:
        import imageio

        imageio.mimwrite(os.path.join(out_dir, "turntable.mp4"), frames, fps=24)
        print(f"wrote {out_dir}/turntable.mp4")
    except Exception as e:
        print(f"[warn] mp4 skipped: {e}")


if __name__ == "__main__":
    main()
