"""Procedural test scene: an analytically ray-traced lambertian sphere.

Serves as the framework's built-in fixture (the reference has no test suite,
SURVEY.md §4) — small enough to train stage 0 in seconds, with exact ground
truth for geometry (SDF of the sphere) so mesh extraction can be validated too.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from .provider import FrameData, compute_mvps


def orbit_pose(theta: float, phi: float, radius: float) -> np.ndarray:
    """cam2world look-at pose orbiting the origin (OpenGL convention: -z forward)."""
    center = np.array(
        [
            radius * np.sin(theta) * np.sin(phi),
            radius * np.cos(theta),
            radius * np.sin(theta) * np.cos(phi),
        ],
        dtype=np.float32,
    )
    forward = -center / np.linalg.norm(center)
    up = np.array([0, 1, 0], dtype=np.float32)
    right = np.cross(forward, up)
    right /= np.linalg.norm(right) + 1e-9
    up = np.cross(right, forward)
    pose = np.eye(4, dtype=np.float32)
    # columns: x=right, y=up, z=-forward (camera looks down -z)
    pose[:3, 0] = right
    pose[:3, 1] = up
    pose[:3, 2] = -forward
    pose[:3, 3] = center
    return pose


def render_sphere_image(
    pose: np.ndarray,
    intrinsics: np.ndarray,
    H: int,
    W: int,
    sphere_center=(0.0, 0.0, 0.0),
    sphere_radius: float = 0.5,
    albedo=(0.8, 0.3, 0.2),
    light_dir=(0.5, 0.8, 0.3),
) -> np.ndarray:
    """Analytic lambertian sphere on white background -> [H, W, 4] RGBA."""
    fx, fy, cx, cy = intrinsics
    jj, ii = np.meshgrid(np.arange(H) + 0.5, np.arange(W) + 0.5, indexing="ij")
    xs = (ii - cx) / fx
    ys = -(jj - cy) / fy
    zs = -np.ones_like(xs)
    dirs = np.stack([xs, ys, zs], axis=-1) @ pose[:3, :3].T
    dirs = dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)
    o = pose[:3, 3]

    c = np.asarray(sphere_center, dtype=np.float32)
    oc = o - c
    b = np.sum(dirs * oc, axis=-1)
    cc = np.sum(oc * oc) - sphere_radius ** 2
    disc = b * b - cc
    hit = disc > 0
    t = -b - np.sqrt(np.maximum(disc, 0.0))
    hit &= t > 0

    p = o + dirs * t[..., None]
    n = (p - c) / sphere_radius
    l = np.asarray(light_dir, dtype=np.float32)
    l = l / np.linalg.norm(l)
    lambert = np.clip(np.sum(n * l, axis=-1), 0.0, 1.0) * 0.8 + 0.2

    img = np.ones((H, W, 4), dtype=np.float32)
    rgb = np.asarray(albedo, dtype=np.float32)[None, None, :] * lambert[..., None]
    img[..., :3] = np.where(hit[..., None], rgb, 1.0)
    img[..., 3] = hit.astype(np.float32)
    return img


def make_synthetic_dataset(
    n_frames: int = 16,
    H: int = 64,
    W: int = 64,
    radius: float = 2.0,
    bound: float = 1.0,
    seed: int = 0,
) -> FrameData:
    rng = np.random.RandomState(seed)
    fx = fy = 0.8 * W
    intrinsics = np.array([fx, fy, W / 2.0, H / 2.0], dtype=np.float32)

    poses, images = [], []
    for k in range(n_frames):
        theta = np.pi / 3 + (np.pi / 3) * (k % 4) / 4 + rng.uniform(-0.05, 0.05)
        phi = 2 * np.pi * k / n_frames + rng.uniform(-0.05, 0.05)
        pose = orbit_pose(theta, phi, radius)
        poses.append(pose)
        images.append(render_sphere_image(pose, intrinsics, H, W))
    poses_np = np.stack(poses)
    images_np = np.stack(images)
    mvps = compute_mvps(poses_np, intrinsics, H, W, bound)
    return FrameData(images=images_np, poses=poses_np, intrinsics=intrinsics, H=H, W=W, mvps=mvps)
