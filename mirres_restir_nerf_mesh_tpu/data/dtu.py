"""DTU dataset provider (cameras.npz projection-matrix decomposition).

Re-implements the reference `nerf/dtu_provider.py`: reads cameras_sphere.npz
(world_mat_i @ scale_mat_i projection matrices), decomposes P = K[R|t] via
RQ, normalizes poses into the scene box, loads images + masks, and produces
the common FrameData contract.
"""

from __future__ import annotations

import os
from glob import glob
from typing import Tuple

import numpy as np

from .provider import FrameData, _load_image, compute_mvps


def decompose_projection(P: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """P [3,4] -> (K [3,3] with K[2,2]=1, c2w [4,4] OpenGL convention)."""
    # RQ decomposition of the left 3x3 via flipped QR
    M = P[:3, :3]
    rev = np.flipud(np.eye(3))
    q, r = np.linalg.qr((rev @ M).T)
    K = rev @ r.T @ rev
    R = rev @ q.T
    # enforce positive diagonal of K
    signs = np.sign(np.diag(K))
    signs[signs == 0] = 1
    K = K @ np.diag(signs)
    R = np.diag(signs) @ R
    if np.linalg.det(R) < 0:
        R = -R
        K = -K
    K = K / K[2, 2]
    t = np.linalg.inv(K) @ P[:3, 3]
    w2c = np.eye(4)
    w2c[:3, :3] = R
    w2c[:3, 3] = t
    c2w = np.linalg.inv(w2c)
    # OpenCV -> OpenGL
    c2w[:3, 1:3] *= -1
    return K.astype(np.float32), c2w.astype(np.float32)


def load_dtu(
    root: str,
    split: str = "train",
    downscale: int = 1,
    bound: float = 1.0,
    test_every: int = 8,
    with_images: bool = True,
) -> FrameData:
    cam_file = os.path.join(root, "cameras_sphere.npz")
    if not os.path.exists(cam_file):
        cam_file = os.path.join(root, "cameras.npz")
    cams = np.load(cam_file)

    img_paths = sorted(
        glob(os.path.join(root, "image", "*.png")) + glob(os.path.join(root, "image", "*.jpg"))
    )
    mask_paths = sorted(
        glob(os.path.join(root, "mask", "*.png")) + glob(os.path.join(root, "mask", "*.jpg"))
    )
    n = len(img_paths)

    poses, Ks = [], []
    for i in range(n):
        world_mat = cams[f"world_mat_{i}"]
        scale_mat = cams.get(f"scale_mat_{i}", np.eye(4))
        P = (world_mat @ scale_mat)[:3, :4]
        K, c2w = decompose_projection(P)
        poses.append(c2w)
        Ks.append(K)
    poses = np.stack(poses)
    K = Ks[0]

    idx = list(range(n))
    if split == "train":
        idx = [i for i in idx if i % test_every != 0]
    elif split in ("val", "test"):
        idx = [i for i in idx if i % test_every == 0]

    poses = poses[idx]

    if with_images and img_paths:
        imgs = []
        for i in idx:
            img = _load_image(img_paths[i], downscale)
            if mask_paths:
                m = _load_image(mask_paths[i], downscale)
                if m.ndim == 3:
                    m = m[..., 0]
                img = np.concatenate([img[..., :3], m[..., None]], axis=-1)
            imgs.append(img)
        images = np.stack(imgs)
        H, W = images.shape[1:3]
    else:
        H = W = 512 // downscale
        images = np.zeros((len(idx), H, W, 3), np.float32)

    intrinsics = np.array(
        [K[0, 0] / downscale, K[1, 1] / downscale, K[0, 2] / downscale, K[1, 2] / downscale],
        np.float32,
    )
    mvps = compute_mvps(poses, intrinsics, H, W, bound)
    return FrameData(images=images, poses=poses, intrinsics=intrinsics, H=H, W=W, mvps=mvps)
