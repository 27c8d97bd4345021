"""NeRF-blender dataset provider (transforms*.json), TPU-native.

Mirrors the contract of the reference `nerf/provider.py:92-353` NeRFDataset:
produces pose/intrinsics/image tensors and per-step ray batches.  Unlike the
torch DataLoader design, batches are sampled *inside jit* from preloaded
device arrays (images live in HBM; pixel gathers and ray generation fuse into
the train step), which removes the host->device copy from the hot loop.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .rays import get_rays, nerf_matrix_to_ngp, perspective_matrix


def _load_image(path: str, downscale: int = 1) -> np.ndarray:
    from PIL import Image

    img = Image.open(path)
    if downscale > 1:
        img = img.resize((img.width // downscale, img.height // downscale), Image.BILINEAR)
    arr = np.asarray(img, dtype=np.float32) / 255.0
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, axis=-1)
    return arr


@dataclass
class FrameData:
    """Host-side dataset state for one split."""

    images: np.ndarray      # [N, H, W, C] float32 (C = 3 or 4)
    poses: np.ndarray       # [N, 4, 4] cam2world, scene-scaled
    intrinsics: np.ndarray  # [4] fx fy cx cy
    H: int
    W: int
    mvps: np.ndarray        # [N, 4, 4] proj @ world2cam, for rasterization
    depths: Optional[np.ndarray] = None  # [N, H, W] metric depth supervision
    # COLMAP sparse-depth supervision, fixed capacity M with weight-0 padding
    # (reference colmap_provider.py:259-310)
    sparse_coords: Optional[np.ndarray] = None  # [N, M, 2] int32 (row, col)
    sparse_depth: Optional[np.ndarray] = None   # [N, M] float32
    sparse_weight: Optional[np.ndarray] = None  # [N, M] float32 (0 = padding)
    cam_near_far: Optional[np.ndarray] = None   # [N, 2] per-view near/far

    @property
    def num_frames(self) -> int:
        return self.poses.shape[0]


def load_blender(
    root: str,
    split: str = "train",
    downscale: int = 1,
    scale: float = 0.8,
    offset=(0, 0, 0),
    bound: float = 1.0,
    with_images: bool = True,
) -> FrameData:
    """Load a transforms_{split}.json (blender) or transforms.json (colmap-style)."""
    tf_path = os.path.join(root, f"transforms_{split}.json")
    if not os.path.exists(tf_path):
        tf_path = os.path.join(root, "transforms.json")
    with open(tf_path) as f:
        meta = json.load(f)

    frames = meta["frames"]
    poses = []
    images: List[np.ndarray] = []
    H = W = None
    for fr in frames:
        pose = nerf_matrix_to_ngp(np.array(fr["transform_matrix"], dtype=np.float32), scale, offset)
        poses.append(pose)
        if with_images:
            fpath = os.path.join(root, fr["file_path"])
            if not os.path.splitext(fpath)[1]:
                fpath += ".png"
            img = _load_image(fpath, downscale)
            H, W = img.shape[:2]
            images.append(img)
    poses_np = np.stack(poses)
    if with_images:
        images_np = np.stack(images)
    else:
        H = int(meta.get("h", 800)) // downscale
        W = int(meta.get("w", 800)) // downscale
        images_np = np.zeros((len(frames), H, W, 3), np.float32)

    if "fl_x" in meta:
        fx = meta["fl_x"] / downscale
        fy = meta.get("fl_y", meta["fl_x"]) / downscale
    else:
        fx = fy = 0.5 * W / np.tan(0.5 * float(meta["camera_angle_x"]))
    cx = meta.get("cx", W / 2.0) / (downscale if "cx" in meta else 1.0)
    cy = meta.get("cy", H / 2.0) / (downscale if "cy" in meta else 1.0)
    if "cx" not in meta:
        cx, cy = W / 2.0, H / 2.0
    intrinsics = np.array([fx, fy, cx, cy], dtype=np.float32)

    mvps = compute_mvps(poses_np, intrinsics, H, W, bound)
    return FrameData(images=images_np, poses=poses_np, intrinsics=intrinsics, H=H, W=W, mvps=mvps)


def compute_mvps(poses: np.ndarray, intrinsics: np.ndarray, H: int, W: int, bound: float) -> np.ndarray:
    """Model-view-projection per frame (reference provider.py:277-288)."""
    fy = intrinsics[1]
    fovy = 2.0 * np.arctan(0.5 * H / fy)
    proj = perspective_matrix(fovy, W / H, near=0.05, far=2.0 * bound + 0.05)
    mvps = []
    for p in poses:
        w2c = np.linalg.inv(p.astype(np.float64)).astype(np.float32)
        mvps.append(proj @ w2c)
    return np.stack(mvps)


class RayDataset:
    """Device-resident ray sampler over a FrameData split.

    `sample(key, num_rays)` is jit-friendly: gathers random pixels across all
    frames (random_image_batch semantics, reference provider.py:304-340) and
    returns rays + ground-truth colors.  Alpha channels composite against
    white or random background per the reference's training scheme.
    """

    def __init__(self, data: FrameData, bound: float, background: str = "white",
                 patch_size: int = 1):
        self.data = data
        self.H, self.W = data.H, data.W
        self.background = background
        self.patch_size = patch_size
        self.images = jnp.asarray(data.images)
        self.poses = jnp.asarray(data.poses)
        self.intrinsics = jnp.asarray(data.intrinsics)
        self.mvps = jnp.asarray(data.mvps)
        self.bound = bound
        # optional per-frame depth supervision (colmap dense/sparse depth,
        # reference colmap_provider.py:272-310)
        depths = getattr(data, "depths", None)
        self.depths = jnp.asarray(depths) if depths is not None else None
        sc = getattr(data, "sparse_coords", None)
        self.sparse_coords = jnp.asarray(sc) if sc is not None else None
        if sc is not None:
            self.sparse_depth = jnp.asarray(data.sparse_depth)
            self.sparse_weight = jnp.asarray(data.sparse_weight)
        cnf = getattr(data, "cam_near_far", None)
        self.cam_near_far = jnp.asarray(cnf) if cnf is not None else None

    def sample(self, key: jax.Array, num_rays: int) -> Dict[str, jnp.ndarray]:
        k_img, k_pix, k_bg = jax.random.split(key, 3)
        n_frames = self.images.shape[0]
        if self.patch_size > 1:
            # patch sampling for perceptual losses (reference utils.py:384-401)
            p = self.patch_size
            n_patch = num_rays // (p * p)
            img_idx = jnp.repeat(
                jax.random.randint(k_img, (n_patch,), 0, n_frames), p * p
            )
            kx, ky = jax.random.split(k_pix)
            px = jax.random.randint(kx, (n_patch,), 0, self.H - p)
            py = jax.random.randint(ky, (n_patch,), 0, self.W - p)
            oi, oj = jnp.meshgrid(jnp.arange(p), jnp.arange(p), indexing="ij")
            pix_idx = (
                (px[:, None] + oi.reshape(-1)[None]) * self.W
                + (py[:, None] + oj.reshape(-1)[None])
            ).reshape(-1)
            num_rays = pix_idx.shape[0]
        else:
            img_idx = jax.random.randint(k_img, (num_rays,), 0, n_frames)
            pix_idx = jax.random.randint(k_pix, (num_rays,), 0, self.H * self.W)

        depth = None
        depth_weight = None
        if self.depths is not None:
            depth = self.depths.reshape(n_frames, -1)[img_idx, pix_idx]
        if self.sparse_coords is not None and self.patch_size <= 1:
            # with prob 0.1 the whole batch becomes sparse-depth rays of ONE
            # frame (reference colmap_provider.py:510-522 collate branch)
            k_sd, k_f, k_m = jax.random.split(k_bg, 3)
            use_sparse = jax.random.uniform(k_sd, ()) < 0.1
            f_id = jax.random.randint(k_f, (), 0, n_frames)
            M = self.sparse_coords.shape[1]
            m = jax.random.randint(k_m, (num_rays,), 0, M)
            rc = self.sparse_coords[f_id, m]                       # [N,2] row,col
            sp_pix = rc[:, 0] * self.W + rc[:, 1]
            sp_depth = self.sparse_depth[f_id, m]
            sp_weight = self.sparse_weight[f_id, m]
            img_idx = jnp.where(use_sparse, jnp.full_like(img_idx, f_id), img_idx)
            pix_idx = jnp.where(use_sparse, sp_pix, pix_idx)
            depth = jnp.where(
                use_sparse, sp_depth, depth if depth is not None else jnp.zeros((num_rays,))
            )
            depth_weight = jnp.where(
                use_sparse, sp_weight,
                jnp.ones((num_rays,)) if self.depths is not None else jnp.zeros((num_rays,)),
            )

        flat = self.images.reshape(n_frames, self.H * self.W, -1)
        rgba = flat[img_idx, pix_idx]  # [N, C]

        if rgba.shape[-1] == 4:
            if self.background == "random":
                bg = jax.random.uniform(k_bg, (num_rays, 3))
            else:
                bg = jnp.ones((num_rays, 3))
            rgb = rgba[:, :3] * rgba[:, 3:4] + bg * (1.0 - rgba[:, 3:4])
            alpha = rgba[:, 3]
        else:
            bg = jnp.ones((num_rays, 3))
            rgb = rgba[:, :3]
            alpha = jnp.ones((num_rays,))

        i = (pix_idx % self.W).astype(jnp.float32) + 0.5
        j = (pix_idx // self.W).astype(jnp.float32) + 0.5
        from .rays import pixel_dirs

        dirs_cam = pixel_dirs(i, j, self.intrinsics)
        R = self.poses[img_idx, :3, :3]
        rays_d = jnp.einsum("nij,nj->ni", R, dirs_cam)
        rays_o = self.poses[img_idx, :3, 3]

        out = {
            "rays_o": rays_o,
            "rays_d": rays_d,
            "pixels": rgb,
            "alpha": alpha,
            "bg_color": bg,
            "index": img_idx,
        }
        if depth is not None:
            out["depth"] = depth
            if depth_weight is not None:
                out["depth_weight"] = depth_weight
        if self.cam_near_far is not None:
            out["cam_near_far"] = self.cam_near_far[img_idx]
        return out

    def frame_rays(self, idx: int, ssaa: int = 1) -> Dict[str, jnp.ndarray]:
        """All rays of one frame, for eval/test rendering.

        ssaa > 1 emits a supersampled ray grid (H*ssaa x W*ssaa) with scaled
        intrinsics (reference renderer.py:936-944 SSAA upsample); callers box-
        downsample the rendered buffers. Ground-truth pixels stay at base res.
        """
        if ssaa > 1:
            intr = self.data.intrinsics * ssaa
            res = get_rays(
                self.poses[idx : idx + 1], intr, self.H * ssaa, self.W * ssaa
            )
        else:
            res = get_rays(self.poses[idx : idx + 1], self.data.intrinsics, self.H, self.W)
        img = self.images[idx]
        rgba = img.reshape(-1, img.shape[-1])
        if rgba.shape[-1] == 4:
            rgb = rgba[:, :3] * rgba[:, 3:4] + (1.0 - rgba[:, 3:4])
            alpha = rgba[:, 3]
        else:
            rgb, alpha = rgba[:, :3], jnp.ones((rgba.shape[0],))
        return {
            "rays_o": res["rays_o"],
            "rays_d": res["rays_d"],
            "pixels": rgb,
            "alpha": alpha,
            "H": self.H,
            "W": self.W,
            "mvp": self.mvps[idx],
            "pose": self.poses[idx],
        }
