"""Camera ray generation (parity with reference nerf/utils.py:349-423 get_rays).

OpenGL-style convention: pixel (i, j) at (col+0.5, row+0.5), camera looks down
-z, y flipped.  Directions are NOT normalized (matches reference so depth is
z-depth along the lattice, not euclidean).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def pixel_dirs(i: jnp.ndarray, j: jnp.ndarray, intrinsics) -> jnp.ndarray:
    """i: pixel column + 0.5, j: pixel row + 0.5 -> camera-space dirs [N,3]."""
    fx, fy, cx, cy = intrinsics[0], intrinsics[1], intrinsics[2], intrinsics[3]
    xs = (i - cx) / fx
    ys = -(j - cy) / fy
    zs = -jnp.ones_like(i)
    return jnp.stack([xs, ys, zs], axis=-1)


def get_rays(
    poses: jnp.ndarray,       # [B, 4, 4] cam2world (B == N or 1)
    intrinsics,               # [4] fx, fy, cx, cy
    H: int,
    W: int,
    N: int = -1,
    key: Optional[jax.Array] = None,
    patch_size: int = 1,
    coords: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """Sample N pixels (random / patch / explicit coords / all) and emit rays."""
    results: Dict[str, jnp.ndarray] = {}

    if N > 0:
        if coords is not None:
            inds = coords[:, 0] * W + coords[:, 1]
        elif patch_size > 1:
            num_patch = N // (patch_size ** 2)
            k1, k2 = jax.random.split(key)
            ix = jax.random.randint(k1, (num_patch,), 0, H - patch_size)
            iy = jax.random.randint(k2, (num_patch,), 0, W - patch_size)
            base = jnp.stack([ix, iy], axis=-1)  # [np, 2]
            pi, pj = jnp.meshgrid(jnp.arange(patch_size), jnp.arange(patch_size), indexing="ij")
            offs = jnp.stack([pi.reshape(-1), pj.reshape(-1)], axis=-1)
            inds2 = (base[:, None, :] + offs[None, :, :]).reshape(-1, 2)
            inds = inds2[:, 0] * W + inds2[:, 1]
        else:
            inds = jax.random.randint(key, (N,), 0, H * W)
        i = (inds % W).astype(jnp.float32) + 0.5
        j = (inds // W).astype(jnp.float32) + 0.5
        results["inds"] = inds
    else:
        inds = jnp.arange(H * W)
        i = (inds % W).astype(jnp.float32) + 0.5
        j = (inds // W).astype(jnp.float32) + 0.5

    directions = pixel_dirs(i, j, intrinsics)  # [N,3] camera space
    n = directions.shape[0]
    R = jnp.broadcast_to(poses[:, :3, :3], (n, 3, 3))
    rays_d = jnp.einsum("nij,nj->ni", R, directions)
    rays_o = jnp.broadcast_to(poses[:, :3, 3], rays_d.shape)

    results["rays_o"] = rays_o
    results["rays_d"] = rays_d
    results["i"] = i
    results["j"] = j
    return results


def nerf_matrix_to_ngp(pose: np.ndarray, scale: float = 0.33, offset=(0, 0, 0)) -> np.ndarray:
    """Scale/offset camera centers into the scene box (reference provider.py:18)."""
    pose = np.array(pose, dtype=np.float32)
    pose[:3, 3] = pose[:3, 3] * scale + np.asarray(offset, dtype=np.float32)
    return pose


def perspective_matrix(fovy_rad: float, aspect: float, near: float, far: float) -> np.ndarray:
    """OpenGL projection matrix (reference provider.py:277-288 mvp path)."""
    y = np.tan(fovy_rad / 2.0)
    return np.array(
        [
            [1.0 / (y * aspect), 0, 0, 0],
            [0, -1.0 / y, 0, 0],
            [0, 0, -(far + near) / (far - near), -(2 * far * near) / (far - near)],
            [0, 0, -1, 0],
        ],
        dtype=np.float32,
    )


def create_dodecahedron_cameras(radius: float = 2.5, center=(0, 0, 0)) -> np.ndarray:
    """20 cam2world poses at dodecahedron vertices looking at the center
    (reference nerf/utils.py create_dodecahedron_cameras, used for test
    trajectories when a dataset has no test split)."""
    phi = (1 + np.sqrt(5)) / 2
    verts = []
    for s1 in (-1, 1):
        for s2 in (-1, 1):
            for s3 in (-1, 1):
                verts.append([s1, s2, s3])
    for s1 in (-1, 1):
        for s2 in (-1, 1):
            verts.append([0, s1 / phi, s2 * phi])
            verts.append([s1 / phi, s2 * phi, 0])
            verts.append([s1 * phi, 0, s2 / phi])
    verts = np.unique(np.array(verts, np.float32), axis=0)
    verts = verts / np.linalg.norm(verts, axis=1, keepdims=True) * radius
    verts = verts + np.asarray(center, np.float32)

    poses = []
    for v in verts:
        forward = -(v - np.asarray(center, np.float32))
        forward = forward / (np.linalg.norm(forward) + 1e-9)
        up = np.array([0, 1, 0], np.float32)
        if abs(np.dot(forward, up)) > 0.99:
            up = np.array([1, 0, 0], np.float32)
        right = np.cross(forward, up)
        right /= np.linalg.norm(right) + 1e-9
        up = np.cross(right, forward)
        pose = np.eye(4, dtype=np.float32)
        pose[:3, 0] = right
        pose[:3, 1] = up
        pose[:3, 2] = -forward
        pose[:3, 3] = v
        poses.append(pose)
    return np.stack(poses)
