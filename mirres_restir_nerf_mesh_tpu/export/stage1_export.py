"""Stage-1 textured-mesh export: UV atlas + material texture bake + OBJ/MTL.

Re-implements reference `NeRFRenderer.export_stage1` (`nerf/renderer.py:319-494`):
the reference unwraps with xatlas, rasterizes UV space with nvdiffrast,
samples the material MLP per texel and inpaints margins.  Here a grid-packed
per-triangle atlas replaces xatlas (host-side, deterministic), texel world
positions come from barycentric interpolation, and margins are dilated.
feat0 = kd (sRGB-quantized like the reference), feat1 = (occ, roughness,
metallic).
"""

from __future__ import annotations

import os
from typing import Callable, Tuple

import jax.numpy as jnp
import numpy as np

from ..utils.math import linear_to_srgb
from .meshio import write_obj


def grid_atlas(n_tris: int, texture_size: int) -> Tuple[np.ndarray, np.ndarray, int]:
    """Pack each triangle into half of a square cell of a regular grid.

    Returns (uvs [2*n_tris*3? -> (T,3,2)], uv_tris [T,3], cells_per_side).
    Each cell holds two triangles (lower-left and upper-right halves) with a
    1-texel inset to avoid bleeding.
    """
    cells = int(np.ceil(np.sqrt(n_tris / 2.0)))
    cell_px = texture_size / cells
    inset = 1.0 / cell_px * 0.5

    uvs = np.zeros((n_tris, 3, 2), np.float32)
    for i in range(n_tris):
        cell = i // 2
        lower = i % 2 == 0
        cx = (cell % cells) / cells
        cy = (cell // cells) / cells
        s = 1.0 / cells
        if lower:
            corners = np.array(
                [[cx + inset * s, cy + inset * s],
                 [cx + s * (1 - 2 * inset), cy + inset * s],
                 [cx + inset * s, cy + s * (1 - 2 * inset)]]
            )
        else:
            corners = np.array(
                [[cx + s * (1 - inset), cy + s * (1 - inset)],
                 [cx + 2 * inset * s, cy + s * (1 - inset)],
                 [cx + s * (1 - inset), cy + 2 * inset * s]]
            )
        uvs[i] = corners
    uv_flat = uvs.reshape(-1, 2)
    uv_tris = np.arange(n_tris * 3, dtype=np.int32).reshape(-1, 3)
    return uv_flat, uv_tris, cells


def bake_textures(
    verts: np.ndarray,
    tris: np.ndarray,
    uv_flat: np.ndarray,
    material_fn: Callable[[jnp.ndarray], jnp.ndarray],
    texture_size: int,
    chunk: int = 262144,
) -> Tuple[np.ndarray, np.ndarray]:
    """Rasterize the atlas on the host (each triangle covers an axis-aligned
    half-cell, so texel membership is analytic), query the material field at
    interpolated world positions, dilate margins."""
    T = texture_size
    feat = np.zeros((T, T, 6), np.float32)
    weight = np.zeros((T, T), np.float32)

    tri_uv = uv_flat.reshape(-1, 3, 2)
    n_tris = tris.shape[0]

    # texel centers covered per triangle: iterate triangles, vectorized texel fill
    all_pos = []
    all_px = []
    for i in range(n_tris):
        uv = tri_uv[i] * T  # pixel coords
        lo = np.floor(uv.min(axis=0)).astype(int)
        hi = np.ceil(uv.max(axis=0)).astype(int)
        xs = np.arange(max(lo[0], 0), min(hi[0] + 1, T))
        ys = np.arange(max(lo[1], 0), min(hi[1] + 1, T))
        if len(xs) == 0 or len(ys) == 0:
            continue
        gx, gy = np.meshgrid(xs, ys, indexing="ij")
        p = np.stack([gx.reshape(-1) + 0.5, gy.reshape(-1) + 0.5], axis=-1)
        # barycentric wrt uv triangle
        a, b, c = uv[0], uv[1], uv[2]
        den = (b[1] - c[1]) * (a[0] - c[0]) + (c[0] - b[0]) * (a[1] - c[1])
        if abs(den) < 1e-12:
            continue
        w0 = ((b[1] - c[1]) * (p[:, 0] - c[0]) + (c[0] - b[0]) * (p[:, 1] - c[1])) / den
        w1 = ((c[1] - a[1]) * (p[:, 0] - c[0]) + (a[0] - c[0]) * (p[:, 1] - c[1])) / den
        w2 = 1.0 - w0 - w1
        eps = -0.2  # slight margin overfill for dilation
        ok = (w0 >= eps) & (w1 >= eps) & (w2 >= eps)
        if not ok.any():
            continue
        w = np.stack([w0[ok], w1[ok], w2[ok]], axis=-1)
        wclip = np.clip(w, 0.0, 1.0)
        wclip /= wclip.sum(axis=1, keepdims=True)
        v3 = verts[tris[i]]
        pos = wclip @ v3
        all_pos.append(pos)
        all_px.append(p[ok].astype(int))

    if all_pos:
        pos = np.concatenate(all_pos)
        px = np.concatenate(all_px)
        mats = np.empty((pos.shape[0], 6), np.float32)
        for s in range(0, pos.shape[0], chunk):
            mats[s : s + chunk] = np.asarray(material_fn(jnp.asarray(pos[s : s + chunk])))
        feat[px[:, 0], px[:, 1]] = mats
        weight[px[:, 0], px[:, 1]] = 1.0

    # margin dilation (replaces the reference's KNN inpaint, renderer.py:404-417)
    for _ in range(4):
        empty = weight == 0
        if not empty.any():
            break
        acc = np.zeros_like(feat)
        cnt = np.zeros_like(weight)
        for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            sh = np.roll(feat, (dy, dx), axis=(0, 1))
            shw = np.roll(weight, (dy, dx), axis=(0, 1))
            acc += sh * shw[..., None]
            cnt += shw
        fill = cnt > 0
        upd = empty & fill
        feat[upd] = acc[upd] / cnt[upd][..., None]
        weight[upd] = 1.0

    kd = feat[..., 0:3]
    ks = feat[..., 3:6]
    return kd, ks


def export_stage1_mesh(
    verts: np.ndarray,
    tris: np.ndarray,
    material_fn,
    workspace: str,
    texture_size: int = 1024,
    cascade_id: int = 0,
) -> str:
    """Full export: atlas + bake + PNG textures + OBJ/MTL. Returns obj path."""
    from PIL import Image

    os.makedirs(workspace, exist_ok=True)
    uv_flat, uv_tris, _ = grid_atlas(tris.shape[0], texture_size)
    kd, ks = bake_textures(verts, tris, uv_flat, material_fn, texture_size)

    kd_srgb = np.asarray(linear_to_srgb(jnp.asarray(np.clip(kd, 0, 1))))
    f0 = (np.clip(kd_srgb, 0, 1) * 255).astype(np.uint8)
    f1 = (np.clip(ks, 0, 1) * 255).astype(np.uint8)
    # texture (u,v) -> image (row = 1-v): transpose to image layout
    f0_img = np.flipud(np.transpose(f0, (1, 0, 2)))
    f1_img = np.flipud(np.transpose(f1, (1, 0, 2)))

    feat0 = os.path.join(workspace, f"feat0_{cascade_id}.png")
    feat1 = os.path.join(workspace, f"feat1_{cascade_id}.png")
    Image.fromarray(f0_img).save(feat0)
    Image.fromarray(f1_img).save(feat1)

    obj_path = os.path.join(workspace, f"mesh_{cascade_id}.obj")
    write_obj(
        obj_path, verts, tris, uvs=uv_flat, uv_tris=uv_tris,
        feat0_png=feat0, feat1_png=feat1,
    )
    return obj_path
