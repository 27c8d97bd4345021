"""Stage-0 mesh extraction: density field -> cleaned, decimated surface mesh.

Re-implements reference `NeRFRenderer.export_stage0` (`nerf/renderer.py:497-698`)
and `mark_unseen_triangles` (`:1400-1434`):
  1. query the density (or SDF) field on a dense grid (chunked device calls)
  2. iso-surface extraction (native marching tetrahedra; reference: mcubes)
  3. optional visibility culling against the training cameras
  4. connected-component cleanup + QEM decimation (reference: pymeshlab)
  5. write mesh_{cascade}.ply

Outer cascades (bound > 1) extract per-cascade shells like the reference.
"""

from __future__ import annotations

import os
from typing import Callable, Optional

import jax.numpy as jnp
import numpy as np

from .meshio import write_ply
from .meshops import clean_components, decimate, marching_tets


def query_density_grid(
    density_fn: Callable[[jnp.ndarray], jnp.ndarray],
    resolution: int,
    bound: float,
    chunk: int = 262144,
) -> np.ndarray:
    """Dense [R,R,R] sigma grid over [-bound, bound]^3 (renderer.py:511-539)."""
    ax = np.linspace(-bound, bound, resolution, dtype=np.float32)
    out = np.empty((resolution ** 3,), np.float32)
    X, Y, Z = np.meshgrid(ax, ax, ax, indexing="ij")
    pts = np.stack([X.reshape(-1), Y.reshape(-1), Z.reshape(-1)], axis=-1)
    for s in range(0, pts.shape[0], chunk):
        out[s : s + chunk] = np.asarray(density_fn(jnp.asarray(pts[s : s + chunk])))
    return out.reshape(resolution, resolution, resolution)


def mark_unseen_triangles(
    verts: np.ndarray,
    tris: np.ndarray,
    poses: np.ndarray,       # [M,4,4]
    intrinsics: np.ndarray,  # [4]
    H: int,
    W: int,
    downscale: int = 1,
) -> np.ndarray:
    """True for triangles hit by NO training-view pixel ray.

    Occlusion-exact parity with the reference's z-buffered
    `dr.rasterize` + triangle-id collection (renderer.py:1400-1434): casting
    every pixel ray through the production tracer and keeping closest-hit
    face ids IS a z-buffer — interior junk that a frustum test would keep is
    culled.  `downscale` mirrors the reference's 'lower resolution' note."""
    import jax

    from ..data.rays import get_rays
    from ..ops.tracer import build_tracer

    Hs, Ws = max(H // downscale, 1), max(W // downscale, 1)
    intr = np.asarray(intrinsics, np.float32) / downscale
    tracer = build_tracer(jnp.asarray(verts), jnp.asarray(tris.astype(np.int32)))

    @jax.jit
    def prim_ids(pose):
        r = get_rays(pose[None], jnp.asarray(intr), Hs, Ws)
        hit = tracer.intersect(r["rays_o"], r["rays_d"])
        return hit.prim

    seen = np.zeros((tris.shape[0],), bool)
    for p in poses:
        ids = np.asarray(prim_ids(jnp.asarray(p)))
        ids = ids[ids >= 0]
        seen[np.unique(ids)] = True
    return ~seen


def export_stage0_mesh(
    density_fn: Callable[[jnp.ndarray], jnp.ndarray],
    workspace: str,
    *,
    bound: float = 1.0,
    cascade: int = 1,
    resolution: int = 512,
    density_thresh: float = 10.0,
    decimate_target: float = 3e5,
    clean_min_f: int = 8,
    clean_min_d: int = 5,
    sdf: bool = False,
    dataset=None,
    visibility_culling: bool = False,
    env_reso: int = 256,
):
    """Extract and save mesh_{cas}.ply files; returns the inner (cas 0) mesh."""
    os.makedirs(workspace, exist_ok=True)
    meshes = []
    for cas in range(cascade):
        cas_bound = min(2.0 ** cas, bound)
        reso = resolution if cas == 0 else env_reso
        grid = query_density_grid(density_fn, reso, cas_bound)
        if sdf:
            field = -grid  # inside where sdf < 0
            iso = 0.0
        else:
            field = grid
            iso = float(density_thresh)
        spacing = (2.0 * cas_bound / (reso - 1),) * 3
        v, t = marching_tets(field, iso, origin=(-cas_bound,) * 3, spacing=spacing)
        if len(t) == 0:
            continue

        if cas > 0 and meshes:
            # outer shells: drop faces inside the previous cascade's box
            # (reference renderer.py:573-698 remove_selected_verts)
            inner_b = min(2.0 ** (cas - 1), bound)
            cent = v[t].mean(axis=1)
            keep = np.abs(cent).max(axis=-1) > inner_b
            t = t[keep]

        if visibility_culling and dataset is not None:
            unseen = mark_unseen_triangles(
                v, t, dataset.poses, dataset.intrinsics, dataset.H, dataset.W
            )
            t = t[~unseen]

        v, t = clean_components(v, t, clean_min_f, float(clean_min_d) / 100.0 * 2 * cas_bound)
        if decimate_target > 0 and t.shape[0] > decimate_target:
            v, t = decimate(v, t, int(decimate_target))

        write_ply(os.path.join(workspace, f"mesh_{cas}.ply"), v, t)
        meshes.append((v, t))
    return meshes
