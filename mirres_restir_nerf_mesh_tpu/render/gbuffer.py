"""G-buffer generation by BVH ray casting (stage 1 primary visibility).

The reference rasterizes with nvdiffrast (`nerf/renderer.py:979-1014`); on TPU
we cast the camera rays against the same LBVH the path tracer uses — identical
G-buffer contents (positions, normals, barycentrics, face ids) with one code
path and no GL dependency.  Differentiability: positions/normals are computed
from the (offset) vertices via the hit barycentrics, so gradients flow to
vertex offsets for the hit triangle exactly like dr.interpolate; silhouette
(visibility) gradients — nvdiffrast's antialias term — are provided by the
boundary-pair crossing estimator in render/antialias.py (consuming the
per-pixel triangle vertices this buffer carries).
"""

from __future__ import annotations

from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp

from ..ops.tracer import Tracer
from ..utils.math import safe_normalize


def auto_normals(verts: jnp.ndarray, tris: jnp.ndarray) -> jnp.ndarray:
    """Area-weighted vertex normals via scatter-add
    (reference meshutils.py:14-39 auto_normals)."""
    v0 = verts[tris[:, 0]]
    v1 = verts[tris[:, 1]]
    v2 = verts[tris[:, 2]]
    fn = jnp.cross(v1 - v0, v2 - v0)  # area-weighted
    vn = jnp.zeros_like(verts)
    for k in range(3):
        vn = vn.at[tris[:, k]].add(fn)
    # fall back to +z for degenerate (reference uses [0,0,1])
    bad = jnp.sum(vn * vn, axis=-1, keepdims=True) < 1e-20
    vn = jnp.where(bad, jnp.array([0.0, 0.0, 1.0]), vn)
    return safe_normalize(vn)


class GBuffer(NamedTuple):
    mask: jnp.ndarray      # [N] bool hit
    position: jnp.ndarray  # [N,3] world hit position (differentiable wrt verts)
    normal: jnp.ndarray    # [N,3] smooth shading normal
    face_normal: jnp.ndarray  # [N,3] geometric normal
    depth: jnp.ndarray     # [N]
    face_id: jnp.ndarray   # [N] int32 (-1 miss)
    bary: jnp.ndarray      # [N,3]
    view_dir: jnp.ndarray  # [N,3] unit, from camera toward surface
    tri_v0: jnp.ndarray    # [N,3] hit triangle vertices (differentiable wrt
    tri_v1: jnp.ndarray    #       verts; consumed by the silhouette
    tri_v2: jnp.ndarray    #       antialias pass, render/antialias.py)


def raycast_gbuffer(
    verts: jnp.ndarray,
    tris: jnp.ndarray,
    tracer: Tracer,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
) -> GBuffer:
    """Cast primary rays; interpolate attributes differentiably from verts."""
    d = safe_normalize(rays_d)
    hit = tracer.intersect(rays_o, d)
    mask = hit.prim >= 0
    face = jnp.where(mask, hit.prim, 0)

    i0, i1, i2 = tris[face, 0], tris[face, 1], tris[face, 2]
    w = jnp.stack([1.0 - hit.u - hit.v, hit.u, hit.v], axis=-1)  # [N,3]
    tv0, tv1, tv2 = verts[i0], verts[i1], verts[i2]
    # differentiable position: bary-combine current vertices (grad -> offsets)
    pos = w[:, 0:1] * tv0 + w[:, 1:2] * tv1 + w[:, 2:3] * tv2

    vn = auto_normals(verts, tris)
    nrm = safe_normalize(w[:, 0:1] * vn[i0] + w[:, 1:2] * vn[i1] + w[:, 2:3] * vn[i2])
    fn = safe_normalize(jnp.cross(tv1 - tv0, tv2 - tv0))

    t = jnp.where(mask, hit.t, 0.0)
    return GBuffer(
        mask=mask,
        position=jnp.where(mask[:, None], pos, 0.0),
        normal=jnp.where(mask[:, None], nrm, 0.0),
        face_normal=jnp.where(mask[:, None], fn, 0.0),
        depth=t,
        face_id=hit.prim,
        bary=w,
        view_dir=d,
        tri_v0=tv0,
        tri_v1=tv1,
        tri_v2=tv2,
    )


def prepare_shading_normal(
    view_dir: jnp.ndarray, smooth_nrm: jnp.ndarray, geom_nrm: jnp.ndarray
) -> jnp.ndarray:
    """nvdiffrecmc-style shading-normal prep (reference
    nerf/renderutils/c_src/normal.cu:95-178 via ops.py:109-162):
    two-sided flip toward the camera + bent-normal blend so the shading
    normal never faces away from the viewer."""
    view = -view_dir  # toward camera
    # two-sided: flip both normals if the geometric normal faces away
    flip = jnp.sum(view * geom_nrm, axis=-1, keepdims=True) < 0
    geom = jnp.where(flip, -geom_nrm, geom_nrm)
    smooth = jnp.where(flip, -smooth_nrm, smooth_nrm)

    # bend the smooth normal toward the camera when it faces away
    NoV = jnp.sum(view * smooth, axis=-1, keepdims=True)
    NORMAL_THRESHOLD = 0.1
    t = jnp.clip(NoV / NORMAL_THRESHOLD, 0.0, 1.0)
    bent = safe_normalize(view * (1.0 - t) + smooth * t)
    return jnp.where(NoV < NORMAL_THRESHOLD, bent, smooth)
