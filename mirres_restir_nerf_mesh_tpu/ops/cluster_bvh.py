"""Cluster tracer: TPU-native ray-mesh intersection.

The pointer-chasing LBVH (ops/bvh.py, kept as the structural-parity backend)
is hostile to TPU: every traversal step is a batch of random row gathers and
the lockstep while_loop runs at the slowest ray's depth (~0.04 Mrays/s
measured on v5e).  This module replaces it with dense, lane-friendly tensor
programs:

  - Moeller-Trumbore evaluated in *SoA component form*: every intermediate is
    an [N, T_chunk] tile (triangles along lanes), no 3-wide trailing dims —
    ~145x faster than the LBVH path for the same mesh.
  - small meshes (T <= dense_threshold): ONE dense pass over all triangles,
    no sort, no loop, no gathers.
  - large meshes: triangles are morton-sorted into clusters of S; a dense
    ray x cluster-AABB slab pass selects candidates, top_k orders them by
    entry t (iterative argmin extraction), and a short unrolled loop of
    wide-row gathers tests candidates until every ray's best hit is
    closer than its next cluster entry.

Same HitResult contract as ops/bvh.py.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .bvh import HitResult
from .morton import morton3d


SC_GROUP = 8  # clusters per supercluster (morton-consecutive -> tight union)


class ClusterMesh(NamedTuple):
    aabb_min: jnp.ndarray   # [C, 3]
    aabb_max: jnp.ndarray   # [C, 3]
    packed: jnp.ndarray     # [C, S, 10] (v0, e1, e2, prim-as-float)
    soa: jnp.ndarray        # [10, C*S] component-major copy for dense passes
    prim: jnp.ndarray       # [C, S] original triangle id (-1 = padding)
    geom_cm: jnp.ndarray    # [C, 16, S] component-major blocks for the tile
                            # tracer: rows 0-8 v0/e1/e2, 9 prim, 10-12 aabb_min,
                            # 13-15 aabb_max (broadcast along S)
    # two-level candidate selection (ops/tile_tracer.py): superclusters of
    # SC_GROUP morton-consecutive clusters.  The per-tile frustum test is
    # O(tiles x 8 x C); at the reference's 3e5-face meshes (C ~ 2.4k) a
    # coarse pass over SC = C/8 union boxes + expansion of the nearest
    # superclusters' children keeps candidate prep ~flat in C.
    sc_min: jnp.ndarray     # [SC, 3] union AABB of the group's clusters
    sc_max: jnp.ndarray     # [SC, 3]
    child_boxes: jnp.ndarray  # [SC, SC_GROUP*6] packed child (min,max) rows
                              # (ONE wide-row gather expands a supercluster)


def build_clusters(
    vertices: jnp.ndarray, triangles: jnp.ndarray, cluster_size: int = 128
) -> ClusterMesh:
    """Jittable build: morton-sort + reshape into [C, S] clusters."""
    v0 = vertices[triangles[:, 0]]
    v1 = vertices[triangles[:, 1]]
    v2 = vertices[triangles[:, 2]]
    n = triangles.shape[0]
    S = min(cluster_size, max(n, 1))

    tmin = jnp.minimum(jnp.minimum(v0, v1), v2)
    tmax = jnp.maximum(jnp.maximum(v0, v1), v2)
    centroid = (tmin + tmax) * 0.5
    scene_min = jnp.min(tmin, axis=0)
    extent = jnp.maximum(jnp.max(tmax, axis=0) - scene_min, 1e-9)
    grid = jnp.clip(((centroid - scene_min) / extent * 1024.0).astype(jnp.int32), 0, 1023)
    order = jnp.argsort(morton3d(grid))

    pad = (-n) % S
    order_p = jnp.concatenate([order, jnp.full((pad,), -1, order.dtype)])
    C = (n + pad) // S

    def take(x, fill):
        xp = jnp.concatenate([x, jnp.full((1,) + x.shape[1:], fill, x.dtype)])
        return xp[order_p].reshape(C, S, -1)

    v0c = take(v0, 0.0)
    v1c = take(v1, 0.0)
    v2c = take(v2, 0.0)
    prim = jnp.where(order_p >= 0, order_p, -1).reshape(C, S)

    valid = (prim >= 0)[..., None]
    big = 1e30
    cmin = jnp.min(
        jnp.where(valid, jnp.minimum(jnp.minimum(v0c, v1c), v2c), big), axis=1
    )
    cmax = jnp.max(
        jnp.where(valid, jnp.maximum(jnp.maximum(v0c, v1c), v2c), -big), axis=1
    )
    packed = jnp.concatenate(
        [v0c, v1c - v0c, v2c - v0c, prim[..., None].astype(jnp.float32)], axis=-1
    )
    soa = packed.reshape(C * S, 10).T  # [10, C*S]
    geom_cm = jnp.concatenate(
        [
            packed.transpose(0, 2, 1),                          # [C, 10, S]
            jnp.broadcast_to(cmin[:, :, None], (C, 3, S)),
            jnp.broadcast_to(cmax[:, :, None], (C, 3, S)),
        ],
        axis=1,
    )
    # supercluster level: union boxes of SC_GROUP consecutive (morton-local)
    # clusters + a packed child-box table for one-gather expansion.  Padding
    # children carry an inverted box (min=big, max=-big): never hit, and the
    # union min/max ignores them.
    G = SC_GROUP
    padc = (-C) % G
    mn = jnp.concatenate([cmin, jnp.full((padc, 3), big)])
    mx = jnp.concatenate([cmax, jnp.full((padc, 3), -big)])
    SCn = (C + padc) // G
    sc_min = jnp.min(mn.reshape(SCn, G, 3), axis=1)
    sc_max = jnp.max(mx.reshape(SCn, G, 3), axis=1)
    child_boxes = jnp.concatenate(
        [mn.reshape(SCn, G, 3), mx.reshape(SCn, G, 3)], axis=-1
    ).reshape(SCn, G * 6)
    return ClusterMesh(
        aabb_min=cmin, aabb_max=cmax, packed=packed, soa=soa,
        prim=prim.astype(jnp.int32), geom_cm=geom_cm,
        sc_min=sc_min, sc_max=sc_max, child_boxes=child_boxes,
    )


def _mt_soa(comp, ox, oy, oz, dx, dy, dz, t_min):
    """SoA Moeller-Trumbore: comp [10, M] triangle components vs rays given
    as [N,1] component columns -> (t [N,M], u, v)."""
    v0x, v0y, v0z = comp[0][None], comp[1][None], comp[2][None]
    e1x, e1y, e1z = comp[3][None], comp[4][None], comp[5][None]
    e2x, e2y, e2z = comp[6][None], comp[7][None], comp[8][None]
    prim = comp[9][None]

    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    inv = jnp.where(jnp.abs(det) < 1e-12, 0.0, 1.0 / det)
    tx = ox - v0x
    ty = oy - v0y
    tz = oz - v0z
    u = (tx * px + ty * py + tz * pz) * inv
    qx = ty * e1z - tz * e1y
    qy = tz * e1x - tx * e1z
    qz = tx * e1y - ty * e1x
    v = (dx * qx + dy * qy + dz * qz) * inv
    t = (e2x * qx + e2y * qy + e2z * qz) * inv
    ok = (
        (jnp.abs(det) > 1e-12) & (u >= 0) & (v >= 0) & (u + v <= 1)
        & (t > t_min) & (prim >= 0)
    )
    return jnp.where(ok, t, jnp.inf), u, v


def _finish(cm, best_lin, best_t, best_u, best_v, t_max_arr, verts_geom=None):
    """Resolve linear slot -> prim id + geometric normal.

    ONE wide-row gather from the [C*S, 10] packed table; gathering columns of
    the [10, C*S] SoA copy instead costs ~35x more (minor-dim strided gather,
    measured ~200 ms at 65k rays on v5e)."""
    miss = ~jnp.isfinite(best_t) | (best_t >= t_max_arr)
    lin = jnp.clip(best_lin, 0, cm.soa.shape[1] - 1)
    rows = cm.packed.reshape(-1, cm.packed.shape[-1])[lin]   # [N, 10]
    e1 = rows[:, 3:6]
    e2 = rows[:, 6:9]
    prim = rows[:, 9].astype(jnp.int32)
    nrm = jnp.cross(e1, e2)
    return HitResult(
        t=jnp.where(miss, jnp.inf, best_t),
        prim=jnp.where(miss, -1, prim),
        u=best_u,
        v=best_v,
        normal=jnp.where(miss[:, None], 0.0, nrm),
    )


def _intersect_dense_pallas(cm: ClusterMesh, rays_o, rays_d, t_min, t_max_arr):
    """Dense pass through the Pallas MT kernel (TPU: triangle blocks resident
    in VMEM across ray tiles; ~2x the fused-XLA version, ~250x the LBVH)."""
    from .pallas_tracer import BM, pallas_dense_hit

    M = cm.soa.shape[1]
    pad = (-M) % BM
    cm16 = jnp.zeros((16, M + pad), jnp.float32)
    cm16 = cm16.at[:10, :M].set(cm.soa)
    if pad:
        cm16 = cm16.at[9, M:].set(-1.0)
    best_t, best_lin, u, v = pallas_dense_hit(cm16, rays_o, rays_d, t_min=t_min)
    best_t = jnp.where(best_t >= 1e29, jnp.inf, best_t)
    best_t = jnp.where(best_t <= t_max_arr, best_t, jnp.inf)
    best_lin = jnp.clip(best_lin, 0, M - 1)
    return _finish(cm, best_lin, best_t, u, v, t_max_arr)


def _intersect_dense(cm: ClusterMesh, rays_o, rays_d, t_min, t_max_arr,
                     chunk: int = 2048):
    """One dense pass over every triangle (small meshes)."""
    if jax.default_backend() not in ("cpu",):
        return _intersect_dense_pallas(cm, rays_o, rays_d, t_min, t_max_arr)
    N = rays_o.shape[0]
    M = cm.soa.shape[1]
    ox, oy, oz = rays_o[:, 0:1], rays_o[:, 1:2], rays_o[:, 2:3]
    dx, dy, dz = rays_d[:, 0:1], rays_d[:, 1:2], rays_d[:, 2:3]

    best_t = t_max_arr
    best_lin = jnp.zeros((N,), jnp.int32)
    best_u = jnp.zeros((N,))
    best_v = jnp.zeros((N,))
    found = jnp.zeros((N,), bool)
    for s in range(0, M, chunk):
        e = min(s + chunk, M)
        t, u, v = _mt_soa(cm.soa[:, s:e], ox, oy, oz, dx, dy, dz, t_min)
        i = jnp.argmin(t, -1)
        tmin_ = jnp.take_along_axis(t, i[:, None], 1)[:, 0]
        better = tmin_ < best_t
        best_lin = jnp.where(better, s + i, best_lin)
        best_u = jnp.where(better, jnp.take_along_axis(u, i[:, None], 1)[:, 0], best_u)
        best_v = jnp.where(better, jnp.take_along_axis(v, i[:, None], 1)[:, 0], best_v)
        best_t = jnp.where(better, tmin_, best_t)
        found = found | better
    best_t = jnp.where(found, best_t, jnp.inf)
    return _finish(cm, best_lin, best_t, best_u, best_v, t_max_arr)


def _slab_all(cm: ClusterMesh, rays_o, inv_d, t_lo, t_hi):
    lo = (cm.aabb_min[None] - rays_o[:, None]) * inv_d[:, None]
    hi = (cm.aabb_max[None] - rays_o[:, None]) * inv_d[:, None]
    t0 = jnp.minimum(lo, hi).max(axis=-1)
    t1 = jnp.maximum(lo, hi).min(axis=-1)
    hit = (t1 >= jnp.maximum(t0, t_lo)) & (t0 <= t_hi[:, None])
    return jnp.where(hit, jnp.maximum(t0, 0.0), jnp.inf)


def intersect_clusters(
    cm: ClusterMesh,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    t_min: float = 1e-4,
    t_max=1e10,
    any_hit: bool = False,
    dense_threshold: int = 8192,
    max_candidates: int = 10,
) -> HitResult:
    """Closest-hit (or any-hit: first hit then mask) trace."""
    N = rays_o.shape[0]
    C, S = cm.prim.shape
    t_max_arr = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (N,))

    if C * S <= dense_threshold or C == 1:
        return _intersect_dense(cm, rays_o, rays_d, t_min, t_max_arr)

    inv_d = 1.0 / jnp.where(jnp.abs(rays_d) < 1e-12, 1e-12, rays_d)
    entry = _slab_all(cm, rays_o, inv_d, t_min, t_max_arr)   # [N,C]

    # K nearest candidate clusters by entry t via iterative argmin extraction
    # (full top_k sorts the whole row and dominates the trace cost; K min
    # extractions are K cheap [N,C] passes)
    K = min(max_candidates, C)
    cand_list, ent_list = [], []
    work = entry
    col = jax.lax.broadcasted_iota(jnp.int32, (N, C), 1)
    for _ in range(K):
        i = jnp.argmin(work, axis=-1)
        e = jnp.min(work, axis=-1)
        cand_list.append(i)
        ent_list.append(e)
        work = jnp.where(col == i[:, None], jnp.inf, work)  # mask, no scatter
    cand = jnp.stack(cand_list, axis=1).astype(jnp.int32)     # [N,K] ascending
    cand_entry = jnp.stack(ent_list, axis=1)

    ox, oy, oz = rays_o[:, 0:1], rays_o[:, 1:2], rays_o[:, 2:3]
    dx, dy, dz = rays_d[:, 0:1], rays_d[:, 1:2], rays_d[:, 2:3]

    best_t = t_max_arr
    best_lin = jnp.zeros((N,), jnp.int32)
    best_u = jnp.zeros((N,))
    best_v = jnp.zeros((N,))
    found = jnp.zeros((N,), bool)
    done = jnp.zeros((N,), bool)

    def round_k(k, carry):
        best_t, best_lin, best_u, best_v, found, done = carry
        cid = cand[:, k]
        ent = cand_entry[:, k]
        active = ~done & jnp.isfinite(ent) & (ent <= best_t)
        # ONE wide row gather per ray: the whole cluster's packed geometry
        rows = cm.packed[jnp.where(active, cid, 0)]           # [N, S, 10]
        t, u, v = _mt_rows(rows, rays_o, rays_d, t_min)
        t = jnp.where(active[:, None], t, jnp.inf)
        i = jnp.argmin(t, -1)
        tmin_ = jnp.take_along_axis(t, i[:, None], 1)[:, 0]
        better = tmin_ < best_t
        lin = cid * S + i
        best_lin = jnp.where(better, lin, best_lin)
        best_u = jnp.where(better, jnp.take_along_axis(u, i[:, None], 1)[:, 0], best_u)
        best_v = jnp.where(better, jnp.take_along_axis(v, i[:, None], 1)[:, 0], best_v)
        best_t = jnp.where(better, tmin_, best_t)
        found = found | better
        if any_hit:
            done = done | found
        nxt = cand_entry[:, min(k + 1, K - 1)]
        done = done | ~jnp.isfinite(nxt) | (nxt > best_t) | (k + 1 >= K)
        return best_t, best_lin, best_u, best_v, found, done

    # fully unrolled candidate rounds: per-round work is already masked by
    # `done`, and a batch-level lax.cond tail gate measured 5-10x SLOWER in
    # the full stage-1 graph (round-1 bench regression) — the outlined branch
    # blocks XLA fusion with the surrounding pipeline
    carry = (best_t, best_lin, best_u, best_v, found, done)
    for k in range(K):
        carry = round_k(k, carry)

    best_t, best_lin, best_u, best_v, found, done = carry
    best_t = jnp.where(found, best_t, jnp.inf)
    return _finish(cm, best_lin, best_t, best_u, best_v, t_max_arr)


def _mt_rows(rows: jnp.ndarray, rays_o, rays_d, t_min):
    """SoA MT where each ray has its own [S, 10] gathered triangle rows."""
    v0x, v0y, v0z = rows[..., 0], rows[..., 1], rows[..., 2]
    e1x, e1y, e1z = rows[..., 3], rows[..., 4], rows[..., 5]
    e2x, e2y, e2z = rows[..., 6], rows[..., 7], rows[..., 8]
    prim = rows[..., 9]
    ox, oy, oz = rays_o[:, 0:1], rays_o[:, 1:2], rays_o[:, 2:3]
    dx, dy, dz = rays_d[:, 0:1], rays_d[:, 1:2], rays_d[:, 2:3]

    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    inv = jnp.where(jnp.abs(det) < 1e-12, 0.0, 1.0 / det)
    tx = ox - v0x
    ty = oy - v0y
    tz = oz - v0z
    u = (tx * px + ty * py + tz * pz) * inv
    qx = ty * e1z - tz * e1y
    qy = tz * e1x - tx * e1z
    qz = tx * e1y - ty * e1x
    v = (dx * qx + dy * qy + dz * qz) * inv
    t = (e2x * qx + e2y * qy + e2z * qz) * inv
    ok = (
        (jnp.abs(det) > 1e-12) & (u >= 0) & (v >= 0) & (u + v <= 1)
        & (t > t_min) & (prim >= 0)
    )
    return jnp.where(ok, t, jnp.inf), u, v


def occluded_clusters(cm: ClusterMesh, rays_o, rays_d, t_max, t_min: float = 1e-4,
                      max_candidates: int = 10, dense_threshold: int = 8192):
    res = intersect_clusters(
        cm, rays_o, rays_d, t_min=t_min, t_max=t_max, any_hit=True,
        max_candidates=max_candidates, dense_threshold=dense_threshold,
    )
    return res.prim >= 0
