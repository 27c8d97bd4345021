"""LBVH construction + ray-mesh intersection, TPU-native (pure JAX).

Replaces the reference's Slang BVH stack (`nerf/bvhworkers/*.slang`,
host driver `nerf/renderer_restir.py:13-146`):
  - per-triangle AABBs + 30-bit Morton codes of centroid (get_elements.slang,
    lbvh_morton_codes.slang) -> vectorized jnp
  - single-workgroup radix sort (lbvh_single_radixsort.slang) -> lax.sort
  - Karras 2012 hierarchy (lbvh_hierarchy.slang:40-244) -> vectorized
    binary-search formulation (no per-thread loops)
  - bottom-up AABB fit driven by a Python level loop in the reference
    (lbvh_bounding_boxes.slang) -> fixed-depth lax.fori_loop sweep
  - stack-based traversal (intersect_test.slang:14-167 bvh_hit /
    bvh_hit_with_normal) -> lockstep vectorized while_loop with per-ray
    stacks, Moeller-Trumbore triangle test.

The whole build is jittable and runs every stage-1 step (vertices move).
Node layout: internal nodes 0..n-2, leaves n-1..2n-2 (leaf i holds sorted
primitive i).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .morton import morton3d


class BVH(NamedTuple):
    node_min: jnp.ndarray   # [2n-1, 3]
    node_max: jnp.ndarray   # [2n-1, 3]
    left: jnp.ndarray       # [n-1] child index (internal node id space)
    right: jnp.ndarray      # [n-1]
    prim: jnp.ndarray       # [n] sorted primitive ids (leaf order)
    tri_v0: jnp.ndarray     # [n, 3] triangle vertices in leaf order
    tri_e1: jnp.ndarray     # [n, 3]
    tri_e2: jnp.ndarray     # [n, 3]


def _common_prefix(codes: jnp.ndarray, i: jnp.ndarray, j: jnp.ndarray, n: int) -> jnp.ndarray:
    """Karras delta(i, j): common-prefix length of morton codes, index
    tiebreak for equal codes, -1 when j out of range."""
    j_ok = (j >= 0) & (j < n)
    jc = jnp.clip(j, 0, n - 1)
    ci = codes[i]
    cj = codes[jc]
    x = ci ^ cj
    # when codes equal, compare indices (adds 32 like the reference)
    xi = i.astype(jnp.uint32) ^ jc.astype(jnp.uint32)
    clz_codes = 32 - _bit_length(x)
    clz_idx = 32 + (32 - _bit_length(xi))
    d = jnp.where(x == 0, clz_idx, clz_codes)
    return jnp.where(j_ok, d, -1)


def _bit_length(x: jnp.ndarray) -> jnp.ndarray:
    """Position of highest set bit + 1 (0 for x==0), for uint32."""
    x = x.astype(jnp.uint32)
    out = jnp.zeros(x.shape, jnp.int32)
    cur = x
    for shift in (16, 8, 4, 2, 1):
        hi = cur >> jnp.uint32(shift)
        has = hi > 0
        out = out + jnp.where(has, shift, 0)
        cur = jnp.where(has, hi, cur)
    return jnp.where(x == 0, 0, out + 1)


def build_bvh(vertices: jnp.ndarray, triangles: jnp.ndarray, max_depth: int = 64) -> BVH:
    """vertices [V,3] float32, triangles [n,3] int32 -> BVH (jittable)."""
    v0 = vertices[triangles[:, 0]]
    v1 = vertices[triangles[:, 1]]
    v2 = vertices[triangles[:, 2]]
    n = triangles.shape[0]

    tmin = jnp.minimum(jnp.minimum(v0, v1), v2)
    tmax = jnp.maximum(jnp.maximum(v0, v1), v2)
    centroid = (tmin + tmax) * 0.5

    scene_min = jnp.min(tmin, axis=0)
    scene_max = jnp.max(tmax, axis=0)
    extent = jnp.maximum(scene_max - scene_min, 1e-9)
    unit = (centroid - scene_min) / extent
    grid = jnp.clip((unit * 1024.0).astype(jnp.int32), 0, 1023)
    codes = morton3d(grid)  # [n] uint32 (30-bit)

    order = jnp.argsort(codes)
    codes = codes[order].astype(jnp.uint32)
    prim = order.astype(jnp.int32)

    if n == 1:
        node_min = jnp.concatenate([tmin, tmin], axis=0)
        node_max = jnp.concatenate([tmax, tmax], axis=0)
        return BVH(node_min[:1], node_max[:1], jnp.zeros((0,), jnp.int32),
                   jnp.zeros((0,), jnp.int32), prim,
                   v0[order], (v1 - v0)[order], (v2 - v0)[order])

    i = jnp.arange(n - 1, dtype=jnp.int32)

    # --- Karras 2012: determine direction & range per internal node ---
    d_next = _common_prefix(codes, i, i + 1, n)
    d_prev = _common_prefix(codes, i, i - 1, n)
    d = jnp.where(d_next > d_prev, 1, -1).astype(jnp.int32)
    delta_min = _common_prefix(codes, i, i - d, n)

    # upper bound for range length by doubling
    def ub_body(_, lmax):
        probe = i + lmax * d
        ok = _common_prefix(codes, i, probe, n) > delta_min
        return jnp.where(ok, lmax * 2, lmax)

    lmax = jax.lax.fori_loop(0, 22, ub_body, jnp.full((n - 1,), 2, jnp.int32))

    # binary search exact length l
    l = jnp.zeros((n - 1,), jnp.int32)
    t = lmax // 2

    def len_body(_, carry):
        l, t = carry
        probe = i + (l + t) * d
        ok = _common_prefix(codes, i, probe, n) > delta_min
        l = jnp.where(ok, l + t, l)
        return (l, jnp.maximum(t // 2, 1))

    # enough iterations to bring t down to 1 and finish
    l, _ = jax.lax.fori_loop(0, 24, len_body, (l, t))
    j = i + l * d  # other end of the range

    # split position via binary search on prefix
    delta_node = _common_prefix(codes, i, j, n)
    s = jnp.zeros((n - 1,), jnp.int32)
    t2 = (l + 1) // 2

    def split_body(_, carry):
        s, t2 = carry
        probe = i + (s + t2) * d
        ok = _common_prefix(codes, i, probe, n) > delta_node
        s = jnp.where(ok & (s + t2 < l), s + t2, s)
        return (s, jnp.maximum((t2 + 1) // 2, 1))

    s, _ = jax.lax.fori_loop(0, 24, split_body, (s, t2))
    gamma = i + s * d + jnp.minimum(d, 0)

    lo = jnp.minimum(i, j)
    hi = jnp.maximum(i, j)
    # child is a leaf when the split touches the range boundary
    left_is_leaf = lo == gamma
    right_is_leaf = hi == gamma + 1
    left = jnp.where(left_is_leaf, gamma + (n - 1), gamma)
    right = jnp.where(right_is_leaf, gamma + 1 + (n - 1), gamma + 1)

    # --- bottom-up AABB fit by fixed-depth sweeps ---
    leaf_min = tmin[prim]
    leaf_max = tmax[prim]
    node_min = jnp.concatenate([jnp.full((n - 1, 3), jnp.inf), leaf_min], axis=0)
    node_max = jnp.concatenate([jnp.full((n - 1, 3), -jnp.inf), leaf_max], axis=0)

    def fit_body(_, carry):
        nmin, nmax = carry
        new_min = jnp.minimum(nmin[left], nmin[right])
        new_max = jnp.maximum(nmax[left], nmax[right])
        nmin = nmin.at[:n - 1].set(new_min)
        nmax = nmax.at[:n - 1].set(new_max)
        return (nmin, nmax)

    node_min, node_max = jax.lax.fori_loop(0, max_depth, fit_body, (node_min, node_max))

    return BVH(
        node_min=node_min, node_max=node_max, left=left, right=right, prim=prim,
        tri_v0=v0[prim], tri_e1=(v1 - v0)[prim], tri_e2=(v2 - v0)[prim],
    )


class HitResult(NamedTuple):
    t: jnp.ndarray        # [R] hit distance (inf if miss)
    prim: jnp.ndarray     # [R] original primitive id (-1 if miss)
    u: jnp.ndarray        # [R] barycentric u
    v: jnp.ndarray        # [R] barycentric v
    normal: jnp.ndarray   # [R, 3] geometric normal (unnormalized cross)


def intersect_bvh(
    bvh: BVH,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    t_min: float = 1e-4,
    t_max=1e10,
    any_hit: bool = False,
    stack_depth: int = 64,
) -> HitResult:
    """Closest-hit (or any-hit) traversal for R rays, lockstep vectorized.

    Mirrors `intersect_test.slang` bvh_hit/bvh_hit_with_normal: stack-based
    descent, AABB slab tests against current best t, Moeller-Trumbore
    triangle intersection with backface hits allowed.
    """
    R = rays_o.shape[0]
    n = bvh.prim.shape[0]
    n_internal = n - 1

    inv_d = 1.0 / jnp.where(jnp.abs(rays_d) < 1e-12, 1e-12, rays_d)

    stack = jnp.zeros((R, stack_depth), jnp.int32)
    sp = jnp.ones((R,), jnp.int32)  # stack[.,0] = 0 (root); sp = 1
    best_t = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (R,))
    best_prim = jnp.full((R,), -1, jnp.int32)
    best_u = jnp.zeros((R,), jnp.float32)
    best_v = jnp.zeros((R,), jnp.float32)
    best_n = jnp.zeros((R, 3), jnp.float32)
    done = jnp.zeros((R,), bool)

    if n == 1:
        # single leaf: direct triangle test
        hit_t, u, v, nrm = _tri_hit(bvh, jnp.zeros((R,), jnp.int32), rays_o, rays_d, t_min)
        hit = hit_t < best_t
        return HitResult(
            t=jnp.where(hit, hit_t, jnp.inf),
            prim=jnp.where(hit, bvh.prim[0], -1),
            u=u, v=v, normal=nrm,
        )

    def aabb_hit(node, o, idv, tmax_cur):
        lo = (bvh.node_min[node] - o) * idv
        hi = (bvh.node_max[node] - o) * idv
        t0 = jnp.minimum(lo, hi).max(axis=-1)
        t1 = jnp.maximum(lo, hi).min(axis=-1)
        return (t1 >= jnp.maximum(t0, 0.0)) & (t0 <= tmax_cur)

    def cond(carry):
        _, sp, _, _, _, _, _, done = carry
        return jnp.any((sp > 0) & ~done)

    def body(carry):
        stack, sp, best_t, best_prim, best_uv, best_n, _, done = carry
        best_u, best_v = best_uv
        active = (sp > 0) & ~done
        spc = jnp.maximum(sp - 1, 0)
        node = stack[jnp.arange(R), spc]
        sp_new = jnp.where(active, spc, sp)

        is_leaf = node >= n_internal
        leaf_id = jnp.clip(node - n_internal, 0, n - 1)

        # --- leaf: triangle test ---
        hit_t, u, v, nrm = _tri_hit(bvh, leaf_id, rays_o, rays_d, t_min)
        tri_better = active & is_leaf & (hit_t < best_t)
        best_t = jnp.where(tri_better, hit_t, best_t)
        best_prim = jnp.where(tri_better, bvh.prim[leaf_id], best_prim)
        best_u = jnp.where(tri_better, u, best_u)
        best_v = jnp.where(tri_better, v, best_v)
        best_n = jnp.where(tri_better[:, None], nrm, best_n)
        if any_hit:
            done = done | tri_better

        # --- internal: push children whose AABB is hit ---
        node_i = jnp.clip(node, 0, n_internal - 1)
        lchild = bvh.left[node_i]
        rchild = bvh.right[node_i]
        push_l = active & ~is_leaf & aabb_hit(lchild, rays_o, inv_d, best_t)
        push_r = active & ~is_leaf & aabb_hit(rchild, rays_o, inv_d, best_t)

        rows = jnp.arange(R)
        idx_l = jnp.where(push_l, sp_new, stack_depth - 1)
        stack = stack.at[rows, jnp.clip(idx_l, 0, stack_depth - 1)].set(
            jnp.where(push_l, lchild, stack[rows, jnp.clip(idx_l, 0, stack_depth - 1)])
        )
        sp_new = sp_new + push_l.astype(jnp.int32)
        idx_r = jnp.where(push_r, sp_new, stack_depth - 1)
        stack = stack.at[rows, jnp.clip(idx_r, 0, stack_depth - 1)].set(
            jnp.where(push_r, rchild, stack[rows, jnp.clip(idx_r, 0, stack_depth - 1)])
        )
        sp_new = sp_new + push_r.astype(jnp.int32)
        sp_new = jnp.minimum(sp_new, stack_depth - 1)

        return (stack, sp_new, best_t, best_prim, (best_u, best_v), best_n, 0, done)

    carry = (stack, sp, best_t, best_prim, (best_u, best_v), best_n, 0, done)
    stack, sp, best_t, best_prim, (best_u, best_v), best_n, _, done = jax.lax.while_loop(
        cond, body, carry
    )

    miss = best_prim < 0
    return HitResult(
        t=jnp.where(miss, jnp.inf, best_t),
        prim=best_prim,
        u=best_u,
        v=best_v,
        normal=best_n,
    )


def _tri_hit(bvh: BVH, leaf_id: jnp.ndarray, rays_o, rays_d, t_min: float):
    """Moeller-Trumbore for the triangle at each leaf_id (per ray)."""
    v0 = bvh.tri_v0[leaf_id]
    e1 = bvh.tri_e1[leaf_id]
    e2 = bvh.tri_e2[leaf_id]
    pvec = jnp.cross(rays_d, e2)
    det = jnp.sum(e1 * pvec, axis=-1)
    inv_det = jnp.where(jnp.abs(det) < 1e-12, 0.0, 1.0 / det)
    tvec = rays_o - v0
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, e1)
    v = jnp.sum(rays_d * qvec, axis=-1) * inv_det
    t = jnp.sum(e2 * qvec, axis=-1) * inv_det
    ok = (jnp.abs(det) > 1e-12) & (u >= 0) & (v >= 0) & (u + v <= 1) & (t > t_min)
    nrm = jnp.cross(e1, e2)
    return jnp.where(ok, t, jnp.inf), u, v, nrm


def occluded(bvh: BVH, rays_o: jnp.ndarray, rays_d: jnp.ndarray,
             t_max, t_min: float = 1e-4) -> jnp.ndarray:
    """Shadow-ray query: True where any hit closer than t_max exists.
    t_max may be a scalar or a per-ray array (light distance)."""
    res = intersect_bvh(bvh, rays_o, rays_d, t_min=t_min, t_max=t_max, any_hit=True)
    return res.prim >= 0
