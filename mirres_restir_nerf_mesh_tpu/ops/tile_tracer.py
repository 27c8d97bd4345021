"""Tile tracer: coherent ray-tile x candidate-cluster Pallas traversal.

The production TPU ray-mesh intersector.  Re-implements the reference's BVH
traversal semantics (`nerf/bvhworkers/intersect_test.slang:14-167` closest-hit
and any-hit) with a TPU-first execution model:

  Problem: the per-ray candidate loop in ops/cluster_bvh.py pays ~15 ns per
  gathered cluster row (measured, CLAUDE.md cost model) -> ~19 us/ray at
  K=10 x S=128 rows.  Ray tracing on TPU is gather-bound, not compute-bound.

  Fix: amortize the candidate selection and the geometry fetch over a *tile*
  of rays.
    1. XLA prep (cheap, O(tiles x 8 x C) not O(rays x C)): rays are grouped
       into tiles of R; each tile is split into 8 direction octants; a
       conservative interval-arithmetic slab test (origin box x sign-fixed
       direction box vs cluster AABB) selects candidate clusters per
       (tile, octant); the 8 octant lists merge into one per-tile stream
       sorted by conservative entry t.
    2. Pallas kernel with scalar-prefetched candidate indices: the BlockSpec
       index_map reads cand[tile, k] so the DMA engine streams *only* the
       candidate cluster blocks into VMEM -- zero XLA gathers.  Inside, a
       per-ray slab + octant mask drops rays whose best hit already beats
       the cluster's entry, and Moeller-Trumbore runs in SoA component form
       (triangles on sublanes, rays on lanes, f32 on the VPU).
    3. `pl.when` skips whole grid steps once a tile exhausts its candidates
       (k >= count) or no ray can still use the cluster -- including a real
       first-hit early-out for shadow rays (any_hit) that the per-ray
       gather path never had.

The octant split is what keeps *incoherent* rays (bounce directions,
hemisphere samples) exact: a sign-constrained direction box gives each
octant a tight frustum even when the tile's union of directions covers the
whole sphere.  Exactness telemetry: `tile_trace` returns an `uncertain`
per-ray mask (best_t exceeds the entry of the first candidate dropped by
the per-tile budget) so tests can assert the budget never truncates on
representative meshes (tests/test_tile_tracer.py), mirroring how the
reference trusts its fixed 64-deep traversal stack
(intersect_test.slang:24).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .bvh import HitResult
from .cluster_bvh import ClusterMesh, _finish, _intersect_dense

R_TILE = 512      # rays per tile (lanes axis; multiple of 128)
BIG = 1e30


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _kernel(cand_ref, octs_ref, counts_ref, geom_ref, rays_ref, out_ref, *,
            t_min: float, any_hit: bool, S: int, R: int):
    ti = pl.program_id(0)
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _init():
        out_ref[0, 0, :] = jnp.full((R,), BIG, jnp.float32)   # best_t
        out_ref[0, 1, :] = jnp.zeros((R,), jnp.float32)       # best slot in cluster
        out_ref[0, 2, :] = jnp.zeros((R,), jnp.float32)       # u
        out_ref[0, 3, :] = jnp.zeros((R,), jnp.float32)       # v
        out_ref[0, 4, :] = jnp.zeros((R,), jnp.float32)       # best cluster id

    @pl.when(k < counts_ref[ti])
    def _body():
        ox = rays_ref[0, 0, :]
        oy = rays_ref[0, 1, :]
        oz = rays_ref[0, 2, :]
        dx = rays_ref[0, 3, :]
        dy = rays_ref[0, 4, :]
        dz = rays_ref[0, 5, :]
        tmax = rays_ref[0, 6, :]
        best = out_ref[0, 0, :]

        # octant bitmask: which direction octants of this tile see the cluster
        oct_k = octs_ref[ti, k]
        ray_oct = (
            (dx > 0).astype(jnp.int32)
            + 2 * (dy > 0).astype(jnp.int32)
            + 4 * (dz > 0).astype(jnp.int32)
        )
        oct_ok = jnp.bitwise_and(jnp.right_shift(oct_k, ray_oct), 1) == 1

        # per-ray slab test against this cluster's AABB (rows 10..15 carry
        # the box broadcast along lanes; lane 0 reads are scalar loads)
        bnx = geom_ref[0, 10, 0]
        bny = geom_ref[0, 11, 0]
        bnz = geom_ref[0, 12, 0]
        bxx = geom_ref[0, 13, 0]
        bxy = geom_ref[0, 14, 0]
        bxz = geom_ref[0, 15, 0]

        def inv(c):
            return 1.0 / jnp.where(jnp.abs(c) < 1e-12, 1e-12, c)

        ix, iy, iz = inv(dx), inv(dy), inv(dz)
        lox, hix = (bnx - ox) * ix, (bxx - ox) * ix
        loy, hiy = (bny - oy) * iy, (bxy - oy) * iy
        loz, hiz = (bnz - oz) * iz, (bxz - oz) * iz
        t0 = jnp.maximum(
            jnp.maximum(jnp.minimum(lox, hix), jnp.minimum(loy, hiy)),
            jnp.minimum(loz, hiz),
        )
        t1 = jnp.minimum(
            jnp.minimum(jnp.maximum(lox, hix), jnp.maximum(loy, hiy)),
            jnp.maximum(loz, hiz),
        )
        entry = jnp.maximum(t0, 0.0)
        useful = (
            oct_ok
            & (t1 >= jnp.maximum(t0, t_min))
            & (t0 <= tmax)
            & (entry < best)
        )
        if any_hit:
            useful = useful & (best >= BIG)  # found rays are done

        @pl.when(jnp.any(useful))
        def _mt():
            # triangles on sublanes ([S,1] columns), rays on lanes ([1,R])
            v0x = geom_ref[0, 0, :][:, None]
            v0y = geom_ref[0, 1, :][:, None]
            v0z = geom_ref[0, 2, :][:, None]
            e1x = geom_ref[0, 3, :][:, None]
            e1y = geom_ref[0, 4, :][:, None]
            e1z = geom_ref[0, 5, :][:, None]
            e2x = geom_ref[0, 6, :][:, None]
            e2y = geom_ref[0, 7, :][:, None]
            e2z = geom_ref[0, 8, :][:, None]
            prim = geom_ref[0, 9, :][:, None]

            rdx, rdy, rdz = dx[None, :], dy[None, :], dz[None, :]
            px = rdy * e2z - rdz * e2y
            py = rdz * e2x - rdx * e2z
            pz = rdx * e2y - rdy * e2x
            det = e1x * px + e1y * py + e1z * pz
            dinv = jnp.where(jnp.abs(det) < 1e-12, 0.0, 1.0 / det)
            tx = ox[None, :] - v0x
            ty = oy[None, :] - v0y
            tz = oz[None, :] - v0z
            u = (tx * px + ty * py + tz * pz) * dinv
            qx = ty * e1z - tz * e1y
            qy = tz * e1x - tx * e1z
            qz = tx * e1y - ty * e1x
            v = (rdx * qx + rdy * qy + rdz * qz) * dinv
            th = (e2x * qx + e2y * qy + e2z * qz) * dinv
            ok = (
                (jnp.abs(det) > 1e-12) & (u >= 0) & (v >= 0) & (u + v <= 1)
                & (th > t_min) & (th < tmax[None, :]) & (prim >= 0)
                & useful[None, :]
            )

            if any_hit:
                # occlusion only needs the boolean: skip the closest-hit
                # argmin/u/v bookkeeping (~25% of the step's vector ops)
                found_now = jnp.any(ok, axis=0)              # [R]
                out_ref[0, 0, :] = jnp.where(found_now, 0.0, best)
            else:
                th = jnp.where(ok, th, BIG)                  # [S, R]
                slot = jnp.argmin(th, axis=0)                # [R]
                rows = jax.lax.broadcasted_iota(jnp.int32, (S, R), 0)
                sel = rows == slot[None, :]
                t_best = jnp.min(th, axis=0)
                u_best = jnp.max(jnp.where(sel, u, -BIG), axis=0)
                v_best = jnp.max(jnp.where(sel, v, -BIG), axis=0)

                better = t_best < best
                # cid and slot travel in SEPARATE f32 rows (each well under
                # the 2^24 f32-exact range); the caller combines them in
                # int32 — no silent corruption past 16.7M padded triangles.
                cid = cand_ref[ti, k].astype(jnp.float32)
                out_ref[0, 0, :] = jnp.where(better, t_best, best)
                out_ref[0, 1, :] = jnp.where(better, slot.astype(jnp.float32), out_ref[0, 1, :])
                out_ref[0, 2, :] = jnp.where(better, u_best, out_ref[0, 2, :])
                out_ref[0, 3, :] = jnp.where(better, v_best, out_ref[0, 3, :])
                out_ref[0, 4, :] = jnp.where(better, cid, out_ref[0, 4, :])


def _queue_kernel(qt_ref, qc_ref, qm_ref, geom_ref, rays_ref, prev_ref,
                  out_ref, *, t_min: float, any_hit: bool, S: int, R: int):
    """Work-queue variant of _kernel: the grid is a flat list of ACTIVE
    (tile, candidate) pairs instead of tiles x k_cap, so fully-skipped steps
    (~0.13 us each, the majority at k_cap=512 on incoherent batches) vanish
    from the grid entirely.  qm packs [oct<<3 | active<<2 | copy<<1 | fresh]:
    fresh = first queue item of a tile (init its output block), copy = first
    item within this CHUNK of a tile continued from the previous chunk
    (restore its running state from prev_ref)."""
    w = pl.program_id(0)
    m = qm_ref[w]

    @pl.when((m & 1) == 1)
    def _fresh():
        out_ref[0, 0, :] = jnp.full((R,), BIG, jnp.float32)
        out_ref[0, 1, :] = jnp.zeros((R,), jnp.float32)
        out_ref[0, 2, :] = jnp.zeros((R,), jnp.float32)
        out_ref[0, 3, :] = jnp.zeros((R,), jnp.float32)
        out_ref[0, 4, :] = jnp.zeros((R,), jnp.float32)

    @pl.when((m & 2) == 2)
    def _copy():
        out_ref[0, :, :] = prev_ref[0, :, :]

    @pl.when((m & 4) == 4)
    def _body():
        ox = rays_ref[0, 0, :]
        oy = rays_ref[0, 1, :]
        oz = rays_ref[0, 2, :]
        dx = rays_ref[0, 3, :]
        dy = rays_ref[0, 4, :]
        dz = rays_ref[0, 5, :]
        tmax = rays_ref[0, 6, :]
        best = out_ref[0, 0, :]

        oct_k = m >> 3
        ray_oct = (
            (dx > 0).astype(jnp.int32)
            + 2 * (dy > 0).astype(jnp.int32)
            + 4 * (dz > 0).astype(jnp.int32)
        )
        oct_ok = jnp.bitwise_and(jnp.right_shift(oct_k, ray_oct), 1) == 1

        bnx = geom_ref[0, 10, 0]
        bny = geom_ref[0, 11, 0]
        bnz = geom_ref[0, 12, 0]
        bxx = geom_ref[0, 13, 0]
        bxy = geom_ref[0, 14, 0]
        bxz = geom_ref[0, 15, 0]

        def inv(c):
            return 1.0 / jnp.where(jnp.abs(c) < 1e-12, 1e-12, c)

        ix, iy, iz = inv(dx), inv(dy), inv(dz)
        lox, hix = (bnx - ox) * ix, (bxx - ox) * ix
        loy, hiy = (bny - oy) * iy, (bxy - oy) * iy
        loz, hiz = (bnz - oz) * iz, (bxz - oz) * iz
        t0 = jnp.maximum(
            jnp.maximum(jnp.minimum(lox, hix), jnp.minimum(loy, hiy)),
            jnp.minimum(loz, hiz),
        )
        t1 = jnp.minimum(
            jnp.minimum(jnp.maximum(lox, hix), jnp.maximum(loy, hiy)),
            jnp.maximum(loz, hiz),
        )
        entry = jnp.maximum(t0, 0.0)
        useful = (
            oct_ok
            & (t1 >= jnp.maximum(t0, t_min))
            & (t0 <= tmax)
            & (entry < best)
        )
        if any_hit:
            useful = useful & (best >= BIG)

        @pl.when(jnp.any(useful))
        def _mt():
            v0x = geom_ref[0, 0, :][:, None]
            v0y = geom_ref[0, 1, :][:, None]
            v0z = geom_ref[0, 2, :][:, None]
            e1x = geom_ref[0, 3, :][:, None]
            e1y = geom_ref[0, 4, :][:, None]
            e1z = geom_ref[0, 5, :][:, None]
            e2x = geom_ref[0, 6, :][:, None]
            e2y = geom_ref[0, 7, :][:, None]
            e2z = geom_ref[0, 8, :][:, None]
            prim = geom_ref[0, 9, :][:, None]

            rdx, rdy, rdz = dx[None, :], dy[None, :], dz[None, :]
            px = rdy * e2z - rdz * e2y
            py = rdz * e2x - rdx * e2z
            pz = rdx * e2y - rdy * e2x
            det = e1x * px + e1y * py + e1z * pz
            dinv = jnp.where(jnp.abs(det) < 1e-12, 0.0, 1.0 / det)
            tx = ox[None, :] - v0x
            ty = oy[None, :] - v0y
            tz = oz[None, :] - v0z
            u = (tx * px + ty * py + tz * pz) * dinv
            qx = ty * e1z - tz * e1y
            qy = tz * e1x - tx * e1z
            qz = tx * e1y - ty * e1x
            v = (rdx * qx + rdy * qy + rdz * qz) * dinv
            th = (e2x * qx + e2y * qy + e2z * qz) * dinv
            ok = (
                (jnp.abs(det) > 1e-12) & (u >= 0) & (v >= 0) & (u + v <= 1)
                & (th > t_min) & (th < tmax[None, :]) & (prim >= 0)
                & useful[None, :]
            )

            if any_hit:
                found_now = jnp.any(ok, axis=0)
                out_ref[0, 0, :] = jnp.where(found_now, 0.0, best)
            else:
                th = jnp.where(ok, th, BIG)
                slot = jnp.argmin(th, axis=0)
                rows = jax.lax.broadcasted_iota(jnp.int32, (S, R), 0)
                sel = rows == slot[None, :]
                t_best = jnp.min(th, axis=0)
                u_best = jnp.max(jnp.where(sel, u, -BIG), axis=0)
                v_best = jnp.max(jnp.where(sel, v, -BIG), axis=0)

                better = t_best < best
                cid = qc_ref[w].astype(jnp.float32)
                out_ref[0, 0, :] = jnp.where(better, t_best, best)
                out_ref[0, 1, :] = jnp.where(better, slot.astype(jnp.float32), out_ref[0, 1, :])
                out_ref[0, 2, :] = jnp.where(better, u_best, out_ref[0, 2, :])
                out_ref[0, 3, :] = jnp.where(better, v_best, out_ref[0, 3, :])
                out_ref[0, 4, :] = jnp.where(better, cid, out_ref[0, 4, :])


HIER_MIN_C = 1536   # clusters above which candidate prep goes two-level
HIER_KEEP = 96      # superclusters expanded per tile (= 768 child clusters)


def _tile_frustums(rot, rdt, tmt):
    """Per-tile conservative frustums: origin box, t ceiling, per-octant
    sign-clamped inverse-direction boxes, octant presence."""
    live = tmt > 0.0
    o_lo = jnp.min(jnp.where(live[..., None], rot, jnp.inf), axis=1)    # [T,3]
    o_hi = jnp.max(jnp.where(live[..., None], rot, -jnp.inf), axis=1)
    # dead tiles (all padding): collapse to a point far away
    o_lo = jnp.where(jnp.isfinite(o_lo), o_lo, 3e8)
    o_hi = jnp.where(jnp.isfinite(o_hi), o_hi, 3e8)
    t_hi = jnp.max(jnp.where(live, tmt, 0.0), axis=1)                   # [T]

    pos = rdt > 0                                                       # [T,R,3]
    oct_id = (
        pos[..., 0].astype(jnp.int32)
        + 2 * pos[..., 1].astype(jnp.int32)
        + 4 * pos[..., 2].astype(jnp.int32)
    )                                                                   # [T,R]
    in_b = (oct_id[:, None, :] == jnp.arange(8)[None, :, None]) & live[:, None, :]  # [T,8,R]
    dexp = rdt.transpose(0, 2, 1)                                       # [T,3,R]
    sel = in_b[:, :, None, :]                                           # [T,8,1,R]
    d_lo = jnp.min(jnp.where(sel, dexp[:, None], jnp.inf), axis=-1)     # [T,8,3]
    d_hi = jnp.max(jnp.where(sel, dexp[:, None], -jnp.inf), axis=-1)
    present = jnp.any(in_b, axis=-1)                                    # [T,8]

    # sign-clamp the direction box per octant (bit set => component > 0)
    bits = jnp.stack(
        [jnp.arange(8) % 2, (jnp.arange(8) // 2) % 2, jnp.arange(8) // 4], -1
    ).astype(bool)                                                      # [8,3]
    eps = 1e-12
    d_lo = jnp.where(bits[None], jnp.maximum(d_lo, eps), jnp.minimum(d_lo, -eps))
    d_hi = jnp.where(bits[None], jnp.maximum(d_hi, eps), jnp.minimum(d_hi, -eps))
    i_lo = 1.0 / d_hi                                                   # [T,8,3]
    i_hi = 1.0 / d_lo
    return o_lo, o_hi, t_hi, i_lo, i_hi, present


def _frustum_hits(o_lo, o_hi, t_hi, i_lo, i_hi, present, bmin, bmax,
                  t_min: float):
    """Conservative interval slab test of per-tile octant frustums against
    boxes.  bmin/bmax: [T, W, 3] (per-tile candidate boxes) or [1, W, 3]
    (shared).  Returns (hit [T,8,W], t0_lb [T,8,W])."""
    s_lo = (bmin - o_hi[:, None])[:, None]                              # [T,1,W,3]
    s_hi = (bmax - o_lo[:, None])[:, None]
    il = i_lo[:, :, None]                                               # [T,8,1,3]
    ih = i_hi[:, :, None]
    p1, p2, p3, p4 = s_lo * il, s_lo * ih, s_hi * il, s_hi * ih
    p_lo = jnp.minimum(jnp.minimum(p1, p2), jnp.minimum(p3, p4))        # [T,8,W,3]
    p_hi = jnp.maximum(jnp.maximum(p1, p2), jnp.maximum(p3, p4))
    t0_lb = jnp.max(p_lo, axis=-1)                                      # [T,8,W]
    t1_ub = jnp.min(p_hi, axis=-1)
    hit = (
        present[..., None]
        & (t1_ub >= jnp.maximum(t0_lb, t_min))
        & (t0_lb <= t_hi[:, None, None])
    )
    return hit, t0_lb


def _octant_candidates(cm: ClusterMesh, rot, rdt, tmt, t_min: float, k_flat: int):
    """Conservative per-(tile, octant) candidate clusters, merged per tile.

    rot/rdt [T,R,3], tmt [T,R] ->
      cand [T,K] int32 cluster ids (entry-sorted, repeat-padded),
      octs [T,K] int32 owning octant of each candidate,
      counts [T] int32 valid prefix length,
      dropped [T] f32 entry lower bound of the first candidate dropped by
        the budget (inf if none dropped): per-tile exactness bound,
      entries [T,K] f32 conservative entry t of each kept candidate (inf on
        padding) — the queue path uses these to extend the dropped bound
        when its global work budget truncates a tile.

    When C > HIER_MIN_C the test runs TWO-LEVEL: a coarse pass over the
    supercluster union boxes (SC = C/8) picks each tile's HIER_KEEP nearest
    superclusters, whose children (one wide-row gather of cm.child_boxes)
    feed the fine pass — prep stays ~flat in C instead of O(T x 8 x C).
    Conservative: a child box is inside its union box, so a coarse miss is
    a true miss; superclusters cut by the keep budget extend the `dropped`
    exactness bound with their entry lower bound (their children's entries
    can only be larger).
    """
    T_, R, _ = rot.shape
    C = cm.aabb_min.shape[0]

    fr = _tile_frustums(rot, rdt, tmt)
    o_lo, o_hi, t_hi, i_lo, i_hi, present = fr

    sc_dropped = jnp.full((T_,), jnp.inf)
    if C > HIER_MIN_C and cm.sc_min.shape[0] >= 2:
        from .cluster_bvh import SC_GROUP as G

        SC = cm.sc_min.shape[0]
        hit_sc, t0_sc = _frustum_hits(
            *fr, cm.sc_min[None], cm.sc_max[None], t_min
        )                                                               # [T,8,SC]
        entry_sc = jnp.min(
            jnp.where(hit_sc, jnp.maximum(t0_sc, 0.0), jnp.inf), axis=1
        )                                                               # [T,SC]
        KS = min(HIER_KEEP, SC)
        ks_sel = min(KS + 1, SC)
        neg_sc, sidx = jax.lax.top_k(-entry_sc, ks_sel)
        ent_sc = -neg_sc
        if ks_sel > KS:
            sc_full = jnp.isfinite(ent_sc[:, KS - 1])  # kept set saturated
            sc_dropped = jnp.where(sc_full, ent_sc[:, ks_sel - 1], jnp.inf)
        sidx = sidx[:, :KS].astype(jnp.int32)
        cb = cm.child_boxes[sidx]                      # [T,KS,G*6] one gather
        cb = cb.reshape(T_, KS, G, 6)
        bmin = cb[..., 0:3].reshape(T_, KS * G, 3)
        bmax = cb[..., 3:6].reshape(T_, KS * G, 3)
        cids = (sidx[:, :, None] * G + jnp.arange(G)[None, None, :]).reshape(
            T_, KS * G
        )
        # padding children (inverted boxes) would pass the interval slab test
        # with a huge [s_lo, s_hi] span — mask them out by index instead
        valid_child = cids < C
        cids = jnp.minimum(cids, C - 1)
        hit, t0_lb = _frustum_hits(*fr, bmin, bmax, t_min)
        hit = hit & valid_child[:, None, :]
        W = KS * G
    else:
        hit, t0_lb = _frustum_hits(
            *fr, cm.aabb_min[None], cm.aabb_max[None], t_min
        )
        cids = None
        W = C

    entry_b = jnp.where(hit, jnp.maximum(t0_lb, 0.0), jnp.inf)          # [T,8,W]

    # dedup across octants: each cluster appears once per tile, carrying the
    # bitmask of octants whose frustum sees it (the kernel bit-tests rays)
    entry = jnp.min(entry_b, axis=1)                                    # [T,W]
    octmask = jnp.sum(
        jnp.where(hit, jnp.left_shift(1, jnp.arange(8))[None, :, None], 0),
        axis=1,
    ).astype(jnp.int32)                                                 # [T,W]

    K = min(k_flat, W)
    k_sel = min(K + 1, W)
    negm, midx = jax.lax.top_k(-entry, k_sel)
    ent_m = -negm                                                       # [T,k_sel]
    sel_w = midx[:, :K]
    octs = jnp.take_along_axis(octmask, sel_w, axis=1)
    if cids is None:
        cand = sel_w.astype(jnp.int32)
    else:
        cand = jnp.take_along_axis(cids, sel_w, axis=1).astype(jnp.int32)
    finite = jnp.isfinite(ent_m[:, :K])
    counts = jnp.sum(finite, axis=1).astype(jnp.int32)
    dropped = (
        jnp.where(counts == K, ent_m[:, k_sel - 1], jnp.inf)
        if k_sel > K
        else jnp.full((T_,), jnp.inf)
    )
    dropped = jnp.minimum(dropped, sc_dropped)
    # repeat the last valid candidate into the padding so the pipelined DMA
    # revisits the same block (elided copy) instead of fetching junk
    last = jnp.take_along_axis(cand, jnp.clip(counts - 1, 0, K - 1)[:, None], axis=1)
    karange = jnp.arange(K)[None, :]
    cand = jnp.where(karange < counts[:, None], cand, last)
    return cand, octs, counts, dropped, ent_m[:, :K]


def _octant_candidates_blocked(cm: ClusterMesh, rot, rdt, tmt, t_min: float,
                               k_flat: int):
    """_octant_candidates with dead-tile-block skipping.

    The frustum test is O(T x 8 x C) interval arithmetic paid by EVERY tile,
    dead or live — and launches deadened upstream (masked pixels, visibility
    threading, live-lane compaction tails) arrive with their dead rays
    sorted to the tail, i.e. whole trailing tile blocks carry only
    t_max<=0 lanes.  Split the tile axis into static blocks and run each
    under lax.cond on 'any live ray in block': all-dead blocks return
    zero candidates at ~zero cost (cond compiles to a real branch), live
    blocks compute exactly what the unblocked call would — tiles are
    independent in _octant_candidates, so results are identical."""
    T_ = rot.shape[0]
    nb = next((b for b in (8, 4, 2) if T_ % b == 0 and T_ >= 2 * b), 1)
    if nb == 1:
        return _octant_candidates(cm, rot, rdt, tmt, t_min, k_flat)
    tb = T_ // nb
    outs = []
    for b in range(nb):
        sl = slice(b * tb, (b + 1) * tb)
        rot_b, rdt_b, tmt_b = rot[sl], rdt[sl], tmt[sl]

        def run(rot_b=rot_b, rdt_b=rdt_b, tmt_b=tmt_b):
            return _octant_candidates(cm, rot_b, rdt_b, tmt_b, t_min, k_flat)

        def skip(run=run):
            shapes = jax.eval_shape(run)
            zeros = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
            # dropped/entries are 'inf = nothing dropped / padding'
            return zeros[:3] + (jnp.full(shapes[3].shape, jnp.inf),
                                jnp.full(shapes[4].shape, jnp.inf))

        outs.append(jax.lax.cond(jnp.any(tmt_b > 0.0), run, skip))
    return jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *outs)


def _run_queue(cm: ClusterMesh, cand, octs, counts, dropped, entries, rays_cm,
               *, t_min: float, any_hit: bool, S: int, R: int, q_avg: int,
               w_chunk: int = 49152):
    """Execute the candidate work as a FLAT queue of (tile, candidate) pairs.

    The 2-D (tiles, k_cap) grid pays ~0.13 us per fully-skipped step — at
    k_cap=512 on a 655k-ray batch that is ~85 ms of pure skip overhead, and
    tiles deadened by visibility threading (t_max=0) still pay full k_cap.
    Here the grid is exactly the work: per tile, one mandatory init item plus
    its active candidates, budgeted to W_cap = T*q_avg items total (the
    budget clip extends the per-tile `dropped` exactness bound, so
    truncation is still accounted by the uncertain telemetry).

    Queue tables are built scatter+cumsum style (no searchsorted, no scalar
    gathers): segment starts are scattered into a [W] difference array whose
    cumsum yields per-item tile id / segment offset / count.

    Returns (out [T,8,R], dropped [T])."""
    T_, K = cand.shape
    # global work budget: q_avg items per tile on average, floored so small
    # launches (few tiles) always get full per-tile capacity — the queue
    # only needs to be tight when the tile count is large
    W_cap = min(max(T_ * max(q_avg, 1), 16384), T_ * K)
    # pad W_cap to a multiple of the chunk so every chunk has full shape
    n_chunks = -(-W_cap // w_chunk) if W_cap > w_chunk else 1
    W_cap = n_chunks * min(w_chunk, W_cap) if n_chunks > 1 else W_cap
    Wc = W_cap // n_chunks

    counts_q = jnp.maximum(counts, 1)
    # budget clip: the largest UNIFORM per-tile cap whose total fits W_cap
    # (vectorized over all K caps, O(T*K) flops).  Entry-sorted candidates
    # mean each tile keeps its nearest clusters; tiles under the cap donate
    # their slack to crowded ones, so truncation (watched by the dropped
    # bound -> uncertain telemetry) needs BOTH a tight budget and uniformly
    # crowded tiles.
    caps = jnp.arange(1, K + 1)
    fits = jnp.sum(jnp.minimum(counts_q[:, None], caps[None, :]), axis=0) <= W_cap
    cap = jnp.where(jnp.any(fits), 1 + jnp.sum(fits.astype(jnp.int32)) - 1, 1)
    # fits is monotone non-increasing in cap, so #true = largest fitting cap
    counts_adj = jnp.minimum(counts_q, jnp.maximum(cap, 1))
    trunc = counts_adj < counts
    ent_at_cut = jnp.take_along_axis(
        entries, jnp.clip(counts_adj, 0, K - 1)[:, None], axis=1
    )[:, 0]
    dropped = jnp.where(trunc, jnp.minimum(dropped, ent_at_cut), dropped)

    off = jnp.cumsum(counts_adj) - counts_adj          # [T] exclusive
    total = off[-1] + counts_adj[-1]

    # per-item tables via segment-difference cumsums over [W]
    w = jnp.arange(W_cap, dtype=jnp.int32)
    seg_mark = jnp.zeros((W_cap,), jnp.int32).at[off].add(1)
    ti = jnp.cumsum(seg_mark) - 1                      # [W] tile id
    d_off = jnp.concatenate([off[:1], off[1:] - off[:-1]])
    off_at = jnp.cumsum(jnp.zeros((W_cap,), jnp.int32).at[off].add(d_off))
    k = w - off_at                                     # [W] candidate idx
    d_cnt = jnp.concatenate([counts[:1], counts[1:] - counts[:-1]])
    cnt_at = jnp.cumsum(jnp.zeros((W_cap,), jnp.int32).at[off].add(d_cnt))

    validw = w < total
    # tail no-ops pin the LAST real tile's block (keeps it open, no writes;
    # a fresh block opened by a no-op would write back garbage)
    ti_last = ti[jnp.clip(total - 1, 0, W_cap - 1)]
    qt = jnp.where(validw, ti, ti_last).astype(jnp.int32)
    k = jnp.where(validw, k, 0)

    pair = jnp.stack([cand, octs], axis=-1).reshape(T_ * K, 2)
    lin = qt * K + jnp.clip(k, 0, K - 1)
    co = pair[lin]                                     # ONE wide-row gather
    qc = co[:, 0].astype(jnp.int32)
    qo = co[:, 1]

    active = validw & (k < cnt_at)
    fresh = validw & (k == 0)
    meta = (
        fresh.astype(jnp.int32)
        | (active.astype(jnp.int32) << 2)
        | (qo << 3)
    )

    def call(qt_c, qc_c, qm_c, prev):
        nw = qt_c.shape[0]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(nw,),
            in_specs=[
                pl.BlockSpec((1, 16, S), lambda w_, qt_, qc_, qm_: (qc_[w_], 0, 0)),
                pl.BlockSpec((1, 8, R), lambda w_, qt_, qc_, qm_: (qt_[w_], 0, 0)),
                pl.BlockSpec((1, 8, R), lambda w_, qt_, qc_, qm_: (qt_[w_], 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 8, R), lambda w_, qt_, qc_, qm_: (qt_[w_], 0, 0)),
        )
        return pl.pallas_call(
            functools.partial(
                _queue_kernel, t_min=t_min, any_hit=any_hit, S=S, R=R
            ),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((T_, 8, R), jnp.float32),
            interpret=_interpret(),
        )(qt_c, qc_c, qm_c, cm.geom_cm, rays_cm, prev)

    if n_chunks == 1:
        return call(qt, qc, meta, jnp.zeros((T_, 8, R), jnp.float32)), dropped

    outs = []
    prev = jnp.zeros((T_, 8, R), jnp.float32)
    for c in range(n_chunks):
        s0 = c * Wc
        meta_c = meta[s0:s0 + Wc]
        if c > 0:
            # chunk's first item continues a tile mid-stream: restore its
            # running state from the previous chunk's output
            cont = (k[s0] > 0) & validw[s0]
            meta_c = meta_c.at[0].set(
                meta_c[0] | (cont.astype(jnp.int32) << 1)
            )
        # chunks entirely past the real work are all no-ops: lax.cond skips
        # the whole pallas_call (W_cap is a static budget, `total` is the
        # runtime item count — sparse launches stop dispatching at the tail).
        # A skipped chunk touches no tile, and `lc` below never selects it.
        prev = jax.lax.cond(
            s0 < total,
            lambda qt_c, qc_c, qm_c, pv: call(qt_c, qc_c, qm_c, pv),
            lambda qt_c, qc_c, qm_c, pv: pv,
            qt[s0:s0 + Wc], qc[s0:s0 + Wc], meta_c, prev,
        )
        outs.append(prev)
    # a tile's final state lives in the LAST chunk that touched it
    lc = (off + counts_adj - 1) // Wc                   # [T]
    stacked = jnp.stack(outs)                           # [n_chunks, T, 8, R]
    out = jnp.take_along_axis(stacked, lc[None, :, None, None], axis=0)[0]
    return out, dropped


class TileTraceOut(NamedTuple):
    hit: HitResult
    uncertain: jnp.ndarray  # [N] bool: hit may lie in a dropped candidate


def tile_trace(
    cm: ClusterMesh,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    t_min: float = 1e-4,
    t_max=1e10,
    any_hit: bool = False,
    k_cap: int = 128,
    tile: int = R_TILE,
    sort_octants: bool = False,
    sort_block: int = 4096,
    queue: bool = True,
    queue_avg: int = 64,
) -> TileTraceOut:
    """Trace via tile-coherent candidate streaming.  Requires S % 128 == 0.

    queue: execute candidates as a flat work queue (grid = active work, no
    skipped-step overhead; see _run_queue) with a global budget of
    queue_avg items per tile on average.  queue=False runs the dense
    (tiles, k_cap) grid.

    sort_octants: reorder rays before tiling so each tile's candidate union
    shrinks (~1 ms for 655k rays via lax.sort_key_val + one wide-row gather).
    Results are unpermuted before returning.
      True / "block": block-local direction-octant sort (preserves the ray
        stream's own origin locality within sort_block-ray blocks) — ~2.7x
        for direction-incoherent batches.
      "morton": GLOBAL (octant, origin-morton-cell) key — direction-major,
        origin-minor.  For batches whose origins are scattered (bounce-hit
        NEE shadows, cross-visibility rays) this gives every tile a single
        octant AND a compact origin box, so the conservative frustum test
        admits far fewer clusters."""
    N = rays_o.shape[0]
    C, S = cm.prim.shape
    R = tile
    t_max_arr = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (N,)).astype(jnp.float32)

    inv_perm = None
    if sort_octants and N > R:
        oct_id = (
            (rays_d[:, 0] > 0).astype(jnp.int32)
            + 2 * (rays_d[:, 1] > 0).astype(jnp.int32)
            + 4 * (rays_d[:, 2] > 0).astype(jnp.int32)
        )
        # dead-lane compaction: rays deadened upstream (t_max <= 0: masked
        # pixels, visibility-threaded/deduped lanes) sort to the TAIL so they
        # fill all-dead tiles (zero candidates, ~1 no-op queue item each)
        # instead of diluting live tiles' frustums
        dead = t_max_arr <= 0.0
        if sort_octants == "dir":
            # direction-morton: 32^3 cells of the direction cube.  For
            # single-origin (pinhole) launches this is 2-D image locality —
            # raster-order tiles span the full image width and admit most of
            # the mesh into every tile's frustum; direction-local tiles get
            # a razor-thin cone (origin box is a point) so the candidate
            # set collapses to the clusters actually under those pixels.
            from .morton import morton3d

            cd = jnp.clip(((rays_d * 0.5 + 0.5) * 32.0).astype(jnp.int32), 0, 31)
            key = morton3d(cd).astype(jnp.int32)
            key = jnp.where(dead, jnp.int32(1) << 26, key)
        elif sort_octants in ("morton", "morton_dir2"):
            from .morton import morton3d

            lo = jnp.min(cm.aabb_min, axis=0)
            hi = jnp.max(cm.aabb_max, axis=0)
            cell = jnp.clip(
                ((rays_o - lo) / jnp.maximum(hi - lo, 1e-6) * 32.0).astype(jnp.int32),
                0, 31,
            )
            # "morton": (octant, origin-cell) — the optimum for batches whose
            # directions spread over the sphere (bounce closest-hits): finer
            # direction keys scatter origins across tiles and the origin-box
            # growth swamps the direction-box win (measured 2x WORSE on
            # uniform-sphere batches, r3 v5e).
            # "morton_dir2": (octant, 2-bit sub-direction sector, origin-cell)
            # — for CONCENTRATED direction batches (ReSTIR winner
            # cross-visibility, env-importance NEE shadows toward bright
            # texels): the dominant direction cone collapses into a few
            # sectors with razor-thin per-tile direction boxes (measured
            # 1.8x on a 70%-sun-cone cross-vis-shaped batch, r3 v5e).
            key = oct_id * (1 << 15) + morton3d(cell).astype(jnp.int32)
            if sort_octants == "morton_dir2":
                ad = jnp.abs(rays_d)
                axm = jnp.argmax(ad, axis=1)                      # major axis
                major = jnp.take_along_axis(ad, axm[:, None], 1)[:, 0]
                c1 = jnp.take_along_axis(rays_d, ((axm + 1) % 3)[:, None], 1)[:, 0]
                c2 = jnp.take_along_axis(rays_d, ((axm + 2) % 3)[:, None], 1)[:, 0]
                inv_m = 1.0 / jnp.maximum(major, 1e-6)
                q1 = jnp.clip(((c1 * inv_m + 1.0) * 2.0).astype(jnp.int32), 0, 3)
                q2 = jnp.clip(((c2 * inv_m + 1.0) * 2.0).astype(jnp.int32), 0, 3)
                sub = (q1 * 4 + q2).astype(jnp.int32)   # 16 sectors (measured
                # optimum; 256 sectors over-fragments the origin boxes)
                key = oct_id * (1 << 19) + sub * (1 << 15) + morton3d(cell).astype(jnp.int32)
            key = jnp.where(dead, jnp.int32(1) << 26, key)
        else:
            blk = jnp.arange(N, dtype=jnp.int32) // sort_block
            key = blk * 16 + jnp.where(dead, 8, oct_id)
        _, perm = jax.lax.sort_key_val(key, jnp.arange(N, dtype=jnp.int32))
        rays_o = rays_o[perm]
        rays_d = rays_d[perm]
        t_max_arr = t_max_arr[perm]
        _, inv_perm = jax.lax.sort_key_val(perm, jnp.arange(N, dtype=jnp.int32))

    pad = (-N) % R
    Np = N + pad
    ro = jnp.concatenate([rays_o.astype(jnp.float32), jnp.zeros((pad, 3))])
    rd = jnp.concatenate([rays_d.astype(jnp.float32), jnp.ones((pad, 3))])
    tm = jnp.concatenate([t_max_arr, jnp.zeros((pad,))])  # padding never hits

    n_tiles = Np // R
    rot = ro.reshape(n_tiles, R, 3)
    rdt = rd.reshape(n_tiles, R, 3)
    tmt = tm.reshape(n_tiles, R)

    cand, octs, counts, dropped, entries = _octant_candidates_blocked(
        cm, rot, rdt, tmt, t_min, k_cap
    )
    K = cand.shape[1]

    rays_cm = jnp.zeros((n_tiles, 8, R), jnp.float32)
    rays_cm = rays_cm.at[:, 0:3, :].set(rot.transpose(0, 2, 1))
    rays_cm = rays_cm.at[:, 3:6, :].set(rdt.transpose(0, 2, 1))
    rays_cm = rays_cm.at[:, 6, :].set(tmt)

    if queue:
        out, dropped = _run_queue(
            cm, cand, octs, counts, dropped, entries, rays_cm,
            t_min=t_min, any_hit=any_hit, S=S, R=R,
            q_avg=queue_avg,
        )
    else:
        def call(cand_c, octs_c, counts_c, rays_c):
            nt = cand_c.shape[0]
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=3,
                grid=(nt, K),
                in_specs=[
                    pl.BlockSpec((1, 16, S), lambda ti, k, cand, octs, counts: (cand[ti, k], 0, 0)),
                    pl.BlockSpec((1, 8, R), lambda ti, k, cand, octs, counts: (ti, 0, 0)),
                ],
                out_specs=pl.BlockSpec((1, 8, R), lambda ti, k, cand, octs, counts: (ti, 0, 0)),
            )
            return pl.pallas_call(
                functools.partial(_kernel, t_min=t_min, any_hit=any_hit, S=S, R=R),
                grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((nt, 8, R), jnp.float32),
                interpret=_interpret(),
            )(cand_c, octs_c, counts_c, cm.geom_cm, rays_c)

        # scalar-prefetch tables live in SMEM (~1 MB): chunk the tile axis so
        # cand+octs+counts stay well under budget for huge ray batches
        tiles_chunk = max(8, 49152 // max(K, 1))
        if n_tiles <= tiles_chunk:
            out = call(cand, octs, counts, rays_cm)
        else:
            outs = []
            for s0 in range(0, n_tiles, tiles_chunk):
                e0 = min(s0 + tiles_chunk, n_tiles)
                outs.append(call(cand[s0:e0], octs[s0:e0], counts[s0:e0], rays_cm[s0:e0]))
            out = jnp.concatenate(outs, axis=0)

    best_t = out[:, 0, :].reshape(Np)[:N]
    found = best_t < BIG * 0.5

    if any_hit:
        # occlusion contract: only prim >= 0 matters; no attribute resolve
        hit = HitResult(
            t=jnp.where(found, best_t, jnp.inf),
            prim=jnp.where(found, 0, -1),
            u=jnp.zeros((N,)),
            v=jnp.zeros((N,)),
            normal=jnp.zeros((N, 3)),
        )
    else:
        best_slot = out[:, 1, :].reshape(Np)[:N].astype(jnp.int32)
        best_cid = out[:, 4, :].reshape(Np)[:N].astype(jnp.int32)
        best_lin = best_cid * S + best_slot
        u = out[:, 2, :].reshape(Np)[:N]
        v = out[:, 3, :].reshape(Np)[:N]
        best_t = jnp.where(found, best_t, jnp.inf)
        best_t = jnp.where(best_t <= t_max_arr, best_t, jnp.inf)
        best_lin = jnp.clip(best_lin, 0, cm.soa.shape[1] - 1)
        hit = _finish(cm, best_lin, best_t, u, v, t_max_arr)

    per_ray_dropped = jnp.repeat(dropped, R)[:N]
    uncertain = jnp.where(
        jnp.isfinite(per_ray_dropped),
        jnp.where(jnp.isfinite(hit.t), hit.t, jnp.minimum(t_max_arr, BIG))
        > per_ray_dropped,
        False,
    )
    if inv_perm is not None:
        # un-permute all fields with ONE wide-row gather
        packed_res = jnp.concatenate(
            [
                hit.t[:, None], hit.prim.astype(jnp.float32)[:, None],
                hit.u[:, None], hit.v[:, None], hit.normal,
                uncertain.astype(jnp.float32)[:, None],
            ],
            axis=1,
        )[inv_perm]
        hit = HitResult(
            t=packed_res[:, 0], prim=packed_res[:, 1].astype(jnp.int32),
            u=packed_res[:, 2], v=packed_res[:, 3], normal=packed_res[:, 4:7],
        )
        uncertain = packed_res[:, 7] > 0.5
    return TileTraceOut(hit=hit, uncertain=uncertain)


def intersect_tiles_t(
    cm: ClusterMesh,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    t_min: float = 1e-4,
    t_max=1e10,
    any_hit: bool = False,
    k_cap: int = 128,
    tile: int = R_TILE,
    dense_threshold: int = 8192,
    sort_octants: bool = False,
    queue: bool = True,
    queue_avg: int = 64,
) -> TileTraceOut:
    """TileTraceOut-contract wrapper with exactness telemetry: dense pass for
    small meshes (exact -> uncertain all-False), tile trace otherwise."""
    N = rays_o.shape[0]
    C, S = cm.prim.shape
    t_max_arr = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (N,))
    if C * S <= dense_threshold or C == 1 or S % 128 != 0:
        hit = _intersect_dense(cm, rays_o, rays_d, t_min, t_max_arr)
        return TileTraceOut(hit=hit, uncertain=jnp.zeros((N,), bool))
    return tile_trace(
        cm, rays_o, rays_d, t_min=t_min, t_max=t_max, any_hit=any_hit,
        k_cap=k_cap, tile=tile, sort_octants=sort_octants,
        queue=queue, queue_avg=queue_avg,
    )


def intersect_tiles(
    cm: ClusterMesh,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    t_min: float = 1e-4,
    t_max=1e10,
    any_hit: bool = False,
    k_cap: int = 128,
    tile: int = R_TILE,
    dense_threshold: int = 8192,
    sort_octants: bool = False,
    queue: bool = True,
    queue_avg: int = 64,
) -> HitResult:
    """HitResult-contract wrapper: dense pass for small meshes, tile trace
    otherwise (same dispatch shape as cluster_bvh.intersect_clusters)."""
    return intersect_tiles_t(
        cm, rays_o, rays_d, t_min=t_min, t_max=t_max, any_hit=any_hit,
        k_cap=k_cap, tile=tile, dense_threshold=dense_threshold,
        sort_octants=sort_octants, queue=queue, queue_avg=queue_avg,
    ).hit


def occluded_tiles_t(
    cm: ClusterMesh,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    t_max,
    t_min: float = 1e-4,
    k_cap: int = 128,
    tile: int = R_TILE,
    dense_threshold: int = 8192,
    sort_octants: bool = False,
    queue: bool = True,
    queue_avg: int = 64,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    res = intersect_tiles_t(
        cm, rays_o, rays_d, t_min=t_min, t_max=t_max, any_hit=True,
        k_cap=k_cap, tile=tile, dense_threshold=dense_threshold,
        sort_octants=sort_octants, queue=queue, queue_avg=queue_avg,
    )
    return res.hit.prim >= 0, res.uncertain


def occluded_tiles(
    cm: ClusterMesh,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    t_max,
    t_min: float = 1e-4,
    k_cap: int = 128,
    tile: int = R_TILE,
    dense_threshold: int = 8192,
    sort_octants: bool = False,
    queue: bool = True,
    queue_avg: int = 64,
) -> jnp.ndarray:
    return occluded_tiles_t(
        cm, rays_o, rays_d, t_max, t_min=t_min, k_cap=k_cap, tile=tile,
        dense_threshold=dense_threshold, sort_octants=sort_octants,
        queue=queue, queue_avg=queue_avg,
    )[0]
