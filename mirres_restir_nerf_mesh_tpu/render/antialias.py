"""Silhouette antialiasing with vertex gradients (nvdiffrast `antialias`).

Re-implements the gradient semantics of `dr.antialias` as used by the
reference (`nerf/renderer.py:1182-1206`, `pos_gradient_boost`): the ONLY
gradient path that moves vertices across pixel boundaries, required for the
mask/rgb losses to refine silhouettes (SURVEY.md §7 hard-part 2).

nvdiffrast's algorithm, adapted from clip space to ray space:
  - for every horizontal/vertical pixel pair straddling a coverage boundary
    (hit XOR miss), take the hit pixel's triangle and re-evaluate
    Moeller-Trumbore *differentiably* for BOTH pixel rays against it;
  - the miss ray's barycentrics have a negative coordinate k (the crossing
    edge is the one opposite vertex k, matching nvdiffrast's edge pick);
  - the silhouette crosses the segment between the two pixel centers at
    s = w_hit[k] / (w_hit[k] - w_miss[k])  (where the k-th barycentric hits
    zero) — s is differentiable w.r.t. the triangle's vertices;
  - coverage blending (one pixel per pair adjusted, like nvdiffrast):
      s < 1/2: the hit pixel loses (1/2 - s) of its value toward the miss
               pixel's value;
      s > 1/2: the miss pixel gains (s - 1/2) of the hit pixel's value.
  - `pos_gradient_boost` scales only the gradient through s.

The discrete structure (which pairs, which triangle, which edge) is
stop-gradient; only s carries vertex gradients.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp


def mt_bary(o, d, v0, v1, v2, eps: float = 1e-12):
    """Differentiable Moeller-Trumbore barycentrics (w1=u, w2=v) of a ray
    against a per-pixel triangle.  All inputs [N,3]."""
    e1 = v1 - v0
    e2 = v2 - v0
    p = jnp.cross(d, e2)
    det = jnp.sum(e1 * p, axis=-1)
    inv = jnp.where(jnp.abs(det) < eps, 0.0, 1.0 / jnp.where(jnp.abs(det) < eps, 1.0, det))
    tvec = o - v0
    u = jnp.sum(tvec * p, axis=-1) * inv
    q = jnp.cross(tvec, e1)
    v = jnp.sum(d * q, axis=-1) * inv
    ok = jnp.abs(det) > eps
    return u, v, ok


def _pair_blend(
    s: jnp.ndarray,            # [P] crossing param, 0 at hit px, 1 at miss px
    active: jnp.ndarray,       # [P] boundary-pair mask
    hit_is_a: jnp.ndarray,     # [P] True when A is the covered pixel
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-pair blend weights: (blend_a, blend_b) where blend_x is the
    fraction of the OTHER pixel's value mixed into pixel x."""
    lose = jnp.clip(0.5 - s, 0.0, 0.5)   # hit pixel loses when edge is near it
    gain = jnp.clip(s - 0.5, 0.0, 0.5)   # miss pixel gains when edge crosses over
    blend_hit = jnp.where(active, lose, 0.0)
    blend_miss = jnp.where(active, gain, 0.0)
    blend_a = jnp.where(hit_is_a, blend_hit, blend_miss)
    blend_b = jnp.where(hit_is_a, blend_miss, blend_hit)
    return blend_a, blend_b


def _crossing(o_a, d_a, o_b, d_b, v0, v1, v2, mask_a, mask_b, boost: float):
    """[P]-vector crossing parameter for pixel pairs (A,B); triangle data must
    already be the HIT pixel's triangle."""
    sg = jax.lax.stop_gradient
    hit_is_a = mask_a
    active = jnp.logical_xor(mask_a, mask_b)

    o_hit = jnp.where(hit_is_a[:, None], o_a, o_b)
    d_hit = jnp.where(hit_is_a[:, None], d_a, d_b)
    o_miss = jnp.where(hit_is_a[:, None], o_b, o_a)
    d_miss = jnp.where(hit_is_a[:, None], d_b, d_a)

    u_h, v_h, ok_h = mt_bary(o_hit, d_hit, v0, v1, v2)
    u_m, v_m, ok_m = mt_bary(o_miss, d_miss, v0, v1, v2)
    w_h = jnp.stack([1.0 - u_h - v_h, u_h, v_h], axis=-1)   # [P,3]
    w_m = jnp.stack([1.0 - u_m - v_m, u_m, v_m], axis=-1)

    # crossing edge = opposite the miss point's most negative barycentric
    k = sg(jnp.argmin(w_m, axis=-1))
    wh_k = jnp.take_along_axis(w_h, k[:, None], axis=-1)[:, 0]
    wm_k = jnp.take_along_axis(w_m, k[:, None], axis=-1)[:, 0]

    denom = wh_k - wm_k
    good = active & ok_h & ok_m & (sg(denom) > 1e-9) & (sg(wh_k) >= 0) & (sg(wm_k) <= 0)
    s = wh_k / jnp.where(sg(denom) > 1e-9, denom, 1.0)
    s = jnp.clip(s, 0.0, 1.0)
    if boost != 1.0:
        s = sg(s) + boost * (s - sg(s))
    return s, good, hit_is_a


def antialias(
    buffers: Dict[str, jnp.ndarray],   # {name: [HW, C]} color-like buffers
    mask: jnp.ndarray,                 # [HW] bool coverage
    tri_verts: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray],  # per-pixel [HW,3]
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    H: int,
    W: int,
    boost: float = 1.0,
) -> Tuple[Dict[str, jnp.ndarray], jnp.ndarray]:
    """Returns (antialiased buffers, soft mask [HW] in [0,1])."""
    v0, v1, v2 = tri_verts

    def to2(x):
        return x.reshape(H, W, -1)

    m2 = mask.reshape(H, W)
    o2, d2 = to2(rays_o), to2(rays_d)
    tv = [to2(v) for v in (v0, v1, v2)]

    mask_f = mask.astype(jnp.float32).reshape(H, W)
    out = {n: to2(b) for n, b in buffers.items()}

    for axis in (1, 0):  # horizontal pairs then vertical pairs
        if axis == 1:
            sl_a = (slice(None), slice(0, W - 1))
            sl_b = (slice(None), slice(1, W))
        else:
            sl_a = (slice(0, H - 1), slice(None))
            sl_b = (slice(1, H), slice(None))

        ma, mb = m2[sl_a].reshape(-1), m2[sl_b].reshape(-1)
        hit_is_a = ma

        def pick(x2):
            a = x2[sl_a].reshape(-1, x2.shape[-1])
            b = x2[sl_b].reshape(-1, x2.shape[-1])
            return a, b

        oa, ob = pick(o2)
        da, db = pick(d2)
        tv_hit = [
            jnp.where(hit_is_a[:, None], a, b) for a, b in (pick(t) for t in tv)
        ]
        s, good, hit_a = _crossing(oa, da, ob, db, *tv_hit, ma, mb, boost)
        blend_a, blend_b = _pair_blend(s, good, hit_a)

        shape_pairs = m2[sl_a].shape

        def apply(x2, xa=None, xb=None):
            # Accumulate per-pair deltas (nvdiffrast semantics): sl_a and sl_b
            # overlap on interior pixels, so .set() of one pair's result would
            # silently discard the other pair's contribution to the shared
            # pixel (left/top element of its pair).  add() keeps both.
            a = x2[sl_a].reshape(-1, x2.shape[-1])
            b = x2[sl_b].reshape(-1, x2.shape[-1])
            da_ = blend_a[:, None] * (b - a)
            db_ = blend_b[:, None] * (a - b)
            x2 = x2.at[sl_a].add(da_.reshape(shape_pairs + (x2.shape[-1],)))
            x2 = x2.at[sl_b].add(db_.reshape(shape_pairs + (x2.shape[-1],)))
            return x2

        for n in out:
            out[n] = apply(out[n])
        mask_f = apply(mask_f[..., None])[..., 0]

    flat = {n: b.reshape(mask.shape[0], -1) for n, b in out.items()}
    return flat, jnp.clip(mask_f.reshape(-1), 0.0, 1.0)
