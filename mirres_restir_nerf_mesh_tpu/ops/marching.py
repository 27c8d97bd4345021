"""Occupancy-accelerated ray marching + volume compositing, TPU-native.

Replaces the reference CUDA two-pass dynamic marcher and compositor
(`raymarching/src/raymarching.cu:338-710`, `kernel_march_rays_train`,
`kernel_composite_rays_train_forward/_backward`) with a static-shape design:

1. Generate a fixed lattice of S candidate sample positions along each ray
   (dt from the same schedule: dt = clamp(t*dt_gamma, dt_min, dt_max) with
   dt_min = 2*sqrt(3)/max_steps, dt_max = 2*sqrt(3)*bound/H).
2. Gather occupancy for every candidate (row-major uint8 volume, per-cascade
   mip selection like `mip_from_pos`/`mip_from_dt`).
3. Compact the occupied candidates into a fixed [N, K] sample buffer with a
   per-ray *stride* so that rays crossing more than K occupied cells are
   subsampled uniformly (dt scaled by the stride) instead of truncated —
   the XLA-friendly replacement for CUDA dynamic allocation.
4. Composite with an exclusive cumulative product of transmittance; gradients
   to sigma/rgb come from autodiff (no hand-written backward).

All shapes static: jit compiles once per (N, S, K).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

SQRT3 = math.sqrt(3.0)


def near_far_from_aabb(
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    aabb: jnp.ndarray,
    min_near: float = 0.05,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Slab test (reference raymarching.cu:92-160 kernel_near_far_from_aabb).

    aabb: [6] = (xmin, ymin, zmin, xmax, ymax, zmax). Returns nears, fars [N].
    Rays that miss get near > far (caller masks on nears < fars).
    """
    inv_d = 1.0 / jnp.where(jnp.abs(rays_d) < 1e-15, 1e-15, rays_d)
    t0 = (aabb[None, 0:3] - rays_o) * inv_d
    t1 = (aabb[None, 3:6] - rays_o) * inv_d
    tmin = jnp.minimum(t0, t1).max(axis=-1)
    tmax = jnp.maximum(t0, t1).min(axis=-1)
    near = jnp.maximum(tmin, min_near)
    far = jnp.maximum(tmax, near + 1e-6)
    miss = (tmax < tmin) | (tmax < min_near)
    near = jnp.where(miss, 1e10, near)
    far = jnp.where(miss, 1e10, far)
    return near, far


class MarchResult(NamedTuple):
    xyzs: jnp.ndarray   # [N, K, 3] sample positions (clamped to bound)
    dirs: jnp.ndarray   # [N, 3]   ray dirs (unnormalized scale as input)
    ts: jnp.ndarray     # [N, K]   sample t values
    dts: jnp.ndarray    # [N, K]   per-sample step size (stride-scaled)
    valid: jnp.ndarray  # [N, K]   bool


def _candidate_ts(
    nears: jnp.ndarray,
    S: int,
    dt_min: float,
    dt_max: float,
    dt_gamma: float,
    noise: Optional[jnp.ndarray],
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Candidate t lattice [N, S] and per-candidate dt [N, S]."""
    if noise is None:
        t0 = nears
    else:
        t0 = nears + jnp.clip(nears * dt_gamma, dt_min, dt_max) * noise

    if dt_gamma == 0.0:
        steps = jnp.arange(S, dtype=jnp.float32)
        ts = t0[:, None] + steps[None, :] * dt_min
        dts = jnp.full_like(ts, dt_min)
    else:
        # geometric-ish schedule: iterate t_{i+1} = t_i + clamp(t_i*g, lo, hi)
        def body(t, _):
            dt = jnp.clip(t * dt_gamma, dt_min, dt_max)
            return t + dt, (t, dt)

        _, (ts_s, dts_s) = jax.lax.scan(body, t0, None, length=S)
        ts, dts = ts_s.T, dts_s.T
    return ts, dts


def _occupancy_at(
    occ: jnp.ndarray,      # [C, H, H, H] uint8
    pts: jnp.ndarray,      # [..., 3] world positions
    dts: jnp.ndarray,      # [...] step sizes (for mip_from_dt)
    bound: float,
) -> jnp.ndarray:
    """Occupancy lookup with cascade selection (raymarching.cu:42-54)."""
    C, H = occ.shape[0], occ.shape[1]
    pts = jnp.clip(pts, -bound, bound)
    if C == 1:
        # single-cascade fast path: level is identically 0 (both mip
        # selectors clip to C-1), so the per-candidate log2/ceil level math
        # — ~10 ms on an 8192x1024 lattice — drops out exactly
        mip_bound = min(1.0, bound)
        g = jnp.clip(((pts / mip_bound) * 0.5 + 0.5) * H, 0, H - 1).astype(jnp.int32)
        flat = (g[..., 0] * H + g[..., 1]) * H + g[..., 2]
        return jnp.take(occ.reshape(-1), flat.reshape(-1), axis=0).reshape(flat.shape) > 0
    mag = jnp.max(jnp.abs(pts), axis=-1)

    # mip_from_pos: smallest level whose bound 2^l contains the point
    lvl_pos = jnp.ceil(jnp.log2(jnp.maximum(mag, 1e-8))).astype(jnp.int32)
    lvl_pos = jnp.clip(lvl_pos, 0, C - 1)
    # mip_from_dt: level whose cell size covers dt
    lvl_dt = jnp.ceil(jnp.log2(jnp.maximum(dts * H / (2.0 * SQRT3), 1e-8))).astype(jnp.int32)
    lvl_dt = jnp.clip(lvl_dt, 0, C - 1)
    level = jnp.maximum(lvl_pos, lvl_dt)

    mip_bound = jnp.minimum(2.0 ** level.astype(jnp.float32), bound)
    g = jnp.clip(
        ((pts / mip_bound[..., None]) * 0.5 + 0.5) * H, 0, H - 1
    ).astype(jnp.int32)
    flat = ((level * H + g[..., 0]) * H + g[..., 1]) * H + g[..., 2]
    return jnp.take(occ.reshape(-1), flat.reshape(-1), axis=0).reshape(flat.shape) > 0


def _pack_occ_supercells(occ3: jnp.ndarray) -> jnp.ndarray:
    """Pack a [H,H,H] uint8 occupancy volume into 8x8x8-cell supercell
    bitmask rows: [G^3, 64] (G = H//8), where row sc holds the supercell's
    512 cells as 64 byte-values (byte index = lx*8+ly, bit index = lz).
    Returned as bfloat16 (values <= 255 are exact) so the per-candidate
    selection contractions below run on the MXU in bf16."""
    H = occ3.shape[0]
    G = H // 8
    bits = (occ3 > 0).reshape(G, 8, G, 8, G, 8)
    bits = bits.transpose(0, 2, 4, 1, 3, 5).reshape(G * G * G, 64, 8)
    pow2 = jnp.asarray([1, 2, 4, 8, 16, 32, 64, 128], jnp.float32)
    return jnp.einsum(
        "rbz,z->rb", bits.astype(jnp.float32), pow2
    ).astype(jnp.bfloat16)


def _occupancy_march_sc(
    occ3: jnp.ndarray,   # [H, H, H] uint8 (single cascade)
    g: jnp.ndarray,      # [N, S, 3] int32 grid coords (monotone per ray)
) -> jnp.ndarray:
    """Occupancy test for a monotone candidate lattice via supercell-bitmask
    rows + MXU one-hot selection — the TPU-native replacement for 7.4M
    random single-cell gathers (~8 ns/row each, ~90 ms at 8192x909 on v5e;
    this path is ~15 ms).

    Along each ray the 8x8x8-supercell coordinate is monotone per axis, so
    the crossing ordinal j(i) = sum_a |sc_a(i) - sc_a(0)| is monotone and
    j(i) == j(i') implies the same supercell; with grid coords clipped to
    [0, H) it is bounded by B = 3*(H//8 - 1) + 1 crossings.  The pipeline:

      1. one-hot(ordinal) x first-candidate mask --MXU--> the <= B distinct
         supercell ids per ray (hi/lo byte split keeps bf16 exact),
      2. ONE wide row gather per (ray, ordinal): [N, B] rows of 64 bytes
         (vs [N, S] single cells — gathers are row-priced, width is free),
      3. one-hot(ordinal) x gathered rows --MXU--> each candidate's 64-byte
         mask row, one-hot(byte) reduce -> its byte, shift/mask -> its bit.

    Every contraction has at most one nonzero per output (one-hot against a
    monotone ordinal), so bf16 is exact end-to-end.  Gradients: none (the
    result is a boolean mask)."""
    H = occ3.shape[0]
    G = H // 8
    N, S = g.shape[0], g.shape[1]
    B = 3 * (G - 1) + 2  # distinct-supercell capacity (clip bound, +1 slack)

    rows = _pack_occ_supercells(occ3)                    # [G^3, 64] bf16

    sc = g >> 3                                          # [N,S,3] in [0,G)
    sc_id = (sc[..., 0] * G + sc[..., 1]) * G + sc[..., 2]
    j = jnp.sum(jnp.abs(sc - sc[:, :1, :]), axis=-1)     # [N,S] ordinal
    first = jnp.concatenate(
        [jnp.ones((N, 1), bool), j[:, 1:] > j[:, :-1]], axis=1
    )

    iota_b = jax.lax.broadcasted_iota(jnp.int32, (N, S, B), 2)
    onehot = (j[..., None] == iota_b).astype(jnp.bfloat16)       # [N,S,B]

    # 1. distinct supercell ids per ordinal (hi/lo bytes ride bf16 exactly)
    id_hl = jnp.stack([sc_id >> 8, sc_id & 0xFF], axis=-1).astype(jnp.bfloat16)
    table_hl = jnp.einsum(
        "nsb,nsv->nbv", onehot * first[..., None].astype(jnp.bfloat16), id_hl
    )                                                            # [N,B,2]
    table_id = (
        table_hl[..., 0].astype(jnp.int32) * 256
        + table_hl[..., 1].astype(jnp.int32)
    )

    # 2. one wide row gather per (ray, ordinal)
    got = rows[table_id.reshape(-1)].reshape(N, B, 64)           # [N,B,64] bf16

    # 3. candidate's 64-byte row, then byte, then bit
    cand_rows = jnp.einsum("nsb,nbw->nsw", onehot, got)          # [N,S,64] bf16
    byte_idx = (g[..., 0] & 7) * 8 + (g[..., 1] & 7)             # [N,S]
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (N, S, 64), 2)
    byte_val = jnp.sum(
        jnp.where(byte_idx[..., None] == iota_w, cand_rows, 0), axis=-1
    ).astype(jnp.float32)                                        # [N,S] < 256
    shift = jnp.exp2((g[..., 2] & 7).astype(jnp.float32))
    return jnp.floor(byte_val / shift) % 2.0 >= 1.0


def march_rays(
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    occ: jnp.ndarray,
    nears: jnp.ndarray,
    fars: jnp.ndarray,
    bound: float,
    K: int = 64,
    max_steps: int = 1024,
    dt_gamma: float = 0.0,
    perturb_key: Optional[jax.Array] = None,
    contract: bool = False,
    n_candidates: Optional[int] = None,
) -> MarchResult:
    """March N rays through the occupancy grid into a fixed [N, K] sample set.

    Candidates beyond `far` or in unoccupied cells are masked; occupied
    candidates are compacted to the front with per-ray uniform striding when
    their count exceeds K.

    `n_candidates` caps the candidate-lattice length S below max_steps
    WITHOUT changing the dt schedule (dt_min stays 2*sqrt(3)/max_steps).
    Candidates at t >= far are masked anyway, so any n_candidates >=
    ceil(max_ray_span / dt_min) + 1 is EXACT — callers that know the scene's
    maximum [near, far) span (see train/stage0.py march_candidates_for) use
    this to skip the ~60% of occupancy gathers a camera outside the AABB
    wastes on beyond-far lattice slots (the dominant stage-0 cost on TPU:
    the reference CUDA marcher terminates its per-ray while loop at `far`,
    raymarching.cu:338-498, so it never pays these)."""
    N = rays_o.shape[0]
    S = max_steps if n_candidates is None else min(n_candidates, max_steps)
    K = min(K, S)  # can't emit more samples than lattice candidates
    H = occ.shape[1]
    dt_min = 2.0 * SQRT3 / max_steps
    dt_max = 2.0 * SQRT3 * bound / H

    noise = None
    if perturb_key is not None:
        noise = jax.random.uniform(perturb_key, (N,))

    ts, dts = _candidate_ts(nears, S, dt_min, dt_max, dt_gamma, noise)  # [N,S]

    pts = rays_o[:, None, :] + rays_d[:, None, :] * ts[..., None]  # [N,S,3]
    inside = ts < fars[:, None]
    if occ.shape[0] == 1 and H % 8 == 0 and H >= 16:
        # single-cascade supercell-bitmask fast path (exact): the candidate
        # lattice is monotone along each ray, so the per-candidate occupancy
        # bit rides one wide supercell-row gather per crossing instead of a
        # random single-cell gather per candidate (see _occupancy_march_sc)
        mip_bound = min(1.0, bound)
        pc = jnp.clip(pts, -bound, bound)
        g = jnp.clip(((pc / mip_bound) * 0.5 + 0.5) * H, 0, H - 1).astype(jnp.int32)
        occ_mask = _occupancy_march_sc(occ[0], g)
    else:
        occ_mask = _occupancy_at(occ, pts, dts, bound)
    mask = inside & occ_mask  # [N,S]

    # --- stride compaction: pick every stride-th occupied candidate ---
    # Implemented with top_k + take_along_axis (within-row lane ops) instead
    # of a 2D scatter: random scatters cost ~50ns/element on TPU while row-
    # local gathers vectorize on the VPU.
    n_occ = jnp.sum(mask, axis=-1)                      # [N]
    stride = jnp.maximum((n_occ + K - 1) // K, 1)       # [N]
    rank = jnp.cumsum(mask, axis=-1) - 1                # occupied rank per candidate
    sel = mask & (rank % stride[:, None] == 0)

    # extract the <= K selected candidates per ray (front-to-back) with an
    # MXU one-hot contraction instead of top_k + take_along_axis: stride
    # selection guarantees ceil(n_occ/stride) <= K selected, so the one-hot
    # over the selected-rank has at most one nonzero per (ray, k) output —
    # the contraction is EXACT in any precision mode and replaces a [N,S]
    # row sort + two minor-dim gathers (~16 ms at 8192x909 on v5e) with a
    # ~1 GFLOP matmul the MXU does for free.
    rank_sel = jnp.cumsum(sel, axis=-1) - 1             # rank among selected
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (N, S, K), 2)
    W = ((rank_sel[..., None] == k_iota) & sel[..., None]).astype(jnp.float32)
    vals = [ts, jnp.ones_like(ts)]
    if dt_gamma != 0.0:
        vals.append(dts)
    out = jnp.einsum(
        "nsk,nsv->nkv", W, jnp.stack(vals, axis=-1),
        precision=jax.lax.Precision.HIGHEST,
    )
    ts_out = out[..., 0]
    valid = out[..., 1] > 0.5
    validf = valid.astype(ts.dtype)

    dts_out = (dts[:, :1] * stride[:, None].astype(dts.dtype)) * validf
    if dt_gamma != 0.0:
        dts_out = out[..., 2] * stride[:, None].astype(dts.dtype) * validf

    xyzs = rays_o[:, None, :] + rays_d[:, None, :] * ts_out[..., None]
    xyzs = jnp.clip(xyzs, -bound, bound)
    if contract:
        mag = jnp.max(jnp.abs(xyzs), axis=-1, keepdims=True)
        scale = jnp.where(mag > 1.0, (2.0 - 1.0 / jnp.maximum(mag, 1e-8)) / jnp.maximum(mag, 1e-8), 1.0)
        xyzs = xyzs * scale

    return MarchResult(xyzs=xyzs, dirs=rays_d, ts=ts_out, dts=dts_out, valid=valid)


class CompositeResult(NamedTuple):
    weights: jnp.ndarray      # [N, K]
    weights_sum: jnp.ndarray  # [N]
    depth: jnp.ndarray        # [N]
    image: jnp.ndarray        # [N, 3]


def composite_rays(
    sigmas: jnp.ndarray,   # [N, K] density (or alpha if alpha_mode)
    rgbs: jnp.ndarray,     # [N, K, 3]
    ts: jnp.ndarray,       # [N, K]
    dts: jnp.ndarray,      # [N, K]
    valid: jnp.ndarray,    # [N, K] bool
    T_thresh: float = 1e-4,
    alpha_mode: bool = False,
) -> CompositeResult:
    """Volume-rendering compositor (raymarching.cu:501-710 semantics).

    alpha = 1 - exp(-sigma * dt) (or sigma directly in alpha_mode for
    SDF/NeuS); transmittance via exclusive cumprod; samples after T falls
    below T_thresh contribute zero (early-exit parity).
    """
    if alpha_mode:
        alpha = jnp.clip(sigmas, 0.0, 1.0)
    else:
        alpha = 1.0 - jnp.exp(-sigmas * dts)
    alpha = jnp.where(valid, alpha, 0.0)

    # exclusive cumprod of (1 - alpha): T_i = prod_{j<i} (1-alpha_j)
    one_minus = 1.0 - alpha
    T = jnp.cumprod(
        jnp.concatenate([jnp.ones_like(one_minus[:, :1]), one_minus[:, :-1]], axis=-1),
        axis=-1,
    )
    live = T >= T_thresh  # CUDA kernel breaks once T < thresh
    w = jnp.where(live, alpha * T, 0.0)

    weights_sum = jnp.sum(w, axis=-1)
    depth = jnp.sum(w * ts, axis=-1)
    image = jnp.sum(w[..., None] * rgbs, axis=-2)
    return CompositeResult(weights=w, weights_sum=weights_sum, depth=depth, image=image)


def sph_from_ray(rays_o: jnp.ndarray, rays_d: jnp.ndarray, radius: float) -> jnp.ndarray:
    """Background-sphere (theta, phi) coordinates where each ray exits a
    sphere of `radius` (reference raymarching.cu:163-211 kernel_sph_from_ray;
    unused on the reference's main path, kept for API parity)."""
    b = jnp.sum(rays_o * rays_d, axis=-1)
    c = jnp.sum(rays_o * rays_o, axis=-1) - radius * radius
    disc = jnp.maximum(b * b - c, 0.0)
    t = -b + jnp.sqrt(disc)
    p = rays_o + rays_d * t[:, None]
    theta = jnp.arctan2(jnp.sqrt(p[:, 0] ** 2 + p[:, 1] ** 2), p[:, 2])
    phi = jnp.arctan2(p[:, 1], p[:, 0])
    return jnp.stack([theta, phi], axis=-1)


def flatten_rays(counts: jnp.ndarray, total: int) -> jnp.ndarray:
    """Per-point ray index from per-ray sample counts (reference
    raymarching.cu:303-334 kernel_flatten_rays). The TPU pipeline keeps the
    [N, K] layout so this is only needed for exporting point-major data."""
    offsets = jnp.concatenate([jnp.zeros((1,), counts.dtype), jnp.cumsum(counts)[:-1]])
    out = jnp.zeros((total,), jnp.int32)
    out = out.at[jnp.clip(offsets[1:], 0, total - 1)].add(1)
    return jnp.cumsum(out)
