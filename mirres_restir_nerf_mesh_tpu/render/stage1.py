"""Stage-1 renderer: mesh G-buffer + PBR material + env light + path tracing.

Re-implements the reference `NeRFRenderer.render_stage1`
(`nerf/renderer.py:927-1374`) as one jittable function over a fixed pixel
batch: BVH rebuild from (base vertices + offsets), ray-cast G-buffer,
shading-normal prep, material + jittered smoothness taps, NeRF radiance
supervision image, direct lighting (MIS one-sample baseline or ReSTIR) and
no-grad indirect bounces.  SSAA and the 25-key output dict contract are
preserved where meaningful on this path.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..models import envlight, material as material_mod
from ..models import nerf as nerf_model
from ..ops.tracer import build_tracer
from ..utils.compact import masked_apply
from ..utils.math import safe_normalize
from . import pathtracer
from . import restir as restir_mod
from .gbuffer import prepare_shading_normal, raycast_gbuffer


class Stage1Params(NamedTuple):
    """Trainable state for stage 1 (three reference optimizer groups)."""

    nerf: Any              # radiance field (lr group: net)
    offsets: jnp.ndarray   # [V,3] vertex offsets (lr group: net, lr_vert)
    mat: Any               # material field (lr group: mat)
    env: jnp.ndarray       # [H,W,3] envmap (lr group: light)


@dataclass(frozen=True)
class Stage1Static:
    """Non-trainable per-scene state."""

    tris: Any                    # [F,3] int32 (numpy or jnp)
    nerf_spec: nerf_model.NeRFSpec
    mat_spec: material_mod.MaterialSpec
    spp: int = 4
    bounces: int = 2
    smooth_eps: float = 0.01     # jitter radius for smoothness taps
    enable_offset_nerf_grad: bool = False

    # ReSTIR DI configuration (reference renderer_restir.py:151-181)
    use_restir: bool = False
    H: int = 0                   # pixel layout (required for restir/denoise)
    W: int = 0
    restir_tiles: int = 128
    restir_tile_size: int = 1024
    restir_light_samples: int = 32
    restir_brdf_samples: int = 1
    restir_neighbors: int = 5
    restir_radius: float = 30.0
    restir_offsets: int = 8192
    restir_history: float = 20.0
    restir_unbiased_spatial: bool = True

    # denoiser configuration (reference renderer.py:1105, renderer_restir.py:483)
    denoise_iters: int = 0       # 0 = off; reference uses `de` with stepWidth 2^(de-1)
    denoise_bilateral: bool = False
    c_phi: float = 1.0
    n_phi: float = 0.1
    p_phi: float = 0.1

    # ray tracer backend: 'auto' (tile on TPU, cluster on CPU), 'tile'
    # (Pallas tile-coherent candidate streaming), 'cluster' (per-ray XLA
    # candidate loop) or 'lbvh' (Karras LBVH, parity/reference backend)
    tracer: str = "auto"
    cluster_size: int = 128
    max_candidates: int = 10     # cluster-AABB candidates tested per ray
    dense_threshold: int = 8192  # <=: single dense pass over all triangles
    k_cap: int = 128             # tile tracer: candidate clusters per ray tile
    k_cap_incoherent: int = 512  # tile tracer: budget for bounce-ray batches
                                 # (hit-mask error vs exact on the worst-case
                                 # bench scene: 0.6% at 512, 4.4% at 384)
    ray_tile: int = 512          # tile tracer: rays per tile
    queue_avg: int = 64          # work-queue budget (avg candidates per tile)
    queue_avg_incoherent: int = 64  # same for incoherent (bounce/vis) batches

    # profiling-only block skips for scripts/profile_stage1.py --ablate:
    # comma-separated tokens from {no_field, no_initial, no_temporal,
    # no_final, no_shade, no_lighttiles}.  Each replaces one frame block with
    # a trivially-shaped stand-in so single-knob deltas attribute the frame
    # budget.  NOT a rendering mode — never set outside profiling.
    ablate: str = ""

    # supersampling factor baked into H/W (H,W here are ALREADY multiplied
    # by ssaa; the trainer box-downsamples outputs to GT resolution)
    ssaa: int = 1

    # silhouette antialiasing with vertex gradients (render/antialias.py, the
    # dr.antialias equivalent, reference renderer.py:1182-1206)
    antialias: bool = True
    pos_gradient_boost: float = 1.0

    # jax.sharding.Mesh for data-parallel tracing: the Pallas tile tracer is
    # shard_mapped over the 'data' axis when set (GSPMD cannot partition a
    # custom call; without this every chip would trace the full ray batch)
    shard_mesh: Any = None

    # screen-space normal-AO buffer for the lambda_extra_kd loss
    # (reference process_normal_ao, renderer.py:1151-1158)
    compute_normal_ao: bool = False

    # live-lane compaction for per-pixel field queries (utils/compact.py):
    # number of cond-gated chunks; executed chunks adapt to coverage at run
    # time.  1 disables.  4 is a measured sweet spot: full-coverage penalty
    # is a few fixed per-op costs, low-coverage win is ~4x on the encodes.
    compact_chunks: int = 4


def act_voffsets(vo: jnp.ndarray) -> jnp.ndarray:
    """Identity activation (reference nerf/utils.py:340-347 act_voffsets)."""
    return vo


def _bilinear_tap(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample of img [H,W,C] at float pixel coords (clamp boundary),
    the dr.texture(filter_mode='linear', boundary_mode='clamp') equivalent."""
    H, W = img.shape[0], img.shape[1]
    x = jnp.clip(x, 0.0, W - 1.0)
    y = jnp.clip(y, 0.0, H - 1.0)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[:, None]
    fy = (y - y0)[:, None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x1i = jnp.minimum(x0i + 1, W - 1)
    y1i = jnp.minimum(y0i + 1, H - 1)
    flat = img.reshape(H * W, -1)
    g = lambda yy, xx: flat[yy * W + xx]  # noqa: E731
    top = g(y0i, x0i) * (1 - fx) + g(y0i, x1i) * fx
    bot = g(y1i, x0i) * (1 - fx) + g(y1i, x1i) * fx
    return top * (1 - fy) + bot * fy


def _jittered_tap_grad(
    key: jax.Array,
    normal: jnp.ndarray,   # [HW,3] interpolated vertex normal
    mask: jnp.ndarray,     # [HW] bool coverage
    H: int,
    W: int,
    std_uv: float = 0.005,
) -> jnp.ndarray:
    """Reference normal-smoothness tap (renderer.py:1001-1011): sample the
    normal G-buffer at pixel + N(0, 0.005)·(W,H) and take |tap - center|,
    weighted by mask * bilinear(mask)."""
    HW = H * W
    px = (jnp.arange(HW) % W).astype(jnp.float32)
    py = (jnp.arange(HW) // W).astype(jnp.float32)
    off = jax.random.normal(key, (HW, 2)) * std_uv
    x = px + off[:, 0] * W
    y = py + off[:, 1] * H
    img_n = normal.reshape(H, W, 3)
    img_m = mask.astype(jnp.float32).reshape(H, W, 1)
    nrm_tap = _bilinear_tap(img_n, x, y)
    mask_tap = _bilinear_tap(img_m, x, y)[:, 0]
    grad_weight = mask.astype(jnp.float32) * mask_tap
    return jnp.sum(jnp.abs(nrm_tap - normal), axis=-1) * grad_weight


def render_stage1(
    params: Stage1Params,
    static: Stage1Static,
    base_verts: jnp.ndarray,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    key: jax.Array,
    relight_env: Optional[jnp.ndarray] = None,
    albedo_scale: Optional[jnp.ndarray] = None,
    exposure_scale: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    tris = jnp.asarray(static.tris)
    verts = base_verts + act_voffsets(params.offsets)

    # --- acceleration-structure rebuild every step, like the reference
    # (renderer.py:975); default backend is the TPU-native cluster tracer ---
    tracer = build_tracer(
        jax.lax.stop_gradient(verts), tris, kind=static.tracer,
        cluster_size=static.cluster_size,
        max_candidates=static.max_candidates,
        dense_threshold=static.dense_threshold,
        k_cap=static.k_cap, k_cap_incoherent=static.k_cap_incoherent,
        tile=static.ray_tile, mesh=static.shard_mesh,
        queue_avg=static.queue_avg,
        queue_avg_incoherent=static.queue_avg_incoherent,
    )
    ab = frozenset(t.strip() for t in static.ablate.split(",") if t.strip())

    gb = raycast_gbuffer(verts, tris, tracer, rays_o, rays_d)
    uncertain_primary = tracer.pop_telemetry()
    traced_total = tracer.pop_traced()
    normal = prepare_shading_normal(gb.view_dir, gb.normal, gb.face_normal)

    # --- material & jittered taps for smoothness grads (renderer.py:1000-1022) ---
    # the three per-pixel field queries (material, jittered material, NeRF
    # radiance) run under live-lane compaction (utils/compact.py): the
    # reference's per-pixel kernels early-out on uncovered pixels
    # (occ_map==0 guards); on TPU the equivalent is sorting live lanes
    # first and cond-skipping dead chunks — at typical object coverage
    # (15-40% of the frame) this removes most of the ~90 ms of hash-grid
    # gathers the masked lanes would pay
    xyzs = gb.position
    k_jit, k_di, k_ind, key = jax.random.split(key, 4)
    jitter = jax.random.normal(k_jit, xyzs.shape) * static.smooth_eps
    xyzs_j = jax.lax.stop_gradient(xyzs) + jitter

    def field_queries(pos, pos_j, vdir):
        m = material_mod.sample_material(params.mat, pos, static.mat_spec)
        m_j = material_mod.sample_material(params.mat, pos_j, static.mat_spec)
        npts = pos if static.enable_offset_nerf_grad else jax.lax.stop_gradient(pos)
        rgb = nerf_model.rgb_only(params.nerf, npts, vdir, static.nerf_spec)
        return m, m_j, rgb

    if "no_field" in ab:  # profiling-only: attribute the field-query block
        mat = jnp.full((xyzs.shape[0], static.mat_spec.channels), 0.5)
        mat_j, nerf_rgb = mat, jnp.zeros((xyzs.shape[0], 3))
    else:
        mat, mat_j, nerf_rgb = masked_apply(
            field_queries, gb.mask, (xyzs, xyzs_j, gb.view_dir),
            fills=(0.5, 0.5, 0.0), chunks=static.compact_chunks,
        )
    kd, rough, metal = material_mod.split_material(mat)
    kd_j, rough_j, metal_j = material_mod.split_material(mat_j)
    msk = gb.mask[:, None]
    kd_grad = jnp.abs(kd_j - kd) * msk
    ks_grad = jnp.abs(jnp.stack([rough_j - rough, metal_j - metal], -1)) * msk
    ks_grad = jnp.sum(ks_grad, axis=-1)

    # normal smoothness (reference renderer.py:1000-1011): the reference's
    # "jitter" is an IMAGE-SPACE bilinear tap of the interpolated-normal
    # G-buffer at pixel+N(0, 0.005 uv) — not a second raycast.  Reproduced
    # exactly when the pixel layout is known; ray-batch mode falls back to
    # smooth-vs-face normal disparity.
    if static.H > 0:
        normal_grad = _jittered_tap_grad(
            jax.random.fold_in(k_jit, 7), gb.normal, gb.mask, static.H, static.W
        )
    else:
        normal_grad = jnp.sum(jnp.abs(gb.normal - gb.face_normal), axis=-1) * gb.mask

    # --- NeRF radiance at surface points (supervision image, renderer.py:1046;
    # computed in field_queries above under the shared compaction) ---
    image = jnp.where(gb.mask[:, None], nerf_rgb, 1.0)

    # --- lighting ---
    env_tex = params.env if relight_env is None else relight_env
    # O(1) quantile-table sampler, rebuilt on device every step (the env is
    # trainable); replaces per-sample 2-level CDF inversion (~190 ns/sample)
    env_dist = envlight.build_sampler(jax.lax.stop_gradient(env_tex))
    kd_shade = kd if albedo_scale is None else kd * albedo_scale[None, :]

    def material_fn(pts, stochastic_key=None):
        m = material_mod.sample_material(
            params.mat, pts, static.mat_spec, stochastic_key=stochastic_key
        )
        if albedo_scale is not None:
            m = m.at[:, 0:3].multiply(albedo_scale[None, :])
        return m

    env_bg = envlight.eval_le(env_tex, gb.view_dir)

    sg = jax.lax.stop_gradient
    ctx = None
    offsets = None
    if static.use_restir:
        ctx = restir_mod.PixelCtx(
            position=sg(xyzs), normal=sg(normal), view_dir=gb.view_dir,
            kd=sg(kd_shade), roughness=sg(rough), metallic=sg(metal),
            mask=gb.mask, depth=gb.depth,
        )
        offsets = restir_mod.make_neighbor_offsets(
            jax.random.fold_in(key, 99), static.restir_offsets, static.restir_radius
        )

    # light tiles are generated ONCE per render, outside the spp loop (the
    # reference builds its tile buffer per pass set, renderer_restir.py:319;
    # per-spp tile_id/offset randomization keeps samples stratified)
    tiles = None
    if static.use_restir:
        if "no_lighttiles" in ab:  # profiling-only
            tiles = restir_mod.LightTiles(
                dirs=jnp.zeros((static.restir_tiles, static.restir_tile_size, 3))
                .at[..., 2].set(1.0),
                le=jnp.ones((static.restir_tiles, static.restir_tile_size, 3)),
                pdf=jnp.ones((static.restir_tiles, static.restir_tile_size)),
            )
        else:
            tiles = restir_mod.generate_light_tiles(
                jax.random.fold_in(k_di, 10_007), sg(env_tex), env_dist,
                static.restir_tiles, static.restir_tile_size,
            )

    # spp structure: the only serial dependence across spp iterations is the
    # temporal->spatial reservoir chain (iteration s's temporal reuse merges
    # iteration s-1's post-spatial reservoir, renderer_restir.py:487 with
    # zero motion vectors).  Initial RIS and the indirect bounces are
    # independent of that chain, so they are BATCHED across all spp into
    # single [spp*P] tracer launches (~9 ms fixed cost per tile-tracer
    # launch measured on v5e; 4 spp x (initial vis + 2x bounce + 2x NEE)
    # would pay it 20x, batched pays it 5x — and the merged batches
    # morton-sort into denser, more coherent tiles).  The per-spp lax.scan
    # keeps ONE compiled body for the serial math + cross-visibility part
    # (the reference re-dispatches ~10 kernels per spp, :314-471).
    # Iteration 0 merges with an EMPTY reservoir (M=0), a no-op — equivalent
    # to the reference's `if i > 0` gate without a separate first graph.
    P = rays_o.shape[0]
    SPP = static.spp

    def tile_spp(x):
        """[P,...] -> [SPP*P,...] (repeat per spp iteration)."""
        return jnp.concatenate([x] * SPP, axis=0) if SPP > 1 else x

    if static.use_restir:
        # --- batched initial RIS for all spp; the winner-visibility rays are
        # FUSED into the indirect pass's first NEE launch below (both are
        # ready before the spp chain starts — one tracer call, denser tiles).
        # Runs under live-lane compaction: the per-pixel candidate-block
        # gather + 33 target evals are pure waste on masked lanes (fills
        # produce an invalid empty reservoir, exactly what a dead pixel's
        # RIS yields anyway).  Randoms are pre-drawn in pixel space and ride
        # the permutation as ordinary args, so chunked == unchunked bitwise
        # (test_restir_chain_chunk_equivalence).
        ctx_b = restir_mod.PixelCtx(*(tile_spp(getattr(ctx, f)) for f in ctx._fields))
        Nb = SPP * P
        k_init = jax.random.fold_in(k_di, 1)
        ki_t, ki_b, ki_u, ki_s = jax.random.split(k_init, 4)
        nl = static.restir_light_samples
        nbs = static.restir_brdf_samples
        i_tile = jax.random.randint(ki_t, (Nb,), 0, static.restir_tiles)
        i_blk = jax.random.randint(
            ki_b, (Nb,), 0, max(static.restir_tile_size // max(nl, 1), 1)
        )
        # ONE categorical-pick uniform for the whole light-candidate block
        # (+ one reservoir-stream uniform per BRDF candidate): the packed
        # fast path's pick is an inverse-CDF draw (see initial_resampling)
        i_us = jax.random.uniform(ki_u, (Nb, 1 + nbs))       # rowwise
        i_bu = jax.random.uniform(ki_s, (Nb, max(nbs, 1) * 5))

        def initial_fn(tid_c, blk_c, us_c, bu_c, *ctx_fields):
            ctx_c = restir_mod.PixelCtx(*ctx_fields)
            bus = [
                (bu_c[:, j * 5], bu_c[:, j * 5 + 1:j * 5 + 3],
                 bu_c[:, j * 5 + 3:j * 5 + 5])
                for j in range(nbs)
            ]
            r = restir_mod.initial_resampling(
                k_init, ctx_c, tiles, sg(env_tex), env_dist,
                tracer=None, n_light_samples=nl, n_brdf_samples=nbs,
                check_visibility=False,
                rand=(tid_c[:, 0], blk_c[:, 0], us_c.T, bus),
            )
            # r.p is always set on this path (env_dist is an EnvSampler:
            # nearest-texel tile Le, see initial_resampling sel_p threading)
            return (r.dir, r.W[:, None], r.M[:, None],
                    r.valid.astype(jnp.float32)[:, None], r.p[:, None])

        if "no_initial" in ab:  # profiling-only: fixed up-facing winner (p
            # set so downstream keeps the exact-reuse threading structure)
            res0_b = restir_mod.Reservoir(
                dir=jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (Nb, 3)),
                W=jnp.ones((Nb,)), M=jnp.ones((Nb,)), valid=ctx_b.mask,
                p=jnp.ones((Nb,)),
            )
        else:
            r_dir, r_w, r_m, r_v, r_p = masked_apply(
                initial_fn, ctx_b.mask,
                (i_tile[:, None], i_blk[:, None], i_us, i_bu)
                + tuple(getattr(ctx_b, f) for f in ctx_b._fields),
                fills=(0.0, 0.0, 0.0, 0.0, 0.0), chunks=static.compact_chunks,
            )
            res0_b = restir_mod.Reservoir(
                dir=r_dir, W=r_w[:, 0], M=r_m[:, 0], valid=r_v[:, 0] > 0.5,
                p=r_p[:, 0],
            )
        init_occ_rays = (
            ctx_b.position + ctx_b.normal * 1e-4,
            res0_b.dir,
            jnp.where(res0_b.valid, 1e9, 0.0),
        )

    # --- indirect bounces, batched across all spp (no-grad; each spp's rays
    # draw independent randoms via the flat [SPP*P] shapes); runs BEFORE the
    # spp chain so the initial-RIS visibility rays ride its first launch.
    # The WHOLE pass (tracer launches, material re-queries, BRDF/NEE math)
    # runs under live-lane compaction: at typical object coverage most
    # [SPP*P] lanes are dead, and on TPU dead lanes pay full gather price.
    # Compaction here is statistical (per-chunk keys), exact for the
    # fused initial-RIS visibility (dead lanes have no valid reservoir). ---
    mask_b = tile_spp(gb.mask)
    ind_args = [
        mask_b, tile_spp(sg(xyzs)), tile_spp(sg(normal)), tile_spp(gb.view_dir),
        tile_spp(sg(kd_shade)), tile_spp(sg(rough)), tile_spp(sg(metal)),
    ]
    if static.use_restir:
        ind_args += list(init_occ_rays)

    def indirect_fn(ck, m_c, pos_c, nrm_c, vd_c, kd_c, r_c, mt_c, *eo_c):
        out = pathtracer.render_indirect(
            ck, m_c, pos_c, nrm_c, vd_c, kd_c, r_c, mt_c, tracer, sg(verts),
            tris, material_fn, env_tex, env_dist, bounces=static.bounces,
            extra_occ=tuple(eo_c) if eo_c else None,
        )
        tot, occ = out if eo_c else (out, jnp.zeros((pos_c.shape[0],), bool))
        # tracer telemetry is appended as traced values; inside the cond it
        # must leave through the branch outputs (a constant column whose
        # row-sum is the per-chunk scalar)
        n = pos_c.shape[0]
        telem = tracer.pop_telemetry()
        traced = tracer.pop_traced()
        return (tot, occ.astype(jnp.float32)[:, None],
                jnp.full((n, 1), telem / n), jnp.full((n, 1), traced / n))

    sum_i_b, occ_col, telem_col, traced_col = masked_apply(
        indirect_fn, mask_b, ind_args, fills=(0.0, 0.0, 0.0, 0.0),
        chunks=static.compact_chunks, key=k_ind,
    )
    uncertain_primary = uncertain_primary + jnp.sum(telem_col)
    traced_total = traced_total + jnp.sum(traced_col)
    if static.use_restir:
        init_occ = occ_col[:, 0] > 0.5
        # apply the fused winner visibility: an occluded winner is exactly a
        # zeroed/invalidated reservoir (same algebra as the in-pass check —
        # W was already final, visibility only gates it)
        res_b = res0_b._replace(
            W=jnp.where(init_occ, 0.0, res0_b.W),
            valid=res0_b.valid & ~init_occ,
        )
        res_all = jax.tree.map(
            lambda a: a.reshape((SPP,) + (P,) + a.shape[1:]), res_b
        )
    sum_i = sum_i_b.reshape(SPP, P, 3).sum(axis=0)
    # pop any remaining telemetry HERE: left in the list it would become a
    # scan constant and be re-counted every spp iteration
    uncertain_primary = uncertain_primary + tracer.pop_telemetry()
    traced_total = traced_total + tracer.pop_traced()

    # the serial spp chain (temporal -> spatial -> final eval -> shade) also
    # runs under live-lane compaction when the pixel layout is known: the
    # whole chain is carried in a live-first PERMUTED pixel domain (one sort
    # per frame — the mask is constant across spp), each pass executes
    # chunk-wise under lax.cond, and spatial reuse's cross-pixel neighbor
    # gathers read a full-frame packed record through the permutation's
    # idx_map.  Randoms are drawn in PIXEL space with the same keys as the
    # uncompacted chain and threaded through (u/rand params), so chunked ==
    # unchunked exactly — tested by test_restir_chain_chunk_equivalence.
    chain_chunked = (
        static.use_restir and static.compact_chunks > 1
        and P % static.compact_chunks == 0 and static.H > 0
    )
    if chain_chunked:
        from ..utils.compact import (
            chunked_tree, live_first_permutation, pack_cols, unpack_cols,
        )

        Cn = static.compact_chunks
        csz = P // Cn
        perm, inv_perm, live = live_first_permutation(gb.mask)
        # ALL frame-constant per-pixel chain state rides ONE packed
        # row-gather permute (pack_cols): ctx, the differentiable shading
        # inputs (gather has a scatter-add VJP, so gradients flow back to
        # the pixel domain), and the per-spp initial reservoirs (leaves
        # moved to [P, spp, ...] so the pixel axis leads)
        res_all_m = jax.tree.map(lambda a: jnp.moveaxis(a, 0, 1), res_all)
        chain_pack, chain_specs = pack_cols(
            [getattr(ctx, f) for f in ctx._fields]
            + [normal, kd_shade, rough, metal]
            + [res_all_m.dir, res_all_m.W, res_all_m.M, res_all_m.valid,
               res_all_m.p]
        )
        ups = unpack_cols(chain_pack[perm], chain_specs)
        # re-detach the resampling-side slices: the ONE packed carrier mixes
        # detached ctx/reservoir columns with the differentiable shading
        # inputs, so every unpacked slice structurally carries the carrier's
        # tangent — and a (zero) tangent reaching a tracer launch breaks
        # grad (pallas_call has no JVP rule).  Only the shading inputs
        # (p_norm/p_kd/p_rough/p_metal) keep gradients; their VJP flows back
        # through the carrier gather's scatter-add.
        pctx = restir_mod.PixelCtx(*(sg(u) for u in ups[0:8]))
        p_norm, p_kd, p_rough, p_metal = ups[8], ups[9], ups[10], ups[11]
        res_all_p = restir_mod.Reservoir(    # [P, spp, ...] permuted leaves
            *(sg(u) for u in ups[12:17])
        )
        thread_vis = static.restir_unbiased_spatial

        def cslice(t, c):
            return jax.tree.map(lambda a: a[c * csz:(c + 1) * csz], t)

        def spp_body_chunked(carry, s):
            prev_res, prev_vis, acc_d, acc_s, acc_u, acc_t = carry
            k_s = jax.random.fold_in(k_di, s)
            # same key derivation as the uncompacted chain; randoms drawn
            # full-width in pixel space, permuted, sliced per chunk
            k_t, k_i, k_tm, k_sp = jax.random.split(k_s, 4)
            k_off, k_pick = jax.random.split(k_sp)
            nn1 = static.restir_neighbors + 1
            # pixel-space randoms (same keys/shapes as the uncompacted
            # chain, so chunked == unchunked bitwise), permuted with ONE
            # packed row gather; [nn1, P] rides transposed so the permute
            # gathers rows, never the minor axis (~35x, CLAUDE.md)
            rpack, rspecs = pack_cols([
                jax.random.uniform(k_tm, (P,))[:, None],
                jax.random.randint(k_off, (P,), 0, offsets.shape[0])[:, None],
                jnp.transpose(jax.random.uniform(k_pick, (nn1, P))),
            ])
            u_tm_c, st_c, us_c = unpack_cols(rpack[perm], rspecs)
            u_tm, st_sp = u_tm_c[:, 0], st_c[:, 0]
            us_sp = jnp.transpose(us_c)  # [nn1, P] permuted
            res_s = jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(a, s, 1, keepdims=False),
                res_all_p,
            )

            # pass 1 (rowwise): temporal merge per chunk
            def temporal_chunk(c):
                if "no_temporal" in ab:  # profiling-only passthrough (p set
                    # so downstream keeps the exact-reuse threading structure)
                    return (cslice(res_s, c)._replace(p=jnp.ones((csz,))),
                            jnp.ones((csz,), bool))
                ctx_c = cslice(pctx, c)
                kw = {}
                if thread_vis:
                    kw = dict(v_curr=jnp.ones((csz,), bool),
                              v_prev=prev_vis[c * csz:(c + 1) * csz])
                out = restir_mod.temporal_resampling(
                    k_tm, ctx_c, cslice(res_s, c),
                    cslice(prev_res, c), ctx_c.normal, ctx_c.depth,
                    sg(env_tex), max_history=static.restir_history,
                    u=u_tm[c * csz:(c + 1) * csz], **kw,
                )
                return out if thread_vis else (out, jnp.ones((csz,), bool))

            res_t, v_self = chunked_tree(live, Cn, csz, temporal_chunk)
            packed = restir_mod.pack_spatial_record(
                pctx, res_t, v_self if thread_vis else None, env_tex=sg(env_tex)
            )

            # pass 2: spatial reuse + final eval + shade per chunk (the
            # cross-visibility / final-visibility tracer launches shrink to
            # the executed chunks' rays)
            def spatial_chunk(c):
                ctx_c = cslice(pctx, c)
                kw = dict(v_self=v_self[c * csz:(c + 1) * csz]) if thread_vis else {}
                out = restir_mod.spatial_resampling(
                    k_sp, ctx_c, cslice(res_t, c),
                    sg(env_tex), static.H, static.W, offsets,
                    tracer=tracer, n_neighbors=static.restir_neighbors,
                    unbiased=static.restir_unbiased_spatial,
                    packed=packed, pix_idx=perm[c * csz:(c + 1) * csz],
                    idx_map=inv_perm,
                    rand=(st_sp[c * csz:(c + 1) * csz],
                          us_sp[:, c * csz:(c + 1) * csz]), **kw,
                )
                if thread_vis:
                    res_o, fvis = out
                else:
                    res_o = out
                    fvis = jnp.ones((csz,), bool)
                if "no_final" in ab:  # profiling-only: constant Li
                    light = pathtracer.LightSample(
                        dir=res_o.dir,
                        distance=jnp.where(res_o.valid, 1e9, 0.0),
                        Li=jnp.broadcast_to(res_o.W[:, None], (csz, 3)),
                    )
                elif thread_vis:
                    light = restir_mod.evaluate_final_samples(
                        ctx_c, res_o, env_tex, tracer, known_vis=fvis
                    )
                else:
                    light = restir_mod.evaluate_final_samples(
                        ctx_c, res_o, env_tex, tracer
                    )
                if "no_shade" in ab:  # profiling-only
                    dval = sval = light.Li * 0.0
                else:
                    _, dval, sval = pathtracer.shade_direct(
                        light, ctx_c.mask, p_norm[c * csz:(c + 1) * csz],
                        ctx_c.view_dir, p_kd[c * csz:(c + 1) * csz],
                        p_rough[c * csz:(c + 1) * csz],
                        p_metal[c * csz:(c + 1) * csz], jnp.zeros((csz, 3)),
                    )
                # telemetry must leave through the branch outputs (see
                # indirect_fn above); one (1,) leaf per chunk
                return (res_o, fvis, dval, sval, tracer.pop_telemetry()[None],
                        tracer.pop_traced()[None])

            res_o, fvis, dval, sval, telem, traced = chunked_tree(
                live, Cn, csz, spatial_chunk
            )
            return (res_o, fvis, acc_d + dval, acc_s + sval,
                    acc_u + jnp.sum(telem), acc_t + jnp.sum(traced)), None

        zero = jnp.zeros((P, 3))
        carry0 = (restir_mod.empty_reservoir(P), jnp.ones((P,), bool), zero,
                  zero, jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32))
        (_, _, sum_d_p, sum_s_p, sum_u, sum_t), _ = jax.lax.scan(
            spp_body_chunked, carry0, jnp.arange(static.spp)
        )
        # unpermute both accumulators with ONE wide-row gather
        both = jnp.concatenate([sum_d_p, sum_s_p], axis=1)[inv_perm]
        sum_d, sum_s = both[:, 0:3], both[:, 3:6]

    def spp_body(carry, s):
        prev_res, prev_vis, acc_d, acc_s, acc_u, acc_t = carry
        k_s = jax.random.fold_in(k_di, s)
        if static.use_restir:
            k_t, k_i, k_tm, k_sp = jax.random.split(k_s, 4)
            res = jax.tree.map(lambda a: a[s], res_all)
            # visibility threading (zero extra rays): initial RIS invalidated
            # occluded winners, so surviving ones are visible; prev_vis is the
            # previous iteration's final-winner visibility
            thread_vis = static.restir_unbiased_spatial
            if thread_vis:
                res, v_self = restir_mod.temporal_resampling(
                    k_tm, ctx, res, prev_res, ctx.normal, ctx.depth, sg(env_tex),
                    max_history=static.restir_history,
                    v_curr=jnp.ones((P,), bool), v_prev=prev_vis,
                )
                res, final_vis = restir_mod.spatial_resampling(
                    k_sp, ctx, res, sg(env_tex), static.H, static.W, offsets,
                    tracer=tracer, n_neighbors=static.restir_neighbors,
                    unbiased=True, v_self=v_self,
                )
                prev_res, prev_vis = res, final_vis
                light = restir_mod.evaluate_final_samples(
                    ctx, res, env_tex, tracer, known_vis=final_vis
                )
            else:
                res = restir_mod.temporal_resampling(
                    k_tm, ctx, res, prev_res, ctx.normal, ctx.depth, sg(env_tex),
                    max_history=static.restir_history,
                )
                res = restir_mod.spatial_resampling(
                    k_sp, ctx, res, sg(env_tex), static.H, static.W, offsets,
                    tracer=tracer, n_neighbors=static.restir_neighbors,
                    unbiased=False,
                )
                prev_res = res
                light = restir_mod.evaluate_final_samples(ctx, res, env_tex, tracer)
        else:
            # one-sample MIS baseline, also under live-lane compaction.
            # Randoms are drawn in pixel space with sample_direct_mis's own
            # key derivation and ride masked_apply's permutation as ordinary
            # args, so chunked == unchunked bitwise
            # (test_compact_chunks_equivalence).
            k_env, k_brdf, k_pick = jax.random.split(k_s, 3)
            k_sel, k_d, k_s2 = jax.random.split(k_brdf, 3)
            rnd_env = jax.random.uniform(k_env, (P, 2))
            u_sel = jax.random.uniform(k_sel, (P,))
            u_d = jax.random.uniform(k_d, (P, 2))
            u_s2 = jax.random.uniform(k_s2, (P, 2))
            u_pick = jax.random.uniform(k_pick, (P,))

            def direct_fn(pos, nrm, vd, m_c, kd_c, r_c, mt_c,
                          nrm_d, kd_d, r_d, mt_d, re_c, us_c, ud_c, us2_c,
                          up_c):
                light_c = pathtracer.sample_direct_mis(
                    k_s, pos, nrm, vd, m_c, kd_c, r_c, mt_c,
                    env_tex, env_dist, tracer,
                    rand=(re_c, (us_c, ud_c, us2_c), up_c),
                )
                _, dv, sv = pathtracer.shade_direct(
                    light_c, m_c, nrm_d, vd, kd_d, r_d, mt_d,
                    jnp.zeros((pos.shape[0], 3)),
                )
                n = pos.shape[0]
                return (dv, sv, jnp.full((n, 1), tracer.pop_telemetry() / n),
                        jnp.full((n, 1), tracer.pop_traced() / n))

            diff_s, spec_s, telem_c, traced_c = masked_apply(
                direct_fn, gb.mask,
                (sg(xyzs), sg(normal), gb.view_dir, gb.mask, sg(kd_shade),
                 sg(rough), sg(metal), normal, kd_shade, rough, metal,
                 rnd_env, u_sel, u_d, u_s2, u_pick),
                fills=(0.0, 0.0, 0.0, 0.0), chunks=static.compact_chunks,
            )
            acc_u = acc_u + jnp.sum(telem_c)
            acc_t = acc_t + jnp.sum(traced_c)
            return (prev_res, prev_vis, acc_d + diff_s, acc_s + spec_s,
                    acc_u, acc_t), None
        color_s, diff_s, spec_s = pathtracer.shade_direct(
            light, gb.mask, normal, gb.view_dir, kd_shade, rough, metal, env_bg
        )
        acc_u = acc_u + tracer.pop_telemetry()
        acc_t = acc_t + tracer.pop_traced()
        return (prev_res, prev_vis, acc_d + diff_s, acc_s + spec_s, acc_u,
                acc_t), None

    if not chain_chunked:
        zero = jnp.zeros((P, 3))
        carry0 = (restir_mod.empty_reservoir(P), jnp.ones((P,), bool), zero,
                  zero, jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32))
        (_, _, sum_d, sum_s, sum_u, sum_t), _ = jax.lax.scan(
            spp_body, carry0, jnp.arange(static.spp)
        )
    uncertain_count = uncertain_primary + sum_u
    traced_total = traced_total + sum_t
    inv = 1.0 / float(static.spp)
    diffuse_light = sum_d * inv
    specular_light = sum_s * inv
    indirect = sum_i * inv

    # denoise diffuse/spec (differentiable) + indirect (no-grad), then
    # composite (reference renderer_restir.py:507-544)
    if static.denoise_iters > 0 and static.H > 0:
        from .denoise import bilateral_denoise, eaw_denoise

        H, W = static.H, static.W

        def to2d(x):
            return x.reshape(H, W, -1)

        n2 = to2d(sg(normal))
        p2 = to2d(sg(xyzs))
        m2 = gb.mask.reshape(H, W)
        sw = 2 ** (static.denoise_iters - 1)
        if static.denoise_bilateral:
            zdz = jnp.stack([gb.depth.reshape(H, W), jnp.full((H, W), 2.0)], -1)
            diffuse_light = bilateral_denoise(to2d(diffuse_light), n2, zdz).reshape(-1, 3)
            specular_light = bilateral_denoise(to2d(specular_light), n2, zdz).reshape(-1, 3)
            indirect = sg(bilateral_denoise(to2d(indirect), n2, zdz)).reshape(-1, 3)
        else:
            diffuse_light = eaw_denoise(
                to2d(diffuse_light), n2, p2, m2, static.denoise_iters, sw,
                static.c_phi, static.n_phi, static.p_phi, differentiable=True,
            ).reshape(-1, 3)
            specular_light = eaw_denoise(
                to2d(specular_light), n2, p2, m2, static.denoise_iters, sw,
                static.c_phi, static.n_phi, static.p_phi, differentiable=True,
            ).reshape(-1, 3)
            indirect = eaw_denoise(
                to2d(indirect), n2, p2, m2, static.denoise_iters, sw,
                static.c_phi, static.n_phi, static.p_phi, differentiable=False,
            ).reshape(-1, 3)

    # final composite (reference renderer_restir.py:543-544)
    image_brdf = (
        kd_shade * (1.0 - metal[:, None]) * diffuse_light
        + specular_light
        + indirect
    )
    image_brdf = jnp.where(gb.mask[:, None], image_brdf, env_bg)
    if exposure_scale is not None:
        image_brdf = image_brdf * exposure_scale

    # silhouette antialiasing: vertex gradients across coverage boundaries
    # (dr.antialias parity, reference renderer.py:1182-1206; indirect is
    # value-antialiased but detached like the reference's .detach() buffers)
    weights_sum = gb.mask.astype(jnp.float32)
    if static.antialias and static.H > 0:
        from .antialias import antialias as aa_fn

        bufs = {
            "image": image,
            "image_brdf": image_brdf,
            "diffuse_light": diffuse_light,
            "specular_light": specular_light,
            "img_brdf_indirect": sg(indirect),
        }
        bufs, weights_sum = aa_fn(
            bufs, gb.mask, (gb.tri_v0, gb.tri_v1, gb.tri_v2),
            rays_o, gb.view_dir, static.H, static.W,
            boost=static.pos_gradient_boost,
        )
        image = bufs["image"]
        image_brdf = bufs["image_brdf"]
        diffuse_light = bufs["diffuse_light"]
        specular_light = bufs["specular_light"]
        indirect = bufs["img_brdf_indirect"]

    nrm_ao = None
    if static.compute_normal_ao and static.H > 0:
        from .denoise import normal_ao

        nrm_ao = normal_ao(
            sg(normal).reshape(static.H, static.W, 3),
            gb.mask.reshape(static.H, static.W),
        ).reshape(-1)

    return {
        "image": image,
        "image_brdf": image_brdf,
        "diffuse_light": diffuse_light,
        "specular_light": specular_light,
        "img_brdf_indirect": indirect,
        "weights_sum": weights_sum,
        "depth": gb.depth,
        "normal": normal,
        "kd": kd_shade,
        "ks": jnp.stack([jnp.zeros_like(rough), rough, metal], axis=-1),
        "kd_grad": kd_grad,
        "ks_grad": ks_grad,
        "normal_grad": normal_grad,
        "xyzs": xyzs,
        "mask": gb.mask,
        "face_id": gb.face_id,
        # tile-tracer exactness telemetry: rays this frame whose result may
        # lie in a budget-dropped candidate (> 0 => raise k_cap budgets)
        "uncertain_count": uncertain_count,
        # workload telemetry: live lanes (t_max > t_min) actually entering
        # tracer launches this frame — lower than the nominal algorithmic
        # ray count because exact-reuse threading and compaction zero or
        # skip rays whose answer is already known (VERDICT r3 item 2)
        "traced_rays": traced_total,
        **({"normal_ao": nrm_ao} if nrm_ao is not None else {}),
    }
