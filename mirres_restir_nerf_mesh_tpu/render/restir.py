"""ReSTIR DI: reservoir-based spatiotemporal importance resampling, pure JAX.

Re-implements the reference's Slang ReSTIR stack
(`nerf/ScreenSpaceReSTIR/{GenerateLightTiles,InitialResampling,
TemporalResampling,SpatialResampling,EvaluateFinalSamples}.slang`,
reservoir math `utils/res.slang`) as dense per-pixel array programs —
every pass is embarrassingly parallel over pixels and maps directly onto the
VPU, with candidate streaming unrolled at trace time.

Semantics preserved:
  - reservoir = (light dir, W, M, valid); W precomputed as the unbiased
    contribution weight ((weightSum/M)/targetPdf, InitialResampling.slang:277)
  - target function = luminance(Le * f) (res.slang:70-77 evalTargetFunction)
  - initial RIS: 32 light-tile samples + 1 BRDF sample, source pdf mixed by
    sample-count ratio (evalInitialSamplePdf), winner visibility check
  - temporal reuse: M clamped to 20x, G-buffer validity (normal >= 0.5 cos,
    depth within 10%)
  - spatial reuse: 5 neighbors in a 30px radius, pairwise MIS
    (streamingResampleStepMis + streamingResampleFinalizeMis, mFactor)
  - final evaluation Li = W * Le * visibility, differentiable wrt the envmap
    (EvaluateFinalSamples.slang process_EvaluateFinalSamples_di_)
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..models import envlight
from ..ops.tracer import Tracer
from ..utils.math import luminance
from . import brdf
from .pathtracer import LightSample


class Reservoir(NamedTuple):
    dir: jnp.ndarray    # [P,3] world light direction of the winning sample
    W: jnp.ndarray      # [P] unbiased contribution weight
    M: jnp.ndarray      # [P] effective sample count
    valid: jnp.ndarray  # [P] bool
    # cached target pdf of the winner AT ITS OWN PIXEL's shading context
    # (p_hat = luminance(Le * f), the value every pass would recompute).
    # With zero motion vectors the owning pixel never changes, so temporal
    # reuse and spatial reuse can THREAD this value instead of re-evaluating
    # the BRDF + envmap tap: exact (same inputs, same formula), and it
    # deletes one of the three [P*nn] target evaluations plus the [P*nn]
    # envmap gather per spatial pass.  None = unknown (recompute).
    p: Optional[jnp.ndarray] = None  # [P]


def empty_reservoir(P: int) -> Reservoir:
    return Reservoir(
        dir=jnp.zeros((P, 3)), W=jnp.zeros((P,)), M=jnp.zeros((P,)),
        valid=jnp.zeros((P,), bool), p=jnp.zeros((P,)),
    )


class PixelCtx(NamedTuple):
    """Per-pixel shading context used by the target function."""

    position: jnp.ndarray  # [P,3]
    normal: jnp.ndarray    # [P,3]
    view_dir: jnp.ndarray  # [P,3]
    kd: jnp.ndarray        # [P,3]
    roughness: jnp.ndarray # [P]
    metallic: jnp.ndarray  # [P]
    mask: jnp.ndarray      # [P]
    depth: jnp.ndarray     # [P]


def target_function(ctx: PixelCtx, ldir: jnp.ndarray, le: jnp.ndarray) -> jnp.ndarray:
    """p_hat = luminance(Le * f(view, light)) (res.slang evalTargetFunction)."""
    w_view = brdf.to_local(-ctx.view_dir, ctx.normal)
    w_l = brdf.to_local(ldir, ctx.normal)
    alpha = brdf.alpha_from_roughness(ctx.roughness)
    p_diff, p_spec = brdf.lobe_probabilities(
        ctx.kd, ctx.metallic, jnp.sum(-ctx.view_dir * ctx.normal, axis=-1)
    )
    f = brdf.brdf_eval(w_view, w_l, ctx.kd, ctx.metallic, alpha, p_diff, p_spec)
    return jnp.maximum(luminance(le * f), 0.0)


class CtxPre(NamedTuple):
    """Per-pixel precompute for the SoA target evaluation: local ONB frame,
    view dir in local frame, GGX alpha, lobe probabilities.  All leaves keep
    the pixel leading shape; candidate axes broadcast against them."""

    t: jnp.ndarray       # [..,3] tangent
    b: jnp.ndarray       # [..,3] bitangent
    n: jnp.ndarray       # [..,3] normal
    wv: jnp.ndarray      # [..,3] view dir, LOCAL frame
    alpha: jnp.ndarray   # [..]
    p_diff: jnp.ndarray  # [..]
    p_spec: jnp.ndarray  # [..]
    kd: jnp.ndarray      # [..,3]
    metallic: jnp.ndarray  # [..]


def precompute_ctx(ctx: PixelCtx) -> CtxPre:
    t, b, n = brdf.onb_frame(ctx.normal)
    wv = brdf.to_local(-ctx.view_dir, ctx.normal)
    alpha = brdf.alpha_from_roughness(ctx.roughness)
    p_diff, p_spec = brdf.lobe_probabilities(
        ctx.kd, ctx.metallic, jnp.sum(-ctx.view_dir * ctx.normal, axis=-1)
    )
    return CtxPre(t=t, b=b, n=n, wv=wv, alpha=alpha, p_diff=p_diff,
                  p_spec=p_spec, kd=ctx.kd, metallic=ctx.metallic)


def target_soa(pre: CtxPre, ld: jnp.ndarray, le: jnp.ndarray,
               with_pdf: bool = False):
    """SoA target evaluation: the same math as `target_function` (+
    optionally `brdf.brdf_pdf`) written on component PLANES instead of
    last-dim-3 vectors — last-dim-3 math wastes VPU lanes (CLAUDE.md cost
    model; the cluster-BVH MT kernel measured ~5x from the same rewrite).

    pre leaves have pixel shape [..]; ld/le are [.., K, 3] (or [.., 3]) and
    the candidate axes broadcast: pre components are unsqueezed to match.
    Returns p_hat [.., K] (and the mixed BRDF pdf when with_pdf)."""
    extra = ld.ndim - pre.alpha.ndim - 1  # candidate axes beyond the pixel shape

    def pp(x):  # pixel-plane -> broadcastable against candidate planes
        return x.reshape(x.shape + (1,) * extra) if extra > 0 else x

    ldx, ldy, ldz = ld[..., 0], ld[..., 1], ld[..., 2]
    lex, ley, lez = le[..., 0], le[..., 1], le[..., 2]
    tx, ty, tz = pp(pre.t[..., 0]), pp(pre.t[..., 1]), pp(pre.t[..., 2])
    bx, by, bz = pp(pre.b[..., 0]), pp(pre.b[..., 1]), pp(pre.b[..., 2])
    nx, ny, nz = pp(pre.n[..., 0]), pp(pre.n[..., 1]), pp(pre.n[..., 2])
    wvx, wvy, wvz = pp(pre.wv[..., 0]), pp(pre.wv[..., 1]), pp(pre.wv[..., 2])
    a = pp(pre.alpha)
    met = pp(pre.metallic)
    kdr, kdg, kdb = pp(pre.kd[..., 0]), pp(pre.kd[..., 1]), pp(pre.kd[..., 2])
    gate_d = pp(pre.p_diff > 0)
    gate_s = pp(pre.p_spec > 0)

    # to_local (brdf.to_local): wl = (ld.t, ld.b, ld.n)
    wlx = ldx * tx + ldy * ty + ldz * tz
    wly = ldx * bx + ldy * by + ldz * bz
    wlz = ldx * nx + ldy * ny + ldz * nz

    ok = jnp.minimum(wvz, wlz) >= 1e-6
    # diffuse_light: NdotL/pi above the horizon; kd*(1-metal) factor
    ndl = jnp.where(ok, jnp.maximum(brdf.INV_PI * wlz, 0.0), 0.0)
    difw = 1.0 - met
    f_r = jnp.where(gate_d, kdr * difw * ndl, 0.0)
    f_g = jnp.where(gate_d, kdg * difw * ndl, 0.0)
    f_b = jnp.where(gate_d, kdb * difw * ndl, 0.0)

    # specular_eval: F*D*G/(4*NdotV) with half-vector h = normalize(wv+wl)
    hx, hy, hz = wvx + wlx, wvy + wly, wvz + wlz
    hn = jnp.maximum(jnp.sqrt(hx * hx + hy * hy + hz * hz), 1e-12)
    hx, hy, hz = hx / hn, hy / hn, hz / hn
    vdoth = wvx * hx + wvy * hy + wvz * hz
    a2 = a * a
    d_ = (hz * a2 - hz) * hz + 1.0
    D = a2 / jnp.maximum(d_ * d_ * jnp.pi, 1e-12)

    def _lam(c):
        c2 = jnp.clip(c, 1e-6, 1.0) ** 2
        tan2 = jnp.maximum(1.0 - c2, 0.0) / c2
        lam = 0.5 * (-1.0 + jnp.sqrt(1.0 + a2 * tan2))
        return jnp.where(c <= 0, 0.0, lam)

    G = 1.0 / jnp.maximum(1.0 + _lam(wvz) + _lam(wlz), 1e-12)
    f5 = jnp.maximum(1.0 - vdoth, 0.0) ** 5
    sar = brdf.F0 * (1.0 - met) + kdr * met  # spec_albedo_from, per channel
    sag = brdf.F0 * (1.0 - met) + kdg * met
    sab = brdf.F0 * (1.0 - met) + kdb * met
    dg = D * G * 0.25 / jnp.maximum(wvz, 1e-6)
    dg = jnp.where((a > 0) & ok, dg, 0.0)  # delta lobe excluded + horizon
    f_r = f_r + jnp.where(gate_s, (sar + (1.0 - sar) * f5) * dg, 0.0)
    f_g = f_g + jnp.where(gate_s, (sag + (1.0 - sag) * f5) * dg, 0.0)
    f_b = f_b + jnp.where(gate_s, (sab + (1.0 - sab) * f5) * dg, 0.0)

    p_hat = jnp.maximum(
        lex * f_r * 0.2126 + ley * f_g * 0.7152 + lez * f_b * 0.0722, 0.0
    )
    if not with_pdf:
        return p_hat
    # brdf.brdf_pdf: p_diff * cos/pi + p_spec * D*hz/(4 vdoth)
    dpdf = jnp.maximum(wlz, 0.0) * brdf.INV_PI
    spdf = D * hz / jnp.maximum(4.0 * vdoth, 1e-12)
    spdf = jnp.where(ok & (a > 0) & (vdoth > 0), spdf, 0.0)
    return p_hat, pp(pre.p_diff) * dpdf + pp(pre.p_spec) * spdf


class LightTiles(NamedTuple):
    dirs: jnp.ndarray    # [T, S, 3]
    le: jnp.ndarray      # [T, S, 3]
    pdf: jnp.ndarray     # [T, S]


def generate_light_tiles(
    key: jax.Array,
    env_tex: jnp.ndarray,
    dist: envlight.EnvDistribution,
    n_tiles: int = 128,
    tile_size: int = 1024,
) -> LightTiles:
    """Presample stratified envmap samples (GenerateLightTiles.slang:15-61).

    Tile Le uses the nearest-texel record fast path when the O(1) sampler
    is in play: tile radiance only enters resampling targets (see
    _sample_li_table nearest_le)."""
    rnd = jax.random.uniform(key, (n_tiles, tile_size, 2))
    if isinstance(dist, envlight.EnvSampler):
        dirs, le, pdf = envlight._sample_li_table(
            env_tex, dist, rnd.reshape(-1, 2), nearest_le=True
        )
    else:
        dirs, le, pdf = envlight.sample_li(env_tex, dist, rnd.reshape(-1, 2))
    return LightTiles(
        dirs=dirs.reshape(n_tiles, tile_size, 3),
        le=le.reshape(n_tiles, tile_size, 3),
        pdf=pdf.reshape(n_tiles, tile_size),
    )


def initial_resampling(
    key: jax.Array,
    ctx: PixelCtx,
    tiles: LightTiles,
    env_tex: jnp.ndarray,
    dist: envlight.EnvDistribution,
    tracer: Optional[Tracer],
    n_light_samples: int = 32,
    n_brdf_samples: int = 1,
    check_visibility: bool = True,
    rand=None,
) -> Reservoir:
    """RIS over light-tile + BRDF candidates (InitialResampling.slang:149-295).

    rand: optional pre-drawn randoms (tile_id [P] int32, blk [P] int32,
    us [(1+n_brdf), P] for the packed fast path ([(n_light+n_brdf), P] for
    the strided slow path), brdf_us list of (u_sel, u_d, u_s) per BRDF
    sample) — live-lane-compacted callers draw them in pixel space so
    chunked calls equal the uncompacted call bitwise (requires the packed
    candidate-block fast path, S % n_light_samples == 0; the strided slow
    path keeps internal key draws)."""
    P = ctx.position.shape[0]
    T, S = tiles.pdf.shape
    k_tile, k_off, k_u, k_brdf, k_ub = jax.random.split(key, 5)
    fast_path = n_light_samples > 0 and S % n_light_samples == 0

    if rand is not None:
        tile_id, blk_r, us_r, brdf_us = rand
        if us_r is not None and us_r.shape[0] == 1 + n_brdf_samples:
            # Pre-drawn us with the packed layout (1 categorical row +
            # n_brdf stream rows) is only meaningful on the fast path; the
            # slow path would index us[i] for i < n_light_samples and JAX
            # would silently clamp, reusing one uniform for every candidate
            # (correlated RIS, no error raised).
            assert fast_path, (
                f"initial_resampling rand= with packed us rows requires the "
                f"fast path: tile_size {S} % n_light_samples "
                f"{n_light_samples} must be 0"
            )
    else:
        blk_r = us_r = brdf_us = None
        tile_id = jax.random.randint(k_tile, (P,), 0, T)

    ratio = n_brdf_samples / max(n_light_samples + n_brdf_samples, 1)

    alpha = brdf.alpha_from_roughness(ctx.roughness)
    t_onb, b_onb, _ = brdf.onb_frame(ctx.normal)
    w_view = brdf.to_local(-ctx.view_dir, ctx.normal)
    p_diff, p_spec = brdf.lobe_probabilities(
        ctx.kd, ctx.metallic, jnp.sum(-ctx.view_dir * ctx.normal, axis=-1)
    )
    pre = CtxPre(t=t_onb, b=b_onb, n=ctx.normal, wv=w_view, alpha=alpha,
                 p_diff=p_diff, p_spec=p_spec, kd=ctx.kd,
                 metallic=ctx.metallic)

    # reservoir state
    w_sum = jnp.zeros((P,))
    M = jnp.zeros((P,))
    sel_dir = jnp.zeros((P, 3))
    sel_p = jnp.zeros((P,))  # targetPdf of selected
    sel_valid = jnp.zeros((P,), bool)

    n_us = (1 if fast_path else n_light_samples) + n_brdf_samples
    us = us_r if us_r is not None else jax.random.uniform(k_u, (n_us, P))

    def mixed_source_pdf(ldir, lpdf):
        if n_brdf_samples > 0:
            bpdf = brdf.brdf_pdf(w_view, brdf.to_local(ldir, ctx.normal), alpha, p_diff, p_spec)
            return (1.0 - ratio) * lpdf + ratio * bpdf
        return lpdf

    # Candidate fetch: random row gathers are latency-priced per ROW
    # regardless of width (CLAUDE.md cost model), so the tile table is packed
    # into blocks of n_light_samples consecutive samples and each pixel
    # fetches its WHOLE candidate set with ONE wide-row gather (n*7 floats)
    # — 32x fewer memory transactions than per-sample rows.  Tile samples
    # are i.i.d. envmap draws, so an aligned block has the same distribution
    # as the reference's offset+stride walk (InitialResampling.slang:175).
    table = jnp.concatenate(
        [tiles.dirs, tiles.le, tiles.pdf[..., None]], axis=-1
    )  # [T, S, 7]
    n = n_light_samples
    if fast_path:
        blocks = table.reshape(T * (S // n), n * 7)
        blk = blk_r if blk_r is not None else jax.random.randint(
            k_off, (P,), 0, S // n
        )
        rows = blocks[tile_id * (S // n) + blk].reshape(P, n, 7)  # [P,n,7]

        # ALL light candidates evaluated at once on a [P, n] lattice in SoA
        # component form (target_soa): a 32-step lax.scan of [P]-wide ops
        # starves the VPU and serializes what is embarrassingly parallel,
        # and last-dim-3 vector math wastes lanes (CLAUDE.md cost model).
        # The streaming-reservoir pick is closed-form: with prefix sums W_i,
        # step i picks iff u_i * W_i < w_i, and the SELECTED candidate is
        # the last i that picked — identical rule, one vectorized pass.
        ld_all, le_all, lpdf_all = rows[..., 0:3], rows[..., 3:6], rows[..., 6]
        if n_brdf_samples > 0:
            p_hat_all, bpdf_all = target_soa(pre, ld_all, le_all, with_pdf=True)
            src_all = (1.0 - ratio) * lpdf_all + ratio * bpdf_all
        else:
            p_hat_all = target_soa(pre, ld_all, le_all)
            src_all = lpdf_all
        w_all = jnp.where(
            src_all > 1e-12, p_hat_all / jnp.maximum(src_all, 1e-12), 0.0
        )
        # The streaming-reservoir pick over materialized weights IS a
        # categorical draw (reservoir sampling selects candidate i with
        # probability w_i / W): ONE inverse-CDF uniform per lane replaces
        # the per-candidate uniforms — 32x fewer random draws and a 60%
        # narrower compaction carrier, identical winner distribution.
        # Zero-weight candidates have a flat cumsum segment and are never
        # selected; u in [0,1) keeps the index < n (min() guards the
        # round-to-W edge).
        w_cum = jnp.cumsum(w_all, axis=1)
        W_l = w_cum[:, -1]
        any_pick = W_l > 0
        tgt = us[0] * W_l
        idx = jnp.minimum(
            jnp.sum((w_cum <= tgt[:, None]).astype(jnp.int32), axis=1), n - 1
        )
        onehot = (jnp.arange(n)[None, :] == idx[:, None]).astype(jnp.float32)
        sel_dir = jnp.einsum("pn,pnc->pc", onehot, ld_all)
        sel_p = jnp.sum(p_hat_all * onehot, axis=1)
        sel_dir = jnp.where(any_pick[:, None], sel_dir, 0.0)
        sel_p = jnp.where(any_pick, sel_p, 0.0)
        w_sum = W_l
        M = jnp.full((P,), float(n))
        sel_valid = any_pick
        light_body = None
    else:
        flat = table.reshape(T * S, 7)
        offset = jax.random.randint(k_off, (P,), 0, S)
        stride = 1 + 2 * jax.random.randint(jax.random.fold_in(k_off, 1), (P,), 0, max(S // 2, 1))
        base = tile_id * S

        def light_body(carry, i):
            w_sum, M, sel_dir, sel_p, sel_valid = carry
            idx = (offset + i * stride) % S
            row = flat[base + idx]
            ldir, le, lpdf = row[:, 0:3], row[:, 3:6], row[:, 6]
            p_hat = target_function(ctx, ldir, le)
            src = mixed_source_pdf(ldir, lpdf)
            w = jnp.where(src > 1e-12, p_hat / jnp.maximum(src, 1e-12), 0.0)
            w_sum = w_sum + w
            M = M + 1.0
            pick = us[i] * w_sum < w
            sel_dir = jnp.where(pick[:, None], ldir, sel_dir)
            sel_p = jnp.where(pick, p_hat, sel_p)
            sel_valid = sel_valid | pick
            return (w_sum, M, sel_dir, sel_p, sel_valid), None

    if light_body is not None:
        (w_sum, M, sel_dir, sel_p, sel_valid), _ = jax.lax.scan(
            light_body, (w_sum, M, sel_dir, sel_p, sel_valid),
            jnp.arange(n_light_samples),
        )

    for j in range(n_brdf_samples):
        kb = jax.random.fold_in(k_brdf, j)
        s = brdf.brdf_sample(
            kb, w_view, ctx.kd, ctx.metallic, alpha,
            u=brdf_us[j] if brdf_us is not None else None,
        )
        ldir = brdf.to_global(s.w_light_l, ctx.normal)
        le = envlight.eval_le_nearest(env_tex, ldir)
        p_hat, bpdf_b = target_soa(pre, ldir, le, with_pdf=True)
        p_hat = jnp.where(s.valid, p_hat, 0.0)
        lpdf_b = envlight.pdf_li(dist, ldir)
        src = (1.0 - ratio) * lpdf_b + ratio * bpdf_b if n_brdf_samples > 0 else lpdf_b
        w = jnp.where(s.valid & (src > 1e-12), p_hat / jnp.maximum(src, 1e-12), 0.0)
        w_sum = w_sum + w
        M = M + 1.0
        pick = us[(1 if fast_path else n_light_samples) + j] * w_sum < w
        sel_dir = jnp.where(pick[:, None], ldir, sel_dir)
        sel_p = jnp.where(pick, p_hat, sel_p)
        sel_valid = sel_valid | pick

    sel_valid = sel_valid & ctx.mask

    if check_visibility and tracer is not None:
        # invalid winners trace with t_max=0: dead lanes are dropped from
        # candidate selection (dead tiles cost one no-op queue item)
        occ = tracer.occluded(
            ctx.position + ctx.normal * 1e-4, sel_dir,
            jnp.where(sel_valid, 1e9, 0.0), incoherent=True,
        )
        sel_valid = sel_valid & ~occ

    W = jnp.where(
        sel_valid & (sel_p > 0), (w_sum / jnp.maximum(M, 1.0)) / jnp.maximum(sel_p, 1e-12), 0.0
    )
    W = jnp.where(jnp.isfinite(W), W, 0.0)
    # sel_p threading: with the O(1) sampler the light tiles carry the
    # NEAREST-texel Le of their quantile texel (generate_light_tiles, now
    # pole-cone-zeroed to match eval_le_nearest), the in-texel jitter never
    # leaves that texel, and the BRDF candidates already use
    # eval_le_nearest — so sel_p == target_soa(pre, sel_dir,
    # eval_le_nearest(sel_dir)), the p_curr temporal would recompute (same
    # pixel ctx, same formula, same Le convention) up to a NEAR-exact
    # caveat: the uv->dir->uv float roundtrip can flip to the adjacent
    # texel exactly at texel boundaries (measure-zero set; RIS stays
    # unbiased because the target only needs to be evaluated consistently
    # within a pass).  Cache
    # it on the reservoir so the whole reuse chain threads targets with
    # ZERO per-pass re-evaluation.  The legacy EnvDistribution path's tiles
    # are bilinear-Le -> not threadable (p stays None, temporal recomputes,
    # matching the reference's re-evaluation).
    p_out = sel_p if isinstance(dist, envlight.EnvSampler) else None
    return Reservoir(
        dir=sel_dir, W=W, M=jnp.ones((P,)), valid=sel_valid & (W > 0), p=p_out
    )


def _valid_neighbor(ctx: PixelCtx, n_normal, n_depth, normal_thresh=0.5, depth_thresh=0.1):
    return (jnp.sum(ctx.normal * n_normal, axis=-1) >= normal_thresh) & (
        jnp.abs(ctx.depth - n_depth) <= depth_thresh * jnp.maximum(ctx.depth, 1e-8)
    )


def temporal_resampling(
    key: jax.Array,
    ctx: PixelCtx,
    curr: Reservoir,
    prev: Reservoir,
    prev_normal: jnp.ndarray,
    prev_depth: jnp.ndarray,
    env_tex: jnp.ndarray,
    max_history: float = 20.0,
    v_curr: Optional[jnp.ndarray] = None,
    v_prev: Optional[jnp.ndarray] = None,
    u: Optional[jnp.ndarray] = None,
):
    """Merge the previous frame's reservoir (TemporalResampling.slang:21-135;
    motion vectors are zero in the reference, renderer_restir.py:487).

    v_curr/v_prev: optional [P] bool — known visibility of curr.dir/prev.dir
    at ctx.position (visibility threading: initial RIS already traced the
    winner, the previous iteration's final eval traced prev.dir).  When both
    are given, returns (Reservoir, v_out) with the winner's visibility — no
    ray was consumed to know it.

    u: optional [P] pre-drawn uniforms (live-lane-compacted callers draw in
    pixel space and pass permuted slices, so chunked == unchunked bitwise)."""
    P = ctx.position.shape[0]
    ok = prev.valid & _valid_neighbor(ctx, prev_normal, prev_depth)
    prev_M = jnp.where(ok, jnp.minimum(prev.M, max_history * jnp.maximum(curr.M, 1.0)), 0.0)

    # stream current then previous through a reservoir (res.slang:115-134);
    # nearest-texel Le in the target function (see eval_le_nearest).
    # Both targets THREAD when cached (zero motion: the owning pixel never
    # changes, same ctx/env/formula): p_curr from initial RIS's sel_p
    # (nearest-texel tile Le, see initial_resampling), p_prev from the
    # previous pass's winner target.  Uncached reservoirs re-evaluate,
    # exactly as the reference does.
    pre = None
    if curr.p is not None:
        p_curr = jnp.where(curr.valid, curr.p, 0.0)
    else:
        pre = precompute_ctx(ctx)
        p_curr = jnp.where(curr.valid, target_soa(pre, curr.dir, envlight.eval_le_nearest(env_tex, curr.dir)), 0.0)
    if prev.p is not None:
        p_prev = jnp.where(ok, prev.p, 0.0)
    else:
        pre = precompute_ctx(ctx) if pre is None else pre
        p_prev = jnp.where(ok, target_soa(pre, prev.dir, envlight.eval_le_nearest(env_tex, prev.dir)), 0.0)

    w_curr = p_curr * curr.W * curr.M
    w_prev = p_prev * prev.W * prev_M
    w_sum = w_curr + w_prev
    M = curr.M + prev_M

    if u is None:
        u = jax.random.uniform(key, (P,))
    pick_prev = u * w_sum >= w_curr  # prev wins the residual mass
    sel_dir = jnp.where(pick_prev[:, None], prev.dir, curr.dir)
    sel_p = jnp.where(pick_prev, p_prev, p_curr)
    W = jnp.where(sel_p > 0, w_sum / jnp.maximum(M, 1e-8) / jnp.maximum(sel_p, 1e-12), 0.0)
    W = jnp.where(jnp.isfinite(W), W, 0.0)
    valid = (W > 0) & ctx.mask
    out = Reservoir(dir=sel_dir, W=W, M=M, valid=valid, p=sel_p)
    if v_curr is not None and v_prev is not None:
        return out, jnp.where(pick_prev, v_prev, v_curr)
    return out


def _m_factor(q0, q1):
    return jnp.where(q0 == 0, 1.0, jnp.clip(jnp.minimum(q1 / jnp.maximum(q0, 1e-12), 1.0) ** 8, 0.0, 1.0))


def _pairwise_mis(q0, q1, n0, n1):
    return jnp.where(q1 == 0, 0.0, (n0 * q0) / jnp.maximum(q0 * n0 + q1 * n1, 1e-12))


def make_neighbor_offsets(key: jax.Array, count: int = 8192, radius: float = 30.0) -> jnp.ndarray:
    """Precomputed disc offsets (reference createNeighborOffsetTexture)."""
    k1, k2 = jax.random.split(key)
    r = jnp.sqrt(jax.random.uniform(k1, (count,))) * radius
    th = jax.random.uniform(k2, (count,)) * 2 * jnp.pi
    return jnp.stack([r * jnp.cos(th), r * jnp.sin(th)], axis=-1)


def pack_spatial_record(
    ctx: PixelCtx,
    res: Reservoir,
    v_self: Optional[jnp.ndarray] = None,
    *,
    env_tex: jnp.ndarray,
) -> jnp.ndarray:
    """Pack the per-pixel (ctx, reservoir, p_hat, Le[, vis]) record spatial
    reuse gathers from neighbors — ONE wide-row gather of this [P, 26(+1)]
    table replaces 12 per-field gathers (random row gathers are
    latency-priced per ROW regardless of width, CLAUDE.md cost model).

    Columns 22 (p_hat at the owning pixel) and 23:26 (nearest-texel Le of
    res.dir) let the spatial pass skip re-evaluating the neighbor's own
    target function and envmap tap on the [P*nn] axis: both are functions
    of the neighbor's (ctx, dir, env) only, already known per pixel.

    Columns 26:38 carry the neighbor's shading-frame precompute (tangent,
    bitangent, local view dir, alpha, lobe probabilities): the cross term
    q(canonical sample | neighbor ctx) then needs NO onb/lobe math on the
    [P*nn] lane axis — it is a per-PIXEL quantity computed once here and
    gathered, the same move as the p_hat/Le threading above."""
    pre = precompute_ctx(ctx)
    if res.p is not None:
        p_rec = jnp.where(res.valid, res.p, 0.0)
    else:
        p_rec = jnp.where(
            res.valid,
            target_soa(pre, res.dir,
                       envlight.eval_le_nearest(env_tex, res.dir)),
            0.0,
        )
    le_rec = envlight.eval_le_nearest(env_tex, res.dir)
    return jnp.concatenate(
        [
            ctx.position, ctx.normal, ctx.view_dir, ctx.kd,
            ctx.roughness[:, None], ctx.metallic[:, None],
            ctx.mask.astype(jnp.float32)[:, None], ctx.depth[:, None],
            res.dir, res.W[:, None], res.M[:, None],
            res.valid.astype(jnp.float32)[:, None],
            p_rec[:, None], le_rec,
            pre.t, pre.b, pre.wv, pre.alpha[:, None],
            pre.p_diff[:, None], pre.p_spec[:, None],
        ]
        + ([v_self.astype(jnp.float32)[:, None]] if v_self is not None else []),
        axis=1,
    )


def spatial_resampling(
    key: jax.Array,
    ctx: PixelCtx,
    res: Reservoir,
    env_tex: jnp.ndarray,
    H: int,
    W_img: int,
    offsets: jnp.ndarray,
    tracer: Optional[Tracer] = None,
    n_neighbors: int = 5,
    unbiased: bool = True,
    v_self: Optional[jnp.ndarray] = None,
    packed: Optional[jnp.ndarray] = None,
    pix_idx: Optional[jnp.ndarray] = None,
    idx_map: Optional[jnp.ndarray] = None,
    rand: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
):
    """Pairwise-MIS spatial reuse (SpatialResampling.slang:41-321,
    kUsePairwiseMIS=1). Optionally cross-visibility unbiased variant.

    v_self: optional [P] bool — known visibility of res.dir at ctx.position
    (threaded from initial RIS + previous final eval through temporal).
    When given (with unbiased+tracer), two savings apply:
      1. same-direction pairs (neighbor reservoir carries the *same* dir as
         the canonical — the common case once ReSTIR has propagated winners)
         reuse v_self instead of tracing: their rays get t_max=0, so the
         tile tracer drops them from candidate selection entirely;
      2. the winner's visibility is known without the final-eval shadow ray
         (a picked neighbor had visibility multiplied into its selection
         weight, so it is visible by construction; a canonical winner has
         v_self), and the function returns (Reservoir, vis [P] bool).

    packed/pix_idx/idx_map: live-lane-compacted calls (utils/compact.py)
    pass rows of a SUBSET of the frame: `packed` is the full-frame neighbor
    record (pack_spatial_record) to gather from, `pix_idx` [P] each row's
    pixel index, `idx_map` [HW] the map from pixel index to `packed` row
    (identity when packed is in pixel order).  Default: pack
    (ctx, res, v_self) and arange(P).

    rand: optional pre-drawn randoms (start [P] int32 disc offsets,
    us [nn+1, P] pick uniforms) — compacted callers draw these in pixel
    space so chunked == unchunked bitwise."""
    P = ctx.position.shape[0]
    nn = n_neighbors
    k_off, k_pick = jax.random.split(key)

    if pix_idx is None:
        pix_idx = jnp.arange(P)
    px = pix_idx % W_img
    py = pix_idx // W_img

    if rand is not None:
        start, us_pre = rand
    else:
        start = jax.random.randint(k_off, (P,), 0, offsets.shape[0])
        us_pre = None

    # canonical target pdf (nearest-texel Le: see eval_le_nearest); threaded
    # from the previous pass when cached (same pixel/dir/env -> same value)
    le_c = envlight.eval_le_nearest(env_tex, res.dir)
    pre_c = precompute_ctx(ctx)
    if res.p is not None:
        p_canon = jnp.where(res.valid, res.p, 0.0)
    else:
        p_canon = jnp.where(res.valid, target_soa(pre_c, res.dir, le_c), 0.0)

    if nn <= 0:
        # no neighbors: spatial reuse is the identity (the reference loop
        # body never runs); visibility threading passes straight through
        if v_self is not None and unbiased and tracer is not None:
            return res, v_self
        return res

    # --- gather ALL neighbors up front (vectorized over the neighbor axis) ---
    offs = offsets[(start[:, None] + jnp.arange(nn)[None, :]) % offsets.shape[0]]  # [P,nn,2]
    nx = jnp.clip(px[:, None] + offs[..., 0].astype(jnp.int32), 0, W_img - 1)
    ny = jnp.clip(py[:, None] + offs[..., 1].astype(jnp.int32), 0, H - 1)
    nidx = (ny * W_img + nx).reshape(-1)  # [P*nn]

    def rep(x):
        """tile canonical per-pixel data along the neighbor axis -> [P*nn,...]"""
        return jnp.repeat(x, nn, axis=0)

    ctx_rep = PixelCtx(*(rep(getattr(ctx, f)) for f in ctx._fields))
    if packed is None:
        packed = pack_spatial_record(ctx, res, v_self, env_tex=env_tex)
    if idx_map is not None:
        nidx = idx_map[nidx]
    g = packed[nidx]
    n_ctx = PixelCtx(
        position=g[:, 0:3], normal=g[:, 3:6], view_dir=g[:, 6:9],
        kd=g[:, 9:12], roughness=g[:, 12], metallic=g[:, 13],
        mask=g[:, 14] > 0.5, depth=g[:, 15],
    )
    n_res = Reservoir(dir=g[:, 16:19], W=g[:, 19], M=g[:, 20], valid=g[:, 21] > 0.5)

    ok_flat = (
        n_ctx.mask & n_res.valid & _valid_neighbor(ctx_rep, n_ctx.normal, n_ctx.depth)
    )  # [P*nn]

    # the neighbor's OWN target (q_cand) and its winner's Le ride the packed
    # record (cols 22, 23:26) — both are per-pixel quantities the previous
    # pass already evaluated; only the two genuinely CROSS terms (neighbor
    # sample at canonical ctx, canonical sample at neighbor ctx) are
    # evaluated on the [P*nn] axis.  q_cand is validity-gated in the record;
    # every use below is ok_flat-gated, which implies n_res.valid.
    le_n = g[:, 23:26]
    q_cand = g[:, 22]
    # cross targets in SoA component form (target_soa): per-pixel precompute
    # broadcast over the neighbor axis for q(neighbor sample | canonical
    # ctx); for q(canonical sample | neighbor ctx) the neighbor's
    # shading-frame precompute rides the packed record (cols 26:38) — no
    # onb/lobe math on the [P*nn] lane axis
    q_cand_at_c = target_soa(
        pre_c, n_res.dir.reshape(P, nn, 3), le_n.reshape(P, nn, 3)
    ).reshape(-1)

    def g2(lo, hi):
        return g[:, lo:hi].reshape((P, nn) + ((hi - lo,) if hi - lo > 1 else ()))

    pre_n = CtxPre(
        t=g2(26, 29), b=g2(29, 32), n=g2(3, 6), wv=g2(32, 35),
        alpha=g2(35, 36), p_diff=g2(36, 37), p_spec=g2(37, 38),
        kd=g2(9, 12), metallic=g2(13, 14),
    )
    q_canon_at_n = target_soa(
        pre_n, res.dir[:, None, :], le_c[:, None, :]
    ).reshape(-1)

    if unbiased and tracer is not None:
        # ONE batched shadow-ray traversal for both cross-visibility sets
        origins = jnp.concatenate(
            [ctx_rep.position + ctx_rep.normal * 1e-4, n_ctx.position + n_ctx.normal * 1e-4]
        )
        dirs = jnp.concatenate([n_res.dir, rep(res.dir)])
        if v_self is not None:
            # visibility dedup: a neighbor reservoir carrying bit-identical
            # direction to the canonical needs no rays — vis(x_c, dir_n) is
            # v_self[c] and vis(x_n, dir_c) is v_self[n].  t_max=0 makes the
            # tile tracer treat those lanes as dead (excluded from candidate
            # frustums; fully-dead tiles skip every grid step).  Pairs with
            # an invalid neighbor (~ok_flat) never contribute either way and
            # are deadened too.
            same = jnp.all(n_res.dir == rep(res.dir), axis=-1)  # [P*nn]
            # neighbor-slot dedup: once ReSTIR propagates winners, several of
            # a pixel's neighbors often carry the SAME direction — the ray
            # vis(x_c, dir) is identical, so only the first valid slot
            # traces; later twins are deadened (t_max=0) and copy its result
            dirs_nb = n_res.dir.reshape(P, nn, 3)
            same2 = same.reshape(P, nn)
            okf2 = ok_flat.reshape(P, nn)
            src_ok = same2 | okf2  # slots whose vis_c value will be valid
            dup = jnp.zeros((P, nn), bool)
            for j in range(1, nn):
                dj = jnp.zeros((P,), bool)
                for i in range(j):
                    dj = dj | (
                        jnp.all(dirs_nb[:, j] == dirs_nb[:, i], axis=-1)
                        & src_ok[:, i]
                    )
                dup = dup.at[:, j].set(dj & ~same2[:, j])
            # the dup dedup applies ONLY to the canonical-origin half (the
            # neighbor-origin rays vis(x_n, dir_c) have distinct origins).
            # Lanes whose pre-visibility target is already zero (backfacing
            # at the evaluation domain) contribute zero either way — dead.
            tmax_c = jnp.where(
                same | ~ok_flat | dup.reshape(-1) | (q_cand_at_c <= 0), 0.0, 1e9
            )
            tmax_n = jnp.where(same | ~ok_flat | (q_canon_at_n <= 0), 0.0, 1e9)
            occ2 = tracer.occluded(
                origins, dirs, jnp.concatenate([tmax_c, tmax_n]),
                incoherent=True,
            )
            vis_c = jnp.where(same, rep(v_self), ~occ2[: P * nn])
            vc2 = vis_c.reshape(P, nn)
            for j in range(1, nn):
                for i in range(j):
                    m = (
                        jnp.all(dirs_nb[:, j] == dirs_nb[:, i], axis=-1)
                        & dup[:, j] & src_ok[:, i]
                    )
                    vc2 = vc2.at[:, j].set(jnp.where(m, vc2[:, i], vc2[:, j]))
            vis_c = vc2.reshape(-1)
            vis_n = jnp.where(same, g[:, 38] > 0.5, ~occ2[P * nn :])
        else:
            tmax_pair = jnp.where(ok_flat, 1e9, 0.0)
            occ2 = tracer.occluded(
                origins, dirs, jnp.concatenate([tmax_pair, tmax_pair]),
                incoherent=True,
            )
            vis_c = ~occ2[: P * nn]
            vis_n = ~occ2[P * nn :]
        q_cand_at_c = q_cand_at_c * vis_c
        q_canon_at_n = q_canon_at_n * vis_n

    kf = float(nn)
    m0 = _pairwise_mis(q_cand, q_cand_at_c, n_res.M * kf, rep(res.M))
    m1 = 1.0 - _pairwise_mis(q_canon_at_n, rep(p_canon), n_res.M * kf, rep(res.M))

    w_all = jnp.where(ok_flat, q_cand_at_c * n_res.W * m0, 0.0).reshape(P, nn)
    M_all = jnp.where(
        ok_flat,
        n_res.M * jnp.minimum(_m_factor(q_cand, q_cand_at_c), _m_factor(q_canon_at_n, rep(p_canon))),
        0.0,
    ).reshape(P, nn)
    m1_all = jnp.where(ok_flat, m1, 0.0).reshape(P, nn)
    ok_all = ok_flat.reshape(P, nn)
    q_at_c_all = q_cand_at_c.reshape(P, nn)
    ndir_all = n_res.dir.reshape(P, nn, 3)

    valid_count = jnp.sum(ok_all, axis=1).astype(jnp.float32)
    # canonical MIS weight starts at 1 (SpatialResampling.slang:92-94
    # canonicalWeight=1) and accumulates the defensive pairwise terms
    canon_mis = 1.0 + jnp.sum(m1_all, axis=1)
    M = jnp.sum(M_all, axis=1)

    # --- sequential reservoir streaming over the (precomputed) neighbors ---
    us = us_pre if us_pre is not None else jax.random.uniform(k_pick, (nn + 1, P))
    w_sum = jnp.zeros((P,))
    sel_dir = res.dir
    sel_p = jnp.zeros((P,))
    picked_any = jnp.zeros((P,), bool)
    sel_canon = jnp.ones((P,), bool)
    for i in range(nn):
        w = w_all[:, i]
        w_sum = w_sum + w
        pick = (us[i] * w_sum < w) & ok_all[:, i]
        sel_dir = jnp.where(pick[:, None], ndir_all[:, i], sel_dir)
        sel_p = jnp.where(pick, q_at_c_all[:, i], sel_p)
        picked_any = picked_any | pick
        sel_canon = sel_canon & ~pick

    # finalize with the canonical sample (streamingResampleFinalizeMis)
    w_c = p_canon * res.W * canon_mis
    M = M + res.M
    w_sum = w_sum + w_c
    pick_c = us[n_neighbors] * w_sum < w_c
    sel_dir = jnp.where(pick_c[:, None], res.dir, sel_dir)
    sel_p = jnp.where(pick_c, p_canon, sel_p)
    picked_any = picked_any | pick_c
    sel_canon = sel_canon | pick_c

    # finalize division by validNeighbors = n_valid + 1 (the canonical sample
    # itself counts, SpatialResampling.slang:153)
    Wn = jnp.where(
        sel_p > 0,
        (w_sum / (valid_count + 1.0)) / jnp.maximum(sel_p, 1e-12),
        0.0,
    )
    Wn = jnp.where(jnp.isfinite(Wn), Wn, 0.0)
    # sel_p is the winner's target at THIS pixel's ctx (a picked neighbor's
    # q_cand_at_c is vis-multiplied, but w=0 candidates are never picked, so
    # the picked value equals the pure target) — cache it for the next pass
    out = Reservoir(dir=sel_dir, W=Wn, M=res.M, valid=(Wn > 0) & ctx.mask, p=sel_p)
    if v_self is not None and unbiased and tracer is not None:
        # a picked neighbor had vis_c multiplied into w (w=0 is never picked
        # by `u*w_sum < w`), so it is visible by construction; a canonical
        # winner carries v_self
        return out, jnp.where(sel_canon, v_self, True)
    return out


def evaluate_final_samples(
    ctx: PixelCtx,
    res: Reservoir,
    env_tex: jnp.ndarray,
    tracer: Optional[Tracer],
    check_visibility: bool = True,
    known_vis: Optional[jnp.ndarray] = None,
) -> LightSample:
    """Winning reservoir -> LightSample with Li = W * Le * vis; differentiable
    wrt env_tex (EvaluateFinalSamples.slang:126-188, the envmap-gradient
    path).  known_vis: [P] bool winner visibility threaded through the
    resampling passes — skips the final shadow-ray trace entirely."""
    vis = jnp.ones((ctx.position.shape[0],))
    if known_vis is not None:
        vis = known_vis.astype(jnp.float32)
    elif check_visibility and tracer is not None:
        ok_ = res.valid & ctx.mask
        vis = (~tracer.occluded(
            ctx.position + ctx.normal * 1e-4, res.dir,
            jnp.where(ok_, 1e9, 0.0), incoherent=True,
        )).astype(jnp.float32)
    le = envlight.eval_le(env_tex, res.dir)
    li = le * (jax.lax.stop_gradient(res.W) * vis)[:, None]
    ok = res.valid & ctx.mask
    return LightSample(
        dir=res.dir,
        distance=jnp.where(ok, 1e9, 0.0),
        Li=jnp.where(ok[:, None], li, 0.0),
    )
