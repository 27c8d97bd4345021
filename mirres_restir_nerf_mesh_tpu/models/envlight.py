"""Trainable environment light: lat-long HDR texture + importance sampling.

Re-implements the reference's environment stack in pure JAX:
  - trainable H x W x 3 texture, init 0.5 (reference nerf/render_helper.py:126-156
    create_trainable_env_rnd, scale=0, bias=0.5)
  - world-dir -> lat-long lookup with the `ngp_dir` axis remap
    (x,y,z) -> (-x, z, y) (reference utils/lightDi.slang:432, env_le :119-131)
  - luminance x sin(theta) 2D distribution + CDF inversion sampling
    (make_sampleable.slang:34-56, InfiniteAreaLight_Sample_Li
    lightDi.slang:150-244, pdf_li :313-330) via vectorized searchsorted.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..utils.math import luminance


def init_envlight(h: int = 256, w: int = 512, bias: float = 0.5) -> jnp.ndarray:
    return jnp.full((h, w, 3), bias, jnp.float32)


def ngp_dir(d: jnp.ndarray) -> jnp.ndarray:
    """World-axis remap before lat-long lookup (lightDi.slang:432)."""
    return jnp.stack([-d[..., 0], d[..., 2], d[..., 1]], axis=-1)


def dir_to_uv(d: jnp.ndarray) -> jnp.ndarray:
    """Remapped dir -> (u, v); v=1 at +y pole (env_le convention)."""
    d = jnp.clip(d, -1.0, 1.0)
    theta = jnp.arccos(jnp.clip(d[..., 1], -1.0, 1.0))
    phi = jnp.arctan2(d[..., 2], d[..., 0])
    phi = jnp.where(phi < 0, phi + 2 * jnp.pi, phi)
    return jnp.stack([phi / (2 * jnp.pi), 1.0 - theta / jnp.pi], axis=-1)


def uv_to_dir(uv: jnp.ndarray) -> jnp.ndarray:
    """(u, v in env_le convention) -> remapped dir."""
    phi = uv[..., 0] * 2 * jnp.pi
    theta = (1.0 - uv[..., 1]) * jnp.pi
    st, ct = jnp.sin(theta), jnp.cos(theta)
    return jnp.stack([st * jnp.cos(phi), ct, st * jnp.sin(phi)], axis=-1)


def _bilinear(tex: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Bilinear texture lookup; u wraps, v clamps. tex [H,W,C], uv [...,2].
    Texel centers at (x+0.5)/W; v indexes rows top-to-bottom with row 0 at
    v=1 (matching eval_bi in utils/helper.slang).

    Executed as ONE wide-row gather of a packed-quad table (each texel row
    carries self + x-wrap + y-clamp + xy neighbors, built by cheap
    roll/concat) — row gathers are latency-priced per row, not per byte
    (CLAUDE.md cost model), so this is ~4x cheaper than four 2-D gathers
    at path-tracing batch sizes.  The packing's autodiff transpose
    scatter-adds the four contributions back: texture gradients are
    identical to the naive form."""
    H, W, C = tex.shape
    tx = jnp.roll(tex, -1, axis=1)                      # x+1 (wraps)
    ty = jnp.concatenate([tex[1:], tex[-1:]], axis=0)   # y+1 (clamps)
    txy = jnp.roll(ty, -1, axis=1)
    packed = jnp.concatenate([tex, tx, ty, txy], axis=-1).reshape(H * W, 4 * C)

    x = uv[..., 0] * W - 0.5
    y = (1.0 - uv[..., 1]) * H - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    # top edge (y0 < 0): both bilinear rows clamp to row 0; the packed row 0
    # carries (row0, row1) so force fy=0 to reproduce the pure-row-0 mix
    fy = jnp.where(y0 < 0, 0.0, y - y0)[..., None]
    xi = jnp.mod(x0.astype(jnp.int32), W)
    yi = jnp.clip(y0.astype(jnp.int32), 0, H - 1)
    q = packed[yi * W + xi]
    c00, c10 = q[..., 0:C], q[..., C:2 * C]
    c01, c11 = q[..., 2 * C:3 * C], q[..., 3 * C:4 * C]
    return (c00 * (1 - fx) + c10 * fx) * (1 - fy) + (c01 * (1 - fx) + c11 * fx) * fy


def eval_le(tex: jnp.ndarray, dir_world: jnp.ndarray) -> jnp.ndarray:
    """Environment radiance for world directions [..., 3]."""
    d = ngp_dir(dir_world)
    uv = dir_to_uv(d)
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - d[..., 1] ** 2, 0.0))
    le = _bilinear(tex, uv)
    return jnp.where(sin_theta[..., None] < 1e-4, 0.0, le)


def eval_le_nearest(tex: jnp.ndarray, dir_world: jnp.ndarray) -> jnp.ndarray:
    """Nearest-texel radiance lookup: ONE row gather instead of bilinear's
    four.  Used ONLY inside resampling target functions (p-hat) — RIS/GRIS
    is unbiased for ANY target function evaluated consistently within a
    pass, so the cheaper lookup changes variance (negligibly at envmap
    resolutions) but never the estimator's expectation.  Radiance that
    reaches the image (evaluate_final_samples, escape hits, backgrounds)
    keeps the differentiable bilinear eval_le."""
    H, W = tex.shape[0], tex.shape[1]
    d = ngp_dir(dir_world)
    uv = dir_to_uv(d)
    x = jnp.mod((uv[..., 0] * W).astype(jnp.int32), W)
    y = jnp.clip(((1.0 - uv[..., 1]) * H).astype(jnp.int32), 0, H - 1)
    le = tex.reshape(H * W, -1)[y * W + x]
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - d[..., 1] ** 2, 0.0))
    return jnp.where(sin_theta[..., None] < 1e-4, 0.0, le)


class EnvDistribution(NamedTuple):
    pdf2d: jnp.ndarray       # [H, W] conditional pdf over u per row (normalized, mean 1)
    row_cdf: jnp.ndarray     # [H, W+1]
    mpdf: jnp.ndarray        # [H] marginal pdf over v (mean 1)
    mcdf: jnp.ndarray        # [H+1]


def build_distribution(tex: jnp.ndarray) -> EnvDistribution:
    """Luminance x sin(theta) 2D distribution (make_sampleable + torch cumsum
    glue, reference GenerateLightTiles.py:4-29)."""
    H, W = tex.shape[0], tex.shape[1]
    v = (jnp.arange(H, dtype=jnp.float32) + 0.5) / H
    # texel-center radiance: row h at v coordinate (env_le-style v measured
    # from the bottom), weight = luminance * sin(pi * v_row)
    w_lum = luminance(tex)  # tex row 0 corresponds to v ~= 1
    sin_t = jnp.sin(jnp.pi * v)[::-1]  # row 0 (top) has v close to 1
    weight = w_lum * sin_t[:, None] + 1e-10  # [H, W]

    row_sum = jnp.sum(weight, axis=1)  # [H]
    cond_pdf = weight / row_sum[:, None] * W  # pdf in u units (integral 1 over [0,1])
    row_cdf = jnp.concatenate(
        [jnp.zeros((H, 1)), jnp.cumsum(weight / row_sum[:, None], axis=1)], axis=1
    )

    total = jnp.sum(row_sum)
    mpdf = row_sum / total * H
    mcdf = jnp.concatenate([jnp.zeros((1,)), jnp.cumsum(row_sum / total)])
    return EnvDistribution(cond_pdf, row_cdf, mpdf, mcdf)


def sample_li(
    tex: jnp.ndarray, dist, rnd: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Importance-sample the environment. rnd [...,2] in [0,1).

    dist: EnvDistribution (exact 2-level CDF inversion, parity backend) or
    EnvSampler (O(1) quantile table, production TPU path — per-sample CDF
    inversion costs ~190 ns/sample in row-wise searchsorted gathers).

    Returns (dir_world [...,3], Le [...,3], pdf_solid_angle [...]).
    """
    if isinstance(dist, EnvSampler):
        return _sample_li_table(tex, dist, rnd)
    H, W = tex.shape[0], tex.shape[1]
    u1, u2 = rnd[..., 0], rnd[..., 1]

    row = jnp.clip(jnp.searchsorted(dist.mcdf, u2, side="right") - 1, 0, H - 1)
    # within-row残量 -> v offset
    seg_lo = dist.mcdf[row]
    seg_w = dist.mpdf[row] / H
    fv = jnp.clip((u2 - seg_lo) / jnp.maximum(seg_w, 1e-12), 0.0, 1.0)

    def row_search(r, u):
        return jnp.clip(jnp.searchsorted(dist.row_cdf[r], u, side="right") - 1, 0, W - 1)

    col = jax.vmap(row_search)(row.reshape(-1), u1.reshape(-1)).reshape(row.shape)
    cel_lo = jnp.take_along_axis(
        dist.row_cdf.reshape(H, W + 1)[row.reshape(-1)], col.reshape(-1, 1), axis=1
    ).reshape(row.shape)
    cel_w = dist.pdf2d[row.reshape(-1), col.reshape(-1)].reshape(row.shape) / W
    fu = jnp.clip((u1 - cel_lo) / jnp.maximum(cel_w, 1e-12), 0.0, 1.0)

    # texture-space (u, v_tex measured top-down); env v = 1 - v_tex
    u = (col + fu) / W
    v_tex = (row + fv) / H
    uv = jnp.stack([u, 1.0 - v_tex], axis=-1)

    d_remap = uv_to_dir(uv)
    # invert ngp_dir: remap (x,y,z)->(-x,z,y) is an involution composed with sign:
    # world = (-dx, dz, dy)
    dir_world = jnp.stack([-d_remap[..., 0], d_remap[..., 2], d_remap[..., 1]], axis=-1)

    theta = (1.0 - uv[..., 1]) * jnp.pi
    sin_theta = jnp.maximum(jnp.sin(theta), 1e-6)
    pdf2d = dist.pdf2d[row.reshape(-1), col.reshape(-1)].reshape(row.shape) * dist.mpdf[row]
    pdf = pdf2d / (2.0 * jnp.pi * jnp.pi * sin_theta)

    le = _bilinear(tex, uv)
    return dir_world, le, pdf


def pdf_li(dist, dir_world: jnp.ndarray) -> jnp.ndarray:
    """Solid-angle pdf of sampling a world direction
    (reference InfiniteAreaLight_pdf_li, lightDi.slang:313-330)."""
    if isinstance(dist, EnvSampler):
        return _pdf_li_sampler(dist, dir_world)
    H, W = dist.pdf2d.shape
    d = ngp_dir(dir_world)
    uv = dir_to_uv(d)
    theta = (1.0 - uv[..., 1]) * jnp.pi
    sin_theta = jnp.sin(theta)
    col = jnp.clip((uv[..., 0] * W).astype(jnp.int32), 0, W - 1)
    row = jnp.clip(((1.0 - uv[..., 1]) * H).astype(jnp.int32), 0, H - 1)
    pdf2d = dist.pdf2d[row, col] * dist.mpdf[row]
    pdf = pdf2d / (2.0 * jnp.pi * jnp.pi * jnp.maximum(sin_theta, 1e-6))
    return jnp.where(jnp.abs(sin_theta) < 1e-4, 0.0, pdf)


class AliasTable(NamedTuple):
    """Vose alias table over envmap texels (reference make_sampleable.slang
    build_alias_map/buildEnvLightAliasTable/AliasTable, :90-186 — the O(1)
    sampling variant of the 2D CDF)."""

    q: jnp.ndarray       # [H*W] acceptance probability per slot
    alias: jnp.ndarray   # [H*W] alias texel per slot
    pdf: jnp.ndarray     # [H, W] solid-angle pdf per texel


def build_alias_table(tex) -> AliasTable:
    """Host-side O(n) Vose construction (the reference runs the same
    sequential partition loop in a single CUDA thread, build_alias_map)."""
    import numpy as np

    t = np.asarray(tex, np.float32)
    H, W = t.shape[0], t.shape[1]
    v = (np.arange(H, dtype=np.float32) + 0.5) / H
    sin_t = np.sin(np.pi * v)[::-1]
    lum = 0.2126 * t[..., 0] + 0.7152 * t[..., 1] + 0.0722 * t[..., 2]
    w = (lum * sin_t[:, None] + 1e-10).reshape(-1)
    p = w / w.sum()
    n = p.size
    q = p * n
    alias = np.arange(n, dtype=np.int64)
    small = [i for i in range(n) if q[i] < 1.0]
    large = [i for i in range(n) if q[i] >= 1.0]
    while small and large:
        s, l = small.pop(), large.pop()
        alias[s] = l
        q[l] = q[l] + q[s] - 1.0
        (small if q[l] < 1.0 else large).append(l)
    # solid-angle pdf per texel: p / (texel solid angle)
    omega = (2 * np.pi / W) * (np.pi / H) * sin_t[:, None]
    pdf = (p.reshape(H, W) / np.maximum(omega, 1e-12)).astype(np.float32)
    return AliasTable(
        q=jnp.asarray(np.clip(q, 0.0, None), jnp.float32),
        alias=jnp.asarray(alias.astype(np.int32)),
        pdf=jnp.asarray(pdf),
    )


def sample_li_alias(
    tex: jnp.ndarray, table: AliasTable, rnd: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """O(1)-per-sample envmap importance sampling through the alias table;
    same output contract as sample_li (dir_world, Le, pdf_solid_angle)."""
    H, W = tex.shape[0], tex.shape[1]
    n = H * W
    u1, u2 = rnd[..., 0], rnd[..., 1]
    slot = jnp.clip((u1 * n).astype(jnp.int32), 0, n - 1)
    frac = u1 * n - slot
    q = table.q[slot]
    take_alias = frac >= q
    texel = jnp.where(take_alias, table.alias[slot], slot)
    row = texel // W
    col = texel % W
    # reuse the leftover uniform mass as the in-texel v jitter
    leftover = jnp.where(
        take_alias,
        (frac - q) / jnp.maximum(1.0 - q, 1e-8),
        frac / jnp.maximum(q, 1e-8),
    )
    u = (col.astype(jnp.float32) + u2) / W
    v_tex = (row.astype(jnp.float32) + jnp.clip(leftover, 0.0, 1.0 - 1e-6)) / H
    uv = jnp.stack([u, 1.0 - v_tex], axis=-1)
    d_remap = uv_to_dir(uv)
    dir_world = jnp.stack(
        [-d_remap[..., 0], d_remap[..., 2], d_remap[..., 1]], axis=-1
    )
    le = _bilinear(tex, uv)
    pdf = table.pdf[row, col]
    return dir_world, le, pdf


class EnvSampler(NamedTuple):
    """Device-buildable O(1) envmap importance sampler.

    The reference samples its env light through a Vose alias table built by a
    sequential loop in a single CUDA thread (make_sampleable.slang
    build_alias_map:90-186) — impossible to vectorize, and the envmap is
    TRAINABLE, so the table must be rebuilt inside every jitted train step.
    TPU-native replacement: an M-entry inverse-CDF quantile table.

      table[k] = texel index at CDF quantile (k+0.5)/M   (ONE shared
                 searchsorted over the flat texel CDF: no per-sample binary
                 search, no per-row gathers)
      pdf      = the sampler's ACTUAL solid-angle pdf: count_in_table/M per
                 texel over the texel solid angle.

    Sampling draws table[floor(u1*M)] — exactly probability count/M per
    texel — and every pdf the renderer reports uses the same `pdf` texture,
    so estimators remain exactly unbiased for the distribution actually
    sampled (the staircase quantization of the true one).  Texels whose mass
    quantizes to zero entries are never light-sampled and carry pdf 0; the
    BRDF strategy's balance-heuristic MIS weight becomes 1 there, keeping
    full coverage of the integrand (standard partial-support MIS).
    """

    table: jnp.ndarray   # [M] int32 texel at each quantile
    pdf: jnp.ndarray     # [H, W] actual solid-angle pdf (0 where unsampled)


def build_sampler(tex: jnp.ndarray, m: int = 65536) -> EnvSampler:
    """Build the quantile-table sampler on device (jit-safe, differentiable
    inputs are fine — the result is meant to be used under stop_gradient)."""
    H, W = tex.shape[0], tex.shape[1]
    v = (jnp.arange(H, dtype=jnp.float32) + 0.5) / H
    sin_t = jnp.sin(jnp.pi * v)[::-1]
    weight = (luminance(tex) * sin_t[:, None] + 1e-10).reshape(-1)  # [H*W]
    p = weight / jnp.sum(weight)
    cdf = jnp.cumsum(p)
    qs = (jnp.arange(m, dtype=jnp.float32) + 0.5) / m
    # both sides are sorted: the sort-based lowering is one fused sort
    # (~1 ms/655k pairs, CLAUDE.md cost model) instead of log2(H*W) rounds
    # of [m] binary-search gathers, with identical results
    table = jnp.clip(
        jnp.searchsorted(cdf, qs, side="right", method="sort"), 0, H * W - 1
    ).astype(jnp.int32)
    cnt = jnp.zeros((H * W,), jnp.float32).at[table].add(1.0)
    omega = (2 * jnp.pi / W) * (jnp.pi / H) * sin_t[:, None]          # [H,W]
    pdf = (cnt.reshape(H, W) / m) / jnp.maximum(omega, 1e-12)
    return EnvSampler(table=table, pdf=pdf)


def _sample_li_table(
    tex: jnp.ndarray, s: EnvSampler, rnd: jnp.ndarray, nearest_le: bool = False
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """O(1)-per-sample draw through the quantile table.

    nearest_le=False: one table gather, one pdf gather, one bilinear Le tap
    (radiance that reaches the image must be the differentiable bilinear).
    nearest_le=True: ONE gather per sample of a per-quantile packed record
    (row, col, pdf, center-texel Le) — for light-TILE presampling, whose Le
    only ever enters resampling target functions (the final-sample eval
    re-evaluates the winner's Le bilinearly), the same nearest-texel target
    convention the reuse passes already use (eval_le_nearest)."""
    H, W = tex.shape[0], tex.shape[1]
    m = s.table.shape[0]
    u1, u2 = rnd[..., 0], rnd[..., 1]
    k = jnp.clip((u1 * m).astype(jnp.int32), 0, m - 1)
    frac = u1 * m - k                     # leftover mass -> in-texel jitter
    if nearest_le:
        texel = s.table
        rec_tex = jnp.concatenate(
            [
                (texel // W).astype(jnp.float32)[:, None],
                (texel % W).astype(jnp.float32)[:, None],
                s.pdf.reshape(-1)[texel][:, None],
                tex.reshape(H * W, -1)[texel],
            ],
            axis=1,
        )  # [m, 6]
        r = rec_tex[k]
        rowf, colf, pdf, le = r[..., 0], r[..., 1], r[..., 2], r[..., 3:6]
        u = (colf + u2) / W
        v_tex = (rowf + jnp.clip(frac, 0.0, 1.0 - 1e-6)) / H
        uv = jnp.stack([u, 1.0 - v_tex], axis=-1)
        d_remap = uv_to_dir(uv)
        dir_world = jnp.stack(
            [-d_remap[..., 0], d_remap[..., 2], d_remap[..., 1]], axis=-1
        )
        # Match eval_le_nearest's pole-cone convention (it zeroes Le at
        # sin_theta < 1e-4) so a p-hat threaded from this record equals the
        # one temporal/spatial would re-evaluate.  The remaining gap is the
        # uv->dir->uv float roundtrip, which can flip to an adjacent texel
        # exactly at texel boundaries — threading is NEAR-exact, not bitwise.
        sin_theta = jnp.sqrt(jnp.maximum(1.0 - d_remap[..., 1] ** 2, 0.0))
        le = jnp.where(sin_theta[..., None] < 1e-4, 0.0, le)
        return dir_world, le, pdf
    texel = s.table[k]
    row = texel // W
    col = texel % W
    u = (col.astype(jnp.float32) + u2) / W
    v_tex = (row.astype(jnp.float32) + jnp.clip(frac, 0.0, 1.0 - 1e-6)) / H
    uv = jnp.stack([u, 1.0 - v_tex], axis=-1)
    d_remap = uv_to_dir(uv)
    dir_world = jnp.stack(
        [-d_remap[..., 0], d_remap[..., 2], d_remap[..., 1]], axis=-1
    )
    le = _bilinear(tex, uv)
    pdf = s.pdf[row, col]
    return dir_world, le, pdf


def _pdf_li_sampler(s: EnvSampler, dir_world: jnp.ndarray) -> jnp.ndarray:
    H, W = s.pdf.shape
    d = ngp_dir(dir_world)
    uv = dir_to_uv(d)
    col = jnp.clip((uv[..., 0] * W).astype(jnp.int32), 0, W - 1)
    row = jnp.clip(((1.0 - uv[..., 1]) * H).astype(jnp.int32), 0, H - 1)
    return s.pdf[row, col]


def generate_image(tex: jnp.ndarray) -> jnp.ndarray:
    """The raw texture is the lat-long image (reference EnvironmentLight
    .generate_image via dr.texture)."""
    return tex
