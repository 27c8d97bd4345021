"""Stage-0 volume renderer: march -> field -> composite (pure JAX, jittable).

Reference: `nerf/renderer.py:702-839` NeRFRenderer.render.  Unlike the CUDA
path (dynamic point counts + alive-ray inference loop), both train and
inference rendering here share one static-shape pipeline; inference simply
uses a larger per-ray sample capacity.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..models import nerf as nerf_model
from ..ops.marching import composite_rays, march_rays, near_far_from_aabb
from ..utils.math import safe_normalize


def render_rays(
    params: Dict[str, Any],
    occ: jnp.ndarray,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    spec: nerf_model.NeRFSpec,
    aabb: jnp.ndarray,
    *,
    K: int = 64,
    max_steps: int = 1024,
    dt_gamma: float = 0.0,
    min_near: float = 0.05,
    T_thresh: float = 1e-4,
    bg_color: Optional[jnp.ndarray] = None,
    perturb_key: Optional[jax.Array] = None,
    contract: bool = False,
    max_level: Optional[jnp.ndarray] = None,
    cos_anneal_ratio: float = 1.0,
    cam_near_far: Optional[jnp.ndarray] = None,
    stochastic_key: Optional[jax.Array] = None,
    compact_points: Optional[int] = None,
    field_chunk: Optional[int] = None,
    march_candidates: Optional[int] = None,
) -> Dict[str, jnp.ndarray]:
    """Render N rays. Returns image [N,3], depth [N], weights_sum [N], plus
    training extras (weights, xyzs, valid, sigmas, normals in sdf mode)."""
    nears, fars = near_far_from_aabb(rays_o, rays_d, aabb, min_near)
    if cam_near_far is not None:
        nears = jnp.maximum(nears, cam_near_far[:, 0])
        fars = jnp.minimum(fars, cam_near_far[:, 1])

    m = march_rays(
        rays_o, rays_d, occ, nears, fars,
        bound=spec.bound, K=K, max_steps=max_steps, dt_gamma=dt_gamma,
        perturb_key=perturb_key, contract=contract,
        n_candidates=march_candidates,
    )

    N, Kk = m.ts.shape
    pts = m.xyzs.reshape(-1, 3)
    dirs = safe_normalize(jnp.broadcast_to(m.dirs[:, None, :], (N, Kk, 3))).reshape(-1, 3)

    results: Dict[str, jnp.ndarray] = {}

    def _maybe_chunked(fn, *arrays):
        """Memory-bounded field evaluation for big inference batches.

        XLA materializes the hash-grid corner-gather output ([P*8*levels, C]
        rows) inside the small eval graph, and TPU T(8,128) tiling lane-pads
        the C=2 minor dim 64x — a full 8192-ray x K-sample eval chunk blows
        past HBM (observed: f32[44M,2] -> 22.5 GB).  lax.map over fixed
        point sub-batches bounds that buffer without touching the training
        path (field_chunk is only set by make_render_fn)."""
        P = arrays[0].shape[0]
        if field_chunk is None or P <= field_chunk:
            return fn(*arrays)
        pad = (-P) % field_chunk
        padded = [jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1)) for a in arrays]
        n = (P + pad) // field_chunk
        stacked = [a.reshape((n, field_chunk) + a.shape[1:]) for a in padded]
        out = jax.lax.map(lambda xs: fn(*xs), tuple(stacked))
        return jax.tree_util.tree_map(
            lambda o: o.reshape((-1,) + o.shape[2:])[:P], out
        )

    if spec.sdf:
        def _sdf_eval(p, d, dt):
            dres = nerf_model.density(params, p, spec, max_level=max_level)
            sdf = dres["sigma"]
            rgbs = nerf_model.color(params, dres["geo_feat"], d, spec)
            raw_normal = nerf_model.normal_autodiff(params, p, spec)
            alphas = nerf_model.neus_alpha(
                sdf, params["variance"], raw_normal, d, dt,
                cos_anneal_ratio=cos_anneal_ratio,
            )
            return sdf, rgbs, raw_normal, alphas

        sdf, rgbs, raw_normal, alphas = _maybe_chunked(
            _sdf_eval, pts, dirs, m.dts.reshape(-1)
        )
        sig_for_comp = alphas.reshape(N, Kk)
        results["normal"] = raw_normal.reshape(N, Kk, 3)
        results["sdf"] = sdf.reshape(N, Kk)
        alpha_mode = True
    elif compact_points is not None and compact_points < N * Kk:
        # cross-ray compaction (the reference's M-point compacted buffer,
        # raymarching.cu kernel_march_rays_train two-pass design): the field
        # runs ONLY on valid march samples.  With a trained occupancy grid
        # most of the fixed [N,K] lattice is masked; the hash-grid encoder is
        # the dominant cost (~766 ns/point on v5e), so skipping masked points
        # is a direct multiple.  Static shapes: capacity `compact_points`
        # (cfg.num_points, reference main.py:72), ray-ordered truncation on
        # overflow like the reference's adaptive ray-count target.
        NK = N * Kk
        M = compact_points
        valid_flat = m.valid.reshape(-1)
        # stable sort: valid indices first, original order preserved (~1 ms)
        _, order = jax.lax.sort_key_val(
            (~valid_flat).astype(jnp.int32), jnp.arange(NK, dtype=jnp.int32)
        )
        idx = order[:M]
        packed_in = jnp.concatenate([pts, dirs], axis=1)[idx]   # one row gather
        sig_c, rgb_c = _maybe_chunked(
            lambda p, d: nerf_model.forward(
                params, p, d, spec,
                max_level=max_level, stochastic_key=stochastic_key,
            ),
            packed_in[:, 0:3], packed_in[:, 3:6],
        )
        packed_out = jnp.concatenate(
            [sig_c[:, None].astype(jnp.float32), rgb_c.astype(jnp.float32)], axis=1
        )
        rank = jnp.cumsum(valid_flat) - 1                       # [NK]
        in_compact = valid_flat & (rank < M)
        got = packed_out[jnp.clip(rank, 0, M - 1)]              # one row gather
        sigmas = jnp.where(in_compact, got[:, 0], 0.0)
        rgbs = jnp.where(in_compact[:, None], got[:, 1:4], 0.0)
        sig_for_comp = sigmas.reshape(N, Kk)
        alpha_mode = False
    else:
        sigmas, rgbs = _maybe_chunked(
            lambda p, d: nerf_model.forward(
                params, p, d, spec,
                max_level=max_level, stochastic_key=stochastic_key,
            ),
            pts, dirs,
        )
        sig_for_comp = sigmas.reshape(N, Kk)
        alpha_mode = False

    comp = composite_rays(
        sig_for_comp, rgbs.reshape(N, Kk, 3), m.ts, m.dts, m.valid,
        T_thresh=T_thresh, alpha_mode=alpha_mode,
    )

    if bg_color is None:
        bg = jnp.ones((1, 3), jnp.float32)
    else:
        bg = jnp.asarray(bg_color, jnp.float32).reshape(-1, 3)
    image = comp.image + (1.0 - comp.weights_sum)[:, None] * bg

    results.update(
        image=image,
        depth=comp.depth,
        weights=comp.weights,
        weights_sum=comp.weights_sum,
        xyzs=m.xyzs,
        valid=m.valid,
        sigmas=sig_for_comp,
        num_points=jnp.sum(m.valid),
    )
    return results
