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
    )

    N, Kk = m.ts.shape
    pts = m.xyzs.reshape(-1, 3)
    dirs = safe_normalize(jnp.broadcast_to(m.dirs[:, None, :], (N, Kk, 3))).reshape(-1, 3)

    results: Dict[str, jnp.ndarray] = {}

    if spec.sdf:
        dres = nerf_model.density(params, pts, spec, max_level=max_level)
        sdf = dres["sigma"]
        rgbs = nerf_model.color(params, dres["geo_feat"], dirs, spec)
        raw_normal = nerf_model.normal_autodiff(params, pts, spec)
        alphas = nerf_model.neus_alpha(
            sdf, params["variance"], raw_normal, dirs, m.dts.reshape(-1),
            cos_anneal_ratio=cos_anneal_ratio,
        )
        sig_for_comp = alphas.reshape(N, Kk)
        results["normal"] = raw_normal.reshape(N, Kk, 3)
        results["sdf"] = sdf.reshape(N, Kk)
        alpha_mode = True
    else:
        sigmas, rgbs = nerf_model.forward(
            params, pts, dirs, spec, max_level=max_level, stochastic_key=stochastic_key
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
