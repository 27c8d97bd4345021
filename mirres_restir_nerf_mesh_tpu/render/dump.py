"""Non-ReSTIR "dump" renderer: all-texel environment lighting (TensoIR-style).

Re-implements the reference `nerf/render_dump.py` (rendering-equation sum over
every envmap texel with solid-angle weights, GGX specular, visibility via
batched closest-hit rays) and the NeRF-as-secondary-visibility path
(`nerf/renderer.py:841-924`: chunked density integration along light rays
giving soft visibility + indirect radiance when no mesh/BVH is available).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..models import envlight
from ..models import nerf as nerf_model
from ..ops.tracer import Tracer
from ..utils.math import safe_normalize
from . import brdf


def envmap_dirs_and_weights(h: int, w: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-texel world directions + solid-angle weights (reference
    nerf/render_helper.py:8-26 generate_envir_map_dir)."""
    vv = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
    uu = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
    V, U = jnp.meshgrid(vv, uu, indexing="ij")
    uv = jnp.stack([U.reshape(-1), 1.0 - V.reshape(-1)], axis=-1)
    d_remap = envlight.uv_to_dir(uv)
    dirs = jnp.stack([-d_remap[:, 0], d_remap[:, 2], d_remap[:, 1]], axis=-1)
    theta = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h * jnp.pi
    solid = (2 * jnp.pi / w) * (jnp.pi / h) * jnp.sin(theta)
    weights = jnp.repeat(solid, w)
    return dirs, weights


def render_dump(
    position: jnp.ndarray,    # [P,3]
    normal: jnp.ndarray,      # [P,3]
    view_dir: jnp.ndarray,    # [P,3]
    mask: jnp.ndarray,        # [P]
    kd: jnp.ndarray,
    roughness: jnp.ndarray,
    metallic: jnp.ndarray,
    env_tex: jnp.ndarray,     # [He,We,3]
    tracer: Optional[Tracer] = None,
    visibility_fn=None,       # alternative: soft visibility(origins, dirs) -> [N]
    texel_chunk: int = 64,
) -> Dict[str, jnp.ndarray]:
    """Full-envmap direct lighting: sum over texels of f * Le * cos * dw * V.

    Deterministic (no sampling noise) — the reference uses this for final
    material dumps and relighting previews (render_dump.py:196-206).
    """
    P = position.shape[0]
    He, We = env_tex.shape[0], env_tex.shape[1]
    dirs, dw = envmap_dirs_and_weights(He, We)
    le_all = env_tex.reshape(-1, 3)
    T = dirs.shape[0]

    alpha = brdf.alpha_from_roughness(roughness)
    w_view = brdf.to_local(-view_dir, normal)
    p_diff, p_spec = brdf.lobe_probabilities(
        kd, metallic, jnp.sum(-view_dir * normal, axis=-1)
    )

    diffuse = jnp.zeros((P, 3))
    specular = jnp.zeros((P, 3))

    for s in range(0, T, texel_chunk):
        e = min(s + texel_chunk, T)
        n_t = e - s
        d_chunk = dirs[s:e]                                  # [n,3]
        le = le_all[s:e] * dw[s:e, None]                     # [n,3] Le*dw

        # broadcast pixels x texels
        dd = jnp.broadcast_to(d_chunk[None], (P, n_t, 3)).reshape(-1, 3)
        org = jnp.repeat(position + normal * 1e-4, n_t, axis=0)
        if tracer is not None:
            vis = (~tracer.occluded(org, dd, 1e9)).astype(jnp.float32)
        elif visibility_fn is not None:
            vis = visibility_fn(org, dd)
        else:
            vis = jnp.ones((P * n_t,))
        vis = vis.reshape(P, n_t)

        w_l = brdf.to_local(
            dd.reshape(P, n_t, 3),
            jnp.broadcast_to(normal[:, None], (P, n_t, 3)),
        )
        wv = jnp.broadcast_to(w_view[:, None], (P, n_t, 3))
        dterm = brdf.diffuse_light(wv, w_l)                  # [P,n]
        sterm = brdf.specular_eval(
            wv, w_l, jnp.broadcast_to(brdf.spec_albedo_from(kd, metallic)[:, None], (P, n_t, 3)),
            jnp.broadcast_to(alpha[:, None], (P, n_t)),
        )                                                     # [P,n,3]
        diffuse = diffuse + jnp.einsum("pn,nc->pc", dterm * vis, le)
        specular = specular + jnp.einsum("pnc,pn,nc->pc", sterm, vis, le)

    color = kd * (1.0 - metallic[:, None]) * diffuse + specular
    bg = envlight.eval_le(env_tex, view_dir)
    return {
        "image_brdf": jnp.where(mask[:, None], color, bg),
        "diffuse_light": jnp.where(mask[:, None], diffuse, 0.0),
        "specular_light": jnp.where(mask[:, None], specular, 0.0),
    }


def nerf_visibility_fn(params, spec: nerf_model.NeRFSpec,
                       n_steps: int = 64, t_max: float = 2.0, sigma_scale: float = 1.0):
    """Soft visibility from the radiance field's density (reference
    renderer.py:841-924): V = exp(-sum sigma * dt) along the light ray."""

    def fn(origins: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
        dt = t_max / n_steps
        ts = (jnp.arange(n_steps, dtype=jnp.float32) + 0.5) * dt
        pts = origins[:, None, :] + dirs[:, None, :] * ts[None, :, None]
        pts = jnp.clip(pts, -spec.bound, spec.bound)
        sig = nerf_model.density(params, pts.reshape(-1, 3), spec)["sigma"]
        tau = jnp.sum(sig.reshape(origins.shape[0], n_steps), axis=1) * dt * sigma_scale
        return jnp.exp(-tau)

    return fn
