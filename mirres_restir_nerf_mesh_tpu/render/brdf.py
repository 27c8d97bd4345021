"""Falcor-style GGX BRDF library, vectorized pure JAX.

Re-implements the reference's Slang BRDF stack (`utils/brdf.slang`,
`utils/brdfDi.slang`, constants from `FinalShading.slang:7-9`):
  - specular albedo  = F0*(1-metallic) + kd*metallic, F0 = 0.04
  - diffuse lobe     = kd*(1-metallic) * max(NdotL, 0)/pi (kd factor applied
    by the caller; `diffuse_light` returns NdotL/pi like Diffuse_light)
  - specular lobe    = F(woDotH) * D_ggx(alpha) * G_smith_corr / (4*NdotV)
  - alpha = linearRoughness^2, zeroed below kMinGGXAlpha = 1e-4
  - lobe selection probabilities from luminance weights
  - sampling: cosine hemisphere (concentric) + GGX NDF, one-sample MIS of the
    two pdfs; `specular_bounce` flagged when sqrt(alpha) <= 0.15.

All functions operate in the local shading frame (z = normal); use
utils.math.onb_frame to build it.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..utils.math import luminance, onb_frame

F0 = 0.04
K_MIN_GGX_ALPHA = 0.01 ** 2
INV_PI = 1.0 / jnp.pi


def to_local(w: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    t, b, nn = onb_frame(n)
    return jnp.stack(
        [jnp.sum(w * t, -1), jnp.sum(w * b, -1), jnp.sum(w * nn, -1)], axis=-1
    )


def to_global(w: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    t, b, nn = onb_frame(n)
    return w[..., 0:1] * t + w[..., 1:2] * b + w[..., 2:3] * nn


def fresnel_schlick(f0, f90, cos_theta):
    return f0 + (f90 - f0) * jnp.maximum(1.0 - cos_theta, 0.0) ** 5


def ndf_ggx(alpha, cos_theta):
    a2 = alpha * alpha
    d = (cos_theta * a2 - cos_theta) * cos_theta + 1.0
    return a2 / jnp.maximum(d * d * jnp.pi, 1e-12)


def _lambda_ggx(alpha_sqr, cos_theta):
    c2 = jnp.clip(cos_theta, 1e-6, 1.0) ** 2
    tan2 = jnp.maximum(1.0 - c2, 0.0) / c2
    lam = 0.5 * (-1.0 + jnp.sqrt(1.0 + alpha_sqr * tan2))
    return jnp.where(cos_theta <= 0, 0.0, lam)


def smith_ggx_correlated(alpha, cos_i, cos_o):
    a2 = alpha * alpha
    return 1.0 / jnp.maximum(1.0 + _lambda_ggx(a2, cos_i) + _lambda_ggx(a2, cos_o), 1e-12)


def alpha_from_roughness(linear_roughness):
    a = linear_roughness * linear_roughness
    return jnp.where(a < K_MIN_GGX_ALPHA, 0.0, a)


def spec_albedo_from(kd: jnp.ndarray, metallic: jnp.ndarray) -> jnp.ndarray:
    return F0 * (1.0 - metallic[..., None]) + kd * metallic[..., None]


def diffuse_light(w_view_l: jnp.ndarray, w_light_l: jnp.ndarray) -> jnp.ndarray:
    """NdotL/pi, zero below the horizon (brdfDi.slang:169 Diffuse_light)."""
    ok = jnp.minimum(w_view_l[..., 2], w_light_l[..., 2]) >= 1e-6
    return jnp.where(ok, jnp.maximum(INV_PI * w_light_l[..., 2], 0.0), 0.0)


def specular_eval(
    w_view_l: jnp.ndarray, w_light_l: jnp.ndarray, spec_albedo: jnp.ndarray, alpha: jnp.ndarray
) -> jnp.ndarray:
    """F*D*G/(4*NdotV) (brdfDi.slang:179-200, activeLobes path)."""
    ok = jnp.minimum(w_view_l[..., 2], w_light_l[..., 2]) >= 1e-6
    h = w_view_l + w_light_l
    h = h / jnp.maximum(jnp.linalg.norm(h, axis=-1, keepdims=True), 1e-12)
    vdoth = jnp.sum(w_view_l * h, axis=-1)
    D = ndf_ggx(alpha, h[..., 2])
    G = smith_ggx_correlated(alpha, w_view_l[..., 2], w_light_l[..., 2])
    Fr = fresnel_schlick(spec_albedo, 1.0, vdoth[..., None])
    val = Fr * (D * G * 0.25 / jnp.maximum(w_view_l[..., 2], 1e-6))[..., None]
    val = jnp.where((alpha > 0)[..., None], val, 0.0)  # delta lobe excluded (as in eval path)
    return jnp.where(ok[..., None], val, 0.0)


def lobe_probabilities(
    kd: jnp.ndarray, metallic: jnp.ndarray, n_dot_v: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Normalized (pDiffuse, pSpecular) (FinalShading.slang:66-81)."""
    spec = spec_albedo_from(kd, metallic)
    diffuse_weight = luminance(kd)
    dielectric = 1.0 - metallic
    p_diff = diffuse_weight * dielectric
    spec_weight = luminance(fresnel_schlick(spec, 1.0, n_dot_v[..., None]))
    p_spec = spec_weight * (metallic + dielectric)
    norm = p_diff + p_spec
    inv = jnp.where(norm > 0, 1.0 / jnp.maximum(norm, 1e-12), 0.0)
    return p_diff * inv, p_spec * inv


def diffuse_pdf(w_light_l: jnp.ndarray) -> jnp.ndarray:
    return jnp.maximum(w_light_l[..., 2], 0.0) * INV_PI


def specular_pdf(w_view_l: jnp.ndarray, w_light_l: jnp.ndarray, alpha: jnp.ndarray) -> jnp.ndarray:
    """pdf of GGX-NDF half-vector sampling mapped to wi (brdfDi.slang:202-223)."""
    ok = jnp.minimum(w_view_l[..., 2], w_light_l[..., 2]) >= 1e-6
    h = w_view_l + w_light_l
    h = h / jnp.maximum(jnp.linalg.norm(h, axis=-1, keepdims=True), 1e-12)
    vdoth = jnp.sum(w_view_l * h, axis=-1)
    pdf = ndf_ggx(alpha, h[..., 2]) * h[..., 2] / jnp.maximum(4.0 * vdoth, 1e-12)
    return jnp.where(ok & (alpha > 0) & (vdoth > 0), pdf, 0.0)


def brdf_eval(
    w_view_l, w_light_l, kd, metallic, alpha, p_diff, p_spec
) -> jnp.ndarray:
    """Full BRDF value (NOT including NdotL cosine... note: Diffuse/Specular
    eval here follow the reference's convention of folding cosine terms:
    diffuse_light includes NdotL/pi, specular G/(4 NdotV) folds the rest)."""
    spec = spec_albedo_from(kd, metallic)
    diff = (kd * (1.0 - metallic[..., None])) * diffuse_light(w_view_l, w_light_l)[..., None]
    diff = jnp.where((p_diff > 0)[..., None], diff, 0.0)
    specv = specular_eval(w_view_l, w_light_l, spec, alpha)
    specv = jnp.where((p_spec > 0)[..., None], specv, 0.0)
    return diff + specv


def brdf_pdf(w_view_l, w_light_l, alpha, p_diff, p_spec) -> jnp.ndarray:
    return p_diff * diffuse_pdf(w_light_l) + p_spec * specular_pdf(w_view_l, w_light_l, alpha)


def _sample_disk_concentric(u: jnp.ndarray) -> jnp.ndarray:
    u = 2.0 * u - 1.0
    ux, uy = u[..., 0], u[..., 1]
    big_x = jnp.abs(ux) > jnp.abs(uy)
    r = jnp.where(big_x, ux, uy)
    safe = lambda a, b: a / jnp.where(jnp.abs(b) < 1e-12, 1.0, b)
    phi = jnp.where(
        big_x, safe(uy, ux) * (jnp.pi / 4), jnp.pi / 2 - safe(ux, uy) * (jnp.pi / 4)
    )
    zero = (ux == 0) & (uy == 0)
    d = r[..., None] * jnp.stack([jnp.cos(phi), jnp.sin(phi)], axis=-1)
    return jnp.where(zero[..., None], 0.0, d)


def sample_cosine_hemisphere(u: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    d = _sample_disk_concentric(u)
    z = jnp.sqrt(jnp.maximum(1.0 - jnp.sum(d * d, axis=-1), 0.0))
    pdf = z * INV_PI
    return jnp.concatenate([d, z[..., None]], axis=-1), pdf


def sample_ggx_ndf(alpha: jnp.ndarray, u: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sample half-vector from D(h)*h.z (brdf.slang:119-129)."""
    a2 = alpha * alpha
    phi = u[..., 1] * 2 * jnp.pi
    tan2 = a2 * u[..., 0] / jnp.maximum(1.0 - u[..., 0], 1e-9)
    cos_t = 1.0 / jnp.sqrt(1.0 + tan2)
    r = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
    h = jnp.stack([jnp.cos(phi) * r, jnp.sin(phi) * r, cos_t], axis=-1)
    pdf = ndf_ggx(alpha, cos_t) * cos_t
    return h, pdf


class BRDFSample(NamedTuple):
    w_light_l: jnp.ndarray        # [N,3] sampled direction, local frame
    pdf: jnp.ndarray              # [N]
    weight: jnp.ndarray           # [N,3] f/pdf (with kd*(1-metal) diffuse factor)
    specular_bounce: jnp.ndarray  # [N] bool
    valid: jnp.ndarray            # [N] bool


def brdf_sample(key: jax.Array, w_view_l, kd, metallic, alpha,
                u=None) -> BRDFSample:
    """One-sample lobe-selected BRDF sampling (brdfDi.slang:285-327
    FalcorBRDF_sample), fully vectorized: both lobes are sampled and the
    selected one is chosen with where().

    u: optional pre-drawn uniforms (u_sel [N], u_d [N,2], u_s [N,2]) —
    live-lane-compacted callers draw them in pixel space (utils/compact.py)
    so chunked calls equal the uncompacted call bitwise."""
    N = w_view_l.shape[0]
    if u is not None:
        u_sel, u_d, u_s = u
    else:
        k_sel, k_d, k_s = jax.random.split(key, 3)
        u_sel = jax.random.uniform(k_sel, (N,))
        u_d = jax.random.uniform(k_d, (N, 2))
        u_s = jax.random.uniform(k_s, (N, 2))

    p_diff, p_spec = lobe_probabilities(kd, metallic, w_view_l[..., 2])

    # diffuse branch
    wi_d, pdf_d = sample_cosine_hemisphere(u_d)
    # specular branch: sample half vector, reflect
    h, _ = sample_ggx_ndf(alpha, u_s)
    vdoth = jnp.sum(w_view_l * h, axis=-1)
    wi_s = 2.0 * vdoth[..., None] * h - w_view_l

    pick_diff = u_sel < p_diff
    wi = jnp.where(pick_diff[..., None], wi_d, wi_s)

    # combined one-sample MIS pdf; the reference skips adding the diffuse pdf
    # to specular picks when roughness <= 0.15 and flags a specular bounce
    rough = jnp.sqrt(alpha)
    sharp_spec = ~pick_diff & (rough <= 0.15)
    pdf = p_diff * diffuse_pdf(wi) + p_spec * specular_pdf(w_view_l, wi, alpha)
    pdf_sharp = p_spec * specular_pdf(w_view_l, wi, alpha)
    pdf = jnp.where(sharp_spec, pdf_sharp, pdf)

    f = brdf_eval(w_view_l, wi, kd, metallic, alpha, p_diff, p_spec)
    valid = (wi[..., 2] > 1e-6) & (w_view_l[..., 2] > 1e-6) & (pdf > 1e-12)
    weight = jnp.where(valid[..., None], f / jnp.maximum(pdf, 1e-12)[..., None], 0.0)

    return BRDFSample(
        w_light_l=wi,
        pdf=jnp.where(valid, pdf, 0.0),
        weight=weight,
        specular_bounce=sharp_spec,
        valid=valid,
    )
