"""Monte-Carlo consistency tests for the GGX BRDF and environment light:
importance-sampling estimators must agree with brute-force quadrature
(unbiasedness is the core correctness property ReSTIR later relies on)."""

import jax
import jax.numpy as jnp
import numpy as np

from mirres_restir_nerf_mesh_tpu.models import envlight
from mirres_restir_nerf_mesh_tpu.render import brdf


def _uniform_hemisphere(key, n):
    u = jax.random.uniform(key, (n, 2))
    z = u[:, 0]
    r = jnp.sqrt(jnp.maximum(1 - z * z, 0))
    phi = 2 * jnp.pi * u[:, 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def test_brdf_sample_matches_quadrature():
    key = jax.random.PRNGKey(0)
    N = 200_000
    kd = jnp.tile(jnp.array([[0.6, 0.4, 0.3]]), (N, 1))
    metallic = jnp.full((N,), 0.3)
    alpha = jnp.full((N,), 0.2 ** 2)
    w_view = jnp.tile(jnp.array([[0.3, 0.1, 0.95]]), (N, 1))
    w_view = w_view / jnp.linalg.norm(w_view, axis=-1, keepdims=True)

    # estimator 1: importance sampling, E[f/pdf] (weight already = f/pdf)
    s = brdf.brdf_sample(key, w_view, kd, metallic, alpha)
    est_is = jnp.mean(jnp.where(s.valid[:, None], s.weight, 0.0), axis=0)

    # estimator 2: uniform hemisphere quadrature of f
    wi = _uniform_hemisphere(jax.random.PRNGKey(1), N)
    p_diff, p_spec = brdf.lobe_probabilities(kd, metallic, w_view[:, 2])
    f = brdf.brdf_eval(w_view, wi, kd, metallic, alpha, p_diff, p_spec)
    est_uni = jnp.mean(f, axis=0) * 2 * jnp.pi  # pdf = 1/(2pi)

    np.testing.assert_allclose(np.asarray(est_is), np.asarray(est_uni), rtol=0.05)


def test_brdf_pdf_integrates_to_near_one():
    N = 400_000
    kd = jnp.tile(jnp.array([[0.6, 0.4, 0.3]]), (N, 1))
    metallic = jnp.full((N,), 0.3)
    alpha = jnp.full((N,), 0.3 ** 2)
    w_view = jnp.tile(jnp.array([[0.2, -0.1, 0.97]]), (N, 1))
    w_view = w_view / jnp.linalg.norm(w_view, axis=-1, keepdims=True)
    p_diff, p_spec = brdf.lobe_probabilities(kd, metallic, w_view[:, 2])

    wi = _uniform_hemisphere(jax.random.PRNGKey(2), N)
    pdf = brdf.brdf_pdf(w_view, wi, alpha, p_diff, p_spec)
    integral = float(jnp.mean(pdf) * 2 * jnp.pi)
    assert 0.9 < integral < 1.05, integral


def test_white_furnace_energy_conservation():
    # perfect white diffuse, no metal: integral of f*cos over hemisphere ~ albedo
    N = 200_000
    kd = jnp.ones((N, 3))
    metallic = jnp.zeros((N,))
    alpha = jnp.full((N,), 0.5 ** 2)
    w_view = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (N, 1))
    wi = _uniform_hemisphere(jax.random.PRNGKey(3), N)
    p_diff, p_spec = brdf.lobe_probabilities(kd, metallic, w_view[:, 2])
    f = brdf.brdf_eval(w_view, wi, kd, metallic, alpha, p_diff, p_spec)
    # note: brdf_eval folds NdotL/pi into the diffuse term already
    integral = np.asarray(jnp.mean(f, axis=0) * 2 * jnp.pi)
    assert (integral < 1.15).all(), integral
    assert (integral > 0.8).all(), integral


def test_envmap_importance_sampling_unbiased():
    # random bright-spot envmap; MC integral of Le must match quadrature
    key = jax.random.PRNGKey(0)
    H, W = 32, 64
    tex = jax.random.uniform(key, (H, W, 3)) ** 4 * 5.0
    dist = envlight.build_distribution(tex)

    N = 200_000
    rnd = jax.random.uniform(jax.random.PRNGKey(1), (N, 2))
    d, le, pdf = envlight.sample_li(tex, dist, rnd)
    est = np.asarray(jnp.mean(le / jnp.maximum(pdf, 1e-12)[:, None], axis=0))

    # quadrature over the lat-long grid
    v = (np.arange(H) + 0.5) / H
    theta = (1.0 - (1.0 - v)) * np.pi  # row i -> v_env = 1 - (i+.5)/H -> theta
    theta = (np.arange(H) + 0.5) / H * np.pi
    sin_t = np.sin(theta)
    texel_solid = (2 * np.pi / W) * (np.pi / H) * sin_t  # [H]
    ref = (np.asarray(tex) * texel_solid[:, None, None]).sum(axis=(0, 1))

    np.testing.assert_allclose(est, ref, rtol=0.05)

    # pdf_li should agree with the sampling pdf at the sampled directions
    pdf2 = envlight.pdf_li(dist, d)
    ratio = np.asarray(pdf2 / jnp.maximum(pdf, 1e-12))
    # texel-quantized pdf lookups: the bulk must match
    assert np.median(np.abs(ratio - 1.0)) < 0.05


def test_env_dir_uv_roundtrip():
    key = jax.random.PRNGKey(4)
    d = jax.random.normal(key, (1000, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    uv = envlight.dir_to_uv(d)
    d2 = envlight.uv_to_dir(uv)
    np.testing.assert_allclose(np.asarray(d2), np.asarray(d), atol=1e-4)


def test_eval_le_matches_texture_at_texel_centers():
    H, W = 16, 32
    tex = jnp.arange(H * W * 3, dtype=jnp.float32).reshape(H, W, 3) / (H * W * 3)
    # pick the direction of texel (row 4, col 7) center and check bilinear == texel
    u = (7 + 0.5) / W
    v_env = 1.0 - (4 + 0.5) / H
    d_remap = envlight.uv_to_dir(jnp.array([[u, v_env]]))
    d_world = jnp.stack([-d_remap[..., 0], d_remap[..., 2], d_remap[..., 1]], axis=-1)
    le = envlight.eval_le(tex, d_world)
    np.testing.assert_allclose(np.asarray(le[0]), np.asarray(tex[4, 7]), rtol=1e-4)


def test_alias_table_matches_cdf_sampler():
    """Alias-table envmap sampling (make_sampleable.slang:90-186 variants):
    same target distribution as the CDF inversion sampler — MC estimates of
    the env integral agree, and the per-texel pdf matches pdf_li."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from mirres_restir_nerf_mesh_tpu.models import envlight as E

    key = jax.random.PRNGKey(0)
    H, W = 16, 32
    tex = jax.random.uniform(key, (H, W, 3), minval=0.05, maxval=1.0) ** 3
    dist = E.build_distribution(tex)
    table = E.build_alias_table(tex)

    n = 200_000
    rnd = jax.random.uniform(jax.random.fold_in(key, 1), (n, 2))
    d_a, le_a, pdf_a = E.sample_li_alias(tex, table, rnd)
    d_c, le_c, pdf_c = E.sample_li(tex, dist, rnd)

    # unbiased estimates of integral(Le dOmega) agree between samplers
    est_a = float(jnp.mean(jnp.sum(le_a, -1) / jnp.maximum(pdf_a, 1e-9)))
    est_c = float(jnp.mean(jnp.sum(le_c, -1) / jnp.maximum(pdf_c, 1e-9)))
    assert abs(est_a - est_c) / est_c < 0.03, (est_a, est_c)

    # alias pdf at sampled dirs matches the CDF pdf query
    pdf_q = E.pdf_li(dist, d_a)
    ratio = np.asarray(pdf_a / jnp.maximum(pdf_q, 1e-9))
    # texel-center vs continuous-angle discretization: agree in the bulk
    assert np.median(np.abs(ratio - 1.0)) < 0.1

    # directions are unit and valid
    assert np.allclose(np.linalg.norm(np.asarray(d_a), axis=1), 1.0, atol=1e-4)


def test_quantile_sampler_self_consistent_and_unbiased():
    """EnvSampler (device-built quantile table, the production TPU path):
    (1) the MC env-integral estimate using its REPORTED pdf matches
    quadrature (unbiasedness for the distribution actually sampled);
    (2) per-texel sampling frequency matches the reported pdf;
    (3) pdf_li dispatch agrees with the sampling pdf at sampled dirs."""
    key = jax.random.PRNGKey(0)
    H, W = 32, 64
    tex = jax.random.uniform(key, (H, W, 3)) ** 4 * 5.0
    s = envlight.build_sampler(tex, m=65536)

    N = 400_000
    rnd = jax.random.uniform(jax.random.PRNGKey(1), (N, 2))
    d, le, pdf = envlight.sample_li(tex, s, rnd)
    assert bool(jnp.all(pdf > 0))
    est = np.asarray(jnp.mean(le / pdf[:, None], axis=0))

    theta = (np.arange(H) + 0.5) / H * np.pi
    sin_t = np.sin(theta)
    texel_solid = (2 * np.pi / W) * (np.pi / H) * sin_t
    ref = (np.asarray(tex) * texel_solid[:, None, None]).sum(axis=(0, 1))
    np.testing.assert_allclose(est, ref, rtol=0.05)

    # frequency consistency: count samples per texel vs count/m prediction
    uv = envlight.dir_to_uv(envlight.ngp_dir(d))
    col = np.clip((np.asarray(uv[:, 0]) * W).astype(int), 0, W - 1)
    row = np.clip(((1.0 - np.asarray(uv[:, 1])) * H).astype(int), 0, H - 1)
    freq = np.zeros((H, W))
    np.add.at(freq, (row, col), 1.0 / N)
    m = s.table.shape[0]
    cnt = np.zeros(H * W)
    np.add.at(cnt, np.asarray(s.table), 1.0 / m)
    pred = cnt.reshape(H, W)
    # texels with >= ~1200 expected samples (Poisson sigma ~3%): 0.2 rtol
    # is then > 6 sigma — fails on systematic error, not noise
    big = pred > 200.0 / m
    np.testing.assert_allclose(freq[big], pred[big], rtol=0.2)

    pdf2 = envlight.pdf_li(s, d)
    ratio = np.asarray(pdf2 / jnp.maximum(pdf, 1e-12))
    assert np.median(np.abs(ratio - 1.0)) < 0.05
