"""normal-AO + per-pixel variance phi (render/denoise.py), reference
EAWDenoise.slang process_normal_ao / process_variance and the
lambda_extra_kd loss (nerf/utils.py:284-288, renderer.py:1151-1158)."""

import numpy as np
import jax
import jax.numpy as jnp

from mirres_restir_nerf_mesh_tpu.render.denoise import normal_ao, variance_phi


def test_normal_ao_flags_creases_not_flats():
    H = W = 32
    # left half: flat +z normals; right half: a sharp crease pattern
    n = np.zeros((H, W, 3), np.float32)
    n[:, : W // 2] = [0, 0, 1]
    for x in range(W // 2, W):
        n[:, x] = [0.8, 0, 0.6] if x % 2 == 0 else [-0.8, 0, 0.6]
    mask = np.ones((H, W), bool)
    ao = np.asarray(normal_ao(jnp.asarray(n), jnp.asarray(mask)))
    flat = ao[8:24, 4 : W // 2 - 4].mean()
    crease = ao[8:24, W // 2 + 4 : -4].mean()
    assert flat < 0.05, f"flat region must have ~no AO, got {flat}"
    assert crease > 0.5, f"crease region must be dark, got {crease}"
    # misses are zero
    mask[:4] = False
    ao2 = np.asarray(normal_ao(jnp.asarray(n), jnp.asarray(mask)))
    assert np.all(ao2[:4] == 0)


def test_normal_ao_darkens_concavity():
    """A concave V-groove (normals facing each other) gets more AO than a
    smooth convex bump."""
    H = W = 32
    mask = jnp.ones((H, W), bool)
    # V-groove along x: normals flip at the valley
    xs = np.linspace(-1, 1, W, dtype=np.float32)
    groove = np.zeros((H, W, 3), np.float32)
    groove[:, xs < 0] = [0.7, 0, 0.714]
    groove[:, xs >= 0] = [-0.7, 0, 0.714]
    # smooth bump: slowly varying normals
    bump = np.stack(
        [np.broadcast_to(np.sin(0.2 * xs), (H, W)),
         np.zeros((H, W)),
         np.broadcast_to(np.cos(0.2 * xs), (H, W))], -1
    ).astype(np.float32)
    ao_g = float(np.asarray(normal_ao(jnp.asarray(groove), mask))[:, W // 2 - 2 : W // 2 + 2].mean())
    ao_b = float(np.asarray(normal_ao(jnp.asarray(bump), mask))[:, W // 2 - 2 : W // 2 + 2].mean())
    assert ao_g > ao_b + 0.3


def test_variance_phi_tracks_noise():
    H = W = 32
    rng = np.random.RandomState(0)
    noisy = rng.rand(H, W, 3).astype(np.float32)
    flat = np.full((H, W, 3), 0.5, np.float32)
    n = np.tile(np.array([0, 0, 1], np.float32), (H, W, 1))
    p = np.zeros((H, W, 3), np.float32)
    mask = jnp.ones((H, W), bool)
    phi_noisy = np.asarray(variance_phi(jnp.asarray(noisy), jnp.asarray(n), jnp.asarray(p), mask, 1))
    phi_flat = np.asarray(variance_phi(jnp.asarray(flat), jnp.asarray(n), jnp.asarray(p), mask, 1))
    assert phi_noisy[..., 0].mean() > 0.1
    assert phi_flat[..., 0].max() < 1e-5
    # normal/pos channels are flat here
    assert phi_noisy[..., 1].max() < 1e-5
    # misses get the 1e-6 sentinel
    m2 = jnp.asarray(np.zeros((H, W), bool))
    phi_m = np.asarray(variance_phi(jnp.asarray(noisy), jnp.asarray(n), jnp.asarray(p), m2, 1))
    assert np.allclose(phi_m, 1e-6)


def test_lambda_extra_kd_loss_wired():
    """stage-1 render emits normal_ao when compute_normal_ao is set and the
    loss consumes it."""
    from mirres_restir_nerf_mesh_tpu.config import Config, finalize
    from mirres_restir_nerf_mesh_tpu.models.material import MaterialSpec, init_material
    from mirres_restir_nerf_mesh_tpu.models.nerf import NeRFSpec, init_nerf
    from mirres_restir_nerf_mesh_tpu.models.envlight import init_envlight
    from mirres_restir_nerf_mesh_tpu.render.stage1 import (
        Stage1Params, Stage1Static, render_stage1,
    )
    from tests.test_antialias import make_sphere

    HH = 32  # small frame: the compile cost dominates this CPU test
    verts, tris = make_sphere()
    ys, xs = np.meshgrid(
        np.linspace(-0.5, 0.5, HH), np.linspace(-0.5, 0.5, HH), indexing="ij"
    )
    d = np.stack([xs, ys, -np.ones_like(xs)], -1).reshape(-1, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    rays_o = jnp.asarray(np.tile(np.array([0, 0, 2.2], np.float32), (d.shape[0], 1)))
    rays_d = jnp.asarray(d)
    spec = NeRFSpec(bound=1.0, grid_levels=4, grid_log2_hashmap_size=12,
                    grid_desired_resolution=32, hidden_dim=16, hidden_dim_color=16,
                    geo_feat_dim=7)
    mspec = MaterialSpec(bound=1.0)
    static = Stage1Static(
        tris=jnp.asarray(tris), nerf_spec=spec, mat_spec=mspec,
        spp=1, bounces=1, use_restir=False, H=HH, W=HH,
        compute_normal_ao=True,
    )
    key = jax.random.PRNGKey(0)
    params = Stage1Params(
        nerf=init_nerf(key, spec), offsets=jnp.zeros((verts.shape[0], 3)),
        mat=init_material(key, mspec), env=init_envlight(8, 16),
    )
    out = render_stage1(params, static, jnp.asarray(verts), rays_o, rays_d, key)
    assert "normal_ao" in out
    ao = out["normal_ao"]
    assert ao.shape == (HH * HH,)
    assert np.isfinite(np.asarray(ao)).all()
    # off-mask pixels are zero
    assert float(jnp.max(jnp.where(out["mask"], 0.0, ao))) == 0.0
