"""Denoiser tests: noise reduction, edge preservation, gradient topology."""

import jax
import jax.numpy as jnp
import numpy as np

from mirres_restir_nerf_mesh_tpu.render.denoise import bilateral_denoise, eaw_denoise


def _edge_scene(key, H=32, W=32, noise=0.3):
    # two flat regions with different normals/positions and colors
    base = jnp.where(jnp.arange(W)[None, :, None] < W // 2, 0.2, 0.8)
    base = jnp.broadcast_to(base, (H, W, 1)) * jnp.ones((1, 1, 3))
    normal = jnp.where(
        jnp.arange(W)[None, :, None] < W // 2,
        jnp.array([0.0, 0.0, 1.0]),
        jnp.array([1.0, 0.0, 0.0]),
    )
    normal = jnp.broadcast_to(normal, (H, W, 3))
    yy, xx = jnp.meshgrid(jnp.arange(H), jnp.arange(W), indexing="ij")
    pos = jnp.stack([xx / W, yy / H, jnp.where(xx < W // 2, 0.0, 1.0)], -1)
    noisy = base + jax.random.normal(key, (H, W, 3)) * noise
    return base, noisy, normal, pos


def test_eaw_reduces_noise_preserves_edges():
    base, noisy, normal, pos = _edge_scene(jax.random.PRNGKey(0))
    mask = jnp.ones(base.shape[:2], bool)
    out = eaw_denoise(noisy, normal, pos, mask, iterations=4, step_width=8)

    err_before = float(jnp.mean((noisy - base) ** 2))
    err_after = float(jnp.mean((out - base) ** 2))
    assert err_after < err_before * 0.35, (err_before, err_after)

    # edge magnitude across the boundary column preserved
    H, W = base.shape[:2]
    jump = float(jnp.abs(out[:, W // 2 + 2].mean() - out[:, W // 2 - 3].mean()))
    assert jump > 0.4, jump


def test_bilateral_reduces_noise():
    base, noisy, normal, pos = _edge_scene(jax.random.PRNGKey(1))
    zdz = jnp.stack([pos[..., 2] * 5 + 1.0, jnp.full(base.shape[:2], 2.0)], -1)
    out = bilateral_denoise(noisy, normal, zdz, sigma=1.0)  # sigma 2 -> 23x23 window = 529 shifted XLA ops, ~3 min CPU compile
    err_before = float(jnp.mean((noisy - base) ** 2))
    err_after = float(jnp.mean((out - base) ** 2))
    assert err_after < err_before * 0.5, (err_before, err_after)


def test_eaw_gradient_flows_through_color_only():
    base, noisy, normal, pos = _edge_scene(jax.random.PRNGKey(2))
    mask = jnp.ones(base.shape[:2], bool)

    g_color = jax.grad(lambda c: jnp.sum(eaw_denoise(c, normal, pos, mask, 2, 2)))(noisy)
    assert float(jnp.sum(jnp.abs(g_color))) > 0
    assert bool(jnp.isfinite(g_color).all())

    # weights treat color as constant: grad wrt color is the linear filter
    # transpose (matches the hand-written slang backward which only
    # backpropagates through the accumulation, Denoising.py:29-48)
    g_normal = jax.grad(lambda n: jnp.sum(eaw_denoise(noisy, n, pos, mask, 2, 2)))(normal)
    assert bool(jnp.isfinite(g_normal).all())
