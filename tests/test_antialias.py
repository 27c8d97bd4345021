"""Silhouette antialiasing (render/antialias.py): the dr.antialias-equivalent
vertex-gradient path (reference nerf/renderer.py:1182-1206).

VERDICT r1 item 5 done-bar: a mesh offset must converge to a shifted GT mask
under the mask loss ALONE — impossible without visibility gradients.
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from mirres_restir_nerf_mesh_tpu.ops.tracer import build_tracer
from mirres_restir_nerf_mesh_tpu.render.antialias import antialias
from mirres_restir_nerf_mesh_tpu.render.gbuffer import raycast_gbuffer


def make_sphere(n_theta=16, n_phi=32, radius=0.6):
    th = np.linspace(1e-3, np.pi - 1e-3, n_theta)
    ph = np.linspace(0, 2 * np.pi, n_phi, endpoint=False)
    T, P = np.meshgrid(th, ph, indexing="ij")
    pts = radius * np.stack(
        [np.sin(T) * np.cos(P), np.sin(T) * np.sin(P), np.cos(T)], -1
    ).reshape(-1, 3)
    tris = []
    for i in range(n_theta - 1):
        for j in range(n_phi):
            a = i * n_phi + j
            b = i * n_phi + (j + 1) % n_phi
            c = (i + 1) * n_phi + j
            d = (i + 1) * n_phi + (j + 1) % n_phi
            tris.append([a, b, c])
            tris.append([b, d, c])
    return np.asarray(pts, np.float32), np.asarray(tris, np.int32)


H = W = 48


def camera_rays():
    ys, xs = np.meshgrid(
        np.linspace(-0.5, 0.5, H), np.linspace(-0.5, 0.5, W), indexing="ij"
    )
    d = np.stack([xs, ys, -np.ones_like(xs)], -1).reshape(-1, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o = np.tile(np.array([0, 0, 2.2], np.float32), (d.shape[0], 1))
    return jnp.asarray(o), jnp.asarray(d)


def soft_mask(t, base_verts, tris, rays_o, rays_d, use_aa=True):
    verts = base_verts + t[None, :]
    tracer = build_tracer(jax.lax.stop_gradient(verts), tris, kind="cluster")
    gb = raycast_gbuffer(verts, tris, tracer, rays_o, rays_d)
    if not use_aa:
        return gb.mask.astype(jnp.float32)
    _, m = antialias(
        {}, gb.mask, (gb.tri_v0, gb.tri_v1, gb.tri_v2),
        rays_o, gb.view_dir, H, W,
    )
    return m


def test_mask_gradient_exists_only_with_antialias():
    verts, tris = make_sphere()
    bv, tr = jnp.asarray(verts), jnp.asarray(tris)
    rays_o, rays_d = camera_rays()
    gt = soft_mask(jnp.array([0.05, 0.0, 0.0]), bv, tr, rays_o, rays_d)
    gt = jax.lax.stop_gradient(gt)

    def loss(t, aa):
        m = soft_mask(t, bv, tr, rays_o, rays_d, use_aa=aa)
        return jnp.mean((m - gt) ** 2)

    t0 = jnp.zeros(3)
    g_hard = jax.grad(lambda t: loss(t, False))(t0)
    g_soft = jax.grad(lambda t: loss(t, True))(t0)
    assert float(jnp.linalg.norm(g_hard)) == 0.0, "binary mask must have no grad"
    assert float(jnp.linalg.norm(g_soft)) > 1e-6, "antialias must create grads"
    # gradient points toward the GT shift (+x): decreasing loss means t moves +x
    assert float(g_soft[0]) < 0


def test_left_pixel_of_pair_receives_blend():
    """ADVICE r2 (high): overlapping .at[].set() writes discarded any blend
    whose adjusted pixel is the LEFT element of its horizontal pair.  A
    half-plane whose silhouette falls just past a hit-pixel center (s < 1/2)
    must dim that hit pixel — the 'a' element of its pair."""
    xs = np.linspace(-0.5, 0.5, W)
    i_hit = W // 2
    frac = 0.2  # edge at 20% of the way from pixel i_hit to i_hit+1
    x_edge_ndc = xs[i_hit] + frac * (xs[i_hit + 1] - xs[i_hit])
    xe = 2.2 * x_edge_ndc  # perspective rays from z=2.2 hit z=0 at 2.2*ndc
    verts = np.array(
        [[-2, -2, 0], [xe, -2, 0], [xe, 2, 0], [-2, 2, 0]], np.float32
    )
    tris = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    rays_o, rays_d = camera_rays()
    tracer = build_tracer(jnp.asarray(verts), jnp.asarray(tris), kind="cluster")
    gb = raycast_gbuffer(jnp.asarray(verts), jnp.asarray(tris), tracer, rays_o, rays_d)
    m2 = np.asarray(gb.mask).reshape(H, W)
    row = H // 2
    assert m2[row, i_hit] and not m2[row, i_hit + 1], "fixture: boundary moved"

    buf = gb.mask.astype(jnp.float32)[:, None]
    out, _ = antialias(
        {"c": buf}, gb.mask, (gb.tri_v0, gb.tri_v1, gb.tri_v2),
        rays_o, gb.view_dir, H, W,
    )
    c2 = np.asarray(out["c"]).reshape(H, W)
    # the hit pixel loses (1/2 - s) ~ 0.3 of its value toward the miss (0)
    assert abs(c2[row, i_hit] - 1.0) > 0.05, "left-of-pair blend was discarded"
    assert abs(c2[row, i_hit] - (1.0 - (0.5 - frac))) < 0.12


def test_mask_loss_alone_converges_translation():
    verts, tris = make_sphere()
    bv, tr = jnp.asarray(verts), jnp.asarray(tris)
    rays_o, rays_d = camera_rays()
    t_star = jnp.array([0.06, -0.04, 0.0])
    gt = jax.lax.stop_gradient(soft_mask(t_star, bv, tr, rays_o, rays_d))

    @jax.jit
    def step(t, opt_state):
        l, g = jax.value_and_grad(
            lambda t: jnp.mean((soft_mask(t, bv, tr, rays_o, rays_d) - gt) ** 2)
        )(t)
        up, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(t, up), opt_state, l

    opt = optax.adam(5e-3)
    t = jnp.zeros(3)
    opt_state = opt.init(t)
    l0 = None
    for i in range(250):
        t, opt_state, l = step(t, opt_state)
        if l0 is None:
            l0 = float(l)
    err = float(jnp.linalg.norm(t - t_star))
    assert err < 0.015, f"translation not recovered: t={np.asarray(t)}, err={err}"
    assert float(l) < 0.2 * l0
