"""ReSTIR correctness: the resampled direct-light estimator must stay
*unbiased* through initial RIS, temporal reuse, and pairwise-MIS spatial reuse
(SURVEY.md §7 hard-part 4 — silent bias shows up as wrong converged
materials).  Ground truth = per-pixel texel quadrature of the rendering
equation on an occlusion-free scene."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mirres_restir_nerf_mesh_tpu.models import envlight
from mirres_restir_nerf_mesh_tpu.render import brdf, restir
from mirres_restir_nerf_mesh_tpu.render.pathtracer import shade_direct


H_IMG, W_IMG = 8, 8
P = H_IMG * W_IMG


@pytest.fixture(scope="module")
def scene():
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    # smooth normals (mostly up) so spatial neighbors pass the validity test
    normal = jnp.tile(jnp.array([[0.1, 0.1, 0.98]]), (P, 1))
    normal = normal + jax.random.normal(k1, (P, 3)) * 0.02
    normal = normal / jnp.linalg.norm(normal, axis=-1, keepdims=True)
    view = jnp.tile(jnp.array([[0.2, 0.0, -0.97]]), (P, 1))
    view = view / jnp.linalg.norm(view, axis=-1, keepdims=True)

    ctx = restir.PixelCtx(
        position=jax.random.normal(k2, (P, 3)) * 0.01,
        normal=normal,
        view_dir=view,
        kd=jnp.clip(jnp.tile(jnp.array([[0.7, 0.4, 0.2]]), (P, 1)) + jax.random.normal(k3, (P, 3)) * 0.02, 0.05, 1.0),
        roughness=jnp.full((P,), 0.4),
        metallic=jnp.full((P,), 0.2),
        mask=jnp.ones((P,), bool),
        depth=jnp.full((P,), 2.0),
    )
    env = jax.random.uniform(k4, (16, 32, 3)) ** 3 * 4.0
    dist = envlight.build_distribution(env)
    return ctx, env, dist


def _quadrature_reference(ctx, env):
    """Exact per-pixel direct light by summing every envmap texel."""
    He, We = env.shape[0], env.shape[1]
    vv, uu = jnp.meshgrid(
        (jnp.arange(He) + 0.5) / He, (jnp.arange(We) + 0.5) / We, indexing="ij"
    )
    uv = jnp.stack([uu.reshape(-1), 1.0 - vv.reshape(-1)], axis=-1)  # env-v convention
    d_remap = envlight.uv_to_dir(uv)
    dirs = jnp.stack([-d_remap[:, 0], d_remap[:, 2], d_remap[:, 1]], axis=-1)  # world
    theta = (jnp.arange(He) + 0.5) / He * jnp.pi
    solid = (2 * jnp.pi / We) * (jnp.pi / He) * jnp.sin(theta)  # [He]
    solid = jnp.repeat(solid, We)
    le = env.reshape(-1, 3)

    alpha = brdf.alpha_from_roughness(ctx.roughness)
    p_diff, p_spec = brdf.lobe_probabilities(
        ctx.kd, ctx.metallic, jnp.sum(-ctx.view_dir * ctx.normal, axis=-1)
    )
    w_view = brdf.to_local(-ctx.view_dir, ctx.normal)

    total = jnp.zeros((ctx.position.shape[0], 3))
    for t in range(dirs.shape[0]):
        w_l = brdf.to_local(jnp.tile(dirs[t], (ctx.position.shape[0], 1)), ctx.normal)
        f = brdf.brdf_eval(w_view, w_l, ctx.kd, ctx.metallic, alpha, p_diff, p_spec)
        total = total + f * le[t] * solid[t]
    return total


def _estimate(ctx, env, dist, key, n_runs, use_temporal, use_spatial):
    offsets = restir.make_neighbor_offsets(jax.random.PRNGKey(42), 256, 3.0)
    env_bg = jnp.zeros((P, 3))

    def one_run(k):
        k1, k2, k3, k4, k5 = jax.random.split(k, 5)
        tiles = restir.generate_light_tiles(k1, env, dist, n_tiles=8, tile_size=128)
        res = restir.initial_resampling(
            k2, ctx, tiles, env, dist, tracer=None, n_light_samples=8,
            n_brdf_samples=1, check_visibility=False,
        )
        if use_temporal:
            # synthetic "previous frame" = independent initial reservoir
            prev = restir.initial_resampling(
                k4, ctx, tiles, env, dist, tracer=None, n_light_samples=8,
                n_brdf_samples=1, check_visibility=False,
            )
            res = restir.temporal_resampling(
                k5, ctx, res, prev, ctx.normal, ctx.depth, env
            )
        if use_spatial:
            res = restir.spatial_resampling(
                k3, ctx, res, env, H_IMG, W_IMG, offsets, tracer=None,
                n_neighbors=3, unbiased=False,
            )
        light = restir.evaluate_final_samples(ctx, res, env, None, check_visibility=False)
        color, _, _ = shade_direct(
            light, ctx.mask, ctx.normal, ctx.view_dir, ctx.kd, ctx.roughness,
            ctx.metallic, env_bg,
        )
        return color

    runner = jax.jit(one_run)
    acc = jnp.zeros((P, 3))
    for i in range(n_runs):
        acc = acc + runner(jax.random.fold_in(key, i))
    return acc / n_runs


def test_initial_ris_unbiased(scene):
    ctx, env, dist = scene
    ref = np.asarray(_quadrature_reference(ctx, env))
    est = np.asarray(_estimate(ctx, env, dist, jax.random.PRNGKey(7), 300, False, False))
    rel = np.abs(est.mean(0) - ref.mean(0)) / np.abs(ref.mean(0))
    assert (rel < 0.08).all(), f"initial RIS biased: est {est.mean(0)} vs ref {ref.mean(0)}"


def test_temporal_reuse_unbiased(scene):
    ctx, env, dist = scene
    ref = np.asarray(_quadrature_reference(ctx, env))
    est = np.asarray(_estimate(ctx, env, dist, jax.random.PRNGKey(8), 300, True, False))
    rel = np.abs(est.mean(0) - ref.mean(0)) / np.abs(ref.mean(0))
    assert (rel < 0.08).all(), f"temporal reuse biased: est {est.mean(0)} vs ref {ref.mean(0)}"


def test_spatial_reuse_unbiased(scene):
    ctx, env, dist = scene
    ref = np.asarray(_quadrature_reference(ctx, env))
    est = np.asarray(_estimate(ctx, env, dist, jax.random.PRNGKey(9), 300, False, True))
    rel = np.abs(est.mean(0) - ref.mean(0)) / np.abs(ref.mean(0))
    assert (rel < 0.10).all(), f"spatial reuse biased: est {est.mean(0)} vs ref {ref.mean(0)}"


def test_spatial_visibility_threading_exact(scene):
    """Visibility threading (r3 perf): spatial_resampling with v_self must be
    BIT-EXACT vs the trace-everything path, and the returned winner vis must
    equal an explicit trace of the winner — on a scene with real occlusion
    and duplicated reservoir directions (the dedup fast path)."""
    from mirres_restir_nerf_mesh_tpu.ops.tracer import build_tracer

    ctx, env, dist = scene
    # blocker quad above half the pixels
    verts = jnp.array(
        [[-5.0, 0.0, 1.0], [5.0, 0.0, 1.0], [5.0, 5.0, 1.0], [-5.0, 5.0, 1.0]],
        jnp.float32,
    )
    tris = jnp.array([[0, 1, 2], [0, 2, 3]], jnp.int32)
    tracer = build_tracer(verts, tris, kind="cluster")

    # reservoirs whose dirs repeat across pixels (winner propagation regime)
    key = jax.random.PRNGKey(3)
    pool = jax.random.normal(key, (4, 3))
    pool = pool / jnp.linalg.norm(pool, axis=-1, keepdims=True)
    pool = pool.at[:, 2].set(jnp.abs(pool[:, 2]) + 0.2)  # upper hemisphere
    pool = pool / jnp.linalg.norm(pool, axis=-1, keepdims=True)
    pick = jax.random.randint(jax.random.fold_in(key, 1), (P,), 0, 4)
    res = restir.Reservoir(
        dir=pool[pick],
        W=jnp.full((P,), 0.5),
        M=jnp.ones((P,)),
        valid=jnp.ones((P,), bool),
    )
    v_self = ~tracer.occluded(
        ctx.position + ctx.normal * 1e-4, res.dir, 1e9, incoherent=True
    )
    assert bool(v_self.any()) and not bool(v_self.all()), "fixture needs mixed vis"

    offsets = restir.make_neighbor_offsets(jax.random.PRNGKey(42), 256, 3.0)
    k = jax.random.PRNGKey(11)
    r_ref = restir.spatial_resampling(
        k, ctx, res, env, H_IMG, W_IMG, offsets, tracer=tracer,
        n_neighbors=3, unbiased=True,
    )
    r_thr, vis = restir.spatial_resampling(
        k, ctx, res, env, H_IMG, W_IMG, offsets, tracer=tracer,
        n_neighbors=3, unbiased=True, v_self=v_self,
    )
    for a, b in zip(r_ref, r_thr):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    vis_trace = ~tracer.occluded(
        ctx.position + ctx.normal * 1e-4, r_thr.dir, 1e9, incoherent=True
    )
    sel = np.asarray(r_thr.valid)
    np.testing.assert_array_equal(np.asarray(vis)[sel], np.asarray(vis_trace)[sel])


def test_envmap_gradient_flows_through_final_samples(scene):
    ctx, env, dist = scene

    def loss(env_tex):
        tiles = restir.generate_light_tiles(jax.random.PRNGKey(1), jax.lax.stop_gradient(env_tex), dist, 8, 128)
        res = restir.initial_resampling(
            jax.random.PRNGKey(2), ctx, tiles, jax.lax.stop_gradient(env_tex), dist,
            None, 8, 1, check_visibility=False,
        )
        light = restir.evaluate_final_samples(ctx, res, env_tex, None, check_visibility=False)
        color, _, _ = shade_direct(
            light, ctx.mask, ctx.normal, ctx.view_dir, ctx.kd, ctx.roughness,
            ctx.metallic, jnp.zeros((P, 3)),
        )
        return jnp.sum(color)

    g = jax.grad(loss)(env)
    assert float(jnp.sum(jnp.abs(g))) > 0
    assert bool(jnp.isfinite(g).all())


def test_target_soa_matches_aos(scene):
    """target_soa (the SoA component-plane fast path used by initial RIS and
    spatial reuse) must match target_function + brdf_pdf on every call shape
    it is used with: [P], [P,n] candidates, and broadcast [P,1] vs [P,nn]."""
    ctx, env, dist = scene
    key = jax.random.PRNGKey(5)
    n = 7
    ld = jax.random.normal(key, (P, n, 3))
    ld = ld / jnp.linalg.norm(ld, axis=-1, keepdims=True)
    le = jax.random.uniform(jax.random.fold_in(key, 1), (P, n, 3)) * 3.0

    pre = restir.precompute_ctx(ctx)
    # [P,n] lattice with pdf
    p_soa, pdf_soa = restir.target_soa(pre, ld, le, with_pdf=True)
    w_view = brdf.to_local(-ctx.view_dir, ctx.normal)
    alpha = brdf.alpha_from_roughness(ctx.roughness)
    p_diff, p_spec = brdf.lobe_probabilities(
        ctx.kd, ctx.metallic, jnp.sum(-ctx.view_dir * ctx.normal, axis=-1)
    )
    for j in range(n):
        p_ref = restir.target_function(ctx, ld[:, j], le[:, j])
        pdf_ref = brdf.brdf_pdf(
            w_view, brdf.to_local(ld[:, j], ctx.normal), alpha, p_diff, p_spec
        )
        np.testing.assert_allclose(
            np.asarray(p_soa[:, j]), np.asarray(p_ref), rtol=2e-5, atol=1e-7
        )
        np.testing.assert_allclose(
            np.asarray(pdf_soa[:, j]), np.asarray(pdf_ref), rtol=2e-5, atol=1e-7
        )
    # flat [P] shape (temporal / canonical path)
    p_flat = restir.target_soa(pre, ld[:, 0], le[:, 0])
    np.testing.assert_allclose(
        np.asarray(p_flat),
        np.asarray(restir.target_function(ctx, ld[:, 0], le[:, 0])),
        rtol=2e-5, atol=1e-7,
    )
    # [P,1] candidate broadcast against [P,nn] ctx (q_canon_at_n shape)
    nn = 3
    ctx2 = restir.PixelCtx(
        *(jnp.repeat(v, nn, axis=0).reshape((P, nn) + v.shape[1:]) for v in ctx)
    )
    pre2 = restir.precompute_ctx(ctx2)
    p_b = restir.target_soa(pre2, ld[:, 0][:, None, :], le[:, 0][:, None, :])
    np.testing.assert_allclose(
        np.asarray(p_b[:, 0]),
        np.asarray(restir.target_function(ctx, ld[:, 0], le[:, 0])),
        rtol=2e-5, atol=1e-7,
    )
