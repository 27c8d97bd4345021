"""End-to-end material-fidelity gate (VERDICT r2 item 4).

The failure mode per-pass unbiasedness tests cannot catch is ACCUMULATED
estimator bias showing up as wrong converged materials (SURVEY.md §7
hard-part 4; reference renderer_restir.py:230-471).  This test:

  1. builds a GT scene with real occlusion + interreflection (a torus — the
     hole shadows itself and faces reflect at each other) with known uniform
     materials and a structured envmap;
  2. renders GT images with the DETERMINISTIC dump renderer (full-envmap
     texel quadrature direct light, independently quadrature-tested) plus a
     high-sample Monte-Carlo indirect term — an estimator family disjoint
     from the ReSTIR pipeline under test;
  3. trains stage-1 (ReSTIR on, indirect on) from the GT mesh;
  4. asserts recovered albedo (after the reference's per-channel median
     scale, albedo_eval protocol), roughness, AND envmap against GT.

Runtime ~15 min on CPU -> RUN_SLOW_TESTS only.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    not os.environ.get("RUN_SLOW_TESTS"),
    reason="slow e2e fidelity gate; set RUN_SLOW_TESTS=1",
)

H = W = 56
GT_KD = np.array([0.65, 0.35, 0.18], np.float32)
GT_ROUGH = 0.5
GT_METAL = 0.0


def make_torus(R=0.42, r=0.2, nu=48, nv=24):
    u = np.linspace(0, 2 * np.pi, nu, endpoint=False)
    v = np.linspace(0, 2 * np.pi, nv, endpoint=False)
    U, V = np.meshgrid(u, v, indexing="ij")
    x = (R + r * np.cos(V)) * np.cos(U)
    y = (R + r * np.cos(V)) * np.sin(U)
    z = r * np.sin(V)
    verts = np.stack([x, y, z], -1).reshape(-1, 3).astype(np.float32)
    tris = []
    for i in range(nu):
        for j in range(nv):
            a = i * nv + j
            b = i * nv + (j + 1) % nv
            c = ((i + 1) % nu) * nv + j
            d = ((i + 1) % nu) * nv + (j + 1) % nv
            tris.append([a, b, c])
            tris.append([b, d, c])
    return verts, np.asarray(tris, np.int32)


def gt_envmap(he=16, we=32):
    """Two bright blobs + dim ambient: structured enough that a recovered
    envmap must match more than a DC level."""
    th = (np.arange(he) + 0.5) / he * np.pi
    ph = (np.arange(we) + 0.5) / we * 2 * np.pi
    T, P = np.meshgrid(th, ph, indexing="ij")
    d = np.stack([np.sin(T) * np.cos(P), np.sin(T) * np.sin(P), np.cos(T)], -1)
    blob1 = np.exp(10 * (d @ np.array([0.3, 0.3, 0.9]) / np.linalg.norm([0.3, 0.3, 0.9]) - 1))
    blob2 = np.exp(8 * (d @ np.array([-0.7, 0.2, 0.4]) / np.linalg.norm([-0.7, 0.2, 0.4]) - 1))
    env = 0.10 + 3.0 * blob1[..., None] * np.array([1.0, 0.9, 0.7]) \
        + 1.5 * blob2[..., None] * np.array([0.6, 0.7, 1.0])
    return env.astype(np.float32)


def orbit_rays(theta, phi, radius=1.9):
    from mirres_restir_nerf_mesh_tpu.data.synthetic import orbit_pose

    pose = orbit_pose(theta, phi, radius)
    fx = 1.1 * W
    i, j = np.meshgrid(np.arange(W), np.arange(H), indexing="xy")
    dirs = np.stack(
        [(i - W / 2 + 0.5) / fx, (j - H / 2 + 0.5) / fx, -np.ones_like(i)], -1
    )
    rd = dirs @ pose[:3, :3].T
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    ro = np.broadcast_to(pose[:3, 3], rd.shape)
    return (
        jnp.asarray(ro.reshape(-1, 3), jnp.float32),
        jnp.asarray(rd.reshape(-1, 3), jnp.float32),
    )


@pytest.fixture(scope="module")
def gt_scene():
    from mirres_restir_nerf_mesh_tpu.ops.tracer import build_tracer
    from mirres_restir_nerf_mesh_tpu.render.gbuffer import (
        prepare_shading_normal,
        raycast_gbuffer,
    )
    from mirres_restir_nerf_mesh_tpu.render import pathtracer
    from mirres_restir_nerf_mesh_tpu.render.dump import render_dump
    from mirres_restir_nerf_mesh_tpu.models import envlight

    verts, tris = make_torus()
    env = jnp.asarray(gt_envmap())
    dist = envlight.build_distribution(env)
    vj, tj = jnp.asarray(verts), jnp.asarray(tris)
    tracer = build_tracer(vj, tj, kind="cluster")

    def mat_fn(pts, stochastic_key=None):
        n = pts.shape[0]
        return jnp.concatenate(
            [
                jnp.tile(jnp.asarray(GT_KD)[None], (n, 1)),
                jnp.zeros((n, 1)),
                jnp.full((n, 1), GT_ROUGH),
                jnp.full((n, 1), GT_METAL),
            ],
            axis=1,
        )

    @jax.jit
    def render_frame(ro, rd, key):
        gb = raycast_gbuffer(vj, tj, tracer, ro, rd)
        nrm = prepare_shading_normal(gb.view_dir, gb.normal, gb.face_normal)
        P = ro.shape[0]
        kd = jnp.tile(jnp.asarray(GT_KD)[None], (P, 1))
        rough = jnp.full((P,), GT_ROUGH)
        metal = jnp.full((P,), GT_METAL)
        out = render_dump(
            gb.position, nrm, gb.view_dir, gb.mask, kd, rough, metal, env,
            tracer=tracer,
        )
        direct = out["image_brdf"]

        def one_ind(k):
            return pathtracer.render_indirect(
                k, gb.mask, gb.position, nrm, gb.view_dir, kd, rough, metal,
                tracer, vj, tj, mat_fn, env, dist, bounces=2,
            )

        ind = jnp.mean(
            jax.vmap(one_ind)(jax.random.split(key, 24)), axis=0
        )
        img = jnp.where(
            gb.mask[:, None], direct + ind, envlight.eval_le(env, gb.view_dir)
        )
        return img, gb.mask

    frames, poses_tp = [], []
    rng = np.random.RandomState(0)
    for k in range(14):
        theta = np.pi / 3 + rng.uniform(0, np.pi / 4)
        phi = 2 * np.pi * k / 14
        poses_tp.append((theta, phi))
        ro, rd = orbit_rays(theta, phi)
        img, mask = render_frame(ro, rd, jax.random.PRNGKey(k))
        frames.append((ro, rd, np.asarray(img), np.asarray(mask)))
    return verts, tris, np.asarray(gt_envmap()), frames


def test_restir_training_recovers_materials(gt_scene):
    import dataclasses

    from mirres_restir_nerf_mesh_tpu.config import Config, finalize
    from mirres_restir_nerf_mesh_tpu.models.material import (
        MaterialSpec,
        sample_material,
        split_material,
    )
    from mirres_restir_nerf_mesh_tpu.models.nerf import NeRFSpec, init_nerf
    from mirres_restir_nerf_mesh_tpu.render.stage1 import Stage1Static
    from mirres_restir_nerf_mesh_tpu.train import stage1
    from mirres_restir_nerf_mesh_tpu.train.losses import build_topology

    verts, tris, env_gt, frames = gt_scene
    cfg = finalize(Config(
        bound=1.0, stage=1, use_brdf=True, use_restir=True, iters=260,
        spp=2, pt_bounces=2, env_h=16, env_w=32, ssaa=1,
        lambda_kd=0.0005, lambda_ks=0.0005, lambda_nrm=0.0,
        lambda_lap=0.0, lambda_normal=0.0, lambda_edgelen=0.0,
        lambda_offsets=1.0,  # keep GT geometry (material/env recovery test)
        lambda_mask=0.0, lambda_lpips=0.0,
    ))
    nerf_spec = NeRFSpec(
        bound=1.0, hidden_dim=16, hidden_dim_color=16, geo_feat_dim=7,
        grid_levels=4, grid_log2_hashmap_size=12, grid_desired_resolution=64,
    )
    mat_spec = MaterialSpec(bound=1.0)
    static = Stage1Static(
        tris=jnp.asarray(tris), nerf_spec=nerf_spec, mat_spec=mat_spec,
        spp=cfg.spp, bounces=2, use_restir=True, H=H, W=W,
        restir_tiles=16, restir_tile_size=256, restir_light_samples=16,
        restir_brdf_samples=1, restir_neighbors=3, restir_radius=8.0,
        restir_offsets=512, denoise_iters=2, antialias=False,
    )
    state = stage1.init_state(
        jax.random.PRNGKey(0), cfg, static,
        init_nerf(jax.random.PRNGKey(1), nerf_spec), verts.shape[0],
    )
    topo = build_topology(tris, verts.shape[0])
    step = stage1.make_train_step(cfg, static, verts, topo)

    key = jax.random.PRNGKey(2)
    for i in range(cfg.iters):
        ro, rd, img, mask = frames[i % len(frames)]
        batch = {
            "rays_o": ro, "rays_d": rd,
            "pixels": jnp.asarray(img),
            "alpha": jnp.asarray(mask.astype(np.float32)),
        }
        key, k = jax.random.split(key)
        state, aux = step(state, batch, k)
    assert np.isfinite(float(aux["loss"]))

    # --- recovered materials at GT surface points ---
    pts = jnp.asarray(verts[::7])
    mat = sample_material(state.params.mat, pts, mat_spec)
    kd, rough, metal = split_material(mat)
    kd = np.asarray(kd)

    # albedo: per-channel median scale (the reference albedo_eval protocol)
    scale = np.median(GT_KD[None, :] / np.maximum(kd, 1e-6), axis=0)
    kd_scaled = kd * scale[None, :]
    err = np.abs(kd_scaled - GT_KD[None, :]).mean()
    assert err < 0.08, f"albedo off after scale: {kd_scaled.mean(0)} vs {GT_KD} (err {err:.3f})"
    # the scale itself must be O(1): gross kd/env factorization errors fail
    assert (0.25 < scale).all() and (scale < 4.0).all(), scale

    rough_err = abs(float(jnp.mean(rough)) - GT_ROUGH)
    assert rough_err < 0.22, f"roughness {float(jnp.mean(rough)):.3f} vs {GT_ROUGH}"

    # envmap: after the inverse intensity scale, the recovered map must
    # correlate strongly with GT structure (two blobs, not a DC fit)
    env_rec = np.asarray(state.params.env) * np.mean(1.0 / scale)
    a = env_rec.reshape(-1, 3).mean(-1)
    b = env_gt.reshape(-1, 3).mean(-1)
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.8, f"envmap structure not recovered (corr {corr:.3f})"
    # converged materials must reproduce the GT frames
    psnrs = []
    for ro, rd, img, mask in frames[:3]:
        from mirres_restir_nerf_mesh_tpu.render.stage1 import render_stage1

        out = jax.jit(
            lambda p, ro, rd, k: render_stage1(p, static, jnp.asarray(verts), ro, rd, k)
        )(state.params, ro, rd, jax.random.PRNGKey(9))
        mse = float(jnp.mean((out["image_brdf"] - jnp.asarray(img)) ** 2))
        psnrs.append(-10 * np.log10(max(mse, 1e-9)))
    print("fidelity re-render PSNRs:", psnrs, flush=True)
    # measured-minus-margin gate (VERDICT r4 weak 3): the converged run
    # measures [24.4, 14.1, 30.0] dB, mean 22.86 (r5, seed 0 — one oblique
    # view is MC/coverage-limited); 21 leaves ~2 dB for seed/MC noise while
    # catching any real estimator-bias regression (the old >17 gate would
    # green a 6 dB loss)
    assert np.mean(psnrs) > 21, f"re-render PSNR {psnrs}"


def test_row_band_training_converges_like_full_frame(gt_scene):
    """VERDICT r2 weak 7: row-band stage-1 training (the stage1_rows memory
    fallback) changes the data distribution — image-space passes never see
    cross-band neighbors.  Gate: a banded run must recover the same
    materials as full-frame training on the same scene."""
    from mirres_restir_nerf_mesh_tpu.config import Config, finalize
    from mirres_restir_nerf_mesh_tpu.models.material import (
        MaterialSpec,
        sample_material,
        split_material,
    )
    from mirres_restir_nerf_mesh_tpu.models.nerf import NeRFSpec, init_nerf
    from mirres_restir_nerf_mesh_tpu.render.stage1 import Stage1Static
    from mirres_restir_nerf_mesh_tpu.train import stage1
    from mirres_restir_nerf_mesh_tpu.train.losses import build_topology

    verts, tris, env_gt, frames = gt_scene
    cfg = finalize(Config(
        bound=1.0, stage=1, use_brdf=True, use_restir=True, iters=260,
        spp=2, pt_bounces=2, env_h=16, env_w=32, ssaa=1,
        lambda_kd=0.0005, lambda_ks=0.0005, lambda_nrm=0.0,
        lambda_lap=0.0, lambda_normal=0.0, lambda_edgelen=0.0,
        lambda_offsets=1.0, lambda_mask=0.0, lambda_lpips=0.0,
    ))
    nerf_spec = NeRFSpec(
        bound=1.0, hidden_dim=16, hidden_dim_color=16, geo_feat_dim=7,
        grid_levels=4, grid_log2_hashmap_size=12, grid_desired_resolution=64,
    )
    mat_spec = MaterialSpec(bound=1.0)
    n_bands = 4
    Hb = H // n_bands
    static = Stage1Static(
        tris=jnp.asarray(tris), nerf_spec=nerf_spec, mat_spec=mat_spec,
        spp=cfg.spp, bounces=2, use_restir=True, H=Hb, W=W,
        restir_tiles=16, restir_tile_size=256, restir_light_samples=16,
        restir_brdf_samples=1, restir_neighbors=3, restir_radius=8.0,
        restir_offsets=512, denoise_iters=2, antialias=False,
    )
    state = stage1.init_state(
        jax.random.PRNGKey(0), cfg, static,
        init_nerf(jax.random.PRNGKey(1), nerf_spec), verts.shape[0],
    )
    topo = build_topology(tris, verts.shape[0])
    step = stage1.make_train_step(cfg, static, verts, topo)

    key = jax.random.PRNGKey(2)
    for i in range(cfg.iters):
        ro, rd, img, mask = frames[i % len(frames)]
        band = (i // len(frames)) % n_bands  # cycle bands like trainer.py
        sl = slice(band * Hb * W, (band + 1) * Hb * W)
        batch = {
            "rays_o": ro[sl], "rays_d": rd[sl],
            "pixels": jnp.asarray(img[sl]),
            "alpha": jnp.asarray(mask[sl].astype(np.float32)),
        }
        key, k = jax.random.split(key)
        state, aux = step(state, batch, k)
    assert np.isfinite(float(aux["loss"]))

    pts = jnp.asarray(verts[::7])
    mat = sample_material(state.params.mat, pts, mat_spec)
    kd, rough, _ = split_material(mat)
    kd = np.asarray(kd)
    scale = np.median(GT_KD[None, :] / np.maximum(kd, 1e-6), axis=0)
    err = np.abs(kd * scale[None, :] - GT_KD[None, :]).mean()
    # same gate as the full-frame run: banding must not bias the materials
    assert err < 0.09, f"banded albedo err {err:.3f}"
    assert (0.25 < scale).all() and (scale < 4.0).all(), scale
    rough_err = abs(float(jnp.mean(rough)) - GT_ROUGH)
    assert rough_err < 0.22, f"banded roughness {float(jnp.mean(rough)):.3f}"
