"""Full two-stage quality-recovery gate (VERDICT r3 item 1/3).

The strongest parity evidence available in a dataset-less environment:
on an analytic scene with KNOWN albedo/roughness/envmap, run the COMPLETE
pipeline the reference user runs (readme.md:74-113) —

  stage-0 radiance-field training -> marching-cubes mesh export ->
  stage-1 inverse rendering (ReSTIR on, indirect on) -> relighting

— and assert joint recovery ACCURACY, not just train-loss finiteness:
  * recovered albedo within 0.05 mean-abs error after the per-channel
    median scale (the reference albedo_eval.py:115-119 protocol),
  * BRDF re-render PSNR >= 27.5 against the ground-truth images at 64 eval
    spp (the reference NVS protocol evaluates at 512 spp, readme.md:93;
    at 16 spp the render is MC-noise-limited ~2 dB below its converged
    quality — measured with scripts/probe_quality_gate.py; the full r5
    run measured mean 28.96 dB over the 3 eval views),
  * a relight render under a HELD-OUT envmap matches the analytic GT.

GT images are rendered with the deterministic dump renderer (full-texel
quadrature direct light) + high-sample MC indirect — an estimator family
disjoint from the ReSTIR pipeline under test.

Scale (VERDICT r4 item 3): 96x96 frames, 20 views, 32x64 trainable env,
~3000-face recovered mesh — one notch below the reference operating point
(800^2, 100 views, 256x512, 3e5 faces) and 4x the r3/r4 gate.  Hours on
CPU -> RUN_SLOW_TESTS only.  Thresholds recorded in PARITY.md.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    not os.environ.get("RUN_SLOW_TESTS"),
    reason="slow full-pipeline quality gate; set RUN_SLOW_TESTS=1",
)

H = W = 96
GT_KD = np.array([0.70, 0.40, 0.22], np.float32)
GT_ROUGH = 0.45
GT_METAL = 0.0
R_SPHERE = 0.5
N_VIEWS = 20


def blob_env(dirs_blobs, he=32, we=64):
    th = (np.arange(he) + 0.5) / he * np.pi
    ph = (np.arange(we) + 0.5) / we * 2 * np.pi
    T, P = np.meshgrid(th, ph, indexing="ij")
    d = np.stack([np.sin(T) * np.cos(P), np.sin(T) * np.sin(P), np.cos(T)], -1)
    env = np.full((he, we, 3), 0.12, np.float32)
    for vec, sharp, col in dirs_blobs:
        v = np.asarray(vec) / np.linalg.norm(vec)
        env += sharp[1] * np.exp(sharp[0] * (d @ v - 1))[..., None] * np.asarray(col)
    return env.astype(np.float32)


TRAIN_ENV = lambda: blob_env(  # noqa: E731
    [((0.3, 0.3, 0.9), (10, 3.0), (1.0, 0.9, 0.7)),
     ((-0.7, 0.2, 0.4), (8, 1.5), (0.6, 0.7, 1.0))])
RELIGHT_ENV = lambda: blob_env(  # noqa: E731
    [((0.8, -0.4, 0.45), (12, 4.0), (1.0, 0.7, 0.5)),
     ((-0.2, 0.9, 0.3), (6, 1.2), (0.5, 0.8, 1.0))])


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
    return (jnp.asarray(ro.reshape(-1, 3), jnp.float32),
            jnp.asarray(rd.reshape(-1, 3), jnp.float32), pose,
            np.array([fx, fx, W / 2.0, H / 2.0], np.float32))


def _cache_dir():
    """Optional cross-run cache for the deterministic fixture stages (GT
    imagery + stage-0 mesh recovery), enabled with QE2E_CACHE=1 — a dev aid
    for iterating on the stage-1 gates without re-running the ~25 min of
    GT rendering + stage-0 training they do not depend on."""
    if not os.environ.get("QE2E_CACHE"):
        return None
    d = "/tmp/qe2e_cache"
    os.makedirs(d, exist_ok=True)
    return d


@pytest.fixture(scope="module")
def gt_pipeline_scene():
    """GT sphere mesh (for GT imagery ONLY — the pipeline must recover its
    own geometry), GT train/relight frames, poses/intrinsics."""
    cd = _cache_dir()
    if cd and os.path.exists(os.path.join(cd, "gt.npz")):
        z = np.load(os.path.join(cd, "gt.npz"))
        frames = [
            (jnp.asarray(z[f"ro{k}"]), jnp.asarray(z[f"rd{k}"]),
             z[f"img{k}"], z[f"msk{k}"]) for k in range(N_VIEWS)
        ]
        relight_frames = [
            (jnp.asarray(z[f"rro{k}"]), jnp.asarray(z[f"rrd{k}"]),
             z[f"rimg{k}"], z[f"rmsk{k}"]) for k in range(2)
        ]
        return frames, relight_frames, z["poses"], z["intr"]
    from mirres_restir_nerf_mesh_tpu.export.meshops import decimate, marching_tets
    from mirres_restir_nerf_mesh_tpu.models import envlight
    from mirres_restir_nerf_mesh_tpu.ops.tracer import build_tracer
    from mirres_restir_nerf_mesh_tpu.render import pathtracer
    from mirres_restir_nerf_mesh_tpu.render.dump import render_dump
    from mirres_restir_nerf_mesh_tpu.render.gbuffer import (
        prepare_shading_normal,
        raycast_gbuffer,
    )

    n = 64
    ax = np.linspace(-1, 1, n, dtype=np.float32)
    X, Y, Z = np.meshgrid(ax, ax, ax, indexing="ij")
    field = R_SPHERE - np.sqrt(X ** 2 + Y ** 2 + Z ** 2)
    v, t = marching_tets(field, 0.0, origin=(-1, -1, -1), spacing=(2 / (n - 1),) * 3)
    v, t = decimate(v, t, 3000)
    vj, tj = jnp.asarray(v), jnp.asarray(t)
    tracer = build_tracer(vj, tj, kind="cluster")

    def mat_fn(pts, stochastic_key=None):
        m = pts.shape[0]
        return jnp.concatenate(
            [jnp.tile(jnp.asarray(GT_KD)[None], (m, 1)), jnp.zeros((m, 1)),
             jnp.full((m, 1), GT_ROUGH), jnp.full((m, 1), GT_METAL)], axis=1)

    def make_renderer(env_np):
        env = jnp.asarray(env_np)
        dist = envlight.build_distribution(env)

        @jax.jit
        def render_frame(ro, rd, key):
            gb = raycast_gbuffer(vj, tj, tracer, ro, rd)
            nrm = prepare_shading_normal(gb.view_dir, gb.normal, gb.face_normal)
            P = ro.shape[0]
            kd = jnp.tile(jnp.asarray(GT_KD)[None], (P, 1))
            rough = jnp.full((P,), GT_ROUGH)
            metal = jnp.full((P,), GT_METAL)
            # tracer=None: the GT body is a (decimated) sphere — convex, so
            # every upper-hemisphere direction escapes and the per-texel
            # occlusion test is provably a no-op (the cos clamp already
            # zeroes the lower hemisphere).  Skipping it keeps the 96^2 x
            # 2048-texel quadrature tractable on the 1-core CPU host; the
            # indirect MC below still traces the real mesh.
            direct = render_dump(gb.position, nrm, gb.view_dir, gb.mask, kd,
                                 rough, metal, env, tracer=None)["image_brdf"]

            def one_ind(k):
                return pathtracer.render_indirect(
                    k, gb.mask, gb.position, nrm, gb.view_dir, kd, rough,
                    metal, tracer, vj, tj, mat_fn, env, dist, bounces=2)

            # sequential over MC keys: memory-bounded at 96^2 (vmap would
            # batch 24 full tracer launches)
            ind = jnp.mean(jax.lax.map(one_ind, jax.random.split(key, 24)), axis=0)
            img = jnp.where(gb.mask[:, None], direct + ind,
                            envlight.eval_le(env, gb.view_dir))
            return img, gb.mask

        return render_frame

    render_train = make_renderer(TRAIN_ENV())
    render_relight = make_renderer(RELIGHT_ENV())

    rng = np.random.RandomState(0)
    frames, poses, intr = [], [], None
    for k in range(N_VIEWS):
        theta = np.pi / 3 + rng.uniform(0, np.pi / 4)
        phi = 2 * np.pi * k / N_VIEWS
        ro, rd, pose, intr = orbit_rays(theta, phi)
        img, mask = render_train(ro, rd, jax.random.PRNGKey(k))
        frames.append((ro, rd, np.asarray(img), np.asarray(mask)))
        poses.append(pose)
    relight_frames = []
    for k in range(2):
        ro, rd, _, _ = orbit_rays(np.pi / 2.2, 2 * np.pi * k / 5)
        img, mask = render_relight(ro, rd, jax.random.PRNGKey(100 + k))
        relight_frames.append((ro, rd, np.asarray(img), np.asarray(mask)))
    if cd:
        data = {"poses": np.stack(poses), "intr": intr}
        for k, (ro, rd, img, msk) in enumerate(frames):
            data.update({f"ro{k}": np.asarray(ro), f"rd{k}": np.asarray(rd),
                         f"img{k}": img, f"msk{k}": msk})
        for k, (ro, rd, img, msk) in enumerate(relight_frames):
            data.update({f"rro{k}": np.asarray(ro), f"rrd{k}": np.asarray(rd),
                         f"rimg{k}": img, f"rmsk{k}": msk})
        np.savez(os.path.join(cd, "gt.npz"), **data)
    return frames, relight_frames, np.stack(poses), intr


def _stage0_recover_mesh(frames, poses, intr, workspace):
    """Train stage-0 on the GT radiance images and export the mesh —
    geometry recovery through the real user path (Trainer-equivalent calls:
    stage0.make_train_step + export_stage0_mesh, reference readme.md:74)."""
    cd = _cache_dir()
    if cd and os.path.exists(os.path.join(cd, "mesh.npz")):
        z = np.load(os.path.join(cd, "mesh.npz"))
        return z["verts"], z["tris"]
    from mirres_restir_nerf_mesh_tpu.config import Config, finalize
    from mirres_restir_nerf_mesh_tpu.data.provider import FrameData, RayDataset, compute_mvps
    from mirres_restir_nerf_mesh_tpu.export.stage0_export import export_stage0_mesh
    from mirres_restir_nerf_mesh_tpu.models import nerf as nerf_model
    from mirres_restir_nerf_mesh_tpu.models.nerf import NeRFSpec
    from mirres_restir_nerf_mesh_tpu.train import stage0

    # RGBA over white: the blender-style supervision the reference trains on
    imgs = []
    for _, _, img, mask in frames:
        rgb = np.where(mask[:, None], img, 1.0).reshape(H, W, 3)
        imgs.append(np.concatenate(
            [rgb, mask.reshape(H, W, 1).astype(np.float32)], -1))
    data = FrameData(images=np.stack(imgs).astype(np.float32),
                     poses=poses, intrinsics=intr, H=H, W=W,
                     mvps=compute_mvps(poses, intr, H, W, 1.0))
    cfg = finalize(Config(
        bound=1.0, iters=800, num_rays=2048, max_steps=128,
        samples_per_ray=32, samples_per_ray_infer=48, grid_size=48,
        dt_gamma=0.0, lambda_tv=0.0, lambda_mask=0.1, density_thresh=2.0,
        # density_thresh is a per-scene knob upstream (main.py --density_thresh);
        # at this fixture's 500-iter budget the field is soft, and the iso
        # surface at 10 sits INSIDE the true surface (measured: silhouette
        # agreement 0.92 at thresh 10 vs 0.997 at thresh 2)
        update_extra_interval=16,
    ))
    spec = NeRFSpec(bound=1.0, hidden_dim=32, hidden_dim_color=32,
                    grid_levels=8, grid_log2_hashmap_size=15,
                    grid_desired_resolution=128)
    sampler = RayDataset(data, bound=1.0)
    key = jax.random.PRNGKey(0)
    state = stage0.init_state(key, cfg, spec)
    train_step = stage0.make_train_step(cfg, spec, sampler)
    occ_update = stage0.make_occ_update(cfg, spec)
    for i in range(cfg.iters):
        key, k = jax.random.split(key)
        if i % cfg.update_extra_interval == 0:
            state = occ_update(state, k)
        state, aux = train_step(state, k)
    assert np.isfinite(float(aux["loss"]))

    params = state.ema_params

    def density_fn(pts):
        return nerf_model.density(params, pts, spec)["sigma"]

    meshes = export_stage0_mesh(
        jax.jit(density_fn), workspace, bound=1.0, resolution=128,
        density_thresh=cfg.density_thresh, decimate_target=3000,
        clean_min_f=8, clean_min_d=5,
    )
    assert meshes, "stage-0 produced no mesh"
    if cd:
        np.savez(os.path.join(cd, "mesh.npz"),
                 verts=meshes[0][0], tris=meshes[0][1])
    return meshes[0]


def _masked_psnr(img, gt, mask_a, mask_b):
    """PSNR over pixels where both coverages agree (geometry recovered by
    stage-0 differs from GT at the silhouette; the reference evals also
    exclude background via GT masks, utils.py:600-708).  Both sides clamp
    to [0,1] LDR like the reference metric (PSNR on saved 8-bit frames):
    unclamped HDR MSE is dominated by single specular fireflies — one
    15x-brightness pixel among ~700 costs ~25 dB — in BOTH the MC ground
    truth and the spp-limited ReSTIR render."""
    both = mask_a & mask_b
    agree = float((mask_a == mask_b).mean())  # silhouette agreement
    a = np.clip(img[both], 0.0, 1.0)
    b = np.clip(gt[both], 0.0, 1.0)
    mse = float(np.mean((a - b) ** 2))
    return -10 * np.log10(max(mse, 1e-9)), agree


def test_full_pipeline_recovers_materials_and_relights(gt_pipeline_scene, tmp_path):
    import dataclasses

    from mirres_restir_nerf_mesh_tpu.config import Config, finalize
    from mirres_restir_nerf_mesh_tpu.models.material import (
        MaterialSpec, sample_material, split_material,
    )
    from mirres_restir_nerf_mesh_tpu.models.nerf import NeRFSpec, init_nerf
    from mirres_restir_nerf_mesh_tpu.render.stage1 import (
        Stage1Static, render_stage1,
    )
    from mirres_restir_nerf_mesh_tpu.train import stage1
    from mirres_restir_nerf_mesh_tpu.train.losses import build_topology

    frames, relight_frames, poses, intr = gt_pipeline_scene

    # ---- stage 0: recover geometry from images alone ----
    verts, tris = _stage0_recover_mesh(frames, poses, intr, str(tmp_path))

    # ---- stage 1: inverse rendering on the RECOVERED mesh ----
    cfg = finalize(Config(
        bound=1.0, stage=1, use_brdf=True, use_restir=True, iters=1000,
        spp=2, pt_bounces=2, env_h=32, env_w=64, ssaa=1,
        # smoothness weights at the reference's real operating point
        # (configs/nerf_synthetic/lego.txt: lambda_kd 0.02)
        lambda_kd=0.02, lambda_ks=0.0005, lambda_nrm=0.0,
        lambda_lap=0.001, lambda_normal=0.0, lambda_edgelen=0.0,
        lambda_offsets=0.1, lambda_mask=0.1, lambda_lpips=0.0,
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
        batch = {"rays_o": ro, "rays_d": rd, "pixels": jnp.asarray(img),
                 "alpha": jnp.asarray(mask.astype(np.float32))}
        key, k = jax.random.split(key)
        state, aux = step(state, batch, k)
    assert np.isfinite(float(aux["loss"]))

    # ---- gate 1: albedo within 0.05 MAE, IMAGE space (the reference
    # protocol: albedo_eval.py:115-119 median-scales and compares rendered
    # albedo MAPS on eval views — observed pixels only; material-field
    # values at never-observed vertices are unconstrained by training) ----
    eval_static = dataclasses.replace(static, spp=8, denoise_iters=3)

    @jax.jit
    def eval_render_raw(p, ro, rd, k):
        return render_stage1(p, eval_static, jnp.asarray(verts), ro, rd, k)

    kd_px, mask_px = [], []
    for ro, rd, img, mask in frames[:3]:
        out = eval_render_raw(state.params, ro, rd, jax.random.PRNGKey(9))
        m = np.asarray(out["mask"]).astype(bool) & mask.astype(bool)
        kd_px.append(np.asarray(out["kd"])[m])
        mask_px.append(m)
    kd_all = np.concatenate(kd_px, axis=0)
    scale = np.median(GT_KD[None, :] / np.maximum(kd_all, 1e-6), axis=0)
    kd_err = np.abs(kd_all * scale[None, :] - GT_KD[None, :]).mean()
    assert kd_err <= 0.05, f"albedo MAE {kd_err:.4f} > 0.05 (scale {scale})"
    assert (0.25 < scale).all() and (scale < 4.0).all(), scale

    # vertex-space sanity (looser: includes never-observed regions)
    pts = jnp.asarray(verts[::5])
    mat = sample_material(state.params.mat, pts, mat_spec)
    kd_v, rough, _ = split_material(mat)
    kd_v = np.asarray(kd_v)
    kd_v_err = np.abs(kd_v * scale[None, :] - GT_KD[None, :]).mean()
    assert kd_v_err <= 0.10, f"vertex albedo MAE {kd_v_err:.4f} > 0.10"
    rough_err = abs(float(jnp.mean(rough)) - GT_ROUGH)
    assert rough_err < 0.2, f"roughness {float(jnp.mean(rough)):.3f} vs {GT_ROUGH}"

    # ---- gate 2: BRDF re-render PSNR at eval spp ----
    # NO albedo scale here: the NVS re-render uses the learned material AND
    # the learned env as-is (reference utils.py evaluate: the kd/env scale
    # ambiguity cancels in the product; applying the albedo scale without
    # inversely scaling the env would double-count it)
    nvs_static = dataclasses.replace(static, spp=64, denoise_iters=3)

    @jax.jit
    def eval_render_nvs(p, ro, rd, k):
        return render_stage1(p, nvs_static, jnp.asarray(verts), ro, rd, k)

    psnrs = []
    for ro, rd, img, mask in frames[:3]:
        out = eval_render_nvs(state.params, ro, rd, jax.random.PRNGKey(9))
        m = np.asarray(out["mask"]).astype(bool)
        p, agree = _masked_psnr(np.asarray(out["image_brdf"]),
                                img, m, mask.astype(bool))
        assert agree > 0.95, f"coverage disagreement {agree:.3f}"
        psnrs.append(p)
    print("re-render PSNRs:", psnrs, flush=True)
    # measured-minus-margin (r5 run, seed 0): [25.80, 30.79, 30.29] dB,
    # mean 28.96 — one oblique view sits ~5 dB below the others at this
    # scale; 27.5 leaves ~1.5 dB for seed/MC noise while still catching
    # any real estimator/convergence regression
    assert np.mean(psnrs) >= 27.5, f"re-render PSNR {psnrs}"

    # relight renders (gate 3) DO apply the albedo scale: under the KNOWN
    # held-out env the recovered kd must be in GT units
    # (readme.md:105-113, albedo-scale corrected relighting)
    eval_static = dataclasses.replace(static, spp=64, denoise_iters=3)

    @jax.jit
    def eval_render(p, ro, rd, k, env):
        return render_stage1(p, eval_static, jnp.asarray(verts), ro, rd, k,
                             relight_env=env,
                             albedo_scale=jnp.asarray(scale, jnp.float32))

    # ---- gate 3: relight under the held-out envmap matches analytic GT ----
    # (the reference relight protocol: swap envmap_path, scale albedo,
    # re-render; readme.md:105-113)
    rel_psnrs = []
    for ro, rd, img, mask in relight_frames:
        out = eval_render(state.params, ro, rd, jax.random.PRNGKey(11),
                          jnp.asarray(RELIGHT_ENV()))
        m = np.asarray(out["mask"]).astype(bool)
        p, agree = _masked_psnr(np.asarray(out["image_brdf"]),
                                img, m, mask.astype(bool))
        assert agree > 0.95, f"relight coverage disagreement {agree:.3f}"
        rel_psnrs.append(p)
    print("relight PSNRs:", rel_psnrs, flush=True)
    assert np.mean(rel_psnrs) >= 25.0, f"relight PSNR {rel_psnrs}"
