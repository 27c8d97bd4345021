"""End-to-end stage-0 slice: train the radiance field on the synthetic sphere
scene and check that reconstruction quality improves materially.

This is the framework's analog of the reference's metric-driven validation
(SURVEY.md §4): short-iteration PSNR gate instead of golden images.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mirres_restir_nerf_mesh_tpu.config import Config, finalize
from mirres_restir_nerf_mesh_tpu.data.provider import RayDataset
from mirres_restir_nerf_mesh_tpu.data.synthetic import make_synthetic_dataset
from mirres_restir_nerf_mesh_tpu.models.nerf import NeRFSpec
from mirres_restir_nerf_mesh_tpu.train import stage0
from mirres_restir_nerf_mesh_tpu.train.metrics import psnr


@pytest.fixture(scope="module")
def tiny_cfg():
    cfg = Config(
        bound=1.0,
        iters=300,
        num_rays=1024,
        max_steps=128,
        samples_per_ray=32,
        samples_per_ray_infer=48,
        grid_size=32,
        dt_gamma=0.0,
        lambda_tv=0.0,
        lambda_mask=0.1,
        density_thresh=10.0,
        update_extra_interval=16,
    )
    return finalize(cfg)


def test_stage0_training_improves_psnr(tiny_cfg):
    cfg = tiny_cfg
    data = make_synthetic_dataset(n_frames=12, H=48, W=48, bound=cfg.bound)
    sampler = RayDataset(data, bound=cfg.bound)
    # small field: this test checks learning dynamics, and the full-size
    # 16L/2^19 spec costs ~1 min of XLA CPU compile alone
    spec = NeRFSpec(bound=cfg.bound, hidden_dim=32, hidden_dim_color=32,
                    grid_levels=8, grid_log2_hashmap_size=15,
                    grid_desired_resolution=128)

    key = jax.random.PRNGKey(0)
    state = stage0.init_state(key, cfg, spec)
    train_step = stage0.make_train_step(cfg, spec, sampler)
    occ_update = stage0.make_occ_update(cfg, spec)

    # initial PSNR on a training view
    render_chunk = stage0.make_render_fn(cfg, spec, use_ema=False)
    frame = sampler.frame_rays(0)
    img0, _ = stage0.render_frame(state, render_chunk, frame["rays_o"], frame["rays_d"],
                                  data.H, data.W, chunk=2048)
    gt = np.asarray(frame["pixels"]).reshape(data.H, data.W, 3)
    psnr_before = float(psnr(jnp.asarray(img0), jnp.asarray(gt)))

    losses = []
    for i in range(cfg.iters):
        key, sub = jax.random.split(key)
        if i % cfg.update_extra_interval == 0:
            key, ko = jax.random.split(key)
            state = occ_update(state, ko)
        state, aux = train_step(state, sub)
        losses.append(float(aux["loss"]))

    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.5, f"loss did not drop: {losses[0]} -> {losses[-1]}"

    img1, depth1 = stage0.render_frame(state, render_chunk, frame["rays_o"], frame["rays_d"],
                                       data.H, data.W, chunk=2048)
    psnr_after = float(psnr(jnp.asarray(img1), jnp.asarray(gt)))
    assert psnr_after > psnr_before + 4.0, f"psnr {psnr_before:.2f} -> {psnr_after:.2f}"
    assert psnr_after > 15.0, f"absolute psnr too low: {psnr_after:.2f}"

    # occupancy grid should have carved out free space around the sphere
    occ_rate = float(jnp.mean(state.occ.occ.astype(jnp.float32)))
    assert occ_rate < 0.5, f"occupancy did not sparsify: {occ_rate:.3f}"

    # depth at the image center should be near the analytic sphere depth
    c = data.H // 2
    ws = img1  # silence lint
    center_depth = float(depth1[c, c])
    # camera radius 2, sphere radius 0.5 -> depth ~1.5 (along unnormalized dir ~ on-axis)
    assert 1.2 < center_depth < 1.9, f"center depth {center_depth}"


def test_compacted_render_matches_dense():
    """Cross-ray compaction (render_rays compact_points) is exact when the
    valid count fits the budget (reference M-point compacted buffer,
    raymarching.cu two-pass marcher)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from mirres_restir_nerf_mesh_tpu.models.nerf import NeRFSpec, init_nerf
    from mirres_restir_nerf_mesh_tpu.render.volume import render_rays

    spec = NeRFSpec(bound=1.0, hidden_dim=16, hidden_dim_color=16, geo_feat_dim=7,
                    grid_levels=4, grid_log2_hashmap_size=12, grid_desired_resolution=64)
    params = init_nerf(jax.random.PRNGKey(0), spec)
    # sparse occupancy so many lattice slots are invalid
    occ = np.zeros((1, 16, 16, 16), np.uint8)
    occ[0, 6:10, 6:10, 6:10] = 1
    occ = jnp.asarray(occ)
    aabb = jnp.array([-1.0, -1, -1, 1, 1, 1], jnp.float32)

    n = 128
    rng = np.random.RandomState(0)
    ro = np.tile(np.array([0, 0, 2.0], np.float32), (n, 1))
    rd = np.concatenate([rng.uniform(-0.3, 0.3, (n, 2)).astype(np.float32),
                         -np.ones((n, 1), np.float32)], 1)
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    args = dict(K=16, max_steps=64, dt_gamma=0.0)

    dense = render_rays(params, occ, jnp.asarray(ro), jnp.asarray(rd), spec, aabb, **args)
    compact = render_rays(params, occ, jnp.asarray(ro), jnp.asarray(rd), spec, aabb,
                          compact_points=1024, **args)
    assert int(dense["num_points"]) < 1024  # budget covers all valid samples
    np.testing.assert_allclose(np.asarray(compact["image"]), np.asarray(dense["image"]),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(compact["depth"]), np.asarray(dense["depth"]),
                               rtol=1e-5, atol=1e-6)

    # gradients flow identically through the compacted path
    def loss(p, compact_points):
        out = render_rays(p, occ, jnp.asarray(ro), jnp.asarray(rd), spec, aabb,
                          compact_points=compact_points, **args)
        return jnp.mean(out["image"] ** 2)

    g1 = jax.grad(loss)(params, None)
    g2 = jax.grad(loss)(params, 1024)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_adaptive_num_rays_grows_bucketed(tmp_path):
    """Reference adaptive_num_rays (-O, utils.py:1133-1134): when the trained
    occupancy thins per-ray samples, the ray batch grows (power-of-two
    buckets, grow-only, capped) and the train step is rebuilt at the new
    static shape."""
    from mirres_restir_nerf_mesh_tpu.train.trainer import Trainer

    cfg = finalize(Config(
        workspace=str(tmp_path / "ws"), stage=0, bound=1.0, iters=10,
        num_rays=1024, num_points=2 ** 14, adaptive_num_rays=True,
        hash_levels=4, hash_log2_size=12, hash_max_res=32,
        samples_per_ray=16, max_steps=32, grid_size=32, data_parallel=False,
    ))
    data = make_synthetic_dataset(n_frames=2, H=32, W=32, bound=1.0)
    tr = Trainer("ngp", cfg, data)
    step_before = tr.train_step

    # early training: budget saturated -> no growth
    assert not tr._adapt_num_rays(float(cfg.num_points))
    assert cfg.num_rays == 1024 and tr.train_step is step_before

    # thinned occupancy: 4 points/ray at a 16k budget -> grow to the cap
    assert tr._adapt_num_rays(4.0 * 1024)
    assert cfg.num_rays == 4096  # 1024 * budget/points = 4x, bucketed
    assert tr.train_step is not step_before

    # grow-only: denser steps never shrink the batch
    assert not tr._adapt_num_rays(float(cfg.num_points) * 2)
    assert cfg.num_rays == 4096

    # cap: never beyond max(start, 2^14)
    tr._adapt_num_rays(1.0)
    assert cfg.num_rays <= 2 ** 14

    # the rebuilt step runs at the new shape
    tr.state, aux = tr.train_step(tr.state, jax.random.PRNGKey(0))
    assert np.isfinite(float(aux["loss"]))
