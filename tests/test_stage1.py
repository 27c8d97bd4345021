"""End-to-end stage-1 slice: joint material/env/offsets optimization on the
analytic sphere scene, starting from its exact SDF mesh.  Checks that the
path-traced (BRDF) image fits the ground truth and the recovered albedo
correlates with the true albedo (the inverse-rendering capability itself)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mirres_restir_nerf_mesh_tpu.config import Config, finalize
from mirres_restir_nerf_mesh_tpu.data.provider import RayDataset
from mirres_restir_nerf_mesh_tpu.data.synthetic import make_synthetic_dataset
from mirres_restir_nerf_mesh_tpu.export.meshops import decimate, marching_tets
from mirres_restir_nerf_mesh_tpu.models.material import MaterialSpec, init_material
from mirres_restir_nerf_mesh_tpu.models.nerf import NeRFSpec, init_nerf
from mirres_restir_nerf_mesh_tpu.render.stage1 import Stage1Params, Stage1Static, render_stage1
from mirres_restir_nerf_mesh_tpu.train import stage1
from mirres_restir_nerf_mesh_tpu.train.losses import build_topology


@pytest.fixture(scope="module")
def sphere_scene():
    n = 48
    ax = np.linspace(-1, 1, n, dtype=np.float32)
    X, Y, Z = np.meshgrid(ax, ax, ax, indexing="ij")
    field = 0.5 - np.sqrt(X ** 2 + Y ** 2 + Z ** 2)
    v, t = marching_tets(field, 0.0, origin=(-1, -1, -1), spacing=(2 / (n - 1),) * 3)
    v, t = decimate(v, t, 700)
    data = make_synthetic_dataset(n_frames=8, H=32, W=32, bound=1.0)
    return v, t, data


def test_stage1_inverse_rendering(sphere_scene):
    verts, tris, data = sphere_scene
    cfg = finalize(
        Config(
            bound=1.0, iters=120, use_brdf=True, env_h=16, env_w=32,
            lambda_rgb_brdf=0.2, lambda_mask=0.1, spp=1,
            lambda_lap=0.001, lambda_offsets=0.1,
        )
    )
    nerf_spec = NeRFSpec(bound=1.0)
    mat_spec = MaterialSpec(
        bound=1.0,
        min_vals=tuple(cfg.kd_min[:3]) + tuple(cfg.ks_min),
        max_vals=tuple(cfg.kd_max[:3]) + tuple(cfg.ks_max),
    )
    static = Stage1Static(
        tris=jnp.asarray(tris), nerf_spec=nerf_spec, mat_spec=mat_spec,
        spp=1, bounces=1,
    )
    topo = build_topology(tris, verts.shape[0])
    sampler = RayDataset(data, bound=1.0)

    key = jax.random.PRNGKey(0)
    nerf_params = init_nerf(key, nerf_spec)
    state = stage1.init_state(key, cfg, static, nerf_params, verts.shape[0])
    train_step = stage1.make_train_step(cfg, static, verts, topo)

    # full-frame batches (stage-1 trains per image like the reference)
    frames = [sampler.frame_rays(i) for i in range(data.num_frames)]

    def frame_batch(i):
        f = frames[i % len(frames)]
        return {
            "rays_o": f["rays_o"],
            "rays_d": f["rays_d"],
            "pixels": f["pixels"],
            "alpha": f["alpha"],
        }

    losses, psnrs_brdf = [], []
    for i in range(cfg.iters):
        key, sub = jax.random.split(key)
        state, aux = train_step(state, frame_batch(i), sub)
        losses.append(float(aux["loss"]))
        psnrs_brdf.append(float(aux["psnr_brdf"]))

    assert np.isfinite(losses).all()
    first = np.mean(psnrs_brdf[:8])
    last = np.mean(psnrs_brdf[-8:])
    assert last > first + 2.0, f"brdf psnr did not improve: {first:.2f} -> {last:.2f}"
    assert last > 14.0, f"absolute brdf psnr too low: {last:.2f}"

    # recovered albedo should correlate with the true one (0.8, 0.3, 0.2):
    # red channel clearly dominant
    from mirres_restir_nerf_mesh_tpu.models.material import sample_material, split_material

    pts = jnp.asarray(verts[::7], jnp.float32)
    kd, rough, metal = split_material(sample_material(state.params.mat, pts, mat_spec))
    kd_mean = np.asarray(jnp.mean(kd, axis=0))
    assert kd_mean[0] > kd_mean[1] > kd_mean[2], f"albedo ordering wrong: {kd_mean}"

    # vertex offsets should remain small (mesh already correct)
    off_mag = float(jnp.mean(jnp.linalg.norm(state.params.offsets, axis=-1)))
    assert off_mag < 0.05, off_mag

    # environment light stays non-negative and finite
    assert bool(jnp.isfinite(state.params.env).all())
    assert float(jnp.min(state.params.env)) >= 0.01 - 1e-6


@pytest.mark.skipif(
    not os.environ.get("RUN_SLOW_TESTS"),
    reason="~30min CPU compile+run; set RUN_SLOW_TESTS=1 (run in CI/nightly)",
)
def test_stage1_restir_mode_trains(sphere_scene):
    """Full ReSTIR DI + denoise + 1 bounce: short smoke training run."""
    verts, tris, data = sphere_scene
    cfg = finalize(
        Config(
            bound=1.0, iters=25, use_brdf=True, use_restir=True,
            env_h=16, env_w=32, lambda_rgb_brdf=0.2, lambda_mask=0.1, spp=1,
        )
    )
    nerf_spec = NeRFSpec(bound=1.0)
    mat_spec = MaterialSpec(
        bound=1.0,
        min_vals=tuple(cfg.kd_min[:3]) + tuple(cfg.ks_min),
        max_vals=tuple(cfg.kd_max[:3]) + tuple(cfg.ks_max),
    )
    static = Stage1Static(
        tris=jnp.asarray(tris), nerf_spec=nerf_spec, mat_spec=mat_spec,
        spp=2, bounces=1, use_restir=True, H=data.H, W=data.W,
        restir_tiles=4, restir_tile_size=64, restir_light_samples=8,
        restir_brdf_samples=1, restir_neighbors=3, restir_radius=5.0,
        restir_offsets=256, denoise_iters=2,
    )
    topo = build_topology(tris, verts.shape[0])
    sampler = RayDataset(data, bound=1.0)

    key = jax.random.PRNGKey(0)
    nerf_params = init_nerf(key, nerf_spec)
    state = stage1.init_state(key, cfg, static, nerf_params, verts.shape[0])
    train_step = stage1.make_train_step(cfg, static, verts, topo)

    f = sampler.frame_rays(0)
    batch = {"rays_o": f["rays_o"], "rays_d": f["rays_d"],
             "pixels": f["pixels"], "alpha": f["alpha"]}

    losses = []
    for i in range(cfg.iters):
        key, sub = jax.random.split(key)
        state, aux = train_step(state, batch, sub)
        losses.append(float(aux["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], f"loss flat: {losses[0]} -> {losses[-1]}"
    assert bool(jnp.isfinite(state.params.env).all())


def test_relighting_swaps_environment(sphere_scene):
    """render_stage1 with relight_env must light the scene with the new map
    (reference renderer.py:1026 env swap) and respond to albedo scaling."""
    verts, tris, data = sphere_scene
    cfg = finalize(Config(bound=1.0, use_brdf=True, env_h=8, env_w=16, spp=1))
    nerf_spec = NeRFSpec(bound=1.0)
    mat_spec = MaterialSpec(bound=1.0)
    static = Stage1Static(tris=jnp.asarray(tris), nerf_spec=nerf_spec,
                          mat_spec=mat_spec, spp=1, bounces=1)
    key = jax.random.PRNGKey(0)
    params = stage1.init_state(key, cfg, static, init_nerf(key, nerf_spec),
                               verts.shape[0]).params

    from mirres_restir_nerf_mesh_tpu.data.provider import RayDataset
    from mirres_restir_nerf_mesh_tpu.render.stage1 import render_stage1

    sampler = RayDataset(data, bound=1.0)
    f = sampler.frame_rays(0)

    dark = jnp.full((8, 16, 3), 0.05)
    bright = jnp.full((8, 16, 3), 3.0)
    out_dark = render_stage1(params, static, jnp.asarray(verts),
                             f["rays_o"], f["rays_d"], key, relight_env=dark)
    out_bright = render_stage1(params, static, jnp.asarray(verts),
                               f["rays_o"], f["rays_d"], key, relight_env=bright)
    m = out_dark["mask"]
    mean_dark = float(jnp.mean(out_dark["image_brdf"][m]))
    mean_bright = float(jnp.mean(out_bright["image_brdf"][m]))
    assert mean_bright > mean_dark * 5, (mean_dark, mean_bright)

    # albedo scale multiplies the shaded color roughly linearly
    out_scaled = render_stage1(params, static, jnp.asarray(verts),
                               f["rays_o"], f["rays_d"], key, relight_env=bright,
                               albedo_scale=jnp.array([0.5, 0.5, 0.5]))
    assert float(jnp.mean(out_scaled["image_brdf"][m])) < mean_bright

    # exposure doubles hdr output (reference renderer.py:1126)
    out_exp = render_stage1(params, static, jnp.asarray(verts),
                            f["rays_o"], f["rays_d"], key, relight_env=bright,
                            exposure_scale=jnp.asarray(2.0))
    np.testing.assert_allclose(
        np.asarray(out_exp["image_brdf"]), np.asarray(out_bright["image_brdf"]) * 2,
        rtol=1e-5,
    )


def test_ssaa_loss_shapes(sphere_scene):
    """stage1_loss with ssaa=2 renders 4x rays and compares at GT resolution."""
    verts, tris, data = sphere_scene
    cfg = finalize(Config(bound=1.0, use_brdf=True, env_h=8, env_w=16,
                          ssaa=2, lambda_lap=0, lambda_offsets=0))
    nerf_spec = NeRFSpec(bound=1.0)
    mat_spec = MaterialSpec(bound=1.0)
    static = Stage1Static(tris=jnp.asarray(tris), nerf_spec=nerf_spec,
                          mat_spec=mat_spec, spp=1, bounces=1,
                          H=data.H * 2, W=data.W * 2, ssaa=2)
    topo = build_topology(tris, verts.shape[0])
    key = jax.random.PRNGKey(0)
    state = stage1.init_state(key, cfg, static, init_nerf(key, nerf_spec), verts.shape[0])

    from mirres_restir_nerf_mesh_tpu.data.provider import RayDataset

    sampler = RayDataset(data, bound=1.0)
    f = sampler.frame_rays(0, ssaa=2)
    g = sampler.frame_rays(0)
    batch = {"rays_o": f["rays_o"], "rays_d": f["rays_d"],
             "pixels": g["pixels"], "alpha": g["alpha"]}
    assert f["rays_o"].shape[0] == 4 * g["rays_o"].shape[0]
    loss, aux = stage1.stage1_loss(state.params, static, jnp.asarray(verts),
                                   topo, batch, key, cfg)
    assert bool(jnp.isfinite(loss))


def test_jittered_normal_tap_grad():
    """Reference normal-smoothness formulation (renderer.py:1001-1011): an
    image-space bilinear tap at pixel+jitter.  Flat normal buffers must give
    zero grad; a seam concentrates grad at the seam; misses contribute 0."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mirres_restir_nerf_mesh_tpu.render.stage1 import _jittered_tap_grad

    H = W = 32
    key = jax.random.PRNGKey(0)

    flat = jnp.tile(jnp.array([0.0, 0.0, 1.0]), (H * W, 1))
    mask = jnp.ones((H * W,), bool)
    g0 = _jittered_tap_grad(key, flat, mask, H, W, std_uv=0.05)
    assert float(jnp.max(g0)) < 1e-6

    # vertical seam at W//2: +z left, +x right
    xs = np.arange(W)[None, :].repeat(H, 0).reshape(-1)
    seam = np.where(
        (xs < W // 2)[:, None],
        np.array([[0.0, 0.0, 1.0]]),
        np.array([[1.0, 0.0, 0.0]]),
    ).astype(np.float32)
    g1 = _jittered_tap_grad(key, jnp.asarray(seam), mask, H, W, std_uv=0.05)
    g1 = np.asarray(g1).reshape(H, W)
    near = np.abs(xs.reshape(H, W) - W // 2) <= 2
    assert g1[near].mean() > 10 * max(g1[~near].mean(), 1e-9)

    # masked-out pixels are excluded
    g2 = _jittered_tap_grad(key, jnp.asarray(seam), jnp.zeros((H * W,), bool), H, W)
    assert float(jnp.max(g2)) == 0.0


def test_masked_apply_mc_key_mode():
    """masked_apply(key=...) — the Monte-Carlo mode used for the indirect
    pass — is statistically unbiased: the chunked estimator of a known
    per-lane integral matches the uncompacted one, dead lanes get fill, and
    skipped chunks never execute their payload."""
    from mirres_restir_nerf_mesh_tpu.utils.compact import masked_apply

    P, S = 512, 2048
    mask = jnp.arange(P) % 8 == 0  # 12.5% live -> 1 of 4 chunks executes
    centers = jnp.linspace(0.0, 1.0, P)[:, None]

    def payload(k, c):
        # MC estimate of E[c + u] = c + 0.5
        u = jax.random.uniform(k, (c.shape[0], S))
        return jnp.mean(c + u, axis=1, keepdims=True)

    out = masked_apply(payload, mask, (centers,), fills=(-7.0,), chunks=4,
                       key=jax.random.PRNGKey(3))
    out = np.asarray(out)[:, 0]
    m = np.asarray(mask)
    expect = np.asarray(centers)[:, 0] + 0.5
    np.testing.assert_allclose(out[m], expect[m], atol=0.05)
    # live lanes (64) all fit chunk 0 (size 128) after the live-first stable
    # sort; chunk 0's remaining 64 lanes are the FIRST 64 dead lanes in pixel
    # order — executed, so they get computed values.  Chunks 1-3 are skipped,
    # so every later dead lane must carry the fill value.
    dead_rank = np.cumsum(~m) - 1
    exec_dead = (~m) & (dead_rank < 128 - 64)
    skip_dead = (~m) & (dead_rank >= 128 - 64)
    assert skip_dead.sum() == 512 - 128
    assert (out[skip_dead] == -7.0).all()
    np.testing.assert_allclose(out[exec_dead], expect[exec_dead], atol=0.05)


def test_pack_cols_bit_preservation_shard_map():
    """pack_cols rides int32 columns as f32 bitcasts; many small-int bit
    patterns are f32 denormals/NaN payloads, so correctness depends on every
    op touching the carrier (concat/gather/slice, including inside shard_map
    bodies) staying pure data movement.  Lock that assumption with
    adversarial patterns through pack -> permute -> chunk-slice -> unpack,
    plain and under shard_map (ADVICE r4)."""
    from jax.sharding import PartitionSpec as P_
    from jax.experimental.shard_map import shard_map

    from mirres_restir_nerf_mesh_tpu.parallel.mesh import make_mesh
    from mirres_restir_nerf_mesh_tpu.utils.compact import pack_cols, unpack_cols

    P = 64
    # adversarial int32 patterns: zero, denormal-payload small ints, NaN
    # boundary 0x7fc00000 +/- 1, signalling-NaN payloads, -1, int min/max
    patterns = np.array(
        [0, 1, 2, 0x007FFFFF, 0x00800000, 0x7F800000, 0x7FC00000 - 1,
         0x7FC00000, 0x7FC00000 + 1, 0x7FFFFFFF, -1, -2, np.int32(-2**31),
         0x80000001 - 2**32, 0xFFC00000 - 2**32, 42],
        dtype=np.int64,
    ).astype(np.int32)
    ints = jnp.asarray(np.resize(patterns, (P, 2)))
    bools = jnp.asarray(np.arange(P) % 3 == 0)
    floats = jnp.asarray(np.linspace(-2.0, 2.0, P * 3).reshape(P, 3).astype(np.float32))
    args = (ints, bools, floats)
    perm_np = np.random.RandomState(0).permutation(P).astype(np.int32)

    def roundtrip(ints, bools, floats, perm):
        packed, specs = pack_cols((ints, bools, floats))
        packed = packed[perm]
        # chunk-slice then reconcat, as masked_apply does
        parts = [packed[i * 16:(i + 1) * 16] for i in range(P // 16)]
        packed = jnp.concatenate(parts, axis=0)
        return tuple(unpack_cols(packed, specs))

    out = jax.jit(roundtrip)(*args, jnp.asarray(perm_np))
    np.testing.assert_array_equal(np.asarray(out[0]), np.asarray(ints)[perm_np])
    np.testing.assert_array_equal(np.asarray(out[1]), np.asarray(bools)[perm_np])
    np.testing.assert_array_equal(np.asarray(out[2]), np.asarray(floats)[perm_np])

    # same under shard_map: per-shard local permutation of a sharded batch
    ndev = jax.device_count()
    assert P % ndev == 0
    mesh = make_mesh((ndev,), ("data",))
    local_perm = jnp.asarray(
        np.random.RandomState(1).permutation(P // ndev).astype(np.int32)
    )

    def body(ints, bools, floats):
        packed, specs = pack_cols((ints, bools, floats))
        packed = packed[local_perm]
        return tuple(unpack_cols(packed, specs))

    sharded = shard_map(
        body, mesh=mesh,
        in_specs=(P_("data"), P_("data"), P_("data")),
        out_specs=(P_("data"), P_("data"), P_("data")),
    )
    out_s = jax.jit(sharded)(*args)
    exp = [np.asarray(a).reshape((ndev, P // ndev) + a.shape[1:]) for a in args]
    exp = [e[:, np.asarray(local_perm)].reshape(a.shape) for e, a in zip(exp, args)]
    np.testing.assert_array_equal(np.asarray(out_s[0]), exp[0])
    np.testing.assert_array_equal(np.asarray(out_s[1]), exp[1])
    np.testing.assert_array_equal(np.asarray(out_s[2]), exp[2])


def test_restir_chain_chunk_equivalence(sphere_scene):
    """The live-lane-compacted ReSTIR spp chain (chain_chunked path in
    render_stage1) must reproduce the uncompacted chain exactly: randoms are
    drawn in pixel space and threaded through (u/rand params), so
    temporal/spatial/final-eval/shade give identical values AND envmap
    gradients for every pixel."""
    verts, tris, data = sphere_scene
    nerf_spec = NeRFSpec(bound=1.0, hidden_dim=16, hidden_dim_color=16,
                         grid_levels=4, grid_log2_hashmap_size=12,
                         grid_desired_resolution=32)
    mat_spec = MaterialSpec(bound=1.0)
    key = jax.random.PRNGKey(0)
    params = Stage1Params(
        nerf=init_nerf(key, nerf_spec),
        offsets=jnp.zeros((verts.shape[0], 3)),
        mat=init_material(key, mat_spec),
        env=jnp.full((8, 16, 3), 0.5),
    )
    sampler = RayDataset(data, bound=1.0)
    f = sampler.frame_rays(0)

    outs = {}
    grads = {}
    for chunks in (1, 4):
        static = Stage1Static(
            tris=jnp.asarray(tris), nerf_spec=nerf_spec, mat_spec=mat_spec,
            spp=2, bounces=0, H=data.H, W=data.W, compact_chunks=chunks,
            use_restir=True, restir_tiles=4, restir_tile_size=32,
            restir_light_samples=4, restir_offsets=64,
        )

        def loss_fn(p):
            out = render_stage1(p, static, jnp.asarray(verts),
                                f["rays_o"], f["rays_d"], jax.random.PRNGKey(7))
            l = jnp.sum(out["diffuse_light"]) + jnp.sum(out["specular_light"])
            return l, out

        (_, out), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        outs[chunks] = out
        grads[chunks] = g

    m = np.asarray(outs[1]["mask"])
    assert m.any() and (~m).any()
    for k in ("diffuse_light", "specular_light"):
        a, b = np.asarray(outs[1][k]), np.asarray(outs[4][k])
        np.testing.assert_allclose(a, b, atol=1e-5, err_msg=k)
    ga = np.asarray(grads[1].env)
    gb = np.asarray(grads[4].env)
    np.testing.assert_allclose(ga, gb, atol=1e-4)


def test_compact_chunks_equivalence(sphere_scene):
    """Live-lane compaction (utils/compact.py) is exact: compact_chunks=4
    must reproduce compact_chunks=1 on every covered pixel, for values AND
    parameter gradients."""
    verts, tris, data = sphere_scene
    nerf_spec = NeRFSpec(bound=1.0, hidden_dim=16, hidden_dim_color=16,
                         grid_levels=4, grid_log2_hashmap_size=12,
                         grid_desired_resolution=32)
    mat_spec = MaterialSpec(bound=1.0)
    key = jax.random.PRNGKey(0)
    params = Stage1Params(
        nerf=init_nerf(key, nerf_spec),
        offsets=jnp.zeros((verts.shape[0], 3)),
        mat=init_material(key, mat_spec),
        env=jnp.full((8, 16, 3), 0.5),
    )
    sampler = RayDataset(data, bound=1.0)
    f = sampler.frame_rays(0)

    outs = {}
    grads = {}
    for chunks in (1, 4):
        static = Stage1Static(
            tris=jnp.asarray(tris), nerf_spec=nerf_spec, mat_spec=mat_spec,
            spp=1, bounces=0, H=data.H, W=data.W, compact_chunks=chunks,
        )

        def loss_fn(p):
            out = render_stage1(p, static, jnp.asarray(verts),
                                f["rays_o"], f["rays_d"], jax.random.PRNGKey(7))
            l = (jnp.sum(out["image"] ** 2) + jnp.sum(out["image_brdf"] ** 2)
                 + jnp.sum(out["kd_grad"]))
            return l, out

        (l, out), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        outs[chunks] = out
        grads[chunks] = g

    m = np.asarray(outs[1]["weights_sum"]) > 0.5
    assert m.any() and (~m).any()
    for k in ("image", "image_brdf", "kd"):
        a, b = np.asarray(outs[1][k]), np.asarray(outs[4][k])
        np.testing.assert_allclose(a[m], b[m], atol=1e-5, err_msg=k)
    for name in ("mat", "env", "offsets"):
        ga = np.asarray(jax.tree.leaves(getattr(grads[1], name))[0])
        gb = np.asarray(jax.tree.leaves(getattr(grads[4], name))[0])
        np.testing.assert_allclose(ga, gb, atol=2e-3, err_msg=name)
