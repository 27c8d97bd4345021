"""Unit tests for core ops against analytic counterparts (SURVEY.md §4 seams)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mirres_restir_nerf_mesh_tpu.ops.morton import morton3d, morton3d_invert
from mirres_restir_nerf_mesh_tpu.ops.marching import (
    composite_rays,
    march_rays,
    near_far_from_aabb,
)
from mirres_restir_nerf_mesh_tpu.ops.sh import sh_encode
from mirres_restir_nerf_mesh_tpu.ops.hashgrid import (
    HashGridSpec,
    hashgrid_encode,
    init_hashgrid,
)


def test_morton_roundtrip():
    rng = np.random.RandomState(0)
    coords = rng.randint(0, 128, size=(1000, 3)).astype(np.int32)
    codes = morton3d(jnp.asarray(coords))
    back = morton3d_invert(codes)
    np.testing.assert_array_equal(np.asarray(back), coords)


def test_morton_ordering_matches_bit_interleave():
    # morton(1,0,0)=1, morton(0,1,0)=2, morton(0,0,1)=4
    codes = morton3d(jnp.array([[1, 0, 0], [0, 1, 0], [0, 0, 1], [3, 5, 7]]))
    assert int(codes[0]) == 1 and int(codes[1]) == 2 and int(codes[2]) == 4
    x, y, z = 3, 5, 7
    expected = 0
    for b in range(3):
        expected |= ((x >> b) & 1) << (3 * b)
        expected |= ((y >> b) & 1) << (3 * b + 1)
        expected |= ((z >> b) & 1) << (3 * b + 2)
    assert int(codes[3]) == expected


def test_near_far_from_aabb():
    aabb = jnp.array([-1, -1, -1, 1, 1, 1], jnp.float32)
    rays_o = jnp.array([[0, 0, 3.0], [0, 0, 3.0], [5, 5, 5.0]])
    rays_d = jnp.array([[0, 0, -1.0], [0, 0, 1.0], [1, 0, 0.0]])
    nears, fars = near_far_from_aabb(rays_o, rays_d, aabb, min_near=0.05)
    assert np.isclose(float(nears[0]), 2.0, atol=1e-4)
    assert np.isclose(float(fars[0]), 4.0, atol=1e-4)
    # ray pointing away and missing rays get near >= far sentinel
    assert float(nears[1]) >= 1e9
    assert float(nears[2]) >= 1e9


def test_sh_encode_degree1_and_norms():
    d = jnp.array([[0.0, 0.0, 1.0]])
    out = sh_encode(d, degree=4)
    assert out.shape == (1, 16)
    assert np.isclose(float(out[0, 0]), 0.28209479, atol=1e-6)
    assert np.isclose(float(out[0, 2]), 0.48860251, atol=1e-6)  # z term
    # SH basis at degree 2 band for z-axis: only m=0 nonzero among l=1
    assert np.isclose(float(out[0, 1]), 0.0, atol=1e-7)
    assert np.isclose(float(out[0, 3]), 0.0, atol=1e-7)


def test_hashgrid_shapes_interp_and_grads():
    spec = HashGridSpec(num_levels=4, level_dim=2, base_resolution=4,
                        log2_hashmap_size=10, desired_resolution=32)
    key = jax.random.PRNGKey(0)
    emb = init_hashgrid(key, spec)
    x = jax.random.uniform(jax.random.PRNGKey(1), (128, 3), minval=-1, maxval=1)
    out = hashgrid_encode(emb, x, spec, bound=1.0)
    assert out.shape == (128, 8)

    # continuity: nearby points give nearby encodings
    eps = 1e-5
    out2 = hashgrid_encode(emb, x + eps, spec, bound=1.0)
    assert float(jnp.max(jnp.abs(out - out2))) < 1e-3

    # gradient flows to the table
    def loss(e):
        return jnp.sum(hashgrid_encode(e, x, spec, bound=1.0) ** 2)

    g = jax.grad(loss)(emb)
    assert float(jnp.sum(jnp.abs(g))) > 0


def test_hashgrid_max_level_masks_features():
    spec = HashGridSpec(num_levels=4, level_dim=2, base_resolution=4,
                        log2_hashmap_size=10, desired_resolution=32)
    emb = init_hashgrid(jax.random.PRNGKey(0), spec)
    x = jnp.zeros((4, 3))
    out = hashgrid_encode(emb, x, spec, bound=1.0, max_level=jnp.asarray(2))
    assert float(jnp.sum(jnp.abs(out[:, 4:]))) == 0.0
    assert float(jnp.sum(jnp.abs(out[:, :4]))) > 0.0


def test_composite_matches_manual():
    # 1 ray, 3 samples, hand-computed volume rendering
    sig = jnp.array([[1.0, 2.0, 0.5]])
    rgb = jnp.ones((1, 3, 3)) * jnp.array([1.0, 0.5, 0.25])[None, :, None]
    ts = jnp.array([[1.0, 1.1, 1.2]])
    dts = jnp.array([[0.1, 0.1, 0.1]])
    valid = jnp.ones((1, 3), bool)
    out = composite_rays(sig, rgb, ts, dts, valid)

    alpha = 1 - np.exp(-np.array([1.0, 2.0, 0.5]) * 0.1)
    T = np.array([1.0, 1 - alpha[0], (1 - alpha[0]) * (1 - alpha[1])])
    w = alpha * T
    np.testing.assert_allclose(np.asarray(out.weights[0]), w, rtol=1e-5)
    np.testing.assert_allclose(float(out.weights_sum[0]), w.sum(), rtol=1e-5)
    np.testing.assert_allclose(float(out.depth[0]), (w * np.array([1.0, 1.1, 1.2])).sum(), rtol=1e-5)


def test_composite_early_exit_masks_opaque_tail():
    sig = jnp.concatenate([jnp.full((1, 5), 1e4), jnp.ones((1, 5))], axis=1)
    rgb = jnp.ones((1, 10, 3))
    ts = jnp.arange(10, dtype=jnp.float32)[None] * 0.1 + 1.0
    dts = jnp.full((1, 10), 0.1)
    valid = jnp.ones((1, 10), bool)
    out = composite_rays(sig, rgb, ts, dts, valid, T_thresh=1e-4)
    # after the opaque first samples, T < thresh -> zero weight
    assert float(jnp.sum(out.weights[0, 5:])) == 0.0
    assert 0.999 < float(out.weights_sum[0]) <= 1.0


def test_march_rays_hits_occupied_region():
    # occupancy: only central 1/4 of the unit box occupied
    H = 32
    occ = np.zeros((1, H, H, H), np.uint8)
    occ[0, 12:20, 12:20, 12:20] = 1
    occ = jnp.asarray(occ)

    rays_o = jnp.array([[0.0, 0.0, 2.0]])
    rays_d = jnp.array([[0.0, 0.0, -1.0]])
    nears, fars = near_far_from_aabb(rays_o, rays_d, jnp.array([-1., -1, -1, 1, 1, 1]), 0.05)
    res = march_rays(rays_o, rays_d, occ, nears, fars, bound=1.0, K=32, max_steps=256)
    assert bool(jnp.any(res.valid))
    pts = np.asarray(res.xyzs[res.valid])
    # all valid samples inside the occupied subregion (+/- one cell)
    cell = 2.0 / H
    assert np.all(np.abs(pts) < 0.25 + 2 * cell)


def test_march_rays_stride_subsamples_long_rays():
    H = 32
    occ = jnp.ones((1, H, H, H), jnp.uint8)  # fully occupied
    rays_o = jnp.array([[0.0, 0.0, 2.0]])
    rays_d = jnp.array([[0.0, 0.0, -1.0]])
    nears, fars = near_far_from_aabb(rays_o, rays_d, jnp.array([-1., -1, -1, 1, 1, 1]), 0.05)
    K = 16
    res = march_rays(rays_o, rays_d, occ, nears, fars, bound=1.0, K=K, max_steps=512)
    # all K slots used, and ts span (near, far), not just the front
    assert int(jnp.sum(res.valid)) == K
    ts = np.asarray(res.ts[0])
    assert ts.max() > 2.5  # reaches deep into the box (near=1, far=3)
    # dt scaled by stride so opacity integrates over the skipped space
    assert float(res.dts[0, 0]) > 2 * 3.4641 / 512


def test_supercell_occupancy_matches_direct_gather():
    """The supercell-bitmask march occupancy path (_occupancy_march_sc:
    one wide row gather per supercell crossing + MXU one-hot selection) is
    bitwise-exact against the direct per-candidate gather (_occupancy_at)
    on random occupancy, mixed-norm ray dirs, and both dt schedules."""
    from mirres_restir_nerf_mesh_tpu.ops.marching import (
        SQRT3,
        _candidate_ts,
        _occupancy_at,
        _occupancy_march_sc,
    )

    rng = np.random.RandomState(0)
    cases = [(128, 64, 211, 0.0), (64, 32, 97, 0.0), (128, 48, 257, 1 / 128)]
    for H, N, S, dt_gamma in cases:
        occ = (rng.rand(1, H, H, H) < 0.4).astype(np.uint8)
        ro = rng.uniform(-2, 2, (N, 3)).astype(np.float32)
        rd = rng.randn(N, 3).astype(np.float32)
        rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
        rd[::3] *= rng.uniform(0.5, 2.0, (len(rd[::3]), 1))  # unnormalized too
        aabb = jnp.array([-1.0, -1, -1, 1, 1, 1], jnp.float32)
        nears, fars = near_far_from_aabb(jnp.asarray(ro), jnp.asarray(rd), aabb)
        noise = jnp.asarray(rng.rand(N).astype(np.float32))
        ts, dts = _candidate_ts(
            nears, S, 2 * SQRT3 / 1024, 2 * SQRT3 / H, dt_gamma, noise
        )
        pts = jnp.asarray(ro)[:, None, :] + jnp.asarray(rd)[:, None, :] * ts[..., None]
        ref = np.asarray(_occupancy_at(jnp.asarray(occ), pts, dts, 1.0))
        pc = jnp.clip(pts, -1.0, 1.0)
        g = jnp.clip((pc * 0.5 + 0.5) * H, 0, H - 1).astype(jnp.int32)
        got = np.asarray(_occupancy_march_sc(jnp.asarray(occ[0]), g))
        np.testing.assert_array_equal(ref, got)
