"""Tile tracer (ops/tile_tracer.py) agreement with the LBVH backend.

Covers the ADVICE round-1 ask: a large-mesh (C >> candidate capacity)
agreement test, plus the `uncertain` exactness telemetry and any-hit
(occlusion) parity.  Reference semantics under test:
`nerf/bvhworkers/intersect_test.slang:14-167`.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mirres_restir_nerf_mesh_tpu.ops import bvh as lbvh_mod
from mirres_restir_nerf_mesh_tpu.ops import cluster_bvh
from mirres_restir_nerf_mesh_tpu.ops import tile_tracer


def make_sphere(n_theta=24, n_phi=48, radius=0.7):
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


def bumpy_sphere(n_theta, n_phi, seed=0):
    """Sphere with radial noise: many morton clusters, grazing-ray heavy."""
    v, t = make_sphere(n_theta, n_phi)
    rng = np.random.RandomState(seed)
    r = np.linalg.norm(v, axis=1, keepdims=True)
    v = v * (1.0 + 0.15 * np.sin(9 * v[:, :1]) * np.cos(7 * v[:, 1:2]))
    return v.astype(np.float32), t


def camera_rays(n, seed=1, origin=(0.0, 0.0, 2.5)):
    rng = np.random.RandomState(seed)
    o = np.tile(np.asarray(origin, np.float32), (n, 1))
    d = np.concatenate(
        [rng.uniform(-0.45, 0.45, (n, 2)).astype(np.float32), -np.ones((n, 1), np.float32)],
        axis=1,
    )
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


@pytest.mark.parametrize("n_theta,n_phi", [(24, 48), (48, 96)])
def test_tile_matches_lbvh_closest_hit(n_theta, n_phi):
    verts, tris = bumpy_sphere(n_theta, n_phi)
    rays_o, rays_d = camera_rays(1024)

    bvh = lbvh_mod.build_bvh(jnp.asarray(verts), jnp.asarray(tris))
    ref = lbvh_mod.intersect_bvh(bvh, rays_o, rays_d)

    cm = cluster_bvh.build_clusters(jnp.asarray(verts), jnp.asarray(tris), 128)
    C, S = cm.prim.shape
    out = tile_tracer.tile_trace(cm, rays_o, rays_d, k_cap=min(C, 128), tile=512)

    assert not bool(jnp.any(out.uncertain)), "candidate capacity overflowed"
    np.testing.assert_array_equal(np.asarray(out.hit.prim >= 0), np.asarray(ref.prim >= 0))
    hitm = np.asarray(ref.prim >= 0)
    np.testing.assert_allclose(
        np.asarray(out.hit.t)[hitm], np.asarray(ref.t)[hitm], rtol=1e-5, atol=1e-6
    )
    # same triangle (or an exactly coplanar duplicate at equal t)
    same = np.asarray(out.hit.prim) == np.asarray(ref.prim)
    close_t = np.abs(np.asarray(out.hit.t) - np.asarray(ref.t)) <= 1e-5
    assert np.all(same[hitm] | close_t[hitm])


def test_tile_large_mesh_beyond_capacity():
    """C >> k_cap: exactness telemetry must be clean at the default capacity
    for a real surface mesh (the ADVICE large-mesh agreement test)."""
    verts, tris = bumpy_sphere(64, 128)  # ~16k tris -> C ~ 127
    rays_o, rays_d = camera_rays(512, seed=3)
    cm = cluster_bvh.build_clusters(jnp.asarray(verts), jnp.asarray(tris), 128)
    C, S = cm.prim.shape
    assert C > 32

    bvh = lbvh_mod.build_bvh(jnp.asarray(verts), jnp.asarray(tris))
    ref = lbvh_mod.intersect_bvh(bvh, rays_o, rays_d)

    out = tile_tracer.tile_trace(cm, rays_o, rays_d, k_cap=64, tile=512)
    certain = ~np.asarray(out.uncertain)
    hitm = np.asarray(ref.prim >= 0) & certain
    np.testing.assert_array_equal(
        np.asarray(out.hit.prim >= 0)[certain], np.asarray(ref.prim >= 0)[certain]
    )
    np.testing.assert_allclose(
        np.asarray(out.hit.t)[hitm], np.asarray(ref.t)[hitm], rtol=1e-5, atol=1e-6
    )
    # and the default capacity should leave nothing uncertain
    out_full = tile_tracer.tile_trace(cm, rays_o, rays_d, k_cap=min(C, 128))
    assert not bool(jnp.any(out_full.uncertain))


def test_tile_occlusion_and_tmax():
    verts, tris = make_sphere(24, 48)
    n = 512
    rng = np.random.RandomState(7)
    # shadow rays from points outside the sphere toward random directions
    o = rng.uniform(-1.5, 1.5, (n, 3)).astype(np.float32)
    o = o / np.maximum(np.linalg.norm(o, axis=1, keepdims=True), 1e-6) * 1.2
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    rays_o, rays_d = jnp.asarray(o), jnp.asarray(d)

    bvh = lbvh_mod.build_bvh(jnp.asarray(verts), jnp.asarray(tris))
    ref_occ = lbvh_mod.occluded(bvh, rays_o, rays_d, 1e9)

    cm = cluster_bvh.build_clusters(jnp.asarray(verts), jnp.asarray(tris), 128)
    got = tile_tracer.occluded_tiles(cm, rays_o, rays_d, 1e9, dense_threshold=1)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref_occ))

    # finite t_max: hits beyond the range must not occlude
    ref_t = lbvh_mod.intersect_bvh(bvh, rays_o, rays_d).t
    tm = np.asarray(ref_t)
    tm = np.where(np.isfinite(tm), tm * 0.5, 0.05).astype(np.float32)
    got_near = tile_tracer.occluded_tiles(
        cm, rays_o, rays_d, jnp.asarray(tm), dense_threshold=1
    )
    assert not bool(jnp.any(got_near))


def test_tile_octant_sort_matches_unsorted():
    """sort_octants is a pure reorder: with full candidate budget the result
    must match the unsorted trace exactly (incoherent shadow-ray batch)."""
    verts, tris = bumpy_sphere(32, 64)
    cm = cluster_bvh.build_clusters(jnp.asarray(verts), jnp.asarray(tris), 128)
    C, S = cm.prim.shape
    rng = np.random.RandomState(11)
    n = 1024
    o = rng.normal(size=(n, 3)).astype(np.float32)
    o = o / np.linalg.norm(o, axis=1, keepdims=True) * 1.1
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    rays_o, rays_d = jnp.asarray(o), jnp.asarray(d)

    ref = tile_tracer.tile_trace(cm, rays_o, rays_d, k_cap=C)
    for mode in (True, "morton", "morton_dir2"):
        got = tile_tracer.tile_trace(
            cm, rays_o, rays_d, k_cap=C, sort_octants=mode, sort_block=512
        )
        np.testing.assert_array_equal(np.asarray(got.hit.prim), np.asarray(ref.hit.prim))
        hitm = np.asarray(ref.hit.prim >= 0)
        np.testing.assert_allclose(
            np.asarray(got.hit.t)[hitm], np.asarray(ref.hit.t)[hitm], rtol=1e-6
        )


def test_tile_per_ray_padding():
    """N not a multiple of the tile size."""
    verts, tris = make_sphere(24, 48)
    rays_o, rays_d = camera_rays(700, seed=5)
    cm = cluster_bvh.build_clusters(jnp.asarray(verts), jnp.asarray(tris), 128)
    bvh = lbvh_mod.build_bvh(jnp.asarray(verts), jnp.asarray(tris))
    ref = lbvh_mod.intersect_bvh(bvh, rays_o, rays_d)
    out = tile_tracer.tile_trace(cm, rays_o, rays_d)
    np.testing.assert_array_equal(np.asarray(out.hit.prim >= 0), np.asarray(ref.prim >= 0))


def test_uncertain_telemetry_surfaces_through_tracer():
    """VERDICT r2 item 7: budget truncation must be VISIBLE in production —
    a deep stack of slabs with a tiny candidate budget triggers uncertain>0,
    collected by Tracer.telemetry and popped as a scalar count."""
    from mirres_restir_nerf_mesh_tpu.ops.tracer import Tracer

    # Decoy rings: each ring's cluster AABB spans the full [-1,1]^2 disc at
    # its depth (entry BEFORE the wall) but holds no geometry near the center,
    # so entry-sorted candidate selection burns the budget on clusters that
    # cannot produce the hit — the wall behind them is dropped.
    vs, ts = [], []

    def ring(z):
        b0 = len(vs)
        n = 128
        for k in range(n):
            a0 = 2 * np.pi * k / n
            a1 = 2 * np.pi * (k + 0.5) / n
            vs.append([np.cos(a0), np.sin(a0), z])
            vs.append([np.cos(a1), np.sin(a1), z])
            vs.append([0.98 * np.cos(a0), 0.98 * np.sin(a0), z + 0.005])
        for k in range(n):
            b = b0 + 3 * k
            ts.append([b, b + 1, b + 2])

    for i in range(8):
        ring(1.0 - 0.05 * i)
    # solid wall behind the rings (the true hit for center rays)
    bw = len(vs)
    vs += [[-1, -1, 0.2], [1, -1, 0.2], [1, 1, 0.2], [-1, 1, 0.2]]
    for k in range(64):
        ts.append([bw, bw + 1, bw + 2])
        ts.append([bw, bw + 2, bw + 3])
    verts = jnp.asarray(np.asarray(vs, np.float32))
    tris = jnp.asarray(np.asarray(ts, np.int32))
    cm = cluster_bvh.build_clusters(verts, tris, 128)
    C, S = cm.prim.shape
    assert C >= 8, f"fixture needs many clusters, got C={C}"

    # center rays: inside every ring AABB, hitting only the wall
    rng = np.random.RandomState(5)
    o = np.column_stack([
        rng.uniform(-0.2, 0.2, 512), rng.uniform(-0.2, 0.2, 512),
        np.full(512, 2.0),
    ]).astype(np.float32)
    d = np.tile(np.array([0.0, 0.0, -1.0], np.float32), (512, 1))
    rays_o, rays_d = jnp.asarray(o), jnp.asarray(d)
    tr = Tracer(cm, "tile", k_cap=2, k_cap_incoherent=2, dense_threshold=1)

    @jax.jit
    def probe(ro, rd):
        hit = tr.intersect(ro, rd)
        return hit.t, tr.pop_telemetry()

    t, unc = probe(rays_o, rays_d)
    assert float(unc) > 0, "tiny budget on a deep slab stack must report uncertainty"

    tr2 = Tracer(cm, "tile", k_cap=int(C), k_cap_incoherent=int(C), dense_threshold=1)

    @jax.jit
    def probe2(ro, rd):
        hit = tr2.intersect(ro, rd)
        return hit.t, tr2.pop_telemetry()

    t2, unc2 = probe2(rays_o, rays_d)
    assert float(unc2) == 0, "full budget must be certain"
    # and the truncated trace really was wrong about some rays
    assert not np.allclose(np.asarray(t), np.asarray(t2))


def test_tile_dead_tail_block_skip_exact():
    """Dead-lane-heavy launches (visibility threading / compaction tails set
    t_max=0) run the blocked candidate prep (_octant_candidates_blocked) and
    the queue's tail-chunk skip; results on live lanes must match a fully
    live trace ray-for-ray, and dead lanes must never report a hit."""
    verts, tris = bumpy_sphere(32, 64)
    cm = cluster_bvh.build_clusters(jnp.asarray(verts), jnp.asarray(tris), 128)
    C, S = cm.prim.shape
    rng = np.random.RandomState(3)
    n = 4096  # 8 tiles of 512 -> blocked prep path (nb in {2,4,8})
    o = rng.normal(size=(n, 3)).astype(np.float32)
    o = o / np.linalg.norm(o, axis=1, keepdims=True) * 1.3
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    rays_o, rays_d = jnp.asarray(o), jnp.asarray(d)

    # ~85% dead: after the morton sort (dead to tail) most tile BLOCKS are
    # fully dead and the prep cond-skips them
    alive = rng.rand(n) < 0.15
    tm = jnp.asarray(np.where(alive, 1e9, 0.0).astype(np.float32))

    ref = tile_tracer.tile_trace(cm, rays_o, rays_d, k_cap=C, t_max=1e9)
    got = tile_tracer.tile_trace(
        cm, rays_o, rays_d, k_cap=C, t_max=tm, sort_octants="morton"
    )
    am = np.asarray(alive)
    np.testing.assert_array_equal(
        np.asarray(got.hit.prim)[am], np.asarray(ref.hit.prim)[am]
    )
    hitm = am & np.asarray(ref.hit.prim >= 0)
    np.testing.assert_allclose(
        np.asarray(got.hit.t)[hitm], np.asarray(ref.hit.t)[hitm], rtol=1e-6
    )
    assert not np.any(np.asarray(got.hit.prim)[~am] >= 0)

    # any-hit flavor (the ReSTIR cross-visibility shape)
    ref_occ = tile_tracer.occluded_tiles(cm, rays_o, rays_d, 1e9, k_cap=C)
    got_occ = tile_tracer.occluded_tiles(
        cm, rays_o, rays_d, tm, k_cap=C, sort_octants="morton"
    )
    np.testing.assert_array_equal(np.asarray(got_occ)[am], np.asarray(ref_occ)[am])
    assert not np.any(np.asarray(got_occ)[~am])


def test_tile_supercluster_hierarchy_exact(monkeypatch):
    """Two-level candidate prep (supercluster coarse pass + child expansion,
    used when C > HIER_MIN_C) must reproduce the single-level trace exactly
    when budgets are full — closest hit AND any-hit, coherent and
    incoherent batches."""
    verts, tris = bumpy_sphere(48, 96)
    cm = cluster_bvh.build_clusters(jnp.asarray(verts), jnp.asarray(tris), 128)
    C, S = cm.prim.shape
    assert C >= 16, "fixture needs several superclusters"

    rng = np.random.RandomState(9)
    n = 2048
    o = rng.normal(size=(n, 3)).astype(np.float32)
    o = o / np.linalg.norm(o, axis=1, keepdims=True) * 1.4
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    rays_o, rays_d = jnp.asarray(o), jnp.asarray(d)

    ref = tile_tracer.tile_trace(cm, rays_o, rays_d, k_cap=C)
    assert not bool(jnp.any(ref.uncertain))

    # force the hierarchical path; keep ALL superclusters (exactness budget)
    monkeypatch.setattr(tile_tracer, "HIER_MIN_C", 1)
    monkeypatch.setattr(tile_tracer, "HIER_KEEP", int(cm.sc_min.shape[0]))
    got = tile_tracer.tile_trace(cm, rays_o, rays_d, k_cap=C)
    assert not bool(jnp.any(got.uncertain))
    np.testing.assert_array_equal(np.asarray(got.hit.prim), np.asarray(ref.hit.prim))
    hitm = np.asarray(ref.hit.prim >= 0)
    np.testing.assert_allclose(
        np.asarray(got.hit.t)[hitm], np.asarray(ref.hit.t)[hitm], rtol=1e-6
    )

    ref_occ = tile_tracer.occluded_tiles(cm, rays_o, rays_d, 1e9, k_cap=C)
    got_occ = tile_tracer.occluded_tiles(
        cm, rays_o, rays_d, 1e9, k_cap=C, sort_octants="morton"
    )
    np.testing.assert_array_equal(np.asarray(got_occ), np.asarray(ref_occ))

    # a tight supercluster keep-budget must surface in `uncertain`, not
    # silently corrupt: rays whose nearest supercluster got cut are flagged
    monkeypatch.setattr(tile_tracer, "HIER_KEEP", 1)
    cut = tile_tracer.tile_trace(cm, rays_o, rays_d, k_cap=C)
    wrong = np.asarray(cut.hit.prim) != np.asarray(ref.hit.prim)
    unc = np.asarray(cut.uncertain)
    assert unc.any(), "cut supercluster budget must report uncertainty"
    assert not (wrong & ~unc).any(), "every wrong ray must be flagged uncertain"
