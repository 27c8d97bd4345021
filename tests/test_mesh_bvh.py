"""Tests for native mesh ops (marching tets, QEM decimate, clean) and the
pure-JAX LBVH builder + intersector against brute force."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mirres_restir_nerf_mesh_tpu.export.meshops import (
    clean_components,
    decimate,
    marching_tets,
)
from mirres_restir_nerf_mesh_tpu.ops.bvh import build_bvh, intersect_bvh, occluded


@pytest.fixture(scope="module")
def sphere_mesh():
    n = 48
    ax = np.linspace(-1, 1, n, dtype=np.float32)
    X, Y, Z = np.meshgrid(ax, ax, ax, indexing="ij")
    field = 0.5 - np.sqrt(X ** 2 + Y ** 2 + Z ** 2)
    v, t = marching_tets(field, 0.0, origin=(-1, -1, -1), spacing=(2 / (n - 1),) * 3)
    return v, t


def test_marching_tets_sphere_geometry(sphere_mesh):
    v, t = sphere_mesh
    r = np.linalg.norm(v, axis=1)
    assert abs(r.mean() - 0.5) < 0.01
    assert r.std() < 0.01
    # watertight: every edge shared by exactly two faces
    from collections import Counter

    edges = Counter()
    for f in t:
        for a, b in ((f[0], f[1]), (f[1], f[2]), (f[2], f[0])):
            edges[tuple(sorted((int(a), int(b))))] += 1
    assert set(edges.values()) == {2}
    # outward orientation
    e1 = v[t[:, 1]] - v[t[:, 0]]
    e2 = v[t[:, 2]] - v[t[:, 0]]
    nrm = np.cross(e1, e2)
    cent = (v[t[:, 0]] + v[t[:, 1]] + v[t[:, 2]]) / 3
    assert ((nrm * cent).sum(-1) > 0).all()


def test_decimate_preserves_shape(sphere_mesh):
    v, t = sphere_mesh
    v2, t2 = decimate(v, t, 1500)
    assert t2.shape[0] <= 1500 + 2
    r = np.linalg.norm(v2, axis=1)
    assert abs(r.mean() - 0.5) < 0.02


def test_clean_components_drops_debris(sphere_mesh):
    v, t = sphere_mesh
    v2, t2 = decimate(v, t, 800)
    blob_v = v2[:4] * 0.01 + 3.0
    blob_t = np.array([[0, 1, 2], [1, 2, 3]], np.int32) + v2.shape[0]
    vv = np.concatenate([v2, blob_v])
    tt = np.concatenate([t2, blob_t]).astype(np.int32)
    v3, t3 = clean_components(vv, tt, min_faces=8, min_diameter=0.05)
    assert t3.shape[0] == t2.shape[0]


def _brute_force(o, d, v, t):
    v0 = v[t[:, 0]]
    e1 = v[t[:, 1]] - v0
    e2 = v[t[:, 2]] - v0
    best_t = np.full(o.shape[0], np.inf)
    best_p = np.full(o.shape[0], -1)
    for i in range(o.shape[0]):
        pvec = np.cross(d[i], e2)
        det = (e1 * pvec).sum(-1)
        with np.errstate(divide="ignore", invalid="ignore"):
            inv = np.where(np.abs(det) < 1e-12, 0, 1 / det)
            tvec = o[i] - v0
            u = (tvec * pvec).sum(-1) * inv
            qvec = np.cross(tvec, e1)
            vv = (d[i] * qvec).sum(-1) * inv
            tt = (e2 * qvec).sum(-1) * inv
        ok = (np.abs(det) > 1e-12) & (u >= 0) & (vv >= 0) & (u + vv <= 1) & (tt > 1e-4)
        tt = np.where(ok, tt, np.inf)
        j = tt.argmin()
        if np.isfinite(tt[j]):
            best_t[i] = tt[j]
            best_p[i] = j
    return best_t, best_p


def test_bvh_matches_brute_force(sphere_mesh):
    v, t = sphere_mesh
    v, t = decimate(v, t, 600)
    bvh = jax.jit(build_bvh)(jnp.asarray(v), jnp.asarray(t))

    rng = np.random.RandomState(0)
    R = 256
    o = rng.randn(R, 3)
    o = o / np.linalg.norm(o, axis=1, keepdims=True) * 2.0
    target = rng.randn(R, 3) * 0.2
    d = target - o
    d = d / np.linalg.norm(d, axis=1, keepdims=True)

    hit = jax.jit(intersect_bvh)(bvh, jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32))
    bt, bp = _brute_force(o.astype(np.float32), d.astype(np.float32), v, t)

    ht = np.asarray(hit.t)
    agree = np.isclose(
        np.where(np.isinf(ht), 1e30, ht), np.where(np.isinf(bt), 1e30, bt), atol=1e-4
    )
    assert agree.mean() > 0.999
    assert (np.asarray(hit.prim) == bp).mean() > 0.999


def test_occlusion_distances(sphere_mesh):
    v, t = sphere_mesh
    v, t = decimate(v, t, 600)
    bvh = build_bvh(jnp.asarray(v), jnp.asarray(t))
    rng = np.random.RandomState(1)
    d = rng.randn(64, 3)
    d = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True), jnp.float32)
    o = jnp.zeros((64, 3))
    assert bool(occluded(bvh, o, d, 1.0).all())       # sphere at r=0.5 blocks
    assert not bool(occluded(bvh, o, d, 0.3).any())   # nothing inside r=0.3


def test_pallas_dense_tracer_matches_brute_force(sphere_mesh):
    """Pallas MT kernel (interpret mode on CPU) vs brute force."""
    from mirres_restir_nerf_mesh_tpu.ops.pallas_tracer import pallas_intersect

    v, t = sphere_mesh
    v, t = decimate(v, t, 400)
    rng = np.random.RandomState(3)
    R = 64
    o = rng.randn(R, 3)
    o = o / np.linalg.norm(o, axis=1, keepdims=True) * 2.0
    d = rng.randn(R, 3) * 0.2 - o
    d = d / np.linalg.norm(d, axis=1, keepdims=True)

    hit = pallas_intersect(jnp.asarray(v), jnp.asarray(t),
                           jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32))
    bt, bp = _brute_force(o.astype(np.float32), d.astype(np.float32), v, t)
    ht = np.asarray(hit.t)
    agree = np.isclose(
        np.where(np.isinf(ht), 1e30, ht), np.where(np.isinf(bt), 1e30, bt), atol=1e-4
    )
    assert agree.mean() > 0.999
    assert (np.asarray(hit.prim) == bp).mean() > 0.95
