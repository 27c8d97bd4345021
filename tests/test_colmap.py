"""COLMAP provider: binary parsing, sparse-depth supervision, dense-depth
alignment, per-view near/far (reference nerf/colmap_provider.py:234-328 +
colmap_utils.py binary model format)."""

import os
import struct

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mirres_restir_nerf_mesh_tpu.data import colmap as cm
from mirres_restir_nerf_mesh_tpu.data.provider import RayDataset


def write_colmap_model(root, poses_w2c, pts, errs, tracks, W=64, H=48, f=60.0):
    """Minimal COLMAP binary model writer (cameras/images/points3D.bin).
    tracks: per-image list of (xy [M,2], point_id [M])."""
    sp = os.path.join(root, "sparse", "0")
    os.makedirs(sp, exist_ok=True)
    with open(os.path.join(sp, "cameras.bin"), "wb") as fo:
        fo.write(struct.pack("<Q", 1))
        fo.write(struct.pack("<iiQQ", 1, 0, W, H))            # SIMPLE_PINHOLE
        fo.write(struct.pack("<ddd", f, W / 2.0, H / 2.0))
    with open(os.path.join(sp, "images.bin"), "wb") as fo:
        fo.write(struct.pack("<Q", len(poses_w2c)))
        for i, (q, t) in enumerate(poses_w2c):
            fo.write(struct.pack("<i", i + 1))
            fo.write(struct.pack("<dddd", *q))
            fo.write(struct.pack("<ddd", *t))
            fo.write(struct.pack("<i", 1))
            fo.write(f"img_{i:02d}.png".encode() + b"\x00")
            xy, pid = tracks[i]
            fo.write(struct.pack("<Q", len(xy)))
            for (x, y), p in zip(xy, pid):
                fo.write(struct.pack("<ddq", x, y, p))
    with open(os.path.join(sp, "points3D.bin"), "wb") as fo:
        fo.write(struct.pack("<Q", len(pts)))
        for j, (p, e) in enumerate(zip(pts, errs)):
            fo.write(struct.pack("<Q", j + 1))
            fo.write(struct.pack("<ddd", *p))
            fo.write(struct.pack("<BBB", 128, 128, 128))
            fo.write(struct.pack("<d", e))
            fo.write(struct.pack("<Q", 0))


def make_fixture(tmp_path, n_views=4, n_pts=40):
    rng = np.random.RandomState(0)
    pts = rng.uniform(-0.3, 0.3, (n_pts, 3))
    errs = rng.uniform(0.1, 1.0, n_pts)
    W, H, f = 64, 48, 60.0
    poses_w2c, tracks = [], []
    for i in range(n_views):
        # camera on a circle looking at the origin (identity rotation variants
        # kept simple: translate along +z in camera frame)
        q = (1.0, 0.0, 0.0, 0.0)                         # identity w2c rotation
        t = (0.15 * (i - 1.5), 0.0, 2.0 + 0.1 * i)        # w2c translation
        R = np.eye(3)
        tv = np.asarray(t)
        camp = pts @ R.T + tv                             # points in camera frame
        xy = np.stack(
            [f * camp[:, 0] / camp[:, 2] + W / 2.0,
             f * camp[:, 1] / camp[:, 2] + H / 2.0], -1
        )
        vis = (
            (camp[:, 2] > 0)
            & (xy[:, 0] >= 0) & (xy[:, 0] < W)
            & (xy[:, 1] >= 0) & (xy[:, 1] < H)
        )
        ids = np.where(vis, np.arange(1, n_pts + 1), -1)
        poses_w2c.append((q, t))
        tracks.append((xy, ids))
    write_colmap_model(str(tmp_path), poses_w2c, pts, errs, tracks, W, H, f)
    # plain gray images
    os.makedirs(tmp_path / "images", exist_ok=True)
    from PIL import Image

    for i in range(n_views):
        Image.fromarray(np.full((H, W, 3), 128, np.uint8)).save(
            tmp_path / "images" / f"img_{i:02d}.png"
        )
    return pts, errs


def test_colmap_sparse_depth_matches_projection(tmp_path):
    pts, errs = make_fixture(tmp_path)
    fd = cm.load_colmap(str(tmp_path), split="train", test_every=100, bound=2.0)
    assert fd.sparse_coords is not None
    assert fd.cam_near_far is not None and fd.cam_near_far.shape == (fd.num_frames, 2)
    assert fd.num_frames == 3  # train split drops every test_every-th view

    # depth definition: (cam_origin - point) . cam_z with normalized poses
    for i in range(fd.num_frames):
        w = fd.sparse_weight[i]
        m = w > 0
        assert m.sum() > 10
        d = fd.sparse_depth[i][m]
        assert (d > 0).all()
        # near/far bracket the track depths
        assert np.isclose(fd.cam_near_far[i, 0], d.min())
        assert np.isclose(fd.cam_near_far[i, 1], d.max())
        # re-derive depth from the normalized scene directly
        P = fd.poses[i]
        pid_depths = (P[:3, 3][None] - fd.pts3d) @ P[:3, 2]
        assert d.max() <= pid_depths.max() + 1e-4

    # weights follow the reference 2*exp(-(err/mean)^2) in (0, 2]
    wv = fd.sparse_weight[fd.sparse_weight > 0]
    assert (wv > 0).all() and (wv <= 2.0 + 1e-6).all()


def test_colmap_sampler_sparse_branch(tmp_path):
    make_fixture(tmp_path)
    fd = cm.load_colmap(str(tmp_path), split="train", test_every=100, bound=2.0)
    ds = RayDataset(fd, bound=2.0)
    sample = jax.jit(lambda k: ds.sample(k, 256))
    hit_sparse = False
    for s in range(30):
        b = sample(jax.random.PRNGKey(s))
        assert b["rays_o"].shape == (256, 3)
        assert b["depth"].shape == (256,)
        assert b["depth_weight"].shape == (256,)
        assert b["cam_near_far"].shape == (256, 2)
        if float(jnp.max(b["depth_weight"])) > 0:
            hit_sparse = True
            # sparse batches supervise positive depths inside the frustum range
            m = np.asarray(b["depth_weight"]) > 0
            d = np.asarray(b["depth"])[m]
            assert (d > 0).all()
    assert hit_sparse, "the 10% sparse-depth branch never fired in 30 draws"


def write_colmap_model_text(root, poses_w2c, pts, errs, tracks, W=64, H=48, f=60.0):
    """Same model as write_colmap_model but in COLMAP text format
    (reference colmap_utils.py:82-201)."""
    sp = os.path.join(root, "sparse", "0")
    os.makedirs(sp, exist_ok=True)
    with open(os.path.join(sp, "cameras.txt"), "w") as fo:
        fo.write("# Camera list\n")
        fo.write(f"1 SIMPLE_PINHOLE {W} {H} {f} {W / 2.0} {H / 2.0}\n")
    with open(os.path.join(sp, "images.txt"), "w") as fo:
        fo.write("# Image list: two lines per image\n")
        for i, (q, t) in enumerate(poses_w2c):
            fo.write(f"{i + 1} {q[0]} {q[1]} {q[2]} {q[3]} "
                     f"{t[0]} {t[1]} {t[2]} 1 img_{i:02d}.png\n")
            xy, pid = tracks[i]
            fo.write(" ".join(f"{x} {y} {p}" for (x, y), p in zip(xy, pid)) + "\n")
    with open(os.path.join(sp, "points3D.txt"), "w") as fo:
        fo.write("# 3D point list\n")
        for j, (p, e) in enumerate(zip(pts, errs)):
            fo.write(f"{j + 1} {p[0]} {p[1]} {p[2]} 128 128 128 {e}\n")


def make_fixture_text(tmp_path, n_views=4, n_pts=40):
    """Text-format twin of make_fixture (same RNG -> identical model)."""
    import shutil

    bin_dir = tmp_path / "bin_model"
    os.makedirs(bin_dir, exist_ok=True)
    pts, errs = make_fixture(bin_dir, n_views, n_pts)
    # rebuild the same tracks deterministically for the text writer by
    # re-reading the binary model we just wrote
    sp = os.path.join(bin_dir, "sparse", "0")
    images = cm.read_images_binary(os.path.join(sp, "images.bin"))
    poses_w2c = [(tuple(images[k]["qvec"]), tuple(images[k]["tvec"]))
                 for k in sorted(images)]
    tracks = [(images[k]["xys"], images[k]["point3D_ids"]) for k in sorted(images)]
    write_colmap_model_text(str(tmp_path), poses_w2c, pts, errs, tracks)
    shutil.copytree(bin_dir / "images", tmp_path / "images")
    return bin_dir


def test_colmap_text_model_roundtrip(tmp_path):
    """Text-format model loads identically to the binary one
    (reference colmap_utils.py:82-166 read_cameras_text/read_images_text)."""
    bin_dir = make_fixture_text(tmp_path)
    fd_txt = cm.load_colmap(str(tmp_path), split="train", test_every=100, bound=2.0)
    fd_bin = cm.load_colmap(str(bin_dir), split="train", test_every=100, bound=2.0)
    np.testing.assert_allclose(fd_txt.poses, fd_bin.poses, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(fd_txt.intrinsics, fd_bin.intrinsics)
    np.testing.assert_allclose(fd_txt.pts3d, fd_bin.pts3d, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(fd_txt.sparse_depth, fd_bin.sparse_depth,
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(fd_txt.sparse_weight, fd_bin.sparse_weight,
                               rtol=1e-5, atol=1e-6)
    assert (fd_txt.sparse_coords == fd_bin.sparse_coords).all()
    np.testing.assert_allclose(fd_txt.cam_near_far, fd_bin.cam_near_far,
                               rtol=1e-5, atol=1e-6)


def test_colmap_text_zero_points_image(tmp_path):
    """An image with zero POINTS2D has an EMPTY second line; the parser must
    consume it unconditionally (reference colmap_utils.py:157 readline) —
    a blank-skipping iterator would swallow it and eat the NEXT image's
    header as this image's track line (ADVICE r4)."""
    p = tmp_path / "images.txt"
    p.write_text(
        "# comment\n"
        "1 1.0 0.0 0.0 0.0 0.1 0.2 2.0 1 a.png\n"
        "\n"  # zero tracked points
        "2 1.0 0.0 0.0 0.0 0.3 0.4 2.5 1 b.png\n"
        "1.5 2.5 7 3.5 4.5 -1\n"
    )
    images = cm.read_images_text(str(p))
    assert sorted(images) == [1, 2]
    assert images[1]["name"] == "a.png"
    assert images[1]["xys"].shape == (0, 2)
    assert images[2]["name"] == "b.png"
    np.testing.assert_allclose(images[2]["tvec"], [0.3, 0.4, 2.5])
    np.testing.assert_allclose(images[2]["xys"], [[1.5, 2.5], [3.5, 4.5]])
    np.testing.assert_array_equal(images[2]["point3D_ids"], [7, -1])


def test_align_dense_depth_recovers_scale_bias():
    rng = np.random.RandomState(1)
    H, W = 48, 64
    true = rng.uniform(1.0, 3.0, (H, W)).astype(np.float32)
    dense = (true - 0.5) / 2.0  # wrong scale+bias monocular estimate
    coords = np.stack(
        [rng.randint(0, H, 64), rng.randint(0, W, 64)], -1
    ).astype(np.int32)
    sdepth = true[coords[:, 0], coords[:, 1]]
    sweight = np.ones(64, np.float32)
    fixed = cm.align_dense_depth(dense, coords, sdepth, sweight)
    np.testing.assert_allclose(fixed, true, rtol=1e-4, atol=1e-4)
