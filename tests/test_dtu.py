"""DTU provider (data/dtu.py): projection decomposition round-trip + loader
contract (reference nerf/dtu_provider.py cameras.npz P = K[R|t] convention)."""

import os

import numpy as np
import pytest
from PIL import Image

from mirres_restir_nerf_mesh_tpu.data.dtu import decompose_projection, load_dtu


def look_at_w2c(eye, target=np.zeros(3), up=np.array([0.0, 1.0, 0.0])):
    fwd = target - eye
    fwd = fwd / np.linalg.norm(fwd)
    right = np.cross(fwd, up)
    right /= np.linalg.norm(right)
    dn = np.cross(fwd, right)
    R = np.stack([right, dn, fwd])  # OpenCV: x right, y down, z forward
    t = -R @ eye
    w2c = np.eye(4)
    w2c[:3, :3] = R
    w2c[:3, 3] = t
    return w2c


def test_decompose_projection_roundtrip():
    K = np.array([[420.0, 0, 32.0], [0, 410.0, 24.0], [0, 0, 1.0]])
    rng = np.random.RandomState(0)
    for i in range(5):
        eye = rng.uniform(-2, 2, 3)
        eye = eye / np.linalg.norm(eye) * 2.5
        w2c = look_at_w2c(eye)
        P = K @ w2c[:3, :4]
        K2, c2w = decompose_projection(P)
        np.testing.assert_allclose(K2, K, rtol=1e-5, atol=1e-5)
        # camera center preserved; OpenCV->OpenGL flips columns 1,2
        np.testing.assert_allclose(c2w[:3, 3], eye, rtol=1e-5, atol=1e-6)
        c2w_cv = np.linalg.inv(w2c)
        np.testing.assert_allclose(c2w[:3, 0], c2w_cv[:3, 0], atol=1e-6)
        np.testing.assert_allclose(c2w[:3, 1], -c2w_cv[:3, 1], atol=1e-6)
        np.testing.assert_allclose(c2w[:3, 2], -c2w_cv[:3, 2], atol=1e-6)


def test_load_dtu_fixture(tmp_path):
    K = np.array([[80.0, 0, 32.0], [0, 80.0, 24.0], [0, 0, 1.0]])
    H, W = 48, 64
    n = 5
    os.makedirs(tmp_path / "image")
    os.makedirs(tmp_path / "mask")
    cams = {}
    eyes = []
    rng = np.random.RandomState(1)
    for i in range(n):
        eye = rng.uniform(-1, 1, 3)
        eye = eye / np.linalg.norm(eye) * 2.0
        eyes.append(eye)
        w2c = look_at_w2c(eye)
        cams[f"world_mat_{i}"] = np.vstack([K @ w2c[:3, :4], [0, 0, 0, 1]])
        cams[f"scale_mat_{i}"] = np.eye(4)
        Image.fromarray(np.full((H, W, 3), 100 + i, np.uint8)).save(
            tmp_path / "image" / f"{i:03d}.png"
        )
        Image.fromarray(np.full((H, W), 255, np.uint8)).save(
            tmp_path / "mask" / f"{i:03d}.png"
        )
    np.savez(tmp_path / "cameras.npz", **cams)

    fd = load_dtu(str(tmp_path), split="train", test_every=5, bound=1.0)
    assert fd.num_frames == 4  # every 5th view goes to val/test
    assert fd.images.shape == (4, H, W, 4)  # mask becomes alpha
    assert np.allclose(fd.images[..., 3], 1.0)
    np.testing.assert_allclose(
        fd.intrinsics, [80.0, 80.0, 32.0, 24.0], rtol=1e-5
    )
    # camera centers recovered (train split drops index 0)
    for j, i in enumerate([1, 2, 3, 4]):
        np.testing.assert_allclose(fd.poses[j][:3, 3], eyes[i], rtol=1e-4, atol=1e-5)
    assert fd.mvps.shape == (4, 4, 4)
