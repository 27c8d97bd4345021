"""COLMAP dataset provider (binary model parsing + pose normalization).

Re-implements the reference `nerf/colmap_provider.py` + `nerf/colmap_utils.py`:
parses cameras/images/points3D .bin (or .txt) files, centers and auto-scales
poses, estimates per-view near/far from the sparse point cloud, and produces
the same FrameData contract as the blender provider.
"""

from __future__ import annotations

import os
import struct
from typing import Dict, Optional, Tuple

import numpy as np

from .provider import FrameData, compute_mvps
from .rays import nerf_matrix_to_ngp


def _read_next_bytes(f, num_bytes, fmt, endian="<"):
    return struct.unpack(endian + fmt, f.read(num_bytes))


def read_cameras_binary(path: str) -> Dict[int, dict]:
    """cameras.bin (COLMAP model format)."""
    model_params = {0: 3, 1: 4, 2: 4, 3: 5, 4: 8, 5: 8, 6: 12, 7: 5, 8: 4, 9: 5, 10: 12}
    cams = {}
    with open(path, "rb") as f:
        (n,) = _read_next_bytes(f, 8, "Q")
        for _ in range(n):
            cid, model, w, h = _read_next_bytes(f, 24, "iiQQ")
            np_ = model_params[model]
            params = _read_next_bytes(f, 8 * np_, "d" * np_)
            cams[cid] = dict(model=model, width=w, height=h, params=np.array(params))
    return cams


def read_images_binary(path: str) -> Dict[int, dict]:
    """images.bin: per-image quaternion/translation/name/2D points."""
    images = {}
    with open(path, "rb") as f:
        (n,) = _read_next_bytes(f, 8, "Q")
        for _ in range(n):
            iid = _read_next_bytes(f, 4, "i")[0]
            qvec = np.array(_read_next_bytes(f, 32, "dddd"))
            tvec = np.array(_read_next_bytes(f, 24, "ddd"))
            cam_id = _read_next_bytes(f, 4, "i")[0]
            name = b""
            c = f.read(1)
            while c != b"\x00":
                name += c
                c = f.read(1)
            (n2d,) = _read_next_bytes(f, 8, "Q")
            data = f.read(24 * n2d)
            arr = np.frombuffer(data, dtype=np.float64).reshape(n2d, 3)
            pt_ids = np.frombuffer(data, dtype=np.int64).reshape(n2d, 3)[:, 2]
            images[iid] = dict(
                qvec=qvec, tvec=tvec, camera_id=cam_id,
                name=name.decode(), xys=arr[:, :2], point3D_ids=pt_ids,
            )
    return images


_MODEL_IDS = {
    "SIMPLE_PINHOLE": 0, "PINHOLE": 1, "SIMPLE_RADIAL": 2, "RADIAL": 3,
    "OPENCV": 4, "OPENCV_FISHEYE": 5, "FULL_OPENCV": 6, "FOV": 7,
    "SIMPLE_RADIAL_FISHEYE": 8, "RADIAL_FISHEYE": 9, "THIN_PRISM_FISHEYE": 10,
}


def _text_lines(path: str):
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line and not line.startswith("#"):
                yield line


def read_cameras_text(path: str) -> Dict[int, dict]:
    """cameras.txt (COLMAP text model, reference colmap_utils.py:82-103):
    `CAMERA_ID MODEL WIDTH HEIGHT PARAMS[]` per line."""
    cams = {}
    for line in _text_lines(path):
        el = line.split()
        cams[int(el[0])] = dict(
            model=_MODEL_IDS[el[1]], width=int(el[2]), height=int(el[3]),
            params=np.array([float(x) for x in el[4:]]),
        )
    return cams


def read_images_text(path: str) -> Dict[int, dict]:
    """images.txt (reference colmap_utils.py:129-166): two lines per image —
    `IMAGE_ID QW QX QY QZ TX TY TZ CAMERA_ID NAME` then the 2D-point track
    line `X Y POINT3D_ID ...` (POINT3D_ID -1 = untracked).

    The track line is read UNCONDITIONALLY from the raw stream (reference
    colmap_utils.py:157 uses readline()): an image with zero POINTS2D has an
    EMPTY second line, which a blank-skipping iterator would swallow,
    consuming the next image's header as this image's track."""
    images = {}
    with open(path) as f:
        it = iter(f)
        for line in it:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            el = line.split()
            iid = int(el[0])
            qvec = np.array([float(x) for x in el[1:5]])
            tvec = np.array([float(x) for x in el[5:8]])
            cam_id = int(el[8])
            name = el[9]
            pts = next(it, "").split()  # raw line; empty = zero points
            xys = np.array([float(x) for x in pts], np.float64).reshape(-1, 3)
            images[iid] = dict(
                qvec=qvec, tvec=tvec, camera_id=cam_id, name=name,
                xys=xys[:, :2], point3D_ids=xys[:, 2].astype(np.int64),
            )
    return images


def read_points3d_text(path: str) -> Tuple[np.ndarray, np.ndarray, Dict[int, int]]:
    """points3D.txt (reference colmap_utils.py:170-201):
    `POINT3D_ID X Y Z R G B ERROR TRACK[]` -> (xyz [P,3], err [P], id->row)."""
    xyzs, errs, id_map = [], [], {}
    for i, line in enumerate(_text_lines(path)):
        el = line.split()
        id_map[int(el[0])] = i
        xyzs.append([float(el[1]), float(el[2]), float(el[3])])
        errs.append(float(el[7]))
    return np.array(xyzs, np.float32).reshape(-1, 3), np.array(errs, np.float32), id_map


def _read_model_file(sparse: str, name: str, bin_reader, text_reader):
    """Prefer <name>.bin, fall back to <name>.txt (COLMAP writes either)."""
    bp = os.path.join(sparse, name + ".bin")
    if os.path.exists(bp):
        return bin_reader(bp)
    return text_reader(os.path.join(sparse, name + ".txt"))


def extract_sparse_depth(
    images_meta: Dict[int, dict],
    keys,
    poses: np.ndarray,
    pts3d: np.ndarray,
    ptserr: np.ndarray,
    id_map: Dict[int, int],
    H: int,
    W: int,
    downscale: int = 1,
):
    """Per-view sparse depth/weight from the COLMAP tracks (reference
    colmap_provider.py:234-272): for every 2D keypoint with a 3D track,
    depth = (cam_origin - point) . cam_z  (OpenGL backward z), weight =
    2*exp(-(err/mean_err)^2).  Returns fixed-capacity padded arrays
    (coords [F,M,2] int32 (row,col), depth [F,M], weight [F,M]; weight 0 =
    padding) + cam_near_far [F,2] (min/max track depth per view,
    colmap_provider.py:270)."""
    mean_err = max(float(np.mean(ptserr)) if len(ptserr) else 1.0, 1e-8)
    per_view = []
    for i, k in enumerate(keys):
        im = images_meta[k]
        xys = im["xys"]
        pids = im["point3D_ids"]
        # (x,y) -> (row, col), the reference's inverted convention
        rc = np.stack([xys[:, 1], xys[:, 0]], axis=-1)
        mask = (pids != -1)
        rows = []
        if mask.any():
            rc = np.round(rc[mask] / downscale).astype(np.int32)
            rc[:, 0] = rc[:, 0].clip(0, H - 1)
            rc[:, 1] = rc[:, 1].clip(0, W - 1)
            ids = np.array([id_map.get(int(p), -1) for p in pids[mask]])
            ok = ids >= 0
            rc, ids = rc[ok], ids[ok]
            pts = pts3d[ids]
            err = ptserr[ids]
            P = poses[i]
            depth = (P[:3, 3][None] - pts) @ P[:3, 2]
            good = depth > 0
            weight = 2.0 * np.exp(-((err / mean_err) ** 2))
            per_view.append((rc[good], depth[good], weight[good]))
        else:
            per_view.append((np.zeros((0, 2), np.int32), np.zeros(0), np.zeros(0)))

    F = len(keys)
    M = max(max((len(d) for _, d, _ in per_view), default=1), 1)
    coords = np.zeros((F, M, 2), np.int32)
    depth = np.zeros((F, M), np.float32)
    weight = np.zeros((F, M), np.float32)
    near_far = np.tile(np.array([[0.05, 1e9]], np.float32), (F, 1))
    for i, (rc, d, w) in enumerate(per_view):
        m = len(d)
        if m:
            coords[i, :m] = rc
            depth[i, :m] = d
            weight[i, :m] = w
            near_far[i] = [float(d.min()), float(d.max())]
    return coords, depth, weight, near_far


def align_dense_depth(
    dense: np.ndarray, coords: np.ndarray, sdepth: np.ndarray, sweight: np.ndarray
) -> np.ndarray:
    """Scale/bias-align a monocular dense depth map to the sparse COLMAP
    depths by RANSAC regression with the reference's negative-scale fallbacks
    (colmap_provider.py:295-322)."""
    m = sweight > 0
    X = dense[coords[m, 0], coords[m, 1]].reshape(-1, 1).astype(np.float64)
    Y = sdepth[m].astype(np.float64)
    Wt = sweight[m].astype(np.float64)
    if len(Y) < 2:
        return dense
    try:
        from sklearn.linear_model import RANSACRegressor

        LR = RANSACRegressor().fit(X, Y, Wt)
        scale = float(LR.estimator_.coef_[0])
        bias = float(LR.estimator_.intercept_)
    except Exception:
        A = np.stack([X[:, 0], np.ones_like(X[:, 0])], -1)
        sol, *_ = np.linalg.lstsq(A * Wt[:, None], Y * Wt, rcond=None)
        scale, bias = float(sol[0]), float(sol[1])
    if scale < 0:
        idx = np.argsort(Wt)[::-1]
        x0, y0 = X[idx[0], 0], Y[idx[0]]
        x1, y1 = X[idx[1], 0], Y[idx[1]]
        if abs(x0 - x1) > 1e-12:
            scale = (y0 - y1) / (x0 - x1)
            bias = y0 - x0 * scale
        if scale < 0 and abs(x0) > 1e-12:
            scale = y0 / x0
            bias = 0.0
    return (dense * scale + bias).astype(np.float32)


def read_points3d_binary(path: str) -> Tuple[np.ndarray, np.ndarray, Dict[int, int]]:
    """points3D.bin -> (xyz [P,3], err [P], id->row)."""
    xyzs, errs, id_map = [], [], {}
    with open(path, "rb") as f:
        (n,) = _read_next_bytes(f, 8, "Q")
        for i in range(n):
            pid = _read_next_bytes(f, 8, "Q")[0]
            xyz = _read_next_bytes(f, 24, "ddd")
            f.read(3)  # rgb
            err = _read_next_bytes(f, 8, "d")[0]
            (track_len,) = _read_next_bytes(f, 8, "Q")
            f.read(8 * track_len)
            xyzs.append(xyz)
            errs.append(err)
            id_map[pid] = i
    return np.array(xyzs, np.float32), np.array(errs, np.float32), id_map


def qvec2rotmat(q):
    w, x, y, z = q
    return np.array(
        [
            [1 - 2 * y * y - 2 * z * z, 2 * x * y - 2 * z * w, 2 * x * z + 2 * y * w],
            [2 * x * y + 2 * z * w, 1 - 2 * x * x - 2 * z * z, 2 * y * z - 2 * x * w],
            [2 * x * z - 2 * y * w, 2 * y * z + 2 * x * w, 1 - 2 * x * x - 2 * y * y],
        ]
    )


def load_colmap(
    root: str,
    split: str = "train",
    downscale: int = 1,
    scale: float = -1.0,
    offset=(0, 0, 0),
    bound: float = 2.0,
    enable_cam_center: bool = False,
    with_images: bool = True,
    test_every: int = 8,
) -> FrameData:
    """Load a COLMAP workspace (sparse/0 + images/) into FrameData.

    Pose normalization mirrors colmap_provider.py:30-54: center on the sparse
    point (or camera) centroid, auto-scale so cameras fit in the bound box.
    The camera convention is converted COLMAP(w2c, y-down) -> OpenGL cam2world.
    """
    sparse = os.path.join(root, "sparse", "0")
    if not os.path.isdir(sparse):
        sparse = os.path.join(root, "colmap_sparse", "0")
    cams = _read_model_file(sparse, "cameras", read_cameras_binary, read_cameras_text)
    images_meta = _read_model_file(sparse, "images", read_images_binary, read_images_text)
    pts3d, ptserr, id_map = _read_model_file(
        sparse, "points3D", read_points3d_binary, read_points3d_text)

    keys = sorted(images_meta.keys(), key=lambda k: images_meta[k]["name"])
    if split == "train":
        keys = [k for i, k in enumerate(keys) if i % test_every != 0]
    elif split in ("val", "test"):
        keys = [k for i, k in enumerate(keys) if i % test_every == 0]

    poses = []
    for k in keys:
        im = images_meta[k]
        R = qvec2rotmat(im["qvec"])
        t = im["tvec"]
        w2c = np.eye(4)
        w2c[:3, :3] = R
        w2c[:3, 3] = t
        c2w = np.linalg.inv(w2c)
        # COLMAP/OpenCV (y down, z forward) -> OpenGL (y up, z backward)
        c2w[:3, 1:3] *= -1
        poses.append(c2w.astype(np.float32))
    poses = np.stack(poses)

    # center + scale (colmap_provider.py:30-54)
    if enable_cam_center or len(pts3d) == 0:
        center = poses[:, :3, 3].mean(axis=0)
    else:
        center = pts3d.mean(axis=0)
    poses[:, :3, 3] -= center
    pts3d = pts3d - center
    if scale == -1.0:
        scale = 0.75 * bound / np.percentile(np.linalg.norm(poses[:, :3, 3], axis=1), 90)
    poses[:, :3, 3] = poses[:, :3, 3] * scale + np.asarray(offset)
    pts3d = pts3d * scale + np.asarray(offset)

    cam = cams[images_meta[keys[0]]["camera_id"]]
    p = cam["params"]
    if cam["model"] in (0, 1):  # SIMPLE_PINHOLE / PINHOLE
        fx = p[0]
        fy = p[1] if cam["model"] == 1 else p[0]
        cx = p[2] if cam["model"] == 1 else p[1]
        cy = p[3] if cam["model"] == 1 else p[2]
    else:  # SIMPLE_RADIAL etc.: use f, cx, cy; distortion ignored
        fx = fy = p[0]
        cx, cy = p[1], p[2]
    intrinsics = np.array([fx, fy, cx, cy], np.float32) / downscale

    H = int(cam["height"]) // downscale
    W = int(cam["width"]) // downscale

    if with_images:
        from .provider import _load_image

        imgs = []
        img_dir = os.path.join(root, "images")
        for k in keys:
            imgs.append(_load_image(os.path.join(img_dir, images_meta[k]["name"]), downscale))
        images = np.stack(imgs)
    else:
        images = np.zeros((len(keys), H, W, 3), np.float32)

    mvps = compute_mvps(poses, intrinsics, H, W, bound)

    # sparse-depth supervision tables + per-view near/far from the COLMAP
    # tracks (reference colmap_provider.py:234-272); depths are in the
    # normalized scene scale because poses/pts3d were normalized above
    sparse_coords = sparse_depth = sparse_weight = cam_near_far = None
    if split != "test" and len(pts3d) > 0:
        sparse_coords, sparse_depth, sparse_weight, cam_near_far = extract_sparse_depth(
            images_meta, keys, poses, pts3d, ptserr, id_map, H, W, downscale
        )

    # optional dense-depth supervision: precomputed <root>/depths/<name>.npy
    # (monocular DPT maps, reference colmap_provider.py:272-328), aligned to
    # the sparse COLMAP depths by RANSAC scale/bias per frame
    depths = None
    ddir = os.path.join(root, "depths")
    if with_images and os.path.isdir(ddir):
        maps = []
        ok = True
        for i, k in enumerate(keys):
            base = os.path.splitext(images_meta[k]["name"])[0]
            pth = os.path.join(ddir, base + ".npy")
            if not os.path.exists(pth):
                ok = False
                break
            dm = np.load(pth).astype(np.float32)
            if dm.shape != (H, W):
                from PIL import Image as _Im

                dm = np.asarray(
                    _Im.fromarray(dm).resize((W, H), _Im.BILINEAR), np.float32
                )
            if sparse_coords is not None:
                dm = align_dense_depth(
                    dm, sparse_coords[i], sparse_depth[i], sparse_weight[i]
                )
            else:
                dm = dm * scale
            maps.append(dm)
        if ok and maps:
            depths = np.stack(maps)

    fd = FrameData(images=images, poses=poses, intrinsics=intrinsics, H=H, W=W,
                   mvps=mvps, depths=depths, sparse_coords=sparse_coords,
                   sparse_depth=sparse_depth, sparse_weight=sparse_weight,
                   cam_near_far=cam_near_far)
    fd.pts3d = pts3d  # sparse points for near/far + aabb estimation
    return fd


def per_view_near_far(fd: FrameData) -> np.ndarray:
    """[N,2] near/far from sparse points in each view's frustum
    (colmap_provider.py:259-270)."""
    pts = getattr(fd, "pts3d", None)
    if pts is None or len(pts) == 0:
        return np.tile(np.array([[0.05, 1e9]], np.float32), (fd.num_frames, 1))
    out = []
    for p in fd.poses:
        R = p[:3, :3]
        t = p[:3, 3]
        cam = (pts - t) @ R
        z = -cam[:, 2]
        z = z[z > 0]
        if len(z) == 0:
            out.append([0.05, 1e9])
        else:
            out.append([max(np.percentile(z, 1) * 0.5, 0.05), np.percentile(z, 99) * 2.0])
    return np.array(out, np.float32)
